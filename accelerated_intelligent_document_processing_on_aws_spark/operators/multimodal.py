"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Treats image/audio/video as `binary` columns with a `struct` of metadata,
decoded/feature-extracted in Arrow-batched ``mapInPandas`` — the pattern a
100 TB training-data pipeline needs (decode never touches the driver, batch
shape bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``).

Decode is REAL for all three kinds:

* IMAGE — ``kernels/image.py`` parses 24-bit BMP and binary PPM with
  stdlib struct + numpy (header, padding, pixel-array reconstruction),
  applies the reference's aspect-preserving never-upscale resize
  (``idp_common/image/__init__.py:13`` resize semantics), and extracts
  integer-sum features a SQL oracle reproduces exactly.
* AUDIO — ``kernels/audio.py`` walks RIFF/WAVE chunk lists and decodes
  16-bit PCM; features = amplitude stats + zero-crossing rate +
  duration, integer-sum exact.
* VIDEO — ``kernels/video.py`` parses the RV01 raw-frame container
  (length-prefixed BMP/PPM frames, the MJPEG shape), SAMPLES at most
  ``FRAME_SAMPLE_K`` evenly spaced frames *before* decoding (at scale
  decode cost is the budget), and merges per-frame integer raster sums.

``_fake_decode`` remains only as the documented md5 fallback for
payloads in none of those containers (e.g. raw-text media synthesized by
``media_from_documents`` without ``with_media_payloads``); swap the
kernels for PIL/ffmpeg in production for compressed codecs.

Reference analog: page-image render/resize (``ocr/service.py:1144-1252``,
``idp_common/image/__init__.py:13``).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels.audio import audio_features, decode_wav, encode_wav
from ..kernels.image import (
    binarize_adaptive,
    decode_image,
    image_features,
    image_sums,
    resize_nearest,
)
from ..kernels.video import decode_rawvideo, encode_rawvideo
from .common import ensure_min_partitions

N_FEATURES = 8
FRAME_SAMPLE_K = 4

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def _fake_decode(payload: bytes, kind: str) -> tuple[int, int, int, list[float]]:
    """Deterministic pseudo-decode FALLBACK for payloads in no supported
    container (real codecs cover BMP/PPM, RIFF/WAVE PCM, RV01 raw-frame
    video).  Raises on None like a real codec would.  md5-derived so a
    SQL oracle can reproduce every output byte-for-byte."""
    if payload is None:
        raise ValueError("cannot decode null payload")
    h = hashlib.md5(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    n_frames = 1 if kind == "image" else 1 + h[2] % 32
    feats = np.frombuffer(h, dtype=np.uint8)[:N_FEATURES].astype(np.float64) / 255.0
    return width, height, n_frames, [float(x) for x in feats]


def _decode_one(
    payload: bytes, kind: str, box: tuple[int, int]
) -> tuple[int, int, int, list[float]]:
    """REAL decode per kind, dispatched on container magic:

    * image (``BM``/``P6``): raster parse → aspect-preserving NN resize
      into ``box`` → integer-sum features.  width/height report the
      ORIGINAL decoded dims, features[6:8] the resized dims so the
      resize itself is certified.
    * audio (``RIFF``): WAV chunk walk → PCM amplitude/zero-crossing/
      duration features.  width = sample rate, height = channel count,
      n_frames = PCM frame count.
    * video (``RV01``): container walk → evenly-sampled frame decode
      (``FRAME_SAMPLE_K``) → per-frame resize → merged integer raster
      sums (min/max luma across sampled frames).  n_frames = container
      total, NOT the sampled count — the walk read it without decoding.

    Unrecognized containers fall back to the documented md5 stub."""
    head = b"" if payload is None else bytes(payload[:4])
    if kind == "image":
        arr = decode_image(payload)
        h, w = arr.shape[:2]
        resized = resize_nearest(arr, box[0], box[1])
        return w, h, 1, image_features(resized)
    if kind == "audio" and head == b"RIFF":
        sr, n_ch, samples = decode_wav(payload)
        feats = audio_features(samples, sr, n_ch)
        return sr, n_ch, samples.size // max(n_ch, 1), feats
    if kind == "video" and head == b"RV01":
        n_total, frames = decode_rawvideo(payload, sample_k=FRAME_SAMPLE_K)
        h, w = frames[0].shape[:2]
        sr_ = sg_ = sb_ = sl_ = npx = 0
        lmin, lmax = None, None
        rh_, rw_ = 0, 0
        for arr in frames:
            rz = resize_nearest(arr, box[0], box[1])
            rh_, rw_ = rz.shape[:2]
            r, g, b, ls, lo, hi, n = image_sums(rz)
            sr_, sg_, sb_, sl_, npx = sr_ + r, sg_ + g, sb_ + b, sl_ + ls, npx + n
            lmin = lo if lmin is None else min(lmin, lo)
            lmax = hi if lmax is None else max(lmax, hi)
        feats = [
            sr_ / (255.0 * npx),
            sg_ / (255.0 * npx),
            sb_ / (255.0 * npx),
            sl_ / (255000.0 * npx),
            lmin / 255000.0,
            lmax / 255000.0,
            float(rw_),
            float(rh_),
        ]
        return w, h, n_total, feats
    return _fake_decode(payload, kind)


def decode_features(df: DataFrame, box: tuple[int, int] = (32, 32)) -> DataFrame:
    """binary media → fixed-width feature rows via mapInPandas.

    Column-prunes to exactly the needed inputs BEFORE the heavy stage so
    the Arrow transfer never carries unused columns (SURVEY.md §4
    'downscale at source' principle).
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                w, h, nf, feats = _decode_one(payload, kind, box)
                rows.append((mid, kind, w, h, nf, feats))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "width", "height", "n_frames", "features",
                ],
            )

    # CPU-heavy-per-row, tiny-bytes stage: a single-file scan arrives as
    # ONE split and would serialize every decode through one task (and AQE
    # cannot help — it only sees bytes).  ensure_min_partitions spreads it
    # and leaves well-split 100 TB scans untouched.
    pruned = ensure_min_partitions(df.select("media_id", "kind", "payload"))
    return pruned.mapInPandas(_decode, FEATURES_SCHEMA)


BINARIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_white", T.LongType()),
        T.StructField("n_pixels", T.LongType()),
    ]
)


def binarize_stats(df: DataFrame, block: int = 15, c: int = 10) -> DataFrame:
    """Adaptive-binarization stage over image-kind media rows (reference
    OCR preprocessing, ``idp_common/image/__init__.py:125``): decode →
    ``kernels.image.binarize_adaptive`` → white/total pixel counts per
    image.  Same Arrow-batched mapInPandas shape as ``decode_features``
    (CPU-heavy per row, tiny bytes — spread before the UDF)."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = decode_image(payload)
                h, w = arr.shape[:2]
                binary = binarize_adaptive(arr, block=block, c=c)
                rows.append(
                    (mid, w, h, int((binary == 255).sum()), h * w)
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "n_white", "n_pixels"],
            )

    pruned = ensure_min_partitions(df.select("media_id", "payload"))
    return pruned.mapInPandas(_run, BINARIZE_SCHEMA)


def synth_image_payload(media_id: str) -> bytes:
    """Deterministic REAL image payload for tests/queries: a row-gradient
    RGB raster whose dims, channel offsets, and container format (BMP vs
    PPM) derive from md5(media_id) — so a SQL oracle can compute the
    expected decoded features in closed form while the Spark side round-
    trips actual encoded bytes through the actual decoder."""
    hb = hashlib.md5(media_id.encode("utf-8")).digest()
    w, h = 16 + hb[0] % 48, 16 + hb[1] % 48
    y = np.arange(h, dtype=np.int64)[:, None]
    chans = [np.broadcast_to((hb[2 + c] + y) % 256, (h, w)) for c in range(3)]
    arr = np.stack(chans, axis=2).astype(np.uint8)
    from ..kernels.image import encode_bmp, encode_ppm

    return encode_bmp(arr) if hb[5] % 2 == 0 else encode_ppm(arr)


def synth_audio_payload(media_id: str) -> bytes:
    """Deterministic REAL 16-bit PCM WAV payload: a mod-256 sawtooth
    whose length, phase, step, and sample rate derive from
    md5(media_id) — closed-form, so a SQL oracle recomputes the decoded
    amplitude/zero-crossing features exactly while the Spark side
    round-trips actual RIFF bytes through the actual chunk walker."""
    hb = hashlib.md5(media_id.encode("utf-8")).digest()
    n = 512 + (hb[0] % 8) * 256
    a, b = hb[1], 1 + hb[2] % 7
    sr = 8000 * (1 + hb[3] % 3)
    v = (a + np.arange(n, dtype=np.int64) * b) % 256
    samples = ((v - 128) * 256).astype(np.int16)
    return encode_wav(samples, sr, 1)


def synth_video_payload(media_id: str) -> bytes:
    """Deterministic REAL RV01 payload: 2-7 row-gradient BMP/PPM frames
    whose dims and per-frame channel offsets derive from md5(media_id)
    (frame f shifts every channel by +f), so the sampled-frame features
    have a closed form the oracle reproduces."""
    hb = hashlib.md5(media_id.encode("utf-8")).digest()
    nf = 2 + hb[0] % 6
    w, h = 16 + hb[1] % 48, 16 + hb[2] % 48
    from ..kernels.image import encode_bmp, encode_ppm

    enc = encode_bmp if hb[6] % 2 == 0 else encode_ppm
    y = np.arange(h, dtype=np.int64)[:, None]
    frames = []
    for f in range(nf):
        chans = [
            np.broadcast_to((hb[3 + c] + f + y) % 256, (h, w)) for c in range(3)
        ]
        frames.append(enc(np.stack(chans, axis=2).astype(np.uint8)))
    return encode_rawvideo(frames)


_SYNTH = {
    "image": (synth_image_payload, "image/x-raster"),
    "audio": (synth_audio_payload, "audio/wav"),
    "video": (synth_video_payload, "video/x-rawframes"),
}


def with_media_payloads(media: DataFrame, kinds: tuple = ("image", "audio", "video")) -> DataFrame:
    """Replace payloads of the given kinds with real encoded containers
    (``_SYNTH`` per kind); other kinds keep their bytes.  One Arrow UDF
    over (media_id, kind) — encode is the same CPU-heavy-tiny-bytes
    shape as decode, so spread BEFORE the UDF (a single-split scan would
    serialize it; ``decode_features`` downstream inherits this
    partitioning)."""
    kinds = tuple(kinds)

    @F.pandas_udf(T.BinaryType())
    def synth(media_ids: pd.Series, kind_s: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if m is None else _SYNTH[k][0](m)
                for m, k in zip(media_ids, kind_s)
            ],
            dtype=object,
        )

    media = ensure_min_partitions(media)
    in_kinds = F.col("kind").isin(*kinds)
    # null-gate the UDF inputs: Spark extracts Arrow UDFs and runs them
    # over every row BEFORE the conditional projection, so without the
    # gate out-of-scope kinds would pay the encode too
    gated = F.when(in_kinds, F.col("media_id"))
    mime_map = F.create_map(
        *[x for k in kinds for x in (F.lit(k), F.lit(_SYNTH[k][1]))]
    )
    return media.withColumn(
        "payload",
        F.when(in_kinds, synth(gated, F.col("kind"))).otherwise(F.col("payload")),
    ).withColumn(
        "meta",
        F.struct(
            F.coalesce(mime_map[F.col("kind")], F.col("meta.mime")).alias("mime"),
            F.length("payload").cast("long").alias("n_bytes"),
        ),
    )


def with_image_payloads(media: DataFrame) -> DataFrame:
    """Back-compat wrapper: real payloads for image-kind rows only."""
    return with_media_payloads(media, kinds=("image",))


def media_from_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    payload_from_text: bool = True,
) -> DataFrame:
    """Adapter: synthesize a media table from a text corpus (deterministic;
    used by tests/bench since the sandbox ships no binary fixtures).

    ``payload_from_text=False`` emits NULL payloads — for callers that
    immediately replace every payload (``with_media_payloads`` over all
    kinds) it keeps the text column out of the scan and out of the
    spread exchange entirely (downscale at source: at 100 TB the text
    bytes are the table)."""
    # kind keyed on the first md5 byte of the id (engine-portable: the
    # DuckDB oracle reproduces it; crc32 exists only on the Spark side)
    kind_byte = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 2), 16, 10
    ).cast("int")
    payload = (
        F.encode(F.coalesce(F.col(text_col), F.lit("")), "UTF-8")
        if payload_from_text
        else F.lit(None).cast("binary")
    )
    return df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (kind_byte % 3 + 1).cast("int"),
        ).alias("kind"),
        payload.alias("payload"),
    ).withColumn(
        "meta",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length("payload").cast("long").alias("n_bytes"),
        ),
    )
