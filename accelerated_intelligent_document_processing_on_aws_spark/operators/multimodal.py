"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Treats image/audio/video as `binary` columns with a `struct` of metadata,
decoded/feature-extracted in Arrow-batched ``mapInPandas`` — the pattern a
100 TB training-data pipeline needs (decode never touches the driver, batch
shape bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``).

IMAGE decode is REAL: ``kernels/image.py`` parses 24-bit BMP and binary
PPM payloads with stdlib struct + numpy (header, padding, pixel-array
reconstruction), applies the reference's aspect-preserving never-upscale
resize (``idp_common/image/__init__.py:13`` resize semantics), and
extracts integer-sum features that a SQL oracle reproduces exactly.
Audio/video stay a documented deterministic STUB (``_fake_decode`` — the
sandbox ships no audio/video codecs); swap for ffmpeg in production.

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

from ..kernels.image import decode_image, image_features, resize_nearest
from .common import ensure_min_partitions

N_FEATURES = 8

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
    """Deterministic pseudo-decode for AUDIO/VIDEO only (the sandbox ships
    no audio/video codecs — documented stub; swap for ffmpeg in
    production).  Raises on None like a real codec would.  md5-derived so
    a SQL oracle can reproduce every output byte-for-byte."""
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
    """REAL decode for images (BMP/PPM parse → aspect-preserving NN resize
    into ``box`` → integer-sum features; width/height report the ORIGINAL
    decoded dims, features[6:8] the resized dims so the resize itself is
    certified).  Audio/video fall back to the documented stub."""
    if kind == "image":
        arr = decode_image(payload)
        h, w = arr.shape[:2]
        resized = resize_nearest(arr, box[0], box[1])
        return w, h, 1, image_features(resized)
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


def with_image_payloads(media: DataFrame) -> DataFrame:
    """Replace image-kind payloads with real encoded rasters
    (``synth_image_payload``); other kinds keep their bytes.  The UDF
    input is null-gated on kind: Spark extracts Arrow UDFs and runs them
    over every row BEFORE the conditional projection, so without the gate
    non-image rows would pay the raster encode too."""

    @F.pandas_udf(T.BinaryType())
    def img(media_ids: pd.Series) -> pd.Series:
        return media_ids.map(
            lambda m: None if m is None else synth_image_payload(m)
        )

    is_img = F.col("kind") == "image"
    # raster encode is the same CPU-heavy-tiny-bytes shape as decode —
    # spread BEFORE the UDF so a single-split scan doesn't serialize it
    # (decode_features downstream then inherits this partitioning)
    media = ensure_min_partitions(media)
    return media.withColumn(
        "payload",
        F.when(is_img, img(F.when(is_img, F.col("media_id")))).otherwise(
            F.col("payload")
        ),
    ).withColumn(
        "meta",
        F.struct(
            F.when(F.col("kind") == "image", F.lit("image/x-raster"))
            .otherwise(F.col("meta.mime"))
            .alias("mime"),
            F.length("payload").cast("long").alias("n_bytes"),
        ),
    )


def media_from_documents(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter: synthesize a media table from a text corpus (deterministic;
    used by tests/bench since the sandbox ships no binary fixtures)."""
    # kind keyed on the first md5 byte of the id (engine-portable: the
    # DuckDB oracle reproduces it; crc32 exists only on the Spark side)
    kind_byte = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 2), 16, 10
    ).cast("int")
    return df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (kind_byte % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode(F.coalesce(F.col(text_col), F.lit("")), "UTF-8").alias("payload"),
    ).withColumn(
        "meta",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length("payload").cast("long").alias("n_bytes"),
        ),
    )
