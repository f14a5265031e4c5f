"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Treats image/audio/video as `binary` columns with a `struct` of metadata,
decoded/feature-extracted in Arrow-batched ``mapInPandas`` — the pattern a
100 TB training-data pipeline needs (decode never touches the driver, batch
shape bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``).

The sandbox has no image/audio codecs, so ``decode`` is STUBBED with a
deterministic fake (blake2b-seeded pseudo-decode) behind the same
signature; the Spark-side plumbing — schema, partition parallelism, UDF
batch iteration, column pruning before the heavy stage — is real and
tested.  Swap ``_fake_decode`` for a PIL/ffmpeg call in production.

Reference analog: page-image render/resize (``ocr/service.py:1144-1252``,
``idp_common/image/__init__.py:13``) — out of the rebuild's core path per
SURVEY.md S5, modeled here as the binary-column stage.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
    """Deterministic pseudo-decode (STUB for PIL/ffmpeg: same signature,
    stable output per payload).  Raises on None like a real codec would.
    md5-derived (not blake2b) so a SQL oracle can reproduce every output
    byte-for-byte from the payload."""
    if payload is None:
        raise ValueError("cannot decode null payload")
    h = hashlib.md5(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    n_frames = 1 if kind == "image" else 1 + h[2] % 32
    feats = np.frombuffer(h, dtype=np.uint8)[:N_FEATURES].astype(np.float64) / 255.0
    return width, height, n_frames, [float(x) for x in feats]


def decode_features(df: DataFrame) -> DataFrame:
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
                w, h, nf, feats = _fake_decode(payload, kind)
                rows.append((mid, kind, w, h, nf, feats))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "width", "height", "n_frames", "features",
                ],
            )

    pruned = df.select("media_id", "kind", "payload")
    return pruned.mapInPandas(_decode, FEATURES_SCHEMA)


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
