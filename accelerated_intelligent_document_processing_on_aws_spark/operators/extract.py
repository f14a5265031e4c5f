"""Spark wiring of the extraction kernels — Arrow-batched, no per-row Python.

One vectorized ``pandas_udf`` applies the dispatcher kernel
(``kernels/extract.py``) to each Arrow record batch of turn texts and
returns a struct column ``(extracted_text, spans, payload_kinds,
is_boundary)``; Catalyst projects the struct fields without re-running the
UDF (the projection is collapsed).  This replaces the reference's
ThreadPoolExecutor-per-document fan-out (``ocr/service.py:396-412``) with
partition parallelism.

Scale notes (100 TB): the UDF is embarrassingly parallel per turn, so it
runs BEFORE any conv_id-keyed shuffle, on salted input partitions
(``pipeline.py``) — a 10^8-turn conversation never serializes through one
task for extraction; only the cheap sectionization window needs conv
locality.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels.extract import extract_turn

# Spans travel OFFSET-ONLY through the engine: the span contract
# (kernels/normalize.py) guarantees ``text == original[start:end]``, so the
# text field is redundant payload — it roughly doubles the Arrow transfer
# out of the UDF and the bytes through the conv-keyed window shuffle.  It
# is reconstructed JVM-side (``respan_with_text``: one substring per span)
# AFTER the shuffles, restoring the public 5-field schema byte-for-byte.
SPAN_CORE_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("span_id", T.IntegerType()),
            T.StructField("kind", T.StringType()),
            T.StructField("start", T.IntegerType()),
            T.StructField("end", T.IntegerType()),
        ]
    )
)

SPAN_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("span_id", T.IntegerType()),
            T.StructField("kind", T.StringType()),
            T.StructField("start", T.IntegerType()),
            T.StructField("end", T.IntegerType()),
            T.StructField("text", T.StringType()),
        ]
    )
)

EXTRACT_RESULT_TYPE = T.StructType(
    [
        T.StructField("extracted_text", T.StringType()),
        T.StructField("spans", SPAN_CORE_TYPE),
        T.StructField("payload_kinds", T.ArrayType(T.StringType())),
        T.StructField("is_boundary", T.BooleanType()),
    ]
)


@F.pandas_udf(EXTRACT_RESULT_TYPE)
def extract_udf(texts: pd.Series) -> pd.DataFrame:
    out_text, out_spans, out_kinds, out_bound = [], [], [], []
    for t in texts:
        et, spans, kinds, boundary = extract_turn(t)
        out_text.append(et)
        out_spans.append([s[:4] for s in spans])
        out_kinds.append(kinds)
        out_bound.append(boundary)
    return pd.DataFrame(
        {
            "extracted_text": out_text,
            "spans": out_spans,
            "payload_kinds": out_kinds,
            "is_boundary": out_bound,
        }
    )


def respan_with_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Rehydrate the span ``text`` field from offsets into the original
    text column (pure Catalyst, one substring per span) — applied after
    the shuffles so span text never rides an exchange."""
    t = F.col(text_col)
    return df.withColumn(
        "spans",
        F.transform(
            F.col("spans"),
            lambda s: F.struct(
                s["span_id"].alias("span_id"),
                s["kind"].alias("kind"),
                s["start"].alias("start"),
                s["end"].alias("end"),
                F.substring(t, s["start"] + 1, s["end"] - s["start"]).alias("text"),
            ),
        ),
    )


def with_extraction(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append extraction columns (spans offset-only; see respan_with_text)."""
    r = extract_udf(F.col(text_col)).alias("_x")
    return (
        df.withColumn("_x", r)
        .withColumn("extracted_text", F.col("_x.extracted_text"))
        .withColumn("spans", F.col("_x.spans"))
        .withColumn("payload_kinds", F.col("_x.payload_kinds"))
        .withColumn("is_boundary", F.col("_x.is_boundary"))
        .drop("_x")
    )
