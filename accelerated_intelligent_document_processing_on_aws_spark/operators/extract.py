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
        T.StructField("spans", SPAN_TYPE),
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
        out_spans.append(spans)
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


def with_extraction(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append extraction columns to a transcripts DataFrame."""
    r = extract_udf(F.col(text_col)).alias("_x")
    return (
        df.withColumn("_x", r)
        .withColumn("extracted_text", F.col("_x.extracted_text"))
        .withColumn("spans", F.col("_x.spans"))
        .withColumn("payload_kinds", F.col("_x.payload_kinds"))
        .withColumn("is_boundary", F.col("_x.is_boundary"))
        .drop("_x")
    )
