"""Lineage / checkpoint table + resume semantics.

Reference analog: the classification retry cache — DynamoDB rows keyed
``classcache#{doc}#{workflow}`` let a retried run skip already-classified
pages (``classification/service.py:1455-1603``); our rebuild generalizes
this to per-PARTITION lineage (FIXTURES.md §4): one row per
``(run_id, input_snapshot_id, partition_id)`` with row/span counts, a
metrics map, and a status mirroring the reference Status enum
(``models.py:18``).

Resume = left anti-join of the partition set against COMMITTED rows for the
same input snapshot: a killed run restarted with the same input recomputes
only uncommitted buckets (north_rule resumability).  The checkpoint store
is an append-only parquet dir (atomic per-commit files); on Iceberg this
would be an append to a lineage table in the same catalog.
"""

from __future__ import annotations

import os
import uuid
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CHECKPOINT_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("input_snapshot_id", T.StringType()),
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("row_count", T.LongType()),
        T.StructField("span_count", T.LongType()),
        T.StructField("metrics", T.MapType(T.StringType(), T.LongType())),
        T.StructField("status", T.StringType()),
        T.StructField("committed_at", T.TimestampType()),
    ]
)


class CheckpointStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            f.endswith(".parquet") or not f.startswith("_")
            for f in os.listdir(self.path)
        )

    def read(self) -> Optional[DataFrame]:
        if not self._exists():
            return None
        return self.spark.read.schema(CHECKPOINT_SCHEMA).parquet(self.path)

    def committed_partitions(self, input_snapshot_id: str) -> List[int]:
        df = self.read()
        if df is None:
            return []
        rows = (
            df.filter(
                (F.col("input_snapshot_id") == input_snapshot_id)
                & (F.col("status") == "COMMITTED")
            )
            .select("partition_id")
            .distinct()
            .collect()
        )
        return sorted(r.partition_id for r in rows)

    def append(self, lineage_df: DataFrame) -> None:
        lineage_df.write.mode("append").parquet(self.path)


def lineage_from_output(
    out_df: DataFrame,
    run_id: str,
    input_snapshot_id: str,
    partition_col: str = "pt",
) -> DataFrame:
    """Aggregate per-bucket lineage from the extracted output DataFrame.

    metrics: per-payload-kind span counts + boundary count (metering-merge
    analog, ``utils/__init__.py:73-96`` → groupBy().sum()).
    """
    per_pt = out_df.groupBy(F.col(partition_col).alias("partition_id")).agg(
        F.count(F.lit(1)).alias("row_count"),
        F.sum(F.size("spans")).cast("long").alias("span_count"),
        F.map_from_arrays(
            F.array(F.lit("boundaries"), F.lit("empty_turns")),
            F.array(
                F.sum(F.col("is_boundary").cast("long")),
                F.sum((F.length("extracted_text") == 0).cast("long")),
            ),
        ).alias("metrics"),
    )
    return per_pt.select(
        F.lit(run_id).alias("run_id"),
        F.lit(input_snapshot_id).alias("input_snapshot_id"),
        F.col("partition_id").cast("int"),
        F.col("row_count").cast("long"),
        F.col("span_count").cast("long"),
        "metrics",
        F.lit("COMMITTED").alias("status"),
        F.current_timestamp().alias("committed_at"),
    )


def new_run_id() -> str:
    return uuid.uuid4().hex[:12]
