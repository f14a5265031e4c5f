"""Shared plan-shaping helpers for operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Defend expensive per-row stages against under-partitioned scans.

    A small table often arrives as ONE parquet file → one input split → the
    whole shingle/signature/scoring stage runs on a single core while the
    rest idle.  At 100 TB the scan is naturally split; at test scale we must
    repartition.  Only reshuffles when the scan has fewer splits than the
    session's parallelism — a well-partitioned input is left untouched (no
    gratuitous exchange in the 1000-executor plan).
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
