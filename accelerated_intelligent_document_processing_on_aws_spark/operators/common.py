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
    if num_partitions(df) < target:
        return df.repartition(target)
    return df


def num_partitions(df: DataFrame) -> int:
    """Physical partition count of a DataFrame's underlying RDD.

    Uses the JVM-side ``Dataset.rdd`` directly: PySpark's ``df.rdd``
    additionally builds the javaToPython conversion plan (Arrow/pickle
    serializer stage) just to ask for a count — measured ~3x slower per
    cold call, and operators probe this on every invocation."""
    return df._jdf.rdd().getNumPartitions()
