"""Event-time windowed aggregation with watermark-based late-data policy.

The brief's streaming contract: ``readStream`` → transformations →
``writeStream`` with watermarks + windowed aggs for late data.  The
reference's closest analog is the metering rollup (``utils/
__init__.py:73-96`` merged per document run); here the rollup becomes a
continuous per-window metric stream over arriving transcript turns.

Semantics (pinned by tests/test_streaming_windowed.py):

* tumbling event-time windows over the turn timestamp ``ts``;
* ``withWatermark(ts, delay)``: a window finalizes (emits, append mode)
  once the watermark — max observed event time minus ``delay`` — passes
  its end; turns arriving after their window finalized are DROPPED, the
  standard bounded-state late-data policy (state cannot grow forever at
  10^12-turn scale);
* state lives in the sink checkpoint: a later ``availableNow`` drain
  resumes the unfinalized windows exactly (no double emit, no loss).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_turn_metrics(
    turns: DataFrame,
    window_duration: str = "1 minute",
    watermark_delay: str = "2 minutes",
) -> DataFrame:
    """Per (event-time window, role) turn metrics with late-data bound.

    Works on a streaming OR batch frame (batch ignores the watermark —
    useful as the oracle for the streaming result)."""
    src = turns
    if turns.isStreaming:
        src = turns.withWatermark("ts", watermark_delay)
    return (
        src.groupBy(F.window("ts", window_duration).alias("win"), "role")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.length("text")).cast("long").alias("n_chars"),
            F.approx_count_distinct("conv_id").alias("n_convs_approx"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "role",
            "n_turns",
            "n_chars",
            "n_convs_approx",
        )
    )


def run_windowed_metrics(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window_duration: str = "1 minute",
    watermark_delay: str = "2 minutes",
    timeout_sec: int = 600,
) -> None:
    """Drain available input through the windowed rollup (append mode:
    only FINALIZED windows reach the sink — exactly-once per window)."""
    from ..datagen.transcripts import transcripts_spark_schema

    stream = (
        spark.readStream.schema(transcripts_spark_schema()).parquet(input_dir)
    )
    out = windowed_turn_metrics(stream, window_duration, watermark_delay)
    q = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
