"""Watermarked stream-stream interval join: user turns paired with their
conversation's assistant responses as both streams arrive.

The last streaming primitive the brief's contract implies that the
package didn't yet exercise: two unbounded sides joined on an equality
key PLUS an event-time range, which is exactly the shape Spark's
stream-stream join requires for bounded state — the watermark plus the
``a_ts BETWEEN u_ts AND u_ts + max_lag`` predicate tells the state store
when a buffered row can never match again and is evicted.  Without the
time bound the state grows forever at 10^12-turn scale; with it, state
is O(watermark window * arrival rate) per key regardless of stream
length.

Semantics (pinned by tests/test_streaming_joined.py):

* inner join: a (user turn, assistant turn) pair emits once both sides
  have arrived and the range predicate holds — append mode, eager
  emission, exactly once across ``availableNow`` drains via the sink
  checkpoint;
* an assistant turn more than ``max_lag`` after the user turn never
  pairs (and its buffered state is dropped once the watermark passes);
* works identically on batch frames (no watermark) — the differential
  oracle used by the tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def response_pairs(
    turns: DataFrame,
    watermark_delay: str = "2 minutes",
    max_lag_sec: int = 300,
) -> DataFrame:
    """Pair each user turn with every assistant turn of the same
    conversation landing in ``(u_ts, u_ts + max_lag_sec]``.

    Returns ``conv_id, u_idx, a_idx, u_ts, a_ts, latency_sec``.  On a
    streaming input both sides carry the watermark, making this a
    state-bounded stream-stream join; on a batch input it is a plain
    range join usable as the oracle.
    """
    u = turns.filter(F.col("role") == "user")
    a = turns.filter(F.col("role") == "assistant")
    if turns.isStreaming:
        u = u.withWatermark("ts", watermark_delay)
        a = a.withWatermark("ts", watermark_delay)
    u = u.select(
        F.col("conv_id").alias("u_conv"),
        F.col("turn_idx").alias("u_idx"),
        F.col("ts").alias("u_ts"),
    )
    a = a.select(
        F.col("conv_id").alias("a_conv"),
        F.col("turn_idx").alias("a_idx"),
        F.col("ts").alias("a_ts"),
    )
    joined = u.join(
        a,
        (F.col("u_conv") == F.col("a_conv"))
        & (F.col("a_ts") > F.col("u_ts"))
        & (
            F.col("a_ts")
            <= F.col("u_ts") + F.expr(f"INTERVAL {int(max_lag_sec)} SECOND")
        ),
    )
    return joined.select(
        F.col("u_conv").alias("conv_id"),
        "u_idx",
        "a_idx",
        "u_ts",
        "a_ts",
        F.expr(
            "timestampdiff(MICROSECOND, u_ts, a_ts) / CAST(1000000 AS DOUBLE)"
        ).alias("latency_sec"),
    )


def run_response_pairs(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark_delay: str = "2 minutes",
    max_lag_sec: int = 300,
) -> None:
    """Drain the available input once (``availableNow``) through the
    stream-stream join into parquet, exactly-once via the checkpoint."""
    from .micro_batch import read_transcripts_stream

    stream = read_transcripts_stream(spark, input_dir)
    out = response_pairs(stream, watermark_delay, max_lag_sec)
    q = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
