"""Streaming session windows over the turn stream + stream-static
dimension enrichment.

Completes the streaming surface next to the tumbling-window rollup
(``windowed.py``): conversations don't align to fixed windows — a
conversation "sitting" is a SESSION (turns separated by less than a
gap), and Spark's native ``session_window`` keeps exactly the right
state for it: one open session per active conversation, closed and
emitted (append mode) when the watermark passes ``gap`` beyond its last
turn.  State is bounded by ACTIVE conversations, never by history —
the property that matters at 10^12 turns.

The optional role-cost dimension demonstrates the canonical
stream-static broadcast join: the static side is re-read per
micro-batch planner-side and broadcast, so enrichment adds ZERO
streaming state and no stream-side shuffle before the session
aggregate.

Reference analog: the per-document metering rollup
(``utils/__init__.py:73-96``) — here per conversation-sitting instead
of per document, continuously.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_conv_sessions(
    turns: DataFrame,
    gap: str = "5 minutes",
    watermark_delay: str = "2 minutes",
    role_costs: DataFrame | None = None,
) -> DataFrame:
    """Per-conversation session rollup (native ``session_window``):
    one row per (conv_id, sitting) with bounds, turn/char counts and —
    when ``role_costs (role, cost_per_turn)`` is given — the metered
    session cost via a stream-static broadcast join.

    Works on a streaming OR batch frame (batch ignores the watermark,
    which makes the batch run the oracle for the streaming one)."""
    src = turns
    if turns.isStreaming:
        src = turns.withWatermark("ts", watermark_delay)
    cost_col = F.lit(0.0)
    if role_costs is not None:
        src = src.join(F.broadcast(role_costs), "role", "left")
        cost_col = F.coalesce(F.col("cost_per_turn"), F.lit(0.0))
    return (
        src.groupBy(
            F.session_window(F.col("ts"), gap).alias("sess"),
            F.col("conv_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.length("text")).cast("long").alias("n_chars"),
            F.round(F.sum(cost_col), 6).alias("cost"),
        )
        .select(
            "conv_id",
            F.col("sess.start").alias("sess_start"),
            F.col("sess.end").alias("sess_end"),
            "n_turns",
            "n_chars",
            "cost",
        )
    )


def run_conv_sessions(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gap: str = "5 minutes",
    watermark_delay: str = "2 minutes",
    role_costs: DataFrame | None = None,
    timeout_sec: int = 600,
) -> None:
    """Drain available input through the session rollup (append mode:
    only CLOSED sessions reach the sink — exactly-once per session;
    open-session state survives drains via the checkpoint)."""
    from ..datagen.transcripts import transcripts_spark_schema

    stream = (
        spark.readStream.schema(transcripts_spark_schema()).parquet(input_dir)
    )
    out = stream_conv_sessions(stream, gap, watermark_delay, role_costs)
    q = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
