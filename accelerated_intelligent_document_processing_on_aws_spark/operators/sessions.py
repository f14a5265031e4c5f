"""Session-window rollup via Spark's NATIVE ``session_window``.

The gaps-and-islands sectionizer (``operators/sectionize.py``, reference
semantics `classification/service.py` holistic page runs) labels each row
with its island id through a lag+cumsum window — two passes over every
row.  When only PER-SESSION aggregates are needed, Spark's built-in
``session_window`` grouping does the merge inside one aggregation
operator (map-side partial merge included) and works unchanged in
Structured Streaming with a watermark — the dynamic-gap session primitive
the brief's streaming bullet names.

Semantics (pinned by the DuckDB islands oracle in q_session_window): an
event extends its session while ``ts - prev_ts < gap``; a difference of
EXACTLY ``gap`` starts a new session (the event's [ts, ts+gap) window no
longer overlaps the previous one).  ``session_start = min(ts)``,
``session_end = max(ts) + gap``.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def session_rollup(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    gap: str = "30 minutes",
    aggs: Optional[List[Column]] = None,
) -> DataFrame:
    """One row per (keys..., merged session): ``session_start``,
    ``session_end`` (last event + gap) plus ``n_events`` and any extra
    ``aggs``.  Works on batch frames and, with an upstream
    ``withWatermark``, on streams (append mode emits a session once the
    watermark passes its end)."""
    aggs = aggs or []
    w = F.session_window(F.col(ts_col), gap)
    out = df.groupBy(*keys, w.alias("w")).agg(
        F.count(F.lit(1)).alias("n_events"), *aggs
    )
    rest = [c for c in out.columns if c != "w" and c not in keys]
    return out.select(
        *keys,
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        *rest,
    )


def run_length_stats(
    df: DataFrame,
    key_col: str,
    label_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Consecutive same-label run statistics per key — the dialogue-shape
    audit (consecutive same-role turns signal broken alternation; long
    single-type event runs signal bot traffic or stuck agents): runs come
    from the gaps-and-islands change-flag cumsum (the sectionize.py G2
    pattern applied to label changes instead of time gaps).

    Columns: ``key, n_runs, max_run, mean_run`` (mean to 6 dp).

    Scale shape: one key-ordered window for the lag/cumsum, one
    (key, run) aggregate, one key aggregate — all on the same key
    hash, so AQE reuses the partitioning; no joins."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    flagged = df.select(
        F.col(key_col).alias("key"),
        F.col(label_col).alias("lbl"),
        F.when(
            F.lag(label_col).over(w).isNull()
            | (F.lag(label_col).over(w) != F.col(label_col)),
            1,
        )
        .otherwise(0)
        .alias("_chg"),
        F.col(ts_col).alias("_ts"),
        F.col(tiebreak_col).alias("_tb"),
    )
    w2 = (
        Window.partitionBy("key")
        .orderBy("_ts", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = (
        flagged.withColumn("_run", F.sum("_chg").over(w2))
        .groupBy("key", "_run")
        .agg(F.count(F.lit(1)).alias("_len"))
    )
    return runs.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_runs"),
        F.max("_len").alias("max_run"),
        F.round(F.avg("_len"), 6).alias("mean_run"),
    )


def turn_taking_stats(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    ts_col: str = "ts",
    lead_role: str = "user",
    round_to: int = 6,
) -> DataFrame:
    """Per-conversation turn-taking cadence over a transcript-shaped
    feed (conv_id, turn_idx, role, ts — the input_hint table): how many
    turns, how often the speaker actually changes between consecutive
    turns (alternation rate — monologue dumps and agent retry storms
    both crater it), the mean/max gap between turns in seconds, and the
    share of turns held by ``lead_role``.  The conversation-dynamics
    audit a dialogue-training pipeline runs per source before trusting
    multi-turn structure (a corpus whose "conversations" never
    alternate is mislabeled single-turn text).

    Columns: ``conv_id, n_turns, role_changes, alternation_rate,
    mean_gap_s, max_gap_s, lead_share`` (rate/gaps NULL for single-turn
    conversations).

    Scale shape: one conv-keyed exchange; the lag window runs under
    stable (conv_id, turn_idx) ordering — the same ordering contract
    the extraction pipeline pins — and the aggregate shares its
    partitioning.  State per conversation is O(1); mega-conversation
    skew lives in the window sort, which AQE skew-split handles because
    nothing here joins.

    Portability: gaps accumulate as integral MICROSECONDS (exact int64
    sums — a float-summed seconds mean drifts by summation order across
    engines); seconds appear only in the terminal divisions."""
    w = Window.partitionBy(conv_col).orderBy(idx_col)
    ax = F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
    prev_role = F.lag(F.col(role_col)).over(w)
    gap_us = ax - F.lag(ax).over(w)
    rows = df.select(
        F.col(conv_col).alias("conv_id"),
        F.col(role_col).alias("_role"),
        prev_role.alias("_prev"),
        gap_us.alias("_gap_us"),
    )
    n = F.count(F.lit(1))
    changes = F.sum(
        F.when(
            F.col("_prev").isNotNull()
            & (F.col("_role") != F.col("_prev")),
            1,
        ).otherwise(0)
    )
    g = rows.groupBy("conv_id").agg(
        n.alias("n_turns"),
        changes.alias("role_changes"),
        F.sum("_gap_us").alias("_gap_sum_us"),
        F.max("_gap_us").alias("_gap_max_us"),
        F.sum(
            F.when(F.col("_role") == lead_role, 1).otherwise(0)
        ).alias("_lead"),
    )
    return g.select(
        "conv_id",
        "n_turns",
        "role_changes",
        F.round(
            F.when(
                F.col("n_turns") > 1,
                F.col("role_changes")
                / (F.col("n_turns") - 1).cast("double"),
            ),
            round_to,
        ).alias("alternation_rate"),
        F.round(
            F.col("_gap_sum_us").cast("double")
            / (F.col("n_turns") - 1).cast("double")
            / F.lit(1e6),
            round_to,
        ).alias("mean_gap_s"),
        F.round(
            F.col("_gap_max_us").cast("double") / F.lit(1e6), round_to
        ).alias("max_gap_s"),
        F.round(
            F.col("_lead") / F.col("n_turns").cast("double"), round_to
        ).alias("lead_share"),
    )
