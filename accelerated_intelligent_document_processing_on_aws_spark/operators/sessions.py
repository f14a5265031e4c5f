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
