"""Classic OLAP operators with scale-safe plan shapes.

``skyline2d`` is the Pareto-frontier (skyline) operator from the OLAP
literature (Börzsönyi et al., ICDE 2001).  The textbook formulation is a
dominance self-join — quadratic and, as a non-equi join, a
BroadcastNestedLoopJoin in Spark, both banned by this repo's plan sweep.
For the 2-D case dominance has a total-order structure that collapses the
join to ONE window over a BOUNDED aggregate:

1. aggregate the best (max) ``max_col`` per distinct ``min_col`` level —
   a map-side-combining groupBy, the only pass over the raw data;
2. over that (distinct-level-sized) frame, a running max ordered by
   ``min_col`` identifies the levels whose best strictly improves on
   every cheaper level — the frontier;
3. broadcast the surviving (level, best) pairs back onto the raw frame.

The single-partition window in step 2 touches only the aggregated frame
(cardinality = distinct ``min_col`` values, bounded and tiny relative to
the table), never the 100 TB input; the join back is a broadcast hash
join, so the raw side's partitioning is preserved untouched.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline2d(
    df: DataFrame,
    min_col: str,
    max_col: str,
    keep_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Rows not dominated by any other row, where ``q`` dominates ``p``
    iff ``q.min_col <= p.min_col`` and ``q.max_col >= p.max_col`` with at
    least one strict inequality.  Ties on both dimensions are mutually
    non-dominating — all tied rows survive.  Rows with a NULL in either
    dimension are excluded (NULL is incomparable, never on the frontier).

    Returns ``keep_cols`` (default: all input columns) of the surviving
    rows.
    """
    keep = list(keep_cols) if keep_cols is not None else list(df.columns)
    pts = df.filter(F.col(min_col).isNotNull() & F.col(max_col).isNotNull())
    per = pts.groupBy(min_col).agg(F.max(max_col).alias("_best"))
    w = Window.orderBy(min_col).rowsBetween(Window.unboundedPreceding, -1)
    front = (
        per.withColumn("_prev", F.max("_best").over(w))
        .filter(F.col("_prev").isNull() | (F.col("_best") > F.col("_prev")))
        .select(min_col, "_best")
    )
    return (
        pts.join(F.broadcast(front), on=min_col)
        .filter(F.col(max_col) == F.col("_best"))
        .select(*keep)
    )


def simpson_reversals(
    df: DataFrame,
    stratum_col: str,
    treat_col,
    outcome_col,
) -> DataFrame:
    """Simpson's-paradox audit: per-stratum treatment-vs-control outcome
    rate difference against the pooled (stratum-ignoring) difference,
    flagging strata whose effect direction REVERSES the pooled one — the
    canonical aggregation trap in observational comparisons (Simpson
    1951).  A curation dashboard runs this before trusting any pooled
    quality delta between two pipeline variants.

    ``treat_col``/``outcome_col`` are boolean Columns (or names).  Output:
    one row per stratum with group sizes, per-stratum rates and ``diff``,
    the pooled ``overall_diff`` (same value on every row), and
    ``reversed`` — true iff both differences are nonzero with opposite
    signs.  One aggregate plus a size-1 broadcast; no reshuffle of the
    raw frame beyond the stratum groupBy.
    """
    t = F.col(treat_col) if isinstance(treat_col, str) else treat_col
    y = F.col(outcome_col) if isinstance(outcome_col, str) else outcome_col
    base = df.select(
        F.col(stratum_col).alias("stratum"),
        t.cast("int").alias("_t"),
        y.cast("int").alias("_y"),
    )
    per = base.groupBy("stratum").agg(
        F.sum("_t").alias("n_treat"),
        F.sum(F.expr("1 - _t")).alias("n_ctrl"),
        F.sum(F.expr("_t * _y")).alias("_yt"),
        F.sum(F.expr("(1 - _t) * _y")).alias("_yc"),
    )
    per = per.select(
        "stratum",
        "n_treat",
        "n_ctrl",
        F.round(F.col("_yt") / F.col("n_treat"), 6).alias("rate_treat"),
        F.round(F.col("_yc") / F.col("n_ctrl"), 6).alias("rate_ctrl"),
        F.round(
            F.col("_yt") / F.col("n_treat") - F.col("_yc") / F.col("n_ctrl"),
            6,
        ).alias("diff"),
    )
    overall = base.groupBy().agg(
        F.round(
            F.sum(F.expr("_t * _y")) / F.sum("_t")
            - F.sum(F.expr("(1 - _t) * _y")) / F.sum(F.expr("1 - _t")),
            6,
        ).alias("overall_diff")
    )
    return per.crossJoin(F.broadcast(overall)).withColumn(
        "reversed",
        (F.col("diff") != 0)
        & (F.col("overall_diff") != 0)
        & (F.signum("diff") != F.signum("overall_diff")),
    )


def abc_classification(
    df: DataFrame,
    key_col: str,
    value_col,
    a_cut: float = 0.8,
    b_cut: float = 0.95,
    round_to: int = 6,
) -> DataFrame:
    """ABC / Pareto contribution classification: rank keys by value
    descending, classify by the cumulative share BEFORE each key
    (< ``a_cut`` → A, < ``b_cut`` → B, else C) — the "which 20% of
    sources carry 80% of the tokens" analysis that decides where
    curation attention goes.  Share-BEFORE (not through) keeps the
    first key in A however large it is.

    Returns one row per class: ``abc_class, n_keys, total_value,
    value_share``.

    Plan: ONE corpus aggregate to the key frame, one ranked cumulative
    window over that key-cardinality frame (deterministic total order:
    value desc, key), one 3-row aggregate.
    """
    v = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "double"
    )
    per_k = df.groupBy(F.col(key_col).alias("k")).agg(
        F.coalesce(F.sum(v), F.lit(0.0)).alias("v")
    )
    w = Window.orderBy(F.col("v").desc(), F.col("k"))
    wall = Window.partitionBy()
    staged = per_k.withColumn(
        "_cum", F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn("_tot", F.sum("v").over(wall))
    before = (F.col("_cum") - F.col("v")) / F.col("_tot")
    cls = (
        F.when(before < F.lit(float(a_cut)), F.lit("A"))
        .when(before < F.lit(float(b_cut)), F.lit("B"))
        .otherwise(F.lit("C"))
    )
    return (
        staged.groupBy(cls.alias("abc_class"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.round(F.sum("v"), round_to).alias("total_value"),
            F.round(
                F.sum(F.col("v") / F.col("_tot")), round_to
            ).alias("value_share"),
        )
    )
