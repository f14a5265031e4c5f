"""Data-quality audit operators: Benford first-digit conformance and
inter-filter agreement (Cohen's kappa).

Reference parity: the reference validates single documents against
configured schemas (assessment/evaluation services); these are the
CORPUS-level audits a 100 TB ingest runs before trusting a feed — does a
numeric column's first-digit distribution look organic (Benford 1938;
fabricated or clipped feeds don't), and do two quality gates actually
measure different things (near-1 kappa means a redundant filter, near-0
means the gates disagree on what "bad" is and the cascade order matters).

Scale shape: both collapse the corpus to a handful of rows in their
FIRST aggregate (9 digit buckets; a 2×2 contingency) with map-side
combine, then do constant-size arithmetic — nothing downstream of the
first shuffle is larger than a screenful.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Benford expected first-digit probabilities log10(1 + 1/d), exact the
# same way in both engines (log10 of small integer ratios).
_BENFORD = {d: math.log10(1.0 + 1.0 / d) for d in range(1, 10)}


def first_digit(c: Column) -> Column:
    """First significant digit (1-9) of a positive numeric column:
    ``floor(v / 10^floor(log10 v) + 1e-9)`` — NULL for non-positive or
    null input.  The 1e-9 guard absorbs the binary-representation
    shortfall of decimal inputs (0.30/0.1 = 2.9999999999999996 would
    otherwise floor to 2); exact for fixed-precision numerics, and
    engine-portable (one log10 + one pow, the same libm calls the
    histogram sketch certifies)."""
    v = c.cast("double")
    mag = F.pow(F.lit(10.0), F.floor(F.log10(v)))
    return F.when(v > 0, F.floor(v / mag + F.lit(1e-9)).cast("int"))


def benford_digit_audit(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-group Benford's-law conformance of a numeric column: observed
    first-digit counts vs the log10(1+1/d) expectation, summarized as
    the chi-square statistic (8 dof).  High chi2 per n flags synthetic,
    clipped, or unit-mixed feeds — the classic forensic ingest audit.

    Columns: ``*key_cols, n, chi2`` (chi2 rounded; groups with no
    positive values are absent).

    Plan: one projection (first digit) → groupBy(keys, digit) with
    map-side combine (≤ 9 rows per group cross the shuffle) → the group
    total rides a keys window over those ≤ 9 rows (same partitioning,
    no extra exchange) → one group-sized aggregate folding the 9
    expected probabilities in as literals.  The corpus never moves;
    only digit counts do.
    """
    from pyspark.sql import Window

    d = df.select(
        *[F.col(k) for k in key_cols],
        first_digit(F.col(value_col)).alias("_d"),
    ).filter(F.col("_d").isNotNull())
    counts = (
        d.groupBy(*key_cols, "_d")
        .agg(F.count(F.lit(1)).alias("_c"))
        .withColumn(
            "_n", F.sum("_c").over(Window.partitionBy(*key_cols))
        )
    )
    exp = _benford_p(F.col("_d")) * F.col("_n").cast("double")
    dev = F.col("_c").cast("double") - exp
    # chi2 = sum over observed digits of (obs - exp)^2/exp, PLUS the
    # full expected mass of unobserved digits (obs=0 contributes exp)
    obs_terms = F.sum(dev * dev / exp)
    missing = F.lit(1.0) - F.sum(_benford_p(F.col("_d")))
    return counts.groupBy(*key_cols).agg(
        F.max("_n").cast("long").alias("n"),
        F.round(
            obs_terms + missing * F.max("_n").cast("double"), round_to
        ).alias("chi2"),
    )


def _benford_p(digit: Column) -> Column:
    p = F.lit(_BENFORD[9])
    for d in range(1, 9):
        p = F.when(digit == d, F.lit(_BENFORD[d])).otherwise(p)
    return p


def filter_agreement(
    df: DataFrame,
    label_a: Column,
    label_b: Column,
    round_to: int = 6,
) -> DataFrame:
    """Cohen's kappa between two boolean gates over the same corpus —
    the redundancy audit for a filter cascade (kappa ≈ 1: the second
    gate is dead weight; kappa ≈ 0: the gates disagree on what "bad"
    means and cascade ORDER changes the kept corpus).

    Returns ONE row: ``n, p_observed, p_expected, kappa`` where
    ``kappa = (p_o - p_e) / (1 - p_e)`` (0 when ``p_e`` is 1 — the
    degenerate all-one-cell case).

    Plan: one corpus-wide aggregate of four conditional counts (the
    2×2 contingency folds into sums — no groupBy at all, map-side
    partials only), then constant arithmetic.
    """
    a = label_a.cast("boolean")
    b = label_b.cast("boolean")
    agg = df.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum((a & b).cast("long")).cast("double").alias("_tt"),
        F.sum((a & ~b).cast("long")).cast("double").alias("_tf"),
        F.sum((~a & b).cast("long")).cast("double").alias("_ft"),
        F.sum((~a & ~b).cast("long")).cast("double").alias("_ff"),
    )
    po = (F.col("_tt") + F.col("_ff")) / F.col("_n")
    pa_t = (F.col("_tt") + F.col("_tf")) / F.col("_n")
    pb_t = (F.col("_tt") + F.col("_ft")) / F.col("_n")
    pe = pa_t * pb_t + (F.lit(1.0) - pa_t) * (F.lit(1.0) - pb_t)
    kappa = F.when(pe >= 1.0, F.lit(0.0)).otherwise(
        (po - pe) / (F.lit(1.0) - pe)
    )
    return agg.select(
        F.col("_n").cast("long").alias("n"),
        F.round(po, round_to).alias("p_observed"),
        F.round(pe, round_to).alias("p_expected"),
        F.round(kappa, round_to).alias("kappa"),
    )
