"""Data-quality audit operators: Benford first-digit conformance,
inter-filter agreement (Cohen's kappa), Zipf's-law fit, MAD robust
outliers, and Gini concentration.

Reference parity: the reference validates single documents against
configured schemas (assessment/evaluation services); these are the
CORPUS-level audits a 100 TB ingest runs before trusting a feed — does a
numeric column's first-digit distribution look organic (Benford 1938;
fabricated or clipped feeds don't), do two quality gates actually
measure different things (near-1 kappa means a redundant filter, near-0
means the gates disagree on what "bad" is and the cascade order
matters), does a source's term-frequency curve look like natural
language (Zipf slope ≈ -1; templated/generated feeds flatten or
steepen it), which numeric feeds carry heavy-tailed junk (modified
z-score over median/MAD — mean/stddev are themselves corrupted by the
outliers they're meant to find), and how concentrated is corpus mass
across documents (Gini + top-share: one mega-source drowning the
mixture).

Scale shape: every audit collapses the corpus to group-sized state in
its FIRST aggregate (9 digit buckets; a 2×2 contingency; vocab term
counts; per-group medians; per-group rank sums) with map-side combine —
nothing downstream of the first shuffle is more than vocabulary-sized.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
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


def zipf_fit(
    df: DataFrame,
    key_cols: list[str],
    text_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-group Zipf's-law fit over the term-frequency distribution:
    rank terms by frequency (desc, term asc tiebreak) and OLS-fit
    ln(freq) on ln(rank).  Natural language sits near slope -1; template
    spam flattens the head (slope → 0 over the top ranks), generated
    gibberish decorrelates (low r²) — the linguistic twin of the Benford
    digit audit.

    Columns: ``*key_cols, n_terms, zipf_slope, r2`` (slope/r2 NULL for
    degenerate groups: one term, or all terms equally frequent).

    Numerics: the CENTERED formulas ``slope = Σdx·dy / Σdx²`` and
    ``r² = (Σdx·dy)² / (Σdx²·Σdy²)`` with dx = x - x̄ — the raw-moment
    form ``nΣxy - ΣxΣy`` cancels 10+ significant digits at real vocab
    sizes and would not survive cross-engine summation-order jitter at
    6-decimal rounding; the centered sums keep relative error ~1e-13.

    Plan: tokenize (split materialized once per doc, JVM-side) →
    groupBy(keys, term) with map-side combine (vocab-sized output) →
    ONE exchange to keys for the rank window; the mean windows and the
    final aggregate reuse that same partitioning — no further shuffle.
    The corpus crosses no shuffle; only term counts do.
    """
    from pyspark.sql import Window

    from accelerated_intelligent_document_processing_on_aws_spark.functions.text import (
        normalized_for_compare,
    )
    from accelerated_intelligent_document_processing_on_aws_spark.operators.common import (
        ensure_min_partitions,
    )

    toks = ensure_min_partitions(df).select(
        *[F.col(k) for k in key_cols],
        F.explode(
            F.filter(
                F.split(
                    normalized_for_compare(
                        F.coalesce(F.col(text_col), F.lit(""))
                    ),
                    " ",
                ),
                lambda t: t != F.lit(""),
            )
        ).alias("term"),
    )
    tf = toks.groupBy(*key_cols, "term").agg(F.count(F.lit(1)).alias("_c"))
    w_rank = Window.partitionBy(*key_cols).orderBy(
        F.col("_c").desc(), F.col("term").asc()
    )
    w_keys = Window.partitionBy(*key_cols)
    xy = tf.select(
        *key_cols,
        F.log(F.row_number().over(w_rank).cast("double")).alias("_x"),
        F.log(F.col("_c").cast("double")).alias("_y"),
    )
    centered = xy.select(
        *key_cols,
        (F.col("_x") - F.avg("_x").over(w_keys)).alias("_dx"),
        (F.col("_y") - F.avg("_y").over(w_keys)).alias("_dy"),
    )
    sxy = F.sum(F.col("_dx") * F.col("_dy"))
    sxx = F.sum(F.col("_dx") * F.col("_dx"))
    syy = F.sum(F.col("_dy") * F.col("_dy"))
    return centered.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(
            F.when(sxx > 0, sxy / sxx), round_to
        ).alias("zipf_slope"),
        F.round(
            F.when((sxx > 0) & (syy > 0), (sxy * sxy) / (sxx * syy)),
            round_to,
        ).alias("r2"),
    )


def robust_outliers(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    z: float = 3.5,
    exact: bool = True,
    accuracy: int = 10000,
    round_to: int = 6,
) -> DataFrame:
    """Per-group robust outlier census via the modified z-score
    (Iglewicz & Hoaglin 1993): flag ``0.6745·|v - median| > z·MAD``.
    Median/MAD are the right location/scale here because mean/stddev are
    themselves dragged by the outliers they're meant to find — the feed
    audit that catches unit-mixed and fat-fingered numeric columns.

    Columns: ``*key_cols, n, median, mad, n_outliers, outlier_frac``.
    A zero MAD (>50% of the group identical) flags any deviating value,
    and no identical value, which is the standard convention.

    ``exact=True`` (the certified path) uses Spark's exact interpolated
    median — per-group state is O(distinct values), fine for bounded
    groups.  At 100 TB with high-cardinality doubles set
    ``exact=False``: ``percentile_approx`` is a mergeable bounded-size
    sketch (map-side partials, no memory cliff) at the cost of rank
    error ≤ 1/accuracy.

    Plan: three passes over the (projected two-column) input — median,
    MAD, flag census — each collapsing to one row per group with
    map-side combine; the per-group stats come back via broadcast joins,
    so the input itself never shuffles.
    """
    d = df.select(
        *[F.col(k) for k in key_cols],
        F.col(value_col).cast("double").alias("_v"),
    ).filter(F.col("_v").isNotNull())

    def med(c):
        # quantized to 9 decimals: the interpolated median of an even
        # group is engine-implementation-sensitive in the last ulp
        # ((a+b)/2 vs a+(b-a)*0.5), and the outlier flag compares
        # against it — quantizing makes the boundary identical across
        # engines while being 1000x finer than the reported rounding
        m = F.median(c) if exact else F.percentile_approx(c, 0.5, accuracy)
        return F.round(m, 9)

    meds = d.groupBy(*key_cols).agg(med(F.col("_v")).alias("_med"))
    devs = d.join(F.broadcast(meds), key_cols).select(
        *key_cols,
        F.col("_med"),
        F.abs(F.col("_v") - F.col("_med")).alias("_ad"),
    )
    stats = devs.groupBy(*key_cols).agg(
        med(F.col("_ad")).alias("_mad"), F.first("_med").alias("_med")
    )
    flagged = d.join(F.broadcast(stats), key_cols)
    is_out = (
        F.lit(0.6745) * F.abs(F.col("_v") - F.col("_med"))
        > F.lit(float(z)) * F.col("_mad")
    )
    return (
        flagged.groupBy(*key_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(is_out.cast("long")).alias("n_outliers"),
            F.round(F.first("_med"), round_to).alias("median"),
            F.round(F.first("_mad"), round_to).alias("mad"),
        )
        .select(
            *key_cols,
            "n",
            "median",
            "mad",
            "n_outliers",
            F.round(
                F.col("n_outliers") / F.col("n").cast("double"), round_to
            ).alias("outlier_frac"),
        )
    )


def gini_concentration(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    top_frac: float = 0.01,
    round_to: int = 6,
) -> DataFrame:
    """Per-group Gini coefficient + top-share of a non-negative mass
    column — the mixture-balance audit: is one mega-document (or one
    crawl host) carrying half a source's mass?  Gini near 0 = uniform,
    near 1 = concentrated; ``top_share`` = fraction of total mass held
    by the top ``ceil(n·top_frac)`` rows.

    Uses the sorted-rank identity ``G = (2·Σ i·x₍ᵢ₎ - (n+1)·Σx) /
    (n·Σx)`` (x ascending).  Ties order arbitrarily but contribute
    identically (equal x swaps don't change Σi·x), so no tiebreak column
    is needed for determinism.

    Columns: ``*key_cols, n, total, gini, top_share``.

    Plan: ONE exchange (the keys window for rank + group count), then a
    same-partitioned aggregate.  State per group is rank sums, not
    values — nothing vocabulary- or corpus-sized survives the window.
    """
    from pyspark.sql import Window

    d = df.select(
        *[F.col(k) for k in key_cols],
        F.col(value_col).cast("double").alias("_x"),
    ).filter(F.col("_x").isNotNull() & (F.col("_x") >= 0))
    w_keys = Window.partitionBy(*key_cols)
    ranked = d.select(
        *key_cols,
        F.col("_x"),
        F.row_number()
        .over(Window.partitionBy(*key_cols).orderBy(F.col("_x").asc()))
        .cast("double")
        .alias("_i"),
        F.count(F.lit(1)).over(w_keys).cast("double").alias("_n"),
    )
    in_top = F.col("_i") > F.col("_n") - F.ceil(
        F.col("_n") * F.lit(float(top_frac))
    ).cast("double")
    sx = F.sum(F.col("_x"))
    six = F.sum(F.col("_i") * F.col("_x"))
    n = F.max(F.col("_n"))
    return ranked.groupBy(*key_cols).agg(
        F.max(F.col("_n")).cast("long").alias("n"),
        F.round(sx, round_to).alias("total"),
        F.round(
            F.when(
                sx > 0,
                (F.lit(2.0) * six - (n + F.lit(1.0)) * sx) / (n * sx),
            ),
            round_to,
        ).alias("gini"),
        F.round(
            F.when(sx > 0, F.sum(F.when(in_top, F.col("_x")).otherwise(F.lit(0.0))) / sx),
            round_to,
        ).alias("top_share"),
    )


def expectation_suite(df: DataFrame, checks: list[dict]) -> DataFrame:
    """Declarative data-quality expectation suite (the Deequ /
    Great-Expectations shape): evaluate a list of constraints against a
    table in ONE corpus aggregate and return one row per constraint.

    Check specs (dicts):

    - ``{"check": "completeness", "column": c, "threshold": t}`` —
      fraction of non-null values ≥ t (default 1.0)
    - ``{"check": "uniqueness", "column": c, "threshold": t}`` —
      exact distinct count / row count ≥ t (default 1.0)
    - ``{"check": "min_bound", "column": c, "bound": b}`` — MIN(c) ≥ b
    - ``{"check": "max_bound", "column": c, "bound": b}`` — MAX(c) ≤ b
    - ``{"check": "in_set", "column": c, "values": [...], "threshold":
      t}`` — fraction of rows whose value is in the set ≥ t
    - ``{"check": "matches", "column": c, "pattern": rx, "threshold":
      t}`` — fraction of non-null values matching the regex ≥ t
    - ``{"check": "row_count_min", "bound": b}`` — COUNT(*) ≥ b

    Why this lives in a 100 TB engine: a feed is promoted into the
    corpus only if its contract holds, and at scale the contract check
    must be ONE pass — this compiles every constraint into a single
    map-side-combinable aggregate (exact-distinct constraints add an
    Expand of the slim checked columns, Spark's standard multi-distinct
    plan) and explodes the 1-row result into the (constraint-count-
    sized) report.  Fractions are exact int64 ratios — engine-portable.

    Columns: ``check, column, metric, threshold, passed``.
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(checks):
        kind, col = c["check"], c.get("column")
        if kind == "completeness":
            aggs.append(F.count(F.col(col)).alias(f"_m{i}"))
        elif kind == "uniqueness":
            aggs.append(F.count_distinct(F.col(col)).alias(f"_m{i}"))
        elif kind == "min_bound":
            aggs.append(F.min(F.col(col)).cast("double").alias(f"_m{i}"))
        elif kind == "max_bound":
            aggs.append(F.max(F.col(col)).cast("double").alias(f"_m{i}"))
        elif kind == "in_set":
            aggs.append(
                F.sum(
                    F.col(col).isin(list(c["values"])).cast("long")
                ).alias(f"_m{i}")
            )
        elif kind == "matches":
            aggs.append(
                F.sum(
                    F.regexp_like(F.col(col), F.lit(c["pattern"])).cast(
                        "long"
                    )
                ).alias(f"_m{i}")
            )
        elif kind == "row_count_min":
            aggs.append(F.count(F.lit(1)).alias(f"_m{i}"))
        else:
            raise ValueError(f"unknown check kind: {kind}")
    one = df.agg(*aggs)

    n = F.col("_n").cast("double")
    rows: list[Column] = []
    for i, c in enumerate(checks):
        kind, col = c["check"], c.get("column")
        m = F.col(f"_m{i}").cast("double")
        if kind in ("completeness", "uniqueness", "in_set", "matches"):
            thr = float(c.get("threshold", 1.0))
            metric = F.when(F.col("_n") > 0, m / n)
            passed = metric.isNotNull() & (metric >= F.lit(thr))
        elif kind == "min_bound":
            thr = float(c["bound"])
            metric = m
            passed = metric.isNotNull() & (metric >= F.lit(thr))
        elif kind == "max_bound":
            thr = float(c["bound"])
            metric = m
            passed = metric.isNotNull() & (metric <= F.lit(thr))
        else:  # row_count_min
            thr = float(c["bound"])
            metric = m
            passed = metric >= F.lit(thr)
        rows.append(
            F.struct(
                F.lit(f"{kind}({col})" if col else kind).alias("check"),
                F.lit(col).cast("string").alias("column"),
                F.round(metric, 6).alias("metric"),
                F.lit(thr).alias("threshold"),
                passed.alias("passed"),
            )
        )
    return one.select(F.inline(F.array(*rows)))


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    bin_width: int = 1,
    epsilon: float = 1e-6,
    round_to: int = 6,
) -> DataFrame:
    """Population Stability Index between a reference and a current
    snapshot of an integer-binnable measure — the standard
    distribution-drift gate (PSI < 0.1 stable, 0.1-0.25 moderate,
    > 0.25 drifted) a corpus platform runs between ingest snapshots
    before retraining on the new slice.

    Bins = ``floor(value / bin_width)`` (integer-exact, engine-portable);
    per-bin shares are epsilon-clamped on BOTH sides (the standard
    zero-bin smoothing — PSI diverges on empty bins otherwise), each
    bin's term is ``(p_cur - p_ref) * ln(p_cur / p_ref)`` rounded to
    ``round_to``, and the one-row total sums the rounded terms (the JS-
    divergence discipline: ln portability is absorbed by the rounding).

    Columns: ``bin, p_ref, p_cur, psi_term`` — one row per bin present in
    EITHER side (full outer on the bin key).  Callers sum ``psi_term``
    for the headline number.

    Scale shape (100 TB): each snapshot collapses to its bin histogram
    first (one groupBy with map-side combine — bins are metadata-sized
    for any bounded measure); the outer join and shares run on the two
    histograms.  Nothing corpus-sized survives the first aggregate."""
    def hist(df: DataFrame, side: str) -> DataFrame:
        return (
            df.select(
                F.floor(F.col(value_col) / F.lit(bin_width))
                .cast("long")
                .alias("bin")
            )
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(f"_c_{side}"))
        )

    r, c = hist(ref, "ref"), hist(cur, "cur")
    joined = r.join(c, "bin", "full_outer").select(
        "bin",
        F.coalesce(F.col("_c_ref"), F.lit(0)).alias("_cr"),
        F.coalesce(F.col("_c_cur"), F.lit(0)).alias("_cc"),
    )
    wtot = Window.partitionBy()
    eps = float(epsilon)
    shares = joined.select(
        "bin",
        F.greatest(
            F.col("_cr") / F.sum("_cr").over(wtot), F.lit(eps)
        ).alias("_pr"),
        F.greatest(
            F.col("_cc") / F.sum("_cc").over(wtot), F.lit(eps)
        ).alias("_pc"),
    )
    return shares.select(
        "bin",
        F.round(F.col("_pr"), round_to).alias("p_ref"),
        F.round(F.col("_pc"), round_to).alias("p_cur"),
        F.round(
            (F.col("_pc") - F.col("_pr"))
            * F.log(F.col("_pc") / F.col("_pr")),
            round_to,
        ).alias("psi_term"),
    )


def k_anonymity_profile(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Privacy-risk profile of a release candidate under k-anonymity:
    rows sharing a quasi-identifier combination form an equivalence
    class; a class smaller than ``k`` re-identifies its members, and a
    class whose ``sensitive_col`` carries one distinct value leaks the
    attribute even at large k (l-diversity = 1).  The corpus-level
    companion to the row-level PII redaction operator
    (curation.pii_redact): redaction scrubs surface strings, this audits
    whether the released SCHEMA still identifies people — the check a
    training-data release runs before publishing per-source metadata.

    Output is a class-SIZE histogram, not per-class rows (bounded by
    the number of distinct class sizes, never corpus-sized):
    ``class_size, n_classes, rows, at_risk, min_ldiv, avg_ldiv`` where
    at_risk marks sizes below k.

    Scale shape: first aggregate collapses the corpus to one row per
    equivalence class (map-side combine on the quasi key; distinct
    sensitive values via a two-level exact count-distinct), second
    aggregate is class-count-sized.  No joins."""
    cls = df.groupBy(
        *[F.col(c) for c in quasi_cols], F.col(sensitive_col)
    ).agg(F.count(F.lit(1)).alias("_n"))
    per_class = cls.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.sum("_n").alias("_size"),
        F.count(F.lit(1)).alias("_ldiv"),
    )
    return (
        per_class.groupBy(F.col("_size").alias("class_size"))
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum("_size").alias("rows"),
            F.min("_ldiv").alias("min_ldiv"),
            F.round(F.avg("_ldiv"), round_to).alias("avg_ldiv"),
        )
        .select(
            "class_size",
            "n_classes",
            "rows",
            (F.col("class_size") < k).alias("at_risk"),
            "min_ldiv",
            "avg_ldiv",
        )
    )


def l_diversity_tcloseness(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-equivalence-class l-diversity and t-closeness — the two
    release-audit criteria that catch what plain k-anonymity misses
    (Machanavajjhala et al. 2007; Li et al. 2007): a large class whose
    sensitive attribute is homogeneous (l-diversity 1) or whose
    sensitive DISTRIBUTION is far from the corpus-wide one (high
    t-closeness distance) still leaks, no matter how many rows share
    the quasi key.  Completes the privacy family next to
    ``k_anonymity_profile``'s class-size histogram.

    Per class (one row per distinct quasi-identifier combination):
    ``size, l_distinct, entropy_l`` (``exp`` of the Shannon entropy of
    the class's sensitive distribution — the effective number of
    sensitive values) and ``tvd``, the total-variation distance to the
    global sensitive distribution.

    TVD over the full sensitive domain needs NO class×domain grid:
    values absent from the class contribute ``P_s/2`` each, so

        tvd = 0.5 * (1 + Σ_{s∈class} (|p_cs − P_s| − P_s))

    — one broadcast join of per-(class, s) rows against the
    domain-sized global frequency frame.

    Scale shape: corpus → (class, sensitive) counts in one map-side-
    combined aggregate; everything downstream is class- or
    domain-sized."""
    qc = [F.col(c) for c in quasi_cols]
    cs = df.groupBy(*qc, F.col(sensitive_col).alias("_s")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    cs = cs.localCheckpoint(eager=True)  # fans out: global freq + class rows
    total = cs.agg(F.sum("_n")).first()[0] or 0
    if total == 0:
        return cs.select(
            *quasi_cols,
            F.lit(0).cast("long").alias("size"),
            F.lit(0).cast("long").alias("l_distinct"),
            F.lit(None).cast("double").alias("entropy_l"),
            F.lit(None).cast("double").alias("tvd"),
        )
    glob = cs.groupBy("_s").agg(
        (F.sum("_n") / F.lit(float(total))).alias("_gp")
    )
    w_size = F.sum("_n").over(
        Window.partitionBy(*[F.col(c) for c in quasi_cols])
    )
    j = cs.withColumn("_size", w_size).join(F.broadcast(glob), "_s")
    p = F.col("_n") / F.col("_size").cast("double")
    return (
        j.groupBy(*[F.col(c) for c in quasi_cols])
        .agg(
            F.max("_size").alias("size"),
            F.count(F.lit(1)).alias("l_distinct"),
            F.round(F.exp(-F.sum(p * F.log(p))), round_to).alias("entropy_l"),
            F.round(
                F.lit(0.5)
                * (
                    F.lit(1.0)
                    + F.sum(F.abs(p - F.col("_gp")) - F.col("_gp"))
                ),
                round_to,
            ).alias("tvd"),
        )
        .select(
            *quasi_cols,
            F.col("size").cast("long").alias("size"),
            F.col("l_distinct").cast("long").alias("l_distinct"),
            "entropy_l",
            "tvd",
        )
    )


def fd_audit(
    df: DataFrame,
    lhs_col: str,
    rhs_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Approximate functional-dependency audit (g3 error, Kivinen &
    Mannila 1995): does ``lhs → rhs`` hold, and if not, how many rows
    must be removed to make it hold?  The schema-contract check a
    pipeline runs on denormalized feeds (does source determine lang?
    does doc_id determine its partition?) — an exact-FD assert is
    useless on dirty data; g3 quantifies the dirt.

    ``violations = Σ_groups (n_g − max_b count(b))``, ``g3 =
    violations / n``; FD holds exactly iff violations = 0.

    Returns ONE row: ``n, n_groups, violations, g3, holds``.

    Plan: two nested aggregates — (lhs, rhs) counts, then per-lhs
    max/sum (both map-side combined, second is group-cardinality) —
    and a final scalar reduction.  No joins, no windows.
    """
    ab = (
        df.groupBy(
            F.col(lhs_col).alias("_a"), F.col(rhs_col).alias("_b")
        ).agg(F.count(F.lit(1)).alias("_c"))
    )
    per_a = ab.groupBy("_a").agg(
        F.sum("_c").alias("_na"), F.max("_c").alias("_ma")
    )
    a = per_a.agg(
        F.sum("_na").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.col("_na") - F.col("_ma")).cast("long").alias("violations"),
    )
    return a.select(
        "n",
        "n_groups",
        "violations",
        F.round(
            F.col("violations").cast("double") / F.col("n").cast("double"),
            round_to,
        ).alias("g3"),
        (F.col("violations") == 0).alias("holds"),
    )


def dp_noisy_counts(
    df: DataFrame,
    group_col: str,
    epsilon: float = 1.0,
    salt: str = "dp",
    round_to: int = 6,
) -> DataFrame:
    """ε-differentially-private group counts via the Laplace mechanism
    (Dwork et al. 2006) with DETERMINISTIC noise: the per-group count
    (sensitivity 1) plus Laplace(1/ε) noise drawn by inverse-CDF from a
    uniform derived from ``md5(salt || group)`` — a pure function of
    the group key, so the release is reproducible across runs and
    engines (the hash_sample discipline applied to noise; a true
    release would rotate ``salt`` per publication).

    Returns one row per group: ``<group_col>, n, noisy_n, epsilon`` —
    ``n`` (the true count) is included for release-error AUDITING and
    must be dropped from an actual publication.

    Plan: one map-side-combined count aggregate; noise is per-GROUP
    arithmetic on the group-cardinality frame.  No joins, no windows.
    """
    g = F.col(group_col)
    cnt = df.groupBy(g.alias(group_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(group_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    c = u - F.lit(0.5)
    noise = (
        F.lit(-1.0 / float(epsilon))
        * F.signum(c)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(c))
    )
    return cnt.select(
        group_col,
        "n",
        F.round(F.col("n").cast("double") + noise, round_to).alias(
            "noisy_n"
        ),
        F.lit(float(epsilon)).alias("epsilon"),
    )


def ad_uniformity(
    df: DataFrame,
    value_col: str,
    id_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Anderson-Darling test of uniformity on (0, 1) (Anderson &
    Darling 1954, fully-specified case): tail-sensitive
    goodness-of-fit — the audit that certifies a HASH SAMPLER's
    uniform values actually behave uniformly (a biased u would skew
    every downstream hash_sample / dataset_split rate), catching tail
    defects the chi-square bucket test misses.

    ``A² = −n − (1/n)·Σ_j [(2j−1)·ln u_(j) + (2(n−j)+1)·ln(1−u_(j))]``
    over the sorted values; 5% asymptotic critical value 2.492.

    Returns ONE row: ``n, a2, uniform_ok``.

    Plan: one global row_number window over the AUDIT SAMPLE (callers
    bound the input — the test's power saturates long before corpus
    scale) + ONE aggregate.  ``id_col`` makes the sort total, so the
    rank assignment is engine-portable even under value ties.
    """
    u = F.col(value_col).cast("double")
    d = df.select(u.alias("_u"), F.col(id_col).alias("_id")).filter(
        u.isNotNull() & (u > 0) & (u < 1)
    )
    w = Window.orderBy("_u", "_id")
    ranked = d.select(
        "_u", F.row_number().over(w).cast("double").alias("_j")
    )
    nn = ranked.agg(F.count(F.lit(1)).alias("_n"))
    term = (F.lit(2.0) * F.col("_j") - F.lit(1.0)) * F.log("_u") + (
        F.lit(2.0) * (F.col("_n").cast("double") - F.col("_j"))
        + F.lit(1.0)
    ) * F.log(F.lit(1.0) - F.col("_u"))
    a = ranked.crossJoin(F.broadcast(nn)).agg(
        F.max("_n").cast("long").alias("n"),
        F.sum(term).alias("_s"),
    )
    n = F.col("n").cast("double")
    a2 = -n - F.col("_s") / n
    return a.select(
        "n",
        F.round(a2, round_to).alias("a2"),
        (a2 < F.lit(2.492)).alias("uniform_ok"),
    )
