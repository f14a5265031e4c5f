"""Hypothesis-testing operators for corpus experiment analysis:
two-proportion z-tests across group pairs and the Mann-Whitney U
rank-sum test.

Why these live in a 100 TB engine: curation decisions ("did the new
filter change the pass rate?", "do two crawls draw from the same length
distribution?") are A/B questions over groups too large for exact
permutation tests — the classical asymptotic statistics are the right
tool, and both reduce to tiny aggregates so the corpus never feeds a
driver-side stats library.

Scale shape: the z-test collapses each group to (n, successes) before
any pair work (pairs are group-count², never row-count); Mann-Whitney
needs one global rank over the two groups' values — a single sort-based
window, tie handling in exact integer/rational arithmetic — then one
aggregate.  Nothing pair- or corpus-sized survives the first shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def prop_ztest_pairs(
    df: DataFrame,
    group_col: str,
    success: Column,
    round_to: int = 6,
) -> DataFrame:
    """Two-proportion z-test between every ordered pair of groups
    (a < b lexically): is ``success`` rate in group a different from
    group b?  ``z = (p̂₁-p̂₂) / √(p̂(1-p̂)(1/n₁+1/n₂))`` with the pooled
    proportion p̂ — |z| ≥ 1.96 rejects equality at 5%.

    Columns: ``group_a, group_b, n_a, n_b, rate_a, rate_b, z``
    (z NULL when the pooled variance is 0: all-success or all-failure
    in both groups).

    Plan: ONE corpus aggregate to (group, n, successes) — map-side
    combine — then a self-join of that group-count-sized frame
    (broadcast both sides are tiny) and constant arithmetic.  The pair
    blow-up is groups², never rows².
    """
    g = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(success.cast("long")).alias("s"),
    )
    a = g.select(
        F.col("g").alias("group_a"),
        F.col("n").alias("n_a"),
        F.col("s").alias("s_a"),
    )
    b = g.select(
        F.col("g").alias("group_b"),
        F.col("n").alias("n_b"),
        F.col("s").alias("s_b"),
    )
    pairs = a.join(F.broadcast(b), F.col("group_a") < F.col("group_b"))
    p1 = F.col("s_a").cast("double") / F.col("n_a").cast("double")
    p2 = F.col("s_b").cast("double") / F.col("n_b").cast("double")
    pp = (F.col("s_a") + F.col("s_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    var = (
        pp
        * (F.lit(1.0) - pp)
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    return pairs.select(
        "group_a",
        "group_b",
        "n_a",
        "n_b",
        F.round(p1, round_to).alias("rate_a"),
        F.round(p2, round_to).alias("rate_b"),
        F.round(
            F.when(var > 0, (p1 - p2) / F.sqrt(var)), round_to
        ).alias("z"),
    )


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    round_to: int = 6,
) -> DataFrame:
    """Mann-Whitney U rank-sum test (Mann & Whitney 1947): do two groups
    draw from the same distribution of ``value_col``?  Nonparametric —
    the distribution-shift audit that doesn't assume normality (the
    parametric t-test is wrecked by the heavy tails MAD flags).

    Average ranks for ties computed EXACTLY as ``rank + (ties-1)/2``
    (a RANK window plus a per-value count — integer/rational arithmetic,
    so cross-engine identical); the normal approximation uses the
    tie-corrected variance ``σ² = n₁n₂/12·((N+1) - Σ(t³-t)/(N(N-1)))``.

    Returns ONE row: ``n_a, n_b, u_a, u_b, z`` (U values are exact
    halves at worst; z NULL when σ² = 0, i.e. every value tied).

    Plan: filter to the two groups (pushed to the scan) → ONE
    corpus-sized aggregate collapsing to per-DISTINCT-VALUE tie counts
    (map-side combine) → the global rank window runs over distinct
    values only (value-cardinality rows, never corpus rows — rank sums
    Σrᵢ and the tie census Σ(t³-t) are both per-value algebra:
    ``Σranks(v) = t_a·(rank(v) + (t-1)/2)``) → one scalar aggregate.
    The corpus never crosses the single-partition window.
    """
    d = df.filter(F.col(group_col).isin([group_a, group_b])).select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("double").alias("_v"),
    ).filter(F.col("_v").isNotNull())
    vc = d.groupBy("_v").agg(
        F.count(F.lit(1)).alias("_t"),
        F.sum((F.col("g") == group_a).cast("long")).alias("_ta"),
    )
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    per_val = vc.select(
        "_t",
        "_ta",
        # first rank of this value = (# rows with smaller value) + 1
        (F.sum("_t").over(w) - F.col("_t") + F.lit(1)).alias("_r0"),
    )
    t = F.col("_t").cast("double")
    ta = F.col("_ta").cast("double")
    avg_rank = F.col("_r0").cast("double") + (t - F.lit(1.0)) / F.lit(2.0)
    agg = per_val.agg(
        F.sum(ta * avg_rank).alias("_ra"),
        F.sum("_ta").alias("_na"),
        F.sum(F.col("_t") - F.col("_ta")).alias("_nb"),
        F.sum(t * t * t - t).alias("_tsum"),
    )
    na = F.col("_na").cast("double")
    nb = F.col("_nb").cast("double")
    n = na + nb
    u_a = F.col("_ra") - na * (na + F.lit(1.0)) / F.lit(2.0)
    u_b = na * nb - u_a
    sigma2 = (
        na
        * nb
        / F.lit(12.0)
        * ((n + F.lit(1.0)) - F.col("_tsum") / (n * (n - F.lit(1.0))))
    )
    return agg.select(
        F.col("_na").alias("n_a"),
        F.col("_nb").alias("n_b"),
        F.round(u_a, round_to).alias("u_a"),
        F.round(u_b, round_to).alias("u_b"),
        F.round(
            F.when(sigma2 > 0, (u_a - na * nb / F.lit(2.0)) / F.sqrt(sigma2)),
            round_to,
        ).alias("z"),
    )


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """ANALYZE-style column profile: one output row per column with
    ``column, n, n_null, n_distinct, min_str, max_str`` — the
    first-look audit of an unfamiliar feed (null cliffs, constant
    columns, cardinality explosions).  min/max compare on the string
    form so the profile is type-uniform (numeric-aware profiling is the
    histogram sketch's job).

    ``exact_distinct=False`` (the 100 TB default) uses
    ``approx_count_distinct`` — one pass, mergeable HLL sketches, ≤2%
    relative error.  ``exact_distinct=True`` (the certified path) is
    exact but plans Spark's Expand for multiple distinct aggregates:
    the input is replicated once per profiled column before the
    shuffle — fine for a sampled profile, deliberate at full scale.

    Plan: ONE corpus scan, one aggregate computing every column's
    counts and string extrema side by side (map-side partials), then an
    explode of the single column-count-sized result row.
    """
    cols = cols or df.columns
    per_col = []
    for c in cols:
        s = F.col(c).cast("string")
        nd = (
            F.count_distinct(F.col(c))
            if exact_distinct
            else F.approx_count_distinct(F.col(c))
        )
        per_col.append(
            F.struct(
                F.lit(c).alias("column"),
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col(c).isNull().cast("long")).alias("n_null"),
                nd.alias("n_distinct"),
                F.min(s).alias("min_str"),
                F.max(s).alias("max_str"),
            ).alias(f"_p_{c}")
        )
    agg = df.agg(*per_col)
    stacked = agg.select(
        F.explode(F.array(*[F.col(f"_p_{c}") for c in cols])).alias("p")
    )
    return stacked.select("p.*")


def ks_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    round_to: int = 6,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test: the supremum gap between the
    two groups' empirical CDFs of ``value_col`` — the classic "did this
    crawl's length distribution shift anywhere?" audit, sensitive to
    location AND shape (Mann-Whitney only sees stochastic dominance).

    D is computed in EXACT integer arithmetic until the final division:
    ``D = max |c_a·n_b − c_b·n_a| / (n_a·n_b)`` over per-distinct-value
    cumulative counts — integer products are exact, the one division
    and the final ``sqrt`` are IEEE-deterministic, so the statistic is
    engine-portable without tolerance.  ``ks_z = √(n_a·n_b/(n_a+n_b))·D``
    (compare to the Kolmogorov critical value, 1.358 at 5%).  No
    p-value column: libm ``exp`` is not correctly-rounded and would
    break cross-engine equality.

    Returns ONE row: ``n_a, n_b, d, ks_z``.

    Plan: filter to the two groups (pushed to the scan) → ONE corpus
    aggregate to per-DISTINCT-VALUE counts (map-side combine) → the
    cumulative window runs over value-cardinality rows only → one
    scalar max.  Same discipline as mann_whitney_u: the corpus never
    crosses the single-partition window.
    """
    d = (
        df.filter(F.col(group_col).isin([group_a, group_b]))
        .select(
            F.col(group_col).alias("g"),
            F.col(value_col).cast("double").alias("_v"),
        )
        .filter(F.col("_v").isNotNull())
    )
    vc = d.groupBy("_v").agg(
        F.count(F.lit(1)).alias("_t"),
        F.sum((F.col("g") == group_a).cast("long")).alias("_ta"),
    )
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    per_val = vc.select(
        F.sum("_ta").over(w).alias("_ca"),
        F.sum(F.col("_t") - F.col("_ta")).over(w).alias("_cb"),
        F.sum("_ta").over(wall).alias("_na"),
        F.sum(F.col("_t") - F.col("_ta")).over(wall).alias("_nb"),
    )
    gap = F.abs(
        F.col("_ca") * F.col("_nb") - F.col("_cb") * F.col("_na")
    )
    agg = per_val.agg(
        F.max(gap).alias("_g"),
        F.max("_na").alias("_na"),
        F.max("_nb").alias("_nb"),
    )
    na = F.col("_na").cast("double")
    nb = F.col("_nb").cast("double")
    d_stat = F.col("_g").cast("double") / (na * nb)
    return agg.select(
        F.col("_na").alias("n_a"),
        F.col("_nb").alias("n_b"),
        F.round(d_stat, round_to).alias("d"),
        F.round(F.sqrt(na * nb / (na + nb)) * d_stat, round_to).alias(
            "ks_z"
        ),
    )


def chi2_independence(
    df: DataFrame,
    col_a: str,
    col_b: str,
    round_to: int = 6,
) -> DataFrame:
    """Pearson chi-squared test of independence between two categorical
    columns, plus Cramér's V effect size — "is language associated with
    source?" is the first question a mixture audit asks, and the chi2 /
    V pair separates significance (grows with n) from strength (doesn't).

    ``chi2 = Σ (o − e)²/e`` with ``e = row_margin·col_margin/n``;
    ``V = √(chi2 / (n·(min(R,C)−1)))``.  Cells absent from the data are
    REAL zero-observation cells (e ≠ 0) — they're reconstructed by the
    margin cross-join, not skipped, or chi2 would be silently deflated.

    Returns ONE row: ``n, n_rows, n_cols, dof, chi2, cramers_v``.

    Plan: ONE corpus aggregate to observed cell counts (map-side
    combine); margins re-aggregate the CELL frame (cell-cardinality
    rows, not corpus rows); the cross-join of the two margin frames is
    R×C — category-cardinality², never rows².  All arithmetic past the
    first aggregate runs on frames no larger than the contingency table.
    """
    cells = df.groupBy(
        F.col(col_a).alias("_a"), F.col(col_b).alias("_b")
    ).agg(F.count(F.lit(1)).alias("_o")).localCheckpoint(eager=False)
    ra = cells.groupBy("_a").agg(F.sum("_o").alias("_ra"))
    cb = cells.groupBy("_b").agg(F.sum("_o").alias("_cb"))
    # scalar frame: n, R, C — one row, broadcast under every cell
    dims = (
        ra.agg(
            F.sum("_ra").alias("_n"), F.count(F.lit(1)).alias("_r")
        ).crossJoin(cb.agg(F.count(F.lit(1)).alias("_c")))
    )
    full = (
        ra.crossJoin(F.broadcast(cb))
        .join(cells, ["_a", "_b"], "left")
        .crossJoin(F.broadcast(dims))
    )
    o = F.coalesce(F.col("_o"), F.lit(0)).cast("double")
    e = (
        F.col("_ra").cast("double")
        * F.col("_cb").cast("double")
        / F.col("_n").cast("double")
    )
    contrib = (o - e) * (o - e) / e
    out = full.groupBy("_n", "_r", "_c").agg(
        F.sum(contrib).alias("_chi2")
    )
    r = F.col("_r").cast("double")
    c = F.col("_c").cast("double")
    n = F.col("_n").cast("double")
    dof = (F.col("_r") - 1) * (F.col("_c") - 1)
    v = F.sqrt(
        F.col("_chi2") / (n * (F.least(r, c) - F.lit(1.0)))
    )
    return out.select(
        F.col("_n").cast("long").alias("n"),
        F.col("_r").cast("long").alias("n_rows"),
        F.col("_c").cast("long").alias("n_cols"),
        dof.cast("long").alias("dof"),
        F.round(F.col("_chi2"), round_to).alias("chi2"),
        F.round(v, round_to).alias("cramers_v"),
    )


def welch_ttest_pairs(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Welch's unequal-variance t-test between every ordered group pair
    on an INTEGER-valued metric — the mean-shift companion to
    prop_ztest_pairs (rates) and mann_whitney_u (distributions).

    Moments come from exact integer sums: ``Σx`` and ``Σx²`` are
    summed as int64 (exact within 2⁵³ when cast to double), so mean and
    sample variance are IDENTICAL IEEE expressions in both engines —
    no Welford-vs-shifted-algorithm drift, no summation-order noise.
    ``t = (m₁−m₂)/√(v₁/n₁+v₂/n₂)``; dof is Welch-Satterthwaite.

    Columns: ``group_a, group_b, n_a, n_b, mean_a, mean_b, t, dof``
    (t/dof NULL when both variances are 0).

    Plan: ONE corpus aggregate to (group, n, Σx, Σx²) — map-side
    combine — then a broadcast self-join of the group-count-sized frame
    and constant arithmetic.  Pairs are groups², never rows².
    """
    x = F.col(value_col).cast("long")
    g = df.filter(x.isNotNull()).groupBy(
        F.col(group_col).alias("g")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("s1"),
        F.sum(x * x).alias("s2"),
    )
    a = g.select(
        F.col("g").alias("group_a"),
        F.col("n").alias("n_a"),
        F.col("s1").alias("s1_a"),
        F.col("s2").alias("s2_a"),
    )
    b = g.select(
        F.col("g").alias("group_b"),
        F.col("n").alias("n_b"),
        F.col("s1").alias("s1_b"),
        F.col("s2").alias("s2_b"),
    )
    pairs = a.join(F.broadcast(b), F.col("group_a") < F.col("group_b"))

    def _mean(s1, n):
        return F.col(s1).cast("double") / F.col(n).cast("double")

    def _var(s1, s2, n):
        nn = F.col(n).cast("double")
        return (
            F.col(s2).cast("double")
            - F.col(s1).cast("double") * F.col(s1).cast("double") / nn
        ) / (nn - F.lit(1.0))

    m1, m2 = _mean("s1_a", "n_a"), _mean("s1_b", "n_b")
    v1, v2 = _var("s1_a", "s2_a", "n_a"), _var("s1_b", "s2_b", "n_b")
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    se2 = v1 / na + v2 / nb
    dof = (se2 * se2) / (
        (v1 / na) * (v1 / na) / (na - F.lit(1.0))
        + (v2 / nb) * (v2 / nb) / (nb - F.lit(1.0))
    )
    return pairs.select(
        "group_a",
        "group_b",
        "n_a",
        "n_b",
        F.round(m1, round_to).alias("mean_a"),
        F.round(m2, round_to).alias("mean_b"),
        F.round(F.when(se2 > 0, (m1 - m2) / F.sqrt(se2)), round_to).alias(
            "t"
        ),
        F.round(F.when(se2 > 0, dof), round_to).alias("dof"),
    )


def ols_fit_groups(
    df: DataFrame,
    group_col: str,
    x_col,
    y_col,
    round_to: int = 6,
) -> DataFrame:
    """Per-group simple linear regression (OLS) of y on x via the five
    sufficient moments — slope, intercept, and R².

    ``slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)``, ``intercept =
    (Σy − slope·Σx)/n``, ``R² = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)
    (nΣy² − (Σy)²))``.  Both NULL for a degenerate group (constant x;
    R² additionally NULL for constant y).

    Why this lives in a 100 TB engine: "is this metric trending, per
    segment?" is a regression per group — and the moment form makes it
    ONE map-side-combinable aggregate over the corpus (the per-group
    frame that survives is group-cardinality-sized).  No driver-side
    stats library ever sees row data.

    Columns: ``group, n, slope, intercept, r2``.
    """
    x = x_col if isinstance(x_col, Column) else F.col(x_col)
    y = y_col if isinstance(y_col, Column) else F.col(y_col)
    xd, yd = x.cast("double"), y.cast("double")
    g = (
        df.filter(x.isNotNull() & y.isNotNull())
        .groupBy(F.col(group_col).alias("group"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(xd).alias("sx"),
            F.sum(yd).alias("sy"),
            F.sum(xd * yd).alias("sxy"),
            F.sum(xd * xd).alias("sxx"),
            F.sum(yd * yd).alias("syy"),
        )
    )
    n = F.col("n").cast("double")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov / vx
    return g.select(
        "group",
        "n",
        F.round(F.when(vx > 0, slope), round_to).alias("slope"),
        F.round(
            F.when(vx > 0, (F.col("sy") - slope * F.col("sx")) / n),
            round_to,
        ).alias("intercept"),
        F.round(
            F.when((vx > 0) & (vy > 0), cov * cov / (vx * vy)), round_to
        ).alias("r2"),
    )


def anova_oneway(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """One-way ANOVA across the groups of ``group_col``: does the mean
    of ``value_col`` differ between ANY pair of groups?  The global
    F-test that precedes pairwise probing (q_welch_ttest) in a corpus
    experiment readout.

    Sum-of-squares decomposition from per-group moments only:
    ``SSB = Σ_g S_g²/n_g − S²/n``, ``SSW = Σx² − Σ_g S_g²/n_g``,
    ``F = (SSB/(k−1)) / (SSW/(n−k))``; also reports ``eta2 = SSB/SST``
    (effect size).  F is NULL when k < 2 or SSW = 0.

    Plan: ONE corpus aggregate to (group, n, Σx, Σx²) — map-side
    combine — then one aggregate of the group-cardinality frame.
    Integer inputs keep every moment exact int64, so the statistic is
    engine-portable without tolerance.

    Returns ONE row: ``k, n, f, eta2``.
    """
    v = F.col(value_col).cast("double")
    g = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(group_col).alias("g"))
        .agg(
            F.count(F.lit(1)).alias("ng"),
            F.sum(v).alias("sg"),
            F.sum(v * v).alias("qg"),
        )
    )
    a = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("ng").alias("n"),
        F.sum("sg").alias("s"),
        F.sum("qg").alias("q"),
        F.sum(
            F.col("sg") * F.col("sg") / F.col("ng").cast("double")
        ).alias("sb"),
    )
    n = F.col("n").cast("double")
    k = F.col("k").cast("double")
    ssb = F.col("sb") - F.col("s") * F.col("s") / n
    ssw = F.col("q") - F.col("sb")
    sst = F.col("q") - F.col("s") * F.col("s") / n
    f = (ssb / (k - F.lit(1.0))) / (ssw / (n - k))
    return a.select(
        "k",
        "n",
        F.round(
            F.when((F.col("k") >= 2) & (ssw > 0), f), round_to
        ).alias("f"),
        F.round(F.when(sst > 0, ssb / sst), round_to).alias("eta2"),
    )


def spearman_corr_groups(
    df: DataFrame,
    group_col: str,
    x_col,
    y_col,
    round_to: int = 6,
) -> DataFrame:
    """Per-group Spearman rank correlation between two columns —
    Pearson on average (tie-corrected, "fractional") ranks, the
    monotone-association readout that is robust to heavy-tailed corpus
    metrics where Pearson on raw values is dominated by outliers.

    Average rank of a tied value block = ``rank_min + (cnt − 1)/2``
    (a half-integer), so with n < ~2×10⁵ per group every rank moment is
    an EXACT double and the statistic is engine-portable without
    tolerance.

    Plan: two in-group rank windows (same ``group`` partitioning — one
    exchange), then one map-side-combinable moment aggregate per group.
    Nothing survives larger than the group-cardinality frame.

    Columns: ``group, n, rho`` (rho NULL when either column is constant
    within the group).
    """
    x = x_col if isinstance(x_col, Column) else F.col(x_col)
    y = y_col if isinstance(y_col, Column) else F.col(y_col)
    base = df.filter(x.isNotNull() & y.isNotNull()).select(
        F.col(group_col).alias("group"), x.alias("_x"), y.alias("_y")
    )

    def _avg_rank(col: str) -> Column:
        w_ord = Window.partitionBy("group").orderBy(col)
        w_tie = Window.partitionBy("group", col)
        return (
            F.rank().over(w_ord).cast("double")
            + (F.count(F.lit(1)).over(w_tie).cast("double") - 1.0) / 2.0
        )

    ranked = base.select(
        "group",
        _avg_rank("_x").alias("rx"),
        _avg_rank("_y").alias("ry"),
    )
    g = ranked.groupBy("group").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
    )
    n = F.col("n").cast("double")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    return g.select(
        "group",
        "n",
        F.round(
            F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy)), round_to
        ).alias("rho"),
    )


def transition_entropy(
    df: DataFrame,
    key_col: str,
    label_col: str,
    ts_col: str,
    tiebreak_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Entropy rate of the first-order Markov chain over per-key label
    sequences: ``H = -Σ_v p(v) Σ_w p(w|v) ln p(w|v)`` with the empirical
    previous-state marginal — ONE number summarizing how predictable the
    event stream is (0 = deterministic paths, ln(n_labels) = uniform
    chaos).  The information-theoretic audit a pipeline runs to detect
    bot traffic (too predictable) or instrumentation noise (too uniform)
    at corpus scale.

    Columns (one row): ``n_states, n_transitions, entropy_rate,
    max_entropy`` (ln of the state count — the uniform ceiling).

    Scale shape: lead() pairs under one key-ordered window, one
    (prev,next) count aggregate (vocab²-sized), then scalar folds over
    that metadata-sized table.  Per-term ln rounds to ``round_to`` before
    the sum (the JS-divergence portability discipline)."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    pairs = df.select(
        F.col(label_col).alias("prev"),
        F.lead(label_col).over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    counts = pairs.groupBy("prev", "nxt").agg(
        F.count(F.lit(1)).alias("c")
    )
    wp = Window.partitionBy("prev")
    wall = Window.partitionBy()
    terms = counts.select(
        "prev",
        "c",
        F.round(
            (F.col("c") / F.sum("c").over(wall))
            * -F.log(F.col("c") / F.sum("c").over(wp)),
            round_to + 3,
        ).alias("_t"),
    )
    return terms.agg(
        F.count_distinct("prev").cast("long").alias("n_states"),
        F.sum("c").cast("long").alias("n_transitions"),
        F.round(F.sum("_t"), round_to).alias("entropy_rate"),
        F.round(F.log(F.count_distinct("prev").cast("double")), round_to).alias(
            "max_entropy"
        ),
    )


def score_calibration(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Binned calibration table for a [0,1] score against a boolean label
    (the reliability-diagram data): per score-decile, observed positive
    rate vs mean predicted score and their gap — the audit a pipeline
    runs before trusting a quality/toxicity classifier's threshold at
    corpus scale (a miscalibrated 0.9 cut silently changes the kept-token
    budget).

    Columns: ``bin, n, mean_score, pos_rate, gap`` (gap = mean_score −
    pos_rate, the per-bin reliability residual; all 3 rounded).

    Scale shape: one groupBy on the bin key — n_bins-sized output, one
    map-side-combined aggregate, no joins."""
    b = F.least(
        F.floor(F.col(score_col) * F.lit(n_bins)).cast("int"),
        F.lit(n_bins - 1),
    )
    y = F.col(label_col).cast("int")
    return (
        df.select(b.alias("bin"), F.col(score_col).alias("s"), y.alias("y"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("s"), round_to).alias("mean_score"),
            F.round(F.avg("y"), round_to).alias("pos_rate"),
            F.round(F.avg("s") - F.avg("y"), round_to).alias("gap"),
        )
    )


def survival_km(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Kaplan-Meier survival estimator (Kaplan & Meier 1958) over
    right-censored durations: one row per distinct OBSERVED-event time
    with the risk-set size, event count, and the product-limit survival
    estimate — the time-to-conversion / retention curve with censoring
    done correctly (dropping censored users biases the curve down;
    counting them as converted biases it up).

    Input: one row per subject — ``duration_col`` (numeric time observed)
    and ``event_col`` (1 = event occurred at that time, 0 = censored).
    Columns: ``t, n_risk, d, surv`` where
    ``surv(t) = Π_{t_i <= t} (1 - d_i / n_i)``.

    Portability: n_risk/d are exact integer counts; the running product
    is computed as ``exp(Σ ln(1 - d/n))`` in BOTH engines with the same
    expression shape and rounded at the end (the JS-divergence ln
    discipline).  A time where every at-risk subject fails (surv hits
    exactly 0) emits 0 directly — ln(0) never evaluates.

    Scale shape: subjects collapse to per-time counts first (map-side
    combine, distinct-times-sized); risk sets come from ONE reverse
    cumulative window over that metadata-sized frame."""
    per_t = df.select(
        F.col(duration_col).cast("double").alias("t"),
        F.col(event_col).cast("int").alias("e"),
    ).groupBy("t").agg(
        F.count(F.lit(1)).alias("n_at"),
        F.sum("e").alias("d"),
    )
    # risk set at t = subjects with duration >= t: reverse cumulative sum
    w_rev = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    at_risk = per_t.withColumn("n_risk", F.sum("n_at").over(w_rev))
    ev = at_risk.filter(F.col("d") > 0)
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # exact-zero guard: a step with d == n_risk zeroes the curve from
    # there on; ln() only ever sees strictly positive survival factors
    frac = F.lit(1.0) - F.col("d") / F.col("n_risk")
    log_term = F.when(F.col("d") < F.col("n_risk"), F.log(frac)).otherwise(
        F.lit(None)
    )
    hit_zero = F.max((F.col("d") == F.col("n_risk")).cast("int")).over(w_cum)
    return (
        ev.withColumn("_ls", F.sum(log_term).over(w_cum))
        .select(
            "t",
            F.col("n_risk").cast("long").alias("n_risk"),
            F.col("d").cast("long").alias("d"),
            F.when(hit_zero == 1, F.lit(0.0))
            .otherwise(F.round(F.exp(F.col("_ls")), round_to))
            .alias("surv"),
        )
    )


def normal_sf(z: Column) -> Column:
    """Upper-tail normal survival function via the Abramowitz & Stegun
    7.1.26 polynomial (|error| < 7.5e-8 — beyond the 6-dp rounding every
    p-value here carries).  Spark has no erf builtin; this closed form
    is the documented operator contract and is written IDENTICALLY in
    the SQL oracles, so both engines evaluate the same expression tree.
    Input must be >= 0 (callers pass |z|)."""
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.2316419) * z)
    poly = t * (
        F.lit(0.319381530)
        + t
        * (
            F.lit(-0.356563782)
            + t
            * (
                F.lit(1.781477937)
                + t * (F.lit(-1.821255978) + t * F.lit(1.330274429))
            )
        )
    )
    phi = F.exp(F.lit(-0.5) * z * z) / F.lit(2.5066282746310002)
    return phi * poly


def bh_fdr(
    df: DataFrame,
    p_col: str,
    tiebreak_cols: list[str],
    alpha: float = 0.1,
) -> DataFrame:
    """Benjamini-Hochberg false-discovery-rate correction (Benjamini &
    Hochberg 1995) over a family of m hypotheses: rank p-values
    ascending, find the largest rank i with ``p_(i) <= (i/m) * alpha``,
    reject everything at or below it — the multiple-testing guard a
    platform applies before acting on a dashboard full of per-source
    test p-values (at alpha=0.1 and 50 sources, ~5 'significant' results
    are expected by chance alone).

    Columns: input + ``p_rank, m, crit, reject``.

    Portability: ranks are row_number over (p, tiebreaks); ``crit =
    rank * alpha / m`` is one multiply + one divide of exact inputs;
    callers pass ALREADY-ROUNDED p-values so the comparisons see
    identical doubles in both engines.

    Scale shape: the hypothesis family is groups-sized (never
    corpus-sized) — one unpartitioned window over that metadata frame."""
    w = Window.orderBy(F.col(p_col).asc(), *[F.col(c) for c in tiebreak_cols])
    wall = Window.partitionBy()
    ranked = (
        df.withColumn("p_rank", F.row_number().over(w))
        .withColumn("m", F.count(F.lit(1)).over(wall))
        .withColumn(
            "crit",
            F.col("p_rank") * F.lit(float(alpha)) / F.col("m"),
        )
    )
    cutoff = F.max(
        F.when(F.col(p_col) <= F.col("crit"), F.col("p_rank"))
    ).over(wall)
    return ranked.withColumn(
        "reject", F.coalesce(F.col("p_rank") <= cutoff, F.lit(False))
    )


def wilson_interval(
    df: DataFrame,
    group_col: str,
    success: Column,
    z: float = 1.96,
    round_to: int = 6,
) -> DataFrame:
    """Wilson score 95% confidence interval for a per-group success rate
    (Wilson 1927) — the small-sample-safe rate interval dashboards should
    use instead of the Wald interval (which collapses to width 0 at rates
    of 0 or 1).  Columns: ``group, n, successes, rate, lo, hi``.

    One map-side-combined aggregate to (group, n, s); the interval is
    constant arithmetic over exact integer counts, rounded at the end."""
    g = df.groupBy(F.col(group_col).alias("group")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(success.cast("long")).alias("successes"),
    )
    zz = F.lit(float(z) * float(z))
    n = F.col("n").cast("double")
    p = F.col("successes").cast("double") / n
    denom = F.lit(1.0) + zz / n
    center = (p + zz / (F.lit(2.0) * n)) / denom
    half = (
        F.lit(float(z))
        * F.sqrt(p * (F.lit(1.0) - p) / n + zz / (F.lit(4.0) * n * n))
        / denom
    )
    return g.select(
        "group",
        "n",
        "successes",
        F.round(p, round_to).alias("rate"),
        F.round(center - half, round_to).alias("lo"),
        F.round(center + half, round_to).alias("hi"),
    )


def roc_auc(
    df: DataFrame,
    group_col: str,
    score: Column,
    label: Column,
    round_to: int = 6,
) -> DataFrame:
    """Per-group ROC AUC of a score against a binary label via the
    rank-statistic identity ``AUC = (R_pos - n_pos(n_pos+1)/2) /
    (n_pos * n_neg)`` where ``R_pos`` is the sum of tie-averaged ranks
    of the positives — exactly the Mann-Whitney U normalization, i.e.
    P(score_pos > score_neg) + 0.5 * P(tie).  The one-number answer to
    "does this quality score actually separate the class I care
    about?", per source — the standard gate before a score is trusted
    as a curation filter.

    Columns: ``group, n, n_pos, n_neg, auc`` (auc NULL when either
    class is empty).

    Portability: tie-averaged rank = RANK() + (tie_count - 1)/2 —
    rank and tie_count are exact integers, doubled-rank sums stay
    integral in ``2*R_pos``, so the only float op is the final
    division (then round) — identical in both engines regardless of
    row order.

    Scale shape: one shuffle on the group key; both windows (rank and
    per-score tie count) share that partitioning; one aggregate ends
    the stage.  No joins, nothing corpus-sized crosses a second
    exchange."""
    w_rank = Window.partitionBy(F.col(group_col)).orderBy(score.asc())
    w_tie = Window.partitionBy(F.col(group_col), score)
    lab = label.cast("long")
    # 2 * tie-averaged rank keeps the sum integral until the division
    rank2 = 2 * F.rank().over(w_rank) + (F.count(F.lit(1)).over(w_tie) - 1)
    rows = df.select(
        F.col(group_col).alias("group"),
        lab.alias("_y"),
        rank2.alias("_r2"),
    )
    g = rows.groupBy("group").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_y").alias("n_pos"),
        F.sum(F.when(F.col("_y") == 1, F.col("_r2"))).alias("_r2pos"),
    )
    n_pos = F.col("n_pos").cast("double")
    n_neg = (F.col("n") - F.col("n_pos")).cast("double")
    auc = (
        F.col("_r2pos").cast("double") / F.lit(2.0)
        - n_pos * (n_pos + 1) / F.lit(2.0)
    ) / (n_pos * n_neg)
    return g.select(
        "group",
        "n",
        "n_pos",
        (F.col("n") - F.col("n_pos")).alias("n_neg"),
        F.round(
            F.when((n_pos > 0) & (n_neg > 0), auc), round_to
        ).alias("auc"),
    )


def fleiss_kappa(
    df: DataFrame,
    raters: list[Column],
    round_to: int = 6,
) -> DataFrame:
    """Fleiss' kappa (Fleiss 1971) — chance-corrected agreement among
    n >= 2 raters assigning one categorical label per item: the
    annotation-QA gate before a labeling rubric (or an ensemble of
    heuristic filters) is trusted at corpus scale.  Cohen's kappa (the
    existing q_filter_agreement) stops at two raters; Fleiss is the
    n-rater generalization.

    ``raters`` are Columns producing a STRING category per item.
    Output is ONE row: ``n_items, n_raters, p_bar, p_e, kappa``.

    Portability: every statistic reduces to INTEGER sums before its one
    division — observed agreement P̄ = 2·(agreeing rater pairs) /
    (N·n·(n−1)) where the pair count is a plain int64 sum of pairwise
    label equalities, and chance agreement P_e = Σ_j c_j² / (N·n)²
    where c_j are integer global category counts (Σ c_j² is summed as
    an int64, sidestepping float-order entirely).  kappa =
    (P̄ − P_e)/(1 − P_e) is then an identical IEEE expression in both
    engines, rounded once.

    Scale shape: one corpus-sized projection computes the per-item
    agreeing-pair count in whole-stage codegen (no explode for P̄), a
    second map-side-combined aggregate over the exploded (item, label)
    frame — N·n rows, still one pass — collapses to k category rows,
    and the final arithmetic runs on a 1-row frame.  No joins except
    the terminal 1×1 cross join."""
    n = len(raters)
    if n < 2:
        raise ValueError("fleiss_kappa needs at least 2 raters")
    labeled = df.select(
        *[r.cast("string").alias(f"_r{i}") for i, r in enumerate(raters)]
    )
    agree = None
    for i in range(n):
        for j in range(i + 1, n):
            term = (F.col(f"_r{i}") == F.col(f"_r{j}")).cast("long")
            agree = term if agree is None else agree + term
    per_item = labeled.select(agree.alias("_pairs"))
    tot = per_item.agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("_pairs").alias("_t"),
    )
    cats = (
        labeled.select(
            F.explode(
                F.array(*[F.col(f"_r{i}") for i in range(n)])
            ).alias("_lab")
        )
        .groupBy("_lab")
        .agg(F.count(F.lit(1)).alias("_c"))
        .agg(F.sum(F.col("_c") * F.col("_c")).alias("_c2"))
    )
    j = tot.crossJoin(cats)
    big_n = F.col("n_items").cast("double")
    p_bar = (
        F.lit(2.0)
        * F.col("_t").cast("double")
        / (big_n * F.lit(float(n * (n - 1))))
    )
    p_e = F.col("_c2").cast("double") / (
        (big_n * F.lit(float(n))) * (big_n * F.lit(float(n)))
    )
    return j.select(
        "n_items",
        F.lit(n).alias("n_raters"),
        F.round(p_bar, round_to).alias("p_bar"),
        F.round(p_e, round_to).alias("p_e"),
        F.round(
            F.when(p_e < 1.0, (p_bar - p_e) / (F.lit(1.0) - p_e)), round_to
        ).alias("kappa"),
    )


def bradley_terry(
    outcomes: DataFrame,
    winner_col: str,
    loser_col: str,
    weight_col: str | None = None,
    iterations: int = 8,
    round_to: int = 9,
) -> DataFrame:
    """Bradley-Terry preference strengths (Bradley & Terry 1952) from
    pairwise win/loss outcomes via Hunter's (2004) MM iteration — the
    aggregation behind RLHF preference data, arena-style model
    rankings, and A/B winner boards: ``P(i beats j) = p_i/(p_i+p_j)``.

    ``outcomes`` rows are matches (``winner_col``, ``loser_col``,
    optional integer ``weight_col`` for pre-aggregated counts).  Each
    round applies ``p_i' = W_i / Σ_{j≠i} n_ij/(p_i+p_j)`` then
    normalizes to Σp = 1, ROUNDING the normalized strength at
    ``round_to`` decimals per round — the q_pagerank discipline that
    makes a fixed-iteration result a pure function of the input in any
    engine.  Items with zero wins decay toward 0 (the MLE boundary);
    callers wanting regularization can append pseudo-matches.

    Returns ``(item, wins, matches, strength)``.

    Scale shape: matches aggregate once to the (i, j) dimension —
    pairs-of-items-sized, NEVER match-count-sized — and every round
    after that joins and aggregates only items²-bounded frames with
    lineage truncated per round (localCheckpoint).  For LLM-eval use
    the item set is models/policies: tiny by construction."""
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    directed = (
        outcomes.select(
            F.col(winner_col).cast("string").alias("i"),
            F.col(loser_col).cast("string").alias("j"),
            w.alias("_w"),
        )
        .groupBy("i", "j")
        .agg(F.sum("_w").alias("w"))
        .localCheckpoint(eager=False)
    )
    sym = (
        directed.select("i", "j", "w")
        .union(
            directed.select(
                F.col("j").alias("i"), F.col("i").alias("j"), "w"
            )
        )
        .groupBy("i", "j")
        .agg(F.sum("w").alias("n"))
        .localCheckpoint(eager=False)
    )
    items = (
        sym.select("i")
        .distinct()
        .join(
            directed.groupBy("i").agg(F.sum("w").alias("wins")),
            "i",
            "left",
        )
        .select("i", F.coalesce("wins", F.lit(0)).alias("wins"))
        .localCheckpoint(eager=True)
    )
    k = items.count()
    p = items.select("i", F.lit(round(1.0 / k, round_to)).alias("p"))
    for _ in range(int(iterations)):
        pi = p.select(F.col("i"), F.col("p").alias("_pi"))
        pj = p.select(F.col("i").alias("j"), F.col("p").alias("_pj"))
        denom = (
            sym.join(pi, "i")
            .join(pj, "j")
            .groupBy("i")
            .agg(
                F.sum(
                    F.col("n").cast("double")
                    / (F.col("_pi") + F.col("_pj"))
                ).alias("_d")
            )
        )
        raw = items.join(denom, "i").select(
            "i",
            (F.col("wins").cast("double") / F.col("_d")).alias("_raw"),
        )
        total = raw.agg(F.sum("_raw").alias("_s"))
        p = (
            raw.crossJoin(total)
            .select(
                "i",
                F.round(F.col("_raw") / F.col("_s"), round_to).alias("p"),
            )
            .localCheckpoint(eager=False)
        )
    n_match = sym.groupBy("i").agg(F.sum("n").alias("matches"))
    return (
        items.join(n_match, "i")
        .join(p, "i")
        .select(
            F.col("i").alias("item"),
            "wins",
            "matches",
            F.col("p").alias("strength"),
        )
    )


def isotonic_calibration(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Isotonic (PAV) recalibration of a binned score against a boolean
    label — score_calibration's monotone-repair twin: the reliability
    table SHOWS the miscalibration, this returns the best monotone fit
    of observed positive rate vs score bin (the pool-adjacent-violators
    solution), i.e. the lookup table that turns a raw score into a
    calibrated probability without ever inverting rank order.

    PAV is usually presented as a sequential pooling loop; here it is
    the closed MINIMAX form ``iso_i = max_{j<=i} min_{k>=i}
    avg(y over bins j..k)`` (Ayer et al. 1955) — which is pure
    join+aggregate algebra over the BINS frame, no iteration, no
    driver-side loop.

    Columns: ``bin, n, pos_rate, iso_rate`` (iso_rate is monotone
    non-decreasing in bin by construction).

    Portability: every pooled average is a ratio of two int64 prefix
    sums (successes / rows over a contiguous bin run) — exact doubles —
    and min/max never create new values, so iso_rate is bit-identical
    in any engine before the final round.

    Scale shape: ONE corpus-sized map-side-combined aggregate collapses
    to n_bins rows; the j<=i<=k triple join runs on the bins³ frame
    (10³ = 1000 rows at the default) — metadata algebra, like the
    Hungarian and BH-FDR stages."""
    b = F.least(
        F.floor(F.col(score_col) * F.lit(n_bins)).cast("int"),
        F.lit(n_bins - 1),
    )
    bins = (
        df.select(b.alias("bin"), F.col(label_col).cast("long").alias("y"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("s"))
        .localCheckpoint(eager=False)
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = bins.select(
        "bin",
        "n",
        "s",
        F.sum("n").over(w).alias("cn"),
        F.sum("s").over(w).alias("cs"),
    )
    lo = cum.select(
        F.col("bin").alias("j"),
        (F.col("cn") - F.col("n")).alias("cn0"),
        (F.col("cs") - F.col("s")).alias("cs0"),
    )
    hi = cum.select(
        F.col("bin").alias("k"), F.col("cn").alias("cn1"), F.col("cs").alias("cs1")
    )
    runs = (
        lo.join(hi, lo["j"] <= hi["k"])
        .select(
            "j",
            "k",
            (
                (F.col("cs1") - F.col("cs0")).cast("double")
                / (F.col("cn1") - F.col("cn0")).cast("double")
            ).alias("avg"),
        )
    )
    i_frame = bins.select(F.col("bin").alias("i"))
    inner = (
        i_frame.join(runs, (runs["j"] <= F.col("i")) & (runs["k"] >= F.col("i")))
        .groupBy("i", "j")
        .agg(F.min("avg").alias("m"))
        .groupBy("i")
        .agg(F.max("m").alias("iso"))
    )
    return (
        bins.join(inner, bins["bin"] == inner["i"])
        .select(
            "bin",
            "n",
            F.round(
                F.col("s").cast("double") / F.col("n").cast("double"), round_to
            ).alias("pos_rate"),
            F.round("iso", round_to).alias("iso_rate"),
        )
    )


def effect_sizes(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    round_to: int = 6,
) -> DataFrame:
    """Standardized effect sizes between two groups — the magnitude
    companion to the test family (q_welch_ttest / q_mann_whitney say
    WHETHER the groups differ; at corpus scale everything is
    'significant', so the decision variable is HOW MUCH):

    - Cohen's d = (mean_a − mean_b) / pooled SD, with Hedges' g small-
      sample correction ``g = d · (1 − 3/(4N−9))``;
    - Cliff's delta = P(a > b) − P(a < b), the nonparametric ordinal
      effect, computed EXACTLY from the Mann-Whitney per-distinct-value
      algebra as ``2·U_a/(n_a·n_b) − 1`` (tie-averaged ranks; no pair
      enumeration).

    Returns ONE row: ``n_a, n_b, mean_a, mean_b, cohens_d, hedges_g,
    cliffs_delta``.

    Portability: for integer-valued columns all moment sums (Σv, Σv²)
    and the rank algebra are exact int64/rational arithmetic; every
    output is one closed-form expression over those exact sums.

    Scale shape: one filtered corpus aggregate for the moments + one
    per-distinct-value aggregate for the ranks (map-side combine both);
    the rank window runs over value-cardinality rows only."""
    d = (
        df.filter(F.col(group_col).isin([group_a, group_b]))
        .select(
            (F.col(group_col) == group_a).alias("_a"),
            F.col(value_col).cast("double").alias("_v"),
        )
        .filter(F.col("_v").isNotNull())
        .localCheckpoint(eager=False)
    )
    mom = d.groupBy("_a").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_v").alias("s1"),
        F.sum(F.col("_v") * F.col("_v")).alias("s2"),
    )
    a = mom.filter(F.col("_a")).select(
        F.col("n").alias("n_a"), F.col("s1").alias("s1a"), F.col("s2").alias("s2a")
    )
    b = mom.filter(~F.col("_a")).select(
        F.col("n").alias("n_b"), F.col("s1").alias("s1b"), F.col("s2").alias("s2b")
    )
    # Cliff's delta via the mann_whitney_u distinct-value rank algebra
    vc = d.groupBy("_v").agg(
        F.count(F.lit(1)).alias("_t"),
        F.sum(F.col("_a").cast("long")).alias("_ta"),
    )
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    per_val = vc.select(
        "_t",
        "_ta",
        (F.sum("_t").over(w) - F.col("_t") + F.lit(1)).alias("_r0"),
    )
    t = F.col("_t").cast("double")
    avg_rank = F.col("_r0").cast("double") + (t - F.lit(1.0)) / F.lit(2.0)
    ranks = per_val.agg(
        F.sum(F.col("_ta").cast("double") * avg_rank).alias("ra")
    )
    j = a.crossJoin(b).crossJoin(ranks)
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    mean_a = F.col("s1a") / na
    mean_b = F.col("s1b") / nb
    var_a = (F.col("s2a") - F.col("s1a") * F.col("s1a") / na) / (na - 1)
    var_b = (F.col("s2b") - F.col("s1b") * F.col("s1b") / nb) / (nb - 1)
    sp = F.sqrt(((na - 1) * var_a + (nb - 1) * var_b) / (na + nb - 2))
    dd = (mean_a - mean_b) / sp
    g = dd * (F.lit(1.0) - F.lit(3.0) / (F.lit(4.0) * (na + nb) - F.lit(9.0)))
    u_a = F.col("ra") - na * (na + 1) / F.lit(2.0)
    delta = F.lit(2.0) * u_a / (na * nb) - F.lit(1.0)
    return j.select(
        "n_a",
        "n_b",
        F.round(mean_a, round_to).alias("mean_a"),
        F.round(mean_b, round_to).alias("mean_b"),
        F.round(F.when(sp > 0, dd), round_to).alias("cohens_d"),
        F.round(F.when(sp > 0, g), round_to).alias("hedges_g"),
        F.round(delta, round_to).alias("cliffs_delta"),
    )


def conformal_threshold(
    df: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str,
    alpha: float = 0.1,
    seed: str = "s42",
    round_to: int = 6,
) -> DataFrame:
    """Split-conformal prediction threshold per group (Vovk et al.;
    Angelopoulos & Bates 2023 tutorial form): hash-split the rows into a
    calibration and a test half, take the k-th smallest calibration
    nonconformity score with ``k = ceil((n_cal + 1)(1 − alpha))``, and
    report the EMPIRICAL coverage of that threshold on the held-out
    half — the distribution-free guarantee check (coverage ≈ 1 − alpha)
    a platform runs before shipping 'flag anything above the 90th
    percentile' rules.

    Columns: ``group, n_cal, n_test, k, threshold, coverage``
    (threshold NULL when k > n_cal — alpha too small for the
    calibration size; coverage NULL when the test half is empty).

    Portability: the split is the repo's md5(seed||id) convention (a
    pure function of the key); k is exact integer arithmetic; the k-th
    smallest VALUE comes from per-distinct-value cumulative counts
    (min v with cum ≥ k — the mann_whitney_u discipline, well-defined
    under ties in any engine); coverage is an exact count ratio.

    Scale shape: one corpus aggregate to (group, value) tie counts; the
    order-statistic window runs over value-cardinality rows per group;
    one broadcast-sized join attaches thresholds back to the test-half
    counts."""
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    d = df.select(
        F.col(group_col).alias("group"),
        F.col(score_col).cast("double").alias("_v"),
        (h == 0).alias("_cal"),
    ).localCheckpoint(eager=False)
    vc = d.filter("_cal").groupBy("group", "_v").agg(
        F.count(F.lit(1)).alias("_t")
    )
    wg = Window.partitionBy("group")
    w = Window.partitionBy("group").orderBy("_v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = vc.select(
        "group",
        "_v",
        F.sum("_t").over(w).alias("_cum"),
        F.sum("_t").over(wg).alias("n_cal"),
    )
    # k = ceil((n_cal + 1) * (1 - alpha)) in exact integer arithmetic
    # over the rational alpha = a_num/a_den
    from fractions import Fraction

    fr = Fraction(str(alpha))
    num, den = (fr.denominator - fr.numerator), fr.denominator
    k = F.floor(
        ((F.col("n_cal") + 1) * F.lit(int(num)) + F.lit(int(den - 1)))
        / F.lit(int(den))
    )
    thr = (
        cum.withColumn("k", k)
        .groupBy("group", "n_cal", "k")
        .agg(
            F.min(F.when(F.col("_cum") >= F.col("k"), F.col("_v"))).alias(
                "threshold"
            )
        )
    )
    test = d.filter(~F.col("_cal")).groupBy("group").agg(
        F.count(F.lit(1)).alias("n_test"),
    )
    both = thr.join(test, "group", "left")
    cov = d.filter(~F.col("_cal")).join(
        thr.select("group", "threshold"), "group"
    ).groupBy("group").agg(
        F.sum(
            (F.col("_v") <= F.col("threshold")).cast("long")
        ).alias("_covered")
    )
    return (
        both.join(cov, "group", "left")
        .select(
            "group",
            "n_cal",
            F.coalesce("n_test", F.lit(0)).alias("n_test"),
            "k",
            "threshold",
            F.round(
                F.col("_covered").cast("double")
                / F.col("n_test").cast("double"),
                round_to,
            ).alias("coverage"),
        )
    )


def jackknife_rate(
    df: DataFrame,
    unit_col: str,
    success: Column,
    round_to: int = 6,
) -> DataFrame:
    """Delete-one-unit jackknife sensitivity of a global success rate:
    for each unit (source, shard, day) the rate WITHOUT it,
    ``R₋ᵤ = (T − tᵤ)/(N − nᵤ)``, and its influence ``R₋ᵤ − R`` — the
    'which source is dragging the corpus metric' attribution that turns
    a dashboard number into an ablation decision, plus the jackknife
    standard error ``√((U−1)/U · Σ(R₋ᵤ − R̄₋)²)`` of the rate itself.

    Columns: ``unit, n, successes, rate_without, influence, jk_se``
    (jk_se repeated on every row — the frame is units-sized).

    Portability: every leave-one-out rate is a ratio of exact integer
    differences; only the SE's sum of squared deviations floats (over
    the UNITS-sized frame, rounded).

    Scale shape: ONE corpus-sized map-side-combined aggregate to the
    units frame; everything after is units-sized window algebra."""
    g = df.groupBy(F.col(unit_col).alias("unit")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(success.cast("long")).alias("successes"),
    )
    wall = Window.partitionBy()
    tot = g.select(
        "unit",
        "n",
        "successes",
        F.sum("n").over(wall).alias("_N"),
        F.sum("successes").over(wall).alias("_T"),
        F.count(F.lit(1)).over(wall).alias("_U"),
    )
    r_wo = (F.col("_T") - F.col("successes")).cast("double") / (
        F.col("_N") - F.col("n")
    ).cast("double")
    r_all = F.col("_T").cast("double") / F.col("_N").cast("double")
    with_r = tot.withColumn("_rwo", r_wo).withColumn(
        "_mrwo", F.avg("_rwo").over(wall)
    )
    u = F.col("_U").cast("double")
    se = F.sqrt(
        (u - 1)
        / u
        * F.sum(
            (F.col("_rwo") - F.col("_mrwo"))
            * (F.col("_rwo") - F.col("_mrwo"))
        ).over(wall)
    )
    return with_r.select(
        "unit",
        "n",
        "successes",
        F.round("_rwo", round_to).alias("rate_without"),
        F.round(F.col("_rwo") - r_all, round_to).alias("influence"),
        F.round(se, round_to).alias("jk_se"),
    )


def ranking_metrics(
    df: DataFrame,
    group_col: str,
    score: Column,
    label: Column,
    tiebreak: Column,
    k: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Per-group retrieval-ranking metrics of a score against a binary
    relevance label: Precision@k, Recall@k, MRR (reciprocal rank of the
    first relevant item) and binary NDCG@k — the standard report card
    for any ranked retrieval stage (BM25, ANN, RRF fusion) before its
    output is trusted to select training data.  The reference pipeline's
    evaluation service reports per-document accuracy rollups
    (idp_common/evaluation/service.py); this is the ranked-retrieval
    analog of that rollup for the engine's search operators.

    ``tiebreak`` MUST be a group-unique column: score ties are broken
    deterministically so the ranking (and therefore every metric) is
    identical across engines and partitionings.

    IDCG@k is computed from the SAME ranked frame via the relevant-rank
    window (the j-th relevant item would ideally sit at position j), so
    no per-group ideal-table join is needed: ``ndcg = dcg / idcg`` where
    ``dcg = Σ_{pos≤k, rel} 1/log2(pos+1)`` and ``idcg = Σ_{j≤k, rel}
    1/log2(j+1)``.

    Columns: ``group, n, n_rel, p_at_k, r_at_k, mrr, ndcg`` (metric
    columns NULL when the group has no relevant items, except p_at_k
    which is 0 then).

    Scale shape: one shuffle on the group key; the position window and
    the relevant-index window share that partitioning; one aggregate
    ends the stage.  No joins, output is group-count-sized."""
    w_pos = Window.partitionBy(F.col(group_col)).orderBy(
        score.desc(), tiebreak.asc()
    )
    rel = label.cast("long")
    rows = df.select(
        F.col(group_col).alias("group"),
        rel.alias("_rel"),
        F.row_number().over(w_pos).alias("_pos"),
    )
    w_relidx = (
        Window.partitionBy("group")
        .orderBy("_pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rows = rows.withColumn("_relidx", F.sum("_rel").over(w_relidx))
    is_rel = F.col("_rel") == 1
    dcg_term = F.when(
        is_rel & (F.col("_pos") <= k),
        F.lit(1.0) / F.log2(F.col("_pos") + F.lit(1.0)),
    )
    idcg_term = F.when(
        is_rel & (F.col("_relidx") <= k),
        F.lit(1.0) / F.log2(F.col("_relidx") + F.lit(1.0)),
    )
    g = rows.groupBy("group").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_rel").alias("n_rel"),
        F.sum(F.when(is_rel & (F.col("_pos") <= k), 1).otherwise(0)).alias(
            "_hits_k"
        ),
        F.max(F.when(is_rel, F.lit(1.0) / F.col("_pos"))).alias("_mrr"),
        F.sum(dcg_term).alias("_dcg"),
        F.sum(idcg_term).alias("_idcg"),
    )
    has_rel = F.col("n_rel") > 0
    return g.select(
        "group",
        "n",
        "n_rel",
        F.round(F.col("_hits_k") / F.lit(float(k)), round_to).alias("p_at_k"),
        F.round(
            F.when(has_rel, F.col("_hits_k") / F.col("n_rel").cast("double")),
            round_to,
        ).alias("r_at_k"),
        F.round(F.when(has_rel, F.col("_mrr")), round_to).alias("mrr"),
        F.round(
            F.when(has_rel, F.col("_dcg") / F.col("_idcg")), round_to
        ).alias("ndcg"),
    )


def krippendorff_alpha(
    df: DataFrame,
    unit: Column,
    raters: list[Column],
    round_to: int = 6,
) -> DataFrame:
    """Krippendorff's alpha (nominal metric) for inter-rater
    reliability WITH missing ratings — the generalization Fleiss' kappa
    (fleiss_kappa) cannot make: a NULL rater column simply drops out of
    the unit's coincidence counts instead of invalidating the item, so
    an abstaining heuristic gate (e.g. a language filter that only
    fires on text above a length floor) can still be scored against the
    panel.  alpha = 1 − D_o/D_e over the coincidence matrix:

        D_o = (1/n) Σ_u (m_u² − Σ_c k_uc²)/(m_u − 1)
        D_e = (n² − Σ_c n_c²) / (n (n − 1))

    with k_uc = ratings of category c on unit u, m_u = Σ_c k_uc
    (units with m_u < 2 are excluded per the estimator), n = Σ m_u,
    n_c = Σ_u k_uc.

    Columns: one row — ``n_units, n_ratings, d_o, d_e, alpha``.

    Portability: k, m, n, n_c and their squares are exact integers; the
    per-unit division is by (m_u − 1) ∈ {1..n_raters−1} (exact dyadic
    for ≤3 raters), then two final float divisions, rounded once.

    Scale shape: the unpivoted ratings collapse to (unit, category)
    counts in one map-side-combined aggregate; everything after is
    unit-sized then scalar.  No joins."""
    lab = F.explode(F.array(*raters)).alias("_c")
    rows = df.select(unit.alias("_u"), lab).filter(F.col("_c").isNotNull())
    k = rows.groupBy("_u", "_c").agg(F.count(F.lit(1)).alias("_k"))
    per_u = k.groupBy("_u").agg(
        F.sum("_k").alias("_m"),
        F.sum(F.col("_k") * F.col("_k")).alias("_k2"),
    )
    per_u = per_u.filter(F.col("_m") >= 2)
    # n_c must count only ratings on retained units
    kk = k.join(per_u.select("_u"), "_u")
    n_c = kk.groupBy("_c").agg(F.sum("_k").alias("_nc"))
    tot_c = n_c.agg(
        F.sum(F.col("_nc") * F.col("_nc")).alias("_nc2")
    )
    tot_u = per_u.agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum("_m").alias("n_ratings"),
        F.sum(
            (F.col("_m") * F.col("_m") - F.col("_k2")).cast("double")
            / (F.col("_m") - 1).cast("double")
        ).alias("_su"),
    )
    j = tot_u.crossJoin(tot_c)
    n = F.col("n_ratings").cast("double")
    d_o = F.col("_su") / n
    d_e = (n * n - F.col("_nc2").cast("double")) / (n * (n - 1))
    return j.select(
        "n_units",
        "n_ratings",
        F.round(d_o, round_to).alias("d_o"),
        F.round(d_e, round_to).alias("d_e"),
        F.round(F.lit(1.0) - d_o / d_e, round_to).alias("alpha"),
    )


def cuped_adjustment(
    df: DataFrame,
    group_col: str,
    pre_col: str,
    post_col: str,
    round_to: int = 6,
) -> DataFrame:
    """CUPED variance reduction (Deng, Xu, Kohavi & Walker 2013, WSDM):
    adjust each unit's experiment metric by its pre-period covariate,

        y' = y − θ·(x − x̄),   θ = cov(x, y) / var(x)

    with θ and x̄ estimated on the POOLED population (the standard
    assignment-independent estimator — using per-arm θ would bias the
    treatment effect).  Reports per group (experiment arm) the raw and
    adjusted means and sample variances plus the realized variance
    reduction — the sensitivity win that lets the same experiment
    detect an effect ~1/(1−ρ²) times smaller.

    Columns: ``group, n, mean_pre, mean_y, mean_y_adj, var_y,
    var_y_adj, var_reduction`` (sample variance, n−1; var_reduction =
    1 − var_adj/var_y).  θ and x̄ are computed by ONE eager pooled-
    moment action and folded into the plan as full-precision literals
    (the bm25 n_docs pattern — a one-row broadcast crossJoin would
    compile to BroadcastNestedLoopJoin, which the whole-registry plan
    sweep bans); both passes are single map-side-combined aggregates —
    the 100 TB shape is two scans, zero joins."""
    base = df.select(
        F.col(group_col).alias("group"),
        F.col(pre_col).cast("double").alias("_x"),
        F.col(post_col).cast("double").alias("_y"),
    )
    nn, sx, sy, sxy, sxx = base.agg(
        F.count(F.lit(1)),
        F.sum("_x"),
        F.sum("_y"),
        F.sum(F.col("_x") * F.col("_y")),
        F.sum(F.col("_x") * F.col("_x")),
    ).first()
    if not nn or sxx is None or (sxx - sx * sx / nn) == 0:
        theta, xbar = 0.0, 0.0
    else:
        xbar = sx / nn
        theta = (sxy - sx * sy / nn) / (sxx - sx * sx / nn)
    adj = base.withColumn(
        "_ya",
        F.col("_y")
        - F.lit(float(theta)) * (F.col("_x") - F.lit(float(xbar))),
    )
    n = F.count(F.lit(1))
    nd = n.cast("double")
    var_y = (
        F.sum(F.col("_y") * F.col("_y")) - F.sum("_y") * F.sum("_y") / nd
    ) / (nd - 1)
    var_ya = (
        F.sum(F.col("_ya") * F.col("_ya")) - F.sum("_ya") * F.sum("_ya") / nd
    ) / (nd - 1)
    return adj.groupBy("group").agg(
        n.cast("long").alias("n"),
        F.round(F.avg("_x"), round_to).alias("mean_pre"),
        F.round(F.avg("_y"), round_to).alias("mean_y"),
        F.round(F.avg("_ya"), round_to).alias("mean_y_adj"),
        F.round(var_y, round_to).alias("var_y"),
        F.round(var_ya, round_to).alias("var_y_adj"),
        F.round(F.lit(1.0) - var_ya / var_y, round_to).alias(
            "var_reduction"
        ),
    )


def categorical_association(
    df: DataFrame,
    a_col,
    b_col,
    round_to: int = 6,
) -> DataFrame:
    """Association strength between two categorical columns in one row:
    mutual information (nats), normalized MI (÷ sqrt(H_a·H_b)), the
    chi-square statistic, its degrees of freedom and Cramér's V — the
    feature-relevance readout a curation pipeline runs before trusting
    a cheap label ("does source predict quality class?").

    Chi-square uses the marginal-product identity
    ``chi2 = n · (Σ_cells o²/(r_a·c_b) − 1)`` so zero-observation cells
    (which contribute exactly their expected count under the classical
    (o−e)²/e form, via o=0) are accounted for WITHOUT materializing the
    full category grid — only observed cells are touched.  MI's zero
    cells contribute 0 by continuity, so the same cells frame serves
    both.

    Scale shape: ONE map-side-combined (a, b) count collapses the corpus
    to the observed-cell frame; marginals are two aggregates of that
    frame and join back cell-side (cells ≪ corpus).  The only row count
    that matters after the first shuffle is the number of distinct
    (a, b) pairs.  The scalar total rides as a literal via a driver
    count of the cells frame's sums — metadata-sized by construction.

    Columns: ``n, r_levels, c_levels, mi, nmi, chi2, dof, cramers_v``.
    """
    a = a_col if isinstance(a_col, Column) else F.col(a_col)
    b = b_col if isinstance(b_col, Column) else F.col(b_col)
    cells = (
        df.filter(a.isNotNull() & b.isNotNull())
        .select(a.alias("_a"), b.alias("_b"))
        .groupBy("_a", "_b")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    cells = cells.localCheckpoint(eager=True)  # fans out 3 ways below
    ra = cells.groupBy("_a").agg(F.sum("o").alias("ra"))
    cb = cells.groupBy("_b").agg(F.sum("o").alias("cb"))
    n = cells.agg(F.sum("o")).first()[0]
    if n is None:
        n = 0
    nf = F.lit(float(n))
    j = cells.join(F.broadcast(ra), "_a").join(F.broadcast(cb), "_b")
    o = F.col("o").cast("double")
    raf = F.col("ra").cast("double")
    cbf = F.col("cb").cast("double")
    agg = j.agg(
        F.sum((o / nf) * F.log((o * nf) / (raf * cbf))).alias("mi"),
        F.sum((o * o) / (raf * cbf)).alias("_s"),
        F.count(F.lit(1)).alias("_cells"),
    )
    ha = ra.agg(
        (-F.sum((F.col("ra") / nf) * F.log(F.col("ra") / nf))).alias("ha"),
        F.count(F.lit(1)).alias("r_levels"),
    )
    hb = cb.agg(
        (-F.sum((F.col("cb") / nf) * F.log(F.col("cb") / nf))).alias("hb"),
        F.count(F.lit(1)).alias("c_levels"),
    )
    out = agg.join(F.broadcast(ha)).join(F.broadcast(hb))
    chi2 = nf * (F.col("_s") - F.lit(1.0))
    dof = (F.col("r_levels") - 1) * (F.col("c_levels") - 1)
    mink = F.least(F.col("r_levels"), F.col("c_levels")).cast("double")
    return out.select(
        F.lit(int(n)).alias("n"),
        "r_levels",
        "c_levels",
        F.round(F.col("mi"), round_to).alias("mi"),
        F.round(
            F.when(
                (F.col("ha") > 0) & (F.col("hb") > 0),
                F.col("mi") / F.sqrt(F.col("ha") * F.col("hb")),
            ).otherwise(F.lit(0.0)),
            round_to,
        ).alias("nmi"),
        F.round(chi2, round_to).alias("chi2"),
        dof.cast("long").alias("dof"),
        F.round(
            F.when(
                (mink > 1) & (nf > 0), F.sqrt(F.greatest(chi2, F.lit(0.0)) / (nf * (mink - 1)))
            ).otherwise(F.lit(0.0)),
            round_to,
        ).alias("cramers_v"),
    )


def kendall_tau_groups(
    df: DataFrame,
    key_col: str,
    x_col,
    y_col,
    round_to: int = 6,
) -> DataFrame:
    """Kendall's tau-b rank correlation between two aligned series —
    the tie-corrected concordance measure; unlike Spearman it is a
    direct probability statement (P(concordant) − P(discordant)) and is
    robust to a single wild rank.

    Input is one row per key (e.g. per day) with the two measures; the
    all-pairs i<j comparison runs over THAT frame, so the join is
    keys², corpus-size-independent (the corpus collapsed to the keyed
    frame upstream).  tau_b = (C−D)/sqrt((n0−t_x)(n0−t_y)) with
    n0 = n(n−1)/2 and t_x/t_y the tied-pair counts, all from one
    aggregate over the pair frame.

    Columns: one row — ``n, concordant, discordant, ties_x, ties_y,
    tau_b``.
    """
    x = x_col if isinstance(x_col, Column) else F.col(x_col)
    y = y_col if isinstance(y_col, Column) else F.col(y_col)
    s = df.select(F.col(key_col).alias("_k"), x.alias("_x"), y.alias("_y"))
    a = s.select(
        F.col("_k").alias("k1"), F.col("_x").alias("x1"), F.col("_y").alias("y1")
    )
    b = s.select(
        F.col("_k").alias("k2"), F.col("_x").alias("x2"), F.col("_y").alias("y2")
    )
    pairs = a.join(F.broadcast(b), F.col("k1") < F.col("k2"))
    dx = F.col("x1") - F.col("x2")
    dy = F.col("y1") - F.col("y2")
    agg = pairs.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum((dx * dy > 0).cast("long")).alias("concordant"),
        F.sum((dx * dy < 0).cast("long")).alias("discordant"),
        F.sum((dx == 0).cast("long")).alias("ties_x"),
        F.sum((dy == 0).cast("long")).alias("ties_y"),
    )
    n0 = F.col("n0").cast("double")
    cd = (F.col("concordant") - F.col("discordant")).cast("double")
    denom = F.sqrt(
        (n0 - F.col("ties_x").cast("double"))
        * (n0 - F.col("ties_y").cast("double"))
    )
    # n from n0 = n(n-1)/2
    nn = (F.lit(1.0) + F.sqrt(F.lit(1.0) + 8.0 * n0)) / 2.0
    return agg.select(
        F.round(nn).cast("long").alias("n"),
        "concordant",
        "discordant",
        "ties_x",
        "ties_y",
        F.round(F.when(denom > 0, cd / denom), round_to).alias("tau_b"),
    )


def sprt_decision(
    df: DataFrame,
    group_col: str,
    success_col,
    order_cols,
    p0: float,
    p1: float,
    alpha: float = 0.05,
    beta: float = 0.05,
    round_to: int = 6,
) -> DataFrame:
    """Wald's sequential probability ratio test per group: walk the
    Bernoulli stream in ``order_cols`` order accumulating the
    log-likelihood ratio of H1(p=p1) vs H0(p=p0); the decision fires at
    the FIRST crossing of ln((1−β)/α) (accept H1) or ln(β/(1−α))
    (accept H0).  The early-stopping monitor for filter rollouts —
    at 10^12 events the whole point is deciding after the first few
    thousand, and the operator reports exactly when each group could
    have stopped.

    One cumulative-sum window per group + one conditional aggregate; the
    crossing row is found with a min-over-filtered aggregate, not a
    driver loop.  Deterministic under parallelism iff ``order_cols`` is
    a total order within each group (same contract as sectionize).

    Columns: ``group, n_total, llr_final, decision ('accept_h1' /
    'accept_h0' / 'continue'), n_at_decision`` (NULL when continuing).
    """
    import math

    s = success_col if isinstance(success_col, Column) else F.col(success_col)
    la = math.log((1.0 - beta) / alpha)
    lb = math.log(beta / (1.0 - alpha))
    w_succ = math.log(p1 / p0)
    w_fail = math.log((1.0 - p1) / (1.0 - p0))
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    # llr is reconstructed from the INTEGER success cumsum k as
    # k·w_succ + (i−k)·w_fail — one multiply-add per row instead of a
    # float cumsum, so the walk is bit-identical across engines
    # regardless of how a windowed float SUM associates its additions
    walked = df.select(
        F.col(group_col).alias("group"),
        F.sum(s.cast("long")).over(w).alias("_k"),
        F.row_number().over(w).alias("_i"),
    ).select(
        "group",
        "_i",
        (
            F.col("_k").cast("double") * F.lit(w_succ)
            + (F.col("_i") - F.col("_k")).cast("double") * F.lit(w_fail)
        ).alias("_llr"),
    )
    crossed = F.when(F.col("_llr") >= la, F.lit("accept_h1")).when(
        F.col("_llr") <= lb, F.lit("accept_h0")
    )
    agg = walked.groupBy("group").agg(
        F.max("_i").alias("n_total"),
        F.round(F.max_by("_llr", "_i"), round_to).alias("llr_final"),
        F.min(F.when(crossed.isNotNull(), F.col("_i"))).alias("n_at_decision"),
        F.min_by(crossed, F.when(crossed.isNotNull(), F.col("_i"))).alias(
            "_dec"
        ),
    )
    return agg.select(
        "group",
        "n_total",
        "llr_final",
        F.coalesce(F.col("_dec"), F.lit("continue")).alias("decision"),
        "n_at_decision",
    )


#: cumulative Poisson(1) CDF at 0..5 — shared literals of the Poisson
#: bootstrap inverse-CDF in both the Spark operator and its SQL oracle
POISSON1_CDF = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238462",
    "0.9963401531726563",
    "0.9994058151824183",
)


def _md5_uniform_sql(seed_expr: str) -> str:
    """Engine-portable uniform in (0, 1]: first 15 md5 hex chars (60
    bits) of ``seed_expr`` as an integer, shifted by one and scaled —
    the q_weighted_sample idiom, valid Spark SQL and DuckDB SQL alike
    given each engine's hex-to-int spelling is substituted upstream."""
    return (
        f"(CAST(conv(substr(md5({seed_expr}), 1, 15), 16, 10) AS BIGINT)"
        " + 1.0) / 1152921504606846976.0"
    )


def poisson_bootstrap_ci(
    df: DataFrame,
    id_col: str,
    value_col,
    b: int = 40,
    seed: str = "bs",
    alpha: float = 0.05,
    round_to: int = 9,
) -> DataFrame:
    """Bootstrap confidence interval for the mean via the POISSON
    bootstrap (Chamandy et al. 2012; Kleiner et al.'s scale rationale):
    each of ``b`` replicates reweights every row by an independent
    Poisson(1) count, so resampling needs no global n, no shuffle of the
    data, and — with the count drawn by inverse CDF from an
    md5(seed, replicate, id) uniform — is a pure function of the input,
    identical in any engine, on reruns, and under resume.

    Returns one row: ``n, est, lo, hi, b`` — the plain mean and the
    percentile interval (indices ``floor(alpha/2*b)`` and
    ``ceil((1-alpha/2)*b)-1`` of the sorted replicate means, ties broken
    by replicate id).

    Plan: ONE pass over the data exploding the ``b`` replicate ids;
    map-side combine collapses each task's contribution to ``b`` partial
    rows before the (b-row) shuffle, so the 40x intermediate never hits
    the wire.  Everything after operates on ``b`` rows.
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    base = df.select(
        F.col(id_col).cast("string").alias("_id"),
        v.cast("double").alias("_v"),
    ).filter(F.col("_v").isNotNull())
    rep = base.withColumn(
        "i", F.explode(F.array(*[F.lit(j) for j in range(int(b))]))
    )
    u = F.expr(
        _md5_uniform_sql(f"'{seed}' || CAST(i AS STRING) || ':' || _id")
    )
    c = POISSON1_CDF
    w = (
        F.when(u < float(c[0]), 0)
        .when(u < float(c[1]), 1)
        .when(u < float(c[2]), 2)
        .when(u < float(c[3]), 3)
        .when(u < float(c[4]), 4)
        .when(u < float(c[5]), 5)
        .otherwise(6)
    ).cast("double")
    means = (
        rep.select("i", (w * F.col("_v")).alias("_wv"), w.alias("_w"))
        .groupBy("i")
        .agg(
            F.round(F.sum("_wv") / F.sum("_w"), round_to).alias("m")
        )
    )
    lo_rn = int(alpha / 2 * b) + 1  # 1-indexed floor
    hi_rn = -(-(1 - alpha / 2) * b // 1)  # ceil, 1-indexed
    rn = F.row_number().over(Window.orderBy(F.asc("m"), F.asc("i")))
    bounds = (
        means.withColumn("_rn", rn)
        .filter(F.col("_rn").isin(int(lo_rn), int(hi_rn)))
        .agg(
            F.min(F.when(F.col("_rn") == int(lo_rn), F.col("m"))).alias("lo"),
            F.min(F.when(F.col("_rn") == int(hi_rn), F.col("m"))).alias("hi"),
        )
    )
    est = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("_v"), round_to).alias("est"),
    )
    return est.join(F.broadcast(bounds), F.lit(True)).select(
        "n", "est", "lo", "hi", F.lit(int(b)).alias("b")
    )


def weighted_quantiles(
    df: DataFrame,
    group_col: str,
    value_col,
    weight_col,
    qs: tuple = (0.25, 0.5, 0.9),
) -> DataFrame:
    """EXACT weighted quantiles per group: the smallest value whose
    cumulative weight reaches ``q`` of the group's total — the
    token-budget question ("which doc length covers half the tokens")
    that ``approx_percentile`` can only approximate and plain percentiles
    get wrong under weighting.

    Returns ``(group, q, wq)``, one row per group and requested quantile.
    Deterministic under value ties regardless of their internal order:
    every ordering of tied rows yields the same smallest qualifying
    value.  Plan: ONE cumulative-weight window per group (the total rides
    the same window, full-frame) and one aggregate — no join back.
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    base = df.select(
        F.col(group_col).alias("group"),
        v.alias("_v"),
        w.cast("long").alias("_w"),
    ).filter(F.col("_v").isNotNull() & F.col("_w").isNotNull())
    win = (
        Window.partitionBy("group")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy("group")
    cum = base.select(
        "group",
        "_v",
        F.sum("_w").over(win).alias("_cw"),
        F.sum("_w").over(tot).alias("_tw"),
    )
    per_q = [
        F.min(
            F.when(
                F.col("_cw").cast("double") >= F.lit(float(q)) * F.col("_tw"),
                F.col("_v"),
            )
        ).alias(f"_q{i}")
        for i, q in enumerate(qs)
    ]
    agg = cum.groupBy("group").agg(*per_q)
    stack = ", ".join(
        f"CAST({repr(float(q))} AS DOUBLE), _q{i}" for i, q in enumerate(qs)
    )
    return agg.select(
        "group",
        F.expr(f"stack({len(qs)}, {stack}) AS (q, wq)"),
    )


def trimmed_mean(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value_col,
    trim: float = 0.1,
    round_to: int = 9,
) -> DataFrame:
    """Per-group mean after dropping the lowest and highest
    ``floor(trim * n)`` rows — the robust scoreboard statistic that
    survives a few corrupt outliers where the plain mean doesn't.
    ``id_col`` breaks value ties so the trim boundary is a total order
    (pure function of the input).  Returns
    ``(group, n, n_used, tmean)``.

    Plan: one ranking window per group plus the group count on the same
    partitioning, then one aggregate — no join back, no second pass.
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    base = df.select(
        F.col(group_col).alias("group"),
        F.col(id_col).alias("_id"),
        v.cast("double").alias("_v"),
    ).filter(F.col("_v").isNotNull())
    w = Window.partitionBy("group").orderBy("_v", "_id")
    cnt = Window.partitionBy("group")
    ranked = base.select(
        "group",
        "_v",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(cnt).alias("_n"),
    )
    k = F.floor(F.lit(float(trim)) * F.col("_n"))
    kept = ranked.filter(
        (F.col("_rn") > k) & (F.col("_rn") <= F.col("_n") - k)
    )
    return kept.groupBy("group").agg(
        F.max("_n").alias("n"),
        F.count(F.lit(1)).alias("n_used"),
        F.round(F.avg("_v"), round_to).alias("tmean"),
    )


def cmh_pooled_odds(
    df: DataFrame,
    stratum_col: str,
    treat_col,
    outcome_col,
    round_to: int = 6,
) -> DataFrame:
    """Cochran-Mantel-Haenszel pooled odds ratio and test statistic over
    stratified 2x2 tables (Mantel & Haenszel 1959) -- the OTHER half of
    the Simpson's-paradox story: ``simpson_reversals`` detects that
    pooling lies; CMH pools CORRECTLY, weighting each stratum's odds
    ratio so confounding by the stratum variable cancels.

    ``or_mh = sum_k(a_k d_k / n_k) / sum_k(b_k c_k / n_k)`` with the
    (uncorrected) CMH chi-square from the usual hypergeometric moments.
    Returns one row: ``n_strata, or_mh, chi2``.

    Plan: one stratum aggregate over the data, one aggregate over the
    strata-bounded frame.
    """
    t = F.col(treat_col) if isinstance(treat_col, str) else treat_col
    y = F.col(outcome_col) if isinstance(outcome_col, str) else outcome_col
    base = df.select(
        F.col(stratum_col).alias("stratum"),
        t.cast("int").alias("_t"),
        y.cast("int").alias("_y"),
    )
    per = base.groupBy("stratum").agg(
        F.sum(F.expr("_t * _y")).cast("double").alias("a"),
        F.sum(F.expr("_t * (1 - _y)")).cast("double").alias("b"),
        F.sum(F.expr("(1 - _t) * _y")).cast("double").alias("c"),
        F.sum(F.expr("(1 - _t) * (1 - _y)")).cast("double").alias("d"),
    ).select(
        "*", F.expr("a + b + c + d").alias("nk")
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.round(
            F.sum(F.expr("a * d / nk")) / F.sum(F.expr("b * c / nk")),
            round_to,
        ).alias("or_mh"),
        F.round(
            F.pow(
                F.sum(F.expr("a - (a + b) * (a + c) / nk")), F.lit(2.0)
            )
            / F.sum(
                F.expr(
                    "(a + b) * (c + d) * (a + c) * (b + d)"
                    " / (nk * nk * (nk - 1))"
                )
            ),
            round_to,
        ).alias("chi2"),
    )


def mcnemar_test(
    df: DataFrame,
    rule_a_col,
    rule_b_col,
    round_to: int = 6,
) -> DataFrame:
    """McNemar's paired test for two binary judges on the SAME rows
    (McNemar 1947): only the discordant counts matter -- ``b`` (A fires,
    B doesn't) vs ``c`` (B fires, A doesn't); the statistic
    ``(b - c)^2 / (b + c)`` asks whether two filter versions disagree
    symmetrically or one is systematically stricter.  The filter-
    migration gate a curation pipeline runs before swapping quality
    rules.

    Returns one row: ``n, both, neither, b, c, mcnemar`` (0 when no
    discordant pairs).  ONE aggregate, map-side combined.
    """
    a = F.col(rule_a_col) if isinstance(rule_a_col, str) else rule_a_col
    b = F.col(rule_b_col) if isinstance(rule_b_col, str) else rule_b_col
    base = df.select(a.cast("int").alias("_a"), b.cast("int").alias("_b"))
    return base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("_a * _b")).cast("long").alias("both"),
        F.sum(F.expr("(1 - _a) * (1 - _b)")).cast("long").alias("neither"),
        F.sum(F.expr("_a * (1 - _b)")).cast("long").alias("b"),
        F.sum(F.expr("(1 - _a) * _b")).cast("long").alias("c"),
    ).select(
        "n",
        "both",
        "neither",
        "b",
        "c",
        F.round(
            F.when(
                F.col("b") + F.col("c") > 0,
                F.pow(F.col("b") - F.col("c"), F.lit(2.0))
                / (F.col("b") + F.col("c")).cast("double"),
            ).otherwise(F.lit(0.0)),
            round_to,
        ).alias("mcnemar"),
    )


def brier_decomposition(
    df: DataFrame,
    score_col,
    outcome_col,
    n_bins: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Murphy (1973) decomposition of the Brier score over equal-width
    forecast bins: ``brier``, ``reliability`` (calibration error --
    penalizes bins whose mean forecast strays from their hit rate),
    ``resolution`` (how much the bins separate outcomes; higher is
    better), ``uncertainty`` (base-rate variance, forecast-independent).
    The one-line health check of a quality classifier's probabilities:
    brier ~= reliability - resolution + uncertainty (exact when bin mean
    forecasts are the forecast).

    Scores must lie in [0, 1]; the top edge closes (score 1.0 lands in
    the last bin).  Returns one row:
    ``n, brier, reliability, resolution, uncertainty``.

    Plan: one bin aggregate over the data, one aggregate over the
    n_bins frame with the global base rate riding a window.
    """
    s = F.col(score_col) if isinstance(score_col, str) else score_col
    y = F.col(outcome_col) if isinstance(outcome_col, str) else outcome_col
    base = df.select(
        s.cast("double").alias("_s"), y.cast("int").alias("_y")
    ).filter(F.col("_s").isNotNull() & F.col("_y").isNotNull())
    binned = base.select(
        F.least(
            F.floor(F.col("_s") * n_bins).cast("int"), F.lit(n_bins - 1)
        ).alias("bin"),
        "_s",
        "_y",
    )
    per = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("double").alias("nk"),
        F.avg("_s").alias("sbar"),
        F.avg(F.col("_y").cast("double")).alias("ybar"),
        F.sum(F.expr("(_s - _y) * (_s - _y)")).alias("se"),
    )
    w = Window.partitionBy()
    tot = per.select(
        "*",
        F.sum("nk").over(w).alias("_n"),
        (F.sum(F.expr("nk * ybar")).over(w) / F.sum("nk").over(w)).alias(
            "_ybar"
        ),
    )
    return tot.agg(
        F.max("_n").cast("long").alias("n"),
        F.round(F.sum("se") / F.max("_n"), round_to).alias("brier"),
        F.round(
            F.sum(F.expr("nk * (sbar - ybar) * (sbar - ybar)"))
            / F.max("_n"),
            round_to,
        ).alias("reliability"),
        F.round(
            F.sum(F.expr("nk * (ybar - _ybar) * (ybar - _ybar)"))
            / F.max("_n"),
            round_to,
        ).alias("resolution"),
        F.round(
            F.max(F.expr("_ybar * (1.0 - _ybar)")), round_to
        ).alias("uncertainty"),
    )


def daily_streaks(
    df: DataFrame,
    user_col: str,
    ts_col: str = "ts",
    top_k: int = 20,
) -> DataFrame:
    """Longest run of CONSECUTIVE active calendar days per user -- the
    retention/engagement streak metric -- via the date flavor of
    gaps-and-islands: distinct (user, day), then ``day - row_number``
    is constant exactly within a consecutive run, so one window + one
    aggregate finds every streak without any self-join.

    Returns the ``top_k`` users by longest streak
    (``user, n_active_days, max_streak``), ties broken by user id.
    Plan: distinct -> one per-user window -> two aggregates; the raw
    events reduce to user-day granularity in the first map-side combine.
    """
    days = (
        df.select(
            F.col(user_col).alias("user"),
            F.to_date(F.col(ts_col)).alias("day"),
        )
        .filter(F.col("day").isNotNull())
        .distinct()
    )
    w = Window.partitionBy("user").orderBy("day")
    runs = days.select(
        "user",
        "day",
        F.date_sub(F.col("day"), F.row_number().over(w)).alias("anchor"),
    )
    streaks = runs.groupBy("user", "anchor").agg(
        F.count(F.lit(1)).alias("len")
    )
    per_user = streaks.groupBy("user").agg(
        F.sum("len").alias("n_active_days"),
        F.max("len").alias("max_streak"),
    )
    return per_user.orderBy(
        F.desc("max_streak"), F.asc("user")
    ).limit(int(top_k))


def wilcoxon_signed_rank(
    pairs: DataFrame,
    id_col: str,
    a_col,
    b_col,
    round_to: int = 6,
) -> DataFrame:
    """Wilcoxon signed-rank test (Wilcoxon 1945) for PAIRED samples --
    the nonparametric twin of the paired t-test, completing the test
    battery next to Mann-Whitney (unpaired): zero differences drop,
    |differences| get average ranks under ties, ``w_plus`` sums the
    ranks of positive differences, and ``z`` is the large-sample normal
    approximation.

    Returns one row: ``n_pairs, w_plus, z``.

    Plan: one projection, one rank window over the pair frame (pairs
    are one row per subject -- already aggregated far below event
    scale), one final aggregate.
    """
    a = F.col(a_col) if isinstance(a_col, str) else a_col
    b = F.col(b_col) if isinstance(b_col, str) else b_col
    d = pairs.select(
        F.col(id_col).alias("_id"), (a - b).cast("double").alias("_d")
    ).filter(F.col("_d").isNotNull() & (F.col("_d") != 0))
    scored = d.select(
        "_d",
        F.abs(F.col("_d")).alias("_ad"),
    )
    w_rank = Window.orderBy("_ad")
    w_tie = Window.partitionBy("_ad")
    ranked = scored.select(
        "_d",
        # average rank under ties: min_rank + (tie_count - 1) / 2
        (
            F.rank().over(w_rank).cast("double")
            + (F.count(F.lit(1)).over(w_tie) - 1) / 2.0
        ).alias("_r"),
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(
            F.sum(F.when(F.col("_d") > 0, F.col("_r")).otherwise(F.lit(0.0))),
            round_to,
        ).alias("w_plus"),
    ).select(
        "n_pairs",
        "w_plus",
        F.round(
            (
                F.col("w_plus")
                - F.col("n_pairs") * (F.col("n_pairs") + 1) / 4.0
            )
            / F.sqrt(
                F.col("n_pairs")
                * (F.col("n_pairs") + 1)
                * (2 * F.col("n_pairs") + 1)
                / 24.0
            ),
            round_to,
        ).alias("z"),
    )


def partial_corr(
    df: DataFrame,
    x_col,
    y_col,
    z_col,
    round_to: int = 6,
) -> DataFrame:
    """First-order partial correlation ``r_xy.z`` -- the x~y association
    with the confounder z regressed out of both sides:
    ``(r_xy - r_xz r_yz) / sqrt((1 - r_xz^2)(1 - r_yz^2))``.  The
    numeric companion to the categorical q_simpsons/q_cmh pair: does
    the headline correlation survive controlling for z?

    Returns one row: ``n, r_xy, r_xz, r_yz, r_xy_z``.  ONE moment
    aggregate over the data; everything after is scalar algebra.
    """
    cols = [
        (F.col(c) if isinstance(c, str) else c).cast("double").alias(n)
        for c, n in ((x_col, "_x"), (y_col, "_y"), (z_col, "_z"))
    ]
    base = df.select(*cols).filter(
        F.col("_x").isNotNull()
        & F.col("_y").isNotNull()
        & F.col("_z").isNotNull()
    )
    m = base.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("_x").alias("sx"),
        F.sum("_y").alias("sy"),
        F.sum("_z").alias("sz"),
        F.sum(F.expr("_x * _x")).alias("sxx"),
        F.sum(F.expr("_y * _y")).alias("syy"),
        F.sum(F.expr("_z * _z")).alias("szz"),
        F.sum(F.expr("_x * _y")).alias("sxy"),
        F.sum(F.expr("_x * _z")).alias("sxz"),
        F.sum(F.expr("_y * _z")).alias("syz"),
    )
    r = m.select(
        "n",
        F.expr(
            "(n * sxy - sx * sy)"
            " / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))"
        ).alias("_rxy"),
        F.expr(
            "(n * sxz - sx * sz)"
            " / (sqrt(n * sxx - sx * sx) * sqrt(n * szz - sz * sz))"
        ).alias("_rxz"),
        F.expr(
            "(n * syz - sy * sz)"
            " / (sqrt(n * syy - sy * sy) * sqrt(n * szz - sz * sz))"
        ).alias("_ryz"),
    )
    return r.select(
        F.col("n").cast("long").alias("n"),
        F.round("_rxy", round_to).alias("r_xy"),
        F.round("_rxz", round_to).alias("r_xz"),
        F.round("_ryz", round_to).alias("r_yz"),
        F.round(
            F.expr(
                "(_rxy - _rxz * _ryz)"
                " / sqrt((1.0 - _rxz * _rxz) * (1.0 - _ryz * _ryz))"
            ),
            round_to,
        ).alias("r_xy_z"),
    )


def vif3(
    df: DataFrame,
    x1_col,
    x2_col,
    x3_col,
    round_to: int = 6,
) -> DataFrame:
    """Variance inflation factors of three regressors -- the
    collinearity audit to run BEFORE trusting q_ridge's coefficients:
    ``VIF_i = 1 / (1 - R_i^2)`` where ``R_i^2`` regresses feature i on
    the other two, in closed form from the pairwise correlations
    (``R_1^2 = (r12^2 + r13^2 - 2 r12 r13 r23) / (1 - r23^2)`` and
    symmetric).  VIF near 1: independent; above ~10: the coefficient is
    noise.

    Returns one row: ``n, r12, r13, r23, vif1, vif2, vif3``.  ONE moment
    aggregate; scalar algebra after.
    """
    cols = [
        (F.col(c) if isinstance(c, str) else c).cast("double").alias(n)
        for c, n in ((x1_col, "_a"), (x2_col, "_b"), (x3_col, "_c"))
    ]
    base = df.select(*cols).filter(
        F.col("_a").isNotNull()
        & F.col("_b").isNotNull()
        & F.col("_c").isNotNull()
    )
    m = base.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("_a").alias("sa"),
        F.sum("_b").alias("sb"),
        F.sum("_c").alias("sc"),
        F.sum(F.expr("_a * _a")).alias("saa"),
        F.sum(F.expr("_b * _b")).alias("sbb"),
        F.sum(F.expr("_c * _c")).alias("scc"),
        F.sum(F.expr("_a * _b")).alias("sab"),
        F.sum(F.expr("_a * _c")).alias("sac"),
        F.sum(F.expr("_b * _c")).alias("sbc"),
    )
    r = m.select(
        "n",
        F.expr(
            "(n * sab - sa * sb)"
            " / (sqrt(n * saa - sa * sa) * sqrt(n * sbb - sb * sb))"
        ).alias("_r12"),
        F.expr(
            "(n * sac - sa * sc)"
            " / (sqrt(n * saa - sa * sa) * sqrt(n * scc - sc * sc))"
        ).alias("_r13"),
        F.expr(
            "(n * sbc - sb * sc)"
            " / (sqrt(n * sbb - sb * sb) * sqrt(n * scc - sc * sc))"
        ).alias("_r23"),
    )
    out = r.select(
        "n",
        "_r12",
        "_r13",
        "_r23",
        F.expr(
            "(_r12 * _r12 + _r13 * _r13 - 2.0 * _r12 * _r13 * _r23)"
            " / (1.0 - _r23 * _r23)"
        ).alias("_R1"),
        F.expr(
            "(_r12 * _r12 + _r23 * _r23 - 2.0 * _r12 * _r23 * _r13)"
            " / (1.0 - _r13 * _r13)"
        ).alias("_R2"),
        F.expr(
            "(_r13 * _r13 + _r23 * _r23 - 2.0 * _r13 * _r23 * _r12)"
            " / (1.0 - _r12 * _r12)"
        ).alias("_R3"),
    )
    return out.select(
        F.col("n").cast("long").alias("n"),
        F.round("_r12", round_to).alias("r12"),
        F.round("_r13", round_to).alias("r13"),
        F.round("_r23", round_to).alias("r23"),
        F.round(F.expr("1.0 / (1.0 - _R1)"), round_to).alias("vif1"),
        F.round(F.expr("1.0 / (1.0 - _R2)"), round_to).alias("vif2"),
        F.round(F.expr("1.0 / (1.0 - _R3)"), round_to).alias("vif3"),
    )


def diff_in_diff(
    df: DataFrame,
    treat_col,
    post_col,
    outcome_col,
    round_to: int = 6,
) -> DataFrame:
    """Difference-in-differences estimator: the 2x2 of (treated x post)
    group means, with ``did = (treat_post - treat_pre) - (ctrl_post -
    ctrl_pre)`` -- the pre-trend-adjusted effect estimate that a naive
    post-only comparison gets wrong whenever groups started at
    different baselines.  The q_cuped sibling for natural experiments
    (CUPED shrinks variance with a pre-period covariate; DiD removes
    the baseline entirely).

    Returns one row: the four cell means (``ctrl_pre, ctrl_post,
    treat_pre, treat_post``), each cell's n, and ``did``.  ONE
    map-side-combined aggregate.
    """
    t = F.col(treat_col) if isinstance(treat_col, str) else treat_col
    p = F.col(post_col) if isinstance(post_col, str) else post_col
    y = F.col(outcome_col) if isinstance(outcome_col, str) else outcome_col
    base = df.select(
        t.cast("int").alias("_t"),
        p.cast("int").alias("_p"),
        y.cast("double").alias("_y"),
    ).filter(F.col("_y").isNotNull())

    def cell(tv: int, pv: int, what: str):
        cond = (F.col("_t") == tv) & (F.col("_p") == pv)
        if what == "n":
            return F.sum(cond.cast("long"))
        return F.avg(F.when(cond, F.col("_y")))

    agg = base.agg(
        cell(0, 0, "n").alias("n_ctrl_pre"),
        cell(0, 1, "n").alias("n_ctrl_post"),
        cell(1, 0, "n").alias("n_treat_pre"),
        cell(1, 1, "n").alias("n_treat_post"),
        F.round(cell(0, 0, "m"), round_to).alias("ctrl_pre"),
        F.round(cell(0, 1, "m"), round_to).alias("ctrl_post"),
        F.round(cell(1, 0, "m"), round_to).alias("treat_pre"),
        F.round(cell(1, 1, "m"), round_to).alias("treat_post"),
    )
    return agg.withColumn(
        "did",
        F.round(
            (F.col("treat_post") - F.col("treat_pre"))
            - (F.col("ctrl_post") - F.col("ctrl_pre")),
            round_to,
        ),
    )


def lift_deciles(
    df: DataFrame,
    id_col: str,
    score_col,
    response_col,
    n_bins: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Lift/gain table: rank by model score descending, cut into
    ``n_bins`` equal-count bins (NTILE semantics; ``id_col`` breaks
    score ties so the cut is a total order), and report each bin's
    response rate plus the CUMULATIVE lift over the base rate -- the
    model-quality chart a ranking-based selection policy is judged by
    ("top decile captures 3.2x its share of responders").

    Returns ``(decile, n, responders, rate, cum_lift)``.
    Plan: one ranking window, one bin aggregate, one cumulative window
    over the n_bins frame with the base rate riding the same frame.
    """
    s = F.col(score_col) if isinstance(score_col, str) else score_col
    r = F.col(response_col) if isinstance(response_col, str) else response_col
    base = df.select(
        F.col(id_col).alias("_id"),
        s.cast("double").alias("_s"),
        r.cast("int").alias("_r"),
    ).filter(F.col("_s").isNotNull() & F.col("_r").isNotNull())
    w = Window.orderBy(F.desc("_s"), F.asc("_id"))
    binned = base.select(
        F.ntile(int(n_bins)).over(w).alias("decile"), "_r"
    )
    per = binned.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_r").cast("long").alias("responders"),
    )
    cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = Window.partitionBy()
    return per.select(
        "decile",
        "n",
        "responders",
        F.round(
            F.col("responders") / F.col("n").cast("double"), round_to
        ).alias("rate"),
        F.round(
            (
                F.sum("responders").over(cum)
                / F.sum("n").over(cum).cast("double")
            )
            / (
                F.sum("responders").over(tot)
                / F.sum("n").over(tot).cast("double")
            ),
            round_to,
        ).alias("cum_lift"),
    )


#: two-sided alpha=0.05 and power=0.80 normal quantiles, fixed literals
#: shared with the SQL oracle (engine-portable by construction)
Z_975 = "1.959963985"
Z_80 = "0.8416212336"


def required_sample_size(
    df: DataFrame,
    outcome_col,
    mde_abs: float,
    round_to: int = 6,
) -> DataFrame:
    """Two-proportion experiment sizing from the OBSERVED baseline
    rate: the classic normal-approximation n per arm for detecting an
    absolute lift of ``mde_abs`` at alpha=0.05 (two-sided), power=0.80:
    ``n = (z_{.975} sqrt(2 p̄ q̄) + z_{.80} sqrt(p1 q1 + p2 q2))² /
    (p2 - p1)²`` -- the "how long must this A/B run" planner fed by the
    live base rate instead of a guess.

    Returns one row: ``n, p1, p2, n_per_arm`` (ceiling).  ONE aggregate
    for the base rate; scalar algebra after.
    """
    y = F.col(outcome_col) if isinstance(outcome_col, str) else outcome_col
    base = df.select(y.cast("int").alias("_y")).filter(
        F.col("_y").isNotNull()
    )
    m = float(mde_abs)
    agg = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.col("_y").cast("double")).alias("_p1"),
    )
    sized = agg.select(
        "n",
        F.round("_p1", round_to).alias("p1"),
        F.round(F.col("_p1") + m, round_to).alias("p2"),
        F.expr(
            f"(_p1 + (_p1 + {m!r})) / 2.0"
        ).alias("_pbar"),
        F.col("_p1").alias("_p1raw"),
    )
    return sized.select(
        "n",
        "p1",
        "p2",
        F.expr(
            f"CAST(CEIL(POW({Z_975} * SQRT(2.0 * _pbar * (1.0 - _pbar))"
            f" + {Z_80} * SQRT(_p1raw * (1.0 - _p1raw)"
            f" + (_p1raw + {m!r}) * (1.0 - (_p1raw + {m!r}))), 2.0)"
            f" / ({m!r} * {m!r})) AS BIGINT)"
        ).alias("n_per_arm"),
    )


def logrank_test(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Two-group log-rank test (Mantel 1966; Peto & Peto 1972) over
    right-censored durations: does cohort 1 convert on a different
    time-to-event curve than cohort 0?  The censoring-correct companion
    to :func:`survival_km` — comparing raw conversion-latency means
    ignores users who never converted; the log-rank statistic compares
    the whole hazard history.

    Input: one row per subject — duration, event flag (1 = event at
    that time, 0 = censored), and a 0/1 group indicator.  At each
    distinct pooled EVENT time the observed group-1 events ``d1`` are
    compared with the hypergeometric expectation ``d·n1/n`` given the
    at-risk sets; the statistic ``(Σ(d1-E1))²/ΣV`` is χ²(1) under the
    null of equal hazards.

    Returns one row: ``n_times, obs1, exp1, o_minus_e, logrank``
    (statistic 0 when the variance sum is 0 — e.g. one cohort empty).

    Scale shape: subjects collapse to per-time counts first (map-side
    combine, distinct-times-sized); both risk sets ride ONE reverse
    cumulative window over that metadata-sized frame, then one final
    aggregate.  The corpus never feeds a driver-side stats library.
    """
    g = F.col(group_col) if isinstance(group_col, str) else group_col
    per_t = df.select(
        F.col(duration_col).cast("double").alias("t"),
        F.col(event_col).cast("int").alias("e"),
        g.cast("int").alias("g"),
    ).groupBy("t").agg(
        F.count(F.lit(1)).alias("n_at"),
        F.sum("e").alias("d"),
        F.sum("g").alias("n1_at"),
        F.sum(F.expr("e * g")).alias("d1"),
    )
    w_rev = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ev = (
        per_t.withColumn("n_risk", F.sum("n_at").over(w_rev))
        .withColumn("n1_risk", F.sum("n1_at").over(w_rev))
        .filter(F.col("d") > 0)
    )
    e1 = F.col("d") * F.col("n1_risk") / F.col("n_risk")
    # hypergeometric variance of d1 given (n, n1, d); 0 when n == 1
    v = F.when(
        F.col("n_risk") > 1,
        F.col("d")
        * (F.col("n1_risk") / F.col("n_risk"))
        * (F.lit(1.0) - F.col("n1_risk") / F.col("n_risk"))
        * (F.col("n_risk") - F.col("d"))
        / (F.col("n_risk") - F.lit(1.0)),
    ).otherwise(F.lit(0.0))
    agg = ev.agg(
        F.count(F.lit(1)).cast("long").alias("n_times"),
        F.sum("d1").cast("long").alias("obs1"),
        F.sum(e1).alias("_e1"),
        F.sum(F.col("d1") - e1).alias("_ome"),
        F.sum(v).alias("_v"),
    )
    return agg.select(
        "n_times",
        "obs1",
        F.round("_e1", round_to).alias("exp1"),
        F.round("_ome", round_to).alias("o_minus_e"),
        F.round(
            F.when(
                F.col("_v") > 0, F.col("_ome") * F.col("_ome") / F.col("_v")
            ).otherwise(F.lit(0.0)),
            round_to,
        ).alias("logrank"),
    )


def nelson_aalen(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator (Nelson 1972; Aalen
    1978) over right-censored durations: ``H(t) = Σ_{t_i≤t} d_i/n_i``
    with the variance estimate ``Σ d_i/n_i²`` — the additive twin of
    the Kaplan-Meier product curve (:func:`survival_km`), preferred
    when hazard increments themselves are the quantity of interest
    (e.g. conversion intensity per hour bucket).

    Input: one row per subject — duration + event flag.  Returns one
    row per distinct observed-event time: ``t, n_risk, d, cumhaz,
    cumhaz_var``.

    Scale shape: identical to KM — subjects collapse to per-time counts
    (map-side combine), one reverse cumulative window builds risk sets
    on the distinct-times frame, one forward window accumulates.
    """
    per_t = df.select(
        F.col(duration_col).cast("double").alias("t"),
        F.col(event_col).cast("int").alias("e"),
    ).groupBy("t").agg(
        F.count(F.lit(1)).alias("n_at"),
        F.sum("e").alias("d"),
    )
    w_rev = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ev = per_t.withColumn("n_risk", F.sum("n_at").over(w_rev)).filter(
        F.col("d") > 0
    )
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return ev.select(
        "t",
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("d"),
        F.round(
            F.sum(F.col("d") / F.col("n_risk")).over(w_cum), round_to
        ).alias("cumhaz"),
        F.round(
            F.sum(F.col("d") / (F.col("n_risk") * F.col("n_risk"))).over(
                w_cum
            ),
            round_to,
        ).alias("cumhaz_var"),
    )


def kruskal_wallis(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Kruskal-Wallis H test (Kruskal & Wallis 1952): the k-group
    generalization of Mann-Whitney — do ANY of the groups draw from a
    shifted distribution of ``value_col``?  Nonparametric, so the
    heavy-tailed metrics (latencies, doc lengths) that wreck ANOVA's
    normality assumption are safe.

    ``H = 12/(N(N+1))·Σ_g R_g²/n_g − 3(N+1)`` with average ranks for
    ties (exact ``rank + (t-1)/2`` rational arithmetic) and the tie
    correction ``H' = H / (1 − Σ(t³−t)/(N³−N))``.

    Returns ONE row: ``k, n, h, h_adj`` (h_adj NULL when every value is
    tied — the correction divides by zero).

    Plan: corpus collapses to per-(value, group) counts, then to
    per-DISTINCT-VALUE tie counts (map-side combine both times); the
    global rank window runs over distinct values only; rank sums come
    from one value-cardinality equi-join and one k-row aggregate.  The
    corpus never crosses the single-partition window.
    """
    d = df.select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("double").alias("_v"),
    ).filter(F.col("_v").isNotNull())
    vg = d.groupBy("_v", "g").agg(F.count(F.lit(1)).alias("_c"))
    vc = vg.groupBy("_v").agg(F.sum("_c").alias("_t"))
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    t = F.col("_t").cast("double")
    ranked = vc.select(
        "_v",
        "_t",
        (
            (F.sum("_t").over(w) - F.col("_t") + F.lit(1)).cast("double")
            + (t - F.lit(1.0)) / F.lit(2.0)
        ).alias("_ar"),
    )
    per_g = (
        vg.join(ranked, "_v")
        .groupBy("g")
        .agg(
            F.sum("_c").alias("ng"),
            F.sum(F.col("_c").cast("double") * F.col("_ar")).alias("rg"),
        )
    )
    ties = vc.agg(
        F.sum(t * t * t - t).alias("_tsum"), F.sum("_t").alias("_n")
    )
    a = per_g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("ng").cast("long").alias("n"),
        F.sum(
            F.col("rg") * F.col("rg") / F.col("ng").cast("double")
        ).alias("_rsum"),
    ).crossJoin(F.broadcast(ties.select("_tsum")))
    n = F.col("n").cast("double")
    h = (
        F.lit(12.0) / (n * (n + F.lit(1.0))) * F.col("_rsum")
        - F.lit(3.0) * (n + F.lit(1.0))
    )
    corr = F.lit(1.0) - F.col("_tsum") / (n * n * n - n)
    return a.select(
        "k",
        "n",
        F.round(h, round_to).alias("h"),
        F.round(F.when(corr > 0, h / corr), round_to).alias("h_adj"),
    )


def brown_forsythe(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Brown-Forsythe test (Brown & Forsythe 1974) for equality of
    VARIANCES across groups: the median-centered Levene test — robust
    to non-normality where the classical Bartlett test is not.  The
    dispersion-drift gate a pipeline runs before trusting a pooled
    variance (e.g. are latency spreads comparable across sources?).

    Each value is replaced by its absolute deviation from the GROUP
    MEDIAN (``z = |x − med_g|``, linear-interpolated median); the
    statistic is the one-way ANOVA F on z.

    Returns ONE row: ``k, n, f_bf`` (NULL when k < 2 or the within-group
    deviation sum is 0).

    Plan: ONE per-group exact-median aggregate (k rows, broadcast back),
    then the same two-stage moment shape as :func:`anova_oneway` —
    map-side combined per-group moments, one k-row aggregate.
    """
    v = F.col(value_col).cast("double")
    d = df.filter(v.isNotNull()).select(
        F.col(group_col).alias("g"), v.alias("_x")
    )
    med = d.groupBy("g").agg(F.percentile("_x", F.lit(0.5)).alias("_m"))
    z = d.join(F.broadcast(med), "g").select(
        "g", F.abs(F.col("_x") - F.col("_m")).alias("_z")
    )
    per_g = z.groupBy("g").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum("_z").alias("sg"),
        F.sum(F.col("_z") * F.col("_z")).alias("qg"),
    )
    a = per_g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("ng").cast("long").alias("n"),
        F.sum("sg").alias("s"),
        F.sum("qg").alias("q"),
        F.sum(
            F.col("sg") * F.col("sg") / F.col("ng").cast("double")
        ).alias("sb"),
    )
    n = F.col("n").cast("double")
    k = F.col("k").cast("double")
    ssb = F.col("sb") - F.col("s") * F.col("s") / n
    ssw = F.col("q") - F.col("sb")
    f = (ssb / (k - F.lit(1.0))) / (ssw / (n - k))
    return a.select(
        "k",
        "n",
        F.round(
            F.when((F.col("k") > 1) & (ssw > 0), f), round_to
        ).alias("f_bf"),
    )


def jarque_bera(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Jarque-Bera normality test (Jarque & Bera 1980) from the first
    four moments: ``JB = n/6·(S² + (K−3)²/4)`` where S is sample
    skewness and K kurtosis — the cheap screen deciding whether
    normal-theory statistics (t, F, control bands) are even admissible
    for a metric, per group.

    Returns one row per group (or ONE row when ``group_col`` is None):
    ``[g,] n, skew, kurt, jb`` — all NULL when the variance is 0.

    Plan: ONE corpus aggregate to per-group raw moment sums (map-side
    combine); central moments by closed form on the k-row frame.  The
    expression shape is identical in the DuckDB twin, so cross-engine
    agreement holds to rounding.
    """
    v = F.col(value_col).cast("double")
    d = df.filter(v.isNotNull())
    keys = [F.col(group_col).alias("g")] if group_col else []
    agg = (d.groupBy(*keys) if keys else d.groupBy()).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("s1"),
        F.sum(v * v).alias("s2"),
        F.sum(v * v * v).alias("s3"),
        F.sum(v * v * v * v).alias("s4"),
    )
    n = F.col("n").cast("double")
    mu = F.col("s1") / n
    m2 = F.col("s2") / n - mu * mu
    m3 = (
        F.col("s3") / n
        - F.lit(3.0) * mu * F.col("s2") / n
        + F.lit(2.0) * mu * mu * mu
    )
    m4 = (
        F.col("s4") / n
        - F.lit(4.0) * mu * F.col("s3") / n
        + F.lit(6.0) * mu * mu * F.col("s2") / n
        - F.lit(3.0) * mu * mu * mu * mu
    )
    skew = m3 / F.pow(m2, F.lit(1.5))
    kurt = m4 / (m2 * m2)
    jb = (
        n
        / F.lit(6.0)
        * (
            skew * skew
            + (kurt - F.lit(3.0)) * (kurt - F.lit(3.0)) / F.lit(4.0)
        )
    )
    cols = (["g"] if keys else []) + [
        "n",
        F.round(F.when(m2 > 0, skew), round_to).alias("skew"),
        F.round(F.when(m2 > 0, kurt), round_to).alias("kurt"),
        F.round(F.when(m2 > 0, jb), round_to).alias("jb"),
    ]
    return agg.select(*cols)


def cochran_q(
    df: DataFrame,
    judges: list,
    round_to: int = 6,
) -> DataFrame:
    """Cochran's Q test (Cochran 1950) for k binary judges on the SAME
    rows: do k versions of a pass/fail gate have equal pass rates once
    per-row correlation is accounted for?  The k-judge generalization
    of McNemar (:func:`mcnemar_test`) — the migration gate for a
    quality-filter CASCADE rather than a single swap.

    ``Q = (k−1)·(k·ΣC_j² − N²) / (k·N − ΣR_i²)`` with column totals
    C_j, row totals R_i, grand total N; χ²(k−1) under marginal
    homogeneity.  Returns ONE row: ``n, k, c_1..c_k, q_cochran``
    (NULL when the denominator is 0 — every row all-pass or all-fail).

    Plan: ONE corpus aggregate (k conditional sums + one row-total
    square sum), map-side combined; no groupBy, nothing row-sized
    survives.
    """
    k = len(judges)
    cols = [
        (F.col(j) if isinstance(j, str) else j).cast("int").alias(f"_j{i}")
        for i, j in enumerate(judges)
    ]
    base = df.select(*cols)
    r = sum(F.col(f"_j{i}") for i in range(k))
    agg = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *[
            F.sum(F.col(f"_j{i}")).cast("long").alias(f"c_{i + 1}")
            for i in range(k)
        ],
        F.sum((r * r).cast("long")).cast("long").alias("_r2"),
    )
    csum = sum(F.col(f"c_{i + 1}") for i in range(k))
    c2sum = sum(
        F.col(f"c_{i + 1}").cast("double") * F.col(f"c_{i + 1}")
        for i in range(k)
    )
    kk = F.lit(float(k))
    num = (kk - F.lit(1.0)) * (
        kk * c2sum - csum.cast("double") * csum.cast("double")
    )
    den = kk * csum.cast("double") - F.col("_r2").cast("double")
    return agg.select(
        "n",
        F.lit(k).alias("k"),
        *[f"c_{i + 1}" for i in range(k)],
        F.round(F.when(den > 0, num / den), round_to).alias("q_cochran"),
    )


def friedman_test(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Friedman test (Friedman 1937) over complete blocks: k treatments
    measured once per block, ranked WITHIN each block — the
    nonparametric repeated-measures ANOVA (e.g. are per-user engagement
    values systematically ordered across event types?).

    Average ranks for ties; tie-corrected statistic
    ``χ²_F = (12·ΣR_j²/(n·k·(k+1)) − 3n(k+1)) / (1 − Σ(t³−t)/(n(k³−k)))``
    with R_j the per-treatment rank-sum over n complete blocks.

    Incomplete blocks (fewer than k treatments) are dropped — the test
    is defined over complete blocks only.  Returns ONE row:
    ``n_blocks, k, chi2_f`` (NULL when every block is fully tied).

    Plan: one distinct-treatment count (k, metadata-sized, broadcast
    into the filter), one block-partitioned rank window (blocks are
    k-row groups — thousands of tiny partitions, never a global
    window), then one k-row aggregate + one scalar tie census.
    """
    d = df.select(
        F.col(block_col).alias("b"),
        F.col(treatment_col).alias("trt"),
        F.col(value_col).cast("double").alias("_v"),
    ).filter(F.col("_v").isNotNull())
    k_df = d.select(F.countDistinct("trt").alias("_k"))
    wb = Window.partitionBy("b")
    complete = (
        d.withColumn("_bn", F.count(F.lit(1)).over(wb))
        .crossJoin(F.broadcast(k_df))
        .filter(F.col("_bn") == F.col("_k"))
    )
    w_rank = Window.partitionBy("b").orderBy("_v")
    w_tie = Window.partitionBy("b", "_v")
    ranked = complete.select(
        "b",
        "trt",
        F.col("_k"),
        (
            F.rank().over(w_rank).cast("double")
            + (F.count(F.lit(1)).over(w_tie) - F.lit(1)).cast("double")
            / F.lit(2.0)
        ).alias("_r"),
        F.count(F.lit(1)).over(w_tie).cast("double").alias("_t"),
    )
    per_trt = ranked.groupBy("trt").agg(
        F.sum("_r").alias("rj"), F.count(F.lit(1)).alias("nb")
    )
    # tie census: each (block, value) group of size t contributes t³−t,
    # counted once per group (divide the per-row term by t)
    ties = ranked.agg(
        F.sum(
            (F.col("_t") * F.col("_t") * F.col("_t") - F.col("_t"))
            / F.col("_t")
        ).alias("_tsum"),
        F.max("_k").alias("_kk"),
    )
    a = per_trt.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.max("nb").cast("long").alias("n_blocks"),
        F.sum(F.col("rj") * F.col("rj")).alias("_r2"),
    ).crossJoin(F.broadcast(ties.select("_tsum")))
    n = F.col("n_blocks").cast("double")
    kk = F.col("k").cast("double")
    chi2 = (
        F.lit(12.0) * F.col("_r2") / (n * kk * (kk + F.lit(1.0)))
        - F.lit(3.0) * n * (kk + F.lit(1.0))
    )
    corr = F.lit(1.0) - F.col("_tsum") / (n * (kk * kk * kk - kk))
    return a.select(
        "n_blocks",
        "k",
        F.round(F.when(corr > 0, chi2 / corr), round_to).alias("chi2_f"),
    )


def ece_mce(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Expected / maximum calibration error (Naeini et al. 2015) —
    the scalar summary of the reliability table
    (:func:`score_calibration`): equal-width bins over the score,
    ``ECE = Σ_b (n_b/N)·|acc_b − conf_b|`` and ``MCE = max_b |…|``.
    The single-number gate a pipeline alarms on before trusting a
    classifier's probabilities as sampling weights.

    Scores are clamped to [0, 1]; a score of exactly 1.0 falls in the
    top bin.  Returns ONE row: ``n, n_bins_used, ece, mce``.

    Plan: ONE corpus aggregate to n_bins rows (map-side combine), one
    n_bins-row aggregate.
    """
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int")
    b = F.least(
        F.floor(
            F.greatest(F.least(s, F.lit(1.0)), F.lit(0.0))
            * F.lit(float(n_bins))
        ),
        F.lit(n_bins - 1),
    )
    binned = (
        df.filter(s.isNotNull() & y.isNotNull())
        .groupBy(b.alias("_b"))
        .agg(
            F.count(F.lit(1)).alias("nb"),
            F.avg(y.cast("double")).alias("acc"),
            F.avg(F.greatest(F.least(s, F.lit(1.0)), F.lit(0.0))).alias(
                "conf"
            ),
        )
    )
    gap = F.abs(F.col("acc") - F.col("conf"))
    a = binned.agg(
        F.sum("nb").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_bins_used"),
        F.sum(F.col("nb").cast("double") * gap).alias("_wgap"),
        F.max(gap).alias("_mce"),
    )
    return a.select(
        "n",
        "n_bins_used",
        F.round(F.col("_wgap") / F.col("n").cast("double"), round_to).alias(
            "ece"
        ),
        F.round("_mce", round_to).alias("mce"),
    )


def rbo_overlap(
    ranking_a: DataFrame,
    ranking_b: DataFrame,
    item_col: str,
    rank_col: str,
    depth: int = 50,
    p: float = 0.9,
    round_to: int = 6,
) -> DataFrame:
    """Rank-biased overlap (Webber, Moffat & Zobel 2010) between two
    top-``depth`` rankings: top-weighted agreement in [0, 1] — the
    ranker-swap audit (did replacing the BM25 scorer reorder what the
    selection stage actually consumes?) that Kendall's tau gets wrong
    for top-k lists (tau weights all positions equally and needs
    conjoint lists).

    Truncated base RBO: ``(1−p)·Σ_{k≤d} p^{k−1}·|S_k ∩ T_k|/k``, the
    guaranteed-lower-bound ("min") form; also reports overlap@depth.
    An item ranked ≤ k in BOTH lists enters every prefix from
    ``m = max(r_a, r_b)`` on, so each joined item contributes the
    CLOSED-FORM weight ``(1−p)·Σ_{k=m..d} p^{k−1}/k`` — the weights are
    a depth-sized literal array (driver constant), and the whole
    statistic is one equi-join of two depth-sized frames plus ONE
    aggregate.  Nothing corpus-sized is touched: callers pass already-
    truncated rankings (a top-k window upstream).

    Returns ONE row: ``depth, overlap_at_depth, rbo_min``.
    """
    d = int(depth)
    weights = []
    for m in range(1, d + 1):
        weights.append(sum(p ** (k - 1) / k for k in range(m, d + 1)))
    a = ranking_a.select(
        F.col(item_col).alias("_i"), F.col(rank_col).alias("_ra")
    ).filter(F.col("_ra") <= d)
    b = ranking_b.select(
        F.col(item_col).alias("_i"), F.col(rank_col).alias("_rb")
    ).filter(F.col("_rb") <= d)
    joined = a.join(b, "_i").select(
        F.greatest("_ra", "_rb").cast("int").alias("_m")
    )
    w_arr = F.array(*[F.lit(float(w)) for w in weights])
    agg = joined.agg(
        F.count(F.lit(1)).cast("long").alias("overlap_at_depth"),
        F.sum(F.try_element_at(w_arr, F.col("_m"))).alias("_ws"),
    )
    return agg.select(
        F.lit(d).alias("depth"),
        "overlap_at_depth",
        F.round(
            F.lit(1.0 - p) * F.coalesce(F.col("_ws"), F.lit(0.0)), round_to
        ).alias("rbo_min"),
    )


def quantile_pinball(
    train: DataFrame,
    test: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: tuple = (0.1, 0.5, 0.9),
    round_to: int = 6,
) -> DataFrame:
    """Pinball (quantile) loss scoreboard for per-group quantile
    predictions: each test row is predicted by its group's TRAIN
    quantile, scored with ``L_q = mean(max(q·e, (q−1)·e))``,
    ``e = y − ŷ`` — the proper scoring rule for quantile forecasts
    (MASE/sMAPE judge point forecasts; a p90 capacity estimate needs
    its own loss).

    Returns one row per quantile: ``q, n, pinball`` — lower is better;
    a good p90 has most errors negative but small.

    Plan: ONE train aggregate to (group × quantiles) exact
    interpolated quantiles (group-cardinality frame, broadcast), one
    equi-join onto test, ONE aggregate.  Train rows never shuffle
    beyond the group aggregate; test rows never shuffle at all.
    """
    v = F.col(value_col).cast("double")
    qs = [float(q) for q in quantiles]
    per_g = (
        train.filter(v.isNotNull())
        .groupBy(F.col(group_col).alias("_g"))
        .agg(
            *[
                F.percentile(v, F.lit(q)).alias(f"_p{i}")
                for i, q in enumerate(qs)
            ]
        )
    )
    t = test.filter(v.isNotNull()).select(
        F.col(group_col).alias("_g"), v.alias("_y")
    )
    j = t.join(F.broadcast(per_g), "_g")
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for i, q in enumerate(qs):
        e = F.col("_y") - F.col(f"_p{i}")
        aggs.append(
            F.avg(
                F.greatest(F.lit(q) * e, F.lit(q - 1.0) * e)
            ).alias(f"_l{i}")
        )
    a = j.agg(*aggs)
    rows = None
    for i, q in enumerate(qs):
        r = a.select(
            F.lit(q).alias("q"),
            "n",
            F.round(F.col(f"_l{i}"), round_to).alias("pinball"),
        )
        rows = r if rows is None else rows.unionByName(r)
    return rows


def theil_decomposition(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Theil T inequality index with exact between/within-group
    decomposition (Theil 1967): how unequal is ``value_col`` (e.g.
    token counts — is the corpus a few mega-documents plus dust?), and
    how much of the inequality is BETWEEN sources vs WITHIN them?  The
    additive-decomposable complement to the Gini coefficient (Gini does
    not decompose; Theil does, exactly:
    ``T = Σ_g s_g·T_g + Σ_g s_g·ln(μ_g/μ)`` with value shares s_g).

    Only strictly positive values enter (ln discipline).  Returns ONE
    row: ``n, k, theil_total, theil_between, theil_within`` — total =
    between + within to rounding by construction.

    Plan: ONE corpus aggregate to per-group (n, Σx, Σx·ln x) — map-side
    combined — then closed-form algebra on the k-row frame.
    """
    x = F.col(value_col).cast("double")
    d = df.filter(x.isNotNull() & (x > 0)).select(
        F.col(group_col).alias("g"), x.alias("_x")
    )
    per_g = d.groupBy("g").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum("_x").alias("sg"),
        F.sum(F.col("_x") * F.log("_x")).alias("xlg"),
    )
    a = per_g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("ng").cast("long").alias("n"),
        F.sum("sg").alias("_s"),
        F.sum("xlg").alias("_xl"),
        # Σ_g s_g·T_g = Σ_g (sg/s)·(xlg/sg − ln(sg/ng)) — the s-division
        # distributes, so the within term needs only Σ xlg and
        # Σ sg·ln(sg/ng)
        F.sum(F.col("sg") * F.log(F.col("sg") / F.col("ng"))).alias(
            "_slmu"
        ),
    )
    n = F.col("n").cast("double")
    mu = F.col("_s") / n
    t_total = F.col("_xl") / F.col("_s") - F.log(mu)
    t_within = (F.col("_xl") - F.col("_slmu")) / F.col("_s")
    t_between = F.col("_slmu") / F.col("_s") - F.log(mu)
    return a.select(
        "n",
        "k",
        F.round(t_total, round_to).alias("theil_total"),
        F.round(t_between, round_to).alias("theil_between"),
        F.round(t_within, round_to).alias("theil_within"),
    )


def raking_weights(
    df: DataFrame,
    row_col: str,
    col_col: str,
    iterations: int = 2,
    round_to: int = 6,
) -> DataFrame:
    """Iterative proportional fitting / raking (Deming & Stephan 1940)
    to UNIFORM marginal targets: per-cell calibration weights that make
    every ``row_col`` level and every ``col_col`` level carry an equal
    weighted share — the survey-calibration step a corpus sampler runs
    so a rebalanced (source × language) mix doesn't silently re-weight
    one axis while fixing the other.

    Unrolled for a FIXED ``iterations`` count (deterministic, engine-
    portable; IPF converges geometrically, 2 passes are standard for
    2-way tables).  Returns one row per observed cell: ``r, c, n,
    weight`` — weight multiplies each of the cell's rows so weighted
    marginals approach N/R per row level and N/C per column level.

    Plan: ONE corpus aggregate to the R×C cell frame; every IPF pass is
    two window sums over that metadata-sized frame.  Nothing row-sized
    iterates.
    """
    cells = df.groupBy(
        F.col(row_col).alias("r"), F.col(col_col).alias("c")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w_r = Window.partitionBy("r")
    w_c = Window.partitionBy("c")
    w_all = Window.partitionBy()
    cells = cells.withColumn("_w", F.lit(1.0))
    nn = F.sum(F.col("n")).over(w_all).cast("double")
    n_rows = F.size(F.collect_set("r").over(w_all)).cast("double")
    n_cols = F.size(F.collect_set("c").over(w_all)).cast("double")
    for _ in range(int(iterations)):
        cells = cells.withColumn(
            "_w",
            F.col("_w")
            * (nn / n_rows)
            / F.sum(F.col("n").cast("double") * F.col("_w")).over(w_r),
        )
        cells = cells.withColumn(
            "_w",
            F.col("_w")
            * (nn / n_cols)
            / F.sum(F.col("n").cast("double") * F.col("_w")).over(w_c),
        )
    return cells.select(
        "r", "c", "n", F.round("_w", round_to).alias("weight")
    )


def grubbs_test(
    df: DataFrame,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Grubbs' maximum-studentized-deviation test (Grubbs 1950): is the
    single most extreme value an outlier relative to a normal bulk?
    ``G = max(x̄−min, max−x̄)/s`` — the one-shot companion to the MAD
    fence (q_mad_outliers flags many; Grubbs formally tests the worst
    one, e.g. a suspect daily volume before excluding it from a trend
    fit).

    Returns ONE row: ``n, g_stat, side, extreme`` (side = which tail
    supplied the maximum; NULL stat when s = 0 or n < 3).

    Plan: ONE aggregate — min/max/moments in the same pass, closed-form
    algebra after.  No second scan, no sort.
    """
    x = F.col(value_col).cast("double")
    a = df.filter(x.isNotNull()).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).alias("_s"),
        F.sum(x * x).alias("_q"),
        F.min(x).alias("_mn"),
        F.max(x).alias("_mx"),
    )
    n = F.col("n").cast("double")
    mu = F.col("_s") / n
    var = (F.col("_q") - F.col("_s") * F.col("_s") / n) / (n - F.lit(1.0))
    s = F.sqrt(var)
    hi_dev = F.col("_mx") - mu
    lo_dev = mu - F.col("_mn")
    g = F.greatest(hi_dev, lo_dev) / s
    return a.select(
        "n",
        F.round(
            F.when((F.col("n") >= 3) & (var > 0), g), round_to
        ).alias("g_stat"),
        F.when(hi_dev >= lo_dev, F.lit("high"))
        .otherwise(F.lit("low"))
        .alias("side"),
        F.when(hi_dev >= lo_dev, F.col("_mx"))
        .otherwise(F.col("_mn"))
        .alias("extreme"),
    )


def cronbach_alpha(
    df: DataFrame,
    item_cols: list,
    round_to: int = 6,
) -> DataFrame:
    """Cronbach's alpha (Cronbach 1951) over k numeric item columns
    scored on the same rows: do the items measure ONE underlying
    construct?  The internal-consistency audit for a composite score
    (e.g. is a "quality" score built from k signals coherent, or is one
    signal pulling against the others?).

    ``α = k/(k−1)·(1 − Σᵢvar(itemᵢ)/var(Σᵢitemᵢ))`` with population
    variances (the n/(n−1) factor cancels in the ratio, so the
    convention does not matter).

    Returns ONE row: ``n, k, alpha`` (NULL when the total variance is
    0).  Plan: ONE aggregate — per-item first/second moments plus the
    row-sum moments in the same pass, map-side combined.
    """
    k = len(item_cols)
    items = [
        (F.col(c) if isinstance(c, str) else c).cast("double").alias(
            f"_x{i}"
        )
        for i, c in enumerate(item_cols)
    ]
    base = df.select(*items)
    cond = F.lit(True)
    for i in range(k):
        cond = cond & F.col(f"_x{i}").isNotNull()
    base = base.filter(cond)
    tot = sum(F.col(f"_x{i}") for i in range(k))
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for i in range(k):
        x = F.col(f"_x{i}")
        aggs += [F.sum(x).alias(f"_s{i}"), F.sum(x * x).alias(f"_q{i}")]
    aggs += [F.sum(tot).alias("_st"), F.sum(tot * tot).alias("_qt")]
    a = base.agg(*aggs)
    n = F.col("n").cast("double")
    var = lambda s, q: F.col(q) / n - (F.col(s) / n) * (F.col(s) / n)  # noqa: E731
    item_var = sum(var(f"_s{i}", f"_q{i}") for i in range(k))
    tot_var = var("_st", "_qt")
    alpha = (
        F.lit(k / (k - 1.0)) * (F.lit(1.0) - item_var / tot_var)
    )
    return a.select(
        "n",
        F.lit(k).alias("k"),
        F.round(F.when(tot_var > 0, alpha), round_to).alias("alpha"),
    )


def icc_oneway(
    df: DataFrame,
    block_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """One-way random-effects intraclass correlation ICC(1,1)
    (Shrout & Fleiss 1979): what share of measurement variance is
    BETWEEN blocks rather than within them?  The agreement measure for
    k repeated measurements per block (balanced design — blocks with a
    deviating measurement count are dropped so MS degrees of freedom
    stay exact).

    ``ICC = (MSB − MSW) / (MSB + (k−1)·MSW)`` from the one-way ANOVA
    mean squares.  Returns ONE row: ``n_blocks, k, icc`` (NULL when
    the denominator is 0 or k < 2).

    Plan: per-block moment aggregate → modal-k filter on the block
    frame → one block-cardinality aggregate; the corpus is read once.
    """
    v = F.col(value_col).cast("double")
    per_b = (
        df.filter(v.isNotNull())
        .groupBy(F.col(block_col).alias("b"))
        .agg(
            F.count(F.lit(1)).alias("kb"),
            F.sum(v).alias("sb"),
            F.sum(v * v).alias("qb"),
        )
    )
    # balanced design: keep blocks with the MODAL measurement count
    kmode = (
        per_b.groupBy("kb")
        .agg(F.count(F.lit(1)).alias("_c"))
        .orderBy(F.col("_c").desc(), F.col("kb").desc())
        .limit(1)
        .select(F.col("kb").alias("_k"))
    )
    kept = per_b.join(F.broadcast(kmode), per_b.kb == F.col("_k"))
    a = kept.agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.max("_k").cast("long").alias("k"),
        F.sum("sb").alias("_s"),
        F.sum("qb").alias("_q"),
        F.sum(F.col("sb") * F.col("sb") / F.col("kb").cast("double")).alias(
            "_sb2"
        ),
    )
    nb = F.col("n_blocks").cast("double")
    kk = F.col("k").cast("double")
    n = nb * kk
    ssb = F.col("_sb2") - F.col("_s") * F.col("_s") / n
    ssw = F.col("_q") - F.col("_sb2")
    msb = ssb / (nb - F.lit(1.0))
    msw = ssw / (nb * (kk - F.lit(1.0)))
    icc = (msb - msw) / (msb + (kk - F.lit(1.0)) * msw)
    return a.select(
        "n_blocks",
        "k",
        F.round(
            F.when(
                (F.col("k") > 1)
                & (F.col("n_blocks") > 1)
                & (msb + (kk - F.lit(1.0)) * msw > 0),
                icc,
            ),
            round_to,
        ).alias("icc"),
    )


def holm_bonferroni(
    df: DataFrame,
    p_col: str,
    tiebreak_cols: list[str],
    alpha: float = 0.05,
    round_to: int = 6,
) -> DataFrame:
    """Holm step-down correction (Holm 1979) over a family of m
    hypotheses: the FAMILY-WISE error guard (any false positive at all)
    complementing :func:`bh_fdr`'s false-discovery RATE — the right
    control when one wrong "significant" pair triggers an expensive
    action.  Uniformly more powerful than plain Bonferroni, no
    independence assumption.

    Adjusted p: rank ascending, ``p̃_(i) = max_{j≤i} min(1,
    (m−j+1)·p_(j))`` (the running max enforces step-down
    monotonicity); reject while p̃ ≤ α.

    Columns: input + ``p_rank, m, p_adj, reject``.

    Scale shape: the family is groups-sized; one unpartitioned rank
    window + one running max over that metadata frame (bh_fdr's
    discipline; callers pass already-rounded p-values).
    """
    w = Window.orderBy(F.col(p_col).asc(), *[F.col(c) for c in tiebreak_cols])
    wall = Window.partitionBy()
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    ranked = (
        df.withColumn("p_rank", F.row_number().over(w))
        .withColumn("m", F.count(F.lit(1)).over(wall))
    )
    step = F.least(
        F.lit(1.0),
        (F.col("m") - F.col("p_rank") + F.lit(1)).cast("double")
        * F.col(p_col),
    )
    adj = F.max(step).over(wcum)
    return ranked.withColumn("p_adj", F.round(adj, round_to)).withColumn(
        "reject", F.col("p_adj") <= F.lit(float(alpha))
    )


def exp_interarrival_fit(
    df: DataFrame,
    gap_col: str,
    id_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Exponential fit + one-sample Kolmogorov-Smirnov GoF for
    inter-arrival gaps: ``λ̂ = 1/mean`` (the MLE), then
    ``D = max_j max(j/n − F(x_(j)), F(x_(j)) − (j−1)/n)`` against
    ``F(x) = 1 − e^(−λ̂x)`` — the Poisson-process sanity check behind
    every queueing/capacity assumption ("arrivals are memoryless") and
    the burstiness story q_burstiness tells, now as a formal test.

    Returns ONE row: ``n, lambda_hat, ks_d, sqrt_n_d`` (√n·D ≳ 1.36
    rejects exponentiality at 5%, Lilliefors-conservative since λ̂ is
    estimated).

    Plan: callers pass a BOUNDED audit sample of gaps (the test's
    power saturates long before corpus scale); one mean aggregate
    broadcast back, one rank window over the sample, ONE aggregate.
    ``id_col`` totalizes the sort for engine-portable ranks.
    """
    g = F.col(gap_col).cast("double")
    d = df.select(g.alias("_g"), F.col(id_col).alias("_id")).filter(
        g.isNotNull() & (g > 0)
    )
    mean_row = d.agg(
        F.avg("_g").alias("_mu"), F.count(F.lit(1)).alias("_n")
    )
    w = Window.orderBy("_g", "_id")
    ranked = d.crossJoin(F.broadcast(mean_row)).select(
        "_g",
        "_mu",
        "_n",
        F.row_number().over(w).cast("double").alias("_j"),
    )
    fx = F.lit(1.0) - F.exp(-F.col("_g") / F.col("_mu"))
    n = F.col("_n").cast("double")
    dev = F.greatest(
        F.col("_j") / n - fx, fx - (F.col("_j") - F.lit(1.0)) / n
    )
    a = ranked.agg(
        F.max("_n").cast("long").alias("n"),
        F.round(F.lit(1.0) / F.max("_mu"), round_to).alias("lambda_hat"),
        F.max(dev).alias("_d"),
    )
    return a.select(
        "n",
        "lambda_hat",
        F.round("_d", round_to).alias("ks_d"),
        F.round(
            F.sqrt(F.col("n").cast("double")) * F.col("_d"), round_to
        ).alias("sqrt_n_d"),
    )


def binomial_overdispersion(
    df: DataFrame,
    group_col: str,
    success_col,
    round_to: int = 6,
) -> DataFrame:
    """Binomial overdispersion check across groups: under a shared rate,
    the per-group success counts should scatter like Binomial(n_g, p̄);
    the dispersion ``φ = X²/(k−1)`` with ``X² = Σ_g (s_g − n_g·p̄)² /
    (n_g·p̄(1−p̄))`` is ≈ 1 when they do and ≫ 1 when group rates are
    genuinely heterogeneous — the one-number screen that says whether a
    pooled rate (or a pooled z-test) is even meaningful for this corpus
    before anyone reads per-source dashboards.

    Returns ONE row: ``k, n, p_bar, x2, phi`` (NULL when p̄ is 0 or 1,
    or k < 2).

    Plan: ONE corpus aggregate to (group, n, s) — map-side combined —
    then one k-row aggregate.  The q_prop_ztest input shape without the
    pair join.
    """
    s = (
        F.col(success_col) if isinstance(success_col, str) else success_col
    ).cast("int")
    per_g = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).alias("ng"), F.sum(s).alias("sg")
    )
    tot = per_g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("ng").cast("long").alias("n"),
        F.sum("sg").alias("_s"),
        F.collect_list(F.struct("ng", "sg")).alias("_cells"),
    )
    # X² needs p̄ alongside every cell: the cells frame is
    # group-cardinality-sized, so carrying it through collect_list on
    # the 1-row total frame costs k structs of metadata, no second scan
    # and no join
    p = F.col("_s").cast("double") / F.col("n").cast("double")
    x2 = F.aggregate(
        F.col("_cells"),
        F.lit(0.0),
        lambda acc, c: acc
        + (c["sg"].cast("double") - c["ng"].cast("double") * p)
        * (c["sg"].cast("double") - c["ng"].cast("double") * p)
        / (c["ng"].cast("double") * p * (F.lit(1.0) - p)),
    )
    guard = (F.col("k") > 1) & (p > 0) & (p < 1)
    return tot.select(
        "k",
        "n",
        F.round(p, round_to).alias("p_bar"),
        F.round(F.when(guard, x2), round_to).alias("x2"),
        F.round(
            F.when(guard, x2 / (F.col("k") - F.lit(1)).cast("double")),
            round_to,
        ).alias("phi"),
    )


def _threshold_frame(df: DataFrame, score_col: str, label_col: str):
    """Shared machinery: per-DISTINCT-SCORE positive/negative counts with
    descending cumulative TP/FP — the (value-cardinality, never
    corpus-cardinality) frame behind average precision and threshold
    selection, the mann_whitney rank-algebra discipline."""
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int")
    per_s = (
        df.filter(s.isNotNull() & y.isNotNull())
        .groupBy(s.alias("t"))
        .agg(
            F.sum(y).alias("pos"),
            F.sum(F.lit(1) - y).alias("neg"),
        )
    )
    w = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    return (
        per_s.withColumn("tp", F.sum("pos").over(w))
        .withColumn("fp", F.sum("neg").over(w))
        .withColumn("p_tot", F.sum("pos").over(wall))
        .withColumn("n_tot", F.sum(F.col("pos") + F.col("neg")).over(wall))
    )


def average_precision(
    df: DataFrame,
    score_col: str,
    label_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Average precision (the area under the precision-recall curve,
    step-interpolated at each distinct score — the sklearn convention
    ``AP = Σ_k (R_k − R_{k−1})·P_k``): the ranking-quality summary that,
    unlike q_roc_auc, does NOT reward a classifier for ranking easy
    negatives low when positives are rare — the right scoreboard for
    rare-class corpus filters.

    Returns ONE row: ``n, n_pos, ap`` (NULL when there are no
    positives).

    Plan: the corpus collapses to per-distinct-score counts (map-side
    combine); ``ΔR_k = pos_k/P`` makes AP one cumulative window + ONE
    aggregate over that value-cardinality frame.
    """
    fr = _threshold_frame(df, score_col, label_col)
    prec = F.try_divide(
        F.col("tp").cast("double"), (F.col("tp") + F.col("fp")).cast("double")
    )
    dr = F.try_divide(
        F.col("pos").cast("double"), F.col("p_tot").cast("double")
    )
    a = fr.agg(
        F.max("n_tot").cast("long").alias("n"),
        F.max("p_tot").cast("long").alias("n_pos"),
        F.sum(dr * prec).alias("_ap"),
    )
    return a.select(
        "n",
        "n_pos",
        F.round(
            F.when(F.col("n_pos") > 0, F.col("_ap")), round_to
        ).alias("ap"),
    )


def threshold_select(
    df: DataFrame,
    score_col: str,
    label_col: str,
    c_fp: float = 1.0,
    c_fn: float = 1.0,
    round_to: int = 6,
) -> DataFrame:
    """Operating-point selection over every distinct score threshold:
    the cost-optimal cut (minimizing ``c_fp·FP + c_fn·FN``) and the
    Youden-J-optimal cut (maximizing ``TPR − FPR``) — the step that
    turns a scored corpus filter into a DEPLOYED one, with the
    asymmetric-cost knob dashboards never expose.

    Ties break toward the SMALLEST threshold (keep less when equally
    good).  Returns ONE row: ``n, n_pos, thr_cost, cost, thr_j, j``.

    Plan: same per-distinct-score frame as :func:`average_precision`
    (one aggregate + one cumulative window), then two argmin/argmax
    structs in ONE final aggregate — no sort of the corpus, no joins.
    """
    fr = _threshold_frame(df, score_col, label_col)
    fn = F.col("p_tot") - F.col("tp")
    cost = (
        F.lit(float(c_fp)) * F.col("fp").cast("double")
        + F.lit(float(c_fn)) * fn.cast("double")
    )
    tpr = F.try_divide(
        F.col("tp").cast("double"), F.col("p_tot").cast("double")
    )
    fpr = F.try_divide(
        F.col("fp").cast("double"),
        (F.col("n_tot") - F.col("p_tot")).cast("double"),
    )
    j = tpr - fpr
    a = fr.agg(
        F.max("n_tot").cast("long").alias("n"),
        F.max("p_tot").cast("long").alias("n_pos"),
        F.min(F.struct(cost.alias("c"), F.col("t").alias("t"))).alias(
            "_bc"
        ),
        F.max(
            F.struct(
                j.alias("j"), (-F.col("t")).alias("negt")
            )
        ).alias("_bj"),
    )
    return a.select(
        "n",
        "n_pos",
        F.col("_bc.t").alias("thr_cost"),
        F.round(F.col("_bc.c"), round_to).alias("cost"),
        (-F.col("_bj.negt")).alias("thr_j"),
        F.round(F.col("_bj.j"), round_to).alias("j"),
    )


def negbin_fit(
    df: DataFrame,
    count_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Negative-binomial method-of-moments fit for overdispersed counts
    (Greenwood & Yule 1920): ``r = μ²/(σ²−μ)``, ``p = μ/σ²`` — the
    count model that actually fits per-user activity when Poisson
    doesn't (σ² ≫ μ is the rule for user event counts, and a Poisson
    capacity model silently under-provisions the tail).  Reports the
    variance-to-mean ratio (VMR = 1 ⇒ Poisson) alongside.

    Returns ONE row: ``n, mean, vmr, r, p`` (r/p NULL when σ² ≤ μ —
    under-dispersed data has no NB fit; use the plain Poisson).

    Plan: ONE aggregate (callers usually pass an already-aggregated
    per-entity count frame), closed form after.
    """
    x = F.col(count_col).cast("double")
    a = df.filter(x.isNotNull()).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).alias("_s"),
        F.sum(x * x).alias("_q"),
    )
    n = F.col("n").cast("double")
    mu = F.col("_s") / n
    var = (F.col("_q") - F.col("_s") * F.col("_s") / n) / (n - F.lit(1.0))
    good = (F.col("n") > 1) & (var > mu) & (mu > 0)
    return a.select(
        "n",
        F.round(mu, round_to).alias("mean"),
        F.round(
            F.when((F.col("n") > 1) & (mu > 0), var / mu), round_to
        ).alias("vmr"),
        F.round(F.when(good, mu * mu / (var - mu)), round_to).alias("r"),
        F.round(F.when(good, mu / var), round_to).alias("p"),
    )


def zero_inflation_check(
    df: DataFrame,
    count_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Zero-inflation screen for a count column (the van den Broek 1995
    score-test quantity, reported descriptively): observed zeros vs the
    ``n·e^(−λ̂)`` a Poisson with the same mean predicts — ratio ≫ 1
    says the zeros are a separate regime (users who never convert at
    all) and a hurdle/ZIP model is needed, not a rate tweak.

    Returns ONE row: ``n, lambda_hat, zeros_obs, zeros_exp,
    inflation`` (NULL inflation when the expectation underflows to 0).

    Plan: ONE aggregate — zeros counted in the same pass as the mean.
    """
    x = F.col(count_col).cast("double")
    a = df.filter(x.isNotNull()).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg(x).alias("_mu"),
        F.sum((x == 0).cast("long")).cast("long").alias("zeros_obs"),
    )
    n = F.col("n").cast("double")
    exp0 = n * F.exp(-F.col("_mu"))
    return a.select(
        "n",
        F.round("_mu", round_to).alias("lambda_hat"),
        "zeros_obs",
        F.round(exp0, round_to).alias("zeros_exp"),
        F.round(
            F.when(exp0 > 0, F.col("zeros_obs").cast("double") / exp0),
            round_to,
        ).alias("inflation"),
    )


def runs_test(
    df: DataFrame,
    order_col: str,
    flag_col,
    round_to: int = 6,
) -> DataFrame:
    """Wald-Wolfowitz runs test (Wald & Wolfowitz 1940) on an ordered
    binary sequence: too FEW runs means positive serial dependence
    (streaky — e.g. up/down days cluster), too MANY means oscillation;
    under randomness ``E[R] = 2·n₁·n₀/n + 1`` with the classical
    variance, and ``z = (R − E[R])/σ`` is standard normal.  The
    randomness audit for any daily-indicator series before treating its
    rate as i.i.d.

    Returns ONE row: ``n, n1, runs, z`` (z NULL when either class is
    empty or σ = 0).

    Plan: callers pass the (already metadata-sized) ordered series; one
    lag window counts run boundaries, ONE aggregate closes the form.
    """
    f = (F.col(flag_col) if isinstance(flag_col, str) else flag_col).cast(
        "int"
    )
    d = df.select(F.col(order_col).alias("_t"), f.alias("_f")).filter(
        F.col("_f").isNotNull()
    )
    w = Window.orderBy("_t")
    staged = d.withColumn(
        "_new",
        (
            F.coalesce(
                (F.col("_f") != F.lag("_f").over(w)).cast("int"), F.lit(1)
            )
        ),
    )
    a = staged.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_f").cast("long").alias("n1"),
        F.sum("_new").cast("long").alias("runs"),
    )
    n = F.col("n").cast("double")
    n1 = F.col("n1").cast("double")
    n0 = n - n1
    er = F.lit(2.0) * n1 * n0 / n + F.lit(1.0)
    var = (
        F.lit(2.0)
        * n1
        * n0
        * (F.lit(2.0) * n1 * n0 - n)
        / (n * n * (n - F.lit(1.0)))
    )
    return a.select(
        "n",
        "n1",
        "runs",
        F.round(
            F.when(
                (F.col("n1") > 0) & (F.col("n1") < F.col("n")) & (var > 0),
                (F.col("runs").cast("double") - er) / F.sqrt(var),
            ),
            round_to,
        ).alias("z"),
    )


def evalue_rr(
    df: DataFrame,
    treatment_col,
    outcome_col,
    round_to: int = 6,
) -> DataFrame:
    """E-value for unmeasured confounding (VanderWeele & Ding 2017):
    given the observed risk ratio between two cohorts, the MINIMUM
    strength of association an unmeasured confounder would need with
    BOTH treatment and outcome to explain the effect away —
    ``E = RR* + √(RR*·(RR*−1))`` with RR* = RR or 1/RR, whichever
    exceeds 1.  The one-number robustness caption every observational
    q_ipw_ate / q_did readout should carry.

    Returns ONE row: ``n, p1, p0, rr, evalue`` (NULL when either rate
    is 0 — RR undefined).

    Plan: ONE aggregate, closed form after.
    """
    t = (
        F.col(treatment_col)
        if isinstance(treatment_col, str)
        else treatment_col
    ).cast("int")
    y = (
        F.col(outcome_col) if isinstance(outcome_col, str) else outcome_col
    ).cast("int")
    a = df.select(t.alias("_t"), y.alias("_y")).filter(
        F.col("_t").isNotNull() & F.col("_y").isNotNull()
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_t").alias("_nt"),
        F.sum(F.lit(1) - F.col("_t")).alias("_nc"),
        F.sum(F.expr("_t * _y")).alias("_st"),
        F.sum(F.expr("(1 - _t) * _y")).alias("_sc"),
    )
    p1 = F.try_divide(F.col("_st").cast("double"), F.col("_nt").cast("double"))
    p0 = F.try_divide(F.col("_sc").cast("double"), F.col("_nc").cast("double"))
    rr = F.try_divide(p1, p0)
    rr_star = F.when(rr >= 1, rr).otherwise(F.try_divide(F.lit(1.0), rr))
    ev = rr_star + F.sqrt(rr_star * (rr_star - F.lit(1.0)))
    good = p1.isNotNull() & p0.isNotNull() & (p1 > 0) & (p0 > 0)
    return a.select(
        "n",
        F.round(p1, round_to).alias("p1"),
        F.round(p0, round_to).alias("p0"),
        F.round(F.when(good, rr), round_to).alias("rr"),
        F.round(F.when(good, ev), round_to).alias("evalue"),
    )


def james_stein_means(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """James-Stein / Efron-Morris shrinkage of per-group means (Efron &
    Morris 1975): every group mean moves toward the grand mean by the
    factor ``B = 1 − (k−3)·V̄ / Σ(x_g − x̄)²`` (clamped to [0, 1]), with
    V̄ the average sampling variance s_g²/n_g — the winner's-curse
    correction that dominates the raw per-group means in total error
    whenever k ≥ 4 (a small noisy source topping a dashboard is mostly
    noise; shrinkage says by how much).

    Returns one row per group: ``<group_col>, n, raw_mean,
    shrunk_mean`` (shrunk = raw when k < 4 or the spread is 0).

    Plan: ONE corpus aggregate to per-group moments, one k-row
    aggregate for the shrink factor, broadcast back onto the k-row
    frame.  Corpus read once.
    """
    v = F.col(value_col).cast("double")
    g = df.filter(v.isNotNull()).groupBy(
        F.col(group_col).alias(group_col)
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(v).alias("raw_mean"),
        F.var_samp(v).alias("_s2"),
    )
    # the grand mean cannot ride inside agg: stage it via a window
    staged = g.withColumn(
        "_grand", F.avg("raw_mean").over(Window.partitionBy())
    ).withColumn("_k", F.count(F.lit(1)).over(Window.partitionBy()))
    ss = g.withColumn(
        "_grand", F.avg("raw_mean").over(Window.partitionBy())
    ).agg(
        F.sum(
            (F.col("raw_mean") - F.col("_grand"))
            * (F.col("raw_mean") - F.col("_grand"))
        ).alias("_ss"),
        F.avg(
            F.try_divide(F.col("_s2"), F.col("n").cast("double"))
        ).alias("_vbar"),
    )
    out = staged.crossJoin(F.broadcast(ss))
    b = F.greatest(
        F.lit(0.0),
        F.least(
            F.lit(1.0),
            F.lit(1.0)
            - (F.col("_k") - F.lit(3)).cast("double")
            * F.col("_vbar")
            / F.col("_ss"),
        ),
    )
    shrunk = F.col("_grand") + b * (F.col("raw_mean") - F.col("_grand"))
    return out.select(
        group_col,
        F.col("n").cast("long").alias("n"),
        F.round("raw_mean", round_to).alias("raw_mean"),
        F.round(
            F.when(
                (F.col("_k") >= 4) & (F.col("_ss") > 0), shrunk
            ).otherwise(F.col("raw_mean")),
            round_to,
        ).alias("shrunk_mean"),
    )


def mmd_rff(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    n_features: int = 16,
    bandwidth: float = 1.0,
    seed: int = 11,
    round_to: int = 6,
) -> DataFrame:
    """Maximum mean discrepancy between two groups' value distributions
    via random Fourier features (Gretton et al. 2012; Rahimi & Recht
    2007): ``MMD² = ||Ê_A φ(x) − Ê_B φ(x)||²`` with
    ``φ_j(x) = √(2/D)·cos(w_j·x/σ + b_j)`` — the kernel two-sample test
    that sees SHAPE differences (multi-modality, variance, tails) a
    KS/location test can miss, in O(n·D) instead of the kernel matrix's
    O(n²).  Frequencies are deterministic (seeded Box-Muller on fixed
    literals), so both engines evaluate the identical feature map.

    ``bandwidth`` is the Gaussian kernel σ in VALUE units — pick it
    near the scale of interesting structure (the median heuristic run
    once offline; it must be a constant for portability).

    Returns ONE row: ``n_a, n_b, mmd2`` (NULL when a group is empty).

    Plan: ONE corpus aggregate with 2·D conditional means (map-side
    combined) — no pairwise anything, nothing leaves the aggregate but
    a 1-row frame.
    """
    import math
    import random as _random

    rng = _random.Random(seed)
    ws, bs = [], []
    for _ in range(int(n_features)):
        # Box-Muller on the seeded stream: deterministic doubles
        u1, u2 = rng.random(), rng.random()
        ws.append(
            math.sqrt(-2.0 * math.log(max(u1, 1e-12)))
            * math.cos(2.0 * math.pi * u2)
        )
        bs.append(rng.random() * 2.0 * math.pi)
    x = F.col(value_col).cast("double")
    g = F.col(group_col)
    d = df.filter(x.isNotNull() & g.isin([group_a, group_b])).select(
        (g == group_a).cast("int").alias("_a"), x.alias("_x")
    )
    scale = math.sqrt(2.0 / n_features)
    aggs = [
        F.sum("_a").cast("long").alias("n_a"),
        F.sum(F.lit(1) - F.col("_a")).cast("long").alias("n_b"),
    ]
    for j in range(int(n_features)):
        feat = F.lit(scale) * F.cos(
            F.lit(ws[j] / float(bandwidth)) * F.col("_x") + F.lit(bs[j])
        )
        aggs.append(
            F.avg(F.when(F.col("_a") == 1, feat)).alias(f"_fa{j}")
        )
        aggs.append(
            F.avg(F.when(F.col("_a") == 0, feat)).alias(f"_fb{j}")
        )
    a = d.agg(*aggs)
    mmd2 = sum(
        (F.col(f"_fa{j}") - F.col(f"_fb{j}"))
        * (F.col(f"_fa{j}") - F.col(f"_fb{j}"))
        for j in range(int(n_features))
    )
    return a.select(
        "n_a",
        "n_b",
        F.round(
            F.when((F.col("n_a") > 0) & (F.col("n_b") > 0), mmd2),
            round_to,
        ).alias("mmd2"),
    )


def mmd_rff_params(
    n_features: int = 16, bandwidth: float = 1.0, seed: int = 11
) -> list:
    """The (w/σ, b) literal pairs :func:`mmd_rff` uses — exposed so an
    external oracle can inline the identical feature map."""
    import math
    import random as _random

    rng = _random.Random(seed)
    out = []
    for _ in range(int(n_features)):
        u1, u2 = rng.random(), rng.random()
        w = math.sqrt(-2.0 * math.log(max(u1, 1e-12))) * math.cos(
            2.0 * math.pi * u2
        )
        out.append((w / float(bandwidth), rng.random() * 2.0 * math.pi))
    return out


def pocock_sequential(
    df: DataFrame,
    look_col: str,
    treat_col,
    success_col,
    boundary: float = 2.413,
    round_to: int = 6,
) -> DataFrame:
    """Group-sequential monitoring with the Pocock boundary (Pocock
    1977; 2.413 = the K=5, α=0.05 two-sided constant): at each
    interim look the CUMULATIVE two-proportion z between treatment and
    control is compared against the flat boundary — the "peek K times
    without inflating α" discipline every always-on dashboard silently
    violates.

    Input rows carry a look index (1..K), a 0/1 treatment flag and a
    0/1 success flag; looks accumulate.  Returns one row per look:
    ``look, n_t, n_c, p_t, p_c, z, crossed`` (crossed = |z| exceeds
    the boundary AT OR BEFORE this look).

    Plan: ONE corpus aggregate to per-(look, arm) counts, cumulative
    windows over the K-row frame, closed-form z per look.
    """
    t = (
        F.col(treat_col) if isinstance(treat_col, str) else treat_col
    ).cast("int")
    y = (
        F.col(success_col) if isinstance(success_col, str) else success_col
    ).cast("int")
    per_look = df.select(
        F.col(look_col).alias("look"), t.alias("_t"), y.alias("_y")
    ).groupBy("look").agg(
        F.sum("_t").alias("nt"),
        F.sum(F.lit(1) - F.col("_t")).alias("nc"),
        F.sum(F.expr("_t * _y")).alias("st"),
        F.sum(F.expr("(1 - _t) * _y")).alias("sc"),
    )
    w = Window.orderBy("look").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_look.select(
        "look",
        F.sum("nt").over(w).alias("cnt"),
        F.sum("nc").over(w).alias("cnc"),
        F.sum("st").over(w).alias("cst"),
        F.sum("sc").over(w).alias("csc"),
    )
    pt = F.try_divide(F.col("cst").cast("double"), F.col("cnt").cast("double"))
    pc = F.try_divide(F.col("csc").cast("double"), F.col("cnc").cast("double"))
    pp = F.try_divide(
        (F.col("cst") + F.col("csc")).cast("double"),
        (F.col("cnt") + F.col("cnc")).cast("double"),
    )
    se = F.sqrt(
        pp
        * (F.lit(1.0) - pp)
        * (
            F.try_divide(F.lit(1.0), F.col("cnt").cast("double"))
            + F.try_divide(F.lit(1.0), F.col("cnc").cast("double"))
        )
    )
    z = F.when(se > 0, (pt - pc) / se)
    staged = cum.select(
        "look",
        F.col("cnt").cast("long").alias("n_t"),
        F.col("cnc").cast("long").alias("n_c"),
        F.round(pt, round_to).alias("p_t"),
        F.round(pc, round_to).alias("p_c"),
        F.round(z, round_to).alias("z"),
    )
    w2 = Window.orderBy("look").rowsBetween(Window.unboundedPreceding, 0)
    return staged.withColumn(
        "crossed",
        F.max(
            (F.abs(F.col("z")) > F.lit(float(boundary))).cast("int")
        ).over(w2)
        == 1,
    )


def xi_correlation(
    df: DataFrame,
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Chatterjee's ξ rank correlation (Chatterjee 2020): sort by x and
    measure how wildly the y-ranks jump — ``ξ = 1 − 3·Σ|r_{i+1} −
    r_i|/(n² − 1)`` — the coefficient that detects ARBITRARY functional
    dependence (a parabola scores ≈ 1 where Pearson and Spearman both
    read 0) and is exactly 0-ish under independence.  The modern
    dependence screen next to q_spearman / q_mutual_info.

    Ties in x break by y then by row order of the rank window (the
    paper's random tie-break made deterministic); y-ranks use the
    max-rank convention the statistic is defined with.

    Returns ONE row: ``n, xi`` (NULL when n < 2).

    Plan: two rank windows over the (already bounded or corpus-
    collapsed) input + one lag window + ONE aggregate.  Callers pass
    an aggregated frame when the raw table is corpus-sized (the
    AD/KS audit-sample discipline).
    """
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    d = df.select(x.alias("_x"), y.alias("_y")).filter(
        x.isNotNull() & y.isNotNull()
    )
    # r_i = #{j: y_j <= y_i} — the max-rank convention: rank ordered by
    # y ascending plus (ties in y - 1)
    w_y = Window.orderBy("_y")
    w_ytie = Window.partitionBy("_y")
    ranked = d.withColumn(
        "_r",
        (F.rank().over(w_y) + F.count(F.lit(1)).over(w_ytie) - F.lit(1))
        .cast("double"),
    )
    w_x = Window.orderBy("_x", "_y", "_r")
    seq = ranked.withColumn("_i", F.row_number().over(w_x))
    w_lag = Window.orderBy("_i")
    staged = seq.withColumn(
        "_d", F.abs(F.col("_r") - F.lag("_r").over(w_lag))
    )
    a = staged.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_d").alias("_s"),
    )
    n = F.col("n").cast("double")
    xi = F.lit(1.0) - F.lit(3.0) * F.col("_s") / (n * n - F.lit(1.0))
    return a.select(
        "n",
        F.round(F.when(F.col("n") > 1, xi), round_to).alias("xi"),
    )


def quantile_treatment_effects(
    df: DataFrame,
    treat_col,
    value_col: str,
    quantiles: tuple = (0.1, 0.25, 0.5, 0.75, 0.9),
    round_to: int = 6,
) -> DataFrame:
    """Quantile treatment effects: the treated-minus-control difference
    at each marginal quantile (Doksum 1974's QTE under rank
    invariance) — where in the DISTRIBUTION the effect lives (a mean
    lift hiding "only the p90 moved" misleads every capacity and
    fairness readout the mean-only q_ipw_ate / q_did family produces).

    Exact linear-interpolated quantiles per arm.  Returns one row per
    quantile: ``q, treated, control, qte``.

    Plan: ONE two-arm aggregate computing all 2·|quantiles| exact
    percentiles in a single pass (sort-based within the aggregate),
    then literal unpivot of the 1-row frame.
    """
    t = (
        F.col(treat_col) if isinstance(treat_col, str) else treat_col
    ).cast("int")
    v = F.col(value_col).cast("double")
    d = df.select(t.alias("_t"), v.alias("_v")).filter(
        F.col("_t").isNotNull() & F.col("_v").isNotNull()
    )
    qs = [float(q) for q in quantiles]
    aggs = []
    for i, q in enumerate(qs):
        aggs.append(
            F.percentile(
                F.when(F.col("_t") == 1, F.col("_v")), F.lit(q)
            ).alias(f"_qt{i}")
        )
        aggs.append(
            F.percentile(
                F.when(F.col("_t") == 0, F.col("_v")), F.lit(q)
            ).alias(f"_qc{i}")
        )
    a = d.agg(*aggs)
    rows = None
    for i, q in enumerate(qs):
        r = a.select(
            F.lit(q).alias("q"),
            F.round(F.col(f"_qt{i}"), round_to).alias("treated"),
            F.round(F.col(f"_qc{i}"), round_to).alias("control"),
            F.round(
                F.col(f"_qt{i}") - F.col(f"_qc{i}"), round_to
            ).alias("qte"),
        )
        rows = r if rows is None else rows.unionByName(r)
    return rows


def chi2_residuals(
    df: DataFrame,
    row_col: str,
    col_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Standardized (adjusted) Pearson residuals of the row×col
    contingency table (Haberman 1973): ``r = (o − e)/√(e·(1−p_r)·
    (1−p_c))`` — the per-cell diagnostic that says WHICH cells drive a
    significant chi-square (q_chi2 reports that dependence exists;
    this says where), |r| ≳ 2 flagging a cell.  Only OBSERVED cells
    are emitted (an absent combination has o = 0 and a residual of
    ``−√(e·…)``-form — consumers needing the full grid re-join the
    margins, which stay metadata-sized).

    Columns: ``<row_col>, <col_col>, observed, expected, residual,
    flagged``.

    Plan: one (row, col) count aggregate; margins ride two windows
    over that R×C-bounded frame — no margin joins, no corpus re-scan.
    """
    cell = df.groupBy(
        F.col(row_col).alias("r"), F.col(col_col).alias("c")
    ).agg(F.count(F.lit(1)).cast("long").alias("observed"))
    wr = Window.partitionBy("r")
    wc = Window.partitionBy("c")
    wall = Window.partitionBy()
    staged = (
        cell.withColumn("_nr", F.sum("observed").over(wr))
        .withColumn("_nc", F.sum("observed").over(wc))
        .withColumn("_n", F.sum("observed").over(wall))
    )
    n = F.col("_n").cast("double")
    e = F.col("_nr").cast("double") * F.col("_nc").cast("double") / n
    pr = F.col("_nr").cast("double") / n
    pc = F.col("_nc").cast("double") / n
    denom = F.sqrt(e * (F.lit(1.0) - pr) * (F.lit(1.0) - pc))
    res = F.when(
        denom > 0, (F.col("observed").cast("double") - e) / denom
    )
    return staged.select(
        F.col("r").alias(row_col),
        F.col("c").alias(col_col),
        "observed",
        F.round(e, round_to).alias("expected"),
        F.round(res, round_to).alias("residual"),
        (F.abs(res) >= 2.0).alias("flagged"),
    )


def lorenz_deciles(
    df: DataFrame,
    value_col,
    id_col: str,
    n_tiles: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Lorenz-curve deciles: rank units by value ascending, cut into
    ``n_tiles`` equal-count tiles, report each tile's value share and
    the cumulative share — the chartable form behind q_gini/q_theil's
    single numbers ("the bottom half of documents carries 9% of the
    tokens" is a decile-table sentence, not a coefficient).

    NTILE over a TOTAL order (value, then ``id_col``) — integer-valued
    metrics tie constantly, and a tie straddling a tile boundary would
    otherwise split engine-dependently; the id tiebreak makes every
    tile's membership (hence its share) a pure function of the input.

    Columns: ``tile, n, tile_share, cum_share``.

    Plan: callers pass a per-unit frame (corpus collapses first); one
    NTILE window + one tile aggregate + one cumulative window over
    the n_tiles rows.
    """
    v = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "double"
    )
    d = df.select(v.alias("_v"), F.col(id_col).alias("_id")).filter(
        F.col("_v").isNotNull()
    )
    w = Window.orderBy("_v", "_id")
    tiled = d.withColumn("tile", F.ntile(int(n_tiles)).over(w))
    wall = Window.partitionBy()
    per_t = tiled.groupBy("tile").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_v").alias("_s"),
    )
    staged = per_t.withColumn("_tot", F.sum("_s").over(wall))
    wcum = Window.orderBy("tile").rowsBetween(Window.unboundedPreceding, 0)
    return staged.select(
        "tile",
        "n",
        F.round(F.col("_s") / F.col("_tot"), round_to).alias("tile_share"),
        F.round(
            F.sum(F.col("_s")).over(wcum) / F.col("_tot"), round_to
        ).alias("cum_share"),
    )


def cvm_two_sample(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    round_to: int = 6,
) -> DataFrame:
    """Cramér-von Mises two-sample test (Anderson 1962):
    ``T = (nm/N²)·Σ_pooled (F_n(x) − G_m(x))²`` — integrates the
    squared ECDF gap over EVERY pooled observation, so it sees
    distribution differences the KS max-gap statistic dilutes
    (several small separated gaps) without MMD's bandwidth knob.
    T ≳ 0.46 rejects equality at 5% (asymptotic).

    Returns ONE row: ``n_a, n_b, t_stat`` (NULL when a group is
    empty).

    Plan: the corpus collapses to per-DISTINCT-VALUE per-group counts
    (map-side combine, the mann_whitney discipline); ECDFs ride one
    cumulative window over the value-cardinality frame; ONE aggregate.
    """
    g = F.col(group_col)
    x = F.col(value_col).cast("double")
    d = df.filter(x.isNotNull() & g.isin([group_a, group_b])).select(
        (g == group_a).cast("int").alias("_a"), x.alias("_v")
    )
    vc = d.groupBy("_v").agg(
        F.sum("_a").alias("_ca"),
        F.sum(F.lit(1) - F.col("_a")).alias("_cb"),
    )
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    staged = (
        vc.withColumn("_fa", F.sum("_ca").over(w))
        .withColumn("_fb", F.sum("_cb").over(w))
        .withColumn("_na", F.sum("_ca").over(wall))
        .withColumn("_nb", F.sum("_cb").over(wall))
    )
    na = F.col("_na").cast("double")
    nb = F.col("_nb").cast("double")
    gap = F.col("_fa").cast("double") / na - F.col("_fb").cast(
        "double"
    ) / nb
    weight = (F.col("_ca") + F.col("_cb")).cast("double")
    a = staged.agg(
        F.max("_na").cast("long").alias("n_a"),
        F.max("_nb").cast("long").alias("n_b"),
        F.sum(weight * gap * gap).alias("_s"),
    )
    nn = (F.col("n_a") + F.col("n_b")).cast("double")
    t = (
        F.col("n_a").cast("double")
        * F.col("n_b").cast("double")
        / (nn * nn)
        * F.col("_s")
    )
    return a.select(
        "n_a",
        "n_b",
        F.round(
            F.when((F.col("n_a") > 0) & (F.col("n_b") > 0), t), round_to
        ).alias("t_stat"),
    )


def rayleigh_test(
    df: DataFrame,
    angle_col,
    round_to: int = 6,
) -> DataFrame:
    """Rayleigh test of circular uniformity (Rayleigh 1880; Mardia &
    Jupp 2000): is a distribution of ANGLES (time-of-day as a point on
    the clock circle) uniform, or is there a preferred direction?
    ``z = n·R̄²`` with R̄ the mean resultant length — the correct test
    for "is activity spread around the clock?", where a linear test on
    the hour number breaks at the midnight wrap.

    ``angle_col``: radians in [0, 2π).  Returns ONE row: ``n, r_bar,
    z, mean_hour`` (mean direction mapped to [0, 24) hours; NULL when
    R̄ = 0 exactly).

    Plan: ONE aggregate (cos/sin sums, map-side combined).
    """
    import math

    th = (F.col(angle_col) if isinstance(angle_col, str) else angle_col).cast(
        "double"
    )
    d = df.select(th.alias("_t")).filter(F.col("_t").isNotNull())
    a = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.cos("_t")).alias("_c"),
        F.sum(F.sin("_t")).alias("_s"),
    )
    n = F.col("n").cast("double")
    rbar = F.sqrt(F.col("_c") * F.col("_c") + F.col("_s") * F.col("_s")) / n
    z = n * rbar * rbar
    mean_dir = F.atan2(F.col("_s"), F.col("_c"))
    mean_hour = F.pmod(
        mean_dir * F.lit(24.0 / (2.0 * math.pi)), F.lit(24.0)
    )
    return a.select(
        "n",
        F.round(rbar, round_to).alias("r_bar"),
        F.round(z, round_to).alias("z"),
        F.round(
            F.when(rbar > 0, mean_hour), round_to
        ).alias("mean_hour"),
    )


def watson_u2_two_sample(
    df: DataFrame,
    group_col: str,
    angle_col,
    group_a,
    group_b,
    round_to: int = 6,
) -> DataFrame:
    """Watson's U² two-sample test for CIRCULAR data (Watson 1962):
    the rotation-invariant Cramér-von Mises — subtracting the weighted
    mean ECDF gap makes the statistic independent of where the circle
    is cut, so midnight is not a special point:
    ``U² = (nm/N²)·[Σ t_v·d_v² − (Σ t_v·d_v)²/N]`` with d_v the
    pooled-ECDF gaps.  U² ≳ 0.187 rejects at 5%.  The right "do two
    cohorts keep the same daily rhythm?" test; the linear q_cvm would
    flag a pure phase rotation that this correctly discounts.

    Returns ONE row: ``n_a, n_b, u2``.

    Plan: identical frame discipline to cvm_two_sample — per-distinct-
    angle counts, one cumulative window, ONE aggregate.
    """
    g = F.col(group_col)
    th = (F.col(angle_col) if isinstance(angle_col, str) else angle_col).cast(
        "double"
    )
    d = df.filter(th.isNotNull() & g.isin([group_a, group_b])).select(
        (g == group_a).cast("int").alias("_a"), th.alias("_v")
    )
    vc = d.groupBy("_v").agg(
        F.sum("_a").alias("_ca"),
        F.sum(F.lit(1) - F.col("_a")).alias("_cb"),
    )
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    staged = (
        vc.withColumn("_fa", F.sum("_ca").over(w))
        .withColumn("_fb", F.sum("_cb").over(w))
        .withColumn("_na", F.sum("_ca").over(wall))
        .withColumn("_nb", F.sum("_cb").over(wall))
    )
    na = F.col("_na").cast("double")
    nb = F.col("_nb").cast("double")
    gap = F.col("_fa").cast("double") / na - F.col("_fb").cast(
        "double"
    ) / nb
    t = (F.col("_ca") + F.col("_cb")).cast("double")
    a = staged.agg(
        F.max("_na").cast("long").alias("n_a"),
        F.max("_nb").cast("long").alias("n_b"),
        F.sum(t * gap * gap).alias("_s2"),
        F.sum(t * gap).alias("_s1"),
    )
    nn = (F.col("n_a") + F.col("n_b")).cast("double")
    u2 = (
        F.col("n_a").cast("double")
        * F.col("n_b").cast("double")
        / (nn * nn)
        * (F.col("_s2") - F.col("_s1") * F.col("_s1") / nn)
    )
    return a.select(
        "n_a",
        "n_b",
        F.round(
            F.when((F.col("n_a") > 0) & (F.col("n_b") > 0), u2), round_to
        ).alias("u2"),
    )
