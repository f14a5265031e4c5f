"""Hand-computed cases for the hypothesis-testing operators
(operators/stats.py): two-proportion z-test, Mann-Whitney U, column
profile."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Row

from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
    mann_whitney_u,
    profile_columns,
    prop_ztest_pairs,
)


def test_prop_ztest_hand_computed(spark):
    # group a: 8/10 success, group b: 2/10
    rows = [Row(g="a", ok=i < 8) for i in range(10)] + [
        Row(g="b", ok=i < 2) for i in range(10)
    ]
    df = spark.createDataFrame(rows)
    (r,) = prop_ztest_pairs(df, "g", F.col("ok")).collect()
    p1, p2, pp = 0.8, 0.2, 0.5
    z = (p1 - p2) / math.sqrt(pp * 0.5 * (0.1 + 0.1))
    assert (r.group_a, r.group_b, r.n_a, r.n_b) == ("a", "b", 10, 10)
    assert (r.rate_a, r.rate_b) == (0.8, 0.2)
    assert r.z == round(z, 6)


def test_prop_ztest_degenerate_variance(spark):
    df = spark.createDataFrame(
        [Row(g="a", ok=True)] * 5 + [Row(g="b", ok=True)] * 5
    )
    (r,) = prop_ztest_pairs(df, "g", F.col("ok")).collect()
    assert r.z is None  # pooled p = 1 -> zero variance


def test_mann_whitney_no_ties(spark):
    # a = {1,2,3}, b = {4,5}: all of b above all of a -> U_a = 0
    df = spark.createDataFrame(
        [Row(g="a", v=float(x)) for x in (1, 2, 3)]
        + [Row(g="b", v=float(x)) for x in (4, 5)]
    )
    (r,) = mann_whitney_u(df, "g", "v", "a", "b").collect()
    assert (r.n_a, r.n_b) == (3, 2)
    assert (r.u_a, r.u_b) == (0.0, 6.0)
    # sigma2 = 3*2/12 * (6 - 0) = 3, z = (0 - 3)/sqrt(3)
    assert r.z == round(-3.0 / math.sqrt(3.0), 6)


def test_mann_whitney_ties_average_ranks(spark):
    # a = {1, 2}, b = {2, 3}: the two 2s share rank (2+3)/2 = 2.5
    df = spark.createDataFrame(
        [Row(g="a", v=1.0), Row(g="a", v=2.0), Row(g="b", v=2.0), Row(g="b", v=3.0)]
    )
    (r,) = mann_whitney_u(df, "g", "v", "a", "b").collect()
    # R_a = 1 + 2.5 = 3.5 -> U_a = 3.5 - 3 = 0.5; U_b = 4 - 0.5 = 3.5
    assert (r.u_a, r.u_b) == (0.5, 3.5)
    # tie census: one tie of size 2 -> tsum = 6
    # sigma2 = 4/12 * (5 - 6/12) = 1.5; z = (0.5 - 2)/sqrt(1.5)
    assert r.z == round(-1.5 / math.sqrt(1.5), 6)


def test_mann_whitney_all_tied_z_null(spark):
    df = spark.createDataFrame(
        [Row(g="a", v=7.0), Row(g="a", v=7.0), Row(g="b", v=7.0)]
    )
    (r,) = mann_whitney_u(df, "g", "v", "a", "b").collect()
    assert r.z is None


def test_profile_columns(spark):
    df = spark.createDataFrame(
        [Row(a=1, b="x"), Row(a=1, b=None), Row(a=3, b="y")]
    )
    got = {r.column: r for r in profile_columns(df, exact_distinct=True).collect()}
    assert (got["a"].n, got["a"].n_null, got["a"].n_distinct) == (3, 0, 2)
    assert (got["a"].min_str, got["a"].max_str) == ("1", "3")
    assert (got["b"].n_null, got["b"].n_distinct) == (1, 2)
    # approx path returns the same counts at this tiny cardinality
    got2 = {r.column: r for r in profile_columns(df).collect()}
    assert got2["a"].n_distinct == 2


def test_ks_hand_computed(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import ks_test

    # A={1,2,3}, B={2,3,4}: CDF gaps 1/3,1/3,1/3,0 -> D = 1/3
    df = spark.createDataFrame(
        [Row(g="a", v=v) for v in [1, 2, 3]]
        + [Row(g="b", v=v) for v in [2, 3, 4]]
    )
    (r,) = ks_test(df, "g", "v", "a", "b").collect()
    assert (r.n_a, r.n_b) == (3, 3)
    assert r.d == round(1 / 3, 6)
    assert r.ks_z == round(math.sqrt(9 / 6) * (3 / 9), 6)


def test_ks_identical_groups_zero(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import ks_test

    df = spark.createDataFrame(
        [Row(g=g, v=v) for g in ("a", "b") for v in [5, 6, 7, 7]]
    )
    (r,) = ks_test(df, "g", "v", "a", "b").collect()
    assert r.d == 0.0 and r.ks_z == 0.0


def test_ks_with_ties_across_groups(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import ks_test

    # A=[1,1,5], B=[1,5,5]: at v=1 gap=|2*3-1*3|/9=1/3, at v=5 gap 0
    df = spark.createDataFrame(
        [Row(g="a", v=v) for v in [1, 1, 5]]
        + [Row(g="b", v=v) for v in [1, 5, 5]]
    )
    (r,) = ks_test(df, "g", "v", "a", "b").collect()
    assert r.d == round(1 / 3, 6)


def test_chi2_hand_computed_2x2(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        chi2_independence,
    )

    # [[10,20],[20,10]]: every e=15, chi2 = 4*25/15 = 6.666667,
    # dof=1, V = sqrt(chi2/(60*1)) = 1/3
    rows = (
        [Row(a="x", b="p")] * 10
        + [Row(a="x", b="q")] * 20
        + [Row(a="y", b="p")] * 20
        + [Row(a="y", b="q")] * 10
    )
    (r,) = chi2_independence(spark.createDataFrame(rows), "a", "b").collect()
    assert (r.n, r.n_rows, r.n_cols, r.dof) == (60, 2, 2, 1)
    assert r.chi2 == round(100 / 15, 6)
    assert r.cramers_v == round(math.sqrt((100 / 15) / 60), 6)


def test_chi2_zero_cell_reconstructed(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        chi2_independence,
    )

    # (y,q) never observed: o=0 but e=(5*5)/15 != 0 must still contribute
    rows = (
        [Row(a="x", b="p")] * 5
        + [Row(a="x", b="q")] * 5
        + [Row(a="y", b="p")] * 5
    )
    (r,) = chi2_independence(spark.createDataFrame(rows), "a", "b").collect()
    # margins: rx=10, ry=5; cp=10, cq=5; n=15
    # e: xp=100/15, xq=50/15, yp=50/15, yq=25/15
    e = [100 / 15, 50 / 15, 50 / 15, 25 / 15]
    o = [5, 5, 5, 0]
    chi2 = sum((oi - ei) ** 2 / ei for oi, ei in zip(o, e))
    assert r.chi2 == round(chi2, 6)
    assert r.dof == 1


def test_welch_hand_computed(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        welch_ttest_pairs,
    )

    # a=[1,2,3] (m=2, v=1), b=[2,4,6] (m=4, v=4):
    # se2=5/3, t=-2/sqrt(5/3), dof=(5/3)^2/((1/3)^2/2+(4/3)^2/2)=50/17
    df = spark.createDataFrame(
        [Row(g="a", v=v) for v in [1, 2, 3]]
        + [Row(g="b", v=v) for v in [2, 4, 6]]
    )
    (r,) = welch_ttest_pairs(df, "g", "v").collect()
    assert (r.group_a, r.group_b, r.n_a, r.n_b) == ("a", "b", 3, 3)
    assert (r.mean_a, r.mean_b) == (2.0, 4.0)
    assert r.t == round(-2 / math.sqrt(5 / 3), 6)
    assert r.dof == round((5 / 3) ** 2 / ((1 / 9) / 2 + (16 / 9) / 2), 6)


def test_welch_zero_variance_null(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        welch_ttest_pairs,
    )

    df = spark.createDataFrame(
        [Row(g="a", v=5), Row(g="a", v=5), Row(g="b", v=9), Row(g="b", v=9)]
    )
    (r,) = welch_ttest_pairs(df, "g", "v").collect()
    assert r.t is None and r.dof is None


# ---------------------------------------------------------------- r4 batch 2


def test_ols_hand_computed(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        ols_fit_groups,
    )

    rows = [Row(g="a", x=1, y=2), Row(g="a", x=2, y=4), Row(g="a", x=3, y=6),
            Row(g="b", x=1, y=1), Row(g="b", x=2, y=3), Row(g="b", x=3, y=2)]
    out = {
        r.group: r
        for r in ols_fit_groups(
            spark.createDataFrame(rows), "g", "x", "y"
        ).collect()
    }
    a, b = out["a"], out["b"]
    assert (a.n, a.slope, a.intercept, a.r2) == (3, 2.0, 0.0, 1.0)
    # b: cov=3, vx=6, vy=6 -> slope .5, intercept 1, r2 9/36
    assert (b.slope, b.intercept, b.r2) == (0.5, 1.0, 0.25)


def test_ols_degenerate_constant_x(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        ols_fit_groups,
    )

    df = spark.createDataFrame(
        [Row(g="a", x=5, y=1), Row(g="a", x=5, y=9)]
    )
    (r,) = ols_fit_groups(df, "g", "x", "y").collect()
    assert r.slope is None and r.intercept is None and r.r2 is None


def test_anova_hand_computed(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        anova_oneway,
    )

    rows = [Row(g="a", v=v) for v in (1, 2, 3)] + [
        Row(g="b", v=v) for v in (4, 5, 6)
    ]
    (r,) = anova_oneway(spark.createDataFrame(rows), "g", "v").collect()
    # SSB=13.5, SSW=4, SST=17.5 -> F=13.5, eta2=13.5/17.5
    assert (r.k, r.n) == (2, 6)
    assert r.f == 13.5
    assert r.eta2 == round(13.5 / 17.5, 6)


def test_anova_degenerate_zero_within_variance(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        anova_oneway,
    )

    rows = [Row(g="a", v=2), Row(g="a", v=2), Row(g="b", v=7),
            Row(g="b", v=7)]
    (r,) = anova_oneway(spark.createDataFrame(rows), "g", "v").collect()
    assert r.f is None  # SSW = 0
    assert r.eta2 == 1.0


def test_spearman_hand_computed(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        spearman_corr_groups,
    )

    rows = [Row(g="g", x=1, y=3), Row(g="g", x=2, y=1), Row(g="g", x=3, y=2)]
    (r,) = spearman_corr_groups(
        spark.createDataFrame(rows), "g", "x", "y"
    ).collect()
    # classic formula: 1 - 6*6/(3*8) = -0.5
    assert (r.n, r.rho) == (3, -0.5)


def test_spearman_ties_average_rank(spark):
    import math

    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        spearman_corr_groups,
    )

    rows = [Row(g="g", x=1, y=1), Row(g="g", x=1, y=2), Row(g="g", x=2, y=3)]
    (r,) = spearman_corr_groups(
        spark.createDataFrame(rows), "g", "x", "y"
    ).collect()
    # rx=[1.5,1.5,3], ry=[1,2,3]: cov=4.5, vx=4.5, vy=6
    assert r.rho == round(4.5 / math.sqrt(27), 6)


def test_spearman_constant_column_null(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        spearman_corr_groups,
    )

    rows = [Row(g="g", x=1, y=5), Row(g="g", x=2, y=5)]
    (r,) = spearman_corr_groups(
        spark.createDataFrame(rows), "g", "x", "y"
    ).collect()
    assert r.rho is None


def test_transition_entropy_deterministic_vs_uniform(spark):
    """A strictly cyclic sequence has entropy 0; alternating between two
    equally likely successors approaches ln 2."""
    import datetime as dt
    import math

    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        transition_entropy,
    )

    t0 = dt.datetime(2026, 1, 1)
    cyc = [
        ("u", "abc"[i % 3], t0 + dt.timedelta(seconds=i), i) for i in range(30)
    ]
    df = spark.createDataFrame(cyc, ["k", "lbl", "ts", "i"])
    r = transition_entropy(df, "k", "lbl", "ts", "i").collect()[0]
    assert r.entropy_rate == 0.0 and r.n_states == 3
    assert r.max_entropy == round(math.log(3), 6)

    # a -> b or c with equal frequency; b,c -> a always
    seq = []
    for i in range(40):
        seq.append("a")
        seq.append("b" if i % 2 == 0 else "c")
    rows = [("u", s, t0 + dt.timedelta(seconds=i), i) for i, s in enumerate(seq)]
    df2 = spark.createDataFrame(rows, ["k", "lbl", "ts", "i"])
    r2 = transition_entropy(df2, "k", "lbl", "ts", "i").collect()[0]
    # half the transitions leave 'a' with entropy ln2, the rest are fixed
    assert abs(r2.entropy_rate - 0.5 * math.log(2)) < 0.02


def test_score_calibration_bins_and_gap(spark):
    """Perfectly calibrated synthetic scores give ~zero gaps; bin edges
    clamp score=1.0 into the top bin."""
    import pyspark.sql.functions as F

    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        score_calibration,
    )

    # 100 rows per decile, label true for exactly round(mean_score*100)
    rows = []
    for b in range(10):
        s = b / 10 + 0.05
        for i in range(100):
            rows.append((s, i < int(s * 100)))
    rows.append((1.0, True))  # edge: lands in bin 9, not a phantom bin 10
    df = spark.createDataFrame(rows, ["score", "label"])
    out = {r.bin: r for r in score_calibration(df, "score", "label").collect()}
    assert set(out) == set(range(10))
    for b in range(9):
        assert abs(out[b].gap) < 1e-6, (b, out[b])
    assert out[9].n == 101


def test_survival_km_textbook(spark):
    """Classic KM hand case: durations (6,e)(6,e)(6,c)(7,e)(10,c)(13,e) —
    the textbook product-limit steps."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        survival_km,
    )

    rows = [(6.0, 1), (6.0, 1), (6.0, 0), (7.0, 1), (10.0, 0), (13.0, 1)]
    df = spark.createDataFrame(rows, ["dur", "ev"])
    got = {r.t: r for r in survival_km(df, "dur", "ev").collect()}
    assert set(got) == {6.0, 7.0, 13.0}
    assert (got[6.0].n_risk, got[6.0].d) == (6, 2)
    assert got[6.0].surv == round(4 / 6, 6)
    assert (got[7.0].n_risk, got[7.0].d) == (3, 1)
    assert got[7.0].surv == round(4 / 6 * 2 / 3, 6)
    # last subject fails: survival hits exactly zero
    assert (got[13.0].n_risk, got[13.0].d) == (1, 1)
    assert got[13.0].surv == 0.0


def test_survival_km_all_censored_and_monotone(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        survival_km,
    )

    all_c = spark.createDataFrame([(5.0, 0), (9.0, 0)], ["dur", "ev"])
    assert survival_km(all_c, "dur", "ev").count() == 0  # no event times

    import random

    random.seed(3)
    rows = [(float(random.randint(1, 20)), random.randint(0, 1)) for _ in range(200)]
    out = sorted(
        survival_km(spark.createDataFrame(rows, ["dur", "ev"]), "dur", "ev").collect(),
        key=lambda r: r.t,
    )
    survs = [r.surv for r in out]
    assert all(a >= b for a, b in zip(survs, survs[1:]))  # non-increasing
    assert all(0.0 <= s <= 1.0 for s in survs)


def test_normal_sf_accuracy(spark):
    """A&S 7.1.26 vs scipy-free exact reference values (math.erfc)."""
    import math

    import pyspark.sql.functions as F

    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        normal_sf,
    )

    zs = [0.0, 0.5, 1.0, 1.645, 1.96, 2.575, 3.5]
    df = spark.createDataFrame([(z,) for z in zs], ["z"])
    got = {r.z: r.sf for r in df.select("z", normal_sf(F.col("z")).alias("sf")).collect()}
    for z in zs:
        want = 0.5 * math.erfc(z / math.sqrt(2))
        assert abs(got[z] - want) < 1e-7, (z, got[z], want)


def test_bh_fdr_textbook(spark):
    """Classic BH example: the largest rank with p <= (i/m)a gates ALL
    smaller ranks, including ones whose own p exceeds their crit."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        bh_fdr,
    )

    ps = [0.001, 0.008, 0.039, 0.041, 0.042, 0.06, 0.074, 0.205, 0.212, 0.216]
    df = spark.createDataFrame(
        [(f"h{i}", p) for i, p in enumerate(ps)], ["h", "p"]
    )
    got = {r.h: r for r in bh_fdr(df, "p", ["h"], alpha=0.05).collect()}
    # m=10, a=0.05: crit_i = 0.005i -> largest passing rank is 4
    # (p=0.041 <= 0.020 is false... check: 0.039 <= 0.015 F, 0.008 <= 0.010 T)
    rejected = {h for h, r in got.items() if r.reject}
    assert rejected == {"h0", "h1"}
    assert got["h0"].m == 10 and got["h0"].p_rank == 1


def test_wilson_interval_bounds(spark):
    """Wilson CI stays inside [0,1], covers the rate, and is non-degenerate
    at rate 0 and 1 (where Wald collapses)."""
    import pyspark.sql.functions as F

    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        wilson_interval,
    )

    rows = (
        [("a", 1)] * 30 + [("a", 0)] * 10
        + [("b", 1)] * 20                      # rate exactly 1
        + [("c", 0)] * 15                      # rate exactly 0
    )
    df = spark.createDataFrame(rows, ["g", "s"])
    got = {r.group: r for r in wilson_interval(df, "g", F.col("s") == 1).collect()}
    a = got["a"]
    assert a.lo < a.rate < a.hi and 0 < a.lo and a.hi < 1
    assert got["b"].rate == 1.0 and got["b"].lo < 1.0 and got["b"].hi <= 1.0
    assert got["c"].rate == 0.0 and got["c"].hi > 0.0 and got["c"].lo >= 0.0


def test_cuped_matches_numpy_and_reduces_variance(spark):
    """theta/xbar from pooled moments; adjusted variance equals numpy's
    and shrinks when x correlates with y; mean treatment diff is
    preserved up to the covariate imbalance term."""
    import numpy as np

    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        cuped_adjustment,
    )

    rng = np.random.RandomState(7)
    x = rng.poisson(10, 200).astype(float)
    y = 2 * x + rng.poisson(3, 200)
    arm = np.where(np.arange(200) % 2 == 0, "A", "B")
    rows = [(str(a), float(xi), float(yi)) for a, xi, yi in zip(arm, x, y)]
    df = spark.createDataFrame(rows, ["arm", "x", "y"])
    got = {r.group: r for r in cuped_adjustment(df, "arm", "x", "y").collect()}
    theta = ((x * y).sum() - x.sum() * y.sum() / 200) / (
        (x * x).sum() - x.sum() ** 2 / 200
    )
    ya = y - theta * (x - x.mean())
    for g in ("A", "B"):
        m = arm == g
        assert got[g].n == int(m.sum())
        assert got[g].mean_y_adj == round(float(ya[m].mean()), 6)
        assert got[g].var_y_adj == round(float(ya[m].var(ddof=1)), 6)
        assert got[g].var_reduction > 0.9  # strong covariate


def test_cuped_zero_variance_covariate_noop(spark):
    """Constant x: theta degenerates to 0 and adjusted = raw."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        cuped_adjustment,
    )

    df = spark.createDataFrame(
        [("A", 1.0, 2.0), ("A", 1.0, 4.0), ("B", 1.0, 6.0), ("B", 1.0, 8.0)],
        ["arm", "x", "y"],
    )
    got = {r.group: r for r in cuped_adjustment(df, "arm", "x", "y").collect()}
    assert got["A"].mean_y_adj == got["A"].mean_y == 3.0
    assert got["A"].var_y_adj == got["A"].var_y
    assert got["A"].var_reduction == 0.0


def test_categorical_association_hand(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        categorical_association,
    )

    # 2x2 perfectly-associated table: MI = ln 2, V = 1, chi2 = n
    rows = [("a", "x")] * 5 + [("b", "y")] * 5
    df = spark.createDataFrame(rows, "u string, v string")
    r = categorical_association(df, "u", "v").first()
    import math

    assert r.n == 10 and r.r_levels == 2 and r.c_levels == 2
    assert abs(r.mi - math.log(2)) < 1e-6
    assert abs(r.nmi - 1.0) < 1e-6
    assert abs(r.chi2 - 10.0) < 1e-6 and r.dof == 1
    assert abs(r.cramers_v - 1.0) < 1e-6

    # independent uniform 2x2: everything 0
    rows = [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")]
    r = categorical_association(
        spark.createDataFrame(rows, "u string, v string"), "u", "v"
    ).first()
    assert abs(r.mi) < 1e-9 and abs(r.chi2) < 1e-9 and abs(r.cramers_v) < 1e-9


def test_kendall_tau_hand(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        kendall_tau_groups,
    )

    # perfectly concordant
    df = spark.createDataFrame(
        [(1, 1.0, 10.0), (2, 2.0, 20.0), (3, 3.0, 30.0)], "k int, x double, y double"
    )
    r = kendall_tau_groups(df, "k", "x", "y").first()
    assert (r.n, r.concordant, r.discordant, r.tau_b) == (3, 3, 0, 1.0)

    # one tie in x: scipy.stats.kendalltau([1,1,2],[1,2,3]) = 0.816497
    df = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, 1.0, 2.0), (3, 2.0, 3.0)], "k int, x double, y double"
    )
    r = kendall_tau_groups(df, "k", "x", "y").first()
    assert r.ties_x == 1 and abs(r.tau_b - 0.816497) < 1e-6


def test_sprt_decision_hand(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        sprt_decision,
    )

    # all-success stream must accept H1, and at the earliest index where
    # k*ln(p1/p0) >= ln((1-b)/a): ln(2) per step, boundary 2.944 -> i=5
    rows = [("g", True, i) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "g string, s boolean, i int")
    r = sprt_decision(df, "g", "s", ["i"], p0=0.25, p1=0.5).first()
    assert r.decision == "accept_h1" and r.n_at_decision == 5

    # all-failure stream accepts H0
    rows = [("g", False, i) for i in range(1, 41)]
    df = spark.createDataFrame(rows, "g string, s boolean, i int")
    r = sprt_decision(df, "g", "s", ["i"], p0=0.25, p1=0.5).first()
    assert r.decision == "accept_h0" and r.n_at_decision is not None

    # tiny stream stays undecided
    df = spark.createDataFrame([("g", True, 1)], "g string, s boolean, i int")
    r = sprt_decision(df, "g", "s", ["i"], p0=0.25, p1=0.5).first()
    assert r.decision == "continue" and r.n_at_decision is None and r.n_total == 1


def test_poisson_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    from pyspark.sql import Row as _Row

    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        poisson_bootstrap_ci,
    )

    df = spark.createDataFrame(
        [_Row(id=i, v=float((i * 37) % 100)) for i in range(500)]
    )
    r1 = poisson_bootstrap_ci(df, "id", "v", b=40, seed="t").collect()[0]
    r2 = poisson_bootstrap_ci(df, "id", "v", b=40, seed="t").collect()[0]
    assert (r1.lo, r1.hi, r1.est) == (r2.lo, r2.hi, r2.est)  # pure function
    assert r1.n == 500 and r1.b == 40
    assert r1.lo <= r1.est <= r1.hi
    # interval should be reasonably tight around the mean for n=500
    assert (r1.hi - r1.lo) < 20.0
    # a different seed moves the replicate draw
    r3 = poisson_bootstrap_ci(df, "id", "v", b=40, seed="u").collect()[0]
    assert (r3.lo, r3.hi) != (r1.lo, r1.hi)


def test_weighted_quantiles_hand_case(spark):
    from pyspark.sql import Row as _Row

    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        weighted_quantiles,
    )

    # values 1..4 with weights 1,1,6,2 (total 10):
    # cum: 1->1, 2->2, 3->8, 4->10
    # q=.25 -> first cum>=2.5 -> 3; q=.5 -> 3; q=.9 -> 4
    df = spark.createDataFrame(
        [_Row(g="a", v=1.0, w=1), _Row(g="a", v=2.0, w=1),
         _Row(g="a", v=3.0, w=6), _Row(g="a", v=4.0, w=2)]
    )
    got = {
        r.q: r.wq
        for r in weighted_quantiles(df, "g", "v", "w", qs=(0.25, 0.5, 0.9)).collect()
    }
    assert got == {0.25: 3.0, 0.5: 3.0, 0.9: 4.0}


def test_weighted_quantiles_tie_safe(spark):
    from pyspark.sql import Row as _Row

    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        weighted_quantiles,
    )

    # duplicated values: any internal order of the ties yields the same
    # smallest qualifying value
    df = spark.createDataFrame(
        [_Row(g="a", v=5.0, w=1)] * 4 + [_Row(g="a", v=9.0, w=1)]
    )
    got = {r.q: r.wq for r in weighted_quantiles(df, "g", "v", "w", qs=(0.5, 1.0)).collect()}
    assert got == {0.5: 5.0, 1.0: 9.0}


def test_trimmed_mean_drops_extremes(spark):
    from pyspark.sql import Row as _Row

    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        trimmed_mean,
    )

    # 10 rows: outliers -1000 and 1000 trimmed at 10% -> mean of middle 8
    vals = [-1000.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 1000.0]
    df = spark.createDataFrame(
        [_Row(g="x", id=i, v=v) for i, v in enumerate(vals)]
    )
    r = trimmed_mean(df, "g", "id", "v", trim=0.1).collect()[0]
    assert r.n == 10 and r.n_used == 8
    assert r.tmean == 4.5


def test_trimmed_mean_zero_trim_is_plain_mean(spark):
    from pyspark.sql import Row as _Row

    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        trimmed_mean,
    )

    df = spark.createDataFrame([_Row(g="x", id=i, v=float(i)) for i in range(5)])
    r = trimmed_mean(df, "g", "id", "v", trim=0.0).collect()[0]
    assert r.n_used == 5 and r.tmean == 2.0


def test_cmh_homogeneous_strata_recovers_common_or(spark):
    from pyspark.sql import Row as _Row

    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        cmh_pooled_odds,
    )

    # both strata have the same 2x2 table: a=20 b=10 c=10 d=20 -> OR=4
    rows = []
    for st in ["A", "B"]:
        rows += [_Row(s=st, t=1, y=1)] * 20 + [_Row(s=st, t=1, y=0)] * 10
        rows += [_Row(s=st, t=0, y=1)] * 10 + [_Row(s=st, t=0, y=0)] * 20
    df = spark.createDataFrame(rows)
    r = cmh_pooled_odds(df, "s", F.col("t") == 1, F.col("y") == 1).collect()[0]
    assert r.n_strata == 2
    assert abs(r.or_mh - 4.0) < 1e-9
    assert r.chi2 > 3.84  # significant at 5%


def test_cmh_null_effect(spark):
    from pyspark.sql import Row as _Row

    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        cmh_pooled_odds,
    )

    rows = []
    for st in ["A", "B"]:
        for t in (0, 1):
            rows += [_Row(s=st, t=t, y=1)] * 15 + [_Row(s=st, t=t, y=0)] * 15
    r = cmh_pooled_odds(
        spark.createDataFrame(rows), "s", F.col("t") == 1, F.col("y") == 1
    ).collect()[0]
    assert abs(r.or_mh - 1.0) < 1e-9
    assert r.chi2 == 0.0


def test_mcnemar_hand_counts(spark):
    from pyspark.sql import Row as _Row

    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        mcnemar_test,
    )

    # both=3, neither=2, b=4, c=1 -> (4-1)^2/5 = 1.8
    rows = (
        [_Row(a=1, b=1)] * 3 + [_Row(a=0, b=0)] * 2
        + [_Row(a=1, b=0)] * 4 + [_Row(a=0, b=1)] * 1
    )
    r = mcnemar_test(spark.createDataFrame(rows), "a", "b").collect()[0]
    assert (r.n, r.both, r.neither, r.b, r.c) == (10, 3, 2, 4, 1)
    assert abs(r.mcnemar - 1.8) < 1e-9


def test_mcnemar_no_discordance_is_zero(spark):
    from pyspark.sql import Row as _Row

    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        mcnemar_test,
    )

    rows = [_Row(a=1, b=1)] * 5 + [_Row(a=0, b=0)] * 5
    r = mcnemar_test(spark.createDataFrame(rows), "a", "b").collect()[0]
    assert r.mcnemar == 0.0 and r.b == 0 and r.c == 0


def test_brier_decomposition_identity_and_perfect_forecast(spark):
    from pyspark.sql import Row as _Row

    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        brier_decomposition,
    )

    # perfect binary forecaster: s=1 exactly when y=1
    rows = [_Row(s=1.0, y=1)] * 30 + [_Row(s=0.0, y=0)] * 70
    r = brier_decomposition(spark.createDataFrame(rows), "s", "y").collect()[0]
    assert r.brier == 0.0 and r.reliability == 0.0
    assert abs(r.uncertainty - 0.21) < 1e-9   # 0.3 * 0.7
    assert abs(r.resolution - 0.21) < 1e-9    # perfect: res == unc
    # Murphy identity: brier = rel - res + unc
    assert abs(r.brier - (r.reliability - r.resolution + r.uncertainty)) < 1e-6


def test_brier_decomposition_constant_base_rate_forecast(spark):
    from pyspark.sql import Row as _Row

    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        brier_decomposition,
    )

    # constant forecast at the base rate: resolution 0, reliability 0,
    # brier == uncertainty
    rows = [_Row(s=0.4, y=1)] * 40 + [_Row(s=0.4, y=0)] * 60
    r = brier_decomposition(spark.createDataFrame(rows), "s", "y").collect()[0]
    assert r.resolution == 0.0 and r.reliability == 0.0
    assert abs(r.brier - 0.24) < 1e-9 and abs(r.uncertainty - 0.24) < 1e-9


def test_daily_streaks_hand_case(spark):
    import datetime as _dt

    from pyspark.sql import Row as _Row

    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        daily_streaks,
    )

    d0 = _dt.datetime(2024, 1, 1, 12, 0, 0)

    def at(day, h=0):
        return d0 + _dt.timedelta(days=day, hours=h)

    rows = (
        # user 1: days 0,1,2 then 5,6 -> max streak 3, 5 active days
        [_Row(u=1, ts=at(d)) for d in (0, 1, 2, 5, 6)]
        # duplicate events same day must not inflate the streak
        + [_Row(u=1, ts=at(1, h=3))]
        # user 2: days 0, 2, 4 -> max streak 1
        + [_Row(u=2, ts=at(d)) for d in (0, 2, 4)]
    )
    out = {r.user: r for r in daily_streaks(spark.createDataFrame(rows), "u", "ts").collect()}
    assert out[1].max_streak == 3 and out[1].n_active_days == 5
    assert out[2].max_streak == 1 and out[2].n_active_days == 3


def test_wilcoxon_matches_scipy_convention(spark):
    from pyspark.sql import Row as _Row

    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        wilcoxon_signed_rank,
    )

    # diffs: +1, +2, -3, +4, 0 (dropped) -> |d| ranks 1,2,3,4
    # w_plus = 1 + 2 + 4 = 7; n=4; E=5; Var=30/...
    rows = [
        _Row(id=1, a=2.0, b=1.0),
        _Row(id=2, a=5.0, b=3.0),
        _Row(id=3, a=1.0, b=4.0),
        _Row(id=4, a=9.0, b=5.0),
        _Row(id=5, a=7.0, b=7.0),
    ]
    r = wilcoxon_signed_rank(spark.createDataFrame(rows), "id", "a", "b").collect()[0]
    assert r.n_pairs == 4
    assert r.w_plus == 7.0
    import math as _m

    want_z = (7.0 - 4 * 5 / 4.0) / _m.sqrt(4 * 5 * 9 / 24.0)
    assert abs(r.z - want_z) < 1e-6


def test_wilcoxon_average_ranks_for_ties(spark):
    from pyspark.sql import Row as _Row

    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        wilcoxon_signed_rank,
    )

    # |d| = 1, 1, 2: tied pair gets average rank 1.5 each
    rows = [
        _Row(id=1, a=1.0, b=0.0),
        _Row(id=2, a=0.0, b=1.0),
        _Row(id=3, a=2.0, b=0.0),
    ]
    r = wilcoxon_signed_rank(spark.createDataFrame(rows), "id", "a", "b").collect()[0]
    # positives: |1| (rank 1.5) and |2| (rank 3) -> w_plus = 4.5
    assert r.w_plus == 4.5


def test_partial_corr_removes_common_driver(spark):
    import numpy as np
    from pyspark.sql import Row as _Row

    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        partial_corr,
    )

    rng = np.random.RandomState(9)
    z = rng.randn(500)
    x = z + 0.1 * rng.randn(500)
    y = z + 0.1 * rng.randn(500)   # x,y correlated only through z
    df = spark.createDataFrame(
        [_Row(x=float(a), y=float(b), z=float(c)) for a, b, c in zip(x, y, z)]
    )
    r = partial_corr(df, "x", "y", "z").collect()[0]
    assert r.r_xy > 0.9              # raw correlation is huge
    assert abs(r.r_xy_z) < 0.2       # vanishes once z is controlled
    # cross-check r_xy against numpy
    assert abs(r.r_xy - np.corrcoef(x, y)[0, 1]) < 1e-6


def test_vif3_flags_collinear_feature(spark):
    import numpy as np
    from pyspark.sql import Row as _Row

    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        vif3,
    )

    rng = np.random.RandomState(4)
    a = rng.randn(400)
    b = a + 0.05 * rng.randn(400)    # nearly duplicates a
    c = rng.randn(400)               # independent
    df = spark.createDataFrame(
        [_Row(a=float(x), b=float(y), c=float(z)) for x, y, z in zip(a, b, c)]
    )
    r = vif3(df, "a", "b", "c").collect()[0]
    assert r.vif1 > 10 and r.vif2 > 10   # the collinear pair blows up
    assert r.vif3 < 2                    # the independent one stays near 1


def test_diff_in_diff_hand_case(spark):
    from pyspark.sql import Row as _Row

    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        diff_in_diff,
    )

    # ctrl: 10 -> 12 (+2); treat: 20 -> 27 (+7) -> did = 5
    rows = (
        [_Row(t=0, p=0, y=10.0)] * 3 + [_Row(t=0, p=1, y=12.0)] * 2
        + [_Row(t=1, p=0, y=20.0)] * 4 + [_Row(t=1, p=1, y=27.0)] * 5
    )
    r = diff_in_diff(
        spark.createDataFrame(rows), F.col("t") == 1, F.col("p") == 1, "y"
    ).collect()[0]
    assert (r.n_ctrl_pre, r.n_ctrl_post, r.n_treat_pre, r.n_treat_post) == (
        3, 2, 4, 5,
    )
    assert (r.ctrl_pre, r.ctrl_post, r.treat_pre, r.treat_post) == (
        10.0, 12.0, 20.0, 27.0,
    )
    assert r.did == 5.0


def test_lift_deciles_perfect_ranker(spark):
    from pyspark.sql import Row as _Row

    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        lift_deciles,
    )

    # 100 rows, top-10 scores are exactly the 10 responders
    rows = [
        _Row(id=i, s=float(100 - i), r=1 if i < 10 else 0) for i in range(100)
    ]
    out = {r.decile: r for r in lift_deciles(
        spark.createDataFrame(rows), "id", "s", "r", n_bins=10
    ).collect()}
    assert out[1].n == 10 and out[1].responders == 10 and out[1].rate == 1.0
    # top decile captures all responders at a 10% base rate -> lift 10
    assert out[1].cum_lift == 10.0
    assert out[10].cum_lift == 1.0     # full population: lift 1 by def
    assert out[5].responders == 0


def test_required_sample_size_matches_closed_form(spark):
    import math as _m

    from pyspark.sql import Row as _Row

    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        required_sample_size,
    )

    # base rate exactly 0.2
    rows = [_Row(y=1)] * 20 + [_Row(y=0)] * 80
    r = required_sample_size(
        spark.createDataFrame(rows), F.col("y") == 1, mde_abs=0.05
    ).collect()[0]
    p1, p2 = 0.2, 0.25
    pbar = (p1 + p2) / 2
    want = _m.ceil(
        (
            1.959963985 * _m.sqrt(2 * pbar * (1 - pbar))
            + 0.8416212336 * _m.sqrt(p1 * (1 - p1) + p2 * (1 - p2))
        )
        ** 2
        / 0.05**2
    )
    assert r.n == 100 and r.p1 == 0.2 and r.p2 == 0.25
    assert r.n_per_arm == want
    # smaller effect -> much larger n
    r2 = required_sample_size(
        spark.createDataFrame(rows), F.col("y") == 1, mde_abs=0.01
    ).collect()[0]
    assert r2.n_per_arm > 20 * r.n_per_arm


def test_nelson_aalen_textbook(spark):
    """Same hand case as the KM test: cumulative hazard 1/3, 2/3, 5/3."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        nelson_aalen,
    )

    rows = [(6.0, 1), (6.0, 1), (6.0, 0), (7.0, 1), (10.0, 0), (13.0, 1)]
    df = spark.createDataFrame(rows, ["dur", "ev"])
    got = {r.t: r for r in nelson_aalen(df, "dur", "ev").collect()}
    assert set(got) == {6.0, 7.0, 13.0}
    assert (got[6.0].n_risk, got[6.0].d) == (6, 2)
    assert got[6.0].cumhaz == round(2 / 6, 6)
    assert got[6.0].cumhaz_var == round(2 / 36, 6)
    assert got[7.0].cumhaz == round(2 / 6 + 1 / 3, 6)
    assert got[13.0].cumhaz == round(2 / 6 + 1 / 3 + 1.0, 6)
    assert got[13.0].cumhaz_var == round(2 / 36 + 1 / 9 + 1.0, 6)


def _logrank_reference(rows):
    """Pure-Python log-rank over (dur, ev, g) subject rows."""
    times = sorted({t for t, e, _ in rows if e == 1})
    ome = var = exp1 = 0.0
    obs1 = 0
    for t in times:
        n = sum(1 for d, _, _ in rows if d >= t)
        n1 = sum(1 for d, _, g in rows if d >= t and g == 1)
        d = sum(1 for dd, e, _ in rows if dd == t and e == 1)
        d1 = sum(1 for dd, e, g in rows if dd == t and e == 1 and g == 1)
        e1 = d * n1 / n
        obs1 += d1
        exp1 += e1
        ome += d1 - e1
        if n > 1:
            var += d * (n1 / n) * (1 - n1 / n) * (n - d) / (n - 1)
    stat = ome * ome / var if var > 0 else 0.0
    return len(times), obs1, round(exp1, 6), round(ome, 6), round(stat, 6)


def test_logrank_matches_reference(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        logrank_test,
    )

    rows = [
        (6.0, 1, 0), (6.0, 1, 0), (6.0, 0, 0), (7.0, 1, 0), (10.0, 0, 0),
        (13.0, 1, 0), (16.0, 1, 0), (22.0, 1, 0), (3.0, 1, 1), (6.0, 1, 1),
        (9.0, 0, 1), (10.0, 1, 1), (11.0, 0, 1), (12.0, 1, 1), (19.0, 0, 1),
        (32.0, 1, 1),
    ]
    df = spark.createDataFrame(rows, ["dur", "ev", "g"])
    r = logrank_test(df, "dur", "ev", "g").collect()[0]
    n_times, obs1, exp1, ome, stat = _logrank_reference(rows)
    assert r.n_times == n_times
    assert r.obs1 == obs1
    assert r.exp1 == exp1
    assert r.o_minus_e == ome
    assert r.logrank == stat
    assert stat > 0


def test_logrank_identical_groups_near_zero(spark):
    """Duplicating every subject into both cohorts: O-E is exactly 0."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        logrank_test,
    )

    base = [(3.0, 1), (5.0, 0), (7.0, 1), (9.0, 1), (12.0, 0)]
    rows = [(t, e, g) for t, e in base for g in (0, 1)]
    r = logrank_test(
        spark.createDataFrame(rows, ["dur", "ev", "g"]), "dur", "ev", "g"
    ).collect()[0]
    assert r.o_minus_e == 0.0
    assert r.logrank == 0.0


def test_logrank_one_cohort_degenerate(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        logrank_test,
    )

    rows = [(3.0, 1, 1), (5.0, 1, 1), (7.0, 0, 1)]
    r = logrank_test(
        spark.createDataFrame(rows, ["dur", "ev", "g"]), "dur", "ev", "g"
    ).collect()[0]
    # all subjects in cohort 1: variance 0 -> statistic defined as 0
    assert r.logrank == 0.0
    assert r.obs1 == 2


def _kw_reference(pairs):
    """Pure-Python tie-corrected Kruskal-Wallis over (group, value)."""
    vals = sorted(v for _, v in pairs)
    n = len(vals)
    # average rank per distinct value
    ranks, i = {}, 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        ranks[vals[i]] = (i + 1 + j) / 2.0
        i = j
    groups = {}
    for g, v in pairs:
        groups.setdefault(g, []).append(ranks[v])
    h = 12.0 / (n * (n + 1)) * sum(
        sum(rs) ** 2 / len(rs) for rs in groups.values()
    ) - 3 * (n + 1)
    from collections import Counter

    ties = sum(t**3 - t for t in Counter(vals).values())
    corr = 1 - ties / (n**3 - n)
    return round(h, 6), round(h / corr, 6) if corr > 0 else None


def test_kruskal_wallis_matches_reference(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        kruskal_wallis,
    )

    pairs = [
        ("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 5.0),
        ("b", 2.0), ("b", 4.0), ("b", 6.0), ("b", 6.0), ("b", 9.0),
        ("c", 3.0), ("c", 6.0), ("c", 8.0),
    ]
    r = kruskal_wallis(
        spark.createDataFrame(pairs, ["g", "v"]), "g", "v"
    ).collect()[0]
    h, h_adj = _kw_reference(pairs)
    assert (r.k, r.n) == (3, 12)
    assert r.h == h
    assert r.h_adj == h_adj
    assert r.h_adj >= r.h  # tie correction can only inflate


def test_kruskal_wallis_all_tied(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        kruskal_wallis,
    )

    pairs = [("a", 5.0), ("a", 5.0), ("b", 5.0), ("b", 5.0)]
    r = kruskal_wallis(
        spark.createDataFrame(pairs, ["g", "v"]), "g", "v"
    ).collect()[0]
    assert r.h == 0.0 and r.h_adj is None


def test_brown_forsythe_matches_reference(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        brown_forsythe,
    )

    pairs = [
        ("a", 1.0), ("a", 3.0), ("a", 5.0), ("a", 11.0),
        ("b", 4.0), ("b", 5.0), ("b", 6.0), ("b", 7.0), ("b", 8.0),
    ]
    # group medians: a -> (3+5)/2 = 4, b -> 6
    za = [abs(x - 4.0) for x in (1, 3, 5, 11)]   # 3,1,1,7
    zb = [abs(x - 6.0) for x in (4, 5, 6, 7, 8)]  # 2,1,0,1,2
    n, k = 9, 2
    zbar_a, zbar_b = sum(za) / 4, sum(zb) / 5
    zbar = (sum(za) + sum(zb)) / n
    ssb = 4 * (zbar_a - zbar) ** 2 + 5 * (zbar_b - zbar) ** 2
    ssw = sum((z - zbar_a) ** 2 for z in za) + sum(
        (z - zbar_b) ** 2 for z in zb
    )
    f_ref = (ssb / (k - 1)) / (ssw / (n - k))
    r = brown_forsythe(
        spark.createDataFrame(pairs, ["g", "v"]), "g", "v"
    ).collect()[0]
    assert (r.k, r.n) == (2, 9)
    assert r.f_bf == round(f_ref, 6)


def test_jarque_bera_reference_and_degenerate(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        jarque_bera,
    )

    xs = [2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0]
    n = len(xs)
    mu = sum(xs) / n
    m2 = sum((x - mu) ** 2 for x in xs) / n
    m3 = sum((x - mu) ** 3 for x in xs) / n
    m4 = sum((x - mu) ** 4 for x in xs) / n
    skew, kurt = m3 / m2**1.5, m4 / m2**2
    jb = n / 6 * (skew**2 + (kurt - 3) ** 2 / 4)
    df = spark.createDataFrame([(x,) for x in xs], ["v"])
    r = jarque_bera(df, "v").collect()[0]
    assert r.n == n
    assert r.skew == round(skew, 6)
    assert r.kurt == round(kurt, 6)
    assert r.jb == round(jb, 6)
    # constant column: moments degenerate -> NULLs, not NaN/error
    c = spark.createDataFrame([(3.0,), (3.0,)], ["v"])
    rc = jarque_bera(c, "v").collect()[0]
    assert rc.skew is None and rc.jb is None

    # grouped form returns one row per group
    g = spark.createDataFrame(
        [("a", x) for x in xs] + [("b", x + 1) for x in xs], ["g", "v"]
    )
    rows = {r.g: r for r in jarque_bera(g, "v", "g").collect()}
    assert set(rows) == {"a", "b"}
    # shift invariance of skew/kurt
    assert rows["a"].jb == rows["b"].jb


def test_cochran_q_matches_reference(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        cochran_q,
    )

    rows = [
        (1, 1, 1), (1, 1, 0), (1, 0, 0), (1, 1, 0), (0, 0, 0),
        (1, 1, 1), (1, 0, 0), (1, 1, 0), (0, 0, 0), (1, 1, 0),
    ]
    df = spark.createDataFrame(rows, ["a", "b", "c"])
    r = cochran_q(df, ["a", "b", "c"]).collect()[0]
    k = 3
    cj = [sum(x[i] for x in rows) for i in range(k)]
    n_tot = sum(cj)
    r2 = sum(sum(x) ** 2 for x in rows)
    q_ref = (k - 1) * (k * sum(c * c for c in cj) - n_tot**2) / (
        k * n_tot - r2
    )
    assert (r.n, r.k) == (10, 3)
    assert (r.c_1, r.c_2, r.c_3) == tuple(cj)
    assert r.q_cochran == round(q_ref, 6)


def test_cochran_q_degenerate_all_pass(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        cochran_q,
    )

    df = spark.createDataFrame([(1, 1), (1, 1)], ["a", "b"])
    r = cochran_q(df, ["a", "b"]).collect()[0]
    assert r.q_cochran is None  # denominator 0


def _friedman_reference(blocks):
    """blocks: list of dict treatment -> value (complete blocks)."""
    from collections import Counter, defaultdict

    k = len(blocks[0])
    n = len(blocks)
    rsum = defaultdict(float)
    tsum = 0.0
    for b in blocks:
        vals = sorted(b.values())
        ranks = {}
        i = 0
        while i < k:
            j = i
            while j < k and vals[j] == vals[i]:
                j += 1
            ranks[vals[i]] = (i + 1 + j) / 2.0
            i = j
        for trt, v in b.items():
            rsum[trt] += ranks[v]
        tsum += sum(t**3 - t for t in Counter(vals).values())
    chi2 = 12.0 * sum(r * r for r in rsum.values()) / (n * k * (k + 1)) - 3 * n * (k + 1)
    c = 1 - tsum / (n * (k**3 - k))
    return round(chi2 / c, 6) if c > 0 else None


def test_friedman_matches_reference_with_ties(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        friedman_test,
    )

    blocks = [
        {"x": 1.0, "y": 2.0, "z": 3.0},
        {"x": 2.0, "y": 2.0, "z": 4.0},   # tie inside a block
        {"x": 1.0, "y": 3.0, "z": 2.0},
        {"x": 2.0, "y": 5.0, "z": 5.0},   # tie
        {"x": 1.0, "y": 2.0, "z": 5.0},
        {"x": 3.0, "y": 4.0, "z": 6.0},
    ]
    rows = [
        (i, trt, v) for i, b in enumerate(blocks) for trt, v in b.items()
    ]
    # plus one INCOMPLETE block that must be dropped
    rows.append((99, "x", 7.0))
    rows.append((99, "y", 1.0))
    df = spark.createDataFrame(rows, ["b", "trt", "v"])
    r = friedman_test(df, "b", "trt", "v").collect()[0]
    assert (r.n_blocks, r.k) == (6, 3)
    assert r.chi2_f == _friedman_reference(blocks)
    assert r.chi2_f > 0


def test_ece_mce_hand_case(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        ece_mce,
    )

    # two bins used with n_bins=2: [0,0.5) and [0.5,1]
    rows = [
        (0.2, 0), (0.3, 1), (0.4, 0),          # bin0: conf 0.3, acc 1/3
        (0.8, 1), (0.9, 1), (0.6, 0), (1.0, 1)  # bin1: conf 0.825, acc 3/4
    ]
    df = spark.createDataFrame(rows, ["s", "y"])
    r = ece_mce(df, "s", "y", n_bins=2).collect()[0]
    gap0 = abs(1 / 3 - 0.3)
    gap1 = abs(3 / 4 - (0.8 + 0.9 + 0.6 + 1.0) / 4)
    ece = (3 * gap0 + 4 * gap1) / 7
    assert (r.n, r.n_bins_used) == (7, 2)
    assert r.ece == round(ece, 6)
    assert r.mce == round(max(gap0, gap1), 6)


def test_ece_perfectly_calibrated(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        ece_mce,
    )

    # each bin's accuracy equals its mean score exactly
    rows = [(0.25, 1), (0.25, 0), (0.25, 0), (0.25, 0),
            (0.75, 1), (0.75, 1), (0.75, 1), (0.75, 0)]
    r = ece_mce(spark.createDataFrame(rows, ["s", "y"]), "s", "y",
                n_bins=2).collect()[0]
    assert r.ece == 0.0 and r.mce == 0.0


def test_rbo_identical_and_disjoint(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        rbo_overlap,
    )

    a = spark.createDataFrame([(i, i) for i in range(1, 6)], ["item", "r"])
    r = rbo_overlap(a, a, "item", "r", depth=5, p=0.9).collect()[0]
    # identical rankings: rbo = (1-p) * sum p^(k-1) (truncated; < 1)
    expect = 0.1 * sum(0.9 ** (k - 1) for k in range(1, 6))
    assert r.overlap_at_depth == 5
    assert r.rbo_min == round(expect, 6)

    b = spark.createDataFrame(
        [(i + 100, i) for i in range(1, 6)], ["item", "r"]
    )
    r2 = rbo_overlap(a, b, "item", "r", depth=5).collect()[0]
    assert r2.overlap_at_depth == 0 and r2.rbo_min == 0.0


def test_rbo_hand_case(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        rbo_overlap,
    )

    # A: 1,2,3  B: 2,1,4 (depth 3, p=0.5)
    # prefixes: k=1 {1}/{2} ov 0; k=2 {1,2}/{2,1} ov 2; k=3 ov 2
    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], ["item", "r"])
    b = spark.createDataFrame([(2, 1), (1, 2), (4, 3)], ["item", "r"])
    r = rbo_overlap(a, b, "item", "r", depth=3, p=0.5).collect()[0]
    expect = 0.5 * (0.5 ** 0 * 0 / 1 + 0.5 ** 1 * 2 / 2 + 0.5 ** 2 * 2 / 3)
    assert r.overlap_at_depth == 2
    assert r.rbo_min == round(expect, 6)


def test_quantile_pinball_hand_case(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        quantile_pinball,
    )

    train = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 5.0)],
        ["g", "v"],
    )
    test = spark.createDataFrame([("a", 2.0), ("a", 6.0)], ["g", "v"])
    # train quantiles (linear interp): p50 = 3
    rows = {
        r.q: r
        for r in quantile_pinball(
            train, test, "g", "v", quantiles=(0.5,)
        ).collect()
    }
    # errors vs 3: -1, +3 -> pinball_0.5 = mean(max(.5*e, -.5*e)) = (0.5 + 1.5)/2
    assert rows[0.5].n == 2
    assert rows[0.5].pinball == 1.0


def test_theil_decomposition_reference(spark):
    import math

    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        theil_decomposition,
    )

    pairs = [("a", 1.0), ("a", 3.0), ("b", 2.0), ("b", 6.0), ("b", 8.0)]
    xs = [v for _, v in pairs]
    n, mu = len(xs), sum(xs) / len(xs)
    t_total = sum(x / (n * mu) * math.log(x / mu) for x in xs)
    groups = {"a": [1.0, 3.0], "b": [2.0, 6.0, 8.0]}
    s = sum(xs)
    t_between = sum(
        (sum(g) / s) * math.log((sum(g) / len(g)) / mu)
        for g in groups.values()
    )
    t_within = sum(
        (sum(g) / s)
        * sum(
            x / (len(g) * (sum(g) / len(g)))
            * math.log(x / (sum(g) / len(g)))
            for x in g
        )
        for g in groups.values()
    )
    r = theil_decomposition(
        spark.createDataFrame(pairs, ["g", "v"]), "g", "v"
    ).collect()[0]
    assert (r.n, r.k) == (5, 2)
    assert r.theil_total == round(t_total, 6)
    assert r.theil_between == round(t_between, 6)
    assert r.theil_within == round(t_within, 6)
    assert abs(r.theil_total - (r.theil_between + r.theil_within)) < 2e-6
    # perfectly equal values: zero inequality
    eq = spark.createDataFrame([("a", 4.0), ("b", 4.0)], ["g", "v"])
    re = theil_decomposition(eq, "g", "v").collect()[0]
    assert re.theil_total == 0.0


def test_raking_weights_hits_uniform_marginals(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        raking_weights,
    )

    rows = (
        [("r1", "c1")] * 4 + [("r1", "c2")] * 1
        + [("r2", "c1")] * 1 + [("r2", "c2")] * 2
    )
    df = spark.createDataFrame(rows, ["a", "b"])
    out = {
        (r.r, r.c): r
        for r in raking_weights(df, "a", "b", iterations=8).collect()
    }
    n = 8.0
    # after enough iterations weighted marginals converge to N/R and N/C
    for rr in ("r1", "r2"):
        tot = sum(
            v.n * v.weight for (a, _), v in out.items() if a == rr
        )
        assert abs(tot - n / 2) < 1e-3
    for cc in ("c1", "c2"):
        tot = sum(
            v.n * v.weight for (_, b), v in out.items() if b == cc
        )
        assert abs(tot - n / 2) < 1e-3
    # 2-iteration output is deterministic and positive
    out2 = raking_weights(df, "a", "b", iterations=2).collect()
    assert all(r.weight > 0 for r in out2)


def test_grubbs_hand_case(spark):
    import math

    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        grubbs_test,
    )

    xs = [8.0, 9.0, 10.0, 11.0, 12.0, 50.0]
    n = len(xs)
    mu = sum(xs) / n
    s = math.sqrt(sum((x - mu) ** 2 for x in xs) / (n - 1))
    r = grubbs_test(
        spark.createDataFrame([(x,) for x in xs], ["v"]), "v"
    ).collect()[0]
    assert r.n == n
    assert r.g_stat == round((50.0 - mu) / s, 6)
    assert r.side == "high" and r.extreme == 50.0

    lo = grubbs_test(
        spark.createDataFrame([(-40.0,), (1.0,), (2.0,), (3.0,)], ["v"]),
        "v",
    ).collect()[0]
    assert lo.side == "low" and lo.extreme == -40.0

    const = grubbs_test(
        spark.createDataFrame([(5.0,), (5.0,), (5.0,)], ["v"]), "v"
    ).collect()[0]
    assert const.g_stat is None


def test_cronbach_alpha_reference(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        cronbach_alpha,
    )

    rows = [
        (2.0, 3.0, 2.5), (4.0, 4.0, 4.5), (3.0, 3.5, 3.0),
        (5.0, 4.5, 5.0), (1.0, 2.0, 1.5), (4.5, 5.0, 4.0),
    ]
    df = spark.createDataFrame(rows, ["a", "b", "c"])
    r = cronbach_alpha(df, ["a", "b", "c"]).collect()[0]
    n, k = len(rows), 3

    def pvar(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs) / len(xs)

    iv = sum(pvar([row[i] for row in rows]) for i in range(k))
    tv = pvar([sum(row) for row in rows])
    alpha = k / (k - 1) * (1 - iv / tv)
    assert (r.n, r.k) == (n, k)
    assert r.alpha == round(alpha, 6)
    assert 0.8 < r.alpha <= 1.0  # strongly correlated items


def test_cronbach_alpha_uncorrelated_low(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        cronbach_alpha,
    )

    # anti-correlated items drive alpha negative
    rows = [(1.0, 5.0), (2.0, 4.0), (3.0, 3.0), (4.0, 2.0), (5.0, 1.0)]
    r = cronbach_alpha(
        spark.createDataFrame(rows, ["a", "b"]), ["a", "b"]
    ).collect()[0]
    assert r.alpha is None  # sum is constant -> zero total variance


def test_icc_oneway_reference(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        icc_oneway,
    )

    blocks = {
        1: [9.0, 10.0, 11.0],
        2: [1.0, 2.0, 3.0],
        3: [5.0, 5.5, 6.5],
        4: [14.0, 15.0, 16.0],
    }
    rows = [(b, v) for b, vs in blocks.items() for v in vs]
    # plus one unbalanced block (2 measurements) that must be dropped
    rows += [(99, 7.0), (99, 8.0)]
    df = spark.createDataFrame(rows, ["b", "v"])
    r = icc_oneway(df, "b", "v").collect()[0]
    nb, k = 4, 3
    grand = sum(sum(v) for v in blocks.values()) / (nb * k)
    ssb = sum(
        k * (sum(v) / k - grand) ** 2 for v in blocks.values()
    )
    ssw = sum(
        (x - sum(v) / k) ** 2 for v in blocks.values() for x in v
    )
    msb, msw = ssb / (nb - 1), ssw / (nb * (k - 1))
    icc = (msb - msw) / (msb + (k - 1) * msw)
    assert (r.n_blocks, r.k) == (nb, k)
    assert r.icc == round(icc, 6)
    assert r.icc > 0.9  # blocks dominate variance


def test_holm_bonferroni_reference(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        holm_bonferroni,
    )

    ps = [("h1", 0.01), ("h2", 0.04), ("h3", 0.03), ("h4", 0.005)]
    df = spark.createDataFrame(ps, ["h", "p"])
    out = {r.h: r for r in holm_bonferroni(df, "p", ["h"]).collect()}
    # sorted: 0.005, 0.01, 0.03, 0.04 with m=4
    # steps:  0.02, 0.03, 0.06, 0.04 -> running max: 0.02, 0.03, 0.06, 0.06
    assert out["h4"].p_adj == 0.02
    assert out["h1"].p_adj == 0.03
    assert out["h3"].p_adj == 0.06
    assert out["h2"].p_adj == 0.06  # monotonicity enforced
    assert out["h4"].reject and out["h1"].reject
    assert not out["h3"].reject and not out["h2"].reject


def test_exp_interarrival_fit_exact_exponential_sample(spark):
    import math

    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        exp_interarrival_fit,
    )

    # inverse-CDF quantile sample of Exp(2): near-perfect fit
    n = 50
    gaps = [-math.log(1 - (i + 0.5) / n) / 2.0 for i in range(n)]
    rows = [(g, i) for i, g in enumerate(gaps)]
    r = exp_interarrival_fit(
        spark.createDataFrame(rows, ["g", "id"]), "g", "id"
    ).collect()[0]
    assert r.n == n
    mu = sum(gaps) / n
    assert r.lambda_hat == round(1 / mu, 6)
    assert r.sqrt_n_d < 1.0  # comfortably exponential

    # constant gaps: decisively NOT exponential
    const = [(1.0, i) for i in range(50)]
    rc = exp_interarrival_fit(
        spark.createDataFrame(const, ["g", "id"]), "g", "id"
    ).collect()[0]
    assert rc.sqrt_n_d > 1.36


def test_binomial_overdispersion_reference(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        binomial_overdispersion,
    )

    groups = {"a": (10, 2), "b": (20, 10), "c": (15, 12)}
    rows = [
        (g, 1 if i < s else 0)
        for g, (n, s) in groups.items()
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, ["g", "y"])
    r = binomial_overdispersion(df, "g", "y").collect()[0]
    n_tot = sum(n for n, _ in groups.values())
    s_tot = sum(s for _, s in groups.values())
    p = s_tot / n_tot
    x2 = sum(
        (s - n * p) ** 2 / (n * p * (1 - p))
        for n, s in groups.values()
    )
    assert (r.k, r.n) == (3, n_tot)
    assert r.p_bar == round(p, 6)
    assert r.x2 == round(x2, 6)
    assert r.phi == round(x2 / 2, 6)
    assert r.phi > 1  # heterogeneous rates


def test_binomial_overdispersion_homogeneous_near_one(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        binomial_overdispersion,
    )

    # identical composition in every group -> X² = 0
    rows = [(g, y) for g in "abcd" for y in (1, 1, 0, 0, 0)]
    r = binomial_overdispersion(
        spark.createDataFrame(rows, ["g", "y"]), "g", "y"
    ).collect()[0]
    assert r.x2 == 0.0 and r.phi == 0.0


def test_average_precision_matches_sklearn_convention(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        average_precision,
    )

    # scores desc: 0.9(+), 0.8(-), 0.7(+), 0.6(+), 0.5(-)
    rows = [(0.9, 1), (0.8, 0), (0.7, 1), (0.6, 1), (0.5, 0)]
    r = average_precision(
        spark.createDataFrame(rows, ["s", "y"]), "s", "y"
    ).collect()[0]
    # AP = (1/3)*1 + (1/3)*(2/3) + (1/3)*(3/4)
    expect = (1 / 3) * 1.0 + (1 / 3) * (2 / 3) + (1 / 3) * (3 / 4)
    assert (r.n, r.n_pos) == (5, 3)
    assert r.ap == round(expect, 6)

    # perfect ranking: AP = 1
    perf = [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)]
    rp = average_precision(
        spark.createDataFrame(perf, ["s", "y"]), "s", "y"
    ).collect()[0]
    assert rp.ap == 1.0

    # no positives -> NULL
    rn = average_precision(
        spark.createDataFrame([(0.5, 0), (0.4, 0)], ["s", "y"]), "s", "y"
    ).collect()[0]
    assert rn.ap is None


def test_average_precision_ties_grouped(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        average_precision,
    )

    # tied scores collapse into one threshold step
    rows = [(0.9, 1), (0.9, 0), (0.1, 1), (0.1, 0)]
    r = average_precision(
        spark.createDataFrame(rows, ["s", "y"]), "s", "y"
    ).collect()[0]
    # thresholds: 0.9 -> tp1 fp1 P=.5 dR=.5 ; 0.1 -> tp2 fp2 P=.5 dR=.5
    assert r.ap == 0.5


def test_threshold_select_cost_and_youden(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        threshold_select,
    )

    rows = [(0.9, 1), (0.8, 1), (0.7, 0), (0.6, 1), (0.5, 0), (0.4, 0)]
    r = threshold_select(
        spark.createDataFrame(rows, ["s", "y"]), "s", "y"
    ).collect()[0]
    # enumerate: thresholds desc 0.9..0.4
    # t=0.9: fp0 fn2 cost2 | t=0.8: fp0 fn1 cost1 | t=0.7: fp1 fn1 cost2
    # t=0.6: fp1 fn0 cost1 | t=0.5: fp2 fn0 | t=0.4: fp3 fn0
    # min cost=1 at t in {0.8, 0.6} -> smallest threshold 0.6
    assert r.thr_cost == 0.6 and r.cost == 1.0
    # J: t=0.8: 2/3-0=2/3 ; t=0.6: 1-1/3=2/3 -> tie, smallest t wins
    assert r.thr_j == 0.6 and r.j == round(2 / 3, 6)

    # heavy FP cost pushes the cut up
    r2 = threshold_select(
        spark.createDataFrame(rows, ["s", "y"]), "s", "y", c_fp=10.0
    ).collect()[0]
    assert r2.thr_cost == 0.8


def test_negbin_fit_reference(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        negbin_fit,
    )

    xs = [0.0, 1.0, 1.0, 2.0, 3.0, 5.0, 8.0, 12.0]
    n = len(xs)
    mu = sum(xs) / n
    var = sum((x - mu) ** 2 for x in xs) / (n - 1)
    r = negbin_fit(
        spark.createDataFrame([(x,) for x in xs], ["c"]), "c"
    ).collect()[0]
    assert r.n == n
    assert r.mean == round(mu, 6)
    assert r.vmr == round(var / mu, 6)
    assert r.r == round(mu * mu / (var - mu), 6)
    assert r.p == round(mu / var, 6)
    assert r.vmr > 1  # overdispersed

    # underdispersed: no NB fit
    under = negbin_fit(
        spark.createDataFrame([(4.0,), (5.0,), (4.0,), (5.0,)], ["c"]), "c"
    ).collect()[0]
    assert under.r is None and under.vmr < 1


def test_zero_inflation_check_reference(spark):
    import math

    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        zero_inflation_check,
    )

    xs = [0.0] * 6 + [1.0, 2.0, 3.0, 4.0]
    n = len(xs)
    mu = sum(xs) / n
    r = zero_inflation_check(
        spark.createDataFrame([(x,) for x in xs], ["c"]), "c"
    ).collect()[0]
    assert (r.n, r.zeros_obs) == (n, 6)
    assert r.zeros_exp == round(n * math.exp(-mu), 6)
    assert r.inflation == round(6 / (n * math.exp(-mu)), 6)
    assert r.inflation > 1


def test_runs_test_reference_and_extremes(spark):
    import math

    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        runs_test,
    )

    seq = [1, 1, 0, 1, 0, 0, 0, 1, 1, 0]
    rows = [(t, f) for t, f in enumerate(seq)]
    r = runs_test(spark.createDataFrame(rows, ["t", "f"]), "t", "f").collect()[0]
    runs = 1 + sum(1 for a, b in zip(seq, seq[1:]) if a != b)
    n, n1 = len(seq), sum(seq)
    n0 = n - n1
    er = 2 * n1 * n0 / n + 1
    var = 2 * n1 * n0 * (2 * n1 * n0 - n) / (n * n * (n - 1))
    assert (r.n, r.n1, r.runs) == (n, n1, runs)
    assert r.z == round((runs - er) / math.sqrt(var), 6)

    # perfectly alternating: maximal runs, strongly positive z
    alt = [(t, t % 2) for t in range(20)]
    ra = runs_test(spark.createDataFrame(alt, ["t", "f"]), "t", "f").collect()[0]
    assert ra.runs == 20 and ra.z > 3

    # one-class sequence: no test
    ones = [(t, 1) for t in range(5)]
    ro = runs_test(spark.createDataFrame(ones, ["t", "f"]), "t", "f").collect()[0]
    assert ro.z is None


def test_evalue_rr_reference(spark):
    import math

    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        evalue_rr,
    )

    rows = [(1, 1)] * 30 + [(1, 0)] * 70 + [(0, 1)] * 10 + [(0, 0)] * 90
    r = evalue_rr(
        spark.createDataFrame(rows, ["t", "y"]), "t", "y"
    ).collect()[0]
    rr = 0.3 / 0.1
    assert r.rr == 3.0
    assert r.evalue == round(rr + math.sqrt(rr * (rr - 1)), 6)

    # protective effect (RR < 1): E-value computed on 1/RR
    inv = [(1, 1)] * 10 + [(1, 0)] * 90 + [(0, 1)] * 30 + [(0, 0)] * 70
    r2 = evalue_rr(
        spark.createDataFrame(inv, ["t", "y"]), "t", "y"
    ).collect()[0]
    assert r2.evalue == r.evalue  # symmetric


def test_james_stein_shrinks_toward_grand_mean(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        james_stein_means,
    )

    import random

    random.seed(5)
    rows = []
    true = {"a": 10.0, "b": 12.0, "c": 11.0, "d": 9.0, "e": 13.0}
    for g, mu in true.items():
        for _ in range(20):
            rows.append((g, mu + random.uniform(-3, 3)))
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {r.g: r for r in james_stein_means(df, "g", "v").collect()}
    grand = sum(r.raw_mean for r in out.values()) / 5
    for g, r in out.items():
        # strictly between raw and grand (or equal when raw == grand)
        lo, hi = sorted((r.raw_mean, grand))
        assert lo - 1e-9 <= r.shrunk_mean <= hi + 1e-9
    # extreme groups move the most in absolute terms
    moves = {g: abs(r.raw_mean - r.shrunk_mean) for g, r in out.items()}
    far = max(out, key=lambda g: abs(out[g].raw_mean - grand))
    near = min(out, key=lambda g: abs(out[g].raw_mean - grand))
    assert moves[far] >= moves[near]


def test_james_stein_small_k_identity(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        james_stein_means,
    )

    rows = [("a", 1.0), ("a", 2.0), ("b", 5.0), ("b", 6.0)]
    out = {r.g: r for r in james_stein_means(
        spark.createDataFrame(rows, ["g", "v"]), "g", "v"
    ).collect()}
    for r in out.values():
        assert r.shrunk_mean == r.raw_mean  # k < 4: no shrinkage


def test_mmd_rff_identical_vs_shifted(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        mmd_rff,
    )

    same = [("a", float(i % 10)) for i in range(100)] + [
        ("b", float(i % 10)) for i in range(100)
    ]
    r = mmd_rff(
        spark.createDataFrame(same, ["g", "v"]), "g", "v", "a", "b",
        bandwidth=2.0,
    ).collect()[0]
    assert (r.n_a, r.n_b) == (100, 100)
    assert r.mmd2 == 0.0  # identical samples -> identical feature means

    shifted = [("a", float(i % 10)) for i in range(100)] + [
        ("b", float(i % 10) + 5.0) for i in range(100)
    ]
    r2 = mmd_rff(
        spark.createDataFrame(shifted, ["g", "v"]), "g", "v", "a", "b",
        bandwidth=2.0,
    ).collect()[0]
    assert r2.mmd2 > 0.01  # clearly separated distributions


def test_mmd_rff_reference_value(spark):
    import math

    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        mmd_rff,
        mmd_rff_params,
    )

    a_vals = [1.0, 2.0, 3.0]
    b_vals = [2.0, 4.0]
    rows = [("a", v) for v in a_vals] + [("b", v) for v in b_vals]
    params = mmd_rff_params(16, 1.5, 11)
    scale = math.sqrt(2.0 / 16)
    mmd2 = sum(
        (
            sum(scale * math.cos(w * x + b) for x in a_vals) / len(a_vals)
            - sum(scale * math.cos(w * x + b) for x in b_vals) / len(b_vals)
        )
        ** 2
        for w, b in params
    )
    r = mmd_rff(
        spark.createDataFrame(rows, ["g", "v"]), "g", "v", "a", "b",
        n_features=16, bandwidth=1.5, seed=11,
    ).collect()[0]
    assert r.mmd2 == round(mmd2, 6)


def test_pocock_sequential_crossing(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        pocock_sequential,
    )

    rows = []
    # looks 1-2: no effect; looks 3-5: strong treatment effect
    for look in range(1, 6):
        for i in range(200):
            t = i % 2
            if look <= 2:
                y = 1 if (i // 2) % 10 < 3 else 0
            else:
                y = 1 if ((i // 2) % 10 < (7 if t else 3)) else 0
            rows.append((look, t, y))
    df = spark.createDataFrame(rows, ["look", "t", "y"])
    out = {r.look: r for r in pocock_sequential(df, "look", "t", "y").collect()}
    assert not out[1].crossed and not out[2].crossed
    assert out[5].crossed  # effect accumulates past 2.413
    # crossing is sticky: once crossed, stays crossed
    first = min(k for k in out if out[k].crossed)
    assert all(out[k].crossed for k in range(first, 6))


def _xi_reference(pairs):
    n = len(pairs)
    ys = [y for _, y in pairs]
    ranks = {}
    for _, y in pairs:
        ranks[y] = sum(1 for yy in ys if yy <= y)
    ordered = sorted(pairs, key=lambda p: (p[0], p[1], ranks[p[1]]))
    s = sum(
        abs(ranks[ordered[i + 1][1]] - ranks[ordered[i][1]])
        for i in range(n - 1)
    )
    return round(1 - 3 * s / (n * n - 1), 6)


def test_xi_correlation_detects_nonmonotone_dependence(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        xi_correlation,
    )

    # perfect parabola: Pearson ~ 0, xi must be high
    par = [(float(x), float((x - 10) ** 2)) for x in range(21)]
    r = xi_correlation(
        spark.createDataFrame(par, ["x", "y"]), "x", "y"
    ).collect()[0]
    assert r.n == 21
    assert r.xi == _xi_reference(par)
    assert r.xi > 0.7

    # independent-ish scramble scores near 0
    import random

    random.seed(9)
    ys = list(range(40))
    random.shuffle(ys)
    ind = [(float(i), float(y)) for i, y in enumerate(ys)]
    r2 = xi_correlation(
        spark.createDataFrame(ind, ["x", "y"]), "x", "y"
    ).collect()[0]
    assert r2.xi == _xi_reference(ind)
    assert abs(r2.xi) < 0.35


def test_quantile_treatment_effects_hand_case(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        quantile_treatment_effects,
    )

    # treated = control + 10 shift exactly
    control = [float(v) for v in (1, 2, 3, 4, 5, 6, 7, 8, 9, 10)]
    rows = [(0, v) for v in control] + [(1, v + 10.0) for v in control]
    out = {
        r.q: r
        for r in quantile_treatment_effects(
            spark.createDataFrame(rows, ["t", "v"]), "t", "v",
            quantiles=(0.25, 0.5, 0.75),
        ).collect()
    }
    for q, r in out.items():
        assert r.qte == 10.0  # pure location shift at every quantile
    assert out[0.5].control == 5.5


def test_chi2_residuals_hand_case(spark):
    import math

    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        chi2_residuals,
    )

    # 2x2 with strong association: (a,x)=30 (a,y)=10 (b,x)=10 (b,y)=30
    rows = (
        [("a", "x")] * 30 + [("a", "y")] * 10
        + [("b", "x")] * 10 + [("b", "y")] * 30
    )
    df = spark.createDataFrame(rows, ["r", "c"])
    out = {(o.r, o.c): o for o in chi2_residuals(df, "r", "c").collect()}
    n = 80
    e_ax = 40 * 40 / n  # 20
    denom = math.sqrt(e_ax * (1 - 0.5) * (1 - 0.5))
    want = (30 - e_ax) / denom
    assert out[("a", "x")].expected == 20.0
    assert out[("a", "x")].residual == round(want, 6)
    assert out[("a", "x")].flagged
    # symmetry: all four |residuals| equal in a 2x2
    vals = {abs(o.residual) for o in out.values()}
    assert len(vals) == 1


def test_lorenz_deciles_concentration(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        lorenz_deciles,
    )

    # 9 small units + 1 huge: top tile carries ~92% of the mass
    rows = [(i, 1.0) for i in range(9)] + [(9, 100.0)]
    df = spark.createDataFrame(rows, ["id", "v"])
    out = {r.tile: r for r in
           lorenz_deciles(df, "v", "id", n_tiles=5).collect()}
    assert len(out) == 5
    assert out[5].tile_share == round(101.0 / 109.0, 6)
    assert out[5].cum_share == 1.0
    # shares are non-decreasing along tiles (sorted ascending)
    shares = [out[t].tile_share for t in sorted(out)]
    assert shares == sorted(shares)
    # cumulative hits 1 exactly at the top
    assert out[1].cum_share == round(2.0 / 109.0, 6)


def test_cvm_two_sample_reference(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        cvm_two_sample,
    )

    a_vals = [1.0, 2.0, 3.0, 4.0]
    b_vals = [2.0, 3.0, 5.0]
    rows = [("a", v) for v in a_vals] + [("b", v) for v in b_vals]
    r = cvm_two_sample(
        spark.createDataFrame(rows, ["g", "v"]), "g", "v", "a", "b"
    ).collect()[0]
    n, m = len(a_vals), len(b_vals)
    pooled = sorted(a_vals + b_vals)
    s = 0.0
    for v in pooled:
        fa = sum(1 for x in a_vals if x <= v) / n
        fb = sum(1 for x in b_vals if x <= v) / m
        s += (fa - fb) ** 2
    t = n * m / (n + m) ** 2 * s
    assert (r.n_a, r.n_b) == (n, m)
    assert r.t_stat == round(t, 6)

    # identical samples: T = 0
    same = [("a", float(v)) for v in range(5)] + [
        ("b", float(v)) for v in range(5)
    ]
    r0 = cvm_two_sample(
        spark.createDataFrame(same, ["g", "v"]), "g", "v", "a", "b"
    ).collect()[0]
    assert r0.t_stat == 0.0


def test_rayleigh_uniform_vs_concentrated(spark):
    import math

    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        rayleigh_test,
    )

    # perfectly uniform angles: R exactly 0 (symmetric cancellation)
    n = 24
    uni = [(2 * math.pi * i / n,) for i in range(n)]
    r = rayleigh_test(spark.createDataFrame(uni, ["th"]), "th").collect()[0]
    assert r.n == n
    assert abs(r.z) < 1e-9

    # concentrated near 6h (pi/2): huge z, mean_hour ~ 6
    conc = [(math.pi / 2 + 0.01 * ((i % 5) - 2),) for i in range(50)]
    rc = rayleigh_test(
        spark.createDataFrame(conc, ["th"]), "th"
    ).collect()[0]
    assert rc.z > 45
    assert abs(rc.mean_hour - 6.0) < 0.05


def test_watson_u2_rotation_invariance(spark):
    import math

    from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
        cvm_two_sample,
        watson_u2_two_sample,
    )

    # group b = group a rotated by 2 hours around the clock; the
    # rotation is applied to the INDEX so both groups share the exact
    # same floating-point grid values (a float (th+d) % 2pi would land
    # off-grid and leave finite-sample gap noise)
    base_idx = [(i * 37) % 24 for i in range(48)]
    base = [2 * math.pi * k / 24 for k in base_idx]
    rot = [2 * math.pi * ((k + 2) % 24) / 24 for k in base_idx]
    rows = [("a", th) for th in base] + [("b", th) for th in rot]
    df = spark.createDataFrame(rows, ["g", "th"])
    u = watson_u2_two_sample(df, "g", "th", "a", "b").collect()[0]
    # same circular distribution (base covers all 24 positions
    # uniformly; rotation permutes them) -> U2 == 0
    assert u.u2 == 0.0

    # a genuinely different concentration IS detected
    conc = [("a", 0.1 * (i % 7)) for i in range(48)] + [
        ("b", math.pi + 0.1 * (i % 7)) for i in range(48)
    ]
    dfc = spark.createDataFrame(conc, ["g", "th"])
    uc = watson_u2_two_sample(dfc, "g", "th", "a", "b").collect()[0]
    # opposite-side concentrations: linear CvM and U2 both large here,
    # but U2 stays large because the SHAPES (after best rotation) match
    # only at zero overlap... the point: U2 > critical 0.187
    assert uc.u2 > 0.187
