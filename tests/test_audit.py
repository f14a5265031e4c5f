"""Hand-computed cases for the corpus-audit operators (operators/audit.py):
Zipf fit, MAD robust outliers, Gini concentration.  (Benford + kappa live
in test_corpus.py alongside the other corpus statistics.)"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Row

from accelerated_intelligent_document_processing_on_aws_spark.operators.audit import (
    gini_concentration,
    robust_outliers,
    zipf_fit,
)


def _ols(xs, ys):
    n = len(xs)
    xb, yb = sum(xs) / n, sum(ys) / n
    sxy = sum((x - xb) * (y - yb) for x, y in zip(xs, ys))
    sxx = sum((x - xb) ** 2 for x in xs)
    syy = sum((y - yb) ** 2 for y in ys)
    return sxy / sxx, (sxy * sxy) / (sxx * syy)


def test_zipf_hand_computed(spark):
    # corpus: "a" x4, "b" x2, "c" x1 -> ranks 1,2,3 (freq desc)
    df = spark.createDataFrame(
        [Row(src="s", text="a a b"), Row(src="s", text="a a b c")]
    )
    (r,) = zipf_fit(df, ["src"], "text").collect()
    xs = [math.log(1.0), math.log(2.0), math.log(3.0)]
    ys = [math.log(4.0), math.log(2.0), math.log(1.0)]
    slope, r2 = _ols(xs, ys)
    assert r.n_terms == 3
    assert r.zipf_slope == round(slope, 6)
    assert r.r2 == round(r2, 6)


def test_zipf_degenerate_groups(spark):
    df = spark.createDataFrame(
        [
            Row(src="one_term", text="hello hello"),
            # every term equally frequent -> syy = 0 -> r2 NULL, slope 0
            Row(src="flat", text="x y z"),
        ]
    )
    got = {r.src: r for r in zipf_fit(df, ["src"], "text").collect()}
    assert got["one_term"].zipf_slope is None
    assert got["one_term"].r2 is None
    assert got["flat"].zipf_slope == 0.0
    assert got["flat"].r2 is None


def test_zipf_tiebreak_is_term_order(spark):
    # b and c tie at freq 1: rank must assign b=2, c=3 (term asc), in
    # every engine — the x values differ so the fit depends on it
    df = spark.createDataFrame([Row(src="s", text="a a c b")])
    (r,) = zipf_fit(df, ["src"], "text").collect()
    xs = [math.log(1.0), math.log(2.0), math.log(3.0)]
    ys = [math.log(2.0), math.log(1.0), math.log(1.0)]
    slope, _ = _ols(xs, ys)
    assert r.zipf_slope == round(slope, 6)


def test_robust_outliers_hand_computed(spark):
    vals = [float(i) for i in range(1, 10)] + [1000.0]
    # median 5.5; abs devs sorted: .5 .5 1.5 1.5 2.5 2.5 3.5 3.5 4.5 994.5
    # -> MAD 2.5; only 1000 clears 0.6745*|v-5.5| > 3.5*2.5
    df = spark.createDataFrame([Row(g="a", v=v) for v in vals])
    (r,) = robust_outliers(df, ["g"], "v").collect()
    assert (r.n, r.median, r.mad) == (10, 5.5, 2.5)
    assert (r.n_outliers, r.outlier_frac) == (1, 0.1)


def test_robust_outliers_zero_mad(spark):
    # >50% identical -> MAD 0: deviants flagged, identicals never
    df = spark.createDataFrame(
        [Row(g="a", v=7.0)] * 6 + [Row(g="a", v=8.0), Row(g="a", v=7.0 + 1e-12)]
    )
    (r,) = robust_outliers(df, ["g"], "v").collect()
    assert r.mad == 0.0
    assert r.n_outliers == 2


def test_robust_outliers_approx_path(spark):
    # exact=False (the 100 TB sketch path) agrees on this small input
    df = spark.createDataFrame(
        [Row(g="a", v=float(i)) for i in range(1, 10)] + [Row(g="a", v=1000.0)]
    )
    (r,) = robust_outliers(df, ["g"], "v", exact=False).collect()
    assert r.n_outliers == 1


def test_gini_uniform_and_concentrated(spark):
    df = spark.createDataFrame(
        [Row(s="uni", x=5.0)] * 4
        + [Row(s="conc", x=0.0)] * 3
        + [Row(s="conc", x=10.0)]
    )
    got = {r.s: r for r in gini_concentration(df, ["s"], "x").collect()}
    assert got["uni"].gini == 0.0
    # (2*(1*0+2*0+3*0+4*10) - 5*10) / (4*10) = 30/40
    assert got["conc"].gini == 0.75
    # ceil(4*0.01)=1 top row holds everything / a quarter of uniform
    assert got["conc"].top_share == 1.0
    assert got["uni"].top_share == 0.25


def test_gini_null_and_negative_excluded(spark):
    df = spark.createDataFrame(
        [Row(s="a", x=5.0), Row(s="a", x=None), Row(s="a", x=-3.0)]
    )
    (r,) = gini_concentration(df, ["s"], "x").collect()
    assert r.n == 1 and r.total == 5.0


# ------------------------------------------------------------ expectations


def _exp_rows(spark):
    from pyspark.sql import Row

    return spark.createDataFrame(
        [
            Row(id=1, lang="en", n=10, src="src1", txt="a"),
            Row(id=2, lang="en", n=20, src="src2", txt=None),
            Row(id=3, lang="xx", n=-5, src="other", txt="c"),
            Row(id=3, lang="fr", n=900, src="src3", txt="d"),
        ]
    )


def test_expectation_suite_metrics_and_verdicts(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.audit import (
        expectation_suite,
    )

    out = {
        r.check: r
        for r in expectation_suite(
            _exp_rows(spark),
            [
                {"check": "completeness", "column": "txt"},
                {"check": "uniqueness", "column": "id"},
                {"check": "in_set", "column": "lang",
                 "values": ["en", "fr"], "threshold": 0.7},
                {"check": "min_bound", "column": "n", "bound": 0},
                {"check": "max_bound", "column": "n", "bound": 1000},
                {"check": "matches", "column": "src",
                 "pattern": "^src[0-9]+$", "threshold": 0.75},
                {"check": "row_count_min", "bound": 3},
            ],
        ).collect()
    }
    c = out["completeness(txt)"]
    assert (c.metric, c.passed) == (0.75, False)
    u = out["uniqueness(id)"]
    assert (u.metric, u.passed) == (0.75, False)
    s = out["in_set(lang)"]
    assert (s.metric, s.passed) == (0.75, True)
    assert (out["min_bound(n)"].metric, out["min_bound(n)"].passed) == (
        -5.0, False)
    assert (out["max_bound(n)"].metric, out["max_bound(n)"].passed) == (
        900.0, True)
    m = out["matches(src)"]
    assert (m.metric, m.passed) == (0.75, True)
    r = out["row_count_min"]
    assert (r.metric, r.passed) == (4.0, True)


def test_expectation_suite_empty_input(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.audit import (
        expectation_suite,
    )

    df = _exp_rows(spark).filter("id > 99")
    out = {
        r.check: r
        for r in expectation_suite(
            df,
            [
                {"check": "completeness", "column": "txt"},
                {"check": "row_count_min", "bound": 1},
            ],
        ).collect()
    }
    # 0/0 completeness is NULL metric -> not passed (no evidence)
    assert out["completeness(txt)"].metric is None
    assert out["completeness(txt)"].passed is False
    assert out["row_count_min"].passed is False


def test_psi_drift_identical_and_shifted(spark):
    """Identical snapshots give PSI ~ 0; a shifted distribution gives a
    clearly positive PSI; epsilon clamping keeps one-sided bins finite."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.audit import (
        psi_drift,
    )
    import pyspark.sql.functions as F

    ref = spark.range(1000).select((F.col("id") % 10).alias("v"))
    same = psi_drift(ref, ref, "v").agg(F.sum("psi_term")).collect()[0][0]
    assert abs(same) < 1e-9

    cur = spark.range(1000).select((F.col("id") % 10 + 5).alias("v"))
    rows = psi_drift(ref, cur, "v").collect()
    total = sum(r.psi_term for r in rows)
    assert total > 0.25  # drifted by the standard rule of thumb
    bins = {r.bin for r in rows}
    assert bins == set(range(15))  # full outer: bins of either side
    assert all(r.p_ref >= 0 and r.p_cur >= 0 for r in rows)


def test_zonemap_pruning_layouts(spark):
    """A value-clustered layout prunes most files for a range predicate;
    a hash layout prunes none — the audit quantifies exactly that."""
    import pyspark.sql.functions as F

    from accelerated_intelligent_document_processing_on_aws_spark.operators.layout import (
        zonemap_stats,
    )

    df = spark.range(1600).select(F.col("id"), (F.col("id") % 400).alias("v"))
    hash_layout = zonemap_stats(
        df, F.pmod(F.col("id"), F.lit(16)), F.col("v"), 100, 120
    ).collect()
    clustered = zonemap_stats(
        df, F.floor(F.col("v") / 25), F.col("v"), 100, 120
    ).collect()
    assert sum(r.pruned for r in hash_layout) == 0
    pruned = sum(r.pruned for r in clustered)
    assert pruned >= len(clustered) - 2  # only overlapping zones survive
    for r in clustered:
        assert (not r.pruned) == (r.vmax >= 100 and r.vmin <= 120)


def test_l_diversity_tcloseness_hand_case(spark):
    """Two classes over sensitive domain {x, y}: entropy-l and TVD match
    the hand formulas; a homogeneous class has l=1, entropy_l=1, and
    TVD = 1 - P(its value)."""
    import math

    from accelerated_intelligent_document_processing_on_aws_spark.operators.audit import (
        l_diversity_tcloseness,
    )

    rows = (
        [("a", "x")] * 3 + [("a", "y")] * 1   # class a: 3x,1y
        + [("b", "x")] * 4                     # class b: all x
    )
    df = spark.createDataFrame(rows, ["q", "s"])
    got = {r.q: r for r in l_diversity_tcloseness(df, ["q"], "s").collect()}
    # global: P(x)=7/8, P(y)=1/8
    px, py = 7 / 8, 1 / 8
    a = got["a"]
    assert (a.size, a.l_distinct) == (4, 2)
    h = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert a.entropy_l == round(math.exp(h), 6)
    assert a.tvd == round(0.5 * (abs(0.75 - px) + abs(0.25 - py)), 6)
    b = got["b"]
    assert (b.size, b.l_distinct) == (4, 1)
    assert b.entropy_l == 1.0
    # class b misses y entirely: TVD = 0.5(|1-Px| + Py)
    assert b.tvd == round(0.5 * (abs(1 - px) + py), 6)


def test_fd_audit_exact_and_violations(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.audit import (
        fd_audit,
    )

    clean = spark.createDataFrame(
        [("s1", "en"), ("s1", "en"), ("s2", "fr")], ["a", "b"]
    )
    r = fd_audit(clean, "a", "b").collect()[0]
    assert (r.n, r.n_groups, r.violations, r.holds) == (3, 2, 0, True)

    dirty = spark.createDataFrame(
        [("s1", "en"), ("s1", "en"), ("s1", "fr"),
         ("s2", "fr"), ("s2", "de")],
        ["a", "b"],
    )
    r2 = fd_audit(dirty, "a", "b").collect()[0]
    # s1: 3 rows, majority en (2) -> 1 violation; s2: 2 rows -> 1
    assert (r2.violations, r2.holds) == (2, False)
    assert r2.g3 == round(2 / 5, 6)


def test_dp_noisy_counts_deterministic_and_calibrated(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.audit import (
        dp_noisy_counts,
    )

    rows = [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 20
    df = spark.createDataFrame(rows, ["g"])
    r1 = {r.g: r for r in dp_noisy_counts(df, "g", epsilon=1.0).collect()}
    r2 = {r.g: r for r in dp_noisy_counts(df, "g", epsilon=1.0).collect()}
    assert r1.keys() == {"a", "b", "c"}
    for g in r1:
        assert r1[g].noisy_n == r2[g].noisy_n  # deterministic
        assert r1[g].n in (50, 30, 20)
        # Laplace(1) noise: |noise| < 23 with prob 1-1e-10; sanity bound
        assert abs(r1[g].noisy_n - r1[g].n) < 25
    # a different salt moves the noise
    r3 = {r.g: r for r in dp_noisy_counts(df, "g", salt="other").collect()}
    assert any(r3[g].noisy_n != r1[g].noisy_n for g in r1)
    # tighter epsilon -> strictly larger noise magnitude (same u)
    r4 = {r.g: r for r in dp_noisy_counts(df, "g", epsilon=0.1).collect()}
    for g in r1:
        n = r1[g].n
        if r1[g].noisy_n != n:
            assert abs(r4[g].noisy_n - n) > abs(r1[g].noisy_n - n)


def test_ad_uniformity_reference_and_power(spark):
    import math

    from accelerated_intelligent_document_processing_on_aws_spark.operators.audit import (
        ad_uniformity,
    )

    # evenly spread values: A2 small, flagged uniform
    us = [(i + 0.5) / 40 for i in range(40)]
    rows = [(u, i) for i, u in enumerate(us)]
    df = spark.createDataFrame(rows, ["u", "id"])
    n = len(us)
    s = sum(
        (2 * j - 1) * math.log(u) + (2 * (n - j) + 1) * math.log(1 - u)
        for j, u in enumerate(sorted(us), 1)
    )
    a2_ref = -n - s / n
    r = ad_uniformity(df, "u", "id").collect()[0]
    assert r.n == n
    assert r.a2 == round(a2_ref, 6)
    assert r.uniform_ok

    # values piled into (0, 0.1): decisively non-uniform
    bad = [(0.001 + i * 0.002, i) for i in range(40)]
    rb = ad_uniformity(
        spark.createDataFrame(bad, ["u", "id"]), "u", "id"
    ).collect()[0]
    assert not rb.uniform_ok and rb.a2 > 10
