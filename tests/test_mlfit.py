"""Unit tests for operators/mlfit.py (ridge, Platt calibration, stump)."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Row
from pyspark.sql import functions as F

from accelerated_intelligent_document_processing_on_aws_spark.operators.mlfit import (
    gini_stump,
    logistic_platt,
    ridge_fit,
)


def test_ridge_matches_numpy_normal_equations(spark):
    rng = np.random.RandomState(7)
    x1 = rng.rand(200)
    x2 = rng.rand(200)
    y = 1.5 + 2.0 * x1 - 0.5 * x2 + 0.01 * rng.randn(200)
    df = spark.createDataFrame(
        [Row(y=float(a), x1=float(b), x2=float(c)) for a, b, c in zip(y, x1, x2)]
    )
    lam = 0.3
    r = ridge_fit(df, "y", "x1", "x2", lam=lam).collect()[0]
    X = np.column_stack([np.ones(200), x1, x2])
    A = X.T @ X + lam * np.diag([0.0, 1.0, 1.0])
    b = np.linalg.solve(A, X.T @ y)
    assert r.n == 200
    assert abs(r.b0 - b[0]) < 1e-6
    assert abs(r.b1 - b[1]) < 1e-6
    assert abs(r.b2 - b[2]) < 1e-6
    pred = X @ np.round(b, 9)
    r2 = 1 - ((y - pred) ** 2).sum() / ((y - y.mean()) ** 2).sum()
    assert abs(r.r2 - r2) < 1e-5


def test_ridge_lambda_shrinks_slopes(spark):
    rng = np.random.RandomState(1)
    x1, x2 = rng.rand(100), rng.rand(100)
    y = 3.0 * x1 + 3.0 * x2
    df = spark.createDataFrame(
        [Row(y=float(a), x1=float(b), x2=float(c)) for a, b, c in zip(y, x1, x2)]
    )
    small = ridge_fit(df, "y", "x1", "x2", lam=0.001).collect()[0]
    big = ridge_fit(df, "y", "x1", "x2", lam=100.0).collect()[0]
    assert abs(big.b1) < abs(small.b1)
    assert abs(big.b2) < abs(small.b2)


def test_platt_matches_numpy_newton(spark):
    rng = np.random.RandomState(3)
    s = rng.rand(300)
    y = (rng.rand(300) < 1 / (1 + np.exp(-(3 * s - 1.5)))).astype(int)
    df = spark.createDataFrame(
        [Row(s=float(a), y=int(b)) for a, b in zip(s, y)]
    )
    got = logistic_platt(df, "s", "y", iterations=6, round_to=7).collect()[0]

    a = b = 0.0
    for _ in range(6):
        p = 1 / (1 + np.exp(-(a * s + b)))
        g1, g2 = ((p - y) * s).sum(), (p - y).sum()
        h11, h12, h22 = (p * (1 - p) * s * s).sum(), (p * (1 - p) * s).sum(), (
            p * (1 - p)
        ).sum()
        det = h11 * h22 - h12 * h12
        a = round(a - (h22 * g1 - h12 * g2) / det, 7)
        b = round(b - (h11 * g2 - h12 * g1) / det, 7)
    assert got.a == a and got.b == b
    assert got.n == 300 and got.n_pos == int(y.sum())
    p = 1 / (1 + np.exp(-(a * s + b)))
    ll = -np.mean(y * np.log(p) + (1 - y) * np.log(1 - p))
    assert abs(got.log_loss - ll) < 1e-6


def test_platt_separable_direction(spark):
    # high scores all positive, low all negative -> a must be positive
    rows = [Row(s=0.9 + 0.01 * i, y=1) for i in range(10)] + [
        Row(s=0.1 + 0.01 * i, y=0) for i in range(10)
    ]
    got = logistic_platt(spark.createDataFrame(rows), "s", "y").collect()[0]
    assert got.a > 0


def test_gini_stump_hand_case(spark):
    # feature 1,2,3,4 with labels 0,0,1,1 -> perfect split at v<=2
    rows = [Row(v=1, y=0), Row(v=2, y=0), Row(v=3, y=1), Row(v=4, y=1)]
    r = gini_stump(spark.createDataFrame(rows), "v", "y").collect()[0]
    assert r.threshold == 2
    assert r.n_left == 2 and r.n_right == 2
    assert r.gini_left == 0.0 and r.gini_right == 0.0 and r.wgini == 0.0


def test_gini_stump_tie_breaks_smallest_threshold(spark):
    # all labels equal: every split has wgini 0 -> smallest threshold wins
    rows = [Row(v=i, y=1) for i in range(5)]
    r = gini_stump(spark.createDataFrame(rows), "v", "y").collect()[0]
    assert r.threshold == 0
    assert r.wgini == 0.0


def test_gini_stump_weighted_impurity_value(spark):
    # v=1: 3 rows 1 pos; v=2: 2 rows 2 pos.  split at 1:
    # left gini = 1 - (1/3)^2 - (2/3)^2 = 4/9; right gini = 0
    # weighted = 3/5 * 4/9 = 4/15
    rows = (
        [Row(v=1, y=1), Row(v=1, y=0), Row(v=1, y=0)]
        + [Row(v=2, y=1), Row(v=2, y=1)]
    )
    r = gini_stump(spark.createDataFrame(rows), "v", "y").collect()[0]
    assert r.threshold == 1
    assert abs(r.gini_left - 4 / 9) < 1e-6
    assert r.gini_right == 0.0
    assert abs(r.wgini - 4 / 15) < 1e-8


def test_pca_power_matches_numpy(spark):
    rng = np.random.RandomState(11)
    # correlated 3-col data with a dominant direction
    z = rng.randn(400)
    data = np.column_stack(
        [z + 0.1 * rng.randn(400), 2 * z + 0.1 * rng.randn(400), rng.randn(400)]
    )
    df = spark.createDataFrame(
        [Row(a=float(r[0]), b=float(r[1]), c=float(r[2])) for r in data]
    )
    from accelerated_intelligent_document_processing_on_aws_spark.operators.mlfit import (
        pca_power_top1,
    )

    got = pca_power_top1(df, ["a", "b", "c"], iterations=12).collect()[0]
    cov = np.cov(data.T, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    v = vecs[:, -1]
    v = v if v[0] >= 0 else -v
    assert got.n == 400
    assert abs(got.eig - vals[-1]) < 1e-4
    for gi, wi in zip((got.v1, got.v2, got.v3), v):
        assert abs(gi - wi) < 1e-3


def test_pca_power_unit_norm_and_sign(spark):
    rng = np.random.RandomState(2)
    data = rng.randn(100, 2) * np.array([3.0, 0.5])
    df = spark.createDataFrame([Row(a=float(r[0]), b=float(r[1])) for r in data])
    from accelerated_intelligent_document_processing_on_aws_spark.operators.mlfit import (
        pca_power_top1,
    )

    got = pca_power_top1(df, ["a", "b"], iterations=10).collect()[0]
    assert abs(got.v1**2 + got.v2**2 - 1.0) < 1e-5
    assert got.v1 >= 0


def test_target_encode_leaves_own_fold_out(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.mlfit import (
        target_encode,
    )

    # single category, labels 0..9; fold means differ, so each fold's
    # encoding must equal the smoothed mean of the OTHER folds' labels
    rows = [Row(id=i, cat="c", y=float(i)) for i in range(10)]
    df = spark.createDataFrame(rows)
    out = target_encode(df, "id", "cat", "y", n_folds=2, smoothing=0.0, seed="z")
    got = {r.fold: r for r in out.collect()}
    # recompute folds with the same hash to know the split
    import hashlib

    def fold(i):
        h = int(hashlib.md5(f"z{i}".encode()).hexdigest()[:15], 16)
        return h % 2

    sums = {0: 0.0, 1: 0.0}
    cnts = {0: 0, 1: 0}
    for i in range(10):
        sums[fold(i)] += i
        cnts[fold(i)] += 1
    for f in (0, 1):
        other = 1 - f
        assert got[f].n_out == cnts[other]
        assert abs(got[f].enc - sums[other] / cnts[other]) < 1e-6


def test_target_encode_smoothing_pulls_to_prior(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.mlfit import (
        target_encode,
    )

    rows = [Row(id=i, cat="a", y=1.0) for i in range(5)] + [
        Row(id=100 + i, cat="b", y=0.0) for i in range(5)
    ]
    df = spark.createDataFrame(rows)
    heavy = target_encode(df, "id", "cat", "y", n_folds=2, smoothing=1e6)
    for r in heavy.collect():
        assert abs(r.enc - 0.5) < 1e-3  # massive smoothing -> prior


def test_hashing_trick_audit_small_domain(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.mlfit import (
        hashing_trick_audit,
    )

    # 3 distinct terms into 1 bucket: all collide
    df = spark.createDataFrame(
        [Row(doc_id=0, text="aa bb cc aa")]
    )
    r = hashing_trick_audit(df, "doc_id", "text", n_buckets=1).collect()[0]
    assert r.n_terms == 3 and r.buckets_used == 1
    assert r.colliding_buckets == 1 and r.max_bucket == 3
    assert r.term_collision_rate == 1.0
    # plenty of buckets: no collisions for 3 terms (md5 spread)
    r2 = hashing_trick_audit(df, "doc_id", "text", n_buckets=1 << 20).collect()[0]
    assert r2.term_collision_rate == 0.0 and r2.buckets_used == 3


def test_huber_resists_outliers_vs_ols(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.mlfit import (
        huber_fit,
    )

    # clean line y = 2x + 1 plus two gross outliers
    rows = [Row(x=float(i), y=2.0 * i + 1.0) for i in range(20)] + [
        Row(x=5.0, y=500.0),
        Row(x=15.0, y=-500.0),
    ]
    df = spark.createDataFrame(rows)
    r = huber_fit(df, "y", "x", c=5.0, iterations=6).collect()[0]
    assert r.n == 22
    # OLS slope would be dragged far off; Huber stays near 2
    assert abs(r.b - 2.0) < 0.3
    assert abs(r.a - 1.0) < 2.0


def test_huber_zero_iterations_is_ols(spark):
    import numpy as np

    from accelerated_intelligent_document_processing_on_aws_spark.operators.mlfit import (
        huber_fit,
    )

    rng = np.random.RandomState(5)
    x = rng.rand(50)
    y = 3.0 * x - 1.0 + 0.1 * rng.randn(50)
    df = spark.createDataFrame(
        [Row(x=float(a), y=float(b)) for a, b in zip(x, y)]
    )
    r = huber_fit(df, "y", "x", c=1e9, iterations=0).collect()[0]
    b, a = np.polyfit(x, y, 1)
    assert abs(r.a - a) < 1e-5 and abs(r.b - b) < 1e-5


def test_ipw_corrects_confounded_naive(spark):
    import numpy as np

    from accelerated_intelligent_document_processing_on_aws_spark.operators.mlfit import (
        ipw_ate,
    )

    # confounded design: high-s rows are mostly treated AND s drives the
    # outcome; the true treatment effect is exactly +2
    rng = np.random.RandomState(8)
    rows = []
    for i in range(2000):
        s = rng.rand()
        t = int(rng.rand() < (0.2 + 0.6 * s))   # propensity rises with s
        y = 10 * s + 2 * t                       # outcome driven by s and t
        rows.append(Row(s=float(s), t=t, y=float(y)))
    df = spark.createDataFrame(rows)
    r = ipw_ate(df, "s", F.col("t") == 1, "y", iterations=6).collect()[0]
    # naive diff is inflated by confounding (treated have higher s)
    assert r.ate_naive > 3.0
    # IPW recovers something close to the true effect of 2
    assert abs(r.ate_ipw - 2.0) < 0.7
    assert r.a > 0  # propensity increases with s


def test_rdd_recovers_known_jump(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.mlfit import (
        rdd_effect,
    )

    # y = 0.5*x below 50, 0.5*x + 7 at/above 50: clean jump of 7
    rows = [
        Row(x=float(v), y=0.5 * v + (7.0 if v >= 50 else 0.0))
        for v in range(20, 81)
    ]
    r = rdd_effect(
        spark.createDataFrame(rows), "x", "y", cutoff=50.0, bandwidth=20.0
    ).collect()[0]
    assert r.n_left == 20 and r.n_right == 21    # [30,49] and [50,70]
    assert abs(r.effect - 7.0) < 1e-6
    assert abs(r.slope_left - 0.5) < 1e-6
    assert abs(r.slope_right - 0.5) < 1e-6


def test_subgroup_wracc_finds_planted_pocket(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.mlfit import (
        subgroup_wracc,
    )

    # base rate 10%, but cat='hot' is 60% positive
    rows = (
        [Row(y=1, c="hot") for _ in range(30)]
        + [Row(y=0, c="hot") for _ in range(20)]
        + [Row(y=1, c="cold") for _ in range(10)]
        + [Row(y=0, c="cold") for _ in range(340)]
    )
    df = spark.createDataFrame(rows)
    top = subgroup_wracc(
        df, F.col("y") == 1, {"cat": F.col("c")}, top_k=1
    ).collect()[0]
    assert (top.feature, top.value) == ("cat", "hot")
    # WRAcc = (50/400) * (0.6 - 0.1) = 0.0625
    assert abs(top.wracc - 0.0625) < 1e-9
    assert top.n == 50 and top.pos == 30


def test_subgroup_wracc_null_values_excluded(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.mlfit import (
        subgroup_wracc,
    )

    rows = [Row(y=1, c="a"), Row(y=0, c=None), Row(y=0, c="a")]
    out = subgroup_wracc(
        spark.createDataFrame(rows), F.col("y") == 1, {"cat": "c"}, top_k=5
    ).collect()
    assert all(r.value is not None for r in out)
    assert sum(r.n for r in out) == 2


def test_smd_balance_ipw_improves_confounded_covariate(spark):
    import numpy as np

    from accelerated_intelligent_document_processing_on_aws_spark.operators.mlfit import (
        smd_balance,
    )

    # s drives treatment, so s is imbalanced between arms; IPW with the
    # true-model propensity must shrink |SMD| substantially
    rng = np.random.RandomState(12)
    rows = []
    for i in range(3000):
        s = rng.rand()
        t = int(rng.rand() < (0.2 + 0.6 * s))
        rows.append(Row(s=float(s), t=t))
    df = spark.createDataFrame(rows)
    out = {
        r.covariate: r
        for r in smd_balance(
            df, "s", F.col("t") == 1, {"svar": F.col("s")}, iterations=6
        ).collect()
    }
    r = out["svar"]
    assert abs(r.smd_raw) > 0.3            # visibly imbalanced
    assert abs(r.smd_ipw) < abs(r.smd_raw) / 2   # weighting balances


def test_iv_2sls_recovers_planted_effect(spark):
    """Deterministic encouragement design: z shifts x; y depends on x
    causally with slope 2 plus a confounder that ALSO enters x, biasing
    OLS upward.  IV recovers 2 exactly because the construction is
    linear and z is independent of the confounder."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.mlfit import (
        iv_2sls,
    )

    rows = []
    for i in range(200):
        z = i % 2
        u = (i // 2) % 5  # confounder, balanced across z
        x = 1.0 + 3.0 * z + 1.0 * u
        y = 2.0 * x + 4.0 * u
        rows.append((float(y), float(x), float(z)))
    df = spark.createDataFrame(rows, ["y", "x", "z"])
    r = iv_2sls(df, "y", "x", "z").collect()[0]
    assert r.n == 200
    assert r.beta_iv == 2.0
    assert r.beta_ols > 2.5  # confounding biases OLS up
    assert r.first_stage_f > 10  # strong instrument


def test_iv_2sls_irrelevant_instrument_null(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.mlfit import (
        iv_2sls,
    )

    rows = [(1.0, 2.0, 1.0), (2.0, 3.0, 1.0), (3.0, 5.0, 1.0),
            (2.5, 4.0, 1.0)]
    r = iv_2sls(
        spark.createDataFrame(rows, ["y", "x", "z"]), "y", "x", "z"
    ).collect()[0]
    assert r.beta_iv is None  # constant instrument: Cov(z,x) = 0
    assert r.beta_ols is not None


def test_lda_fisher2_separable_hand_case(spark):
    import numpy as np

    from accelerated_intelligent_document_processing_on_aws_spark.operators.mlfit import (
        lda_fisher2,
    )

    cls0 = [
        (0, 1.0 + 0.1 * i, 2.0 + 0.07 * ((i * 3) % 5)) for i in range(10)
    ]
    cls1 = [
        (1, 5.0 + 0.1 * i, 6.0 + 0.07 * ((i * 7) % 5)) for i in range(10)
    ]
    rows = cls0 + cls1
    r = lda_fisher2(
        spark.createDataFrame(rows, ["y", "x1", "x2"]), "y", "x1", "x2"
    ).collect()[0]
    assert (r.n, r.n1) == (20, 10)
    assert r.accuracy == 1.0  # linearly separable

    # numpy reference for the weights
    X0 = np.array([(a, b) for _, a, b in cls0])
    X1 = np.array([(a, b) for _, a, b in cls1])
    sw = np.zeros((2, 2))
    for X in (X0, X1):
        d = X - X.mean(0)
        sw += d.T @ d
    w = np.linalg.solve(sw, X1.mean(0) - X0.mean(0))
    assert r.w1 == round(float(w[0]), 6)
    assert r.w2 == round(float(w[1]), 6)


def test_lda_fisher2_singular_scatter_null(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.mlfit import (
        lda_fisher2,
    )

    # x2 = 2*x1 within each class -> scatter singular
    rows = [(0, 1.0, 2.0), (0, 2.0, 4.0), (1, 5.0, 10.0), (1, 6.0, 12.0)]
    r = lda_fisher2(
        spark.createDataFrame(rows, ["y", "x1", "x2"]), "y", "x1", "x2"
    ).collect()[0]
    assert r.w1 is None and r.accuracy is None


def test_mahalanobis_outliers_catches_joint_outlier(spark):
    import numpy as np

    from accelerated_intelligent_document_processing_on_aws_spark.operators.mlfit import (
        mahalanobis_outliers,
    )

    # tight correlated cloud on x2 = x1 + small jitter...
    pts = [(float(i), float(i) + 0.1 * ((i % 3) - 1)) for i in range(20)]
    # ...plus one point inside both marginals but OFF the ridge
    pts.append((5.0, 15.0))
    df = spark.createDataFrame(pts, ["x1", "x2"])
    r = mahalanobis_outliers(df, "x1", "x2").collect()[0]
    assert r.n == 21
    assert r.n_outliers >= 1

    X = np.array(pts)
    mu = X.mean(0)
    cov = np.cov(X.T)
    inv = np.linalg.inv(cov)
    d2 = [(p - mu) @ inv @ (p - mu) for p in X]
    assert r.d2_max == round(float(max(d2)), 6)
    assert r.n_outliers == sum(1 for d in d2 if d > 9.21034)


def test_info_gain_ranking_perfect_vs_noise(spark):
    import math

    from accelerated_intelligent_document_processing_on_aws_spark.operators.mlfit import (
        info_gain_ranking,
    )

    # y determined by f_good; f_noise constant; f_half splits one side
    rows = []
    for i in range(40):
        y = i % 2
        rows.append((y, str(y), "k", str(i % 4 < 2)))
    df = spark.createDataFrame(rows, ["y", "good", "noise", "half"])
    out = {
        r.feature: r
        for r in info_gain_ranking(
            df,
            "y",
            {"good": F.col("good"), "noise": F.col("noise"),
             "half": F.col("half")},
        ).collect()
    }
    assert out["good"].rank == 1
    assert out["good"].ig == round(math.log(2), 6)  # full H(y) recovered
    assert out["noise"].ig == 0.0
    # 'half': y alternates within each half -> no information either
    assert out["half"].ig == 0.0
    assert {out["noise"].rank, out["half"].rank} == {2, 3}


def test_cem_att_hand_case(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.mlfit import (
        cem_att,
    )

    # stratum A: 2 treated (y 10, 12), 1 control (y 5)
    # stratum B: 1 treated (y 20), 2 controls (y 8, 10)
    # stratum C: controls only -> dropped
    rows = [
        ("A", 1, 10.0), ("A", 1, 12.0), ("A", 0, 5.0),
        ("B", 1, 20.0), ("B", 0, 8.0), ("B", 0, 10.0),
        ("C", 0, 99.0), ("C", 0, 99.0),
    ]
    df = spark.createDataFrame(rows, ["s", "t", "y"])
    r = cem_att(df, "t", "y", ["s"]).collect()[0]
    assert (r.n_strata_matched, r.n_treated, r.n_control) == (2, 3, 3)
    # weighted control sum: A: (2/1)*5 = 10 ; B: (1/2)*18 = 9
    att = (10 + 12 + 20) / 3 - (10 + 9) / 3
    assert r.att == round(att, 6)


def test_cem_att_no_overlap_null(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.mlfit import (
        cem_att,
    )

    rows = [("A", 1, 5.0), ("B", 0, 3.0)]
    r = cem_att(
        spark.createDataFrame(rows, ["s", "t", "y"]), "t", "y", ["s"]
    ).collect()[0]
    assert r.n_strata_matched == 0 and r.att is None


def test_cv_r2_simple_matches_explicit_folds(spark):
    import numpy as np

    from accelerated_intelligent_document_processing_on_aws_spark.operators.mlfit import (
        cv_r2_simple,
    )

    rng = np.random.RandomState(4)
    x = rng.rand(100) * 10
    y = 2.0 + 1.5 * x + rng.randn(100)
    rows = [(int(i), float(a), float(b)) for i, (a, b) in enumerate(zip(x, y))]
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    r = cv_r2_simple(
        df, "y", "x", F.col("id") % 3, n_folds=3
    ).collect()[0]

    # explicit reference: refit per fold with numpy
    ids = np.arange(100)
    sst = ((y - y.mean()) ** 2).sum()
    sse = 0.0
    for f in range(3):
        te = ids % 3 == f
        tr = ~te
        b1, b0 = np.polyfit(x[tr], y[tr], 1)
        sse += ((y[te] - (b0 + b1 * x[te])) ** 2).sum()
    assert r.n == 100 and r.k_folds == 3
    assert abs(r.r2_oof - (1 - sse / sst)) < 1e-6  # output rounded at 6
    assert r.r2_in > r.r2_oof  # in-sample always flatters
    assert r.r2_oof > 0.9


def test_cv_r2_degenerate_constant_x(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.mlfit import (
        cv_r2_simple,
    )

    rows = [(i, 1.0, float(i)) for i in range(10)]
    r = cv_r2_simple(
        spark.createDataFrame(rows, ["id", "x", "y"]), "y", "x",
        F.col("id") % 2, n_folds=2,
    ).collect()[0]
    assert r.r2_in is None and r.r2_oof is None
