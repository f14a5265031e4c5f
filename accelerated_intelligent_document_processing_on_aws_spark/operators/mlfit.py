"""Distributed model fitting as pure aggregation algebra.

Three classic fits a curation pipeline runs over scored corpora, each
expressed so the 100 TB side is touched only by map-side-combining
aggregates — no gradient loops over collected data, no Python in the hot
path, and every trajectory pinned to a per-iteration rounding grid (the
``bradley_terry``/``pagerank`` discipline) so a fixed-iteration result is
a pure function of the input in ANY engine:

* ``ridge_fit`` — 2-feature ridge regression via the normal equations:
  ONE aggregate collects the 9 second-order moments, Cramer's rule
  solves the 3x3 system in closed form, and R² comes from the same
  moments — the whole fit is a single pass however large the input.
* ``logistic_platt`` — Platt-style sigmoid calibration (Platt 1999)
  ``P(y=1|s) = sigmoid(a*s + b)`` by Newton-Raphson with a closed-form
  2x2 Hessian solve; each iteration is one aggregate over the data with
  the current ``(a, b)`` broadcast in.
* ``gini_stump`` — the best single-threshold split of a numeric feature
  against a binary label (CART's unit step): per-distinct-value counts
  aggregate once, a running-sum window over that BOUNDED frame scores
  every candidate threshold, and the argmin is a top-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ridge_fit(
    df: DataFrame,
    y_col,
    x1_col,
    x2_col,
    lam: float = 1.0,
    round_to: int = 9,
) -> DataFrame:
    """Ridge regression ``y ~ b0 + b1*x1 + b2*x2`` with L2 penalty
    ``lam`` on the slopes (never the intercept).  Returns one row:
    ``n, b0, b1, b2, r2``.

    Coefficients are rounded at ``round_to`` BEFORE the R² algebra so
    both halves of a differential check score the identical model.
    Plan: one map-side-combining aggregate over the input; everything
    after operates on that single row.
    """
    y = F.col(y_col) if isinstance(y_col, str) else y_col
    x1 = F.col(x1_col) if isinstance(x1_col, str) else x1_col
    x2 = F.col(x2_col) if isinstance(x2_col, str) else x2_col
    base = df.select(
        y.cast("double").alias("_y"),
        x1.cast("double").alias("_x1"),
        x2.cast("double").alias("_x2"),
    ).filter(
        F.col("_y").isNotNull()
        & F.col("_x1").isNotNull()
        & F.col("_x2").isNotNull()
    )
    m = base.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("_x1").alias("s1"),
        F.sum("_x2").alias("s2"),
        F.sum("_y").alias("sy"),
        F.sum(F.expr("_x1 * _x1")).alias("s11"),
        F.sum(F.expr("_x1 * _x2")).alias("s12"),
        F.sum(F.expr("_x2 * _x2")).alias("s22"),
        F.sum(F.expr("_x1 * _y")).alias("s1y"),
        F.sum(F.expr("_x2 * _y")).alias("s2y"),
        F.sum(F.expr("_y * _y")).alias("syy"),
    )
    lam_s = repr(float(lam))
    # Cramer's rule on [[n,s1,s2],[s1,s11+lam,s12],[s2,s12,s22+lam]]
    solved = m.select(
        "*",
        F.expr(
            f"n * ((s11 + {lam_s}) * (s22 + {lam_s}) - s12 * s12)"
            f" - s1 * (s1 * (s22 + {lam_s}) - s12 * s2)"
            f" + s2 * (s1 * s12 - (s11 + {lam_s}) * s2)"
        ).alias("_det"),
    ).select(
        "*",
        F.expr(
            f"(sy * ((s11 + {lam_s}) * (s22 + {lam_s}) - s12 * s12)"
            f" - s1 * (s1y * (s22 + {lam_s}) - s12 * s2y)"
            f" + s2 * (s1y * s12 - (s11 + {lam_s}) * s2y)) / _det"
        ).alias("_b0"),
        F.expr(
            f"(n * (s1y * (s22 + {lam_s}) - s12 * s2y)"
            f" - sy * (s1 * (s22 + {lam_s}) - s12 * s2)"
            f" + s2 * (s1 * s2y - s1y * s2)) / _det"
        ).alias("_b1"),
        F.expr(
            f"(n * ((s11 + {lam_s}) * s2y - s1y * s12)"
            f" - s1 * (s1 * s2y - s1y * s2)"
            f" + sy * (s1 * s12 - (s11 + {lam_s}) * s2)) / _det"
        ).alias("_b2"),
    )
    rounded = solved.select(
        "*",
        F.round("_b0", round_to).alias("b0"),
        F.round("_b1", round_to).alias("b1"),
        F.round("_b2", round_to).alias("b2"),
    )
    return rounded.select(
        F.col("n").cast("long").alias("n"),
        "b0",
        "b1",
        "b2",
        F.round(
            F.lit(1.0)
            - (
                F.expr(
                    "syy - 2 * (b0 * sy + b1 * s1y + b2 * s2y)"
                    " + (b0 * b0 * n + b1 * b1 * s11 + b2 * b2 * s22"
                    "    + 2 * b0 * b1 * s1 + 2 * b0 * b2 * s2"
                    "    + 2 * b1 * b2 * s12)"
                )
            )
            / F.expr("syy - sy * sy / n"),
            6,
        ).alias("r2"),
    )


def fit_logistic_params(
    base: DataFrame,
    iterations: int,
    round_to: int,
) -> DataFrame:
    """Shared Newton-Raphson engine behind :func:`logistic_platt` and
    :func:`ipw_ate`: ``base`` must carry ``_s`` (double score) and
    ``_y`` (int 0/1 label); returns the 1-row ``(a, b)`` parameter
    frame after ``iterations`` rounded steps from (0, 0).  Each step is
    one aggregate with the current parameters broadcast in; lineage is
    truncated per step."""
    params = base.sparkSession.createDataFrame(
        [(0.0, 0.0)], "a double, b double"
    )
    for _ in range(int(iterations)):
        scored = base.crossJoin(F.broadcast(params)).select(
            "_s",
            "_y",
            F.expr("1.0 / (1.0 + exp(-(a * _s + b)))").alias("_p"),
            "a",
            "b",
        )
        g = scored.groupBy("a", "b").agg(
            F.sum(F.expr("(_p - _y) * _s")).alias("g1"),
            F.sum(F.expr("_p - _y")).alias("g2"),
            F.sum(F.expr("_p * (1.0 - _p) * _s * _s")).alias("h11"),
            F.sum(F.expr("_p * (1.0 - _p) * _s")).alias("h12"),
            F.sum(F.expr("_p * (1.0 - _p)")).alias("h22"),
        )
        params = (
            g.select(
                "*",
                F.expr("h11 * h22 - h12 * h12").alias("_det"),
            )
            .select(
                F.round(
                    F.expr("a - (h22 * g1 - h12 * g2) / _det"), round_to
                ).alias("a"),
                F.round(
                    F.expr("b - (h11 * g2 - h12 * g1) / _det"), round_to
                ).alias("b"),
            )
            .localCheckpoint(eager=False)
        )
    return params


def logistic_platt(
    df: DataFrame,
    score_col,
    label_col,
    iterations: int = 6,
    round_to: int = 7,
) -> DataFrame:
    """Fit ``P(y=1|s) = 1/(1+exp(-(a*s+b)))`` by ``iterations`` Newton
    steps from ``(a, b) = (0, 0)``, rounding the parameters at
    ``round_to`` decimals after every step so the trajectory is
    engine-portable (sub-rounding float noise from differing ``exp``
    ULPs cannot accumulate).  Returns one row:
    ``n, n_pos, a, b, log_loss`` (log-loss of the final model, natural
    log, rounded at 6).

    Each step is one aggregate over the data — gradient and 2x2 Hessian
    entries — with the current parameters broadcast in; the solve is
    closed-form.  Lineage is truncated per step.
    """
    s = F.col(score_col) if isinstance(score_col, str) else score_col
    y = F.col(label_col) if isinstance(label_col, str) else label_col
    base = df.select(
        s.cast("double").alias("_s"), y.cast("int").alias("_y")
    ).filter(F.col("_s").isNotNull() & F.col("_y").isNotNull())
    params = fit_logistic_params(base, iterations, round_to)
    return (
        base.crossJoin(F.broadcast(params))
        .select(
            "_y",
            "a",
            "b",
            F.expr("1.0 / (1.0 + exp(-(a * _s + b)))").alias("_p"),
        )
        .groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_y").cast("long").alias("n_pos"),
            F.round(
                -F.avg(
                    F.expr("_y * ln(_p) + (1 - _y) * ln(1.0 - _p)")
                ),
                6,
            ).alias("log_loss"),
        )
        .select("n", "n_pos", "a", "b", "log_loss")
    )


def gini_stump(
    df: DataFrame,
    feature_col,
    label_col,
) -> DataFrame:
    """The best single split ``feature <= t`` of a numeric feature
    against a binary label by weighted Gini impurity — CART's unit
    decision, the fastest signal for "does this scalar separate good
    from bad documents".  Candidate thresholds are the distinct feature
    values (bin continuous features upstream; the per-value aggregate
    must stay bounded).  Returns one row:
    ``threshold, n_left, n_right, gini_left, gini_right, wgini``
    with ties broken toward the smallest threshold.

    Plan: one groupBy(value) aggregate over the input, then a running
    sum over the distinct-value frame (bounded, single partition by
    construction) and a top-1 — the raw data is never re-scanned.
    """
    x = F.col(feature_col) if isinstance(feature_col, str) else feature_col
    y = F.col(label_col) if isinstance(label_col, str) else label_col
    per = (
        df.select(x.alias("_v"), y.cast("int").alias("_y"))
        .filter(F.col("_v").isNotNull() & F.col("_y").isNotNull())
        .groupBy("_v")
        .agg(F.count(F.lit(1)).alias("_c"), F.sum("_y").alias("_p"))
    )
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    cum = per.select(
        "_v",
        F.sum("_c").over(w).alias("nl"),
        F.sum("_p").over(w).alias("pl"),
    )
    tot = per.agg(
        F.sum("_c").alias("nt"), F.sum("_p").alias("pt")
    )
    scored = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("nl") < F.col("nt"))  # right side must be nonempty
        .select(
            F.col("_v").alias("threshold"),
            F.col("nl").alias("n_left"),
            (F.col("nt") - F.col("nl")).alias("n_right"),
            F.round(
                F.expr(
                    "1.0 - (pl / CAST(nl AS DOUBLE)) * (pl / nl)"
                    " - ((nl - pl) / CAST(nl AS DOUBLE)) * ((nl - pl) / nl)"
                ),
                6,
            ).alias("gini_left"),
            F.round(
                F.expr(
                    "1.0 - ((pt - pl) / CAST(nt - nl AS DOUBLE)) * ((pt - pl) / (nt - nl))"
                    " - ((nt - nl - pt + pl) / CAST(nt - nl AS DOUBLE))"
                    "   * ((nt - nl - pt + pl) / (nt - nl))"
                ),
                6,
            ).alias("gini_right"),
            F.round(
                F.expr(
                    "((nl * (1.0 - (pl / CAST(nl AS DOUBLE)) * (pl / nl)"
                    "        - ((nl - pl) / CAST(nl AS DOUBLE)) * ((nl - pl) / nl)))"
                    " + ((nt - nl) * (1.0"
                    "        - ((pt - pl) / CAST(nt - nl AS DOUBLE)) * ((pt - pl) / (nt - nl))"
                    "        - ((nt - nl - pt + pl) / CAST(nt - nl AS DOUBLE))"
                    "          * ((nt - nl - pt + pl) / (nt - nl))))) / nt"
                ),
                9,
            ).alias("wgini"),
        )
    )
    return scored.orderBy(F.asc("wgini"), F.asc("threshold")).limit(1)


def pca_power_top1(
    df: DataFrame,
    cols: list,
    iterations: int = 8,
    round_to: int = 9,
) -> DataFrame:
    """Leading principal component of up to a handful of numeric columns
    by power iteration over the AGGREGATED covariance matrix: one
    map-side-combining pass collects the d + d(d+1)/2 moments (d = number
    of columns), the covariance is closed-form algebra on that single
    row, and the d-vector iteration runs entirely on the 1-row frame —
    zero further passes over the data, however many iterations.

    The trajectory is engine-portable: the iterate is L2-normalized and
    rounded at ``round_to`` after every step (the ``bradley_terry``
    discipline), starting from the all-equal unit vector; the sign is
    fixed by making the first component non-negative at the end.

    Returns one row: ``n``, ``eig`` (Rayleigh quotient of the final
    iterate, rounded at 6) and ``v1..vd`` (components, rounded at 6).
    Callers should pre-scale columns to comparable magnitude — PCA is
    not scale-invariant and huge moments cost float precision.
    """
    d = len(cols)
    names = [f"_x{i}" for i in range(d)]
    base = df.select(
        *[
            (F.col(c) if isinstance(c, str) else c)
            .cast("double")
            .alias(n)
            for c, n in zip(cols, names)
        ]
    )
    base = base.filter(
        F.lit(True)
        if d == 0
        else F.expr(" AND ".join(f"{n} IS NOT NULL" for n in names))
    )
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    aggs += [F.sum(n).alias(f"s{i}") for i, n in enumerate(names)]
    for i in range(d):
        for j in range(i, d):
            aggs.append(
                F.sum(F.expr(f"_x{i} * _x{j}")).alias(f"s{i}{j}")
            )
    m = base.agg(*aggs)
    # covariance entries (population normalization, n not n-1)
    cov_cols = []
    for i in range(d):
        for j in range(i, d):
            cov_cols.append(
                F.expr(f"(s{i}{j} - s{i} * s{j} / n) / n").alias(f"c{i}{j}")
            )
    cur = m.select("n", *cov_cols)

    def c(i: int, j: int) -> str:
        return f"c{min(i, j)}{max(i, j)}"

    start = repr(round(1.0 / d**0.5, round_to))
    cur = cur.select(
        "*", *[F.expr(start).alias(f"v{i}") for i in range(d)]
    )
    for _ in range(int(iterations)):
        mv = [
            " + ".join(f"{c(i, j)} * v{j}" for j in range(d))
            for i in range(d)
        ]
        stepped = cur.select(
            "*", *[F.expr(e).alias(f"_w{i}") for i, e in enumerate(mv)]
        ).select(
            "*",
            F.expr(
                "sqrt(" + " + ".join(f"_w{i} * _w{i}" for i in range(d)) + ")"
            ).alias("_nrm"),
        )
        keep = ["n"] + [c(i, j) for i in range(d) for j in range(i, d)]
        cur = stepped.select(
            *keep,
            *[
                F.round(F.expr(f"_w{i} / _nrm"), round_to).alias(f"v{i}")
                for i in range(d)
            ],
        )
    # Rayleigh quotient + sign convention (first component >= 0)
    quad = " + ".join(
        f"{'2 * ' if i != j else ''}{c(i, j)} * v{i} * v{j}"
        for i in range(d)
        for j in range(i, d)
    )
    signed = cur.select(
        "n",
        F.round(F.expr(quad), 6).alias("eig"),
        *[
            F.round(
                F.expr(f"CASE WHEN v0 < 0 THEN -v{i} ELSE v{i} END"), 6
            ).alias(f"v{i + 1}")
            for i in range(d)
        ],
    )
    return signed.select(
        F.col("n").cast("long").alias("n"),
        "eig",
        *[f"v{i + 1}" for i in range(d)],
    )


def target_encode(
    df: DataFrame,
    id_col: str,
    cat_col: str,
    label_col,
    n_folds: int = 5,
    smoothing: float = 10.0,
    seed: str = "te",
    round_to: int = 6,
) -> DataFrame:
    """Leakage-safe K-fold target encoding (the Kaggle/CatBoost recipe):
    each category's encoding for fold ``f`` is the label mean computed
    from the OTHER folds only, shrunk toward the global prior by
    ``smoothing`` pseudo-counts -- a row never sees its own label, so
    the encoded feature can't leak the target into training.

    Folds are ``md5(seed || id) mod n_folds`` -- a pure function of the
    input (stable across engines, reruns, resumes), the same discipline
    as ``dedup.sample_hash``.

    Returns the ENCODING TABLE ``(cat, fold, n_out, enc)`` -- categories
    x folds rows, the artifact a trainer broadcast-joins onto the data
    -- where ``n_out`` is the out-of-fold row count backing the mean.
    Categories entirely absent outside a fold encode to the prior.

    Plan: one (cat, fold) aggregate over the data; everything after
    runs on that bounded frame (totals ride a window per cat, the
    global prior a size-1 broadcast).
    """
    y = F.col(label_col) if isinstance(label_col, str) else label_col
    base = df.select(
        F.col(cat_col).cast("string").alias("cat"),
        y.cast("double").alias("_y"),
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(seed), F.col(id_col).cast("string")
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(int(n_folds)),
        ).alias("fold"),
    ).filter(F.col("_y").isNotNull())
    per = base.groupBy("cat", "fold").agg(
        F.sum("_y").alias("s"), F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("cat")
    tot = per.select(
        "cat",
        "fold",
        "s",
        "c",
        F.sum("s").over(w).alias("ts"),
        F.sum("c").over(w).alias("tc"),
    )
    prior = base.agg(F.avg("_y").alias("prior"))
    m = float(smoothing)
    return (
        tot.join(F.broadcast(prior), F.lit(True))
        .select(
            "cat",
            F.col("fold").cast("int").alias("fold"),
            (F.col("tc") - F.col("c")).alias("n_out"),
            F.round(
                (F.col("ts") - F.col("s") + F.lit(m) * F.col("prior"))
                / ((F.col("tc") - F.col("c")).cast("double") + F.lit(m)),
                round_to,
            ).alias("enc"),
        )
    )


def hashing_trick_audit(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 4096,
    round_to: int = 6,
) -> DataFrame:
    """Collision audit for the feature-hashing trick (Weinberger et al.
    2009): map every distinct corpus term into ``n_buckets`` via the
    engine-portable md5 bucket hash and measure how much signal the
    collisions smear -- the question to answer BEFORE shipping a hashed
    bag-of-words at 10^9-term scale.

    Returns one row: ``n_terms, n_buckets, buckets_used, colliding_
    buckets, max_bucket, term_collision_rate`` (fraction of terms that
    share their bucket with at least one other term).

    Plan: token explode -> distinct terms (map-side combined) -> bucket
    aggregate -> one aggregate over the bucket-bounded frame.
    """
    from .corpus import _token_rows

    terms = (
        _token_rows(df, id_col, text_col).select("term").distinct()
    )
    buckets = terms.select(
        F.pmod(
            F.conv(F.substring(F.md5("term"), 1, 15), 16, 10).cast("long"),
            F.lit(int(n_buckets)),
        ).alias("bucket")
    ).groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))
    return buckets.agg(
        F.sum("c").alias("n_terms"),
        F.lit(int(n_buckets)).alias("n_buckets"),
        F.count(F.lit(1)).alias("buckets_used"),
        F.sum((F.col("c") > 1).cast("long")).alias("colliding_buckets"),
        F.max("c").alias("max_bucket"),
        F.round(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0)))
            / F.sum("c").cast("double"),
            round_to,
        ).alias("term_collision_rate"),
    )


def huber_fit(
    df: DataFrame,
    y_col,
    x_col,
    c: float = 1.345,
    iterations: int = 4,
    round_to: int = 7,
) -> DataFrame:
    """Huber-loss robust line fit ``y ~ a + b*x`` by IRLS (Huber 1964):
    residuals beyond ``c`` get weight ``c/|r|`` instead of 1, so a few
    corrupted labels bend the fit far less than OLS -- the middle ground
    between q_ols_trend (efficient, fragile) and q_theil_sen (25%
    breakdown, quadratic pairs).  The threshold ``c`` is FIXED (no
    per-iteration scale re-estimation) to keep the trajectory a pure
    closed-form function of the input; pick it on the label's scale.

    Each of ``iterations`` rounds is ONE weighted-moment aggregate over
    the data with the current ``(a, b)`` broadcast in, solved 2x2 in
    closed form and rounded at ``round_to`` (the ``logistic_platt``
    portability discipline).  Starts from OLS (iteration 0 = all weights
    1).  Returns one row: ``n, a, b`` .
    """
    y = F.col(y_col) if isinstance(y_col, str) else y_col
    x = F.col(x_col) if isinstance(x_col, str) else x_col
    base = df.select(
        y.cast("double").alias("_y"), x.cast("double").alias("_x")
    ).filter(F.col("_y").isNotNull() & F.col("_x").isNotNull())
    c_s = repr(float(c))
    params = None
    for it in range(int(iterations) + 1):
        if params is None:
            scored = base.select(
                "_y", "_x", F.lit(1.0).alias("_w")
            ).withColumn("a", F.lit(0.0)).withColumn("b", F.lit(0.0))
        else:
            scored = base.crossJoin(F.broadcast(params)).select(
                "_y",
                "_x",
                F.expr(
                    f"CASE WHEN abs(_y - a - b * _x) <= {c_s} THEN 1.0"
                    f" ELSE {c_s} / abs(_y - a - b * _x) END"
                ).alias("_w"),
                "a",
                "b",
            )
        m = scored.groupBy("a", "b").agg(
            F.sum("_w").alias("sw"),
            F.sum(F.expr("_w * _x")).alias("sx"),
            F.sum(F.expr("_w * _y")).alias("sy"),
            F.sum(F.expr("_w * _x * _x")).alias("sxx"),
            F.sum(F.expr("_w * _x * _y")).alias("sxy"),
        )
        params = m.select(
            F.round(
                F.expr(
                    "(sy * sxx - sx * sxy) / (sw * sxx - sx * sx)"
                ),
                round_to,
            ).alias("a"),
            F.round(
                F.expr(
                    "(sw * sxy - sx * sy) / (sw * sxx - sx * sx)"
                ),
                round_to,
            ).alias("b"),
        ).localCheckpoint(eager=False)
    n = base.agg(F.count(F.lit(1)).alias("n"))
    return n.join(F.broadcast(params), F.lit(True)).select("n", "a", "b")


def ipw_ate(
    df: DataFrame,
    score_col,
    treat_col,
    outcome_col,
    iterations: int = 4,
    clip: float = 0.01,
    round_to: int = 6,
) -> DataFrame:
    """Inverse-propensity-weighted average treatment effect (Horvitz-
    Thompson weighting): fit the propensity ``P(treat | score)`` with
    the shared Newton logistic engine, clip it to ``[clip, 1 - clip]``
    (the standard positivity guard), and estimate
    ``ATE = mean(t*y/p) - mean((1-t)*y/(1-p))`` -- the observational
    counterpart of a randomized diff, completing the causal suite next
    to q_cuped (variance reduction), q_did (baseline removal) and
    q_cmh (stratified pooling).

    Returns one row: ``n, a, b, ate_ipw, ate_naive`` (the unadjusted
    mean difference, for contrast).  Plan: ``iterations`` propensity
    aggregates plus ONE weighted final aggregate, parameters broadcast.
    """
    s = F.col(score_col) if isinstance(score_col, str) else score_col
    t = F.col(treat_col) if isinstance(treat_col, str) else treat_col
    y = F.col(outcome_col) if isinstance(outcome_col, str) else outcome_col
    base = df.select(
        s.cast("double").alias("_s"),
        t.cast("int").alias("_y"),       # treat is the logistic LABEL
        y.cast("double").alias("_out"),
    ).filter(
        F.col("_s").isNotNull()
        & F.col("_y").isNotNull()
        & F.col("_out").isNotNull()
    )
    params = fit_logistic_params(
        base.select("_s", "_y"), iterations, 7
    )
    c_lo, c_hi = repr(float(clip)), repr(1.0 - float(clip))
    scored = base.crossJoin(F.broadcast(params)).select(
        "_y",
        "_out",
        "a",
        "b",
        F.expr(
            f"least(greatest(1.0 / (1.0 + exp(-(a * _s + b))), {c_lo}),"
            f" {c_hi})"
        ).alias("_p"),
    )
    return (
        scored.groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.avg(F.expr("_y * _out / _p"))
                - F.avg(F.expr("(1 - _y) * _out / (1.0 - _p)")),
                round_to,
            ).alias("ate_ipw"),
            F.round(
                F.sum(F.expr("_y * _out")) / F.sum("_y")
                - F.sum(F.expr("(1 - _y) * _out"))
                / F.sum(F.expr("1 - _y")),
                round_to,
            ).alias("ate_naive"),
        )
        .select("n", "a", "b", "ate_ipw", "ate_naive")
    )


def rdd_effect(
    df: DataFrame,
    running_col,
    outcome_col,
    cutoff: float,
    bandwidth: float,
    round_to: int = 6,
) -> DataFrame:
    """Sharp regression-discontinuity estimate: local linear fits of
    the outcome on the centered running variable on each side of
    ``cutoff`` within ``bandwidth``, effect = the jump between the two
    intercepts AT the cutoff -- the design for "treatment switches on
    at a threshold" (score gates, eligibility cliffs).

    Rows with ``running == cutoff`` belong to the RIGHT (treated) side,
    the standard sharp-RDD convention.  Returns one row:
    ``n_left, n_right, a_left, a_right, slope_left, slope_right,
    effect``.  ONE aggregate collects both sides' OLS moments via
    conditional sums; the solves are closed-form.
    """
    x = F.col(running_col) if isinstance(running_col, str) else running_col
    y = F.col(outcome_col) if isinstance(outcome_col, str) else outcome_col
    c, h = float(cutoff), float(bandwidth)
    base = df.select(
        (x.cast("double") - F.lit(c)).alias("_x"),
        y.cast("double").alias("_y"),
    ).filter(
        F.col("_x").isNotNull()
        & F.col("_y").isNotNull()
        & (F.abs(F.col("_x")) <= h)
    )
    sides = []
    for name, cond in (("l", "_x < 0"), ("r", "_x >= 0")):
        sides += [
            F.sum(F.expr(f"CASE WHEN {cond} THEN 1.0 ELSE 0.0 END")).alias(
                f"n_{name}"
            ),
            F.sum(F.expr(f"CASE WHEN {cond} THEN _x ELSE 0.0 END")).alias(
                f"sx_{name}"
            ),
            F.sum(F.expr(f"CASE WHEN {cond} THEN _y ELSE 0.0 END")).alias(
                f"sy_{name}"
            ),
            F.sum(
                F.expr(f"CASE WHEN {cond} THEN _x * _x ELSE 0.0 END")
            ).alias(f"sxx_{name}"),
            F.sum(
                F.expr(f"CASE WHEN {cond} THEN _x * _y ELSE 0.0 END")
            ).alias(f"sxy_{name}"),
        ]
    m = base.agg(*sides)
    fit = m.select(
        "*",
        F.expr(
            "(sy_l * sxx_l - sx_l * sxy_l) / (n_l * sxx_l - sx_l * sx_l)"
        ).alias("_al"),
        F.expr(
            "(n_l * sxy_l - sx_l * sy_l) / (n_l * sxx_l - sx_l * sx_l)"
        ).alias("_bl"),
        F.expr(
            "(sy_r * sxx_r - sx_r * sxy_r) / (n_r * sxx_r - sx_r * sx_r)"
        ).alias("_ar"),
        F.expr(
            "(n_r * sxy_r - sx_r * sy_r) / (n_r * sxx_r - sx_r * sx_r)"
        ).alias("_br"),
    )
    return fit.select(
        F.col("n_l").cast("long").alias("n_left"),
        F.col("n_r").cast("long").alias("n_right"),
        F.round("_al", round_to).alias("a_left"),
        F.round("_ar", round_to).alias("a_right"),
        F.round("_bl", round_to).alias("slope_left"),
        F.round("_br", round_to).alias("slope_right"),
        F.round(F.expr("_ar - _al"), round_to).alias("effect"),
    )


def subgroup_wracc(
    df: DataFrame,
    target_col,
    features: dict,
    top_k: int = 5,
    round_to: int = 9,
) -> DataFrame:
    """One-level subgroup discovery by weighted relative accuracy
    (Lavrač et al. 2004): for every candidate subgroup
    ``feature = value``, ``WRAcc = (n_g / N) * (p_g - p_0)`` -- the
    coverage-weighted lift that finds WHERE a binary target
    concentrates ("purchases cluster in payload decile 7") without a
    model.  The interpretable sibling of :func:`gini_stump` for
    categorical descriptors.

    ``features`` maps descriptor name -> Column (values are cast to
    string).  Returns the global ``top_k`` subgroups:
    ``(feature, value, n, pos, rate, wracc)``, ties broken by
    (feature, value).

    Plan: the descriptors stack into rows IN the first projection (one
    pass over the data, rows x n_features), one map-side-combined
    aggregate to the descriptor-value dimension, global totals riding a
    window over that bounded frame, then a top-k.
    """
    t = F.col(target_col) if isinstance(target_col, str) else target_col
    names = sorted(features)
    stack_args = []
    for name in names:
        c = features[name]
        c = F.col(c) if isinstance(c, str) else c
        stack_args += [F.lit(name), c.cast("string")]
    base = df.select(
        t.cast("int").alias("_y"),
        F.stack(F.lit(len(names)), *stack_args).alias("feature", "value"),
    ).filter(F.col("value").isNotNull() & F.col("_y").isNotNull())
    per = base.groupBy("feature", "value").agg(
        F.count(F.lit(1)).alias("n"), F.sum("_y").alias("pos")
    )
    w = Window.partitionBy("feature")
    scored = per.select(
        "feature",
        "value",
        "n",
        F.col("pos").cast("long").alias("pos"),
        F.sum("n").over(w).alias("_N"),
        F.sum("pos").over(w).alias("_P"),
    ).select(
        "feature",
        "value",
        "n",
        "pos",
        F.round(F.col("pos") / F.col("n").cast("double"), round_to).alias(
            "rate"
        ),
        F.round(
            (F.col("n") / F.col("_N").cast("double"))
            * (
                F.col("pos") / F.col("n").cast("double")
                - F.col("_P") / F.col("_N").cast("double")
            ),
            round_to,
        ).alias("wracc"),
    )
    return scored.orderBy(
        F.desc("wracc"), F.asc("feature"), F.asc("value")
    ).limit(int(top_k))


def smd_balance(
    df: DataFrame,
    score_col,
    treat_col,
    covariates: dict,
    iterations: int = 4,
    clip: float = 0.01,
    round_to: int = 6,
) -> DataFrame:
    """Covariate-balance audit for :func:`ipw_ate` (standardized mean
    differences, the Austin 2009 diagnostic): per covariate, the SMD
    ``(mean_t - mean_c) / sqrt((var_t + var_c) / 2)`` BEFORE weighting
    and AFTER inverse-propensity weighting -- the check that the
    propensity model actually balanced the arms (|SMD| < 0.1 is the
    usual bar).  An ATE whose balance audit fails is not an estimate,
    it is a prayer.

    ``covariates`` maps name -> Column.  Returns one row per covariate:
    ``(covariate, smd_raw, smd_ipw)``.  Population variances; weighted
    moments use ``w = t/p + (1-t)/(1-p)`` with the clipped propensity.

    Plan: the shared Newton propensity fit (one aggregate per step),
    then the covariates stack in a single projection and ONE aggregate
    collects all per-arm raw and weighted moments.
    """
    s = F.col(score_col) if isinstance(score_col, str) else score_col
    t = F.col(treat_col) if isinstance(treat_col, str) else treat_col
    names = sorted(covariates)
    stack_args = []
    for name in names:
        c = covariates[name]
        c = F.col(c) if isinstance(c, str) else c
        stack_args += [F.lit(name), c.cast("double")]
    base = df.select(
        s.cast("double").alias("_s"),
        t.cast("int").alias("_y"),
        F.stack(F.lit(len(names)), *stack_args).alias("cov", "x"),
    ).filter(
        F.col("_s").isNotNull()
        & F.col("_y").isNotNull()
        & F.col("x").isNotNull()
    )
    fit_base = df.select(
        s.cast("double").alias("_s"), t.cast("int").alias("_y")
    ).filter(F.col("_s").isNotNull() & F.col("_y").isNotNull())
    params = fit_logistic_params(fit_base, iterations, 7)
    c_lo, c_hi = repr(float(clip)), repr(1.0 - float(clip))
    scored = base.crossJoin(F.broadcast(params)).select(
        "cov",
        "x",
        "_y",
        F.expr(
            f"CASE WHEN _y = 1"
            f" THEN 1.0 / least(greatest(1.0 / (1.0 + exp(-(a * _s + b))),"
            f" {c_lo}), {c_hi})"
            f" ELSE 1.0 / (1.0 - least(greatest("
            f"1.0 / (1.0 + exp(-(a * _s + b))), {c_lo}), {c_hi})) END"
        ).alias("_w"),
    )
    per = scored.groupBy("cov").agg(
        # raw per-arm moments
        F.sum(F.expr("CAST(_y AS DOUBLE)")).alias("nt"),
        F.sum(F.expr("CAST(1 - _y AS DOUBLE)")).alias("nc"),
        F.sum(F.expr("_y * x")).alias("sxt"),
        F.sum(F.expr("(1 - _y) * x")).alias("sxc"),
        F.sum(F.expr("_y * x * x")).alias("sxxt"),
        F.sum(F.expr("(1 - _y) * x * x")).alias("sxxc"),
        # weighted per-arm moments
        F.sum(F.expr("_y * _w")).alias("wt"),
        F.sum(F.expr("(1 - _y) * _w")).alias("wc"),
        F.sum(F.expr("_y * _w * x")).alias("wxt"),
        F.sum(F.expr("(1 - _y) * _w * x")).alias("wxc"),
        F.sum(F.expr("_y * _w * x * x")).alias("wxxt"),
        F.sum(F.expr("(1 - _y) * _w * x * x")).alias("wxxc"),
    )
    return per.select(
        F.col("cov").alias("covariate"),
        F.round(
            F.expr(
                "(sxt / nt - sxc / nc)"
                " / sqrt(((sxxt / nt - (sxt / nt) * (sxt / nt))"
                "        + (sxxc / nc - (sxc / nc) * (sxc / nc))) / 2.0)"
            ),
            round_to,
        ).alias("smd_raw"),
        F.round(
            F.expr(
                "(wxt / wt - wxc / wc)"
                " / sqrt(((wxxt / wt - (wxt / wt) * (wxt / wt))"
                "        + (wxxc / wc - (wxc / wc) * (wxc / wc))) / 2.0)"
            ),
            round_to,
        ).alias("smd_ipw"),
    )


def iv_2sls(
    df: DataFrame,
    outcome_col: str,
    treatment_col: str,
    instrument_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Instrumental-variable estimate (two-stage least squares /
    Wald, one endogenous regressor, one instrument): when treatment x
    is self-selected (engagement drives spend AND spend-prone users
    engage more), the OLS slope is biased; a variable z that moves x
    but touches y only THROUGH x identifies the causal slope
    ``β_IV = Cov(z,y)/Cov(z,x)`` (Wright 1928).

    Also reports the naive OLS slope (the bias readout is the gap) and
    the first-stage F statistic — the weak-instrument diagnostic
    (F < 10 by the Staiger-Stock rule of thumb means β_IV is not
    trustworthy; consumers must check it).

    Returns ONE row: ``n, beta_ols, beta_iv, first_stage_f`` (β_IV
    NULL when Cov(z,x) = 0 — instrument irrelevant; F NULL when n < 3
    or the first-stage residual variance is 0).

    Plan: ONE corpus moment aggregate (no per-row Python, map-side
    combined); every estimate is closed-form algebra on the 1-row
    moment frame — the same shape as ridge_fit / ols_trend.
    """
    y = F.col(outcome_col).cast("double")
    x = F.col(treatment_col).cast("double")
    z = F.col(instrument_col).cast("double")
    d = df.filter(y.isNotNull() & x.isNotNull() & z.isNotNull())
    a = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(z).alias("sz"),
        F.sum(x * x).alias("sxx"),
        F.sum(z * z).alias("szz"),
        F.sum(x * y).alias("sxy"),
        F.sum(z * y).alias("szy"),
        F.sum(z * x).alias("szx"),
    )
    n = F.col("n").cast("double")
    cxx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    czz = F.col("szz") - F.col("sz") * F.col("sz") / n
    cxy = F.col("sxy") - F.col("sx") * F.col("sy") / n
    czy = F.col("szy") - F.col("sz") * F.col("sy") / n
    czx = F.col("szx") - F.col("sz") * F.col("sx") / n
    beta_ols = F.when(cxx > 0, cxy / cxx)
    beta_iv = F.when(F.abs(czx) > 0, czy / czx)
    # first stage x = a + b·z: slope b, residual SS = Cxx − b·Czx,
    # F = b²·Czz / (SSR/(n−2))
    b1 = czx / czz
    ssr = cxx - b1 * czx
    fstat = F.when(
        (F.col("n") > 2) & (czz > 0) & (ssr > 0),
        b1 * b1 * czz / (ssr / (n - F.lit(2.0))),
    )
    return a.select(
        "n",
        F.round(beta_ols, round_to).alias("beta_ols"),
        F.round(beta_iv, round_to).alias("beta_iv"),
        F.round(fstat, round_to).alias("first_stage_f"),
    )


def lda_fisher2(
    df: DataFrame,
    label_col,
    f1_col,
    f2_col,
    round_to: int = 6,
) -> DataFrame:
    """Fisher linear discriminant for two classes over two features
    (Fisher 1936): the closed-form linear classifier
    ``w = S_w⁻¹(μ₁ − μ₀)`` with the pooled within-class scatter S_w —
    the moment-algebra baseline that needs no iterations at all (the
    sanity anchor next to the Newton-fit logistic_platt: if LDA
    separates, the expensive fit should too).

    Also reports the threshold ``c = w·(μ₀+μ₁)/2`` (classify 1 when
    ``w·x > c``) and the training accuracy of that rule.

    Returns ONE row: ``n, n1, w1, w2, c, accuracy`` (weights NULL when
    S_w is singular).

    Plan: ONE corpus aggregate to per-class first/second moments
    (map-side combined), closed-form 2×2 inverse on the 1-row frame,
    then ONE scoring pass with the weights as literals folded into the
    plan (no second shuffle, no Python).
    """
    y = (F.col(label_col) if isinstance(label_col, str) else label_col).cast(
        "int"
    )
    x1 = (F.col(f1_col) if isinstance(f1_col, str) else f1_col).cast("double")
    x2 = (F.col(f2_col) if isinstance(f2_col, str) else f2_col).cast("double")
    base = df.select(
        y.alias("_y"), x1.alias("_x1"), x2.alias("_x2")
    ).filter(
        F.col("_y").isNotNull()
        & F.col("_x1").isNotNull()
        & F.col("_x2").isNotNull()
    )
    per_c = base.groupBy("_y").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x1").alias("s1"),
        F.sum("_x2").alias("s2"),
        F.sum(F.col("_x1") * F.col("_x1")).alias("q11"),
        F.sum(F.col("_x1") * F.col("_x2")).alias("q12"),
        F.sum(F.col("_x2") * F.col("_x2")).alias("q22"),
    )
    rows = {int(r["_y"]): r for r in per_c.collect()}
    if sorted(rows) != [0, 1]:
        raise ValueError("lda_fisher2 needs exactly the labels {0, 1}")

    def stats(r):
        n = float(r["n"])
        m1, m2 = r["s1"] / n, r["s2"] / n
        # within-class scatter (sum of squares about the class mean)
        s11 = r["q11"] - n * m1 * m1
        s12 = r["q12"] - n * m1 * m2
        s22 = r["q22"] - n * m2 * m2
        return n, m1, m2, s11, s12, s22

    n0, a1, a2, s11a, s12a, s22a = stats(rows[0])
    n1, b1, b2, s11b, s12b, s22b = stats(rows[1])
    sw11, sw12, sw22 = s11a + s11b, s12a + s12b, s22a + s22b
    det = sw11 * sw22 - sw12 * sw12
    spark = df.sparkSession
    if det == 0:
        return spark.createDataFrame(
            [(int(n0 + n1), int(n1), None, None, None, None)],
            "n long, n1 long, w1 double, w2 double, c double, "
            "accuracy double",
        )
    d1, d2 = b1 - a1, b2 - a2
    w1 = (sw22 * d1 - sw12 * d2) / det
    w2 = (-sw12 * d1 + sw11 * d2) / det
    c = w1 * (a1 + b1) / 2.0 + w2 * (a2 + b2) / 2.0
    score = F.lit(w1) * F.col("_x1") + F.lit(w2) * F.col("_x2")
    acc = base.agg(
        F.avg(
            ((score > F.lit(c)).cast("int") == F.col("_y")).cast("double")
        ).alias("acc")
    ).collect()[0]["acc"]
    out = [(
        int(n0 + n1),
        int(n1),
        round(w1, round_to),
        round(w2, round_to),
        round(c, round_to),
        round(float(acc), round_to),
    )]
    return spark.createDataFrame(
        out,
        "n long, n1 long, w1 double, w2 double, c double, accuracy double",
    )


def mahalanobis_outliers(
    df: DataFrame,
    f1_col,
    f2_col,
    threshold: float = 9.21034,
    round_to: int = 6,
) -> DataFrame:
    """Mahalanobis-distance outlier screen over two features: D²(x) =
    (x−μ)ᵀ Σ⁻¹ (x−μ) with the sample covariance — the CORRELATION-aware
    multivariate fence (a point can be inside both marginal MAD fences
    yet wildly off the joint ridge; D² catches it).  Default threshold
    9.21 = χ²(2) at 1%.

    Returns ONE row: ``n, n_outliers, outlier_rate, d2_max`` (NULL
    stats when the covariance is singular).

    Plan: ONE moment aggregate → closed-form 2×2 inverse driver-side
    (6 scalars) → ONE scoring aggregate with the inverse folded in as
    literals.  Two corpus scans, zero shuffles beyond the aggregates,
    zero Python in the scoring path.
    """
    x1 = (F.col(f1_col) if isinstance(f1_col, str) else f1_col).cast("double")
    x2 = (F.col(f2_col) if isinstance(f2_col, str) else f2_col).cast("double")
    base = df.select(x1.alias("_x1"), x2.alias("_x2")).filter(
        F.col("_x1").isNotNull() & F.col("_x2").isNotNull()
    )
    m = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("_x1").alias("m1"),
        F.avg("_x2").alias("m2"),
        F.sum(F.col("_x1") * F.col("_x1")).alias("q11"),
        F.sum(F.col("_x1") * F.col("_x2")).alias("q12"),
        F.sum(F.col("_x2") * F.col("_x2")).alias("q22"),
    ).collect()[0]
    n = float(m["n"])
    spark = df.sparkSession
    schema = (
        "n long, n_outliers long, outlier_rate double, d2_max double"
    )
    if n < 3:
        return spark.createDataFrame([(int(n), None, None, None)], schema)
    c11 = (m["q11"] - n * m["m1"] * m["m1"]) / (n - 1.0)
    c12 = (m["q12"] - n * m["m1"] * m["m2"]) / (n - 1.0)
    c22 = (m["q22"] - n * m["m2"] * m["m2"]) / (n - 1.0)
    det = c11 * c22 - c12 * c12
    if det <= 0:
        return spark.createDataFrame([(int(n), None, None, None)], schema)
    i11, i12, i22 = c22 / det, -c12 / det, c11 / det
    d1 = F.col("_x1") - F.lit(m["m1"])
    d2c = F.col("_x2") - F.lit(m["m2"])
    d2 = (
        F.lit(i11) * d1 * d1
        + F.lit(2.0 * i12) * d1 * d2c
        + F.lit(i22) * d2c * d2c
    )
    a = base.agg(
        F.sum((d2 > F.lit(float(threshold))).cast("long")).alias("k"),
        F.max(d2).alias("mx"),
    ).collect()[0]
    return spark.createDataFrame(
        [(
            int(n),
            int(a["k"]),
            round(a["k"] / n, round_to),
            round(float(a["mx"]), round_to),
        )],
        schema,
    )


def info_gain_ranking(
    df: DataFrame,
    label_col,
    features: dict,
    round_to: int = 6,
) -> DataFrame:
    """Information-gain feature ranking: for each DISCRETE feature,
    ``IG = H(label) − H(label | feature)`` in nats — which cheap signal
    most reduces label uncertainty (the feature-triage pass before
    fitting anything; the multi-feature generalization of
    q_mutual_info's single pair).

    ``features`` maps name → discrete Column (bucket/categorical).
    Returns one row per feature: ``feature, ig, rank`` (rank 1 = most
    informative; ties broken by name).

    Plan: features MELT into (feature, value, label) rows via ONE
    inline array explode (k× row multiplier, k = feature count — no
    per-feature scans, no joins); two nested aggregates produce
    (feature, value)-cardinality then feature-cardinality frames; the
    label entropy rides the same pass through the feature-independent
    totals.
    """
    y = (F.col(label_col) if isinstance(label_col, str) else label_col)
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("f"),
                col.cast("string").alias("v"),
            )
            for name, col in features.items()
        ]
    )
    melted = df.select(
        y.cast("string").alias("_y"), F.explode(pairs).alias("_p")
    ).select("_y", F.col("_p.f").alias("_f"), F.col("_p.v").alias("_v"))
    fvl = melted.groupBy("_f", "_v", "_y").agg(
        F.count(F.lit(1)).alias("c")
    )
    wv = Window.partitionBy("_f", "_v")
    wf = Window.partitionBy("_f")
    staged = fvl.withColumn("nv", F.sum("c").over(wv)).withColumn(
        "nf", F.sum("c").over(wf)
    )
    # H(label|feature) = Σ_v p(v) H(label|v) — per-row contribution
    # −(c/nf)·ln(c/nv) summed per feature
    pc = F.col("c").cast("double")
    hcond = F.sum(
        -(pc / F.col("nf").cast("double"))
        * F.log(pc / F.col("nv").cast("double"))
    )
    per_f = staged.groupBy(F.col("_f").alias("feature")).agg(
        hcond.alias("_hc")
    )
    # H(label): from any single feature's label marginals — use the
    # first feature's slice (identical label distribution in every
    # slice by construction of the melt)
    first = sorted(features)[0]
    lab = (
        staged.filter(F.col("_f") == first)
        .groupBy("_y")
        .agg(F.sum("c").alias("cy"))
    )
    lab = lab.withColumn(
        "_tot", F.sum("cy").over(Window.partitionBy()).cast("double")
    )
    h_row = lab.agg(
        F.sum(
            -(F.col("cy").cast("double") / F.col("_tot"))
            * F.log(F.col("cy").cast("double") / F.col("_tot"))
        ).alias("_h")
    )
    out = per_f.crossJoin(F.broadcast(h_row)).select(
        "feature",
        F.round(F.col("_h") - F.col("_hc"), round_to).alias("ig"),
    )
    w_rank = Window.orderBy(F.col("ig").desc(), "feature")
    return out.withColumn("rank", F.row_number().over(w_rank))


def cem_att(
    df: DataFrame,
    treatment_col,
    outcome_col,
    strata_cols: list,
    round_to: int = 6,
) -> DataFrame:
    """Coarsened exact matching ATT (Iacus, King & Porro 2012): coarsen
    covariates into the caller's strata columns, keep only strata
    containing BOTH treated and control units, weight controls so each
    stratum's controls count as much as its treated, and difference the
    weighted outcome means — the transparent, deterministic matching
    estimator (no nearest-neighbor ordering ambiguity, no propensity
    model to mis-fit; the methodological counterpoint to q_ipw_ate on
    the same data).

    Control weight in stratum s: ``w = (m_T^s/m_C^s)·(M_C/M_T)`` with
    M the matched totals; ATT = ȳ_T − Σw·y_C/Σw over matched strata.

    Returns ONE row: ``n_strata_matched, n_treated, n_control, att``
    (NULL when nothing matches).

    Plan: ONE corpus aggregate to per-(stratum, arm) moments; matching,
    weighting and the ATT are closed-form algebra on that
    strata-cardinality frame.  Nothing row-wise survives the first
    aggregate.
    """
    t = (
        F.col(treatment_col)
        if isinstance(treatment_col, str)
        else treatment_col
    ).cast("int")
    y = (
        F.col(outcome_col) if isinstance(outcome_col, str) else outcome_col
    ).cast("double")
    keys = [
        (F.col(c) if isinstance(c, str) else c).alias(f"_s{i}")
        for i, c in enumerate(strata_cols)
    ]
    per = df.select(t.alias("_t"), y.alias("_y"), *keys).filter(
        F.col("_t").isNotNull() & F.col("_y").isNotNull()
    )
    knames = [f"_s{i}" for i in range(len(strata_cols))]
    cell = per.groupBy(*knames).agg(
        F.sum("_t").alias("mt"),
        F.sum(F.lit(1) - F.col("_t")).alias("mc"),
        F.sum(F.col("_y") * F.col("_t")).alias("syt"),
        F.sum(F.col("_y") * (F.lit(1) - F.col("_t"))).alias("syc"),
    )
    matched = cell.filter((F.col("mt") > 0) & (F.col("mc") > 0))
    # w·Σy_C within a stratum = (mt/mc)·Σy_C; the (M_C/M_T) factor is
    # stratum-independent and cancels between numerator and denominator
    # of the weighted control mean
    a = matched.agg(
        F.count(F.lit(1)).cast("long").alias("n_strata_matched"),
        F.sum("mt").cast("long").alias("n_treated"),
        F.sum("mc").cast("long").alias("n_control"),
        F.sum("syt").alias("_syt"),
        F.sum(
            F.col("mt").cast("double") / F.col("mc").cast("double")
            * F.col("syc")
        ).alias("_wyc"),
    )
    att = F.col("_syt") / F.col("n_treated").cast("double") - F.col(
        "_wyc"
    ) / F.col("n_treated").cast("double")
    return a.select(
        "n_strata_matched",
        "n_treated",
        "n_control",
        F.round(F.when(F.col("n_treated") > 0, att), round_to).alias(
            "att"
        ),
    )


def cv_r2_simple(
    df: DataFrame,
    y_col,
    x_col,
    fold_expr,
    n_folds: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """K-fold out-of-fold R² for the simple regression ``y ~ a + b·x``
    — the leakage-safe model assessment (in-sample R² always flatters;
    the out-of-fold number is what a deployed predictor actually
    delivers), computed WITHOUT any per-fold refit pass: every fold's
    train moments are (total − fold) moments, the OLS solve is closed
    form, and the held-out SSE is itself moment algebra
    (``Σ(y−a−bx)² = Syy − 2aSy − 2bSxy + a²n + 2abSx + b²Sxx``), so
    the ENTIRE k-fold procedure is ONE corpus aggregate to k fold-
    moment rows plus arithmetic.

    ``fold_expr``: a deterministic integer Column in [0, n_folds)
    (hash-derived — the dataset_split discipline).

    Returns ONE row: ``n, k_folds, r2_in, r2_oof`` (out-of-fold R²
    vs the GLOBAL mean baseline; NULL when any fold's train variance
    is 0).

    Plan: one map-side-combined aggregate; nothing row-sized survives.
    """
    y = (F.col(y_col) if isinstance(y_col, str) else y_col).cast("double")
    x = (F.col(x_col) if isinstance(x_col, str) else x_col).cast("double")
    d = df.select(
        y.alias("_y"), x.alias("_x"), fold_expr.cast("int").alias("_f")
    ).filter(F.col("_y").isNotNull() & F.col("_x").isNotNull())
    per_f = d.groupBy("_f").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("_x").alias("sx"),
        F.sum("_y").alias("sy"),
        F.sum(F.col("_x") * F.col("_x")).alias("sxx"),
        F.sum(F.col("_x") * F.col("_y")).alias("sxy"),
        F.sum(F.col("_y") * F.col("_y")).alias("syy"),
    )
    rows = per_f.collect()
    tot = {
        k: sum(float(r[k]) for r in rows)
        for k in ("n", "sx", "sy", "sxx", "sxy", "syy")
    }
    n_all = tot["n"]
    spark = df.sparkSession
    schema = "n long, k_folds int, r2_in double, r2_oof double"
    if n_all < 2:
        return spark.createDataFrame(
            [(int(n_all), int(n_folds), None, None)], schema
        )
    sst = tot["syy"] - tot["sy"] ** 2 / n_all

    def fit(m):
        den = m["sxx"] - m["sx"] ** 2 / m["n"]
        if den <= 0:
            return None
        b = (m["sxy"] - m["sx"] * m["sy"] / m["n"]) / den
        a = (m["sy"] - b * m["sx"]) / m["n"]
        return a, b

    def sse(m, a, b):
        return (
            m["syy"]
            - 2 * a * m["sy"]
            - 2 * b * m["sxy"]
            + a * a * m["n"]
            + 2 * a * b * m["sx"]
            + b * b * m["sxx"]
        )

    full = fit(tot)
    if full is None or sst <= 0:
        return spark.createDataFrame(
            [(int(n_all), int(n_folds), None, None)], schema
        )
    r2_in = 1.0 - sse(tot, *full) / sst
    sse_oof = 0.0
    for r in rows:
        fold = {k: float(r[k]) for k in ("n", "sx", "sy", "sxx", "sxy", "syy")}
        train = {k: tot[k] - fold[k] for k in tot}
        if train["n"] < 2:
            return spark.createDataFrame(
                [(int(n_all), int(n_folds), round(r2_in, round_to), None)],
                schema,
            )
        ft = fit(train)
        if ft is None:
            return spark.createDataFrame(
                [(int(n_all), int(n_folds), round(r2_in, round_to), None)],
                schema,
            )
        sse_oof += sse(fold, *ft)
    r2_oof = 1.0 - sse_oof / sst
    return spark.createDataFrame(
        [(
            int(n_all),
            int(n_folds),
            round(r2_in, round_to),
            round(r2_oof, round_to),
        )],
        schema,
    )
