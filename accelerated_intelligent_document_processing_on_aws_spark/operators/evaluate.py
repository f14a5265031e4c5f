"""Evaluation harness: golden join + comparator dispatch + metric rollups.

Reference lifecycle (``evaluation/service.py:897`` → ``:514`` →
``comparator.py`` → ``metrics.py:13-145``): load baseline, pair
expected/actual per attribute, dispatch per-attribute comparator, roll up
tp/fp/fn into precision/recall/F1/accuracy.

Spark shape: equi-join on (conv_id, turn_idx) [J1], per-method comparison —
EXACT and NUMERIC are pure Catalyst; FUZZY/HUNGARIAN go through an
Arrow-batched pandas UDF over the paired values; metrics are one
groupBy().sum() (G9).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import normalized_for_compare, numeric_normalize


def fuzzy_score_col(e, a):
    """FUZZY comparator (comparator.py:290-336) as pure Catalyst:
    1 - levenshtein(norm(e), norm(a)) / max(len) via the built-in
    ``F.levenshtein`` (SURVEY.md §2.6) — no Python in the hot path; the
    DuckDB oracle twin uses its native ``levenshtein()``."""
    ne = normalized_for_compare(F.coalesce(e, F.lit("")))
    na = normalized_for_compare(F.coalesce(a, F.lit("")))
    denom = F.greatest(F.length(ne), F.length(na))
    return F.when(denom == 0, F.lit(1.0)).otherwise(
        F.lit(1.0) - F.levenshtein(ne, na).cast("double") / denom.cast("double")
    )


@F.pandas_udf(T.DoubleType())
def semantic_score_udf(expected: pd.Series, actual: pd.Series) -> pd.Series:
    """Deterministic SEMANTIC comparator (X8): hashing-vectorizer cosine
    instead of remote embeddings; fully vectorized per Arrow batch (unique
    tokens hashed once per batch, bincount vectors)."""
    from ..kernels.compare import semantic_scores_batch

    return pd.Series(
        semantic_scores_batch(expected.tolist(), actual.tolist()), dtype="float64"
    )


def evaluate_turns(
    actual: DataFrame,
    golden: DataFrame,
    value_col: str = "extracted_text",
    golden_col: str = "extracted_text",
    method: str = "EXACT",
    fuzzy_threshold: float = 0.8,
) -> DataFrame:
    """Per-turn evaluation rows: (conv_id, turn_idx, matched, score).

    NOTE: for the north_rule per-turn text-equality invariant we use BYTE
    equality (method='BYTE'), stricter than the reference EXACT comparator —
    normalization is the operator under test, not the comparator
    (SURVEY.md §5).
    """
    a = actual.select("conv_id", "turn_idx", F.col(value_col).alias("_actual"))
    g = golden.select("conv_id", "turn_idx", F.col(golden_col).alias("_expected"))
    j = a.join(g, ["conv_id", "turn_idx"], "full_outer")
    e, x = F.col("_expected"), F.col("_actual")
    if method == "BYTE":
        matched = e.eqNullSafe(x)
        score = matched.cast("double")
    elif method == "EXACT":
        matched = normalized_for_compare(e).eqNullSafe(normalized_for_compare(x))
        score = matched.cast("double")
    elif method == "NUMERIC_EXACT":
        matched = numeric_normalize(e).eqNullSafe(numeric_normalize(x))
        score = matched.cast("double")
    elif method == "FUZZY":
        # Catalyst levenshtein is still O(len^2) CPU on tiny bytes: after
        # the join AQE coalesces to one partition (it only sees bytes), so
        # spread explicitly — an explicit-count repartition is exempt
        j = j.repartition(j.sparkSession.sparkContext.defaultParallelism)
        score = fuzzy_score_col(e, x)
        matched = score >= F.lit(fuzzy_threshold)
    elif method == "SEMANTIC":
        j = j.repartition(j.sparkSession.sparkContext.defaultParallelism)
        score = semantic_score_udf(e, x)
        matched = score >= F.lit(fuzzy_threshold)
    else:
        raise ValueError(f"unknown method {method}")
    return j.select(
        "conv_id",
        "turn_idx",
        matched.alias("matched"),
        F.round(score, 4).alias("score"),
    )


def _method_score(method: str, e, a):
    """Score column for one comparator method over (expected, actual)."""
    if method == "BYTE":
        return e.eqNullSafe(a).cast("double")
    if method == "EXACT":
        return normalized_for_compare(e).eqNullSafe(normalized_for_compare(a)).cast(
            "double"
        )
    if method == "NUMERIC_EXACT":
        return numeric_normalize(e).eqNullSafe(numeric_normalize(a)).cast("double")
    if method == "FUZZY":
        return fuzzy_score_col(e, a)
    if method == "SEMANTIC":
        return semantic_score_udf(e, a)
    raise ValueError(f"unknown method {method}")


def evaluate_attributes(
    pairs: DataFrame,
    config: dict,
    attr_col: str = "attr",
    expected_col: str = "expected",
    actual_col: str = "actual",
    default_method: str = "EXACT",
    fuzzy_threshold: float = 0.8,
) -> DataFrame:
    """Per-attribute config-driven comparator dispatch
    (``evaluation/service.py:116-193``: each attribute's YAML config picks
    EXACT/NUMERIC_EXACT/FUZZY/SEMANTIC/...).

    ONE pass over the attribute rows: the ``{attr: method}`` mapping is
    compiled into a chained ``when`` on the attr name, so every method's
    score is a branch of a single Catalyst projection — no per-method job,
    no shuffle.  Appends (method, score, matched).
    """
    e, a = F.col(expected_col), F.col(actual_col)
    methods = sorted({default_method, *config.values()})

    method_col = None
    for attr, method in config.items():
        cond = F.col(attr_col) == F.lit(attr)
        method_col = (
            F.when(cond, F.lit(method))
            if method_col is None
            else method_col.when(cond, F.lit(method))
        )
    method_col = (
        method_col.otherwise(F.lit(default_method))
        if method_col is not None
        else F.lit(default_method)
    )

    score = None
    for m in methods:
        cond = F.col("method") == F.lit(m)
        if m == "SEMANTIC":
            # Spark extracts Python/Arrow UDFs and runs them over EVERY row
            # before the conditional projection — null-gate the inputs so
            # non-SEMANTIC rows hit the kernel's empty-token fast path
            # instead of paying the hashing-cosine cost (round-2 ADVICE)
            s = _method_score(m, F.when(cond, e), F.when(cond, a))
        else:
            s = _method_score(m, e, a)
        score = F.when(cond, s) if score is None else score.when(cond, s)

    out = pairs.withColumn("method", method_col).withColumn(
        "score", F.round(score, 4)
    )
    # equality methods match at 1.0 exactly; similarity methods at threshold
    matched = F.when(
        F.col("method").isin("BYTE", "EXACT", "NUMERIC_EXACT"),
        F.col("score") >= F.lit(1.0),
    ).otherwise(F.col("score") >= F.lit(fuzzy_threshold))
    return out.withColumn("matched", matched)


def evaluate_document_attributes(
    actual: DataFrame,
    golden: DataFrame,
    config: dict,
    keys: tuple = ("conv_id", "attr"),
    value_col: str = "value",
    default_method: str = "EXACT",
    fuzzy_threshold: float = 0.8,
) -> DataFrame:
    """Golden-vs-actual per-attribute evaluation in one pass: full-outer
    join on (conv_id, attr) [J1] + config-driven comparator dispatch
    (``evaluation/service.py:514-700`` pairing + ``:116-193`` method
    lookup).  Missing sides arrive as NULL, so equality methods count them
    as mismatches (fn/fp) exactly like the reference's unmatched keys."""
    a = actual.select(*keys, F.col(value_col).alias("actual"))
    g = golden.select(*keys, F.col(value_col).alias("expected"))
    pairs = g.join(a, list(keys), "full_outer")
    return evaluate_attributes(
        pairs,
        config,
        attr_col=keys[1],
        default_method=default_method,
        fuzzy_threshold=fuzzy_threshold,
    )


def attribute_rollup(evaluated: DataFrame, attr_col: str = "attr") -> DataFrame:
    """Per-attribute metric rollup (G9 over the per-attr result rows)."""
    return (
        evaluated.groupBy(attr_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("matched").cast("long")).alias("n_matched"),
            F.round(F.avg("score"), 4).alias("mean_score"),
        )
        .withColumn(
            "match_rate",
            F.round(F.col("n_matched") / F.greatest(F.col("n"), F.lit(1)), 4),
        )
    )


LIST_EVAL_SCHEMA = T.StructType(
    [
        T.StructField("group_id", T.StringType()),
        T.StructField("tp", T.LongType()),
        T.StructField("fp", T.LongType()),
        T.StructField("fn", T.LongType()),
        T.StructField("mean_score", T.DoubleType()),
    ]
)


def evaluate_lists(
    pairs: DataFrame,
    group_col: str = "group_id",
    expected_col: str = "expected",
    actual_col: str = "actual",
    threshold: float = 0.8,
) -> DataFrame:
    """HUNGARIAN list matching (comparator.py:226-287 semantics, J2).

    ``pairs`` has one row per group with two array<string> columns; each
    group runs the optimal bipartite assignment (numpy Hungarian kernel —
    scipy is unavailable here) inside ``applyInPandas``.  This is the one
    theta-join-in-a-group operator Spark has no native primitive for
    (SURVEY.md §2.4 J2); groups are independent so it scales by group
    cardinality, and the per-group matrix is bounded by list length.
    """
    from ..kernels.compare import hungarian_match

    def _solve(batches):
        for pdf in batches:
            out = []
            for gid, exp_v, act_v in zip(
                pdf[group_col], pdf[expected_col], pdf[actual_col]
            ):
                exp = [] if exp_v is None else list(exp_v)
                act = [] if act_v is None else list(act_v)
                tp, fp, fn, mean = hungarian_match(exp, act, threshold)
                out.append((gid, tp, fp, fn, round(mean, 4)))
            yield pd.DataFrame(
                out, columns=["group_id", "tp", "fp", "fn", "mean_score"]
            )

    sel = pairs.select(
        F.col(group_col).cast("string").alias(group_col),
        expected_col,
        actual_col,
    )
    # One row per group already, so no groupBy shuffle is needed: an
    # explicit-count repartition (exempt from AQE coalescing) spreads the
    # O(list^2 * len^2)-CPU-on-tiny-bytes rows, then mapInPandas solves each
    # row in place.  A groupBy().applyInPandas here would add an exchange
    # that AQE coalesces back to one task (CPU cost is invisible to AQE).
    sel = sel.repartition(sel.sparkSession.sparkContext.defaultParallelism)
    return sel.mapInPandas(_solve, LIST_EVAL_SCHEMA)


def metrics_rollup(evaluated: DataFrame) -> DataFrame:
    """tp/fp/fn → precision/recall/F1/accuracy (metrics.py:13-145).

    A row with matched=true is a tp; matched=false with actual present is a
    fp; golden present without match contributes fn — for per-turn text
    equality fp==fn (one attr per turn), matching the reference's
    symmetric accounting for single-valued attributes.
    """
    agg = evaluated.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("matched").cast("long")).alias("tp"),
        F.sum((~F.col("matched")).cast("long")).alias("fp"),
        F.sum((~F.col("matched")).cast("long")).alias("fn"),
        F.round(F.avg("score"), 4).alias("mean_score"),
    )
    precision = F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))
    recall = F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))
    f1 = F.when(
        (precision + recall) > 0, 2 * precision * recall / (precision + recall)
    ).otherwise(F.lit(0.0))
    return agg.select(
        "n",
        "tp",
        "fp",
        "fn",
        "mean_score",
        F.round(precision, 4).alias("precision"),
        F.round(recall, 4).alias("recall"),
        F.round(f1, 4).alias("f1"),
        F.round(F.col("tp") / F.greatest(F.col("n"), F.lit(1)), 4).alias("accuracy"),
    )


def rouge_n(
    df: DataFrame,
    id_col: str,
    expected_col: str,
    actual_col: str,
    n: int = 2,
) -> DataFrame:
    """ROUGE-N overlap (Lin 2004): clipped word n-gram counts between an
    expected (reference) and actual (candidate) text — the standard
    summarization/extraction overlap metric, complementing the
    EXACT/FUZZY/SEMANTIC/HUNGARIAN comparators (reference
    ``evaluation/comparator.py`` has no n-gram metric; the public ROUGE
    definition is used).

    ``overlap = sum_g min(count_expected(g), count_actual(g))``;
    recall = overlap / n_expected_grams, precision = overlap /
    n_actual_grams, f1 harmonic — all rounded 6 dp, 0.0 when a side has
    no n-grams.

    Output: (id_col, n_expected, n_actual, n_overlap, rouge_recall,
    rouge_precision, rouge_f1).

    Plan shape (100 TB): ONE scan of the input — both sides' grams are
    built in the same projection (side-tagged structs, per-side totals
    from array sizes) and ``explode_outer`` keeps empty docs alive, so no
    id-universe join and no distinct.  A two-level aggregate
    (map-side combine on (id, gram), then (id)) computes the clipped
    overlap; document text never shuffles, only slim gram rows.  The
    word arrays are materialized as ATTRIBUTES before the gram lambdas
    close over them (Catalyst re-evaluates a closed-over expression per
    element — inlined, every gram re-split the whole text: measured
    17.1 s for the sf0.1 registry query, 2.4 s staged)."""
    from ..functions.text import word_ngrams

    pre = df.select(
        "*",
        F.split(F.coalesce(F.col(expected_col), F.lit("")), " ").alias("_we"),
        F.split(F.coalesce(F.col(actual_col), F.lit("")), " ").alias("_wa"),
    )
    df = pre
    we, wa = F.col("_we"), F.col("_wa")
    ge, ga = word_ngrams(we, n), word_ngrams(wa, n)
    tagged = F.concat(
        F.transform(
            ge,
            lambda g: F.struct(
                g.alias("g"), F.lit(1).alias("e"), F.lit(0).alias("a")
            ),
        ),
        F.transform(
            ga,
            lambda g: F.struct(
                g.alias("g"), F.lit(0).alias("e"), F.lit(1).alias("a")
            ),
        ),
    )
    # gram counts as O(1) arithmetic on the word-array sizes — NOT
    # F.size(ge): this projection sits ABOVE the Generate, so its
    # expressions re-evaluate per EXPLODED row, and rebuilding the gram
    # array there is O(words²) per doc (same fix as bleu_n; identical
    # value: |n-grams| = max(0, words - n + 1)).
    ne_c = F.when(
        F.size(we) >= n, F.size(we) - F.lit(n - 1)
    ).otherwise(F.lit(0))
    na_c = F.when(
        F.size(wa) >= n, F.size(wa) - F.lit(n - 1)
    ).otherwise(F.lit(0))
    base = df.select(
        F.col(id_col),
        ne_c.alias("_ne"),
        na_c.alias("_na"),
        F.explode_outer(tagged).alias("_t"),
    ).select(
        F.col(id_col),
        "_ne",
        "_na",
        F.col("_t.g").alias("_g"),
        F.coalesce(F.col("_t.e"), F.lit(0)).alias("_e"),
        F.coalesce(F.col("_t.a"), F.lit(0)).alias("_a"),
    )
    per_gram = base.groupBy(id_col, "_g").agg(
        F.first("_ne").alias("_ne"),
        F.first("_na").alias("_na"),
        F.sum("_e").alias("c_e"),
        F.sum("_a").alias("c_a"),
    )
    agg = per_gram.groupBy(id_col).agg(
        F.first("_ne").cast("long").alias("n_expected"),
        F.first("_na").cast("long").alias("n_actual"),
        F.sum(F.least(F.col("c_e"), F.col("c_a"))).cast("long").alias(
            "n_overlap"
        ),
    )
    rec = F.when(
        F.col("n_expected") > 0, F.col("n_overlap") / F.col("n_expected")
    ).otherwise(F.lit(0.0))
    prec = F.when(
        F.col("n_actual") > 0, F.col("n_overlap") / F.col("n_actual")
    ).otherwise(F.lit(0.0))
    f1 = F.when(
        (rec + prec) > 0, F.lit(2.0) * rec * prec / (rec + prec)
    ).otherwise(F.lit(0.0))
    return agg.select(
        F.col(id_col),
        "n_expected",
        "n_actual",
        "n_overlap",
        F.round(rec, 6).alias("rouge_recall"),
        F.round(prec, 6).alias("rouge_precision"),
        F.round(f1, 6).alias("rouge_f1"),
    )


def bleu_n(
    df: DataFrame,
    id_col: str,
    expected_col: str,
    actual_col: str,
    max_n: int = 4,
) -> DataFrame:
    """Sentence-level BLEU (Papineni et al. 2002): geometric mean of
    clipped n-gram precisions for n = 1..``max_n`` times the brevity
    penalty ``min(1, exp(1 - len_ref/len_cand))`` — the candidate
    (actual) side is scored against the reference (expected).  Orders
    with zero overlap contribute precision 0, so the geometric mean is 0
    whenever any order has no match (standard uns smoothed BLEU).

    Output: (id_col, len_ref, len_cand, bleu) — bleu rounded 6 dp.

    Plan shape (100 TB): same single-scan shape as ``rouge_n`` — all
    2·max_n gram arrays are built in ONE projection, side- and
    order-tagged structs explode once, and a two-level aggregate
    computes per-order clipped overlaps; text never shuffles.  The word
    arrays are materialized as ATTRIBUTES first (same per-element
    closure re-evaluation as rouge_n, multiplied by 8 gram arrays:
    measured 79.9 s for the sf0.1 registry query, 5.7 s staged)."""
    from ..functions.text import word_ngrams

    df = df.select(
        "*",
        F.split(F.coalesce(F.col(expected_col), F.lit("")), " ").alias("_we"),
        F.split(F.coalesce(F.col(actual_col), F.lit("")), " ").alias("_wa"),
    )
    we, wa = F.col("_we"), F.col("_wa")

    def tag(arr, side, order):
        return F.transform(
            arr,
            lambda g: F.struct(
                F.lit(order).alias("n"),
                g.alias("g"),
                F.lit(side).alias("e"),
                F.lit(1 - side).alias("a"),
            ),
        )

    tagged = F.concat(
        *[tag(word_ngrams(we, i), 1, i) for i in range(1, max_n + 1)],
        *[tag(word_ngrams(wa, i), 0, i) for i in range(1, max_n + 1)],
    )
    # token lengths double as len_ref / len_cand.  F.size(attr) — NOT
    # size(word_ngrams(.., 1)): this projection sits ABOVE the Generate,
    # so its expressions re-evaluate per EXPLODED row, and building the
    # 1-gram array there is O(words²) per doc (measured 79.9 s for the
    # sf0.1 registry query; 5.7 s with the O(1) array-length lookup —
    # identical value: the 1-gram array always has size(words) elements).
    base = df.select(
        F.col(id_col),
        F.size(we).alias("_lr"),
        F.size(wa).alias("_lc"),
        F.explode_outer(tagged).alias("_t"),
    ).select(
        F.col(id_col),
        "_lr",
        "_lc",
        F.col("_t.n").alias("_n"),
        F.col("_t.g").alias("_g"),
        F.coalesce(F.col("_t.e"), F.lit(0)).alias("_e"),
        F.coalesce(F.col("_t.a"), F.lit(0)).alias("_a"),
    )
    per_gram = base.groupBy(id_col, "_n", "_g").agg(
        F.first("_lr").alias("_lr"),
        F.first("_lc").alias("_lc"),
        F.sum("_e").alias("c_e"),
        F.sum("_a").alias("c_a"),
    )
    # per (doc, order): clipped overlap and candidate gram count
    per_n = per_gram.groupBy(id_col, "_n").agg(
        F.first("_lr").alias("_lr"),
        F.first("_lc").alias("_lc"),
        F.sum(F.least(F.col("c_e"), F.col("c_a"))).alias("ov"),
        F.sum("c_a").alias("na"),
    )
    # geometric mean over orders: exp(avg(ln p_n)); any p_n = 0 -> bleu 0.
    # The null row from an empty doc carries _n null — drop it here (its
    # _lr/_lc already rode through per-doc firsts on real orders; a fully
    # empty doc keeps its zero row via the n=1 order of the OTHER side or
    # yields bleu 0 through the len aggregate below).
    p_n = F.when(
        (F.col("na") > 0) & (F.col("ov") > 0),
        F.col("ov").cast("double") / F.col("na"),
    )
    agg = per_n.groupBy(id_col).agg(
        F.max("_lr").cast("long").alias("len_ref"),
        F.max("_lc").cast("long").alias("len_cand"),
        F.sum(F.when(p_n.isNotNull(), F.log(p_n))).alias("_logsum"),
        F.sum(F.when(p_n.isNotNull(), F.lit(1)).otherwise(F.lit(0))).alias(
            "_ok"
        ),
    )
    # effective orders = those the CANDIDATE can populate (a short
    # candidate is scored on its available orders, not zeroed by 0/0)
    n_orders = F.least(F.col("len_cand"), F.lit(max_n))
    geo = F.when(
        (F.col("_ok") >= n_orders) & (n_orders > 0),
        F.exp(F.col("_logsum") / n_orders),
    ).otherwise(F.lit(0.0))
    bp = F.when(
        F.col("len_cand") >= F.col("len_ref"), F.lit(1.0)
    ).otherwise(
        F.when(
            F.col("len_cand") > 0,
            F.exp(
                F.lit(1.0)
                - F.col("len_ref").cast("double") / F.col("len_cand")
            ),
        ).otherwise(F.lit(0.0))
    )
    return agg.select(
        F.col(id_col),
        "len_ref",
        "len_cand",
        F.round(geo * bp, 6).alias("bleu"),
    )


def chrf_score(
    df: DataFrame,
    id_col: str,
    expected_col: str,
    actual_col: str,
    max_n: int = 6,
    beta: float = 2.0,
) -> DataFrame:
    """chrF (Popović 2015, WMT): character n-gram F-score between an
    expected (reference) and actual (candidate) text — the standard
    tokenization-free MT/extraction metric, completing the eval family
    alongside EXACT/FUZZY/SEMANTIC/HUNGARIAN/ROUGE/BLEU (the reference's
    ``evaluation/comparator.py`` has no character-level metric; the
    public chrF definition is used).

    Spec (documented variant, deterministic): all whitespace is removed
    from both sides; for each order n = 1..``max_n`` with at least one
    gram on either side (an "effective" order), clipped overlap gives
    ``P_n = ov/n_cand`` and ``R_n = ov/n_ref`` (0 when that side has no
    grams) and ``F_n = (1+β²)·P·R / (β²·P + R)`` (0 when the denominator
    is 0, β = ``beta``); chrF is the arithmetic mean of ``F_n`` over the
    effective orders (0.0 when there are none).  Identical texts score
    exactly 1.0.

    Output: (id_col, len_ref, len_cand, chrf) — char lengths after
    whitespace strip; chrf rounded 6 dp.

    Plan shape (100 TB): same single-scan shape as ``bleu_n`` — all
    2·max_n char-gram arrays are built in ONE projection (order- and
    side-tagged structs), ``explode_outer`` keeps empty docs alive, and
    a two-level aggregate computes per-order clipped overlaps; document
    text never shuffles, only slim gram rows."""
    # whitespace-stripped sides materialized as ATTRIBUTES before any
    # HOF touches them: a lambda that closes over an expression makes
    # Catalyst re-evaluate it PER ELEMENT (the word_chunks discipline) —
    # with the regexp_replace inline, every char-gram re-ran an O(N)
    # regex over the whole text: O(N²) per doc per order (measured 17.6 s
    # for the sf0.1 registry query; 2.8 s with the attributes).
    stripped = df.select(
        "*",
        F.regexp_replace(
            F.coalesce(F.col(expected_col), F.lit("")), r"\s+", ""
        ).alias("_se"),
        F.regexp_replace(
            F.coalesce(F.col(actual_col), F.lit("")), r"\s+", ""
        ).alias("_sa"),
    )
    se, sa = F.col("_se"), F.col("_sa")
    # char lengths staged BELOW the explode: the projection above a
    # Generate re-evaluates per exploded row, and length() is O(chars)
    # per call — O(chars²) per doc across the 2·max_n gram rows
    stripped = stripped.select(
        "*", F.length(se).alias("_lrs"), F.length(sa).alias("_lcs")
    )

    def grams(s, n):
        return F.when(
            F.length(s) >= n,
            F.transform(
                F.sequence(F.lit(1), F.length(s) - F.lit(n - 1)),
                lambda i: s.substr(i, F.lit(n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    def tag(arr, order, side):
        return F.transform(
            arr,
            lambda g: F.struct(
                F.lit(order).alias("n"),
                g.alias("g"),
                F.lit(side).alias("e"),
                F.lit(1 - side).alias("a"),
            ),
        )

    tagged = F.concat(
        *[tag(grams(se, i), i, 1) for i in range(1, max_n + 1)],
        *[tag(grams(sa, i), i, 0) for i in range(1, max_n + 1)],
    )
    base = stripped.select(
        F.col(id_col),
        F.col("_lrs").alias("_lr"),
        F.col("_lcs").alias("_lc"),
        F.explode_outer(tagged).alias("_t"),
    ).select(
        F.col(id_col),
        "_lr",
        "_lc",
        F.col("_t.n").alias("_n"),
        F.col("_t.g").alias("_g"),
        F.coalesce(F.col("_t.e"), F.lit(0)).alias("_e"),
        F.coalesce(F.col("_t.a"), F.lit(0)).alias("_a"),
    )
    per_gram = base.groupBy(id_col, "_n", "_g").agg(
        F.first("_lr").alias("_lr"),
        F.first("_lc").alias("_lc"),
        F.sum("_e").alias("c_e"),
        F.sum("_a").alias("c_a"),
    )
    per_n = per_gram.groupBy(id_col, "_n").agg(
        F.first("_lr").alias("_lr"),
        F.first("_lc").alias("_lc"),
        F.sum(F.least("c_e", "c_a")).alias("ov"),
        F.sum("c_e").alias("nr"),
        F.sum("c_a").alias("nc"),
    )
    p = F.when(
        F.col("nc") > 0, F.col("ov").cast("double") / F.col("nc")
    ).otherwise(F.lit(0.0))
    r = F.when(
        F.col("nr") > 0, F.col("ov").cast("double") / F.col("nr")
    ).otherwise(F.lit(0.0))
    b2 = beta * beta
    # IEEE op order is pinned left-to-right here and mirrored verbatim in
    # the DuckDB oracle so round-6dp values match bit-for-bit.
    fn = F.when(
        (F.lit(b2) * p + r) > 0,
        F.lit(1.0 + b2) * p * r / (F.lit(b2) * p + r),
    ).otherwise(F.lit(0.0))
    agg = per_n.groupBy(id_col).agg(
        F.max("_lr").cast("long").alias("len_ref"),
        F.max("_lc").cast("long").alias("len_cand"),
        F.sum(F.when(F.col("_n").isNotNull(), fn)).alias("_fsum"),
        F.sum(
            F.when(F.col("_n").isNotNull(), F.lit(1)).otherwise(F.lit(0))
        ).alias("_neff"),
    )
    chrf = F.when(
        F.col("_neff") > 0, F.round(F.col("_fsum") / F.col("_neff"), 6)
    ).otherwise(F.lit(0.0))
    return agg.select(
        F.col(id_col), "len_ref", "len_cand", chrf.alias("chrf")
    )


def evaluate_alignment(
    actual: DataFrame,
    golden: DataFrame,
    id_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "extracted_text",
    match: int = 2,
    mismatch: int = -1,
    gap: int = -1,
) -> DataFrame:
    """Alignment-based sequence evaluation: per id, the Needleman-Wunsch
    global alignment score between the actual and golden turn sequences
    (ordered by ``idx_col``) — robust to inserted/dropped turns, which
    the per-index join comparators (``evaluate_turns``) score as misses
    for every downstream turn.

    Columns: ``id, n_actual, n_golden, nw_score`` (exact integer) and
    ``sim = nw_score / (match * max(n, m))`` rounded 6 (1.0 = identical
    sequences; negative = mostly gaps).

    Scale shape (100 TB): each side collapses to one ordered array per id
    (sort_array(collect_list(struct)) — the G3 ordered-aggregation
    discipline), ONE id-keyed join, then an Arrow-batched kernel whose
    cost is |a|x|b| per id — conversation-sized, bounded by chunking
    upstream like every conv-keyed window in the pipeline."""
    import pandas as pd

    from ..kernels.compare import nw_score

    def side(df: DataFrame, name: str) -> DataFrame:
        return df.groupBy(F.col(id_col).alias("id")).agg(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col(idx_col), F.col(text_col)))
                ),
                lambda s: s[text_col],
            ).alias(name)
        )

    joined = side(actual, "_a").join(side(golden, "_g"), "id", "full_outer")

    @F.pandas_udf("int")
    def _nw(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [
                nw_score(
                    list(x) if x is not None else [],
                    list(y) if y is not None else [],
                    match,
                    mismatch,
                    gap,
                )
                for x, y in zip(a, b)
            ],
            dtype="int32",
        )

    na = F.coalesce(F.size("_a"), F.lit(0))
    ng = F.coalesce(F.size("_g"), F.lit(0))
    return joined.select(
        "id",
        na.alias("n_actual"),
        ng.alias("n_golden"),
        _nw(F.col("_a"), F.col("_g")).alias("nw_score"),
    ).withColumn(
        "sim",
        F.round(
            F.col("nw_score")
            / (F.lit(float(match)) * F.greatest(F.col("n_actual"), F.col("n_golden"))),
            6,
        ),
    )


def evaluate_local_alignment(
    actual: DataFrame,
    golden: DataFrame,
    id_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "extracted_text",
    match: int = 2,
    mismatch: int = -1,
    gap: int = -1,
) -> DataFrame:
    """Local-alignment sequence evaluation: per id, the Smith-Waterman
    score of the best-matching CONTIGUOUS region between the actual and
    golden turn sequences (kernels.compare.sw_score) — the comparator
    when a clean golden excerpt should be found INSIDE a noisy capture
    (corrupted prefix/suffix, injected turns), where global alignment
    (evaluate_alignment) charges the noise against the whole sequence.

    Columns: ``id, n_actual, n_golden, sw_score`` (exact integer) and
    ``sim = sw_score / (match * min(n, m))`` rounded 6 (1.0 = one side
    contains the other verbatim; 0 = no positive-scoring region).

    Scale shape: identical to evaluate_alignment — each side collapses
    to one ordered array per id, ONE id-keyed full-outer join, then an
    Arrow-batched kernel bounded by conversation length."""
    import pandas as pd

    from ..kernels.compare import sw_score

    def side(df: DataFrame, name: str) -> DataFrame:
        return df.groupBy(F.col(id_col).alias("id")).agg(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col(idx_col), F.col(text_col)))
                ),
                lambda s: s[text_col],
            ).alias(name)
        )

    joined = side(actual, "_a").join(side(golden, "_g"), "id", "full_outer")

    @F.pandas_udf("int")
    def _sw(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [
                sw_score(
                    list(x) if x is not None else [],
                    list(y) if y is not None else [],
                    match,
                    mismatch,
                    gap,
                )
                for x, y in zip(a, b)
            ],
            dtype="int32",
        )

    na = F.coalesce(F.size("_a"), F.lit(0))
    ng = F.coalesce(F.size("_g"), F.lit(0))
    out = joined.select(
        "id",
        na.alias("n_actual"),
        ng.alias("n_golden"),
        _sw(F.col("_a"), F.col("_g")).alias("sw_score"),
    )
    denom = F.lit(float(match)) * F.least(
        F.col("n_actual"), F.col("n_golden")
    )
    return out.withColumn(
        "sim",
        F.round(
            F.when(denom > 0, F.col("sw_score") / denom).otherwise(
                F.lit(0.0)
            ),
            6,
        ),
    )
