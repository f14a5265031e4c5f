"""Deterministic cardinality / sampling sketches: KMV distinct-count,
KMV set-overlap (theta-sketch style), and Efraimidis-Spirakis weighted
sampling.

Reference parity: the reference has no sketch code — these extend the
training-data-pipeline family with the three estimators a 100 TB corpus
platform leans on when exact answers stop being affordable:

* per-group distinct counts (vocabulary size per source, users per
  event class) without a full ``COUNT(DISTINCT)`` Expand;
* overlap between two corpora (train-vs-eval token contamination,
  snapshot drift) without materializing the intersection join;
* weight-proportional sampling (quality-weighted corpus draws, the
  mixture-weights companion) without a global shuffle of the corpus.

All three are built on the repo's engine-portability discipline
(dedup.shingle_hash32): values hash through md5 → a 60-bit integer, so
every estimate is a pure function of the input and a DuckDB oracle
lands on hash-identical doubles — the sketches are *deterministic*, not
randomized, which is what makes them certifiable (and reproducible
across reruns, the property a lineage-checkpointed pipeline needs).

Scale shape: a KMV sketch is k rows; every operator here reduces its
input to sketch size as early as the plan allows (distinct with
map-side combine → bounded top-k), and nothing driver-side ever holds
more than k rows per group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 60-bit hash space: 15 md5 hex chars.  60 bits keeps the k-th-minimum
# statistics effectively collision-free at any realistic cardinality
# while fitting a signed BIGINT in both engines (the repo-wide md5
# portability pattern — dedup.shingle_hash32 is the 32-bit sibling).
HASH_BITS = 60
HASH_SPACE = float(2**HASH_BITS)


def hash60(col: Column) -> Column:
    """Deterministic 60-bit integer hash of a string column (md5-based,
    engine-portable: DuckDB twin is
    ``CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)``)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def kmv_distinct(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    k: int = 64,
    round_to: int = 4,
) -> DataFrame:
    """Per-group approximate COUNT(DISTINCT value) via the k-minimum-
    values estimator (Bar-Yossef et al. 2002): keep each group's k
    smallest distinct hash values; if the group has fewer than k
    distinct values the sketch IS the exact answer, otherwise
    ``est = (k-1) * 2^60 / (h_k + 1)`` with ``h_k`` the k-th minimum.

    Columns: ``*key_cols, n_sketch, est_distinct``.

    Relative standard error ~ 1/sqrt(k-2) (~12.7% at k=64); the point
    at 100 TB is that the group's state is k longs instead of the
    billions-row hash set an exact COUNT(DISTINCT) Expand drags through
    the shuffle.

    Plan: project to (keys, hash) → DISTINCT (one shuffle, map-side
    partial dedup absorbs the heavy repeats — the raw value column is
    dropped before any exchange) → per-key ``row_number`` window keeps
    ranks ≤ k (the standard spillable top-k-per-group; O(1) window
    state) → one final group-sized aggregate.  The estimate is double
    arithmetic over exactly-representable integers, rounded, so both
    engines agree bit-for-bit.
    """
    d = df.select(
        *[F.col(c) for c in key_cols],
        hash60(F.col(value_col).cast("string")).alias("_h"),
    ).distinct()
    w = Window.partitionBy(*key_cols).orderBy("_h")
    sk = d.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    return sk.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_sketch"),
        F.round(
            F.when(
                F.count(F.lit(1)) < k,
                F.count(F.lit(1)).cast("double"),
            ).otherwise(
                F.lit(float(k - 1))
                * F.lit(HASH_SPACE)
                / (F.max("_h").cast("double") + F.lit(1.0))
            ),
            round_to,
        ).alias("est_distinct"),
    )


def _side_sketch(df: DataFrame, value_col: str, k: int) -> DataFrame:
    """Global k-minimum distinct-hash sketch of one value column:
    ``(h)`` rows, at most k of them.  distinct reduces corpus → hash
    set with map-side combine; the k-min cut is a real
    ``orderBy().limit()`` so Catalyst plans TakeOrderedAndProject
    (per-partition heaps + driver merge of k-row partials), never a
    global sort."""
    return (
        df.select(hash60(F.col(value_col).cast("string")).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    k: int = 256,
    round_to: int = 4,
) -> DataFrame:
    """Set-overlap estimate between two corpora of values without a
    corpus-sized join: the theta-sketch composition of two KMV sketches
    (Dasgupta et al. 2016's framework; deterministic md5 variant).

    Per side, reduce to the k smallest distinct hashes.  Compose at
    ``θ = min(θ_a, θ_b)`` where a FULL sketch's θ is its k-th minimum
    (exclusive) and a small side's θ is the whole hash space — below θ
    each sketch contains its set's *complete* distinct-hash population,
    so within ``retained = {h < θ}`` membership-in-both is exact and
    the standard theta estimators are unbiased:

    * ``union_est = |retained| * 2^60 / θ``
    * ``jaccard_est = |both| / |retained|``
    * ``inter_est = |both| * 2^60 / θ``

    (Cutting at the combined k-minimum WITHOUT the θ min — the naive
    merge — counts hashes above the smaller side's threshold as
    one-sided and biases Jaccard low; the θ cut is the theta-sketch
    fix.)  When both sides are small, θ = 2^60 and all three outputs
    are exact.

    Returns ONE row: ``n_retained, union_est, jaccard_est, inter_est``
    — deliberately scalar output (the operator's whole point is
    collapsing two 100 TB scans into ≤2k longs before they meet; the
    sketch frames are broadcast-joinable by construction).
    """
    # each side's sketch is pinned (lazy localCheckpoint, forced by the
    # θ collect below) so the corpus scans run exactly once per side
    sa = (
        _side_sketch(df_a, value_col, k)
        .withColumn("_a", F.lit(1))
        .localCheckpoint(eager=False)
    )
    sb = (
        _side_sketch(df_b, value_col, k)
        .withColumn("_b", F.lit(1))
        .localCheckpoint(eager=False)
    )

    def theta(sketch: DataFrame) -> float:
        # exclusive threshold: k-th minimum when full, else whole space.
        # θ is a DELIBERATE scalar literal (the corpus.py n_tokens
        # pattern): one k-row aggregate job per side — the sketch frames
        # are metadata-sized by construction, and folding θ into the
        # plan as a literal avoids the one-row-frame join Catalyst
        # would plan as a (sweep-banned) BroadcastNestedLoopJoin.
        (row,) = sketch.agg(
            F.count(F.lit(1)).alias("n"), F.max("h").alias("mx")
        ).collect()
        return float(row["mx"]) if row["n"] >= k else HASH_SPACE

    th = min(theta(sa), theta(sb))
    merged = (
        sa.join(sb, "h", "full_outer")
        .select(
            "h",
            (
                F.coalesce(F.col("_a"), F.lit(0))
                * F.coalesce(F.col("_b"), F.lit(0))
            ).alias("_both"),
        )
        .filter(F.col("h").cast("double") < F.lit(th))
    )
    scale = F.lit(HASH_SPACE / th)
    n_ret = F.count(F.lit(1)).cast("double")
    n_both = F.coalesce(F.sum("_both"), F.lit(0)).cast("double")
    return merged.agg(
        F.count(F.lit(1)).cast("long").alias("n_retained"),
        F.round(n_ret * scale, round_to).alias("union_est"),
        F.round(
            F.when(F.count(F.lit(1)) > 0, n_both / n_ret).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("jaccard_est"),
        F.round(n_both * scale, round_to).alias("inter_est"),
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int = 50,
    seed: str = "es1",
    round_to: int = 9,
) -> DataFrame:
    """Deterministic weight-proportional sample of k rows: the
    Efraimidis-Spirakis (2006) exponential race with the randomness
    replaced by the md5 hash of ``seed || id`` — ``u = (h+1)/2^60 ∈
    (0,1]``, key ``= ln(u) / w``, keep the k largest keys.  Items win
    with probability proportional to weight (without replacement), and
    the draw is a pure function of (seed, id, weight): reproducible
    across engines, reruns, and resumes.

    Columns: ``id, weight, es_key`` (key rounded to ``round_to`` so the
    sort order itself is engine-portable; ties broken by id).

    Rows with non-positive or null weight never win (filtered, the
    standard E-S domain).  Plan: one projection + TakeOrderedAndProject
    — the corpus never shuffles; each partition surfaces at most k
    candidates.  This is the sampling half of the mixture-weights
    story: temperature-scaled weights pick HOW MUCH of each domain,
    this operator picks WHICH documents, deterministically.
    """
    w = F.col(weight_col).cast("double")
    u = (
        hash60(F.concat(F.lit(seed), F.col(id_col).cast("string"))).cast("double")
        + F.lit(1.0)
    ) / F.lit(HASH_SPACE)
    scored = (
        df.filter(w > 0)
        .select(
            F.col(id_col).alias("id"),
            w.alias("weight"),
            F.round(F.log(u) / w, round_to).alias("es_key"),
        )
    )
    return scored.orderBy(F.col("es_key").desc(), F.col("id").asc()).limit(k)


def cms_table(
    items: DataFrame,
    term_col: str,
    weight_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) of a weighted
    term table: ``depth`` hash rows × ``width`` counter buckets, bucket
    ``i`` of row ``r`` holding the sum of weights of every term with
    ``hash(r || ':' || term) % width == i``.  Columns: ``row, bucket,
    cnt`` (absent cells are implicit zeros).

    Deterministic md5 row-salted hashing (the repo's engine-portability
    pattern — see :func:`hash60`), so the sketch is a pure function of
    the input and a DuckDB twin lands on identical counters.

    The 100 TB property is the one CMS exists for: the sketch is
    ``depth·width`` longs NO MATTER the vocabulary — counters are
    additive, so per-partition partial sketches merge by cell-wise sum
    (here: plain map-side combine under one groupBy), and two corpus
    snapshots' sketches merge the same way without re-scanning either.
    """
    rows = items.select(
        F.col(term_col).alias("term"),
        F.col(weight_col).cast("long").alias("wc"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    )
    bucketed = rows.select(
        "row",
        F.pmod(
            hash60(
                F.concat(F.col("row").cast("string"), F.lit(":"), F.col("term"))
            ),
            F.lit(width),
        ).alias("bucket"),
        "wc",
    )
    return bucketed.groupBy("row", "bucket").agg(F.sum("wc").alias("cnt"))


def cms_point_estimates(
    cms: DataFrame,
    queries: DataFrame,
    term_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Point-frequency estimates from a :func:`cms_table` sketch:
    ``est(term) = min over rows of the term's bucket counter`` — never
    under the true count, over by at most ``e/width · total_weight``
    with probability ``1 - e^-depth`` (the classic CMS guarantee).

    Columns: ``term, cms_est``.  Plan: the query side explodes to
    ``depth`` rows per term and equi-joins the BROADCAST sketch (the
    sketch is ``depth·width`` cells by construction — the definition of
    broadcastable); a missing cell is a zero counter, hence the left
    join + coalesce, and the min folds back to one row per term.
    """
    q = queries.select(
        F.col(term_col).alias("term"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    ).select(
        "term",
        "row",
        F.pmod(
            hash60(
                F.concat(F.col("row").cast("string"), F.lit(":"), F.col("term"))
            ),
            F.lit(width),
        ).alias("bucket"),
    )
    j = q.join(F.broadcast(cms), ["row", "bucket"], "left")
    return j.groupBy("term").agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("cms_est")
    )


# HLL constants: b register-index bits -> p = 2^b registers; alpha_p is
# the standard HyperLogLog bias constant (Flajolet et al. 2007, fig. 3).
_HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def hll_distinct(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    b: int = 5,
    round_to: int = 4,
) -> DataFrame:
    """Per-group approximate COUNT(DISTINCT value) via HyperLogLog
    (Flajolet et al. 2007) over the deterministic 60-bit md5 hash: the
    top ``b`` hash bits pick one of ``p = 2^b`` registers, the register
    keeps the max leading-zero-run length (+1) of the remaining
    ``60-b`` bits, and the estimate is the bias-corrected harmonic mean
    ``alpha_p · p² / Σ 2^-M_j`` with the small-range linear-counting
    fallback (``p·ln(p/V)`` when the raw estimate ≤ 2.5p and V empty
    registers remain).

    Columns: ``*key_cols, n_registers, est_distinct``.

    KMV's complement (same ~1.04/√p error class): a KMV sketch is exact
    below k but k longs of state; HLL is p SMALL INTS of state with
    register-wise MAX as the merge — the shape stream/snapshot
    cardinality services standardize on.  Here that merge is literally
    the plan: groupBy(keys, register).max — map-side partial max absorbs
    every duplicate value before the exchange, so the shuffle carries at
    most ``p`` rows per group no matter how many billions of values the
    group holds.

    Engine-portability: the harmonic sum is computed as the INTEGER
    ``Σ 2^(61-b-M_j)`` (empty registers contribute ``2^(61-b)``) — exact
    bigint arithmetic, immune to float summation order — and the single
    float literal ``alpha·p²·2^(61-b)`` folds in Python so both engines
    parse the identical double.  No large-range correction: that patches
    32-bit hash saturation and a 60-bit space never saturates.
    """
    p = 2 ** b
    m = HASH_BITS - b
    alpha = _HLL_ALPHA.get(p, 0.7213 / (1.0 + 1.079 / p))
    num = alpha * p * p * float(2 ** (m + 1))
    h = hash60(F.col(value_col).cast("string"))
    rem = h.bitwiseAND(F.lit((1 << m) - 1))
    rho = (
        F.lit(m)
        - F.when(rem == 0, F.lit(0)).otherwise(F.length(F.bin(rem)))
        + F.lit(1)
    )
    regs = (
        df.select(
            *[F.col(c) for c in key_cols],
            F.shiftright(h, m).alias("_reg"),
            rho.alias("_rho"),
        )
        .groupBy(*key_cols, "_reg")
        .agg(F.max("_rho").alias("_mx"))
    )
    agg = regs.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_registers"),
        F.sum(
            F.pow(F.lit(2.0), F.lit(m + 1) - F.col("_mx")).cast("long")
        ).alias("_isum"),
    )
    isum_all = F.col("_isum") + (F.lit(p).cast("long") - F.col("n_registers")) * F.lit(
        2 ** (m + 1)
    ).cast("long")
    e_raw = F.lit(num) / isum_all.cast("double")
    v_empty = F.lit(p).cast("long") - F.col("n_registers")
    est = F.when(
        (e_raw <= F.lit(2.5 * p)) & (v_empty > 0),
        F.lit(float(p)) * F.log(F.lit(float(p)) / v_empty.cast("double")),
    ).otherwise(e_raw)
    return agg.select(
        *[F.col(c) for c in key_cols],
        "n_registers",
        F.round(est, round_to).alias("est_distinct"),
    )


def log_histogram_quantiles(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    buckets_per_decade: int = 20,
    round_to: int = 6,
) -> DataFrame:
    """Per-group approximate p50/p90/p99 from a LOG-BUCKET histogram
    sketch (HdrHistogram / DDSketch class): positive values land in
    bucket ``floor(log10(v)·B)`` (B buckets per decade → relative error
    ≤ 10^(1/2B)-1, ~5.9% at B=20), the per-group sketch is just bucket
    counts — MERGEABLE BY ADDITION, the property that distinguishes it
    from exact percentiles: two corpus snapshots' sketches, or a
    thousand executors' partials, combine with a cell-wise sum (here:
    plain map-side combine), while an exact percentile needs the full
    value multiset every time.

    Columns: ``*key_cols, n, p50, p90, p99`` — each pN is the midpoint
    ``10^((b+0.5)/B)`` of the smallest bucket whose cumulative count
    reaches rank ``⌈p·n⌉``.

    Engine-portability: ranks are computed with INTEGER rational
    arithmetic (⌈p·n⌉ = floor((p_num·n + p_den - 1)/p_den)) so no float
    boundary can disagree; the bucket index and midpoint are single
    log10/pow calls on literals both engines fold identically.

    Plan: one projection → groupBy(keys, bucket) with map-side combine
    (shuffle carries ≤ buckets·groups rows) → cumulative window per
    group (state: one running sum over ~dozens of buckets) → one
    conditional-min aggregate.  Non-positive / null values are excluded
    (log domain), counted nowhere — the DDSketch convention.
    """
    v = F.col(value_col).cast("double")
    b = F.floor(F.log10(v) * F.lit(buckets_per_decade)).cast("long")
    counts = (
        df.filter(v > 0)
        .select(*[F.col(c) for c in key_cols], b.alias("_b"))
        .groupBy(*key_cols, "_b")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    wk = Window.partitionBy(*key_cols)
    wcum = wk.orderBy("_b").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = counts.withColumn("_cum", F.sum("_c").over(wcum)).withColumn(
        "_n", F.sum("_c").over(wk)
    )

    def rank(num: int, den: int):
        # integer ceil(num*n/den)
        return F.floor(
            (F.lit(num) * F.col("_n") + F.lit(den - 1)) / F.lit(den)
        ).cast("long")

    def est(num: int, den: int):
        hit = F.min(
            F.when(F.col("_cum") >= rank(num, den), F.col("_b"))
        )
        return F.round(
            F.pow(
                F.lit(10.0),
                (hit.cast("double") + F.lit(0.5))
                / F.lit(float(buckets_per_decade)),
            ),
            round_to,
        )

    return cum.groupBy(*key_cols).agg(
        F.max("_n").cast("long").alias("n"),
        est(1, 2).alias("p50"),
        est(9, 10).alias("p90"),
        est(99, 100).alias("p99"),
    )


def bloom_positions(col: Column, m: int = 8192, k: int = 3) -> Column:
    """Array of the value's ``k`` Bloom bit positions in ``[0, m)``:
    position_i = hash60(i || value) mod m — k independent md5-seeded
    hashes, engine-portable (DuckDB twin:
    ``CAST(('0x' || substr(md5(CAST(i AS VARCHAR) || x), 1, 15)) AS
    BIGINT) % m``; hash60 is non-negative so both engines' ``%`` agree)."""
    return F.array(
        *[
            F.pmod(hash60(F.concat(F.lit(str(i)), col)), F.lit(m)).cast("int")
            for i in range(k)
        ]
    )


def bloom_build(
    df: DataFrame, value_col: str, m: int = 8192, k: int = 3
) -> DataFrame:
    """ONE-row frame holding the Bloom filter of ``value_col`` as the
    sorted array of set bit positions (Bloom 1970).  Build is a map-side-
    combined distinct over exploded positions (≤ m survivors regardless
    of input size) collapsed by collect_set — the filter is metadata-
    sized (m ≤ a few million bits) no matter how large the build corpus."""
    return (
        df.select(
            F.explode(bloom_positions(F.col(value_col), m, k)).alias("_p")
        )
        .distinct()
        .agg(F.array_sort(F.collect_set("_p")).alias("bits"))
    )


def bloom_probe(
    build: DataFrame,
    probe: DataFrame,
    value_col: str,
    m: int = 8192,
    k: int = 3,
) -> DataFrame:
    """Probe rows against a Bloom filter built from ``build``'s values:
    adds ``bloom_hit`` (true iff ALL k positions are set — no false
    negatives by construction; false-positive rate ~ (1-e^{-kn/m})^k).

    Scale shape (100 TB): the filter is ONE row (a sorted int array ≤ m
    entries) cross-broadcast to the probe side — the probe table NEVER
    shuffles and pays k binary-searchable array_contains checks per row.
    This is the membership pre-filter a pipeline puts in front of an
    expensive anti-join (seen-URL filtering, decontamination pre-pass):
    only bloom_hit rows proceed to the exact check, everything else
    skips it, and the filter itself costs one metadata-sized aggregate
    of the build side."""
    probed = probe.withColumn(
        "_ps", bloom_positions(F.col(value_col), m, k)
    )
    return (
        probed.join(F.broadcast(build))
        .withColumn(
            "bloom_hit",
            F.forall(F.col("_ps"), lambda p: F.array_contains(F.col("bits"), p)),
        )
        .drop("_ps", "bits")
    )


def cms_join_size(
    dfa: DataFrame,
    key_a: str,
    dfb: DataFrame,
    key_b: str,
    depth: int = 4,
    width: int = 256,
    round_to: int = 6,
) -> DataFrame:
    """Join-size estimation from Count-Min sketches (the AMS inner-
    product estimator, Alon-Matias-Szegedy 1996 / Cormode-Muthukrishnan
    2005): ``|A join B| = sum_k cntA(k) * cntB(k)`` is estimated by the
    MIN over sketch rows of the row-wise counter dot product -- the
    statistic a cost-based planner wants BEFORE running a 100 TB join,
    computable from two ``depth x width`` sketches that never see each
    other's data.  With A = B it estimates F2, the self-join size --
    the canonical skew statistic.

    Returns one row: ``n_keys_a, n_keys_b, exact, cms_est, rel_err``
    (the exact inner product is the certification denominator; a
    planner would ship only the sketches).  Always ``cms_est >= exact``
    (hash collisions only add mass).

    Plan: each side aggregates to per-key counts (map-side combined),
    sketches are ``depth x width`` cells built by :func:`cms_table`;
    the dot product joins the two sketch frames cell-wise (bounded), and
    the exact twin equi-joins the two per-key count frames -- key-
    cardinality-bounded, never raw-data-sized.
    """
    ca = (
        dfa.select(F.col(key_a).cast("string").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    cb = (
        dfb.select(F.col(key_b).cast("string").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    sa = cms_table(ca, "term", "wc", depth, width)
    sb = cms_table(cb, "term", "wc", depth, width)
    dots = (
        sa.alias("a")
        .join(
            sb.alias("b"),
            (F.col("a.row") == F.col("b.row"))
            & (F.col("a.bucket") == F.col("b.bucket")),
        )
        .groupBy(F.col("a.row").alias("row"))
        .agg(F.sum(F.expr("a.cnt * b.cnt")).alias("dot"))
    )
    est = dots.agg(F.min("dot").alias("cms_est"))
    exact = (
        ca.select("term", F.col("wc").alias("wa"))
        .join(cb.select("term", F.col("wc").alias("wb")), "term")
        .agg(F.sum(F.expr("wa * wb")).alias("exact"))
    )
    na = ca.agg(F.count(F.lit(1)).alias("n_keys_a"))
    nb = cb.agg(F.count(F.lit(1)).alias("n_keys_b"))
    return (
        na.join(F.broadcast(nb), F.lit(True))
        .join(F.broadcast(exact), F.lit(True))
        .join(F.broadcast(est), F.lit(True))
        .select(
            "n_keys_a",
            "n_keys_b",
            "exact",
            "cms_est",
            F.round(
                (F.col("cms_est") - F.col("exact"))
                / F.col("exact").cast("double"),
                round_to,
            ).alias("rel_err"),
        )
    )
