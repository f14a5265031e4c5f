"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the correctness baseline and an LSH-bucketed
variant as the scale path.  All distance math is JVM-side higher-order
functions (``zip_with`` + ``aggregate``) — no Python in the scoring loop;
the random-hyperplane projection for LSH is a tiny broadcast literal array.

Scale notes: brute force is a broadcast join of the (small) query set
against the corpus — O(Q×N) scored rows but no shuffle of the corpus;
top-k per query via window row_number (partial top-k pushed map-side by
AQE's partial aggregate is the eventual optimization; row_number keeps
semantics exact).  The LSH variants bucket both sides by MULTI-BAND
sign patterns (independent hyperplane groups, OR-amplified like
MinHash-LSH banding) so the join is an equi-join on (band, bucket):
recall amplifies with band count and no single skewed bucket owns the
candidate set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .common import ensure_min_partitions


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_sim(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _pair_sim(va: Column, vb: Column, na: Column, nb: Column) -> Column:
    """Cosine from HOISTED per-vector norms: norms are computed once per
    vector (before a vector fans out to many candidate pairs / band rows),
    so each pair pays one interpreted-HOF dot instead of three.  Bit-
    identical to ``cosine_sim`` — same norm expression, same fold order,
    just evaluated at a different plan position."""
    return F.round(_dot(va, vb) / (na * nb), 6)


def unit_vector(v: Column) -> Column:
    """v / ||v|| as double array — normalize once per row so pairwise
    cosine becomes a single dot product (projection pushed before joins)."""
    n = _norm(v)
    return F.transform(v, lambda x: x.cast("double") / n)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, rank, sim).

    Self-matches (same id) are excluded.  Deterministic ordering: sim desc,
    neighbor_id asc tie-break.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("qn", _norm(F.col("qv")))
    c = ensure_min_partitions(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    ).withColumn("cn", _norm(F.col("cv")))
    # queries are the small side — broadcast them so the corpus never
    # shuffles; vectors are dropped BEFORE the top-k window so its exchange
    # moves (query_id, neighbor_id, sim) rows, not 512-byte embeddings
    scored = c.join(
        F.broadcast(q), F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        _pair_sim(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def _l2_dist(a: Column, b: Column) -> Column:
    """Euclidean distance via the elementwise fold Σ(xᵢ-yᵢ)² — NOT the
    |a|²+|b|²-2a·b identity, which computes different doubles (and
    therefore different rounded ranks) than an elementwise engine.  The
    left-to-right fold is the cross-engine-reproducible form."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                a,
                b,
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def brute_force_topk_l2(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact Euclidean top-k: (query_id, neighbor_id, rank, dist) —
    the L2 twin of ``brute_force_topk`` (same broadcast-the-queries
    shape: the corpus never shuffles; vectors are dropped before the
    top-k window so the exchange moves scalar rows).  Distances are
    rounded to 6 BEFORE ranking (neighbor_id tiebreak), making ranks
    engine-portable the same way the cosine path's are."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = ensure_min_partitions(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = c.join(
        F.broadcast(q), F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        F.round(_l2_dist(F.col("qv"), F.col("cv")), 6).alias("dist"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "dist")
    )


def rrf_fuse(rankings: list[DataFrame], k: int = 5, c: int = 60) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of any
    number of (query_id, neighbor_id, rank) rankings — the standard
    hybrid-search combiner (e.g. dense cosine + lexical BM25, or two ANN
    metrics): ``rrf = Σ_r 1/(c + rank_r)``, which rewards agreement
    without ever comparing incommensurable scores.

    Columns: ``query_id, neighbor_id, rank, rrf_score, n_rankers``.
    Deterministic: rrf_score is a sum of exact reciprocals (addition of
    identical doubles is order-insensitive at this arity), tiebreak
    neighbor_id asc.

    Plan: unionAll of the (already top-k-sized) rankings → one
    groupBy(query, neighbor) with map-side combine → one query-keyed
    window.  Input to fusion is rankings-sized, never corpus-sized.
    """
    u = rankings[0].select("query_id", "neighbor_id", "rank")
    for r in rankings[1:]:
        u = u.unionByName(r.select("query_id", "neighbor_id", "rank"))
    scores = u.groupBy("query_id", "neighbor_id").agg(
        F.sum(F.lit(1.0) / (F.lit(float(c)) + F.col("rank").cast("double"))).alias(
            "_s"
        ),
        F.count(F.lit(1)).alias("n_rankers"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_s").desc(), F.col("neighbor_id").asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round(F.col("_s"), 6).alias("rrf_score"),
            "n_rankers",
        )
    )


def random_hyperplanes(dim: int, n_planes: int = 12, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim))


def banded_hyperplanes(
    dim: int, bands: int = 8, rows_per_band: int = 4, seed: int = 42
) -> np.ndarray:
    """Independent hyperplane groups for OR-amplified LSH (shape
    ``(bands, rows_per_band, dim)``): two vectors are candidates if ANY
    band's full sign pattern matches — same banding scheme MinHash-LSH
    uses, applied to random-hyperplane cosine sketches."""
    rng = np.random.RandomState(seed)
    return rng.normal(size=(bands, rows_per_band, dim))


def integer_planes(
    dim: int, bands: int = 8, rows_per_band: int = 4, seed: int = 42, scale: float = 1000.0
) -> np.ndarray:
    """Banded hyperplanes rounded to integer coordinates (stored as exact
    float64).  Paired with ``quantized_vec``, every plane dot product is a
    sum of integer products bounded far below 2^53, so float64 arithmetic
    is EXACT under any summation order — bucket ids become FP-portable and
    an external SQL oracle (DuckDB) reproduces them bit-for-bit.  Rounding
    the planes only perturbs the (already random) hash family; LSH recall
    guarantees are unchanged."""
    return np.rint(banded_hyperplanes(dim, bands, rows_per_band, seed) * scale)


def quantized_vec(vec: Column, bits: int = 20) -> Column:
    """floor(x * 2^bits) per element as double — an exact integer value
    (|x| ~ 1, dim 64, plane coords ≤ ~5e3 → |dot| ≤ ~1e12 < 2^53).  floor
    (not round) avoids half-to-even vs half-away divergence across engines."""
    s = float(1 << bits)
    return F.transform(vec, lambda x: F.floor(x.cast("double") * F.lit(s)).cast("double"))


def lsh_bucket(vec: Column, planes: np.ndarray) -> Column:
    """Sign-pattern bucket id from fixed random hyperplanes (literal array —
    pure Catalyst, no UDF)."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(float(x)) for x in plane])
        d = _dot(vec, plane_col)
        bucket = bucket + F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_band_buckets_udf(planes: np.ndarray):
    """Banded bucket ids via ONE numpy matmul per Arrow batch:
    ``(batch, dim) @ (dim, bands*rows)`` then sign-weighted sums — the
    vectorized fast path for many planes (Catalyst higher-order functions
    interpret each of the bands*rows dot products per element, measured
    ~10x slower at 8x4 planes).  Bucket ids only feed an equi-join, so the
    rare sign flip from a different FP summation order just moves a
    borderline candidate between (equally valid) buckets."""
    flat = planes.reshape(-1, planes.shape[-1]).T.copy()  # (dim, bands*rows)
    bands, rows = planes.shape[0], planes.shape[1]
    weights = (1 << np.arange(rows)).astype(np.int64)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def bk(vecs: pd.Series) -> pd.Series:
        m = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        signs = (m @ flat) >= 0
        buckets = (signs.reshape(len(m), bands, rows) * weights).sum(axis=2)
        return pd.Series(list(buckets.astype(np.int32)))

    return bk


def lsh_band_buckets(vec: Column, planes: np.ndarray) -> Column:
    """Array of per-band sign-pattern bucket ids (planes shaped
    (bands, rows, dim)); posexplode downstream yields the (band, bucket)
    equi-join key.  Multi-band = OR-amplification: recall rises with band
    count while each band's bucket stays selective, and a single skewed
    bucket no longer owns the whole candidate set."""
    return F.array(*[lsh_bucket(vec, planes[b]) for b in range(planes.shape[0])])


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    bands: int = 8,
    rows_per_band: int = 4,
    dim: int = 64,
    seed: int = 42,
    quantize_bits: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates share any band's bucket; same output
    shape as brute_force_topk (recall < 1 by construction, amplified by
    the band OR).  With ``quantize_bits`` set, bucketing runs on integer-
    quantized vectors against integer planes (see ``integer_planes``) so
    the candidate set is FP-portable / oracle-reproducible; similarity is
    still scored on the ORIGINAL vectors."""
    if quantize_bits is None:
        planes = banded_hyperplanes(dim, bands, rows_per_band, seed)
        bvec = lambda c: F.col(c)  # noqa: E731
    else:
        planes = integer_planes(dim, bands, rows_per_band, seed)
        bvec = lambda c: quantized_vec(F.col(c), quantize_bits)  # noqa: E731
    bk = lsh_band_buckets_udf(planes)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).select(
        "query_id",
        "qv",
        _norm(F.col("qv")).alias("qn"),
        F.posexplode(bk(bvec("qv"))).alias("band", "bucket"),
    )
    c = ensure_min_partitions(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    ).select(
        "neighbor_id",
        "cv",
        _norm(F.col("cv")).alias("cn"),
        F.posexplode(bk(bvec("cv"))).alias("band", "bucket"),
    )
    # score each candidate OCCURRENCE map-side (a pair matching in m bands
    # is scored m times — duplicates are rare, and sim is a deterministic
    # function of the pair so every occurrence agrees), then dedup on the
    # slim (query_id, neighbor_id, sim) rows: the dedup + top-k exchanges
    # never carry the embedding vectors
    scored = (
        q.join(c, ["band", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _pair_sim(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")).alias("sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def ivf_centroids(
    dim: int = 64, n_cells: int = 16, seed: int = 7, scale: float = 1000.0
) -> np.ndarray:
    """Fixed spherical codebook for IVF: ``n_cells`` random directions with
    integer-rounded coordinates (stored as exact float64).  Paired with
    ``quantized_vec``-style integer vectors, every centroid dot product is
    an exact integer in float64 (|dot| <= 64 * 2^20 * ~5e3 << 2^53), so the
    argmax cell assignment is FP-portable: numpy, Catalyst, and an external
    SQL oracle all pick the same cell bit-for-bit.  A data-independent
    codebook is a coarse quantizer of the sphere — recall tuning at scale
    comes from ``train_ivf_centroids`` (sampled k-means) instead."""
    rng = np.random.RandomState(seed)
    return np.rint(rng.normal(size=(n_cells, dim)) * scale)


def train_ivf_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    n_cells: int = 16,
    sample_rows: int = 100_000,
    seed: int = 7,
    iters: int = 10,
    scale: float = 1000.0,
) -> np.ndarray:
    """Data-adapted IVF codebook: spherical k-means on a BOUNDED driver-side
    sample (the standard IVF training recipe — at 100 TB the sample is a
    ``limit``-ed scan of ~1e5 rows, never a full collect), then integer
    rounding for FP-portable assignment.  Deterministic given (df order,
    seed): the sample is taken by ascending hash so partitioning does not
    change it."""
    sample = (
        df.select(F.col(vec_col).alias("v"))
        .withColumn("_h", F.xxhash64(F.col("v").cast("array<double>").cast("string")))
        .orderBy("_h")
        .limit(sample_rows)
        .collect()
    )
    m = np.array([r.v for r in sample], dtype=np.float64)
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    cents = m[rng.choice(len(m), size=min(n_cells, len(m)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ cents.T, axis=1)
        for c in range(len(cents)):
            mask = assign == c
            if mask.any():
                v = m[mask].mean(axis=0)
                cents[c] = v / max(np.linalg.norm(v), 1e-12)
    return np.rint(cents * scale)


def ivf_cells_udf(centroids: np.ndarray, n_probe: int, quantize_bits: int = 20):
    """Top-``n_probe`` nearest IVF cells per vector via ONE matmul per Arrow
    batch.  Vectors are floor-quantized to integers (exact in float64) so
    the centroid dots are exact integers — the stable argsort tie-breaks
    equal dots by ascending cell id, reproducibly across engines."""
    ct = centroids.T.copy()  # (dim, n_cells)
    s = float(1 << quantize_bits)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def cells(vecs: pd.Series) -> pd.Series:
        m = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        dots = np.floor(m * s) @ ct  # exact integer-valued f64
        order = np.argsort(-dots, axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(order.astype(np.int32)))

    return cells


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    dim: int = 64,
    seed: int = 7,
    centroids: np.ndarray | None = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """IVF-flat approximate top-k (the second ANN scale path, alongside
    ``lsh_topk``): corpus vectors live in their single nearest cell, each
    query probes its ``n_probe`` nearest cells, candidates meet on an
    EQUI-join on ``cell`` — never an all-pairs join — then exact cosine
    re-scores and a per-query window keeps the top k.

    Scale shape: with ``broadcast_queries`` (small query set) the corpus
    NEVER shuffles — a BroadcastHashJoin on ``cell`` prunes each corpus row
    against only same-cell queries, scoring ~``n_probe/n_cells`` of the
    brute-force pairs.  For large query sets, disable the broadcast and
    both sides shuffle once on ``cell`` (AQE handles hot cells).  Recall is
    tuned by ``n_probe`` (and a data-adapted codebook from
    ``train_ivf_centroids``); precision is exact by construction."""
    if centroids is None:
        centroids = ivf_centroids(dim, n_cells, seed)
    assign = ivf_cells_udf(centroids, 1)
    probe = ivf_cells_udf(centroids, n_probe)
    c = (
        ensure_min_partitions(corpus)
        .select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
        .withColumn("cn", _norm(F.col("cv")))
        .withColumn("cell", assign(F.col("cv")).getItem(0))
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).select(
        "query_id",
        "qv",
        _norm(F.col("qv")).alias("qn"),
        F.explode(probe(F.col("qv"))).alias("cell"),
    )
    if broadcast_queries:
        q = F.broadcast(q)
    # norms hoisted per vector; vectors dropped before the top-k window so
    # its exchange moves slim (query_id, neighbor_id, sim) rows only
    scored = (
        c.join(q, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _pair_sim(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def embedding_near_dups(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    bands: int = 8,
    rows_per_band: int = 4,
    dim: int = 64,
    seed: int = 42,
    quantize_bits: int | None = None,
    sim_hi: float | None = None,
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold within OR-amplified LSH
    band buckets (exact cosine re-check keeps precision exact; bands bound
    per-bucket skew and amplify recall vs a single sign pattern).

    The join is an EQUI-join on (band, bucket) — never a broadcast
    nested loop over all pairs (pinned by tests/test_plans.py).  With
    ``quantize_bits`` set, buckets come from integer-quantized vectors ×
    integer planes, making the candidate set FP-portable so a DuckDB
    oracle can reproduce the exact output (q_embed_neardup).

    ``sim_hi`` turns the threshold into the half-open band
    ``threshold <= sim < sim_hi`` — see ``hard_negative_pairs``."""
    if quantize_bits is None:
        planes = banded_hyperplanes(dim, bands, rows_per_band, seed)
        bucket_vec = F.col("v")
    else:
        planes = integer_planes(dim, bands, rows_per_band, seed)
        bucket_vec = quantized_vec(F.col("v"), quantize_bits)
    side = ensure_min_partitions(df).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).select(
        "id", "v",
        _norm(F.col("v")).alias("n"),
        F.posexplode(lsh_band_buckets_udf(planes)(bucket_vec)).alias("band", "bucket"),
    )
    a, b = side.alias("a"), side.alias("b")
    # score + threshold-filter each candidate occurrence MAP-side (sim is a
    # deterministic function of the pair, so band-duplicate occurrences
    # agree), then dedup on the slim (id_a, id_b, sim) survivors: the only
    # exchange after the band join moves ids + one double per surviving
    # pair instead of two 512-byte embedding vectors per raw candidate.
    # Measured 13.5s -> 5.0s on the sf0.1 table (local[32], best-of-3),
    # bit-identical output.
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            _pair_sim(F.col("a.v"), F.col("b.v"), F.col("a.n"), F.col("b.n")).alias(
                "sim"
            ),
        )
        .filter(
            (F.col("sim") >= F.lit(threshold))
            if sim_hi is None
            else (
                (F.col("sim") >= F.lit(threshold))
                & (F.col("sim") < F.lit(sim_hi))
            )
        )
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", "sim")
    )


def hard_negative_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sim_lo: float = 0.10,
    sim_hi: float = 0.35,
    bands: int = 8,
    rows_per_band: int = 4,
    dim: int = 64,
    seed: int = 42,
    quantize_bits: int | None = None,
) -> DataFrame:
    """Hard-negative mining for contrastive training: pairs that COLLIDE
    in some LSH band (so the hash family considers them related) yet whose
    exact cosine lands in the moderate band ``[sim_lo, sim_hi)`` — close
    enough to confuse an embedding model, far enough to be true negatives.
    The standard in-batch-negatives upgrade for retrieval/embedding
    fine-tuning data (e.g. DPR-style hard negatives), mined from the
    corpus itself with zero model calls.

    Same plan shape as ``embedding_near_dups`` (band equi-join, map-side
    scoring, slim dedup rows) — only the similarity band differs, so the
    100 TB judgment carries over unchanged."""
    return embedding_near_dups(
        df,
        id_col,
        vec_col,
        threshold=sim_lo,
        bands=bands,
        rows_per_band=rows_per_band,
        dim=dim,
        seed=seed,
        quantize_bits=quantize_bits,
        sim_hi=sim_hi,
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_cells: int = 16,
    dim: int = 64,
    seed: int = 7,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    embedding clusters.  Vectors are assigned to their nearest cell of the
    FP-portable integer codebook (same assignment as ``ivf_topk``),
    pairwise cosine runs ONLY within a cell (equi-self-join on ``cell`` —
    never all-pairs), and of any pair above ``threshold`` the paper keeps
    the document FARTHEST from its cluster centroid: a row is removed iff
    some same-cell row is >= threshold similar AND ranks strictly lower by
    (cosine-to-centroid, id).  Both comparisons use cosines rounded to
    6 dp, so the survivor SET is portable across engines (same discipline
    as ``embedding_near_dups``).  Returns survivors
    ``(id, cell, centroid_sim)``.

    Scale shape (100 TB): the only joins are the cell equi-self-join
    (n_cells is sized to the corpus — the paper uses ~sqrt(N) clusters via
    ``train_ivf_centroids``, so cells stay bounded and AQE splits hot
    ones) and a final LEFT ANTI on id; removed-id rows are slim (one long
    each) and the corpus vectors never broadcast.  The reference has no
    analog (its dedup surface stops at whole-document compare,
    ``evaluation/comparator.py``)."""
    if centroids is None:
        centroids = ivf_centroids(dim, n_cells, seed)
    assign = ivf_cells_udf(centroids, 1)
    # centroid vectors as one literal array-of-arrays, indexed by cell:
    # n_cells*dim integer literals — a tiny broadcast-free constant
    cent_arr = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
    )
    # the assigned/scored frame materializes ONCE (localCheckpoint) before
    # fanning out to both sides of the self-join and the survivor
    # anti-join — same double-compute defense as the dedup sketches;
    # without it the cell-assignment UDF re-evaluates per reference
    # (measured: 5 ArrowEvalPython stages in the plan, 1 after)
    side = (
        ensure_min_partitions(df)
        .select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .withColumn("cell", assign(F.col("v")).getItem(0))
        .withColumn("n", _norm(F.col("v")))
        .withColumn(
            "centroid_sim",
            F.round(
                _dot(F.col("v"), cent_arr[F.col("cell")])
                / (F.col("n") * _norm(cent_arr[F.col("cell")])),
                6,
            ),
        )
        .localCheckpoint(eager=False)
    )
    a, b = side.alias("a"), side.alias("b")
    removed = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell")) & (F.col("a.id") != F.col("b.id")),
        )
        .filter(
            _pair_sim(F.col("a.v"), F.col("b.v"), F.col("a.n"), F.col("b.n"))
            >= F.lit(threshold)
        )
        .filter(
            (F.col("b.centroid_sim") < F.col("a.centroid_sim"))
            | (
                (F.col("b.centroid_sim") == F.col("a.centroid_sim"))
                & (F.col("b.id") < F.col("a.id"))
            )
        )
        .select(F.col("a.id").alias("id"))
        .distinct()
    )
    return (
        side.join(removed, "id", "left_anti")
        .select("id", "cell", "centroid_sim")
    )


def pq_codebooks(
    dim: int = 64, m_sub: int = 4, n_codes: int = 16, seed: int = 11,
    scale: float = float(1 << 17),
) -> np.ndarray:
    """Fixed product-quantization codebooks, shape (m_sub, n_codes,
    dim/m_sub), integer-rounded coordinates stored as exact float64
    (Jegou et al. 2011, "Product Quantization for Nearest Neighbor
    Search").  The codebooks live directly in the QUANTIZED data space:
    unit-norm dim-64 vectors have components ~N(0, 1/8), so after
    ``quantized_vec``'s floor(x * 2^20) they are ~N(0, 2^20/8 = 2^17) —
    ``scale`` defaults to exactly that, keeping the code-dependent
    ``|c|^2`` and the data-dependent ``2 x_q.c`` distance terms on the
    same magnitude (a scale mismatch makes argmin degenerate to the
    smallest-norm code for every vector).  Like ``ivf_centroids``, a
    data-independent integer codebook keeps every distance term an exact
    integer in float64 (code assignment and ADC scoring become
    FP-portable / oracle-reproducible); data-adapted codebooks would
    come from per-subspace k-means on a bounded sample, the
    ``train_ivf_centroids`` recipe applied per subspace."""
    rng = np.random.RandomState(seed)
    return np.rint(rng.normal(size=(m_sub, n_codes, dim // m_sub)) * scale)


def _pq_dist_terms(codebooks: np.ndarray) -> np.ndarray:
    """Per-(subspace, code) constant ``|c|^2`` — the code-dependent half of
    the quantized-space squared-L2 surrogate ``|c|^2 - 2 x_q.c`` used for
    both encoding (argmin over codes) and ADC lookup tables.  All values
    are integers far below 2^53, so float64 arithmetic is exact."""
    return (codebooks ** 2).sum(axis=2)


def pq_encode_udf(codebooks: np.ndarray, quantize_bits: int = 20):
    """PQ codes per vector via ONE matmul per subspace per Arrow batch:
    vectors floor-quantize to integers, each subvector takes the code
    minimizing the exact-integer distance surrogate
    ``|c|^2 - 2*(x_q . c)`` (nearest-centroid L2 in quantized space, up
    to the code-independent ``|x_q|^2`` term).  numpy argmin's first-match
    tie-break = ascending code id, reproducibly across engines."""
    m_sub, n_codes, sub_dim = codebooks.shape
    s = float(1 << quantize_bits)
    const = _pq_dist_terms(codebooks)  # (m_sub, n_codes)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def codes(vecs: pd.Series) -> pd.Series:
        m = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        xq = np.floor(m * s).reshape(len(m), m_sub, sub_dim)
        out = np.empty((len(m), m_sub), dtype=np.int32)
        for i in range(m_sub):
            d = const[i] - 2.0 * (xq[:, i, :] @ codebooks[i].T)
            out[:, i] = np.argmin(d, axis=1)
        return pd.Series(list(out))

    return codes


def pq_lut_udf(codebooks: np.ndarray, quantize_bits: int = 20):
    """Per-query ADC lookup table (flattened m_sub*n_codes doubles): entry
    ``[s*n_codes + j] = |c_sj|^2 - 2*(q_qs . c_sj)`` — summing the
    entries selected by a corpus row's codes ranks candidates by
    approximate squared L2 in quantized space (the query's own ``|q_q|^2``
    term is constant per query and cancels in ranking).  Exact integers
    in float64 throughout."""
    m_sub, n_codes, sub_dim = codebooks.shape
    s = float(1 << quantize_bits)
    const = _pq_dist_terms(codebooks)

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def lut(vecs: pd.Series) -> pd.Series:
        m = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        xq = np.floor(m * s).reshape(len(m), m_sub, sub_dim)
        tabs = np.empty((len(m), m_sub, n_codes), dtype=np.float64)
        for i in range(m_sub):
            tabs[:, i, :] = const[i] - 2.0 * (xq[:, i, :] @ codebooks[i].T)
        return pd.Series(list(tabs.reshape(len(m), m_sub * n_codes)))

    return lut


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    m_sub: int = 4,
    n_codes: int = 16,
    dim: int = 64,
    seed: int = 7,
    pq_seed: int = 11,
    broadcast_queries: bool = True,
    codebooks: np.ndarray | None = None,
    rerank: int | None = None,
) -> DataFrame:
    """IVF-PQ approximate top-k (the FAISS IVFPQ shape, Jegou et al. 2011):
    IVF cells prune candidates (equi-join on ``cell`` — never all-pairs),
    then PQ asymmetric-distance lookup tables score them in the COMPRESSED
    domain — per pair, ``m_sub`` array indexings instead of a ``dim``-wide
    dot product, and the corpus embedding vectors never leave the scan
    (only ``m_sub`` int32 codes + the cell id travel through the join).

    Scale shape (100 TB): the corpus never shuffles (BroadcastHashJoin on
    cell against the small query side); the per-candidate cost drops from
    O(dim) interpreted HOF math to O(m_sub) JVM ``element_at`` lookups;
    the top-k window moves slim (query_id, neighbor_id, adc) rows.  Codes
    here quantize RAW subvectors; residual encoding (subtract the cell
    centroid first) is the same plumbing with per-cell LUTs.  Integer
    codebooks x floor-quantized vectors keep every distance term an exact
    integer in float64, so code assignment, LUTs, and the final ranking
    are FP-portable and DuckDB-certifiable (q_ivfpq_topk).  Returns
    (query_id, neighbor_id, rank, adc) — adc ascending = nearer.

    ``rerank=R`` adds the production second stage: the ADC shortlist of
    the R nearest codes per query re-scores with EXACT cosine and returns
    (query_id, neighbor_id, rank, sim) instead.  ADC cannot rank within a
    tight cluster (same-cluster vectors share codes, so their distance
    table sums tie) — the shortlist+rerank shape is how FAISS closes that
    gap while still paying full-width math for only R rows per query.
    The shortlist (with query vectors attached) broadcasts back onto the
    corpus scan, so the corpus STILL never shuffles."""
    cents = ivf_centroids(dim, n_cells, seed)
    books = (
        codebooks
        if codebooks is not None
        else pq_codebooks(dim, m_sub, n_codes, pq_seed)
    )
    assign = ivf_cells_udf(cents, 1)
    probe = ivf_cells_udf(cents, n_probe)
    enc = pq_encode_udf(books)
    lut = pq_lut_udf(books)
    c = (
        ensure_min_partitions(corpus)
        .select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
        .withColumn("cell", assign(F.col("cv")).getItem(0))
        .withColumn("codes", enc(F.col("cv")))
        .drop("cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).select(
        "query_id",
        lut(F.col("qv")).alias("lut"),
        F.explode(probe(F.col("qv"))).alias("cell"),
    )
    if broadcast_queries:
        q = F.broadcast(q)
    adc = sum(
        F.element_at(
            F.col("lut"), F.lit(s * n_codes + 1) + F.col("codes")[s]
        )
        for s in range(m_sub)
    ).cast("long")
    scored = (
        c.join(q, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", adc.alias("adc"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id").asc()
    )
    if rerank is None:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "adc")
        )
    short = (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= rerank)
        .select("query_id", "neighbor_id")
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("qn", _norm(F.col("qv")))
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    ).withColumn("cn", _norm(F.col("cv")))
    rescored = cv.join(
        F.broadcast(short.join(qv, "query_id")), "neighbor_id"
    ).select(
        "query_id",
        "neighbor_id",
        _pair_sim(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")).alias("sim"),
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def ann_recall(
    approx: DataFrame,
    exact: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Recall@k self-evaluation for an ANN path: fraction of each query's
    EXACT top-k neighbors recovered by the approximate top-k (both inputs
    in the (query_id, neighbor_id, rank) shape that ``lsh_topk`` /
    ``ivf_topk`` / ``ivfpq_topk`` / ``brute_force_topk`` share).  The
    index quality gate a training-data pipeline runs before trusting an
    ANN path for semantic dedup at 100 TB — measured on a sampled query
    set exactly like this, never on the full corpus.

    Scale shape: both inputs are top-k frames (|Q| x k rows — sampled-
    query-set sized, not corpus sized); one equi-join on (query_id,
    neighbor_id) and one per-query aggregate."""
    a = approx.filter(F.col("rank") <= k).select(
        "query_id", "neighbor_id", F.lit(1).alias("_found")
    )
    e = exact.filter(F.col("rank") <= k).select("query_id", "neighbor_id")
    return (
        e.join(a, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("exact_k"),
            F.count("_found").alias("hits"),
        )
        .select(
            "query_id",
            F.col("hits").cast("int").alias("hits"),
            F.round(F.col("hits") / F.col("exact_k"), 6).alias("recall"),
        )
    )


def train_pq_codebooks(
    df: DataFrame,
    vec_col: str = "embedding",
    m_sub: int = 4,
    n_codes: int = 16,
    dim: int = 64,
    sample_rows: int = 100_000,
    seed: int = 11,
    iters: int = 10,
    quantize_bits: int = 20,
) -> np.ndarray:
    """Data-adapted PQ codebooks: per-subspace k-means on a BOUNDED
    driver-side sample (the Jegou et al. 2011 training recipe; at 100 TB
    the sample is a ``limit``-ed scan of ~1e5 rows, never a full
    collect), run directly in quantized-integer space and integer-rounded
    so assignment/ADC stay FP-portable.  Deterministic given (df, seed):
    the sample is taken by ascending hash so partitioning does not change
    it (the ``train_ivf_centroids`` discipline).  Random codebooks
    (``pq_codebooks``) are distortion-heavy on real data — trained ones
    are what make ADC ranking track true distance."""
    sample = (
        df.select(F.col(vec_col).alias("v"))
        .withColumn("_h", F.xxhash64(F.col("v").cast("array<double>").cast("string")))
        .orderBy("_h")
        .limit(sample_rows)
        .collect()
    )
    s = float(1 << quantize_bits)
    m = np.floor(np.array([r.v for r in sample], dtype=np.float64) * s)
    sub_dim = dim // m_sub
    rng = np.random.RandomState(seed)
    books = np.empty((m_sub, n_codes, sub_dim), dtype=np.float64)
    for i in range(m_sub):
        x = m[:, i * sub_dim : (i + 1) * sub_dim]
        cents = x[rng.choice(len(x), size=min(n_codes, len(x)), replace=False)]
        for _ in range(iters):
            d = (cents**2).sum(axis=1) - 2.0 * (x @ cents.T)
            assign = np.argmin(d, axis=1)
            for c in range(len(cents)):
                mask = assign == c
                if mask.any():
                    cents[c] = x[mask].mean(axis=0)
        books[i] = np.rint(cents)
    return books


def mmr_select(
    candidates: DataFrame,
    k: int = 3,
    lam: float = 0.7,
    id_col: str = "neighbor_id",
    vec_col: str = "cv",
    rel_col: str = "rel",
) -> DataFrame:
    """Maximal Marginal Relevance selection (Carbonell & Goldstein 1998):
    from each query's candidate set, iteratively pick the item maximizing
    ``lam * relevance - (1-lam) * max_similarity_to_already_selected`` —
    the diversity-aware re-ranker a training-data pipeline runs after ANN
    retrieval (diverse few-shot example selection, dedup-aware context
    assembly) so the k picks don't all say the same thing.

    Input: (query_id, ``id_col``, ``vec_col``, ``rel_col``) — one row per
    candidate, ``rel_col`` already rounded (the ANN paths' 6-dp cosine).
    Returns (query_id, ``id_col``, mmr_rank, mmr_score).

    Determinism/portability: pairwise similarities and every iteration's
    MMR objective are rounded to 6 dp before the per-query argmax
    (neighbor-id tiebreak), so a SQL oracle unrolling the same k
    iterations agrees bit-for-bit.

    Scale shape (100 TB): candidate sets are ANN-output sized (tens of
    rows per query, NEVER corpus-sized), so each of the k-1 rounds is a
    broadcast join of the per-query selected set (≤ k rows/query) against
    the candidate frame plus one per-query argmax window — all JVM-side
    HOF math, no Python, no corpus shuffle."""
    cand = candidates.select(
        "query_id",
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("v"),
        F.col(rel_col).alias("rel"),
    ).withColumn("n", _norm(F.col("v"))).localCheckpoint(eager=False)

    w = Window.partitionBy("query_id").orderBy(
        F.col("_score").desc(), F.col("cid").asc()
    )
    # round 1: pure relevance
    selected = (
        cand.withColumn("_score", F.col("rel"))
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select(
            "query_id",
            "cid",
            "v",
            "n",
            F.lit(1).alias("mmr_rank"),
            F.round(F.col("_score"), 6).alias("mmr_score"),
        )
        .localCheckpoint(eager=False)
    )
    for step in range(2, k + 1):
        sel = selected.select(
            "query_id",
            F.col("cid").alias("sid"),
            F.col("v").alias("sv"),
            F.col("n").alias("sn"),
        )
        remaining = cand.join(
            selected.select("query_id", "cid"), ["query_id", "cid"], "left_anti"
        )
        scored = (
            remaining.join(F.broadcast(sel), "query_id")
            .select(
                "query_id",
                "cid",
                "rel",
                _pair_sim(
                    F.col("v"), F.col("sv"), F.col("n"), F.col("sn")
                ).alias("_sim"),
            )
            .groupBy("query_id", "cid", "rel")
            .agg(F.max("_sim").alias("_maxsim"))
            .withColumn(
                "_score",
                F.round(
                    F.lit(lam) * F.col("rel")
                    - F.lit(1.0 - lam) * F.col("_maxsim"),
                    6,
                ),
            )
        )
        pick = (
            scored.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") == 1)
            .select(
                "query_id",
                "cid",
                F.lit(step).alias("mmr_rank"),
                F.col("_score").alias("mmr_score"),
            )
            .join(cand.select("query_id", "cid", "v", "n"), ["query_id", "cid"])
            .select(
                "query_id", "cid", "v", "n", "mmr_rank", "mmr_score"
            )
        )
        selected = selected.unionByName(pick).localCheckpoint(eager=False)
    return selected.select(
        "query_id",
        F.col("cid").alias(id_col),
        "mmr_rank",
        "mmr_score",
    )


def centroid_drift(
    df: DataFrame,
    group_col: str,
    vec_col: str,
    scale: int = 1_000_000,
    round_to: int = 6,
) -> DataFrame:
    """Pairwise cosine similarity between per-group embedding CENTROIDS
    — the embedding-space drift monitor: compare sources, snapshots, or
    label clusters by where their mass sits, without any per-row pair
    join (the q_psi_drift idea lifted from histograms to vector space).

    Exactness at scale: float centroids are order-of-summation
    dependent, so each component is first quantized to an int64
    ``floor(v·scale + 0.5)`` and summed EXACTLY; the pair stage
    accumulates dot/norm products of those integer sums in
    decimal(38,0) (Spark) / HUGEINT (DuckDB) — still exact — and only
    the final cosine casts to double: one sqrt-divide over identical
    integers in any engine, at any partitioning, in any row order.

    Columns: ``group_a, group_b, dim, cos_sim`` for every unordered
    group pair (group_a < group_b lexically).

    Scale shape: one posexplode to (group, dim, q) — corpus×dim rows
    but map-side combinable — collapses to groups×dim integer sums;
    the pair join runs on that metadata-sized frame (groups²·dim rows).
    The corpus is touched exactly once."""
    comp = (
        df.select(
            F.col(group_col).cast("string").alias("g"),
            F.posexplode(F.col(vec_col)).alias("dim", "v"),
        )
        .select(
            "g",
            "dim",
            F.floor(
                F.col("v").cast("double") * F.lit(float(scale)) + F.lit(0.5)
            ).alias("q"),
        )
        .groupBy("g", "dim")
        .agg(F.sum("q").alias("sq"))
        .localCheckpoint(eager=False)
    )
    a = comp.select(
        F.col("g").alias("group_a"), "dim", F.col("sq").alias("qa")
    )
    b = comp.select(
        F.col("g").alias("group_b"),
        F.col("dim").alias("dim_b"),
        F.col("sq").alias("qb"),
    )
    dec = "decimal(38,0)"
    pairs = a.join(
        b,
        (F.col("dim") == F.col("dim_b"))
        & (F.col("group_a") < F.col("group_b")),
    ).groupBy("group_a", "group_b").agg(
        F.count(F.lit(1)).alias("dim"),
        F.sum(
            (F.col("qa").cast(dec) * F.col("qb").cast(dec))
        ).alias("_dot"),
        F.sum(
            (F.col("qa").cast(dec) * F.col("qa").cast(dec))
        ).alias("_na"),
        F.sum(
            (F.col("qb").cast(dec) * F.col("qb").cast(dec))
        ).alias("_nb"),
    )
    cos = F.col("_dot").cast("double") / (
        F.sqrt(F.col("_na").cast("double"))
        * F.sqrt(F.col("_nb").cast("double"))
    )
    return pairs.select(
        "group_a",
        "group_b",
        "dim",
        F.round(
            F.when((F.col("_na") > 0) & (F.col("_nb") > 0), cos), round_to
        ).alias("cos_sim"),
    )


def random_projection_audit(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_dim: int = 8,
    quantize_bits: int = 20,
    round_to: int = 6,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection with a built-in distortion
    audit: project each vector through a DETERMINISTIC ±1 sign matrix
    (sign(i,j) = parity of the last md5 hex digit of "i:j" — a portable
    seeded matrix no engine has to ship) and report, for each adjacent
    id pair, the squared L2 distance before and after projection plus
    the JL ratio ``d²_proj / (k · d²_orig)`` (≈1 when the projection
    preserves geometry; E[‖Sx‖²] = k‖x‖² for ±1 entries).

    Exactness: vectors are floor-quantized to integers
    (``quantized_vec``), so projections are ±1 integer sums and both
    distances are integer-exact in float64 under ANY summation order —
    the ratio is the only rounding site.

    Scale shape: one posexplode (dim rows per vector) + a broadcast join
    against the dim×k sign table + one (id, j) aggregate — the shape a
    10^12-row projection job wants (no per-row Python, no driver matrix
    shipping); the audit pair join is id-adjacent equi.

    Columns: ``id_a, id_b, d2_orig, d2_proj, jl_ratio``.
    """
    spark = emb.sparkSession
    q = emb.select(
        F.col(id_col).alias("id"), quantized_vec(F.col(vec_col), quantize_bits).alias("q")
    )
    q = q.localCheckpoint(eager=False)  # fans out: cells + orig distances
    dim = len(emb.select(vec_col).first()[0])
    even = [str(c) for c in "02468ace"]
    signs = (
        spark.range(dim)
        .select(F.col("id").cast("int").alias("i"))
        .select("i", F.explode(F.sequence(F.lit(0), F.lit(out_dim - 1))).alias("j"))
        .withColumn(
            "s",
            F.when(
                F.substring(F.md5(F.concat_ws(":", "i", "j")), 32, 1).isin(even),
                F.lit(1.0),
            ).otherwise(F.lit(-1.0)),
        )
    )
    cells = q.select("id", F.posexplode("q").alias("i", "x"))
    proj = (
        cells.join(F.broadcast(signs), "i")
        .groupBy("id", "j")
        .agg(F.sum(F.col("x") * F.col("s")).alias("p"))
    )
    pa = proj.select(F.col("id").alias("id_a"), "j", F.col("p").alias("pa"))
    pb = proj.select((F.col("id") - 1).alias("id_a"), "j", F.col("p").alias("pb"))
    d2p = (
        pa.join(pb, ["id_a", "j"])
        .groupBy("id_a")
        .agg(F.sum((F.col("pa") - F.col("pb")) * (F.col("pa") - F.col("pb"))).alias("d2_proj"))
    )
    qa = q.select(F.col("id").alias("id_a"), F.col("q").alias("qa"))
    qb = q.select((F.col("id") - 1).alias("id_a"), F.col("q").alias("qb"))
    d2o = qa.join(qb, "id_a").select(
        "id_a",
        (F.col("id_a") + 1).alias("id_b"),
        F.aggregate(
            F.zip_with("qa", "qb", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("d2_orig"),
    )
    return d2o.join(d2p, "id_a").select(
        "id_a",
        "id_b",
        "d2_orig",
        "d2_proj",
        F.round(
            F.when(
                F.col("d2_orig") > 0,
                F.col("d2_proj") / (F.lit(float(out_dim)) * F.col("d2_orig")),
            ),
            round_to,
        ).alias("jl_ratio"),
    )


def scalar_quantize_audit(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 255,
    quantize_bits: int = 20,
    round_to: int = 6,
) -> DataFrame:
    """Per-vector int8 scalar quantization with reconstruction-error
    audit — the 4×-compression baseline every vector store offers
    (codes = floor((x−min)·L/(max−min)) against the vector's own
    min/max).  Reports the exact scaled squared error and the MSE in
    original units, plus a position-weighted code checksum that pins the
    code vector itself.

    Exactness: everything runs in the floor-quantized integer domain —
    ``err·L = q·L − (min·L + code·(max−min))`` is an integer, so the
    error sum is exact in float64 under any order; MSE is the single
    final division.  Constant vectors quantize to code 0 with zero
    error.

    Scale shape: pure per-row higher-order-function algebra (transform /
    aggregate / zip_with) — no shuffle at all; the 10^12-row case is
    embarrassingly parallel scan work.

    Columns: ``id, qmin, qmax, code_checksum, sse_scaled, mse_ppm``.
    """
    L = float(levels)
    q = emb.select(
        F.col(id_col).alias("id"),
        quantized_vec(F.col(vec_col), quantize_bits).alias("q"),
    )
    mn, mx = F.array_min("q"), F.array_max("q")
    rng = (mx - mn).alias("rng")
    base = q.select("id", "q", mn.alias("mn"), mx.alias("mx"), rng)
    codes = F.when(
        F.col("rng") > 0,
        F.transform(
            "q",
            lambda x: F.floor((x - F.col("mn")) * F.lit(L) / F.col("rng")).cast(
                "double"
            ),
        ),
    ).otherwise(F.transform("q", lambda x: F.lit(0.0)))
    scored = base.withColumn("codes", codes).select(
        "id",
        F.col("mn").alias("qmin"),
        F.col("mx").alias("qmax"),
        F.aggregate(
            F.zip_with(
                "codes",
                F.sequence(F.lit(1), F.size("codes")),
                lambda c, i: c * i.cast("double"),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("code_checksum"),
        F.aggregate(
            F.zip_with(
                "q",
                "codes",
                lambda x, c: (
                    x * F.lit(L) - (F.col("mn") * F.lit(L) + c * F.col("rng"))
                )
                * (x * F.lit(L) - (F.col("mn") * F.lit(L) + c * F.col("rng"))),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("sse_scaled"),
        F.size("q").alias("_d"),
    )
    scale = float((1 << quantize_bits)) ** 2 * L * L
    return scored.select(
        "id",
        "qmin",
        "qmax",
        "code_checksum",
        "sse_scaled",
        # MSE reported in parts-per-million of original units² (raw MSE is
        # ~1e-6 for unit-norm vectors — ppm keeps 6-dp rounding meaningful)
        F.round(
            F.col("sse_scaled")
            * F.lit(1e6)
            / (F.col("_d").cast("double") * F.lit(scale)),
            round_to,
        ).alias("mse_ppm"),
    )


def anisotropy_audit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    sample_mod: int = 7,
    round_to: int = 6,
) -> DataFrame:
    """Embedding-space anisotropy audit (Ethayarajh 2019): the mean
    cosine between UNRELATED vector pairs — in a healthy isotropic
    space it hovers near 0; contextual-encoder spaces often average
    0.5+, which silently breaks every "cosine > τ" dedup/ANN threshold
    calibrated on the unit sphere.  The check to run BEFORE trusting
    q_embed_neardup's τ on a new embedding model.

    Pairing is deterministic: the hash-sampled vectors (id % mod == 0)
    are ranked by id and row i pairs with row i + n/2 — disjoint 1:1
    pairs, no O(n²) cross join.

    Returns ONE row: ``n_pairs, mean_cos, sd_cos, frac_above_05,
    min_cos, max_cos``.

    Plan: the sample filter pushes to the scan; one rank window over
    the SAMPLE (audit-sized by construction), one self equi-join on
    rank, JVM-side zip_with/aggregate dot products, ONE aggregate.
    """
    d = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).filter((F.col("_id") % sample_mod == 0) & F.col("_v").isNotNull())
    w = Window.orderBy("_id")
    ranked = d.select(
        "_v", (F.row_number().over(w) - 1).alias("_r")
    )
    nrow = ranked.agg(F.count(F.lit(1)).alias("_n"))
    half = ranked.crossJoin(F.broadcast(nrow)).withColumn(
        "_h", (F.col("_n") / 2).cast("int")
    )
    left = half.filter(F.col("_r") < F.col("_h")).select(
        "_r", F.col("_v").alias("_a")
    )
    right = half.filter(F.col("_r") >= F.col("_h")).select(
        (F.col("_r") - F.col("_h")).alias("_r"), F.col("_v").alias("_b")
    )
    dot = lambda x, y: F.aggregate(  # noqa: E731
        F.zip_with(x, y, lambda p, q: p * q),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )
    pairs = left.join(right, "_r").select(
        (
            dot(F.col("_a"), F.col("_b"))
            / (
                F.sqrt(dot(F.col("_a"), F.col("_a")))
                * F.sqrt(dot(F.col("_b"), F.col("_b")))
            )
        ).alias("_c")
    )
    a = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.avg("_c").alias("_m"),
        F.stddev_samp("_c").alias("_s"),
        F.avg((F.col("_c") > 0.5).cast("double")).alias("_f"),
        F.min("_c").alias("_mn"),
        F.max("_c").alias("_mx"),
    )
    return a.select(
        "n_pairs",
        F.round("_m", round_to).alias("mean_cos"),
        F.round("_s", round_to).alias("sd_cos"),
        F.round("_f", round_to).alias("frac_above_05"),
        F.round("_mn", round_to).alias("min_cos"),
        F.round("_mx", round_to).alias("max_cos"),
    )


def ivf_silhouette(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids,
    quantize_bits: int = 20,
    round_to: int = 6,
) -> DataFrame:
    """Simplified (centroid-based) silhouette of an IVF codebook
    (Hruschka et al. 2004 variant of Rousseeuw 1987): per vector,
    cosine distance ``a`` to its OWN cell centroid and ``b`` to the
    best OTHER cell; ``s = (b − a)/max(a, b)`` — the clustering-quality
    audit that says whether the codebook's cells are real structure
    (s → 1) or arbitrary partitions (s → 0) before anyone trusts
    IVF recall numbers.  Centroid-based, so it costs O(n·k), never the
    O(n²) of the exact silhouette.

    Cell assignment uses the same floor-quantized integer dots as
    ``ivf_topk`` (exact in f64 ⇒ engine-portable argmax, cell-id tie
    break).

    Returns one row per cell: ``cell, n, mean_cos_own, mean_sil``.

    Plan: the centroid table is a LITERAL inline array (metadata) — the
    corpus explodes k× into (vector, cell) rows, dots are JVM-side
    zip_with/aggregate, the top-2 pick is a per-vector window over k
    rows (thousands of tiny partitions), then one cell aggregate.  No
    joins, no Python.
    """
    import numpy as np

    cents = np.asarray(centroids, dtype=np.float64)
    k = len(cents)
    s = float(1 << quantize_bits)
    cent_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("cell"),
                F.array(*[F.lit(float(x)) for x in c]).alias("cv"),
            )
            for i, c in enumerate(cents)
        ]
    )
    dot = lambda x, y: F.aggregate(  # noqa: E731
        F.zip_with(x, y, lambda p, q: p * q),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )
    base = df.select(
        F.col(id_col).alias("_id"),
        F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: F.floor(x * F.lit(s)),
        ).alias("_q"),
    ).filter(F.size("_q") > 0)
    per_cell = base.select(
        "_id", "_q", F.explode(cent_arr).alias("_c")
    ).select(
        "_id",
        F.col("_c.cell").alias("cell"),
        (
            dot(F.col("_q"), F.col("_c.cv"))
            / (
                F.sqrt(dot(F.col("_q"), F.col("_q")))
                * F.sqrt(dot(F.col("_c.cv"), F.col("_c.cv")))
            )
        ).alias("_cos"),
    )
    w = Window.partitionBy("_id").orderBy(
        F.col("_cos").desc(), F.col("cell")
    )
    top2 = per_cell.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= 2
    )
    per_vec = top2.groupBy("_id").agg(
        F.max(F.when(F.col("_rn") == 1, F.col("cell"))).alias("cell"),
        F.max(F.when(F.col("_rn") == 1, F.col("_cos"))).alias("_c1"),
        F.max(F.when(F.col("_rn") == 2, F.col("_cos"))).alias("_c2"),
    )
    a = F.lit(1.0) - F.col("_c1")
    b = F.lit(1.0) - F.col("_c2")
    sil = F.when(
        F.greatest(a, b) > 0, (b - a) / F.greatest(a, b)
    ).otherwise(F.lit(0.0))
    return per_vec.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.avg("_c1"), round_to).alias("mean_cos_own"),
        F.round(F.avg(sil), round_to).alias("mean_sil"),
    )
