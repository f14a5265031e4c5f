"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the correctness baseline and an LSH-bucketed
variant as the scale path.  All distance math is JVM-side higher-order
functions (``zip_with`` + ``aggregate``) — no Python in the scoring loop;
the random-hyperplane projection for LSH is a tiny broadcast literal array.

Scale notes: brute force is a broadcast join of the (small) query set
against the corpus — O(Q×N) scored rows but no shuffle of the corpus;
top-k per query via window row_number (partial top-k pushed map-side by
AQE's partial aggregate is the eventual optimization; row_number keeps
semantics exact).  The LSH variant buckets both sides by sign-pattern so
the join is an equi-join on bucket id.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

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
    )
    c = ensure_min_partitions(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    # queries are the small side — broadcast them so the corpus never shuffles
    scored = c.join(
        F.broadcast(q), F.col("query_id") != F.col("neighbor_id")
    ).withColumn("sim", F.round(cosine_sim(F.col("qv"), F.col("cv")), 6))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def random_hyperplanes(dim: int, n_planes: int = 12, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim))


def lsh_bucket(vec: Column, planes: np.ndarray) -> Column:
    """Sign-pattern bucket id from fixed random hyperplanes (literal array —
    pure Catalyst, no UDF)."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(float(x)) for x in plane])
        d = _dot(vec, plane_col)
        bucket = bucket + F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket; same output shape
    as brute_force_topk (recall < 1 by construction)."""
    planes = random_hyperplanes(dim, n_planes, seed)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("bucket", lsh_bucket(F.col("qv"), planes))
    c = ensure_min_partitions(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    ).withColumn("bucket", lsh_bucket(F.col("cv"), planes))
    scored = (
        q.join(c, ["bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", F.round(cosine_sim(F.col("qv"), F.col("cv")), 6))
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
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold within LSH buckets."""
    planes = random_hyperplanes(dim, n_planes, seed)
    side = ensure_min_partitions(df).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).withColumn(
        "bucket", lsh_bucket(F.col("v"), planes)
    )
    a, b = side.alias("a"), side.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .withColumn("sim", F.round(cosine_sim(F.col("a.v"), F.col("b.v")), 6))
        .filter(F.col("sim") >= F.lit(threshold))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "sim")
    )
