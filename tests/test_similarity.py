"""Similarity search: exact baseline vs numpy oracle, and multi-band LSH
recall amplification vs a single band."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from accelerated_intelligent_document_processing_on_aws_spark import get_spark

    yield get_spark(master="local[4]", shuffle_partitions=8)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def _numpy_topk(vecs: dict, qids, k=5):
    ids = sorted(vecs)
    m = np.array([vecs[i] for i in ids], dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    out = {}
    for q in qids:
        sims = m @ (m[ids.index(q)])
        order = sorted(
            ((s, i) for s, i in zip(sims, ids) if i != q),
            key=lambda t: (-t[0], t[1]),
        )
        out[q] = [i for _, i in order[:k]]
    return out


def test_brute_force_matches_numpy(spark, emb):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.similarity import (
        brute_force_topk,
    )

    vecs = {r.vec_id: r.embedding for r in emb.collect()}
    qids = sorted(vecs)[:5]
    want = _numpy_topk(vecs, qids, k=5)
    got = {}
    q = emb.filter(F.col("vec_id").isin(qids))
    for r in brute_force_topk(emb, q, k=5).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.neighbor_id))
    got = {k: [n for _, n in sorted(v)] for k, v in got.items()}
    assert got == want


def test_multiband_recall_amplifies(spark, emb):
    """OR over independent hyperplane bands must not lose candidates vs one
    band and should recover a healthy fraction of the exact top-k."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.similarity import (
        brute_force_topk,
        lsh_topk,
    )

    qids = list(range(10))
    q = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, q, k=5).collect()
    }

    def recall(bands):
        approx = {
            (r.query_id, r.neighbor_id)
            for r in lsh_topk(
                emb, q, k=5, bands=bands, rows_per_band=4, dim=64
            ).collect()
        }
        return len(approx & exact) / len(exact)

    r1, r8 = recall(1), recall(8)
    assert r8 >= r1
    assert r8 >= 0.5, f"multi-band recall too low: {r8}"


def test_near_dups_precision_exact(spark, emb):
    """Banded near-dup output must be a SUBSET of the exact all-pairs result
    (the cosine re-check keeps precision exact)."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.similarity import (
        embedding_near_dups,
        unit_vector,
    )

    thr = 0.38
    e = emb.select("vec_id", unit_vector(F.col("embedding")).alias("uv"))
    a = e.select(F.col("vec_id").alias("id_a"), F.col("uv").alias("ua"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("uv").alias("ub"))
    dot = F.aggregate(
        F.zip_with(F.col("ua"), F.col("ub"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    exact = {
        (r.id_a, r.id_b)
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("sim", F.round(dot, 6))
        .filter(F.col("sim") >= thr)
        .collect()
    }
    approx = {
        (r.id_a, r.id_b)
        for r in embedding_near_dups(emb, threshold=thr, bands=8).collect()
    }
    assert approx <= exact
    if exact:
        assert len(approx) / len(exact) >= 0.4  # OR-amplified recall floor
