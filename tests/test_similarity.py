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


def test_ivf_topk_candidates_and_precision(spark, emb):
    """IVF results must (a) come only from probed cells, (b) rank by exact
    cosine — every returned (query, neighbor, sim) must agree with the
    brute-force sim for that pair, and ranks must be dense from 1."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    q = emb.filter(F.col("vec_id") < 5)
    ivf = ivf_topk(emb, q, k=5, n_cells=16, n_probe=4).collect()
    assert ivf, "IVF returned no rows"
    exact_sims = {
        (r.query_id, r.neighbor_id): r.sim
        for r in brute_force_topk(emb, q, k=10**9).collect()
    }
    by_q = {}
    for r in ivf:
        assert abs(exact_sims[(r.query_id, r.neighbor_id)] - r.sim) < 1e-9
        by_q.setdefault(r.query_id, []).append(r.rank)
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_ivf_recall_rises_with_probes(spark, emb):
    """Probing more cells must not lose neighbors, and n_probe=n_cells is
    exhaustive (recall 1.0 vs brute force)."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    q = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, q, k=5).collect()
    }

    def recall(n_probe):
        got = {
            (r.query_id, r.neighbor_id)
            for r in ivf_topk(emb, q, k=5, n_cells=16, n_probe=n_probe).collect()
        }
        return len(got & exact) / len(exact)

    r2, r16 = recall(2), recall(16)
    assert r16 >= r2
    assert r16 == 1.0, f"full-probe IVF must be exhaustive, got {r16}"


def test_ivf_deterministic_under_repartition(spark, emb):
    """Cell assignment is a pure function of the vector: shuffling the
    corpus must not change a single output row."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.similarity import (
        ivf_topk,
    )

    q = emb.filter(F.col("vec_id") < 5)
    a = sorted(map(tuple, ivf_topk(emb, q, k=5).collect()))
    b = sorted(map(tuple, ivf_topk(emb.repartition(13), q, k=5).collect()))
    assert a == b


def test_trained_centroids_improve_or_match_recall(spark, emb):
    """Sampled k-means training returns an integer codebook of the right
    shape whose cells actually partition the corpus (no empty-everything
    degenerate), and IVF accepts it."""
    import numpy as np

    from accelerated_intelligent_document_processing_on_aws_spark.operators.similarity import (
        ivf_cells_udf,
        ivf_topk,
        train_ivf_centroids,
    )

    cents = train_ivf_centroids(emb, n_cells=8, sample_rows=400, iters=5)
    assert cents.shape == (8, 64)
    assert np.allclose(cents, np.rint(cents))  # integer-rounded
    cells = (
        emb.select(ivf_cells_udf(cents, 1)(F.col("embedding"))[0].alias("c"))
        .distinct()
        .count()
    )
    assert cells >= 4  # corpus spreads over multiple cells
    q = emb.filter(F.col("vec_id") < 5)
    assert ivf_topk(emb, q, k=5, centroids=cents, n_cells=8).count() > 0


def test_semantic_dedup_matches_numpy_rule(spark, emb):
    """Differential oracle: the SemDeDup survivor set equals a brute-force
    numpy implementation of the identical rule (nearest integer-codebook
    cell, 6-dp-rounded cosines, keep farthest-from-centroid, tie by id)."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.similarity import (
        ivf_centroids,
        semantic_dedup,
    )

    tau = 0.35
    got = {
        r.id: (r.cell, r.centroid_sim)
        for r in semantic_dedup(
            emb, "vec_id", "embedding", threshold=tau, n_cells=16, dim=64, seed=7
        ).collect()
    }

    rows = emb.select("vec_id", "embedding").collect()
    ids = [r.vec_id for r in rows]
    m = np.array([r.embedding for r in rows], dtype=np.float64)
    cents = ivf_centroids(64, 16, 7)
    # same quantized assignment as ivf_cells_udf: first max wins
    cell = np.argmax(np.floor(m * (1 << 20)) @ cents.T, axis=1)
    norms = np.linalg.norm(m, axis=1)
    cnorms = np.linalg.norm(cents, axis=1)
    cs = np.round(
        np.einsum("ij,ij->i", m, cents[cell]) / (norms * cnorms[cell]), 6
    )
    removed = set()
    for i in range(len(ids)):
        for j in range(len(ids)):
            if i == j or cell[i] != cell[j]:
                continue
            sim = round(float(m[i] @ m[j] / (norms[i] * norms[j])), 6)
            if sim < tau:
                continue
            if (cs[j], ids[j]) < (cs[i], ids[i]):
                removed.add(ids[i])
    expect = {
        ids[i]: (int(cell[i]), float(cs[i]))
        for i in range(len(ids))
        if ids[i] not in removed
    }
    assert set(got) == set(expect)
    for k in got:
        assert got[k][0] == expect[k][0]
        assert got[k][1] == pytest.approx(expect[k][1], abs=1e-6)


def test_semantic_dedup_deterministic_under_repartition(spark, emb):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.similarity import (
        semantic_dedup,
    )

    a = sorted(
        r.id for r in semantic_dedup(emb, "vec_id", "embedding", 0.35).collect()
    )
    b = sorted(
        r.id
        for r in semantic_dedup(
            emb.repartition(13), "vec_id", "embedding", 0.35
        ).collect()
    )
    assert a == b and len(a) > 0
