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


def test_ivfpq_codes_and_adc_match_numpy(spark, emb):
    """PQ codes and ADC scores are exactly the numpy recomputation
    (integer codebooks x floor-quantized vectors => exact f64)."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.similarity import (
        ivf_centroids,
        ivfpq_topk,
        pq_codebooks,
    )

    vecs = {r.vec_id: np.asarray(r.embedding, np.float64) for r in emb.collect()}
    q = emb.filter(F.col("vec_id") < 10)
    got = ivfpq_topk(emb, q, k=5).collect()
    assert {r.query_id for r in got} == set(range(10))
    for qid in range(10):
        rows = sorted((r for r in got if r.query_id == qid), key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))

    # numpy twin: same cells, same codes, same ADC
    cents = ivf_centroids(64, 16, 7)
    books = pq_codebooks(64, 4, 16, 11)
    s = float(1 << 20)
    const = (books**2).sum(axis=2)

    def cell_of(v, n):
        d = np.floor(v * s) @ cents.T
        return np.argsort(-d, kind="stable")[:n]

    def codes_of(v):
        xq = np.floor(v * s).reshape(4, 16)
        return [int(np.argmin(const[i] - 2.0 * (books[i] @ xq[i]))) for i in range(4)]

    def lut_of(v):
        xq = np.floor(v * s).reshape(4, 16)
        return np.stack([const[i] - 2.0 * (books[i] @ xq[i]) for i in range(4)])

    for qid in [0, 3, 7]:
        probes = set(cell_of(vecs[qid], 4))
        lut = lut_of(vecs[qid])
        cand = []
        for nid, v in vecs.items():
            if nid == qid or cell_of(v, 1)[0] not in probes:
                continue
            adc = sum(lut[i, c] for i, c in enumerate(codes_of(v)))
            cand.append((int(adc), nid))
        cand.sort()
        want = cand[:5]
        rows = sorted((r for r in got if r.query_id == qid), key=lambda r: r.rank)
        assert [(r.adc, r.neighbor_id) for r in rows] == want


def test_ivfpq_plan_is_equijoin_no_vectors_through_join(spark, emb):
    """IVFPQ must plan a broadcast EQUI-join on cell (never BNLJ) and the
    corpus embedding column must not survive past the scan projection."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.similarity import (
        ivfpq_topk,
    )
    from accelerated_intelligent_document_processing_on_aws_spark.plans import (
        assert_scale_safe,
        plan_of,
    )

    df = ivfpq_topk(emb, emb.filter(F.col("vec_id") < 10))
    p = plan_of(df)
    assert "BroadcastHashJoin" in p
    assert_scale_safe(df)


def test_ann_recall_bounds_and_self_recall(spark, emb):
    """recall(exact, exact) == 1.0; approximate paths land in [0, 1] and
    the LSH path's mean recall is positive on this corpus."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.similarity import (
        ann_recall,
        brute_force_topk,
        lsh_topk,
    )

    q = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, q, k=5).cache()
    self_r = ann_recall(exact, exact, k=5).collect()
    assert all(r.recall == 1.0 and r.hits == 5 for r in self_r)

    approx = lsh_topk(emb, q, k=5)
    rec = ann_recall(approx, exact, k=5).collect()
    assert len(rec) == 10
    assert all(0.0 <= r.recall <= 1.0 for r in rec)
    assert sum(r.recall for r in rec) > 0.0


def test_trained_pq_high_recall_on_clustered_data(spark):
    """On clustered vectors (the realistic embedding shape) IVFPQ with
    TRAINED codebooks recovers nearly all true neighbors — the ADC
    ranking must track true distance once codebooks adapt to the data.
    Random codebooks on near-uniform vectors are distortion-bound (the
    honest limit of a data-independent quantizer), so the quality gate
    runs where PQ is designed to work."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.similarity import (
        ann_recall,
        brute_force_topk,
        ivfpq_topk,
        train_pq_codebooks,
    )

    rng = np.random.RandomState(5)
    centers = rng.normal(size=(8, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(400):
        v = centers[i % 8] + rng.normal(scale=0.05, size=64)
        v /= np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).cache()
    q = df.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(df, q, k=5).cache()

    books = train_pq_codebooks(df, m_sub=4, n_codes=16, sample_rows=400, seed=11)
    # pure-ADC stage: same-cluster precision (coarse retrieval is what the
    # compressed domain CAN rank — within-cluster ties are inherent)
    adc_top = ivfpq_topk(df, q, k=5, n_probe=8, codebooks=books).collect()
    same = sum(1 for r in adc_top if r.neighbor_id % 8 == r.query_id % 8)
    assert same / len(adc_top) >= 0.8, same / len(adc_top)

    # shortlist + exact rerank: the production two-stage path recovers the
    # true within-cluster neighbors
    # shortlist must exceed the ~50-member cluster: within a tight cluster
    # all members tie on ADC, so a smaller shortlist id-tiebreaks true
    # neighbors out before the exact stage sees them
    approx = ivfpq_topk(df, q, k=5, n_probe=8, codebooks=books, rerank=60)
    mean_rec = (
        ann_recall(approx, exact, k=5).agg(F.avg("recall")).collect()[0][0]
    )
    assert mean_rec >= 0.8, mean_rec


def test_mmr_prefers_diverse_pick(spark):
    """MMR round 2 passes over a redundant near-duplicate of pick 1 in
    favor of a diverse candidate with slightly lower relevance."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.similarity import (
        mmr_select,
    )

    e1 = [1.0] + [0.0] * 63
    e2 = [0.0, 1.0] + [0.0] * 62
    near = [0.999] + [0.0445] + [0.0] * 62  # ~parallel to e1
    rows = [
        (0, 101, e1, 0.99),     # top relevance
        (0, 102, near, 0.98),   # redundant with 101
        (0, 103, e2, 0.60),     # diverse
    ]
    cand = spark.createDataFrame(rows, ["query_id", "neighbor_id", "cv", "rel"])
    got = {r.mmr_rank: r.neighbor_id for r in mmr_select(cand, k=3).collect()}
    assert got == {1: 101, 2: 103, 3: 102}


def test_mmr_rank_shape_and_determinism(spark, emb):
    """k rows per query, ranks 1..k, identical across runs."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.similarity import (
        brute_force_topk,
        mmr_select,
    )

    q = emb.filter(F.col("vec_id") < 5)
    topk = brute_force_topk(emb, q, k=10)
    cand = topk.join(
        emb.select(
            F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv")
        ),
        "neighbor_id",
    ).select("query_id", "neighbor_id", "cv", F.col("sim").alias("rel"))
    a = sorted(mmr_select(cand, k=3).collect(), key=lambda r: (r.query_id, r.mmr_rank))
    b = sorted(mmr_select(cand, k=3).collect(), key=lambda r: (r.query_id, r.mmr_rank))
    assert a == b
    per_q = {}
    for r in a:
        per_q.setdefault(r.query_id, []).append(r.mmr_rank)
    assert all(sorted(v) == [1, 2, 3] for v in per_q.values())
    # selections are distinct per query
    ids = {}
    for r in a:
        ids.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert all(len(v) == 3 for v in ids.values())


def test_hard_negative_band_and_collision(spark, emb):
    """Every mined pair sits in [lo, hi) and collides in some LSH band;
    no near-duplicate (>= hi) leaks in."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.similarity import (
        hard_negative_pairs,
    )

    got = hard_negative_pairs(
        emb, sim_lo=0.20, sim_hi=0.35, quantize_bits=20
    ).collect()
    assert len(got) > 0
    assert all(0.20 <= r.sim < 0.35 for r in got)
    assert all(r.id_a < r.id_b for r in got)


def test_random_projection_audit_jl_ratio(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.similarity import (
        random_projection_audit,
    )

    # orthogonal unit-ish vectors: ratios concentrate around 1 (JL)
    import numpy as np

    rng = np.random.RandomState(7)
    rows = [(i, [float(x) for x in rng.randn(64) * 0.1]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = random_projection_audit(df).collect()
    assert len(out) == 39
    ratios = [r.jl_ratio for r in out]
    assert all(r is not None and 0.05 < r < 5.0 for r in ratios)
    # mean ratio near 1 (expectation is exactly 1 for +-1 projections)
    assert 0.6 < sum(ratios) / len(ratios) < 1.6
    # distances are integer-exact in the quantized domain
    assert all(float(r.d2_orig).is_integer() and float(r.d2_proj).is_integer() for r in out)


def test_scalar_quantize_audit_hand(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.similarity import (
        scalar_quantize_audit,
    )

    # constant vector: zero error, all codes 0
    rows = [(1, [0.5] * 64), (2, [float(i) / 64.0 for i in range(64)])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.id: r for r in scalar_quantize_audit(df).collect()}
    assert out[1].sse_scaled == 0.0 and out[1].code_checksum == 0.0
    assert out[1].mse_ppm == 0.0
    # ramp vector: codes are a monotone ramp 0..255-ish; floor
    # quantization error is one-sided, bounded by one full step, and
    # sse_scaled is in err*L units: per-element bound (step*255)^2
    r = out[2]
    step = (r.qmax - r.qmin) / 255.0
    assert 0 < r.sse_scaled <= 64 * (step * 255.0 + 255.0) ** 2
    assert r.code_checksum > 0


def test_anisotropy_audit_isotropic_vs_shifted(spark):
    import math

    from accelerated_intelligent_document_processing_on_aws_spark.operators.similarity import (
        anisotropy_audit,
    )

    # orthogonal-ish pairs: id i gets basis vector e_{i mod 4}
    iso = [
        (i * 7, [1.0 if j == (i % 4) else 0.0 for j in range(8)])
        for i in range(20)
    ]
    df = spark.createDataFrame(iso, ["vec_id", "embedding"])
    r = anisotropy_audit(df, "vec_id", "embedding", sample_mod=7).collect()[0]
    assert r.n_pairs == 10
    # pair i (basis i%4) with i+10 (basis (i+10)%4 = (i+2)%4): orthogonal
    assert r.mean_cos == 0.0 and r.max_cos == 0.0

    # anisotropic: every vector = common direction + small distinct part
    aniso = [
        (i * 7, [5.0] + [1.0 if j == (i % 4) else 0.0 for j in range(7)])
        for i in range(20)
    ]
    ra = anisotropy_audit(
        spark.createDataFrame(aniso, ["vec_id", "embedding"]),
        "vec_id", "embedding", sample_mod=7,
    ).collect()[0]
    expect = 25.0 / 26.0  # cos of two such vectors with disjoint parts
    assert ra.mean_cos == round(expect, 6)
    assert ra.frac_above_05 == 1.0
    assert math.isclose(ra.sd_cos, 0.0, abs_tol=1e-9)


def test_ivf_silhouette_separated_vs_mixed(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.similarity import (
        ivf_silhouette,
    )

    # two orthogonal centroids; points tightly around each -> sil near 1
    cents = [[1000.0, 0.0, 0.0, 0.0], [0.0, 1000.0, 0.0, 0.0]]
    rows = []
    for i in range(10):
        eps = 0.01 * (i % 3)
        rows.append((i, [1.0, eps, 0.0, 0.0]))
        rows.append((100 + i, [eps, 1.0, 0.0, 0.0]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r.cell: r for r in
           ivf_silhouette(df, "vec_id", "embedding", cents).collect()}
    assert set(out) == {0, 1}
    assert out[0].n == 10 and out[1].n == 10
    for r in out.values():
        assert r.mean_cos_own > 0.99
        assert r.mean_sil > 0.9

    # points at 45 degrees between the centroids: sil collapses to ~0
    mid = [(i, [1.0, 1.0, 0.0, 0.0]) for i in range(8)]
    dfm = spark.createDataFrame(mid, ["vec_id", "embedding"])
    outm = ivf_silhouette(dfm, "vec_id", "embedding", cents).collect()
    assert all(abs(r.mean_sil) < 1e-6 for r in outm)
