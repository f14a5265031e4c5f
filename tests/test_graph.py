"""Closed-form hand cases for operators/graph.py (PageRank + co-activity
edge derivation).  The DuckDB oracle (q_pagerank) certifies engine parity;
these pin the MATH: ring-graph fixed point, dangling-mass redistribution,
rank conservation, and the hot-bucket cap's lossiness contract."""

import datetime

import pytest
from pyspark.sql import functions as F

from accelerated_intelligent_document_processing_on_aws_spark.operators.graph import (
    coactivity_edges,
    pagerank,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_ring_uniform_fixed_point(spark):
    # A->B->C->A: the uniform distribution is PageRank's fixed point, so
    # 1/3 must survive every iteration exactly (round_to makes it exact)
    pr = pagerank(_edges(spark, [(1, 2), (2, 3), (3, 1)]), iterations=4)
    ranks = {r.node: r.rank for r in pr.collect()}
    assert ranks == {1: pytest.approx(1 / 3, abs=1e-9),
                     2: pytest.approx(1 / 3, abs=1e-9),
                     3: pytest.approx(1 / 3, abs=1e-9)}


def test_two_node_cycle_symmetric(spark):
    pr = pagerank(_edges(spark, [(1, 2), (2, 1)]), iterations=3)
    ranks = {r.node: r.rank for r in pr.collect()}
    assert ranks[1] == ranks[2] == pytest.approx(0.5, abs=1e-9)


def test_dangling_mass_one_iteration(spark):
    # A->B, B dangling.  One iteration from (0.5, 0.5):
    #   dangling mass = 0.5, spread 0.25 to each node
    #   r(A) = 0.15/2 + 0.85*(0 + 0.25)        = 0.2875
    #   r(B) = 0.15/2 + 0.85*(0.5/1 + 0.25)    = 0.7125
    pr = pagerank(_edges(spark, [(1, 2)]), iterations=1)
    ranks = {r.node: r.rank for r in pr.collect()}
    assert ranks[1] == pytest.approx(0.2875, abs=1e-9)
    assert ranks[2] == pytest.approx(0.7125, abs=1e-9)


def test_rank_conservation(spark):
    # teleport + damping + dangling redistribution conserve total mass
    e = _edges(spark, [(1, 2), (1, 3), (2, 3), (4, 1), (3, 4), (5, 1)])
    total = pagerank(e, iterations=6).agg(F.sum("rank")).first()[0]
    assert total == pytest.approx(1.0, abs=1e-6)


def test_coactivity_edges_symmetric_and_capped(spark):
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # minute 0: users 1,2 -> one undirected pair (both directions)
        (1, t0), (2, t0.replace(second=30)),
        # minute 1: users 3,4,5 but cap=2 drops the whole bucket
        (3, t0.replace(minute=1)), (4, t0.replace(minute=1, second=10)),
        (5, t0.replace(minute=1, second=20)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.src, r.dst)
        for r in coactivity_edges(df, max_bucket_users=2).collect()
    }
    assert got == {(1, 2), (2, 1)}


def test_coactivity_dedups_repeat_contacts(spark):
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [(1, t0), (2, t0), (1, t0.replace(second=5)), (2, t0.replace(second=9))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    assert coactivity_edges(df).count() == 2  # (1,2) and (2,1), once each


def test_triangle_k3_and_k4(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.graph import (
        triangle_stats,
    )

    k3 = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], ["src", "dst"])
    (r,) = triangle_stats(k3).collect()
    assert (r["n_triangles"], r["n_wedges"]) == (1, 3)
    assert r["clustering"] == 1.0
    # K4: 4 triangles, 12 wedges, clustering 1.0; both directions present
    e = [(a, b) for a in range(4) for b in range(4) if a != b]
    k4 = spark.createDataFrame(e, ["src", "dst"])
    (r4,) = triangle_stats(k4).collect()
    assert (r4["n_triangles"], r4["n_wedges"]) == (4, 12)
    assert r4["clustering"] == 1.0


def test_triangle_star_and_path(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.graph import (
        triangle_stats,
    )

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], ["src", "dst"]
    )
    (r,) = triangle_stats(star).collect()
    assert r["n_triangles"] == 0
    assert r["n_wedges"] == 10  # C(5,2) at the hub
    assert r["clustering"] == 0.0
    path = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["src", "dst"])
    (p,) = triangle_stats(path).collect()
    assert (p["n_triangles"], p["n_wedges"]) == (0, 2)


def test_triangle_differential_random(spark):
    """Degree-oriented count equals a brute-force itertools enumeration
    on a deterministic random graph."""
    import itertools
    import random

    from accelerated_intelligent_document_processing_on_aws_spark.operators.graph import (
        triangle_stats,
    )

    rng = random.Random(7)
    nodes = list(range(30))
    und = {
        (a, b)
        for a, b in itertools.combinations(nodes, 2)
        if rng.random() < 0.2
    }
    expected = sum(
        1
        for x, y, z in itertools.combinations(nodes, 3)
        if (x, y) in und and (y, z) in und and (x, z) in und
    )
    df = spark.createDataFrame(sorted(und), ["src", "dst"])
    (r,) = triangle_stats(df).collect()
    assert r["n_triangles"] == expected


def test_local_clustering_triangle_plus_tail(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.graph import (
        local_clustering,
    )

    # triangle 1-2-3 plus pendant 3-4
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long"
    )
    got = {r.node: (r.deg, r.n_tri, r.lcc) for r in local_clustering(edges).collect()}
    assert got[1] == (2, 1, 1.0)
    assert got[2] == (2, 1, 1.0)
    # node 3: deg 3, one triangle of 3 possible pairs -> 2*1/(3*2)=0.3333
    assert got[3] == (3, 1, 0.3333)
    assert got[4] == (1, 0, 0.0)


def test_local_clustering_consistent_with_global(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.graph import (
        local_clustering,
        triangle_stats,
    )

    # K4 plus an edge: every node-triangle membership sums to 3*total
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)],
        "src long, dst long",
    )
    g = triangle_stats(edges).collect()[0]
    lc = local_clustering(edges).collect()
    assert sum(r.n_tri for r in lc) == 3 * g.n_triangles == 12


def _both_dirs(spark, pairs):
    """k_core expects the coactivity shape: both directions present."""
    rows = sorted({(a, b) for a, b in pairs} | {(b, a) for a, b in pairs})
    return spark.createDataFrame(rows, "src long, dst long")


def test_kcore_clique_survives_tail_peels(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.graph import k_core

    # 5-clique (deg 4 each) + tail 1-6-7: the tail peels in two rounds,
    # the clique is its own 3-core with core_deg 4
    clique = [(i, j) for i in range(1, 6) for j in range(i + 1, 6)]
    e = _both_dirs(spark, clique + [(1, 6), (6, 7)])
    got = {r.node: r.core_deg for r in k_core(e, k=3).collect()}
    assert got == {i: 4 for i in range(1, 6)}


def test_kcore_chain_cascades_to_empty(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.graph import k_core

    # chain 1-2-3-4 under k=2: endpoints peel, exposing new endpoints,
    # until nothing is left — the cascade is the whole point of k-core
    e = _both_dirs(spark, [(1, 2), (2, 3), (3, 4)])
    assert k_core(e, k=2).count() == 0


def test_kcore_ring_is_its_own_2core(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.graph import k_core

    e = _both_dirs(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1)])
    got = {r.node: r.core_deg for r in k_core(e, k=2).collect()}
    assert got == {n: 2 for n in range(1, 6)}


def test_kcore_bounded_rounds_contract(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.graph import k_core

    # max_iters=1 on the chain: exactly one peel -> interior nodes 2,3
    # survive with the single 2-3 edge.  This is the contract the DuckDB
    # oracle relies on: N Spark rounds == N unrolled SQL peels, whether
    # or not fixpoint was reached.
    e = _both_dirs(spark, [(1, 2), (2, 3), (3, 4)])
    got = {r.node: r.core_deg for r in k_core(e, k=2, max_iters=1).collect()}
    assert got == {2: 1, 3: 1}


def test_assortativity_star_is_minus_one(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.graph import (
        assortativity,
    )

    # star 1-{2,3,4}: pure hub-to-leaf -> r = -1
    e = _both_dirs(spark, [(1, 2), (1, 3), (1, 4)])
    (r,) = assortativity(e).collect()
    assert (r.n_edges, r.r) == (3, -1.0)


def test_assortativity_regular_graph_null(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.graph import (
        assortativity,
    )

    # ring: every degree 2, zero variance -> NULL
    e = _both_dirs(spark, [(1, 2), (2, 3), (3, 1)])
    (r,) = assortativity(e).collect()
    assert r.r is None


def test_assortativity_triangle_plus_pendant(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.graph import (
        assortativity,
    )

    # K3 + pendant 3-4: hand-computed r = -20/28
    e = _both_dirs(spark, [(1, 2), (1, 3), (2, 3), (3, 4)])
    (r,) = assortativity(e).collect()
    assert (r.n_edges, r.r) == (4, round(-20 / 28, 6))


def test_label_propagation_triangle_and_determinism(spark):
    """A triangle converges to one community (min label by the tie rule);
    output is a pure function of the edge list (repartition-stable)."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.graph import (
        label_propagation,
    )

    tri = [(1, 2), (2, 1), (1, 3), (3, 1), (2, 3), (3, 2)]
    pair = [(10, 11), (11, 10)]
    edges = spark.createDataFrame(tri + pair, ["src", "dst"])
    out = {r.node: r.label for r in label_propagation(edges, 5).collect()}
    assert len({out[1], out[2], out[3]}) == 1  # one triangle community
    assert out[1] in (1, 2, 3)
    assert out[10] in (10, 11) and out[11] in (10, 11)
    out2 = {
        r.node: r.label
        for r in label_propagation(edges.repartition(7), 5).collect()
    }
    assert out == out2


def test_label_propagation_isolated_nodes_keep_id(spark):
    """A source-only node (no in-edges) keeps its own id as label."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.graph import (
        label_propagation,
    )

    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])  # 1 has no in-edge
    out = {r.node: r.label for r in label_propagation(edges, 3).collect()}
    assert out[1] == 1
    assert out[2] == 1  # adopts its only in-neighbor's label


def test_hits_bipartite_hand_case(spark):
    """Star bipartite graph u1->{t1,t2}, u2->{t1}: pinned exactly
    against a hand-rolled power iteration using the operator's own
    rounding contract (L1 normalize + round 9dp per round)."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.graph import (
        hits,
    )

    edges = spark.createDataFrame(
        [("u1", "t1"), ("u1", "t2"), ("u2", "t1")], ["src", "dst"]
    )
    out = {r.node: r for r in hits(edges, iterations=3).collect()}
    # hand power iteration (L1-normalized, rounded 9dp per round)
    h = {"u1": 1.0, "u2": 1.0, "t1": 1.0, "t2": 1.0}
    a = {}
    adj = [("u1", "t1"), ("u1", "t2"), ("u2", "t1")]
    nodes = ["u1", "u2", "t1", "t2"]
    for _ in range(3):
        raw_a = {n: 0.0 for n in nodes}
        for s, d in adj:
            raw_a[d] += h[s]
        z = sum(raw_a.values())
        a = {n: round(v / z, 9) for n, v in raw_a.items()}
        raw_h = {n: 0.0 for n in nodes}
        for s, d in adj:
            raw_h[s] += a[d]
        z = sum(raw_h.values())
        h = {n: round(v / z, 9) for n, v in raw_h.items()}
    for n in nodes:
        assert out[n].hub == h[n], (n, out[n].hub, h[n])
        assert out[n].auth == a[n], (n, out[n].auth, a[n])
    # authorities concentrate on t1; hubs on the broad explorer u1
    assert out["t1"].auth > out["t2"].auth
    assert out["u1"].hub > out["u2"].hub
    assert out["u1"].auth == 0.0 and out["t1"].hub == 0.0


def test_katz_chain_hand_case(spark):
    """Path 1->2->3 with alpha=0.5, beta=1, 3 rounds: x(1)=1 always;
    x(2)=1+.5*x(1); x(3)=1+.5*x(2) — hand-unrolled."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.graph import (
        katz_centrality,
    )

    edges = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
    got = {
        r.node: r.katz
        for r in katz_centrality(
            edges, iterations=3, alpha=0.5, beta=1.0
        ).collect()
    }
    x = {1: 1.0, 2: 1.0, 3: 1.0}
    for _ in range(3):
        x = {
            1: 1.0,
            2: round(1.0 + 0.5 * x[1], 9),
            3: round(1.0 + 0.5 * x[2], 9),
        }
    assert got == x
    assert got[3] > got[2] > got[1]  # downstream accumulates walks


def test_bfs_distances_layers_and_bound(spark):
    """Chain 1->2->3->4->5 from landmark 1 with max_hops=3: nodes 2,3,4
    get exact hop counts, node 5 is beyond the budget; explicit
    landmark list respected; frontier never rediscovers (dist unique)."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.graph import (
        bfs_distances,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (2, 1)], ["src", "dst"]
    )
    out = bfs_distances(edges, landmarks=[1], max_hops=3).collect()
    got = {(r.node, r.landmark): r.dist for r in out}
    assert len(out) == len(got)  # one row per (node, landmark)
    assert got == {(1, 1): 0, (2, 1): 1, (3, 1): 2, (4, 1): 3}


def test_bfs_distances_default_landmarks_multi_source(spark):
    """Default landmarks = smallest node ids; a triangle reaches all
    nodes within 1 hop of each landmark."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.graph import (
        bfs_distances,
    )

    tri = [(1, 2), (2, 1), (1, 3), (3, 1), (2, 3), (3, 2)]
    out = bfs_distances(
        spark.createDataFrame(tri, ["src", "dst"]), n_landmarks=2, max_hops=2
    ).collect()
    lms = {r.landmark for r in out}
    assert lms == {1, 2}
    d = {(r.landmark, r.node): r.dist for r in out}
    assert d[(1, 1)] == 0 and d[(1, 2)] == 1 and d[(1, 3)] == 1
    assert d[(2, 2)] == 0 and d[(2, 1)] == 1 and d[(2, 3)] == 1


def test_modularity_two_cliques(spark):
    """Two disjoint triangles labeled as two communities: the textbook
    Q = 1 - 1/k for k equal disconnected cliques -> 0.5."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.graph import (
        modularity,
    )

    tri1 = [(1, 2), (2, 3), (1, 3)]
    tri2 = [(4, 5), (5, 6), (4, 6)]
    edges = spark.createDataFrame(tri1 + tri2, ["src", "dst"])
    labels = spark.createDataFrame(
        [(i, 100) for i in (1, 2, 3)] + [(i, 200) for i in (4, 5, 6)],
        ["node", "label"],
    )
    r = modularity(edges, labels).collect()[0]
    assert (r.n_nodes, r.n_communities, r.m_edges) == (6, 2, 6)
    assert r.modularity == 0.5

    # everything in ONE community: Q = 0 exactly
    one = spark.createDataFrame([(i, 7) for i in range(1, 7)],
                                ["node", "label"])
    r1 = modularity(edges, one).collect()[0]
    assert r1.modularity == 0.0


def test_modularity_missing_labels_fall_back_to_id(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.graph import (
        modularity,
    )

    edges = spark.createDataFrame([(1, 2), (2, 1), (2, 3)], ["src", "dst"])
    labels = spark.createDataFrame([(1, 9), (2, 9)], ["node", "label"])
    r = modularity(edges, labels).collect()[0]
    # node 3 forms its own singleton community
    assert r.n_communities == 2
    assert r.m_edges == 2


def test_rich_club_hand_case(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.graph import (
        rich_club,
    )

    # K4 core {1,2,3,4} (deg >= 3 each) plus pendant nodes 5..8 hanging
    # off node 1 (node 1 deg 7; pendants deg 1)
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    pendants = [(1, n) for n in range(5, 9)]
    edges = spark.createDataFrame(k4 + pendants, ["src", "dst"])
    out = {r.k: r for r in rich_club(edges, thresholds=(1, 2, 6)).collect()}
    # deg: node1=7, nodes2-4=3, pendants=1
    # k=1: club {1,2,3,4} (deg>1), E=6 -> phi = 12/12 = 1
    assert (out[1].n_nodes, out[1].n_edges, out[1].phi) == (4, 6, 1.0)
    # k=2: same club
    assert out[2].phi == 1.0
    # k=6: club {1} only -> phi NULL
    assert out[6].n_nodes == 1 and out[6].phi is None


def test_trustrank_flows_from_seeds_only(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.graph import (
        trustrank,
    )

    # chain 1 -> 2 -> 3 plus a disconnected spam clique {10, 11}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 10)], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(1,)], ["node"])
    # enough iterations to damp the 3-cycle transient: the fixed point
    # is r1 ≈ 0.389 > r2 ≈ 0.330 > r3 ≈ 0.281
    out = {r.node: r.trust for r in trustrank(edges, seeds, 25).collect()}
    assert out[1] > 0 and out[2] > 0 and out[3] > 0
    assert out[1] > out[2] > out[3]
    # the disconnected clique gets exactly zero, however well-linked
    assert out[10] == 0.0 and out[11] == 0.0
    # total trust stays a (sub-)distribution
    assert sum(out.values()) <= 1.0 + 1e-6


def test_trustrank_reference_one_iteration(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.graph import (
        trustrank,
    )

    # 1 -> 2 with seed {1}; d = 0.85
    # r0 = (1, 0); node 2 dangling (deg 0), node 1 deg 1
    # iter1: r(1) = 0.15*1 + 0.85*(0 + m*1) with m = r0(2)=0 -> 0.15
    #        r(2) = 0.15*0 + 0.85*(r0(1)/1) = 0.85
    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
    seeds = spark.createDataFrame([(1,)], ["node"])
    out = {r.node: r.trust for r in trustrank(edges, seeds, 1).collect()}
    assert out[1] == 0.15
    assert out[2] == 0.85

    # no seeds in graph -> all zero
    far = spark.createDataFrame([(99,)], ["node"])
    out0 = {r.node: r.trust for r in trustrank(edges, far, 3).collect()}
    assert set(out0.values()) == {0.0}


def test_link_prediction_scale_guard(spark):
    """Round-4 VERDICT #4: the exact-mode default (max_middle_degree=None)
    must warn loudly; scale_profile='capped' applies the default df-cap
    silently and, when the cap exceeds every middle degree, returns the
    identical result."""
    import warnings as _w

    from accelerated_intelligent_document_processing_on_aws_spark.operators.graph import (
        CAPPED_MIDDLE_DEGREE,
        link_prediction,
    )

    # path a-b-c: (a,c) share middle b
    pairs = [(1, 2), (2, 1), (2, 3), (3, 2)]
    edges = _edges(spark, pairs)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        exact = link_prediction(edges).collect()
    assert any(
        issubclass(r.category, RuntimeWarning)
        and "max_middle_degree" in str(r.message)
        for r in rec
    ), "exact mode must emit the scale-hazard RuntimeWarning"

    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        capped = link_prediction(edges, scale_profile="capped").collect()
    assert not any(issubclass(r.category, RuntimeWarning) for r in rec)
    assert CAPPED_MIDDLE_DEGREE >= 2
    assert sorted(map(tuple, exact)) == sorted(map(tuple, capped))

    with pytest.raises(ValueError):
        link_prediction(edges, scale_profile="bogus")
