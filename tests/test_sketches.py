"""KMV distinct / theta overlap / Efraimidis-Spirakis weighted sampling:
closed-form exactness below sketch size, accuracy bounds above it, and a
pure-python differential for the deterministic sampler."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from accelerated_intelligent_document_processing_on_aws_spark.operators.sketches import (
    HASH_SPACE,
    kmv_distinct,
    kmv_overlap,
    weighted_sample,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_kmv_exact_below_k(spark):
    rows = [("a", f"v{i}") for i in range(10)] + [("b", "only")] * 5
    df = spark.createDataFrame(rows, ["grp", "val"])
    out = {
        r["grp"]: r
        for r in kmv_distinct(df, ["grp"], "val", k=64).collect()
    }
    assert out["a"]["est_distinct"] == 10.0
    assert out["a"]["n_sketch"] == 10
    assert out["b"]["est_distinct"] == 1.0


def test_kmv_accuracy_above_k(spark):
    n = 2000
    df = spark.createDataFrame(
        [("g", f"item-{i}") for i in range(n)], ["grp", "val"]
    )
    (row,) = kmv_distinct(df, ["grp"], "val", k=64).collect()
    assert row["n_sketch"] == 64
    # RSE ~ 1/sqrt(k-2) ~ 12.7%; 4 sigma bound keeps the test deterministic
    assert abs(row["est_distinct"] - n) / n < 0.5


def test_kmv_deterministic(spark):
    df = spark.createDataFrame(
        [("g", f"item-{i}") for i in range(500)], ["grp", "val"]
    )
    a = kmv_distinct(df, ["grp"], "val", k=32).collect()
    b = kmv_distinct(df, ["grp"], "val", k=32).collect()
    assert a == b


def test_overlap_exact_when_small(spark):
    a = spark.createDataFrame([(f"v{i}",) for i in range(50)], ["val"])
    b = spark.createDataFrame([(f"v{i}",) for i in range(20, 70)], ["val"])
    (row,) = kmv_overlap(a, b, "val", k=256).collect()
    # below sketch size theta = full space: everything is exact
    assert row["union_est"] == 70.0
    assert row["inter_est"] == 30.0
    assert row["jaccard_est"] == round(30 / 70, 6)


def test_overlap_identical_and_disjoint(spark):
    a = spark.createDataFrame([(f"x{i}",) for i in range(3000)], ["val"])
    (same,) = kmv_overlap(a, a, "val", k=128).collect()
    assert same["jaccard_est"] == 1.0
    assert same["inter_est"] == same["union_est"]
    b = spark.createDataFrame([(f"y{i}",) for i in range(3000)], ["val"])
    (dis,) = kmv_overlap(a, b, "val", k=128).collect()
    assert dis["jaccard_est"] == 0.0
    assert dis["inter_est"] == 0.0


def test_overlap_estimates_large(spark):
    # 6000-value union with a 2000-value intersection (jaccard 1/3)
    a = spark.createDataFrame([(f"k{i}",) for i in range(4000)], ["val"])
    b = spark.createDataFrame(
        [(f"k{i}",) for i in range(2000, 8000)], ["val"]
    )
    (row,) = kmv_overlap(a, b, "val", k=256).collect()
    assert abs(row["union_est"] - 8000) / 8000 < 0.35
    assert abs(row["jaccard_est"] - 0.25) < 0.15


def test_weighted_sample_differential(spark):
    rows = [(i, float(1 + (i * 7) % 13)) for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "wt"])
    got = [
        (r["id"], r["weight"], r["es_key"])
        for r in weighted_sample(df, "doc_id", "wt", k=25, seed="t").collect()
    ]
    exp = []
    for i, w in rows:
        u = (_h60(f"t{i}") + 1) / HASH_SPACE
        exp.append((i, w, round(math.log(u) / w, 9)))
    exp.sort(key=lambda t: (-t[2], t[0]))
    assert got == exp[:25]


def test_weighted_sample_domain_and_dominance(spark):
    df = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, None), (4, 1e9), (5, 0.001), (6, 0.001)],
        ["doc_id", "wt"],
    )
    got = weighted_sample(df, "doc_id", "wt", k=2).collect()
    ids = [r["id"] for r in got]
    # non-positive / null weights never win; the 1e9 weight's key ~ 0
    # dominates any milliweight key
    assert 4 == ids[0]
    assert set(ids) <= {4, 5, 6}


def test_weighted_sample_plan_is_take_ordered(spark):
    df = spark.createDataFrame(
        [(i, 1.0 + i) for i in range(100)], ["doc_id", "wt"]
    )
    plan = weighted_sample(df, "doc_id", "wt", k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-x", "-q"]))


def test_cms_never_undercounts_and_tight_on_heavy(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.sketches import (
        cms_point_estimates,
        cms_table,
    )

    # 200 distinct terms into 4x64 counters -> collisions guaranteed
    items = spark.createDataFrame(
        [(f"t{i}", (200 - i)) for i in range(200)], "term string, wc long"
    )
    cms = cms_table(items, "term", "wc", depth=4, width=64)
    est = cms_point_estimates(cms, items.select("term"), "term", depth=4, width=64)
    got = {r.term: r.cms_est for r in est.collect()}
    exact = {f"t{i}": 200 - i for i in range(200)}
    assert all(got[t] >= exact[t] for t in exact)  # CMS one-sided bound
    total = sum(exact.values())
    # classic guarantee: overcount <= (e/width) * total with prob 1-e^-depth;
    # assert the deterministic instance satisfies it for every term
    bound = math.e / 64 * total
    assert all(got[t] - exact[t] <= bound for t in exact)


def test_cms_counters_merge_additively(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.sketches import (
        cms_table,
    )

    a = spark.createDataFrame([("x", 3), ("y", 5)], "term string, wc long")
    b = spark.createDataFrame([("x", 2), ("z", 7)], "term string, wc long")
    both = a.union(b)
    merged = {
        (r.row, r.bucket): r.cnt for r in cms_table(both, "term", "wc").collect()
    }
    cellwise: dict = {}
    for part in (a, b):
        for r in cms_table(part, "term", "wc").collect():
            cellwise[(r.row, r.bucket)] = cellwise.get((r.row, r.bucket), 0) + r.cnt
    assert merged == cellwise


def test_hll_exact_class_accuracy(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.sketches import (
        hll_distinct,
    )

    # 1000 distinct values, p=32 registers -> RSE ~ 1.04/sqrt(32) = 18%
    df = spark.createDataFrame(
        [(i % 1000,) for i in range(5000)], "v long"
    ).withColumn("g", (F.col("v") * 0).cast("int"))
    row = hll_distinct(df, ["g"], "v", b=5).collect()[0]
    assert abs(row.est_distinct - 1000) / 1000 < 0.40  # 2+ sigma headroom
    assert row.n_registers <= 32


def test_hll_duplicates_do_not_move_estimate(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.sketches import (
        hll_distinct,
    )

    base = spark.createDataFrame([(i,) for i in range(500)], "v long")
    dup9 = base.union(base).union(base)
    one = hll_distinct(base.withColumn("g", F.lit(1)), ["g"], "v").collect()[0]
    many = hll_distinct(dup9.withColumn("g", F.lit(1)), ["g"], "v").collect()[0]
    assert one.est_distinct == many.est_distinct
    assert one.n_registers == many.n_registers


def test_hll_python_differential(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.sketches import (
        hll_distinct,
    )

    vals = [f"u{i}" for i in range(300)]
    b, m, p = 5, 55, 32
    regs = [0] * p
    for v in vals:
        h = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
        reg, rem = h >> m, h & ((1 << m) - 1)
        rho = m - (rem.bit_length()) + 1
        regs[reg] = max(regs[reg], rho)
    isum = sum(2 ** (m + 1 - mx) for mx in regs)
    e_raw = 0.697 * p * p * float(2 ** (m + 1)) / isum
    v_empty = regs.count(0)
    expect = (
        p * math.log(p / v_empty) if (e_raw <= 2.5 * p and v_empty > 0) else e_raw
    )
    df = spark.createDataFrame([(v,) for v in vals], "v string").withColumn(
        "g", F.lit(1)
    )
    got = hll_distinct(df, ["g"], "v").collect()[0]
    assert got.est_distinct == pytest.approx(round(expect, 4), abs=1e-4)


def test_log_histogram_quantiles_accuracy_and_merge(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.sketches import (
        log_histogram_quantiles,
    )

    vals = [float(i) for i in range(1, 1001)]  # uniform 1..1000
    df = spark.createDataFrame([(v,) for v in vals], "v double").withColumn(
        "g", F.lit("a")
    )
    row = log_histogram_quantiles(df, ["g"], "v").collect()[0]
    assert row.n == 1000
    # relative error bound: 10^(1/40)-1 ~ 5.9%; allow bucket-edge slack
    for est, true in [(row.p50, 500), (row.p90, 900), (row.p99, 990)]:
        assert abs(est - true) / true < 0.12
    # mergeability: two halves' sketches sum to the whole (same output)
    h1 = spark.createDataFrame([(v,) for v in vals[:500]], "v double").withColumn("g", F.lit("a"))
    h2 = spark.createDataFrame([(v,) for v in vals[500:]], "v double").withColumn("g", F.lit("a"))
    merged = log_histogram_quantiles(h1.union(h2), ["g"], "v").collect()[0]
    assert (merged.p50, merged.p90, merged.p99) == (row.p50, row.p90, row.p99)


def test_log_histogram_ignores_nonpositive(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.sketches import (
        log_histogram_quantiles,
    )

    df = spark.createDataFrame(
        [(-1.0,), (0.0,), (None,), (10.0,), (10.0,)], "v double"
    ).withColumn("g", F.lit("a"))
    row = log_histogram_quantiles(df, ["g"], "v").collect()[0]
    assert row.n == 2


def test_bloom_no_false_negatives_and_fp_rate(spark):
    """Every built value probes true (Bloom guarantee); false-positive
    rate on disjoint probes stays near the analytic (1-e^{-kn/m})^k."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    build = spark.range(500).selectExpr("concat('in-', id) AS v")
    members = bloom_probe(bloom_build(build, "v"), build, "v").collect()
    assert all(r.bloom_hit for r in members)

    out = spark.range(2000).selectExpr("concat('out-', id) AS v")
    probes = bloom_probe(bloom_build(build, "v"), out, "v").collect()
    fp = sum(r.bloom_hit for r in probes) / len(probes)
    # m=8192, k=3, n=500 -> analytic fp ~ 0.0043; allow generous slack
    assert fp < 0.03


def test_bloom_filter_is_one_row_and_bounded(spark):
    """The built filter is ONE row whose bit array is bounded by m
    regardless of build cardinality (metadata-sized broadcast)."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.sketches import (
        bloom_build,
    )

    build = spark.range(50_000).selectExpr("CAST(id AS STRING) AS v")
    rows = bloom_build(build, "v", m=1024, k=3).collect()
    assert len(rows) == 1
    bits = rows[0].bits
    assert len(bits) <= 1024
    assert bits == sorted(bits) and len(set(bits)) == len(bits)


def test_cms_join_size_overestimates_and_tight_when_wide(spark):
    from pyspark.sql import Row as _Row

    from accelerated_intelligent_document_processing_on_aws_spark.operators.sketches import (
        cms_join_size,
    )

    # keys 0..9 with counts 1..10 on side A; B = A (self-join F2)
    rows = [
        _Row(k=key) for key in range(10) for _ in range(key + 1)
    ]
    df = spark.createDataFrame(rows)
    exact_f2 = sum((i + 1) ** 2 for i in range(10))
    r = cms_join_size(df, "k", df, "k", depth=4, width=1024).collect()[0]
    assert r.n_keys_a == 10 and r.n_keys_b == 10
    assert r.exact == exact_f2
    # CMS never underestimates, and with width >> keys it is exact
    assert r.cms_est >= r.exact
    assert r.cms_est == exact_f2 and r.rel_err == 0.0


def test_cms_join_size_collision_inflation(spark):
    from pyspark.sql import Row as _Row

    from accelerated_intelligent_document_processing_on_aws_spark.operators.sketches import (
        cms_join_size,
    )

    # 50 distinct singleton keys crammed into width=4: collisions must
    # inflate the estimate above the exact self-join size (50)
    df = spark.createDataFrame([_Row(k=key) for key in range(50)])
    r = cms_join_size(df, "k", df, "k", depth=2, width=4).collect()[0]
    assert r.exact == 50
    assert r.cms_est > 50
    assert r.rel_err > 0
