"""KMV distinct / theta overlap / Efraimidis-Spirakis weighted sampling:
closed-form exactness below sketch size, accuracy bounds above it, and a
pure-python differential for the deterministic sampler."""

import hashlib
import math

import pytest

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
