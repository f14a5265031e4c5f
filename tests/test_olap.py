"""Unit tests for operators/olap.py (2-D skyline, Simpson reversals)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from accelerated_intelligent_document_processing_on_aws_spark.operators.olap import (
    simpson_reversals,
    skyline2d,
)


def _pts(spark, rows):
    return spark.createDataFrame(
        [Row(id=i, price=float(p), size=s) for i, (p, s) in enumerate(rows)]
    )


def test_skyline_dominance_and_ties(spark):
    # (price, size): minimize price, maximize size
    pts = [
        (1.0, 5),   # frontier
        (2.0, 7),   # frontier (pricier but bigger)
        (2.0, 7),   # exact tie of the above -> also kept
        (2.0, 6),   # dominated by (2.0, 7) same price, smaller
        (3.0, 7),   # dominated by (2.0, 7) pricier, equal size
        (0.5, 4),   # frontier (cheapest)
        (4.0, 8),   # frontier (biggest)
    ]
    got = {r.id for r in skyline2d(_pts(spark, pts), "price", "size").collect()}
    assert got == {0, 1, 2, 5, 6}


def test_skyline_null_rows_excluded(spark):
    df = spark.createDataFrame(
        [
            Row(id=0, price=1.0, size=1),
            Row(id=1, price=None, size=99),
            Row(id=2, price=0.1, size=None),
        ]
    )
    got = {r.id for r in skyline2d(df, "price", "size").collect()}
    assert got == {0}


def test_skyline_keep_cols_projection(spark):
    df = _pts(spark, [(1.0, 1)]).withColumn("extra", F.lit("x"))
    out = skyline2d(df, "price", "size", keep_cols=["id", "size"])
    assert out.columns == ["id", "size"]


def test_skyline_plan_is_broadcast_join(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.plans import (
        n_ops,
        plan_of,
    )

    plan = plan_of(skyline2d(_pts(spark, [(1.0, 1), (2.0, 2)]), "price", "size"))
    assert n_ops(plan, "BroadcastHashJoin") == 1
    assert n_ops(plan, "BroadcastNestedLoopJoin") == 0
    assert n_ops(plan, "CartesianProduct") == 0


def test_simpson_classic_reversal(spark):
    # Berkeley-style: treatment better inside EVERY stratum, worse pooled
    # stratum A (easy): treat 1/10 rows y=1 of 10 -> wait, build explicit
    # counts: A: treat 10 rows 9 success (.9), ctrl 100 rows 80 (.8)
    #         B: treat 100 rows 20 success (.2), ctrl 10 rows 1 (.1)
    # pooled: treat 29/110 (~.264), ctrl 81/110 (~.736) -> reversal in
    # both strata (diff > 0, overall < 0)
    rows = (
        [("A", 1, 1)] * 9 + [("A", 1, 0)] * 1
        + [("A", 0, 1)] * 80 + [("A", 0, 0)] * 20
        + [("B", 1, 1)] * 20 + [("B", 1, 0)] * 80
        + [("B", 0, 1)] * 1 + [("B", 0, 0)] * 9
    )
    df = spark.createDataFrame(rows, "stratum string, t int, y int")
    out = {
        r.stratum: r
        for r in simpson_reversals(
            df, "stratum", F.col("t") == 1, F.col("y") == 1
        ).collect()
    }
    a, b = out["A"], out["B"]
    assert (a.n_treat, a.n_ctrl) == (10, 100)
    assert a.rate_treat == 0.9 and a.rate_ctrl == 0.8
    assert a.diff == 0.1 and b.diff == 0.1
    assert a.overall_diff == b.overall_diff < 0
    assert a.reversed and b.reversed


def test_simpson_no_reversal_when_aligned(spark):
    rows = [("A", 1, 1)] * 5 + [("A", 1, 0)] * 5 + [("A", 0, 1)] * 2 + [
        ("A", 0, 0)
    ] * 8
    df = spark.createDataFrame(rows, "stratum string, t int, y int")
    r = simpson_reversals(
        df, "stratum", F.col("t") == 1, F.col("y") == 1
    ).collect()[0]
    assert r.diff == r.overall_diff == 0.3
    assert not r.reversed


def test_abc_classification_hand_case(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.olap import (
        abc_classification,
    )

    # values: k1=70, k2=20, k3=6, k4=4 (total 100)
    rows = (
        [("k1", 70.0)] + [("k2", 20.0)] + [("k3", 6.0)] + [("k4", 4.0)]
    )
    df = spark.createDataFrame(rows, ["k", "v"])
    out = {r.abc_class: r for r in
           abc_classification(df, "k", "v", 0.8, 0.95).collect()}
    # before-shares: k1=0 (A), k2=0.7 (A), k3=0.9 (B), k4=0.96 (C)
    assert out["A"].n_keys == 2 and out["A"].total_value == 90.0
    assert out["B"].n_keys == 1 and out["B"].total_value == 6.0
    assert out["C"].n_keys == 1
    assert abs(out["A"].value_share - 0.9) < 1e-9
    assert sum(r.value_share for r in out.values()) == 1.0
