"""Hand-computed cases for the hypothesis-testing operators
(operators/stats.py): two-proportion z-test, Mann-Whitney U, column
profile."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Row

from accelerated_intelligent_document_processing_on_aws_spark.operators.stats import (
    mann_whitney_u,
    profile_columns,
    prop_ztest_pairs,
)


def test_prop_ztest_hand_computed(spark):
    # group a: 8/10 success, group b: 2/10
    rows = [Row(g="a", ok=i < 8) for i in range(10)] + [
        Row(g="b", ok=i < 2) for i in range(10)
    ]
    df = spark.createDataFrame(rows)
    (r,) = prop_ztest_pairs(df, "g", F.col("ok")).collect()
    p1, p2, pp = 0.8, 0.2, 0.5
    z = (p1 - p2) / math.sqrt(pp * 0.5 * (0.1 + 0.1))
    assert (r.group_a, r.group_b, r.n_a, r.n_b) == ("a", "b", 10, 10)
    assert (r.rate_a, r.rate_b) == (0.8, 0.2)
    assert r.z == round(z, 6)


def test_prop_ztest_degenerate_variance(spark):
    df = spark.createDataFrame(
        [Row(g="a", ok=True)] * 5 + [Row(g="b", ok=True)] * 5
    )
    (r,) = prop_ztest_pairs(df, "g", F.col("ok")).collect()
    assert r.z is None  # pooled p = 1 -> zero variance


def test_mann_whitney_no_ties(spark):
    # a = {1,2,3}, b = {4,5}: all of b above all of a -> U_a = 0
    df = spark.createDataFrame(
        [Row(g="a", v=float(x)) for x in (1, 2, 3)]
        + [Row(g="b", v=float(x)) for x in (4, 5)]
    )
    (r,) = mann_whitney_u(df, "g", "v", "a", "b").collect()
    assert (r.n_a, r.n_b) == (3, 2)
    assert (r.u_a, r.u_b) == (0.0, 6.0)
    # sigma2 = 3*2/12 * (6 - 0) = 3, z = (0 - 3)/sqrt(3)
    assert r.z == round(-3.0 / math.sqrt(3.0), 6)


def test_mann_whitney_ties_average_ranks(spark):
    # a = {1, 2}, b = {2, 3}: the two 2s share rank (2+3)/2 = 2.5
    df = spark.createDataFrame(
        [Row(g="a", v=1.0), Row(g="a", v=2.0), Row(g="b", v=2.0), Row(g="b", v=3.0)]
    )
    (r,) = mann_whitney_u(df, "g", "v", "a", "b").collect()
    # R_a = 1 + 2.5 = 3.5 -> U_a = 3.5 - 3 = 0.5; U_b = 4 - 0.5 = 3.5
    assert (r.u_a, r.u_b) == (0.5, 3.5)
    # tie census: one tie of size 2 -> tsum = 6
    # sigma2 = 4/12 * (5 - 6/12) = 1.5; z = (0.5 - 2)/sqrt(1.5)
    assert r.z == round(-1.5 / math.sqrt(1.5), 6)


def test_mann_whitney_all_tied_z_null(spark):
    df = spark.createDataFrame(
        [Row(g="a", v=7.0), Row(g="a", v=7.0), Row(g="b", v=7.0)]
    )
    (r,) = mann_whitney_u(df, "g", "v", "a", "b").collect()
    assert r.z is None


def test_profile_columns(spark):
    df = spark.createDataFrame(
        [Row(a=1, b="x"), Row(a=1, b=None), Row(a=3, b="y")]
    )
    got = {r.column: r for r in profile_columns(df, exact_distinct=True).collect()}
    assert (got["a"].n, got["a"].n_null, got["a"].n_distinct) == (3, 0, 2)
    assert (got["a"].min_str, got["a"].max_str) == ("1", "3")
    assert (got["b"].n_null, got["b"].n_distinct) == (1, 2)
    # approx path returns the same counts at this tiny cardinality
    got2 = {r.column: r for r in profile_columns(df).collect()}
    assert got2["a"].n_distinct == 2
