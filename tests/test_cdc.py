"""Hand-case tests for operators/cdc.py (MERGE INTO + SCD2 intervals).
The DuckDB oracles (q_merge_upsert, q_scd2) certify engine parity; these
pin the semantics on tiny frames: each MERGE verb, null-attribute run
breaks, tiebreak determinism, and the open current interval."""

import datetime

from pyspark.sql import functions as F

from accelerated_intelligent_document_processing_on_aws_spark.operators.cdc import (
    merge_into,
    scd2_intervals,
)


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id long, v string, n long"
    )


def test_merge_all_verbs(spark):
    changes = spark.createDataFrame(
        [
            (2, "upsert", "B", 200),   # update
            (3, "delete", None, None),  # delete
            (9, "upsert", "i", 90),    # insert
        ],
        "id long, op string, v string, n long",
    )
    got = {
        r.id: (r.v, r.n)
        for r in merge_into(_base(spark), changes, "id").collect()
    }
    assert got == {1: ("a", 10), 2: ("B", 200), 9: ("i", 90)}


def test_merge_empty_changes_is_identity(spark):
    empty = spark.createDataFrame([], "id long, op string, v string, n long")
    out = merge_into(_base(spark), empty, "id")
    assert sorted(out.collect()) == sorted(_base(spark).collect())


def test_merge_delete_unknown_key_is_noop(spark):
    ch = spark.createDataFrame(
        [(99, "delete", None, None)], "id long, op string, v string, n long"
    )
    assert merge_into(_base(spark), ch, "id").count() == 3


def _ts(s):
    return datetime.datetime(2024, 1, 1, 0, 0, s)


def test_scd2_runs_and_current_flag(spark):
    rows = [
        (1, _ts(0), "x"), (1, _ts(1), "x"), (1, _ts(2), "y"), (1, _ts(3), "x"),
        (2, _ts(0), "z"),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, a string")
    out = scd2_intervals(df, "k", "ts", ["a"]).collect()
    u1 = sorted([r for r in out if r.k == 1], key=lambda r: r.valid_from)
    assert [(r.a, r.valid_from.second, r.is_current) for r in u1] == [
        ("x", 0, 0), ("y", 2, 0), ("x", 3, 1)
    ]
    # valid_to chains exactly onto the next run's valid_from
    assert u1[0].valid_to == u1[1].valid_from
    assert u1[2].valid_to is None
    (u2,) = [r for r in out if r.k == 2]
    assert (u2.a, u2.is_current) == ("z", 1)


def test_scd2_null_attr_breaks_run(spark):
    rows = [(1, _ts(0), "x"), (1, _ts(1), None), (1, _ts(2), "x")]
    df = spark.createDataFrame(rows, "k long, ts timestamp, a string")
    out = scd2_intervals(df, "k", "ts", ["a"])
    assert out.count() == 3  # NULL is its own run, not an extension


def test_scd2_tiebreak_determinism(spark):
    # two events at the SAME ts: the tiebreak column decides run order
    rows = [(1, _ts(0), 2, "b"), (1, _ts(0), 1, "a"), (1, _ts(5), 3, "c")]
    df = spark.createDataFrame(rows, "k long, ts timestamp, eid long, a string")
    out = scd2_intervals(df, "k", "ts", ["a"], tiebreak=["eid"])
    first = out.orderBy("valid_from", F.col("is_current").desc()).first()
    assert out.count() == 3 and first.a == "a"


def test_incremental_agg_matches_recompute(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.cdc import (
        incremental_agg,
    )

    base = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 5.0), ("c", 7.0)], "g string, v double"
    )
    view = base.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("v")
    )
    # delete both 'a' rows (group drops), delete one 'b'-insert pair that
    # cancels, insert a brand-new group 'd'
    delta = spark.createDataFrame(
        [
            ("a", 1.0, "delete"), ("a", 2.0, "delete"),
            ("b", 9.0, "insert"), ("b", 9.0, "delete"),
            ("d", 4.0, "insert"),
        ],
        "g string, v double, op string",
    )
    out = {r.g: (r.n_rows, r.v) for r in incremental_agg(view, delta, ["g"], ["v"]).collect()}
    assert out == {"b": (1, 5.0), "c": (1, 7.0), "d": (1, 4.0)}


def test_incremental_agg_empty_delta_is_identity(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.cdc import (
        incremental_agg,
    )

    base = spark.createDataFrame([("a", 1.0)], "g string, v double")
    view = base.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("v")
    )
    delta = spark.createDataFrame([], "g string, v double, op string")
    out = incremental_agg(view, delta, ["g"], ["v"]).collect()
    assert [(r.g, r.n_rows, r.v) for r in out] == [("a", 1, 1.0)]


def test_table_diff_statuses(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.cdc import (
        table_diff,
    )

    old = spark.createDataFrame(
        [(1, "x", 10), (2, "y", 20), (3, "z", 30), (4, None, 40)],
        "k long, a string, b long",
    )
    new = spark.createDataFrame(
        [(1, "x", 10), (2, "Y", 21), (4, "w", 40), (5, "n", 50)],
        "k long, a string, b long",
    )
    out = {r.k: (r.status, list(r.changed_cols)) for r in
           table_diff(old, new, "k", ["a", "b"]).collect()}
    assert out[1] == ("unchanged", [])
    assert out[2] == ("changed", ["a", "b"])
    assert out[3] == ("removed", [])
    assert out[4] == ("changed", ["a"])  # NULL -> value counts as a change
    assert out[5] == ("added", [])
