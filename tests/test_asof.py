"""As-of join semantics: latest right row at-or-before each left row."""

from __future__ import annotations

from datetime import datetime

from accelerated_intelligent_document_processing_on_aws_spark.operators.asof import (
    asof_join,
)


def _ts(s):
    return datetime.fromisoformat(s)


def test_basic_asof(spark):
    left = spark.createDataFrame(
        [("u1", _ts("2025-01-01T10:00"), "p1"), ("u1", _ts("2025-01-01T12:00"), "p2"),
         ("u2", _ts("2025-01-01T09:00"), "p3")],
        ["user_id", "ts", "pid"],
    )
    right = spark.createDataFrame(
        [("u1", _ts("2025-01-01T09:30"), "c1"), ("u1", _ts("2025-01-01T11:00"), "c2"),
         ("u2", _ts("2025-01-01T09:30"), "c3")],
        ["user_id", "ts", "cid"],
    )
    got = {
        r.pid: r.cid_asof
        for r in asof_join(left, right, on=["user_id"]).collect()
    }
    assert got == {"p1": "c1", "p2": "c2", "p3": None}


def test_equal_timestamp_matches(spark):
    left = spark.createDataFrame(
        [("u", _ts("2025-01-01T10:00"), "p")], ["user_id", "ts", "pid"]
    )
    right = spark.createDataFrame(
        [("u", _ts("2025-01-01T10:00"), "c")], ["user_id", "ts", "cid"]
    )
    r = asof_join(left, right, on=["user_id"]).collect()[0]
    assert r.cid_asof == "c"  # ts >= semantics: same-instant right row counts


def test_matched_row_wins_atomically_null_fields_preserved(spark):
    """A legitimately-NULL field in the matched right row must stay NULL —
    not be back-filled from an older right row — and all matched columns
    must come from the SAME right row."""
    left = spark.createDataFrame(
        [("u", _ts("2025-01-01T12:00"), "p")], ["user_id", "ts", "pid"]
    )
    right = spark.createDataFrame(
        [("u", _ts("2025-01-01T10:00"), "old", 5),
         ("u", _ts("2025-01-01T11:00"), None, None)],
        "user_id string, ts timestamp, label string, v int",
    )
    r = asof_join(left, right, on=["user_id"]).collect()[0]
    assert r.label_asof is None and r.v_asof is None


def test_equal_ts_right_rows_deterministic_tiebreak(spark):
    """Multiple right rows at the same (key, ts): the greatest payload
    struct wins, independent of partition order."""
    left = spark.createDataFrame(
        [("u", _ts("2025-01-01T10:00"), "p")], ["user_id", "ts", "pid"]
    )
    right = spark.createDataFrame(
        [("u", _ts("2025-01-01T10:00"), "a"), ("u", _ts("2025-01-01T10:00"), "b")],
        ["user_id", "ts", "cid"],
    )
    for _ in range(3):
        r = asof_join(left, right.repartition(4), on=["user_id"]).collect()[0]
        assert r.cid_asof == "b"


def test_left_row_count_preserved(spark):
    left = spark.createDataFrame(
        [("u", _ts("2025-01-01T10:00"), f"p{i}") for i in range(5)],
        ["user_id", "ts", "pid"],
    )
    right = spark.createDataFrame([], "user_id string, ts timestamp, cid string")
    out = asof_join(left, right, on=["user_id"]).collect()
    assert len(out) == 5 and all(r.cid_asof is None for r in out)


def test_asof_unorderable_payload_and_explicit_tiebreak(spark):
    """Map-typed right payload must not break the window ordering (round-2
    ADVICE: ordering by the whole payload struct raised AnalysisException
    for unorderable columns), and an explicit tiebreak column decides
    duplicate-(key, ts) winners."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.asof import (
        asof_join,
    )
    from pyspark.sql import functions as F

    left = spark.createDataFrame([("k", 10)], "k string, ts int")
    right = (
        spark.createDataFrame(
            [("k", 5, "b", 2), ("k", 5, "a", 1)], "k string, ts int, v string, pr int"
        )
        .withColumn("m", F.create_map(F.lit("x"), F.col("pr")))
    )
    # unorderable map column in the payload: falls back to orderable fields
    got = asof_join(left, right, ["k"], "ts").collect()[0]
    assert got.v_asof == "b"  # greatest orderable tuple (v='b') wins
    assert got.m_asof == {"x": 2}
    # explicit tiebreak overrides: highest pr wins regardless of field order
    got2 = asof_join(left, right, ["k"], "ts", tiebreak="pr").collect()[0]
    assert got2.pr_asof == 2 and got2.v_asof == "b"
    got3 = asof_join(
        left, right.withColumn("pr", -F.col("pr")), ["k"], "ts", tiebreak="pr"
    ).collect()[0]
    assert got3.pr_asof == -1 and got3.v_asof == "a"
