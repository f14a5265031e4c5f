"""Bucketized range joins vs brute-force references: exact match sets,
exactly-once emission (no dedup exchange), left-join null semantics, and
bin-width invariance."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from accelerated_intelligent_document_processing_on_aws_spark.operators.rangejoin import (
    interval_overlap_join,
    range_join,
)

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def frames(spark):
    points = spark.createDataFrame(
        [
            ("u1", 1, _ts(5)),
            ("u1", 2, _ts(65)),
            ("u1", 3, _ts(200)),
            ("u2", 4, _ts(5)),
            ("u2", 5, _ts(500)),
        ],
        "key string, pid int, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            ("u1", 10, _ts(0), _ts(60)),       # catches pid 1 (and 2 at edge 65? no)
            ("u1", 11, _ts(60), _ts(180)),     # catches pid 2 (65)
            ("u1", 12, _ts(190), _ts(185)),    # inverted: matches nothing
            ("u2", 13, _ts(0), _ts(10)),       # catches pid 4
            ("u3", 14, _ts(0), _ts(1000)),     # key with no points
        ],
        "key string, iid int, start timestamp, end timestamp",
    )
    return points, intervals


def _brute_point(points, intervals):
    return set(
        (r.pid, r.iid)
        for r in points.alias("p")
        .join(
            intervals.alias("i"),
            (F.col("p.key") == F.col("i.key"))
            & (F.col("p.ts") >= F.col("i.start"))
            & (F.col("p.ts") <= F.col("i.end")),
        )
        .select("pid", "iid")
        .collect()
    )


@pytest.mark.parametrize("bin_width", [60.0, 3600.0, 7.0])
def test_point_in_interval_matches_brute_force(frames, bin_width):
    points, intervals = frames
    got = range_join(
        points, intervals, on=["key"], point_col="ts",
        start_col="start", end_col="end", bin_width=bin_width,
    )
    assert set((r.pid, r.iid) for r in got.collect()) == _brute_point(
        points, intervals
    )
    # exactly-once: no (pid, iid) appears twice
    assert got.count() == got.select("pid", "iid").distinct().count()


def test_left_join_keeps_unmatched_points(frames, spark):
    points, intervals = frames
    got = range_join(
        points, intervals, on=["key"], point_col="ts",
        start_col="start", end_col="end", bin_width=60.0, how="left",
    )
    rows = {r.pid: r for r in got.collect()}
    assert set(rows) == {1, 2, 3, 4, 5}          # every point survives
    assert rows[3].iid is None and rows[5].iid is None
    assert got.count() == len(_brute_point(points, intervals)) + 2


def test_overlap_self_join_matches_brute_force(spark):
    ivls = spark.createDataFrame(
        [
            ("u1", 1, 0.0, 10.0),
            ("u1", 2, 10.0, 20.0),   # touches 1 at 10 -> overlap
            ("u1", 3, 21.0, 30.0),   # disjoint from 2
            ("u1", 4, 5.0, 100.0),   # overlaps 1, 2, 3
            ("u2", 5, 0.0, 10.0),    # other key: never pairs with u1
        ],
        "key string, iid int, start double, end double",
    )
    got = interval_overlap_join(
        ivls, on=["key"], start_col="start", end_col="end", bin_width=8.0
    )
    pairs = set((r.iid_a, r.iid_b) for r in got.collect())
    assert pairs == {(1, 2), (1, 4), (2, 4), (3, 4)}
    assert got.count() == len(pairs)  # attribution bin: exactly once

    # two-sided variant agrees (unordered pairs appear in both directions)
    both = interval_overlap_join(
        ivls, ivls, on=["key"], start_col="start", end_col="end", bin_width=8.0
    ).filter(F.col("iid_a") != F.col("iid_b"))
    assert set(
        (min(r.iid_a, r.iid_b), max(r.iid_a, r.iid_b)) for r in both.collect()
    ) == pairs
    assert both.count() == 2 * len(pairs)


def test_no_nested_loop_join_in_plans(frames):
    points, intervals = frames
    plan = range_join(
        points, intervals, on=["key"], point_col="ts",
        start_col="start", end_col="end",
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    oplan = interval_overlap_join(
        intervals.select("key", "iid", "start", "end"),
        on=["key"], start_col="start", end_col="end",
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in oplan and "CartesianProduct" not in oplan
