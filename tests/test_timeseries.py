"""Hand-computed cases for calendar-aware rolling metrics
(operators/timeseries.py) and reciprocal-rank fusion
(operators/similarity.rrf_fuse)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Row

from accelerated_intelligent_document_processing_on_aws_spark.operators.similarity import (
    rrf_fuse,
)
from accelerated_intelligent_document_processing_on_aws_spark.operators.timeseries import (
    rolling_daily_metrics,
)


def _ev(day: int, n: int):
    return [Row(k="a", ts=datetime(2024, 1, day, 12, 0, 0))] * n


def test_rolling_gap_days_age_out(spark):
    # days 1 (n=2), 2 (n=1), 9 (n=5), 10 (n=3) — the 7-day jump is the
    # case a ROWS frame gets wrong
    df = spark.createDataFrame(_ev(1, 2) + _ev(2, 1) + _ev(9, 5) + _ev(10, 3))
    got = {
        r.day: r
        for r in rolling_daily_metrics(df, ["k"], "ts", 7).collect()
    }
    assert (got["2024-01-01"].rolling_sum, got["2024-01-01"].rolling_days) == (2, 1)
    assert (got["2024-01-02"].rolling_sum, got["2024-01-02"].rolling_days) == (3, 2)
    # Jan 9 frame = Jan 3..9: only Jan 9 itself survives
    assert (got["2024-01-09"].rolling_sum, got["2024-01-09"].rolling_days) == (5, 1)
    assert (got["2024-01-10"].rolling_sum, got["2024-01-10"].rolling_days) == (8, 2)
    # calendar-day average: missing days count as zero
    assert got["2024-01-10"].rolling_avg == round(8 / 7.0, 6)


def test_rolling_week_over_week(spark):
    df = spark.createDataFrame(_ev(2, 1) + _ev(9, 5) + _ev(10, 3))
    got = {
        r.day: r
        for r in rolling_daily_metrics(df, ["k"], "ts", 7).collect()
    }
    # Jan 9 is exactly 7 days after Jan 2
    assert (got["2024-01-09"].prev_week_n, got["2024-01-09"].wow_delta) == (1, 4)
    # Jan 10's minus-7 day (Jan 3) had no events
    assert got["2024-01-10"].prev_week_n is None
    assert got["2024-01-10"].wow_delta is None
    assert got["2024-01-02"].prev_week_n is None


def test_rrf_hand_computed(spark):
    r1 = spark.createDataFrame(
        [Row(query_id=1, neighbor_id=10, rank=1), Row(query_id=1, neighbor_id=11, rank=2)]
    )
    r2 = spark.createDataFrame(
        [Row(query_id=1, neighbor_id=11, rank=1), Row(query_id=1, neighbor_id=12, rank=2)]
    )
    rows = rrf_fuse([r1, r2], k=3).collect()
    order = [(r.neighbor_id, r.rank, r.n_rankers) for r in rows]
    # 11 appears in both rankers (1/61 + 1/62) > 10 (1/61) > 12 (1/62)
    assert order == [(11, 1, 2), (10, 2, 1), (12, 3, 1)]
    assert rows[0].rrf_score == round(1 / 61.0 + 1 / 62.0, 6)


def test_rrf_tiebreak_neighbor_asc(spark):
    r1 = spark.createDataFrame(
        [Row(query_id=1, neighbor_id=20, rank=1), Row(query_id=1, neighbor_id=5, rank=1)]
    )
    rows = rrf_fuse([r1], k=2).collect()
    assert [r.neighbor_id for r in rows] == [5, 20]
