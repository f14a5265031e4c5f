"""Streaming session windows (streaming/sessions_stream.py): native
session_window + watermark, closed sessions emitted exactly once across
availableNow drains, stream-static broadcast cost enrichment."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from accelerated_intelligent_document_processing_on_aws_spark.datagen.transcripts import (
    transcripts_spark_schema,
)
from accelerated_intelligent_document_processing_on_aws_spark.streaming.sessions_stream import (
    run_conv_sessions,
    stream_conv_sessions,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _rows(*specs):
    # spec: (conv_id, turn_idx, role, text, seconds_after_T0)
    return [
        (c, i, r, t, None, T0 + dt.timedelta(seconds=s))
        for c, i, r, t, s in specs
    ]


def _write(spark, rows, path):
    spark.createDataFrame(rows, transcripts_spark_schema()).coalesce(
        1
    ).write.mode("append").parquet(path)


def test_batch_sessions_split_on_gap(spark):
    rows = _rows(
        ("c1", 0, "user", "aa", 0),
        ("c1", 1, "assistant", "bbb", 60),      # same sitting
        ("c1", 2, "user", "cc", 1000),          # > 5 min later: new one
        ("c2", 0, "user", "d", 30),
    )
    df = spark.createDataFrame(rows, transcripts_spark_schema())
    out = {
        (r.conv_id, r.sess_start): r
        for r in stream_conv_sessions(df, gap="5 minutes").collect()
    }
    assert len(out) == 3
    s1 = out[("c1", T0)]
    assert s1.n_turns == 2 and s1.n_chars == 5
    # session end extends gap past the LAST turn
    assert s1.sess_end == T0 + dt.timedelta(seconds=60 + 300)
    s2 = out[("c1", T0 + dt.timedelta(seconds=1000))]
    assert s2.n_turns == 1


def test_stream_static_cost_enrichment(spark):
    rows = _rows(
        ("c1", 0, "user", "aa", 0),
        ("c1", 1, "assistant", "bbb", 10),
        ("c1", 2, "assistant", "x", 20),
    )
    df = spark.createDataFrame(rows, transcripts_spark_schema())
    costs = spark.createDataFrame(
        [("user", 0.5), ("assistant", 2.0)], ["role", "cost_per_turn"]
    )
    r = stream_conv_sessions(df, role_costs=costs).collect()[0]
    assert r.cost == 4.5  # 0.5 + 2 + 2


def test_streaming_sessions_exactly_once_across_drains(spark, tmp_path):
    inp = str(tmp_path / "in")
    outp = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # drain 1: one finished sitting (watermark pushed past its close by
    # a late sentinel turn) and one still-open sitting
    _write(
        spark,
        _rows(
            ("c1", 0, "user", "aa", 0),
            ("c1", 1, "assistant", "bb", 30),
            ("sentinel", 0, "user", "zz", 3600),
        ),
        inp,
    )
    run_conv_sessions(spark, inp, outp, ckpt, gap="5 minutes",
                      watermark_delay="1 minute")
    first = spark.read.parquet(outp).collect()
    convs = {r.conv_id for r in first}
    assert "c1" in convs  # c1's sitting closed (watermark at 3600-60)
    n_first = len(first)

    # drain 2: nothing new -> NO re-emission of already-closed sessions
    _write(spark, _rows(("c3", 0, "user", "q", 7200)), inp)
    run_conv_sessions(spark, inp, outp, ckpt, gap="5 minutes",
                      watermark_delay="1 minute")
    second = spark.read.parquet(outp).collect()
    c1_rows = [r for r in second if r.conv_id == "c1"]
    assert len(c1_rows) == 1  # exactly once
    # sentinel's sitting closed once the c3 turn advanced the watermark
    assert len(second) > n_first
