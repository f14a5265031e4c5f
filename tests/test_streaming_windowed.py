"""Watermark + event-time windowed aggregation (brief: 'watermarks +
windowed aggs for late data').

Two availableNow drains against one checkpoint prove the three pinned
semantics: (1) windows finalize and emit exactly once when the watermark
passes their end, (2) a turn arriving AFTER its window finalized is
dropped (bounded state), (3) unfinalized window state survives across
drains via the checkpoint.
"""

from __future__ import annotations

import datetime as dt
import os

from accelerated_intelligent_document_processing_on_aws_spark.datagen.transcripts import (
    transcripts_spark_schema,
)
from accelerated_intelligent_document_processing_on_aws_spark.streaming.windowed import (
    run_windowed_metrics,
    windowed_turn_metrics,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _rows(*specs):
    # spec: (conv_id, turn_idx, role, text, seconds_after_T0)
    return [
        (c, i, r, t, None, T0 + dt.timedelta(seconds=s)) for c, i, r, t, s in specs
    ]


def _write(spark, rows, path, fname_hint):
    df = spark.createDataFrame(rows, transcripts_spark_schema())
    df.coalesce(1).write.mode("append").parquet(path)
    assert os.path.isdir(path)


def test_windowed_metrics_late_data_policy(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # drain 1: two turns in window [00:00, 01:00) + one at 05:00 that
    # advances the watermark to 03:00, finalizing the first window
    _write(
        spark,
        _rows(
            ("c1", 0, "user", "hello", 10),
            ("c1", 1, "assistant", "hi", 40),
            ("c2", 0, "user", "later", 300),
        ),
        inp,
        "a",
    )
    run_windowed_metrics(spark, inp, out, ckpt, "1 minute", "2 minutes")
    got1 = {
        (r.win_start.second + r.win_start.minute * 60, r.role): r.n_turns
        for r in spark.read.parquet(out).collect()
    }
    assert got1 == {(0, "user"): 1, (0, "assistant"): 1}

    # drain 2: one LATE turn for the finalized window (dropped) + one at
    # 08:00 advancing the watermark to 06:00, finalizing the 05:00 window
    _write(
        spark,
        _rows(
            ("c9", 0, "user", "too late", 30),
            ("c3", 0, "user", "fresh", 480),
        ),
        inp,
        "b",
    )
    run_windowed_metrics(spark, inp, out, ckpt, "1 minute", "2 minutes")
    rows = spark.read.parquet(out).collect()
    by_key = {
        (r.win_start.minute, r.role): r.n_turns for r in rows
    }
    # late turn added NOTHING: minute-0 window still 1 user turn, emitted once
    assert by_key[(0, "user")] == 1
    assert sum(1 for r in rows if r.win_start.minute == 0 and r.role == "user") == 1
    # the 05:00 turn (state carried across drains in the checkpoint) emitted
    assert by_key[(5, "user")] == 1
    # the 08:00 turn's window is NOT final yet (watermark 06:00)
    assert (8, "user") not in by_key


def test_windowed_metrics_batch_twin(spark):
    """The same operator over a batch frame = the no-late-data oracle."""
    rows = _rows(
        ("c1", 0, "user", "abc", 10),
        ("c1", 1, "assistant", "defg", 70),
    )
    df = spark.createDataFrame(rows, transcripts_spark_schema())
    got = {
        (r.win_start.minute, r.role): (r.n_turns, r.n_chars)
        for r in windowed_turn_metrics(df).collect()
    }
    assert got == {(0, "user"): (1, 3), (1, "assistant"): (1, 4)}
