"""Stream-stream interval join (user turn -> assistant response pairs).

Pins: (1) pairs emit exactly once across two availableNow drains against
one checkpoint, (2) the event-time bound excludes responses beyond
max_lag, (3) the streaming result matches the batch range-join oracle on
the same data.
"""

from __future__ import annotations

import datetime as dt

from accelerated_intelligent_document_processing_on_aws_spark.datagen.transcripts import (
    transcripts_spark_schema,
)
from accelerated_intelligent_document_processing_on_aws_spark.streaming.joined import (
    response_pairs,
    run_response_pairs,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _rows(*specs):
    # spec: (conv_id, turn_idx, role, seconds_after_T0)
    return [
        (c, i, r, f"{r}-{i}", None, T0 + dt.timedelta(seconds=s))
        for c, i, r, s in specs
    ]


def _write(spark, rows, path):
    spark.createDataFrame(rows, transcripts_spark_schema()).coalesce(
        1
    ).write.mode("append").parquet(path)


def test_batch_semantics_range_bound(spark):
    rows = _rows(
        ("c1", 0, "user", 0),
        ("c1", 1, "assistant", 30),     # pairs with turn 0 (lag 30)
        ("c1", 2, "user", 60),
        ("c1", 3, "assistant", 500),    # pairs with turn 2 (lag 440 <= 500? no: max 300)
        ("c2", 0, "user", 0),
        ("c2", 1, "assistant", 0),      # same ts: strict > excludes
    )
    out = response_pairs(
        spark.createDataFrame(rows, transcripts_spark_schema()),
        max_lag_sec=300,
    ).collect()
    got = {(r.conv_id, r.u_idx, r.a_idx): r.latency_sec for r in out}
    # c1 turn3 is 440s after turn2 -> outside 300s bound; 500-30=470s
    # after turn0 -> also outside.  c2 equal-ts pair excluded.
    assert got == {("c1", 0, 1): 30.0}


def test_streaming_join_exactly_once_across_drains(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write(
        spark,
        _rows(
            ("c1", 0, "user", 0),
            ("c1", 1, "assistant", 20),
            ("c2", 0, "user", 10),
        ),
        inp,
    )
    run_response_pairs(spark, inp, out, ckpt, max_lag_sec=300)
    first = spark.read.parquet(out).collect()
    assert {(r.conv_id, r.u_idx, r.a_idx) for r in first} == {("c1", 0, 1)}

    # second drain: c2's response arrives (in-bound), plus a way-late
    # assistant turn for c1 outside max_lag that must NOT pair
    _write(
        spark,
        _rows(
            ("c2", 1, "assistant", 40),
            ("c1", 2, "assistant", 9000),
        ),
        inp,
    )
    run_response_pairs(spark, inp, out, ckpt, max_lag_sec=300)
    second = spark.read.parquet(out).collect()
    keys = [(r.conv_id, r.u_idx, r.a_idx) for r in second]
    # no duplicates, exactly the two legit pairs
    assert sorted(keys) == [("c1", 0, 1), ("c2", 0, 1)]
    lat = {(r.conv_id, r.u_idx, r.a_idx): r.latency_sec for r in second}
    assert lat[("c2", 0, 1)] == 30.0


def test_streaming_matches_batch_oracle(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    rows = _rows(
        ("c1", 0, "user", 0),
        ("c1", 1, "assistant", 10),
        ("c1", 2, "user", 30),
        ("c1", 3, "assistant", 45),
        ("c3", 0, "user", 5),
        ("c3", 1, "assistant", 100),
    )
    _write(spark, rows, inp)
    run_response_pairs(spark, inp, out, ckpt, max_lag_sec=300)
    got = {
        (r.conv_id, r.u_idx, r.a_idx, r.latency_sec)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r.conv_id, r.u_idx, r.a_idx, r.latency_sec)
        for r in response_pairs(
            spark.createDataFrame(rows, transcripts_spark_schema()),
            max_lag_sec=300,
        ).collect()
    }
    assert got == want and len(want) > 0
