"""session_rollup: batch semantics vs a brute-force islands reference,
exact-gap merge boundary, and the same operator running under Structured
Streaming with a watermark (append mode, finalize-once)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from accelerated_intelligent_document_processing_on_aws_spark.operators.sessions import (
    session_rollup,
)

T0 = dt.datetime(2024, 1, 1)


def _sec(s):
    return T0 + dt.timedelta(seconds=s)


def _brute_sessions(rows, gap=1800.0):
    # rows: (user, seconds) -> {(user, start_s, end_s, n)}
    by_user = {}
    for u, s in rows:
        by_user.setdefault(u, []).append(s)
    out = set()
    for u, ss in by_user.items():
        ss.sort()
        cur = [ss[0]]
        for s in ss[1:]:
            if s - cur[-1] > gap:  # strict: touching windows merge
                out.add((u, cur[0], cur[-1] + gap, len(cur)))
                cur = [s]
            else:
                cur.append(s)
        out.add((u, cur[0], cur[-1] + gap, len(cur)))
    return out


def test_batch_matches_brute_force_islands(spark):
    rows = [
        ("u1", 0), ("u1", 1800), ("u1", 3601),        # 1800 merges, 1801 splits
        ("u1", 10000), ("u2", 5), ("u2", 6000),
    ]
    df = spark.createDataFrame(
        [(u, _sec(s)) for u, s in rows], "user_id string, ts timestamp_ntz"
    )
    got = set(
        (
            r.user_id,
            (r.session_start - T0).total_seconds(),
            (r.session_end - T0).total_seconds(),
            r.n_events,
        )
        for r in session_rollup(df, ["user_id"], "ts", "30 minutes").collect()
    )
    assert got == _brute_sessions(rows)


def test_extra_aggs_and_single_aggregate_plan(spark):
    df = spark.createDataFrame(
        [("u1", _sec(0), 2.0), ("u1", _sec(60), 3.5), ("u1", _sec(9000), 1.0)],
        "user_id string, ts timestamp_ntz, value double",
    )
    out = session_rollup(
        df, ["user_id"], "ts", "30 minutes",
        aggs=[F.sum("value").alias("sum_value")],
    ).orderBy("session_start")
    rows = out.collect()
    assert [(r.n_events, r.sum_value) for r in rows] == [(2, 5.5), (1, 1.0)]
    # native session_window = ONE aggregate operator family, no window
    # (lag/cumsum) exec in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan.replace("SessionWindow", "")


def test_streaming_sessions_with_watermark(spark, tmp_path):
    inp, outp, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))

    # watermarks require TIMESTAMP (LTZ) event time — NTZ is rejected
    def write(specs):
        spark.createDataFrame(
            [(u, _sec(s)) for u, s in specs], "user_id string, ts timestamp"
        ).coalesce(1).write.mode("append").parquet(inp)

    def drain():
        stream = (
            spark.readStream.schema("user_id string, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(inp)
        )
        q = (
            session_rollup(
                stream.withWatermark("ts", "10 minutes"),
                ["user_id"], "ts", "30 minutes",
            )
            .writeStream.format("parquet")
            .option("path", outp)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    # session A (u1 @ 0..60s) finalizes once the watermark (driven by the
    # 10_000s event) passes its end; the open session stays unemitted
    write([("u1", 0), ("u1", 60)])
    write([("u1", 10_000)])
    drain()
    first = {
        (r.user_id, r.n_events)
        for r in spark.read.parquet(outp).collect()
    }
    assert first == {("u1", 2)}

    # a later batch pushes the watermark past the second session; it emits
    # exactly once (checkpoint state carries across availableNow drains)
    write([("u1", 50_000)])
    drain()
    second = sorted(
        (r.user_id, r.n_events)
        for r in spark.read.parquet(outp).collect()
    )
    assert second == [("u1", 1), ("u1", 2)]


def test_run_length_stats_hand_case(spark):
    """aabba -> runs [2,2,1]: n_runs=3, max=2, mean=5/3."""
    import datetime as dt

    from accelerated_intelligent_document_processing_on_aws_spark.operators.sessions import (
        run_length_stats,
    )

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        ("u", lbl, t0 + dt.timedelta(seconds=i), i)
        for i, lbl in enumerate("aabba")
    ]
    df = spark.createDataFrame(rows, ["k", "lbl", "ts", "i"])
    r = run_length_stats(df, "k", "lbl", "ts", "i").collect()[0]
    assert (r.n_runs, r.max_run) == (3, 2)
    assert r.mean_run == round(5 / 3, 6)
