"""Durable streaming sink: per-micro-batch partitioned write + lineage,
batch/stream row parity, caught-up idempotence, incremental arrival."""

from __future__ import annotations

import dataclasses
import os

import pytest
from pyspark.sql import functions as F

from accelerated_intelligent_document_processing_on_aws_spark import (
    PipelineConfig,
    extract_stage,
)
from accelerated_intelligent_document_processing_on_aws_spark.datagen.transcripts import (
    gen_transcripts_df,
)
from accelerated_intelligent_document_processing_on_aws_spark.io.checkpoint import (
    CheckpointStore,
)
from accelerated_intelligent_document_processing_on_aws_spark.streaming.durable import (
    run_stream_durable,
    stream_output,
)


@pytest.fixture(scope="module")
def spark():
    from accelerated_intelligent_document_processing_on_aws_spark import get_spark

    yield get_spark(master="local[4]", shuffle_partitions=8)


def _write_input(spark, path, n_convs, seed_offset=0):
    df = gen_transcripts_df(spark, n_convs=n_convs, mean_turns=6)
    if seed_offset:
        df = df.withColumn(
            "conv_id", F.concat(F.lit(f"g{seed_offset}-"), F.col("conv_id"))
        )
    df.coalesce(2).write.mode("append").parquet(path)
    return df


def test_durable_stream_commits_batches_with_lineage(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    lin = str(tmp_path / "lineage")
    sck = str(tmp_path / "stream_ckpt")
    _write_input(spark, inp, n_convs=12)

    ran = run_stream_durable(
        spark, inp, out, lin, sck, max_files_per_trigger=1
    )
    assert ran["batches"] >= 2  # maxFilesPerTrigger=1 over >=2 files

    got = stream_output(spark, out)
    want = extract_stage(
        spark.read.parquet(inp),
        dataclasses.replace(PipelineConfig(), with_sections=False),
    )
    assert got.count() == want.count() == ran["rows"]
    # batch/stream parity on the extraction itself
    a = {
        (r.conv_id, r.turn_idx, r.extracted_text)
        for r in got.select("conv_id", "turn_idx", "extracted_text").collect()
    }
    b = {
        (r.conv_id, r.turn_idx, r.extracted_text)
        for r in want.select("conv_id", "turn_idx", "extracted_text").collect()
    }
    assert a == b

    # lineage: every ingest partition's buckets committed; counts add up
    store = CheckpointStore(spark, lin)
    ldf = store.read()
    assert ldf.filter(F.col("status") != "COMMITTED").count() == 0
    assert (
        ldf.agg(F.sum("row_count")).collect()[0][0] == ran["rows"]
    )
    snaps = {r.input_snapshot_id for r in ldf.select("input_snapshot_id").distinct().collect()}
    ingests = {d.split("=", 1)[1] for d in os.listdir(out) if d.startswith("ingest=")}
    assert snaps == ingests


def test_durable_stream_caught_up_is_noop_and_incremental(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    lin = str(tmp_path / "lineage")
    sck = str(tmp_path / "stream_ckpt")
    _write_input(spark, inp, n_convs=8)
    r1 = run_stream_durable(spark, inp, out, lin, sck)
    assert r1["batches"] >= 1
    n1 = stream_output(spark, out).count()

    # caught up: zero new batches, output unchanged
    r2 = run_stream_durable(spark, inp, out, lin, sck)
    assert r2 == {"batches": 0, "rows": 0}
    assert stream_output(spark, out).count() == n1

    # a new file arrives: exactly the delta is processed into new ingests
    _write_input(spark, inp, n_convs=5, seed_offset=1)
    r3 = run_stream_durable(spark, inp, out, lin, sck)
    assert r3["batches"] >= 1 and r3["rows"] > 0
    assert stream_output(spark, out).count() == n1 + r3["rows"]
