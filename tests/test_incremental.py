"""Incremental (append-only delta) pipeline runs: new input files are
processed exactly once, prior ingests' output files are never touched,
the union of deltas equals a full run, and non-append-only input is
rejected loudly."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import accelerated_intelligent_document_processing_on_aws_spark as pkg
from accelerated_intelligent_document_processing_on_aws_spark.datagen.transcripts import (
    gen_transcripts_df,
)


def _file_mtimes(root):
    out = {}
    for r, _d, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(r, f)
                out[p] = os.path.getmtime(p)
    return out


def test_incremental_append_processes_only_delta(spark, tmp_path):
    inp, outp, ckpt = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    cfg = pkg.PipelineConfig(n_buckets=8)
    gen_transcripts_df(spark, n_convs=15, mean_turns=5).write.mode(
        "overwrite"
    ).parquet(inp)

    s1 = pkg.run_pipeline(spark, inp, outp, ckpt, cfg, incremental=True)
    assert s1["incremental"] and s1["new_files"] > 0 and not s1["resumed"]
    assert s1["partitions_committed"] == 8
    snap1 = s1["snapshot_id"]
    ingest1 = os.path.join(outp, f"ingest={snap1}")
    assert os.path.isdir(ingest1)

    # unchanged input -> pure resume, zero recomputation
    s2 = pkg.run_pipeline(spark, inp, outp, ckpt, cfg, incremental=True)
    assert s2["resumed"] and s2["partitions_written"] == 0
    before = _file_mtimes(ingest1)

    # append a second, conversation-complete batch as NEW files
    b2 = gen_transcripts_df(spark, n_convs=10, mean_turns=4).withColumn(
        "conv_id", F.concat(F.lit("b2-"), F.col("conv_id"))
    )
    b2.write.mode("append").parquet(inp)
    s3 = pkg.run_pipeline(spark, inp, outp, ckpt, cfg, incremental=True)
    assert s3["incremental"] and s3["new_files"] > 0
    assert s3["snapshot_id"] != snap1
    assert s3["partitions_committed"] == 8 and not s3["resumed"]

    # the first ingest's files are byte-untouched
    assert _file_mtimes(ingest1) == before

    # union of deltas == one full run over the whole input
    full_out, full_ckpt = str(tmp_path / "fout"), str(tmp_path / "fckpt")
    pkg.run_pipeline(spark, inp, full_out, full_ckpt, cfg)
    key = ["conv_id", "turn_idx"]
    got = (
        spark.read.parquet(outp).drop("ingest").orderBy(*key).collect()
    )
    want = spark.read.parquet(full_out).orderBy(*key).collect()
    assert got == want

    # third call with nothing new -> resumed
    s4 = pkg.run_pipeline(spark, inp, outp, ckpt, cfg, incremental=True)
    assert s4["resumed"] and s4["partitions_written"] == 0


def test_incremental_rejects_rewritten_input(spark, tmp_path):
    inp, outp, ckpt = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    cfg = pkg.PipelineConfig(n_buckets=4)
    gen_transcripts_df(spark, n_convs=8, mean_turns=4).write.mode(
        "overwrite"
    ).parquet(inp)
    pkg.run_pipeline(spark, inp, outp, ckpt, cfg, incremental=True)

    # deleting a processed file violates append-only -> loud failure
    victim = next(
        os.path.join(inp, f) for f in sorted(os.listdir(inp))
        if f.endswith(".parquet")
    )
    os.remove(victim)
    with pytest.raises(ValueError, match="append-only"):
        pkg.run_pipeline(spark, inp, outp, ckpt, cfg, incremental=True)


def test_incremental_mode_guards(spark, tmp_path):
    inp, outp, ckpt = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    gen_transcripts_df(spark, n_convs=4, mean_turns=3).write.mode(
        "overwrite"
    ).parquet(inp)
    with pytest.raises(ValueError, match="bucketed_table"):
        pkg.run_pipeline(
            spark, inp, outp, ckpt,
            pkg.PipelineConfig(n_buckets=4, bucketed_table="t_inc_guard"),
            incremental=True,
        )
    with pytest.raises(ValueError, match="parquet"):
        pkg.run_pipeline(
            spark, inp, outp, ckpt, pkg.PipelineConfig(n_buckets=4),
            incremental=True, input_format="jsonl",
        )
