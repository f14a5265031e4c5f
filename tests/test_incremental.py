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


def test_incremental_orphan_cleanup_heal_and_time_travel(spark, tmp_path):
    """The startup reconcile pass: a fully-committed-but-unmarked ingest
    heals (stays, not reprocessed); an abandoned partial ingest dir is
    deleted (never surfaces duplicates); read_as_of time-travels across
    ingests via the cumulative table-root manifests."""
    from accelerated_intelligent_document_processing_on_aws_spark.io.checkpoint import (
        input_done,
    )
    from accelerated_intelligent_document_processing_on_aws_spark.io.tables import (
        read_as_of,
    )

    inp, outp, ckpt = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    cfg = pkg.PipelineConfig(n_buckets=8)
    gen_transcripts_df(spark, n_convs=12, mean_turns=4).write.mode(
        "overwrite"
    ).parquet(inp)
    s1 = pkg.run_pipeline(spark, inp, outp, ckpt, cfg, incremental=True)
    snap1 = s1["snapshot_id"]
    assert input_done(ckpt, snap1)
    v1_rows = read_as_of(spark, outp, snap1).count()
    assert v1_rows == spark.read.parquet(outp).count()

    # simulate crash-after-lineage-before-marker: drop the marker
    os.remove(os.path.join(ckpt, "_inputs", f"snap-{snap1}.done"))
    # plant an abandoned partial delta (no lineage, no marker)
    orphan = os.path.join(outp, "ingest=deadbeef")
    gen_transcripts_df(spark, n_convs=2, mean_turns=2).withColumn(
        "conv_id", F.concat(F.lit("orphan-"), F.col("conv_id"))
    ).write.parquet(os.path.join(orphan, "pt=0"))

    b2 = gen_transcripts_df(spark, n_convs=6, mean_turns=3).withColumn(
        "conv_id", F.concat(F.lit("b2-"), F.col("conv_id"))
    )
    b2.write.mode("append").parquet(inp)
    s2 = pkg.run_pipeline(spark, inp, outp, ckpt, cfg, incremental=True)
    snap2 = s2["snapshot_id"]

    # heal: snap1's delta was NOT reprocessed — only batch-2 files ran
    assert input_done(ckpt, snap1)
    import json as _json

    with open(os.path.join(ckpt, "_inputs", f"snap-{snap1}.json")) as fh:
        n_b1 = len(_json.load(fh)["files"])
    n_now = len([f for f in os.listdir(inp) if f.endswith(".parquet")])
    assert s2["new_files"] == n_now - n_b1 > 0
    # orphan removed, no duplicate rows
    assert not os.path.isdir(orphan)
    got = spark.read.parquet(outp)
    assert got.filter(F.col("conv_id").startswith("orphan-")).count() == 0

    # union equality vs a fresh full run
    full_out, full_ckpt = str(tmp_path / "fout"), str(tmp_path / "fckpt")
    pkg.run_pipeline(spark, inp, full_out, full_ckpt, cfg)
    key = ["conv_id", "turn_idx"]
    assert (
        got.drop("ingest").orderBy(*key).collect()
        == spark.read.parquet(full_out).orderBy(*key).collect()
    )

    # cumulative time travel: snap2 sees everything; snap1 still readable
    assert read_as_of(spark, outp, snap2).count() == got.count()
    assert read_as_of(spark, outp, snap1).count() == v1_rows
