"""Table-maintenance ops a long-lived pipeline needs (Iceberg analogs:
rewrite_data_files / expire_snapshots): output compaction and lineage
expiration — both must preserve data/resume semantics exactly."""

from __future__ import annotations

import os

import accelerated_intelligent_document_processing_on_aws_spark as pkg
from accelerated_intelligent_document_processing_on_aws_spark.datagen.transcripts import (
    write_transcripts,
)
from accelerated_intelligent_document_processing_on_aws_spark.io.checkpoint import (
    CheckpointStore,
)
from accelerated_intelligent_document_processing_on_aws_spark.io.tables import (
    compact_partitions,
)


def _bucket_files(path):
    out = {}
    for e in os.listdir(path):
        if e.startswith("pt="):
            out[e] = sorted(
                f for f in os.listdir(os.path.join(path, e)) if f.endswith(".parquet")
            )
    return out


def test_compaction_preserves_data_and_reduces_files(spark, tmp_path):
    inp, outp, ckpt = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    write_transcripts(spark, inp, n_convs=30, mean_turns=6, skew_convs=1, skew_factor=15)
    pkg.run_pipeline(spark, inp, outp, ckpt, pkg.PipelineConfig(n_buckets=8))
    # fragment the table in place (several files per bucket), as repeated
    # appends/task-parallel writes would; localCheckpoint materializes the
    # frame so the overwrite does not read the path it replaces
    frag = spark.read.parquet(outp).localCheckpoint(eager=True)
    frag.repartition(6).write.mode("overwrite").partitionBy("pt").parquet(outp)
    before = _bucket_files(outp)
    assert any(len(v) > 1 for v in before.values()), "need fragmented buckets"
    rows_before = spark.read.parquet(outp).orderBy("conv_id", "turn_idx").collect()

    done = compact_partitions(spark, outp, target_files=1)
    assert done, "at least one bucket compacted"
    after = _bucket_files(outp)
    for b, files in after.items():
        assert len(files) == 1 or b not in done
    assert not [e for e in os.listdir(outp) if e.startswith("_compact_tmp")]
    rows_after = spark.read.parquet(outp).orderBy("conv_id", "turn_idx").collect()
    assert rows_before == rows_after

    # resume still early-returns on the compacted table
    s = pkg.run_pipeline(spark, inp, outp, ckpt, pkg.PipelineConfig(n_buckets=8))
    assert s["resumed"] and s["partitions_written"] == 0


def test_expire_snapshots_keeps_recent_resume(spark, tmp_path):
    inp, outp, ckpt = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    cfg = pkg.PipelineConfig(n_buckets=4)
    # three input snapshots: grow the feed between runs
    snaps = []
    for i in range(3):
        write_transcripts(
            spark, inp, n_convs=6 + 2 * i, mean_turns=4, seed=7 + i
        )
        s = pkg.run_pipeline(spark, inp, outp, ckpt, cfg)
        snaps.append(s["snapshot_id"])
    store = CheckpointStore(spark, ckpt)
    all_rows = store.read().count()
    dropped = store.expire_snapshots(keep_last=2)
    assert dropped == all_rows - store.read().count() > 0
    # oldest snapshot gone, newest two resumable
    assert store.committed_partitions(snaps[0]) == []
    assert store.committed_partitions(snaps[2]) == list(range(4))
    s = pkg.run_pipeline(spark, inp, outp, ckpt, cfg)
    assert s["resumed"] and s["partitions_written"] == 0


def test_compaction_crash_recovery(spark, tmp_path):
    """A crash between the two swap renames leaves the bucket's data in
    the backup dir; the recovery preamble of the next invocation must
    rename it straight back — the bucket never reads empty."""
    inp, outp, ckpt = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    write_transcripts(spark, inp, n_convs=20, mean_turns=5)
    pkg.run_pipeline(spark, inp, outp, ckpt, pkg.PipelineConfig(n_buckets=4))
    rows = spark.read.parquet(outp).count()
    # simulate the worst crash point: bucket swapped out, replacement not in
    bucket = sorted(e for e in os.listdir(outp) if e.startswith("pt="))[0]
    os.rename(
        os.path.join(outp, bucket), os.path.join(outp, f"_compact_bak_{bucket}")
    )
    # plus a stale tmp dir from an interrupted rewrite
    os.makedirs(os.path.join(outp, f"_compact_tmp_{bucket}"), exist_ok=True)
    compact_partitions(spark, outp, target_files=1, min_files=99)  # heal only
    assert spark.read.parquet(outp).count() == rows
    assert not [e for e in os.listdir(outp) if e.startswith("_compact_")]


def test_expire_never_rewrites_surviving_files(spark, tmp_path):
    """Expiry is file-level GC: surviving lineage files are byte-identical
    afterwards (mtime+size unchanged), so a crash mid-expiry can never
    destroy live lineage (the round-3 implementation rewrote the whole
    store non-atomically)."""
    inp, outp, ckpt = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    cfg = pkg.PipelineConfig(n_buckets=4)
    for i in range(3):
        write_transcripts(spark, inp, n_convs=5 + 2 * i, mean_turns=4, seed=3 + i)
        pkg.run_pipeline(spark, inp, outp, ckpt, cfg)
    before = {
        f: os.stat(os.path.join(ckpt, f))
        for f in os.listdir(ckpt)
        if f.endswith(".parquet")
    }
    store = CheckpointStore(spark, ckpt)
    dropped = store.expire_snapshots(keep_last=2)
    assert dropped > 0
    after = {
        f for f in os.listdir(ckpt) if f.endswith(".parquet")
    }
    assert after < set(before), "expiry deletes whole files, adds none"
    for f in after:
        st = os.stat(os.path.join(ckpt, f))
        assert (st.st_mtime_ns, st.st_size) == (
            before[f].st_mtime_ns,
            before[f].st_size,
        ), "surviving lineage file was rewritten"


def test_write_fanin_one_file_per_nonempty_bucket(spark, tmp_path):
    """The pre-write pt exchange must bound output files to one per
    non-empty bucket per run — never tasks x buckets (the 2,000-file
    pathology the round-3 write alignment removed)."""
    inp, outp, ckpt = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    write_transcripts(spark, inp, n_convs=25, mean_turns=5)
    s = pkg.run_pipeline(spark, inp, outp, ckpt, pkg.PipelineConfig(n_buckets=16))
    files = _bucket_files(outp)
    assert sum(len(v) for v in files.values()) == s["partitions_written"]
    assert all(len(v) == 1 for v in files.values())


def test_time_travel_read_as_of(spark, tmp_path):
    """Iceberg-analog VERSION AS OF: a committed snapshot stays readable
    byte-for-byte until a later commit rewrites one of its files, after
    which reading it raises SnapshotExpiredError (never a partial table)."""
    import pytest as _pytest

    from accelerated_intelligent_document_processing_on_aws_spark.io.tables import (
        SnapshotExpiredError,
        list_snapshots,
        read_as_of,
        record_snapshot,
        write_partitioned,
    )

    inp, outp, ckpt = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    write_transcripts(spark, inp, n_convs=20, mean_turns=5)
    pkg.run_pipeline(spark, inp, outp, ckpt, pkg.PipelineConfig(n_buckets=8))
    snaps = list_snapshots(outp)
    assert len(snaps) == 1 and snaps[0]["files"], "pipeline commit has manifest"
    s1 = snaps[0]["snapshot_id"]

    v1 = read_as_of(spark, outp, s1)
    now = spark.read.parquet(outp)
    key = ["conv_id", "turn_idx"]
    assert v1.orderBy(*key).collect() == now.orderBy(*key).collect()
    assert "pt" in v1.columns  # basePath keeps the partition column

    # second commit rewrites ONE bucket -> s1 expires, s2 readable
    n_rows = now.count()  # materialize BEFORE the overwrite invalidates `now`
    pt0 = now.select("pt").orderBy("pt").limit(1).collect()[0][0]
    patch = (
        now.where(now.pt == pt0)
        .withColumn("extracted_text", now.extracted_text.substr(1, 3))
        .localCheckpoint(eager=True)
    )
    write_partitioned(patch, outp)
    record_snapshot(outp, "patched-snap", {"run_id": "patch"})

    v2 = read_as_of(spark, outp, "patched-snap")
    assert v2.count() == n_rows
    with _pytest.raises(SnapshotExpiredError):
        read_as_of(spark, outp, s1).count()
    with _pytest.raises(KeyError):
        read_as_of(spark, outp, "nonexistent")


def test_remove_orphan_files_gc(spark, tmp_path):
    """Only unreferenced data files die; manifested files, fresh files
    (grace window), and manifest-less tables are untouched; read_as_of
    still works afterwards."""
    import os
    import time

    import pyspark.sql.functions as F

    from accelerated_intelligent_document_processing_on_aws_spark.io.tables import (
        read_as_of,
        record_snapshot,
        remove_orphan_files,
        snapshot_id,
    )

    t = str(tmp_path / "tbl")
    df = spark.range(100).select(F.col("id"), (F.col("id") % 4).alias("pt"))
    df.write.partitionBy("pt").parquet(t)
    snap = snapshot_id(t)
    record_snapshot(t, snap)

    # plant two orphans: a crashed write's leftover in an existing bucket
    # and one in a novel directory
    orphan1 = os.path.join(t, "pt=0", "part-orphan-1.parquet")
    os.makedirs(os.path.join(t, "pt=99"), exist_ok=True)
    orphan2 = os.path.join(t, "pt=99", "part-orphan-2.parquet")
    spark.range(5).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "o"))
    src = next(
        f for f in os.listdir(str(tmp_path / "o")) if f.endswith(".parquet")
    )
    import shutil

    shutil.copy(str(tmp_path / "o" / src), orphan1)
    shutil.copy(str(tmp_path / "o" / src), orphan2)
    old = time.time() - 3600
    os.utime(orphan1, (old, old))

    # dry run reports, deletes nothing
    would = remove_orphan_files(t, grace_seconds=60, dry_run=True)
    assert sorted(would) == [os.path.join("pt=0", "part-orphan-1.parquet")]
    assert os.path.exists(orphan1) and os.path.exists(orphan2)

    removed = remove_orphan_files(t, grace_seconds=60)
    assert sorted(removed) == [os.path.join("pt=0", "part-orphan-1.parquet")]
    assert not os.path.exists(orphan1)
    assert os.path.exists(orphan2)  # inside the grace window

    # grace expired -> second orphan goes too
    os.utime(orphan2, (old, old))
    assert remove_orphan_files(t, grace_seconds=60) == [
        os.path.join("pt=99", "part-orphan-2.parquet")
    ]
    assert read_as_of(spark, t, snap).count() == 100

    # manifest-less table: never touched
    t2 = str(tmp_path / "bare")
    spark.range(10).write.parquet(t2)
    assert remove_orphan_files(t2) == []
    assert spark.read.parquet(t2).count() == 10
