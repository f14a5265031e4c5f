"""delete_where: copy-on-write targeted deletion with partition pruning,
crash recovery, and snapshot commit (tests mirror test_resume's
filesystem-evidence style)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from accelerated_intelligent_document_processing_on_aws_spark.io.tables import (
    delete_where,
    list_snapshots,
    record_snapshot,
    snapshot_id,
)


def _write_table(spark, path):
    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 4).cast("string").alias("pt"),
        (F.col("id") % 10).alias("user"),
    )
    df.write.partitionBy("pt").mode("overwrite").parquet(path)
    record_snapshot(path, snapshot_id(path), {"op": "initial"})


def _bucket_files(path):
    out = {}
    for e in sorted(os.listdir(path)):
        if e.startswith("pt="):
            d = os.path.join(path, e)
            out[e] = {
                f: os.path.getmtime(os.path.join(d, f))
                for f in os.listdir(d)
                if f.endswith(".parquet")
            }
    return out


def test_delete_rewrites_only_affected_buckets(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_table(spark, path)
    before = _bucket_files(path)

    # user 3 lives at ids 3,13,...,93 -> pts 3,1 (id%4): ids 3,23,43,63,83
    # have pt 3,3,3,3,3 -- wait id%4 of 3=3, 13=1, 33=1, 53=1, 73=1, 93=1
    res = delete_where(spark, path, F.col("user") == 3, "pt")
    assert res["rows_deleted"] == 10
    assert set(res["buckets_rewritten"]) == {"1", "3"}

    after = _bucket_files(path)
    # untouched buckets keep byte-identical files (same names, mtimes)
    assert after["pt=0"] == before["pt=0"]
    assert after["pt=2"] == before["pt=2"]
    # affected buckets were rewritten
    assert after["pt=1"] != before["pt=1"]
    assert after["pt=3"] != before["pt=3"]

    remaining = spark.read.parquet(path)
    assert remaining.filter(F.col("user") == 3).count() == 0
    assert remaining.count() == 90

    # snapshot trail: initial + delete commit
    snaps = list_snapshots(path)
    assert snaps[-1]["op"] == "delete_where"
    assert snaps[-1]["rows_deleted"] == 10
    assert res["snapshot_id"] == snaps[-1]["snapshot_id"]


def test_delete_no_matches_is_noop(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_table(spark, path)
    before = _bucket_files(path)
    n_snaps = len(list_snapshots(path))
    res = delete_where(spark, path, F.col("user") == 99, "pt")
    assert res == {
        "rows_deleted": 0,
        "buckets_rewritten": [],
        "snapshot_id": None,
    }
    assert _bucket_files(path) == before
    assert len(list_snapshots(path)) == n_snaps


def test_delete_crash_recovery_preamble(spark, tmp_path):
    import shutil

    path = str(tmp_path / "t")
    _write_table(spark, path)

    # simulate a crash between the two renames: bucket moved to backup,
    # temp never swapped in
    os.rename(
        os.path.join(path, "pt=2"), os.path.join(path, "_delete_bak_pt=2")
    )
    os.makedirs(os.path.join(path, "_delete_tmp_pt=0"))

    res = delete_where(spark, path, F.col("user") == 0, "pt")
    # preamble healed pt=2 back and removed the stale temp before the scan
    assert not os.path.isdir(os.path.join(path, "_delete_bak_pt=2"))
    assert not os.path.isdir(os.path.join(path, "_delete_tmp_pt=0"))
    assert os.path.isdir(os.path.join(path, "pt=2"))
    assert res["rows_deleted"] == 10
    assert spark.read.parquet(path).count() == 90
