"""Schema evolution + snapshot refs on the emulated Iceberg layer
(io/tables.py): metadata-only ADD/DROP with per-file initial-default
resolution, and named refs (tags) resolving to time-travel reads.

Reference analog: the reference's Glue/Athena tables evolve by DDL
(reporting table schemas, SURVEY §2 S7/S8); Iceberg's ADD COLUMN with
initial defaults is the engine-side equivalent."""

import os

import pytest
from pyspark.sql import functions as F

from accelerated_intelligent_document_processing_on_aws_spark.io.tables import (
    drop_ref,
    evolve_add_column,
    evolve_drop_column,
    list_refs,
    read_as_of,
    read_by_ref,
    read_table_evolved,
    record_snapshot,
    snapshot_id,
    tag_snapshot,
)


def _write(spark, path, rows, cols):
    spark.createDataFrame(rows, cols).write.mode("append").parquet(path)


def test_add_column_initial_default_per_file(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _write(spark, t, [(1, "a"), (2, "b")], ["id", "txt"])
    evolve_add_column(t, "score", "double", 0.5)
    # v2 file carries the column, including an EXPLICIT NULL row
    _write(
        spark, t, [(3, "c", 0.9), (4, "d", None)], ["id", "txt", "score"]
    )
    got = {
        r.id: r.score
        for r in read_table_evolved(spark, t).collect()
    }
    assert got[1] == 0.5 and got[2] == 0.5      # pre-evolution files
    assert got[3] == 0.9                        # real value
    assert got[4] is None                       # explicit NULL preserved
    # naive coalesce-after-mergeSchema would have returned 0.5 for id=4


def test_drop_column_metadata_only(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _write(spark, t, [(1, "a", 7.0)], ["id", "txt", "junk"])
    evolve_drop_column(t, "junk")
    df = read_table_evolved(spark, t)
    assert "junk" not in df.columns
    assert df.count() == 1
    # bytes are untouched: a plain read still sees the column
    assert "junk" in spark.read.parquet(t).columns


def test_add_then_drop_chain_and_plain_table(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _write(spark, t, [(1, "a")], ["id", "txt"])
    # no records: plain read path
    assert set(read_table_evolved(spark, t).columns) == {"id", "txt"}
    evolve_add_column(t, "lang", "string", "und")
    evolve_add_column(t, "w", "double", 1.0)
    evolve_drop_column(t, "txt")
    r = read_table_evolved(spark, t).collect()[0]
    assert (r.lang, r.w) == ("und", 1.0)
    assert "txt" not in r.asDict()


def test_refs_tag_retag_drop(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _write(spark, t, [(1, "a")], ["id", "txt"])
    s1 = snapshot_id(t)
    record_snapshot(t, s1)
    _write(spark, t, [(2, "b")], ["id", "txt"])
    s2 = snapshot_id(t)
    record_snapshot(t, s2)

    tag_snapshot(t, "prod", s1)
    assert list_refs(t) == {"prod": s1}
    assert read_by_ref(spark, t, "prod").count() == 1
    assert (
        read_by_ref(spark, t, "prod").collect()
        == read_as_of(spark, t, s1).collect()
    )
    # promotion: atomic retarget
    tag_snapshot(t, "prod", s2)
    assert read_by_ref(spark, t, "prod").count() == 2
    # unknown snapshot refuses
    with pytest.raises(KeyError):
        tag_snapshot(t, "prod", "nope")
    assert drop_ref(t, "prod") and list_refs(t) == {}
    with pytest.raises(KeyError):
        read_by_ref(spark, t, "prod")


def test_evolution_composes_with_partitioned_layout(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, f"d{i}", i % 2) for i in range(10)], ["id", "txt", "pt"]
    )
    df.write.partitionBy("pt").mode("append").parquet(t)
    evolve_add_column(t, "flag", "int", 0)
    df2 = spark.createDataFrame(
        [(100, "new", 0, 1)], ["id", "txt", "pt", "flag"]
    )
    df2.write.partitionBy("pt").mode("append").parquet(t)
    out = read_table_evolved(spark, t)
    assert "pt" in out.columns  # hive partition column still resolves
    assert out.count() == 11
    flags = {r.id: r.flag for r in out.collect()}
    assert flags[100] == 1 and all(flags[i] == 0 for i in range(10))
