"""Snapshot-versioned table IO (Iceberg-style semantics on plain Parquet).

The sandbox has no Iceberg jars, so this module emulates the subset of
Iceberg semantics the pipeline depends on, behind an interface that maps
1:1 onto a real Iceberg catalog (SURVEY.md §7 "Iceberg in sandbox"):

* ``snapshot_id(path)``   — content-addressed id of the current input state
  (sorted file name+size list, hashed).  Iceberg analog: current snapshot.
* ``write_partitioned``   — overwrite-by-partition parquet write with a
  ``pt`` bucket column (salted hash of conv_id).  Iceberg analog:
  ``overwrite`` of ``bucket(N, conv_id)`` partitions — idempotent replay.
* manifest json under ``<table>/_manifest/`` recording committed snapshots.

On a real deployment, swap for ``df.writeTo(tbl).overwritePartitions()``
with a configured Iceberg catalog; interfaces are kept identical.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def snapshot_id(path: str) -> str:
    """Deterministic id of a parquet dir's current content."""
    entries = []
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if f.startswith(("_", ".")):
                continue
            fp = os.path.join(root, f)
            entries.append(f"{os.path.relpath(fp, path)}:{os.path.getsize(fp)}")
    h = hashlib.sha256("\n".join(sorted(entries)).encode()).hexdigest()[:16]
    return h


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: Optional[str] = None,
    mode: str = "overwrite",
) -> None:
    """Hive-bucketed managed table (``bucketBy`` + optional ``sortBy``).

    Pre-bucketing both sides of a recurring join on the join key lets
    Spark plan a SortMergeJoin with ZERO exchanges — the bucketed scan
    already satisfies the required hash partitioning (the brief's
    'bucketing for co-located joins'; pinned by tests/test_bucketing.py).
    At 100 TB this turns every repeated conv-keyed join/agg against the
    extracted table into a shuffle-free stage.  Iceberg analog:
    ``PARTITIONED BY (bucket(N, col))``.
    """
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def salted_bucket(conv_col, n_buckets: int = 64, salt: str = "idp"):
    """Salted-hash partition id: pmod(xxhash64(salt, conv_id), n_buckets).

    The salt decorrelates bucket assignment from any upstream hash
    partitioning of conv_id, so hot conversations spread independently of
    their original layout (north_rule skew requirement).
    """
    return F.pmod(F.xxhash64(F.lit(salt), conv_col), F.lit(n_buckets)).cast("int")


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_col: str = "pt",
    mode: str = "overwrite",
) -> None:
    """Partitioned parquet write; dynamic partition overwrite so re-running
    a subset of buckets replaces only those buckets (idempotent resume)."""
    (
        df.write.mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )


def write_partitioned_bucketed(
    df: DataFrame,
    table: str,
    partition_col: str = "pt",
    bucket_col: str = "conv_id",
    sort_cols: tuple = ("conv_id", "turn_idx"),
    n_buckets: int = 16,
) -> str:
    """Partitioned AND bucketed managed-table write with dynamic partition
    overwrite — the pipeline's publish-for-joins sink (round 4, VERDICT
    #8): the output keeps the per-``pt`` resume/overwrite granularity of
    :func:`write_partitioned` while every downstream conv-keyed join or
    aggregate against it plans ZERO exchanges (the bucketed scan already
    satisfies the hash partitioning; pinned by tests/test_bucketing.py).

    First run creates the table (``partitionBy + bucketBy + sortBy``
    saveAsTable); later runs ``insertInto`` under a dynamic
    partitionOverwriteMode so only the partitions present in ``df`` are
    replaced (idempotent resume, same as the path-based sink).
    ``insertInto`` is POSITIONAL — the frame is re-selected in the
    table's column order.  Returns the table's storage location (for the
    snapshot manifest).
    """
    spark = df.sparkSession
    if spark.catalog.tableExists(table):
        cols = spark.table(table).columns
        conf = "spark.sql.sources.partitionOverwriteMode"
        prev = spark.conf.get(conf, "static")
        spark.conf.set(conf, "dynamic")
        try:
            df.select(*cols).write.mode("overwrite").insertInto(table)
        finally:
            spark.conf.set(conf, prev)
    else:
        (
            df.write.mode("overwrite")
            .partitionBy(partition_col)
            .bucketBy(n_buckets, bucket_col)
            .sortBy(*sort_cols)
            .saveAsTable(table)
        )
    loc = [
        r.data_type
        for r in spark.sql(f"DESCRIBE FORMATTED {table}").collect()
        if r.col_name == "Location"
    ]
    return loc[0].removeprefix("file:") if loc else ""


def _data_files(table_path: str) -> list:
    """(relative path, size) of every live data file under the table."""
    out = []
    for root, dirs, files in os.walk(table_path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for f in sorted(files):
            if f.startswith(("_", ".")) or not f.endswith(".parquet"):
                continue
            fp = os.path.join(root, f)
            out.append([os.path.relpath(fp, table_path), os.path.getsize(fp)])
    return sorted(out)


def record_snapshot(table_path: str, snap_id: str, meta: Optional[dict] = None) -> None:
    """Commit a snapshot manifest: id, timestamp, and the full data-file
    list (path + size) of the table as of this commit — the Iceberg
    analog of a snapshot's manifest list, and what makes
    :func:`read_as_of` time travel possible.  Written atomically (temp
    file + ``os.replace``): a crash mid-write can never leave a torn
    JSON that would break ``list_snapshots`` for the whole table."""
    mdir = os.path.join(table_path, "_manifest")
    os.makedirs(mdir, exist_ok=True)
    rec = {
        "snapshot_id": snap_id,
        "committed_at": time.time(),
        "files": _data_files(table_path),
        **(meta or {}),
    }
    p = os.path.join(mdir, f"snap-{snap_id}.json")
    with open(p + ".tmp", "w") as fh:
        json.dump(rec, fh)
    os.replace(p + ".tmp", p)


def list_snapshots(table_path: str) -> list:
    """Committed snapshot manifests, oldest first (Iceberg analog:
    the ``snapshots`` metadata table)."""
    mdir = os.path.join(table_path, "_manifest")
    if not os.path.isdir(mdir):
        return []
    recs = []
    for f in os.listdir(mdir):
        if f.startswith("snap-") and f.endswith(".json"):
            with open(os.path.join(mdir, f)) as fh:
                recs.append(json.load(fh))
    return sorted(recs, key=lambda r: r["committed_at"])


class SnapshotExpiredError(RuntimeError):
    """The requested snapshot's data files were rewritten or removed by a
    later commit (Iceberg analog: reading an expired snapshot)."""


def read_as_of(spark: SparkSession, path: str, snap_id: str) -> DataFrame:
    """Time-travel read: the table exactly as of snapshot ``snap_id``
    (Iceberg analog: ``VERSION AS OF``).

    Reads ONLY the data files listed in that snapshot's manifest, with
    ``basePath`` set so partition columns (``pt=...``) still resolve.
    Dynamic partition overwrite deletes replaced files, so a snapshot
    stays readable until a later commit rewrites one of its buckets —
    exactly Iceberg's behavior after ``expire_snapshots``; a missing or
    size-changed file raises :class:`SnapshotExpiredError` rather than
    silently returning a partial table.
    """
    recs = [r for r in list_snapshots(path) if r["snapshot_id"] == snap_id]
    if not recs:
        raise KeyError(f"no committed snapshot {snap_id!r} under {path}")
    rec = recs[-1]
    if "files" not in rec:
        raise SnapshotExpiredError(
            f"snapshot {snap_id!r} predates file-manifest tracking"
        )
    full = []
    for rel, size in rec["files"]:
        fp = os.path.join(path, rel)
        if not os.path.isfile(fp) or os.path.getsize(fp) != size:
            raise SnapshotExpiredError(
                f"snapshot {snap_id!r} expired: {rel} was rewritten or "
                "removed by a later commit"
            )
        full.append(fp)
    if not full:
        return spark.read.parquet(path).limit(0)
    return spark.read.option("basePath", path).parquet(*full)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str = "pt",
    target_files: int = 1,
    min_files: int = 2,
) -> dict:
    """Small-file compaction per partition bucket (Iceberg analog:
    ``rewrite_data_files``).

    Every pipeline run writes one file per task per bucket, so a
    long-lived output table accumulates small files and every later scan
    pays their open/footer cost.  Compaction rewrites ONLY buckets that
    exceed ``min_files`` fragments, one bucket at a time: the bucket is
    rewritten to an underscore-prefixed temp dir (reader-ignored), then
    swapped in via two directory renames (``pt=X`` → backup, temp →
    ``pt=X``); the backup is deleted LAST.  Committed data therefore
    exists in a live or backup dir at every instant — a crash can at
    worst leave the bucket momentarily missing between the two renames
    (microseconds, no job in between), and the recovery preamble on the
    next invocation renames the backup straight back.  (The previous
    ordering deleted the originals BEFORE moving the compacted files in:
    a crash in that window left the data only in a reader-ignored temp
    dir — the bucket read as empty while the checkpoint said COMMITTED.)
    Returns {bucket_value: files_before} for the compacted buckets.

    The driver loop is bounded by the bucket count (a config constant,
    64 default), not by data volume; each bucket rewrite is a distributed
    job.  On Iceberg, replace with the catalog's rewrite procedure.
    """
    import shutil

    # recovery preamble: heal any bucket a previous crash left swapped out
    for entry in sorted(os.listdir(path)):
        if entry.startswith("_compact_bak_"):
            orig = os.path.join(path, entry[len("_compact_bak_"):])
            bak = os.path.join(path, entry)
            if os.path.isdir(orig):
                shutil.rmtree(bak)  # swap completed; backup is garbage
            else:
                os.rename(bak, orig)  # crash between the two renames
        elif entry.startswith("_compact_tmp_"):
            shutil.rmtree(os.path.join(path, entry))  # never swapped in

    done: dict = {}
    for entry in sorted(os.listdir(path)):
        if not entry.startswith(f"{partition_col}="):
            continue
        bdir = os.path.join(path, entry)
        files = [f for f in os.listdir(bdir) if f.endswith(".parquet")]
        if len(files) < min_files:
            continue
        tmp = os.path.join(path, f"_compact_tmp_{entry}")
        bak = os.path.join(path, f"_compact_bak_{entry}")
        # eager materialization before touching the source dir: Spark
        # cannot overwrite a path it is lazily reading
        spark.read.parquet(bdir).coalesce(target_files).write.mode(
            "overwrite"
        ).parquet(tmp)
        os.rename(bdir, bak)
        os.rename(tmp, bdir)
        shutil.rmtree(bak)
        done[entry.split("=", 1)[1]] = len(files)
    return done


def remove_orphan_files(
    table_path: str,
    grace_seconds: float = 0.0,
    dry_run: bool = False,
) -> list:
    """Delete data files under the table that NO committed snapshot
    manifest references (Iceberg analog: ``remove_orphan_files``) — the
    third maintenance op next to ``compact_partitions`` and
    ``CheckpointStore.expire_snapshots``.  Orphans are the debris of
    crashed writes: a task that wrote files but whose run never committed
    a manifest (Spark's own _temporary cleanup handles most, but a kill
    between file moves and the manifest commit leaves live-looking
    parquet that read_table would happily include after a naive
    recursive read).

    Safety rules (the crash-safety contract the other maintenance ops
    follow):

    * a table with NO manifests is never touched (nothing can be proven
      orphaned);
    * files newer than ``grace_seconds`` are kept — an in-flight write's
      files always get to outlive their own commit window;
    * deletion is file-by-file (no directory wipes); a crash mid-GC just
      leaves fewer orphans for the next pass.

    Returns the (relative) paths removed — or, with ``dry_run``, the
    paths that WOULD be removed."""
    snaps = list_snapshots(table_path)
    if not snaps:
        return []
    referenced = set()
    for s in snaps:
        for f, _sz in s.get("files", []):
            referenced.add(f)
    now = time.time()
    removed = []
    for rel, _sz in _data_files(table_path):
        if rel in referenced:
            continue
        fp = os.path.join(table_path, rel)
        if now - os.path.getmtime(fp) < grace_seconds:
            continue
        removed.append(rel)
        if not dry_run:
            os.remove(fp)
    return removed


def delete_where(
    spark: SparkSession,
    path: str,
    predicate,
    partition_col: str = "pt",
    snapshot_meta: Optional[dict] = None,
) -> dict:
    """Targeted row deletion (Iceberg analog: ``DELETE FROM`` with
    copy-on-write): rewrite ONLY the partition buckets that contain
    matching rows, leave every other file byte-identical, and commit a
    new snapshot manifest -- the right-to-be-forgotten primitive at
    100 TB, where "rewrite the table" is not an option.

    One scan finds the affected buckets and their match counts; each
    affected bucket is rewritten without the matching rows and swapped
    in via the ``compact_partitions`` two-rename discipline (write to a
    reader-ignored temp dir, original -> backup, temp -> original,
    backup deleted LAST), so committed data exists in a live or backup
    dir at every instant and the recovery preamble heals a crash at any
    point.  Untouched buckets are never opened for write -- the
    partition-pruned cost profile a GDPR sweep needs.

    Returns ``{"rows_deleted": n, "buckets_rewritten": [...],
    "snapshot_id": new_id}`` (no matches: no rewrites, no snapshot).
    """
    import shutil

    # recovery preamble shared with compaction crashes of delete_where
    for entry in sorted(os.listdir(path)):
        if entry.startswith("_delete_bak_"):
            orig = os.path.join(path, entry[len("_delete_bak_"):])
            bak = os.path.join(path, entry)
            if os.path.isdir(orig):
                shutil.rmtree(bak)
            else:
                os.rename(bak, orig)
        elif entry.startswith("_delete_tmp_"):
            shutil.rmtree(os.path.join(path, entry))

    hits = (
        spark.read.parquet(path)
        .filter(predicate)
        .groupBy(partition_col)
        .count()
        .collect()
    )
    if not hits:
        return {
            "rows_deleted": 0,
            "buckets_rewritten": [],
            "snapshot_id": None,
        }
    rows_deleted = sum(r["count"] for r in hits)
    buckets = sorted(str(r[partition_col]) for r in hits)
    for b in buckets:
        entry = f"{partition_col}={b}"
        bdir = os.path.join(path, entry)
        tmp = os.path.join(path, f"_delete_tmp_{entry}")
        bak = os.path.join(path, f"_delete_bak_{entry}")
        # eager rewrite of survivors BEFORE touching the source dir
        # (Spark cannot overwrite a path it is lazily reading)
        (
            spark.read.parquet(bdir)
            .filter(~predicate)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        os.rename(bdir, bak)
        os.rename(tmp, bdir)
        shutil.rmtree(bak)
    new_snap = snapshot_id(path)
    meta = dict(snapshot_meta or {})
    meta.update(
        {
            "op": "delete_where",
            "rows_deleted": int(rows_deleted),
            "buckets_rewritten": buckets,
        }
    )
    record_snapshot(path, new_snap, meta)
    return {
        "rows_deleted": int(rows_deleted),
        "buckets_rewritten": buckets,
        "snapshot_id": new_snap,
    }


# ---------------------------------------------------------------------------
# Snapshot refs (tags/branches) — Iceberg analog: named refs in table
# metadata (`ALTER TABLE ... CREATE TAG`).  A ref is one atomic JSON file
# under _manifest/refs/, so retargeting is an os.replace and readers never
# observe a torn ref.
# ---------------------------------------------------------------------------


def tag_snapshot(table_path: str, ref: str, snap_id: str) -> None:
    """Create or retarget a named ref (tag) to a committed snapshot —
    the "prod points at the validated snapshot" workflow: consumers
    read by STABLE NAME while new snapshots land, and promotion is one
    atomic ref move, never a data copy.  Raises on unknown snapshots so
    a typo can't publish an unreadable ref."""
    if not any(
        r["snapshot_id"] == snap_id for r in list_snapshots(table_path)
    ):
        raise KeyError(
            f"cannot tag unknown snapshot {snap_id!r} under {table_path}"
        )
    rdir = os.path.join(table_path, "_manifest", "refs")
    os.makedirs(rdir, exist_ok=True)
    p = os.path.join(rdir, f"{ref}.json")
    with open(p + ".tmp", "w") as fh:
        json.dump({"ref": ref, "snapshot_id": snap_id, "ts": time.time()}, fh)
    os.replace(p + ".tmp", p)


def list_refs(table_path: str) -> dict:
    """ref name → snapshot id (Iceberg analog: the ``refs`` metadata
    table)."""
    rdir = os.path.join(table_path, "_manifest", "refs")
    if not os.path.isdir(rdir):
        return {}
    out = {}
    for f in sorted(os.listdir(rdir)):
        if f.endswith(".json"):
            with open(os.path.join(rdir, f)) as fh:
                rec = json.load(fh)
            out[rec["ref"]] = rec["snapshot_id"]
    return out


def drop_ref(table_path: str, ref: str) -> bool:
    p = os.path.join(table_path, "_manifest", "refs", f"{ref}.json")
    if os.path.isfile(p):
        os.remove(p)
        return True
    return False


def read_by_ref(spark: SparkSession, path: str, ref: str) -> DataFrame:
    """Read the table as of the snapshot a named ref points at
    (Iceberg analog: ``VERSION AS OF 'tag'``)."""
    refs = list_refs(path)
    if ref not in refs:
        raise KeyError(f"no ref {ref!r} under {path}")
    return read_as_of(spark, path, refs[ref])


# ---------------------------------------------------------------------------
# Schema evolution — Iceberg analog: ADD COLUMN with an initial default /
# DROP COLUMN, recorded as ordered metadata records; data files are NEVER
# rewritten.  Reads resolve per-FILE: a file whose parquet footer lacks an
# added column was written before the evolution, so its rows read as the
# column's initial default — exactly Iceberg's initial-default semantics
# (an explicit NULL written AFTER the add stays NULL; naive
# coalesce-after-mergeSchema would conflate the two).  RENAME is out of
# scope: it needs Iceberg's field-id indirection, which plain parquet
# lacks — documented, not emulated.
# ---------------------------------------------------------------------------


def _schema_records(table_path: str) -> list:
    sdir = os.path.join(table_path, "_manifest")
    if not os.path.isdir(sdir):
        return []
    recs = []
    for f in os.listdir(sdir):
        if f.startswith("schema-") and f.endswith(".json"):
            with open(os.path.join(sdir, f)) as fh:
                recs.append(json.load(fh))
    return sorted(recs, key=lambda r: r["version"])


def _write_schema_record(table_path: str, rec: dict) -> None:
    sdir = os.path.join(table_path, "_manifest")
    os.makedirs(sdir, exist_ok=True)
    version = len(_schema_records(table_path)) + 1
    rec = {"version": version, "ts": time.time(), **rec}
    p = os.path.join(sdir, f"schema-{version:05d}.json")
    with open(p + ".tmp", "w") as fh:
        json.dump(rec, fh)
    os.replace(p + ".tmp", p)


def evolve_add_column(
    table_path: str, name: str, dtype: str, default=None
) -> None:
    """Record an ADD COLUMN evolution (Iceberg: ``ALTER TABLE ... ADD
    COLUMN``): no data file is touched; files that predate the record
    read the column as ``default`` (cast to ``dtype``)."""
    _write_schema_record(
        table_path,
        {"op": "add", "name": name, "dtype": dtype, "default": default},
    )


def evolve_drop_column(table_path: str, name: str) -> None:
    """Record a DROP COLUMN evolution: the column disappears from reads
    (old files keep the bytes — drop is metadata-only, like Iceberg)."""
    _write_schema_record(table_path, {"op": "drop", "name": name})


def read_table_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Read a table applying its recorded schema evolution.

    Per-file resolution: data files are grouped by WHICH added columns
    their parquet footer already carries (a driver-side footer scan —
    metadata-sized, one pyarrow ``read_schema`` per file, no data read);
    each group scans with ``basePath`` so hive partition columns
    resolve, missing added columns are filled with their recorded
    initial default, and the groups union by name.  Drops apply last.
    With no evolution records this is a plain parquet read.
    """
    recs = _schema_records(path)
    if not recs:
        return spark.read.parquet(path)
    adds = [r for r in recs if r["op"] == "add"]
    drops = [r["name"] for r in recs if r["op"] == "drop"]
    import pyarrow.parquet as pq

    groups: dict = {}
    for rel, _size in _data_files(path):
        fp = os.path.join(path, rel)
        cols = set(pq.read_schema(fp).names)
        missing = tuple(
            sorted(a["name"] for a in adds if a["name"] not in cols)
        )
        groups.setdefault(missing, []).append(fp)
    add_by_name = {a["name"]: a for a in adds}
    parts = []
    for missing, files in sorted(groups.items()):
        df = spark.read.option("basePath", path).parquet(*files)
        for name in missing:
            a = add_by_name[name]
            df = df.withColumn(
                name, F.lit(a["default"]).cast(a["dtype"])
            )
        # added columns present in the footer still cast to the
        # recorded type so the union is type-stable across groups
        for a in adds:
            if a["name"] not in missing:
                df = df.withColumn(
                    a["name"], F.col(a["name"]).cast(a["dtype"])
                )
        parts.append(df)
    out = parts[0]
    for p_df in parts[1:]:
        out = out.unionByName(p_df, allowMissingColumns=True)
    for name in drops:
        if name in out.columns:
            out = out.drop(name)
    return out
