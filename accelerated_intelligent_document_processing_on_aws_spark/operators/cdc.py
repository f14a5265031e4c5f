"""Change-data-capture application: MERGE INTO and SCD2 historization.

The repo's snapshot-versioned table IO (io/tables.py: manifests,
time travel, compaction) gives the storage half of a lakehouse; this
module adds the two canonical WRITE-side semantics a 100 TB warehouse
applies on top of it:

* :func:`merge_into` — Iceberg/Delta ``MERGE INTO`` expressed as ONE
  full-outer shuffle join (upsert + delete in a single pass; no
  per-row driver logic, no second scan of the base).
* :func:`scd2_intervals` — slowly-changing-dimension type 2: collapse a
  keyed, timestamped attribute stream into validity intervals
  (``valid_from``/``valid_to``/``is_current``) via the repo's
  gaps-and-islands discipline (lag + cumulative sum, one window pass).

Scale shape: ``merge_into`` shuffles base and changes once each on the
merge key — at 10^12 rows the join is the unavoidable cost and AQE
handles skewed keys; everything else is projection.  ``scd2_intervals``
is two window functions over the same (key, ts) partitioning — one
exchange total.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: change-operation column values understood by merge_into
OP_UPSERT = "upsert"
OP_DELETE = "delete"


def merge_into(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply a change batch to a base table: rows whose key matches an
    ``upsert`` change take the change's values, keys matching a
    ``delete`` drop, unmatched ``upsert`` keys insert, and untouched
    base rows pass through — ``MERGE INTO`` semantics in one full-outer
    join.

    ``changes`` must carry the base's value columns plus ``op_col`` and
    at most ONE row per key (the caller dedups a raw CDC stream first,
    e.g. last-change-wins via a row_number window); duplicate keys
    would multiply matched base rows, so this is enforced upstream —
    the operator itself stays a pure one-pass join.
    """
    value_cols = [c for c in base.columns if c != key]
    ch = changes.select(
        F.col(key),
        F.col(op_col).alias("_op"),
        *[F.col(c).alias(f"_ch_{c}") for c in value_cols],
    )
    joined = base.join(ch, key, "full_outer")
    merged = joined.filter(
        F.col("_op").isNull() | (F.col("_op") != F.lit(OP_DELETE))
    )
    return merged.select(
        F.col(key),
        *[
            F.when(F.col("_op") == OP_UPSERT, F.col(f"_ch_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in value_cols
        ],
    )


def scd2_intervals(
    df: DataFrame,
    key: str,
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Collapse a keyed attribute stream into SCD2 validity intervals:
    one row per (key, run of identical ``attr_cols`` values) with
    ``valid_from`` (first ts of the run), ``valid_to`` (first ts of the
    NEXT run, NULL on the current run) and ``is_current``.

    Consecutive observations with unchanged attributes extend the open
    interval — the gaps-and-islands pattern (lag-compare + cumulative
    sum island ids) over ONE (key ORDER BY ts) window partitioning;
    the island rollup is the only other shuffle and both key on
    ``key``, so AQE plans them back-to-back on one exchange.

    ``tiebreak`` columns extend the ordering for streams where
    ``(key, ts)`` is not unique (e.g. an event id) — determinism under
    parallelism is the operator's contract, same as sectionize's.
    """
    w = Window.partitionBy(key).orderBy(ts_col, *tiebreak)
    changed = F.lit(False)
    for c in attr_cols:
        prev = F.lag(F.col(c)).over(w)
        # null-safe inequality: a NULL attribute starting or ending a run
        # must count as a change, not compare to NULL
        changed = changed | ~F.col(c).eqNullSafe(prev)
    first_row = F.lag(F.col(ts_col)).over(w).isNull()
    marked = df.withColumn(
        "_new_run", (first_row | changed).cast("int")
    ).withColumn("_run", F.sum("_new_run").over(w))
    runs = marked.groupBy(key, "_run", *attr_cols).agg(
        F.min(ts_col).alias("valid_from")
    )
    w2 = Window.partitionBy(key).orderBy("valid_from")
    return runs.select(
        key,
        *attr_cols,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.lead("valid_from").over(w2).isNull().cast("int").alias("is_current"),
    )


def incremental_agg(
    base_agg: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    count_col: str = "n_rows",
    op_col: str = "op",
) -> DataFrame:
    """Incremental view maintenance for a SUM/COUNT group-by view: fold a
    signed CDC delta batch into a previously materialized aggregate
    without touching the base table.

    ``base_agg`` holds one row per group with ``count_col`` plus one
    pre-summed column per ``sum_cols``.  ``delta`` holds raw change rows
    carrying the grouping keys, the raw measure columns (same names as
    ``sum_cols``) and ``op_col`` ∈ {'insert', 'delete'}.  The delta is
    aggregated with sign +1/-1 (map-side partial agg collapses it before
    the shuffle), full-outer merged onto the view by group key, and
    groups whose maintained count reaches zero drop — exactly the
    algebra Materialize/Delta-style IVM applies, expressed as one
    aggregate plus one join.

    Scale shape: the 10^12-row base is NEVER rescanned — cost is
    O(|delta| + |view|).  Both the delta aggregate and the merge shuffle
    on the group keys, so AQE plans them on one exchange pair; the view
    side is usually small enough to broadcast.  AVG/derived measures are
    reconstructed downstream as sum/count.
    """
    keys = list(keys)
    sign = F.when(F.col(op_col) == OP_DELETE_ROW, F.lit(-1)).otherwise(F.lit(1))
    d = delta.withColumn("_sign", sign)
    dagg = d.groupBy(*keys).agg(
        F.sum("_sign").alias(f"_d_{count_col}"),
        *[
            F.sum(F.col(c) * F.col("_sign")).alias(f"_d_{c}")
            for c in sum_cols
        ],
    )
    merged = base_agg.join(dagg, keys, "full_outer")
    zero = F.lit(0)
    new_count = F.coalesce(F.col(count_col), zero) + F.coalesce(
        F.col(f"_d_{count_col}"), zero
    )
    out = merged.select(
        *keys,
        new_count.alias(count_col),
        *[
            # integer zero literal: coalesce keeps the measure's own type
            # (decimal sums stay decimal-exact, doubles stay double)
            (
                F.coalesce(F.col(c), F.lit(0))
                + F.coalesce(F.col(f"_d_{c}"), F.lit(0))
            ).alias(c)
            for c in sum_cols
        ],
    )
    return out.filter(F.col(count_col) > 0)


#: change-operation values understood by incremental_agg deltas
OP_INSERT_ROW = "insert"
OP_DELETE_ROW = "delete"


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: Sequence[str],
) -> DataFrame:
    """Snapshot diff: classify every key across two table versions as
    ``added`` / ``removed`` / ``changed`` / ``unchanged`` and name the
    columns that differ.

    One full-outer join on ``key``; change detection is a null-safe
    column-wise comparison (so NULL→value and value→NULL both count as
    changes), and ``changed_cols`` lists the differing column names in
    declaration order.  This is the audit primitive behind snapshot
    reconciliation (Iceberg ``snapshot_id`` A vs B), CDC validation and
    replication drift checks.

    Scale shape: one shuffle per side on ``key`` (or zero against a
    bucketed table — io/tables.py write_bucketed); everything after the
    join is projection.  At 10^12 rows the join IS the diff's lower
    bound; no second pass, no driver-side state.
    """
    # presence flags must not depend on value NULLs: track them explicitly
    o = old.select(
        F.col(key),
        F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
    )
    n = new.select(
        F.col(key),
        F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
    )
    j = o.join(n, key, "full_outer")
    diff_names = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")), F.lit(c)
                )
                for c in compare_cols
            ]
        )
    )
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.size("changed_cols") > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.withColumn("changed_cols", diff_names)
        .withColumn("status", status)
        .select(
            key,
            "status",
            F.when(
                F.col("status") == "changed", F.col("changed_cols")
            ).otherwise(F.array().cast("array<string>")).alias("changed_cols"),
        )
    )
