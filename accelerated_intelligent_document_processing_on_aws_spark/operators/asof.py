"""As-of join: for each left row, the latest right row with
``right.ts <= left.ts`` per key — the canonical time-series lookup Spark
has no native operator for (brief §custom operators).

Spark-first composition (no per-row Python, no theta join):

    union(left+tag, right+tag)
      → window last_value(right payload, ignoreNulls) over
        (key ORDER BY ts, tag ROWS UNBOUNDED PRECEDING..CURRENT)
      → filter tag = left

One shuffle on the key, linear scan per partition — versus the naive
``left JOIN right ON key AND r.ts <= l.ts`` + max() which explodes to
O(|L|x|R|) pairs per key.  Ties (equal ts) resolve to the right row
(tag orders right rows before left at the same instant), matching DuckDB
ASOF JOIN (>=) semantics used as the oracle.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: List[str],
    ts_col: str = "ts",
    right_cols: Optional[List[str]] = None,
    suffix: str = "_asof",
    tiebreak: Optional[str] = None,
) -> DataFrame:
    """Left as-of join: every left row + the most recent right values.

    ``right_cols`` defaults to all non-key, non-ts right columns; matched
    values arrive as ``<col><suffix>`` (null when no right row precedes).

    ``tiebreak``: explicit right column deciding which of several right
    rows sharing (key, ts) wins (the greatest value).  When omitted, the
    deterministic default orders by the tuple of the ORDERABLE (atomic)
    payload fields in ``right_cols`` order — map/array/struct fields are
    excluded, so payloads with unorderable columns no longer raise
    AnalysisException (round-2 ADVICE), and the resolution rule is
    documented: it follows ``right_cols`` order over orderable fields
    only, affecting only genuinely duplicate (key, ts) right rows."""
    right_cols = right_cols or [
        c for c in right.columns if c not in on and c != ts_col
    ]
    if tiebreak is not None:
        tb_fields = [tiebreak]
    else:
        tb_fields = [
            c
            for c in right_cols
            if isinstance(right.schema[c].dataType, T.AtomicType)
        ]
    tb_struct = (
        F.struct(*[F.col(c) for c in tb_fields]) if tb_fields else F.lit(0)
    )
    # The matched right row travels as ONE struct (like _lrow), so
    # last(ignorenulls) picks a whole row atomically: a legitimately-NULL
    # field in the matched row stays NULL instead of being back-filled from
    # an older right row, and all matched columns come from the same row —
    # matching DuckDB ASOF (>=) semantics used as the oracle.
    r_tagged = right.select(
        *on,
        F.col(ts_col),
        F.lit(0).alias("_side"),
        tb_struct.alias("_tb"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_rrow"),
    )
    l_tagged = left.select(
        *on,
        F.col(ts_col),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_tagged.schema["_tb"].dataType).alias("_tb"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(r_tagged.schema["_rrow"].dataType).alias("_rrow"),
    )
    r_tagged = r_tagged.withColumn(
        "_lrow", F.lit(None).cast(l_tagged.schema["_lrow"].dataType)
    )
    merged = l_tagged.unionByName(r_tagged)
    # deterministic tiebreak among right rows sharing (key, ts): the
    # greatest explicit/orderable-field tuple wins regardless of partition
    # order (right (key, ts) need not be unique for runs to reproduce);
    # _tb is NULL on left rows, which sort within their own _side group.
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_col, "_side", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = merged.withColumn(
        "_r", F.last("_rrow", ignorenulls=True).over(w)
    ).filter(F.col("_side") == 1)
    return out.select(
        F.col("_lrow.*"),
        *[F.col("_r")[c].alias(f"{c}{suffix}") for c in right_cols],
    )
