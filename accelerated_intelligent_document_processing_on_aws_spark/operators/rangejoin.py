"""Range joins: point-in-interval and interval-overlap, bucketized.

Spark's optimizer plans a raw range predicate (``p BETWEEN s AND e`` or
``a.s <= b.e AND b.s <= a.e``) as a nested-loop join — per key that is
O(|points| x |intervals|) compared pairs, the same all-pairs shape the
brief bans for near-dup search.  The scale-safe composition (the brief's
"custom operators" bullet names range join explicitly) is BINNING:

* chop the value axis into fixed-width bins;
* an interval registers in every bin it touches (``sequence`` + explode —
  bounded by ``interval_len / bin_width`` rows, choose ``bin_width`` near
  the typical interval length);
* a point lives in exactly one bin;
* candidates meet on an EQUI-join on (keys..., bin) — shuffled, AQE-,
  broadcast- and skew-eligible like any other equi-join — and the exact
  range predicate re-checks each candidate.

Dedup is FREE by construction:

* point-in-interval: the point's single bin is covered at most once by
  each matching interval → every true match surfaces exactly once;
* interval-overlap: a pair may share many bins, so each candidate is
  kept only in the ATTRIBUTION bin — the bin of ``greatest(a.s, b.s)``,
  which lies inside both intervals whenever they overlap → exactly one
  surviving occurrence, no ``dropDuplicates`` exchange.

Reference parity: the reference has no range join (single-document
Lambdas never join streams); this generalizes its page-window lookups
(SURVEY §2.4 J-family) the way ``operators/asof.py`` generalizes the
"latest config as of ts" lookup.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _axis(df: DataFrame, col: str) -> Column:
    """Order axis as double: timestamps/dates become fractional epoch
    seconds, numerics pass through — one code path for both.  TIMESTAMP_NTZ
    (what parquet scans produce) has no direct double cast; routing it
    through timestamp_ltz is monotone and session-consistent, which is all
    binning and comparisons need."""
    c = F.col(col)
    dt = df.schema[col].dataType
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return c.cast("timestamp_ltz").cast("double")
    return c.cast("double")


def _bin_of(c: Column, width: float) -> Column:
    return F.floor(c / F.lit(float(width))).cast("long")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: List[str],
    point_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bin_width: float = 3600.0,
    how: str = "inner",
) -> DataFrame:
    """Each point row joined to every interval row (same ``on`` keys) with
    ``start <= point <= end`` (inclusive both ends).

    Output = all point columns + all non-key interval columns.  ``how`` may
    be ``"inner"`` or ``"left"`` (unmatched points kept with null interval
    columns).  Intervals with ``end < start`` match nothing.  ``bin_width``
    is in axis units (seconds for timestamps); per-interval fan-out is
    ``~len/bin_width`` rows, so pick it near the typical interval length.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    ivl_cols = [c for c in intervals.columns if c not in on]
    i = (
        intervals.withColumn("_ax_s", _axis(intervals, start_col))
        .withColumn("_ax_e", _axis(intervals, end_col))
        .filter(F.col("_ax_e") >= F.col("_ax_s"))
        .withColumn(
            "_bin",
            F.explode(
                F.sequence(
                    _bin_of(F.col("_ax_s"), bin_width),
                    _bin_of(F.col("_ax_e"), bin_width),
                )
            ),
        )
    )
    p = points.withColumn("_ax_p", _axis(points, point_col)).withColumn(
        "_bin", _bin_of(F.col("_ax_p"), bin_width)
    )
    matched = (
        p.join(i, on + ["_bin"])
        .filter(
            (F.col("_ax_p") >= F.col("_ax_s"))
            & (F.col("_ax_p") <= F.col("_ax_e"))
        )
        .select(*points.columns, *ivl_cols)
    )
    if how == "inner":
        return matched
    # left: anti-join the unmatched points back in with null interval cols
    unmatched = points.join(
        matched.select(*points.columns), points.columns, "left_anti"
    ).select(
        "*", *[F.lit(None).cast(intervals.schema[c].dataType).alias(c) for c in ivl_cols]
    )
    return matched.unionByName(unmatched)


def interval_overlap_join(
    left: DataFrame,
    right: Optional[DataFrame] = None,
    on: List[str] = (),
    start_col: str = "start",
    end_col: str = "end",
    bin_width: float = 3600.0,
    suffixes: tuple = ("_a", "_b"),
    self_pairs_once: bool = True,
) -> DataFrame:
    """Pairs of intervals (same ``on`` keys) that overlap:
    ``a.start <= b.end AND b.start <= a.end`` (touching endpoints count).

    Self-join when ``right`` is None; ``self_pairs_once`` then keeps each
    unordered pair once (requires monotone row identity — the FIRST
    non-key column is used as the tiebreak id: ``id_a < id_b``).  Non-key
    columns surface with ``suffixes``.  Each overlapping pair is emitted
    exactly once via attribution-bin filtering (no dedup exchange)."""
    on = list(on)
    self_join = right is None
    right = left if self_join else right

    def tagged(df: DataFrame, suf: str) -> DataFrame:
        payload = [c for c in df.columns if c not in on]
        t = df.select(
            *on,
            *[F.col(c).alias(c + suf) for c in payload],
            _axis(df, start_col).alias(f"_ax_s{suf}"),
            _axis(df, end_col).alias(f"_ax_e{suf}"),
        ).filter(F.col(f"_ax_e{suf}") >= F.col(f"_ax_s{suf}"))
        return t.withColumn(
            f"_bin{suf}",
            F.explode(
                F.sequence(
                    _bin_of(F.col(f"_ax_s{suf}"), bin_width),
                    _bin_of(F.col(f"_ax_e{suf}"), bin_width),
                )
            ),
        )

    sa, sb = suffixes
    a = tagged(left, sa)
    b = tagged(right, sb)
    cond = [F.col(f"_bin{sa}") == F.col(f"_bin{sb}")] + [
        a[k] == b[k] for k in on
    ]
    pair = a.join(b, cond).drop(f"_bin{sb}")
    if self_join and self_pairs_once:
        id_col = next(c for c in left.columns if c not in on)
        pair = pair.filter(F.col(id_col + sa) < F.col(id_col + sb))
    # overlap re-check + attribution bin: keep the candidate only in the
    # bin of greatest(start_a, start_b) — inside both intervals whenever
    # they overlap, so each true pair survives exactly once
    attr_bin = _bin_of(
        F.greatest(F.col(f"_ax_s{sa}"), F.col(f"_ax_s{sb}")), bin_width
    )
    out_keys = [a[k].alias(k) for k in on]
    internal = {f"_bin{sa}", f"_ax_s{sa}", f"_ax_e{sa}", f"_ax_s{sb}", f"_ax_e{sb}"}
    return (
        pair.filter(
            (F.col(f"_ax_s{sa}") <= F.col(f"_ax_e{sb}"))
            & (F.col(f"_ax_s{sb}") <= F.col(f"_ax_e{sa}"))
            & (F.col(f"_bin{sa}") == attr_bin)
        )
        .select(
            *out_keys,
            *[
                F.col(c)
                for c in pair.columns
                if c not in on and c not in internal
            ],
        )
    )
