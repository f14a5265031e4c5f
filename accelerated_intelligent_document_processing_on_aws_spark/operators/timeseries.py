"""Calendar-aware rolling aggregates over event-time series.

The registry's anomaly query (q_anomaly_days) uses a ROWS frame — the
last 7 *observed* days, which silently stretches across calendar gaps.
This module is the RANGE twin: frames are anchored on the epoch-day
integer, so a day with no events genuinely ages out of the window and
the per-calendar-day average treats missing days as zero — the
correct semantics for rate dashboards, quota burn-down, and
week-over-week deltas.

Scale shape: ONE corpus-sized aggregate (groupBy keys+day, map-side
combine) collapses events to the daily series; every window after that
runs over days-per-key rows on a single keys-partitioned exchange.
Nothing corpus-sized crosses a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_daily_metrics(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    window_days: int = 7,
    round_to: int = 6,
) -> DataFrame:
    """Daily event counts per group with a trailing ``window_days``
    CALENDAR-day rolling sum/avg and the same-weekday-last-week delta.

    Columns: ``*key_cols, day, n, rolling_sum, rolling_days,
    rolling_avg, prev_week_n, wow_delta`` where
    - ``rolling_sum``: events in the trailing ``window_days`` calendar
      days (inclusive of ``day``) — gap days age out exactly;
    - ``rolling_days``: observed days inside that frame (≤ window_days);
    - ``rolling_avg``: rolling_sum / window_days — per CALENDAR day, so
      missing days count as zero activity (a ROWS frame can't say this);
    - ``prev_week_n`` / ``wow_delta``: count exactly 7 calendar days ago
      (NULL if that day had no events) and ``n - prev_week_n``.

    Plan: one aggregate to the daily series, then one exchange on the
    keys; both RANGE frames and the point lookup share that window
    partitioning (no further shuffle).  The RANGE frame is on the
    epoch-day integer — engine-portable and timezone-free.
    """
    daily = df.groupBy(
        *key_cols, F.date_format(F.col(ts_col), "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    daily = daily.withColumn(
        "_dnum", F.datediff(F.to_date("day"), F.lit("1970-01-01"))
    )
    w_roll = (
        Window.partitionBy(*key_cols)
        .orderBy("_dnum")
        .rangeBetween(-(window_days - 1), 0)
    )
    w_prev = (
        Window.partitionBy(*key_cols).orderBy("_dnum").rangeBetween(-7, -7)
    )
    out = daily.select(
        *key_cols,
        "day",
        "n",
        F.sum("n").over(w_roll).alias("rolling_sum"),
        F.count(F.lit(1)).over(w_roll).alias("rolling_days"),
        F.round(
            F.sum("n").over(w_roll).cast("double")
            / F.lit(float(window_days)),
            round_to,
        ).alias("rolling_avg"),
        F.max("n").over(w_prev).alias("prev_week_n"),
        (F.col("n") - F.max("n").over(w_prev)).alias("wow_delta"),
    )
    return out
