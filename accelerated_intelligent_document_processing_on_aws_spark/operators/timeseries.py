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


def cusum_days(
    df: DataFrame,
    ts_col: str,
    drift_k: float = 0.5,
    threshold_h: float = 4.0,
    round_to: int = 6,
) -> DataFrame:
    """Page's one-sided CUSUM change detector over the daily event-count
    series: the sequential-audit answer to "when did the level SHIFT?"
    (the z-score query flags single outlier days; CUSUM accumulates
    small persistent drifts a per-day test never trips on).

    Classic recursion ``S_t = max(0, S_{t-1} + z_t − k)`` rewritten as
    PREFIX algebra so one window computes it: with ``C_t = Σ(z_i − k)``,
    ``S_t = C_t − min_{s≤t} C_s`` — a cumulative sum plus a running min,
    both on the same day-ordered window.  ``z_t`` standardizes the daily
    count by the series' own mean/std, computed from exact integer sums
    (Σn, Σn² as int64) so both engines standardize with identical IEEE
    doubles; the window evaluates left-to-right in day order, so even
    the float accumulation order is pinned.

    Columns: ``day, n, z, cusum_pos, is_change`` (cusum_pos > h flags a
    sustained upward shift; the mirrored detector is the same call on
    negated z — deliberately not bundled to keep the certified algebra
    one-sided).

    Plan: ONE corpus aggregate to the daily series (map-side combine);
    the moment sums ride an unpartitioned window over the DAYS-sized
    frame (no join in the plan at all — single-partition is fine
    because the frame is days-cardinality, never corpus-cardinality);
    the cumulative window shares that one exchange.
    """
    daily = df.groupBy(
        F.date_format(F.col(ts_col), "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    d = daily.select(
        "day",
        "n",
        F.count(F.lit(1)).over(w_all).alias("_nd"),
        F.sum("n").over(w_all).alias("_s1"),
        F.sum(F.col("n") * F.col("n")).over(w_all).alias("_s2"),
    )
    nd = F.col("_nd").cast("double")
    mean = F.col("_s1").cast("double") / nd
    var = (
        F.col("_s2").cast("double")
        - F.col("_s1").cast("double") * F.col("_s1").cast("double") / nd
    ) / (nd - F.lit(1.0))
    z = (F.col("n").cast("double") - mean) / F.sqrt(var)
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    with_c = d.select(
        "day",
        "n",
        z.alias("_z"),
        F.sum(z - F.lit(float(drift_k))).over(w).alias("_c"),
    )
    cusum = F.col("_c") - F.least(
        F.min("_c").over(
            Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
        ),
        F.lit(0.0),
    )
    return with_c.select(
        "day",
        "n",
        F.round("_z", round_to).alias("z"),
        F.round(cusum, round_to).alias("cusum_pos"),
        (cusum > F.lit(float(threshold_h))).alias("is_change"),
    )


def acf_daily(
    df: DataFrame,
    ts_col: str,
    max_lag: int = 7,
    round_to: int = 6,
) -> DataFrame:
    """Lag-k autocorrelation of the daily event-count series for
    k = 1..max_lag — the seasonality fingerprint (a weekly cycle shows
    as a lag-7 spike) that decides whether the anomaly detector needs a
    seasonal baseline or a flat one.

    Per lag, Pearson r over the (n−k) day pairs ALIGNED ON CALENDAR
    days (day t with day t−k; gap days produce no pair rather than a
    misaligned one).  All five sufficient statistics (Σx, Σy, Σxy, Σx²,
    Σy²) are exact int64 sums, so ``r = (mΣxy − ΣxΣy) /
    √((mΣx²−(Σx)²)(mΣy²−(Σy)²))`` is an identical IEEE expression in
    both engines.

    Columns: ``lag, n_pairs, r`` (r NULL when either side is constant).

    Plan: one aggregate to the daily series, one explode to (day, lag)
    — days×max_lag rows — and ONE self-equi-join on the shifted
    epoch-day key; the per-lag aggregate is max_lag rows.  Nothing
    corpus-sized survives the first aggregate.
    """
    daily = (
        df.groupBy(
            F.date_format(F.col(ts_col), "yyyy-MM-dd").alias("day")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "_d", F.datediff(F.to_date("day"), F.lit("1970-01-01"))
        )
        .localCheckpoint(eager=False)
    )
    lags = daily.select(
        "_d",
        F.col("n").alias("x"),
        F.explode(
            F.sequence(F.lit(1), F.lit(int(max_lag)))
        ).alias("lag"),
    )
    pairs = lags.join(
        daily.select(F.col("_d").alias("_dy"), F.col("n").alias("y")),
        lags["_d"] - lags["lag"] == F.col("_dy"),
    )
    agg = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("x").alias("_sx"),
        F.sum("y").alias("_sy"),
        F.sum(F.col("x") * F.col("y")).alias("_sxy"),
        F.sum(F.col("x") * F.col("x")).alias("_sxx"),
        F.sum(F.col("y") * F.col("y")).alias("_syy"),
    )
    m = F.col("n_pairs").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    cov = m * F.col("_sxy").cast("double") - sx * sy
    vx = m * F.col("_sxx").cast("double") - sx * sx
    vy = m * F.col("_syy").cast("double") - sy * sy
    return agg.select(
        "lag",
        "n_pairs",
        F.round(
            F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy)), round_to
        ).alias("r"),
    )


def seasonal_decompose_daily(
    df: DataFrame,
    group_col: str,
    ts_col: str = "ts",
    period: int = 7,
    round_to: int = 6,
) -> DataFrame:
    """Classical additive seasonal decomposition of per-group DAILY
    VOLUME: ``y = trend + seasonal + remainder`` — the moving-average
    STL-lite that answers "is traffic actually growing, or is that just
    the weekly cycle?" before any anomaly rule fires.

    - ``trend``: centered ``period``-point moving average over the
      group's observed-day sequence (NULL unless the full window of
      ``period`` rows exists — edges carry no trend);
    - ``seasonal``: mean detrended value per (group, day-of-period),
      with day-of-period = ``(epoch_day + 3) % period`` so period=7
      indexes weekdays identically in any engine (no locale-dependent
      DAYOFWEEK);
    - ``remainder``: what neither explains — the anomaly signal.

    Precision: y is an exact int64 count, the trend is one exact-int
    sum divided by ``period`` (identical IEEE op in any engine), and the
    seasonal means aggregate O(weeks) small doubles — portable at 6 dp.

    Plan: one corpus aggregate to (group, day) — map-side combine —
    then two windows over the SAME group partitioning (one exchange of
    the days-sized frame) and one (group, dow)-keyed window.  Nothing
    after the first aggregate exceeds group-cardinality × days rows.

    Columns: ``group, day, y, trend, seasonal, remainder``.
    """
    half = int(period) // 2
    daily = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(
            F.col(group_col).alias("group"),
            F.datediff(F.to_date(ts_col), F.lit("1970-01-01"))
            .cast("long")
            .alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("y"))
    )
    w = (
        Window.partitionBy("group")
        .orderBy("day")
        .rowsBetween(-half, half)
    )
    t = daily.withColumn(
        "trend",
        F.when(
            F.count(F.lit(1)).over(w) == int(period),
            F.sum("y").over(w).cast("double") / F.lit(float(period)),
        ),
    ).withColumn("_det", F.col("y").cast("double") - F.col("trend"))
    dow = (F.col("day") + F.lit(3)) % F.lit(int(period))
    s = t.withColumn(
        "seasonal", F.avg("_det").over(Window.partitionBy("group", dow))
    )
    return s.select(
        "group",
        "day",
        "y",
        F.round("trend", round_to).alias("trend"),
        F.round("seasonal", round_to).alias("seasonal"),
        F.round(F.col("_det") - F.col("seasonal"), round_to).alias(
            "remainder"
        ),
    )


def time_weighted_mean(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_tiebreak: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Per-key time-weighted average: each observation's value holds until
    the next observation (step interpolation — the metering/billing
    convention), so the mean weights every value by how long it was in
    effect: ``Σ v_i·Δt_i / Σ Δt_i`` over consecutive-pair intervals.
    The last observation per key has no duration and contributes nothing
    (a step function needs an end).  Keys with a single observation have
    no intervals and emit NULL.

    Why not a plain AVG: irregular sampling over-weights bursts — a
    minute of 100 req/s sampled every second would swamp an hour of
    1 req/s sampled hourly.

    Columns: ``key, n_intervals, total_us, tw_mean``.

    Scale shape: ONE key-ordered window (lead), one aggregate — the
    q_event_transitions lead() discipline; no self-join.  Weights are
    integer epoch-MICROsecond deltas (``unix_micros`` — lossless for
    sub-second timestamps; DuckDB twin ``epoch_us``), so Σ v·Δt
    accumulates exact-integer-weighted products and the weight unit
    cancels in the final rounded division."""
    w = Window.partitionBy(key_col).orderBy(
        *(
            [ts_col, order_tiebreak]
            if order_tiebreak
            else [ts_col]
        )
    )
    # cast covers TIMESTAMP_NTZ inputs (unix_micros wants TIMESTAMP);
    # any session-timezone offset is constant and cancels in the deltas
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    pairs = df.select(
        F.col(key_col).alias("key"),
        F.col(value_col).cast("double").alias("v"),
        (F.lead(us).over(w) - us).alias("dt"),
    ).filter(F.col("dt").isNotNull())
    return pairs.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("dt").cast("long").alias("total_us"),
        F.round(
            F.sum(F.col("v") * F.col("dt")) / F.sum("dt"), round_to
        ).alias("tw_mean"),
    )


def ewma_days(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str | None = None,
    window_days: int = 16,
    round_to: int = 6,
) -> DataFrame:
    """Exponentially-weighted moving average of the daily series with
    halflife = 1 day (alpha = 1/2), truncated at ``window_days`` lags —
    the trend smoother whose weights ``2^-k`` are EXACT dyadic rationals:
    every product ``count * 2^-k`` and their bounded sum are exact in
    float64, so the smoothed numerator/denominator are engine-portable
    with no rounding until the final division (a generic alpha's
    ``(1-a)^k`` powers would drift across engines).

    Per (key, day): ``ewma = Σ_k x_{t-k} 2^-k / Σ_k 2^-k`` over the lags
    that exist (series start uses fewer terms — the standard adjusted
    EWMA).  Columns: ``key, day, n, ewma``.

    Scale shape: one (key, day) count aggregate (metadata-sized), then
    ``window_days`` lag() terms under ONE key-ordered window — no
    self-join, no state beyond the frame."""
    # day as a yyyy-MM-dd string (the rolling_daily_metrics convention:
    # ISO strings sort correctly and avoid date-dtype drift in oracles)
    day = F.date_format(F.col(ts_col), "yyyy-MM-dd").alias("day")
    base = (
        df.groupBy(F.col(key_col).alias("key"), day)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("key").orderBy("day")
    num = F.lit(0.0)
    den = F.lit(0.0)
    for k in range(window_days):
        wk = F.lit(float(2.0 ** -k))
        x = F.lag(F.col("n"), k).over(w)
        num = num + F.coalesce(x.cast("double") * wk, F.lit(0.0))
        den = den + F.when(x.isNotNull(), wk).otherwise(F.lit(0.0))
    return base.select(
        "key", "day", "n", F.round(num / den, round_to).alias("ewma")
    )


def theil_sen_daily(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Theil-Sen robust trend estimate of the daily event-count series per
    key: the MEDIAN of all pairwise slopes ``(n_j - n_i)/(d_j - d_i)`` —
    the outlier-proof companion to the OLS trend fit (one corrupted day
    moves OLS arbitrarily; Theil-Sen tolerates ~29% corruption).

    Columns: ``key, n_days, n_pairs, slope`` (slope rounded; NULL for
    single-day series).

    Portability: slopes are integer-difference ratios (exact IEEE
    divisions), and the median of an ODD pair count is an element of
    that set — identical in both engines; even counts average the two
    middle elements (one addition + one halving — exact in f64 halving,
    the addition is the only rounding site, absorbed by ``round_to``).

    Scale shape: the corpus collapses to the daily series first (map-side
    combine); the pairwise join runs on days-per-key-sized frames (d²
    pairs of DAYS, never events), one key-partitioned median aggregate."""
    daily = (
        df.groupBy(
            F.col(key_col).alias("key"),
            F.date_format(F.col(ts_col), "yyyy-MM-dd").alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("d", F.datediff(F.to_date("day"), F.lit("1970-01-01")))
        .localCheckpoint(eager=False)
    )
    a = daily.select("key", F.col("d").alias("da"), F.col("n").alias("na"))
    b = daily.select("key", F.col("d").alias("db"), F.col("n").alias("nb"))
    pairs = (
        a.join(b, "key")
        .filter(F.col("da") < F.col("db"))
        .select(
            "key",
            (
                (F.col("nb") - F.col("na")).cast("double")
                / (F.col("db") - F.col("da")).cast("double")
            ).alias("slope"),
        )
    )
    slopes = pairs.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.median("slope"), round_to).alias("slope"),
    )
    n_days = daily.groupBy("key").agg(F.count(F.lit(1)).alias("n_days"))
    return n_days.join(slopes, "key", "left").select(
        "key", "n_days", F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"), "slope"
    )


def mann_kendall_daily(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Mann-Kendall trend TEST of the daily event-count series per key
    (Mann 1945, Kendall 1975) — the significance companion to
    ``theil_sen_daily``: Theil-Sen says how steep the trend is, MK says
    whether a monotone trend exists at all, distribution-free.

    ``S = sum over day pairs i<j of sign(n_j - n_i)``; the normal
    approximation uses the tie-corrected variance
    ``Var(S) = [d(d-1)(2d+5) - sum_t t(t-1)(2t+5)] / 18`` over
    tie-groups ``t`` of equal counts, with the standard continuity
    correction ``z = (S -/+ 1)/sqrt(Var)``.  p is the two-sided A&S
    7.1.26 normal tail (the repo's documented closed form, evaluated
    from the ALREADY-ROUNDED z so both engines compare identical
    doubles — the q_fdr_correction discipline).

    Columns: ``key, n_days, s_stat, var_s, z, p, trend`` where trend is
    'increasing' / 'decreasing' / 'none' at p <= 0.05 on the rounded p.

    Portability: S and Var(S) are pure BIGINT arithmetic until the one
    division; z rounds at ``round_to`` before the tail evaluates.

    Scale shape: identical to theil_sen_daily — the corpus collapses to
    the daily series first (map-side combine), the pair join and the
    tie histogram both run on days-per-key-sized frames (d² pairs of
    DAYS, never events), so key-count × days² bounds every shuffle."""
    from .stats import normal_sf

    daily = (
        df.groupBy(
            F.col(key_col).alias("key"),
            F.date_format(F.col(ts_col), "yyyy-MM-dd").alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("d", F.datediff(F.to_date("day"), F.lit("1970-01-01")))
        .localCheckpoint(eager=False)
    )
    a = daily.select("key", F.col("d").alias("da"), F.col("n").alias("na"))
    b = daily.select("key", F.col("d").alias("db"), F.col("n").alias("nb"))
    s = (
        a.join(b, "key")
        .filter(F.col("da") < F.col("db"))
        .groupBy("key")
        .agg(
            F.sum(
                F.signum((F.col("nb") - F.col("na")).cast("double")).cast(
                    "long"
                )
            ).alias("s_stat")
        )
    )
    dd = daily.groupBy("key").agg(F.count(F.lit(1)).alias("n_days"))
    ties = (
        daily.groupBy("key", "n")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("key")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term")
        )
    )
    d_ = F.col("n_days").cast("long")
    var_s = (
        d_ * (d_ - 1) * (2 * d_ + 5) - F.col("tie_term")
    ).cast("double") / F.lit(18.0)
    base = (
        dd.join(s, "key", "left")
        .join(ties, "key", "left")
        .select(
            "key",
            "n_days",
            F.coalesce("s_stat", F.lit(0)).alias("s_stat"),
            F.round(var_s, round_to).alias("var_s"),
        )
    )
    z_raw = F.when(F.col("var_s") <= 0, F.lit(None).cast("double")).otherwise(
        F.when(
            F.col("s_stat") > 0,
            (F.col("s_stat") - 1).cast("double") / F.sqrt("var_s"),
        )
        .when(
            F.col("s_stat") < 0,
            (F.col("s_stat") + 1).cast("double") / F.sqrt("var_s"),
        )
        .otherwise(F.lit(0.0))
    )
    zed = base.withColumn("z", F.round(z_raw, round_to))
    # least() skips NULLs in Spark (returns 1.0 for a NULL p), so the
    # degenerate-z guard must come after the cap, not rely on NULL flow
    withp = zed.withColumn(
        "p",
        F.when(
            F.col("z").isNotNull(),
            F.least(
                F.round(
                    F.lit(2.0) * normal_sf(F.abs(F.col("z"))), round_to
                ),
                F.lit(1.0),
            ),
        ),
    )
    return withp.withColumn(
        "trend",
        F.when(
            F.col("p").isNull() | (F.col("p") > 0.05), F.lit("none")
        )
        .when(F.col("s_stat") > 0, F.lit("increasing"))
        .when(F.col("s_stat") < 0, F.lit("decreasing"))
        .otherwise(F.lit("none")),
    )


def ccf_daily(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    key_a: str,
    key_b: str,
    max_lag: int = 7,
    round_to: int = 6,
) -> DataFrame:
    """Lagged cross-correlation between two keys' daily event-count
    series for lag = -max_lag..max_lag — acf_daily's two-series twin:
    does activity in ``key_a`` LEAD activity in ``key_b`` (positive
    lags) or LAG it (negative)?  The causality-screen behind funnel
    ordering and alerting dependencies.

    Per lag L, Pearson r over day pairs aligned on calendar days
    (a at day t with b at day t−L; gap days produce no pair).  The five
    sufficient statistics are exact int64 sums, so r is the identical
    IEEE expression in both engines (the acf_daily discipline).

    Columns: ``lag, n_pairs, r`` (r NULL when either side is constant
    over the paired days).

    Plan: one aggregate to the two daily series, one explode to
    (day, lag) on the a-side — days×(2·max_lag+1) rows — and ONE
    equi-join on the shifted epoch-day key.  Nothing corpus-sized
    survives the first aggregate."""
    daily = (
        df.filter(F.col(key_col).isin([key_a, key_b]))
        .groupBy(
            F.col(key_col).alias("key"),
            F.date_format(F.col(ts_col), "yyyy-MM-dd").alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "_d", F.datediff(F.to_date("day"), F.lit("1970-01-01"))
        )
        .localCheckpoint(eager=False)
    )
    a = daily.filter(F.col("key") == key_a).select(
        "_d", F.col("n").alias("x")
    )
    b = daily.filter(F.col("key") == key_b).select(
        F.col("_d").alias("_dy"), F.col("n").alias("y")
    )
    lags = a.select(
        "_d",
        "x",
        F.explode(
            F.sequence(F.lit(-int(max_lag)), F.lit(int(max_lag)))
        ).alias("lag"),
    )
    # r(L) = corr(a_t, b_{t+L}): a LEADING b surfaces at positive L
    pairs = lags.join(b, lags["_d"] + lags["lag"] == F.col("_dy"))
    agg = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("x").alias("_sx"),
        F.sum("y").alias("_sy"),
        F.sum(F.col("x") * F.col("y")).alias("_sxy"),
        F.sum(F.col("x") * F.col("x")).alias("_sxx"),
        F.sum(F.col("y") * F.col("y")).alias("_syy"),
    )
    m = F.col("n_pairs").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    cov = m * F.col("_sxy").cast("double") - sx * sy
    vx = m * F.col("_sxx").cast("double") - sx * sx
    vy = m * F.col("_syy").cast("double") - sy * sy
    return agg.select(
        "lag",
        "n_pairs",
        F.round(
            F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy)), round_to
        ).alias("r"),
    )


def changepoint_daily(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Best single changepoint in each group's daily-count series by
    exact least-squares segmentation (the one-split special case of
    binary segmentation / Scruton-Page): split the ordered series
    v_1..v_n after position i to maximize the SSE reduction

        gain(i) = s_i²/i + (S-s_i)²/(n-i) − S²/n

    (s_i = prefix sum; identical to the two-segment ANOVA between-group
    sum of squares).  The day-resolution answer to "WHEN did this feed
    change?", sharper than CUSUM's drift alarm (cusum_days flags that a
    shift happened; this pins the boundary and sizes the level jump).

    Columns: ``*key_cols, n_days, split_day (last day of the left
    regime), mean_left, mean_right, gain`` — one row per group (groups
    with <2 observed days are dropped: no split exists).

    Portability: counts, prefix sums and squares stay integral; the
    only floats are the three divisions inside gain and the means,
    rounded once.  Ties on gain break to the earliest day.

    Scale shape: one aggregate to the daily series, one exchange on the
    group key — the prefix window, the total window and the argmax
    window all share that partitioning; output is group-sized."""
    daily = df.groupBy(
        *key_cols, F.date_format(F.col(ts_col), "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w_pre = (
        Window.partitionBy(*key_cols)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*key_cols)
    pre = daily.select(
        *key_cols,
        "day",
        F.row_number()
        .over(Window.partitionBy(*key_cols).orderBy("day"))
        .alias("_i"),
        F.sum("n").over(w_pre).alias("_s"),
        F.sum("n").over(w_all).alias("_tot"),
        F.count(F.lit(1)).over(w_all).alias("_n"),
    )
    cand = pre.filter((F.col("_i") < F.col("_n")) & (F.col("_n") >= 2))
    i = F.col("_i").cast("double")
    s = F.col("_s").cast("double")
    tot = F.col("_tot").cast("double")
    n = F.col("_n").cast("double")
    gain = s * s / i + (tot - s) * (tot - s) / (n - i) - tot * tot / n
    scored = cand.withColumn("_gain", gain)
    w_best = Window.partitionBy(*key_cols).orderBy(
        F.desc("_gain"), F.asc("day")
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w_best))
        .filter(F.col("_rk") == 1)
        .select(
            *key_cols,
            F.col("_n").alias("n_days"),
            F.col("day").alias("split_day"),
            F.round(s / i, round_to).alias("mean_left"),
            F.round((tot - s) / (n - i), round_to).alias("mean_right"),
            F.round(F.col("_gain"), round_to).alias("gain"),
        )
    )


def burstiness_daily(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Dispersion profile of each group's daily-count series: Fano
    factor (population variance / mean — 1 for a Poisson arrival
    process, >1 means clumped crawling/batch replays, <1 means
    rate-limited feeds), the Goh-Barabási burstiness coefficient
    B = (σ−μ)/(σ+μ) ∈ [−1, 1), and peak-to-mean ratio.  The one-line
    triage between "organic traffic" and "a scheduler wrote this" that
    decides whether time-based sampling of a source is safe.

    Columns: ``*key_cols, n_days, total, mean_daily, fano, burstiness,
    peak_to_mean`` — one row per group.

    Portability: daily counts are integers; population variance is
    computed from exact integral Σv and Σv² (var = (nΣv² − (Σv)²)/n²),
    so both engines divide the same integers — floats appear only in
    the final divisions, rounded once.

    Scale shape: one aggregate to the daily series (map-side combined),
    one group-sized aggregate — no windows, no joins."""
    daily = df.groupBy(
        *key_cols, F.date_format(F.col(ts_col), "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    g = daily.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n").alias("total"),
        F.sum(F.col("n") * F.col("n")).alias("_sq"),
        F.max("n").alias("_peak"),
    )
    nd = F.col("n_days").cast("double")
    s = F.col("total").cast("double")
    q = F.col("_sq").cast("double")
    mean = s / nd
    var = (nd * q - s * s) / (nd * nd)
    sd = F.sqrt(var)
    return g.select(
        *key_cols,
        "n_days",
        "total",
        F.round(mean, round_to).alias("mean_daily"),
        F.round(
            F.when(s > 0, var / mean), round_to
        ).alias("fano"),
        F.round(
            F.when((sd + mean) > 0, (sd - mean) / (sd + mean)), round_to
        ).alias("burstiness"),
        F.round(
            F.when(s > 0, F.col("_peak").cast("double") / mean), round_to
        ).alias("peak_to_mean"),
    )


def holt_linear_daily(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    alpha: float = 0.5,
    gamma: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """Holt double-exponential smoothing of the daily event-count series
    per key — level + trend state, the forecaster EWMA cannot be (EWMA
    lags a trending series by a constant; Holt's trend term removes the
    lag).  ``forecast_next`` is the one-step-ahead prediction
    ``level + trend`` the alerting layer compares tomorrow's actual
    against.

        l_t = α·y_t + (1−α)(l_{t−1} + b_{t−1})
        b_t = γ(l_t − l_{t−1}) + (1−γ)·b_{t−1}      (l_1 = y_1, b_1 = 0)

    The recursion is SEQUENTIAL by construction, so engine portability
    comes from fixing the operation ORDER, not from dyadic weights: both
    this implementation and the SQL oracle evaluate the identical IEEE
    expression sequence per step, giving bit-identical state at every t.

    Scale shape: the corpus collapses to the (key, day) count frame in
    one map-side-combined aggregate; the recursion runs per key over
    that metadata-sized series inside ONE applyInPandas (Arrow-batched;
    a group is #days rows, never corpus rows).  Columns: ``key, day, n,
    level, trend, forecast_next``.
    """
    import pandas as pd

    daily = (
        df.groupBy(
            F.col(key_col).alias("key"),
            F.date_format(F.col(ts_col), "yyyy-MM-dd").alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )

    def _holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        lvl, trd = [], []
        l = b = None
        for y in pdf["n"].astype("float64"):
            if l is None:
                l, b = float(y), 0.0
            else:
                l_new = alpha * y + (1.0 - alpha) * (l + b)
                b = gamma * (l_new - l) + (1.0 - gamma) * b
                l = l_new
            lvl.append(l)
            trd.append(b)
        pdf["level"] = lvl
        pdf["trend"] = trd
        pdf["forecast_next"] = [a + c for a, c in zip(lvl, trd)]
        return pdf

    out = daily.groupBy("key").applyInPandas(
        _holt,
        "key string, day string, n long, level double, trend double, "
        "forecast_next double",
    )
    # rounding happens JVM-side: F.round's tie rule (half away from zero)
    # matches SQL ROUND, while Python's round() is banker's — Holt state
    # is dyadic-rational early on and CAN land exactly on a 6-dp tie
    return out.select(
        "key",
        "day",
        "n",
        F.round("level", round_to).alias("level"),
        F.round("trend", round_to).alias("trend"),
        F.round("forecast_next", round_to).alias("forecast_next"),
    )


def mase_daily(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    season: int = 7,
    round_to: int = 6,
) -> DataFrame:
    """Forecast-accuracy scoreboard on the daily series per key: MAE of
    the naive (yesterday) and seasonal-naive (same weekday) forecasts,
    and the Mean Absolute Scaled Error of the naive forecaster —
    ``MASE = MAE_naive / MAE_seasonal-naive`` over the rows where BOTH
    forecasts exist (Hyndman & Koehler 2006; MASE < 1 means the method
    beats the seasonal baseline it is scaled by).  The sanity gate run
    before trusting any fancier forecaster on pipeline-volume series.

    One (key ORDER BY day) window provides both lags; one aggregate per
    key finishes.  Columns: ``key, n_eval, mae_naive, mae_snaive,
    mase_naive`` (NULL mase when the seasonal MAE is 0).
    """
    daily = df.groupBy(
        F.col(key_col).alias("key"),
        F.date_format(F.col(ts_col), "yyyy-MM-dd").alias("day"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("key").orderBy("day")
    lag1 = F.lag("n", 1).over(w)
    lags = F.lag("n", season).over(w)
    scored = daily.select(
        "key",
        F.abs(F.col("n") - lag1).cast("double").alias("e1"),
        F.abs(F.col("n") - lags).cast("double").alias("es"),
    ).filter(F.col("e1").isNotNull() & F.col("es").isNotNull())
    agg = scored.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_eval"),
        F.sum("e1").alias("s1"),
        F.sum("es").alias("ss"),
    )
    ne = F.col("n_eval").cast("double")
    return agg.select(
        "key",
        "n_eval",
        F.round(F.col("s1") / ne, round_to).alias("mae_naive"),
        F.round(F.col("ss") / ne, round_to).alias("mae_snaive"),
        F.round(
            F.when(F.col("ss") > 0, F.col("s1") / F.col("ss")), round_to
        ).alias("mase_naive"),
    )


def rolling_distinct_users(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """Trailing N-day DISTINCT active users per calendar day -- the WAU/
    MAU-style metric a plain rolling window cannot produce (distinct
    does not decompose over a RANGE frame).  The scale-safe trick:
    reduce to distinct (user, day) first, then each activity day COVERS
    the next ``window_days`` report days via a bounded explode, and one
    distinct-aggregate per report day finishes the job -- shuffle volume
    is ``window_days x`` the user-day frame, never the raw events.

    Report days span the days with any activity (a report day with no
    direct activity still counts its trailing window).  Returns
    ``(day, n_users_1d, n_users_7d)`` with ``day`` a DATE.
    """
    ud = (
        df.select(
            F.col(user_col).alias("u"),
            F.datediff(
                F.to_date(F.col(ts_col)), F.lit("1970-01-01").cast("date")
            ).alias("d"),
        )
        .filter(F.col("d").isNotNull())
        .distinct()
    )
    bounds = ud.agg(F.max("d").alias("dmax"))
    covered = (
        ud.withColumn(
            "off", F.explode(F.array(*[F.lit(i) for i in range(int(window_days))]))
        )
        .select("u", (F.col("d") + F.col("off")).alias("rd"))
        .join(F.broadcast(bounds), F.lit(True))
        .filter(F.col("rd") <= F.col("dmax"))
    )
    nd = covered.groupBy("rd").agg(
        F.countDistinct("u").alias("n_users_7d")
    )
    one = ud.groupBy(F.col("d").alias("rd")).agg(
        F.countDistinct("u").alias("n_users_1d")
    )
    return (
        nd.join(one, "rd", "left")
        .select(
            F.expr("date_add(DATE '1970-01-01', CAST(rd AS INT))").alias(
                "day"
            ),
            F.coalesce("n_users_1d", F.lit(0)).alias("n_users_1d"),
            "n_users_7d",
        )
    )


def pacf_daily(
    df: DataFrame,
    ts_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Partial autocorrelation of the daily count series at lags 1-3 by
    the closed-form Durbin-Levinson recursion over :func:`acf_daily`'s
    exact-sum autocorrelations -- the AR-order diagnostic ACF alone
    cannot give (a pure AR(1) has geometric ACF at every lag but PACF
    zero beyond lag 1).

    ``pacf1 = r1``; ``pacf2 = (r2 - r1^2)/(1 - r1^2)``; ``pacf3`` from
    the unrolled level-3 recursion.  ACF values are rounded at
    ``round_to`` BEFORE the recursion so both engines walk the identical
    grid.  Returns one row: ``r1, r2, r3, pacf1, pacf2, pacf3``.

    Plan: everything after acf_daily's (max_lag)-row frame is a pivot
    to one row plus scalar algebra -- no further data passes.
    """
    acf = acf_daily(df, ts_col, max_lag=3, round_to=round_to)
    piv = acf.agg(
        *[
            F.max(F.when(F.col("lag") == k, F.col("r"))).alias(f"r{k}")
            for k in (1, 2, 3)
        ]
    )
    lvl2 = piv.select(
        "*",
        F.expr("(r2 - r1 * r1) / (1.0 - r1 * r1)").alias("_p22"),
    ).select(
        "*",
        F.expr("r1 * (1.0 - _p22)").alias("_p21"),
    )
    return lvl2.select(
        "r1",
        "r2",
        "r3",
        F.round(F.col("r1"), round_to).alias("pacf1"),
        F.round(F.col("_p22"), round_to).alias("pacf2"),
        F.round(
            F.expr(
                "(r3 - (_p21 * r2 + _p22 * r1))"
                " / (1.0 - (_p21 * r1 + _p22 * r2))"
            ),
            round_to,
        ).alias("pacf3"),
    )


def hour_week_profile(
    df: DataFrame,
    ts_col: str = "ts",
    z_thresh: float = 2.0,
    round_to: int = 6,
) -> DataFrame:
    """Hour-of-week activity profile: counts over the 168 (ISO weekday,
    hour) cells with a z-score against the profile's own mean/sd and a
    peak flag -- the seasonality heatmap behind load shaping and
    "why is Tuesday 9am always hot" questions.  ISO weekday (1=Monday)
    so both engines agree on the week's origin.

    Returns ``(dow, hour, n, z, peak)``, one row per populated cell.
    Plan: one aggregate to the <=168-cell frame; mean/sd ride a window
    over that frame (exact integer sums -> identical IEEE z).
    """
    cells = df.filter(F.col(ts_col).isNotNull()).groupBy(
        F.expr(f"weekday({ts_col}) + 1").alias("dow"),
        F.hour(ts_col).alias("hour"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy()
    scored = cells.select(
        "dow",
        "hour",
        "n",
        F.count(F.lit(1)).over(w).alias("_k"),
        F.sum("n").over(w).alias("_s"),
        F.sum(F.expr("n * n")).over(w).alias("_ss"),
    )
    mean = F.col("_s") / F.col("_k").cast("double")
    var = F.col("_ss") / F.col("_k").cast("double") - mean * mean
    z = (F.col("n") - mean) / F.sqrt(var)
    return scored.select(
        "dow",
        "hour",
        "n",
        F.round(z, round_to).alias("z"),
        (F.round(z, round_to) > float(z_thresh)).alias("peak"),
    )


def seasonal_strength(decomposed: DataFrame, round_to: int = 6) -> DataFrame:
    """Seasonality strength per group from a
    :func:`seasonal_decompose_daily` frame (Hyndman's F_s):
    ``max(0, 1 - var(remainder) / var(seasonal + remainder))`` -- one
    scalar in [0, 1] saying how much of the detrended variance the
    weekly cycle explains, i.e. whether the anomaly baseline NEEDS the
    seasonal correction q_stl_decompose computes.  Edge days without a
    centered trend (null remainder) are excluded.

    Returns ``(group, n_days, strength)``.  ONE aggregate over the
    days-sized decompose frame; explicit moment algebra so both engines
    evaluate the identical expression.
    """
    d = decomposed.filter(
        F.col("remainder").isNotNull() & F.col("seasonal").isNotNull()
    )
    agg = d.groupBy("group").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("remainder").alias("_sr"),
        F.sum(F.expr("remainder * remainder")).alias("_srr"),
        F.sum(F.expr("seasonal + remainder")).alias("_ss"),
        F.sum(
            F.expr("(seasonal + remainder) * (seasonal + remainder)")
        ).alias("_sss"),
    )
    var_r = F.expr("_srr / n_days - (_sr / n_days) * (_sr / n_days)")
    var_sr = F.expr("_sss / n_days - (_ss / n_days) * (_ss / n_days)")
    # a constant detrended series has nothing to explain: strength NULL
    # (guarded identically in the SQL oracle; ANSI mode would throw)
    return agg.select(
        "group",
        "n_days",
        F.round(
            F.when(
                var_sr > 0,
                F.greatest(F.lit(0.0), F.lit(1.0) - var_r / var_sr),
            ),
            round_to,
        ).alias("strength"),
    )


def page_hinkley(
    df: DataFrame,
    time_col: str,
    value_col: str,
    delta: float = 0.0,
    lam: float = 50.0,
    round_to: int = 6,
) -> DataFrame:
    """Page-Hinkley upward-drift detector (Page 1954; the sequential
    CUSUM variant standard in stream-drift monitoring): over a
    time-ordered series, ``m_t = Σ_{s≤t}(x_s − μ_s − δ)`` with μ_s the
    RUNNING mean, and the alarm statistic ``PH_t = m_t − min_{s≤t}
    m_s``; the first t with PH_t > λ flags a sustained upward shift —
    drift that a global mean test dilutes away.  The stream-shaped
    complement to the retrospective q_changepoint least-squares fit.

    Returns ONE row: ``n_points, ph_max, alarm_at`` (alarm_at NULL when
    the statistic never crosses λ).

    Plan: callers pass an already-aggregated series (e.g. daily
    counts), so the three cumulative windows (running mean, running
    sum, running min) ride a metadata-sized frame; the corpus never
    crosses a global window.
    """
    d = df.select(
        F.col(time_col).alias("_t"),
        F.col(value_col).cast("double").alias("_x"),
    ).filter(F.col("_x").isNotNull())
    w = Window.orderBy("_t").rowsBetween(Window.unboundedPreceding, 0)
    staged = d.withColumn("_mu", F.avg("_x").over(w))
    staged = staged.withColumn(
        "_m", F.sum(F.col("_x") - F.col("_mu") - F.lit(float(delta))).over(w)
    )
    staged = staged.withColumn(
        "_ph", F.col("_m") - F.min("_m").over(w)
    )
    a = staged.agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.round(F.max("_ph"), round_to).alias("ph_max"),
        F.min(
            F.when(F.col("_ph") > F.lit(float(lam)), F.col("_t"))
        ).alias("alarm_at"),
    )
    return a


def gumbel_fit(
    df: DataFrame,
    value_col: str,
    return_period: float = 30.0,
    round_to: int = 6,
) -> DataFrame:
    """Gumbel (EV-I) extreme-value fit by method of moments over block
    maxima: ``β = s·√6/π``, ``μ = x̄ − γ·β`` (Euler γ), and the
    T-period return level ``μ − β·ln(−ln(1 − 1/T))`` — the capacity
    question ("what daily peak should we provision for once per
    month?") answered from the distribution of observed maxima rather
    than a raw historical max.

    Callers pass the block-maxima series (e.g. daily peaks — already
    metadata-sized).  Returns ONE row: ``n, mu, beta, return_level``
    (NULL when n < 2 or s = 0).

    Plan: ONE aggregate, closed form after.
    """
    import math

    x = F.col(value_col).cast("double")
    a = df.filter(x.isNotNull()).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).alias("_s"),
        F.sum(x * x).alias("_q"),
    )
    n = F.col("n").cast("double")
    mean = F.col("_s") / n
    var = (F.col("_q") - F.col("_s") * F.col("_s") / n) / (n - F.lit(1.0))
    beta = F.sqrt(var) * F.lit(math.sqrt(6.0) / math.pi)
    gamma = 0.5772156649015329
    mu = mean - F.lit(gamma) * beta
    t = float(return_period)
    level = mu - beta * F.lit(math.log(-math.log(1.0 - 1.0 / t)))
    guard = (F.col("n") > 1) & (var > 0)
    return a.select(
        "n",
        F.round(F.when(guard, mu), round_to).alias("mu"),
        F.round(F.when(guard, beta), round_to).alias("beta"),
        F.round(F.when(guard, level), round_to).alias("return_level"),
    )


def pot_gpd_fit(
    df: DataFrame,
    value_col: str,
    threshold: float,
    round_to: int = 6,
) -> DataFrame:
    """Peaks-over-threshold generalized-Pareto fit by method of moments
    (Hosking & Wallis 1987): excesses ``x − u`` over a high threshold u
    follow GPD(ξ, β) with ``ξ = (1 − m̄²/s²)/2``, ``β = m̄·(m̄²/s² + 1)/2``
    — the tail-shape complement to the block-maxima Gumbel fit
    (:func:`gumbel_fit`): POT uses EVERY exceedance, not one peak per
    block, so it sees the tail with far fewer years of data.  ξ > 0 is
    a heavy (Pareto-like) tail; ξ < 0 a bounded one.

    Returns ONE row: ``n_exceed, threshold, mean_excess, xi, beta``
    (NULL when fewer than 2 exceedances or zero variance).

    Plan: the threshold filter pushes to the scan; ONE moment
    aggregate, closed form after.
    """
    u = float(threshold)
    x = F.col(value_col).cast("double")
    exc = df.filter(x.isNotNull() & (x > u)).select(
        (x - F.lit(u)).alias("_e")
    )
    a = exc.agg(
        F.count(F.lit(1)).cast("long").alias("n_exceed"),
        F.sum("_e").alias("_s"),
        F.sum(F.col("_e") * F.col("_e")).alias("_q"),
    )
    n = F.col("n_exceed").cast("double")
    m = F.col("_s") / n
    var = (F.col("_q") - F.col("_s") * F.col("_s") / n) / (n - F.lit(1.0))
    good = (F.col("n_exceed") > 1) & (var > 0)
    ratio = m * m / var
    xi = (F.lit(1.0) - ratio) / F.lit(2.0)
    beta = m * (ratio + F.lit(1.0)) / F.lit(2.0)
    return a.select(
        "n_exceed",
        F.lit(u).alias("threshold"),
        F.round(F.when(F.col("n_exceed") > 0, m), round_to).alias(
            "mean_excess"
        ),
        F.round(F.when(good, xi), round_to).alias("xi"),
        F.round(F.when(good, beta), round_to).alias("beta"),
    )


def records_test(
    df: DataFrame,
    order_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Record-counting trend test (Foster & Stuart 1954): in an
    exchangeable series the t-th observation is a new maximum with
    probability 1/t, so the expected record count is the harmonic
    number ``H_n`` with variance ``H_n − H_n^(2)`` — observing far more
    records than H_n is trend evidence that needs NO distributional
    assumptions at all (the minimalist companion to Mann-Kendall).

    Returns ONE row: ``n, records, expected, z`` (z NULL when the
    variance is 0, i.e. n < 2).

    Plan: callers pass the (metadata-sized) ordered series; one
    running-max lag window marks records, the harmonic sums ride the
    same row index, ONE aggregate.
    """
    d = df.select(
        F.col(order_col).alias("_t"),
        F.col(value_col).cast("double").alias("_x"),
    ).filter(F.col("_x").isNotNull())
    w = Window.orderBy("_t")
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    staged = d.select(
        F.row_number().over(w).cast("double").alias("_i"),
        F.when(
            F.max("_x").over(wprev).isNull()
            | (F.col("_x") > F.max("_x").over(wprev)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("_rec"),
    )
    a = staged.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_rec").cast("long").alias("records"),
        F.sum(F.lit(1.0) / F.col("_i")).alias("_h1"),
        F.sum(F.lit(1.0) / (F.col("_i") * F.col("_i"))).alias("_h2"),
    )
    var = F.col("_h1") - F.col("_h2")
    return a.select(
        "n",
        "records",
        F.round("_h1", round_to).alias("expected"),
        F.round(
            F.when(
                var > 0,
                (F.col("records").cast("double") - F.col("_h1"))
                / F.sqrt(var),
            ),
            round_to,
        ).alias("z"),
    )


def durbin_watson_trend(
    df: DataFrame,
    time_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Durbin-Watson statistic of the residuals from the OLS linear
    trend (Durbin & Watson 1950): ``DW = Σ(e_t − e_{t−1})²/Σe_t²`` —
    ≈ 2 for independent residuals, → 0 under positive autocorrelation.
    The diagnostic that says whether the trend fit's error bars
    (q_ols_trend) can be believed at all: autocorrelated residuals
    make naive OLS standard errors fictional.

    The trend regresses value on the ROW INDEX of the time order (so
    calendar gaps don't bend the fit; same convention as the
    rows-frame q_anomaly_days).  Returns ONE row: ``n, slope, dw``
    (NULL when n < 3 or zero variance).

    Plan: callers pass the (metadata-sized) series; one rank window,
    ONE moment aggregate + closed-form betas folded back as literals
    via a 1-row broadcast, one lag window, one final aggregate.
    """
    d = df.select(
        F.col(time_col).alias("_t"),
        F.col(value_col).cast("double").alias("_y"),
    ).filter(F.col("_y").isNotNull())
    w = Window.orderBy("_t")
    idx = d.withColumn("_i", F.row_number().over(w).cast("double"))
    m = idx.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_i").alias("sx"),
        F.sum("_y").alias("sy"),
        F.sum(F.col("_i") * F.col("_i")).alias("sxx"),
        F.sum(F.col("_i") * F.col("_y")).alias("sxy"),
    )
    nn = F.col("n").cast("double")
    den = F.col("sxx") - F.col("sx") * F.col("sx") / nn
    b = F.when(den > 0, (F.col("sxy") - F.col("sx") * F.col("sy") / nn) / den)
    a = (F.col("sy") - b * F.col("sx")) / nn
    params = m.select(
        F.col("n").cast("long").alias("_n"),
        F.round(a, 9).alias("_a"),
        F.round(b, 9).alias("_b"),
    )
    # betas rounded to a fixed grid BEFORE residuals (the logistic_platt
    # trajectory discipline) so both engines score the identical line
    staged = idx.crossJoin(F.broadcast(params)).withColumn(
        "_e", F.col("_y") - F.col("_a") - F.col("_b") * F.col("_i")
    )
    w_lag = Window.orderBy("_i")
    fin = staged.withColumn(
        "_de", F.col("_e") - F.lag("_e").over(w_lag)
    ).agg(
        F.max("_n").alias("n"),
        F.max("_b").alias("_slope"),
        F.sum(F.col("_de") * F.col("_de")).alias("_num"),
        F.sum(F.col("_e") * F.col("_e")).alias("_den"),
    )
    return fin.select(
        "n",
        F.round("_slope", round_to).alias("slope"),
        F.round(
            F.when(
                (F.col("n") > 2) & (F.col("_den") > 0),
                F.col("_num") / F.col("_den"),
            ),
            round_to,
        ).alias("dw"),
    )


def hurst_rs(
    df: DataFrame,
    order_col: str,
    value_col: str,
    block_sizes: tuple = (8, 16, 32, 64),
    round_to: int = 6,
) -> DataFrame:
    """Hurst exponent by rescaled-range analysis (Hurst 1951; Mandelbrot
    & Wallis 1969): for each block size m, split the series into
    complete blocks, compute each block's ``R/S`` (range of cumulative
    mean-deviations over the block std), and fit the log-log slope of
    ``⟨R/S⟩`` against m — H ≈ 0.5 is memoryless, H > 0.5 long-range
    persistent (bursty load that clusters across hours), H < 0.5
    anti-persistent.  The long-memory companion to the lag-local ACF.

    Returns ONE row: ``n, h`` plus one ``rs_<m>`` column per block
    size (NULL H when fewer than 2 sizes yield an R/S).

    Plan: ONE Spark job.  The series is cross-tagged with a block-size
    dimension (``explode`` of the literal sizes array), so every
    per-(m, block) R/S statistic comes out of a single
    ``groupBy(_m, _b)`` → ``groupBy(_m)`` aggregate — |sizes| metadata
    rows collected once — instead of one job per block size (round-4
    VERDICT nit #1: the old per-size loop ran ~len(sizes)+1 sequential
    jobs over the same input).  ``n`` rides the same aggregate as
    ``sum(block sizes)`` per m, so no separate count job.  The 4-point
    log-log fit stays closed-form driver-side.
    """
    d = df.select(
        F.col(order_col).alias("_t"),
        F.col(value_col).cast("double").alias("_x"),
    ).filter(F.col("_x").isNotNull())
    w = Window.orderBy("_t")
    idx = d.select("_x", (F.row_number().over(w) - 1).alias("_i"))
    import math

    sizes_arr = F.array(*[F.lit(int(m)) for m in block_sizes])
    tagged = idx.select("_x", "_i", F.explode(sizes_arr).alias("_m"))
    blk = tagged.withColumn("_b", F.floor(F.col("_i") / F.col("_m")))
    wb = Window.partitionBy("_m", "_b")
    wcum = Window.partitionBy("_m", "_b").orderBy("_i")
    staged = (
        blk.withColumn("_n", F.count(F.lit(1)).over(wb))
        .withColumn("_mu", F.avg("_x").over(wb))
        .withColumn(
            "_z",
            F.sum(F.col("_x") - F.col("_mu")).over(
                wcum.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn(
            "_s2",
            F.avg(
                (F.col("_x") - F.col("_mu")) * (F.col("_x") - F.col("_mu"))
            ).over(wb),
        )
    )
    per_b = staged.groupBy("_m", "_b").agg(
        F.max("_n").alias("_nb"),
        # zero-variance blocks carry no R/S (and would divide by zero
        # under ANSI mode on short series); the `ok` filter below drops
        # them, so NULL here is never aggregated
        F.when(
            F.max("_s2") > 0,
            (F.max("_z") - F.min("_z")) / F.sqrt(F.max("_s2")),
        ).alias("_rs"),
        F.max("_s2").alias("_v"),
    )
    ok = (F.col("_nb") == F.col("_m")) & (F.col("_v") > 0)
    per_m = per_b.groupBy("_m").agg(
        F.avg(F.when(ok, F.col("_rs"))).alias("_mean_rs"),
        F.sum(F.when(ok, F.lit(1)).otherwise(F.lit(0))).alias("_k"),
        F.sum("_nb").alias("_n_total"),
    )
    rows = per_m.collect()
    rs_means = {
        int(r["_m"]): float(r["_mean_rs"])
        for r in rows
        if r["_k"] and r["_k"] > 0
    }
    n_total = int(rows[0]["_n_total"]) if rows else 0
    pts = [
        (math.log(m), math.log(v))
        for m, v in rs_means.items()
        if v > 0
    ]
    h = None
    if len(pts) >= 2:
        k = len(pts)
        sx = sum(p[0] for p in pts)
        sy = sum(p[1] for p in pts)
        sxx = sum(p[0] * p[0] for p in pts)
        sxy = sum(p[0] * p[1] for p in pts)
        den = sxx - sx * sx / k
        if den > 0:
            h = (sxy - sx * sy / k) / den
    out = [
        (
            int(n_total),
            round(h, round_to) if h is not None else None,
            *[
                round(rs_means[m], round_to) if m in rs_means else None
                for m in block_sizes
            ],
        )
    ]
    schema = "n long, h double, " + ", ".join(
        f"rs_{m} double" for m in block_sizes
    )
    return df.sparkSession.createDataFrame(out, schema)


def permutation_entropy(
    df: DataFrame,
    order_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Order-3 permutation entropy (Bandt & Pompe 2002): the Shannon
    entropy of the distribution of ORDINAL PATTERNS among consecutive
    value triples, normalized by ln 6 — a complexity measure robust to
    any monotone transform of the values (1 = white noise, → 0 =
    deterministic monotone dynamics).  Ties rank by position (the
    standard ≤ convention), so integer-valued series are well-defined.

    Returns ONE row: ``n_triples, n_patterns, pe`` (NULL when no
    complete triple exists).

    Plan: one lead() window over the (metadata-sized) series, one
    6-bounded pattern count, one aggregate.
    """
    d = df.select(
        F.col(order_col).alias("_t"),
        F.col(value_col).cast("double").alias("_a"),
    ).filter(F.col("_a").isNotNull())
    w = Window.orderBy("_t")
    tri = d.select(
        "_a",
        F.lead("_a", 1).over(w).alias("_b"),
        F.lead("_a", 2).over(w).alias("_c"),
    ).filter(F.col("_b").isNotNull() & F.col("_c").isNotNull())
    ab = (F.col("_a") <= F.col("_b")).cast("int")
    bc = (F.col("_b") <= F.col("_c")).cast("int")
    ac = (F.col("_a") <= F.col("_c")).cast("int")
    pat = ab * F.lit(4) + bc * F.lit(2) + ac
    counts = tri.groupBy(pat.alias("_p")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    wall = Window.partitionBy()
    staged = counts.withColumn(
        "_n", F.sum("_c").over(wall).cast("double")
    )
    import math

    a = staged.agg(
        F.max("_n").cast("long").alias("n_triples"),
        F.count(F.lit(1)).cast("long").alias("n_patterns"),
        F.sum(
            -(F.col("_c").cast("double") / F.col("_n"))
            * F.log(F.col("_c").cast("double") / F.col("_n"))
        ).alias("_h"),
    )
    return a.select(
        "n_triples",
        "n_patterns",
        F.round(F.col("_h") / F.lit(math.log(6.0)), round_to).alias("pe"),
    )


def ljung_box(
    df: DataFrame,
    order_col: str,
    value_col: str,
    max_lag: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Ljung-Box portmanteau test (Ljung & Box 1978): ``Q = n(n+2)·
    Σ_{k≤h} ρ̂_k²/(n−k)`` over the first h autocorrelations — the ONE
    number answering "is this series white noise at all?" before any
    per-lag ACF reading (q_acf shows the lags; Q tests them jointly
    against χ²(h)).

    Returns ONE row: ``n, h, q_stat, rho_1`` (NULL when n ≤ h + 1 or
    zero variance).

    Plan: callers pass the (metadata-sized) series; ONE ordered window
    materializes all h lag columns in a single pass, one aggregate
    closes the form.  Autocovariances use the standard biased-
    denominator convention (÷ the full-sample SS), identically in the
    oracle.
    """
    d = df.select(
        F.col(order_col).alias("_t"),
        F.col(value_col).cast("double").alias("_x"),
    ).filter(F.col("_x").isNotNull())
    w = Window.orderBy("_t")
    wall = Window.partitionBy()
    staged = d.withColumn("_mu", F.avg("_x").over(wall))
    for k in range(1, int(max_lag) + 1):
        staged = staged.withColumn(f"_l{k}", F.lag("_x", k).over(w))
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            (F.col("_x") - F.col("_mu")) * (F.col("_x") - F.col("_mu"))
        ).alias("_ss"),
    ]
    for k in range(1, int(max_lag) + 1):
        aggs.append(
            F.sum(
                (F.col("_x") - F.col("_mu"))
                * (F.col(f"_l{k}") - F.col("_mu"))
            ).alias(f"_c{k}")
        )
    a = staged.agg(*aggs)
    n = F.col("n").cast("double")
    q = None
    for k in range(1, int(max_lag) + 1):
        rho = F.col(f"_c{k}") / F.col("_ss")
        term = rho * rho / (n - F.lit(float(k)))
        q = term if q is None else q + term
    q = n * (n + F.lit(2.0)) * q
    good = (F.col("n") > max_lag + 1) & (F.col("_ss") > 0)
    return a.select(
        "n",
        F.lit(int(max_lag)).alias("h"),
        F.round(F.when(good, q), round_to).alias("q_stat"),
        F.round(
            F.when(good, F.col("_c1") / F.col("_ss")), round_to
        ).alias("rho_1"),
    )


def granger_lag1(
    df: DataFrame,
    order_col: str,
    y_col: str,
    x_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Lag-1 Granger causality (Granger 1969): does the HISTORY of x
    improve the prediction of y beyond y's own history?  Restricted
    model ``y_t ~ a + b·y_{t−1}`` vs full ``y_t ~ a + b·y_{t−1} +
    c·x_{t−1}``; ``F = (RSS_r − RSS_f)/(RSS_f/(n−3))`` is F(1, n−3)
    under no-causality.  Predictive precedence, not mechanism — but
    the right first question for "does click volume LEAD purchase
    volume?".

    Returns ONE row: ``n, coef_x, f_stat`` (NULL when n < 5 or a
    normal-equation determinant is 0).

    Plan: one ordered lag window over the (metadata-sized) series,
    ONE moment aggregate; both fits are closed-form (Cramer 2×2/3×3)
    on the 1-row moment frame, mirrored verbatim in the oracle.
    """
    d = df.select(
        F.col(order_col).alias("_t"),
        F.col(y_col).cast("double").alias("_y"),
        F.col(x_col).cast("double").alias("_x"),
    )
    w = Window.orderBy("_t")
    staged = d.select(
        F.col("_y").alias("y"),
        F.lag("_y").over(w).alias("p"),
        F.lag("_x").over(w).alias("q"),
    ).filter(F.col("p").isNotNull() & F.col("q").isNotNull())
    m = staged.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").alias("sy"),
        F.sum("p").alias("sp"),
        F.sum("q").alias("sq"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("p") * F.col("p")).alias("spp"),
        F.sum(F.col("q") * F.col("q")).alias("sqq"),
        F.sum(F.col("y") * F.col("p")).alias("syp"),
        F.sum(F.col("y") * F.col("q")).alias("syq"),
        F.sum(F.col("p") * F.col("q")).alias("spq"),
    ).collect()[0]
    n = float(m["n"])
    spark = df.sparkSession
    schema = "n long, coef_x double, f_stat double"
    if n < 5:
        return spark.createDataFrame([(int(n), None, None)], schema)
    # centered moments
    cpp = m["spp"] - m["sp"] ** 2 / n
    cqq = m["sqq"] - m["sq"] ** 2 / n
    cpq = m["spq"] - m["sp"] * m["sq"] / n
    cyp = m["syp"] - m["sy"] * m["sp"] / n
    cyq = m["syq"] - m["sy"] * m["sq"] / n
    cyy = m["syy"] - m["sy"] ** 2 / n
    if cpp <= 0:
        return spark.createDataFrame([(int(n), None, None)], schema)
    # restricted: slope b = Cyp/Cpp; RSS_r = Cyy − b·Cyp
    rss_r = cyy - cyp * cyp / cpp
    det = cpp * cqq - cpq * cpq
    if det <= 0:
        return spark.createDataFrame([(int(n), None, None)], schema)
    # full: [b, c] = inv([[Cpp, Cpq], [Cpq, Cqq]]) · [Cyp, Cyq]
    b = (cqq * cyp - cpq * cyq) / det
    c = (-cpq * cyp + cpp * cyq) / det
    rss_f = cyy - b * cyp - c * cyq
    if rss_f <= 0:
        return spark.createDataFrame([(int(n), None, None)], schema)
    f = (rss_r - rss_f) / (rss_f / (n - 3.0))
    return spark.createDataFrame(
        [(int(n), round(c, round_to), round(f, round_to))], schema
    )
