"""Hand-computed cases for calendar-aware rolling metrics
(operators/timeseries.py) and reciprocal-rank fusion
(operators/similarity.rrf_fuse)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Row

from accelerated_intelligent_document_processing_on_aws_spark.operators.similarity import (
    rrf_fuse,
)
from accelerated_intelligent_document_processing_on_aws_spark.operators.timeseries import (
    rolling_daily_metrics,
)


def _ev(day: int, n: int):
    return [Row(k="a", ts=datetime(2024, 1, day, 12, 0, 0))] * n


def test_rolling_gap_days_age_out(spark):
    # days 1 (n=2), 2 (n=1), 9 (n=5), 10 (n=3) — the 7-day jump is the
    # case a ROWS frame gets wrong
    df = spark.createDataFrame(_ev(1, 2) + _ev(2, 1) + _ev(9, 5) + _ev(10, 3))
    got = {
        r.day: r
        for r in rolling_daily_metrics(df, ["k"], "ts", 7).collect()
    }
    assert (got["2024-01-01"].rolling_sum, got["2024-01-01"].rolling_days) == (2, 1)
    assert (got["2024-01-02"].rolling_sum, got["2024-01-02"].rolling_days) == (3, 2)
    # Jan 9 frame = Jan 3..9: only Jan 9 itself survives
    assert (got["2024-01-09"].rolling_sum, got["2024-01-09"].rolling_days) == (5, 1)
    assert (got["2024-01-10"].rolling_sum, got["2024-01-10"].rolling_days) == (8, 2)
    # calendar-day average: missing days count as zero
    assert got["2024-01-10"].rolling_avg == round(8 / 7.0, 6)


def test_rolling_week_over_week(spark):
    df = spark.createDataFrame(_ev(2, 1) + _ev(9, 5) + _ev(10, 3))
    got = {
        r.day: r
        for r in rolling_daily_metrics(df, ["k"], "ts", 7).collect()
    }
    # Jan 9 is exactly 7 days after Jan 2
    assert (got["2024-01-09"].prev_week_n, got["2024-01-09"].wow_delta) == (1, 4)
    # Jan 10's minus-7 day (Jan 3) had no events
    assert got["2024-01-10"].prev_week_n is None
    assert got["2024-01-10"].wow_delta is None
    assert got["2024-01-02"].prev_week_n is None


def test_rrf_hand_computed(spark):
    r1 = spark.createDataFrame(
        [Row(query_id=1, neighbor_id=10, rank=1), Row(query_id=1, neighbor_id=11, rank=2)]
    )
    r2 = spark.createDataFrame(
        [Row(query_id=1, neighbor_id=11, rank=1), Row(query_id=1, neighbor_id=12, rank=2)]
    )
    rows = rrf_fuse([r1, r2], k=3).collect()
    order = [(r.neighbor_id, r.rank, r.n_rankers) for r in rows]
    # 11 appears in both rankers (1/61 + 1/62) > 10 (1/61) > 12 (1/62)
    assert order == [(11, 1, 2), (10, 2, 1), (12, 3, 1)]
    assert rows[0].rrf_score == round(1 / 61.0 + 1 / 62.0, 6)


def test_rrf_tiebreak_neighbor_asc(spark):
    r1 = spark.createDataFrame(
        [Row(query_id=1, neighbor_id=20, rank=1), Row(query_id=1, neighbor_id=5, rank=1)]
    )
    rows = rrf_fuse([r1], k=2).collect()
    assert [r.neighbor_id for r in rows] == [5, 20]


def test_cusum_matches_classic_recursion(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.timeseries import (
        cusum_days,
    )

    # level shift on day 5: [10,10,10,10,20,20] — differential against
    # the textbook max(0, S + z - k) recursion on the operator's own z
    rows = []
    for day, n in enumerate([10, 10, 10, 10, 20, 20], start=1):
        rows += [Row(ts=datetime(2024, 2, day, 8, 0, 0))] * n
    got = sorted(
        cusum_days(spark.createDataFrame(rows), "ts").collect(),
        key=lambda r: r.day,
    )
    s = 0.0
    for r in got:
        s = max(0.0, s + r.z - 0.5)
        assert abs(r.cusum_pos - s) < 1e-5
    # the shift days accumulate; the flat prefix stays below threshold
    assert not got[0].is_change and got[-1].cusum_pos > got[0].cusum_pos


def test_acf_alternating_series(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.timeseries import (
        acf_daily,
    )

    # [1,2,1,2,1,2,1,2]: lag-1 r = -1, lag-2 r = +1 exactly
    rows = []
    for day in range(1, 9):
        rows += [Row(ts=datetime(2024, 3, day, 8, 0, 0))] * (1 if day % 2 else 2)
    got = {r.lag: r for r in acf_daily(spark.createDataFrame(rows), "ts", max_lag=2).collect()}
    assert got[1].n_pairs == 7 and got[1].r == -1.0
    assert got[2].n_pairs == 6 and got[2].r == 1.0


def test_acf_constant_series_null(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.timeseries import (
        acf_daily,
    )

    rows = [Row(ts=datetime(2024, 3, day, 8, 0, 0)) for day in range(1, 6)]
    got = acf_daily(spark.createDataFrame(rows), "ts", max_lag=2).collect()
    assert all(r.r is None for r in got)


def test_acf_gap_days_drop_pairs(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.timeseries import (
        acf_daily,
    )

    # days 1,2,4,5 — lag 1 aligns only (2,1) and (5,4): 2 pairs
    rows = []
    for day, n in [(1, 1), (2, 2), (4, 3), (5, 4)]:
        rows += [Row(ts=datetime(2024, 4, day, 8, 0, 0))] * n
    got = {r.lag: r for r in acf_daily(spark.createDataFrame(rows), "ts", max_lag=1).collect()}
    assert got[1].n_pairs == 2


def test_seasonal_decompose_hand_computed(spark):
    import datetime as dt

    from accelerated_intelligent_document_processing_on_aws_spark.operators.timeseries import (
        seasonal_decompose_daily,
    )

    # period=3, one event per (day, count) pair: counts 1,2,3,1,2,3,...
    base = dt.datetime(2024, 1, 1)
    rows = []
    for d in range(9):
        for _ in range((d % 3) + 1):
            rows.append(Row(g="a", ts=base + dt.timedelta(days=d)))
    out = {
        r.day: r
        for r in seasonal_decompose_daily(
            spark.createDataFrame(rows), "g", "ts", period=3
        ).collect()
    }
    assert len(out) == 9
    days = sorted(out)
    first, mid, last = out[days[0]], out[days[1]], out[days[-1]]
    # edges: no full 3-row window -> trend NULL
    assert first.trend is None and last.trend is None
    # interior: avg(1,2,3) = 2 everywhere
    assert mid.trend == 2.0
    # seasonal per day-of-period: detrended is exactly y-2 on interior
    # rows, so seasonal = mean of a constant = y-2, remainder = 0
    assert mid.seasonal == mid.y - 2.0
    assert mid.remainder == 0.0


def test_seasonal_decompose_single_day_group(spark):
    import datetime as dt

    from accelerated_intelligent_document_processing_on_aws_spark.operators.timeseries import (
        seasonal_decompose_daily,
    )

    df = spark.createDataFrame([Row(g="a", ts=dt.datetime(2024, 1, 1))])
    (r,) = seasonal_decompose_daily(df, "g", "ts", period=7).collect()
    assert r.y == 1 and r.trend is None
    assert r.seasonal is None and r.remainder is None


def test_time_weighted_mean_hand_case(spark):
    """Step-interpolated TWA: value 10 for 30 s then 20 for 10 s ->
    (10*30 + 20*10)/40 = 12.5; the final observation carries no weight."""
    import datetime as dt

    from accelerated_intelligent_document_processing_on_aws_spark.operators.timeseries import (
        time_weighted_mean,
    )

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        ("a", t0, 10.0),
        ("a", t0 + dt.timedelta(seconds=30), 20.0),
        ("a", t0 + dt.timedelta(seconds=40), 99.0),   # last: no duration
        ("b", t0, 5.0),                                # single obs: no row? NULL mean
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    got = {r.key: r for r in time_weighted_mean(df, "k", "ts", "v").collect()}
    assert got["a"].tw_mean == 12.5
    assert got["a"].n_intervals == 2 and got["a"].total_us == 40_000_000
    assert "b" not in got  # zero intervals -> no row


def test_ewma_days_exact_dyadic(spark):
    """Halflife-1 EWMA with exact 2^-k weights: hand-checkable values,
    adjusted denominator at series start."""
    import datetime as dt

    from accelerated_intelligent_document_processing_on_aws_spark.operators.timeseries import (
        ewma_days,
    )

    t0 = dt.datetime(2026, 1, 1, 12)
    rows = []
    for day, cnt in [(0, 4), (1, 8), (2, 2)]:
        for i in range(cnt):
            rows.append(("k", t0 + dt.timedelta(days=day, seconds=i)))
    df = spark.createDataFrame(rows, ["k", "ts"])
    got = {r.day: r for r in ewma_days(df, "k", "ts").collect()}
    assert got["2026-01-01"].ewma == 4.0          # first day: itself
    assert got["2026-01-02"].ewma == round((8 + 4 * 0.5) / 1.5, 6)
    assert got["2026-01-03"].ewma == round((2 + 8 * 0.5 + 4 * 0.25) / 1.75, 6)


def test_theil_sen_robust_to_outlier(spark):
    """A corrupted day barely moves the Theil-Sen slope while OLS would
    chase it; exact hand case on a clean linear series."""
    import datetime as dt

    from accelerated_intelligent_document_processing_on_aws_spark.operators.timeseries import (
        theil_sen_daily,
    )

    t0 = dt.datetime(2026, 1, 1)
    rows = []
    for d in range(6):
        n = 2 + 3 * d  # clean slope 3
        for i in range(n):
            rows.append(("k", t0 + dt.timedelta(days=d, seconds=i)))
    clean = {r.key: r for r in theil_sen_daily(spark.createDataFrame(rows, ["k", "ts"]), "k", "ts").collect()}
    assert clean["k"].slope == 3.0 and clean["k"].n_days == 6
    # corrupt one day with a 100x spike
    rows2 = rows + [("k", t0 + dt.timedelta(days=3, seconds=10_000 + i)) for i in range(500)]
    dirty = {r.key: r for r in theil_sen_daily(spark.createDataFrame(rows2, ["k", "ts"]), "k", "ts").collect()}
    assert abs(dirty["k"].slope - 3.0) < 2.0  # median resists the spike


def test_holt_linear_hand(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.timeseries import (
        holt_linear_daily,
    )
    from datetime import datetime

    # one event per (day, count) spec: day i gets counts[i] events
    counts = [4, 8, 6]
    rows = [
        ("k", datetime(2024, 1, 1 + i, 12, 0, 0))
        for i, c in enumerate(counts)
        for _ in range(c)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    out = {r.day: r for r in holt_linear_daily(df, "k", "ts").collect()}
    # l1=4, b1=0; l2=.5*8+.5*4=6, b2=.5*(6-4)=1; l3=.5*6+.5*7=6.5,
    # b3=.5*(6.5-6)+.5*1=0.75
    assert out["2024-01-01"].level == 4.0 and out["2024-01-01"].trend == 0.0
    assert out["2024-01-02"].level == 6.0 and out["2024-01-02"].trend == 1.0
    assert out["2024-01-03"].level == 6.5 and out["2024-01-03"].trend == 0.75
    assert out["2024-01-03"].forecast_next == 7.25


def test_mase_hand(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.timeseries import (
        mase_daily,
    )
    from datetime import datetime

    # 4-day series with season=2: counts 1,2,3,5
    counts = [1, 2, 3, 5]
    rows = [
        ("k", datetime(2024, 1, 1 + i, 12, 0, 0))
        for i, c in enumerate(counts)
        for _ in range(c)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    r = mase_daily(df, "k", "ts", season=2).first()
    # rows with both lags: days 3,4 -> e1 = |3-2|,|5-3| = 1,2; es = |3-1|,|5-2| = 2,3
    assert r.n_eval == 2
    assert r.mae_naive == 1.5 and r.mae_snaive == 2.5
    assert r.mase_naive == 0.6


def test_rolling_distinct_users_hand_case(spark):
    import datetime as _dt

    from pyspark.sql import Row as _Row

    from accelerated_intelligent_document_processing_on_aws_spark.operators.timeseries import (
        rolling_distinct_users,
    )

    d0 = _dt.datetime(2024, 1, 1, 6, 0, 0)

    def at(day):
        return d0 + _dt.timedelta(days=day)

    # user 1 active day 0 and day 2; user 2 active day 2 only
    rows = [
        _Row(user_id=1, ts=at(0)),
        _Row(user_id=1, ts=at(0)),  # same-day dup must not double count
        _Row(user_id=1, ts=at(2)),
        _Row(user_id=2, ts=at(2)),
    ]
    out = {
        str(r.day): r
        for r in rolling_distinct_users(
            spark.createDataFrame(rows), "user_id", "ts", window_days=7
        ).collect()
    }
    assert out["2024-01-01"].n_users_1d == 1
    assert out["2024-01-01"].n_users_7d == 1
    assert out["2024-01-02"].n_users_1d == 0     # no direct activity
    assert out["2024-01-02"].n_users_7d == 1     # trailing window covers day 0
    assert out["2024-01-03"].n_users_1d == 2
    assert out["2024-01-03"].n_users_7d == 2
    # report days stop at the max activity day
    assert max(out) == "2024-01-03"


def test_rolling_distinct_window_ages_out(spark):
    import datetime as _dt

    from pyspark.sql import Row as _Row

    from accelerated_intelligent_document_processing_on_aws_spark.operators.timeseries import (
        rolling_distinct_users,
    )

    d0 = _dt.datetime(2024, 1, 1)
    rows = [
        _Row(user_id=1, ts=d0),
        _Row(user_id=2, ts=d0 + _dt.timedelta(days=10)),
    ]
    out = {
        str(r.day): r.n_users_7d
        for r in rolling_distinct_users(
            spark.createDataFrame(rows), "user_id", "ts", window_days=7
        ).collect()
    }
    # day 10: user 1's day-0 activity aged out of the 7-day window
    assert out["2024-01-11"] == 1


def test_pacf_ar1_cuts_off_after_lag1(spark):
    import datetime as _dt

    from pyspark.sql import Row as _Row

    from accelerated_intelligent_document_processing_on_aws_spark.operators.timeseries import (
        pacf_daily,
    )

    # deterministic AR(1)-ish daily counts: n_t = 50 + 0.8*(n_{t-1}-50)
    # + small alternating kick so variance stays positive
    d0 = _dt.datetime(2024, 1, 1)
    counts = []
    level = 80.0
    for t in range(120):
        level = 50 + 0.8 * (level - 50) + (6 if t % 2 == 0 else -6)
        counts.append(max(1, int(round(level))))
    rows = [
        _Row(ts=d0 + _dt.timedelta(days=t, seconds=i))
        for t, c in enumerate(counts)
        for i in range(c)
    ]
    r = pacf_daily(spark.createDataFrame(rows), "ts").collect()[0]
    assert r.pacf1 == r.r1
    # Durbin-Levinson identity checks against the rounded ACF grid
    want2 = (r.r2 - r.r1**2) / (1 - r.r1**2)
    assert abs(r.pacf2 - want2) < 1e-6
    p21 = r.r1 * (1 - want2)
    want3 = (r.r3 - (p21 * r.r2 + want2 * r.r1)) / (
        1 - (p21 * r.r1 + want2 * r.r2)
    )
    assert abs(r.pacf3 - want3) < 1e-6


def test_hour_week_profile_peak_cell(spark):
    import datetime as _dt

    from pyspark.sql import Row as _Row

    from accelerated_intelligent_document_processing_on_aws_spark.operators.timeseries import (
        hour_week_profile,
    )

    # Monday 2024-01-01: flood hour 9, trickle elsewhere
    d0 = _dt.datetime(2024, 1, 1)  # a Monday
    rows = [_Row(ts=d0 + _dt.timedelta(hours=9, seconds=i)) for i in range(50)]
    rows += [
        _Row(ts=d0 + _dt.timedelta(days=dd, hours=h))
        for dd in range(3)
        for h in range(4)
    ]
    out = hour_week_profile(spark.createDataFrame(rows), "ts").collect()
    cells = {(r.dow, r.hour): r for r in out}
    hot = cells[(1, 9)]
    assert hot.n == 50 and hot.peak
    assert all(
        not r.peak for (k, r) in cells.items() if k != (1, 9)
    )
    # ISO weekday: Monday == 1, Wednesday == 3
    assert (3, 0) in cells


def test_seasonal_strength_pure_cycle_vs_noise(spark):
    import datetime as _dt

    from pyspark.sql import Row as _Row

    from accelerated_intelligent_document_processing_on_aws_spark.operators.timeseries import (
        seasonal_decompose_daily,
        seasonal_strength,
    )

    d0 = _dt.datetime(2024, 1, 1)
    rows = []
    # group "cyc": a clean weekly cycle (counts 5..11 by weekday)
    for t in range(56):
        c = 5 + (t % 7)
        rows += [
            _Row(g="cyc", ts=d0 + _dt.timedelta(days=t, seconds=i))
            for i in range(c)
        ]
    # group "flat": constant 8/day -> detrended variance ~ 0; strength
    # degenerates but must stay in [0, 1] without error
    for t in range(56):
        rows += [
            _Row(g="flat", ts=d0 + _dt.timedelta(days=t, seconds=i))
            for i in range(8)
        ]
    dec = seasonal_decompose_daily(
        spark.createDataFrame(rows), "g", "ts"
    )
    out = {r.group: r for r in seasonal_strength(dec).collect()}
    assert out["cyc"].strength > 0.95   # the cycle explains ~everything
    for r in out.values():
        assert r.strength is None or 0.0 <= r.strength <= 1.0


def _ph_reference(xs, delta=0.0):
    m = 0.0
    mn = 0.0
    ph_max = 0.0
    alarms = []
    mu_sum = 0.0
    for t, x in enumerate(xs, 1):
        mu_sum += x
        mu = mu_sum / t
        m += x - mu - delta
        mn = min(mn, m)
        ph = m - mn
        ph_max = max(ph_max, ph)
        alarms.append(ph)
    return ph_max, alarms


def test_page_hinkley_detects_shift(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.timeseries import (
        page_hinkley,
    )

    xs = [10.0, 11.0, 9.0, 10.0, 10.0, 30.0, 31.0, 29.0, 30.0, 31.0]
    rows = [(t, x) for t, x in enumerate(xs, 1)]
    df = spark.createDataFrame(rows, ["t", "x"])
    ph_max, alarms = _ph_reference(xs)
    r = page_hinkley(df, "t", "x", delta=0.0, lam=20.0).collect()[0]
    assert r.n_points == 10
    assert r.ph_max == round(ph_max, 6)
    want_alarm = next(t for t, p in enumerate(alarms, 1) if p > 20.0)
    assert r.alarm_at == want_alarm


def test_page_hinkley_stable_series_no_alarm(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.timeseries import (
        page_hinkley,
    )

    rows = [(t, 10.0 + (t % 2)) for t in range(1, 21)]
    r = page_hinkley(
        spark.createDataFrame(rows, ["t", "x"]), "t", "x", lam=5.0
    ).collect()[0]
    assert r.alarm_at is None
    assert r.ph_max < 5.0


def test_gumbel_fit_reference(spark):
    import math

    from accelerated_intelligent_document_processing_on_aws_spark.operators.timeseries import (
        gumbel_fit,
    )

    xs = [30.0, 35.0, 28.0, 40.0, 33.0, 38.0, 31.0, 45.0]
    n = len(xs)
    mean = sum(xs) / n
    s = math.sqrt(sum((x - mean) ** 2 for x in xs) / (n - 1))
    beta = s * math.sqrt(6.0) / math.pi
    mu = mean - 0.5772156649015329 * beta
    level = mu - beta * math.log(-math.log(1 - 1 / 30.0))
    r = gumbel_fit(
        spark.createDataFrame([(x,) for x in xs], ["v"]), "v", 30.0
    ).collect()[0]
    assert r.n == n
    assert r.mu == round(mu, 6)
    assert r.beta == round(beta, 6)
    assert r.return_level == round(level, 6)
    assert r.return_level > max(xs)  # 30-period level beyond this sample

    const = gumbel_fit(
        spark.createDataFrame([(5.0,), (5.0,)], ["v"]), "v"
    ).collect()[0]
    assert const.mu is None


def test_pot_gpd_fit_reference(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.timeseries import (
        pot_gpd_fit,
    )

    vals = [5.0, 12.0, 15.0, 9.0, 20.0, 11.0, 30.0, 7.0]
    u = 10.0
    exc = [v - u for v in vals if v > u]  # 2, 5, 10, 1, 20
    n = len(exc)
    m = sum(exc) / n
    var = sum((e - m) ** 2 for e in exc) / (n - 1)
    ratio = m * m / var
    r = pot_gpd_fit(
        spark.createDataFrame([(v,) for v in vals], ["v"]), "v", u
    ).collect()[0]
    assert (r.n_exceed, r.threshold) == (n, u)
    assert r.mean_excess == round(m, 6)
    assert r.xi == round((1 - ratio) / 2, 6)
    assert r.beta == round(m * (ratio + 1) / 2, 6)

    none = pot_gpd_fit(
        spark.createDataFrame([(1.0,), (2.0,)], ["v"]), "v", 10.0
    ).collect()[0]
    assert none.n_exceed == 0 and none.xi is None


def test_records_test_reference(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.timeseries import (
        records_test,
    )

    # strictly increasing: every point is a record -> big positive z
    inc = [(t, float(t)) for t in range(1, 21)]
    r = records_test(
        spark.createDataFrame(inc, ["t", "x"]), "t", "x"
    ).collect()[0]
    n = 20
    h1 = sum(1 / i for i in range(1, n + 1))
    h2 = sum(1 / i**2 for i in range(1, n + 1))
    assert (r.n, r.records) == (n, n)
    assert r.expected == round(h1, 6)
    assert r.z == round((n - h1) / (h1 - h2) ** 0.5, 6)
    assert r.z > 5

    # alternating low/high around a constant: exactly the hand count
    seq = [3.0, 1.0, 2.0, 4.0, 0.5, 2.5]
    rows = [(t, x) for t, x in enumerate(seq, 1)]
    r2 = records_test(
        spark.createDataFrame(rows, ["t", "x"]), "t", "x"
    ).collect()[0]
    assert r2.records == 2  # 3.0 (first) and 4.0


def test_durbin_watson_trend_reference(spark):
    import numpy as np

    from accelerated_intelligent_document_processing_on_aws_spark.operators.timeseries import (
        durbin_watson_trend,
    )

    # independent noise around a trend: DW near 2
    rng = np.random.RandomState(6)
    n = 60
    y = 5.0 + 0.3 * np.arange(1, n + 1) + rng.randn(n)
    rows = [(t, float(v)) for t, v in enumerate(y, 1)]
    r = durbin_watson_trend(
        spark.createDataFrame(rows, ["t", "y"]), "t", "y"
    ).collect()[0]
    i = np.arange(1, n + 1)
    b1, b0 = np.polyfit(i, y, 1)
    b0r, b1r = round(b0, 9), round(b1, 9)
    e = y - b0r - b1r * i
    dw = np.sum(np.diff(e) ** 2) / np.sum(e**2)
    assert r.n == n
    assert r.slope == round(b1r, 6)
    assert r.dw == round(float(dw), 6)
    assert 1.4 < r.dw < 2.6

    # heavily autocorrelated residuals (smooth sine): DW << 2
    ys = 10.0 + np.sin(np.arange(1, 81) / 6.0) * 5
    rows2 = [(t, float(v)) for t, v in enumerate(ys, 1)]
    r2 = durbin_watson_trend(
        spark.createDataFrame(rows2, ["t", "y"]), "t", "y"
    ).collect()[0]
    assert r2.dw < 0.5


def _hurst_reference(xs, sizes):
    import math

    rs_means = {}
    for m in sizes:
        rss = []
        for b in range(len(xs) // m):
            blk = xs[b * m:(b + 1) * m]
            mu = sum(blk) / m
            z, mn, mx, cum = 0.0, 0.0, 0.0, 0.0
            zs = []
            for v in blk:
                cum += v - mu
                zs.append(cum)
            r = max(zs) - min(zs)
            s2 = sum((v - mu) ** 2 for v in blk) / m
            if s2 > 0:
                rss.append(r / math.sqrt(s2))
        if rss:
            rs_means[m] = sum(rss) / len(rss)
    pts = [(math.log(m), math.log(v)) for m, v in rs_means.items() if v > 0]
    k = len(pts)
    sx = sum(p[0] for p in pts); sy = sum(p[1] for p in pts)
    sxx = sum(p[0] ** 2 for p in pts); sxy = sum(p[0] * p[1] for p in pts)
    h = (sxy - sx * sy / k) / (sxx - sx * sx / k)
    return rs_means, h


def test_hurst_rs_persistent_vs_antipersistent(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.timeseries import (
        hurst_rs,
    )

    # smooth ramp + tiny wiggle: strongly persistent (H near 1)
    ramp = [float(i) + 0.1 * ((i * 7) % 3) for i in range(256)]
    rows = [(t, v) for t, v in enumerate(ramp)]
    r = hurst_rs(
        spark.createDataFrame(rows, ["t", "x"]), "t", "x",
        block_sizes=(8, 16, 32, 64),
    ).collect()[0]
    ref_rs, ref_h = _hurst_reference(ramp, (8, 16, 32, 64))
    assert r.n == 256
    assert r.h == round(ref_h, 6)
    assert r.rs_8 == round(ref_rs[8], 6)
    assert r.h > 0.9

    # strict alternation: anti-persistent, H well below 0.5
    alt = [float((-1) ** i) for i in range(256)]
    ra = hurst_rs(
        spark.createDataFrame(list(enumerate(alt)), ["t", "x"]), "t", "x",
        block_sizes=(8, 16, 32, 64),
    ).collect()[0]
    _, ref_ha = _hurst_reference(alt, (8, 16, 32, 64))
    assert ra.h == round(ref_ha, 6)
    assert ra.h < 0.3


def test_permutation_entropy_extremes(spark):
    import math

    from accelerated_intelligent_document_processing_on_aws_spark.operators.timeseries import (
        permutation_entropy,
    )

    # monotone: one ordinal pattern -> pe = 0
    mono = [(t, float(t)) for t in range(50)]
    r = permutation_entropy(
        spark.createDataFrame(mono, ["t", "x"]), "t", "x"
    ).collect()[0]
    assert (r.n_triples, r.n_patterns) == (48, 1)
    assert r.pe == 0.0

    # period-3 cycle 0,2,1: hits 3 distinct patterns equally
    cyc = [(t, float([0, 2, 1][t % 3])) for t in range(48)]
    rc = permutation_entropy(
        spark.createDataFrame(cyc, ["t", "x"]), "t", "x"
    ).collect()[0]
    assert rc.n_patterns == 3
    # 46 triples split 16/15/15 across the three patterns
    n = 46
    counts = [16, 15, 15]
    h = -sum(c / n * math.log(c / n) for c in counts)
    assert rc.pe == round(h / math.log(6), 6)
    assert 0.6 < rc.pe < 0.62


def test_ljung_box_white_vs_persistent(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.timeseries import (
        ljung_box,
    )

    # deterministic pseudo-noise (md5-ish scramble): Q modest
    vals = [float((i * 7919) % 101) for i in range(120)]
    rows = [(t, v) for t, v in enumerate(vals)]
    r = ljung_box(
        spark.createDataFrame(rows, ["t", "x"]), "t", "x", max_lag=5
    ).collect()[0]
    # pure-python reference with the same conventions
    n = len(vals)
    mu = sum(vals) / n
    ss = sum((v - mu) ** 2 for v in vals)
    q = 0.0
    for k in range(1, 6):
        ck = sum(
            (vals[t] - mu) * (vals[t - k] - mu) for t in range(k, n)
        )
        q += (ck / ss) ** 2 / (n - k)
    q *= n * (n + 2)
    assert r.n == n and r.h == 5
    assert r.q_stat == round(q, 6)

    # smooth sine: strongly autocorrelated -> enormous Q
    import math

    sm = [(t, math.sin(t / 8.0)) for t in range(120)]
    r2 = ljung_box(
        spark.createDataFrame(sm, ["t", "x"]), "t", "x", max_lag=5
    ).collect()[0]
    assert r2.q_stat > 100
    assert r2.rho_1 > 0.9


def test_granger_lag1_planted_lead(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.timeseries import (
        granger_lag1,
    )

    # x leads y by one step exactly: y_t = 0.5*y_{t-1} + 2*x_{t-1}
    xs = [float((i * 13) % 7) for i in range(80)]
    ys = [0.0]
    for t in range(1, 80):
        ys.append(0.5 * ys[t - 1] + 2.0 * xs[t - 1])
    rows = [(t, ys[t], xs[t]) for t in range(80)]
    df = spark.createDataFrame(rows, ["t", "y", "x"])
    r = granger_lag1(df, "t", "y", "x").collect()[0]
    assert r.n == 79
    assert abs(r.coef_x - 2.0) < 1e-6  # recovers the planted lead
    assert r.f_stat > 1000

    # independent x: F small
    import random

    random.seed(12)
    xs2 = [random.random() for _ in range(80)]
    ys2 = [random.random() for _ in range(80)]
    rows2 = [(t, ys2[t], xs2[t]) for t in range(80)]
    r2 = granger_lag1(
        spark.createDataFrame(rows2, ["t", "y", "x"]), "t", "y", "x"
    ).collect()[0]
    assert r2.f_stat < 8
