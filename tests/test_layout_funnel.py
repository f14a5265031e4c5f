"""Unit tests for operators/layout.py (Z-order keys) and
operators/funnel.py (sequential funnel)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from accelerated_intelligent_document_processing_on_aws_spark.operators.funnel import (
    funnel_conversion,
    funnel_steps,
)
from accelerated_intelligent_document_processing_on_aws_spark.operators.layout import (
    quantize_mod,
    zorder_key,
)


def _morton2(u: int, s: int, bits: int = 8) -> int:
    z = 0
    for b in range(bits):
        z |= ((u >> b) & 1) << (2 * b)
        z |= ((s >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_matches_reference_interleave(spark):
    rows = [(0, 0), (1, 0), (0, 1), (255, 255), (170, 85), (3, 200)]
    df = spark.createDataFrame([Row(u=u, s=s) for u, s in rows])
    got = {
        (r.u, r.s): r.z
        for r in df.select(
            "u", "s", zorder_key([F.col("u"), F.col("s")], 8).alias("z")
        ).collect()
    }
    for u, s in rows:
        assert got[(u, s)] == _morton2(u, s), (u, s)


def test_zorder_prefix_locality(spark):
    # dropping the low 8 of 16 interleaved bits keeps the top 4 bits of
    # each dimension: every prefix bucket spans <= a 16x16 tile
    df = spark.range(0, 4096).select(
        (F.col("id") % 256).alias("u"), ((F.col("id") * 7) % 256).alias("s")
    )
    z = df.select(
        "u", "s", zorder_key([F.col("u"), F.col("s")], 8).alias("z")
    )
    agg = (
        z.groupBy(F.shiftright("z", 8).alias("p"))
        .agg(
            (F.max("u") - F.min("u")).alias("du"),
            (F.max("s") - F.min("s")).alias("ds"),
        )
        .agg(F.max("du"), F.max("ds"))
        .collect()[0]
    )
    assert agg[0] <= 15 and agg[1] <= 15


def test_zorder_bit_budget_guard():
    with pytest.raises(ValueError):
        zorder_key([F.col("a"), F.col("b")], 32)  # 64 bits > 63


def test_quantize_mod_negative_safe(spark):
    df = spark.createDataFrame([Row(x=-1), Row(x=257)])
    got = sorted(
        r.q for r in df.select(quantize_mod(F.col("x"), 256).alias("q")).collect()
    )
    assert got == [1, 255]  # pmod keeps the key non-negative


def _events(spark, rows):
    t0 = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            Row(user_id=u, event_type=tp, ts=t0 + dt.timedelta(seconds=s))
            for u, tp, s in rows
        ]
    )


def test_funnel_requires_strict_order(spark):
    e = _events(
        spark,
        [
            # user 1: full ordered funnel
            (1, "view", 0), (1, "click", 10), (1, "purchase", 20),
            # user 2: purchase BEFORE click -> purchase must not count
            (2, "view", 0), (2, "purchase", 5), (2, "click", 10),
            # user 3: click only, never viewed -> reaches nothing
            (3, "click", 0),
        ],
    )
    steps = funnel_steps(e, "user_id", "event_type", "ts", ["view", "click", "purchase"])
    got = {r.user_id: (r.t1, r.t2, r.t3) for r in steps.collect()}
    assert got[1][2] is not None
    assert got[2][1] is not None and got[2][2] is None
    assert got[3] == (None, None, None)
    conv = {
        r.step_idx: (r.users, r.conversion_pct)
        for r in funnel_conversion(
            e, "user_id", "event_type", "ts", ["view", "click", "purchase"]
        ).collect()
    }
    assert conv[1] == (2, 100.0)
    assert conv[2] == (2, 100.0)
    assert conv[3] == (1, 50.0)


def test_funnel_same_timestamp_not_counted(spark):
    # strict ">": a click at exactly the view's timestamp doesn't advance
    e = _events(spark, [(1, "view", 0), (1, "click", 0), (1, "click", 3)])
    r = funnel_steps(e, "user_id", "event_type", "ts", ["view", "click"]).collect()[0]
    assert r.t1 is not None and r.t2 == dt.datetime(2024, 1, 1, 0, 0, 3)


def test_funnel_repeated_step_types(spark):
    # steps may repeat: second "view" must be a LATER event
    e = _events(spark, [(1, "view", 0), (1, "view", 7)])
    r = funnel_steps(e, "user_id", "event_type", "ts", ["view", "view"]).collect()[0]
    assert (r.t1, r.t2) == (
        dt.datetime(2024, 1, 1),
        dt.datetime(2024, 1, 1, 0, 0, 7),
    )


def test_funnel_single_shuffle_plan(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.plans import plan_of

    e = _events(spark, [(1, "view", 0)])
    p = plan_of(funnel_steps(e, "user_id", "event_type", "ts", ["view", "click"]))
    assert p.count("Exchange") <= 2  # user groupBy (+ input spread only)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_sequence_ngrams_counts_and_prune(spark):
    """Contiguous trigram counts over ordered per-key sequences; support
    prune removes rare patterns; n_keys counts distinct keys."""
    import datetime as dt

    from accelerated_intelligent_document_processing_on_aws_spark.operators.funnel import (
        sequence_ngrams,
    )

    t0 = dt.datetime(2026, 1, 1)
    rows = []
    for uid in range(4):
        for i, ev in enumerate(["view", "click", "buy", "view"]):
            rows.append((uid, ev, t0 + dt.timedelta(seconds=i), i))
    rows.append((99, "x", t0, 0))
    rows.append((99, "y", t0 + dt.timedelta(seconds=1), 1))
    rows.append((99, "z", t0 + dt.timedelta(seconds=2), 2))
    df = spark.createDataFrame(rows, ["uid", "ev", "ts", "eid"])
    got = {
        (r.step_1, r.step_2, r.step_3): (r.support, r.n_keys)
        for r in sequence_ngrams(df, "uid", "ev", "ts", "eid", n=3, min_support=2).collect()
    }
    assert got[("view", "click", "buy")] == (4, 4)
    assert got[("click", "buy", "view")] == (4, 4)
    assert ("x", "y", "z") not in got  # support 1 pruned


def test_rfm_segments_deterministic_tiles(spark):
    import datetime as dt

    from accelerated_intelligent_document_processing_on_aws_spark.operators.funnel import (
        rfm_segments,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: recent, frequent, heavy; user 2: old, light; user 3 mid
    for i in range(10):
        rows.append((1, t0 + dt.timedelta(days=9, minutes=i), 10.0))
    rows.append((2, t0, 1.0))
    for i in range(3):
        rows.append((3, t0 + dt.timedelta(days=5, minutes=i), 3.0))
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = {r.segment: r for r in
           rfm_segments(df, "user_id", "ts", "value", n_tiles=3).collect()}
    # user1 must be tile 1 on all axes
    assert "1-1-1" in out
    assert out["1-1-1"].n_users == 1
    assert out["1-1-1"].avg_frequency == 10.0
    assert out["1-1-1"].avg_monetary == 100.0
    # user2 is worst on all axes -> the 3-3-3 cell
    assert "3-3-3" in out
    # total users preserved
    assert sum(r.n_users for r in out.values()) == 3


def test_cohort_ltv_hand_case(spark):
    import datetime as dt

    from accelerated_intelligent_document_processing_on_aws_spark.operators.funnel import (
        cohort_ltv,
    )

    mon = dt.datetime(2024, 1, 1)  # a Monday
    rows = [
        # user 1: cohort week0, revenue 10 in w0, 5 in w1
        (1, mon + dt.timedelta(days=1), 10.0),
        (1, mon + dt.timedelta(days=8), 5.0),
        # user 2: same cohort, revenue 2 in w0 only
        (2, mon + dt.timedelta(days=2), 2.0),
        # user 3: cohort week1, revenue 7
        (3, mon + dt.timedelta(days=9), 7.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = {
        (str(r.cohort), r.week_offset): r
        for r in cohort_ltv(df, "user_id", "ts", "value").collect()
    }
    w0 = str(mon.date())
    w1 = str((mon + dt.timedelta(days=7)).date())
    assert out[(w0, 0)].cohort_users == 2
    assert out[(w0, 0)].week_revenue == 12.0
    assert out[(w0, 0)].cum_ltv_per_user == 6.0
    assert out[(w0, 1)].week_revenue == 5.0
    assert out[(w0, 1)].cum_ltv_per_user == 8.5  # (12+5)/2
    assert out[(w1, 0)].cohort_users == 1
    assert out[(w1, 0)].cum_ltv_per_user == 7.0


def test_sbg_churn_projection_recovers_planted_beta_mix(spark):
    import datetime as dt

    from accelerated_intelligent_document_processing_on_aws_spark.operators.funnel import (
        sbg_churn_projection,
    )

    # construct a flattening cohort: 100 users, last-activity offsets
    # chosen so S1=0.6, S2=0.42 (rho2=0.7 > S1 -> sBG solvable)
    mon = dt.datetime(2024, 1, 1)
    offsets = [0] * 40 + [1] * 18 + [2] * 12 + [3] * 30
    rows = []
    for uid, off in enumerate(offsets):
        rows.append((uid, mon))
        if off > 0:
            rows.append((uid, mon + dt.timedelta(days=7 * off)))
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {r.week: r for r in
           sbg_churn_projection(df, "user_id", "ts", horizon=6).collect()}
    assert out[1].s_observed == 0.6
    assert out[2].s_observed == 0.42
    s1, rho2 = 0.6, 0.42 / 0.6
    s = (1 - rho2) / (rho2 - s1)
    beta = s1 * s
    alpha = s - beta
    assert out[1].alpha == round(alpha, 6)
    assert out[1].beta == round(beta, 6)
    # projection reproduces the two fitted points exactly
    assert out[1].s_projected == 0.6
    assert out[2].s_projected == 0.42
    # flattening: projected retention RATIO improves week over week
    r4 = out[4].s_projected / out[3].s_projected
    r6 = out[6].s_projected / out[5].s_projected
    assert r6 > r4
    # horizon rows past the data have observed NULL but projections
    assert out[5].s_observed is None or out[5].s_observed >= 0
    assert out[6].s_projected is not None


def test_sbg_churn_no_flattening_nulls(spark):
    import datetime as dt

    from accelerated_intelligent_document_processing_on_aws_spark.operators.funnel import (
        sbg_churn_projection,
    )

    mon = dt.datetime(2024, 1, 1)
    # constant-ratio (geometric) curve: S1=0.5, S2=0.25 -> rho2 = S1
    offsets = [0] * 50 + [1] * 25 + [2] * 25
    rows = []
    for uid, off in enumerate(offsets):
        rows.append((uid, mon))
        if off > 0:
            rows.append((uid, mon + dt.timedelta(days=7 * off)))
    out = {r.week: r for r in sbg_churn_projection(
        spark.createDataFrame(rows, ["user_id", "ts"]), "user_id", "ts",
        horizon=4,
    ).collect()}
    assert out[1].s_observed == 0.5
    assert out[1].alpha is None and out[1].s_projected is None
