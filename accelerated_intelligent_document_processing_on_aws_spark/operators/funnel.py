"""Sequential funnel analysis over an event stream.

Classic product-analytics operator the reference's metering/reporting
family stops short of: given an ordered list of step event-types, count
how many users reached each step IN ORDER — step ``i`` matches a user's
earliest event of that type occurring strictly after their matched step
``i-1`` event (first-touch sequential funnel).

Scale shape: ONE shuffle total.  Events group by user once
(``sort_array(collect_list(struct(ts, type)))`` — the repo's G3
ordered-assembly pattern, state bounded by a single user's activity),
and the per-user step times fall out of one ``F.aggregate`` fold over
the sorted array (O(events) per user, no re-evaluation pitfall: the
fold's accumulator is the only captured state).  The per-step rollup is
a metadata-sized aggregate.  The equivalent k-step join chain would
shuffle k times; the fold does it in one.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_steps(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Per-user step-completion times: ``(user, t_1 .. t_k)`` where
    ``t_i`` is the earliest ``steps[i]`` event strictly after ``t_{i-1}``
    (NULL = step never reached; later steps of an unreached step are
    NULL by construction).  Ties at identical timestamps break by the
    struct sort's (ts, type) lexical order — deterministic."""
    k = len(steps)
    if k == 0:
        raise ValueError("steps must be non-empty")
    per_user = df.groupBy(F.col(user_col).alias("user_id")).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("tp")))
        ).alias("_ev")
    )
    zero = F.struct(
        *[F.lit(None).cast("timestamp").alias(f"t{i}") for i in range(1, k + 1)]
    )

    def step_fold(acc, e):
        # first step: min ts of steps[0]; step i: first steps[i] event
        # strictly after acc.t{i-1} — evaluated most-advanced-first so a
        # single event can't satisfy two consecutive steps
        fields = []
        for i in range(k, 0, -1):
            prev_ok = (
                F.lit(True) if i == 1 else acc[f"t{i-1}"].isNotNull()
            )
            prev_lt = (
                F.lit(True) if i == 1 else (e["ts"] > acc[f"t{i-1}"])
            )
            hit = (
                acc[f"t{i}"].isNull()
                & (e["tp"] == F.lit(steps[i - 1]))
                & prev_ok
                & prev_lt
            )
            fields.append(F.when(hit, e["ts"]).otherwise(acc[f"t{i}"]).alias(f"t{i}"))
        return F.struct(*reversed(fields))

    folded = per_user.select(
        "user_id", F.aggregate("_ev", zero, step_fold).alias("_s")
    )
    return folded.select(
        "user_id", *[F.col(f"_s.t{i}").alias(f"t{i}") for i in range(1, k + 1)]
    )


def funnel_conversion(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Funnel rollup: one row per step with users reached and conversion
    vs step 1 (``step_idx, step_name, users, conversion_pct``).  The
    rollup aggregates the per-user step table once (metadata-sized
    result); percentages round to 6 so the output is engine-portable.

    Plan shape: the k output rows come from EXPLODING a literal
    struct-array against the single-row counts frame, not from a k-way
    ``unionAll`` of selects over it — each union branch would re-plan
    the whole scan + groupBy + aggregate (measured: 10 exchanges for
    k=3 vs 2 with the explode; the counts aggregate is evaluated once).
    """
    k = len(steps)
    per_user = funnel_steps(df, user_col, type_col, ts_col, steps)
    counts = per_user.agg(
        *[
            F.sum(F.col(f"t{i}").isNotNull().cast("long")).alias(f"n{i}")
            for i in range(1, k + 1)
        ]
    )
    step_rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("step_idx"),
                F.lit(steps[i - 1]).alias("step_name"),
                F.col(f"n{i}").alias("users"),
            )
            for i in range(1, k + 1)
        ]
    )
    return (
        counts.select(F.col("n1"), F.explode(step_rows).alias("_s"))
        .select(
            F.col("_s.step_idx").alias("step_idx"),
            F.col("_s.step_name").alias("step_name"),
            F.col("_s.users").alias("users"),
            F.round(
                F.col("_s.users") * F.lit(100.0)
                / F.greatest(F.col("n1"), F.lit(1)),
                6,
            ).alias("conversion_pct"),
        )
    )


def sequence_ngrams(
    df: DataFrame,
    key_col: str,
    event_col: str,
    ts_col: str,
    tiebreak_col: str,
    n: int = 3,
    min_support: int = 5,
) -> DataFrame:
    """Frequent contiguous event n-grams (PrefixSpan-lite for the
    contiguous case): each key's time-ordered event sequence contributes
    its length-``n`` windows, and n-grams with support (number of
    occurrences) below ``min_support`` are pruned — the sequence-mining
    pass behind "what 3-step paths do users actually take", one level up
    from the first-order transition matrix.

    Columns: ``step_1..step_n, support, n_keys`` (distinct keys the
    pattern occurs in).

    Scale shape: chained lead() columns under ONE key-ordered window (no
    self-join — the q_event_transitions discipline generalized to n),
    then one aggregate with map-side combine.  Output is
    vocabulary^n-bounded after the support prune, never corpus-sized."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    cols = [F.col(event_col).alias("step_1")] + [
        F.lead(event_col, i).over(w).alias(f"step_{i + 1}")
        for i in range(1, n)
    ]
    grams = df.select(F.col(key_col).alias("_k"), *cols).filter(
        F.col(f"step_{n}").isNotNull()
    )
    return (
        grams.groupBy(*[f"step_{i + 1}" for i in range(n)])
        .agg(
            F.count(F.lit(1)).alias("support"),
            F.countDistinct("_k").alias("n_keys"),
        )
        .filter(F.col("support") >= F.lit(min_support))
    )


def attribution_credit(
    events: DataFrame,
    touch_types: Sequence[str] = ("click", "view"),
    conv_type: str = "purchase",
    lookback_hours: float = 2.0,
    round_to: int = 6,
) -> DataFrame:
    """Multi-touch attribution: each conversion's value is credited to
    the same user's touch events (clicks/views) inside the lookback
    window ``[conv_ts − lookback, conv_ts]`` under two standard models —
    LINEAR (value split equally across all window touches) and
    LAST-TOUCH (full value to the latest touch; ties broken by
    event_id so the winner is engine- and partition-deterministic).
    The marketing-analytics dual of the funnel operator: the funnel says
    how far users get, attribution says which channel gets paid.

    Columns: ``channel, touches, conversions_touched, linear_credit,
    last_touch_credit`` — channel = the touch event_type.  Conversions
    with zero window touches carry no credit (they appear in neither
    model; report them via funnel_conversion).

    Scale shape: the window match is the repo's bucketized range join
    (operators/rangejoin.py) — interval rows explode into
    lookback-sized bins and candidates meet on a (user_id, bin)
    EQUI-join (AQE/skew-eligible), never a nested loop; both credit
    windows share one conversion-keyed partitioning; the final rollup
    is channel-count-sized."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.rangejoin import (
        range_join,
    )

    touches = events.filter(
        F.col("event_type").isin(*list(touch_types))
    ).select(
        "user_id",
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("channel"),
        F.col("ts").alias("touch_ts"),
    )
    secs = int(lookback_hours * 3600)
    convs = events.filter(F.col("event_type") == conv_type).select(
        "user_id",
        F.col("event_id").alias("conv_id"),
        F.col("value").alias("conv_value"),
        (F.col("ts") - F.expr(f"INTERVAL {secs} SECONDS")).alias("w_start"),
        F.col("ts").alias("w_end"),
    )
    pairs = range_join(
        touches,
        convs,
        on=["user_id"],
        point_col="touch_ts",
        start_col="w_start",
        end_col="w_end",
        bin_width=float(secs),
    )
    w_n = Window.partitionBy("conv_id")
    w_last = Window.partitionBy("conv_id").orderBy(
        F.desc("touch_ts"), F.desc("touch_id")
    )
    enriched = pairs.withColumn(
        "_n", F.count(F.lit(1)).over(w_n)
    ).withColumn("_rk", F.row_number().over(w_last))
    return enriched.groupBy("channel").agg(
        F.count(F.lit(1)).alias("touches"),
        F.countDistinct("conv_id").alias("conversions_touched"),
        F.round(
            F.sum(F.col("conv_value") / F.col("_n")), round_to
        ).alias("linear_credit"),
        F.round(
            F.sum(
                F.when(F.col("_rk") == 1, F.col("conv_value")).otherwise(
                    F.lit(0.0)
                )
            ),
            round_to,
        ).alias("last_touch_credit"),
    )


def next_conversion(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    event_col: str,
    from_event: str,
    to_event: str,
    within_sec: int,
    tiebreak_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Time-to-convert between two event types: for every ``from_event``
    row, the NEXT ``to_event`` by the same user, counted as converted iff
    it lands within ``within_sec`` seconds (strictly after).  Returns one
    row: ``n_from, n_converted, conv_rate, avg_latency_sec`` (latency
    averaged over converted pairs only).

    Unlike ``funnel_conversion`` (per-user step reach) this measures the
    latency distribution of a single hop — the survival-curve companion
    for "how fast does a view become a purchase".

    Plan shape: the next-match is a running ``min`` over a DESCENDING
    per-user window (no self-join, no pair blowup — each row pairs with
    at most one successor), then one global aggregate.

    ``tiebreak_col`` makes the window order total when (user, ts) can
    repeat, so the result is a pure function of the input; an equal-
    timestamp ``to_event`` is "not after" (the ``> 0`` gate) and may
    shadow a later in-window match — the documented tie convention.
    """
    order = [F.col(ts_col).desc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).desc())
    w = (
        Window.partitionBy(user_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    nxt = df.withColumn(
        "_next_to",
        F.min(
            F.when(F.col(event_col) == to_event, F.col(ts_col))
        ).over(w),
    )
    # exact integer microseconds -> identical doubles in any engine
    lat = F.expr(
        f"timestampdiff(MICROSECOND, {ts_col}, _next_to)"
        " / CAST(1000000 AS DOUBLE)"
    )
    froms = nxt.filter(F.col(event_col) == from_event).select(
        F.when((lat > 0) & (lat <= within_sec), lat).alias("_lat")
    )
    return froms.agg(
        F.count(F.lit(1)).alias("n_from"),
        F.count("_lat").alias("n_converted"),
        F.round(
            F.count("_lat") / F.count(F.lit(1)).cast("double"), round_to
        ).alias("conv_rate"),
        F.round(F.avg("_lat"), round_to).alias("avg_latency_sec"),
    )


def rfm_segments(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    n_tiles: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """RFM segmentation (Hughes 1994): per user, Recency (seconds since
    their last event, against the corpus max), Frequency (event count)
    and Monetary (value sum), each cut into ``n_tiles`` quantile tiles
    — the classic engagement grid ("555" = recent, frequent, heavy)
    that marketing stacks compute nightly and a curation stack reuses
    to weight user cohorts.

    Tile assignment is NTILE over a TOTAL order (metric, then user id),
    so ties split deterministically and the result is engine-portable.
    Recency tiles order ASCENDING (most recent = tile n_tiles...
    actually tile 1 = most recent); frequency/monetary DESCENDING
    (tile 1 = heaviest) — tile 1 is always "best".

    Returns one row per occupied segment: ``segment, n_users,
    avg_frequency, avg_monetary`` (segment = 'r-f-m' tile string).

    Plan: ONE corpus aggregate to the user frame; three NTILE windows
    over that user-cardinality frame (single-partition windows over
    users, not events); one segment aggregate.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    per_u = df.groupBy(F.col(user_col).alias("u")).agg(
        F.max(us).alias("_last"),
        F.count(F.lit(1)).alias("f"),
        F.coalesce(F.sum(F.col(value_col)), F.lit(0.0)).alias("m"),
    )
    wall = Window.partitionBy()
    per_u = per_u.withColumn(
        "r",
        (F.max("_last").over(wall) - F.col("_last")).cast("double")
        / F.lit(1000000.0),
    )
    wr = Window.orderBy(F.col("r").asc(), F.col("u"))
    wf = Window.orderBy(F.col("f").desc(), F.col("u"))
    wm = Window.orderBy(F.col("m").desc(), F.col("u"))
    t = int(n_tiles)
    tiled = per_u.select(
        "u",
        "f",
        "m",
        F.ntile(t).over(wr).alias("_tr"),
        F.ntile(t).over(wf).alias("_tf"),
        F.ntile(t).over(wm).alias("_tm"),
    )
    seg = F.concat_ws(
        "-",
        F.col("_tr").cast("string"),
        F.col("_tf").cast("string"),
        F.col("_tm").cast("string"),
    )
    return tiled.groupBy(seg.alias("segment")).agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.round(F.avg(F.col("f").cast("double")), round_to).alias(
            "avg_frequency"
        ),
        F.round(F.avg("m"), round_to).alias("avg_monetary"),
    )


def cohort_ltv(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    value_when=None,
    round_to: int = 6,
) -> DataFrame:
    """Weekly-cohort cumulative lifetime value: cohort = Monday-
    truncated week of a user's FIRST event; one row per (cohort_week,
    week_offset) with that week's revenue and the cumulative
    per-cohort-user LTV — the money-side twin of the retention-cohort
    triangle (retention counts who comes back; LTV accumulates what
    they're worth).

    ``value_when``: optional boolean Column gating which rows carry
    value (e.g. only purchases).

    Plan: ONE user-keyed aggregate derives (cohort, per-week revenue
    map is avoided — a second (user-week)-grain aggregate feeds the
    cohort rollup), then a (cohort, offset) aggregate + one cumulative
    window over that calendar-bounded frame.  Two data shuffles total,
    the q_retention_cohorts discipline.
    """
    wk = F.date_trunc("week", F.col(ts_col)).cast("date")
    v = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "double"
    )
    if value_when is not None:
        v = F.when(value_when, v).otherwise(F.lit(0.0))
    uw = df.groupBy(F.col(user_col).alias("u"), wk.alias("w")).agg(
        F.coalesce(F.sum(v), F.lit(0.0)).alias("rev")
    )
    per_u = uw.groupBy("u").agg(
        F.min("w").alias("cohort"),
        F.collect_list(F.struct("w", "rev")).alias("_weeks"),
    )
    cohort_sizes = per_u.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    exploded = per_u.select(
        "cohort", F.explode("_weeks").alias("_e")
    ).select(
        "cohort",
        F.floor(
            F.datediff(F.col("_e.w"), F.col("cohort")) / F.lit(7)
        ).cast("int").alias("week_offset"),
        F.col("_e.rev").alias("rev"),
    )
    co = exploded.groupBy("cohort", "week_offset").agg(
        F.sum("rev").alias("week_revenue")
    )
    wcum = Window.partitionBy("cohort").orderBy("week_offset").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        co.join(F.broadcast(cohort_sizes), "cohort")
        .select(
            "cohort",
            "week_offset",
            F.col("cohort_users").cast("long").alias("cohort_users"),
            F.round("week_revenue", round_to).alias("week_revenue"),
            F.round(
                F.sum("week_revenue").over(wcum)
                / F.col("cohort_users").cast("double"),
                round_to,
            ).alias("cum_ltv_per_user"),
        )
    )


def sbg_churn_projection(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    horizon: int = 8,
    round_to: int = 6,
) -> DataFrame:
    """Shifted-beta-geometric retention projection (Fader & Hardie
    2007): each user's weekly churn probability is a Beta(α, β) draw,
    which produces the flattening retention curves real cohorts show
    (a constant-rate geometric model systematically UNDER-projects
    long-horizon survival).  α and β come in CLOSED FORM from the
    first two pooled survival points — ``s = α+β = (1−ρ₂)/(ρ₂−S₁)``
    with ρ₂ = S₂/S₁, ``β = S₁·s`` — then the projection recursion
    ``Ŝ_k = Ŝ_{k−1}·(β+k−1)/(α+β+k−1)`` extrapolates to ``horizon``.

    Survival here: a user "survives" week k if they are active in ANY
    week ≥ k after their first week (the standard unbounded-recency
    convention, monotone by construction).

    Returns one row per week 1..horizon: ``week, s_observed (NULL past
    the data), s_projected, alpha, beta`` (projections NULL when the
    curve doesn't flatten — ρ₂ ≤ S₁ — or inputs degenerate).

    Plan: ONE user aggregate (first week + last-activity offset), one
    offset-histogram aggregate, survival via one reverse cumulative
    window over the ≤-weeks-sized frame; the α/β solve and recursion
    run on literals driver-side (the trained-params discipline of
    logistic_platt).
    """
    wk = F.date_trunc("week", F.col(ts_col)).cast("date")
    per_u = df.groupBy(F.col(user_col).alias("u")).agg(
        F.min(wk).alias("w0"), F.max(wk).alias("wl")
    )
    off = per_u.select(
        F.floor(
            F.datediff(F.col("wl"), F.col("w0")) / F.lit(7)
        ).cast("int").alias("last_off")
    )
    hist = off.groupBy("last_off").agg(
        F.count(F.lit(1)).alias("c")
    )
    rows = {int(r["last_off"]): int(r["c"]) for r in hist.collect()}
    n = sum(rows.values())
    spark = df.sparkSession
    schema = (
        "week int, s_observed double, s_projected double, "
        "alpha double, beta double"
    )
    if n == 0:
        return spark.createDataFrame([], schema)
    max_off = max(rows)
    # S_k = fraction of users whose last activity is at offset >= k
    surv = {}
    acc = 0
    for k in range(max_off, 0, -1):
        acc += rows.get(k, 0)
        surv[k] = acc / n
    s1 = surv.get(1)
    s2 = surv.get(2)
    alpha = beta = None
    proj = {}
    if s1 and s2 and s1 > 0:
        rho2 = s2 / s1
        if rho2 > s1 and rho2 < 1.0:
            s = (1.0 - rho2) / (rho2 - s1)
            beta = s1 * s
            alpha = s - beta
            if alpha > 0 and beta > 0:
                sk = 1.0
                for k in range(1, int(horizon) + 1):
                    sk = sk * (beta + k - 1) / (alpha + beta + k - 1)
                    proj[k] = sk
            else:
                alpha = beta = None
    out = []
    for k in range(1, int(horizon) + 1):
        out.append(
            (
                k,
                round(surv[k], round_to) if k in surv else None,
                round(proj[k], round_to) if k in proj else None,
                round(alpha, round_to) if alpha is not None else None,
                round(beta, round_to) if beta is not None else None,
            )
        )
    return spark.createDataFrame(out, schema)
