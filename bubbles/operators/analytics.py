"""Sequential funnel and cohort-retention analytics over events.

Product-analytics staples re-expressed as single-declarative-plan
Spark queries (the reference engine's event surface stops at
windowed aggregation — streaming/events.py; these are the two
next-most-asked questions of an events table).

``funnel_counts`` — users advancing through an ordered step sequence
(signup → view → click → purchase …).  Semantics are the greedy
sequential-min funnel: t₀ = first step-0 event; tₖ = first step-k
event at or after tₖ₋₁; a user reaches step k iff tₖ exists.  The
whole walk happens in ONE shuffle: sort each user's funnel events by
(ts, step_ord) and fold them through a single ``F.aggregate`` lambda
whose accumulator is the number of completed steps — an event
advances the walk iff its step ordinal equals the accumulator.  The
fold is provably the sequential-min funnel (equal timestamps sort
the earlier step first, and ``>=`` admits same-instant advancement),
costs O(events-per-user), and — deliberately — is NOT the chained
``array_min(filter(ts_k, x -> x >= t_{k-1}))`` formulation: Catalyst
inlines each chained alias into the next lambda and re-evaluates it
per element, going O(∏ per-step list sizes) per user (the
higher-order-lambda inlining trap documented for
winnow_fingerprints).  No UDF, no iterative joins (the textbook
k-self-join funnel shuffles k times; this shuffles once).
Timestamps compare as exact integer microseconds, and the DuckDB
twin uses the INDEPENDENT sequential-min formulation (lateral
list_min/list_filter chain) — hash-equality of two different
formulations is a stronger check than twin-of-the-same-shape.

Scale: one hash exchange on user_id; per-user state is the user's
own event timestamps (bounded by per-user activity, the same
assumption every sessionizer here makes).  The final step-count
reduce is a single row.

``cohort_retention`` — the (cohort week × week offset → active
users) triangle.  One aggregation per user (min week + distinct
active weeks via collect_set), explode the bounded per-user week
set, then a tiny (cohort, offset) count.  Two exchanges, the second
over at most weeks² keys.  Weeks are exact integer division of
microseconds (``ts_us div 604800000000``), so the twin matches
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

WEEK_US = 7 * 86_400 * 1_000_000


def funnel_counts(
    events: DataFrame,
    steps: list,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
) -> DataFrame:
    """(step_ord, step, n_users) — users whose greedy sequential walk
    reaches each step.  ``ts_col`` must be an integer column (epoch
    microseconds from ``read_events_batch``)."""
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError(f"duplicate steps: {steps}")

    # step ordinal: a len(steps)-branch CASE — driver-bounded (a
    # funnel has a handful of steps; the 1500-literal create_map
    # planning hazard does not apply at this size)
    ord_expr = F.lit(None).cast("int")
    for i, s in reversed(list(enumerate(steps))):
        ord_expr = F.when(F.col(type_col) == s, F.lit(i)).otherwise(ord_expr)

    walked = (
        events.filter(F.col(type_col).isin(list(steps)))
        .select(
            F.col(user_col),
            F.struct(
                F.col(ts_col).alias("ts"), ord_expr.alias("o")
            ).alias("ev"),
        )
        .groupBy(user_col)
        .agg(F.sort_array(F.collect_list("ev")).alias("evs"))
        .select(
            F.aggregate(
                "evs",
                F.lit(0),
                lambda acc, e: F.when(e["o"] == acc, acc + 1).otherwise(acc),
            ).alias("reached")
        )
    )
    agg = walked.agg(
        *[
            F.count(F.when(F.col("reached") >= i + 1, 1)).alias(f"n_{i}")
            for i in range(len(steps))
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("step_ord"),
                F.lit(s).alias("step"),
                F.col(f"n_{i}").alias("n_users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return agg.select(F.explode(rows).alias("r")).select(
        "r.step_ord", "r.step", "r.n_users"
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    period_us: int = WEEK_US,
) -> DataFrame:
    """(cohort_week, week_offset, n_users): users first seen in
    cohort_week who were active period offset weeks later."""
    wk = F.expr(f"{ts_col} div {period_us}")
    per_user = (
        events.select(F.col(user_col), wk.alias("wk"))
        .groupBy(user_col)
        .agg(F.min("wk").alias("cohort"), F.collect_set("wk").alias("weeks"))
    )
    return (
        per_user.select(
            F.col(user_col), "cohort", F.explode("weeks").alias("wk")
        )
        .groupBy(
            F.col("cohort").alias("cohort_week"),
            (F.col("wk") - F.col("cohort")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


DAY_US = 86_400 * 1_000_000


def active_users(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    window_days: int = 7,
    period_us: int = DAY_US,
) -> DataFrame:
    """(day, n_dau, n_wau): exact daily active users and exact
    trailing-``window_days`` active users per observed day.

    Rolling COUNT(DISTINCT) does not decompose into a window frame
    (distinct is not subtractable), and the textbook range join
    (days x events ON day BETWEEN d-6 AND d) is a non-equi join Spark
    plans as a broadcast nested loop.  Instead each (user, day)
    activity row fans out to the ``window_days`` trailing windows it
    contributes to (``explode(sequence(day, day+w-1))``) — a bounded
    w-times fan-out — and each window is then a plain two-phase
    count(DISTINCT user) keyed on day: equi-shuffles only, map-side
    partials, no window functions, no range join.  Days are exact
    integer division of epoch microseconds, so the DuckDB twin (which
    USES the range-join formulation — an independent shape) matches
    bit-for-bit.  Only days observed in the data are emitted.

    Scale: |distinct (user, day)| <= |events|; the fan-out multiplies
    that by w (7 by default) before the partial agg absorbs it.  A
    viral day is just a hot day key in a sum agg — skew-safe.
    """
    day = F.expr(f"{ts_col} div {period_us}")
    per = events.select(F.col(user_col).alias("u"), day.alias("day")).distinct()
    dau = per.groupBy("day").agg(F.count(F.lit(1)).alias("n_dau"))
    wau = (
        per.select(
            "u",
            F.explode(
                F.sequence(
                    F.col("day"), F.col("day") + F.lit(window_days - 1)
                )
            ).alias("day"),
        )
        .groupBy("day")
        .agg(F.count_distinct("u").alias("n_wau"))
    )
    return dau.join(wau, "day")
