"""Sessionization: split an entity's event stream into sessions at
inactivity gaps.

The reference has no streaming engine (SURVEY.md §2.11); this is the
batch expression of the stateful session operator a Structured
Streaming materializer would run with ``applyInPandasWithState``. In
batch it is two window passes over one shuffle: gap flag via ``lag``,
session id via running sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    entity_col: str = "user_id",
    time_col: str = "ts",
    gap_minutes: float = 30.0,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign 1-based per-entity session ids; a new session starts when
    the gap to the previous event exceeds ``gap_minutes``."""
    gap_us = int(gap_minutes * 60 * 1_000_000)
    # a NULL timestamp cannot be sessionized: nulls sort first under
    # asc, so each used to mint a phantom singleton session and SHIFT
    # every real session id for the entity (review r10m) — excluded,
    # like every time-keyed operator treats timeless rows
    events = events.filter(F.col(time_col).isNotNull())
    t = F.unix_micros(F.col(time_col))
    # Tie order within identical timestamps cannot move a session
    # boundary (gap 0), so ordering by time alone stays deterministic.
    w = Window.partitionBy(entity_col).orderBy(t)
    new_session = (
        (t - F.lag(t).over(w)).isNull() | ((t - F.lag(t).over(w)) > gap_us)
    ).cast("int")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn("__new", new_session).withColumn(
        session_col, F.sum("__new").over(running)
    ).drop("__new")


def session_stats(
    events: DataFrame,
    entity_col: str = "user_id",
    time_col: str = "ts",
    value_col: str = "value",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Per-session aggregates: event count, value sum, duration seconds."""
    s = sessionize(events, entity_col, time_col, gap_minutes)
    t = F.unix_micros(F.col(time_col))
    return s.groupBy(entity_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(value_col).alias("value_sum"),
        (
            (F.max(t) - F.min(t)) / F.lit(1_000_000.0)
        ).alias("duration_sec"),
        F.min(time_col).alias("session_start"),
    )
