"""Time-decayed feature aggregates: half-life decayed sums/counts and
per-entity EWMA — the decayed-counter family every feature platform
grows ("clicks with a 7-day half-life"), missing from both the
reference and stock Spark.

Two different computational shapes on purpose:

- ``time_decayed_sum`` — decay against a FIXED reference time makes
  the weighted sum fully associative: ``w(t) = 0.5^((ref - t)/hl)`` is
  row-local, so the whole thing is ONE groupBy with map-side partial
  aggregation, pure codegen. This is the form to materialize at
  100 TB (refresh = recompute with a new ref, or multiply the stored
  sum by the elapsed-decay factor and add the delta — the standard
  incremental-maintenance identity ``S(ref') = S(ref)·0.5^((ref'-ref)/hl)
  + Σ_new``).
- ``ewma_by_key`` — the event-weighted recursion ``s ← β·s + α·x`` is
  NOT associative, so it cannot partial-aggregate. It runs as a
  per-key sorted array fold (``sort_array(collect_list(...))`` +
  ``F.aggregate``) — sequential semantics made explicit, still
  JVM-side, one shuffle. Per-key state is that key's event count;
  for hot keys at 100 TB pre-aggregate per (key, coarse bucket) or
  switch to the associative half-life form above, which is the same
  smoother parameterized by time instead of event count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_decayed_sum(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    half_life: str = "7 days",
    ref_ts=None,
) -> DataFrame:
    """Half-life-decayed sum and count per key:
    ``Σ v·0.5^(Δt/half_life)`` / ``Σ 0.5^(Δt/half_life)`` with Δt
    measured back from ``ref_ts`` (default: the global max event time,
    broadcast as a 1-row frame so the plan stays fully declarative).

    ``half_life`` is a DAY-TIME SQL interval string ('7 days',
    '36 hours', '90 minutes'...). Year-month units are REJECTED
    loudly (ADVICE r4): a month has no fixed physical length — its
    microsecond value would depend on which month, and measuring it
    from the 1970 epoch makes it session-timezone-dependent when a
    DST transition falls inside (e.g. Chile, Jan 1970). A half-life
    is a physical decay constant; spell it in fixed units
    ('30 days', not '1 month'). One scan + one key-local aggregate;
    the weights are row-local so partial aggregation applies.
    """
    lowered = half_life.lower()
    if any(u in lowered for u in ("year", "month")):
        raise ValueError(
            f"time_decayed_sum: half_life {half_life!r} uses year-month "
            "interval units, which have no fixed length (and are "
            "DST/timezone-dependent when measured from the epoch). Use "
            "day-time units: '30 days', '720 hours', ..."
        )
    t = F.col(ts_col)
    if ref_ts is None:
        ref = df.agg(F.max(t).alias("__ref"))
        base = df.crossJoin(F.broadcast(ref))
    else:
        base = df.withColumn("__ref", F.lit(ref_ts).cast("timestamp"))
    # interval length in microseconds, timezone-free: the difference of
    # two unix_micros cancels the session-tz offset baked into the
    # parsed epoch literal (ADVICE r3: unix_micros(epoch + INTERVAL)
    # alone is tz_offset + interval in any non-UTC session)
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp")
    hl_us = F.unix_micros(
        epoch + F.expr(f"INTERVAL {half_life}")
    ) - F.unix_micros(epoch)
    age = (F.unix_micros(F.col("__ref")) - F.unix_micros(t)).cast("double")
    w = F.pow(F.lit(0.5), age / hl_us.cast("double"))
    return base.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col(value_col) * w), 6).alias("decayed_sum"),
        F.round(F.sum(w), 6).alias("decayed_count"),
    )


def ewma_by_key(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    alpha: float,
    beta: float | None = None,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Event-ordered EWMA per key: ``s₁ = x₁; sᵢ = β·sᵢ₋₁ + α·xᵢ`` over
    events sorted by (ts, tiebreaks). Pass ``beta`` explicitly when an
    oracle must reproduce the fold bit-for-bit (``1 - alpha`` is not
    exact in binary for most alphas).

    ONE shuffle: collect each key's (ts, tiebreak..., value) structs,
    sort the array (deterministic total order), fold with
    ``F.aggregate`` — sequential float ops identical to DuckDB's
    ``list_reduce``, so results hash-match without tolerance.
    """
    if beta is None:
        beta = 1.0 - alpha
    order_fields = [F.col(ts_col).alias("__t")] + [
        F.col(c).alias(f"__tb{i}") for i, c in enumerate(tiebreak_cols)
    ]
    struct = F.struct(
        *order_fields, F.col(value_col).cast("double").alias("__v")
    )
    per_key = df.groupBy(*key_cols).agg(
        F.sort_array(F.collect_list(struct)).alias("__arr")
    )
    vals = F.col("__arr").getField("__v")
    ewma = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda s, x: F.lit(beta) * s + F.lit(alpha) * x,
    )
    return per_key.select(
        *key_cols,
        F.size("__arr").alias("n_events"),
        F.round(ewma, 6).alias("ewma"),
    )
