"""Time-windowed aggregation features ("count of events in the last N
days") — the canonical feature-store materialization op (the reference
precomputes these in pandas, e.g. ``gmv_30d`` / ``txn_count_30d``,
python/gbdt_example/dataset.py:61-100; we compute them at query time
over the raw event stream).

Two physical strategies, same semantics (window = [t - w, t) — lower
bound inclusive, anchor exclusive):

- :func:`windowed_features_self` — when the anchor rows ARE events of
  the same stream, a single RANGE window over ``unix_micros(ts)``:
  one shuffle by entity, no join at all. This is the plan you want at
  100 TB.
- :func:`windowed_features_join` — for external anchor rows, an
  equi-join on (entity, time_bucket) with residual range predicate:
  each anchor joins only ceil(w/bucket)+1 buckets of history instead
  of the entity's whole history, so the fan-out is bounded and the
  join stays an equi-join (shuffle-hash/SMJ-able, AQE-skew-splittable)
  rather than a pure range join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

US_PER_DAY = 86_400_000_000


def windowed_features_self(
    events: DataFrame,
    entity_col: str = "user_id",
    time_col: str = "ts",
    value_col: str = "value",
    window_days: float = 7.0,
) -> DataFrame:
    """Attach trailing-window aggregates to every event row.

    Window per row = events of the same entity with
    ``t - window <= ts < t`` (microsecond precision). Implemented as a
    RANGE frame over ``unix_micros`` — one shuffle, whole-stage codegen
    end to end, no Python.

    ``w_count`` counts rows with a NON-NULL ``value_col`` (SQL
    ``count(col)``), matching :func:`windowed_features_join` — whose
    count must ride the value column so an empty window reads as zero
    through the left join. For a count of ALL events regardless of
    value, add a ``count(lit(1))`` window alongside.
    """
    window_us = int(window_days * US_PER_DAY)
    w = (
        Window.partitionBy(entity_col)
        .orderBy(F.unix_micros(F.col(time_col)))
        .rangeBetween(-window_us, -1)
    )
    return events.select(
        "*",
        F.count(F.col(value_col)).over(w).alias("w_count"),
        F.sum(F.col(value_col)).over(w).alias("w_sum"),
        F.avg(F.col(value_col)).over(w).alias("w_avg"),
        F.min(F.col(value_col)).over(w).alias("w_min"),
        F.max(F.col(value_col)).over(w).alias("w_max"),
    )


def windowed_features_join(
    anchors: DataFrame,
    events: DataFrame,
    entity_col: str = "user_id",
    anchor_time_col: str = "ts",
    event_time_col: str = "ts",
    value_col: str = "value",
    window_days: float = 7.0,
    bucket_days: float | None = None,
) -> DataFrame:
    """Trailing-window aggregates for arbitrary anchor rows via a
    bucketed equi-join.

    Both sides get ``time_bucket = floor(unix_micros / bucket)``; each
    anchor is exploded to the buckets its window can touch; the join is
    then an equi-join on (entity, bucket) with the exact range check as
    a residual filter. Bucket defaults to the window size, so each
    anchor touches at most 2 buckets.

    The final re-aggregate groups by ALL anchor columns, so byte-
    identical duplicate anchor rows collapse into one output row
    (their aggregates are identical anyway) — carry a unique id
    column if you need one row back per input row.
    """
    window_us = int(window_days * US_PER_DAY)
    bucket_us = int((bucket_days or window_days) * US_PER_DAY)

    ev = events.select(
        F.col(entity_col).alias("__e"),
        F.unix_micros(F.col(event_time_col)).alias("__t"),
        F.col(value_col).alias("__v"),
    ).withColumn("__bucket", F.floor(F.col("__t") / bucket_us))

    anc = anchors.withColumn("__at", F.unix_micros(F.col(anchor_time_col)))
    # explode_outer, not explode (review r10): a NULL anchor timestamp
    # makes the bucket sequence NULL, and plain explode silently
    # DELETED the anchor row — the left-join design promises every
    # anchor an output row; a null-time anchor keeps its row with
    # w_count = 0 and null aggregates (it can match no events), so
    # input and output row counts reconcile
    anc_exploded = anc.withColumn(
        "__bucket",
        F.explode_outer(
            F.sequence(
                F.floor((F.col("__at") - window_us) / bucket_us),
                F.floor(F.col("__at") / bucket_us),
            )
        ),
    )

    joined = anc_exploded.join(
        ev,
        (anc_exploded[entity_col] == ev["__e"])
        & (anc_exploded["__bucket"] == ev["__bucket"])
        & (ev["__t"] >= anc_exploded["__at"] - window_us)
        & (ev["__t"] < anc_exploded["__at"]),
        "left",
    )
    out = joined.groupBy(*[anc_exploded[c] for c in anchors.columns]).agg(
        F.count("__v").alias("w_count"),
        F.sum("__v").alias("w_sum"),
        F.avg("__v").alias("w_avg"),
        F.min("__v").alias("w_min"),
        F.max("__v").alias("w_max"),
    )
    return out
