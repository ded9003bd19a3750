"""Stream-stream event-time joins: attribution of conversion events
to the preceding exposure events of the same entity within a time
window — the click/view → purchase credit assignment a serving
pipeline computes live.

This is the one join shape Structured Streaming executes with state
on BOTH sides: each side buffers rows in the state store keyed by the
equi-join key, matches emit in the micro-batch where both rows have
arrived (inner-join results are never held back by the watermark),
and the watermark + time-range constraint bound how long either side
is retained — without them the join state grows forever. State per
key is the entity's in-window exposure rows, the same bound a batch
interval join would replicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribute_stream(
    exposures: DataFrame,
    conversions: DataFrame,
    window: str = "1 hour",
    entity_col: str = "user_id",
    time_col: str = "ts",
    id_col: str = "event_id",
    watermark: str = "2 hours",
) -> DataFrame:
    """Join each conversion to every exposure of the same entity in
    the preceding ``window`` (exclusive of simultaneous events):
    ``conv.ts > exp.ts AND conv.ts <= exp.ts + window``. Returns
    (entity, exposure id/ts, conversion id/ts) rows.

    Both inputs may be streaming DataFrames; both get the same
    event-time watermark so Spark can evict matched/expired state.
    The range predicate is the state-cleanup contract: exposures
    older than ``watermark + window`` below the event-time high-water
    mark are dropped from the store.
    """
    e = (
        exposures.withWatermark(time_col, watermark)
        .select(
            F.col(entity_col).alias("entity_id"),
            F.col(id_col).alias("exposure_id"),
            F.col(time_col).alias("exposure_ts"),
        )
    )
    c = (
        conversions.withWatermark(time_col, watermark)
        .select(
            F.col(entity_col).alias("c_entity_id"),
            F.col(id_col).alias("conversion_id"),
            F.col(time_col).alias("conversion_ts"),
        )
    )
    cond = (
        (F.col("entity_id") == F.col("c_entity_id"))
        & (F.col("conversion_ts") > F.col("exposure_ts"))
        & (
            F.col("conversion_ts")
            <= F.col("exposure_ts") + F.expr(f"INTERVAL {window}")
        )
    )
    return e.join(c, cond, "inner").select(
        "entity_id",
        "exposure_id",
        "exposure_ts",
        "conversion_id",
        "conversion_ts",
    )
