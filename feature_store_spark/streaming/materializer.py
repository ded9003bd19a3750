"""Structured Streaming materializer (SURVEY.md §2.11).

The reference has no streaming engine — REALTIME update frequencies
are metadata enforced at read time. The natural Spark upgrade: a
``readStream`` over the feature-record stream, watermarked on
event_time, materialized per micro-batch with ``foreachBatch`` (which
would be a Delta MERGE in production; here a last-writer-wins upsert
into an in-memory/parquet table).

Late data needs no special handling downstream: the ASOF semantics
(J1) place a late row correctly by its event_time, and the online
upsert is keyed last-writer-wins on (entity, feature) by event_time,
so a late row never overwrites a newer value.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def windowed_stats_stream(
    stream: DataFrame,
    entity_col: str = "entity_id",
    name_col: str = "feature_name",
    value_col: str = "value_float",
    time_col: str = "event_time",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window per-feature stats over a stream — the streaming
    twin of stats.feature_stats (count/mean/min/max per window).
    Watermark bounds state; late rows beyond it are dropped by Spark's
    contract."""
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(F.window(F.col(time_col), window), F.col(name_col))
        .agg(
            F.count(F.lit(1)).alias("count"),
            F.avg(value_col).alias("mean"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
    )


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join: every micro-batch hash-joins the
    static dimension — the online feature-decoration path (each event
    picks up its entity's attributes in flight). Spark re-plans the
    static side per micro-batch, so a dim refreshed between batches is
    picked up without restarting the query. ``broadcast_dim`` hints
    the usual small-dim case (no shuffle on the stream side at all);
    drop it for a dim too big to broadcast and the join degrades to a
    shuffled hash join per batch with identical semantics."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, list(keys), how)


def latest_upsert_batch(
    batch: DataFrame,
    existing: DataFrame | None,
    key_cols: Sequence[str] = ("entity_id", "feature_name"),
    time_col: str = "event_time",
) -> DataFrame:
    """Per-micro-batch last-writer-wins upsert (the foreachBatch body;
    Delta MERGE in production). Pure function for testability."""
    from feature_store_spark.operators.reshape import latest_per_key

    unioned = batch if existing is None else existing.unionByName(batch)
    return latest_per_key(unioned, list(key_cols), time_col)


def start_materializer(
    stream: DataFrame,
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    trigger_seconds: int = 10,
) -> StreamingQuery:
    """Wire a stream into foreachBatch materialization."""
    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
