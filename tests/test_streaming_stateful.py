"""End-to-end Structured Streaming execution tests: file source ->
stateful sessionization / windowed stats -> memory sink. These run the
real streaming engine (micro-batch, state store, watermark), not just
plan analysis."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from feature_store_spark.operators.sessionize import session_stats
from feature_store_spark.streaming.materializer import windowed_stats_stream
from feature_store_spark.streaming.stateful import sessionize_stream

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _write_events(spark, path):
    rows = [
        # user 1: session A (0s, 10s) closed by 1990s gap; session B open
        (1, BASE, 1.0),
        (1, BASE + dt.timedelta(seconds=10), 2.0),
        (1, BASE + dt.timedelta(seconds=2000), 4.0),
        (1, BASE + dt.timedelta(seconds=2010), 8.0),
        # user 2: one open session only -> nothing emitted by the gap rule
        (2, BASE, 16.0),
        (2, BASE + dt.timedelta(seconds=5), 32.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return df


def test_sessionize_stream_end_to_end(spark, tmp_path):
    inp = str(tmp_path / "events_in")
    batch_df = _write_events(spark, inp)

    stream = spark.readStream.schema(
        "user_id long, ts timestamp, value double"
    ).parquet(inp)
    out = sessionize_stream(
        stream, gap_seconds=1800, watermark="0 seconds"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sess_e2e")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["entity_id"], r["n_events"], r["value_sum"])
        for r in spark.sql("select * from sess_e2e").collect()
    }
    # session A closes via the in-batch gap; user 2's session closes via
    # EventTimeTimeout once the global watermark (2010s) passes its
    # last+gap (1805s). User 1's session B (last=2010s, timeout 3810s)
    # stays open in state — not emitted.
    assert got == {(1, 2, 3.0), (2, 2, 48.0)}

    # differential vs the batch twin: the closed streaming session must
    # appear among batch sessions with identical aggregates
    batch_sessions = {
        (r["user_id"], r["n_events"], r["value_sum"])
        for r in session_stats(batch_df, gap_minutes=30.0).collect()
    }
    assert got <= batch_sessions


def test_windowed_stats_stream_end_to_end(spark, tmp_path):
    inp = str(tmp_path / "eav_in")
    rows = [
        ("e1", "gmv", 10.0, BASE + dt.timedelta(minutes=5)),
        ("e1", "gmv", 20.0, BASE + dt.timedelta(minutes=20)),
        ("e2", "gmv", 30.0, BASE + dt.timedelta(minutes=70)),
        ("e2", "txn", 1.0, BASE + dt.timedelta(minutes=75)),
    ]
    spark.createDataFrame(
        rows,
        "entity_id string, feature_name string, value_float double, event_time timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(inp)

    stream = spark.readStream.schema(
        "entity_id string, feature_name string, value_float double, event_time timestamp"
    ).parquet(inp)
    out = windowed_stats_stream(stream, window="1 hour", watermark="1 minute")
    q = (
        out.writeStream.format("memory")
        .queryName("wstats_e2e")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["window"]["start"].hour, r["feature_name"]): (r["count"], r["mean"])
        for r in spark.sql("select * from wstats_e2e").collect()
    }
    assert got[(0, "gmv")] == (2, 15.0)
    assert got[(1, "gmv")] == (1, 30.0)
    assert got[(1, "txn")] == (1, 1.0)


def test_watermark_drops_late_rows_append_mode(spark, tmp_path):
    """Late-data contract, exercised across three micro-batches: the
    hour-0 window is evicted + emitted once the watermark (advanced by
    batch 1's hour-3 row) takes effect; a later micro-batch carrying an
    hour-0 straggler is dropped by the watermark — the closed window is
    emitted exactly once and never reopened. (Watermark filtering
    lags one batch behind the advancing row by design — the watermark
    is committed at batch end — hence three batches, not two.)"""
    import time

    inp = tmp_path / "late_in"
    inp.mkdir()
    schema = "entity_id string, feature_name string, value_float double, event_time timestamp"

    batches = [
        # batch 0: two hour-0 rows + an hour-3 row advancing the watermark
        [
            ("e1", "gmv", 10.0, BASE + dt.timedelta(minutes=5)),
            ("e1", "gmv", 30.0, BASE + dt.timedelta(minutes=10)),
            ("e1", "gmv", 99.0, BASE + dt.timedelta(hours=3)),
        ],
        # batch 1: on-time row; hour-0 state evicted this batch
        [("e1", "gmv", 50.0, BASE + dt.timedelta(hours=3, minutes=10))],
        # batch 2: hour-0 STRAGGLER, far behind the watermark -> dropped
        [("e1", "gmv", 1000.0, BASE + dt.timedelta(minutes=15))],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(inp / f"b{i}")
        )
        time.sleep(1.1)  # file mtimes order the micro-batches

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(inp / "*"))
    )
    out = windowed_stats_stream(stream, window="1 hour", watermark="1 minute")
    q = (
        out.writeStream.format("memory")
        .queryName("late_e2e")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_late"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    dropped = sum(
        so.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for so in p["stateOperators"]
    )
    rows = [
        (r["window"]["start"].hour, r["count"], r["mean"])
        for r in spark.sql("select * from late_e2e").collect()
    ]
    hour0 = [r for r in rows if r[0] == 0]
    # exactly ONE hour-0 emission, with only the on-time rows
    assert hour0 == [(0, 2, 20.0)], rows
    assert dropped == 1


def test_attribution_watermark_boundary_drops_straggler(spark, tmp_path):
    """r3 verdict #10: the stream-stream attribution join's late-data
    contract, pinned the way test_watermark_drops_late_rows does for
    windowed_stats. A view that arrives in a later micro-batch, far
    behind the committed watermark, must be DROPPED: it produces no
    attribution row even though a naive batch interval join over all
    rows WOULD match it to an earlier purchase — and the stream result
    must equal the batch oracle computed over the rows minus the
    dropped straggler."""
    import time

    from feature_store_spark.streaming.joins import attribute_stream

    inp = tmp_path / "attr_in"
    inp.mkdir()
    schema = "user_id long, event_type string, ts timestamp, event_id long"
    v = lambda eid, mins: (1, "view", BASE + dt.timedelta(minutes=mins), eid)  # noqa: E731
    p = lambda eid, mins: (1, "purchase", BASE + dt.timedelta(minutes=mins), eid)  # noqa: E731

    batches = [
        # batch 0: an on-time view->purchase pair, plus a far-future
        # view that advances the watermark past hour 0
        [v(10, 5), p(20, 30), v(11, 360)],
        # batch 1: on-time purchase matching the hour-6 view;
        # hour-0 watermark (05:59) committed after this batch
        [p(21, 370)],
        # batch 2: STRAGGLER view at 00:10 — behind the watermark.
        # A batch join would attribute purchase 20 (00:30) to it.
        [v(12, 10)],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(inp / f"b{i}")
        )
        time.sleep(1.1)  # file mtimes order the micro-batches

    def side(kind):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(inp / "*"))
            .filter(F.col("event_type") == kind)
        )

    out = attribute_stream(
        side("view"), side("purchase"), window="1 hour", watermark="1 minute"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("attr_boundary")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_attr"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    dropped = sum(
        so.get("numRowsDroppedByWatermark", 0)
        for prog in q.recentProgress
        for so in prog["stateOperators"]
    )
    got = sorted(
        (r["exposure_id"], r["conversion_id"])
        for r in spark.sql("select * from attr_boundary").collect()
    )

    # batch oracle over ALL rows: the straggler view 12 WOULD match
    all_rows = [r for b in batches for r in b]
    df = spark.createDataFrame(all_rows, schema)
    views = df.filter(F.col("event_type") == "view")
    buys = df.filter(F.col("event_type") == "purchase")
    naive = sorted(
        (r["exposure_id"], r["conversion_id"])
        for r in attribute_stream(
            views, buys, window="1 hour", watermark="1 minute"
        ).collect()
    )
    assert (12, 20) in naive  # the straggler's would-be attribution
    # batch oracle minus the dropped straggler == the stream result
    on_time = sorted(pair for pair in naive if pair[0] != 12)
    assert got == on_time == [(10, 20), (11, 21)], (got, naive)
    assert dropped >= 1  # the straggler was dropped BY THE WATERMARK


def test_sessionize_stream_out_of_order_across_batches(spark, tmp_path):
    """A late-but-within-watermark event delivered in a LATER
    micro-batch must not rewind the open session's end: the closed
    session's span and aggregates must match the batch twin's global
    sort. (Regression: the merge branch assigned last = t instead of
    clamping, so the straggler rewound session_end and made the next
    on-time event falsely split the session.)"""
    import time

    inp = tmp_path / "ooo_in"
    inp.mkdir()
    schema = "user_id long, ts timestamp, value double"
    batches = [
        # batch 0: session spanning 0s..100s
        [
            (1, BASE, 1.0),
            (1, BASE + dt.timedelta(seconds=100), 2.0),
        ],
        # batch 1: straggler INSIDE the open session (t=50s < last=100s)
        [(1, BASE + dt.timedelta(seconds=50), 4.0)],
        # batch 2: far-future event -> closes the session by gap
        [(1, BASE + dt.timedelta(seconds=5000), 8.0)],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(inp / f"b{i}")
        )
        time.sleep(1.1)  # file mtimes order the micro-batches

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(inp / "*"))
    )
    # watermark LARGER than the disorder so the straggler is admitted
    out = sessionize_stream(stream, gap_seconds=1800, watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_ooo")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ooo"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = [
        (r["session_start"], r["session_end"], r["n_events"], r["value_sum"])
        for r in spark.sql("select * from sess_ooo").collect()
    ]
    assert got == [
        (BASE, BASE + dt.timedelta(seconds=100), 3, 7.0)
    ], got

    # batch twin agreement on the closed session
    all_rows = [r for b in batches for r in b]
    batch_sessions = {
        (r["n_events"], r["value_sum"])
        for r in session_stats(
            spark.createDataFrame(all_rows, schema), gap_minutes=30.0
        ).collect()
    }
    assert (3, 7.0) in batch_sessions


def test_sessionize_stream_string_entity(spark, tmp_path):
    """Review r10: the output entity column must carry the INPUT
    column's type — a string entity used to crash int(key) inside the
    pandas UDF on the first emitted session."""
    inp = str(tmp_path / "str_in")
    rows = [
        ("alice", BASE, 1.0),
        ("alice", BASE + dt.timedelta(seconds=10), 2.0),
        # gap > 30 min closes session A in-batch
        ("alice", BASE + dt.timedelta(seconds=4000), 4.0),
    ]
    spark.createDataFrame(
        rows, "token string, ts timestamp, value double"
    ).coalesce(1).write.mode("overwrite").parquet(inp)
    stream = spark.readStream.schema(
        "token string, ts timestamp, value double"
    ).parquet(inp)
    out = sessionize_stream(
        stream, entity_col="token", gap_seconds=1800, watermark="1 minute"
    )
    assert dict(out.dtypes)["entity_id"] == "string"
    q = (
        out.writeStream.format("memory")
        .queryName("sess_str")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_str"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["entity_id"], r["n_events"], r["value_sum"])
        for r in spark.sql("select * from sess_str").collect()
    }
    assert got == {("alice", 2, 3.0)}


def test_windowed_stats_per_entity_grouping(spark, tmp_path):
    """Review r10: entity_col used to be accepted and silently
    ignored — per-entity stats must actually group by the entity."""
    inp = str(tmp_path / "ent_in")
    rows = [
        ("e1", "gmv", 10.0, BASE + dt.timedelta(minutes=5)),
        ("e1", "gmv", 30.0, BASE + dt.timedelta(minutes=10)),
        ("e2", "gmv", 100.0, BASE + dt.timedelta(minutes=15)),
    ]
    spark.createDataFrame(
        rows,
        "entity_id string, feature_name string, value_float double, "
        "event_time timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(inp)
    stream = spark.readStream.schema(
        "entity_id string, feature_name string, value_float double, "
        "event_time timestamp"
    ).parquet(inp)
    out = windowed_stats_stream(
        stream, entity_col="entity_id", window="1 hour",
        watermark="1 minute",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("wstats_ent")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_ent"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["entity_id"], r["feature_name"]): (r["count"], r["mean"])
        for r in spark.sql("select * from wstats_ent").collect()
    }
    assert got[("e1", "gmv")] == (2, 20.0)
    assert got[("e2", "gmv")] == (1, 100.0)


def test_late_event_bridges_gap_closed_sessions(spark, tmp_path):
    """Review r10e #1: a late-but-within-watermark event from a LATER
    micro-batch can bridge two sessions the earlier batch's in-batch
    gap already separated. The r9 design emitted the first session
    eagerly and could never merge it back; watermark-driven emission
    holds it in state until no admissible event can touch it."""
    import time

    inp = tmp_path / "bridge_in"
    inp.mkdir()
    schema = "user_id long, ts timestamp, value double"
    batches = [
        # batch 0: t=0 and t=2000s — in-batch gap (1800s) splits them
        [
            (1, BASE, 1.0),
            (1, BASE + dt.timedelta(seconds=2000), 2.0),
        ],
        # batch 1: straggler at t=1500s (>= watermark 2000-1000=1000s)
        # bridges the two fragments into ONE session
        [(1, BASE + dt.timedelta(seconds=1500), 4.0)],
        # batch 2: far-future event pushes the watermark past the
        # merged session's deadline so it emits
        [(1, BASE + dt.timedelta(seconds=50_000), 8.0)],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(inp / f"b{i}")
        )
        time.sleep(1.1)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(inp / "*"))
    )
    out = sessionize_stream(
        stream, gap_seconds=1800, watermark="1000 seconds"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sess_bridge")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_bridge"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = [
        (r["session_start"], r["session_end"], r["n_events"], r["value_sum"])
        for r in spark.sql("select * from sess_bridge").collect()
    ]
    assert got == [
        (BASE, BASE + dt.timedelta(seconds=2000), 3, 7.0)
    ], got
    # batch twin agreement
    all_rows = [r for b in batches for r in b]
    batch_sessions = {
        (r["n_events"], r["value_sum"])
        for r in session_stats(
            spark.createDataFrame(all_rows, schema), gap_minutes=30.0
        ).collect()
    }
    assert (3, 7.0) in batch_sessions


def test_null_values_do_not_poison_value_sum(spark, tmp_path):
    """Review r10e #2: NULL values must not turn value_sum into NaN —
    F.sum skips NULLs in the batch twin; n_events still counts every
    event (count(*))."""
    inp = str(tmp_path / "null_in")
    rows = [
        (1, BASE, 5.0),
        (1, BASE + dt.timedelta(seconds=10), None),
        (1, BASE + dt.timedelta(seconds=20), 3.0),
        # closes the session via watermark (0s) at max ts
        (1, BASE + dt.timedelta(seconds=50_000), 1.0),
    ]
    spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    ).coalesce(1).write.mode("overwrite").parquet(inp)
    stream = spark.readStream.schema(
        "user_id long, ts timestamp, value double"
    ).parquet(inp)
    out = sessionize_stream(stream, gap_seconds=1800, watermark="0 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_null")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_null"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = [
        (r["n_events"], r["value_sum"])
        for r in spark.sql("select * from sess_null").collect()
    ]
    assert got == [(3, 8.0)], got
