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
