"""Serving-path unit tests (SURVEY.md §2.2 L2/L7)."""

from pyspark.sql import functions as F

from feature_store_spark.serving import batch_lookup, get_online_features


def test_batch_lookup_null_value_is_a_hit(spark):
    """A stored row whose value column is NULL is a HIT, not a miss —
    found must come from join presence, never from a value probe."""
    table = spark.createDataFrame(
        [(1, 10.0), (2, None)], "k int, v double"
    )
    ids = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    got = {
        r["k"]: (r["v"], r["found"])
        for r in batch_lookup(ids, table, ["k"]).collect()
    }
    assert got[1] == (10.0, True)
    assert got[2] == (None, True)  # present key, null value: a hit
    assert got[3] == (None, False)  # genuinely absent key


def test_fallback_chain_sources(spark):
    """Routing: vector hit > scalar assembly > MISS, with the mask and
    staleness contract intact on each path."""
    vectors = spark.createDataFrame(
        [(1, [1.0, 2.0], [False, False], [100, 200])],
        "entity_id int, values array<double>, is_default_mask array<boolean>,"
        " value_ages_ms array<bigint>",
    )
    scalars = spark.createDataFrame(
        [(2, "f_a", 7.0, "2024-01-02 00:00:00")],
        "entity_id int, feature_name string, value double, event_time string",
    ).withColumn("event_time", F.col("event_time").cast("timestamp"))
    ids = spark.createDataFrame([(1,), (2,), (3,)], "entity_id int")
    out = {
        r["entity_id"]: r
        for r in get_online_features(
            ids,
            vectors,
            scalars,
            ["f_a", "f_b"],
            defaults={"f_b": -1.0},
            now_ms=1704153600000,  # 2024-01-02T00:00:00Z in ms
        ).collect()
    }
    assert out[1]["source"] == "ROCKSDB_VECTOR"
    assert out[1]["values"] == [1.0, 2.0]
    assert out[2]["source"] == "SCALAR_ASSEMBLY"
    assert out[2]["values"] == [7.0, -1.0]
    assert out[2]["is_default_mask"] == [False, True]
    assert out[3]["source"] == "MISS"
    assert out[3]["values"] is None
