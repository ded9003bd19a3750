"""Bucketed storage: correctness (same answers as plain join) AND the
plan property that justifies it at 100 TB — ZERO exchanges on the
bucketed key for joins and aggregations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from feature_store_spark.session import load_table
from feature_store_spark.sources.bucketed import (
    colocated_join,
    read_bucketed,
    write_bucketed,
)
from tests.test_plans import n_exchanges


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    feats = ev.groupBy("user_id").agg(
        F.sum("value").alias("total_value"), F.count(F.lit(1)).alias("n_events")
    )
    labels = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    write_bucketed(feats, "bt_feats", "user_id", buckets=8)
    write_bucketed(labels, "bt_labels", "user_id", buckets=8)
    yield "bt_feats", "bt_labels"
    spark.sql("DROP TABLE IF EXISTS bt_feats")
    spark.sql("DROP TABLE IF EXISTS bt_labels")


def test_colocated_join_no_shuffle(spark, bucketed_tables):
    ft, lt = bucketed_tables
    df = colocated_join(spark, lt, ft, "user_id")
    assert n_exchanges(df) == 0, df._jdf.queryExecution().toString()


def test_colocated_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    ft, lt = bucketed_tables
    ev = load_table(spark, sf_dir, "events")
    feats = ev.groupBy("user_id").agg(
        F.sum("value").alias("total_value"), F.count(F.lit(1)).alias("n_events")
    )
    labels = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    expected = labels.join(feats, "user_id").count()
    got = colocated_join(spark, lt, ft, "user_id").count()
    assert got == expected > 0


def test_bucketed_groupby_no_shuffle(spark, bucketed_tables):
    ft, _ = bucketed_tables
    df = read_bucketed(spark, ft).groupBy("user_id").agg(
        F.sum("total_value").alias("s")
    )
    assert n_exchanges(df) == 0


def test_unbucketed_join_does_shuffle(spark, sf_dir):
    """Control: the same join WITHOUT bucketing shuffles both sides —
    the cost bucketing removes."""
    ev = load_table(spark, sf_dir, "events")
    feats = ev.groupBy("user_id").agg(F.sum("value").alias("total_value"))
    labels = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = labels.join(feats, "user_id")
        assert n_exchanges(df) >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
