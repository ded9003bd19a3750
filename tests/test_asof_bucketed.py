"""Differential test: the hot-key-safe bucketed ASOF plan must return
exactly what the flat union+window plan returns, including bucket-
boundary labels, duplicate timestamps, unknown entities, and a skewed
hot key."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from feature_store_spark.operators.asof import (
    asof_training_set,
    asof_training_set_bucketed,
)

BASE = datetime(2024, 1, 1)


@pytest.fixture(scope="module")
def random_data(spark):
    rng = random.Random(1234)
    feats = ["f1", "f2", "f3"]
    recs, labs = [], []
    for e in range(20):
        ent = f"e{e}"
        # hot key: entity e0/f1 gets 60x the rows
        for f in feats:
            n = 600 if (e == 0 and f == "f1") else 10
            for _ in range(n):
                t = BASE + timedelta(seconds=rng.randrange(0, 40 * 86400))
                recs.append(
                    (ent, f, rng.random() * 100, t,
                     BASE + timedelta(seconds=rng.randrange(0, 1000)))
                )
        for _ in range(8):
            # include exact-bucket-boundary label times (midnight)
            if rng.random() < 0.3:
                t = BASE + timedelta(days=rng.randrange(0, 41))
            else:
                t = BASE + timedelta(seconds=rng.randrange(0, 41 * 86400))
            labs.append((ent, t, rng.randrange(2)))
    # duplicate-timestamp probes on the hot key
    t_dup = BASE + timedelta(days=3)
    recs.append(("e0", "f1", 111.0, t_dup, BASE + timedelta(seconds=5)))
    recs.append(("e0", "f1", 222.0, t_dup, BASE + timedelta(seconds=9)))
    labs.append(("e0", t_dup, 1))
    labs.append(("unknown", BASE + timedelta(days=10), 0))
    records = spark.createDataFrame(
        recs,
        "entity_id string, feature_name string, value_float double, "
        "event_time timestamp, created_at timestamp",
    )
    labels = spark.createDataFrame(
        labs, "entity_id string, event_time timestamp, label int"
    )
    return records, labels, feats


def _rows(df):
    return sorted((tuple(r) for r in df.collect()), key=repr)


def test_bucketed_equals_flat_wide(spark, random_data):
    records, labels, feats = random_data
    flat = asof_training_set(labels, records, feats, lookback_days=None)
    bucketed = asof_training_set_bucketed(
        labels, records, feats, bucket_seconds=86_400
    )
    assert _rows(flat) == _rows(bucketed)


def test_bucketed_equals_flat_small_buckets(spark, random_data):
    records, labels, feats = random_data
    flat = asof_training_set(labels, records, feats, lookback_days=None, wide=False)
    bucketed = asof_training_set_bucketed(
        labels, records, feats, bucket_seconds=3600, wide=False
    )
    assert _rows(flat) == _rows(bucketed)


def test_bucketed_tiebreak_on_duplicates(spark, random_data):
    records, labels, feats = random_data
    out = asof_training_set_bucketed(labels, records, feats)
    dup_rows = [
        r for r in out.collect()
        if r["entity_id"] == "e0" and r["event_time"] == BASE + timedelta(days=3)
    ]
    assert dup_rows and all(r["f1"] == 222.0 for r in dup_rows)  # max created_at wins
