"""Sample-driven ASOF plan dispatch + hot-key stress.

The stress fixture is the pathology choose_asof_plan exists for: ONE
entity with 10^6 history rows (a viral user). The bucketed plan must
(a) be chosen, (b) spread that key over time buckets with a provable
per-partition bound, (c) return exact ASOF answers (the fixture is
constructed so the expected value at any label time is known in
closed form)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from feature_store_spark.operators.asof import (
    asof_training_set,
    asof_training_set_auto,
    asof_training_set_bucketed,
    choose_asof_plan,
    estimate_hottest_key_rows,
)

BASE = datetime(2024, 1, 1)
BASE_US = int(BASE.timestamp()) * 1_000_000


@pytest.fixture(scope="module")
def hot_records(spark):
    """1M-row hot entity: row i at BASE+i seconds with value i, plus a
    sprinkle of 500 cold entities x 100 rows."""
    hot = spark.range(1_000_000).select(
        F.lit("hot").alias("entity_id"),
        F.lit("f1").alias("feature_name"),
        F.col("id").cast("double").alias("value_float"),
        F.timestamp_micros(F.lit(BASE_US) + F.col("id") * 1_000_000).alias(
            "event_time"
        ),
        F.timestamp_micros(F.lit(BASE_US)).alias("created_at"),
    )
    cold = spark.range(50_000).select(
        F.concat(F.lit("e"), (F.col("id") % 500).cast("string")).alias(
            "entity_id"
        ),
        F.lit("f1").alias("feature_name"),
        F.col("id").cast("double").alias("value_float"),
        F.timestamp_micros(F.lit(BASE_US) + F.col("id") * 17_000_000).alias(
            "event_time"
        ),
        F.timestamp_micros(F.lit(BASE_US)).alias("created_at"),
    )
    return hot.unionByName(cold)


def test_hottest_key_estimate_registers_hot_key(hot_records):
    est = estimate_hottest_key_rows(hot_records, sample_mod=1000)
    # true hot count 1M; the row sample sees ~1000 of them
    assert 500_000 < est < 2_000_000


def test_choose_plan_hot_vs_uniform(spark, hot_records):
    labels = spark.createDataFrame(
        [("hot", BASE, 1)], "entity_id string, event_time timestamp, label int"
    )
    assert (
        choose_asof_plan(labels, hot_records, hot_rows_threshold=500_000)
        == "bucketed"
    )
    uniform = hot_records.filter(F.col("entity_id") != "hot")
    assert (
        choose_asof_plan(labels, uniform, hot_rows_threshold=500_000)
        == "columnar"
    )


def test_bucketed_bound_under_skew(hot_records):
    """The bucketed plan's promise: no window partition holds more than
    one bucket's worth of the hot key (3600 rows/hour here vs 10^6 in
    the columnar plan's single per-entity partition)."""
    bs = 3600
    per_bucket = (
        hot_records.filter(F.col("entity_id") == "hot")
        .groupBy(
            F.floor(F.unix_micros("event_time") / (bs * 1_000_000)).alias("b")
        )
        .count()
        .agg(F.max("count").alias("mx"))
        .first()["mx"]
    )
    assert per_bucket <= bs  # one row per second -> bucket_seconds cap


def test_auto_dispatch_exact_on_hot_key(spark, hot_records):
    """Auto must pick the bucketed plan AND return exact answers: at
    label time BASE+k seconds the latest f1 value is exactly k (values
    are the second offsets by construction)."""
    probes = [0, 1, 3599, 3600, 86_400, 999_999]
    labels = spark.createDataFrame(
        [("hot", k) for k in probes], "entity_id string, k long"
    ).select(
        "entity_id",
        F.timestamp_micros(F.lit(BASE_US) + F.col("k") * 1_000_000).alias(
            "event_time"
        ),
        "k",
    )
    out = asof_training_set_auto(
        labels,
        hot_records,
        ["f1"],
        hot_rows_threshold=500_000,
        bucket_seconds=3600,
        tiebreak_cols=["created_at"],
        assume_unique_labels=True,
    )
    got = {r["k"]: r["f1"] for r in out.collect()}
    assert got == {k: float(k) for k in probes}


def test_auto_matches_flat_on_uniform(spark, hot_records):
    """On well-distributed keys auto dispatches to columnar; result
    must equal the flat plan's (differential, small slice)."""
    cold = hot_records.filter(F.col("entity_id").isin("e1", "e2", "e3"))
    labels = spark.createDataFrame(
        [("e1", datetime(2024, 1, 5), 0), ("e2", datetime(2024, 1, 9), 1),
         ("e3", datetime(2023, 12, 31), 0), ("nope", datetime(2024, 1, 7), 1)],
        "entity_id string, event_time timestamp, label int",
    )
    auto = asof_training_set_auto(
        labels, cold, ["f1"], hot_rows_threshold=500_000,
        tiebreak_cols=["created_at"], lookback_days=None,
    )
    flat = asof_training_set(
        labels, cold, ["f1"], tiebreak_cols=["created_at"], lookback_days=None,
    )
    a = sorted(map(tuple, auto.select(*flat.columns).collect()))
    b = sorted(map(tuple, flat.collect()))
    assert a == b


def test_auto_dispatch_preserves_lookback_semantics(spark):
    """The plan choice must not change the answer: a record OLDER than
    lookback_days is invisible under the columnar plan, so the
    bucketed dispatch must pre-filter it identically (both paths NULL,
    both paths see the in-window record)."""
    from datetime import timedelta

    def ts(days):
        return BASE + timedelta(days=days)

    records = spark.createDataFrame(
        [
            ("a", "f1", 1.0, ts(-400), ts(-400)),  # older than lookback
            ("b", "f1", 2.0, ts(-5), ts(-5)),      # in window
        ],
        "entity_id string, feature_name string, value_float double, "
        "event_time timestamp, created_at timestamp",
    )
    labels = spark.createDataFrame(
        [("a", ts(0)), ("b", ts(0))],
        "entity_id string, event_time timestamp",
    )
    results = []
    for threshold in (0, 10**9):  # 0 forces bucketed, huge forces columnar
        out = asof_training_set_auto(
            labels,
            records,
            ["f1"],
            hot_rows_threshold=threshold,
            lookback_days=30.0,
        )
        results.append(
            sorted((r["entity_id"], r["f1"]) for r in out.collect())
        )
    assert results[0] == results[1] == [("a", None), ("b", 2.0)]


def test_auto_kwarg_surface_is_plan_independent(spark):
    """Review r5: the dispatcher's accepted keywords must not depend
    on which plan the DATA selects — assume_unique_labels rides
    through the columnar dispatch as a no-op, and wide=False fails
    loudly (plan-capability error), not with a data-dependent
    TypeError."""
    from datetime import timedelta

    from feature_store_spark.operators.asof import asof_training_set_auto

    def _ts(days):
        return BASE + timedelta(days=days)

    records = spark.createDataFrame(
        [("a", "f1", 2.0, _ts(-5), _ts(-5))],
        "entity_id string, feature_name string, value_float double, "
        "event_time timestamp, created_at timestamp",
    )
    labels = spark.createDataFrame(
        [("a", _ts(0))], "entity_id string, event_time timestamp"
    )
    # huge threshold -> columnar dispatch; the bucketed-surface hint
    # must be accepted (no TypeError), answer unchanged
    out = asof_training_set_auto(
        labels, records, ["f1"],
        hot_rows_threshold=10**9,
        assume_unique_labels=True,
    )
    assert [(r["entity_id"], r["f1"]) for r in out.collect()] == [("a", 2.0)]
    # wide=False must work REGARDLESS of what the data sample picks
    # (review r10e #4: it used to succeed via bucketed or raise via
    # columnar depending on the hot-key estimate — a pipeline broke
    # nondeterministically as data grew). Columnar-shaped dispatch now
    # routes the tall form through the flat plan.
    tall = asof_training_set_auto(
        labels, records, ["f1"], hot_rows_threshold=10**9, wide=False
    )
    assert [
        (r["entity_id"], r["feature_name"], r["value_float"])
        for r in tall.collect()
    ] == [("a", "f1", 2.0)]
    # threshold=0 forces bucketed even on a sampled-out tiny table,
    # where BOTH keywords are native
    out_b = asof_training_set_auto(
        labels, records, ["f1"],
        hot_rows_threshold=0,
        assume_unique_labels=True,
        wide=True,
    )
    assert [(r["entity_id"], r["f1"]) for r in out_b.collect()] == [("a", 2.0)]
