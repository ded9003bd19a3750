"""ASOF join golden checks (FIXTURES.md "Golden checks" 1-2):
inclusivity, leakage, missing->null, unknown entity, tie-break by
created_at, lookback horizon, and differential equivalence between the
union+window plan and the join+row_number plan.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from feature_store_spark.operators.asof import (
    asof_join,
    asof_join_ranked,
    asof_training_set,
)


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def records(spark):
    rows = [
        # entity, feature, value, event_time, created_at
        ("e1", "f1", 1.0, ts("2024-01-01T00:00:00"), ts("2024-01-01T01:00:00")),
        ("e1", "f1", 2.0, ts("2024-01-05T00:00:00"), ts("2024-01-05T01:00:00")),
        # poisoned future row (leakage probe)
        ("e1", "f1", 99.0, ts("2024-01-10T00:00:01"), ts("2024-01-10T01:00:00")),
        # duplicate event_time, different created_at (tie-break probe)
        ("e1", "f2", 10.0, ts("2024-01-03T00:00:00"), ts("2024-01-03T01:00:00")),
        ("e1", "f2", 11.0, ts("2024-01-03T00:00:00"), ts("2024-01-03T02:00:00")),
        # exactly-at-label-time row (inclusivity probe)
        ("e2", "f1", 5.0, ts("2024-01-10T00:00:00"), ts("2024-01-10T00:00:00")),
        # very old row (lookback probe)
        ("e3", "f1", 7.0, ts("2020-01-01T00:00:00"), ts("2020-01-01T00:00:00")),
    ]
    return spark.createDataFrame(
        rows, "entity_id string, feature_name string, value_float double, "
        "event_time timestamp, created_at timestamp"
    )


@pytest.fixture(scope="module")
def labels(spark):
    rows = [
        ("e1", ts("2024-01-10T00:00:00"), 1),
        ("e2", ts("2024-01-10T00:00:00"), 0),
        ("e3", ts("2024-01-10T00:00:00"), 0),
        ("unknown", ts("2024-01-10T00:00:00"), 1),
    ]
    return spark.createDataFrame(rows, "entity_id string, event_time timestamp, label int")


def test_asof_training_set_wide(spark, records, labels):
    out = asof_training_set(labels, records, ["f1", "f2"]).orderBy("entity_id")
    got = {r["entity_id"]: r.asDict() for r in out.collect()}

    # latest at-or-before, not the poisoned 2024-01-10T00:00:01 row
    assert got["e1"]["f1"] == 2.0
    # tie-break: max created_at wins among duplicate event_times
    assert got["e1"]["f2"] == 11.0
    # inclusive: row exactly at label time IS visible (IcebergOfflineStore.java:188)
    assert got["e2"]["f1"] == 5.0
    # outside the 180-day lookback -> missing
    assert got["e3"]["f1"] is None
    # unknown entity -> all-missing row, still present
    assert got["unknown"]["f1"] is None and got["unknown"]["f2"] is None
    # label columns preserved
    assert got["e1"]["label"] == 1
    assert out.count() == 4


def test_asof_no_lookback_picks_old_row(spark, records, labels):
    out = asof_training_set(labels, records, ["f1"], lookback_days=None)
    got = {r["entity_id"]: r["f1"] for r in out.collect()}
    assert got["e3"] == 7.0


def test_asof_tall_matches_ranked_plan(spark, records, labels):
    tall = asof_training_set(labels, records, ["f1", "f2"], wide=False, lookback_days=None)
    tall = tall.filter(F.col("value_float").isNotNull())
    ranked = asof_join_ranked(labels, records, ["f1", "f2"])
    a = {tuple(r) for r in tall.collect()}
    b = {tuple(r) for r in ranked.collect()}
    assert a == b


def test_generic_asof_join(spark, records, labels):
    right = records.filter(F.col("feature_name") == "f1")
    out = asof_join(
        labels,
        right,
        on=["entity_id"],
        left_time="event_time",
        value_cols=["value_float"],
        tiebreak_cols=["created_at"],
    )
    got = {r["entity_id"]: r["value_float"] for r in out.collect()}
    assert got["e1"] == 2.0
    assert got["e2"] == 5.0
    assert got["e3"] == 7.0  # no tolerance -> old row visible
    assert got["unknown"] is None
    out_tol = asof_join(
        labels,
        right,
        on=["entity_id"],
        left_time="event_time",
        value_cols=["value_float"],
        tolerance_seconds=180 * 86400,
    )
    got_tol = {r["entity_id"]: r["value_float"] for r in out_tol.collect()}
    assert got_tol["e3"] is None


def test_duplicate_label_rows_survive(spark, records, labels):
    dup_labels = labels.unionByName(labels.filter(F.col("entity_id") == "e1"))
    out = asof_training_set(dup_labels, records, ["f1"])
    assert out.count() == 5
    assert out.filter(F.col("entity_id") == "e1").count() == 2


def _rows_set(df):
    return {tuple(r) for r in df.collect()}


def test_columnar_plan_matches_flat(spark, records, labels):
    from feature_store_spark.operators.asof import asof_training_set_columnar

    for lookback in (180.0, None):
        flat = asof_training_set(
            labels, records, ["f1", "f2"], lookback_days=lookback
        ).select("entity_id", "event_time", "label", "f1", "f2")
        col = asof_training_set_columnar(
            labels, records, ["f1", "f2"], lookback_days=lookback
        ).select("entity_id", "event_time", "label", "f1", "f2")
        assert _rows_set(flat) == _rows_set(col)

    # duplicate labels survive identically
    dup_labels = labels.unionByName(labels.filter(F.col("entity_id") == "e1"))
    col = asof_training_set_columnar(dup_labels, records, ["f1"])
    assert col.count() == 5
    assert col.filter(F.col("entity_id") == "e1").count() == 2


def test_bucketed_unique_labels_fastpath(spark, records, labels):
    from feature_store_spark.operators.asof import asof_training_set_bucketed

    slow = asof_training_set_bucketed(labels, records, ["f1", "f2"])
    fast = asof_training_set_bucketed(
        labels, records, ["f1", "f2"], assume_unique_labels=True
    ).select(*slow.columns)
    assert _rows_set(slow) == _rows_set(fast)


def test_columnar_plan_shape_and_unique_fastpath(spark, records, labels):
    from feature_store_spark.operators.asof import asof_training_set_columnar

    col = asof_training_set_columnar(labels, records, ["f1", "f2"])
    flat_fast = asof_training_set(
        labels, records, ["f1", "f2"], assume_unique_labels=True
    ).select(*col.columns)
    assert _rows_set(flat_fast) == _rows_set(col)

    def n_windows(df):
        return df._jdf.queryExecution().optimizedPlan().toString().count("Window [")

    # columnar: exactly ONE window pass (running last per feature);
    # flat with unique labels: dup-counter skipped -> union window +
    # the pivot aggregation, no second window
    assert n_windows(col) == 1
    assert n_windows(flat_fast) == 1
    assert n_windows(asof_training_set(labels, records, ["f1"])) == 2
