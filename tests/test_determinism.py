"""Rerun-stability: graded queries must produce IDENTICAL values under
different partitionings (the driver's value-hash gate runs once; a
float aggregate whose rounding sits on a summation-order boundary
would flake it). The queries picked here are the float-aggregate-heavy
ones — the class that bit round 1's sessionize."""

from __future__ import annotations

import pytest

from feature_store_spark.queries import QUERIES
from tests.conftest import SF_SMOKE

RISKY = [
    "pricing_summary",
    "revenue_by_nation",
    "sessionize",
    "stream_sessions",
    "windowed_features",
    "feature_stats",
    "view_transform",
    "corpus_mix",
]


def canon(df):
    cols = sorted(df.columns)
    return sorted(repr(tuple(row[c] for c in cols)) for row in df.collect())


@pytest.mark.parametrize("name", RISKY)
def test_query_stable_across_partitionings(spark, name):
    fn = QUERIES[name][0]
    base = canon(fn(spark, SF_SMOKE))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        alt = canon(fn(spark, SF_SMOKE))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base == alt
