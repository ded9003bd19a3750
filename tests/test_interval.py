"""Bucketed interval join (operators/interval.py).

Differential: the bucketed rewrite must return exactly the rows of
the naive BETWEEN theta-join, across bucket widths that split, equal,
and exceed the interval lengths; guard and column-collision errors
fail loudly.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from feature_store_spark.operators.interval import interval_join


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


@pytest.fixture(scope="module")
def frames(spark):
    points = spark.createDataFrame(
        [(i, _ts(1 + i % 9, (3 * i) % 24)) for i in range(40)],
        "pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (100, _ts(1), _ts(2)),          # 1 day
            (101, _ts(2, 12), _ts(5)),      # 2.5 days
            (102, _ts(4), _ts(4, 6)),       # 6 hours
            (103, _ts(8), _ts(9, 23)),      # ~2 days at the tail
            (104, _ts(6), _ts(6)),          # zero-length
        ],
        "iid long, t0 timestamp, t1 timestamp",
    )
    return points, intervals


def _naive(points, intervals, inclusive=True):
    end_ok = (
        F.col("ts") <= F.col("t1") if inclusive else F.col("ts") < F.col("t1")
    )
    return (
        points.crossJoin(intervals)
        .filter((F.col("ts") >= F.col("t0")) & end_ok)
        .select("pid", "iid")
    )


@pytest.mark.parametrize("width_s", [3600, 21600, 86400, 7 * 86400])
def test_matches_naive_theta_join(spark, frames, width_s):
    points, intervals = frames
    got = interval_join(
        points, intervals, "ts", "t0", "t1", bucket_width_s=width_s
    ).select("pid", "iid")
    expected = _naive(points, intervals)
    assert sorted(got.collect()) == sorted(expected.collect())
    assert got.count() > 0  # fixture actually exercises matches


def test_exclusive_end(spark, frames):
    points, intervals = frames
    got = interval_join(
        points, intervals, "ts", "t0", "t1",
        bucket_width_s=86400, inclusive_end=False,
    ).select("pid", "iid")
    expected = _naive(points, intervals, inclusive=False)
    assert sorted(got.collect()) == sorted(expected.collect())


def test_keyed_join_restricts_matches(spark):
    points = spark.createDataFrame(
        [(1, "a", _ts(1, 5)), (2, "b", _ts(1, 5))],
        "pid long, k string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(10, "a", _ts(1), _ts(2))],
        "iid long, k string, t0 timestamp, t1 timestamp",
    )
    got = interval_join(
        points, intervals, "ts", "t0", "t1",
        bucket_width_s=86400, keys=["k"],
    )
    assert [r["pid"] for r in got.collect()] == [1]


def test_replication_guard_raises(spark, frames):
    points, intervals = frames
    with pytest.raises(Exception, match="interval_join: interval spans"):
        interval_join(
            points, intervals, "ts", "t0", "t1",
            bucket_width_s=3600, max_buckets_per_interval=10,
        ).count()


def test_column_collision_rejected(spark, frames):
    points, _ = frames
    with pytest.raises(ValueError, match="overlapping non-key"):
        interval_join(
            points,
            points.withColumnRenamed("pid", "iid"),
            "ts", "ts", "ts",
        )


def test_no_nested_loop_in_plan(spark, frames):
    points, intervals = frames
    plan = (
        interval_join(points, intervals, "ts", "t0", "t1")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_empty_intervals_yield_empty_result(spark, frames):
    points, intervals = frames
    got = interval_join(
        points, intervals.filter(F.col("iid") < 0), "ts", "t0", "t1"
    )
    assert got.count() == 0


def test_points_outside_all_intervals_drop(spark):
    points = spark.createDataFrame(
        [(1, _ts(20))], "pid long, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [(9, _ts(1), _ts(2))], "iid long, t0 timestamp, t1 timestamp"
    )
    assert interval_join(points, intervals, "ts", "t0", "t1").count() == 0


def test_inverted_interval_raises_instead_of_exploding(spark):
    """Review r10: an inverted interval (end < start) bypassed the
    bucket cap — its negative span satisfied the < check while
    sequence(s0, s1) DESCENDED |span|+1 rows (a swapped-dates row
    fanned out ~4B slots at 60 s buckets with no diagnostic)."""
    import pytest as _pt

    from feature_store_spark.operators.interval import interval_join

    points = spark.createDataFrame(
        [(1, "2020-06-01 00:00:00")], "pid long, ts string"
    ).select("pid", F.col("ts").cast("timestamp").alias("ts"))
    bad = spark.createDataFrame(
        [(10, "2021-01-01 00:00:00", "2020-01-01 00:00:00")],
        "iid long, lo string, hi string",
    ).select(
        "iid",
        F.col("lo").cast("timestamp").alias("lo"),
        F.col("hi").cast("timestamp").alias("hi"),
    )
    with _pt.raises(Exception, match="inverted|spans"):
        interval_join(
            points, bad, "ts", "lo", "hi",
            bucket_width_s=86400, max_buckets_per_interval=10,
        ).collect()
