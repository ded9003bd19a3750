"""Bucketed (co-located) storage for shuffle-free joins and
aggregations on entity keys.

The reference gets key locality from md5-prefixed RocksDB keys
(RocksDBFeatureStore.java:47-77) — one node, one keyspace. The Spark
equivalent at 100 TB is HASH BUCKETING: write the table pre-partitioned
by the join/aggregation key into a fixed number of buckets, and every
downstream equi-join, groupBy, or window over that key runs WITHOUT an
exchange — the scan itself reports the required hash partitioning.

This is the storage layout a production feature store uses for its
`online_vectors` / `feature_records` tables: the serving lookup join
(L2), the scalar assembly pivot (L6), and repeated ASOF runs against
the same label keys all reuse the on-disk clustering instead of
re-shuffling terabytes per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed managed parquet table clustered by
    ``key``. ``sort=True`` additionally sorts within buckets, letting a
    sort-merge join skip its sort as well."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table; the scan exposes its bucket clustering to
    the planner (spark.sql.sources.bucketing.enabled, default on)."""
    return spark.table(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Equi-join two tables bucketed on the same key with the same
    bucket count: plans as a zero-exchange sort-merge join (verified in
    tests/test_bucketed.py)."""
    keys = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), keys, how)
