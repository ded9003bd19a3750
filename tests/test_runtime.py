"""DatasetManager parity tests (load/replace/unload/capacity/dims/info
— the reference's runtime dataset tests, dataset.rs:192-366)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from feature_store_spark.runtime import DatasetError, DatasetManager
from feature_store_spark.session import load_table


@pytest.fixture()
def mgr():
    return DatasetManager(max_datasets=2)


@pytest.fixture(scope="module")
def items(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("item_id"),
        F.col("l_quantity").alias("f0"),
        F.col("l_discount").alias("f1"),
    )


def test_load_get_list_unload(mgr, items):
    mgr.load("a", items, ["f0", "f1"], cache=False)
    assert mgr.list_datasets() == ["a"]
    assert mgr.get("a").count() == items.count()
    mgr.unload("a")
    assert mgr.list_datasets() == []
    with pytest.raises(DatasetError):
        mgr.get("a")


def test_duplicate_load_and_replace(mgr, items):
    mgr.load("a", items, ["f0", "f1"], cache=False)
    with pytest.raises(DatasetError):
        mgr.load("a", items, ["f0"])
    mgr.replace("a", items.limit(10), ["f0"])
    assert mgr.feature_cols("a") == ["f0"]
    assert mgr.get("a").count() == 10


def test_capacity_cap(mgr, items):
    mgr.load("a", items, ["f0"], cache=False)
    mgr.load("b", items, ["f0"], cache=False)
    with pytest.raises(DatasetError):
        mgr.load("c", items, ["f0"], cache=False)
    mgr.unload("a")
    mgr.load("c", items, ["f0"], cache=False)  # freed slot reusable


def test_validate_dims_and_missing_cols(mgr, items):
    with pytest.raises(DatasetError):
        mgr.load("a", items, ["f0", "nope"])
    mgr.load("a", items, ["f0", "f1"], cache=False)
    mgr.validate_dims("a", 2)
    with pytest.raises(DatasetError):
        mgr.validate_dims("a", 39)


def test_info_ranges(mgr, items, spark, sf_dir):
    mgr.load("a", items, ["f0", "f1"], cache=False)
    info = mgr.info("a")
    assert info.n_items == items.count()
    assert info.n_features == 2
    import duckdb

    sf = sf_dir
    got = duckdb.connect().execute(
        f"SELECT min(l_quantity), max(l_quantity), min(l_discount), max(l_discount) "
        f"FROM read_parquet('{sf}/lineitem.parquet')"
    ).fetchone()
    assert info.ranges["f0"] == (got[0], got[1])
    assert info.ranges["f1"] == (got[2], got[3])


def test_replace_is_atomic(mgr, items):
    """A failed replace (missing feature column) must leave the
    existing dataset untouched (dataset.rs swap semantics)."""
    mgr.load("a", items, ["f0", "f1"], cache=False)
    with pytest.raises(DatasetError):
        mgr.replace("a", items.select("item_id"), ["f0"])
    assert mgr.list_datasets() == ["a"]
    assert mgr.feature_cols("a") == ["f0", "f1"]
    assert mgr.get("a").count() == items.count()


def test_info_all_null_column(mgr, items, spark):
    import math

    nulled = items.withColumn("f1", F.lit(None).cast("double"))
    mgr.load("n", nulled, ["f0", "f1"], cache=False)
    info = mgr.info("n")
    lo, hi = info.ranges["f1"]
    assert math.isnan(lo) and math.isnan(hi)
    lo0, hi0 = info.ranges["f0"]
    assert lo0 <= hi0


def test_nanos_detection_by_logical_type(spark, tmp_path):
    """_nanos_timestamp_cols must flag only true TIMESTAMP(NANOS)
    logical types: pyarrow reports legacy INT96 as timestamp[ns] too,
    but Spark reads INT96 as a plain TIMESTAMP — flagging it would
    make load_table run `div 1000` on a timestamp and fail. Also
    covers directory-shaped (Spark-written) tables."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from feature_store_spark.session import _nanos_timestamp_cols

    nanos = tmp_path / "nanos.parquet"
    t = pa.table(
        {
            "ts": pa.array(
                np.array([1_700_000_000_123_456_789], dtype="int64"),
                type=pa.timestamp("ns"),
            ),
            "x": [1],
        }
    )
    pq.write_table(t, str(nanos), store_schema=False)
    assert _nanos_timestamp_cols(str(nanos)) == ["ts"]

    # Spark-written directory: INT96 (default) must NOT be flagged,
    # and the directory form must be accepted at all
    d = tmp_path / "spark_dir.parquet"
    from pyspark.sql import functions as F

    spark.range(3).withColumn(
        "ts", F.timestamp_millis(F.lit(86_400_000))
    ).write.mode("overwrite").parquet(str(d))
    assert _nanos_timestamp_cols(str(d)) == []
