"""Salted skew operators: exact equivalence with their unsalted twins
on a deliberately skewed dataset (one hot key holding most rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from feature_store_spark.operators.skew import salted_join, salted_top_k_per_group
from feature_store_spark.operators.topk import top_k_per_group
from feature_store_spark.session import load_table


@pytest.fixture(scope="module")
def skewed(spark, sf_dir):
    """events with user 0 made hot: ~half of all rows."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", "ts"
    )
    hot = ev.withColumn("user_id", F.lit(0)).withColumn(
        "event_id", F.col("event_id") + 10_000_000
    )
    return ev.unionByName(hot)


def test_salted_join_matches_plain(spark, sf_dir, skewed):
    dims = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.sum("value").alias("total"))
    )
    plain = skewed.join(dims, "user_id")
    salted = salted_join(skewed, dims, "user_id", n_salts=4)
    assert salted.count() == plain.count()
    assert sorted(salted.columns) == sorted(plain.columns)
    # spot-check content equality via checksum of a stable projection
    chk = lambda df: df.agg(  # noqa: E731
        F.sum(F.col("event_id") * 7 + F.round(F.col("total"), 3)).alias("c")
    ).collect()[0]["c"]
    assert chk(salted) == pytest.approx(chk(plain))


def test_salted_join_left_outer(spark, skewed):
    dims = skewed.select("user_id").distinct().filter(F.col("user_id") % 2 == 0)
    dims = dims.withColumn("flag", F.lit(1))
    plain = skewed.join(dims, "user_id", "left")
    salted = salted_join(skewed, dims, "user_id", n_salts=4, how="left")
    assert salted.count() == plain.count()
    assert (
        salted.filter(F.col("flag").isNull()).count()
        == plain.filter(F.col("flag").isNull()).count()
    )


def test_salted_topk_matches_window(skewed):
    order = [F.col("value").desc(), F.col("event_id")]  # deterministic ties
    plain = top_k_per_group(skewed, 5, ["user_id"], order)
    salted = salted_top_k_per_group(skewed, 5, ["user_id"], order, n_salts=4)
    a = sorted(
        (r["user_id"], r["rank"], r["event_id"]) for r in plain.collect()
    )
    b = sorted(
        (r["user_id"], r["rank"], r["event_id"]) for r in salted.collect()
    )
    assert a == b


def test_salt_is_deterministic(skewed):
    from feature_store_spark.operators.skew import with_salt

    a = with_salt(skewed, 8).groupBy("__salt").count().collect()
    b = with_salt(skewed.repartition(7), 8).groupBy("__salt").count().collect()
    assert sorted((r["__salt"], r["count"]) for r in a) == sorted(
        (r["__salt"], r["count"]) for r in b
    )


def test_salted_join_rejects_right_and_full(skewed):
    dims = skewed.select("user_id").distinct().withColumn("flag", F.lit(1))
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="unsupported"):
            salted_join(skewed, dims, "user_id", n_salts=4, how=how)


def test_salted_topk_rank_col_collision_refused(spark):
    from pyspark.sql import functions as F

    from feature_store_spark.operators.skew import salted_top_k_per_group

    df = spark.createDataFrame(
        [(1, 1.0, 99), (1, 2.0, 98)], "g long, v double, rank long"
    )
    import pytest as _pt

    with _pt.raises(ValueError, match="rank"):
        salted_top_k_per_group(df, 1, ["g"], [F.col("v").desc()])
    out = salted_top_k_per_group(
        df, 1, ["g"], [F.col("v").desc()], rank_col="topk_rank"
    ).collect()
    assert [(r["v"], r["rank"], r["topk_rank"]) for r in out] == [
        (2.0, 98, 1)
    ]
