"""Bloom semi-join (exactness + one-sided error) and two-pass exact
heavy hitters (equality with the full groupBy) + word entropy."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from feature_store_spark.operators.bloom import (
    bloom_semi_join,
    build_bloom,
    might_contain,
)
from feature_store_spark.operators.freq import heavy_hitters
from feature_store_spark.operators.text import word_entropy


@pytest.fixture(scope="module")
def keys(spark):
    return spark.range(0, 500).select(
        F.concat(F.lit("k"), F.col("id")).alias("key")
    )


def test_bloom_no_false_negatives(spark, keys):
    bloom = build_bloom(keys, ["key"], n_items=500, fpp=0.01)
    hits = might_contain(keys, ["key"], bloom).filter(~F.col("__bloom_hit"))
    assert hits.count() == 0  # one-sided error: members ALWAYS hit


def test_bloom_fpp_in_range(spark, keys):
    bloom = build_bloom(keys, ["key"], n_items=500, fpp=0.01)
    absent = spark.range(10_000, 30_000).select(
        F.concat(F.lit("k"), F.col("id")).alias("key")
    )
    fp = might_contain(absent, ["key"], bloom).filter(F.col("__bloom_hit")).count()
    assert fp / 20_000 < 0.05  # ~0.01 nominal, generous margin


def test_bloom_semi_join_exact(spark, keys):
    big = spark.range(0, 5000).select(
        F.concat(F.lit("k"), F.col("id")).alias("key"), F.col("id").alias("payload")
    )
    got = bloom_semi_join(big, keys, ["key"], n_items=500).orderBy("payload")
    want = big.join(keys, "key", "left_semi").orderBy("payload")
    assert [r.asDict() for r in got.collect()] == [r.asDict() for r in want.collect()]


def test_bloom_multi_col_key(spark):
    keys = spark.range(0, 100).select(
        (F.col("id") % 10).alias("a"), F.floor(F.col("id") / 10).alias("b")
    )
    big = spark.range(0, 1000).select(
        (F.col("id") % 40).alias("a"), F.floor(F.col("id") / 40).alias("b")
    )
    got = bloom_semi_join(big, keys, ["a", "b"], n_items=100).count()
    want = big.join(keys.distinct(), ["a", "b"], "left_semi").count()
    assert got == want


def test_bloom_bad_params(spark, keys):
    with pytest.raises(ValueError):
        build_bloom(keys, ["key"], n_items=0)
    with pytest.raises(ValueError):
        build_bloom(keys, ["key"], n_items=10, fpp=1.5)


def _zipf_df(spark):
    # deterministic skewed multiset: item i repeated floor(3000/i) times
    rows = [(f"w{i}",) for i in range(1, 200) for _ in range(3000 // i)]
    return spark.createDataFrame(rows, "word string").repartition(8)


def test_heavy_hitters_matches_groupby(spark):
    df = _zipf_df(spark)
    support = 0.02
    n = df.count()
    thresh = max(1, math.ceil(support * n))
    got = {(r["word"], r["cnt"]) for r in heavy_hitters(df, "word", support).collect()}
    want = {
        (r["word"], r["cnt"])
        for r in df.groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= thresh)
        .collect()
    }
    assert got == want and len(got) > 0


def test_heavy_hitters_broadcast_join_above_isin_limit(spark):
    """VERDICT r3 #4: when the candidate set exceeds isin_limit, the
    exact pass must prune via a broadcast left-semi join — the plan
    contains no giant In-list (a Catalyst plan-size hazard at 10⁵-
    partition scale) and the answer still equals the full groupBy."""
    df = _zipf_df(spark)
    support = 0.02
    out = heavy_hitters(df, "word", support, isin_limit=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
    assert " IN (" not in plan and "word# IN" not in plan
    n = df.count()
    thresh = max(1, math.ceil(support * n))
    want = {
        (r["word"], r["cnt"])
        for r in df.groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= thresh)
        .collect()
    }
    assert {(r["word"], r["cnt"]) for r in out.collect()} == want


def test_heavy_hitters_null_and_support_validation(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("a",), ("b",)], "word string"
    )
    out = heavy_hitters(df, "word", 0.5).collect()  # N=3 non-null, thresh 2
    assert {(r["word"], r["cnt"]) for r in out} == {("a", 2)}
    with pytest.raises(ValueError):
        heavy_hitters(df, "word", 0.0)


def test_heavy_hitters_nan_excluded_like_null(spark):
    """Pass 1 (pandas value_counts) drops NaN, so NaN can never become
    a candidate — pass 2 must therefore exclude NaN from both the item
    universe AND the N that sets the threshold, or a mostly-NaN float
    column silently under-reports every real hitter's support."""
    nan = float("nan")
    rows = [(nan,)] * 6 + [(1.5,), (1.5,), (2.5,), (None,)]
    df = spark.createDataFrame(rows, "x double")
    # universe = {1.5, 1.5, 2.5}: N=3, thresh at 0.5 = 2 -> only 1.5
    out = {(r["x"], r["cnt"]) for r in heavy_hitters(df, "x", 0.5).collect()}
    assert out == {(1.5, 2)}


def test_heavy_hitters_non_nullable_input_column(spark):
    """ADVICE r6 #3: the per-partition sentinel row carries None in
    the item column, so the mapInPandas output schema must declare the
    item field nullable even when the INPUT column is containsNull=
    false (posexplode of a non-null n-gram array) — copying the input
    nullability verbatim violates the declared schema under safe
    Arrow conversion."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [("a a a b",), ("a c c c",)], "text string"
    )
    words = docs.select(
        F.explode(F.split("text", " ")).alias("word")
    )
    assert not words.schema["word"].nullable  # the regression setup
    prev = spark.conf.get(
        "spark.sql.execution.pandas.convertToArrowArraySafely", "false"
    )
    try:
        spark.conf.set(
            "spark.sql.execution.pandas.convertToArrowArraySafely", "true"
        )
        out = {
            (r["word"], r["cnt"])
            for r in heavy_hitters(words, "word", 0.3).collect()
        }  # N=8, threshold ceil(0.3*8)=3
    finally:
        spark.conf.set(
            "spark.sql.execution.pandas.convertToArrowArraySafely", prev
        )
    assert out == {("a", 4), ("c", 3)}


def test_word_entropy_golden(spark):
    docs = spark.createDataFrame(
        [
            (1, "a a a a"),          # one word: H = 0
            (2, "a b c d"),          # uniform over 4: H = ln 4
            (3, ""),                 # empty: H = 0, n_words 0
            (4, "a a b b"),          # uniform over 2: H = ln 2
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in word_entropy(docs).collect()}
    assert got[1]["word_entropy"] == pytest.approx(0.0)
    assert got[2]["word_entropy"] == pytest.approx(math.log(4))
    assert got[3]["n_words"] == 0 and got[3]["word_entropy"] == 0.0
    assert got[4]["word_entropy"] == pytest.approx(math.log(2))
