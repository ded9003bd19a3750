"""Criteo / MSLR dataset acceptance pipelines (SURVEY.md Appendix B):
generation determinism, label rates, split semantics, SVM-light
round-trip through the parser, and ranking metrics over a
quantile-bucket pseudo-model."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from feature_store_spark.datasets.criteo import (
    CAT_COLS,
    chronological_split,
    generate_impressions,
)
from feature_store_spark.datasets.mslr import generate_docs, to_svmlight
from feature_store_spark.metrics import logloss, mean_average_precision, mean_ndcg_at_k
from feature_store_spark.sources.parsers import read_svmlight
from feature_store_spark.validation import RANKING_GATES, model_gates


def test_criteo_generation(spark):
    df = generate_impressions(spark, n=2000, seed=42)
    assert df.count() == 2000
    ctr = df.agg(F.avg("click")).first()[0]
    assert 0.005 < ctr < 0.15  # low-rate click label
    # categoricals are hash buckets in range
    mx = df.agg(*[F.max(c) for c in CAT_COLS]).first()
    assert all(0 <= v < 10000 for v in mx)
    # determinism under repartition
    a = sorted(map(tuple, df.limit(50).collect()))
    b = sorted(map(tuple, generate_impressions(spark, n=2000, seed=42).repartition(5).limit(50).collect()))
    assert len(a) == len(b)


def test_criteo_split_chronological(spark):
    df = generate_impressions(spark, n=1000, seed=42)
    tagged = chronological_split(df, 0.2)
    agg = {r["split"]: r for r in tagged.groupBy("split").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("ts_index").alias("lo"),
        F.max("ts_index").alias("hi"),
    ).collect()}
    assert agg["train"]["n"] + agg["test"]["n"] == 1000
    assert abs(agg["test"]["n"] - 200) <= 10
    assert agg["train"]["hi"] < agg["test"]["lo"]  # strictly chronological


def test_mslr_generation_and_gates(spark):
    df = generate_docs(spark, n_queries=60, docs_per_query=15, seed=42)
    assert df.count() == 900
    rels = {r["relevance"]: r["cnt"] for r in df.groupBy("relevance").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert set(rels) == {0, 1, 2, 3, 4}
    assert rels[0] > rels[4]  # graded pyramid
    # pseudo-model: feature_1 is correlated with latent -> ranking works
    scored = df.select("qid", "entity_id", "relevance", F.col("feature_1").alias("score"))
    ndcg = mean_ndcg_at_k(scored, 10, group_col="qid", tiebreak=["entity_id"]).first()[0]
    mapv = mean_average_precision(scored, group_col="qid", tiebreak=["entity_id"]).first()[0]
    gates = model_gates({"ndcg10": ndcg, "map": mapv}, {"ndcg10_min": RANKING_GATES["ndcg10_min"], "map_min": RANKING_GATES["map_min"]})
    assert all(g["passed"] for g in gates), gates


def test_mslr_svmlight_roundtrip(spark, tmp_path):
    df = generate_docs(spark, n_queries=5, docs_per_query=4, seed=42)
    p = str(tmp_path / "mslr_rt")
    to_svmlight(df).coalesce(1).write.mode("overwrite").text(p)
    back = read_svmlight(spark, p, num_features=136)
    assert back.count() == 20
    orig = df.select("qid", "relevance", "feature_1", "feature_136")
    rt = back.select("qid", "relevance", "feature_1", "feature_136")
    a = sorted(map(tuple, orig.collect()))
    b = sorted(map(tuple, rt.collect()))
    for ra, rb in zip(a, b):
        assert ra[0] == rb[0] and ra[1] == rb[1]
        assert abs(ra[2] - rb[2]) < 1e-9 and abs(ra[3] - rb[3]) < 1e-9


def test_criteo_ctr_logloss_sane(spark):
    df = generate_impressions(spark, n=2000, seed=42)
    base_rate = df.agg(F.avg("click")).first()[0]
    scored = df.select(F.lit(float(base_rate)).alias("p"), F.col("click"))
    ll = logloss(scored, "p", "click").first()[0]
    assert 0.0 < ll < 0.7  # base-rate predictor logloss for a rare label
