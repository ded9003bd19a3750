"""Distributed logistic-regression trainer: separable-data sanity,
fraud-pipeline gates (the M6 acceptance path), CV fold hygiene."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from feature_store_spark.datasets.fraud import FEATURE_NAMES, generate_merchants
from feature_store_spark.metrics import auc_roc
from feature_store_spark.training import (
    cross_validate_logistic,
    fit_logistic,
    predict_expr,
    stratified_kfold_tag,
)
from feature_store_spark.validation import model_gates


def test_fit_separable(spark):
    # y = 1 iff x1 + x2 > 0, cleanly separable
    import random

    rng = random.Random(7)
    rows = []
    for i in range(400):
        x1, x2 = rng.uniform(-2, 2), rng.uniform(-2, 2)
        rows.append((f"e{i}", x1, x2, 1 if x1 + x2 > 0 else 0))
    df = spark.createDataFrame(rows, "entity_id string, x1 double, x2 double, y int")
    model = fit_logistic(df, ["x1", "x2"], "y", epochs=40, lr=1.0)
    scored = df.select(predict_expr(model).alias("score"), F.col("y").alias("label"))
    auc = auc_roc(scored, "score", "label").first()["auc_roc"]
    assert auc > 0.97
    assert model["weights"][0] > 0 and model["weights"][1] > 0


def test_fraud_training_passes_gates(spark):
    wide = generate_merchants(spark, n=3000, seed=42)
    feats = [
        "chargeback_rate_90d", "refund_rate_30d", "dispute_count_90d",
        "fraud_reports_30d", "gmv_velocity_pct", "txn_velocity_pct",
        "mcc_risk_score", "country_risk_score", "account_age_days",
    ]
    model = fit_logistic(wide, feats, "is_high_risk", epochs=30)
    scored = wide.select(
        predict_expr(model).alias("score"), F.col("is_high_risk").alias("label")
    )
    auc = auc_roc(scored, "score", "label").first()["auc_roc"]
    std = scored.agg(F.stddev("score")).first()[0]
    gates = model_gates(
        {"auc_roc": auc, "score_std": std},
        {"auc_roc_min": 0.75, "score_std_min": 0.05},
    )
    assert all(g["passed"] for g in gates), (auc, std, gates)


def test_stratified_folds(spark):
    wide = generate_merchants(spark, n=2000, seed=42)
    tagged = stratified_kfold_tag(wide, "is_high_risk", k=5)
    per_fold = tagged.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n"), F.avg("is_high_risk").alias("rate")
    ).collect()
    assert len(per_fold) == 5
    overall = tagged.agg(F.avg("is_high_risk")).first()[0]
    for r in per_fold:
        assert r["n"] > 200
        assert abs(r["rate"] - overall) < 0.06  # stratification keeps rates close


@pytest.mark.slow
def test_cross_validation(spark):
    wide = generate_merchants(spark, n=1500, seed=42)
    feats = ["chargeback_rate_90d", "fraud_reports_30d", "mcc_risk_score",
             "country_risk_score", "gmv_velocity_pct"]
    results = cross_validate_logistic(
        wide, feats, "is_high_risk", k=3, epochs=12
    )
    assert len(results) == 3
    for r in results:
        assert r["auc_roc"] > 0.6, results


def test_fit_logistic_rejects_null_and_nan(spark):
    """A NULL feature silently drops its row from the gradient (but
    not the normalizer) and one NaN poisons every weight — both must
    be loud, caught inside the existing stats pass."""
    import pytest as _pytest

    base = [(1.0, 2.0, 1), (2.0, 1.0, 0), (3.0, 0.5, 1)]
    for bad_row in [(None, 1.0, 0), (float("nan"), 1.0, 0), (1.0, 1.0, None)]:
        df = spark.createDataFrame(
            base + [bad_row], "x1 double, x2 double, y int"
        )
        with _pytest.raises(ValueError, match="NULL/NaN"):
            fit_logistic(df, ["x1", "x2"], "y", epochs=1)
