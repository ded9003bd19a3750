import hashlib

from pyspark.sql import functions as F

from feature_store_spark.functions import (
    hash_bucket_expr,
    hash_bucket_py,
    schema_hash_expr,
    schema_hash_py,
)

# The 15-feature fraud schema (FIXTURES.md §4) — the cross-language
# golden vector: engine hash must equal the reference algorithm's.
FRAUD_FEATURES = [
    "gmv_30d", "gmv_90d", "txn_count_30d", "avg_txn_value",
    "active_days_30d", "chargeback_rate_90d", "refund_rate_30d",
    "dispute_count_90d", "fraud_reports_30d", "account_age_days",
    "days_since_last_payout", "gmv_velocity_pct", "txn_velocity_pct",
    "mcc_risk_score", "country_risk_score",
]


def reference_hash(names):
    """Independent re-statement of FeatureRegistryService.java:238-248."""
    return int(hashlib.md5(",".join(names).encode()).hexdigest()[:8], 16) % (2**31 - 1)


def test_schema_hash_matches_reference_algorithm():
    assert schema_hash_py(FRAUD_FEATURES) == reference_hash(FRAUD_FEATURES)
    assert schema_hash_py(["a", "b"]) == reference_hash(["a", "b"])


def test_schema_hash_order_sensitive():
    assert schema_hash_py(["a", "b"]) != schema_hash_py(["b", "a"])


def test_schema_hash_expr_matches_python(spark):
    csv = ",".join(FRAUD_FEATURES)
    row = spark.range(1).select(schema_hash_expr(F.lit(csv)).alias("h")).first()
    assert row["h"] == schema_hash_py(FRAUD_FEATURES)


def test_hash_bucket_expr_matches_python(spark):
    vals = ["apple", "banana", "", "z" * 100]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    got = {r["v"]: r["b"] for r in df.select("v", hash_bucket_expr(F.col("v")).alias("b")).collect()}
    for v in vals:
        assert got[v] == hash_bucket_py(v)
