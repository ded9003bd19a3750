"""Seeded synthetic merchant-fraud dataset (SURVEY.md §2.8 X6, Appendix
B; schema per FIXTURES.md §4 / python/gbdt_example/dataset.py:24-136).

Spark's ``rand()`` cannot reproduce numpy streams, so generation runs
numpy ``default_rng`` inside ``mapInPandas`` with a per-row seed
``(seed, entity_index)`` — deterministic under any partitioning,
repartition-safe, and parallel (the counter-based-RNG pattern).
Distribution *shapes* follow the reference's table (lognormal GMV,
Poisson counts, Beta rates, uniform scores); exact coefficients of the
latent-risk mix are our own — the contract is the schema, the ~8%
positive rate via the 92nd-percentile threshold (dataset.py:114), and
determinism.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FEATURE_NAMES = [
    "gmv_30d", "gmv_90d", "txn_count_30d", "avg_txn_value",
    "active_days_30d", "chargeback_rate_90d", "refund_rate_30d",
    "dispute_count_90d", "fraud_reports_30d", "account_age_days",
    "days_since_last_payout", "gmv_velocity_pct", "txn_velocity_pct",
    "mcc_risk_score", "country_risk_score",
]

_SCHEMA = (
    "entity_id string, "
    + ", ".join(f"{n} double" for n in FEATURE_NAMES)
    + ", __latent double"
)


def _gen_rows(seed: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for i in pdf["id"]:
                rng = np.random.default_rng([seed, int(i)])
                account_age = float(rng.integers(7, 1826))
                is_new = 1.0 if account_age < 90 else 0.0
                gmv_30d = float(rng.lognormal(10.0, 1.5))
                gmv_90d = gmv_30d * float(rng.uniform(2.5, 3.5))
                txn_count = float(rng.poisson(200))
                avg_txn = gmv_30d / max(txn_count, 1.0)
                active_days = float(rng.integers(3, 32))
                chargeback = float(min(max(rng.beta(1 + 2 * is_new, 50), 0.0), 0.2))
                refund = float(min(max(rng.beta(2, 30), 0.0), 0.3))
                disputes = float(rng.poisson(1.5 + 3 * is_new))
                fraud_reports = float(rng.poisson(0.3 + 1.5 * is_new))
                payout_days = float(rng.integers(0, 31))
                gmv_vel = float(rng.normal(0.05, 0.30))
                txn_vel = float(rng.normal(0.03, 0.25))
                mcc = float(rng.uniform(0, 1))
                country = float(rng.uniform(0, 1))
                latent = (
                    3.0 * chargeback
                    + 2.0 * refund
                    + 0.25 * disputes
                    + 0.6 * fraud_reports
                    + 0.8 * max(gmv_vel, 0.0)
                    + 0.5 * max(txn_vel, 0.0)
                    + 0.7 * mcc
                    + 0.7 * country
                    + 0.5 * is_new
                    + float(rng.normal(0, 0.15))
                )
                out.append(
                    (
                        f"m_{int(i):06d}", gmv_30d, gmv_90d, txn_count, avg_txn,
                        active_days, chargeback, refund, disputes, fraud_reports,
                        account_age, payout_days, gmv_vel, txn_vel, mcc, country,
                        latent,
                    )
                )
            yield pd.DataFrame(out, columns=["entity_id", *FEATURE_NAMES, "__latent"])

    return gen


def generate_merchants(
    spark: SparkSession, n: int = 10000, seed: int = 42, label_quantile: float = 0.92
) -> DataFrame:
    """Wide merchant table with ``is_high_risk`` label (~8% positive):
    latent risk above its ``label_quantile`` (dataset.py:114)."""
    base = spark.range(n).mapInPandas(_gen_rows(seed), schema=_SCHEMA)
    thr = base.agg(F.percentile("__latent", F.lit(label_quantile)).alias("__thr"))
    return (
        base.crossJoin(F.broadcast(thr))
        .withColumn("is_high_risk", (F.col("__latent") > F.col("__thr")).cast("int"))
        .drop("__latent", "__thr")
    )
