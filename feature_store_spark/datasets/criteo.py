"""Seeded synthetic Criteo-style CTR dataset (SURVEY.md Appendix B;
python/criteo_example/dataset.py:31-380 semantics: 13 count-like
numerics I1..I13, 26 md5-hash-bucketed categoricals C1..C26 drawn
Zipf-style, ~3.4% click rate, chronological split).

Same determinism pattern as datasets.fraud: per-row
``default_rng([seed, id])`` inside mapInPandas.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feature_store_spark.functions import hash_bucket_py

INT_COLS = [f"I{i}" for i in range(1, 14)]
CAT_COLS = [f"C{i}" for i in range(1, 27)]

_SCHEMA = (
    "entity_id string, ts_index long, click int, "
    + ", ".join(f"{c} double" for c in INT_COLS)
    + ", "
    + ", ".join(f"{c} double" for c in CAT_COLS)
)


def _gen(seed: int, num_buckets: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                rng = np.random.default_rng([seed, int(i)])
                ints = [
                    float(rng.poisson(5)) if j % 2 == 0
                    else float(np.floor(rng.lognormal(2.0, 1.0)))
                    for j in range(13)
                ]
                # Zipf(1.5) category ids -> md5 hash bucket (X2)
                cats = []
                n_hot = 0
                for j in range(26):
                    cat_id = int(min(rng.zipf(1.5), 100000))
                    cats.append(float(hash_bucket_py(f"c{j}_{cat_id}", num_buckets)))
                    n_hot += 1 if cat_id == 1 else 0
                # click as log-odds of hot-category count + two integer
                # signals + noise: base rate ~4-5%, enough separation
                # (sigma_z ~ 0.9) that a trained CTR model can clear the
                # reference's AUC>=0.65 gate, as real Criteo data does
                z = (
                    -6.6
                    + 0.35 * n_hot
                    + 0.9 * (ints[0] > 8)
                    + 0.7 * (ints[1] > 10)
                    + float(rng.normal(0, 0.3))
                )
                p = min(max(1.0 / (1.0 + np.exp(-z)), 0.001), 0.9)
                click = 1 if rng.random() < p else 0
                rows.append((f"imp_{int(i):08d}", int(i), click, *ints, *cats))
            yield pd.DataFrame(
                rows, columns=["entity_id", "ts_index", "click", *INT_COLS, *CAT_COLS]
            )

    return gen


def generate_impressions(
    spark: SparkSession, n: int = 20000, seed: int = 42, num_buckets: int = 10000
) -> DataFrame:
    """Impression table; ``ts_index`` is the chronological order key
    for the last-20%-is-test split (dataset.py:352-355)."""
    return spark.range(n).mapInPandas(_gen(seed, num_buckets), schema=_SCHEMA)


def chronological_split(df: DataFrame, test_fraction: float = 0.2) -> DataFrame:
    """Tag train/test by ts_index quantile (U4)."""
    thr = df.agg(
        F.percentile(F.col("ts_index").cast("double"), F.lit(1.0 - test_fraction)).alias("__t")
    )
    return (
        df.crossJoin(F.broadcast(thr))
        .withColumn(
            "split",
            F.when(F.col("ts_index").cast("double") <= F.col("__t"), "train").otherwise(
                "test"
            ),
        )
        .drop("__t")
    )
