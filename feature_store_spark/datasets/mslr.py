"""Seeded synthetic MSLR-style learning-to-rank dataset (SURVEY.md
Appendix B; python/mslr_example/dataset.py:49-271 semantics: queries
with ~docs-per-query docs, 136 features correlated to a latent
relevance, graded relevance 0-4 via latent quantile thresholds
60/80/92/97%, SVM-light text rendering for parser round-trips).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NUM_FEATURES = 136
# correlation per feature block (dataset.py:225-240 shape)
_BLOCK_CORR = [0.5, 0.3, 0.15, 0.35]


def _gen(seed: int, docs_per_query: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for qid in pdf["id"]:
                rng = np.random.default_rng([seed, int(qid)])
                for d in range(docs_per_query):
                    latent = float(rng.normal(0, 1))
                    feats = []
                    for j in range(NUM_FEATURES):
                        corr = _BLOCK_CORR[j * len(_BLOCK_CORR) // NUM_FEATURES]
                        feats.append(
                            corr * latent + float(rng.normal(0, 1)) * (1 - corr)
                        )
                    rows.append(
                        (f"q{int(qid)}_d{d}", int(qid), latent, *feats)
                    )
            yield pd.DataFrame(
                rows,
                columns=["entity_id", "qid", "__latent"]
                + [f"feature_{j+1}" for j in range(NUM_FEATURES)],
            )

    return gen


def generate_docs(
    spark: SparkSession,
    n_queries: int = 200,
    docs_per_query: int = 20,
    seed: int = 42,
) -> DataFrame:
    """Query-doc table with graded relevance 0-4 by global latent
    quantiles 60/80/92/97% (dataset.py:253-261)."""
    schema = (
        "entity_id string, qid long, __latent double, "
        + ", ".join(f"feature_{j+1} double" for j in range(NUM_FEATURES))
    )
    base = spark.range(n_queries).mapInPandas(_gen(seed, docs_per_query), schema=schema)
    thr = base.agg(
        F.percentile("__latent", F.array(*[F.lit(q) for q in (0.60, 0.80, 0.92, 0.97)])).alias("__q")
    )
    out = base.crossJoin(F.broadcast(thr)).withColumn(
        "relevance",
        F.when(F.col("__latent") > F.col("__q")[3], 4)
        .when(F.col("__latent") > F.col("__q")[2], 3)
        .when(F.col("__latent") > F.col("__q")[1], 2)
        .when(F.col("__latent") > F.col("__q")[0], 1)
        .otherwise(0)
        .cast("int"),
    )
    return out.drop("__latent", "__q")


def to_svmlight(df: DataFrame, num_features: int = NUM_FEATURES) -> DataFrame:
    """Render rows as SVM-light lines (S8 inverse, for parser
    round-trip tests): ``relevance qid:N 1:v ... 136:v``."""
    pairs = [
        F.concat_ws(":", F.lit(str(j + 1)), F.col(f"feature_{j+1}").cast("string"))
        for j in range(num_features)
    ]
    line = F.concat_ws(
        " ",
        F.col("relevance").cast("string"),
        F.concat(F.lit("qid:"), F.col("qid").cast("string")),
        *pairs,
    )
    return df.select(line.alias("value"))
