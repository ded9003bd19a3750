#!/usr/bin/env python
"""Benchmark harness: run the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

  {"metric": "suite_wall_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Each query is forced with the noop sink (full execution, no driver
collect cost for large results). First query pays JVM/scan warmup; a
throwaway warmup query runs first so per-query numbers are comparable.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from feature_store_spark.queries import QUERIES  # noqa: E402
from feature_store_spark.session import get_spark, load_table  # noqa: E402

HEADLINE = [
    "pricing_summary",
    "revenue_by_nation",
    "asof_features",
    "windowed_features",
    "serving_assembly",
    "feature_stats",
    "quantile_label",
    "sessionize",
    "tree_score_topk",
    "auc_roc",
    "ndcg_at_5",
    "dedup_exact",
    "minhash_pairs",
    "ngram_jaccard",
    "simhash",
    "embedding_topk",
    "ivf_assign",
    "token_stats",
    "multimodal_meta",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("fss-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM, parquet footers, codegen
    load_table(spark, sf_dir, "lineitem").count()
    load_table(spark, sf_dir, "events").count()

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = QUERIES[name][0]
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        dt = round(time.time() - t0, 3)
        timings[name] = dt
        total += dt

    print(
        json.dumps(
            {
                "metric": "suite_wall_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
