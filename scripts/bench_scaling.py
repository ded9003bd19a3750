"""Measure sf0.1 -> sf1 scaling for the most expensive bench queries.

Produces the measured decade of scaling behind docs/SCALE.md's 100 TB
claims (VERDICT r3 #8): each query runs REPS times at both scales in
one JVM (first global run warms the JIT and is discarded via the
median), and the report is the ratio of medians. ~Linear (<= ~12-13x
for 10x data on a fixed 32-core box, allowing constant per-job
overhead to amortize differently) is a pass; anything clearly
super-linear is a scale bug.

Run: python scripts/make_sf1.py && python scripts/bench_scaling.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import feature_store_spark as fss  # noqa: E402
from feature_store_spark.queries import QUERIES  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1")
SF1_FREQ = SF1.rstrip("/") + "_freq"
REPS = 3
# query -> which sf1 variant is the honest input (see make_sf1.py:
# pairwise dedup runs on the caesar corpus, token-frequency queries
# on the identical-replica corpus)
QUERY_NAMES = {
    "asof_features": SF1,
    "windowed_features": SF1,
    "sessionize": SF1,
    "drift_psi": SF1,
    "winsorized_stats": SF1,
    "corr_matrix": SF1,
    "dedup_clusters": SF1,
    "minhash_pairs": SF1,
    "ngram_jaccard": SF1,
    "calibration": SF1,
    "ece": SF1,
    "heavy_hitters": SF1_FREQ,
    "decontaminate_bloom": SF1_FREQ,
    "bpe_merges": SF1_FREQ,
    "word_entropy": SF1_FREQ,
    # round-6 additions: segment dedup on the caesar corpus (distinct
    # texts; duplicated segments come only from the planted near-dups,
    # the honest regime), perplexity buckets on the same (vocabulary
    # grows with sf), incremental agg on the 10x events table
    "segment_dedup": SF1,
    "perplexity_buckets": SF1,
    "incremental_agg": SF1,
    # round 7: bucket-guarded SemDeDup on the component-rotated 10x
    # embeddings (within-replica planted dups only -> pairs scale 10x)
    "semantic_dedup": SF1,
    # round 7 interop round trips (events-based; commit cost is
    # file-count-bound, so the decade is strongly sublinear)
    "iceberg_scan": SF1,
    "iceberg_mor_delete": SF1,
    # round 12: the conditional/by-source MERGE verbs and the
    # rollback chain (commit machinery + broadcast probes -> the
    # decade is strongly sublinear)
    "delta_merge_conditional": SF1,
    "delta_merge_sync": SF1,
    "iceberg_rollback": SF1,
}


def main() -> None:
    spark = fss.get_spark(
        "bench-scaling", master="local[32]", shuffle_partitions=32
    )
    out = {}
    for name, sf1_dir in QUERY_NAMES.items():
        fn = QUERIES[name][0]
        row = {}
        for label, sf in (("sf0.1", SF01), ("sf1", sf1_dir)):
            ts = []
            for _ in range(REPS):
                t0 = time.time()
                n = fn(spark, sf).count()
                ts.append(time.time() - t0)
            row[label] = round(statistics.median(ts), 2)
            row[f"{label}_rows"] = n
        row["ratio"] = round(row["sf1"] / row["sf0.1"], 2)
        out[name] = row
        print(json.dumps({name: row}))
    print(json.dumps({"scaling": out}))
    spark.stop()


if __name__ == "__main__":
    main()
