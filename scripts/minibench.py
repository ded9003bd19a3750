#!/usr/bin/env python
"""Paired-subset bench: time the named queries with bench.py's exact
methodology (noop sink, warmup at sf0.001, best-of-N, cache-clear +
GC between runs) without paying for the whole suite. For A/B work run
it back-to-back on both code states — the point is a same-host pair,
which the full-suite JSONs (taken hours apart on a host whose disk
band swings 2-4x) cannot give.

Usage: python scripts/minibench.py q1 q2 ... [--runs=N] [--json=PATH]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feature_store_spark.queries import QUERIES  # noqa: E402
from feature_store_spark.session import get_spark, load_table  # noqa: E402


def main():
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 2
    out_path = None
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
        if a.startswith("--json="):
            out_path = a.split("=", 1)[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("fss-minibench")
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("lineitem", "events", "documents", "embeddings",
              "customer", "orders", "nation", "region"):
        load_table(spark, sf_dir, t).count()
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in names:
        QUERIES[name][0](spark, warm_dir).write.mode("overwrite").format(
            "noop"
        ).save()
    spark.catalog.clearCache()
    timings = {}
    for name in names:
        fn = QUERIES[name][0]
        best = None
        for _ in range(runs):
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
        timings[name] = round(best, 3)
        print(f"{name:36s} {best:7.3f}", flush=True)
    print(json.dumps(timings))
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(timings, fh)


if __name__ == "__main__":
    main()
