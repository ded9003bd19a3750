"""Materialize an sf1-scale dataset (10x sf0.1) for scaling runs.

The driver ships sf0.001/0.01/0.1 only; the 100 TB design claims need at
least one measured decade of scaling (VERDICT r3 #8 / r4 missing #3).
This replicates the sf0.1 tables 10x into $OUT (default /tmp/sf1) with
per-replica transforms chosen so PER-REPLICA statistics match sf0.1
exactly and NO structure leaks across replicas:

- lineitem: l_orderkey shifted by replica * (max+1) — row count and
  every value distribution scale 10x, key cardinality scales 10x.
- events: event_id / user_id shifted the same way (user fan-out per
  replica identical to sf0.1, 10x distinct users).
- documents: TWO variants, because no single 10x replication is
  honest for both query families:
  * <out>/documents.parquet — doc_id shifted; text Caesar-rotated by
    the replica index (a->b->c... per replica) so each replica
    carries the SAME planted near-dup/cluster structure as sf0.1
    while replicas can never match each other — pair/cluster counts
    scale exactly 10x, the honest target for PAIRWISE dedup scaling.
    (Identical replication would instead explode output
    quadratically: every doc becomes a 10-clique.) Trade-off: the
    vocabulary also scales ~10x, so this variant overstates the
    shuffle of token-FREQUENCY queries and starves their support
    thresholds.
  * <out>_freq/documents.parquet — doc_id shifted, text IDENTICAL
    across replicas (plus lineitem/events symlinks). For
    token-frequency queries (heavy hitters, BPE, entropy,
    decontamination) repeated content is exactly what a real 10x
    corpus looks like: vocabulary constant, every count 10x — the
    honest scaling input for that family. (Pairwise queries must NOT
    run against it, per the clique problem above.)

Run: python scripts/make_sf1.py [out_dir]
"""

from __future__ import annotations

import os
import string
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import feature_store_spark as fss  # noqa: E402

SRC = "/root/testdata/sf0.1"
REPLICAS = 10


def _rot(s: str, k: int) -> str:
    return s[k:] + s[:k]


def main(out_dir: str) -> None:
    spark = fss.get_spark("make-sf1", master="local[32]", shuffle_partitions=32)
    os.makedirs(out_dir, exist_ok=True)

    li = fss.load_table(spark, SRC, "lineitem")
    k_li = li.agg(F.max("l_orderkey")).first()[0] + 1
    ev = fss.load_table(spark, SRC, "events")
    k_ev = ev.agg(F.max("event_id")).first()[0] + 1
    k_u = ev.agg(F.max("user_id")).first()[0] + 1
    docs = fss.load_table(spark, SRC, "documents")
    k_d = docs.agg(F.max("doc_id")).first()[0] + 1
    emb = fss.load_table(spark, SRC, "embeddings")
    dim = len(emb.first()["embedding"])
    # clear of the +100000 band the graded dedup queries use to plant
    # scaled-copy duplicates per corpus
    k_e = 1_000_000

    lower, upper = string.ascii_lowercase, string.ascii_uppercase

    def li_rep(i):
        return li.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(i * k_li)
        )

    def ev_rep(i):
        return ev.withColumn(
            "event_id", F.col("event_id") + F.lit(i * k_ev)
        ).withColumn("user_id", F.col("user_id") + F.lit(i * k_u))

    def doc_rep(i):
        out = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * k_d))
        if i:
            out = out.withColumn(
                "text",
                F.translate(
                    "text", lower + upper, _rot(lower, i) + _rot(upper, i)
                ),
            )
        return out

    def emb_rep(i):
        # cyclic component shift by the replica index: the embedding
        # analog of the Caesar rotation on documents — preserves norms
        # and WITHIN-replica cosines exactly (both members of a planted
        # pair rotate identically), while cross-replica cosines fall to
        # random-vector noise, so pair counts scale exactly 10x
        out = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * k_e))
        if i:
            out = out.withColumn(
                "embedding",
                F.concat(
                    F.slice("embedding", i + 1, dim - i),
                    F.slice("embedding", 1, i),
                ),
            )
        return out

    orders = fss.load_table(spark, SRC, "orders")
    k_o = orders.agg(F.max("o_orderkey")).first()[0] + 1
    k_c = orders.agg(F.max("o_custkey")).first()[0] + 1

    def orders_rep(i):
        # round-8 interop decades (delta_dv_scan / delta_optimize)
        return orders.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(i * k_o)
        ).withColumn("o_custkey", F.col("o_custkey") + F.lit(i * k_c))

    customer = fss.load_table(spark, SRC, "customer")

    def customer_rep(i):
        return customer.withColumn(
            "c_custkey", F.col("c_custkey") + F.lit(i * k_c)
        )

    def doc_freq_rep(i):
        # identical text, shifted ids: the frequency-family variant
        return docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * k_d))

    def write(frames, path):
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        out.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path).count()

    for name, rep in (
        ("lineitem", li_rep),
        ("events", ev_rep),
        ("documents", doc_rep),
        ("embeddings", emb_rep),
        ("orders", orders_rep),
        ("customer", customer_rep),
    ):
        path = os.path.join(out_dir, f"{name}.parquet")
        n = write([rep(i) for i in range(REPLICAS)], path)
        print(f"{name}: {n} rows -> {path}")

    freq_dir = out_dir.rstrip("/") + "_freq"
    os.makedirs(freq_dir, exist_ok=True)
    n = write(
        [doc_freq_rep(i) for i in range(REPLICAS)],
        os.path.join(freq_dir, "documents.parquet"),
    )
    print(f"documents(freq): {n} rows -> {freq_dir}")
    for t in ("lineitem", "events", "embeddings"):
        link = os.path.join(freq_dir, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(out_dir, f"{t}.parquet"), link)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1")
