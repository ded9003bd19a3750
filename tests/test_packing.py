from __future__ import annotations

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from feature_store_spark.operators.dedup import ngram_contamination
from feature_store_spark.operators.packing import global_prefix_sum, pack_sequences


def test_global_prefix_sum_matches_single_window(spark):
    """The bucketed two-phase scan must be bit-identical to the
    single-partition global window it replaces."""
    df = spark.range(0, 1000).select(
        F.col("id").alias("ord"),
        (F.col("id") % 13 + 1).alias("v"),
    )
    for n_buckets in (1, 7, 64):
        got = global_prefix_sum(df, "v", "ord", n_buckets=n_buckets, out_col="cum")
        w = Window.orderBy("ord").rowsBetween(Window.unboundedPreceding, Window.currentRow)
        want = df.withColumn("cum", F.sum("v").over(w))
        assert got.select("ord", "cum").subtract(want.select("ord", "cum")).count() == 0
        assert want.select("ord", "cum").subtract(got.select("ord", "cum")).count() == 0


def test_pack_sequences_placement(spark):
    docs = spark.createDataFrame(
        [(1, 100), (2, 1000), (3, 1500), (4, 2048), (5, 1), (6, 0)],
        "doc_id long, n_tokens long",
    )
    out = {r.doc_id: r for r in pack_sequences(docs, "n_tokens", seq_len=2048).collect()}
    assert 6 not in out  # zero-token docs occupy no sequence
    assert out[1].start_tok == 0 and out[1].seq_first == 0 and out[1].seq_last == 0
    # doc 3 starts at 1100, ends at 2599 -> spans sequences 0..1
    assert out[3].start_tok == 1100
    assert (out[3].seq_first, out[3].seq_last, out[3].n_seqs) == (0, 1, 2)
    # doc 4 starts at 2600, ends at 4647 -> sequences 1..2
    assert (out[4].seq_first, out[4].seq_last) == (1, 2)
    # doc 5 is exactly one token at 4648
    assert out[5].n_seqs == 1 and out[5].start_tok == 4648
    # offsets tile the token axis with no gaps or overlaps
    rows = sorted(out.values(), key=lambda r: r.doc_id)
    cursor = 0
    for r in rows:
        assert r.start_tok == cursor
        cursor += r.n_tokens


def test_ngram_contamination_counts(spark):
    train = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),      # shares the full window with eval
            (2, "z y x w v u t s r q"),      # disjoint
            (3, "a b c d e f g h zz qq"),    # shares exactly one 8-gram
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "a b c d e f g h i j k l")], "doc_id long, text string"
    )
    out = {r.doc_id: r.n_shared_ngrams for r in ngram_contamination(train, ev, n=8).collect()}
    assert out[1] == 3  # windows starting at a, b, c
    assert out[3] == 1
    assert 2 not in out


def test_mixture_sample_deterministic_and_budgeted(spark):
    from feature_store_spark.operators.packing import mixture_sample

    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 4 == 0, "en").otherwise("de").alias("lang"),
        (F.col("id") % 100 + 50).alias("tok"),
    )
    kept = mixture_sample(docs, "lang", {"en": 0.8, "de": 0.2}, 0.5, "tok")
    # deterministic under repartitioning
    kept2 = mixture_sample(docs.repartition(17), "lang", {"en": 0.8, "de": 0.2}, 0.5, "tok")
    assert kept.select("doc_id").subtract(kept2.select("doc_id")).count() == 0
    assert kept2.select("doc_id").subtract(kept.select("doc_id")).count() == 0
    # en is 25% of docs but gets 80% of a 50% budget -> keep_prob 1.0
    probs = {r.lang: r.p for r in kept.groupBy("lang").agg(F.max("keep_prob").alias("p")).collect()}
    assert probs["en"] == 1.0
    assert 0.0 < probs["de"] < 0.3
    # kept de tokens approach the de target = 0.5 * total * 0.2
    tot = docs.agg(F.sum("tok")).first()[0]
    de_kept = kept.filter(F.col("lang") == "de").agg(F.sum("tok")).first()[0]
    target = 0.5 * tot * 0.2
    assert abs(de_kept - target) / target < 0.25


def test_pack_shards_layout_and_real_write(spark, tmp_path):
    """Shard assignment math, boundary-span flags, manifest totals, and
    an actual partitionBy(shard_id) write: one directory per shard,
    rows inside each shard in global token order."""
    from feature_store_spark.operators.packing import pack_shards, shard_manifest

    # 100 docs x 100 tokens, seq_len 50 -> 2 seqs/doc; 4 seqs/shard ->
    # exactly 2 docs per shard, no spanning (all boundaries align)
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit(100).alias("n_tokens")
    )
    shards = pack_shards(
        docs, "n_tokens", seq_len=50, seqs_per_shard=4, n_buckets=8
    )
    man = {r["shard_id"]: r for r in shard_manifest(shards).collect()}
    assert len(man) == 50
    assert all(r["n_docs"] == 2 and r["tokens_started"] == 200 for r in man.values())
    assert all(r["n_spanning_docs"] == 0 for r in man.values())
    assert man[0]["first_doc_id"] == 0 and man[0]["last_doc_id"] == 1

    # misaligned: 150-token docs over 50-token seqs, 4 seqs/shard ->
    # every 200-token shard boundary falls mid-doc for odd docs
    docs2 = spark.range(8).select(
        F.col("id").alias("doc_id"), F.lit(150).alias("n_tokens")
    )
    shards2 = pack_shards(
        docs2, "n_tokens", seq_len=50, seqs_per_shard=4, n_buckets=4
    )
    spans = {
        r["doc_id"]: r["spans_next_shard"] for r in shards2.collect()
    }
    # doc k occupies tokens [150k, 150k+150); shard = 200 tokens
    assert spans == {k: (k * 150) // 200 != (k * 150 + 149) // 200 for k in range(8)}

    # real write: partitionBy(shard_id) -> one dir per shard, rows in
    # token order within each shard file
    out = str(tmp_path / "shards")
    shards.write.mode("overwrite").partitionBy("shard_id").parquet(out)
    import os

    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard_id="))
    assert len(dirs) == 50
    back = spark.read.parquet(f"{out}/shard_id=7")
    rows = [r["start_tok"] for r in back.orderBy("offset_in_shard").collect()]
    assert rows == sorted(rows) and len(rows) == 2
    offs = {r["offset_in_shard"] for r in back.collect()}
    assert offs == {0, 100}  # doc offsets inside the 200-token shard


def test_prefix_sum_cache_release_handle(spark):
    """The persist that keeps tokenization single-pass is exposed on
    the result and release_prefix_sum_cache() drops it (the
    cache-leak guard)."""
    from pyspark.storagelevel import StorageLevel

    from feature_store_spark.operators.packing import (
        pack_sequences,
        release_prefix_sum_cache,
    )

    docs = spark.createDataFrame(
        [(i, 10 + i) for i in range(100)], "doc_id long, n_tokens long"
    )
    out = pack_sequences(docs, "n_tokens", seq_len=64)
    out.count()  # materialize while the cache is live
    cached = out._fss_persisted_input
    assert cached is not None
    assert cached.storageLevel != StorageLevel.NONE
    release_prefix_sum_cache(out)
    assert cached.storageLevel == StorageLevel.NONE
    release_prefix_sum_cache(docs)  # frames without a handle: no-op


class TestPackingGuards:
    """Review r5 guards: loud refusal over silent corruption."""

    def test_null_order_key_rejected(self, spark):
        from feature_store_spark.operators.packing import global_prefix_sum

        df = spark.createDataFrame(
            [(1, 10), (None, 20), (3, 30)], "doc_id long, n long"
        )
        with pytest.raises(ValueError, match="NULL"):
            global_prefix_sum(df, "n", order_col="doc_id")

    def test_non_numeric_order_col_rejected(self, spark):
        from feature_store_spark.operators.packing import global_prefix_sum

        df = spark.createDataFrame(
            [("doc_a", 10)], "doc_id string, n long"
        )
        with pytest.raises(TypeError, match="numeric"):
            global_prefix_sum(df, "n", order_col="doc_id")

    def test_mixture_zero_token_group_keeps_nothing_no_crash(self, spark):
        """A zero-token group must not DIVIDE_BY_ZERO the job under
        ANSI mode — it keeps nothing (zero mass, zero share)."""
        from feature_store_spark.operators.packing import mixture_sample

        docs = spark.createDataFrame(
            [(1, "web", 100), (2, "empty", 0), (3, "empty", 0)],
            "doc_id long, source string, n_tokens long",
        )
        out = mixture_sample(
            docs, "source", {"web": 0.5, "empty": 0.5},
            budget_frac=1.0, token_col="n_tokens",
        )
        assert {r["source"] for r in out.collect()} <= {"web"}

    def test_doc_spanning_two_boundaries_raises(self, spark):
        from feature_store_spark.operators.packing import pack_shards

        docs = spark.createDataFrame(
            [(1, 10), (2, 700)], "doc_id long, n_tokens long"
        )
        # shard = 4 seqs x 64 tokens = 256 tokens; doc 2 covers 3 shards
        with pytest.raises(Exception, match="more than one shard"):
            pack_shards(
                docs, "n_tokens", seq_len=64, seqs_per_shard=4
            ).collect()

    def test_release_all_outstanding_caches(self, spark):
        from feature_store_spark.operators.packing import (
            global_prefix_sum,
            release_prefix_sum_cache,
        )
        from pyspark.storagelevel import StorageLevel

        df = spark.createDataFrame([(1, 10), (2, 20)], "doc_id long, n long")
        out = global_prefix_sum(df, "n", order_col="doc_id")
        projected = out.select("doc_id")  # handle attribute lost here
        projected.count()
        cached = out._fss_persisted_input
        assert cached.storageLevel != StorageLevel.NONE
        release_prefix_sum_cache()  # no-arg: releases outstanding
        assert cached.storageLevel == StorageLevel.NONE


def test_packing_guards_r10(spark):
    """Review r10i: infinite order keys, non-positive knobs, and int
    weights all refuse loudly or coerce instead of silently emptying
    the frame / crashing in createDataFrame internals."""
    import pytest as _pt
    from pyspark.sql import functions as F

    from feature_store_spark.operators.packing import (
        global_prefix_sum,
        mixture_sample,
        pack_sequences,
        pack_shards,
    )

    inf = float("inf")
    df = spark.createDataFrame(
        [(1.0, 10), (2.0, 20), (inf, 30)], "k double, v int"
    )
    with _pt.raises(ValueError, match="infinite"):
        global_prefix_sum(df, "v", "k")
    ok = spark.createDataFrame([(1.0, 10), (2.0, 20)], "k double, v int")
    with _pt.raises(ValueError, match="n_buckets"):
        global_prefix_sum(ok, "v", "k", n_buckets=0)
    docs = spark.createDataFrame(
        [(1, 100), (2, 200)], "doc_id long, n_tok int"
    )
    with _pt.raises(ValueError, match="seq_len"):
        pack_sequences(docs, "n_tok", seq_len=0)
    with _pt.raises(ValueError, match="seqs_per_shard"):
        pack_shards(docs, "n_tok", seqs_per_shard=0)
    # int weights coerce (previously a PySparkTypeError)
    mixed = spark.createDataFrame(
        [(1, "en", 100), (2, "de", 100)], "doc_id long, lang string, t int"
    )
    out = mixture_sample(mixed, "lang", {"en": 1, "de": 2}, 1.0, "t")
    assert out.count() >= 1
