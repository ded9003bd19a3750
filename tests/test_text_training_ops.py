"""Semantic unit tests for the round-2 operators: repetition stats,
PII scan, TF-IDF cosine pairs, histogram split finding, and the
streaming dedup aggregation (oracle parity is covered separately by
test_queries_oracle)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "spam spam spam spam"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "a b a b a b a b"),
        ],
        ["doc_id", "text"],
    )


def test_repetition_stats(spark, docs):
    from feature_store_spark.operators.text import repetition_stats

    rows = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    # doc 1: one word repeated 4x -> top word 100%, bigram "spam spam" 3/3
    assert rows[1]["top_word_frac"] == 1.0
    assert rows[1]["top_bigram_frac"] == 1.0
    assert rows[1]["dup_word_frac"] == pytest.approx(0.75)
    # doc 2: "the" twice over 9 words; every bigram unique
    assert rows[2]["top_word_frac"] == pytest.approx(2 / 9)
    assert rows[2]["top_bigram_frac"] == pytest.approx(1 / 8)
    # doc 3: "a b" occurs 4x of 7 bigrams
    assert rows[3]["top_bigram_frac"] == pytest.approx(4 / 7)


def test_pii_scan(spark):
    from feature_store_spark.operators.text import pii_scan

    df = spark.createDataFrame(
        [
            (1, "mail me at bob.smith+x@corp.example.org thanks"),
            (2, "server 192.168.0.1 and backup 10.0.0.254"),
            (3, "call +1 (555) 123-4567 today"),
            (4, "nothing sensitive here"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in pii_scan(df).collect()}
    assert rows[1]["emails"] == 1 and rows[1]["has_pii"]
    assert rows[2]["ipv4s"] == 2 and rows[2]["pii_total"] == 2
    assert rows[3]["phones"] == 1
    assert rows[4]["pii_total"] == 0 and not rows[4]["has_pii"]


def test_tfidf_cosine_identical_docs(spark):
    from feature_store_spark.operators.dedup import tfidf_cosine_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, "one two three four five six seven")],
        ["doc_id", "text"],
    )
    out = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(df, rare_df_max=4, threshold=0.5).collect()
    }
    # identical docs -> cosine exactly 1; disjoint doc pairs absent
    assert out[(1, 2)] == pytest.approx(1.0)
    assert (1, 3) not in out and (2, 3) not in out


def test_best_split_histogram(spark):
    from feature_store_spark.training import best_split_histogram

    # y jumps at bin <= 2 | bin >= 3: perfect split at threshold_bin 2
    rows = [(b, 0.0) for b in (1, 2) for _ in range(10)] + [
        (b, 10.0) for b in (3, 4) for _ in range(10)
    ]
    df = spark.createDataFrame(rows, ["bin", "y"])
    out = best_split_histogram(
        df, feature_bin_col="bin", target_col="y"
    ).collect()
    assert len(out) == 1
    best = out[0]
    assert best["threshold_bin"] == 2
    # gain = GL^2/nL + GR^2/nR - G^2/n = 0 + 200^2/20 - 200^2/40 = 1000
    assert best["gain"] == pytest.approx(1000.0)


def test_best_split_histogram_grouped_ties(spark):
    from feature_store_spark.training import best_split_histogram

    # group "flat": y constant -> all gains 0 -> tie broken to the
    # SMALLEST threshold for determinism
    rows = [("flat", b, 5.0) for b in (1, 2, 3)] + [
        ("step", 1, 0.0),
        ("step", 2, 8.0),
    ]
    df = spark.createDataFrame(rows, ["grp", "bin", "y"])
    out = {
        r["grp"]: r
        for r in best_split_histogram(
            df, feature_bin_col="bin", target_col="y", group_cols=["grp"]
        ).collect()
    }
    assert out["flat"]["threshold_bin"] == 1
    assert out["flat"]["gain"] == pytest.approx(0.0)
    assert out["step"]["threshold_bin"] == 1
    assert out["step"]["gain"] == pytest.approx(32.0)


def test_tfidf_weights_match_formula(spark):
    from feature_store_spark.operators.dedup import tfidf_cosine_pairs

    # two docs sharing one word; verify the cosine against a hand
    # computation of log-tf x smoothed-idf
    df = spark.createDataFrame(
        [(1, "x x shared"), (2, "y shared")], ["doc_id", "text"]
    )
    out = tfidf_cosine_pairs(df, rare_df_max=4, threshold=0.0).collect()
    assert len(out) == 0 or True  # blocking uses 3-word shingles; both
    # docs are shorter than 3 words -> shingle of whole doc, disjoint ->
    # no candidate pair. Rebuild with longer docs:
    a = "p q r shared tail one"
    b = "p q r shared tail two"
    df = spark.createDataFrame([(1, a), (2, b)], ["doc_id", "text"])
    got = tfidf_cosine_pairs(df, rare_df_max=4, threshold=0.0).collect()
    assert len(got) == 1
    n = 2.0

    def idf(dfreq):
        return math.log((n + 1) / (dfreq + 1)) + 1

    shared_w = idf(2)  # words p q r shared tail in both docs, tf=1
    only_w = idf(1)  # "one"/"two"
    dot = 5 * shared_w * shared_w
    nrm = math.sqrt(5 * shared_w**2 + only_w**2)
    assert got[0]["cosine"] == pytest.approx(dot / (nrm * nrm))


class TestTextNullGuards:
    """Review r5: case-insensitive PII, null-text completeness, and
    the expression-size guard."""

    def test_pii_scan_catches_uppercase_and_null_text(self, spark):
        from feature_store_spark.operators.text import pii_scan

        docs = spark.createDataFrame(
            [
                (1, "contact Bob.Smith@Corp.Example.ORG today"),
                (2, None),
                (3, "clean text only"),
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in pii_scan(docs).collect()}
        assert out[1]["emails"] == 1 and out[1]["has_pii"] is True
        assert out[2]["pii_total"] == 0 and out[2]["has_pii"] is False
        assert out[3]["has_pii"] is False

    def test_word_entropy_keeps_null_text_docs(self, spark):
        from feature_store_spark.operators.text import word_entropy

        docs = spark.createDataFrame(
            [(1, None), (2, ""), (3, "a a b")], "doc_id long, text string"
        )
        out = {r["doc_id"]: r for r in word_entropy(docs).collect()}
        assert set(out) == {1, 2, 3}
        assert out[1]["n_words"] == 0 and out[1]["word_entropy"] == 0.0

    def test_token_stats_null_text_counts_zero(self, spark):
        from feature_store_spark.operators.text import token_stats

        docs = spark.createDataFrame(
            [(1, None), (2, "a b")], "doc_id long, text string"
        )
        out = {r["doc_id"]: r for r in token_stats(docs).collect()}
        assert out[1]["n_words"] == 0
        assert out[2]["n_words"] == 2

    def test_bpe_tokenize_expr_rejects_huge_merge_lists(self, spark):
        import pytest as _pytest

        from feature_store_spark.operators.text import bpe_tokenize_expr
        from pyspark.sql import functions as SF

        merges = [(str(i), str(i + 1), 1) for i in range(300)]
        with _pytest.raises(ValueError, match="64KB|merges"):
            bpe_tokenize_expr(SF.lit("a b"), merges)


def test_gopher_quality_rules_each_fire(spark):
    """Gopher rules (Rae et al. appendix A defaults): each rule
    individually rejects its crafted violator; a clean doc passes."""
    from pyspark.sql import functions as F

    from feature_store_spark.operators.text import gopher_quality

    good = ("the quick brown fox jumps over the lazy dog and then "
            "walks to be with all of that crowd have mild fun ") * 3
    rows = [
        (1, good),                                    # passes everything
        (2, "the of and"),                            # too few words
        (3, " ".join(["x"] * 60) + " the be of and that"),  # mean len < 3
        (4, good + " " + "#" * 200),                  # symbol ratio
        (5, "\n".join(["- bullet line the be of"] * 10)),   # bullets
        (6, good.replace("fox", "12345 67890 4242 777 999 111 222 333 "
                                "444 555 666 888 000 123 456 789 321 "
                                "654 987 135")),      # alpha frac < 0.8
        (7, " ".join(["word"] * 80)),                 # no stop words
        (8, None),                                    # null text
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in gopher_quality(docs).collect()}
    assert out[1]["keep"] is True
    for bad in (2, 3, 4, 5, 7, 8):
        assert out[bad]["keep"] is False, (bad, out[bad])
    assert out[6]["alpha_word_frac"] < 0.8 and out[6]["keep"] is False
    assert out[8]["n_words"] == 0
    # ellipsis rule: multi-line doc where >30% of lines end with ...
    dots = spark.createDataFrame(
        [(9, "\n".join(["the line be of and that ..."] * 5
                       + ["plain line the be"] * 5))],
        "doc_id long, text string",
    )
    [r9] = gopher_quality(dots).collect()
    assert r9["ellipsis_frac"] == 0.5 and r9["keep"] is False
    # wide-open thresholds keep everything scoreable
    open_keep = gopher_quality(
        docs.filter(F.col("text").isNotNull()),
        min_words=1, min_mean_word_len=0.0, max_mean_word_len=99.0,
        max_symbol_ratio=9.0, max_bullet_frac=1.0,
        max_ellipsis_frac=1.0, min_alpha_word_frac=0.0,
        min_stop_hits=0,
    )
    assert all(r["keep"] for r in open_keep.collect())
