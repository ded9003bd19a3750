"""Edge-case tests for BM25 / RRF beyond the corpus-level oracle
checks in test_queries_oracle.py."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from feature_store_spark.operators.retrieval import (
    bm25_scores,
    bm25_topk,
    rrf_fuse,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestBm25:
    def test_rare_term_outscores_common(self, spark):
        docs = _docs(
            spark,
            [(i, "common filler words here") for i in range(1, 20)]
            + [(100, "common rare"), (101, "common")],
        )
        out = {
            r["doc_id"]: r["bm25"]
            for r in bm25_scores(docs, ["common", "rare"]).collect()
        }
        # doc 100 matches the rare term too — must beat every
        # common-only doc
        assert out[100] > max(v for k, v in out.items() if k != 100)

    def test_non_matching_docs_absent(self, spark):
        docs = _docs(spark, [(1, "alpha beta"), (2, "gamma delta")])
        out = bm25_scores(docs, ["alpha"]).collect()
        assert {r["doc_id"] for r in out} == {1}

    def test_length_normalization(self, spark):
        # same tf, shorter doc scores higher (b > 0)
        docs = _docs(
            spark,
            [(1, "term " + "pad " * 50), (2, "term pad")],
        )
        out = {
            r["doc_id"]: r["bm25"] for r in bm25_scores(docs, ["term"]).collect()
        }
        assert out[2] > out[1]

    def test_idf_non_negative_even_for_ubiquitous_term(self, spark):
        docs = _docs(spark, [(i, "everywhere") for i in range(1, 6)])
        out = bm25_scores(docs, ["everywhere"]).collect()
        assert all(r["bm25"] > 0 and math.isfinite(r["bm25"]) for r in out)

    def test_empty_query_raises(self, spark):
        with pytest.raises(ValueError):
            bm25_scores(_docs(spark, [(1, "x")]), [])

    def test_topk_deterministic_tiebreak(self, spark):
        # identical docs → identical scores → id ascending
        docs = _docs(spark, [(i, "tie tie tie") for i in range(1, 8)])
        out = bm25_topk(docs, ["tie"], k=3).collect()
        assert [r["doc_id"] for r in out] == [1, 2, 3]

    def test_query_terms_case_folded(self, spark):
        docs = _docs(spark, [(1, "spark engine")])
        assert bm25_scores(docs, ["SPARK"]).count() == 1


class TestRrf:
    def test_fusion_rewards_presence_in_both_lists(self, spark):
        a = spark.createDataFrame(
            [(1, 1), (2, 2), (3, 3)], "doc_id long, rank int"
        )
        b = spark.createDataFrame(
            [(3, 1), (4, 2)], "doc_id long, rank int"
        )
        out = {
            r["doc_id"]: (r["rrf_score"], r["n_lists"])
            for r in rrf_fuse([a, b]).collect()
        }
        assert out[3][1] == 2
        # doc 3 (rank 3 + rank 1) must beat doc 1 (rank 1 only)
        assert out[3][0] > out[1][0]
        assert out[3][0] == pytest.approx(
            round(1 / 63 + 1 / 61, 6), abs=1e-9
        )

    def test_empty_rankings_raise(self, spark):
        with pytest.raises(ValueError):
            rrf_fuse([])

    def test_single_list_passthrough_order(self, spark):
        a = spark.createDataFrame(
            [(10, 1), (20, 2)], "doc_id long, rank int"
        )
        out = (
            rrf_fuse([a])
            .orderBy(F.col("rrf_score").desc())
            .collect()
        )
        assert [r["doc_id"] for r in out] == [10, 20]
