"""Lexical and hybrid retrieval over the document corpus: BM25
scoring and reciprocal-rank fusion with the embedding ANN operators
(`operators.similarity`) — the serving side of a RAG pipeline on the
same tables the curation operators maintain.

Scale shape: the query is a handful of terms, so the corpus side is
ONE scan — doc length is an array expression (no explode), the
explode is filtered to query terms before it shuffles (rows ≈ docs
containing a query term, not corpus tokens), and every corpus-level
statistic (N, avgdl, per-term df) is a metadata-scale frame that
broadcasts. No index build is required; at 100 TB the same plan reads
a pre-materialized (doc, term, tf) posting table instead of
tokenizing inline, with identical downstream shape.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feature_store_spark.operators.text import words


def bm25_scores(
    docs: DataFrame,
    query_terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 score of every matching document for a bag of query
    terms (Lucene's non-negative idf variant:
    ``ln(1 + (N - df + 0.5) / (df + 0.5))``).

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))

    One corpus scan: per-doc length map-side, token explode filtered
    to the query terms before any shuffle, then (doc, term) tf counts,
    a broadcast join of the tiny per-term df / corpus-stats frames,
    and one per-doc sum. Docs matching no term are absent (score 0).
    ``query_terms`` is treated as a SET (the ``isin`` prune dedupes):
    a term repeated in the query scores once, not twice — same as a
    deduplicating query analyzer, unlike Lucene's per-clause sum.
    """
    if not query_terms:
        raise ValueError("bm25_scores: empty query")
    w = words(F.col(text_col))
    base = docs.select(
        F.col(id_col), w.alias("__w"), F.size(w).alias("__dl")
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("__N"), F.avg("__dl").alias("__avgdl")
    )
    qset = [t.lower() for t in query_terms]
    tall = base.select(
        F.col(id_col), F.col("__dl"), F.explode("__w").alias("__t")
    ).filter(F.col("__t").isin(qset))
    tf = tall.groupBy(id_col, "__t").agg(
        F.count(F.lit(1)).alias("__tf"), F.min("__dl").alias("__dl")
    )
    df_counts = tf.groupBy("__t").agg(F.count(F.lit(1)).alias("__df"))
    j = tf.join(F.broadcast(df_counts), "__t").crossJoin(F.broadcast(stats))
    idf = F.log(
        F.lit(1.0)
        + (F.col("__N") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )
    denom = F.col("__tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.col("__avgdl")
    )
    term_score = idf * F.col("__tf") * F.lit(k1 + 1.0) / denom
    return (
        j.groupBy(id_col)
        .agg(
            F.sum(term_score).alias("bm25"),
            F.count(F.lit(1)).alias("n_terms_matched"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kw,
) -> DataFrame:
    """Top-k BM25 documents, deterministically ordered: the score is
    rounded to 6 decimals BEFORE ranking so the order is stable across
    engines and partition-sum orders, ties break on id ascending.
    Compiles to TakeOrderedAndProject — no global sort materializes."""
    scored = bm25_scores(docs, query_terms, text_col, id_col, **kw).select(
        F.col(id_col),
        F.round("bm25", 6).alias("bm25"),
        "n_terms_matched",
    )
    return scored.orderBy(
        F.col("bm25").desc(), F.col(id_col).asc()
    ).limit(k)


def rrf_fuse(
    rankings: Sequence[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked lists (the standard hybrid
    lexical+vector combiner): rrf(d) = Σ_lists 1/(k + rank_d). Inputs
    are (id, rank) frames with rank starting at 1; candidates absent
    from a list simply contribute nothing. One union + one key-local
    aggregate — the inputs are already top-k sized, so this is
    metadata scale regardless of corpus size."""
    if not rankings:
        raise ValueError("rrf_fuse: no rankings")
    tall = rankings[0].select(F.col(id_col), F.col(rank_col))
    for r in rankings[1:]:
        tall = tall.unionByName(r.select(F.col(id_col), F.col(rank_col)))
    return tall.groupBy(id_col).agg(
        F.round(
            F.sum(F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col))), 6
        ).alias("rrf_score"),
        F.count(F.lit(1)).alias("n_lists"),
    )
