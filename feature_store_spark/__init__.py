"""feature_store_spark — a PySpark-native feature-store / analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
``geekychris/feature_store`` (see SURVEY.md), expressed Spark-first:

- every table is Parquet/Delta + DataFrame ops (no RocksDB/Redis/Rust),
- point-in-time (ASOF) training-data generation is a composed DataFrame
  transform (union + window), not an in-memory TreeMap,
- model scoring compiles tree ensembles to Catalyst expressions so the
  hot loop stays inside whole-stage codegen (the Spark analog of the
  reference's tree->C codegen, ``python/cuda_codegen/generator.py``),
- serving semantics (vector lookup, scalar assembly with defaults +
  mask + ages, staleness) are joins/pivots over online tables.

Plus the LLM-training-data operators a 100 TB pipeline needs: exact and
near dedup (MinHash/LSH, SimHash, n-gram Jaccard), embedding similarity
search, text quality/language analysis, multimodal column plumbing.
"""

from feature_store_spark.session import get_spark, load_table
from feature_store_spark.functions import (
    schema_hash_expr,
    schema_hash_py,
    hash_bucket_expr,
    sigmoid,
    hex_to_bigint_sql,
)
from feature_store_spark.operators.asof import asof_join, asof_training_set
from feature_store_spark.operators.windowed import (
    windowed_features_self,
    windowed_features_join,
)
from feature_store_spark.operators.reshape import melt, pivot_features, assemble_vectors
from feature_store_spark.operators.topk import top_k, top_k_per_group
from feature_store_spark.operators.sessionize import sessionize
from feature_store_spark.operators.skew import salted_join, salted_top_k_per_group
from feature_store_spark.operators.dedup import (
    exact_dedup,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash,
    tfidf_cosine_pairs,
)
from feature_store_spark.operators.similarity import (
    brute_force_topk,
    kmeans_fit,
    knn_join,
)
from feature_store_spark.operators.text import (
    lang_id,
    pii_scan,
    quality_score,
    repetition_stats,
    token_stats,
)
from feature_store_spark.sources.bucketed import colocated_join, write_bucketed
from feature_store_spark.training import (
    best_split_histogram,
    fit_boosted_trees,
    fit_histogram_tree,
    fit_logistic,
    predict_boosted_expr,
    predict_tree_expr,
)

__all__ = [
    "get_spark",
    "load_table",
    "schema_hash_expr",
    "schema_hash_py",
    "hash_bucket_expr",
    "sigmoid",
    "hex_to_bigint_sql",
    "asof_join",
    "asof_training_set",
    "windowed_features_self",
    "windowed_features_join",
    "melt",
    "pivot_features",
    "assemble_vectors",
    "top_k",
    "top_k_per_group",
    "sessionize",
    "salted_join",
    "salted_top_k_per_group",
    "exact_dedup",
    "minhash_dedup_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "tfidf_cosine_pairs",
    "brute_force_topk",
    "kmeans_fit",
    "knn_join",
    "lang_id",
    "pii_scan",
    "quality_score",
    "repetition_stats",
    "token_stats",
    "colocated_join",
    "write_bucketed",
    "best_split_histogram",
    "fit_boosted_trees",
    "fit_histogram_tree",
    "fit_logistic",
    "predict_boosted_expr",
    "predict_tree_expr",
]

__version__ = "0.1.0"
