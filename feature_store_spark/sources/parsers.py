"""Text-format dataset parsers (SURVEY.md §2.1 S7/S8), Spark-native.

Both parsers are pure column expressions over a text/CSV scan — no
Python in the row path, so they run at scan speed on a 100 TB dump.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from feature_store_spark.functions import hash_bucket_expr

CRITEO_INT_COLS = [f"I{i}" for i in range(1, 14)]
CRITEO_CAT_COLS = [f"C{i}" for i in range(1, 27)]


def read_criteo_tsv(
    spark: SparkSession,
    path: str,
    num_buckets: int = 10000,
) -> DataFrame:
    """Criteo click-log TSV: ``label \\t I1..I13 \\t C1..C26``.

    Reference semantics (python/criteo_example/dataset.py:115-169):
    empty numerics -> 0.0; categoricals -> md5 hash bucket
    (int(md5(v)[:8],16) % buckets), empty -> 0.0. Gzip is handled
    transparently by the text source.
    """
    # text + split, NOT spark.read.csv: the CSV source unconditionally
    # drops records whose every field is empty (verified on 4.1), so a
    # line of 39 tabs — legal Criteo, all-features-missing — silently
    # vanished instead of becoming the all-zeros row the reference
    # loader produces (review r10h). split/get/try_cast stay pure JVM
    # column expressions, so this is still a scan-speed parse; gzip is
    # handled transparently by the text source either way.
    parts = F.split(F.col("value"), "\t")

    def _part(i: int):
        # F.get: NULL (never ANSI error) beyond a short line's end
        return F.get(parts, i)

    raw = spark.read.text(path)
    out = raw.select(
        F.coalesce(_part(0).try_cast("int"), F.lit(0)).alias("label"),
        *[
            F.coalesce(_part(i + 1).try_cast("double"), F.lit(0.0)).alias(c)
            for i, c in enumerate(CRITEO_INT_COLS)
        ],
        *[
            F.when(
                _part(14 + j).isNull() | (_part(14 + j) == ""),
                F.lit(0.0),
            )
            .otherwise(
                hash_bucket_expr(_part(14 + j), num_buckets).cast("double")
            )
            .alias(c)
            for j, c in enumerate(CRITEO_CAT_COLS)
        ],
    )
    return out


def read_svmlight(
    spark: SparkSession,
    path: str,
    num_features: int = 136,
    with_qid: bool = True,
) -> DataFrame:
    """SVM-light / MSLR ranking format:
    ``relevance qid:N 1:v 2:v ... 136:v`` -> one row per line with
    ``relevance int, qid int, feature_1..feature_N double``.

    Implementation: split the line once, parse ``k:v`` pairs into a
    map via JVM-side expressions, then project the fixed feature
    columns (missing ids -> 0.0, the sparse-format convention).

    Trailing ``# comment`` text is stripped BEFORE tokenizing (review
    r10): the SVM-light spec permits it and every LETOR 3.0/4.0 dump
    ships ``#docid = ... inc = ... prob = ...`` on every line — the
    colon-less comment tokens crashed the k:v int cast under Spark 4's
    default ANSI mode, making real benchmark files unreadable.
    """
    lines = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    body = F.trim(F.substring_index(F.col("value"), "#", 1))
    lines = lines.filter(F.length(body) > 0)  # comment-only lines
    toks = F.split(body, r"\s+")
    parsed = lines.select(
        F.element_at(toks, 1).cast("int").alias("relevance"),
        toks.alias("__toks"),
    )
    if with_qid:
        parsed = parsed.withColumn(
            "qid",
            F.split(F.element_at("__toks", 2), ":").getItem(1).cast("int"),
        )
        pair_start = 3
    else:
        pair_start = 2
    pairs = F.slice(F.col("__toks"), pair_start, 10_000_000)
    # one split per token (review r10): Catalyst does not CSE inside
    # lambdas, so binding the k:v split via a nested transform halves
    # the dominant per-row regex work of the parser
    kv = F.map_from_entries(
        F.transform(
            F.transform(pairs, lambda p: F.split(p, ":", 2)),
            lambda a: F.struct(
                a.getItem(0).cast("int").alias("k"),
                a.getItem(1).cast("double").alias("v"),
            ),
        )
    )
    parsed = parsed.withColumn("__kv", kv)
    feature_cols = [
        F.coalesce(F.element_at("__kv", F.lit(i)), F.lit(0.0)).alias(f"feature_{i}")
        for i in range(1, num_features + 1)
    ]
    cols = ["relevance"] + (["qid"] if with_qid else [])
    return parsed.select(*cols, *feature_cols)
