"""Scalar functions shared across the engine (SURVEY.md §2.8).

The md5-based hashes are cross-language contracts: the reference
implements the schema hash identically in Java
(``FeatureRegistryService.java:238-248``) and Python
(``python/gbdt_example/dataset.py:50-54``), and categorical hash
bucketing in ``python/criteo_example/dataset.py:103-108``. We reproduce
them bit-exactly as JVM-side column expressions (no Python UDF), plus a
pure-Python twin for driver-side use and a SQL twin for oracles.
"""

from __future__ import annotations

import hashlib
from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# Java modulus (Integer.MAX_VALUE). The reference's Python uses 2**31;
# they differ only when the 32-bit hash prefix is exactly 2**31 * k.
# We standardize on Java's (SURVEY.md §7.4.3).
SCHEMA_HASH_MOD = 2**31 - 1


def schema_hash_py(feature_names: Sequence[str]) -> int:
    """int(md5(",".join(names))[:8], 16) % Integer.MAX_VALUE.

    Reference: FeatureRegistryService.java:238-248.
    """
    digest = hashlib.md5(",".join(feature_names).encode("utf-8")).hexdigest()
    return int(digest[:8], 16) % SCHEMA_HASH_MOD


def schema_hash_expr(names_csv: Column) -> Column:
    """Column form of the schema hash, given a comma-joined name string.

    Stays JVM-side: md5 -> first 8 hex chars -> base-16 parse -> mod.
    """
    return (
        F.conv(F.substring(F.md5(names_csv), 1, 8), 16, 10).cast("long")
        % F.lit(SCHEMA_HASH_MOD)
    ).cast("long")


def hash_bucket_expr(value: Column, num_buckets: int = 10000) -> Column:
    """Categorical hash bucketing: int(md5(v)[:8],16) % buckets.

    Reference: python/criteo_example/dataset.py:103-108. xxhash64 would
    be cheaper at scale but breaks parity with the reference fixtures.
    """
    return (
        F.conv(F.substring(F.md5(value), 1, 8), 16, 10).cast("long")
        % F.lit(num_buckets)
    ).cast("long")


def hash_bucket_py(value: str, num_buckets: int = 10000) -> int:
    digest = hashlib.md5(value.encode("utf-8")).hexdigest()
    return int(digest[:8], 16) % num_buckets


def hex_to_bigint_sql(hex_expr_sql: str) -> str:
    """DuckDB/ANSI-ish SQL that parses a hex-string expression to BIGINT.

    Used to express the md5 hash contracts in oracle SQL.
    """
    return f"CAST(concat('0x', {hex_expr_sql}) AS BIGINT)"


def schema_hash_sql(names_csv_sql: str) -> str:
    """Oracle-SQL twin of :func:`schema_hash_expr` (DuckDB dialect)."""
    return (
        f"{hex_to_bigint_sql(f'substr(md5({names_csv_sql}), 1, 8)')}"
        f" % {SCHEMA_HASH_MOD}"
    )


def hash_bucket_sql(value_sql: str, num_buckets: int = 10000) -> str:
    return f"{hex_to_bigint_sql(f'substr(md5({value_sql}), 1, 8)')} % {num_buckets}"


def sigmoid(col: Column) -> Column:
    """1/(1+exp(-x)) — the binary:logistic / rank:* output transform
    (reference: python/cuda_codegen/generator.py:54-80)."""
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-col))


def epoch_ms(ts: Column) -> Column:
    """Timestamp -> epoch milliseconds (floor of microseconds), matching
    the proto's epoch-ms convention (feature_store.proto:39-40)."""
    return F.floor(F.unix_micros(ts) / F.lit(1000)).cast("long")
