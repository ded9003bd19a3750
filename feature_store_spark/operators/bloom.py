"""Distributed Bloom filter — the shuffle-reduction primitive for
semi-joins whose "small" side is too big to broadcast exactly.

Motivating case (decontamination at pretraining scale): the eval-set
8-gram table can reach hundreds of millions of distinct grams — too
big for an exact broadcast hash join, while the corpus side is 100 TB
and must not be shuffled on raw grams. A Bloom filter of the gram set
is a few hundred MB at 1% fpp, broadcasts fine, and eliminates ~99% of
corpus-side rows map-side; the exact join that follows only sees the
survivors, so the final answer has ZERO false positives. This is the
same trick Spark itself applies internally (runtime row-level /
bloom-filter join pruning); here it is surfaced as an operator because
the engine needs it where AQE's heuristics won't reach (explode()d
gram streams, pandas-UDF stages).

Physical shape:

- build: hashing happens JVM-side (`xxhash64` twice — whole-stage
  codegen, no Python round trip for the hash), then one `mapInPandas`
  pass reduces each input partition to a single bitmap row; bitmaps
  are OR-merged incrementally on the driver (2 live bitmaps max via
  `toLocalIterator`). Cost: one scan, zero shuffles, driver memory =
  one bitmap.
- probe: the bitmap is an `sc.broadcast` numpy array; membership is a
  vectorized Arrow-batched pandas UDF over the same two JVM-computed
  hash columns — double hashing g_i = h1 + i*h2 (Kirsch-Mitzenmacher),
  numpy bit indexing, no per-row Python.

Sizing: standard m = -n ln(p) / (ln 2)^2 bits, k = (m/n) ln 2 probes.
"""

from __future__ import annotations

import math
from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_H1 = "__bloom_h1"
_H2 = "__bloom_h2"
_SEED2 = 0x9E3779B9  # fixed second-hash salt (golden-ratio constant)


def _params(n_items: int, fpp: float) -> tuple[int, int]:
    if n_items <= 0:
        raise ValueError(f"n_items must be positive, got {n_items}")
    if not (0.0 < fpp < 1.0):
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    m = int(-n_items * math.log(fpp) / (math.log(2) ** 2))
    m = max(64, (m + 7) // 8 * 8)  # whole bytes
    k = max(1, round(m / n_items * math.log(2)))
    return m, min(k, 16)


def _hash_cols(cols: Sequence[str]) -> list:
    return [
        F.xxhash64(*[F.col(c) for c in cols]).alias(_H1),
        F.xxhash64(*[F.col(c) for c in cols], F.lit(_SEED2)).alias(_H2),
    ]


def _indices(h1: np.ndarray, h2: np.ndarray, i: int, m: int) -> np.ndarray:
    # uint64 wraparound arithmetic is exactly double hashing mod 2^64,
    # then mod m — identical on build and probe sides by construction.
    return (h1 + np.uint64(i) * h2) % np.uint64(m)


class BloomFilter:
    """Immutable built filter: bit array + sizing, broadcastable."""

    def __init__(self, bits: np.ndarray, m: int, k: int):
        self.bits = bits  # uint8[m/8]
        self.m = m
        self.k = k

    @property
    def n_bytes(self) -> int:
        return self.bits.nbytes


def build_bloom(
    keys: DataFrame, cols: Sequence[str], n_items: int, fpp: float = 0.01
) -> BloomFilter:
    """One-scan distributed build over the (not necessarily distinct)
    key rows of ``keys``. ``n_items`` is the caller's cardinality
    estimate — oversizing only wastes bits, undersizing raises fpp."""
    cols = list(cols)
    m, k = _params(n_items, fpp)
    hashed = keys.select(*_hash_cols(cols))

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.zeros(m // 8, dtype=np.uint8)
        for pdf in batches:
            h1 = pdf[_H1].to_numpy(dtype=np.int64).view(np.uint64)
            h2 = pdf[_H2].to_numpy(dtype=np.int64).view(np.uint64)
            for i in range(k):
                idx = _indices(h1, h2, i, m)
                np.bitwise_or.at(
                    bits, (idx >> np.uint64(3)).astype(np.int64),
                    (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8)),
                )
        yield pd.DataFrame({"bloom": [bits.tobytes()]})

    merged = np.zeros(m // 8, dtype=np.uint8)
    for row in hashed.mapInPandas(partial, "bloom binary").toLocalIterator():
        merged |= np.frombuffer(row["bloom"], dtype=np.uint8)
    return BloomFilter(merged, m, k)


def might_contain(df: DataFrame, cols: Sequence[str], bloom: BloomFilter) -> DataFrame:
    """Append boolean ``__bloom_hit``: True for every present key, True
    with probability ~fpp for absent ones (one-sided error)."""
    cols = list(cols)
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(bloom.bits)
    m, k = bloom.m, bloom.k

    @F.pandas_udf("boolean")
    def probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
        bits = bc.value
        a1 = h1.to_numpy(dtype=np.int64).view(np.uint64)
        a2 = h2.to_numpy(dtype=np.int64).view(np.uint64)
        ok = np.ones(len(a1), dtype=bool)
        for i in range(k):
            idx = _indices(a1, a2, i, m)
            byte = bits[(idx >> np.uint64(3)).astype(np.int64)]
            ok &= (byte >> (idx & np.uint64(7)).astype(np.uint8)) & 1 != 0
        return pd.Series(ok)

    hashed = df.select("*", *_hash_cols(cols))
    return (
        hashed.withColumn("__bloom_hit", probe(F.col(_H1), F.col(_H2)))
        .drop(_H1, _H2)
    )


def bloom_semi_join(
    big: DataFrame,
    keys: DataFrame,
    on: Sequence[str],
    n_items: int,
    fpp: float = 0.01,
) -> DataFrame:
    """EXACT left-semi join of ``big`` against ``keys`` with a Bloom
    prefilter: ~(1-fpp) of non-matching big-side rows are dropped
    map-side before the exact semi join, so the shuffle carries only
    true matches plus an fpp-sized sliver of false positives. The
    exact join removes those, so the result equals a plain left-semi
    join row for row."""
    on = list(on)
    bloom = build_bloom(keys, on, n_items=n_items, fpp=fpp)
    pre = might_contain(big, on, bloom).filter(F.col("__bloom_hit")).drop("__bloom_hit")
    return pre.join(keys.select(on).distinct(), on, "left_semi")
