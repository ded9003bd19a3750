"""Exact heavy hitters in two bounded-memory passes.

The naive plan for "every item with frequency >= s*N" is a full
groupBy over ALL distinct items — at corpus scale that shuffle is
dominated by the long tail of singletons (billions of n-grams that can
never reach the threshold). The classic fix is two passes:

1. **Candidate pass** — per-partition Misra-Gries summaries with
   k = ceil(1/s) counters, run inside `mapInPandas` (per-batch
   `value_counts`, dict merge, batched decrement). MG guarantees any
   item with LOCAL count > n_p/(k+1) survives its partition's summary;
   by pigeonhole an item with GLOBAL count >= s*N exceeds that bound
   in at least one partition, so the union of partition candidates is
   a superset of the true heavy hitters. Output: <= k items per
   partition — metadata-scale, collected to the driver.
2. **Exact pass** — one more scan counting ONLY candidate items,
   then `count >= ceil(s*N)`. The tail never enters the shuffle.
   Pruning is an `isin` literal (pure codegen, zero joins) while the
   candidate set is small; above ``isin_limit`` it switches to a
   BROADCAST LEFT-SEMI JOIN against the candidate frame — a 10⁵-item
   In-list is a Catalyst plan-size/codegen hazard, a 10⁵-row broadcast
   relation is routine.

The result is byte-identical to `GROUP BY item HAVING count >= s*N` —
approximation is confined to pass 1's candidate superset.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from feature_store_spark.session import local_rows_df


def _mg_partition(col: str, k: int):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        n_part = 0
        for pdf in batches:
            n_part += len(pdf)
            for item, c in pdf[col].value_counts().items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > k:
                # batched decrement: subtract the (k+1)-th largest
                # count from everything, drop non-positives. Each
                # round removes >= (k+1)*delta total mass, so the
                # cumulative decrement of any single item is bounded
                # by n_p/(k+1) — the MG guarantee survives batching.
                delta = sorted(counters.values(), reverse=True)[k]
                counters = {
                    i: c - delta for i, c in counters.items() if c - delta > 0
                }
        if counters:
            yield pd.DataFrame(
                {col: list(counters.keys()), "__pn": 0}
            )
        if n_part:
            # the partition's item count rides out as ONE sentinel row
            # (null item) so the caller's N = sum(__pn) comes from the
            # SAME scan as the candidates — the input (often an
            # exploded n-gram stream) is expensive to recompute, and a
            # separate count() pass was a third full scan of it
            yield pd.DataFrame({col: [None], "__pn": [n_part]})

    return run


def heavy_hitters(
    df: DataFrame,
    col: str,
    support: float,
    total: int | None = None,
    isin_limit: int = 10_000,
) -> DataFrame:
    """All items of ``df[col]`` with count >= ceil(support * N), with
    their EXACT counts — equal to the full groupBy answer, without
    shuffling the tail. ``total`` short-circuits the N count when the
    caller already knows it — it MUST be the count over the same item
    universe both passes use: non-NULL (and for float columns
    non-NaN) values only. Passing a raw row count over a NULL/NaN-
    bearing column inflates the threshold relative to the filtered
    universe and silently drops borderline hitters (ADVICE r5).
    Candidate sets larger than ``isin_limit`` prune via a broadcast
    semi-join instead of an In-list literal."""
    if not (0.0 < support < 1.0):
        raise ValueError(f"support must be in (0, 1), got {support}")
    # nulls are excluded up front (pandas value_counts drops them in
    # pass 1; making pass 2 match keeps both passes over the same set).
    # Float NaN gets the SAME treatment: value_counts drops NaN too, so
    # without this filter a frequent NaN could never become a candidate
    # (silently absent from the result) while still inflating the N
    # that sets the threshold — the two passes must agree on the item
    # universe. NaN, like NULL, is "no item" here.
    items = df.select(col).filter(F.col(col).isNotNull())
    from pyspark.sql import types as _T

    if isinstance(items.schema[col].dataType, (_T.FloatType, _T.DoubleType)):
        items = items.filter(~F.isnan(F.col(col)))
    k = math.ceil(1.0 / support)

    # ONE scan produces both the MG candidate summaries and N: each
    # partition appends a null-item sentinel row carrying its item
    # count (__pn), so the separate items.count() job — a full third
    # scan of what is typically an exploded n-gram stream — only runs
    # when the caller didn't supply `total`. Output is metadata-scale
    # (<= k candidates + 1 sentinel per partition), collected once.
    # the item field is forced nullable regardless of the input's
    # nullability (ADVICE r6 #3): the sentinel rows put None in the
    # item column, and copying a containsNull=false field (e.g. from a
    # posexplode'd n-gram array) verbatim would declare a schema the
    # mapInPandas output violates under safe Arrow conversion
    out_schema = _T.StructType(
        [
            _T.StructField(f.name, f.dataType, True)
            for f in items.schema.fields
        ]
        + [_T.StructField("__pn", _T.LongType(), False)]
    )
    rows = items.mapInPandas(_mg_partition(col, k), out_schema).collect()
    n = total if total is not None else sum(r["__pn"] for r in rows)
    if n == 0:
        return items.limit(0).withColumn("cnt", F.lit(0).cast("long"))
    threshold = max(1, math.ceil(support * n))
    candidates = list({r[0] for r in rows if r[0] is not None})
    if not candidates:
        return items.limit(0).withColumn("cnt", F.lit(0).cast("long"))

    if len(candidates) <= isin_limit:
        pruned = items.filter(F.col(col).isin(candidates))
    else:
        cand_frame = local_rows_df(
            items.sparkSession, [(c,) for c in candidates], items.schema
        )
        pruned = items.join(F.broadcast(cand_frame), col, "left_semi")

    return (
        pruned.groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= threshold)
    )
