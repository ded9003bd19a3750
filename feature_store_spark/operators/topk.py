"""Top-K operators (SURVEY.md §2.6).

The reference's scoring runtime does full-score + qsort + slice-K on a
single core (runtime/ffi/scoring_shim.c:26-62) and a fused two-phase
per-block top-K on GPU (generator.py:784-911). Spark's physical
equivalent of the two-phase merge is ``TakeOrderedAndProject`` —
per-partition heaps, then a K-way merge on the driver — which
``orderBy().limit(k)`` compiles to automatically. Per-group top-K is a
window ``row_number`` (one shuffle, no global sort).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order(order_by: Sequence[Column | str]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order_by]


def top_k(df: DataFrame, k: int, order_by: Sequence[Column | str]) -> DataFrame:
    """Global top-K. Compiles to TakeOrderedAndProject (no full sort).
    k > n returns all n rows (runtime/src/engine.rs:166-174 semantics).
    Pass deterministic tie-breaker columns in ``order_by``."""
    return df.orderBy(*_order(order_by)).limit(k)


def top_k_per_group(
    df: DataFrame,
    k: int,
    group_cols: Sequence[str],
    order_by: Sequence[Column | str],
    rank_col: str = "rank",
) -> DataFrame:
    """Top-K within each group (e.g. top candidates per user — the
    ScoreTopK shape, runtime/src/grpc_service.rs:30-89; ranked results
    per query, python/mslr_example/inference.py:126-139)."""
    w = Window.partitionBy(*group_cols).orderBy(*_order(order_by))
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )
