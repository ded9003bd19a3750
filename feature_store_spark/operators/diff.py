"""Snapshot diff: row-level change audit between two versions of a
keyed table — the verification step between materialization runs
(what changed since the last snapshot? did the upsert do what it
claimed?), and the input to incremental downstream refresh.

Scale shape: ONE full-outer equi-join on the key columns (co-keyed
shuffle on both sides, AQE-skew-splittable; with bucketed storage on
the key it is exchange-free), change classification as row-local
expressions. No row hashes are materialized corpus-wide unless asked:
column comparison is null-safe equality on the compared columns.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Classify every key across two snapshots: ``added`` (new only),
    ``removed`` (old only), ``changed`` (present in both, any compared
    column differs — null-safe), ``unchanged``. Returns the key
    columns plus ``change_type``.

    ``compare_cols`` defaults to all shared non-key columns.
    """
    if compare_cols is None:
        shared = [c for c in old.columns if c in new.columns]
        compare_cols = [c for c in shared if c not in key_cols]
    o = old.select(
        *[F.col(c).alias(f"__ko_{c}") for c in key_cols],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *[F.col(c).alias(f"__kn_{c}") for c in key_cols],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(1).alias("__in_new"),
    )
    cond = None
    for c in key_cols:
        # null-safe: a NULL-keyed row must MATCH its counterpart, not
        # split into a spurious added+removed pair (plain == never
        # matches NULL to NULL)
        eq = F.col(f"__ko_{c}").eqNullSafe(F.col(f"__kn_{c}"))
        cond = eq if cond is None else cond & eq
    j = o.join(n, cond, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        *[
            F.coalesce(F.col(f"__ko_{c}"), F.col(f"__kn_{c}")).alias(c)
            for c in key_cols
        ],
        change.alias("change_type"),
    )
