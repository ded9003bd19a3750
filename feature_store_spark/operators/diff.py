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
    check_keys: bool = True,
) -> DataFrame:
    """Classify every key across two snapshots: ``added`` (new only),
    ``removed`` (old only), ``changed`` (present in both, any compared
    column differs — null-safe), ``unchanged``. Returns the key
    columns plus ``change_type``.

    ``compare_cols`` defaults to all shared non-key columns.

    The audit is one-verdict-per-key, so ``key_cols`` must be unique
    within each snapshot — duplicate keys would fan out through the
    full-outer join into contradictory rows (review r10l:
    double-counted 'changed' verdicts with no error). ``check_keys``
    verifies that with one aggregate per side and refuses loudly;
    pass ``False`` when uniqueness is already guaranteed upstream
    (e.g. the state table of a keyed upsert) to skip the passes.
    """
    if check_keys:
        for name, frame in (("old", old), ("new", new)):
            # groupBy keeps NULL keys as their own group, so this is
            # null-safe where count_distinct (which skips NULLs)
            # would false-positive
            dup = (
                frame.groupBy(*key_cols)
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") > 1)
                .limit(1)
                .count()
            )
            if dup:
                raise ValueError(
                    f"snapshot_diff: {name} snapshot has duplicate "
                    f"keys over {list(key_cols)} — one verdict per "
                    "key is impossible; dedupe first or fix key_cols"
                )
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
