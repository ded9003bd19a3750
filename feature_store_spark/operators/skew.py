"""Skew handling: explicit salting for hot keys.

At 100 TB a handful of hot entities (one viral user, one boilerplate
document cluster) can pin an entire shuffle partition to one task.
Spark's AQE skew-join splitting (on in session.py) handles skewed
*sort-merge joins* at runtime; these operators cover the two shapes
AQE does not re-plan:

- a skewed equi-join where the probe side's hot key floods one task
  even after AQE splitting of map outputs (``salted_join``),
- a per-group window (rank / top-k) whose hot group serializes into a
  single task, since windows cannot be split by AQE at all
  (``salted_top_k_per_group``).

Both are semantics-exact rewrites: salting only changes WHERE rows
meet, never which rows meet.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "__salt") -> DataFrame:
    """Deterministic per-row salt in [0, n_salts): xxhash64 of the full
    row, so reruns and retried tasks salt identically (no rand(), which
    would break retry idempotency mid-shuffle).

    Limitations (by construction of hashing row content):

    - EXACT duplicate rows all hash to the same salt, so a hot key made
      of identical rows (repeated spam/log lines) is NOT split. Dedup
      first, or add a distinguishing column (an event id, a file/offset
      pair) before salting — any deterministic disambiguator restores
      the split without sacrificing retry idempotency.
    - ``xxhash64`` rejects map-typed columns; pass a projection without
      them (the salt only needs enough columns to spread rows).
    """
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)).cast("int")
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has hot join keys: salt the skewed
    side (splitting each hot key across ``n_salts`` tasks) and
    replicate ``other`` once per salt value, joining on (key, salt).

    Cost model: ``other`` is scanned/shuffled ``n_salts`` x — use when
    ``other`` is far smaller than the hot key's row count but too big
    to broadcast. Same rows as the plain join for ``how`` in
    {inner, left, left_outer, left_semi, left_anti}. Outer-on-the-
    replicated-side joins (right/full) are REJECTED: each unmatched
    ``other`` row would surface once per salt replica (n_salts
    duplicates), so this rewrite cannot express them — flip the sides
    or use a plain join.
    """
    allowed = {"inner", "left", "left_outer", "leftouter",
               "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — the replicated right "
            "side would duplicate unmatched rows once per salt; use "
            "inner/left/left_semi/left_anti or flip the sides"
        )
    keys = [on] if isinstance(on, str) else list(on)
    s = with_salt(skewed, n_salts)
    rep = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return s.join(rep, keys + ["__salt"], how).drop("__salt")


def salted_top_k_per_group(
    df: DataFrame,
    k: int,
    group_cols: Sequence[str],
    order_by: Sequence[Column | str],
    n_salts: int = 8,
    rank_col: str = "rank",
) -> DataFrame:
    """Per-group top-K with a two-phase salted plan: local top-K within
    (group, salt) — each hot group's work spread over ``n_salts`` tasks
    — then final top-K per group over the ≤ k * n_salts survivors.
    Same result as the single-window top-K (deterministic given
    tie-breaking ``order_by``), but the hot group never serializes into
    one task. The same trick as TakeOrderedAndProject's two-phase
    merge, applied per group.

    ``rank_col`` names the emitted rank — same knob (and same reused
    phase-2 implementation) as :func:`operators.topk.top_k_per_group`;
    a hardcoded 'rank' used to silently overwrite an existing column
    of that name (review r10l). A clash still refuses loudly.
    """
    from feature_store_spark.operators.topk import top_k_per_group

    if rank_col in df.columns:
        raise ValueError(
            f"salted_top_k_per_group: input already has a column "
            f"{rank_col!r} — pass rank_col= to avoid silently "
            "overwriting it"
        )
    order = [F.col(c) if isinstance(c, str) else c for c in order_by]
    s = with_salt(df, n_salts)
    w1 = Window.partitionBy(*group_cols, "__salt").orderBy(*order)
    local = (
        s.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= k)
        .drop("__rn", "__salt")
    )
    return top_k_per_group(local, k, group_cols, order_by, rank_col=rank_col)
