"""Reshaping operators: melt (wide -> EAV), pivot (EAV -> wide), and
positional vector assembly (SURVEY.md §2.7 U2/U3/U5, §2.2 L6).

The reference's feature vectors are positional arrays ordered by
``feature_view_members.position`` (feature_store.proto:49-68); scalar
assembly fills gaps with defaults and records a mask + per-slot ages
(RocksDBFeatureStore.java:281-328). Here those are pivots + ``array()``
of columns in schema order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from feature_store_spark.session import local_rows_df

from feature_store_spark.functions import epoch_ms


def melt(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    name_col: str = "feature_name",
    value_col: str = "value",
) -> DataFrame:
    """Wide -> tall (attribute form). Mirrors ParquetExportHelper.java:31-60.

    Uses Spark's native ``unpivot`` (no shuffle: a generate over the
    scan), casting all value columns to double first.
    """
    casted = df.select(
        *[F.col(c) for c in id_cols],
        *[F.col(c).cast("double").alias(c) for c in value_cols],
    )
    return casted.unpivot(
        ids=list(id_cols),
        values=list(value_cols),
        variableColumnName=name_col,
        valueColumnName=value_col,
    )


def pivot_features(
    df: DataFrame,
    key_cols: Sequence[str],
    feature_names: Sequence[str],
    name_col: str = "feature_name",
    value_col: str = "value",
    agg: str = "first",
) -> DataFrame:
    """Tall -> wide. Mirrors IcebergOfflineStore.java:174-193.

    ``feature_names`` is passed to ``pivot`` explicitly so Spark skips
    the extra distinct-values job — at 100 TB that scan is not free.

    ``agg="first"`` is deterministic only when (key, name) is unique —
    on duplicates it returns a partition-order-dependent row. Reduce
    first (``latest_per_key``) or pass an order-free agg (``max``,
    ``sum``) when the input can carry duplicates.
    """
    agg_fn = getattr(F, agg)
    return (
        df.groupBy(*key_cols)
        .pivot(name_col, list(feature_names))
        .agg(agg_fn(F.col(value_col)))
    )


def latest_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Latest row per key by (time desc, tiebreaks desc) — the
    "current value" read the online store answers with RocksDB point
    lookups. One shuffle + in-partition top-1 (no full sort)."""
    order = [F.col(time_col).desc()] + [
        F.col(t).desc_nulls_last() for t in tiebreak_cols
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def assemble_vectors(
    scalars: DataFrame,
    feature_names: Sequence[str],
    defaults: dict[str, float] | None = None,
    entity_col: str = "entity_id",
    name_col: str = "feature_name",
    value_col: str = "value",
    time_col: str = "event_time",
    now_ms: int | None = None,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Scalar -> positional-vector assembly with defaults, mask and ages.

    Reference: RocksDBFeatureStore.java:281-328 — for each feature of
    the schema, MultiGet the scalar; missing -> default + mask=true +
    age=-1; present -> value + age=now-event_time.

    Output: entity_col, ``values array<double>`` (schema order),
    ``is_default_mask array<boolean>``, ``value_ages_ms array<long>``.
    """
    defaults = defaults or {}
    feature_names = list(feature_names)

    latest = latest_per_key(
        scalars.filter(F.col(name_col).isin(feature_names)),
        [entity_col, name_col],
        time_col,
        tiebreak_cols,
    )
    # ONE pivot of (value, time) structs — not two pivots + a join
    # (which would shuffle the latest-scalars twice and re-join them)
    # cast to double INSIDE the struct (review r10m): the sentinel
    # invariant is "mask true <=> default served <=> age -1", and it
    # must key on the value AS SERVED — a NULL raw value (or one that
    # fails the double cast, e.g. a string 'n/a') serves the default,
    # so its t must not leak into the age and its mask must say
    # default. assemble_flat already casts before the null check.
    pivoted = (
        latest.groupBy(entity_col)
        .pivot(name_col, feature_names)
        .agg(
            F.first(
                F.struct(
                    F.col(value_col).cast("double").alias("v"),
                    epoch_ms(F.col(time_col)).alias("t"),
                )
            )
        )
    )

    def slot(n: str):
        # pivot emits columns NAMED the feature values: access by
        # backtick-quoted name, or a feature like 'ctr.7d' parses as
        # a struct path and an entity_col-named feature goes
        # ambiguous (review r10m)
        return F.col(f"`{n}`")

    now_expr = (
        F.lit(now_ms)
        if now_ms is not None
        else epoch_ms(F.current_timestamp())
    )
    values = F.array(
        *[
            F.coalesce(
                slot(n)["v"], F.lit(float(defaults.get(n, 0.0)))
            )
            for n in feature_names
        ]
    )
    mask = F.array(*[slot(n)["v"].isNull() for n in feature_names])
    ages = F.array(
        *[
            F.when(
                slot(n)["v"].isNull() | slot(n)["t"].isNull(),
                F.lit(-1).cast("long"),
            ).otherwise((now_expr - slot(n)["t"]).cast("long"))
            for n in feature_names
        ]
    )
    return pivoted.select(
        F.col(entity_col),
        values.alias("values"),
        mask.alias("is_default_mask"),
        ages.alias("value_ages_ms"),
    )


def assemble_flat(
    scalars: DataFrame,
    entities: DataFrame,
    feature_names: Sequence[str],
    default_value: float = 0.0,
    entity_col: str = "entity_id",
    name_col: str = "feature_name",
    value_col: str = "value",
    time_col: str = "event_time",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Flat (exploded) form of vector assembly: one row per
    (entity, feature) over the full entity x schema grid, with default
    fill + is_default mask. Hash-friendly for oracle comparison and the
    natural shape to MERGE into an online table."""
    feature_names = list(feature_names)
    latest = latest_per_key(
        scalars.filter(F.col(name_col).isin(feature_names)),
        [entity_col, name_col],
        time_col,
        tiebreak_cols,
    ).select(
        F.col(entity_col),
        F.col(name_col),
        F.col(value_col).cast("double").alias("__v"),
        F.col(time_col).alias("__t"),
    )
    grid = entities.select(entity_col).distinct().crossJoin(
        F.broadcast(
            local_rows_df(
                entities.sparkSession,
                [(n,) for n in feature_names],
                # explicit DDL: an empty feature list (a view with no
                # members) must yield an empty grid, not a cannot-
                # infer-schema crash (review r10m)
                f"{name_col} string",
            )
        )
    )
    joined = grid.join(latest, [entity_col, name_col], "left")
    return joined.select(
        F.col(entity_col),
        F.col(name_col),
        F.coalesce(F.col("__v"), F.lit(default_value)).alias("value"),
        F.col("__v").isNull().alias("is_default"),
        F.col("__t").alias("event_time"),
    )
