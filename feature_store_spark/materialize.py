"""Materialization: wide feature DataFrames -> online vector table, and
vector melt back to offline EAV records (SURVEY.md §2.1 S12, §2.7 U2,
§3.4).

The reference's MaterializationService (MaterializationService.java:
60-124) writes protobuf vectors to RocksDB + Redis and melts them into
offline records with positional names ``feature_i``. Here both targets
are tables; the vector layout (positional values + mask + ages +
schema_hash envelope, feature_store.proto:49-68) is preserved exactly.

Scale notes: materialization is the write-heavy stage at 100 TB —
the output is partitioned by view and bucketable by entity_id so the
serving join (L2) can be a bucket-local join; writes are append-only
(MERGE in Delta for scalar upserts).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from feature_store_spark.functions import epoch_ms, schema_hash_py
from feature_store_spark.registry import FeatureView


def transform_expr(view: FeatureView, name: str, col: str | None = None) -> Column:
    """The member's declared transform as a Catalyst Column
    (SURVEY.md §2.12; V1__init.sql:66-67 ``transform`` /
    ``transform_params`` — declared in the reference's schema but never
    evaluated there; here they are honored as SQL expression templates).

    The template references the raw value as ``{col}`` plus any named
    parameters, e.g. ``"least(greatest({col}, {lo}), {hi})"``. Staying
    a SQL expression keeps the transform inside whole-stage codegen —
    no UDF, full pushdown/pruning around it."""
    tpl = view.transforms.get(name)
    c = col if col is not None else name
    if tpl is None:
        return F.col(c)
    return F.expr(tpl.format(col=f"`{c}`", **view.transform_params.get(name, {})))


def apply_transforms(wide: DataFrame, view: FeatureView) -> DataFrame:
    """Apply every member transform to its feature column of a wide
    frame (identity for members with no transform). Runs at
    materialization time — the offline store keeps raw values; the
    online vector holds transformed ones, so training and serving see
    the same feature definition.

    Null-preserving by construction: a missing raw value stays missing
    through the transform (so the default mask still reflects source
    missing-ness), even when the template uses null-swallowing
    functions like greatest/least."""
    out = wide
    for n in view.feature_names:
        if n in view.transforms:
            out = out.withColumn(
                n,
                F.when(F.col(n).isNull(), F.lit(None)).otherwise(
                    transform_expr(view, n)
                ),
            )
    return out


def materialize_vectors(
    wide: DataFrame,
    view: FeatureView,
    entity_col: str = "entity_id",
    event_time_col: str | None = None,
    now_ms: int | None = None,
) -> DataFrame:
    """Wide row per entity -> online vector row (FIXTURES.md §7 schema).

    Missing/null feature columns become defaults with mask=true —
    the write-side mirror of scalar assembly (L6). Member transforms
    (§2.12) are applied first; defaults are post-transform values.
    """
    if view.transforms:
        wide = apply_transforms(wide, view)
    names = view.feature_names
    # try_cast everywhere (review r10): a non-numeric value in a
    # string-typed feature column ('N/A') must become the DEFAULT with
    # mask=true and age=-1 — a plain cast ANSI-aborts the whole job,
    # and keying the mask on pre-cast nullness would present the
    # fabricated default as a fresh real value. values/mask/ages all
    # key on the SAME try_cast nullness so the trio cannot disagree.
    values = F.array(
        *[
            F.coalesce(
                F.col(n).try_cast("double"),
                F.lit(float(view.defaults.get(n, 0.0))),
            )
            for n in names
        ]
    )
    mask = F.array(*[F.col(n).try_cast("double").isNull() for n in names])
    now_expr = F.lit(now_ms) if now_ms is not None else epoch_ms(F.current_timestamp())
    if event_time_col is not None:
        age = now_expr - epoch_ms(F.col(event_time_col))
        ages = F.array(
            *[
                F.when(
                    F.col(n).try_cast("double").isNull(), F.lit(-1)
                ).otherwise(age)
                for n in names
            ]
        )
    else:
        ages = F.array(*[F.lit(-1).cast("long") for _ in names])
    return wide.select(
        F.lit(view.name).alias("view_name"),
        F.lit(view.version).alias("view_version"),
        F.lit(view.entity).alias("entity_type"),
        F.col(entity_col).alias("entity_id"),
        values.alias("values"),
        mask.alias("is_default_mask"),
        ages.cast("array<bigint>").alias("value_ages_ms"),
        now_expr.cast("long").alias("served_at_ms"),
        F.lit(view.schema_hash).cast("long").alias("schema_hash"),
    )


def melt_vectors_to_records(
    vectors: DataFrame,
    feature_names: Sequence[str] | None = None,
    positional_names: bool = False,
) -> DataFrame:
    """Vectors -> offline EAV records.

    positional_names=True reproduces the reference's placeholder
    ``feature_i`` naming (MaterializationService.java:102-121);
    otherwise pass the view's real feature_names.
    """
    if positional_names:
        name_expr = F.concat(F.lit("feature_"), F.col("pos").cast("string"))
    else:
        if feature_names is None:
            raise ValueError(
                "melt_vectors_to_records: pass feature_names (the "
                "view's ordered list) or positional_names=True"
            )
        names = F.array(*[F.lit(n) for n in list(feature_names)])
        name_expr = F.element_at(names, F.col("pos") + 1)
    exploded = vectors.select(
        "entity_type",
        "entity_id",
        "view_version",
        F.col("served_at_ms"),
        F.posexplode("values").alias("pos", "value_float"),
    )
    return exploded.select(
        "entity_type",
        "entity_id",
        name_expr.alias("feature_name"),
        F.col("value_float"),
        F.lit(None).cast("string").alias("value_string"),
        F.timestamp_millis(F.col("served_at_ms")).alias("event_time"),
        F.timestamp_millis(F.col("served_at_ms")).alias("created_at"),
        F.lit("materializer").alias("pipeline_id"),
        F.col("view_version"),
    )


def vector_to_columns(
    vectors: DataFrame, feature_names: Sequence[str]
) -> DataFrame:
    """Positional array -> named columns (U5, ServingController.java:
    112-118): element_at by schema position."""
    return vectors.select(
        "entity_id",
        *[
            F.element_at("values", i + 1).alias(n)
            for i, n in enumerate(list(feature_names))
        ],
    )


def upsert_scalars(
    existing: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str] = ("entity_type", "entity_id", "feature_name"),
) -> DataFrame:
    """Partial scalar update (the hourly single-feature rewrite path,
    EXAMPLE.md:86-90): last-writer-wins per key by event_time.

    Pure-DataFrame MERGE emulation (Delta MERGE in production): union +
    keep max (event_time, created_at) per key.
    """
    from feature_store_spark.operators.reshape import latest_per_key

    unioned = existing.unionByName(updates)
    return latest_per_key(unioned, list(key_cols), "event_time", ["created_at"])


def roundtrip_check(
    wide: DataFrame,
    vectors: DataFrame,
    view: FeatureView,
    entity_col: str = "entity_id",
    tol: float = 1e-3,
) -> DataFrame:
    """Materialize -> serve round-trip verification (J4,
    MerchantFraudExample.java:269-284): every served value must equal
    the source wide value within tol. Returns rows that violate.

    Sound against the failure modes a verification join must catch:
    FULL OUTER on the entity, so a vector that never got written (or a
    vector with no source row) IS a violation instead of being dropped
    by an inner join; a NULL source value is fine only when the served
    slot equals the view's declared default (the mask contract) —
    plain ``abs(w - s) > tol`` is NULL there and would silently pass.
    NaN served values surface as violations (``abs(NaN - x) <= tol``
    is false under Spark NaN semantics) UNLESS the source slot is
    also NaN: NaN-in/NaN-out is a faithful round-trip, not a serving
    defect, so NaN==NaN agreement is an explicit ok-branch (ADVICE
    r5 — it used to be a false positive)."""
    served = vector_to_columns(vectors, view.feature_names)
    if view.transforms:
        # the vector holds post-transform values; compare like to like
        wide = apply_transforms(wide, view)
    w = wide.select(
        F.col(entity_col), *[F.col(n) for n in view.feature_names]
    ).withColumn("__w_present", F.lit(True))
    # vector_to_columns always emits 'entity_id'; rename to the
    # caller's entity_col so the USING join resolves on BOTH sides
    # (review r10: any non-default entity_col crashed the check with
    # an unresolved-column AnalysisException)
    s = served.withColumnRenamed("entity_id", entity_col).withColumn(
        "__s_present", F.lit(True)
    )
    j = w.alias("w").join(s.alias("s"), entity_col, "full_outer")
    missing = F.col("__w_present").isNull() | F.col("__s_present").isNull()
    slot_ok = [
        (F.abs(F.col(f"w.{n}") - F.col(f"s.{n}")) <= tol)
        | (
            F.isnan(F.col(f"w.{n}").cast("double"))
            & F.isnan(F.col(f"s.{n}").cast("double"))
        )
        | (
            F.col(f"w.{n}").isNull()
            & (
                F.abs(
                    F.col(f"s.{n}")
                    - F.lit(float(view.defaults.get(n, 0.0)))
                )
                <= tol
            )
        )
        for n in view.feature_names
    ]
    all_ok = slot_ok[0]
    for c in slot_ok[1:]:
        all_ok = all_ok & c
    return j.filter(missing | ~F.coalesce(all_ok, F.lit(False))).drop(
        "__w_present", "__s_present"
    )
