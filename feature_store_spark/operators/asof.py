"""Point-in-time (ASOF) join — the engine's crown-jewel operator.

Semantics match the reference's training-data generation
(``IcebergOfflineStore.java:122-196``): for each (entity, label_time)
row, attach the latest feature value whose ``event_time <= label_time``
(inclusive, ``:188``); no history -> missing (``:189``). The reference
builds an in-memory ``Map<entity, Map<feature, TreeMap<time,value>>>``
on a single JVM thread; here the same semantics are a distributed
union + window plan:

    1. tag history rows is_label=0, label rows is_label=1 (label rows
       carry their payload columns; history rows carry nulls there),
    2. union by name,
    3. one window per (entity[, feature]) ordered by
       (time, is_label, tiebreak...) with ``last(value, ignorenulls)``
       over unboundedPreceding..currentRow,
    4. keep label rows.

Why this shape at 100 TB: it is ONE shuffle (by the partition keys) and
one sort — no join explosion, no per-label fan-out over history. State
per partition is a single running value (Spark's running ``last`` does
not buffer the frame), so hot entities degrade to a big sort, not an
O(labels x history) blowup. The alternative join + row_number plan
(:func:`asof_join_ranked`, kept for differential testing) multiplies
each label by its entire matching history before ranking.

No nondeterministic ids anywhere: ``monotonically_increasing_id`` can
change across recomputation/AQE, so label identity is the label's own
columns plus a deterministic duplicate counter.

Tie-breaking divergence from the reference (documented, SURVEY.md
§7.4.1): the reference's TreeMap silently keeps the *last-scanned*
value for duplicate (entity, feature, time) keys — nondeterministic.
We order by explicit tiebreak columns (e.g. ``created_at``) so the
maximum wins, deterministically.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_T = "__asof_time"
_IS_LABEL = "__is_label"
_DUP = "__dup_n"


def _with_dup_counter(labels: DataFrame) -> DataFrame:
    """Deterministically number fully-identical duplicate label rows so
    they survive the pivot as distinct rows."""
    w = Window.partitionBy(*labels.columns).orderBy(F.lit(1))
    return labels.withColumn(_DUP, F.row_number().over(w))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str | None = None,
    value_cols: Sequence[str] = ("value",),
    tiebreak_cols: Sequence[str] = (),
    tolerance_seconds: float | None = None,
    suffix: str = "",
) -> DataFrame:
    """For each left row, attach the latest right values at-or-before
    ``left_time`` per ``on`` key (backward ASOF, inclusive).

    tolerance_seconds: values older than ``left_time - tolerance`` are
    nulled out (the reference's 180-day lookback horizon,
    IcebergOfflineStore.java:144, generalized to a parameter).
    """
    right_time = right_time or left_time
    on = list(on)
    value_cols = list(value_cols)
    payload = [c for c in left.columns if c not in on and c != left_time]

    right_sel = right.select(
        *[F.col(k) for k in on],
        F.col(right_time).alias(_T),
        *[F.col(v).alias(f"__v_{v}") for v in value_cols],
        *[F.col(t).alias(f"__tb_{t}") for t in tiebreak_cols],
        F.lit(0).alias(_IS_LABEL),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__p_{c}") for c in payload],
    )
    left_sel = left.select(
        *[F.col(k) for k in on],
        F.col(left_time).alias(_T),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"__v_{v}") for v in value_cols],
        *[
            F.lit(None).cast(right.schema[t].dataType).alias(f"__tb_{t}")
            for t in tiebreak_cols
        ],
        F.lit(1).alias(_IS_LABEL),
        *[F.col(c).alias(f"__p_{c}") for c in payload],
    )

    # History rows sort BEFORE label rows at equal time => inclusive <=.
    # Among equal-time history rows the greatest tiebreak wins (last in
    # frame). A running `last(ignorenulls)` carries the most recent
    # history value forward into each label row.
    order = [F.col(_T).asc(), F.col(_IS_LABEL).asc()] + [
        F.col(f"__tb_{t}").asc_nulls_first() for t in tiebreak_cols
    ]
    w = (
        Window.partitionBy(*[F.col(k) for k in on])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    attached = right_sel.unionByName(left_sel)
    for v in value_cols:
        attached = attached.withColumn(
            f"__last_{v}", F.last(F.col(f"__v_{v}"), ignorenulls=True).over(w)
        )
    attached = attached.withColumn(
        "__last_t",
        F.last(F.when(F.col(_IS_LABEL) == 0, F.col(_T)), ignorenulls=True).over(w),
    )

    out = attached.filter(F.col(_IS_LABEL) == 1)
    if tolerance_seconds is not None:
        horizon_ok = F.col("__last_t") >= (
            F.col(_T) - F.expr(f"INTERVAL {tolerance_seconds} SECONDS")
        )
        for v in value_cols:
            out = out.withColumn(f"__last_{v}", F.when(horizon_ok, F.col(f"__last_{v}")))

    return out.select(
        *[F.col(k) for k in on],
        F.col(_T).alias(left_time),
        *[F.col(f"__p_{c}").alias(c) for c in payload],
        *[F.col(f"__last_{v}").alias(f"{v}{suffix}") for v in value_cols],
    )


def asof_training_set(
    labels: DataFrame,
    records: DataFrame,
    feature_names: Sequence[str],
    entity_col: str = "entity_id",
    label_time_col: str = "event_time",
    feature_name_col: str = "feature_name",
    value_col: str = "value_float",
    record_time_col: str = "event_time",
    tiebreak_cols: Sequence[str] = ("created_at",),
    lookback_days: float | None = 180.0,
    wide: bool = True,
) -> DataFrame:
    """Point-in-time training-set generation over an EAV history table.

    Reference: IcebergOfflineStore.java:122-196 — scan bounded by
    [min(label time) - lookback, max(label time)] (:140-147), floorEntry
    per (entity, feature) (:174-193), missing -> null (the reference
    emits NaN, :189 — callers wanting NaN apply ``na.fill(nan)``), one
    output row per label with one column per feature.

    Spark plan: pre-filter history (predicate pushdown + partition
    pruning do the manifest work Iceberg did), replicate each label row
    per requested feature (literal array -> explode), union with
    history keyed by (entity, feature), ONE window pass, then pivot
    back to wide with an explicit feature list (no distinct-scan job).
    """
    feature_names = list(feature_names)

    bounds = labels.agg(
        F.min(label_time_col).alias("tmin"), F.max(label_time_col).alias("tmax")
    ).first()
    hist = records.filter(
        F.col(feature_name_col).isin(feature_names)
        & F.col(value_col).isNotNull()
        & (F.col(record_time_col) <= F.lit(bounds["tmax"]))
    )
    if lookback_days is not None:
        hist = hist.filter(
            F.col(record_time_col)
            >= F.lit(bounds["tmin"]) - F.expr(f"INTERVAL {int(lookback_days * 86400)} SECONDS")
        )

    labels_keyed = _with_dup_counter(labels)
    label_key_cols = labels.columns + [_DUP]
    payload = [c for c in label_key_cols if c not in (entity_col,)]

    hist_sel = hist.select(
        F.col(entity_col).alias("__entity"),
        F.col(feature_name_col).alias("__feature"),
        F.col(record_time_col).alias(_T),
        F.col(value_col).alias("__v"),
        *[F.col(t).alias(f"__tb_{t}") for t in tiebreak_cols],
        F.lit(0).alias(_IS_LABEL),
        *[
            F.lit(None).cast(labels_keyed.schema[c].dataType).alias(f"__p_{c}")
            for c in payload
        ],
    )
    labels_exploded = labels_keyed.select(
        F.col(entity_col).alias("__entity"),
        F.explode(F.array(*[F.lit(n) for n in feature_names])).alias("__feature"),
        F.col(label_time_col).alias(_T),
        F.lit(None).cast(hist.schema[value_col].dataType).alias("__v"),
        *[
            F.lit(None).cast(hist.schema[t].dataType).alias(f"__tb_{t}")
            for t in tiebreak_cols
        ],
        F.lit(1).alias(_IS_LABEL),
        *[F.col(c).alias(f"__p_{c}") for c in payload],
    )

    order = [F.col(_T).asc(), F.col(_IS_LABEL).asc()] + [
        F.col(f"__tb_{t}").asc_nulls_first() for t in tiebreak_cols
    ]
    w = (
        Window.partitionBy("__entity", "__feature")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    attached = hist_sel.unionByName(labels_exploded).withColumn(
        "__last_v", F.last("__v", ignorenulls=True).over(w)
    )
    label_rows = attached.filter(F.col(_IS_LABEL) == 1).select(
        F.col("__entity").alias(entity_col),
        *[F.col(f"__p_{c}").alias(c) for c in payload],
        F.col("__feature"),
        F.col("__last_v"),
    )

    if not wide:
        return label_rows.select(
            *labels.columns,
            F.col("__feature").alias(feature_name_col),
            F.col("__last_v").alias(value_col),
        )

    wide_df = (
        label_rows.groupBy(*label_key_cols)
        .pivot("__feature", feature_names)
        .agg(F.first("__last_v"))
    )
    return wide_df.select(*labels.columns, *feature_names)


def asof_join_ranked(
    labels: DataFrame,
    records: DataFrame,
    feature_names: Sequence[str],
    entity_col: str = "entity_id",
    label_time_col: str = "event_time",
    feature_name_col: str = "feature_name",
    value_col: str = "value_float",
    record_time_col: str = "event_time",
    tiebreak_cols: Sequence[str] = ("created_at",),
) -> DataFrame:
    """Alternative ASOF plan: range join + row_number, tall output.
    Kept for differential testing against :func:`asof_training_set`.
    Explodes per-label history before ranking — do not use on hot
    entities at scale.
    """
    hist = records.filter(
        F.col(feature_name_col).isin(list(feature_names))
        & F.col(value_col).isNotNull()
    )
    lab = labels.alias("l")
    joined = lab.join(
        hist.alias("h"),
        (F.col(f"l.{entity_col}") == F.col(f"h.{entity_col}"))
        & (F.col(f"h.{record_time_col}") <= F.col(f"l.{label_time_col}")),
        "inner",
    )
    order = [F.col(f"h.{record_time_col}").desc()] + [
        F.col(f"h.{t}").desc_nulls_last() for t in tiebreak_cols
    ]
    w = Window.partitionBy(
        *[F.col(f"l.{c}") for c in labels.columns], F.col(f"h.{feature_name_col}")
    ).orderBy(*order)
    ranked = joined.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    )
    return ranked.select(
        *[F.col(f"l.{c}") for c in labels.columns],
        F.col(f"h.{feature_name_col}").alias(feature_name_col),
        F.col(f"h.{value_col}").alias(value_col),
    )
