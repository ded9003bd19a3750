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

import math
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
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right values at-or-before
    ``left_time`` per ``on`` key (backward ASOF, inclusive).

    tolerance_seconds: values older than ``left_time - tolerance`` are
    nulled out (the reference's 180-day lookback horizon,
    IcebergOfflineStore.java:144, generalized to a parameter).

    direction (pandas ``merge_asof`` parity; the reference only has
    backward):

    - ``backward`` — latest right row with time <= left_time.
    - ``forward`` — earliest right row with time >= left_time.
    - ``nearest`` — whichever of the two is closer in time; exact ties
      resolve BACKWARD (deterministic; pandas resolves them the same
      way only when the backward candidate sorts first, so we pin it).

    All three run in the same one-shuffle union+window plan — forward
    is a mirrored ``first() over currentRow..unboundedFollowing`` frame
    on the same sort, so nearest costs two window functions over one
    sort, never a second shuffle. With ``nearest``, an equal-time right
    row is credited to the backward side (delta 0 always wins), so the
    forward frame may exclude it without changing the answer.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
    right_time = right_time or left_time
    on = list(on)
    value_cols = list(value_cols)
    payload = [c for c in left.columns if c not in on and c != left_time]
    clash = sorted(set(payload) & {f"{v}{suffix}" for v in value_cols})
    if clash:
        # both sides carrying e.g. a column literally named 'value'
        # is the DEFAULT-parameter case; emitting two same-named
        # output columns would make every downstream reference
        # AMBIGUOUS_REFERENCE (review r10e #7) — fail at plan time
        # with the remedy instead
        raise ValueError(
            f"asof_join: left column(s) {clash} collide with attached "
            "right value column name(s) — pass suffix= (e.g. "
            "suffix='_r') or rename/drop the left column(s)"
        )

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

    # Backward: history rows sort BEFORE label rows at equal time =>
    # inclusive <=; among equal-time history rows the greatest tiebreak
    # wins (last in frame); a running `last(ignorenulls)` carries the
    # most recent history value forward into each label row.
    # Forward: the mirror image — labels sort first at equal time (so
    # the frame starting at currentRow still sees an equal-time history
    # row: inclusive >=), tiebreaks descend so the greatest wins as the
    # FIRST hit of a `first(ignorenulls)` over the following frame.
    # Nearest: runs BOTH frames over the backward sort (one shuffle,
    # one sort); the forward frame then excludes equal-time history
    # rows, which is harmless because the backward side claims them at
    # delta zero, and delta zero always wins the nearest comparison.
    # Among duplicate (key, time) rows the forward side of `nearest`
    # resolves to the SMALLEST tiebreak (sort is shared with backward)
    # — deterministic, documented divergence from forward-only mode.
    if direction == "forward":
        order = [F.col(_T).asc(), F.col(_IS_LABEL).desc()] + [
            F.col(f"__tb_{t}").desc_nulls_last() for t in tiebreak_cols
        ]
    else:
        order = [F.col(_T).asc(), F.col(_IS_LABEL).asc()] + [
            F.col(f"__tb_{t}").asc_nulls_first() for t in tiebreak_cols
        ]
    part = Window.partitionBy(*[F.col(k) for k in on]).orderBy(*order)
    wb = part.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = part.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    need_b = direction in ("backward", "nearest")
    need_f = direction in ("forward", "nearest")

    # ONE running last/first of the whole matched history ROW — time
    # plus every value column, as a struct that is non-null for every
    # history row (even one whose value columns are all NULL). The
    # as-of match attaches one row WHOLESALE (pandas merge_asof
    # semantics): the tolerance gate and the nearest comparison then
    # always judge the same row that supplied the values. Per-column
    # `last(value, ignorenulls)` would instead skip a newest-but-NULL
    # value back to an older row while the match time came from the
    # newest row — passing the tolerance gate with an out-of-tolerance
    # value, and mixing columns of different rows in multi-column
    # joins.
    hist_row = F.when(
        F.col(_IS_LABEL) == 0,
        F.struct(
            F.col(_T).alias("t"),
            *[F.col(f"__v_{v}").alias(f"v_{v}") for v in value_cols],
        ),
    )
    attached = right_sel.unionByName(left_sel)
    if need_b:
        attached = attached.withColumn(
            "__last_r", F.last(hist_row, ignorenulls=True).over(wb)
        )
    if need_f:
        attached = attached.withColumn(
            "__next_r", F.first(hist_row, ignorenulls=True).over(wf)
        )

    out = attached.filter(F.col(_IS_LABEL) == 1)
    if tolerance_seconds is not None:
        # make_dt_interval, not an f-string INTERVAL literal: Python
        # renders small/huge floats in scientific notation, which the
        # SQL interval parser rejects at plan time
        if not (float(tolerance_seconds) >= 0.0) or math.isinf(
            float(tolerance_seconds)
        ):
            raise ValueError(
                f"asof_join: tolerance_seconds={tolerance_seconds!r} "
                "must be a finite non-negative number"
            )
        tol = F.make_dt_interval(secs=F.lit(float(tolerance_seconds)))
        if need_b:
            out = out.withColumn(
                "__last_r",
                F.when(
                    F.col("__last_r.t") >= (F.col(_T) - tol),
                    F.col("__last_r"),
                ),
            )
        if need_f:
            out = out.withColumn(
                "__next_r",
                F.when(
                    F.col("__next_r.t") <= (F.col(_T) + tol),
                    F.col("__next_r"),
                ),
            )

    if direction == "backward":
        val_cols = [
            F.col(f"__last_r.v_{v}").alias(f"{v}{suffix}") for v in value_cols
        ]
    elif direction == "forward":
        val_cols = [
            F.col(f"__next_r.v_{v}").alias(f"{v}{suffix}") for v in value_cols
        ]
    else:
        pick_b = F.col("__next_r").isNull() | (
            F.col("__last_r").isNotNull()
            & (
                (F.col(_T) - F.col("__last_r.t"))
                <= (F.col("__next_r.t") - F.col(_T))
            )
        )
        val_cols = [
            F.when(pick_b, F.col(f"__last_r.v_{v}"))
            .otherwise(F.col(f"__next_r.v_{v}"))
            .alias(f"{v}{suffix}")
            for v in value_cols
        ]

    return out.select(
        *[F.col(k) for k in on],
        F.col(_T).alias(left_time),
        *[F.col(f"__p_{c}").alias(c) for c in payload],
        *val_cols,
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
    assume_unique_labels: bool = False,
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

    # The dup-counter window is a full shuffle of the label set; when
    # the caller guarantees unique label rows (e.g. an event-id column)
    # a constant stands in and that shuffle disappears from the plan.
    if assume_unique_labels:
        labels_keyed = labels.withColumn(_DUP, F.lit(1))
    else:
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


def asof_training_set_columnar(
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
    assume_unique_labels: bool = False,
) -> DataFrame:
    """ASOF training set with the minimum shuffle count: ONE.

    Instead of exploding each label row per feature and pivoting back
    (the flat plan: 3 shuffles — dup window, union window on
    (entity, feature), pivot groupBy), spread the EAV history into one
    sparse column PER FEATURE map-side (``when(feature = f, value)``),
    union with the labels, and run one window over ``entity`` alone
    with a running ``last(ignorenulls)`` per feature column. Label
    rows come out already wide — no pivot, labels are never replicated
    |features|x, and duplicate label rows need no dup-counter window
    (nothing ever groups them — they ride through as rows).

    Correctness of tie-breaks is preserved: among equal-time rows the
    global order (time, is_label, tiebreak) is shared, and each
    feature's running last only sees rows of that feature (others are
    null in its column), so the max-tiebreak row of THAT feature wins.

    Trade-off vs the flat plan (kept as default): partitioning by
    entity alone concentrates a hot entity's whole history in one
    partition, where (entity, feature) spreads it |features|-ways —
    prefer this variant when features are many and keys are not
    pathological, the bucketed variant when they are. Identical
    results by construction (differentially tested).

    The shared keyword surface of the plan family is accepted so the
    auto dispatcher can pass any of it regardless of which plan the
    data selects: ``assume_unique_labels`` is a no-op HERE (this plan
    never groups label rows, so the dup-counter the hint skips does
    not exist), and ``wide=False`` raises loudly — this plan produces
    the wide form by construction; use :func:`asof_training_set` for
    the tall form.
    """
    if not wide:
        raise ValueError(
            "asof_training_set_columnar: the columnar plan is wide by "
            "construction (one sparse column per feature; there is no "
            "tall intermediate to return). Use asof_training_set("
            "wide=False) for the tall form."
        )
    del assume_unique_labels  # no dup-counter exists in this plan
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
            >= F.lit(bounds["tmin"])
            - F.expr(f"INTERVAL {int(lookback_days * 86400)} SECONDS")
        )

    payload = [c for c in labels.columns if c != entity_col]
    vcols = [f"__v_{i}" for i in range(len(feature_names))]

    hist_sel = hist.select(
        F.col(entity_col).alias("__entity"),
        F.col(record_time_col).alias(_T),
        F.lit(0).alias(_IS_LABEL),
        *[F.col(t).alias(f"__tb_{t}") for t in tiebreak_cols],
        *[
            F.when(F.col(feature_name_col) == n, F.col(value_col)).alias(v)
            for n, v in zip(feature_names, vcols)
        ],
        *[
            F.lit(None).cast(labels.schema[c].dataType).alias(f"__p_{c}")
            for c in payload
        ],
    )
    labels_sel = labels.select(
        F.col(entity_col).alias("__entity"),
        F.col(label_time_col).alias(_T),
        F.lit(1).alias(_IS_LABEL),
        *[
            F.lit(None).cast(hist.schema[t].dataType).alias(f"__tb_{t}")
            for t in tiebreak_cols
        ],
        *[F.lit(None).cast(hist.schema[value_col].dataType).alias(v) for v in vcols],
        *[F.col(c).alias(f"__p_{c}") for c in payload],
    )

    order = [F.col(_T).asc(), F.col(_IS_LABEL).asc()] + [
        F.col(f"__tb_{t}").asc_nulls_first() for t in tiebreak_cols
    ]
    w = (
        Window.partitionBy("__entity")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # ONE projection for all per-feature running lasts (not a
    # withColumn-per-feature loop, whose chained Projects re-analyze a
    # growing plan once per feature — quadratic planning time at a
    # 2000-feature view)
    attached = hist_sel.unionByName(labels_sel)
    non_v = [c for c in attached.columns if c not in vcols]
    attached = attached.select(
        *non_v,
        *[F.last(v, ignorenulls=True).over(w).alias(v) for v in vcols],
    )
    label_out = [
        F.col("__entity").alias(entity_col)
        if c == entity_col
        else F.col(f"__p_{c}").alias(c)
        for c in labels.columns
    ]
    return attached.filter(F.col(_IS_LABEL) == 1).select(
        *label_out,
        *[F.col(v).alias(n) for n, v in zip(feature_names, vcols)],
    )


def asof_training_set_bucketed(
    labels: DataFrame,
    records: DataFrame,
    feature_names: Sequence[str],
    bucket_seconds: int = 86_400,
    entity_col: str = "entity_id",
    label_time_col: str = "event_time",
    feature_name_col: str = "feature_name",
    value_col: str = "value_float",
    record_time_col: str = "event_time",
    tiebreak_cols: Sequence[str] = ("created_at",),
    wide: bool = True,
    assume_unique_labels: bool = False,
) -> DataFrame:
    """Hot-key-safe ASOF: two-level time-bucketed plan (SCALE.md).

    The flat plan sorts each (entity, feature) stream in one partition;
    a pathological key with 10^9 rows becomes one giant sort. This
    variant:

      1. reduces history to per-(entity, feature, bucket) FINALS
         (latest row per bucket — a map-side-combinable top-1),
      2. computes each label's CARRY = final of the nearest *earlier*
         bucket via a small window over bucket rows (|buckets| per key,
         not |rows|; labels sort before history within their own bucket
         so same-bucket finals are never leaked),
      3. resolves same-bucket history with a window partitioned by
         (entity, feature, bucket) — the hot key is now spread over
         time buckets — restricted by semi-join to buckets that
         actually contain labels,
      4. answer = within-bucket last if present else carry.

    Semantics identical to :func:`asof_training_set` (inclusive <=,
    deterministic tie-breaks); differentially tested against it.
    """
    feature_names = list(feature_names)
    bs_us = bucket_seconds * 1_000_000

    if assume_unique_labels:
        labels_keyed = labels.withColumn(_DUP, F.lit(1))
    else:
        labels_keyed = _with_dup_counter(labels)
    label_key_cols = labels.columns + [_DUP]
    payload = [c for c in label_key_cols if c != entity_col]

    lab = labels_keyed.select(
        F.col(entity_col).alias("__e"),
        F.explode(F.array(*[F.lit(n) for n in feature_names])).alias("__f"),
        F.col(label_time_col).alias("__lt"),
        F.floor(F.unix_micros(F.col(label_time_col)) / bs_us).alias("__b"),
        *[F.col(c).alias(f"__p_{c}") for c in payload],
    )
    hist = records.filter(
        F.col(feature_name_col).isin(feature_names) & F.col(value_col).isNotNull()
    ).select(
        F.col(entity_col).alias("__e"),
        F.col(feature_name_col).alias("__f"),
        F.col(record_time_col).alias("__t"),
        F.col(value_col).alias("__v"),
        F.floor(F.unix_micros(F.col(record_time_col)) / bs_us).alias("__b"),
        *[F.col(t).alias(f"__tb_{t}") for t in tiebreak_cols],
    )

    # 1. per-bucket finals (hot key spread over buckets)
    order_desc = [F.col("__t").desc()] + [
        F.col(f"__tb_{t}").desc_nulls_last() for t in tiebreak_cols
    ]
    w_final = Window.partitionBy("__e", "__f", "__b").orderBy(*order_desc)
    finals = (
        hist.withColumn("__rn", F.row_number().over(w_final))
        .filter(F.col("__rn") == 1)
        .select("__e", "__f", "__b", F.col("__v").alias("__fv"))
    )

    # 2. carry = running last of finals over STRICTLY EARLIER buckets:
    # labels (is_label=1) sort before finals (0) within their bucket.
    # computed once, consumed twice (step-2 carry anchors AND the
    # step-3 semi-join): Spark shares no uncached subplans, so a
    # second inline .distinct() would re-explode and re-shuffle the
    # whole label set per consumer
    lab_bkts = lab.select("__e", "__f", "__b").distinct()
    lab_buckets = lab_bkts.withColumn(
        "__is_label", F.lit(1)
    ).withColumn("__fv", F.lit(None).cast(hist.schema["__v"].dataType))
    final_rows = finals.withColumn("__is_label", F.lit(0))
    w_carry = (
        Window.partitionBy("__e", "__f")
        .orderBy(F.col("__b").asc(), F.col("__is_label").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry = (
        final_rows.unionByName(lab_buckets)
        .withColumn("__carry", F.last("__fv", ignorenulls=True).over(w_carry))
        .filter(F.col("__is_label") == 1)
        .select("__e", "__f", "__b", "__carry")
    )

    # 3. same-bucket resolution, only in buckets that contain labels
    hist_labeled_buckets = hist.join(
        lab_bkts, ["__e", "__f", "__b"], "left_semi"
    )
    hist_u = hist_labeled_buckets.select(
        "__e", "__f", "__b", F.col("__t").alias(_T), F.col("__v"),
        *[F.col(f"__tb_{t}") for t in tiebreak_cols],
        F.lit(0).alias(_IS_LABEL),
        *[F.lit(None).cast(labels_keyed.schema[c].dataType).alias(f"__p_{c}") for c in payload],
    )
    lab_u = lab.select(
        "__e", "__f", "__b", F.col("__lt").alias(_T),
        F.lit(None).cast(hist.schema["__v"].dataType).alias("__v"),
        *[
            F.lit(None).cast(hist.schema[f"__tb_{t}"].dataType).alias(f"__tb_{t}")
            for t in tiebreak_cols
        ],
        F.lit(1).alias(_IS_LABEL),
        *[F.col(f"__p_{c}") for c in payload],
    )
    order = [F.col(_T).asc(), F.col(_IS_LABEL).asc()] + [
        F.col(f"__tb_{t}").asc_nulls_first() for t in tiebreak_cols
    ]
    w_in = (
        Window.partitionBy("__e", "__f", "__b")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = (
        hist_u.unionByName(lab_u)
        .withColumn("__wv", F.last("__v", ignorenulls=True).over(w_in))
        .filter(F.col(_IS_LABEL) == 1)
    )

    # 4. combine
    resolved = within.join(carry, ["__e", "__f", "__b"], "left").select(
        F.col("__e").alias(entity_col),
        *[F.col(f"__p_{c}").alias(c) for c in payload],
        F.col("__f").alias("__feature"),
        F.coalesce(F.col("__wv"), F.col("__carry")).alias("__last_v"),
    )

    if not wide:
        return resolved.select(
            *labels.columns,
            F.col("__feature").alias(feature_name_col),
            F.col("__last_v").alias(value_col),
        )
    wide_df = (
        resolved.groupBy(*label_key_cols)
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

    Differential CONTRACT (narrower than the production plans, by
    construction of this shape): label rows must be DISTINCT (the
    row_number partitions by all label columns, so duplicate label
    rows collapse to one) and only (label, feature) pairs WITH a
    match appear (inner join — a label with no in-scope history emits
    no row, where the production plans emit the label with NULL).
    Differential tests must compare on distinct-label inputs and
    inner-match rows only; feeding either excluded shape reports a
    spurious mismatch, not a bug in the plan under test.
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


def estimate_hottest_key_rows(
    records: DataFrame,
    entity_col: str = "entity_id",
    record_time_col: str = "event_time",
    sample_mod: int = 1000,
) -> int:
    """Estimated history row count of the hottest entity, from ONE
    cheap job over a deterministic ~1/``sample_mod`` ROW sample.

    Rows (not entities) are sampled — ``xxhash64(*all columns) %
    sample_mod == 0`` — so a key with R rows contributes ~R/sample_mod
    sampled rows regardless of which keys exist: the hot key always
    registers once R >> sample_mod, which is exactly the regime where
    the plan choice matters. (Entity-coherent sampling would miss the
    hot key with probability 1 - 1/sample_mod.) The hash covers EVERY
    column, not just (entity, time): EAV batch loads commonly write
    thousands of feature rows sharing one event_time, and a
    two-column hash would sample those all-or-nothing (the hot key's
    distinct hash inputs collapse to its distinct timestamps,
    silently under-sampling exactly the key the dispatcher exists to
    catch). Only fully identical duplicate ROWS still collapse, and
    those inflate a sort partition identically whether counted once
    or R times less. The groupBy is map-side combinable over ~0.1% of
    the data.
    """
    sampled = records.filter(
        F.pmod(
            F.xxhash64(*[F.col(c) for c in records.columns]),
            F.lit(sample_mod),
        )
        == 0
    )
    row = (
        sampled.groupBy(entity_col)
        .count()
        .agg(F.max("count").alias("mx"))
        .first()
    )
    return int(row["mx"] or 0) * sample_mod


def choose_asof_plan(
    labels: DataFrame,
    records: DataFrame,
    entity_col: str = "entity_id",
    record_time_col: str = "event_time",
    hot_rows_threshold: int = 2_000_000,
    sample_mod: int = 1000,
) -> str:
    """Pick the ASOF physical plan from a key-histogram sample:

    - ``"bucketed"`` when the hottest entity's estimated history
      exceeds ``hot_rows_threshold`` — the columnar plan concentrates
      an entity's whole history into one sort partition, so a
      pathological key (one viral user with 10^9 rows) must be spread
      over time buckets instead;
    - ``"columnar"`` otherwise — one shuffle, no label replication,
      the cheapest plan for well-distributed keys.

    The default threshold is sized so the per-partition sort a single
    key induces stays comfortably inside one executor's memory
    (~2M rows x ~50B ≈ 100 MB); tune down for wide payloads.
    """
    hottest = estimate_hottest_key_rows(
        records, entity_col, record_time_col, sample_mod
    )
    # >= so hot_rows_threshold=0 deterministically forces the
    # bucketed plan even when the sample comes back empty (hottest=0)
    # — the explicit operator override, and what keeps the
    # bucketed-vs-columnar differential tests honest on small inputs
    return "bucketed" if hottest >= hot_rows_threshold else "columnar"


def asof_training_set_auto(
    labels: DataFrame,
    records: DataFrame,
    feature_names: Sequence[str],
    hot_rows_threshold: int = 2_000_000,
    sample_mod: int = 1000,
    bucket_seconds: int = 86_400,
    **kw,
):
    """ASOF training set with sample-driven physical-plan dispatch
    (:func:`choose_asof_plan`): columnar for well-distributed keys,
    bucketed when a hot key would otherwise pin one sort partition.
    Accepts the shared keyword surface of the underlying plans and
    returns the same result any of them would (they are differentially
    tested equal)."""
    entity_col = kw.get("entity_col", "entity_id")
    record_time_col = kw.get("record_time_col", "event_time")
    plan = choose_asof_plan(
        labels,
        records,
        entity_col=entity_col,
        record_time_col=record_time_col,
        hot_rows_threshold=hot_rows_threshold,
        sample_mod=sample_mod,
    )
    if not kw.get("wide", True) and plan != "bucketed":
        # the columnar plan is wide by construction, so a wide=False
        # call must not succeed-or-raise depending on what the data
        # sample said (review r10e #4) — route the tall form through
        # the flat plan, which supports it, whenever dispatch would
        # have picked columnar
        return asof_training_set(labels, records, feature_names, **kw)
    if plan == "bucketed":
        # asof_training_set_bucketed has no lookback parameter, but
        # the dispatch must NOT change the answer: apply the same
        # history pre-filter the columnar plan would, so a record
        # older than the lookback yields NULL under either plan.
        lookback_days = kw.pop("lookback_days", 180.0)
        if lookback_days is not None:
            label_time_col = kw.get("label_time_col", "event_time")
            tmin = labels.agg(F.min(label_time_col)).first()[0]
            records = records.filter(
                F.col(record_time_col)
                >= F.lit(tmin)
                - F.expr(f"INTERVAL {int(lookback_days * 86400)} SECONDS")
            )
        return asof_training_set_bucketed(
            labels, records, feature_names, bucket_seconds=bucket_seconds, **kw
        )
    return asof_training_set_columnar(labels, records, feature_names, **kw)
