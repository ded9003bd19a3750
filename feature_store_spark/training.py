"""Distributed training as dataflow (SURVEY.md §2.9 M6).

The reference trains XGBoost on a single node (pandas in Python,
XGBoost4J in Java). This container has no xgboost, so the engine
ships a distributed **logistic regression** trainer built from plain
DataFrame aggregations: each epoch is ONE map-side-combinable pass
computing the full gradient (k+1 aggregate columns), with the weight
vector broadcast as literals. Driver state is O(k) floats — the
standard Spark pattern for iterative algorithms (MLlib does the same
dance underneath).

This slots into the same pipeline seams as XGBoost (train -> score ->
gates); when an xgboost runtime exists, `scoring.xgboost_udf` replaces
`predict_expr` with zero pipeline changes.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def predict_expr(
    model: dict, feature_cols: Sequence[str] | None = None
) -> Column:
    """P(y=1) column for a trained model dict
    {"weights": [...], "bias": b, "features": [...], "means": [...],
    "stds": [...]}. A ``feature_cols`` override must match the model's
    arity — zip() would otherwise silently truncate the model and
    score from a partial weight vector (review r10f)."""
    cols = list(feature_cols or model["features"])
    if len(cols) != len(model["weights"]):
        raise ValueError(
            f"predict_expr: {len(cols)} feature column(s) for a "
            f"{len(model['weights'])}-weight model"
        )
    scaled = [
        (F.col(c) - F.lit(m)) / F.lit(s)
        for c, m, s in zip(cols, model["means"], model["stds"])
    ]
    z = F.lit(float(model["bias"]))
    for w, x in zip(model["weights"], scaled):
        z = z + F.lit(float(w)) * x
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def fit_logistic(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    epochs: int = 30,
    lr: float = 0.5,
    l2: float = 1e-4,
    class_weighted: bool = True,
) -> dict:
    """Batch gradient descent, one distributed pass per epoch.

    Features are standardized with global mean/std (computed in one
    aggregate) so a single learning rate works across scales —
    the moments are folded into the returned model, so `predict_expr`
    consumes raw columns.  ``class_weighted`` applies
    ``scale_pos_weight = n_neg/n_pos`` (A5, train.py:127-130).

    NULL / NaN features or labels are REJECTED loudly (checked inside
    the same stats pass — no extra scan): a NULL feature silently
    drops its row from the gradient while keeping it in the weight
    normalizer, and one NaN makes ``F.sum`` return NaN, yielding
    all-NaN weights diagnosed far from the cause. Impute or filter
    before fitting.
    """
    cols = list(feature_cols)
    k = len(cols)

    def _bad(c):
        # cast ONCE and test the casted value: a non-numeric value
        # (e.g. a string feature column) becomes NULL on the cast, and
        # isnan(NULL) is NULL -> when(NULL,1).otherwise(0) = 0, so
        # testing the RAW column's nullness would let uncastable
        # values escape the guard while F.avg silently drops them —
        # exactly the silent bias the guard exists to reject (ADVICE r5)
        col = F.col(c).cast("double")
        return F.sum(
            F.when(col.isNull() | F.isnan(col), F.lit(1)).otherwise(F.lit(0))
        )

    stats = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(label_col).cast("double")).alias("n_pos"),
        *[F.avg(c).alias(f"m{i}") for i, c in enumerate(cols)],
        *[F.stddev_pop(c).alias(f"s{i}") for i, c in enumerate(cols)],
        *[_bad(c).alias(f"b{i}") for i, c in enumerate(cols)],
        _bad(label_col).alias("b_label"),
    ).first()
    bad = {
        c: int(stats[f"b{i}"] or 0)
        for i, c in enumerate(cols)
        if (stats[f"b{i}"] or 0) > 0
    }
    if (stats["b_label"] or 0) > 0:
        bad[label_col] = int(stats["b_label"])
    if bad:
        raise ValueError(
            f"fit_logistic: NULL/NaN values in {bad} — a NULL feature "
            "silently biases the gradient and one NaN poisons every "
            "weight. Impute or filter these rows first."
        )
    if int(stats["n"]) == 0:
        # sum() over zero rows is NULL — float(None) three lines down
        # would be the undiagnosable version of this error
        raise ValueError(
            "fit_logistic: empty training frame (an over-filtered CV "
            "fold or slice?) — nothing to fit"
        )
    n = float(stats["n"])
    n_pos = float(stats["n_pos"])
    if class_weighted and (n_pos == 0.0 or n_pos == n):
        # single-class input: scale_pos_weight is 0 or the gradient
        # normalizer degenerates — wsum would hit 0.0 and the bias
        # update would ZeroDivisionError on epoch 1 with no hint of
        # the cause (review r10f)
        raise ValueError(
            f"fit_logistic: labels are single-class (n_pos={int(n_pos)} "
            f"of n={int(n)}); class weighting is undefined — pass "
            "class_weighted=False or fix the slice"
        )
    means = [float(stats[f"m{i}"] or 0.0) for i in range(k)]
    stds = [float(stats[f"s{i}"] or 1.0) or 1.0 for i in range(k)]
    pos_w = (n - n_pos) / max(n_pos, 1.0) if class_weighted else 1.0

    scaled = [
        ((F.col(c) - F.lit(m)) / F.lit(s)).alias(f"x{i}")
        for i, (c, m, s) in enumerate(zip(cols, means, stds))
    ]
    # persisted: every epoch re-reads the standardized projection from
    # cache instead of recomputing the upstream lineage (generation,
    # joins, feature engineering) per epoch
    base = df.select(
        F.col(label_col).cast("double").alias("y"), *scaled
    ).persist()

    weights = [0.0] * k
    bias = math.log(max(n_pos, 1.0) / max(n - n_pos, 1.0))
    try:
        for _ in range(epochs):
            z = F.lit(bias)
            for w, i in zip(weights, range(k)):
                z = z + F.lit(w) * F.col(f"x{i}")
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
            sample_w = F.when(
                F.col("y") == 1.0, F.lit(pos_w)
            ).otherwise(F.lit(1.0))
            err = (p - F.col("y")) * sample_w
            g = base.agg(
                F.sum(sample_w).alias("wsum"),
                F.sum(err).alias("g_bias"),
                *[
                    F.sum(err * F.col(f"x{i}")).alias(f"g{i}")
                    for i in range(k)
                ],
            ).first()
            wsum = float(g["wsum"])
            bias -= lr * float(g["g_bias"]) / wsum
            weights = [
                w - lr * (float(g[f"g{i}"]) / wsum + l2 * w)
                for i, w in enumerate(weights)
            ]
    finally:
        # exception-safe: a raising epoch must not leak the cached
        # projection for the session lifetime (review r10f)
        base.unpersist()

    return {
        "features": cols,
        "weights": weights,
        "bias": bias,
        "means": means,
        "stds": stds,
        "scale_pos_weight": pos_w,
    }


def stratified_kfold_tag(
    df: DataFrame, label_col: str, k: int = 5, entity_col: str = "entity_id"
) -> DataFrame:
    """Deterministic stratified fold assignment: md5-bucket per entity
    within each label stratum (U4 stratified + J5 determinism).

    ROW-level stratification: the hash keys on (entity, label), so an
    entity appearing with BOTH labels lands in different folds —
    label-ratio preservation and entity-grouping are mutually
    exclusive when an entity's rows disagree on the label. For
    entity-grouped folds (no cross-fold leakage of a multi-row
    entity) use ``group_cv_split`` instead and give up per-fold
    class-ratio guarantees."""
    from feature_store_spark.functions import hash_bucket_expr

    return df.withColumn(
        "fold",
        hash_bucket_expr(
            F.concat_ws("|", F.col(entity_col).cast("string"), F.col(label_col).cast("string")),
            k,
        ),
    )


def fit_quantile_bins(
    df: DataFrame,
    cols: Sequence[str],
    n_bins: int = 32,
    accuracy: int = 10_000,
) -> dict[str, list[float]]:
    """Per-column quantile bin boundaries for histogram tree training
    (the reference feeds raw floats to XGBoost, which quantile-bins
    them internally — ``tree_method=hist``; python/gbdt_example/
    train.py). ONE ``percentile_approx`` aggregate pass fits all
    columns at once: bin boundaries are a training heuristic, not a
    query result, so the one-pass sketch is the right tool (exact
    quantiles cost a per-column job here for zero model benefit —
    LightGBM/XGBoost's own histograms are approximate for the same
    reason). Duplicate boundaries (point masses) collapse, so a
    column may get fewer than ``n_bins`` bins."""
    ps = [i / n_bins for i in range(1, n_bins)]
    parr = F.array(*[F.lit(p) for p in ps])
    row = df.agg(
        *[F.percentile_approx(F.col(c), parr, accuracy).alias(c) for c in cols]
    ).collect()[0]
    out: dict[str, list[float]] = {}
    for c in cols:
        if row[c] is None:
            raise ValueError(
                f"fit_quantile_bins: column {c!r} has no non-null "
                "values — bin boundaries are undefined"
            )
        # NaNs are dropped: NaN != NaN defeats the dedupe set and NaN
        # poisons sorted() ordering, corrupting quantile_bin_expr's
        # 'count of boundaries strictly below' contract
        out[c] = sorted(
            {float(v) for v in row[c] if v is not None and not math.isnan(v)}
        )
        if not out[c]:
            # all-NaN column: same undefined-boundaries contract as the
            # all-NULL case above — an empty boundary list would
            # silently put every row in bin 0 (a constant feature)
            raise ValueError(
                f"fit_quantile_bins: column {c!r} has no finite "
                "values — bin boundaries are undefined"
            )
    return out


def quantile_bin_expr(col: str, boundaries: Sequence[float]) -> Column:
    """Bin index of ``col`` against sorted ``boundaries``: the count
    of boundaries strictly below the value — a codegen'd fold over an
    array literal (no UDF, no join; k ≈ 31 comparisons per row).

    Missing-value semantics are DETERMINISTIC and pinned by test:
    NULL lands in bin 0 (``NULL > b`` is NULL, counted as no) and NaN
    lands in the TOP bin (Spark orders NaN above every number). Both
    match XGBoost's "missing goes to a fixed default side" stance, but
    the side differs by kind — impute first if the distinction
    matters."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    return F.aggregate(
        arr,
        F.lit(0),
        lambda acc, b: acc + F.when(F.col(col) > b, 1).otherwise(0),
    )


def cross_validate_logistic(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    k: int = 5,
    entity_col: str = "entity_id",
    epochs: int = 20,
) -> list[dict]:
    """K-fold CV: per fold, fit on k-1 folds, evaluate AUC on the
    held-out fold (M6's StratifiedKFold loop as dataflow).

    A fold whose held-out slice contains a single class has an
    undefined AUC (P·N = 0) and records ``auc_roc: None`` — callers
    aggregating across folds (max/mean) must filter those explicitly
    rather than trip a TypeError on None; the stratified tag makes
    this rare but small inputs can still produce it."""
    from feature_store_spark.metrics import auc_roc

    tagged = stratified_kfold_tag(df, label_col, k, entity_col).cache()
    try:
        results = []
        for fold in range(k):
            train = tagged.filter(F.col("fold") != fold)
            test = tagged.filter(F.col("fold") == fold)
            model = fit_logistic(
                train, feature_cols, label_col, epochs=epochs
            )
            scored = test.select(
                predict_expr(model).alias("score"),
                F.col(label_col).alias("label"),
            )
            auc = auc_roc(scored, "score", "label").first()["auc_roc"]
            results.append({"fold": fold, "auc_roc": auc, "model": model})
        return results
    finally:
        tagged.unpersist()


def best_split_histogram(
    df: DataFrame,
    feature_bin_col: str,
    target_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """ONE tree-split-finding step of histogram GBDT as dataflow — the
    inner loop the reference's XGBoost training runs single-node
    (SURVEY.md §2.9 M6), distributed: per group, build the
    (count, sum(target)) histogram over candidate thresholds of the
    binned feature, prefix-sum it, and pick the threshold maximizing
    squared-loss gain  GL^2/nL + GR^2/nR - G^2/n  (variance
    reduction; XGBoost's gain with hessian = count for squared loss).

    Physical shape: one map-side-combinable groupBy over the data
    (shuffle = |groups| x |bins| rows, independent of data size), then
    window prefix sums over the TINY histogram, then argmax per group —
    exactly how distributed histogram-based GBDT (LightGBM/XGBoost
    hist) parallelizes split finding.

    Ties break toward the smallest threshold for determinism.
    """
    from pyspark.sql import Window

    gcols = list(group_cols)
    hist = df.groupBy(*gcols, feature_bin_col).agg(
        F.count(F.lit(1)).alias("__n"), F.sum(target_col).alias("__g")
    )
    w = (
        Window.partitionBy(*gcols)
        .orderBy(feature_bin_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy(*gcols)
    c = hist.select(
        *gcols,
        F.col(feature_bin_col),
        F.sum("__n").over(w).alias("__nl"),
        F.sum("__g").over(w).alias("__gl"),
        F.sum("__n").over(wt).alias("__nt"),
        F.sum("__g").over(wt).alias("__gt"),
    )
    gl, nl, gt, nt = (F.col(f"__{x}") for x in ("gl", "nl", "gt", "nt"))
    gain = (
        gl * gl / nl + (gt - gl) * (gt - gl) / (nt - nl) - gt * gt / nt
    ).alias("gain")
    scored = c.filter(nl < nt).select(
        *gcols, F.col(feature_bin_col).alias("threshold_bin"), gain
    )
    rn = F.row_number().over(
        Window.partitionBy(*gcols).orderBy(
            F.col("gain").desc(), F.col("threshold_bin")
        )
    )
    return (
        scored.withColumn("__rn", rn).filter(F.col("__rn") == 1).drop("__rn")
    )


def _histograms_for_level(
    df: DataFrame,
    feature_bin_cols: Sequence[str],
    target_col: str,
    node_col: str,
):
    """ONE distributed pass: per (node, feature, bin) count + target
    sum for every feature at once (posexplode of the feature-bin
    array — map-side F-fold expansion, single partial-aggregated
    shuffle of histogram rows only)."""
    exploded = df.select(
        F.col(node_col),
        F.col(target_col),
        F.posexplode(F.array(*[F.col(c) for c in feature_bin_cols])).alias(
            "__fidx", "__bin"
        ),
    )
    hist = (
        exploded.groupBy(node_col, "__fidx", "__bin")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(target_col).alias("g"))
        .collect()
    )
    out: dict[int, dict[int, dict[int, tuple[int, float]]]] = {}
    for r in hist:
        out.setdefault(r[node_col], {}).setdefault(r["__fidx"], {})[r["__bin"]] = (
            r["n"],
            float(r["g"]),
        )
    return out


def _best_split_from_hist(bins: dict[int, tuple[int, float]]):
    """Driver-side argmax over one node x feature histogram (tiny):
    returns (gain, threshold_bin) or None. Same squared-loss gain as
    :func:`best_split_histogram`; ties -> smallest threshold."""
    items = sorted(bins.items())
    nt = sum(n for n, _ in bins.values())
    gt = sum(g for _, g in bins.values())
    best = None
    nl = 0
    gl = 0.0
    for b, (n, g) in items[:-1]:
        nl += n
        gl += g
        if nl == 0 or nl == nt:
            continue
        gain = gl * gl / nl + (gt - gl) ** 2 / (nt - nl) - gt * gt / nt
        if best is None or gain > best[0] + 1e-12:
            best = (gain, b)
    return best


def fit_histogram_tree(
    df: DataFrame,
    feature_bin_cols: Sequence[str],
    target_col: str,
    depth: int = 2,
    min_split_gain: float = 1e-9,
    check_bins: bool = True,
) -> dict:
    """Level-wise histogram regression tree (squared loss) — the
    reference's XGBoost training (SURVEY.md §2.9 M6) re-expressed as
    distributed dataflow: per level, ONE pass over the data builds all
    (node, feature, bin) histograms (the only shuffle, histogram-sized);
    the driver holds only histograms (LightGBM's reduce-scatter shape)
    and picks each node's best split; node assignment advances with a
    broadcast when()-expression. Leaves are per-node target means.

    Returns {"splits": {node: (feature_idx, threshold_bin)},
    "leaves": {node: value}, "features": [...], "depth": d}. Node ids:
    root 1, children 2n / 2n+1 (left = bin <= threshold).

    ``check_bins``: NULL feature bins are rejected loudly up front
    (review r10f: posexplode keeps the NULL element, so it used to
    surface as a TypeError deep inside the driver argmax; bins
    produced by :func:`quantile_bin_expr` are never NULL — this
    guards foreign bin columns). Callers that fit many trees over the
    SAME bin columns (boosting) check once and pass ``False``.
    """
    cols = list(feature_bin_cols)
    if check_bins:
        bad_row = df.agg(
            *[
                F.count_if(F.col(c).isNull()).alias(f"__b{i}")
                for i, c in enumerate(cols)
            ]
        ).first()
        nulls = {
            c: int(bad_row[f"__b{i}"])
            for i, c in enumerate(cols)
            if bad_row[f"__b{i}"]
        }
        if nulls:
            raise ValueError(
                f"fit_histogram_tree: NULL feature bins in {nulls} — "
                "bin columns must be non-null (quantile_bin_expr maps "
                "NULL values to bin 0). Impute or re-bin first."
            )
    work = df.select(
        *[F.col(c) for c in cols], F.col(target_col), F.lit(1).alias("__node")
    )
    splits: dict[int, tuple[int, int]] = {}
    frontier: set[int] = {1}
    for _level in range(depth):
        # only rows in nodes that can still split pay the posexplode
        # (review r10f: settled leaves used to be re-histogrammed —
        # and deterministically re-rejected — at every later level)
        active = work.filter(
            F.col("__node").isin([int(x) for x in frontier])
        )
        hists = _histograms_for_level(active, cols, target_col, "__node")
        level_splits = {}
        for node, per_feature in sorted(hists.items()):
            best = None
            for fidx in sorted(per_feature):
                cand = _best_split_from_hist(per_feature[fidx])
                if cand is None:
                    continue
                gain, thr = cand
                # ties across features -> smallest feature index
                if best is None or gain > best[0] + 1e-12:
                    best = (gain, fidx, thr)
            if best is not None and best[0] > min_split_gain:
                level_splits[node] = (best[1], best[2])
        if not level_splits:
            break
        splits.update(level_splits)
        frontier = {
            c for node in level_splits for c in (2 * node, 2 * node + 1)
        }
        # advance assignments: split nodes branch, others stay (become
        # leaves at their current id)
        expr = F.col("__node")
        for node, (fidx, thr) in level_splits.items():
            expr = F.when(
                F.col("__node") == node,
                F.when(F.col(cols[fidx]) <= thr, F.lit(node * 2)).otherwise(
                    F.lit(node * 2 + 1)
                ),
            ).otherwise(expr)
        work = work.withColumn("__node", expr)
    leaf_rows = work.groupBy("__node").agg(F.avg(target_col).alias("v")).collect()
    leaves = {r["__node"]: float(r["v"]) for r in leaf_rows}
    return {
        "splits": splits,
        "leaves": leaves,
        "features": cols,
        "depth": depth,
    }


def predict_tree_expr(tree: dict, feature_cols: Sequence[str] | None = None) -> Column:
    """Prediction column for a :func:`fit_histogram_tree` model —
    routes each row through the split table with nested when()
    expressions (pure Catalyst, codegen'd; the analog of the
    reference's tree->C codegen M7)."""
    cols = list(feature_cols or tree["features"])

    def node_expr(node: int) -> Column:
        if node in tree["splits"]:
            fidx, thr = tree["splits"][node]
            return F.when(
                F.col(cols[fidx]) <= thr, node_expr(node * 2)
            ).otherwise(node_expr(node * 2 + 1))
        return F.lit(tree["leaves"].get(node, 0.0))

    return node_expr(1)


def fit_boosted_trees(
    df: DataFrame,
    feature_bin_cols: Sequence[str],
    target_col: str,
    rounds: int = 3,
    depth: int = 2,
    learning_rate: float = 0.5,
    checkpoint_every: int = 16,
) -> dict:
    """Gradient boosting on squared loss as an iterative dataflow:
    start from an explicit base score (the target mean — the
    reference's BASE_SCORE calibration, SURVEY.md §2.8 X10), then each
    round fits a histogram tree to the current residual (for squared
    loss the negative gradient IS the residual) and the residual
    column advances by a broadcast prediction expression — no
    per-round materialization, O(trees) driver state.

    The residual expression nests one tree per round; at the
    reference's 200-round configs that unbounded growth is a Catalyst
    analysis/codegen hazard, so every ``checkpoint_every`` rounds the
    accumulated residual is folded into a lazily localCheckpointed
    column and the expression restarts flat (bounded plan, same
    arithmetic; lineage truncation means an executor loss during a
    later round fails the fit instead of recomputing — rerun it).

    NULL / NaN targets are rejected loudly inside the base-score pass:
    a NULL target silently shrinks histogram gradient sums while still
    counting rows, and one NaN makes the base score NaN.

    Returns {"base_score": b, "trees": [...], "learning_rate": lr};
    combine with :func:`predict_boosted_expr`.
    """
    cols = list(feature_bin_cols)
    # cast once: a value that becomes NULL on the double cast (e.g. a
    # string target) must count as bad too — see fit_logistic._bad
    t = F.col(target_col).cast("double")
    base = df.agg(
        F.avg(target_col).alias("b"),
        F.sum(
            F.when(t.isNull() | F.isnan(t), F.lit(1)).otherwise(F.lit(0))
        ).alias("bad"),
        *[
            F.count_if(F.col(c).isNull()).alias(f"__b{i}")
            for i, c in enumerate(cols)
        ],
    ).collect()[0]
    if (base["bad"] or 0) > 0:
        raise ValueError(
            f"fit_boosted_trees: {base['bad']} NULL/NaN values in "
            f"target {target_col!r} — they silently bias every "
            "histogram's gradient sums. Filter or impute first."
        )
    bad_bins = {
        c: int(base[f"__b{i}"])
        for i, c in enumerate(cols)
        if base[f"__b{i}"]
    }
    if bad_bins:
        raise ValueError(
            f"fit_boosted_trees: NULL feature bins in {bad_bins} — "
            "bin columns must be non-null. Impute or re-bin first."
        )
    if base["b"] is None:
        raise ValueError(
            "fit_boosted_trees: empty training frame — nothing to fit"
        )
    base_score = float(base["b"])
    work_base = df.select(*[F.col(c) for c in cols], t)
    resid = t - F.lit(base_score)
    trees: list[dict] = []
    for r in range(rounds):
        if checkpoint_every and r > 0 and r % checkpoint_every == 0:
            work_base = work_base.withColumn(
                "__resid_base", resid
            ).localCheckpoint(eager=False)
            resid = F.col("__resid_base")
        work = work_base.withColumn("__resid", resid)
        tree = fit_histogram_tree(
            work, cols, "__resid", depth=depth, check_bins=False
        )
        trees.append(tree)
        resid = resid - F.lit(learning_rate) * predict_tree_expr(tree, cols)
    return {"base_score": base_score, "trees": trees, "learning_rate": learning_rate}


def predict_boosted_expr(
    model: dict | Sequence[dict],
    learning_rate: float | None = None,
    feature_cols: Sequence[str] | None = None,
) -> Column:
    """Prediction for a :func:`fit_boosted_trees` model:
    base_score + lr * sum of tree outputs (a bare tree list with an
    explicit ``learning_rate`` is accepted for ablations)."""
    if isinstance(model, dict):
        trees = model["trees"]
        lr = model["learning_rate"]
        out = F.lit(float(model["base_score"]))
    else:
        trees = model
        lr = learning_rate if learning_rate is not None else 0.5
        out = F.lit(0.0)
    for t in trees:
        out = out + F.lit(lr) * predict_tree_expr(t, feature_cols)
    return out
