"""Model scoring: GBDT tree ensembles compiled to Catalyst expressions.

The reference compiles a trained XGBoost ensemble to branchy C/CUDA
(python/cuda_codegen/generator.py:392-474: each tree -> nested
if/else, sum leaves + base_score, then the objective transform) and
executes it in a single-core loop (runtime/ffi/scoring_shim.c:16-62).

The Spark-idiomatic analog: compile each tree to a nested
``CASE WHEN`` column expression. Whole-stage codegen turns the ensemble
into JVM bytecode, so the hot loop is vectorized JVM code over the
columnar scan — no Python in the path, and the same plan runs on 1000
executors. (When an xgboost runtime is available, ``xgboost_udf``
wraps ``Booster.predict`` in an Arrow pandas UDF instead; at test
scale the expression path is the oracle-checkable one.)

Model format: a plain dict (JSON-able), a subset of XGBoost's dump:

    {"base_score": 0.0,
     "objective": "binary:logistic",      # or "reg:squarederror"
     "trees": [ {"split": "f0", "threshold": 1.5,
                 "missing": "left",        # NaN/null routing
                 "yes": {...}, "no": {...}}
                | {"leaf": 0.3} , ... ]}

NaN routing follows XGBoost semantics: a missing (null or NaN) feature
goes to the node's ``missing`` branch (generator.py:399-461,
docs/CUDA_CODEGEN.md:67-75).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from feature_store_spark.functions import sigmoid
from feature_store_spark.operators.topk import top_k, top_k_per_group


def _node_to_expr(node: dict, feature_cols: dict[str, str]) -> Column:
    if "leaf" in node:
        return F.lit(float(node["leaf"]))
    col = F.col(feature_cols[node["split"]])
    missing = (
        col.isNull() | F.isnan(col.cast("double"))
    )
    goes_yes = col < F.lit(float(node["threshold"]))
    if node.get("missing", "left") == "left":
        cond = missing | goes_yes
    else:
        cond = ~missing & goes_yes
    return F.when(cond, _node_to_expr(node["yes"], feature_cols)).otherwise(
        _node_to_expr(node["no"], feature_cols)
    )


def _node_to_sql(node: dict, feature_cols: dict[str, str]) -> str:
    """DuckDB/ANSI CASE WHEN twin of :func:`_node_to_expr` for oracle SQL."""
    if "leaf" in node:
        return repr(float(node["leaf"]))
    c = feature_cols[node["split"]]
    t = repr(float(node["threshold"]))
    missing = f"({c} IS NULL OR isnan(CAST({c} AS DOUBLE)))"
    if node.get("missing", "left") == "left":
        cond = f"({missing} OR {c} < {t})"
    else:
        cond = f"(NOT {missing} AND {c} < {t})"
    yes = _node_to_sql(node["yes"], feature_cols)
    no = _node_to_sql(node["no"], feature_cols)
    return f"(CASE WHEN {cond} THEN {yes} ELSE {no} END)"


def _transform(objective: str, raw: Column) -> Column:
    if objective in ("binary:logistic", "rank:pairwise", "rank:ndcg", "rank:map"):
        return sigmoid(raw)
    return raw  # reg:*, binary:logitraw -> identity (generator.py:54-80)


def compile_model_expr(model: dict, feature_cols: dict[str, str]) -> Column:
    """Compile a GBDT model dict into a single scoring Column."""
    raw = F.lit(float(model.get("base_score", 0.0)))
    for tree in model["trees"]:
        raw = raw + _node_to_expr(tree, feature_cols)
    return _transform(model.get("objective", "binary:logistic"), raw)


def compile_model_sql(model: dict, feature_cols: dict[str, str]) -> str:
    """SQL twin of :func:`compile_model_expr` (for DuckDB oracles)."""
    terms = [repr(float(model.get("base_score", 0.0)))]
    terms += [_node_to_sql(t, feature_cols) for t in model["trees"]]
    raw = " + ".join(terms)
    obj = model.get("objective", "binary:logistic")
    if obj in ("binary:logistic", "rank:pairwise", "rank:ndcg", "rank:map"):
        return f"(1.0 / (1.0 + exp(-({raw}))))"
    return f"({raw})"


def score(
    df: DataFrame,
    model: dict,
    feature_cols: dict[str, str],
    score_col: str = "score",
    max_expr_trees: int = 50,
    dtype: str = "float32",
) -> DataFrame:
    """Score rows with the right physical path for the ensemble size:
    Catalyst expressions (whole-stage codegen) up to ``max_expr_trees``
    — past that janino hits method-size limits and eval goes
    interpreted (measured 200x cliff) — else the compiled-kernel /
    Arrow pandas UDF (:func:`best_tree_udf`).

    ``dtype`` applies to the UDF tier only: float32 is XGBoost's own
    inference precision (and 2x the kernel bandwidth), but it means a
    model crossing ``max_expr_trees`` can flip a value lying within
    float32 rounding of a threshold (review r10j) — pass "float64"
    when bit-parity with the expression tier matters more than
    throughput (the oracle-checked queries do)."""
    if len(model["trees"]) > max_expr_trees:
        udf = best_tree_udf(model, list(feature_cols.keys()), dtype=dtype)
        return df.withColumn(
            score_col, udf(*[F.col(c) for c in feature_cols.values()])
        )
    return df.withColumn(score_col, compile_model_expr(model, feature_cols))


def score_staged(
    df: DataFrame,
    model: dict,
    feature_cols: dict[str, str],
    score_col: str = "score",
    trees_per_stage: int = 25,
    barrier: bool = False,
) -> DataFrame:
    """Ensemble scoring compiled in stages of ``trees_per_stage``
    partial-sum columns, then summed.

    What staging actually bounds (review r10j, verified against the
    optimized plan): the PYTHON-side Column construction — one giant
    expression overflows the Python->Catalyst converter recursion.
    Catalyst's CollapseProject then inlines the single-use stage
    aliases back into ONE Project, so the GENERATED code is NOT
    bounded by default — janino's method-size cliff still applies at
    the same ensemble size it does for :func:`compile_model_expr`.
    For janino-safe large-ensemble scoring use :func:`score`, which
    routes past ``max_expr_trees`` to the Arrow/native kernel tier.

    ``barrier=True`` makes each stage a REAL codegen boundary via a
    lazy ``localCheckpoint`` — bounded generated code at the cost of
    materializing each stage's rows once; only worth it when the UDF
    tier is unavailable and the ensemble is too big for one method.
    """
    trees = model["trees"]
    stage_cols: list[str] = []
    out = df
    for si in range(0, len(trees), trees_per_stage):
        expr: Column | None = None
        for t in trees[si : si + trees_per_stage]:
            e = _node_to_expr(t, feature_cols)
            expr = e if expr is None else expr + e
        name = f"__trees_{si}"
        out = out.withColumn(name, expr)
        if barrier:
            out = out.localCheckpoint(eager=False)
        stage_cols.append(name)
    raw = F.lit(float(model.get("base_score", 0.0)))
    for c in stage_cols:
        raw = raw + F.col(c)
    out = out.withColumn(
        score_col, _transform(model.get("objective", "binary:logistic"), raw)
    )
    return out.drop(*stage_cols)


def score_topk(
    df: DataFrame,
    model: dict,
    feature_cols: dict[str, str],
    k: int,
    tiebreak: Sequence[str] = (),
    score_col: str = "score",
) -> DataFrame:
    """ScoreTopK (runtime/src/grpc_service.rs:30-89): score all rows,
    return the global top-K descending. Compiles to scan -> WSCG
    expression eval -> TakeOrderedAndProject."""
    scored = score(df, model, feature_cols, score_col)
    order = [F.col(score_col).desc()] + [F.col(t).asc() for t in tiebreak]
    return top_k(scored, k, order)


def score_topk_per_user(
    items: DataFrame,
    users: DataFrame,
    model: dict,
    item_feature_cols: dict[str, str],
    user_feature_cols: dict[str, str],
    k: int,
    user_key: str = "user_id",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Split-feature scoring (generator.py:752-782): every user scored
    against every candidate item, top-K per user. The small user batch
    is broadcast (the Spark analog of keeping the item matrix resident
    and shipping 52 bytes of user features per request).
    """
    feature_cols = {**item_feature_cols, **user_feature_cols}
    crossed = items.crossJoin(F.broadcast(users))
    scored = score(crossed, model, feature_cols)
    order = [F.col("score").desc()] + [F.col(t).asc() for t in tiebreak]
    return top_k_per_group(scored, k, [user_key], order)


def example_model(features: Sequence[str]) -> dict:
    """A small deterministic 4-tree model over the given features —
    used where the reference would load a trained .ubj. Thresholds are
    arbitrary but fixed; structure exercises depth-3 paths and missing
    routing in both directions."""
    f = list(features)

    def leaf(v):
        return {"leaf": v}

    def node(split, thr, yes, no, missing="left"):
        return {"split": split, "threshold": thr, "missing": missing,
                "yes": yes, "no": no}

    t1 = node(f[0], 25.0,
              node(f[1 % len(f)], 30000.0, leaf(-0.4), leaf(0.2), "right"),
              node(f[1 % len(f)], 50000.0, leaf(0.1), leaf(0.6)))
    t2 = node(f[2 % len(f)], 0.05,
              leaf(-0.3),
              node(f[0], 40.0, leaf(0.25), leaf(0.5), "right"))
    t3 = node(f[3 % len(f)], 0.04,
              node(f[2 % len(f)], 0.08, leaf(-0.15), leaf(0.05)),
              leaf(0.35))
    t4 = node(f[1 % len(f)], 20000.0,
              leaf(-0.2),
              node(f[3 % len(f)], 0.06, leaf(0.15), leaf(0.3)))
    return {
        "base_score": 0.0,
        "objective": "binary:logistic",
        "trees": [t1, t2, t3, t4],
    }


def model_from_xgboost_json(
    obj,
    feature_names: Sequence[str] | None = None,
    objective: str | None = None,
) -> dict:
    """Bridge an XGBoost model JSON into the internal model dict, so a
    model trained elsewhere with real XGBoost scores through every tier
    here (Catalyst CASE WHEN, numpy heap, gcc kernel) without the
    xgboost runtime — the format half of reference M6/M7
    (examples/EXAMPLE.md step 8 loads a trained .ubj;
    python/gbdt_example/train.py:101-234 trains it).

    Accepts BOTH public XGBoost JSON layouts:

    - ``Booster.save_model("m.json")``: ``{"learner": {...}}`` with
      per-tree flat arrays (``left_children`` / ``right_children`` /
      ``split_indices`` / ``split_conditions`` / ``default_left``;
      leaves hold their value in ``split_conditions`` with
      ``left_children == -1``).
    - ``Booster.get_dump(dump_format="json")``: a list of nested node
      dicts (``nodeid`` / ``split`` / ``split_condition`` / ``yes`` /
      ``no`` / ``missing`` / ``children``).

    Semantics line up exactly: XGBoost routes ``x < split_condition``
    to ``yes`` and missing values to ``default_left`` — identical to
    this module's ``x < threshold`` / ``missing`` convention. For
    ``binary:*`` objectives the stored ``base_score`` is on the
    probability scale (XGBoost's saved-param convention) and is
    converted to the margin-space ``log(p / (1-p))`` the internal dict
    expects; regression objectives pass it through raw.
    """
    import math

    if isinstance(obj, list):  # get_dump(dump_format="json") layout
        # dumps carry NO learner params: the objective must come from
        # the caller (review r10j — hardcoding binary:logistic
        # silently sigmoid-squashed regression dumps). feature_names
        # remaps the dump's positional f{i} split names so
        # compile_model_expr's feature map works (previously the
        # parameter was silently ignored on this layout).
        rename = {}
        if feature_names:
            rename = {f"f{i}": n for i, n in enumerate(feature_names)}

        def conv_dump(n: dict) -> dict:
            if "leaf" in n:
                return {"leaf": float(n["leaf"])}
            kids = {c["nodeid"]: c for c in n["children"]}
            split = str(n["split"])
            return {
                "split": rename.get(split, split),
                "threshold": float(n["split_condition"]),
                "missing": "left" if n["missing"] == n["yes"] else "right",
                "yes": conv_dump(kids[n["yes"]]),
                "no": conv_dump(kids[n["no"]]),
            }

        return {
            "base_score": 0.0,  # dumps carry no learner params
            "objective": objective or "binary:logistic",
            "trees": [conv_dump(t) for t in obj],
        }

    learner = obj["learner"]
    params = learner["learner_model_param"]
    objective = objective or learner["objective"]["name"]
    n_feat = int(params["num_feature"])
    names = list(
        feature_names
        or learner.get("feature_names")
        or [f"f{i}" for i in range(n_feat)]
    )

    def conv_tree(t: dict) -> dict:
        left = [int(v) for v in t["left_children"]]
        right = [int(v) for v in t["right_children"]]
        sidx = [int(v) for v in t["split_indices"]]
        scond = [float(v) for v in t["split_conditions"]]
        dleft = [int(v) for v in t["default_left"]]

        def node(i: int) -> dict:
            if left[i] == -1:
                return {"leaf": scond[i]}
            return {
                "split": names[sidx[i]],
                "threshold": scond[i],
                "missing": "left" if dleft[i] else "right",
                "yes": node(left[i]),
                "no": node(right[i]),
            }

        return node(0)

    base = float(params["base_score"])
    if objective.startswith("binary:") and objective != "binary:logitraw":
        base = math.log(base / (1.0 - base))  # probability -> margin
    return {
        "base_score": base,
        "objective": objective,
        "trees": [
            conv_tree(t) for t in learner["gradient_booster"]["model"]["trees"]
        ],
    }


def _export_threshold(thr: float) -> float:
    """``x <= thr`` → ``x < cond``, robust to a float32 runtime: for
    integral thr (every histogram-tree bin split) the midpoint
    ``thr + 0.5`` is exact on integer features and survives any
    float32 rounding; otherwise one ulp up in FLOAT32 space (a
    float64 ulp would round back to thr in float32 and flip rows
    landing exactly on the threshold)."""
    if float(thr).is_integer() and abs(thr) < 2**52:
        return float(thr) + 0.5
    import numpy as np

    return float(np.nextafter(np.float32(thr), np.float32(np.inf)))


def model_to_xgboost_json(
    model: dict, feature_names: Sequence[str] | None = None
) -> dict:
    """Export a :func:`training.fit_boosted_trees` model as XGBoost
    ``save_model``-layout JSON — the other half of the format bridge
    (reference M6: its pipelines persist .ubj/.json models, so a model
    trained HERE as distributed dataflow can be handed to a real
    XGBoost runtime, and round-trips through
    :func:`model_from_xgboost_json` onto every scoring tier).

    Semantics mapping, each piece exact:

    - our split routes ``x <= thr`` left; XGBoost routes
      ``x < split_condition`` to ``yes``. Integral thresholds (the
      histogram trees split on BIN indices, so this is every real
      model) export as ``thr + 0.5`` — exactly equivalent on integer
      features AND robust to XGBoost storing split conditions as
      float32 (a one-float64-ulp shift would round back to ``thr``
      in float32 and flip every row landing exactly on the
      threshold). Non-integral thresholds shift by one ulp in
      FLOAT32 space (``np.nextafter(float32(thr), +inf)``), the
      smallest shift that survives the runtime's precision.
    - our prediction is ``base + lr · Σ leaf``; XGBoost sums raw leaf
      values, so leaves are exported pre-scaled by the learning rate.
    - nulls: ``when(x <= thr, L).otherwise(R)`` sends NULL right, so
      ``default_left = 0`` everywhere.
    - squared-loss training ⇒ ``reg:squarederror``, whose base_score
      is margin-space on both sides (no probability conversion).

    Only the fields :func:`model_from_xgboost_json` documents are
    emitted (the flat per-tree arrays + learner params); a full
    XGBoost runtime may require auxiliary bookkeeping fields beyond
    this subset — the golden contract tested here is the bit-exact
    round-trip through the import bridge.
    """
    import math as _m

    trees = model["trees"]
    names = list(
        feature_names or (trees[0]["features"] if trees else [])
    )
    lr = float(model["learning_rate"])
    out_trees = []
    for t in trees:
        left: list[int] = []
        right: list[int] = []
        sidx: list[int] = []
        scond: list[float] = []
        dleft: list[int] = []

        def add(node: int, t=t) -> int:
            i = len(left)
            left.append(-1)
            right.append(-1)
            sidx.append(0)
            scond.append(0.0)
            dleft.append(0)
            if node in t["splits"]:
                fidx, thr = t["splits"][node]
                sidx[i] = int(fidx)
                scond[i] = _export_threshold(float(thr))
                li = add(node * 2)
                ri = add(node * 2 + 1)
                left[i] = li
                right[i] = ri
            else:
                scond[i] = lr * float(t["leaves"].get(node, 0.0))
            return i

        add(1)
        out_trees.append(
            {
                "left_children": left,
                "right_children": right,
                "split_indices": sidx,
                "split_conditions": scond,
                "default_left": dleft,
                "tree_param": {"num_nodes": str(len(left))},
            }
        )
    return {
        "learner": {
            "learner_model_param": {
                "num_feature": str(len(names)),
                "base_score": repr(float(model["base_score"])),
            },
            "objective": {"name": "reg:squarederror"},
            "feature_names": names,
            "gradient_booster": {
                "model": {
                    "trees": out_trees,
                    "gbtree_model_param": {
                        "num_trees": str(len(out_trees))
                    },
                }
            },
        }
    }


def _model_heap(model: dict, feature_names: Sequence[str]):
    """Flatten an ensemble into complete depth-D heap arrays.

    Child index is then pure arithmetic (2i+1+go_right) — no
    left/right pointer chasing. Early leaves become pass-through nodes
    (thr=+inf, missing->left) that funnel every lane left until the
    leaf row. Returns (featH, thrH, missH, leafH, D, base, logistic)
    with shapes (n_trees, 2^D - 1) / leaves (n_trees, 2^D).
    """
    import numpy as np

    fidx = {f: i for i, f in enumerate(feature_names)}
    n_trees = len(model["trees"])

    def _depth(n) -> int:
        if "leaf" in n:
            return 0
        return 1 + max(_depth(n["yes"]), _depth(n["no"]))

    D = max(1, max(_depth(t) for t in model["trees"]))
    if D > 24:
        # the complete-heap layout is EXPONENTIAL in depth (2^D slots
        # per tree): a lossguide-grown tree of depth 31+ would also
        # overflow the C kernel's 32-bit (1 << depth) — refuse loudly
        # instead of OOMing the driver and every executor (review
        # r10j). Depth-bounded (hist/depthwise) models are the shape
        # this tier exists for; score depth-unbounded models through
        # the expression tier or a pointer-walk UDF.
        raise ValueError(
            f"_model_heap: ensemble depth {D} > 24 — the complete-"
            "heap layout needs 2^depth slots per tree; use "
            "compile_model_expr / score(max_expr_trees=...) for "
            "depth-unbounded (lossguide) models"
        )
    n_inner = 2**D - 1

    featH = np.zeros((n_trees, n_inner), dtype=np.int32)
    thrH = np.full((n_trees, n_inner), np.inf, dtype=np.float64)
    missH = np.ones((n_trees, n_inner), dtype=bool)
    leafH = np.zeros((n_trees, 2**D), dtype=np.float64)

    def fill(ti: int, n: dict, pos: int, d: int) -> None:
        if d == D:
            leafH[ti, pos - n_inner] = float(n["leaf"])
            return
        if "leaf" in n:
            # replicate the early leaf across BOTH children so every
            # routing decision below it lands on the right value. The
            # old left-spine-only fill relied on thr=+inf sending all
            # lanes left, but x == +inf fails ``x < inf`` and went
            # RIGHT onto a zero leaf — reachable on the float32 paths
            # by any feature value beyond f32 max (casts to inf).
            fill(ti, n, 2 * pos + 1, d + 1)
            fill(ti, n, 2 * pos + 2, d + 1)
            return
        featH[ti, pos] = fidx[n["split"]]
        thrH[ti, pos] = float(n["threshold"])
        missH[ti, pos] = n.get("missing", "left") == "left"
        fill(ti, n["yes"], 2 * pos + 1, d + 1)
        fill(ti, n["no"], 2 * pos + 2, d + 1)

    for ti, t in enumerate(model["trees"]):
        fill(ti, t, 0, 0)

    base = float(model.get("base_score", 0.0))
    logistic = model.get("objective", "binary:logistic") in (
        "binary:logistic", "rank:pairwise", "rank:ndcg", "rank:map",
    )
    return featH, thrH, missH, leafH, D, base, logistic


def vectorized_tree_udf(model: dict, feature_names: Sequence[str], dtype: str = "float64"):
    """Arrow-batched numpy tree-ensemble scorer — the large-ensemble
    fast path (M1). The compiled-expression path is ideal up to a few
    dozen trees; past that, generated code falls out of whole-stage
    codegen into interpreted eval, so big ensembles traverse flattened
    node arrays vectorized over the Arrow batch instead — the Spark
    twin of the reference's tree->C compilation (scoring_shim.c loop).

    Usage: df.withColumn("score", vectorized_tree_udf(m, feats)(*feats))
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    names = list(feature_names)
    featH, thrH, missH, leafH, D, base, logistic = _model_heap(model, names)
    n_trees = len(model["trees"])
    n_inner = 2**D - 1
    tids = np.arange(n_trees)[:, None]
    np_dtype = np.float32 if dtype == "float32" else np.float64
    thrT = thrH.astype(np_dtype)  # float32 halves compare/gather bandwidth
    # (the reference's C scorer is float32 end to end, scoring_shim.c)

    @pandas_udf("double")
    def predict(*cols):
        import pandas as pd

        X = np.column_stack([c.to_numpy(dtype=np_dtype) for c in cols])
        n = X.shape[0]
        has_nan = bool(np.isnan(X).any())
        rows = np.arange(n)[None, :]
        idx = np.zeros((n_trees, n), dtype=np.int32)
        for _ in range(D):
            f = featH[tids, idx]
            x = X[rows, f]
            if has_nan:
                go_right = ~np.where(
                    np.isnan(x), missH[tids, idx], x < thrT[tids, idx]
                )
            else:
                go_right = ~(x < thrT[tids, idx])
            idx = 2 * idx + 1 + go_right
        raw = base + leafH[tids, idx - n_inner].sum(axis=0)
        if logistic:
            raw = 1.0 / (1.0 + np.exp(-raw))
        return pd.Series(raw)

    return predict


# ---------------------------------------------------------------------------
# Native compiled kernel — the Spark twin of the reference's CUDA/C
# codegen subsystem (python/cuda_codegen/generator.py + the
# scoring_shim.c hot loop). The reference compiles each tree to branchy
# C; we compile ONE model-independent table-driven kernel (nodes as
# arrays, child = 2i+1+go_right) so the .so is built once and reused
# for every model — no per-model gcc invocation, same compiled-loop
# speed. The pandas UDF passes Arrow batches straight into it.
# ---------------------------------------------------------------------------

_KERNEL_BODY = r"""
/* Score n rows of X (row-major n x n_feat REAL) against a GBDT
 * ensemble in complete-heap form. NaN routing follows XGBoost
 * semantics: missing goes to the node's miss_left side.
 *
 * A single (row, tree) traversal is a chain of dependent loads
 * (~2 loads x depth, fully serialized); interleaving a block of rows
 * per tree gives the core BLK independent chains to overlap, which is
 * worth ~5x over the naive row loop. The row block's features
 * (BLK x n_feat) stay resident in L1 across all trees. */
void NAME(const REAL *X, int64_t n, int32_t n_feat,
          const int32_t *feat, const REAL *thr,
          const uint8_t *miss_left, const double *leaf,
          int32_t n_trees, int32_t depth, double base,
          int32_t logistic, double *out) {
    const int32_t n_inner = (1 << depth) - 1;
    const int32_t n_leaf = 1 << depth;
    for (int64_t r0 = 0; r0 < n; r0 += BLK) {
        const int32_t m = (n - r0 < BLK) ? (int32_t)(n - r0) : BLK;
        double acc[BLK];
        int32_t idx[BLK];
        for (int32_t b = 0; b < m; b++) acc[b] = base;
        for (int32_t t = 0; t < n_trees; t++) {
            const int32_t *tf = feat + (int64_t)t * n_inner;
            const REAL *tt = thr + (int64_t)t * n_inner;
            const uint8_t *tm = miss_left + (int64_t)t * n_inner;
            const double *tl = leaf + (int64_t)t * n_leaf;
            for (int32_t b = 0; b < m; b++) idx[b] = 0;
            for (int32_t d = 0; d < depth; d++) {
                for (int32_t b = 0; b < m; b++) {
                    const int32_t i = idx[b];
                    const REAL x = X[(r0 + b) * n_feat + tf[i]];
                    /* Branch on isnan, not a tm[i] select: NaNs are
                     * rare, so the never-taken branch keeps the
                     * miss-table load off the critical path (measured
                     * ~4x over the branchless IEEE-compare form). */
                    const int go_right = isnan(x) ? !tm[i] : !(x < tt[i]);
                    idx[b] = 2 * i + 1 + go_right;
                }
            }
            for (int32_t b = 0; b < m; b++) acc[b] += tl[idx[b] - n_inner];
        }
        for (int32_t b = 0; b < m; b++)
            out[r0 + b] = logistic ? 1.0 / (1.0 + exp(-acc[b])) : acc[b];
    }
}
"""

# f32 (throughput: halves X/thr bandwidth, reference parity) and f64
# (bit-exact vs double-typed SQL/Catalyst — the oracle-checkable one)
# in one .so; both instantiate the same body.
_NATIVE_KERNEL_C = (
    "#include <math.h>\n#include <stdint.h>\n#define BLK 32\n"
    + _KERNEL_BODY.replace("REAL", "float").replace("NAME", "score_batch")
    + _KERNEL_BODY.replace("REAL", "double").replace("NAME", "score_batch_f64")
)

import shutil as _shutil  # noqa: E402

HAS_GCC = _shutil.which("gcc") is not None or _shutil.which("cc") is not None


def _ensure_native_kernel() -> str:
    """Compile the generic kernel to a cached .so (keyed by source
    md5); atomic rename so concurrent workers race safely. Returns the
    .so path. On a cluster, ship it with spark.sparkContext.addFile or
    let each executor compile its own copy (the source travels in the
    UDF closure)."""
    import hashlib
    import os
    import subprocess
    import tempfile

    tag = hashlib.md5(_NATIVE_KERNEL_C.encode()).hexdigest()[:12]
    so_path = os.path.join(tempfile.gettempdir(), f"fss_kernel_{tag}.so")
    if os.path.exists(so_path):
        return so_path
    cc = _shutil.which("gcc") or _shutil.which("cc")
    if cc is None:  # pragma: no cover
        raise NotImplementedError("no C compiler on PATH")
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "kernel.c")
        tmp_so = os.path.join(td, "kernel.so")
        with open(src, "w") as fh:
            fh.write(_NATIVE_KERNEL_C)
        subprocess.run(
            [cc, "-O3", "-fPIC", "-shared", "-o", tmp_so, src, "-lm"],
            check=True, capture_output=True,
        )
        os.replace(tmp_so, so_path)  # atomic publish
    return so_path


def _native_scorer(featH, thrH, missH, leafH, D, base, logistic, dtype="float32"):
    """ctypes closure over the compiled kernel: X (n, n_feat) in
    ``dtype`` -> scores (n,) float64. ``float64`` compares features
    and thresholds in full double precision — bit-identical to the
    Catalyst/DuckDB CASE WHEN path, so oracle checks can be exact."""
    import ctypes

    import numpy as np

    real = ctypes.c_double if dtype == "float64" else ctypes.c_float
    np_real = np.float64 if dtype == "float64" else np.float32
    lib = ctypes.CDLL(_ensure_native_kernel())
    fn = lib.score_batch_f64 if dtype == "float64" else lib.score_batch
    fn.restype = None
    p = ctypes.POINTER
    fn.argtypes = [
        p(real), ctypes.c_int64, ctypes.c_int32,
        p(ctypes.c_int32), p(real), p(ctypes.c_uint8),
        p(ctypes.c_double), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_double, ctypes.c_int32, p(ctypes.c_double),
    ]
    featC = np.ascontiguousarray(featH, dtype=np.int32)
    thrC = np.ascontiguousarray(thrH, dtype=np_real)
    missC = np.ascontiguousarray(missH, dtype=np.uint8)
    leafC = np.ascontiguousarray(leafH, dtype=np.float64)
    n_trees = featC.shape[0]

    def run(X: "np.ndarray") -> "np.ndarray":
        X = np.ascontiguousarray(X, dtype=np_real)
        out = np.empty(X.shape[0], dtype=np.float64)
        fn(
            X.ctypes.data_as(p(real)),
            X.shape[0], X.shape[1],
            featC.ctypes.data_as(p(ctypes.c_int32)),
            thrC.ctypes.data_as(p(real)),
            missC.ctypes.data_as(p(ctypes.c_uint8)),
            leafC.ctypes.data_as(p(ctypes.c_double)),
            n_trees, D, base, int(logistic),
            out.ctypes.data_as(p(ctypes.c_double)),
        )
        return out

    return run


def native_tree_udf(model: dict, feature_names: Sequence[str], dtype: str = "float32"):
    """GBDT scorer backed by the gcc-compiled kernel (reference M7's
    semantics as a Spark fast path; ~1-2 orders of magnitude over the
    numpy traversal, matching the reference's compiled-C throughput
    per core). The closure ships the heap arrays + C source; each
    Python worker compiles-or-reuses the cached .so lazily.

    ``dtype="float64"`` trades half the X/threshold bandwidth for
    full-double compares — bit-identical to the expression/SQL path.

    Raises NotImplementedError when no C compiler exists — callers
    fall back to :func:`vectorized_tree_udf` (see :func:`best_tree_udf`).
    """
    if not HAS_GCC:  # pragma: no cover
        raise NotImplementedError("no C compiler; use vectorized_tree_udf")
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    featH, thrH, missH, leafH, D, base, logistic = _model_heap(model, list(feature_names))
    np_real = np.float64 if dtype == "float64" else np.float32
    state: dict = {}

    @pandas_udf("double")
    def predict(*cols):
        import pandas as pd

        if "run" not in state:
            state["run"] = _native_scorer(
                featH, thrH, missH, leafH, D, base, logistic, dtype=dtype
            )
        X = np.column_stack([c.to_numpy(dtype=np_real) for c in cols])
        return pd.Series(state["run"](X))

    return predict


def best_tree_udf(
    model: dict, feature_names: Sequence[str], dtype: str = "float32"
):
    """Fastest available ensemble scorer: compiled-C kernel when a
    compiler exists, Arrow+numpy traversal otherwise. ``dtype``
    selects the numpy tier's precision; the C kernel is f32 by
    design, so float64 requests route to the numpy tier."""
    if HAS_GCC and dtype == "float32":
        return native_tree_udf(model, feature_names)
    return vectorized_tree_udf(model, feature_names, dtype=dtype)


try:  # optional xgboost fast path (not present in the test container)
    import xgboost  # noqa: F401

    HAS_XGBOOST = True
except Exception:  # pragma: no cover
    HAS_XGBOOST = False


def xgboost_udf(booster_bytes: bytes, feature_names: Sequence[str]):
    """Arrow-batched pandas UDF around xgboost.Booster.predict —
    the production scoring path when an xgboost runtime exists
    (reference M1/M4). Raises if xgboost is unavailable."""
    if not HAS_XGBOOST:  # pragma: no cover
        raise NotImplementedError(
            "xgboost is not installed in this environment; use "
            "compile_model_expr for the pure-Spark scoring path"
        )
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    names = list(feature_names)

    state: dict = {}

    @pandas_udf("double")
    def predict(*cols):
        import numpy as np
        import pandas as pd
        import xgboost as xgb

        # deserialize ONCE per worker process, not once per Arrow
        # batch (review r10j: load_model per ~10K-row batch made
        # deserialization dominate large-model scoring) — the same
        # closure-state pattern native_tree_udf uses
        booster = state.get("booster")
        if booster is None:
            booster = xgb.Booster()
            booster.load_model(bytearray(booster_bytes))
            state["booster"] = booster
        mat = np.column_stack([c.to_numpy(dtype="float64") for c in cols])
        dm = xgb.DMatrix(mat, feature_names=names)
        return pd.Series(booster.predict(dm))

    return predict
