"""Histogram tree / boosting fitters vs an exact single-node numpy
reference (the M8 differential-verification pattern applied to
training)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def _ref_best_split(bins_x, y):
    """Exact reference: best (gain, thr) for one feature."""
    nt, gt = len(y), float(y.sum())
    best = None
    for thr in sorted(set(bins_x))[:-1]:
        m = bins_x <= thr
        nl = int(m.sum())
        if nl in (0, nt):
            continue
        gl = float(y[m].sum())
        gain = gl * gl / nl + (gt - gl) ** 2 / (nt - nl) - gt * gt / nt
        if best is None or gain > best[0] + 1e-12:
            best = (gain, thr)
    return best


def _ref_tree(X, y, depth):
    """Exact level-wise reference tree with the same node-id scheme."""
    node = np.ones(len(y), dtype=int)
    splits = {}
    for _ in range(depth):
        new = {}
        for nd in sorted(set(node)):
            m = node == nd
            best = None
            for f in range(X.shape[1]):
                cand = _ref_best_split(X[m, f], y[m])
                if cand and (best is None or cand[0] > best[0] + 1e-12):
                    best = (cand[0], f, cand[1])
            if best and best[0] > 1e-9:
                new[nd] = (best[1], best[2])
        if not new:
            break
        splits.update(new)
        nxt = node.copy()
        for nd, (f, thr) in new.items():
            m = node == nd
            nxt[m] = np.where(X[m, f] <= thr, nd * 2, nd * 2 + 1)
        node = nxt
    leaves = {int(nd): float(y[node == nd].mean()) for nd in set(node)}
    return splits, leaves, node


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    X = rng.integers(0, 8, size=(400, 3))
    y = (
        3.0 * (X[:, 0] > 3)
        - 2.0 * (X[:, 1] > 5)
        + 0.5 * X[:, 2]
        + rng.normal(0, 0.1, 400)
    )
    return X, y


def test_fit_histogram_tree_matches_reference(spark, data):
    from feature_store_spark.training import fit_histogram_tree, predict_tree_expr

    X, y = data
    rows = [(int(a), int(b), int(c), float(v)) for (a, b, c), v in zip(X, y)]
    df = spark.createDataFrame(rows, ["f0", "f1", "f2", "y"])
    tree = fit_histogram_tree(df, ["f0", "f1", "f2"], "y", depth=2)
    ref_splits, ref_leaves, ref_node = _ref_tree(X, y, 2)
    assert tree["splits"] == ref_splits
    assert set(tree["leaves"]) == set(ref_leaves)
    for nd, v in ref_leaves.items():
        assert tree["leaves"][nd] == pytest.approx(v)
    # predictions route every row to its reference leaf value
    pred = df.select(
        predict_tree_expr(tree).alias("p"), F.col("y")
    ).collect()
    ref_pred = np.array([ref_leaves[int(n)] for n in ref_node])
    got = np.array([r["p"] for r in pred])
    assert got == pytest.approx(ref_pred)


def test_boosting_reduces_sse(spark, data):
    from feature_store_spark.training import (
        fit_boosted_trees,
        predict_boosted_expr,
    )

    X, y = data
    rows = [(int(a), int(b), int(c), float(v)) for (a, b, c), v in zip(X, y)]
    df = spark.createDataFrame(rows, ["f0", "f1", "f2", "y"])
    cols = ["f0", "f1", "f2"]
    model = fit_boosted_trees(df, cols, "y", rounds=3, depth=2, learning_rate=0.5)
    trees = model["trees"]
    assert len(trees) == 3
    sses = []
    for k in range(1, 4):
        sub = {**model, "trees": trees[:k]}
        p = predict_boosted_expr(sub, feature_cols=cols)
        sse = df.select(F.sum((F.col("y") - p) ** 2).alias("s")).collect()[0]["s"]
        sses.append(sse)
    assert sses[0] > sses[1] > sses[2]
    # 3 depth-2 rounds on a step function should capture most variance
    total = float(((y - y.mean()) ** 2).sum())
    assert sses[-1] < 0.2 * total


def test_quantile_bins_match_numpy_searchsorted(spark):
    """fit_quantile_bins boundaries come back sorted and deduped
    (point masses collapse), and quantile_bin_expr assigns
    bin = count of boundaries strictly below the value — the
    searchsorted contract the histogram tree splits on."""
    import numpy as np

    from feature_store_spark.training import fit_quantile_bins, quantile_bin_expr

    rng = np.random.default_rng(7)
    vals = np.concatenate(
        [rng.lognormal(2.0, 1.0, 4000), np.zeros(500)]  # point mass at 0
    )
    df = spark.createDataFrame([(float(v),) for v in vals], ["x"])
    bounds = fit_quantile_bins(df, ["x"], n_bins=16)
    bx = bounds["x"]
    assert bx == sorted(bx) and len(bx) == len(set(bx))  # sorted, deduped
    assert 2 <= len(bx) <= 15
    got = df.select(
        F.col("x"), quantile_bin_expr("x", bx).alias("b")
    ).collect()
    arr = np.array(bx)
    for r in got:
        assert r["b"] == int(np.sum(arr < r["x"]))


def test_boosted_checkpoint_every_matches_unchunked(spark, data):
    """Folding the residual into a checkpointed column every K rounds
    must not change the fitted model — same splits, same leaves (the
    checkpoint only flattens the expression tree)."""
    from feature_store_spark.training import fit_boosted_trees

    X, y = data
    rows = [(int(a), int(b), int(c), float(v)) for (a, b, c), v in zip(X, y)]
    df = spark.createDataFrame(rows, ["f0", "f1", "f2", "y"])
    cols = ["f0", "f1", "f2"]
    flat = fit_boosted_trees(df, cols, "y", rounds=4, depth=2,
                             learning_rate=0.5, checkpoint_every=0)
    chk = fit_boosted_trees(df, cols, "y", rounds=4, depth=2,
                            learning_rate=0.5, checkpoint_every=2)
    assert flat["base_score"] == chk["base_score"]
    for tf_, tc in zip(flat["trees"], chk["trees"]):
        assert tf_["splits"] == tc["splits"]
        assert set(tf_["leaves"]) == set(tc["leaves"])
        for n, v in tf_["leaves"].items():
            assert tc["leaves"][n] == pytest.approx(v, rel=1e-9)


def test_boosted_rejects_null_and_nan_target(spark):
    from feature_store_spark.training import fit_boosted_trees

    df = spark.createDataFrame(
        [(0, 1.0), (1, None), (0, 2.0)], "f0 int, y double"
    )
    with pytest.raises(ValueError, match="NULL/NaN"):
        fit_boosted_trees(df, ["f0"], "y", rounds=1, depth=1)
    df2 = spark.createDataFrame(
        [(0, 1.0), (1, float("nan")), (0, 2.0)], "f0 int, y double"
    )
    with pytest.raises(ValueError, match="NULL/NaN"):
        fit_boosted_trees(df2, ["f0"], "y", rounds=1, depth=1)


def test_quantile_bin_null_and_nan_routing(spark):
    """Pinned missing-value semantics: NULL -> bin 0, NaN -> top bin."""
    from feature_store_spark.training import quantile_bin_expr

    df = spark.createDataFrame(
        [(None,), (float("nan"),), (0.5,), (99.0,)], "x double"
    )
    got = {
        ("null" if r["x"] is None else str(r["x"])): r["b"]
        for r in df.select(
            F.col("x"), quantile_bin_expr("x", [1.0, 2.0, 3.0]).alias("b")
        ).collect()
    }
    assert got["null"] == 0
    assert got["nan"] == 3
    assert got["0.5"] == 0
    assert got["99.0"] == 3


def test_training_guards_reject_degenerate_inputs(spark):
    """Review r10f: the loud-rejection contract extended to the cases
    that used to surface as TypeError/ZeroDivisionError far from the
    cause."""
    import pytest as _pt
    from pyspark.sql import functions as F

    from feature_store_spark.training import (
        fit_boosted_trees,
        fit_histogram_tree,
        fit_logistic,
        fit_quantile_bins,
        predict_expr,
    )

    df = spark.createDataFrame(
        [(0, 1.0, 1.0), (1, 2.0, 0.0), (None, 3.0, 1.0)],
        "f0__bin int, x double, y double",
    )
    # NULL feature bin: loud, named
    with _pt.raises(ValueError, match="NULL feature bins"):
        fit_histogram_tree(df, ["f0__bin"], "y", depth=2)
    with _pt.raises(ValueError, match="NULL feature bins"):
        fit_boosted_trees(df, ["f0__bin"], "y", rounds=1)
    # single-class labels under class weighting
    ones = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 1.0)], "x double, y double"
    )
    with _pt.raises(ValueError, match="single-class"):
        fit_logistic(ones, ["x"], "y")
    # empty frames
    empty = ones.filter(F.lit(False))
    with _pt.raises(ValueError, match="empty"):
        fit_logistic(empty, ["x"], "y")
    with _pt.raises(ValueError, match="empty"):
        fit_boosted_trees(
            empty.withColumn("b", F.lit(0)), ["b"], "y", rounds=1
        )
    # all-NaN quantile column
    nans = spark.createDataFrame(
        [(float("nan"),), (float("nan"),)], "x double"
    )
    with _pt.raises(ValueError, match="no finite"):
        fit_quantile_bins(nans, ["x"], n_bins=4)
    # predict_expr arity mismatch
    model = {"features": ["a", "b"], "weights": [1.0, 2.0],
             "bias": 0.0, "means": [0.0, 0.0], "stds": [1.0, 1.0]}
    with _pt.raises(ValueError, match="weight"):
        predict_expr(model, feature_cols=["a"])
