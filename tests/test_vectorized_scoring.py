"""Vectorized (Arrow+numpy) tree scorer vs the compiled-expression
path and the pure-Python oracle — including NaN routing and a larger
random ensemble (the M8 differential pattern)."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from feature_store_spark.scoring import (
    compile_model_expr,
    example_model,
    score_staged,
    vectorized_tree_udf,
)
from tests.test_metrics_scoring import eval_model_py

FEATS = ["a", "b", "c", "d"]


def random_model(n_trees: int, depth: int, seed: int = 1) -> dict:
    rng = random.Random(seed)

    def node(d):
        if d == 0:
            return {"leaf": rng.uniform(-0.2, 0.2)}
        return {
            "split": rng.choice(FEATS),
            "threshold": rng.uniform(0, 100),
            "missing": rng.choice(["left", "right"]),
            "yes": node(d - 1),
            "no": node(d - 1),
        }

    return {
        "base_score": 0.1,
        "objective": "binary:logistic",
        "trees": [node(depth) for _ in range(n_trees)],
    }


@pytest.fixture(scope="module")
def rows(spark):
    rng = random.Random(99)
    data = []
    for i in range(300):
        vals = [
            float("nan") if rng.random() < 0.05 else rng.uniform(0, 100)
            for _ in FEATS
        ]
        data.append((i, *vals))
    return spark.createDataFrame(data, "id long, a double, b double, c double, d double")


def test_vectorized_matches_expression(spark, rows):
    model = example_model(FEATS)
    fmap = {f: f for f in FEATS}
    expr_scores = {
        r["id"]: r["s"]
        for r in rows.withColumn("s", compile_model_expr(model, fmap)).collect()
    }
    udf = vectorized_tree_udf(model, FEATS)
    vec_scores = {
        r["id"]: r["s"]
        for r in rows.withColumn("s", udf(*[F.col(f) for f in FEATS])).collect()
    }
    for i in expr_scores:
        assert abs(expr_scores[i] - vec_scores[i]) <= 1e-12


def test_vectorized_matches_python_oracle_large_ensemble(spark, rows):
    model = random_model(60, 6)
    udf = vectorized_tree_udf(model, FEATS)
    got = {
        r["id"]: r["s"]
        for r in rows.withColumn("s", udf(*[F.col(f) for f in FEATS])).collect()
    }
    data = {r["id"]: r for r in rows.collect()}
    for i, s in got.items():
        row = {
            f: (None if math.isnan(data[i][f]) else data[i][f]) for f in FEATS
        }
        assert abs(s - eval_model_py(model, row)) <= 1e-10


def test_native_matches_python_oracle_large_ensemble(spark, rows):
    from feature_store_spark.scoring import HAS_GCC, native_tree_udf

    if not HAS_GCC:
        pytest.skip("no C compiler on PATH")
    model = random_model(120, 6, seed=5)
    udf = native_tree_udf(model, FEATS)
    got = {
        r["id"]: r["s"]
        for r in rows.withColumn("s", udf(*[F.col(f) for f in FEATS])).collect()
    }
    data = {r["id"]: r for r in rows.collect()}
    for i, s in got.items():
        row = {
            f: (None if math.isnan(data[i][f]) else data[i][f]) for f in FEATS
        }
        # float32 feature matrix vs the oracle's float64: thresholds are
        # compared in f32, so allow the f32 rounding of inputs
        assert abs(s - eval_model_py(model, row)) <= 1e-4


def test_native_kernel_matches_numpy_exactly():
    import numpy as np

    from feature_store_spark.scoring import HAS_GCC, _model_heap, _native_scorer

    if not HAS_GCC:
        pytest.skip("no C compiler on PATH")
    model = random_model(300, 6, seed=11)
    heap = _model_heap(model, FEATS)
    run = _native_scorer(*heap)
    rng = np.random.default_rng(0)
    X = (rng.random((5000, len(FEATS))) * 100).astype(np.float32)
    X[rng.random(X.shape) < 0.05] = np.nan
    got = run(X)
    # numpy f32 traversal on identical inputs must agree to f64 sum order
    featH, thrH, missH, leafH, D, base, logistic = heap
    n_trees, n_inner = featH.shape
    tids = np.arange(n_trees)[:, None]
    rows_ix = np.arange(X.shape[0])[None, :]
    idx = np.zeros((n_trees, X.shape[0]), dtype=np.int32)
    thr32 = thrH.astype(np.float32)
    for _ in range(D):
        f = featH[tids, idx]
        x = X[rows_ix, f]
        go_right = ~np.where(np.isnan(x), missH[tids, idx], x < thr32[tids, idx])
        idx = 2 * idx + 1 + go_right
    raw = base + leafH[tids, idx - n_inner].sum(axis=0)
    want = 1.0 / (1.0 + np.exp(-raw))
    assert np.abs(got - want).max() <= 1e-12


def test_score_dispatches_large_ensembles(spark, rows):
    """score() must route >50-tree models off the expression path and
    still match the pure-Python oracle."""
    from feature_store_spark.scoring import score

    model = random_model(80, 5, seed=9)
    fmap = {f: f for f in FEATS}
    got = {r["id"]: r["score"] for r in score(rows, model, fmap).collect()}
    data = {r["id"]: r for r in rows.collect()}
    for i, s in got.items():
        row = {f: (None if math.isnan(data[i][f]) else data[i][f]) for f in FEATS}
        assert abs(s - eval_model_py(model, row)) <= 1e-4


def test_staged_matches_expression(spark, rows):
    model = random_model(40, 4, seed=3)
    fmap = {f: f for f in FEATS}
    a = {
        r["id"]: r["s"]
        for r in rows.withColumn("s", compile_model_expr(model, fmap)).collect()
    }
    b = {
        r["id"]: r["score"]
        for r in score_staged(rows, model, fmap, trees_per_stage=8).collect()
    }
    for i in a:
        assert abs(a[i] - b[i]) <= 1e-12


def test_uneven_depth_heap_routes_infinity_correctly(spark, rows):
    """Early leaves are padded to full depth in the heap layout; a
    feature value of +inf (directly, or any double beyond float32 max
    on the f32 paths) must still land on the early leaf's value, not a
    zero-filled pad slot. Regression for the left-spine-only pad fill."""
    import numpy as np

    from feature_store_spark.scoring import HAS_GCC, native_tree_udf

    model = {
        "base_score": 0.0,
        "objective": "reg:squarederror",
        "trees": [
            {
                "split": "a",
                "threshold": 10.0,
                "missing": "left",
                # uneven: early leaf on the yes side, depth-2 on no
                "yes": {"leaf": 7.0},
                "no": {
                    "split": "b",
                    "threshold": 5.0,
                    "missing": "right",
                    "yes": {"leaf": 1.0},
                    "no": {"leaf": 2.0},
                },
            }
        ],
    }
    inf = float("inf")
    big = 1e39  # > float32 max: casts to +inf on the f32 paths
    df = spark.createDataFrame(
        [
            (1, 5.0, 0.0, 0.0, 0.0),    # -> early leaf 7.0
            (2, inf, 1.0, 0.0, 0.0),    # a=inf -> no-side, b<5 -> 1.0
            (3, big, 9.0, 0.0, 0.0),    # f32: a=inf; f64: a>10 -> 2.0
            (4, 5.0, inf, 0.0, 0.0),    # early leaf, b=inf irrelevant
        ],
        "id int, a double, b double, c double, d double",
    )
    fmap = {f: f for f in FEATS}
    expr = {
        r["id"]: r["s"]
        for r in df.withColumn("s", compile_model_expr(model, fmap)).collect()
    }
    assert expr[1] == 7.0 and expr[2] == 1.0 and expr[3] == 2.0 and expr[4] == 7.0

    for dtype in ("float64", "float32"):
        udf = vectorized_tree_udf(model, FEATS, dtype=dtype)
        got = {
            r["id"]: r["s"]
            for r in df.withColumn("s", udf(*[F.col(f) for f in FEATS])).collect()
        }
        assert got[1] == 7.0, (dtype, got)
        assert got[2] == 1.0, (dtype, got)
        assert got[4] == 7.0, (dtype, got)
        # row 3: f64 sees 1e39 > 10 -> leaf 2.0; f32 casts to inf ->
        # still the no side -> b=9 -> leaf 2.0. Either way 2.0.
        assert got[3] == 2.0, (dtype, got)

    if HAS_GCC:
        for dtype in ("float64", "float32"):
            udf = native_tree_udf(model, FEATS, dtype=dtype)
            got = {
                r["id"]: r["s"]
                for r in df.withColumn(
                    "s", udf(*[F.col(f) for f in FEATS])
                ).collect()
            }
            assert got == {1: 7.0, 2: 1.0, 3: 2.0, 4: 7.0}, (dtype, got)


def test_random_pruned_trees_differential_extreme_values(spark):
    """Randomized differential across scoring tiers on UNEVEN-depth
    trees (random pruning) with adversarial feature values (NaN, +/-
    inf, > float32-max, exact thresholds): numpy f64 and (when gcc
    exists) C f64 must match the Catalyst expression path exactly."""
    import math as _m
    import random as _r

    from feature_store_spark.scoring import HAS_GCC, native_tree_udf

    rng = _r.Random(1234)

    def node(d):
        # ~40% chance to stop early -> uneven depth
        if d == 0 or rng.random() < 0.4:
            return {"leaf": rng.uniform(-0.5, 0.5)}
        return {
            "split": rng.choice(FEATS),
            "threshold": rng.choice([rng.uniform(-5, 5), 0.0, 1.0]),
            "missing": rng.choice(["left", "right"]),
            "yes": node(d - 1),
            "no": node(d - 1),
        }

    model = {
        "base_score": 0.05,
        "objective": "reg:squarederror",
        "trees": [node(4) for _ in range(12)],
    }
    specials = [
        float("nan"), float("inf"), float("-inf"), 1e39, -1e39,
        0.0, 1.0, -5.0, 5.0, None,
    ]
    rows = [
        (i,) + tuple(rng.choice(specials) for _ in FEATS)
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "id int, a double, b double, c double, d double"
    )
    fmap = {f: f for f in FEATS}
    expr = {
        r["id"]: r["s"]
        for r in df.withColumn("s", compile_model_expr(model, fmap)).collect()
    }
    udf = vectorized_tree_udf(model, FEATS, dtype="float64")
    vec = {
        r["id"]: r["s"]
        for r in df.withColumn("s", udf(*[F.col(f) for f in FEATS])).collect()
    }
    for i in expr:
        assert _m.isclose(expr[i], vec[i], rel_tol=0, abs_tol=1e-12), (
            i, rows[i], expr[i], vec[i]
        )
    if HAS_GCC:
        cud = native_tree_udf(model, FEATS, dtype="float64")
        nat = {
            r["id"]: r["s"]
            for r in df.withColumn(
                "s", cud(*[F.col(f) for f in FEATS])
            ).collect()
        }
        for i in expr:
            assert _m.isclose(expr[i], nat[i], rel_tol=0, abs_tol=1e-12), (
                i, rows[i], expr[i], nat[i]
            )


def test_scoring_review_guards_r10(spark):
    """Review r10j: loud guards and honest knobs on the scoring tiers."""
    import pytest as _pt

    from feature_store_spark.scoring import (
        _model_heap,
        example_model,
        model_from_xgboost_json,
        score,
    )

    # lossguide-deep ensembles refuse the exponential heap layout
    def deep(d):
        if d == 0:
            return {"leaf": 1.0}
        return {"split": "x", "threshold": 0.5, "missing": "left",
                "yes": deep(d - 1), "no": {"leaf": 0.0}}

    m = {"base_score": 0.0, "objective": "reg:squarederror",
         "trees": [deep(30)]}
    with _pt.raises(ValueError, match="depth"):
        _model_heap(m, ["x"])

    # dump layout: objective passthrough + feature_names remap
    dump = [{"nodeid": 0, "split": "f0", "split_condition": 1.0,
             "yes": 1, "no": 2, "missing": 1,
             "children": [{"nodeid": 1, "leaf": 2.0},
                          {"nodeid": 2, "leaf": 3.0}]}]
    reg = model_from_xgboost_json(dump, feature_names=["price"],
                                  objective="reg:squarederror")
    assert reg["objective"] == "reg:squarederror"
    assert reg["trees"][0]["split"] == "price"

    # raw regression dump scores un-squashed through score()
    df = spark.createDataFrame([(0.5,), (2.0,)], "price double")
    got = sorted(
        r["score"] for r in score(df, reg, {"price": "price"}).collect()
    )
    assert got == [2.0, 3.0]  # sigmoid would have mapped into (0,1)

    # short feature lists no longer IndexError
    assert example_model(["only"])["trees"]

    # dtype passthrough reaches the UDF tier (float64 = expression
    # parity on a threshold that float32 rounds across)
    thr = 56.920387
    m2 = {"base_score": 0.0, "objective": "reg:squarederror",
          "trees": [{"split": "x", "threshold": thr, "missing": "left",
                     "yes": {"leaf": 1.0}, "no": {"leaf": 0.0}}] * 60}
    import numpy as np

    x = float(np.nextafter(np.float32(thr), np.float32(-1e9)))
    # x < thr in float64; in float32 both round to the same value
    df2 = spark.createDataFrame([(x,)], "x double")
    v64 = score(df2, m2, {"x": "x"}, dtype="float64").collect()[0]["score"]
    assert v64 == 60.0  # matches the expression tier's float64 branch
