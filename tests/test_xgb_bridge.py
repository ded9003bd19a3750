"""XGBoost model-format bridge golden tests (reference M6/M7: the
container has no xgboost runtime, so format parity is proven against a
committed XGBoost-layout JSON fixture + independently computed
predictions — examples/EXAMPLE.md step 8 loads such a model, the
gbdt_example trains it).

The fixture pair encodes the SAME 3-tree binary:logistic model in both
public layouts (save_model arrays and get_dump nested nodes); the
golden probabilities below were computed by a direct array-walking
interpreter of the save_model fixture (x < split_condition -> yes,
missing -> default_left, margin = logit(base_score) + sum(leaves)).
"""

from __future__ import annotations

import json
import math
import os

import pytest
from pyspark.sql import functions as F

from feature_store_spark.scoring import (
    HAS_GCC,
    compile_model_expr,
    model_from_xgboost_json,
    native_tree_udf,
    vectorized_tree_udf,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
FEATURES = ["gmv", "txns", "chargeback", "risk"]
NAN = float("nan")

ROWS = [
    (10.0, 100.0, 0.01, 0.3),
    (30.0, 400.0, 0.10, 0.7),
    (NAN, 200.0, 0.05, NAN),
    (25.0, 300.0, NAN, 0.5),  # boundary: 25 < 25 is false -> "no" branch
    (50.0, NAN, 0.2, 0.1),
]
GOLDEN_PROBS = [
    0.096538259575,
    0.416709900936,
    0.233922341319,
    0.416709900936,
    0.392624302175,
]


@pytest.fixture(scope="module")
def model():
    with open(os.path.join(FIXTURES, "xgb_model.json")) as f:
        return model_from_xgboost_json(json.load(f))


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        ROWS, "gmv double, txns double, chargeback double, risk double"
    )


def test_bridge_parses_save_model_layout(model):
    assert model["objective"] == "binary:logistic"
    # base_score 0.2 (probability space) -> margin log(0.2/0.8)
    assert model["base_score"] == pytest.approx(math.log(0.25))
    assert len(model["trees"]) == 3
    t0 = model["trees"][0]
    assert t0["split"] == "gmv" and t0["threshold"] == 25.0
    assert t0["missing"] == "left"
    assert t0["yes"]["missing"] == "right"  # tree0 node1 default_left=0
    assert t0["no"] == {"leaf": 0.6}


def test_dump_layout_yields_identical_trees(model):
    with open(os.path.join(FIXTURES, "xgb_dump.json")) as f:
        dumped = model_from_xgboost_json(json.load(f))
    # get_dump carries no learner params; trees must match exactly
    assert dumped["trees"] == model["trees"]


def test_catalyst_path_matches_golden(model, frame, spark):
    cols = {f: f for f in FEATURES}
    got = [
        r["p"]
        for r in frame.select(
            compile_model_expr(model, cols).alias("p")
        ).collect()
    ]
    assert got == pytest.approx(GOLDEN_PROBS, abs=1e-9)


def test_numpy_heap_path_matches_golden(model, frame):
    udf = vectorized_tree_udf(model, FEATURES, dtype="float64")
    got = [
        r["p"]
        for r in frame.select(
            udf(*[F.col(f) for f in FEATURES]).alias("p")
        ).collect()
    ]
    assert got == pytest.approx(GOLDEN_PROBS, abs=1e-9)


@pytest.mark.skipif(not HAS_GCC, reason="no C compiler in environment")
def test_native_kernel_path_matches_golden(model, frame):
    udf = native_tree_udf(model, FEATURES, dtype="float64")
    got = [
        r["p"]
        for r in frame.select(
            udf(*[F.col(f) for f in FEATURES]).alias("p")
        ).collect()
    ]
    assert got == pytest.approx(GOLDEN_PROBS, abs=1e-9)


def test_boosted_trees_export_roundtrip(spark):
    """The EXPORT half of the bridge: a model trained here with
    fit_boosted_trees, exported as XGBoost save_model JSON, then
    re-imported through model_from_xgboost_json, must predict
    IDENTICALLY to predict_boosted_expr on the same frame — the
    <= vs < convention shift (one-ulp nextafter), the lr pre-scaling
    of leaves, the NULL-goes-right default, and the raw
    reg:squarederror base_score all cancel exactly."""
    import json as _json

    from feature_store_spark.scoring import (
        compile_model_expr,
        model_to_xgboost_json,
    )
    from feature_store_spark.training import (
        fit_boosted_trees,
        predict_boosted_expr,
    )

    import random

    rng = random.Random(3)
    cols = ["b0", "b1", "b2"]
    rows = [
        (
            rng.randrange(8),
            rng.randrange(8),
            rng.randrange(8),
            float(rng.random() < 0.3) + 0.1 * rng.random(),
        )
        for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "b0 int, b1 int, b2 int, y double")
    model = fit_boosted_trees(df, cols, "y", rounds=4, depth=3, learning_rate=0.4)

    exported = model_to_xgboost_json(model, cols)
    # the export is valid JSON and carries the documented layout
    blob = _json.loads(_json.dumps(exported))
    assert blob["learner"]["objective"]["name"] == "reg:squarederror"
    assert blob["learner"]["feature_names"] == cols
    n_trees = int(
        blob["learner"]["gradient_booster"]["model"]["gbtree_model_param"][
            "num_trees"
        ]
    )
    assert n_trees == 4

    bridged = model_from_xgboost_json(blob)
    ours = predict_boosted_expr(model, feature_cols=cols)
    theirs = compile_model_expr(bridged, {c: c for c in cols})
    mism = df.select(
        F.max(F.abs(ours - theirs)).alias("d")
    ).collect()[0]["d"]
    assert mism == 0.0  # bit-exact round-trip, not approx
