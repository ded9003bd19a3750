"""ASOF direction modes (backward / forward / nearest) — differential
test against ``pandas.merge_asof``, the public reference semantics for
directional as-of joins (the engine's backward mode is the reference's
IcebergOfflineStore floorEntry; forward/nearest generalize it).

Times are generated distinct per key so pandas' and the engine's
duplicate-timestamp tie rules (documented divergence) never engage;
exact-tie nearest resolution (backward wins) is pinned separately.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pandas as pd
import pytest

from feature_store_spark.operators.asof import asof_join


def _frames(seed: int):
    rng = np.random.default_rng(seed)
    base = datetime(2024, 1, 1)
    keys = ["a", "b", "c"]
    left_rows, right_rows = [], []
    for k in keys:
        lt = rng.choice(20000, size=40, replace=False)
        rt = rng.choice(20000, size=25, replace=False)
        left_rows += [(k, base + timedelta(seconds=int(s) * 3)) for s in lt]
        right_rows += [
            (k, base + timedelta(seconds=int(s) * 3 + 1), float(i))
            for i, s in enumerate(rt)
        ]
    lpdf = pd.DataFrame(left_rows, columns=["k", "t"]).sort_values("t")
    rpdf = pd.DataFrame(right_rows, columns=["k", "t", "v"]).sort_values("t")
    return lpdf, rpdf


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("tol", [None, 900.0])
def test_direction_matches_pandas(spark, direction, tol):
    lpdf, rpdf = _frames(7)
    left = spark.createDataFrame(lpdf)
    right = spark.createDataFrame(rpdf)

    got = (
        asof_join(left, right, on=["k"], left_time="t", value_cols=["v"],
                  direction=direction, tolerance_seconds=tol)
        .toPandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        lpdf, rpdf, on="t", by="k", direction=direction,
        tolerance=None if tol is None else pd.Timedelta(seconds=tol),
    ).sort_values(["k", "t"]).reset_index(drop=True)

    assert len(got) == len(want)
    pd.testing.assert_series_equal(got["v"], want["v"], check_names=False)


def test_nearest_exact_tie_resolves_backward(spark):
    t0 = datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame([("a", t0)], "k string, t timestamp")
    right = spark.createDataFrame(
        [
            ("a", t0 - timedelta(seconds=60), 1.0),  # backward, delta 60
            ("a", t0 + timedelta(seconds=60), 2.0),  # forward, delta 60
        ],
        "k string, t timestamp, v double",
    )
    out = asof_join(left, right, on=["k"], left_time="t",
                    value_cols=["v"], direction="nearest").collect()
    assert out[0]["v"] == 1.0


def test_forward_inclusive_at_equal_time(spark):
    t0 = datetime(2024, 1, 1)
    left = spark.createDataFrame([("a", t0)], "k string, t timestamp")
    right = spark.createDataFrame(
        [("a", t0, 5.0), ("a", t0 + timedelta(seconds=10), 9.0)],
        "k string, t timestamp, v double",
    )
    out = asof_join(left, right, on=["k"], left_time="t",
                    value_cols=["v"], direction="forward").collect()
    assert out[0]["v"] == 5.0


def test_bad_direction_raises(spark):
    lpdf, rpdf = _frames(1)
    left, right = spark.createDataFrame(lpdf), spark.createDataFrame(rpdf)
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, on=["k"], left_time="t",
                  value_cols=["v"], direction="sideways")


def test_null_valued_history_row_attaches_wholesale(spark):
    """Review r5: the as-of match must attach ONE history row
    wholesale (pandas semantics). A newest history row carrying a
    NULL value must be the match — per-column ignorenulls would skip
    back to an older row while the tolerance gate judged the newest
    row's time, returning an out-of-tolerance value."""
    base = datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [("k", base + timedelta(seconds=100))], "k string, t timestamp"
    )
    right = spark.createDataFrame(
        [
            ("k", base + timedelta(seconds=50), 7.0),
            ("k", base + timedelta(seconds=99), None),
        ],
        "k string, t timestamp, v double",
    )
    # without tolerance: the newest row (t=99) matches; its value is
    # NULL — exactly what pandas merge_asof attaches
    [r] = asof_join(
        left, right, on=["k"], left_time="t", value_cols=["v"]
    ).collect()
    assert r["v"] is None
    # with a 10s tolerance: same row, still NULL — NOT the stale 7.0
    # (its row at t=50 is 50s old, far outside tolerance)
    [r] = asof_join(
        left, right, on=["k"], left_time="t", value_cols=["v"],
        tolerance_seconds=10,
    ).collect()
    assert r["v"] is None
    # pandas agreement on the same frames
    lp = left.toPandas().sort_values("t")
    rp = right.toPandas().sort_values("t")
    m = pd.merge_asof(
        lp, rp, on="t", by="k", tolerance=pd.Timedelta(seconds=10)
    )
    assert m["v"].isna().all()


def test_multi_value_columns_come_from_one_row(spark):
    """Two value columns with complementary NULLs: the attached pair
    must both come from the matched (newest) row, never a mix of
    rows."""
    base = datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [("k", base + timedelta(seconds=100))], "k string, t timestamp"
    )
    right = spark.createDataFrame(
        [
            ("k", base + timedelta(seconds=50), 1.0, None),
            ("k", base + timedelta(seconds=99), None, 2.0),
        ],
        "k string, t timestamp, x double, y double",
    )
    [r] = asof_join(
        left, right, on=["k"], left_time="t", value_cols=["x", "y"]
    ).collect()
    assert (r["x"], r["y"]) == (None, 2.0)  # one row, wholesale


def test_tolerance_scientific_notation_and_validation(spark):
    """Review r5: tiny tolerances (repr'd in scientific notation)
    must not break the interval expression; NaN/negative/inf raise."""
    base = datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [("k", base + timedelta(seconds=100))], "k string, t timestamp"
    )
    right = spark.createDataFrame(
        [("k", base + timedelta(seconds=99), 5.0)],
        "k string, t timestamp, v double",
    )
    [r] = asof_join(
        left, right, on=["k"], left_time="t", value_cols=["v"],
        tolerance_seconds=1e-05,
    ).collect()
    assert r["v"] is None  # 1s gap >> 10µs tolerance
    for bad in (float("nan"), -1.0, float("inf")):
        with pytest.raises(ValueError, match="tolerance_seconds"):
            asof_join(
                left, right, on=["k"], left_time="t",
                value_cols=["v"], tolerance_seconds=bad,
            )
