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
