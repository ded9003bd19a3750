"""Oracle-contract guard: every graded query must hash-match its
DuckDB oracle at sf0.001 (the driver runs the same comparison at
sf0.01; scripts/selfcheck.py covers that scale interactively)."""

from __future__ import annotations

import math

import duckdb
import pytest

from feature_store_spark.queries import QUERIES
from feature_store_spark.session import TABLES

SF_DIR = "/root/testdata/sf0.001"


def _norm(v):
    """Strict: int vs float stays distinct (mirrors the driver's
    pandas-level hash — DuckDB HUGEINT sums arrive as float64 and must
    be CAST in the oracle SQL)."""
    import datetime

    import numpy as np
    import pandas as pd

    if v is None:
        return None
    if isinstance(v, np.ndarray):
        return [_norm(x) for x in v.tolist()]
    if isinstance(v, (list, tuple)):
        return [_norm(x) for x in v]
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, datetime.datetime) and v.tzinfo is not None:
        v = v.replace(tzinfo=None)
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0
        return v
    return v


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(repr(tuple(_norm(r[i]) for i in order)) for r in rows)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    fn, sql = QUERIES[name]
    sdf = fn(spark, SF_DIR)
    # toPandas (not collect) to mirror the driver: null doubles become
    # NaN, exactly as in the DuckDB .df() frame.
    spdf = sdf.toPandas()
    scols = list(spdf.columns)
    srows = [tuple(row) for row in spdf.itertuples(index=False, name=None)]
    if sql is None:
        assert len(srows) >= 0  # rows-only contract
        return
    # .df() (not fetchall) so DuckDB types land as the driver sees
    # them — e.g. HUGEINT window sums → float64.
    odf = duck.execute(sql).df()
    ocols = list(odf.columns)
    orows = [tuple(row) for row in odf.itertuples(index=False, name=None)]
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows)
    assert _canon(srows, scols) == _canon(orows, ocols)
