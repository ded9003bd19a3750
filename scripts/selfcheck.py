#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every
queries() entry in Spark AND its oracle_sql() in DuckDB at sf0.01,
compare row count, column-name set, and order-insensitive values.

Usage: python scripts/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

from feature_store_spark.queries import QUERIES  # noqa: E402
from feature_store_spark.session import TABLES, get_spark  # noqa: E402


def norm(v):
    """Strict normalization mirroring the driver's pandas-level value
    hash: ints and floats stay DISTINCT (1 != 1.0 at the hash level —
    a DuckDB HUGEINT window sum lands in pandas as float64 and must be
    CAST in the oracle SQL, not papered over here)."""
    import datetime

    import numpy as np
    import pandas as pd

    if v is None:
        return None
    if isinstance(v, np.ndarray):
        return [norm(x) for x in v.tolist()]
    if isinstance(v, (list, tuple)):
        return [norm(x) for x in v]
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


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = [repr(tuple(norm(r[i]) for i in order)) for r in rows]
    return sorted(normed), [cols[i] for i in order]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, (fn, sql) in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            # toPandas (not collect) to mirror the driver: null doubles
            # become NaN, exactly as in the DuckDB .df() frame.
            spdf = sdf.toPandas()
            scols = list(spdf.columns)
            srows = [tuple(row) for row in spdf.itertuples(index=False, name=None)]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name:24s} spark error: {type(e).__name__}: {str(e)[:200]}")
            continue
        if sql is None:
            print(f"ok    {name:24s} rows={len(srows)} (rows-only, no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            # .df() (not fetchall) so DuckDB types land exactly as the
            # driver sees them — e.g. HUGEINT window sums → float64.
            odf = con.execute(sql).df()
            ocols = list(odf.columns)
            orows = [tuple(row) for row in odf.itertuples(index=False, name=None)]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name:24s} duckdb error: {type(e).__name__}: {str(e)[:200]}")
            continue

        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(ocols)}")
        if not problems:
            s_can, _ = canon(srows, scols)
            o_can, _ = canon(orows, ocols)
            n_bad = sum(1 for a, b in zip(s_can, o_can) if a != b)
            if n_bad:
                problems.append(f"{n_bad}/{len(s_can)} rows differ")
                for a, b in zip(s_can, o_can):
                    if a != b:
                        print(f"      spark: {a}\n      duck : {b}")
                        break
        if problems:
            failures.append(name)
            print(f"FAIL  {name:24s} {'; '.join(problems)} [{time.time()-t0:.1f}s]")
        else:
            print(f"ok    {name:24s} rows={len(srows)} [{time.time()-t0:.1f}s]")

    print(f"\n{len(QUERIES) - len(failures)}/{len(QUERIES)} queries match")
    if failures:
        print("failures:", " ".join(failures))
        sys.exit(1)


if __name__ == "__main__":
    main()
