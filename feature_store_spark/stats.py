"""Feature distribution statistics & quantile ops (SURVEY.md §2.5 A3/A4).

Mirrors the ``feature_statistics`` schema (V1__init.sql:85-104): count,
null_count, mean, stddev, min, max, p25/p50/p75/p95/p99, histogram.

Exact ``percentile`` is used at test scale so results hash-match the
DuckDB oracle; at 100 TB swap ``exact=False`` for
``percentile_approx`` (single-pass sketch, no global sort).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PERCENTILES = (0.25, 0.50, 0.75, 0.95, 0.99)
PCT_NAMES = ("p25", "p50", "p75", "p95", "p99")


def _pct(col: Column, exact: bool) -> Column:
    ps = F.array(*[F.lit(p) for p in PERCENTILES])
    return F.percentile(col, ps) if exact else F.percentile_approx(col, ps)


def feature_stats(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    exact: bool = True,
) -> DataFrame:
    """Per-group distribution stats over one value column."""
    v = F.col(value_col)
    aggs = [
        F.count(F.lit(1)).alias("count"),
        F.count_if(v.isNull()).alias("null_count"),
        F.avg(v).alias("mean"),
        F.stddev_samp(v).alias("stddev"),
        F.min(v).alias("min_value"),
        F.max(v).alias("max_value"),
        _pct(v, exact).alias("__pcts"),
    ]
    grouped = df.groupBy(*group_cols) if group_cols else df.groupBy()
    out = grouped.agg(*aggs)
    for i, name in enumerate(PCT_NAMES):
        out = out.withColumn(name, F.col("__pcts")[i])
    return out.drop("__pcts")


def histogram(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    num_bins: int = 10,
) -> DataFrame:
    """Equi-width histogram per group: bin = clamp(floor((v-min)/w*B)).

    Two aggregations over one scan lineage: per-group min/max, then a
    broadcast join back and a groupBy on (group, bin). The max value
    lands in the last bin (clamped), matching width_bucket semantics.
    """
    v = F.col(value_col)
    bounds = (df.groupBy(*group_cols) if group_cols else df.groupBy()).agg(
        F.min(v).alias("__lo"), F.max(v).alias("__hi")
    )
    joined = (
        df.join(F.broadcast(bounds), list(group_cols)) if group_cols
        else df.crossJoin(F.broadcast(bounds))
    )
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(num_bins))
    bin_expr = F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
        F.least(
            F.lit(num_bins - 1),
            F.floor((v - F.col("__lo")) / width),
        )
    )
    return (
        joined.withColumn("bin", bin_expr.cast("int"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("bin_count"))
    )


def quantile_threshold_label(
    df: DataFrame,
    value_col: str,
    quantile: float = 0.92,
    group_cols: Sequence[str] = (),
    label_col: str = "label",
    exact: bool = True,
) -> DataFrame:
    """Label rows above the (per-group) quantile of ``value_col`` —
    the fraud-label construction (python/gbdt_example/dataset.py:114:
    ``risk > quantile(risk, 0.92)``)."""
    v = F.col(value_col)
    q = F.percentile(v, F.lit(quantile)) if exact else F.percentile_approx(v, F.lit(quantile))
    thr = (df.groupBy(*group_cols) if group_cols else df.groupBy()).agg(
        q.alias("__thr")
    )
    joined = (
        df.join(F.broadcast(thr), list(group_cols)) if group_cols
        else df.crossJoin(F.broadcast(thr))
    )
    return joined.withColumn(label_col, (v > F.col("__thr")).cast("int")).drop("__thr")
