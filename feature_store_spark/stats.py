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


def corr_matrix(
    df: DataFrame,
    cols: Sequence[str],
    scale: int = 100,
) -> DataFrame:
    """Pairwise Pearson correlation of ``cols`` in ONE aggregate pass,
    bit-exactly reproducible across engines and partitionings.

    Floating-point ``corr()`` merges co-moments in partition order, so
    two runs of the same query can differ in the last bits. Instead the
    sufficient statistics are computed on integer-scaled values
    (``round(v * scale)``) summed as ``decimal(38,0)`` — exact integer
    arithmetic, associative, partition-order-proof — and the closed
    form ``(n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx²)(n*Syy - Sy²))`` is
    evaluated once on the single collected statistics row (driver-side,
    metadata scale: one row of k + k(k+1)/2 numbers). Correlation is
    scale-invariant, so the integer scaling drops out of the result.
    """
    ints = {
        c: F.round(F.col(c) * scale).cast("decimal(38,0)") for c in cols
    }
    aggs = [F.count(F.lit(1)).alias("__n")]
    aggs += [F.sum(ints[c]).alias(f"__s_{c}") for c in cols]
    for i, a in enumerate(cols):
        for b in cols[i:]:
            aggs.append(F.sum(ints[a] * ints[b]).alias(f"__p_{a}_{b}"))
    row = df.agg(*aggs).collect()[0].asDict()
    n = int(row["__n"])
    s = {c: int(row[f"__s_{c}"]) for c in cols}
    p = {}
    for i, a in enumerate(cols):
        for b in cols[i:]:
            p[(a, b)] = p[(b, a)] = int(row[f"__p_{a}_{b}"])
    out = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            cov = n * p[(a, b)] - s[a] * s[b]
            va = n * p[(a, a)] - s[a] * s[a]
            vb = n * p[(b, b)] - s[b] * s[b]
            r = float(cov) / ((float(va) ** 0.5) * (float(vb) ** 0.5)) if va > 0 and vb > 0 else None
            out.append((a, b, round(r, 6) if r is not None else None))
    return df.sparkSession.createDataFrame(
        out, "col_a string, col_b string, pearson_r double"
    )


def winsorized_stats(
    df: DataFrame,
    cols: Sequence[str],
    p_lo: float = 0.01,
    p_hi: float = 0.99,
    exact: bool = True,
) -> DataFrame:
    """Winsorized normalization statistics per feature: the p_lo/p_hi
    clip bounds, how many rows each side clips, and the mean/stddev of
    the clipped values — the numbers a serving-side scaler needs
    (X5's clip family as a fitted transform).

    Shape: melt to (feature, value) — ONE Expand over the scan — then
    two key-local aggregates over the tall frame: exact per-feature
    percentiles (swap ``exact=False`` for the sketch at 100 TB), and a
    second pass with the broadcast bounds computing clip counts and
    exact integer-scaled sums (``decimal(38,0)`` cents — partition-
    order-proof, so mean/stddev hash-match any engine).
    """
    tall = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("feature"),
                        F.col(c).cast("double").alias("value"),
                    )
                    for c in cols
                ]
            )
        ).alias("r")
    ).select("r.feature", "r.value")
    q = (
        F.percentile(F.col("value"), F.array(F.lit(p_lo), F.lit(p_hi)))
        if exact
        else F.percentile_approx(F.col("value"), F.array(F.lit(p_lo), F.lit(p_hi)))
    )
    bounds = tall.groupBy("feature").agg(
        q[0].alias("lo"), q[1].alias("hi")
    )
    j = tall.join(F.broadcast(bounds), "feature")
    clipped = F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("value")))
    cents = F.round(clipped * 100).cast("decimal(38,0)")
    agg = j.groupBy("feature").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("value") < F.col("lo")).alias("n_clipped_lo"),
        F.count_if(F.col("value") > F.col("hi")).alias("n_clipped_hi"),
        F.min("lo").alias("lo"),
        F.min("hi").alias("hi"),
        F.sum(cents).alias("__s"),
        F.sum(cents * cents).alias("__ss"),
    )
    n = F.col("n").cast("double")
    s = F.col("__s").cast("double")
    ss = F.col("__ss").cast("double")
    mean_w = s / n / 100.0
    var_w = (n * ss - s * s) / (n * (n - 1.0)) / 10000.0
    return agg.select(
        "feature",
        F.round("lo", 6).alias("lo"),
        F.round("hi", 6).alias("hi"),
        "n",
        "n_clipped_lo",
        "n_clipped_hi",
        F.round(mean_w, 6).alias("mean_w"),
        F.round(F.sqrt(var_w), 6).alias("std_w"),
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
