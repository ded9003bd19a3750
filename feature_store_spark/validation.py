"""Validation / quality gates as query-shaped checks (SURVEY.md §2.10).

All gates return DataFrames (gate name, observed, threshold, passed) —
the reference's ValidationService.java:22-147 as dataflow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ValidationService.java:22-25 / python/gbdt_example/train.py:39-42
FRAUD_GATES = {"auc_roc_min": 0.75, "auc_pr_min": 0.40, "score_std_min": 0.05}
# The reference's fraud example reports AUC-ROC 0.96xx from 200 XGBoost
# rounds (EXAMPLE.md:187, step 9). The boosted-tree substitute must
# certify near that range, not merely clear the 0.75 floor; 0.95 leaves
# run-to-run margin (measured 0.978-0.982 for 8 rounds x depth 3).
TREE_AUC_REF_MIN = 0.95
# python/criteo_example/train.py:38-41
CTR_GATES = {"auc_roc_min": 0.65, "logloss_max": 0.50, "auc_pr_min": 0.08}
# python/mslr_example/train.py:105-107
RANKING_GATES = {"ndcg5_min": 0.30, "ndcg10_min": 0.30, "map_min": 0.20}


def schema_gate(
    vectors: DataFrame,
    expected_hash: int,
    expected_length: int,
) -> DataFrame:
    """V1: schema-hash + vector-length match per row
    (ValidationService.java:36-63).

    Null-safe on purpose: a row with a NULL schema_hash or NULL values
    array is a MISMATCH, not a skip — plain ``==`` yields NULL there
    and ``count_if`` would silently pass the corrupt row through the
    gate."""
    return vectors.select(
        F.col("schema_hash").eqNullSafe(F.lit(expected_hash)).alias("hash_ok"),
        F.coalesce(
            F.size("values") == F.lit(expected_length), F.lit(False)
        ).alias("length_ok"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(~F.col("hash_ok")).alias("hash_mismatches"),
        F.count_if(~F.col("length_ok")).alias("length_mismatches"),
        (F.count_if(~F.col("hash_ok")) == 0).alias("hash_gate_passed"),
        (F.count_if(~F.col("length_ok")) == 0).alias("length_gate_passed"),
    )


def staleness_gate(
    latest_values: DataFrame,
    max_age_by_feature: DataFrame,
    age_ms_col: str = "age_ms",
    feature_col: str = "feature_name",
) -> DataFrame:
    """V2: per-feature staleness vs max_age_seconds SLA
    (ValidationService.java:68-107). ``latest_values`` carries one row
    per (entity, feature) with its age; SLA table is broadcast.

    A NULL age counts as UNKNOWN (alongside the -1 convention) so it
    shows up in the report instead of being skipped by ``count_if``'s
    null semantics. Features absent from the SLA table have a NULL
    threshold and are not gated — no SLA means no check."""
    joined = latest_values.join(
        F.broadcast(max_age_by_feature), feature_col, "left"
    )
    unknown = F.col(age_ms_col).isNull() | (F.col(age_ms_col) < 0)
    stale = (
        F.col(age_ms_col) > F.col("max_age_seconds") * 1000
    ) & ~unknown
    return joined.groupBy(feature_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(stale).alias("stale_count"),
        F.count_if(unknown).alias("unknown_age_count"),
        (F.count_if(stale) == 0).alias("sla_passed"),
    )


def default_rate(vectors: DataFrame) -> DataFrame:
    """A13: fraction of default-filled slots
    (ValidationService.java:98-104) — array aggregate, no explode.

    A row with an EMPTY (or NULL) mask has no slots and contributes
    nothing to the average — via ``try_divide``, not ``/`` (review
    r10: 0/0 aborted the whole gate job with DIVIDE_BY_ZERO under
    Spark 4's default ANSI mode; a monitoring gate must grade the
    rows that exist, not die on a degenerate one)."""
    frac = F.try_divide(
        F.aggregate(
            "is_default_mask",
            F.lit(0),
            lambda acc, x: acc + F.when(x, 1).otherwise(0),
        ),
        F.size("is_default_mask"),
    )
    return vectors.select(F.avg(frac).alias("default_rate"))


def model_gates(
    metrics: dict[str, float],
    gates: dict[str, float],
) -> list[dict]:
    """V3: compare scalar metrics against gate thresholds. ``_min`` /
    ``_max`` suffix picks the direction."""
    out = []
    for gate, threshold in gates.items():
        metric = gate.rsplit("_", 1)[0]
        direction = gate.rsplit("_", 1)[1]
        observed = metrics.get(metric)
        if observed is None:
            passed = False
        elif direction == "min":
            passed = observed >= threshold
        else:
            passed = observed <= threshold
        out.append(
            {"gate": gate, "observed": observed, "threshold": threshold, "passed": passed}
        )
    return out


def integrity_report(checks: "dict[str, DataFrame]") -> "DataFrame":
    """Data-quality / referential-integrity report: each entry maps a
    check name to a DataFrame of VIOLATING rows (orphaned foreign
    keys via left-anti join, duplicate primary keys via
    groupBy-having, null required columns via filter, ...). Output is
    one (check, n_violations) row per check — each violation frame
    reduces through its own partial-aggregated count, so the report
    costs one scan per check and the result is metadata scale."""
    from pyspark.sql import functions as F

    if not checks:
        raise ValueError("integrity_report: no checks")
    outs = []
    for name, df in checks.items():
        outs.append(
            df.agg(F.count(F.lit(1)).alias("n_violations")).select(
                F.lit(name).alias("check"), "n_violations"
            )
        )
    rep = outs[0]
    for o in outs[1:]:
        rep = rep.unionByName(o)
    return rep
