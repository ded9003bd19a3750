"""Read-only Delta Lake table scan + minimal append/DELETE exporter
(public protocol:
https://github.com/delta-io/delta/blob/master/PROTOCOL.md).

Parity/interop: the engine's native transactional format is
sources/manifest.py; this module lets it SCAN a table a Delta writer
produced and EXPORT one a Delta reader can open — completing the
open-format interop story next to sources/iceberg.py.

Physical shape: the Delta log is line-delimited JSON commits
(``_delta_log/%020d.json``) with add/remove file actions, plus
periodic parquet checkpoints (single-file or multi-part; ALL parts of
the chosen version are replayed, and an incomplete part set refuses
loudly). Replaying it is driver-side metadata work (KBs per commit);
per-file ``stats`` (numRecords/minValues/maxValues) and hive-style
``partitionValues`` drive file pruning, and only the surviving
parquet paths reach ``spark.read.parquet`` — where partition columns
are reconstructed via ``basePath`` and Catalyst takes over row-group
pruning. Filters are re-applied to the frame, so pruning is an
optimization, never the correctness boundary.

Modern-reader features supported (round 8):
- DELETION VECTORS (reader version 3 / ``deletionVectors``): the
  public RoaringBitmapArray format (sources/roaring.py) — inline
  (Z85) and on-disk ``.bin`` DVs are decoded at plan time (KB-scale
  metadata) and removed via a broadcast anti-join on
  ``_metadata.row_index``, the same shape as Iceberg positional
  deletes. ``delta_delete_rows`` WRITES a spec-conforming DV commit.
- COLUMN MAPPING (modes ``name`` and ``id``): physical parquet names
  (``col-<uuid>``) are resolved back to logical names from the
  schemaString's ``delta.columnMapping.physicalName`` metadata; in
  ``id`` mode the parquet footers' field ids are checked first (the
  protocol's resolution rule), falling back to physical names.
  Partition values and file stats are keyed by PHYSICAL names in
  mapped tables; pruning translates through the mapping.

Remaining scope gates (loud): v2 checkpoints, type widening, nested
column mapping; parquet data files only.
"""

from __future__ import annotations

import json
import os
import re
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from feature_store_spark.session import local_rows_df
from feature_store_spark.sources.hive_paths import (
    hive_escape,
    parse_partition_segs,
)
from feature_store_spark.sources.iceberg import _Filter

# Reader features this reader actually implements. The Delta spec
# (PROTOCOL.md, "Table Features") requires a reader to REFUSE any
# readerFeature it does not implement — an unknown feature (e.g.
# variantType) silently misread as its fallback representation is
# wrong data, not graceful degradation. So: allowlist, not blocklist
# (ADVICE r8). Writer-only features never appear in readerFeatures
# and need no entry here.
_SUPPORTED_READER_FEATURES = {
    "deletionVectors",
    "columnMapping",
    "timestampNtz",
    # vacuumProtocolCheck is reader-relevant only in that readers must
    # tolerate its presence; no read-path behavior change.
    "vacuumProtocolCheck",
}

# Writer features this writer implements or can honor (PROTOCOL.md,
# "Table Features": a writer must refuse to commit into a table whose
# writerFeatures list a feature it cannot honor — the write-side twin
# of the reader allowlist above; VERDICT r12 wrong #1: a silent
# append into a checkConstraints table is wrong data by the spec's
# own rule). Honoring is conditional for several features and checked
# per-commit by _writer_feature_gate: appendOnly consults the
# delta.appendOnly property (append proceeds, mutating verbs refuse),
# checkConstraints are ENFORCED against the rows being landed, and
# invariants / generatedColumns / identityColumns are honored only
# while the schema declares none (vacuous — a declared one would need
# expression evaluation this writer doesn't do, so it refuses).
# rowTracking is deliberately ABSENT: it obliges writers to assign
# fresh row ids/commit versions to every added row, which nothing
# here materializes — unknown-feature refusal is the correct outcome.
_HANDLED_WRITER_FEATURES = {
    "appendOnly",
    "invariants",
    "checkConstraints",
    "generatedColumns",
    "identityColumns",
    "columnMapping",
    "deletionVectors",
    "timestampNtz",
    "vacuumProtocolCheck",
    # domainMetadata obliges writers to PRESERVE domain actions;
    # an append-only log replay preserves them by construction
    "domainMetadata",
}


def _writer_feature_gate(
    t: "DeltaTable",
    meta: dict,
    verb: str,
    *,
    mutates: bool,
    adds_rows: bool = True,
    full_rows: bool = False,
    identity_ok: bool = False,
) -> list[tuple[str, str]]:
    """Write-side protocol gate, called by every verb that commits
    into an EXISTING table before it builds any action. Refuses
    writer features outside _HANDLED_WRITER_FEATURES, refuses
    mutating verbs on append-only tables, and — for identity columns
    always, and for invariant/generated columns on verbs that DON'T
    land complete rows (``full_rows=False``, e.g. MERGE's
    partial-column arms) — refuses landing rows the declarations
    can't be honored for. Full-row verbs (append/upsert) pass
    ``full_rows=True`` and honor generated columns + invariants via
    :func:`_apply_generated_columns` / :func:`_enforce_invariants`.
    Returns the table's CHECK constraints ``[(name, sql), ...]`` for
    the caller to enforce on the rows it lands (see
    :func:`_enforce_check_constraints`)."""
    proto = t._protocol(None)
    feats = set(proto.get("writerFeatures") or [])
    unknown = sorted(feats - _HANDLED_WRITER_FEATURES)
    if unknown:
        raise NotImplementedError(
            f"{t.path}: delta writer features {unknown} are not "
            f"supported — {verb} refuses rather than commit a state "
            "the feature's own writers would consider corrupt (spec "
            "requires refusing unknown writer features; supported: "
            f"{sorted(_HANDLED_WRITER_FEATURES)})"
        )
    conf = meta.get("configuration") or {}
    if (
        mutates
        and str(conf.get("delta.appendOnly", "")).lower() == "true"
    ):
        raise ValueError(
            f"{t.path}: table is append-only (delta.appendOnly=true) "
            f"— {verb} deletes or rewrites existing rows; only "
            "appends are allowed here"
        )
    if adds_rows:
        bad: list[str] = []
        for f in json.loads(meta["schemaString"])["fields"]:
            md = f.get("metadata") or {}
            if "delta.invariants" in md and not full_rows:
                bad.append(f"invariant on column {f['name']!r}")
            if "delta.generationExpression" in md and not full_rows:
                bad.append(f"generated column {f['name']!r}")
            if (
                any(k.startswith("delta.identity.") for k in md)
                and not identity_ok
            ):
                bad.append(f"identity column {f['name']!r}")
        if bad:
            raise NotImplementedError(
                f"{t.path}: {verb} cannot honor {bad} — generation/"
                "invariant expressions are evaluated only on "
                "FULL-ROW landing verbs (append/upsert; a partial-"
                "column MERGE arm could silently break them), and "
                "identity allocation happens only on delta_append "
                "(an upsert/merge re-landing an existing key would "
                "ambiguously reallocate its id). Landing unchecked "
                "rows would be wrong data by the table's own "
                "declaration"
            )
    return sorted(
        (k[len("delta.constraints."):], v)
        for k, v in conf.items()
        if k.startswith("delta.constraints.")
    )


def _deferred_rule_checks(
    gen_checks: list[tuple[str, str, object]],
    invs: list[tuple[str, str]],
    constraints: list[tuple[str, str]],
    table_dir: str,
    verb: str,
):
    """ONE fused violation-count aggregate for every declared
    write-path rule — generated-column verification, column
    invariants, CHECK constraints — plus a validator raising in the
    same precedence order the eager passes used (generated →
    invariants → CHECK), with the same messages.

    Built to be OBSERVED on the staging write itself (r14, guide
    §1.2/§5): each rule family previously ran its own aggregation
    job over the batch lineage before the write, so a
    generated+invariant+CHECK table paid up to three extra full
    scans of the un-materialized batch per append. As observed
    metrics the counts ride the write job — zero extra passes at any
    scale; a violating batch is detected right after the staging
    write and refused before any file enters the table layout or the
    log sees a commit (the staging dir is removed, so refused
    commits still leave no state).

    Returns ``(exprs, validate)``; ``validate`` accepts any mapping
    (an ``Observation.get`` dict or a Row) keyed by the expr aliases.
    """
    from pyspark.sql import functions as F

    exprs = []
    for i, (name, sql, ty) in enumerate(gen_checks):
        ty_s = ty if isinstance(ty, str) else json.dumps(ty)
        exprs.append(
            F.sum(
                (
                    ~F.col(name).eqNullSafe(F.expr(sql).cast(ty_s))
                ).cast("long")
            ).alias(f"__g{i}")
        )
    for i, (_col, sql) in enumerate(invs):
        # NULL violates (the invariants spec requires TRUE per row)
        exprs.append(
            F.sum(
                (
                    ~F.coalesce(F.expr(sql).cast("boolean"), F.lit(False))
                ).cast("long")
            ).alias(f"__i{i}")
        )
    for i, (_name, sql) in enumerate(constraints):
        # NULL passes (SQL CHECK semantics: only FALSE fails)
        exprs.append(
            F.sum(
                (
                    ~F.coalesce(F.expr(sql).cast("boolean"), F.lit(True))
                ).cast("long")
            ).alias(f"__c{i}")
        )

    def validate(m) -> None:
        bad = {
            name: int(m[f"__g{i}"] or 0)
            for i, (name, _sql, _ty) in enumerate(gen_checks)
            if int(m[f"__g{i}"] or 0)
        }
        if bad:
            raise ValueError(
                f"{table_dir}: {verb} provided generated-column "
                f"values that do not satisfy their generation "
                f"expressions {bad} (mismatching-row count per "
                "column) — the generatedColumns writer feature "
                "requires consistency, so the commit is refused"
            )
        viol = {
            col: int(m[f"__i{i}"] or 0)
            for i, (col, _sql) in enumerate(invs)
            if int(m[f"__i{i}"] or 0)
        }
        if viol:
            raise ValueError(
                f"{table_dir}: {verb} violates column invariant(s) "
                f"{viol} (violating-row count per column) — the "
                "invariants writer feature requires enforcement, so "
                "the commit is refused"
            )
        violc = {
            name: int(m[f"__c{i}"] or 0)
            for i, (name, _sql) in enumerate(constraints)
            if int(m[f"__c{i}"] or 0)
        }
        if violc:
            raise ValueError(
                f"{table_dir}: {verb} violates CHECK constraint(s) "
                f"{violc} (violating-row count per constraint) — the "
                "table's checkConstraints writer feature requires "
                "enforcement, so the commit is refused"
            )

    return exprs, validate


def _enforce_check_constraints(
    df: DataFrame,
    constraints: list[tuple[str, str]],
    table_dir: str,
    verb: str,
) -> None:
    """CHECK-constraint enforcement (writer feature
    checkConstraints): ONE aggregate over the rows being landed
    counts violations of every constraint at once — zero extra jobs
    on tables that declare none. NULL results don't violate (SQL
    CHECK semantics: only FALSE fails). Eager form of
    :func:`_deferred_rule_checks` (the write verbs observe the same
    expressions on their staging write instead)."""
    if not constraints:
        return
    exprs, validate = _deferred_rule_checks(
        [], [], constraints, table_dir, verb
    )
    validate(df.agg(*exprs).first())


def _generation_rules(
    meta: dict, table_dir: str
) -> tuple[list[tuple[str, str, object]], list[tuple[str, str]]]:
    """Collect the schema's generated-column and invariant rules:
    ``(generated, invariants)`` where generated is
    ``[(column, sql_expression, delta_type), ...]`` (from
    ``delta.generationExpression`` column metadata) and invariants is
    ``[(column, sql_expression), ...]`` (from ``delta.invariants``,
    whose value is the spec's ``{"expression": {"expression": sql}}``
    JSON). An invariant payload this writer can't parse refuses —
    landing rows unchecked against a declared-but-unreadable rule
    would be wrong data by the table's own declaration."""
    gens: list[tuple[str, str, object]] = []
    invs: list[tuple[str, str]] = []
    for f in json.loads(meta["schemaString"])["fields"]:
        md = f.get("metadata") or {}
        if "delta.generationExpression" in md:
            gens.append(
                (f["name"], md["delta.generationExpression"], f["type"])
            )
        if "delta.invariants" in md:
            try:
                expr = json.loads(md["delta.invariants"])[
                    "expression"
                ]["expression"]
            except (ValueError, KeyError, TypeError):
                raise NotImplementedError(
                    f"{table_dir}: column {f['name']!r} declares "
                    f"delta.invariants={md['delta.invariants']!r}, "
                    "not the spec's "
                    '{"expression": {"expression": sql}} shape — '
                    "refusing rather than landing unchecked rows"
                )
            invs.append((f["name"], expr))
    return gens, invs


def _compute_generated_columns(
    df: DataFrame,
    gens: list[tuple[str, str, object]],
) -> tuple[DataFrame, list[tuple[str, str, object]]]:
    """Honor generated columns (writer feature generatedColumns) on
    a full-row landing verb: a generated column ABSENT from the
    incoming frame is computed from its generation expression
    (Catalyst ``F.expr``, cast to the declared type) — pure
    projection, no job; a PRESENT one must be VERIFIED (the spec
    obliges writers to ensure provided values satisfy the
    expression) — those are returned as check tuples for
    :func:`_deferred_rule_checks`, so the verification aggregate
    rides the staging write instead of its own pass. Nested types
    compare with eqNullSafe like everything else."""
    from pyspark.sql import functions as F

    checks = [g for g in gens if g[0] in df.columns]
    for name, sql, ty in gens:
        if name not in df.columns:
            ty_s = ty if isinstance(ty, str) else json.dumps(ty)
            df = df.withColumn(name, F.expr(sql).cast(ty_s))
    return df, checks


def _apply_generated_columns(
    df: DataFrame,
    gens: list[tuple[str, str, object]],
    table_dir: str,
    verb: str,
) -> DataFrame:
    """Eager compute-and-verify form of
    :func:`_compute_generated_columns` (the write verbs defer the
    verification aggregate onto their staging write instead)."""
    if not gens:
        return df
    df, checks = _compute_generated_columns(df, gens)
    if checks:
        exprs, validate = _deferred_rule_checks(
            checks, [], [], table_dir, verb
        )
        validate(df.agg(*exprs).first())
    return df


def _identity_rules(meta: dict) -> list[dict]:
    """Collect identity-column declarations (writer feature
    identityColumns): ``delta.identity.start`` / ``.step`` /
    ``.allowExplicitInsert`` / ``.highWaterMark`` column metadata.
    A zero step is corrupt table state — refused."""
    out = []
    for f in json.loads(meta["schemaString"])["fields"]:
        md = f.get("metadata") or {}
        if not any(k.startswith("delta.identity.") for k in md):
            continue
        step = int(md.get("delta.identity.step", 1))
        if step == 0:
            raise ValueError(
                f"identity column {f['name']!r} declares step=0 — "
                "no value can ever be allocated"
            )
        out.append(
            {
                "name": f["name"],
                "type": f["type"],
                "start": int(md.get("delta.identity.start", 1)),
                "step": step,
                "explicit": (
                    lambda raw: raw
                    if isinstance(raw, bool)
                    else str(raw).lower() == "true"
                )(md.get("delta.identity.allowExplicitInsert", False)),
                "hwm": (
                    int(md["delta.identity.highWaterMark"])
                    if "delta.identity.highWaterMark" in md
                    else None
                ),
            }
        )
    return out


def _further(a: int | None, b: int | None, step: int) -> int | None:
    """The value further along the identity sequence (max for
    positive step, min for negative)."""
    if a is None:
        return b
    if b is None:
        return a
    return max(a, b) if step > 0 else min(a, b)


def _apply_identity_columns(
    df: DataFrame,
    idents: list[dict],
    table_dir: str,
    verb: str,
) -> tuple[DataFrame, dict]:
    """Honor identity columns on an append: a column ABSENT from the
    frame is ALLOCATED — fresh values past the high-water mark, step
    arithmetic respected — and a PRESENT one is admitted only when
    the declaration allows explicit inserts (the spec's
    allowExplicitInsert), advancing the mark past the landed values.

    Allocation is the scalable two-pass shape: one per-partition
    count aggregate (metadata-sized result), driver prefix-sums the
    offsets, then values assign as
    ``base + (offset[pid] + rank_in_partition) * step`` via a
    row_number window keyed by the partition id — no global sort, no
    single-partition bottleneck, parallelism preserved at any scale.
    Values are unique and sequence-aligned; contiguity across
    batches is NOT promised (matching the spec, which only requires
    uniqueness and direction). Returns the augmented frame and
    ``{name: new_high_water_mark}`` for the columns whose mark must
    advance in this commit's metaData."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    new_hwm: dict[str, int] = {}
    for ident in idents:
        name, step = ident["name"], ident["step"]
        base_next = (
            ident["start"]
            if ident["hwm"] is None
            else ident["hwm"] + step
        )
        if name in df.columns:
            if not ident["explicit"]:
                raise ValueError(
                    f"{table_dir}: {verb} provides values for "
                    f"identity column {name!r}, but the declaration "
                    "has allowExplicitInsert=false — the commit is "
                    "refused"
                )
            ext = df.agg(
                F.max(name) if step > 0 else F.min(name)
            ).first()[0]
            adv = _further(ident["hwm"], int(ext), step) if (
                ext is not None
            ) else ident["hwm"]
            if adv is not None and adv != ident["hwm"]:
                new_hwm[name] = adv
            continue
        counts = (
            df.withColumn("__pid", F.spark_partition_id())
            .groupBy("__pid")
            .count()
            .collect()
        )
        n = sum(r["count"] for r in counts)
        if n == 0:
            continue
        offs, acc = {}, 0
        for r in sorted(counts, key=lambda r: r["__pid"]):
            offs[int(r["__pid"])] = acc
            acc += int(r["count"])
        off_df = local_rows_df(
            df.sparkSession,
            [(p, o) for p, o in offs.items()],
            "__pid int, __off long",
        )
        w = Window.partitionBy("__pid").orderBy(
            F.monotonically_increasing_id()
        )
        df = (
            df.withColumn("__pid", F.spark_partition_id())
            .withColumn("__rn", F.row_number().over(w) - 1)
            .join(F.broadcast(off_df), "__pid")
            .withColumn(
                name,
                (
                    F.lit(base_next)
                    + (F.col("__off") + F.col("__rn")) * F.lit(step)
                ).cast(
                    ident["type"]
                    if isinstance(ident["type"], str)
                    else "long"
                ),
            )
            .drop("__pid", "__rn", "__off")
        )
        new_hwm[name] = base_next + (n - 1) * step
    return df, new_hwm


def _identity_metadata_action(meta: dict, new_hwm: dict) -> dict:
    """The metaData action advancing identity high-water marks —
    rides in the SAME commit as the adds that consumed the values
    (the protocol's rule: writers must keep the mark ahead of every
    committed value)."""
    sj = json.loads(meta["schemaString"])
    for f in sj["fields"]:
        if f["name"] in new_hwm:
            f["metadata"] = {
                **(f.get("metadata") or {}),
                "delta.identity.highWaterMark": int(
                    new_hwm[f["name"]]
                ),
            }
    out = {
        k: v
        for k, v in meta.items()
        if k
        in (
            "id",
            "format",
            "schemaString",
            "partitionColumns",
            "configuration",
        )
    }
    out["schemaString"] = json.dumps(sj)
    return {"metaData": out}


def _enforce_invariants(
    df: DataFrame,
    invs: list[tuple[str, str]],
    table_dir: str,
    verb: str,
) -> None:
    """Column-invariant enforcement (legacy writer feature
    invariants): one aggregate counts rows where each declared
    expression is not TRUE. Unlike SQL CHECK, a NULL result violates
    — the spec requires the expression to BE true for every row, so
    indeterminate is not a pass. Eager form of
    :func:`_deferred_rule_checks` (the write verbs observe the same
    expressions on their staging write instead)."""
    if not invs:
        return
    exprs, validate = _deferred_rule_checks(
        [], invs, [], table_dir, verb
    )
    validate(df.agg(*exprs).first())


class DeltaTable:
    """Read-only view over a Delta Lake table directory.

    ``scan(filters=[("col", "=", lit), ...])`` returns a DataFrame
    over the pruned file set (ops ``=, !=, <, <=, >, >=, in``);
    ``scan(version=...)`` time-travels by replaying the log up to that
    commit."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path[7:] if path.startswith("file://") else path
        self.log_dir = os.path.join(self.path, "_delta_log")
        if not os.path.isdir(self.log_dir):
            raise FileNotFoundError(f"{self.path}: no _delta_log")
        self._state_cache: dict[int, tuple] = {}
        self._protocol_cache: dict[int, dict] = {}
        self._tombstone_cache: dict[int, list[dict]] = {}
        self._sig_cache: dict[str, tuple] = {}
        self._maybe_evolved: dict[int, bool] = {}

    def _footer_sigs(self, paths: list[str]) -> dict[str, tuple]:
        """Footer (column name, field id) signatures per data file —
        thread-pooled KB reads, cached per table object (committed
        data files are immutable). Shared by the fast-path
        homogeneity check and the grouped evolution-aware reads."""
        from concurrent.futures import ThreadPoolExecutor

        from feature_store_spark.sources.iceberg import parquet_field_ids

        todo = [p for p in paths if p not in self._sig_cache]
        if todo:
            with ThreadPoolExecutor(max_workers=16) as pool:
                for p, sig in zip(todo, pool.map(parquet_field_ids, todo)):
                    self._sig_cache[p] = sig
        return {p: self._sig_cache[p] for p in paths}

    # -- log replay

    def latest_version(self) -> int:
        """Max of the last JSON commit and the newest complete
        checkpoint — a compacted log may have a checkpoint NEWER than
        any surviving JSON commit."""
        vs = self._commit_versions()
        ck = self._checkpoint_at_or_before(1 << 62)
        cands = ([vs[-1]] if vs else []) + ([ck[0]] if ck else [])
        if not cands:
            raise ValueError(f"{self.path}: empty delta log")
        return max(cands)

    def _commit_versions(self) -> list[int]:
        out = []
        for name in os.listdir(self.log_dir):
            if name.endswith(".json") and name[:-5].isdigit():
                out.append(int(name[:-5]))
        return sorted(out)

    def _checkpoint_at_or_before(self, version: int):
        """(checkpoint_version, [ALL checkpoint parquet parts]) or
        None. Handles both the classic single-file layout
        (``%020d.checkpoint.parquet``) and the multi-part layout
        (``%020d.checkpoint.%010d.%010d.parquet`` = version, part,
        total parts). A version whose part set is incomplete — a
        concurrent checkpoint writer mid-upload, or torn cleanup — is
        SKIPPED in favor of the next older complete checkpoint (or a
        pure JSON replay): a partial state must never be replayed, and
        an earlier complete state + the JSON suffix is still exact."""
        single: dict[int, str] = {}
        parts: dict[int, dict[int, str]] = {}
        totals: dict[int, int] = {}
        for name in os.listdir(self.log_dir):
            m = re.fullmatch(r"(\d{20})\.checkpoint\.parquet", name)
            if m:
                single[int(m.group(1))] = os.path.join(self.log_dir, name)
                continue
            m = re.fullmatch(
                r"(\d{20})\.checkpoint\.(\d{10})\.(\d{10})\.parquet", name
            )
            if m:
                v = int(m.group(1))
                parts.setdefault(v, {})[int(m.group(2))] = os.path.join(
                    self.log_dir, name
                )
                totals[v] = int(m.group(3))
        candidates = sorted(
            (v for v in set(single) | set(parts) if v <= version),
            reverse=True,
        )
        for v in candidates:
            if v in single:
                return v, [single[v]]
            want = totals[v]
            have = parts[v]
            if len(have) == want and set(have) == set(
                range(1, want + 1)
            ):
                return v, [have[i] for i in range(1, want + 1)]
            # incomplete: try the next older checkpoint
        return None

    def _state(
        self, version: int | None
    ) -> tuple[dict, list[dict], dict[str, int]]:
        """Replay to (metaData, live add actions, txn high-water marks
        by appId) at ``version``."""
        versions = self._commit_versions()
        if version is None:
            # latest = max(JSON, checkpoint) — a compacted log can
            # have a checkpoint NEWER than any surviving JSON commit,
            # and 'latest' resolved from JSON alone would be stale
            version = self.latest_version()
        if version in self._state_cache:
            # one DeltaTable = one pinned view of the log; scan() and
            # data_files() share a single replay per version
            return self._state_cache[version]
        if version not in versions and not self._checkpoint_at_or_before(
            version
        ):
            raise ValueError(f"unknown delta version {version}")

        adds: dict[str, dict] = {}
        # un-expired remove TOMBSTONES (spec: checkpoints must carry
        # them so readers/VACUUM tooling replaying from the checkpoint
        # keep tombstone visibility); a later re-add clears the
        # tombstone. Kept in a parallel cache — state consumers see
        # the same (meta, adds, txns) tuple as before.
        removes: dict[str, dict] = {}
        meta: dict = {}
        protocol: dict = {}
        txns: dict[str, int] = {}
        # heterogeneity signal for the scan fast paths: files written
        # under DIFFERENT schemaStrings may disagree on columns. A
        # replay that starts from a checkpoint can't prove schema
        # stability (the JSON history is compacted away), so it
        # conservatively flags too.
        schema_strings: set[str] = set()
        start = 0
        ckpt = self._checkpoint_at_or_before(version)
        if ckpt is not None:
            cv, paths = ckpt
            import pyarrow.parquet as pq

            for p in paths:
                tbl = pq.read_table(p)
                for row in tbl.to_pylist():
                    if row.get("metaData") and row["metaData"].get("id"):
                        meta = dict(row["metaData"])
                        meta["configuration"] = _as_dict(
                            meta.get("configuration")
                        )
                    if row.get("protocol") and row["protocol"].get(
                        "minReaderVersion"
                    ) is not None:
                        protocol = row["protocol"]
                    add = row.get("add")
                    if add and add.get("path"):
                        add = dict(add)
                        # parquet checkpoints store partitionValues as
                        # a MAP; pyarrow hands map cells back as
                        # [(k, v), ...] — normalize to the dict the
                        # JSON-commit path produces
                        add["partitionValues"] = _as_dict(
                            add.get("partitionValues")
                        )
                        adds[add["path"]] = add
                        removes.pop(add["path"], None)
                    rem = row.get("remove")
                    if rem and rem.get("path"):
                        adds.pop(rem["path"], None)
                        rem = dict(rem)
                        rem["partitionValues"] = _as_dict(
                            rem.get("partitionValues")
                        )
                        removes[rem["path"]] = rem
                    txn = row.get("txn")
                    if txn and txn.get("appId") is not None:
                        txns[txn["appId"]] = max(
                            txns.get(txn["appId"], -1),
                            int(txn["version"]),
                        )
            start = cv + 1
        for v in versions:
            if v < start or v > version:
                continue
            with open(os.path.join(self.log_dir, f"{v:020d}.json")) as f:
                for line in f:
                    if not line.strip():
                        continue
                    action = json.loads(line)
                    if "metaData" in action:
                        meta = action["metaData"]
                        ss = meta.get("schemaString")
                        if ss:
                            schema_strings.add(ss)
                    elif "protocol" in action:
                        protocol = action["protocol"]
                    elif "add" in action:
                        adds[action["add"]["path"]] = action["add"]
                        removes.pop(action["add"]["path"], None)
                    elif "remove" in action:
                        adds.pop(action["remove"]["path"], None)
                        removes[action["remove"]["path"]] = action[
                            "remove"
                        ]
                    elif "txn" in action:
                        t = action["txn"]
                        txns[t["appId"]] = max(
                            txns.get(t["appId"], -1), int(t["version"])
                        )
        self._check_protocol(protocol)
        if not meta:
            raise ValueError(f"{self.path}: delta log has no metaData")
        self._maybe_evolved[version] = (
            ckpt is not None or len(schema_strings) > 1
        )
        out = (meta, list(adds.values()), txns)
        self._state_cache[version] = out
        self._protocol_cache[version] = protocol
        self._tombstone_cache[version] = list(removes.values())
        return out

    def tombstones(self, version: int | None = None) -> list[dict]:
        """Remove actions still live (not re-added) at ``version`` —
        what a spec-shaped checkpoint must carry so external readers
        and VACUUM tooling keep tombstone visibility."""
        if version is None:
            version = self.latest_version()
        self._state(version)
        return self._tombstone_cache.get(version, [])

    def _protocol(self, version: int | None = None) -> dict:
        """The protocol action in force at ``version`` (replayed with
        the same state machinery)."""
        if version is None:
            version = self.latest_version()
        self._state(version)
        return self._protocol_cache.get(version, {})

    def _check_protocol(self, protocol: dict) -> None:
        feats = set(protocol.get("readerFeatures") or [])
        bad = feats - _SUPPORTED_READER_FEATURES
        if bad:
            raise NotImplementedError(
                f"{self.path}: delta reader features {sorted(bad)} are not "
                "supported (spec requires refusing unknown reader "
                "features; supported: "
                f"{sorted(_SUPPORTED_READER_FEATURES)})"
            )
        if protocol.get("minReaderVersion", 1) > 3:
            raise NotImplementedError(
                f"{self.path}: minReaderVersion "
                f"{protocol['minReaderVersion']} > 3"
            )

    # -- column mapping

    def _mapping(self, meta: dict) -> tuple[str, list[dict]]:
        """(mode, top-level fields) where each field carries the
        logical ``name``, the parquet ``physical`` name, the mapping
        ``id`` (or None), and the delta ``type``. Signaled by
        minReaderVersion>=2 + ``delta.columnMapping.mode`` in the
        table configuration (the v2 signal ADVICE r7 flagged — the
        feature list alone is a v3 concept)."""
        mode = (meta.get("configuration") or {}).get(
            "delta.columnMapping.mode", "none"
        )
        if mode not in ("none", "name", "id"):
            raise NotImplementedError(
                f"{self.path}: delta.columnMapping.mode={mode!r} is not "
                "supported (none/name/id only)"
            )
        schema = json.loads(meta["schemaString"])
        fields = []
        for f in schema["fields"]:
            md = f.get("metadata") or {}
            phys = md.get("delta.columnMapping.physicalName", f["name"])
            fid = md.get("delta.columnMapping.id")
            if mode != "none" and not isinstance(f["type"], str):
                raise NotImplementedError(
                    f"{self.path}: column mapping over nested column "
                    f"{f['name']!r} is not supported (flat schemas only)"
                )
            fields.append(
                {
                    "name": f["name"],
                    "physical": phys if mode != "none" else f["name"],
                    "id": int(fid) if fid is not None else None,
                    "type": f["type"],
                }
            )
        return mode, fields

    # -- deletion vectors

    def _load_dv(self, d: dict):
        """Decode one add action's deletionVector descriptor to a
        SORTED int64 numpy array of deleted row ordinals (PROTOCOL.md
        'Deletion Vector Descriptor Schema': inline Z85,
        relative-with-UUID, or absolute-path storage). Numpy end to
        end — a 10⁵–10⁶-position DV decodes in milliseconds where the
        per-value Python loop took seconds."""
        from feature_store_spark.sources.roaring import (
            deserialize_rbm_array_np,
            dv_file_path,
            read_dv_from_file,
            z85_decode,
        )

        st = d["storageType"]
        if st == "i":
            return deserialize_rbm_array_np(
                z85_decode(d["pathOrInlineDv"])
            )
        if st in ("u", "p"):
            return read_dv_from_file(
                dv_file_path(self.path, d),
                int(d["offset"]),
                int(d["sizeInBytes"]),
                as_numpy=True,
            )
        raise NotImplementedError(
            f"{self.path}: deletionVector storageType {st!r}"
        )

    # -- planning

    def schema(self, version: int | None = None) -> dict:
        meta, _, _ = self._state(version)
        return json.loads(meta["schemaString"])

    def txn_version(self, app_id: str, version: int | None = None) -> int:
        """Highest committed streaming-txn counter for ``app_id`` (-1
        if none) — the Delta protocol's ``txn`` action, the same
        restart-recovery read ManifestedTable.txn_version serves."""
        _, _, txns = self._state(version)
        return txns.get(app_id, -1)

    def _commit_summary(self, version: int) -> dict:
        """ONE parse of a commit file: {timestamp_ms, operation,
        n_adds, n_removes}. The FIRST commitInfo line wins (the rule
        both time travel and DESCRIBE HISTORY share — one parser, so
        they can never disagree); mtime is the spec's fallback."""
        p = os.path.join(self.log_dir, f"{version:020d}.json")
        ts = None
        op = None
        n_adds = n_removes = 0
        with open(p) as f:
            for line in f:
                if not line.strip():
                    continue
                a = json.loads(line)
                if "commitInfo" in a:
                    if op is None:
                        op = a["commitInfo"].get("operation")
                    if ts is None and a["commitInfo"].get(
                        "timestamp"
                    ) is not None:
                        ts = int(a["commitInfo"]["timestamp"])
                elif "add" in a:
                    n_adds += 1
                elif "remove" in a:
                    n_removes += 1
        if ts is None:
            ts = int(os.path.getmtime(p) * 1000)
        return {
            "timestamp_ms": ts,
            "operation": op,
            "n_adds": n_adds,
            "n_removes": n_removes,
        }

    def _version_timestamps(self) -> list[tuple[int, int]]:
        """(version, epoch-ms) per JSON commit — the commitInfo
        timestamp when present, else the commit file's mtime (the
        Delta spec's own time-travel resolution rule)."""
        return [
            (v, self._commit_summary(v)["timestamp_ms"])
            for v in self._commit_versions()
        ]

    def version_as_of(self, as_of_ms: int) -> int:
        """Time travel by wall clock: the latest version committed at
        or before ``as_of_ms``."""
        eligible = [
            (ts, v)
            for v, ts in self._version_timestamps()
            if ts <= as_of_ms
        ]
        if not eligible:
            raise ValueError(
                f"{self.path}: no commit at or before {as_of_ms}"
            )
        return max(eligible)[1]

    def history(self) -> list[dict]:
        """DESCRIBE HISTORY: one dict per JSON commit — version,
        commit timestamp (commitInfo, else file mtime), operation, and
        per-commit action counts. ONE parse per commit file, shared
        with the time-travel timestamp resolution."""
        return [
            {"version": v, **self._commit_summary(v)}
            for v in self._commit_versions()
        ]

    def data_files(
        self,
        version: int | None = None,
        filters: list[tuple] | None = None,
    ) -> list[dict]:
        meta, adds, _ = self._state(version)
        _, fields = self._mapping(meta)
        # stats and partitionValues are keyed by PHYSICAL names in
        # column-mapped tables: translate the logical filter columns
        log2phys = {f["name"]: f["physical"] for f in fields}
        fs = [
            _Filter(log2phys.get(c, c), op, v)
            for c, op, v in (filters or [])
        ]
        types = {
            f["physical"]: f["type"]
            for f in fields
            if isinstance(f["type"], str)
        }
        part_cols = [
            log2phys.get(c, c) for c in (meta.get("partitionColumns") or [])
        ]
        return [
            add
            for add in adds
            if self._add_might_match(add, fs, types, part_cols)
        ]

    def _add_might_match(self, add, fs, types, part_cols) -> bool:
        # INVARIANT: stats min/max are EXACT (untruncated) — written
        # so by _stage_add_actions. delta_upsert/delta_merge use this
        # pruning for their match probes, where a file hidden by a
        # TRUNCATED max (Delta proper truncates long strings and
        # marks maxValues as a prefix bound) would make the merge
        # INSERT a duplicate instead of updating. If stat truncation
        # is ever added, prefix-bound maxima must widen the interval
        # here, not narrow it (ADVICE r12; property-tested with long
        # unicode keys in test_properties.py).
        if not fs:
            return True
        pvals = add.get("partitionValues") or {}
        stats = {}
        if add.get("stats"):
            try:
                stats = json.loads(add["stats"])
            except (TypeError, ValueError):
                stats = {}
        mins = stats.get("minValues") or {}
        maxs = stats.get("maxValues") or {}
        for f in fs:
            t = types.get(f.col)
            if f.col in pvals:
                v = _parse_partition_value(pvals[f.col], t)
                if v is not None and not f.might_match(v, v):
                    return False
            lo = _coerce_stat(mins.get(f.col), t)
            hi = _coerce_stat(maxs.get(f.col), t)
            if (lo is not None or hi is not None) and not f.might_match(
                lo, hi
            ):
                return False
        return True

    def scan(
        self,
        version: int | None = None,
        filters: list[tuple] | None = None,
        as_of_ms: int | None = None,
    ) -> DataFrame:
        from pyspark.sql import functions as F

        if as_of_ms is not None:
            if version is not None:
                raise ValueError("pass version OR as_of_ms, not both")
            version = self.version_as_of(as_of_ms)
        meta, _, _ = self._state(version)
        maybe_evolved = self._maybe_evolved.get(
            version if version is not None else self.latest_version(),
            True,
        )
        adds = self.data_files(version, filters)
        if not adds:
            all_adds = self.data_files(version, None)
            if not all_adds:
                # typed empty frame from the table schema (a CREATE
                # TABLE commit has protocol+metaData and no files)
                from pyspark.sql import types as T

                return self.spark.createDataFrame(
                    [],
                    T.StructType.fromJson(
                        json.loads(meta["schemaString"])
                    ),
                )
            return (
                self._assemble([all_adds[0]], meta, maybe_evolved)
                .drop("__fp", "__pos")
                .limit(0)
            )
        df = self._assemble_live(adds, meta, maybe_evolved)
        df = df.drop("__fp", "__pos")
        for f in filters or []:
            df = df.filter(_Filter(*f).sql())
        return df

    def _assemble_live(
        self,
        adds: list[dict],
        meta: dict,
        maybe_evolved: bool = True,
    ) -> DataFrame:
        """``_assemble`` minus the rows the adds' deletion vectors
        already killed, keeping the ``__fp``/``__pos`` tags — the
        LIVE row set a MERGE probe must match against (a DV-dead row
        is not a row; firing a merge arm on one would resurrect it)."""
        from pyspark.sql import functions as F

        df = self._assemble(adds, meta, maybe_evolved)
        dv_adds = [a for a in adds if a.get("deletionVector")]
        if dv_adds:
            # decode all DVs at plan time (KB–MB metadata) and remove
            # their (file, row ordinal) pairs with ONE anti-join —
            # the Iceberg positional-delete shape. Numpy/Arrow end to
            # end: no per-position Python objects even at 10⁶ deletes.
            import numpy as np
            import pandas as pd

            parts = []
            for a in dv_adds:
                pos = self._load_dv(a["deletionVector"])
                if len(pos) == 0:
                    continue
                p = os.path.abspath(os.path.join(self.path, a["path"]))
                parts.append(
                    pd.DataFrame(
                        {
                            "__del_fp": np.full(len(pos), p,
                                                dtype=object),
                            "__del_pos": pos,
                        }
                    )
                )
            if parts:
                pdf = pd.concat(parts, ignore_index=True)
                dv_df = self.spark.createDataFrame(pdf)
                if len(pdf) <= 4_000_000:
                    dv_df = F.broadcast(dv_df)
                df = df.join(
                    dv_df,
                    (df["__fp"] == dv_df["__del_fp"])
                    & (df["__pos"] == dv_df["__del_pos"]),
                    "left_anti",
                )
        return df

    def _assemble(
        self,
        adds: list[dict],
        meta: dict,
        maybe_evolved: bool = True,
    ) -> DataFrame:
        """Read the add set to a frame with LOGICAL column names plus
        ``__fp`` (absolute data-file path) / ``__pos`` (row ordinal)
        tags for deletion-vector matching.

        Unmapped hive-layout tables keep the single-scan ``basePath``
        fast path (partition dirs reconstruct the columns). Mapped or
        non-hive tables group files by partition tuple (and, in id
        mode, by footer field-id signature), inject typed partition
        literals from ``partitionValues``, resolve physical column
        names back to logical, and union — group count is bounded by
        the pruned set's partition count, not its file count."""
        from pyspark.sql import functions as F

        mode, fields = self._mapping(meta)
        logical_parts = meta.get("partitionColumns") or []
        log2phys = {f["name"]: f["physical"] for f in fields}
        types = {f["name"]: f["type"] for f in fields}
        phys_parts = [log2phys.get(c, c) for c in logical_parts]

        def tag(frame):
            return frame.withColumn(
                "__fp",
                F.regexp_replace(
                    F.col("_metadata.file_path"), "^file:(//)?", ""
                ),
            ).withColumn("__pos", F.col("_metadata.row_index"))

        paths = [os.path.join(self.path, a["path"]) for a in adds]
        # heterogeneous footers (schema evolution) must not share one
        # spark.read.parquet call — Spark infers the schema from ONE
        # file, and a column missing there would silently null out
        # rows from files that DO carry it (review r10d: the fast
        # paths were previously unconditional, so an evolved unmapped
        # table silently dropped the added column). The footer sniff
        # costs one pooled KB read per file, so it only runs when the
        # LOG REPLAY could not prove schema stability
        # (``maybe_evolved``: >1 distinct schemaString seen, or the
        # replay started from a checkpoint that compacted the history
        # away) — never-evolved tables keep the zero-I/O fast path.
        # In id mode the signature also resolves columns by field id.
        sig_of: dict[str, tuple] = {}
        if mode == "none":
            homogeneous = True
            if maybe_evolved:
                sig_of = self._footer_sigs(paths)
                expected = {
                    f["physical"]
                    for f in fields
                    if f["name"] not in logical_parts
                }
                name_sets = {
                    frozenset(n for n, _ in sig_of[p]) for p in paths
                }
                homogeneous = len(name_sets) == 1 and expected <= next(
                    iter(name_sets)
                )
            hive = all(
                all(f"{c}=" in a["path"] for c in phys_parts)
                for a in adds
            )
            if homogeneous and not logical_parts:
                return tag(self.spark.read.parquet(*paths))
            if homogeneous and hive:
                return tag(
                    self.spark.read.option("basePath", self.path).parquet(
                        *paths
                    )
                )
        if not sig_of:
            sig_of = self._footer_sigs(paths)

        data_fields = [f for f in fields if f["name"] not in logical_parts]
        groups: dict[tuple, list[str]] = {}
        pvals_of: dict[tuple, tuple] = {}
        for a in adds:
            p = os.path.join(self.path, a["path"])
            pv = tuple(
                (a.get("partitionValues") or {}).get(c) for c in phys_parts
            )
            key = (pv, sig_of.get(p))
            groups.setdefault(key, []).append(p)
            pvals_of[key] = pv
        frames = []
        for key, ps in groups.items():
            pv, sig = key
            g = tag(self.spark.read.parquet(*ps))
            # homogeneous group: the footer names ARE the file schema
            present = {name for name, _ in sig} if sig else set(g.columns)
            by_id = (
                {fid: name for name, fid in sig if fid is not None}
                if mode == "id" and sig
                else {}
            )
            cols = []
            for f in data_fields:
                if f["id"] is not None and f["id"] in by_id:
                    cols.append(F.col(by_id[f["id"]]).alias(f["name"]))
                elif f["physical"] in present:
                    cols.append(F.col(f["physical"]).alias(f["name"]))
                else:
                    # column added after this file was written
                    cols.append(
                        F.lit(None)
                        .cast(_ddl(f["type"]))
                        .alias(f["name"])
                    )
            for lc, v in zip(logical_parts, pv):
                cols.append(
                    F.lit(v).cast(_ddl(types.get(lc))).alias(lc)
                )
            frames.append(g.select(*cols, "__fp", "__pos"))
        out = frames[0]
        for g in frames[1:]:
            out = out.unionByName(g)
        return out


class ConcurrentWriteError(RuntimeError):
    """Another writer claimed the log version this commit targeted.
    Appends retry internally (they commute); state-dependent commits
    (DELETE/OPTIMIZE) surface this so the caller re-reads and
    retries — blindly re-running could re-delete against stale
    state."""


def _claim_commit(log_dir: str, version: int, actions: list[dict]) -> bool:
    """Atomically claim ``_delta_log/<version>.json``: the content is
    FULLY WRITTEN to a private tmp first, then published with
    ``os.link`` — put-if-absent AND atomic, so neither a crash (even
    SIGKILL mid-write) nor a concurrent reader can ever observe a
    torn commit file; a killed writer leaves only an unclaimed tmp.
    This is the filesystem analog of the object-store conditional put
    every Delta committer is built on. Returns False when another
    writer already owns the version."""
    import uuid as _uuid

    commit = os.path.join(log_dir, f"{version:020d}.json")
    tmp = os.path.join(
        log_dir, f".{version:020d}.{_uuid.uuid4().hex[:8]}.json.tmp"
    )
    with open(tmp, "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, commit)  # atomic put-if-absent
        return True
    except FileExistsError:
        return False
    finally:
        os.remove(tmp)


def _as_dict(v) -> dict:
    """Normalize a parquet-checkpoint MAP cell (pyarrow returns
    ``[(k, v), ...]``) or None to the plain dict the JSON-commit
    replay produces."""
    if v is None:
        return {}
    if isinstance(v, dict):
        return v
    return dict(v)


_DELTA_TO_DDL = {
    "string": "string",
    "integer": "int",
    "long": "bigint",
    "short": "smallint",
    "byte": "tinyint",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp_ntz",
    "binary": "binary",
}


def _ddl(t) -> str:
    """Delta schemaString primitive type -> Spark cast DDL (string
    fallback keeps unknown types readable, never droppable)."""
    if isinstance(t, str):
        if t.startswith("decimal"):
            return t
        return _DELTA_TO_DDL.get(t, "string")
    return "string"


def _parse_partition_value(s: str | None, type_str: str | None):
    if s is None or type_str is None:
        return None
    try:
        if type_str in ("integer", "long", "short", "byte"):
            return int(s)
        if type_str in ("double", "float"):
            return float(s)
        if type_str == "boolean":
            return s == "true"
        if type_str == "string":
            return s
    except ValueError:
        return None
    return None  # dates/timestamps/decimals: no pruning, stay safe


_INTERVAL_UNITS_MS = {
    "week": 7 * 86_400_000, "weeks": 7 * 86_400_000,
    "day": 86_400_000, "days": 86_400_000,
    "hour": 3_600_000, "hours": 3_600_000,
    "minute": 60_000, "minutes": 60_000,
    "second": 1_000, "seconds": 1_000,
}


def _parse_interval_ms(s: str | None) -> int | None:
    """Delta table-property interval ("interval 1 week") -> millis;
    None for absent/unparseable (caller applies its default)."""
    if not s:
        return None
    m = re.fullmatch(
        r"\s*interval\s+(\d+)\s+([a-z]+)\s*", s.strip(), re.I
    )
    if not m or m.group(2).lower() not in _INTERVAL_UNITS_MS:
        return None
    return int(m.group(1)) * _INTERVAL_UNITS_MS[m.group(2).lower()]


def _coerce_stat(v, type_str: str | None):
    if v is None or type_str is None:
        return None
    if type_str in ("integer", "long", "short", "byte"):
        return int(v) if not isinstance(v, bool) else None
    if type_str in ("double", "float"):
        return float(v)
    if type_str in ("string", "boolean"):
        return v
    return None


# -------------------------------------------------------------- writer


def _norm_type(t):
    """Delta schemaString type with NULLABILITY markers stripped
    recursively — schema enforcement compares what the files can
    actually disagree on (structure + primitive types), not the
    nested nullable/metadata flags Spark toggles between a computed
    expression and the same data read back from parquet (review
    r10d #2)."""
    if isinstance(t, dict):
        kind = t.get("type")
        if kind == "struct":
            return (
                "struct",
                tuple(
                    (f["name"], _norm_type(f["type"]))
                    for f in t.get("fields", [])
                ),
            )
        if kind == "array":
            return ("array", _norm_type(t.get("elementType")))
        if kind == "map":
            return (
                "map",
                _norm_type(t.get("keyType")),
                _norm_type(t.get("valueType")),
            )
        return ("?", json.dumps(t, sort_keys=True))
    return t


def _stage_add_actions(
    wdf: DataFrame,
    table_dir: str,
    version: int,
    part_phys: list[str],
    data_cols: list[str],
    post_write_validate=None,
) -> list[dict]:
    """Write ``wdf`` (already physical-named in mapped tables) as
    canonical-layout parquet under ``table_dir`` and return the add
    actions with footer-derived stats. Shared by delta_append and
    delta_upsert so a MERGE lands its files with the exact same
    layout, naming, and stats shape as an append.

    Stage with Spark, then move leaf files into the canonical Delta
    layout (partition dirs directly under the table root, unique file
    names) — Spark's partition discovery over the table requires ONE
    consistent directory structure across commits.

    ``post_write_validate`` (r14): callers attach their write-path
    rule aggregates (generated-column / invariant / CHECK counts) as
    OBSERVED metrics on ``wdf`` and pass the validator here; it runs
    right after the staging write, BEFORE any file moves into the
    table layout — a refused batch deletes its staging dir and
    raises, leaving no state (same contract as the old pre-write
    aggregation passes, minus their extra scans of the batch)."""
    import shutil as _sh
    import uuid

    import pyarrow.parquet as pq

    from feature_store_spark.sources.manifest import _staging_rebalance

    staging = os.path.join(table_dir, f".staging-{uuid.uuid4().hex[:8]}")
    if not part_phys and _staging_rebalance(wdf.sparkSession):
        # AQE-sized REBALANCE for unpartitioned staged writes: the
        # frames the write verbs pass here are shuffle- or
        # localCheckpoint-derived (partition count = configured
        # parallelism, not data size), so writing them as-is lands
        # `shuffle.partitions` near-empty files per commit and every
        # later scan pays per-file open cost for all of them. The
        # rebalance exchange lets AQE size the write by advisory
        # bytes — file count tracks bytes at every scale. Safe after
        # identity allocation: the spark_partition_id()-keyed value
        # assignment evaluates BELOW this exchange (nondeterministic
        # expressions are not pushed across it).
        wdf = wdf.hint("rebalance")
    writer = wdf.write.mode("overwrite")
    if part_phys:
        writer = writer.partitionBy(*part_phys)
    try:
        writer.parquet(staging)
        if post_write_validate is not None:
            post_write_validate()
    except BaseException:
        # refused (or failed) batch: nothing may enter the table
        # layout — the staged files are outside the log's view, so
        # removing the staging dir restores the exact no-state-change
        # contract the eager enforcement passes had
        _sh.rmtree(staging, ignore_errors=True)
        raise
    moved: list[str] = []
    for root, _dirs, files in os.walk(staging):
        for name in files:
            if not name.endswith(".parquet"):
                continue
            src = os.path.join(root, name)
            segs = [
                s
                for s in os.path.relpath(src, staging).split("/")[:-1]
                if "=" in s
            ]
            tgt_dir = os.path.join(table_dir, *segs)
            os.makedirs(tgt_dir, exist_ok=True)
            rel = os.path.join(
                *segs, f"part-{version:05d}-{uuid.uuid4().hex}.parquet"
            )
            os.replace(src, os.path.join(table_dir, rel))
            moved.append(rel)
    _sh.rmtree(staging, ignore_errors=True)

    # footer reads are independent KB-scale I/O — parallel stat
    # collection, same as the iceberg exporter
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=16) as pool:
        metas = list(
            pool.map(
                lambda r: pq.ParquetFile(
                    os.path.join(table_dir, r)
                ).metadata,
                moved,
            )
        )
    out: list[dict] = []
    for rel, md in zip(moved, metas):
        fpath = os.path.join(table_dir, rel)
        if md.num_rows == 0:
            # an empty staged frame can still leave one zero-row part
            # file — never commit it (junk scan overhead forever).
            # Callers rely on this: delta_upsert/delta_merge derive
            # "nothing landed" from an EMPTY return instead of paying
            # a separate isEmpty() job per batch (VERDICT r12 next #3)
            os.remove(fpath)
            continue
        # Spark's writer hive-escapes dir segments; partitionValues
        # must carry the REAL value (escaped form only in `path`)
        pvals = parse_partition_segs(rel)
        mins: dict[str, Any] = {}
        maxs: dict[str, Any] = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                st = col.statistics
                cname = col.path_in_schema
                if st is None or not st.has_min_max or cname not in data_cols:
                    continue
                # exact footer min/max, NEVER truncated: the
                # upsert/merge probes prune files through
                # _add_might_match on these bounds, and a prefix-
                # truncated max could hide a matching key (duplicate
                # insert instead of update). Delta proper truncates
                # long string stats; this writer deliberately does
                # not (ADVICE r12 pins the invariant).
                mn, mx = _json_stat(st.min), _json_stat(st.max)
                if mn is None or mx is None:
                    continue
                mins[cname] = mn if cname not in mins else min(mins[cname], mn)
                maxs[cname] = mx if cname not in maxs else max(maxs[cname], mx)
        out.append(
            {
                "add": {
                    "path": rel,
                    "partitionValues": {
                        c: pvals.get(c) for c in part_phys
                    },
                    "size": os.path.getsize(fpath),
                    "modificationTime": 0,
                    "dataChange": True,
                    "stats": json.dumps(
                        {
                            "numRecords": md.num_rows,
                            "minValues": mins,
                            "maxValues": maxs,
                        }
                    ),
                }
            }
        )
    return out


def _evolve_delta_schema(
    meta0: dict, added: list[dict], mode: str, map_fields: list[dict]
) -> dict:
    """Build the updated ``metaData`` action for schema evolution:
    ``added`` (spark-schema field dicts) append to the table schema
    as nullable columns (old files have no values — they read NULL).
    In mapped tables each new column is assigned a fresh physical
    name + field id above the recorded high-water mark;
    ``map_fields`` is extended in place so the caller's physical
    rename of the staged frame sees the new columns. Shared by
    delta_append(merge_schema=True) and delta_merge(evolve=True) so
    both verbs evolve with byte-identical metadata shapes."""
    import uuid

    cur_fields = json.loads(meta0["schemaString"])["fields"]
    conf = dict(meta0.get("configuration") or {})
    sj = {"type": "struct", "fields": list(cur_fields)}
    for f in added:
        nf = dict(f)
        nf["nullable"] = True  # old files have no values
        if mode != "none":
            next_id = (
                max(
                    max(x["id"] for x in map_fields),
                    int(
                        conf.get("delta.columnMapping.maxColumnId", 0)
                    ),
                )
                + 1
            )
            phys = f"col-{uuid.uuid4().hex[:12]}"
            map_fields.append(
                {
                    "name": f["name"],
                    "physical": phys,
                    "id": next_id,
                    "type": f["type"],
                }
            )
            nf["metadata"] = {
                **(nf.get("metadata") or {}),
                "delta.columnMapping.id": next_id,
                "delta.columnMapping.physicalName": phys,
            }
            conf["delta.columnMapping.maxColumnId"] = str(next_id)
        sj["fields"].append(nf)
    md = dict(meta0)
    md["schemaString"] = json.dumps(sj)
    md["configuration"] = conf
    return {"metaData": md}


def delta_append(
    df: DataFrame,
    table_dir: str,
    partition_cols: list[str] | None = None,
    txn: tuple[str, int] | None = None,
    column_mapping: str | None = None,
    properties: dict | None = None,
    merge_schema: bool = False,
    column_metadata: dict | None = None,
) -> int:
    """Append ``df`` as one Delta commit (creating the table on first
    call). Executors write hive-partitioned parquet; the driver
    records add actions with footer-derived stats (numRecords +
    min/max per leaf column) and publishes the next
    ``_delta_log/%020d.json`` atomically. Returns the commit version.

    ``txn=(app_id, version)`` records the Delta protocol's ``txn``
    action in the same commit and makes redelivery a NO-OP when the
    table's high-water mark for ``app_id`` already covers ``version``
    — the exactly-once handshake Structured Streaming's foreachBatch
    needs (same semantics as ManifestedTable.append's token).

    ``column_mapping='name'|'id'`` (first commit only) creates the
    table in that column-mapping mode: data files carry generated
    PHYSICAL names (``col-<hex>``) and, in both modes, parquet
    field_ids from ``delta.columnMapping.id`` (Spark's
    ``parquet.field.id`` schema metadata); the schemaString records
    the logical→physical mapping and the protocol advertises
    minReaderVersion 2 / minWriterVersion 5. Later appends adopt
    whatever mode the table already has.

    ``properties`` (first commit only) merges table properties into
    ``metaData.configuration`` — e.g.
    ``delta.deletedFileRetentionDuration`` ("interval 1 week"), which
    VACUUM and the checkpoint tombstone window honor.

    Schema ENFORCEMENT (the protocol's default): an append whose
    DataFrame drops a table column or changes a column's type
    refuses; one that ADDS columns refuses unless
    ``merge_schema=True``, which commits an updated ``metaData``
    action in the SAME commit (the protocol's evolution shape) — new
    columns land nullable, and in mapped tables they get fresh
    ``delta.columnMapping`` ids/physical names with ``maxColumnId``
    bumped, so committed files' ids never repoint. Readers null-fill
    the new columns for pre-evolution files.

    Export-grade: append-only, no concurrent-writer arbitration (the
    engine's native format, sources/manifest.py, owns that)."""
    import uuid

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    spark = df.sparkSession
    partition_cols = list(partition_cols or [])
    log_dir = os.path.join(table_dir, "_delta_log")
    os.makedirs(log_dir, exist_ok=True)

    existing = [
        int(n[:-5])
        for n in os.listdir(log_dir)
        if n.endswith(".json") and n[:-5].isdigit()
    ]
    # checkpoints count toward the version chain too: a log whose
    # JSON prefix was compacted away must keep numbering FORWARD
    for n in os.listdir(log_dir):
        m = re.match(r"(\d{20})\.checkpoint(\.|$)", n)
        if m:
            existing.append(int(m.group(1)))
    version = (max(existing) + 1) if existing else 0
    # (exprs, validate) of the declared write-path rules — observed
    # on the staging write below instead of eager per-family passes
    deferred_checks: tuple = ([], None)
    if column_metadata:
        # CREATE-time column metadata (``{col: {"delta.generation
        # Expression": sql, "delta.invariants": json, ...}}``) — the
        # authoring path for generated-column / invariant tables.
        # Schema metadata is table state: altering it on an existing
        # table is a different operation, refused here.
        if version > 0:
            raise ValueError(
                f"{table_dir}: column_metadata declares schema "
                "metadata at CREATE time; the table already exists"
            )
        unknown_cols = sorted(set(column_metadata) - set(df.columns))
        if unknown_cols:
            raise ValueError(
                f"column_metadata names column(s) {unknown_cols} "
                "not in the frame"
            )
        # the declared rules bind from the very first batch: verify
        # provided generated values, enforce invariants and any
        # delta.constraints.* passed via properties
        ty_of = {
            f["name"]: f["type"]
            for f in json.loads(df.schema.json())["fields"]
        }
        gens0 = [
            (c, md["delta.generationExpression"], ty_of[c])
            for c, md in column_metadata.items()
            if "delta.generationExpression" in md
        ]
        invs0 = []
        for c, md in column_metadata.items():
            if "delta.invariants" in md:
                try:
                    invs0.append(
                        (
                            c,
                            json.loads(md["delta.invariants"])[
                                "expression"
                            ]["expression"],
                        )
                    )
                except (ValueError, KeyError, TypeError):
                    raise ValueError(
                        f"column_metadata for {c!r}: delta.invariants "
                        'must be the spec\'s {"expression": '
                        '{"expression": sql}} JSON'
                    )
        # rules are enforced via ONE fused aggregate OBSERVED on the
        # staging write (r14, guide §1.2/§5) — the old shape ran one
        # aggregation job per rule family over the un-materialized
        # batch lineage; see _deferred_rule_checks
        df, gen_checks0 = _compute_generated_columns(df, gens0)
        deferred_checks = _deferred_rule_checks(
            gen_checks0,
            invs0,
            sorted(
                (k[len("delta.constraints."):], v)
                for k, v in (properties or {}).items()
                if k.startswith("delta.constraints.")
            ),
            table_dir,
            "delta_append",
        )
        # identity declarations at CREATE: the declared column is in
        # the frame (the frame IS the schema source), so this is an
        # explicit insert — admitted only when the declaration allows
        # it, and the high-water mark seeds from the landed values
        for c, cmd in column_metadata.items():
            if not any(k.startswith("delta.identity.") for k in cmd):
                continue
            raw = cmd.get("delta.identity.allowExplicitInsert", False)
            allow = (
                raw
                if isinstance(raw, bool)
                else str(raw).lower() == "true"
            )
            if not allow:
                raise ValueError(
                    f"{table_dir}: identity column {c!r} declares "
                    "allowExplicitInsert=false, but CREATE lands the "
                    "frame's values for it — declare "
                    "allowExplicitInsert=true or seed with the "
                    "start value"
                )
            step0 = int(cmd.get("delta.identity.step", 1))
            if step0 == 0:
                raise ValueError(
                    f"identity column {c!r} declares step=0"
                )
            ext = df.agg(
                F.max(c) if step0 > 0 else F.min(c)
            ).first()[0]
            if ext is not None:
                cmd = dict(cmd)
                cmd["delta.identity.highWaterMark"] = int(ext)
                column_metadata[c] = cmd
    evolution_md: dict | None = None
    ident_hwm: dict = {}
    if version > 0:
        t = DeltaTable(spark, table_dir)
        if txn is not None:
            app_id, txn_v = txn
            if t.txn_version(app_id) >= int(txn_v):
                return max(existing)  # redelivered batch: no-op
        meta0, _, _ = t._state(None)
        # write-side protocol gate (VERDICT r12 next #4): appends are
        # allowed on append-only tables but must still refuse unknown
        # writer features and enforce declared CHECK constraints;
        # generated columns are computed/verified and invariants
        # enforced BEFORE the CHECKs so constraints referencing a
        # generated column see its value
        constraints = _writer_feature_gate(
            t,
            meta0,
            "delta_append",
            mutates=False,
            full_rows=True,
            identity_ok=True,
        )
        idents = _identity_rules(meta0)
        ident_hwm: dict = {}
        if idents:
            df, ident_hwm = _apply_identity_columns(
                df, idents, table_dir, "delta_append"
            )
        gens, invs = _generation_rules(meta0, table_dir)
        # ONE fused rule aggregate, observed on the staging write
        # (r14): the three eager passes each re-ran the whole batch
        # lineage — on a generated+invariant+CHECK table that was 3
        # extra full scans per append (and the delta_generated 8-core
        # blowup: every extra pass re-paid the scan at 1/4 the
        # parallelism). The expressions and refusal messages are
        # identical; they now cost zero extra jobs.
        df, gen_checks = _compute_generated_columns(df, gens)
        deferred_checks = _deferred_rule_checks(
            gen_checks, invs, constraints, table_dir, "delta_append"
        )
        mode, map_fields = t._mapping(meta0)
        # schema enforcement / evolution against the CURRENT logical
        # schema — silently landing files whose schema drifted from
        # the schemaString would make readers narrow or null columns
        # with no record of why (review r10d)
        tbl_parts = meta0.get("partitionColumns") or []
        if list(partition_cols) != list(tbl_parts):
            # partitioning is a TABLE property: files appended under a
            # different layout would read their partition column as
            # NULL (the grouped reader injects it from
            # partitionValues, which such files don't carry)
            raise ValueError(
                f"{table_dir}: table is partitioned by {tbl_parts}; "
                f"append passed partition_cols={list(partition_cols)}"
            )
        cur_fields = json.loads(meta0["schemaString"])["fields"]
        cur_types = {f["name"]: f["type"] for f in cur_fields}
        df_fields = json.loads(df.schema.json())["fields"]
        new_types = {f["name"]: f["type"] for f in df_fields}
        mismatched = sorted(
            n
            for n in new_types
            if n in cur_types
            and _norm_type(new_types[n]) != _norm_type(cur_types[n])
        )
        absent = sorted(n for n in cur_types if n not in new_types)
        added = [f for f in df_fields if f["name"] not in cur_types]
        if mismatched or absent:
            raise ValueError(
                f"{table_dir}: append schema deviates from the table "
                f"(type changes: {mismatched}, missing columns: "
                f"{absent}) — the protocol enforces the schema; "
                "rewrite the table to change it"
            )
        if added and not merge_schema:
            raise ValueError(
                f"{table_dir}: append carries unknown column(s) "
                f"{[f['name'] for f in added]} — pass "
                "merge_schema=True to evolve the table schema"
            )
        if added:
            evolution_md = _evolve_delta_schema(
                meta0, added, mode, map_fields
            )
    else:
        mode = column_mapping or "none"
        if mode not in ("none", "name", "id"):
            raise ValueError(f"column_mapping must be name/id, got {mode!r}")
        map_fields = [
            {
                "name": f.name,
                "physical": (
                    f"col-{uuid.uuid4().hex[:12]}"
                    if mode != "none"
                    else f.name
                ),
                "id": i + 1,
                "type": f.dataType.jsonValue(),
            }
            for i, f in enumerate(df.schema.fields)
        ]
    check_exprs, check_validate = deferred_checks
    post_write_validate = None
    if check_exprs:
        from pyspark.sql import Observation

        obs = Observation()
        df = df.observe(obs, *check_exprs)
        post_write_validate = lambda: check_validate(obs.get)  # noqa: E731
    phys_of = {f["name"]: f["physical"] for f in map_fields}
    fid_of = {f["name"]: f["id"] for f in map_fields}
    wdf = df
    part_phys = partition_cols
    if mode != "none":
        missing = [c for c in df.columns if c not in phys_of]
        if missing:
            raise ValueError(
                f"{table_dir}: columns {missing} are not in the mapped "
                "table schema"
            )
        wdf = df.select(
            *[
                F.col(c).alias(
                    phys_of[c],
                    metadata={"parquet.field.id": int(fid_of[c])},
                )
                for c in df.columns
            ]
        )
        part_phys = [phys_of[c] for c in partition_cols]

    actions: list[dict] = []
    if evolution_md is not None:
        # the updated metaData rides in the SAME commit as the files
        # that first carry the new columns (the protocol's evolution
        # shape) — replay order makes it current before any reader
        # sees those adds
        if ident_hwm:
            raise NotImplementedError(
                f"{table_dir}: schema evolution and identity "
                "allocation in ONE commit would need a merged "
                "metaData action — split the append"
            )
        actions.append(evolution_md)
    if ident_hwm:
        # same-commit rule as evolution: the mark advances with the
        # adds that consumed the values
        actions.append(_identity_metadata_action(meta0, ident_hwm))
    if version == 0:
        if mode == "none":
            # spec minimums: 2 = invariants, 3 = CHECK constraints,
            # 4 = generated columns — declare the highest the table
            # actually uses so legacy writers that can't honor the
            # declarations refuse
            min_w = 2
            if any(
                k.startswith("delta.constraints.")
                for k in (properties or {})
            ):
                min_w = 3
            if any(
                "delta.generationExpression" in md
                for md in (column_metadata or {}).values()
            ):
                min_w = 4
            if any(
                any(k.startswith("delta.identity.") for k in md)
                for md in (column_metadata or {}).values()
            ):
                min_w = 6
            actions.append(
                {"protocol": {"minReaderVersion": 1,
                              "minWriterVersion": min_w}}
            )
            schema_string = df.schema.json()
            configuration: dict = {}
        else:
            actions.append(
                {"protocol": {"minReaderVersion": 2,
                              "minWriterVersion": 5}}
            )
            sj = json.loads(df.schema.json())
            for f in sj["fields"]:
                f["metadata"] = {
                    "delta.columnMapping.id": int(fid_of[f["name"]]),
                    "delta.columnMapping.physicalName": phys_of[f["name"]],
                }
            schema_string = json.dumps(sj)
            configuration = {
                "delta.columnMapping.mode": mode,
                "delta.columnMapping.maxColumnId": str(len(map_fields)),
            }
        if properties:
            configuration = {**configuration, **properties}
        if column_metadata:
            sj = json.loads(schema_string)
            for f in sj["fields"]:
                if f["name"] in column_metadata:
                    f["metadata"] = {
                        **(f.get("metadata") or {}),
                        **column_metadata[f["name"]],
                    }
            schema_string = json.dumps(sj)
        actions.append(
            {
                "metaData": {
                    "id": str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema_string,
                    "partitionColumns": partition_cols,
                    "configuration": configuration,
                }
            }
        )
    # stats + partitionValues are keyed by PHYSICAL names (what the
    # footers and directory segs carry in mapped tables)
    data_cols = [
        phys_of.get(f.name, f.name)
        for f in df.schema.fields
        if f.name not in partition_cols
    ]
    actions.extend(
        _stage_add_actions(
            wdf,
            table_dir,
            version,
            part_phys,
            data_cols,
            post_write_validate=post_write_validate,
        )
    )
    if txn is not None:
        actions.append(
            {"txn": {"appId": txn[0], "version": int(txn[1]),
                     "lastUpdated": 0}}
        )
    import time as _time

    actions.insert(
        0,
        {"commitInfo": {"timestamp": int(_time.time() * 1000),
                        "operation": "WRITE"}},
    )
    # optimistic concurrency: claim the version put-if-absent. Lost
    # races on APPENDS commute — recheck the txn mark (the rival may
    # have committed this very batch) and retry at the next version.
    # A lost race on table CREATION is not retryable (our
    # protocol/metaData decisions are stale): loud error.
    while not _claim_commit(log_dir, version, actions):
        if version == 0:
            raise ConcurrentWriteError(
                f"{table_dir}: another writer created the table "
                "concurrently; re-read and retry the append"
            )
        t2 = DeltaTable(spark, table_dir)
        if txn is not None and t2.txn_version(txn[0]) >= int(txn[1]):
            return t2.latest_version()  # rival committed our batch
        # appends only commute while the table DEFINITION stands: a
        # rival schema / partitioning / mapping change makes our
        # already-written files stale — surface, don't mix layouts
        cur_meta, _, _ = t2._state(None)
        if (
            cur_meta.get("schemaString") != meta0.get("schemaString")
            or cur_meta.get("partitionColumns")
            != meta0.get("partitionColumns")
            or (cur_meta.get("configuration") or {})
            != (meta0.get("configuration") or {})
        ):
            raise ConcurrentWriteError(
                f"{table_dir}: table metadata changed concurrently "
                "with the append; re-read and retry"
            )
        version = t2.latest_version() + 1
    # touch spark to keep the session-arg contract obvious
    assert spark is not None
    return version


def delta_optimize(
    spark: SparkSession,
    table_dir: str,
    target_file_bytes: int = 128 << 20,
    zorder_by: list[str] | None = None,
) -> tuple[int, int, int]:
    """Transactional OPTIMIZE: per partition, bin-pack small files
    into ~``target_file_bytes`` outputs and commit the swap as
    remove+add actions with ``dataChange: false`` (readers of any
    version see identical rows — the Delta OPTIMIZE contract). Files
    carrying DELETION VECTORS are always rewritten with their deleted
    rows materialized away, so OPTIMIZE doubles as DV compaction.

    ``zorder_by=[col, col]`` (logical names) Z-ORDER-clusters each
    partition while compacting: two numeric columns interleave through
    ``functions.zorder2_expr`` (real Morton key, min-max pruning on
    BOTH dimensions); any other arity falls back to hierarchical sort.
    Z-ordering forces a rewrite of every file in the partition.

    The 100 TB physics: continuously-appended tables accumulate
    KB-scale files whose footer/open overhead dominates scans; the
    rewrite is executor work (coalesce per partition — no shuffle
    unless Z-ordering, which needs the range partition), the commit is
    driver metadata. Column-mapped tables rewrite PHYSICAL columns
    byte-for-byte (no unmapping round trip). Returns
    ``(version, files_removed, files_added)``."""
    import math
    import uuid as _uuid

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    t = DeltaTable(spark, table_dir)
    version = t.latest_version() + 1
    meta, _, _ = t._state(None)
    # OPTIMIZE preserves rows (dataChange=false), which appendOnly
    # permits — but unknown writer features still refuse
    _writer_feature_gate(
        t, meta, "delta_optimize", mutates=False, adds_rows=False
    )
    mode, fields = t._mapping(meta)
    logical_parts = meta.get("partitionColumns") or []
    log2phys = {f["name"]: f["physical"] for f in fields}
    part_phys = [log2phys.get(c, c) for c in logical_parts]
    zphys = [log2phys.get(c, c) for c in (zorder_by or [])]
    for c in zorder_by or []:
        if c not in log2phys:
            raise ValueError(f"zorder column {c!r} is not in the schema")
    data_cols = [
        f["physical"] for f in fields if f["name"] not in logical_parts
    ]

    adds = t.data_files(None, None)
    groups: dict[tuple, list[dict]] = {}
    for a in adds:
        pv = tuple(
            (a.get("partitionValues") or {}).get(c) for c in part_phys
        )
        groups.setdefault(pv, []).append(a)

    removes: list[dict] = []
    new_adds: list[dict] = []
    for pv, group in sorted(groups.items(), key=lambda kv: str(kv[0])):
        if zorder_by:
            cands = list(group)
        else:
            cands = [
                a
                for a in group
                if a.get("deletionVector")
                or (a.get("size") or 0) < int(target_file_bytes)
            ]
        has_dv = any(a.get("deletionVector") for a in cands)
        if not cands or (len(cands) < 2 and not has_dv and not zorder_by):
            continue
        paths = [os.path.join(t.path, a["path"]) for a in cands]
        df = spark.read.parquet(*paths)
        if has_dv:
            import pandas as pd

            rows = []
            for a in cands:
                if not a.get("deletionVector"):
                    continue
                p = os.path.abspath(os.path.join(t.path, a["path"]))
                rows.extend(
                    (p, pos)
                    for pos in t._load_dv(a["deletionVector"])
                )
            tagged = df.withColumn(
                "__fp",
                F.regexp_replace(
                    F.col("_metadata.file_path"), "^file:(//)?", ""
                ),
            ).withColumn("__pos", F.col("_metadata.row_index"))
            if rows:
                dv_df = F.broadcast(
                    spark.createDataFrame(
                        pd.DataFrame(
                            rows, columns=["__del_fp", "__del_pos"]
                        )
                    )
                )
                tagged = tagged.join(
                    dv_df,
                    (tagged["__fp"] == dv_df["__del_fp"])
                    & (tagged["__pos"] == dv_df["__del_pos"]),
                    "left_anti",
                )
            df = tagged.drop("__fp", "__pos")
        total = sum(int(a.get("size") or 0) for a in cands)
        n_out = max(1, math.ceil(total / int(target_file_bytes)))
        if zphys:
            if len(zphys) == 2:
                from feature_store_spark.functions import zorder2_expr

                zkey = zorder2_expr(F.col(zphys[0]), F.col(zphys[1]))
            else:
                zkey = F.struct(*[F.col(c) for c in zphys])
            df = df.repartitionByRange(n_out, zkey).sortWithinPartitions(
                zkey
            )
        else:
            df = df.coalesce(n_out)
        if mode == "id":
            # rewritten files must keep their parquet field ids — id-
            # mode readers (per PROTOCOL.md) resolve columns BY id
            id_of_phys = {
                f["physical"]: f["id"]
                for f in fields
                if f["id"] is not None
            }
            df = df.select(
                *[
                    (
                        F.col(c).alias(
                            c,
                            metadata={
                                "parquet.field.id": int(id_of_phys[c])
                            },
                        )
                        if c in id_of_phys
                        else F.col(c)
                    )
                    for c in df.columns
                ]
            )

        staging = os.path.join(
            table_dir, f".optimize-{_uuid.uuid4().hex[:8]}"
        )
        df.write.mode("overwrite").parquet(staging)
        # `pv` holds real values from the log; paths get the hive-
        # escaped form (null -> __HIVE_DEFAULT_PARTITION__ dir)
        segs = [
            f"{hive_escape(c)}={hive_escape(v)}"
            for c, v in zip(part_phys, pv)
        ]
        for name in sorted(os.listdir(staging)):
            if not name.endswith(".parquet"):
                continue
            rel = os.path.join(
                *segs, f"part-{version:05d}-{_uuid.uuid4().hex}.parquet"
            )
            tgt_dir = os.path.join(table_dir, *segs)
            os.makedirs(tgt_dir, exist_ok=True)
            os.replace(
                os.path.join(staging, name),
                os.path.join(table_dir, rel),
            )
            fpath = os.path.join(table_dir, rel)
            md = pq.ParquetFile(fpath).metadata
            mins: dict[str, Any] = {}
            maxs: dict[str, Any] = {}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    st = col.statistics
                    cname = col.path_in_schema
                    if (
                        st is None
                        or not st.has_min_max
                        or cname not in data_cols
                    ):
                        continue
                    mn, mx = _json_stat(st.min), _json_stat(st.max)
                    if mn is None or mx is None:
                        continue
                    mins[cname] = (
                        mn if cname not in mins else min(mins[cname], mn)
                    )
                    maxs[cname] = (
                        mx if cname not in maxs else max(maxs[cname], mx)
                    )
            new_adds.append(
                {
                    "add": {
                        "path": rel,
                        "partitionValues": dict(zip(part_phys, pv)),
                        "size": os.path.getsize(fpath),
                        "modificationTime": 0,
                        "dataChange": False,
                        "stats": json.dumps(
                            {
                                "numRecords": md.num_rows,
                                "minValues": mins,
                                "maxValues": maxs,
                            }
                        ),
                    }
                }
            )
        import shutil as _sh

        _sh.rmtree(staging, ignore_errors=True)
        for a in cands:
            removes.append(
                {
                    "remove": {
                        "path": a["path"],
                        "dataChange": False,
                        "deletionTimestamp": int(time.time() * 1000),
                        "partitionValues": a.get("partitionValues")
                        or {},
                        "size": a.get("size"),
                    }
                }
            )
    if not removes:
        raise ValueError(
            f"{table_dir}: nothing to optimize (every file already "
            f">= {target_file_bytes} bytes, no deletion vectors)"
        )
    import time as _time

    actions = (
        [
            {
                "commitInfo": {
                    "timestamp": int(_time.time() * 1000),
                    "operation": "OPTIMIZE",
                }
            }
        ]
        + removes
        + new_adds
    )
    if not _claim_commit(
        os.path.join(table_dir, "_delta_log"), version, actions
    ):
        raise ConcurrentWriteError(
            f"{table_dir}: version {version} was committed by another "
            "writer while OPTIMIZE ran; re-read and retry"
        )
    return version, len(removes), len(new_adds)


def delta_changes(
    spark: SparkSession,
    table_dir: str,
    from_version: int | None = None,
    to_version: int | None = None,
    between_timestamps: tuple[int, int | None] | None = None,
) -> DataFrame:
    """Row-level CHANGE FEED for ``(from_version, to_version]``,
    derived from the log itself (CDF semantics without requiring the
    writer to emit ``_change_data`` files): every returned row carries
    ``_change_type`` (``insert`` / ``delete``) and
    ``_commit_version``. Per commit, only ``dataChange: true`` actions
    count — OPTIMIZE's remove+add shuffles are invisible, exactly as
    Delta CDF specifies:

    - a NEW path added → its live rows (minus any DV it was born
      with) are inserts;
    - a path removed and not re-added → the rows live at the PREVIOUS
      version (file minus its then-DV) are deletes;
    - a path removed and re-added with a bigger deletion vector (the
      delta_delete_where shape) → exactly the NEWLY-deleted ordinals
      (DV_new − DV_old) are deletes.

    The scan machinery (column unmapping, typed partition literals)
    is shared with ``scan`` via ``_assemble``; position selection is
    a broadcast join on ``_metadata.row_index``.

    Log compaction (VERDICT r8 next #8): a version whose JSON commit
    is gone is RECONSTRUCTED from checkpoint state diffs when that is
    provably exact — state at both v-1 and v must be replayable
    (i.e. checkpoints cover them), and the file-level diff must be
    adds-only, removes-only, and/or DV-growth (the streaming-append
    and delete shapes). A diff with BOTH added and removed paths is
    genuinely ambiguous — an OPTIMIZE (dataChange:false, invisible to
    the feed) is indistinguishable from a rewrite (visible) once the
    commit's dataChange flags are gone — and raises loudly, never a
    guessed feed.

    ``between_timestamps=(from_ms, to_ms)`` is the wall-clock form —
    the same as-of-inclusive resolution as
    ``IcebergTable.changes(between_timestamps=...)`` (r13): the base
    is the version current AT ``from_ms`` (a commit stamped exactly
    at ``from_ms`` is baseline, not feed), the head the version
    current at ``to_ms`` (``None`` = latest). NOTE this is the
    repo-wide as-of convention, deliberately shared with
    ``scan(version=...)`` time travel — Delta Spark's
    ``startingTimestamp`` option instead rounds UP to the next
    commit and includes it; convert with ``version_as_of`` if you
    need that rounding. A ``from_ms`` before the first commit
    refuses (no baseline state); mutually exclusive with the
    version arguments."""
    from pyspark.sql import functions as F

    t = DeltaTable(spark, table_dir)
    if between_timestamps is not None:
        if from_version is not None or to_version is not None:
            raise ValueError(
                "delta_changes: pass either versions or "
                "between_timestamps, not both"
            )
        from_ms, to_ms = between_timestamps
        from_version = t.version_as_of(int(from_ms))
        if to_ms is not None:
            if int(to_ms) < int(from_ms):
                raise ValueError(
                    f"delta_changes: between_timestamps window is "
                    f"inverted ({from_ms} > {to_ms})"
                )
            to_version = t.version_as_of(int(to_ms))
    if from_version is None:
        raise ValueError(
            "delta_changes: from_version (or between_timestamps) "
            "is required"
        )
    if to_version is None:
        to_version = t.latest_version()
    if from_version > to_version:
        raise ValueError("from_version must be <= to_version")
    versions = set(t._commit_versions())

    def _provable(sv: int) -> bool:
        """_state(sv) silently skips missing JSON versions, so a diff
        is only trustworthy when the replay chain is COMPLETE: a
        checkpoint at c <= sv plus every JSON commit in (c, sv]."""
        ck = t._checkpoint_at_or_before(sv)
        lo = (ck[0] if ck else -1) + 1
        return all(x in versions for x in range(lo, sv + 1))

    def _reconstructed_actions(v: int):
        """(commit_adds, commit_removes, all_adds, all_removes) for a
        compacted-away version, from the state diff v-1 → v."""
        if not (_provable(v - 1) and _provable(v)):
            raise ValueError(
                f"{table_dir}: commit {v} is gone (log compacted) and "
                "no checkpoint pair proves the states on both sides; "
                "the change feed for this range is unrecoverable"
            )
        _, prev_adds, _ = t._state(v - 1)
        _, cur_adds, _ = t._state(v)
        prevm = {a["path"]: a for a in prev_adds}
        curm = {a["path"]: a for a in cur_adds}
        added = {p: a for p, a in curm.items() if p not in prevm}
        removed = {
            p: {"path": p, "dataChange": True}
            for p in prevm
            if p not in curm
        }
        if added and removed:
            raise ValueError(
                f"{table_dir}: compacted commit {v} both added and "
                "removed files — an OPTIMIZE (invisible to the feed) "
                "is indistinguishable from a rewrite (visible) without "
                "the commit's dataChange flags; change feed ambiguous"
            )
        def dv_key(add):
            d = add.get("deletionVector")
            if not d:
                return None
            return (
                d.get("pathOrInlineDv"),
                d.get("offset"),
                d.get("sizeInBytes"),
            )

        dv_changed = {
            p: curm[p]
            for p in curm
            if p in prevm and dv_key(curm[p]) != dv_key(prevm[p])
        }
        # a descriptor CHANGE is only reconstructible as a delete
        # feed when the position set grew; a shrink (RESTORE-shaped
        # commit) resurrects rows, which the downstream
        # positions(cur)-positions(prev) diff would render as an
        # EMPTY feed — a guessed answer, violating the provably-
        # exact-or-raise contract (ADVICE r9 #4)
        for p in dv_changed:
            if dv_positions(prevm[p]) - dv_positions(curm[p]):
                raise ValueError(
                    f"{table_dir}: compacted commit {v} shrank the "
                    f"deletion vector of {p} (a RESTORE-shaped "
                    "change); resurrected rows cannot be attributed "
                    "without the commit's own actions — change feed "
                    "for this range is unrecoverable"
                )
        commit_adds = {**added, **dv_changed}
        return (
            commit_adds,
            removed,
            dict(commit_adds),
            list(removed),
        )

    # memoized DV decode (each descriptor is read once across the
    # whole range, not once per version transition)
    _dv_cache: dict[tuple, frozenset] = {}

    def dv_positions(add: dict | None) -> frozenset:
        if not add or not add.get("deletionVector"):
            return frozenset()
        d = add["deletionVector"]
        key = (
            d.get("pathOrInlineDv"),
            d.get("offset"),
            d.get("sizeInBytes"),
        )
        if key not in _dv_cache:
            _dv_cache[key] = frozenset(
                int(p) for p in t._load_dv(d)
            )
        return _dv_cache[key]

    frames: list[DataFrame] = []
    meta_now, _, _ = t._state(to_version)
    # rolling adds-by-path state: ONE base replay, then each commit's
    # own actions advance it — O(commits), not O(commits^2)
    _, base_adds, _ = t._state(from_version)
    state_by_path: dict[str, dict] = {a["path"]: a for a in base_adds}

    def _abs(add: dict) -> str:
        return os.path.abspath(os.path.join(t.path, add["path"]))

    def rows_of(adds_v, version, change, select=None, drop=None):
        """ONE frame for a whole batch of files of one (version,
        change type): the per-file loop would union N single-file
        scans; batching keeps it one multi-file scan per commit per
        change type. ``select``/``drop`` are (abs_path, pos) sets —
        broadcast semi/anti joins on the row ordinal."""
        import pandas as pd

        df = t._assemble(adds_v, meta_now)
        if select:
            pos_df = F.broadcast(
                spark.createDataFrame(
                    pd.DataFrame(
                        sorted(select),
                        columns=["__sel_fp", "__sel_pos"],
                    )
                )
            )
            df = df.join(
                pos_df,
                (df["__fp"] == pos_df["__sel_fp"])
                & (df["__pos"] == pos_df["__sel_pos"]),
                "left_semi",
            )
        if drop:
            del_df = F.broadcast(
                spark.createDataFrame(
                    pd.DataFrame(
                        sorted(drop),
                        columns=["__del_fp", "__del_pos"],
                    )
                )
            )
            df = df.join(
                del_df,
                (df["__fp"] == del_df["__del_fp"])
                & (df["__pos"] == del_df["__del_pos"]),
                "left_anti",
            )
        return df.drop("__fp", "__pos").withColumn(
            "_change_type", F.lit(change)
        ).withColumn("_commit_version", F.lit(int(version)))

    for v in range(from_version + 1, to_version + 1):
        prev_by_path = state_by_path
        commit_adds: dict[str, dict] = {}
        commit_removes: dict[str, dict] = {}
        all_adds: dict[str, dict] = {}
        all_removes: list[str] = []
        if v not in versions:
            (
                commit_adds,
                commit_removes,
                all_adds,
                all_removes,
            ) = _reconstructed_actions(v)
        else:
            with open(
                os.path.join(t.log_dir, f"{v:020d}.json")
            ) as f:
                for line in f:
                    if not line.strip():
                        continue
                    action = json.loads(line)
                    if "add" in action:
                        all_adds[action["add"]["path"]] = action["add"]
                        if action["add"].get("dataChange", True):
                            commit_adds[action["add"]["path"]] = action[
                                "add"
                            ]
                    elif "remove" in action:
                        all_removes.append(action["remove"]["path"])
                        if action["remove"].get("dataChange", True):
                            commit_removes[
                                action["remove"]["path"]
                            ] = action["remove"]
        inserts: list[dict] = []
        ins_drop: set = set()
        dv_prev_adds: list[dict] = []
        dv_select: set = set()
        res_adds: list[dict] = []
        res_select: set = set()
        removed_adds: list[dict] = []
        rem_drop: set = set()
        for path, add in commit_adds.items():
            prev = prev_by_path.get(path)
            if prev is None:
                inserts.append(add)
                ins_drop |= {(_abs(add), p) for p in dv_positions(add)}
            else:
                new_dead = dv_positions(add) - dv_positions(prev)
                if new_dead:
                    dv_prev_adds.append(prev)
                    dv_select |= {(_abs(prev), p) for p in new_dead}
                # a SHRUNK deletion vector (the RESTORE shape) means
                # rows came back to life — the feed must carry them
                # as inserts, not silently show an empty commit
                # (pre-r11 this case dropped the resurrected rows;
                # only the compacted-log path refused)
                resurrected = dv_positions(prev) - dv_positions(add)
                if resurrected:
                    res_adds.append(add)
                    res_select |= {
                        (_abs(add), p) for p in resurrected
                    }
        for path in commit_removes:
            if path in commit_adds:
                continue  # same-commit re-add: handled as a DV delta
            prev = prev_by_path.get(path)
            if prev is not None:
                removed_adds.append(prev)
                rem_drop |= {
                    (_abs(prev), p) for p in dv_positions(prev)
                }
        if inserts:
            frames.append(rows_of(inserts, v, "insert", drop=ins_drop))
        if res_adds:
            frames.append(
                rows_of(res_adds, v, "insert", select=res_select)
            )
        if dv_prev_adds:
            frames.append(
                rows_of(dv_prev_adds, v, "delete", select=dv_select)
            )
        if removed_adds:
            frames.append(
                rows_of(removed_adds, v, "delete", drop=rem_drop)
            )
        # advance the rolling state with ALL of this commit's actions
        # (OPTIMIZE's dataChange:false shuffles included — they are
        # invisible to the FEED but very much part of the state).
        # In place: prev_by_path is dead after this point in the
        # iteration (the frames hold the add dicts, not the state
        # dict), so no per-version copy of a possibly-huge file map
        for path in all_removes:
            state_by_path.pop(path, None)
        state_by_path.update(all_adds)
    if not frames:
        base = t.scan(version=to_version).limit(0)
        return base.withColumn(
            "_change_type", F.lit("insert")
        ).withColumn("_commit_version", F.lit(0)).limit(0)
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out


def delta_vacuum(
    spark: SparkSession,
    table_dir: str,
    dry_run: bool = False,
    retention_ms: int | None = None,
) -> list[str]:
    """VACUUM: delete every data/DV file under the table that the
    CURRENT version no longer references — the garbage OPTIMIZE,
    DELETE, and overwrites leave behind — EXCEPT files still inside
    the retention grace period (Delta proper's rule): a tombstoned
    file whose ``deletionTimestamp`` is younger than the retention,
    or an untracked orphan whose mtime is (a concurrent writer's
    in-flight data files must not look like garbage). Time travel to
    versions whose files are vacuumed stops working, exactly as in
    Delta proper. Returns the deleted (or, with ``dry_run``,
    deletable) paths relative to the table root.

    ``retention_ms`` defaults to the table property
    ``delta.deletedFileRetentionDuration`` when set, else 0 — the
    pre-r9 exporter-grade behavior (no concurrent readers to grace)
    stays the default for tables that never declared a retention.

    Driver-side metadata + unlink only: referenced-set construction
    is one log replay, candidate listing is one directory walk."""
    from feature_store_spark.sources.roaring import dv_file_path

    t = DeltaTable(spark, table_dir)
    meta, adds, _ = t._state(None)
    if retention_ms is None:
        retention_ms = _parse_interval_ms(
            (meta.get("configuration") or {}).get(
                "delta.deletedFileRetentionDuration"
            )
        ) or 0
    now_ms = int(time.time() * 1000)
    cutoff = now_ms - int(retention_ms)
    tomb_ts = {
        os.path.normpath(r["path"]): int(r.get("deletionTimestamp") or 0)
        for r in t.tombstones()
    }
    referenced: set[str] = set()
    for a in adds:
        referenced.add(os.path.normpath(a["path"]))
        dv = a.get("deletionVector")
        if dv and dv.get("storageType") in ("u", "p"):
            # SAME resolver the scan-time loader uses — a live DV,
            # relative or absolute, must never look like garbage
            referenced.add(
                os.path.normpath(
                    os.path.relpath(
                        dv_file_path(t.path, dv), t.path
                    )
                )
            )
    doomed: list[str] = []
    for root, dirs, files in os.walk(t.path):
        dirs[:] = [
            d for d in dirs
            if d != "_delta_log" and not d.startswith(".")
        ]
        for name in files:
            if not (
                name.endswith(".parquet")
                or (name.startswith("deletion_vector_")
                    and name.endswith(".bin"))
            ):
                continue
            rel = os.path.normpath(
                os.path.relpath(os.path.join(root, name), t.path)
            )
            if rel in referenced:
                continue
            if retention_ms > 0:
                ts = tomb_ts.get(rel)
                if ts is None:
                    # untracked orphan: grace by mtime (a concurrent
                    # writer's staged-but-uncommitted file)
                    ts = int(
                        os.path.getmtime(os.path.join(t.path, rel)) * 1000
                    )
                if ts > cutoff:
                    continue  # inside the retention window
            doomed.append(rel)
    if not dry_run:
        for rel in doomed:
            os.remove(os.path.join(t.path, rel))
    return sorted(doomed)


def delta_checkpoint(spark: SparkSession, table_dir: str) -> int:
    """Write a classic single-file parquet CHECKPOINT of the table's
    latest state (``%020d.checkpoint.parquet`` + ``_last_checkpoint``)
    so replay cost stops growing with commit count — the log-compaction
    move every long-running Delta sink needs. Spec-shaped columns:
    ``partitionValues``/``configuration`` are parquet MAPs, protocol
    feature lists are arrays, add actions keep their stats JSON and
    deletionVector descriptor, and un-expired remove TOMBSTONES are
    carried (spec retention window — ADVICE r8). Returns the
    checkpointed version."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = DeltaTable(spark, table_dir)
    version = t.latest_version()
    meta, adds, txns = t._state(version)
    protocol = t._protocol(version)

    dv_t = pa.struct(
        [
            ("storageType", pa.string()),
            ("pathOrInlineDv", pa.string()),
            ("offset", pa.int32()),
            ("sizeInBytes", pa.int32()),
            ("cardinality", pa.int64()),
        ]
    )
    schema = pa.schema(
        [
            (
                "protocol",
                pa.struct(
                    [
                        ("minReaderVersion", pa.int32()),
                        ("minWriterVersion", pa.int32()),
                        ("readerFeatures", pa.list_(pa.string())),
                        ("writerFeatures", pa.list_(pa.string())),
                    ]
                ),
            ),
            (
                "metaData",
                pa.struct(
                    [
                        ("id", pa.string()),
                        (
                            "format",
                            pa.struct([("provider", pa.string())]),
                        ),
                        ("schemaString", pa.string()),
                        ("partitionColumns", pa.list_(pa.string())),
                        (
                            "configuration",
                            pa.map_(pa.string(), pa.string()),
                        ),
                    ]
                ),
            ),
            (
                "add",
                pa.struct(
                    [
                        ("path", pa.string()),
                        (
                            "partitionValues",
                            pa.map_(pa.string(), pa.string()),
                        ),
                        ("size", pa.int64()),
                        ("modificationTime", pa.int64()),
                        ("dataChange", pa.bool_()),
                        ("stats", pa.string()),
                        ("deletionVector", dv_t),
                    ]
                ),
            ),
            (
                "remove",
                pa.struct(
                    [
                        ("path", pa.string()),
                        ("deletionTimestamp", pa.int64()),
                        ("dataChange", pa.bool_()),
                        (
                            "partitionValues",
                            pa.map_(pa.string(), pa.string()),
                        ),
                        ("size", pa.int64()),
                    ]
                ),
            ),
            (
                "txn",
                pa.struct(
                    [("appId", pa.string()), ("version", pa.int64())]
                ),
            ),
        ]
    )
    rows: list[dict] = [
        {
            "protocol": {
                "minReaderVersion": protocol.get("minReaderVersion", 1),
                "minWriterVersion": protocol.get("minWriterVersion", 2),
                "readerFeatures": protocol.get("readerFeatures"),
                "writerFeatures": protocol.get("writerFeatures"),
            }
        },
        {
            "metaData": {
                "id": meta["id"],
                "format": {"provider": "parquet"},
                "schemaString": meta["schemaString"],
                "partitionColumns": meta.get("partitionColumns") or [],
                "configuration": list(
                    (meta.get("configuration") or {}).items()
                ),
            }
        },
    ]
    for app_id, v in sorted(txns.items()):
        rows.append({"txn": {"appId": app_id, "version": int(v)}})
    for a in adds:
        dv = a.get("deletionVector")
        rows.append(
            {
                "add": {
                    "path": a["path"],
                    "partitionValues": list(
                        (a.get("partitionValues") or {}).items()
                    ),
                    "size": a.get("size"),
                    "modificationTime": a.get("modificationTime") or 0,
                    "dataChange": False,
                    "stats": a.get("stats"),
                    "deletionVector": (
                        {
                            "storageType": dv["storageType"],
                            "pathOrInlineDv": dv["pathOrInlineDv"],
                            "offset": dv.get("offset"),
                            "sizeInBytes": int(dv["sizeInBytes"]),
                            "cardinality": int(dv["cardinality"]),
                        }
                        if dv
                        else None
                    ),
                }
            }
        )
    # spec: a checkpoint must carry UN-EXPIRED remove tombstones
    # (delta.deletedFileRetentionDuration, default 1 week) so readers
    # and VACUUM tooling replaying from it keep tombstone visibility.
    # Unstamped tombstones (deletionTimestamp missing/0, legacy logs)
    # are KEPT — dropping is only licensed by proven expiry.
    retention_ms = _parse_interval_ms(
        (meta.get("configuration") or {}).get(
            "delta.deletedFileRetentionDuration"
        )
    )
    if retention_ms is None:
        retention_ms = 7 * 24 * 3600 * 1000
    cutoff = int(time.time() * 1000) - retention_ms
    for rem in t.tombstones(version):
        ts = int(rem.get("deletionTimestamp") or 0)
        if 0 < ts < cutoff:
            continue  # provably expired
        rows.append(
            {
                "remove": {
                    "path": rem["path"],
                    "deletionTimestamp": ts,
                    "dataChange": bool(rem.get("dataChange", True)),
                    "partitionValues": list(
                        (rem.get("partitionValues") or {}).items()
                    ),
                    "size": rem.get("size"),
                }
            }
        )
    log_dir = os.path.join(table_dir, "_delta_log")
    ck = os.path.join(log_dir, f"{version:020d}.checkpoint.parquet")
    tmp = ck + ".tmp"
    pq.write_table(pa.Table.from_pylist(rows, schema=schema), tmp)
    os.replace(tmp, ck)
    with open(os.path.join(log_dir, "_last_checkpoint"), "w") as f:
        json.dump({"version": version, "size": len(rows)}, f)
    return version


def delta_append_sink(
    table_dir: str,
    app_id: str,
    partition_cols: list[str] | None = None,
    checkpoint_every: int | None = 10,
):
    """foreachBatch body: exactly-once micro-batch appends into a
    Delta table via the protocol's txn action — crash after commit +
    checkpoint loss redelivers the batch, and the recorded (app_id,
    batch_id) high-water mark turns the redelivery into a no-op.

    ``checkpoint_every=N`` writes a parquet checkpoint after every
    Nth commit (the standard Delta cadence), so a long-running stream
    does not make every future reader replay an unbounded JSON log."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        v = delta_append(
            batch_df,
            table_dir,
            partition_cols=partition_cols,
            txn=(app_id, int(batch_id)),
        )
        if checkpoint_every and v > 0 and v % int(checkpoint_every) == 0:
            delta_checkpoint(batch_df.sparkSession, table_dir)

    return sink


def delta_upsert_sink(
    table_dir: str,
    app_id: str,
    keys: list[str],
    op_col: str | None = None,
    latest_by: str | None = None,
    checkpoint_every: int | None = 10,
):
    """foreachBatch body: exactly-once micro-batch CDC MERGE into a
    Delta table — each batch lands through :func:`delta_upsert`
    (latest-wins by key, optional ``op_col`` delete rows), carrying
    the protocol's txn action so a redelivered batch after a crash +
    checkpoint loss is a no-op. The streaming twin of the Flink
    Iceberg CDC sink, in the Delta format.

    ``latest_by``: micro-batch boundaries are arbitrary, so one batch
    can legally carry several versions of a key (delta_upsert would
    refuse). Naming the CDC order column (LSN / source timestamp)
    keeps only each key's latest row per batch — and REFUSES on a
    tie at the top (two rows claiming the same latest position is a
    feed bug; picking one silently would be nondeterministic
    replay)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        b = _latest_per_key(
            batch_df, keys, latest_by, batch_id, "delta_upsert_sink"
        )
        v, _n = delta_upsert(
            b,
            table_dir,
            keys=list(keys),
            txn=(app_id, int(batch_id)),
            op_col=op_col,
        )
        if checkpoint_every and v > 0 and v % int(checkpoint_every) == 0:
            delta_checkpoint(batch_df.sparkSession, table_dir)

    return sink


def _latest_per_key(
    b: DataFrame,
    keys: list[str],
    latest_by: str | None,
    batch_id: int,
    label: str,
) -> DataFrame:
    """Keep each key's latest row per micro-batch by the CDC order
    column (micro-batch boundaries are arbitrary, so one batch can
    legally carry several versions of a key); REFUSES on a tie at
    the top — two rows claiming the same latest position is a feed
    bug, and picking one silently would be nondeterministic replay.
    Shared by delta_upsert_sink and delta_merge_sink."""
    from pyspark.sql import Window, functions as F

    if latest_by is None:
        return b
    w = Window.partitionBy(*list(keys)).orderBy(
        F.col(latest_by).desc()
    )
    ranked = (
        b.withColumn("__rn", F.row_number().over(w))
        .withColumn("__rk", F.rank().over(w))
    )
    tie = (
        ranked.filter((F.col("__rn") == 2) & (F.col("__rk") == 1))
        .limit(1)
        .collect()
    )
    if tie:
        kv = {k: tie[0][k] for k in keys}
        raise ValueError(
            f"{label}: key {kv} has two rows tied on "
            f"{latest_by!r} in batch {batch_id} — the latest row is "
            "ambiguous; fix the feed's order column"
        )
    return ranked.filter(F.col("__rn") == 1).drop("__rn", "__rk")


def delta_merge_sink(
    table_dir: str,
    app_id: str,
    keys: list[str],
    when_matched: list[dict] | None = None,
    insert: bool = True,
    insert_condition: str | None = None,
    when_not_matched_by_source: list[dict] | None = None,
    evolve: bool = False,
    latest_by: str | None = None,
    checkpoint_every: int | None = 10,
):
    """foreachBatch body: exactly-once micro-batch CONDITIONAL MERGE
    — each batch lands through :func:`delta_merge` (arm-ordered
    conditional / partial-column updates, deletes, conditional
    inserts, optional by-source arms and schema evolution) carrying
    the txn action, so a redelivered batch after a crash + checkpoint
    loss is a no-op. The streaming twin of delta_upsert_sink for
    feeds whose semantics don't fit full-row replacement. ``latest_by``
    behaves as in :func:`delta_upsert_sink`. A quiet micro-batch
    (nothing fired, nothing staged) still records its txn watermark
    in one small commit — exactly-once bookkeeping must advance even
    when the data doesn't.

    An EMPTY micro-batch disarms the by-source arms for that batch:
    in a stream, an empty batch is a scheduling artifact, not an
    upstream statement that the snapshot is empty — letting an
    unconditional ``WHEN NOT MATCHED BY SOURCE THEN DELETE`` see it
    would silently wipe the table on an idle trigger. A genuinely
    empty snapshot sync belongs in a direct :func:`delta_merge`
    call, where passing an empty frame is an explicit decision."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        b = _latest_per_key(
            batch_df, keys, latest_by, batch_id, "delta_merge_sink"
        )
        by_src = when_not_matched_by_source
        if by_src and b.isEmpty():
            by_src = None
        v, _nu, _nd, _ni = delta_merge(
            b,
            table_dir,
            keys=list(keys),
            when_matched=when_matched,
            insert=insert,
            insert_condition=insert_condition,
            when_not_matched_by_source=by_src,
            evolve=evolve,
            txn=(app_id, int(batch_id)),
        )
        if checkpoint_every and v > 0 and v % int(checkpoint_every) == 0:
            delta_checkpoint(batch_df.sparkSession, table_dir)

    return sink


def delta_delete_where(
    spark: SparkSession,
    table_dir: str,
    filters: list[tuple],
) -> tuple[int, int]:
    """Merge-on-read ``DELETE WHERE`` via DELETION VECTORS on a Delta
    table: no data file is rewritten — each affected file's matching
    row ordinals are recorded as a RoaringBitmapArray in ONE
    ``deletion_vector_<uuid>.bin`` file (PROTOCOL.md format, built by
    sources/roaring.py), and the commit re-adds the file with the DV
    descriptor attached (storageType ``u``). The right physics at
    100 TB, exactly like iceberg_delete_where: a delete touches a
    sliver of a huge table and rewriting parquet for it is wasted I/O.

    Files that already carry a DV get the union of old + new
    positions (bitmaps merge; the old DV file becomes garbage for
    VACUUM). The commit upgrades the protocol to reader 3 / writer 7
    with the required feature lists. Returns
    ``(commit_version, rows_newly_deleted)``.

    Matching rows' ordinals ARE collected to the driver — bounded by
    the delete's own size (the sliver), not the table; a delete big
    enough to strain the driver is a job for copy-on-write rewrite,
    not DVs."""
    import uuid as _uuid

    from pyspark.sql import functions as F

    from feature_store_spark.sources.roaring import (
        write_dv_file,
        z85_encode,
    )

    t = DeltaTable(spark, table_dir)
    version = t.latest_version() + 1
    meta, _, _ = t._state(None)
    _writer_feature_gate(
        t, meta, "delta_delete_where", mutates=True, adds_rows=False
    )
    mode, _fields = t._mapping(meta)
    adds = t.data_files(None, filters)
    if not adds:
        raise ValueError(
            f"{table_dir}: DELETE WHERE matched no files — nothing "
            "committed"
        )
    df = t._assemble(adds, meta)
    for f in filters:
        df = df.filter(_Filter(*f).sql())
    hits = df.select("__fp", "__pos").toPandas()
    by_file: dict[str, set[int]] = {}
    for fp, pos in zip(hits["__fp"], hits["__pos"]):
        by_file.setdefault(fp, set()).add(int(pos))

    affected: list[tuple[dict, list[int], int]] = []
    n_new = 0
    for add in adds:
        abs_p = os.path.abspath(os.path.join(t.path, add["path"]))
        new_hits = by_file.get(abs_p)
        if not new_hits:
            continue
        old = (
            set(t._load_dv(add["deletionVector"]))
            if add.get("deletionVector")
            else set()
        )
        merged = sorted(old | new_hits)
        n_new += len(merged) - len(old)
        if len(merged) == len(old):
            continue  # every matched row was already deleted
        affected.append((add, merged, len(merged)))
    if not affected:
        raise ValueError(
            f"{table_dir}: DELETE WHERE matched no live rows — "
            "nothing committed (the table version is unchanged)"
        )

    dv_uuid = _uuid.uuid4()
    dv_path = os.path.join(table_dir, f"deletion_vector_{dv_uuid}.bin")
    descs = write_dv_file(dv_path, [m for _, m, _ in affected])

    import time as _time

    # UNION with the table's existing protocol: replacing it would
    # silently drop features an external writer declared (the log
    # replay takes the LAST protocol action)
    prev = t._protocol(None)
    r_feats = {"deletionVectors"} | set(prev.get("readerFeatures") or [])
    w_feats = {"deletionVectors"} | set(prev.get("writerFeatures") or [])
    if mode != "none":
        r_feats.add("columnMapping")
        w_feats.add("columnMapping")
    actions: list[dict] = [
        {"commitInfo": {"timestamp": int(_time.time() * 1000),
                        "operation": "DELETE"}},
        {
            "protocol": {
                "minReaderVersion": max(
                    3, int(prev.get("minReaderVersion") or 1)
                ),
                "minWriterVersion": max(
                    7, int(prev.get("minWriterVersion") or 1)
                ),
                "readerFeatures": sorted(r_feats),
                "writerFeatures": sorted(w_feats),
            }
        }
    ]
    for (add, _m, card), (off, sz, _c) in zip(affected, descs):
        actions.append(
            {
                "remove": {
                    "path": add["path"],
                    "dataChange": True,
                    "deletionTimestamp": int(_time.time() * 1000),
                    "partitionValues": add.get("partitionValues") or {},
                    "size": add.get("size"),
                }
            }
        )
        new_add = dict(add)
        new_add["dataChange"] = True
        new_add["deletionVector"] = {
            "storageType": "u",
            "pathOrInlineDv": z85_encode(dv_uuid.bytes),
            "offset": off,
            "sizeInBytes": sz,
            "cardinality": card,
        }
        actions.append({"add": new_add})
    if not _claim_commit(
        os.path.join(table_dir, "_delta_log"), version, actions
    ):
        raise ConcurrentWriteError(
            f"{table_dir}: version {version} was committed by another "
            "writer while DELETE ran; re-read and retry"
        )
    return version, n_new


def delta_upsert(
    df: DataFrame,
    table_dir: str,
    keys: list[str],
    partition_cols: list[str] | None = None,
    txn: tuple[str, int] | None = None,
    op_col: str | None = None,
) -> tuple[int, int]:
    """Keyed MERGE (upsert) as ONE Delta commit — the CDC sink verb,
    mirroring ``iceberg_upsert``'s one-snapshot semantics (reference
    CDC shape: every older version of each key dies, the new rows
    land). Deletion-vector assisted merge-on-read: live target rows
    whose key tuple appears in ``df`` are marked dead via DVs on
    their existing files (no data file rewritten — the right physics
    at 100 TB where a CDC batch touches a sliver of a huge table),
    and ``df``'s rows land as new data files with footer stats, all
    under one ``MERGE`` commit. Equivalent to
    ``WHEN MATCHED THEN UPDATE SET * / WHEN NOT MATCHED THEN INSERT
    *`` with full-row replacement.

    Scale shape: the match probe broadcasts ``df``'s distinct key
    tuples against the target scan (the CDC batch is the small side),
    and the target scan is pruned first by per-key min/max
    data-skipping over the batch's key range — only candidate files
    are read. Matched (file, ordinal) pairs are collected to the
    driver, bounded by the batch's own match count (the sliver), not
    the table — a merge big enough to strain that belongs in a
    copy-on-write rewrite instead.

    Refusals: duplicate key tuples in ``df`` (Delta MERGE semantics —
    multiple source rows matching one target row is ambiguous),
    schema drift (enforcement, same as append; MERGE does not
    evolve), lost commit race (MERGE does not commute — rival may
    have touched the same keys).

    ``txn=(app_id, version)`` gives exactly-once redelivery no-op,
    same handshake as :func:`delta_append`. First call on a missing
    table degenerates to CREATE+INSERT via ``delta_append``.

    ``op_col`` turns the batch into a full CDC feed (the Debezium /
    change-stream shape): rows whose ``op_col`` value is ``d`` /
    ``delete`` (case-insensitive) only KILL their key table-wide —
    nothing is re-inserted for them — while every other row upserts
    as usual; the op column itself is dropped before writing. Still
    ONE commit (``WHEN MATCHED AND op='d' THEN DELETE`` composed
    with the update/insert arms). A key carried by BOTH a delete row
    and a non-delete row in one batch refuses (ambiguous, same rule
    as duplicate keys).

    Returns ``(commit_version, target_rows_replaced)`` — replaced
    counts rows killed by updates AND deletes.

    Conditional arms (``WHEN MATCHED AND <pred> THEN UPDATE SET
    <subset>``) live in :func:`delta_merge` — this verb is the
    full-row replacement fast path."""
    import time as _time

    from pyspark.sql import functions as F

    if not keys:
        raise ValueError("delta_upsert: keys must be non-empty")
    spark = df.sparkSession
    log_dir = os.path.join(table_dir, "_delta_log")
    # checkpoint files count as table existence too (review r11): a
    # log whose JSON prefix was compacted away is still a table, and
    # treating it as CREATE would silently downgrade the MERGE to a
    # plain append through the delta_append fallback below
    has_table = os.path.isdir(log_dir) and any(
        (n.endswith(".json") and n[:-5].isdigit())
        or re.match(r"\d{20}\.checkpoint(\.|$)", n)
        for n in os.listdir(log_dir)
    )
    missing_keys = [k for k in keys if k not in df.columns]
    if missing_keys:
        raise ValueError(
            f"delta_upsert: key column(s) {missing_keys} not in the "
            f"source frame (columns: {df.columns})"
        )
    if op_col is not None:
        if op_col not in df.columns:
            raise ValueError(
                f"delta_upsert: op_col {op_col!r} not in the source "
                f"frame (columns: {df.columns})"
            )
        if op_col in keys:
            raise ValueError(
                f"delta_upsert: op_col {op_col!r} cannot be a key"
            )
        is_del = F.coalesce(
            F.lower(F.col(op_col).cast("string")).isin("d", "delete"),
            F.lit(False),
        )
        live = df.filter(~is_del).drop(op_col)
        is_live = ~is_del
    else:
        live = df
        is_live = F.lit(True)
    # materialize the CDC batch ONCE (batch-bounded): the verb
    # otherwise re-evaluates the caller's lineage per consumer — the
    # batch aggregate below, the broadcast key set, the generated-
    # column / invariant / constraint enforcement jobs and the
    # staging write each re-ran the full upstream plan (guide §5).
    # Unpersisted on every return path; error paths surface to a
    # caller whose session is about to see the raise.
    df = df.localCheckpoint(eager=True)
    if op_col is not None:
        live = df.filter(~is_del).drop(op_col)
    else:
        live = df
    # ONE aggregate over the CDC batch (the small side) answers
    # everything the verb needs before touching the table: the
    # duplicate-key refusal (which row wins the UPDATE is undefined —
    # Delta's MERGE raises exactly this, and a key carried by both a
    # delete row and an upsert row is the same ambiguity), batch
    # emptiness, live-row count (does anything stage?) and the
    # per-key min/max bounds the file-pruning probe wants. Folding
    # these into one job removes two driver round-trips per
    # micro-batch vs the r12 shape (VERDICT r12 next #3 / wrong #2).
    kb = (
        df.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(is_live.cast("long")).alias("__nl"),
        )
        .agg(
            F.max("__n").alias("__maxn"),
            F.sum("__nl").alias("__nlive"),
            F.count(F.lit(1)).alias("__nkeys"),
            *[F.min(k).alias(f"__lo_{i}") for i, k in enumerate(keys)],
            *[F.max(k).alias(f"__hi_{i}") for i, k in enumerate(keys)],
        )
        .first()
    )
    if (kb["__maxn"] or 0) > 1:
        # error path only: one more job to name an offending key
        dup = (
            df.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > 1)
            .limit(1)
            .collect()
        )
        kv = {k: dup[0][k] for k in keys}
        df.unpersist()
        raise ValueError(
            f"delta_upsert: source has multiple rows for key {kv} — "
            "MERGE cannot decide which one wins; de-duplicate the "
            "batch first (e.g. latest-by-timestamp per key)"
        )
    src_nkeys = int(kb["__nkeys"] or 0)
    n_live = int(kb["__nlive"] or 0)
    if not has_table:
        try:
            v = delta_append(
                live, table_dir, partition_cols=partition_cols, txn=txn
            )
        finally:
            df.unpersist()
        return v, 0

    t = DeltaTable(spark, table_dir)
    if txn is not None:
        app_id, txn_v = txn
        if t.txn_version(app_id) >= int(txn_v):
            df.unpersist()
            return t.latest_version(), 0  # redelivered batch: no-op
    version = t.latest_version() + 1
    meta, _, _ = t._state(None)
    # write-side protocol gate: an upsert rewrites existing rows, so
    # append-only tables refuse; generated columns are computed/
    # verified and invariants + CHECK constraints enforced on the
    # rows being landed (only when any are declared). The upsert
    # lands COMPLETE replacement rows, so full-row generation
    # semantics hold: absent generated columns are recomputed from
    # the incoming row.
    up_constraints = _writer_feature_gate(
        t, meta, "delta_upsert", mutates=True, full_rows=True
    )
    up_gens, up_invs = _generation_rules(meta, table_dir)
    # ONE fused rule aggregate, observed on the staging write (r14):
    # the eager per-family passes each cost one extra job per
    # micro-batch; an empty live frame stages nothing and no rows
    # means no violations, so skipping the check there is equivalent
    live, up_gen_checks = _compute_generated_columns(live, up_gens)
    up_check_exprs, up_check_validate = _deferred_rule_checks(
        up_gen_checks, up_invs, up_constraints, table_dir, "delta_upsert"
    )
    up_post_validate = None
    if up_check_exprs:
        from pyspark.sql import Observation

        up_obs = Observation()
        live = live.observe(up_obs, *up_check_exprs)
        up_post_validate = (
            lambda: up_check_validate(up_obs.get)  # noqa: E731
        )
    mode, map_fields = t._mapping(meta)
    tbl_parts = meta.get("partitionColumns") or []
    if partition_cols is not None and list(partition_cols) != list(
        tbl_parts
    ):
        raise ValueError(
            f"{table_dir}: table is partitioned by {tbl_parts}; "
            f"upsert passed partition_cols={list(partition_cols)}"
        )
    _enforce_merge_schema(table_dir, meta, live, keys)

    # ---- match probe: which live target rows' keys appear in df ----
    # data-skipping first: prune candidate files by the batch's
    # per-key min/max range (footer stats ride the add actions, and
    # the bounds were folded into the batch aggregate above), so a
    # narrow CDC batch over a clustered table reads a sliver. An
    # EMPTY batch probes nothing — no reason to enumerate files.
    filters: list[tuple] = []
    for i, k in enumerate(keys):
        lo, hi = kb[f"__lo_{i}"], kb[f"__hi_{i}"]
        if lo is not None and hi is not None and not isinstance(
            lo, (bytes, bytearray)
        ):
            filters.extend([(k, ">=", lo), (k, "<=", hi)])
    adds = (
        t.data_files(None, filters or None) if src_nkeys else []
    )
    n_replaced = 0
    affected: list[tuple[dict, list[int], int]] = []
    if adds:
        asm = t._assemble(adds, meta)
        src_keys = df.select(*keys).distinct()
        hits = (
            asm.join(F.broadcast(src_keys), on=list(keys), how="leftsemi")
            .select("__fp", "__pos")
            .toPandas()
        )
        by_file: dict[str, set[int]] = {}
        for fp, pos in zip(hits["__fp"], hits["__pos"]):
            by_file.setdefault(fp, set()).add(int(pos))
        for add in adds:
            abs_p = os.path.abspath(os.path.join(t.path, add["path"]))
            new_hits = by_file.get(abs_p)
            if not new_hits:
                continue
            old = (
                set(t._load_dv(add["deletionVector"]))
                if add.get("deletionVector")
                else set()
            )
            merged = sorted(old | new_hits)
            if len(merged) == len(old):
                continue  # every matched row already dead
            n_replaced += len(merged) - len(old)
            affected.append((add, merged, len(merged)))

    actions: list[dict] = [
        {
            "commitInfo": {
                "timestamp": int(_time.time() * 1000),
                "operation": "MERGE",
            }
        }
    ]
    if affected:
        actions.extend(_dv_merge_actions(t, table_dir, affected, mode))

    # ---- new data files: every LIVE source row lands (matched
    # keys' replacements AND brand-new keys; op_col deletes
    # contribute nothing here), mapping-aware ----
    phys_of = {f["name"]: f["physical"] for f in map_fields}
    fid_of = {f["name"]: f["id"] for f in map_fields}
    wdf = live
    part_phys = list(tbl_parts)
    if mode != "none":
        wdf = live.select(
            *[
                F.col(c).alias(
                    phys_of[c],
                    metadata={"parquet.field.id": int(fid_of[c])},
                )
                for c in live.columns
            ]
        )
        part_phys = [phys_of[c] for c in tbl_parts]
    data_cols = [
        phys_of.get(f.name, f.name)
        for f in live.schema.fields
        if f.name not in tbl_parts
    ]
    if n_live > 0:
        # an empty LIVE frame stages nothing, whatever produced it —
        # a pure-delete CDC batch commits DVs only, and an empty
        # upsert batch (a quiet micro-batch through delta_upsert_sink)
        # must not land a junk zero-row data file (advice r11). The
        # live count rides the batch aggregate — no isEmpty() job
        # (VERDICT r12 wrong #2: that unconditional round-trip was
        # the one this verb gained in r12).
        actions.extend(
            _stage_add_actions(
                wdf,
                table_dir,
                version,
                part_phys,
                data_cols,
                post_write_validate=up_post_validate,
            )
        )
    df.unpersist()
    if len(actions) == 1 and txn is None:
        # nothing matched, nothing to insert, no txn watermark to
        # record: committing would churn the log with a pure
        # commitInfo MERGE every quiet micro-batch (advice r11)
        return t.latest_version(), 0
    if txn is not None:
        actions.append(
            {
                "txn": {
                    "appId": txn[0],
                    "version": int(txn[1]),
                    "lastUpdated": 0,
                }
            }
        )
    # MERGE does not commute: a rival commit may have added files
    # carrying our keys or re-DV'd the files we re-add — loud error,
    # same contract as DELETE WHERE
    if not _claim_commit(log_dir, version, actions):
        raise ConcurrentWriteError(
            f"{table_dir}: version {version} was committed by another "
            "writer while MERGE ran; re-read and retry"
        )
    return version, n_replaced


def _enforce_merge_schema(
    table_dir: str,
    meta: dict,
    src: DataFrame,
    keys: list[str],
    allow_new: bool = False,
) -> list[dict]:
    """Schema ENFORCEMENT for merge verbs: silently narrowing or
    widening under a merge would leave half the table's files on a
    different schema with no metaData record. With ``allow_new``
    (delta_merge's ``evolve=True``), source columns UNKNOWN to the
    table are returned (spark-schema field dicts, source order) for
    the caller to commit as schema evolution; type changes and
    missing table columns always refuse."""
    cur_fields = json.loads(meta["schemaString"])["fields"]
    cur_types = {f["name"]: f["type"] for f in cur_fields}
    src_fields = json.loads(src.schema.json())["fields"]
    new_types = {f["name"]: f["type"] for f in src_fields}
    mismatched = sorted(
        n
        for n in new_types
        if n in cur_types
        and _norm_type(new_types[n]) != _norm_type(cur_types[n])
    )
    absent = sorted(n for n in cur_types if n not in new_types)
    unknown = sorted(n for n in new_types if n not in cur_types)
    if mismatched or absent or (unknown and not allow_new):
        raise ValueError(
            f"{table_dir}: merge source schema deviates from the "
            f"table (type changes: {mismatched}, missing: {absent}, "
            f"unknown: {unknown}) — MERGE enforces the schema; "
            "evolve via delta_merge(evolve=True) or "
            "delta_append(merge_schema=True)"
        )
    bad_keys = [k for k in keys if k not in cur_types]
    if bad_keys:
        raise ValueError(
            f"{table_dir}: key column(s) {bad_keys} not in the table "
            f"schema"
        )
    return [f for f in src_fields if f["name"] not in cur_types]


def _dv_merge_actions(
    t: DeltaTable,
    table_dir: str,
    affected: list[tuple[dict, list[int], int]],
    mode: str,
) -> list[dict]:
    """Mint ONE deletion-vector file for the merge's kill set and
    return the protocol-upgrade + remove/re-add actions. ``affected``
    is ``(add_action, merged_sorted_positions, cardinality)`` per
    touched file (positions = old DV ∪ new kills). Shared by
    delta_upsert and delta_merge so both verbs commit byte-identical
    DV shapes."""
    import time as _time
    import uuid as _uuid

    from feature_store_spark.sources.roaring import (
        write_dv_file,
        z85_encode,
    )

    actions: list[dict] = []
    dv_uuid = _uuid.uuid4()
    dv_path = os.path.join(table_dir, f"deletion_vector_{dv_uuid}.bin")
    descs = write_dv_file(dv_path, [m for _, m, _ in affected])
    # protocol upgrade only when DVs are actually minted; UNION with
    # the existing feature lists (replay takes the LAST protocol
    # action — replacing would drop declared features)
    prev = t._protocol(None)
    r_feats = {"deletionVectors"} | set(prev.get("readerFeatures") or [])
    w_feats = {"deletionVectors"} | set(prev.get("writerFeatures") or [])
    if mode != "none":
        r_feats.add("columnMapping")
        w_feats.add("columnMapping")
    actions.append(
        {
            "protocol": {
                "minReaderVersion": max(
                    3, int(prev.get("minReaderVersion") or 1)
                ),
                "minWriterVersion": max(
                    7, int(prev.get("minWriterVersion") or 1)
                ),
                "readerFeatures": sorted(r_feats),
                "writerFeatures": sorted(w_feats),
            }
        }
    )
    for (add, _m, card), (off, sz, _c) in zip(affected, descs):
        actions.append(
            {
                "remove": {
                    "path": add["path"],
                    "dataChange": True,
                    "deletionTimestamp": int(_time.time() * 1000),
                    "partitionValues": add.get("partitionValues") or {},
                    "size": add.get("size"),
                }
            }
        )
        new_add = dict(add)
        new_add["dataChange"] = True
        new_add["deletionVector"] = {
            "storageType": "u",
            "pathOrInlineDv": z85_encode(dv_uuid.bytes),
            "offset": off,
            "sizeInBytes": sz,
            "cardinality": card,
        }
        actions.append({"add": new_add})
    return actions


def _validate_merge_arms(
    arms: list[dict], keys: list[str], label: str,
    verb: str = "delta_merge",
) -> tuple[dict[int, dict | None], set[int]]:
    """Shape-check an ordered arm list (matched or
    not-matched-by-source): actions, the last-arm-only unconditional
    rule, delete-with-set, SET-on-merge-key. Returns
    ``({arm_index: set_map_or_None_for_SET*}, {delete_arm_indexes})``
    with 1-based indexes. Shared by delta_merge and iceberg_merge —
    the arm MODEL is format-independent; only the kill physics
    (positional DVs vs equality deletes) differs."""
    upd: dict[int, dict | None] = {}
    dels: set[int] = set()
    for i, arm in enumerate(arms, start=1):
        action = arm.get("action")
        if action not in ("update", "delete"):
            raise ValueError(
                f"{verb}: {label} arm {i} action must be "
                f"'update' or 'delete', got {action!r}"
            )
        if arm.get("condition") is None and i != len(arms):
            raise ValueError(
                f"{verb}: {label} arm {i} has no condition but "
                "is not the last arm — it would shadow every arm "
                "after it (Delta's MERGE rule)"
            )
        if action == "delete":
            if arm.get("set"):
                raise ValueError(
                    f"{verb}: {label} arm {i} is a delete — "
                    "'set' is meaningless"
                )
            dels.add(i)
        else:
            s = arm.get("set")
            if s is not None:
                bad = sorted(set(s) & set(keys))
                if bad:
                    raise ValueError(
                        f"{verb}: {label} arm {i} SETs merge "
                        f"key(s) {bad} — rewriting the match key "
                        "under a merge is ambiguous"
                    )
            upd[i] = dict(s) if s is not None else None
    return upd, dels


def delta_merge(
    df: DataFrame,
    table_dir: str,
    keys: list[str],
    when_matched: list[dict] | None = None,
    insert: bool = True,
    insert_condition: str | None = None,
    when_not_matched_by_source: list[dict] | None = None,
    evolve: bool = False,
    txn: tuple[str, int] | None = None,
) -> tuple[int, int, int, int]:
    """Conditional / partial-column MERGE as ONE Delta commit — the
    general form of :func:`delta_upsert` (which stays the full-row
    fast path). Arms follow Delta's ``MERGE INTO`` semantics:

    ``when_matched`` is an ordered list of arms, each a dict::

        {"condition": "<sql over src.*/tgt.*>" | None,
         "action": "update",
         "set": {"col": "<sql over src.*/tgt.*>", ...} | None}
        {"condition": ..., "action": "delete"}

    For each LIVE target row whose key tuple matches a source row,
    arms are evaluated IN ORDER and the first whose condition is true
    (NULL = false, SQL semantics) fires; if none fires the target row
    survives untouched and the source row is dropped. ``set`` updates
    only the named columns — every other column keeps the TARGET
    value (the partial-column form real CDC hits); ``set=None`` means
    ``UPDATE SET *`` (full row from source). Only the LAST matched
    arm may omit its condition (Delta's rule — an earlier
    unconditional arm would shadow the rest). ``insert`` adds the
    ``WHEN NOT MATCHED [AND insert_condition] THEN INSERT *`` arm for
    source rows matching no target key.

    ``when_not_matched_by_source`` adds Delta's third arm class —
    arms (same dict shape, conditions/SETs over ``tgt.*`` only; there
    is no source row) applied to LIVE target rows whose key appears
    NOWHERE in the batch: the full-snapshot-sync verb (``WHEN NOT
    MATCHED BY SOURCE THEN DELETE`` drops rows that vanished from the
    upstream snapshot). Physics note: these arms are inherently
    O(live target) — the engine anti-joins the WHOLE live row set
    against the batch's broadcast key set (there is no smaller
    correct read; Delta proper scans the same), and the kill collect
    is bounded by the FIRED row count — a by-source arm expected to
    fire on a large fraction of the table belongs in a copy-on-write
    rewrite instead. Arms that fire on no rows cost one columnar
    anti-join scan.

    ``evolve=True`` turns on MERGE schema evolution: source columns
    unknown to the table are appended as nullable columns in the SAME
    commit (fresh field ids / physical names in mapped tables, the
    delta_append(merge_schema=True) shape); pre-existing rows —
    including rows kept by no-arm-fired and by partial SETs — read
    NULL for them. Type changes and source frames MISSING table
    columns still refuse (narrowing under a merge is never safe).

    Physics is delta_upsert's: deletion-vector merge-on-read (fired
    target rows die via DVs on their existing files — no data file
    rewritten), the match probe broadcasts the batch's distinct keys
    against a target scan pruned first by per-key min/max
    data-skipping, arm predicates and SET expressions run as Catalyst
    expressions inside the one probe join (whole-stage codegen, no
    Python in the row path), and replacement + insert rows land as
    new data files with footer stats — all under ONE ``MERGE``
    commit, CDF-exact for :func:`delta_changes`. Matched (file,
    ordinal) pairs are collected to the driver, bounded by the
    batch's own match count (the sliver), not the table.

    Refusals: duplicate source key tuples (ambiguous), SET on a merge
    key (rewriting the match key under a merge is ambiguous), SET of
    an unknown column, non-last unconditional arm in either arm
    class, by-source update arms without an explicit SET, schema
    drift (enforcement — source must carry the full table schema,
    required by INSERT * and UPDATE SET *; ``evolve=True`` relaxes
    only the unknown-column case), lost commit race.

    Returns ``(commit_version, n_updated, n_deleted, n_inserted)``.
    A merge where nothing fires, nothing inserts and no ``txn`` needs
    recording commits nothing and returns the current version."""
    import time as _time

    from pyspark.sql import functions as F

    when_matched = list(when_matched or [])
    when_not_matched_by_source = list(when_not_matched_by_source or [])
    if not keys:
        raise ValueError("delta_merge: keys must be non-empty")
    if not when_matched and not insert and not when_not_matched_by_source:
        raise ValueError(
            "delta_merge: no matched arms, no by-source arms and "
            "insert=False — the merge can never change anything"
        )
    missing_keys = [k for k in keys if k not in df.columns]
    if missing_keys:
        raise ValueError(
            f"delta_merge: key column(s) {missing_keys} not in the "
            f"source frame (columns: {df.columns})"
        )
    upd_arms, del_arms = _validate_merge_arms(
        when_matched, keys, "matched"
    )
    src_upd_arms, src_del_arms = _validate_merge_arms(
        when_not_matched_by_source, keys, "by-source"
    )
    for i, s in upd_arms.items():
        unknown = sorted(set(s or {}) - set(df.columns))
        if unknown:
            raise ValueError(
                f"delta_merge: matched arm {i} SETs unknown "
                f"column(s) {unknown}"
            )
    none_sets = sorted(i for i, s in src_upd_arms.items() if s is None)
    if none_sets:
        raise ValueError(
            f"delta_merge: by-source update arm(s) {none_sets} need "
            "an explicit 'set' — there is no source row for SET *"
        )
    spark = df.sparkSession
    log_dir = os.path.join(table_dir, "_delta_log")
    has_table = os.path.isdir(log_dir) and any(
        (n.endswith(".json") and n[:-5].isdigit())
        or re.match(r"\d{20}\.checkpoint(\.|$)", n)
        for n in os.listdir(log_dir)
    )
    # materialize the source batch ONCE (batch-bounded, the budget
    # the probe checkpoints already spend): the verb otherwise
    # re-evaluates the caller's lineage per consumer — this key
    # aggregate, the broadcast probe build, the by-source key set,
    # the insert anti-join and the staging write each re-ran the
    # full upstream plan (guide §5). Every exit path unpersists.
    df = df.localCheckpoint(eager=True)
    # ONE aggregate over the small batch answers the duplicate-key
    # refusal (which row's arms win is undefined — same rule as
    # delta_upsert), batch emptiness AND the per-key min/max bounds
    # the probe's file pruning wants — three r12 driver round-trips
    # folded into one job (VERDICT r12 next #3).
    kb = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__n"))
        .agg(
            F.max("__n").alias("__maxn"),
            F.count(F.lit(1)).alias("__nkeys"),
            *[F.min(k).alias(f"__lo_{i}") for i, k in enumerate(keys)],
            *[F.max(k).alias(f"__hi_{i}") for i, k in enumerate(keys)],
        )
        .first()
    )
    if (kb["__maxn"] or 0) > 1:
        # error path only: one more job to name an offending key
        dup = (
            df.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > 1)
            .limit(1)
            .collect()
        )
        kv = {k: dup[0][k] for k in keys}
        df.unpersist()
        raise ValueError(
            f"delta_merge: source has multiple rows for key {kv} — "
            "MERGE cannot decide which one wins; de-duplicate the "
            "batch first"
        )
    if not has_table:
        # everything is NOT MATCHED: CREATE + the insert arm only
        if not insert:
            raise ValueError(
                f"delta_merge: {table_dir} does not exist and "
                "insert=False — nothing to merge into"
            )
        from pyspark.sql import Observation

        ins0 = df.alias("src")
        if insert_condition is not None:
            ins0 = ins0.filter(F.expr(insert_condition))
        # insert count observed DURING the checkpoint job (r14,
        # guide §1.2/§5): one driver round-trip, not two
        obs0 = Observation()
        ins0 = ins0.observe(
            obs0, F.count(F.lit(1)).alias("n")
        ).localCheckpoint(eager=True)  # batch-bounded
        try:
            v = delta_append(ins0, table_dir, txn=txn)
            n0 = int(obs0.get["n"] or 0)
        finally:
            ins0.unpersist()
            df.unpersist()
        return v, 0, 0, n0

    t = DeltaTable(spark, table_dir)
    if txn is not None:
        app_id, txn_v = txn
        if t.txn_version(app_id) >= int(txn_v):
            df.unpersist()
            return t.latest_version(), 0, 0, 0  # redelivered: no-op
    version = t.latest_version() + 1
    # quiet-batch short circuit (review r12): an EMPTY source can
    # match nothing and insert nothing, so without by-source arms
    # there is no reason to enumerate files or build the probe —
    # record the txn watermark (one tiny commit) or no-op entirely.
    # With by-source arms an empty frame is a legitimate empty
    # snapshot (everything is not-matched-by-source) and runs fully.
    # Emptiness rode the batch aggregate above — no isEmpty() job.
    src_empty = int(kb["__nkeys"] or 0) == 0
    if src_empty and not when_not_matched_by_source:
        df.unpersist()
        if txn is None:
            return t.latest_version(), 0, 0, 0
        import time as _t2

        actions0 = [
            {
                "commitInfo": {
                    "timestamp": int(_t2.time() * 1000),
                    "operation": "MERGE",
                }
            },
            {
                "txn": {
                    "appId": txn[0],
                    "version": int(txn[1]),
                    "lastUpdated": 0,
                }
            },
        ]
        if not _claim_commit(log_dir, version, actions0):
            raise ConcurrentWriteError(
                f"{table_dir}: version {version} was committed by "
                "another writer while MERGE ran; re-read and retry"
            )
        return version, 0, 0, 0
    meta, _, _ = t._state(None)
    merge_constraints = _writer_feature_gate(
        t, meta, "delta_merge", mutates=True
    )
    mode, map_fields = t._mapping(meta)
    tbl_parts = meta.get("partitionColumns") or []
    added = _enforce_merge_schema(
        table_dir, meta, df, keys, allow_new=evolve
    )
    old_cols = [
        f["name"] for f in json.loads(meta["schemaString"])["fields"]
    ]
    evolution_md = None
    if added:
        # schema evolution rides in the SAME commit (the protocol's
        # shape); _evolve_delta_schema extends map_fields in place so
        # the staged frame's physical rename covers the new columns
        evolution_md = _evolve_delta_schema(meta, added, mode, map_fields)
    added_of = {f["name"]: f["type"] for f in added}
    tbl_cols = old_cols + [f["name"] for f in added]
    bad_src_sets = sorted(
        {
            c
            for s in src_upd_arms.values()
            for c in (s or {})
            if c not in tbl_cols
        }
    )
    if bad_src_sets:
        raise ValueError(
            f"delta_merge: by-source arm SETs unknown column(s) "
            f"{bad_src_sets}"
        )

    def _tgt_col(c: str):
        # target value of a column: NULL (typed) for columns the
        # evolution is adding in this very commit
        if c in added_of:
            return F.lit(None).cast(_ddl(added_of[c]))
        return F.col(f"tgt.{c}")

    # ---- probe: LIVE target rows joined to the broadcast batch ----
    # per-key bounds reuse the batch aggregate computed with the
    # duplicate-key check — no second scan of the batch
    filters: list[tuple] = []
    for i, k in enumerate(keys):
        lo, hi = kb[f"__lo_{i}"], kb[f"__hi_{i}"]
        if lo is not None and hi is not None and not isinstance(
            lo, (bytes, bytearray)
        ):
            filters.extend([(k, ">=", lo), (k, "<=", hi)])
    adds = t.data_files(None, filters or None)
    n_updated = n_deleted = 0
    affected: list[tuple[dict, list[int], int]] = []
    by_file: dict[str, set[int]] = {}  # kill set, both arm classes
    matched = None  # materialized matched-pair frame (the sliver)
    fired_src = None  # materialized fired by-source rows
    try:
        if adds and when_matched and not src_empty:
            live_asm = t._assemble_live(adds, meta)
            tj = live_asm.alias("tgt").join(
                F.broadcast(df).alias("src"),
                on=[
                    F.col(f"tgt.{k}") == F.col(f"src.{k}") for k in keys
                ],
                how="inner",
            )
            # first-true-arm selector + every arm's SET expressions,
            # evaluated ONCE in the join select where src./tgt.
            # qualifiers resolve
            arm_sel = None
            for i, arm in enumerate(when_matched, start=1):
                cond = (
                    F.expr(arm["condition"])
                    if arm.get("condition") is not None
                    else F.lit(True)
                )
                arm_sel = (
                    F.when(cond, F.lit(i))
                    if arm_sel is None
                    else arm_sel.when(cond, F.lit(i))
                )
            sel = [
                F.col("tgt.__fp").alias("__fp"),
                F.col("tgt.__pos").alias("__pos"),
                arm_sel.otherwise(F.lit(0)).alias("__arm"),
            ]
            for c in tbl_cols:
                sel.append(_tgt_col(c).alias(f"__t_{c}"))
                sel.append(F.col(f"src.{c}").alias(f"__s_{c}"))
            for i, s in upd_arms.items():
                for c, e in (s or {}).items():
                    sel.append(F.expr(e).alias(f"__a{i}_{c}"))
            # materialize the sliver once (ALL key-matched pairs, fired
            # or not — a matched source row is consumed even when no arm
            # fires); the kill collect, the replacement-row staging and
            # the matched-key set for the insert anti-join all read it
            # without re-running the probe
            matched = tj.select(*sel).localCheckpoint(eager=True)
            fired = matched.filter(F.col("__arm") > 0)
            hits = fired.select("__fp", "__pos", "__arm").toPandas()
            n_updated += int((hits["__arm"].isin(list(upd_arms))).sum())
            n_deleted += int((hits["__arm"].isin(list(del_arms))).sum())
            for fp, pos in zip(hits["__fp"], hits["__pos"]):
                by_file.setdefault(fp, set()).add(int(pos))

        # ---- by-source probe: LIVE rows whose key the batch lacks ----
        kill_adds = adds
        if when_not_matched_by_source:
            all_adds = t.data_files(None, None)
            kill_adds = all_adds  # kills may land on ANY file now
            if all_adds:
                live_all = t._assemble_live(all_adds, meta).alias("tgt")
                nosrc = live_all.join(
                    F.broadcast(df.select(*keys).distinct()),
                    on=list(keys),
                    how="left_anti",
                )
                arm_sel2 = None
                for i, arm in enumerate(when_not_matched_by_source, start=1):
                    cond = (
                        F.expr(arm["condition"])
                        if arm.get("condition") is not None
                        else F.lit(True)
                    )
                    arm_sel2 = (
                        F.when(cond, F.lit(i))
                        if arm_sel2 is None
                        else arm_sel2.when(cond, F.lit(i))
                    )
                sel2 = [
                    F.col("__fp"),
                    F.col("__pos"),
                    arm_sel2.otherwise(F.lit(0)).alias("__arm"),
                ]
                for c in tbl_cols:
                    sel2.append(_tgt_col(c).alias(f"__t_{c}"))
                for i, s in src_upd_arms.items():
                    for c, e in (s or {}).items():
                        sel2.append(F.expr(e).alias(f"__a{i}_{c}"))
                # materialized size = FIRED rows only (the update arms
                # must rewrite those rows anyway); the kill collect below
                # is the driver-bounded part — a by-source arm firing on
                # a large table fraction belongs in copy-on-write
                fired_src = (
                    nosrc.select(*sel2)
                    .filter(F.col("__arm") > 0)
                    .localCheckpoint(eager=True)
                )
                hits2 = fired_src.select("__fp", "__pos", "__arm").toPandas()
                n_updated += int(
                    (hits2["__arm"].isin(list(src_upd_arms))).sum()
                )
                n_deleted += int(
                    (hits2["__arm"].isin(list(src_del_arms))).sum()
                )
                for fp, pos in zip(hits2["__fp"], hits2["__pos"]):
                    by_file.setdefault(fp, set()).add(int(pos))

        for add in kill_adds:
            abs_p = os.path.abspath(os.path.join(t.path, add["path"]))
            new_hits = by_file.get(abs_p)
            if not new_hits:
                continue
            old = (
                set(t._load_dv(add["deletionVector"]))
                if add.get("deletionVector")
                else set()
            )
            merged = sorted(old | new_hits)
            affected.append((add, merged, len(merged)))

        # ---- rows to land: update replacements + unmatched inserts ----
        to_stage = None
        if matched is not None and upd_arms:
            rep_cols = []
            for c in tbl_cols:
                e = None
                for i, s in upd_arms.items():
                    if s is None:
                        val = F.col(f"__s_{c}")  # UPDATE SET *
                    elif c in s:
                        val = F.col(f"__a{i}_{c}")
                    else:
                        val = F.col(f"__t_{c}")  # non-set: keep target
                    e = (
                        F.when(F.col("__arm") == i, val)
                        if e is None
                        else e.when(F.col("__arm") == i, val)
                    )
                rep_cols.append(e.alias(c))
            to_stage = (
                matched.filter(F.col("__arm").isin(list(upd_arms)))
                .select(*rep_cols)
            )
        if fired_src is not None and src_upd_arms:
            rep2 = []
            for c in tbl_cols:
                e = None
                for i, s in src_upd_arms.items():
                    val = (
                        F.col(f"__a{i}_{c}")
                        if c in s
                        else F.col(f"__t_{c}")  # non-set: keep target
                    )
                    e = (
                        F.when(F.col("__arm") == i, val)
                        if e is None
                        else e.when(F.col("__arm") == i, val)
                    )
                rep2.append(e.alias(c))
            r2 = fired_src.filter(
                F.col("__arm").isin(list(src_upd_arms))
            ).select(*rep2)
            to_stage = r2 if to_stage is None else to_stage.unionByName(r2)
        if insert and not src_empty:
            ins = df.alias("src")
            if matched is not None:
                # matched source keys ≤ the batch's own key count — the
                # anti-join's build side broadcasts
                mk = matched.select(
                    *[F.col(f"__t_{k}").alias(k) for k in keys]
                ).distinct()
                ins = ins.join(F.broadcast(mk), on=keys, how="left_anti")
            elif adds and not when_matched:
                # no matched arms: matched source rows are dropped, so
                # the anti-join still needs the live target key set
                live_asm = t._assemble_live(adds, meta)
                mk = live_asm.join(
                    F.broadcast(df.select(*keys).distinct()),
                    on=keys,
                    how="leftsemi",
                ).select(*keys).distinct()
                ins = ins.join(F.broadcast(mk), on=keys, how="left_anti")
            if insert_condition is not None:
                ins = ins.filter(F.expr(insert_condition))
            ins = ins.select(*tbl_cols)
            to_stage = ins if to_stage is None else to_stage.unionByName(ins)

        actions: list[dict] = [
            {
                "commitInfo": {
                    "timestamp": int(_time.time() * 1000),
                    "operation": "MERGE",
                }
            }
        ]
        if evolution_md is not None:
            # replay order makes the widened schema current before any
            # reader sees the files that first carry the new columns
            actions.append(evolution_md)
        if affected:
            actions.extend(_dv_merge_actions(t, table_dir, affected, mode))
        phys_of = {f["name"]: f["physical"] for f in map_fields}
        fid_of = {f["name"]: f["id"] for f in map_fields}
        n_staged = 0
        # no isEmpty() probe: _stage_add_actions drops zero-row part
        # files, so an empty frame stages nothing and `staged` comes
        # back empty (VERDICT r12 next #3)
        if to_stage is not None:
            # CHECK constraints bind every row this merge lands —
            # replacements, carried values and inserts alike; the
            # violation counts are OBSERVED on the staging write
            # (r14) instead of a separate aggregation job that
            # re-evaluated the whole replacement plan
            merge_post_validate = None
            if merge_constraints:
                from pyspark.sql import Observation

                mc_exprs, mc_validate = _deferred_rule_checks(
                    [], [], merge_constraints, table_dir, "delta_merge"
                )
                mc_obs = Observation()
                to_stage = to_stage.observe(mc_obs, *mc_exprs)
                merge_post_validate = (
                    lambda: mc_validate(mc_obs.get)  # noqa: E731
                )
            wdf = to_stage
            part_phys = list(tbl_parts)
            if mode != "none":
                wdf = to_stage.select(
                    *[
                        F.col(c).alias(
                            phys_of[c],
                            metadata={"parquet.field.id": int(fid_of[c])},
                        )
                        for c in to_stage.columns
                    ]
                )
                part_phys = [phys_of[c] for c in tbl_parts]
            data_cols = [
                phys_of.get(c, c) for c in tbl_cols if c not in tbl_parts
            ]
            staged = _stage_add_actions(
                wdf,
                table_dir,
                version,
                part_phys,
                data_cols,
                post_write_validate=merge_post_validate,
            )
            n_staged = sum(
                json.loads(a["add"]["stats"])["numRecords"] for a in staged
            )
            actions.extend(staged)
    finally:
        # release the materialized probe frames whether staging
        # succeeded or raised (a toPandas / staging-I/O / SET-
        # analysis error must not leak checkpointed blocks into a
        # retry loop's session — ADVICE r12); on success they are
        # fully consumed before the claim below, so a
        # ConcurrentWriteError retry can't accumulate blocks either
        df.unpersist()
        if matched is not None:
            matched.unpersist()
        if fired_src is not None:
            fired_src.unpersist()
    n_inserted = n_staged - n_updated
    if len(actions) == 1 and txn is None:
        return t.latest_version(), 0, 0, 0  # true no-op: don't churn
    if txn is not None:
        actions.append(
            {
                "txn": {
                    "appId": txn[0],
                    "version": int(txn[1]),
                    "lastUpdated": 0,
                }
            }
        )
    if not _claim_commit(log_dir, version, actions):
        raise ConcurrentWriteError(
            f"{table_dir}: version {version} was committed by another "
            "writer while MERGE ran; re-read and retry"
        )
    return version, n_updated, n_deleted, n_inserted


def delta_restore(
    spark: SparkSession,
    table_dir: str,
    version: int,
) -> tuple[int, int, int]:
    """``RESTORE TABLE ... TO VERSION AS OF v`` as ONE commit — the
    rollback verb (bad batch landed, revert the table state without
    losing history). Pure metadata: the commit removes every file
    (path + DV state) live now but not at ``version`` and re-adds
    every file live at ``version`` but not now (including files whose
    deletion vector GREW since — restoring un-deletes those rows by
    re-adding the old DV state). No data is rewritten; time travel to
    the in-between versions still works.

    Refuses when a file the target version needs no longer exists on
    disk (VACUUM already reclaimed it) — a restore that silently
    resurrects a missing file corrupts every later scan.

    Returns ``(commit_version, files_removed, files_restored)``."""
    import time as _time

    t = DeltaTable(spark, table_dir)
    cur_v = t.latest_version()
    if version == cur_v:
        raise ValueError(
            f"{table_dir}: already at version {version} — nothing to "
            "restore"
        )
    meta_t, adds_t, _ = t._state(version)
    meta_c, adds_c, _ = t._state(None)
    # RESTORE removes files live now (rewrites history's tip):
    # append-only tables refuse, unknown writer features refuse. The
    # restored rows themselves were a prior committed state — no
    # fresh-row constraint enforcement needed.
    _writer_feature_gate(
        t, meta_c, "delta_restore", mutates=True, adds_rows=False
    )

    def dv_key(a: dict):
        dv = a.get("deletionVector")
        if not dv:
            return None
        return (dv.get("pathOrInlineDv"), dv.get("offset"))

    cur_by_path = {a["path"]: a for a in adds_c}
    tgt_by_path = {a["path"]: a for a in adds_t}
    gone_paths = [
        p
        for p in tgt_by_path
        if not os.path.exists(os.path.join(t.path, p))
    ]
    # the target adds' deletion-vector .bin files are needs too: a
    # DV descriptor pointing at a bin delta_vacuum already reclaimed
    # would commit fine and then fail EVERY later scan of that file
    # (advice r11) — refuse up front, same contract as data files
    from feature_store_spark.sources.roaring import dv_file_path

    gone_paths += sorted(
        {
            os.path.relpath(dvp, t.path)
            for a in adds_t
            if a.get("deletionVector")
            # inline DVs ("i") live in the descriptor itself
            and a["deletionVector"].get("storageType") in ("u", "p")
            for dvp in [dv_file_path(t.path, a["deletionVector"])]
            if not os.path.exists(dvp)
        }
    )
    if gone_paths:
        raise ValueError(
            f"{table_dir}: cannot restore to version {version} — "
            f"{len(gone_paths)} file(s) it needs (data or deletion-"
            f"vector) were vacuumed (e.g. {gone_paths[0]!r})"
        )
    removes = [p for p in cur_by_path if p not in tgt_by_path]
    readds = [
        a
        for p, a in tgt_by_path.items()
        if p not in cur_by_path
        or dv_key(cur_by_path[p]) != dv_key(a)
    ]
    if not removes and not readds and meta_t == meta_c:
        raise ValueError(
            f"{table_dir}: table state at {cur_v} already equals "
            f"version {version} — nothing to restore"
        )
    actions: list[dict] = [
        {
            "commitInfo": {
                "timestamp": int(_time.time() * 1000),
                "operation": "RESTORE",
                "operationParameters": {"version": str(int(version))},
            }
        }
    ]
    if meta_t != meta_c:
        # RESTORE also restores the table definition (schema,
        # partitioning, configuration) — protocol is NOT downgraded
        # (the spec forbids it; old readers of the restored schema
        # still need the current feature set to read the log)
        actions.append({"metaData": meta_t})
    for p in removes:
        a = cur_by_path[p]
        actions.append(
            {
                "remove": {
                    "path": p,
                    "dataChange": True,
                    "deletionTimestamp": int(_time.time() * 1000),
                    "partitionValues": a.get("partitionValues") or {},
                    "size": a.get("size"),
                }
            }
        )
    for a in readds:
        if a["path"] in cur_by_path:
            # DV state changed: remove+add pair, the same convention
            # delta_delete_where commits (replay alone would accept a
            # bare re-add, but external readers expect the pair)
            cur = cur_by_path[a["path"]]
            actions.append(
                {
                    "remove": {
                        "path": a["path"],
                        "dataChange": True,
                        "deletionTimestamp": int(_time.time() * 1000),
                        "partitionValues": cur.get("partitionValues")
                        or {},
                        "size": cur.get("size"),
                    }
                }
            )
        new_add = dict(a)
        new_add["dataChange"] = True
        actions.append({"add": new_add})
    next_v = cur_v + 1
    if not _claim_commit(
        os.path.join(table_dir, "_delta_log"), next_v, actions
    ):
        raise ConcurrentWriteError(
            f"{table_dir}: version {next_v} was committed by another "
            "writer while RESTORE ran; re-read and retry"
        )
    return next_v, len(removes), len(readds)


def _json_stat(v):
    """Parquet footer stat -> JSON-encodable delta stat value (skip
    types delta stats don't carry losslessly here)."""
    import datetime

    if isinstance(v, (int, float, str, bool)):
        return v
    if isinstance(v, (bytes, bytearray)):
        try:
            return bytes(v).decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, (datetime.datetime, datetime.date)):
        return None  # timestamps prune via partitions here
    return None
