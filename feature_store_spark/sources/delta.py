"""Read-only Delta Lake table scan + minimal append exporter (public
protocol: https://github.com/delta-io/delta/blob/master/PROTOCOL.md).

Parity/interop: the engine's native transactional format is
sources/manifest.py; this module lets it SCAN a table a Delta writer
produced and EXPORT one a Delta reader can open — completing the
open-format interop story next to sources/iceberg.py.

Physical shape: the Delta log is line-delimited JSON commits
(``_delta_log/%020d.json``) with add/remove file actions, plus
periodic parquet checkpoints. Replaying it is driver-side metadata
work (KBs per commit); per-file ``stats`` (numRecords/minValues/
maxValues) and hive-style ``partitionValues`` drive file pruning, and
only the surviving parquet paths reach ``spark.read.parquet`` —
where partition-directory columns are reconstructed via ``basePath``
and Catalyst takes over row-group pruning. Filters are re-applied to
the frame, so pruning is an optimization, never the correctness
boundary.

Scope gates (loud): protocol minReaderVersion <= 2 without
deletion vectors / column mapping / v2 checkpoints; parquet data
files only. Checkpoint parquet files (``_last_checkpoint``) are read
with pyarrow when present, so long logs don't need a full JSON
replay.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from feature_store_spark.sources.iceberg import _Filter

_UNSUPPORTED_FEATURES = {
    "deletionVectors",
    "columnMapping",
    "v2Checkpoint",
    "typeWidening",
    "icebergCompatV1",
    "icebergCompatV2",
}


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

    # -- log replay

    def latest_version(self) -> int:
        vs = self._commit_versions()
        if not vs:
            raise ValueError(f"{self.path}: empty delta log")
        return vs[-1]

    def _commit_versions(self) -> list[int]:
        out = []
        for name in os.listdir(self.log_dir):
            if name.endswith(".json") and name[:-5].isdigit():
                out.append(int(name[:-5]))
        return sorted(out)

    def _checkpoint_at_or_before(self, version: int):
        """(checkpoint_version, [checkpoint parquet paths]) or None."""
        best = None
        for name in os.listdir(self.log_dir):
            if ".checkpoint" not in name or not name.endswith(".parquet"):
                continue
            v = int(name.split(".")[0])
            if v <= version and (best is None or v > best[0]):
                best = (v, [os.path.join(self.log_dir, name)])
        return best

    def _state(
        self, version: int | None
    ) -> tuple[dict, list[dict], dict[str, int]]:
        """Replay to (metaData, live add actions, txn high-water marks
        by appId) at ``version``."""
        versions = self._commit_versions()
        if version is None:
            version = versions[-1] if versions else -1
        if version in self._state_cache:
            # one DeltaTable = one pinned view of the log; scan() and
            # data_files() share a single replay per version
            return self._state_cache[version]
        if version not in versions and not self._checkpoint_at_or_before(
            version
        ):
            raise ValueError(f"unknown delta version {version}")

        adds: dict[str, dict] = {}
        meta: dict = {}
        protocol: dict = {}
        txns: dict[str, int] = {}
        start = 0
        ckpt = self._checkpoint_at_or_before(version)
        if ckpt is not None:
            cv, paths = ckpt
            import pyarrow.parquet as pq

            for p in paths:
                tbl = pq.read_table(p)
                for row in tbl.to_pylist():
                    if row.get("metaData") and row["metaData"].get("id"):
                        meta = row["metaData"]
                    if row.get("protocol") and row["protocol"].get(
                        "minReaderVersion"
                    ) is not None:
                        protocol = row["protocol"]
                    add = row.get("add")
                    if add and add.get("path"):
                        adds[add["path"]] = add
                    rem = row.get("remove")
                    if rem and rem.get("path"):
                        adds.pop(rem["path"], None)
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
                    elif "protocol" in action:
                        protocol = action["protocol"]
                    elif "add" in action:
                        adds[action["add"]["path"]] = action["add"]
                    elif "remove" in action:
                        adds.pop(action["remove"]["path"], None)
                    elif "txn" in action:
                        t = action["txn"]
                        txns[t["appId"]] = max(
                            txns.get(t["appId"], -1), int(t["version"])
                        )
        self._check_protocol(protocol)
        if not meta:
            raise ValueError(f"{self.path}: delta log has no metaData")
        out = (meta, list(adds.values()), txns)
        self._state_cache[version] = out
        return out

    def _check_protocol(self, protocol: dict) -> None:
        feats = set(protocol.get("readerFeatures") or [])
        bad = feats & _UNSUPPORTED_FEATURES
        if bad:
            raise NotImplementedError(
                f"{self.path}: delta reader features {sorted(bad)} are not "
                "supported (copy-on-write parquet tables only)"
            )
        if protocol.get("minReaderVersion", 1) > 3:
            raise NotImplementedError(
                f"{self.path}: minReaderVersion "
                f"{protocol['minReaderVersion']} > 3"
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

    def data_files(
        self,
        version: int | None = None,
        filters: list[tuple] | None = None,
    ) -> list[dict]:
        meta, adds, _ = self._state(version)
        fs = [_Filter(*f) for f in (filters or [])]
        schema = json.loads(meta["schemaString"])
        types = {f["name"]: f["type"] for f in schema["fields"]}
        part_cols = meta.get("partitionColumns") or []
        out = []
        for add in adds:
            if add.get("deletionVector"):
                raise NotImplementedError(
                    f"{self.path}: {add['path']!r} carries a deletion "
                    "vector; copy-on-write tables only"
                )
            if self._add_might_match(add, fs, types, part_cols):
                out.append(add)
        return out

    def _add_might_match(self, add, fs, types, part_cols) -> bool:
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
    ) -> DataFrame:
        adds = self.data_files(version, filters)
        meta, _, _ = self._state(version)
        part_cols = meta.get("partitionColumns") or []
        if not adds:
            all_adds = self.data_files(version, None)
            if not all_adds:
                return self.spark.createDataFrame([], "")
            base = self._read([all_adds[0]], part_cols).limit(0)
            return base
        df = self._read(adds, part_cols)
        for f in filters or []:
            df = df.filter(_Filter(*f).sql())
        return df

    def _read(self, adds: list[dict], part_cols: list[str]) -> DataFrame:
        paths = [os.path.join(self.path, a["path"]) for a in adds]
        hive = all(
            all(f"{c}=" in a["path"] for c in part_cols) for a in adds
        )
        if part_cols and hive:
            # partition columns live in directory names (the layout
            # every Delta writer produces); basePath reconstructs them
            return (
                self.spark.read.option("basePath", self.path).parquet(*paths)
            )
        if part_cols:
            # non-hive layout: inject partition values per distinct
            # tuple (bounded by the pruned set's partition count)
            from pyspark.sql import functions as F

            groups: dict[tuple, list[str]] = {}
            for a in adds:
                key = tuple(
                    (a.get("partitionValues") or {}).get(c) for c in part_cols
                )
                groups.setdefault(key, []).append(
                    os.path.join(self.path, a["path"])
                )
            frames = []
            for key, ps in groups.items():
                g = self.spark.read.parquet(*ps)
                for c, v in zip(part_cols, key):
                    g = g.withColumn(c, F.lit(v))
                frames.append(g)
            out = frames[0]
            for g in frames[1:]:
                out = out.unionByName(g)
            return out
        return self.spark.read.parquet(*paths)


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


def delta_append(
    df: DataFrame,
    table_dir: str,
    partition_cols: list[str] | None = None,
    txn: tuple[str, int] | None = None,
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

    Export-grade: append-only, no concurrent-writer arbitration (the
    engine's native format, sources/manifest.py, owns that)."""
    import uuid

    import pyarrow.parquet as pq

    spark = df.sparkSession
    partition_cols = list(partition_cols or [])
    log_dir = os.path.join(table_dir, "_delta_log")
    os.makedirs(log_dir, exist_ok=True)

    existing = [
        int(n[:-5])
        for n in os.listdir(log_dir)
        if n.endswith(".json") and n[:-5].isdigit()
    ]
    version = (max(existing) + 1) if existing else 0
    if txn is not None and version > 0:
        app_id, txn_v = txn
        committed = DeltaTable(spark, table_dir).txn_version(app_id)
        if committed >= int(txn_v):
            return max(existing)  # redelivered batch: no state change

    # stage with Spark, then move leaf files into the canonical Delta
    # layout (partition dirs directly under the table root, unique
    # file names) — Spark's partition discovery over the table
    # requires ONE consistent directory structure across commits
    staging = os.path.join(table_dir, f".staging-{uuid.uuid4().hex[:8]}")
    writer = df.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(staging)
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
    import shutil as _sh

    _sh.rmtree(staging, ignore_errors=True)

    actions: list[dict] = []
    if version == 0:
        actions.append(
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
        )
        actions.append(
            {
                "metaData": {
                    "id": str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": df.schema.json(),
                    "partitionColumns": partition_cols,
                    "configuration": {},
                }
            }
        )
    data_cols = [
        f.name for f in df.schema.fields if f.name not in partition_cols
    ]
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
    for rel, md in zip(moved, metas):
            fpath = os.path.join(table_dir, rel)
            pvals = dict(
                seg.split("=", 1) for seg in rel.split("/") if "=" in seg
            )
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
                    mn, mx = _json_stat(st.min), _json_stat(st.max)
                    if mn is None or mx is None:
                        continue
                    mins[cname] = mn if cname not in mins else min(mins[cname], mn)
                    maxs[cname] = mx if cname not in maxs else max(maxs[cname], mx)
            actions.append(
                {
                    "add": {
                        "path": rel,
                        "partitionValues": {
                            c: pvals.get(c) for c in partition_cols
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
    if txn is not None:
        actions.append(
            {"txn": {"appId": txn[0], "version": int(txn[1]),
                     "lastUpdated": 0}}
        )
    commit = os.path.join(log_dir, f"{version:020d}.json")
    tmp = commit + ".tmp"
    with open(tmp, "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    os.replace(tmp, commit)
    # touch spark to keep the session-arg contract obvious
    assert spark is not None
    return version


def delta_append_sink(
    table_dir: str,
    app_id: str,
    partition_cols: list[str] | None = None,
):
    """foreachBatch body: exactly-once micro-batch appends into a
    Delta table via the protocol's txn action — crash after commit +
    checkpoint loss redelivers the batch, and the recorded (app_id,
    batch_id) high-water mark turns the redelivery into a no-op."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        delta_append(
            batch_df,
            table_dir,
            partition_cols=partition_cols,
            txn=(app_id, int(batch_id)),
        )

    return sink


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
