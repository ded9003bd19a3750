"""Author a spec-conforming Apache Iceberg v2 table on local disk.

Test fixture for feature_store_spark.sources.iceberg: builds the
reference's offline-store shape (EAV feature records partitioned by
identity(entity_type) + day(event_time), IcebergOfflineStore.java:
42-57) with real parquet data files, Avro manifests + manifest lists
(via the in-repo avro_io writer), and vN.metadata.json — the layout a
filesystem-catalog Iceberg writer produces. Field ids, partition
field ids, bound serialization, and avro field names follow the
public Iceberg spec so the reader is exercised against the same
structures a real table carries.
"""

from __future__ import annotations

import json
import os
import struct
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from feature_store_spark.sources.avro_io import read_avro, write_avro
from feature_store_spark.sources.iceberg_write import (
    MANIFEST_LIST_SCHEMA,
    manifest_schema,
)

US_PER_DAY = 86_400_000_000

SCHEMA_FIELDS = [
    {"id": 1, "name": "entity_type", "required": True, "type": "string"},
    {"id": 2, "name": "entity_id", "required": True, "type": "string"},
    {"id": 3, "name": "feature_name", "required": True, "type": "string"},
    {"id": 4, "name": "value_float", "required": False, "type": "double"},
    {"id": 6, "name": "event_time", "required": True, "type": "timestamptz"},
]

PARTITION_SPEC = [
    {"name": "entity_type", "transform": "identity", "source-id": 1,
     "field-id": 1000},
    {"name": "event_time_day", "transform": "day", "source-id": 6,
     "field-id": 1001},
]

MANIFEST_SCHEMA = manifest_schema(
    [
        {"name": "entity_type", "avro": "string"},
        {"name": "event_time_day", "avro": "int"},
    ]
)


def _write_parquet(path: str, rows: list[dict]) -> tuple[int, dict, dict]:
    """Write one data file; returns (n_rows, lower_bounds, upper_bounds)
    keyed by field id with Iceberg single-value binary encoding."""
    table = pa.table(
        {
            "entity_type": pa.array([r["entity_type"] for r in rows],
                                    pa.string()),
            "entity_id": pa.array([r["entity_id"] for r in rows],
                                  pa.string()),
            "feature_name": pa.array([r["feature_name"] for r in rows],
                                     pa.string()),
            "value_float": pa.array([r["value_float"] for r in rows],
                                    pa.float64()),
            "event_time": pa.array([r["event_time_us"] for r in rows],
                                   pa.timestamp("us", tz="UTC")),
        }
    )
    pq.write_table(table, path)
    vals = [r["value_float"] for r in rows if r["value_float"] is not None]
    ts = [r["event_time_us"] for r in rows]
    lowers = {6: struct.pack("<q", min(ts))}
    uppers = {6: struct.pack("<q", max(ts))}
    if vals:
        lowers[4] = struct.pack("<d", min(vals))
        uppers[4] = struct.pack("<d", max(vals))
    return len(rows), lowers, uppers


def _day(us: int) -> int:
    return us // US_PER_DAY


DELETE_MANIFEST_SCHEMA = manifest_schema(
    [
        {"name": "entity_type", "avro": "string"},
        {"name": "event_time_day", "avro": "int"},
    ]
)


def write_iceberg_table(
    table_dir: str,
    batches: list[list[dict]],
    positional_deletes: list[tuple[str, int, int]] | None = None,
) -> None:
    """Each batch (list of row dicts with entity_type, entity_id,
    feature_name, value_float, event_time_us) becomes one snapshot
    appending one manifest with one data file per (entity_type, day)
    partition; snapshot ids are 1..len(batches).

    ``positional_deletes`` — (entity_type, day, row_pos) triples —
    adds ONE final merge-on-read snapshot: a positional-delete parquet
    per spec (columns file_path, pos) plus a content=1 delete manifest
    referencing it."""
    data_dir = os.path.join(table_dir, "data")
    meta_dir = os.path.join(table_dir, "metadata")
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(meta_dir, exist_ok=True)

    manifests: list[dict] = []  # accumulated across snapshots
    snapshots: list[dict] = []
    for snap_id, batch in enumerate(batches, start=1):
        by_part: dict[tuple, list[dict]] = {}
        for r in batch:
            by_part.setdefault(
                (r["entity_type"], _day(r["event_time_us"])), []
            ).append(r)
        entries = []
        et_lo = min(k[0] for k in by_part)
        et_hi = max(k[0] for k in by_part)
        d_lo = min(k[1] for k in by_part)
        d_hi = max(k[1] for k in by_part)
        n_rows = 0
        for (etype, day), rows in sorted(by_part.items()):
            fname = f"{etype}-{day}-{snap_id}-{uuid.uuid4().hex[:8]}.parquet"
            fpath = os.path.join(data_dir, fname)
            n, lowers, uppers = _write_parquet(fpath, rows)
            n_rows += n
            entries.append(
                {
                    "status": 1,  # ADDED
                    "snapshot_id": snap_id,
                    "sequence_number": snap_id,
                    "file_sequence_number": snap_id,
                    "data_file": {
                        "content": 0,
                        "file_path": fpath,
                        "file_format": "PARQUET",
                        "partition": {"entity_type": etype,
                                      "event_time_day": day},
                        "record_count": n,
                        "file_size_in_bytes": os.path.getsize(fpath),
                        "lower_bounds": [
                            {"key": k, "value": v}
                            for k, v in sorted(lowers.items())
                        ],
                        "upper_bounds": [
                            {"key": k, "value": v}
                            for k, v in sorted(uppers.items())
                        ],
                    },
                }
            )
        mpath = os.path.join(meta_dir, f"manifest-{snap_id}.avro")
        write_avro(mpath, MANIFEST_SCHEMA, entries, codec="deflate")
        manifests.append(
            {
                "manifest_path": mpath,
                "manifest_length": os.path.getsize(mpath),
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": snap_id,
                "min_sequence_number": snap_id,
                "added_snapshot_id": snap_id,
                "added_files_count": len(entries),
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": n_rows,
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
                "partitions": [
                    {
                        "contains_null": False,
                        "contains_nan": None,
                        "lower_bound": et_lo.encode(),
                        "upper_bound": et_hi.encode(),
                    },
                    {
                        "contains_null": False,
                        "contains_nan": None,
                        "lower_bound": struct.pack("<i", d_lo),
                        "upper_bound": struct.pack("<i", d_hi),
                    },
                ],
            }
        )
        mlist = os.path.join(meta_dir, f"snap-{snap_id}.avro")
        write_avro(mlist, MANIFEST_LIST_SCHEMA, list(manifests),
                   codec="deflate")
        snapshots.append(
            {
                "snapshot-id": snap_id,
                "timestamp-ms": 1700000000000 + snap_id,
                "sequence-number": snap_id,
                "summary": {"operation": "append"},
                "manifest-list": mlist,
                "schema-id": 0,
            }
        )

    if positional_deletes:
        snap_id = len(batches) + 1
        # recover data-file paths per partition from the manifests
        file_by_part = {}
        for mf in manifests:
            recs, _ = read_avro(mf["manifest_path"])
            for e in recs:
                part = e["data_file"]["partition"]
                file_by_part[(part["entity_type"], part["event_time_day"])] = (
                    e["data_file"]["file_path"]
                )
        del_rows = [
            {"file_path": file_by_part[(et, day)], "pos": pos}
            for et, day, pos in positional_deletes
        ]
        dpath = os.path.join(data_dir, f"pos-deletes-{snap_id}.parquet")
        pq.write_table(
            pa.table(
                {
                    "file_path": pa.array(
                        [r["file_path"] for r in del_rows], pa.string()
                    ),
                    "pos": pa.array(
                        [r["pos"] for r in del_rows], pa.int64()
                    ),
                }
            ),
            dpath,
        )
        et0, day0, _ = positional_deletes[0]
        dentry = {
            "status": 1,
            "snapshot_id": snap_id,
            "sequence_number": snap_id,
            "file_sequence_number": snap_id,
            "data_file": {
                "content": 1,  # POSITION DELETES
                "file_path": dpath,
                "file_format": "PARQUET",
                "partition": {"entity_type": et0, "event_time_day": day0},
                "record_count": len(del_rows),
                "file_size_in_bytes": os.path.getsize(dpath),
                "lower_bounds": None,
                "upper_bounds": None,
            },
        }
        dmanifest = os.path.join(meta_dir, f"manifest-del-{snap_id}.avro")
        write_avro(dmanifest, DELETE_MANIFEST_SCHEMA, [dentry],
                   codec="deflate")
        manifests.append(
            {
                "manifest_path": dmanifest,
                "manifest_length": os.path.getsize(dmanifest),
                "partition_spec_id": 0,
                "content": 1,  # DELETE manifest
                "sequence_number": snap_id,
                "min_sequence_number": snap_id,
                "added_snapshot_id": snap_id,
                "added_files_count": 1,
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": len(del_rows),
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
                "partitions": None,
            }
        )
        mlist = os.path.join(meta_dir, f"snap-{snap_id}.avro")
        write_avro(mlist, MANIFEST_LIST_SCHEMA, list(manifests),
                   codec="deflate")
        snapshots.append(
            {
                "snapshot-id": snap_id,
                "timestamp-ms": 1700000000000 + snap_id,
                "sequence-number": snap_id,
                "summary": {"operation": "overwrite"},
                "manifest-list": mlist,
                "schema-id": 0,
            }
        )
        batches = batches + [None]  # bump version/current-snapshot

    meta = {
        "format-version": 2,
        "table-uuid": str(uuid.uuid4()),
        "location": table_dir,
        "last-sequence-number": len(batches),
        "last-updated-ms": 1700000000000 + len(batches),
        "last-column-id": 6,
        "current-schema-id": 0,
        "schemas": [
            {"type": "struct", "schema-id": 0, "fields": SCHEMA_FIELDS}
        ],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": PARTITION_SPEC}],
        "last-partition-id": 1001,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "current-snapshot-id": len(batches),
        "snapshots": snapshots,
    }
    with open(os.path.join(meta_dir, f"v{len(batches)}.metadata.json"),
              "w") as f:
        json.dump(meta, f)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write(str(len(batches)))
