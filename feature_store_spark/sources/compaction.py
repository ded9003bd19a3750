"""Small-file compaction for parquet tables.

Continuously-appended tables (streaming upserts, per-micro-batch
writes, the offline EAV store's daily appends) accumulate thousands of
KB-sized files; at 100 TB the resulting footer/open overhead dominates
scan time and the NameNode/listing cost dominates planning. Compaction
rewrites a table (or one partition of it) into files near a target
size — the OPTIMIZE operation of Delta/Iceberg, expressed with plain
Spark + parquet.

Scale notes:
- the rewrite is one job: scan → repartition(n_target) → write. No
  driver-side row handling; file counting/sizing is metadata listing.
- ``n_target`` comes from measured on-disk bytes, not row counts, so
  compression ratio is preserved by construction.
- partitioned tables compact partition-by-partition: call
  :func:`compact` on each ``key=value`` leaf directory, so the unit
  of work stays bounded and a failed compact touches one partition.
  Calling it on the partitioned ROOT is rejected loudly — a flat
  rewrite there would fold the partition columns into the data and
  destroy the directory layout every reader prunes on.
- the swap is write-to-side-dir + atomic-ish rename. On a real
  cluster, pair the rewrite with a manifest commit
  (Delta/Iceberg commit protocols exist precisely because raw
  object-store rename is not atomic); the file-level mechanics here
  are the same either way and the swap is factored out in
  :func:`_swap_dirs` so a manifest commit can replace it. That
  protocol now exists in this repo:
  :mod:`feature_store_spark.sources.manifest` — for a
  ``ManifestedTable``, compaction is simply
  ``overwrite(read().repartition(n_target))``: one snapshot commit,
  old files reaped by ``vacuum()``.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def table_file_stats(path: str, suffix: str = ".parquet") -> dict:
    """Listing-only stats: file count, total bytes, min/max/mean file
    size. Driver-side metadata — never reads data pages."""
    sizes = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(suffix):
                sizes.append(os.path.getsize(os.path.join(root, f)))
    if not sizes:
        return {"n_files": 0, "total_bytes": 0, "min_bytes": 0,
                "max_bytes": 0, "mean_bytes": 0.0}
    return {
        "n_files": len(sizes),
        "total_bytes": sum(sizes),
        "min_bytes": min(sizes),
        "max_bytes": max(sizes),
        "mean_bytes": sum(sizes) / len(sizes),
    }


def partition_dirs(path: str) -> list[str]:
    """Immediate hive-style ``key=value`` partition subdirectories."""
    try:
        entries = sorted(os.listdir(path))
    except FileNotFoundError:
        return []
    return [
        os.path.join(path, e)
        for e in entries
        if "=" in e and os.path.isdir(os.path.join(path, e))
    ]


def plan_compaction(
    path: str, target_file_mb: int = 128, min_files_to_compact: int = 4
) -> dict:
    """Decide whether a compact is worth running: returns the listing
    stats plus ``n_target`` (files the rewrite would produce) and
    ``should_compact`` (enough files AND they are meaningfully smaller
    than target — rewriting already-healthy files is wasted IO)."""
    stats = table_file_stats(path)
    target_bytes = target_file_mb * 1024 * 1024
    n_target = max(1, -(-stats["total_bytes"] // target_bytes))  # ceil
    stats["n_target"] = int(n_target)
    stats["should_compact"] = (
        stats["n_files"] >= min_files_to_compact
        and stats["n_files"] > 2 * n_target
    )
    return stats


def _swap_dirs(old: str, new: str, expected: set[str] | None = None) -> None:
    """Replace ``old`` with ``new`` via rename. The factored-out swap
    point: substitute a manifest/metastore commit on object stores.

    ``expected`` is the CONCURRENT-APPEND GUARD (review r10): the file
    set the rewrite read. If the live dir holds files the rewrite
    never saw (a writer appended between scan and swap), the swap is
    REFUSED — renaming would sweep those committed rows into trash and
    rmtree them permanently while reporting success. The rename-based
    swap is inherently single-writer; tables with concurrent writers
    belong on :class:`~feature_store_spark.sources.manifest.
    ManifestedTable`, whose compact() conflicts instead via CAS."""
    if expected is not None:
        current = {
            fn
            for fn in os.listdir(old)
            if fn.endswith(".parquet")
        }
        unseen = current - expected
        if unseen:
            shutil.rmtree(new, ignore_errors=True)  # abandon rewrite
            raise RuntimeError(
                f"compact: {len(unseen)} file(s) appeared in {old!r} "
                "after the rewrite scanned it (concurrent writer?) — "
                "swap refused, table untouched. Use ManifestedTable "
                "for concurrently-written tables."
            )
    trash = f"{old}.compact-trash-{uuid.uuid4().hex[:8]}"
    os.rename(old, trash)
    os.rename(new, old)
    shutil.rmtree(trash, ignore_errors=True)


def compact(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    min_files_to_compact: int = 4,
    sort_cols: list[str] | None = None,
) -> dict:
    """Rewrite the parquet table at ``path`` into ~target-sized files.

    ``sort_cols`` re-clusters while compacting (e.g. a Z-order key via
    ``functions.zorder2_expr``) so the rewrite also restores data-
    skipping locality — compaction and re-clustering share the same
    pass. Returns the before/after stats with ``compacted`` flag;
    a no-op (healthy table) returns ``compacted=False`` and leaves
    every byte untouched.
    """
    parts = partition_dirs(path)
    if parts:
        raise ValueError(
            f"compact: {path!r} is a partitioned table root "
            f"({len(parts)} key=value subdirs, e.g. "
            f"{os.path.basename(parts[0])!r}); a flat rewrite would "
            "destroy the partition layout. Compact each partition "
            "directory instead (see partition_dirs())."
        )
    plan = plan_compaction(path, target_file_mb, min_files_to_compact)
    if not plan["should_compact"]:
        return {"compacted": False, "before": plan, "after": plan}

    # snapshot the file set BEFORE reading: the swap refuses if any
    # file the rewrite never saw appears later (concurrent append)
    seen = {
        fn for fn in os.listdir(path) if fn.endswith(".parquet")
    }
    df: DataFrame = spark.read.parquet(path)
    out = df.repartition(plan["n_target"])
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    side = f"{path}.compact-{uuid.uuid4().hex[:8]}"
    out.write.mode("overwrite").parquet(side)
    _swap_dirs(path, side, expected=seen)
    return {
        "compacted": True,
        "before": plan,
        "after": table_file_stats(path),
    }
