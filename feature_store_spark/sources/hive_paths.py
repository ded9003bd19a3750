"""Hive-style partition-path escaping, the dialect Spark's file
writers emit (``org.apache.spark.sql.catalyst.catalog
.ExternalCatalogUtils.escapePathName`` — itself a port of Hive
``FileUtils.escapePathName``).

Why this module exists: every ``df.write.partitionBy(...)`` escapes
special characters (``:`` ``%`` ``#`` ``=`` ``/`` control chars, ...)
in the directory segment, so ``day=2024-01-01 00%3A00`` on disk means
the REAL value ``2024-01-01 00:00``. The Delta/Iceberg transaction
logs must record the real value (Delta PROTOCOL.md: ``partitionValues``
is "a map from partition column to value for this logical file"), and
path reconstruction must re-escape. Parsing a directory segment
verbatim silently corrupts every string partition value containing an
escapable character — pruning drops matching files and injected
partition literals carry the escaped text.

The reference stores partition values only through real Iceberg
(``IcebergOfflineStore.java:54-57``), which handles this inside the
library; this module is the equivalent contract for the from-scratch
log writers here.
"""

from __future__ import annotations

import re

# The exact character set Spark/Hive escape in partition dir names:
# ASCII control chars, DEL, and the shell/URI-special punctuation.
_ESCAPED = set('"#%\'*/:=?\\{[]^\x7f') | {chr(i) for i in range(1, 32)}

#: Hive's sentinel directory value for a NULL partition value.
HIVE_DEFAULT_PARTITION = "__HIVE_DEFAULT_PARTITION__"

_PCT_RE = re.compile(r"%([0-9A-Fa-f]{2})")


def hive_escape(value: str | None) -> str:
    """Real partition value -> directory-segment text (``%XX`` upper-
    hex for each special char; ``None`` -> the Hive null sentinel)."""
    if value is None:
        return HIVE_DEFAULT_PARTITION
    return "".join(
        f"%{ord(ch):02X}" if ch in _ESCAPED else ch for ch in value
    )


def hive_unescape(seg_value: str) -> str | None:
    """Directory-segment text -> real partition value (``%XX`` decoded;
    the Hive null sentinel -> ``None``). Inverse of :func:`hive_escape`
    for every value Spark's writers can produce."""
    if seg_value == HIVE_DEFAULT_PARTITION:
        return None
    return _PCT_RE.sub(lambda m: chr(int(m.group(1), 16)), seg_value)


def parse_partition_segs(rel_path: str) -> dict[str, str | None]:
    """Parse ``k1=v1/k2=v2/file.parquet`` into real (unescaped)
    partition values. Column names are unescaped too (Spark escapes
    both sides of the segment).

    The FINAL segment is the file name and is never parsed (review
    r10: an ``=`` inside a file name — retries, copies, external
    writers — used to inject a phantom partition key into the map
    that log writers then recorded as a real partition value)."""
    out: dict[str, str | None] = {}
    for seg in rel_path.split("/")[:-1]:
        if "=" not in seg:
            continue
        k, v = seg.split("=", 1)
        uk = hive_unescape(k)
        if uk is not None:
            out[uk] = hive_unescape(v)
    return out
