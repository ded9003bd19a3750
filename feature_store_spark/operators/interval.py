"""Bucketed interval (range) join.

Spark has no native range-join optimization: a join whose only
predicate is ``point BETWEEN start AND end`` plans as a broadcast
nested loop (or a cartesian product when neither side fits in memory)
— O(|points| x |intervals|) comparisons, a non-starter at scale.

The standard rewrite buckets time into fixed-width slots: each point
lands in exactly ONE slot; each interval is replicated to every slot
it overlaps (``sequence`` + ``explode``). A point and an interval can
then only match inside the point's slot, so the theta join becomes a
hash equi-join on (slot [+ optional keys]) followed by the exact
BETWEEN filter — one shuffle, whole-stage-codegen'd, no nested loop.
(Databricks exposes the same rewrite as the RANGE_JOIN hint; engines
like Flink/Trino do the equivalent binning internally.)

Scale notes (100 TB):
- shuffle volume = |points| + sum(interval_len / bucket_width) rows:
  ``bucket_width`` trades replication (small width, many copies of
  long intervals) against bucket selectivity (large width, more
  false candidates for the BETWEEN filter). Pick width ~= the median
  interval length; ``max_buckets_per_interval`` hard-caps the
  replication factor so one open-ended interval cannot fan out into
  millions of rows (fail loudly, not silently explode).
- with equality ``keys`` the bucket column simply tightens an
  existing hash join; keyless range joins get a real partitioning
  axis (the slot) instead of a single broadcast loop.
- hot slots (event spikes) are ordinary groupBy skew: AQE skew-join
  handles them, or salt the slot column via ``operators.skew``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SLOT = "__islot"


def _slot(col: Column, width_s: int) -> Column:
    # unix seconds div width — integer div keeps it exact for any epoch
    return F.unix_timestamp(col).cast("long") / F.lit(width_s)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_width_s: int = 86400,
    keys: Sequence[str] = (),
    max_buckets_per_interval: int = 1024,
    inclusive_end: bool = True,
) -> DataFrame:
    """Join each point row to every interval row whose
    ``[start, end]`` (or ``[start, end)``) window contains
    ``point_ts``, optionally also matching on equality ``keys``.

    Output columns = all of ``points`` + all of ``intervals`` (names
    must be disjoint apart from ``keys``). Implemented as the bucketed
    equi-join rewrite described in the module docstring.
    """
    overlap = (set(points.columns) & set(intervals.columns)) - set(keys)
    if overlap:
        raise ValueError(
            f"interval_join: overlapping non-key columns {sorted(overlap)}; "
            "rename/select before joining"
        )

    pslot = F.floor(_slot(F.col(point_ts), bucket_width_s))
    s0 = F.floor(_slot(F.col(start_col), bucket_width_s))
    s1 = F.floor(_slot(F.col(end_col), bucket_width_s))
    # NULL bounds also fall to the raise branch (NULL < k is NULL):
    # an interval with an unknown endpoint is undefined, and silently
    # dropping it via sequence(NULL) would under-join. coalesce keeps
    # the error message readable instead of concat-nulling it away.
    # INVERTED intervals (end < start) must hit the guard too (review
    # r10): their negative span trivially satisfied the < cap check
    # while sequence(s0, s1) with s0 > s1 DESCENDS |span|+1 rows — one
    # swapped-dates/sentinel row fanned out ~4B slots at 60 s buckets
    # with no diagnostic, exactly the silent explosion the cap exists
    # to prevent.
    guard = (
        (s1 >= s0) & ((s1 - s0) < F.lit(max_buckets_per_interval))
    )
    slots = F.when(guard, F.sequence(s0, s1)).otherwise(
        F.raise_error(
            F.concat(
                F.lit("interval_join: interval spans >= "),
                F.lit(str(max_buckets_per_interval)),
                F.lit(" buckets, is inverted (end < start), or has "),
                F.lit("NULL bounds; raise "),
                F.lit("bucket_width_s, cap interval length, or filter "),
                F.lit("bad endpoints (start="),
                F.coalesce(F.col(start_col).cast("string"), F.lit("NULL")),
                F.lit(", end="),
                F.coalesce(F.col(end_col).cast("string"), F.lit("NULL")),
                F.lit(")"),
            )
        )
    )

    p = points.withColumn(_SLOT, pslot)
    iv = intervals.withColumn(_SLOT, F.explode(slots))

    end_ok = (
        F.col(point_ts) <= F.col(end_col)
        if inclusive_end
        else F.col(point_ts) < F.col(end_col)
    )
    return (
        p.join(iv, [_SLOT, *keys])
        .filter((F.col(point_ts) >= F.col(start_col)) & end_ok)
        .drop(_SLOT)
    )
