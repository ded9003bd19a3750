"""Offline store: the EAV ``feature_records`` fact table
(IcebergOfflineStore.java:42-52) as partitioned Parquet/Delta, plus the
training-data generation entry point.

Partitioning mirrors the reference's Iceberg spec —
identity(entity_type) x day(event_time) (:54-57) — which at 100 TB is
what lets the ASOF pre-scan prune to [min(label)-lookback, max(label)]
without touching other partitions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_RECORDS_SCHEMA = T.StructType(
    [
        T.StructField("entity_type", T.StringType(), False),
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("feature_name", T.StringType(), False),
        T.StructField("value_float", T.DoubleType(), True),
        T.StructField("value_string", T.StringType(), True),
        T.StructField("event_time", T.TimestampType(), False),
        T.StructField("created_at", T.TimestampType(), False),
        T.StructField("pipeline_id", T.StringType(), True),
        T.StructField("view_version", T.IntegerType(), True),
    ]
)


class OfflineStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def write_records(self, df: DataFrame, mode: str = "append") -> None:
        """S1/S2: partitioned append. ``event_date`` is a derived
        partition column (day(event_time))."""
        (
            df.withColumn("event_date", F.to_date("event_time"))
            .write.mode(mode)
            .partitionBy("entity_type", "event_date")
            .parquet(self.path)
        )

    @staticmethod
    def _apply_scan_filters(
        df: DataFrame,
        entity_type: str | None,
        feature_names: Sequence[str] | None,
        time_min,
        time_max,
    ) -> DataFrame:
        """The shared predicate chain of every scan variant — one
        definition so a semantics fix cannot diverge between the
        plain and the manifested store."""
        if entity_type is not None:
            df = df.filter(F.col("entity_type") == entity_type)
        if feature_names is not None:
            df = df.filter(F.col("feature_name").isin(list(feature_names)))
        # time bounds ALSO derive event_date partition predicates
        # (review r10l): Catalyst cannot infer bounds on the derived
        # partition column from an event_time filter, so every date
        # partition of the entity used to be listed and its footers
        # opened. The date bounds are widened TWO days on each side
        # (ADVICE r10): to_date depends on the session timezone, and
        # the extreme writer/reader zone pair (UTC+14 vs UTC-12) puts
        # two instants' local dates up to 26h — TWO calendar days —
        # apart. The predicate is only a pruning aid; the row-level
        # event_time filter (kept below) preserves exactness.
        if time_min is not None:
            df = df.filter(
                (F.col("event_time") >= F.lit(time_min))
                & (
                    F.col("event_date")
                    >= F.date_sub(F.to_date(F.lit(time_min)), 2)
                )
            )
        if time_max is not None:
            df = df.filter(
                (F.col("event_time") <= F.lit(time_max))
                & (
                    F.col("event_date")
                    <= F.date_add(F.to_date(F.lit(time_max)), 2)
                )
            )
        return df

    def scan(
        self,
        entity_type: str | None = None,
        feature_names: Sequence[str] | None = None,
        time_min=None,
        time_max=None,
    ) -> DataFrame:
        """S3/F1/F2: filtered scan. All predicates are plain ``filter``
        calls — Catalyst pushes them into the parquet scan and prunes
        partitions (the work IcebergOfflineStore.java:140-147 does by
        hand with Expressions.and)."""
        return self._apply_scan_filters(
            self.spark.read.parquet(self.path),
            entity_type,
            feature_names,
            time_min,
            time_max,
        )

    def manifested(self) -> "ManifestedOfflineStore":
        """Upgrade to the transactional variant (same path/layout plus
        manifest snapshots)."""
        return ManifestedOfflineStore(self.spark, self.path)

    def generate_training_dataset(
        self,
        entity_type: str,
        feature_names: Sequence[str],
        label_events: DataFrame,
        lookback_days: float = 180.0,
        missing_as_nan: bool = True,
    ) -> DataFrame:
        """The reference's analytical query (§3.2): point-in-time
        feature attachment for each (entity_id, event_time, label) row.
        Missing -> NaN to match IcebergOfflineStore.java:189 (pass
        ``missing_as_nan=False`` to keep SQL nulls). Runs the
        single-shuffle columnar ASOF plan (operators.asof)."""
        from feature_store_spark.operators.asof import asof_training_set_columnar

        # bound the records scan by the LABEL time range (one tiny agg
        # over the label side): with the date-partition predicates in
        # _apply_scan_filters this is what actually prunes the
        # flagship training path to [min(label)-lookback, max(label)]
        # as the module docstring promises (review r10l) — previously
        # no time bound reached the scan at all
        import datetime as _dt

        b = label_events.agg(
            F.min("event_time").alias("lo"), F.max("event_time").alias("hi")
        ).first()
        time_min = time_max = None
        if b["lo"] is not None:
            time_min = b["lo"] - _dt.timedelta(days=float(lookback_days))
            time_max = b["hi"]
        records = self.scan(
            entity_type=entity_type,
            feature_names=feature_names,
            time_min=time_min,
            time_max=time_max,
        )
        out = asof_training_set_columnar(
            label_events,
            records,
            feature_names,
            lookback_days=lookback_days,
        )
        if missing_as_nan:
            out = out.na.fill(float("nan"), subset=list(feature_names))
        return out


class ManifestedOfflineStore(OfflineStore):
    """S1/S2 with the reference's COMMIT BOUNDARY: appends and MERGEs
    go through :class:`~feature_store_spark.sources.manifest.
    ManifestedTable` (write files → claim manifest version → atomic
    pointer flip), the protocol IcebergOfflineStore.java:78-114 gets
    from Iceberg. A crashed writer never exposes a partial table;
    concurrent appenders serialize on the version claim with no data
    rewrite. ``scan`` keeps the same pushdown/pruning behavior — the
    snapshot reads as an explicit file list under a basePath, so hive
    partition values still parse and prune."""

    PARTITIONING = ("entity_type", "event_date")

    def __init__(self, spark: SparkSession, path: str):
        from feature_store_spark.sources.manifest import ManifestedTable

        super().__init__(spark, path)
        self.table = ManifestedTable(spark, path)

    def _dated(self, df: DataFrame) -> DataFrame:
        return df.withColumn("event_date", F.to_date("event_time"))

    def write_records(self, df: DataFrame, mode: str = "append") -> int:
        # only the two transactional modes exist here — Spark modes
        # like 'ignore'/'error' must not fall through to a DESTRUCTIVE
        # snapshot replacement (review r10: any unrecognized mode,
        # typos included, silently overwrote the committed table)
        dated = self._dated(df)
        if mode == "append":
            return self.table.append(dated, partition_by=self.PARTITIONING)
        if mode == "overwrite":
            return self.table.overwrite(
                dated, partition_by=self.PARTITIONING
            )
        raise ValueError(
            f"ManifestedOfflineStore.write_records: mode {mode!r} — "
            "the transactional store supports 'append' and 'overwrite'"
        )

    def merge_records(
        self, updates: DataFrame, txn: tuple[str, int] | None = None
    ) -> int:
        """Last-writer-wins MERGE on the EAV key, committed atomically
        (copy-on-write; readers see pre- or post-merge, never half).
        ``txn`` passes an idempotence token through for streaming
        upsert pipelines (see ``ManifestedTable.merge_upsert``)."""
        return self.table.merge_upsert(
            self._dated(updates),
            keys=["entity_type", "entity_id", "feature_name"],
            order_col="event_time",
            tiebreak_cols=["created_at"],
            partition_by=self.PARTITIONING,
            txn=txn,
        )

    def scan(
        self,
        entity_type: str | None = None,
        feature_names: Sequence[str] | None = None,
        time_min=None,
        time_max=None,
    ) -> DataFrame:
        # manifest-level data skipping on the time bounds: files whose
        # committed event_time [min,max] cannot overlap are dropped at
        # PLANNING time (the ASOF pre-scan's lookback window never
        # opens out-of-window footers); the filters below still apply
        # in full — pruning only shrinks the file list, never the
        # predicate
        prune = (
            {"event_time": (time_min, time_max)}
            if (time_min is not None or time_max is not None)
            else None
        )
        return self._apply_scan_filters(
            self.table.read(prune=prune),
            entity_type,
            feature_names,
            time_min,
            time_max,
        )
