"""Iceberg partition-spec evolution (spec "Partition Evolution"):
``iceberg_evolve_partition`` appends a NEW default spec without
touching committed files; every verb (append/upsert/merge/
delete_where/rewrite/changes/rollback) keeps working across the
boundary, and scans interpret — and PRUNE — each data file under the
spec it was written with. Also pins the TIMESTAMP_MICROS staged-write
fix: Spark's default INT96 timestamps carry no parquet footer stats,
so manifests recorded no bounds for timestamp columns and time-range
file pruning silently never fired (reference layout parity:
IcebergOfflineStore.java:78-114 — the offline store IS an Iceberg
table, and layout evolution is how a growing deployment re-buckets
it without a rewrite)."""

import datetime
import json
import os

import pytest
from pyspark.sql import functions as F

from feature_store_spark.sources.iceberg import IcebergTable, read_avro
from feature_store_spark.sources.iceberg_write import (
    iceberg_append,
    iceberg_delete_where,
    iceberg_evolve_partition,
    iceberg_rewrite,
    iceberg_upsert,
)


def _era1(spark):
    # region r{i%3}; month 1+i%3 (region and month co-move: every
    # era-1 file gets tight event_time bounds)
    return spark.createDataFrame(
        [
            (i, f"r{i % 3}", f"2024-0{1 + i % 3}-15T00:00:00")
            for i in range(30)
        ],
        "id int, region string, ts_s string",
    ).withColumn("event_time", F.to_timestamp("ts_s")).drop("ts_s")


def _era2(spark):
    return spark.createDataFrame(
        [
            (100 + i, f"r{i % 3}", f"2024-0{4 + i % 2}-20T00:00:00")
            for i in range(20)
        ],
        "id int, region string, ts_s string",
    ).withColumn("event_time", F.to_timestamp("ts_s")).drop("ts_s")


def _latest_meta(table_dir):
    md = os.path.join(table_dir, "metadata")
    names = sorted(
        f for f in os.listdir(md) if f.endswith(".metadata.json")
    )
    with open(os.path.join(md, names[-1])) as fh:
        return json.load(fh)


@pytest.fixture()
def evolved(spark, tmp_path):
    t1 = str(tmp_path / "t1")
    iceberg_append(
        _era1(spark), t1, partition_spec=[("region", "identity")]
    )
    iceberg_evolve_partition(t1, [("event_time", "month")])
    iceberg_append(_era2(spark), t1)  # no spec: derives the default
    return t1


class TestEvolveMetadata:
    def test_spec_history_and_default(self, spark, evolved):
        meta = _latest_meta(evolved)
        specs = {
            int(s["spec-id"]): s["fields"]
            for s in meta["partition-specs"]
        }
        # spec 0 = identity(region), spec 1 = unpartitioned sentinel,
        # spec 2 = month(event_time) and is the default
        assert [
            (f["name"], f["transform"]) for f in specs[0]
        ] == [("region", "identity")]
        assert specs[1] == []
        assert [
            (f["name"], f["transform"]) for f in specs[2]
        ] == [("event_time_month", "month")]
        assert int(meta["default-spec-id"]) == 2

    def test_field_ids_unique_and_reused(self, spark, tmp_path):
        t1 = str(tmp_path / "t")
        iceberg_append(
            _era1(spark), t1, partition_spec=[("region", "identity")]
        )
        iceberg_evolve_partition(t1, [("event_time", "month")])
        # back to a spec CONTAINING the original field: its field-id
        # must be REUSED (never reminted), and ids stay table-unique
        iceberg_evolve_partition(
            t1, [("region", "identity"), ("event_time", "month")]
        )
        meta = _latest_meta(t1)
        fid = {}
        for s in meta["partition-specs"]:
            for f in s["fields"]:
                key = (f["source-id"], f["transform"])
                if key in fid:
                    assert fid[key] == f["field-id"]
                fid[key] = f["field-id"]
        ids = [
            f["field-id"]
            for s in meta["partition-specs"]
            for f in s["fields"]
        ]
        assert len(set(ids)) == len(set(
            (f["source-id"], f["transform"])
            for s in meta["partition-specs"]
            for f in s["fields"]
        ))
        assert int(meta["last-partition-id"]) == max(ids)

    def test_refusals(self, spark, tmp_path, evolved):
        with pytest.raises(ValueError, match="not an iceberg table"):
            iceberg_evolve_partition(
                str(tmp_path / "nope"), [("region", "identity")]
            )
        with pytest.raises(ValueError, match="not in the.*schema|is not in"):
            iceberg_evolve_partition(evolved, [("ghost", "identity")])
        with pytest.raises(ValueError, match="already is the default"):
            iceberg_evolve_partition(evolved, [("event_time", "month")])
        # an append under the SUPERSEDED spec refuses loudly
        with pytest.raises(ValueError, match="partition spec is"):
            iceberg_append(
                _era1(spark),
                evolved,
                partition_spec=[("region", "identity")],
            )


class TestEvolvedScan:
    def test_union_and_per_spec_files(self, spark, evolved):
        t = IcebergTable(spark, evolved)
        assert t.scan().count() == 50
        files = t.data_files(None, None)
        assert sorted({f["spec_id"] for f in files}) == [0, 2]

    def test_prunes_under_both_specs(self, spark, evolved):
        t = IcebergTable(spark, evolved)
        total = t.data_files(None, None)
        # identity(region) prunes era-1 partitions; era-2 files
        # survive only via their region column stats
        pr = t.data_files(None, [("region", "=", "r1")])
        assert 0 < len(pr) < len(total)
        assert t.scan(filters=[("region", "=", "r1")]).count() == 17
        # a time-range filter prunes era-1 via timestamp column stats
        # (the INT96→MICROS fix) and era-2 via month partitions
        apr = int(
            datetime.datetime(
                2024, 4, 1, tzinfo=datetime.timezone.utc
            ).timestamp()
            * 1_000_000
        )
        pr2 = t.data_files(None, [("event_time", ">=", apr)])
        assert {f["spec_id"] for f in pr2} == {2}
        assert (
            t.scan(filters=[("event_time", ">=", apr)]).count() == 20
        )

    def test_timestamp_bounds_recorded(self, spark, tmp_path):
        """Regression: staged parquet must carry timestamp footer
        stats (INT64 micros), so manifests record bounds."""
        t1 = str(tmp_path / "tb")
        iceberg_append(
            _era1(spark), t1, partition_spec=[("region", "identity")]
        )
        meta = _latest_meta(t1)
        snap = meta["snapshots"][-1]
        et_id = next(
            f["id"]
            for f in meta["schemas"][-1]["fields"]
            if f["name"] == "event_time"
        )
        for m in read_avro(snap["manifest-list"])[0]:
            for e in read_avro(m["manifest_path"])[0]:
                lows = {
                    kv["key"]: kv["value"]
                    for kv in e["data_file"]["lower_bounds"] or []
                }
                assert et_id in lows


class TestSortOrderMetadata:
    def test_sort_by_records_sort_order(self, spark, tmp_path):
        """A sort_by write records the spec's sort-order metadata
        (identity/asc/nulls-first, order-id minted past the reserved
        0), an identical later order reuses its id, and an unsorted
        append leaves the table's default untouched."""
        t1 = str(tmp_path / "so")
        iceberg_append(
            _era1(spark),
            t1,
            partition_spec=[("region", "identity")],
            sort_by=["id"],
        )
        m1 = _latest_meta(t1)
        assert m1["default-sort-order-id"] == 1
        assert m1["sort-orders"][1]["fields"] == [
            {
                "transform": "identity",
                "source-id": 1,
                "direction": "asc",
                "null-order": "nulls-first",
            }
        ]
        iceberg_append(_era2(spark), t1)  # unsorted append
        m2 = _latest_meta(t1)
        assert m2["default-sort-order-id"] == 1
        iceberg_append(
            spark.createDataFrame(
                [(500, "r0", "2024-07-01T00:00:00")],
                "id int, region string, ts_s string",
            )
            .withColumn("event_time", F.to_timestamp("ts_s"))
            .drop("ts_s"),
            t1,
            sort_by=["id"],
        )
        m3 = _latest_meta(t1)
        assert m3["default-sort-order-id"] == 1
        assert len(m3["sort-orders"]) == 2  # reused, not re-minted


class TestEvolvedVerbs:
    def test_upsert_derives_default(self, spark, evolved):
        up = spark.createDataFrame(
            [(5, "rX")], "id int, region string"
        ).withColumn(
            "event_time",
            F.to_timestamp(F.lit("2024-06-01T00:00:00")),
        )
        iceberg_upsert(up, evolved, keys=["id"])
        t = IcebergTable(spark, evolved)
        rows = t.scan().filter("id = 5").collect()
        assert [r["region"] for r in rows] == ["rX"]
        assert t.scan().count() == 50
        # the new data manifest records the evolved spec id
        meta = _latest_meta(evolved)
        snap = [
            s
            for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        ][0]
        data_specs = {
            m["partition_spec_id"]
            for m in read_avro(snap["manifest-list"])[0]
            if m.get("content", 0) == 0
            and m["manifest_path"].find(f"-{snap['snapshot-id']}-") >= 0
        }
        assert 2 in data_specs

    def test_delete_where_and_rewrite(self, spark, evolved):
        iceberg_delete_where(spark, evolved, [("id", "<", 3)])
        t = IcebergTable(spark, evolved)
        assert t.scan().count() == 47
        # rewrite compacts the WHOLE table under the current default
        iceberg_rewrite(spark, evolved)
        t2 = IcebergTable(spark, evolved)
        assert t2.scan().count() == 47
        assert {
            f["spec_id"] for f in t2.data_files(None, None)
        } == {2}

    def test_scoped_rewrite_migrates_old_spec(self, spark, evolved):
        """``iceberg_rewrite(spec_ids=[0])`` replaces ONLY the era-1
        files with their live rows under the evolved default spec;
        era-2 files carry forward byte-identical, old snapshots keep
        the original layout, and the changelog is silent across the
        compaction."""
        t0 = IcebergTable(spark, evolved)
        before = sorted(
            tuple(r) for r in t0.scan().collect()
        )
        pre_snap = t0.meta["current-snapshot-id"]
        era2 = {
            f["path"]
            for f in t0.data_files(None, None)
            if f["spec_id"] != 0
        }
        iceberg_rewrite(spark, evolved, spec_ids=[0])
        t = IcebergTable(spark, evolved)
        files = t.data_files(None, None)
        assert {f["spec_id"] for f in files} == {2}
        # untouched era-2 files carry forward as the SAME files
        assert era2 <= {f["path"] for f in files}
        after = sorted(tuple(r) for r in t.scan().collect())
        assert after == before
        # time travel still reads the pre-rewrite layout
        assert sorted(
            tuple(r) for r in t.scan(snapshot_id=pre_snap).collect()
        ) == before
        # replace transition: silent in the change feed
        feed = t.changes(
            from_snapshot_id=pre_snap,
            to_snapshot_id=t.meta["current-snapshot-id"],
        )
        assert feed.count() == 0

    def test_scoped_rewrite_where_is_file_scoped(self, spark, tmp_path):
        """``where`` plans FILES: every live row of a planned file is
        preserved, including rows the predicate would not match."""
        t1 = str(tmp_path / "w")
        iceberg_append(
            _era1(spark), t1, partition_spec=[("region", "identity")]
        )
        t0 = IcebergTable(spark, t1)
        before = sorted(tuple(r) for r in t0.scan().collect())
        other = {
            f["path"]
            for f in t0.data_files(None, None)
            if "region=r0" not in f["path"]
        }
        iceberg_rewrite(spark, t1, where=[("region", "=", "r0")])
        t = IcebergTable(spark, t1)
        assert sorted(tuple(r) for r in t.scan().collect()) == before
        assert other <= {f["path"] for f in t.data_files(None, None)}

    def test_scoped_rewrite_compacts_mor_debt(self, spark, tmp_path):
        """Scoped rewrite applies outstanding deletes to the files it
        replaces — and a target whose rows ALL died commits a pure
        shrink (no new data file for it)."""
        t1 = str(tmp_path / "m")
        iceberg_append(
            _era1(spark), t1, partition_spec=[("region", "identity")]
        )
        # kill every r0 row; r0's file becomes pure MOR debt
        iceberg_delete_where(spark, t1, [("region", "=", "r0")])
        t0 = IcebergTable(spark, t1)
        n_before = t0.scan().count()
        iceberg_rewrite(spark, t1, where=[("region", "=", "r0")])
        t = IcebergTable(spark, t1)
        assert t.scan().count() == n_before
        assert not any(
            "region=r0" in f["path"]
            for f in t.data_files(None, None)
        )

    def test_scoped_rewrite_refusals(self, spark, tmp_path, evolved):
        with pytest.raises(ValueError, match="planned no files"):
            iceberg_rewrite(
                spark, evolved, where=[("region", "=", "zzz")]
            )
        with pytest.raises(ValueError, match="mutually exclusive"):
            iceberg_append(
                _era1(spark),
                evolved,
                replace=True,
                replace_paths={"x"},
            )
        with pytest.raises(ValueError, match="replace_paths is empty"):
            iceberg_append(_era1(spark), evolved, replace_paths=set())
        with pytest.raises(ValueError, match="existing table"):
            iceberg_append(
                _era1(spark),
                str(tmp_path / "void"),
                replace_paths={"x"},
            )

    def test_merge_on_evolved_table(self, spark, evolved):
        """iceberg_merge derives the evolved default spec for its
        replacement/insert files — arm semantics hold across the
        spec boundary."""
        from feature_store_spark.sources.iceberg_write import (
            iceberg_merge,
        )

        src = spark.createDataFrame(
            [(5, "rZ"), (999, "rN")], "id int, region string"
        ).withColumn(
            "event_time",
            F.to_timestamp(F.lit("2024-06-15T00:00:00")),
        )
        _snap, nu, nd, ni = iceberg_merge(
            src,
            evolved,
            keys=["id"],
            when_matched=[
                {
                    "condition": None,
                    "action": "update",
                    "set": {"region": "src.region"},
                }
            ],
        )
        assert (nu, nd, ni) == (1, 0, 1)
        t = IcebergTable(spark, evolved)
        rows = {
            r["id"]: r["region"]
            for r in t.scan().filter("id in (5, 999)").collect()
        }
        assert rows == {5: "rZ", 999: "rN"}
        assert t.scan().count() == 51

    def test_changes_across_evolution(self, spark, evolved):
        t = IcebergTable(spark, evolved)
        sids = [s for s, _ in t.snapshots()]
        feed = t.changes(
            from_snapshot_id=sids[0], to_snapshot_id=sids[-1]
        )
        ops = {
            r["_change_type"]
            for r in feed.select("_change_type").distinct().collect()
        }
        assert "insert" in ops
        assert feed.filter("_change_type = 'insert'").count() == 20
