"""Delta Lake interop: log replay, partition + stats pruning at the
file-list level, time travel, checkpoint reads, protocol gates."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from feature_store_spark.sources.delta import DeltaTable, delta_append


@pytest.fixture(scope="module")
def table_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("delta") / "t")
    b1 = spark.range(100).select(
        F.when(F.col("id") % 2 == 0, "user").otherwise("merchant")
        .alias("etype"),
        F.col("id").alias("eid"),
        (F.col("id") * 1.5).alias("val"),
    )
    b2 = b1.withColumn("val", F.col("val") + 1000.0)
    assert delta_append(b1, d, partition_cols=["etype"]) == 0
    assert delta_append(b2, d, partition_cols=["etype"]) == 1
    return d


class TestDeltaScan:
    def test_full_scan_and_schema(self, spark, table_dir):
        t = DeltaTable(spark, table_dir)
        assert t.latest_version() == 1
        df = t.scan()
        assert df.count() == 200
        assert set(df.columns) == {"etype", "eid", "val"}
        schema = t.schema()
        assert {f["name"] for f in schema["fields"]} == {
            "etype", "eid", "val"
        }

    def test_time_travel(self, spark, table_dir):
        t = DeltaTable(spark, table_dir)
        assert t.scan(version=0).count() == 100

    def test_partition_pruning_at_file_level(self, spark, table_dir):
        t = DeltaTable(spark, table_dir)
        all_files = t.scan().inputFiles()
        df = t.scan(filters=[("etype", "=", "user")])
        assert 0 < len(df.inputFiles()) < len(all_files)
        assert all("etype=user" in f for f in df.inputFiles())
        assert df.count() == 100

    def test_stats_pruning_at_file_level(self, spark, table_dir):
        t = DeltaTable(spark, table_dir)
        all_files = t.scan().inputFiles()
        df = t.scan(filters=[("val", ">", 999.0)])
        assert 0 < len(df.inputFiles()) < len(all_files)
        assert df.count() == 100  # batch2 only

    def test_filters_reapplied_row_level(self, spark, table_dir):
        t = DeltaTable(spark, table_dir)
        df = t.scan(filters=[("etype", "=", "user"), ("eid", "<=", 10)])
        assert {r["eid"] for r in df.collect()} == {0, 2, 4, 6, 8, 10}

    def test_remove_actions_drop_files(self, spark, table_dir, tmp_path):
        import shutil

        d = str(tmp_path / "rm")
        shutil.copytree(table_dir, d)
        t = DeltaTable(spark, d)
        victim = t.data_files()[0]["path"]
        with open(os.path.join(d, "_delta_log",
                               f"{2:020d}.json"), "w") as f:
            f.write(json.dumps(
                {"remove": {"path": victim, "dataChange": True}}
            ) + "\n")
        t2 = DeltaTable(spark, d)
        assert t2.latest_version() == 2
        left = {a["path"] for a in t2.data_files()}
        assert victim not in left
        assert t2.scan().count() < 200

    def test_deletion_vector_feature_refused(self, spark, table_dir,
                                             tmp_path):
        import shutil

        d = str(tmp_path / "dv")
        shutil.copytree(table_dir, d)
        with open(os.path.join(d, "_delta_log",
                               f"{2:020d}.json"), "w") as f:
            f.write(json.dumps(
                {"protocol": {"minReaderVersion": 3,
                              "readerFeatures": ["deletionVectors"]}}
            ) + "\n")
        with pytest.raises(NotImplementedError, match="deletionVectors"):
            DeltaTable(spark, d).scan()

    def test_txn_append_is_idempotent(self, spark, tmp_path):
        """The protocol's txn action: a redelivered (app_id, version)
        append is a no-op; the high-water mark reads back per app."""
        d = str(tmp_path / "txn")
        df = spark.range(5).select(
            F.lit("user").alias("etype"), F.col("id").alias("eid")
        )
        assert delta_append(df, d, ["etype"], txn=("sink-1", 0)) == 0
        # redelivery: no new commit, same contents
        assert delta_append(df, d, ["etype"], txn=("sink-1", 0)) == 0
        t = DeltaTable(spark, d)
        assert t.latest_version() == 0
        assert t.scan().count() == 5
        assert t.txn_version("sink-1") == 0
        assert t.txn_version("other") == -1
        # next batch commits; an independent app is not blocked
        assert delta_append(df, d, ["etype"], txn=("sink-1", 1)) == 1
        assert delta_append(df, d, ["etype"], txn=("sink-2", 0)) == 2
        assert DeltaTable(spark, d).scan().count() == 15

    def test_stream_sink_exactly_once(self, spark, tmp_path):
        """availableNow stream through delta_append_sink: one commit
        per micro-batch, contiguous txn marks, and driving the sink
        body again with the last batch_id changes nothing."""
        from feature_store_spark.sources.delta import delta_append_sink

        d = str(tmp_path / "stream")
        src = str(tmp_path / "in")
        spark.range(40).select(
            F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("k"),
            F.col("id").alias("v"),
        ).repartition(4).write.parquet(src)
        stream = (
            spark.readStream.schema("k string, v long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        sink = delta_append_sink(f"{d}/table", "ev-sink",
                                 partition_cols=["k"])
        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)
        t = DeltaTable(spark, f"{d}/table")
        assert t.scan().count() == 40
        n_commits = t.latest_version() + 1
        assert n_commits >= 2
        hwm = t.txn_version("ev-sink")
        assert hwm == n_commits - 1  # contiguous batch marks
        # redelivery of the last batch: no state change
        sink(spark.createDataFrame([("a", 999)], "k string, v long"), hwm)
        t2 = DeltaTable(spark, f"{d}/table")
        assert t2.latest_version() + 1 == n_commits
        assert t2.scan().count() == 40

    def test_checkpoint_parquet_is_used(self, spark, table_dir, tmp_path):
        """A parquet checkpoint replaces the JSON prefix: delete the
        early commits, keep only the checkpoint + later commits."""
        import shutil

        import pyarrow as pa
        import pyarrow.parquet as pq

        d = str(tmp_path / "ckpt")
        shutil.copytree(table_dir, d)
        t = DeltaTable(spark, d)
        meta, adds, _txns = t._state(1)
        rows = []
        # pyarrow can't infer empty structs (configuration/format);
        # checkpoint only needs the fields the reader consumes
        slim_meta = {"id": meta["id"],
                     "schemaString": meta["schemaString"],
                     "partitionColumns": meta["partitionColumns"]}
        rows.append({"metaData": slim_meta, "protocol": None, "add": None,
                     "remove": None})
        rows.append({"metaData": None,
                     "protocol": {"minReaderVersion": 1,
                                  "minWriterVersion": 2,
                                  "readerFeatures": None},
                     "add": None, "remove": None})
        for a in adds:
            rows.append({"metaData": None, "protocol": None,
                         "add": {"path": a["path"],
                                 "partitionValues": a["partitionValues"],
                                 "size": a["size"],
                                 "stats": a.get("stats"),
                                 "modificationTime": 0,
                                 "dataChange": True},
                         "remove": None})
        tbl = pa.Table.from_pylist(rows)
        pq.write_table(
            tbl, os.path.join(d, "_delta_log",
                              f"{1:020d}.checkpoint.parquet")
        )
        for v in (0, 1):
            os.remove(os.path.join(d, "_delta_log", f"{v:020d}.json"))
        with open(os.path.join(d, "_delta_log",
                               f"{2:020d}.json"), "w") as f:
            f.write("\n")
        t2 = DeltaTable(spark, d)
        assert t2.scan().count() == 200
        assert t2.scan(filters=[("etype", "=", "user")]).count() == 100
