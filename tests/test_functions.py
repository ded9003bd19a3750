import hashlib

import pytest
from pyspark.sql import functions as F

from feature_store_spark.functions import (
    hash_bucket_expr,
    hash_bucket_py,
    schema_hash_expr,
    schema_hash_py,
)

# The 15-feature fraud schema (FIXTURES.md §4) — the cross-language
# golden vector: engine hash must equal the reference algorithm's.
FRAUD_FEATURES = [
    "gmv_30d", "gmv_90d", "txn_count_30d", "avg_txn_value",
    "active_days_30d", "chargeback_rate_90d", "refund_rate_30d",
    "dispute_count_90d", "fraud_reports_30d", "account_age_days",
    "days_since_last_payout", "gmv_velocity_pct", "txn_velocity_pct",
    "mcc_risk_score", "country_risk_score",
]


def reference_hash(names):
    """Independent re-statement of FeatureRegistryService.java:238-248."""
    return int(hashlib.md5(",".join(names).encode()).hexdigest()[:8], 16) % (2**31 - 1)


def test_schema_hash_matches_reference_algorithm():
    assert schema_hash_py(FRAUD_FEATURES) == reference_hash(FRAUD_FEATURES)
    assert schema_hash_py(["a", "b"]) == reference_hash(["a", "b"])


def test_schema_hash_order_sensitive():
    assert schema_hash_py(["a", "b"]) != schema_hash_py(["b", "a"])


def test_schema_hash_expr_matches_python(spark):
    csv = ",".join(FRAUD_FEATURES)
    row = spark.range(1).select(schema_hash_expr(F.lit(csv)).alias("h")).first()
    assert row["h"] == schema_hash_py(FRAUD_FEATURES)


def test_hash_bucket_expr_matches_python(spark):
    vals = ["apple", "banana", "", "z" * 100]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    got = {r["v"]: r["b"] for r in df.select("v", hash_bucket_expr(F.col("v")).alias("b")).collect()}
    for v in vals:
        assert got[v] == hash_bucket_py(v)


def test_embedding_binary_layout_golden():
    """Byte-exact parity with the reference's RocksDB value layout
    (RocksDBFeatureStore.java:119-127): big-endian u16 version, u16
    dim, then f32 values. Golden bytes computed by hand."""
    from feature_store_spark.functions import (
        pack_embedding_py,
        unpack_embedding_py,
    )

    raw = pack_embedding_py([1.0, -2.0], version=3)
    # version 3 -> 00 03, dim 2 -> 00 02, 1.0f -> 3f800000, -2.0f -> c0000000
    assert raw.hex() == "00030002" + "3f800000" + "c0000000"
    version, vals = unpack_embedding_py(raw)
    assert version == 3 and vals == [1.0, -2.0]
    with pytest.raises(ValueError):
        unpack_embedding_py(raw[:-1])


def test_embedding_codec_roundtrip_on_table(spark, sf_dir):
    """Column-level round-trip over the real embeddings table: pack to
    the reference layout, unpack, values survive (f32-exact)."""
    from feature_store_spark.functions import (
        pack_embedding_udf,
        unpack_embedding_udf,
    )
    from feature_store_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    packed = emb.select(
        "vec_id",
        F.col("embedding").cast("array<float>").alias("orig"),
        pack_embedding_udf(version=1)(
            F.col("embedding").cast("array<float>")
        ).alias("raw"),
    )
    back = packed.select(
        "vec_id", "orig", unpack_embedding_udf()(F.col("raw")).alias("u")
    )
    rows = back.collect()
    assert rows and all(r["u"]["version"] == 1 for r in rows)
    assert all(r["u"]["embedding"] == r["orig"] for r in rows)


def test_zorder_expr_matches_python_reference(spark):
    from pyspark.sql import functions as F

    from feature_store_spark.functions import zorder2_expr, zorder2_py

    grid = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x long, y long"
    )
    got = grid.select(
        "x", "y", zorder2_expr(F.col("x"), F.col("y"), bits=4).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == zorder2_py(r["x"], r["y"], bits=4)


def test_zorder_sort_clusters_both_dimensions():
    """The property that makes z-order worth a shuffle: split the
    z-sorted grid into consecutive chunks (files) and every chunk's
    min-max span is bounded in BOTH dimensions, so either-column
    filters prune files. A linear (x, y) sort leaves the trailing
    dimension's span at full width in every chunk."""
    from feature_store_spark.functions import zorder2_py

    pts = [(x, y) for x in range(32) for y in range(32)]
    zsorted = sorted(pts, key=lambda p: zorder2_py(p[0], p[1], bits=5))
    xsorted = sorted(pts)  # linear sort: x, then y
    n_chunks = 16
    sz = len(pts) // n_chunks

    def spans(order, dim):
        out = []
        for i in range(n_chunks):
            chunk = order[i * sz : (i + 1) * sz]
            vals = [p[dim] for p in chunk]
            out.append(max(vals) - min(vals))
        return sum(out) / len(out)

    # z-order: both dims bounded well under full width (31)
    assert spans(zsorted, 0) <= 8
    assert spans(zsorted, 1) <= 8
    # linear sort: x clusters perfectly, y spans the full domain
    assert spans(xsorted, 0) <= 2
    assert spans(xsorted, 1) == 31


def test_unpack_embedding_null_blob_yields_null_struct(spark):
    """A NULL blob unpacks to NULL fields instead of a TypeError in
    the Arrow batch; corrupt blobs still raise."""
    from feature_store_spark.functions import (
        pack_embedding_py,
        unpack_embedding_udf,
    )

    df = spark.createDataFrame(
        [(1, bytearray(pack_embedding_py([1.0, 2.0]))), (2, None)],
        "id int, blob binary",
    )
    out = {
        r["id"]: r["u"]
        for r in df.select(
            "id", unpack_embedding_udf()(F.col("blob")).alias("u")
        ).collect()
    }
    assert out[1]["version"] == 1 and out[1]["embedding"] == [1.0, 2.0]
    assert out[2]["version"] is None and out[2]["embedding"] is None
