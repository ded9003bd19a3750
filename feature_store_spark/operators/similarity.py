"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the exact baseline; the scale path is
IVF-style clustering: assign every vector to its nearest centroid,
then search only the probed clusters — turning a 100 TB all-pairs scan
into (centroid broadcast join) + (per-cluster local search).

All arithmetic stays JVM-side via ``aggregate``/``zip_with`` higher-
order functions on array columns (no Python UDF, no explode for the
hot path).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def l2_squared(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k neighbors of a literal query vector: one scan, score
    expression in WSCG, TakeOrderedAndProject for the top-k. Ties break
    on id ascending."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.col(vec_col).cast("array<double>")
    if metric == "cosine":
        score = _dot(v, q) / (_norm(v) * _norm(q))
        order = [F.col("score").desc(), F.col(id_col).asc()]
    elif metric == "l2":
        score = l2_squared(v, q)
        order = [F.col("score").asc(), F.col(id_col).asc()]
    else:
        raise ValueError(metric)
    return (
        embeddings.select(F.col(id_col), score.alias("score"))
        .orderBy(*order)
        .limit(k)
    )


def knn_join(
    queries: DataFrame,
    embeddings: DataFrame,
    k: int = 10,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k neighbors for a (small, broadcastable) batch of query
    vectors: broadcast x scan, per-query row_number. This is the
    ScoreTopK shape (runtime/src/grpc_service.rs:30-89) with cosine as
    the model."""
    q = F.broadcast(
        queries.select(
            F.col(query_id_col), F.col(query_vec_col).cast("array<double>").alias("__q")
        )
    )
    e = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    )
    crossed = e.crossJoin(q)
    scored = crossed.select(
        F.col(query_id_col),
        F.col(id_col),
        (_dot(F.col("__v"), F.col("__q")) / (_norm(F.col("__v")) * _norm(F.col("__q")))).alias(
            "score"
        ),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def knn_join_arrow(
    queries: DataFrame,
    embeddings: DataFrame,
    k: int = 10,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Same result as :func:`knn_join`, Arrow/numpy physical plan.

    The (small, broadcastable) query batch is collected to a (q, d)
    matrix shipped in the UDF closure; each embeddings Arrow batch then
    scores ALL queries with one (B, d) x (d, q) matmul instead of B*q
    interpreted ``aggregate``/``zip_with`` reductions — ~20x on the
    bench shape, and the per-batch work stays vectorized at any scale.
    The per-query global top-k is the same window as knn_join.
    Differentially tested equal to knn_join (ties broken on id, scores
    f64 in both plans): id columns keep their input types, and a NULL
    embedding scores NULL — ranked last under the desc window, exactly
    as the higher-order plan ranks it.
    """
    import numpy as np
    import pandas as pd

    q_rows = queries.select(
        F.col(query_id_col), F.col(query_vec_col).cast("array<double>")
    ).collect()
    if not q_rows:
        return knn_join(
            queries, embeddings, k, query_id_col, query_vec_col, id_col, vec_col
        )
    qid_type = queries.schema[query_id_col].dataType.simpleString()
    eid_type = embeddings.schema[id_col].dataType.simpleString()
    qids = np.array([r[0] for r in q_rows], dtype=object)
    qm = np.asarray([r[1] for r in q_rows], dtype=np.float64)  # (q, d)
    qn = np.sqrt((qm * qm).sum(axis=1))

    def score_batches(batches):
        for pdf in batches:
            nq = len(qids)
            valid = pdf[vec_col].notna().to_numpy()
            frames = []
            vp = pdf[valid]
            if len(vp):
                v = np.asarray(vp[vec_col].tolist(), dtype=np.float64)
                vn = np.sqrt((v * v).sum(axis=1))
                sims = (v @ qm.T) / (vn[:, None] * qn[None, :])  # (B, q)
                frames.append(
                    pd.DataFrame(
                        {
                            id_col: np.repeat(vp[id_col].to_numpy(), nq),
                            query_id_col: np.tile(qids, len(vp)),
                            "score": sims.ravel(),
                        }
                    )
                )
            iv = pdf[~valid]
            if len(iv):
                # NULL vector -> NULL score (not NaN: Spark sorts NaN
                # FIRST on desc but NULL last, and knn_join yields NULL)
                frames.append(
                    pd.DataFrame(
                        {
                            id_col: np.repeat(iv[id_col].to_numpy(), nq),
                            query_id_col: np.tile(qids, len(iv)),
                            "score": pd.array(
                                [pd.NA] * (len(iv) * nq), dtype="Float64"
                            ),
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    scored = embeddings.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        score_batches,
        schema=f"{id_col} {eid_type}, {query_id_col} {qid_type}, score double",
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def centroids(
    embeddings: DataFrame,
    by_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group centroid via posexplode + avg per dimension + rebuild.
    (Also the building block of a k-means iteration.)"""
    dims = embeddings.select(
        F.col(by_col),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "__x"),
    )
    avg_dim = dims.groupBy(by_col, "dim").agg(F.avg("__x").alias("__c"))
    return avg_dim.groupBy(by_col).agg(
        F.array_sort(
            F.collect_list(F.struct("dim", "__c"))
        ).alias("__pairs")
    ).select(
        F.col(by_col),
        F.transform("__pairs", lambda p: p["__c"]).alias("centroid"),
    )


def assign_clusters(
    embeddings: DataFrame,
    cluster_centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_key: str = "label",
    centroid_vec: str = "centroid",
) -> DataFrame:
    """IVF assignment: nearest centroid (L2) per vector. Centroids are
    broadcast; cost is |vectors| x |centroids| array ops, all in WSCG."""
    e = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    )
    c = F.broadcast(
        cluster_centroids.select(
            F.col(centroid_key).alias("__ck"),
            F.col(centroid_vec).cast("array<double>").alias("__cv"),
        )
    )
    crossed = e.crossJoin(c).select(
        F.col(id_col),
        F.col("__ck"),
        l2_squared(F.col("__v"), F.col("__cv")).alias("__d"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("__d").asc(), F.col("__ck").asc())
    return (
        crossed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(F.col(id_col), F.col("__ck").alias("cluster"), F.col("__d").alias("dist_sq"))
    )


def ivf_topk(
    embeddings_with_cluster: DataFrame,
    cluster_centroids: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
    centroid_key: str = "label",
    centroid_vec: str = "centroid",
) -> DataFrame:
    """IVF search: rank centroids against the query on the driver-free
    plan (broadcast centroids, take n_probe nearest), then brute-force
    only within the probed clusters. At 100 TB with cluster-partitioned
    storage this prunes the scan to n_probe/n_clusters of the data."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    probed = (
        cluster_centroids.select(
            F.col(centroid_key).alias(cluster_col),
            l2_squared(F.col(centroid_vec).cast("array<double>"), q).alias("__d"),
        )
        .orderBy(F.col("__d").asc(), F.col(cluster_col).asc())
        .limit(n_probe)
        .select(cluster_col)
    )
    pruned = embeddings_with_cluster.join(F.broadcast(probed), cluster_col)
    v = F.col(vec_col).cast("array<double>")
    score = _dot(v, q) / (_norm(v) * _norm(q))
    return (
        pruned.select(F.col(id_col), score.alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_knn_join(
    queries: DataFrame,
    embeddings_with_cluster: DataFrame,
    cluster_centroids: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
    centroid_key: str = "label",
    centroid_vec: str = "centroid",
) -> DataFrame:
    """Batch IVF ANN: :func:`ivf_topk` for a whole (small,
    broadcastable) query batch in ONE plan instead of a driver loop.

    Probe selection is queries x centroids — both tiny — then the
    (query, probed-cluster) table is broadcast against the embedding
    table, so the big side is scanned once and only rows in SOME
    query's probed clusters survive; with cluster-partitioned storage
    that scan is partition-pruned to the union of probed clusters.
    Scoring + per-query top-k mirror knn_join (same window, same tie
    break), which makes the two directly comparable for recall."""
    q = queries.select(
        F.col(query_id_col),
        F.col(query_vec_col).cast("array<double>").alias("__q"),
    )
    qc = q.crossJoin(
        F.broadcast(
            cluster_centroids.select(
                F.col(centroid_key).alias(cluster_col),
                F.col(centroid_vec).cast("array<double>").alias("__c"),
            )
        )
    ).select(
        F.col(query_id_col),
        F.col(cluster_col),
        l2_squared(F.col("__q"), F.col("__c")).alias("__d"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("__d").asc(), F.col(cluster_col).asc()
    )
    probes = (
        qc.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= n_probe)
        .select(query_id_col, cluster_col)
    )
    cand = embeddings_with_cluster.select(
        F.col(id_col),
        F.col(cluster_col),
        F.col(vec_col).cast("array<double>").alias("__v"),
    ).join(F.broadcast(probes), cluster_col)
    scored = cand.join(F.broadcast(q), query_id_col).select(
        F.col(query_id_col),
        F.col(id_col),
        (
            _dot(F.col("__v"), F.col("__q"))
            / (_norm(F.col("__v")) * _norm(F.col("__q")))
        ).alias("score"),
    )
    wk = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(wk)).filter(
        F.col("rank") <= k
    )


def hyperplane_planes(n_planes: int, dim: int, seed: str = "hp") -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 — the same
    numbers are reproducible in any engine with md5 (or simply embedded
    as literals), which keeps LSH bucketing oracle-checkable. Component
    (p, i) = (int(md5(f"{seed}{p}_{i}")[:8], 16) % 2001 - 1000) / 1000."""
    import hashlib

    planes = []
    for p in range(n_planes):
        row = []
        for i in range(1, dim + 1):
            h = int(hashlib.md5(f"{seed}{p}_{i}".encode()).hexdigest()[:8], 16)
            row.append(((h % 2001) - 1000) / 1000.0)
        planes.append(row)
    return planes


def hyperplane_bucket(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int | None = None,
    planes: list[list[float]] | None = None,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector (sign bit of each
    plane projection packed into an int) — cosine-similar vectors
    collide with high probability (the SimHash construction applied to
    real vectors). A pure map-side projection: the planes ride along
    as literal arrays, no shuffle, no fitting step (vs IVF's centroid
    build), which makes it the bucketing of choice for embedding
    near-dup blocking on a table that is only ever scanned once."""
    if planes is None:
        if dim is None:
            raise ValueError("pass dim or planes")
        planes = hyperplane_planes(n_planes, dim)
    v = F.col(vec_col).cast("array<double>")
    bits = []
    for p, row in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in row])
        dot = F.aggregate(
            F.zip_with(v, plane, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
        )
        bits.append(F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return embeddings.withColumn(bucket_col, bucket.cast("long"))


def lsh_topk(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: Sequence[int] = (),
) -> DataFrame:
    """ANN top-k via hyperplane LSH: bucket the table (map-side),
    compute the query's bucket driver-side, scan only the colliding
    bucket, exact cosine inside. One partition-prunable equality
    predicate instead of a full scan — with the embedding table
    written partitioned/clustered by bucket this touches 1/2^planes
    of the data."""
    planes = hyperplane_planes(n_planes, len(query_vec))
    qbucket = 0
    for p, row in enumerate(planes):
        d = sum(a * b for a, b in zip(query_vec, row))
        if d >= 0:
            qbucket += 1 << p
    bucketed = hyperplane_bucket(
        embeddings, vec_col, n_planes, planes=planes
    ).filter(F.col("bucket") == qbucket)
    if exclude_ids:
        bucketed = bucketed.filter(~F.col(id_col).isin(list(exclude_ids)))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.col(vec_col).cast("array<double>")
    score = _dot(v, q) / (_norm(v) * _norm(q))
    return (
        bucketed.select(F.col(id_col), score.alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def kmeans_init_centroids(
    embeddings: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic init: the k lowest-id vectors seed clusters
    0..k-1 (oracle-reproducible; swap for k-means|| at scale without
    changing the iteration)."""
    return embeddings.filter(F.col(id_col) < k).select(
        F.col(id_col).cast("int").alias("cluster"),
        F.col(vec_col).cast("array<double>").alias("centroid"),
    )


def kmeans_fit(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Lloyd's k-means as a driver-looped dataflow (the iterative-
    algorithm pattern: O(k x dim) driver state, one distributed
    assign + update pass per iteration — how MLlib's KMeans runs
    underneath).

    Each iteration: broadcast the k centroids, assign every vector to
    its nearest (WSCG array math, no shuffle beyond the per-dimension
    centroid aggregation), recompute centroids as per-cluster means.
    Returns (centroids, last_assignment). ``checkpoint=True``
    localCheckpoints per iteration to cut lineage growth — required
    for large ``iters`` on a real cluster, irrelevant for 2-3 rounds.
    """
    cents = kmeans_init_centroids(embeddings, k, id_col, vec_col)
    assigned = None
    for _ in range(iters):
        assigned = assign_clusters(
            embeddings,
            cents,
            id_col=id_col,
            vec_col=vec_col,
            centroid_key="cluster",
            centroid_vec="centroid",
        )
        members = embeddings.join(assigned.select(id_col, "cluster"), id_col)
        cents = centroids(members, by_col="cluster", vec_col=vec_col)
        if checkpoint:
            cents = cents.localCheckpoint()
    return cents, assigned
