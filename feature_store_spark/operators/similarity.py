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


def _local_topk(s, ids, k: int, largest: bool) -> list[int]:
    """Per-batch local top-k row indices under the EXACT global
    ordering (score desc|asc, id asc) — the map-side half of the
    two-phase top-k (VERDICT r9 #1). NULL scores ride in as the
    -inf/+inf sentinel so they rank last yet still fill slots when a
    batch has fewer than k real candidates (matching the merge
    window's nulls-last semantics).

    Shape: numpy ``argpartition`` narrows to the k-th boundary, then
    every row TYING the boundary score joins the candidate set so the
    id tie-break can't drop a row the global sort would keep; the
    final exact ordering runs on that ~k-sized slice only. Mirrors
    the reference's fused per-block top-K + host merge
    (python/cuda_codegen/generator.py:784-911).

    NaN scores are folded into the sentinel HERE (review r10): a NaN
    boundary value makes every ``>=``/``<=`` comparison False and the
    candidate set empty, silently dropping real finite candidates —
    callers must ALSO fold NaN before emitting so the merge window
    never sees a raw NaN (Spark desc-sorts NaN first). NULL ids
    (None/NaN in the id array) tie-break FIRST among equal scores —
    Spark's asc nulls-first, the merge window's ordering."""
    import numpy as np

    B = int(s.shape[0])
    kk = min(int(k), B)
    if kk <= 0:
        return []
    sentinel = -np.inf if largest else np.inf
    s = np.where(np.isnan(s), sentinel, s)

    def _id_key(i):
        v = ids[i]
        null = v is None or (isinstance(v, float) and v != v)
        return (not null, 0 if null else v)

    if B > kk:
        if largest:
            part = np.argpartition(-s, kk - 1)
            kth = s[part[kk - 1]]
            cand = np.nonzero(s >= kth)[0]
        else:
            part = np.argpartition(s, kk - 1)
            kth = s[part[kk - 1]]
            cand = np.nonzero(s <= kth)[0]
    else:
        cand = np.arange(B)
    if largest:
        order = sorted(cand.tolist(), key=lambda i: (-s[i], _id_key(i)))
    else:
        order = sorted(cand.tolist(), key=lambda i: (s[i], _id_key(i)))
    return order[:kk]


def _finite_row(a, width: int):
    """Arrow-aware row validation for mapInPandas paths: a NULL array
    element arrives as NaN inside a float numpy array (NOT as None —
    review r10k: `x is None` checks were dead under Arrow, letting
    degenerate rows through to encode garbage or crash int casts).
    Returns the float64 array when the row is a dense finite vector
    of the expected width, else None."""
    import numpy as np

    if a is None:
        return None
    try:
        arr = np.asarray(a, dtype=np.float64)
    except (TypeError, ValueError):
        return None
    if arr.ndim != 1 or arr.shape[0] != width or np.isnan(arr).any():
        return None
    return arr


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
    """Cosine similarity — THE one formula every path in this module
    uses (review r5: five call sites used to inline it, so a fix had
    to land six times). ``try_divide``, not ``/``: a zero-norm vector
    (the common all-zeros fill for a missing embedding) made the bare
    division abort the whole job with DIVIDE_BY_ZERO under Spark 4's
    default ANSI mode; NULL ranks last under the desc top-k windows,
    which is exactly where a degenerate vector belongs. ``nanvl``
    folds NaN the same way (review r10k): Spark sorts NaN ABOVE every
    real number, so a single NaN element would otherwise put the
    garbage pair at rank 1 of every desc top-k instead of last."""
    return F.nanvl(
        F.try_divide(_dot(a, b), _norm(a) * _norm(b)),
        F.lit(None).cast("double"),
    )


def l2_squared(a: Column, b: Column) -> Column:
    """Squared L2 distance; NaN folds to NULL for the same rank-last
    contract as :func:`cosine` (asc consumers must order
    nulls-LAST — Spark's bare asc is nulls-first)."""
    return F.nanvl(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        F.lit(None).cast("double"),
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
        score = cosine(v, q)
        order = [F.col("score").desc(), F.col(id_col).asc()]
    elif metric == "l2":
        score = l2_squared(v, q)
        # asc is nulls-FIRST in Spark: degenerate (NULL-distance)
        # rows would fill the top-k ahead of real neighbors
        order = [F.col("score").asc_nulls_last(), F.col(id_col).asc()]
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
    the model. Queries with a NULL vector (or NULL elements) are
    excluded — matching :func:`knn_join_arrow`; a question that isn't
    a vector has no neighbors.

    Scale role: this higher-order plan is the READABLE EXACT TWIN —
    the differential oracle the recall gates rank against. Its window
    input is nq x N scored rows, so at corpus scale the production
    path is :func:`knn_join_arrow` (same answer, two-phase top-k,
    ≤ nq x k rows per Arrow batch into the merge)."""
    qv = F.col(query_vec_col)
    q = F.broadcast(
        queries.filter(
            qv.isNotNull() & ~F.exists(qv, lambda x: x.isNull())
        ).select(
            F.col(query_id_col), qv.cast("array<double>").alias("__q")
        )
    )
    e = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    )
    crossed = e.crossJoin(q)
    scored = crossed.select(
        F.col(query_id_col),
        F.col(id_col),
        cosine(F.col("__v"), F.col("__q")).alias("score"),
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
    """Same result as :func:`knn_join`, Arrow/numpy physical plan —
    TWO-PHASE top-k (VERDICT r9 #1).

    The (small, broadcastable) query batch is collected to a (q, d)
    matrix shipped in the UDF closure; each embeddings Arrow batch then
    scores ALL queries with one (B, d) x (d, q) matmul instead of B*q
    interpreted ``aggregate``/``zip_with`` reductions — ~20x on the
    bench shape, and the per-batch work stays vectorized at any scale.

    Phase 1 happens INSIDE each batch: a per-query local top-k
    (:func:`_local_topk` — argpartition + exact tie-break on the
    boundary slice) so a batch emits at most nq x k rows, not
    nq x B. Phase 2 is the same per-query window as knn_join, now a
    MERGE of nq x k x n_batches candidates instead of a shuffle of
    every (query, vector) score — at 10^10 vectors x 100 queries the
    exchange drops from 10^12 rows to ~10^6. This is the reference's
    fused per-block top-K + host merge shape
    (python/cuda_codegen/generator.py:784-911, docs/CUDA_CODEGEN.md:
    501-556) expressed as mapInPandas + window.

    Differentially tested equal to knn_join (ties broken on id, scores
    f64 in both plans): the union of per-batch top-ks always contains
    the global top-k because both use the SAME total order (score
    desc nulls-last, id asc). id columns keep their input types, and
    a DEGENERATE embedding — NULL array, NULL element, wrong
    dimension, or zero norm — scores NULL (the -inf sentinel
    locally), ranked last yet still filling local slots when a batch
    has fewer than k valid rows, matching the higher-order plan's
    try_divide/zip_with semantics. Queries with a NULL vector are
    excluded in BOTH twins — a question that isn't a vector has no
    neighbors.
    """
    scored = _knn_arrow_scored(
        queries, embeddings, k, query_id_col, query_vec_col, id_col, vec_col
    )
    if scored is None:
        return knn_join(
            queries, embeddings, k, query_id_col, query_vec_col, id_col, vec_col
        )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _knn_arrow_scored(
    queries: DataFrame,
    embeddings: DataFrame,
    k: int,
    query_id_col: str,
    query_vec_col: str,
    id_col: str,
    vec_col: str,
) -> DataFrame | None:
    """Phase-1 candidate stage of :func:`knn_join_arrow` — exposed so
    tests can assert the two-phase bound (the frame entering the merge
    window holds at most nq x k rows PER ARROW BATCH). Returns None
    when no query has a valid vector (caller falls back to the
    higher-order plan, which yields the same empty result)."""
    import numpy as np
    import pandas as pd

    q_rows = [
        r
        for r in queries.select(
            F.col(query_id_col), F.col(query_vec_col).cast("array<double>")
        ).collect()
        if r[1] is not None and all(x is not None for x in r[1])
    ]
    if not q_rows:
        return None
    dims = {len(r[1]) for r in q_rows}
    if len(dims) > 1:
        # loud, not a numpy shape crash mid-executor: the (q, d)
        # matmul needs one dimension; mixed-dimension query batches
        # have no meaningful shared neighbor space (the higher-order
        # twin NULL-scores every mismatched pair) — review r10
        raise ValueError(
            f"knn_join_arrow: query vectors must share one dimension, "
            f"got {sorted(dims)}; use knn_join for mixed-dimension "
            "batches"
        )
    qid_type = queries.schema[query_id_col].dataType.simpleString()
    eid_type = embeddings.schema[id_col].dataType.simpleString()
    qids = [r[0] for r in q_rows]
    qm = np.asarray([r[1] for r in q_rows], dtype=np.float64)  # (q, d)
    qn = np.sqrt((qm * qm).sum(axis=1))
    nq = len(qids)
    d = qm.shape[1]

    def score_batches(batches):
        for pdf in batches:
            B = len(pdf)
            if not B:
                continue
            # per-ROW validation, not just whole-array notna: a NULL
            # element or ragged dimension would crash np.asarray, and
            # a zero norm would mint a NaN that desc-sorts FIRST
            vals = [_finite_row(a, d) for a in pdf[vec_col].tolist()]
            valid = np.array([a is not None for a in vals], dtype=bool)
            # -inf = "NULL score": sorts last on desc like the merge
            # window's nulls-last, converted back to NULL on emit
            score = np.full((B, nq), -np.inf)
            if valid.any():
                v = np.asarray(
                    [vals[i] for i in np.nonzero(valid)[0]],
                    dtype=np.float64,
                )
                vn = np.sqrt((v * v).sum(axis=1))
                with np.errstate(divide="ignore", invalid="ignore"):
                    sims = (v @ qm.T) / (vn[:, None] * qn[None, :])
                sims[np.isnan(sims)] = -np.inf  # zero norms
                score[valid] = sims
            ids = pdf[id_col].to_numpy()
            out_q, out_i, out_s = [], [], []
            for qj in range(nq):
                s = score[:, qj]
                for ri in _local_topk(s, ids, k, largest=True):
                    out_q.append(qids[qj])
                    out_i.append(ids[ri])
                    out_s.append(
                        None if np.isneginf(s[ri]) else float(s[ri])
                    )
            yield pd.DataFrame(
                {
                    query_id_col: pd.Series(out_q, dtype=object),
                    id_col: pd.Series(out_i, dtype=object),
                    "score": pd.array(out_s, dtype="Float64"),
                }
            )

    return embeddings.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        score_batches,
        schema=f"{query_id_col} {qid_type}, {id_col} {eid_type}, score double",
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
    # nulls LAST: a degenerate centroid (NULL distance) must never
    # capture a vector ahead of a real one (review r10k)
    w = Window.partitionBy(id_col).orderBy(
        F.col("__d").asc_nulls_last(), F.col("__ck").asc()
    )
    return (
        crossed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col(id_col),
            # a vector with NO real distance (NULL/NaN embedding) is
            # UNASSIGNED, not arbitrarily parked in whichever cluster
            # the tie-break picked (review r10k)
            F.when(F.col("__d").isNotNull(), F.col("__ck")).alias(
                "cluster"
            ),
            F.col("__d").alias("dist_sq"),
        )
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
        .orderBy(F.col("__d").asc_nulls_last(), F.col(cluster_col).asc())
        .limit(n_probe)
        .select(cluster_col)
    )
    pruned = embeddings_with_cluster.join(F.broadcast(probed), cluster_col)
    v = F.col(vec_col).cast("array<double>")
    score = cosine(v, q)
    return (
        pruned.select(F.col(id_col), score.alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_probes(
    queries: DataFrame,
    cluster_centroids: DataFrame,
    n_probe: int,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    cluster_col: str = "cluster",
    centroid_key: str = "label",
    centroid_vec: str = "centroid",
) -> DataFrame:
    """Coarse-quantizer probe selection: the ``n_probe`` nearest
    centroids (L2, centroid-id tie-break) per query, as a
    (query_id, cluster) table. queries x centroids are both tiny —
    the crossJoin is broadcast and the ranking window partitions by
    query. Shared by :func:`ivf_knn_join`, :func:`ivfpq_search`, and
    the ``ivfpq_recall`` gate's file-pruning audit (the probe list is
    known BEFORE the code scan, so cluster-partitioned storage turns
    it into a static partition-pruning predicate)."""
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
    # nulls LAST (review r10k): a degenerate centroid must not
    # steal one of every query's n_probe slots
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("__d").asc_nulls_last(), F.col(cluster_col).asc()
    )
    return (
        qc.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= n_probe)
        .select(query_id_col, cluster_col)
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
    probes = ivf_probes(
        queries,
        cluster_centroids,
        n_probe,
        query_id_col=query_id_col,
        query_vec_col=query_vec_col,
        cluster_col=cluster_col,
        centroid_key=centroid_key,
        centroid_vec=centroid_vec,
    )
    cand = embeddings_with_cluster.select(
        F.col(id_col),
        F.col(cluster_col),
        F.col(vec_col).cast("array<double>").alias("__v"),
    ).join(F.broadcast(probes), cluster_col)
    scored = cand.join(F.broadcast(q), query_id_col).select(
        F.col(query_id_col),
        F.col(id_col),
        cosine(F.col("__v"), F.col("__q")).alias("score"),
    )
    wk = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    # NULL scores (degenerate vector on either side) are non-matches:
    # without the filter a NULL-vector query would get k arbitrary
    # rank-1..k rows (review r10k; knn_join excludes such queries)
    return (
        scored.filter(F.col("score").isNotNull())
        .withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
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
    first_dot = None
    for p, row in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in row])
        # nanvl: a NaN element makes every projection NaN, and
        # `NaN >= 0` is TRUE in Spark — such vectors herded into the
        # all-ones bucket alongside legitimately all-positive
        # vectors (review r10k); folded to NULL they fall through to
        # the NULL-bucket contract below
        dot = F.nanvl(_dot(v, plane), F.lit(None).cast("double"))
        if first_dot is None:
            first_dot = dot
        bits.append(F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    # Degenerate vector -> NULL bucket (review r5 + r10k): a whole-
    # NULL vector, a NULL ELEMENT, a ragged dimension (zip_with pads
    # with NULL), or a NaN element all make every plane projection
    # NULL — gate on the first projection, which is NULL exactly in
    # those cases, instead of v.isNotNull(), which only caught the
    # whole-NULL form and herded the rest into bucket 0 where they
    # bloat the collision block past max_bucket_size
    return embeddings.withColumn(
        bucket_col, F.when(first_dot.isNotNull(), bucket).cast("long")
    )


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
    score = cosine(v, q)
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
    changing the iteration).

    "k lowest ids", literally (review r5): the old ``id < k`` filter
    assumed a dense 0-based id space — 1-based, offset, or string ids
    seeded fewer than k (possibly zero) clusters and the fit silently
    degenerated. For dense 0-based ids the result is identical.
    Physical shape: orderBy+limit compiles to TakeOrderedAndProject
    (per-partition heaps, no global sort); the labeling window then
    runs over k rows only — never a single-partition pass of the
    corpus."""
    v = F.col(vec_col).cast("array<double>")
    take = (
        embeddings
        # only VALID vectors may seed (review r10k): a degenerate
        # low-id vector (NULL, NULL element, NaN) would mint a
        # centroid whose distances are NULL for every vector,
        # silently collapsing the fit toward one cluster
        .filter(
            v.isNotNull()
            & ~F.exists(v, lambda x: x.isNull() | F.isnan(x))
        )
        .select(F.col(id_col), v.alias("centroid"))
        .orderBy(F.col(id_col).asc())
        .limit(k)
    )
    w = Window.orderBy(F.col(id_col).asc())
    return take.select(
        (F.row_number().over(w) - 1).cast("int").alias("cluster"),
        F.col("centroid"),
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

    Empty clusters KEEP their previous centroid (review r5): the
    per-cluster mean only emits clusters with members, so a seed that
    attracts nothing would silently vanish and every later iteration
    (and downstream IVF probing) would run with k-1 clusters; carrying
    the old centroid is the standard Lloyd fallback and keeps k
    stable. ``iters=0`` returns the init centroids WITH their
    assignment (the documented contract), not ``(cents, None)``.
    """
    cents = kmeans_init_centroids(embeddings, k, id_col, vec_col)

    def _assign(cs):
        return assign_clusters(
            embeddings,
            cs,
            id_col=id_col,
            vec_col=vec_col,
            centroid_key="cluster",
            centroid_vec="centroid",
        )

    assigned = None
    for _ in range(iters):
        assigned = _assign(cents)
        members = embeddings.join(assigned.select(id_col, "cluster"), id_col)
        new_cents = centroids(members, by_col="cluster", vec_col=vec_col)
        # carry forward centroids of clusters that lost every member
        kept = cents.join(
            new_cents.select("cluster"), "cluster", "left_anti"
        )
        cents = new_cents.unionByName(kept)
        if checkpoint:
            cents = cents.localCheckpoint()
    if assigned is None:
        assigned = _assign(cents)
    return cents, assigned


def semantic_dedup_n_planes(
    n_rows: int, target_bucket_size: int = 1024
) -> int:
    """Plane count sized so the EXPECTED LSH bucket holds about
    ``target_bucket_size`` vectors: ``ceil(log2(n / target))``,
    clamped to [4, 30]. 30 planes = ~1e9 buckets, enough to keep
    expected buckets ~1K up to a trillion-row corpus while the
    bucket id still packs into a long; the floor of 4 keeps tiny
    fixtures from degenerating into one all-corpus bucket. More
    planes trade recall (a near-dup pair must agree on every sign
    bit), which is the same knob LSH banding exposes — at SemDeDup
    thresholds (>=0.95) pairs are nearly parallel, so per-plane
    disagreement probability is small."""
    import math

    over = max(int(n_rows), 1) / max(int(target_bucket_size), 1)
    return min(30, max(4, math.ceil(math.log2(max(over, 1.0)))))


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int | None = None,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str | None = None,
    target_bucket_size: int = 1024,
    max_bucket_size: int = 10_000,
    persist: bool = True,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, public method): semantic
    deduplication by embedding similarity — cluster the corpus, and
    within each cluster drop every item that has a LOWER-id neighbor
    with cosine >= ``threshold`` (the paper keeps one representative
    per semantic-duplicate group; lowest id is the deterministic
    stand-in for its "closest to centroid" choice). The clustering
    here is fit-free hyperplane LSH (:func:`hyperplane_bucket` —
    md5-derived literal planes, pure map-side) rather than the
    paper's k-means; pass ``bucket_col`` naming a pre-computed
    cluster column on the input (e.g. :func:`assign_clusters`
    output joined back) for the k-means-faithful variant, which
    skips the LSH projection entirely.

    Scale shape: bucketing adds NO shuffle; the pairwise cosine is a
    self-join keyed on the bucket — candidate pairs are
    bucket-bounded, never corpus-quadratic. Two guards keep the
    O(bucket²) stage bounded at corpus scale (VERDICT r6 #1):

    - ``n_planes=None`` (the default) sizes the plane count from a
      one-pass corpus count via :func:`semantic_dedup_n_planes`, so
      the EXPECTED bucket tracks ``target_bucket_size`` instead of
      a fixture-sized constant slicing a 10B-doc corpus into 256
      giant buckets.
    - ``max_bucket_size`` drops OVERSIZED buckets from pair
      generation (same map-side-combined count + join-back as
      ``minhash_pairs``, no broadcast hint — AQE picks one at
      runtime when the survivor table really is small). Rows in a
      dropped bucket are all returned with ``keep=True``: a
      degenerate bucket (e.g. the all-zeros region) proves nothing
      about duplication, and skipping it is the documented recall
      trade that keeps the stage's worst task bounded.

    The bucketed projection feeds three consumers (both self-join
    sides and the final keep-flag join); ``persist=True`` materializes
    it via a LAZY ``localCheckpoint`` so the plane dot products
    evaluate once per row, not three times (ADVICE r6 #4). A
    ``persist()`` entry would sit in the CacheManager forever — the
    returned frame stays lazy, so no caller could ever unpersist it
    (review r10e: contrary to the old docstring, DataFrame cache
    entries are NOT reclaimed on GC; checkpoint RDD blocks ARE, via
    ContextCleaner). Pass ``False`` to trade recompute for zero
    block footprint.

    The drop set joins back as a broadcast-or-shuffle left join by
    id. NULL vectors keep NULL buckets and are never dropped (unknown
    content is not provably duplicated).

    Returns ``(id, bucket, keep)`` for every input row.
    """
    if bucket_col is not None:
        # keep the caller's bucket type: casting to long silently
        # nulled string cluster labels, emptied the pair self-join,
        # and turned the whole dedup into a keep-everything no-op
        # (review r10k)
        b = embeddings.select(
            F.col(id_col),
            F.col(bucket_col).alias("__bkt"),
            F.col(vec_col).cast("array<double>").alias("__v"),
        )
    else:
        if n_planes is None:
            n_planes = semantic_dedup_n_planes(
                embeddings.count(), target_bucket_size
            )
        b = hyperplane_bucket(
            embeddings.select(id_col, vec_col),
            vec_col=vec_col,
            n_planes=n_planes,
            dim=dim,
            bucket_col="__bkt",
        ).select(
            F.col(id_col),
            F.col("__bkt"),
            F.col(vec_col).cast("array<double>").alias("__v"),
        )
    if persist:
        b = b.localCheckpoint(eager=False)
    joinable = b
    if max_bucket_size:
        sizes = b.groupBy("__bkt").agg(F.count(F.lit(1)).alias("__sz"))
        joinable = b.join(
            sizes.filter(F.col("__sz") <= max_bucket_size), "__bkt"
        ).drop("__sz")
    a = joinable.select(
        F.col("__bkt"),
        F.col(id_col).alias("__ida"),
        F.col("__v").alias("__va"),
    )
    c = joinable.select(
        F.col("__bkt"),
        F.col(id_col).alias("__idb"),
        F.col("__v").alias("__vb"),
    )
    drops = (
        a.join(c, "__bkt")
        .filter(F.col("__ida") < F.col("__idb"))
        .filter(
            cosine(F.col("__va"), F.col("__vb")) >= F.lit(float(threshold))
        )
        .select(F.col("__idb").alias(id_col))
        .distinct()
        .withColumn("__drop", F.lit(True))
    )
    return (
        b.join(drops, id_col, "left")
        .select(
            F.col(id_col),
            F.col("__bkt").alias("bucket"),
            F.coalesce(~F.col("__drop"), F.lit(True)).alias("keep"),
        )
    )


# ------------------------------------------------ product quantization


def pq_train(
    embeddings: DataFrame,
    m: int = 8,
    ksub: int = 16,
    sample: int = 2048,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Train product-quantization codebooks (Jégou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011 — the
    public-standard 100 TB ANN compression): split the d-dim space
    into ``m`` subspaces and run k-means with ``ksub`` centroids in
    each. Returns a ``(m, ksub, d/m)`` float64 numpy codebook.

    Training is SAMPLE-based on the driver — the standard practice
    (faiss trains codebooks on a bounded sample regardless of corpus
    size): the ``sample`` lowest-id vectors collect to a (n, d)
    matrix, then ``m`` independent numpy Lloyd runs. Deterministic by
    construction: lowest-id sample, first-distinct-subvector init,
    fixed iteration count, float64 arithmetic. Codebook size is
    m*ksub*(d/m) doubles — KBs — so it broadcasts in the encode/search
    UDF closures."""
    import numpy as np

    rows = (
        embeddings.select(
            F.col(id_col), F.col(vec_col).cast("array<double>")
        )
        .orderBy(F.col(id_col).asc())
        .limit(int(sample))
        .collect()
    )
    xs = [
        r[1]
        for r in rows
        if r[1] is not None and all(x is not None for x in r[1])
    ]
    if not xs:
        raise ValueError("pq_train: no valid vectors to train on")
    x = np.asarray(xs, dtype=np.float64)
    d = x.shape[1]
    if d % m:
        raise ValueError(f"pq_train: dim {d} not divisible by m={m}")
    dsub = d // m
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        sub = x[:, j * dsub : (j + 1) * dsub]
        # deterministic init: first ksub DISTINCT subvectors (repeat
        # the last one if the sample has fewer distinct values)
        seen: list = []
        keys = set()
        for row in sub:
            t = tuple(row)
            if t not in keys:
                keys.add(t)
                seen.append(row)
            if len(seen) == ksub:
                break
        while len(seen) < ksub:
            seen.append(seen[-1])
        c = np.asarray(seen, dtype=np.float64)
        for _ in range(iters):
            d2 = ((sub[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for ci in range(ksub):
                members = sub[a == ci]
                if len(members):  # empty cluster keeps its centroid
                    c[ci] = members.mean(axis=0)
        books[j] = c
    return books


def pq_encode(
    embeddings: DataFrame,
    codebook,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector to ``m`` uint8-range codes (nearest
    centroid per subspace) — d floats become m bytes (32x at d=64/
    m=8/f32). Distributed: the KB-scale codebook ships in the Arrow
    mapInPandas closure; each batch encodes with vectorized numpy
    argmin. Degenerate vectors (NULL / ragged / NULL element) encode
    to NULL codes — a row to audit, not a crashed task."""
    import numpy as np
    import pandas as pd

    cb = np.asarray(codebook, dtype=np.float64)
    m, ksub, dsub = cb.shape
    d = m * dsub
    id_type = embeddings.schema[id_col].dataType.simpleString()

    def encode_batches(batches):
        for pdf in batches:
            vals = pdf[vec_col].tolist()
            out = []
            for a in vals:
                arr = _finite_row(a, d)
                if arr is None:
                    out.append(None)
                    continue
                v = arr.reshape(m, dsub)
                # (m, ksub) distances via broadcasting; argmin per sub
                d2 = ((v[:, None, :] - cb) ** 2).sum(axis=2)
                out.append([int(c) for c in d2.argmin(axis=1)])
            yield pd.DataFrame({id_col: pdf[id_col], "codes": out})

    return embeddings.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        encode_batches, schema=f"{id_col} {id_type}, codes array<int>"
    )


def pq_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebook,
    k: int = 10,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: per query,
    precompute the (m, ksub) lookup table of subspace distances to
    every centroid, then every code row scores as m TABLE LOOKUPS —
    no float vector is ever read at search time, which is the whole
    point at 100 TB (the scan is m bytes/vector instead of d floats).

    Physical shape mirrors :func:`knn_join_arrow` — TWO-PHASE top-k
    (VERDICT r9 #1): the bounded query batch (and its LUTs) ship in
    the closure, each Arrow batch of codes scores all queries with
    one vectorized gather+sum, then keeps only the per-query local
    top-k (argpartition + exact boundary tie-break) so a batch emits
    at most nq x k rows. The per-query window (asc distance, id
    tie-break) merges nq x k x n_batches candidates instead of
    shuffling every (query, code) score. NULL-coded rows carry the
    +inf sentinel locally and a NULL distance in the output — ranked
    last, but still eligible when a query has fewer than k coded
    rows."""
    scored = _pq_adc_scored(
        queries, codes, codebook, k, query_id_col, query_vec_col, id_col
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("adc_distance").asc_nulls_last(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _pq_adc_scored(
    queries: DataFrame,
    codes: DataFrame,
    codebook,
    k: int,
    query_id_col: str,
    query_vec_col: str,
    id_col: str,
) -> DataFrame:
    """Phase-1 candidate stage of :func:`pq_topk` — exposed so tests
    can assert the two-phase bound (≤ nq x k rows per Arrow batch
    enter the merge window). Raises when no query has a valid
    d-dimensional vector."""
    import numpy as np
    import pandas as pd

    cb = np.asarray(codebook, dtype=np.float64)
    m, ksub, dsub = cb.shape
    d = m * dsub
    q_rows = [
        r
        for r in queries.select(
            F.col(query_id_col), F.col(query_vec_col).cast("array<double>")
        ).collect()
        if r[1] is not None
        and len(r[1]) == d
        and all(x is not None for x in r[1])
    ]
    if not q_rows:
        raise ValueError("pq_topk: no valid query vectors")
    qids = [r[0] for r in q_rows]
    qm = np.asarray([r[1] for r in q_rows], dtype=np.float64)
    nq = len(qids)
    luts = _pq_luts(qm, cb)
    qid_type = queries.schema[query_id_col].dataType.simpleString()
    eid_type = codes.schema[id_col].dataType.simpleString()

    def score_batches(batches):
        for pdf in batches:
            B = len(pdf)
            if not B:
                continue
            vals = [_finite_row(c, m) for c in pdf["codes"].tolist()]
            valid = np.array([c is not None for c in vals], dtype=bool)
            # +inf = "NULL distance": sorts last on asc like the
            # merge window's nulls-last, converted back on emit
            dist = np.full((B, nq), np.inf)
            if valid.any():
                cm = np.asarray(
                    [vals[i] for i in np.nonzero(valid)[0]],
                    dtype=np.int64,
                )
                dv = np.zeros((len(cm), nq), dtype=np.float64)
                for j in range(m):
                    # luts[:, j, cm[:, j]] is (nq, Bv); accumulate
                    # transposed so rows stay batch-major
                    dv += luts[:, j, :][:, cm[:, j]].T
                dist[valid] = dv
            # NaN distances (a NaN element in a query vector poisons
            # its whole LUT row) fold into the NULL sentinel — raw
            # NaN in the output would desc-sort FIRST in the merge
            # window and empty _local_topk's boundary comparisons
            dist[np.isnan(dist)] = np.inf
            ids = pdf[id_col].to_numpy()
            out_q, out_i, out_d = [], [], []
            for qj in range(nq):
                s = dist[:, qj]
                for ri in _local_topk(s, ids, k, largest=False):
                    out_q.append(qids[qj])
                    out_i.append(ids[ri])
                    out_d.append(
                        None if np.isposinf(s[ri]) else float(s[ri])
                    )
            yield pd.DataFrame(
                {
                    query_id_col: pd.Series(out_q, dtype=object),
                    id_col: pd.Series(out_i, dtype=object),
                    "adc_distance": pd.array(out_d, dtype="Float64"),
                }
            )

    return codes.select(F.col(id_col), "codes").mapInPandas(
        score_batches,
        schema=(
            f"{query_id_col} {qid_type}, {id_col} {eid_type}, "
            "adc_distance double"
        ),
    )


def _pq_luts(qm, cb):
    """(nq, m, ksub) ADC lookup tables: squared L2 from every query's
    j-th subvector to every centroid of subspace j."""
    import numpy as np

    nq = qm.shape[0]
    m, ksub, dsub = cb.shape
    luts = np.empty((nq, m, ksub), dtype=np.float64)
    for j in range(m):
        qs = qm[:, j * dsub : (j + 1) * dsub]  # (nq, dsub)
        diff = qs[:, None, :] - cb[j][None, :, :]  # (nq, ksub, dsub)
        luts[:, j, :] = (diff * diff).sum(axis=2)
    return luts


def pq_topk_probed(
    queries: DataFrame,
    codes_with_cluster: DataFrame,
    probes: DataFrame,
    codebook,
    k: int = 10,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    id_col: str = "vec_id",
    cluster_col: str = "cluster",
) -> DataFrame:
    """ADC top-k restricted, PER QUERY, to that query's probed
    clusters — the IVF inner loop (ADVICE r9 #3). :func:`pq_topk`
    over the UNION of all queries' probes is NOT equivalent to
    per-query probed scans: foreign-cluster codes (scored anyway)
    crowd a query's own candidates out of its shortlist, so recall
    degrades as query probe sets diverge. Here the (query, cluster)
    probe table is broadcast-joined against the code rows FIRST, so
    each code row is duplicated once per probing query and each pair
    scores against its own query's LUT — bit-identical to running a
    separate probed scan per query, in one plan.

    Cost model: the pair expansion is Σ_q |rows in q's probed
    clusters| — exactly the scan a per-query IVF search pays; with
    cluster-partitioned storage the join's scan side is partition-
    pruned to the union of probed clusters. Scoring is the same
    two-phase shape as :func:`pq_topk`: per-batch per-query local
    top-k (argpartition + exact boundary tie-break), so the merge
    window sees ≤ nq x k rows per Arrow batch. Rows of queries with
    no valid vector are dropped (no LUT — same exclusion as
    pq_topk); NULL-coded rows in a probed cluster rank last."""
    import numpy as np
    import pandas as pd

    cb = np.asarray(codebook, dtype=np.float64)
    m, ksub, dsub = cb.shape
    d = m * dsub
    q_rows = [
        r
        for r in queries.select(
            F.col(query_id_col), F.col(query_vec_col).cast("array<double>")
        ).collect()
        if r[1] is not None
        and len(r[1]) == d
        and all(x is not None for x in r[1])
    ]
    if not q_rows:
        raise ValueError("pq_topk_probed: no valid query vectors")
    qm = np.asarray([r[1] for r in q_rows], dtype=np.float64)
    luts = _pq_luts(qm, cb)
    qmap = {r[0]: i for i, r in enumerate(q_rows)}
    qid_type = queries.schema[query_id_col].dataType.simpleString()
    eid_type = codes_with_cluster.schema[id_col].dataType.simpleString()

    pairs = codes_with_cluster.join(
        F.broadcast(probes.select(query_id_col, cluster_col)), cluster_col
    ).select(query_id_col, id_col, "codes")

    def score_batches(batches):
        for pdf in batches:
            B = len(pdf)
            if not B:
                continue
            qkey = pdf[query_id_col].tolist()
            qidx = np.array(
                [qmap.get(q, -1) for q in qkey], dtype=np.int64
            )
            vals = [_finite_row(c, m) for c in pdf["codes"].tolist()]
            valid = np.array([c is not None for c in vals], dtype=bool)
            dist = np.full(B, np.inf)
            both = valid & (qidx >= 0)
            if both.any():
                rows = np.nonzero(both)[0]
                cm = np.asarray(
                    [vals[i] for i in rows], dtype=np.int64
                )
                qi = qidx[rows]
                dv = np.zeros(len(rows), dtype=np.float64)
                for j in range(m):
                    dv += luts[qi, j, cm[:, j]]
                dist[rows] = dv
            # NaN -> NULL sentinel (see _pq_adc_scored)
            dist[np.isnan(dist)] = np.inf
            ids = pdf[id_col].to_numpy()
            out_q, out_i, out_d = [], [], []
            for u in np.unique(qidx[qidx >= 0]):
                ridx = np.nonzero(qidx == u)[0]
                s = dist[ridx]
                lids = ids[ridx]
                for li in _local_topk(s, lids, k, largest=False):
                    ri = int(ridx[li])
                    out_q.append(qkey[ri])
                    out_i.append(ids[ri])
                    out_d.append(
                        None
                        if np.isposinf(dist[ri])
                        else float(dist[ri])
                    )
            yield pd.DataFrame(
                {
                    query_id_col: pd.Series(out_q, dtype=object),
                    id_col: pd.Series(out_i, dtype=object),
                    "adc_distance": pd.array(out_d, dtype="Float64"),
                }
            )

    scored = pairs.mapInPandas(
        score_batches,
        schema=(
            f"{query_id_col} {qid_type}, {id_col} {eid_type}, "
            "adc_distance double"
        ),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("adc_distance").asc_nulls_last(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def pq_search_rerank(
    queries: DataFrame,
    codes: DataFrame,
    codebook,
    embeddings: DataFrame,
    k: int = 10,
    shortlist: int = 100,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ search with exact RE-RANKING — the production IVFPQ+refine
    shape (faiss's IndexRefineFlat): the ADC pass scans only m-byte
    codes to produce a ``shortlist`` of candidates per query, and
    only those candidates' true vectors are fetched and scored
    exactly. At 100 TB the float vectors are read for
    queries x shortlist rows, never the corpus. Raw ADC top-10 on the
    bench embeddings recalls ~0.3 (quantization error at d=64/m=8/
    ksub=16); the 100-candidate re-rank lifts it to the level a
    deployment actually ships (measured in the ``pq_recall`` gate)."""
    cand = pq_topk(
        queries, codes, codebook, k=shortlist,
        query_id_col=query_id_col, query_vec_col=query_vec_col,
        id_col=id_col,
    ).select(query_id_col, id_col)
    q = queries.select(
        F.col(query_id_col),
        F.col(query_vec_col).cast("array<double>").alias("__qv"),
    )
    e = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__ev")
    )
    scored = (
        cand.join(e, id_col)
        .join(F.broadcast(q), query_id_col)
        .withColumn("distance", l2_squared(F.col("__qv"), F.col("__ev")))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("distance").asc_nulls_last(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "distance", "rank")
    )


def ivfpq_search(
    queries: DataFrame,
    codes_with_cluster: DataFrame,
    cluster_centroids: DataFrame,
    codebook,
    embeddings: DataFrame,
    k: int = 10,
    n_probe: int = 3,
    shortlist: int = 100,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
    centroid_key: str = "cluster",
    centroid_vec: str = "centroid",
) -> DataFrame:
    """IVF + PQ + refine — the complete faiss-IVFPQ production shape
    composed from the shipped pieces: the coarse quantizer prunes the
    scan to ``n_probe`` clusters per query (with cluster-partitioned
    storage, partition pruning — demonstrated file-level in
    tests/test_retrieval.py and the ``ivfpq_recall`` catalog gate),
    the per-query probed ADC pass over the surviving m-byte codes
    builds a ``shortlist``, and only the shortlist's true vectors are
    fetched for the exact re-rank. At 100 TB the per-query I/O is
    (n_probe/n_clusters) x m bytes/vector for the scan plus
    ``shortlist`` float vectors — the floats are never scanned.

    Probe selection mirrors :func:`ivf_knn_join` (same window, same
    tie-breaks). The shortlist stage is :func:`pq_topk_probed`
    (ADVICE r9 #3): the (query, probed-cluster) table broadcasts
    against the code rows BEFORE any ranking, so each query's
    shortlist is computed over exactly its own probed clusters —
    bit-identical to a per-query probed scan. (The previous shape —
    one shortlist over the UNION of all probes, filtered per query
    afterwards — let foreign-cluster codes crowd out a query's own
    candidates whenever probe sets diverged.)"""
    q = queries.select(
        F.col(query_id_col),
        F.col(query_vec_col).cast("array<double>").alias("__q"),
    )
    probes = ivf_probes(
        queries,
        cluster_centroids,
        n_probe,
        query_id_col=query_id_col,
        query_vec_col=query_vec_col,
        cluster_col=cluster_col,
        centroid_key=centroid_key,
        centroid_vec=centroid_vec,
    )
    cand = pq_topk_probed(
        queries,
        codes_with_cluster,
        probes,
        codebook,
        k=shortlist,
        query_id_col=query_id_col,
        query_vec_col=query_vec_col,
        id_col=id_col,
        cluster_col=cluster_col,
    ).select(query_id_col, id_col)
    e = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__e")
    )
    scored = (
        cand.join(e, id_col)
        .join(F.broadcast(q), query_id_col)
        .withColumn("distance", l2_squared(F.col("__q"), F.col("__e")))
    )
    wk = Window.partitionBy(query_id_col).orderBy(
        F.col("distance").asc_nulls_last(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "distance", "rank")
    )
