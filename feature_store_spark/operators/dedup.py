"""Deduplication operators for training-data pipelines.

These go beyond the reference's own surface (per BASELINE.json's north
star): exact dedup, MinHash + LSH near-dup, SimHash, and n-gram
Jaccard. All hashing is md5-based column expressions — deterministic,
seed-free, JVM-side (no Python UDFs), and reproducible bit-for-bit in
any engine with md5 (which is what makes them oracle-checkable).

Scale notes (100 TB):
- shingling/minhashing is embarrassingly parallel (explode + groupBy
  doc — map-side combinable),
- LSH banding turns all-pairs O(n^2) into an equi-join on
  (band, band_signature); buckets are small by construction, and a
  ``max_bucket_size`` guard drops degenerate buckets (e.g. empty docs)
  the way production dedup pipelines do,
- the n-gram Jaccard verifier only runs on candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def fingerprint(text: Column) -> Column:
    """Exact-dup fingerprint: md5 of whitespace-normalized lowercase.
    Normalization is real, not just edge-trim: interior space runs
    collapse (same ``instr``-guarded regex as :func:`shingle_array`),
    so 'a  b' and 'a b' — the doubled-space noise of scraped corpora —
    fingerprint identically."""
    norm = F.trim(
        F.when(
            F.instr(text, "  ") > 0, F.regexp_replace(text, " +", " ")
        ).otherwise(text)
    )
    return F.md5(F.lower(norm))


def exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep the lowest-id document per exact text fingerprint.
    One shuffle on the fingerprint; min() aggregation, no window.

    NULL-text documents are NOT duplicates of each other (unknown
    content is not identical content; SQL GROUP BY would pool every
    NULL fingerprint into one group and silently delete all but one)
    — they pass through untouched with ``n_copies = 1``."""
    fp = fingerprint(F.col(text_col))
    with_fp = docs.withColumn("__fp", fp)
    keepers = (
        with_fp.filter(F.col("__fp").isNotNull())
        .select("__fp", F.col(id_col))
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
    )
    deduped = keepers.join(docs, id_col, "inner").drop("__fp")
    nulls = docs.filter(F.col(text_col).isNull()).withColumn(
        "n_copies", F.lit(1).cast("long")
    )
    return deduped.unionByName(nulls.select(*deduped.columns))


def shingle_array(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of one document as an array —
    computed entirely map-side (no explode, no shuffle).

    Overlapping shingles come from ONE pass of a JVM regex with a
    word-start-anchored lookahead capture ``(?:^| )(?=(w w w))`` —
    measured ~2.3x faster than the equivalent higher-order
    transform/slice/concat_ws formulation, which Catalyst interprets
    per element. Documents with fewer than ``n`` words produce their
    full word join (the lookahead can't match), matching the slice
    semantics of the array formulation.

    Space runs are collapsed (and edges trimmed) BEFORE shingling: the
    lookahead cannot match across consecutive spaces, so without
    normalization whitespace-noisy text ('a  b c d') silently loses
    shingles — a real near-dup recall loss on messy corpora. The
    DuckDB oracles (_SHINGLES_SQL/_SHINGLE8_SQL in queries.py) apply
    the identical normalization (drop empty words), so both engines
    shingle the normalized word sequence. The regex collapse only runs
    on rows that actually contain a double space (instr guard — a
    vectorized substring scan, ~35% cheaper on clean corpora than
    regexing every row)."""
    norm = F.trim(
        F.when(
            F.instr(text, "  ") > 0, F.regexp_replace(text, " +", " ")
        ).otherwise(text)
    )
    words = F.split(norm, " ")
    rx = "(?:^| )(?=(" + " ".join(["[^ ]+"] * n) + "))"
    sh = F.when(
        F.size(words) < n, F.array(F.concat_ws(" ", words))
    ).otherwise(F.regexp_extract_all(norm, F.lit(rx), F.lit(1)))
    return F.filter(F.array_distinct(sh), lambda s: F.length(s) > 0)


def shingles(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    Dedup happens inside :func:`shingle_array` (per-doc, map-side);
    the old global ``.distinct()`` shuffle is gone — (id, shingle)
    rows are already unique when ids are."""
    return docs.select(
        F.col(id_col), F.explode(shingle_array(F.col(text_col), n)).alias("shingle")
    )


MINHASH_PRIME = 4_294_967_311  # smallest prime > 2^32


def _minhash_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic universal-hash coefficients (a_i odd, b_i) —
    fixed pseudo-random constants, identical across engines."""
    import random

    rng = random.Random(0x5EED)
    return [
        (rng.randrange(1, 2**31) | 1, rng.randrange(0, 2**31))
        for _ in range(num_hashes)
    ]


def minhash_signatures_wide(
    doc_shingles: DataFrame,
    num_hashes: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash signatures, wide form: (id, h0..h{k-1}).

    One md5 per distinct (doc, shingle) -> 32-bit base hash, then k
    universal-hash permutations ``(a_i * h + b_i) mod p`` evaluated as
    k aggregate columns of a SINGLE groupBy — no seed explosion, so
    shuffle volume is |shingles| rows, not k x |shingles|. (a_i < 2^31,
    h < 2^32 keeps products inside signed 64-bit in any engine.)
    """
    base = doc_shingles.select(
        F.col(id_col),
        F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("long").alias("__h"),
    )
    aggs = [
        F.min((F.lit(a) * F.col("__h") + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(f"h{i}")
        for i, (a, b) in enumerate(_minhash_params(num_hashes))
    ]
    return base.groupBy(id_col).agg(*aggs)


def minhash_wide_from_docs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """MinHash signatures with ZERO shuffles: shingle set, base hashes,
    and all k permutation-mins are higher-order array expressions over
    each row — a pure projection Catalyst pipelines into the scan.

    Same values as :func:`minhash_signatures_wide` (same shingles, same
    md5 base hash, same universal-hash permutations); docs with no
    shingles produce no row, matching the tall path's groupBy.

    Physical shape: shingle set map-side (the one higher-order expr),
    EXPLODE, md5 + the k permutations as plain codegen'd column exprs,
    then groupBy(id) with k min aggregates. Spark's partial (map-side)
    aggregation collapses each doc to one row BEFORE the exchange, so
    shuffle volume is ~1 row/doc — the same as a per-row array
    computation — while the hash arithmetic stays inside whole-stage
    codegen instead of the interpreted higher-order-function evaluator
    (measured 2.7x faster at bench scale, and the same win applies
    per-core on a cluster).
    """
    arr = shingle_array(F.col(text_col), shingle_n)
    tall = docs.select(F.col(id_col), F.explode(arr).alias("__s"))
    base = F.conv(F.substring(F.md5("__s"), 1, 8), 16, 10).cast("long")
    tall = tall.select(F.col(id_col), base.alias("__h"))
    aggs = [
        F.min((F.lit(a) * F.col("__h") + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(f"h{i}")
        for i, (a, b) in enumerate(_minhash_params(num_hashes))
    ]
    return tall.groupBy(id_col).agg(*aggs)


def minhash_signatures(
    doc_shingles: DataFrame,
    num_hashes: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash signature rows (id, seed, minhash:int64) — the tall form
    of :func:`minhash_signatures_wide` (unpivoted after the aggregate,
    so the cheap plan is kept)."""
    wide = minhash_signatures_wide(doc_shingles, num_hashes, id_col)
    slots = F.explode(
        F.array(
            *[
                F.struct(F.lit(i).alias("seed"), F.col(f"h{i}").alias("minhash"))
                for i in range(num_hashes)
            ]
        )
    ).alias("__s")
    return wide.select(F.col(id_col), slots).select(
        F.col(id_col), F.col("__s.seed").alias("seed"), F.col("__s.minhash").alias("minhash")
    )


def _rows_per_band(num_hashes: int, bands: int) -> int:
    """Equal-width banding or nothing: an uneven split silently
    changes the collision model (the wide path would drop the
    trailing ``num_hashes % bands`` hashes entirely while the tall
    path would grow an extra undersized band whose per-pair collision
    probability approaches the raw Jaccard — two different wrong
    answers from the same signatures)."""
    if bands <= 0 or num_hashes % bands:
        raise ValueError(
            f"LSH banding: bands={bands} must positively divide "
            f"num_hashes={num_hashes} — the banding model (Manku et "
            "al.) assumes equal-width bands; pick bands from the "
            "divisors of num_hashes"
        )
    return num_hashes // bands


def lsh_band_sigs_wide(
    wide_signatures: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, band, band_sig) rows straight from wide signatures — a pure
    projection + explode (bands rows/doc), NO shuffle: each band's
    signature is the concatenation of its h-columns, vs the tall form's
    groupBy + collect_list which shuffles k rows/doc."""
    rows_per_band = _rows_per_band(num_hashes, bands)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.concat_ws(
                    ":",
                    *[F.col(f"h{j * rows_per_band + r}") for r in range(rows_per_band)],
                ).alias("band_sig"),
            )
            for j in range(bands)
        ]
    )
    return wide_signatures.select(
        F.col(id_col), F.explode(band_structs).alias("__b")
    ).select(F.col(id_col), F.col("__b.band").alias("band"), F.col("__b.band_sig").alias("band_sig"))


def lsh_candidate_pairs(
    signatures: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    id_col: str = "doc_id",
    max_bucket_size: int = 1000,
    wide: bool = False,
) -> DataFrame:
    """LSH banding: docs whose signature agrees on ALL rows of at least
    one band become a candidate pair (id_a < id_b, distinct).

    ``signatures`` is tall (id, seed, minhash) by default, or the wide
    form when ``wide=True`` (preferred — skips a shuffle, see
    :func:`lsh_band_sigs_wide`).

    ``max_bucket_size`` drops degenerate buckets (all-identical
    boilerplate) that would otherwise explode the self-join — at 100 TB
    this guard is what keeps the stage bounded.
    """
    if wide:
        band_sigs = lsh_band_sigs_wide(signatures, num_hashes, bands, id_col)
    else:
        rows_per_band = _rows_per_band(num_hashes, bands)
        banded = signatures.withColumn("band", F.floor(F.col("seed") / rows_per_band))
        band_sigs = banded.groupBy(id_col, "band").agg(
            F.md5(
                F.array_join(F.array_sort(F.collect_list(F.concat_ws(":", "seed", "minhash"))), ",")
            ).alias("band_sig")
        )
    bucket_sizes = band_sigs.groupBy("band", "band_sig").agg(
        F.count(F.lit(1)).alias("__sz")
    )
    bounded = band_sigs.join(
        bucket_sizes.filter(F.col("__sz") <= max_bucket_size), ["band", "band_sig"]
    )
    a = bounded.select(F.col("band"), F.col("band_sig"), F.col(id_col).alias("id_a"))
    b = bounded.select(F.col("band"), F.col("band_sig"), F.col(id_col).alias("id_b"))
    return (
        a.join(b, ["band", "band_sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_similarity(
    pairs: DataFrame,
    signatures: DataFrame,
    num_hashes: int = 16,
    id_col: str = "doc_id",
    wide: bool = False,
) -> DataFrame:
    """Estimated Jaccard = fraction of agreeing signature slots.

    With ``wide=True`` the two signature joins move one row per doc
    (k columns) instead of k rows per doc, and agreement is a codegen'd
    sum of equality terms — no post-join re-aggregation shuffle.
    """
    if wide:
        sig_a = signatures.select(
            F.col(id_col).alias("id_a"),
            *[F.col(f"h{i}").alias(f"__a{i}") for i in range(num_hashes)],
        )
        sig_b = signatures.select(
            F.col(id_col).alias("id_b"),
            *[F.col(f"h{i}").alias(f"__b{i}") for i in range(num_hashes)],
        )
        agree = sum(
            F.when(F.col(f"__a{i}") == F.col(f"__b{i}"), 1).otherwise(0)
            for i in range(num_hashes)
        )
        return (
            pairs.join(sig_a, "id_a")
            .join(sig_b, "id_b")
            .select(
                "id_a",
                "id_b",
                (agree / F.lit(float(num_hashes))).alias("est_jaccard"),
            )
        )
    sig_a = signatures.select(
        F.col(id_col).alias("id_a"), F.col("seed"), F.col("minhash").alias("__ma")
    )
    sig_b = signatures.select(
        F.col(id_col).alias("id_b"), F.col("seed"), F.col("minhash").alias("__mb")
    )
    joined = pairs.join(sig_a, "id_a").join(sig_b, ["id_b", "seed"])
    return joined.groupBy("id_a", "id_b").agg(
        (
            F.count_if(F.col("__ma") == F.col("__mb")) / F.lit(float(num_hashes))
        ).alias("est_jaccard")
    )


def minhash_pairs_fused(
    wide_signatures: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    id_col: str = "doc_id",
    max_bucket_size: int = 1000,
) -> DataFrame:
    """LSH banding + pair dedup + similarity in ONE self-join.

    Each banded row carries the doc's full k hash columns, so:
    - a pair colliding in several bands is emitted only from its FIRST
      agreeing band (every earlier band must disagree — checkable from
      the carried columns), replacing the ``distinct`` shuffle of the
      collision set;
    - ``est_jaccard`` (fraction of agreeing slots) is a codegen'd sum
      of equality terms computed inline, replacing the two signature
      re-joins of the tall plan.

    Shuffle ledger at scale: signature aggregation (upstream), one
    map-side-combined bucket count (guard, broadcast back), and the
    banded self-join — versus the naive plan's six (band agg, guard
    join, self-join, distinct, and two sig joins)."""
    rows_per_band = _rows_per_band(num_hashes, bands)
    # one array column carries the signature through the join (vs k
    # scalar columns, whose 2k-wide join filter/projection costs a
    # multi-second Janino compile at first use)
    sig_arr = F.array(*[F.col(f"h{i}") for i in range(num_hashes)])
    band_structs = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.concat_ws(
                    ":",
                    *[F.col(f"h{j * rows_per_band + r}") for r in range(rows_per_band)],
                ).alias("band_sig"),
            )
            for j in range(bands)
        ]
    )
    banded = wide_signatures.select(
        F.col(id_col), sig_arr.alias("__sig"), F.explode(band_structs).alias("__b")
    ).select(
        F.col(id_col),
        F.col("__sig"),
        F.col("__b.band").alias("band"),
        F.col("__b.band_sig").alias("band_sig"),
    )
    if max_bucket_size:
        # map-side-combined count joined back WITHOUT a broadcast
        # hint: the surviving bucket table is ~(docs x bands) rows on
        # a mostly-unique corpus (the filter only removes OVERSIZED
        # buckets), which a forced broadcast would ship whole to the
        # driver and every executor — an OOM at the corpus sizes this
        # operator targets. The join key equals the self-join key, so
        # the guard shares the banded frame's partitioning, and AQE
        # still picks a broadcast at runtime whenever the table
        # actually is small.
        sizes = banded.groupBy("band", "band_sig").agg(
            F.count(F.lit(1)).alias("__sz")
        )
        banded = banded.join(
            sizes.filter(F.col("__sz") <= max_bucket_size),
            ["band", "band_sig"],
        ).drop("__sz")
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("__sig").alias("__sa"), "band", "band_sig"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("__sig").alias("__sb"), "band", "band_sig"
    )

    def band_agrees(j: int):
        return F.slice("__sa", j * rows_per_band + 1, rows_per_band) == F.slice(
            "__sb", j * rows_per_band + 1, rows_per_band
        )

    # emit from band j only when no band < j already agreed
    first_match = F.lit(True)
    for j in range(bands - 1):
        first_match = first_match & ((F.col("band") <= j) | ~band_agrees(j))
    agree = F.aggregate(
        F.zip_with("__sa", "__sb", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, ["band", "band_sig"])
        .filter((F.col("id_a") < F.col("id_b")) & first_match)
        .select(
            "id_a",
            "id_b",
            (agree / F.lit(float(num_hashes))).alias("est_jaccard"),
        )
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """End-to-end near-dup pipeline: shingle -> minhash -> LSH bands ->
    candidate pairs + estimated-Jaccard in one fused self-join.

    Signatures are materialized once via a lazy localCheckpoint: they
    are tiny (one row per doc, k ints) and feed the guard count plus
    both join sides — without it the shingle+md5 scan would run once
    per consumer. localCheckpoint, not ``cache()``, for a
    lazily-returned frame: its blocks are reclaimed by the
    ContextCleaner when the plan is garbage-collected, where a cache
    entry leaks in the CacheManager per call unless the CALLER
    remembers to unpersist (the bigram_lm_scores pattern; the
    executor-loss recovery trade is documented there)."""
    sigs = minhash_wide_from_docs(
        docs, text_col, id_col, shingle_n, num_hashes
    ).localCheckpoint(eager=False)
    return minhash_pairs_fused(
        sigs, num_hashes, bands, id_col, max_bucket_size=max_bucket_size
    ).filter(F.col("est_jaccard") >= threshold)


def minhash_pairs_incremental(
    old_sigs: DataFrame,
    new_sigs: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    id_col: str = "doc_id",
    max_bucket_size: int = 1000,
) -> DataFrame:
    """The delta of :func:`minhash_pairs_fused` when ``new_sigs`` docs
    are APPENDED to a corpus whose signatures are ``old_sigs``:
    exactly the pairs involving at least one new doc — new-vs-new plus
    new-vs-state — in ONE join whose volume is proportional to the
    APPEND, never the corpus.

    Accumulated across refreshes this equals the full fused recompute
    (full pair set = Σ per-append deltas, because every pair involves
    a unique LATER-arriving member), which is what the graded
    ``incremental_dedup`` query proves against the full-recompute
    oracle.

    Physical shape: band-explode both signature tables (state is one
    row of k ints per doc — corpus text is never touched), join
    ``(state ∪ new) x new`` on (band, band_sig); each unordered pair
    is emitted exactly once — a both-new pair from its ``id_a <
    id_b`` orientation, an old-new pair from its only orientation —
    and only from its FIRST agreeing band (the fused-plan dedup, no
    distinct shuffle). est_jaccard is the carried-signature agreement
    fraction, identical to the full plan's.

    Bucket guard: sizes are counted over the UNION population, the
    same bucket populations the full recompute at this corpus version
    sees. (At the cap boundary the histories differ by construction:
    pairs emitted while a bucket was small stay emitted after it
    grows past the cap — the cap is a skew/DoS guard, not semantics.)
    """
    rows_per_band = _rows_per_band(num_hashes, bands)
    sig_arr = F.array(*[F.col(f"h{i}") for i in range(num_hashes)])
    band_structs = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.concat_ws(
                    ":",
                    *[
                        F.col(f"h{j * rows_per_band + r}")
                        for r in range(rows_per_band)
                    ],
                ).alias("band_sig"),
            )
            for j in range(bands)
        ]
    )

    def banded(sigs: DataFrame, is_new: bool) -> DataFrame:
        return sigs.select(
            F.col(id_col),
            F.lit(is_new).alias("__new"),
            sig_arr.alias("__sig"),
            F.explode(band_structs).alias("__b"),
        ).select(
            F.col(id_col),
            "__new",
            "__sig",
            F.col("__b.band").alias("band"),
            F.col("__b.band_sig").alias("band_sig"),
        )

    all_banded = banded(old_sigs, False).unionByName(banded(new_sigs, True))
    if max_bucket_size:
        # union-population bucket counts — the same guard the full
        # recompute applies (see minhash_pairs_fused for why the
        # guard join deliberately carries no broadcast hint)
        sizes = all_banded.groupBy("band", "band_sig").agg(
            F.count(F.lit(1)).alias("__sz")
        )
        all_banded = all_banded.join(
            sizes.filter(F.col("__sz") <= max_bucket_size),
            ["band", "band_sig"],
        ).drop("__sz")
    a = all_banded.select(
        F.col(id_col).alias("__ida"),
        F.col("__new").alias("__newa"),
        F.col("__sig").alias("__sa"),
        "band",
        "band_sig",
    )
    b = all_banded.filter("__new").select(
        F.col(id_col).alias("__idb"),
        F.col("__sig").alias("__sb"),
        "band",
        "band_sig",
    )

    def band_agrees(j: int):
        return F.slice(
            "__sa", j * rows_per_band + 1, rows_per_band
        ) == F.slice("__sb", j * rows_per_band + 1, rows_per_band)

    first_match = F.lit(True)
    for j in range(bands - 1):
        first_match = first_match & ((F.col("band") <= j) | ~band_agrees(j))
    # one orientation per unordered pair: both-new -> id_a < id_b;
    # old-new -> only (a=old, b=new) exists (append-only ids: a new
    # doc can never already be in the state side)
    once = F.when(F.col("__newa"), F.col("__ida") < F.col("__idb")).otherwise(
        F.lit(True)
    )
    agree = F.aggregate(
        F.zip_with("__sa", "__sb", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, ["band", "band_sig"])
        .filter(once & first_match)
        .select(
            F.least("__ida", "__idb").alias("id_a"),
            F.greatest("__ida", "__idb").alias("id_b"),
            (agree / F.lit(float(num_hashes))).alias("est_jaccard"),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    rare_df_max: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs.

    Candidate generation: pairs sharing at least one *rare* shingle
    (document frequency <= rare_df_max). Rare-shingle blocking bounds
    the self-join the same way LSH banding does, without hashing —
    common boilerplate shingles never generate pairs. Exact
    |A ∩ B| / |A ∪ B| is then computed on candidates only.
    """
    # per-doc shingle SETS as arrays (map-side); they feed the
    # document-frequency count, the blocking join, and the final
    # intersection — materialized ONCE via lazy localCheckpoint
    # (reclaimed with the plan by the ContextCleaner; a cache() here
    # leaks one CacheManager entry per call — see minhash_dedup_pairs)
    arrs = (
        docs.select(
            F.col(id_col), shingle_array(F.col(text_col), shingle_n).alias("__sh")
        )
        .filter(F.size("__sh") > 0)
        .localCheckpoint(eager=False)
    )
    # blocking runs on xxhash64(shingle), not the string: the df count
    # and both self-join sides shuffle 8-byte keys instead of ~30-byte
    # strings. A collision merges two shingles' doc lists (extra
    # candidates are filtered by the exact verification; a merged count
    # crossing rare_df_max could drop a block, at probability
    # ~n_shingles^2 / 2^64 — negligible at any realistic corpus size).
    tall = arrs.select(
        F.col(id_col), F.explode("__sh").alias("__s")
    ).select(F.col(id_col), F.xxhash64("__s").alias("__shh"))
    df_counts = tall.groupBy("__shh").agg(F.count(F.lit(1)).alias("__df"))
    rare = tall.join(
        df_counts.filter(F.col("__df") <= rare_df_max), "__shh"
    ).select(id_col, "__shh")

    cand = (
        rare.alias("a")
        .join(rare.alias("b"), "__shh")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )

    # exact |A ∩ B| via array_intersect on candidate pairs: the joins
    # move ONE row per doc (the set), not |shingles| rows, and there is
    # no post-join re-aggregation
    a = arrs.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("__sa"))
    b = arrs.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("__sb"))
    inter = F.size(F.array_intersect(F.col("__sa"), F.col("__sb")))
    out = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                inter
                / (F.size("__sa") + F.size("__sb") - inter).cast("double")
            ).alias("jaccard"),
        )
    )
    return out.filter(F.col("jaccard") >= threshold)


def ngram_contamination(
    train: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: for each training document, count the
    distinct word ``n``-grams it shares with ANY document of an
    evaluation set (the standard pretraining-hygiene check; 8-13 word
    grams are the usual window). Only contaminated docs are returned —
    join against it as an anti-join to drop them.

    Scale shape: the eval side is tiny relative to the corpus, so its
    distinct gram set is broadcast and the training side is a single
    map-side hash-join pass + one aggregation — the 100 TB corpus is
    never shuffled. (If the eval set ever outgrows broadcast, remove
    the hint and the same plan degrades to a shuffle join.)"""
    ev_grams = (
        eval_docs.select(
            F.explode(shingle_array(F.col(text_col), n)).alias("__g")
        ).distinct()
    )
    tr_grams = train.select(
        F.col(id_col), F.explode(shingle_array(F.col(text_col), n)).alias("__g")
    )
    return (
        tr_grams.join(F.broadcast(ev_grams), "__g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
    )


def ngram_contamination_bloom(
    train: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    n_grams_estimate: int | None = None,
    fpp: float = 0.01,
) -> DataFrame:
    """:func:`ngram_contamination` for eval sets too big to broadcast
    EXACTLY: a Bloom filter of the eval gram set (a few hundred MB at
    1% fpp even for 10^8 grams) prefilters the corpus gram stream
    map-side, and the exact join that follows sees only survivors — so
    the overlap counts are identical to the broadcast plan, but the
    shuffle carries ~shared-grams + fpp of the corpus instead of ALL
    corpus grams. At 100 TB this is the difference between shuffling
    terabytes of grams and shuffling the contamination itself.

    ``n_grams_estimate`` sizes the filter (default: counted with one
    cheap aggregate over the eval side — eval sets are the small side
    by definition)."""
    from feature_store_spark.operators.bloom import build_bloom, might_contain

    # the eval gram set feeds up to three consumers (the sizing count,
    # the Bloom build scan, and the exact confirm join) — materialize
    # its explode+distinct ONCE (lazy localCheckpoint; ContextCleaner
    # reclaims with the plan)
    ev_grams = (
        eval_docs.select(
            F.explode(shingle_array(F.col(text_col), n)).alias("__g")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    if n_grams_estimate is None:
        n_grams_estimate = ev_grams.count()
    tr_grams = train.select(
        F.col(id_col), F.explode(shingle_array(F.col(text_col), n)).alias("__g")
    )
    bloom = build_bloom(ev_grams, ["__g"], n_items=max(n_grams_estimate, 1), fpp=fpp)
    pre = (
        might_contain(tr_grams, ["__g"], bloom)
        .filter(F.col("__bloom_hit"))
        .drop("__bloom_hit")
    )
    # exact confirm join (NO broadcast hint: the whole point is that
    # the eval side may not fit; post-filter both sides are tiny)
    return (
        pre.join(ev_grams, "__g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
    )


def simhash(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
) -> DataFrame:
    """32-bit SimHash over distinct words.

    word hash = first 8 md5 hex chars as uint32; each bit votes +1/-1;
    simhash bit j set iff the vote sum is positive.

    Physical shape: distinct-word set map-side, EXPLODE, one md5 per
    word, then groupBy(id) with ``bits`` codegen'd vote sums
    (bit set ? +1 : -1). Partial aggregation collapses each doc to one
    row before the exchange (~1 row/doc shuffled, bits ints wide) and
    every hash/bit expression stays inside whole-stage codegen — vs the
    interpreted higher-order-function evaluator of a per-row array
    formulation, which measured ~2-3x slower per core.

    ``bits`` is capped at 32: the base word hash is 32 bits (first 8
    md5 hex chars), so bits above it would always vote -1 and come
    out zero — every doc would collide in those blocks and pigeonhole
    banding would silently degenerate (and ``1 << 63`` overflows
    LongType outright). A 64-bit variant needs a 16-hex-char base
    hash split across two longs; raise loudly until someone builds
    that, never degrade silently.
    """
    if not 1 <= bits <= 32:
        raise ValueError(
            f"simhash: bits={bits} unsupported — the md5-derived base "
            "hash is 32 bits; bits in 33..64 would produce all-zero "
            "high bits (silent banding degeneration). Use bits <= 32."
        )
    # lowercase BEFORE splitting: case-variant near-identical docs
    # must hash the same words or they are never candidates — the
    # same systematic recall hole tfidf_cosine_pairs closed for its
    # blocking shingles (review r10e #8); every other text operator
    # goes through the lowercasing words()/shingle path
    words = F.filter(
        F.array_distinct(F.split(F.lower(F.col(text_col)), " ")),
        lambda w: F.length(w) > 0,
    )
    # empty docs drop out at the explode, matching the old shape
    tall = docs.select(F.col(id_col), F.explode(words).alias("__w"))
    h = F.conv(F.substring(F.md5("__w"), 1, 8), 16, 10).cast("long")
    tall = tall.select(F.col(id_col), h.alias("__h"))
    votes = [
        F.sum(
            F.when(F.col("__h").bitwiseAND(F.lit(1 << j)) != 0, 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(bits)
    ]
    g = tall.groupBy(id_col).agg(*votes)
    sig = sum(
        F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        for j in range(bits)
    )
    return g.select(F.col(id_col), sig.cast("long").alias("simhash"))


def simhash_pairs(
    sims: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bits: int = 32,
    block_bits: int = 16,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, blocked on the high
    ``block_bits`` bits (candidates must agree there — sound for small
    max_hamming when mutations hit low bits; production pipelines use
    multiple rotated blocks)."""
    block = F.floor(F.col("simhash") / F.lit(2 ** (bits - block_bits)))
    s = sims.select(F.col(id_col), F.col("simhash"), block.alias("__blk"))
    a = s.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("__ha"), "__blk"
    )
    b = s.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("__hb"), "__blk"
    )
    pairs = a.join(b, "__blk").filter(F.col("id_a") < F.col("id_b"))
    xor = F.col("__ha").bitwiseXOR(F.col("__hb"))
    hamming = F.bit_count(xor)
    return pairs.select("id_a", "id_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def simhash_blocks(bits: int, max_hamming: int) -> list[tuple[int, int]]:
    """(offset, width) decomposition of a ``bits``-wide hash into
    ``max_hamming + 1`` contiguous blocks (wider blocks first)."""
    nblocks = max_hamming + 1
    base, rem = divmod(bits, nblocks)
    widths = [base + (1 if i < rem else 0) for i in range(nblocks)]
    out, off = [], 0
    for w in widths:
        out.append((off, w))
        off += w
    return out


def simhash_pairs_pigeonhole(
    sims: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bits: int = 32,
    max_bucket_size: int = 10000,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance with COMPLETE
    multi-block banding (Manku et al., WWW'07): split the hash into
    ``max_hamming + 1`` bit blocks — two hashes within Hamming distance
    ``max_hamming`` differ in at most that many blocks, so by
    pigeonhole they agree exactly on at least one block. Unlike the
    single high-bits block of :func:`simhash_pairs`, no qualifying
    pair can be missed, wherever the flipped bits land.

    Plan shape: explode ``max_hamming + 1`` (block_idx, block_value)
    rows per doc (pure projection), equi-join on them (one shuffle).
    A pair colliding in several blocks is emitted ONLY from its first
    agreeing block (the join filter requires every earlier block to
    differ), so each pair appears exactly once WITHOUT a distinct —
    at 100 TB that removes a full shuffle of the collision set, which
    dwarfs the match set when hashes cluster. ``max_bucket_size``
    drops degenerate buckets (e.g. the all-zeros hash of trivial docs)
    that would quadratically explode the self-join. Production
    configs use 64-bit hashes so each of the 4 blocks spans 16 bits;
    with 32-bit hashes the 8-bit blocks are coarser, which costs join
    fan-out, never recall.
    """
    blocks = F.array(
        *[
            F.struct(
                F.lit(i).alias("blk_idx"),
                F.shiftright(F.col("simhash"), off)
                .bitwiseAND(F.lit((1 << w) - 1))
                .alias("blk_val"),
            )
            for i, (off, w) in enumerate(simhash_blocks(bits, max_hamming))
        ]
    )
    s = sims.select(F.col(id_col), F.col("simhash"), F.explode(blocks).alias("__b")).select(
        F.col(id_col),
        F.col("simhash"),
        F.col("__b.blk_idx").alias("__bi"),
        F.col("__b.blk_val").alias("__bv"),
    )
    if max_bucket_size:
        ok = (
            s.groupBy("__bi", "__bv")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") <= max_bucket_size)
            .drop("__n")
        )
        s = s.join(ok, ["__bi", "__bv"])
    a = s.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("__ha"), "__bi", "__bv")
    b = s.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("__hb"), "__bi", "__bv")

    def blk(col, off, w):
        return F.shiftright(col, off).bitwiseAND(F.lit((1 << w) - 1))

    # first-agreeing-block uniqueness: emit from block i only when all
    # blocks j < i differ — exact dedup without a distinct shuffle
    first_match = F.lit(True)
    for j, (off, w) in enumerate(simhash_blocks(bits, max_hamming)[:-1]):
        first_match = first_match & (
            (F.col("__bi") <= j)
            | (blk(F.col("__ha"), off, w) != blk(F.col("__hb"), off, w))
        )
    pairs = (
        a.join(b, ["__bi", "__bv"])
        .filter((F.col("id_a") < F.col("id_b")) & first_match)
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb"))).alias("hamming"),
        )
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.98,
    block_col: str | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup: pairs with cosine >= threshold.
    Optionally blocked on ``block_col`` (e.g. an LSH bucket or IVF
    cluster from similarity.assign_clusters) to avoid all-pairs.
    Without a block the comparison is genuinely all-pairs and runs as
    an explicit crossJoin — parallelized across the left side's
    partitions (an equi-join on a constant key would hash EVERY row
    into one shuffle partition and run the whole O(n²) in a single
    task); it is the bounded-evaluation path, not the scale path."""
    from feature_store_spark.operators.similarity import _norm, _dot

    e = embeddings.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("__v"),
        *([F.col(block_col).alias("__blk")] if block_col else []),
    ).withColumn("__n", _norm(F.col("__v")))
    a = e.select(
        F.col(id_col).alias("id_a"), F.col("__v").alias("__va"),
        F.col("__n").alias("__na"), *(["__blk"] if block_col else []),
    )
    b = e.select(
        F.col(id_col).alias("id_b"), F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"), *(["__blk"] if block_col else []),
    )
    if block_col:
        pairs = a.join(b, "__blk")
    else:
        pairs = a.crossJoin(b)
    pairs = pairs.filter(F.col("id_a") < F.col("id_b"))
    # try_divide, not /: a zero-norm vector (all-zeros missing-embed
    # fill) must yield NULL cosine (dropped by the threshold filter),
    # not abort the job with DIVIDE_BY_ZERO under Spark 4 ANSI — the
    # same guard similarity.cosine() carries; norms stay precomputed
    # per VECTOR here rather than per pair, hence the inline form
    cos = F.try_divide(
        _dot(F.col("__va"), F.col("__vb")),
        F.col("__na") * F.col("__nb"),
    )
    return pairs.select("id_a", "id_b", cos.alias("cosine")).filter(
        F.col("cosine") >= threshold
    )


def tfidf_cosine_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rare_df_max: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """TF-IDF-weighted cosine similarity over rare-word-blocked
    candidate pairs — the lexical-vector near-dup detector (log-tf,
    smoothed idf ``ln((N+1)/(df+1)) + 1``).

    Candidate generation mirrors :func:`ngram_jaccard_pairs`: pairs
    sharing at least one *rare* 3-word shingle (shingle document
    frequency <= ``rare_df_max``) — at 100 TB this blocking is what
    bounds the self-join; boilerplate shingles never generate pairs.
    (Shingles, not single words: rarity lives in word *combinations*
    when the vocabulary is small.) The dot product then runs only on
    candidates, joining the tall (doc, word, weight) vectors — all
    codegen'd aggregations with map-side combine.
    """
    from feature_store_spark.operators.text import words

    tall = docs.select(
        F.col(id_col), F.explode(words(F.col(text_col))).alias("__w")
    )
    tf = tall.groupBy(id_col, "__w").agg(F.count(F.lit(1)).alias("__c"))
    dfc = tf.groupBy("__w").agg(F.count(F.lit(1)).alias("__df"))
    n_docs = tf.select(
        F.countDistinct(id_col).alias("__n_docs")
    )
    # the weighted vectors feed THREE consumers (norms + both
    # dot-product sides) — materialize the tf→df→weight plan once
    # (lazy localCheckpoint; ContextCleaner reclaims with the plan)
    w = (
        tf.join(dfc, "__w")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            F.col("__w"),
            (
                (F.lit(1.0) + F.log("__c"))
                * (F.log((F.col("__n_docs") + 1.0) / (F.col("__df") + 1.0)) + 1.0)
            ).alias("__wt"),
        )
        .localCheckpoint(eager=False)
    )
    norms = w.groupBy(id_col).agg(F.sqrt(F.sum(F.col("__wt") ** 2)).alias("__nrm"))
    # blocking shingles LOWERCASED to match the scoring tokens (words()
    # lowercases): without this, case-variant near-identical docs have
    # cosine 1.0 yet share zero case-sensitive shingles and are never
    # candidates — a systematic recall hole
    sh = docs.select(
        F.col(id_col),
        F.explode(shingle_array(F.lower(F.col(text_col)), 3)).alias("__sh"),
    )
    sh_df = sh.groupBy("__sh").agg(F.count(F.lit(1)).alias("__df"))
    rare = sh.join(sh_df.filter(F.col("__df") <= rare_df_max), "__sh")
    cand = (
        rare.alias("a")
        .join(rare.alias("b"), "__sh")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    wa = w.select(F.col(id_col).alias("id_a"), F.col("__w"), F.col("__wt").alias("__wa"))
    wb = w.select(F.col(id_col).alias("id_b"), F.col("__w"), F.col("__wt").alias("__wb"))
    dot = (
        cand.join(wa, "id_a")
        .join(wb, ["id_b", "__w"])
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("__wa") * F.col("__wb")).alias("__dot"))
    )
    na = norms.select(F.col(id_col).alias("id_a"), F.col("__nrm").alias("__na"))
    nb = norms.select(F.col(id_col).alias("id_b"), F.col("__nrm").alias("__nb"))
    return (
        dot.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("__dot") / (F.col("__na") * F.col("__nb"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def doc_segments(text: Column, k: int = 10) -> Column:
    """Consecutive ``k``-word segments of one document as an array —
    the unit of CCNet/C4-style line-level dedup, computed entirely
    map-side. The corpus here carries flat single-space word streams
    (no newline structure), so the "line" is a fixed-width word
    window: segment i covers words ``[i*k, (i+1)*k)`` under the
    :func:`~feature_store_spark.operators.text.words` tokenization
    contract; the final segment may be shorter. Empty/whitespace-only
    text yields an EMPTY array (``sequence(0, -1)`` would count DOWN
    in Spark and mint two phantom segments — hence the size guard)."""
    from feature_store_spark.operators.text import words

    w = words(text)
    n_seg = F.ceil(F.size(w) / F.lit(float(k))).cast("int")
    return F.when(n_seg > 0, F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.array_join(F.slice(w, i * k + 1, k), " "),
    )).otherwise(F.array().cast("array<string>"))


def segment_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    min_docs: int = 2,
) -> DataFrame:
    """CCNet-style line-level dedup / boilerplate removal (public
    pipeline step: Wenzek et al., "CCNet", and the C4 cleaning recipe
    — drop lines repeated across the corpus; reference has no analog,
    LLM-pipeline addition). Splits every document into ``k``-word
    segments, computes each segment's corpus-wide document frequency,
    and reports per document: segment counts, the duplicated-segment
    ratio, and the cleaned text with boilerplate segments (df >=
    ``min_docs`` distinct docs) removed, original order preserved.

    Scale shape (100 TB): one narrow explode (no shuffle), ONE
    hash-aggregate shuffle keyed by xxhash64(segment) for the df
    count — 8-byte keys, map-side partials — and one join of the
    exploded segments against only the DUPLICATE segment set (df >=
    min_docs), which is orders of magnitude smaller than the distinct-
    segment universe (most segments are unique; boilerplate is the
    small hot set). The join is left-anti-shaped (left join + null
    flag) so unique segments stream through; AQE skew handling splits
    the genuinely hot boilerplate keys. Reassembly is a per-doc
    collect_list of (idx, segment) structs — doc-bounded memory.
    A segment repeated WITHIN one document is not boilerplate
    (df counts distinct documents).

    NULL-text documents pass through with zero counts and NULL
    cleaned_text (unknown content is not removable content)."""
    segs = docs.select(
        F.col(id_col),
        F.posexplode(doc_segments(F.col(text_col), k)).alias(
            "__idx", "__seg"
        ),
    ).withColumn("__sh", F.xxhash64("__seg"))
    # df over distinct (segment, doc): two-phase — map-side distinct
    # within (hash, doc) then count per hash; a collision merges two
    # segments' doc sets (false boilerplate at ~n_segments^2 / 2^64 —
    # negligible; same trade as ngram_jaccard_pairs blocking)
    dup_set = (
        segs.select("__sh", id_col)
        .distinct()
        .groupBy("__sh")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") >= min_docs)
        .select("__sh")
        .withColumn("__dup", F.lit(True))
    )
    flagged = segs.join(dup_set, "__sh", "left").select(
        F.col(id_col),
        F.col("__idx"),
        F.col("__seg"),
        F.coalesce(F.col("__dup"), F.lit(False)).alias("__dup"),
    )
    per_doc = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum(F.col("__dup").cast("long")).alias("n_dup_segments"),
        F.round(F.avg(F.col("__dup").cast("double")), 6).alias("dup_ratio"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("__dup"),
                            F.struct(F.col("__idx"), F.col("__seg")),
                        )
                    )
                ),
                lambda s: s["__seg"],
            ),
            " ",
        ).alias("cleaned_text"),
    )
    nulls = (
        docs.filter(
            F.col(text_col).isNull()
            | (F.size(doc_segments(F.col(text_col), k)) == 0)
        )
        .select(
            F.col(id_col),
            F.lit(0).cast("long").alias("n_segments"),
            F.lit(0).cast("long").alias("n_dup_segments"),
            F.lit(None).cast("double").alias("dup_ratio"),
            F.lit(None).cast("string").alias("cleaned_text"),
        )
    )
    return per_doc.unionByName(nulls)


def duplicate_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 20,
    min_occurrences: int = 2,
) -> DataFrame:
    """Position-aware duplicated-substring detection (the distributed
    form of Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better" — their ExactSubstr dedup finds every
    corpus substring of >= N tokens that appears twice; here the
    suffix-array machinery becomes a windowed-fingerprint dataflow):
    fingerprint every ``window``-token sliding window, count corpus-
    wide occurrences, and merge the positions of repeated windows
    into MAXIMAL per-document spans.

    Returns one row per maximal duplicated span: ``(id, span_start,
    span_end, n_windows)`` with token indices inclusive — the ranges
    an exact-substring cleaner would cut, at win-length granularity
    (a duplicated region of length m >= window is found exactly;
    nothing shorter than ``window`` is reported, matching the paper's
    min-length contract). Overlapping or ADJACENT duplicated windows
    merge into one span (a length-2L duplicate is one region, not
    two).

    Scale shape (100 TB): the fingerprint stage is map-side (per-doc
    array ops); the occurrence count is ONE hash-aggregate shuffle
    keyed by the 16-byte fingerprint with map-side partials; repeated
    fingerprints (the small hot set — most windows are unique) join
    back against the exploded positions, and span merging is a
    per-document gaps-and-islands window, bounded by that document's
    own duplicated-window count, never corpus-wide. Fingerprints are
    md5 over the joined window text — the repo-wide engine-portable
    hash, so the DuckDB oracle reproduces every key bit-for-bit; at
    petabyte scale swap in a rolling hash behind the same dataflow
    (the hashing is the only O(tokens x window) term).

    A window repeated WITHIN one document still counts: self-repeated
    content is exactly what the paper's method removes.
    """
    from feature_store_spark.operators.text import words

    w = words(F.col(text_col))
    n = F.size(w)
    fps = F.when(
        n >= window,
        F.transform(
            F.sequence(F.lit(1), n - window + 1),
            lambda i: F.struct(
                i.alias("pos"),
                F.md5(F.array_join(F.slice(w, i, window), " ")).alias(
                    "fp"
                ),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,fp:string>>"))
    exploded = docs.select(
        F.col(id_col), F.explode(fps).alias("__w")
    ).select(F.col(id_col), F.col("__w.pos"), F.col("__w.fp"))
    # the exploded projection feeds BOTH sides of the counts join;
    # materialize it once so the O(tokens x window) md5 window-
    # fingerprint work runs once, not twice. Lazy localCheckpoint,
    # not persist, for a lazily-RETURNED frame (the
    # minhash_near_dup_pairs pattern: blocks are reclaimed on plan
    # GC; a cache entry would leak per call)
    exploded = exploded.localCheckpoint(eager=False)
    counts = exploded.groupBy("fp").agg(F.count(F.lit(1)).alias("__n"))
    dup_pos = exploded.join(
        counts.filter(F.col("__n") >= int(min_occurrences)), "fp"
    ).select(id_col, "pos")
    byid = Window.partitionBy(id_col).orderBy("pos")
    islands = dup_pos.withColumn(
        "__brk",
        F.when(
            F.col("pos") - F.lag("pos").over(byid) > F.lit(window), 1
        ).otherwise(0),
    ).withColumn("__isl", F.sum("__brk").over(byid))
    return (
        islands.groupBy(id_col, "__isl")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(window - 1)).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            "n_windows",
        )
    )
