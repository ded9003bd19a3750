"""Text analysis operators for training-data pipelines: token stats,
quality scoring, language ID, document fingerprinting.

All pure column expressions (split/array ops — no regex where a plain
string op works, no Python UDFs), so they run at scan speed and are
engine-portable for oracle checking.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny stopword inventories for the n-gram/stopword language heuristic.
# Real pipelines ship larger lists; the operator shape is identical.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es": ("el", "la", "de", "y", "que", "en", "un", "una", "es", "por"),
    "fr": ("le", "la", "de", "et", "que", "en", "un", "une", "est", "pour"),
    "de": ("der", "die", "das", "und", "zu", "in", "ist", "den", "von", "mit"),
}


def words(text: Column) -> Column:
    """Lowercased tokens, SINGLE-SPACE-delimited — the module-wide
    tokenization contract, shared verbatim with every DuckDB oracle
    (``string_split(lower(text), ' ')``), which is what keeps the
    whole text family oracle-checkable bit-for-bit. Corpora with
    tabs/newlines/multi-space runs must be whitespace-normalized
    UPSTREAM (``regexp_replace(text, '\\\\s+', ' ')`` — the same
    normalization :func:`~feature_store_spark.operators.dedup.
    shingle_array` applies internally): under this contract a raw
    newline would glue two words into one vocabulary token. Changing
    the split here without changing every oracle in lockstep breaks
    the correctness gate — hence the loud contract instead of a
    silent ``\\s+`` split."""
    return F.filter(F.split(F.lower(text), " "), lambda w: F.length(w) > 0)


def token_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc token statistics: word count, distinct words, type-token
    ratio, average word length — array aggregates over one split.
    ``coalesce(size, 0)``: on Spark 3.x legacy configs
    ``size(null) = -1`` (review r5), which would mint n_words=-1 and
    a 1.0 type-token ratio for null-text docs; the guard makes null
    handling engine-version-independent (0 words, NULL ratios)."""
    w = words(F.col(text_col))
    n_words = F.coalesce(F.size(w), F.lit(0))
    n_distinct = F.coalesce(F.size(F.array_distinct(w)), F.lit(0))
    total_len = F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x))
    return docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_distinct.alias("n_distinct_words"),
        (n_distinct / F.nullif(n_words, F.lit(0))).alias("type_token_ratio"),
        (total_len / F.nullif(n_words, F.lit(0))).alias("avg_word_len"),
    )


def token_count_bpe_ish(text: Column, chars_per_token: float = 4.0) -> Column:
    """Cheap BPE-ish token estimate: words + ceil(chars/4) blended —
    the standard pre-tokenizer heuristic for budget accounting.
    Null text counts 0 tokens on every Spark version (legacy configs
    return ``size(null) = -1``, a negative token budget)."""
    w = words(text)
    return F.greatest(
        F.coalesce(F.size(w), F.lit(0)),
        F.coalesce(
            F.ceil(F.length(text) / F.lit(chars_per_token)).cast("int"),
            F.lit(0),
        ),
    )


def quality_columns(
    w: Column,
    stopwords: Sequence[str] = STOPWORDS["en"],
    target_stopword_ratio: float = 0.4,
) -> dict[str, Column]:
    """The quality-score component expressions over a WORDS-ARRAY
    column (see :func:`quality_score` for semantics). Taking the
    array instead of raw text lets a caller project ``words(text)``
    ONCE and feed several analyses (quality + lang-ID + …) from the
    same per-row array in a single pass — the fused-pipeline shape
    (no per-analysis scan, no doc_id re-joins)."""
    n_words = F.size(w)
    sw = F.array(*[F.lit(s) for s in stopwords])
    stop_hits = F.aggregate(
        w,
        F.lit(0),
        lambda acc, x: acc + F.when(F.array_contains(sw, x), 1).otherwise(0),
    )
    stop_ratio = stop_hits / F.nullif(n_words, F.lit(0))
    len_score = F.least(F.lit(1.0), n_words / F.lit(100.0))
    stop_score = F.lit(1.0) - F.least(
        F.lit(1.0),
        F.abs(stop_ratio - F.lit(target_stopword_ratio)) * F.lit(2.0),
    )
    diversity = F.size(F.array_distinct(w)) / F.nullif(n_words, F.lit(0))
    score = (
        F.lit(0.4) * len_score
        + F.lit(0.3) * stop_score
        + F.lit(0.3) * diversity
    )
    return {
        "n_words": n_words,
        "stopword_ratio": stop_ratio,
        "lexical_diversity": diversity,
        "quality_score": score,
    }


def quality_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: Sequence[str] = STOPWORDS["en"],
    target_stopword_ratio: float = 0.4,
) -> DataFrame:
    """Heuristic document quality in [0,1]:
    0.4*length score + 0.3*stopword-ratio score + 0.3*lexical diversity.

    The components mirror the usual pretraining filters (length,
    stopword density, repetitiveness); weights are fixed constants so
    the score is deterministic. The words array is projected ONCE and
    the components read the projected attribute — with 4+ references,
    CollapseProject keeps the split un-inlined (one split per row
    instead of one per component)."""
    cols = quality_columns(
        F.col("__w"), stopwords, target_stopword_ratio
    )
    return docs.select(
        F.col(id_col), words(F.col(text_col)).alias("__w")
    ).select(
        F.col(id_col), *[c.alias(n) for n, c in cols.items()]
    )


def lang_columns(
    w: Column,
    stopword_sets: dict[str, Sequence[str]] | None = None,
) -> dict[str, Column]:
    """The stopword-vote lang-ID expressions over a WORDS-ARRAY column
    (see :func:`lang_id` for semantics); array-input twin of
    :func:`quality_columns` for fused single-pass pipelines."""
    stopword_sets = stopword_sets or STOPWORDS

    def hit_counter(sw):
        return lambda acc, x: acc + F.when(
            F.array_contains(sw, x), 1
        ).otherwise(0)

    scores = []
    for lang in sorted(stopword_sets):
        sw = F.array(*[F.lit(s) for s in stopword_sets[lang]])
        hits = F.aggregate(w, F.lit(0), hit_counter(sw))
        scores.append(
            F.struct(hits.alias("hits"), F.lit(lang).alias("lang"))
        )
    # deterministic winner: sort by (-hits, lang) ascending, take first
    ordered = F.array_sort(
        F.transform(
            F.array(*scores),
            lambda s: F.struct(
                (-s["hits"]).alias("neg"),
                s["lang"].alias("lang"),
                s["hits"].alias("hits"),
            ),
        )
    )
    top = F.element_at(ordered, 1)
    return {
        "pred_lang": F.when(top["hits"] > 0, top["lang"]).otherwise(
            F.lit("unknown")
        ),
        "stopword_hits": top["hits"],
    }


def lang_id(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopword_sets: dict[str, Sequence[str]] | None = None,
) -> DataFrame:
    """Stopword-vote language ID: count hits per language's stopword
    list, argmax (ties -> language name ascending; no hits ->
    'unknown'). The classic cheap lang-ID; swap the lists for character
    n-gram profiles without changing the dataflow."""
    cols = lang_columns(F.col("__w"), stopword_sets)
    return docs.select(
        F.col(id_col), words(F.col(text_col)).alias("__w")
    ).select(F.col(id_col), *[c.alias(n) for n, c in cols.items()])


def doc_fingerprint(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Content fingerprint: md5 of normalized text plus a 32-bit rolling
    -hash-style bucket (md5 prefix) for sharded dedup lookup tables.

    THE SAME normalization as :func:`operators.dedup.fingerprint`
    (lowercase + trim + interior-space-run collapse) — a lookup table
    built here must hit the fingerprints the dedup family computes,
    and the previous trim-only form missed on exactly the
    doubled-space noise the dedup helper collapses (review r10i)."""
    from feature_store_spark.operators.dedup import fingerprint

    fp = fingerprint(F.col(text_col))
    return docs.select(
        F.col(id_col),
        fp.alias("fingerprint"),
        (F.conv(F.substring(fp, 1, 8), 16, 10).cast("long")).alias("fingerprint32"),
    )


def repetition_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher-style repetition signals per document: the fraction of
    the document taken by its most frequent word and by its most
    frequent word bigram, plus the duplicate-word fraction
    (1 - distinct/total). High values flag boilerplate/spam for
    pretraining filters (cf. Rae et al. 2021 "Scaling Language Models",
    the repetition-filter family).

    OUTPUT CONTRACT: zero-word documents (empty, whitespace-only, or
    null text) emit NO row — repetition ratios are undefined over
    zero words. Join the result back with a LEFT join (an inner join
    would silently drop those docs from the corpus); use
    :func:`word_entropy`, which restores empties at 0, when a
    total-coverage frame is needed.

    Physical shape: explode words once, count per (doc, token) for
    unigrams and bigrams in one pass each, then per-doc max/sum
    aggregates — all codegen'd, partial aggregation map-side, shuffle
    ~distinct tokens per doc.
    """
    w = words(F.col(text_col))
    # lazy localCheckpoint: the unigram and bigram branches both read
    # this frame, and without materialization Catalyst re-runs the
    # scan+lower+split once per branch (the pack_sequences lesson,
    # same pattern as bigram_lm_scores below)
    base = (
        docs.select(F.col(id_col), w.alias("__w"))
        .filter(F.size("__w") > 0)
        .localCheckpoint(eager=False)
    )
    uni = base.select(F.col(id_col), F.explode("__w").alias("tok"))
    uni_counts = uni.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("c"))
    uni_stats = uni_counts.groupBy(id_col).agg(
        F.max("c").alias("__top_word"),
        F.sum("c").alias("__n_words"),
        F.count(F.lit(1)).alias("__n_distinct"),
    )
    # bigrams: the shared adjacent-pair helper (map-side zip)
    bi = base.select(
        F.col(id_col),
        F.explode(_bigrams(F.col("__w"))).alias("tok"),
    )
    bi_counts = bi.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("c"))
    bi_stats = bi_counts.groupBy(id_col).agg(
        F.max("c").alias("__top_bigram"), F.sum("c").alias("__n_bigrams")
    )
    return uni_stats.join(bi_stats, id_col, "left").select(
        F.col(id_col),
        (F.col("__top_word") / F.col("__n_words")).alias("top_word_frac"),
        F.coalesce(
            F.col("__top_bigram") / F.col("__n_bigrams"), F.lit(0.0)
        ).alias("top_bigram_frac"),
        (F.lit(1.0) - F.col("__n_distinct") / F.col("__n_words")).alias(
            "dup_word_frac"
        ),
    )


# PII patterns: intentionally simple, deterministic, and identical
# across engines (RE2-free syntax). Real pipelines plug in their own.
PII_PATTERNS = {
    "emails": r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}",
    "phones": r"\+?[0-9][0-9() -]{7,}[0-9]",
    "ipv4s": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def pii_scan(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Per-document PII hit counts (emails / phone-ish numbers / IPv4),
    one `regexp_count` column per pattern plus a total and a
    `has_pii` flag — the redaction-or-drop decision input of a
    curation pipeline. Pure JVM regex at scan speed; no UDFs.

    Matching is CASE-INSENSITIVE and null-safe (review r5): the
    patterns are written lowercase, so scanning raw text let
    'Bob.Smith@Corp.Example.ORG' through a has_pii filter undetected —
    for a redaction gate, a silent miss is a leak. Null text counts 0
    with has_pii=false (NULL counts would make a
    ``has_pii == False`` keep-filter silently DROP null-text docs)."""
    patterns = patterns or PII_PATTERNS
    lowered = F.lower(F.col(text_col))
    cols = [
        F.coalesce(
            F.regexp_count(lowered, F.lit(pat)), F.lit(0)
        ).alias(name)
        for name, pat in sorted(patterns.items())
    ]
    out = docs.select(F.col(id_col), *cols)
    total = sum(F.col(name) for name in sorted(patterns))
    return out.withColumn("pii_total", total.cast("long")).withColumn(
        "has_pii", (F.col("pii_total") > 0).cast("boolean")
    )


def word_entropy(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document Shannon entropy of the word distribution (nats):
    H = ln(T) - sum(c*ln c)/T over per-word counts c, total words T.
    Low entropy flags keyword-stuffed / template / repeated-token junk
    that length and repetition ratios miss; a standard pretraining
    quality signal alongside :func:`repetition_stats`.

    Physical shape: explode words once, count per (doc, word), then
    ONE per-doc aggregate combining T = sum(c) and sum(c*ln c) — the
    log identity avoids a second pass to compute p = c/T first. Both
    shuffles carry partial aggregates (map-side combine), keyed by doc
    — no global hotspot at any corpus size. Empty docs get entropy 0.

    The tokenization is projected and lazily checkpointed ONCE: the
    explode path and the zero-word empties branch both read it, and
    without the cut each branch re-ran the full lower+split scan of
    the corpus (review r10i; the repetition_stats pattern).
    """
    base = docs.select(
        F.col(id_col), words(F.col(text_col)).alias("__ws")
    ).localCheckpoint(eager=False)
    w = F.col("__ws")
    tall = base.select(F.col(id_col), F.explode(w).alias("__w"))
    counts = tall.groupBy(id_col, "__w").agg(F.count(F.lit(1)).alias("__c"))
    c = F.col("__c").cast("double")
    agg = counts.groupBy(id_col).agg(
        F.sum("__c").alias("__t"),
        F.sum(c * F.log(c)).alias("__clogc"),
    )
    t = F.col("__t").cast("double")
    h = F.log(t) - F.col("__clogc") / t
    out = agg.select(
        F.col(id_col),
        F.col("__t").cast("long").alias("n_words"),
        h.alias("word_entropy"),
    )
    # docs with zero words never reach the explode; restore them at 0.
    # coalesce(size, 0): size(null) is NULL (null-falsy), so a
    # null-text doc would hit NEITHER branch and silently vanish
    # (review r5)
    empties = base.filter(F.coalesce(F.size(w), F.lit(0)) == 0).select(
        F.col(id_col),
        F.lit(0).cast("long").alias("n_words"),
        F.lit(0.0).alias("word_entropy"),
    )
    return out.unionByName(empties)


def _bigrams(w):
    """Adjacent word pairs of a word array (map-side zip, no shuffle)."""
    return F.zip_with(
        F.slice(w, 1, F.size(w) - 1),
        F.slice(w, 2, F.size(w) - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )


def bigram_lm_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
    min_count: int = 1,
) -> DataFrame:
    """CCNet-style statistical-LM quality score: per-document mean
    negative log-likelihood under an add-k-smoothed bigram model fitted
    on the corpus itself. High NLL flags gibberish / non-language /
    boilerplate-noise documents the length- and repetition-based
    filters miss; low NLL flags templated text.

    P(w2 | w1) = (c(w1 w2) + k) / (c(w1·) + k·V), with c(w1·) the
    count of bigrams starting at w1 (so the distribution sums to 1
    over the V-word vocabulary) and V the corpus vocabulary size.

    Physical shape — everything is counts, joins on token keys, and a
    per-doc aggregate; no Python, no broadcast of the LM itself:
      1. one explode → per-doc bigram multiplicities, materialized
         ONCE via a LAZY localCheckpoint: the corpus counts, context
         counts, and the scoring join all derive from this one frame,
         and without it Catalyst re-executes the scan+explode+
         aggregate once per branch (3 corpus tokenizations — the
         pack_sequences lesson). localCheckpoint instead of persist()
         on purpose (ADVICE r3): its blocks belong to the RDD and are
         reclaimed by the ContextCleaner when the returned plan is
         garbage-collected, whereas a persist() entry sits in the
         CacheManager forever unless the CALLER remembers to
         unpersist — a per-call session leak for a lazily-returned
         frame. ``eager=False`` keeps this function job-free until
         the caller acts (ADVICE r4). TRADE-OFF, explicit: a local
         checkpoint truncates lineage with executor-local,
         non-replicated blocks — on a real cluster, losing an
         executor (spot kill, dynamic deallocation) after
         materialization FAILS downstream actions instead of
         recomputing. That is the price of deterministic block
         reclamation for a lazily-returned frame; callers running
         under preemption should re-derive via
         ``bigram_lm_scores(docs)`` on failure (the input scan is
         the recovery path, and one retry costs exactly the one
         tokenization pass this cache avoids per branch),
      2. corpus counts by bigram and context counts by first word are
         two aggregates over the cached frame (map-side partials),
      3. V from ONE distinct-word aggregate, crossJoined as a
         broadcast 1-row frame,
      4. doc bigrams re-join the count tables on the token key —
         co-keyed equi-joins sized by the corpus' distinct-token
         tail, never all-pairs — then ONE per-doc sum. Joins (not
         per-key windows) on purpose: 'of the'-grade hot bigrams skew
         the key, and AQE splits skewed joins but cannot split a
         window partition.
    Rounded to 6 decimals: the per-doc sum is over ≤ n_words doubles,
    so partition-order error is ~1e-13, far inside the rounding.

    ``min_count`` floors the LM's bigram table (VERDICT r6 #3 —
    CCNet's own KenLM models are pruned the same way): bigrams with
    corpus count < min_count are dropped from the count tables, and a
    document bigram that misses the pruned table scores as UNSEEN —
    c(w1 w2) → 0 and, when its context w1 has no surviving bigram at
    all, c(w1·) → 0, leaving the pure smoothing mass k/(k·V). This
    bounds the LM join build sides by the count-≥-floor vocabulary
    (on a Zipf corpus the hapax tail is most of the distinct keys)
    while the per-doc probe side is unchanged, which is what keeps
    the fit's shuffle from growing with raw vocabulary at 100 TB.
    Requires k > 0 when min_count > 1 (an unseen bigram's log
    argument is the smoothing constant alone). min_count=1 keeps
    every bigram and is bit-identical to the unfloored model.
    """
    if min_count > 1 and not k > 0:
        raise ValueError(
            "bigram_lm_scores: min_count > 1 scores pruned bigrams with "
            "the smoothing mass alone, so k must be > 0"
        )
    w = words(F.col(text_col))
    base = docs.select(F.col(id_col), w.alias("__w")).filter(
        F.size("__w") >= 2
    )
    bi = base.select(
        F.col(id_col), F.explode(_bigrams(F.col("__w"))).alias("bg")
    )
    # per-doc per-bigram multiplicity first: the doc-side join input
    # and the corpus counts then share one shuffle key (bg)
    doc_bi = (
        bi.groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).alias("m"))
        .localCheckpoint(eager=False)
    )
    corpus_bi = doc_bi.groupBy("bg").agg(F.sum("m").alias("cb"))
    if min_count > 1:
        corpus_bi = corpus_bi.filter(F.col("cb") >= int(min_count))
    ctx = corpus_bi.withColumn(
        "w1", F.split(F.col("bg"), " ")[0]
    ).groupBy("w1").agg(F.sum("cb").alias("cu"))
    vocab = (
        docs.select(F.explode(words(F.col(text_col))).alias("__t"))
        .agg(F.count_distinct("__t").alias("v"))
    )
    # LEFT joins so pruned (unseen) bigrams fall to the smoothing
    # mass; with min_count=1 every doc bigram exists in corpus_bi so
    # these degenerate to the inner joins they replaced
    scored = (
        doc_bi.join(corpus_bi, "bg", "left")
        .withColumn("w1", F.split(F.col("bg"), " ")[0])
        .join(ctx, "w1", "left")
        .crossJoin(F.broadcast(vocab))
    )
    ll = F.col("m") * (
        F.log(F.coalesce(F.col("cb"), F.lit(0)) + F.lit(k))
        - F.log(
            F.coalesce(F.col("cu"), F.lit(0)) + F.lit(k) * F.col("v")
        )
    )
    out = scored.groupBy(id_col).agg(
        F.sum("m").alias("n_bigrams"),
        (-F.sum(ll) / F.sum("m")).alias("nll"),
    )
    return out.select(
        F.col(id_col),
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        F.round("nll", 6).alias("nll"),
    )


def bpe_pair_counts(
    docs: DataFrame,
    text_col: str = "text",
    top_n: int = 20,
) -> DataFrame:
    """First iteration of BPE vocabulary fitting: corpus-wide counts of
    adjacent character pairs inside words, top-N by count — the pair a
    byte-pair-encoding tokenizer would merge first.

    The classic distributed-BPE trick: aggregate the corpus to its
    distinct-word frequency table FIRST (shuffle ~ vocabulary, with
    map-side combine), then explode each word's character pairs
    weighted by the word's corpus count — pair extraction runs over
    the vocabulary (thousands of rows), not the corpus (billions).
    Subsequent merge rounds re-run the same two aggregates over the
    rewritten vocabulary table; the corpus is never re-scanned.
    """
    vocab = (
        docs.select(F.explode(words(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
        .filter(F.length("word") >= 2)
    )
    pairs = vocab.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1),"
                " i -> substring(word, i, 2))"
            )
        ).alias("pair"),
        F.col("wc"),
    )
    counts = pairs.groupBy("pair").agg(F.sum("wc").alias("pair_count"))
    return (
        counts.orderBy(F.col("pair_count").desc(), F.col("pair"))
        .limit(top_n)
    )


def _char_spaced(word):
    """Word as a space-joined character sequence — the BPE working
    representation ('hello' -> 'h e l l o')."""
    return F.trim(F.regexp_replace(word, "(.)", "$1 "))


def bpe_fit(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> list[tuple[str, str, int]]:
    """Distributed BPE vocabulary fitting: learn ``n_merges`` merges
    over the corpus. Returns [(left, right, pair_count), ...] in merge
    order.

    The corpus is scanned ONCE (word frequency table); every merge
    round then runs on the VOCABULARY table only — one adjacent-pair
    count aggregate (weighted by word frequency, map-side partials),
    one 1-row argmax collect (ties broken by count desc, pair asc),
    one map-side string rewrite applying the merge everywhere
    (``replace(' x y ' -> ' xy ')`` on the sentinel-padded character
    representation — BPE's merge-all-occurrences, greedy-left on
    overlaps). 2 tiny jobs per round; the corpus is never re-read.
    The vocabulary is localCheckpointed per round so the plan does not
    accrete ``n_merges`` nested rewrites.
    """
    # LAZY checkpoints throughout (r14, same trick as graph.py's
    # propagation rounds): each round's top-pair collect is the
    # materializing action for the previous round's rewrite, so
    # lineage-cut + argmax cost ONE job per round, not two (the
    # eager form ran a separate checkpoint job per rewrite —
    # profiler: 2 jobs/round, half of them pure materialization)
    vocab = (
        docs.select(F.explode(words(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
        .filter(F.length("word") >= 2)
        .select(_char_spaced(F.col("word")).alias("r"), "wc")
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        toks = F.split(F.col("r"), " ")
        pairs = vocab.select(
            F.explode(_bigrams(toks)).alias("pair"),
            F.col("wc"),
        )
        top = (
            pairs.groupBy("pair")
            .agg(F.sum("wc").alias("c"))
            .orderBy(F.col("c").desc(), F.col("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right = top[0]["pair"].split(" ", 1)
        merges.append((left, right, int(top[0]["c"])))
        old = f" {left} {right} "
        new = f" {left}{right} "
        # replace runs twice: the sentinel-space scan consumes the
        # separator, so in a run ' x y x y ' the first pass merges
        # only alternate occurrences; the second pass catches the
        # rest (both engines implement the same non-overlapping
        # left-to-right replace, so the oracle mirrors this exactly)
        padded = F.concat(F.lit(" "), F.col("r"), F.lit(" "))
        once = F.replace(padded, F.lit(old), F.lit(new))
        twice = F.replace(once, F.lit(old), F.lit(new))
        vocab = vocab.select(
            F.trim(twice).alias("r"), "wc"
        ).localCheckpoint(eager=False)
    return merges


BPE_EXPR_MAX_MERGES = 256


def bpe_tokenize_expr(text: Column, merges: list[tuple[str, str, int]]) -> Column:
    """Tokenize words of ``text`` with a learned merge list, entirely
    map-side: per word, chain the merges over the character
    representation (the same replace-all used in fitting), then count
    the resulting tokens. Returns the token-count column — the honest
    budget counter once a tokenizer is fitted.

    Bounded at ``BPE_EXPR_MAX_MERGES`` (review r5): the expression
    nests 2 Replace nodes PER MERGE inside a higher-order aggregate,
    so a production-sized vocabulary (10k+ merges) would blow
    Catalyst analysis time and the 64KB codegen method limit. For
    real vocabularies, apply the merges in an Arrow-batched pandas
    UDF (a dict-driven loop) instead of a compiled expression — this
    expression form exists for small oracle-checkable vocabularies."""
    if len(merges) > BPE_EXPR_MAX_MERGES:
        raise ValueError(
            f"bpe_tokenize_expr: {len(merges)} merges would compile to "
            f"~{2 * len(merges)} nested Replace expressions (Catalyst "
            "analysis blow-up + 64KB codegen limit). Use an "
            "Arrow-batched UDF for vocabularies beyond "
            f"{BPE_EXPR_MAX_MERGES} merges."
        )
    w = words(text)
    def tok_count(word):
        r = F.concat(F.lit(" "), _char_spaced(word), F.lit(" "))
        for left, right, _ in merges:
            old = F.lit(f" {left} {right} ")
            new = F.lit(f" {left}{right} ")
            r = F.replace(F.replace(r, old, new), old, new)
        return F.size(F.split(F.trim(r), " "))
    return F.aggregate(
        w, F.lit(0), lambda acc, x: acc + F.when(
            F.length(x) >= 2, tok_count(x)
        ).otherwise(F.lit(1))
    )


# Gopher (Rae et al. 2021, appendix A) stop-word presence list — the
# paper's "must contain >= 2 of" test uses exactly these eight words
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021, appendix A — the
    published pretraining-corpus filter MassiveWeb used, reused by
    RefinedWeb/FineWeb/Dolma with tweaked thresholds): per-document

    - word count in [min_words, max_words],
    - mean word length in [min_mean_word_len, max_mean_word_len],
    - symbol-to-word ratio ('#' chars plus '...' runs) <= cap,
    - fraction of lines starting with a bullet <= cap,
    - fraction of lines ending with an ellipsis <= cap,
    - fraction of words containing an alphabetic char >= floor,
    - at least ``min_stop_hits`` distinct Gopher stop words present,

    and ``keep`` = every rule passes. Defaults are the paper's
    thresholds. Everything is array expressions over ONE projected
    word/line split (pure whole-stage codegen, no shuffle at all —
    the filter is embarrassingly row-parallel, which is why it
    belongs in the scan stage of a 100 TB curation pipeline);
    tokenization is the module-wide :func:`words` contract, lines
    split on the literal newline. NULL text yields n_words=0 →
    keep=false (unscoreable is not keepable).

    Returns (id, n_words, mean_word_len, symbol_ratio, bullet_frac,
    ellipsis_frac, alpha_word_frac, stop_hits, keep).
    """
    w = words(F.col(text_col))
    n_words = F.coalesce(F.size(w), F.lit(0))
    nw = n_words.cast("double")
    mean_len = F.when(
        n_words > 0,
        F.aggregate(
            w, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
        ).cast("double")
        / nw,
    )
    text = F.coalesce(F.col(text_col), F.lit(""))
    hash_n = F.length(text) - F.length(F.replace(text, F.lit("#")))
    dots_n = F.floor(
        (F.length(text) - F.length(F.replace(text, F.lit("..."))))
        / F.lit(3)
    ).cast("long")
    symbol_ratio = F.when(n_words > 0, (hash_n + dots_n) / nw)
    lines = F.filter(
        F.transform(F.split(text, "\n"), lambda s: F.trim(s)),
        lambda s: F.length(s) > 0,
    )
    n_lines = F.size(lines)
    bullet_frac = F.when(
        n_lines > 0,
        F.size(
            F.filter(
                lines,
                lambda s: s.startswith("•")
                | s.startswith("- ")
                | s.startswith("* "),
            )
        ).cast("double")
        / n_lines.cast("double"),
    ).otherwise(F.lit(0.0))
    ellipsis_frac = F.when(
        n_lines > 0,
        F.size(
            F.filter(
                lines, lambda s: s.endswith("...") | s.endswith("…")
            )
        ).cast("double")
        / n_lines.cast("double"),
    ).otherwise(F.lit(0.0))
    alpha_frac = F.when(
        n_words > 0,
        F.size(F.filter(w, lambda x: x.rlike("[a-z]"))).cast("double")
        / nw,
    )
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            lambda s: F.array_contains(w, s),
        )
    )
    keep = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_len >= min_mean_word_len)
        & (mean_len <= max_mean_word_len)
        & (symbol_ratio <= max_symbol_ratio)
        & (bullet_frac <= max_bullet_frac)
        & (ellipsis_frac <= max_ellipsis_frac)
        & (alpha_frac >= min_alpha_word_frac)
        & (stop_hits >= min_stop_hits)
    )
    return docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_frac, 6).alias("bullet_frac"),
        F.round(ellipsis_frac, 6).alias("ellipsis_frac"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        stop_hits.alias("stop_hits"),
        F.coalesce(keep, F.lit(False)).alias("keep"),
    )
