"""Deterministic dataset splitting and sampling for training pipelines.

A large-scale curation pipeline needs reproducible train/val/test splits
and per-stratum sampling that (a) never reshuffle when the corpus grows,
(b) are pure map-side Column expressions (no RNG state, no shuffle, no
Python), and (c) can be re-derived by any engine for auditing.

The primitive is an md5-hex bucket: ``substring(md5(salt|id), 1, 8)`` is
uniform over the 16^8 hex space, and comparing it LEXICOGRAPHICALLY
against a fixed hex threshold selects a fraction of rows. Staying in hex
strings end-to-end avoids every engine-specific hash or hex→int
conversion — the DuckDB oracle twin is the same substring+compare.

Spark's built-in ``df.sample``/``sampleBy`` are RNG-seeded per
partition-split and NOT stable under repartitioning or data growth;
hash-based selection is the standard fix (same idea as bucketed A/B
assignment). reference: no analogue (the reference is a log engine);
this is part of the beyond-reference training-data toolkit (SURVEY §2.8).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_SPACE = 16 ** 8


def hash_bucket_hex(col: Column, salt: str = "") -> Column:
    """First 8 md5 hex digits of (salt|value) — uniform over [0, 16^8)."""
    return F.substring(F.md5(F.concat(F.lit(f"{salt}|"), col.cast("string"))), 1, 8)


def hex_threshold(fraction: float) -> str:
    """The threshold string h such that P[bucket < h] == fraction.

    Buckets are 8 lowercase hex digits. For fraction == 1.0 the numeric
    threshold 16^8 would format as the 9-char '100000000', which sorts
    BELOW almost every 8-hex bucket lexicographically ('1' < 'f'); return
    the sentinel 'g' instead — one char above the hex alphabet, so every
    bucket compares strictly less than it.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    n = int(round(fraction * _HEX_SPACE))
    if n >= _HEX_SPACE:
        return "g"
    return format(n, "08x")


def hash_split(df: DataFrame, id_col: str, fractions: dict[str, float],
               salt: str = "") -> DataFrame:
    """Add a ``split`` column assigning each row to one named split.

    ``fractions`` maps split name → fraction; they must sum to 1 (±1e-9).
    Assignment is a pure function of (salt, id): disjoint, exhaustive,
    stable under corpus growth — new rows never move old rows between
    splits, the property a training pipeline needs for incremental
    refreshes.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if not fractions:
        raise ValueError("at least one split required")
    b = hash_bucket_hex(F.col(id_col), salt)
    names = list(fractions)
    acc = 0.0
    expr = None
    for name in names[:-1]:
        acc += fractions[name]
        cond = b < F.lit(hex_threshold(acc))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    # the last split takes the rounding tail so assignment is exhaustive
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", expr)


def stratified_sample(df: DataFrame, id_col: str, strata_col: str,
                      fractions: dict[str, float], default: float = 0.0,
                      salt: str = "") -> DataFrame:
    """Keep a per-stratum deterministic fraction of rows.

    ``fractions`` maps stratum value → keep fraction; strata not listed
    keep ``default``. The selection for a given (salt, id) is independent
    of the stratum thresholds, so raising a stratum's fraction only ADDS
    rows (supersets — handy for data-mixture ablations).
    """
    b = hash_bucket_hex(F.col(id_col), salt)
    expr = None
    for value, frac in fractions.items():
        cond = F.col(strata_col) == value
        expr = F.when(cond, F.lit(hex_threshold(frac))) if expr is None else \
            expr.when(cond, F.lit(hex_threshold(frac)))
    thr = F.lit(hex_threshold(default)) if expr is None else \
        expr.otherwise(F.lit(hex_threshold(default)))
    return df.where(b < thr)


def mixture_sample(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    weights: dict[str, float],
    total: int | None = None,
    salt: str = "",
    counts: dict[str, int] | None = None,
) -> DataFrame:
    """Deterministically resample the corpus to a target DOMAIN MIXTURE —
    the "mix web/code/books at 70/20/10" step of training-data prep.

    ``weights`` maps domain value → relative mixture weight (normalized
    internally); domains not listed are dropped. ``total`` is the target
    output row count (default: the input row count, i.e. remix at
    constant size). Each domain's resampling rate r = target_n / n may
    exceed 1: rows are replicated floor(r) times ("epochs") plus one
    fractional copy selected by the same md5-hex threshold as the other
    samplers — so the output is an exact deterministic function of
    (salt, id) and E[output per domain] = total·w. The ``copy`` column
    (0-based epoch index) keeps replicas distinct downstream.

    100 TB shape: per-domain counts are ONE tiny groupBy-count collect
    (domains are few; pass ``counts`` from catalog stats to skip the
    job), then everything is a map-side CASE + sequence-explode — no
    shuffle, linear output even for heavily up-sampled domains.
    """
    if not weights:
        raise ValueError("at least one domain weight required")
    if any(w < 0 for w in weights.values()) or sum(weights.values()) <= 0:
        raise ValueError(f"weights must be non-negative and sum > 0: {weights}")
    if counts is None:
        counts = {
            r["d"]: r["n"]
            for r in df.groupBy(F.col(domain_col).alias("d"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
    if total is None:
        total = sum(counts.values())
    if total <= 0:
        raise ValueError(f"total must be positive, got {total}")
    wsum = sum(weights.values())
    rates = {
        d: (total * w / wsum) / counts[d]
        for d, w in weights.items()
        if counts.get(d)
    }
    if not rates:
        return df.withColumn("copy", F.lit(0)).where(F.lit(False))
    b = hash_bucket_hex(F.col(id_col), salt)
    whole = None
    frac_thr = None
    for d, r in rates.items():
        cond = F.col(domain_col) == d
        w_lit, t_lit = F.lit(int(r)), F.lit(hex_threshold(r - int(r)))
        whole = F.when(cond, w_lit) if whole is None else whole.when(cond, w_lit)
        frac_thr = (
            F.when(cond, t_lit) if frac_thr is None else frac_thr.when(cond, t_lit)
        )
    k = whole.otherwise(F.lit(-1)) + F.when(b < frac_thr.otherwise("0"), 1).otherwise(0)
    # sequence(0, k-1) would COUNT DOWN for k == 0 (Spark infers step -1),
    # so rows with no copies are filtered before the explode
    return (
        df.withColumn("_k", k)
        .where(F.col("_k") > 0)
        .withColumn("copy", F.explode(F.sequence(F.lit(0), F.col("_k") - 1)))
        .drop("_k")
    )


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    count_col: str = "n_tokens",
    partitions: int | None = None,
) -> DataFrame:
    """Sequence packing: assign documents to bins of at most
    ``max_tokens`` total tokens — the standard pre-training batch-prep
    step (short documents share a context window instead of wasting
    padding). Documents longer than ``max_tokens`` get a bin of their
    own (the caller chunks or drops them; packing never splits).

    Returns (id, n_tokens, bin_id, bin_offset) with ``bin_id`` globally
    unique and ``bin_offset`` the document's token start within its bin.

    100 TB shape: exact first-fit-decreasing is inherently sequential,
    so the distributed form packs INDEPENDENTLY per partition — one
    shuffle to spread documents deterministically (hash of id), then an
    Arrow-batched per-partition FFD pass; bins never span partitions, so
    partition count scales freedom, not correctness. The waste bound is
    local-FFD's (≤ ~22% over optimal per partition, usually ~1-3% for
    heavy-tailed document lengths); deterministic for a fixed partition
    count because both the assignment hash and the within-partition
    order are value-derived.
    """
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    n_parts = partitions or df.sparkSession.sparkContext.defaultParallelism
    base = (
        df.select(
            F.col(id_col),
            F.col(count_col).cast("long").alias("_n"),
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_parts)).cast("int").alias("_p"),
        )
        .repartition(n_parts, "_p")
    )

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("n_tokens", T.LongType(), False),
            T.StructField("bin_id", T.LongType(), False),
            T.StructField("bin_offset", T.LongType(), False),
        ]
    )

    def _pack(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import heapq

        rows: list[tuple[int, int, int]] = []  # (n, id, part)
        for pdf in it:
            rows.extend(
                zip(pdf["_n"].tolist(), pdf[id_col].tolist(), pdf["_p"].tolist())
            )
        if not rows:
            return
        # hash-partitioning can co-locate several distinct _p values in
        # one physical partition; label bins with the MINIMUM _p present
        # so bin_id is value-derived (deterministic across runs/retries),
        # not arrival-order-derived. Uniqueness holds because the _p sets
        # of different physical partitions are disjoint.
        part = min(r[2] for r in rows)
        # first-fit-decreasing with a best-fit heap: largest docs first,
        # each into the fullest bin that still fits (heap keyed by free
        # space); ties broken by id for determinism
        rows.sort(key=lambda r: (-r[0], r[1]))
        used: list[int] = []
        assign: list[tuple[int, int, int, int]] = []
        free_heap: list[tuple[int, int]] = []  # (free, bin_idx) — best fit
        for n, i, _ in rows:
            placed = None
            # scan the best-fit candidates: smallest free ≥ n
            kept = []
            while free_heap:
                free, b = heapq.heappop(free_heap)
                if free >= n:
                    placed = b
                    break
                kept.append((free, b))
            for kv in kept:
                heapq.heappush(free_heap, kv)
            if placed is None:
                placed = len(used)
                used.append(0)
            assign.append((i, n, placed, used[placed]))
            used[placed] += n
            cap = max(max_tokens, n)  # oversized doc: dedicated bin, full
            if cap - used[placed] > 0 and used[placed] < max_tokens:
                heapq.heappush(free_heap, (max_tokens - used[placed], placed))
        # globally unique bin ids: partition index in the high bits
        yield pd.DataFrame(
            {
                id_col: [a[0] for a in assign],
                "n_tokens": [a[1] for a in assign],
                "bin_id": [(part << 32) | a[2] for a in assign],
                "bin_offset": [a[3] for a in assign],
            }
        )

    return base.mapInPandas(_pack, out_schema)


def chunk_documents(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    overlap: int = 0,
) -> DataFrame:
    """Split documents into chunks of at most ``max_tokens`` whitespace
    tokens with ``overlap`` tokens of context carried between consecutive
    chunks — the complement of ``pack_sequences`` (which never splits):
    chunk long documents first, then pack the pieces.

    Returns (id, chunk_id, n_tokens, text); ``chunk_id`` is the 0-based
    window index and chunk text is the token slice re-joined with single
    spaces (tokenization is whitespace-based, so re-tokenizing a chunk
    yields exactly its token slice). Trailing windows that would contain
    no NEW tokens (possible when ``overlap`` > 0) are not emitted;
    documents with zero tokens produce zero chunks. Map-side only:
    token split → start sequence → explode → slice — no shuffle, no
    Python.
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    if not 0 <= overlap < max_tokens:
        raise ValueError(f"overlap must be in [0, max_tokens), got {overlap}")
    from .text import tokens

    stride = max_tokens - overlap
    toks = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_tok")
    ).withColumn("_n", F.size("_tok"))
    starts = F.filter(
        F.sequence(F.lit(1), F.greatest("_n", F.lit(1)), F.lit(stride)),
        # keep the window iff it is the first or reaches past the
        # previous window's end (start-1-stride+max_tokens < n)
        lambda s: (s == 1) | (s + F.lit(max_tokens - stride) <= F.col("_n")),
    )
    chunk = F.slice("_tok", F.col("_start"), max_tokens)
    return (
        toks.where(F.col("_n") > 0)
        .withColumn("_start", F.explode(starts))
        .select(
            F.col(id_col),
            ((F.col("_start") - 1) / stride).cast("long").alias("chunk_id"),
            F.size(chunk).alias("n_tokens"),
            F.concat_ws(" ", chunk).alias(text_col),
        )
    )


# ----------------------------------------------------------------- DSIR
# Data Selection via Importance Resampling (Xie et al. 2023,
# arXiv:2302.03169): score every raw document by the log-likelihood
# ratio of two bag-of-hashed-n-gram unigram LMs — one fit on a small
# high-quality TARGET corpus, one on the raw corpus itself — then
# resample k documents with probability proportional to the importance
# weight (Gumbel top-k, deterministic here). The standard "make the
# crawl look like the target" selection step of LLM data curation,
# complementing the discriminative quality classifier (text.py): DSIR
# needs no negatives and preserves diversity by sampling rather than
# thresholding. Feature extraction (word 1..n-grams → pmod(murmur3,
# n_features)) is shared VERBATIM with the classifier via
# text.classifier_terms/classifier_feature, so both selectors see the
# identical hashed vocabulary.

DSIR_ALPHA = 1.0  # Laplace smoothing per hashed bucket


def _dsir_counts(
    target: DataFrame, raw: DataFrame, text_col: str, n_features: int,
    ngram: int, hasher=None,
) -> DataFrame:
    """(feature, _t, _r) hashed n-gram occurrence counts over BOTH
    corpora in ONE tagged aggregate — one explode + one groupBy whose
    output is bounded by ``n_features`` (map-side combine collapses a
    10⁸-doc corpus to ≤n_features rows per task before the exchange);
    the side tag replaces a per-corpus count pair plus their full-outer
    join (integer counts, so the fused form is value-identical)."""
    from .text import classifier_feature, classifier_terms

    both = target.select(
        F.lit(1).alias("_side"), F.col(text_col).alias("_x")
    ).unionByName(raw.select(F.lit(0).alias("_side"), F.col(text_col).alias("_x")))
    return (
        both.select(
            "_side", F.explode(classifier_terms(F.col("_x"), ngram)).alias("_t")
        )
        .select("_side",
                classifier_feature(F.col("_t"), n_features, hasher).alias("feature"))
        .groupBy("feature")
        .agg(
            F.sum("_side").alias("_t"),
            F.sum(F.lit(1) - F.col("_side")).alias("_r"),
        )
    )


def dsir_logratios(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    n_features: int | None = None,
    ngram: int | None = None,
    alpha: float = DSIR_ALPHA,
    hasher=None,
) -> DataFrame:
    """(feature, logratio) — log p̂_target(f) − log p̂_raw(f) under
    add-``alpha`` (Laplace over the full ``n_features`` hashed space)
    unigram LMs, one row per feature observed in EITHER corpus. Features
    absent from both corpora share a constant ratio
    log((Cr + αB)/(Ct + αB)) that a scorer can apply as the coalesce
    default — but when scoring ``raw`` itself (the DSIR use) every
    scored feature is present on the raw side by construction.

    100 TB shape: ONE bounded tagged count aggregate over the unioned
    corpora (≤``n_features`` rows; the per-corpus count pair and their
    full-outer join fused away — integer counts, value-identical), one
    scalar totals aggregate attached as a one-row broadcast — the
    result broadcasts to scorers.
    """
    from .text import CLASSIFIER_FEATURES, CLASSIFIER_NGRAM

    nf = n_features or CLASSIFIER_FEATURES
    ng = ngram or CLASSIFIER_NGRAM
    counts = _dsir_counts(target, raw, text_col, nf, ng, hasher).localCheckpoint(
        eager=True
    )  # one evaluation feeds both the totals and the ratio projection
    tot = counts.agg(
        F.coalesce(F.sum("_t"), F.lit(0)).alias("_ct"),
        F.coalesce(F.sum("_r"), F.lit(0)).alias("_cr"),
    )
    b = float(nf) * float(alpha)
    return counts.crossJoin(F.broadcast(tot)).select(
        "feature",
        (
            F.log((F.col("_t") + F.lit(float(alpha)))
                  / (F.col("_ct") + F.lit(b)))
            - F.log((F.col("_r") + F.lit(float(alpha)))
                    / (F.col("_cr") + F.lit(b)))
        ).alias("logratio"),
    )


def dsir_scores(
    docs: DataFrame,
    logratios: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int | None = None,
    ngram: int | None = None,
    hasher=None,
) -> DataFrame:
    """(id, n_terms, logw) — per-document importance log-weight
    Σ_f tf_f · logratio_f (the paper's product of per-n-gram ratios, in
    log space; tf is the document's RAW hashed-n-gram count, not the
    classifier's mean bag). Features missing from the table contribute 0
    (they are absent from both corpora up to hashing, so their smoothed
    ratio is a per-corpus constant the resampling rank is invariant to
    only when totals match — pass the raw corpus the ratios were fit on,
    as DSIR does, and the case never arises).

    One corpus pass: explode → hashed feature → per-(doc, feature) count
    (map-side combine) → broadcast join against the ratio table → one
    per-doc sum whose shuffle carries ≈ one row per document.
    """
    from .text import CLASSIFIER_FEATURES, CLASSIFIER_NGRAM
    from .text import classifier_feature, classifier_terms

    nf = n_features or CLASSIFIER_FEATURES
    ng = ngram or CLASSIFIER_NGRAM
    # null text behaves like empty text (terms of NULL are NULL, which
    # would otherwise drop the document at the explode AND miss the
    # size==0 empties branch — a silent row loss)
    termed = docs.select(
        F.col(id_col),
        F.coalesce(
            classifier_terms(F.col(text_col), ng),
            F.array().cast("array<string>"),
        ).alias("_terms"),
    )
    tf = (
        termed.select(
            id_col, F.size("_terms").alias("_nt"), F.explode("_terms").alias("_t")
        )
        .select(id_col, "_nt",
                classifier_feature(F.col("_t"), nf, hasher).alias("feature"))
        .groupBy(id_col, "feature")
        .agg(F.count(F.lit(1)).alias("_tf"), F.first("_nt").alias("_nt"))
    )
    scored = (
        tf.join(F.broadcast(logratios), "feature", "left")
        .groupBy(id_col)
        .agg(
            F.first("_nt").alias("n_terms"),
            F.sum(F.col("_tf") * F.coalesce("logratio", F.lit(0.0))).alias("logw"),
        )
    )
    # zero-term documents never explode a row; they carry logw 0
    empties = termed.where(F.size("_terms") == 0).select(
        F.col(id_col), F.lit(0).alias("n_terms"), F.lit(0.0).alias("logw")
    )
    return scored.unionByName(empties)


def dsir_sample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
    n_features: int | None = None,
    ngram: int | None = None,
    alpha: float = DSIR_ALPHA,
) -> DataFrame:
    """The ``k`` selected documents — (id, n_terms, logw, gumbel_key) —
    via deterministic Gumbel top-k: rank = logw + Gumbel(0,1) where the
    Gumbel noise derives from xxhash64(id, seed) (uniform in (0,1) over
    2⁵³ buckets, then −log(−log u)), so selection is seed-reproducible
    on any engine and sampling without replacement is proportional to
    the importance weight exp(logw) — the Gumbel-max equivalence the
    paper's resampling step relies on.

    100 TB shape: scoring as ``dsir_scores``; the top-k is an
    ``orderBy(...).limit(k)`` Spark plans as TakeOrderedAndProject —
    per-partition heaps, no global sort.
    """
    ratios = dsir_logratios(target, raw, text_col, n_features, ngram, alpha)
    scores = dsir_scores(raw, ratios, id_col, text_col, n_features, ngram)
    m = float(1 << 53)
    u = (F.pmod(F.xxhash64(F.col(id_col), F.lit(int(seed))), F.lit(1 << 53))
         + F.lit(0.5)) / F.lit(m)
    key = F.col("logw") - F.log(-F.log(u))
    return (
        scores.select(id_col, "n_terms", "logw", key.alias("gumbel_key"))
        .orderBy(F.desc("gumbel_key"), id_col)
        .limit(int(k))
    )


def shard_corpus(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic global shuffle + sharding for training-order
    reproducibility: adds ``shard_id`` (0..n_shards−1) and ``shard_pos``
    (1-based dense position within the shard). Training runs read shards
    in (shard_id, shard_pos) order and see the SAME document order on
    every rerun, any cluster size, any input partitioning — the property
    ``df.repartition(n).write`` does NOT give (round-robin repartition
    is layout-dependent) and RNG shuffles only give for a fixed
    partitioning.

    Both the shard assignment and the within-shard order derive from the
    md5 hex bucket of (salt|id) — the same engine-portable primitive as
    ``hash_split``, so an auditor can re-derive the full order in any
    engine. Ordering key is the FULL 32-hex digest (collisions break to
    id), shard is the first-8-hex value mod ``n_shards``.

    100 TB shape: hashing and shard assignment are pure map-side
    Columns; the only shuffle is the per-shard ``row_number`` window —
    one hash partition + per-shard sort, which is exactly the physical
    work writing ordered shards requires anyway. Hash sharding keeps
    shards within ~±3σ of corpus/n_shards rows (uniform multinomial),
    so no shard straggles. To materialize:
    ``shard_corpus(df, n).repartition(n, "shard_id")
    .sortWithinPartitions("shard_pos").write.partitionBy("shard_id")``.

    Null ids hash as the empty string (total, deterministic) — dedupe
    ids upstream if distinct placement matters.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from pyspark.sql.window import Window

    sid = F.coalesce(F.col(id_col).cast("string"), F.lit(""))
    digest = F.md5(F.concat(F.lit(f"{salt}|"), sid))
    shard = F.pmod(
        F.conv(F.substring(digest, 1, 8), 16, 10).cast("bigint"),
        F.lit(int(n_shards)),
    ).cast("int")
    keyed = df.select(
        "*", shard.alias("shard_id"), digest.alias("_okey")
    )
    w = Window.partitionBy("shard_id").orderBy("_okey", id_col)
    return keyed.select(
        "*", F.row_number().over(w).alias("shard_pos")
    ).drop("_okey")
