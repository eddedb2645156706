"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Everything is built from deterministic, engine-portable primitives (md5,
string ops, integer bit ops) so results are reproducible across engines
(→ DuckDB oracles) AND the plans scale:

- exact dedup        — hash + groupBy (one shuffle on the hash)
- MinHash + LSH      — shingle → per-seed min(md5) signature → band-bucket
                       self-join. Signatures are computed with array
                       expressions (``array_min`` over ``transform``), NOT
                       explode+groupBy, so signature generation is a
                       narrow, shuffle-free map stage: the only shuffle in
                       the whole pipeline is the equi-join on
                       (band, band_hash) — never an O(n²) cross join.
- SimHash            — 16-bit signature from per-token md5 nibble-high
                       bits via ``aggregate`` over the token array (again
                       shuffle-free); 4-bit band blocking guarantees
                       recall for hamming distance ≤ 3 (pigeonhole over 4
                       bands).
- n-gram Jaccard     — exact verification on LSH candidates only.

MinHash uses *string* minima of seeded md5 hex digests: lexicographic min
of a uniformly distributed hex string is a valid min-hash and avoids any
hex→int conversion differences between engines.

Intermediate token/shingle arrays are projected as real columns before the
per-seed transforms so the regex tokenization runs once per row — leaving
it inline re-evaluates the split inside every higher-order-function
lambda (measured 11× slower at sf0.1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens
from .util import spread

# single source of truth for parameters — oracle SQL is generated from these
SHINGLE_N = 3
MINHASH_SEEDS = 12
LSH_BANDS = 6  # 2 seeds per band
SIMHASH_BITS = 16
SIMHASH_BANDS = 4  # 4 bits per band → guarantees hamming ≤ 3 recall


def _shingles_of(toks: Column, n: int = SHINGLE_N) -> Column:
    """Distinct word n-grams (space-joined) of an already-projected token
    array column."""
    k = F.size(toks) - (n - 1)
    return F.array_distinct(
        F.when(
            k > 0,
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, i + j) for j in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )


def shingles(col: Column, n: int = SHINGLE_N) -> Column:
    """Distinct word n-grams (space-joined) of the token stream."""
    return _shingles_of(tokens(col), n)


def _token_frame(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, _tok) for documents with ≥ SHINGLE_N tokens, tokenized BELOW
    the ``spread`` repartition.

    This is the shared scan for the whole near-dup pipeline: LSH signature
    generation and Jaccard verification both consume it, and because the
    projection+filter sit *under* the exchange, every consumer's exchange
    subtree is byte-identical — Spark's exchange reuse (ReusedExchange)
    materializes the shuffle once, so the regex tokenization runs once per
    row and ``near_duplicates`` has exactly ONE repartition regardless of
    how many stages read the tokens (round-4 finding: tokenize+spread ran
    twice, doubling both the regex work and the shuffle).
    """
    return spread(
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("_tok")).where(
            F.size("_tok") >= SHINGLE_N
        )
    )


def _signature_from_tokens(toked: DataFrame, id_col: str,
                           seeds: int = MINHASH_SEEDS) -> DataFrame:
    """(id, mh0..mh{k-1}) from an (id, _tok) frame — per-seed
    lexicographic min of md5(seed|shingle).

    Pure array expressions per row (no explode, no groupBy): the signature
    stage is a narrow map that scales linearly with no shuffle.
    """
    shingled = toked.select(F.col(id_col), _shingles_of(F.col("_tok")).alias("_sh"))
    def seeded(s: int):
        # NB: the lambda must take exactly one arg — F.transform treats a
        # two-arg lambda as (element, index)
        prefix = F.lit(f"{s}|")
        return lambda x: F.md5(F.concat(prefix, x))

    mins = [
        F.array_min(F.transform(F.col("_sh"), seeded(s))).alias(f"mh{s}")
        for s in range(seeds)
    ]
    return shingled.select(F.col(id_col), *mins)


def minhash_signature(df: DataFrame, id_col: str, text_col: str,
                      seeds: int = MINHASH_SEEDS) -> DataFrame:
    """(id, mh0..mh{k-1}) — per-seed lexicographic min of md5(seed|shingle).

    Documents with zero shingles are dropped (same as the unnest+groupBy
    oracle) — the guard is ``size(tokens) >= n`` (equivalent: at least one
    n-gram exists iff there are ≥ n tokens) so the predicate Catalyst
    pushes down is a single cheap tokenize, not a re-inlined copy of the
    whole shingle+minhash expression tree.
    """
    toked = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_tok")).where(
        F.size("_tok") >= SHINGLE_N
    )
    return _signature_from_tokens(toked, id_col, seeds)


def lsh_bands(sig: DataFrame, id_col: str, bands: int = LSH_BANDS,
              seeds: int = MINHASH_SEEDS) -> DataFrame:
    """(id, band, band_hash) — md5 over the concatenated band rows."""
    per_band = seeds // bands
    rows = []
    for b in range(bands):
        cols = [F.col(f"mh{b * per_band + j}") for j in range(per_band)]
        rows.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", *cols)).alias("band_hash"))
        )
    return sig.select(
        F.col(id_col), F.explode(F.array(*rows)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.band_hash").alias("band_hash"))


def lsh_candidate_pairs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing at least one LSH band bucket."""
    return _lsh_pairs_from_tokens(_token_frame(df, id_col, text_col), id_col)


def _lsh_pairs_from_tokens(toked: DataFrame, id_col: str) -> DataFrame:
    sig = _signature_from_tokens(toked, id_col)
    # merge-join hint: left to itself, AQE broadcasts one side of the
    # self-join at test scale, which re-computes the whole signature map
    # for that side (the expensive per-shingle md5 stage runs TWICE). A
    # sort-merge join shuffles both sides on the band key with byte-equal
    # exchange subtrees, so the signature map materializes once and the
    # second side is a ReusedExchange — also exactly the plan a
    # 100 TB input gets, where broadcast is impossible anyway.
    bb = lsh_bands(sig, id_col).hint("merge")
    left = bb.alias("l")
    right = bb.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )


def jaccard_pairs(df: DataFrame, pairs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact token-set Jaccard for arbitrary candidate pairs.

    Unlike the internal near-dup path this does NOT drop short documents —
    externally supplied pairs may reference docs with < SHINGLE_N tokens.
    """
    toks = spread(df).select(
        F.col(id_col), F.array_distinct(tokens(F.col(text_col))).alias("tok")
    )
    return _jaccard_join(toks, pairs, id_col)


def _jaccard_from_tokens(toked: DataFrame, pairs: DataFrame, id_col: str) -> DataFrame:
    toks = toked.select(F.col(id_col), F.array_distinct("_tok").alias("tok"))
    return _jaccard_join(toks, pairs, id_col)


def _jaccard_join(toks: DataFrame, pairs: DataFrame, id_col: str) -> DataFrame:
    return (
        pairs.join(toks.withColumnRenamed(id_col, "id_a").withColumnRenamed("tok", "tok_a"), "id_a")
        .join(toks.withColumnRenamed(id_col, "id_b").withColumnRenamed("tok", "tok_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.size(F.array_intersect("tok_a", "tok_b"))
                / F.size(F.array_union("tok_a", "tok_b")),
                6,
            ).alias("jaccard"),
        )
    )


def near_duplicates(df: DataFrame, id_col: str, text_col: str, threshold: float = 0.8) -> DataFrame:
    """MinHash-LSH candidates verified by exact Jaccard ≥ threshold.

    Tokenizes once: both the LSH candidate stage and the Jaccard verify
    stage read the same `_token_frame` exchange (see its docstring).
    Restricting the Jaccard token lookup to docs with ≥ SHINGLE_N tokens
    is lossless here — every candidate id comes from the signature stage,
    which already requires that.
    """
    toked = _token_frame(df, id_col, text_col)
    cand = _lsh_pairs_from_tokens(toked, id_col)
    return _jaccard_from_tokens(toked, cand, id_col).where(F.col("jaccard") >= threshold)


def exact_duplicates(df: DataFrame, id_col: str, key_col: Column) -> DataFrame:
    """Groups of exact duplicates by md5 of ``key_col``: returns
    (content_hash, keep_id, dup_count) for groups with >1 member."""
    return (
        df.select(F.md5(key_col).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dup_count"))
        .where(F.col("dup_count") > 1)
    )


# ---------------------------------------------------------------- simhash
def simhash(df: DataFrame, id_col: str, text_col: str,
            bits: int = SIMHASH_BITS) -> DataFrame:
    """(id, simhash int) — sign of per-bit vote sums over tokens.

    Per token: one md5, then the first ``bits`` hex nibbles are parsed
    with two ``conv`` calls into ints and folded into a ``bits``-wide
    mask whose bit j is the high bit of nibble j (hex digit ∈ 89abcdef).
    Per-bit votes are then integer ``aggregate``s over the mask array —
    far cheaper to codegen and run than per-bit substring compares.
    Shuffle-free; votes count token *occurrences* (not distinct tokens),
    matching the unnest oracle. Documents with zero tokens are dropped
    (as in the groupBy oracle).
    """
    assert bits == 16, "mask layout below is hardwired to 16 bits"

    def token_mask(tok: Column) -> Column:
        h = F.md5(tok)
        # two 8-nibble halves; conv(hex,16,10) of 8 digits fits a long
        k1 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
        k2 = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
        m = F.lit(0)
        for j in range(8):
            # high bit of nibble j = bit (31 - 4j) of the half-word
            m = m + F.shiftright(k1, 31 - 4 * j).bitwiseAND(F.lit(1)) * F.lit(1 << j)
            m = m + F.shiftright(k2, 31 - 4 * j).bitwiseAND(F.lit(1)) * F.lit(1 << (j + 8))
        return m

    masked = (
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("_w"))
        # guard on the cheap token array, not on _m, so the pushed-down
        # predicate doesn't re-inline the per-token md5 transform
        .where(F.size("_w") > 0)
        .select(
            F.col(id_col),
            F.size("_w").alias("_n"),
            F.transform(F.col("_w"), token_mask).alias("_m"),
        )
    )

    def vote(j: int) -> Column:
        # Σ(2*bit-1) = 2*Σbit - n
        ones = F.aggregate(
            F.col("_m"),
            F.lit(0).cast("long"),
            lambda acc, m: acc + F.shiftright(m, j).bitwiseAND(F.lit(1)),
        )
        return F.lit(2) * ones - F.col("_n")

    votes = masked.select(F.col(id_col), *[vote(j).alias(f"v{j}") for j in range(bits)])
    h = None
    for j in range(bits):
        bit = F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        h = bit if h is None else h + bit
    return votes.select(F.col(id_col), h.cast("long").alias("simhash"))


def simhash_near_pairs(df: DataFrame, id_col: str, text_col: str,
                       max_hamming: int = 3) -> DataFrame:
    """Pairs with hamming(simhash) ≤ max_hamming, found via 4-bit band
    blocking (equi-join on band value — no cross join)."""
    sh = simhash(spread(df), id_col, text_col)
    per_band = SIMHASH_BITS // SIMHASH_BANDS
    mask = (1 << per_band) - 1
    bands = sh.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("simhash", b * per_band).bitwiseAND(F.lit(mask)).alias("bv"),
                    )
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "simhash", F.col("bb.band").alias("band"), F.col("bb.bv").alias("bv"))
    # merge-join hint: same reasoning as _lsh_pairs_from_tokens — stop
    # AQE's local broadcast from running the per-token md5 signature
    # stage twice; SMJ's identical-side exchanges reuse it once.
    bands = bands.hint("merge")
    l, r = bands.alias("l"), bands.alias("r")
    # A close pair matches in SEVERAL bands (hamming 0 → all 4), so the
    # raw band join emits duplicates. Instead of a distinct() — a full
    # shuffle of every surviving pair — keep only the FIRST matching
    # band: the xor's lowest zero nibble, a pure bitwise residual
    # evaluated inside the join. Each pair then appears exactly once and
    # the only shuffle left in the whole operator is the band equi-join.
    x = F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
    per = SIMHASH_BITS // SIMHASH_BANDS
    nib = (1 << per) - 1
    first_zero_nibble = F.when(x.bitwiseAND(F.lit(nib)) == 0, 0)
    for b in range(1, SIMHASH_BANDS):
        first_zero_nibble = first_zero_nibble.when(
            F.shiftright(x, b * per).bitwiseAND(F.lit(nib)) == 0, b
        )
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bv") == F.col("r.bv"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
            & (F.col("l.band") == first_zero_nibble),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )


# -------------------------------------------------- incremental dedup
# Deduplicating a NEW shard against an EXISTING corpus without re-pairing
# the corpus against itself — the shape continuous ingestion needs at
# 100 TB: the corpus' LSH state is persisted ONCE (signatures banded and
# bucketed by band_hash; distinct token sets for verification), and each
# incoming shard computes its own bands in a map stage and probes the
# bucketed table with no corpus-side shuffle.


def _band_key() -> Column:
    return F.concat_ws(":", F.col("band").cast("string"), F.col("band_hash"))


def persist_corpus_lsh(
    spark,
    corpus: DataFrame,
    name: str,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> tuple[DataFrame, DataFrame]:
    """Materialize the corpus' near-dup probe state as two catalog
    tables: ``<name>_bands`` (id, band, band_hash) bucketed by
    band_hash — probe joins on (band, band_hash) read co-located buckets
    with no corpus-side Exchange (HashPartitioning on a subset of the
    join keys satisfies the join's clustering) — and ``<name>_toks``
    (id, tok) for exact-Jaccard verification of candidates. One shuffle
    each at write time; probing pays none."""
    toked = _token_frame(corpus, id_col, text_col)
    # single combined band key: Spark co-partitions a bucketed side only
    # when the bucket spec covers ALL join keys (requireAllClusterKeysFor-
    # CoPartition, default since 3.3), so (band, band_hash) collapse into
    # one join/bucket column
    bands = lsh_bands(_signature_from_tokens(toked, id_col), id_col).select(
        F.col(id_col), _band_key().alias("bkey")
    )
    toks = toked.select(F.col(id_col), F.array_distinct("_tok").alias("tok"))
    from .util import persist_bucketed

    out = [
        persist_bucketed(spark, df, f"{name}_{suffix}", f"{path}_{suffix}",
                         n_buckets, key)
        for suffix, df, key in (("bands", bands, "bkey"), ("toks", toks, id_col))
    ]
    return out[0], out[1]


def near_duplicates_against(
    new_df: DataFrame,
    corpus_bands: DataFrame,
    corpus_toks: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
) -> DataFrame:
    """(new_id, corpus_id, jaccard) for every NEW document whose token
    Jaccard against some persisted-corpus document reaches ``threshold``.
    The new shard's bands are a shuffle-free map stage; candidates come
    from the equi-join on (band, band_hash) against the bucketed corpus
    table; only candidates pay the exact-Jaccard verification. Anti-join
    the result's ``new_id`` against the shard to keep only novel
    documents."""
    toked = _token_frame(new_df, id_col, text_col)
    nb = lsh_bands(_signature_from_tokens(toked, id_col), id_col).select(
        F.col(id_col).alias("new_id"), _band_key().alias("bkey")
    )
    cb = corpus_bands.select(F.col(id_col).alias("corpus_id"), "bkey")
    cand = nb.join(cb, "bkey").select("new_id", "corpus_id").distinct()
    ntoks = toked.select(
        F.col(id_col).alias("new_id"), F.array_distinct("_tok").alias("_ntok")
    )
    ctoks = corpus_toks.select(
        F.col(id_col).alias("corpus_id"), F.col("tok").alias("_ctok")
    )
    inter = F.size(F.array_intersect("_ntok", "_ctok"))
    union = F.size(F.array_union("_ntok", "_ctok"))
    return (
        cand.join(ntoks, "new_id")
        .join(ctoks, "corpus_id")
        .select(
            "new_id",
            "corpus_id",
            F.round(inter.cast("double") / union, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
