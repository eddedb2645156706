"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Everything is built from deterministic, engine-portable primitives (md5,
string ops, integer bit ops) so results are reproducible across engines
(→ DuckDB oracles) AND the plans scale:

- exact dedup        — hash + groupBy (one shuffle on the hash)
- MinHash + LSH      — shingle → per-seed min(md5) signature → band-bucket
                       self-join. The join key is (band_idx, band_hash),
                       so candidate generation is an equi-join (shuffle on
                       band hash), never an O(n²) cross join.
- SimHash            — 16-bit signature from per-token md5 nibble-high
                       bits; 4-bit band blocking guarantees recall for
                       hamming distance ≤ 3 (pigeonhole over 4 bands).
- n-gram Jaccard     — exact verification on LSH candidates only.

MinHash uses *string* minima of seeded md5 hex digests: lexicographic min
of a uniformly distributed hex string is a valid min-hash and avoids any
hex→int conversion differences between engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

# single source of truth for parameters — oracle SQL is generated from these
SHINGLE_N = 3
MINHASH_SEEDS = 12
LSH_BANDS = 6  # 2 seeds per band
SIMHASH_BITS = 16
SIMHASH_BANDS = 4  # 4 bits per band → guarantees hamming ≤ 3 recall


def shingles(col: Column, n: int = SHINGLE_N) -> Column:
    """Distinct word n-grams (space-joined) of the token stream."""
    toks = tokens(col)
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
        ).otherwise(F.array())
    )


def minhash_signature(df: DataFrame, id_col: str, text_col: str,
                      seeds: int = MINHASH_SEEDS) -> DataFrame:
    """(id, mh0..mh{k-1}) — per-seed lexicographic min of md5(seed|shingle).

    One explode + one groupBy: the aggregation is map-side combinable, so
    the shuffle carries only (id, k mins), not the shingle stream.
    """
    ex = df.select(
        F.col(id_col), F.explode(shingles(F.col(text_col))).alias("shingle")
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{s}|"), F.col("shingle")))).alias(f"mh{s}")
        for s in range(seeds)
    ]
    return ex.groupBy(id_col).agg(*aggs)


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
    sig = minhash_signature(df, id_col, text_col)
    bb = lsh_bands(sig, id_col)
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
    """Exact token-set Jaccard for candidate pairs (verification step)."""
    toks = df.select(
        F.col(id_col), F.array_distinct(tokens(F.col(text_col))).alias("tok")
    )
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
    """MinHash-LSH candidates verified by exact Jaccard ≥ threshold."""
    cand = lsh_candidate_pairs(df, id_col, text_col)
    return jaccard_pairs(df, cand, id_col, text_col).where(F.col("jaccard") >= threshold)


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
def _token_bit(tok: Column, j: int) -> Column:
    """Bit j of a token's 16-bit hash: the high bit of md5 hex nibble j
    (hex digit ∈ 89abcdef ⇒ 1). Engine-portable: no hex→int parsing."""
    digit = F.substring(F.md5(tok), j + 1, 1)
    return F.when(digit.isin("8", "9", "a", "b", "c", "d", "e", "f"), 1).otherwise(0)


def simhash(df: DataFrame, id_col: str, text_col: str,
            bits: int = SIMHASH_BITS) -> DataFrame:
    """(id, simhash int) — sign of per-bit vote sums over tokens."""
    ex = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
    votes = ex.groupBy(id_col).agg(
        *[F.sum(F.lit(2) * _token_bit(F.col("tok"), j) - F.lit(1)).alias(f"v{j}") for j in range(bits)]
    )
    h = None
    for j in range(bits):
        bit = F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        h = bit if h is None else h + bit
    return votes.select(F.col(id_col), h.cast("long").alias("simhash"))


def simhash_near_pairs(df: DataFrame, id_col: str, text_col: str,
                       max_hamming: int = 3) -> DataFrame:
    """Pairs with hamming(simhash) ≤ max_hamming, found via 4-bit band
    blocking (equi-join on band value — no cross join)."""
    sh = simhash(df, id_col, text_col)
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
    l, r = bands.alias("l"), bands.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bv") == F.col("r.bv"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))).alias("hamming"),
        )
        .distinct()
    )
    return pairs.where(F.col("hamming") <= max_hamming)
