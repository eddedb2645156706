"""Text analysis operators for training-data pipelines.

All operators are pure Column expressions (JVM-side, whole-stage codegen,
no Python in the hot path) so they hold at 100 TB: tokenization, language
ID (stopword-hit heuristic), quality scoring, token counting, and document
fingerprinting.

Constants here are the single source of truth — the DuckDB oracle SQL in
__spark_entry__.py is generated from the same values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Minimal function-word lists for the language-ID heuristic. The heuristic
# (most stopword hits wins, ties broken by language code) is deliberately
# simple and fully SQL-expressible so it is oracle-checkable.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "en": ("the", "a", "and", "of", "to", "in", "is", "it"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "est"),
    "zh": ("的", "是", "在", "了", "有", "和", "不", "人"),
}

# quality-score weights and the punctuation set (kept regex-portable
# between Java regex and RE2 for the oracle)
PUNCT_PATTERN = r"""[.,!?;:()\[\]{}'"-]"""
QUALITY_MIN_TOKENS = 5
QUALITY_MAX_PUNCT_RATIO = 0.2


def tokens(col: Column) -> Column:
    """Whitespace tokens of lowercased text, empties dropped."""
    return F.filter(F.split(F.lower(F.trim(col)), r"\s+"), lambda t: t != F.lit(""))


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def _hits_of(toks: Column, words: tuple[str, ...]) -> Column:
    """Number of elements of an already-projected token array in ``words``."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def stopword_hits(col: Column, words: tuple[str, ...]) -> Column:
    """Number of tokens that are in ``words``."""
    return _hits_of(tokens(col), words)


def stopword_ratio(col: Column, words: tuple[str, ...]) -> Column:
    n = token_count(col)
    return F.when(n > 0, stopword_hits(col, words) / n).otherwise(F.lit(0.0))


def punct_count(col: Column) -> Column:
    return F.length(col) - F.length(F.regexp_replace(col, PUNCT_PATTERN, ""))


def punct_ratio(col: Column) -> Column:
    n = F.length(col)
    return F.when(n > 0, punct_count(col).cast("double") / n).otherwise(F.lit(0.0))


def lang_id(col: Column) -> Column:
    """Argmax of per-language stopword hits; ties break by language code
    (ascending), 'und' (undetermined) when no stopword hits at all."""
    hit_cols = {lang: stopword_hits(col, words) for lang, words in sorted(LANG_STOPWORDS.items())}
    best = F.greatest(*hit_cols.values())
    out = F.lit("und")
    # reverse order so that the first (alphabetically smallest) language
    # wins ties when we fold with when().otherwise()
    for lang in sorted(hit_cols, reverse=True):
        out = F.when((hit_cols[lang] == best) & (best > 0), F.lit(lang)).otherwise(out)
    return out


def quality_score(col: Column) -> Column:
    """[0,1] heuristic: token volume, low punctuation, stopword presence.

    score = 0.4*min(tokens/50,1) + 0.3*(1-min(punct_ratio/0.2,1))
          + 0.3*min(stop_ratio/0.1,1)   (English stopword list)
    """
    tok = token_count(col).cast("double")
    vol = F.least(tok / F.lit(50.0), F.lit(1.0))
    pr = F.least(punct_ratio(col) / F.lit(QUALITY_MAX_PUNCT_RATIO), F.lit(1.0))
    sr = F.least(stopword_ratio(col, LANG_STOPWORDS["en"]) / F.lit(0.1), F.lit(1.0))
    return F.lit(0.4) * vol + F.lit(0.3) * (F.lit(1.0) - pr) + F.lit(0.3) * sr


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized token
    stream (whitespace-canonical, lowercased)."""
    return F.md5(F.array_join(tokens(col), " "))


# BPE-ish tokenization: GPT-2-style pretokenizer families (contractions,
# space-prefixed letter runs, digit runs, punctuation runs), restricted to
# syntax that Java regex and RE2 interpret identically (no lookarounds,
# no \p classes) so the DuckDB oracle matches byte-for-byte.
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+"


def bpe_ish_tokens(col: Column) -> Column:
    """Subword-ish tokens of lowercased text (BPE pretokenizer shape)."""
    return F.regexp_extract_all(F.lower(col), F.lit(BPE_ISH_PATTERN), F.lit(0))


# rolling-hash parameters (shared with the oracle SQL)
ROLL_BASE = 1_000_003
ROLL_MOD = 2_147_483_647  # 2^31 - 1; keeps acc*base + x within int64


def rolling_hash(col: Column) -> Column:
    """Order-sensitive polynomial rolling hash over the whitespace token
    stream: h = (h * BASE + tok_hash) mod MOD, where tok_hash is the
    first 32 md5 bits of the token. A pure left fold over the token
    array — shuffle-free and engine-portable."""
    toks = tokens(col)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (
            acc * F.lit(ROLL_BASE)
            + F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
        ) % F.lit(ROLL_MOD),
    )


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document stats frame: tokens, chars, punct ratio, lang, quality,
    fingerprint.

    The token array is projected once (``_w``) and every derived metric is
    an expression over that column — computing them straight off the text
    re-inlines the regex tokenization into each of the ~10 consumers
    (measured: 61 copies of ``split`` in the optimized plan, 2× slower).
    """
    c = F.col(text_col)
    toked = docs.select("doc_id", c.alias("_text"), tokens(c).alias("_w"))
    w, t = F.col("_w"), F.col("_text")

    hit_cols = {lang: _hits_of(w, words) for lang, words in sorted(LANG_STOPWORDS.items())}
    best = F.greatest(*hit_cols.values())
    lang = F.lit("und")
    for name in sorted(hit_cols, reverse=True):
        lang = F.when((hit_cols[name] == best) & (best > 0), F.lit(name)).otherwise(lang)

    n_tok = F.size(w).cast("double")
    praw = F.when(
        F.length(t) > 0,
        (F.length(t) - F.length(F.regexp_replace(t, PUNCT_PATTERN, ""))).cast("double")
        / F.length(t),
    ).otherwise(F.lit(0.0))
    sr = F.when(n_tok > 0, hit_cols["en"] / n_tok).otherwise(F.lit(0.0))
    quality = (
        F.lit(0.4) * F.least(n_tok / F.lit(50.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(praw / F.lit(QUALITY_MAX_PUNCT_RATIO), F.lit(1.0)))
        + F.lit(0.3) * F.least(sr / F.lit(0.1), F.lit(1.0))
    )

    return toked.select(
        "doc_id",
        F.size(w).alias("n_tokens"),
        F.length(t).alias("n_chars_computed"),
        F.round(praw, 6).alias("punct_ratio"),
        lang.alias("lang_guess"),
        F.round(quality, 6).alias("quality"),
        F.md5(F.array_join(w, " ")).alias("fingerprint"),
    )
