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


def tokens_sql(col_name: str) -> str:
    """SQL-string twin of ``tokens`` for selectExpr-built hot paths (one
    parsed projection instead of per-Column py4j round-trips); pinned to
    the Column form by test_tokens_sql_matches_column_api."""
    return f"filter(split(lower(trim({col_name})), '\\\\s+'), t -> t != '')"


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


def _sql_str(s: str) -> str:
    """A Spark-SQL string literal for ``s`` (backslash + quote escaped)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _hits_sql(arr_expr: str, words: tuple[str, ...]) -> str:
    """SQL twin of ``_hits_of`` over an already-projected token array."""
    lst = ", ".join(_sql_str(w) for w in words)
    return f"size(filter({arr_expr}, t -> array_contains(array({lst}), t)))"


def _punct_raw_sql(txt: str) -> str:
    """SQL twin of the raw punct ratio (when length>0 else 0.0)."""
    p = _sql_str(PUNCT_PATTERN)
    return (
        f"if(length({txt}) > 0, "
        f"cast(length({txt}) - length(regexp_replace({txt}, {p}, '')) as double)"
        f" / length({txt}), 0.0D)"
    )


def quality_score_sql(col: str) -> str:
    """SQL-string twin of ``quality_score`` (same op-for-op double fold,
    0.4*volume + 0.3*(1-punct) + 0.3*stopwords — D-suffixed literals keep
    every constant a double exactly like F.lit; equality with the Column
    form is pinned by test_quality_score_sql_matches_column_api)."""
    w = tokens_sql(col)
    vol = f"least(cast(size({w}) as double) / 50.0D, 1.0D)"
    pr = f"least({_punct_raw_sql(col)} / {QUALITY_MAX_PUNCT_RATIO}D, 1.0D)"
    sw = _hits_sql(w, LANG_STOPWORDS["en"])
    sr = f"if(size({w}) > 0, {sw} / size({w}), 0.0D)"
    return (
        f"0.4D * {vol} + 0.3D * (1.0D - {pr}) + 0.3D * least({sr} / 0.1D, 1.0D)"
    )


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
    The per-language stopword hit counts are likewise staged as ``_h_*``
    columns (argmax + ratio read column refs, not re-inlined filters),
    and the whole thing builds as parsed SQL projections — the Column-API
    construction cost ~0.4 s of analyzer round-trips per query build.
    Value-for-value identical to the original Column form (all four
    consuming oracle rows pin it).
    """
    toked = docs.selectExpr(
        "doc_id", f"{text_col} AS _text", f"{tokens_sql(text_col)} AS _w"
    )
    langs = sorted(LANG_STOPWORDS)
    staged = toked.selectExpr(
        "doc_id",
        "_text",
        "_w",
        *[
            f"{_hits_sql('_w', LANG_STOPWORDS[lang])} AS _h_{lang}"
            for lang in langs
        ],
    )
    best = "greatest(" + ", ".join(f"_h_{lang}" for lang in langs) + ")"
    lang = "'und'"
    # reverse order so the alphabetically smallest language wins ties,
    # exactly like the when().otherwise fold this replaces
    for name in sorted(langs, reverse=True):
        lang = f"if((_h_{name} = {best}) AND ({best} > 0), {_sql_str(name)}, {lang})"

    n_tok = "cast(size(_w) as double)"
    praw = _punct_raw_sql("_text")
    sr = f"if({n_tok} > 0, _h_en / {n_tok}, 0.0D)"
    quality = (
        f"0.4D * least({n_tok} / 50.0D, 1.0D) "
        f"+ 0.3D * (1.0D - least({praw} / {QUALITY_MAX_PUNCT_RATIO}D, 1.0D)) "
        f"+ 0.3D * least({sr} / 0.1D, 1.0D)"
    )

    return staged.selectExpr(
        "doc_id",
        "size(_w) AS n_tokens",
        "length(_text) AS n_chars_computed",
        f"round({praw}, 6) AS punct_ratio",
        f"{lang} AS lang_guess",
        f"round({quality}, 6) AS quality",
        "md5(array_join(_w, ' ')) AS fingerprint",
    )


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 2,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, "Scaling Language
    Models", table A1 — the standard public quality filters for training
    corpora):

    - ``dup_line_frac``       — 1 − distinct(lines)/lines
    - ``dup_line_char_frac``  — characters inside duplicated lines / all
                                line characters
    - ``top_ngram_char_frac`` — characters covered by all occurrences of
                                the single most frequent word ``ngram``
                                / all token characters

    Everything is a per-row array expression — sort, neighbor compares,
    integer folds — so the operator is a pure map stage (no shuffle, no
    UDF) and scans 100 TB at parquet speed. Numerators/denominators are
    computed as LONGS and divided once, so the values are independent of
    fold order and reproducible cross-engine (DuckDB oracle in
    tests/test_entry_contract.py).
    """
    c = F.col(text_col)
    lines = F.filter(
        F.transform(F.split(c, "\n"), lambda x: F.trim(x)), lambda x: x != F.lit("")
    )
    base = docs.select(
        F.col(id_col),
        *[F.col(k) for k in keep],
        lines.alias("_l"),
        F.array_sort(lines).alias("_ls"),
        tokens(c).alias("_w"),
    )
    l, ls, w = F.col("_l"), F.col("_ls"), F.col("_w")
    n_lines = F.size(l)

    dup_line_frac = F.when(
        n_lines > 0,
        F.lit(1.0)
        - F.size(F.array_distinct(l)).cast("double") / n_lines.cast("double"),
    ).otherwise(F.lit(0.0))

    # an occurrence sits in a duplicated group iff it equals a sorted
    # neighbor; try_element_at is NULL out of bounds → coalesce(false)
    def _dup_occurrence(i: Column) -> Column:
        cur = F.element_at(ls, i)
        # index 0 is structurally invalid even for try_element_at — guard
        # the i-1 access; i+1 beyond the end returns NULL and coalesces
        prev_eq = F.coalesce(
            cur == F.when(i > 1, F.element_at(ls, i - F.lit(1))), F.lit(False)
        )
        next_eq = F.coalesce(cur == F.try_element_at(ls, i + F.lit(1)), F.lit(False))
        return prev_eq | next_eq

    dup_chars = F.aggregate(
        F.sequence(F.lit(1), n_lines),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.when(_dup_occurrence(i), F.length(F.element_at(ls, i)).cast("long")).otherwise(
            F.lit(0).cast("long")
        ),
    )
    line_chars = F.aggregate(
        ls, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x).cast("long")
    )
    dup_line_char_frac = F.when(
        line_chars > 0, dup_chars.cast("double") / line_chars.cast("double")
    ).otherwise(F.lit(0.0))

    m = F.size(w)
    grams = F.when(
        m >= ngram,
        F.transform(
            F.sequence(F.lit(1), m - F.lit(ngram - 1)),
            lambda i: F.concat_ws(
                " ",
                *[F.element_at(w, i + F.lit(k)) for k in range(ngram)],
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    gs = F.array_sort(grams)
    # run-length max over the sorted gram array: chars covered by the most
    # frequent gram = max over runs of run_len * len(gram)
    zero = F.lit(0).cast("long")
    top_gram_chars = F.aggregate(
        gs,
        F.struct(
            F.lit("").alias("prev"), zero.alias("run"), zero.alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            (F.when(x == acc["prev"], acc["run"]).otherwise(zero) + F.lit(1)).cast(
                "long"
            ).alias("run"),
            F.greatest(
                acc["best"],
                (F.when(x == acc["prev"], acc["run"]).otherwise(zero) + F.lit(1))
                * F.length(x).cast("long"),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    # denominator: total token characters (spaces excluded) — documented
    # convention; the oracle uses the identical definition. The gram
    # itself embeds ngram-1 joining spaces, counted in the numerator via
    # len(gram) — also part of the documented convention.
    token_chars = F.aggregate(w, zero, lambda acc, x: acc + F.length(x).cast("long"))
    # occurrence-weighted coverage: each occurrence of the top gram
    # contributes its full length (incl. the embedded joining space), so
    # overlapping occurrences can push the raw ratio above 1 — capped to
    # keep the signal a bounded fraction (quality thresholds sit ~0.2)
    top_ngram_char_frac = F.least(
        F.lit(1.0),
        F.when(
            token_chars > 0, top_gram_chars.cast("double") / token_chars.cast("double")
        ).otherwise(F.lit(0.0)),
    )

    return base.select(
        F.col(id_col),
        *[F.col(k) for k in keep],
        n_lines.alias("n_lines"),
        F.round(dup_line_frac, 6).alias("dup_line_frac"),
        F.round(dup_line_char_frac, 6).alias("dup_line_char_frac"),
        F.round(top_ngram_char_frac, 6).alias("top_ngram_char_frac"),
    )


# Gopher's document-level quality rules (Rae et al. 2021 table A1 —
# the filters `repetition_stats` above does NOT cover): word-count and
# mean-word-length bounds, symbol-to-word ratio ('#' and ellipses),
# bullet-start / ellipsis-end line fractions, alphabetic-word fraction
# and stop-word presence. All pure per-row array expressions — a map
# stage that scans 100 TB at parquet speed, like its sibling.
GOPHER_STOPWORDS = ("and", "be", "have", "of", "that", "the", "to", "with")
GOPHER_BULLETS = ("•", "‣", "▪", "-", "*")


def gopher_quality_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(id, n_words, mean_word_len, symbol_word_ratio, bullet_line_frac,
    ellipsis_line_frac, alpha_word_frac, stopword_hits) — the Gopher
    rule signals per document. Conventions: words are the lowercased
    whitespace tokens (`tokens`), lines the trimmed non-empty lines,
    symbols are '#' plus each '...'/'…' occurrence, a word is
    alphabetic if it contains [a-z], and ``stopword_hits`` counts how
    many DISTINCT Gopher stop words appear. Null text = empty text
    (zero words — callers' min-word gates reject it, the signals stay
    total). ``keep`` carries extra columns through (e.g. the text
    itself), so a gate over the stats composes as a pure MAP filter —
    no join back to the corpus (the cc_pipeline shape)."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    base = docs.select(
        F.col(id_col),
        *[F.col(k) for k in keep],
        c.alias("_text"),
        tokens(c).alias("_w"),
        doc_lines(c).alias("_l"),
    )
    w, l, t = F.col("_w"), F.col("_l"), F.col("_text")
    zero = F.lit(0).cast("long")
    n_words = F.size(w)
    n_lines = F.size(l)
    word_chars = F.aggregate(w, zero, lambda a, x: a + F.length(x).cast("long"))
    mean_word_len = F.when(
        n_words > 0, word_chars.cast("double") / n_words.cast("double")
    ).otherwise(F.lit(0.0))
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_ell = (
        (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3
        + F.length(t) - F.length(F.replace(t, F.lit("…"), F.lit("")))
    )
    symbol_word_ratio = F.when(
        n_words > 0, (n_hash + n_ell).cast("double") / n_words.cast("double")
    ).otherwise(F.lit(0.0))
    bullets = F.array(*[F.lit(b) for b in GOPHER_BULLETS])
    bullet = F.size(
        F.filter(l, lambda x: F.exists(bullets, lambda b: x.startswith(b)))
    )
    ell_end = F.size(
        F.filter(l, lambda x: x.endswith("...") | x.endswith("…"))
    )
    bullet_line_frac = F.when(
        n_lines > 0, bullet.cast("double") / n_lines.cast("double")
    ).otherwise(F.lit(0.0))
    ellipsis_line_frac = F.when(
        n_lines > 0, ell_end.cast("double") / n_lines.cast("double")
    ).otherwise(F.lit(0.0))
    alpha = F.size(F.filter(w, lambda x: x.rlike("[a-z]")))
    alpha_word_frac = F.when(
        n_words > 0, alpha.cast("double") / n_words.cast("double")
    ).otherwise(F.lit(0.0))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(w),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    )
    return base.select(
        F.col(id_col),
        *[F.col(k) for k in keep],
        n_words.alias("n_words"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(symbol_word_ratio, 6).alias("symbol_word_ratio"),
        F.round(bullet_line_frac, 6).alias("bullet_line_frac"),
        F.round(ellipsis_line_frac, 6).alias("ellipsis_line_frac"),
        F.round(alpha_word_frac, 6).alias("alpha_word_frac"),
        stop_hits.alias("stopword_hits"),
    )


def gopher_gate(
    stats: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """``gopher_quality_stats`` rows + ``gopher_pass`` under the
    paper's published default thresholds (every bound a keyword). A
    document passes only if EVERY rule holds — the Gopher composition.
    """
    ok = (
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (F.col("symbol_word_ratio") <= max_symbol_word_ratio)
        & (F.col("bullet_line_frac") <= max_bullet_line_frac)
        & (F.col("ellipsis_line_frac") <= max_ellipsis_line_frac)
        & (F.col("alpha_word_frac") >= min_alpha_word_frac)
        & (F.col("stopword_hits") >= min_stopword_hits)
    )
    return stats.select("*", ok.alias("gopher_pass"))


_REGEX_SPECIALS = ".^$*+?()[]{}|\\"


def blocklist_pattern(words: tuple[str, ...] | list[str]) -> str:
    """The word-boundary alternation regex the C4 badword filter uses
    (Raffel et al. 2020 §2.2; the published implementation compiles the
    blocklist into one boundary-delimited regex over the lowercased
    page). Multi-word PHRASES — most of the real list — match across
    any whitespace run; punctuation-attached occurrences match because
    the boundary is zero-width ``\\b``, not tokenization. Restricted to
    syntax Java regex and RE2 (the DuckDB oracle engine) read
    identically: literal escaping + ``\\b`` + ``\\s``, no lookarounds.
    """
    # longest-first: Java and RE2 alternation is leftmost-first, so with
    # a lexicographic order a short entry shadows a longer phrase sharing
    # its prefix ('bad' would consume 'bad word' at the same position and
    # undercount hits when a max_hits tolerance is used); ties break
    # lexicographically so the pattern stays deterministic.
    wl = sorted(
        {" ".join(w.lower().split()) for w in words} - {""},
        key=lambda w: (-len(w), w),
    )
    if not wl:
        raise ValueError("blocklist must contain at least one word")
    alts = []
    for w in wl:
        esc = "".join(
            "\\" + c if c in _REGEX_SPECIALS else c for c in w
        ).replace(" ", "\\s+")
        # \b only against ASCII word-char edges: Java's \b is
        # Unicode-aware but RE2's is ASCII-only, so a boundary next to
        # e.g. CJK diverges between engine and oracle. Unsegmented
        # scripts get substring semantics — the right call there anyway.
        def _wordy(c: str) -> bool:
            return c.isascii() and (c.isalnum() or c == "_")

        pre = "\\b" if _wordy(w[0]) else ""
        post = "\\b" if _wordy(w[-1]) else ""
        alts.append(pre + esc + post)
    return "(?:" + "|".join(alts) + ")"


def blocklist_gate(
    df: DataFrame,
    words: tuple[str, ...] | list[str],
    max_hits: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(id, blocklist_hits, blocklist_pass) — the C4 banned-word
    document filter (Raffel et al. 2020 §2.2 drop any page containing a
    word from a blocklist; ``max_hits`` relaxes that to a tolerance).
    ``blocklist_hits`` counts non-overlapping matches of
    ``blocklist_pattern`` — word-boundary semantics on the lowercased
    raw text, so ``badword!`` and the multi-word phrases that dominate
    the real C4 list hit (whitespace tokenization missed both; that was
    a documented divergence from the paper until round 12).

    100 TB shape: one map stage — the compiled alternation ships as a
    regex literal inside the plan (blocklists are hundreds of entries),
    the hit count is a single ``regexp_count`` over the lowercased
    column; no shuffle, no UDF.
    """
    hits = F.coalesce(
        F.regexp_count(
            F.lower(F.col(text_col)), F.lit(blocklist_pattern(words))
        ),
        F.lit(0),
    )
    return df.select(
        F.col(id_col),
        *[F.col(k) for k in keep],
        hits.alias("blocklist_hits"),
        (hits <= F.lit(int(max_hits))).alias("blocklist_pass"),
    )


# C4 §2.2 LINE-level cleaning (Raffel et al. 2020) — the rules that come
# BEFORE the badword filter in the paper's pipeline: keep only lines
# that end in a terminal punctuation mark, contain ≥5 words and do not
# mention javascript; then drop the whole page when it has fewer than 3
# sentences, contains "lorem ipsum", or contains a curly bracket (code).
C4_TERMINAL_PUNCT = (".", "!", "?", '"')
C4_MIN_LINE_WORDS = 5
C4_MIN_SENTENCES = 3


def _c4_exprs(text_col: Column, min_line_words: int):
    """The C4 §2.2 building-block expressions over a raw text column —
    (lines, kept, cleaned, n_sentences, has_lorem, has_brace). One
    definition shared by ``c4_line_rules`` and ``quality_signals`` so
    the flag semantics cannot drift."""
    raw = F.coalesce(text_col, F.lit(""))
    trimmed = F.transform(F.split(raw, "\n"), lambda l: F.trim(l))
    lines = F.filter(trimmed, lambda l: l != F.lit(""))
    term = "|".join(f"\\{p}" if p in ".?" else p for p in C4_TERMINAL_PUNCT)
    kept = F.filter(
        lines,
        lambda l: l.rlike(f"({term})$")
        & (
            F.size(F.filter(F.split(l, r"\s+"), lambda w: w != F.lit("")))
            >= F.lit(int(min_line_words))
        )
        & ~F.lower(l).contains("javascript"),
    )
    cleaned = F.array_join(kept, "\n")
    n_sent = F.regexp_count(cleaned, F.lit(r"[.!?]+"))
    has_lorem = F.lower(raw).contains("lorem ipsum")
    has_brace = raw.contains("{")
    return lines, kept, cleaned, n_sent, has_lorem, has_brace


def c4_line_rules(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_words: int = C4_MIN_LINE_WORDS,
    min_sentences: int = C4_MIN_SENTENCES,
) -> DataFrame:
    """(id, text, n_lines, n_kept, n_sentences, has_lorem_ipsum,
    has_brace, c4_pass) — C4's line filter + page gates as ONE pure map
    stage (zero shuffle at any scale; HOF lambdas touch only the line
    element, per the round-13 capture rule).

    ``text`` is the page rebuilt from the KEPT lines; ``c4_pass`` is
    the page-level verdict (≥``min_sentences`` sentences counted as
    terminal-punctuation runs in the kept text, no "lorem ipsum", no
    '{'). Line trimming matches ``doc_lines``; word counting matches
    ``tokens``. Compose with ``blocklist_gate`` (the paper's badword
    step) and ``remove_boilerplate`` for the full C4 §2.2 treatment."""
    lines, kept, cleaned, n_sent, has_lorem, has_brace = _c4_exprs(
        F.col(text_col), min_line_words
    )
    return docs.select(
        F.col(id_col),
        cleaned.alias("text"),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        n_sent.alias("n_sentences"),
        has_lorem.alias("has_lorem_ipsum"),
        has_brace.alias("has_brace"),
        (
            (n_sent >= F.lit(int(min_sentences)))
            & ~has_lorem
            & ~has_brace
        ).alias("c4_pass"),
    )


def quality_signals(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 2,
    blocklist: tuple[str, ...] = (),
    max_hits: int = 0,
    min_line_words: int = C4_MIN_LINE_WORDS,
    min_sentences: int = C4_MIN_SENTENCES,
) -> DataFrame:
    """One wide attribute row per document — EVERY map-side quality
    signal this module computes, in ONE pass (the Dolma "attributes
    file" shape: Soldaini et al. 2024 publish exactly this per-doc
    signal table, computed once and consulted by every downstream
    filter mix):

    (id, n_chars, lang, — identity / language heuristic
     n_words, mean_word_len, symbol_word_ratio, bullet_line_frac,
     ellipsis_line_frac, alpha_word_frac, stopword_hits, gopher_pass,
     — Gopher table A1 document rules
     n_lines, dup_line_frac, dup_line_char_frac, top_ngram_char_frac,
     — Gopher repetition rules
     n_kept, n_sentences, has_lorem_ipsum, has_brace, c4_pass,
     — C4 §2.2 line/page rules (flags only; the rebuilt text is
       c4_line_rules' job)
     n_emails, n_ips, n_longnums
     — PII density (redact's counters)
     [, blocklist_hits, blocklist_pass when a blocklist is given])

    Values are COLUMN-IDENTICAL to the individual operators
    (gopher_quality_stats/gopher_gate, repetition_stats, c4_line_rules,
    redact, blocklist_gate) — pinned by a differential test — because
    the signal expressions are the same code: the ops chain through
    their ``keep=`` passthroughs and the C4 flags come from the shared
    ``_c4_exprs``. 100 TB shape: Catalyst collapses the chained
    projections into ONE map stage — the plan contains no Exchange at
    all (plan-asserted) — so the full signal table costs one parquet
    scan, vs five scans + four joins for the op-at-a-time composition.
    """
    gcols = (
        "n_words", "mean_word_len", "symbol_word_ratio",
        "bullet_line_frac", "ellipsis_line_frac", "alpha_word_frac",
        "stopword_hits", "gopher_pass",
    )
    g = gopher_gate(
        gopher_quality_stats(docs, id_col, text_col, keep=(text_col,))
    )
    r = repetition_stats(
        g, id_col, text_col, ngram, keep=gcols + (text_col,)
    )
    c = F.coalesce(F.col(text_col), F.lit(""))
    _lines, kept, _cleaned, n_sent, has_lorem, has_brace = _c4_exprs(
        F.col(text_col), min_line_words
    )
    out = [
        F.col(id_col),
        F.length(c).alias("n_chars"),
        lang_id(c).alias("lang"),
        *[F.col(k) for k in gcols],
        F.col("n_lines"),
        F.col("dup_line_frac"),
        F.col("dup_line_char_frac"),
        F.col("top_ngram_char_frac"),
        F.size(kept).alias("n_kept"),
        n_sent.alias("n_sentences"),
        has_lorem.alias("has_lorem_ipsum"),
        has_brace.alias("has_brace"),
        (
            (n_sent >= F.lit(int(min_sentences))) & ~has_lorem & ~has_brace
        ).alias("c4_pass"),
        F.regexp_count(c, F.lit(REDACT_EMAIL)).alias("n_emails"),
        F.regexp_count(c, F.lit(REDACT_IPV4)).alias("n_ips"),
        F.regexp_count(c, F.lit(REDACT_LONGNUM)).alias("n_longnums"),
    ]
    if blocklist:
        hits = F.coalesce(
            F.regexp_count(
                F.lower(F.col(text_col)), F.lit(blocklist_pattern(blocklist))
            ),
            F.lit(0),
        )
        out += [
            hits.alias("blocklist_hits"),
            (hits <= F.lit(int(max_hits))).alias("blocklist_pass"),
        ]
    return r.select(*out)


# PII redaction patterns — restricted to syntax Java regex and RE2 (the
# DuckDB oracle engine) interpret identically: no lookarounds, no \p
# classes, explicit char classes. Applied in a fixed order (emails first:
# an address contains digit runs that must not double-redact).
REDACT_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
REDACT_IPV4 = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
REDACT_LONGNUM = r"[0-9]{9,}"


def redact(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """PII scrub for training corpora: emails → ``<EMAIL>``, IPv4
    addresses → ``<IP>``, 9+-digit runs (phone/SSN/account-shaped) →
    ``<NUM>``, plus per-document match counts (counted on the ORIGINAL
    text, before any replacement). Pure regexp_replace/regexp_count
    chain — shuffle-free, UDF-free, and oracle-checkable because the
    patterns are Java-regex/RE2 portable. ``keep`` carries extra
    columns through (the gopher_quality_stats convention), so a
    pipeline tail needs no join back to recover attributes."""
    c = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(c, REDACT_EMAIL, "<EMAIL>"),
            REDACT_IPV4,
            "<IP>",
        ),
        REDACT_LONGNUM,
        "<NUM>",
    )
    return docs.select(
        F.col(id_col),
        *[F.col(k) for k in keep],
        redacted.alias("redacted"),
        F.regexp_count(c, F.lit(REDACT_EMAIL)).alias("n_emails"),
        F.regexp_count(c, F.lit(REDACT_IPV4)).alias("n_ips"),
        F.regexp_count(c, F.lit(REDACT_LONGNUM)).alias("n_longnums"),
    )


def contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    tokens_col: str | None = None,
    bench_tokens_col: str | None = None,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Benchmark decontamination signal: per-document overlap with an
    evaluation set's word n-grams (the standard pre-training hygiene
    step — drop or flag training documents that quote eval data).

    Returns (id, keep..., n_grams, n_contaminated, contamination) where
    ``n_grams`` is the document's distinct n-gram count (0 for
    documents shorter than n tokens — contamination 0.0) and
    ``contamination`` = n_contaminated / n_grams. ``keep`` carries
    extra ``docs`` columns through (the redact/gopher convention): the
    per-doc totals frame is already one row per document, so a pipeline
    tail that needs (text, contamination) reads them off this output
    instead of paying a corpus-scaled join back — the attribute rides
    the one (id, count) shuffle the signal needs anyway.

    Plan shape for 100 TB: the benchmark side is aggregated to DISTINCT
    n-grams and broadcast (eval sets are tiny next to a corpus), the
    corpus side is a map-stage explode of its own n-grams, and the
    overlap count is a map-side-combined groupBy on the document id —
    one shuffle of (id, count) pairs, no shuffle of text. Left join
    keeps clean documents in the output (count 0), so the result can
    anti-drive a filter without a second pass.
    """
    from ..ops.dedup import _shingles_of

    # tokenize ONCE per row into an attribute; the n-gram zip references
    # it several times (per shifted slice), which would re-run the
    # tokenization that many times from a raw text expression
    # tokens_col/bench_tokens_col: consume a PRE-TOKENIZED array column
    # instead of re-splitting text — the tokenize-once contract a
    # pipeline tail uses when an upstream stage (span removal) already
    # produced the exact token stream (r15; the r13 HOF rule showed
    # single-tokenization is the dominant win on these maps)
    bench_tk = (
        F.col(bench_tokens_col)
        if bench_tokens_col is not None
        else tokens(F.col(bench_text_col))
    )
    bench_grams = F.broadcast(
        benchmark.select(bench_tk.alias("_tk"))
        .select(F.explode(_shingles_of(F.col("_tk"), n)).alias("_g"))
        .distinct()
    )
    doc_tk = (
        F.col(tokens_col)
        if tokens_col is not None
        else tokens(F.col(text_col))
    )
    doc_toks = docs.select(
        F.col(id_col), *[F.col(k) for k in keep], doc_tk.alias("_tk")
    )
    doc_grams = doc_toks.select(
        F.col(id_col), F.explode(_shingles_of(F.col("_tk"), n)).alias("_g")
    )
    hits = (
        doc_grams.join(bench_grams, "_g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    totals = doc_toks.select(
        F.col(id_col),
        *[F.col(k) for k in keep],
        F.size(_shingles_of(F.col("_tk"), n)).alias("n_grams"),
    )
    return (
        totals.join(hits, id_col, "left")
        .select(
            id_col,
            *[F.col(k) for k in keep],
            F.greatest(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            F.round(
                F.when(
                    F.col("n_grams") > 0,
                    F.coalesce("n_contaminated", F.lit(0))
                    / F.col("n_grams").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("contamination"),
        )
    )


def unigram_lm_vocab(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 50_000,
    alpha: float = 0.5,
    tokens_col: str | None = None,
) -> DataFrame:
    """The (token, logp, _oov) model table :func:`unigram_lm_score`
    trains when no vocab is given — exposed so a streaming curation
    tier can train it ONCE offline, persist it (bounded: ≤vocab_size
    rows) and broadcast it per micro-batch (streaming/cc_ingest.py).
    Top ``vocab_size`` tokens by count with add-alpha smoothing; OOV
    mass is the true tail mass (total + V computed before the cut)."""
    tk = (
        F.col(tokens_col)
        if tokens_col is not None
        else tokens(F.col(text_col))
    )
    counts = (
        docs.select(tk.alias("_tok"))
        .select(F.explode("_tok").alias("_w"))
        .groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    # total + V must be computed before the top-k cut so OOV mass is
    # the true tail mass; both are tiny aggregate scalars
    tot = counts.agg(F.sum("_c").alias("_t"), F.count(F.lit(1)).alias("_v"))
    return (
        counts.orderBy(F.desc("_c"), "_w")
        .limit(vocab_size)
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("_w").alias("token"),
            F.log(
                (F.col("_c") + F.lit(alpha))
                / (F.col("_t") + F.lit(alpha) * (F.col("_v") + 1))
            ).alias("logp"),
            F.log(
                F.lit(alpha)
                / (F.col("_t") + F.lit(alpha) * (F.col("_v") + 1))
            ).alias("_oov"),
        )
    )


def unigram_lm_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab: DataFrame | None = None,
    vocab_size: int = 50_000,
    alpha: float = 0.5,
    tokens_col: str | None = None,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document unigram language-model score — the CCNet-style LM
    quality signal (Wenzek et al., "CCNet", LREC 2020 use a wiki-trained
    KenLM; the self-trained unigram form needs no external model and
    ranks the same pathologies): documents whose tokens are improbable
    under the corpus distribution score low (gibberish, encoding noise),
    pathologically repetitive common-token documents score high. Filter
    on both tails.

    Returns (id, keep..., n_tokens, avg_logprob, ppl) for EVERY input
    document; empty documents carry null score. ``vocab`` (token, logp)
    may be passed to score against a fixed reference model (and to skip
    the training aggregate); otherwise it is trained on ``docs`` itself:
    top ``vocab_size`` tokens by count with add-alpha smoothing, OOV
    mass = alpha / (total + alpha*(V+1)). ``keep`` carries extra
    ``docs`` columns through (the redact convention): they ride the
    per-doc attach join this op already pays, so a pipeline tail never
    joins back to recover attributes.

    100 TB shape: vocabulary training is one explode + groupBy-count
    (map-side partial aggregation collapses each partition to its
    distinct tokens before the shuffle); scoring joins the exploded
    tokens against the ≤50k-row vocab BROADCAST (plan keeps the corpus
    side shuffle-free) and the per-doc average partial-aggregates to one
    row per doc before its only shuffle. No Python, no collect.
    """
    tk = (
        F.col(tokens_col)
        if tokens_col is not None
        else tokens(F.col(text_col))
    )
    toks = docs.select(F.col(id_col), tk.alias("_tok"))
    exploded = toks.select(id_col, F.explode("_tok").alias("_w"))
    if vocab is None:
        vocab = unigram_lm_vocab(
            docs, text_col, vocab_size, alpha, tokens_col
        )
    if "_oov" in vocab.columns:
        oov_col = "_oov"
    else:
        oov_col = None
    scored = exploded.join(
        F.broadcast(vocab.withColumnRenamed("token", "_w")), "_w", "left"
    )
    if oov_col is None:
        # externally supplied vocab without an OOV column: fall back to
        # the vocab's own minimum log-prob for unknown tokens
        mn = vocab.agg(F.min("logp").alias("m"))
        scored = scored.crossJoin(F.broadcast(mn)).withColumn(
            "_lp", F.coalesce("logp", F.col("m"))
        )
    else:
        mn_oov = vocab.agg(F.min(oov_col).alias("m"))
        scored = scored.crossJoin(F.broadcast(mn_oov)).withColumn(
            "_lp", F.coalesce("logp", F.col("m"))
        )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg("_lp"), 6).alias("avg_logprob"),
    )
    return (
        docs.select(F.col(id_col), *[F.col(k) for k in keep])
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            *[F.col(k) for k in keep],
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.col("avg_logprob"),
            F.round(F.exp(-F.col("avg_logprob")), 4).alias("ppl"),
        )
    )


def bm25_search(
    docs: DataFrame,
    query: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 relevance to a free-text query — the
    classic lexical retrieval scorer (Robertson & Zaragoza, "The
    Probabilistic Relevance Framework: BM25 and Beyond", 2009),
    complementing the embedding-side ANN search with keyword search.

    Query text goes through the same whitespace tokenizer as documents;
    duplicate query terms count once (standard bag-of-query-terms BM25).
    Returns (id, score) for the k highest-scoring documents, score
    rounded to 6 places, ties broken by id for determinism.

    100 TB shape: the token explode is FILTERED to the ≤|Q| query terms
    map-side before any shuffle, so shuffled volume is matching-term
    occurrences, not the corpus; per-(doc, term) term frequencies
    partial-aggregate; the per-term document frequencies and the
    (N, avgdl) corpus constants are tiny one-row/|Q|-row broadcast
    frames; the final top-k is TakeOrdered, never a full sort.
    """
    q_terms = sorted({t for t in query.lower().split() if t})
    if not q_terms:
        raise ValueError("query has no tokens")
    toked = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_tok")
    ).withColumn("_dl", F.size("_tok"))
    consts = toked.agg(
        F.count(F.lit(1)).alias("_n_docs"), F.avg("_dl").alias("_avgdl")
    )
    hits = toked.select(
        id_col, "_dl", F.explode("_tok").alias("_w")
    ).where(F.col("_w").isin(q_terms))
    tf = hits.groupBy(id_col, "_w").agg(
        F.count(F.lit(1)).alias("_tf"), F.first("_dl").alias("_dl")
    )
    dfreq = tf.groupBy("_w").agg(F.count(F.lit(1)).alias("_df"))
    scored = (
        tf.join(F.broadcast(dfreq), "_w")
        .crossJoin(F.broadcast(consts))
        .withColumn(
            "_idf",
            F.log(
                1.0
                + (F.col("_n_docs") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
            ),
        )
        .withColumn(
            "_s",
            F.col("_idf")
            * F.col("_tf")
            * (k1 + 1)
            / (
                F.col("_tf")
                + k1 * (1 - b + b * F.col("_dl") / F.col("_avgdl"))
            ),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(F.round(F.sum("_s"), 6).alias("score"))
        .orderBy(F.desc("score"), id_col)
        .limit(k)
    )


def tfidf_keywords(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    m: int = 10,
) -> DataFrame:
    """Top-m characteristic terms per document by smoothed tf-idf —
    (tf/dl) · (ln((N+1)/(df+1)) + 1), the standard keyword-extraction
    signal for corpus exploration, topic tagging and near-dup triage.

    Returns (id, token, score, rank) with rank 1..m per document, ties
    broken lexicographically for determinism; documents with no tokens
    produce no rows.

    100 TB shape: per-(doc, term) term frequencies partial-aggregate
    before their shuffle; document frequencies are a second partial
    aggregate joined back ON TERM (a key-partitioned shuffle join — the
    idf table is corpus-vocabulary sized, deliberately NOT broadcast);
    the per-doc top-m is a window over the doc key, whose partition
    sizes are bounded by document length, not corpus size.
    """
    if m <= 0:
        raise ValueError(f"m must be positive, got {m}")
    from pyspark.sql.window import Window

    toked = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_tok")
    ).withColumn("_dl", F.size("_tok"))
    n_docs = toked.agg(F.count(F.lit(1)).alias("_n"))
    tf = (
        toked.select(id_col, "_dl", F.explode("_tok").alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("_tf"), F.first("_dl").alias("_dl"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("_df"))
    # hint('merge') enforces the "deliberately NOT broadcast" above:
    # without it Catalyst's post-aggregate estimate undershoots and AQE
    # broadcasts the vocabulary-sized idf table anyway (caught by the
    # round-13 suite-wide broadcast audit)
    scored = (
        tf.hint("merge").join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                (F.col("_tf") / F.col("_dl"))
                * (F.log((F.col("_n") + 1) / (F.col("_df") + 1)) + 1),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), "token")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= m)
        .select(id_col, "token", "score", "rank")
    )


# URL canonicalization / URL-level dedup moved to ops/url.py (round 13:
# consolidated with the oracle-checkable normalize_url dedup key and the
# domain-statistics stage under ONE tracking-param rule).


# ------------------------------------------------------- boilerplate lines
# Web corpora carry template lines (nav menus, cookie banners, footers)
# repeated verbatim across many documents; C4/RefinedWeb-style cleaning
# drops lines by cross-document frequency BEFORE document-level dedup so
# the shared template does not glue unrelated pages into one near-dup
# cluster. Line granularity complements dedup.remove_repeated_spans
# (token-window granularity, keep-first): boilerplate removal deletes
# EVERY occurrence of a frequent line, spans keep exactly one.

BOILERPLATE_MIN_DOC_FRAC = 0.05  # line must appear in ≥5% of documents
BOILERPLATE_MIN_DOCS = 2  # ... and in at least this many (small corpora)
# deterministic cap on the dictionary (doc_count DESC, line ASC) so the
# one-row broadcast below is bounded regardless of corpus size
BOILERPLATE_MAX_LINES = 10_000


def doc_lines(col: Column) -> Column:
    """Trimmed, non-empty lines of a document (the unit of boilerplate
    matching; blank lines can never be boilerplate)."""
    return F.filter(
        F.transform(F.split(col, "\n"), lambda l: F.trim(l)),
        lambda l: l != F.lit(""),
    )


def boilerplate_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_doc_frac: float = BOILERPLATE_MIN_DOC_FRAC,
    min_docs: int = BOILERPLATE_MIN_DOCS,
    max_lines: int = BOILERPLATE_MAX_LINES,
    n_docs: int | None = None,
) -> DataFrame:
    """(line, doc_count) — trimmed lines occurring in at least
    ``min_docs`` documents AND at least ``min_doc_frac`` of the corpus,
    capped at the ``max_lines`` most frequent (ties broken by line text
    for determinism). A line repeated within one document counts once.

    100 TB shape: the within-doc distinct is map-side (array_distinct
    before the explode), so the only data-scaled shuffle is the
    groupBy(line) count, which partial-aggregates map-side — a banner on
    10⁸ pages collapses to one row per map task before the exchange. The
    corpus doc count is one scalar aggregate (skipped when the caller
    passes ``n_docs``, e.g. from table stats). The cap's global sort sees
    only rows that already beat ``min_docs``.
    """
    if not 0.0 <= min_doc_frac <= 1.0:
        raise ValueError(f"min_doc_frac must be in [0,1], got {min_doc_frac}")
    per_doc = docs.select(
        F.explode(F.array_distinct(doc_lines(F.col(text_col)))).alias("line")
    )
    freq = (
        per_doc.groupBy("line")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .where(F.col("doc_count") >= min_docs)
    )
    if n_docs is None:
        total = docs.agg(F.count(F.lit(1)).alias("_n"))
        freq = freq.crossJoin(F.broadcast(total))
    else:
        freq = freq.withColumn("_n", F.lit(int(n_docs)))
    return (
        freq.where(F.col("doc_count") >= F.col("_n") * F.lit(float(min_doc_frac)))
        .select("line", "doc_count")
        .orderBy(F.desc("doc_count"), "line")
        .limit(max_lines)
    )


def remove_boilerplate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_doc_frac: float = BOILERPLATE_MIN_DOC_FRAC,
    min_docs: int = BOILERPLATE_MIN_DOCS,
    max_lines: int = BOILERPLATE_MAX_LINES,
    n_docs: int | None = None,
) -> DataFrame:
    """(id, text, n_lines, n_removed) — every occurrence of a
    boilerplate line (``boilerplate_lines``) deleted from every
    document. The rebuilt text is the remaining trimmed non-empty lines
    joined with newlines (normalized rebuild, same convention as
    dedup.remove_repeated_spans' token rebuild); ``n_lines`` counts the
    document's trimmed non-empty lines before removal.

    100 TB shape: the dictionary is collected into ONE row (bounded by
    ``max_lines``) and broadcast-crossJoined, so the removal itself is a
    pure map stage over the corpus — no per-line shuffle and no
    reassembly shuffle. Membership tests are array_contains over the
    sorted dictionary per line (JVM-side, dictionary ≤ max_lines).
    """
    bp = boilerplate_lines(
        docs, id_col, text_col, min_doc_frac, min_docs, max_lines, n_docs
    )
    return remove_boilerplate_with(docs, bp, id_col, text_col)


def remove_boilerplate_with(
    docs: DataFrame,
    bp: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``remove_boilerplate`` against an ALREADY-BUILT dictionary frame
    (line, doc_count) — the shape a persisted/streamed pipeline needs:
    the dictionary is trained once offline (``boilerplate_lines``,
    bounded by its max_lines cap) and applied to any later corpus or
    micro-batch as a pure map stage (one-row broadcast crossJoin, no
    per-line shuffle). Same output contract as ``remove_boilerplate``."""
    bpset = bp.agg(F.array_sort(F.collect_list("line")).alias("_bp"))
    lined = docs.select(
        F.col(id_col), doc_lines(F.col(text_col)).alias("_lines")
    ).crossJoin(F.broadcast(bpset))
    kept = F.filter(
        F.col("_lines"), lambda l: ~F.array_contains(F.col("_bp"), l)
    )
    return lined.select(
        F.col(id_col),
        F.concat_ws("\n", kept).alias(text_col),
        F.size("_lines").alias("n_lines"),
        (F.size("_lines") - F.size(kept)).alias("n_removed"),
    )


# --------------------------------------------------- quality classifier
# Discriminative quality filtering (GPT-3 / PaLM style): a linear
# classifier over hashed token n-grams, trained to separate a
# high-quality seed corpus (positives) from the raw crawl (negatives),
# then applied corpus-wide — the standard complement to the generative
# unigram_lm_score signal. The fastText-shaped feature map (bag of
# hashed word 1..n-grams) keeps both training and scoring relational.

CLASSIFIER_FEATURES = 1 << 18  # hashed feature space (fastText default 2M/10; 262k)
CLASSIFIER_NGRAM = 2  # word unigrams + bigrams


def classifier_terms(col: Column, ngram: int = CLASSIFIER_NGRAM) -> Column:
    """Bag of word 1..``ngram``-grams (space-joined) of lowercased
    whitespace tokens — the classifier's term extractor, shared verbatim
    by training and scoring so feature hashing agrees. Prefer
    :func:`classifier_terms_of` over a PROJECTED token attribute in a
    DataFrame pipeline (the zip form below evaluates ``toks`` once per
    slice argument — ~n+2 tokenizations per row from a raw text
    column, exactly 0 extra from an attribute)."""
    return classifier_terms_of(tokens(col), ngram)


def classifier_terms_of(
    toks: Column, ngram: int = CLASSIFIER_NGRAM
) -> Column:
    """``classifier_terms`` over an already-tokenized array column."""
    parts = [toks]
    for n in range(2, ngram + 1):
        # n-gram i joins tokens [i, i+n-1] — built by zipping n SHIFTED
        # slices of the token array. The obvious alternative (a
        # transform whose lambda slices `toks` per POSITION) is
        # quadratic: a higher-order function re-evaluates captured
        # non-attribute expressions per element, so the whole
        # lower/trim/regex-split tokenization re-ran once per token
        # (measured 4.5 s for 5k docs / 536k terms at sf0.1; this form
        # is ~20x faster). zip_with's arguments evaluate once per ROW.
        cnt = F.greatest(F.size(toks) - (n - 1), F.lit(0))
        g = F.slice(toks, 1, cnt)
        for k in range(1, n):
            g = F.zip_with(
                g,
                F.slice(toks, k + 1, cnt),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        parts.append(g)
    out = parts[0]
    for p in parts[1:]:
        out = F.concat(out, p)
    return out


def classifier_feature(
    term: Column, n_features: int = CLASSIFIER_FEATURES, hasher=None
) -> Column:
    """Hashed feature index of a term — pmod(murmur3(term), n_features).

    ``F.hash`` is Spark SQL's Murmur3_x86_32 (seed 42), evaluated
    JVM-side. (Deliberately NOT MLlib ``HashingTF``'s map: that uses the
    hashUnsafeBytes2 byte-mixing variant, so its indices differ —
    training below shares THIS expression, which is the only contract
    that matters.)

    ``hasher`` swaps the term→int64 hash (e.g. ``md5_prefix_hash`` for
    cross-engine differential oracles); the pmod-to-``n_features`` map
    around it is fixed so trainer/scorer agreement never depends on the
    choice."""
    h = (hasher or F.hash)(term)
    return F.pmod(h, F.lit(n_features)).cast("int")


def md5_prefix_hash(term: Column) -> Column:
    """Engine-portable term hash: the first 6 hex digits of md5 as an
    int — any SQL engine with md5 recomputes it exactly (DuckDB:
    ``('0x' || substr(md5(t), 1, 6))::INT``), unlike the JVM-only
    murmur3 default. Trades speed (md5 + string slice per term) for
    cross-engine determinism; meant for differential oracles, not the
    100 TB hot path."""
    return F.conv(F.substring(F.md5(term), 1, 6), 16, 10).cast("int")


def _classifier_features(
    docs: DataFrame, id_col, text_col: str, n_features: int, ngram: int,
    hasher=None,
) -> DataFrame:
    """(id, feature, x) mean-bag features: x = tf / n_terms, plus the
    constant intercept feature -1 with x = 1.0 for every document (so
    the bias trains through the same aggregates as every other weight).
    Shared verbatim by trainer and scorer — feature-map drift between
    the two is impossible by construction. The token array is projected
    BEFORE the n-gram zip so tokenization runs once per row (the n-gram
    construction references the attribute several times, which also
    keeps CollapseProject from inlining it back)."""
    termed = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    ).select(
        F.col(id_col),
        classifier_terms_of(F.col("_toks"), ngram).alias("_terms"),
    )
    tf = (
        termed.select(
            id_col,
            F.size("_terms").alias("_nt"),
            F.explode("_terms").alias("_t"),
        )
        .select(
            id_col, "_nt",
            classifier_feature(F.col("_t"), n_features, hasher).alias("feature"),
        )
        .groupBy(id_col, "feature")
        .agg((F.count(F.lit(1)) / F.greatest(F.first("_nt"), F.lit(1))).alias("x"))
    )
    bias = termed.select(
        F.col(id_col), F.lit(-1).alias("feature"), F.lit(1.0).alias("x")
    )
    return tf.unionByName(bias)


def train_quality_classifier(
    pos: DataFrame,
    neg: DataFrame,
    text_col: str = "text",
    n_features: int = CLASSIFIER_FEATURES,
    ngram: int = CLASSIFIER_NGRAM,
    iters: int = 8,
    lr: float = 1.0,
    reg: float = 1e-4,
) -> DataFrame:
    """(feature int, weight double) — a logistic-regression quality
    classifier separating ``pos`` (label 1) from ``neg`` (label 0); the
    intercept rides as feature -1. Training is full-batch DIAGONAL-
    NEWTON descent expressed as DataFrame aggregates (the in-house-
    trainer precedent of ``unigram_lm_score``): per pass, one broadcast
    join of the cached feature rows against the weight table, a per-doc
    sum, and a per-feature gradient+curvature sum; each weight steps by
    g/h with h = Σ x²·s(1-s) its own second derivative, clamped to ±lr
    per pass, so the step is invariant to feature scaling (a handful of
    passes converge where plain GD on mean-bag features crawls) yet
    bounded on separable data. No Python in the data path,
    no driver collect in the loop. The returned frame holds one row per
    OBSERVED feature (≤ corpus vocabulary, ≤ n_features), so it
    broadcasts.

    Intended use at 100 TB mirrors the literature: train on seed-scale
    labeled sets (quality seeds are thousands-to-millions of docs), then
    ``quality_classifier_score`` the full corpus in one pass. The
    trainer itself still distributes (every pass is map-side work plus
    two key-partitioned aggregates), so large training sets only cost
    ``iters`` passes, but full-batch GD is the wrong tool past that —
    sample first.
    """
    # materialize the id assignment BEFORE deriving features and labels:
    # monotonically_increasing_id is partition-layout-dependent, so two
    # independent evaluations of the same lazy frame (e.g. under AQE on
    # a shuffled upstream) can id the same document differently — feats
    # would then join the WRONG labels. One eager checkpoint pins it.
    labeled = (
        pos.select(F.col(text_col), F.lit(1.0).alias("_y"))
        .unionByName(neg.select(F.col(text_col), F.lit(0.0).alias("_y")))
        .select(F.monotonically_increasing_id().alias("_did"), text_col, "_y")
        .localCheckpoint(eager=True)
    )
    feats = _classifier_features(
        labeled, "_did", text_col, n_features, ngram
    ).localCheckpoint(eager=True)
    labels = labeled.select("_did", "_y")
    n = labels.count()
    spark = pos.sparkSession
    w = spark.createDataFrame([], "feature int, weight double")
    for _ in range(iters):
        errs = (
            feats.join(F.broadcast(w), "feature", "left")
            .groupBy("_did")
            .agg(F.sum(F.col("x") * F.coalesce("weight", F.lit(0.0))).alias("_dot"))
            .join(labels, "_did")
            .select(
                "_did",
                (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("_dot")))).alias("_s"),
                "_y",
            )
            .select(
                "_did",
                (F.col("_s") - F.col("_y")).alias("_e"),
                (F.col("_s") * (F.lit(1.0) - F.col("_s"))).alias("_c"),
            )
        )
        grads = (
            feats.join(errs, "_did")
            .groupBy("feature")
            .agg(
                (F.sum(F.col("x") * F.col("_e")) / F.lit(float(n))).alias("_g"),
                (
                    F.sum(F.col("x") * F.col("x") * F.col("_c")) / F.lit(float(n))
                ).alias("_h"),
            )
        )
        # L2 only on real features. The Newton ratio g/h explodes once a
        # feature saturates (s(1-s) → 0 drives h → 0 while a floored
        # denominator leaves g finite), so the per-pass step is CLAMPED
        # to ±lr — scale-invariance of Newton inside the clamp, bounded
        # |Δw| ≤ lr·iters outside it (the standard damped/clipped form;
        # separable data would otherwise oscillate to ±∞)
        l2 = F.when(F.col("feature") >= 0, F.lit(reg)).otherwise(F.lit(0.0))
        raw = (
            F.coalesce("_g", F.lit(0.0)) + l2 * F.coalesce("weight", F.lit(0.0))
        ) / (F.coalesce("_h", F.lit(0.0)) + l2 + F.lit(1e-8))
        w = (
            grads.join(w, "feature", "full")
            .select(
                "feature",
                (
                    F.coalesce("weight", F.lit(0.0))
                    - F.greatest(F.least(raw, F.lit(lr)), F.lit(-lr))
                ).alias("weight"),
            )
            .localCheckpoint(eager=True)  # cut lineage; one materialization per pass
        )
    return w


def quality_classifier_score(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = CLASSIFIER_FEATURES,
    ngram: int = CLASSIFIER_NGRAM,
    hasher=None,
) -> DataFrame:
    """(id, n_terms, score) for every document — sigmoid of the
    mean-bag hashed n-gram dot product against ``weights`` (the same
    ``_classifier_features`` the trainer consumed, including the
    intercept's constant feature -1, so trained weights apply with zero
    feature-map drift). A pure DataFrame plan a 100 TB corpus runs in
    one pass: term explode → hashed feature → per-(doc, feature) mean
    (map-side combine) → broadcast join against the weight table → one
    per-doc sum shuffle. Documents with no terms score
    sigmoid(intercept).
    """
    feats = _classifier_features(docs, id_col, text_col, n_features, ngram, hasher)
    dots = (
        feats.join(F.broadcast(weights), "feature")
        .groupBy(id_col)
        .agg(F.sum(F.col("x") * F.col("weight")).alias("_dot"))
    )
    totals = docs.select(
        F.col(id_col),
        F.size(classifier_terms(F.col(text_col), ngram)).alias("n_terms"),
    )
    return totals.join(dots, id_col, "left").select(
        id_col,
        "n_terms",
        F.round(
            F.lit(1.0) / (F.lit(1.0) + F.exp(-F.coalesce("_dot", F.lit(0.0)))),
            6,
        ).alias("score"),
    )


# -------------------------------------------------------------- BPE train
# A REAL byte-pair-encoding merge learner (Sennrich et al. 2016,
# arXiv:1508.07909) — upgrades the regex-only `bpe_ish_tokens`
# pretokenizer to a tokenizer actually trained on the corpus. The
# standard scalable formulation: one corpus pass builds the weighted
# WORD vocabulary (tiny next to the corpus — the only data-scaled
# stage), then each merge ROUND runs over that vocabulary frame alone:
# adjacent-pair explode → weighted count → top-W window collect → a
# provably order-equivalent BATCH of merges applied as nested folds in
# ONE select. Word-internal merges without an end-of-word marker
# (documented deviation from the paper's '</w>' variant; segment
# boundaries stay word boundaries by construction). Real trainers run
# 10⁴–10⁵ merges; batching bounds the driver round-trips to
# O(n_merges / accepted-per-round) — typically 5-20× fewer Spark jobs
# than the one-job-per-merge loop, with the schedule EQUAL to the
# sequential argmax schedule (proven against the python twin in
# tests/test_ops.py::test_bpe_train_twin / _batch_equivalence).
#
# Soundness of the batch rule (why the batched schedule == sequential):
# we accept a maximal PREFIX p_1..p_k of the (count DESC, a, b ASC)
# window such that each accepted p_i is the sequential argmax at its
# turn after p_1..p_{i-1} are applied. Competitor classes:
#   (a) old pairs disjoint from all accepted symbols: counts unchanged,
#       sorted after p_i with the same tie-break — can't outrank;
#   (b) old pairs AFFECTED by an accepted merge (a_j, b_j) — exactly
#       the forms (·, a_j), (b_j, ·) and the pair itself (a merge
#       consumes an adjacent symbol only when the a_j is followed by
#       b_j, so (a_j, y≠b_j) and (x≠a_j, b_j) counts are UNTOUCHED):
#       affected counts can only DECREASE, and they sort after the
#       accepted prefix — can't outrank;
#   (c) NEW pairs (x, a_j·b_j)/(a_j·b_j, y) created by accepted merge
#       j: each instance requires an old (x, a_j)/(b_j, y) adjacency,
#       so its count ≤ the max old count over those forms — we track
#       that bound and require every later accept to be STRICTLY above
#       it (plus the window-truncation boundary);
#   (d) pairs touching a concat that ALREADY existed as a symbol (the
#       only class whose counts can increase), and self-pairs (a, a)
#       whose fold emits (a·a, a) bounded by the merge's own count:
#       both accept-then-stop the round.
# Stopping early is always sound — the round simply under-applies and
# the next window re-ranks from recomputed counts.
#
# Batching has a data-dependent ceiling, though: BPE schedules are
# dependency CHAINS (each merge's concat immediately feeds the next —
# 'as'→'ash'→'hash'), so even a perfect oracle batcher averages ~2
# merges/round on natural text. Production trainers (fastBPE, HF
# tokenizers, SentencePiece) therefore run the merge loop IN MEMORY on
# the word vocabulary — which is bounded (distinct words, prunable via
# min_word_count / frequency caps), tiny next to the corpus, and the
# only state the loop needs. `bpe_train` does the same: when the vocab
# fits under ``driver_vocab_rows`` it is collected once and trained
# with an incremental-pair-count sequential loop (exact same schedule,
# O(1) Spark jobs total); above the threshold the batched distributed
# loop takes over. The corpus-scaled stage is always the single
# word-count pass.

def _bpe_adjacent_pairs(sym_col: str) -> Column:
    """array<struct<a,b>> of adjacent symbol pairs of an array column."""
    s = F.col(sym_col)
    n = F.size(s)
    return F.zip_with(
        F.slice(s, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(s, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )


def _bpe_merge_fold(sym_col, a: str, b: str) -> Column:
    """Left-to-right greedy application of merge (a,b)→ab over a symbol
    array — the paper's re-segmentation step ('aaa' + (a,a) → [aa, a]),
    as a pure aggregate fold. ``sym_col`` may be a name or a Column, so
    a batch of disjoint merges chains as nested folds in ONE select."""
    s = F.col(sym_col) if isinstance(sym_col, str) else sym_col
    la, lb = F.lit(a), F.lit(b)
    return F.aggregate(
        s,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == la) & (x == lb),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.concat(la, lb))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _bpe_train_driver(
    wc: list[tuple[str, int]], n_merges: int, min_pair_count: int
) -> tuple[list[tuple[str, str]], list[list[str]]]:
    """Exact sequential BPE over a collected (word, count) vocabulary
    with incremental pair-count maintenance and a lazy-deletion heap
    argmax — the fastBPE / HF-tokenizers in-memory formulation. Merge
    schedule and final segmentations are IDENTICAL to the distributed
    loop (same (count DESC, pair ASC) tie-break, same greedy fold);
    only the per-merge cost changes: O(affected words) instead of a
    Spark job. Returns (merges, per-word symbol lists in input order)."""
    import heapq

    words = [list(w) for w, _ in wc]
    counts = [c for _, c in wc]
    pair_counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    heap: list[tuple[int, str, str]] = []

    def _add(i: int, sign: int) -> None:
        c = counts[i] * sign
        syms = words[i]
        for p in zip(syms, syms[1:]):
            n = pair_counts.get(p, 0) + c
            if n:
                pair_counts[p] = n
            else:
                pair_counts.pop(p, None)
            s = where.setdefault(p, set())
            if sign > 0:
                s.add(i)
            if n > 0:
                heapq.heappush(heap, (-n, p[0], p[1]))

    def _drop(i: int) -> None:
        syms = words[i]
        for p in set(zip(syms, syms[1:])):
            s = where.get(p)
            if s is not None:
                s.discard(i)
                if not s:
                    where.pop(p, None)

    for i in range(len(words)):
        _add(i, 1)
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        negn, a, b = heapq.heappop(heap)
        if pair_counts.get((a, b), 0) != -negn:
            continue  # stale heap entry
        if -negn < min_pair_count:
            break
        merges.append((a, b))
        for i in sorted(where.get((a, b), ())):
            _drop(i)
            _add(i, -1)
            syms, out = words[i], []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            words[i] = out
            _add(i, 1)
    return merges, words


def bpe_train(
    docs: DataFrame,
    n_merges: int = 100,
    text_col: str = "text",
    min_pair_count: int = 2,
    min_word_count: int = 1,
    merges_per_round: int = 16,
    driver_vocab_rows: int = 1_000_000,
    stats: dict | None = None,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """(merges, vocab) — ``merges`` is the learned merge list in rank
    order; ``vocab`` is (word, count, symbols array<string>) holding
    every training word's final segmentation under those merges (the
    training by-product real BPE trainers export as the fast-path
    encoder table).

    Ties break deterministically: highest weighted count, then (a, b)
    lexicographic. Training stops early when no pair reaches
    ``min_pair_count``. Lineage is cut per round (localCheckpoint) so a
    long merge schedule cannot grow the plan.

    When the word vocabulary fits under ``driver_vocab_rows`` it is
    collected ONCE and trained in memory (`_bpe_train_driver` — exact
    same schedule, O(1) Spark jobs for the whole run; this is the
    production-trainer formulation, see module comment). Otherwise the
    distributed loop runs with ``merges_per_round`` batching: the
    acceptance rule (module comment) guarantees the batched schedule
    is IDENTICAL to the one-merge-per-round sequential argmax
    schedule — both knobs change only the job count, never the output.
    Pass a dict as ``stats`` to receive ``{"rounds": r, "merges": m,
    "path": "driver"|"spark"}`` (each spark-path round is one collect
    job + one checkpoint job).
    """
    toks = docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
    vocab = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("count"))
        .where(F.col("count") >= min_word_count)
        .select("w", "count", F.split("w", "").alias("symbols"))
        .localCheckpoint(eager=True)
    )
    if driver_vocab_rows and vocab.count() <= driver_vocab_rows:
        wc = [(r["w"], r["count"]) for r in vocab.select("w", "count").collect()]
        dmerges, segs = _bpe_train_driver(wc, int(n_merges), min_pair_count)
        out = docs.sparkSession.createDataFrame(
            [(w, c, s) for (w, c), s in zip(wc, segs)],
            "w string, count bigint, symbols array<string>",
        )
        if stats is not None:
            stats.update(rounds=1, merges=len(dmerges), path="driver")
        return dmerges, out
    merges: list[tuple[str, str]] = []
    # Initial symbols are single characters (F.split(w, "")); every
    # multi-char symbol is some applied merge's concat — that set is
    # exactly what class-(d) collision detection needs.
    known_concats: set[str] = set()
    batch_cap = max(1, int(merges_per_round))
    window = max(64, 4 * batch_cap)
    rounds = 0
    while len(merges) < int(n_merges):
        rows = (
            vocab.where(F.size("symbols") > 1)
            .select(
                F.explode(_bpe_adjacent_pairs("symbols")).alias("p"), "count"
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("count").alias("n"))
            .orderBy(F.desc("n"), "a", "b")
            .limit(window)
            .collect()
        )
        rounds += 1
        if not rows or rows[0]["n"] < min_pair_count:
            break
        truncated = len(rows) == window
        out_bound = rows[-1]["n"] if truncated else 0
        accepted: list[tuple[str, str]] = []
        left_set: set[str] = set()  # accepted a_j — forms (·, a_j) affected
        right_set: set[str] = set()  # accepted b_j — forms (b_j, ·) affected
        batch_concats: set[str] = set()
        new_pair_bound = 0  # class (c): max count a created pair can have
        cap = min(batch_cap, int(n_merges) - len(merges))
        for r in rows:
            if len(accepted) >= cap:
                break
            a, b, n = r["a"], r["b"], r["n"]
            if n < min_pair_count:
                break
            if accepted:
                if b in left_set or a in right_set:
                    break  # class (b): this pair's count may have dropped
                if (a + b) in batch_concats:
                    break  # would mint a second copy of an in-batch symbol
                if n <= new_pair_bound or (truncated and n <= out_bound):
                    break  # class (c): a created pair could outrank it
            accepted.append((a, b))
            if (a + b) in known_concats or a == b:
                break  # class (d): sound to apply, not to accept more
            left_set.add(a)
            right_set.add(b)
            batch_concats.add(a + b)
            # class-(c) bound from this merge: created pairs inherit
            # counts from old (·, a) / (b, ·) adjacencies.
            for r2 in rows:
                if (r2["a"], r2["b"]) != (a, b) and (
                    r2["b"] == a or r2["a"] == b
                ):
                    new_pair_bound = max(new_pair_bound, r2["n"])
        if not accepted:
            break
        col = F.col("symbols")
        for a, b in accepted:
            col = _bpe_merge_fold(col, a, b)
        merges.extend(accepted)
        known_concats.update(a + b for a, b in accepted)
        vocab = vocab.select(
            "w", "count", col.alias("symbols")
        ).localCheckpoint(eager=True)
    if stats is not None:
        stats.update(rounds=rounds, merges=len(merges), path="spark")
    return merges, vocab


def bpe_segment(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, pieces array<string>, n_pieces) — each document's whitespace
    token stream segmented by the trained vocabulary: one join of the
    exploded token stream against the ``vocab`` segmentation table
    (broadcast when small, hash join on the word otherwise — either
    way the 100 TB cost is the token stream itself), order restored by
    the token's position, out-of-vocabulary words falling back to
    character pieces (the trained merges apply only to training words;
    real deployments export merges to an encoder for OOV — documented
    scope cut). Token-less documents — including null text — are kept,
    with empty pieces."""
    toks = docs.select(
        F.col(id_col),
        F.coalesce(
            tokens(F.col(text_col)), F.array().cast("array<string>")
        ).alias("_tok"),
    )
    toked = toks.select(
        F.col(id_col), F.posexplode("_tok").alias("_i", "w")
    )
    seg = toked.join(vocab.select("w", "symbols"), "w", "left").select(
        id_col,
        "_i",
        F.coalesce("symbols", F.split("w", "")).alias("_pieces"),
    )
    out = (
        seg.groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_i", "_pieces"))
                    ),
                    lambda s: s["_pieces"],
                )
            ).alias("pieces")
        )
        .select(id_col, "pieces", F.size("pieces").alias("n_pieces"))
    )
    # posexplode drops zero-token documents — keep them, as []
    empties = toks.where(F.size("_tok") == 0).select(
        F.col(id_col),
        F.array().cast("array<string>").alias("pieces"),
        F.lit(0).alias("n_pieces"),
    )
    return out.unionByName(empties)


# ----------------------------------------------- Kneser-Ney bigram LM
# CCNet's actual quality signal is n-gram LM perplexity (Wenzek et al.
# 2020 score with a wiki-trained 5-gram KenLM); `unigram_lm_score`
# above is the order-1 form. This is the order-2 interpolated
# Kneser-Ney model (Kneser & Ney 1995; Chen & Goodman 1999 eq. 4.26)
# expressed as DataFrame aggregates — the standard discount/
# continuation construction, with one explicit smoothing choice so the
# model is total on unseen events:
#
#   Pcont(w)  = (N1+(·,w) + α) / (N1+(··) + α·(V+1))      [α-smoothed]
#   P(w | u)  = (max(c(u,w) − D, 0) + D·N1+(u,·)·Pcont(w)) / c(u)
#               when c(u) > 0, else Pcont(w)
#
# Sentence events are <s> w1 … wn </s> per document, so every token and
# the terminator are scored. All four model tables derive from ONE
# bigram-count aggregate.

KN_DISCOUNT = 0.75  # Chen & Goodman's fixed absolute discount
KN_BOS, KN_EOS = "<s>", "</s>"


def _kn_events(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, u, w) bigram events of each document's token stream with
    BOS context and EOS terminator — a map-side zip, no shuffle.

    ``<s>``/``</s>`` are RESERVED symbols (the KenLM convention): a
    document whose literal text contains them conflates with the
    sentinels — strip or escape them upstream if the corpus can carry
    them (the whitespace tokenizer lowercases, so only the exact
    lowercase forms collide). Null text scores like empty text (one
    ``<s>``→``</s>`` event) instead of silently dropping the row."""
    toks = docs.select(
        F.col(id_col),
        F.coalesce(
            tokens(F.col(text_col)), F.array().cast("array<string>")
        ).alias("_tok"),
    )
    return toks.select(
        id_col,
        F.explode(
            F.zip_with(
                F.concat(F.array(F.lit(KN_BOS)), F.col("_tok")),
                F.concat(F.col("_tok"), F.array(F.lit(KN_EOS))),
                lambda u, w: F.struct(u.alias("u"), w.alias("w")),
            )
        ).alias("_e"),
    ).select(id_col, F.col("_e.u").alias("u"), F.col("_e.w").alias("w"))


def kn_bigram_lm(
    train: DataFrame,
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """(bigrams, contexts, continuations, totals) — the four interpolated
    Kneser-Ney model tables: (u, w, cuw); (u, cu, n1u) with
    n1u = N1+(u,·); (w, n1w) with n1w = N1+(·,w); and a ONE-ROW
    (n1pp, v) = (N1+(··), |event vocabulary|).

    100 TB shape: one (u,w)-keyed count aggregate over the event stream
    (map-side combine) is the only corpus-scaled shuffle; the other
    three tables are aggregates OF that table. Bigram tables at corpus
    scale do not broadcast — the scorer joins them key-partitioned,
    which is the relational form of KenLM's in-RAM lookup."""
    big = (
        _kn_events(train.select(F.lit(0).alias("_d"), text_col), "_d", text_col)
        .groupBy("u", "w")
        .agg(F.count(F.lit(1)).alias("cuw"))
        .localCheckpoint(eager=True)
    )
    ctx = big.groupBy("u").agg(
        F.sum("cuw").alias("cu"), F.count(F.lit(1)).alias("n1u")
    )
    cont = big.groupBy("w").agg(F.count(F.lit(1)).alias("n1w"))
    totals = big.agg(
        F.count(F.lit(1)).alias("n1pp"),
        F.count_distinct("w").alias("v"),
    )
    return big, ctx, cont, totals


def kn_bigram_score(
    docs: DataFrame,
    model: tuple[DataFrame, DataFrame, DataFrame, DataFrame],
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = KN_DISCOUNT,
    alpha: float = 0.5,
    self_scored: bool = False,
) -> DataFrame:
    """(id, n_events, avg_logprob, ppl) for every document under the
    trained KN bigram model — low perplexity = fluent under the training
    distribution, the CCNet head/middle/tail filter signal. Total on
    any input: OOV words and unseen contexts fall back to the α-smoothed
    continuation distribution, so no event scores zero.

    One pass: event zip (map-side) → left joins against the three model
    tables (key-partitioned on u/w) → one-row totals broadcast →
    per-doc mean with map-side partial aggregation.

    The model joins carry ``merge`` hints (round-14; the broadcast
    audit caught the in-flight plan broadcasting ctx/cont): the model
    tables grow with the corpus VOCABULARY, and after the bigram
    table's lineage-cut checkpoint Catalyst's estimate for their
    aggregates undershoots — at web scale the broadcast collect dies on
    ``spark.driver.maxResultSize`` (same failure class measured for the
    order-5 model, SCALE.md x100 sweep). SMJ keys the event stream by
    u/w instead — and reads the ``persist_kn_model`` tables bucketed,
    with no model-side Exchange at all.

    ``self_scored=True`` (r17, guide §2.4): sound ONLY when every
    scored event's (u, w) bigram occurs in the training corpus — in
    particular when ``docs`` IS the training frame (train-and-score-
    yourself, the CCNet in-corpus filter shape). Then the ``ev ⋈ big``
    left join matches every event, so the per-context facts (cu, n1u)
    can ride the bigram table itself — computed as a window over ``u``
    on the model-scaled (u, w, cuw) table, NOT a third event-stream
    join — and the ctx join disappears: one event-stream SMJ removed,
    one event-stream Exchange (hash(u)) removed, the unseen-context
    fallback provably dormant (cu ≥ cuw ≥ 1 on every matched row).
    The window aggregates equal ctx's by definition (sum/count of cuw
    per u — exact integer arithmetic), so scores are bit-identical to
    the default path; pinned by
    tests/test_ops.py::test_kn_bigram_self_scored_identical.
    """
    big, ctx, cont, totals = model
    if self_scored:
        from pyspark.sql import Window

        wu = Window.partitionBy("u")
        big = big.select(
            "u",
            "w",
            "cuw",
            F.sum("cuw").over(wu).alias("cu"),
            F.count(F.lit(1)).over(wu).alias("n1u"),
        )
        ctx = None
    big, cont = big.hint("merge"), cont.hint("merge")
    if ctx is not None:
        ctx = ctx.hint("merge")
    ev = _kn_events(docs, id_col, text_col)
    d = F.lit(float(discount))
    a = F.lit(float(alpha))
    pcont = (F.coalesce("n1w", F.lit(0)) + a) / (
        F.col("n1pp") + a * (F.col("v") + 1)
    )
    seen = F.col("cu").isNotNull() & (F.col("cu") > 0)
    p = F.when(
        seen,
        (
            F.greatest(F.coalesce("cuw", F.lit(0)) - d, F.lit(0.0))
            + d * F.coalesce("n1u", F.lit(0)) * pcont
        )
        / F.col("cu"),
    ).otherwise(pcont)
    joined = ev.join(big, ["u", "w"], "left")
    if ctx is not None:
        joined = joined.join(ctx, "u", "left")
    scored = (
        joined.join(cont, "w", "left")
        .crossJoin(F.broadcast(totals))
        .select(id_col, F.log(p).alias("_lp"))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.avg("_lp").alias("avg_logprob"),
        F.exp(-F.avg("_lp")).alias("ppl"),
    )


def bpe_vocab_ids(vocab: DataFrame) -> DataFrame:
    """(piece, piece_id) — stable integer ids for every distinct piece a
    trained vocabulary produces, ranked by corpus frequency (weighted by
    word count, ties by piece text) — the conventional most-frequent-
    gets-smallest-id layout. One explode + one bounded groupBy; the
    global rank window runs single-partition, which is safe BY
    CONSTRUCTION: the piece inventory is at most |alphabet| + n_merges
    symbols (each merge round mints exactly one new symbol), i.e.
    tokenizer-vocabulary sized (30–100k in practice), never
    corpus-sized."""
    from pyspark.sql import Window

    freq = (
        vocab.select(F.explode("symbols").alias("piece"), "count")
        .groupBy("piece")
        .agg(F.sum("count").alias("_n"))
    )
    w = Window.orderBy(F.desc("_n"), "piece")
    return freq.select(
        "piece", (F.row_number().over(w) - 1).cast("int").alias("piece_id")
    )


def bpe_encode(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    oov_id: int = -1,
) -> DataFrame:
    """(id, token_ids array<int>, n_tokens) — documents encoded to the
    trained vocabulary's integer ids: ``bpe_segment`` pieces looked up in
    ``bpe_vocab_ids`` (broadcast — the piece inventory is vocabulary-
    bounded), unknown pieces (char-fallback output of OOV words that
    never occurred in training) mapped to ``oov_id``. The id stream is
    what ``sampling.chunk_documents`` / ``pack_sequences`` consume
    downstream — the tokenize→pack tail of a training-data pipeline."""
    ids = bpe_vocab_ids(vocab)
    seg = bpe_segment(docs, vocab, id_col, text_col)
    exploded = seg.select(
        F.col(id_col), F.posexplode("pieces").alias("_i", "piece")
    )
    joined = exploded.join(F.broadcast(ids), "piece", "left").select(
        id_col,
        "_i",
        F.coalesce("piece_id", F.lit(int(oov_id))).alias("_tid"),
    )
    encoded = (
        joined.groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_i", "_tid"))),
                lambda s: s["_tid"],
            ).alias("token_ids")
        )
        .select(id_col, "token_ids", F.size("token_ids").alias("n_tokens"))
    )
    # empty documents produce no pieces to explode — keep them, as []
    empties = seg.where(F.size("pieces") == 0).select(
        F.col(id_col),
        F.array().cast("array<int>").alias("token_ids"),
        F.lit(0).alias("n_tokens"),
    )
    return encoded.unionByName(empties)


def train_lang_classifier(
    docs: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    n_features: int = CLASSIFIER_FEATURES,
    ngram: int = CLASSIFIER_NGRAM,
    iters: int = 8,
    lr: float = 1.0,
    reg: float = 1e-4,
) -> DataFrame:
    """(lang, feature, weight) — a trained multiclass language
    identifier (the fastText-langid shape CCNet/RedPajama filter with),
    as one-vs-rest logistic models over the shared hashed n-gram
    features: per observed language, ``train_quality_classifier`` runs
    with that language's documents as positives and the rest as
    negatives, and the weight tables union with a ``lang`` tag.

    Complements the fixed-list `lang_id` heuristic: trained on YOUR
    labeled seed (any label set, any granularity — dialects, scripts,
    programming languages), not a built-in stopword table. Training is
    k small jobs over the seed corpus (label sets are enumerable — the
    distinct collect is k rows); the seed is presumed seed-scale, as
    with the quality classifier.
    """
    langs = sorted(
        r[0] for r in docs.select(lang_col).distinct().collect()
        if r[0] is not None
    )
    if not langs:
        raise ValueError(f"no non-null labels in {lang_col!r}")
    spark = docs.sparkSession
    out = None
    for lang in langs:
        pos = docs.where(F.col(lang_col) == lang)
        neg = docs.where(F.col(lang_col) != lang)
        w = train_quality_classifier(
            pos, neg, text_col, n_features, ngram, iters, lr, reg
        ).select(F.lit(lang).alias("lang"), "feature", "weight")
        out = w if out is None else out.unionByName(w)
    return out.localCheckpoint(eager=True)


def lang_classifier_predict(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = CLASSIFIER_FEATURES,
    ngram: int = CLASSIFIER_NGRAM,
    hasher=None,
) -> DataFrame:
    """(id, lang_pred, score) — each document's argmax one-vs-rest
    language with its sigmoid confidence; ties break to the smaller
    language code. One corpus pass: the shared feature frame joins the
    broadcast (lang, feature, weight) table — every per-language model
    carries the intercept feature −1, and every document carries the
    matching bias row, so each (doc, lang) pair scores even with zero
    vocabulary overlap — then one (doc, lang) partial-aggregated sum
    and a per-doc struct-max."""
    feats = _classifier_features(
        docs, id_col, text_col, n_features, ngram, hasher
    )
    dots = (
        feats.join(F.broadcast(weights), "feature")
        .groupBy(id_col, "lang")
        .agg(F.sum(F.col("x") * F.col("weight")).alias("_dot"))
    )
    # struct-MIN over (−dot, lang): smallest −dot = largest dot, and a
    # dot tie falls through to the lexicographically smallest lang
    best = dots.groupBy(id_col).agg(
        F.min(
            F.struct(
                (-F.col("_dot")).alias("nd"), F.col("lang").alias("lang")
            )
        ).alias("m")
    )
    return best.select(
        id_col,
        F.col("m.lang").alias("lang_pred"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(F.col("m.nd")))).alias("score"),
    )


# ------------------------------------------------- CCNet stratification
# The tail of the CCNet pipeline (Wenzek et al. 2020, "CCNet:
# Extracting High Quality Monolingual Datasets from Web Crawl Data"):
# after dedup and language ID, each language's documents are split into
# head/middle/tail by LM-perplexity TERCILES — head (lowest perplexity)
# is the high-quality slice used for pretraining mixes. Both pieces
# compose already-built operators: `lang_classifier_predict` for the
# language, `kn_ngram_score` for the perplexity, and a per-group
# quantile-threshold bucket here.

CCNET_BUCKETS = ("head", "middle", "tail")


def perplexity_buckets(
    scored: DataFrame,
    group_col: str = "lang_pred",
    ppl_col: str = "ppl",
    fractions: tuple[float, ...] = (1.0 / 3.0, 2.0 / 3.0),
    approx: bool = False,
) -> DataFrame:
    """Input rows + ``bucket`` — each row labeled by which per-group
    quantile band its ``ppl_col`` falls in (len(fractions)+1 labels;
    the default terciles yield CCNet's head/middle/tail, ordered
    low-perplexity first). Thresholds are per-``group_col`` exact
    interpolated percentiles (the `order_price_percentiles`
    convention); a row on a boundary goes to the lower band (ppl <= t).

    100 TB shape: one groupBy over the groups (languages — enumerable)
    computing the thresholds, broadcast back, then a pure map labeling
    pass. Exact `percentile` sorts per group in memory — fine for the
    per-language threshold aggregate whose input is one number per
    document; pass ``approx=True`` to switch to `approx_percentile`
    (KLL sketch, mergeable, bounded memory) when even that is too wide.
    """
    if len(fractions) + 1 > len(CCNET_BUCKETS):
        labels = [f"q{i}" for i in range(len(fractions) + 1)]
    else:
        labels = list(CCNET_BUCKETS[: len(fractions) + 1])
    pct = F.expr(
        f"{'approx_percentile' if approx else 'percentile'}"
        f"({ppl_col}, array({', '.join(repr(float(f)) for f in fractions)}))"
    )
    thr = scored.groupBy(group_col).agg(pct.alias("_thr"))
    lab = F.lit(labels[-1])
    for i in range(len(fractions) - 1, -1, -1):
        lab = F.when(
            F.col(ppl_col) <= F.element_at("_thr", i + 1), F.lit(labels[i])
        ).otherwise(lab)
    return (
        scored.join(F.broadcast(thr), group_col)
        .select(*scored.columns, lab.alias("bucket"))
    )


def ccnet_pipeline(
    docs: DataFrame,
    lang_weights: DataFrame,
    lm_models: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    fractions: tuple[float, ...] = (1.0 / 3.0, 2.0 / 3.0),
    discount: float = KN_DISCOUNT,
    alpha: float = 0.5,
    n_features: int = CLASSIFIER_FEATURES,
    ngram: int = CLASSIFIER_NGRAM,
    hasher=None,
    approx: bool = False,
) -> DataFrame:
    """(id, lang_pred, lang_score, ppl, bucket) — the CCNet quality
    stratification end-to-end: trained language ID, per-language KN
    perplexity, per-language tercile buckets.

    ``lm_models`` maps language → a ``kn_ngram_lm`` model dict (CCNet
    trains one wiki LM per language); a language absent from the map
    falls back to the ``None`` entry when present, else its documents
    are dropped (CCNet's behavior for unsupported languages).

    100 TB shape: when every model shares one order (CCNet's setup),
    scoring is ONE corpus pass through ``kn_ngram_score_keyed`` — the
    per-language model tables union with a key column (bounded model
    frames, not corpus data) and the probe joins key on (lang, ctx, w).
    The earlier per-language union of filtered sub-plans re-scanned the
    corpus once per language: measured ~0.7 s/language at a CONSTANT
    5k-doc corpus (tools/ccnet_fanout_proof.py), i.e. k× the scan I/O
    at CCNet's ~100-language fan-out. Mixed orders fall back to that
    union path (plan-build is still linear in k; only the scan
    multiplies)."""
    if not lm_models:
        raise ValueError("lm_models must map at least one language")
    pred = lang_classifier_predict(
        docs, lang_weights, id_col, text_col, n_features, ngram, hasher
    )
    tagged = docs.join(pred, id_col)
    default = lm_models.get(None)
    langs = sorted(k for k in lm_models if k is not None)
    orders = {m["order"] for m in lm_models.values()}
    if len(orders) == 1:
        # single-pass keyed scoring; \x00 cannot collide with a code
        default_key = "\x00default"
        key = F.when(F.col("lang_pred").isin(langs), F.col("lang_pred"))
        if default is not None:
            key = key.otherwise(F.lit(default_key))
        keyed_models = {lang: lm_models[lang] for lang in langs}
        if default is not None:
            keyed_models[default_key] = default
        sel = tagged.select("*", key.alias("_mkey")).where(
            F.col("_mkey").isNotNull()
        )
        s = kn_ngram_score_keyed(
            sel, keyed_models, "_mkey", id_col, text_col, discount, alpha
        ).select(id_col, "ppl")
        scored = sel.join(s, id_col)
    else:
        scored = None
        for lang in langs:
            part = tagged.where(F.col("lang_pred") == lang)
            s = kn_ngram_score(
                part, lm_models[lang], id_col, text_col, discount, alpha
            ).select(id_col, "ppl")
            part = part.join(s, id_col)
            scored = part if scored is None else scored.unionByName(part)
        if default is not None:
            # NULL lang_pred routes to the default model, matching the
            # keyed path's when(...).otherwise(default): a bare
            # ~isin(langs) evaluates NULL for NULL and silently drops
            # those rows, so the two branches would disagree on the
            # same input depending on whether model orders match.
            rest = tagged.where(
                (~F.col("lang_pred").isin(langs))
                | F.col("lang_pred").isNull()
            )
            s = kn_ngram_score(
                rest, default, id_col, text_col, discount, alpha
            ).select(id_col, "ppl")
            rest = rest.join(s, id_col)
            scored = rest if scored is None else scored.unionByName(rest)
    out = scored.select(
        id_col,
        "lang_pred",
        F.col("score").alias("lang_score"),
        "ppl",
    )
    return perplexity_buckets(out, "lang_pred", "ppl", fractions, approx)


def persist_kn_model(
    spark,
    model: tuple[DataFrame, DataFrame, DataFrame, DataFrame],
    name: str,
    path: str,
    n_buckets: int = 64,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Materialize a trained KN model as catalog tables bucketed by
    their probe-join keys — bigrams by (u, w), contexts by u,
    continuations by w, the one-row totals as plain parquet — so every
    subsequent ``kn_bigram_score`` run reads co-located buckets with NO
    model-side Exchange (plan-asserted, test_bucketing). The model of a
    large corpus holds billions of distinct bigrams; re-shuffling it
    per scoring job is the cost this kills — the same
    write-once-shuffle-never contract as ``persist_corpus_lsh``. The
    returned tuple drops into ``kn_bigram_score`` unchanged."""
    from .util import persist_bucketed

    big, ctx, cont, totals = model
    b = persist_bucketed(
        spark, big, f"{name}_bigrams", f"{path}_bigrams", n_buckets, ["u", "w"]
    )
    c = persist_bucketed(
        spark, ctx, f"{name}_contexts", f"{path}_contexts", n_buckets, "u"
    )
    co = persist_bucketed(
        spark, cont, f"{name}_continuations", f"{path}_continuations",
        n_buckets, "w",
    )
    totals.write.mode("overwrite").parquet(f"{path}_totals")
    return b, c, co, spark.read.parquet(f"{path}_totals")


def persist_kn_ngram_model(
    spark, model: dict, name: str, path: str, n_buckets: int = 64
) -> dict:
    """``persist_kn_model`` generalized to the order-n ``kn_ngram_lm``
    model: EVERY per-order probe table is bucketed by exactly its
    score-time join keys — ``counts[k]`` by (ctx, w) and
    ``contexts[k]`` by ctx for each order k (array bucket columns;
    Spark hashes them natively), the continuation ``unigram`` by w, the
    one-row ``totals`` as plain parquet. An order-5 model probes on 4
    distinct composite key shapes per side; persisting pays each
    table's shuffle ONCE at write so every subsequent
    ``kn_ngram_score`` run reads co-located buckets with NO model-side
    Exchange (plan-asserted at order 5 in test_bucketing). The
    returned dict drops into ``kn_ngram_score`` unchanged."""
    from .util import persist_bucketed

    counts = {
        k: persist_bucketed(
            spark, df, f"{name}_counts{k}", f"{path}_counts{k}",
            n_buckets, ["ctx", "w"],
        )
        for k, df in model["counts"].items()
    }
    contexts = {
        k: persist_bucketed(
            spark, df, f"{name}_contexts{k}", f"{path}_contexts{k}",
            n_buckets, "ctx",
        )
        for k, df in model["contexts"].items()
    }
    unigram = persist_bucketed(
        spark, model["unigram"], f"{name}_unigram", f"{path}_unigram",
        n_buckets, "w",
    )
    model["totals"].write.mode("overwrite").parquet(f"{path}_totals")
    return {
        "order": model["order"],
        "counts": counts,
        "contexts": contexts,
        "unigram": unigram,
        "totals": spark.read.parquet(f"{path}_totals"),
    }


# ------------------------------------------------ Kneser-Ney, order n
# The general interpolated KN model (CCNet's production filter is a
# 5-gram KenLM). Textbook construction (Chen & Goodman 1999 §4.1.6):
# the TOP order uses raw n-gram counts; every lower order uses
# CONTINUATION counts, which derive relationally from the order above —
# C_k(h', w) = |{x : C_{k+1}((x·h'), w) > 0}| is one row-count groupBy
# over the (already distinct) higher-order table. One shared discount D
# across orders (documented simplification of per-order D_k). Documents
# pad with (order−1) <s> tokens and close with </s>, so the first real
# token scores under the full-order [<s>…<s>] context (the KenLM
# convention); order=2 reproduces `kn_bigram_lm` exactly (pinned by
# test).


def _kn_ngram_events(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    order: int,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *extra_cols, ctx array<string>, w) — the order-n event
    stream: ctx is the (order−1)-token history with <s> padding, w the
    predicted token or the </s> terminator. Map-side only; null text =
    empty text. ``extra_cols`` ride along per event (e.g. the model key
    for keyed scoring)."""
    toks = docs.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        F.coalesce(
            tokens(F.col(text_col)), F.array().cast("array<string>")
        ).alias("_tok"),
    )
    # Per-element work must be O(order) over bound ATTRIBUTES: captured
    # non-attribute expressions re-evaluate per element inside a
    # higher-order function, so the earlier form — slicing a
    # concat-built padded expression per position — re-allocated an
    # O(n)-token array for EVERY event (O(n²) per document; measured
    # 12 s for 1M events from 2000-token docs on 32 cores — the
    # long-web-document regime the 100 TB target is made of). The
    # padded stream and the predicted-word stream are therefore
    # PROJECTED first (_pad/_ws attributes) and the lambda does one
    # O(order-1) slice + one O(1) element_at: 1M long-doc events in
    # ~0.6 s, and ~25% faster than the raw-token form on short docs
    # too. Catalyst keeps this shape (it does not inline single-use
    # Project aliases into lambda bodies) — pinned by
    # tests/test_plans.py::test_kn_event_lambda_touches_attributes_only
    # so an optimizer change can never silently restore the quadratic.
    # The python twins pin the identical event stream.
    pre = toks.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        F.concat(
            F.array_repeat(F.lit(KN_BOS), order - 1), F.col("_tok")
        ).alias("_pad"),
        F.concat(F.col("_tok"), F.array(F.lit(KN_EOS))).alias("_ws"),
    )
    ev = F.transform(
        F.sequence(F.lit(1), F.size(F.col("_ws"))),
        lambda i: F.struct(
            F.slice(F.col("_pad"), i, order - 1).alias("ctx"),
            F.element_at(F.col("_ws"), i).alias("w"),
        ),
    )
    return pre.select(
        id_col, *extra_cols, F.explode(ev).alias("_e")
    ).select(
        id_col,
        *extra_cols,
        F.col("_e.ctx").alias("ctx"),
        F.col("_e.w").alias("w"),
    )


def kn_ngram_lm(
    train: DataFrame,
    order: int = 3,
    text_col: str = "text",
    min_count: int | dict[int, int] = 1,
) -> dict:
    """The order-``order`` interpolated KN model as a dict of frames:
    ``counts[k]`` = (ctx array[k−1], w, c) for k = order..2 — raw counts
    at the top, continuation counts below — ``contexts[k]`` = (ctx, cu,
    n1u) aggregated from counts[k], ``unigram`` = (w, n1w) continuation
    unigrams from counts[2], and one-row ``totals`` (n1pp, v).

    ``min_count`` prunes each order's count table to ``c >=
    threshold`` — the knob CCNet's production 5-gram LM relies on
    (KenLM ``--prune``; singleton 5-grams dominate a web-crawl model's
    size and contribute near-zero discriminative mass). An int applies
    to the TOP order only; a {k: threshold} dict sets per-order
    thresholds (orders absent keep everything, threshold 1 is a no-op).
    Lower tables derive from the table above AFTER its pruning, so the
    model stays internally consistent; scoring remains total — a
    pruned n-gram backs off exactly like an unseen one.

    100 TB shape: ONE corpus-scaled event aggregate (the top-order
    count, map-side combined); every lower table is a groupBy of the
    bounded table above it. Model tables join key-partitioned at score
    time (array join keys — no broadcast assumption)."""
    if order < 2:
        raise ValueError(f"order must be >= 2, got {order}")
    if isinstance(min_count, int):
        prune = {order: min_count}
    else:
        prune = dict(min_count)
    if any(t < 1 for t in prune.values()):
        raise ValueError(f"min_count thresholds must be >= 1: {prune}")

    def _pruned(df: DataFrame, k: int) -> DataFrame:
        t = prune.get(k, 1)
        return df.where(F.col("c") >= t) if t > 1 else df

    top = (
        _pruned(
            _kn_ngram_events(
                train.select(F.lit(0).alias("_d"), text_col),
                "_d",
                text_col,
                order,
            )
            .groupBy("ctx", "w")
            .agg(F.count(F.lit(1)).alias("c")),
            order,
        )
        .localCheckpoint(eager=True)
    )
    counts = {order: top}
    for k in range(order - 1, 1, -1):
        # continuation counts: distinct extensions of the (k−1)-suffix
        counts[k] = (
            _pruned(
                counts[k + 1]
                .groupBy(
                    F.slice(F.col("ctx"), 2, k - 1).alias("ctx"), F.col("w")
                )
                .agg(F.count(F.lit(1)).alias("c")),
                k,
            )
            .localCheckpoint(eager=True)
        )
    contexts = {
        k: counts[k].groupBy("ctx").agg(
            F.sum("c").alias("cu"), F.count(F.lit(1)).alias("n1u")
        )
        for k in counts
    }
    unigram = counts[2].groupBy("w").agg(F.count(F.lit(1)).alias("n1w"))
    totals = counts[2].agg(
        F.count(F.lit(1)).alias("n1pp"), F.count_distinct("w").alias("v")
    )
    return {
        "order": order,
        "counts": counts,
        "contexts": contexts,
        "unigram": unigram,
        "totals": totals,
    }


def kn_ngram_score(
    docs: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = KN_DISCOUNT,
    alpha: float = 0.5,
) -> DataFrame:
    """(id, n_events, avg_logprob, ppl) under the order-n model — the
    interpolation folds from the α-smoothed continuation unigram up
    through every order: at order k, a seen context backs off its
    discount mass onto the order-(k−1) estimate, an unseen context
    passes it through unchanged. Total on any input (OOV words, unseen
    histories, empty and null documents all score).

    One pass: the event zip, then per order two key-partitioned left
    joins (counts on (ctx_k, w), contexts on ctx_k — array join keys),
    the unigram join on w, one-row totals broadcast, one per-doc mean.

    Scale envelope: with an IN-FLIGHT model dict (fresh from
    ``kn_ngram_lm``) Catalyst may broadcast model tables it estimates
    small — fine for pruned/small-corpus models, but an UNPRUNED
    web-scale model's top-order table is gigabytes and the broadcast
    collect dies on ``spark.driver.maxResultSize`` (measured at the
    x100 sweep: 28M tokens → >1 GiB collect). At that scale pass the
    model through ``persist_kn_ngram_model`` first — every probe table
    is bucketed by its join keys, scoring reads co-located buckets
    with NO model-side Exchange and nothing is ever collected — or
    prune with ``min_count`` (the KenLM/CCNet production shape).
    """
    order = model["order"]
    ev = _kn_ngram_events(docs, id_col, text_col, order)
    d = F.lit(float(discount))
    a = F.lit(float(alpha))
    # Plan-build economy (classic PySpark pays a full analyzer pass per
    # DataFrame op, ~0.5-1 s each on a deep plan): ALL per-order
    # suffixes are added in ONE select, the per-order probe columns are
    # uniquely aliased so no intermediate drop is needed (the final
    # select prunes them), leaving 2 joins per order + 2 — the joins
    # themselves are the inherent cost. Cuts the order-5 build from
    # ~21 plan passes to ~11.
    cur = ev.select(
        "*",
        *[
            F.slice(F.col("ctx"), order + 1 - k, k - 1).alias(f"_suf{k}")
            for k in range(2, order + 1)
        ],
    )
    for k in range(2, order + 1):
        cnt = model["counts"][k].select(
            F.col("ctx").alias(f"_ctx{k}"),
            F.col("w").alias(f"_w{k}"),
            F.col("c").alias(f"_c{k}"),
        )
        ctxt = model["contexts"][k].select(
            F.col("ctx").alias(f"_cctx{k}"),
            F.col("cu").alias(f"_cu{k}"),
            F.col("n1u").alias(f"_n1u{k}"),
        )
        cur = cur.join(
            cnt,
            (F.col(f"_suf{k}") == F.col(f"_ctx{k}"))
            & (F.col("w") == F.col(f"_w{k}")),
            "left",
        ).join(ctxt, F.col(f"_suf{k}") == F.col(f"_cctx{k}"), "left")
    cur = cur.join(
        model["unigram"].select(F.col("w").alias("_uw"), "n1w"),
        F.col("w") == F.col("_uw"),
        "left",
    ).crossJoin(F.broadcast(model["totals"]))
    p = (F.coalesce("n1w", F.lit(0)) + a) / (
        F.col("n1pp") + a * (F.col("v") + 1)
    )
    for k in range(2, order + 1):
        seen = F.col(f"_cu{k}").isNotNull() & (F.col(f"_cu{k}") > 0)
        p = F.when(
            seen,
            (
                F.greatest(F.coalesce(f"_c{k}", F.lit(0)) - d, F.lit(0.0))
                + d * F.coalesce(f"_n1u{k}", F.lit(0)) * p
            )
            / F.col(f"_cu{k}"),
        ).otherwise(p)
    scored = cur.select(id_col, F.log(p).alias("_lp"))
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.avg("_lp").alias("avg_logprob"),
        F.exp(-F.avg("_lp")).alias("ppl"),
    )


def kn_ngram_score_keyed(
    docs: DataFrame,
    lm_models: dict,
    key_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = KN_DISCOUNT,
    alpha: float = 0.5,
) -> DataFrame:
    """(id, n_events, avg_logprob, ppl) scoring each row against the
    model its ``key_col`` value names — identical math to
    ``kn_ngram_score`` per key, but in ONE corpus pass: each model's
    count/context/unigram/totals tables are unioned with a key column
    (MODEL tables, bounded — the union is k small checkpointed leaves),
    and every probe join adds the key to its condition. The corpus-side
    plan stays the 2-joins-per-order shape regardless of k, where the
    per-language union of filtered sub-plans re-scanned the corpus k
    times (measured linear-in-k wall at constant corpus,
    tools/ccnet_fanout_proof.py). All models must share one order;
    rows whose key matches no model yield no output rows."""
    if not lm_models:
        raise ValueError("lm_models must map at least one key")
    orders = {m["order"] for m in lm_models.values()}
    if len(orders) != 1:
        raise ValueError(f"keyed scoring needs one shared order, got {orders}")
    order = next(iter(orders))

    def _u(get, key_alias: str) -> DataFrame:
        parts = [
            get(m).select(F.lit(k).alias(key_alias), "*")
            for k, m in sorted(lm_models.items())
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u

    ev = _kn_ngram_events(docs, id_col, text_col, order, (key_col,))
    d = F.lit(float(discount))
    a = F.lit(float(alpha))
    cur = ev.select(
        "*",
        *[
            F.slice(F.col("ctx"), order + 1 - k, k - 1).alias(f"_suf{k}")
            for k in range(2, order + 1)
        ],
    )
    for k in range(2, order + 1):
        cnt = _u(lambda m, _k=k: m["counts"][_k], f"_mlc{k}").select(
            F.col(f"_mlc{k}"),
            F.col("ctx").alias(f"_ctx{k}"),
            F.col("w").alias(f"_w{k}"),
            F.col("c").alias(f"_c{k}"),
        )
        ctxt = _u(lambda m, _k=k: m["contexts"][_k], f"_mlx{k}").select(
            F.col(f"_mlx{k}"),
            F.col("ctx").alias(f"_cctx{k}"),
            F.col("cu").alias(f"_cu{k}"),
            F.col("n1u").alias(f"_n1u{k}"),
        )
        cur = cur.join(
            cnt,
            (F.col(key_col) == F.col(f"_mlc{k}"))
            & (F.col(f"_suf{k}") == F.col(f"_ctx{k}"))
            & (F.col("w") == F.col(f"_w{k}")),
            "left",
        ).join(
            ctxt,
            (F.col(key_col) == F.col(f"_mlx{k}"))
            & (F.col(f"_suf{k}") == F.col(f"_cctx{k}")),
            "left",
        )
    uni = _u(lambda m: m["unigram"], "_mlu").select(
        F.col("_mlu"), F.col("w").alias("_uw"), "n1w"
    )
    tot = _u(lambda m: m["totals"], "_mlt")  # k one-row frames
    cur = cur.join(
        uni,
        (F.col(key_col) == F.col("_mlu")) & (F.col("w") == F.col("_uw")),
        "left",
    ).join(
        F.broadcast(tot), F.col(key_col) == F.col("_mlt"), "inner"
    )
    p = (F.coalesce("n1w", F.lit(0)) + a) / (
        F.col("n1pp") + a * (F.col("v") + 1)
    )
    for k in range(2, order + 1):
        seen = F.col(f"_cu{k}").isNotNull() & (F.col(f"_cu{k}") > 0)
        p = F.when(
            seen,
            (
                F.greatest(F.coalesce(f"_c{k}", F.lit(0)) - d, F.lit(0.0))
                + d * F.coalesce(f"_n1u{k}", F.lit(0)) * p
            )
            / F.col(f"_cu{k}"),
        ).otherwise(p)
    scored = cur.select(id_col, F.log(p).alias("_lp"))
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.avg("_lp").alias("avg_logprob"),
        F.exp(-F.avg("_lp")).alias("ppl"),
    )
