"""Corpus data-card report: one-pass summary statistics.

Every published training corpus ships a data card — document / token
counts, length distribution, duplication rate, vocabulary size (cf. the
C4/Gopher/Pile dataset papers' corpus tables). ``corpus_report``
computes the standard numbers in TWO aggregate passes over the corpus
(one doc-grain, one token-grain for the vocabulary estimate) and
returns a single row — cheap enough to run after every pipeline stage
and diff.

100 TB shape: the doc-grain pass is one partial-aggregating ``agg``
over map-side projected columns (token counts, md5, char lengths);
exact duplicate counting is ``count_distinct`` over the md5 (one
distinct-style shuffle on a 32-hex key — the same cost profile as
``dedup_exact``). Length percentiles default to Spark's exact
``percentile`` (sort-based within the aggregate); at very large scale
flip ``approx=True`` for `approx_percentile` + HLL vocabulary, which
turns the whole report into sketch aggregates. The two one-row results
attach by broadcast crossJoin (scalar attach — the plan-audit-exempt
BNLJ shape used by every one-row scalar attach in this repo).

reference: no analogue (log engine); part of the beyond-reference
training-data toolkit (SURVEY §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens


def corpus_report(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    approx: bool = False,
    rsd: float = 0.01,
) -> DataFrame:
    """One-row corpus data card:

    ``n_docs, n_empty_docs, distinct_docs, dup_frac, total_tokens,
    total_chars, tokens_p50, tokens_p95, tokens_max, vocab_size``.

    Null/whitespace-only texts count as empty docs (0 tokens), not
    dropped rows — the report is total over the input. ``dup_frac`` is
    the fraction of documents whose EXACT text (byte content, via md5)
    appeared before — the number exact dedup would remove.

    ``approx=True`` switches the percentiles to ``approx_percentile``
    and the vocabulary to HyperLogLog++ (``approx_count_distinct`` at
    ``rsd``) — the sketch-only form for corpora where an exact
    percentile sort is not worth it. Exact (default) is python-twin
    testable; approx is validated by tolerance tests.
    """
    base = df.select(
        F.coalesce(tokens(F.col(text_col)), F.array()).alias("_tok"),
        F.length(F.coalesce(F.col(text_col), F.lit(""))).alias("_chars"),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("_h"),
    ).select(F.size("_tok").alias("_nt"), "_tok", "_chars", "_h")

    if approx:
        p50 = F.approx_percentile("_nt", F.lit(0.5))
        p95 = F.approx_percentile("_nt", F.lit(0.95))
        vocab = F.approx_count_distinct("_w", rsd)
    else:
        p50 = F.percentile("_nt", F.lit(0.5))
        p95 = F.percentile("_nt", F.lit(0.95))
        vocab = F.count_distinct(F.col("_w"))

    # count_distinct stays in its OWN branch: mixed distinct/non-distinct
    # aggregation re-keys the partial agg by the distinct column, so the
    # percentile sketches would run once PER DISTINCT DOC (measured 17×
    # slower at 50k docs) instead of once per partition
    doc_grain = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("_nt") == 0).cast("long")).alias("n_empty_docs"),
        F.sum("_nt").alias("total_tokens"),
        F.sum("_chars").alias("total_chars"),
        p50.alias("tokens_p50"),
        p95.alias("tokens_p95"),
        F.max("_nt").alias("tokens_max"),
    )
    dup_grain = base.agg(F.count_distinct("_h").alias("distinct_docs"))
    doc_grain = doc_grain.crossJoin(F.broadcast(dup_grain)).select(
        "*",
        F.when(
            F.col("n_docs") > 0,
            (F.col("n_docs") - F.col("distinct_docs"))
            / F.col("n_docs").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_frac"),
    )
    # within-doc array_distinct first: repeated words collapse map-side
    # BEFORE the explode, cutting generator volume without changing any
    # distinct count
    token_grain = (
        base.select(F.explode(F.array_distinct("_tok")).alias("_w"))
        .agg(vocab.alias("vocab_size"))
    )
    return doc_grain.crossJoin(F.broadcast(token_grain)).select(
        "n_docs",
        "n_empty_docs",
        "distinct_docs",
        "dup_frac",
        "total_tokens",
        "total_chars",
        "tokens_p50",
        "tokens_p95",
        "tokens_max",
        "vocab_size",
    )
