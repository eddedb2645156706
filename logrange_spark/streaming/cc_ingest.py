"""Streaming twin of the cc_pipeline capstone: continuous web-curation
ingestion over one Structured Streaming query.

Per incoming shard (micro-batch), in the capstone's stage order:

    C4 line rules ─► boilerplate removal (PERSISTED bounded dictionary)
    ─► Gopher document gate ─► blocklist gate
    ─► within-shard fingerprint keep-first dedup
    ─► probe the PERSISTED banded fingerprint index (no corpus-side
       Exchange — ops/dedup.persist_corpus_fingerprints layout)
    ─► PII redaction ─► unigram-LM scoring (PERSISTED bounded vocab)
    ─► CCNet bucket by FIXED thresholds (persisted at bootstrap)
    ─► novel docs append with scores; index rows append members-LAST

Every per-batch model input is corpus-BOUNDED (boilerplate dictionary
≤ max_lines, vocab ≤ vocab_size, thresholds = two floats), so each
micro-batch is maps + bounded broadcasts + the banded index probe —
no stream state, no corpus re-pairing. The two corpus-GLOBAL passes
the batch capstone runs (cross-document repeated-span removal, 8-gram
decontamination) are deliberately absent here: they are defined over
the whole accumulated corpus, so they stay periodic batch jobs over
``{path}_docs`` (the same split the reference's pipes make between
per-record transforms and store-wide maintenance).

Exactly-once/replay: identical to the fingerprint dedup stream
(streaming/corpus_dedup.py) — the members insert runs LAST, so a
replayed batch anti-joins away against fully recorded documents, and
every docs write lands in a per-batch OVERWRITE partition, so a crash
BETWEEN the docs write and the members insert replaces rather than
duplicates on replay: exactly-once on ``{path}_docs`` (see
``fingerprint_probe_and_commit`` for the full crash-replay matrix).

reference: no analogue (the reference is a log engine); this completes
the beyond-reference streaming-curation story (SURVEY §2.8) by
composing the r8-r14 pieces into the full capstone shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..ops import dedup
from .corpus_dedup import (
    BOOTSTRAP_BATCH,
    fingerprint_probe_and_commit,
    reset_docs_dir,
    write_docs_batch,
)

CC_BUCKET_LABELS = ("head", "middle", "tail")


def _gate_stack(
    batch: DataFrame,
    boilerplate: DataFrame,
    blocklist: list[str],
    gopher_kw: dict,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """The per-document gate chain, capstone order: C4 line rules →
    persisted boilerplate dictionary → Gopher gate → blocklist gate.
    Pure maps + one bounded broadcast; returns (id, text) survivors
    with the cleaned rebuild as ``text_col``."""
    from ..ops.text import (
        blocklist_gate,
        c4_line_rules,
        gopher_gate,
        gopher_quality_stats,
        remove_boilerplate_with,
    )

    c4 = (
        c4_line_rules(batch.select(id_col, text_col), id_col, text_col)
        .where("c4_pass")
        .select(id_col, text_col)
    )
    cleaned = remove_boilerplate_with(
        c4, boilerplate, id_col, text_col
    ).select(id_col, text_col)
    gated = gopher_gate(
        gopher_quality_stats(cleaned, id_col, text_col, keep=(text_col,)),
        **gopher_kw,
    ).where("gopher_pass")
    return (
        blocklist_gate(
            gated, blocklist, id_col=id_col, text_col=text_col,
            keep=(text_col,),
        )
        .where("blocklist_pass")
        .select(id_col, text_col)
    )


def bootstrap_cc_corpus(
    spark,
    seed: DataFrame,
    name: str,
    path: str,
    blocklist: list[str],
    gopher_kw: dict | None = None,
    max_hamming: int = 3,
    vocab_size: int = 50_000,
    n_buckets: int = 64,
    terciles: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
    id_col: str = "doc_id",
    text_col: str = "text",
    **bp_kw,
) -> dict:
    """Offline seed build: run the batch gate stack over the seed
    corpus, train and persist the bounded model state, fingerprint-
    index the survivors, and write the scored corpus. Persists:

    - ``{path}_bp``          boilerplate line dictionary (bounded)
    - ``{path}_vocab``       unigram-LM (token, logp, _oov) table
    - ``{path}_thresholds``  the two fixed ppl tercile cuts (1 row)
    - ``{path}_fps`` / ``{path}_fp_members`` / ``{path}_fp_ids``
      banded fingerprint index + id-bucketed replay-guard sidecar
    - ``{path}_docs``        scored corpus (id, text, n_emails, ppl,
      bucket)

    Returns the reloaded state dict the stream consumes. Thresholds
    are FROZEN at bootstrap (CCNet trains its LM and cuts once, then
    scores every shard against them); re-run bootstrap to re-cut."""
    from ..ops.text import redact, unigram_lm_score, unigram_lm_vocab

    from .curation import persist_boilerplate_dict

    gopher_kw = dict(gopher_kw or {})
    bp = persist_boilerplate_dict(spark, seed, f"{path}_bp", **bp_kw)
    # pin the gate stack and the redaction: five consumers each re-ran
    # the whole regex chain over the seed without these (r15 review)
    gated = _gate_stack(
        seed, bp, blocklist, gopher_kw, id_col, text_col
    ).persist()
    # within-corpus fingerprint keep-first, then persist the index
    fp = dedup.simhash(gated, id_col, text_col, bits=64).localCheckpoint(
        eager=True
    )
    pairs = dedup.hamming_near_pairs(fp, id_col, "simhash", 64, max_hamming)
    kept = gated.join(
        pairs.select(F.col("id_b").alias(id_col)).distinct(),
        id_col,
        "left_anti",
    )
    dedup.persist_corpus_fingerprints(
        spark, dedup.simhash(kept, id_col, text_col, bits=64),
        name, path, id_col, "simhash", 64, max_hamming, n_buckets,
    )
    red = redact(kept, id_col, text_col).persist()
    vocab = unigram_lm_vocab(red, "redacted", vocab_size)
    vocab.write.mode("overwrite").parquet(f"{path}_vocab")
    vocab = spark.read.parquet(f"{path}_vocab")
    scored = kept.join(
        unigram_lm_score(red, id_col, "redacted", vocab=vocab).select(
            id_col, "ppl"
        ),
        id_col,
    ).join(red.select(id_col, "n_emails"), id_col)
    f1, f2 = (float(f) for f in terciles)
    thr = scored.agg(
        F.expr(f"percentile(ppl, array({f1!r}, {f2!r}))").alias("_thr")
    )
    thr.write.mode("overwrite").parquet(f"{path}_thresholds")
    cuts = spark.read.parquet(f"{path}_thresholds").collect()[0]["_thr"]
    if cuts is None:
        raise ValueError(
            "bootstrap produced no gated survivors — the seed corpus "
            "cleared none of the C4/Gopher/blocklist gates, so no LM "
            "thresholds exist; check the gate parameters against the "
            "seed's text shape"
        )
    t1, t2 = cuts
    out = scored.select(
        id_col, text_col, "n_emails", "ppl", _bucket_col(t1, t2)
    )
    reset_docs_dir(spark, f"{path}_docs")
    write_docs_batch(out, f"{path}_docs", BOOTSTRAP_BATCH)
    red.unpersist()
    gated.unpersist()
    return {
        "docs": spark.read.parquet(f"{path}_docs"),
        "boilerplate": bp,
        "vocab": vocab,
        "thresholds": (t1, t2),
    }


def _bucket_col(t1: float, t2: float, ppl_col: str = "ppl"):
    """CCNet head/middle/tail against FIXED thresholds (boundary goes
    low — the perplexity_buckets convention)."""
    lo, mid, hi = CC_BUCKET_LABELS
    return (
        F.when(F.col(ppl_col) <= F.lit(t1), F.lit(lo))
        .when(F.col(ppl_col) <= F.lit(t2), F.lit(mid))
        .otherwise(F.lit(hi))
        .alias("bucket")
    )


def start_cc_ingest_stream(
    spark,
    input_dir: str,
    name: str,
    path: str,
    checkpoint: str,
    doc_schema,
    blocklist: list[str],
    gopher_kw: dict | None = None,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_files_per_trigger: int = 32,
):
    """Start the continuous capstone query. ``bootstrap_cc_corpus``
    must have run for ``name``/``path`` first; the stream reloads the
    persisted bounded state once and broadcasts it per batch."""
    gopher_kw = dict(gopher_kw or {})
    bp = spark.read.parquet(f"{path}_bp")
    vocab = spark.read.parquet(f"{path}_vocab")
    t1, t2 = spark.read.parquet(f"{path}_thresholds").collect()[0]["_thr"]

    from ..ops.text import redact, unigram_lm_score

    def sink(batch_df, batch_id):
        batch = batch_df.persist()
        gated = None
        try:
            if batch.isEmpty():
                return
            # pin the gate stack: the fingerprint checkpoint and the
            # novel-docs write chain both read it — without the persist
            # the C4/boilerplate/Gopher maps run twice per batch
            gated = _gate_stack(
                batch, bp, blocklist, gopher_kw, id_col, text_col
            ).persist()
            # the probe/commit sequence lives in ONE place
            # (corpus_dedup.fingerprint_probe_and_commit — members-last
            # replay guard, eager-checkpointed simhash); this sink only
            # supplies the score-attaching transform for the docs write
            def attach_scores(novel):
                red = redact(novel, id_col, text_col)
                scored = novel.join(
                    unigram_lm_score(
                        red, id_col, "redacted", vocab=vocab
                    ).select(id_col, "ppl"),
                    id_col,
                ).join(red.select(id_col, "n_emails"), id_col)
                return scored.select(
                    id_col, text_col, "n_emails", "ppl", _bucket_col(t1, t2)
                )

            fingerprint_probe_and_commit(
                spark, gated, name, path, id_col, text_col, max_hamming,
                transform=attach_scores, batch_id=batch_id,
            )
        finally:
            if gated is not None:
                gated.unpersist()
            batch.unpersist()

    return (
        spark.readStream.schema(doc_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
        .writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime="1 second")
        .foreachBatch(sink)
        .start()
    )
