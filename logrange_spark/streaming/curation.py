"""Continuous quality-gated ingestion: the scoring half of the 100 TB
streaming-curation story (streaming/corpus_dedup.py is the dedup half).

A Structured Streaming pipeline watches a directory of incoming document
shards and applies the FULL persisted gate stack to every shard — the
same stages `curation_full` composes in batch:

    new shard ─► boilerplate-line removal (persisted bounded
                 dictionary — ops/text.remove_boilerplate_with)
              ─► Gopher repetition gate (map-side per-doc stats —
                 ops/text.repetition_stats; no model)
              ─► trained quality-classifier score (broadcast weight
                 table — ops/text.quality_classifier_score)
              ─► optional DSIR importance log-weight (broadcast
                 log-ratio table — ops/sampling.dsir_scores)
              ─► threshold gates ─► survivors append, scores attached

The models are corpus-BOUNDED tables (weights ≤ observed features,
ratios ≤ n_features, boilerplate ≤ BOILERPLATE_MAX_LINES) trained once
offline — ``persist_quality_model`` / ``persist_dsir_ratios`` /
``persist_boilerplate_dict`` write them; the stream only ever
broadcasts them, so each micro-batch is a pure map + bounded joins
with no state of its own. Cross-shard near-duplicate removal is the
OTHER half of the streaming story (streaming/corpus_dedup.py probes a
persisted bucketed corpus); this module owns everything per-document. Output is idempotent across crash-replay: every batch
lands in its own ``_batch=<id>`` partition written with OVERWRITE, so a
redelivered batch replaces (never duplicates) its previous attempt —
effective exactly-once on the output files.

reference: no analogue (the reference is a log engine); this extends
the beyond-reference training-data toolkit (SURVEY §2.8) to continuous
ingestion, mirroring CCNet/RedPajama-style filter pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def persist_quality_model(
    spark, pos: DataFrame, neg: DataFrame, path: str, **train_kw
) -> DataFrame:
    """Train the discriminative quality classifier offline and persist
    its (feature, weight) table; returns the reloaded frame (what the
    stream broadcasts)."""
    from ..ops.text import train_quality_classifier

    w = train_quality_classifier(pos, neg, **train_kw)
    w.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def persist_dsir_ratios(
    spark, target: DataFrame, raw: DataFrame, path: str, **ratio_kw
) -> DataFrame:
    """Fit the DSIR target-vs-raw log-ratio table offline and persist
    it; returns the reloaded frame."""
    from ..ops.sampling import dsir_logratios

    r = dsir_logratios(target, raw, **ratio_kw)
    r.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def persist_boilerplate_dict(
    spark, docs: DataFrame, path: str, **bp_kw
) -> DataFrame:
    """Build the boilerplate line dictionary offline
    (``boilerplate_lines`` — bounded by its max_lines cap) and persist
    it; returns the reloaded frame (what the stream broadcasts)."""
    from ..ops.text import boilerplate_lines

    bp = boilerplate_lines(docs, **bp_kw)
    bp.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def start_quality_stream(
    spark,
    input_dir: str,
    out_path: str,
    checkpoint: str,
    doc_schema,
    weights: DataFrame,
    ratios: DataFrame | None = None,
    boilerplate: DataFrame | None = None,
    min_score: float = 0.5,
    min_logw: float | None = None,
    max_dup_line_frac: float | None = None,
    max_top_ngram_char_frac: float | None = None,
    gopher_kw: dict | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_files_per_trigger: int = 32,
):
    """Start the continuous curation query: each incoming shard runs
    the full per-document gate stack and survivors append to
    ``out_path`` as (id, text, score[, logw]) under a per-batch
    overwrite partition (idempotent replay). Documents must clear
    EVERY configured gate, in `curation_full` order:

    - ``boilerplate``: persisted dictionary — matching lines are
      REMOVED first (survivor text is the cleaned rebuild; all later
      gates score the cleaned text).
    - ``max_dup_line_frac`` / ``max_top_ngram_char_frac``: Gopher
      repetition gates (model-free map-side stats).
    - ``gopher_kw``: the Gopher table-A1 DOCUMENT rules
      (``gopher_gate`` — word bounds, symbol/bullet/ellipsis/alpha
      fractions, stop-word presence; also model-free map-side). Pass
      ``{}`` for the paper's published default thresholds, or
      keyword overrides; ``None`` (default) disables the gate.
    - ``min_score``: classifier gate against ``weights``.
    - ``ratios`` + ``min_logw``: DSIR importance gate."""
    from ..ops.sampling import dsir_scores
    from ..ops.text import (
        gopher_gate,
        gopher_quality_stats,
        quality_classifier_score,
        remove_boilerplate_with,
        repetition_stats,
    )

    def sink(batch_df, batch_id):
        pinned = batch_df.persist()
        batch = pinned
        try:
            if batch.isEmpty():
                return
            if boilerplate is not None:
                cleaned = remove_boilerplate_with(
                    batch, boilerplate, id_col, text_col
                ).select(id_col, text_col)
                batch = batch.drop(text_col).join(cleaned, id_col)
            if (
                max_dup_line_frac is not None
                or max_top_ngram_char_frac is not None
            ):
                rep = repetition_stats(batch, id_col, text_col)
                cond = F.lit(True)
                if max_dup_line_frac is not None:
                    cond &= F.col("dup_line_frac") <= max_dup_line_frac
                if max_top_ngram_char_frac is not None:
                    cond &= (
                        F.col("top_ngram_char_frac")
                        <= max_top_ngram_char_frac
                    )
                batch = batch.join(rep.where(cond).select(id_col), id_col)
            if gopher_kw is not None:
                g = gopher_gate(
                    gopher_quality_stats(batch, id_col, text_col),
                    **gopher_kw,
                )
                batch = batch.join(
                    g.where(F.col("gopher_pass")).select(id_col), id_col
                )
            scored = quality_classifier_score(
                batch, weights, id_col, text_col
            ).select(id_col, "score")
            kept = batch.join(
                scored.where(F.col("score") >= min_score), id_col
            )
            if ratios is not None and min_logw is not None:
                lw = dsir_scores(batch, ratios, id_col, text_col).select(
                    id_col, "logw"
                )
                kept = kept.join(
                    lw.where(F.col("logw") >= min_logw), id_col
                )
            # per-batch overwrite partition: a replayed batch REPLACES
            # its previous attempt instead of duplicating it
            kept.write.mode("overwrite").parquet(
                f"{out_path}/_batch={batch_id}"
            )
        finally:
            pinned.unpersist()

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
