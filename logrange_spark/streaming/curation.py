"""Continuous quality-gated ingestion: the scoring half of the 100 TB
streaming-curation story (streaming/corpus_dedup.py is the dedup half).

A Structured Streaming pipeline watches a directory of incoming document
shards and applies PERSISTED selection models to every shard:

    new shard ─► trained quality-classifier score (broadcast weight
                 table — ops/text.quality_classifier_score)
              ─► optional DSIR importance log-weight (broadcast
                 log-ratio table — ops/sampling.dsir_scores)
              ─► threshold gate ─► survivors append, scores attached

The models are corpus-BOUNDED tables (weights ≤ observed features,
ratios ≤ n_features) trained once offline — ``persist_quality_model`` /
``persist_dsir_ratios`` write them; the stream only ever broadcasts
them, so each micro-batch is a pure map + two bounded joins with no
state of its own. Output is idempotent across crash-replay: every batch
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


def start_quality_stream(
    spark,
    input_dir: str,
    out_path: str,
    checkpoint: str,
    doc_schema,
    weights: DataFrame,
    ratios: DataFrame | None = None,
    min_score: float = 0.5,
    min_logw: float | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_files_per_trigger: int = 32,
):
    """Start the continuous curation query: each incoming shard is
    scored against the persisted models and survivors append to
    ``out_path`` as (id, text, score[, logw]) under a per-batch
    overwrite partition (idempotent replay). Pass ``ratios`` +
    ``min_logw`` to add the DSIR gate; documents must clear EVERY
    configured gate."""
    from ..ops.sampling import dsir_scores
    from ..ops.text import quality_classifier_score

    def sink(batch_df, batch_id):
        batch = batch_df.persist()
        try:
            if batch.isEmpty():
                return
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
