"""Continuous corpus deduplication: the 100 TB ingestion shape.

A Structured Streaming pipeline that watches a directory of incoming
document shards and maintains a NEVER-RE-PAIRED deduplicated corpus:

    new shard  ─►  dedup within the shard (keep-first)
               ─►  probe the persisted corpus LSH state
                   (ops/dedup.persist_corpus_lsh — tkey-collapsed bands /
                   toks / members, bucketed so the probe join has no
                   corpus-side Exchange)
               ─►  novel documents append to the corpus output AND to the
                   three probe tables (bucketed INSERT — bucketing is
                   preserved, so later shards still probe Exchange-free)

The corpus is never joined against itself after the initial build; each
shard pays one banding map-stage plus joins against co-located buckets.
Offsets/recovery are Spark's (checkpointed file source); the dedup
decision is deterministic, so a replayed batch re-derives the same novel
set and the output append is guarded by a provenance anti-join against
the corpus membership (same idea as the engine's exactly-once pipes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..ops import dedup


def bootstrap_corpus(
    spark,
    corpus: DataFrame,
    name: str,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
):
    """Initial build: dedup the seed corpus (keep-first) and persist its
    probe state + the corpus rows themselves. Returns (corpus_df,
    bands, toks, members) catalog tables."""
    drops = dedup.near_duplicate_drops(corpus, id_col, text_col)
    kept = corpus.join(drops, id_col, "left_anti")
    kept.write.mode("overwrite").parquet(f"{path}_docs")
    bands, toks, members = dedup.persist_corpus_lsh(
        spark, kept, name, path, id_col, text_col, n_buckets
    )
    return spark.read.parquet(f"{path}_docs"), bands, toks, members


def start_corpus_dedup_stream(
    spark,
    input_dir: str,
    name: str,
    path: str,
    checkpoint: str,
    doc_schema,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    max_files_per_trigger: int = 32,
):
    """Start the continuous dedup query. ``bootstrap_corpus`` must have
    run for ``name``/``path`` first. Novel documents land in
    ``{path}_docs``; the probe tables grow by bucketed INSERTs."""

    def sink(batch_df, batch_id):
        batch = batch_df.persist()
        try:
            if batch.isEmpty():
                return
            # 1. keep-first dedup WITHIN the shard
            drops = dedup.near_duplicate_drops(batch, id_col, text_col, threshold)
            shard = batch.join(drops, id_col, "left_anti")
            # 2. probe the persisted corpus state
            bands_t = spark.table(f"{name}_bands")
            toks_t = spark.table(f"{name}_toks")
            members_t = spark.table(f"{name}_members")
            matches = dedup.near_duplicates_against(
                shard, bands_t, toks_t, members_t, id_col, text_col, threshold
            )
            novel = shard.join(
                matches.select(F.col("new_id").alias(id_col)).distinct(),
                id_col,
                "left_anti",
            )
            # 3. replay guard: a redelivered batch re-derives the same
            # novel set, but those ids are in the corpus members now —
            # anti-join makes the append idempotent. The members insert
            # runs LAST, so the probe state only ever records fully
            # appended documents: exactly-once on the probe tables,
            # at-least-once on the _docs files across a crash INSIDE the
            # append sequence (consumers key by id; the members table is
            # the corpus source of truth).
            novel = novel.join(
                members_t.select(F.col(id_col)), id_col, "left_anti"
            ).persist()
            try:
                if novel.isEmpty():
                    return
                novel.write.mode("append").parquet(f"{path}_docs")
                nb, nt, nm = dedup._collapsed_probe_state(novel, id_col, text_col)
                # bucketed appends: insertInto preserves the bucket spec,
                # so future probes stay Exchange-free on the corpus side;
                # members goes LAST (see the replay-guard note above)
                nb.select("tkey", "bkey").write.insertInto(f"{name}_bands")
                nt.select("tkey", "tok").write.insertInto(f"{name}_toks")
                nm.select("tkey", id_col).write.insertInto(f"{name}_members")
            finally:
                novel.unpersist()
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

# ---------------------------------------------------------------- fingerprint
# The same never-re-paired ingestion shape over the 64-bit simhash
# fingerprint index (ops/dedup.persist_corpus_fingerprints) — the
# declared 100 TB near-dup path. Cheaper per shard than the MinHash
# stream (one fingerprint per doc vs a shingle signature) at the cost
# of Hamming-radius rather than Jaccard-threshold semantics.


def bootstrap_fingerprint_corpus(
    spark,
    corpus: DataFrame,
    name: str,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_buckets: int = 64,
):
    """Initial build: fingerprint the seed corpus, drop within-corpus
    near-dups keep-first, persist the banded index + the corpus rows.
    Returns (corpus_df, fps, members) catalog tables."""
    fp = dedup.simhash(corpus, id_col, text_col, bits=64)
    pairs = dedup.hamming_near_pairs(fp, id_col, "simhash", 64, max_hamming)
    kept = corpus.join(
        pairs.select(F.col("id_b").alias(id_col)).distinct(),
        id_col,
        "left_anti",
    )
    kept.write.mode("overwrite").parquet(f"{path}_docs")
    fps, members = dedup.persist_corpus_fingerprints(
        spark, dedup.simhash(kept, id_col, text_col, bits=64),
        name, path, id_col, "simhash", 64, max_hamming, n_buckets,
    )
    return spark.read.parquet(f"{path}_docs"), fps, members


def fingerprint_probe_and_commit(
    spark,
    docs,
    name: str,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    transform=None,
) -> None:
    """The invariant-bearing fingerprint ingestion sequence, shared by
    ``start_fingerprint_dedup_stream`` and the streaming capstone
    (streaming/cc_ingest.py): simhash ONCE behind an eager checkpoint,
    within-shard keep-first, probe the persisted banded index, apply
    the members replay guard, then commit the NOVEL documents — docs
    append first (optionally through ``transform(novel)``, e.g. to
    attach scores), bands insert, members insert LAST. Keep this in
    one place: the members-last ordering IS the replay guard, and a
    second copy of this block is how exactly-once breaks silently
    (r15 review finding).

    Why the eager checkpoint: the 64-bit simhash is a very deep
    expression tree, and foreachBatch work runs on the stream-execution
    thread whose JVM stack is shallower than the driver main thread's —
    re-analyzing plans that embed the expression several times
    overflows it (observed as StackOverflowError in the stream
    thread). The per-shard fingerprint frame is two narrow columns, so
    the checkpoint is cheap and every downstream join plans against a
    flat scan."""
    fp = dedup.simhash(
        docs, id_col, text_col, bits=64
    ).localCheckpoint(eager=True)
    pairs = dedup.hamming_near_pairs(fp, id_col, "simhash", 64, max_hamming)
    keep_fp = fp.join(
        pairs.select(F.col("id_b").alias(id_col)).distinct(),
        id_col,
        "left_anti",
    )
    fps_t = spark.table(f"{name}_fps")
    members_t = spark.table(f"{name}_fp_members")
    matches = dedup.hamming_near_pairs_against(
        keep_fp, fps_t, members_t, id_col, "simhash", 64, max_hamming
    )
    # replay guard (see the MinHash stream): ids already in the
    # members table were fully appended by a previous attempt
    nfp = (
        keep_fp.join(
            matches.select(F.col("new_id").alias(id_col)).distinct(),
            id_col,
            "left_anti",
        )
        .join(members_t.select(F.col(id_col)), id_col, "left_anti")
        .persist()
    )
    novel = docs.join(nfp.select(id_col), id_col)
    try:
        if nfp.isEmpty():
            return
        out = novel if transform is None else transform(novel)
        out.write.mode("append").parquet(f"{path}_docs")
        h, _ = dedup._hamming_masked_and_bands(
            F.col("simhash"), 64, max_hamming
        )
        hashed = nfp.select(F.col(id_col), h.alias("h"))
        bands = (
            hashed.select("h").distinct()
            .join(fps_t.select("h").distinct(), "h", "left_anti")
            .select(
                "h",
                F.posexplode(
                    dedup._hamming_masked_and_bands(
                        F.col("h"), 64, max_hamming
                    )[1]
                ).alias("band", "_bv"),
            )
            .select(
                F.concat_ws(":", F.col("band"), F.col("_bv")).alias("bkey"),
                "band",
                "h",
            )
        )
        bands.select("bkey", "band", "h").write.insertInto(f"{name}_fps")
        hashed.select("h", id_col).write.insertInto(f"{name}_fp_members")
    finally:
        nfp.unpersist()


def start_fingerprint_dedup_stream(
    spark,
    input_dir: str,
    name: str,
    path: str,
    checkpoint: str,
    doc_schema,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_files_per_trigger: int = 32,
):
    """Continuous fingerprint dedup: each incoming shard fingerprints
    map-side, drops within-shard near-dups keep-first, probes the
    persisted banded index (no corpus-side Exchange), and appends only
    novel documents — to the corpus output AND to the two index tables
    (bucketed INSERTs preserve the bucket spec, so later shards still
    probe Exchange-free). The members insert runs LAST, so a replayed
    batch anti-joins away against fully recorded documents only — the
    same replay guard as the MinHash stream above, with the same
    at-least-once caveat on ``{path}_docs``: a crash BETWEEN the docs
    append and the members insert re-appends those documents on
    replay, so consumers must key by ``id_col`` (the members table is
    the exactly-once source of truth for corpus membership)."""

    def sink(batch_df, batch_id):
        batch = batch_df.persist()
        try:
            if batch.isEmpty():
                return
            fingerprint_probe_and_commit(
                spark, batch, name, path, id_col, text_col, max_hamming
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
