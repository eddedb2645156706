"""Continuous EMBEDDING corpus deduplication — the vector-side twin of
``streaming/corpus_dedup.py`` (round-8 parity):

    new shard  ─►  keep-first dedup within the shard
                   (ops/ann.embedding_near_duplicate_drops — O(n) output)
               ─►  probe the persisted corpus state
                   (ops/ann.persist_corpus_embeddings — collapsed rep
                   vectors bucketed by sign bucket + the rep→member map,
                   so the probe join has no corpus-side Exchange)
               ─►  novel vectors append to the corpus output AND to the
                   two probe tables (bucketed INSERT — bucketing is
                   preserved, so later shards still probe Exchange-free)

The corpus is never re-paired against itself; each shard pays one
collapse + Hamming-1 multi-probe against co-located buckets. ``dims``
is FIXED at bootstrap (sign buckets are only comparable under one bit
count) and must be threaded to the stream unchanged. Zero-norm vectors
have no cosine (null score) and are therefore never considered
duplicates anywhere in the family — consistent with the batch
operators. Offsets/recovery are Spark's (checkpointed file source); a
replayed batch re-derives the same novel set, the append is guarded by
a provenance anti-join against the corpus membership, and every docs
write lands in a per-batch OVERWRITE partition (exactly-once on
``{path}_docs`` across crash replay — see streaming/corpus_dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..ops import ann
from .corpus_dedup import BOOTSTRAP_BATCH, reset_docs_dir, write_docs_batch


def bootstrap_embedding_corpus(
    spark,
    corpus: DataFrame,
    name: str,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_buckets: int = 64,
    dims: int | None = None,
):
    """Initial build: keep-first dedup of the seed corpus, persist the
    survivors + probe state. Returns (corpus_df, vecs_t, members_t,
    dims) — hold onto ``dims`` for the stream."""
    drops = ann.embedding_near_duplicate_drops(
        corpus, threshold, id_col, vec_col, dims=dims, unique=False
    )  # left_anti consumer
    kept = corpus.join(drops, id_col, "left_anti")
    reset_docs_dir(spark, f"{path}_docs")
    write_docs_batch(kept, f"{path}_docs", BOOTSTRAP_BATCH)
    vecs_t, members_t, _ids_t, dims = ann.persist_corpus_embeddings(
        spark, kept, name, path, id_col, vec_col, dims=dims,
        n_buckets=n_buckets,
    )
    return spark.read.parquet(f"{path}_docs"), vecs_t, members_t, dims


def start_embedding_dedup_stream(
    spark,
    input_dir: str,
    name: str,
    path: str,
    checkpoint: str,
    vec_schema,
    dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    max_files_per_trigger: int = 32,
):
    """Start the continuous embedding-dedup query.
    ``bootstrap_embedding_corpus`` must have run for ``name``/``path``
    first, and ``dims`` must be the value it returned. Novel vectors
    land in ``{path}_docs``; the probe tables grow by bucketed
    INSERTs."""
    # the sidecar's existence cannot change while the stream runs (the
    # offline maintenance contract), so resolve it ONCE at stream start
    # instead of per micro-batch (r16 review)
    has_ids_t = spark.catalog.tableExists(f"{name}_ids")

    def sink(batch_df, batch_id):
        batch = batch_df.persist()
        try:
            if batch.isEmpty():
                return
            # 1. keep-first dedup WITHIN the shard (fixed dims: the
            # shard's own blocking must match the corpus')
            drops = ann.embedding_near_duplicate_drops(
                batch, threshold, id_col, vec_col, dims=dims, unique=False
            )  # left_anti consumer
            shard = batch.join(drops, id_col, "left_anti")
            # 2. probe the persisted corpus state
            vecs_t = spark.table(f"{name}_vecs")
            members_t = spark.table(f"{name}_members")
            matches = ann.embedding_near_duplicates_against(
                shard, vecs_t, members_t, dims, threshold, id_col, vec_col
            )
            novel = shard.join(
                matches.select(F.col("new_id").alias(id_col)).distinct(),
                id_col,
                "left_anti",
            )
            # 3. replay guard (same contract as corpus_dedup: the guard
            # table is the source of truth and is written LAST, so the
            # probe state only ever records fully appended vectors; the
            # docs write is a per-batch overwrite partition —
            # exactly-once across crash replay). The guard is the
            # id-BUCKETED {name}_ids sidecar — anti-joining the
            # rid-bucketed members table shuffled the whole corpus-side
            # table per micro-batch; pre-sidecar stores fall back.
            guard_t = (
                spark.table(f"{name}_ids")
                if has_ids_t
                else members_t
            )
            # EAGER lineage cut of the novel ID SET, not a persist and
            # not the full rows (see corpus_dedup's sink for the full
            # rationale: inserts invalidate table-referencing caches,
            # and an id-only checkpoint keeps the pinned blocks at one
            # long per novel vector; the embedding rows rebuild from
            # ``batch`` — persisted and table-independent)
            novel_ids = novel.join(
                guard_t.select(F.col("id").alias(id_col)), id_col,
                "left_anti",
            ).select(id_col).localCheckpoint(eager=True)
            if novel_ids.isEmpty():
                return
            novel = batch.join(novel_ids, id_col)
            write_docs_batch(novel, f"{path}_docs", batch_id)
            keyed = novel.select(
                F.col(id_col), F.col(vec_col),
                ann._emb_vkey(vec_col).alias("_vkey"),
            )
            reps = keyed.groupBy("_vkey").agg(
                F.min(id_col).alias("rid"), F.first(vec_col).alias(vec_col)
            )
            vecs = reps.select(
                ann.sign_bucket(F.col(vec_col), dims).alias("bucket"),
                F.col("rid"),
                F.col(vec_col).alias("vec"),
                ann._norm(F.col(vec_col)).alias("norm"),
            )
            members = keyed.join(reps.select("_vkey", "rid"), "_vkey").select(
                F.col("rid"), F.col(id_col).alias("id")
            )
            vecs.write.insertInto(f"{name}_vecs")
            members.write.insertInto(f"{name}_members")
            if has_ids_t:
                novel_ids.select(
                    F.col(id_col).alias("id")
                ).write.insertInto(f"{name}_ids")
            # explicit refresh: the batch frames belong to the CLONED
            # streaming session, so the inserts do not refresh the base
            # session's relation cache (see fingerprint_probe_and_commit)
            for t in ("vecs", "members") + (
                ("ids",) if has_ids_t else ()
            ):
                spark.catalog.refreshTable(f"{name}_{t}")
        finally:
            batch.unpersist()

    return (
        spark.readStream.schema(vec_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
        .writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime="1 second")
        .foreachBatch(sink)
        .start()
    )
