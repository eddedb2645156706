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
set, the append is guarded by a provenance anti-join against the corpus
membership, and every docs write lands in its own per-batch OVERWRITE
partition (``_batch=<id>`` — streaming/curation.py's pattern), so a
crash anywhere inside the commit sequence REPLACES rather than
duplicates on replay: exactly-once on ``{path}_docs`` (r15 review
finding #1; same idea as the engine's exactly-once pipes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..ops import dedup

# the bootstrap (seed) corpus lands in this pseudo-batch partition so the
# directory layout is uniform with the stream's per-batch partitions —
# Spark refuses to read a parquet root that mixes leaf files with
# partition directories
BOOTSTRAP_BATCH = -1


def fs_path(spark, path: str):
    """(FileSystem, Path) for any Hadoop-supported scheme — the one
    shared jvm-FS entry point for the streaming family (corpus resets,
    the maintenance job's atomic swap)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p


def fs_exists(spark, path: str) -> bool:
    fs, p = fs_path(spark, path)
    return fs.exists(p)


def fs_delete(spark, path: str) -> None:
    fs, p = fs_path(spark, path)
    fs.delete(p, True)


def fs_rename(spark, src: str, dst: str) -> None:
    fs, p = fs_path(spark, src)
    if not fs.rename(p, spark._jvm.org.apache.hadoop.fs.Path(dst)):
        raise IOError(f"rename failed: {src} -> {dst}")


def reset_docs_dir(spark, docs_path: str) -> None:
    """Remove a previous ``{path}_docs`` tree before a (re-)bootstrap,
    along with every maintenance artifact tied to the old corpus: the
    seed write overwrites only its own ``_batch=-1`` partition, so
    stale stream partitions must go explicitly; a stale ``.maint``
    left by a run that crashed before its commit would otherwise be
    'healed' over the freshly re-bootstrapped corpus by the next
    maintenance pass; and the durable ``{path}_tombstones`` id set
    belongs to the OLD corpus' id space — carrying it forward would
    suppress legitimately novel documents whose ids collide with the
    previous incarnation's drops (r16 review). Hadoop FS API, not
    shutil — works for any scheme the store uses."""
    for suffix in ("", ".maint", ".old"):
        fs_delete(spark, docs_path + suffix)
    if docs_path.endswith("_docs"):
        fs_delete(spark, docs_path[: -len("_docs")] + "_tombstones")
        fs_delete(spark, docs_path[: -len("_docs")] + "_tombstones.tmp")


def write_docs_batch(df: DataFrame, docs_path: str, batch_id) -> None:
    """Commit one batch's documents under a per-batch OVERWRITE
    partition: a replayed batch REPLACES its previous (possibly
    partial) attempt instead of appending next to it — exactly-once on
    the docs files without reading the docs table (no per-batch scan
    of an ever-growing output)."""
    df.write.mode("overwrite").parquet(f"{docs_path}/_batch={batch_id}")


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
    drops = dedup.near_duplicate_drops(corpus, id_col, text_col,
                                       unique=False)  # left_anti consumer
    kept = corpus.join(drops, id_col, "left_anti")
    reset_docs_dir(spark, f"{path}_docs")
    write_docs_batch(kept, f"{path}_docs", BOOTSTRAP_BATCH)
    bands, toks, members, _ids = dedup.persist_corpus_lsh(
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
    # the sidecar's existence cannot change while the stream runs (the
    # offline maintenance contract), so resolve it ONCE at stream start
    # instead of per micro-batch (r16 review)
    has_ids_t = spark.catalog.tableExists(f"{name}_ids")

    def sink(batch_df, batch_id):
        batch = batch_df.persist()
        try:
            if batch.isEmpty():
                return
            # 1. keep-first dedup WITHIN the shard
            drops = dedup.near_duplicate_drops(
                batch, id_col, text_col, threshold, unique=False
            )  # left_anti consumer
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
            # novel set, but those ids are in the guard table now —
            # anti-join makes the append idempotent. The guard insert
            # runs LAST, so it only ever records fully appended
            # documents; the docs write itself is a per-batch OVERWRITE
            # partition, so a crash INSIDE the append sequence replaces
            # rather than duplicates on replay — exactly-once on both
            # the probe tables and the _docs files. The guard is the
            # id-BUCKETED {name}_ids sidecar (no corpus-side Exchange
            # per batch — the members anti-join shuffled the whole
            # tkey-bucketed table); pre-sidecar stores fall back to
            # members.
            guard_t = (
                spark.table(f"{name}_ids")
                if has_ids_t
                else members_t.select(F.col(id_col))
            )
            # EAGER lineage cut of the novel ID SET, not a persist and
            # not the full rows: each insertInto below invalidates
            # cached plans referencing the modified table, and a
            # persist recomputed after the members insert sees the
            # batch fully in the probe state and empties itself — the
            # guard-id insert then silently writes nothing (see
            # fingerprint_probe_and_commit). Checkpointing only the id
            # column keeps the pinned executor blocks at one long per
            # novel doc (r16 review: full-row blocks accumulate until
            # the driver GCs the frame); the full rows rebuild from
            # ``batch`` — persisted and TABLE-INDEPENDENT, so its
            # cache survives every insert's invalidation.
            novel_ids = novel.join(
                guard_t.select(F.col(id_col)), id_col, "left_anti"
            ).select(id_col).localCheckpoint(eager=True)
            if novel_ids.isEmpty():
                return
            novel = batch.join(novel_ids, id_col)
            write_docs_batch(novel, f"{path}_docs", batch_id)
            nb, nt, nm = dedup._collapsed_probe_state(novel, id_col, text_col)
            # bucketed appends: insertInto preserves the bucket spec,
            # so future probes stay Exchange-free on the corpus side;
            # the guard goes LAST (see the replay-guard note above)
            nb.select("tkey", "bkey").write.insertInto(f"{name}_bands")
            nt.select("tkey", "tok").write.insertInto(f"{name}_toks")
            nm.select("tkey", id_col).write.insertInto(f"{name}_members")
            if has_ids_t:
                novel_ids.write.insertInto(f"{name}_ids")
            # explicit refresh: the batch frames belong to the CLONED
            # streaming session, so the inserts do not refresh the base
            # session's relation cache (see fingerprint_probe_and_commit)
            for t in ("bands", "toks", "members") + (
                ("ids",) if has_ids_t else ()
            ):
                spark.catalog.refreshTable(f"{name}_{t}")
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
    Returns (corpus_df, fps, members) catalog tables (the id-bucketed
    ``{name}_fp_ids`` replay-guard sidecar is persisted alongside)."""
    fp = dedup.simhash(corpus, id_col, text_col, bits=64)
    pairs = dedup.hamming_near_pairs(fp, id_col, "simhash", 64, max_hamming)
    kept = corpus.join(
        pairs.select(F.col("id_b").alias(id_col)).distinct(),
        id_col,
        "left_anti",
    )
    reset_docs_dir(spark, f"{path}_docs")
    write_docs_batch(kept, f"{path}_docs", BOOTSTRAP_BATCH)
    fps, members, _ids = dedup.persist_corpus_fingerprints(
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
    *,
    batch_id: int,
) -> None:
    """The invariant-bearing fingerprint ingestion sequence, shared by
    ``start_fingerprint_dedup_stream`` and the streaming capstone
    (streaming/cc_ingest.py): simhash ONCE behind an eager checkpoint,
    within-shard keep-first, probe the persisted banded index, apply
    the id replay guard, then commit the NOVEL documents — docs
    write first (optionally through ``transform(novel)``, e.g. to
    attach scores) into the per-batch OVERWRITE partition
    ``_batch=<batch_id>``, bands insert, members insert, guard-id
    insert LAST. Keep this in one place: the guard-last ordering IS
    the replay guard, and a second copy of this block is how
    exactly-once breaks silently (r15 review finding).

    Crash-replay matrix (r16 — exactly-once on ``{path}_docs``):
    a crash before the docs write finishes → the replayed batch
    OVERWRITES the partial partition; between docs and bands → the
    probe misses and the guard still sees the docs as novel, so the
    replay recomputes the same set (deterministic) and overwrites
    byte-identically; after the guard-id insert → the guard empties
    the novel set and the partition from the completed attempt stands.
    Two non-idempotent-but-benign residues: (a) a crash between the
    bands insert and the members insert — the probe's candidate rows
    exist but verify through the missing members rows, so the replay
    still sees the docs as novel and re-inserts the band rows
    (duplicate ``(bkey, band, h)`` rows in ``{name}_fps``, costing
    duplicate CANDIDATE pairs every consumer already collapses with
    ``distinct()``); (b) a crash between the members insert and the
    guard-id insert — the replay's probe now fully verifies, so the
    epoch's docs are (correctly) not novel and their ``{name}_fp_ids``
    rows are never inserted. That gap is benign: the probe itself
    guards any replay of those ids while their fingerprints are live,
    and the next maintenance pass closes it — its tombstone derivation
    reads the PRE-maintenance docs table (which holds every committed
    document from its epoch's first write, regardless of which index
    inserts completed), so even a document maintenance drops while
    sitting in ANY partial-commit gap stays tombstoned — never a
    missed or duplicated document in any window.

    The band-insert dedup anti-joins ``{name}_fp_members`` (bucketed by
    ``h``), NOT ``{name}_fps`` (bucketed by ``bkey``): membership is
    equivalent — every committed document's masked fingerprint is in
    both tables — and the members side reads co-located buckets with no
    corpus-side Exchange, so the commit path carries the same plan
    contract as the probe path (r15 review finding #2; plan-asserted in
    tests/test_bucketing.py).

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
    # replay guard (see the MinHash stream): ids already committed by a
    # previous attempt — or tombstoned by maintenance — anti-joined
    # against the id-BUCKETED {name}_fp_ids sidecar, so the corpus side
    # reads co-located buckets with no per-batch Exchange (guarding
    # against the h-bucketed members table shuffled the whole corpus
    # table every micro-batch). Pre-sidecar stores fall back to the
    # members guard (which then still carries any legacy tombstones).
    has_ids_t = spark.catalog.tableExists(f"{name}_fp_ids")
    guard_ids = (
        spark.table(f"{name}_fp_ids")
        if has_ids_t
        else members_t.select(F.col(id_col))
    )
    nfp = (
        keep_fp.join(
            matches.select(F.col("new_id").alias(id_col)).distinct(),
            id_col,
            "left_anti",
        )
        .join(guard_ids.select(F.col(id_col)), id_col, "left_anti")
        # EAGER lineage cut, NOT persist: each insertInto below
        # invalidates every cached plan that references the modified
        # table, and a persist recomputed after the members insert sees
        # the batch's OWN rows fully in the index — the probe then
        # filters them out and the guard-id insert silently writes
        # NOTHING (observed; the pre-sidecar inserts were immune only
        # because match verification expands through the not-yet-
        # inserted members table). A checkpoint severs the plan from
        # the tables, so every insert reads the same computed batch.
        .localCheckpoint(eager=True)
    )
    novel = docs.join(nfp.select(id_col), id_col)
    if nfp.isEmpty():
        return
    out = novel if transform is None else transform(novel)
    write_docs_batch(out, f"{path}_docs", batch_id)
    h, _ = dedup._hamming_masked_and_bands(
        F.col("simhash"), 64, max_hamming
    )
    hashed = nfp.select(F.col(id_col), h.alias("h"))
    bands = novel_band_rows(hashed, members_t, max_hamming)
    bands.select("bkey", "band", "h").write.insertInto(f"{name}_fps")
    hashed.select("h", id_col).write.insertInto(f"{name}_fp_members")
    if has_ids_t:
        nfp.select(id_col).write.insertInto(f"{name}_fp_ids")
    # under foreachBatch these insert frames belong to Spark's CLONED
    # streaming session, so the inserts refresh the CLONE's relation
    # cache only — the base session's next probe (spark.table here)
    # would read a STALE file listing and miss everything this batch
    # committed. The persist-era code was saved by an accident: the
    # shared CacheManager's recache of the persisted novel set happened
    # to re-resolve the table relations; the lineage-cut checkpoint
    # removed that side effect, so refresh EXPLICITLY (metadata-only).
    spark.catalog.refreshTable(f"{name}_fps")
    spark.catalog.refreshTable(f"{name}_fp_members")
    if has_ids_t:
        spark.catalog.refreshTable(f"{name}_fp_ids")


def novel_band_rows(
    hashed: DataFrame, members_t: DataFrame, max_hamming: int = 3
) -> DataFrame:
    """Expand a batch's novel masked fingerprints ``(id, h)`` to the
    ``(bkey, band, h)`` rows the fps index stores, deduping against
    fingerprints already committed. The dedup anti-joins the MEMBERS
    table — bucketed by ``h``, the join key — so the index side reads
    co-located buckets with NO Exchange; anti-joining the fps table
    itself (bucketed by ``bkey``) would shuffle + distinct the ENTIRE
    index every micro-batch (r15 review finding #2). h-in-members ⟺
    h-in-fps: both tables gain a fingerprint in the same commit, and
    the only divergence window (crash between the two inserts) costs a
    duplicate band row, not a wrong answer (see
    ``fingerprint_probe_and_commit``)."""
    return (
        hashed.select("h").distinct()
        .join(members_t.select("h").hint("merge"), "h", "left_anti")
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
    batch anti-joins away against fully recorded documents only, and
    the docs write is a per-batch OVERWRITE partition, so a crash
    BETWEEN the docs write and the members insert replaces rather than
    duplicates on replay — exactly-once on ``{path}_docs`` (see
    ``fingerprint_probe_and_commit`` for the full crash-replay
    matrix)."""

    def sink(batch_df, batch_id):
        batch = batch_df.persist()
        try:
            if batch.isEmpty():
                return
            fingerprint_probe_and_commit(
                spark, batch, name, path, id_col, text_col, max_hamming,
                batch_id=batch_id,
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
