"""Pipes: continuous filtered materialization as Structured Streaming.

A pipe (reference: pkg/pipe/ppipe.go:63-85) is a persistent continuous
query: records from partitions matching the tag condition, filtered by the
WHERE condition, land in a derived partition ``{logrange.pipe=<name>}``
with the source partition's tags folded into each record's fields
(pkg/pipe/siterator.go:38-63).

The reference's WriteEvent/notificator/worker machinery
(pkg/pipe/service.go:270-284, worker.go:48-104) is replaced wholesale by a
checkpointed Structured Streaming query over the logs directory — offset
tracking, retry, and recovery are Spark's. The reference is at-least-once
(pkg/pipe/worker.go:48-104 re-delivers on crash); ours is EXACTLY-ONCE:
each piped record carries its source (src, seq) as reserved provenance
fields, a per-source delivered-seq high-water mark fast-paths provably
fresh batches, and every suspicious batch (restart replay, crash
re-delivery, compact() rewriting source files under new names,
out-of-order file pickup) goes through an exact provenance anti-join
against the destination. The dedup scan is paid only on suspicious
batches, not per batch.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..lql.parser import parse_source, parse_where
from ..compiler.tagexpr import compile_tags
from ..compiler.whereexpr import compile_where
from ..model.schema import STREAM_SCHEMA, src_for_tag_line
from ..model.tags import tag_line


def pipe_tags(name: str) -> dict[str, str]:
    # destination partition identity (reference: pkg/pipe/ppipe.go:224-228)
    return {"logrange.pipe": name}


# reserved provenance field keys (the "logrange.pipe" namespace is already
# reserved for pipe machinery): the piped record's ORIGINAL (src, seq) —
# the idempotency key for exactly-once re-delivery
PROV_SRC = "logrange.pipe.src"
PROV_SEQ = "logrange.pipe.seq"

# files per micro-batch; module-level so tests can force one-file batches
# to exercise multi-batch redelivery orderings
MAX_FILES_PER_TRIGGER = 64


def pipe_transform(df, name: str, source, where):
    """The pipe's record transform — filters, source-tag enrichment, and
    destination identity — shared by the in-store streaming pipe
    (``start_pipe``) and the cross-store cursor pipe
    (``forward.start_cursor_pipe``).

    Source-tag enrichment: tags become fields on the piped record
    (reference: pkg/pipe/worker.go:67-69). On key collision the
    record's own field wins — the reference's field lookup is
    first-match and record fields are concatenated first
    (pkg/model/field/field.go:143-157) — so colliding tag keys are
    filtered out rather than letting map_concat throw
    DUPLICATE_MAP_KEY under the default mapKeyDedupPolicy=EXCEPTION.
    The provenance pair (the exactly-once idempotency key) is
    prepended and WINS over any record field spoofing its name;
    src/seq here are still the SOURCE values (overwritten at the end).
    """
    dest_tags = pipe_tags(name)
    dest_line = tag_line(dest_tags)
    dest_src = src_for_tag_line(dest_line)
    # never re-consume our own output (or other pipes' output)
    df = df.where(
        F.coalesce(F.col("tags").getItem("logrange.pipe"), F.lit("")) == ""
    )
    if source is not None:
        df = df.where(compile_tags(source))
    if where is not None:
        df = df.where(compile_where(where))
    base_fields = F.coalesce(F.col("fields"), F.expr("map()"))
    merged_fields = F.map_concat(
        base_fields,
        F.map_filter(
            F.coalesce(F.col("tags"), F.expr("map()")),
            lambda k, _: ~F.map_contains_key(base_fields, k),
        ),
    )
    return (
        df.withColumn(
            "fields",
            F.map_concat(
                F.create_map(
                    F.lit(PROV_SRC), F.col("src"),
                    F.lit(PROV_SEQ), F.col("seq").cast("string"),
                ),
                F.map_filter(
                    merged_fields, lambda k, _: ~k.isin(PROV_SRC, PROV_SEQ)
                ),
            ),
        )
        .withColumn(
            "tags",
            F.create_map(*[c for k, v in sorted(dest_tags.items()) for c in (F.lit(k), F.lit(v))]),
        )
        .withColumn("tag_line", F.lit(dest_line))
        .withColumn("src", F.lit(dest_src))
    )


def start_pipe(engine, defn: dict):
    """Start the streaming query for a pipe definition {name, source, where}."""
    name = defn["name"]
    source = parse_source(defn.get("source") or "")
    where = parse_where(defn.get("where") or "")

    dest_tags = pipe_tags(name)
    dest_line = tag_line(dest_tags)
    dest_src = src_for_tag_line(dest_line)

    # The streaming side is ONLY the raw file reader (offset tracking,
    # checkpointing, recovery). Every transformation — filters, tag
    # enrichment, provenance — is applied to the batch DataFrame inside
    # foreachBatch: the per-batch plan is freshly analyzed and optimized
    # (filters still reach the parquet scan), whereas putting
    # higher-order-function lambdas (map_filter/map_contains_key) in the
    # STREAMING plan trips a Spark 4.1 IncrementalExecution bug when the
    # source directory is empty at stream start — re-analysis of the first
    # non-empty batch leaves the lambda variables unresolved and the
    # optimizer dies with PLAN_VALIDATION_FAILED_RULE_IN_BATCH /
    # "Invalid call to exprId on unresolved object" (reproduced with both
    # Column-DSL and SQL-string lambdas; a pipe's source dir legitimately
    # starts empty, so the streaming plan must stay lambda-free).
    # STREAM_SCHEMA (src last), not LOG_SCHEMA: see model/schema.py — the
    # raw batch handoff renames columns positionally.
    #
    # Partition pruning at the SOURCE: a tag condition is
    # partition-constant (records inherit their partition's tags), so the
    # matching src set from the engine catalog restricts the stream to a
    # brace-glob over just those directories — at 100 TB the pipe lists
    # and reads only its partitions, not the whole store. The matching
    # set can grow when a new partition is born; Engine.write detects
    # that and RESTARTS the pipe with the widened glob on the same
    # checkpoint: files under a newly matched dir were never listed by
    # the old query, so they are processed after the restart — no loss,
    # and the first-batch provenance anti-join keeps it exactly-once
    # across the restart. Row-level filters in transform() are kept
    # regardless, so pruning is purely an optimization.
    srcs = engine.resolve_sources(source, cap=False) if source is not None else None
    reader = engine.spark.readStream.schema(STREAM_SCHEMA).option(
        "maxFilesPerTrigger", MAX_FILES_PER_TRIGGER
    )
    if srcs:
        reader = reader.option("basePath", engine.logs_path)
        path = f"{engine.logs_path}/src={{{','.join(srcs)}}}"
    else:
        # no matching partition yet (or no tag condition): listen on the
        # whole store; rows are filtered in transform(), and the birth of
        # a matching partition triggers a restart onto the pruned glob
        path = engine.logs_path
    engine._pipe_srcs[name] = set(srcs) if srcs is not None else None
    stream = reader.parquet(path)

    def transform(df):
        return pipe_transform(df, name, source, where)

    checkpoint = os.path.join(engine.pipes_dir, "checkpoints", name)
    dest_dir = os.path.join(engine.logs_path, f"src={dest_src}")
    # Exactly-once bookkeeping: a per-SOURCE delivered-seq high-water mark
    # (driver memory, O(#sources)). seq is monotonic per source, so a
    # batch whose every source's min seq is STRICTLY ABOVE its mark is
    # provably fresh and appends directly — the common case costs one
    # tiny per-batch aggregation. Any other batch is "suspicious" — the
    # first batch after a (re)start, a replay after a crash, files
    # re-delivered under new names after compact() rewrites a source
    # partition, or out-of-order file pickup — and goes through the exact
    # (src, seq) anti-join against the destination's provenance pairs.
    # The anti-join is idempotent, so the suspicious path is always safe;
    # the high-water mark only decides when the cheap path is allowed.
    hw: dict[str, int] = {}
    seeded = {"done": False}

    def sink(batch_df, batch_id):
        out = transform(batch_df).persist()
        try:
            stats = (
                out.select(
                    F.col("fields").getItem(PROV_SRC).alias("psrc"),
                    F.col("fields").getItem(PROV_SEQ).cast("long").alias("pseq"),
                )
                .groupBy("psrc")
                .agg(F.min("pseq").alias("mn"), F.max("pseq").alias("mx"))
                .collect()
            )
            if not stats:
                return
            # a source ABSENT from hw is suspicious too: after a restart
            # the first batch seeds only the sources it happened to
            # contain, and a later batch may carry REDELIVERED rows of a
            # source never seen by this incarnation — treating it as
            # fresh would deliver those rows twice. (A genuinely new
            # source pays one redundant dest scan; correctness first.)
            suspicious = (not seeded["done"]) or any(
                r["psrc"] not in hw or r["mn"] <= hw[r["psrc"]] for r in stats
            )
            seeded["done"] = True
            delivery = out
            # On the suspicious path the high-water marks must come from
            # the DESTINATION, not the batch: a redelivered batch whose
            # rows are all anti-joined away says nothing about what has
            # been delivered beyond it. Seeding hw from the batch's own
            # mx would under-estimate (e.g. redelivered seqs 1..50 seed
            # hw=50 while dest already holds 1..100, letting the next
            # redelivered batch 51..100 fast-path in twice). dest_marks
            # covers every source in dest, so unrelated sources get
            # fast-pathable marks too.
            dest_marks: dict[str, int] = {}
            if suspicious and os.path.isdir(dest_dir):
                existing = (
                    engine.spark.read.parquet(dest_dir)
                    .select(
                        F.col("fields").getItem(PROV_SRC).alias("_psrc"),
                        F.col("fields").getItem(PROV_SEQ).alias("_pseq"),
                    )
                    .where(F.col("_psrc").isNotNull())
                    .distinct()
                    .persist()
                )
                try:
                    dest_marks = {
                        r["_psrc"]: r["dmx"]
                        for r in existing.groupBy("_psrc")
                        .agg(F.max(F.col("_pseq").cast("long")).alias("dmx"))
                        .collect()
                        if r["dmx"] is not None
                    }
                    delivery = (
                        out.withColumn("_psrc", F.col("fields").getItem(PROV_SRC))
                        .withColumn("_pseq", F.col("fields").getItem(PROV_SEQ))
                        .join(existing, ["_psrc", "_pseq"], "left_anti")
                        .drop("_psrc", "_pseq")
                    )
                    if not delivery.isEmpty():
                        engine.append_df(delivery)
                finally:
                    existing.unpersist()
            elif not delivery.isEmpty():
                engine.append_df(delivery)
            # After append_df every (src, seq) in this batch is in dest
            # (appended now or anti-joined as already present), so the
            # batch mx is a valid mark — but on the suspicious path dest
            # may be ahead of the batch, so take the max with dest_marks.
            for r in stats:
                hw[r["psrc"]] = max(
                    hw.get(r["psrc"], -1), r["mx"], dest_marks.get(r["psrc"], -1)
                )
            for psrc, dmx in dest_marks.items():
                hw[psrc] = max(hw.get(psrc, -1), dmx)
        finally:
            out.unpersist()

    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime="1 second")
        .foreachBatch(sink)
        .start()
    )
