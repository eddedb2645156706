"""Pipes: continuous filtered materialization as Structured Streaming.

A pipe (reference: pkg/pipe/ppipe.go:63-85) is a persistent continuous
query: records from partitions matching the tag condition, filtered by the
WHERE condition, land in a derived partition ``{logrange.pipe=<name>}``
with the source partition's tags folded into each record's fields
(pkg/pipe/siterator.go:38-63).

The reference's WriteEvent/notificator/worker machinery
(pkg/pipe/service.go:270-284, worker.go:48-104) is replaced wholesale by a
checkpointed Structured Streaming query over the logs directory — offset
tracking, retry, and recovery are Spark's. The reference is at-least-once;
the file-source + idempotent-append combination here keeps that contract
(exactly-once would come with a transactional sink such as Delta).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..lql.parser import parse_source, parse_where
from ..compiler.tagexpr import compile_tags
from ..compiler.whereexpr import compile_where
from ..model.schema import LOG_SCHEMA, src_for_tag_line
from ..model.tags import tag_line


def pipe_tags(name: str) -> dict[str, str]:
    # destination partition identity (reference: pkg/pipe/ppipe.go:224-228)
    return {"logrange.pipe": name}


def start_pipe(engine, defn: dict):
    """Start the streaming query for a pipe definition {name, source, where}."""
    name = defn["name"]
    source = parse_source(defn.get("source") or "")
    where = parse_where(defn.get("where") or "")

    dest_tags = pipe_tags(name)
    dest_line = tag_line(dest_tags)
    dest_src = src_for_tag_line(dest_line)

    stream = (
        engine.spark.readStream.schema(LOG_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(engine.logs_path)
    )
    # never re-consume our own output (or other pipes' output)
    stream = stream.where(F.coalesce(F.col("tags").getItem("logrange.pipe"), F.lit("")) == "")
    if source is not None:
        stream = stream.where(compile_tags(source))
    if where is not None:
        stream = stream.where(compile_where(where))

    # source-tag enrichment: tags become fields on the piped record
    # (reference: pkg/pipe/worker.go:67-69). On key collision the record's
    # own field wins — the reference's field lookup is first-match and
    # record fields are concatenated first (pkg/model/field/field.go:143-157)
    # — so colliding tag keys are filtered out rather than letting
    # map_concat throw DUPLICATE_MAP_KEY under the default
    # spark.sql.mapKeyDedupPolicy=EXCEPTION.
    enriched = (
        stream.withColumn(
            "fields",
            F.map_concat(
                F.coalesce(F.col("fields"), F.expr("map()")),
                F.map_filter(
                    F.coalesce(F.col("tags"), F.expr("map()")),
                    lambda k, _: ~F.map_contains_key(
                        F.coalesce(F.col("fields"), F.expr("map()")), k
                    ),
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

    checkpoint = os.path.join(engine.pipes_dir, "checkpoints", name)

    def sink(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        engine.append_df(batch_df)

    return (
        enriched.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime="1 second")
        .foreachBatch(sink)
        .start()
    )
