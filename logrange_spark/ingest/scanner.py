"""File scanner / collector: discover files, parse, derive tags from paths.

The reference collector (pkg/scanner/scanner.go:50-150, schema.go:28-112)
tails files matched by glob "schemas", tracks offsets, and assigns tags +
fields from path match groups. Spark-first:

- discovery + offset tracking  → the file streaming source (exactly-once
  via checkpoint; new files picked up per micro-batch)
- parsing                      → the parsers in .parsers (pure Columns)
- path-derived tags            → ``input_file_name()`` + ``regexp_extract``

``ScanSchema.path_regex`` uses Python-style named groups
``(?P<name>...)``; each group becomes a tag on every record from that
file. At scale this is the natural layout: one logical source per
path-group tag set, flowing into the store's src-partitioned table.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .parsers import PARSERS


@dataclass(frozen=True)
class ScanSchema:
    """One collector schema: which files, how to parse, what to tag."""

    path_glob: str
    parser: str = "text"  # pure | text | k8json | logfmt
    path_regex: str | None = None  # Python named groups → tags
    static_tags: dict[str, str] = field(default_factory=dict)
    parser_options: dict = field(default_factory=dict)
    # files whose path matches any of these regexes are skipped
    # (reference: ExcludeMatchers, pkg/scanner/config.go:28,110-113)
    exclude_regexes: tuple[str, ...] = ()


def _java_regex_and_groups(path_regex: str) -> tuple[str, list[str]]:
    """Python ``(?P<name>...)`` → plain-group Java regex + ordered names."""
    names = list(re.compile(path_regex).groupindex)
    java = re.sub(r"\(\?P<([A-Za-z_][A-Za-z0-9_]*)>", "(", path_regex)
    return java, names


def _tags_from_path(schema: ScanSchema) -> Column:
    entries: list[Column] = []
    for k, v in sorted(schema.static_tags.items()):
        entries += [F.lit(k), F.lit(v)]
    if schema.path_regex:
        java, names = _java_regex_and_groups(schema.path_regex)
        ordered = list(re.compile(schema.path_regex).groupindex.items())
        for name, idx in ordered:
            entries += [F.lit(name), F.regexp_extract(F.input_file_name(), java, idx)]
    if not entries:
        return F.expr("map()").cast("map<string,string>")
    return F.create_map(*entries)


def tag_line_col(tags: Column) -> Column:
    """Canonical sorted ``k=v,...`` line as a Column (mirrors
    model.tags.tag_line quoting)."""
    return F.array_join(
        F.transform(
            F.array_sort(F.map_keys(tags)),
            lambda k: F.concat(
                k,
                F.lit("="),
                F.when(
                    tags[k].contains("=") | tags[k].contains(",") | (tags[k] == ""),
                    F.concat(F.lit('"'), F.replace(tags[k], F.lit('"'), F.lit('\\"')), F.lit('"')),
                ).otherwise(tags[k]),
            ),
        ),
        ",",
    )


def scan(spark: SparkSession, schema: ScanSchema, streaming: bool = False) -> DataFrame:
    """Read files per the schema → canonical log frame (ts, msg, fields,
    tags, tag_line, src, seq). In streaming mode seq is provisional —
    Engine.append_df reassigns it from the persisted high-water mark."""
    parse = PARSERS[schema.parser]
    reader = spark.readStream if streaming else spark.read
    raw = reader.text(schema.path_glob)
    for ex in schema.exclude_regexes:
        re.compile(ex)  # fail fast on bad patterns (config.go:110-113)
        raw = raw.where(~F.input_file_name().rlike(ex))
    parsed = parse(raw, **schema.parser_options)
    tags = _tags_from_path(schema)
    out = (
        parsed.withColumn("tags", tags)
        .withColumn("tag_line", tag_line_col(F.col("tags")))
        .withColumn("src", F.substring(F.md5(F.col("tag_line")), 1, 16))
        .withColumn("seq", F.monotonically_increasing_id())
    )
    return out.select("ts", "msg", "fields", "tags", "tag_line", "src", "seq")


def collect_into(engine, schema: ScanSchema, checkpoint: str | None = None,
                 streaming: bool = False):
    """Run a collector: scan files and append into the engine's log store.

    Batch mode ingests what exists now; streaming mode follows new files
    (the reference collector's tail behavior) with checkpointed offsets.
    """
    df = scan(engine.spark, schema, streaming=streaming)
    if not streaming:
        engine.append_df(df)
        return None
    import os

    cp = checkpoint or os.path.join(
        engine.root, "scanner-checkpoints", str(abs(hash(schema.path_glob)))
    )

    def sink(batch_df, _bid):
        if not batch_df.isEmpty():
            engine.append_df(batch_df)

    return (
        df.writeStream.outputMode("append")
        .option("checkpointLocation", cp)
        .trigger(processingTime="1 second")
        .foreachBatch(sink)
        .start()
    )
