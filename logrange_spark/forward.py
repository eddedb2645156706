"""Forwarder: continuous export of query results to external sinks.

The reference forwarder (pkg/forwarder/forwarder.go, worker.go) runs a
pull loop per configured pipe — cursor position → api.Select → sink →
persist position. Spark-first, that whole loop is one checkpointed
Structured Streaming query per forwarder job:

    readStream(logs) → tag/WHERE filter → format template → foreachBatch sink

Sinks mirror pkg/forwarder/sink: syslog (TCP, RFC3164 framing with
facility/severity/tag templates — syslog.go:76-98,133-201) and stdout
(stdout.go). Positions/retries/backoff are Spark's checkpoint + trigger
machinery.
"""

from __future__ import annotations

import os
import socket
from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .compiler.formatter import compile_format
from .compiler.select import compile_select
from .lql import ast
from .lql.parser import parse_lql


@dataclass
class SyslogConfig:
    host: str = "127.0.0.1"
    port: int = 514
    facility: int = 16  # local0
    severity: int = 6  # info
    hostname: str = "logrange-spark"
    tag: str = "logrange"


def format_lines(df: DataFrame, template: str) -> DataFrame:
    """Apply a P1 format template → single ``line`` column."""
    return df.select(compile_format(template).alias("line"))


def _rfc3164_header(cfg: SyslogConfig) -> str:
    pri = cfg.facility * 8 + cfg.severity
    ts = datetime.now(timezone.utc).strftime("%b %d %H:%M:%S")
    return f"<{pri}>{ts} {cfg.hostname} {cfg.tag}: "


class SyslogSink:
    """foreachBatch sink writing RFC3164 lines over TCP.

    One connection per batch per partition; partition-local iteration so
    nothing funnels through the driver.
    """

    def __init__(self, cfg: SyslogConfig):
        self.cfg = cfg

    def __call__(self, batch_df: DataFrame, _batch_id: int) -> None:
        cfg = self.cfg
        header = _rfc3164_header(cfg)

        def write_partition(rows):
            sock = socket.create_connection((cfg.host, cfg.port), timeout=10)
            try:
                for r in rows:
                    line = r["line"] if "line" in r else str(r[0])
                    sock.sendall((header + line + "\n").encode("utf-8"))
            finally:
                sock.close()

        batch_df.foreachPartition(write_partition)


class ConsoleSink:
    def __call__(self, batch_df: DataFrame, _batch_id: int) -> None:
        for r in batch_df.collect():
            print(r["line"] if "line" in r else str(r[0]))


def start_forwarder(
    engine,
    name: str,
    lql: str,
    sink,
    template: str = "{vars} - {msg}",
    checkpoint: str | None = None,
):
    """Start a continuous forwarder for a SELECT query.

    The SELECT's FROM/WHERE compile onto the stream; POSITION/OFFSET/LIMIT
    are cursor concepts and are ignored in follow mode (the checkpoint IS
    the position, mirroring forwarder.go's saved cursor state).
    """
    stmt = parse_lql(lql)
    if not isinstance(stmt, ast.Select):
        raise ValueError("forwarder expects a SELECT query")
    template = stmt.format or template

    from .model.schema import LOG_SCHEMA
    from .compiler.tagexpr import compile_tags
    from .compiler.whereexpr import compile_where

    stream = engine.spark.readStream.schema(LOG_SCHEMA).parquet(engine.logs_path)
    if stmt.source is not None:
        stream = stream.where(compile_tags(stmt.source))
    if stmt.where is not None:
        stream = stream.where(compile_where(stmt.where))
    if stmt.range is not None:
        if stmt.range.min_ns is not None:
            stream = stream.where(F.col("ts") >= stmt.range.min_ns)
        if stmt.range.max_ns is not None:
            stream = stream.where(F.col("ts") <= stmt.range.max_ns)

    lines = stream.select(compile_format(template).alias("line"))
    cp = checkpoint or os.path.join(engine.root, "forwarder-checkpoints", name)
    return (
        lines.writeStream.outputMode("append")
        .option("checkpointLocation", cp)
        .trigger(processingTime="1 second")
        .foreachBatch(sink)
        .start()
    )
