"""Forwarder: continuous export of query results to external sinks.

The reference forwarder (pkg/forwarder/forwarder.go, worker.go) runs a
pull loop per configured pipe — cursor position → api.Select → sink →
persist position. Spark-first, that whole loop is one checkpointed
Structured Streaming query per forwarder job:

    readStream(logs) → tag/WHERE filter → format template → foreachBatch sink

Sinks mirror pkg/forwarder/sink: syslog over tcp/udp/tls with optional
root-CA (pkg/syslog/syslog.go:38-40,128-147, config.go:24-78), RFC3164
or the reference's RFC5424 framing (pkg/syslog/message.go:43-56) with
newline replacement and line-length truncation, and stdout (stdout.go).
Positions/retries/backoff are Spark's checkpoint + trigger machinery.
"""

from __future__ import annotations

import os
import socket
import ssl
from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .compiler.formatter import compile_format
from .compiler.select import compile_select
from .lql import ast
from .lql.parser import parse_lql

PROTO_TCP = "tcp"
PROTO_UDP = "udp"

# UDP payload hard ceiling is 65507 bytes; clamp below it so an oversized
# line truncates explicitly instead of raising EMSGSIZE mid-batch
_UDP_MAX_BYTES = 65000
PROTO_TLS = "tls"


@dataclass
class SyslogConfig:
    host: str = "127.0.0.1"
    port: int = 514
    facility: int = 16  # local0
    severity: int = 6  # info
    hostname: str = "logrange-spark"
    tag: str = "logrange"
    # transport (reference: pkg/syslog/config.go:24-43)
    protocol: str = PROTO_TCP  # tcp | udp | tls
    root_ca_file: str = ""  # PEM chain for tls; system store when empty
    connect_timeout_s: float = 5.0
    write_timeout_s: float = 5.0
    # framing (reference: pkg/syslog/message.go:43-56)
    framing: str = "rfc3164"  # rfc3164 | rfc5424
    replace_newline: bool = False
    line_len_limit: int = 1024

    def check(self) -> None:
        if self.protocol not in (PROTO_TCP, PROTO_UDP, PROTO_TLS):
            raise ValueError(f"unknown protocol={self.protocol!r}")
        if self.protocol != PROTO_TLS and self.root_ca_file:
            raise ValueError("root_ca_file requires protocol='tls'")


def _open_conn(cfg: SyslogConfig) -> socket.socket:
    """Dial the configured transport (syslog.go:128-147)."""
    if cfg.protocol == PROTO_UDP:
        sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        sock.connect((cfg.host, cfg.port))
        return sock
    sock = socket.create_connection((cfg.host, cfg.port), timeout=cfg.connect_timeout_s)
    if cfg.protocol == PROTO_TLS:
        # a private CA replaces the trust roots but hostname verification
        # stays ON — any-cert-from-this-CA must not impersonate the
        # configured endpoint (Go's tls.Config{RootCAs} behaves the same)
        ctx = ssl.create_default_context(cafile=cfg.root_ca_file or None)
        sock = ctx.wrap_socket(sock, server_hostname=cfg.host)
    sock.settimeout(cfg.write_timeout_s)
    return sock


def format_lines(df: DataFrame, template: str) -> DataFrame:
    """Apply a P1 format template → single ``line`` column."""
    return df.select(compile_format(template).alias("line"))


def _header(cfg: SyslogConfig) -> str:
    pri = cfg.facility * 8 + cfg.severity
    now = datetime.now(timezone.utc)
    if cfg.framing == "rfc5424":
        # reference framing: "<pri>1 time host tag - - - msg"
        # (pkg/syslog/message.go:53-55)
        ts = now.strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z"
        return f"<{pri}>1 {ts} {cfg.hostname} {cfg.tag} - - - "
    ts = now.strftime("%b %d %H:%M:%S")
    return f"<{pri}>{ts} {cfg.hostname} {cfg.tag}: "


def _frame(line: str, cfg: SyslogConfig) -> str:
    """Newline handling + truncation (pkg/syslog/message.go:44-51)."""
    if cfg.replace_newline:
        line = line.replace("\n", "")
    if cfg.line_len_limit > 0 and len(line) > cfg.line_len_limit:
        line = line[: cfg.line_len_limit] + "... [truncated]"
    return line


class SyslogSink:
    """foreachBatch sink writing syslog lines over tcp, udp or tls.

    One connection per batch per partition; partition-local iteration so
    nothing funnels through the driver. UDP sends one datagram per line
    (standard syslog/UDP transport); tcp/tls use newline framing.
    """

    def __init__(self, cfg: SyslogConfig):
        cfg.check()
        self.cfg = cfg

    def __call__(self, batch_df: DataFrame, _batch_id: int) -> None:
        cfg = self.cfg
        header = _header(cfg)

        def write_partition(rows):
            sock = None
            try:
                for r in rows:
                    if sock is None:  # connect lazily: empty partitions don't dial
                        sock = _open_conn(cfg)
                    line = r["line"] if "line" in r else str(r[0])
                    payload = (header + _frame(line, cfg) + "\n").encode("utf-8")
                    if cfg.protocol == PROTO_UDP:
                        dgram = payload.rstrip(b"\n")
                        if len(dgram) > _UDP_MAX_BYTES:
                            # a >64k datagram raises EMSGSIZE and kills the
                            # whole batch; clamp with an explicit marker
                            # (sub-64k >MTU datagrams IP-fragment, as with
                            # every UDP syslog sender, the reference's too).
                            # decode(errors="ignore") drops a split
                            # multi-byte sequence at the cut so the
                            # datagram stays valid UTF-8
                            head = dgram[: _UDP_MAX_BYTES - 16].decode(
                                "utf-8", "ignore"
                            ).encode("utf-8")
                            dgram = head + b"...[truncated]"
                        sock.send(dgram)
                    else:
                        sock.sendall(payload)
            finally:
                if sock is not None:
                    sock.close()

        batch_df.foreachPartition(write_partition)


class ConsoleSink:
    def __call__(self, batch_df: DataFrame, _batch_id: int) -> None:
        for r in batch_df.collect():
            print(r["line"] if "line" in r else str(r[0]))


class ForwarderHandle:
    """Caller-facing handle for a running forwarder. The engine may
    restart the underlying streaming query (to widen the source glob
    when a new matching partition is born), so the handle — not the
    query object — is the stable reference. ``stop()`` unregisters the
    forwarder and stops the current query."""

    def __init__(self, engine, name: str):
        self._engine = engine
        self._name = name
        self.query = None
        self._stopped = __import__("threading").Event()

    def stop(self) -> None:
        eng = self._engine
        with eng._pipes_lock:
            eng._forwarders.pop(self._name, None)
            eng._forwarder_srcs.pop(self._name, None)
            q = self.query
        self._stopped.set()
        if q is not None:
            q.stop()

    def exception(self):
        return self.query.exception() if self.query is not None else None

    def awaitTermination(self, timeout: float | None = None) -> bool:
        """Block while the forwarder is registered. Unblocks ONLY when
        ``stop()`` is called on this handle (True) or the timeout expires
        (False) — not during engine-driven relaunches (glob widening,
        supervisor restart-on-error), and not on a query failure either,
        because under supervision a failure is transient: the supervisor
        relaunches it. Probing query state here would race the relaunch
        window where the old query is stopped but the new one hasn't been
        assigned yet."""
        return self._stopped.wait(timeout)


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

    Like pipes, the stream source is pruned to the FROM condition's
    matching partition directories (tag conditions are partition-
    constant), and the engine restarts the forwarder onto a widened glob
    when a new matching partition is born — see pipes/service.py for the
    no-loss argument. Delivery to the side-effecting sink is
    at-least-once across restarts, matching the reference forwarder.
    Returns a ForwarderHandle (stable across internal restarts).
    """
    stmt = parse_lql(lql)
    if not isinstance(stmt, ast.Select):
        raise ValueError("forwarder expects a SELECT query")
    template = stmt.format or template

    from .model.schema import STREAM_SCHEMA
    from .compiler.tagexpr import compile_tags
    from .compiler.whereexpr import compile_where

    def to_lines(df):
        if stmt.source is not None:
            df = df.where(compile_tags(stmt.source))
        if stmt.where is not None:
            df = df.where(compile_where(stmt.where))
        if stmt.range is not None:
            if stmt.range.min_ns is not None:
                df = df.where(F.col("ts") >= stmt.range.min_ns)
            if stmt.range.max_ns is not None:
                df = df.where(F.col("ts") <= stmt.range.max_ns)
        return df.select(compile_format(template).alias("line"))

    cp = checkpoint or os.path.join(engine.root, "forwarder-checkpoints", name)
    handle = ForwarderHandle(engine, name)

    def launch():
        # The streaming side is only the raw file reader; filters and the
        # format projection run on the batch DataFrame inside foreachBatch.
        # Two reasons (same as pipes/service.py): compile_format uses the
        # higher-order F.transform, which trips the Spark 4.1 empty-start
        # IncrementalExecution re-analysis bug when put in the STREAMING
        # plan; and the raw batch handoff renames columns positionally, so
        # the schema must be STREAM_SCHEMA (src last) and any by-name
        # logic must run batch-side.
        srcs = (
            engine.resolve_sources(stmt.source, cap=False)
            if stmt.source is not None
            else None
        )
        reader = engine.spark.readStream.schema(STREAM_SCHEMA)
        if srcs:
            reader = reader.option("basePath", engine.logs_path)
            path = f"{engine.logs_path}/src={{{','.join(srcs)}}}"
        else:
            path = engine.logs_path
        engine._forwarder_srcs[name] = set(srcs) if srcs is not None else None
        old = handle.query
        if old is not None:
            try:
                old.stop()
            except Exception:
                pass
        handle.query = (
            reader.parquet(path)
            .writeStream.outputMode("append")
            .option("checkpointLocation", cp)
            .trigger(processingTime="1 second")
            .foreachBatch(lambda batch_df, batch_id: sink(to_lines(batch_df), batch_id))
            .start()
        )
        return handle.query

    launch.handle = handle  # lets engine.stop_pipes find the live query
    with engine._pipes_lock:
        engine._forwarders[name] = (stmt.source, launch)
        launch()
    engine._ensure_pipe_supervisor()  # restart-on-error covers forwarders too
    return handle
