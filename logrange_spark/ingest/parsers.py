"""Collector parsers as DataFrame transforms.

The reference ships four parsers (registry: pkg/scanner/parser/parser.go):

- ``pure``   — one line = one record, ingest time (pure_parser.go)
- ``text``   — line records + timestamp auto-detection (line_parser.go)
- ``k8json`` — k8s JSON log lines {log, stream, time} (k8s_parser.go:66-82)
- ``logfmt`` — k8json envelope + logfmt-decoded fields (logfmt_parser.go:80-112)

Each transform takes a DataFrame with a raw ``value`` string column (what
``spark.read.text`` / ``readStream.text`` produce) and returns the
canonical (ts, msg, fields) shape ready for the log store. Everything is
built-in Column expressions — the parsers run identically in batch and
Structured Streaming and never leave the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .datedetect import detect_timestamp

_NS = 1_000_000_000


def _ns(ts: Column) -> Column:
    # TimestampType carries µs; widen to the store's ns longs
    return (F.unix_micros(ts) * 1000).cast("long")


def _ingest_ns() -> Column:
    return _ns(F.current_timestamp())


def parse_pure(df: DataFrame, value_col: str = "value") -> DataFrame:
    """One line = one record; event time = ingest time."""
    return df.select(
        _ingest_ns().alias("ts"),
        F.col(value_col).alias("msg"),
        F.expr("map()").cast("map<string,string>").alias("fields"),
    )


def parse_text(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Line records with timestamp auto-detection; lines with no
    recognizable date fall back to ingest time (streaming-safe; batch
    backfills can apply datedetect.with_sticky_fallback instead)."""
    detected = detect_timestamp(F.col(value_col))
    return df.select(
        F.coalesce(_ns(detected), _ingest_ns()).alias("ts"),
        F.col(value_col).alias("msg"),
        F.expr("map()").cast("map<string,string>").alias("fields"),
    )


_K8S_SCHEMA = "log STRING, stream STRING, time STRING"


def parse_k8json(df: DataFrame, value_col: str = "value") -> DataFrame:
    """k8s JSON log lines: msg=log (trailing newline stripped),
    fields.stream=stream, ts=time (RFC3339 with fractional seconds)."""
    j = F.from_json(F.col(value_col), _K8S_SCHEMA)
    ts = F.try_to_timestamp(j["time"])
    return df.select(
        F.coalesce(_ns(ts), _ingest_ns()).alias("ts"),
        F.regexp_replace(F.coalesce(j["log"], F.col(value_col)), r"\n$", "").alias("msg"),
        F.when(
            j["stream"].isNotNull(), F.create_map(F.lit("stream"), j["stream"])
        ).otherwise(F.expr("map()").cast("map<string,string>")).alias("fields"),
    )


def _logfmt_map(msg: Column) -> Column:
    """Decode ``k=v k2="quoted v"`` pairs into a map.

    Quoted values may contain spaces; the tokenizer splits on spaces
    outside quotes via regexp extraction of k=v units.
    """
    pairs = F.regexp_extract_all(
        msg, F.lit(r'([A-Za-z0-9_.\-]+)=("[^"]*"|[^" ]*)'), F.lit(0)
    )
    return F.map_from_entries(
        F.transform(
            pairs,
            lambda kv: F.struct(
                F.regexp_extract(kv, r'^([^=]+)=', 1).alias("key"),
                F.regexp_replace(
                    F.regexp_extract(kv, r'^[^=]+=(.*)$', 1), r'^"|"$', ""
                ).alias("value"),
            ),
        )
    )


def parse_logfmt(
    df: DataFrame,
    value_col: str = "value",
    fields: list[str] | None = None,
    time_field: str = "time",
) -> DataFrame:
    """k8json envelope whose ``log`` body is logfmt; selected keys become
    record fields; an optional ``time`` key overrides the timestamp
    (reference: logfmt_parser.go:80-112)."""
    j = F.from_json(F.col(value_col), _K8S_SCHEMA)
    body = F.regexp_replace(F.coalesce(j["log"], F.col(value_col)), r"\n$", "")
    kv = _logfmt_map(body)
    ts_override = F.try_to_timestamp(kv[time_field])
    ts = F.coalesce(_ns(ts_override), _ns(F.try_to_timestamp(j["time"])), _ingest_ns())
    if fields is not None:
        wanted = F.array(*[F.lit(f) for f in fields])
        kv = F.map_filter(kv, lambda k, _: F.array_contains(wanted, k))
    # logfmt body keys win over the k8s envelope's stream on collision
    # (a body containing ``stream=...`` must not crash map_concat under
    # mapKeyDedupPolicy=EXCEPTION; reference fields are first-match,
    # pkg/model/field/field.go:143-157)
    fields_col = F.when(
        j["stream"].isNotNull() & ~F.map_contains_key(kv, F.lit("stream")),
        F.map_concat(kv, F.create_map(F.lit("stream"), j["stream"])),
    ).otherwise(kv)
    return df.select(ts.alias("ts"), body.alias("msg"), fields_col.alias("fields"))


PARSERS = {
    "pure": parse_pure,
    "text": parse_text,
    "k8json": parse_k8json,
    "logfmt": parse_logfmt,
}
