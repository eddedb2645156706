"""CommonCrawl WARC / WET corpus sources.

Large-scale text pipelines (CCNet, C4, RefinedWeb) start from
CommonCrawl's WARC (raw HTTP captures) or WET (extracted plain text)
archives — ISO 28500 record framing: a ``WARC/1.x`` version line,
``Key: Value`` headers, a blank line, ``Content-Length`` body bytes,
then two blank lines. This module reads either format into a DataFrame
via Spark's ``binaryFile`` source plus an Arrow-batched ``mapInPandas``
record splitter.

100 TB shape: gzip members are not splittable in ANY engine, so the
file is the parallelism unit — exactly how CommonCrawl shards its dumps
(~1 GB per .warc.gz, 64k files per crawl); a 1000-executor cluster maps
files to tasks with no shuffle at all, and the parse emits only the
projected columns so a downstream ``select`` prunes at the Arrow
boundary. Bodies are sliced by ``Content-Length`` (never by delimiter
scanning), so binary payloads containing blank lines parse correctly.

Malformed tails: a record whose header block or body runs past the end
of the file is dropped and parsing of that FILE stops (the documented
behavior of a truncated .gz fetch); records already parsed are kept.

reference: no analogue (the reference ingests log streams; cf.
ingest/scanner.py for its file-collector surface). Part of the
beyond-reference training-data toolkit (SURVEY §2.8).
"""

from __future__ import annotations

import gzip
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WET_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("record_offset", T.LongType(), False),
        T.StructField("record_id", T.StringType(), True),
        T.StructField("target_uri", T.StringType(), True),
        T.StructField("warc_date", T.StringType(), True),
        T.StructField("digest", T.StringType(), True),
        T.StructField("content_length", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)

WARC_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("record_offset", T.LongType(), False),
        T.StructField("record_id", T.StringType(), True),
        T.StructField("target_uri", T.StringType(), True),
        T.StructField("warc_date", T.StringType(), True),
        T.StructField("http_status", T.IntegerType(), True),
        T.StructField(
            "http_headers", T.MapType(T.StringType(), T.StringType()), True
        ),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def _maybe_gunzip(data: bytes) -> bytes:
    """Transparently decompress gzip payloads (multi-member per RFC 1952
    — CommonCrawl writes one member per record in some vintages; Python's
    ``gzip.decompress`` concatenates members)."""
    if data[:2] == b"\x1f\x8b":
        return gzip.decompress(data)
    return data


def _iter_records(buf: bytes) -> Iterator[tuple[int, dict, bytes]]:
    """Yield (offset, headers, body) per WARC record; header keys are
    lower-cased. LF-only framing is tolerated alongside spec CRLF.
    Stops at the first malformed/truncated record."""
    i, n = 0, len(buf)
    while i < n:
        # skip inter-record blank lines (CR/LF bytes between records)
        while i < n and buf[i] in (0x0D, 0x0A):
            i += 1
        if i >= n:
            return
        if not buf.startswith(b"WARC/", i):
            return  # not record-aligned: malformed tail
        end = buf.find(b"\r\n\r\n", i)
        end_lf = buf.find(b"\n\n", i)
        if end == -1 or (end_lf != -1 and end_lf < end):
            end, sep = end_lf, 2
        else:
            sep = 4
        if end == -1:
            return  # truncated header block
        headers: dict[str, str] = {}
        for line in buf[i:end].decode("utf-8", errors="replace").splitlines()[1:]:
            k, _, v = line.partition(":")
            if _:
                headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            return
        body_start = end + sep
        if body_start + clen > n:
            return  # truncated body
        yield i, headers, buf[body_start : body_start + clen]
        i = body_start + clen


def _read_binary(
    spark: SparkSession, path: str, glob: str | None
) -> DataFrame:
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path).select("path", "content")


def _wet_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        out: list[tuple] = []
        for p, content in zip(pdf["path"], pdf["content"]):
            buf = _maybe_gunzip(bytes(content))
            for off, h, body in _iter_records(buf):
                if h.get("warc-type") != "conversion":
                    continue
                out.append(
                    (
                        p,
                        off,
                        h.get("warc-record-id"),
                        h.get("warc-target-uri"),
                        h.get("warc-date"),
                        h.get("warc-block-digest"),
                        len(body),
                        body.decode("utf-8", errors="replace"),
                    )
                )
        yield pd.DataFrame(out, columns=[f.name for f in WET_SCHEMA])


def read_wet(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """WET (extracted plain text) records as one row per document:
    (path, record_offset, record_id, target_uri, warc_date, digest,
    content_length, text). Only ``WARC-Type: conversion`` records yield
    rows (the per-file ``warcinfo`` preamble is skipped). ``text`` is
    UTF-8 with invalid bytes replaced — WET declares UTF-8 but crawls
    lie. ``record_offset`` is the byte offset in the DECOMPRESSED file,
    a stable per-file record id for downstream dedup keys."""
    return _read_binary(spark, path, glob).mapInPandas(
        _wet_batches, WET_SCHEMA
    )


# binaryFile's fixed schema — streaming file sources require it spelled
# out (batch infers it)
_BINARY_FILE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("modificationTime", T.TimestampType(), False),
        T.StructField("length", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
    ]
)


def read_wet_stream(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Streaming ``read_wet``: a Structured Streaming source over a
    landing directory of WET files — the continuous-crawl-ingestion
    shape. New files become new micro-batch rows through the SAME
    splitter as the batch reader (streamed output ≡ batch re-read of
    the same files, pinned by test); the file-source checkpoint gives
    exactly-once per FILE, the natural unit since a WET file is one
    crawl shard. Feed into the curation stream or any writeStream sink;
    use ``trigger(availableNow=True)`` for catch-up-then-stop runs."""
    reader = spark.readStream.format("binaryFile").schema(
        _BINARY_FILE_SCHEMA
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path).select("path", "content")
    return df.mapInPandas(_wet_batches, WET_SCHEMA)


def wet_documents(wet_df: DataFrame, id_salt: str = "") -> DataFrame:
    """(doc_id, url, text) in the shape every documents-table operator
    consumes (dedup / text / sampling / report), from ``read_wet`` or
    ``read_wet_stream`` output. ``doc_id = xxhash64(salt, path,
    record_offset)`` — a pure map-side column, deterministic across
    reruns and layouts, unique per crawl record (64-bit; collisions are
    birthday-negligible below ~10⁹ records — above that, dedup keys on
    content anyway and the (path, record_offset) pair remains the
    durable identity). Hash ids make keep-FIRST dedup's min-id rule an
    arbitrary-but-deterministic choice; keep-BEST
    (``cluster_representatives``) is unaffected."""
    return wet_df.select(
        F.xxhash64(
            F.lit(id_salt), F.col("path"), F.col("record_offset")
        ).alias("doc_id"),
        F.col("target_uri").alias("url"),
        "text",
    )


def read_warc(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """WARC ``response`` records with the HTTP envelope split off:
    (path, record_offset, record_id, target_uri, warc_date, http_status,
    http_headers, payload). The payload is the raw HTTP body bytes
    (HTML, image, ...) — feed binary media straight into the multimodal
    ops. Responses whose HTTP head doesn't parse yield null
    status/headers and the whole record body as payload."""

    def _split_http(body: bytes) -> tuple[int | None, dict | None, bytes]:
        for sep in (b"\r\n\r\n", b"\n\n"):
            cut = body.find(sep)
            if cut != -1:
                head = body[:cut].decode("latin-1", errors="replace")
                lines = head.splitlines()
                if lines and lines[0].upper().startswith("HTTP/"):
                    parts = lines[0].split(None, 2)
                    try:
                        status = int(parts[1])
                    except (IndexError, ValueError):
                        break
                    hdrs: dict[str, str] = {}
                    for line in lines[1:]:
                        k, colon, v = line.partition(":")
                        if colon:
                            hdrs[k.strip().lower()] = v.strip()
                    return status, hdrs, body[cut + len(sep) :]
                break
        return None, None, body

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: list[tuple] = []
            for p, content in zip(pdf["path"], pdf["content"]):
                buf = _maybe_gunzip(bytes(content))
                for off, h, body in _iter_records(buf):
                    if h.get("warc-type") != "response":
                        continue
                    status, hdrs, payload = _split_http(body)
                    out.append(
                        (
                            p,
                            off,
                            h.get("warc-record-id"),
                            h.get("warc-target-uri"),
                            h.get("warc-date"),
                            status,
                            hdrs,
                            payload,
                        )
                    )
            yield pd.DataFrame(out, columns=[f.name for f in WARC_SCHEMA])

    return _read_binary(spark, path, glob).mapInPandas(_batches, WARC_SCHEMA)
