"""Collector parser tests (golden-input style, mirroring the reference's
pkg/scanner/parser/*_test.go + testdata logs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logrange_spark.ingest.parsers import parse_k8json, parse_logfmt, parse_pure, parse_text
from logrange_spark.ingest.datedetect import detect_timestamp

NS = 10**9


def _lines(spark, lines):
    return spark.createDataFrame([(l,) for l in lines], "value string")


def test_pure(spark):
    df = parse_pure(_lines(spark, ["hello", "world"]))
    rows = df.collect()
    assert [r["msg"] for r in rows] == ["hello", "world"]
    assert all(r["ts"] > 0 for r in rows)
    assert all(r["fields"] == {} for r in rows)


K8S_LINES = [
    '{"log":"2019-02-01 15:40:11.841209 I | mvcc: store.index: compact 1056139\\n","stream":"stderr","time":"2019-02-01T15:40:11.841498496Z"}',
    '{"log":"hello world\\n","stream":"stdout","time":"2019-02-01T15:40:12.5Z"}',
]


def test_k8json(spark):
    rows = parse_k8json(_lines(spark, K8S_LINES)).collect()
    assert rows[0]["msg"].startswith("2019-02-01 15:40:11.841209")
    assert not rows[0]["msg"].endswith("\n")
    assert rows[0]["fields"] == {"stream": "stderr"}
    # ts from the envelope's time field (truncated to µs precision)
    assert rows[0]["ts"] == 1549035611841498 * 1000
    assert rows[1]["fields"] == {"stream": "stdout"}


def test_k8json_bad_line_falls_back(spark):
    rows = parse_k8json(_lines(spark, ["not json at all"])).collect()
    assert rows[0]["msg"] == "not json at all"
    assert rows[0]["ts"] > 0


def test_text_autodetect(spark):
    rows = parse_text(
        _lines(
            spark,
            [
                "2019-03-11 12:34:43 something happened",
                "2019-03-11T12:34:43.123 iso with millis",
                "no date in this line",
            ],
        )
    ).collect()
    assert rows[0]["ts"] == 1552307683 * NS
    assert rows[1]["ts"] == 1552307683 * NS + 123 * 10**6
    assert rows[2]["ts"] > 1700000000 * NS  # ingest-time fallback


def test_detect_timestamp_syslog(spark):
    df = _lines(spark, ["Mar 11 12:34:43 host prog: hi"]).select(
        detect_timestamp(F.col("value"), current_year=F.lit(2019)).alias("ts")
    )
    row = df.collect()[0]
    assert row["ts"] is not None
    assert row["ts"].month == 3 and row["ts"].second == 43


LOGFMT_LINES = [
    '{"log":"time=2019-02-01T15:40:11Z level=error msg=\\"oops happened\\" reqid=abc123\\n","stream":"stderr","time":"2019-02-01T15:40:12Z"}',
]


def test_logfmt(spark):
    rows = parse_logfmt(_lines(spark, LOGFMT_LINES)).collect()
    f = rows[0]["fields"]
    assert f["level"] == "error"
    assert f["msg"] == "oops happened"
    assert f["reqid"] == "abc123"
    assert f["stream"] == "stderr"
    # time field overrides the envelope time
    assert rows[0]["ts"] == 1549035611 * NS


def test_logfmt_field_selection(spark):
    rows = parse_logfmt(_lines(spark, LOGFMT_LINES), fields=["level"]).collect()
    assert set(rows[0]["fields"]) == {"level", "stream"}


def test_logfmt_stream_key_collision(spark):
    """A logfmt body containing its own ``stream=`` key must not crash
    map_concat (DUPLICATE_MAP_KEY) — the body's key wins, first-match
    semantics (reference: pkg/model/field/field.go:143-157)."""
    line = '{"log":"level=info stream=ingest msg=ok\\n","stream":"stderr","time":"2019-02-01T15:40:12Z"}'
    rows = parse_logfmt(_lines(spark, [line])).collect()
    f = rows[0]["fields"]
    assert f["stream"] == "ingest"  # body value, not the envelope's stderr
    assert f["level"] == "info"


# ----------------------------------------------------- WARC / WET sources


def _wet_bytes(records: list[tuple[str, str]], crlf: bool = True) -> bytes:
    """Build a spec-shaped WET file: warcinfo preamble + one conversion
    record per (uri, text)."""
    nl = "\r\n" if crlf else "\n"
    info = "software: test"
    buf = (
        f"WARC/1.0{nl}WARC-Type: warcinfo{nl}"
        f"Content-Length: {len(info.encode())}{nl}{nl}{info}{nl}{nl}"
    ).encode("utf-8")
    for k, (uri, text) in enumerate(records):
        body = text.encode("utf-8")  # byte-accurate length for unicode
        buf += (
            f"WARC/1.0{nl}WARC-Type: conversion{nl}"
            f"WARC-Target-URI: {uri}{nl}"
            f"WARC-Date: 2020-01-0{k + 1}T00:00:00Z{nl}"
            f"WARC-Record-ID: <urn:uuid:rec-{k}>{nl}"
            f"WARC-Block-Digest: sha1:D{k}{nl}"
            f"Content-Length: {len(body)}{nl}{nl}"
        ).encode("utf-8") + body + (nl + nl).encode()
    return buf


def test_read_wet_plain_gzip_and_lf(spark, tmp_path):
    """WET records parse identically from plain, gzip, and LF-framed
    files; warcinfo is skipped; unicode lengths are byte-accurate."""
    import gzip as _gz

    from logrange_spark.ingest import wet

    recs = [
        ("http://a.example/x", "hello world\n\nsecond paragraph"),
        ("http://b.example/y", "café — ünïcode § text"),
        ("http://c.example/z", ""),
    ]
    raw = _wet_bytes(recs)
    (tmp_path / "f1.wet").write_bytes(raw)
    (tmp_path / "f2.wet.gz").write_bytes(_gz.compress(raw))
    (tmp_path / "f3.wet").write_bytes(_wet_bytes(recs, crlf=False))
    df = wet.read_wet(spark, str(tmp_path), glob="*.wet*")
    rows = df.collect()
    assert len(rows) == 9  # 3 records x 3 files, no warcinfo
    by_file: dict[str, list] = {}
    for r in rows:
        by_file.setdefault(r["path"].rsplit("/", 1)[-1], []).append(r)
    for fname, rs in by_file.items():
        got = sorted((r["target_uri"], r["text"]) for r in rs)
        assert got == sorted(recs), fname
        for r in rs:
            assert r["content_length"] == len(r["text"].encode("utf-8"))
            assert r["record_id"].startswith("<urn:uuid:rec-")
            assert r["digest"].startswith("sha1:D")
            assert r["warc_date"].startswith("2020-01-0")
    # plain and gzip variants agree on decompressed offsets
    offs = {f: sorted(r["record_offset"] for r in rs)
            for f, rs in by_file.items()}
    assert offs["f1.wet"] == offs["f2.wet.gz"]


def test_read_wet_truncated_tail_keeps_prefix(spark, tmp_path):
    from logrange_spark.ingest import wet

    recs = [("http://a/1", "first record"), ("http://a/2", "second record")]
    raw = _wet_bytes(recs)
    (tmp_path / "t.wet").write_bytes(raw[:-8])  # cut into the LAST body
    rows = wet.read_wet(spark, str(tmp_path)).collect()
    assert [r["target_uri"] for r in rows] == ["http://a/1"]


def test_read_warc_response_http_split(spark, tmp_path):
    """WARC response records: HTTP head parses to status+headers, the
    payload is byte-exact even when it CONTAINS blank lines (framing is
    Content-Length, not delimiter scanning); warcinfo/request records
    and an unparseable HTTP head are handled."""
    from logrange_spark.ingest import wet

    payload = b"\x89PNG\r\n\r\n<fake binary with blank lines>\r\n\r\nmore"
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: image/png\r\n"
            b"X-Test: yes\r\n\r\n" + payload)
    nohttp = b"not an http response at all"
    buf = b""
    for wtype, uri, body in [
        ("warcinfo", None, b"software: t"),
        ("request", "http://a/img", b"GET /img HTTP/1.1\r\n\r\n"),
        ("response", "http://a/img", http),
        ("response", "http://a/raw", nohttp),
    ]:
        hdr = f"WARC/1.0\r\nWARC-Type: {wtype}\r\n"
        if uri:
            hdr += f"WARC-Target-URI: {uri}\r\n"
        hdr += f"Content-Length: {len(body)}\r\n\r\n"
        buf += hdr.encode() + body + b"\r\n\r\n"
    (tmp_path / "x.warc").write_bytes(buf)
    rows = {r["target_uri"]: r
            for r in wet.read_warc(spark, str(tmp_path)).collect()}
    assert set(rows) == {"http://a/img", "http://a/raw"}
    img = rows["http://a/img"]
    assert img["http_status"] == 200
    assert img["http_headers"]["content-type"] == "image/png"
    assert bytes(img["payload"]) == payload
    raw = rows["http://a/raw"]
    assert raw["http_status"] is None and raw["http_headers"] is None
    assert bytes(raw["payload"]) == nohttp


def test_read_wet_plan_is_shuffle_free(spark, tmp_path):
    """The WARC/WET sources are pure file-parallel map plans — zero
    Exchange; parallelism = file count, the unit CommonCrawl shards by."""
    from logrange_spark.ingest import wet

    (tmp_path / "p.wet").write_bytes(_wet_bytes([("http://a/1", "x")]))
    for df in (wet.read_wet(spark, str(tmp_path)),
               wet.read_warc(spark, str(tmp_path))):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


def test_read_wet_stream_matches_batch_and_is_incremental(spark, tmp_path):
    """Streaming WET ingestion: streamed records ≡ the batch reader on
    the same files, and a second availableNow pass over the same
    checkpoint picks up ONLY newly landed files (file-level
    exactly-once)."""
    from logrange_spark.ingest import wet

    land = tmp_path / "land"
    land.mkdir()
    ckpt = str(tmp_path / "ckpt")
    (land / "a.wet").write_bytes(_wet_bytes([("http://a/1", "first doc")]))
    (land / "b.wet").write_bytes(_wet_bytes([("http://b/1", "second doc"),
                                             ("http://b/2", "third doc")]))

    out = str(tmp_path / "out")

    def drain():
        q = (wet.read_wet_stream(spark, str(land))
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return {(r["target_uri"], r["text"], r["record_offset"])
                for r in spark.read.parquet(out).collect()}

    got1 = drain()
    batch = {(r["target_uri"], r["text"], r["record_offset"])
             for r in wet.read_wet(spark, str(land)).collect()}
    assert got1 == batch and len(got1) == 3
    # land a new file; same checkpoint → only its records are APPENDED
    (land / "c.wet").write_bytes(_wet_bytes([("http://c/1", "fourth doc")]))
    got2 = drain()
    assert {u for u, _, _ in got2 - got1} == {"http://c/1"}
    assert len(got2) == 4  # no re-ingestion of a/b


def test_wet_documents_bridge(spark, tmp_path):
    """WET output flows into the documents-table operator family: ids
    are deterministic, unique, layout-independent; exact dedup and the
    data card run unchanged on the bridged frame."""
    from logrange_spark.ingest import wet
    from logrange_spark.ops import dedup, report

    recs = [("http://a/1", "same text here"), ("http://a/2", "same text here"),
            ("http://a/3", "another doc entirely")]
    (tmp_path / "d.wet").write_bytes(_wet_bytes(recs))
    docs = wet.wet_documents(wet.read_wet(spark, str(tmp_path)))
    rows = docs.collect()
    assert len(rows) == 3 and len({r["doc_id"] for r in rows}) == 3
    again = {r["url"]: r["doc_id"]
             for r in wet.wet_documents(
                 wet.read_wet(spark, str(tmp_path)).repartition(5)).collect()}
    assert again == {r["url"]: r["doc_id"] for r in rows}  # layout-free
    dups = dedup.exact_duplicates(docs, "doc_id", F.col("text")).collect()
    assert len(dups) == 1 and dups[0]["dup_count"] == 2
    card = report.corpus_report(docs).collect()[0]
    assert card["n_docs"] == 3 and card["distinct_docs"] == 2


def test_split_http_lf_head_crlf_body(spark, tmp_path):
    """Regression (reference of truth: earliest-separator rule of
    _iter_records): an LF-framed HTTP head whose BODY contains CRLFCRLF
    must cut at the LF pair ending the head — the old CRLF-first rule
    cut inside the body, leaking body bytes into the header dict and
    truncating the payload prefix."""
    from logrange_spark.ingest import wet

    payload = b"prefix bytes\r\n\r\nrest of body"
    http = b"HTTP/1.1 200 OK\nContent-Type: text/html\n\n" + payload
    status, hdrs, got = wet._split_http(http)
    assert status == 200
    assert hdrs == {"content-type": "text/html"}
    assert got == payload

    # and end-to-end through read_warc
    hdr = (f"WARC/1.0\r\nWARC-Type: response\r\n"
           f"WARC-Target-URI: http://lf.example/\r\n"
           f"Content-Length: {len(http)}\r\n\r\n").encode()
    (tmp_path / "lf.warc").write_bytes(hdr + http + b"\r\n\r\n")
    row = wet.read_warc(spark, str(tmp_path)).collect()[0]
    assert row["http_status"] == 200
    assert bytes(row["payload"]) == payload


def test_record_frames_chunked_emission(monkeypatch):
    """_record_frames flushes every _EMIT_ROWS records instead of
    accumulating a whole archive into one frame — the per-task memory
    bound. Union of the chunked frames == eager parse."""
    import pandas as pd

    from logrange_spark.ingest import wet

    recs = [(f"http://e/{k}", f"doc number {k}") for k in range(10)]
    raw = _wet_bytes(recs)
    monkeypatch.setattr(wet, "_EMIT_ROWS", 3)
    frames = list(wet._wet_batches(iter([
        pd.DataFrame({"path": ["m.wet"], "content": [raw]})])))
    assert [len(f) for f in frames] == [3, 3, 3, 1]
    got = pd.concat(frames, ignore_index=True)
    assert list(got["target_uri"]) == [u for u, _ in recs]
    assert list(got["text"]) == [t for _, t in recs]


def test_iter_records_stream_incremental_gzip():
    """The streaming iterator over an incrementally-decoded multi-member
    gzip stream yields byte-identical records (and decompressed-stream
    offsets) to the in-memory iterator over the concatenated plain
    bytes."""
    import gzip as _gz
    import io

    from logrange_spark.ingest import wet

    recs = [(f"http://g/{k}", "x" * (1000 * (k + 1))) for k in range(5)]
    raw = _wet_bytes(recs)
    # one member per record-ish chunk (CommonCrawl vintage framing)
    cut = len(raw) // 2
    multi = _gz.compress(raw[:cut]) + _gz.compress(raw[cut:])
    eager = list(wet._iter_records(raw))
    streamed = list(wet._iter_records_stream(
        wet._open_stream(multi)))
    assert [(o, h, b) for o, h, b in streamed] == eager
    # plain (non-gz) path through _open_stream too
    assert list(wet._iter_records_stream(wet._open_stream(raw))) == eager
