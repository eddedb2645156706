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
