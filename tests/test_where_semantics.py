"""WHERE predicate truth tables over constructed log events.

Port of the reference's semantic tests (pkg/lql/whereeval_test.go model):
each case = (where string, expected matching ns) over a fixed event set.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logrange_spark.compiler.whereexpr import CompileError, compile_where
from logrange_spark.lql.parser import parse_where
from logrange_spark.model.schema import LOG_SCHEMA

NS = 10**9
BASE = 1_700_000_000 * NS

# (n, ts, msg, fields)
EVENTS = [
    (0, BASE + 0, "ERROR something failed", {"level": "error", "n": "10"}),
    (1, BASE + 1 * NS, "info all good", {"level": "info", "n": "9"}),
    (2, BASE + 2 * NS, "warn disk low /var/log", {"level": "warn"}),
    (3, BASE + 3 * NS, "plain text", {}),
    (4, BASE + 4 * NS, "ERROR again", {"level": "Error", "n": "100"}),
]


@pytest.fixture(scope="module")
def events_df(spark):
    rows = [
        (ts, msg, fields, {"name": "t"}, "name=t", "s1", n)
        for n, ts, msg, fields in EVENTS
    ]
    return spark.createDataFrame(rows, LOG_SCHEMA).cache()


CASES = [
    ("msg CONTAINS 'ERROR'", {0, 4}),
    ("msg PREFIX 'info'", {1}),
    ("msg SUFFIX 'text'", {3}),
    ("msg LIKE 'ERROR*'", {0, 4}),
    # glob '*' must not cross '/'
    ("msg LIKE 'warn*log'", set()),
    ("msg LIKE 'warn*/var/log'", {2}),
    ("UPPER(msg) CONTAINS 'ERROR'", {0, 4}),
    ("LOWER(UPPER(msg)) PREFIX 'error'", {0, 4}),
    ("fields:level = 'error'", {0}),
    ("fields:level != 'error'", {1, 2, 3, 4}),
    ("UPPER(fields:level) = 'ERROR'", {0, 4}),
    # lexicographic compare: "10" < "9", "100" < "9"; missing n reads "" < "9"
    ("fields:n < '9'", {0, 2, 3, 4}),
    ("fields:n >= '9'", {1}),
    # missing field reads as empty string
    ("fields:level = ''", {3}),
    ("fields:missing = ''", {0, 1, 2, 3, 4}),
    ("fields:level PREFIX 'e'", {0}),
    ("fields:level CONTAINS 'rro'", {0, 4}),
    ("fields:level LIKE '[eE]rror'", {0, 4}),
    (f"ts > '{BASE + NS}'", {2, 3, 4}),
    (f"ts >= '{BASE + NS}'", {1, 2, 3, 4}),
    (f"ts < '{BASE + NS}'", {0}),
    (f"ts <= '{BASE}'", {0}),
    ("msg CONTAINS 'ERROR' AND fields:n = '10'", {0}),
    ("msg CONTAINS 'ERROR' OR fields:level = 'warn'", {0, 2, 4}),
    ("NOT msg CONTAINS 'ERROR'", {1, 2, 3}),
    ("NOT (msg CONTAINS 'ERROR' OR fields:level = 'warn')", {1, 3}),
    ("(NOT (fields:level='error' AND fields:n='10')) OR NOT (fields:n='9')", {0, 1, 2, 3, 4}),
]


@pytest.mark.parametrize("where,expected", CASES)
def test_where(events_df, where, expected):
    expr = parse_where(where)
    got = {
        r["seq"] for r in events_df.where(compile_where(expr)).select("seq").collect()
    }
    assert got == expected, where


def test_bad_operand():
    with pytest.raises(CompileError):
        compile_where(parse_where("bogus = 'x'"))


def test_ts_contains_rejected():
    with pytest.raises(CompileError):
        compile_where(parse_where("ts CONTAINS '1'"))


def test_msg_equality_rejected():
    with pytest.raises(CompileError):
        compile_where(parse_where("msg = 'x'"))


def test_empty_where_is_true(events_df):
    assert events_df.where(compile_where(None)).count() == len(EVENTS)
