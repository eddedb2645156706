"""LQL grammar acceptance tests.

Modeled on the reference's parser test table (pkg/lql/parser_test.go:32-70):
a table of statements that must parse / must fail.
"""

from __future__ import annotations

import pytest

from logrange_spark.lql import ast
from logrange_spark.lql.lexer import parse_size
from logrange_spark.lql.parser import parse_lql, parse_where

NOW = 1_700_000_000_000_000_000

OK_STATEMENTS = [
    "SELECT",
    "select limit 10",
    "SELECT LIMIT 10",
    "SELECT OFFSET 2 LIMIT 3",
    "SELECT FROM {name=app1}",
    "SELECT FROM {name=app1,ns=system}",
    'SELECT FROM {file="/var/log/syslog",host=h-01}',
    "SELECT FROM name=app1 OR ns=system",
    "SELECT FROM name LIKE 'ap*'",
    "SELECT FROM UPPER(name) = 'APP1'",
    'SELECT RANGE "-1d"',
    "SELECT RANGE [\"-1h\":\"-0.5h\"]",
    'SELECT RANGE [:"2019-03-11 12:34:43"]',
    "SELECT WHERE msg CONTAINS 'ERROR'",
    "SELECT WHERE msg PREFIX 'abc'",
    "SELECT WHERE msg SUFFIX 'def'",
    "SELECT WHERE msg LIKE 'a*c'",
    "SELECT WHERE fields:level = 'error'",
    "SELECT WHERE fields:level != 'x' AND fields:n >= '10'",
    "SELECT WHERE UPPER(fields:level) = 'ERROR'",
    "SELECT WHERE LOWER(UPPER(msg)) CONTAINS 'err'",
    "SELECT WHERE (NOT (fields:a='1' AND fields:b=c)) OR NOT (fields:x=1)",
    "SELECT 'fmt {msg}' FROM {name=app1} RANGE \"-1h\" WHERE msg CONTAINS 'a' POSITION head OFFSET 10 LIMIT 100",
    "SELECT POSITION tail",
    "SELECT POSITION TAIL",
    "SHOW PARTITIONS",
    "SHOW PARTITIONS ns=system LIMIT 5 OFFSET 1".replace("LIMIT 5 OFFSET 1", "OFFSET 1 LIMIT 5"),
    "SHOW PARTITIONS {ns=system}",
    "SHOW PIPES",
    "DESCRIBE PARTITION {name=app1}",
    "DESCRIBE PIPE mypipe",
    "CREATE PIPE errs FROM {name=app1} WHERE msg CONTAINS 'ERROR'",
    "CREATE PIPE p2",
    "DELETE PIPE errs",
    "TRUNCATE",
    "TRUNCATE DRYRUN",
    "TRUNCATE {name=app1}",
    "TRUNCATE name=app1 MAXSIZE 10m",
    'TRUNCATE MINSIZE 1g MAXSIZE 10g BEFORE "-1d" MAXDBSIZE 100g',
]

BAD_STATEMENTS = [
    "",
    "FOO",
    "SELECT WHERE msg ~ 'x'",
    "SELECT WHERE bogus = 'x'",  # parses, fails at compile — see compiler test
    "SELECT RANGE",
    "SELECT RANGE [\"-1h\"",
    "SELECT LIMIT",
    "DESCRIBE",
    "CREATE",
    "DELETE PIPE",
    "SELECT WHERE (msg CONTAINS 'a'",
]


@pytest.mark.parametrize("stmt", OK_STATEMENTS)
def test_parses(stmt):
    parse_lql(stmt, NOW)


@pytest.mark.parametrize("stmt", [s for s in BAD_STATEMENTS if "bogus" not in s])
def test_rejects(stmt):
    with pytest.raises(Exception):
        parse_lql(stmt, NOW)


def test_select_shape():
    s = parse_lql(
        "SELECT 'f {msg}' FROM {name=app1} RANGE \"-1h\" WHERE msg CONTAINS 'a' OFFSET 5 LIMIT 7",
        NOW,
    )
    assert isinstance(s, ast.Select)
    assert s.format == "f {msg}"
    assert s.source.tags == {"name": "app1"}
    assert s.range.min_ns == NOW - 3_600_000_000_000
    assert s.range.max_ns is None
    assert s.offset == 5 and s.limit == 7


def test_range_forms():
    s = parse_lql('SELECT RANGE ["-2h":"-1h"]', NOW)
    assert s.range.min_ns == NOW - 2 * 3_600_000_000_000
    assert s.range.max_ns == NOW - 3_600_000_000_000
    s = parse_lql('SELECT RANGE [:"-1h"]', NOW)
    assert s.range.min_ns is None
    assert s.range.max_ns == NOW - 3_600_000_000_000


def test_where_tree():
    e = parse_where("fields:a='1' AND fields:b='2' OR NOT msg CONTAINS 'x'", NOW)
    assert isinstance(e, ast.Or)
    assert isinstance(e.children[0], ast.And)
    assert isinstance(e.children[1], ast.Not)


def test_nested_funcs():
    e = parse_where("LOWER(UPPER(msg)) CONTAINS 'err'", NOW)
    assert e.ident.funcs == ("LOWER", "UPPER")
    assert e.ident.operand == "msg"


def test_quoted_tag_values():
    s = parse_lql('SELECT FROM {name="a,b",x=y}', NOW)
    assert s.source.tags == {"name": "a,b", "x": "y"}


def test_sizes():
    assert parse_size("512") == 512
    assert parse_size("10k") == 10_000
    assert parse_size("10kib") == 10_240
    assert parse_size("1.5m") == 1_500_000
    assert parse_size("2GiB") == 2 * 1024**3


def test_truncate_shape():
    t = parse_lql('TRUNCATE DRYRUN name=app1 MAXSIZE 10m BEFORE "-1d"', NOW)
    assert t.dry_run and t.max_size == 10_000_000
    assert t.before_ns == NOW - 24 * 3_600_000_000_000
