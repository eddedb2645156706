"""Tag condition truth tables (pkg/lql/tagseval_test.go model)."""

from __future__ import annotations

import pytest

from logrange_spark.compiler.tagexpr import compile_tags
from logrange_spark.lql.parser import parse_source

TAG_SETS = {
    "a1s": {"name": "app1", "ns": "system"},
    "a1d": {"name": "app1", "ns": "dev"},
    "a2s": {"name": "app2", "ns": "system"},
    "db": {"name": "db", "host": "h-01"},
    "fl": {"file": "/var/log/syslog", "host": "h-01"},
}

CASES = [
    ("{name=app1}", {"a1s", "a1d"}),
    ("{name=app1,ns=system}", {"a1s"}),
    ("{host=h-01}", {"db", "fl"}),
    ("name=app1", {"a1s", "a1d"}),
    ("name=app1 AND ns=dev", {"a1d"}),
    ("name=app1 OR ns=system", {"a1s", "a1d", "a2s"}),
    ("NOT name=app1", {"a2s", "db", "fl"}),
    ("name != app1", {"a2s", "db", "fl"}),
    ("name LIKE 'app*'", {"a1s", "a1d", "a2s"}),
    ("file LIKE '/var/log/*'", {"fl"}),
    # glob * does not cross '/', so a deeper path wouldn't match; prefix does
    ("file PREFIX '/var'", {"fl"}),
    ("name CONTAINS 'pp'", {"a1s", "a1d", "a2s"}),
    ("name SUFFIX '2'", {"a2s"}),
    ("UPPER(name) = 'APP1'", {"a1s", "a1d"}),
    ("name > 'app1'", {"a2s", "db"}),
    ("name <= 'app1'", {"a1s", "a1d", "fl"}),  # missing name reads as ""
    ("ns = ''", {"db", "fl"}),
    ("(name=app1 AND ns=system) OR name=db", {"a1s", "db"}),
]


@pytest.fixture(scope="module")
def tag_df(spark):
    rows = [(k, v) for k, v in TAG_SETS.items()]
    return spark.createDataFrame(rows, "src string, tags map<string,string>").cache()


@pytest.mark.parametrize("cond,expected", CASES)
def test_tag_cond(tag_df, cond, expected):
    src = parse_source(cond)
    got = {r["src"] for r in tag_df.where(compile_tags(src)).select("src").collect()}
    assert got == expected, cond


def test_empty_source_matches_all(tag_df):
    assert tag_df.where(compile_tags(None)).count() == len(TAG_SETS)
