"""Glob translation + tag model tests."""

from __future__ import annotations

import re

import pytest

from logrange_spark.lql.glob import glob_to_regex
from logrange_spark.model.tags import parse_tags, subset_of, tag_line


# path.Match semantics: * and ? never match '/'
@pytest.mark.parametrize(
    "pattern,text,match",
    [
        ("abc", "abc", True),
        ("a*c", "abc", True),
        ("a*c", "abbbc", True),
        ("a*c", "a/c", False),
        ("a?c", "abc", True),
        ("a?c", "a/c", False),
        ("*", "anything", True),
        ("*", "a/b", False),
        ("a[b-d]e", "ace", True),
        ("a[b-d]e", "aee", False),
        ("a[^b-d]e", "aee", True),
        ("a\\*b", "a*b", True),
        ("a\\*b", "axb", False),
        ("*.log", "app.log", True),
        ("*.log", "dir/app.log", False),
    ],
)
def test_glob(pattern, text, match):
    assert bool(re.fullmatch(glob_to_regex(pattern)[1:-1], text)) == match


def test_tag_parse_roundtrip():
    t = parse_tags("{name=app1,ns=system}")
    assert t == {"name": "app1", "ns": "system"}
    assert tag_line(t) == "name=app1,ns=system"


def test_tag_parse_no_braces():
    assert parse_tags("a=b,c=d") == {"a": "b", "c": "d"}


def test_tag_quoting():
    t = parse_tags('{name="a,b",x=y}')
    assert t == {"name": "a,b", "x": "y"}
    # canonical line re-quotes values containing separators
    assert tag_line(t) == 'name="a,b",x=y'
    assert parse_tags(tag_line(t)) == t


def test_tag_line_sorted():
    assert tag_line({"z": "1", "a": "2"}) == "a=2,z=1"


def test_empty_value_quoted():
    assert tag_line({"k": ""}) == 'k=""'
    assert parse_tags('k=""') == {"k": ""}


def test_subset():
    assert subset_of({"a": "1"}, {"a": "1", "b": "2"})
    assert not subset_of({"a": "1", "c": "3"}, {"a": "1", "b": "2"})
    assert subset_of({}, {"a": "1"})
