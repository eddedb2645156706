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


def test_tags_compile_differential_vs_reference_evaluator(spark):
    """Differential property check mirroring the WHERE twin
    (test_where_semantics): 40 random tag expression trees plus random
    subset-match sources evaluated over 60 random tag sets in one Spark
    job must equal a pure-Python evaluator of the documented semantics
    (missing tag == '', lexicographic compares, anchored glob LIKE)."""
    import random
    import re

    from logrange_spark.compiler.tagexpr import compile_tags
    from logrange_spark.lql import ast as A
    from logrange_spark.lql.glob import glob_to_regex

    rng = random.Random(77)
    KEYS = ["name", "ns", "host"]
    VALS = ["", "a", "app1", "APP1", "b*", "10", "9", "x?y"]

    def rand_cond():
        funcs = tuple(rng.choice(["UPPER", "LOWER"]) for _ in range(rng.randint(0, 2)))
        op = rng.choice(
            ["=", "!=", "<", ">", "<=", ">=", "LIKE", "CONTAINS", "PREFIX", "SUFFIX"]
        )
        return A.Condition(A.Identifier(rng.choice(KEYS), funcs), op, rng.choice(VALS))

    def rand_expr(depth):
        if depth == 0 or rng.random() < 0.4:
            return rand_cond()
        k = rng.random()
        if k < 0.4:
            return A.And(tuple(rand_expr(depth - 1) for _ in range(2)))
        if k < 0.8:
            return A.Or(tuple(rand_expr(depth - 1) for _ in range(2)))
        return A.Not(rand_expr(depth - 1))

    def rand_source():
        if rng.random() < 0.3:  # literal subset match
            return A.Source(
                tags={k: rng.choice(VALS[1:]) for k in rng.sample(KEYS, rng.randint(1, 2))}
            )
        return A.Source(expr=rand_expr(3))

    def pyeval_expr(e, tags):
        if isinstance(e, A.And):
            return all(pyeval_expr(c, tags) for c in e.children)
        if isinstance(e, A.Or):
            return any(pyeval_expr(c, tags) for c in e.children)
        if isinstance(e, A.Not):
            return not pyeval_expr(e.child, tags)
        s = tags.get(e.ident.operand, "")
        for fn in reversed(e.ident.funcs):
            s = s.upper() if fn == "UPPER" else s.lower()
        v, op = e.value, e.op.upper()
        if op == "LIKE":
            return re.search(glob_to_regex(v), s) is not None
        if op == "CONTAINS":
            return v in s
        if op == "PREFIX":
            return s.startswith(v)
        if op == "SUFFIX":
            return s.endswith(v)
        return {
            "=": s == v, "!=": s != v,
            "<": s < v, ">": s > v, "<=": s <= v, ">=": s >= v,
        }[op]

    def pyeval(src, tags):
        if src.tags is not None:
            return all(tags.get(k, "") == v for k, v in src.tags.items())
        return pyeval_expr(src.expr, tags)

    alpha = "abAP19*?x "
    tag_sets = []
    for _ in range(60):
        t = {}
        for k in KEYS:
            if rng.random() < 0.7:
                t[k] = rng.choice(VALS[1:] + ["".join(rng.choice(alpha) for _ in range(rng.randint(0, 5)))])
        tag_sets.append(t)

    sources = [rand_source() for _ in range(40)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(tag_sets)], "id long, tags map<string,string>"
    )
    got = {
        r["id"]: r
        for r in df.select(
            "id", *[compile_tags(s).alias(f"s{j}") for j, s in enumerate(sources)]
        ).collect()
    }
    for i, t in enumerate(tag_sets):
        for j, s in enumerate(sources):
            assert bool(got[i][f"s{j}"]) == pyeval(s, t), (i, j, t, s)
