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


def test_where_compile_differential_vs_reference_evaluator(spark):
    """Differential property check: 40 random WHERE expression trees
    (AND/OR/NOT over msg/fields conditions with nested UPPER/LOWER) are
    compiled to Columns and evaluated over 60 random records in ONE
    Spark job; every boolean must equal an independent pure-Python
    evaluator implementing the documented semantics (lexicographic
    compares, missing field == '', anchored glob LIKE). ASCII-only
    alphabets keep Spark's UTF8 byte ordering identical to Python's
    code-point ordering."""
    import random
    import re

    from pyspark.sql import functions as F

    from logrange_spark.compiler.whereexpr import compile_where
    from logrange_spark.lql import ast as A
    from logrange_spark.lql.glob import glob_to_regex

    rng = random.Random(20260814)
    VALS = ["", "a", "ab", "ABC", "b*", "10", "9", "z?", "a/b", "Ab"]
    OPS_STR = ["CONTAINS", "PREFIX", "SUFFIX", "LIKE"]
    OPS_CMP = ["=", "!=", "<", ">", "<=", ">="]

    def rand_cond():
        target = rng.choice(["msg", "fields:u", "fields:v"])
        funcs = tuple(rng.choice(["UPPER", "LOWER"]) for _ in range(rng.randint(0, 2)))
        ops = OPS_STR if target == "msg" else OPS_STR + OPS_CMP
        return A.Condition(A.Identifier(target, funcs), rng.choice(ops), rng.choice(VALS))

    def rand_expr(depth):
        if depth == 0 or rng.random() < 0.4:
            return rand_cond()
        k = rng.random()
        if k < 0.4:
            return A.And(tuple(rand_expr(depth - 1) for _ in range(2)))
        if k < 0.8:
            return A.Or(tuple(rand_expr(depth - 1) for _ in range(2)))
        return A.Not(rand_expr(depth - 1))

    def pyoperand(ident, rec):
        if ident.operand == "msg":
            s = rec["msg"]
        else:
            s = rec["fields"].get(ident.operand.split(":", 1)[1], "")
        for fn in reversed(ident.funcs):
            s = s.upper() if fn == "UPPER" else s.lower()
        return s

    def pyeval(e, rec):
        if isinstance(e, A.And):
            return all(pyeval(c, rec) for c in e.children)
        if isinstance(e, A.Or):
            return any(pyeval(c, rec) for c in e.children)
        if isinstance(e, A.Not):
            return not pyeval(e.child, rec)
        s, v, op = pyoperand(e.ident, rec), e.value, e.op
        if op == "CONTAINS":
            return v in s
        if op == "PREFIX":
            return s.startswith(v)
        if op == "SUFFIX":
            return s.endswith(v)
        if op == "LIKE":
            return re.search(glob_to_regex(v), s) is not None
        return {
            "=": s == v, "!=": s != v,
            "<": s < v, ">": s > v, "<=": s <= v, ">=": s >= v,
        }[op]

    alpha = "abAB19*/? "
    def rand_str():
        return "".join(rng.choice(alpha) for _ in range(rng.randint(0, 6)))

    records = []
    for i in range(60):
        fields = {}
        if rng.random() < 0.8:
            fields["u"] = rng.choice(VALS + [rand_str()])
        if rng.random() < 0.5:
            fields["v"] = rand_str()
        records.append({"msg": rng.choice(VALS + [rand_str()]), "fields": fields})

    exprs = [rand_expr(3) for _ in range(40)]
    df = spark.createDataFrame(
        [(i, r["msg"], r["fields"]) for i, r in enumerate(records)],
        "id long, msg string, fields map<string,string>",
    )
    got = {
        r["id"]: r
        for r in df.select(
            "id", *[compile_where(e).alias(f"e{j}") for j, e in enumerate(exprs)]
        ).collect()
    }
    for i, rec in enumerate(records):
        for j, e in enumerate(exprs):
            want = pyeval(e, rec)
            assert bool(got[i][f"e{j}"]) == want, (i, j, rec, e)
