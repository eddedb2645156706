"""WHERE expression → PySpark Column.

Semantics mirror the reference's compiled closures
(reference: pkg/lql/whereeval.go:142-327) but compile to Catalyst
expressions so predicates run JVM-side inside whole-stage codegen and are
pushed down to the parquet scan where possible:

- operands: ``ts`` (only <,>,<=,>= against datetime literals), ``msg``
  (CONTAINS/PREFIX/SUFFIX/LIKE-glob), ``fields:<name>`` (those plus
  =,!=,<,>,<=,>= — **lexicographic string compare**, missing field == "").
- UPPER()/LOWER() nestable on msg/fields (not ts).
- LIKE is a shell glob (``*``/``?`` don't cross ``/``) → anchored rlike.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..lql import ast
from ..lql.datetime_lit import parse_datetime
from ..lql.glob import glob_to_regex


class CompileError(ValueError):
    pass


def compile_where(expr: ast.Expr | None, now_ns: int | None = None) -> Column:
    if expr is None:
        return F.lit(True)
    return _compile(expr, now_ns)


def _compile(e: ast.Expr, now_ns: int | None) -> Column:
    if isinstance(e, ast.Or):
        col = _compile(e.children[0], now_ns)
        for c in e.children[1:]:
            col = col | _compile(c, now_ns)
        return col
    if isinstance(e, ast.And):
        col = _compile(e.children[0], now_ns)
        for c in e.children[1:]:
            col = col & _compile(c, now_ns)
        return col
    if isinstance(e, ast.Not):
        return ~_compile(e.child, now_ns)
    if isinstance(e, ast.Condition):
        return _compile_cond(e, now_ns)
    raise CompileError(f"unknown node {e!r}")


def _apply_funcs(col: Column, funcs: tuple[str, ...]) -> Column:
    # funcs is outermost-first; apply innermost first
    for fn in reversed(funcs):
        col = F.upper(col) if fn == "UPPER" else F.lower(col)
    return col


def _compile_cond(c: ast.Condition, now_ns: int | None) -> Column:
    name = c.ident.operand
    low = name.lower()
    if low == "ts":
        return _ts_cond(c, now_ns)
    if low == "msg":
        operand = _apply_funcs(F.col("msg"), c.ident.funcs)
        return _str_cond(operand, c, allow_compare=False)
    if low.startswith("fields:") and len(low) > 7:
        fld = name.split(":", 1)[1]
        # missing field reads as "" (reference: whereeval.go:265-327)
        operand = _apply_funcs(F.coalesce(F.col("fields").getItem(fld), F.lit("")), c.ident.funcs)
        return _str_cond(operand, c, allow_compare=True)
    raise CompileError(
        f"operand must be ts, msg or fields:<name>, got {name!r}"
    )


def _ts_cond(c: ast.Condition, now_ns: int | None) -> Column:
    if c.ident.funcs:
        raise CompileError("functions are not supported for ts")
    tm = parse_datetime(c.value, now_ns)
    ts = F.col("ts")
    ops = {
        "<": ts < F.lit(tm),
        ">": ts > F.lit(tm),
        "<=": ts <= F.lit(tm),
        ">=": ts >= F.lit(tm),
    }
    if c.op not in ops:
        raise CompileError(f"unsupported operation {c.op} for ts")
    return ops[c.op]


def _str_cond(operand: Column, c: ast.Condition, allow_compare: bool) -> Column:
    op = c.op.upper()
    v = c.value
    if op == "CONTAINS":
        return operand.contains(v)
    if op == "PREFIX":
        return operand.startswith(v)
    if op == "SUFFIX":
        return operand.endswith(v)
    if op == "LIKE":
        return operand.rlike(glob_to_regex(v))
    if not allow_compare:
        raise CompileError(f"unsupported operation {c.op} for msg")
    lit = F.lit(v)
    if op == "=":
        return operand == lit
    if op == "!=":
        return operand != lit
    # lexicographic string comparisons — intentionally NOT numeric
    # (reference: whereeval.go:307-322)
    if op == ">":
        return operand > lit
    if op == "<":
        return operand < lit
    if op == ">=":
        return operand >= lit
    if op == "<=":
        return operand <= lit
    raise CompileError(f"unsupported operation {c.op}")
