"""FROM (tag condition) → PySpark Column + partition-pruning helpers.

Two forms (reference: pkg/lql/tagseval.go:43-64):

- ``{a=b,c=d}``     — subset match: partition's tag set must contain all
                      the given pairs (tags.go:101-103).
- ``a=b OR c!=d``   — boolean expression over tag values; missing tag
                      reads as "" ; all compares lexicographic; LIKE is a
                      shell glob (tagseval.go:159-218).

``compile_tags`` returns a Column over the ``tags`` map column, used both
for scan filtering and for resolving the (small) partition catalog — the
Spark analogue of the reference's in-memory tag index visit
(pkg/tindex/inmem.go:143-153). Resolving against the catalog first and
then filtering the scan by ``src IN (...)`` turns an arbitrary tag
predicate into static partition pruning, which is what survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..lql import ast
from ..lql.glob import glob_to_regex
from .whereexpr import CompileError


def compile_tags(source: ast.Source | None) -> Column:
    if source is None:
        return F.lit(True)
    if source.tags is not None:
        col = F.lit(True)
        for k, v in source.tags.items():
            col = col & (F.coalesce(F.col("tags").getItem(k), F.lit("")) == F.lit(v))
        return col
    return _compile_expr(source.expr)


def _compile_expr(e: ast.Expr | None) -> Column:
    if e is None:
        return F.lit(True)
    if isinstance(e, ast.Or):
        col = _compile_expr(e.children[0])
        for c in e.children[1:]:
            col = col | _compile_expr(c)
        return col
    if isinstance(e, ast.And):
        col = _compile_expr(e.children[0])
        for c in e.children[1:]:
            col = col & _compile_expr(c)
        return col
    if isinstance(e, ast.Not):
        return ~_compile_expr(e.child)
    if isinstance(e, ast.Condition):
        return _compile_cond(e)
    raise CompileError(f"unknown node {e!r}")


def _tag_value(ident: ast.Identifier) -> Column:
    col = F.coalesce(F.col("tags").getItem(ident.operand), F.lit(""))
    for fn in reversed(ident.funcs):
        col = F.upper(col) if fn == "UPPER" else F.lower(col)
    return col


def _compile_cond(c: ast.Condition) -> Column:
    operand = _tag_value(c.ident)
    v = c.value
    op = c.op.upper()
    lit = F.lit(v)
    if op == "=":
        return operand == lit
    if op == "!=":
        return operand != lit
    if op == "<":
        return operand < lit
    if op == ">":
        return operand > lit
    if op == "<=":
        return operand <= lit
    if op == ">=":
        return operand >= lit
    if op == "LIKE":
        return operand.rlike(glob_to_regex(v))
    if op == "CONTAINS":
        return operand.contains(v)
    if op == "PREFIX":
        return operand.startswith(v)
    if op == "SUFFIX":
        return operand.endswith(v)
    raise CompileError(f"unsupported tag operation {c.op}")


def resolve_sources(catalog: DataFrame, source: ast.Source | None, max_sources: int | None = None) -> list[str]:
    """Resolve a tag condition against the partition catalog → list of src ids.

    ``catalog`` must have columns (src, tags). This is the tindex visit: the
    catalog is tiny (one row per distinct tag set), so this collect is cheap
    and the resulting ``src IN (...)`` predicate prunes the big scan.
    """
    df = catalog.where(compile_tags(source)).select("src")
    if max_sources is not None:
        df = df.limit(max_sources)
    return [r[0] for r in df.collect()]
