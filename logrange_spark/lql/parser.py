"""Recursive-descent parser for LQL.

Grammar mirrors the reference participle grammar (reference:
pkg/lql/parser.go:91-198). Datetime/size literals are folded at parse time
(reference folds too: parser.go:226-232, pkg/lql/datetime.go).

Statements:
    SELECT ["fmt"] [FROM src] [RANGE r] [WHERE e] [POSITION p] [OFFSET n] [LIMIT n]
    SHOW PARTITIONS [src] [OFFSET n] [LIMIT n] | SHOW PIPES [OFFSET n] [LIMIT n]
    DESCRIBE PARTITION {tags} | DESCRIBE PIPE name
    CREATE PIPE name [FROM src] [WHERE e]
    DELETE PIPE name
    TRUNCATE [DRYRUN] [src] [MINSIZE s] [MAXSIZE s] [BEFORE t] [MAXDBSIZE s]
"""

from __future__ import annotations

from . import ast
from .datetime_lit import parse_datetime
from .lexer import LqlSyntaxError, Token, parse_size, tokenize
from ..model.tags import parse_tags

_COMPARE_OPS = {"<", ">", "<=", ">=", "!=", "=", "<>"}
_WORD_OPS = {"CONTAINS", "PREFIX", "SUFFIX", "LIKE"}


class Parser:
    def __init__(self, text: str, now_ns: int | None = None):
        self.text = text
        self.toks = tokenize(text)
        self.i = 0
        self.now_ns = now_ns

    # --- token helpers ---------------------------------------------------
    def peek(self) -> Token:
        return self.toks[self.i]

    def next(self) -> Token:
        t = self.toks[self.i]
        self.i += 1
        return t

    def at_kw(self, *kws: str) -> bool:
        t = self.peek()
        return t.kind == "KEYWORD" and t.text in kws

    def eat_kw(self, kw: str) -> bool:
        if self.at_kw(kw):
            self.next()
            return True
        return False

    def expect_kw(self, kw: str) -> None:
        if not self.eat_kw(kw):
            raise LqlSyntaxError(f"expected {kw} at {self.peek().pos} in {self.text!r}")

    def at_op(self, op: str) -> bool:
        t = self.peek()
        return t.kind == "OPERATOR" and t.text == op

    def eat_op(self, op: str) -> bool:
        if self.at_op(op):
            self.next()
            return True
        return False

    def expect_end(self) -> None:
        if self.peek().kind != "EOF":
            t = self.peek()
            raise LqlSyntaxError(f"unexpected token {t.text!r} at {t.pos} in {self.text!r}")

    # --- statements -------------------------------------------------------
    def parse(self) -> ast.Statement:
        t = self.peek()
        if t.kind != "KEYWORD":
            raise LqlSyntaxError(f"expected a statement keyword, got {t.text!r}")
        if self.eat_kw("SELECT"):
            stmt = self.parse_select()
        elif self.eat_kw("SHOW"):
            stmt = self.parse_show()
        elif self.eat_kw("DESCRIBE"):
            stmt = self.parse_describe()
        elif self.eat_kw("CREATE"):
            stmt = self.parse_create()
        elif self.eat_kw("DELETE"):
            stmt = self.parse_delete()
        elif self.eat_kw("TRUNCATE"):
            stmt = self.parse_truncate()
        else:
            raise LqlSyntaxError(f"unsupported statement {t.text!r}")
        self.expect_end()
        return stmt

    def parse_select(self) -> ast.Select:
        fmt = None
        if self.peek().kind == "STRING":
            fmt = self.next().text
        source = self.parse_source() if self.eat_kw("FROM") else None
        rng = self.parse_range() if self.eat_kw("RANGE") else None
        where = self.parse_expr() if self.eat_kw("WHERE") else None
        position = None
        if self.eat_kw("POSITION"):
            t = self.next()
            if t.kind not in ("STRING", "IDENT"):
                raise LqlSyntaxError(f"bad POSITION {t.text!r}")
            position = ast.Position(t.text)
        offset = self._opt_int("OFFSET")
        limit = self._opt_int("LIMIT")
        return ast.Select(fmt, source, rng, where, position, offset, limit)

    def _opt_int(self, kw: str) -> int | None:
        if self.eat_kw(kw):
            t = self.next()
            if t.kind != "NUMBER":
                raise LqlSyntaxError(f"expected number after {kw}, got {t.text!r}")
            return int(float(t.text))
        return None

    def parse_show(self) -> ast.Statement:
        if self.eat_kw("PARTITIONS"):
            source = None
            if not self.at_kw("OFFSET", "LIMIT") and self.peek().kind != "EOF":
                source = self.parse_source()
            return ast.ShowPartitions(source, self._opt_int("OFFSET"), self._opt_int("LIMIT"))
        if self.eat_kw("PIPES"):
            return ast.ShowPipes(self._opt_int("OFFSET"), self._opt_int("LIMIT"))
        raise LqlSyntaxError("expected PARTITIONS or PIPES after SHOW")

    def parse_describe(self) -> ast.Statement:
        if self.eat_kw("PARTITION"):
            t = self.next()
            if t.kind != "TAGS":
                raise LqlSyntaxError("DESCRIBE PARTITION expects {tags}")
            return ast.DescribePartition(parse_tags(t.text))
        if self.eat_kw("PIPE"):
            return ast.DescribePipe(self._ident_name())
        raise LqlSyntaxError("expected PARTITION or PIPE after DESCRIBE")

    def parse_create(self) -> ast.CreatePipe:
        self.expect_kw("PIPE")
        name = self._ident_name()
        source = self.parse_source() if self.eat_kw("FROM") else None
        where = self.parse_expr() if self.eat_kw("WHERE") else None
        return ast.CreatePipe(name, source, where)

    def parse_delete(self) -> ast.DeletePipe:
        self.expect_kw("PIPE")
        return ast.DeletePipe(self._ident_name())

    def parse_truncate(self) -> ast.Truncate:
        dry = self.eat_kw("DRYRUN")
        source = None
        if self.peek().kind == "TAGS" or self.peek().kind == "IDENT" or self.at_op("("):
            source = self.parse_source()
        min_size = self._opt_size("MINSIZE")
        max_size = self._opt_size("MAXSIZE")
        before = None
        if self.eat_kw("BEFORE"):
            t = self.next()
            if t.kind != "STRING":
                raise LqlSyntaxError("BEFORE expects a quoted datetime")
            before = parse_datetime(t.text, self.now_ns)
        max_db = self._opt_size("MAXDBSIZE")
        return ast.Truncate(dry, source, min_size, max_size, before, max_db)

    def _opt_size(self, kw: str) -> int | None:
        if self.eat_kw(kw):
            t = self.next()
            if t.kind != "NUMBER":
                raise LqlSyntaxError(f"expected size after {kw}, got {t.text!r}")
            return parse_size(t.text)
        return None

    def _ident_name(self) -> str:
        t = self.next()
        if t.kind not in ("IDENT", "STRING"):
            raise LqlSyntaxError(f"expected a name, got {t.text!r}")
        return t.text

    # --- FROM / RANGE -----------------------------------------------------
    def parse_source(self) -> ast.Source:
        if self.peek().kind == "TAGS":
            return ast.Source(tags=parse_tags(self.next().text))
        return ast.Source(expr=self.parse_expr())

    def parse_range(self) -> ast.TimeRange:
        """RANGE "pt" → [pt, +inf); RANGE [a:b] / [:b] → folded interval
        (reference: pkg/cursor/cursor.go:94-100 — missing min→0, missing
        max→MaxInt64; both bounds inclusive)."""
        if self.eat_op("["):
            p1 = None
            if self.peek().kind == "STRING":
                p1 = parse_datetime(self.next().text, self.now_ns)
            if self.eat_op(":"):
                t = self.next()
                if t.kind != "STRING":
                    raise LqlSyntaxError("RANGE expects a quoted datetime after ':'")
                p2 = parse_datetime(t.text, self.now_ns)
                if not self.eat_op("]"):
                    raise LqlSyntaxError("RANGE missing closing ']'")
                return ast.TimeRange(p1, p2)
            raise LqlSyntaxError("RANGE '[' requires ':' and an upper bound")
        t = self.next()
        if t.kind != "STRING":
            raise LqlSyntaxError("RANGE expects a quoted datetime")
        return ast.TimeRange(parse_datetime(t.text, self.now_ns), None)

    # --- expressions --------------------------------------------------
    def parse_expr(self) -> ast.Expr:
        ors = [self.parse_and()]
        while self.eat_kw("OR"):
            ors.append(self.parse_and())
        return ors[0] if len(ors) == 1 else ast.Or(tuple(ors))

    def parse_and(self) -> ast.Expr:
        ands = [self.parse_xcond()]
        while self.eat_kw("AND"):
            ands.append(self.parse_xcond())
        return ands[0] if len(ands) == 1 else ast.And(tuple(ands))

    def parse_xcond(self) -> ast.Expr:
        if self.eat_kw("NOT"):
            return ast.Not(self.parse_xcond())
        if self.eat_op("("):
            e = self.parse_expr()
            if not self.eat_op(")"):
                raise LqlSyntaxError("missing ')'")
            return e
        return self.parse_condition()

    def parse_condition(self) -> ast.Condition:
        ident = self.parse_identifier()
        t = self.next()
        if t.kind == "OPERATOR" and t.text in _COMPARE_OPS:
            op = "!=" if t.text == "<>" else t.text
        elif t.kind == "KEYWORD" and t.text in _WORD_OPS:
            op = t.text
        else:
            raise LqlSyntaxError(f"expected comparison operator, got {t.text!r}")
        v = self.next()
        if v.kind not in ("STRING", "IDENT", "NUMBER"):
            raise LqlSyntaxError(f"expected a value, got {v.text!r}")
        return ast.Condition(ident, op, v.text)

    def parse_identifier(self) -> ast.Identifier:
        t = self.next()
        if t.kind not in ("IDENT", "KEYWORD"):
            raise LqlSyntaxError(f"expected identifier, got {t.text!r}")
        name = t.text
        funcs: list[str] = []
        node = name
        # nestable 1-arg functions: UPPER(...), LOWER(...)
        while self.at_op("("):
            fn = node.upper()
            if fn not in ("UPPER", "LOWER"):
                raise LqlSyntaxError(f"unknown function {node!r} (only UPPER/LOWER)")
            self.next()  # '('
            funcs.append(fn)
            inner = self.next()
            if inner.kind not in ("IDENT", "KEYWORD"):
                raise LqlSyntaxError(f"expected identifier inside {fn}()")
            node = inner.text
        for _ in funcs:
            if not self.eat_op(")"):
                raise LqlSyntaxError("missing ')' in function call")
        return ast.Identifier(node, tuple(funcs))


def parse_lql(text: str, now_ns: int | None = None) -> ast.Statement:
    return Parser(text, now_ns).parse()


def parse_where(text: str, now_ns: int | None = None) -> ast.Expr | None:
    if not text.strip():
        return None
    p = Parser(text, now_ns)
    e = p.parse_expr()
    p.expect_end()
    return e


def parse_source(text: str, now_ns: int | None = None) -> ast.Source | None:
    if not text.strip():
        return None
    p = Parser(text, now_ns)
    s = p.parse_source()
    p.expect_end()
    return s
