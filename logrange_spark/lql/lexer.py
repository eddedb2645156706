"""LQL tokenizer.

Token classes mirror the reference lexer (reference: pkg/lql/parser.go:29-36):
keywords (case-insensitive), identifiers (may contain ``. / - : _``), quoted
strings (double quotes with backslash escapes, single quotes raw), operators,
numbers (optionally with size suffixes like ``10mb``), and ``{...}`` tag blobs.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


KEYWORDS = {
    "SELECT", "DESCRIBE", "TRUNCATE", "DELETE", "DRYRUN", "BEFORE", "MAXSIZE",
    "MINSIZE", "MAXDBSIZE", "FROM", "RANGE", "WHERE", "PARTITIONS",
    "PARTITION", "PIPES", "SHOW", "CREATE", "PIPE", "POSITION", "LIMIT",
    "OFFSET", "AND", "OR", "LIKE", "CONTAINS", "PREFIX", "SUFFIX", "NOT",
}


@dataclass(frozen=True)
class Token:
    kind: str  # KEYWORD | IDENT | STRING | OPERATOR | NUMBER | TAGS | EOF
    text: str
    pos: int


class LqlSyntaxError(ValueError):
    pass


_TOKEN_RE = re.compile(
    r"""
    (?P<WS>\s+)
  | (?P<TAGS>\{[^}]*\})
  | (?P<STRING>"(?:[^\\"]|\\.)*"|'[^']*')
  | (?P<NUMBER>[-+]?\d*\.?\d+(?:[eE][-+]?\d+|[mMkKgGtTbBpP][iI]?[bB]?)?)
  | (?P<IDENT>[a-zA-Z_][a-zA-Z0-9_.:/\-]*)
  | (?P<OPERATOR><>|!=|<=|>=|[-+*/%,.=<>()\[\]:])
    """,
    re.VERBOSE,
)


def tokenize(text: str) -> list[Token]:
    tokens: list[Token] = []
    i = 0
    n = len(text)
    while i < n:
        m = _TOKEN_RE.match(text, i)
        if not m:
            raise LqlSyntaxError(f"unexpected character {text[i]!r} at {i} in {text!r}")
        kind = m.lastgroup or ""
        val = m.group()
        if kind != "WS":
            if kind == "IDENT" and val.upper() in KEYWORDS:
                tokens.append(Token("KEYWORD", val.upper(), i))
            elif kind == "STRING":
                tokens.append(Token("STRING", _unquote(val), i))
            else:
                tokens.append(Token(kind, val, i))
        i = m.end()
    tokens.append(Token("EOF", "", n))
    return tokens


def _unquote(s: str) -> str:
    if s.startswith("'"):
        return s[1:-1]
    # double-quoted: process backslash escapes
    body = s[1:-1]
    out = []
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            nxt = body[i + 1]
            out.append({"n": "\n", "t": "\t", "r": "\r"}.get(nxt, nxt))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


_SIZE_RE = re.compile(r"^([-+]?\d*\.?\d+)\s*([kKmMgGtTpP])?([iI])?[bB]?$")


def parse_size(text: str) -> int:
    """Parse a human size literal (``10mb``, ``1.5GiB``, ``512``) to bytes."""
    m = _SIZE_RE.match(text.strip())
    if not m:
        raise LqlSyntaxError(f"bad size literal {text!r}")
    val = float(m.group(1))
    unit = (m.group(2) or "").lower()
    base = 1024 if m.group(3) else 1000
    exp = {"": 0, "k": 1, "m": 2, "g": 3, "t": 4, "p": 5}[unit]
    return int(val * (base**exp))
