"""Shell-glob LIKE → anchored Java regex.

LQL's ``LIKE`` is a shell glob with Go ``path.Match`` semantics — NOT SQL
LIKE and NOT a regex (reference: pkg/lql/whereeval.go:248-258). Key quirk:
``*`` and ``?`` match any characters *except* ``/`` (path separator), and
character classes ``[a-z]`` / ``[^a-z]`` are supported with ``\\`` escapes.

The translation targets Java regex syntax (what Spark's ``rlike`` runs).
"""

from __future__ import annotations


class GlobError(ValueError):
    pass


_SPECIAL = ".^$+{}()|"


def glob_to_regex(pattern: str) -> str:
    """Translate a path.Match glob to an anchored Java regex string."""
    out = ["^"]
    i = 0
    n = len(pattern)
    while i < n:
        c = pattern[i]
        if c == "*":
            out.append("[^/]*")
        elif c == "?":
            out.append("[^/]")
        elif c == "\\":
            if i + 1 >= n:
                raise GlobError(f"trailing backslash in glob {pattern!r}")
            i += 1
            nxt = pattern[i]
            out.append("\\" + nxt if nxt in _SPECIAL + "*?[]\\" else nxt)
        elif c == "[":
            j, cls = _char_class(pattern, i)
            out.append(cls)
            i = j
        elif c in _SPECIAL:
            out.append("\\" + c)
        else:
            out.append(c)
        i += 1
    out.append("$")
    return "".join(out)


def _char_class(pattern: str, start: int) -> tuple[int, str]:
    """Translate ``[...]`` starting at ``start``; returns (index of ``]``, regex)."""
    i = start + 1
    n = len(pattern)
    out = ["["]
    if i < n and pattern[i] == "^":
        out.append("^")
        i += 1
    if i >= n:
        raise GlobError(f"unterminated character class in glob {pattern!r}")
    first = True
    while i < n and (pattern[i] != "]" or first):
        c = pattern[i]
        if c == "\\":
            if i + 1 >= n:
                raise GlobError(f"trailing backslash in glob {pattern!r}")
            i += 1
            c = pattern[i]
            out.append("\\" + c)
        elif c in "[&":
            out.append("\\" + c)
        else:
            out.append(c)
        first = False
        i += 1
    if i >= n:
        raise GlobError(f"unterminated character class in glob {pattern!r}")
    out.append("]")
    return i, "".join(out)
