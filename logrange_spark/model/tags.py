"""Tag-set model: parse, canonical line, subset semantics.

Semantics mirror the reference's tag model (reference:
pkg/model/tag/tags.go:27-43, 147-175 and pkg/utils/kvstring/kvstring.go):

- A tag set is an immutable ``{k: v}`` string map identifying a partition.
- Its canonical *line* is the sorted ``k=v,k2=v2`` rendering; a value is
  double-quoted when it is empty or contains ``=`` or ``,``.
- ``FROM {a=b}`` selects partitions whose tag set is a *superset* of the
  given tags (tags.go:101-103).
"""

from __future__ import annotations

import json


KV_SEP = "="
FIELD_SEP = ","


class TagsError(ValueError):
    pass


def remove_curly_braces(s: str) -> str:
    """Trim surrounding spaces and one level of balanced curly braces."""
    i, cnt = 0, 0
    while i < len(s):
        c = s[i]
        if c == " ":
            i += 1
            continue
        if c == "{":
            cnt += 1
            i += 1
            continue
        break
    j = len(s) - 1
    while j > i and cnt >= 0:
        c = s[j]
        if c == " ":
            j -= 1
            continue
        if c == "}":
            cnt -= 1
            j -= 1
            continue
        break
    if j == i and len(s) > 0 and cnt != 0:
        raise TagsError(f"improperly formatted tags string {s!r}")
    if cnt != 0:
        raise TagsError(f"improperly formatted tags string {s!r}")
    return s[i : j + 1]


def _split_kv(s: str) -> list[str]:
    """Split ``k=v,k2=v2`` into [k, v, k2, v2], honoring double-quoted values
    (quotes may protect ``=`` and ``,``; backslash escapes inside quotes)."""
    out: list[str] = []
    in_str = False
    expect = KV_SEP
    st = 0
    i = 0
    while i < len(s):
        c = s[i]
        if c == '"':
            in_str = not in_str
            i += 1
            continue
        if c == "\\" and in_str:
            i += 2
            continue
        if (c == KV_SEP or c == FIELD_SEP) and not in_str:
            if c != expect:
                raise TagsError(f"unexpected separator at {i} of {s!r}")
            expect = FIELD_SEP if expect == KV_SEP else KV_SEP
            out.append(s[st:i])
            st = i + 1
        i += 1
    if in_str:
        raise TagsError(f"unclosed quote in {s!r}")
    out.append(s[st:])
    return out


def _unquote(v: str) -> str:
    v = v.strip()
    if len(v) >= 2 and v[0] == '"' and v[-1] == '"':
        try:
            return json.loads(v)
        except Exception:
            return v[1:-1]
    return v


def parse_tags(s: str) -> dict[str, str]:
    """Parse ``{k=v,...}`` or ``k=v,...`` into a dict."""
    if not s or not s.strip():
        return {}
    body = remove_curly_braces(s)
    if not body:
        return {}
    parts = _split_kv(body)
    if len(parts) % 2 != 0:
        raise TagsError(f"tags string has dangling key: {s!r}")
    out: dict[str, str] = {}
    for i in range(0, len(parts), 2):
        k = parts[i].strip()
        if not k:
            raise TagsError(f"empty tag key in {s!r}")
        out[k] = _unquote(parts[i + 1])
    return out


def _quote_value(v: str) -> str:
    # quote anything that would confuse the line parser: separators,
    # quotes/backslashes (escape chars), braces (trimmed by the {}-wrapper
    # logic), empties and edge whitespace (stripped by _unquote)
    if v == "" or v != v.strip() or any(c in v for c in '=,"{}\\'):
        return json.dumps(v)
    return v


def tag_line(tags: dict[str, str]) -> str:
    """Canonical sorted ``k=v,k2=v2`` line (partition identity)."""
    return FIELD_SEP.join(f"{k}{KV_SEP}{_quote_value(tags[k])}" for k in sorted(tags))


def subset_of(sub: dict[str, str], sup: dict[str, str]) -> bool:
    """True if every k=v of ``sub`` appears in ``sup``."""
    return all(sup.get(k) == v for k, v in sub.items())
