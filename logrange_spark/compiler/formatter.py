"""SELECT format-template → PySpark Column.

Template syntax mirrors the reference formatter
(reference: pkg/model/leformatter.go:40-127):

    {msg}            raw message
    {msg.json()}     JSON-escaped message
    {ts}             RFC3339 (UTC here; reference uses server-local time)
    {ts.format(X)}   Go time layout X → translated to a JVM pattern
    {vars}           tag_line, plus fields rendered as "k=v,..." if present
    {vars:<name>}    field value, falling back to the tag of that name
    {{  {}           escapes for literal '{' and '}'

Everything compiles to a single ``concat`` Column — no Python runs per row.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


class FormatError(ValueError):
    pass


# Go reference-time layout fragments → JVM DateTimeFormatter patterns.
# Ordered longest-first so greedy replacement is unambiguous.
_GO_TO_JVM = [
    ("2006", "yyyy"),
    ("January", "MMMM"),
    ("Jan", "MMM"),
    ("Monday", "EEEE"),
    ("Mon", "EEE"),
    ("15", "HH"),
    ("03", "hh"),
    ("01", "MM"),
    ("02", "dd"),
    ("04", "mm"),
    ("05", "ss"),
    (".000000000", ".SSSSSSSSS"),
    (".000000", ".SSSSSS"),
    (".000", ".SSS"),
    ("PM", "a"),
    ("pm", "a"),
    ("-07:00", "XXX"),
    ("-0700", "Z"),
    ("Z07:00", "XXX"),
    ("Z0700", "X"),
    ("MST", "zzz"),
    ("06", "yy"),
    ("1", "M"),
    ("2", "d"),
    ("3", "h"),
    ("4", "m"),
    ("5", "s"),
]


def go_layout_to_jvm(layout: str) -> str:
    out: list[str] = []
    i = 0
    n = len(layout)
    while i < n:
        for go, jvm in _GO_TO_JVM:
            if layout.startswith(go, i):
                out.append(jvm)
                i += len(go)
                break
        else:
            c = layout[i]
            out.append(f"'{c}'" if c.isalpha() else c)
            i += 1
    return "".join(out)


_RFC3339 = "yyyy-MM-dd'T'HH:mm:ssXXX"


def _ts_col(pattern: str) -> Column:
    # ts is epoch nanos; format at microsecond precision (JVM timestamps
    # are µs). Integer division — float division loses ns precision at 1e18.
    return F.date_format(F.timestamp_micros(F.expr("ts div 1000")), pattern)


def _json_escape(col: Column) -> Column:
    col = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    col = F.replace(col, F.lit('"'), F.lit('\\"'))
    col = F.replace(col, F.lit("\n"), F.lit("\\n"))
    col = F.replace(col, F.lit("\r"), F.lit("\\r"))
    col = F.replace(col, F.lit("\t"), F.lit("\\t"))
    return col


def _kv_string(map_col: Column) -> Column:
    """Render a map as sorted ``k=v,...`` with tag-line quoting rules."""
    return F.array_join(
        F.transform(
            F.array_sort(F.map_keys(map_col)),
            lambda k: F.concat(
                k,
                F.lit("="),
                F.when(
                    map_col[k].contains("=") | map_col[k].contains(",") | (map_col[k] == ""),
                    F.concat(F.lit('"'), F.replace(map_col[k], F.lit('"'), F.lit('\\"')), F.lit('"')),
                ).otherwise(map_col[k]),
            ),
        ),
        ",",
    )


def _vars_col() -> Column:
    fields = F.col("fields")
    has_fields = fields.isNotNull() & (F.size(F.map_keys(fields)) > 0)
    return F.when(
        has_fields, F.concat(F.col("tag_line"), F.lit(","), _kv_string(fields))
    ).otherwise(F.col("tag_line"))


def _var_col(name: str) -> Column:
    # field value first; empty/missing falls back to the tag value
    # (reference: leformatter.go:149-158)
    f = F.coalesce(F.col("fields").getItem(name), F.lit(""))
    t = F.coalesce(F.col("tags").getItem(name), F.lit(""))
    return F.when(f != "", f).otherwise(t)


def parse_format(fstr: str) -> list[tuple[str, str]]:
    """Parse a template into (kind, value) parts.

    kinds: const | msg | msg_json | ts (value = JVM pattern) | vars | var.
    """
    parts: list[tuple[str, str]] = []
    state = 0
    start = 0
    i = 0
    while i < len(fstr):
        c = fstr[i]
        if state == 0:
            if c == "{":
                if i > start:
                    parts.append(("const", fstr[start:i]))
                state = 1
                start = i + 1
        else:
            if c == "{":
                if start == i:  # '{{' escape → literal '{'
                    state = 0
                    i += 1
                    continue
                raise FormatError(f"unexpected '{{' in format {fstr!r}")
            if c == "}":
                if start == i:  # '{}' escape → literal '}'... reference treats as const
                    state = 0
                    i += 1
                    continue
                val = fstr[start:i].strip()
                low = val.lower()
                if low == "msg":
                    parts.append(("msg", ""))
                elif low == "msg.json()":
                    parts.append(("msg_json", ""))
                elif low == "ts":
                    parts.append(("ts", _RFC3339))
                elif low.startswith("ts.format(") and val.endswith(")") and len(val) > 11:
                    parts.append(("ts", go_layout_to_jvm(val[10:-1])))
                elif low == "vars":
                    parts.append(("vars", ""))
                elif low.startswith("vars:") and len(val) > 5:
                    parts.append(("var", val[5:]))
                else:
                    raise FormatError(f"unknown format field {{{val}}}")
                state = 0
                start = i + 1
        i += 1
    if state != 0:
        raise FormatError("unexpected end of format string, '}' not found")
    if start < len(fstr):
        parts.append(("const", fstr[start:]))
    return parts


def compile_format(fstr: str) -> Column:
    cols: list[Column] = []
    for kind, val in parse_format(fstr):
        if kind == "const":
            cols.append(F.lit(val))
        elif kind == "msg":
            cols.append(F.coalesce(F.col("msg"), F.lit("")))
        elif kind == "msg_json":
            cols.append(_json_escape(F.coalesce(F.col("msg"), F.lit(""))))
        elif kind == "ts":
            cols.append(_ts_col(val))
        elif kind == "vars":
            cols.append(_vars_col())
        elif kind == "var":
            cols.append(_var_col(val))
    if not cols:
        return F.lit("")
    return F.concat(*cols)
