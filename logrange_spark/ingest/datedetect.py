"""Timestamp auto-detection for raw log lines.

The reference's ``text`` parser detects one of ~40 date layouts with a
state machine and sticks to it per file (reference:
pkg/scanner/parser/date/date.go:29-139, line_parser.go:106-169). The
Spark-first equivalent is a single Column expression: a coalesce-cascade
of ``try_to_timestamp(regexp_extract(line, pat), fmt)`` attempts —
JVM-side, codegen'd, short-circuiting, no per-row Python. Per-file
stickiness is replaced by first-match-wins ordering (most specific
patterns first), plus a fallback chain: detected → previous line's ts
(per file, ingest order) → ingest time.

Layout families covered (mirroring date.go KnownFormats):

- ISO-8601 / RFC3339 with or without 'T', any fraction length, and any
  offset shape (``Z``, ``+hh:mm``, ``+hhmm``, `` +hhmm``) — one regex,
  parsed by Spark's native ISO parser (handles all of these);
- ``yyyy/mm/dd`` and ``dd/mm/yyyy`` with optional ``.SSS`` / minute-only;
- 12-hour ``d/M/yyyy h:mm[:ss] AM|PM``;
- apache CLF ``dd/MMM/yyyy:HH:mm:ss +0000``;
- RFC822/1123 ``[Day, ]d MMM yyyy HH:mm:ss +0000|GMT|UTC``;
- ``d MMM yyyy[,] HH:mm[:ss]`` (e.g. ``02 Jan 2006 15:04``);
- ANSI-C asctime ``Mon Jan _2 15:04:05 2006``;
- year-less syslog ``MMM _d HH:mm:ss`` with optional weekday prefix and
  optional fractional seconds (``Jan _2 15:04:05.000``) → current year;
- ``MM.dd.yyyy``; bare ``yyyy-MM-dd`` / ``yyyy/MM/dd``;
- epoch-in-line: 10-digit seconds / 13-digit millis / 19-digit nanos
  (bounded to the 2011–2033 range so version numbers don't match).

Multi-space runs in the matched region are collapsed before parsing, so
``_2``-padded layouts (``Jan  2``) parse with single-space formats.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Detection table, most specific first. Entries are (kind, regex, fmt):
#   iso      — extract, collapse spaces, Spark native ISO parse (fmt unused)
#   fmt      — extract, collapse spaces, try_to_timestamp with fmt
#   yearless — like fmt, but prefixed with the current year
#   epoch_s / epoch_ms / epoch_ns — numeric epoch literal
DATE_PATTERNS: list[tuple[str, str, str | None]] = [
    # -- ISO-date with 12-hour clock: must precede the plain ISO rule or
    #    '2017-12-25 10:05:06 PM' parses as 10:05 instead of 22:05
    ("fmt", r"(\d{4}-\d{2}-\d{2} \d{1,2}:\d{2}:\d{2} [AP]M)", "yyyy-MM-dd h:mm:ss a"),
    # -- ISO-8601 family: fraction and/or offset (native parser covers all)
    ("iso",
     r"(\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d{1,9})?(?: ?(?:Z|[+-]\d{2}:?\d{2}))?)",
     None),
    ("fmt", r"(\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2})(?![:\d])", "yyyy-MM-dd['T'][ ]HH:mm"),
    # -- yyyy/mm/dd
    ("fmt", r"(\d{4}/\d{2}/\d{2} \d{2}:\d{2}:\d{2}\.\d{3})", "yyyy/MM/dd HH:mm:ss.SSS"),
    ("fmt", r"(\d{4}/\d{2}/\d{2} \d{2}:\d{2}:\d{2})(?![.\d])", "yyyy/MM/dd HH:mm:ss"),
    ("fmt", r"(\d{4}/\d{2}/\d{2} \d{2}:\d{2})(?![:\d])", "yyyy/MM/dd HH:mm"),
    # -- 12-hour with AM/PM (before 24h dd/mm so the suffix binds)
    ("fmt", r"(\d{1,2}/\d{1,2}/\d{4} \d{1,2}:\d{2}(?::\d{2})? [AP]M)",
     "d/M/yyyy h:mm[:ss] a"),
    # -- dd/mm/yyyy
    ("fmt", r"(\d{2}/\d{2}/\d{4} \d{2}:\d{2}:\d{2}\.\d{3})", "dd/MM/yyyy HH:mm:ss.SSS"),
    ("fmt", r"(\d{1,2}/\d{1,2}/\d{4} \d{2}:\d{2}:\d{2})(?![.\d])", "d/M/yyyy HH:mm:ss"),
    ("fmt", r"(\d{1,2}/\d{1,2}/\d{4} \d{2}:\d{2})(?![:\d])", "d/M/yyyy HH:mm"),
    # -- 2-digit-year variants ONLY with a time attached ('D/M/YY HH:mm'
    #    in the reference); bare D/M/YY is excluded deliberately — it
    #    false-matches fractions and version strings
    ("fmt", r"(\d{1,2}/\d{1,2}/\d{2} \d{2}:\d{2})(?![:\d])", "d/M/yy HH:mm"),
    # -- apache CLF: 10/Oct/2000:13:55:36 -0700
    ("fmt", r"(\d{2}/[A-Z][a-z]{2}/\d{4}:\d{2}:\d{2}:\d{2} [+-]\d{4})",
     "dd/MMM/yyyy:HH:mm:ss xx"),
    # -- RFC822/1123: [Tue, ]25 Dec 2017 21:57:12 +0000|GMT|UTC
    ("fmt", r"(?:[A-Z][a-z]{2}, )?(\d{1,2} [A-Z][a-z]{2} \d{4} \d{2}:\d{2}:\d{2} [+-]\d{4})",
     "d MMM yyyy HH:mm:ss xx"),
    ("fmt", r"(?:[A-Z][a-z]{2}, )?(\d{1,2} [A-Z][a-z]{2} \d{4} \d{2}:\d{2}:\d{2} (?:GMT|UTC))",
     "d MMM yyyy HH:mm:ss zzz"),
    # -- d MMM yyyy[,] HH:mm[:ss]  (covers '02 Jan 2006 15:04')
    ("fmt", r"(\d{1,2} [A-Z][a-z]{2} \d{4},? \d{2}:\d{2}(?::\d{2})?)(?![:\d])",
     "d MMM yyyy[,] HH:mm[:ss]"),
    # -- asctime with numeric zone: Mon Jan 02 15:04:05 +0000 2006
    ("fmt", r"[A-Z][a-z]{2} ([A-Z][a-z]{2} {1,2}\d{1,2} \d{2}:\d{2}:\d{2} [+-]\d{4} \d{4})",
     "MMM d HH:mm:ss xx yyyy"),
    # -- ANSI-C asctime: Mon Jan  2 15:04:05 2006
    ("fmt", r"[A-Z][a-z]{2} ([A-Z][a-z]{2} {1,2}\d{1,2} \d{2}:\d{2}:\d{2} \d{4})",
     "MMM d HH:mm:ss yyyy"),
    # -- MMM D, YYYY h:mm:ss P (e.g. Jan 2, 2006 3:04:05 PM)
    ("fmt", r"([A-Z][a-z]{2} \d{1,2}, \d{4} \d{1,2}:\d{2}:\d{2} [AP]M)",
     "MMM d, yyyy h:mm:ss a"),
    # -- year-less syslog, fractional first: Jan _2 15:04:05.000 (opt. weekday)
    ("yearless", r"(?:[A-Z][a-z]{2} )?([A-Z][a-z]{2} {1,2}\d{1,2} \d{2}:\d{2}:\d{2}\.\d{3})",
     "MMM d HH:mm:ss.SSS"),
    ("yearless", r"(?:[A-Z][a-z]{2} )?([A-Z][a-z]{2} {1,2}\d{1,2} \d{2}:\d{2}:\d{2})(?![.\d])",
     "MMM d HH:mm:ss"),
    # -- mm.dd.yyyy
    ("fmt", r"(\d{2}\.\d{2}\.\d{4})(?!\d)", "MM.dd.yyyy"),
    # -- yyyy-MMM-dd (2019-Mar-11)
    ("fmt", r"(\d{4}-[A-Z][a-z]{2}-\d{2})(?![\d:])", "yyyy-MMM-dd"),
    # -- d MMMM yyyy / d MMM yyyy bare dates (full or abbreviated month)
    ("fmt", r"(\d{1,2} [A-Z][a-z]{3,8} \d{4})(?![\d:])", "d MMMM yyyy"),
    ("fmt", r"(\d{1,2} [A-Z][a-z]{2} \d{4})(?![\d:,])", "d MMM yyyy"),
    # -- bare dates (guarded against version-number false hits)
    ("fmt", r"(?:^|\s)(\d{4}-\d{2}-\d{2})(?![\dT:.-])", "yyyy-MM-dd"),
    ("fmt", r"(?:^|\s)(\d{4}/\d{2}/\d{2})(?![\d:./])", "yyyy/MM/dd"),
    # -- epoch-in-line (2011-2033 bounded; ns → ms → s, longest first;
    #    context limited to start/whitespace/bracket so ids like
    #    ``req=1612345678`` don't read as timestamps)
    ("epoch_ns", r"(?:^|[\s\[\(])(1[3-9]\d{17})(?![\d.])", None),
    ("epoch_ms", r"(?:^|[\s\[\(])(1[3-9]\d{11})(?![\d.])", None),
    ("epoch_s", r"(?:^|[\s\[\(])(1[3-9]\d{8})(?![\d.])", None),
]


def detect_timestamp(line: Column, current_year: Column | None = None) -> Column:
    """Best-effort event time from a raw line; NULL when nothing matches.

    One coalesce over ~20 codegen'd attempts — the per-line cost is a
    short-circuited regex cascade on the JVM, the Spark replacement for
    the reference's per-file format state machine (date.go:190-230).
    """
    attempts = []
    for kind, pat, fmt in DATE_PATTERNS:
        raw = F.nullif(F.regexp_extract(line, pat, 1), F.lit(""))
        if kind.startswith("epoch_"):
            n = raw.cast("long")
            if kind == "epoch_s":
                attempts.append(F.timestamp_seconds(n))
            elif kind == "epoch_ms":
                attempts.append(F.timestamp_millis(n))
            else:
                # exact ns→µs floor: plain `/ 1000` goes through doubles
                # and loses ulps on 19-digit longs; subtracting the
                # remainder first keeps the double division within 1 ulp
                # of an integer, which round() recovers exactly
                us = F.round((n - F.pmod(n, F.lit(1000))) / F.lit(1000)).cast("long")
                attempts.append(F.timestamp_micros(us))
            continue
        ex = F.regexp_replace(raw, r"  +", " ")  # collapse _2-style padding
        if kind == "iso":
            attempts.append(F.try_to_timestamp(ex))
        elif kind == "yearless":
            yr = current_year if current_year is not None else F.year(F.current_timestamp())
            attempts.append(
                F.try_to_timestamp(
                    F.concat(yr.cast("string"), F.lit(" "), ex), F.lit("yyyy " + fmt)
                )
            )
        else:
            attempts.append(F.try_to_timestamp(ex, F.lit(fmt)))
    return F.coalesce(*attempts)


def with_sticky_fallback(df, ts_col: str, order_col: str, file_col: str):
    """Fill NULL detected timestamps with the last detected value earlier in
    the same file (the reference's 'use last known date' behavior,
    line_parser.go:150-169), then ingest time.

    Window over (file, ingest order) — in streaming jobs prefer the plain
    ingest-time fallback; this window is for batch backfills.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(file_col).orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    filled = F.last(F.col(ts_col), ignorenulls=True).over(w)
    return df.withColumn(ts_col, F.coalesce(filled, F.current_timestamp()))
