"""Timestamp auto-detection for raw log lines.

The reference's ``text`` parser detects one of ~70 date layouts with a
state machine and sticks to it per file (reference:
pkg/scanner/parser/date/date.go, line_parser.go:106-169). The Spark-first
equivalent is a single Column expression: a coalesce-cascade of
``try_to_timestamp(regexp_extract(line, pat), fmt)`` attempts — JVM-side,
codegen'd, no per-row Python. Per-file stickiness is replaced by
first-match-wins ordering (most specific patterns first), plus a
fallback chain: detected → previous line's ts (per file, ingest order) →
ingest time.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (regex-to-extract, jvm timestamp format) — most specific first.
# Covers the reference's high-traffic families: ISO-8601, classic syslog,
# CLF, yyyy/mm/dd, dd/mm/yyyy, and bare times.
DATE_PATTERNS: list[tuple[str, str]] = [
    (r"(\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}\.\d{3})", "yyyy-MM-dd['T'][ ]HH:mm:ss.SSS"),
    (r"(\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2})", "yyyy-MM-dd['T'][ ]HH:mm:ss"),
    (r"(\d{4}/\d{2}/\d{2} \d{2}:\d{2}:\d{2}\.\d{3})", "yyyy/MM/dd HH:mm:ss.SSS"),
    (r"(\d{4}/\d{2}/\d{2} \d{2}:\d{2}:\d{2})", "yyyy/MM/dd HH:mm:ss"),
    (r"(\d{2}/\d{2}/\d{4} \d{2}:\d{2}:\d{2})", "dd/MM/yyyy HH:mm:ss"),
    # apache CLF: 10/Oct/2000:13:55:36 -0700
    (r"(\d{2}/[A-Z][a-z]{2}/\d{4}:\d{2}:\d{2}:\d{2} [+-]\d{4})", "dd/MMM/yyyy:HH:mm:ss Z"),
    # syslog: Jan  2 15:04:05 / Jan 12 15:04:05 (year-less → current year)
    (r"^([A-Z][a-z]{2} [ 1-9]\d \d{2}:\d{2}:\d{2})", "MMM dd HH:mm:ss"),
]


def detect_timestamp(line: Column, current_year: Column | None = None) -> Column:
    """Best-effort event time from a raw line; NULL when nothing matches."""
    attempts = []
    for pat, fmt in DATE_PATTERNS:
        extracted = F.regexp_extract(line, pat, 1)
        ts = F.try_to_timestamp(F.nullif(extracted, F.lit("")), F.lit(fmt))
        if "y" not in fmt:  # year-less layout → assume current year
            yr = current_year if current_year is not None else F.year(F.current_timestamp())
            ts = F.try_to_timestamp(
                F.concat(yr.cast("string"), F.lit(" "), F.nullif(extracted, F.lit(""))),
                F.lit("yyyy " + fmt),
            )
        attempts.append(ts)
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
