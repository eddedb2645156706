"""Datetime literal folding tests (reference: pkg/lql/datetime_test.go model)."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from logrange_spark.lql.datetime_lit import DAY, HOUR, MIN, SEC, parse_datetime

# Wed 2023-11-15 06:13:20 UTC
NOW = 1_700_028_800_000_000_000


def ns(y, mo, d, h=0, mi=0, s=0, us=0):
    return int(datetime(y, mo, d, h, mi, s, us, tzinfo=timezone.utc).timestamp() * SEC) + us * 1000 - us * 1000 + us * 1000


def test_relative():
    assert parse_datetime("-1h", NOW) == NOW - HOUR
    assert parse_datetime("-1.5h", NOW) == NOW - int(1.5 * HOUR)
    assert parse_datetime("-30m", NOW) == NOW - 30 * MIN
    assert parse_datetime("-2d", NOW) == NOW - 2 * DAY


def test_special():
    assert parse_datetime("minute", NOW) == (NOW // MIN) * MIN
    assert parse_datetime("hour", NOW) == (NOW // HOUR) * HOUR
    assert parse_datetime("day", NOW) == (NOW // DAY) * DAY
    # 2023-11-15 is a Wednesday; week starts Sunday 2023-11-12
    week = parse_datetime("week", NOW)
    dt = datetime.fromtimestamp(week / SEC, tz=timezone.utc)
    assert dt.weekday() == 6  # Sunday
    assert (dt.hour, dt.minute, dt.second) == (0, 0, 0)


@pytest.mark.parametrize(
    "text,expected",
    [
        ("2019-03-11 12:34:43", ns(2019, 3, 11, 12, 34, 43)),
        ("2019-03-11T12:34:43", ns(2019, 3, 11, 12, 34, 43)),
        ("2019-03-11", ns(2019, 3, 11)),
        ("2019/03/11 12:34:43", ns(2019, 3, 11, 12, 34, 43)),
        ("11/03/2019 12:34:43", ns(2019, 3, 11, 12, 34, 43)),
        ("2019-03-11 12:34:43.123", ns(2019, 3, 11, 12, 34, 43) + 123_000_000),
        ("2019-03-11T12:34:43z", ns(2019, 3, 11, 12, 34, 43)),
        ("2019-03-11 12:34", ns(2019, 3, 11, 12, 34)),
    ],
)
def test_absolute(text, expected):
    assert parse_datetime(text, NOW) == expected


def test_unix_nanos_fallback():
    assert parse_datetime("1234567890123456789", NOW) == 1234567890123456789


def test_bad():
    with pytest.raises(ValueError):
        parse_datetime("not a date", NOW)
    with pytest.raises(ValueError):
        parse_datetime("-1x", NOW)


# ---- timestamp auto-detection layout sweep (mirrors the reference's
# pkg/scanner/parser/date/date_test.go over date.go KnownFormats) ----

DETECT_CASES = [
    # (line, expected UTC tuple (y, mo, d, h, mi, s, ns))
    ("2017-12-25T21:57:12.934+0000 [clientcursormon] connections:0",
     (2017, 12, 25, 21, 57, 12, 934_000_000)),
    ("2017-12-25T21:57:12.934+02:00 x", (2017, 12, 25, 19, 57, 12, 934_000_000)),
    ("2017-12-25T21:57:12Z ok", (2017, 12, 25, 21, 57, 12, 0)),
    ("at 2019-03-11 12:34:43 something happened", (2019, 3, 11, 12, 34, 43, 0)),
    ("2019-03-11T12:34:43.123 iso millis", (2019, 3, 11, 12, 34, 43, 123_000_000)),
    ("2019-03-11 12:34 minute only", (2019, 3, 11, 12, 34, 0, 0)),
    ("2019/03/11 12:34:43.500 slashed", (2019, 3, 11, 12, 34, 43, 500_000_000)),
    ("2019/03/11 12:34:43 slashed", (2019, 3, 11, 12, 34, 43, 0)),
    ("11/03/2019 12:34:43 dmy", (2019, 3, 11, 12, 34, 43, 0)),
    ("02/03/2017 04:05 dmy minute", (2017, 3, 2, 4, 5, 0, 0)),
    ("3/4/2017 1:05 PM twelve hour", (2017, 4, 3, 13, 5, 0, 0)),
    ('69.164.145.164 - - [25/Mar/2015:06:20:45 +0800] "GET / HTTP/1.1" 200',
     (2015, 3, 24, 22, 20, 45, 0)),
    ("Tue, 25 Dec 2017 21:57:12 +0000 rfc1123z", (2017, 12, 25, 21, 57, 12, 0)),
    ("Mon, 25 Dec 2017 21:57:12 GMT rfc1123", (2017, 12, 25, 21, 57, 12, 0)),
    ("25 Dec 2017, 21:57 short", (2017, 12, 25, 21, 57, 0, 0)),
    ("02 Jan 2006 15:04 reference layout", (2006, 1, 2, 15, 4, 0, 0)),
    ("Mon Jan  2 15:04:05 2006 asctime", (2006, 1, 2, 15, 4, 5, 0)),
    ("12.25.2017 dotted", (2017, 12, 25, 0, 0, 0, 0)),
    ("released 2017-12-25 bare date", (2017, 12, 25, 0, 0, 0, 0)),
    ("Mon Jan 02 15:04:05 +0000 2006 ruby asctime", (2006, 1, 2, 15, 4, 5, 0)),
    ("2017-12-25 10:05:06 PM iso twelve hour", (2017, 12, 25, 22, 5, 6, 0)),
    ("3/4/17 10:00 two digit year", (2017, 4, 3, 10, 0, 0, 0)),
    ("Jan 2, 2006 3:04:05 PM mdy twelve hour", (2006, 1, 2, 15, 4, 5, 0)),
    ("2019-Mar-11 dashed month name", (2019, 3, 11, 0, 0, 0, 0)),
    ("25 December 2017 full month", (2017, 12, 25, 0, 0, 0, 0)),
    ("on 25 Dec 2017 bare abbreviated", (2017, 12, 25, 0, 0, 0, 0)),
    ("epoch 1552307683 in line", (2019, 3, 11, 12, 34, 43, 0)),
    ("epoch-ms 1552307683123 in line", (2019, 3, 11, 12, 34, 43, 123_000_000)),
    ("epoch-ns 1552307683123456789 here", (2019, 3, 11, 12, 34, 43, 123_456_000)),
    # float division would land on ...015 µs for this one (review fix)
    ("epoch-ns 1500000000000016000 ulp edge", (2017, 7, 14, 2, 40, 0, 16_000)),
]

YEARLESS_CASES = [
    ("Tue Jan 30 00:42:28.694 <kernel> BTCoex", (2019, 1, 30, 0, 42, 28, 694_000_000)),
    ("Jan  2 15:04:05.000 padded syslog frac", (2019, 1, 2, 15, 4, 5, 0)),
    ("Mar 11 12:34:43 host prog: hi", (2019, 3, 11, 12, 34, 43, 0)),
]


def _detect_many(spark, lines, year=None):
    from pyspark.sql import functions as F

    from logrange_spark.ingest.datedetect import detect_timestamp

    df = spark.createDataFrame([(l,) for l in lines], "value string")
    yr = F.lit(year) if year is not None else None
    return [
        r["t"]
        for r in df.select(
            detect_timestamp(F.col("value"), current_year=yr).alias("t")
        ).collect()
    ]


def test_detect_layout_sweep(spark):
    got = _detect_many(spark, [l for l, _ in DETECT_CASES])
    for (line, exp), t in zip(DETECT_CASES, got):
        assert t is not None, f"no detection: {line!r}"
        act = (t.year, t.month, t.day, t.hour, t.minute, t.second, t.microsecond * 1000)
        assert act == exp, f"{line!r}: {act} != {exp}"


def test_detect_yearless_layouts(spark):
    got = _detect_many(spark, [l for l, _ in YEARLESS_CASES], year=2019)
    for (line, exp), t in zip(YEARLESS_CASES, got):
        assert t is not None, f"no detection: {line!r}"
        act = (t.year, t.month, t.day, t.hour, t.minute, t.second, t.microsecond * 1000)
        assert act == exp, f"{line!r}: {act} != {exp}"


def test_detect_no_false_positives(spark):
    got = _detect_many(
        spark,
        [
            "no date in this line",
            "version 1.2.3 build 20171225",   # bare digits, not a date shape
            "req=1612345678 id field is not an epoch",
            "pi is 3.14159 and e is 2.71828",
        ],
    )
    assert got == [None, None, None, None]


def test_detect_roundtrip_stress(spark):
    """Seeded stress: random datetimes rendered through each layout,
    embedded in random message noise — detection must recover the exact
    instant. One batched DataFrame, one collect."""
    import random
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from logrange_spark.ingest.datedetect import detect_timestamp

    rng = random.Random(20260813)
    layouts = [
        ("%Y-%m-%dT%H:%M:%S.%f", None),
        ("%Y-%m-%d %H:%M:%S", None),
        ("%Y/%m/%d %H:%M:%S", None),
        ("%d/%m/%Y %H:%M:%S", None),
        ("%Y-%m-%dT%H:%M:%SZ", None),
        ("%d %b %Y %H:%M:%S +0000", None),
        ("%m.%d.%Y", "date-only"),
        ("%Y-%m-%d", "date-only"),
    ]
    prefixes = ["", "app[312]: ", "1.2.3 ", "level=info at ", "<<< "]
    suffixes = ["", " done", " k=v pairs trail", " :: tail"]

    cases = []
    for i in range(300):
        fmt, kind = layouts[i % len(layouts)]
        # second precision; micros only for the .%f layout (rendered ms-truncated)
        dt = datetime(2015, 1, 1) + timedelta(
            days=rng.randrange(3650), seconds=rng.randrange(86400)
        )
        if "%f" in fmt:
            dt = dt.replace(microsecond=rng.randrange(1000) * 1000)
            rendered = dt.strftime(fmt)[:-3]  # micros → millis
        else:
            rendered = dt.strftime(fmt)
        if kind == "date-only":
            dt = dt.replace(hour=0, minute=0, second=0, microsecond=0)
        line = rng.choice(prefixes) + rendered + rng.choice(suffixes)
        cases.append((line, dt))

    df = spark.createDataFrame([(l,) for l, _ in cases], "value string")
    got = [
        r["t"]
        for r in df.select(detect_timestamp(F.col("value")).alias("t")).collect()
    ]
    bad = [
        (cases[i][0], cases[i][1], got[i])
        for i in range(len(cases))
        if got[i] != cases[i][1]
    ]
    assert not bad, f"{len(bad)} mismatches, first 3: {bad[:3]}"
