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
