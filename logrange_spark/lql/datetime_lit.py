"""LQL datetime literal parsing → epoch nanoseconds.

The reference accepts three literal forms, folded to int64 ns at parse time
(reference: pkg/lql/datetime.go:114-213):

- absolute: one of ~70 layouts (datetime.go:29-112)
- relative: ``-<float>(m|h|d)`` back from now
- special:  ``minute`` (one minute ago) / ``hour`` / ``day`` / ``week``
  (start of current hour / day / week-Sunday)
- fallback: a bare integer is taken as raw unix nanoseconds

All folding happens engine-side; nothing here touches Spark at runtime.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone

NS = 1
US = 1_000
MS = 1_000_000
SEC = 1_000_000_000
MIN = 60 * SEC
HOUR = 60 * MIN
DAY = 24 * HOUR

MIN_TIMESTAMP = 0
MAX_TIMESTAMP = (1 << 63) - 1


class DateTimeError(ValueError):
    pass


# Python strptime layouts equivalent to the reference's format table
# (datetime.go:29-112). Order matters: first match wins. %z handles both
# "+0000" and "+00:00"; bare-zone-name forms are normalized before matching.
_ABS_LAYOUTS = [
    "%b %d, %Y %I:%M:%S %p",
    "%a %b %d %H:%M:%S %Y",
    "%a %b %d %H:%M:%S %z %Y",
    "%a, %d %b %Y %H:%M:%S %z",
    "%d %b %Y, %H:%M",
    "%Y-%b-%d",
    "%d %B %Y",
    # dd/mm/yy
    "%d/%m/%Y %H:%M:%S.%f",
    "%d/%m/%Y %H:%M:%S",
    "%d/%m/%Y %I:%M:%S %p",
    "%d/%m/%Y %H:%M",
    "%d/%m/%y %H:%M",
    "%d/%m/%Y %I:%M %p",
    "%d/%b/%Y:%H:%M:%S %z",
    "%d/%m/%Y",
    "%d/%m/%y",
    # yyyy/mm/dd
    "%Y/%m/%d %H:%M:%S.%f",
    "%Y/%m/%d %H:%M:%S",
    "%Y/%m/%d %H:%M",
    "%Y/%m/%d",
    # iso-ish
    "%Y-%m-%dT%H:%M:%S.%f%z",
    "%Y-%m-%dT%H:%M:%S%z",
    "%Y-%m-%dT%H:%M:%S.%f",
    "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%d %H:%M:%S.%f %z",
    "%Y-%m-%d %H:%M:%S.%f",
    "%Y-%m-%d %H:%M:%S %z",
    "%Y-%m-%d %H:%M:%S%z",
    "%Y-%m-%d %I:%M:%S %p",
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%d  %H:%M:%S",
    "%Y-%m-%d %H:%M",
    "%Y-%m-%d",
    # mm.dd.yy
    "%m.%d.%Y",
    "%m.%d.%y",
    # no year (current year assumed)
    "%a %b %d %H:%M:%S.%f",
    "%b %d %H:%M:%S",
    # today's time
    "%H:%M:%S.%f %z",
    "%H:%M:%S %z",
    "%H:%M %z",
    "%H:%M:%S.%f",
    "%H:%M:%S",
    "%H:%M",
]

_TZ_NAME = re.compile(r"\butc\b|\bgmt\b|z$", re.IGNORECASE)
_REL = re.compile(r"^-(\d*\.?\d+)([mhd])$")


def _now(now_ns: int | None) -> datetime:
    if now_ns is None:
        return datetime.now(timezone.utc)
    return datetime.fromtimestamp(now_ns / SEC, tz=timezone.utc)


def _to_ns(dt: datetime) -> int:
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    # microsecond-exact, then widen to ns (strptime has no sub-µs anyway)
    return int(round(dt.timestamp() * 1_000_000)) * 1000


def parse_datetime(text: str, now_ns: int | None = None) -> int:
    """Parse an LQL datetime literal to epoch nanoseconds (UTC).

    ``now_ns`` pins "now" for the relative/special forms (tests/determinism).
    """
    dt = text.strip().lower()
    if not dt:
        raise DateTimeError("empty datetime literal")

    m = _REL.match(dt)
    if m:
        val = float(m.group(1))
        mult = {"m": MIN, "h": HOUR, "d": DAY}[m.group(2)]
        return int(_now(now_ns).timestamp() * SEC - val * mult)

    special = _parse_special(dt, now_ns)
    if special is not None:
        return special

    abs_ns = _parse_absolute(dt, now_ns)
    if abs_ns is not None:
        return abs_ns

    try:
        return int(dt, 10)  # raw unix nanos
    except ValueError:
        pass

    raise DateTimeError(f"could not parse {text!r} as relative or absolute timestamp")


def _parse_special(dt: str, now_ns: int | None) -> int | None:
    now = _now(now_ns)
    if dt == "minute":
        t = now.replace(second=0, microsecond=0)
    elif dt == "hour":
        t = now.replace(minute=0, second=0, microsecond=0)
    elif dt == "day":
        t = now.replace(hour=0, minute=0, second=0, microsecond=0)
    elif dt == "week":
        t = now.replace(hour=0, minute=0, second=0, microsecond=0)
        # reference weeks start on Sunday (datetime.go:204-208)
        days_back = (t.weekday() + 1) % 7
        t -= timedelta(days=days_back)
    else:
        return None
    return int(t.timestamp()) * SEC


def _parse_absolute(dt: str, now_ns: int | None) -> int | None:
    s = _TZ_NAME.sub("+0000", dt)
    s = re.sub(r"\s+", " ", s).strip()
    for layout in _ABS_LAYOUTS:
        try:
            parsed = datetime.strptime(s, layout)
        except ValueError:
            continue
        if parsed.year == 1900:  # layout without a date part → today
            now = _now(now_ns)
            if "%b" not in layout and "%m" not in layout:
                parsed = parsed.replace(year=now.year, month=now.month, day=now.day)
            else:  # has month/day but no year
                parsed = parsed.replace(year=now.year)
        return _to_ns(parsed)
    return None
