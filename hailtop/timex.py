"""RFC 3339 timestamp parsing (reference hailtop/timex.py): accepts 'T', 't'
or ' ' separators, 'Z'/'z' or ±HH:MM offsets, and any number of fractional
digits (rounded half-up to microseconds)."""

from __future__ import annotations

import datetime
import re

_RFC3339 = re.compile(
    r'(\d{4})-(\d{2})-(\d{2})[Tt ]'
    r'(\d{2}):(\d{2}):(\d{2})(?:\.(\d+))?'
    r'(?:([Zz])|([+-])(\d{2}):(\d{2}))')


def parse_rfc3339(s: str) -> datetime.datetime:
    m = _RFC3339.fullmatch(s)
    if m is None:
        raise ValueError(f'not an RFC 3339 timestamp: {s!r}')
    year, month, day, hour, minute, sec = (int(m.group(i)) for i in range(1, 7))
    frac = m.group(7)
    if frac is None:
        micros = 0
    elif len(frac) <= 6:
        micros = int(frac) * 10 ** (6 - len(frac))
    else:
        den = 10 ** (len(frac) - 6)
        micros = (int(frac) + den // 2) // den      # round half-up
    if m.group(8) is not None:
        tz = datetime.timezone.utc
    else:
        sign = 1 if m.group(9) == '+' else -1
        tz = datetime.timezone(datetime.timedelta(
            hours=sign * int(m.group(10)), minutes=sign * int(m.group(11))))
    return datetime.datetime(year, month, day, hour, minute, sec, micros, tz)
