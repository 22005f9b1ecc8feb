"""Human-readable durations (reference hailtop/humanizex.py): the two most
significant adjacent units, long names pluralized, s/ms/μs abbreviated."""

from __future__ import annotations

# (name, size in microseconds, abbreviated?)
_UNITS = [
    ('week', 7 * 24 * 60 * 60 * 1_000_000, False),
    ('day', 24 * 60 * 60 * 1_000_000, False),
    ('hour', 60 * 60 * 1_000_000, False),
    ('minute', 60 * 1_000_000, False),
    ('s', 1_000_000, True),
    ('ms', 1_000, True),
    ('μs', 1, True),
]


def _part(name: str, count: int, abbrev: bool) -> str:
    if abbrev:
        return f'{count}{name}'
    return f'{count} {name}' + ('s' if count != 1 else '')


def naturaldelta(seconds: float) -> str:
    us = round(seconds * 1_000_000)
    if us <= 0:
        return '0s'
    for i, (name, size, abbrev) in enumerate(_UNITS):
        c = us // size
        if c >= 1:
            out = _part(name, c, abbrev)
            if i + 1 < len(_UNITS):
                n2, s2, a2 = _UNITS[i + 1]
                c2 = (us - c * size) // s2
                if c2 >= 1:
                    out += ' ' + _part(n2, c2, a2)
            return out
    raise AssertionError('unreachable')


def naturaldelta_msec(msecs: float) -> str:
    return naturaldelta(msecs / 1000)
