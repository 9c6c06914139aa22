"""Date-math expressions — the reference's `now-7d/d` grammar
(es/common/time/DateMathParser.java): an anchor (`now` or an explicit
date followed by `||`) and a chain of `+N<unit>` / `-N<unit>` shifts and
`/<unit>` roundings. Units: y M w d h H m s (M = month, m = minute;
weeks round to the ISO Monday as the reference does).

Used by the `date_index_name` processor and range filters over
timestamp columns; pure function of (expr, now) so pipelines stay
deterministic and resumable — callers pass `now` explicitly.
"""

from __future__ import annotations

import re

import pandas as pd

_OP_RE = re.compile(r"([+\-/])(\d*)([yMwdhHms])")

_SHIFT_KW = {
    "y": "years", "M": "months", "w": "weeks", "d": "days",
    "h": "hours", "H": "hours", "m": "minutes", "s": "seconds",
}


def _round_down(ts: pd.Timestamp, unit: str) -> pd.Timestamp:
    if unit == "y":
        return ts.replace(month=1, day=1, hour=0, minute=0, second=0,
                          microsecond=0, nanosecond=0)
    if unit == "M":
        return ts.replace(day=1, hour=0, minute=0, second=0,
                          microsecond=0, nanosecond=0)
    if unit == "w":
        floored = ts.normalize()
        return floored - pd.Timedelta(days=floored.weekday())
    freq = {"d": "D", "h": "h", "H": "h", "m": "min", "s": "s"}[unit]
    return ts.floor(freq)


def _round_up(ts: pd.Timestamp, unit: str) -> pd.Timestamp:
    """Round to the LAST instant of the unit (the reference's round-up
    used for the upper bound of range queries: `lte: now/d`)."""
    down = _round_down(ts, unit)
    if unit == "y":
        nxt = down + pd.DateOffset(years=1)
    elif unit == "M":
        nxt = down + pd.DateOffset(months=1)
    elif unit == "w":
        nxt = down + pd.Timedelta(weeks=1)
    else:
        nxt = down + pd.Timedelta(
            **{_SHIFT_KW[unit].rstrip("s") + "s": 1}
        )
    return nxt - pd.Timedelta(milliseconds=1)


def parse_date_math(expr: str, now=None, roundup: bool = False) -> pd.Timestamp:
    """Evaluate a date-math expression to a Timestamp.

    `roundup=False` rounds `/unit` down to the unit start (the behavior
    for `gte`/date_index_name); `roundup=True` rounds to the last
    millisecond of the unit (for `lt`/`lte` upper bounds) — matching
    DateMathParser.parseDateTime(roundUpProperty).
    """
    expr = expr.strip()
    if expr.startswith("now"):
        if now is None:
            raise ValueError("expression anchored at 'now' needs an explicit now=")
        ts = pd.Timestamp(now)
        rest = expr[3:]
    else:
        anchor, sep, rest = expr.partition("||")
        ts = pd.Timestamp(anchor)
        if not sep:
            rest = ""
    pos = 0
    for m in _OP_RE.finditer(rest):
        if m.start() != pos:
            raise ValueError(f"bad date math at {rest[pos:]!r} in {expr!r}")
        pos = m.end()
        op, num, unit = m.groups()
        if op == "/":
            if num:
                raise ValueError(f"rounding takes no number: {m.group()!r}")
            ts = _round_up(ts, unit) if roundup else _round_down(ts, unit)
        else:
            n = int(num) if num else 1
            if op == "-":
                n = -n
            ts = ts + pd.DateOffset(**{_SHIFT_KW[unit]: n})
    if pos != len(rest):
        raise ValueError(f"bad date math tail {rest[pos:]!r} in {expr!r}")
    return ts


def date_range_filter(ds, col: str, gte: str | None = None,
                      lt: str | None = None, lte: str | None = None,
                      gt: str | None = None, now=None):
    """Range filter over a timestamp column where bounds are date-math
    strings (`"now-7d/d"`, `"2026-01-01||+1M"`). Lower bounds round
    down, upper bounds round up — RangeQueryBuilder's date behavior.
    Pure map-side filter (streams at any scale)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    lo = parse_date_math(gte, now) if gte else (
        parse_date_math(gt, now, roundup=True) if gt else None)
    hi = parse_date_math(lte, now, roundup=True) if lte else (
        parse_date_math(lt, now) if lt else None)

    def flt(t: pa.Table) -> pa.Table:
        c = t[col]
        unit = getattr(c.type, "unit", "us")
        m = pc.equal(pc.is_valid(c), True)
        if lo is not None:
            m = pc.and_(m, (pc.greater_equal if gte else pc.greater)(
                c, pa.scalar(lo.to_pydatetime(), pa.timestamp(unit))))
        if hi is not None:
            m = pc.and_(m, (pc.less_equal if lte else pc.less)(
                c, pa.scalar(hi.to_pydatetime(), pa.timestamp(unit))))
        return t.filter(m)

    return ds.map_batches(flt, batch_format="pyarrow")
