"""Natural-language date parsing for DATETIME query terms.

From-scratch implementation of the semantics of the reference's
``qparser/dateparse.py`` (980 LoC combinator framework) + the ambiguous
date model of ``util/times.py``:

- a partially-specified date ("september 2024", "2005", "nov 30") names a
  whole PERIOD: floor() .. ceil() of the unspecified units
- relative dates: "today/tomorrow/yesterday", "this month/this year",
  "next|last <weekday>", "+3w", "-1y 2d 5h", "now"
- times: 24h ("13:05:45"), 12h ("5:10pm"), "noon", "midnight"; a bare
  time applies to the basedate's day
- combinations in any order ("5pm 21st oct 2005", "16:10:45 14 feb 2005")
- ranges: "<date> to <date>" with the reference's year/month/day
  cross-completion rules (timespan.disambiguated, times.py:361-475):
  missing years copy across sides (start from end; end = max(start,
  base)), month+day copy end->start when compatible, out-of-order spans
  shift the ambiguous year or swap, same-day inverted times roll the end
  to the next day

The grammar here is a small table of compiled regexes + three combinator
helpers (_seq/_bag/first-match), NOT a port of the reference's parser-
element class hierarchy; behavior is pinned by tests/test_dateparse.py,
which ports the assertion patterns of the reference's own test suite
(reference tests/test_dateparse.py, tests/test_parse_plugins.py).
"""

from __future__ import annotations

import calendar
import re
from dataclasses import dataclass, replace
from datetime import datetime, timedelta

__all__ = [
    "ADate",
    "Timespan",
    "DateParseError",
    "EnglishDateParser",
    "relative_days",
    "relativedelta_add",
]


class DateParseError(ValueError):
    pass


_UNITS = ("year", "month", "day", "hour", "minute", "second", "microsecond")


@dataclass(frozen=True)
class ADate:
    """Ambiguous date: None = unspecified unit (times.py adatetime)."""

    year: int | None = None
    month: int | None = None
    day: int | None = None
    hour: int | None = None
    minute: int | None = None
    second: int | None = None
    microsecond: int | None = None

    def __post_init__(self):
        if self.month is not None and not 1 <= self.month <= 12:
            raise DateParseError("month out of range")
        if self.day is not None:
            if self.day < 1:
                raise DateParseError("day out of range")
            if self.year is not None and self.month is not None:
                if self.day > calendar.monthrange(self.year, self.month)[1]:
                    raise DateParseError("day out of range for month")
            elif self.day > 31:
                raise DateParseError("day out of range")
        if self.hour is not None and not 0 <= self.hour <= 23:
            raise DateParseError("hour out of range")
        if self.minute is not None and not 0 <= self.minute <= 59:
            raise DateParseError("minute out of range")
        if self.second is not None and not 0 <= self.second <= 59:
            raise DateParseError("second out of range")
        if self.microsecond is not None and not 0 <= self.microsecond <= 999999:
            raise DateParseError("microsecond out of range")

    def is_ambiguous(self) -> bool:
        return any(getattr(self, u) is None for u in _UNITS)

    def has_date(self) -> bool:
        return not (self.year is None and self.month is None and self.day is None)

    def is_void(self) -> bool:
        return all(getattr(self, u) is None for u in _UNITS)

    def floor(self) -> datetime:
        if self.year is None:
            raise DateParseError("date has no year")
        m = self.month if self.month is not None else 1
        return datetime(
            self.year,
            m,
            self.day if self.day is not None else 1,
            self.hour if self.hour is not None else 0,
            self.minute if self.minute is not None else 0,
            self.second if self.second is not None else 0,
            self.microsecond if self.microsecond is not None else 0,
        )

    def ceil(self) -> datetime:
        if self.year is None:
            raise DateParseError("date has no year")
        m = self.month if self.month is not None else 12
        return datetime(
            self.year,
            m,
            self.day if self.day is not None else calendar.monthrange(self.year, m)[1],
            self.hour if self.hour is not None else 23,
            self.minute if self.minute is not None else 59,
            self.second if self.second is not None else 59,
            self.microsecond if self.microsecond is not None else 999999,
        )

    def fix(self) -> "datetime | ADate":
        """Unambiguous -> concrete datetime; otherwise unchanged."""
        if self.is_ambiguous():
            return self
        return self.floor()


def _floor(x: "ADate | datetime") -> datetime:
    return x if isinstance(x, datetime) else x.floor()


def _ceil(x: "ADate | datetime") -> datetime:
    return x if isinstance(x, datetime) else x.ceil()


def _as_adate(x: "ADate | datetime") -> ADate:
    if isinstance(x, datetime):
        return ADate(x.year, x.month, x.day, x.hour, x.minute, x.second, x.microsecond)
    return x


def merge_units(d: "ADate | datetime", at: "ADate | datetime") -> "ADate | datetime":
    """Fill d's unspecified units from ``at`` (existing values win) and
    collapse to a datetime when fully specified — fill_in+fix semantics."""
    da, aa = _as_adate(d), _as_adate(at)
    merged = ADate(
        **{
            u: (getattr(da, u) if getattr(da, u) is not None else getattr(aa, u))
            for u in _UNITS
        }
    )
    return merged.fix()


@dataclass
class Timespan:
    start: "ADate | datetime"
    end: "ADate | datetime"

    def disambiguated(self, basedate: datetime) -> "Timespan":
        """Resolve cross-side ambiguity (times.py:361-475 rules)."""
        start, end = _as_adate(self.start), _as_adate(self.end)
        start_year_amb = start.year is None
        end_year_amb = end.year is None

        if not start.has_date() and not end.has_date():
            # times only: both sides happen on the basedate's day
            start = replace(
                start, year=basedate.year, month=basedate.month, day=basedate.day
            )
            end = replace(
                end, year=basedate.year, month=basedate.month, day=basedate.day
            )
        else:
            if start.year is None and end.year is None:
                start = replace(start, year=basedate.year)
                end = replace(end, year=basedate.year)
            elif start.year is None:
                start = replace(start, year=end.year)
            elif end.year is None:
                end = replace(end, year=max(start.year, basedate.year))

        if start.year == end.year:
            start_dm = not (start.month is None and start.day is None)
            end_dm = not (end.month is None and end.day is None)
            if end_dm and not start_dm:
                # copy month+day from the end unless that would invert the
                # times on that day; then the start happens on the basedate
                if start.floor_time_tuple() > end.ceil_time_tuple():
                    start = replace(start, month=basedate.month, day=basedate.day)
                else:
                    start = replace(start, month=end.month, day=end.day)
            elif start_dm and not end_dm:
                end = replace(end, month=basedate.month, day=basedate.day)

        if start.floor().date() > end.ceil().date():
            if start_year_amb:
                start = replace(start, year=end.year - 1)
            elif end_year_amb:
                end = replace(end, year=start.year + 1)
            else:
                start, end = end, start

        s, e = start.floor(), end.ceil()
        if s.date() == e.date() and s.time() > e.time():
            e += timedelta(days=1)
        return Timespan(s, e)


def _floor_time_tuple(self: ADate):
    return (
        self.hour or 0,
        self.minute or 0,
        self.second or 0,
        self.microsecond or 0,
    )


def _ceil_time_tuple(self: ADate):
    h = self.hour if self.hour is not None else 23
    mi = self.minute if self.minute is not None else 59
    se = self.second if self.second is not None else 59
    us = self.microsecond if self.microsecond is not None else 999999
    return (h, mi, se, us)


ADate.floor_time_tuple = _floor_time_tuple
ADate.ceil_time_tuple = _ceil_time_tuple


def relative_days(current_wday: int, wday: int, direction: int) -> int:
    """Days to the next (+1) / last (-1) given weekday (times.py:42-67)."""
    if current_wday == wday:
        return 7 * direction
    if direction == 1:
        return (wday + 7 - current_wday) % 7
    return -((current_wday + 7 - wday) % 7)


def relativedelta_add(
    dt: datetime,
    years: int = 0,
    months: int = 0,
    weeks: int = 0,
    days: int = 0,
    hours: int = 0,
    minutes: int = 0,
    seconds: int = 0,
) -> datetime:
    """Calendar-aware relative shift (dateutil.relativedelta semantics for
    the subset the date language uses): years+months move on the calendar
    with the day clamped to the target month's length, then the remaining
    units are an exact timedelta."""
    total_m = dt.year * 12 + (dt.month - 1) + years * 12 + months
    y, m = divmod(total_m, 12)
    m += 1
    d = min(dt.day, calendar.monthrange(y, m)[1])
    base = dt.replace(year=y, month=m, day=d)
    return base + timedelta(
        weeks=weeks, days=days, hours=hours, minutes=minutes, seconds=seconds
    )


# ------------------------------------------------------------ grammar
# Leaf matchers: (text, pos, base) -> (ADate|datetime|None, newpos)

_BOUND = r"(?=\W|$)"
_SEP = re.compile(r"(\s+|\s*,\s*)")

_MONTHS = [
    "january|jan",
    "february|febuary|feb",
    "march|mar",
    "april|apr",
    "may",
    "june|jun",
    "july|jul",
    "august|aug",
    "september|sept|sep",
    "october|oct",
    "november|nov",
    "december|dec",
]
_DAYNAMES = [
    "monday|mon|mo",
    "tuesday|tues|tue|tu",
    "wednesday|wed|we",
    "thursday|thur|thu|th",
    "friday|fri|fr",
    "saturday|sat|sa",
    "sunday|sun|su",
]

_RX = {
    "year": re.compile(r"(?P<year>[0-9]{4})" + _BOUND),
    "day": re.compile(r"(?P<day>([123][0-9])|[1-9])(st|nd|rd|th)?" + _BOUND, re.I),
    "month": re.compile(
        "(?P<month>" + "|".join(f"({p})" for p in _MONTHS) + ")", re.I
    ),
    "time24": re.compile(
        r"(?P<hour>([0-1][0-9])|(2[0-3])):(?P<minute>[0-5][0-9])"
        r"(:(?P<second>[0-5][0-9])(\.(?P<microsecond>[0-9]{1,5}))?)?" + _BOUND
    ),
    "time12": re.compile(
        r"(?P<hour>[1-9]|10|11|12)(:(?P<minute>[0-5][0-9])"
        r"(:(?P<second>[0-5][0-9])(\.(?P<microsecond>[0-9]{1,5}))?)?)?"
        r"\s*(?P<ampm>am|pm)" + _BOUND,
        re.I,
    ),
    "dayname": re.compile(
        r"(?P<dir>next|last)\s+(?P<day>" + "|".join(_DAYNAMES) + r")" + _BOUND, re.I
    ),
    "simple": re.compile(
        r"(?P<year>[0-9]{4})([- .:/]*(?P<month>[0-1][0-9])([- .:/T]*(?P<day>[0-3][0-9])"
        r"([- .:/T]*(?P<hour>([0-1][0-9])|(2[0-3]))([- .:/]*(?P<minute>[0-5][0-9])"
        r"([- .:/]*(?P<second>[0-5][0-9])([- .:/]*(?P<microsecond>[0-9]{6}))?)?)?)?)?)?"
        r"(?=\s|$)"
    ),
}

_PLUS_UNITS = [
    ("years", "years|year|yrs|yr|ys|y"),
    ("months", "months|month|mons|mon|mos|mo"),
    ("weeks", "weeks|week|wks|wk|ws|w"),
    ("days", "days|day|dys|dy|ds|d"),
    ("hours", "hours|hour|hrs|hr|hs|h"),
    ("minutes", "minutes|minute|mins|min|ms|m"),
    ("seconds", "seconds|second|secs|sec|s"),
]
_RX["plus"] = re.compile(
    r"(?P<dir>[+-]) *"
    + r" *".join(f"((?P<{g}>[0-9]+) *({pat}))?" for g, pat in _PLUS_UNITS)
    + _BOUND,
    re.I,
)

_MONTH_SUBEXPRS = [re.compile(p, re.I) for p in _MONTHS]
_DAYNAME_SUBEXPRS = [re.compile(p, re.I) for p in _DAYNAMES]


def _groups_to_adate(m) -> ADate | None:
    gd = m.groupdict()
    kw = {u: (int(gd[u]) if gd.get(u) is not None else None) for u in _UNITS}
    try:
        return ADate(**kw)
    except DateParseError:
        return None


def _rx_leaf(name):
    rx = _RX[name]

    def match(text, pos, base):
        m = rx.match(text, pos)
        if not m:
            return None, pos
        d = _groups_to_adate(m)
        if d is None:
            return None, pos
        return d, m.end()

    return match


def _word_leaf(pattern, build):
    rx = re.compile(pattern, re.I)

    def match(text, pos, base):
        m = rx.match(text, pos)
        if not m:
            return None, pos
        return build(base), m.end()

    return match


def _m_month(text, pos, base):
    m = _RX["month"].match(text, pos)
    if not m:
        return None, pos
    s = m.group("month")
    for i, rx in enumerate(_MONTH_SUBEXPRS):
        if rx.match(s):
            return ADate(month=i + 1), m.end()
    return None, pos


def _m_time12(text, pos, base):
    m = _RX["time12"].match(text, pos)
    if not m:
        return None, pos
    hour = int(m.group("hour"))
    isam = m.group("ampm").lower().startswith("a")
    if hour == 12:
        hour = 0 if isam else 12
    elif not isam:
        hour += 12
    mins = m.group("minute")
    secs = m.group("second")
    usecs = m.group("microsecond")
    try:
        d = ADate(
            hour=hour,
            minute=int(mins) if mins else None,
            second=int(secs) if secs else None,
            microsecond=int(usecs) if usecs else None,
        )
    except DateParseError:
        return None, pos
    return d, m.end()


def _m_dayname(text, pos, base):
    m = _RX["dayname"].match(text, pos)
    if not m:
        return None, pos
    direction = -1 if m.group("dir").lower() == "last" else 1
    for daynum, rx in enumerate(_DAYNAME_SUBEXPRS):
        if rx.match(m.group("day")):
            break
    else:
        return None, pos
    d = base.date() + timedelta(days=relative_days(base.weekday(), daynum, direction))
    return ADate(year=d.year, month=d.month, day=d.day), m.end()


def _m_plus(text, pos, base):
    m = _RX["plus"].match(text, pos)
    if not m:
        return None, pos
    sign = -1 if m.group("dir") == "-" else 1
    vals = {g: sign * int(m.group(g) or 0) for g, _ in _PLUS_UNITS}
    return relativedelta_add(base, **vals), m.end()


_m_year = _rx_leaf("year")
_m_day = _rx_leaf("day")
_m_time24 = _rx_leaf("time24")
_m_simple_seq = _rx_leaf("simple")

_m_midnight = _word_leaf(
    "midnight", lambda b: ADate(hour=0, minute=0, second=0, microsecond=0)
)
_m_noon = _word_leaf(
    "noon", lambda b: ADate(hour=12, minute=0, second=0, microsecond=0)
)
_m_now = _word_leaf("now", lambda b: b)
_m_today = _word_leaf(
    "today", lambda b: ADate(year=b.year, month=b.month, day=b.day)
)
_m_tomorrow = _word_leaf(
    "tomorrow",
    lambda b: (lambda d: ADate(year=d.year, month=d.month, day=d.day))(
        b.date() + timedelta(days=1)
    ),
)
_m_yesterday = _word_leaf(
    "yesterday",
    lambda b: (lambda d: ADate(year=d.year, month=d.month, day=d.day))(
        b.date() - timedelta(days=1)
    ),
)
_m_thisyear = _word_leaf("this year", lambda b: ADate(year=b.year))
_m_thismonth = _word_leaf("this month", lambda b: ADate(year=b.year, month=b.month))


def _seq(elements):
    """All elements in order, comma/space separated, units merged
    (first-wins); a unit conflict or calendar violation fails the whole
    sequence."""

    def match(text, pos, base):
        d: ADate | datetime = ADate()
        cur = pos
        first = True
        for el in elements:
            if not first:
                m = _SEP.match(text, cur)
                if not m:
                    return None, pos
                cur = m.end()
            r, np = el(text, cur, base)
            if r is None:
                return None, pos
            try:
                d = merge_units(d, r)
            except DateParseError:
                return None, pos
            cur = np
            first = False
        return d, cur

    return match


def _first(elements):
    def match(text, pos, base):
        for el in elements:
            r, np = el(text, pos, base)
            if r is not None:
                return r, np
        return None, pos

    return match


def _longest(elements):
    """Like _first but keeps the alternative that consumes the most text.

    Deliberate deviation from the reference's first-match Choice at the
    bundle level: whoosh's Bag matches the bare year prefix of an ISO
    dashed date ("2005-05" -> year 2005, pos 4) and the Choice then never
    tries the `simple` parser, so "date:2005-05" errors and an ISO range
    endpoint silently degrades to its year.  Longest-match picks `simple`
    there while every reference test vector still resolves identically
    (the intended alternative always consumes the most text)."""

    def match(text, pos, base):
        best, bestpos = None, pos
        for el in elements:
            r, np = el(text, pos, base)
            if r is not None and np > bestpos:
                best, bestpos = r, np
        return best, bestpos if best is not None else pos

    return match


def _bag(elements):
    """Elements in any order, each at most once, separator between."""

    def match(text, pos, base):
        d: ADate | datetime = ADate()
        seen = [False] * len(elements)
        cur = pos
        first = True
        while True:
            np = cur
            if not first:
                m = _SEP.match(text, cur)
                if not m:
                    break
                np = m.end()
            for i, el in enumerate(elements):
                if seen[i]:
                    continue
                r, xpos = el(text, np, base)
                if r is not None:
                    try:
                        d = merge_units(d, r)
                    except DateParseError:
                        return None, pos
                    cur = xpos
                    seen[i] = True
                    break
            else:
                break
            first = False
            if all(seen):
                break
        if not any(seen):
            return None, pos
        return d, cur

    return match


# dmy alternatives, longest-first (the reference's Choice order)
_dmy = _first(
    [
        _seq([_m_day, _m_month, _m_year]),
        _seq([_m_month, _m_day, _m_year]),
        _seq([_m_year, _m_month, _m_day]),
        _seq([_m_year, _m_day, _m_month]),
        _seq([_m_day, _m_month]),
        _seq([_m_month, _m_day]),
        _seq([_m_month, _m_year]),
        _m_month,
        _m_year,
        _m_dayname,
        _m_tomorrow,
        _m_yesterday,
        _m_thisyear,
        _m_thismonth,
        _m_today,
        _m_now,
    ]
)

_time = _first([_m_time12, _m_time24, _m_midnight, _m_noon, _m_now])
_datetime_bag = _bag([_time, _dmy])
_bundle = _longest([_m_plus, _datetime_bag, _m_simple_seq])

_TO_RX = re.compile(r"to", re.I)


def _torange(text, pos, base):
    a, cur = _bundle(text, pos, base)
    if a is None:
        return None, pos
    m = _SEP.match(text, cur)
    if not m:
        return None, pos
    m2 = _TO_RX.match(text, m.end())
    if not m2:
        return None, pos
    m3 = _SEP.match(text, m2.end())
    if not m3:
        return None, pos
    b, cur = _bundle(text, m3.end(), base)
    if b is None:
        return None, pos
    return Timespan(a, b), cur


_all = _longest([_torange, _bundle])


class EnglishDateParser:
    """date_from(text, basedate) -> datetime | Timespan | None.

    A concrete datetime means the text named an exact instant ("now",
    "-2hrs", a full y-m-d-h-m-s-us); a Timespan means it named a period
    (floor..ceil of the unspecified units, cross-completed for ranges)."""

    def parse_ambiguous(self, text: str, basedate: datetime):
        """Raw parse without end-anchoring or disambiguation — the form
        range endpoints need (reference range_to_dt uses the undecorated
        parser element)."""
        text = text.strip()
        d, _pos = _all(text, 0, basedate)
        return d

    def date_from(
        self, text: str, basedate: datetime, toend: bool = True
    ) -> "datetime | Timespan | None":
        text = text.strip()
        d, pos = _all(text, 0, basedate)
        if d is None or (toend and pos != len(text)):
            return None
        try:
            return self._disambiguate(d, basedate)
        except DateParseError:
            # calendar-invalid once the basedate fills unknown parts
            # ("feb 30", "feb 29" in a non-leap basedate year): unparsable,
            # not a crash — callers route it to the error callback
            return None

    def parse_prefix(self, text: str, pos: int, basedate: datetime):
        """Free-form tagging: parse as much as possible starting at pos;
        returns (disambiguated result | None, end position)."""
        d, np = _all(text, pos, basedate)
        if d is None:
            return None, pos
        try:
            return self._disambiguate(d, basedate), np
        except DateParseError:
            return None, pos

    @staticmethod
    def _disambiguate(d, basedate: datetime):
        if isinstance(d, datetime):
            return d
        if isinstance(d, Timespan):
            return d.disambiguated(basedate)
        if not d.is_ambiguous():
            return d.floor()
        return Timespan(d, d).disambiguated(basedate)
