"""Natural-language dateparse: ports the assertion patterns of the
reference's tests/test_dateparse.py + test_parse_plugins.py date tests
(same basedate, same strings) against the from-scratch implementation in
plans/dateparse.py, then checks the QueryParser integration end-to-end.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from whoosh_novo_spark.plans.dateparse import (
    ADate,
    EnglishDateParser,
    Timespan,
    relative_days,
    relativedelta_add,
)

BASE = datetime(2010, 9, 20, 15, 16, 6, 454000)
P = EnglishDateParser()


def raw(s):
    return P.parse_ambiguous(s, BASE)


def final(s):
    return P.date_from(s, BASE)


def adate_eq(at, **kw):
    assert isinstance(at, ADate), at
    for u in ("year", "month", "day", "hour", "minute", "second", "microsecond"):
        assert getattr(at, u) == kw.get(u), (u, at, kw)


def unamb_span(ts, sargs, eargs):
    assert isinstance(ts, Timespan), ts
    assert ts.start == ADate(**sargs).floor(), (ts.start, sargs)
    assert ts.end == ADate(**eargs).ceil(), (ts.end, eargs)


def unamb(ts, **kw):
    unamb_span(ts, kw, kw)


# --- element-level (reference test_simple_dateparse/test_time/test_dmy) ---

def test_simple_dateparse():
    adate_eq(raw("2005"), year=2005)
    adate_eq(raw("200505"), year=2005, month=5)
    adate_eq(raw("20050510"), year=2005, month=5, day=10)
    adate_eq(raw("2005051001"), year=2005, month=5, day=10, hour=1)
    adate_eq(raw("200505100108"), year=2005, month=5, day=10, hour=1, minute=8)
    adate_eq(
        raw("20050510010835"),
        year=2005, month=5, day=10, hour=1, minute=8, second=35,
    )
    adate_eq(raw("2005-05"), year=2005, month=5)
    adate_eq(raw("2005 05 10"), year=2005, month=5, day=10)
    adate_eq(raw("2005.05.10.01"), year=2005, month=5, day=10, hour=1)
    adate_eq(raw("2005/05/10 01:08"), year=2005, month=5, day=10, hour=1, minute=8)
    adate_eq(
        raw("2005.05.10  01:08:35"),
        year=2005, month=5, day=10, hour=1, minute=8, second=35,
    )
    assert final("2005 02 31") is None
    assert final("2005-13-32") is None


def test_time():
    adate_eq(raw("13:05"), hour=13, minute=5)
    assert final("28:91") is None
    adate_eq(raw("3pm"), hour=15)
    adate_eq(raw("3 pm"), hour=15)
    adate_eq(raw("10pm"), hour=22)
    adate_eq(raw("3am"), hour=3)
    adate_eq(raw("3:15 am"), hour=3, minute=15)
    adate_eq(raw("5:10pm"), hour=17, minute=10)
    adate_eq(raw("12:45am"), hour=0, minute=45)
    adate_eq(raw("12:45pm"), hour=12, minute=45)
    adate_eq(raw("5:45:05 pm"), hour=17, minute=45, second=5)
    adate_eq(raw("noon"), hour=12, minute=0, second=0, microsecond=0)
    adate_eq(raw("midnight"), hour=0, minute=0, second=0, microsecond=0)
    assert final("15 am") is None
    assert final("24:00") is None
    assert final("12:65") is None


def test_dmy():
    adate_eq(raw("25 may 2011"), year=2011, month=5, day=25)
    adate_eq(raw("may 2 2011"), year=2011, month=5, day=2)
    adate_eq(raw("2011 25 may"), year=2011, month=5, day=25)
    adate_eq(raw("2011 may 5"), year=2011, month=5, day=5)
    adate_eq(raw("apr"), month=4)
    adate_eq(raw("september"), month=9)
    adate_eq(raw("2001"), year=2001)
    adate_eq(raw("july 2525"), year=2525, month=7)
    adate_eq(raw("nov 30"), month=11, day=30)
    assert final("25 2525") is None
    adate_eq(raw("25 may, 2011"), year=2011, month=5, day=25)
    adate_eq(raw("may 2nd, 2011"), year=2011, month=5, day=2)
    adate_eq(raw("2011, 25 may"), year=2011, month=5, day=25)
    adate_eq(raw("2011, may 5th"), year=2011, month=5, day=5)
    adate_eq(raw("today"), year=2010, month=9, day=20)
    adate_eq(raw("tomorrow"), year=2010, month=9, day=21)
    adate_eq(raw("yesterday"), year=2010, month=9, day=19)
    adate_eq(raw("this month"), year=2010, month=9)
    adate_eq(raw("this year"), year=2010)
    assert raw("now") == BASE


def test_plustime_and_reldate():
    assert raw("+1hr") == BASE + timedelta(hours=1)
    assert raw("+5mins") == BASE + timedelta(minutes=5)
    assert raw("+20s") == BASE + timedelta(seconds=20)
    assert raw("- 2 h") == BASE - timedelta(hours=2)
    assert raw("- 25 minutes") == BASE - timedelta(minutes=25)
    assert raw("-400 secs") == BASE - timedelta(seconds=400)
    assert raw("+1hr 5m") == BASE + timedelta(hours=1, minutes=5)
    assert raw("-8hr 12m") == BASE - timedelta(hours=8, minutes=12)
    assert raw("+1hr 12m 5s") == BASE + timedelta(hours=1, minutes=12, seconds=5)
    assert raw("+1y") == relativedelta_add(BASE, years=1)
    assert raw("+2mo") == relativedelta_add(BASE, months=2)
    assert raw("+3w") == relativedelta_add(BASE, weeks=3)
    assert raw("+5days") == relativedelta_add(BASE, days=5)
    assert raw("-6yr") == relativedelta_add(BASE, years=-6)
    assert raw("- 7 mons") == relativedelta_add(BASE, months=-7)
    assert raw("-8 wks") == relativedelta_add(BASE, weeks=-8)
    assert raw("- 9 dy") == relativedelta_add(BASE, days=-9)
    assert raw("+1y 12mo 400d") == relativedelta_add(BASE, years=2, days=400)
    assert raw("-7mo 8d") == relativedelta_add(BASE, months=-7, days=-8)
    assert raw("+1y 2d 5h 12s") == relativedelta_add(
        BASE, years=1, days=2, hours=5, seconds=12
    )


def test_relative_days():
    assert relative_days(0, 0, 1) == 7
    assert relative_days(0, 0, -1) == -7
    assert relative_days(2, 1, 1) == 6
    assert relative_days(2, 1, -1) == -1
    assert relative_days(6, 0, -1) == -6
    assert relative_days(6, 0, 1) == 1
    assert relative_days(1, 2, 1) == 1
    assert relative_days(1, 2, -1) == -6
    assert relative_days(3, 2, -1) == -1
    assert relative_days(3, 2, 1) == 6


def test_dayname():
    adate_eq(raw("next tuesday"), year=2010, month=9, day=21)
    adate_eq(raw("last tuesday"), year=2010, month=9, day=14)
    adate_eq(raw("next sunday"), year=2010, month=9, day=26)
    adate_eq(raw("last sun"), year=2010, month=9, day=19)
    adate_eq(raw("next th"), year=2010, month=9, day=23)


def test_bundle():
    adate_eq(
        raw("mar 29 1972 2:45am"), year=1972, month=3, day=29, hour=2, minute=45
    )
    adate_eq(
        raw("16:10:45 14 February 2005"),
        year=2005, month=2, day=14, hour=16, minute=10, second=45,
    )
    adate_eq(
        raw("1985 sept 12 12:01"), year=1985, month=9, day=12, hour=12, minute=1
    )
    adate_eq(raw("5pm 21st oct 2005"), year=2005, month=10, day=21, hour=17)
    adate_eq(
        raw("5:59:59pm next thur"),
        year=2010, month=9, day=23, hour=17, minute=59, second=59,
    )


def test_ranges_ambiguous():
    ts = raw("last tuesday to next tuesday")
    assert isinstance(ts, Timespan)
    adate_eq(ts.start, year=2010, month=9, day=14)
    adate_eq(ts.end, year=2010, month=9, day=21)
    ts = raw("oct 25 to feb 14")
    adate_eq(ts.start, month=10, day=25)
    adate_eq(ts.end, month=2, day=14)
    ts = raw("3am oct 12 to 5pm")
    adate_eq(ts.start, month=10, day=12, hour=3)
    adate_eq(ts.end, hour=17)
    ts = raw("feb to oct")
    adate_eq(ts.start, month=2)
    adate_eq(ts.end, month=10)
    ts = raw("2007 to 2010")
    adate_eq(ts.start, year=2007)
    adate_eq(ts.end, year=2010)
    ts = raw("-2d to +1w")
    assert ts.start == relativedelta_add(BASE, days=-2)
    assert ts.end == relativedelta_add(BASE, weeks=1)


def test_final_dates():
    unamb(final("5:10pm"), year=2010, month=9, day=20, hour=17, minute=10)
    assert final("may 32 2005") is None
    assert final("2005 may 32") is None
    assert final("2005-13-32") is None
    assert final("now") == BASE
    unamb(final("september 2024"), year=2024, month=9)


def test_final_ranges():
    unamb_span(final("feb to nov"), {"year": 2010, "month": 2}, {"year": 2010, "month": 11})
    unamb_span(
        final("2005 to 10 oct 2009"),
        {"year": 2005},
        {"year": 2009, "month": 10, "day": 10},
    )
    unamb_span(
        final("jan 12 to oct 10 2009"),
        {"year": 2009, "month": 1, "day": 12},
        {"year": 2009, "month": 10, "day": 10},
    )
    unamb_span(
        final("jan to oct 2009"), {"year": 2009, "month": 1}, {"year": 2009, "month": 10}
    )
    unamb_span(
        final("mar 2005 to oct"),
        {"year": 2005, "month": 3},
        {"year": 2010, "month": 10},
    )
    unamb_span(
        final("jan 10 to jan 25"),
        {"year": 2010, "month": 1, "day": 10},
        {"year": 2010, "month": 1, "day": 25},
    )
    unamb_span(
        final("jan 2005 to feb 2009"),
        {"year": 2005, "month": 1},
        {"year": 2009, "month": 2},
    )
    unamb_span(
        final("jan 5000 to mar"), {"year": 5000, "month": 1}, {"year": 5000, "month": 3}
    )
    unamb_span(
        final("jun 5000 to jan"), {"year": 5000, "month": 6}, {"year": 5001, "month": 1}
    )
    unamb_span(
        final("oct 2010 to feb"), {"year": 2010, "month": 10}, {"year": 2011, "month": 2}
    )
    unamb_span(
        final("5pm to 3am"),
        {"year": 2010, "month": 9, "day": 20, "hour": 17},
        {"year": 2010, "month": 9, "day": 21, "hour": 3},
    )
    unamb_span(
        final("5am to 3 am tomorrow"),
        {"year": 2010, "month": 9, "day": 20, "hour": 5},
        {"year": 2010, "month": 9, "day": 21, "hour": 3},
    )
    unamb_span(
        final("3am to 5 pm tomorrow"),
        {"year": 2010, "month": 9, "day": 21, "hour": 3},
        {"year": 2010, "month": 9, "day": 21, "hour": 17},
    )
    ts = final("-2hrs to +20min")
    assert ts.start == BASE - timedelta(hours=2)
    assert ts.end == BASE + timedelta(minutes=20)
    # out-of-order explicit years swap
    unamb_span(
        final("oct 25 2009 to feb 14 2008"),
        {"year": 2008, "month": 2, "day": 14},
        {"year": 2009, "month": 10, "day": 25},
    )
    unamb_span(
        final("oct 25 5000 to tomorrow"),
        {"year": 2010, "month": 9, "day": 21},
        {"year": 5000, "month": 10, "day": 25},
    )


def test_toend_rejects_trailing_garbage():
    assert final("blah") is None
    assert final("20055x10") is None
    assert final("2005 19 32") is None


# --- live cross-check against the imported reference parser ------------

PARITY_STRINGS = [
    "2005", "200505", "20050510", "2005051001",
    "13:05", "3pm", "12:45am", "5:45:05 pm", "noon", "midnight", "now",
    "25 may 2011", "may 2 2011", "2011 25 may", "apr", "september",
    "july 2525", "nov 30", "today", "tomorrow", "yesterday", "this month",
    "this year", "next tuesday", "last tuesday", "next th", "+1hr",
    "-8hr 12m", "+1y 12mo 400d", "- 9 dy", "mar 29 1972 2:45am",
    "16:10:45 14 February 2005", "5pm 21st oct 2005", "5:59:59pm next thur",
    "feb to nov", "2005 to 10 oct 2009", "jan 12 to oct 10 2009",
    "jan to oct 2009", "mar 2005 to oct", "jan 10 to jan 25",
    "jun 5000 to jan", "oct 2010 to feb", "5pm to 3am",
    "5am to 3 am tomorrow", "-2hrs to +20min",
    "oct 25 2009 to feb 14 2008", "oct 25 5000 to tomorrow",
    "last tuesday to next tuesday", "september 2024",
]


def test_parity_with_reference_dateparser(whoosh_ref):
    """Every string resolves to the same instant/period as the actual
    reference English parser at the same basedate."""
    from datetime import timezone

    from whoosh.qparser.dateparse import English
    from whoosh.util.times import timespan as wts

    ref = English()
    ref_base = BASE.replace(tzinfo=timezone.utc)

    def naive(dt):
        return dt.replace(tzinfo=None)

    for s in PARITY_STRINGS:
        theirs = ref.date_from(s, ref_base)
        ours = final(s)
        if isinstance(theirs, wts):
            assert isinstance(ours, Timespan), s
            assert ours.start == naive(theirs.start), s
            assert ours.end == naive(theirs.end), s
        else:
            assert isinstance(ours, datetime), (s, ours)
            assert ours == naive(theirs), s


def test_separated_iso_deviation(whoosh_ref):
    """Documented deviation: the reference's first-match bundle Choice
    commits to the Bag's bare-year prefix for dashed/dotted ISO dates, so
    its TOP-LEVEL date_from returns None ("date:2005-05" errors) even
    though its own `simple` element parses the full string.  Our
    longest-match bundle resolves these to exactly what the reference's
    simple element says they mean."""
    from datetime import timezone

    from whoosh.qparser.dateparse import English

    ref = English()
    ref_base = BASE.replace(tzinfo=timezone.utc)

    for s in ["2005-05", "2005.05.10.01", "2005/05/10 01:08", "2005.05.10  01:08:35"]:
        assert ref.date_from(s, ref_base) is None  # the reference quirk
        simple_raw = ref.simple.date_from(s, ref_base)
        assert simple_raw is not None
        theirs = simple_raw.disambiguated(ref_base)
        ours = final(s)
        assert isinstance(ours, Timespan)
        assert ours.start == theirs.start.replace(tzinfo=None), s
        assert ours.end == theirs.end.replace(tzinfo=None), s


# --- QueryParser integration (reference test_parse_plugins patterns) ----

from whoosh_novo_spark.plans import ast  # noqa: E402
from whoosh_novo_spark.plans.parser import QueryParser  # noqa: E402


def qp(**kw):
    return QueryParser(
        "text", field_types={"date": "datetime"}, basedate=BASE, **kw
    )


def iso(**kw):
    return ADate(**kw)


def floor_s(**kw):
    return ADate(**kw).floor().strftime("%Y-%m-%d %H:%M:%S.%f")


def ceil_s(**kw):
    return ADate(**kw).ceil().strftime("%Y-%m-%d %H:%M:%S.%f")


def test_qparser_quoted_date():
    q = qp().parse("hello date:'last tuesday'")
    assert isinstance(q, ast.And)
    dr = q.children[1]
    assert isinstance(dr, ast.DateRange)
    assert dr.start == floor_s(year=2010, month=9, day=14)
    assert dr.end == ceil_s(year=2010, month=9, day=14)
    assert (dr.startexcl, dr.endexcl) == (False, False)

    q = qp().parse("date:'3am to 5pm'")
    assert isinstance(q, ast.DateRange)
    assert q.start == floor_s(year=2010, month=9, day=20, hour=3)
    assert q.end == ceil_s(year=2010, month=9, day=20, hour=17)

    q = qp().parse("date:'march 24 to dec 12'")
    assert q.start == floor_s(year=2010, month=3, day=24)
    assert q.end == ceil_s(year=2010, month=12, day=12)


def test_qparser_date_errors():
    errs = []
    p = qp(date_error_callback=errs.append)
    q = p.parse("date:blah")
    assert isinstance(q, ast.NullQuery)
    # an errored date clause is DROPPED from the And (whoosh removes
    # NullQuerys in compound normalize), leaving the text term
    q = p.parse("hello date:blarg")
    assert q == ast.Term("text", "hello")
    q = p.parse("hello date:'2005 19 32'")
    assert q == ast.Term("text", "hello")
    assert errs == ["blah", "blarg", "2005 19 32"]


def test_qparser_date_ranges():
    q = qp().parse("date:['30 march' to 'next wednesday']")
    assert isinstance(q, ast.DateRange)
    assert q.start == floor_s(year=2010, month=3, day=30)
    assert q.end == ceil_s(year=2010, month=9, day=22)

    q = qp().parse("date:[to 'next wednesday']")
    assert q.start is None
    assert q.end == ceil_s(year=2010, month=9, day=22)

    q = qp().parse("date:['30 march' to]")
    assert q.start == floor_s(year=2010, month=3, day=30)
    assert q.end is None

    q = qp().parse("date:[30 march to next wednesday]")
    assert q.start == floor_s(year=2010, month=3, day=30)
    assert q.end == ceil_s(year=2010, month=9, day=22)

    q = qp().parse("date:[2008 to] AND date:[2011 to 2011]")
    assert isinstance(q, ast.And)
    a, b = q.children
    assert a.start == floor_s(year=2008) and a.end is None
    assert b.start == floor_s(year=2011) and b.end == ceil_s(year=2011)


def test_qparser_free_dates():
    p = qp(dateparse_free=True)
    q = p.parse("hello date:last tuesday")
    assert isinstance(q, ast.And)
    t, dr = q.children
    assert t == ast.Term("text", "hello")
    assert dr.start == floor_s(year=2010, month=9, day=14)
    assert dr.end == ceil_s(year=2010, month=9, day=14)

    q = p.parse("date:mar 29 1972 hello")
    dr, t = q.children
    assert dr.start == floor_s(year=1972, month=3, day=29)
    assert dr.end == ceil_s(year=1972, month=3, day=29)
    assert t == ast.Term("text", "hello")

    q = p.parse("date:2005 march 2")
    assert isinstance(q, ast.DateRange)
    assert q.start == floor_s(year=2005, month=3, day=2)
    assert q.end == ceil_s(year=2005, month=3, day=2)

    q = p.parse("date:'2005' march 2")
    assert isinstance(q, ast.And)
    assert q.children[0].start == floor_s(year=2005)
    assert q.children[0].end == ceil_s(year=2005)
    assert q.children[1] == ast.Term("text", "march")


def test_qparser_exact_instant_is_equality_term():
    # "now" and full-precision datetimes are exact instants -> Term
    q = qp().parse("date:now")
    assert q == ast.Term("date", BASE.strftime("%Y-%m-%d %H:%M:%S.%f"))
    q = qp().parse("date:'-2hrs'")
    assert q == ast.Term(
        "date", (BASE - timedelta(hours=2)).strftime("%Y-%m-%d %H:%M:%S.%f")
    )


def test_calendar_invalid_date_is_unparsable_not_crash():
    """'feb 30' (and 'feb 29' under a non-leap basedate) becomes the
    error-callback/NullQuery path, not an escaping DateParseError."""
    from datetime import datetime

    from whoosh_novo_spark.plans import ast
    from whoosh_novo_spark.plans.parser import QueryParser

    errs = []
    p = QueryParser(
        "text",
        field_types={"date": "datetime"},
        basedate=datetime(2021, 1, 5),  # non-leap year
        date_error_callback=errs.append,
    )
    q = p.parse("date:'feb 30' hello")
    assert errs == ["feb 30"]
    assert q == ast.Term("text", "hello")
    errs.clear()
    q2 = p.parse("date:'feb 29'")
    assert errs == ["feb 29"] and isinstance(q2, ast.NullQuery)
    # range endpoint variant
    errs.clear()
    q3 = p.parse("date:['feb 30' TO 'mar 2']")
    assert errs and isinstance(q3, ast.NullQuery)
