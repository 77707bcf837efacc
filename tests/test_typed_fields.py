"""NUMERIC / DATETIME / BOOLEAN field types end-to-end (VERDICT r1 item 4).

Typed fields stay native docmap columns (the Spark answer to the
reference's tiered sortable terms, fields.py:516-997); NumericRange /
DateRange / typed equality compile to pushed-down column predicates and
compose with scored text queries through the normal boolean compiler.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from whoosh_novo_spark.operators.build import build_segment
from whoosh_novo_spark.operators.query import Index, Searcher
from whoosh_novo_spark.plans import ast
from whoosh_novo_spark.plans.parser import QueryParser
from whoosh_novo_spark.schema import FieldConfig, IndexConfig
from whoosh_novo_spark.sources.segment_store import SegmentStore

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon"]

CFG = IndexConfig(
    id_col="rid",
    fields=(
        FieldConfig("text"),
        FieldConfig("price", type="numeric"),
        FieldConfig("created", type="datetime"),
        FieldConfig("active", type="boolean"),
    ),
)


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    rows = []
    for i in range(60):
        rows.append(
            (
                f"{i:04d}",
                f"{WORDS[i % 5]} {WORDS[(i + 1) % 5]} common",
                10 * i,
                dt.datetime(2021, 1, 1) + dt.timedelta(hours=i),
                i % 3 == 0,
            )
        )
    df = spark.createDataFrame(
        rows, "rid string, text string, price long, created timestamp, active boolean"
    )
    store = SegmentStore(str(tmp_path_factory.mktemp("typed_ix")))
    build_segment(spark, df, CFG, store, partitions=2)
    ix = Index(spark, store, CFG)
    return ix, Searcher(ix)


def ids(df):
    return sorted(r["docid"] for r in df.collect())


def test_numeric_range(built):
    ix, s = built
    out = s.search(ast.NumericRange("price", 100, 200), limit=None)
    assert ids(out) == list(range(10, 21))
    assert all(r["score"] == 1.0 for r in out.collect())
    out = s.search(ast.NumericRange("price", 100, 200, startexcl=True, endexcl=True), limit=None)
    assert ids(out) == list(range(11, 20))


def test_numeric_range_pushdown(built):
    ix, s = built
    plan = (
        s.search(ast.NumericRange("price", 100, 200), limit=None)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "GreaterThanOrEqual(price,100)" in plan.replace(" ", "") or (
        "PushedFilters" in plan and "price" in plan
    )


def test_date_range(built):
    ix, s = built
    out = s.search(
        ast.DateRange("created", "2021-01-01 05:00:00", "2021-01-01 10:00:00", endexcl=True),
        limit=None,
    )
    assert ids(out) == [5, 6, 7, 8, 9]


def test_boolean_equality(built):
    ix, s = built
    out = s.search(ast.Term("active", True), limit=None)
    assert ids(out) == [i for i in range(60) if i % 3 == 0]


def test_typed_composes_with_scored_text(built):
    """And(Term, NumericRange): range filters membership, adds its boost
    to the score (whoosh And sums children scores)."""
    ix, s = built
    base = {r["docid"]: r["score"] for r in s.search(ast.Term("text", "alpha"), limit=None).collect()}
    q = ast.And((ast.Term("text", "alpha"), ast.NumericRange("price", 0, 250)))
    got = {r["docid"]: r["score"] for r in s.search(q, limit=None).collect()}
    assert set(got) == {d for d in base if d <= 25}
    for d, sc in got.items():
        assert sc == pytest.approx(base[d] + 1.0, rel=1e-9)


def test_parser_typed_syntax(built):
    ix, s = built
    p = QueryParser.for_config(CFG, default_field="text")
    q = p.parse("price:[100 TO 200]")
    assert q == ast.NumericRange("price", 100, 200)
    q = p.parse("price:>=100 AND price:<200")
    got = ids(s.search(q, limit=None))
    assert got == list(range(10, 20))
    q = p.parse("active:true")
    assert q == ast.Term("active", True)
    q = p.parse('created:[2021-01-01 TO 2021-01-02]')
    assert isinstance(q, ast.DateRange)


def test_parser_fuzzy_and_gtlt_text(built):
    ix, s = built
    p = QueryParser.for_config(CFG, default_field="text")
    q = p.parse("alpha~1")
    assert q == ast.FuzzyTerm("text", "alpha", maxdist=1)
    q = p.parse("alpha~2/3")
    assert q == ast.FuzzyTerm("text", "alpha", maxdist=2, prefixlength=3)
    q = p.parse("text:>beta")
    assert q == ast.TermRange("text", "beta", None, True, False)


def test_dateparse_lite_periods():
    """Truncated dates name whole periods (dateparse.py semantics subset)."""
    from whoosh_novo_spark.plans.parser import date_period

    assert date_period("2021") == ("2021-01-01 00:00:00", "2022-01-01 00:00:00")
    assert date_period("2021-02") == ("2021-02-01 00:00:00", "2021-03-01 00:00:00")
    assert date_period("2021-12") == ("2021-12-01 00:00:00", "2022-01-01 00:00:00")
    assert date_period("2021-01-05") == ("2021-01-05 00:00:00", "2021-01-06 00:00:00")
    assert date_period("2021-01-05 07") == ("2021-01-05 07:00:00", "2021-01-05 08:00:00")
    assert date_period("2021-01-05 07:30") == ("2021-01-05 07:30:00", "2021-01-05 07:31:00")
    assert date_period("not-a-date") is None
    assert date_period("2021-13") is None


def test_dateparse_lite_queries(built):
    """Bare/truncated date terms and ranges on a DATETIME field resolve to
    the whole named period; GtLt uses period edges."""
    ix, s = built
    p = QueryParser.for_config(CFG, default_field="text")
    # fixture: created = 2021-01-01 + i hours for i in 0..59
    q = p.parse("created:2021-01-01")
    assert ids(s.search(q, limit=None)) == list(range(0, 24))
    q = p.parse("created:[2021-01-02 TO 2021-01-03]")  # both whole days
    assert ids(s.search(q, limit=None)) == list(range(24, 60))
    # reference quirk (replicated): DateRangeNode drops the GtLt excl
    # flags and a start endpoint floors its period, so ">2021-01-01"
    # reads as ">= 2021-01-01 00:00" and includes the first day
    q = p.parse("created:>2021-01-01")
    assert ids(s.search(q, limit=None)) == list(range(0, 60))
    q = p.parse("created:<=2021-01-01")  # through the first day
    assert ids(s.search(q, limit=None)) == list(range(0, 24))
    q = p.parse('created:"2021-01-01 05"')
    # quoted form goes through phrase lexing; use unquoted hour syntax
    q = p.parse("created:2021-01-01T05")
    assert ids(s.search(q, limit=None)) == [5]


def test_numeric_range_property_random(built):
    """Random numeric ranges against a Python-computed expected set."""
    import random

    ix, s = built
    rng = random.Random(17)
    prices = {i: 10 * i for i in range(60)}
    for _ in range(15):
        lo = rng.randint(-50, 650)
        hi = lo + rng.randint(0, 400)
        sx, ex = rng.random() < 0.5, rng.random() < 0.5
        got = ids(s.search(ast.NumericRange("price", lo, hi, sx, ex), limit=None))
        want = sorted(
            d for d, p in prices.items()
            if (p > lo if sx else p >= lo) and (p < hi if ex else p <= hi)
        )
        assert got == want, (lo, hi, sx, ex)


def test_date_period_property_random():
    """date_period invariants: start < end, start parses back to the
    input prefix, and periods tile (end of month m == start of m+1)."""
    import datetime as dtm
    import random

    from whoosh_novo_spark.plans.parser import date_period

    rng = random.Random(23)
    fmt = "%Y-%m-%d %H:%M:%S"
    for _ in range(50):
        y = rng.randint(1970, 2100)
        mo = rng.randint(1, 12)
        d = rng.randint(1, 28)
        h = rng.randint(0, 23)
        for s in (f"{y}", f"{y}-{mo:02d}", f"{y}-{mo:02d}-{d:02d}",
                  f"{y}-{mo:02d}-{d:02d} {h:02d}"):
            lo, hi = date_period(s)
            a, b = dtm.datetime.strptime(lo, fmt), dtm.datetime.strptime(hi, fmt)
            assert a < b
        me = date_period(f"{y}-{mo:02d}")[1]
        nxt = (y + 1, 1) if mo == 12 else (y, mo + 1)
        assert me == date_period(f"{nxt[0]}-{nxt[1]:02d}")[0]

def test_every_typed_field(built):
    """Every(typed field) matches every live doc with a value in the
    native column (qcore.py:650-760) — typed fields have no doclens rows,
    so this goes through the docmap isNotNull path."""
    ix, s = built
    for fld in ("price", "created", "active"):
        out = s.search(ast.Every(fld), limit=None)
        assert ids(out) == list(range(60)), fld
        assert all(r["score"] == 1.0 for r in out.collect())


def test_adjacent_gtlt_ranges_with_not(built):
    """ADVICE r2: 'NOT f:>a f:<b' must stay And([Not(f>a), f<b]) — the
    reference only merges overlapping ranges AFTER the NOT structure is
    built (CompoundQuery.normalize), and never merges NumericRanges at
    all (RangeMixin.overlaps is TermRange-only)."""
    ix, s = built
    p = QueryParser.for_config(CFG, default_field="text")
    q = p.parse("NOT price:>100 price:<200")
    # membership: NOT(price>100) AND (price<200)  ->  price <= 100
    assert ids(s.search(q, limit=None)) == list(range(0, 11))
    # two separate constant-score ranges in an And keep their summed
    # boost contribution (2.0), unlike a single merged range (1.0)
    q2 = p.parse("price:>=100 price:<200")
    out = s.search(q2, limit=None)
    assert ids(out) == list(range(10, 20))
    assert all(r["score"] == pytest.approx(2.0) for r in out.collect())
