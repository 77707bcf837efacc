"""Query-language parser — the ``QueryParser`` surface of the reference.

Covers the default plugin set's common syntax
(``src/whoosh/qparser/default.py:95-111`` + plugins.py):

- whitespace-separated items grouped with the default group (And)
- infix operators with the reference's effective precedence: explicit
  ``AND`` binds tighter than ``OR``, then ``ANDNOT`` / ``ANDMAYBE`` /
  ``REQUIRE``;
  prefix ``NOT``; juxtaposition is loosest ("a b OR c" == And(a, Or(b,c)))
- ``field:term``, parenthesized groups, ``"quoted phrases"`` with
  optional ``~slop``, trailing-``*`` prefix, ``*``/``?`` wildcards,
  ``[a TO b]`` / ``{a TO b}`` ranges (constantscore, whoosh default),
  ``term^boost``
- term text is run through the field's analyzer in query mode; an input
  word that analyzes to multiple tokens becomes a group of terms (e.g.
  "big-time" -> And(big, time)); a word that analyzes to nothing (a
  stopword) is dropped

Output is the engine's own AST (plans/ast.py), verified against the
reference parser by comparing search RESULTS on identical corpora
(tests/test_parser.py) — reprs differ, semantics must not.
"""

from __future__ import annotations

import re
from datetime import datetime

from whoosh_novo_spark.functions.analysis import analyze_query_terms
from whoosh_novo_spark.plans import ast
from whoosh_novo_spark.plans.dateparse import EnglishDateParser, Timespan

_TOKEN_RX = re.compile(
    r"""
    (?P<lparen>\() | (?P<rparen>\)) |
    (?P<phrase>"(?P<phrase_body>[^"]*)"(~(?P<slop>\d+))?) |
    (?P<squote>(?:(?P<sqfield>[^\s():'\[{]+):)?'(?P<sq_body>[^']*)') |
    (?P<range>(?:(?P<rfield>[^\s():\[{]+):)?[\[{][^\]}]*[\]}]) |
    (?P<word>[^\s()]+)
    """,
    re.VERBOSE,
)

# free-form date tagging: fieldname: followed by unquoted text
# (dateparse.py DateTagger free_expr "([A-Za-z][A-Za-z_0-9]*):([^^]+)")
_FREE_FIELD_RX = re.compile(r"([A-Za-z][A-Za-z_0-9]*):(?!['\"\[{])")

# the "to" separator of a range body, per the reference RangePlugin
# (plugins.py:838-855): case-insensitive, preceded by start/whitespace/
# closing quote, followed by whitespace/quote/end
_RANGE_TO_RX = re.compile(r"(?:(?<=\s)|(?<=')|^)[tT][oO](?=\s|'|$)")

_OPS = {"AND", "OR", "NOT", "ANDNOT", "ANDMAYBE", "REQUIRE"}


def replace_boost(q: ast.Query, boost: float) -> ast.Query:
    if boost == 1.0:
        return q
    from dataclasses import replace

    return replace(q, boost=boost)


_DATE_RX = re.compile(
    r"^(\d{4})(?:-(\d{2}))?(?:-(\d{2}))?(?:[ T](\d{2}))?(?::(\d{2}))?(?::(\d{2}))?$"
)


def date_period(s: str) -> tuple[str, str] | None:
    """Truncated-date semantics (qparser/dateparse.py's 'a partial date is
    the whole period'): '2021' -> the year, '2021-03' -> the month,
    '2021-03-05' -> the day, down to the second.  Returns (start_iso,
    end_iso_EXCLUSIVE) or None if not date-shaped."""
    import datetime as dt

    m = _DATE_RX.match(s.strip())
    if not m:
        return None
    y, mo, d, h, mi, se = (int(g) if g else None for g in m.groups())
    try:
        if mo is None:
            start, end = dt.datetime(y, 1, 1), dt.datetime(y + 1, 1, 1)
        elif d is None:
            start = dt.datetime(y, mo, 1)
            end = dt.datetime(y + (mo == 12), mo % 12 + 1, 1)
        else:
            start = dt.datetime(y, mo, d, h or 0, mi or 0, se or 0)
            if h is None:
                end = start + dt.timedelta(days=1)
            elif mi is None:
                end = start + dt.timedelta(hours=1)
            elif se is None:
                end = start + dt.timedelta(minutes=1)
            else:
                end = start + dt.timedelta(seconds=1)
    except ValueError:
        return None
    fmt = "%Y-%m-%d %H:%M:%S"
    return start.strftime(fmt), end.strftime(fmt)


class QueryParser:
    def __init__(
        self,
        default_field: str,
        analyzers: dict[str, str] | None = None,
        field_types: dict[str, str] | None = None,
        basedate: datetime | None = None,
        dateparse_free: bool = False,
        date_error_callback=None,
        field_aliases: dict[str, list[str]] | None = None,
        multifield: list[str] | None = None,
        field_boosts: dict[str, float] | None = None,
        plusminus: bool = False,
        copy_fields: dict[str, str] | None = None,
        pseudo_fields: dict[str, object] | None = None,
    ):
        """``analyzers`` maps fieldname -> analyzer name (default
        'standard' for every field); ``field_types`` maps fieldname ->
        'numeric'/'datetime'/'boolean' for typed fields (ranges and bare
        terms on those compile to NumericRange/DateRange/native equality,
        like whoosh's schema-aware parsing of NUMERIC/DATETIME fields).

        Datetime fields get the full natural-language date surface
        (DateParserPlugin semantics): ``basedate`` anchors relative dates
        (default: now), ``dateparse_free`` enables unquoted multi-word
        dates after ``field:`` (free=True), ``date_error_callback`` is
        called with the text of each unparsable date (the node becomes
        NullQuery and is dropped from compounds, like the reference's
        error nodes)."""
        self.default_field = default_field
        self.analyzers = analyzers or {}
        self.field_types = field_types or {}
        self.basedate = basedate
        self.dateparse_free = dateparse_free
        self.date_error_callback = date_error_callback
        self._dateparser = EnglishDateParser()
        # FieldAliasPlugin (plugins.py:1205-1239): {real: [aliases...]}
        self._alias_of = {}
        for real, aliases in (field_aliases or {}).items():
            for a in aliases:
                self._alias_of[a] = real
        # MultifieldPlugin (plugins.py:1157-1203): unfielded leaves become
        # an Or of per-field copies; a configured field boost OVERRIDES the
        # node's own boost (set_boost semantics, default 1.0)
        self.multifield = list(multifield) if multifield else None
        self.field_boosts = field_boosts or {}
        # PlusMinusPlugin (plugins.py:1016-1079) / SimpleParser: flat
        # query, "+" marks required, "-" banned, rest optional
        self.plusminus = plusminus
        # CopyFieldPlugin (plugins.py:1241-1307): a word in a mapped field
        # becomes Or([original, same-word-in-destination-field])
        self.copy_fields = copy_fields or {}
        # PseudoFieldPlugin (plugins.py:1309-1380): "field" names mapped to
        # functions.  The reference's transform takes a syntax node; here
        # the function takes the RAW word text after "name:" and returns a
        # plans.ast.Query (or None to drop the word)
        self.pseudo_fields = pseudo_fields or {}

    @classmethod
    def simple(cls, default_field: str, **kw) -> "QueryParser":
        """The reference ``SimpleParser`` surface (default.py): no infix
        operators, +required / -banned markers, Or default group."""
        kw.setdefault("plusminus", True)
        return cls(default_field, **kw)

    def _resolve(self, field: str) -> str:
        return self._alias_of.get(field, field)

    @classmethod
    def for_config(cls, config, default_field: str | None = None, **kw) -> "QueryParser":
        """Build a parser from an IndexConfig's field declarations."""
        return cls(
            default_field or config.default_field.name,
            analyzers={f.name: f.analyzer for f in config.fields},
            field_types={
                f.name: f.type for f in config.fields if f.type != "text"
            },
            **kw,
        )

    @property
    def _base(self) -> datetime:
        return self.basedate if self.basedate is not None else datetime.now()

    def _date_error(self, text: str) -> ast.Query:
        if self.date_error_callback is not None:
            self.date_error_callback(text)
        return ast.NULL

    def _analyzer(self, field: str) -> str:
        return self.analyzers.get(field, "standard")

    def _type(self, field: str) -> str:
        return self.field_types.get(field, "text")

    def _typed_value(self, field: str, s: str):
        t = self._type(field)
        if t == "numeric":
            try:
                return int(s)
            except ValueError:
                return float(s)
        if t == "boolean":
            return s.strip().lower() in ("true", "yes", "1", "t")
        return s  # datetime: ISO string, cast by the compiler

    # ------------------------------------------------------------ lexing
    def _lex(self, s: str) -> list:
        out = []
        pos, n = 0, len(s)
        while pos < n:
            if s[pos].isspace():
                pos += 1
                continue
            # free-form date tagging (DateParserPlugin free=True): on a
            # datetime field, the date expression may span several
            # whitespace-separated words after "field:" — parse as much of
            # the RAW string as possible (dateparse.py DateTagger.match)
            if self.dateparse_free:
                fm = _FREE_FIELD_RX.match(s, pos)
                if fm and self._type(self._resolve(fm.group(1))) == "datetime":
                    d, np = self._dateparser.parse_prefix(s, fm.end(), self._base)
                    if d is not None:
                        out.append(("dtvalue", self._resolve(fm.group(1)), d))
                        pos = np
                        continue
            m = _TOKEN_RX.match(s, pos)
            if m is None:
                pos += 1
                continue
            pos = m.end()
            if m.group("lparen"):
                out.append(("(",))
            elif m.group("rparen"):
                out.append((")",))
            elif m.group("phrase") is not None:
                out.append(("phrase", m.group("phrase_body"), int(m.group("slop") or 1)))
            elif m.group("squote") is not None:
                out.append(("squote", m.group("sq_body"), m.group("sqfield")))
            elif m.group("range") is not None:
                body = m.group("range")
                rfield = m.group("rfield")
                if rfield:
                    body = body[len(rfield) + 1 :]
                out.append(("range", body, rfield))
            else:
                w = m.group("word")
                if w in _OPS:
                    out.append(("op", w))
                else:
                    out.append(("word", w))
        return out

    # ------------------------------------------------------------ parsing
    def parse(self, s: str) -> ast.Query:
        if self.plusminus:
            return self._parse_plusminus(s)
        toks = self._lex(s)
        items, _ = self._parse_group(toks, 0)
        return self._combine(items).normalize()

    def _parse_plusminus(self, s: str) -> ast.Query:
        """PlusMinusPlugin.do_plusminus (plugins.py:1044-1079) over a flat
        token stream (the SimpleParser shape: no infix operators — AND/OR
        parse as plain words, which the stop filter then drops): "+" marks
        the next node required, "-" banned, everything else optional;
        result = AndNot(AndMaybe(And(required), Or(optional)), Or(banned))
        with empty groups normalized away."""
        toks = self._lex(s)
        required: list[ast.Query] = []
        optional: list[ast.Query] = []
        banned: list[ast.Query] = []
        nxt = None  # bucket chosen by a preceding marker

        def leaf(t) -> ast.Query | None:
            if t[0] == "phrase":
                return self._phrase(t[1], t[2])
            if t[0] == "squote":
                return self._squote(t[1], t[2])
            if t[0] == "dtvalue":
                return self._date_value_query(t[1], t[2])
            if t[0] == "range":
                return self._range(t[1], t[2])
            if t[0] == "op":  # no OperatorsPlugin: AND/OR are plain words
                return self._word(t[1].lower())
            if t[0] in ("(", ")"):  # no GroupPlugin in SimpleParser
                return None
            return self._word(t[1])

        for t in toks:
            if t[0] == "word" or (t[0] not in ("(", ")", "op", "phrase", "squote", "dtvalue", "range")):
                w = t[1]
                if w in ("+", "-"):
                    nxt = required if w == "+" else banned
                    continue
                if len(w) > 1 and w[0] in "+-":
                    (required if w[0] == "+" else banned).append(self._word(w[1:]))
                    nxt = None
                    continue
            q = leaf(t)
            if q is None:
                continue
            (nxt if nxt is not None else optional).append(q)
            nxt = None

        group: ast.Query = ast.Or(tuple(optional)) if optional else ast.NULL
        if required:
            req = ast.And(tuple(required))
            group = req if isinstance(group, ast.NullQuery) else ast.AndMaybe(req, group)
        if banned:
            group = ast.AndNot(group, ast.Or(tuple(banned)))
        return group.normalize()

    def _parse_group(self, toks, i):
        """Returns (items, next_index); items are ('q', Query) or ('op', name)."""
        items = []
        while i < len(toks):
            t = toks[i]
            if t[0] == "(":
                inner, i = self._parse_group(toks, i + 1)
                items.append(("q", self._combine(inner)))
            elif t[0] == ")":
                return items, i + 1
            elif t[0] == "op":
                items.append(("op", t[1]))
                i += 1
            elif t[0] == "phrase":
                items.append(("q", self._phrase(t[1], t[2])))
                i += 1
            elif t[0] == "squote":
                items.append(("q", self._squote(t[1], t[2])))
                i += 1
            elif t[0] == "dtvalue":
                items.append(("q", self._date_value_query(t[1], t[2])))
                i += 1
            elif t[0] == "range":
                items.append(("q", self._range(t[1], t[2])))
                i += 1
            else:
                items.append(("q", self._word(t[1])))
                i += 1
        return items, i

    def _combine(self, items) -> ast.Query:
        # stopword-only words analyze to nothing: the reference parser
        # drops the node entirely (the query still matches on the rest)
        items = [
            it for it in items
            if not (it[0] == "q" and isinstance(it[1], ast.NullQuery))
        ]
        # NOTE: adjacent GtLt ranges are NOT merged here — the reference's
        # GtLtPlugin emits separate RangeNodes, and the merge of OVERLAPPING
        # TermRanges happens later in CompoundQuery.normalize (replicated in
        # ast.And/Or.normalize), after NOT structure is resolved, so
        # "NOT f:>a f:<b" stays And([Not(f>a), f<b]) like the reference
        # 1. prefix NOT
        out = []
        i = 0
        while i < len(items):
            kind, v = items[i]
            if kind == "op" and v == "NOT":
                if i + 1 < len(items) and items[i + 1][0] == "q":
                    out.append(("q", ast.Not(items[i + 1][1])))
                    i += 2
                    continue
                i += 1
                continue
            out.append(items[i])
            i += 1
        # 2. infix operators in precedence order; each consumes its two
        #    neighbors (whoosh InfixOperator), same-type neighbors merge
        for opname, cls in (
            ("AND", ast.And),
            ("OR", ast.Or),
            ("ANDNOT", ast.AndNot),
            ("ANDMAYBE", ast.AndMaybe),
            # OperatorsPlugin default set includes REQUIRE (plugins.py:
            # 941+: Require pattern registered unless clean=True)
            ("REQUIRE", ast.Require),
        ):
            j = 1
            while j < len(out) - 0:
                if j < len(out) and out[j] == ("op", opname):
                    if j - 1 >= 0 and j + 1 < len(out) and out[j - 1][0] == "q" and out[j + 1][0] == "q":
                        a, b = out[j - 1][1], out[j + 1][1]
                        if cls in (ast.And, ast.Or):
                            kids = (
                                list(a.children) if isinstance(a, cls) else [a]
                            ) + [b]
                            merged = cls(tuple(kids))
                        else:
                            merged = cls(a, b)
                        out[j - 1 : j + 2] = [("q", merged)]
                        continue
                    else:
                        del out[j]
                        continue
                j += 1
        qs = [v for k, v in out if k == "q"]
        if not qs:
            return ast.NULL
        if len(qs) == 1:
            return qs[0]
        return ast.And(tuple(qs))  # default group

    # ------------------------------------------------------------ leaves
    def _set_boost(self, q: ast.Query, b: float) -> ast.Query:
        from dataclasses import replace as _replace

        try:
            return _replace(q, boost=float(b))
        except TypeError:
            return q

    def _fan_multifield(self, build) -> ast.Query:
        """Or of per-field copies of an unfielded leaf.  The configured
        field boost MULTIPLIES the leaf's own parsed boost (the reference
        applies BoostPlugin, priority 510, after MultifieldPlugin, 110 —
        so a user's trailing caret in 'term^5' survives on top of the
        field boost; r3 ADVICE)."""
        kids = []
        for f in self.multifield:
            q = build(self._resolve(f))
            if isinstance(q, ast.NullQuery):
                continue
            leaf_boost = float(getattr(q, "boost", 1.0) or 1.0)
            kids.append(
                self._set_boost(q, leaf_boost * self.field_boosts.get(f, 1.0))
            )
        if not kids:
            return ast.NULL
        if len(kids) == 1:
            return kids[0]
        return ast.Or(tuple(kids))

    def _word(self, w: str) -> ast.Query:
        explicit = None
        if ":" in w:
            f, rest = w.split(":", 1)
            if f and rest:
                if f in self.pseudo_fields:
                    q = self.pseudo_fields[f](rest)
                    return q if q is not None else ast.NULL
                explicit, w = self._resolve(f), rest
        if explicit is None and self.multifield:
            word = w
            return self._fan_multifield(lambda f: self._word_in_field(f, word))
        field = explicit or self.default_field
        q = self._word_in_field(field, w)
        dest = self.copy_fields.get(field)
        if dest is not None:
            q2 = self._word_in_field(self._resolve(dest), w)
            if isinstance(q, ast.NullQuery):
                return q2
            if not isinstance(q2, ast.NullQuery):
                return ast.Or((q, q2))
        return q

    def _word_in_field(self, field: str, w: str) -> ast.Query:
        boost = 1.0
        m = re.search(r"\^(\d+(\.\d+)?)$", w)
        if m:
            boost = float(m.group(1))
            w = w[: m.start()]
        # GtLtPlugin (qparser/plugins.py GtLtPlugin): field:>x field:>=x ...
        gm = re.match(r"^(>=|<=|>|<)(.+)$", w)
        if gm:
            op, val = gm.group(1), gm.group(2)
            rng = {
                ">": (val, None, True, False),
                ">=": (val, None, False, False),
                "<": (None, val, False, True),
                "<=": (None, val, False, False),
            }[op]
            q = self._make_range(field, rng[0], rng[1], rng[2], rng[3])
            return replace_boost(q, boost)
        # FuzzyTermPlugin: word~ word~n word~n/p
        fm = re.match(r"^(.+?)~(\d*)(?:/(\d+))?$", w)
        if fm and self._type(field) == "text":
            text = self._qtext(field, fm.group(1))
            kw = {}
            if fm.group(2):
                kw["maxdist"] = int(fm.group(2))
            if fm.group(3):
                kw["prefixlength"] = int(fm.group(3))
            return ast.FuzzyTerm(field, text, boost=boost, **kw)
        if w == "*":
            return ast.Every(field, boost=boost)
        # RegexPlugin (plugins.py:197-215): r"termexpr"
        if len(w) > 3 and w.startswith('r"') and w.endswith('"'):
            return ast.Regex(field, w[2:-1], boost=boost)
        if self._type(field) == "datetime":
            # full natural-language dateparse (the whole token must parse,
            # reference text_to_dt: date_from with ToEnd); a period becomes
            # an inclusive floor..ceil DateRange, an instant an equality
            d = self._dateparser.date_from(w, self._base)
            if d is None:
                return self._date_error(w)
            return self._date_value_query(field, d)
        if self._type(field) != "text":
            return ast.Term(field, self._typed_value(field, w), boost=boost)
        if "*" in w or "?" in w:
            if w.endswith("*") and "*" not in w[:-1] and "?" not in w:
                return ast.Prefix(field, self._qtext(field, w[:-1]), boost=boost)
            return ast.Wildcard(field, w.lower(), boost=boost)
        terms = analyze_query_terms(w, self._analyzer(field))
        if not terms:
            return ast.NULL
        if len(terms) == 1:
            return ast.Term(field, terms[0], boost=boost)
        return ast.And(tuple(ast.Term(field, t, boost=boost) for t in terms))

    def _qtext(self, field: str, w: str) -> str:
        got = analyze_query_terms(w, self._analyzer(field))
        return got[0] if got else w.lower()

    @staticmethod
    def _iso(dt: datetime) -> str:
        return dt.strftime("%Y-%m-%d %H:%M:%S.%f")

    def _date_value_query(self, field: str, d) -> ast.Query:
        """DateTimeNode.query semantics (dateparse.py:908-933): a concrete
        datetime is an exact-instant Term, a timespan an inclusive
        DateRange; the node's boost is hardwired to 1.0 in the reference
        (DateTimeNode.__init__), replicated here."""
        if isinstance(d, Timespan):
            return ast.DateRange(field, self._iso(d.start), self._iso(d.end), False, False)
        return ast.Term(field, self._iso(d))

    def _squote(self, body: str, sqfield: str | None) -> ast.Query:
        """Single-quoted text (SingleQuotePlugin): one verbatim chunk.  On
        a datetime field the whole chunk is a date expression
        ("created:'last tuesday'"); otherwise it analyzes like a word."""
        field = self._resolve(sqfield) if sqfield else self.default_field
        if self._type(field) == "datetime":
            d = self._dateparser.date_from(body, self._base)
            if d is None:
                return self._date_error(body)
            return self._date_value_query(field, d)
        if self._type(field) != "text":
            return ast.Term(field, self._typed_value(field, body))
        terms = analyze_query_terms(body, self._analyzer(field))
        if not terms:
            return ast.NULL
        if len(terms) == 1:
            return ast.Term(field, terms[0])
        return ast.And(tuple(ast.Term(field, t) for t in terms))

    def _phrase(self, body: str, slop: int) -> ast.Query:
        def one(field: str) -> ast.Query:
            words = analyze_query_terms(body, self._analyzer(field))
            if not words:
                return ast.NULL
            return ast.Phrase(field, tuple(words), slop=slop)

        if self.multifield:
            return self._fan_multifield(one)
        return one(self.default_field)

    def _range(self, body: str, rfield: str | None = None) -> ast.Query:
        startexcl = body[0] == "{"
        endexcl = body[-1] == "}"
        inner = body[1:-1].strip()
        m = _RANGE_TO_RX.search(inner)
        if m:
            s, e = inner[: m.start()], inner[m.end() :]
        else:
            s = e = inner  # point range

        def clean(x: str) -> str | None:
            x = x.strip()
            if len(x) >= 2 and x[0] == "'" and x[-1] == "'":
                x = x[1:-1].strip()
            return x or None

        s, e = clean(s), clean(e)
        field = self._resolve(rfield) if rfield else None
        if field is None and s and ":" in s:
            f, s = s.split(":", 1)
            field = self._resolve(f)
        if field is None and self.multifield:
            s0, e0 = s, e
            return self._fan_multifield(
                lambda f: self._make_range(f, s0, e0, startexcl, endexcl)
            )
        return self._make_range(
            field or self.default_field, s, e, startexcl, endexcl
        )

    def _make_range(self, field, s, e, startexcl, endexcl) -> ast.Query:
        t = self._type(field)
        if t == "numeric":
            return ast.NumericRange(
                field,
                self._typed_value(field, s) if s else None,
                self._typed_value(field, e) if e else None,
                startexcl,
                endexcl,
            )
        if t == "datetime":
            # range_to_dt semantics (dateparse.py:850-877): endpoints are
            # parsed WITHOUT end-anchoring or disambiguation; a two-sided
            # range cross-completes as one timespan, a one-sided range
            # floors (start) / ceils (end) its own side.  The reference's
            # DateRangeNode drops the excl flags — endpoints are always
            # inclusive (replicated quirk: "created:>X" reads as ">= floor
            # of X's period").
            base = self._base
            raw_s = self._dateparser.parse_ambiguous(s, base) if s else None
            raw_e = self._dateparser.parse_ambiguous(e, base) if e else None
            if (s and raw_s is None) or (e and raw_e is None):
                return self._date_error(s if raw_s is None and s else e)
            if isinstance(raw_s, Timespan) or isinstance(raw_e, Timespan):
                return self._date_error(s if isinstance(raw_s, Timespan) else e)
            from whoosh_novo_spark.plans.dateparse import DateParseError

            lo = hi = None
            try:
                if raw_s is not None and raw_e is not None:
                    ts = Timespan(raw_s, raw_e).disambiguated(base)
                    lo, hi = ts.start, ts.end
                elif raw_s is not None:
                    d = EnglishDateParser._disambiguate(raw_s, base)
                    lo = d.start if isinstance(d, Timespan) else d
                elif raw_e is not None:
                    d = EnglishDateParser._disambiguate(raw_e, base)
                    hi = d.end if isinstance(d, Timespan) else d
                else:
                    return ast.NULL
            except DateParseError:
                # calendar-invalid endpoint once disambiguated ("feb 30")
                return self._date_error(s or e)
            return ast.DateRange(
                field,
                self._iso(lo) if lo is not None else None,
                self._iso(hi) if hi is not None else None,
                False,
                False,
            )
        lo = self._qtext(field, s) if s else None
        hi = self._qtext(field, e) if e else None
        return ast.TermRange(field, lo, hi, startexcl, endexcl)
