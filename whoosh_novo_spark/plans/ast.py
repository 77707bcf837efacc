"""Query AST + logical rewrites.

A small dataclass tree standing in for ``whoosh.query`` objects
(``/root/reference/src/whoosh/query/``).  Catalyst never sees the query
language: the compiler in ``operators/query.py`` turns this tree into
DataFrame plans, so all whoosh-specific rewrites happen here
(the reference's ``q.normalize()`` pass, SURVEY §4.1).

Rewrites implemented (reference cites):
- flatten nested And/And and Or/Or (compound.py:116-126)
- duplicate-subquery dedup (compound.py:160-169)
- NullQuery elimination; empty compound -> Null; single child unwrap
  (compound.py:128-130, 171-184)
- And([a, Not(b), ...]) -> AndNot(And([a, ...]), Or([b...]))
  (wrappers.py:76-145 semantics: Not only filters within an intersection)
- Phrase with one word -> Term (positional.py:202-218)
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace


class Query:
    boost: float = 1.0

    def normalize(self) -> "Query":
        return self


@dataclass(frozen=True)
class NullQuery(Query):
    pass


NULL = NullQuery()


@dataclass(frozen=True)
class Term(Query):
    fieldname: str
    text: str
    boost: float = 1.0


@dataclass(frozen=True)
class Every(Query):
    """All documents with any term in the field (qcore.py:650-760)."""

    fieldname: str = "*"
    boost: float = 1.0


@dataclass(frozen=True)
class Prefix(Query):
    fieldname: str
    text: str
    boost: float = 1.0


@dataclass(frozen=True)
class Wildcard(Query):
    """Glob pattern: ``*`` and ``?`` (terms.py:333-376)."""

    fieldname: str
    text: str
    boost: float = 1.0


@dataclass(frozen=True)
class Regex(Query):
    fieldname: str
    text: str
    boost: float = 1.0


@dataclass(frozen=True)
class FuzzyTerm(Query):
    """Terms within edit distance maxdist sharing ``prefixlength`` prefix
    (terms.py:436-519).  ``constantscore=True`` (the reference default,
    terms.py:448): when the lexicon expansion yields >1 term, matching
    docs score a constant ``boost`` (weighting=None Or, terms.py:230-239);
    a single expansion falls through to a normally-scored Term."""

    fieldname: str
    text: str
    maxdist: int = 1
    prefixlength: int = 1
    boost: float = 1.0
    constantscore: bool = True


@dataclass(frozen=True)
class TermRange(Query):
    """Lexicographic term range (ranges.py:144-242); constantscore=True is
    the reference default (same semantics as FuzzyTerm above)."""

    fieldname: str
    start: str | None
    end: str | None
    startexcl: bool = False
    endexcl: bool = False
    boost: float = 1.0
    constantscore: bool = True


@dataclass(frozen=True)
class Variations(Query):
    """Morphological variations of a word in the field (terms.py:522-570):
    search every lexicon-present variant, scored like an Or of Terms.
    ``variants`` overrides the built-in English inflector
    (functions/variations.py) with an explicit set."""

    fieldname: str
    text: str
    boost: float = 1.0
    variants: tuple[str, ...] | None = None


@dataclass(frozen=True)
class NumericRange(Query):
    """Range over a NUMERIC field (ranges.py:244-394).  The reference
    compiles this to tiered term queries; here numeric fields are native
    columns, so the compiler emits a pushed-down column predicate.
    constantscore=True is the reference default (score = boost)."""

    fieldname: str
    start: float | int | None
    end: float | int | None
    startexcl: bool = False
    endexcl: bool = False
    boost: float = 1.0
    constantscore: bool = True


@dataclass(frozen=True)
class DateRange(Query):
    """Range over a DATETIME field (ranges.py:397-480): NumericRange over
    the timestamp representation.  start/end: ISO strings or datetimes."""

    fieldname: str
    start: object = None
    end: object = None
    startexcl: bool = False
    endexcl: bool = False
    boost: float = 1.0
    constantscore: bool = True


@dataclass(frozen=True)
class Phrase(Query):
    """Words must appear with consecutive (renumbered) positions within
    ``slop`` (positional.py:237-271 -> SpanNear2 spans.py:530-700)."""

    fieldname: str
    words: tuple[str, ...]
    slop: int = 1
    boost: float = 1.0

    def normalize(self) -> Query:
        if len(self.words) == 0:
            return NULL
        if len(self.words) == 1:
            return Term(self.fieldname, self.words[0], self.boost)
        return self


def _norm_children(children) -> list[Query]:
    return [c.normalize() for c in children]


# --- overlapping-range merge (compound.py:137-158 + ranges.py:88-143) ---
#
# The reference merges OVERLAPPING TermRanges on the same field during
# CompoundQuery.normalize (intersect for And, union for Or) — after the
# NOT/operator structure exists, so a Not(range) is never merged with a
# sibling range (it isn't a range node).  RangeMixin.overlaps returns
# False for anything that is not a TermRange, so NumericRange/DateRange
# never merge — replicated here for parity.

def _cstart(r):
    # (rank, value, tie): rank 0 = unbounded-low, 2 = unbounded-high;
    # tie +1 models startexcl (ranges.py:_comparable_start)
    if r.start is None:
        return (0, "", 0)
    return (1, r.start, 1 if r.startexcl else 0)


def _cend(r):
    if r.end is None:
        return (2, "", 0)
    return (1, r.end, -1 if r.endexcl else 0)


def _ranges_overlap(a: "TermRange", b: "TermRange") -> bool:
    s1, e1, s2, e2 = _cstart(a), _cend(a), _cstart(b), _cend(b)
    return (
        (s2 <= s1 <= e2)
        or (s2 <= e1 <= e2)
        or (s1 <= s2 <= e1)
        or (s1 <= e2 <= e1)
    )


def _merge_two_ranges(a: "TermRange", b: "TermRange", intersect: bool) -> "TermRange":
    s1, e1, s2, e2 = _cstart(a), _cend(a), _cstart(b), _cend(b)
    if s1 >= s2 and e1 <= e2:
        s, e = s2, e2
    elif s2 >= s1 and e2 <= e1:
        s, e = s1, e1
    elif intersect:
        s, e = max(s1, s2), min(e1, e2)
    else:
        s, e = min(s1, s2), max(e1, e2)
    return TermRange(
        a.fieldname,
        None if s[0] == 0 else s[1],
        None if e[0] == 2 else e[1],
        startexcl=s[2] == 1,
        endexcl=e[2] == -1,
        boost=max(a.boost, b.boost),
        constantscore=a.constantscore or b.constantscore,
    )


def _merge_ranges(kids: list[Query], intersect: bool) -> list[Query]:
    out: list[Query] = []
    i = 0
    kids = list(kids)
    while i < len(kids):
        q = kids[i]
        if isinstance(q, TermRange) and type(q) is TermRange:
            j = i + 1
            while j < len(kids):
                o = kids[j]
                if (
                    isinstance(o, TermRange)
                    and type(o) is TermRange
                    and o.fieldname == q.fieldname
                    and _ranges_overlap(q, o)
                ):
                    q = _merge_two_ranges(q, kids.pop(j), intersect)
                else:
                    j += 1
        out.append(q)
        i += 1
    return out


@dataclass(frozen=True)
class And(Query):
    children: tuple[Query, ...]
    boost: float = 1.0

    def normalize(self) -> Query:
        kids: list[Query] = []
        for c in _norm_children(self.children):
            if isinstance(c, NullQuery):
                # whoosh compound normalize REMOVES NullQuerys
                # (compound.py:171-172): a null clause (stopword-only term,
                # unparsable date) is ignored, not an empty intersection
                continue
            if isinstance(c, And):
                kids.extend(c.children)
            else:
                # Not children stay in place: whoosh's And over a Not
                # child ADDS the InverseMatcher's boost to the score
                # (wrappers.py:76-145), so a plain AndNot rewrite would
                # lose the score offset — the compiler handles Not
                # children with an anti-join + constant offset instead
                kids.append(c)
        kids = _merge_ranges(_dedup(kids), intersect=True)
        if not kids:
            return NULL
        if len(kids) == 1:
            return kids[0]
        return And(tuple(kids), self.boost)


@dataclass(frozen=True)
class Or(Query):
    children: tuple[Query, ...]
    boost: float = 1.0
    minmatch: int = 0

    def normalize(self) -> Query:
        kids: list[Query] = []
        for c in _norm_children(self.children):
            if isinstance(c, NullQuery):
                continue
            if isinstance(c, Or) and c.minmatch == 0:
                kids.extend(c.children)
            else:
                kids.append(c)
        kids = _merge_ranges(_dedup(kids), intersect=False)
        if not kids:
            return NULL
        if len(kids) == 1 and self.minmatch <= 1:
            return kids[0]
        return Or(tuple(kids), self.boost, self.minmatch)


@dataclass(frozen=True)
class DisjunctionMax(Query):
    """Score = max over children (+ tiebreak * sum-of-rest)
    (binary.py:298-402)."""

    children: tuple[Query, ...]
    boost: float = 1.0
    tiebreak: float = 0.0

    def normalize(self) -> Query:
        kids = [c for c in _norm_children(self.children) if not isinstance(c, NullQuery)]
        kids = _dedup(kids)
        if not kids:
            return NULL
        if len(kids) == 1:
            return kids[0]
        return DisjunctionMax(tuple(kids), self.boost, self.tiebreak)


@dataclass(frozen=True)
class Not(Query):
    child: Query
    boost: float = 1.0

    def normalize(self) -> Query:
        c = self.child.normalize()
        if isinstance(c, NullQuery):
            return NULL
        return Not(c, self.boost)


@dataclass(frozen=True)
class AndNot(Query):
    """a minus b, scored by a (binary.py:559-674)."""

    a: Query
    b: Query
    boost: float = 1.0

    def normalize(self) -> Query:
        a, b = self.a.normalize(), self.b.normalize()
        if isinstance(a, NullQuery):
            return NULL
        if isinstance(b, NullQuery):
            return a  # AndNot(a, Null) -> a (compound.py:558-570)
        return AndNot(a, b, self.boost)


@dataclass(frozen=True)
class AndMaybe(Query):
    """a required; b's score added when it matches the same doc
    (binary.py:677-794)."""

    a: Query
    b: Query
    boost: float = 1.0

    def normalize(self) -> Query:
        a, b = self.a.normalize(), self.b.normalize()
        if isinstance(a, NullQuery):
            return NULL
        if isinstance(b, NullQuery):
            return a
        return AndMaybe(a, b, self.boost)


@dataclass(frozen=True)
class Require(Query):
    """Docs in a∩b scored only by a (wrappers.py:420-483)."""

    a: Query
    b: Query
    boost: float = 1.0

    def normalize(self) -> Query:
        a, b = self.a.normalize(), self.b.normalize()
        if isinstance(a, NullQuery) or isinstance(b, NullQuery):
            return NULL
        return Require(a, b, self.boost)


@dataclass(frozen=True)
class ConstantScoreQuery(Query):
    """Membership of ``child``, every match scored ``score``
    (wrappers.py:147-183) — a filter branch whose real scores are
    irrelevant, so the compiler can drop the child's stats join."""

    child: Query
    score: float = 1.0
    boost: float = 1.0

    def normalize(self) -> Query:
        c = self.child.normalize()
        if isinstance(c, NullQuery):
            return NULL
        return ConstantScoreQuery(c, self.score, self.boost)


@dataclass(frozen=True)
class WeightingQuery(Query):
    """Scores ``child`` with a different WeightingModel
    (wrappers.py:184-214)."""

    child: Query
    weighting: object = None  # a plans.weighting.WeightingModel (hashable)
    boost: float = 1.0

    def normalize(self) -> Query:
        c = self.child.normalize()
        if isinstance(c, NullQuery):
            return NULL
        return WeightingQuery(c, self.weighting, self.boost)


@dataclass(frozen=True)
class Otherwise(Query):
    """Matches ``a``; only if ``a`` matches NOTHING, matches ``b``
    (compound.py:578-590).  Deviation noted in the compiler: the
    reference decides per segment; a global-docid engine decides
    globally (identical for single-segment indexes)."""

    a: Query
    b: Query
    boost: float = 1.0

    def normalize(self) -> Query:
        a, b = self.a.normalize(), self.b.normalize()
        if isinstance(a, NullQuery):
            return b
        return Otherwise(a, b, self.boost)


@dataclass(frozen=True)
class Sequence(Query):
    """Sub-queries matching in adjacent positions within ``slop``
    (positional.py:36-122); ``Ordered`` requires increasing positions.
    Term children compile through the span machinery."""

    subqueries: tuple[Query, ...]
    slop: int = 1
    ordered: bool = True
    boost: float = 1.0

    def normalize(self) -> Query:
        subs = tuple(q.normalize() for q in self.subqueries)
        if any(isinstance(s, NullQuery) for s in subs) or not subs:
            return NULL
        if len(subs) == 1:
            return subs[0]
        return replace(self, subqueries=subs)


@dataclass(frozen=True)
class Ordered(Sequence):
    """positional.py:123-132: Sequence with ordered=True semantics."""


def _dedup(kids: list[Query]) -> list[Query]:
    seen: set = set()
    out: list[Query] = []
    for k in kids:
        key = k if isinstance(k, tuple(_HASHABLE)) else id(k)
        if key not in seen:
            seen.add(key)
            out.append(k)
    return out


_HASHABLE = (
    Term, Every, Prefix, Wildcard, Regex, FuzzyTerm, TermRange, Phrase, NullQuery,
    NumericRange, DateRange, Variations,
    And, Or, DisjunctionMax, Not, AndNot, AndMaybe, Require,
    ConstantScoreQuery, WeightingQuery, Otherwise, Sequence, Ordered,
)


def term_leaves(q: Query) -> list[Term]:
    """All Term leaves in the tree (for stats prefetch)."""
    if isinstance(q, Term):
        return [q]
    if isinstance(q, (And, Or, DisjunctionMax)):
        return [t for c in q.children for t in term_leaves(c)]
    if isinstance(q, (AndNot, AndMaybe, Require, Otherwise)):
        return term_leaves(q.a) + term_leaves(q.b)
    if isinstance(q, (Not, ConstantScoreQuery, WeightingQuery)):
        return term_leaves(q.child)
    if isinstance(q, Sequence):
        return [t for c in q.subqueries for t in term_leaves(c)]
    if isinstance(q, Phrase):
        return [Term(q.fieldname, w) for w in q.words]
    return []
