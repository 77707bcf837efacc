"""Whole-query spelling correction.

Reference: ``Searcher.correct_query`` (searching.py:861-975) +
``spelling.SimpleQueryCorrector`` / ``Correction`` (spelling.py:179-344):

- every Term / Phrase-word token of the parsed query whose (field, text)
  is NOT in the index lexicon gets corrected to the FIRST suggestion of
  the field's corrector (frequency-ranked terms within ``maxdist`` edits,
  operators/suggest.py)
- the query tree is rewritten with ``replace`` semantics (every
  occurrence of that (field, text) swaps to the suggestion)
- the corrected query STRING splices the suggestions into the original
  string at the tokens' character spans (Correction.format_string with
  any Formatter; NullFormatter gives the plain corrected string)

The missing-term test is a single batched terms-table lookup for every
token in the query (one pruned scan, not one job per word).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, replace as dc_replace

from whoosh_novo_spark.functions.analysis import analyze_query_terms
from whoosh_novo_spark.functions.highlight import Fragment, NullFormatter, Token
from whoosh_novo_spark.plans import ast


@dataclass
class Correction:
    """spelling.py:179-237."""

    original_query: ast.Query
    query: ast.Query
    original_string: str | None
    tokens: list  # corrected Tokens with spans into original_string

    @property
    def string(self) -> str:
        return self.format_string(NullFormatter())

    def format_string(self, formatter) -> str:
        if not self.original_string:
            return ""
        if isinstance(formatter, type):
            formatter = formatter()
        fragment = Fragment(
            self.original_string, self.tokens, 0, len(self.original_string)
        )
        return formatter.format_fragment(fragment, replace=True)


def query_terms(q: ast.Query) -> list[tuple[str, str]]:
    """(field, text) of every correctable token: Term leaves + Phrase
    words (Query.all_tokens over the reference's token-carrying nodes)."""
    out: list[tuple[str, str]] = []
    if isinstance(q, ast.Term) and isinstance(q.text, str):
        out.append((q.fieldname, q.text))
    elif isinstance(q, ast.Phrase):
        out.extend((q.fieldname, w) for w in q.words)
    elif isinstance(q, (ast.And, ast.Or, ast.DisjunctionMax)):
        for c in q.children:
            out.extend(query_terms(c))
    elif isinstance(q, (ast.AndNot, ast.AndMaybe, ast.Require)):
        out.extend(query_terms(q.a))
        out.extend(query_terms(q.b))
    elif isinstance(q, ast.Not):
        out.extend(query_terms(q.child))
    return out


def replace_term(q: ast.Query, fieldname: str, text: str, new: str) -> ast.Query:
    """Query.replace: every occurrence of (fieldname, text) -> new."""
    if isinstance(q, ast.Term):
        if q.fieldname == fieldname and q.text == text:
            return dc_replace(q, text=new)
        return q
    if isinstance(q, ast.Phrase):
        if q.fieldname == fieldname and text in q.words:
            return dc_replace(
                q, words=tuple(new if w == text else w for w in q.words)
            )
        return q
    if isinstance(q, (ast.And, ast.Or, ast.DisjunctionMax)):
        return dc_replace(
            q,
            children=tuple(replace_term(c, fieldname, text, new) for c in q.children),
        )
    if isinstance(q, (ast.AndNot, ast.AndMaybe, ast.Require)):
        return dc_replace(
            q,
            a=replace_term(q.a, fieldname, text, new),
            b=replace_term(q.b, fieldname, text, new),
        )
    if isinstance(q, ast.Not):
        return dc_replace(q, child=replace_term(q.child, fieldname, text, new))
    return q


_WORD_RX = re.compile(r"[^\s()\[\]{}\"']+")
_PHRASE_RX = re.compile(r"\"([^\"]*)\"")
_TOKEN_IN_PHRASE_RX = re.compile(r"[^\s]+")


def _string_tokens(parser, qstring: str):
    """(field, analyzed_term, startchar, endchar) for every word in the
    raw query string — spans are what Correction.format_string splices.
    Mirrors how the reference's parse tree keeps each token's char range."""
    out = []
    consumed: list[tuple[int, int]] = []
    for m in _PHRASE_RX.finditer(qstring):
        consumed.append((m.start(), m.end()))
        for wm in _TOKEN_IN_PHRASE_RX.finditer(m.group(1)):
            terms = analyze_query_terms(
                wm.group(0), parser._analyzer(parser.default_field)
            )
            if terms:
                out.append(
                    (
                        parser.default_field,
                        terms[0],
                        m.start() + 1 + wm.start(),
                        m.start() + 1 + wm.end(),
                    )
                )
    for m in _WORD_RX.finditer(qstring):
        if any(a <= m.start() < b for a, b in consumed):
            continue
        w = m.group(0)
        if w in ("AND", "OR", "NOT", "ANDNOT", "ANDMAYBE", "TO"):
            continue
        field = parser.default_field
        start = m.start()
        if ":" in w:
            f, rest = w.split(":", 1)
            if f and rest:
                # resolve aliases like the parser does, so the correction
                # map (keyed by the RESOLVED field) finds these tokens
                field, w = parser._resolve(f), rest
                start = m.start() + len(f) + 1
        if parser._type(field) != "text":
            continue
        bm = re.search(r"\^(\d+(\.\d+)?)$", w)
        if bm:
            w = w[: bm.start()]
        if any(ch in w for ch in "*?~<>[]{}"):
            continue  # multiterm / range / fuzzy syntax: not correctable
        terms = analyze_query_terms(w, parser._analyzer(field))
        if terms:
            out.append((field, terms[0], start, start + len(w)))
    out.sort(key=lambda x: x[2])
    return out


def correct_query(
    searcher,
    q: ast.Query,
    qstring: str | None,
    parser=None,
    maxdist: int = 2,
    prefix: int = 0,
    correctors: dict | None = None,
    aliases: dict | None = None,
    terms: list[tuple[str, str]] | None = None,
) -> Correction:
    """searching.py:861-975 semantics.  ``parser`` (a QueryParser) is only
    needed to map the raw string's words for Correction.string; pass None
    when qstring is None."""
    from whoosh_novo_spark.operators.suggest import suggest

    aliases = aliases or {}
    correctors = {aliases.get(f, f): c for f, c in (correctors or {}).items()}

    ix = searcher.index
    text_fields = {f.name for f in ix.config.fields if f.type == "text"}

    def field_suggest(aname: str, text: str) -> list[str]:
        if aname in correctors:
            return correctors[aname](text, maxdist=maxdist, prefix=prefix)
        return suggest(ix, aname, text, limit=1, maxdist=maxdist, prefix=prefix)

    # which (field, text) tokens are missing from the lexicon — ONE
    # batched stats lookup for the whole query
    all_terms = query_terms(q)
    if terms is None:
        check = [
            (aliases.get(f, f), t)
            for f, t in all_terms
            if aliases.get(f, f) in text_fields
        ]
        present = searcher._cached_stats(sorted(set(check)))
        terms = [
            (f, t)
            for f, t in all_terms
            if aliases.get(f, f) in text_fields
            and (aliases.get(f, f), t) not in present
        ]
    termset = frozenset(terms)

    corrected_q = q
    corrections: dict[tuple[str, str], str] = {}
    for f, t in all_terms:
        if (f, t) not in termset or (f, t) in corrections:
            continue
        sugs = field_suggest(aliases.get(f, f), t)
        if sugs:
            corrections[(f, t)] = sugs[0]
            corrected_q = replace_term(corrected_q, f, t, sugs[0])

    tokens: list[Token] = []
    if qstring and parser is not None:
        for field, term, start, end in _string_tokens(parser, qstring):
            sug = corrections.get((field, term))
            if sug is not None:
                tokens.append(Token(sug, start, end, matched=True))
    return Correction(q, corrected_q, qstring, tokens)
