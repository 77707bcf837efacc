"""Search-result highlighting (excerpt generation).

Replicates ``whoosh.highlight`` semantics (file:line cites per class):
re-tokenize the stored text with character offsets, mark query terms,
fragment (ContextFragmenter highlight.py:428-505 / WholeFragmenter
:312-333), score fragments (BasicFragmentScorer :610-620: sum of matched
boosts x 100*distinct-terms), keep the top N sorted by position
(top_fragments :919-925), and format (UppercaseFormatter :754-767,
HtmlFormatter :769-860 with per-term CSS classes).

The per-hit work is pure Python over the (small) top-k hit set;
``highlight_hits`` runs it as an Arrow kernel over the results joined to
stored text.
"""

from __future__ import annotations

import re
from collections import deque
from dataclasses import dataclass, field
from heapq import nlargest

from whoosh_novo_spark.functions.analysis import MIN_WORD_SIZE, STOP_WORDS, TOKEN_PATTERN


@dataclass
class Token:
    text: str
    startchar: int
    endchar: int
    matched: bool = False
    boost: float = 1.0


@dataclass
class Fragment:
    text: str
    matches: list
    startchar: int
    endchar: int
    matched_terms: set = field(default_factory=set)

    def __post_init__(self):
        self.matched_terms = {t.text for t in self.matches}

    def __len__(self):
        return self.endchar - self.startchar


def char_tokens(text: str, terms: set[str]) -> list[Token]:
    """StandardAnalyzer with char offsets; ``matched`` marks query terms.

    highlight() runs the analyzer with ``removestops=False``
    (highlight.py's highlight -> analyzer(text, chars=True,
    removestops=False)), so stopped/short tokens STAY in the stream (they
    feed the fragmenter's context buffers) — they just can't match."""
    out = []
    for m in TOKEN_PATTERN.finditer(text):
        t = m.group(0).lower()
        stopped = len(t) < MIN_WORD_SIZE or t in STOP_WORDS
        out.append(Token(t, m.start(), m.end(), matched=(not stopped) and t in terms))
    return out


# --- fragmenters ----------------------------------------------------------

DEFAULT_CHARLIMIT = 2**15


class WholeFragmenter:
    """highlight.py:312-333: the whole text as one fragment."""

    def __init__(self, charlimit: int = DEFAULT_CHARLIMIT):
        self.charlimit = charlimit

    def fragment_tokens(self, text, tokens):
        matched = [
            t for t in tokens
            if t.matched and (not self.charlimit or t.endchar <= self.charlimit)
        ]
        yield Fragment(text, matched, 0, len(text))

    def fragment_matches(self, text, tokens):
        """Non-retokenizing path (highlight.py:312-352): same single
        whole-text fragment, built from the already-matched tokens."""
        matched = [
            t for t in tokens if not self.charlimit or t.endchar <= self.charlimit
        ]
        yield Fragment(text, matched, 0, len(text))


class PinpointFragmenter:
    """highlight.py:516-604: the NON-RETOKENIZING fragmenter — builds
    fragments directly from matched-term character spans (the stored
    ``Characters`` payload), greedily merging spans within ``surround``
    up to ``maxchars`` and padding both ends by ``surround``."""

    def __init__(
        self,
        maxchars: int = 200,
        surround: int = 20,
        autotrim: bool = False,
        charlimit: int = DEFAULT_CHARLIMIT,
    ):
        self.maxchars = maxchars
        self.surround = surround
        self.autotrim = autotrim
        self.charlimit = charlimit

    def fragment_tokens(self, text, tokens):
        return self.fragment_matches(text, [t for t in tokens if t.matched])

    @staticmethod
    def _autotrim(fragment: Fragment) -> None:
        text = fragment.text
        startchar, endchar = fragment.startchar, fragment.endchar
        firstspace = text.find(" ", startchar, endchar)
        if firstspace > 0:
            startchar = firstspace + 1
        lastspace = text.rfind(" ", startchar, endchar)
        if lastspace > 0:
            endchar = lastspace
        if fragment.matches:
            startchar = min(startchar, fragment.matches[0].startchar)
            endchar = max(endchar, fragment.matches[-1].endchar)
        fragment.startchar = startchar
        fragment.endchar = endchar

    def fragment_matches(self, text, tokens):
        maxchars, surround, charlimit = self.maxchars, self.surround, self.charlimit
        j = -1
        for i, t in enumerate(tokens):
            if j >= i:
                continue
            j = i
            left, right = t.startchar, t.endchar
            if charlimit and right > charlimit:
                break
            currentlen = right - left
            while j < len(tokens) - 1 and currentlen < maxchars:
                nxt = tokens[j + 1]
                ec = nxt.endchar
                if ec - right <= surround and ec - left <= maxchars:
                    j += 1
                    right = ec
                    currentlen += ec - nxt.startchar
                else:
                    break
            left = max(0, left - surround)
            right = min(len(text), right + surround)
            fragment = Fragment(text, tokens[i : j + 1], left, right)
            if self.autotrim:
                self._autotrim(fragment)
            yield fragment


class SentenceFragmenter:
    """highlight.py:354-425: break on sentence-end punctuation right after
    a token; yield sentences that contain matches and fit maxchars.  Use
    with a stopword-keeping token stream per the reference docstring."""

    def __init__(self, maxchars: int = 200, sentencechars: str = ".!?", charlimit: int = DEFAULT_CHARLIMIT):
        self.maxchars = maxchars
        self.sentencechars = frozenset(sentencechars)
        self.charlimit = charlimit

    def fragment_tokens(self, text, tokens):
        textlen = len(text)
        first = None
        tks: list[Token] = []
        endchar = None
        currentlen = 0
        for t in tokens:
            startchar, endchar = t.startchar, t.endchar
            if self.charlimit and endchar > self.charlimit:
                break
            if first is None:
                first = startchar
                currentlen = 0
            currentlen += endchar - startchar
            if t.matched:
                tks.append(t)
            if endchar < textlen and text[endchar] in self.sentencechars:
                if endchar + 1 < textlen and text[endchar + 1] in self.sentencechars:
                    continue  # "..." is not a sentence end
                if tks and currentlen <= self.maxchars:
                    yield Fragment(text, tks, first, endchar)
                tks = []
                first = None
                currentlen = 0
        if tks:
            yield Fragment(text, tks, first if first is not None else 0, endchar)


class ContextFragmenter:
    """highlight.py:428-505, replicated exactly."""

    def __init__(self, maxchars: int = 200, surround: int = 20, charlimit: int = DEFAULT_CHARLIMIT):
        self.maxchars = maxchars
        self.surround = surround
        self.charlimit = charlimit

    def fragment_tokens(self, text, tokens):
        maxchars, surround, charlimit = self.maxchars, self.surround, self.charlimit
        first = None
        firsts: deque = deque()
        countdown = -1
        tks: list[Token] = []
        endchar = None
        currentlen = 0

        for t in tokens:
            startchar, endchar = t.startchar, t.endchar
            tlength = endchar - startchar
            if charlimit and endchar > charlimit:
                break
            if countdown < 0 and not t.matched:
                firsts.append(startchar)
                while firsts and endchar - firsts[0] > surround:
                    firsts.popleft()
            elif currentlen + tlength > maxchars:
                countdown = 0
            elif t.matched:
                countdown = surround
                if first is None:
                    if firsts:
                        first = firsts[0]
                    else:
                        first = startchar
                        countdown += surround
                tks.append(t)
            if countdown >= 0:
                currentlen += tlength
                countdown -= tlength
                if countdown <= 0:
                    yield Fragment(text, tks, first if first is not None else 0, endchar)
                    tks = []
                    firsts = deque()
                    first = None
                    currentlen = 0
        if tks:
            yield Fragment(text, tks, first if first is not None else 0, endchar)


# --- scoring / selection --------------------------------------------------

def basic_fragment_score(f: Fragment) -> float:
    """highlight.py:610-620."""
    score = sum(t.boost for t in f.matches)
    score *= (len(f.matched_terms) * 100) or 1
    return score


def top_fragments(fragments, count, scorer=basic_fragment_score, minscore=1):
    """highlight.py:919-925 (order = FIRST: position in document)."""
    scored = ((scorer(f), i, f) for i, f in enumerate(fragments))
    best = [f for s, _i, f in nlargest(count, scored) if s >= minscore]
    best.sort(key=lambda f: f.startchar)
    return best


# --- formatters -----------------------------------------------------------

def get_text(original: str, t: Token, replace: bool) -> str:
    """highlight.py:648-660: the slice, or the token's (corrected) text."""
    return t.text if replace else original[t.startchar : t.endchar]


class NullFormatter:
    """highlight.py:747-752: no markup — used by Correction.string to
    splice corrected words into the original query string."""

    between = "..."

    def format_fragment(self, f: Fragment, replace: bool = False) -> str:
        out, idx = [], f.startchar
        for t in sorted(f.matches, key=lambda t: (t.startchar, -(t.endchar - t.startchar))):
            if t.startchar is None or t.startchar < idx:
                continue
            if t.startchar > idx:
                out.append(f.text[idx : t.startchar])
            out.append(get_text(f.text, t, replace))
            idx = t.endchar
        out.append(f.text[idx : f.endchar])
        return "".join(out)

    def format(self, fragments, replace: bool = False) -> str:
        return self.between.join(self.format_fragment(f, replace) for f in fragments)


class UppercaseFormatter:
    """highlight.py:754-767."""

    def __init__(self, between: str = "..."):
        self.between = between

    def format_fragment(self, f: Fragment, replace: bool = False) -> str:
        text = f.text
        out, idx = [], f.startchar
        for t in sorted(f.matches, key=lambda t: (t.startchar, -(t.endchar - t.startchar))):
            if t.startchar < idx:
                continue
            if t.startchar > idx:
                out.append(text[idx : t.startchar])
            out.append(get_text(text, t, replace).upper())
            idx = t.endchar
        out.append(text[idx : f.endchar])
        return "".join(out)

    def _fmt(self, text, f: Fragment) -> str:
        return self.format_fragment(f)

    def format(self, fragments, replace: bool = False) -> str:
        return self.between.join(self.format_fragment(f, replace) for f in fragments)


class HtmlFormatter:
    """highlight.py:769-860: matched terms wrapped in an element with a
    shared class + a per-term class (term0, term1, ... recycled at
    maxclasses)."""

    def __init__(
        self,
        tagname: str = "strong",
        between: str = "...",
        classname: str = "match",
        termclass: str = "term",
        maxclasses: int = 5,
        attrquote: str = '"',
    ):
        self.tagname = tagname
        self.between = between
        self.classname = classname
        self.termclass = termclass
        self.maxclasses = maxclasses
        self.attrquote = attrquote
        self.seen: dict[str, int] = {}

    def _esc(self, s: str) -> str:
        return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

    def _token(self, text, t: Token, replace: bool = False) -> str:
        # class map keyed by the DISPLAYED (escaped) text — highlight.py
        # format_token keys `seen` by _text(get_text(...)), so "Render"
        # and "render" get different term classes
        shown = self._esc(get_text(text, t, replace))
        if shown in self.seen:
            n = self.seen[shown]
        else:
            n = len(self.seen) % self.maxclasses
            self.seen[shown] = n
        q = self.attrquote
        return (
            f"<{self.tagname} class={q}{self.classname} {self.termclass}{n}{q}>"
            f"{shown}</{self.tagname}>"
        )

    def format_fragment(self, f: Fragment, replace: bool = False) -> str:
        text = f.text
        out, idx = [], f.startchar
        for t in sorted(f.matches, key=lambda t: (t.startchar, -(t.endchar - t.startchar))):
            if t.startchar < idx:
                continue
            if t.startchar > idx:
                out.append(self._esc(text[idx : t.startchar]))
            out.append(self._token(text, t, replace))
            idx = t.endchar
        out.append(self._esc(text[idx : f.endchar]))
        return "".join(out)

    def _fmt(self, text, f: Fragment) -> str:
        return self.format_fragment(f)

    def format(self, fragments, replace: bool = False) -> str:
        return self.between.join(self.format_fragment(f, replace) for f in fragments)


# --- top-level ------------------------------------------------------------

def highlights(
    text: str,
    terms: set[str],
    fragmenter=None,
    formatter=None,
    top: int = 3,
    minscore: int = 1,
) -> str:
    """Mirror of ``whoosh.highlight.highlight`` / ``Hit.highlights``
    defaults (ContextFragmenter + HtmlFormatter, top=3).

    Retokenizes with the STANDARD chain, so query terms match literal
    (lowercased) tokens.  For stemmed / language-analyzed / routed
    fields — where the index term differs from the surface token — use
    ``chars=True`` at build and ``index_highlights``: the stored
    per-occurrence char offsets reproduce any analyzer's matches
    exactly, with no retokenization at all (the scale path besides)."""
    fragmenter = fragmenter or ContextFragmenter()
    formatter = formatter or HtmlFormatter(tagname="b")
    tokens = char_tokens(text, {t.lower() for t in terms})
    frags = fragmenter.fragment_tokens(text, tokens)
    best = top_fragments(frags, top, minscore=minscore)
    return formatter.format(best)


def highlight_hits(
    searcher,
    results,
    text_df,
    terms: set[str],
    text_col: str = "text",
    top: int = 3,
    fragmenter=None,
    formatter_factory=None,
):
    """Spark wrapper: (docid, score, highlight) for each hit.

    ``formatter_factory`` builds a fresh formatter per document (the
    HtmlFormatter term-class map is per-formatter state)."""
    import pandas as pd
    from pyspark.sql import functions as F

    j = F.broadcast(results).join(
        text_df.select("docid", text_col), "docid", "inner"
    )
    tset = {t.lower() for t in terms}

    def kernel(batches):
        for pdf in batches:
            hs = []
            for txt in pdf[text_col]:
                fmt = formatter_factory() if formatter_factory else None
                hs.append(
                    highlights(txt, tset, fragmenter=fragmenter, formatter=fmt, top=top)
                )
            out = pdf[["docid", "score"]].copy()
            out["highlight"] = hs
            yield out

    return j.mapInPandas(kernel, "docid long, score double, highlight string")


# --- pinpoint path: offsets from the index's Characters payload ------------

def load_char_tokens(searcher, docid, fieldname, words, charlimit=DEFAULT_CHARLIMIT):
    """Matched-term Tokens built from the stored (pos, start, end) spans
    (Highlighter._load_chars + highlight_hit, highlight.py:996-1096):
    a docid-equality + term-IN pushed postings scan, spans sorted by
    startchar keeping the longest token per position."""
    from itertools import groupby

    from pyspark.sql import functions as F

    rows = (
        searcher.index.postings_span(fieldname, terms=sorted(words))
        .where(
            (F.col("docid") == int(docid))
            & (F.col("field") == fieldname)
            & F.col("term").isin(sorted(words))
        )
        .select("term", "chars")
        .collect()
    )
    tokens: list[Token] = []
    for r in rows:
        if r["chars"] is None:
            raise ValueError(
                f"field {fieldname!r} stores no Characters payload; "
                "build it with FieldConfig(chars=True)"
            )
        for c in r["chars"]:
            if charlimit and c["end"] > charlimit:
                break
            tokens.append(Token(r["term"], int(c["start"]), int(c["end"]), matched=True))
    tokens.sort(key=lambda t: t.startchar)
    return [
        max(g, key=lambda t: t.endchar - t.startchar)
        for _, g in groupby(tokens, key=lambda t: t.startchar)
    ]


def index_highlights(
    searcher,
    docid,
    fieldname,
    terms,
    text,
    fragmenter=None,
    formatter=None,
    top: int = 3,
    minscore: int = 1,
) -> str:
    """Pinpoint highlighting (the Highlighter.highlight_hit chars path,
    highlight.py:1068-1097): character offsets come from the index's
    Characters payload — the stored text is NEVER re-tokenized."""
    fragmenter = fragmenter or PinpointFragmenter()
    formatter = formatter or HtmlFormatter(tagname="b")
    tokens = load_char_tokens(
        searcher,
        docid,
        fieldname,
        {t.lower() for t in terms},
        charlimit=getattr(fragmenter, "charlimit", DEFAULT_CHARLIMIT),
    )
    frags = fragmenter.fragment_matches(text, tokens)
    best = top_fragments(frags, top, minscore=minscore)
    return formatter.format(best)
