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

class UppercaseFormatter:
    """highlight.py:754-767."""

    def __init__(self, between: str = "..."):
        self.between = between

    def _fmt(self, text, f: Fragment) -> str:
        out, idx = [], f.startchar
        for t in sorted(f.matches, key=lambda t: (t.startchar, -(t.endchar - t.startchar))):
            if t.startchar < idx:
                continue
            if t.startchar > idx:
                out.append(text[idx : t.startchar])
            out.append(text[t.startchar : t.endchar].upper())
            idx = t.endchar
        out.append(text[idx : f.endchar])
        return "".join(out)

    def format(self, fragments) -> str:
        return self.between.join(self._fmt(f.text, f) for f in fragments)


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

    def _token(self, text, t: Token) -> str:
        # class map keyed by the DISPLAYED text slice (original casing) —
        # highlight.py format_token uses get_text(...), so "Render" and
        # "render" get different term classes
        shown = text[t.startchar : t.endchar]
        if shown in self.seen:
            n = self.seen[shown]
        else:
            n = len(self.seen) % self.maxclasses
            self.seen[shown] = n
        q = self.attrquote
        return (
            f"<{self.tagname} class={q}{self.classname} {self.termclass}{n}{q}>"
            f"{self._esc(text[t.startchar:t.endchar])}</{self.tagname}>"
        )

    def _fmt(self, text, f: Fragment) -> str:
        out, idx = [], f.startchar
        for t in sorted(f.matches, key=lambda t: (t.startchar, -(t.endchar - t.startchar))):
            if t.startchar < idx:
                continue
            if t.startchar > idx:
                out.append(self._esc(text[idx : t.startchar]))
            out.append(self._token(text, t))
            idx = t.endchar
        out.append(self._esc(text[idx : f.endchar]))
        return "".join(out)

    def format(self, fragments) -> str:
        return self.between.join(self._fmt(f.text, f) for f in fragments)


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
    defaults (ContextFragmenter + HtmlFormatter, top=3)."""
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
