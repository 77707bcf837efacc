"""IntraWordFilter — word-delimiter splitting (Solr WordDelimiterFilter
semantics, reference src/whoosh/analysis/intraword.py:237-520).

Behavior replicated exactly (tested against the reference over merge-flag
combinations in tests/test_intraword.py):

- split tokens on delimiter chars, case transitions (lower->upper) and
  letter<->digit transitions; strip trailing possessive 's
- the filter RENUMBERS positions stream-wide (each subword its own
  position); with mergewords/mergenums, consecutive all-alpha / all-digit
  subword runs additionally emit a merged token inserted per the
  reference's insertion-point bookkeeping (merged token shares the last
  subword's position)

Character classes use CPython's str.islower/isupper/isdigit — the same
Unicode categories the reference's generated tables encode.
"""

from __future__ import annotations

import re

DEFAULT_DELIMS = "-_'\"()!@#$%^&*[]{}<>\\|;:,./?`~=+"


class IntraWord:
    def __init__(
        self,
        delims: str = DEFAULT_DELIMS,
        splitwords: bool = True,
        splitnums: bool = True,
        mergewords: bool = False,
        mergenums: bool = False,
    ):
        self.delims = delims
        esc = re.escape(delims)
        self.between = re.compile(f"[^{esc}]+", re.UNICODE)
        self.splitwords = splitwords
        self.splitnums = splitnums
        self.mergewords = mergewords
        self.mergenums = mergenums
        self.splitting = splitwords or splitnums
        self._delimset = set(delims)

    # --- split ----------------------------------------------------------
    def _is_boundary(self, a: str, b: str) -> bool:
        if self.splitwords and a.islower() and b.isupper():
            return True
        if self.splitnums:
            a_letter = a.islower() or a.isupper()
            b_letter = b.islower() or b.isupper()
            if (a_letter and b.isdigit()) or (a.isdigit() and b_letter):
                return True
        return False

    def _dispossess(self, s: str) -> list[tuple[int, int]]:
        """Runs of text between trailing-possessive 's (intraword.py:
        possessive regex: letter + 's at end-or-delimiter)."""
        if "'" not in s:
            return [(0, len(s))]
        out = []
        prev = 0
        for i in range(len(s) - 1):
            if (
                s[i] == "'"
                and s[i + 1] in ("s", "S")
                and i > 0
                and (s[i - 1].islower() or s[i - 1].isupper())
                and (i + 2 == len(s) or s[i + 2] in self._delimset)
            ):
                out.append((prev, i))
                prev = i + 2
        if prev < len(s):
            out.append((prev, len(s)))
        return out

    def _split(self, s: str):
        for sc, ec in self._dispossess(s):
            for m in self.between.finditer(s, sc, ec):
                ps, pe = m.start(), m.end()
                if self.splitting:
                    # NB: the reference finds transitions with a TWO-CHAR
                    # regex via finditer, which cannot match overlapping
                    # transitions ("a1b2c3" -> a|1b|2c|3) — advance past
                    # both chars after a hit to replicate that
                    prev = ps
                    i = ps
                    while i < pe - 1:
                        if self._is_boundary(s[i], s[i + 1]):
                            yield (prev, i + 1)
                            prev = i + 1
                            i += 2
                        else:
                            i += 1
                    if prev < pe:
                        yield (prev, pe)
                else:
                    yield (ps, pe)

    # --- merge (intraword.py:368-413, incl. its exact condition) --------
    def _merge(self, parts: list[list]) -> None:
        last = 0
        insertat = 0
        buf: list[list] = []
        pos = 0

        def insert_item(buf, at, newpos):
            newtext = "".join(item[0] for item in buf)
            parts.insert(at, [newtext, newpos, buf[0][2], buf[-1][3]])

        for item in list(parts):
            text, pos = item[0], item[1]
            if text.isalpha():
                this = 1
            elif text.isdigit():
                this = 2
            else:
                this = None
            if (
                buf and (this == last == 1 and self.mergewords)
            ) or (this == last == 2 and self.mergenums):
                buf.append(item)
            else:
                if len(buf) > 1:
                    insert_item(buf, insertat, pos - 1)
                    insertat += 1
                buf = [item]
                last = this
            insertat += 1
        if len(buf) > 1:
            insert_item(buf, len(parts), pos)

    # --- stream ----------------------------------------------------------
    def apply(self, tokens: list[tuple[str, int]]) -> list[tuple[str, int]]:
        """tokens: [(text, pos)] -> renumbered/expanded [(text, pos)]."""
        out = []
        newpos = None
        for text, pos in tokens:
            if newpos is None:
                newpos = pos
            if (text.isalpha() and (text.islower() or text.isupper())) or text.isdigit():
                out.append((text, newpos))
                newpos += 1
            else:
                ranges = list(self._split(text))
                parts = [[text[sc:ec], i + newpos, sc, ec] for i, (sc, ec) in enumerate(ranges)]
                if len(parts) > 1 and (self.mergewords or self.mergenums):
                    self._merge(parts)
                for t2, p2, _s, _e in parts:
                    out.append((t2, p2))
                if parts:
                    newpos = parts[-1][1] + 1
        return out
