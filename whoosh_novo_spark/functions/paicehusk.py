"""Paice-Husk (Lancaster) stemmer with the standard public ruleset.

Rule grammar (Paice 1990): ``<reversed-ending><*?><remove-count>
<append><.|>`` — ``*`` restricts the rule to intact (not-yet-stemmed)
words, ``.`` stops after applying, ``>`` continues another pass.

The reference's implementation (src/whoosh/lang/paicehusk.py) has two
genuine defects we do NOT replicate (COVERAGE.md reference bugs
#10/#11, proven in tests/test_paicehusk.py):

- a protect rule (remove-count 0, e.g. ``ss0.``) computes
  ``stem[:0 - 0]`` = ``stem[:0]`` and WIPES the whole stem —
  reference stem("miss") == "" — where Paice's semantics are "leave
  unchanged and stop";
- a vowel-less word crashes with ValueError (``min()`` of an empty
  list in first_vowel).

Everything else (first-match per last letter in ruleset order, the
intact flag, the min-stem-length acceptability test, the prefix strip,
the leading-\\w+ truncation) matches the reference behavior and is
golden-gated on vowel-bearing inputs.
"""

from __future__ import annotations

import re
from collections import defaultdict

_RULE_RX = re.compile(
    r"^(?P<rev_ending>\w+)(?P<intact>\*?)(?P<remove>\d+)"
    r"(?P<append>\w*)(?P<action>[.>])"
)
_LEAD_WORD_RX = re.compile(r"^\w+", re.UNICODE)

_PREFIXES = (
    "kilo", "micro", "milli", "intra", "ultra", "mega", "nano", "pico",
    "pseudo",
)

# The standard published Paice/Husk ruleset (public algorithm data;
# same rules the reference ships).
DEFAULT_RULES = """
ai*2.     a*1.      bb1.      city3s.   ci2>      cn1t>     dd1.
dei3y>    deec2ss.  dee1.     de2>      dooh4>    e1>       feil1v.
fi2>      gni3>     gai3y.    ga2>      gg1.      ht*2.     hsiug5ct.
hsi3>     i*1.      i1y>      ji1d.     juf1s.    ju1d.     jo1d.
jeh1r.    jrev1t.   jsim2t.   jn1d.     j1s.      lbaifi6.  lbai4y.
lba3>     lbi3.     lib2l>    lc1.      lufi4y.   luf3>     lu2.
lai3>     lau3>     la2>      ll1.      mui3.     mu*2.     msi3>
mm1.      nois4j>   noix4ct.  noi3>     nai3>     na2>      nee0.
ne2>      nn1.      pihs4>    pp1.      re2>      rae0.     ra2.
ro2>      ru2>      rr1.      rt1>      rei3y>    sei3y>    sis2.
si2>      ssen4>    ss0.      suo3>     su*2.     s*1>      s0.
tacilp4y. ta2>      tnem4>    tne3>     tna3>     tpir2b.   tpro2b.
tcud1.    tpmus2.   tpec2iv.  tulo2v.   tsis0.    tsi3>     tt1.
uqi3.     ugo1.     vis3j>    vie0.     vi2>      ylb1>     yli3y>
ylp0.     yl2>      ygo1.     yhp1.     ymo1.     ypo1.     yti3>
yte3>     ytl2.     yrtsi5.   yra3>     yro3>     yfi3.     ycn2t>
yca3>     zi2>      zy1s.
"""


class PaiceHuskStemmer:
    """Rule-table stemmer; rules indexed by the word's final letter,
    first match (in ruleset order) wins per pass."""

    def __init__(self, rules: str = DEFAULT_RULES):
        self.rules: dict[str, list] = defaultdict(list)
        for token in rules.split():
            m = _RULE_RX.match(token)
            if not m:
                raise ValueError(f"bad Paice-Husk rule: {token!r}")
            ending = m.group("rev_ending")[::-1]
            self.rules[ending[-1]].append(
                (
                    ending,
                    m.group("intact") == "*",
                    int(m.group("remove")),
                    m.group("append"),
                    m.group("action") == ">",
                )
            )

    @staticmethod
    def _first_vowel(w: str) -> int:
        positions = [p for p in (w.find(v) for v in "aeiou") if p > -1]
        if not positions:
            return -1  # vowel-less (the reference crashes here)
        vp = min(positions)
        yp = w.find("y")
        if 0 < yp < vp:
            return yp
        return vp

    def stem(self, word: str) -> str:
        m = _LEAD_WORD_RX.match(word)
        if not m:
            return word
        w = m.group(0)
        for pre in _PREFIXES:
            if w.startswith(pre):
                w = w[len(pre) :]
                break
        intact = True
        again = True
        while again:
            pfv = self._first_vowel(w)
            if pfv < 0:
                break
            candidates = self.rules.get(w[-1:])
            if not candidates:
                break
            again = False
            for ending, need_intact, remove, append, cont in candidates:
                if not w.endswith(ending):
                    continue
                if need_intact and not intact:
                    continue
                if remove == 0:
                    # protect rule: accept the match, change nothing
                    # (the reference wipes the stem here — bug #10)
                    break
                newlen = len(w) - remove + len(append)
                if (pfv == 0 and newlen < 2) or (pfv > 0 and newlen < 3):
                    continue
                intact = False
                w = w[:-remove] + append
                again = cont
                break
        return w


_DEFAULT = PaiceHuskStemmer()


def stem(word: str) -> str:
    return _DEFAULT.stem(word)
