"""Phonetic encoders + the DoubleMetaphone token filter.

Double Metaphone (Lawrence Philips, C/C++ 2000; widely ported) encodes
similar-sounding words to the same key(s); a word gets a primary code
and sometimes a different secondary code.  The parity target is the
reference's port (src/whoosh/lang/dmetaphone.py, the Atkinson/Collins
translation), golden-gated word-for-word in tests/test_phonetic.py.

Architecture: instead of the port's single 500-line function, each
letter has its own handler returning an encode decision; the engine
applies decisions uniformly.  Two port quirks the engine replicates on
purpose:

- decision reuse: a handful of branches (notably under 'G'+'H') assign
  nothing; the port then RE-APPLIES the previous iteration's decision —
  re-appending its codes and re-advancing by its step.  Handlers signal
  this by returning None.
- a 2-field decision appends its code to both primary and secondary
  when the code is not None; a 3-field decision appends each code only
  when truthy ('' is dropped).

Filter semantics (reference analysis/morph.py:245-304
DoubleMetaphoneFilter): per input token emit [original if combine,]
primary (boost x primary_boost), secondary (boost x secondary_boost) —
all sharing the source token's position.
"""

from __future__ import annotations

import re

import numpy as np

_VOWELS = frozenset("AEIOUY")
_SLAVO_RX = re.compile("W|K|CZ|WITZ")
_SILENT_RX = re.compile("GN|KN|PN|WR|PS")


class _Ctx:
    __slots__ = ("t", "pos", "first", "last", "sg")

    def __init__(self, t, pos, first, last, sg):
        self.t = t
        self.pos = pos
        self.first = first
        self.last = last
        self.sg = sg


def _h_vowel(c: _Ctx):
    # only a word-initial vowel emits (always as 'A')
    return ("A", 1) if c.pos == c.first else (None, 1)


def _h_b(c: _Ctx):
    return ("P", 2) if c.t[c.pos + 1] == "B" else ("P", 1)


def _h_c(c: _Ctx):
    t, p, first = c.t, c.pos, c.first
    if (
        p > first + 1
        and t[p - 2] not in _VOWELS
        and t[p - 1 : p + 2] == "ACH"
        and (t[p + 2] not in ("I", "E") or t[p - 2 : p + 4] in ("BACHER", "MACHER"))
    ):
        return ("K", 2)
    if p == first and t[first : first + 6] == "CAESAR":
        return ("S", 2)
    if t[p : p + 4] == "CHIA":
        return ("K", 2)
    if t[p : p + 2] == "CH":
        if p > first and t[p : p + 4] == "CHAE":
            return ("K", "X", 2)
        if (
            p == first
            and (
                t[p + 1 : p + 6] in ("HARAC", "HARIS")
                or t[p + 1 : p + 4] in ("HOR", "HYM", "HIA", "HEM")
            )
            and t[first : first + 5] != "CHORE"
        ):
            return ("K", 2)
        if (
            t[first : first + 4] in ("VAN ", "VON ")
            or t[first : first + 3] == "SCH"
            or t[p - 2 : p + 4] in ("ORCHES", "ARCHIT", "ORCHID")
            or t[p + 2] in ("T", "S")
            or (
                (t[p - 1] in ("A", "O", "U", "E") or p == first)
                and t[p + 2] in ("L", "R", "N", "M", "B", "H", "F", "V", "W", " ")
            )
        ):
            return ("K", 1)
        if p > first:
            if t[first : first + 2] == "MC":
                return ("K", 2)
            return ("X", "K", 2)
        return ("X", 2)
    if t[p : p + 2] == "CZ" and t[p - 2 : p + 2] != "WICZ":
        return ("S", "X", 2)
    if t[p + 1 : p + 4] == "CIA":
        return ("X", 3)
    if t[p : p + 2] == "CC" and not (p == first + 1 and t[first] == "M"):
        if t[p + 2] in ("I", "E", "H") and t[p + 2 : p + 4] != "HU":
            if (p == first + 1 and t[first] == "A") or t[p - 1 : p + 4] in (
                "UCCEE",
                "UCCES",
            ):
                return ("KS", 3)
            return ("X", 3)
        return ("K", 2)
    if t[p : p + 2] in ("CK", "CG", "CQ"):
        return ("K", "K", 2)
    if t[p : p + 2] in ("CI", "CE", "CY"):
        if t[p : p + 3] in ("CIO", "CIE", "CIA"):
            return ("S", "X", 2)
        return ("S", 2)
    if t[p + 1 : p + 3] in (" C", " Q", " G"):
        return ("K", 3)
    if t[p + 1] in ("C", "K", "Q") and t[p + 1 : p + 3] not in ("CE", "CI"):
        return ("K", 2)
    return ("K", 1)


def _h_d(c: _Ctx):
    t, p = c.t, c.pos
    if t[p : p + 2] == "DG":
        if t[p + 2] in ("I", "E", "Y"):
            return ("J", 3)
        return ("TK", 2)
    if t[p : p + 2] in ("DT", "DD"):
        return ("T", 2)
    return ("T", 1)


def _h_f(c: _Ctx):
    return ("F", 2) if c.t[c.pos + 1] == "F" else ("F", 1)


def _h_g(c: _Ctx):
    t, p, first = c.t, c.pos, c.first
    if t[p + 1] == "H":
        if p > first and t[p - 1] not in _VOWELS:
            return ("K", 2)
        if p < first + 3:
            if p == first:
                if t[p + 2] == "I":
                    return ("J", 2)
                return ("K", 2)
            return None  # port quirk: no decision — previous one re-applies
        if (
            (p > first + 1 and t[p - 2] in ("B", "H", "D"))
            or (p > first + 2 and t[p - 3] in ("B", "H", "D"))
            or (p > first + 3 and t[p - 4] in ("B", "H"))
        ):
            return (None, 2)
        if p > first + 2 and t[p - 1] == "U" and t[p - 3] in ("C", "G", "L", "R", "T"):
            return ("F", 2)
        if p > first and t[p - 1] != "I":
            return ("K", 2)
        return None  # port quirk (see above)
    if t[p + 1] == "N":
        if p == first + 1 and t[first] in _VOWELS and not c.sg:
            return ("KN", "N", 2)
        if t[p + 2 : p + 4] != "EY" and t[p + 1] != "Y" and not c.sg:
            return ("N", "KN", 2)
        return ("KN", 2)
    if t[p + 1 : p + 3] == "LI" and not c.sg:
        return ("KL", "L", 2)
    if p == first and (
        t[p + 1] == "Y"
        or t[p + 1 : p + 3]
        in ("ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN", "IE", "EI", "ER")
    ):
        return ("K", "J", 2)
    if (
        (t[p + 1 : p + 2] == "ER" or t[p + 1] == "Y")  # port quirk: the
        # one-char slice can never equal "ER", so only the Y arm is live
        and t[first : first + 6] not in ("DANGER", "RANGER", "MANGER")
        and t[p - 1] not in ("E", "I")
        and t[p - 1 : p + 2] not in ("RGY", "OGY")
    ):
        return ("K", "J", 2)
    if t[p + 1] in ("E", "I", "Y") or t[p - 1 : p + 3] in ("AGGI", "OGGI"):
        if (
            t[first : first + 4] in ("VON ", "VAN ")
            or t[first : first + 3] == "SCH"
            or t[p + 1 : p + 3] == "ET"
        ):
            return ("K", 2)
        if t[p + 1 : p + 5] == "IER ":
            return ("J", 2)
        return ("J", "K", 2)
    if t[p + 1] == "G":
        return ("K", 2)
    return ("K", 1)


def _h_h(c: _Ctx):
    t, p = c.t, c.pos
    if (p == c.first or t[p - 1] in _VOWELS) and t[p + 1] in _VOWELS:
        return ("H", 2)
    return (None, 1)


def _h_j(c: _Ctx):
    t, p, first = c.t, c.pos, c.first
    if t[p : p + 4] == "JOSE" or t[first : first + 4] == "SAN ":
        if (p == first and t[p + 4] == " ") or t[first : first + 4] == "SAN ":
            codes = ("H", "H")
        else:
            codes = ("J", "H")
    elif p == first and t[p : p + 4] != "JOSE":
        codes = ("J", "A")
    elif t[p - 1] in _VOWELS and not c.sg and t[p + 1] in ("A", "O"):
        codes = ("J", "H")
    elif p == c.last:
        codes = ("J", " ")
    elif t[p + 1] not in ("L", "T", "K", "S", "N", "M", "B", "Z") and t[
        p - 1
    ] not in ("S", "K", "L"):
        codes = ("J", "J")
    else:
        codes = (None, None)
    adv = 2 if t[p + 1] == "J" else 1
    if codes[0] == codes[1]:
        return (codes[0], adv)
    return (codes[0], codes[1], adv)


def _h_k(c: _Ctx):
    return ("K", 2) if c.t[c.pos + 1] == "K" else ("K", 1)


def _h_l(c: _Ctx):
    t, p, last = c.t, c.pos, c.last
    if t[p + 1] == "L":
        if (p == last - 2 and t[p - 1 : p + 3] in ("ILLO", "ILLA", "ALLE")) or (
            (t[last - 1 : last + 1] in ("AS", "OS") or t[last] in ("A", "O"))
            and t[p - 1 : p + 3] == "ALLE"
        ):
            return ("L", "", 2)
        return ("L", 2)
    return ("L", 1)


def _h_m(c: _Ctx):
    t, p = c.t, c.pos
    if (
        t[p + 1 : p + 4] == "UMB"
        and (p + 1 == c.last or t[p + 2 : p + 4] == "ER")
        or t[p + 1] == "M"
    ):
        return ("M", 2)
    return ("M", 1)


def _h_n(c: _Ctx):
    return ("N", 2) if c.t[c.pos + 1] == "N" else ("N", 1)


def _h_p(c: _Ctx):
    t, p = c.t, c.pos
    if t[p + 1] == "H":
        return ("F", 2)
    if t[p + 1] in ("P", "B"):
        return ("P", 2)
    return ("P", 1)


def _h_q(c: _Ctx):
    return ("K", 2) if c.t[c.pos + 1] == "Q" else ("K", 1)


def _h_r(c: _Ctx):
    t, p = c.t, c.pos
    adv = 2 if t[p + 1] == "R" else 1
    if (
        p == c.last
        and not c.sg
        and t[p - 2 : p] == "IE"
        and t[p - 4 : p - 2] not in ("ME", "MA")
    ):
        return ("", "R", adv)
    return ("R", adv)


def _h_s(c: _Ctx):
    t, p, first, last = c.t, c.pos, c.first, c.last
    if t[p - 1 : p + 2] in ("ISL", "YSL"):
        return (None, 1)
    if p == first and t[first : first + 5] == "SUGAR":
        return ("X", "S", 1)
    if t[p : p + 2] == "SH":
        if t[p + 1 : p + 5] in ("HEIM", "HOEK", "HOLM", "HOLZ"):
            return ("S", 2)
        return ("X", 2)
    if t[p : p + 3] in ("SIO", "SIA") or t[p : p + 4] == "SIAN":
        if not c.sg:
            return ("S", "X", 3)
        return ("S", 3)
    if (p == first and t[p + 1] in ("M", "N", "L", "W")) or t[p + 1] == "Z":
        adv = 2 if t[p + 1] == "Z" else 1
        return ("S", "X", adv)
    if t[p : p + 2] == "SC":
        if t[p + 2] == "H":
            if t[p + 3 : p + 5] in ("OO", "ER", "EN", "UY", "ED", "EM"):
                if t[p + 3 : p + 5] in ("ER", "EN"):
                    return ("X", "SK", 3)
                return ("SK", 3)
            if p == first and t[first + 3] not in _VOWELS and t[first + 3] != "W":
                return ("X", "S", 3)
            return ("X", 3)
        if t[p + 2] in ("I", "E", "Y"):
            return ("S", 3)
        return ("SK", 3)
    if p == last and t[p - 2 : p] in ("AI", "OI"):
        return ("", "S", 1)
    adv = 2 if t[p + 1] in ("S", "Z") else 1
    return ("S", adv)


def _h_t(c: _Ctx):
    t, p, first = c.t, c.pos, c.first
    if t[p : p + 4] == "TION":
        return ("X", 3)
    if t[p : p + 3] in ("TIA", "TCH"):
        return ("X", 3)
    if t[p : p + 2] == "TH" or t[p : p + 3] == "TTH":
        if (
            t[p + 2 : p + 4] in ("OM", "AM")
            or t[first : first + 4] in ("VON ", "VAN ")
            or t[first : first + 3] == "SCH"
        ):
            return ("T", 2)
        return ("0", "T", 2)
    if t[p + 1] in ("T", "D"):
        return ("T", 2)
    return ("T", 1)


def _h_v(c: _Ctx):
    return ("F", 2) if c.t[c.pos + 1] == "V" else ("F", 1)


def _h_w(c: _Ctx):
    t, p, first = c.t, c.pos, c.first
    if t[p : p + 2] == "WR":
        return ("R", 2)
    if p == first and (t[p + 1] in _VOWELS or t[p : p + 2] == "WH"):
        if t[p + 1] in _VOWELS:
            return ("A", "F", 1)
        return ("A", 1)
    if (
        (p == c.last and t[p - 1] in _VOWELS)
        or t[p - 1 : p + 5] in ("EWSKI", "EWSKY", "OWSKI", "OWSKY")
        or t[first : first + 3] == "SCH"
    ):
        return ("", "F", 1)
    if t[p : p + 4] in ("WICZ", "WITZ"):
        return ("TS", "FX", 4)
    return (None, 1)


def _h_x(c: _Ctx):
    t, p = c.t, c.pos
    code = None
    if not (
        p == c.last
        and (t[p - 3 : p] in ("IAU", "EAU") or t[p - 2 : p] in ("AU", "OU"))
    ):
        code = "KS"
    adv = 2 if t[p + 1] in ("C", "X") else 1
    return (code, adv)


def _h_z(c: _Ctx):
    t, p = c.t, c.pos
    if t[p + 1] == "H":
        codes = ("J", "J")
    elif t[p + 1 : p + 3] in ("ZO", "ZI", "ZA") or (
        c.sg and p > c.first and t[p - 1] != "T"
    ):
        codes = ("S", "TS")
    else:
        codes = ("S", "S")
    adv = 2 if t[p + 1] == "Z" else 1
    if codes[0] == codes[1]:
        return (codes[0], adv)
    return (codes[0], codes[1], adv)


_HANDLERS = {
    **{v: _h_vowel for v in "AEIOUY"},
    "B": _h_b, "C": _h_c, "Ç": lambda c: ("S", 1), "D": _h_d, "F": _h_f,
    "G": _h_g, "H": _h_h, "J": _h_j, "K": _h_k, "L": _h_l, "M": _h_m,
    "N": _h_n, "Ñ": lambda c: ("N", 1), "P": _h_p, "Q": _h_q, "R": _h_r,
    "S": _h_s, "T": _h_t, "V": _h_v, "W": _h_w, "X": _h_x, "Z": _h_z,
}


def double_metaphone(word: str) -> tuple[str | None, str | None]:
    """(primary, secondary) codes; secondary is None when identical."""
    up = word.upper()
    sg = bool(_SLAVO_RX.search(up))
    length = len(up)
    t = "--" + up + "     "
    first = 2
    last = first + length - 1
    pos = first
    if _SILENT_RX.match(t, pos):
        pos += 1

    primary = ""
    secondary = ""
    decision: tuple = ()
    guard = 0
    while pos < length + 2:
        guard += 1
        if guard > 4 * (length + 4):
            # the port's unset-decision path can loop forever on a
            # leading bare 'G...'-quirk char; bail out (unreachable for
            # words the reference itself can encode)
            break
        handler = _HANDLERS.get(t[pos])
        d = handler(_Ctx(t, pos, first, last, sg)) if handler else (None, 1)
        if d is not None:
            decision = d
        if len(decision) == 2:
            code, adv = decision
            if code is not None:
                primary += code
                secondary += code
            pos += adv
        elif len(decision) == 3:
            pcode, scode, adv = decision
            if pcode:
                primary += pcode
            if scode:
                secondary += scode
            pos += adv
        else:
            break  # no decision ever made (port would hang)

    if primary == secondary:
        return (primary, None)
    return (primary, secondary)


# ----------------------------------------------------------------- soundex

_SOUNDEX_EN = "01230120022455012623010202"


def soundex_en(word: str) -> str:
    """Classic American Soundex without length truncation (parity with
    the reference's lang/phonetic.py recipe: first letter kept, digit
    runs collapsed, zeros retained)."""
    out = ""
    head = None
    prev = None
    for ch in word.lower():
        o = ord(ch)
        if 97 <= o <= 122:
            if head is None:
                head = ch
            code = _SOUNDEX_EN[o - 97]
            if code != prev:
                out += code
            prev = code
    if head is not None:
        out = head + out[1:]
    return out


# ----------------------------------------------------------------- filter


def dmetaphone_filter(
    tb,
    primary_boost: float = 1.0,
    secondary_boost: float = 0.5,
    combine: bool = False,
):
    """DoubleMetaphoneFilter over a TokenBatch (analysis/morph.py:
    245-304): per token emit [original if combine,] primary, secondary
    — sharing the token's row/pos, boosts multiplied in.  Codes are
    computed once per unique term (same batching as stemming)."""
    from whoosh_novo_spark.functions.analysis import TokenBatch

    if len(tb.term) == 0:
        return tb
    uniq, inv = np.unique(tb.term, return_inverse=True)
    codes = [double_metaphone(u) for u in uniq]
    base_boost = tb.boost if tb.boost is not None else np.ones(len(tb.term))

    rows, terms, poss, boosts = [], [], [], []
    for i in range(len(tb.term)):
        prim, sec = codes[inv[i]]
        r, p, b = tb.row[i], tb.pos[i], base_boost[i]
        if combine:
            rows.append(r); terms.append(tb.term[i]); poss.append(p); boosts.append(b)
        if prim:
            rows.append(r); terms.append(prim); poss.append(p)
            boosts.append(b * primary_boost)
        if sec:
            rows.append(r); terms.append(sec); poss.append(p)
            boosts.append(b * secondary_boost)
    return TokenBatch(
        np.asarray(rows, dtype=np.int64),
        np.asarray(terms, dtype=object),
        np.asarray(poss, dtype=np.int64),
        tb.n_rows,
        boost=np.asarray(boosts, dtype=np.float64),
    )


# Spanish quasi-phonetic coder — regex rule table applied left-to-right
# with repeated-code collapse (public recipe the reference also uses:
# Sebastian Ferreyra's javalobby version).
_ESP_RULES = tuple(
    (re.compile(pat), repl)
    for pat, repl in (
        (r"\Aw?[uh]?([aeiou])", ""),
        (r"c[eiéí]|z|ll|sh|ch|sch|cc|y[aeiouáéíóú]|ps|bs|x|j|g[eiéí]", "s"),
        (r"[aeiouhwáéíóúü]+", ""),
        (r"y", ""),
        (r"ñ|gn", "n"),
        (r"[dpc]t", "t"),
        (r"c[aouáóú]|ck|q", "k"),
        (r"v", "b"),
        (r"d$", "t"),
    )
)


def soundex_esp(word: str) -> str:
    """Spanish soundex: first matching rule at each position emits its
    code; runs of the same code collapse."""
    w = word.lower()
    out = ""
    prev = None
    i = 0
    while i < len(w):
        code = None
        for rx, ecode in _ESP_RULES:
            mt = rx.match(w, i)
            if mt:
                i = mt.end()
                code = ecode
                break
        if code is None:
            code = w[i]
            i += 1
        if code != prev:
            out += code
        prev = code
    return out


# Arabic soundex (public recipe: Tammam Koujan's C# ArabicSoundex) —
# letter-class digits, initial alef forms dropped, vowels (class 0)
# skipped, repeats collapsed
_AR_CLASSES = {
    "ايأإآحخهعغشوي": "0",
    "فب": "1",
    "جزسصظقك": "2",
    "تثدذضط": "3",
    "ل": "4",
    "من": "5",
    "ر": "6",
}
_AR_CODES = {ch: code for chars, code in _AR_CLASSES.items() for ch in chars}


def soundex_ar(word: str) -> str:
    if word and word[0] in "اأإآ":
        word = word[1:]
    out = "0"
    prev = "0"
    if len(word) > 1:
        code = None
        for ch in word[1:]:
            if ch in _AR_CODES:
                code = _AR_CODES[ch]
            # port quirk: an unmapped char REUSES the previous mapped
            # char's code value (the lookup only runs inside the guard)
            if code != prev:
                if code != "0" and code is not None:
                    out += code
            prev = code
    return out
