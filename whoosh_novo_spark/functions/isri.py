"""ISRI Arabic stemmer (Taghva, Elkhoury & Coombs 2005): root
extraction without a root dictionary — affix stripping then
length-specific pattern matching.  Data in _isri_data.py; the parity
target is the reference's NLTK-derived port (src/whoosh/lang/isri.py),
golden-gated in tests/test_isri.py, including its port quirks:

- in the length-6/4-root pattern, ``(stm[0] and stm[4]) == alif``
  evaluates the chained ``and`` first, so only position 4 is actually
  tested (the alif check on position 0 is dead);
- the 3/2-prefix and -suffix loops retry every 2-affix after EACH
  non-matching 3-affix (nested loop in the reference), which is
  order-equivalent to one 3-affix pass then one 2-affix pass.
"""

from __future__ import annotations

import re

from whoosh_novo_spark.functions._isri_data import (
    P1,
    P2,
    P3,
    PR4,
    PR53,
    S1,
    S2,
    S3,
    STOP_WORDS,
)

_SHORT_VOWELS = re.compile("[ً-ْ]")
_INITIAL_HAMZA = re.compile("^[آأإ]")
_ALIF = "ا"
_TEH = "ت"
_MEEM = "م"
_NOON = "ن"
_WAW = "و"
_YEH = "ي"
_TEH_MARBUTA = "ة"
_HAMZA_YEH = "ئ"


def _pre32(w: str) -> str:
    if len(w) >= 6:
        for pre3 in P3:
            if w.startswith(pre3):
                return w[3:]
            if len(w) >= 5:
                for pre2 in P2:
                    if w.startswith(pre2):
                        return w[2:]
    return w


def _suf32(w: str) -> str:
    if len(w) >= 6:
        for suf3 in S3:
            if w.endswith(suf3):
                return w[:-3]
            if len(w) >= 5:
                for suf2 in S2:
                    if w.endswith(suf2):
                        return w[:-2]
    return w


def _waw(w: str) -> str:
    if len(w) >= 4 and w[:2] == _WAW + _WAW:
        return w[1:]
    return w


def _suf1(w: str) -> str:
    for sf in S1:
        if w.endswith(sf):
            return w[:-1]
    return w


def _pre1(w: str) -> str:
    for sp in P1:
        if w.startswith(sp):
            return w[1:]
    return w


def _pro_w4(w: str) -> str:
    if w[0] in PR4[0]:
        return w[1:]
    if w[1] in PR4[1]:
        return w[0] + w[2:]
    if w[2] in PR4[2]:
        return w[:2] + w[3]
    if w[3] in PR4[3]:
        return w[:-1]
    w = _suf1(w)
    if len(w) == 4:
        w = _pre1(w)
    return w


def _pro_w53(w: str) -> str:
    if w[2] in PR53[0] and w[0] == _ALIF:
        return w[1] + w[3:]
    if w[3] in PR53[1] and w[0] == _MEEM:
        return w[1:3] + w[4]
    if w[0] in PR53[2] and w[4] == _TEH_MARBUTA:
        return w[1:4]
    if w[0] in PR53[3] and w[2] == _TEH:
        return w[1] + w[3:]
    if w[0] in PR53[4] and w[2] == _ALIF:
        return w[1] + w[3:]
    if w[2] in PR53[5] and w[4] == _TEH_MARBUTA:
        return w[:2] + w[3]
    if w[0] in PR53[6] and w[1] == _NOON:
        return w[2:]
    if w[3] == _ALIF and w[0] == _ALIF:
        return w[1:3] + w[4]
    if w[4] == _NOON and w[3] == _ALIF:
        return w[:3]
    if w[3] == _YEH and w[0] == _TEH:
        return w[1:3] + w[4]
    if w[3] == _WAW and w[1] == _ALIF:
        return w[0] + w[2] + w[4]
    if w[2] == _ALIF and w[1] == _WAW:
        return w[0] + w[3:]
    if w[3] == _HAMZA_YEH and w[2] == _ALIF:
        return w[:2] + w[4]
    if w[4] == _TEH_MARBUTA and w[1] == _ALIF:
        return w[0] + w[2:4]
    if w[4] == _YEH and w[2] == _ALIF:
        return w[:2] + w[3]
    w = _suf1(w)
    if len(w) == 5:
        w = _pre1(w)
    return w


def _pro_w54(w: str) -> str:
    if w[0] in PR53[2]:
        return w[1:]
    if w[4] == _TEH_MARBUTA:
        return w[:4]
    if w[2] == _ALIF:
        return w[:2] + w[3:]
    return w


def _end_w5(w: str) -> str:
    if len(w) == 4:
        return _pro_w4(w)
    if len(w) == 5:
        return _pro_w54(w)
    return w


def _pro_w6(w: str) -> str:
    if w.startswith(_ALIF + "س" + _TEH) or w.startswith(
        _MEEM + "س" + _TEH
    ):
        return w[3:]
    if w[0] == _MEEM and w[3] == _ALIF and w[5] == _TEH_MARBUTA:
        return w[1:3] + w[4]
    if w[0] == _ALIF and w[2] == _TEH and w[4] == _ALIF:
        return w[1] + w[3] + w[5]
    if w[0] == _ALIF and w[3] == _WAW and w[2] == w[4]:
        return w[1] + w[4:]
    if w[0] == _TEH and w[2] == _ALIF and w[4] == _YEH:
        return w[1] + w[3] + w[5]
    w = _suf1(w)
    if len(w) == 6:
        w = _pre1(w)
    return w


def _pro_w64(w: str) -> str:
    # port quirk: (w[0] and w[4]) == alif tests only position 4
    if (w[0] and w[4]) == _ALIF:
        return w[1:4] + w[5]
    if w.startswith(_MEEM + _TEH):
        return w[2:]
    return w


def _end_w6(w: str) -> str:
    if len(w) == 5:
        return _end_w5(_pro_w53(w))
    if len(w) == 6:
        return _pro_w64(w)
    return w


def stem(token: str) -> str:
    """Arabic root (or normalized form) for a token."""
    w = _SHORT_VOWELS.sub("", token)
    if w in STOP_WORDS:
        return w
    w = _pre32(w)
    w = _suf32(w)
    w = _waw(w)
    w = _INITIAL_HAMZA.sub(_ALIF, w)
    if len(w) <= 3:
        return w
    if len(w) == 4:
        return _pro_w4(w)
    if len(w) == 5:
        return _end_w5(_pro_w53(w))
    if len(w) == 6:
        return _end_w6(_pro_w6(w))
    if len(w) == 7:
        w = _suf1(w)
        if len(w) == 7:
            w = _pre1(w)
        if len(w) == 6:
            return _end_w6(_pro_w6(w))
    return w
