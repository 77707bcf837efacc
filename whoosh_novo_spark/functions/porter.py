"""Porter stemmer, behavior-identical to the reference's StemFilter.

The reference (src/whoosh/lang/porter.py) uses the classic regex-based
Porter port (tartarus.org/~martin/PorterStemmer), which deviates from the
1980 paper in well-known ways we must replicate for token parity:

- ``y`` belongs to neither the vowel class ``[aeiou]+`` nor the consonant
  class ``[^aeiouy]+`` inside the measure regexes, so measure counting
  stops at ``y`` (e.g. 'gyroscopic' keeps its 'ic');
- several post-step-1b fixups are written with ``re.match`` (anchored), so
  the double-consonant and at/bl/iz rules only fire on whole-word matches
  — i.e. effectively never ('hopping' -> 'hopp', not 'hop');
- a leading ``y`` is temporarily uppercased so it acts as a consonant.

Our table-driven implementation reproduces those semantics (golden-tested
against the reference in tests/test_porter.py); the suffix tables are the
published algorithm's.
"""

from __future__ import annotations

import re

import numpy as np

_CONS_SEQ = "[^aeiouy]+"
_VOWEL_SEQ = "[aeiou]+"

# measure predicates, y in neither class (the port's quirk)
_M_GT0 = re.compile(f"^({_CONS_SEQ})?{_VOWEL_SEQ}{_CONS_SEQ}")
_M_EQ1 = re.compile(f"^({_CONS_SEQ})?{_VOWEL_SEQ}{_CONS_SEQ}({_VOWEL_SEQ})?$")
_M_GT1 = re.compile(f"^({_CONS_SEQ})?{_VOWEL_SEQ}{_CONS_SEQ}{_VOWEL_SEQ}{_CONS_SEQ}")
_HAS_VOWEL = re.compile(f"^({_CONS_SEQ})?[aeiouy]")
_ENDS_CVC = re.compile(f"^{_CONS_SEQ}[aeiouy][^aeiouwxy]$")

_ED_ING = re.compile("^(.*)(ed|ing)$")
# anchored (match-not-search) fixups — whole-word only, as in the port
_WHOLE_AT_BL_IZ = re.compile("^(at|bl|iz)$")
_WHOLE_DOUBLE = re.compile("^([^aeiouylsz])\\1$")

_STEP2 = {
    "ational": "ate", "tional": "tion", "enci": "ence", "anci": "ance",
    "izer": "ize", "bli": "ble", "alli": "al", "entli": "ent", "eli": "e",
    "ousli": "ous", "ization": "ize", "ation": "ate", "ator": "ate",
    "alism": "al", "iveness": "ive", "fulness": "ful", "ousness": "ous",
    "aliti": "al", "iviti": "ive", "biliti": "ble", "logi": "log",
}
_STEP3 = {
    "icate": "ic", "ative": "", "alize": "al", "iciti": "ic", "ical": "ic",
    "ful": "", "ness": "",
}
# ordered like the port's alternation: first alternative wins for the
# LONGEST tail (non-greedy stem): emulate by trying longest suffix first
_STEP4 = (
    "ement", "ance", "ence", "able", "ible", "ment", "ent", "ism", "ate",
    "iti", "ous", "ive", "ize", "ant", "al", "er", "ic", "ou",
)


def stem(w: str) -> str:
    if len(w) < 3:
        return w
    first_y = w[0] == "y"
    if first_y:
        w = "Y" + w[1:]

    # step 1a
    if w.endswith("s"):
        if w.endswith("sses") or w.endswith("ies"):
            w = w[:-2]
        elif w[-2] != "s":
            w = w[:-1]

    # step 1b
    if w.endswith("eed"):
        if _M_GT0.match(w[:-3]):
            w = w[:-1]
    else:
        m = _ED_ING.match(w)
        if m and _HAS_VOWEL.match(m.group(1)):
            w = m.group(1)
            if _WHOLE_AT_BL_IZ.match(w):
                w += "e"
            elif _WHOLE_DOUBLE.match(w):
                w = w[:-1]
            elif _ENDS_CVC.match(w):
                w += "e"

    # step 1c
    if w.endswith("y") and _HAS_VOWEL.match(w[:-1]):
        w = w[:-1] + "i"

    # step 2 (longest matching suffix, like the port's regex alternation)
    for suf in sorted(_STEP2, key=len, reverse=True):
        if w.endswith(suf) and len(w) > len(suf):
            if _M_GT0.match(w[: -len(suf)]):
                w = w[: -len(suf)] + _STEP2[suf]
            break

    # step 3
    for suf in sorted(_STEP3, key=len, reverse=True):
        if w.endswith(suf) and len(w) > len(suf):
            if _M_GT0.match(w[: -len(suf)]):
                w = w[: -len(suf)] + _STEP3[suf]
            break

    # step 4
    for suf in sorted(_STEP4, key=len, reverse=True):
        if w.endswith(suf) and len(w) > len(suf):
            if _M_GT1.match(w[: -len(suf)]):
                w = w[: -len(suf)]
            break
    else:
        if w.endswith("ion") and len(w) > 4 and w[-4] in "st":
            if _M_GT1.match(w[:-3]):
                w = w[:-3]

    # step 5a
    if w.endswith("e") and len(w) > 1:
        base = w[:-1]
        if _M_GT1.match(base) or (_M_EQ1.match(base) and not _ENDS_CVC.match(base)):
            w = base
    # step 5b
    if w.endswith("ll") and _M_GT1.match(w):
        w = w[:-1]

    if first_y:
        w = "y" + w[1:]
    return w


def stem_array(words: np.ndarray) -> np.ndarray:
    """Stem each distinct word once (cached-stem analogue, morph.py:43-173)."""
    uniq, inv = np.unique(np.asarray(words, dtype=object), return_inverse=True)
    stemmed = np.array([stem(w) for w in uniq], dtype=object)
    return stemmed[inv]
