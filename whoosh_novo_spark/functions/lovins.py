"""Lovins stemmer (J.B. Lovins 1968): longest-match ending removal
gated by per-ending context conditions, then a recoding
(transformation) pass.  Data (294 endings with condition letters, 36
transforms) in _lovins_data.py; parity target is the reference's
src/whoosh/lang/lovins.py, golden-gated in tests/test_lovins.py —
including its port quirks:

- condition S computes ``base[-2]`` (ONE char) and compares it to the
  two-char string "rd"/"tt", so the 'dr' arm never fires and the
  "unless t follows t" exception never triggers;
- conditions K and X read ``base[-3]`` unconditionally, so a 2-letter
  base raises IndexError exactly like the reference does.
"""

from __future__ import annotations

from collections import defaultdict

from whoosh_novo_spark.functions._lovins_data import ENDINGS, TRANSFORMS

# ---------------------------------------------------------- conditions
# One predicate per Lovins condition letter (base = word minus ending).

_COND = {}


def _cond(name):
    def reg(fn):
        _COND[name] = fn
        return fn

    return reg


@_cond("A")
def _A(b):  # no restriction
    return True


@_cond("B")
def _B(b):  # min stem length 3
    return len(b) > 2


@_cond("C")
def _C(b):  # min stem length 4
    return len(b) > 3


@_cond("D")
def _D(b):  # min stem length 5
    return len(b) > 4


@_cond("E")
def _E(b):  # not after e
    return b[-1] != "e"


@_cond("F")
def _F(b):  # min 3, not after e
    return len(b) > 2 and b[-1] != "e"


@_cond("G")
def _G(b):  # min 3, only after f
    return len(b) > 2 and b[-1] == "f"


@_cond("H")
def _H(b):  # only after t or ll
    c1, c2 = b[-2:]
    return c2 == "t" or (c2 == "l" and c1 == "l")


@_cond("I")
def _I(b):  # not after o or e
    return b[-1] not in ("o", "e")


@_cond("J")
def _J(b):  # not after a or e
    return b[-1] not in ("a", "e")


@_cond("K")
def _K(b):  # min 3, only after l, i or u*e
    c = b[-1]
    cc = b[-3]
    return len(b) > 2 and (c == "l" or c == "i" or (c == "e" and cc == "u"))


@_cond("L")
def _L(b):  # not after u, x or s (unless s follows o)
    c1, c2 = b[-2:]
    return c2 != "u" and c2 != "x" and (c2 != "s" or c1 == "o")


@_cond("M")
def _M(b):  # not after a, c, e or m
    return b[-1] not in ("a", "c", "e", "m")


@_cond("N")
def _N(b):  # min 4 after s**, elsewhere min 3
    return len(b) > 3 or (len(b) == 3 and b[-1] != "s")


@_cond("O")
def _O(b):  # only after l or i
    return b[-1] in ("l", "i")


@_cond("P")
def _P(b):  # not after c
    return b[-1] != "c"


@_cond("Q")
def _Q(b):  # min 3, not after l or n
    return len(b) > 2 and b[-1] not in ("l", "n")


@_cond("R")
def _R(b):  # only after n or r
    return b[-1] in ("n", "r")


@_cond("S")
def _S(b):  # port quirk: single char vs "rd"/"tt" two-char literals
    l2 = b[-2]
    return l2 == "rd" or (b[-1] == "t" and l2 != "tt")


@_cond("T")
def _T(b):  # only after s, or t not following o
    c1, c2 = b[-2:]
    return c2 == "s" or (c2 == "t" and c1 != "o")


@_cond("U")
def _U(b):  # only after l, m, n or r
    return b[-1] in ("l", "m", "n", "r")


@_cond("V")
def _V(b):  # only after c
    return b[-1] == "c"


@_cond("W")
def _W(b):  # not after s or u
    return b[-1] not in ("s", "u")


@_cond("X")
def _X(b):  # only after l, i or u*e (b[-3] read unconditionally — port)
    c = b[-1]
    cc = b[-3]
    return c == "l" or c == "i" or (c == "e" and cc == "u")


@_cond("Y")
def _Y(b):  # only after in
    return b[-2:] == "in"


@_cond("Z")
def _Z(b):  # not after f
    return b[-1] != "f"


@_cond("a")
def _a(b):  # only after d, f, ph, th, l, er, or, es or t
    c = b[-1]
    l2 = b[-2:]
    return (
        c in ("d", "f", "l", "t")
        or l2 in ("ph", "th", "er", "or", "es")
    )


@_cond("b")
def _b(b):  # min 3, not after met or ryst
    return len(b) > 2 and not (b.endswith("met") or b.endswith("ryst"))


@_cond("c")
def _c(b):  # only after l
    return b[-1] == "l"


# ------------------------------------------------------------- engine

_TRANSFORM_BY_LAST = defaultdict(list)
for _rule in TRANSFORMS:
    _TRANSFORM_BY_LAST[_rule[0][-1]].append(_rule)

_DOUBLES = frozenset(("dd", "gg", "ll", "mm", "nn", "pp", "rr", "ss", "tt"))


def remove_ending(word: str) -> str:
    """Longest ending (11 down to 1 chars) whose condition accepts the
    base; the base must keep at least 2 characters."""
    n = len(word)
    for el in range(11, 0, -1):
        if n - el <= 1:
            continue
        cond_name = ENDINGS.get(el, {}).get(word[n - el :])
        if cond_name is None:
            continue
        base = word[: n - el]
        if _COND[cond_name](base):
            return base
    return word


def fix_ending(word: str) -> str:
    """Recoding: undouble a final double consonant, then apply the
    first matching transformation (some carry an excluded-predecessor
    letter set)."""
    if word[-2:] in _DOUBLES:
        word = word[:-1]
    for rule in _TRANSFORM_BY_LAST[word[-1:]]:
        target, newend = rule[0], rule[1]
        if word.endswith(target):
            if len(rule) > 2:
                # indexed (not sliced) like the reference: a word that IS
                # the target raises IndexError there too
                if word[-(len(target) + 1)] in rule[2]:
                    return word
            return word[: -len(target)] + newend
    return word


def stem(word: str) -> str:
    return fix_ending(remove_ending(word))
