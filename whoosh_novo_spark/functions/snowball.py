"""Clean-room Snowball-family stemmers: English (porter2), German,
French, Spanish, Italian, Portuguese, Dutch, Danish, Norwegian,
Swedish, Russian, Finnish, Romanian, Hungarian — the oracle's entire
Snowball family.  (Turkish has a stop list but no stemmer on either
side; Arabic's ISRI stemmer is outside the Snowball family.)

Written from the published Snowball algorithm descriptions
(https://snowballstem.org/algorithms/).  The parity target, however, is
the reference engine's NLTK-derived port
(src/whoosh/lang/snowball/{english,german,french,spanish}.py), which
deviates from the official algorithms in several well-known ways; we
replicate the PORT's behavior so indexed tokens match the reference
token-for-token (golden-gated in tests/test_snowball.py).  Port quirks
we reproduce on purpose are flagged inline with "port quirk:".  No code
is copied — behavior only.

State model: each stemmer tracks the candidate regions R1/R2 (and RV
for the Romance languages) as plain strings that shrink in tandem with
the word, because several port quirks are only expressible that way
(e.g. porter2's r2 fallback to "e" when a rewrite underruns the
region).
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------- regions


def _std_regions(w: str, vowels: str) -> tuple[str, str]:
    """Standard snowball R1/R2: region after the first non-vowel that
    follows a vowel; R2 likewise within R1 (snowballstem.org/texts/r1r2)."""
    reg1 = ""
    for i in range(1, len(w)):
        if w[i] not in vowels and w[i - 1] in vowels:
            reg1 = w[i + 1 :]
            break
    reg2 = ""
    for i in range(1, len(reg1)):
        if reg1[i] not in vowels and reg1[i - 1] in vowels:
            reg2 = reg1[i + 1 :]
            break
    return reg1, reg2


def _std_rv(w: str, vowels: str) -> str:
    """Standard RV (Spanish).  port quirk: the 'first two letters are
    vowels' test is written ``word[:2] in vowels`` — a SUBSTRING
    membership test against the vowel string, so it is True only when
    the two letters appear adjacently inside the vowel alphabet (e.g.
    'ei', 'io', 'ou'), not for arbitrary vowel pairs.  We replicate it."""
    rvr = ""
    if len(w) >= 2:
        if w[1] not in vowels:
            for i in range(2, len(w)):
                if w[i] in vowels:
                    rvr = w[i + 1 :]
                    break
        elif w[:2] in vowels:  # port quirk (see docstring)
            for i in range(2, len(w)):
                if w[i] not in vowels:
                    rvr = w[i + 1 :]
                    break
        else:
            rvr = w[3:]
    return rvr


# --------------------------------------------------------------- german

_DE_VOWELS = "aeiouyäöü"
_DE_S_ENDING = "bdfghklmnrt"
_DE_ST_ENDING = "bdfghklmnt"


def stem_de(word: str) -> str:
    """German Snowball (snowballstem.org/algorithms/german/)."""
    w = word.lower().replace("ß", "ss")

    # u/y between vowels act as consonants — mark with uppercase.  The
    # scan reads the MUTATED string (port behavior): a just-marked 'U'
    # is no longer a vowel for the next position's left-neighbor test.
    cs = list(w)
    for i in range(1, len(cs) - 1):
        if cs[i - 1] in _DE_VOWELS and cs[i + 1] in _DE_VOWELS:
            if cs[i] == "u":
                cs[i] = "U"
            elif cs[i] == "y":
                cs[i] = "Y"
    w = "".join(cs)

    reg1, reg2 = _std_regions(w, _DE_VOWELS)
    # R1 floor: the region before R1 must hold at least 3 letters — but
    # only applied when a vowel/non-vowel boundary exists at all
    for i in range(1, len(w)):
        if w[i] not in _DE_VOWELS and w[i - 1] in _DE_VOWELS:
            if i + 1 < 3:
                reg1 = w[3:]
            break

    # step 1 — first matching suffix wins (list is longest-first)
    for sfx in ("ern", "em", "er", "en", "es", "e", "s"):
        if reg1.endswith(sfx):
            k = len(sfx)
            if sfx in ("en", "es", "e") and w[-k - 4 : -k] == "niss":
                # port quirk: 'niss' before the suffix drops one extra
                # char (the doubled s), e.g. verhaeltnisse -> verhaeltnis
                w, reg1, reg2 = w[: -k - 1], reg1[: -k - 1], reg2[: -k - 1]
            elif sfx == "s":
                if w[-2] in _DE_S_ENDING:
                    w, reg1, reg2 = w[:-1], reg1[:-1], reg2[:-1]
            else:
                w, reg1, reg2 = w[:-k], reg1[:-k], reg2[:-k]
            break

    # step 2
    for sfx in ("est", "en", "er", "st"):
        if reg1.endswith(sfx):
            if sfx == "st":
                if w[-3] in _DE_ST_ENDING and len(w) >= 6:
                    w, reg1, reg2 = w[:-2], reg1[:-2], reg2[:-2]
            else:
                k = len(sfx)
                w, reg1, reg2 = w[:-k], reg1[:-k], reg2[:-k]
            break

    # step 3 — derivational (d-) suffixes
    for sfx in ("isch", "lich", "heit", "keit", "end", "ung", "ig", "ik"):
        if reg2.endswith(sfx):
            k = len(sfx)
            if sfx in ("end", "ung"):
                if "ig" in reg2[-k - 2 : -k] and "e" not in reg2[-k - 3 : -k - 2]:
                    w = w[: -k - 2]
                else:
                    w = w[:-k]
            elif sfx in ("ig", "ik", "isch"):
                if "e" not in reg2[-k - 1 : -k]:
                    w = w[:-k]
            elif sfx in ("lich", "heit"):
                if "er" in reg1[-k - 2 : -k] or "en" in reg1[-k - 2 : -k]:
                    w = w[: -k - 2]
                else:
                    w = w[:-k]
            else:  # keit
                if "lich" in reg2[-k - 4 : -k]:
                    w = w[: -k - 4]
                elif "ig" in reg2[-k - 2 : -k]:
                    w = w[: -k - 2]
                else:
                    w = w[:-k]
            break

    # unumlaut and unmark
    for a, b in (
        ("ä", "a"),
        ("ö", "o"),
        ("ü", "u"),
        ("U", "u"),
        ("Y", "y"),
    ):
        w = w.replace(a, b)
    return w


# --------------------------------------------------------------- spanish

_ES_VOWELS = "aeiouáéíóúü"

_ES_STEP0 = (
    "selas", "selos", "sela", "selo", "las", "les", "los", "nos",
    "me", "se", "la", "le", "lo",
)
_ES_STEP1 = (
    "amientos", "imientos", "amiento", "imiento", "aciones", "uciones",
    "adoras", "adores", "ancias", "logías", "encias", "amente",
    "idades", "anzas", "ismos", "ables", "ibles", "istas", "adora",
    "ación", "antes", "ancia", "logía", "ución", "encia",
    "mente", "anza", "icos", "icas", "ismo", "able", "ible", "ista",
    "osos", "osas", "ador", "ante", "idad", "ivas", "ivos", "ico",
    "ica", "oso", "osa", "iva", "ivo",
)
_ES_STEP2A = (
    "yeron", "yendo", "yamos", "yais", "yan", "yen", "yas", "yes",
    "ya", "ye", "yo", "yó",
)
_ES_STEP2B = (
    "aríamos", "eríamos", "iríamos", "iéramos",
    "iésemos", "aríais", "aremos", "eríais", "eremos",
    "iríais", "iremos", "ierais", "ieseis", "asteis", "isteis",
    "ábamos", "áramos", "ásemos", "arían",
    "arías", "aréis", "erían", "erías", "eréis",
    "irían", "irías", "iréis", "ieran", "iesen", "ieron",
    "iendo", "ieras", "ieses", "abais", "arais", "aseis", "éamos",
    "arán", "arás", "aría", "erán", "erás",
    "ería", "irán", "irás", "iría", "iera", "iese",
    "aste", "iste", "aban", "aran", "asen", "aron", "ando", "abas",
    "adas", "idas", "aras", "ases", "íais", "ados", "idos", "amos",
    "imos", "emos", "ará", "aré", "erá", "eré",
    "irá", "iré", "aba", "ada", "ida", "ara", "ase",
    "ían", "ado", "ido", "ías", "áis", "éis",
    "ía", "ad", "ed", "id", "an", "ió", "ar", "er", "ir",
    "as", "ís", "en", "es",
)
_ES_STEP3 = ("os", "a", "e", "o", "á", "é", "í", "ó")

_ES_GERUNDS_ACC = ("iéndo", "ándo", "ár", "ér", "ír")
_ES_GERUNDS_PLAIN = ("ando", "iendo", "ar", "er", "ir")


def _es_deaccent(s: str) -> str:
    return (
        s.replace("á", "a").replace("é", "e").replace("í", "i")
    )


def stem_es(word: str) -> str:
    """Spanish Snowball (snowballstem.org/algorithms/spanish/)."""
    w = word.lower()
    step1_hit = False

    reg1, reg2 = _std_regions(w, _ES_VOWELS)
    rvr = _std_rv(w, _ES_VOWELS)

    # step 0 — attached pronouns.  port quirk: the loop breaks on the
    # first suffix the WORD ends with, even when the RV gate then fails
    # (official algorithm keeps looking)
    for sfx in _ES_STEP0:
        if w.endswith(sfx):
            k = len(sfx)
            if rvr.endswith(sfx):
                if rvr[:-k].endswith(_ES_GERUNDS_ACC):
                    # port quirk: the de-accenting hits the WHOLE word,
                    # not just the gerund ending
                    w = _es_deaccent(w[:-k])
                    reg1 = _es_deaccent(reg1[:-k])
                    reg2 = _es_deaccent(reg2[:-k])
                    rvr = _es_deaccent(rvr[:-k])
                elif rvr[:-k].endswith(_ES_GERUNDS_PLAIN) or (
                    rvr[:-k].endswith("yendo") and w[:-k].endswith("uyendo")
                ):
                    w, reg1, reg2, rvr = w[:-k], reg1[:-k], reg2[:-k], rvr[:-k]
            break

    # step 1 — standard suffixes
    for sfx in _ES_STEP1:
        if w.endswith(sfx):
            k = len(sfx)
            if sfx == "amente" and reg1.endswith(sfx):
                step1_hit = True
                w, reg2, rvr = w[:-6], reg2[:-6], rvr[:-6]
                if reg2.endswith("iv"):
                    w, reg2, rvr = w[:-2], reg2[:-2], rvr[:-2]
                    if reg2.endswith("at"):
                        w, rvr = w[:-2], rvr[:-2]
                elif reg2.endswith(("os", "ic", "ad")):
                    w, rvr = w[:-2], rvr[:-2]
            elif reg2.endswith(sfx):
                step1_hit = True
                if sfx in (
                    "adora", "ador", "ación", "adoras", "adores",
                    "aciones", "ante", "antes", "ancia", "ancias",
                ):
                    w, reg2, rvr = w[:-k], reg2[:-k], rvr[:-k]
                    if reg2.endswith("ic"):
                        w, rvr = w[:-2], rvr[:-2]
                elif sfx in ("logía", "logías"):
                    # port quirk: str.replace hits EVERY occurrence
                    w = w.replace(sfx, "log")
                    rvr = rvr.replace(sfx, "log")
                elif sfx in ("ución", "uciones"):
                    w = w.replace(sfx, "u")
                    rvr = rvr.replace(sfx, "u")
                elif sfx in ("encia", "encias"):
                    w = w.replace(sfx, "ente")
                    rvr = rvr.replace(sfx, "ente")
                elif sfx == "mente":
                    w, reg2, rvr = w[:-5], reg2[:-5], rvr[:-5]
                    if reg2.endswith(("ante", "able", "ible")):
                        w, rvr = w[:-4], rvr[:-4]
                elif sfx in ("idad", "idades"):
                    w, reg2, rvr = w[:-k], reg2[:-k], rvr[:-k]
                    # port quirk: EVERY matching pre-suffix is removed
                    # in sequence, not just the first
                    for pre in ("abil", "ic", "iv"):
                        if reg2.endswith(pre):
                            w, rvr = w[: -len(pre)], rvr[: -len(pre)]
                elif sfx in ("ivo", "iva", "ivos", "ivas"):
                    w, reg2, rvr = w[:-k], reg2[:-k], rvr[:-k]
                    if reg2.endswith("at"):
                        w, rvr = w[:-2], rvr[:-2]
                else:
                    w, rvr = w[:-k], rvr[:-k]
            break

    if not step1_hit:
        # step 2a — verb suffixes beginning with y (preceded by u)
        hit2a = False
        for sfx in _ES_STEP2A:
            if rvr.endswith(sfx) and w[-len(sfx) - 1 : -len(sfx)] == "u":
                w, rvr = w[: -len(sfx)], rvr[: -len(sfx)]
                hit2a = True
                break
        # step 2b — other verb suffixes.  port quirk: 2b runs even after
        # a 2a hit (official algorithm stops); kept for parity
        del hit2a
        for sfx in _ES_STEP2B:
            if rvr.endswith(sfx):
                k = len(sfx)
                w, rvr = w[:-k], rvr[:-k]
                if sfx in ("en", "es", "éis", "emos"):
                    if w.endswith("gu"):
                        w = w[:-1]
                    if rvr.endswith("gu"):
                        rvr = rvr[:-1]
                break

    # step 3 — residual suffix
    for sfx in _ES_STEP3:
        if rvr.endswith(sfx):
            k = len(sfx)
            if sfx in ("e", "é"):
                w, rvr = w[:-k], rvr[:-k]
                if len(w) >= 2 and w[-2:] == "gu" and rvr and rvr[-1] == "u":
                    w = w[:-1]
            else:
                w = w[:-k]
            break

    return (
        w.replace("á", "a").replace("é", "e").replace("í", "i")
        .replace("ó", "o").replace("ú", "u")
    )


# --------------------------------------------------------------- french

_FR_VOWELS = "aeiouyâàëéêèïîôûù"

_FR_STEP1 = (
    "issements", "issement", "atrices", "atrice", "ateurs", "ations",
    "logies", "usions", "utions", "ements", "amment", "emment", "ances",
    "iqUes", "ismes", "ables", "istes", "ateur", "ation", "logie",
    "usion", "ution", "ences", "ement", "euses", "ments", "ance",
    "iqUe", "isme", "able", "iste", "ence", "ités", "ives", "eaux",
    "euse", "ment", "eux", "ité", "ive", "ifs", "aux", "if",
)
_FR_STEP2A = (
    "issaIent", "issantes", "iraIent", "issante", "issants", "issions",
    "irions", "issais", "issait", "issant", "issent", "issiez",
    "issons", "irais", "irait", "irent", "iriez", "irons", "iront",
    "isses", "issez", "îmes", "îtes", "irai", "iras", "irez",
    "isse", "ies", "ira", "ît", "ie", "ir", "is", "it", "i",
)
_FR_STEP2B = (
    "eraIent", "assions", "erions", "assent", "assiez", "èrent",
    "erais", "erait", "eriez", "erons", "eront", "aIent", "antes",
    "asses", "ions", "erai", "eras", "erez", "âmes", "âtes",
    "ante", "ants", "asse", "ées", "era", "iez", "ais", "ait",
    "ant", "ée", "és", "er", "ez", "ât", "ai", "as",
    "é", "a",
)
_FR_STEP2B_ER = (
    "eraIent", "erions", "èrent", "erais", "erait", "eriez",
    "erons", "eront", "erai", "eras", "erez", "ées", "era", "iez",
    "ée", "és", "er", "ez", "é",
)
_FR_STEP2B_A = (
    "assions", "assent", "assiez", "aIent", "antes", "asses",
    "âmes", "âtes", "ante", "ants", "asse", "ais", "ait", "ant",
    "ât", "ai", "as", "a",
)
_FR_STEP4 = ("ière", "Ière", "ion", "ier", "Ier", "e", "ë")


def _fr_rv(w: str) -> str:
    """French RV: after the third letter when the word starts with two
    vowels (or the exceptional par/col/tap prefixes), else after the
    first vowel not at position 0."""
    rvr = ""
    if len(w) >= 2:
        if w.startswith(("par", "col", "tap")) or (
            w[0] in _FR_VOWELS and w[1] in _FR_VOWELS
        ):
            rvr = w[3:]
        else:
            for i in range(1, len(w)):
                if w[i] in _FR_VOWELS:
                    rvr = w[i + 1 :]
                    break
    return rvr


def stem_fr(word: str) -> str:  # noqa: C901
    """French Snowball (snowballstem.org/algorithms/french/).

    port quirk (pervasive): most region gates test substring
    CONTAINMENT (``sfx in reg2``) instead of endswith, and locate the
    suffix with rindex; we replicate both."""
    w = word.lower()
    step1_hit = False
    rv_hit = False
    step2a_hit = False
    step2b_hit = False

    # mark u after q; u/i between vowels; y adjacent to a vowel.  All
    # scans read the mutating string (port behavior).
    cs = list(w)
    for i in range(1, len(cs)):
        if cs[i - 1] == "q" and cs[i] == "u":
            cs[i] = "U"
    for i in range(1, len(cs) - 1):
        if cs[i - 1] in _FR_VOWELS and cs[i + 1] in _FR_VOWELS:
            if cs[i] == "u":
                cs[i] = "U"
            elif cs[i] == "i":
                cs[i] = "I"
        if (cs[i - 1] in _FR_VOWELS or cs[i + 1] in _FR_VOWELS) and cs[i] == "y":
            cs[i] = "Y"
    w = "".join(cs)

    reg1, reg2 = _std_regions(w, _FR_VOWELS)
    rvr = _fr_rv(w)

    # step 1 — standard suffixes
    for sfx in _FR_STEP1:
        if w.endswith(sfx):
            k = len(sfx)
            if sfx == "eaux":
                w = w[:-1]
                step1_hit = True
            elif sfx in ("euse", "euses"):
                if sfx in reg2:
                    w = w[:-k]
                    step1_hit = True
                elif sfx in reg1:
                    w = w[:-k] + "eux"
                    step1_hit = True
            elif sfx in ("ement", "ements") and sfx in rvr:
                w = w[:-k]
                step1_hit = True
                if w[-2:] == "iv" and "iv" in reg2:
                    w = w[:-2]
                    if w[-2:] == "at" and "at" in reg2:
                        w = w[:-2]
                elif w[-3:] == "eus":
                    if "eus" in reg2:
                        w = w[:-3]
                    elif "eus" in reg1:
                        w = w[:-1] + "x"
                elif w[-3:] in ("abl", "iqU"):
                    if "abl" in reg2 or "iqU" in reg2:
                        w = w[:-3]
                elif w[-3:] in ("ièr", "Ièr"):
                    if "ièr" in rvr or "Ièr" in rvr:
                        w = w[:-3] + "i"
            elif sfx == "amment" and sfx in rvr:
                w = w[:-6] + "ant"
                rvr = rvr[:-6] + "ant"
                rv_hit = True
            elif sfx == "emment" and sfx in rvr:
                w = w[:-6] + "ent"
                rv_hit = True
            elif (
                sfx in ("ment", "ments")
                and sfx in rvr
                and not rvr.startswith(sfx)
                and rvr[rvr.rindex(sfx) - 1] in _FR_VOWELS
            ):
                w, rvr = w[:-k], rvr[:-k]
                rv_hit = True
            elif sfx == "aux" and sfx in reg1:
                w = w[:-2] + "l"
                step1_hit = True
            elif (
                sfx in ("issement", "issements")
                and sfx in reg1
                and w[-k - 1] not in _FR_VOWELS
            ):
                w = w[:-k]
                step1_hit = True
            elif (
                sfx in (
                    "ance", "iqUe", "isme", "able", "iste", "eux",
                    "ances", "iqUes", "ismes", "ables", "istes",
                )
                and sfx in reg2
            ):
                w = w[:-k]
                step1_hit = True
            elif (
                sfx in ("atrice", "ateur", "ation", "atrices", "ateurs", "ations")
                and sfx in reg2
            ):
                w = w[:-k]
                step1_hit = True
                if w[-2:] == "ic":
                    if "ic" in reg2:
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
            elif sfx in ("logie", "logies") and sfx in reg2:
                w = w[:-k] + "log"
                step1_hit = True
            elif sfx in ("usion", "ution", "usions", "utions") and sfx in reg2:
                w = w[:-k] + "u"
                step1_hit = True
            elif sfx in ("ence", "ences") and sfx in reg2:
                w = w[:-k] + "ent"
                step1_hit = True
            elif sfx in ("ité", "ités") and sfx in reg2:
                w = w[:-k]
                step1_hit = True
                if w[-4:] == "abil":
                    if "abil" in reg2:
                        w = w[:-4]
                    else:
                        w = w[:-2] + "l"
                elif w[-2:] == "ic":
                    if "ic" in reg2:
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
                elif w[-2:] == "iv":
                    if "iv" in reg2:
                        w = w[:-2]
            elif sfx in ("if", "ive", "ifs", "ives") and sfx in reg2:
                w = w[:-k]
                step1_hit = True
                if w[-2:] == "at" and "at" in reg2:
                    w = w[:-2]
                    if w[-2:] == "ic":
                        if "ic" in reg2:
                            w = w[:-2]
                        else:
                            w = w[:-2] + "iqU"
            break

    if not step1_hit or rv_hit:
        # step 2a — verb suffixes beginning with i (preceded by a
        # non-vowel inside RV; located via rindex — port quirk)
        for sfx in _FR_STEP2A:
            if w.endswith(sfx):
                if (
                    sfx in rvr
                    and len(rvr) > len(sfx)
                    and rvr[rvr.rindex(sfx) - 1] not in _FR_VOWELS
                ):
                    w = w[: -len(sfx)]
                    step2a_hit = True
                break

        if not step2a_hit:
            # step 2b — other verb suffixes
            for sfx in _FR_STEP2B:
                if rvr.endswith(sfx):
                    k = len(sfx)
                    if sfx == "ions" and "ions" in reg2:
                        w = w[:-4]
                        step2b_hit = True
                    elif sfx in _FR_STEP2B_ER:
                        w = w[:-k]
                        step2b_hit = True
                    elif sfx in _FR_STEP2B_A:
                        w, rvr = w[:-k], rvr[:-k]
                        step2b_hit = True
                        if rvr.endswith("e"):
                            w = w[:-1]
                    # "ions" outside R2 falls through: matched, no
                    # change, stop scanning (port behavior)
                    break

    if step1_hit or step2a_hit or step2b_hit:
        # step 3
        if w[-1] == "Y":
            w = w[:-1] + "i"
        elif w[-1] == "ç":
            w = w[:-1] + "c"
    else:
        # step 4 — residual suffixes
        if len(w) >= 2 and w[-1] == "s" and w[-2] not in "aiouès":
            w = w[:-1]
        for sfx in _FR_STEP4:
            if w.endswith(sfx):
                if sfx in rvr:
                    if sfx == "ion" and sfx in reg2 and rvr[-4] in "st":
                        w = w[:-3]
                    elif sfx in ("ier", "ière", "Ier", "Ière"):
                        w = w[: -len(sfx)] + "i"
                    elif sfx == "e":
                        w = w[:-1]
                    elif sfx == "ë" and w[-3:-1] == "gu":
                        w = w[:-1]
                    break

    # step 5 — undouble
    if w.endswith(("enn", "onn", "ett", "ell", "eill")):
        w = w[:-1]

    # step 6 — un-accent the last vowel if it is é/è and not final
    for i in range(1, len(w)):
        if w[-i] in _FR_VOWELS:
            if i != 1 and w[-i] in ("é", "è"):
                w = w[:-i] + "e" + w[len(w) - i + 1 :]
            break

    return w.replace("I", "i").replace("U", "u").replace("Y", "y")


# --------------------------------------------------------------- english

_EN_VOWELS = "aeiouy"
_EN_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_EN_LI_ENDING = "cdeghkmnrt"

_EN_SPECIAL = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl", "sky": "sky",
    "news": "news", "howe": "howe", "atlas": "atlas", "cosmos": "cosmos",
    "bias": "bias", "andes": "andes", "inning": "inning",
    "innings": "inning", "outing": "outing", "outings": "outing",
    "canning": "canning", "cannings": "canning", "herring": "herring",
    "herrings": "herring", "earring": "earring", "earrings": "earring",
    "proceed": "proceed", "proceeds": "proceed", "proceeded": "proceed",
    "proceeding": "proceed", "exceed": "exceed", "exceeds": "exceed",
    "exceeded": "exceed", "exceeding": "exceed", "succeed": "succeed",
    "succeeds": "succeed", "succeeded": "succeed", "succeeding": "succeed",
}

# step 2/3 rewrite tables: suffix -> (replacement, r2 fallback when the
# region underruns the suffix).  port quirk: the fallback is "" for most
# rows but "e" for the ate/ive families — an NLTK bug we replicate.
_EN_STEP2 = (
    "ization", "ational", "fulness", "ousness", "iveness", "tional",
    "biliti", "lessli", "entli", "ation", "alism", "aliti", "ousli",
    "iviti", "fulli", "enci", "anci", "abli", "izer", "ator", "alli",
    "bli", "ogi", "li",
)
_EN_STEP3 = (
    "ational", "tional", "alize", "icate", "iciti", "ative", "ical",
    "ness", "ful",
)
_EN_STEP4 = (
    "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
    "ism", "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic",
)


def _en_rewrite(w, reg1, reg2, k, repl, r2_fb=""):
    """Rewrite the k-char suffix to ``repl`` on word/R1/R2 in tandem;
    a region shorter than the suffix collapses to its fallback."""
    w = w[:-k] + repl
    reg1 = reg1[:-k] + repl if len(reg1) >= k else ""
    reg2 = reg2[:-k] + repl if len(reg2) >= k else r2_fb
    return w, reg1, reg2


def _en_cut(w, reg1, reg2, k):
    return w[:-k], reg1[:-k], reg2[:-k]


def stem_en(word: str) -> str:  # noqa: C901
    """English Snowball / porter2 (snowballstem.org/algorithms/english/)."""
    w = word.lower()
    if w in _EN_SPECIAL:
        return _EN_SPECIAL[w]

    w = (
        w.replace("’", "'").replace("‘", "'").replace("‛", "'")
    )
    if w.startswith("'"):
        w = w[1:]
    if w.startswith("y"):
        w = "Y" + w[1:]
    for i in range(1, len(w)):
        if w[i - 1] in _EN_VOWELS and w[i] == "y":
            w = w[:i] + "Y" + w[i + 1 :]

    # R1 with the gener-/commun-/arsen- exception
    if w.startswith(("gener", "commun", "arsen")):
        reg1 = w[6:] if w.startswith("commun") else w[5:]
        reg2 = ""
        for i in range(1, len(reg1)):
            if reg1[i] not in _EN_VOWELS and reg1[i - 1] in _EN_VOWELS:
                reg2 = reg1[i + 1 :]
                break
    else:
        reg1, reg2 = _std_regions(w, _EN_VOWELS)

    # step 0 — apostrophe suffixes
    for sfx in ("'s'", "'s", "'"):
        if w.endswith(sfx):
            w, reg1, reg2 = _en_cut(w, reg1, reg2, len(sfx))
            break

    # step 1a
    for sfx in ("sses", "ied", "ies", "us", "ss", "s"):
        if w.endswith(sfx):
            if sfx == "sses":
                w, reg1, reg2 = _en_cut(w, reg1, reg2, 2)
            elif sfx in ("ied", "ies"):
                cut = 2 if len(w) - len(sfx) > 1 else 1
                w, reg1, reg2 = _en_cut(w, reg1, reg2, cut)
            elif sfx == "s":
                if any(c in _EN_VOWELS for c in w[:-2]):
                    w, reg1, reg2 = _en_cut(w, reg1, reg2, 1)
            # port quirk: 'us'/'ss' are listed but do nothing (they only
            # stop the scan)
            break

    # step 1b
    for sfx in ("eedly", "ingly", "edly", "eed", "ing", "ed"):
        if w.endswith(sfx):
            k = len(sfx)
            if sfx in ("eed", "eedly"):
                if reg1.endswith(sfx):
                    w, reg1, reg2 = _en_rewrite(w, reg1, reg2, k, "ee")
            elif any(c in _EN_VOWELS for c in w[:-k]):
                w, reg1, reg2 = _en_cut(w, reg1, reg2, k)
                if w.endswith(("at", "bl", "iz")):
                    w += "e"
                    reg1 += "e"
                    # port quirk: the r2 'e' is gated on word length OR
                    # an already-3-char r1 — not on r2 membership
                    if len(w) > 5 or len(reg1) >= 3:
                        reg2 += "e"
                elif w.endswith(_EN_DOUBLES):
                    w, reg1, reg2 = _en_cut(w, reg1, reg2, 1)
                elif (
                    reg1 == ""
                    and len(w) >= 3
                    and w[-1] not in _EN_VOWELS
                    and w[-1] not in "wxY"
                    and w[-2] in _EN_VOWELS
                    and w[-3] not in _EN_VOWELS
                ) or (
                    reg1 == ""
                    and len(w) == 2
                    and w[0] in _EN_VOWELS
                    and w[1] not in _EN_VOWELS
                ):
                    w += "e"
                    if reg1:
                        reg1 += "e"
                    if reg2:
                        reg2 += "e"
            break

    # step 1c — y -> i after a consonant (not word-initial)
    if len(w) > 2 and w[-1] in "yY" and w[-2] not in _EN_VOWELS:
        w = w[:-1] + "i"
        reg1 = reg1[:-1] + "i" if reg1 else ""
        reg2 = reg2[:-1] + "i" if reg2 else ""

    # step 2
    for sfx in _EN_STEP2:
        if w.endswith(sfx):
            if reg1.endswith(sfx):
                k = len(sfx)
                if sfx == "tional":
                    w, reg1, reg2 = _en_cut(w, reg1, reg2, 2)
                elif sfx in ("enci", "anci", "abli"):
                    w, reg1, reg2 = _en_rewrite(w, reg1, reg2, 1, "e")
                elif sfx == "entli":
                    w, reg1, reg2 = _en_cut(w, reg1, reg2, 2)
                elif sfx in ("izer", "ization"):
                    w, reg1, reg2 = _en_rewrite(w, reg1, reg2, k, "ize")
                elif sfx in ("ational", "ation", "ator"):
                    w, reg1, reg2 = _en_rewrite(w, reg1, reg2, k, "ate", "e")
                elif sfx in ("alism", "aliti", "alli"):
                    w, reg1, reg2 = _en_rewrite(w, reg1, reg2, k, "al")
                elif sfx == "fulness":
                    w, reg1, reg2 = _en_cut(w, reg1, reg2, 4)
                elif sfx in ("ousli", "ousness"):
                    w, reg1, reg2 = _en_rewrite(w, reg1, reg2, k, "ous")
                elif sfx in ("iveness", "iviti"):
                    w, reg1, reg2 = _en_rewrite(w, reg1, reg2, k, "ive", "e")
                elif sfx in ("biliti", "bli"):
                    w, reg1, reg2 = _en_rewrite(w, reg1, reg2, k, "ble")
                elif sfx == "ogi":
                    if w[-4] == "l":
                        w, reg1, reg2 = _en_cut(w, reg1, reg2, 1)
                elif sfx in ("fulli", "lessli"):
                    w, reg1, reg2 = _en_cut(w, reg1, reg2, 2)
                elif sfx == "li":
                    if w[-3] in _EN_LI_ENDING:
                        w, reg1, reg2 = _en_cut(w, reg1, reg2, 2)
            break

    # step 3
    for sfx in _EN_STEP3:
        if w.endswith(sfx):
            if reg1.endswith(sfx):
                k = len(sfx)
                if sfx == "tional":
                    w, reg1, reg2 = _en_cut(w, reg1, reg2, 2)
                elif sfx == "ational":
                    w, reg1, reg2 = _en_rewrite(w, reg1, reg2, k, "ate")
                elif sfx == "alize":
                    w, reg1, reg2 = _en_cut(w, reg1, reg2, 3)
                elif sfx in ("icate", "iciti", "ical"):
                    w, reg1, reg2 = _en_rewrite(w, reg1, reg2, k, "ic")
                elif sfx in ("ful", "ness"):
                    w, reg1, reg2 = _en_cut(w, reg1, reg2, k)
                elif sfx == "ative":
                    if reg2.endswith(sfx):
                        w, reg1, reg2 = _en_cut(w, reg1, reg2, 5)
            break

    # step 4
    for sfx in _EN_STEP4:
        if w.endswith(sfx):
            if reg2.endswith(sfx):
                if sfx == "ion":
                    if w[-4] in "st":
                        w, reg1, reg2 = _en_cut(w, reg1, reg2, 3)
                else:
                    w, reg1, reg2 = _en_cut(w, reg1, reg2, len(sfx))
            break

    # step 5
    if reg2.endswith("l") and w[-2] == "l":
        w = w[:-1]
    elif reg2.endswith("e"):
        w = w[:-1]
    elif reg1.endswith("e"):
        if len(w) >= 4 and (
            w[-2] in _EN_VOWELS
            or w[-2] in "wxY"
            or w[-3] not in _EN_VOWELS
            or w[-4] in _EN_VOWELS
        ):
            w = w[:-1]

    return w.replace("Y", "y")


# --------------------------------------------------------------- italian

_IT_VOWELS = "aeiouàèìòù"
_IT_STEP0 = (
    "gliela", "gliele", "glieli", "glielo", "gliene", "sene", "mela",
    "mele", "meli", "melo", "mene", "tela", "tele", "teli", "telo",
    "tene", "cela", "cele", "celi", "celo", "cene", "vela", "vele",
    "veli", "velo", "vene", "gli", "ci", "la", "le", "li", "lo", "mi",
    "ne", "si", "ti", "vi",
)
_IT_STEP1 = (
    "atrice", "atrici", "azione", "azioni", "uzione", "uzioni",
    "usione", "usioni", "amento", "amenti", "imento", "imenti",
    "amente", "abile", "abili", "ibile", "ibili", "mente", "atore",
    "atori", "logia", "logie", "anza", "anze", "iche", "ichi", "ismo",
    "ismi", "ista", "iste", "isti", "istà", "istè", "istì", "ante",
    "anti", "enza", "enze", "ico", "ici", "ica", "ice", "oso", "osi",
    "osa", "ose", "ità", "ivo", "ivi", "iva", "ive",
)
_IT_STEP2 = (
    "erebbero", "irebbero", "assero", "assimo", "eranno", "erebbe",
    "eremmo", "ereste", "eresti", "essero", "iranno", "irebbe",
    "iremmo", "ireste", "iresti", "iscano", "iscono", "issero",
    "arono", "avamo", "avano", "avate", "eremo", "erete", "erono",
    "evamo", "evano", "evate", "iremo", "irete", "irono", "ivamo",
    "ivano", "ivate", "ammo", "ando", "asse", "assi", "emmo", "enda",
    "ende", "endi", "endo", "erai", "erei", "Yamo", "iamo", "immo",
    "irai", "irei", "isca", "isce", "isci", "isco", "ano", "are",
    "ata", "ate", "ati", "ato", "ava", "avi", "avo", "erà", "ere",
    "erò", "ete", "eva", "evi", "evo", "irà", "ire", "irò", "ita",
    "ite", "iti", "ito", "iva", "ivi", "ivo", "ono", "uta", "ute",
    "uti", "uto", "ar", "ir",
)


def stem_it(word: str) -> str:
    """Italian Snowball (snowballstem.org/algorithms/italian/)."""
    w = word.lower()
    step1_hit = False
    for a, b in (("á", "à"), ("é", "è"), ("í", "ì"), ("ó", "ò"), ("ú", "ù")):
        w = w.replace(a, b)

    cs = list(w)
    for i in range(1, len(cs)):
        if cs[i - 1] == "q" and cs[i] == "u":
            cs[i] = "U"
    for i in range(1, len(cs) - 1):
        if cs[i - 1] in _IT_VOWELS and cs[i + 1] in _IT_VOWELS:
            if cs[i] == "u":
                cs[i] = "U"
            elif cs[i] == "i":
                cs[i] = "I"
    w = "".join(cs)

    reg1, reg2 = _std_regions(w, _IT_VOWELS)
    rvr = _std_rv(w, _IT_VOWELS)

    # step 0 — attached pronoun (after a gerund or infinitive in RV)
    for sfx in _IT_STEP0:
        if rvr.endswith(sfx):
            k = len(sfx)
            if rvr[-k - 4 : -k] in ("ando", "endo"):
                w, reg1, reg2, rvr = w[:-k], reg1[:-k], reg2[:-k], rvr[:-k]
            elif rvr[-k - 2 : -k] in ("ar", "er", "ir"):
                w = w[:-k] + "e"
                reg1 = reg1[:-k] + "e"
                reg2 = reg2[:-k] + "e"
                rvr = rvr[:-k] + "e"
            break

    # step 1 — standard suffixes
    for sfx in _IT_STEP1:
        if w.endswith(sfx):
            k = len(sfx)
            if sfx == "amente" and reg1.endswith(sfx):
                step1_hit = True
                w, reg2, rvr = w[:-6], reg2[:-6], rvr[:-6]
                if reg2.endswith("iv"):
                    w, reg2, rvr = w[:-2], reg2[:-2], rvr[:-2]
                    if reg2.endswith("at"):
                        w, rvr = w[:-2], rvr[:-2]
                elif reg2.endswith(("os", "ic")):
                    w, rvr = w[:-2], rvr[:-2]
                elif reg2.endswith("abil"):
                    w, rvr = w[:-4], rvr[:-4]
            elif sfx in ("amento", "amenti", "imento", "imenti") and rvr.endswith(
                sfx
            ):
                step1_hit = True
                w, rvr = w[:-6], rvr[:-6]
            elif reg2.endswith(sfx):
                step1_hit = True
                if sfx in ("azione", "azioni", "atore", "atori"):
                    w, reg2, rvr = w[:-k], reg2[:-k], rvr[:-k]
                    if reg2.endswith("ic"):
                        w, rvr = w[:-2], rvr[:-2]
                elif sfx in ("logia", "logie"):
                    # port quirk: rv is reassigned from WORD here, not
                    # truncated from rv (reference italian.py logia arm)
                    w = w[:-2]
                    rvr = w[:-2]
                elif sfx in ("uzione", "uzioni", "usione", "usioni"):
                    w, rvr = w[:-5], rvr[:-5]
                elif sfx in ("enza", "enze"):
                    w = w[:-2] + "te"
                    rvr = rvr[:-2] + "te"
                elif sfx == "ità":
                    w, reg2, rvr = w[:-3], reg2[:-3], rvr[:-3]
                    if reg2.endswith(("ic", "iv")):
                        w, rvr = w[:-2], rvr[:-2]
                    elif reg2.endswith("abil"):
                        w, rvr = w[:-4], rvr[:-4]
                elif sfx in ("ivo", "ivi", "iva", "ive"):
                    w, reg2, rvr = w[:-3], reg2[:-3], rvr[:-3]
                    if reg2.endswith("at"):
                        w, reg2, rvr = w[:-2], reg2[:-2], rvr[:-2]
                        if reg2.endswith("ic"):
                            w, rvr = w[:-2], rvr[:-2]
                else:
                    w, rvr = w[:-k], rvr[:-k]
            break

    # step 2 — verb suffixes
    if not step1_hit:
        for sfx in _IT_STEP2:
            if rvr.endswith(sfx):
                w, rvr = w[: -len(sfx)], rvr[: -len(sfx)]
                break

    # step 3a — final vowel (and a following i)
    if rvr.endswith(("a", "e", "i", "o", "à", "è", "ì", "ò")):
        w, rvr = w[:-1], rvr[:-1]
        if rvr.endswith("i"):
            w, rvr = w[:-1], rvr[:-1]

    # step 3b — ch/gh -> c/g
    if rvr.endswith(("ch", "gh")):
        w = w[:-1]

    return w.replace("I", "i").replace("U", "u")


# ------------------------------------------------------------- portuguese

_PT_VOWELS = "aeiouáéíóúâêô"
_PT_STEP1 = (
    "amentos", "imentos", "uciones", "amento", "imento", "adoras",
    "adores", "aço~es", "logías", "ências", "amente", "idades",
    "ismos", "istas", "adora", "aça~o", "antes", "ância", "logía",
    "ución", "ência", "mente", "idade", "ezas", "icos", "icas",
    "ismo", "ável", "ível", "ista", "osos", "osas", "ador", "ante",
    "ivas", "ivos", "iras", "eza", "ico", "ica", "oso", "osa", "iva",
    "ivo", "ira",
)
_PT_STEP2 = (
    "aríamos", "eríamos", "iríamos", "ássemos", "êssemos", "íssemos",
    "aríeis", "eríeis", "iríeis", "ásseis", "ésseis", "ísseis",
    "áramos", "éramos", "íramos", "ávamos", "aremos", "eremos",
    "iremos", "ariam", "eriam", "iriam", "assem", "essem", "issem",
    "ara~o", "era~o", "ira~o", "arias", "erias", "irias", "ardes",
    "erdes", "irdes", "asses", "esses", "isses", "astes", "estes",
    "istes", "áreis", "areis", "éreis", "ereis", "íreis", "ireis",
    "áveis", "íamos", "armos", "ermos", "irmos", "aria", "eria",
    "iria", "asse", "esse", "isse", "aste", "este", "iste", "arei",
    "erei", "irei", "aram", "eram", "iram", "avam", "arem", "erem",
    "irem", "ando", "endo", "indo", "adas", "idas", "arás", "aras",
    "erás", "eras", "irás", "avas", "ares", "eres", "ires", "íeis",
    "ados", "idos", "ámos", "amos", "emos", "imos", "iras", "ada",
    "ida", "ará", "ara", "erá", "era", "irá", "ava", "iam", "ado",
    "ido", "ias", "ais", "eis", "ira", "ia", "ei", "am", "em", "ar",
    "er", "ir", "as", "es", "is", "eu", "iu", "ou",
)
_PT_STEP4 = ("os", "a", "i", "o", "á", "í", "ó")


def stem_pt(word: str) -> str:
    """Portuguese Snowball (snowballstem.org/algorithms/portuguese/);
    nasal vowels are shuttled through the a~/o~ digraphs like the
    published algorithm does."""
    w = word.lower().replace("ã", "a~").replace("õ", "o~")
    step1_hit = False
    step2_hit = False

    reg1, reg2 = _std_regions(w, _PT_VOWELS)
    rvr = _std_rv(w, _PT_VOWELS)

    # step 1 — standard suffixes
    for sfx in _PT_STEP1:
        if w.endswith(sfx):
            k = len(sfx)
            if sfx == "amente" and reg1.endswith(sfx):
                step1_hit = True
                w, reg2, rvr = w[:-6], reg2[:-6], rvr[:-6]
                if reg2.endswith("iv"):
                    w, reg2, rvr = w[:-2], reg2[:-2], rvr[:-2]
                    if reg2.endswith("at"):
                        w, rvr = w[:-2], rvr[:-2]
                elif reg2.endswith(("os", "ic", "ad")):
                    w, rvr = w[:-2], rvr[:-2]
            elif (
                sfx in ("ira", "iras")
                and rvr.endswith(sfx)
                and w[-k - 1 : -k] == "e"
            ):
                step1_hit = True
                w = w[:-k] + "ir"
                rvr = rvr[:-k] + "ir"
            elif reg2.endswith(sfx):
                step1_hit = True
                if sfx in ("logía", "logías"):
                    w, rvr = w[:-2], rvr[:-2]
                elif sfx in ("ución", "uciones"):
                    w = w[:-k] + "u"
                    rvr = rvr[:-k] + "u"
                elif sfx in ("ência", "ências"):
                    w = w[:-k] + "ente"
                    rvr = rvr[:-k] + "ente"
                elif sfx == "mente":
                    w, reg2, rvr = w[:-5], reg2[:-5], rvr[:-5]
                    if reg2.endswith(("ante", "avel", "ível")):
                        w, rvr = w[:-4], rvr[:-4]
                elif sfx in ("idade", "idades"):
                    w, reg2, rvr = w[:-k], reg2[:-k], rvr[:-k]
                    if reg2.endswith(("ic", "iv")):
                        w, rvr = w[:-2], rvr[:-2]
                    elif reg2.endswith("abil"):
                        w, rvr = w[:-4], rvr[:-4]
                elif sfx in ("iva", "ivo", "ivas", "ivos"):
                    w, reg2, rvr = w[:-k], reg2[:-k], rvr[:-k]
                    if reg2.endswith("at"):
                        w, rvr = w[:-2], rvr[:-2]
                else:
                    w, rvr = w[:-k], rvr[:-k]
            break

    # step 2 — verb suffixes
    if not step1_hit:
        for sfx in _PT_STEP2:
            if rvr.endswith(sfx):
                step2_hit = True
                w, rvr = w[: -len(sfx)], rvr[: -len(sfx)]
                break

    # step 3 — i after c
    if (step1_hit or step2_hit) and rvr.endswith("i") and w[-2] == "c":
        w, rvr = w[:-1], rvr[:-1]

    # step 4 — residual suffix
    if not step1_hit and not step2_hit:
        for sfx in _PT_STEP4:
            if rvr.endswith(sfx):
                w, rvr = w[: -len(sfx)], rvr[: -len(sfx)]
                break

    # step 5 — final e, with gu/ci undouble
    if rvr.endswith(("e", "é", "ê")):
        w, rvr = w[:-1], rvr[:-1]
        if (w.endswith("gu") and rvr.endswith("u")) or (
            w.endswith("ci") and rvr.endswith("i")
        ):
            w = w[:-1]
    elif w.endswith("ç"):
        w = w[:-1] + "c"

    return w.replace("a~", "ã").replace("o~", "õ")


# ----------------------------------------------------- scandinavian family


def _r1_scand(w: str, vowels: str) -> str:
    """Scandinavian R1: standard R1 but the region before it must hold
    at least three letters."""
    for i in range(1, len(w)):
        if w[i] not in vowels and w[i - 1] in vowels:
            if i + 1 < 3:
                return w[3:]
            return w[i + 1 :]
    return ""


_DA_VOWELS = "aeiouyæåø"
_DA_S_ENDING = "abcdfghjklmnoprtvyzå"
_DA_STEP1 = (
    "erendes", "erende", "hedens", "ethed", "erede", "heden", "heder",
    "endes", "ernes", "erens", "erets", "ered", "ende", "erne", "eren",
    "erer", "heds", "enes", "eres", "eret", "hed", "ene", "ere", "ens",
    "ers", "ets", "en", "er", "es", "et", "e", "s",
)
_DA_STEP2 = ("gd", "dt", "gt", "kt")
_DA_STEP3 = ("elig", "løst", "lig", "els", "ig")
_DA_DOUBLES = frozenset("bcdfghjklmnpqrstvwxz")


def stem_da(word: str) -> str:
    """Danish Snowball (snowballstem.org/algorithms/danish/)."""
    w = word.lower()
    reg1 = _r1_scand(w, _DA_VOWELS)

    for sfx in _DA_STEP1:
        if reg1.endswith(sfx):
            if sfx == "s":
                if w[-2] in _DA_S_ENDING:
                    w, reg1 = w[:-1], reg1[:-1]
            else:
                k = len(sfx)
                w, reg1 = w[:-k], reg1[:-k]
            break

    for sfx in _DA_STEP2:
        if reg1.endswith(sfx):
            w, reg1 = w[:-1], reg1[:-1]
            break

    if reg1.endswith("igst"):
        w, reg1 = w[:-2], reg1[:-2]
    for sfx in _DA_STEP3:
        if reg1.endswith(sfx):
            if sfx == "løst":
                w, reg1 = w[:-1], reg1[:-1]
            else:
                k = len(sfx)
                w, reg1 = w[:-k], reg1[:-k]
                if reg1.endswith(_DA_STEP2):
                    w, reg1 = w[:-1], reg1[:-1]
            break

    # undouble a final double consonant (words longer than 3)
    if len(w) > 3 and w[-1] == w[-2] and w[-1] in _DA_DOUBLES:
        w = w[:-1]
    return w


_NO_VOWELS = "aeiouyæåø"
_NO_S_ENDING = "bcdfghjlmnoprtvyz"
_NO_STEP1 = (
    "hetenes", "hetene", "hetens", "heter", "heten", "endes", "ande",
    "ende", "edes", "enes", "erte", "ede", "ane", "ene", "ens", "ers",
    "ets", "het", "ast", "ert", "en", "ar", "er", "as", "es", "et",
    "a", "e", "s",
)
_NO_STEP2 = ("dt", "vt")
_NO_STEP3 = (
    "hetslov", "eleg", "elig", "elov", "slov", "leg", "eig", "lig",
    "els", "lov", "ig",
)


def stem_no(word: str) -> str:
    """Norwegian Snowball (snowballstem.org/algorithms/norwegian/)."""
    w = word.lower()
    reg1 = _r1_scand(w, _NO_VOWELS)

    for sfx in _NO_STEP1:
        if reg1.endswith(sfx):
            k = len(sfx)
            if sfx in ("erte", "ert"):
                w, reg1 = w[:-k] + "er", reg1[:-k] + "er"
            elif sfx == "s":
                if w[-2] in _NO_S_ENDING or (
                    w[-2] == "k" and w[-3] not in _NO_VOWELS
                ):
                    w, reg1 = w[:-1], reg1[:-1]
            else:
                w, reg1 = w[:-k], reg1[:-k]
            break

    for sfx in _NO_STEP2:
        if reg1.endswith(sfx):
            w, reg1 = w[:-1], reg1[:-1]
            break

    for sfx in _NO_STEP3:
        if reg1.endswith(sfx):
            w = w[: -len(sfx)]
            break
    return w


_SV_VOWELS = "aeiouyäåö"
_SV_S_ENDING = "bcdfghjklmnoprtvy"
_SV_STEP1 = (
    "heterna", "hetens", "heter", "heten", "anden", "arnas", "ernas",
    "ornas", "andes", "andet", "arens", "arna", "erna", "orna", "ande",
    "arne", "aste", "aren", "ades", "erns", "ade", "are", "ern", "ens",
    "het", "ast", "ad", "en", "ar", "er", "or", "as", "es", "at",
    "a", "e", "s",
)
_SV_STEP2 = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")
_SV_STEP3 = ("fullt", "löst", "els", "lig", "ig")


def stem_sv(word: str) -> str:
    """Swedish Snowball (snowballstem.org/algorithms/swedish/)."""
    w = word.lower()
    reg1 = _r1_scand(w, _SV_VOWELS)

    for sfx in _SV_STEP1:
        if reg1.endswith(sfx):
            if sfx == "s":
                if w[-2] in _SV_S_ENDING:
                    w, reg1 = w[:-1], reg1[:-1]
            else:
                k = len(sfx)
                w, reg1 = w[:-k], reg1[:-k]
            break

    for sfx in _SV_STEP2:
        if reg1.endswith(sfx):
            w, reg1 = w[:-1], reg1[:-1]
            break

    for sfx in _SV_STEP3:
        if reg1.endswith(sfx):
            if sfx in ("els", "lig", "ig"):
                w = w[: -len(sfx)]
            else:  # fullt, löst
                w = w[:-1]
            break
    return w


# ----------------------------------------------------------------- dutch

_NL_VOWELS = "aeiouyè"
_NL_STEP1 = ("heden", "ene", "en", "se", "s")
_NL_STEP3B = ("baar", "lijk", "bar", "end", "ing", "ig")
_NL_KDT = ("kk", "dd", "tt")


def stem_nl(word: str) -> str:
    """Dutch Snowball (snowballstem.org/algorithms/dutch/)."""
    w = word.lower()
    step2_hit = False
    for a, b in (
        ("ä", "a"), ("á", "a"), ("ë", "e"), ("é", "e"), ("í", "i"),
        ("ï", "i"), ("ö", "o"), ("ó", "o"), ("ü", "u"), ("ú", "u"),
    ):
        w = w.replace(a, b)

    # initial y, y after a vowel, and i between vowels act as consonants
    if w.startswith("y"):
        w = "Y" + w[1:]
    for i in range(1, len(w)):
        if w[i - 1] in _NL_VOWELS and w[i] == "y":
            w = w[:i] + "Y" + w[i + 1 :]
    for i in range(1, len(w) - 1):
        if w[i - 1] in _NL_VOWELS and w[i] == "i" and w[i + 1] in _NL_VOWELS:
            w = w[:i] + "I" + w[i + 1 :]

    reg1, reg2 = _std_regions(w, _NL_VOWELS)
    # 3-letter floor on the region before R1 (same as German)
    for i in range(1, len(w)):
        if w[i] not in _NL_VOWELS and w[i - 1] in _NL_VOWELS:
            if i + 1 < 3:
                reg1 = w[3:]
            break

    def undouble():
        nonlocal w, reg1, reg2
        if w.endswith(_NL_KDT):
            w, reg1, reg2 = w[:-1], reg1[:-1], reg2[:-1]

    # step 1
    for sfx in _NL_STEP1:
        if reg1.endswith(sfx):
            k = len(sfx)
            if sfx == "heden":
                w, reg1 = w[:-5] + "heid", reg1[:-5] + "heid"
                if reg2.endswith("heden"):
                    reg2 = reg2[:-5] + "heid"
            elif (
                sfx in ("ene", "en")
                and not w.endswith("heden")
                and w[-k - 1] not in _NL_VOWELS
                and w[-k - 3 : -k] != "gem"
            ):
                w, reg1, reg2 = w[:-k], reg1[:-k], reg2[:-k]
                undouble()
            elif (
                sfx in ("se", "s")
                and w[-k - 1] not in _NL_VOWELS
                and w[-k - 1] != "j"
            ):
                w, reg1, reg2 = w[:-k], reg1[:-k], reg2[:-k]
            break

    # step 2
    if reg1.endswith("e") and w[-2] not in _NL_VOWELS:
        step2_hit = True
        w, reg1, reg2 = w[:-1], reg1[:-1], reg2[:-1]
        undouble()

    # step 3a
    if reg2.endswith("heid") and w[-5] != "c":
        w, reg1, reg2 = w[:-4], reg1[:-4], reg2[:-4]
        if reg1.endswith("en") and w[-3] not in _NL_VOWELS and w[-5:-2] != "gem":
            w, reg1, reg2 = w[:-2], reg1[:-2], reg2[:-2]
            undouble()

    # step 3b — derivational
    for sfx in _NL_STEP3B:
        if reg2.endswith(sfx):
            if sfx in ("end", "ing"):
                w, reg2 = w[:-3], reg2[:-3]
                if reg2.endswith("ig") and w[-3] != "e":
                    w = w[:-2]
                elif w.endswith(_NL_KDT):
                    w = w[:-1]
            elif sfx == "ig":
                if w[-3] != "e":
                    w = w[:-2]
            elif sfx == "lijk":
                w, reg1 = w[:-4], reg1[:-4]
                if reg1.endswith("e") and w[-2] not in _NL_VOWELS:
                    w = w[:-1]
                    if w.endswith(_NL_KDT):
                        w = w[:-1]
            elif sfx == "baar":
                w = w[:-4]
            elif sfx == "bar":
                if step2_hit:
                    w = w[:-3]
            break

    # step 4 — undouble vowel (CVVC with equal vowels -> CVC)
    if (
        len(w) >= 4
        and w[-1] not in _NL_VOWELS
        and w[-1] != "I"
        and w[-3:-1] in ("aa", "ee", "oo", "uu")
        and w[-4] not in _NL_VOWELS
    ):
        w = w[:-3] + w[-3] + w[-1]

    return w.replace("I", "i").replace("Y", "y")


# -------------------------------------------------------------- hungarian

_HU_VOWELS = "aeiouöüáéíóõúû"
_HU_DIGRAPHS = ("cs", "dz", "dzs", "gy", "ly", "ny", "ty", "zs")
_HU_DOUBLES = (
    "bb", "cc", "ccs", "dd", "ff", "gg", "ggy", "jj", "kk", "ll",
    "lly", "mm", "nn", "nny", "pp", "rr", "ss", "ssz", "tt", "tty",
    "vv", "zz", "zzs",
)
_HU_STEP2 = (
    "képpen", "onként", "enként", "anként", "képp", "ként", "ban",
    "ben", "nak", "nek", "val", "vel", "tól", "tõl", "ról", "rõl",
    "ból", "bõl", "hoz", "hez", "höz", "nál", "nél", "ért", "kor",
    "ba", "be", "ra", "re", "ig", "at", "et", "ot", "öt", "ul", "ül",
    "vá", "vé", "en", "on", "an", "ön", "n", "t",
)
_HU_STEP3 = ("ánként", "án", "én")
_HU_STEP4 = ("astul", "estül", "ástul", "éstül", "stul", "stül")
_HU_STEP6 = (
    "oké", "öké", "aké", "eké", "áké", "áéi", "éké", "ééi", "ké",
    "éi", "éé", "é",
)
_HU_STEP7 = (
    "ájuk", "éjük", "ünk", "unk", "juk", "jük", "ánk", "énk", "nk",
    "uk", "ük", "em", "om", "am", "od", "ed", "ad", "öd", "ja", "je",
    "ám", "ád", "ém", "éd", "m", "d", "a", "e", "o", "á", "é",
)
_HU_STEP8 = (
    "jaitok", "jeitek", "jaink", "jeink", "aitok", "eitek", "áitok",
    "éitek", "jaim", "jeim", "jaid", "jeid", "eink", "aink", "itek",
    "jeik", "jaik", "áink", "éink", "aim", "eim", "aid", "eid",
    "jai", "jei", "ink", "aik", "eik", "áim", "áid", "áik", "éim",
    "éid", "éik", "im", "id", "ai", "ei", "ik", "ái", "éi", "i",
)
_HU_STEP9 = ("ák", "ék", "ök", "ok", "ek", "ak", "k")


def _hu_r1(w: str) -> str:
    """Hungarian R1.  port quirk: for vowel-initial words the digraph
    scan locates the digraph's LAST letter with index() over the WHOLE
    word — i.e. the first occurrence of that single character anywhere,
    not the digraph's own position."""
    if not w:
        return ""
    if w[0] in _HU_VOWELS:
        for dg in _HU_DIGRAPHS:
            if dg in w[1:]:
                return w[w.index(dg[-1]) + 1 :]
        for i in range(1, len(w)):
            if w[i] not in _HU_VOWELS:
                return w[i + 1 :]
        return ""
    for i in range(1, len(w)):
        if w[i] in _HU_VOWELS:
            return w[i + 1 :]
    return ""


def stem_hu(word: str) -> str:  # noqa: C901
    """Hungarian Snowball (snowballstem.org/algorithms/hungarian/)."""
    w = word.lower()
    reg1 = _hu_r1(w)

    # step 1 — instrumental case: undouble before the al/el ending.
    # port quirk: the replacement is always w[:-4] + w[-3] regardless of
    # digraph length, and the first double-consonant in TABLE order wins
    if reg1.endswith(("al", "el")):
        for dc in _HU_DOUBLES:
            if w[-2 - len(dc) : -2] == dc:
                w = w[:-4] + w[-3]
                if reg1[-2 - len(dc) : -2] == dc:
                    reg1 = reg1[:-4] + reg1[-3]
                break

    # step 2 — frequent cases (+ final á/é normalization)
    for sfx in _HU_STEP2:
        if w.endswith(sfx):
            if reg1.endswith(sfx):
                k = len(sfx)
                w, reg1 = w[:-k], reg1[:-k]
                if reg1.endswith("á"):
                    w, reg1 = w[:-1] + "a", reg1[:-1] + "a"
                elif reg1.endswith("é"):
                    w, reg1 = w[:-1] + "e", reg1[:-1] + "e"
            break

    # step 3 — special cases
    for sfx in _HU_STEP3:
        if reg1.endswith(sfx):
            if sfx == "én":
                w, reg1 = w[:-2] + "e", reg1[:-2] + "e"
            else:
                k = len(sfx)
                w, reg1 = w[:-k] + "a", reg1[:-k] + "a"
            break

    # step 4 — other cases
    for sfx in _HU_STEP4:
        if reg1.endswith(sfx):
            if sfx == "ástul":
                w, reg1 = w[:-5] + "a", reg1[:-5] + "a"
            elif sfx == "éstül":
                w, reg1 = w[:-5] + "e", reg1[:-5] + "e"
            else:
                k = len(sfx)
                w, reg1 = w[:-k], reg1[:-k]
            break

    # step 5 — factive case: undouble before a final á/é
    if reg1.endswith(("á", "é")):
        for dc in _HU_DOUBLES:
            if w[-1 - len(dc) : -1] == dc:
                w = w[:-3] + w[-2]
                if reg1[-1 - len(dc) : -1] == dc:
                    reg1 = reg1[:-3] + reg1[-2]
                break

    # step 6 — owned
    for sfx in _HU_STEP6:
        if reg1.endswith(sfx):
            k = len(sfx)
            if sfx in ("áké", "áéi"):
                w, reg1 = w[:-3] + "a", reg1[:-3] + "a"
            elif sfx in ("éké", "ééi", "éé"):
                w, reg1 = w[:-k] + "e", reg1[:-k] + "e"
            else:
                w, reg1 = w[:-k], reg1[:-k]
            break

    # step 7 — singular owner
    for sfx in _HU_STEP7:
        if w.endswith(sfx):
            if reg1.endswith(sfx):
                k = len(sfx)
                if sfx in ("ánk", "ájuk", "ám", "ád", "á"):
                    w, reg1 = w[:-k] + "a", reg1[:-k] + "a"
                elif sfx in ("énk", "éjük", "ém", "éd", "é"):
                    w, reg1 = w[:-k] + "e", reg1[:-k] + "e"
                else:
                    w, reg1 = w[:-k], reg1[:-k]
            break

    # step 8 — plural owner
    for sfx in _HU_STEP8:
        if w.endswith(sfx):
            if reg1.endswith(sfx):
                k = len(sfx)
                if sfx in ("áim", "áid", "ái", "áink", "áitok", "áik"):
                    w, reg1 = w[:-k] + "a", reg1[:-k] + "a"
                elif sfx in ("éim", "éid", "éi", "éink", "éitek", "éik"):
                    w, reg1 = w[:-k] + "e", reg1[:-k] + "e"
                else:
                    w, reg1 = w[:-k], reg1[:-k]
            break

    # step 9 — plural
    for sfx in _HU_STEP9:
        if w.endswith(sfx):
            if reg1.endswith(sfx):
                if sfx == "ák":
                    w = w[:-2] + "a"
                elif sfx == "ék":
                    w = w[:-2] + "e"
                else:
                    w = w[: -len(sfx)]
            break

    return w


# -------------------------------------------------------------- romanian

_RO_VOWELS = "aeiouăâî"

_RO_ST1_ABIL = ("abilitate", "abilitati", "abilităi", "abilităţi")
_RO_ST1_IV = ("ivitate", "ivitati", "ivităi", "ivităţi")
_RO_ST1_IC = (
    "icitate", "icitati", "icităi", "icităţi", "icator", "icatori",
    "iciv", "iciva", "icive", "icivi", "icivă", "ical", "icala",
    "icale", "icali", "icală",
)
_RO_ST1_AT = (
    "ativ", "ativa", "ative", "ativi", "ativă", "aţiune", "atoare",
    "ator", "atori", "ătoare", "ător", "ători",
)
_RO_ST1_IT = (
    "itiv", "itiva", "itive", "itivi", "itivă", "iţiune", "itoare",
    "itor", "itori",
)
_RO_ST3_G1 = (
    "seserăţi", "seserăm", "serăţi", "seseşi", "seseră", "serăm",
    "sesem", "seşi", "seră", "sese", "aţi", "eţi", "iţi", "âţi",
    "sei", "ăm", "em", "im", "âm", "se",
)


def stem_ro(word: str) -> str:  # noqa: C901
    """Romanian Snowball (snowballstem.org/algorithms/romanian/).

    port quirks replicated: the region gates are substring CONTAINMENT
    against the ORIGINAL (never truncated) R1/R2; step 1 loops until no
    replacement and RESETS its success flag when a word-suffix match
    falls outside R1; step 3's consonant guard locates the suffix with
    index() (FIRST occurrence) and tests against a vowel set missing
    'u'."""
    from whoosh_novo_spark.functions._ro_data import (
        STEP0_SUFFIXES,
        STEP1_SUFFIXES,
        STEP2_SUFFIXES,
        STEP3_SUFFIXES,
    )

    w = word.lower()
    step1_hit = False
    step2_hit = False

    cs = list(w)
    for i in range(1, len(cs) - 1):
        if cs[i - 1] in _RO_VOWELS and cs[i + 1] in _RO_VOWELS:
            if cs[i] == "u":
                cs[i] = "U"
            elif cs[i] == "i":
                cs[i] = "I"
    w = "".join(cs)

    reg1, reg2 = _std_regions(w, _RO_VOWELS)
    rvr = _std_rv(w, _RO_VOWELS)

    # step 0 — plurals and simplifications
    for sfx in STEP0_SUFFIXES:
        if w.endswith(sfx):
            k = len(sfx)
            if sfx in reg1:
                if sfx in ("ul", "ului"):
                    w = w[:-k]
                    rvr = rvr[:-k] if sfx in rvr else ""
                elif sfx in ("aua", "atei") or (
                    sfx == "ile" and w[-5:-3] != "ab"
                ):
                    w = w[:-2]
                elif sfx in ("ea", "ele", "elor"):
                    w = w[:-k] + "e"
                    rvr = rvr[:-k] + "e" if sfx in rvr else ""
                elif sfx in ("ii", "iua", "iei", "iile", "iilor", "ilor"):
                    w = w[:-k] + "i"
                    rvr = rvr[:-k] + "i" if sfx in rvr else ""
                elif sfx in ("aţie", "aţia"):
                    w = w[:-1]
            break

    # step 1 — combining suffixes, repeated until stable
    while True:
        changed = False
        for sfx in STEP1_SUFFIXES:
            if w.endswith(sfx):
                if sfx in reg1:
                    step1_hit = True
                    changed = True
                    k = len(sfx)
                    if sfx in _RO_ST1_ABIL:
                        w = w[:-k] + "abil"
                    elif sfx == "ibilitate":
                        w = w[:-5]
                    elif sfx in _RO_ST1_IV:
                        w = w[:-k] + "iv"
                    elif sfx in _RO_ST1_IC:
                        w = w[:-k] + "ic"
                    elif sfx in _RO_ST1_AT:
                        w = w[:-k] + "at"
                        if sfx in reg2:
                            reg2 = reg2[:-k] + "at"
                    elif sfx in _RO_ST1_IT:
                        w = w[:-k] + "it"
                        if sfx in reg2:
                            reg2 = reg2[:-k] + "it"
                else:
                    # port quirk: an out-of-region match RESETS the flag
                    step1_hit = False
                break
        if not changed:
            break

    # step 2 — standard suffixes
    for sfx in STEP2_SUFFIXES:
        if w.endswith(sfx):
            if sfx in reg2:
                step2_hit = True
                if sfx in ("iune", "iuni"):
                    if w[-5] == "ţ":
                        w = w[:-5] + "t"
                elif sfx in (
                    "ism", "isme", "ist", "ista", "iste", "isti", "istă",
                    "işti",
                ):
                    w = w[: -len(sfx)] + "ist"
                else:
                    w = w[: -len(sfx)]
            break

    # step 3 — verb suffixes
    if not step1_hit and not step2_hit:
        for sfx in STEP3_SUFFIXES:
            if w.endswith(sfx):
                if sfx in rvr:
                    k = len(sfx)
                    if sfx in _RO_ST3_G1:
                        w, rvr = w[:-k], rvr[:-k]
                    else:
                        if (
                            not rvr.startswith(sfx)
                            and rvr[rvr.index(sfx) - 1] not in "aeioăâ"
                            and rvr[rvr.index(sfx) - 1] != "î"
                        ):
                            w = w[:-k]
                    break

    # step 4 — final vowel
    for sfx in ("ie", "a", "e", "i", "ă"):
        if w.endswith(sfx):
            if sfx in rvr:
                w = w[: -len(sfx)]
            break

    return w.replace("I", "i").replace("U", "u")


# --------------------------------------------------------------- finnish

_FI_VOWELS = "aeiouyäö"
_FI_RESTRICTED = "aeiouäö"
_FI_LONG = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")
_FI_CONS = "bcdfghjklmnpqrstvwxz"
_FI_DOUBLES = frozenset(
    c + c for c in "bcdfghjklmnpqrstvwxz"
)
_FI_STEP1 = (
    "kaan", "kään", "sti", "kin", "han", "hän", "ko", "kö", "pa", "pä",
)
_FI_STEP2 = ("nsa", "nsä", "mme", "nne", "si", "ni", "an", "än", "en")
_FI_STEP3 = (
    "siin", "tten", "seen", "han", "hen", "hin", "hon", "hän", "hön",
    "den", "tta", "ttä", "ssa", "ssä", "sta", "stä", "lla", "llä",
    "lta", "ltä", "lle", "ksi", "ine", "ta", "tä", "na", "nä",
    "a", "ä", "n",
)
_FI_STEP4 = (
    "impi", "impa", "impä", "immi", "imma", "immä", "mpi", "mpa",
    "mpä", "mmi", "mma", "mmä", "eja", "ejä",
)
_FI_H_VOWEL = {"han": "a", "hen": "e", "hin": "i", "hon": "o",
               "hän": "ä", "hön": "ö"}


def stem_fi(word: str) -> str:  # noqa: C901
    """Finnish Snowball (snowballstem.org/algorithms/finnish/)."""
    w = word.lower()
    step3_hit = False
    reg1, reg2 = _std_regions(w, _FI_VOWELS)

    # step 1 — particles
    for sfx in _FI_STEP1:
        if reg1.endswith(sfx):
            if sfx == "sti":
                # port quirk: containment test against R2, not endswith
                if sfx in reg2:
                    w, reg1, reg2 = w[:-3], reg1[:-3], reg2[:-3]
            else:
                k = len(sfx)
                if w[-k - 1] in "ntaeiouyäö":
                    w, reg1, reg2 = w[:-k], reg1[:-k], reg2[:-k]
            break

    # step 2 — possessives
    for sfx in _FI_STEP2:
        if reg1.endswith(sfx):
            if sfx == "si":
                if w[-3] != "k":
                    w, reg1, reg2 = w[:-2], reg1[:-2], reg2[:-2]
            elif sfx == "ni":
                w, reg1, reg2 = w[:-2], reg1[:-2], reg2[:-2]
                if w.endswith("kse"):
                    w = w[:-3] + "ksi"
                if reg1.endswith("kse"):
                    reg1 = reg1[:-3] + "ksi"
                if reg2.endswith("kse"):
                    reg2 = reg2[:-3] + "ksi"
            elif sfx == "an":
                if w[-4:-2] in ("ta", "na") or w[-5:-2] in (
                    "ssa", "sta", "lla", "lta",
                ):
                    w, reg1, reg2 = w[:-2], reg1[:-2], reg2[:-2]
            elif sfx == "än":
                if w[-4:-2] in ("tä", "nä") or w[-5:-2] in (
                    "ssä", "stä", "llä", "ltä",
                ):
                    w, reg1, reg2 = w[:-2], reg1[:-2], reg2[:-2]
            elif sfx == "en":
                if w[-5:-2] in ("lle", "ine"):
                    w, reg1, reg2 = w[:-2], reg1[:-2], reg2[:-2]
            else:  # nsa/nsä/mme/nne
                w, reg1, reg2 = w[:-3], reg1[:-3], reg2[:-3]
            break

    # step 3 — cases.  Gate failures on siin/den/tten/seen CONTINUE the
    # scan (port behavior); other gate failures stop it.
    for sfx in _FI_STEP3:
        if reg1.endswith(sfx):
            if sfx in _FI_H_VOWEL:
                if w[-4] == _FI_H_VOWEL[sfx]:
                    w, reg1, reg2 = w[:-3], reg1[:-3], reg2[:-3]
                    step3_hit = True
            elif sfx in ("siin", "den", "tten"):
                k = len(sfx)
                if w[-k - 1] == "i" and w[-k - 2] in _FI_RESTRICTED:
                    w, reg1, reg2 = w[:-k], reg1[:-k], reg2[:-k]
                    step3_hit = True
                else:
                    continue
            elif sfx == "seen":
                if w[-6:-4] in _FI_LONG:
                    w, reg1, reg2 = w[:-4], reg1[:-4], reg2[:-4]
                    step3_hit = True
                else:
                    continue
            elif sfx in ("a", "ä"):
                if w[-2] in _FI_VOWELS and w[-3] in _FI_CONS:
                    w, reg1, reg2 = w[:-1], reg1[:-1], reg2[:-1]
                    step3_hit = True
            elif sfx in ("tta", "ttä"):
                if w[-4] == "e":
                    w, reg1, reg2 = w[:-3], reg1[:-3], reg2[:-3]
                    step3_hit = True
            elif sfx == "n":
                w, reg1, reg2 = w[:-1], reg1[:-1], reg2[:-1]
                step3_hit = True
                if w[-2:] == "ie" or w[-2:] in _FI_LONG:
                    w, reg1, reg2 = w[:-1], reg1[:-1], reg2[:-1]
            else:
                k = len(sfx)
                w, reg1, reg2 = w[:-k], reg1[:-k], reg2[:-k]
                step3_hit = True
            break

    # step 4 — other endings (comparatives), in R2
    for sfx in _FI_STEP4:
        if reg2.endswith(sfx):
            if sfx in ("mpi", "mpa", "mpä", "mmi", "mma", "mmä"):
                if w[-5:-3] != "po":
                    w, reg1, reg2 = w[:-3], reg1[:-3], reg2[:-3]
            else:
                k = len(sfx)
                w, reg1, reg2 = w[:-k], reg1[:-k], reg2[:-k]
            break

    # step 5 — plurals
    if step3_hit and len(reg1) >= 1 and reg1[-1] in "ij":
        w, reg1 = w[:-1], reg1[:-1]
    elif (
        not step3_hit
        and len(reg1) >= 2
        and reg1[-1] == "t"
        and reg1[-2] in _FI_VOWELS
    ):
        w, reg1, reg2 = w[:-1], reg1[:-1], reg2[:-1]
        if reg2.endswith("imma"):
            w, reg1 = w[:-4], reg1[:-4]
        elif reg2.endswith("mma") and reg2[-5:-3] != "po":
            w, reg1 = w[:-3], reg1[:-3]

    # step 6 — tidying
    if reg1[-2:] in _FI_LONG:
        w, reg1 = w[:-1], reg1[:-1]
    if len(reg1) >= 2 and reg1[-2] in _FI_CONS and reg1[-1] in "aäei":
        w, reg1 = w[:-1], reg1[:-1]
    if reg1.endswith(("oj", "uj")):
        w, reg1 = w[:-1], reg1[:-1]
    if reg1.endswith("jo"):
        w, reg1 = w[:-1], reg1[:-1]

    # undouble the final double consonant (possibly followed by vowels)
    for i in range(1, len(w)):
        if w[-i] in _FI_VOWELS:
            continue
        if i == 1:
            if w[-i - 1 :] in _FI_DOUBLES:
                w = w[:-1]
        else:
            if w[-i - 1 : -i + 1] in _FI_DOUBLES:
                w = w[:-i] + w[-i + 1 :]
        break

    return w


# --------------------------------------------------------------- russian

_RU_VOWELS = ("A", "U", "E", "a", "e", "i", "o", "u", "y")
# gerund/adjectival/verb suffixes whose removal is gated on a preceding
# a / i^a (the algorithm's "group 1" endings)
_RU_GERUND_G1 = ("v", "vshi", "vshis'")
_RU_VERB_G1 = (
    "la", "na", "ete", "i`te", "li", "i`", "l", "em", "n", "lo", "no",
    "et", "i^ut", "ny", "t'", "esh'", "nno",
)


def _ru_regions(w: str) -> tuple[str, str]:
    """(RV, R2) with the i^a/i^u/e` digraphs temporarily collapsed so
    they count as single vowels (the port's A/U/E substitution)."""
    t = w.replace("i^a", "A").replace("i^u", "U").replace("e`", "E")
    reg1 = ""
    for i in range(1, len(t)):
        if t[i] not in _RU_VOWELS and t[i - 1] in _RU_VOWELS:
            reg1 = t[i + 1 :]
            break
    reg2 = ""
    for i in range(1, len(reg1)):
        if reg1[i] not in _RU_VOWELS and reg1[i - 1] in _RU_VOWELS:
            reg2 = reg1[i + 1 :]
            break
    rvr = ""
    for i in range(len(t)):
        if t[i] in _RU_VOWELS:
            rvr = t[i + 1 :]
            break
    expand = lambda s: (
        s.replace("A", "i^a").replace("U", "i^u").replace("E", "e`")
    )
    return expand(rvr), expand(reg2)


def _ru_adjectival_g1() -> frozenset:
    """Adjectival suffixes in the a/i^a-gated group (the algorithm's
    group-1 participle endings — pinned data in _ru_data)."""
    from whoosh_novo_spark.functions._ru_data import ADJECTIVAL_G1_SUFFIXES

    return frozenset(ADJECTIVAL_G1_SUFFIXES)


_RU_ADJ_G1 = None


def stem_ru(word: str) -> str:
    """Russian Snowball (snowballstem.org/algorithms/russian/).  The
    oracle port stems over a Roman transliteration (i^a/i^u digraphs)
    and converts back; pure-ASCII input is stemmed as-is."""
    global _RU_ADJ_G1
    from whoosh_novo_spark.functions._ru_data import (
        DERIVATIONAL_SUFFIXES,
        NOUN_SUFFIXES,
        PERFECTIVE_GERUND_SUFFIXES,
        REFLEXIVE_SUFFIXES,
        SUPERLATIVE_SUFFIXES,
        VERB_SUFFIXES,
    )

    if _RU_ADJ_G1 is None:
        _RU_ADJ_G1 = _ru_adjectival_g1()

    cyrillic = any(ord(c) > 255 for c in word)
    w = word
    if cyrillic:
        from whoosh_novo_spark.functions._ru_data import CYR2ROM_ORDERED

        for a, b in CYR2ROM_ORDERED:
            w = w.replace(a, b)

    rvr, reg2 = _ru_regions(w)

    def gated(sfx: str) -> bool:
        k = len(sfx)
        return rvr[-k - 3 : -k] == "i^a" or rvr[-k - 1 : -k] == "a"

    step1_hit = False
    for sfx in PERFECTIVE_GERUND_SUFFIXES:
        if rvr.endswith(sfx):
            if sfx in _RU_GERUND_G1:
                if gated(sfx):
                    k = len(sfx)
                    w, reg2, rvr = w[:-k], reg2[:-k], rvr[:-k]
                    step1_hit = True
                    break
            else:
                k = len(sfx)
                w, reg2, rvr = w[:-k], reg2[:-k], rvr[:-k]
                step1_hit = True
                break

    if not step1_hit:
        for sfx in REFLEXIVE_SUFFIXES:
            if rvr.endswith(sfx):
                k = len(sfx)
                w, reg2, rvr = w[:-k], reg2[:-k], rvr[:-k]
                break

        adjectival_hit = False
        from whoosh_novo_spark.functions._ru_data import ADJECTIVAL_SUFFIXES

        for sfx in ADJECTIVAL_SUFFIXES:
            if rvr.endswith(sfx):
                if sfx in _RU_ADJ_G1:
                    if gated(sfx):
                        k = len(sfx)
                        w, reg2, rvr = w[:-k], reg2[:-k], rvr[:-k]
                        adjectival_hit = True
                        break
                else:
                    k = len(sfx)
                    w, reg2, rvr = w[:-k], reg2[:-k], rvr[:-k]
                    adjectival_hit = True
                    break

        verb_hit = False
        if not adjectival_hit:
            for sfx in VERB_SUFFIXES:
                if rvr.endswith(sfx):
                    if sfx in _RU_VERB_G1:
                        if gated(sfx):
                            k = len(sfx)
                            w, reg2, rvr = w[:-k], reg2[:-k], rvr[:-k]
                            verb_hit = True
                            break
                    else:
                        k = len(sfx)
                        w, reg2, rvr = w[:-k], reg2[:-k], rvr[:-k]
                        verb_hit = True
                        break

        if not adjectival_hit and not verb_hit:
            for sfx in NOUN_SUFFIXES:
                if rvr.endswith(sfx):
                    k = len(sfx)
                    w, reg2, rvr = w[:-k], reg2[:-k], rvr[:-k]
                    break

    # step 2 — final i
    if rvr.endswith("i"):
        w, reg2 = w[:-1], reg2[:-1]

    # step 3 — derivational (in R2)
    for sfx in DERIVATIONAL_SUFFIXES:
        if reg2.endswith(sfx):
            w = w[: -len(sfx)]
            break

    # step 4 — undouble nn / superlative / soft sign
    undoubled = False
    if w.endswith("nn"):
        w = w[:-1]
        undoubled = True
    superlative_hit = False
    if not undoubled:
        for sfx in SUPERLATIVE_SUFFIXES:
            if w.endswith(sfx):
                w = w[: -len(sfx)]
                superlative_hit = True
                break
        if w.endswith("nn"):
            w = w[:-1]
    if not undoubled and not superlative_hit and w.endswith("'"):
        w = w[:-1]

    if cyrillic:
        w = _ru_roman_to_cyrillic(w)
    return w


def _ru_roman_to_cyrillic(w: str) -> str:
    from whoosh_novo_spark.functions._ru_data import ROM2CYR_ORDERED

    for a, b in ROM2CYR_ORDERED:
        w = w.replace(a, b)
    return w


# --------------------------------------------------------------- registry

def _stem_ar(word: str) -> str:
    from whoosh_novo_spark.functions.isri import stem as isri_stem

    return isri_stem(word)


# language -> stemmer registry (snowball family + the ISRI Arabic
# stemmer, mirroring the reference's stemmer_for_language dispatch)
SNOWBALL_STEMMERS = {
    "ar": _stem_ar,
    "en": stem_en,
    "de": stem_de,
    "fr": stem_fr,
    "es": stem_es,
    "da": stem_da,
    "no": stem_no,
    "sv": stem_sv,
    "nl": stem_nl,
    "it": stem_it,
    "pt": stem_pt,
    "ru": stem_ru,
    "fi": stem_fi,
    "ro": stem_ro,
    "hu": stem_hu,
}

LANG_ALIASES = {
    "eng": "en", "english": "en",
    "deu": "de", "german": "de", "deutsch": "de",
    "fra": "fr", "french": "fr", "français": "fr",
    "spa": "es", "spanish": "es", "español": "es",
    "dan": "da", "danish": "da", "dansk": "da",
    "nor": "no", "norwegian": "no", "norsk": "no",
    "swe": "sv", "swedish": "sv", "svenska": "sv",
    "nld": "nl", "dutch": "nl", "nederlands": "nl",
    "ita": "it", "italian": "it", "italiano": "it",
    "por": "pt", "portuguese": "pt", "português": "pt",
    "rus": "ru", "russian": "ru", "русский язык": "ru",
    "fin": "fi", "finnish": "fi", "suomi": "fi",
    "ron": "ro", "romanian": "ro",
    "hun": "hu", "hungarian": "hu", "magyar": "hu",
    "tur": "tr", "turkish": "tr", "türkçe": "tr",
    "ara": "ar", "arabic": "ar", "العربية": "ar",
}


def two_letter_code(lang: str) -> str:
    return LANG_ALIASES.get(lang, lang)


def stemmer_for_language(lang: str):
    """Stemming callable for a language code/alias, or None when the
    language has no stemmer (the reference raises NoStemmer and the
    LanguageAnalyzer chain simply omits the stem filter)."""
    return SNOWBALL_STEMMERS.get(two_letter_code(lang))


def stem_array_lang(terms: np.ndarray, lang: str) -> np.ndarray:
    """Vectorized stemming: stem each UNIQUE token once, scatter back
    (the batch-level equivalent of the reference StemFilter's LRU
    cache)."""
    fn = stemmer_for_language(lang)
    if fn is None or len(terms) == 0:
        return terms
    uniq, inv = np.unique(terms, return_inverse=True)
    stemmed = np.array([fn(u) for u in uniq], dtype=object)
    return stemmed[inv]
