"""Morphological variations of an English word (Variations query support).

Reference: ``whoosh.query.terms.Variations`` (terms.py:522-570) expands a
word via ``whoosh.lang.morph_en.variations`` (a ~1.1k-line rule/table port
of the Sun "morph" algorithm) and searches the variants that exist in the
lexicon.  This module is a FROM-SCRATCH lightweight English inflector —
standard suffix rules (plural s/es/ies, past -ed, progressive -ing,
comparative -er/-est, adverbial -ly, agent -er) with consonant doubling
and silent-e handling — NOT a port of morph_en's tables.  Since the
expansion is intersected with the index lexicon before searching,
over-generation is harmless and under-generation only narrows recall; the
``Variations`` AST node also accepts an explicit variant set for callers
who need a specific morphology (e.g. a lemmatizer).
"""

from __future__ import annotations

_VOWELS = set("aeiou")


def _strip_suffixes(word: str) -> set[str]:
    """Candidate stems of an inflected word."""
    out = {word}
    for suf in ("ies", "es", "s", "ed", "ing", "er", "est", "ly"):
        if word.endswith(suf) and len(word) > len(suf) + 2:
            stem = word[: -len(suf)]
            out.add(stem)
            if suf == "ies":
                out.add(stem + "y")
            if suf in ("ed", "ing", "er", "est"):
                out.add(stem + "e")  # shared -> share(d)
                if len(stem) >= 2 and stem[-1] == stem[-2]:
                    out.add(stem[:-1])  # planned -> plan
    return out


def _inflect(stem: str) -> set[str]:
    """Inflections of one candidate stem."""
    out = {stem}
    if stem.endswith("y") and len(stem) > 2 and stem[-2] not in _VOWELS:
        out.add(stem[:-1] + "ies")
        base = stem[:-1] + "i"
        out.add(base + "ed")
        out.add(base + "er")
        out.add(base + "est")
        out.add(stem[:-1] + "ily")
    if stem.endswith(("s", "x", "z", "ch", "sh")):
        out.add(stem + "es")
    else:
        out.add(stem + "s")
    if stem.endswith("e"):
        out.add(stem[:-1] + "ed")
        out.add(stem[:-1] + "ing")
        out.add(stem[:-1] + "er")
        out.add(stem[:-1] + "est")
        out.add(stem + "d")
        out.add(stem + "r")
        out.add(stem + "st")
    else:
        out.add(stem + "ed")
        out.add(stem + "ing")
        out.add(stem + "er")
        out.add(stem + "est")
        # consonant doubling: CVC short stems (run -> running)
        if (
            len(stem) >= 3
            and stem[-1] not in _VOWELS
            and stem[-1] not in "wxy"
            and stem[-2] in _VOWELS
            and stem[-3] not in _VOWELS
        ):
            out.add(stem + stem[-1] + "ed")
            out.add(stem + stem[-1] + "ing")
            out.add(stem + stem[-1] + "er")
            out.add(stem + stem[-1] + "est")
    out.add(stem + "ly")
    return out


def variations(word: str) -> set[str]:
    """All morphological variants of ``word`` (including itself)."""
    word = word.lower()
    out: set[str] = set()
    for stem in _strip_suffixes(word):
        out |= _inflect(stem)
    out.add(word)
    return out
