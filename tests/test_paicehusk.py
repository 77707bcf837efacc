"""Paice-Husk stemmer: rule parity with the reference where the
reference is correct, plus proofs of its two defects (COVERAGE.md
reference bugs #10/#11)."""

from __future__ import annotations

import random

import pytest

from whoosh_novo_spark.functions import paicehusk as ph


def test_ruleset_token_identical(whoosh_ref):
    from whoosh.lang import paicehusk as refph

    ref_tokens = []
    for line in refph.defaultrules.split("\n"):
        line = line.strip()
        if not line:
            continue
        m = refph.PaiceHuskStemmer.rule_expr.match(line)
        if m:
            ref_tokens.append(m.group(0))
    assert ph.DEFAULT_RULES.split() == ref_tokens


def test_golden_vs_reference_on_sound_inputs(whoosh_ref):
    """Word-for-word parity wherever the reference itself is sound
    (vowel-bearing words whose result is non-empty)."""
    from whoosh.lang import paicehusk as refph

    rng = random.Random(21)
    vocab = set(
        """kindness running nationality splitting classification probably
        triplicate emptiness conspiracy conclusion explanation dangerous
        maximum belief distinguish factionalism""".split()
    )
    for _ in range(8000):
        vocab.add(
            "".join(
                rng.choice("abcdefghijklmnopqrstuvwxyz")
                for _ in range(rng.randint(2, 12))
            )
        )
    mismatches = []
    for w in sorted(vocab):
        try:
            r = refph.stem(w)
        except ValueError:
            continue
        if r == "":
            continue
        if ph.stem(w) != r:
            mismatches.append((w, r, ph.stem(w)))
    assert mismatches == [], mismatches[:10]


def test_reference_defects_not_replicated(whoosh_ref):
    from whoosh.lang import paicehusk as refph

    # bug #10: protect rules (remove-count 0) wipe the reference's stem
    assert refph.stem("miss") == ""
    assert refph.stem("discussed") == ""
    assert ph.stem("miss") == "miss"
    assert ph.stem("discussed") == "discuss"
    # bug #11: vowel-less words crash the reference
    with pytest.raises(ValueError):
        refph.stem("zzz")
    assert ph.stem("zzz") == "zzz"


def test_examples():
    assert ph.stem("kindness") == "kind"
    assert ph.stem("running") == "run"
    assert ph.stem("splitting") == "split"
    # prefix strip + intact rules
    assert ph.stem("kilometers") == ph.stem("meters")
