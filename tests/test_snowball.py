"""Snowball stemmer + LanguageAnalyzer parity vs the reference.

The stemmers (functions/snowball.py) are clean-room implementations of
the published Snowball algorithms whose parity target is the
reference's NLTK-derived port (src/whoosh/lang/snowball/*); these
goldens compare word-for-word over suffix-rich constructed vocabulary
plus seeded random words (which flush out region/edge-case quirks the
dictionaries miss)."""

from __future__ import annotations

import random

import pandas as pd
import pytest

from whoosh_novo_spark.functions import snowball as sb
from whoosh_novo_spark.functions.analysis import ANALYZERS
from whoosh_novo_spark.functions.stopwords import STOPWORDS

LANGS = ("en", "de", "fr", "es", "da", "no", "sv", "nl", "it", "pt", "ru",
         "fi", "ro", "hu")

_ALPHA = {
    "en": "abcdefghijklmnopqrstuvwxyy'e",
    "de": "abcdefghijklmnopqrstuvwxyzaeiouäöüß",
    "fr": "abcdefghijklmnopqrstuvwxyzaeiouâàëéêèïîôûùçy",
    "es": "abcdefghijklmnopqrstuvwxyzaeiouáéíóúüñy",
    "da": "abcdefghijklmnopqrstuvwxyzaeiouæåø",
    "no": "abcdefghijklmnopqrstuvwxyzaeiouæåø",
    "sv": "abcdefghijklmnopqrstuvwxyzaeiouäåö",
    "nl": "abcdefghijklmnopqrstuvwxyzaeiouèyäáëéíïöóüú",
    "it": "abcdefghijklmnopqrstuvwxyzaeiouàèìòùáéíóú",
    "pt": "abcdefghijklmnopqrstuvwxyzaeiouáéíóúâêôãõç",
    "ru": "абвгдежзийклмнопрстуфхцчшщъыьэюяёаоие",
    "fi": "abcdefghijklmnopqrstuvwxyzaeiouäö",
    "ro": "abcdefghijklmnopqrstuvwxyzaeiouăâîţş",
    "hu": "abcdefghijklmnopqrstuvwxyzaeiouöüáéíóõúûőű",
}

_BASES = (
    "p", "pr", "pro", "gro", "grop", "atre", "ou", "au", "e", "a", "qu",
    "gener", "commun", "arsen", "ver", "verhaeltnis", "aktion", "par",
    "col", "tap", "niss", "lo", "u", "abo", "abil", "log", "ic", "iv",
    "at", "gu", "agu", "virgu", "oo", "ayo", "uy", "pluie", "essaye",
    "hopp", "hop", "ski", "cri", "beau", "trait",
)

_SUFFIXES = {
    "de": ("ern", "em", "er", "en", "es", "e", "s", "est", "st", "isch",
           "lich", "heit", "keit", "end", "ung", "ig", "ik", "nisse",
           "nisses", "erung", "igung", "lichkeit", "igkeit"),
    "es": sb._ES_STEP0 + sb._ES_STEP1 + sb._ES_STEP2A + sb._ES_STEP2B
    + sb._ES_STEP3,
    "fr": tuple(s.lower() for s in sb._FR_STEP1 + sb._FR_STEP2A
                + sb._FR_STEP2B + sb._FR_STEP4),
    "en": ("'s'", "'s", "'", "sses", "ied", "ies", "us", "ss", "s",
           "eedly", "ingly", "edly", "eed", "ing", "ed")
    + sb._EN_STEP2 + sb._EN_STEP3 + sb._EN_STEP4 + ("e", "l"),
    "da": sb._DA_STEP1 + sb._DA_STEP2 + sb._DA_STEP3 + ("igst", "løst"),
    "no": sb._NO_STEP1 + sb._NO_STEP2 + sb._NO_STEP3,
    "sv": sb._SV_STEP1 + sb._SV_STEP2 + sb._SV_STEP3,
    "nl": sb._NL_STEP1 + sb._NL_STEP3B
    + ("heid", "heden", "gem", "e", "kk", "dd", "tt", "aas", "eet", "ook"),
    "it": sb._IT_STEP0 + sb._IT_STEP1
    + tuple(s for s in sb._IT_STEP2 if s != "Yamo")
    + ("ch", "gh", "i", "ando", "endo"),
    "pt": sb._PT_STEP1 + sb._PT_STEP2 + sb._PT_STEP4
    + ("e", "é", "ê", "gu", "ci", "ç"),
    "ru": ("ость", "ейше", "нн", "вшись", "ывшись", "ившись", "само",
           "ующими", "ениями", "ость'", "и", "ь", "ъ"),
    "fi": sb._FI_STEP1 + sb._FI_STEP2 + sb._FI_STEP3 + sb._FI_STEP4
    + ("t", "kse", "poimma"),
    "ro": ("ul", "ului", "ile", "aţie", "abilitate", "icitate", "ator",
           "itate", "iune", "ist", "are", "ând", "ează", "eşti", "a",
           "e", "i", "ă", "seserăţi"),
    "hu": sb._HU_STEP2 + sb._HU_STEP3 + sb._HU_STEP4 + sb._HU_STEP6
    + sb._HU_STEP7 + sb._HU_STEP9 + ("al", "el", "ttal", "á", "é"),
}


def _vocab(lang: str, n_random: int = 5000) -> list[str]:
    rng = random.Random(0xC0FFEE + hash(lang) % 1000)
    vocab = set()
    for b in _BASES:
        for s in _SUFFIXES[lang]:
            vocab.add(b + s)
            vocab.add(b + s + s)
    for _ in range(n_random):
        n = rng.randint(1, 12)
        vocab.add("".join(rng.choice(_ALPHA[lang]) for _ in range(n)))
    return sorted(vocab)


@pytest.mark.parametrize("lang", LANGS)
def test_stemmer_golden_vs_reference(whoosh_ref, lang):
    from whoosh.lang.snowball import classes as ref_classes

    ref = ref_classes[lang]().stem
    ours = sb.SNOWBALL_STEMMERS[lang]
    mismatches = [
        (w, ref(w), ours(w)) for w in _vocab(lang) if ref(w) != ours(w)
    ]
    assert mismatches == [], mismatches[:10]


@pytest.mark.parametrize("lang", LANGS)
def test_stopword_lists_match_reference(whoosh_ref, lang):
    from whoosh.lang.stopwords import stoplists

    if lang == "ro":
        # Romanian has a stemmer but NO stop list on either side — the
        # chain just omits the stop stage (NoStopWords)
        assert "ro" not in STOPWORDS and "ro" not in stoplists
        return
    assert STOPWORDS[lang] == frozenset(stoplists[lang])


SAMPLE_TEXTS = [
    "Die Katzen liefen schneller als die Hunde der Nachbarn",
    "De katten liepen sneller dan de honden lopende gemeenten",
    "Hundene løb hurtigere end kattene i haven",
    "Hundarna sprang snabbare än katterna i trädgården",
    "I gatti correvano velocemente nelle organizzazioni",
    "Os gatos corriam rapidamente nas organizações",
    "Пользователи быстро читали важные документы",
    "Koirat juoksivat nopeammin kuin kissat organisaatioissa",
    "Organizaţiile lucrau repede cu clienţii",
    "A kutyák gyorsabban futottak a kertekben",
    "Les chevaux mangeaient rapidement des pommes délicieuses",
    "Las organizaciones trabajaban lentamente con los clientes",
    "The organizations were quickly running comprehensive benchmarks",
    "MiXeD case 42 tokens with-dashes and_underscores",
    "",
]


@pytest.mark.parametrize("lang", LANGS + ("zh",))
def test_language_analyzer_parity(whoosh_ref, lang):
    """ANALYZERS['lang_x'] == reference LanguageAnalyzer(x), tokens AND
    positions (the zh chain degrades to tokenize+lower on both sides:
    no stop list, no stemmer)."""
    from whoosh.analysis import LanguageAnalyzer

    ana = LanguageAnalyzer(lang)
    batch = ANALYZERS[f"lang_{lang}"](pd.Series(SAMPLE_TEXTS))
    ours: list[list[tuple]] = [[] for _ in SAMPLE_TEXTS]
    for r, t, p in zip(batch.row, batch.term, batch.pos):
        ours[r].append((t, int(p)))
    for text, got in zip(SAMPLE_TEXTS, ours):
        want = [(t.text, t.pos) for t in ana(text, positions=True)]
        assert got == want, (lang, text, got, want)


def test_language_analyzer_registry_aliases():
    from whoosh_novo_spark.functions.analysis import language_analyzer

    assert language_analyzer("german") == "lang_de"
    assert language_analyzer("fr") == "lang_fr"
    assert sb.stemmer_for_language("nosuch") is None


def test_driver_stem_map_pinned():
    """The mixed_lang_topk oracle's literal stem maps must match the
    live German AND English stemmers over the corpus's closed
    vocabulary (the pins make the DuckDB oracle self-contained; this
    test keeps them honest)."""
    import __spark_entry__ as entry

    for tok, stemmed in entry._LANG_STEM_MAP_PINNED.items():
        assert sb.stem_de(tok) == stemmed, tok
    assert set(entry._LANG_STEM_MAP_PINNED_EN) == set(entry._LANG_STEM_MAP_PINNED)
    for tok, stemmed in entry._LANG_STEM_MAP_PINNED_EN.items():
        assert sb.stem_en(tok) == stemmed, tok
