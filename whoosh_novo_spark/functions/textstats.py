"""Text analysis for training-data pipelines — all JVM-side SQL expressions.

Everything here is a Column expression built from pyspark.sql.functions
(whole-stage codegen; no Python in the hot path), with a DuckDB-equivalent
SQL twin in oracle_sql.py for the driver correctness gate.

The tokenizer used here is the Java-regex translation of the engine's
analyzer pattern (ASCII ``\\w``, fine for ASCII corpora; the indexing path
keeps the byte-exact Python analyzer).  Ops:

- token statistics (counts, mean length)
- quality scoring (stopword ratio, alpha ratio, length signals)
- language-ID heuristic over per-language function-word lists
- document fingerprint (md5 of the normalized token stream) for exact
  near-canonical dedup
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from whoosh_novo_spark.functions.analysis import STOP_WORDS

TOKEN_RX_JAVA = r"[\w*]+(\.?[\w*]+)*"

# small function-word profiles for the lang-id heuristic (public common
# function words; deliberately tiny and deterministic)
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans", "que", "pour", "des"),
    "es": ("el", "la", "los", "las", "es", "una", "en", "que", "por", "con"),
}


def tokens_sql(col: str = "text") -> Column:
    """Lowercased regex tokens, JVM-side (Spark regexp_extract_all).

    Pattern passed as a lit Column — embedding it in an expr string would
    hit Spark SQL's backslash escaping and corrupt ``\\w``."""
    return F.transform(
        F.regexp_extract_all(F.col(col), F.lit(TOKEN_RX_JAVA), F.lit(0)),
        lambda x: F.lower(x),
    )


def token_count(col: str = "text") -> Column:
    return F.size(tokens_sql(col))


# GPT-2-style pre-tokenizer (Radford et al. 2019, public `gpt2` regex):
# contractions, letter runs, digit runs, punctuation runs — each with an
# optional leading space — then residual whitespace.  This is the split
# BPE runs on BEFORE merges, so counting its pieces gives the standard
# "pre-token" count used to budget LLM training data; actual merged-BPE
# counts are a bounded factor below it (merges only join within a piece).
# Java regex: \p{L}/\p{N} are supported natively; (?!\S) lookahead too.
BPE_PRETOKEN_RX_JAVA = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"
    r"|\s+(?!\S)|\s+"
)


def bpe_pretoken_count(col: str = "text") -> Column:
    """BPE pre-token count (GPT-2 pre-tokenizer pieces, whitespace-only
    pieces excluded) — the token-budget estimator a training-data pipeline
    charges documents by.  JVM-side regexp, no UDF."""
    pieces = F.regexp_extract_all(F.col(col), F.lit(BPE_PRETOKEN_RX_JAVA), F.lit(0))
    return F.size(F.filter(pieces, lambda p: p.rlike(r"\S")))


def mean_token_len(col: str = "text") -> Column:
    toks = tokens_sql(col)
    return F.when(F.size(toks) > 0,
                  F.aggregate(toks, F.lit(0), lambda a, x: a + F.length(x)).cast("double")
                  / F.size(toks)).otherwise(F.lit(0.0))


def stopword_ratio(col: str = "text") -> Column:
    toks = tokens_sql(col)
    stops = F.array(*[F.lit(w) for w in sorted(STOP_WORDS)])
    n_stop = F.size(F.array_intersect(toks, stops))  # distinct-stopword count
    n_stop_all = F.aggregate(
        toks, F.lit(0), lambda a, x: a + F.when(F.array_contains(stops, x), 1).otherwise(0)
    )
    return F.when(F.size(toks) > 0, n_stop_all.cast("double") / F.size(toks)).otherwise(0.0)


def alpha_ratio(col: str = "text") -> Column:
    """Fraction of characters that are ASCII letters or space."""
    clean = F.length(F.regexp_replace(F.col(col), "[^A-Za-z ]", ""))
    return F.when(F.length(col) > 0, clean.cast("double") / F.length(col)).otherwise(0.0)


def quality_score(col: str = "text") -> Column:
    """Composite heuristic in [0,1]: length sweet spot, stopword presence,
    alphabetic-ness — the usual web-text quality gates."""
    n = token_count(col).cast("double")
    len_component = F.least(n / F.lit(64.0), F.lit(1.0))
    stop_component = F.least(stopword_ratio(col) * 4.0, F.lit(1.0))
    return F.round(
        0.4 * len_component + 0.3 * stop_component + 0.3 * alpha_ratio(col), 6
    )


def lang_id(col: str = "text") -> Column:
    """Most-matching function-word profile; 'und' (undetermined) when no
    profile matches.  Ties break by profile name order."""
    toks = tokens_sql(col)

    def _hits(prof):
        return F.aggregate(
            toks,
            F.lit(0),
            lambda a, x: a + F.when(F.array_contains(prof, x), 1).otherwise(0),
        )

    scores = []
    for lang in sorted(LANG_PROFILES):
        prof = F.array(*[F.lit(w) for w in LANG_PROFILES[lang]])
        scores.append(F.struct(_hits(prof).alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(col: str = "text") -> Column:
    """md5 of the space-joined normalized token stream — canonical-text
    fingerprint robust to whitespace/punctuation/case noise."""
    return F.md5(F.concat_ws(" ", tokens_sql(col)))


def hash64(col: Column, seed: int = 0) -> Column:
    """Deterministic 60-bit integer hash reproducible in DuckDB:
    conv(substr(md5(seed||x),1,15),16,10).  Used by minhash/LSH so the
    oracle can recompute signatures bit-for-bit."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(str(seed) + "\x1f"), col)), 1, 15), 16, 10).cast(
        "bigint"
    )
