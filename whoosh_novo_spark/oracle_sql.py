"""DuckDB oracle-SQL generators for the driver correctness gate.

Each generator returns ANSI SQL (DuckDB dialect) that recomputes, from the
raw ``documents`` parquet table, exactly what the Spark engine computes from
its index — including the whoosh analysis chain and BM25 statistics
(SURVEY §1.4).  This gives an independent end-to-end oracle: tokenizer,
quantization, statistics and ranking all re-derived in pure SQL.

The tokenizer here is the RE2 translation of the reference regex — valid
because the testdata ``documents.text`` is ASCII (RE2 ``\\w`` is ASCII-only
while Python's is Unicode; the Unicode cases are covered by the pytest
golden tests against the reference instead).
"""

from __future__ import annotations

from whoosh_novo_spark.functions.analysis import STOP_WORDS
from whoosh_novo_spark.functions.quantize import quantized_len_sql

B = 0.75
K1 = 1.2

_STOPS_SQL = ",".join(f"'{w}'" for w in sorted(STOP_WORDS))

# analysis chain: regexp tokenize -> lower -> minsize/stop filter
TOKS_CTE = f"""
toks AS (
  SELECT doc_id, unnest(terms) AS term
  FROM (
    SELECT doc_id,
           list_filter(
             list_transform(regexp_extract_all(text, '[\\w*]+(\\.?[\\w*]+)*'), x -> lower(x)),
             x -> length(x) >= 2 AND x NOT IN ({_STOPS_SQL})
           ) AS terms
    FROM documents
  )
)"""

POSTINGS_CTE = """
postings AS (
  SELECT doc_id, term, count(*)::DOUBLE AS w
  FROM toks GROUP BY doc_id, term
)"""

DOCLENS_CTE = """
doclens AS (
  SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY doc_id
)"""

CONSTS_CTE = """
consts AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS dc,
         (SELECT coalesce(sum(dl), 0) FROM doclens)::DOUBLE AS total_len
)"""


def _scored_cte(round_digits: int = 4) -> str:
    """Per-(doc, term) BM25 scores for every term (filtered later)."""
    flq = quantized_len_sql("doclens.dl", "duckdb")
    return f"""
df AS (
  SELECT term, count(*)::DOUBLE AS df FROM postings GROUP BY term
),
scored AS (
  SELECT p.doc_id, p.term,
         (ln(c.dc / (df.df + 1)) + 1)
         * (p.w * ({K1} + 1))
         / (p.w + {K1} * ((1 - {B}) + {B} * {flq}
              / (CASE WHEN c.total_len = 0 THEN 1
                      WHEN c.total_len / c.dc = 0 THEN 1
                      ELSE c.total_len / c.dc END))) AS score
  FROM postings p
  JOIN df USING (term)
  JOIN doclens ON p.doc_id = doclens.doc_id
  CROSS JOIN consts c
)"""


def _with(*ctes: str) -> str:
    return "WITH " + ",".join(ctes)


_BASE = _with(TOKS_CTE, POSTINGS_CTE, DOCLENS_CTE, CONSTS_CTE, _scored_cte())


def _terms_in(terms: list[str]) -> str:
    return ",".join(f"'{t}'" for t in terms)


def topk_or(terms: list[str], k: int = 10) -> str:
    return f"""{_BASE}
SELECT doc_id, round(sum(score), 4) AS score
FROM scored WHERE term IN ({_terms_in(terms)})
GROUP BY doc_id
ORDER BY sum(score) DESC, doc_id ASC LIMIT {k}"""


def topk_and(terms: list[str], k: int = 10) -> str:
    n = len(set(terms))
    return f"""{_BASE}
SELECT doc_id, round(sum(score), 4) AS score
FROM scored WHERE term IN ({_terms_in(terms)})
GROUP BY doc_id HAVING count(*) = {n}
ORDER BY sum(score) DESC, doc_id ASC LIMIT {k}"""


def topk_term(term: str, k: int = 10) -> str:
    return topk_or([term], k)


def topk_dismax(terms: list[str], k: int = 10) -> str:
    return f"""{_BASE}
SELECT doc_id, round(max(score), 4) AS score
FROM scored WHERE term IN ({_terms_in(terms)})
GROUP BY doc_id
ORDER BY max(score) DESC, doc_id ASC LIMIT {k}"""


def topk_andnot(pos: str, neg: str, k: int = 10) -> str:
    return f"""{_BASE}
SELECT doc_id, round(score, 4) AS score
FROM scored WHERE term = '{pos}'
  AND doc_id NOT IN (SELECT doc_id FROM scored WHERE term = '{neg}')
ORDER BY score DESC, doc_id ASC LIMIT {k}"""


def topk_andmaybe(a: str, b: str, k: int = 10) -> str:
    return f"""{_BASE}
SELECT s.doc_id, round(s.score + coalesce(m.score, 0), 4) AS score
FROM (SELECT doc_id, score FROM scored WHERE term = '{a}') s
LEFT JOIN (SELECT doc_id, score FROM scored WHERE term = '{b}') m
  ON s.doc_id = m.doc_id
ORDER BY s.score + coalesce(m.score, 0) DESC, s.doc_id ASC LIMIT {k}"""


def topk_multiterm(where: str, k: int = 10) -> str:
    """Prefix/wildcard/range/fuzzy: expand matching terms, score as OR.
    ``where`` is a predicate over column ``term``."""
    return f"""{_BASE}
SELECT doc_id, round(sum(score), 4) AS score
FROM scored WHERE {where}
GROUP BY doc_id
ORDER BY sum(score) DESC, doc_id ASC LIMIT {k}"""


def term_stats_top(n: int = 20) -> str:
    """Terms table parity: top-n terms by (df desc, term asc)."""
    return f"""{_with(TOKS_CTE, POSTINGS_CTE)}
SELECT term, count(*)::BIGINT AS df, sum(w)::DOUBLE AS cf, max(w)::DOUBLE AS max_weight
FROM postings GROUP BY term
ORDER BY df DESC, term ASC LIMIT {n}"""


def doclens_check() -> str:
    """Doclens parity: quantized length per doc (all docs with tokens)."""
    flq = quantized_len_sql("dl", "duckdb")
    return f"""{_with(TOKS_CTE, DOCLENS_CTE)}
SELECT doc_id, dl AS len, {flq}::BIGINT AS len_q FROM doclens"""


def facet_lang_count(term: str) -> str:
    """FieldFacet+Count (sorting.py:158,1028): matching-doc counts by lang."""
    return f"""{_with(TOKS_CTE, POSTINGS_CTE)}
SELECT d.lang AS lang, count(*)::BIGINT AS n
FROM documents d
WHERE d.doc_id IN (SELECT doc_id FROM postings WHERE term = '{term}')
GROUP BY d.lang ORDER BY d.lang"""


def collapse_top_per_source(term: str, per: int = 1, k: int = 20) -> str:
    """CollapseCollector (collectors.py:854+): best `per` docs per source."""
    return f"""{_BASE}
SELECT doc_id, source, round(score, 4) AS score FROM (
  SELECT s.doc_id, d.source, s.score,
         row_number() OVER (PARTITION BY d.source
                            ORDER BY s.score DESC, s.doc_id ASC) AS rn
  FROM scored s JOIN documents d ON s.doc_id = d.doc_id
  WHERE s.term = '{term}'
) WHERE rn <= {per}
ORDER BY score DESC, doc_id ASC LIMIT {k}"""
