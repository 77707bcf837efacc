"""HTML -> text extraction for WARC-style ingest.

The engine's input table (BASELINE.json input_hint) carries BOTH
``html: binary`` and ``text: string``; real Common-Crawl ingest starts
from the html bytes, and the north rule's per-row invariant is
"byte-identical extracted text per url".  This module makes the html
column a first-class ingest source instead of dead weight:

- ``extract_text_expr(col)`` — the SCALE path: a pure Catalyst column
  expression (decode + a fixed chain of ``regexp_replace``).  It runs
  entirely JVM-side inside whole-stage codegen — no Python worker, no
  Arrow hop — so extraction rides the same scan that reads the html
  bytes and adds no stage at 10^12 rows.  Covers comments, script/
  style/noscript subtrees, tag stripping with block-level tags mapped
  to newlines, and the named core entities (&amp; &lt; &gt; &quot;
  &#39; &apos; &nbsp;).  Numeric character references are NOT decoded
  (Catalyst has no chr()-fold); rows that need them get the kernel.
- ``extract_text_kernel(col)`` — the COMPLETENESS path: an
  Arrow-batched pandas UDF running the same pipeline with full HTML5
  entity decoding (``html.unescape``, applied only to batches' rows
  that still contain '&' after the vectorized tag pass).  Same output
  as the expr path on entity-free html (parity-gated).
- ``ingest_html(df)`` — convenience: attach/replace the text column.

Extraction policy (deterministic, order matters):
  1. drop ``<!-- ... -->`` comments,
  2. drop script/style/noscript elements WITH their content,
  3. replace block-level tags (p, div, br, li, h1-6, tr, table, html,
     body, ...) with a newline; strip all remaining tags to nothing
     (inline markup like <b>/<a> must not split a word),
  4. decode entities,
  5. collapse whitespace runs that contain a newline into one newline,
     trim the ends.

Under this policy ``<html><body>T</body></html>`` extracts to exactly
``T`` — the corpus synthesizer's wrapping (sources/corpus.py:107) —
which is what the byte-identity gate in tests/test_extract.py checks
row-for-row at multiple partition counts, alongside handwritten
multi-block/entity/script cases.

Reference: whoosh-novo indexes caller-supplied strings and has no html
stage; this is engine-side ingest surface for the web-page input shape.
"""

from __future__ import annotations

import html as _html

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Java regex (regexp_replace) and Python re both support these patterns.
_COMMENT = r"(?s)<!--.*?-->"
_DROP_SUBTREE = r"(?is)<(script|style|noscript)\b[^>]*>.*?</\1\s*>"
_BLOCK_TAGS = (
    "html|head|body|title|p|div|br|hr|li|ul|ol|dl|dt|dd|h[1-6]|tr|td|th|"
    "table|thead|tbody|tfoot|caption|article|section|nav|aside|header|"
    "footer|main|blockquote|pre|figure|figcaption|form|fieldset|address"
)
_BLOCK = rf"(?i)</?(?:{_BLOCK_TAGS})\b[^>]*/?>"
_ANY_TAG = r"(?s)<[^>]*>"
_WS_NEWLINE = r"[ \t\r\f]*\n[ \t\r\f\n]*"

#: named core entities the JVM path decodes; '&amp;' MUST be last so
#: '&amp;lt;' decodes to the literal '&lt;' (double-escaped source
#: text), matching html.unescape's behavior on that input.
_NAMED_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def _strip_markup_col(s: Column) -> Column:
    s = F.regexp_replace(s, _COMMENT, "")
    s = F.regexp_replace(s, _DROP_SUBTREE, "")
    s = F.regexp_replace(s, _BLOCK, "\n")
    return F.regexp_replace(s, _ANY_TAG, "")


def _finish_col(s: Column) -> Column:
    s = F.regexp_replace(s, _WS_NEWLINE, "\n")
    # trim() strips only ' '; the ends may hold newlines from block tags
    return F.regexp_replace(s, r"^\s+|\s+$", "")


def extract_text_expr(html, charset: str = "UTF-8") -> Column:
    """Catalyst-only extraction (see module docstring): decode the
    binary, strip markup, decode named core entities, canonicalize
    whitespace.  Stays inside whole-stage codegen — ``.explain()`` of a
    projection through this shows no BatchEvalPython/ArrowEval node."""
    s = F.decode(F.col(html) if isinstance(html, str) else html, charset)
    s = _strip_markup_col(s)
    for ent, rep in _NAMED_ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(rep))
    return _finish_col(s)


def extract_text_kernel(html, charset: str = "UTF-8") -> Column:
    """Arrow-batched extraction with FULL entity decoding.  The tag
    pipeline is vectorized (pandas .str.replace on the whole batch);
    ``html.unescape`` — the only per-row step — runs only on rows that
    still contain '&' after markup removal."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _extract(col: pd.Series) -> pd.Series:
        s = col.map(lambda b: b.decode(charset) if isinstance(b, (bytes, bytearray)) else b)
        s = s.str.replace(_COMMENT, "", regex=True)
        s = s.str.replace(_DROP_SUBTREE, "", regex=True)
        s = s.str.replace(_BLOCK, "\n", regex=True)
        s = s.str.replace(_ANY_TAG, "", regex=True)
        amp = s.str.contains("&", regex=False).fillna(False)
        if amp.any():
            s = s.mask(amp, s[amp].map(_html.unescape))
        s = s.str.replace(_WS_NEWLINE, "\n", regex=True)
        return s.str.strip()

    return _extract(F.col(html) if isinstance(html, str) else html)


def ingest_html(
    df: DataFrame,
    html_col: str = "html",
    out_col: str = "text",
    full_entities: bool = False,
    charset: str = "UTF-8",
) -> DataFrame:
    """Attach (or replace) ``out_col`` extracted from ``html_col`` —
    the ingest step that turns the raw web-page table into the shape
    ``build_segment`` indexes.  Default is the JVM expr path; pass
    ``full_entities=True`` for the kernel when the corpus uses numeric
    or exotic character references."""
    fn = extract_text_kernel if full_entities else extract_text_expr
    return df.withColumn(out_col, fn(html_col, charset=charset))


def extract_title_expr(html, charset: str = "UTF-8") -> Column:
    """The page's ``<title>`` text as a Catalyst expression: first
    title element, inner markup stripped, core entities decoded,
    whitespace collapsed.  Empty string when the page has none.
    Takes a STRING column (``ingest_title`` handles binary decode).

    The title is the classic second ranking field — index it alongside
    the body (``FieldConfig("title", boost=...)`` or parser
    ``multifield=['title','text'], field_boosts={'title': 2.0}``) for
    BM25F-style weighting; whoosh's own docs model exactly that schema.
    """
    s = F.col(html) if isinstance(html, str) else html
    s = F.regexp_replace(s, _COMMENT, "")
    t = F.regexp_extract(s, r"(?is)<title\b[^>]*>(.*?)</title\s*>", 1)
    t = F.regexp_replace(t, _ANY_TAG, " ")
    for ent, rep in _NAMED_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def ingest_title(
    df: DataFrame,
    html_col: str = "html",
    out_col: str = "title",
    charset: str = "UTF-8",
) -> DataFrame:
    """Attach ``out_col`` = the page title extracted from ``html_col``
    (binary columns decoded with ``charset`` first).  Pure Catalyst —
    composes with batch and streaming plans like ``ingest_html``."""
    dtype = dict(df.dtypes).get(html_col)
    c = F.col(html_col)
    s = F.decode(c, charset) if dtype == "binary" else c
    return df.withColumn(out_col, extract_title_expr(s, charset=charset))
