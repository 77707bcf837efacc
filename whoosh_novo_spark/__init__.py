"""whoosh_novo_spark — a PySpark-native inverted-index + BM25 engine.

A from-scratch reimplementation of the *semantics* of de-odex/whoosh-novo
(pure-Python full-text search) as idiomatic PySpark DataFrame pipelines:

- tokenization/analysis: vectorized Arrow pandas UDFs byte-identical to the
  reference ``StandardAnalyzer`` (regex tokenize -> lower -> stopwords)
- index build: partition-parallel posting-list construction into sorted
  ``(term, docid, weight)`` segment tables (parquet, Iceberg-style manifest
  generations), with per-block skip/max metadata and varbyte-compressed
  doc-gap blocks
- query: top-k BM25 (B=0.75, K1=1.2, whoosh BM25F statistics) for boolean
  term queries — an exact set-oriented path (joins + groupBy) and a
  block-max WAND pruned path (mapInPandas kernel)

Nothing in here is a port of the reference's architecture (no Matcher trees,
no codecs, no file locks, no external sort): Spark's shuffle, Parquet
encodings and Catalyst replace all of that.  Only the *numeric semantics*
(token stream, 8-bit length quantization, BM25 statistics, tie-breaks) are
replicated bit-for-bit; each module cites the reference file:line it mirrors.
"""

__version__ = "0.1.0"

from whoosh_novo_spark.schema import FieldConfig, IndexConfig  # noqa: F401
