"""Index schema: per-field configuration.

Mirrors the *role* of ``whoosh.fields.Schema``/``FieldType``
(``/root/reference/src/whoosh/fields.py:60-367, 1375-1597``) without the
machinery: the source table's Spark ``StructType`` already is the stored
schema; what remains is per-indexed-field analysis/scoring config.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class FieldConfig:
    """Config for one indexed text field.

    - ``analyzer``: name registered in ``functions.analysis.ANALYZERS``
      (default "standard" == reference StandardAnalyzer, analyzers.py:190-217)
    - ``scorable``: store quantized doc lengths; unscorable fields score by
      raw weight (scoring.py:301-303)
    - ``positions``: emit per-term position arrays (``Positions`` format,
      formats.py:216-272) enabling phrase queries
    - ``boost``: field boost multiplied into posting weight
      (formats.py:190-203: weight = tf * boost)
    """

    name: str
    analyzer: str = "standard"
    scorable: bool = True
    positions: bool = False
    boost: float = 1.0
    # "text" fields are analyzed into postings; "numeric"/"datetime"/
    # "boolean" fields stay native docmap columns (the reference encodes
    # them as tiered sortable terms, fields.py:516-997 — Parquet column
    # min/max pruning makes that machinery unnecessary, SURVEY §2.9) and
    # range/equality queries compile to pushed-down column predicates.
    type: str = "text"
    # whoosh ``chars=True`` (Characters format, formats.py:273-345): store
    # per-occurrence character offsets alongside positions — postings rows
    # gain a ``chars array<struct<pos,start,end>>`` column consumed by
    # pinpoint (non-retokenizing) highlighting.  Implies positions.
    chars: bool = False
    # whoosh PositionBoosts/CharacterBoosts (formats.py:345-470): posting
    # weight becomes sum(per-token boost) * field boost instead of
    # tf * field boost, and (when positions are kept) a ``boosts
    # array<double>`` column aligned with ``positions`` is stored.  Pair
    # with analyzer="delimited_boost" for the "word^2.5" markup syntax
    # (DelimitedAttributeFilter, filters.py:504-578); other analyzers
    # emit all-1.0 boosts, degenerating to the Positions format.
    boosts: bool = False
    # whoosh ``vector=True`` (fields.py FieldType.vector, consumed by
    # Results.key_terms/Searcher.more_like): ALSO write a forward index —
    # a (docid, field, term, weight) table range-sorted by docid, so a
    # per-document term-vector lookup prunes to one parquet row group
    # instead of scanning term-sorted postings.
    vector: bool = False
    # Mixed-language corpus routing (r5; beyond the reference, which — like
    # a single-analyzer build here — binds one analyzer per field): each
    # document row is analyzed with the LanguageAnalyzer chain named by its
    # ``IndexConfig.lang_col`` value, and its postings land in the VIRTUAL
    # field "<name>@<lang>" (e.g. "text@de").  Term stats, field lengths
    # and per-field doc counts are therefore kept per (field, language),
    # so BM25 idf/avgfl over "text@de" exactly match a de-only build.
    # Query with Term("text@de", ...) or expand over
    # Index.lang_variants("text").  Incompatible with chars/boosts.
    lang_routed: bool = False


@dataclass(frozen=True)
class IndexConfig:
    """Whole-index configuration.

    ``id_col`` provides the deterministic total order used for docid
    assignment (sort by it — the reference assigns docnums in insertion
    order, writing.py:584-606; we need a *reproducible* order under
    distributed ingest, so we sort).
    """

    id_col: str = "url"
    fields: tuple[FieldConfig, ...] = (FieldConfig("text"),)
    # whoosh `stored=True` analogue: which non-indexed source columns the
    # docmap keeps for Results.fields/fetch.  None = keep every column
    # (backward-compatible); () = only id + indexed fields.  Projecting
    # away heavy payload columns (e.g. raw html binary) before the docid
    # range-shuffle is a large build-throughput lever.
    stored_cols: tuple[str, ...] | None = None
    # build knobs
    shuffle_partitions: int | None = None  # None -> leave session setting
    block_limit: int = 128  # postings per block, mirrors W3Codec blocklimit=128 (whoosh3.py:85)
    # source column giving each row's language for lang_routed fields
    lang_col: str = "lang"

    def field(self, name: str) -> FieldConfig:
        # virtual per-language field of a lang-routed build: "text@de"
        # resolves to the "text" FieldConfig
        base = name.split("@", 1)[0] if "@" in name else name
        for f in self.fields:
            if f.name == name or (f.name == base and f.lang_routed):
                return f
        raise KeyError(name)

    @property
    def default_field(self) -> FieldConfig:
        return self.fields[0]


DEFAULT_CONFIG = IndexConfig()
