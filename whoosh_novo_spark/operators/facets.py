"""Faceting / grouping / collapsing over search results.

Reference: ``whoosh.sorting`` FacetTypes (FieldFacet sorting.py:158,
QueryFacet :397, RangeFacet :446, DateRangeFacet :527, FunctionFacet :588,
MultiFacet :743) + facet maps (OrderedList :981, UnorderedList :1005,
Count :1028, Best :1048) and the FacetCollector (collectors.py:764-852)
and CollapseCollector (collectors.py:854+).

Spark shape: a facet is just a grouping expression over the scored result
set joined to stored fields; the facet maps are groupBy aggregates:
Count -> count(*), OrderedList -> sort_array(collect_list(...)),
Best -> max_by, collapse -> row_number window.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from whoosh_novo_spark.plans import ast


def field_facet(results: DataFrame, docs: DataFrame, key: str, id_col: str = "docid") -> DataFrame:
    """Attach the facet key column to scored results (FieldFacet)."""
    return results.join(docs.select(F.col(id_col).alias("docid"), key), "docid")


def range_facet(col: Column, start: float, end: float, gap: float) -> Column:
    """RangeFacet (sorting.py:446): bucket = start + gap*floor((x-start)/gap),
    clamped to [start, end); out-of-range -> NULL (missing)."""
    bucket = F.lit(start) + F.lit(gap) * F.floor((col - F.lit(start)) / F.lit(gap))
    return F.when((col >= start) & (col < end), bucket)


def date_range_facet(col: Column, start, end, gap_seconds: int) -> Column:
    """DateRangeFacet (sorting.py:527): like RangeFacet over timestamps."""
    s = F.lit(start).cast("timestamp").cast("double")
    e = F.lit(end).cast("timestamp").cast("double")
    x = col.cast("timestamp").cast("double")
    bucket = s + F.lit(gap_seconds) * F.floor((x - s) / F.lit(gap_seconds))
    return F.when((x >= s) & (x < e), bucket.cast("timestamp"))


# --- facet specs (sorting.py:158-785) -------------------------------
#
# A facet spec turns the (results ⋈ stored-fields) DataFrame into one or
# more key columns.  ``attach_facet`` is the FacetColumn/Categorizer
# equivalent: it joins stored fields when needed and adds a ``facet``
# column (exploded for allow_overlap), after which the facet maps below
# (count / ordered list / best) are plain groupBy aggregates.


class FieldFacet:
    """sorting.py:158: key = the doc's field value; ``reverse`` flips the
    sort direction when used in sortedby."""

    def __init__(self, fieldname: str, reverse: bool = False):
        self.fieldname = fieldname
        self.reverse = reverse

    needs_docs = True
    overlap = False

    def key_col(self, df: DataFrame | None = None) -> Column:
        return F.col(self.fieldname)

    def sort_exprs(self, df: DataFrame | None = None) -> list:
        k = self.key_col(df)
        return [F.desc(k) if self.reverse else F.asc(k)]


class ScoreFacet:
    """sorting.py:555: key = 0 - score (higher scores sort first)."""

    needs_docs = False
    overlap = False
    reverse = False

    def key_col(self, df: DataFrame | None = None) -> Column:
        return F.lit(0.0) - F.col("score")

    def sort_exprs(self, df: DataFrame | None = None) -> list:
        return [F.asc(self.key_col(df))]


class FunctionFacet:
    """sorting.py:588: arbitrary key function.  The reference calls
    ``fn(searcher, docid)`` per hit; the vectorized equivalent is either
    a plain Column or a Column-builder ``fn(df) -> Column`` over the
    results+stored-fields frame (docid, score and every stored column are
    in scope; ``df`` is that joined DataFrame)."""

    def __init__(self, fn, reverse: bool = False):
        self.fn = fn
        self.reverse = reverse

    needs_docs = True
    overlap = False

    def key_col(self, df: DataFrame | None = None) -> Column:
        return self.fn(df) if callable(self.fn) else self.fn

    def sort_exprs(self, df: DataFrame | None = None) -> list:
        k = self.key_col(df)
        return [F.desc(k) if self.reverse else F.asc(k)]


class TranslateFacet:
    """sorting.py:626-680: wrap one or more facets and transform their
    keys with ``fn(*keys)`` before grouping/sorting — e.g. a collation
    key for language-aware ordering.  ``fn`` is vectorized:
    Column(s) -> Column (use ``F.udf``-wrapped callables only when no
    builtin expression exists).

    Overlap children: the reference's TranslateCategorizer calls
    ``key_for`` — never ``keys_for`` (sorting.py:678-680 vs :739-741) —
    so a wrapped overlap facet contributes its UN-SPLIT scalar value and
    the translated facet never overlaps.  We mirror that via the child's
    ``scalar_key_col`` (r3 ADVICE: the old fn(explode(...)) was an
    invalid nested generator AND wrong semantics)."""

    def __init__(self, fn, *facets, reverse: bool | None = None):
        if not facets:
            raise TypeError("TranslateFacet needs at least one facet")
        self.fn = fn
        self.facets = facets
        self.facet = facets[0]
        self.reverse = facets[0].reverse if reverse is None else reverse

    @property
    def needs_docs(self) -> bool:
        return any(f.needs_docs for f in self.facets)

    overlap = False  # key_for semantics: see class docstring

    @staticmethod
    def _scalar_key(facet, df) -> Column:
        getter = getattr(facet, "scalar_key_col", None)
        return getter(df) if getter is not None else facet.key_col(df)

    def key_col(self, df: DataFrame | None = None) -> Column:
        return self.fn(*[self._scalar_key(f, df) for f in self.facets])

    def sort_exprs(self, df: DataFrame | None = None) -> list:
        k = self.key_col(df)
        return [F.desc(k) if self.reverse else F.asc(k)]


class StoredFieldFacet:
    """sorting.py:683: key(s) from a stored field; ``allow_overlap``
    splits the value (default whitespace) and a doc lands in every group
    (keys_for), exactly what an explode models."""

    def __init__(self, fieldname: str, allow_overlap: bool = False, sep: str = " "):
        self.fieldname = fieldname
        self.allow_overlap = allow_overlap
        self.sep = sep
        self.reverse = False

    needs_docs = True

    @property
    def overlap(self) -> bool:
        return self.allow_overlap

    def key_col(self, df: DataFrame | None = None) -> Column:
        if self.allow_overlap:
            # exploded by attach_facet; element column
            return F.explode(F.split(F.col(self.fieldname), re.escape(self.sep)))
        return F.col(self.fieldname)

    def scalar_key_col(self, df: DataFrame | None = None) -> Column:
        """key_for (singular) view: the un-split stored value — what the
        reference hands a TranslateCategorizer (sorting.py:739-741)."""
        return F.col(self.fieldname)

    def sort_exprs(self, df: DataFrame | None = None) -> list:
        return [F.asc(F.col(self.fieldname))]


class MultiFacet:
    """sorting.py:743: composite key = tuple of sub-facets (struct column);
    sortedby uses each component's own direction."""

    def __init__(self, items: list):
        self.facets = [
            FieldFacet(it) if isinstance(it, str) else it for it in items
        ]
        self.reverse = False

    @property
    def needs_docs(self) -> bool:
        return any(f.needs_docs for f in self.facets)

    overlap = False

    def key_col(self, df: DataFrame | None = None) -> Column:
        return F.struct(
            *[f.key_col(df).alias(f"k{i}") for i, f in enumerate(self.facets)]
        )

    def sort_exprs(self, df: DataFrame | None = None) -> list:
        return [e for f in self.facets for e in f.sort_exprs(df)]


def attach_facet(
    results: DataFrame,
    spec,
    docs: DataFrame | None = None,
    id_col: str = "docid",
    out: str = "facet",
) -> DataFrame:
    """Join stored fields if the spec needs them and add the key column
    (one row per (doc, key) — overlap facets explode)."""
    df = results
    if spec.needs_docs:
        if docs is None:
            raise ValueError("facet spec needs a stored-fields DataFrame")
        df = results.join(
            docs.withColumnRenamed(id_col, "docid") if id_col != "docid" else docs,
            "docid",
        )
    return df.select("docid", "score", spec.key_col(df).alias(out))


def sort_by_facet(
    searcher,
    q: ast.Query,
    spec,
    docs: DataFrame | None = None,
    limit: int | None = 10,
    id_col: str = "docid",
) -> DataFrame:
    """search(sortedby=facet): order hits by the facet key(s) (each with
    its own direction), ties by docid asc (collectors.py:536-583)."""
    scored = searcher.score_df(q.normalize())
    df = scored
    if spec.needs_docs:
        if docs is None:
            raise ValueError("facet spec needs a stored-fields DataFrame")
        df = scored.join(
            docs.withColumnRenamed(id_col, "docid") if id_col != "docid" else docs,
            "docid",
        )
    out = df.orderBy(*spec.sort_exprs(df), F.asc("docid")).select("docid", "score")
    return out.limit(limit) if limit is not None else out


def query_facet(searcher, facets: dict[str, ast.Query]) -> DataFrame:
    """QueryFacet (sorting.py:397): each named query defines a group;
    returns (docid, facet) rows (a doc may belong to several groups)."""
    parts = []
    for name, q in facets.items():
        ids = searcher.score_df(q.normalize()).select("docid")
        parts.append(ids.withColumn("facet", F.lit(name)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --- facet maps (sorting.py:981-1078) ---

def facet_count(faceted: DataFrame, key: str = "facet") -> DataFrame:
    return faceted.groupBy(key).agg(F.count(F.lit(1)).alias("n"))


def facet_ordered_list(faceted: DataFrame, key: str = "facet") -> DataFrame:
    """OrderedList: docids per group ordered by (score desc, docid asc)."""
    return (
        faceted.groupBy(key)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct((-F.col("score")).alias("ns"), F.col("docid")))
                ),
                lambda s: s["docid"],
            ).alias("docids")
        )
    )


def facet_best(faceted: DataFrame, key: str = "facet") -> DataFrame:
    """Best: highest-scoring doc per group (ties -> lowest docid)."""
    return (
        faceted.groupBy(key)
        .agg(
            F.min(F.struct((-F.col("score")).alias("ns"), F.col("docid"))).alias("_b")
        )
        .select(key, F.col("_b.docid").alias("docid"), (-F.col("_b.ns")).alias("score"))
    )


def collapse(
    results: DataFrame,
    docs: DataFrame,
    key: str,
    limit_per_key: int = 1,
    id_col: str = "docid",
) -> DataFrame:
    """CollapseCollector (collectors.py:854+): keep the best N docs per
    collapse key, ordered inside each key by (score desc, docid asc)."""
    j = field_facet(results, docs, key, id_col)
    w = Window.partitionBy(key).orderBy(F.desc("score"), F.asc("docid"))
    return j.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") <= limit_per_key
    ).drop("_rn")
