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
