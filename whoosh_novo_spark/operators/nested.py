"""Nested (parent/child) queries over doc-block layouts.

Reference: ``whoosh.query.nested`` — documents indexed in "groups" where a
parent doc is immediately followed by its children in docid order.
``NestedParent`` (nested.py:33-207): for each doc matched by the sub-query,
act as if the nearest preceding parent matched; parent score =
``score_fn`` (default sum) over its matching sub-docs, with an optional
``per_parent_limit`` on how many sub-docs are counted (in docid order).
``NestedChildren`` (nested.py:209-280): matches the child docs of parents
matched by the wanted-parents query; score = boost.

Spark shape: the "previous set bit in the parent bitset" becomes a
searchsorted against the (broadcast) sorted parent-docid array inside an
Arrow kernel — parents are typically a small fraction of the corpus.  For
corpora where even parents don't fit a broadcast, the same assignment is
expressible as a range join on parent intervals; the kernel keeps the
common case cheap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from whoosh_novo_spark.plans import ast

_SCORE_FNS = {
    "sum": np.sum,
    "max": np.max,
    "min": np.min,
    "avg": np.mean,
    "mean": np.mean,
}


def _parent_ids(searcher, parents) -> np.ndarray:
    if isinstance(parents, ast.Query):
        rows = searcher.score_df(parents.normalize()).select("docid").collect()
        ids = np.array(sorted(r["docid"] for r in rows), dtype=np.int64)
    else:  # DataFrame of docids
        ids = np.array(
            sorted(r["docid"] for r in parents.select("docid").collect()),
            dtype=np.int64,
        )
    return ids


def _attach_parent(df: DataFrame, parent_ids: np.ndarray) -> DataFrame:
    """Add a ``parent`` column = nearest parent docid <= docid."""

    def kernel(batches):
        for pdf in batches:
            d = pdf["docid"].to_numpy(dtype=np.int64)
            pos = np.searchsorted(parent_ids, d, side="right") - 1
            parent = np.where(pos >= 0, parent_ids[np.maximum(pos, 0)], -1)
            out = pdf.copy()
            out["parent"] = parent
            yield out

    from pyspark.sql import types as T

    schema = T.StructType(
        list(df.schema.fields) + [T.StructField("parent", T.LongType())]
    )
    return df.mapInPandas(kernel, schema)


def nested_parent(
    searcher,
    parents,
    subq: ast.Query,
    per_parent_limit: int | None = None,
    score_fn: str = "sum",
    limit: int | None = 10,
) -> DataFrame:
    """NestedParent: (parent docid, combined score), ordered like search."""
    pids = _parent_ids(searcher, parents)
    spark = searcher.index.spark
    if len(pids) == 0:
        return spark.createDataFrame([], "docid long, score double")
    matches = searcher.score_df(subq.normalize())
    withp = _attach_parent(matches, pids).where(F.col("parent") >= 0)
    if per_parent_limit is not None:
        w = Window.partitionBy("parent").orderBy(F.asc("docid"))
        withp = withp.withColumn("_rn", F.row_number().over(w)).where(
            F.col("_rn") <= per_parent_limit
        )
    agg = {
        "sum": F.sum("score"),
        "max": F.max("score"),
        "min": F.min("score"),
        "avg": F.avg("score"),
        "mean": F.avg("score"),
    }[score_fn]
    out = (
        withp.groupBy("parent")
        .agg(agg.alias("score"))
        .select(F.col("parent").alias("docid"), "score")
        .orderBy(F.desc("score"), F.asc("docid"))
    )
    return out.limit(limit) if limit is not None else out


def nested_children(
    searcher,
    all_parents,
    wanted_parents: ast.Query,
    boost: float = 1.0,
    limit: int | None = None,
) -> DataFrame:
    """NestedChildren: child docs whose block parent matches
    ``wanted_parents``; score = boost (nested.py:261-300)."""
    pids = _parent_ids(searcher, all_parents)
    spark = searcher.index.spark
    if len(pids) == 0:
        return spark.createDataFrame([], "docid long, score double")
    wanted = {
        r["docid"]
        for r in searcher.score_df(wanted_parents.normalize()).select("docid").collect()
    }
    wanted &= set(pids.tolist())
    alldocs = searcher.index.docmap(columns=["docid"])
    withp = _attach_parent(alldocs, pids)
    w_list = sorted(wanted)
    out = (
        withp.where(
            (F.col("parent") >= 0)
            & F.col("parent").isin(w_list)
            & (F.col("docid") != F.col("parent"))  # children only
        )
        .select("docid", F.lit(float(boost)).alias("score"))
        .orderBy(F.asc("docid"))
    )
    return out.limit(limit) if limit is not None else out
