"""Duplicate-cluster resolution: connected components over near-dup
pairs, and keep-one-representative dedup.

Every pair producer in this engine (``dedup.minhash_dedup_pairs``,
``dedup.simhash_near_pairs``, ``dedup.ngram_jaccard_pairs``,
``similarity.embedding_near_dup_pairs``) stops at PAIRS.  The published
pipelines' next step is always the same: treat pairs as edges, find
connected components (duplicate clusters are transitive: A~B, B~C means
A,B,C are one document family even when A~C missed the similarity
cut), keep one representative per component.

Algorithm: hash-min label propagation — every node's label starts as
itself and each round becomes the min of its own and its neighbors'
labels; fixed point = min node id per component.  Rounds needed =
graph diameter.  Near-dup graphs are unions of near-cliques (an LSH
bucket emits most of its pairs), so real corpora converge in 2-4
rounds; the pathological long-chain case is a test below, and
``max_iter`` bounds the worst case loudly rather than silently.

Scale notes (100 TB lens): one round = one join of the label table
(row per node) with the symmetric edge table (row per edge) + a
map-side-combinable min aggregation — a hot node (boilerplate doc in
millions of pairs) is a combinable min key, never a collect_list.
The edge table is normalized+persisted once; labels are
``localCheckpoint``ed per round (lineage truncation, same rationale as
``linkgraph.pagerank``); convergence is one scalar count per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a: str = "a",
    b: str = "b",
    max_iter: int = 50,
) -> DataFrame:
    """(id, component) for every node appearing in ``pairs``; the
    component label is the component's minimum node id (deterministic,
    partitioning-independent).  Raises after ``max_iter`` rounds
    without convergence — a duplicate graph that deep means the pair
    threshold is broken, not that more iterations are wanted."""
    e = (
        pairs.select(F.col(a).alias("u"), F.col(b).alias("v"))
        .where(F.col("u").isNotNull() & F.col("v").isNotNull())
        .where(F.col("u") != F.col("v"))
    )
    edges = (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .persist()
    )
    edges.count()  # materialize once; reused every round

    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neigh = (
            labels.join(edges, labels.node == edges.u)
            .groupBy(F.col("v").alias("node"))
            .agg(F.min("label").alias("nl"))
        )
        new_labels = (
            labels.join(neigh, "node", "left")
            .select("node", F.least("label", "nl").alias("label"))
            # lazy: the changed-count job below materializes it, so each
            # round is ONE job, not two (barrier floor, §0r5lg2)
            .localCheckpoint(eager=False)
        )
        changed = (
            labels.withColumnRenamed("label", "l0")
            .join(new_labels, "node")
            .where(F.col("label") != F.col("l0"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            edges.unpersist()
            return labels.withColumnRenamed("label", "component")
    edges.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "the pair graph has a path deeper than max_iter (raise it, or "
        "tighten the near-dup threshold that produced these pairs)"
    )


def dedup_by_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a: str = "a",
    b: str = "b",
    keep_col: str | None = None,
    max_iter: int = 50,
) -> DataFrame:
    """One representative per duplicate cluster: rows of ``docs`` whose
    id is its component's surviving member, plus every row in no pair
    at all (untouched — the overwhelmingly common case).

    Default survivor is the minimum id (deterministic).  With
    ``keep_col`` the survivor is instead the member maximizing
    ``(keep_col, id desc)`` — e.g. keep the LONGEST of a near-dup
    family (``F.length`` precomputed into a column) or the newest
    capture.  One combinable max-struct aggregation per component, the
    same skew-proof shape as ``dedup.keep_latest_crawl``.
    """
    comp = connected_components(pairs, a=a, b=b, max_iter=max_iter)
    if keep_col is None:
        survivors = comp.where(F.col("node") == F.col("component")).select(
            F.col("node").alias(id_col)
        )
    else:
        members = comp.join(
            docs.select(F.col(id_col).alias("node"), F.col(keep_col).alias("_k")),
            "node",
        )
        survivors = (
            members.groupBy("component")
            .agg(F.max(F.struct(F.col("_k"), F.col("node"))).alias("_pick"))
            .select(F.col("_pick.node").alias(id_col))
        )
    losers = comp.select(F.col("node").alias(id_col)).join(
        survivors, id_col, "left_anti"
    )
    return docs.join(losers, id_col, "left_anti")
