"""Connected components + cluster dedup: union-find oracle on random
graphs, long-chain convergence, partition invariance, keep-longest
survivor rule, and composition with the MinHash pair producer."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from whoosh_novo_spark.operators.components import (
    connected_components,
    dedup_by_pairs,
)


def _union_find(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    groups = {}
    for n in nodes:
        groups.setdefault(find(n), set()).add(n)
    # canonical label = min member, matching the operator's contract
    return {n: min(g) for g in groups.values() for n in g}


def test_components_vs_union_find_random(spark):
    rng = random.Random(11)
    nodes = [f"d{i:03d}" for i in range(200)]
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(150)
    ]
    edges = [(u, v) for u, v in edges if u != v]
    want = _union_find({n for e in edges for n in e}, edges)
    df = spark.createDataFrame(edges, "a string, b string")
    got = {
        r["node"]: r["component"] for r in connected_components(df).collect()
    }
    assert got == want


def test_components_long_chain_and_invariance(spark):
    # a 30-node path: worst-case diameter for hash-min propagation
    chain = [(f"n{i:02d}", f"n{i+1:02d}") for i in range(29)]
    for parts in (1, 5):
        df = spark.createDataFrame(chain, "a string, b string").repartition(parts)
        got = connected_components(df).collect()
        assert all(r["component"] == "n00" for r in got)
        assert len(got) == 30


def test_components_nonconvergence_raises(spark):
    chain = [(f"n{i:02d}", f"n{i+1:02d}") for i in range(10)]
    df = spark.createDataFrame(chain, "a string, b string")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=2)


def test_dedup_by_pairs_min_and_keep_longest(spark):
    docs = spark.createDataFrame(
        [
            ("a", "x" * 5),
            ("b", "x" * 9),
            ("c", "x" * 7),
            ("z", "untouched loner"),
        ],
        "doc_id string, text string",
    )
    pairs = spark.createDataFrame([("a", "b"), ("b", "c")], "a string, b string")
    kept = sorted(r["doc_id"] for r in dedup_by_pairs(docs, pairs).collect())
    assert kept == ["a", "z"]  # min-id survivor + untouched row

    longest = dedup_by_pairs(
        docs.withColumn("len", F.length("text")), pairs, keep_col="len"
    )
    assert sorted(r["doc_id"] for r in longest.collect()) == ["b", "z"]


def test_compose_with_minhash_pairs(spark):
    from whoosh_novo_spark.operators.dedup import minhash_dedup_pairs

    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest before nightfall arrives"
    )
    rows = (
        [(f"g1_{i}", base + f" tail{i}") for i in range(3)]
        + [(f"g2_{i}", base.upper().lower()[::-1] + f" t{i}") for i in range(2)]
        + [("solo", "completely different text about quantum chromodynamics")]
    )
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    pairs = minhash_dedup_pairs(docs, tau=0.5)
    out = dedup_by_pairs(docs, pairs)
    ids = sorted(r["doc_id"] for r in out.collect())
    # each near-dup family collapses to its min id; unique docs survive
    assert "g1_0" in ids and "solo" in ids
    assert not any(i in ids for i in ("g1_1", "g1_2"))
    assert len([i for i in ids if i.startswith("g2_")]) == 1
