"""Winnowing fingerprints + containment: kernel parity with a plain-
Python reference, the SIGMOD-2003 guarantee property, containment
detection that whole-doc Jaccard misses, partition invariance, the
hot-fingerprint skew guard, and the Arrow-batched (not per-row) plan."""

from __future__ import annotations

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from whoosh_novo_spark.operators.dedup import ngram_jaccard_pairs
from whoosh_novo_spark.operators.winnow import (
    containment_pairs,
    winnow_fingerprints,
)

_M64 = (1 << 64) - 1
_B = 1099511628211


def _ref_winnow(text: str, k: int, window: int) -> set[int]:
    """Plain-Python reference: tokenise, k-gram polynomial rolling hash
    mod 2^64, rightmost-min winnowing, distinct signed-64 values."""
    import re

    toks = [t.lower() for t in re.findall(r"[\w*]+(?:\.?[\w*]+)*", text, re.ASCII)]
    n = len(toks) - k + 1
    if n <= 0:
        return set()
    th = [
        int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big") for t in toks
    ]
    h = []
    for i in range(n):
        v = 0
        for j in range(k):
            v = (v * _B + th[i + j]) & _M64
        h.append(v)
    w = min(window, n)
    sel = set()
    for i in range(n - w + 1):
        win = h[i : i + w]
        m = min(win)
        # rightmost occurrence of the minimum
        idx = w - 1 - win[::-1].index(m)
        sel.add(i + idx)
    out = set()
    for p in sel:
        v = h[p]
        out.add(v - (1 << 64) if v >= (1 << 63) else v)
    return out


def _words(rng, n):
    return " ".join(rng.choice("alpha beta gamma delta epsilon zeta eta theta iota kappa".split()) + str(rng.randrange(50)) for _ in range(n))


def test_kernel_matches_python_reference(spark):
    rng = random.Random(7)
    rows = [(i, _words(rng, rng.randrange(0, 120))) for i in range(40)]
    rows.append((100, ""))          # empty text
    rows.append((101, "one two"))   # fewer tokens than k
    rows.append((102, "a b c d e")) # exactly k tokens -> 1 k-gram
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(df, "doc_id", "text", k=5, window=4).collect():
        got.setdefault(r["id"], set()).add(r["fp"])
    for i, text in rows:
        assert got.get(i, set()) == _ref_winnow(text, 5, 4), f"doc {i}"


def test_winnowing_guarantee(spark):
    """Any shared run of >= window + k - 1 tokens yields >= 1 shared
    fingerprint (the paper's guarantee), at several offsets."""
    rng = random.Random(11)
    k, window = 5, 4
    shared = _words(rng, window + k - 1)  # exactly the guarantee length
    rows = [(0, _words(rng, 60) + " " + shared + " " + _words(rng, 60))]
    for i in range(1, 6):
        rows.append((i, _words(rng, i * 13) + " " + shared + " " + _words(rng, 7 * i)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {}
    for r in winnow_fingerprints(df, "doc_id", "text", k=k, window=window).collect():
        fps.setdefault(r["id"], set()).add(r["fp"])
    for i in range(1, 6):
        assert fps[0] & fps[i], f"doc {i} shares no fingerprint with doc 0"


def test_density_bound(spark):
    """Winnowing stores a sparse subset: ~2/(window+1) of k-gram hashes
    (expected density from the paper), far below 1 per k-gram."""
    rng = random.Random(3)
    text = _words(rng, 4000)
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    n_fp = winnow_fingerprints(df, "doc_id", "text", k=5, window=8).count()
    n_kgrams = 4000 - 5 + 1
    assert n_fp < 0.5 * n_kgrams          # strictly sparse
    assert abs(n_fp / n_kgrams - 2 / 9) < 0.08  # near the expected 2/(w+1)


def test_containment_detected_where_jaccard_fails(spark):
    """Doc 1 embeds a 60-token chunk of doc 0 inside 600 tokens of its
    own text: containment flags the pair; whole-doc 3-gram Jaccard on
    the same pair is far below any usable near-dup threshold."""
    rng = random.Random(23)
    chunk = _words(rng, 60)
    host = _words(rng, 300) + " " + chunk + " " + _words(rng, 300)
    rows = [
        (0, _words(rng, 20) + " " + chunk),  # small doc: mostly the chunk
        (1, host),                            # big doc embedding it
        (2, _words(rng, 200)),                # unrelated
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["a"], r["b"]): r["containment"]
        for r in containment_pairs(df, "doc_id", "text", tau=0.5).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] >= 0.5
    assert not any(2 in p for p in pairs)
    jac = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, "doc_id", "text", k=3, tau=0.0).collect()
    }
    assert jac.get((0, 1), 0.0) < 0.2  # whole-doc Jaccard misses it


def test_partition_invariance_and_determinism(spark):
    rng = random.Random(5)
    rows = [(i, _words(rng, 80)) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, winnow_fingerprints(df, "doc_id", "text").collect()))
    b = sorted(
        map(
            tuple,
            winnow_fingerprints(df.repartition(13, "doc_id"), "doc_id", "text").collect(),
        )
    )
    c = sorted(map(tuple, winnow_fingerprints(df.coalesce(1), "doc_id", "text").collect()))
    assert a == b == c and len(a) > 0


def test_hot_fingerprint_guard(spark):
    """A licence block shared by every doc floods the join unless
    max_fp_df drops its fingerprints; two docs that ONLY share the
    boilerplate must not pair once it is dropped."""
    rng = random.Random(9)
    boiler = _words(rng, 40)
    rows = [(i, _words(rng, 60) + " " + boiler) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    flood = containment_pairs(df, "doc_id", "text", tau=0.3, max_fp_df=None).count()
    guarded = containment_pairs(df, "doc_id", "text", tau=0.3, max_fp_df=20).count()
    assert flood >= 30 * 29 / 2 * 0.5  # boilerplate pairs most of the corpus
    assert guarded == 0
    # ...but a REAL contained chunk (unique to 2 docs) survives the guard
    chunk = _words(rng, 50)
    rows2 = rows + [(100, chunk), (101, _words(rng, 150) + " " + chunk + " " + _words(rng, 150))]
    df2 = spark.createDataFrame(rows2, "doc_id long, text string")
    kept = {
        (r["a"], r["b"])
        for r in containment_pairs(df2, "doc_id", "text", tau=0.5, max_fp_df=20).collect()
    }
    assert (100, 101) in kept


def test_plan_is_arrow_batched(spark):
    df = spark.createDataFrame([(0, "a b c d e f g")], "doc_id long, text string")
    plan = (
        winnow_fingerprints(df, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan


def test_bad_params_rejected(spark):
    from whoosh_novo_spark.operators.winnow import winnow_fingerprint_udf

    with pytest.raises(ValueError):
        winnow_fingerprint_udf(k=0)
    with pytest.raises(ValueError):
        winnow_fingerprint_udf(window=0)
