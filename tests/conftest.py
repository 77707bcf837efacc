"""Shared fixtures: one local SparkSession, and the reference engine
(whoosh-novo at /root/reference, pure Python) imported as a *test oracle*.

The reference is never imported by the engine itself — only tests use it,
to assert token-stream and rank/score identity.
"""

from __future__ import annotations

import functools
import os
import sys
import types

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from whoosh_novo_spark.session import get_spark

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    s = get_spark("whoosh-novo-spark-tests", cores=cores, shuffle_partitions=8)
    yield s
    s.stop()


def _load_reference():
    """Import whoosh-novo from /root/reference/src (test oracle only).

    The reference depends on the `cached_property` backport package; on
    py>=3.8 functools.cached_property is equivalent, so shim it.
    """
    if "cached_property" not in sys.modules:
        m = types.ModuleType("cached_property")
        m.cached_property = functools.cached_property
        sys.modules["cached_property"] = m
    ref = "/root/reference/src"
    if ref not in sys.path:
        sys.path.insert(0, ref)
    import whoosh  # noqa: F401

    return whoosh


@pytest.fixture(scope="session")
def whoosh_ref():
    try:
        return _load_reference()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference whoosh-novo unavailable: {e}")


class WhooshOracle:
    """Builds a RamStorage whoosh index over (id, text) rows and runs
    queries, returning [(id, score), ...] rank lists."""

    def __init__(self, rows: list[tuple[str, str]], batches: int = 1):
        """``batches > 1`` commits the rows in that many separate writer
        commits, producing a multi-segment index (whoosh MERGE_SMALL may
        still fold them; pass merge=False per batch to keep them apart)."""
        _load_reference()
        from whoosh import fields
        from whoosh.analysis import StandardAnalyzer
        from whoosh.filedb.filestore import RamStorage

        schema = fields.Schema(
            id=fields.ID(stored=True),
            text=fields.TEXT(analyzer=StandardAnalyzer(), phrase=True),
        )
        self.ix = RamStorage().create_index(schema)
        per = max(1, len(rows) // batches)
        chunks = [rows[i : i + per] for i in range(0, len(rows), per)]
        for chunk in chunks:
            w = self.ix.writer()
            for rid, text in chunk:
                w.add_document(id=rid, text=text)
            w.commit(merge=False)

    def query(self, q, limit=10, optimize=True, weighting=None):
        kw = {"weighting": weighting} if weighting is not None else {}
        with self.ix.searcher(**kw) as s:
            res = s.search(q, limit=limit, optimize=optimize)
            return [(hit["id"], hit.score) for hit in res]

    def make_query(self, spec: dict):
        """spec: {"type": "term"|"and"|"or"|..., "terms": [...]}"""
        from whoosh import query as wq

        t = spec["type"]
        terms = [wq.Term("text", w) for w in spec.get("terms", [])]
        if t == "term":
            return terms[0]
        if t == "and":
            return wq.And(terms)
        if t == "or":
            return wq.Or(terms)
        if t == "andnot":
            return wq.AndNot(terms[0], terms[1])
        if t == "andmaybe":
            return wq.AndMaybe(terms[0], terms[1])
        if t == "dismax":
            return wq.DisjunctionMax(terms)
        if t == "require":
            return wq.Require(terms[0], terms[1])
        if t == "phrase":
            return wq.Phrase("text", list(spec["words"]), slop=spec.get("slop", 1))
        if t == "prefix":
            return wq.Prefix("text", spec["text"])
        if t == "wildcard":
            return wq.Wildcard("text", spec["text"])
        if t == "fuzzy":
            return wq.FuzzyTerm(
                "text", spec["text"], maxdist=spec.get("maxdist", 1),
                prefixlength=spec.get("prefixlength", 1),
            )
        if t == "range":
            return wq.TermRange(
                "text", spec.get("start"), spec.get("end"),
                startexcl=spec.get("startexcl", False),
                endexcl=spec.get("endexcl", False),
            )
        raise ValueError(t)


@pytest.fixture(scope="session")
def oracle_cls(whoosh_ref):
    return WhooshOracle
