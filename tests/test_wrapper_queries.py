"""ConstantScoreQuery / WeightingQuery / Otherwise / Sequence parity vs
the reference engine (wrappers.py:147-214, compound.py:578-590,
positional.py:36-132) on a single-segment index (where the reference's
per-segment Otherwise choice coincides with our global one)."""

from __future__ import annotations

import pytest

from whoosh_novo_spark.operators.query import Searcher
from whoosh_novo_spark.plans import ast


@pytest.fixture(scope="module")
def corpus_rows():
    return [
        ("000000", "alpha beta gamma delta"),
        ("000001", "beta gamma alpha"),
        ("000002", "gamma delta epsilon zeta"),
        ("000003", "alpha alpha beta"),
        ("000004", "delta epsilon"),
        ("000005", "zeta eta theta alpha"),
        ("000006", "beta delta gamma beta"),
        ("000007", "epsilon gamma beta alpha delta"),
    ]


@pytest.fixture(scope="module")
def pair(spark, tmp_path_factory, oracle_cls, corpus_rows):
    """(our Searcher, reference WhooshOracle) over the same rows."""
    from whoosh_novo_spark.operators.build import build_segment
    from whoosh_novo_spark.operators.query import Index
    from whoosh_novo_spark.schema import FieldConfig, IndexConfig
    from whoosh_novo_spark.sources.segment_store import SegmentStore

    cfg = IndexConfig(id_col="uid", fields=(FieldConfig("text", positions=True),))
    store = SegmentStore(str(tmp_path_factory.mktemp("wrap_ix")))
    docs = spark.createDataFrame(corpus_rows, "uid string, text string")
    build_segment(spark, docs, cfg, store, partitions=2)
    ix = Index(spark, store, cfg)
    docid_to_uid = {
        r["docid"]: r["uid"] for r in ix.docmap(columns=["docid", "uid"]).collect()
    }
    return Searcher(ix), oracle_cls(corpus_rows), docid_to_uid


def _ours(s, uid_of, q, limit=None):
    return [
        (uid_of[r["docid"]], round(float(r["score"]), 9))
        for r in s.search(q, limit=limit).collect()
    ]


def _theirs(oracle, wq, limit=None):
    return [(d, round(float(sc), 9)) for d, sc in oracle.query(wq, limit=limit)]


def test_constant_score_parity(pair, whoosh_ref):
    import whoosh.query as wq

    s, oracle, uid_of = pair
    ours = _ours(
        s,
        uid_of,
        ast.ConstantScoreQuery(
            ast.Or((ast.Term("text", "alpha"), ast.Term("text", "zeta"))), score=2.5
        ),
    )
    theirs = _theirs(
        oracle,
        wq.ConstantScoreQuery(
            wq.Or([wq.Term("text", "alpha"), wq.Term("text", "zeta")]), score=2.5
        ),
    )
    assert sorted(ours) == sorted(theirs) and ours


def test_weighting_query_parity(pair, whoosh_ref):
    """The reference's WeightingQuery is a NO-OP (COVERAGE.md reference
    bug #7: matcher() calls context.set(weighting=...) but the Term
    matcher chain never consults it — its results equal a plain BM25
    search).  Parity is therefore against the DOCUMENTED semantics: a
    searcher opened with that weighting."""
    import whoosh.query as wq
    from whoosh.scoring import TF_IDF as RefTFIDF

    from whoosh_novo_spark.plans.weighting import TF_IDF

    s, oracle, uid_of = pair
    ours = _ours(
        s, uid_of, ast.WeightingQuery(ast.Term("text", "beta"), TF_IDF())
    )
    theirs = [
        (d, round(float(sc), 9))
        for d, sc in oracle.query(
            wq.Term("text", "beta"), limit=None, weighting=RefTFIDF()
        )
    ]
    assert sorted(ours) == sorted(theirs) and ours
    # and the reference's actual (buggy) behavior is NOT what we match
    noop = _theirs(oracle, wq.WeightingQuery(wq.Term("text", "beta"), RefTFIDF()))
    plain = _theirs(oracle, wq.Term("text", "beta"))
    assert sorted(noop) == sorted(plain)


@pytest.mark.parametrize("first_matches", [True, False])
def test_otherwise_parity(pair, whoosh_ref, first_matches):
    import whoosh.query as wq

    s, oracle, uid_of = pair
    a_word = "gamma" if first_matches else "nosuchword"
    ours = _ours(
        s, uid_of, ast.Otherwise(ast.Term("text", a_word), ast.Term("text", "zeta"))
    )
    theirs = _theirs(
        oracle, wq.Otherwise(wq.Term("text", a_word), wq.Term("text", "zeta"))
    )
    assert sorted(ours) == sorted(theirs) and ours


@pytest.mark.parametrize(
    "words,slop,ordered",
    [
        (("beta", "gamma"), 1, True),
        (("gamma", "beta"), 1, True),
        (("beta", "gamma"), 2, True),
        (("alpha", "beta", "gamma"), 2, True),
    ],
)
def test_sequence_parity(pair, whoosh_ref, words, slop, ordered):
    import whoosh.query as wq

    s, oracle, uid_of = pair
    ours = _ours(
        s,
        uid_of,
        ast.Sequence(tuple(ast.Term("text", w) for w in words), slop=slop, ordered=ordered),
    )
    theirs = _theirs(
        oracle,
        wq.Sequence([wq.Term("text", w) for w in words], slop=slop, ordered=ordered),
    )
    assert sorted(ours) == sorted(theirs)


def test_unknown_field_matches_nothing(pair):
    """A field the schema doesn't declare has no terms: every query shape
    on it matches nothing (the reference's TermNotFound empty matcher),
    never raises — e.g. copy_fields/alias configs naming absent fields."""
    s, _oracle, _uid = pair
    shapes = [
        ast.Term("nosuch", "alpha"),
        ast.Prefix("nosuch", "al"),
        ast.FuzzyTerm("nosuch", "alpha"),
        ast.Phrase("nosuch", ("alpha", "beta")),
        ast.And((ast.Term("nosuch", "alpha"), ast.Term("text", "alpha"))),
    ]
    for q in shapes:
        assert s.search(q, limit=5).collect() == [], q
    hits = s.search(
        ast.Or((ast.Term("nosuch", "alpha"), ast.Term("text", "alpha"))), limit=5
    ).collect()
    assert hits  # the known side still matches


def test_ordered_any_distance_parity(pair, whoosh_ref):
    """Ordered == reference Ordered (positional.py:123-132 -> SpanBefore):
    subqueries in document order at ANY distance (no slop bound) — e.g.
    'alpha ... delta' three words apart must match."""
    import whoosh.query as wq

    s, oracle, uid_of = pair
    ours = _ours(
        s, uid_of, ast.Ordered((ast.Term("text", "alpha"), ast.Term("text", "delta")))
    )
    theirs = _theirs(
        oracle, wq.Ordered([wq.Term("text", "alpha"), wq.Term("text", "delta")])
    )
    assert sorted(ours) == sorted(theirs) and ours
    # and it is strictly wider than the slop-1 Sequence
    seq = _ours(
        s, uid_of, ast.Sequence((ast.Term("text", "alpha"), ast.Term("text", "delta")))
    )
    assert set(d for d, _ in seq) < set(d for d, _ in ours)


def test_duplicate_term_different_boosts_parity(pair, whoosh_ref):
    """'a^2 a^3' survives dedup as two children; the single-scan flat
    path can't represent two matchers over one posting row, so it must
    fall back to per-child compile — parity vs the reference."""
    import whoosh.query as wq

    s, oracle, uid_of = pair
    q = ast.And((ast.Term("text", "beta", boost=2.0), ast.Term("text", "beta", boost=3.0)))
    ours = _ours(s, uid_of, q)
    theirs = _theirs(
        oracle, wq.And([wq.Term("text", "beta", boost=2.0), wq.Term("text", "beta", boost=3.0)])
    )
    assert sorted(ours) == sorted(theirs) and ours


def test_otherwise_per_segment_parity(spark, tmp_path, whoosh_ref):
    """Multi-segment Otherwise chooses a-vs-b PER SEGMENT like the
    reference (compound.py:578-590): a segment without any 'a' posting
    falls back to 'b' THERE, while segments where 'a' is active use 'a'
    (r3 deviation #9 closed).  Oracle: a real two-segment whoosh index
    (commit(merge=False))."""
    import whoosh.query as wq
    from whoosh import fields
    from whoosh.analysis import StandardAnalyzer
    from whoosh.filedb.filestore import RamStorage

    from whoosh_novo_spark.operators.build import build_segment
    from whoosh_novo_spark.operators.query import Index
    from whoosh_novo_spark.schema import FieldConfig, IndexConfig
    from whoosh_novo_spark.sources.segment_store import SegmentStore

    # batch 1: zeta only; batch 2: gamma and zeta
    batch1 = [("a0", "zeta alpha"), ("a1", "zeta beta"), ("a2", "delta")]
    batch2 = [("b0", "gamma zeta"), ("b1", "gamma delta"), ("b2", "zeta")]

    cfg = IndexConfig(id_col="uid", fields=(FieldConfig("text"),))
    store = SegmentStore(str(tmp_path / "oth_ix"))
    for batch in (batch1, batch2):
        df = spark.createDataFrame(batch, "uid string, text string")
        build_segment(spark, df, cfg, store, partitions=1)
    ix = Index(spark, store, cfg)
    assert len(ix.manifest.segments) == 2
    s = Searcher(ix)
    uid_of = {
        r["docid"]: r["uid"] for r in ix.docmap(columns=["docid", "uid"]).collect()
    }

    schema = fields.Schema(
        uid=fields.ID(stored=True), text=fields.TEXT(analyzer=StandardAnalyzer())
    )
    wix = RamStorage().create_index(schema)
    for batch in (batch1, batch2):
        w = wix.writer()
        for uid, text in batch:
            w.add_document(uid=uid, text=text)
        w.commit(merge=False)
    with wix.searcher() as ws:
        assert len(ws.reader().leaf_readers()) == 2
        theirs = sorted(
            (h["uid"], round(h.score, 9))
            for h in ws.search(
                wq.Otherwise(wq.Term("text", "gamma"), wq.Term("text", "zeta")),
                limit=None,
            )
        )
    ours = sorted(
        (uid_of[r["docid"]], round(float(r["score"]), 9))
        for r in s.search(
            ast.Otherwise(ast.Term("text", "gamma"), ast.Term("text", "zeta")),
            limit=None,
        ).collect()
    )
    # segment 1 contributes its zeta docs (no gamma there), segment 2
    # contributes only gamma docs
    assert [u for u, _ in ours] == ["a0", "a1", "b0", "b1"]
    assert ours == theirs
