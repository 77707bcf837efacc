"""ScoreFacet / FunctionFacet / StoredFieldFacet / MultiFacet parity with
the reference's sorting.py (VERDICT r1 item 5), on the sortedby/groupedby
patterns of reference tests/test_sorting.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whoosh_novo_spark.operators.build import build_segment
from whoosh_novo_spark.operators.facets import (
    FieldFacet,
    FunctionFacet,
    MultiFacet,
    ScoreFacet,
    StoredFieldFacet,
    attach_facet,
    facet_count,
    facet_ordered_list,
    sort_by_facet,
)
from whoosh_novo_spark.operators.query import Index, Searcher
from whoosh_novo_spark.plans import ast
from whoosh_novo_spark.schema import FieldConfig, IndexConfig
from whoosh_novo_spark.sources.segment_store import SegmentStore

ROWS = [
    # (id, tag, tags, text)
    ("0000", "b", "red green", "render shade alpha alpha"),
    ("0001", "a", "green", "render beta"),
    ("0002", "c", "blue red", "shade render render gamma"),
    ("0003", "a", "red", "render delta delta delta"),
    ("0004", "b", "blue green red", "shade epsilon render"),
    ("0005", "c", "green blue", "render zeta render"),
    ("0006", "a", "red blue", "eta render shade"),
]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    cfg = IndexConfig(
        id_col="rid",
        fields=(FieldConfig("text"), FieldConfig("tag", analyzer="id", scorable=False)),
    )
    store = SegmentStore(str(tmp_path_factory.mktemp("facet_ix")))
    df = spark.createDataFrame(ROWS, "rid string, tag string, tags string, text string")
    build_segment(spark, df, cfg, store, partitions=2)
    ix = Index(spark, store, cfg)
    return ix, Searcher(ix)


@pytest.fixture(scope="module")
def f_oracle(whoosh_ref):
    from whoosh import fields
    from whoosh.analysis import StandardAnalyzer
    from whoosh.filedb.filestore import RamStorage

    schema = fields.Schema(
        rid=fields.ID(stored=True),
        tag=fields.ID(stored=True),
        tags=fields.STORED(),
        text=fields.TEXT(analyzer=StandardAnalyzer()),
    )
    ix = RamStorage().create_index(schema)
    with ix.writer() as w:
        for rid, tag, tags, text in ROWS:
            w.add_document(rid=rid, tag=tag, tags=tags, text=text)
    return ix


def _docs(spark):
    return spark.createDataFrame(ROWS, "rid string, tag string, tags string, text string")


def _docid_map(searcher):
    rows = searcher.index.docmap(columns=["docid", "rid"]).collect()
    return {r["docid"]: r["rid"] for r in rows}


def test_multifacet_field_then_score(built, f_oracle, spark):
    """sortedby=MultiFacet([tag, ScoreFacet()]) — reference pattern from
    sorting.py:555 docstring."""
    from whoosh import query as wq
    from whoosh import sorting as ws

    ix, s = built
    with f_oracle.searcher() as os_:
        facet = ws.MultiFacet(["tag", ws.ScoreFacet()])
        ref = [
            hit["rid"]
            for hit in os_.search(wq.Term("text", "render"), sortedby=facet, limit=None)
        ]
    docs = _docs(spark).select(F.col("rid"), "tag", "tags")
    dm = searcher_docs = s.index.docmap(columns=["docid", "rid", "tag", "tags"])
    got_rows = sort_by_facet(
        s,
        ast.Term("text", "render"),
        MultiFacet([FieldFacet("tag"), ScoreFacet()]),
        docs=dm,
        limit=None,
    ).collect()
    m = _docid_map(s)
    got = [m[r["docid"]] for r in got_rows]
    assert got == ref


def test_stored_field_facet_overlap_groups(built, f_oracle):
    """groupedby=StoredFieldFacet('tags', allow_overlap=True): a doc lands
    in every whitespace-separated group (sorting.py:683 keys_for)."""
    from whoosh import query as wq
    from whoosh import sorting as ws

    ix, s = built
    with f_oracle.searcher() as os_:
        facet = ws.StoredFieldFacet("tags", allow_overlap=True)
        r = os_.search(wq.Term("text", "render"), groupedby=facet, limit=None)
        ref = {
            k: [r.searcher.stored_fields(d)["rid"] for d in v]
            for k, v in r.groups().items()
        }
    dm = s.index.docmap(columns=["docid", "rid", "tags"])
    scored = s.score_df(ast.Term("text", "render"))
    fac = attach_facet(scored, StoredFieldFacet("tags", allow_overlap=True), docs=dm)
    got_rows = facet_ordered_list(fac).collect()
    m = _docid_map(s)
    got = {r["facet"]: [m[d] for d in r["docids"]] for r in got_rows}
    assert {k: sorted(v) for k, v in got.items()} == {
        k: sorted(v) for k, v in ref.items()
    }


def test_function_facet_sort(built, f_oracle):
    """sortedby=FunctionFacet(len of stored tags value) (sorting.py:588)."""
    from whoosh import query as wq
    from whoosh import sorting as ws

    ix, s = built
    with f_oracle.searcher() as os_:
        fn = lambda srch, docid: (
            len(srch.stored_fields(docid)["tags"]),
            srch.stored_fields(docid)["rid"],
        )
        facet = ws.FunctionFacet(fn)
        ref = [
            hit["rid"]
            for hit in os_.search(wq.Term("text", "shade"), sortedby=facet, limit=None)
        ]
    dm = s.index.docmap(columns=["docid", "rid", "tags"])
    got_rows = sort_by_facet(
        s,
        ast.Term("text", "shade"),
        MultiFacet([FunctionFacet(F.length("tags")), FieldFacet("rid")]),
        docs=dm,
        limit=None,
    ).collect()
    m = _docid_map(s)
    got = [m[r["docid"]] for r in got_rows]
    assert got == ref


def test_score_facet_order_equals_search(built):
    """sortedby=ScoreFacet() reproduces the default score ordering."""
    ix, s = built
    want = [r["docid"] for r in s.search(ast.Term("text", "render"), limit=None).collect()]
    got = [
        r["docid"]
        for r in sort_by_facet(s, ast.Term("text", "render"), ScoreFacet(), limit=None).collect()
    ]
    assert got == want


def test_multifacet_count(built, f_oracle):
    """groupedby=MultiFacet([tag, tags-first-token]) counts."""
    ix, s = built
    dm = s.index.docmap(columns=["docid", "tag", "tags"])
    scored = s.score_df(ast.Term("text", "render"))
    spec = MultiFacet([FieldFacet("tag"), FunctionFacet(F.split("tags", " ")[0])])
    fac = attach_facet(scored, spec, docs=dm)
    got = {
        (r["facet"]["k0"], r["facet"]["k1"]): r["n"]
        for r in facet_count(fac).collect()
    }
    want = {}
    for rid, tag, tags, text in ROWS:
        if "render" in text.split():
            key = (tag, tags.split()[0])
            want[key] = want.get(key, 0) + 1
    assert got == want


def test_function_facet_callable_df_builder(built):
    """ADVICE r2: FunctionFacet's documented Column-builder signature
    fn(df) -> Column actually works — same ordering as the plain-Column
    form."""
    ix, s = built
    dm = s.index.docmap(columns=["docid", "rid", "tags"])
    want = [
        r["docid"]
        for r in sort_by_facet(
            s, ast.Term("text", "shade"),
            MultiFacet([FunctionFacet(F.length("tags")), FieldFacet("rid")]),
            docs=dm, limit=None,
        ).collect()
    ]
    got = [
        r["docid"]
        for r in sort_by_facet(
            s, ast.Term("text", "shade"),
            MultiFacet(
                [FunctionFacet(lambda df: F.length(df["tags"])), FieldFacet("rid")]
            ),
            docs=dm, limit=None,
        ).collect()
    ]
    assert got == want


def test_translate_facet_over_overlap(built, f_oracle):
    """TranslateFacet(upper, StoredFieldFacet(allow_overlap=True)):
    the reference's TranslateCategorizer calls key_for — never keys_for
    (sorting.py:678-680) — so the overlap child contributes its UN-SPLIT
    stored value and the translated facet never overlaps (r3 ADVICE:
    previously fn(explode(...)) — an invalid nested generator)."""
    from pyspark.sql import functions as F

    from whoosh_novo_spark.operators.facets import TranslateFacet

    ix, s = built
    from whoosh import query as wq
    from whoosh import sorting as ws

    with f_oracle.searcher() as os_:
        facet = ws.TranslateFacet(
            str.upper, ws.StoredFieldFacet("tags", allow_overlap=True)
        )
        r = os_.search(wq.Term("text", "render"), groupedby=facet, limit=None)
        ref = {
            k: sorted(r.searcher.stored_fields(d)["rid"] for d in v)
            for k, v in r.groups().items()
        }
    spec = TranslateFacet(F.upper, StoredFieldFacet("tags", allow_overlap=True))
    assert spec.overlap is False
    dm = s.index.docmap(columns=["docid", "rid", "tags"])
    scored = s.score_df(ast.Term("text", "render"))
    fac = attach_facet(scored, spec, docs=dm)
    got_rows = facet_ordered_list(fac).collect()
    m = _docid_map(s)
    got = {r["facet"]: sorted(m[d] for d in r["docids"]) for r in got_rows}
    assert got == ref


def test_translate_facet_multi_child(built, f_oracle):
    """TranslateFacet(fn, facet1, facet2): fn(*keys) over multiple wrapped
    facets (sorting.py:652-680 *facets / fn(*keys))."""
    from pyspark.sql import functions as F

    from whoosh_novo_spark.operators.facets import FieldFacet, TranslateFacet

    ix, s = built
    from whoosh import query as wq
    from whoosh import sorting as ws

    with f_oracle.searcher() as os_:
        facet = ws.TranslateFacet(
            lambda a, b: f"{a}|{b}",
            ws.StoredFieldFacet("tags"),
            ws.StoredFieldFacet("rid"),
        )
        r = os_.search(wq.Term("text", "render"), groupedby=facet, limit=None)
        ref = {
            k: sorted(r.searcher.stored_fields(d)["rid"] for d in v)
            for k, v in r.groups().items()
        }
    spec = TranslateFacet(
        lambda a, b: F.concat_ws("|", a, b),
        StoredFieldFacet("tags"),
        StoredFieldFacet("rid"),
    )
    dm = s.index.docmap(columns=["docid", "rid", "tags"])
    scored = s.score_df(ast.Term("text", "render"))
    fac = attach_facet(scored, spec, docs=dm)
    got_rows = facet_ordered_list(fac).collect()
    m = _docid_map(s)
    got = {r["facet"]: sorted(m[d] for d in r["docids"]) for r in got_rows}
    assert got == ref
