"""Composable collector hooks — the ``whoosh.collectors`` wrapper stack.

Reference: collectors wrap each other to customize result collection
(collectors.py: TopCollector :405, UnlimitedCollector :511, SortingCollector
:536, FilterCollector :659, FacetCollector :764, CollapseCollector :854,
TermsCollector :1073).  The Spark translation: a collector is a
transformation of the scored (docid, score) DataFrame; a custom collector
is any object with ``apply(searcher, q, df) -> DataFrame`` (or a plain
function) — ``Searcher.collect`` folds the chain left to right, so user
hooks compose with the built-ins exactly like the reference's wrapping.

Ordering/limit semantics match the reference: wrappers run on the full
match set and the final TopCollector applies the (score desc, docid asc)
heap order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from whoosh_novo_spark.plans import ast


class Collector:
    """Base hook: override ``apply``."""

    def apply(self, searcher, q: ast.Query, df: DataFrame) -> DataFrame:
        raise NotImplementedError


class FilterCollector(Collector):
    """collectors.py:659-762: ``allow`` keeps only docs matching the
    filter; ``restrict`` drops docs matching the mask.  Membership only —
    scores are never affected."""

    def __init__(self, allow=None, restrict=None):
        self.allow = allow
        self.restrict = restrict

    def _ids(self, searcher, x) -> DataFrame:
        if isinstance(x, ast.Query):
            # membership probe: docid-only plan, no stats join
            return searcher._compile_ids(x.normalize())
        return x.select("docid")

    def apply(self, searcher, q, df):
        if self.allow is not None:
            df = df.join(self._ids(searcher, self.allow), "docid", "left_semi")
        if self.restrict is not None:
            df = df.join(self._ids(searcher, self.restrict), "docid", "left_anti")
        return df


class CollapseCollector(Collector):
    """collectors.py:854+: keep the best ``limit_per_key`` docs per
    collapse key (ties by docid asc)."""

    def __init__(self, docs: DataFrame, key: str, limit_per_key: int = 1, id_col: str = "docid"):
        self.docs = docs
        self.key = key
        self.limit_per_key = limit_per_key
        self.id_col = id_col

    def apply(self, searcher, q, df):
        j = df.join(
            self.docs.select(F.col(self.id_col).alias("docid"), self.key), "docid"
        )
        w = Window.partitionBy(self.key).orderBy(F.desc("score"), F.asc("docid"))
        return (
            j.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= self.limit_per_key)
            .select("docid", "score")
        )


class TermsCollector(Collector):
    """collectors.py:1073+: record which of the query's term leaves
    matched each document (``matched_terms`` column array<string>)."""

    def apply(self, searcher, q, df):
        leaves = ast.term_leaves(q)
        if not leaves:
            return df.withColumn("matched_terms", F.array().cast("array<string>"))
        fields = sorted({t.fieldname for t in leaves})
        texts = sorted({t.text for t in leaves})
        p = searcher.index.postings_span_pairs(
            [(f, t) for f in fields for t in texts]
        ).where(F.col("field").isin(fields) & F.col("term").isin(texts))
        mt = p.groupBy("docid").agg(
            F.sort_array(F.collect_set("term")).alias("matched_terms")
        )
        return df.join(mt, "docid", "left")


class ScoredPostProcessor(Collector):
    """Adapter turning a plain function (searcher, q, df) -> df into a
    collector — the 'write your own Collector subclass' hook."""

    def __init__(self, fn):
        self.fn = fn

    def apply(self, searcher, q, df):
        return self.fn(searcher, q, df)


def collect(
    searcher,
    q: ast.Query,
    collectors: list | None = None,
    limit: int | None = 10,
    sortedby=None,
    docs: DataFrame | None = None,
) -> DataFrame:
    """Run ``q``, fold the collector chain over the scored match set, then
    apply the terminal ordering: ``sortedby`` (a facet spec from
    operators.facets, SortingCollector) or the TopCollector order."""
    qn = q.normalize()
    df = searcher.score_df(qn)
    for c in collectors or []:
        if callable(c) and not isinstance(c, Collector):
            c = ScoredPostProcessor(c)
        df = c.apply(searcher, qn, df)
    if sortedby is not None:
        from whoosh_novo_spark.operators.facets import sort_by_facet  # noqa: F401

        base = df
        if sortedby.needs_docs:
            if docs is None:
                raise ValueError("sortedby spec needs a stored-fields DataFrame")
            base = df.join(docs, "docid")
        out = base.orderBy(*sortedby.sort_exprs(), F.asc("docid")).select(
            df.columns
        )
    else:
        out = df.orderBy(F.desc("score"), F.asc("docid"))
    return out.limit(limit) if limit is not None else out


# --- time-limited search ----------------------------------------------------

class TimeLimit(Exception):
    """collectors.py:1002-1010: the search exceeded its time budget.
    ``partial`` holds the rows that had already reached the driver —
    the reference keeps partials on the collector (``tlc.results()``
    after catching TimeLimit); here they ride on the exception."""

    def __init__(self, partial: list):
        super().__init__(f"time limit exceeded ({len(partial)} partial rows)")
        self.partial = partial


def collect_with_time_limit(spark, df: DataFrame, timelimit: float) -> list:
    """TimeLimitCollector (collectors.py:1012-1072) for Spark's execution
    model: the action streams result partitions to the driver inside a
    dedicated job group; a timer cancels the group (with task interrupt)
    when the budget expires.  Rows that arrived before the cancel become
    ``TimeLimit.partial`` — the analogue of the reference's partial
    results.  (The reference's ``greedy`` flag means "finish the current
    hit"; cancellation here is per-task, so the granularity is the result
    batch rather than the single hit.)"""
    import threading
    import time as _time

    sc = spark.sparkContext
    group = f"wns-timelimit-{_time.monotonic_ns()}"
    done = threading.Event()
    expired = threading.Event()

    def reaper():
        if not done.wait(timelimit):
            expired.set()
            try:
                sc.cancelJobGroup(group)
            except Exception:
                pass

    rows: list = []
    sc.setJobGroup(group, f"time-limited search ({timelimit}s)", interruptOnCancel=True)
    t = threading.Thread(target=reaper, daemon=True)
    t.start()
    try:
        for row in df.toLocalIterator(prefetchPartitions=True):
            rows.append(row)
    except Exception:
        if expired.is_set():
            raise TimeLimit(rows) from None
        raise
    finally:
        done.set()
        try:
            sc.setJobGroup(None, None)
        except Exception:
            pass
    if expired.is_set():
        # budget expired right at the end of the stream: the reference
        # raises whenever the timer fired before collection finished
        raise TimeLimit(rows)
    return rows


def search_with_time_limit(
    searcher,
    q: ast.Query,
    timelimit: float,
    limit: int | None = 10,
    collectors: list | None = None,
    sortedby=None,
    docs: DataFrame | None = None,
) -> list:
    """``TimeLimitCollector(child, timelimit)`` over the normal collector
    chain: returns the collected rows, or raises :class:`TimeLimit`
    carrying partials."""
    df = collect(searcher, q, collectors=collectors, limit=limit,
                 sortedby=sortedby, docs=docs)
    return collect_with_time_limit(searcher.index.spark, df, timelimit)
