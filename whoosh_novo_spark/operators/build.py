"""Index build: docs -> docids -> postings/doclens/terms -> committed segment.

Replaces the reference's entire write path (pool, external sort, codec,
lock, multiproc — ``writing.py:518-941``, ``externalsort.py``,
``multiproc.py``) with four declarative Spark stages:

1. **docid assignment** — deterministic dense docids from a total order on
   ``id_col`` (reference assigns insertion-order docnums,
   ``writing.py:584-606``; distributed ingest needs a *reproducible* order,
   SURVEY §7.4).  Implemented scalably: ``repartitionByRange(id_col)`` +
   ``sortWithinPartitions`` + partition-local ordinals (mapInPandas, no
   window shuffle), staged to parquet; global ids are
   ``base + offset[pid] + local_ord`` with tiny broadcast offsets.  No
   ``monotonically_increasing_id`` (not stable across retries).
2. **analyze** — one vectorized pandas pass per doc batch producing
   tf-aggregated postings ``(field, term, docid, weight, tf, len_q)``;
   the per-(doc,term) aggregation happens *inside* the Arrow batch (the
   grouping key contains docid), so raw token streams never hit a shuffle
   — the reference does the same grouping in ``Format.word_values``
   (formats.py:190-236).
3. **posting sort/sink** — ``repartitionByRange(field, term, docid)`` +
   ``sortWithinPartitions``: Spark's range shuffle is the external merge
   sort (externalsort.py:84-237) and the multiproc k-way merge
   (multiproc.py:315-351) in one step.  Range-partitioning on
   ``(term, docid)`` — not just ``term`` — splits Zipf-head posting lists
   across partitions at docid boundaries: skew-proof by construction.
4. **stats** — terms table (TermInfo semantics, reading.py:61-139) and
   doclens from map-side-combined groupBys; exact field-length totals into
   the manifest (whoosh3.py:242-243).

Every stage writes a parquet checkpoint + a JSON stage marker with
per-partition row counts, so a killed build resumes by skipping completed
stages (SURVEY §7.4 "Resume").
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whoosh_novo_spark.functions.analysis import ANALYZERS
from whoosh_novo_spark.functions.quantize import quantized_length_np
from whoosh_novo_spark.schema import IndexConfig
from whoosh_novo_spark.sources.segment_store import Manifest, SegmentInfo, SegmentStore

POSTINGS_SCHEMA = (
    "field string, term string, docid long, weight double, tf int, len_q int, "
    "positions array<int>"
)
CHARS_COL = "chars array<struct<pos:int,start:int,end:int>>"
BOOSTS_COL = "boosts array<double>"


def _postings_schema(config: IndexConfig) -> str:
    schema = POSTINGS_SCHEMA
    if not any(f.positions for f in config.fields):
        # positions-free index: drop the all-null array column — it still
        # costs a fixed-width slot per row through the posting range
        # shuffle and every scan (guide §2.3: shuffle fewer bytes)
        schema = schema.replace(", positions array<int>", "")
    if any(f.chars for f in config.fields):
        schema += ", " + CHARS_COL
    if any(f.boosts for f in config.fields):
        schema += ", " + BOOSTS_COL
    return schema


# ---------------------------------------------------------------- stage 1

def _stage_docmap(
    spark: SparkSession,
    docs: DataFrame,
    config: IndexConfig,
    store: SegmentStore,
    segment_id: str,
    partitions: int,
) -> dict:
    """Sort by id_col, attach (pid, local_ord), stage to parquet; return
    {pid: offset} plus doc_count. Idempotent via stage marker."""
    marker = store.read_stage_marker(segment_id, "docmap")
    if marker is not None:
        return marker

    t_s = time.time()
    id_col = config.id_col
    if config.stored_cols is not None:
        keep = [id_col] + [f.name for f in config.fields] + [
            c for c in config.stored_cols
            if c != id_col and c not in {f.name for f in config.fields}
        ]
        # lang-routed builds need the routing column through the docmap
        # even when the caller projected stored columns away
        if any(f.lang_routed for f in config.fields) and config.lang_col not in keep:
            keep.append(config.lang_col)
        docs = docs.select(*[c for c in keep if c in docs.columns])
    sorted_docs = docs.repartitionByRange(partitions, id_col).sortWithinPartitions(id_col)

    # partition-local ordinals JVM-side (r6): monotonically_increasing_id
    # is (partitionIndex << 33) | rowNumberInPartition, so masking the low
    # 33 bits yields exactly the dense per-partition ordinal the old
    # mapInPandas pass computed — without shipping every stored column
    # (including the full document text) through the Arrow/Python
    # boundary just to attach two integers (guide §4.1: the boundary cost
    # is per-byte).  Determinism holds because the ordinal is assigned
    # AFTER repartitionByRange + sortWithinPartitions on the unique
    # id_col: a retried task re-sorts the same range into the same order,
    # so (pid, local_ord) is reproducible — the caveat about
    # monotonically_increasing_id applies to non-deterministic input
    # orders (e.g. round-robin repartition), not to this sorted shape.
    # Nondeterministic expressions are never pushed below the Sort by the
    # optimizer, so the ordinal always sees the sorted order.
    staged = sorted_docs.withColumn(
        "pid", F.spark_partition_id()
    ).withColumn(
        "local_ord",
        F.monotonically_increasing_id().bitwiseAND(F.lit((1 << 33) - 1)),
    )
    path = store.table_path(segment_id, "docmap")
    staged.write.mode("overwrite").parquet(path)

    # per-pid counts -> offsets (drives global docid mapping), straight
    # from the parquet footers we already read for file_rows: Spark names
    # a committed file part-<taskIndex>-... and taskIndex == partition id
    # (one committed file per task), so no Spark job is needed.  Falls
    # back to the groupBy scan if a filename doesn't parse.
    import re as _re

    file_rows = parquet_file_rows(path)
    parsed: list[tuple[int, int]] | None = []
    for fn, nrows in file_rows.items():
        m = _re.match(r"part-(\d+)-", fn)
        if m is None:
            parsed = None
            break
        parsed.append((int(m.group(1)), nrows))
    offsets: dict[str, int] = {}
    acc = 0
    if parsed is not None:
        for pid, nrows in sorted(parsed):
            if nrows:
                offsets[str(pid)] = acc
                acc += nrows
    else:  # fallback: narrow scan
        counts = (
            spark.read.parquet(path).groupBy("pid").count().orderBy("pid").collect()
        )
        for r in counts:
            offsets[str(r["pid"])] = acc
            acc += r["count"]
    marker = {
        "offsets": offsets,
        "doc_count": acc,
        "partitions": partitions,
        "seconds": round(time.time() - t_s, 3),
        "file_rows": file_rows,
        # input fingerprint: lets a later build of a DIFFERENT batch detect
        # (and refuse) a stale uncommitted segment left by a crash
        "fingerprint": _docmap_fingerprint(path, id_col, acc),
    }
    store.write_stage_marker(segment_id, "docmap", marker)
    return marker


def _docmap_fingerprint(path: str, id_col: str, doc_count: int) -> dict:
    """(count, min, max of id_col) straight from parquet column stats —
    no Spark job."""
    import os

    import pyarrow.parquet as pq

    mn = mx = None
    for fn in sorted(os.listdir(path)):
        if not fn.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, fn)).metadata
        try:
            idx = md.schema.names.index(id_col)
        except ValueError:
            return {"doc_count": doc_count}
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                continue
            if mn is None or st.min < mn:
                mn = st.min
            if mx is None or st.max > mx:
                mx = st.max
    enc = lambda v: v.decode("utf-8", "replace") if isinstance(v, bytes) else v
    return {"doc_count": doc_count, "min_id": str(enc(mn)), "max_id": str(enc(mx))}


def read_docmap(
    spark: SparkSession, store: SegmentStore, seg: SegmentInfo, columns: list[str] | None = None
) -> DataFrame:
    """Docmap with materialized global docid (base + offset[pid] + ord).

    Merged segments (operators/merge.py) store the docid column directly
    and are flagged ``materialized`` in their stage marker."""
    marker = store.read_stage_marker(seg.segment_id, "docmap")
    if marker.get("materialized"):
        df = spark.read.parquet(store.table_path(seg.segment_id, "docmap"))
        return df.select(*columns) if columns else df
    base = seg.meta["base"]
    df = spark.read.parquet(store.table_path(seg.segment_id, "docmap"))
    if marker["offsets"]:
        off = F.create_map(
            *[F.lit(x) for kv in marker["offsets"].items() for x in (int(kv[0]), kv[1])]
        )
        docid = (F.lit(base) + off[F.col("pid")] + F.col("local_ord")).cast("long")
    else:  # empty segment
        docid = (F.lit(base) + F.col("local_ord")).cast("long")
    df = df.withColumn("docid", docid).drop("pid", "local_ord")
    return df.select(*columns) if columns else df


# ---------------------------------------------------------------- stage 2+3

def _lang_code(v) -> str:
    """Normalize a lang-column value to the analyzer-registry code:
    lowercase two-letter via snowball aliases; null/empty -> "und"
    (ISO 639 undetermined, analyzed with the plain fallback chain)."""
    from whoosh_novo_spark.functions.snowball import two_letter_code

    if v is None:
        return "und"
    s = str(v).strip().lower()
    return two_letter_code(s) if s else "und"


def _routed_analyzer(code: str, fc):
    """LanguageAnalyzer chain for a routed row's language; unknown
    languages degrade to tokenize+lower (exactly make_language_analyzer
    semantics — no stop list, no stemmer) rather than failing a build
    over a web crawl's long language tail."""
    from whoosh_novo_spark.functions.analysis import (
        ANALYZERS,
        make_language_analyzer_batch,
    )

    fn = ANALYZERS.get(f"lang_{code}")
    return fn if fn is not None else make_language_analyzer_batch(code)


def _analyze_partition(config: IndexConfig, want_positions: bool):
    """Returns the mapInPandas function: doc batches -> posting rows.
    Only text fields are analyzed; typed fields (numeric/datetime/boolean)
    stay native docmap columns queried by pushed-down predicates.

    lang_routed fields dispatch PER ROW on the ``config.lang_col`` value:
    each language's rows are analyzed with its LanguageAnalyzer chain and
    emitted under the virtual field "<name>@<code>", so term stats /
    lengths / doc counts stay per-language downstream (all in-batch —
    routing adds no shuffle)."""
    fields = tuple(f for f in config.fields if f.type == "text")
    any_chars = any(f.chars for f in fields)
    any_boosts = any(f.boosts for f in fields)
    emit_positions = any(f.positions for f in config.fields)
    lang_col = config.lang_col

    from whoosh_novo_spark.functions.analysis import AGGREGATE_ANALYZERS, CHAR_ANALYZERS

    for fc in fields:
        if fc.chars and fc.analyzer not in CHAR_ANALYZERS:
            raise ValueError(
                f"analyzer {fc.analyzer!r} has no chars-capable variant "
                f"(field {fc.name!r}); chars=True supports {sorted(CHAR_ANALYZERS)}"
            )
        if fc.lang_routed and (fc.chars or fc.boosts):
            raise ValueError(
                f"field {fc.name!r}: lang_routed is incompatible with "
                "chars/boosts payloads"
            )

    def _routed_outs(fc, pdf, docids):
        """Postings for one lang-routed field: per-language sub-batches
        through their chains, virtual field names, tf + optional
        positions (the generic path below, minus chars/boosts)."""
        from whoosh_novo_spark.functions.analysis import (
            AGGREGATE_ANALYZERS,
            make_language_aggregate_batch,
        )

        outs = []
        codes = pdf[lang_col].map(_lang_code).to_numpy(dtype=object)
        for code in sorted(set(codes)):
            sel = np.flatnonzero(codes == code)
            sub = pdf[fc.name].iloc[sel].reset_index(drop=True)
            sub_docids = docids[sel]
            if not (want_positions and fc.positions):
                # tf-aggregated twin of the chain (factorize/bincount; no
                # per-token pandas groupby) — same postings, no positions
                agg_fn = AGGREGATE_ANALYZERS.get(
                    f"lang_{code}"
                ) or make_language_aggregate_batch(code)
                aggdf, lens = agg_fn(sub)
                if len(aggdf) == 0:
                    continue
                len_q = quantized_length_np(np.maximum(lens, 0))
                rows = aggdf["row"].to_numpy(dtype=np.int64)
                tf = aggdf["tf"].to_numpy(dtype=np.int64)
                out = pd.DataFrame(
                    {
                        "field": f"{fc.name}@{code}",
                        "term": aggdf["term"],
                        "docid": sub_docids[rows],
                        "weight": tf.astype(np.float64) * fc.boost,
                        "tf": tf.astype(np.int32),
                        "len_q": len_q[rows].astype(np.int32),
                        "positions": None,
                    }
                )
                if any_chars:
                    out["chars"] = None
                if any_boosts:
                    out["boosts"] = None
                outs.append(out)
                continue
            fn = _routed_analyzer(code, fc)
            tb = fn(sub)
            if len(tb.term) == 0:
                continue
            tdf = pd.DataFrame({"row": tb.row, "term": tb.term, "pos": tb.pos})
            aggs = {"tf": ("pos", "size")}
            if want_positions and fc.positions:
                aggs["positions"] = ("pos", lambda s: list(s))
            agg = tdf.groupby(["row", "term"], sort=False).agg(**aggs)
            if "positions" not in agg.columns:
                agg["positions"] = None
            agg = agg.reset_index()
            lens = tb.doc_lengths()
            len_q = quantized_length_np(np.maximum(lens, 0))
            rows = agg["row"].to_numpy(dtype=np.int64)
            out = pd.DataFrame(
                {
                    "field": f"{fc.name}@{code}",
                    "term": agg["term"],
                    "docid": sub_docids[rows],
                    "weight": agg["tf"].to_numpy(dtype=np.float64) * fc.boost,
                    "tf": agg["tf"].to_numpy(dtype=np.int32),
                    "len_q": len_q[rows].astype(np.int32),
                    "positions": agg["positions"],
                }
            )
            if any_chars:
                out["chars"] = None
            if any_boosts:
                out["boosts"] = None
            outs.append(out)
        return outs

    def analyze(iterator):
        for pdf in iterator:
            docids = pdf["docid"].to_numpy(dtype=np.int64)
            outs = []
            for fc in fields:
                if fc.lang_routed:
                    outs.extend(_routed_outs(fc, pdf, docids))
                    continue
                # tf-aggregated fast path (no per-occurrence token stream)
                # for analyzers that provide it, when positions aren't kept
                if fc.analyzer in AGGREGATE_ANALYZERS and not (
                    (want_positions and fc.positions) or fc.chars or fc.boosts
                ):
                    aggdf, lens = AGGREGATE_ANALYZERS[fc.analyzer](pdf[fc.name])
                    if len(aggdf) == 0:
                        continue
                    len_q = quantized_length_np(np.maximum(lens, 0))
                    rows = aggdf["row"].to_numpy(dtype=np.int64)
                    tf = aggdf["tf"].to_numpy(dtype=np.int64)
                    fast = pd.DataFrame(
                        {
                            "field": fc.name,
                            "term": aggdf["term"],
                            "docid": docids[rows],
                            "weight": tf.astype(np.float64) * fc.boost,
                            "tf": tf.astype(np.int32),
                            "len_q": len_q[rows].astype(np.int32),
                            "positions": None,
                        }
                    )
                    if any_chars:
                        fast["chars"] = None
                    if any_boosts:
                        fast["boosts"] = None
                    outs.append(fast)
                    continue
                fn = CHAR_ANALYZERS[fc.analyzer] if fc.chars else ANALYZERS[fc.analyzer]
                tb = fn(pdf[fc.name])
                if len(tb.term) == 0:
                    continue
                if (
                    want_positions
                    and fc.positions
                    and not fc.chars
                    and not fc.boosts
                ):
                    # vectorized (row, term) run-length fold: the pandas
                    # groupby with a per-group ``list`` lambda loops in
                    # Python over ~1 group per posting — at web-page doc
                    # counts that loop IS the positions-build wall.
                    # lexsort + split keeps positions ascending per group.
                    row_a = np.asarray(tb.row, dtype=np.int64)
                    pos_a = np.asarray(tb.pos, dtype=np.int32)
                    codes, uniq_terms = pd.factorize(pd.Series(tb.term))
                    order = np.lexsort((pos_a, codes, row_a))
                    r2, c2, p2 = row_a[order], codes[order], pos_a[order]
                    new_g = np.empty(len(r2), dtype=bool)
                    new_g[0] = True
                    new_g[1:] = (r2[1:] != r2[:-1]) | (c2[1:] != c2[:-1])
                    starts = np.flatnonzero(new_g)
                    tf_a = np.diff(np.append(starts, len(r2)))
                    rows = r2[starts]
                    lens = tb.doc_lengths()
                    len_q = quantized_length_np(np.maximum(lens, 0))
                    out = pd.DataFrame(
                        {
                            "field": fc.name,
                            "term": np.asarray(uniq_terms, dtype=object)[c2[starts]],
                            "docid": docids[rows],
                            "weight": tf_a.astype(np.float64) * fc.boost,
                            "tf": tf_a.astype(np.int32),
                            "len_q": len_q[rows].astype(np.int32),
                            "positions": np.split(p2, starts[1:]),
                        }
                    )
                    if any_chars:
                        out["chars"] = None
                    if any_boosts:
                        out["boosts"] = None
                    outs.append(out)
                    continue
                tdf = pd.DataFrame({"row": tb.row, "term": tb.term, "pos": tb.pos})
                aggs = {"tf": ("pos", "size")}
                if want_positions and fc.positions:
                    aggs["positions"] = ("pos", lambda s: list(s))
                if fc.chars:
                    # Characters payload per occurrence (formats.py:273-345)
                    tdf["chr"] = [
                        {"pos": int(p), "start": int(s), "end": int(e)}
                        for p, s, e in zip(tb.pos, tb.start, tb.end)
                    ]
                    aggs["chars"] = ("chr", list)
                if fc.boosts:
                    # PositionBoosts payload (formats.py:345-411): weight
                    # becomes sum(boost)*fb; the per-occurrence boost list
                    # rides aligned with positions when positions are kept
                    tdf["bst"] = (
                        tb.boost
                        if tb.boost is not None
                        else np.ones(len(tb.term), dtype=np.float64)
                    )
                    aggs["wsum"] = ("bst", "sum")
                    if (want_positions and fc.positions) or fc.chars:
                        aggs["boosts"] = ("bst", list)
                agg = tdf.groupby(["row", "term"], sort=False).agg(**aggs)
                if "positions" not in agg.columns:
                    agg["positions"] = None
                if any_chars and "chars" not in agg.columns:
                    agg["chars"] = None
                if any_boosts and "boosts" not in agg.columns:
                    agg["boosts"] = None
                agg = agg.reset_index()
                lens = tb.doc_lengths()  # true post-filter length per row
                len_q = quantized_length_np(np.maximum(lens, 0))
                rows = agg["row"].to_numpy(dtype=np.int64)
                out = pd.DataFrame(
                    {
                        "field": fc.name,
                        "term": agg["term"],
                        "docid": docids[rows],
                        # weight = tf * field boost (formats.py:190-203);
                        # boosted fields: sum(token boost) * field boost
                        # (PositionBoosts.word_values, formats.py:356-366)
                        "weight": (
                            agg["wsum"].to_numpy(dtype=np.float64)
                            if fc.boosts
                            else agg["tf"].to_numpy(dtype=np.float64)
                        )
                        * fc.boost,
                        "tf": agg["tf"].to_numpy(dtype=np.int32),
                        "len_q": len_q[rows].astype(np.int32),
                        "positions": agg["positions"],
                        # true_len rides along once per (doc,field) for exact
                        # field_length totals; only on the first term row
                    }
                )
                if any_chars:
                    out["chars"] = agg["chars"].to_numpy()
                if any_boosts:
                    out["boosts"] = agg["boosts"].to_numpy()
                outs.append(out)
            if outs:
                out_all = pd.concat(outs, ignore_index=True)
                if not emit_positions:
                    out_all = out_all.drop(columns=["positions"])
                yield out_all

    return analyze


def _widen_input_splits(spark: SparkSession, path: str, want_partitions: int) -> None:
    """Size file splits so a scan of `path` yields ~want_partitions input
    tasks — the analysis stage's parallelism comes from these splits (the
    expensive map work happens BEFORE any shuffle, so shuffle.partitions
    can't help it).  Runtime conf; cheap to set per-build."""
    import os

    total = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            if fn.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, fn))
    if total <= 0:
        return
    target = max(1 * 1024 * 1024, min(128 * 1024 * 1024, total // max(want_partitions, 1)))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(target))


def _term_spans(path: str) -> dict:
    """Per-file (field, term) bounds for the pruning manifest (one footer
    read per file at build time, saving the query side's lazy scan)."""
    from whoosh_novo_spark.sources.file_prune import ranges_to_json, scan_file_ranges

    ranges = scan_file_ranges([path])
    return ranges_to_json(ranges or [])


def _doclens_totals_local(path: str, max_bytes: int = 256 * 1024 * 1024) -> dict | None:
    """Per-field exact length totals straight from the doclens parquet
    (integer sums, driver-side) — None when the dir is non-local or
    bigger than ``max_bytes`` (the Spark aggregate takes over)."""
    import os

    from urllib.parse import urlparse

    if urlparse(path).scheme not in ("", "file"):
        return None
    local = path[7:] if path.startswith("file://") else path
    if not os.path.isdir(local):
        return None
    files, total = [], 0
    for fn in sorted(os.listdir(local)):
        if fn.endswith(".parquet"):
            p = os.path.join(local, fn)
            total += os.path.getsize(p)
            files.append(p)
    if not files or total > max_bytes:
        return None
    import pyarrow.parquet as pq

    out: dict[str, int] = {}
    try:
        for f in files:
            g = (
                pq.read_table(f, columns=["field", "len"])
                .group_by("field")
                .aggregate([("len", "sum")])
            )
            d = g.to_pydict()
            for fld, ln in zip(d["field"], d["len_sum"]):
                out[fld] = out.get(fld, 0) + int(ln)
    except Exception:
        return None
    return out


def parquet_file_rows(path: str) -> dict[str, int]:
    """Per-file row counts straight from parquet footers (no Spark job) —
    the per-partition lineage record for each build stage."""
    import os

    import pyarrow.parquet as pq

    out: dict[str, int] = {}
    for fn in sorted(os.listdir(path)):
        if fn.endswith(".parquet"):
            out[fn] = pq.ParquetFile(os.path.join(path, fn)).metadata.num_rows
    return out


def _resumable_segment_id(
    store: SegmentStore, manifest: Manifest, spark: SparkSession, docs: DataFrame, id_col: str
) -> str:
    """Reuse the newest *uncommitted* ingest segment dir (a previous build
    of the same batch that died before commit) so its completed stage
    markers are honored; otherwise mint a fresh id.  Crashed MERGE dirs
    (materialized docmap markers) are never reused, and a staged docmap is
    only adopted when its input fingerprint (count + min/max id) matches
    the incoming batch — a crashed build of batch A must not be committed
    as batch B."""
    import os

    committed = {s.segment_id for s in manifest.segments}
    seg_root = os.path.join(store.path, "segments")
    os.makedirs(seg_root, exist_ok=True)
    incoming = None  # computed lazily: only when a resume candidate exists
    for sid in sorted(os.listdir(seg_root), reverse=True):
        if sid in committed:
            continue
        marker = store.read_stage_marker(sid, "docmap")
        if marker is None:
            # only safe to reuse when NO later stage marker exists either:
            # a merge that crashed after its postings marker but before its
            # docmap marker must not be adopted (its markers would make the
            # build skip stages whose inputs don't exist)
            if any(
                store.read_stage_marker(sid, st) is not None
                for st in ("postings", "terms", "doclens", "blocks")
            ):
                continue
            return sid  # crashed before stage 1 finished: safe to reuse dir
        if "offsets" not in marker:
            continue  # crashed merge dir
        fp = marker.get("fingerprint")
        if fp is None:
            continue  # pre-fingerprint marker: don't trust it
        if incoming is None:
            r = docs.agg(
                F.count(F.lit(1)).alias("n"),
                F.min(id_col).alias("mn"),
                F.max(id_col).alias("mx"),
            ).collect()[0]
            incoming = {
                "doc_count": int(r["n"]),
                "min_id": str(r["mn"]),
                "max_id": str(r["mx"]),
            }
        if (
            fp.get("doc_count") == incoming["doc_count"]
            and str(fp.get("min_id")) == incoming["min_id"]
            and str(fp.get("max_id")) == incoming["max_id"]
        ):
            return sid
    return store.new_segment_id()


def build_segment(
    spark: SparkSession,
    docs: DataFrame,
    config: IndexConfig,
    store: SegmentStore,
    partitions: int | None = None,
) -> Manifest:
    """Build one segment from a batch of documents and commit it.

    The whoosh equivalent is ``writer.add_document()*N; writer.commit()``
    (writing.py:748-822, 854-941).  Returns the committed manifest.
    """
    t0 = time.time()
    # whoosh writer-lock parity: one writer per index (index.LockError);
    # reentrant within a process so update_documents can nest
    store.acquire_writer_lock()
    try:
        return _build_segment_locked(spark, docs, config, store, partitions, t0)
    finally:
        store.release_writer_lock()


def _build_segment_locked(
    spark: SparkSession,
    docs: DataFrame,
    config: IndexConfig,
    store: SegmentStore,
    partitions: int | None,
    t0: float,
) -> Manifest:
    manifest = store.read_manifest()
    manifest.id_col = config.id_col
    segment_id = _resumable_segment_id(store, manifest, spark, docs, config.id_col)
    base = manifest.next_docid
    from whoosh_novo_spark.session import shuffle_partitions_of

    sp = partitions or config.shuffle_partitions or shuffle_partitions_of(spark)

    # stage 1: docid assignment (staged, resumable)
    dm = _stage_docmap(spark, docs, config, store, segment_id, sp)
    doc_count = dm["doc_count"]

    # auto-size the posting shuffle unless the caller pinned it: ~4k docs
    # (~500k posting rows at web-page lengths) per partition keeps the
    # sort/spill fully in memory — measured 1M docs: 6.3k docs/s at 128
    # partitions vs 11.6k docs/s at 256 on this host
    if partitions is None and config.shuffle_partitions is None:
        import math as _math

        sp = min(4096, max(sp, _math.ceil(doc_count / 4000)))

    seg = SegmentInfo(
        segment_id,
        doc_count,
        {},
        min_docid=base,
        max_docid=base + doc_count - 1,
        has_positions=any(f.positions for f in config.fields),
        meta={"base": base},
    )

    # stage 2: analyze -> RAW postings staging.  Staged (not piped straight
    # into the range shuffle) for two reasons: repartitionByRange's sampler
    # would execute the whole analysis child a SECOND time (doubling the
    # most expensive stage), and the staged table is the natural resume
    # point after a crash mid-sort.
    if (
        store.read_stage_marker(segment_id, "postings") is None
        and store.read_stage_marker(segment_id, "postings_raw") is None
    ):
        want_pos = seg.has_positions
        _widen_input_splits(spark, store.table_path(segment_id, "docmap"), sp)
        analyze_cols = ["docid"] + [
            f.name for f in config.fields if f.type == "text"
        ]
        if any(f.lang_routed for f in config.fields):
            analyze_cols.append(config.lang_col)
        docmap = read_docmap(spark, store, seg, columns=analyze_cols)
        t_r = time.time()
        # snappy for the TRANSIENT staging table (written once, scanned by
        # the three stage-3 legs, deleted): cheaper encode/decode than the
        # session zstd default, which stays right for the PERMANENT tables
        docmap.mapInPandas(
            _analyze_partition(config, want_pos),
            _postings_schema(config),
        ).write.mode("overwrite").option("compression", "snappy").parquet(
            store.table_path(segment_id, "postings_raw")
        )
        store.write_stage_marker(
            segment_id,
            "postings_raw",
            {
                "seconds": round(time.time() - t_r, 3),
                "file_rows": parquet_file_rows(
                    store.table_path(segment_id, "postings_raw")
                ),
            },
        )

    raw_path = store.table_path(segment_id, "postings_raw")

    # stages 3a/3b/3c all scan the SAME raw staged table independently
    # (different groupings, different outputs) — submit them from driver
    # threads so the two small stats jobs back-fill executors under the
    # big posting sort instead of running serially after it (guide §2.6:
    # overlap independent jobs).  Each closure keeps its own stage-marker
    # guard, so resume semantics are unchanged; the shared
    # maxPartitionBytes runtime conf is set ONCE before submission.
    _widen_input_splits(spark, raw_path, sp)

    def _stage_terms() -> None:
        # stage 3a: terms stats from the RAW staged table (grouping needs
        # no sort; TermInfo — reading.py:61-139, whoosh3.py:1196-1210)
        if store.read_stage_marker(segment_id, "terms") is not None:
            return
        t_t = time.time()
        raw = spark.read.parquet(raw_path)
        terms = raw.groupBy("field", "term").agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("weight").alias("cf"),
            F.max("weight").alias("max_weight"),
            F.min("len_q").alias("min_len_q"),
            F.max("len_q").alias("max_len_q"),
            F.min("docid").alias("min_docid"),
            F.max("docid").alias("max_docid"),
        )
        # range-sorted by (field, term) so term-dictionary lookups (query
        # stats, multiterm expansion joins, suggest) prune by parquet
        # row-group min/max — the OrderedHashWriter's sorted-keys property.
        # File count is sized by DATA (AQE coalesces the range shuffle to
        # ~advisory partition size), not by the posting shuffle width: a
        # 1M-doc segment's dictionary fits ONE file, so the per-query
        # stats seek schedules one task instead of sp//8 (measured 0.5 s
        # -> <0.1 s per cold lookup); a web-scale dictionary still splits
        # into range-pruned files as its bytes grow.
        terms.repartitionByRange("field", "term").sortWithinPartitions(
            "field", "term"
        ).write.mode("overwrite").parquet(store.table_path(segment_id, "terms"))
        store.write_stage_marker(
            segment_id,
            "terms",
            {
                "seconds": round(time.time() - t_t, 3),
                "term_spans": _term_spans(store.table_path(segment_id, "terms")),
            },
        )

    def _stage_doclens() -> None:
        # stage 3b: doclens + exact field-length totals, also from RAW
        if store.read_stage_marker(segment_id, "doclens") is not None:
            return
        t_d = time.time()
        raw = spark.read.parquet(raw_path)
        doclens = raw.groupBy("field", "docid").agg(
            F.sum("tf").alias("len"),
            F.max("len_q").alias("len_q"),
        )
        doclens.write.mode("overwrite").parquet(store.table_path(segment_id, "doclens"))
        # exact field-length totals from the doclens AGGREGATE we just
        # wrote (sum over docs of len == sum of true post-filter lengths,
        # an integer identity) — read driver-side with pyarrow when the
        # table is small and local (saves a scheduled job per build);
        # Spark agg otherwise
        totals = _doclens_totals_local(store.table_path(segment_id, "doclens"))
        if totals is None:
            totals = {
                r["field"]: r["total"]
                for r in spark.read.parquet(store.table_path(segment_id, "doclens"))
                .groupBy("field")
                .agg(F.sum("len").alias("total"))
                .collect()
            }
        store.write_stage_marker(
            segment_id,
            "doclens",
            {"field_length": totals, "seconds": round(time.time() - t_d, 3)},
        )

    # lang-routed fields: per-virtual-field doc counts ("text@de" -> the
    # number of docs whose row routed to de, INCLUDING docs whose text
    # produced no postings), so idf/avgfl over a virtual field match a
    # single-language build of the same docs.  One narrow scan of the
    # docmap's lang column; language values normalize driver-side with
    # the same _lang_code the analyzer dispatch uses.
    routed = [f for f in config.fields if f.lang_routed]
    if routed:
        lang_counts_raw = (
            spark.read.parquet(store.table_path(segment_id, "docmap"))
            .groupBy(config.lang_col)
            .count()
            .collect()
        )
        by_code: dict[str, int] = {}
        for r in lang_counts_raw:
            code = _lang_code(r[config.lang_col])
            by_code[code] = by_code.get(code, 0) + int(r["count"])
        seg.meta["field_doc_count"] = {
            f"{fc.name}@{code}": n for fc in routed for code, n in by_code.items()
        }

    def _stage_postings_sort() -> None:
        # stage 3c: range-sorted sink.  tf is stats-only — dropping it
        # slims every shuffled/sorted/written row (the stats above came
        # from the raw table, which is deleted after all stage-3 legs).
        if store.read_stage_marker(segment_id, "postings") is not None:
            return
        # single-text-field fast path (r6, guide §2.3 "shuffle fewer
        # bytes"): when every posting row carries the SAME field value
        # and weight is recomputable (weight == tf * field boost — true
        # unless the field carries per-token boosts), the shuffle moves
        # (term, docid, tf:int, len_q) and the constant field string +
        # double weight are re-attached AFTER the sort as a literal and
        # a cast (projections preserve sort order; tf.cast('double') *
        # boost is the same IEEE product the analyzer computed).
        # Measured 19.1-21.6 s -> 16.3-16.9 s on the 88.6M-row 1M-doc
        # sort leg (~15%).
        text_fields = [f for f in config.fields if f.type == "text"]
        single = text_fields[0] if len(text_fields) == 1 else None
        fast_single = (
            single is not None and not single.lang_routed and not single.boosts
        )
        extra_cols = []
        if any(f.positions for f in config.fields):
            extra_cols.append("positions")
        if any(f.chars for f in config.fields):
            extra_cols.append("chars")
        if any(f.boosts for f in config.fields):
            extra_cols.append("boosts")
        if fast_single:
            postings_raw = spark.read.parquet(raw_path).select(
                "term", "docid", "tf", "len_q", *extra_cols
            )
            sorted_postings = (
                postings_raw.repartitionByRange(sp, "term", "docid")
                .sortWithinPartitions("term", "docid")
                .select(
                    F.lit(single.name).alias("field"),
                    "term",
                    "docid",
                    (F.col("tf").cast("double") * F.lit(float(single.boost))).alias(
                        "weight"
                    ),
                    "len_q",
                    *extra_cols,
                )
            )
        else:
            postings_raw = spark.read.parquet(raw_path).select(
                "field", "term", "docid", "weight", "len_q", *extra_cols
            )
            sorted_postings = postings_raw.repartitionByRange(
                sp, "field", "term", "docid"
            ).sortWithinPartitions("field", "term", "docid")
        t_p = time.time()
        sorted_postings.write.mode("overwrite").parquet(
            store.table_path(segment_id, "postings")
        )
        store.write_stage_marker(
            segment_id,
            "postings",
            {
                "partitions": sp,
                "seconds": round(time.time() - t_p, 3),
                "file_rows": parquet_file_rows(store.table_path(segment_id, "postings")),
                # per-file (field, term) spans — the Iceberg-manifest-style
                # bounds the query side prunes files with (file_prune.py);
                # readers fall back to a footer scan when absent
                "term_spans": _term_spans(store.table_path(segment_id, "postings")),
            },
        )

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        futs = [
            pool.submit(f)
            for f in (_stage_postings_sort, _stage_terms, _stage_doclens)
        ]
        for fut in futs:
            fut.result()
    import shutil as _sh

    _sh.rmtree(raw_path, ignore_errors=True)

    totals = store.read_stage_marker(segment_id, "doclens")["field_length"]
    seg.field_length = {k: int(v) for k, v in totals.items()}

    postings = spark.read.parquet(store.table_path(segment_id, "postings"))

    # stage 4c: posting blocks (skip pointers + block-max metadata,
    # whoosh3.py:806-824) for the WAND kernel
    if store.read_stage_marker(segment_id, "blocks") is None:
        from whoosh_novo_spark.operators.blocks import (
            build_blocks_from_path,
            fold_blocks_local,
        )

        t_b = time.time()
        if not fold_blocks_local(
            store.table_path(segment_id, "postings"),
            store.table_path(segment_id, "blocks"),
            config.block_limit,
        ):
            build_blocks_from_path(
                spark, store.table_path(segment_id, "postings"), config.block_limit
            ).write.mode("overwrite").parquet(store.table_path(segment_id, "blocks"))
        store.write_stage_marker(
            segment_id,
            "blocks",
            {
                "block_limit": config.block_limit,
                "seconds": round(time.time() - t_b, 3),
                "term_spans": _term_spans(store.table_path(segment_id, "blocks")),
            },
        )
    seg.has_blocks = True

    # stage 4d: term vectors (forward index) for vector=True fields —
    # whoosh's vector postings (.vps files, whoosh3.py W3PerDocWriter
    # add_vector_items), re-expressed as a docid-range-sorted projection
    # of the postings so a per-doc lookup is a one-row-group pruned scan
    vec_fields = sorted(f.name for f in config.fields if f.vector)
    if vec_fields and store.read_stage_marker(segment_id, "vectors") is None:
        t_v = time.time()
        vecs = postings.where(F.col("field").isin(vec_fields)).select(
            "docid", "field", "term", "weight"
        )
        vecs.repartitionByRange(max(1, sp // 8), "docid").sortWithinPartitions(
            "docid", "field", "term"
        ).write.mode("overwrite").parquet(store.table_path(segment_id, "vectors"))
        store.write_stage_marker(
            segment_id,
            "vectors",
            {"fields": vec_fields, "seconds": round(time.time() - t_v, 3)},
        )
    if vec_fields:
        seg.meta["vector_fields"] = vec_fields

    seg.meta["build_seconds"] = round(time.time() - t0, 3)
    manifest.segments.append(seg)
    manifest.next_docid = base + doc_count
    return store.commit(manifest)
