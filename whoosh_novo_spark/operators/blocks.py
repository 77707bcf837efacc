"""Posting blocks: delta + varbyte doc gaps, skip pointers, block-max stats.

Mirrors the reference's on-disk posting-block layout semantics
(``whoosh3.py:766-876``): postings are grouped term-major into blocks of
<=128, each block storing per-block metadata used for skipping
(``last_id`` -> our ``max_docid``; ``max_weight``/``min_length`` ->
block-max quality bounds, whoosh3.py:806-824) and delta-encoded docids
(``numlists.py:23-34``) with varbyte compression (``varints.py:38-103``).

We re-express, not copy: docid gaps are varbyte-encoded with a fully
vectorized numpy codec (7-bit little-endian groups, continuation bit on
non-final bytes — the classic public varint wire format); weights are a
float32 array (the reference stores weights as array('f'), whoosh3.py:772)
and quantized lengths a uint8 array.

The block table is what the WAND/MaxScore kernel (operators/wand.py)
scans; the plain postings table remains the exact-path source of truth.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from whoosh_novo_spark.functions.quantize import byte_to_length_np, length_to_byte_np

BLOCKS_SCHEMA = (
    "field string, term string, block_no int, n int, min_docid long, "
    "max_docid long, max_weight double, min_len_q int, "
    "ids binary, weights binary, lens binary"
)


# ---------------------------------------------------------------- codec

def _vb_encode_arr(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized varbyte encode -> (byte array, bytes-per-value array)."""
    vals = np.asarray(values, dtype=np.uint64)
    if len(vals) == 0:
        return np.zeros(0, dtype=np.uint8), np.zeros(0, dtype=np.int64)
    nb = np.ones(len(vals), dtype=np.int64)
    v = vals >> np.uint64(7)
    while v.any():
        nb += (v > 0).astype(np.int64)
        v >>= np.uint64(7)
    ends = np.cumsum(nb)
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    idx = ends - nb
    v = vals.copy()
    remaining = nb.copy()
    while True:
        m = remaining > 0
        if not m.any():
            break
        byte = (v[m] & np.uint64(0x7F)).astype(np.uint8)
        cont = np.where(remaining[m] > 1, 0x80, 0).astype(np.uint8)
        out[idx[m]] = byte | cont
        idx[m] += 1
        v[m] >>= np.uint64(7)
        remaining[m] -= 1
    return out, nb


def vb_encode(values: np.ndarray) -> bytes:
    """Vectorized varbyte encode of a uint64 array."""
    out, _nb = _vb_encode_arr(values)
    return out.tobytes()


def vb_decode(buf: bytes) -> np.ndarray:
    """Vectorized varbyte decode -> uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.zeros(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    vidx = np.zeros(len(b), dtype=np.int64)
    vidx[1:] = np.cumsum(is_last[:-1])
    group_starts = np.concatenate(([0], np.nonzero(is_last)[0][:-1] + 1))
    pos = np.arange(len(b), dtype=np.int64) - group_starts[vidx]
    vals = np.zeros(int(is_last.sum()), dtype=np.uint64)
    np.bitwise_or.at(
        vals, vidx, (b & np.uint8(0x7F)).astype(np.uint64) << (7 * pos).astype(np.uint64)
    )
    return vals


def encode_ids(docids: np.ndarray) -> bytes:
    """delta (first absolute, then gaps) + varbyte."""
    d = np.asarray(docids, dtype=np.int64)
    gaps = np.empty(len(d), dtype=np.uint64)
    gaps[0] = d[0]
    gaps[1:] = (d[1:] - d[:-1]).astype(np.uint64)
    return vb_encode(gaps)


def decode_ids(buf: bytes) -> np.ndarray:
    gaps = vb_decode(buf).astype(np.int64)
    return np.cumsum(gaps)


# ---------------------------------------------------------------- build

def build_blocks(
    spark: SparkSession, postings: DataFrame, block_limit: int = 128
) -> DataFrame:
    """Fold the sorted postings table into block rows.

    No shuffle: postings parquet is already range-partitioned and sorted by
    (field, term, docid) (build.py stage 3); blocks are formed within each
    partition from consecutive runs.  A term whose postings span partition
    boundaries simply yields blocks in both partitions — block docid ranges
    stay disjoint and sorted, which is all the kernel needs.
    """
    cols = postings.select("field", "term", "docid", "weight", "len_q")

    def fold(batches):
        # accumulate the tail run across Arrow batches within a partition
        tail: pd.DataFrame | None = None
        for pdf in batches:
            if tail is not None:
                pdf = pd.concat([tail, pdf], ignore_index=True)
            if len(pdf) == 0:
                continue
            # keep the last (field, term) run as the tail (it may continue
            # into the next batch)
            last_f = pdf["field"].iloc[-1]
            last_t = pdf["term"].iloc[-1]
            is_tail = (pdf["field"] == last_f) & (pdf["term"] == last_t)
            tail = pdf.loc[is_tail].copy()
            body = pdf.loc[~is_tail]
            if len(body):
                yield _fold_runs(body, block_limit)
        if tail is not None and len(tail):
            yield _fold_runs(tail, block_limit)

    return cols.mapInPandas(fold, BLOCKS_SCHEMA)


def build_blocks_from_path(
    spark: SparkSession, postings_path: str, block_limit: int = 128
) -> DataFrame:
    """``build_blocks`` reading the sorted postings parquet DIRECTLY with
    pyarrow, one task per file — the fast path for the build.

    The DataFrame route ships every posting row through the JVM parquet
    reader and the JVM->Arrow->pandas boundary just to re-fold it in
    Python (guide §4.1: the Python boundary cost is per-byte); at 1M docs
    that boundary measured 29 s of the 60 s build.  Here each task hands
    its file to pyarrow's C++ reader and only the ~n/128 folded block rows
    (plus the encoded blobs) cross back to the JVM.  Files are written by
    ``repartitionByRange(field, term, docid).sortWithinPartitions``, so a
    file is exactly one sorted partition: folding per file yields the same
    disjoint, sorted block runs as folding per partition.

    Falls back to the DataFrame route when the path has a non-local scheme
    Python workers can't open directly (e.g. hdfs://)."""
    import os

    from urllib.parse import urlparse

    scheme = urlparse(postings_path).scheme
    if scheme not in ("", "file"):
        return build_blocks(
            spark, spark.read.parquet(postings_path), block_limit
        )
    local = postings_path[7:] if postings_path.startswith("file://") else postings_path
    files = sorted(
        os.path.join(local, fn)
        for fn in os.listdir(local)
        if fn.endswith(".parquet")
    )
    if not files:
        return build_blocks(
            spark, spark.read.parquet(postings_path), block_limit
        )
    paths = spark.createDataFrame(
        [(p,) for p in files], "path string"
    ).repartition(len(files))

    def fold_files(batches):
        for pdf in batches:
            for p in pdf["path"]:
                out = _fold_file(p, block_limit)
                if len(out):
                    yield out

    return paths.mapInPandas(fold_files, BLOCKS_SCHEMA)


def fold_blocks_local(
    postings_path: str,
    out_path: str,
    block_limit: int = 128,
    max_bytes: int = 64 * 1024 * 1024,
) -> bool:
    """Driver-side block fold for SMALL local postings tables (r6): a
    tiny build was paying a scheduled Spark job (createDataFrame +
    Python-worker spin-up + distributed write, ~1.5-2 s) to fold a few
    MB of postings.  Folds every file in-process with the same
    _fold_file kernel and writes one parquet file with the exact
    mapInPandas output schema.  Returns False (caller uses the
    distributed route) for non-local schemes or tables over
    ``max_bytes``."""
    import os
    import shutil

    from urllib.parse import urlparse

    if urlparse(postings_path).scheme not in ("", "file"):
        return False
    local = postings_path[7:] if postings_path.startswith("file://") else postings_path
    if not os.path.isdir(local):
        return False
    files, total = [], 0
    for fn in sorted(os.listdir(local)):
        if fn.endswith(".parquet"):
            p = os.path.join(local, fn)
            total += os.path.getsize(p)
            files.append(p)
    if not files or total > max_bytes:
        return False
    import pyarrow as pa
    import pyarrow.parquet as pq

    parts = [
        out for out in (_fold_file(p, block_limit) for p in files) if len(out)
    ]
    pdf = (
        pd.concat(parts, ignore_index=True)
        if parts
        else pd.DataFrame(
            {
                "field": pd.Series(dtype=object),
                "term": pd.Series(dtype=object),
                "block_no": pd.Series(dtype=np.int32),
                "n": pd.Series(dtype=np.int32),
                "min_docid": pd.Series(dtype=np.int64),
                "max_docid": pd.Series(dtype=np.int64),
                "max_weight": pd.Series(dtype=np.float64),
                "min_len_q": pd.Series(dtype=np.int64),
                "ids": pd.Series(dtype=object),
                "weights": pd.Series(dtype=object),
                "lens": pd.Series(dtype=object),
            }
        )
    )
    schema = pa.schema(
        [
            ("field", pa.string()),
            ("term", pa.string()),
            ("block_no", pa.int32()),
            ("n", pa.int32()),
            ("min_docid", pa.int64()),
            ("max_docid", pa.int64()),
            ("max_weight", pa.float64()),
            ("min_len_q", pa.int32()),
            ("ids", pa.binary()),
            ("weights", pa.binary()),
            ("lens", pa.binary()),
        ]
    )
    table = pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)
    out_local = out_path[7:] if out_path.startswith("file://") else out_path
    tmp = out_local + "._local_tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(table, os.path.join(tmp, "part-00000.parquet"), compression="zstd")
    open(os.path.join(tmp, "_SUCCESS"), "w").close()
    shutil.rmtree(out_local, ignore_errors=True)
    os.replace(tmp, out_local)
    return True


def _fold_file(path: str, block_limit: int) -> pd.DataFrame:
    """Fold one sorted postings parquet file into block rows (pyarrow
    native read; only per-block values materialize as Python objects)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["field", "term", "docid", "weight", "len_q"])
    n = t.num_rows
    if n == 0:
        return pd.DataFrame()
    docids = t.column("docid").to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    weights = t.column("weight").to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    lens_q = t.column("len_q").to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    fdict = pc.dictionary_encode(t.column("field").combine_chunks())
    tdict = pc.dictionary_encode(t.column("term").combine_chunks())
    fcodes = fdict.indices.to_numpy(zero_copy_only=False)
    tcodes = tdict.indices.to_numpy(zero_copy_only=False)
    change = np.ones(n, dtype=bool)
    if n > 1:
        change[1:] = (tcodes[1:] != tcodes[:-1]) | (fcodes[1:] != fcodes[:-1])
    fvals = np.asarray(fdict.dictionary.to_pylist(), dtype=object)
    tvals = np.asarray(tdict.dictionary.to_pylist(), dtype=object)
    return _fold_core(
        docids, weights, lens_q, change,
        lambda idx: fvals[fcodes[idx]],
        lambda idx: tvals[tcodes[idx]],
        block_limit,
    )


def _fold_runs(pdf: pd.DataFrame, block_limit: int) -> pd.DataFrame:
    """Fold sorted postings into block rows — fully vectorized: per-block
    stats via reduceat, ONE varbyte encode over every delta, byte streams
    sliced per block."""
    n = len(pdf)
    fields = pdf["field"].to_numpy()
    terms = pdf["term"].to_numpy()
    docids = pdf["docid"].to_numpy(dtype=np.int64)
    weights = pdf["weight"].to_numpy(dtype=np.float64)
    lens_q = pdf["len_q"].to_numpy(dtype=np.int64)
    # run boundaries where (field, term) changes
    change = np.ones(n, dtype=bool)
    if n > 1:
        change[1:] = (terms[1:] != terms[:-1]) | (fields[1:] != fields[:-1])
    return _fold_core(
        docids, weights, lens_q, change,
        lambda idx: fields[idx],
        lambda idx: terms[idx],
        block_limit,
    )


def _fold_core(
    docids: np.ndarray,
    weights: np.ndarray,
    lens_q: np.ndarray,
    change: np.ndarray,
    field_vals,
    term_vals,
    block_limit: int,
) -> pd.DataFrame:
    """Shared vectorized fold: ``change`` marks (field, term) run starts;
    ``field_vals``/``term_vals`` gather the string values for an index
    array (kept as callables so the arrow path materializes only the
    per-block strings)."""
    n = len(docids)
    run_start_idx = np.maximum.accumulate(np.where(change, np.arange(n), 0))
    pos_in_run = np.arange(n) - run_start_idx
    bstart = change | (pos_in_run % block_limit == 0)
    bstarts = np.nonzero(bstart)[0]
    bends = np.append(bstarts[1:], n)

    # per-block stats (skip pointers + block-max metadata)
    max_weight = np.maximum.reduceat(weights, bstarts)
    min_len_q = np.minimum.reduceat(lens_q, bstarts)
    min_docid = docids[bstarts]
    max_docid = docids[bends - 1]  # skip pointer (last_id)
    block_no = (pos_in_run[bstarts] // block_limit).astype(np.int32)

    # delta gaps: absolute at block starts, then in-block gaps
    gaps = np.empty(n, dtype=np.uint64)
    gaps[0] = docids[0]
    gaps[1:] = (docids[1:] - docids[:-1]).astype(np.uint64)
    gaps[bstarts] = docids[bstarts].astype(np.uint64)
    enc, nb = _vb_encode_arr(gaps)
    byte_ends = np.cumsum(nb)
    blk_b_end = byte_ends[bends - 1]
    blk_b_start = np.concatenate(([0], blk_b_end[:-1]))
    enc_bytes = enc.tobytes()
    w32 = weights.astype(np.float32).tobytes()
    lcodes = length_to_byte_np(lens_q).astype(np.uint8).tobytes()

    # store the 8-bit length CODE (numeric.py:635-641), not the
    # dequantized length (which can exceed a byte)
    return pd.DataFrame(
        {
            "field": field_vals(bstarts),
            "term": term_vals(bstarts),
            "block_no": block_no,
            "n": (bends - bstarts).astype(np.int32),
            "min_docid": min_docid,
            "max_docid": max_docid,
            "max_weight": max_weight,
            "min_len_q": min_len_q,
            "ids": [
                enc_bytes[s:e] for s, e in zip(blk_b_start.tolist(), blk_b_end.tolist())
            ],
            "weights": [w32[s * 4 : e * 4] for s, e in zip(bstarts.tolist(), bends.tolist())],
            "lens": [lcodes[s:e] for s, e in zip(bstarts.tolist(), bends.tolist())],
        }
    )


def decode_block(row) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(docids int64, weights float64, len_q int64) from a block row."""
    ids = decode_ids(row["ids"])
    w = np.frombuffer(row["weights"], dtype=np.float32).astype(np.float64)
    lq = decode_lens(row["lens"])
    return ids, w, lq


def decode_lens(buf: bytes) -> np.ndarray:
    """uint8 length codes -> quantized lengths (BM25's fl input)."""
    return byte_to_length_np(np.frombuffer(buf, dtype=np.uint8).astype(np.int64))
