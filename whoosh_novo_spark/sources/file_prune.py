"""File-level (field, term) min/max pruning for postings-shaped tables.

The postings and blocks tables are range-partitioned and sorted by
(field, term, docid) at build time (operators/build.py stage 3c), so each
parquet FILE covers a contiguous lexicographic (field, term) span.  Spark
only prunes parquet at ROW-GROUP granularity *inside* each scheduled task
— a term query over a 256-file segment still schedules 256 tasks that
mostly open a footer and skip.  At web scale (millions of files) that is
the difference between a point lookup and a full-metadata scan; table
formats solve it with file-level min/max manifests (Iceberg's
``lower_bounds``/``upper_bounds`` per data file, pruned at plan time).

This module is that manifest, derived from the parquet footers the files
already carry: read each file's (field, term) min/max ONCE driver-side
(cached on the Index), and at query time hand Spark only the files whose
span can contain the requested terms.  Correctness never depends on the
pruning — callers keep their full ``.where`` filters, and any file whose
statistics are missing or untrustworthy is always included.

Reference parity note: this plays the role of whoosh's term-dictionary
seek (OrderedHashWriter's sorted keys + block index, whoosh3.py) — the
reason a whoosh term lookup is O(log n) and not a full .pst scan.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

# parquet-mr may truncate BYTE_ARRAY row-group statistics for long values;
# a truncated max is NOT a valid upper bound unless the writer padded it.
# Typical index terms are far shorter; anything at/over this length is
# treated as untrustworthy and the file is kept.
_TRUNC_GUARD = 60


@dataclass(frozen=True)
class FileRange:
    """One data file's (field, term) span.  ``lo``/``hi`` are (field, term)
    tuples; ``None`` means statistics were unavailable -> always include."""

    path: str
    lo: tuple[str, str] | None
    hi: tuple[str, str] | None


def _file_minmax(pf) -> tuple | None:
    """(min_field, min_term, max_field, max_term) over all row groups of an
    open pyarrow ParquetFile, or None if any statistic is missing."""
    md = pf.metadata
    names = pf.schema_arrow.names
    try:
        fi, ti = names.index("field"), names.index("term")
    except ValueError:
        return None
    mins, maxs = [], []
    for rg in range(md.num_row_groups):
        sf = md.row_group(rg).column(fi).statistics
        st = md.row_group(rg).column(ti).statistics
        if sf is None or st is None or not sf.has_min_max or not st.has_min_max:
            return None
        f_lo, f_hi = sf.min, sf.max
        t_lo, t_hi = st.min, st.max
        if isinstance(f_lo, bytes):  # stats may surface as bytes
            try:
                f_lo, f_hi = f_lo.decode(), f_hi.decode()
                t_lo, t_hi = t_lo.decode(), t_hi.decode()
            except UnicodeDecodeError:
                return None
        if len(str(t_hi)) >= _TRUNC_GUARD or len(str(f_hi)) >= _TRUNC_GUARD:
            return None  # possibly truncated upper bound: keep the file
        # row groups are sorted within the file, but take a true min/max
        # anyway so the span is correct regardless
        mins.append((f_lo, t_lo))
        maxs.append((f_hi, t_hi))
    if not mins:
        return None
    return min(mins) + max(maxs)


def scan_file_ranges(dirs: list[str]) -> list[FileRange] | None:
    """Read (field, term) spans from every parquet file under ``dirs``.

    One driver-side footer read per file, done once per Index and cached
    by the caller (a persistent deployment would store these bounds in the
    segment manifest at build commit, exactly like an Iceberg manifest —
    the footer read here keeps old indexes pruned with zero migration).
    Returns None if pyarrow is unavailable.
    """
    try:
        import pyarrow.parquet as pq
    except ImportError:  # pragma: no cover - pyarrow is baked into the env
        return None
    out: list[FileRange] = []
    for d in dirs:
        if not os.path.isdir(d):
            continue
        for name in sorted(os.listdir(d)):
            if not name.endswith(".parquet") or name.startswith((".", "_")):
                continue
            path = os.path.join(d, name)
            try:
                pf = pq.ParquetFile(path)
                if pf.metadata.num_rows == 0:
                    # empty file: a span that can't contain any real key
                    out.append(FileRange(path, ("", ""), ("", "")))
                    continue
                mm = _file_minmax(pf)
            except Exception:
                mm = None
            if mm is None:
                out.append(FileRange(path, None, None))
            else:
                out.append(FileRange(path, (mm[0], mm[1]), (mm[2], mm[3])))
    return out


def ranges_to_json(ranges: list[FileRange]) -> dict:
    """Serializable {basename: [min_f, min_t, max_f, max_t] | None} form
    for persisting spans into a build-stage marker (the segment-local
    equivalent of an Iceberg manifest's per-file lower/upper bounds)."""
    out = {}
    for fr in ranges:
        key = os.path.basename(fr.path)
        out[key] = None if fr.lo is None else [*fr.lo, *fr.hi]
    return out


def ranges_from_json(directory: str, payload: dict) -> list[FileRange] | None:
    """Rehydrate marker spans against the files actually present; None if
    the directory's files don't match the recorded set (stale marker ->
    caller falls back to a footer scan)."""
    try:
        present = {
            n
            for n in os.listdir(directory)
            if n.endswith(".parquet") and not n.startswith((".", "_"))
        }
    except OSError:
        return None
    if present != set(payload):
        return None
    out = []
    for name in sorted(present):
        v = payload[name]
        p = os.path.join(directory, name)
        if v is None:
            out.append(FileRange(p, None, None))
        else:
            out.append(FileRange(p, (v[0], v[1]), (v[2], v[3])))
    return out


def prune_files(
    ranges: list[FileRange],
    fieldname: str | None = None,
    terms: list[str] | None = None,
    lo: str | None = None,
    hi: str | None = None,
    pairs: list[tuple[str, str]] | None = None,
) -> list[str] | None:
    """Files whose span can contain the requested keys.

    ``pairs``: exact (field, term) keys; ``terms``: exact term list within
    ``fieldname``; else a term range [lo, hi] within the field
    (``lo``/``hi`` None = unbounded on that side; ``hi`` is treated
    inclusively — callers re-filter, so an over-inclusive bound only costs
    one extra file).  Returns None when pruning is not applicable (no
    usable statistics), meaning "read everything".
    """
    if not ranges:
        return None
    if pairs is None and terms is not None:
        pairs = [(fieldname, t) for t in terms]
    if pairs is not None and len(pairs) * len(ranges) > 4_000_000:
        return None  # driver-side check would cost more than the scan
    keep: list[str] = []
    for fr in ranges:
        if fr.lo is None or fr.hi is None:
            keep.append(fr.path)
            continue
        if pairs is not None:
            if any(fr.lo <= k <= fr.hi for k in pairs):
                keep.append(fr.path)
            continue
        # range within one field: overlap of [(f, lo..), (f, ..hi)] with span
        q_lo = (fieldname, lo) if lo is not None else (fieldname, "")
        if fr.hi < q_lo:
            continue
        if hi is not None and fr.lo > (fieldname, hi):
            continue
        if fr.lo[0] > fieldname:  # span starts past the field entirely
            continue
        keep.append(fr.path)
    return keep


def segment_ranges(store, segments, table: str) -> list[FileRange]:
    """Load the (field, term) span ranges for every segment of a store's
    ``table``: prefer the build-time span manifest in the segment's stage
    marker (written by the sink/merge — zero footer I/O at query time),
    fall back to a one-off footer scan when the marker is stale or
    absent.  Shared by Index._file_ranges and FederatedIndex._part_ranges
    so the marker format / fallback policy lives in exactly one place."""
    combined: list[FileRange] = []
    for seg in segments:
        d = store.table_path(seg.segment_id, table)
        got = None
        marker = store.read_stage_marker(seg.segment_id, table)
        spans = (marker or {}).get("term_spans")
        if spans is not None:
            got = ranges_from_json(d, spans)
        if got is None:
            got = scan_file_ranges([d])
        combined.extend(got or [])
    return combined
