"""Segment store: immutable parquet segments + atomic manifest generations.

Plays the role of whoosh's TOC/generation machinery
(``/root/reference/src/whoosh/index.py:372-402,575+``,
``writing.py:922-929``): a *commit* writes the new segment's data files and
then atomically publishes a new ``manifest-<gen>.json`` via tmp-write +
rename of the ``LATEST`` pointer.  Readers resolve LATEST -> manifest ->
segment paths, so reads are snapshot-isolated and lock-free, exactly like
whoosh's immutable-segment reads (and like an Iceberg snapshot commit — on
a real deployment these tables would be Iceberg tables and a commit would
be an Iceberg transaction; this module keeps that swap localized).

Per-segment tables (all parquet, zstd):
- ``docmap``     (docid, <id_col>, pid, ...stored cols): docid assignment
- ``postings``   (field, term, docid, weight, tf, len_q[, positions])
                 sorted by (field, term, docid) via range repartition so
                 parquet row-group min/max stats prune term lookups
- ``terms``      per-(field,term) stats: df, cf, max_weight, min_len_q,
                 min_docid, max_docid   (TermInfo, reading.py:61-139)
- ``blocks``     block-max skip metadata + varbyte posting blocks
- ``tombstones`` deleted docids (applied at read, like whoosh per-segment
                 deleted sets, whoosh3.py:1340-1351)

Manifest stats: exact ``doc_count`` and per-field exact ``field_length``
totals — whoosh keeps the exact totals even though per-doc lengths are
quantized (whoosh3.py:242-243,287; SURVEY §1.4).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field


@dataclass
class SegmentInfo:
    segment_id: str
    doc_count: int
    field_length: dict[str, int]
    min_docid: int
    max_docid: int
    has_blocks: bool = False
    has_positions: bool = False
    meta: dict = field(default_factory=dict)

    def to_json(self) -> dict:
        return {
            "segment_id": self.segment_id,
            "doc_count": self.doc_count,
            "field_length": self.field_length,
            "min_docid": self.min_docid,
            "max_docid": self.max_docid,
            "has_blocks": self.has_blocks,
            "has_positions": self.has_positions,
            "meta": self.meta,
        }

    @staticmethod
    def from_json(d: dict) -> "SegmentInfo":
        return SegmentInfo(
            d["segment_id"], d["doc_count"], d["field_length"],
            d["min_docid"], d["max_docid"], d.get("has_blocks", False),
            d.get("has_positions", False), d.get("meta", {}),
        )


@dataclass
class Manifest:
    generation: int
    segments: list[SegmentInfo]
    next_docid: int
    id_col: str
    deleted_count: int = 0
    has_tombstones: bool = False
    # versioned tombstone table (tombstones-<n>), referenced from the
    # committed manifest so readers resolve it through the atomic LATEST
    # pointer — a crash between writes can never leave a manifest pointing
    # at a missing/partial tombstone dir (ADVICE r1)
    tombstones_rel: str | None = None

    @property
    def doc_count_all(self) -> int:
        """Includes deleted docs — BM25's dc statistic deliberately counts
        deleted documents (scoring.py:50-56 uses doc_count_all)."""
        return sum(s.doc_count for s in self.segments)

    def field_length(self, fld: str) -> int:
        return sum(s.field_length.get(fld, 0) for s in self.segments)

    def doc_count_for(self, fld: str | None) -> int:
        """Per-field document count for BM25's dc statistic.  Plain
        fields: doc_count_all (whoosh semantics).  Virtual per-language
        fields of a lang-routed build (segment meta carries
        ``field_doc_count``): the number of docs whose row routed to
        that language — so idf/avgfl over "text@de" match a de-only
        build exactly.  Per segment: a routed segment missing the key
        holds ZERO docs of that language; a segment with no routing
        info at all (legacy / plain build) contributes its full
        doc_count."""
        if fld is None:
            return self.doc_count_all
        base_prefix = fld.split("@", 1)[0] + "@"
        total, any_routed = 0, False
        for s in self.segments:
            fdc = s.meta.get("field_doc_count", {})
            if fld in fdc:
                total += int(fdc[fld])
                any_routed = True
            elif any(k.startswith(base_prefix) for k in fdc):
                any_routed = True  # routed segment, zero docs of this lang
            else:
                total += s.doc_count
        return total if any_routed else self.doc_count_all

    def avg_field_length(self, fld: str) -> float:
        """searching.py:275-278: field_length / doc_count (or 1);
        lang-routed virtual fields divide by their per-language count."""
        return self.field_length(fld) / (self.doc_count_for(fld) or 1)


class LockError(Exception):
    """Another writer holds the index (whoosh index.LockError parity)."""


class SegmentStore:
    def __init__(self, path: str):
        self.path = path
        self._lock_depth = 0  # instance-level reentrancy (update = delete+build)
        os.makedirs(os.path.join(path, "segments"), exist_ok=True)

    # --- writer lock (whoosh's index write lock, writing.py/index.py) ---
    # Single-host advisory lock: O_EXCL lockfile with pid + timestamp;
    # stale locks (dead pid or too old) are broken.  On a real multi-host
    # deployment the manifest commit would be an Iceberg/catalog
    # transaction and this file is unnecessary — the swap-in point is
    # commit(), same as the rest of this module.
    def _lock_path(self) -> str:
        return os.path.join(self.path, "WRITE_LOCK")

    def acquire_writer_lock(self, timeout_sec: float = 0.0, stale_sec: float = 3600.0) -> None:
        if self._lock_depth > 0:
            self._lock_depth += 1
            return
        deadline = time.time() + timeout_sec
        while True:
            try:
                fd = os.open(self._lock_path(), os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(
                    fd, json.dumps({"pid": os.getpid(), "ts": time.time()}).encode()
                )
                os.close(fd)
                self._lock_depth = 1
                return
            except FileExistsError:
                try:
                    with open(self._lock_path()) as f:
                        meta = json.load(f)
                except Exception:
                    meta = {}
                pid = meta.get("pid")
                dead = False
                if pid is not None:
                    try:
                        os.kill(int(pid), 0)
                    except (ProcessLookupError, ValueError):
                        dead = True
                    except PermissionError:
                        pass
                if dead or time.time() - meta.get("ts", 0) > stale_sec:
                    try:
                        os.unlink(self._lock_path())
                    except FileNotFoundError:
                        pass
                    continue
                if time.time() >= deadline:
                    raise LockError(
                        f"index at {self.path} is locked by writer pid={pid}"
                    ) from None
                time.sleep(0.2)

    def release_writer_lock(self) -> None:
        if self._lock_depth > 1:
            self._lock_depth -= 1
            return
        self._lock_depth = 0
        try:
            os.unlink(self._lock_path())
        except FileNotFoundError:
            pass

    def writer_lock(self, timeout_sec: float = 0.0):
        from contextlib import contextmanager

        @contextmanager
        def _cm():
            self.acquire_writer_lock(timeout_sec)
            try:
                yield self
            finally:
                self.release_writer_lock()

        return _cm()

    # --- paths ---
    def segment_dir(self, segment_id: str) -> str:
        return os.path.join(self.path, "segments", segment_id)

    def table_path(self, segment_id: str, table: str) -> str:
        return os.path.join(self.segment_dir(segment_id), table)

    def table_paths(self, manifest: Manifest, table: str) -> list[str]:
        out = []
        for s in manifest.segments:
            p = self.table_path(s.segment_id, table)
            if os.path.exists(p):
                out.append(p)
        return out

    def tombstones_path(self) -> str:
        """Legacy unversioned location (pre-r2 stores only)."""
        return os.path.join(self.path, "tombstones")

    def tombstones_dir(self, manifest: Manifest) -> str | None:
        """The tombstone table the given manifest references, or None."""
        if manifest.tombstones_rel:
            return os.path.join(self.path, manifest.tombstones_rel)
        if manifest.has_tombstones and os.path.exists(self.tombstones_path()):
            return self.tombstones_path()
        return None

    def new_tombstones_rel(self) -> str:
        return f"tombstones-{self.current_generation() + 1}"

    def staging_path(self, name: str) -> str:
        return os.path.join(self.path, "_staging", name)

    # --- manifest generations ---
    def _latest_file(self) -> str:
        return os.path.join(self.path, "LATEST")

    def current_generation(self) -> int:
        try:
            with open(self._latest_file()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    def read_manifest(self) -> Manifest:
        gen = self.current_generation()
        if gen == 0:
            return Manifest(0, [], 0, "url")
        with open(os.path.join(self.path, f"manifest-{gen}.json")) as f:
            d = json.load(f)
        return Manifest(
            d["generation"],
            [SegmentInfo.from_json(s) for s in d["segments"]],
            d["next_docid"],
            d.get("id_col", "url"),
            d.get("deleted_count", 0),
            d.get("has_tombstones", False),
            d.get("tombstones_rel"),
        )

    def commit(self, manifest: Manifest) -> Manifest:
        """Atomic generation bump: write manifest-<gen>, rename LATEST."""
        gen = self.current_generation() + 1
        manifest.generation = gen
        doc = {
            "generation": gen,
            "segments": [s.to_json() for s in manifest.segments],
            "next_docid": manifest.next_docid,
            "id_col": manifest.id_col,
            "deleted_count": manifest.deleted_count,
            "has_tombstones": manifest.has_tombstones,
            "tombstones_rel": manifest.tombstones_rel,
            "committed_at": time.time(),
        }
        with open(os.path.join(self.path, f"manifest-{gen}.json"), "w") as f:
            json.dump(doc, f, indent=1)
        tmp = self._latest_file() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(gen))
        os.replace(tmp, self._latest_file())  # atomic publish
        return manifest

    def new_segment_id(self) -> str:
        existing = sorted(os.listdir(os.path.join(self.path, "segments")))
        n = int(existing[-1].split("-")[1]) + 1 if existing else 0
        return f"seg-{n:05d}"

    # --- build-manifest / lineage (per-partition metrics for resume) ---
    def write_stage_marker(self, segment_id: str, stage: str, payload: dict) -> None:
        d = self.segment_dir(segment_id)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, f"_stage_{stage}.json"), "w") as f:
            json.dump(payload, f)

    def read_stage_marker(self, segment_id: str, stage: str) -> dict | None:
        p = os.path.join(self.segment_dir(segment_id), f"_stage_{stage}.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)
