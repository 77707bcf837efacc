"""Read-only Apache Iceberg table support (pure metadata walk, no jars).

The north-rule input is "an Iceberg table of Common-Crawl-style web
pages"; this environment has no iceberg-spark runtime jar, so the
snapshot machinery is implemented directly from the public Iceberg
table spec (https://iceberg.apache.org/spec/): a table is a directory
with ``metadata/v*.metadata.json`` files, each naming snapshots whose
``manifest-list`` Avro file lists manifest Avro files, which list the
parquet data files with their partition values and row counts.  The
walk is DRIVER-SIDE and tiny (metadata scales with file count, not
rows); the data read is an ordinary ``spark.read.parquet`` over exactly
the selected files — pushdown, column pruning and whole-stage codegen
are untouched.

What this supports (and tests gate):
- current-snapshot reads, snapshot-id reads, and timestamp time travel
  (``as_of_ms``) — the crawl-pipeline "reindex yesterday's table state"
  operation;
- plan-time PARTITION PRUNING from manifest partition values
  (identity transforms): ``partition_filter={"lang": "en"}`` or
  ``{"day": (lo, hi)}`` selects matching data files before Spark ever
  lists a path — at 10^12 docs this is the difference between touching
  one day's files and listing the whole table;
- appends across snapshots (new manifest per snapshot; manifest list
  carries prior manifests forward).

Honest limits (fail loudly, never silently wrong): delete files
(v2 row-level deletes) raise ``NotImplementedError``; DELETED manifest
entries are honored (their files are skipped); non-identity partition
transforms disable pruning for that field rather than mis-pruning.

``write_iceberg_table``/``append_snapshot`` produce spec-shaped
metadata so tests can build multi-snapshot tables without an external
writer; the avro container I/O lives in ``sources/avro_io.py``.
"""

from __future__ import annotations

import glob
import json
import os
import re
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from whoosh_novo_spark.sources.avro_io import read_ocf, write_ocf


@dataclass
class DataFileInfo:
    path: str
    partition: dict
    record_count: int
    file_size: int


@dataclass
class IcebergTable:
    location: str
    meta: dict = field(default_factory=dict)

    def __post_init__(self):
        if not self.meta:
            self.meta = _load_metadata(self.location)

    # --- snapshots -------------------------------------------------------

    @property
    def snapshots(self) -> list[dict]:
        return self.meta.get("snapshots", [])

    @property
    def current_snapshot_id(self):
        return self.meta.get("current-snapshot-id")

    def snapshot(self, snapshot_id=None, as_of_ms=None) -> dict:
        snaps = self.snapshots
        if not snaps:
            raise ValueError(f"iceberg table has no snapshots: {self.location}")
        if snapshot_id is not None:
            for s in snaps:
                if s["snapshot-id"] == snapshot_id:
                    return s
            raise ValueError(f"unknown snapshot-id {snapshot_id}")
        if as_of_ms is not None:
            live = [s for s in snaps if s["timestamp-ms"] <= as_of_ms]
            if not live:
                raise ValueError(f"no snapshot at or before {as_of_ms}")
            return max(live, key=lambda s: s["timestamp-ms"])
        cur = self.current_snapshot_id
        for s in snaps:
            if s["snapshot-id"] == cur:
                return s
        return snaps[-1]

    def _identity_fields(self) -> set[str]:
        """Partition field names safe to prune on (identity transform)."""
        out = set()
        for spec in self.meta.get("partition-specs", []):
            for f in spec.get("fields", []):
                if f.get("transform") == "identity":
                    out.add(f["name"])
        return out

    # --- file listing ----------------------------------------------------

    def _schema_fields(self) -> dict[str, tuple[int, str]]:
        """column name -> (field id, iceberg type) of the current schema."""
        sid = self.meta.get("current-schema-id", 0)
        for s in self.meta.get("schemas", []):
            if s.get("schema-id") == sid:
                return {f["name"]: (f["id"], f["type"]) for f in s["fields"]}
        return {}

    def data_files(
        self,
        snapshot_id=None,
        as_of_ms=None,
        partition_filter: dict | None = None,
        column_filter: dict | None = None,
    ) -> list[DataFileInfo]:
        snap = self.snapshot(snapshot_id, as_of_ms)
        mlist_path = self._local(snap["manifest-list"])
        _, manifests = read_ocf(mlist_path)
        prunable = self._identity_fields() if partition_filter else set()
        fields = self._schema_fields() if column_filter else {}
        out: list[DataFileInfo] = []
        for m in manifests:
            if m.get("content", 0) not in (0, None):
                raise NotImplementedError(
                    "iceberg delete manifests (v2 row-level deletes) are not supported"
                )
            _, entries = read_ocf(self._local(m["manifest_path"]))
            for e in entries:
                if e.get("status") == 2:  # DELETED
                    continue
                df = e["data_file"]
                if df.get("content", 0) not in (0, None):
                    raise NotImplementedError("iceberg delete files are not supported")
                fmt = (df.get("file_format") or "PARQUET").upper()
                if fmt != "PARQUET":
                    raise NotImplementedError(f"iceberg {fmt} data files not supported")
                part = df.get("partition") or {}
                if partition_filter and not _part_match(
                    part, partition_filter, prunable
                ):
                    continue
                if column_filter and not _bounds_match(df, column_filter, fields):
                    continue
                out.append(
                    DataFileInfo(
                        path=self._local(df["file_path"]),
                        partition=part,
                        record_count=int(df.get("record_count", 0)),
                        file_size=int(df.get("file_size_in_bytes", 0)),
                    )
                )
        return out

    def spark_schema(self) -> str:
        """The table's CURRENT schema as a Spark DDL string (column order
        and types from the Iceberg schema, not from whichever parquet
        file happens to be read first)."""
        cols = []
        for name, (_fid, t) in self._schema_fields().items():
            cols.append(f"`{name}` {_ICE_TO_SPARK.get(t, 'string')}")
        return ", ".join(cols)

    def read(
        self,
        spark: SparkSession,
        snapshot_id=None,
        as_of_ms=None,
        partition_filter: dict | None = None,
        column_filter: dict | None = None,
    ) -> DataFrame:
        files = self.data_files(snapshot_id, as_of_ms, partition_filter, column_filter)
        if not files:
            raise ValueError("iceberg scan selected no data files")
        # explicit schema = additive schema evolution: files written before
        # a column existed read as null for it, and column order/types are
        # the TABLE's, not the first-listed file's.  (Identity-partition
        # columns must be present in the data files, as this module's
        # writer and Spark-written tables do.)
        ddl = self.spark_schema()
        reader = spark.read.schema(ddl) if ddl else spark.read
        return reader.parquet(*[f.path for f in files])

    def _local(self, p: str) -> str:
        """Map a stored absolute/URI path into this table's directory, so
        relocated test fixtures and file:// URIs both resolve."""
        p = re.sub(r"^file:", "", p)
        if os.path.exists(p):
            return p
        # path written by another location: re-root at our location
        marker = "/data/"
        if marker in p:
            return os.path.join(self.location, "data", p.split(marker, 1)[1])
        marker = "/metadata/"
        if marker in p:
            return os.path.join(self.location, "metadata", p.split(marker, 1)[1])
        return p


_BOUND_PACK = {"int": "<i", "long": "<q", "float": "<f", "double": "<d",
               "date": "<i", "timestamp": "<q", "timestamptz": "<q"}


def _encode_bound(ice_type: str, v) -> bytes:
    """Iceberg single-value binary serialization (spec appendix D) for the
    bound types we track: strings are UTF-8, numerics little-endian,
    dates 4-byte days-from-epoch."""
    import datetime as _dt
    import struct as _struct

    if ice_type == "string":
        return v.encode("utf-8")
    if ice_type == "date" and isinstance(v, _dt.date):
        v = (v - _dt.date(1970, 1, 1)).days
    fmt = _BOUND_PACK.get(ice_type)
    if fmt is None:
        raise ValueError(f"unsupported bound type {ice_type!r}")
    return _struct.pack(fmt, v)


def _decode_bound(ice_type: str, b: bytes):
    import datetime as _dt
    import struct as _struct

    if ice_type == "string":
        return b.decode("utf-8", errors="replace")
    fmt = _BOUND_PACK.get(ice_type)
    if fmt is None:
        return None
    v = _struct.unpack(fmt, b[: _struct.calcsize(fmt)])[0]
    if ice_type == "date":  # symmetric with _encode_bound: filters use dates
        return _dt.date(1970, 1, 1) + _dt.timedelta(days=v)
    return v


def _bound_map(raw) -> dict[int, bytes]:
    """Manifest bounds come as map<int, binary>, avro-encoded either as an
    array of {key, value} records (int keys) or a real map."""
    if not raw:
        return {}
    if isinstance(raw, dict):
        return {int(k): v for k, v in raw.items()}
    return {int(e["key"]): e["value"] for e in raw}


def _bounds_match(df: dict, flt: dict, fields: dict[str, tuple[int, str]]) -> bool:
    """Conservative column-range pruning from manifest lower/upper bounds:
    drop a file only when its bounds PROVE the range can't overlap.  Spec
    writers may truncate bounds, but truncation keeps lower <= actual min
    and upper >= actual max, so this stays conservative for any compliant
    writer.  Files or columns without bounds are always kept."""
    lo_map = _bound_map(df.get("lower_bounds"))
    hi_map = _bound_map(df.get("upper_bounds"))
    for col, want in flt.items():
        got = fields.get(col)
        if got is None:
            continue
        fid, ice_type = got
        want_lo, want_hi = want if isinstance(want, tuple) else (want, want)
        if want_lo is not None and fid in hi_map:
            upper = _decode_bound(ice_type, hi_map[fid])
            if upper is not None and upper < want_lo:
                return False
        if want_hi is not None and fid in lo_map:
            lower = _decode_bound(ice_type, lo_map[fid])
            if lower is not None and lower > want_hi:
                return False
    return True


def _part_match(part: dict, flt: dict, prunable: set[str]) -> bool:
    for col, want in flt.items():
        if col not in prunable or col not in part:
            continue  # non-identity transform or unknown field: never prune
        have = part[col]
        if isinstance(want, tuple):
            lo, hi = want
            if (lo is not None and have < lo) or (hi is not None and have > hi):
                return False
        elif have != want:
            return False
    return True


def read_iceberg(
    spark: SparkSession,
    location: str,
    snapshot_id=None,
    as_of_ms=None,
    partition_filter: dict | None = None,
    column_filter: dict | None = None,
) -> DataFrame:
    """One-call read: the input-table surface for ingest/build pipelines."""
    return IcebergTable(location).read(
        spark, snapshot_id, as_of_ms, partition_filter, column_filter
    )


# ---------------------------------------------------------------- metadata


def _load_metadata(location: str) -> dict:
    md = os.path.join(location, "metadata")
    hint = os.path.join(md, "version-hint.text")
    path = None
    if os.path.exists(hint):
        with open(hint) as f:
            v = f.read().strip()
        cand = os.path.join(md, f"v{v}.metadata.json")
        if os.path.exists(cand):
            path = cand
    if path is None:
        vs = sorted(
            glob.glob(os.path.join(md, "v*.metadata.json")),
            key=lambda p: int(re.search(r"v(\d+)\.metadata\.json$", p).group(1)),
        )
        if not vs:
            raise FileNotFoundError(f"no iceberg metadata under {md}")
        path = vs[-1]
    with open(path) as f:
        return json.load(f)


# ------------------------------------------------------------- test writer
# Spec-shaped metadata writer so tests and fixtures can create real
# multi-snapshot tables without an external Iceberg runtime.

_MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
    ],
}


def _avro_type(v) -> str:
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "long"
    if isinstance(v, float):
        return "double"
    return "string"


def _manifest_schema(partition_fields: list[tuple[str, str]]) -> dict:
    part = {
        "type": "record",
        "name": "r102",
        "fields": [
            {"name": n, "type": ["null", t], "default": None, "field-id": 1000 + i}
            for i, (n, t) in enumerate(partition_fields)
        ],
    }
    bounds_map = {
        "type": "array",
        "items": {
            "type": "record",
            "name": "k126_v127",
            "fields": [
                {"name": "key", "type": "int", "field-id": 126},
                {"name": "value", "type": "bytes", "field-id": 127},
            ],
        },
        "logicalType": "map",
    }
    data_file = {
        "type": "record",
        "name": "r2",
        "fields": [
            {"name": "content", "type": "int", "field-id": 134},
            {"name": "file_path", "type": "string", "field-id": 100},
            {"name": "file_format", "type": "string", "field-id": 101},
            {"name": "partition", "type": part, "field-id": 102},
            {"name": "record_count", "type": "long", "field-id": 103},
            {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
            {"name": "lower_bounds", "type": ["null", bounds_map], "default": None, "field-id": 125},
            {
                "name": "upper_bounds",
                "type": [
                    "null",
                    {**bounds_map, "items": {**bounds_map["items"], "name": "k129_v130"}},
                ],
                "default": None,
                "field-id": 128,
            },
        ],
    }
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"], "default": None, "field-id": 1},
            {"name": "sequence_number", "type": ["null", "long"], "default": None, "field-id": 3},
            {"name": "file_sequence_number", "type": ["null", "long"], "default": None, "field-id": 4},
            {"name": "data_file", "type": data_file, "field-id": 2},
        ],
    }


def append_snapshot(
    location: str,
    files: list[tuple[str, dict, int, int]],
    schema_fields: list[tuple[str, str]],
    partition_fields: list[tuple[str, str]] | None = None,
    ts_ms: int | None = None,
) -> int:
    """Append one snapshot listing ``files`` [(path, partition, rows,
    bytes)] to the table at ``location`` (creating it if absent).
    Returns the new snapshot id.  ``schema_fields``/``partition_fields``
    are [(name, iceberg_type)] — partition transforms are identity."""
    partition_fields = partition_fields or []
    md = os.path.join(location, "metadata")
    os.makedirs(md, exist_ok=True)
    try:
        meta = _load_metadata(location)
    except FileNotFoundError:
        meta = {
            "format-version": 2,
            "table-uuid": str(uuid.uuid5(uuid.NAMESPACE_URL, location)),
            "location": location,
            "last-sequence-number": 0,
            "last-updated-ms": 0,
            "last-column-id": len(schema_fields),
            "schemas": [
                {
                    "schema-id": 0,
                    "type": "struct",
                    "fields": [
                        {"id": i + 1, "name": n, "required": False, "type": t}
                        for i, (n, t) in enumerate(schema_fields)
                    ],
                }
            ],
            "current-schema-id": 0,
            "partition-specs": [
                {
                    "spec-id": 0,
                    "fields": [
                        {
                            "name": n,
                            "transform": "identity",
                            "source-id": next(
                                i + 1 for i, (sn, _) in enumerate(schema_fields) if sn == n
                            ),
                            "field-id": 1000 + i,
                        }
                        for i, (n, _) in enumerate(partition_fields)
                    ],
                }
            ],
            "default-spec-id": 0,
            "last-partition-id": 1000 + len(partition_fields),
            "properties": {},
            "snapshots": [],
            "snapshot-log": [],
            "sort-orders": [{"order-id": 0, "fields": []}],
            "default-sort-order-id": 0,
            "current-snapshot-id": -1,
        }
    seq = meta["last-sequence-number"] + 1
    snap_id = seq  # deterministic ids keep fixtures reproducible
    ts = ts_ms if ts_ms is not None else seq * 1000

    # additive schema evolution: names not in the current schema get fresh
    # field ids in a NEW schema entry (existing names keep their ids and
    # stored types — iceberg never reuses or renumbers ids)
    cur_schema = next(
        s for s in meta["schemas"] if s["schema-id"] == meta["current-schema-id"]
    )
    known = {f["name"] for f in cur_schema["fields"]}
    added = [(n, t) for n, t in schema_fields if n not in known]
    if added:
        nid = meta["last-column-id"]
        fields2 = list(cur_schema["fields"])
        for n, t in added:
            nid += 1
            fields2.append({"id": nid, "name": n, "required": False, "type": t})
        sid = max(s["schema-id"] for s in meta["schemas"]) + 1
        meta["schemas"].append({"schema-id": sid, "type": "struct", "fields": fields2})
        meta["current-schema-id"] = sid
        meta["last-column-id"] = nid
        cur_schema = meta["schemas"][-1]

    part_avro = [(n, _ICE_TO_AVRO[t]) for n, t in partition_fields]
    mschema = _manifest_schema(part_avro)
    mpath = os.path.join(md, f"manifest-{seq:05d}.avro")
    field_ids = {f["name"]: (f["id"], f["type"]) for f in cur_schema["fields"]}

    def _bounds(bounds: dict | None, pick) -> list | None:
        if not bounds:
            return None
        out = []
        for col, (lo, hi) in bounds.items():
            fid, t = field_ids[col]
            v = pick(lo, hi)
            if v is not None:
                out.append({"key": fid, "value": _encode_bound(t, v)})
        return out or None

    entries = []
    for f in files:
        path, part, rows, size = f[:4]
        bounds = f[4] if len(f) > 4 else None
        entries.append(
            {
                "status": 1,  # ADDED
                "snapshot_id": snap_id,
                "sequence_number": seq,
                "file_sequence_number": seq,
                "data_file": {
                    "content": 0,
                    "file_path": path,
                    "file_format": "PARQUET",
                    "partition": {n: part.get(n) for n, _ in partition_fields},
                    "record_count": rows,
                    "file_size_in_bytes": size,
                    "lower_bounds": _bounds(bounds, lambda lo, hi: lo),
                    "upper_bounds": _bounds(bounds, lambda lo, hi: hi),
                },
            }
        )
    write_ocf(mpath, mschema, entries)

    # manifest list: prior snapshot's manifests carried forward + the new one
    prior: list[dict] = []
    if meta["snapshots"]:
        cur = next(
            s for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        _, prior = read_ocf(os.path.join(md, os.path.basename(cur["manifest-list"])))
    new_entry = {
        "manifest_path": mpath,
        "manifest_length": os.path.getsize(mpath),
        "partition_spec_id": 0,
        "content": 0,
        "sequence_number": seq,
        "min_sequence_number": seq,
        "added_snapshot_id": snap_id,
        "added_files_count": len(files),
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": sum(f[2] for f in files),
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
    }
    mlist = os.path.join(md, f"snap-{snap_id}-manifest-list.avro")
    write_ocf(_abs(mlist), _MANIFEST_LIST_SCHEMA, prior + [new_entry])

    meta["snapshots"].append(
        {
            "snapshot-id": snap_id,
            "sequence-number": seq,
            "timestamp-ms": ts,
            "manifest-list": mlist,
            "summary": {"operation": "append"},
            "schema-id": 0,
        }
    )
    meta["snapshot-log"].append({"snapshot-id": snap_id, "timestamp-ms": ts})
    meta["current-snapshot-id"] = snap_id
    meta["last-sequence-number"] = seq
    meta["last-updated-ms"] = ts
    vfile = os.path.join(md, f"v{seq}.metadata.json")
    with open(vfile + ".tmp", "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(vfile + ".tmp", vfile)
    with open(os.path.join(md, "version-hint.text.tmp"), "w") as f:
        f.write(str(seq))
    os.replace(
        os.path.join(md, "version-hint.text.tmp"),
        os.path.join(md, "version-hint.text"),
    )
    return snap_id


def _abs(p: str) -> str:
    return os.path.abspath(p)


_ICE_TO_SPARK = {
    "string": "string",
    "long": "bigint",
    "int": "int",
    "boolean": "boolean",
    "double": "double",
    "float": "float",
    "date": "date",
    "timestamp": "timestamp",
    "timestamptz": "timestamp",
    "binary": "binary",
}

_ICE_TO_AVRO = {
    "string": "string",
    "long": "long",
    "int": "int",
    "boolean": "boolean",
    "double": "double",
    "float": "float",
    "date": "int",  # iceberg dates are days from epoch
    "timestamp": "long",
    "timestamptz": "long",
    "binary": "bytes",
}


def _footer_bounds(path: str, cols: list[str]) -> dict[str, tuple]:
    """Per-file (min, max) for ``cols`` aggregated over parquet row-group
    footer statistics; columns without stats are omitted (conservative)."""
    import datetime as _dt

    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    idx = {md.schema.column(c).name: c for c in range(md.num_columns)}
    out: dict[str, tuple] = {}
    for col in cols:
        if col not in idx:
            continue
        lo = hi = None
        ok = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx[col]).statistics
            if st is None or not st.has_min_max:
                ok = False
                break
            mn, mx = st.min, st.max
            if isinstance(mn, _dt.datetime):  # iceberg timestamps are micros
                mn = int(mn.timestamp() * 1_000_000)
                mx = int(mx.timestamp() * 1_000_000)
            lo = mn if lo is None else min(lo, mn)
            hi = mx if hi is None else max(hi, mx)
        if ok and lo is not None:
            out[col] = (lo, hi)
    return out


def write_iceberg_table(
    spark: SparkSession,
    df: DataFrame,
    location: str,
    schema_fields: list[tuple[str, str]],
    partition_col: str | None = None,
    ts_ms: int | None = None,
    bound_cols: list[str] | None = None,
) -> int:
    """Materialize a DataFrame as an Iceberg table snapshot: write the
    rows as parquet under ``location``/data (one directory per partition
    value when ``partition_col`` is given) and append one snapshot whose
    manifests list the produced files with their partition values and
    row counts.  Test/fixture surface — production tables come from real
    writers; the READ side is the contract."""
    data = os.path.join(location, "data")
    # resolve what's already in the current snapshot FIRST so the footer
    # passes below (_fill_rowcounts, _footer_bounds) only ever open the
    # NEW files — otherwise every append re-reads every prior snapshot's
    # footers and append cost grows O(total files) in driver-side I/O
    try:
        existing = {f.path for f in IcebergTable(location).data_files()}
    except Exception:
        existing = set()
    files: list[tuple[str, dict, int, int]] = []
    if partition_col:
        vals = [r[0] for r in df.select(partition_col).distinct().collect()]
        for v in sorted(vals):
            d = os.path.join(data, f"{partition_col}={v}")
            df.where(df[partition_col] == v).write.mode("append").parquet(d)
            for p in glob.glob(os.path.join(d, "*.parquet")):
                if p not in existing:
                    files.append((p, {partition_col: v}, -1, os.path.getsize(p)))
        pf = [(partition_col, dict(schema_fields)[partition_col])]
    else:
        df.write.mode("append").parquet(data)
        files = [
            (p, {}, -1, os.path.getsize(p))
            for p in glob.glob(os.path.join(data, "*.parquet"))
            if p not in existing
        ]
        pf = []
    new_files = _fill_rowcounts(files)  # per-file rows from parquet footers
    if bound_cols:
        new_files = [
            (p, part, rows, size, _footer_bounds(p, bound_cols))
            for p, part, rows, size in new_files
        ]
    return append_snapshot(location, new_files, schema_fields, pf, ts_ms=ts_ms)


def _fill_rowcounts(files):
    import pyarrow.parquet as pq

    out = []
    for path, part, rows, size in files:
        if rows == -1:
            rows = pq.ParquetFile(path).metadata.num_rows
        out.append((path, part, rows, size))
    return out


# --------------------------------------------------------- incremental sync
# Keep a SegmentStore index in step with a GROWING Iceberg table: each
# sync indexes only the data files appended since the last-indexed
# snapshot (one new segment per sync — the LSM shape merge policies
# already manage).  Append-only by design: a vanished data file means
# the table was rewritten/compacted or rows were deleted, and a
# file-diff can no longer express the change — fail loudly, the caller
# rebuilds (or runs update_documents for row-level recrawls).

_SYNC_MARKER = "ICEBERG_SYNC.json"


def last_synced_snapshot(store) -> int | None:
    """Snapshot id recorded by the last ``sync_index_from_iceberg`` into
    ``store`` (None = never synced)."""
    p = os.path.join(store.path, _SYNC_MARKER)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)["snapshot_id"]


def new_data_files(
    table: IcebergTable, since_snapshot_id: int | None
) -> list[DataFileInfo]:
    """Data files in the CURRENT snapshot that were not in
    ``since_snapshot_id`` (all of them when None).  Raises if files from
    the old snapshot vanished (non-append table evolution)."""
    cur = {f.path: f for f in table.data_files()}
    if since_snapshot_id is None:
        return list(cur.values())
    old = {f.path for f in table.data_files(snapshot_id=since_snapshot_id)}
    gone = old - set(cur)
    if gone:
        raise NotImplementedError(
            f"iceberg table is not append-only since snapshot "
            f"{since_snapshot_id}: {len(gone)} data files vanished "
            f"(compaction/delete); rebuild the index"
        )
    return [f for p, f in cur.items() if p not in old]


def _write_sync_marker(store, name: str, payload: dict) -> None:
    tmp = os.path.join(store.path, name + ".tmp")
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, os.path.join(store.path, name))


def sync_index_from_iceberg(
    spark: SparkSession,
    location: str,
    store,
    config,
    columns: list[str] | None = None,
    partitions: int | None = None,
):
    """Index everything appended to the Iceberg table since the last
    sync: builds ONE new segment over the new files only (no-op when the
    snapshot is unchanged), then records the indexed snapshot id in the
    store.  Returns (manifest, indexed_snapshot_id, n_new_files).

    Crash-safe: a PENDING marker written before the build records the
    store generation at start; if a crash lands between the segment
    commit and the final marker, the next sync sees generation >
    start_generation and — because the writer lock means this sync was
    the only writer — finalizes the marker WITHOUT re-indexing, so a
    replayed micro-batch can never duplicate documents."""
    from whoosh_novo_spark.operators.build import build_segment

    pend_name = _SYNC_MARKER + ".pending"
    pend_path = os.path.join(store.path, pend_name)
    if os.path.exists(pend_path):
        with open(pend_path) as f:
            pend = json.load(f)
        if pend.get("location") != location:
            raise ValueError(
                f"index at {store.path} has a pending sync from a different "
                f"table: {pend.get('location')}"
            )
        if store.current_generation() > pend["start_generation"]:
            # interrupted sync's build COMMITTED: finalize, don't re-index
            _write_sync_marker(
                store, _SYNC_MARKER,
                {"snapshot_id": pend["snapshot_id"], "location": location},
            )
        os.remove(pend_path)  # build never committed: plain retry below

    table = IcebergTable(location)
    snap_id = table.snapshot()["snapshot-id"]
    since = last_synced_snapshot(store)
    if since == snap_id:
        return store.read_manifest(), snap_id, 0
    fresh = new_data_files(table, since)
    if fresh:
        _write_sync_marker(
            store, pend_name,
            {
                "snapshot_id": snap_id,
                "location": location,
                "start_generation": store.current_generation(),
            },
        )
        # project the TABLE schema, exactly as IcebergTable.read() does:
        # a sync delta can straddle an additive schema evolution, and bare
        # parquet inference would take whichever file wins — dropping the
        # new column (or failing the select) non-deterministically
        ddl = table.spark_schema()
        reader = spark.read.schema(ddl) if ddl else spark.read
        docs = reader.parquet(*[f.path for f in fresh])
        if columns:
            docs = docs.select(*columns)
        manifest = build_segment(spark, docs, config, store, partitions=partitions)
    else:
        manifest = store.read_manifest()
    _write_sync_marker(
        store, _SYNC_MARKER, {"snapshot_id": snap_id, "location": location}
    )
    if os.path.exists(pend_path):
        os.remove(pend_path)
    return manifest, snap_id, len(fresh)
