"""Minimal Avro Object Container File reader/writer (pure Python).

Exists so ``sources/iceberg.py`` can walk Apache Iceberg table metadata:
Iceberg's manifest-list and manifest files are Avro OCF per the public
spec, and this environment ships neither the ``spark-avro`` module nor a
Python avro package.  Implemented from the published Avro 1.12
specification (https://avro.apache.org/docs/current/specification/):

- OCF framing: ``Obj\\x01`` magic, file-metadata map (``avro.schema``
  JSON + ``avro.codec``), 16-byte sync marker, then data blocks of
  (count, byte-size, payload, sync).
- Binary encoding: zigzag-varint ints/longs, little-endian IEEE
  float/double, length-prefixed bytes/strings, block-encoded arrays and
  maps (negative block count = byte size follows), union = branch index
  then value, record = fields in order.
- Codecs: ``null`` and ``deflate`` (raw RFC-1951, zlib wbits=-15).

Decoding is writer-schema-driven (the schema embedded in the file), so
manifests written by any Iceberg implementation decode without
schema-resolution logic; records come back as plain dicts.  This is a
deliberately small subset: no schema resolution against a reader
schema, no snappy/zstd codecs, no recursive named-type references —
enough for Iceberg metadata, checked by round-trip tests
(tests/test_iceberg.py).
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------- decoding


class _Reader:
    def __init__(self, buf: bytes):
        self.b = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        out = self.b[self.pos : self.pos + n]
        if len(out) != n:
            raise EOFError("truncated avro data")
        self.pos += n
        return out

    def read_long(self) -> int:
        shift = 0
        acc = 0
        while True:
            byte = self.b[self.pos]
            self.pos += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())

    def at_end(self) -> bool:
        return self.pos >= len(self.b)


def _resolve(schema, names: dict):
    """Register named types so later string references resolve."""
    if isinstance(schema, dict):
        t = schema.get("type")
        if t in ("record", "enum", "fixed"):
            names[schema["name"]] = schema
            full = schema.get("namespace", "")
            if full:
                names[f"{full}.{schema['name']}"] = schema
        if t == "record":
            for f in schema["fields"]:
                _resolve(f["type"], names)
        elif t == "array":
            _resolve(schema["items"], names)
        elif t == "map":
            _resolve(schema["values"], names)
    elif isinstance(schema, list):
        for s in schema:
            _resolve(s, names)


def _decode(r: _Reader, schema, names: dict):
    if isinstance(schema, list):  # union: branch index then value
        return _decode(r, schema[r.read_long()], names)
    if isinstance(schema, str):
        t = schema
        if t in names:
            return _decode(r, names[t], names)
    else:
        t = schema["type"]
        if isinstance(t, (dict, list)):  # nested inline type
            return _decode(r, t, names)
    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) == b"\x01"
    if t in ("int", "long"):
        return r.read_long()
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        return r.read_bytes()
    if t == "string":
        return r.read_bytes().decode("utf-8")
    if t == "record":
        return {f["name"]: _decode(r, f["type"], names) for f in schema["fields"]}
    if t == "enum":
        return schema["symbols"][r.read_long()]
    if t == "fixed":
        return r.read(schema["size"])
    if t == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:
                n = -n
                r.read_long()  # block byte size, unused
            for _ in range(n):
                out.append(_decode(r, schema["items"], names))
        return out
    if t == "map":
        out = {}
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:
                n = -n
                r.read_long()
            for _ in range(n):
                k = r.read_bytes().decode("utf-8")
                out[k] = _decode(r, schema["values"], names)
        return out
    raise ValueError(f"unsupported avro type: {t!r}")


def read_ocf(path: str) -> tuple[dict, list]:
    """Read an Avro OCF file -> (file metadata dict, list of records)."""
    with open(path, "rb") as f:
        r = _Reader(f.read())
    if r.read(4) != MAGIC:
        raise ValueError(f"not an avro OCF: {path}")
    meta: dict[str, bytes] = {}
    while True:
        n = r.read_long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.read_long()
        for _ in range(n):
            k = r.read_bytes().decode("utf-8")
            meta[k] = r.read_bytes()
    sync = r.read(16)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    names: dict = {}
    _resolve(schema, names)
    records = []
    while not r.at_end():
        count = r.read_long()
        payload = r.read_bytes()
        if r.read(16) != sync:
            raise ValueError("avro sync marker mismatch")
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec: {codec}")
        br = _Reader(payload)
        for _ in range(count):
            records.append(_decode(br, schema, names))
    return meta, records


# ---------------------------------------------------------------- encoding


def _zigzag(v: int) -> bytes:
    acc = (v << 1) ^ (v >> 63) if v < 0 else v << 1
    out = bytearray()
    while True:
        b = acc & 0x7F
        acc >>= 7
        if acc:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode(w: io.BytesIO, schema, value, names: dict):
    if isinstance(schema, list):  # union: pick the first matching branch
        for i, branch in enumerate(schema):
            if _matches(branch, value, names):
                w.write(_zigzag(i))
                _encode(w, branch, value, names)
                return
        raise ValueError(f"no union branch for {value!r} in {schema!r}")
    if isinstance(schema, str):
        t = schema
        if t in names:
            _encode(w, names[t], value, names)
            return
    else:
        t = schema["type"]
        if isinstance(t, (dict, list)):
            _encode(w, t, value, names)
            return
    if t == "null":
        return
    if t == "boolean":
        w.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        w.write(_zigzag(int(value)))
    elif t == "float":
        w.write(struct.pack("<f", float(value)))
    elif t == "double":
        w.write(struct.pack("<d", float(value)))
    elif t == "bytes":
        w.write(_zigzag(len(value)))
        w.write(bytes(value))
    elif t == "string":
        b = value.encode("utf-8")
        w.write(_zigzag(len(b)))
        w.write(b)
    elif t == "record":
        for f in schema["fields"]:
            _encode(w, f["type"], value[f["name"]], names)
    elif t == "enum":
        w.write(_zigzag(schema["symbols"].index(value)))
    elif t == "fixed":
        w.write(bytes(value))
    elif t == "array":
        if value:
            w.write(_zigzag(len(value)))
            for item in value:
                _encode(w, schema["items"], item, names)
        w.write(_zigzag(0))
    elif t == "map":
        if value:
            w.write(_zigzag(len(value)))
            for k, v in value.items():
                kb = k.encode("utf-8")
                w.write(_zigzag(len(kb)))
                w.write(kb)
                _encode(w, schema["values"], v, names)
        w.write(_zigzag(0))
    else:
        raise ValueError(f"unsupported avro type: {t!r}")


def _matches(schema, value, names: dict) -> bool:
    t = schema if isinstance(schema, str) else schema.get("type")
    if t in names and not isinstance(schema, dict):
        return _matches(names[t], value, names)
    if t == "null":
        return value is None
    if value is None:
        return False
    if t in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if t == "boolean":
        return isinstance(value, bool)
    if t in ("float", "double"):
        return isinstance(value, (int, float)) and not isinstance(value, bool)
    if t == "string":
        return isinstance(value, str)
    if t in ("bytes", "fixed"):
        return isinstance(value, (bytes, bytearray))
    if t == "record":
        return isinstance(value, dict)
    if t == "array":
        return isinstance(value, list)
    if t == "map":
        return isinstance(value, dict)
    if t == "enum":
        return isinstance(value, str)
    return False


def write_ocf(
    path: str,
    schema: dict,
    records: list,
    codec: str = "deflate",
    extra_meta: dict[str, bytes] | None = None,
) -> None:
    """Write records as one Avro OCF data block (metadata-file scale)."""
    names: dict = {}
    _resolve(schema, names)
    body = io.BytesIO()
    for rec in records:
        _encode(body, schema, rec, names)
    payload = body.getvalue()
    if codec == "deflate":
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)
        payload = comp.compress(payload) + comp.flush()
    elif codec != "null":
        raise ValueError(f"unsupported avro codec: {codec}")
    # deterministic sync marker: content-addressed, no RNG needed
    import hashlib

    sync = hashlib.md5(json.dumps(schema, sort_keys=True).encode() + payload).digest()
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": codec.encode(),
        **(extra_meta or {}),
    }
    out.write(_zigzag(len(meta)))
    for k, v in meta.items():
        kb = k.encode()
        out.write(_zigzag(len(kb)))
        out.write(kb)
        out.write(_zigzag(len(v)))
        out.write(v)
    out.write(_zigzag(0))
    out.write(sync)
    if records:
        out.write(_zigzag(len(records)))
        out.write(_zigzag(len(payload)))
        out.write(payload)
        out.write(sync)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(out.getvalue())
    os.replace(tmp, path)
