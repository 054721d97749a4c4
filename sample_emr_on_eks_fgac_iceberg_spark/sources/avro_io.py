"""Minimal Apache Avro 1.x container-file writer/reader, pure Python.

Implements exactly the subset Iceberg metadata needs — null/boolean/
int/long/float/double/bytes/string primitives, records, arrays, maps,
unions, fixed — per the public Avro specification (binary encoding:
zigzag-varint longs, length-prefixed bytes/strings, block-encoded
arrays/maps; object container file: `Obj\\x01` magic, file-metadata
map carrying the writer schema JSON, 16-byte sync marker between
blocks). Written from the spec, not ported from any library, so the
"no avro writer in this container" waiver (COVERAGE.md) can close:
sources/iceberg_manifests.py uses this to emit real manifest-list /
manifest files beside the v2 metadata.json chain.

The reader exists so tests can round-trip what the engine writes
without any third-party decoder; it resolves unions by branch index
and returns records as plain dicts.

Logical types (date, timestamp-micros, decimal) are annotations over
the underlying primitive in Avro — encoding is unchanged — so the
writer passes them through untouched.
"""

from __future__ import annotations

import io
import json
import struct
from hashlib import md5

MAGIC = b"Obj\x01"

_PRIMITIVES = {
    "null",
    "boolean",
    "int",
    "long",
    "float",
    "double",
    "bytes",
    "string",
}


# --------------------------------------------------------------- encode
def _write_long(buf: io.BytesIO, n: int) -> None:
    """Zigzag varint (spec: int and long share this encoding)."""
    n = (n << 1) ^ (n >> 63)  # Python ints are unbounded: arithmetic shift
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            return


def _write_bytes(buf: io.BytesIO, data: bytes) -> None:
    _write_long(buf, len(data))
    buf.write(data)


def _encode(buf: io.BytesIO, schema, value, names: dict) -> None:
    if isinstance(schema, str):
        if schema in _PRIMITIVES:
            t = schema
        else:
            _encode(buf, names[schema], value, names)
            return
    elif isinstance(schema, list):  # union: branch index, then value
        for i, branch in enumerate(schema):
            if _matches(branch, value, names):
                _write_long(buf, i)
                _encode(buf, branch, value, names)
                return
        raise ValueError(f"no union branch for {value!r} in {schema!r}")
    else:
        t = schema["type"]
        if t in _PRIMITIVES:
            pass
        elif t == "record":
            names[schema["name"]] = schema
            for f in schema["fields"]:
                try:
                    _encode(buf, f["type"], value[f["name"]], names)
                except Exception as exc:  # surface the field path
                    raise ValueError(
                        f"field {schema['name']}.{f['name']}: {exc}"
                    ) from exc
            return
        elif t == "array":
            if value:
                _write_long(buf, len(value))
                for item in value:
                    _encode(buf, schema["items"], item, names)
            _write_long(buf, 0)
            return
        elif t == "map":
            if value:
                _write_long(buf, len(value))
                for k, v in value.items():
                    _write_bytes(buf, k.encode("utf-8"))
                    _encode(buf, schema["values"], v, names)
            _write_long(buf, 0)
            return
        elif t == "fixed":
            names[schema["name"]] = schema
            if len(value) != schema["size"]:
                raise ValueError("fixed size mismatch")
            buf.write(value)
            return
        else:
            raise ValueError(f"unsupported schema {schema!r}")
    if t == "null":
        return
    if t == "boolean":
        buf.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        _write_long(buf, int(value))
    elif t == "float":
        buf.write(struct.pack("<f", float(value)))
    elif t == "double":
        buf.write(struct.pack("<d", float(value)))
    elif t == "bytes":
        _write_bytes(buf, bytes(value))
    elif t == "string":
        _write_bytes(buf, str(value).encode("utf-8"))
    else:  # pragma: no cover
        raise ValueError(f"unsupported primitive {t}")


def _matches(branch, value, names: dict) -> bool:
    t = branch if isinstance(branch, str) else branch.get("type")
    if t in names and not isinstance(branch, dict):
        return _matches(names[t], value, names)
    if t == "null":
        return value is None
    if value is None:
        return False
    if t == "boolean":
        return isinstance(value, bool)
    if t in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if t in ("float", "double"):
        return isinstance(value, (int, float)) and not isinstance(value, bool)
    if t == "bytes":
        return isinstance(value, (bytes, bytearray))
    if t == "string":
        return isinstance(value, str)
    if t == "record":
        return isinstance(value, dict)
    if t == "array":
        return isinstance(value, (list, tuple))
    if t == "map":
        return isinstance(value, dict)
    if t == "fixed":
        return isinstance(value, (bytes, bytearray))
    return False


def write_container(
    path: str,
    schema: dict,
    records: list[dict],
    metadata: dict[str, bytes] | None = None,
) -> None:
    """One-block Avro object container file, codec null. The sync
    marker derives from the schema + path (md5) so emission is
    deterministic — a re-run writes byte-identical files."""
    schema_json = json.dumps(schema, separators=(",", ":"))
    sync = md5(("sync:" + path + schema_json).encode()).digest()
    names: dict = {}
    body = io.BytesIO()
    for rec in records:
        _encode(body, schema, rec, names)
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {"avro.schema": schema_json.encode(), "avro.codec": b"null"}
    meta.update(metadata or {})
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode("utf-8"))
        _write_bytes(out, v)
    _write_long(out, 0)
    out.write(sync)
    if records:
        _write_long(out, len(records))
        _write_bytes(out, body.getvalue())
        out.write(sync)
    with open(path, "wb") as f:
        f.write(out.getvalue())


# --------------------------------------------------------------- decode
class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        out = self.data[self.pos : self.pos + n]
        if len(out) != n:
            raise EOFError
        self.pos += n
        return out

    def read_long(self) -> int:
        shift = 0
        acc = 0
        while True:
            b = self.read(1)[0]
            acc |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        return (acc >> 1) ^ -(acc & 1)

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())


def _decode(r: _Reader, schema, names: dict):
    if isinstance(schema, str):
        if schema not in _PRIMITIVES:
            return _decode(r, names[schema], names)
        t = schema
    elif isinstance(schema, list):
        return _decode(r, schema[r.read_long()], names)
    else:
        t = schema["type"]
        if t == "record":
            names[schema["name"]] = schema
            return {
                f["name"]: _decode(r, f["type"], names)
                for f in schema["fields"]
            }
        if t == "array":
            out = []
            while True:
                n = r.read_long()
                if n == 0:
                    return out
                if n < 0:  # block with byte-size prefix
                    n = -n
                    r.read_long()
                for _ in range(n):
                    out.append(_decode(r, schema["items"], names))
        if t == "map":
            out = {}
            while True:
                n = r.read_long()
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    r.read_long()
                for _ in range(n):
                    k = r.read_bytes().decode("utf-8")
                    out[k] = _decode(r, schema["values"], names)
        if t == "fixed":
            names[schema["name"]] = schema
            return r.read(schema["size"])
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
    raise ValueError(f"unsupported schema {schema!r}")


def read_container(path: str) -> tuple[dict, dict[str, bytes], list]:
    """(writer schema, file metadata, records) from an Avro container
    file written with codec null."""
    with open(path, "rb") as f:
        r = _Reader(f.read())
    if r.read(4) != MAGIC:
        raise ValueError("not an Avro container file")
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
    schema = json.loads(meta["avro.schema"].decode())
    records: list = []
    names: dict = {}
    while r.pos < len(r.data):
        count = r.read_long()
        block = _Reader(r.read_bytes())
        for _ in range(count):
            records.append(_decode(block, schema, names))
        if r.read(16) != sync:
            raise ValueError("sync marker mismatch")
    return schema, meta, records
