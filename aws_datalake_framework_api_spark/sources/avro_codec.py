"""Dependency-free Apache Avro object-container-file codec.

Iceberg stores its manifest lists and manifests as Avro files
(spec: https://iceberg.apache.org/spec/#manifests); this container
has no Python Avro implementation (``fastavro`` and ``avro`` both
absent — probed 2026-08-14, recorded in README) and no spark-avro
datasource jar, so the Iceberg connector decodes manifests with this
module instead: a from-scratch implementation of the PUBLIC Avro 1.x
binary encoding and object container file layout
(https://avro.apache.org/docs/1.12.0/specification/).

Scope is exactly what table-format metadata needs — driver-side,
planning-sized files (a manifest is KBs per thousands of data files):

- read: any schema the writer embedded (records, unions, arrays,
  maps, all primitives, fixed, enum, logical types ride through as
  their underlying primitive), ``null`` and ``deflate`` codecs
  (deflate is raw zlib, wbits=-15).  Decoding uses the WRITER schema
  from the file header, so no schema-resolution machinery is needed.
- write: the same type surface, used by the Iceberg writer to emit
  manifests/manifest lists (field-id attributes in the schema JSON
  pass through untouched — Avro ignores unknown schema attributes by
  design, Iceberg requires them for column identity).

Not implemented (not needed for metadata, refused loudly): snappy /
zstandard codecs — both need native libraries this container lacks.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

_MAGIC = b"Obj\x01"


# ------------------------------------------------------------------ primitives


def _read_long(buf: io.BytesIO) -> int:
    """Zigzag varint (Avro int and long share one encoding)."""
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated avro varint")
        v = b[0]
        acc |= (v & 0x7F) << shift
        if not v & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _write_long(out: bytearray, n: int) -> None:
    n = (n << 1) ^ (n >> 63)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            break


# ------------------------------------------------------------------ decoder


class _Decoder:
    """Schema-driven recursive reader over one decompressed block."""

    def __init__(self, data: bytes, named: dict):
        self.buf = io.BytesIO(data)
        self.named = named  # name -> schema, for named-type references

    def read(self, schema):
        if isinstance(schema, str):
            s = schema
            if s in self.named:
                return self.read(self.named[s])
            if s == "null":
                return None
            if s == "boolean":
                return self.buf.read(1) == b"\x01"
            if s in ("int", "long"):
                return _read_long(self.buf)
            if s == "float":
                return struct.unpack("<f", self.buf.read(4))[0]
            if s == "double":
                return struct.unpack("<d", self.buf.read(8))[0]
            if s == "bytes":
                return self.buf.read(_read_long(self.buf))
            if s == "string":
                return self.buf.read(_read_long(self.buf)).decode("utf-8")
            raise ValueError(f"unknown avro type: {s!r}")
        if isinstance(schema, list):  # union: long index, then value
            idx = _read_long(self.buf)
            return self.read(schema[idx])
        t = schema["type"]
        if t == "record":
            self._remember(schema)
            return {
                f["name"]: self.read(f["type"]) for f in schema["fields"]
            }
        if t == "array":
            return self._blocks(lambda: self.read(schema["items"]))
        if t == "map":
            out = {}

            def pair():
                k = self.buf.read(_read_long(self.buf)).decode("utf-8")
                out[k] = self.read(schema["values"])

            self._blocks(pair)
            return out
        if t == "fixed":
            self._remember(schema)
            return self.buf.read(schema["size"])
        if t == "enum":
            self._remember(schema)
            return schema["symbols"][_read_long(self.buf)]
        # {"type": "long", "logicalType": ...} etc. — underlying value
        return self.read(t)

    def _remember(self, schema) -> None:
        name = schema.get("name")
        if name and name not in self.named:
            self.named[name] = schema
            ns = schema.get("namespace")
            if ns:
                self.named[f"{ns}.{name}"] = schema

    def _blocks(self, item) -> list:
        """Array/map block framing: count per block (negative count =
        abs(count) items preceded by a byte size), 0 terminates."""
        out = []
        while True:
            n = _read_long(self.buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                _read_long(self.buf)  # block byte size — unused, we stream
            for _ in range(n):
                out.append(item())


def _collect_named(schema, named: dict) -> None:
    """Pre-register every named type so forward references inside
    recursive reads resolve (records/fixed/enums may be referenced by
    name after their first definition)."""
    if isinstance(schema, list):
        for s in schema:
            _collect_named(s, named)
        return
    if not isinstance(schema, dict):
        return
    t = schema.get("type")
    if t in ("record", "fixed", "enum"):
        name = schema.get("name")
        if name:
            named[name] = schema
            ns = schema.get("namespace")
            if ns:
                named[f"{ns}.{name}"] = schema
    if t == "record":
        for f in schema.get("fields", []):
            _collect_named(f["type"], named)
    elif t == "array":
        _collect_named(schema.get("items"), named)
    elif t == "map":
        _collect_named(schema.get("values"), named)
    elif isinstance(t, (dict, list)):
        _collect_named(t, named)


def read_avro_file(path: str) -> tuple[dict, list]:
    """Read one object container file → (parsed writer schema, records).

    Driver-side by design: table-format manifests are planning
    metadata, KBs-to-MBs — the DATA files they point at are what Spark
    scans distributed."""
    with open(path, "rb") as fh:
        data = fh.read()
    buf = io.BytesIO(data)
    if buf.read(4) != _MAGIC:
        raise ValueError(f"not an avro object container file: {path}")
    meta_dec = _Decoder(b"", {})
    meta_dec.buf = buf
    meta: dict = {}

    def pair():
        k = buf.read(_read_long(buf)).decode("utf-8")
        meta[k] = buf.read(_read_long(buf))

    meta_dec._blocks(pair)
    sync = buf.read(16)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(
            f"unsupported avro codec {codec!r} (null/deflate only — "
            "snappy/zstd need native libs this container lacks)"
        )
    named: dict = {}
    _collect_named(schema, named)
    records = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, os.SEEK_CUR)
        n = _read_long(buf)
        size = _read_long(buf)
        block = buf.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, wbits=-15)
        dec = _Decoder(block, dict(named))
        for _ in range(n):
            records.append(dec.read(schema))
        if buf.read(16) != sync:
            raise ValueError(f"avro sync marker mismatch in {path}")
    return schema, records


# ------------------------------------------------------------------ encoder


class _Encoder:
    def __init__(self, named: dict):
        self.out = bytearray()
        self.named = named

    def write(self, schema, value) -> None:
        if isinstance(schema, str):
            s = schema
            if s in self.named:
                return self.write(self.named[s], value)
            if s == "null":
                return None
            if s == "boolean":
                self.out.append(1 if value else 0)
            elif s in ("int", "long"):
                _write_long(self.out, int(value))
            elif s == "float":
                self.out += struct.pack("<f", float(value))
            elif s == "double":
                self.out += struct.pack("<d", float(value))
            elif s == "bytes":
                _write_long(self.out, len(value))
                self.out += bytes(value)
            elif s == "string":
                b = value.encode("utf-8")
                _write_long(self.out, len(b))
                self.out += b
            else:
                raise ValueError(f"unknown avro type: {s!r}")
            return None
        if isinstance(schema, list):  # union: pick the branch by value
            idx = self._branch(schema, value)
            _write_long(self.out, idx)
            return self.write(schema[idx], value)
        t = schema["type"]
        if t == "record":
            for f in schema["fields"]:
                if f["name"] not in value and "default" in f:
                    self.write(f["type"], f["default"])
                else:
                    self.write(f["type"], value[f["name"]])
        elif t == "array":
            if value:
                _write_long(self.out, len(value))
                for v in value:
                    self.write(schema["items"], v)
            _write_long(self.out, 0)
        elif t == "map":
            if value:
                _write_long(self.out, len(value))
                for k, v in value.items():
                    kb = k.encode("utf-8")
                    _write_long(self.out, len(kb))
                    self.out += kb
                    self.write(schema["values"], v)
            _write_long(self.out, 0)
        elif t == "fixed":
            if len(value) != schema["size"]:
                raise ValueError("fixed size mismatch")
            self.out += bytes(value)
        elif t == "enum":
            _write_long(self.out, schema["symbols"].index(value))
        else:
            self.write(t, value)  # logical type wrapper
        return None

    @staticmethod
    def _branch(union, value) -> int:
        def kind(s):
            if isinstance(s, dict):
                t = s["type"]
                return t if t in ("record", "array", "map", "fixed", "enum") else kind(t)
            return s

        for i, s in enumerate(union):
            k = kind(s)
            if value is None and k == "null":
                return i
            if value is not None and k != "null":
                return i
        raise ValueError(f"no union branch for {value!r} in {union}")


def write_avro_file(
    path: str, schema: dict, records: list, metadata: dict | None = None,
    codec: str = "deflate",
) -> None:
    """Write one object container file (single block — manifests are
    planning-sized).  ``metadata`` adds file-metadata keys next to
    avro.schema/avro.codec (Iceberg stores its table schema and
    partition spec there)."""
    named: dict = {}
    _collect_named(schema, named)
    enc = _Encoder(named)
    for r in records:
        enc.write(schema, r)
    block = bytes(enc.out)
    if codec == "deflate":
        c = zlib.compressobj(wbits=-15)
        block = c.compress(block) + c.flush()
    elif codec != "null":
        raise ValueError(f"unsupported avro codec {codec!r}")
    head = bytearray()
    head += _MAGIC
    meta = {"avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": codec.encode("utf-8")}
    for k, v in (metadata or {}).items():
        meta[k] = v if isinstance(v, bytes) else str(v).encode("utf-8")
    _write_long(head, len(meta))
    for k, v in meta.items():
        kb = k.encode("utf-8")
        _write_long(head, len(kb))
        head += kb
        _write_long(head, len(v))
        head += v
    _write_long(head, 0)
    sync = os.urandom(16)
    head += sync
    body = bytearray()
    _write_long(body, len(records))
    _write_long(body, len(block))
    body += block
    body += sync
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(head + body)
    os.replace(tmp, path)
