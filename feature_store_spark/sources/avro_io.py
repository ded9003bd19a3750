"""Minimal pure-Python Avro Object Container File reader/writer.

Implements the subset of the public Avro 1.11 specification
(https://avro.apache.org/docs/1.11.1/specification/) that Apache
Iceberg uses for its manifest-list and manifest files: records,
unions, arrays, maps, strings, bytes, fixed, int/long (zigzag
varint), float/double, boolean, null, and the 'null' and 'deflate'
block codecs. Logical types ride on the underlying primitive and are
surfaced raw (Iceberg's readers decode them by field id/name, as we
do in sources/iceberg.py).

Why hand-rolled: this container has neither fastavro/avro (Python)
nor the spark-avro jar, but Iceberg interop (reference
IcebergOfflineStore.java:42-114) requires reading Avro manifests.
Manifests are METADATA — KBs to low MBs, thousands of entries for a
100 TB table — so a driver-side Python decode is the appropriate
physical plan; only the parquet DATA files they point at are read by
executors.

Decoding uses the embedded WRITER schema verbatim (no reader-schema
resolution): records come back as plain dicts keyed by field name,
and callers pick the fields they need — which is exactly how
schema-evolution-tolerant manifest reading behaves for the
read-only subset we consume.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------- decode


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise EOFError("truncated avro data")
        self.pos += n
        return b

    def at_end(self) -> bool:
        return self.pos >= len(self.buf)

    def zlong(self) -> int:
        shift, acc = 0, 0
        while True:
            (b,) = self.read(1)
            acc |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def decode(self, schema):
        if isinstance(schema, str):
            return self._primitive(schema)
        if isinstance(schema, list):  # union: long index + value
            idx = self.zlong()
            if not 0 <= idx < len(schema):
                raise ValueError(f"union index {idx} out of range")
            return self.decode(schema[idx])
        t = schema["type"]
        if t == "record":
            return {
                f["name"]: self.decode(f["type"]) for f in schema["fields"]
            }
        if t == "array":
            out = []
            while True:
                n = self.zlong()
                if n == 0:
                    return out
                if n < 0:  # block with byte-size prefix
                    n = -n
                    self.zlong()
                for _ in range(n):
                    out.append(self.decode(schema["items"]))
        if t == "map":
            out = {}
            while True:
                n = self.zlong()
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    self.zlong()
                for _ in range(n):
                    k = self._primitive("string")
                    out[k] = self.decode(schema["values"])
        if t == "fixed":
            return self.read(schema["size"])
        if t == "enum":
            idx = self.zlong()
            symbols = schema["symbols"]
            if not 0 <= idx < len(symbols):
                # out-of-range MUST raise (review r10): python's
                # negative indexing silently decoded a corrupt -1 to
                # the LAST symbol — plausible wrong data from a parser
                # whose contract is fail-loud on corrupt bytes
                raise ValueError(
                    f"enum index {idx} out of range for {len(symbols)} "
                    "symbols (corrupt block?)"
                )
            return symbols[idx]
        return self._primitive(t)

    def _primitive(self, t: str):
        if t == "null":
            return None
        if t == "boolean":
            return self.read(1) != b"\x00"
        if t in ("int", "long"):
            return self.zlong()
        if t == "float":
            return struct.unpack("<f", self.read(4))[0]
        if t == "double":
            return struct.unpack("<d", self.read(8))[0]
        if t == "bytes":
            return self.read(self.zlong())
        if t == "string":
            return self.read(self.zlong()).decode("utf-8")
        raise ValueError(f"unsupported avro type {t!r}")


def _resolve_named(schema, named=None):
    """Inline named-type references ("name" used as a type string) so
    the decoder never needs a registry. Iceberg manifests use one
    level of these (r2 struct reuse)."""
    if named is None:
        named = {}
    if isinstance(schema, str):
        return named.get(schema, schema)
    if isinstance(schema, list):
        return [_resolve_named(s, named) for s in schema]
    t = schema.get("type")
    if t == "record":
        out = {"type": "record", "name": schema.get("name"), "fields": []}
        if schema.get("name"):
            named[schema["name"]] = out
        for f in schema["fields"]:
            out["fields"].append(
                {"name": f["name"], "type": _resolve_named(f["type"], named)}
            )
        return out
    if t in ("array",):
        return {"type": "array", "items": _resolve_named(schema["items"], named)}
    if t in ("map",):
        return {"type": "map", "values": _resolve_named(schema["values"], named)}
    if t in ("fixed", "enum"):
        if schema.get("name"):
            named[schema["name"]] = schema
        return schema
    # {"type": X, ...}: X is a primitive with a logical-type
    # annotation OR a spec-legal wrapped reference to a named type
    # ({"type": "r2"}) — resolve the latter through the registry
    # (review r10: the bare name leaked out and the decoder rejected
    # it as an unsupported primitive)
    return named.get(t, t) if isinstance(t, str) else _resolve_named(t, named)


def read_avro(path: str) -> tuple[list[dict], dict]:
    """Read an Avro OCF; returns (records, writer_schema_json)."""
    with open(path, "rb") as f:
        data = f.read()
    r = _Reader(data)
    if r.read(4) != MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    meta_schema = {"type": "map", "values": "bytes"}
    meta = r.decode(meta_schema)
    sync = r.read(16)
    schema_json = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(f"{path}: unsupported avro codec {codec!r}")
    schema = _resolve_named(schema_json)
    records: list[dict] = []
    while not r.at_end():
        n = r.zlong()
        size = r.zlong()
        block = r.read(size)
        if codec == "deflate":  # raw DEFLATE, no zlib header (spec)
            block = zlib.decompress(block, -15)
        br = _Reader(block)
        for _ in range(n):
            records.append(br.decode(schema))
        if r.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch")
    return records, schema_json


# ---------------------------------------------------------------- encode


class _Writer:
    def __init__(self):
        self.out = io.BytesIO()

    def write(self, b: bytes):
        self.out.write(b)

    def zlong(self, v: int):
        v = (v << 1) ^ (v >> 63)  # zigzag
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                self.write(bytes([b | 0x80]))
            else:
                self.write(bytes([b]))
                return

    def encode(self, schema, value):
        if isinstance(schema, str):
            return self._primitive(schema, value)
        if isinstance(schema, list):
            # union: pick the first branch that accepts the value
            idx = _union_index(schema, value)
            self.zlong(idx)
            return self.encode(schema[idx], value)
        t = schema["type"]
        if t == "record":
            for f in schema["fields"]:
                self.encode(f["type"], value[f["name"]])
            return
        if t == "array":
            if value:
                self.zlong(len(value))
                for v in value:
                    self.encode(schema["items"], v)
            self.zlong(0)
            return
        if t == "map":
            if value:
                self.zlong(len(value))
                for k, v in value.items():
                    self._primitive("string", k)
                    self.encode(schema["values"], v)
            self.zlong(0)
            return
        if t == "fixed":
            if len(value) != schema["size"]:
                raise ValueError("fixed size mismatch")
            self.write(value)
            return
        if t == "enum":
            # the decoder and _union_index both support enums; the
            # encoder must too (review r10: a union ['null','enum']
            # routed the string to the enum branch and then died in
            # _primitive)
            try:
                self.zlong(schema["symbols"].index(value))
            except ValueError:
                raise ValueError(
                    f"enum value {value!r} not in {schema['symbols']}"
                ) from None
            return
        return self._primitive(t, value)

    def _primitive(self, t: str, v):
        if t == "null":
            return
        if t == "boolean":
            return self.write(b"\x01" if v else b"\x00")
        if t in ("int", "long"):
            return self.zlong(int(v))
        if t == "float":
            return self.write(struct.pack("<f", v))
        if t == "double":
            return self.write(struct.pack("<d", v))
        if t == "bytes":
            self.zlong(len(v))
            return self.write(bytes(v))
        if t == "string":
            b = v.encode("utf-8")
            self.zlong(len(b))
            return self.write(b)
        raise ValueError(f"unsupported avro type {t!r}")


def _union_index(union: list, value) -> int:
    def matches(s, v):
        t = s if isinstance(s, str) else s.get("type")
        if v is None:
            return t == "null"
        if isinstance(v, bool):
            return t == "boolean"
        if isinstance(v, int):
            return t in ("int", "long")
        if isinstance(v, float):
            return t in ("float", "double")
        if isinstance(v, str):
            return t in ("string", "enum")
        if isinstance(v, (bytes, bytearray)):
            return t in ("bytes", "fixed")
        if isinstance(v, dict):
            return t in ("record", "map")
        if isinstance(v, list):
            return t == "array"
        return False

    for i, s in enumerate(union):
        if matches(s, value):
            return i
    raise ValueError(f"no union branch for {type(value)}")


def write_avro(
    path: str, schema: dict, records: list[dict], codec: str = "null"
) -> None:
    """Write an Avro OCF (single block). Fixture/test-grade writer —
    the engine only ever READS Iceberg metadata; this exists so tests
    can author spec-conforming manifest files without an Avro
    dependency."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    resolved = _resolve_named(schema)
    body = _Writer()
    for rec in records:
        body.encode(resolved, rec)
    block = body.out.getvalue()
    if codec == "deflate":
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)
        block = comp.compress(block) + comp.flush()
    head = _Writer()
    head.write(MAGIC)
    head.encode(
        {"type": "map", "values": "bytes"},
        {
            "avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": codec.encode("utf-8"),
        },
    )
    sync = b"\x00" * 8 + os.urandom(8)
    head.write(sync)
    head.zlong(len(records))
    head.zlong(len(block))
    head.write(block)
    head.write(sync)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(head.out.getvalue())
    os.replace(tmp, path)
