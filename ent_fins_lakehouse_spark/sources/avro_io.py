"""Minimal pure-Python Avro Object Container File reader/writer.

Iceberg's manifest lists and manifests are Avro OCF files (Iceberg
table spec, iceberg.apache.org/spec — "Manifests" / "Manifest Lists");
this environment has neither ``spark-avro`` nor a Python avro package,
so the Iceberg shim (:mod:`sources.iceberg`) carries its own decoder
for the public Avro 1.x format (avro.apache.org/docs — specification,
"Object Container Files" + "Binary Encoding"):

- OCF: magic ``Obj\\x01``, file-metadata map (``avro.schema`` JSON,
  ``avro.codec``), 16-byte sync marker, then blocks of
  ``[count][byte-size][records…][sync]``.
- Binary encoding: int/long zigzag varints; float/double little-endian
  IEEE; bytes/string length-prefixed; record = fields in schema order;
  union = zigzag branch index then value; array/map = blocks
  terminated by count 0 (negative count ⇒ byte size follows).

The reader is generic (decodes whatever schema the writer embedded —
required for cross-engine manifests); the writer supports the null and
deflate codecs and the types Iceberg metadata needs (records, unions,
arrays, maps, primitives, fixed). Logical types ride on the underlying
primitive unchanged — Iceberg's field semantics are resolved by the
caller, not here.
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
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise EOFError("truncated avro data")
        self.pos += n
        return b

    def zlong(self) -> int:
        shift = 0
        acc = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def decode(self, schema):
        if isinstance(schema, str):
            t = schema
        elif isinstance(schema, list):  # union
            return self.decode(schema[self.zlong()])
        else:
            t = schema["type"]
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
        if t == "fixed":
            return self.read(schema["size"])
        if t == "enum":
            return schema["symbols"][self.zlong()]
        if t == "record":
            return {f["name"]: self.decode(f["type"]) for f in schema["fields"]}
        if t == "array":
            out = []
            while True:
                n = self.zlong()
                if n == 0:
                    break
                if n < 0:
                    self.zlong()  # block byte size — decode sequentially anyway
                    n = -n
                for _ in range(n):
                    out.append(self.decode(schema["items"]))
            return out
        if t == "map":
            out = {}
            while True:
                n = self.zlong()
                if n == 0:
                    break
                if n < 0:
                    self.zlong()
                    n = -n
                for _ in range(n):
                    k = self.read(self.zlong()).decode("utf-8")
                    out[k] = self.decode(schema["values"])
            return out
        raise NotImplementedError(f"avro type {t!r}")


def read_ocf(path: str) -> tuple[dict, list[dict]]:
    """Read an Object Container File → (embedded schema, records)."""
    with open(path, "rb") as fh:
        blob = fh.read()
    if blob[:4] != MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    r = _Reader(blob)
    r.pos = 4
    meta = r.decode({"type": "map", "values": "bytes"})
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec!r}")
    sync = r.read(16)
    records: list[dict] = []
    while r.pos < len(blob):
        n = r.zlong()
        size = r.zlong()
        data = r.read(size)
        if codec == "deflate":
            data = zlib.decompress(data, -15)
        br = _Reader(data)
        for _ in range(n):
            records.append(br.decode(schema))
        if r.read(16) != sync:
            raise ValueError(f"{path}: bad sync marker (corrupt block)")
    return schema, records


# ---------------------------------------------------------------- encoding


class _Writer:
    def __init__(self) -> None:
        self.out = io.BytesIO()

    def write(self, b: bytes) -> None:
        self.out.write(b)

    def zlong(self, v: int) -> None:
        v = (v << 1) ^ (v >> 63)  # zigzag (arbitrary-precision-safe for i64)
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                self.write(bytes([b | 0x80]))
            else:
                self.write(bytes([b]))
                break

    def encode(self, schema, val) -> None:
        if isinstance(schema, str):
            t = schema
        elif isinstance(schema, list):  # union: first branch matching val
            for i, branch in enumerate(schema):
                bt = branch if isinstance(branch, str) else branch["type"]
                if (val is None) == (bt == "null"):
                    self.zlong(i)
                    return self.encode(branch, val)
            raise ValueError(f"no union branch for {val!r} in {schema}")
        else:
            t = schema["type"]
        if t == "null":
            return
        if t == "boolean":
            return self.write(b"\x01" if val else b"\x00")
        if t in ("int", "long"):
            return self.zlong(int(val))
        if t == "float":
            return self.write(struct.pack("<f", float(val)))
        if t == "double":
            return self.write(struct.pack("<d", float(val)))
        if t == "bytes":
            self.zlong(len(val))
            return self.write(val)
        if t == "string":
            b = val.encode("utf-8")
            self.zlong(len(b))
            return self.write(b)
        if t == "fixed":
            if len(val) != schema["size"]:
                raise ValueError("fixed size mismatch")
            return self.write(val)
        if t == "record":
            for f in schema["fields"]:
                self.encode(f["type"], val.get(f["name"]))
            return
        if t == "array":
            if val:
                self.zlong(len(val))
                for item in val:
                    self.encode(schema["items"], item)
            return self.zlong(0)
        if t == "map":
            if val:
                self.zlong(len(val))
                for k, v in val.items():
                    self.encode("string", k)
                    self.encode(schema["values"], v)
            return self.zlong(0)
        raise NotImplementedError(f"avro type {t!r}")


def write_ocf(path: str, schema: dict, records: list[dict]) -> None:
    """Write records as a null-codec Object Container File."""
    w = _Writer()
    w.write(MAGIC)
    w.encode(
        {"type": "map", "values": "bytes"},
        {"avro.schema": json.dumps(schema).encode(), "avro.codec": b"null"},
    )
    sync = os.urandom(16)
    w.write(sync)
    if records:
        body = _Writer()
        for rec in records:
            body.encode(schema, rec)
        blob = body.out.getvalue()
        w.zlong(len(records))
        w.zlong(len(blob))
        w.write(blob)
        w.write(sync)
    with open(path, "wb") as fh:
        fh.write(w.out.getvalue())
