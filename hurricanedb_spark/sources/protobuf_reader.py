"""Protobuf batch input format (reference:
pinot-plugins/pinot-input-format/pinot-protobuf/ — ProtoBufRecordReader
reads size-delimited messages from segment input files and maps fields to
GenericRow via the message descriptor; RecordReader SPI
pinot-spi/.../data/readers/RecordReader.java).

Spark-first shape: `spark.read.format("binaryFile")` lists and splits the
input files, and an Arrow-batched `mapInPandas` decodes each file's
size-delimited messages into typed rows — the decode kernel is pure
Python over the public protobuf wire format
(https://protobuf.dev/programming-guides/encoding/), so ingestion works
without the google.protobuf package. When that package is available, a
descriptor-based decoder can be swapped into `_decode_file` — the
surrounding plumbing (framing, schema, batching) is identical.

Field spec: {field_number: (column_name, ptype)} with ptype one of
  int32 int64 uint64 bool    (varint)
  sint32 sint64              (zigzag varint)
  double fixed64             (64-bit)
  float fixed32              (32-bit)
  string bytes               (length-delimited)
Repeated fields decode as arrays (packed or unpacked encoding), declared
by an ArrayType column in the Spark schema.
"""

from __future__ import annotations

import struct
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession, types as T

WIRE_VARINT, WIRE_I64, WIRE_LEN, WIRE_I32 = 0, 1, 2, 5

_WIRE_OF = {
    "int32": WIRE_VARINT,
    "int64": WIRE_VARINT,
    "uint64": WIRE_VARINT,
    "bool": WIRE_VARINT,
    "sint32": WIRE_VARINT,
    "sint64": WIRE_VARINT,
    "double": WIRE_I64,
    "fixed64": WIRE_I64,
    "float": WIRE_I32,
    "fixed32": WIRE_I32,
    "string": WIRE_LEN,
    "bytes": WIRE_LEN,
}


def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    """Decode one base-128 varint at pos -> (value, next_pos)."""
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("malformed varint")


def write_varint(value: int) -> bytes:
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _zigzag_encode(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _to_signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _to_signed32(v: int) -> int:
    v &= 0xFFFFFFFF
    return v - (1 << 32) if v >= (1 << 31) else v


def _decode_scalar(ptype: str, wire: int, raw: Any) -> Any:
    if ptype == "bool":
        return bool(raw)
    if ptype == "int64":
        return _to_signed64(raw)
    if ptype == "int32":
        # negative int32 is wire-encoded as a sign-extended 64-bit varint
        return _to_signed32(_to_signed64(raw))
    if ptype == "uint64":
        return raw
    if ptype in ("sint32", "sint64"):
        return _zigzag_decode(raw)
    if ptype == "double":
        return struct.unpack("<d", raw)[0]
    if ptype == "fixed64":
        return struct.unpack("<Q", raw)[0]
    if ptype == "float":
        return struct.unpack("<f", raw)[0]
    if ptype == "fixed32":
        return struct.unpack("<I", raw)[0]
    if ptype == "string":
        return raw.decode("utf-8")
    if ptype == "bytes":
        return bytes(raw)
    raise ValueError(f"unsupported ptype {ptype}")


def decode_message(
    data: bytes, fields: dict[int, tuple[str, str]], repeated: set[str] = frozenset()
) -> dict[str, Any]:
    """Decode one protobuf message into a column dict. Unknown field
    numbers are skipped by wire type (forward compatibility, same as the
    reference's descriptor-driven reader)."""
    out: dict[str, Any] = {}
    pos = 0
    n = len(data)
    while pos < n:
        key, pos = read_varint(data, pos)
        field_no, wire = key >> 3, key & 0x7
        spec = fields.get(field_no)
        if wire == WIRE_VARINT:
            raw, pos = read_varint(data, pos)
        elif wire == WIRE_I64:
            raw, pos = data[pos : pos + 8], pos + 8
        elif wire == WIRE_I32:
            raw, pos = data[pos : pos + 4], pos + 4
        elif wire == WIRE_LEN:
            ln, pos = read_varint(data, pos)
            raw, pos = data[pos : pos + ln], pos + ln
        else:
            raise ValueError(f"unsupported wire type {wire}")
        if spec is None:
            continue  # unknown field: skipped, already consumed
        name, ptype = spec
        if name in repeated:
            vals = out.setdefault(name, [])
            if wire == WIRE_LEN and _WIRE_OF[ptype] != WIRE_LEN:
                # packed repeated encoding: concatenated scalars
                ppos = 0
                while ppos < len(raw):
                    if _WIRE_OF[ptype] == WIRE_VARINT:
                        v, ppos = read_varint(raw, ppos)
                    elif _WIRE_OF[ptype] == WIRE_I64:
                        v, ppos = raw[ppos : ppos + 8], ppos + 8
                    else:
                        v, ppos = raw[ppos : ppos + 4], ppos + 4
                    vals.append(_decode_scalar(ptype, _WIRE_OF[ptype], v))
            else:
                vals.append(_decode_scalar(ptype, wire, raw))
        else:
            out[name] = _decode_scalar(ptype, wire, raw)
    return out


def encode_message(
    row: dict[str, Any], fields: dict[int, tuple[str, str]]
) -> bytes:
    """Encode a column dict as a protobuf message (test/write-path helper,
    the inverse of decode_message)."""
    out = bytearray()
    for field_no, (name, ptype) in fields.items():
        val = row.get(name)
        if val is None:
            continue
        vals = val if isinstance(val, (list, tuple)) else [val]
        for v in vals:
            wire = _WIRE_OF[ptype]
            out += write_varint((field_no << 3) | wire)
            if wire == WIRE_VARINT:
                if ptype in ("sint32", "sint64"):
                    v = _zigzag_encode(int(v))
                elif ptype == "bool":
                    v = int(bool(v))
                else:
                    v = int(v) & 0xFFFFFFFFFFFFFFFF
                out += write_varint(v)
            elif wire == WIRE_I64:
                out += struct.pack("<d", v) if ptype == "double" else struct.pack("<Q", v)
            elif wire == WIRE_I32:
                out += struct.pack("<f", v) if ptype == "float" else struct.pack("<I", v)
            else:
                b = v.encode("utf-8") if isinstance(v, str) else bytes(v)
                out += write_varint(len(b)) + b
    return bytes(out)


def write_delimited_file(path: str, rows: list[dict], fields: dict) -> None:
    """Size-delimited framing (protobuf writeDelimitedTo — the format the
    reference's ProtoBufRecordReader consumes)."""
    with open(path, "wb") as f:
        for row in rows:
            msg = encode_message(row, fields)
            f.write(write_varint(len(msg)) + msg)


def iter_delimited(blob: bytes) -> Iterator[bytes]:
    pos = 0
    n = len(blob)
    while pos < n:
        ln, pos = read_varint(blob, pos)
        yield blob[pos : pos + ln]
        pos += ln


def read_protobuf(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fields: dict[int, tuple[str, str]],
) -> DataFrame:
    """Read size-delimited protobuf files into a typed DataFrame.

    binaryFile source lists/distributes files (one input file = one task,
    matching the reference's per-file RecordReader granularity); decode
    runs as Arrow-batched mapInPandas — Python executes only the wire
    decode, everything downstream is JVM columnar."""
    import pandas as pd

    repeated = {
        f.name for f in schema.fields if isinstance(f.dataType, T.ArrayType)
    }
    names = [f.name for f in schema.fields]

    def decode_files(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for blob in pdf["content"]:
                rows = [
                    decode_message(bytes(m), fields, repeated)
                    for m in iter_delimited(bytes(blob))
                ]
                yield pd.DataFrame(
                    {c: [r.get(c) for r in rows] for c in names}
                )

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(decode_files, schema=schema)
