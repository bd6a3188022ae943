"""Thrift batch input format (reference:
pinot-plugins/pinot-input-format/pinot-thrift/ — ThriftRecordReader
deserializes back-to-back TBinaryProtocol structs from a file, mapping
field names to thrift field ids via the generated class metadata
(ThriftRecordReader.java:55-100), and ThriftRecordExtractor pulls the
configured fields into GenericRow).

Spark-first shape, same as sources/protobuf_reader.py:
`spark.read.format("binaryFile")` lists and distributes the input files
(one file = one task, the reference's per-file RecordReader granularity)
and an Arrow-batched `mapInPandas` decodes each file's struct stream into
typed rows. The decode kernel is pure Python over the public Thrift
binary protocol (https://thrift.apache.org/ — TBinaryProtocol: 1-byte
field type, big-endian i16 field id, big-endian fixed-width scalars,
i32-length-prefixed strings, STOP-terminated structs), so ingestion works
without the `thrift` package; a generated-class decoder can be swapped in
when it exists — the surrounding plumbing is identical.

Field spec: {field_id: (column_name, ttype)} with ttype one of
  bool byte i16 i32 i64 double string binary
or "list<T>" / "set<T>" of those (declare an ArrayType column in the
Spark schema). Unknown field ids — and nested struct/map values, which
the reference's extractor also flattens away from — are skipped by type,
keeping forward compatibility with evolving thrift classes.
"""

from __future__ import annotations

import struct
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession, types as T

# TType constants (thrift protocol spec)
T_STOP, T_BOOL, T_BYTE, T_DOUBLE = 0, 2, 3, 4
T_I16, T_I32, T_I64, T_STRING = 6, 8, 10, 11
T_STRUCT, T_MAP, T_SET, T_LIST = 12, 13, 14, 15

_TTYPE_OF = {
    "bool": T_BOOL,
    "byte": T_BYTE,
    "i8": T_BYTE,
    "double": T_DOUBLE,
    "i16": T_I16,
    "i32": T_I32,
    "i64": T_I64,
    "string": T_STRING,
    "binary": T_STRING,
}

_SCALAR_FMT = {T_BOOL: ">b", T_BYTE: ">b", T_DOUBLE: ">d",
               T_I16: ">h", T_I32: ">i", T_I64: ">q"}


def parse_ttype(spec: str) -> tuple[int, int | None]:
    """'i64' -> (T_I64, None); 'list<string>' -> (T_LIST, T_STRING)."""
    s = spec.strip().lower()
    for container, tt in (("list", T_LIST), ("set", T_SET)):
        if s.startswith(container + "<") and s.endswith(">"):
            inner = s[len(container) + 1 : -1].strip()
            return tt, _TTYPE_OF[inner]
    return _TTYPE_OF[s], None


def _read_scalar(buf: bytes, pos: int, ttype: int) -> tuple[Any, int]:
    if ttype == T_STRING:
        (ln,) = struct.unpack_from(">i", buf, pos)
        pos += 4
        return buf[pos : pos + ln], pos + ln
    fmt = _SCALAR_FMT[ttype]
    (v,) = struct.unpack_from(fmt, buf, pos)
    if ttype == T_BOOL:
        v = bool(v)
    return v, pos + struct.calcsize(fmt)


def _skip(buf: bytes, pos: int, ttype: int) -> int:
    """Skip one value of the given type (unknown fields, nested data)."""
    if ttype in _SCALAR_FMT:
        return pos + struct.calcsize(_SCALAR_FMT[ttype])
    if ttype == T_STRING:
        (ln,) = struct.unpack_from(">i", buf, pos)
        return pos + 4 + ln
    if ttype == T_STRUCT:
        while True:
            ft = buf[pos]
            pos += 1
            if ft == T_STOP:
                return pos
            pos = _skip(buf, pos + 2, ft)  # +2: field id
    if ttype == T_MAP:
        kt, vt = buf[pos], buf[pos + 1]
        (n,) = struct.unpack_from(">i", buf, pos + 2)
        pos += 6
        for _ in range(n):
            pos = _skip(buf, pos, kt)
            pos = _skip(buf, pos, vt)
        return pos
    if ttype in (T_SET, T_LIST):
        et = buf[pos]
        (n,) = struct.unpack_from(">i", buf, pos + 1)
        pos += 5
        for _ in range(n):
            pos = _skip(buf, pos, et)
        return pos
    raise ValueError(f"unsupported thrift type {ttype}")


def _decode_str(raw: bytes, ptype: str) -> Any:
    return bytes(raw) if ptype == "binary" else raw.decode("utf-8")


def decode_struct(
    buf: bytes, pos: int, fields: dict[int, tuple[str, str]]
) -> tuple[dict[str, Any], int]:
    """Decode one TBinaryProtocol struct at pos -> (column dict, next pos).
    Unknown field ids are skipped by wire type (the reference reads the
    whole generated class and extracts a subset; same observable result)."""
    out: dict[str, Any] = {}
    n = len(buf)
    while pos < n:
        ftype = buf[pos]
        pos += 1
        if ftype == T_STOP:
            return out, pos
        (fid,) = struct.unpack_from(">h", buf, pos)
        fid &= 0xFFFF  # Short.toUnsignedInt (ThriftRecordReader.java:72)
        pos += 2
        spec = fields.get(fid)
        if spec is None:
            pos = _skip(buf, pos, ftype)
            continue
        name, ptype = spec
        want, elem = parse_ttype(ptype)
        if ftype != want:  # schema drift: treat as unknown, skip by type
            pos = _skip(buf, pos, ftype)
            continue
        if want in (T_LIST, T_SET):
            et = buf[pos]
            (cnt,) = struct.unpack_from(">i", buf, pos + 1)
            pos += 5
            vals = []
            inner = ptype[ptype.index("<") + 1 : -1].strip()
            for _ in range(cnt):
                if et == elem:
                    v, pos = _read_scalar(buf, pos, et)
                    if et == T_STRING:
                        v = _decode_str(v, inner)
                    vals.append(v)
                else:
                    pos = _skip(buf, pos, et)
            out[name] = vals
        else:
            v, pos = _read_scalar(buf, pos, want)
            if want == T_STRING:
                v = _decode_str(v, ptype)
            out[name] = v
    raise ValueError("truncated thrift struct (no STOP field)")


def encode_struct(row: dict[str, Any], fields: dict[int, tuple[str, str]]) -> bytes:
    """Encode a column dict as one TBinaryProtocol struct (test/write-path
    helper, byte-compatible with thrift-generated write())."""
    out = bytearray()
    for fid, (name, ptype) in fields.items():
        val = row.get(name)
        if val is None:
            continue
        ttype, elem = parse_ttype(ptype)
        out += struct.pack(">bh", ttype, fid)
        if ttype in (T_LIST, T_SET):
            inner = ptype[ptype.index("<") + 1 : -1].strip()
            out += struct.pack(">bi", elem, len(val))
            for v in val:
                out += _encode_scalar(v, elem, inner)
        else:
            out += _encode_scalar(val, ttype, ptype)
    out.append(T_STOP)
    return bytes(out)


def _encode_scalar(v: Any, ttype: int, ptype: str) -> bytes:
    if ttype == T_STRING:
        b = v.encode("utf-8") if isinstance(v, str) else bytes(v)
        return struct.pack(">i", len(b)) + b
    if ttype == T_BOOL:
        return struct.pack(">b", 1 if v else 0)
    return struct.pack(_SCALAR_FMT[ttype], v)


def write_thrift_file(path: str, rows: list[dict], fields: dict) -> None:
    """Back-to-back structs, no framing — exactly what the reference's
    ThriftRecordReader consumes (struct boundaries come from STOP fields)."""
    with open(path, "wb") as f:
        for row in rows:
            f.write(encode_struct(row, fields))


def iter_structs(
    blob: bytes, fields: dict[int, tuple[str, str]]
) -> Iterator[dict[str, Any]]:
    pos = 0
    n = len(blob)
    while pos < n:
        row, pos = decode_struct(blob, pos, fields)
        yield row


def read_thrift(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fields: dict[int, tuple[str, str]],
) -> DataFrame:
    """Read concatenated-TBinaryProtocol-struct files into a typed
    DataFrame. binaryFile distributes whole files; Python executes only
    the wire decode (Arrow-batched), everything downstream is JVM
    columnar."""
    import pandas as pd

    names = [f.name for f in schema.fields]

    def decode_files(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for blob in pdf["content"]:
                rows = list(iter_structs(bytes(blob), fields))
                yield pd.DataFrame({c: [r.get(c) for r in rows] for c in names})

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(decode_files, schema=schema)
