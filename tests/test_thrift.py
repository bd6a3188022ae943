"""Thrift input format: wire-level round trip through the Spark reader
(reference: pinot-thrift ThriftRecordReader over back-to-back
TBinaryProtocol structs). The decode kernel is pure Python over the
public binary protocol, so these tests run without the thrift package;
when that package is present an extra cross-check validates our encoder
against its TBinaryProtocol implementation."""

from __future__ import annotations

import math
import shutil
import tempfile

import pytest
from pyspark.sql import types as T

from hurricanedb_spark.sources import thrift_reader as th
from hurricanedb_spark.sources.ingestion import read_batch

FIELDS = {
    1: ("id", "i64"),
    2: ("name", "string"),
    3: ("score", "double"),
    4: ("active", "bool"),
    5: ("tags", "list<string>"),
    6: ("counts", "list<i64>"),
    7: ("small", "i16"),
    8: ("blob", "binary"),
}

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("active", T.BooleanType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("small", T.ShortType()),
        T.StructField("blob", T.BinaryType()),
    ]
)

ROWS = [
    {"id": 1, "name": "alpha", "score": 1.5, "active": True,
     "tags": ["a", "b"], "counts": [1, -2, 3], "small": -7,
     "blob": b"\x00\xff"},
    {"id": -(2**40), "name": "béta", "score": -0.25, "active": False,
     "tags": [], "counts": [], "small": 32767, "blob": b""},
    {"id": 2**62, "name": "", "score": 0.0, "active": True,
     "tags": ["x"], "counts": [2**40], "small": 0, "blob": b"z"},
]


def test_struct_roundtrip():
    for row in ROWS:
        buf = th.encode_struct(row, FIELDS)
        got, pos = th.decode_struct(buf, 0, FIELDS)
        assert pos == len(buf)
        for k, v in row.items():
            if isinstance(v, float):
                assert math.isclose(got[k], v)
            else:
                assert got[k] == v


def test_concatenated_structs_iterate():
    blob = b"".join(th.encode_struct(r, FIELDS) for r in ROWS)
    got = list(th.iter_structs(blob, FIELDS))
    assert [g["id"] for g in got] == [r["id"] for r in ROWS]


def test_unknown_fields_and_nested_skipped():
    import struct

    # known prefix + unknown i32 field 99 + unknown nested struct field 98
    # + unknown map field 97, then STOP
    buf = bytearray(th.encode_struct({"id": 5, "name": "keep"}, FIELDS))
    del buf[-1]  # re-open the struct (drop STOP)
    buf += struct.pack(">bhi", th.T_I32, 99, 1234)
    inner = th.encode_struct({"id": 1}, FIELDS)
    buf += struct.pack(">bh", th.T_STRUCT, 98) + inner
    buf += struct.pack(">bhbbi", th.T_MAP, 97, th.T_STRING, th.T_I64, 1)
    buf += struct.pack(">i", 1) + b"k" + struct.pack(">q", 9)
    buf.append(th.T_STOP)
    got, pos = th.decode_struct(bytes(buf), 0, FIELDS)
    assert pos == len(buf)
    assert got["id"] == 5 and got["name"] == "keep"
    assert 99 not in got and "counts" not in got


def test_truncated_struct_raises():
    buf = th.encode_struct(ROWS[0], FIELDS)[:-1]  # drop the STOP byte
    with pytest.raises(ValueError, match="STOP"):
        th.decode_struct(buf, 0, FIELDS)


def test_read_thrift_through_spark(spark):
    d = tempfile.mkdtemp(prefix="hth-")
    try:
        half = len(ROWS) // 2 or 1
        th.write_thrift_file(f"{d}/part-0.thrift", ROWS[:half], FIELDS)
        th.write_thrift_file(f"{d}/part-1.thrift", ROWS[half:], FIELDS)
        df = read_batch(
            spark, d, fmt="thrift", schema=SCHEMA, thrift_fields=FIELDS
        )
        got = {r.id: r for r in df.collect()}
        assert len(got) == len(ROWS)
        for row in ROWS:
            r = got[row["id"]]
            assert r.name == row["name"]
            assert math.isclose(r.score, row["score"])
            assert r.active == row["active"]
            assert list(r.tags or []) == row["tags"]
            assert list(r.counts or []) == row["counts"]
            assert r.small == row["small"]
            assert bytes(r.blob or b"") == row["blob"]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_cross_check_against_thrift_lib():
    """When the real thrift lib is installed, our bytes must decode
    identically through its TBinaryProtocol."""
    pytest.importorskip("thrift")
    from thrift.protocol.TBinaryProtocol import TBinaryProtocol
    from thrift.transport.TTransport import TMemoryBuffer

    buf = th.encode_struct(ROWS[0], FIELDS)
    proto = TBinaryProtocol(TMemoryBuffer(buf))
    proto.readStructBegin()
    seen = {}
    while True:
        _, ftype, fid = proto.readFieldBegin()
        if ftype == 0:
            break
        if ftype == th.T_I64:
            seen[fid] = proto.readI64()
        elif ftype == th.T_STRING:
            seen[fid] = proto.readBinary()
        elif ftype == th.T_DOUBLE:
            seen[fid] = proto.readDouble()
        elif ftype == th.T_BOOL:
            seen[fid] = proto.readBool()
        elif ftype == th.T_I16:
            seen[fid] = proto.readI16()
        elif ftype == th.T_LIST:
            et, n = proto.readListBegin()
            seen[fid] = [
                proto.readString() if et == th.T_STRING else proto.readI64()
                for _ in range(n)
            ]
            proto.readListEnd()
        proto.readFieldEnd()
    assert seen[1] == 1 and seen[2] == b"alpha" and seen[6] == [1, -2, 3]


def test_high_field_id_unsigned():
    """Field ids above Short.MAX_VALUE arrive as negative i16 on the wire;
    the reader normalizes with the reference's Short.toUnsignedInt
    (ThriftRecordReader.java:72) so the configured-fields lookup matches."""
    import struct as _s

    buf = (
        bytes([th.T_I64])
        + _s.pack(">H", 40000)
        + _s.pack(">q", 99)
        + bytes([th.T_STOP])
    )
    got, pos = th.decode_struct(buf, 0, {40000: ("v", "i64")})
    assert pos == len(buf) and got == {"v": 99}
