"""Protobuf input format: wire-level round trip through the Spark reader
(reference: pinot-protobuf ProtoBufRecordReader over size-delimited
messages). The decode kernel is pure Python over the public wire format,
so these tests run without the google.protobuf package; when that package
is present an extra cross-check validates our encoder against it."""

from __future__ import annotations

import math
import shutil
import tempfile

import pytest
from pyspark.sql import types as T

from hurricanedb_spark.sources import protobuf_reader as pb
from hurricanedb_spark.sources.ingestion import read_batch

FIELDS = {
    1: ("id", "int64"),
    2: ("name", "string"),
    3: ("score", "double"),
    4: ("active", "bool"),
    5: ("tags", "string"),   # repeated (unpacked — strings can't pack)
    6: ("counts", "int64"),  # repeated (packed or unpacked varints)
    7: ("delta", "sint64"),
}

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("active", T.BooleanType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("delta", T.LongType()),
    ]
)

ROWS = [
    {"id": 1, "name": "alpha", "score": 1.5, "active": True,
     "tags": ["a", "b"], "counts": [1, 2, 3], "delta": -42},
    {"id": -7, "name": "béta", "score": -0.25, "active": False,
     "tags": [], "counts": [], "delta": 0},
    {"id": 2**62, "name": "", "score": 0.0, "active": True,
     "tags": ["x"], "counts": [2**40], "delta": -(2**35)},
]


def test_varint_roundtrip():
    for v in [0, 1, 127, 128, 300, 2**32, 2**63 - 1]:
        buf = pb.write_varint(v)
        got, pos = pb.read_varint(buf, 0)
        assert got == v and pos == len(buf)


def test_message_roundtrip_scalar_and_repeated():
    for row in ROWS:
        msg = pb.encode_message(row, FIELDS)
        got = pb.decode_message(msg, FIELDS, repeated={"tags", "counts"})
        for k, v in row.items():
            if isinstance(v, list):
                assert got.get(k, []) == v
            elif isinstance(v, float):
                assert math.isclose(got[k], v)
            else:
                assert got[k] == v


def test_packed_repeated_decoding():
    # packed encoding: one LEN record holding concatenated varints
    payload = b"".join(pb.write_varint(v) for v in [5, 6, 7])
    msg = pb.write_varint((6 << 3) | pb.WIRE_LEN) + pb.write_varint(len(payload)) + payload
    got = pb.decode_message(msg, FIELDS, repeated={"counts"})
    assert got["counts"] == [5, 6, 7]


def test_unknown_fields_skipped():
    row = {"id": 9, "name": "keep"}
    msg = pb.encode_message(row, FIELDS)
    # append an unknown field 99 (varint) and 98 (length-delimited)
    msg += pb.write_varint((99 << 3) | pb.WIRE_VARINT) + pb.write_varint(1234)
    msg += pb.write_varint((98 << 3) | pb.WIRE_LEN) + pb.write_varint(3) + b"xyz"
    got = pb.decode_message(msg, FIELDS)
    assert got["id"] == 9 and got["name"] == "keep"


def test_read_protobuf_through_spark(spark):
    d = tempfile.mkdtemp(prefix="hpb-")
    try:
        half = len(ROWS) // 2 or 1
        pb.write_delimited_file(f"{d}/part-0.pb", ROWS[:half], FIELDS)
        pb.write_delimited_file(f"{d}/part-1.pb", ROWS[half:], FIELDS)
        df = read_batch(
            spark, d, fmt="protobuf", schema=SCHEMA, protobuf_fields=FIELDS
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
            assert r.delta == row["delta"]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_cross_check_against_google_protobuf():
    """When the real protobuf lib is installed, our encoder's output must
    parse identically through it (descriptor-based)."""
    pytest.importorskip("google.protobuf")
    from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

    pool = descriptor_pool.DescriptorPool()
    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = "t.proto"
    m = fdp.message_type.add()
    m.name = "Row"
    for num, (name, ptype) in FIELDS.items():
        f = m.field.add()
        f.name, f.number = name, num
        f.type = {
            "int64": 3, "string": 9, "double": 1, "bool": 8, "sint64": 18
        }[ptype]
        f.label = 3 if name in ("tags", "counts") else 1
    pool.Add(fdp)
    cls = message_factory.GetMessageClass(pool.FindMessageTypeByName("Row"))
    msg = cls.FromString(pb.encode_message(ROWS[0], FIELDS))
    assert msg.id == 1 and msg.name == "alpha" and list(msg.counts) == [1, 2, 3]
