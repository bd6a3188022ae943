"""JSON index binary format (sources/json_index.py): flatten semantics
pinned to JsonUtils.flatten's documented behavior, the reader's key
normalization examples (ImmutableJsonIndexReader.java:168-175), and
query-vs-python-filter equivalence."""

from __future__ import annotations

import json
import struct

import numpy as np
import pandas as pd
import pytest

from hurricanedb_spark.sources import json_index as ji
from hurricanedb_spark.sources import pinot_segment as ps


def test_flatten_scalar_object_array():
    assert ji.flatten_json("abc") == [{"": "abc"}]
    assert ji.flatten_json(None) == []
    assert ji.flatten_json({"a": 1, "b": {"c": "x"}}) == [
        {".a": "1", ".b.c": "x"}
    ]
    # array unnests: one record per element, '.'-prefixed keys + .$index
    assert ji.flatten_json([7, 8]) == [
        {".": "7", ".$index": "0"},
        {".": "8", ".$index": "1"},
    ]
    got = ji.flatten_json({"t": ["x", "y"], "k": 1})
    assert got == [
        {".t.": "x", ".t.$index": "0", ".k": "1"},
        {".t.": "y", ".t.$index": "1", ".k": "1"},
    ]


def test_flatten_cross_array_unnest():
    got = ji.flatten_json({"a": [1, 2], "b": ["x", "y"]})
    assert len(got) == 4  # cross product (default config)
    assert {(r[".a."], r[".b."]) for r in got} == {
        ("1", "x"), ("1", "y"), ("2", "x"), ("2", "y")
    }


DOCS = [
    {"name": "alice", "addr": {"city": "berlin", "zip": "10115"}},
    {"name": "bob", "tags": ["red", "blue"], "addr": {"city": "paris"}},
    {"name": "carol", "tags": ["blue"], "nested": [{"x": 1}, {"x": 2}]},
    None,
    {"name": "dave", "tags": []},
]


def _segment(tmp_path):
    pdf = pd.DataFrame(
        {"js": [None if d is None else json.dumps(d) for d in DOCS]}
    )
    seg = str(tmp_path / "segjson")
    ps.write_segment_pandas(pdf, seg, json_index_columns=["js"])
    return seg


def test_binary_layout(tmp_path):
    seg = _segment(tmp_path)
    meta = ps.read_segment_metadata(seg)
    assert ("js", "json_index") in meta.index_map
    buf = ps._index_buffer(meta, ps._read_psf(meta), "js", "json_index")
    version, max_len = struct.unpack_from(">ii", buf, 0)
    dict_len, inv_len, map_len = struct.unpack_from(">qqq", buf, 8)
    assert version == 2 and max_len > 0
    assert 32 + dict_len + inv_len + map_len == len(buf)
    # dictionary section is the var-length layout
    assert buf[32:36] == b".vl;"
    idx = ji.read_json_index(seg, "js")
    # posting keys include bare keys and key\0value pairs
    assert idx._dict_id(".name") >= 0
    assert idx._dict_id(".name\0alice") >= 0


def test_equality_and_exists_queries(tmp_path):
    seg = _segment(tmp_path)
    idx = ji.read_json_index(seg, "js")
    # nested path equality (JSONPath and legacy forms)
    assert idx.matching_docs([("$.addr.city", "paris")]).tolist() == [1]
    assert idx.matching_docs([("addr.city", "berlin")]).tolist() == [0]
    # array wildcard
    assert idx.matching_docs([("$.tags[*]", "blue")]).tolist() == [1, 2]
    # array index: tags[1]='blue' only matches bob
    assert idx.matching_docs([("$.tags[1]", "blue")]).tolist() == [1]
    assert idx.matching_docs([("$.tags[0]", "blue")]).tolist() == [2]
    # nested array of objects
    assert idx.matching_docs([("$.nested[*].x", "2")]).tolist() == [2]
    assert idx.matching_docs([("$.nested[1].x", "2")]).tolist() == [2]
    assert idx.matching_docs([("$.nested[0].x", "2")]).tolist() == []
    # key existence
    assert idx.matching_docs([("$.tags[*]", None)]).tolist() == [1, 2]
    assert idx.matching_docs([("$.addr.zip", None)]).tolist() == [0]
    # AND of predicates
    assert idx.matching_docs(
        [("$.tags[*]", "blue"), ("$.addr.city", "paris")]
    ).tolist() == [1]
    # misses
    assert idx.matching_docs([("$.addr.city", "rome")]).tolist() == []
    assert idx.matching_docs([("$.nope", None)]).tolist() == []


def test_index_answers_match_python_filter(tmp_path):
    rng = np.random.default_rng(4)
    docs = [
        {
            "u": f"user{int(rng.integers(0, 30))}",
            "ev": [
                {"t": str(int(rng.integers(0, 5))), "n": int(rng.integers(0, 3))}
                for _ in range(int(rng.integers(1, 4)))
            ],
        }
        for _ in range(400)
    ]
    pdf = pd.DataFrame({"js": [json.dumps(d) for d in docs]})
    seg = str(tmp_path / "segjson2")
    ps.write_segment_pandas(pdf, seg, json_index_columns=["js"])
    idx = ji.read_json_index(seg, "js")
    for t in ("0", "3"):
        got = idx.matching_docs([("$.ev[*].t", t)]).tolist()
        exp = [
            i for i, d in enumerate(docs) if any(e["t"] == t for e in d["ev"])
        ]
        assert got == exp, t
    got = idx.matching_docs([("$.ev[0].n", "2")]).tolist()
    exp = [i for i, d in enumerate(docs) if d["ev"][0]["n"] == 2]
    assert got == exp
