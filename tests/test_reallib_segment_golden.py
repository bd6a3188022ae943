"""REAL-library golden fixtures for the SEGMENT-FORMAT byte surfaces
(round-13) — the round-12 methodology (which caught two hash-space bugs
in the re-derived sketch codecs) applied to the segment store's
remaining re-derived formats. tools/java/SegmentLibGolden.java captured
bytes from the ACTUAL jars bundled with this container's pyspark
(guava-33.4.8-jre, RoaringBitmap-1.3.0, lz4-java-1.8.0,
snappy-java-1.1.10.8, zstd-jni-1.5.7-6) into
tests/fixtures/reallib_segment_golden.json; regenerate with
tools/gen_reallib_segment_golden.py.

The capture caught THREE interop defects in the re-derivations:

  1. the .bloom index buffer lacked Pinot's 8-byte TYPE/VERSION
     envelope (BloomFilterReaderFactory.java:31-41) — the reference
     would reject our buffers and real migrated segments failed ours;
  2. guava bloom sizing diverged: optimalNumOfHashFunctions uses the
     PRE-rounding bit count with Java's ties-toward-+inf Math.round
     (we floored bits at one long first — k=44 instead of k=4 at n=1);
  3. roaring_serialize never emitted RUN containers, but the
     reference's creators flush every container through runOptimize()
     (OnHeapBitmapInvertedIndexCreator.java:41-45 via
     RoaringBitmapWriter's default runCompress) — our files were
     readable but not byte-identical to the reference's.

Additionally the zstd chunk level is pinned to 3 (zstd-jni's default,
ZstandardCompressor.java:42) so even the compressed frames are
byte-identical, not merely cross-readable.

Both directions are covered: these tests assert the Python writers
reproduce the real libraries' bytes and the Python readers decode
them; the fixture's `py_*` verdicts (computed inside the Java harness
at capture time) assert the real libraries accepted the Python blobs.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pytest

from hurricanedb_spark.sources.pinot_segment import (
    _compress_chunk,
    _decompress_chunk,
    bloom_might_contain,
    bloom_serialize,
    roaring_deserialize,
    roaring_serialize,
)

_FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "reallib_segment_golden.json"
)
_ENVELOPE = bytes.fromhex("0000000100000001")  # TYPE_VALUE=1, VERSION=1

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "tools")
)
from gen_reallib_segment_golden import (  # noqa: E402
    bloom_cases,
    payload_cases,
    roaring_cases,
)


@pytest.fixture(scope="module")
def fixture():
    with open(_FIXTURE, encoding="utf-8") as f:
        return json.load(f)


def test_bloom_bytes_identical_to_real_guava(fixture):
    cases = bloom_cases()
    rows = {r["name"]: r for r in fixture["bloom"]}
    assert set(rows) == set(cases)
    for name, (n, fpp, values) in cases.items():
        r = rows[name]
        assert r["py_envelope_ok"], name
        assert r["py_equal"], name  # verdict from capture time
        # live: current writer still reproduces the real library's bytes
        assert bloom_serialize(values, fpp) == _ENVELOPE + bytes.fromhex(
            r["hex"]
        ), name


def test_bloom_python_reader_matches_real_probes(fixture):
    """bloom_might_contain over the REAL guava bytes returns exactly
    what the real BloomFilter.mightContain returned for every probe."""
    for r in fixture["bloom"]:
        buf = _ENVELOPE + bytes.fromhex(r["hex"])
        for p in r["probes"]:
            value = bytes.fromhex(p["value_hex"]).decode("utf-8")
            assert bloom_might_contain(buf, value) == p["contains"], (
                r["name"],
                value,
            )


def test_bloom_real_library_accepted_python_bytes(fixture):
    """BloomFilter.readFrom parsed the Python blob and found every
    inserted member (verdict recorded by the harness at capture)."""
    for r in fixture["bloom"]:
        assert r["py_readfrom_ok"], r["name"]


def test_roaring_bytes_identical_to_real_library(fixture):
    cases = roaring_cases()
    rows = {r["name"]: r for r in fixture["roaring"]}
    assert set(rows) == set(cases)
    for name, values in cases.items():
        r = rows[name]
        assert r["py_equal"], name
        assert r["py_decode_ok"], name  # real lib decoded python bytes
        real = bytes.fromhex(r["hex"])
        assert roaring_serialize(values) == real, name
        # python reader decodes the real bytes (incl. RUN containers)
        got = roaring_deserialize(real) if real else np.array([], "u4")
        assert got.tolist() == sorted(set(values)), name
        assert r["cardinality"] == len(set(values)), name


def test_chunk_codecs_against_real_jars(fixture):
    payloads = payload_cases()
    for r in fixture["compression"]:
        p = payloads[r["name"]]
        real = bytes.fromhex(r["hex"])
        codec = r["codec"]
        # real library accepted the python writer's blob
        assert r["py_decompress_ok"], (r["name"], codec)
        # python writer reproduces the real bytes (all 16 cases were
        # identical at capture; keep that strength)
        assert r["py_identical"], (r["name"], codec)
        assert _compress_chunk(p, codec) == real, (r["name"], codec)
        # python reader decodes the real bytes, with the known size...
        assert _decompress_chunk(real, codec, len(p)) == p
        # ...and without it, where every format self-describes (the
        # var-byte chunk paths): snappy varint, zstd frame content
        # size, lz4 length prefix, pure-python lz4 block walk
        assert _decompress_chunk(real, codec, None) == p


def test_roaring_runoptimize_rule_boundaries():
    """The run-container decision is the library's strict-inequality
    rule: 2 + 4*numRuns < 2*cardinality (array) / 8192 (bitmap)."""
    # 2 values, 2 runs: run size 10 >= array size 4 -> stays array
    blob = roaring_serialize([10, 12])
    assert int.from_bytes(blob[:4], "little") == 12346
    # one dense run of 3: run size 6 >= array size 6 -> stays array
    assert int.from_bytes(roaring_serialize([5, 6, 7])[:4], "little") == 12346
    # one dense run of 4: run size 6 < array size 8 -> run container
    assert (
        int.from_bytes(roaring_serialize([5, 6, 7, 8])[:4], "little")
        & 0xFFFF
        == 12347
    )
    # dense 5000: bitmap would be 8192, run size 6 -> run container
    blob = roaring_serialize(list(range(5000)))
    assert int.from_bytes(blob[:4], "little") & 0xFFFF == 12347
    # alternating 5000 (5000 runs): run size 20002 >= 8192 -> bitmap
    blob = roaring_serialize(list(range(0, 10000, 2)))
    assert int.from_bytes(blob[:4], "little") == 12346
    # round-trips for all of the above shapes
    for vals in (
        [10, 12],
        [5, 6, 7],
        [5, 6, 7, 8],
        list(range(5000)),
        list(range(0, 10000, 2)),
    ):
        assert roaring_deserialize(roaring_serialize(vals)).tolist() == vals


def test_roaring_with_run_cookie_past_int32(tmp_path):
    """Round-13 ADVICE: ≥32769 containers push the with-run cookie
    `12347 | ((size-1) << 16)` past INT32_MAX — Java writes it wrapped
    negative; the writer must pack unsigned (struct '<i' raised) and
    both decoders must mask the size instead of sign-extending it."""
    import numpy as np

    from hurricanedb_spark.operators.idset_wire import _roaring_stream_len

    n_containers = 32769  # (size-1)<<16 | 12347 = 0x8000303B > INT32_MAX
    keys = np.arange(n_containers, dtype=np.uint64)
    # 4 consecutive lows per key -> every container is a RUN container
    vals = ((keys << 16)[:, None] | np.arange(4, dtype=np.uint64)).ravel()
    blob = roaring_serialize(vals)
    cookie = int.from_bytes(blob[:4], "little")
    assert cookie > 0x7FFFFFFF and (cookie & 0xFFFF) == 12347
    got = roaring_deserialize(blob)
    assert len(got) == len(vals) and got[0] == 0 and int(got[-1]) == int(vals[-1])
    assert _roaring_stream_len(blob) == len(blob)
