"""REAL-library golden fixtures (round-12) — the strongest interop
evidence available: this container's pyspark bundles the ACTUAL
libraries behind the reference's sketch wire formats
(stream-2.9.8 clearspring HyperLogLog; datasketches-java-6.2.0 theta),
and tools/java/RealLibGolden.java captured serialized bytes from them
into tests/fixtures/reallib_golden.json.

The capture CAUGHT TWO LONG-STANDING INTEROP BUGS the re-derived
implementations (and their JDK-17 re-derived goldens) shared:

  1. theta_ds._C2 was a corrupted transcription of the canonical
     MurmurHash3 x64-128 constant (0x4CF5AB832BE87313 instead of
     0x4CF5AD432745937F) — internally self-consistent, but every sketch
     lived in a different hash space than real DataSketches/Pinot and
     the seed-hash mismatched (real readers would reject our bytes;
     cross-library unions would double-count).
  2. clearspring offers went through hash64(toString) where the real
     HyperLogLog.offer(Object) uses the 32-BIT MurmurHash.hash(Object)
     with RAW-BITS number dispatch and offerHashed(int) — every
     register landed in the wrong place.

These tests pin byte-identity against the real libraries so neither
class of bug can silently return.

Version note: the reference pins com.clearspring:stream 2.7.0
(pom.xml:884) while the bundled jar is 2.9.8 — the surfaces exercised
here (HyperLogLog.offer(Object) -> 32-bit MurmurHash.hash dispatch ->
offerHashed(int), RegisterSet packing, getBytes, cardinality) are
unchanged between those releases (the public history adds the separate
offerHashed(long) entry without touching offer(Object)); datasketches
theta's serial-version-3 compact format is stable by spec.
"""

from __future__ import annotations

import json
import math
import os

import pandas as pd
import pytest

from hurricanedb_spark.operators.clearspring_hll import (
    ClearspringHLL,
    _double_raw_bits,
    _float_raw_bits,
    build_hll,
    merge_hlls,
)
from hurricanedb_spark.operators.theta_ds import (
    MAX_THETA,
    a_not_b,
    build_sketch,
    deserialize,
    intersect,
    serialize,
    union,
)

_FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "reallib_golden.json"
)

with open(_FIXTURE, encoding="utf-8") as f:
    GOLDEN = json.load(f)

HLL = {(r["name"], r["log2m"]): r for r in GOLDEN["hll_blobs"]}
THETA = {r["name"]: r for r in GOLDEN["theta"]}


def _f32_series(n: int):
    import numpy as np

    # Java computes i * 0.37f - 20.0f in FLOAT32 arithmetic
    c = np.float32(0.37)
    return [float(np.float32(np.float32(i) * c) - np.float32(20.0)) for i in range(n)]


@pytest.mark.parametrize("log2m", [8, 12, 16])
def test_hll_blobs_byte_identical_to_real_stream_lib(log2m):
    cases = [
        ("ints_x500", [i * 7 - 250 for i in range(500)], "int"),
        ("longs_x300", [i * 1_000_000_007 for i in range(300)], "long"),
        ("doubles_x400", [i * 0.37 - 20.0 for i in range(400)], "double"),
        ("floats_x400", _f32_series(400), "float"),
        ("strings_x350", [f"doc-{i}-body" for i in range(350)], "string"),
        ("empty", [], "int"),
    ]
    for name, values, t in cases:
        mine = build_hll(pd.Series(values, dtype="object"), t, log2m)
        real = HLL[(name, log2m)]
        assert mine.hex() == real["hex"], (name, log2m)
        assert (
            ClearspringHLL.deserialize(mine).cardinality()
            == real["cardinality"]
        ), (name, log2m)
    # register-max merge == the real library's addAll
    merged = merge_hlls(
        [
            bytes.fromhex(HLL[("ints_x500", log2m)]["hex"]),
            bytes.fromhex(HLL[("strings_x350", log2m)]["hex"]),
        ]
    )
    assert merged.hex() == HLL[("merged_ints_strings", log2m)]["hex"]


def test_theta_exact_builds_byte_identical_to_real_datasketches():
    cases = [
        ("empty", [], 4096),
        ("single_long7", [7], 4096),
        ("exact_longs_1_20", list(range(1, 21)), 256),
        (
            "strings6",
            ["a", "hurricane", "the quick brown fox", "日本語", "café", "😀"],
            4096,
        ),
        (
            "doubles8_nan_negzero",
            [0.0, -0.0, 1.5, -2.75, 1e300, 4.9e-324, float("nan"), float("nan")],
            4096,
        ),
    ]
    for name, values, k in cases:
        mine = serialize(build_sketch(values, k=k))
        real = THETA[name]
        assert mine.hex() == real["hex"], name
        back = deserialize(bytes.fromhex(real["hex"]))
        assert math.isclose(back.estimate(), real["estimate"]), name


def test_theta_set_ops_byte_identical_to_real_datasketches():
    a = build_sketch(range(0, 10), k=256)
    b = build_sketch(range(5, 20), k=256)
    assert serialize(a).hex() == THETA["setop_a"]["hex"]
    assert serialize(b).hex() == THETA["setop_b"]["hex"]
    assert serialize(union([a, b], 256)).hex() == THETA["union_ab"]["hex"]
    assert serialize(intersect(a, b)).hex() == THETA["intersect_ab"]["hex"]
    assert serialize(a_not_b(a, b)).hex() == THETA["anotb_ab"]["hex"]


def test_theta_estimating_real_bytes_round_trip():
    """Estimation-regime interop contract: the retention POLICY of a
    live QuickSelect update sketch is implementation-path-dependent (the
    real k=16 sketch retains 28 entries), so build-byte-identity is not
    the claim — reading their bytes and writing bytes they can read is:
    deserialize -> re-serialize must be byte-identical, the theta and
    estimate must match the library's own."""
    r = THETA["estimating_k16_n10000"]
    sk = deserialize(bytes.fromhex(r["hex"]))
    assert sk.theta_long == r["theta_long"] < MAX_THETA
    assert len(sk.hashes) == r["retained"]
    assert serialize(sk).hex() == r["hex"]
    assert math.isclose(sk.estimate(), r["estimate"], rel_tol=1e-12)
