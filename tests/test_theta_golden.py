"""Cross-JVM golden fixtures for the theta wire contract (round-12).

tools/java/ThetaGolden.java re-derives the public DataSketches theta
format on the container's REAL JDK 17 and emits
tests/fixtures/theta_jdk17_golden.json. These tests pin
operators/theta_ds.py byte-for-byte against that ground truth — the
Java-semantics half of the contract (signed 64-bit arithmetic, `>>>`,
Double.doubleToLongBits NaN canonicalization, UTF-8, little-endian
compact layout) that a pure-Python reimplementation is most likely to
drift on. The clearspring sibling (tests/test_clearspring_golden.py)
caught a real Math.round ties bug this way in round 11.

A byte capture from the real org.apache.datasketches jar remains the
documented residual: the jar is not in this container; what IS pinned
here ran on the real JVM.
"""

from __future__ import annotations

import json
import math
import os
import struct

from hurricanedb_spark.operators.theta_ds import (
    CompactTheta,
    MAX_THETA,
    canonical_bytes,
    compute_seed_hash,
    deserialize,
    ds_hash_bytes,
    serialize,
)

_FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "theta_jdk17_golden.json"
)

with open(_FIXTURE, encoding="utf-8") as f:
    GOLDEN = json.load(f)


def test_seed_hashes_match_jdk():
    for seed, want in GOLDEN["seed_hashes"].items():
        assert compute_seed_hash(int(seed)) == want


def test_hash63_matches_jdk_for_canonical_inputs():
    """63-bit sketch hashes over the canonical update() byte forms:
    longs (8-byte LE), doubles (doubleToLongBits: every NaN payload ->
    0x7ff8000000000000, -0.0 -> +0.0), UTF-8 strings incl. non-BMP."""
    for kind, value, want in GOLDEN["hashes"]:
        if kind == "long":
            data = canonical_bytes(int(value))
        elif kind == "double":
            bits = int(value, 16)
            d = struct.unpack("<d", struct.pack("<Q", bits))[0]
            data = canonical_bytes(d)
            if math.isnan(d):
                # the fixture carries two distinct NaN payloads; Python
                # must canonicalize both to the same bits Java does
                assert data == struct.pack("<Q", 0x7FF8000000000000)
        else:
            data = canonical_bytes(value)
        assert ds_hash_bytes(data) == int(want), (kind, value)


def test_compact_serialization_matches_jdk():
    """Byte-identity of all four compact-ordered layouts: empty (1
    preamble long + EMPTY flag), single-item (1 preamble long + hash),
    exact mode (2 preamble longs), estimation mode (3 preamble longs
    with thetaLong) — and the deserializer round-trips each."""
    sh = compute_seed_hash(9001)
    for case in GOLDEN["sketches"]:
        hashes = tuple(int(h) for h in case["hashes"])
        sk = CompactTheta(int(case["theta"]), hashes, sh)
        got = serialize(sk, case["lg_nom"])
        assert got.hex() == case["hex"], case["desc"]
        back = deserialize(bytes.fromhex(case["hex"]), expected_seed_hash=sh)
        assert back.theta_long == int(case["theta"])
        assert back.hashes == hashes
        assert back.seed_hash == sh


def test_estimating_fixture_is_genuinely_estimation_mode():
    est = next(c for c in GOLDEN["sketches"] if c["desc"] == "estimating8")
    assert int(est["theta"]) < MAX_THETA
    assert all(int(h) < int(est["theta"]) for h in est["hashes"])
    # 3-preamble-long layout: thetaLong occupies bytes 16..24
    raw = bytes.fromhex(est["hex"])
    assert raw[0] == 3
    (theta_long,) = struct.unpack_from("<q", raw, 16)
    assert theta_long == int(est["theta"])
