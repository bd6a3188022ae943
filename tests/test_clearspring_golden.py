"""Cross-JVM golden vectors for the clearspring HyperLogLog writer
(round-11, r10 verdict #6).

Fixtures in tests/fixtures/clearspring_jdk17_golden.json were generated
by tools/java/ClearspringGolden.java running on the REAL JDK in this
container (OpenJDK 17) — so the Java-semantics-dependent parts of the
wire contract are pinned against actual Java, not a Python
self-derivation: Double/Float.toString rendering, Math.round (incl. the
Infinity -> Long.MAX_VALUE branch the zeros==0 small-range estimate
hits), Long.numberOfLeadingZeros-based ranks, and the big-endian
DataOutputStream serialization. The HyperLogLog algorithm itself is
re-derived in the generator from the PUBLIC stream-lib format
(Apache-2.0). Round-12 closes the long-documented residual: pyspark's
own jar directory bundles the REAL stream-2.9.8, and
tests/test_reallib_golden.py byte-compares against it — which CAUGHT
the re-derivation offering 64-bit toString hashes where the real
HyperLogLog.offer(Object) uses the 32-bit raw-bits path; both the
generator and operators/clearspring_hll.py now implement the real
contract and all blobs are byte-identical to the actual library.

The JDK<19 Double.toString caveat (JDK-4511638, fixed by the Ryu
rewrite in 19): since the r12 correction the offer path hashes numbers
by RAW BITS, so toString rendering no longer affects HLL bytes at all;
the renderings stay pinned below (KNOWN_JDK17_DOUBLE_DIVERGENCES) for
the toString-dependent surfaces that remain (hash64(Object) generics).
"""

from __future__ import annotations

import json
import struct
from pathlib import Path

import numpy as np
import pytest

from hurricanedb_spark.operators.clearspring_hll import (
    JAVA_LONG_MAX,
    ClearspringHLL,
    _java_double_str,
    _java_float_str,
    merge_hlls,
    murmur64,
)

FIXTURE = (
    Path(__file__).parent / "fixtures" / "clearspring_jdk17_golden.json"
)

# Empirical JDK-17 divergences from the shortest-decimal rendering this
# module (and JDK >= 19) produces: bit-pattern hex -> (JDK17 string,
# shortest string). All are the documented pre-Ryu non-shortest /
# tie-break cases; integers and strings are unaffected.
KNOWN_JDK17_DOUBLE_DIVERGENCES = {
    "44b52d02c7e14af6": ("9.999999999999999E22", "1.0E23"),
    "0000000000000001": ("4.9E-324", "5.0E-324"),  # Double.MIN_VALUE
}
KNOWN_JDK17_FLOAT_DIVERGENCES = {
    "00800000": ("1.17549435E-38", "1.1754944E-38"),  # Float.MIN_NORMAL
    "00000001": ("1.4E-45", "1.0E-45"),  # Float.MIN_VALUE
    "d0db7fed": ("-2.94607524E10", "-2.9460752E10"),
}


@pytest.fixture(scope="module")
def golden():
    return json.loads(FIXTURE.read_text())


def test_double_tostring_matches_jdk(golden):
    """64 doubles (edge + deterministic pseudo-random bit patterns):
    the shortest-decimal rendering matches real JDK 17 everywhere except
    the pinned pre-Ryu divergences — which must still be exactly the
    recorded pair, so any drift in either rendering fails loudly."""
    for bits, jdk in golden["double_tostring"]:
        v = struct.unpack(">d", bytes.fromhex(bits))[0]
        got = _java_double_str(v)
        if bits in KNOWN_JDK17_DOUBLE_DIVERGENCES:
            exp_jdk, exp_short = KNOWN_JDK17_DOUBLE_DIVERGENCES[bits]
            assert (jdk, got) == (exp_jdk, exp_short), bits
        else:
            assert got == jdk, (bits, jdk, got)


def test_float_tostring_matches_jdk(golden):
    for bits, jdk in golden["float_tostring"]:
        v = struct.unpack(">f", bytes.fromhex(bits))[0]
        got = _java_float_str(v)
        if bits in KNOWN_JDK17_FLOAT_DIVERGENCES:
            exp_jdk, exp_short = KNOWN_JDK17_FLOAT_DIVERGENCES[bits]
            assert (jdk, got) == (exp_jdk, exp_short), bits
        else:
            assert got == jdk, (bits, jdk, got)


def test_math_round_semantics(golden):
    """_java_round reproduces real Math.round on every golden row —
    including 0.49999999999999994 -> 0 (the JDK-7 fix the naive
    floor(x+0.5) emulation gets wrong: the addition rounds up to 1.0)
    and Infinity -> Long.MAX_VALUE (the zeros==0 linear-counting
    value)."""
    from hurricanedb_spark.operators.clearspring_hll import _java_round

    for s, want in golden["math_round"]:
        assert _java_round(float(s)) == want, (s, want)
    assert golden["math_round"][-1][1] == JAVA_LONG_MAX


def test_murmur64_matches_jvm(golden):
    for s, hexhash in golden["murmur64"]:
        assert format(murmur64(s.encode()), "016x") == hexhash, s


def _build(name: str, log2m: int, golden) -> ClearspringHLL:
    """Rebuild the generator's HLL with the same typed inputs through
    the module's offer dispatch — round-12: the REAL offer(Object) path
    (32-bit MurmurHash; numbers by raw bits via hashLong, strings by
    UTF-8 bytes), byte-verified against the actual stream-2.9.8 jar in
    tests/test_reallib_golden.py."""
    from hurricanedb_spark.operators.clearspring_hll import (
        _double_raw_bits,
        _float_raw_bits,
    )

    h = ClearspringHLL(log2m)
    if name == "ints_x500":
        for i in range(500):
            h.offer_long(i * 7 - 250)
    elif name == "longs_x300":
        for i in range(300):
            h.offer_long(i * 1_000_000_007)
    elif name == "doubles_x400":
        for i in range(400):
            h.offer_long(_double_raw_bits(i * 0.37 - 20.0))
    elif name == "floats_x400":
        # Java computes i * 0.37f - 20.0f in FLOAT32 arithmetic
        for i in range(400):
            v = np.float32(i) * np.float32(0.37) - np.float32(20.0)
            h.offer_long(_float_raw_bits(float(v)))
    elif name == "strings_x350":
        for i in range(350):
            h.offer_bytes(f"doc-{i}-body".encode())
    elif name == "merged_ints_strings":
        h = _build("ints_x500", log2m, golden)
        h.merge(_build("strings_x350", log2m, golden))
    elif name == "empty":
        pass
    elif name == "saturated_log2m4":
        for s in golden["saturated_inputs"]:
            h.offer_bytes(s.encode())
    else:  # pragma: no cover - fixture drift
        raise AssertionError(f"unknown fixture blob {name}")
    return h


def test_hll_blobs_byte_identical_and_cardinality(golden):
    """Every serialized blob (ints/longs/doubles/floats/strings at
    log2m 8/12/16, a register-max merge, empty, and the crafted
    all-registers-1 saturation) is byte-identical to the JDK-generated
    bytes, and cardinality() returns the Java-computed value — including
    Long.MAX_VALUE on the zeros==0 small-range branch."""
    assert len(golden["hll_blobs"]) == 22
    for blob in golden["hll_blobs"]:
        h = _build(blob["name"], blob["log2m"], golden)
        assert h.serialize().hex() == blob["hex"], blob["name"]
        assert h.cardinality() == blob["cardinality"], blob["name"]
    sat = next(
        b for b in golden["hll_blobs"] if b["name"] == "saturated_log2m4"
    )
    assert sat["cardinality"] == JAVA_LONG_MAX


def test_golden_blobs_deserialize_and_remerge(golden):
    """Persist -> deserialize -> re-merge parity on the JDK bytes: the
    union of per-type blobs re-serializes to the same bytes as the
    generator's own merge."""
    by_name = {
        (b["name"], b["log2m"]): bytes.fromhex(b["hex"])
        for b in golden["hll_blobs"]
    }
    for log2m in (8, 12, 16):
        merged = merge_hlls(
            [by_name[("ints_x500", log2m)], by_name[("strings_x350", log2m)]]
        )
        assert merged == by_name[("merged_ints_strings", log2m)]
        # round-trip: bytes -> object -> bytes
        rt = ClearspringHLL.deserialize(merged).serialize()
        assert rt == merged
