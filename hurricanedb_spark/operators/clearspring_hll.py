"""Clearspring (stream-lib) HyperLogLog — wire-compatible registers,
hashing, and serialization.

The reference's `distinctCountRawHLL[MV]` returns the SERIALIZED
com.clearspring.analytics.stream.cardinality.HyperLogLog
(CustomSerDeUtils.java:157-166 `HYPER_LOG_LOG_SER_DE.serialize` ->
`hyperLogLog.getBytes()`), wrapped in the lowercase-HEX STRING envelope
(SerializedHLL.toString -> BytesUtils.toHexString). Reference clients
persist these strings, deserialize them with
`HyperLogLog.Builder.build(bytes)` and RE-MERGE them (`addAll`), so the
raw form's contract is byte-level: the registers, the hash function AND
the value->bytes mapping must all match, or a re-merged union
double-counts every value.

Everything here matches the ACTUAL stream-2.9.8 jar bundled with this
container's pyspark — byte-compared in tests/test_reallib_golden.py
(com.clearspring.analytics:stream, Apache-2.0 — the reference depends
on it, pinot-core/pom.xml:159):

  - HyperLogLog.offer(Object) uses the 32-BIT MurmurHash.hash(Object)
    and offerHashed(int) — NOT hash64 (hash64 belongs to
    HyperLogLogPlus). Round-12 correction, caught by the real-jar
    capture: the earlier re-derivation offered 64-bit hashes of
    toString bytes, which put every register in the wrong place.
  - MurmurHash.hash(Object) type-dispatch: Long/Integer ->
    hashLong(value) (RAW BITS, not toString!), Double ->
    hashLong(doubleToRawLongBits) (raw: NaN payloads and -0.0 are
    distinct values), Float -> hashLong((long) floatToRawIntBits)
    (sign-extended), String -> hash(getBytes()) (MurmurHash2 32-bit,
    seed -1, Java signed-byte tail XORs).
  - hashLong: a two-block 32-bit MurmurHash2 over the long's halves,
    h seeded 0, no length mix (MurmurHash.hashLong verbatim).
  - HyperLogLog.offerHashed(int): bucket = top log2m hash bits; rank =
    Integer.numberOfLeadingZeros((h << log2m) | (1 << (log2m-1)) + 1)
    + 1 — the parenthesized-shift-plus-one mask (2^(log2m-1) + 1),
    part of the wire contract and reproduced verbatim (bytecode- and
    byte-verified against the real jar).
  - RegisterSet: 5-bit registers packed six per 32-bit word (low bits
    first; RegisterSet.java REGISTER_SIZE=5, LOG2_BITS_PER_WORD=6),
    size = count/6 words (+1 unless divisible by 32).
  - HyperLogLog.writeBytes: big-endian `int log2m, int size*4,
    int[size] words` (DataOutputStream).
  - cardinality(): alphaMM/sum(2^-reg) with linear counting below
    2.5*m (HyperLogLog.java cardinality; stream-lib applies no
    large-range correction).

Registers merge by elementwise max (HyperLogLog.addAll ->
RegisterSet merge), which commutes — so this digest is natively
partial-aggregable and plugs into operators/raw_partial two-phase
builds with byte-identical results.

With the (real) 32-bit offer path the rank is bounded by
32 - log2m + 1 <= 29 for log2m >= 4, so it always fits the 5-bit
register — the old 64-bit path's theoretical rank-32+ register
corruption is structurally unreachable and the clamp is gone.

`_java_double_str` / `_java_float_str` (Java shortest-decimal
rendering) remain for the hash64(Object) toString path — the entry
HyperLogLogPlus and generic-object offers use — and stay pinned by the
JDK goldens; since round-12 they no longer participate in this class's
offer path (numbers hash by RAW BITS through the 32-bit hashLong, as
the real jar does).
"""

from __future__ import annotations

import math
import struct
from collections.abc import Iterable

import numpy as np

_MASK64 = (1 << 64) - 1
_MURMUR_SEED = 0xE17A1465
_M64 = 0xC6A4A7935BD1E995
_R64 = 47

REGISTER_SIZE = 5
REGS_PER_WORD = 6  # stream-lib's (misnamed) LOG2_BITS_PER_WORD
JAVA_LONG_MAX = (1 << 63) - 1  # Math.round(Double.POSITIVE_INFINITY)


def _java_round(x: float) -> int:
    """Java Math.round(double): closest long, ties toward +infinity,
    saturating at the long bounds; NaN -> 0. Computed as an exact
    floor-and-compare instead of floor(x + 0.5) — the addition form
    rounds x in [0.49999999999999994, 0.5) up to 1, which Java fixed in
    JDK 7 (JDK-6430675); pinned by tests/fixtures/clearspring_jdk17_golden."""
    if math.isnan(x):
        return 0
    if x >= float(JAVA_LONG_MAX):
        return JAVA_LONG_MAX
    if x <= float(-(1 << 63)):
        return -(1 << 63)
    fl = math.floor(x)
    return fl + 1 if (x - fl) >= 0.5 else fl


def murmur64(data: bytes, seed: int = _MURMUR_SEED) -> int:
    """MurmurHash2-64A over `data` (stream-lib MurmurHash.hash64),
    returned as an unsigned 64-bit int."""
    length = len(data)
    h = (seed ^ ((length * _M64) & _MASK64)) & _MASK64
    n8 = length // 8
    for i in range(n8):
        k = int.from_bytes(data[i * 8 : i * 8 + 8], "little")
        k = (k * _M64) & _MASK64
        k ^= k >> _R64
        k = (k * _M64) & _MASK64
        h ^= k
        h = (h * _M64) & _MASK64
    tail = data[n8 * 8 :]
    if tail:
        k = int.from_bytes(tail, "little")
        h ^= k
        h = (h * _M64) & _MASK64
    h ^= h >> _R64
    h = (h * _M64) & _MASK64
    h ^= h >> _R64
    return h


_MASK32 = (1 << 32) - 1
_M32 = 0x5BD1E995
_R32 = 24


def murmur32(data: bytes, seed: int = -1) -> int:
    """stream-lib MurmurHash.hash(byte[], length, seed): MurmurHash2
    32-bit, default seed -1 (`hash(byte[])` passes -1), with Java's
    SIGNED-byte tail XORs. Returns the signed Java int as an unsigned
    32-bit value."""
    length = len(data)
    h = (seed ^ length) & _MASK32
    n4 = length // 4
    for i in range(n4):
        k = int.from_bytes(data[i * 4 : i * 4 + 4], "little")
        k = (k * _M32) & _MASK32
        k ^= k >> _R32
        k = (k * _M32) & _MASK32
        h = (h * _M32) & _MASK32
        h ^= k
    left = length - (n4 * 4)
    if left:
        # Java `h ^= data[i] << s` sign-extends the byte before shifting
        def sb(b: int) -> int:
            return b - 256 if b >= 128 else b
        if left >= 3:
            h ^= (sb(data[length - 3]) << 16) & _MASK32
        if left >= 2:
            h ^= (sb(data[length - 2]) << 8) & _MASK32
        if left >= 1:
            h ^= sb(data[length - 1]) & _MASK32
        h = (h * _M32) & _MASK32
    h ^= h >> 13
    h = (h * _M32) & _MASK32
    h ^= h >> 15
    return h


def murmur32_long(v: int) -> int:
    """stream-lib MurmurHash.hashLong(long): a two-block 32-bit
    MurmurHash2 over the long's low/high halves, h seeded 0, no length
    mix. `v` is the signed Java long (arbitrary Python int accepted)."""
    lo = v & _MASK32
    hi = (v >> 32) & _MASK32  # arithmetic shift sign-extends
    h = 0
    k = (lo * _M32) & _MASK32
    k ^= k >> _R32
    h ^= (k * _M32) & _MASK32
    k = (hi * _M32) & _MASK32
    k ^= k >> _R32
    h = (h * _M32) & _MASK32
    h ^= (k * _M32) & _MASK32
    h ^= h >> 13
    h = (h * _M32) & _MASK32
    h ^= h >> 15
    return h


def _digits_exp(s: str) -> tuple[str, int]:
    """Shortest-decimal string -> (digits, E) with value = d.igits*10^E."""
    mant, _, ex = s.partition("e")
    e = int(ex) if ex else 0
    ip, _, fp = mant.partition(".")
    alldigits = ip + fp
    stripped = alldigits.lstrip("0")
    if not stripped:
        return "0", 0
    lead_zeros = len(alldigits) - len(stripped)
    E = len(ip) - 1 - lead_zeros + e
    return stripped.rstrip("0") or "0", E


def _render_java(digits: str, E: int, neg: bool) -> str:
    """Java Float/Double.toString layout from shortest digits: plain
    notation iff 1e-3 <= |v| < 1e7 (i.e. -3 <= E <= 6), else
    `d.dddE<exp>` (no '+' on positive exponents)."""
    sign = "-" if neg else ""
    if -3 <= E <= 6:
        if E >= len(digits) - 1:
            return f"{sign}{digits}{'0' * (E - len(digits) + 1)}.0"
        if E >= 0:
            return f"{sign}{digits[: E + 1]}.{digits[E + 1 :]}"
        return f"{sign}0.{'0' * (-E - 1)}{digits}"
    frac = digits[1:] or "0"
    return f"{sign}{digits[0]}.{frac}E{E}"


def _java_double_str(v: float) -> str:
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "Infinity" if v > 0 else "-Infinity"
    if v == 0.0:
        return "-0.0" if math.copysign(1.0, v) < 0 else "0.0"
    digits, E = _digits_exp(repr(abs(v)))
    return _render_java(digits, E, v < 0)


def _java_float_str(v: float) -> str:
    """Java Float.toString: shortest decimal that round-trips FLOAT32."""
    f = np.float32(v)
    if np.isnan(f):
        return "NaN"
    if np.isinf(f):
        return "Infinity" if f > 0 else "-Infinity"
    if f == 0:
        return "-0.0" if np.signbit(f) else "0.0"
    digits, E = _digits_exp(str(np.abs(f)))
    return _render_java(digits, E, bool(np.signbit(f)))


def _words_for(count: int) -> int:
    words = count // REGS_PER_WORD
    if words == 0:
        return 1
    if words % 32 == 0:
        return words
    return words + 1


class ClearspringHLL:
    """stream-lib HyperLogLog: 2^log2m 5-bit registers."""

    __slots__ = ("log2m", "registers")

    def __init__(self, log2m: int, registers: np.ndarray | None = None):
        if not 4 <= log2m <= 30:
            raise ValueError(f"HLL log2m out of range: {log2m}")
        self.log2m = log2m
        self.registers = (
            registers
            if registers is not None
            else np.zeros(1 << log2m, dtype=np.uint8)
        )

    def offer_hashed(self, h: int) -> None:
        """offerHashed(int) — the entry HyperLogLog.offer(Object) uses
        (round-12: the real jar's offer path is 32-bit; offerHashed(long)
        exists in the library but nothing in the reference calls it).
        `h` is the 32-bit hash as unsigned."""
        h &= _MASK32
        j = h >> (32 - self.log2m)
        # (h << log2m) | (1 << (log2m - 1)) + 1 — the parenthesized
        # shift plus one: OR-mask = 2^(log2m-1) + 1 (bytecode-verified
        # against the real jar; bucket-0 rank caps at 25 for log2m=8)
        w = ((h << self.log2m) & _MASK32) | ((1 << (self.log2m - 1)) + 1)
        r = 33 - w.bit_length()  # Integer.numberOfLeadingZeros + 1
        if r > self.registers[j]:
            self.registers[j] = r

    def offer_bytes(self, data: bytes) -> None:
        """offer(byte[]) / offer(String): 32-bit MurmurHash over the
        bytes (strings hash their getBytes())."""
        self.offer_hashed(murmur32(data))

    def offer_long(self, v: int) -> None:
        """offer(Long/Integer): hashLong of the value; also the Double/
        Float path after the caller converts to raw bits (MurmurHash
        .hash(Object) dispatch)."""
        self.offer_hashed(murmur32_long(v))

    def merge(self, other: "ClearspringHLL") -> "ClearspringHLL":
        if other.log2m != self.log2m:
            raise ValueError(
                f"cannot merge HLLs of different sizes: log2m "
                f"{self.log2m} vs {other.log2m} (clearspring "
                "CardinalityMergeException)"
            )
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def cardinality(self) -> int:
        regs = self.registers.astype(np.float64)
        m = float(1 << self.log2m)
        register_sum = float(np.sum(np.exp2(-regs)))
        zeros = int(np.count_nonzero(self.registers == 0))
        if self.log2m == 4:
            alpha_mm = 0.673 * m * m
        elif self.log2m == 5:
            alpha_mm = 0.697 * m * m
        elif self.log2m == 6:
            alpha_mm = 0.709 * m * m
        else:
            alpha_mm = (0.7213 / (1 + 1.079 / m)) * m * m
        # Java Math.round: closest long, ties toward +infinity. NOT
        # floor(x + 0.5) — the double addition rounds up for
        # x in [0.49999999999999994, 0.5), a JDK-7 fix (JDK-6430675)
        # the JDK-17 golden fixtures pinned; _java_round is exact.
        estimate = alpha_mm / register_sum
        if estimate <= 2.5 * m:
            # stream-lib takes the linear-counting branch UNCONDITIONALLY
            # here: with zeros == 0, Java computes
            # Math.round(m * log(m / 0.0)) = Math.round(Infinity) =
            # Long.MAX_VALUE — reachable at small log2m (e.g. log2m=4
            # with ~2m distinct values). Estimate parity is the contract,
            # so the absurd-but-faithful value is reproduced verbatim.
            if zeros == 0:
                return JAVA_LONG_MAX
            return _java_round(m * math.log(m / zeros))
        return _java_round(estimate)

    def serialize(self) -> bytes:
        count = 1 << self.log2m
        n_words = _words_for(count)
        words = np.zeros(n_words, dtype=np.uint32)
        regs = self.registers.astype(np.uint32)
        for j in range(REGS_PER_WORD):
            chunk = regs[j::REGS_PER_WORD]
            words[: len(chunk)] |= chunk << np.uint32(REGISTER_SIZE * j)
        return struct.pack(">ii", self.log2m, n_words * 4) + words.astype(
            ">u4"
        ).tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "ClearspringHLL":
        log2m, nbytes = struct.unpack_from(">ii", data, 0)
        if not 4 <= log2m <= 30 or nbytes != len(data) - 8:
            raise ValueError("not a clearspring HyperLogLog byte stream")
        words = np.frombuffer(data, dtype=">u4", count=nbytes // 4, offset=8)
        count = 1 << log2m
        regs = np.zeros(count, dtype=np.uint8)
        for j in range(REGS_PER_WORD):
            idx = np.arange(j, count, REGS_PER_WORD)
            regs[idx] = (
                words[: len(idx)] >> np.uint32(REGISTER_SIZE * j)
            ) & np.uint32(0x1F)
        return cls(log2m, regs)


def is_clearspring_hll(data: bytes) -> bool:
    """Format sniff: clearspring starts with big-endian int log2m in
    [4,30] (first three bytes zero); DataSketches HLL preambles start
    with preInts 1/2 and family id 7 at byte 2 — unambiguous."""
    if len(data) < 8:
        return False
    log2m, nbytes = struct.unpack_from(">ii", data, 0)
    return 4 <= log2m <= 30 and nbytes == len(data) - 8


def _float_raw_bits(v: float) -> int:
    """Float.floatToRawIntBits sign-extended to long (the i2l in
    MurmurHash.hash(Object)'s Float branch)."""
    return struct.unpack("<i", struct.pack("<f", float(v)))[0]


def _double_raw_bits(v: float) -> int:
    """Double.doubleToRawLongBits — RAW: NaN payloads and -0.0 are
    distinct hash inputs (the real jar's Double branch)."""
    return struct.unpack("<q", struct.pack("<d", float(v)))[0]


_TO_HASH = {
    # MurmurHash.hash(Object) type dispatch (real stream-2.9.8, r12):
    # integers by VALUE through hashLong (int widens to long, so INT 5
    # and BIGINT 5 hash identically); floats/doubles by RAW BITS;
    # strings by getBytes() through the 32-bit byte hash
    "tinyint": lambda h, v: h.offer_long(int(v)),
    "smallint": lambda h, v: h.offer_long(int(v)),
    "int": lambda h, v: h.offer_long(int(v)),
    "integer": lambda h, v: h.offer_long(int(v)),
    "bigint": lambda h, v: h.offer_long(int(v)),
    "long": lambda h, v: h.offer_long(int(v)),
    "float": lambda h, v: h.offer_long(_float_raw_bits(v)),
    "double": lambda h, v: h.offer_long(_double_raw_bits(v)),
    "string": lambda h, v: h.offer_bytes(str(v).encode("utf-8")),
}


def offer_series(hll: ClearspringHLL, values, spark_type: str) -> None:
    """Offer a pandas Series of `spark_type` values into `hll` (NULLs
    skipped — the reference offers primitive arrays, never nulls)."""
    offer = _TO_HASH.get(spark_type.lower())
    if offer is None:
        raise ValueError(
            f"distinctCountRawHLL: unsupported column type {spark_type!r} "
            "(supported: int/long/float/double/string)"
        )
    for v in values:
        if v is None or (isinstance(v, float) and v != v):
            continue
        offer(hll, v)


def build_hll(values, spark_type: str, log2m: int) -> bytes:
    """Serialized clearspring HLL of a pandas Series of `spark_type`
    values."""
    hll = ClearspringHLL(log2m)
    offer_series(hll, values, spark_type)
    return hll.serialize()


def merge_hlls(blobs: Iterable[bytes]) -> bytes | None:
    """Union serialized clearspring HLLs (register max, like addAll).
    Returns None (SQL NULL) when no non-null blobs exist — a group whose
    BYTES column is all NULL aggregates to NULL, like the hll_union_agg
    path clearspringhllunion replaced (would otherwise fail the whole
    query on one all-NULL group)."""
    acc: ClearspringHLL | None = None
    for b in blobs:
        if b is None:
            continue
        h = ClearspringHLL.deserialize(bytes(b))
        acc = h if acc is None else acc.merge(h)
    return None if acc is None else acc.serialize()
