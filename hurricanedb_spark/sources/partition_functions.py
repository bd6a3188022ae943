"""Segment partition functions — bit-compatible with the reference.

The reference records per-column partition metadata in each segment
(V1Constants.MetadataKeys.Column: partitionFunction / numPartitions /
partitionValues) and prunes segments broker-side when an equality
predicate's partition cannot be present
(pinot-segment-spi/.../partition/*.java). These are the same four
functions, producing identical partition ids so metadata written here
prunes there and vice versa:

  - Modulo  (ModuloPartitionFunction.java:51-60): int/long value
    % numPartitions, negative results shifted up.
  - Murmur  (MurmurPartitionFunction.java:44-46, 80-113): kafka-style
    murmur2 over value.toString() UTF-8 bytes, `& Integer.MAX_VALUE
    % numPartitions`.
  - HashCode (HashCodePartitionFunction.java:38-41): Java
    String.hashCode of value.toString(), Math.abs (Integer.MIN_VALUE
    quirk preserved), % numPartitions.
  - ByteArray (ByteArrayPartitionFunction.java): java.util.Arrays
    .hashCode over the UTF-8 bytes, abs, % numPartitions.

Golden vectors come from the reference's own public test
(PartitionFunctionTest.java:229-253 murmur2 values under
java.util.Random(100).nextBytes), reproduced via a spec-faithful
java.util.Random implementation below.
"""

from __future__ import annotations

_I32_MASK = 0xFFFFFFFF
_INT_MIN = -(1 << 31)


def _i32(x: int) -> int:
    x &= _I32_MASK
    return x - (1 << 32) if x >= (1 << 31) else x


def murmur2_32(data: bytes) -> int:
    """kafka murmur2 (signed 32-bit), as copied into
    MurmurPartitionFunction.murmur2."""
    length = len(data)
    seed = 0x9747B28C
    m = 0x5BD1E995
    r = 24
    h = _i32(seed ^ length)
    for i in range(length // 4):
        i4 = i * 4
        k = (
            data[i4]
            + (data[i4 + 1] << 8)
            + (data[i4 + 2] << 16)
            + (data[i4 + 3] << 24)
        )
        k = _i32(k * m)
        k = _i32(k ^ ((k & _I32_MASK) >> r))
        k = _i32(k * m)
        h = _i32(h * m)
        h = _i32(h ^ k)
    tail = length & ~3
    rem = length % 4
    if rem == 3:
        h = _i32(h ^ ((data[tail + 2]) << 16))
    if rem >= 2:
        h = _i32(h ^ ((data[tail + 1]) << 8))
    if rem >= 1:
        h = _i32(h ^ data[tail])
        h = _i32(h * m)
    h = _i32(h ^ ((h & _I32_MASK) >> 13))
    h = _i32(h * m)
    h = _i32(h ^ ((h & _I32_MASK) >> 15))
    return h


def java_string_hashcode(s: str) -> int:
    """Java String.hashCode over UTF-16 code units."""
    h = 0
    units = s.encode("utf-16-be")
    for i in range(0, len(units), 2):
        h = _i32(31 * h + ((units[i] << 8) | units[i + 1]))
    return h


def java_bytes_hashcode(data: bytes) -> int:
    """java.util.Arrays.hashCode(byte[]) — bytes are SIGNED in Java."""
    h = 1
    for b in data:
        sb = b - 256 if b >= 128 else b
        h = _i32(31 * h + sb)
    return h


def _java_abs(x: int) -> int:
    # Java Math.abs(Integer.MIN_VALUE) == Integer.MIN_VALUE
    return x if x == _INT_MIN else abs(x)


def partition_of(value, function: str, num_partitions: int) -> int:
    """Partition id of a value under the named reference function."""
    fn = function.lower()
    if fn == "modulo":
        # Java % truncates toward zero; Python % floors — use math.fmod-
        # style truncation then shift negatives up (toNonNegative)
        v = int(value)
        p = v - (abs(v) // num_partitions) * num_partitions * (1 if v >= 0 else -1)
        p = int(p)
        return p if p >= 0 else p + num_partitions
    s = _to_java_string(value)
    if fn == "murmur":
        return (murmur2_32(s.encode("utf-8")) & 0x7FFFFFFF) % num_partitions
    if fn == "hashcode":
        return _java_abs(java_string_hashcode(s)) % num_partitions
    if fn == "bytearray":
        return _java_abs(java_bytes_hashcode(s.encode("utf-8"))) % num_partitions
    raise ValueError(f"unknown partition function {function!r}")


def _to_java_string(value) -> str:
    """value.toString() as Java would produce it for the sketchable
    types (ints plain; floats are NOT supported — Java float formatting
    differs from Python's)."""
    if isinstance(value, bool):
        raise TypeError("boolean partition values unsupported")
    if isinstance(value, float):
        raise TypeError(
            "float partition columns unsupported: Java Double.toString "
            "formatting is not reproducible portably"
        )
    if isinstance(value, int):
        return str(value)
    return str(value)


class JavaRandom:
    """java.util.Random (public LCG spec) — used only to reproduce the
    reference's golden partition-function test vectors."""

    def __init__(self, seed: int):
        self._seed = (seed ^ 0x5DEECE66D) & ((1 << 48) - 1)

    def _next(self, bits: int) -> int:
        self._seed = (self._seed * 0x5DEECE66D + 0xB) & ((1 << 48) - 1)
        return _i32(self._seed >> (48 - bits))

    def next_int(self) -> int:
        return self._next(32)

    def next_bytes(self, n: int) -> bytes:
        out = bytearray()
        while len(out) < n:
            rnd = self.next_int()
            for _ in range(min(n - len(out), 4)):
                out.append(rnd & 0xFF)
                rnd >>= 8
        return bytes(out)
