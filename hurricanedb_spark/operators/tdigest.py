"""t-digest (MergingDigest) wire format — writer + reader.

The reference's percentileRawTDigest returns the HEX-serialized
com.tdunning MergingDigest (SerializedTDigest.toString ->
BytesUtils.toHexString; CustomSerDeUtils.TDIGEST_SER_DE serializes via
TDigest.asBytes and deserializes via MergingDigest.fromBytes;
PercentileRawTDigestAggregationFunction, default compression 100).

The byte layout follows the PUBLIC tdunning/t-digest project
(MergingDigest.asBytes, VERBOSE encoding), all big-endian:

  int   encoding = 1 (VERBOSE)
  double min
  double max
  double compression
  int    n (centroid count)
  n x { double weight, double mean }     -- 32 + 16n bytes total

The t-digest lib is absent in this container, so cross-library byte
compatibility is exercised behind an importorskip seam
(tests/test_percentile_raw.py) like the protobuf/thrift decoders;
round-trip and accuracy are tested lib-free.

The builder runs the classic one-pass merge with the k1 (arcsine) scale
function: a centroid may absorb the next point while
k(q_right) - k(q_left) <= 1, which bounds centroid count by ~2C and
gives the t-digest's signature tight tails. Centroids are a valid
t-digest for ANY reader regardless of the exact scale function the
builder used — accuracy (not byte equality) is the contract, asserted
against exact quantiles in tests.
"""

from __future__ import annotations

import math
import struct
from typing import Iterable, NamedTuple

DEFAULT_COMPRESSION = 100.0  # PercentileTDigestAggregationFunction.java:39
_VERBOSE_ENCODING = 1


def _q_to_k(q: float, compression: float) -> float:
    q = min(1.0, max(0.0, q))
    return compression * (math.asin(2.0 * q - 1.0) / (2.0 * math.pi) + 0.25)


def _merge_points(
    points: list[tuple[float, float]], compression: float
) -> list[tuple[float, float]]:
    """One merge pass over (mean, weight) points sorted by mean; returns
    merged centroids honoring the k1 size bound."""
    total = sum(w for _m, w in points)
    out: list[tuple[float, float]] = []
    cum = 0.0
    cur_sum = points[0][0] * points[0][1]
    cur_w = points[0][1]
    k_lo = _q_to_k(0.0, compression)
    for mean, w in points[1:]:
        q_new = (cum + cur_w + w) / total
        if _q_to_k(q_new, compression) - k_lo <= 1.0:
            cur_sum += mean * w
            cur_w += w
        else:
            out.append((cur_sum / cur_w, cur_w))
            cum += cur_w
            k_lo = _q_to_k(cum / total, compression)
            cur_sum = mean * w
            cur_w = w
    out.append((cur_sum / cur_w, cur_w))
    return out


def build_tdigest(
    values: Iterable[float], compression: float = DEFAULT_COMPRESSION
) -> bytes:
    vals = sorted(float(v) for v in values if v is not None)
    if not vals:
        return struct.pack(
            ">iddd i".replace(" ", ""),
            _VERBOSE_ENCODING,
            math.inf,
            -math.inf,
            compression,
            0,
        )
    centroids = _merge_points([(v, 1.0) for v in vals], compression)
    return serialize_centroids(vals[0], vals[-1], compression, centroids)


def serialize_centroids(
    lo: float,
    hi: float,
    compression: float,
    centroids: list[tuple[float, float]],
) -> bytes:
    """VERBOSE-layout bytes from already-merged (mean, weight) centroids
    (the partial-aggregation accumulator shape)."""
    if not centroids:
        return build_tdigest([], compression)
    out = [
        struct.pack(
            ">idddi", _VERBOSE_ENCODING, lo, hi, compression, len(centroids)
        )
    ]
    for mean, w in centroids:
        out.append(struct.pack(">dd", w, mean))
    return b"".join(out)


class TDigest(NamedTuple):
    min_value: float
    max_value: float
    compression: float
    centroids: tuple[tuple[float, float], ...]  # (mean, weight), sorted

    @property
    def total_weight(self) -> float:
        return sum(w for _m, w in self.centroids)

    def quantile(self, q: float) -> float:
        """Standard t-digest interpolation: centroid masses centered at
        their cumulative midpoints, linear between midpoints, clamped to
        [min, max]."""
        cs = self.centroids
        if not cs:
            return float("nan")
        total = self.total_weight
        target = q * total
        if target <= cs[0][1] / 2.0:
            return self.min_value
        cum = 0.0
        prev_mid, prev_mean = None, None
        for mean, w in cs:
            mid = cum + w / 2.0
            if target < mid:
                if prev_mid is None:
                    return self.min_value
                frac = (target - prev_mid) / (mid - prev_mid)
                return prev_mean + frac * (mean - prev_mean)
            prev_mid, prev_mean = mid, mean
            cum += w
        return self.max_value


def deserialize_tdigest(data: bytes) -> TDigest:
    encoding, lo, hi, compression, n = struct.unpack_from(">idddi", data, 0)
    if encoding != _VERBOSE_ENCODING:
        raise ValueError(
            f"unsupported t-digest encoding {encoding} (VERBOSE only)"
        )
    pos = struct.calcsize(">idddi")
    cents = []
    for _ in range(n):
        w, mean = struct.unpack_from(">dd", data, pos)
        pos += 16
        cents.append((mean, w))
    return TDigest(lo, hi, compression, tuple(cents))


def merge_tdigests(digests: Iterable[bytes]) -> bytes:
    """Merge serialized digests: pool centroids as weighted points and
    re-run the merge pass (the t-digest merge algorithm)."""
    points: list[tuple[float, float]] = []
    lo, hi, compression = math.inf, -math.inf, DEFAULT_COMPRESSION
    for blob in digests:
        d = deserialize_tdigest(blob)
        compression = d.compression
        if d.centroids:
            lo = min(lo, d.min_value)
            hi = max(hi, d.max_value)
            points.extend(d.centroids)
    if not points:
        return build_tdigest([], compression)
    points.sort()
    centroids = _merge_points(points, compression)
    out = [
        struct.pack(
            ">idddi", _VERBOSE_ENCODING, lo, hi, compression, len(centroids)
        )
    ]
    for mean, w in centroids:
        out.append(struct.pack(">dd", w, mean))
    return b"".join(out)
