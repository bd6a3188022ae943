"""Pinot QuantileDigest wire format — exact-regime writer + reader.

The reference's percentileRawEst returns the HEX-serialized
QuantileDigest so clients can persist and re-merge per-slice digests
(SerializedQuantileDigest.toString -> BytesUtils.toHexString;
PercentileRawEstAggregationFunction.java). The format is defined by the
VENDORED source pinot-segment-local/.../customobject/QuantileDigest.java:

  - value domain: signed 64-bit longs, stored as lexicographically
    sortable bits = value ^ (1 << 63)          (longToBits():886-888)
  - header (big-endian): maxError double | alpha double |
    landmarkInSeconds long | min long | max long | totalNodeCount int
                                                  (toBytes():329-343)
  - nodes in POST-ORDER (left, right, parent): flags byte (HAS_LEFT=1,
    HAS_RIGHT=2) | level byte | bits long | weightedCount double
                                           (serializeNode():346-360)
  - the reader reconstructs with a stack, popping RIGHT then LEFT
                                          (fromByteBuffer():382-400)
  - a node at level L covers bits [bits & ~mask, bits | mask] with
    mask = 2^L - 1; an internal node's branch bit is bit L-1
                             (Node.getUpper/LowerBound, getBranchMask)
  - quantile query: post-order FORWARD cumulative weight; the answer is
    min(node.getUpperBound(), max) at the first node where the running
    sum EXCEEDS q * totalWeight            (getQuantiles():185-223)

This writer emits the EXACT regime: one level-0 leaf per distinct value
carrying weight = count, plus zero-weight internal trie nodes whose
levels follow makeSiblings() (parent level = 64 - clz(bitsA ^ bitsB),
:569-571). Such a digest is what the reference builds before any
compression triggers; its quantiles are exact, and the reference's own
reader consumes this layout unchanged. Merging exact digests = summing
leaf weights per value and rebuilding the trie — the same result the
reference's merge()+compress() produces at zero error.

Scale note: the exact regime is O(distinct values) per group — the same
bound as the reference below its compression threshold. The SQL surface
builds per-group digests inside a grouped-agg (Arrow batch per group);
for unbounded-NDV columns use the bounded estimate forms
(percentileEst / percentileTDigest -> percentile_approx).
"""

from __future__ import annotations

import struct
from typing import Iterable, NamedTuple

DEFAULT_MAX_ERROR = 0.05  # PercentileEstAggregationFunction.java:36
_SIGN = 1 << 63
_MASK64 = (1 << 64) - 1
_HAS_LEFT = 1
_HAS_RIGHT = 2


def _long_to_bits(value: int) -> int:
    return (value ^ _SIGN) & _MASK64


def _bits_to_long(bits: int) -> int:
    v = (bits ^ _SIGN) & _MASK64
    return v - (1 << 64) if v >= _SIGN else v


class _Node(NamedTuple):
    bits: int
    level: int
    weight: float
    left: "._Node | None"
    right: "._Node | None"


def _build_trie(leaves: list[tuple[int, float]]) -> _Node:
    """leaves: (bits, weight) sorted ascending by bits (distinct). The
    recursive split mirrors makeSiblings(): the subtree's root level is
    the highest differing bit position + 1, children split on bit
    level-1."""
    if len(leaves) == 1:
        bits, w = leaves[0]
        return _Node(bits, 0, w, None, None)
    level = (leaves[0][0] ^ leaves[-1][0]).bit_length()
    branch = 1 << (level - 1)
    split = next(
        i for i, (b, _w) in enumerate(leaves) if b & branch
    )
    left = _build_trie(leaves[:split])
    right = _build_trie(leaves[split:])
    return _Node(leaves[0][0], level, 0.0, left, right)


def _post_order(node: _Node, out: list[_Node]) -> None:
    if node.left is not None:
        _post_order(node.left, out)
    if node.right is not None:
        _post_order(node.right, out)
    out.append(node)


def build_qdigest(
    values: Iterable[int], max_error: float = DEFAULT_MAX_ERROR
) -> bytes:
    """Serialize the exact QuantileDigest of integer `values` (None
    skipped) in the reference wire layout."""
    counts: dict[int, float] = {}
    for v in values:
        if v is None:
            continue
        v = int(v)
        counts[v] = counts.get(v, 0.0) + 1.0
    return build_qdigest_from_counts(counts, max_error)


def build_qdigest_from_counts(
    value_counts: dict[int, float], max_error: float = DEFAULT_MAX_ERROR
) -> bytes:
    """Serialize from a value -> count map (the partial-aggregation
    accumulator shape: operators/raw_partial sums per-partition counts
    and builds the trie once)."""
    counts: dict[int, float] = {}
    lo = hi = None
    for v, c in value_counts.items():
        v = int(v)
        counts[_long_to_bits(v)] = counts.get(_long_to_bits(v), 0.0) + c
        lo = v if lo is None or v < lo else lo
        hi = v if hi is None or v > hi else hi
    if not counts:
        # empty digest: header with no nodes (min/max at their reference
        # initial sentinels, QuantileDigest.java:78-80)
        return struct.pack(
            ">ddqqqi", max_error, 0.0, 0, (1 << 63) - 1, -(1 << 63), 0
        )
    leaves = sorted(counts.items())
    nodes: list[_Node] = []
    _post_order(_build_trie(leaves), nodes)
    out = [struct.pack(">ddqqqi", max_error, 0.0, 0, lo, hi, len(nodes))]
    for n in nodes:
        flags = (_HAS_LEFT if n.left is not None else 0) | (
            _HAS_RIGHT if n.right is not None else 0
        )
        out.append(
            struct.pack(
                ">BBqd", flags, n.level, _signed64(n.bits), n.weight
            )
        )
    return b"".join(out)


def _signed64(u: int) -> int:
    return u - (1 << 64) if u >= _SIGN else u


class QDigest(NamedTuple):
    max_error: float
    alpha: float
    min_value: int
    max_value: int
    root: "._Node | None"
    total_weight: float

    def quantile(self, q: float) -> int:
        """getQuantiles() semantics: post-order forward cumsum, answer =
        min(upperBound, max) at the first node with sum > q * total;
        falls back to max if the traversal completes."""
        if self.root is None:
            return self.max_value
        target = q * self.total_weight
        acc = 0.0
        stack: list[tuple[_Node, bool]] = [(self.root, False)]
        order: list[_Node] = []
        while stack:
            node, done = stack.pop()
            if done:
                order.append(node)
                continue
            stack.append((node, True))
            if node.right is not None:
                stack.append((node.right, False))
            if node.left is not None:
                stack.append((node.left, False))
        for node in order:
            acc += node.weight
            if acc > target:
                mask = (1 << node.level) - 1 if node.level else 0
                upper = _bits_to_long(node.bits | mask)
                return min(upper, self.max_value)
        return self.max_value


def deserialize_qdigest(data: bytes) -> QDigest:
    """Stack-based reconstruction, mirroring fromByteBuffer() (right
    child popped first)."""
    max_error, alpha, _landmark, lo, hi, n = struct.unpack_from(
        ">ddqqqi", data, 0
    )
    pos = struct.calcsize(">ddqqqi")
    if n == 0:
        return QDigest(max_error, alpha, lo, hi, None, 0.0)
    stack: list[_Node] = []
    total = 0.0
    for _ in range(n):
        flags, level, bits, weight = struct.unpack_from(">BBqd", data, pos)
        pos += struct.calcsize(">BBqd")
        right = stack.pop() if flags & _HAS_RIGHT else None
        left = stack.pop() if flags & _HAS_LEFT else None
        stack.append(_Node(bits & _MASK64, level, weight, left, right))
        total += weight
    if len(stack) != 1:
        raise ValueError("corrupt QuantileDigest: expected a single root")
    return QDigest(max_error, alpha, lo, hi, stack[0], total)


def merge_qdigests(digests: Iterable[bytes]) -> bytes:
    """Union of exact-regime digests: sum leaf weights per value and
    rebuild (what the reference's merge()+compress() yields at zero
    error)."""
    counts: dict[int, float] = {}
    lo = hi = None
    max_error = DEFAULT_MAX_ERROR
    for blob in digests:
        d = deserialize_qdigest(blob)
        max_error = d.max_error
        if d.root is None:
            continue
        lo = d.min_value if lo is None else min(lo, d.min_value)
        hi = d.max_value if hi is None else max(hi, d.max_value)
        stack = [d.root]
        while stack:
            node = stack.pop()
            if node.weight:
                counts[node.bits] = counts.get(node.bits, 0.0) + node.weight
            if node.left is not None:
                stack.append(node.left)
            if node.right is not None:
                stack.append(node.right)
    if not counts:
        return build_qdigest([], max_error)
    leaves = sorted(counts.items())
    nodes: list[_Node] = []
    _post_order(_build_trie(leaves), nodes)
    out = [
        struct.pack(">ddqqqi", max_error, 0.0, 0, lo, hi, len(nodes))
    ]
    for n2 in nodes:
        flags = (_HAS_LEFT if n2.left is not None else 0) | (
            _HAS_RIGHT if n2.right is not None else 0
        )
        out.append(
            struct.pack(">BBqd", flags, n2.level, _signed64(n2.bits), n2.weight)
        )
    return b"".join(out)
