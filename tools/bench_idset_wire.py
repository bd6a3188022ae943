"""Micro-bench for the Roaring64 IdSet wire paths (round-14).

Hashed/random long ids are the worst case for the legacy layout (~1 id
per high-32 bucket, ~22 wire bytes/id); this measures encode / decode /
8-way merge over a 400k-id exact set (8.8MB — just past the default
8MB threshold, so real deployments of this shape sit at the exact/bloom
boundary). Prints one JSON line like the other bench tools.

Reproduces the round-14 speedups (same host, min of 3):
  encode 10.9s -> ~0.13s, decode 127s -> ~0.4s, merge ~20s -> ~0.5s.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hurricanedb_spark.operators.idset_wire import (
    decode_idset,
    encode_idset,
    merge_idset_blobs_many,
)


def main() -> None:
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 1 << 62, 400_000)
    th = 1 << 31  # force the exact form (the vectorized surface)
    results: dict[str, float] = {}

    def best(name: str, fn, runs: int = 3) -> None:
        times = []
        for _ in range(runs):
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
        results[name] = round(min(times), 4)

    blob = encode_idset(ids, "LONG", size_threshold_in_bytes=th)
    best("encode_400k", lambda: encode_idset(
        ids, "LONG", size_threshold_in_bytes=th))
    best("decode_400k", lambda: decode_idset(blob).values())
    parts = [
        encode_idset(ids[i::8], "LONG", size_threshold_in_bytes=th)
        for i in range(8)
    ]
    best("merge_8way", lambda: merge_idset_blobs_many(parts, th))
    assert merge_idset_blobs_many(parts, th) == blob
    got = np.sort(decode_idset(blob).values())
    assert np.array_equal(got, np.unique(ids.astype(np.uint64)))
    print(json.dumps({
        "metric": "idset_wire_bench",
        "value": round(sum(results.values()), 4),
        "unit": "sec",
        "queries": results,
        "ids": len(ids),
        "wire_bytes": len(blob),
    }))


if __name__ == "__main__":
    main()
