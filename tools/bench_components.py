"""Scale/convergence measurement for connected_components.

Graph: `n_nodes` nodes with `~1.2x` random edges (power-law-ish component
mix, the LSH near-dup-graph shape) PLUS one 1000-node chain (adversarial
diameter). Pointer jumping must close everything in O(log d) rounds —
each round is two shuffle joins, so round count IS the scale cost.

Usage: python tools/bench_components.py [n_nodes=1000000]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hurricanedb_spark.operators.dedup import connected_components
from hurricanedb_spark.session import get_spark


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("bench-cc")
    nodes = spark.range(n).selectExpr("id AS doc_id")
    # deterministic pseudo-random edges: xxhash64-derived endpoints biased
    # into 64-node neighborhoods -> many small components, some larger
    rand_edges = (
        spark.range(int(n * 1.2))
        .selectExpr(
            f"pmod(xxhash64(id), {n}) AS id_a",
            f"pmod(xxhash64(id) + pmod(xxhash64(id * 31), 64) + 1, {n}) AS id_b",
        )
        .filter("id_a <> id_b")
    )
    chain = spark.range(999).selectExpr("id AS id_a", "id + 1 AS id_b")
    edges = rand_edges.unionAll(chain)
    t0 = time.time()
    comp = connected_components(edges, "id_a", "id_b", nodes, "doc_id")
    n_comp = comp.select("component").distinct().count()
    wall = time.time() - t0
    # chain check: nodes 0..999 all label 0
    chain_ok = (
        comp.filter("doc_id < 1000").filter("component <> 0").count() == 0
    )
    print(
        f"n={n} edges~{int(n*1.2)}+chain | {wall:.1f}s | "
        f"{n_comp} components | 1000-chain collapsed: {chain_ok}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
