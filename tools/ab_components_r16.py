"""Interleaved A/B: connected_components round driven by ONE action
(lazy localCheckpoint materialized by the early-stop count — round-16)
vs the r15 two-actions-per-round form (eager checkpoint + count).

The B variant is reproduced exactly by forcing eager=True through a
localCheckpoint wrapper — the code path is otherwise identical.

Usage: python tools/ab_components_r16.py [n_nodes] [reps]
Emits min-of-reps wall + jobs-per-run for both variants, interleaved
A,B,A,B,... with steal jiffies bracketed per sample.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.classic.dataframe import DataFrame  # instances' real class

from hurricanedb_spark.operators.dedup import connected_components
from hurricanedb_spark.session import get_spark


def _steal():
    with open("/proc/stat") as f:
        p = f.readline().split()
    return int(p[8])


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab-components-r16")
    sc = spark.sparkContext

    def graph():
        nodes = spark.range(n).selectExpr("id AS doc_id")
        rand_edges = (
            spark.range(int(n * 1.2))
            .selectExpr(
                f"pmod(xxhash64(id), {n}) AS id_a",
                f"pmod(xxhash64(id) + pmod(xxhash64(id * 31), 64) + 1, {n}) AS id_b",
            )
            .filter("id_a <> id_b")
        )
        chain = spark.range(999).selectExpr("id AS id_a", "id + 1 AS id_b")
        return rand_edges.unionAll(chain), nodes

    orig_ckpt = DataFrame.localCheckpoint

    def run(variant: str, tag: str):
        if variant == "eager":
            DataFrame.localCheckpoint = lambda self, eager=True: orig_ckpt(self, True)
        try:
            edges, nodes = graph()
            s0 = _steal()
            sc.setJobGroup(tag, tag)
            t0 = time.perf_counter()
            comp = connected_components(edges, "id_a", "id_b", nodes, "doc_id")
            n_comp = comp.select("component").distinct().count()
            wall = time.perf_counter() - t0
            sc.setLocalProperty("spark.jobGroup.id", None)
            jobs = len(sc.statusTracker().getJobIdsForGroup(tag))
            return wall, jobs, n_comp, _steal() - s0
        finally:
            DataFrame.localCheckpoint = orig_ckpt

    results = {"lazy": [], "eager": []}
    ncomps = set()
    for r in range(reps):
        for variant in ("lazy", "eager"):
            wall, jobs, n_comp, steal = run(variant, f"{variant}-{r}")
            results[variant].append((wall, jobs, steal))
            ncomps.add(n_comp)
            print(
                f"{variant} rep{r}: {wall:.2f}s jobs={jobs} "
                f"components={n_comp} steal_jiffies={steal}",
                flush=True,
            )
    assert len(ncomps) == 1, ncomps  # identical results
    for variant, rows in results.items():
        best = min(w for w, _, _ in rows)
        jobs = rows[0][1]
        print(f"{variant}: min {best:.2f}s, jobs/run {jobs}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
