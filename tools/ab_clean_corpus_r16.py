"""Interleaved same-session A/B for q_dedup_clean_corpus's survivors
join (round-16, r15 verdict #6): OLD inner shuffle join of the full
(doc_id, component) table vs NEW budget-guarded broadcast semi join of
the survivor id set. Both variants consume the SAME components result
(built once per rep through the unchanged pipeline), so the measured
delta is the join step alone.

Usage: python tools/ab_clean_corpus_r16.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hurricanedb_spark.catalog.tables import load_table
from hurricanedb_spark.operators import dedup as dd
from hurricanedb_spark.queries.datapipe import q_minhash_lsh_dedup
from hurricanedb_spark.session import get_spark


def _steal():
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("ab-clean-corpus-r16")
    doc = load_table(spark, sf_dir, "documents")

    def agg(joined):
        return joined.groupBy("lang").agg(
            F.count(F.lit(1)).alias("kept_docs"),
            F.sum("n_chars").alias("kept_chars"),
        )

    results = {"old_shuffle_inner": [], "new_broadcast_semi": []}
    canon = set()
    for r in range(reps):
        comp = dd.connected_components(
            q_minhash_lsh_dedup(spark, sf_dir), "id_a", "id_b", doc, "doc_id"
        )
        old_surv = comp.filter(F.col("doc_id") == F.col("component"))
        new_surv = F.broadcast(old_surv.select("doc_id"))
        variants = {
            "old_shuffle_inner": agg(doc.join(old_surv, "doc_id")),
            "new_broadcast_semi": agg(doc.join(new_surv, "doc_id", "semi")),
        }
        for name, df in variants.items():
            df.count()  # warm this rep's plan
            s0, t0 = _steal(), time.perf_counter()
            rows = {tuple(x) for x in df.collect()}
            wall = time.perf_counter() - t0
            canon.add(frozenset(rows))
            results[name].append((wall, _steal() - s0))
            print(f"{name} rep{r}: {wall:.3f}s steal={results[name][-1][1]}", flush=True)
    assert len(canon) == 1, "variants disagree"
    for name, rows in results.items():
        print(f"{name}: min {min(w for w, _ in rows):.3f}s over {reps} reps")
    return 0


if __name__ == "__main__":
    sys.exit(main())
