"""Interleaved A/B for the round-16 edge-subgraph components change.

Variant A (r15 shape): label table = ALL nodes, survivors-semi cleanup.
Variant B (r16 shape): label table = edge-involved nodes only, singleton
union (components) / loser anti-join (clean_corpus) — the shipped code.

Both variants consume the SAME materialized pair table per rep (the
pair derivation is round-15-optimized and unchanged this round; this
harness isolates the iteration + cleanup). Asserts bit-identical
outputs, prints min-of-N with per-sample /proc/stat steal.

Usage: python tools/ab_components_subgraph_r16.py [sf_dir] [reps]
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


def _steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def components_a(edges, nodes):
    """r15 shape: every node iterates."""
    und = edges.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    und = und.union(und.select(F.col("b").alias("a"), F.col("a").alias("b"))).cache()
    labels = nodes.select(
        F.col("doc_id").alias("a"), F.col("doc_id").alias("label")
    ).localCheckpoint()
    for _ in range(25):
        nbr = (
            und.join(labels.select(F.col("a").alias("b"), F.col("label").alias("nl")), "b")
            .groupBy("a")
            .agg(F.min("nl").alias("nbr_label"))
        )
        hop = labels.join(nbr, "a", "left").select(
            "a",
            F.col("label").alias("__old"),
            F.least("label", F.coalesce("nbr_label", "label")).alias("label"),
        )
        new_labels = (
            hop.join(hop.select(F.col("a").alias("label"), F.col("label").alias("ll")), "label", "left")
            .select("a", "__old", F.least("label", F.coalesce("ll", "label")).alias("label"))
            .localCheckpoint(eager=False)
        )
        changed = new_labels.filter(F.col("label") != F.col("__old")).count()
        labels = new_labels.select("a", "label")
        if changed == 0:
            break
    und.unpersist()
    return labels.select(F.col("a").alias("doc_id"), F.col("label").alias("component"))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab-components-subgraph")
    sc = spark.sparkContext
    doc = load_table(spark, sf_dir, "documents")

    results = {"A_comp": [], "B_comp": [], "A_clean": [], "B_clean": []}
    jobs = {}
    st = sc.statusTracker()

    for rep in range(reps):
        # one materialized pair table per rep, consumed by both variants
        pairs = q_minhash_lsh_dedup(spark, sf_dir).localCheckpoint()

        def timed(tag, fn):
            s0, t0 = _steal(), time.time()
            sc.setJobGroup(f"{tag}-{rep}", tag)
            out = fn()
            rows = out.orderBy("doc_id").collect() if "comp" in tag else sorted(
                out.collect(), key=lambda r: (r[0] or "")
            )
            dt, ds = time.time() - t0, _steal() - s0
            results[tag].append(dt)
            jobs[tag] = len(st.getJobIdsForGroup(f"{tag}-{rep}") or [])
            print(f"  rep{rep} {tag}: {dt:.3f}s steal={ds} jobs={jobs[tag]}")
            return rows

        def clean_a():
            comp = components_a(pairs, doc)
            surv = comp.filter(F.col("doc_id") == F.col("component")).select("doc_id")
            return doc.join(F.broadcast(surv), "doc_id", "semi").groupBy("lang").agg(
                F.count(F.lit(1)).alias("kept_docs"), F.sum("n_chars").alias("kept_chars")
            )

        def clean_b():
            comp = dd.connected_components(
                pairs, "id_a", "id_b", doc, "doc_id", include_singletons=False
            )
            losers = comp.filter(F.col("doc_id") != F.col("component")).select("doc_id")
            return doc.join(F.broadcast(losers), "doc_id", "anti").groupBy("lang").agg(
                F.count(F.lit(1)).alias("kept_docs"), F.sum("n_chars").alias("kept_chars")
            )

        order = [
            ("A_comp", lambda: components_a(pairs, doc)),
            ("B_comp", lambda: dd.connected_components(pairs, "id_a", "id_b", doc, "doc_id")),
            ("A_clean", clean_a),
            ("B_clean", clean_b),
        ]
        if rep % 2:
            order = [order[1], order[0], order[3], order[2]]
        got = {}
        for tag, fn in order:
            got[tag] = timed(tag, fn)
        assert got["A_comp"] == got["B_comp"], "components outputs differ!"
        assert got["A_clean"] == got["B_clean"], "clean_corpus outputs differ!"

    for tag in ("A_comp", "B_comp", "A_clean", "B_clean"):
        print(f"{tag}: min={min(results[tag]):.3f}s all={[round(x,3) for x in results[tag]]} jobs={jobs[tag]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
