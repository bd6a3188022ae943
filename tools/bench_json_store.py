"""Measure the round-6 segment-store additions at bench scale.

1. JSON-index access path: events (sf0.1, 1M rows) exported to 16
   segments RANGE-PARTITIONED on the json value `$.k` with a `.json.idx`
   per segment, then one selective JSON_MATCH equality measured through
   (a) the full expression scan and (b) the index path
   (read_segments_json_match: segment skip + docId allowlist + exact
   residual). Correctness asserted (both counts equal) before timing.

2. Raw-MV + V4 decode throughput: documents text stored as raw V4
   var-byte chunks plus a synthetic int64 MV column stored raw,
   replicated to ~500k rows across 16 segments, one distributed decode
   + aggregate measured.

Usage: python tools/bench_json_store.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hurricanedb_spark.catalog.tables import load_table
from hurricanedb_spark.session import get_spark
from hurricanedb_spark.sources import pinot_segment as ps
from hurricanedb_spark.sources.json_index import read_segments_json_match
from hurricanedb_spark.sql.json_match import translate_json_match


def bench_json_index(spark, sf_dir: str, base: str) -> None:
    # SPARK_GRAFT_JSON_REPS=N replicates events N-fold (and scales the
    # segment count to keep ~62k rows/segment) to show the skip ratio is
    # the scaling lever while index lookups stay O(#segments)
    reps = int(os.environ.get("SPARK_GRAFT_JSON_REPS", "1"))
    n_segs = 16 * reps
    store = os.path.join(base, f"events_json_ranged_x{reps}")
    if not os.path.isdir(store):
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "event_type", "props"
        )
        if reps > 1:
            ev = ev.crossJoin(
                spark.range(reps).select(F.col("id").alias("__rep"))
            ).drop("__rep")
        keyed = ev.withColumn(
            "__k", F.expr("CAST(get_json_object(props, '$.k') AS INT)")
        )
        t0 = time.perf_counter()
        ps.export_segments(
            keyed.repartitionByRange(n_segs, "__k").drop("__k"),
            store,
            json_index_columns=["props"],
        )
        print(
            f"build: {n_segs} json-indexed segments "
            f"in {time.perf_counter()-t0:.1f}s"
        )
    segs = sorted(
        os.path.join(store, d)
        for d in os.listdir(store)
        if os.path.isdir(os.path.join(store, d))
    )
    cond = '"$.k" = \'37\''
    expr = F.expr(translate_json_match("props", cond))

    def timed(fn, label):
        fn()  # warm
        t0 = time.perf_counter()
        n = fn()
        dt = time.perf_counter() - t0
        print(f"{label}: {dt:.2f}s ({n} rows)")
        return n, dt

    n_scan, t_scan = timed(
        lambda: ps.read_segments(spark, segs).filter(expr).count(),
        f"expression scan (all {len(segs)} segments decode)",
    )
    accel = read_segments_json_match(spark, segs, "props", cond)
    n_idx, t_idx = timed(lambda: accel.count(), "json-index path")
    surviving = accel.rdd.getNumPartitions()
    assert n_scan == n_idx, (n_scan, n_idx)
    print(
        f"segments decoded: {len(segs)} -> {surviving}; "
        f"speedup {t_scan / t_idx:.1f}x"
    )


def bench_raw_mv_v4(spark, sf_dir: str, base: str) -> None:
    store = os.path.join(base, "docs_raw_v4")
    reps = 100
    if not os.path.isdir(store):
        doc = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "n_chars"
        )
        big = doc.crossJoin(
            spark.range(reps).select(F.col("id").alias("rep"))
        ).select(
            (F.col("doc_id") * reps + F.col("rep")).alias("doc_id"),
            "text",
            "n_chars",
            F.array(
                F.col("doc_id"), F.col("n_chars"), (F.col("doc_id") % 97)
            ).alias("mv"),
        )
        t0 = time.perf_counter()
        ps.export_segments(
            big.repartition(16), store,
            raw_columns={"text": "LZ4", "mv": "LZ4"},
            raw_writer_versions={"text": 4},
        )
        print(f"build: 16 raw-V4+MV segments in {time.perf_counter()-t0:.1f}s")
    segs = sorted(
        os.path.join(store, d)
        for d in os.listdir(store)
        if os.path.isdir(os.path.join(store, d))
    )
    size_mb = sum(
        os.path.getsize(os.path.join(r, f))
        for s in segs
        for r, _, fs in os.walk(s)
        for f in fs
    ) / 1e6
    df = ps.read_segments(spark, segs)
    df.count()  # warm
    t0 = time.perf_counter()
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("chars"),
        F.sum(F.element_at("mv", 2)).alias("mv2"),
    ).collect()[0]
    dt = time.perf_counter() - t0
    assert row["chars"] == row["mv2"]  # mv[1] == n_chars by construction
    print(
        f"raw-V4+MV decode: {row['n']} rows / {size_mb:.0f} MB on disk in "
        f"{dt:.2f}s = {row['n']/dt/1e6:.2f}M rows/s"
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    base = "/tmp/hurricanedb_segments/bench_r6"
    spark = get_spark("bench-json-store")
    bench_json_index(spark, sf_dir, base)
    bench_raw_mv_v4(spark, sf_dir, base)
    return 0


if __name__ == "__main__":
    sys.exit(main())
