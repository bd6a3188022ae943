"""Measure the bucketed co-located fact-fact join against plain shuffle.

Usage: python tools/bench_bucketed.py [SF_DIR] [N_BUCKETS]

Writes lineitem/orders from SF_DIR (default the sf10 scratch data) as
bucketed tables (sources.ingestion.write_bucketed_table — the
SegmentPartitionConfig/partitioned-replica-group analog), then times the
lineitem ⋈ orders revenue-per-orderdate aggregate three ways:

  plain     — parquet scans, broadcast disabled -> SortMergeJoin with
              BOTH sides exchanged (the naive 100 TB plan)
  bucketed  — bucketed tables, broadcast disabled -> co-located
              SortMergeJoin with ZERO join Exchange (storage pays the
              shuffle once at write time; every subsequent query skips it)
  adaptive  — parquet scans, session defaults (AQE free to broadcast)

Prints one JSON line; the zero-Exchange property is also asserted here
(and in tests/test_ingestion.py at test SF).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hurricanedb_spark.catalog.tables import load_table
from hurricanedb_spark.session import get_spark
from hurricanedb_spark.sources.ingestion import write_bucketed_table


def _join_agg(li, od):
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy(F.year("o_orderdate").alias("y"))
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("double")
                * (F.lit(1.0) - F.col("l_discount").cast("double"))
            ).alias("revenue")
        )
    )


def _time(df, runs: int = 3) -> float:
    df.count()
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        df.count()
        samples.append(time.perf_counter() - t0)
    samples.sort()
    return round(samples[len(samples) // 2], 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf10"
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark("bucketed-bench")

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")

    if not spark.catalog.tableExists("li_bkt_bench"):
        t0 = time.perf_counter()
        write_bucketed_table(li, "li_bkt_bench", "l_orderkey", n_buckets=n_buckets)
        write_bucketed_table(od, "ord_bkt_bench", "o_orderkey", n_buckets=n_buckets)
        build_s = round(time.perf_counter() - t0, 1)
    else:
        build_s = 0.0

    out: dict = {"sf_dir": sf_dir, "n_buckets": n_buckets,
                 "bucketed_build_sec": build_s}

    no_bcast = {"spark.sql.autoBroadcastJoinThreshold": "-1"}
    for k, v in no_bcast.items():
        prev = spark.conf.get(k)
        spark.conf.set(k, v)
    try:
        out["plain_smj_sec"] = _time(_join_agg(li, od))
        lib, odb = spark.table("li_bkt_bench"), spark.table("ord_bkt_bench")
        bdf = _join_agg(lib, odb)
        plan = bdf._sc._jvm.PythonSQLUtils.explainString(
            bdf._jdf.queryExecution(), "formatted"
        )
        join_part = plan.split("SortMergeJoin")[0]
        assert "Exchange" not in join_part.split("HashAggregate")[-1], plan
        out["bucketed_join_exchanges"] = plan.split("== Initial Plan ==")[0].count(
            "Exchange hashpartitioning(l_orderkey"
        ) + plan.split("== Initial Plan ==")[0].count(
            "Exchange hashpartitioning(o_orderkey"
        )
        out["bucketed_sec"] = _time(bdf)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    out["adaptive_sec"] = _time(_join_agg(li, od))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
