"""Before/after for the round-10 two-phase raw digest builders.

Times percentileRawEst over an N-row SINGLE-KEY hot group (the shape
that breaks single-phase builders) two ways:

  single-phase  the grouped-agg (Arrow) UDF the dialect used through
                round 9 (and still uses for non-restructurable shapes):
                Spark ships the group's entire raw value set through one
                Arrow stream to ONE Python worker before the bounded
                digest is built — O(rows/group) intermediate;
  two-phase     the round-10 restructure (mapInArrow partials + merged
                blobs): every partition builds bounded digests where the
                data sits; the only shuffle carries digest blobs.

Prints one JSON line. Results are also correctness-checked against each
other (qdigest is deterministic: byte-identical digests).

Usage: python tools/bench_raw_digest.py [n_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hurricanedb_spark.session import get_spark
from hurricanedb_spark.sql.dialect import HurricaneSQL


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark("raw-digest-bench")
    hdb = HurricaneSQL(spark)
    hdb.register(
        "rb_hot",
        spark.range(n).select(
            F.lit("hot").alias("g"),
            (F.col("id") % 10_000).cast("long").alias("v"),
        ),
    )
    single_sql = (
        "SELECT g, lower(hex(rawqdigest(CAST(v AS BIGINT)))) AS qd "
        "FROM rb_hot GROUP BY g"
    )
    two_sql = "SELECT g, percentileRawEst(v, 50) AS qd FROM rb_hot GROUP BY g"

    def run(fn):
        fn().collect()  # warm-up
        best = float("inf")
        out = None
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn().collect()
            best = min(best, time.perf_counter() - t0)
        return best, out[0]["qd"]

    t_two, qd_two = run(lambda: hdb.sql(two_sql, default_limit=None))
    t_single, qd_single = run(lambda: spark.sql(single_sql))
    assert qd_two == qd_single, "two-phase digest must be byte-identical"
    print(
        json.dumps(
            {
                "metric": "raw_digest_hot_group",
                "rows": n,
                "single_phase_sec": round(t_single, 3),
                "two_phase_sec": round(t_two, 3),
                "speedup": round(t_single / t_two, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
