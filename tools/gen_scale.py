"""Scale-replicate the driver's star schema for large-SF benching.

Usage: python tools/gen_scale.py SRC_DIR DST_DIR MULTIPLIER

Replicates sf0.1 into an sf0.1*M-equivalent dataset by unioning M copies
with key domains shifted per replica, preserving join semantics exactly:
replica i's lineitem rows reference replica i's orders/customer/part/
supplier rows (orderkey/custkey/partkey/suppkey shifted by i*span), so
join fan-outs, group cardinalities and key distributions scale the way a
real TPC-H SF increase does. nation/region keep their fixed cardinality
(25/5 rows — they do not scale with SF); documents/embeddings are copied
verbatim (not part of the star-join bench).

This exists to measure the NON-BROADCAST regime locally: at M=100,
customer (~31 MB) and part (~18 MB) exceed the 10 MB default
autoBroadcastJoinThreshold, so the SSB star joins exercise the plan
shapes a 1000-executor / 100 TB cluster would run, while sf0.1 keeps the
everything-broadcasts regime. Output is scratch data (gitignored), not a
replacement for the driver's correctness inputs.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

import duckdb

# key column -> table whose rows define the key's domain span
KEY_DOMAINS = {
    "orderkey": "orders",
    "custkey": "customer",
    "partkey": "part",
    "suppkey": "supplier",
    "event_id": "events",
    "user_id": "events",
}

REPLICATED = ["lineitem", "orders", "customer", "part", "supplier", "events"]
COPIED = ["nation", "region", "documents", "embeddings"]


def _key_domain(col: str) -> str | None:
    """events keys match exactly; TPC-H keys by suffix (l_orderkey,
    o_orderkey, ... share one domain)."""
    if col in KEY_DOMAINS:
        return col
    for dom in ("orderkey", "custkey", "partkey", "suppkey"):
        if col.endswith("_" + dom):
            return dom
    return None


def generate(src: str, dst: str, mult: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    spans: dict[str, int] = {}
    for dom, table in KEY_DOMAINS.items():
        col = dom if table == "events" else None
        if col is None:
            prefix = {"orders": "o", "customer": "c", "part": "p",
                      "supplier": "s"}[table]
            col = f"{prefix}_{dom}"
        (span,) = con.execute(
            f"SELECT CAST(MAX({col}) + 1 AS BIGINT) "
            f"FROM read_parquet('{src}/{table}.parquet')"
        ).fetchone()
        spans[dom] = int(span)

    for name in COPIED:
        s, d = f"{src}/{name}.parquet", f"{dst}/{name}.parquet"
        if os.path.exists(s):
            shutil.copyfile(s, d)

    for name in REPLICATED:
        path = f"{src}/{name}.parquet"
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{path}')"
            ).fetchall()
        ]
        sel = []
        for c in cols:
            dom = _key_domain(c)
            if dom:
                sel.append(f"{c} + r.i * {spans[dom]} AS {c}")
            else:
                sel.append(c)
        t0 = time.time()
        con.execute(
            f"COPY (SELECT {', '.join(sel)} "
            f"FROM read_parquet('{path}'), range({mult}) r(i)) "
            f"TO '{dst}/{name}.parquet' (FORMAT parquet)"
        )
        (n,) = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{dst}/{name}.parquet')"
        ).fetchone()
        print(f"{name}: {n} rows [{time.time() - t0:.1f}s]", flush=True)


if __name__ == "__main__":
    src, dst, mult = sys.argv[1], sys.argv[2], int(sys.argv[3])
    generate(src, dst, mult)
