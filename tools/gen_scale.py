"""Scale-replicate the driver's star schema for large-SF benching.

Usage: python tools/gen_scale.py SRC_DIR DST_DIR MULTIPLIER

Replicates sf0.1 into an sf0.1*M-equivalent dataset by unioning M copies
with key domains shifted per replica, preserving join semantics exactly:
replica i's lineitem rows reference replica i's orders/customer/part/
supplier rows (orderkey/custkey/partkey/suppkey shifted by i*span), so
join fan-outs, group cardinalities and key distributions scale the way a
real TPC-H SF increase does. nation/region keep their fixed cardinality
(25/5 rows — they do not scale with SF).

documents/embeddings scale with STRUCTURE-PRESERVING mutations (round-10,
for the datapipe decade bench): verbatim replication would make every
document an M-way exact duplicate and every vector an M-way twin, so
LSH buckets and cosine matches would grow O(M^2) — measuring duplicate
density, not scale. Instead each replica i>0:
  - documents: every word gets an `r{i}` prefix — within-replica
    near-dup structure is preserved exactly (same transform on both
    sides of a pair keeps shingle overlap), while cross-replica shingle
    sets are disjoint (Jaccard 0);
  - embeddings: dimensions are permuted by a per-replica seeded
    permutation — cosine is invariant under a common permutation, so
    within-replica similarity is exact, while a permuted vector is
    near-orthogonal to its original (cross-replica matches vanish).
Duplicate/near-dup density per replica thus stays constant and wall-time
growth measures the operators' scaling shape.

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
COPIED = ["nation", "region"]


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

    # --- datapipe tables: structure-preserving replication (see module
    # docstring) ---
    import random

    (doc_span,) = con.execute(
        f"SELECT CAST(MAX(doc_id) + 1 AS BIGINT) "
        f"FROM read_parquet('{src}/documents.parquet')"
    ).fetchone()
    mutated = (
        "array_to_string(list_transform(string_split(text, ' '), "
        "w -> 'r' || CAST(r.i AS VARCHAR) || w), ' ')"
    )
    text_sql = f"CASE WHEN r.i = 0 THEN text ELSE {mutated} END"
    t0 = time.time()
    con.execute(
        f"COPY (SELECT doc_id + r.i * {doc_span} AS doc_id, "
        f"{text_sql} AS text, lang, source, "
        f"length({text_sql}) AS n_chars "
        f"FROM read_parquet('{src}/documents.parquet'), range({mult}) r(i)) "
        f"TO '{dst}/documents.parquet' (FORMAT parquet)"
    )
    print(f"documents: x{mult} word-prefixed [{time.time() - t0:.1f}s]",
          flush=True)

    (vec_span,) = con.execute(
        f"SELECT CAST(MAX(vec_id) + 1 AS BIGINT) "
        f"FROM read_parquet('{src}/embeddings.parquet')"
    ).fetchone()
    (dim,) = con.execute(
        f"SELECT len(embedding) FROM read_parquet('{src}/embeddings.parquet') "
        "LIMIT 1"
    ).fetchone()
    rng = random.Random(20261015)
    branches = ["WHEN 0 THEN embedding"]
    for i in range(1, mult):
        perm = list(range(1, dim + 1))  # list_select is 1-based
        rng.shuffle(perm)
        branches.append(f"WHEN {i} THEN list_select(embedding, {perm})")
    emb_sql = f"CASE r.i {' '.join(branches)} END"
    t0 = time.time()
    con.execute(
        f"COPY (SELECT vec_id + r.i * {vec_span} AS vec_id, "
        f"CAST({emb_sql} AS FLOAT[]) AS embedding, label "
        f"FROM read_parquet('{src}/embeddings.parquet'), range({mult}) r(i)) "
        f"TO '{dst}/embeddings.parquet' (FORMAT parquet)"
    )
    print(f"embeddings: x{mult} dim-permuted [{time.time() - t0:.1f}s]",
          flush=True)

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
