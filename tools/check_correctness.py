"""Local replica of the driver's correctness gate.

For every query in the registry: run the Spark DataFrame and the DuckDB
oracle at the given SF and compare them **the way the driver does** —
through pandas (`sdf.toPandas()` vs `con.execute(sql).df()`), not through
`fetchall()`. This matters: DuckDB materializes `SUM(integer)` as HUGEINT
which `.df()` turns into float64, so an oracle whose values are equal via
`fetchall()` (Python ints) can still hash-mismatch in the driver
(`2006.0` vs `2006`). Round-5 lesson: six driver rows went red that this
tool passed. The comparison below is therefore dtype-strict:

  * row count and sorted column names must match;
  * no output column may hold array/map/struct values (the driver's
    pandas canonicalizer cannot sort them: `unhashable type: 'list'`);
  * after sorting columns by name and rows by canonical string, every
    cell must canonicalize identically — and a float-typed cell on one
    side vs an int-typed cell on the other is a FAIL even when
    numerically equal, because the driver hashes the string forms.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hurricanedb_spark.catalog.tables import TABLE_NAMES
from hurricanedb_spark.queries import all_queries
from hurricanedb_spark.session import get_spark


def cell_canon(v) -> str:
    """Canonical string for one pandas cell, dtype-sensitive.

    float 2006.0 -> '2006.0', int 2006 -> '2006' — deliberately different,
    mirroring what a string/hash-based comparison in the driver sees.
    """
    if v is None:
        return "NULL"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return repr(f)
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if hasattr(v, "isoformat"):
        iso = v.isoformat()
        # datetime.date -> midnight timestamp: DuckDB .df() yields
        # datetime64 for DATE while Spark yields date objects; the driver
        # demonstrably treats these as equal (pd3_groupby_date was green
        # in CORRECTNESS_r05), so the local gate does too.
        if len(iso) == 10:
            iso += "T00:00:00"
        return iso
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def unhashable_cols(df: pd.DataFrame) -> list[str]:
    """Columns holding list/ndarray/dict cells — the driver errors on
    these. All rows are scanned: a column whose early rows are null but
    later rows hold arrays must still be flagged (gate results are a few
    thousand rows at most, so the full scan is cheap)."""
    bad = []
    for c in df.columns:
        if df[c].dtype == object and any(
            isinstance(x, (list, np.ndarray, dict, set, tuple)) for x in df[c]
        ):
            bad.append(c)
    return bad


def frame_canon(df: pd.DataFrame) -> list[str]:
    cols = sorted(df.columns)
    rows = [
        "|".join(cell_canon(r[c]) for c in cols)
        for r in df.to_dict("records")
    ]
    return sorted(rows)


def nat_to_none(df: pd.DataFrame) -> pd.DataFrame:
    # NaT / NaN in object columns canonicalize to 'NULL' consistently
    return df.where(pd.notna(df), None)


def _ulp_equal(a, b, n: int) -> bool:
    import math

    if cell_canon(a) == cell_canon(b):
        return True
    if not (
        isinstance(a, (float, np.floating))
        and isinstance(b, (float, np.floating))
    ):
        return False
    a, b = float(a), float(b)
    if math.isnan(a) or math.isnan(b):
        return False
    x = a
    for _ in range(n):
        x = math.nextafter(x, b)
    return x == b


def frames_ulp_equal(a: pd.DataFrame, b: pd.DataFrame, n: int) -> bool:
    """Order-insensitive compare allowing float cells to differ by up to
    `n` ULPs. ONLY for the sf>=1 scale self-audits (--ulp): a DOUBLE
    aggregate above ~2^53 at 6-decimal scale exceeds double's exact
    integer range, so Spark and DuckDB legitimately round the final
    conversion differently by 1 ULP (the sf1 q1 artifact, COVERAGE.md).
    The driver gate and the default invocation stay bit-strict."""
    cols = sorted(a.columns)
    a = nat_to_none(a)[cols]
    b = nat_to_none(b)[cols]
    try:
        a = a.sort_values(cols, kind="mergesort").reset_index(drop=True)
        b = b.sort_values(cols, kind="mergesort").reset_index(drop=True)
    except Exception:  # noqa: BLE001 — unsortable mix: fall back strict
        return False
    for c in cols:
        for va, vb in zip(a[c], b[c]):
            if not _ulp_equal(va, vb, n):
                return False
    return True


def compare_frames(spark_pd: pd.DataFrame, oracle_pd: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_pd) != len(oracle_pd):
        problems.append(f"rowcount spark={len(spark_pd)} oracle={len(oracle_pd)}")
    if sorted(spark_pd.columns) != sorted(oracle_pd.columns):
        problems.append(
            f"columns spark={sorted(spark_pd.columns)} oracle={sorted(oracle_pd.columns)}"
        )
        return problems
    bad_s = unhashable_cols(spark_pd)
    bad_o = unhashable_cols(oracle_pd)
    if bad_s or bad_o:
        problems.append(
            f"array/map cells (driver canonicalizer would error): "
            f"spark={bad_s} oracle={bad_o}"
        )
        return problems
    # dtype drift report (informational unless values differ, but a
    # float-vs-int pair WILL differ in canon form when values are integral)
    dtype_diffs = [
        f"{c}: spark={spark_pd[c].dtype} oracle={oracle_pd[c].dtype}"
        for c in sorted(spark_pd.columns)
        if str(spark_pd[c].dtype) != str(oracle_pd[c].dtype)
    ]
    if not problems:
        sc = frame_canon(nat_to_none(spark_pd))
        oc = frame_canon(nat_to_none(oracle_pd))
        if sc != oc:
            diffs = [(a, b) for a, b in zip(sc, oc) if a != b][:3]
            msg = f"values differ, first diffs: {diffs}"
            if dtype_diffs:
                msg += f" (dtype drift: {dtype_diffs})"
            problems.append(msg)
    return problems


def main() -> int:
    argv = list(sys.argv[1:])
    ulp = 0
    if "--ulp" in argv:
        i = argv.index("--ulp")
        ulp = int(argv[i + 1])
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    reg = all_queries()
    n_pass = n_fail = n_rowsonly = 0
    failures: list[str] = []
    for name, qd in sorted(reg.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = qd.fn(spark, sf_dir)
            spark_pd = sdf.toPandas()
        except Exception:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: spark error\n{traceback.format_exc()}")
            continue
        if qd.oracle is None:
            bad = unhashable_cols(spark_pd)
            if bad:
                # rows-only queries still go through the driver's pandas
                # canonicalizer for the row count — array cells are fatal
                n_fail += 1
                failures.append(name)
                print(f"FAIL  {name}: rows-only but array/map cells in {bad}")
            else:
                n_rowsonly += 1
                print(
                    f"rows  {name}: {len(spark_pd)} rows (no oracle) "
                    f"[{time.time()-t0:.1f}s]"
                )
            continue
        try:
            oracle_pd = con.execute(qd.oracle).df()
        except Exception as e:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue

        problems = compare_frames(spark_pd, oracle_pd)
        if problems and ulp and frames_ulp_equal(spark_pd, oracle_pd, ulp):
            n_pass += 1
            print(
                f"PASS~ {name}: {len(spark_pd)} rows (within {ulp} ulp) "
                f"[{time.time()-t0:.1f}s]"
            )
        elif problems:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            n_pass += 1
            print(f"PASS  {name}: {len(spark_pd)} rows [{time.time()-t0:.1f}s]")

    print(
        f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only "
        f"(of {len(reg)} registered) =="
    )
    if failures:
        print("failures:", " ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
