"""Data-driven SQL corpus runner.

Replicates the reference's level-3 test strategy (SURVEY.md §5): JSON files
declaring inline tables (schema + rows) and queries, executed against the
engine AND an oracle with results compared
(pinot-query-runtime/src/test/resources/queries/*.json — 26 files / ~718
queries; runner ResourceBasedQueriesTest.java:84-227). Same file format:

  {"<case>": {"tables": {"tbl": {"schema": [{"name","type"}...],
                                 "inputs": [[...], ...]}},
              "queries": [{"sql": "SELECT ... FROM {tbl}",
                           "description": "..."}, ...]}}

`{tbl}` placeholders resolve to per-case view names. Our oracle is DuckDB
(the reference uses H2). Comparison: row count + multiset of rows with
numeric tolerance (the reference's fuzzy compare,
ClusterIntegrationTestUtils H2 comparison).
"""

from __future__ import annotations

import json
import math
import os
import re
from dataclasses import dataclass, field

import duckdb
from pyspark.sql import SparkSession, types as T

_TYPE_MAP = {
    "INT": (T.IntegerType(), "INTEGER"),
    "LONG": (T.LongType(), "BIGINT"),
    "FLOAT": (T.FloatType(), "FLOAT"),
    "DOUBLE": (T.DoubleType(), "DOUBLE"),
    "STRING": (T.StringType(), "VARCHAR"),
    "BOOLEAN": (T.BooleanType(), "BOOLEAN"),
    "BIG_DECIMAL": (T.DecimalType(38, 18), "DECIMAL(38,18)"),
    "TIMESTAMP": (T.TimestampType(), "TIMESTAMP"),
    "BYTES": (T.BinaryType(), "BLOB"),
    "INT[]": (T.ArrayType(T.IntegerType()), "INTEGER[]"),
    "LONG[]": (T.ArrayType(T.LongType()), "BIGINT[]"),
    "DOUBLE[]": (T.ArrayType(T.DoubleType()), "DOUBLE[]"),
    "STRING[]": (T.ArrayType(T.StringType()), "VARCHAR[]"),
}


@dataclass
class CaseResult:
    case: str
    sql: str
    ok: bool
    detail: str = ""


def _norm(v, tol=1e-6):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return "0"
        # tolerance-normalized: round to relative precision
        return f"{v:.9g}"
    try:  # decimal
        import decimal

        if isinstance(v, decimal.Decimal):
            return f"{float(v):.9g}"
    except Exception:
        pass
    return str(v)


def _rowset(cols, rows):
    return sorted("|".join(_norm(r[i]) for i in range(len(cols))) for r in rows)


def run_corpus_file(spark: SparkSession, path: str) -> list[CaseResult]:
    with open(path) as f:
        cases = json.load(f)
    results: list[CaseResult] = []
    con = duckdb.connect()
    # file-scoped view prefix: lets run_corpus_dir execute files
    # concurrently (same case names exist across *_full.json variants)
    stem = re.sub(r"\W", "_", os.path.splitext(os.path.basename(path))[0])
    for case_name, case in cases.items():
        view_map: dict[str, str] = {}
        setup_err: str | None = None
        for tbl, spec in case.get("tables", {}).items():
            view = f"corpus_{stem}_{case_name}_{tbl}".replace("-", "_")
            view_map[tbl] = view
            fields = [
                T.StructField(c["name"], _TYPE_MAP[c["type"].upper()][0], True)
                for c in spec["schema"]
            ]
            schema = T.StructType(fields)

            def _coerce(val, dt):
                # JSON can't carry timestamps/bytes/decimals natively
                if val is None:
                    return None
                if isinstance(dt, T.TimestampType):
                    import datetime

                    if isinstance(val, (int, float)):  # epoch millis
                        return datetime.datetime.utcfromtimestamp(val / 1000.0)
                    return datetime.datetime.fromisoformat(val)
                if isinstance(dt, T.BinaryType) and isinstance(val, str):
                    return bytes.fromhex(val)
                if isinstance(dt, T.DecimalType):
                    import decimal

                    return decimal.Decimal(str(val))
                if isinstance(dt, (T.DoubleType, T.FloatType)):
                    return float(val)  # JSON ints / "inf"/"NaN" strings
                if isinstance(dt, (T.IntegerType, T.LongType)) and isinstance(
                    val, (str, float)
                ):
                    # reference inputs carry "1" / 0.001 in INT columns;
                    # Pinot's DataTypeTransformer truncates (Java (int)
                    # cast) — coerce identically for BOTH engines here
                    return int(float(val))
                return val

            rows = [
                tuple(_coerce(v, f.dataType) for v, f in zip(r, fields))
                for r in spec["inputs"]
                # reference inputs may contain ["------"] segment-separator
                # marker rows (per-segment splits); data rows match arity
                if len(r) == len(fields)
            ]
            # inline tables are tiny; one partition keeps derived cross
            # joins at 1 task instead of defaultParallelism². Partitioned
            # at parallelize time — a trailing .coalesce(1) hangs pyspark
            # 4.1 local mode intermittently (python worker crash).
            sdf = spark.createDataFrame(
                spark.sparkContext.parallelize(rows, 1), schema
            )
            sdf.createOrReplaceTempView(view)
            ddl_cols = ", ".join(
                f'"{c["name"]}" {_TYPE_MAP[c["type"].upper()][1]}'
                for c in spec["schema"]
            )
            try:
                con.execute(f'CREATE OR REPLACE TABLE {view} ({ddl_cols})')
                if rows:
                    ph = ", ".join("?" for _ in fields)
                    con.executemany(
                        f"INSERT INTO {view} VALUES ({ph})", [list(r) for r in rows]
                    )
            except Exception as e:  # noqa: BLE001 — e.g. inf into DECIMAL
                con = duckdb.connect()  # the failed insert poisons the cursor
                setup_err = f"oracle table setup failed: {e}"

        for q in case.get("queries", []):
            sql = q["sql"]
            if q.get("skip"):
                continue
            if setup_err:
                results.append(CaseResult(case_name, sql, False, setup_err))
                continue
            bound = re.sub(r"\{(\w+)\}", lambda m: view_map[m.group(1)], sql)
            # leading SET option=value; statements are engine no-ops
            # (reference query options — sql/dialect.py treats them the
            # same way); strip for both engines
            bound = re.sub(r"^\s*(SET\s+\w+\s*=\s*\w+\s*;\s*)+", "", bound, flags=re.I)
            results.append(_QUEUED(case_name, sql, bound))

    def run_one(item: CaseResult) -> CaseResult:
        case_name, sql, bound = item.case, item.sql, item.detail
        if os.environ.get("CORPUS_VERBOSE"):
            print(f"RUN [{case_name}] {sql}", flush=True)
        try:
            sdf = spark.sql(bound)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            ores = con.cursor().execute(bound)
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:  # noqa: BLE001
            return CaseResult(case_name, sql, False, f"error: {e}")
        if len(srows) != len(orows):
            return CaseResult(
                case_name, sql, False,
                f"rowcount spark={len(srows)} duckdb={len(orows)}",
            )
        if _rowset(scols, srows) != _rowset(ocols, orows):
            diff = [
                (a, b)
                for a, b in zip(_rowset(scols, srows), _rowset(ocols, orows))
                if a != b
            ][:2]
            return CaseResult(case_name, sql, False, f"values: {diff}")
        return CaseResult(case_name, sql, True)

    # queries of all this file's cases run concurrently (guide §2.6):
    # views are all registered above, each worker uses its own DuckDB
    # cursor, and result order stays the declaration order (pool.map)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=4) as pool:
        return list(
            pool.map(lambda r: run_one(r) if isinstance(r, _QUEUED) else r, results)
        )


class _QUEUED(CaseResult):
    """A query bound to its views but not yet executed (detail=bound SQL)."""

    def __init__(self, case: str, sql: str, bound: str):
        super().__init__(case, sql, False, bound)


def run_corpus_dir(spark: SparkSession, corpus_dir: str) -> list[CaseResult]:
    """Run every corpus file; files execute CONCURRENTLY (guide §2.6 —
    actions are only sequential because the driver calls them
    sequentially, and each ~0.3s collect leaves the cluster idle
    otherwise). Safe because each file is self-contained: its own DuckDB
    connection, file-scoped Spark view names, independent results.
    Ordering of the returned list is deterministic (by file name)."""
    from concurrent.futures import ThreadPoolExecutor

    names = [n for n in sorted(os.listdir(corpus_dir)) if n.endswith(".json")]
    with ThreadPoolExecutor(max_workers=8) as pool:
        chunks = list(
            pool.map(
                lambda n: run_corpus_file(spark, os.path.join(corpus_dir, n)),
                names,
            )
        )
    out: list[CaseResult] = []
    for chunk in chunks:
        out.extend(chunk)
    return out
