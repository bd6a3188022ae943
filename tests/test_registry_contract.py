"""Registry-wide output-contract tests — the driver-harness compatibility gate.

Round-5 lesson: the driver compares Spark `toPandas()` against DuckDB
`.df()` and its pandas canonicalizer (a) cannot sort array/map cells
(`TypeError: unhashable type: 'list'`) and (b) hashes DuckDB's
`SUM(integer)` HUGEINT as float64 (`2006.0`) against Spark's int64
(`2006`). Eight driver rows went red on exactly these two shapes while
every value was equal. These tests make both shapes impossible to
reintroduce for ANY registered query:

  1. no registered Spark query may output an array/map/struct column;
  2. no oracle may produce a HUGEINT / LIST / STRUCT column (checked
     statically via DuckDB `DESCRIBE`, so it covers queries outside the
     driver's 50-query window too);
  3. Spark and oracle column-name sets must match exactly.

Value-level comparison lives in tools/check_correctness.py (also pandas
dtype-strict since round 6).
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import types as T

from hurricanedb_spark.catalog.tables import TABLE_NAMES
from hurricanedb_spark.queries import DRIVER_WINDOW, all_queries

from tests.conftest import SF_DIR

# Queries whose fn() runs a live stream or builds heavyweight side state:
# schema is still checked, but we keep this list explicit so a future
# expensive query is added deliberately, not by accident.
_COMPLEX = (T.ArrayType, T.MapType, T.StructType)


@pytest.fixture(scope="module")
def registry():
    return all_queries()


@pytest.fixture(scope="module")
def built(spark, registry):
    """Every registered query CONSTRUCTED once per module (round-16):
    fn() is not free — segment-backed and iterative queries run real
    jobs at construction — and two contract tests were each rebuilding
    all ~148 of them."""
    return {name: qd.fn(spark, SF_DIR) for name, qd in registry.items()}


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    yield con
    con.close()


def test_driver_window_is_50_registered(registry):
    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50
    for name in DRIVER_WINDOW:
        assert name in registry


def test_no_complex_output_columns(spark, registry, built):
    """The driver's pandas canonicalizer cannot handle array/map/struct."""
    offenders: dict[str, list[str]] = {}
    for name, qd in registry.items():
        df = built[name]
        bad = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, _COMPLEX)
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"registered queries output array/map/struct columns the driver "
        f"cannot canonicalize: {offenders}"
    )


def test_oracle_types_match_driver_pandas_view(spark, registry, duck, built):
    """Statically DESCRIBE every oracle: no HUGEINT (DuckDB SUM(int) —
    becomes float64 in .df() and hash-mismatches Spark's int64), no
    LIST/STRUCT/MAP, and column names equal to the Spark side's."""
    offenders: dict[str, str] = {}
    for name, qd in registry.items():
        if qd.oracle is None:
            continue
        df = built[name]
        desc = duck.execute(f"DESCRIBE {qd.oracle}").fetchall()
        ocols = [r[0] for r in desc]
        otypes = {r[0]: r[1] for r in desc}
        if sorted(ocols) != sorted(df.columns):
            offenders[name] = (
                f"columns spark={sorted(df.columns)} oracle={sorted(ocols)}"
            )
            continue
        bad = {
            c: t
            for c, t in otypes.items()
            if t == "HUGEINT"
            or t.endswith("[]")
            or t.startswith(("STRUCT", "MAP", "LIST"))
        }
        if bad:
            offenders[name] = f"driver-hostile oracle types: {bad}"
    assert not offenders, (
        "oracle outputs would mismatch in the driver's pandas view "
        f"(wrap aggregates in CAST(... AS BIGINT) / stringify arrays): "
        f"{offenders}"
    )
