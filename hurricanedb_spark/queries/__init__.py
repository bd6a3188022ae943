"""Query/operator inventory — the correctness contract.

Every operator claimed from SURVEY.md §2 registers here as a QueryDef:
a Spark callable `(spark, sf_dir) -> DataFrame` plus (where SQL-expressible)
an equivalent ANSI-SQL oracle string for DuckDB. The driver runs both at
sf0.01 and compares row-count + schema + order-insensitive value hashes,
so column names must match exactly and float arithmetic must be
deterministic across engines (see queries/_exact.py).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None -> driver does rows-only check
    doc: str = ""
    tags: tuple[str, ...] = ()
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, QueryDef] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    bench: bool = False,
):
    """Decorator: register a (spark, sf_dir) -> DataFrame query callable."""

    def wrap(fn):
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, doc=doc, tags=tags, bench=bench)
        return fn

    return wrap


def all_queries() -> dict[str, QueryDef]:
    # import side-effect registration
    from hurricanedb_spark.queries import (  # noqa: F401
        core,
        filters,
        joins,
        ssb,
        druid_bench,
        windows,
        functions_sql,
        gapfill_q,
        streaming_q,
        datapipe,
        aggregates,
        multistage,
        geo_q,
        mv_binary,
        dialect_q,
        streaming_live,
        ingestion_q,
        clp_q,
        sampling_q,
        null_mode_q,
    )

    return REGISTRY
