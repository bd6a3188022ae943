"""hurricanedb_spark — a PySpark-native analytics engine.

A brand-new engine providing the query and data-processing capabilities of
GuinsooLab/hurricanedb (an Apache Pinot 0.13.0 fork): SQL selection /
filter / aggregation / group-by / distinct (the reference's V1 engine),
multistage joins + window aggregates (the V2 engine), ~100 transform and
~65 aggregation functions, time-series gapfill, upsert/dedup semantics,
batch + streaming ingestion — re-expressed Spark-first: DataFrame/SQL plans
optimized by Catalyst, streams via Structured Streaming.

Layout:
  session    — tuned SparkSession factory
  catalog    — Pinot-style JSON schema -> StructType; table registration
  functions  — dialect function registry (Pinot names -> Spark exprs/UDFs)
  queries    — the operator/query inventory with DuckDB oracle SQL
  operators  — custom operators (gapfill, upsert, dedup, similarity, text)
  streaming  — realtime ingestion, hybrid tables
  sql        — dialect front-end (default LIMIT 10, name rewrites)
"""

__version__ = "0.1.0"

from hurricanedb_spark.session import get_spark  # noqa: F401
