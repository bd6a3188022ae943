"""Batch ingestion: multi-format readers + the record-transformer pipeline.

Reference (SURVEY.md §2.1): per-format RecordReaders
(pinot-plugins/pinot-input-format/* — Avro/CSV/JSON/ORC/Parquet/Protobuf/
Thrift) feed a fixed transformer chain
(pinot-segment-local/.../recordtransformer/):

  FilterTransformer        -> drop rows matching filterConfig
  ExpressionTransformer    -> derive columns from expressions
  ComplexTypeTransformer   -> flatten structs (dotted names), unnest arrays
                              into child rows (ComplexTypeTransformer.java:38-94)
  DataTypeTransformer      -> cast to schema types
  NullValueTransformer     -> substitute per-field default null values
  SanitizationTransformer  -> trim/truncate strings
  TimeValidationTransformer-> drop/flag rows with out-of-range time values

Spark-first: each stage is a declarative DataFrame operation, composed from
a table-config dict; Catalyst fuses the whole chain into one scan+project
pipeline (no per-row interpreter like the reference). The sealed-segment
write is `partitionBy(<time>)` parquet — Spark's files are the segments.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

_FORMATS = {"parquet", "csv", "json", "orc", "avro", "protobuf", "thrift"}


def read_batch(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
    options: dict[str, str] | None = None,
    protobuf_fields: dict[int, tuple[str, str]] | None = None,
    thrift_fields: dict[int, tuple[str, str]] | None = None,
) -> DataFrame:
    """Format-dispatching batch reader (RecordReader SPI analog).

    protobuf requires `schema` and `protobuf_fields` ({field_number:
    (column, ptype)} — the descriptor analog); see sources/protobuf_reader.
    thrift requires `schema` and `thrift_fields` ({field_id: (column,
    ttype)} — the generated-class metadata analog); see
    sources/thrift_reader.
    """
    fmt = fmt.lower()
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format: {fmt} (supported: {sorted(_FORMATS)})")
    if fmt == "protobuf":
        if schema is None or protobuf_fields is None:
            raise ValueError("protobuf format requires schema and protobuf_fields")
        from hurricanedb_spark.sources.protobuf_reader import read_protobuf

        return read_protobuf(spark, path, schema, protobuf_fields)
    if fmt == "thrift":
        if schema is None or thrift_fields is None:
            raise ValueError("thrift format requires schema and thrift_fields")
        from hurricanedb_spark.sources.thrift_reader import read_thrift

        return read_thrift(spark, path, schema, thrift_fields)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    if fmt == "csv":
        reader = reader.option("header", options.get("header", "true") if options else "true")
    return reader.format(fmt).load(path)


class IngestionPipeline:
    """Config-driven transformer chain.

    config keys (all optional, mirroring the reference's table config):
      filter:        {"expr": "<SQL boolean>"}  — rows matching are DROPPED
                     (FilterTransformer semantics: filterFunction selects
                     rows to skip)
      transforms:    [{"column": name, "expr": "<SQL expr>"}, ...]
                     (ExpressionTransformer: derive/overwrite columns)
      complex_type:  {"flatten": true, "unnest": ["col", ...],
                      "delimiter": "."}
                     (ComplexTypeTransformer: structs -> dotted columns,
                      arrays -> exploded child rows)
      data_types:    {"col": "spark type string", ...}  (DataTypeTransformer)
      null_defaults: {"col": default, ...}              (NullValueTransformer)
      sanitize:      {"max_length": N, "trim": true}    (SanitizationTransformer)
      time_validate: {"column": c, "min": lit, "max": lit, "action":
                      "drop"|"null"}                    (TimeValidationTransformer)
    """

    def __init__(self, config: dict[str, Any]):
        self.config = config

    def apply(self, df: DataFrame) -> DataFrame:
        cfg = self.config
        if "filter" in cfg:
            df = df.filter(~F.expr(cfg["filter"]["expr"]))
        if cfg.get("complex_type"):
            df = self._complex(df, cfg["complex_type"])
        for t in cfg.get("transforms", []):
            df = df.withColumn(t["column"], F.expr(t["expr"]))
        for col, dtype in cfg.get("data_types", {}).items():
            df = df.withColumn(col, F.col(col).cast(dtype))
        if cfg.get("null_defaults"):
            df = df.na.fill(cfg["null_defaults"])
        if cfg.get("sanitize"):
            df = self._sanitize(df, cfg["sanitize"])
        if cfg.get("time_validate"):
            df = self._time_validate(df, cfg["time_validate"])
        return df

    @staticmethod
    def _complex(df: DataFrame, cfg: dict[str, Any]) -> DataFrame:
        delim = cfg.get("delimiter", ".")
        # unnest first (ComplexTypeTransformer unnests collections into
        # child rows), then flatten any remaining/revealed structs.
        for col in cfg.get("unnest", []):
            df = df.withColumn(col, F.explode_outer(F.col(col)))
        if cfg.get("flatten", True):
            while True:
                struct_cols = [
                    f.name
                    for f in df.schema.fields
                    if isinstance(f.dataType, T.StructType)
                ]
                if not struct_cols:
                    break
                cols = []
                for f in df.schema.fields:
                    if f.name in struct_cols:
                        for sub in f.dataType.fields:
                            cols.append(
                                F.col(f"`{f.name}`.`{sub.name}`").alias(
                                    f"{f.name}{delim}{sub.name}"
                                )
                            )
                    else:
                        cols.append(F.col(f"`{f.name}`"))
                df = df.select(*cols)
        return df

    @staticmethod
    def _sanitize(df: DataFrame, cfg: dict[str, Any]) -> DataFrame:
        max_len = cfg.get("max_length")
        for f in df.schema.fields:
            if isinstance(f.dataType, T.StringType):
                c = F.col(f"`{f.name}`")  # flattened names may contain dots
                if cfg.get("trim", True):
                    c = F.trim(c)
                if max_len:
                    c = F.substring(c, 1, max_len)
                df = df.withColumn(f.name, c)
        return df

    @staticmethod
    def _time_validate(df: DataFrame, cfg: dict[str, Any]) -> DataFrame:
        c = F.col(f"`{cfg['column']}`")
        ok = F.lit(True)
        if "min" in cfg:
            ok = ok & (c >= F.lit(cfg["min"]).cast(df.schema[cfg["column"]].dataType))
        if "max" in cfg:
            ok = ok & (c <= F.lit(cfg["max"]).cast(df.schema[cfg["column"]].dataType))
        if cfg.get("action", "drop") == "drop":
            return df.filter(ok)
        return df.withColumn(
            cfg["column"], F.when(ok, c).otherwise(F.lit(None))
        )


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Co-located join layout (the reference's partitioned-replica-group
    routing analog, SegmentPartitionConfig): persist a fact table bucketed
    by its join key so repeated fact-fact joins on that key read
    pre-partitioned files and skip the shuffle entirely — at 100 TB the
    lineitem ⋈ orders exchange is the single largest cost in the star
    queries, and bucketing removes it from every downstream query.
    `sort_col` additionally sorts within buckets (sorted-merge reads)."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def write_segments(
    df: DataFrame, path: str, time_col: str | None = None, mode: str = "overwrite"
) -> None:
    """Sealed-segment write: parquet partitioned by day of the time column
    (segment = time partition, SURVEY.md §1.5) so TimeSegmentPruner-style
    pruning is free via partition directories."""
    w = df.write.mode(mode)
    if time_col:
        df = df.withColumn("__day", F.to_date(F.col(time_col)))
        w = df.write.mode(mode).partitionBy("__day")
    w.parquet(path)
