"""CLP log-encoding queries: template/variable decomposition over a
synthesized log line per `events` row, plus the logtype template search.

Reference: pinot-plugins/pinot-input-format/pinot-clp-log/
CLPLogRecordExtractor.java:37-70 (message -> _logtype/_dictionaryVars/
_encodedVars). The driver tables carry no raw log-text column, so the
message is synthesized deterministically from events columns — the
encoder then runs exactly as it would over ingested log lines.

Scale note: encode is a narrow per-row map (split/transform/filter —
whole-stage codegen, no shuffle, no UDF); the template search reads only
the logtype column, which is why CLP-shape storage makes log scans cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hurricanedb_spark.catalog.tables import load_table
from hurricanedb_spark.queries import register
from hurricanedb_spark.sources.clp_logs import clp_encode, clp_match_logtype

# DuckDB-side equivalent of the synthesized message + decomposition.
_ORACLE_SRC = """
    WITH src AS (
      SELECT event_id,
             'ingest evt-' || CAST(event_id AS VARCHAR)
               || ' user=' || CAST(user_id AS VARCHAR)
               || ' ' || event_type
               || ' took ' || CAST(CAST(FLOOR(value * 100) AS BIGINT) AS VARCHAR)
               || ' ms' AS msg
      FROM events
    ),
    toks AS (SELECT event_id, str_split(msg, ' ') AS t FROM src),
    enc AS (
      SELECT event_id,
             array_to_string(
               list_transform(t, x -> CASE
                 WHEN regexp_full_match(x, '-?[0-9]+') THEN chr(18)
                 WHEN regexp_matches(x, '[0-9]') THEN chr(17)
                 ELSE x END), ' ') AS msg_logtype,
             list_filter(t, x -> regexp_matches(x, '[0-9]')
                                 AND NOT regexp_full_match(x, '-?[0-9]+')) AS msg_dict_vars,
             list_transform(list_filter(t, x -> regexp_full_match(x, '-?[0-9]+')),
                            x -> CAST(x AS BIGINT)) AS msg_encoded_vars
      FROM toks
    )
"""


def _synth_message(df: DataFrame) -> DataFrame:
    msg = F.concat_ws(
        " ",
        F.lit("ingest"),
        F.concat(F.lit("evt-"), F.col("event_id").cast("string")),
        F.concat(F.lit("user="), F.col("user_id").cast("string")),
        F.col("event_type"),
        F.lit("took"),
        F.floor(F.col("value") * 100).cast("bigint").cast("string"),
        F.lit("ms"),
    )
    return df.select("event_id", msg.alias("msg"))


@register(
    "q_clp_encode",
    oracle=_ORACLE_SRC
    + """
    SELECT event_id, msg_logtype,
           array_to_string(msg_dict_vars, ',') AS msg_dict_vars,
           array_to_string(list_transform(msg_encoded_vars,
                                          x -> CAST(x AS VARCHAR)), ',')
             AS msg_encoded_vars
    FROM enc
    """,
    doc="CLP decomposition (CLPLogRecordExtractor.java:37-70): per-row "
    "logtype template + dictionary vars (digit-bearing identifiers) + "
    "encoded vars (integers as longs), via built-in higher-order fns only. "
    "Var lists are comma-joined to strings for the gate (the driver's "
    "pandas canonicalizer cannot sort array cells); order within a "
    "message is positional, so the join is deterministic.",
    tags=("ingestion", "clp", "logs"),
)
def q_clp_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    enc = clp_encode(_synth_message(events), "msg")
    return enc.select(
        "event_id",
        "msg_logtype",
        F.array_join(F.col("msg_dictionaryVars"), ",").alias("msg_dict_vars"),
        F.array_join(
            F.transform(F.col("msg_encodedVars"), lambda x: x.cast("string")),
            ",",
        ).alias("msg_encoded_vars"),
    )


@register(
    "q_clp_logtype_search",
    oracle=_ORACLE_SRC
    + """
    SELECT msg_logtype, COUNT(*) AS n,
           CAST(SUM(list_extract(msg_encoded_vars, 1)) AS BIGINT) AS total_took
    FROM enc
    WHERE msg_logtype LIKE 'ingest % took % ms'
    GROUP BY msg_logtype
    """,
    doc="CLP template search: LIKE over the static logtype column only "
    "(variables are placeholders), then aggregate the encoded variable — "
    "the CLP query pattern where scans touch the repetitive template "
    "column instead of raw text.",
    tags=("ingestion", "clp", "logs"),
)
def q_clp_logtype_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    enc = clp_encode(_synth_message(events), "msg")
    hits = clp_match_logtype(enc, "msg", "ingest * took * ms")
    return hits.groupBy("msg_logtype").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.element_at("msg_encodedVars", 1)).alias("total_took"),
    )
