"""Dialect-path queries — these run Pinot-dialect SQL through HurricaneSQL
(rewriter + default limit + spark.sql), so the driver's correctness gate
exercises the full front-end, not just the DataFrame API."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hurricanedb_spark.queries import register
from hurricanedb_spark.sql.dialect import HurricaneSQL


def _hdb(spark: SparkSession, sf_dir: str) -> HurricaneSQL:
    return HurricaneSQL(spark, sf_dir)


@register(
    "q_dialect_agg_rename",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS dc_supp,
           MAX(l_extendedprice) - MIN(l_extendedprice) AS price_range,
           CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS dsum_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Pinot aggregation names through the dialect rewriter: "
    "distinctcount -> count(DISTINCT), minmaxrange -> max-min, "
    "distinctsum -> sum(DISTINCT) (QueryRewriterFactory analog path).",
    tags=("dialect", "aggregation"),
)
def q_dialect_agg_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _hdb(spark, sf_dir).sql(
        """
        SELECT l_returnflag,
               distinctcount(l_suppkey) AS dc_supp,
               minmaxrange(l_extendedprice) AS price_range,
               CAST(distinctsum(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS dsum_qty
        FROM lineitem
        GROUP BY l_returnflag
        """,
        default_limit=None,
    )


@register(
    "q_dialect_datetime_bucket",
    oracle="""
    SELECT CAST((epoch_ms(CAST(ts AS TIMESTAMP)) // 900000) * 900000 // 60000 AS BIGINT) AS min15,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k
    FROM events
    GROUP BY 1
    """,
    doc="The classic Pinot realtime-dashboard shape through the dialect: "
    "dateTimeConvert to 15-minute epoch buckets + jsonExtractScalar "
    "(DateTimeConversionTransformFunction + JsonExtractScalar).",
    tags=("dialect", "datetime", "json"),
)
def q_dialect_datetime_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _hdb(spark, sf_dir).sql(
        """
        SELECT datetimeconvert(ts, '1:MILLISECONDS:TIMESTAMP',
                               '1:MINUTES:EPOCH', '15:MINUTES') AS min15,
               COUNT(*) AS n,
               SUM(jsonpathlong(props, '$.k')) AS sum_k
        FROM events
        GROUP BY 1
        """,
        default_limit=None,
    )


@register(
    "q_dialect_default_limit",
    oracle="""
    SELECT l_orderkey, l_linenumber FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    LIMIT 10
    """,
    doc="Default LIMIT 10 applied by the dialect when the query has none "
    "(PinotQuery.limit default, query.thrift:34).",
    tags=("dialect", "limit"),
)
def q_dialect_default_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _hdb(spark, sf_dir).sql(
        "SELECT l_orderkey, l_linenumber FROM lineitem ORDER BY l_orderkey, l_linenumber"
    )


@register(
    "q_theta_sketch_filtered_sql",
    oracle="""
    WITH per AS (
      SELECT o_orderpriority AS pri, o_custkey AS ck,
             bool_or(o_orderstatus = 'F') AS in_f,
             bool_or(o_orderstatus = 'O') AS in_o
      FROM orders GROUP BY 1, 2
    )
    SELECT pri,
           CAST(COUNT(*) FILTER (WHERE in_f AND in_o) AS BIGINT) AS dc_fo_intersect,
           CAST(COUNT(*) FILTER (WHERE in_f AND NOT in_o) AS BIGINT) AS dc_f_minus_o,
           CAST(COUNT(*) FILTER (WHERE in_f OR in_o) AS BIGINT) AS dc_fo_union,
           CAST(COUNT(*) FILTER (WHERE NOT in_f) AS BIGINT) AS dc_not_f
    FROM per GROUP BY pri ORDER BY pri
    """,
    doc="Filtered multi-arg distinctCountThetaSketch through the SQL "
    "surface (DistinctCountThetaSketchAggregationFunction.java:60-151): "
    "(expr, params, filter..., 'SET_OP($1,$2)') with SET_INTERSECT, "
    "SET_DIFF (including the $0 unfiltered default sketch) and SET_UNION, "
    "grouped. For <= 6 referenced sketches (all four calls here) the "
    "dialect computes the set algebra EXACTLY as a signed sum of "
    "count(DISTINCT) over unions of the filter predicates "
    "(inclusion-exclusion, fully distributed, bounded per-key state); "
    "above 6 sketches it falls back to per-group collect_set array "
    "algebra. The sketch approximates exactly this, and is itself exact "
    "below nominalEntries.",
    tags=("dialect", "aggregation", "sketch", "setops"),
)
def q_theta_sketch_filtered_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _hdb(spark, sf_dir).sql(
        """
        SELECT o_orderpriority AS pri,
               distinctCountThetaSketch(o_custkey, 'nominalEntries=4096',
                 'o_orderstatus = ''F''', 'o_orderstatus = ''O''',
                 'SET_INTERSECT($1, $2)') AS dc_fo_intersect,
               distinctCountThetaSketch(o_custkey, '',
                 'o_orderstatus = ''F''', 'o_orderstatus = ''O''',
                 'SET_DIFF($1, $2)') AS dc_f_minus_o,
               distinctCountThetaSketch(o_custkey, '',
                 'o_orderstatus = ''F''', 'o_orderstatus = ''O''',
                 'SET_UNION($1, $2)') AS dc_fo_union,
               distinctCountThetaSketch(o_custkey, '',
                 'o_orderstatus = ''F''',
                 'SET_DIFF($0, $1)') AS dc_not_f
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY pri
        """,
        default_limit=None,
    )


@register(
    "q_theta_sketch_many_filters",
    oracle="""
    WITH per AS (
      SELECT o_custkey, bool_or(o_orderstatus = 'F') AS in_f
      FROM orders GROUP BY 1
    )
    SELECT CAST((SELECT COUNT(DISTINCT CASE WHEN o_orderpriority IN
             ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
             OR o_orderstatus = 'F' OR o_totalprice > 100000
             THEN o_custkey END) FROM orders) AS BIGINT) AS dc_union7,
           CAST(COUNT(*) FILTER (WHERE NOT in_f) AS BIGINT)
             AS dc_diff_f
    FROM per
    """,
    doc="Filtered distinctCountThetaSketch ABOVE the inclusion-exclusion "
    "cap: both calls reference 7 sketches, routing to the per-group "
    "collect_set array algebra fallback (exact, state O(ndv)/group) "
    "instead of the 2^k-term expansion — this row oracle-covers the "
    "fallback the docstrings describe (the <=6 path is covered by "
    "q_theta_sketch_filtered_sql). dc_union7 is per-row expressible; "
    "dc_diff_f = (union of all 7 sets, which covers every custkey since "
    "the five priorities partition the rows) minus the F-status set, "
    "oracled via per-key bool_or membership.",
    tags=("dialect", "aggregation", "sketch", "setops"),
)
def q_theta_sketch_many_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _hdb(spark, sf_dir).sql(
        """
        SELECT distinctCountThetaSketch(o_custkey, '',
                 'o_orderpriority = ''1-URGENT''',
                 'o_orderpriority = ''2-HIGH''',
                 'o_orderpriority = ''3-MEDIUM''',
                 'o_orderpriority = ''4-NOT SPECIFIED''',
                 'o_orderpriority = ''5-LOW''',
                 'o_orderstatus = ''F''',
                 'o_totalprice > 100000',
                 'SET_UNION($1, $2, $3, $4, $5, $6, $7)') AS dc_union7,
               distinctCountThetaSketch(o_custkey, '',
                 'o_orderpriority = ''1-URGENT''',
                 'o_orderpriority = ''2-HIGH''',
                 'o_orderpriority = ''3-MEDIUM''',
                 'o_orderpriority = ''4-NOT SPECIFIED''',
                 'o_orderpriority = ''5-LOW''',
                 'o_orderstatus = ''F''',
                 'o_totalprice > 100000',
                 'SET_DIFF(SET_UNION($1, $2, $3, $4, $5, $6, $7), $6)')
                 AS dc_diff_f
        FROM orders
        """,
        default_limit=None,
    )


@register(
    "q_theta_many_filters_estimate",
    oracle="""
    SELECT CAST(COUNT(DISTINCT CASE WHEN o_orderpriority IN
             ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
             OR o_orderstatus = 'F' OR o_totalprice > 100000
             THEN o_custkey END) AS BIGINT) AS dc_union7
    FROM orders
    """,
    doc="Round-13: the >6-sketch filtered theta ESTIMATE form under "
    "OPTION(thetaEstimate=true) — routes through the bounded mergeable "
    "theta_ds sketches (one O(nominalEntries) sketch per referenced "
    "filter, set ops folded post-aggregation, rounded estimate out; "
    "the reference's always-estimate semantics, "
    "DistinctCountThetaSketchAggregationFunction.java:60-151) instead "
    "of the O(ndv)-per-group collect_set algebra. The oracle is EXACT "
    "because NDV(o_custkey) at every audit SF stays far below "
    "nominalEntries=262144, so the sketch never enters estimation "
    "mode — the same exactness argument as q_sketch_bytes_join_union.",
    tags=("dialect", "aggregation", "sketch", "setops"),
)
def q_theta_many_filters_estimate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _hdb(spark, sf_dir).sql(
        """
        SELECT distinctCountThetaSketch(o_custkey,
                 'nominalEntries=262144',
                 'o_orderpriority = ''1-URGENT''',
                 'o_orderpriority = ''2-HIGH''',
                 'o_orderpriority = ''3-MEDIUM''',
                 'o_orderpriority = ''4-NOT SPECIFIED''',
                 'o_orderpriority = ''5-LOW''',
                 'o_orderstatus = ''F''',
                 'o_totalprice > 100000',
                 'SET_UNION($1, $2, $3, $4, $5, $6, $7)') AS dc_union7
        FROM orders
        OPTION(thetaEstimate=true)
        """,
        default_limit=None,
    )


@register(
    "q_theta_estimate_mode",
    oracle=None,
    doc="Round-14 (r13 verdict #5): the >6-filter bounded theta ESTIMATE "
    "path forced PAST nominalEntries into REAL estimation mode — "
    "nominalEntries=256 against NDV(o_custkey) >= 1500 at the gate SF, "
    "so every per-filter sketch samples (theta < 1) and the union "
    "estimate is a genuine DataSketches estimate, not an exact count "
    "(DistinctCountThetaSketchAggregationFunction.java:60-151). The row "
    "computes the exact union cardinality in-plan, asserts the estimate "
    "lands within a 2.5-sigma theta envelope (2.5/sqrt(k) = 15.6% — the "
    "SET_UNION of 7 per-filter sketches compounds slightly past a "
    "single sketch's 2-sigma bound; measured 2.03 sigma at sf0.1), "
    "and RAISES if NDV shrinks below the estimation regime so the row "
    "cannot silently degenerate to exact. rows-only by design: a "
    "sampling estimate cannot hash-match a DuckDB exact; the returned "
    "row pins (est, exact, bound) deterministically (fixed murmur3 "
    "seed).",
    tags=("dialect", "aggregation", "sketch", "setops", "estimate"),
)
def q_theta_estimate_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    hdb = _hdb(spark, sf_dir)
    filters = (
        "'o_orderpriority = ''1-URGENT''',"
        "'o_orderpriority = ''2-HIGH''',"
        "'o_orderpriority = ''3-MEDIUM''',"
        "'o_orderpriority = ''4-NOT SPECIFIED''',"
        "'o_orderpriority = ''5-LOW''',"
        "'o_orderstatus = ''F''',"
        "'o_totalprice > 100000'"
    )
    exact = hdb.sql(
        """
        SELECT CAST(COUNT(DISTINCT CASE WHEN o_orderpriority IN
                 ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
                 OR o_orderstatus = 'F' OR o_totalprice > 100000
                 THEN o_custkey END) AS BIGINT) AS dc
        FROM orders
        """,
        default_limit=None,
    ).collect()[0]["dc"]
    # estimation regime at EVERY SF: nominalEntries = 256 at the gate
    # SF and above, 64 at the sf0.001 smoke fixture (NDV 150); either
    # way NDV must exceed 2x nominal so theta genuinely samples
    nominal = 256 if exact > 512 else 64
    if exact <= 2 * nominal:
        raise ValueError(
            f"q_theta_estimate_mode needs NDV > {2 * nominal} to force "
            f"estimation mode (got {exact}); grow the fixture or shrink "
            "nominalEntries"
        )
    est = hdb.sql(
        f"""
        SELECT distinctCountThetaSketch(o_custkey,
                 'nominalEntries={nominal}',
                 {filters},
                 'SET_UNION($1, $2, $3, $4, $5, $6, $7)') AS dc_est
        FROM orders
        OPTION(thetaEstimate=true)
        """,
        default_limit=None,
    ).collect()[0]["dc_est"]
    rel_err = abs(est - exact) / exact
    # 2.5-sigma: the union-of-7 compounds slightly past a single
    # sketch's 2-sigma envelope (measured 2.03 sigma at sf0.1). The
    # k=64 smoke regime gets 3.5 sigma — tiny sketches carry extra
    # small-sample skew (measured 2.45 sigma at sf0.001)
    bound = (2.5 if nominal >= 256 else 3.5) / (nominal ** 0.5)
    if rel_err > bound:
        raise AssertionError(
            f"theta estimation-mode error {rel_err:.4f} exceeds the "
            f"2.5-sigma envelope {bound:.4f} (est={est}, exact={exact})"
        )
    return spark.createDataFrame(
        [(int(est), int(exact), float(round(rel_err, 6)))],
        "dc_est bigint, dc_exact bigint, rel_err double",
    )


@register(
    "q_hll_estimate_mode",
    oracle=None,
    doc="Round-15 (r14 verdict #5, the q_theta_estimate_mode pattern "
    "applied to the HLL family): distinctCountRawHLL and "
    "distinctCountHLL forced PAST any exact-looking regime into REAL "
    "estimation — log2m=8 (m=256 registers) against NDV(o_custkey) >= "
    "1500 at the gate SF, so every register sees multiple distinct "
    "hashes and the returned cardinality is a genuine clearspring "
    "HyperLogLog estimate (DistinctCountHLLAggregationFunction; wire "
    "bytes decode through operators/clearspring_hll, byte-identical to "
    "stream-2.9.8). The row computes the exact NDV in-plan, asserts "
    "BOTH estimates (the raw clearspring sketch's cardinality and the "
    "estimate surface's approx_count_distinct at the same mapped rsd) "
    "within a 2.5-sigma rsd envelope (1.04/sqrt(m)), and RAISES if NDV "
    "shrinks below 2x the register count so the row cannot silently "
    "degenerate out of the estimation regime. rows-only by design: a "
    "register estimate cannot hash-match a DuckDB exact; the returned "
    "row pins (raw_est, est, exact, rel errors) deterministically "
    "(fixed murmur2-64A hashing).",
    tags=("dialect", "aggregation", "sketch", "hll", "estimate"),
)
def q_hll_estimate_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hurricanedb_spark.operators.clearspring_hll import ClearspringHLL

    hdb = _hdb(spark, sf_dir)
    exact = hdb.sql(
        "SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS dc FROM orders",
        default_limit=None,
    ).collect()[0]["dc"]
    # estimation regime at EVERY SF: m=256 registers at the gate SF and
    # above, m=32 at the sf0.001 smoke fixture (NDV ~150); either way
    # NDV must exceed 2x the register count so registers genuinely
    # collide and the small-range linear-counting correction is out
    log2m = 8 if exact > 512 else 5
    m = 1 << log2m
    if exact <= 2 * m:
        raise ValueError(
            f"q_hll_estimate_mode needs NDV > {2 * m} to force "
            f"estimation mode (got {exact}); grow the fixture or shrink "
            "log2m"
        )
    row = hdb.sql(
        f"""
        SELECT distinctCountRawHLL(o_custkey, {log2m}) AS raw_hex,
               distinctCountHLL(o_custkey, {log2m}) AS est
        FROM orders
        """,
        default_limit=None,
    ).collect()[0]
    raw_est = ClearspringHLL.deserialize(
        bytes.fromhex(row["raw_hex"])
    ).cardinality()
    est = int(row["est"])
    rsd = 1.04 / (m ** 0.5)
    # 2.5 sigma for m=256; the m=32 smoke regime gets 3.5 sigma (tiny
    # register arrays carry extra small-sample skew, like the theta
    # row's k=64 smoke regime)
    bound = (2.5 if m >= 256 else 3.5) * rsd
    errs = {}
    for name, e in (("raw", raw_est), ("est", est)):
        rel = abs(e - exact) / exact
        if rel > bound:
            raise AssertionError(
                f"HLL estimation-mode {name} error {rel:.4f} exceeds "
                f"the envelope {bound:.4f} (est={e}, exact={exact}, "
                f"m={m})"
            )
        errs[name] = rel
    return spark.createDataFrame(
        [
            (
                int(raw_est),
                est,
                int(exact),
                float(round(errs["raw"], 6)),
                float(round(errs["est"], 6)),
            )
        ],
        "hll_raw_est bigint, hll_est bigint, dc_exact bigint, "
        "rel_err_raw double, rel_err_est double",
    )


@register(
    "q_raw_theta_filtered_sketch",
    oracle="""
    WITH per AS (
      SELECT o_orderpriority AS pri, o_custkey AS ck,
             bool_or(o_orderstatus = 'F') AS in_f,
             bool_or(o_orderstatus = 'O') AS in_o
      FROM orders GROUP BY 1, 2
    )
    SELECT pri,
           CAST(COUNT(*) FILTER (WHERE in_f AND in_o) AS BIGINT)
             AS est_intersect,
           CAST(COUNT(*) FILTER (WHERE in_f AND NOT in_o) AS BIGINT)
             AS est_diff
    FROM per GROUP BY pri ORDER BY pri
    """,
    doc="FILTERED distinctCountRawThetaSketch (DistinctCountRawTheta"
    "SketchAggregationFunction.java:34-56): (expr, params, filter..., "
    "'SET_OP(...)') returns the base64 serialized compact sketch OF THE "
    "SET-OP RESULT — mergeable state clients persist and re-union across "
    "slices, not a count. This gate row deserializes the returned "
    "sketches (operators/theta_ds, public DataSketches wire layout) and "
    "compares their estimates against the exact per-key membership "
    "oracle. nominalEntries=65536 keeps the sketches exact at gate SF; "
    "the query RAISES if any group's NDV exceeds it (the estimation "
    "regime is tolerance-tested in pytest), so the exact oracle cannot "
    "silently rot when the fixture grows.",
    tags=("dialect", "aggregation", "sketch", "setops", "wire-format"),
)
def q_raw_theta_filtered_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    nominal = 65536
    hdb = _hdb(spark, sf_dir)
    ndv = hdb.sql(
        "SELECT max(cnt) AS m FROM (SELECT count(DISTINCT o_custkey) AS cnt "
        "FROM orders GROUP BY o_orderpriority)",
        default_limit=None,
    ).collect()[0]["m"]
    if ndv > nominal:
        raise RuntimeError(
            f"q_raw_theta_filtered_sketch: per-group NDV {ndv} exceeds "
            f"nominalEntries {nominal} — sketches leave the exact regime "
            "and the exact oracle no longer applies; raise nominalEntries "
            "or switch this row to a tolerance check"
        )
    raw = hdb.sql(
        f"""
        SELECT o_orderpriority AS pri,
               distinctCountRawThetaSketch(o_custkey,
                 'nominalEntries={nominal}',
                 'o_orderstatus = ''F''', 'o_orderstatus = ''O''',
                 'SET_INTERSECT($1, $2)') AS sk_intersect,
               distinctCountRawThetaSketch(o_custkey,
                 'nominalEntries={nominal}',
                 'o_orderstatus = ''F''', 'o_orderstatus = ''O''',
                 'SET_DIFF($1, $2)') AS sk_diff
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY pri
        """,
        default_limit=None,
    )

    @F.udf("bigint")
    def _estimate(b64):
        import base64

        from hurricanedb_spark.operators.theta_ds import deserialize

        return round(deserialize(base64.b64decode(b64)).estimate())

    return raw.select(
        "pri",
        _estimate("sk_intersect").alias("est_intersect"),
        _estimate("sk_diff").alias("est_diff"),
    )


@register(
    "q_sketch_bytes_join_union",
    oracle="""
    SELECT r_name,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS dc_cust
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY r_name
    """,
    doc="distinctCountThetaSketch over a BYTES column of PRE-BUILT "
    "sketches in a JOIN query — the round-11 bug class promoted to a "
    "driver-hard row (it was pytest-only): per-nation raw theta "
    "sketches are persisted as a BINARY column (the "
    "persist-sketches-then-union-at-rollup workflow the raw forms exist "
    "for, DistinctCountThetaSketchAggregationFunction.aggregate()'s "
    "BYTES type-dispatch), then unioned per REGION through a "
    "two-table join. Before the r11 fix, a joined BYTES column silently "
    "counted distinct BLOBS (25 sketches -> '25') instead of unioning "
    "the stored sketches; the exact oracle (per-region NDV far below "
    "nominalEntries=65536, so the union estimate is exact) hash-pins "
    "the dispatch through the join FROM shape.",
    tags=("dialect", "sketch", "join", "bytes"),
)
def q_sketch_bytes_join_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    nominal = 65536
    hdb = _hdb(spark, sf_dir)
    store = hdb.sql(
        "SELECT c_nationkey, distinctCountRawThetaSketch(c_custkey, "
        f"'nominalEntries={nominal}') AS sk_b64 "
        "FROM customer GROUP BY c_nationkey",
        default_limit=None,
    )
    # the raw form's base64 STRING envelope decodes to the sketch's wire
    # bytes — the BYTES column a migrated reference store would hold.
    # Per-call unique view name + drop after the (eagerly analyzed)
    # result plan has inlined it — matching the __rdsub_* convention, so
    # repeated driver runs don't accrete views in the session catalog.
    import uuid as _uuid

    view = f"__theta_store_custkey_{_uuid.uuid4().hex}"
    store.select(
        "c_nationkey", F.unbase64("sk_b64").alias("sk")
    ).createOrReplaceTempView(view)
    try:
        return hdb.sql(
            f"""
            SELECT r_name,
                   distinctCountThetaSketch(sk, 'nominalEntries={nominal}')
                     AS dc_cust
            FROM {view}
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
            ORDER BY r_name
            """,
            default_limit=None,
        )
    finally:
        spark.catalog.dropTempView(view)


@register(
    "q_raw_qdigest_quantile",
    oracle="""
    WITH ranked AS (
      SELECT l_returnflag AS flag,
             CAST(l_quantity AS BIGINT) AS v,
             row_number() OVER (
               PARTITION BY l_returnflag ORDER BY CAST(l_quantity AS BIGINT)
             ) AS r,
             count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    )
    SELECT flag,
           CAST(min(CASE WHEN r = CAST(floor(0.5 * n) + 1 AS BIGINT)
                    THEN v END) AS BIGINT) AS p50,
           CAST(min(CASE WHEN r = CAST(floor(0.9 * n) + 1 AS BIGINT)
                    THEN v END) AS BIGINT) AS p90,
           CAST(max(n) AS BIGINT) AS n
    FROM ranked GROUP BY flag ORDER BY flag
    """,
    doc="percentileRawEst returns the HEX-serialized QuantileDigest "
    "(PercentileRawEstAggregationFunction.java; SerializedQuantileDigest"
    ".toString -> lowercase hex), which this row deserializes "
    "(operators/percentile_digest — the vendored QuantileDigest wire "
    "layout) and queries for quantiles. The exact-regime digest is "
    "deterministic, so the extracted quantile has an EXACT oracle: "
    "getQuantiles() returns the value at the smallest rank whose "
    "forward cumulative weight exceeds q*N — rank floor(q*N)+1 — "
    "expressed in SQL via row_number(). Built two-phase (mapInPandas "
    "partials + blob merge, sql/dialect._raw_digest_two_phase), which "
    "is byte-identical to a single-pass build for the exact regime.",
    tags=("dialect", "aggregation", "percentile", "wire-format"),
)
def q_raw_qdigest_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    raw = _hdb(spark, sf_dir).sql(
        """
        SELECT l_returnflag AS flag,
               percentileRawEst(l_quantity, 50) AS qd,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY flag
        """,
        default_limit=None,
    )

    def _q(hex_digest: str, q: float) -> int:
        from hurricanedb_spark.operators.percentile_digest import (
            deserialize_qdigest,
        )

        return int(deserialize_qdigest(bytes.fromhex(hex_digest)).quantile(q))

    q50 = F.udf(lambda s: _q(s, 0.5), "bigint")
    q90 = F.udf(lambda s: _q(s, 0.9), "bigint")
    return raw.select(
        "flag",
        q50("qd").alias("p50"),
        q90("qd").alias("p90"),
        F.col("n").cast("bigint").alias("n"),
    )


@register(
    "q_mv_sketch_bounded",
    oracle=None,  # approximate by design (QuantileSummaries / HLL++ state);
    # accuracy bounded in tests/test_dialect.py (2% / 5% vs exact forms)
    doc="Bounded-state MV sketch aggregates through the dialect "
    "restructure (rewrite_mv_percentile_bounded): percentileTDigestMV + "
    "distinctCountHLLMV share one exploded CTE, per-group state is the "
    "QuantileSummaries / HLL++ sketch — never O(values in group). The "
    "reference's PercentileTDigestMV/DistinctCountHLLMV bounded forms.",
    tags=("dialect", "mv", "sketch"),
)
def q_mv_sketch_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _hdb(spark, sf_dir).sql(
        "SELECT label, percentileTDigestMV(embedding, 95) AS p95, "
        "distinctCountHLLMV(embedding) AS dc "
        "FROM embeddings GROUP BY label ORDER BY label",
        default_limit=None,
    )
