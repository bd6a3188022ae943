"""Ingestion pipeline tests: multi-format readers + the full transformer
chain (filter/derive/flatten/unnest/cast/null-default/sanitize/
time-validate) on inline data — mirrors the reference's
recordtransformer tests."""

from __future__ import annotations

import datetime
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from hurricanedb_spark.operators.compaction import merge_rollup, purge, rewrite_atomic
from hurricanedb_spark.sources.ingestion import IngestionPipeline, read_batch, write_segments


@pytest.fixture()
def tmp():
    d = tempfile.mkdtemp(prefix="hingest-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_read_batch_formats(spark, tmp):
    df = spark.range(10).withColumn("s", F.concat(F.lit("v"), F.col("id")))
    for fmt in ["parquet", "csv", "json", "orc"]:
        path = f"{tmp}/{fmt}"
        df.write.format(fmt).option("header", "true").save(path)
        back = read_batch(spark, path, fmt, schema=df.schema)
        assert back.count() == 10, fmt

    with pytest.raises(ValueError):
        read_batch(spark, tmp, "xml")


def test_transformer_chain(spark):
    raw = spark.createDataFrame(
        [
            (1, "  keep  ", {"a": 1, "b": "x"}, [10, 20], "2024-01-05"),
            (2, "drop", {"a": 2, "b": "y"}, [30], "2024-01-06"),
            (3, None, {"a": 3, "b": None}, [], "1970-01-01"),  # bad time
        ],
        "id int, name string, nested struct<a:int,b:string>, vals array<int>, ds string",
    )
    pipe = IngestionPipeline(
        {
            "filter": {"expr": "name = 'drop'"},
            "complex_type": {"flatten": True, "unnest": ["vals"]},
            "transforms": [{"column": "val2", "expr": "vals * 2"}],
            "data_types": {"ds": "date"},
            "null_defaults": {"name": "null", "vals": -1},
            "sanitize": {"trim": True, "max_length": 4},
            "time_validate": {"column": "ds", "min": "2024-01-01", "action": "drop"},
        }
    )
    out = pipe.apply(raw)
    rows = {r.id: r for r in out.collect()}
    # row 2 filtered out; row 3 dropped by time validation
    assert set(rows) == {1}
    # unnest produced child rows for id=1 (two vals)
    all_rows = out.collect()
    assert len(all_rows) == 2
    assert {r.vals for r in all_rows} == {10, 20}
    assert {r.val2 for r in all_rows} == {20, 40}
    # struct flattened to dotted columns
    assert "nested.a" in out.columns and "nested.b" in out.columns
    # sanitize trimmed + truncated to 4 chars
    assert all_rows[0].name == "keep"


def test_null_default_substitution(spark):
    raw = spark.createDataFrame([(1, None), (2, "x")], "id int, s string")
    out = IngestionPipeline({"null_defaults": {"s": "null"}}).apply(raw)
    vals = {r.id: r.s for r in out.collect()}
    assert vals[1] == "null"  # Pinot default-null substitution (FieldSpec.java:49-66)


def test_write_segments_time_partitioned(spark, tmp):
    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1)), (2, datetime.datetime(2024, 1, 2))],
        "id int, ts timestamp",
    )
    write_segments(df, f"{tmp}/seg", time_col="ts")
    import glob

    days = glob.glob(f"{tmp}/seg/__day=*")
    assert len(days) == 2  # one partition dir per day = segment analog


def test_merge_rollup(spark):
    df = spark.createDataFrame(
        [
            ("a", datetime.datetime(2024, 1, 1, 10, 5), 1.0),
            ("a", datetime.datetime(2024, 1, 1, 10, 55), 2.0),
            ("a", datetime.datetime(2024, 1, 1, 11, 5), 4.0),
            ("b", datetime.datetime(2024, 1, 1, 10, 30), 8.0),
        ],
        "k string, ts timestamp, v double",
    )
    out = merge_rollup(df, ["k"], {"v": "SUM"}, time_col="ts", granularity="hour")
    rows = {(r.k, r.ts.hour): r.v for r in out.collect()}
    assert rows == {("a", 10): 3.0, ("a", 11): 4.0, ("b", 10): 8.0}


def test_purge_and_atomic_rewrite(spark, tmp):
    path = f"{tmp}/t"
    spark.range(10).write.parquet(path)
    df = spark.read.parquet(path)
    purged = purge(df, F.col("id") % 2 == 0)
    rewrite_atomic(spark, purged, path)
    back = spark.read.parquet(path)
    assert back.count() == 5
    assert all(r.id % 2 == 1 for r in back.collect())


def test_bucketed_tables_join_without_shuffle(spark, sf_dir):
    """SCALE.md's storage-side seam, proven on the plan: lineitem and
    orders bucketed by orderkey join with zero Exchange — each task reads
    matching buckets from both sides (the co-located join the reference
    gets from partitioned replica-group routing)."""
    from hurricanedb_spark.catalog.tables import load_table
    from hurricanedb_spark.sources.ingestion import write_bucketed_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    write_bucketed_table(li, "li_bkt", "l_orderkey", n_buckets=8)
    write_bucketed_table(orders, "ord_bkt", "o_orderkey", n_buckets=8)
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("li_bkt").join(
                spark.table("ord_bkt"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            plan = joined._sc._jvm.PythonSQLUtils.explainString(
                joined._jdf.queryExecution(), "formatted"
            )
            assert "Exchange" not in plan, plan
            assert "SortMergeJoin" in plan
            # and it still computes the right thing
            n = joined.count()
            expected = li.join(
                orders, F.col("l_orderkey") == F.col("o_orderkey")
            ).count()
            assert n == expected > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bkt")
        spark.sql("DROP TABLE IF EXISTS ord_bkt")


def test_bucketed_join_zero_exchange_at_sf10(spark):
    """Real-volume co-located join proof (skipped unless
    tools/bench_bucketed.py has built the sf10 bucketed tables): the
    60M ⋈ 15M orderkey join over bucketed storage plans with ZERO
    exchanges on the join keys."""
    import os

    import pytest as _pytest

    def _attach(table: str, bucket_col: str):
        """Catalog entries are session-scoped without a metastore:
        re-attach the tool's bucketed files by DDL (bucket spec + the
        bucket-id-stamped filenames it wrote)."""
        if spark.catalog.tableExists(table):
            return True
        loc = os.path.abspath(os.path.join("spark-warehouse", table))
        if not os.path.isdir(loc):
            return False
        schema = spark.read.parquet(loc).schema
        cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
        )
        spark.sql(
            f"CREATE TABLE {table} ({cols}) USING parquet "
            f"CLUSTERED BY ({bucket_col}) INTO 32 BUCKETS "
            f"LOCATION '{loc}'"
        )
        return True

    if not (_attach("li_bkt_bench", "l_orderkey")
            and _attach("ord_bkt_bench", "o_orderkey")):
        _pytest.skip("run tools/bench_bucketed.py first")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = spark.table("li_bkt_bench").join(
            spark.table("ord_bkt_bench"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        ).groupBy().count()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        tree = plan.split("== Initial Plan ==")[0]
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(l_orderkey" not in tree, plan
        assert "Exchange hashpartitioning(o_orderkey" not in tree, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_merge_rollup_sketch_columns(spark):
    """MergeRollupTask sketch aggregators (DistinctCountHLLAggregator /
    DistinctCountThetaSketchAggregator): merging sealed rows whose
    metric columns hold SERIALIZED sketches unions them per group."""
    from pyspark.sql import functions as F

    from hurricanedb_spark.operators.theta_ds import (
        build_sketch,
        deserialize,
        serialize,
    )

    rows = [
        ("a", bytearray(serialize(build_sketch(list(range(0, 20)), k=1024), 10))),
        ("a", bytearray(serialize(build_sketch(list(range(10, 30)), k=1024), 10))),
        ("b", bytearray(serialize(build_sketch([1, 2], k=1024), 10))),
    ]
    df = spark.createDataFrame(rows, "k string, users binary")
    out = {
        r["k"]: round(deserialize(bytes(r["users"])).estimate())
        for r in merge_rollup(df, ["k"], {"users": "DISTINCTCOUNTTHETASKETCH"}).collect()
    }
    assert out == {"a": 30, "b": 2}

    hll = spark.createDataFrame([(i % 2, i) for i in range(200)], "k int, v int") \
        .groupBy("k").agg(F.hll_sketch_agg("v").alias("users"))
    merged = merge_rollup(hll.withColumn("k", F.lit(0)), ["k"], {"users": "DISTINCTCOUNTHLL"})
    est = merged.select(F.hll_sketch_estimate("users").alias("e")).collect()[0]["e"]
    assert abs(est - 200) / 200 < 0.1


def test_merge_rollup_mixed_families_keeps_null_keyed_groups(spark):
    """A rollup mixing sketch (pandas) and JVM aggregates splits into two
    per-group frames zipped back on the dims; the zip must be null-safe —
    a plain equi-join would silently drop every group whose dimension
    value is NULL (pre-fix regression: the NULL-keyed group vanished)."""
    from pyspark.sql import functions as F

    from hurricanedb_spark.operators.theta_ds import (
        build_sketch,
        deserialize,
        serialize,
    )

    def sk(*vals):
        return bytearray(serialize(build_sketch(list(vals), k=1024), 10))

    rows = [
        ("a", 10, sk(1, 2, 3)),
        ("a", 5, sk(3, 4)),
        (None, 7, sk(1, 9)),
        (None, 2, sk(9, 10, 11)),
    ]
    df = spark.createDataFrame(rows, "k string, hits bigint, users binary")
    out = {
        r["k"]: (r["hits"], round(deserialize(bytes(r["users"])).estimate()))
        for r in merge_rollup(
            df, ["k"], {"hits": "SUM", "users": "DISTINCTCOUNTTHETASKETCH"}
        ).collect()
    }
    assert out == {"a": (15, 4), None: (9, 4)}
