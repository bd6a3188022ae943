"""Structured Streaming tests — live micro-batch execution of the realtime
semantics (append ingestion, streaming dedup, windowed aggregation, upsert
sink, hybrid view), driven synchronously via availableNow triggers."""

from __future__ import annotations

import datetime
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F, types as T

from hurricanedb_spark.streaming import realtime as rt

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


@pytest.fixture()
def tmp(request):
    d = tempfile.mkdtemp(prefix="hstream-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _rows(n0, n, uid=1, et="click"):
    base = datetime.datetime(2024, 1, 1)
    return [
        (i, base + datetime.timedelta(minutes=i), uid, et, float(i))
        for i in range(n0, n0 + n)
    ]


def test_append_ingestion_immediately_queryable(spark, tmp):
    src, sink, ckpt = f"{tmp}/src", f"{tmp}/sink", f"{tmp}/ckpt"
    _write_batch(spark, src, _rows(0, 5))
    q = rt.start_append_sink(
        rt.read_event_stream(spark, src, SCHEMA), sink, ckpt
    )
    q.awaitTermination(60)
    assert spark.read.parquet(sink).count() == 5

    # new data arrives -> restart availableNow picks up only the delta
    _write_batch(spark, src, _rows(5, 3))
    q2 = rt.start_append_sink(rt.read_event_stream(spark, src, SCHEMA), sink, ckpt)
    q2.awaitTermination(60)
    assert spark.read.parquet(sink).count() == 8  # exactly-once: no re-ingest


def test_streaming_dedup(spark, tmp):
    src, sink, ckpt = f"{tmp}/src", f"{tmp}/sink", f"{tmp}/ckpt"
    rows = _rows(0, 4) + _rows(0, 4)  # duplicated event_ids
    _write_batch(spark, src, rows)
    stream = rt.read_event_stream(spark, src, SCHEMA)
    deduped = rt.streaming_dedup(stream, ["event_id"], "ts", "1 hour")
    q = (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert spark.read.parquet(sink).count() == 4


def test_windowed_aggregation_with_watermark(spark, tmp):
    src = f"{tmp}/src"
    _write_batch(spark, src, _rows(0, 30))
    stream = rt.read_event_stream(spark, src, SCHEMA)
    agg = rt.windowed_counts(stream, "ts", "10 minutes", ["event_type"])
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_counts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    out = spark.sql("SELECT * FROM win_counts ORDER BY window").collect()
    assert len(out) == 3  # 30 minutes / 10-minute tumbling windows
    assert all(r.n == 10 for r in out)


def test_upsert_sink_latest_wins(spark, tmp):
    src, sink, ckpt = f"{tmp}/src", f"{tmp}/sink", f"{tmp}/ckpt"
    base = datetime.datetime(2024, 1, 1)
    _write_batch(
        spark,
        src,
        [
            (1, base, 1, "v1", 1.0),
            (2, base + datetime.timedelta(minutes=1), 1, "v2", 2.0),
            (3, base, 2, "w1", 9.0),
        ],
    )
    q = rt.start_upsert_sink(
        rt.read_event_stream(spark, src, SCHEMA),
        sink,
        ckpt,
        pk=["user_id"],
        cmp_col="ts",
        tiebreak="event_id",
    )
    q.awaitTermination(120)
    out = {r.user_id: r for r in spark.read.parquet(sink).collect()}
    assert len(out) == 2
    assert out[1].event_type == "v2"  # latest ts wins
    assert out[2].event_type == "w1"


def test_hybrid_view_boundary(spark, tmp):
    off, rt_dir = f"{tmp}/off", f"{tmp}/rt"
    base = datetime.datetime(2024, 1, 1)
    _write_batch(spark, off, _rows(0, 10))  # minutes 0-9
    _write_batch(spark, rt_dir, _rows(5, 10))  # minutes 5-14 (overlap 5-9)
    boundary = base + datetime.timedelta(minutes=7)
    view = rt.hybrid_view(
        spark,
        spark.read.parquet(off),
        spark.read.parquet(rt_dir),
        "ts",
        boundary,
    )
    rows = view.collect()
    # offline serves <= minute 7 (8 rows: 0..7), realtime serves > 7 (7 rows: 8..14)
    assert len(rows) == 15
    assert len({r.event_id for r in rows}) == 15  # no duplicates across boundary


def test_partial_upsert_sink_incremental_merge(spark, tmp):
    """Two availableNow passes: the second batch must merge pairwise into
    the accumulated state per column strategy (the reference's
    upsert/merger semantics), not recompute from raw history."""
    src, sink, ckpt = f"{tmp}/src", f"{tmp}/sink", f"{tmp}/ckpt"
    base = datetime.datetime(2024, 1, 1)
    strategies = {"value": "INCREMENT", "event_type": "OVERWRITE"}

    _write_batch(
        spark,
        src,
        [(1, base, 1, "first", 10.0), (2, base + datetime.timedelta(minutes=1), 1, "second", 5.0)],
    )
    q = rt.start_partial_upsert_sink(
        rt.read_event_stream(spark, src, SCHEMA),
        sink, ckpt, pk=["user_id"], cmp_col="ts", strategies=strategies,
    )
    q.awaitTermination(120)
    row = spark.read.parquet(sink).collect()[0]
    assert row.value == 15.0 and row.event_type == "second"

    _write_batch(
        spark, src,
        [(3, base + datetime.timedelta(minutes=2), 1, "third", 2.5),
         (4, base, 2, "other", 1.0)],
    )
    q2 = rt.start_partial_upsert_sink(
        rt.read_event_stream(spark, src, SCHEMA),
        sink, ckpt, pk=["user_id"], cmp_col="ts", strategies=strategies,
    )
    q2.awaitTermination(120)
    out = {r.user_id: r for r in spark.read.parquet(sink).collect()}
    assert len(out) == 2
    assert out[1].value == 17.5  # 10 + 5 + 2.5 accumulated
    assert out[1].event_type == "third"  # overwrite by latest
    assert out[2].value == 1.0 and out[2].event_type == "other"


def test_merge_partial_state_array_strategies(spark):
    from hurricanedb_spark.streaming.realtime import merge_partial_state

    state = spark.createDataFrame(
        [(1, [1, 2], [1, 2], 100)], "pk int, ap array<int>, un array<int>, ts long"
    )
    batch = spark.createDataFrame(
        [(1, [2, 3], [2, 3], 200), (2, [9], [9], 50)],
        "pk int, ap array<int>, un array<int>, ts long",
    )
    out = {
        r.pk: r
        for r in merge_partial_state(
            state, batch, ["pk"], "ts", {"ap": "APPEND", "un": "UNION"},
            batch_schema="state",
        ).collect()
    }
    assert out[1].ap == [1, 2, 2, 3]  # arrival-ordered append
    assert out[1].un == [1, 2, 3]  # sorted distinct union
    assert out[1].ts == 200
    assert out[2].ap == [9] and out[2].un == [9] and out[2].ts == 50


def test_rollup_sink_ingestion_time_aggregation(spark, tmp):
    """MutableSegmentImpl.aggregateMetrics analog: the sink holds one row
    per dimension combo; incremental merge across restarts equals a full
    batch recompute over everything ingested."""
    src, sink, ckpt = f"{tmp}/src", f"{tmp}/rollup", f"{tmp}/ckpt"
    aggs = {"value": "SUM", "event_id": "COUNT"}
    _write_batch(spark, src, _rows(0, 6, uid=1, et="click") + _rows(6, 2, uid=2, et="view"))
    q = rt.start_rollup_sink(
        rt.read_event_stream(spark, src, SCHEMA), sink, ckpt,
        dims=["user_id", "event_type"], aggs=aggs,
    )
    q.awaitTermination(120)
    state = {(r.user_id, r.event_type): (r.value, r.event_id)
             for r in spark.read.parquet(sink).collect()}
    assert state == {(1, "click"): (15.0, 6), (2, "view") : (13.0, 2)}

    # second wave: same dims collapse further, new dim appears
    _write_batch(spark, src, _rows(8, 4, uid=1, et="click") + _rows(12, 1, uid=3, et="error"))
    q2 = rt.start_rollup_sink(
        rt.read_event_stream(spark, src, SCHEMA), sink, ckpt,
        dims=["user_id", "event_type"], aggs=aggs,
    )
    q2.awaitTermination(120)
    got = {(r.user_id, r.event_type): (r.value, r.event_id)
           for r in spark.read.parquet(sink).collect()}
    # full recompute over all 13 ingested rows
    full = spark.read.parquet(src).groupBy("user_id", "event_type").agg(
        F.sum("value").alias("v"), F.count("event_id").alias("n"))
    want = {(r.user_id, r.event_type): (r.v, r.n) for r in full.collect()}
    assert got == want
    assert len(got) == 3  # state is O(distinct dims), not O(rows)


def test_rollup_sink_replayed_epoch_not_double_counted(spark, tmp):
    """foreachBatch is at-least-once: re-delivering already-merged batches
    (same data, restarted epoch numbering from a wiped checkpoint) must not
    double-count SUM/COUNT state — the versioned-state commit protocol
    skips epochs at or below the recorded high-water mark."""
    src, sink, ckpt = f"{tmp}/src", f"{tmp}/rollup", f"{tmp}/ckpt"
    aggs = {"value": "SUM", "event_id": "COUNT"}
    _write_batch(spark, src, _rows(0, 4, uid=1, et="click"))
    q = rt.start_rollup_sink(
        rt.read_event_stream(spark, src, SCHEMA), sink, ckpt,
        dims=["user_id", "event_type"], aggs=aggs,
    )
    q.awaitTermination(120)
    before = spark.read.parquet(sink).collect()

    # wipe the checkpoint: the source replays every file from epoch 0
    shutil.rmtree(ckpt)
    q2 = rt.start_rollup_sink(
        rt.read_event_stream(spark, src, SCHEMA), sink, ckpt,
        dims=["user_id", "event_type"], aggs=aggs,
    )
    q2.awaitTermination(120)
    after = spark.read.parquet(sink).collect()
    assert sorted(map(tuple, after)) == sorted(map(tuple, before))
    assert after[0].value == 6.0  # 0+1+2+3 once, not twice


def test_merge_partial_state_late_batch_respects_cmp(spark):
    """A late-arriving batch (cmp older than accumulated state) must not
    overwrite newer state (reference: records with comparison value below
    the stored one are dropped), and IGNORE must track the earliest record
    by cmp so incremental merge == full recompute."""
    from hurricanedb_spark.streaming.realtime import merge_partial_state

    state = spark.createDataFrame(
        [(1, "newer", "oldest", 200)], "pk int, ow string, ig string, ts long"
    )
    late = spark.createDataFrame(
        [(1, "stale", "earlier", 100), (2, "fresh", "fresh", 50)],
        "pk int, ow string, ig string, ts long",
    )
    out = {
        r.pk: r
        for r in merge_partial_state(
            state, late, ["pk"], "ts",
            {"ow": "OVERWRITE", "ig": "IGNORE"}, batch_schema="state",
        ).collect()
    }
    assert out[1].ow == "newer"    # late batch does not overwrite
    assert out[1].ig == "earlier"  # IGNORE keeps value at smallest cmp
    assert out[1].ts == 200
    assert out[2].ow == "fresh" and out[2].ig == "fresh"


def test_pipeline_is_source_agnostic_rate_source(spark, tmp):
    """The realtime pipeline must not depend on the file source: run the
    same append-sink pipeline from the built-in `rate` source (a stand-in
    for Kafka — same readStream surface, different format string) and
    query the sink immediately (reference claim: rows queryable as soon
    as a micro-batch commits)."""
    sink, ckpt = f"{tmp}/rate_sink", f"{tmp}/rate_ckpt"
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "500")
        .option("numPartitions", "2")
        .load()
        .withColumnsRenamed({"timestamp": "ts", "value": "event_id"})
        .withColumn("user_id", F.col("event_id") % 10)
        .withColumn("event_type", F.lit("rate"))
        .withColumn("value", F.col("event_id").cast("double"))
    )
    import time

    q = rt.start_append_sink(
        stream, sink, ckpt, trigger={"processingTime": "500 milliseconds"}
    )
    try:
        deadline = time.time() + 60
        n = 0
        while time.time() < deadline:
            time.sleep(1.5)
            try:
                n = spark.read.parquet(sink).count()
            except Exception:
                n = 0  # sink not yet created
            if n > 0:
                break
    finally:
        q.stop()
    assert n > 0
    out = spark.read.parquet(sink)
    assert set(out.columns) >= {"ts", "event_id", "user_id", "event_type", "value"}


def test_kafka_source_same_pipeline(spark, tmp):
    """Kafka end-to-end: produce JSON events to an embedded broker, read
    through rt.read_kafka_stream, drain via the SAME append-sink pipeline
    the file and rate sources use, and query the sink. Gated on the
    pieces this container lacks (kafka client, testcontainers, the
    spark-sql-kafka connector jar); where they exist the test activates
    unchanged, which is the point: the swap is the format string."""
    pytest.importorskip("kafka", reason="kafka-python client not installed")
    tc = pytest.importorskip(
        "testcontainers.kafka", reason="testcontainers not installed"
    )
    # the connector jar must be on the Spark classpath
    try:
        spark.readStream.format("kafka").option(
            "kafka.bootstrap.servers", "localhost:1"
        ).option("subscribe", "probe").load()
    except Exception as e:  # noqa: BLE001
        if "Failed to find data source: kafka" in str(e):
            pytest.skip("spark-sql-kafka connector not on classpath")
        raise

    import json

    from kafka import KafkaProducer

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    with tc.KafkaContainer() as broker:
        servers = broker.get_bootstrap_server()
        producer = KafkaProducer(
            bootstrap_servers=servers,
            value_serializer=lambda v: json.dumps(v).encode(),
        )
        for i in range(20):
            producer.send(
                "events", {"event_id": i, "user_id": i % 4, "value": float(i)}
            )
        producer.flush()
        stream = rt.read_kafka_stream(spark, servers, "events", schema)
        sink, ckpt = f"{tmp}/kafka_sink", f"{tmp}/kafka_ckpt"
        q = rt.start_append_sink(stream, sink, ckpt)
        q.awaitTermination(60)
        got = spark.read.parquet(sink)
        assert got.count() == 20
        assert got.agg(F.countDistinct("user_id")).collect()[0][0] == 4


def test_rollup_sink_sketch_metrics(spark, tmp):
    """Ingestion-time sketch aggregation (AggregationConfig distinct-count
    functions; aggregator analogs DistinctCountHLLAggregator /
    DistinctCountThetaSketchAggregator): the state column stores
    SERIALIZED sketches, incremental merge across restarts equals a full
    recompute, and the stored bytes answer through the SQL surface's
    BYTES type-dispatch."""
    from hurricanedb_spark.operators.theta_ds import deserialize
    from hurricanedb_spark.sql.dialect import HurricaneSQL

    src, sink, ckpt = f"{tmp}/src", f"{tmp}/rollup", f"{tmp}/ckpt"
    aggs = {"user_id": "DISTINCTCOUNTTHETASKETCH", "event_id": "DISTINCTCOUNTHLL"}
    _write_batch(spark, src, _rows(0, 5, uid=1) + _rows(5, 3, uid=2))
    q = rt.start_rollup_sink(
        rt.read_event_stream(spark, src, SCHEMA), sink, ckpt,
        dims=["event_type"], aggs=aggs,
    )
    q.awaitTermination(120)
    # second wave: new user, overlapping event ids not possible (ids
    # advance) — distinct users should reach 3
    _write_batch(spark, src, _rows(8, 4, uid=3))
    q2 = rt.start_rollup_sink(
        rt.read_event_stream(spark, src, SCHEMA), sink, ckpt,
        dims=["event_type"], aggs=aggs,
    )
    q2.awaitTermination(120)
    rows = spark.read.parquet(sink).collect()
    assert len(rows) == 1  # one dim combo
    sk = deserialize(bytes(rows[0]["user_id"]))
    assert round(sk.estimate()) == 3  # exact below nominalEntries
    # HLL state merges to ~12 distinct event ids
    spark.read.parquet(sink).createOrReplaceTempView("rollup_state_t")
    est = spark.sql(
        "SELECT hll_sketch_estimate(event_id) AS e FROM rollup_state_t"
    ).collect()[0]["e"]
    assert abs(est - 12) / 12 < 0.1
    # ...and the Pinot SQL surface type-dispatches the BYTES columns
    # (theta and HLL queried separately: Spark cannot place a grouped-agg
    # pandas UDF beside JVM aggregates in one SELECT — loud
    # INVALID_PANDAS_UDF_PLACEMENT, documented in _theta_bytes_rewrite)
    h = HurricaneSQL(spark)
    du = h.sql(
        "SELECT distinctCountThetaSketch(user_id) AS du FROM rollup_state_t",
        default_limit=None,
    ).collect()[0]["du"]
    de = h.sql(
        "SELECT distinctCountHLL(event_id) AS de FROM rollup_state_t",
        default_limit=None,
    ).collect()[0]["de"]
    assert du == 3 and abs(de - 12) / 12 < 0.1


def test_rollup_aggregate_keeps_null_dimension_groups(spark):
    """_split_grouped_agg zips the JVM- and pandas-aggregate frames back
    on the dims; the zip must be null-safe — the pre-fix equi-join
    silently dropped every NULL-keyed dimension group from the rollup."""
    from hurricanedb_spark.operators.theta_ds import deserialize
    from hurricanedb_spark.streaming.realtime import (
        _rollup_aggregate,
        _rollup_merge,
    )

    df = spark.createDataFrame(
        [("a", 1, 100), ("a", 2, 100), (None, 3, 7), (None, 3, 8)],
        "dim string, user_id int, hits bigint",
    )
    aggs = {"user_id": "DISTINCTCOUNTTHETASKETCH", "hits": "SUM"}
    state = _rollup_aggregate(df, ["dim"], aggs)
    got = {
        r["dim"]: (round(deserialize(bytes(r["user_id"])).estimate()), r["hits"])
        for r in state.collect()
    }
    assert got == {"a": (2, 200), None: (1, 15)}
    # the merge step zips the same way — NULL groups must survive it too
    merged = _rollup_merge(state, state, ["dim"], aggs)
    got2 = {
        r["dim"]: (round(deserialize(bytes(r["user_id"])).estimate()), r["hits"])
        for r in merged.collect()
    }
    assert got2 == {"a": (2, 400), None: (1, 30)}


def test_rollup_theta_hash_space_stable_across_null_batches(spark):
    """An int metric column hashes as LONG in every micro-batch, whether
    or not the batch carries NULLs: pre-fix, a NULL-bearing batch
    arrived as float64 and its values sketched as doubles — sketches
    from NULL-bearing and NULL-free batches of the same column never
    merged correctly (the union double-counted every shared value)."""
    from hurricanedb_spark.operators.theta_ds import deserialize
    from hurricanedb_spark.streaming.realtime import (
        _rollup_aggregate,
        _rollup_merge,
    )

    aggs = {"user_id": "DISTINCTCOUNTTHETASKETCH"}
    clean = spark.createDataFrame(
        [("a", i) for i in range(10)], "dim string, user_id bigint"
    )
    with_nulls = spark.createDataFrame(
        [("a", i) for i in range(5, 15)] + [("a", None)],
        "dim string, user_id bigint",
    )
    s1 = _rollup_aggregate(clean, ["dim"], aggs)
    s2 = _rollup_aggregate(with_nulls, ["dim"], aggs)
    merged = _rollup_merge(s1, s2, ["dim"], aggs).collect()[0]
    # union of {0..9} and {5..14} = 15 distinct (pre-fix: 20)
    assert round(deserialize(bytes(merged["user_id"])).estimate()) == 15
