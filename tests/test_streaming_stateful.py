"""applyInPandasWithState custom operator: streaming KMV theta sketch.

The contract under test: after N micro-batches the per-key state equals
the BATCH sketch over the union of all rows — bit-identical arrays, not
approximately-equal estimates — because KMV merge is associative,
commutative and idempotent per value.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from hurricanedb_spark.operators import theta as th
from hurricanedb_spark.streaming.stateful import streaming_theta_distinct

K = 64


@pytest.fixture()
def src_dir():
    d = tempfile.mkdtemp(prefix="hstateful-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _write_batch(spark, d, name, rows):
    spark.createDataFrame(rows, "k string, v long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, name))


def test_streaming_sketch_equals_batch_sketch(spark, src_dir):
    rows1 = [("a", i) for i in range(500)] + [("b", i) for i in range(50)]
    rows2 = [("a", i) for i in range(250, 750)] + [("b", i) for i in range(25)]
    _write_batch(spark, src_dir, "f1", rows1)
    _write_batch(spark, src_dir, "f2", rows2)

    stream = (
        spark.readStream.schema("k string, v long")
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(src_dir + "/*")
    )
    out = streaming_theta_distinct(stream, "k", "v", k=K)
    name = "theta_state_sink"
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    # update mode emits one row per key per touching batch: latest wins
    import pandas as pd  # noqa: F401

    sink = spark.table(name).toPandas()
    latest = sink.groupby("k").apply(
        lambda g: g.iloc[-1], include_groups=False
    )

    batch_df = spark.createDataFrame(rows1 + rows2, "k string, v long")
    batch = {
        r.k: r.sketch
        for r in th.theta_sketch_by_group(batch_df, ["k"], "v", k=K).collect()
    }
    for key in ("a", "b"):
        assert list(latest.loc[key, "sketch"]) == list(batch[key])

    # 750 distinct for a (> K: estimated), 50 for b (< K: exact)
    assert latest.loc["b", "estimate"] == 50.0
    a_est = latest.loc["a", "estimate"]
    assert abs(a_est - 750) / 750 < 0.7  # K=64 -> loose bound, 5 sigma
    assert latest.loc["a", "n_seen"] == 1000 and latest.loc["b", "n_seen"] == 75


def test_streaming_sketch_state_bounded(spark, src_dir):
    _write_batch(spark, src_dir, "f1", [("x", i) for i in range(5_000)])
    stream = spark.readStream.schema("k string, v long").parquet(src_dir + "/*")
    out = streaming_theta_distinct(stream, "k", "v", k=K)
    name = "theta_bound_sink"
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    row = spark.table(name).orderBy(F.desc("n_seen")).collect()[0]
    assert len(row.sketch) == K  # state bounded regardless of input size
    assert abs(row.estimate - 5_000) / 5_000 < 0.7


def test_streaming_sketch_survives_restart(spark, src_dir):
    """Checkpointed state continuity: stop the query, add data, restart
    with the same checkpoint — the resumed state must include the first
    run's contribution (equal to the batch sketch over ALL rows)."""
    import tempfile

    ckpt = tempfile.mkdtemp(prefix="hstateful-ckpt-")
    rows1 = [("a", i) for i in range(400)]
    rows2 = [("a", i) for i in range(200, 600)]
    _write_batch(spark, src_dir, "f1", rows1)

    sink = tempfile.mkdtemp(prefix="hstateful-sink-")

    def run_once():
        # memory sink cannot recover from a checkpoint; foreachBatch can
        stream = spark.readStream.schema("k string, v long").parquet(src_dir + "/*")
        out = streaming_theta_distinct(stream, "k", "v", k=K)
        q = (
            out.writeStream.outputMode("update")
            .foreachBatch(
                lambda bdf, eid: bdf.write.mode("append").parquet(sink)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_once()
    _write_batch(spark, src_dir, "f2", rows2)
    run_once()

    final = spark.read.parquet(sink).orderBy(F.desc("n_seen")).collect()[0]
    batch = th.theta_sketch_by_group(
        spark.createDataFrame(rows1 + rows2, "k string, v long"), ["k"], "v", k=K
    ).collect()[0]
    assert list(final.sketch) == list(batch.sketch)  # state carried over
    assert final.n_seen == 800

    import shutil as _sh

    _sh.rmtree(ckpt, ignore_errors=True)
    _sh.rmtree(sink, ignore_errors=True)
