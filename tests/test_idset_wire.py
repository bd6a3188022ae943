"""Pinot IdSet wire format (round-13) — byte parity with the REAL jars
and engine integration.

The reference serializes ID_SET() results / IN_SUBQUERY literals as a
1-byte type tag + roaring / roaring64 / guava-bloom payload
(pinot-core/.../query/utils/idset/). tools/java/SegmentLibGolden.java
reconstructs IdSet.toBytes with the same guava-33.4.8 and
RoaringBitmap-1.3.0 calls the reference's thin wrappers make; the
"idset" fixture section pins our encoder byte-for-byte and records
membership verdicts from the real structures. A literal produced by
this engine round-trips through a real reference deployment and vice
versa — the previous JSON literal did not."""

from __future__ import annotations

import base64
import json
import os
import sys

import pytest

from hurricanedb_spark.operators.idset_wire import (
    TYPE_BLOOM,
    TYPE_EMPTY,
    TYPE_ROARING,
    TYPE_ROARING64,
    decode_idset,
    encode_idset,
)

_FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "reallib_segment_golden.json"
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from gen_reallib_segment_golden import idset_cases  # noqa: E402


@pytest.fixture(scope="module")
def fixture():
    with open(_FIXTURE, encoding="utf-8") as f:
        return json.load(f)


def test_idset_bytes_identical_to_real_libraries(fixture):
    cases = idset_cases()
    rows = {r["name"]: r for r in fixture["idset"]}
    assert set(rows) == set(cases)
    for name, (dtype, th, ins, fpp, vals, _m, _a) in cases.items():
        r = rows[name]
        assert r["py_equal"], name  # capture-time verdict
        blob = encode_idset(
            vals, dtype,
            size_threshold_in_bytes=th,
            expected_insertions=ins,
            fpp=fpp,
        )
        assert blob == bytes.fromhex(r["hex"]), name


def test_idset_membership_matches_real_structures(fixture):
    """decode_idset over the REAL bytes answers exactly what the real
    RoaringBitmap / Roaring64NavigableMap / BloomFilter answered for
    every probe (members AND absent probes — for blooms the absent
    verdicts pin that false-positive behavior matches bit-for-bit)."""
    import numpy as np

    cases = idset_cases()
    for r in fixture["idset"]:
        dtype = r["dtype"]
        ids = decode_idset(bytes.fromhex(r["hex"]))
        _d, _t, _i, _f, _v, members, absents = cases[r["name"]]
        probes = list(members) + list(absents)
        assert len(probes) == len(r["probes"])
        for value, p in zip(probes, r["probes"]):
            assert ids.contains(value, dtype) == p["contains"], (
                r["name"],
                value,
            )


def test_idset_type_dispatch_and_edges():
    # INT -> roaring; LONG -> roaring64; STRING -> bloom; empty -> EMPTY
    assert encode_idset([1], "INT")[0] == TYPE_ROARING
    assert encode_idset([1], "LONG")[0] == TYPE_ROARING64
    assert encode_idset(["x"], "STRING", expected_insertions=10)[0] == TYPE_BLOOM
    assert encode_idset([], "INT") == bytes([TYPE_EMPTY])
    # sizeThreshold <= 0 forces bloom even for INT (IdSets.java:60-63)
    assert (
        encode_idset([1, 2], "INT", size_threshold_in_bytes=0,
                     expected_insertions=10)[0]
        == TYPE_BLOOM
    )
    # exact-set-over-threshold converts to bloom (IdSets merge bound)
    big = encode_idset(
        list(range(5000)), "INT",
        size_threshold_in_bytes=512, expected_insertions=10_000,
    )
    assert big[0] == TYPE_BLOOM
    s = decode_idset(big)
    assert s.contains(100, "INT") and not s.contains(999_999, "INT")
    # EMPTY contains nothing; bloom has no enumerable values
    assert not decode_idset(bytes([TYPE_EMPTY])).contains(1)
    with pytest.raises(ValueError, match="enumerable"):
        s.values()


def test_id_set_in_id_set_sql_and_python_paths(spark):
    from pyspark.sql import functions as F

    from hurricanedb_spark.sql.dialect import rewrite_functions
    from hurricanedb_spark.sql.idset import id_set, in_id_set

    # LONG column -> roaring64 literal -> IN-list plan (python API)
    inner = spark.createDataFrame(
        [(1 << 40,), (7,), (None,)], "k bigint"
    )
    lit = id_set(inner, "k")
    assert base64.b64decode(lit)[0] == TYPE_ROARING64
    outer = spark.createDataFrame(
        [(1 << 40, "hi"), (7, "lo"), (8, "no")], "k bigint, v string"
    )
    got = sorted(
        r.v for r in outer.filter(in_id_set(F.col("k"), lit)).collect()
    )
    assert got == ["hi", "lo"]
    # SQL surface: a wire literal inside inIdSet() becomes an IN list
    sql = rewrite_functions(f"SELECT inidset(k, '{lit}') FROM t")
    assert " IN (" in sql and "7" in sql
    # STRING column -> bloom literal -> pandas-UDF probe, approximate
    # with fpp but NO false negatives
    sinner = spark.createDataFrame(
        [("alpha",), ("héllo",), (None,)], "s string"
    )
    slit = id_set(sinner, "s", expected_insertions=100, fpp=0.01)
    assert base64.b64decode(slit)[0] == TYPE_BLOOM
    souter = spark.createDataFrame(
        [("alpha",), ("héllo",), ("zzz-not-there",)], "s string"
    )
    rows = souter.filter(in_id_set(F.col("s"), slit)).collect()
    vals = {r.s for r in rows}
    assert {"alpha", "héllo"} <= vals and len(vals) <= 3
    # SQL bloom path routes through a per-literal probe UDF (closure
    # registration when a session is active; inidsetblob fallback)
    sql2 = rewrite_functions(f"SELECT inidset(s, '{slit}') FROM t")
    assert "__inidset_" in sql2 or "inidsetblob" in sql2
    from hurricanedb_spark.functions.registry import register_all

    register_all(spark)
    souter.createOrReplaceTempView("idw_souter")
    n = spark.sql(
        rewrite_functions(
            f"SELECT count(*) AS n FROM idw_souter "
            f"WHERE inidset(s, '{slit}')"
        )
    ).collect()[0]["n"]
    assert n >= 2


def test_in_id_set_large_exact_set_uses_probe(spark):
    """>1000-id exact sets avoid megabyte IN-list SQL strings: the
    rewrite emits the Arrow-batched probe instead, same answers."""
    from hurricanedb_spark.sql.dialect import rewrite_functions
    from hurricanedb_spark.sql.idset import id_set

    inner = spark.range(0, 5000, 2).selectExpr("CAST(id AS INT) AS k")
    lit = id_set(inner, "k")
    sql = rewrite_functions(f"SELECT inidset(k, '{lit}') FROM t")
    assert ("__inidset_" in sql or "inidsetblob" in sql) and " IN (" not in sql
    from hurricanedb_spark.functions.registry import register_all

    register_all(spark)
    spark.range(0, 10).selectExpr(
        "CAST(id AS INT) AS k"
    ).createOrReplaceTempView("idw_big_outer")
    got = sorted(
        r.k
        for r in spark.sql(
            rewrite_functions(
                f"SELECT k FROM idw_big_outer WHERE inidset(k, '{lit}')"
            )
        ).collect()
    )
    assert got == [0, 2, 4, 6, 8]


def test_idset_sql_aggregate_emits_wire_string(spark):
    """The SQL idSet() aggregate returns the reference's base64 wire
    string (IdSetAggregationFunction semantics) — decodable by
    decode_idset AND by inIdSet in a follow-up query; the 2-arg params
    form tunes the bloom degradation (sizeThresholdInBytes=0 forces
    BLOOM_FILTER like IdSets.create)."""
    from hurricanedb_spark.functions.registry import register_all
    from hurricanedb_spark.sql.dialect import rewrite_functions

    register_all(spark)
    spark.createDataFrame(
        [(1, 10), (1, 12), (2, 10), (2, None)], "g int, v bigint"
    ).createOrReplaceTempView("idw_agg_t")
    rows = spark.sql(
        rewrite_functions(
            "SELECT g, idset(v) AS s FROM idw_agg_t GROUP BY g ORDER BY g"
        )
    ).collect()
    blob1 = base64.b64decode(rows[0]["s"])
    assert blob1[0] == TYPE_ROARING64  # bigint -> Roaring64
    assert sorted(decode_idset(blob1).values()) == [10, 12]
    assert sorted(decode_idset(base64.b64decode(rows[1]["s"])).values()) == [10]
    # params form: forced bloom
    r2 = spark.sql(
        rewrite_functions(
            "SELECT idset(v, 'sizeThresholdInBytes=0;"
            "expectedInsertions=100;fpp=0.01') AS s FROM idw_agg_t"
        )
    ).collect()[0]
    b2 = base64.b64decode(r2["s"])
    assert b2[0] == TYPE_BLOOM
    ids = decode_idset(b2)
    assert ids.contains(10, "LONG") and not ids.contains(999, "LONG")


def test_idset_two_phase_bytes_match_single_phase(spark):
    """idSet() restructures through the partial->merge framework
    (MapInArrow partials over the data, merged blobs in the exchange —
    the reference's IdSetAggregationFunction + IdSets.merge contract);
    the wire bytes are identical to the single-phase grouped agg, and
    the params form rides through (forced-bloom partials bit-OR)."""
    from hurricanedb_spark.sql.dialect import HurricaneSQL

    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(13)
    pdf = pd.DataFrame(
        {
            "g": rng.choice(["a", "b"], size=2000),
            "v": rng.integers(0, 5000, size=2000),
        }
    )
    h = HurricaneSQL(spark)
    h.register(
        "idw_tp",
        spark.createDataFrame(pdf).selectExpr("g", "CAST(v AS BIGINT) AS v"),
    )
    q = "SELECT g, idset(v) AS s FROM idw_tp GROUP BY g ORDER BY g"
    df = h.sql(q, default_limit=None)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "MapInArrow" in plan and "ArrowAggregatePython" not in plan
    rows = {r["g"]: r["s"] for r in df.collect()}
    # ground truth: the single-phase grouped-agg macro, expanded direct
    from hurricanedb_spark.functions.registry import register_all
    from hurricanedb_spark.sql.dialect import rewrite_functions

    register_all(spark)
    single = {
        r["g"]: r["s"]
        for r in spark.sql(rewrite_functions(q)).collect()
    }
    assert rows == single
    for g, s in rows.items():
        blob = base64.b64decode(s)
        assert blob[0] == TYPE_ROARING64
        want = sorted(
            int(v) for v in pdf.loc[pdf["g"] == g, "v"].unique()
        )
        assert sorted(decode_idset(blob).values()) == want
    # params form (forced bloom) two-phase == single-phase bytes
    q2 = (
        "SELECT g, idset(v, 'sizeThresholdInBytes=0;"
        "expectedInsertions=4000;fpp=0.02') AS s "
        "FROM idw_tp GROUP BY g ORDER BY g"
    )
    df2 = h.sql(q2, default_limit=None)
    plan2 = df2._sc._jvm.PythonSQLUtils.explainString(
        df2._jdf.queryExecution(), "formatted"
    )
    assert "MapInArrow" in plan2
    rows2 = {r["g"]: r["s"] for r in df2.collect()}
    single2 = {
        r["g"]: r["s"] for r in spark.sql(rewrite_functions(q2)).collect()
    }
    assert rows2 == single2
    assert base64.b64decode(rows2["a"])[0] == TYPE_BLOOM


def test_idset_exact_longs_past_2_53_with_nulls(spark):
    """Round-13 ADVICE: a null-bearing LONG Arrow batch degrades to
    float64 in pandas, silently rounding ids past 2^53 BEFORE the UDF
    runs. idSet() must still encode the EXACT longs (membership is the
    whole point of an IdSet) — the decimal-string channel added to both
    the single-phase grouped agg and the two-phase partial build is
    lossless. Pinned on adjacent huge ids whose float64 images collide."""
    from hurricanedb_spark.functions.registry import register_all
    from hurricanedb_spark.sql.dialect import HurricaneSQL, rewrite_functions

    register_all(spark)
    big = 2**61 + 12345  # float64 rounds this to a multiple of 256
    ids = [big, big + 1, -(2**60) - 7]
    rows = [("a", v) for v in ids] + [("a", None), ("b", None)]
    spark.createDataFrame(rows, "g string, v bigint").createOrReplaceTempView(
        "idw_big_t"
    )
    q = "SELECT g, idset(v) AS s FROM idw_big_t GROUP BY g ORDER BY g"
    # single-phase grouped agg (the non-restructured macro)
    single = spark.sql(rewrite_functions(q)).collect()
    got = sorted(
        v - (1 << 64) if v >= 1 << 63 else v
        for v in decode_idset(base64.b64decode(single[0]["s"])).values()
    )
    assert got == sorted(ids)
    # the all-null group still yields the EMPTY IdSet
    assert decode_idset(base64.b64decode(single[1]["s"])).values() == []
    # two-phase partial->merge build (the restructured dialect path)
    h = HurricaneSQL(spark)
    two = h.sql(q, default_limit=None).collect()
    assert [r["s"] for r in two] == [r["s"] for r in single]


def test_inidset_no_session_fallback_refuses_large_literal():
    """Round-13 verdict #3: with no active session the inIdSet rewrite
    used to pass the literal as a UDF argument — the measured per-row
    Arrow materialization pathology. Small literals still work; past
    1KB it must refuse loudly, naming the closure registration path."""
    from hurricanedb_spark.operators.idset_wire import encode_idset
    from hurricanedb_spark.sql.dialect import _register_inidset_probe

    small = base64.b64encode(encode_idset([1, 2, 3], "LONG")).decode()
    big = base64.b64encode(
        encode_idset(list(range(0, 500000, 3)), "LONG")
    ).decode()
    assert len(big) > 1024
    from unittest import mock

    from pyspark.sql import SparkSession

    with mock.patch.object(
        SparkSession, "getActiveSession", staticmethod(lambda: None)
    ):
        assert "inidsetblob" in _register_inidset_probe("c", small)
        with pytest.raises(ValueError, match="_register_inidset_probe"):
            _register_inidset_probe("c", big)


def test_exact_wire_size_matches_encoder():
    """The streaming accumulator's conversion trigger must agree with
    encode_idset's `len(blob) > threshold` byte-for-byte — pin the size
    formula against real encodes across container shapes (array,
    bitmap, multi-container, multi-bucket, negative ids)."""
    import numpy as np

    from hurricanedb_spark.operators.idset_wire import (
        encode_idset,
        exact_wire_size,
    )

    rng = np.random.default_rng(14)
    cases = [
        ("INT", [1, 2, 3]),
        ("INT", list(range(5000))),  # bitmap container
        ("INT", [int(v) for v in rng.integers(-(2**31), 2**31, 3000)]),
        ("INT", [0, 65536, 131072, -1]),  # one id per container
        ("LONG", [10, 12]),
        ("LONG", [int(v) for v in rng.integers(-(2**62), 2**62, 2000)]),
        ("LONG", list(range(0, 300000, 3))),  # dense single bucket
        ("LONG", [(i << 33) | 5 for i in range(50)]),  # many buckets
    ]
    for dtype, vals in cases:
        blob = encode_idset(
            vals, dtype, size_threshold_in_bytes=1 << 40
        )  # huge threshold: force the exact form
        assert exact_wire_size(set(vals), dtype) == len(blob), (
            dtype,
            len(vals),
        )


def test_idset_accumulator_incremental_conversion():
    """Round-13 verdict #6: the accumulator converts exact->bloom the
    moment the running set's wire size crosses the threshold, bounding
    the state; emitted bytes are identical to a one-shot encode_idset
    regardless of where the conversion landed or the chunking."""
    import numpy as np

    from hurricanedb_spark.operators.idset_wire import (
        IdSetAccumulator,
        TYPE_BLOOM,
        TYPE_ROARING64,
        encode_idset,
        exact_wire_size,
    )

    rng = np.random.default_rng(7)
    ids = [int(v) for v in rng.integers(-(2**62), 2**62, 6000)]
    th = exact_wire_size(set(ids[:3000]), "LONG") + 1  # crosses mid-stream
    one_shot = encode_idset(
        ids, "LONG", size_threshold_in_bytes=th,
        expected_insertions=10000, fpp=0.03,
    )
    assert one_shot[0] == TYPE_BLOOM  # the full set exceeds th
    acc = IdSetAccumulator(
        "LONG", size_threshold_in_bytes=th,
        expected_insertions=10000, fpp=0.03,
    )
    converted_at = None
    for i in range(0, len(ids), 500):
        acc.add(np.asarray(ids[i : i + 500], dtype=np.int64))
        if converted_at is None and acc._bloom is not None:
            converted_at = i + 500
            # state collapsed BEFORE all ids were folded
            assert acc._vals is None
    assert converted_at is not None and converted_at < len(ids)
    assert acc.emit() == one_shot
    # an under-threshold group never converts and keeps exact bytes
    small = ids[:100]
    acc2 = IdSetAccumulator("LONG", size_threshold_in_bytes=1 << 22)
    acc2.add(np.asarray(small, dtype=np.int64))
    blob2 = acc2.emit()
    assert blob2[0] == TYPE_ROARING64
    assert blob2 == encode_idset(small, "LONG", size_threshold_in_bytes=1 << 22)
    # empty stays EMPTY even for bloom-typed dtypes
    acc3 = IdSetAccumulator("STRING")
    assert acc3.emit() == b"\x00"


def test_bloom_funnel_handles_negative_ids():
    """numpy-2 latent defect found by the accumulator fuzz: np.int32 /
    np.int64 of a masked (positive) image of a negative id raised
    OverflowError, so bloom encodes over negative INT/LONG ids crashed.
    The funnel must feed guava's little-endian two's complement."""
    for dtype, ids in (("INT", [-1, -(2**31), 5]), ("LONG", [-1, -(2**63), 5])):
        blob = encode_idset(
            ids, dtype, size_threshold_in_bytes=0, expected_insertions=10
        )
        assert blob[0] == TYPE_BLOOM
        s = decode_idset(blob)
        for v in ids:
            assert s.contains(v, dtype), (dtype, v)


def test_inidset_probe_exact_past_2_53_with_null_probe_column(spark):
    """Round-14: the PROBE side of the float64-degrade hazard — a
    null-bearing LONG probe column arrives rounded, so adjacent huge
    ids collide and a numeric isin returns false positives. Round-15:
    the session path probes through an ARROW scalar UDF whose batch
    carries exact int64 + validity bitmap, so membership stays exact
    for EVERY set with no CAST channel in the emitted SQL."""
    from hurricanedb_spark.functions.registry import register_all
    from hurricanedb_spark.operators.idset_wire import encode_idset
    from hurricanedb_spark.sql.dialect import rewrite_functions

    register_all(spark)
    big = 2**61 + 256  # float64-exact boundary: +256 is representable,
    members = [big] + list(range(2000))  # >1000 ids -> probe UDF path
    lit = base64.b64encode(encode_idset(members, "LONG")).decode()
    sql = rewrite_functions(f"inidset(v, '{lit}')")
    assert "__inidset_" in sql and " IN (" not in sql
    # big+1 and big+255 round to big's float64 image but are NOT members
    rows = [(big, True), (big + 1, False), (big + 255, False),
            (5, True), (2001, False), (None, False)]
    spark.createDataFrame(
        [(v,) for v, _ in rows], "v bigint"
    ).createOrReplaceTempView("idw_probe_big")
    got = spark.sql(
        f"SELECT v, {rewrite_functions(f'''inidset(v, '{lit}')''')} AS m "
        "FROM idw_probe_big"
    ).collect()
    want = {v: m for v, m in rows}
    for r in got:
        assert r["m"] == want[r["v"]], (r["v"], r["m"])
    # a huge-id-free set keeps the numeric fast path: no cast emitted
    lit2 = base64.b64encode(
        encode_idset(list(range(2000)), "LONG")
    ).decode()
    sql2 = rewrite_functions(f"inidset(v, '{lit2}')")
    assert "CAST" not in sql2


def test_roaring64_vectorized_paths_differential():
    """Round-14 scale paths: hashed/random longs put ~1 id per high-32
    bucket, so encode/decode were per-bucket python loops (10.9s/127s
    for a 400k-id 9MB set — the decode slice was O(n^2) bytes). The
    batch scatter/gather fast paths must be byte-identical to the
    per-bucket loop across bucket shapes: random, same-high32
    multi-container collisions, dense bitmap-container buckets, and
    negative ids (0xFFFFFFFF keys sort last)."""
    import struct

    import numpy as np

    import hurricanedb_spark.operators.idset_wire as iw
    from hurricanedb_spark.sources.pinot_segment import roaring_serialize

    def loop_encode(values):
        u = np.unique(iw._as_uint64(values))
        highs = (u >> np.uint64(32)).astype(np.uint32)
        lows = (u & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        bounds = np.flatnonzero(np.diff(highs)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(u)]))
        out = [bytes([TYPE_ROARING64]), b"\x00", struct.pack(">i", len(starts))]
        for s, e in zip(starts, ends):
            out.append(struct.pack(">I", int(highs[s])))
            out.append(roaring_serialize(lows[s:e], run_optimize=False))
        return b"".join(out)

    for trial in range(10):
        r = np.random.default_rng(1400 + trial)
        vals = r.integers(-(1 << 62), 1 << 62, int(r.integers(1, 6000)))
        if trial % 3 == 0:  # same-high32, different 16-bit containers
            vals = np.concatenate([vals, vals + (1 << 17), vals + 3])
        if trial % 4 == 0:  # dense bucket -> bitmap containers
            vals = np.concatenate([vals, np.arange(150000) + (7 << 32)])
        blob = iw._encode_roaring64(vals)
        assert blob == loop_encode(vals), trial
        got = np.sort(decode_idset(bytes(blob)).values())
        assert np.array_equal(got, np.unique(vals.astype(np.uint64))), trial
    # n-way merge == one-shot encode over the union (all-exact path)
    r = np.random.default_rng(77)
    a = r.integers(0, 1 << 62, 40_000)
    blob = encode_idset(a, "LONG", size_threshold_in_bytes=1 << 31)
    parts = [
        encode_idset(a[i::5], "LONG", size_threshold_in_bytes=1 << 31)
        for i in range(5)
    ]
    from hurricanedb_spark.operators.idset_wire import merge_idset_blobs_many

    assert merge_idset_blobs_many(parts, 1 << 31) == blob


def test_inidset_bloom_long_false_negative_channel(spark):
    """Round-15: the LONG-bloom probe residual (r14 COVERAGE.md /
    verdict missing #1). A null-bearing LONG probe column degrades to
    float64 in the Arrow batch; a rounded id past 2^53 then hashes
    DIFFERENT funnel bytes, so a genuine member probed FALSE — a bloom
    contract allows false positives, never false negatives
    (BloomFilterIdSet.java contains). LONG-funnel blooms now emit the
    two-column probe: every inserted id must probe TRUE even when the
    batch carries nulls."""
    from hurricanedb_spark.functions.registry import register_all
    from hurricanedb_spark.sql.dialect import rewrite_functions

    register_all(spark)
    members = [2**61 + 256, 2**60 + 1024, -(2**61) - 7, 5]
    lit = base64.b64encode(
        encode_idset(
            members, "LONG", size_threshold_in_bytes=0,
            expected_insertions=1000,
        )
    ).decode()
    assert decode_idset(base64.b64decode(lit)).type_id == TYPE_BLOOM
    sql = rewrite_functions(f"inidset(v, '{lit}')")
    assert "__inidset_" in sql
    rows = [(m,) for m in members] + [(None,)]
    spark.createDataFrame(rows, "v bigint").createOrReplaceTempView(
        "idw_bloom_fn"
    )
    got = {
        r["v"]: r["m"]
        for r in spark.sql(
            f"SELECT v, {sql} AS m FROM idw_bloom_fn"
        ).collect()
    }
    for m in members:
        assert got[m] is True, m  # the false-negative assertion
    assert got[None] is False


def test_inidset_bloom_double_column_keeps_raw_bits_route(spark):
    """A genuine DOUBLE column against a DOUBLE-built bloom (shares
    FUNNEL_LONG on the wire) must keep the reference's raw-bits DOUBLE
    dispatch through the round-15 ARROW probe: the batch arrives as
    float64 and probe_arrow routes it through probe_series's bloom
    branch, hashing the DOUBLE funnel bytes directly."""
    from hurricanedb_spark.functions.registry import register_all
    from hurricanedb_spark.sql.dialect import rewrite_functions

    register_all(spark)
    members = [1.5, -0.25, 1e300, 3.0]
    lit = base64.b64encode(
        encode_idset(
            members, "DOUBLE", size_threshold_in_bytes=0,
            expected_insertions=1000,
        )
    ).decode()
    sql = rewrite_functions(f"inidset(v, '{lit}')")
    assert "__inidset_" in sql
    rows = [(m,) for m in members] + [(None,), (2.5,)]
    spark.createDataFrame(rows, "v double").createOrReplaceTempView(
        "idw_bloom_dbl"
    )
    got = {
        r["v"]: r["m"]
        for r in spark.sql(
            f"SELECT v, {sql} AS m FROM idw_bloom_dbl"
        ).collect()
    }
    for m in members:
        assert got[m] is True, m
    assert got[None] is False


def test_probe_series_pair_dispatch_and_funnel_parity():
    """probe_series_pair unit semantics: integer batches never touch
    the string column (numeric fast path); degraded float batches parse
    the string image and must agree with the golden-pinned
    contains(id, 'LONG') funnel path per id; object batches (a genuine
    STRING column — the CAST was an identity) keep the single-series
    STRING-funnel semantics."""
    import numpy as np
    import pandas as pd

    from hurricanedb_spark.operators.idset_wire import (
        needs_exact_channel,
        probe_series,
        probe_series_pair,
    )

    members = [2**61 + 256, 2**53 + 1, -(2**62) + 9, 42]
    blob = encode_idset(
        members, "LONG", size_threshold_in_bytes=0, expected_insertions=500
    )
    lit = base64.b64encode(blob).decode()
    ids = decode_idset(blob)
    assert needs_exact_channel(ids)
    probes = members + [2**61 + 257, 7]
    # integer batch: string column deliberately poisoned — must not be read
    s_num = pd.Series(np.asarray(probes, dtype=np.int64))
    s_bad = pd.Series(["poison"] * len(probes))
    got_int = probe_series_pair(s_num, s_bad, lit)
    want = [ids.contains(v, "LONG") for v in probes]
    assert list(got_int) == want
    assert all(want[: len(members)])  # members never false-negative
    # degraded float batch: values rounded, strings carry the truth
    s_f = pd.Series(np.asarray(probes, dtype=np.int64)).astype("float64")
    s_f[2] = None
    s_str = pd.Series([str(v) for v in probes])
    s_str[2] = None
    got_f = list(probe_series_pair(s_f, s_str, lit))
    assert got_f[2] is False or got_f[2] == False  # noqa: E712 — null row
    for i, v in enumerate(probes):
        if i != 2:
            assert got_f[i] == ids.contains(v, "LONG"), v
    # object batch (genuine STRING column): single-series semantics
    s_obj = pd.Series([str(v) for v in probes])
    assert list(probe_series_pair(s_obj, s_obj, lit)) == list(
        probe_series(s_obj, lit)
    )
    # exact-channel gate vectorization: huge-free exact sets decline
    small = decode_idset(encode_idset(list(range(100)), "LONG"))
    assert not needs_exact_channel(small)
    # INT-funnel blooms decline (id space is float64-exact)
    int_bloom = decode_idset(
        encode_idset([1, 2], "INT", size_threshold_in_bytes=0,
                     expected_insertions=100)
    )
    assert not needs_exact_channel(int_bloom)


def test_in_id_set_dataframe_api_exact_channel(spark):
    """The DataFrame-API in_id_set had the same degraded-probe hazard
    for LARGE exact sets (>1000 ids -> probe UDF) and blooms as the SQL
    surface: a null-bearing LONG column arrived float64-rounded.
    Round-15 routes both through the two-column probe."""
    from pyspark.sql import functions as F

    from hurricanedb_spark.sql.idset import in_id_set

    big = 2**61 + 256
    members = [big] + list(range(2000))
    lit = base64.b64encode(encode_idset(members, "LONG")).decode()
    df = spark.createDataFrame(
        [(big,), (big + 1,), (5,), (None,)], "v bigint"
    )
    got = {
        r["v"]: r["m"]
        for r in df.select("v", in_id_set(F.col("v"), lit).alias("m")).collect()
    }
    assert got[big] is True and got[5] is True
    assert got[big + 1] is False  # the rounded-collision false positive
    assert got[None] is False


def test_inidset_no_session_fallback_exact_channel():
    """No-session fallback parity (round-15): a small LONG-funnel bloom
    literal emits the two-column inidsetblobx form so even the fallback
    never false-negatives on degraded batches."""
    from unittest import mock

    from pyspark.sql import SparkSession

    from hurricanedb_spark.sql.dialect import _register_inidset_probe

    lit = base64.b64encode(
        encode_idset(
            [2**61 + 256], "LONG", size_threshold_in_bytes=0,
            expected_insertions=50,
        )
    ).decode()
    assert len(lit) <= 1024
    with mock.patch.object(
        SparkSession, "getActiveSession", staticmethod(lambda: None)
    ):
        out = _register_inidset_probe("c", lit)
    assert out.startswith("inidsetblobx((c), CAST((c) AS STRING)")
