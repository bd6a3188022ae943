"""CLP log-encoding operator tests (reference:
pinot-plugins/pinot-input-format/pinot-clp-log/CLPLogRecordExtractor.java).
"""

from __future__ import annotations

from hurricanedb_spark.sources.clp_logs import (
    DICT_VAR_PLACEHOLDER as D,
    ENCODED_VAR_PLACEHOLDER as E,
    clp_decode,
    clp_encode,
    clp_match_logtype,
)

MSGS = [
    (1, "job job-77 started on host-3 with 4 cores"),
    (2, "job job-78 failed after -12 retries"),
    (3, "heartbeat ok"),
    (4, "read 1024 bytes from 0x3fa8 in 7 ms"),
]


def _df(spark):
    return spark.createDataFrame(MSGS, ["k", "msg"])


def test_clp_encode_decomposition(spark):
    enc = clp_encode(_df(spark), "msg").orderBy("k").collect()
    r1 = enc[0]
    assert r1.msg_logtype == f"job {D} started on {D} with {E} cores"
    assert r1.msg_dictionaryVars == ["job-77", "host-3"]
    assert r1.msg_encodedVars == [4]
    r2 = enc[1]
    assert r2.msg_encodedVars == [-12]  # signed integers are encoded vars
    r3 = enc[2]
    assert r3.msg_logtype == "heartbeat ok"  # pure-static message untouched
    assert r3.msg_dictionaryVars == [] and r3.msg_encodedVars == []
    r4 = enc[3]
    assert r4.msg_dictionaryVars == ["0x3fa8"]  # hex id -> dictionary var
    assert r4.msg_encodedVars == [1024, 7]
    assert "msg" not in enc[0].asDict()  # source column dropped like the reference


def test_clp_decode_roundtrip(spark):
    enc = clp_encode(_df(spark), "msg")
    dec = clp_decode(enc, "msg", out_col="decoded").orderBy("k").collect()
    for row, (_, original) in zip(dec, MSGS):
        assert row.decoded == original


def test_clp_logtype_search_matches_shape_not_values(spark):
    enc = clp_encode(_df(spark), "msg")
    hits = clp_match_logtype(enc, "msg", "job * started on * with * cores")
    assert [r.k for r in hits.collect()] == [1]
    # both job-77 and job-78 rows share the failed/started prefixes only
    prefix = clp_match_logtype(enc, "msg", "job *")
    assert sorted(r.k for r in prefix.collect()) == [1, 2]


def test_clp_pipeline_is_udf_free(spark):
    """Scale guard: encode+decode must stay in whole-stage codegen — no
    Python evaluation nodes in the physical plan."""
    enc = clp_decode(clp_encode(_df(spark), "msg"), "msg", out_col="d")
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
