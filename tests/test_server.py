"""Broker HTTP endpoint: POST /query/sql round-trips through a live
ThreadingHTTPServer (the reference's main entry point, SURVEY.md §3.1)."""

from __future__ import annotations

import json
import urllib.request

import pytest

from hurricanedb_spark.sql.dialect import HurricaneSQL
from hurricanedb_spark.sql.server import serve


@pytest.fixture(scope="module")
def endpoint(spark, sf_dir):
    hdb = HurricaneSQL(spark, sf_dir)
    server = serve(hdb, port=0)  # ephemeral port
    host, port = server.server_address
    yield f"http://{host}:{port}"
    server.shutdown()


def _post(url, body):
    req = urllib.request.Request(
        url + "/query/sql",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        return resp.status, json.loads(resp.read())


def test_query_roundtrip(endpoint):
    status, out = _post(
        endpoint,
        {"sql": "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag"},
    )
    assert status == 200
    rt = out["resultTable"]
    assert rt["dataSchema"]["columnNames"] == ["l_returnflag", "n"]
    assert rt["dataSchema"]["columnDataTypes"] == ["STRING", "LONG"]
    assert out["numRowsResultSet"] == 3
    assert sum(r[1] for r in rt["rows"]) == 6000
    assert out["exceptions"] == []


def test_pinot_dialect_over_http(endpoint):
    status, out = _post(
        endpoint, {"sql": "SELECT minmaxrange(l_quantity) AS r FROM lineitem"}
    )
    assert status == 200
    assert out["resultTable"]["rows"][0][0] > 0


def test_default_limit_over_http(endpoint):
    _, out = _post(endpoint, {"sql": "SELECT l_orderkey FROM lineitem"})
    assert out["numRowsResultSet"] == 10  # broker default LIMIT 10


def test_error_in_band(endpoint):
    status, out = _post(endpoint, {"sql": "SELECT * FROM no_such_table"})
    assert status == 200  # errors are in-band like the reference broker
    assert out["resultTable"] is None
    assert out["exceptions"] and "no_such_table" in out["exceptions"][0]["message"].lower()


def test_bad_request(endpoint):
    import urllib.error

    req = urllib.request.Request(
        endpoint + "/query/sql", data=b"not json", headers={}
    )
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            status = resp.status
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 400
