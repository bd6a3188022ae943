"""Raw percentile forms: serialized digest results.

percentileRawEst returns the HEX-serialized Pinot QuantileDigest
(vendored wire format: pinot-segment-local customobject/
QuantileDigest.java toBytes/fromByteBuffer — the format spec is the
reference source itself) and percentileRawTDigest the HEX-serialized
t-digest MergingDigest (public tdunning layout, VERBOSE encoding) —
mergeable state, NOT the estimate (SerializedQuantileDigest /
SerializedTDigest .toString; the round-8/9 raw-form defect class).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from hurricanedb_spark.operators.percentile_digest import (
    build_qdigest,
    deserialize_qdigest,
    merge_qdigests,
)
from hurricanedb_spark.operators.tdigest import (
    build_tdigest,
    deserialize_tdigest,
    merge_tdigests,
)
from hurricanedb_spark.sql.dialect import HurricaneSQL, rewrite_functions


@pytest.fixture(scope="module")
def hdb(spark, sf_dir):
    return HurricaneSQL(spark, sf_dir)


def _exact_qdigest_quantile(sorted_vals, q):
    """Reference getQuantiles rule: the value at the first node where the
    forward cumulative weight EXCEEDS q * total, capped at max."""
    target = q * len(sorted_vals)
    acc = 0
    for v in sorted(set(sorted_vals)):
        acc += sorted_vals.count(v)
        if acc > target:
            return v
    return sorted_vals[-1]


def test_qdigest_round_trip_exact_property():
    rng = random.Random(5)
    for _ in range(100):
        vals = [rng.randint(-5000, 5000) for _ in range(rng.randint(1, 300))]
        d = deserialize_qdigest(build_qdigest(vals))
        assert d.total_weight == len(vals)
        assert d.min_value == min(vals) and d.max_value == max(vals)
        s = sorted(vals)
        for q in (0.0, 0.05, 0.25, 0.5, 0.75, 0.95, 1.0):
            assert d.quantile(q) == _exact_qdigest_quantile(s, q), (q, s[:10])


def test_qdigest_merge_exact():
    a = build_qdigest([1, 2, 2, 3])
    b = build_qdigest([3, 10, -4])
    m = deserialize_qdigest(merge_qdigests([a, b]))
    assert m.total_weight == 7
    assert m.min_value == -4 and m.max_value == 10
    assert m.quantile(0.0) == -4 and m.quantile(1.0) == 10
    assert m.quantile(0.5) == 2  # cum {-4:1,1:2,2:4} > 3.5 at value 2


def test_tdigest_round_trip_and_accuracy():
    rng = random.Random(9)
    vals = [rng.gauss(0, 50) for _ in range(30000)]
    d = deserialize_tdigest(build_tdigest(vals))
    assert len(d.centroids) <= 210  # bounded by ~2*compression
    s = sorted(vals)
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        got = d.quantile(q)
        rank = sum(1 for v in s if v <= got) / len(s)
        assert abs(rank - q) < 0.02, (q, rank)
    # per-slice digests re-merge (the raw form's purpose)
    m = deserialize_tdigest(
        merge_tdigests([build_tdigest(s[:15000]), build_tdigest(s[15000:])])
    )
    med = m.quantile(0.5)
    rank = sum(1 for v in s if v <= med) / len(s)
    assert abs(rank - 0.5) < 0.02


def test_raw_percentile_sql_returns_hex_digests(hdb):
    """SQL surface: both raw forms return lowercase-hex serialized
    digests whose estimates track the exact percentile; pct args are
    validated."""
    rows = hdb.sql(
        "SELECT l_returnflag, "
        "percentileRawEst(l_quantity, 50) AS qd, "
        "percentileRawTDigest(l_extendedprice, 90) AS td "
        "FROM lineitem GROUP BY l_returnflag",
        default_limit=None,
    ).collect()
    exact = {
        r["l_returnflag"]: (r["p50"], r["p90"], r["n"])
        for r in hdb.sql(
            "SELECT l_returnflag, "
            "percentile(l_quantity, 50) AS p50, "
            "percentile(l_extendedprice, 90) AS p90, "
            "count(*) AS n "
            "FROM lineitem GROUP BY l_returnflag",
            default_limit=None,
        ).collect()
    }
    assert rows
    for r in rows:
        assert isinstance(r["qd"], str) and r["qd"] == r["qd"].lower()
        qd = deserialize_qdigest(bytes.fromhex(r["qd"]))
        p50, p90, n = exact[r["l_returnflag"]]
        assert qd.total_weight == n
        # long-domain digest of a DECIMAL column: values truncate to
        # BIGINT, so compare against the exact percentile within 1
        assert abs(qd.quantile(0.5) - p50) <= 1.0
        td = deserialize_tdigest(bytes.fromhex(r["td"]))
        assert abs(td.quantile(0.9) - p90) <= abs(p90) * 0.02
    with pytest.raises(ValueError, match="percentile out of range"):
        rewrite_functions("SELECT percentileRawEst(x, 101) FROM t")
    with pytest.raises(ValueError, match="percentile out of range"):
        rewrite_functions("SELECT percentileRawTDigest(x, -1) FROM t")


def test_raw_percentile_arity_is_loud():
    """1-/3-arg raw percentile calls must raise the dialect's arity error,
    not fall through all rewrite passes to Spark's 'unresolved routine'."""
    for bad in (
        "SELECT percentileRawEst(x) FROM t",
        "SELECT percentileRawEst(x, 50, 'extra') FROM t",
        "SELECT percentileRawTDigest(x) FROM t",
        "SELECT percentileRawTDigest(x, 50, 99) FROM t",
    ):
        with pytest.raises(ValueError, match="expects exactly 2 arguments"):
            rewrite_functions(bad)


def test_raw_percentile_sql_digests_merge_across_slices(hdb):
    """Persist-then-merge workflow: per-status raw digests re-merge into
    the all-rows digest's estimates."""
    rows = hdb.sql(
        "SELECT o_orderstatus AS st, "
        "percentileRawEst(o_totalprice, 50) AS qd "
        "FROM orders GROUP BY o_orderstatus",
        default_limit=None,
    ).collect()
    merged = deserialize_qdigest(
        merge_qdigests([bytes.fromhex(r["qd"]) for r in rows])
    )
    n = hdb.sql(
        "SELECT count(*) AS n FROM orders", default_limit=None
    ).collect()[0]["n"]
    assert merged.total_weight == n
    # QuantileDigest's rule is DISCRETE (first value whose forward
    # cumulative weight exceeds q*n — getQuantiles():185-223), not
    # Spark's interpolating percentile(): compare against the exact
    # rank-floor(q*n) order statistic
    want = hdb.sql(
        "SELECT CAST(o_totalprice AS BIGINT) AS v FROM orders "
        f"ORDER BY v LIMIT 1 OFFSET {n // 2}",
        default_limit=None,
    ).collect()[0]["v"]
    assert merged.quantile(0.5) == want


def test_raw_mv_percentiles_refuse_outside_restructure():
    with pytest.raises(ValueError, match="serialized digest"):
        rewrite_functions(
            "SELECT a, percentileRawTDigestMV(x, 50) FROM t JOIN u ON a = b "
            "GROUP BY a"
        )


def test_raw_mv_est_returns_hex_qdigest(hdb, spark):
    """percentileRawEstMV through the bounded restructure: hex
    QuantileDigest of the exploded (long-cast) values."""
    spark.range(100).selectExpr(
        "id % 2 AS g",
        "transform(sequence(1, 4), i -> CAST(id + i AS BIGINT)) AS arr",
    ).createOrReplaceTempView("rawest_mv_t")
    rows = hdb.sql(
        "SELECT g, percentileRawEstMV(arr, 50) AS qd FROM rawest_mv_t "
        "GROUP BY g ORDER BY g",
        default_limit=None,
    ).collect()
    exact = hdb.sql(
        "SELECT g, percentileMV(arr, 50) AS p, countMV(arr) AS n "
        "FROM rawest_mv_t GROUP BY g ORDER BY g",
        default_limit=None,
    ).collect()
    for r, e in zip(rows, exact):
        d = deserialize_qdigest(bytes.fromhex(r["qd"]))
        assert d.total_weight == e["n"]
        assert abs(d.quantile(0.5) - e["p"]) <= 1.0