"""Upsert / partial-upsert / dedup semantics on inline data — mirrors the
reference's upsert manager tests (ConcurrentMapPartitionUpsertMetadataManager,
partial-upsert mergers)."""

from __future__ import annotations

from hurricanedb_spark.operators.upsert import dedup_view, partial_upsert_view, upsert_view


def _mk(spark):
    rows = [
        # (pk, cmp, arrival, value)
        ("k1", 1, 1, 10.0),
        ("k1", 3, 2, 30.0),
        ("k1", 2, 3, 20.0),
        ("k2", 5, 4, 50.0),
        ("k2", 5, 5, 55.0),  # cmp tie -> higher arrival wins
    ]
    return spark.createDataFrame(rows, "pk string, cmp int, arrival int, v double")


def test_upsert_latest_wins(spark):
    out = {r.pk: r for r in upsert_view(_mk(spark), ["pk"], "cmp", "arrival").collect()}
    assert out["k1"].v == 30.0  # max cmp
    assert out["k2"].v == 55.0  # cmp tie, max arrival


def test_dedup_first_wins(spark):
    out = {r.pk: r for r in dedup_view(_mk(spark), ["pk"], "arrival").collect()}
    assert out["k1"].v == 10.0
    assert out["k2"].v == 50.0


def test_partial_upsert_strategies(spark):
    df = _mk(spark)
    out = {
        r.pk: r
        for r in partial_upsert_view(
            df,
            pk=["pk"],
            cmp_col="cmp",
            strategies={"v": "INCREMENT"},
            tiebreak="arrival",
        ).collect()
    }
    assert out["k1"].v == 60.0  # 10+30+20
    assert out["k2"].v == 105.0
    assert out["k1"].cmp == 3  # cmp col keeps max

    out2 = {
        r.pk: r
        for r in partial_upsert_view(
            df, ["pk"], "cmp", {"v": "OVERWRITE"}, tiebreak="arrival"
        ).collect()
    }
    assert out2["k1"].v == 30.0
    assert out2["k2"].v == 55.0  # tie broken by arrival

    out3 = {
        r.pk: r
        for r in partial_upsert_view(
            df, ["pk"], "cmp", {"v": "IGNORE"}, tiebreak="arrival"
        ).collect()
    }
    assert out3["k1"].v == 10.0  # first insert wins

    out4 = {
        r.pk: r
        for r in partial_upsert_view(
            df, ["pk"], "cmp", {"v": "MAX"}, tiebreak="arrival"
        ).collect()
    }
    assert out4["k1"].v == 30.0

    out5 = {
        r.pk: r
        for r in partial_upsert_view(
            df, ["pk"], "cmp", {"v": "APPEND"}, tiebreak="arrival"
        ).collect()
    }
    assert out5["k1"].v == [10.0, 20.0, 30.0]  # sorted by (cmp, arrival)

    out6 = {
        r.pk: r
        for r in partial_upsert_view(
            df, ["pk"], "cmp", {"v": "UNION"}, tiebreak="arrival"
        ).collect()
    }
    assert out6["k2"].v == [50.0, 55.0]
