"""Grammar-based differential fuzzer (reference analog: the 718-query
resource corpus, ResourceBasedQueriesTest — this is its generative
version over the dialect surface). Seeded, so the suite is
deterministic; tools/fuzz.py runs fresh seeds for exploration."""

from __future__ import annotations

from hurricanedb_spark.testing.fuzzer import gen_cases, run_fuzz

SF_DIR = "/root/testdata/sf0.001"


def test_generator_is_deterministic():
    a = gen_cases(7, 25)
    b = gen_cases(7, 25)
    assert [c.pinot_sql for c in a] == [c.pinot_sql for c in b]
    assert len({c.pinot_sql for c in a}) > 20  # actually varied


def test_fuzz_differential_300_cases(spark):
    """300 seeded dialect queries (filters × aggregates × group-by ×
    having × order-by × scalar fns) must value-match the DuckDB oracle."""
    results = run_fuzz(spark, SF_DIR, seed=20260814, n=300)
    bad = [r for r in results if not r.ok]
    msg = "\n".join(
        f"{r.case.name}: {r.detail}\n  P: {r.case.pinot_sql}\n  D: {r.case.duck_sql}"
        for r in bad[:5]
    )
    assert not bad, f"{len(bad)}/300 fuzz failures:\n{msg}"


def test_fuzz_covers_all_shapes():
    """The 300-case seeded run must exercise every grammar shape,
    including the round-5 json/groovy additions and the round-9 raw
    sketch set-op shape."""
    shapes = {c.shape for c in gen_cases(20260814, 300)}
    assert {
        "select", "global_agg", "group_agg", "lookup", "join", "window",
        "union_all", "cte", "mv_select", "mv_agg", "json_agg",
        "json_select", "groovy_agg", "raw_sketch_agg",
    } <= shapes
