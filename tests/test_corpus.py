"""Run the JSON query corpus (reference level-3 strategy: inline tables +
queries vs oracle — ResourceBasedQueriesTest analog, DuckDB as the H2)."""

from __future__ import annotations

import os

from hurricanedb_spark.testing.corpus import run_corpus_dir

CORPUS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "corpus")


def test_corpus_all_cases_match_oracle(spark):
    results = run_corpus_dir(spark, CORPUS)
    assert len(results) >= 50, f"corpus too small: {len(results)}"
    failures = [r for r in results if not r.ok]
    msg = "\n".join(f"{r.case}: {r.sql} -> {r.detail}" for r in failures)
    assert not failures, f"{len(failures)}/{len(results)} corpus failures:\n{msg}"
