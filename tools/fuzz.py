"""Exploration runner for the differential query fuzzer.

Usage: python tools/fuzz.py [n_cases] [seed ...]

Runs fresh seeds (default: 5 random seeds x n_cases) against the DuckDB
oracle and, for any failure, prints the reproducing pair and appends a
regression case to corpus/fuzz_found.json in the corpus runner's format
(plain-SQL cases run by tests/test_corpus.py; dialect-only constructs are
printed for manual triage instead).
"""

from __future__ import annotations

import json
import os
import secrets
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hurricanedb_spark.session import get_spark
from hurricanedb_spark.testing.fuzzer import run_fuzz

SF_DIR = os.environ.get("SPARK_GRAFT_FUZZ_SF", "/root/testdata/sf0.001")
FOUND = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "corpus",
    "fuzz_found.json",
)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    seeds = [int(s) for s in sys.argv[2:]] or [
        secrets.randbelow(10**9) for _ in range(5)
    ]
    spark = get_spark("fuzz")
    n_bad = 0
    for seed in seeds:
        results = run_fuzz(spark, SF_DIR, seed=seed, n=n)
        bad = [r for r in results if not r.ok]
        n_bad += len(bad)
        print(f"seed={seed}: {len(results) - len(bad)}/{len(results)} ok")
        for r in bad:
            print(f"FAIL {r.case.name} [{r.detail}]")
            print(f"  pinot: {r.case.pinot_sql}")
            print(f"  duck:  {r.case.duck_sql}")
            _persist(seed, r)
    return 1 if n_bad else 0


def _persist(seed: int, r) -> None:
    entry = {
        "seed": seed,
        "name": r.case.name,
        "pinot_sql": r.case.pinot_sql,
        "duck_sql": r.case.duck_sql,
        "detail": r.detail,
    }
    found = []
    if os.path.exists(FOUND):
        with open(FOUND) as f:
            found = json.load(f)
    found.append(entry)
    with open(FOUND, "w") as f:
        json.dump(found, f, indent=1)
    print(f"  -> recorded in {FOUND}")


if __name__ == "__main__":
    raise SystemExit(main())
