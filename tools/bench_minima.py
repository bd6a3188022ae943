"""Merge repeated bench.py runs into per-query minima.

Per BENCH.md's host-variance note (container wall-clock drifts 20-40%
between runs of the same commit), per-round comparisons use the MINIMUM
over >= 3 runs spread across the round, not any single run.

Usage: python tools/bench_minima.py bench_runs/r06_run*.json
Prints a markdown table plus one JSON line of the minima.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    paths = sys.argv[1:]
    if not paths:
        print(__doc__)
        return 1
    runs = []
    for p in paths:
        with open(p, encoding="utf-8") as f:
            runs.append(json.load(f))
    names = sorted({n for r in runs for n in r["queries"]})
    minima = {
        n: min(r["queries"][n] for r in runs if n in r["queries"])
        for n in names
    }
    print(f"| query | min of {len(runs)} runs (s) | per-run |")
    print("|---|---|---|")
    for n in names:
        per_run = " / ".join(
            f"{r['queries'][n]:.2f}" for r in runs if n in r["queries"]
        )
        print(f"| {n} | {minima[n]:.2f} | {per_run} |")
    total = round(sum(minima.values()), 4)
    print(f"| **total (min)** | **{total:.2f}** | "
          + " / ".join(f"{r['value']:.2f}" for r in runs) + " |")
    print()
    print(json.dumps({"metric": "headline_query_wall_total_min",
                      "value": total, "unit": "sec",
                      "queries": minima, "runs": len(runs)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
