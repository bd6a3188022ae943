"""Port reference data-driven SQL corpus cases into corpus/.

The reference's ground-truth corpus is 26 JSON files / ~718 queries in
pinot-query-runtime/src/test/resources/queries/ (runner
ResourceBasedQueriesTest.java:84-227): inline table schemas + rows +
queries, executed against the engine AND H2. This tool mirrors a file
into our corpus format (same shape, DuckDB as the oracle):

  python tools/port_corpus.py <RefFile.json> <corpus/out.json>

Every candidate query is executed on Spark AND DuckDB first; only
verified-matching queries are written. Skipped queries (ignored /
expectedException in the source, engine errors, mismatches) are printed
for triage — a mismatch is either a dialect difference or a real
wrong-answer bug and must be looked at by hand, never silently dropped.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hurricanedb_spark.session import get_spark
from hurricanedb_spark.testing.corpus import run_corpus_file

REF_DIR = "/root/reference/pinot-query-runtime/src/test/resources/queries"


def load_reference(path: str) -> dict:
    # some reference files end with a stray trailing comma
    text = open(path).read().rstrip().rstrip(",")
    return json.loads(text)


def convert(
    ref: dict, try_ignored: bool = False
) -> tuple[dict, list[tuple[str, str, str]]]:
    """Reference case dict -> local corpus dict + list of source-skipped
    queries (case, sql, reason). With try_ignored, queries the reference
    engine can't run (ignored in source) are still attempted — Spark is a
    superset (correlated subqueries, EXISTS, …), and any that verify
    against DuckDB become extra coverage."""
    out: dict = {}
    skipped: list[tuple[str, str, str]] = []
    for cname, case in ref.items():
        if not isinstance(case, dict) or "queries" not in case:
            continue
        if case.get("ignored") and not try_ignored:
            skipped.append((cname, "<whole case>", "case ignored in source"))
            continue
        queries = []
        for q in case["queries"]:
            if q.get("expectedException"):
                skipped.append((cname, q["sql"], "expectedException case"))
                continue
            if q.get("ignored"):
                if not try_ignored:
                    skipped.append((cname, q["sql"], "ignored in source"))
                    continue
                entry = {
                    "sql": q["sql"],
                    "description": "ignored in the reference engine — "
                    "superset coverage"
                    + (f": {q['description']}" if q.get("description") else ""),
                }
                queries.append(entry)
                continue
            entry = {"sql": q["sql"]}
            if q.get("description"):
                entry["description"] = q["description"]
            queries.append(entry)
        tables = {
            tbl: {"schema": spec["schema"], "inputs": spec["inputs"]}
            for tbl, spec in case.get("tables", {}).items()
        }
        out[cname] = {"tables": tables, "queries": queries}
    return out, skipped


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    try_ignored = "--try-ignored" in sys.argv
    ref_path, out_path = args[0], args[1]
    if not os.path.exists(ref_path):
        ref_path = os.path.join(REF_DIR, ref_path)
    ref = load_reference(ref_path)
    cases, skipped = convert(ref, try_ignored=try_ignored)

    spark = get_spark("port-corpus", shuffle_partitions=4)
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        json.dump(cases, f)
        trial = f.name
    results = run_corpus_file(spark, trial)
    os.unlink(trial)

    verdict = {(r.case, r.sql): r for r in results}
    kept = 0
    failures: list = []
    for cname, case in cases.items():
        ok_queries = []
        for q in case["queries"]:
            r = verdict.get((cname, q["sql"]))
            if r is not None and r.ok:
                ok_queries.append(q)
                kept += 1
            else:
                failures.append((cname, q["sql"], r.detail if r else "no result"))
        case["queries"] = ok_queries
    cases = {k: v for k, v in cases.items() if v["queries"]}
    cases["_meta"] = {
        "source": os.path.basename(ref_path),
        "note": "mirrored from the reference data-driven corpus; every query "
        "verified Spark==DuckDB at port time",
    }

    with open(out_path, "w") as f:
        json.dump(cases, f, indent=1)
    print(f"== kept {kept} queries -> {out_path}")
    if skipped:
        print(f"== {len(skipped)} skipped in source (ignored/expectedException):")
        for c, s, why in skipped:
            print(f"  [{c}] {why}: {s[:120]}")
    if failures:
        print(f"== {len(failures)} NEED TRIAGE:")
        for c, s, d in failures:
            print(f"  [{c}] {s[:160]}\n      -> {d[:300]}")


if __name__ == "__main__":
    main()
