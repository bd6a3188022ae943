"""JSON_MATCH translator — Pinot's JSON-index predicate syntax to Spark SQL.

The reference's JSON_MATCH filter
(pinot-core/.../filter/JsonMatchFilterOperator.java; predicate syntax parsed
by pinot-segment-local/.../json/JsonIndexCreator and BaseJsonIndexReader)
evaluates conditions like

  JSON_MATCH(col, '"$.name" = ''zhang''')
  JSON_MATCH(col, '"$.a.b" > 3 AND "$.tags" IS NOT NULL')

against a JSON index. The index is an access path; the *semantics* are path
predicates, which translate to get_json_object() comparisons that Catalyst
pushes toward the scan. Supported subset (covers JsonMatchPredicate shapes
in the reference's JsonIndexTest / queries):

  "$.path" = / <> / != / > / >= / < / <= literal
  "$.path" IN ('a', 'b') / NOT IN (...)
  "$.path" IS NULL / IS NOT NULL
  AND / OR / NOT, parentheses

Numeric literals compare numerically (the extracted string is cast to
DOUBLE); string literals compare as strings. Array-index paths use Spark's
own `$.arr[0]` syntax, which matches Pinot's.
"""

from __future__ import annotations

import re

_PRED = re.compile(
    r"""
    "(?P<path>\$[^"]*)"\s*
    (?:
        (?P<isnull>IS\s+(?:NOT\s+)?NULL)
      | (?P<notin>NOT\s+IN|IN)\s*\((?P<inlist>[^)]*)\)
      | (?P<op>!=|<>|>=|<=|=|>|<)\s*(?P<lit>'(?:[^']|'')*'|-?\d+(?:\.\d+)?)
    )
    """,
    re.IGNORECASE | re.VERBOSE,
)

_NUM = re.compile(r"^-?\d+(?:\.\d+)?$")


def _extract(col: str, path: str, numeric: bool) -> str:
    base = f"get_json_object({col}, '{path}')"
    return f"CAST({base} AS DOUBLE)" if numeric else base


def _array_any(col: str, path: str, numeric: bool, body: str) -> str:
    """[*] paths: Pinot's JSON index flattens arrays, so a predicate on a
    `[*]` path matches when ANY flattened value satisfies it
    (JsonIndexCreator flatten semantics). get_json_object already returns
    the JSON array of matched values for `[*]` paths; exists() applies
    the predicate per element."""
    elem_t = "array<double>" if numeric else "array<string>"
    raw = f"get_json_object({col}, '{path}')"
    # a [*] path with exactly one match extracts as the bare scalar, not a
    # one-element array — re-wrap so from_json always sees an array
    arr_text = (
        f"CASE WHEN left({raw}, 1) = '[' THEN {raw} "
        f"ELSE concat('[', {raw}, ']') END"
    )
    return f"exists(from_json({arr_text}, '{elem_t}'), __e -> __e {body})"


def _one(col: str, m: re.Match) -> str:
    path = m.group("path")
    starred = "[*]" in path
    if m.group("isnull"):
        null_kw = " ".join(m.group("isnull").upper().split())
        return f"{_extract(col, path, False)} {null_kw}"
    if m.group("notin") is not None:
        kw = " ".join(m.group("notin").upper().split())
        items = m.group("inlist")
        numeric = all(
            _NUM.match(v.strip()) for v in items.split(",") if v.strip()
        )
        if starred:
            return _array_any(col, path, numeric, f"{kw} ({items})")
        return f"{_extract(col, path, numeric)} {kw} ({items})"
    op = "<>" if m.group("op") == "!=" else m.group("op")
    lit = m.group("lit")
    numeric = bool(_NUM.match(lit))
    if starred:
        return _array_any(col, path, numeric, f"{op} {lit}")
    return f"{_extract(col, path, numeric)} {op} {lit}"


def translate_json_match(col: str, condition: str) -> str:
    """Translate a JSON_MATCH condition literal into a Spark boolean SQL
    expression over JSON-string column `col`. AND/OR/NOT and parentheses
    pass through; each quoted-path predicate becomes a get_json_object
    comparison (numeric when the literal side is numeric)."""
    cond = condition.strip()
    if cond.startswith("'") and cond.endswith("'"):
        cond = cond[1:-1].replace("''", "'")
    out = _PRED.sub(lambda m: _one(col, m), cond)
    return f"({out})"
