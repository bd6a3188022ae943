"""TEXT_MATCH translator — restricted Lucene query syntax to Spark boolean
expressions.

The reference's TEXT_MATCH filter evaluates Lucene queries against a text
index (pinot-core/.../filter/TextMatchFilterOperator.java, Lucene- or
native-backed). Spark has no text index; the *semantics* translate to
boolean combinations of contains/prefix/regex predicates, which Catalyst
pushes into the scan. Supported Lucene subset (covers the reference's
TextSearchQueriesTest shapes):

  term            -> contains(col, 'term')
  "a phrase"      -> contains(col, 'a phrase')
  term*           -> rlike prefix match on word boundary
  /regex/         -> rlike
  a AND b, a OR b, NOT a, parentheses
"""

from __future__ import annotations

import re

_TOKENIZER = re.compile(
    r"""\s*(?:
        (?P<lparen>\() |
        (?P<rparen>\)) |
        (?P<and>AND\b) |
        (?P<or>OR\b) |
        (?P<not>NOT\b) |
        (?P<phrase>"[^"]*") |
        (?P<regex>/[^/]*/) |
        (?P<term>[^\s()]+)
    )""",
    re.VERBOSE,
)


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _term_expr(col: str, term: str) -> str:
    if term.startswith('"') and term.endswith('"'):
        return f"contains({col}, {_sql_quote(term[1:-1])})"
    if term.startswith("/") and term.endswith("/"):
        return f"regexp_like({col}, {_sql_quote(term[1:-1])})"
    if term.endswith("*"):
        pattern = "\\b" + re.escape(term[:-1])
        return f"regexp_like({col}, {_sql_quote(pattern)})"
    return f"contains({col}, {_sql_quote(term)})"


def translate_text_match(col: str, lucene_query: str) -> str:
    """Translate a Lucene-subset query literal into a Spark boolean SQL
    expression over `col`."""
    q = lucene_query.strip()
    if q.startswith("'") and q.endswith("'"):
        q = q[1:-1]

    out: list[str] = []
    pos = 0
    prev_operand = False  # implicit OR between adjacent terms (Lucene default)
    while pos < len(q):
        m = _TOKENIZER.match(q, pos)
        if not m:
            break
        pos = m.end()
        kind = m.lastgroup
        if kind == "lparen":
            if prev_operand:
                out.append("OR")
            out.append("(")
            prev_operand = False
        elif kind == "rparen":
            out.append(")")
            prev_operand = True
        elif kind == "and":
            out.append("AND")
            prev_operand = False
        elif kind == "or":
            out.append("OR")
            prev_operand = False
        elif kind == "not":
            if prev_operand:
                out.append("AND")
            out.append("NOT")
            prev_operand = False
        else:
            if prev_operand:
                out.append("OR")
            out.append(_term_expr(col, m.group(0).strip()))
            prev_operand = True
    return "(" + " ".join(out) + ")"
