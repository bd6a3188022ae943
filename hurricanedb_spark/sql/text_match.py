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
  te?t, s*k       -> mid-word wildcards: anchored regex per analyzed token
  term^2          -> boost parsed and dropped (weights affect scoring,
                     never the match set of a filter)
  /regex/         -> rlike
  term~ / term~1  -> fuzzy: any analyzed token within edit distance
                     (Lucene FuzzyQuery; default distance 2)
  [a TO b]        -> token range, inclusive ([ ]) / exclusive ({ }),
                     * as an open bound (Lucene TermRangeQuery)
  field:term, field:(...)  -> field prefix (TEXT_MATCH is already scoped
                     to one column, so the prefix is validated away)
  a AND b, a OR b, NOT a, parentheses

Fuzzy and range shapes match per analyzed token (lowercased, split on
non-alphanumerics — Lucene StandardAnalyzer behavior) via higher-order
`exists()` over `split()`, staying JVM-side.
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
        (?P<field>[A-Za-z_]\w*:) |
        (?P<range>[\[{][^\]}]*[\]}]) |
        (?P<phrase>"[^"]*"(?:~\d+)?(?:\^[\d.]+)?) |
        (?P<regex>/[^/]*/) |
        (?P<term>[^\s()]+)
    )""",
    re.VERBOSE,
)

# analyzed-token array of the column (StandardAnalyzer approximation)
def _tokens(col: str) -> str:
    return f"filter(split(lower({col}), '[^a-z0-9]+'), t -> t != '')"


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _range_expr(col: str, tok: str) -> str:
    """[a TO b] / {a TO b} — lexicographic token range (TermRangeQuery)."""
    m = re.match(r"^[\[{]\s*(\S+)\s+TO\s+(\S+)\s*[\]}]$", tok)
    if not m:
        raise ValueError(f"malformed range query: {tok}")
    lo, hi = m.group(1).lower(), m.group(2).lower()
    lo_op = ">=" if tok[0] == "[" else ">"
    hi_op = "<=" if tok[-1] == "]" else "<"
    conds = []
    if lo != "*":
        conds.append(f"t {lo_op} {_sql_quote(lo)}")
    if hi != "*":
        conds.append(f"t {hi_op} {_sql_quote(hi)}")
    body = " AND ".join(conds) if conds else "true"
    return f"exists({_tokens(col)}, t -> {body})"


def _positions(toks: str, word: str) -> str:
    """1-based positions of `word` among the analyzed tokens (`toks` is
    an expression or bound lambda variable holding the token array)."""
    return (
        f"filter(sequence(1, size({toks})), "
        f"i -> element_at({toks}, i) = {_sql_quote(word)})"
    )


def _slop_expr(col: str, words: list[str], slop: int) -> str:
    """k-term sloppy phrase with exact Lucene semantics
    (SloppyPhraseMatcher): term m carries phrase offset m, and a set of
    token positions p_0..p_{k-1} matches when
        max_m(p_m - m) - min_m(p_m - m) <= slop,
    repeated terms constrained to distinct positions. For k = 2 this
    reduces to the familiar costs: in-order gap j-i-1, reversed adjacent
    pair i-j+1 (= 2 for a transposition). Nested `exists` over the
    per-term position arrays — O(prod of term frequencies) per row, all
    inside codegen.

    The tokenization is hoisted into ONE binding via a single-element
    `exists(array(<tokens>), __toks -> ...)` wrapper: the naive form
    inlines the split/filter expression 2k times, which ballooned
    whole-stage codegen to ~6s of one-time compile at k = 3 (round-5
    perf watch item); with the binding the first run compiles in well
    under a second."""
    k = len(words)
    adjusted = [f"(p{m} - {m})" for m in range(k)]
    conds = [
        f"greatest({', '.join(adjusted)}) - least({', '.join(adjusted)})"
        f" <= {slop}"
    ]
    for a in range(k):
        for b in range(a + 1, k):
            if words[a] == words[b]:
                conds.append(f"p{a} <> p{b}")
    expr = "(" + " AND ".join(conds) + ")"
    for m in reversed(range(k)):
        expr = f"exists({_positions('__toks', words[m])}, p{m} -> {expr})"
    return f"exists(array({_tokens(col)}), __toks -> {expr})"


def _wildcard_token_regex(word: str) -> str:
    """Lucene WildcardQuery -> anchored regex over one analyzed token:
    `?` = one character, `*` = any run (terms are alnum, so `.` is safe)."""
    parts = []
    for ch in word:
        if ch == "*":
            parts.append(".*")
        elif ch == "?":
            parts.append(".")
        else:
            parts.append(re.escape(ch))
    return "^" + "".join(parts) + "$"


def _term_expr(col: str, term: str) -> str:
    # boost suffix (term^2, "a b"^0.5): boosts weight Lucene's scoring,
    # never the match set — TEXT_MATCH is a filter, so the weight is
    # parsed and dropped (regex terms excluded: ^ is a valid regex char)
    if not (term.startswith("/") and term.endswith("/")):
        boost = re.match(r"^(.+?)\^[\d.]+$", term)
        if boost:
            term = boost.group(1)
    if term.startswith('"'):
        m = re.match(r'^"([^"]*)"(?:~(\d+))?$', term)
        phrase, slop = m.group(1), m.group(2)
        words = [w for w in re.split(r"[^a-zA-Z0-9]+", phrase.lower()) if w]
        if slop is not None and len(words) >= 2:
            # exact Lucene slop semantics for any term count
            # (SloppyPhraseMatcher max-min rule; see _slop_expr)
            return _slop_expr(col, words, int(slop))
        # containment (exact for unspecified slop over space-joined text)
        return f"contains({col}, {_sql_quote(phrase)})"
    if term.startswith("/") and term.endswith("/"):
        return f"regexp_like({col}, {_sql_quote(term[1:-1])})"
    fuzzy = re.match(r"^([^~\s]+)~(\d*)$", term)
    if fuzzy:
        word = fuzzy.group(1).lower()
        dist = int(fuzzy.group(2) or 2)  # Lucene FuzzyQuery default
        return (
            f"exists({_tokens(col)}, "
            f"t -> levenshtein(t, {_sql_quote(word)}) <= {dist})"
        )
    if term.endswith("*") and "*" not in term[:-1] and "?" not in term:
        # pure prefix query: cheap whole-column word-boundary scan
        pattern = "\\b" + re.escape(term[:-1])
        return f"regexp_like({col}, {_sql_quote(pattern)})"
    if "*" in term or "?" in term:
        # mid-word wildcards (te?t, s*k): WildcardQuery matches a whole
        # analyzed term, so test each token against the anchored regex
        rx = _wildcard_token_regex(term.lower())
        return f"exists({_tokens(col)}, t -> t rlike {_sql_quote(rx)})"
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
        elif kind == "field":
            # TEXT_MATCH is scoped to one column; the field prefix in
            # grouped queries like `skills:(java AND python)` names that
            # same column — consume it, the clause that follows applies
            # to `col` as usual
            continue
        elif kind == "range":
            if prev_operand:
                out.append("OR")
            out.append(_range_expr(col, m.group(0).strip()))
            prev_operand = True
        else:
            if prev_operand:
                out.append("OR")
            out.append(_term_expr(col, m.group(0).strip()))
            prev_operand = True
    return "(" + " ".join(out) + ")"
