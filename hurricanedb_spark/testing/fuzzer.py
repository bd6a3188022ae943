"""Grammar-based differential query fuzzer.

The reference's strongest test asset is its 718-query resource corpus
(pinot-query-runtime ResourceBasedQueriesTest.java:84-227); this is the
systematic generator version: seeded random queries over the dialect
surface — filters × aggregates × group-by × having × order-by ×
scalar functions, the shapes QueryRewriterFactory.java:36 rewrites —
rendered BOTH as Pinot-dialect SQL (run through HurricaneSQL → Spark)
and as the equivalent DuckDB SQL, then value-compared with the corpus
runner's tolerance normalization.

Determinism rules baked into the grammar (cross-engine exactness):
  - integer-only arithmetic; multiplication restricted to small operands
    so no engine ever overflows int64
  - selection queries always ORDER BY every output column plus the
    (l_orderkey, l_linenumber) unique key before LIMIT — no tie
    nondeterminism
  - firstWithTime/lastWithTime aggregate a value that is a function of
    the time key, so engine-specific tie-breaking cannot show (the
    synthetic lineitem holds duplicate (l_orderkey, l_linenumber) pairs)
  - avg is the only double producer; compared at 9 significant digits
    (both engines accumulate int sums exactly below 2^53)

Failures are FuzzResult(ok=False); tools/fuzz.py persists them as corpus
cases for the regression suite.
"""

from __future__ import annotations

import math
import random
import zlib
from dataclasses import dataclass

import duckdb
from pyspark.sql import SparkSession

# (pinot_sql, duck_sql) expression pair
Pair = tuple[str, str]


def _theta_indep_parse(expr: str, k: int):
    """Minimal parser for SET_UNION/SET_INTERSECT/SET_DIFF trees —
    fuzzer-local and deliberately NOT sql.dialect._theta_parse_tree, so
    the oracle path shares no code with the translation under test.
    Returns int (sketch id) | (op, [children]), op in 'u'/'i'/'d'."""
    import re as _re

    toks = _re.findall(r"\$\d+|[A-Z_]+|[(),]", expr.replace(" ", ""))
    pos = 0

    def parse():
        nonlocal pos
        t = toks[pos]
        pos += 1
        if t.startswith("$"):
            sid = int(t[1:])
            if not 0 <= sid <= k:
                raise ValueError(f"sketch id {t} out of range in {expr!r}")
            return sid
        op = {"SET_UNION": "u", "SET_INTERSECT": "i", "SET_DIFF": "d"}[t]
        if toks[pos] != "(":
            raise ValueError(f"expected '(' in {expr!r}")
        pos += 1
        args = [parse()]
        while toks[pos] == ",":
            pos += 1
            args.append(parse())
        if toks[pos] != ")":
            raise ValueError(f"expected ')' in {expr!r}")
        pos += 1
        return (op, args)

    tree = parse()
    if pos != len(toks):
        raise ValueError(f"trailing tokens in {expr!r}")
    return tree


def _theta_indep_atoms(tree) -> set[int]:
    if isinstance(tree, int):
        return {tree}
    return set().union(*(_theta_indep_atoms(c) for c in tree[1]))


def _theta_indep_eval(tree, sets: dict[int, set]) -> set:
    """Direct set evaluation of a theta tree (simulation ground truth)."""
    if isinstance(tree, int):
        return sets[tree]
    op, ch = tree
    parts = [_theta_indep_eval(c, sets) for c in ch]
    out = parts[0]
    for p in parts[1:]:
        out = out | p if op == "u" else (out & p if op == "i" else out - p)
    return out


def _theta_indep_expansion(tree, atoms: list[int]) -> dict[frozenset, int]:
    """{frozenset(atom ids): coeff} with |region| == Σ coeff_U · |∪_{i∈U}
    S_i| for EVERY set configuration. Derivation is a closed-form double
    inclusion-exclusion — an algorithm disjoint from the engine's numpy
    linear-system solve (sql/dialect._theta_inclusion_exclusion), so the
    two cannot share a weight-derivation bug:

      minterm M (keys in every S_i, i∈M, and no S_j, j∉M):
        |M| = Σ_{T ⊆ comp(M)} (−1)^{|T|} · |∩_{i∈M∪T} S_i|
      intersections to unions:
        |∩_{i∈I} S_i| = Σ_{∅≠U⊆I} (−1)^{|U|+1} · |∪_{i∈U} S_i|
    """
    from itertools import combinations

    idx = {a: i for i, a in enumerate(atoms)}
    n = len(atoms)
    full = set(range(1, 1 << n))

    def minterms(t) -> set[int]:
        if isinstance(t, int):
            b = idx[t]
            return {m for m in full if m >> b & 1}
        op, ch = t
        parts = [minterms(c) for c in ch]
        out = parts[0]
        for p in parts[1:]:
            out = out | p if op == "u" else (out & p if op == "i" else out - p)
        return out

    coeff: dict[frozenset, int] = {}
    for m in minterms(tree):
        members = [i for i in range(n) if m >> i & 1]
        comp = [i for i in range(n) if not m >> i & 1]
        for tsize in range(len(comp) + 1):
            for extra in combinations(comp, tsize):
                inter = sorted(set(members) | set(extra))
                sign_t = -1 if tsize % 2 else 1
                for usize in range(1, len(inter) + 1):
                    for u in combinations(inter, usize):
                        sign_u = 1 if usize % 2 else -1  # (−1)^{|U|+1}
                        key = frozenset(atoms[i] for i in u)
                        coeff[key] = coeff.get(key, 0) + sign_t * sign_u
    return {u: c for u, c in coeff.items() if c}


def _theta_indep_duck_sql(
    expr: str, k: int, col: str, preds: dict[int, str]
) -> str:
    """DuckDB oracle for a filtered theta set expression: independent
    parse + independent weight derivation + a 30-configuration random-set
    simulation self-check (the expansion must equal direct set
    evaluation), then rendered as a signed sum of count(DISTINCT CASE
    WHEN <union of preds> ...)."""
    tree = _theta_indep_parse(expr, k)
    atoms = sorted(_theta_indep_atoms(tree))
    coeff = _theta_indep_expansion(tree, atoms)
    # crc32, not hash(): str hash is salted per process (PYTHONHASHSEED),
    # which would make a self-check failure non-reproducible from the
    # reported expression
    rr = random.Random(zlib.crc32(expr.encode()) & 0xFFFF)
    for _ in range(30):
        sets = {a: {x for x in range(12) if rr.random() < 0.5} for a in atoms}
        direct = len(_theta_indep_eval(tree, sets))
        via = sum(
            c * len(set().union(*(sets[a] for a in u)))
            for u, c in coeff.items()
        )
        if direct != via:
            raise AssertionError(
                f"theta oracle expansion self-check failed for {expr!r}: "
                f"{direct} != {via}"
            )
    if not coeff:
        # aggregate-shaped zero: a bare literal would return one row per
        # input row in a global aggregate shape
        return "CAST((count(*) * 0) AS BIGINT)"
    terms = []
    for u, c in sorted(coeff.items(), key=lambda kv: sorted(kv[0])):
        ps = [preds[a] for a in sorted(u)]
        if any(p == "true" for p in ps):
            case = f"({col})"
        else:
            cond = " OR ".join(f"({p})" for p in ps)
            case = f"CASE WHEN {cond} THEN ({col}) END"
        terms.append(f"({c}) * count(DISTINCT {case})")
    return f"CAST(({' + '.join(terms)}) AS BIGINT)"


def _same(s: str) -> Pair:
    return (s, s)


INT_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
SMALL_INT = ["l_linenumber", "CAST(l_quantity AS INT)"]
STR_COLS = ["l_returnflag", "l_linestatus"]
STR_DOMAIN = {"l_returnflag": ["A", "N", "R"], "l_linestatus": ["O", "F"]}
INT_RANGE = {
    "l_orderkey": 6_000,
    "l_partkey": 220,
    "l_suppkey": 12,
    "l_linenumber": 7,
    "CAST(l_quantity AS INT)": 50,
}
GROUP_KEYS = [
    "l_returnflag",
    "l_linestatus",
    "l_linenumber",
    "year(l_shipdate)",
]
DATES = ["1993-06-01", "1994-01-01", "1995-07-14", "1996-12-31", "1997-03-03"]

# dense per-row time key; NOT unique in the synthetic data (duplicate
# (l_orderkey, l_linenumber) pairs exist) — see time_safe_expr
UNIQUE_TIME = "(l_orderkey * 10 + l_linenumber)"


class _Gen:
    def __init__(self, rng: random.Random):
        self.rng = rng

    # ---------------- scalar integer expressions ----------------
    def int_expr(self, depth: int = 0) -> Pair:
        r = self.rng
        if depth >= 2 or r.random() < 0.35:
            roll = r.random()
            if roll < 0.6:
                c = r.choice(INT_COLS + ["CAST(l_quantity AS INT)"])
                return _same(c)
            if roll < 0.7:
                # NULL injection: nullif hits ~1/|domain| of rows, so both
                # engines exercise three-valued logic and null-skipping
                c = r.choice(list(INT_RANGE))
                v = r.randint(1, INT_RANGE[c])
                return _same(f"nullif({c}, {v})")
            if roll < 0.8:
                fn = r.choice(["year", "month"])
                return _same(f"{fn}(l_shipdate)")
            if roll < 0.9:
                return self.pinot_int_fn()
            return _same(str(r.randint(0, 1000)))
        kind = r.choice(
            [
                "add",
                "sub",
                "mul",
                "mod",
                "abs",
                "least",
                "case",
                "timeconvert",
                "datetimeconvert",
            ]
        )
        if kind == "datetimeconvert":
            # dateTimeConvert epoch->epoch with granularity truncation
            # (dialect _date_time_convert); DuckDB replays the bucketing
            gran_min, gran_ms = self.rng.choice([(5, 300000), (15, 900000), (60, 3600000)])
            base = self.rng.choice(["l_orderkey", "l_partkey"])
            v = f"({base} * 100000)"
            return (
                f"datetimeconvert({v}, '1:MILLISECONDS:EPOCH', "
                f"'1:SECONDS:EPOCH', '{gran_min}:MINUTES')",
                f"CAST(((({v}) // {gran_ms}) * {gran_ms}) // 1000 AS BIGINT)",
            )
        if kind == "timeconvert":
            # Pinot timeConvert unit arithmetic (dialect _time_convert)
            # over a synthetic epoch; DuckDB replays the truncating DIV
            units = [("MILLISECONDS", 1), ("SECONDS", 1000), ("MINUTES", 60000)]
            (fu, fm), (tu, tm) = self.rng.choice(units), self.rng.choice(units)
            base = self.rng.choice(["l_orderkey", "l_partkey"])
            v = f"({base} * 7)"
            return (
                f"timeconvert({v}, '{fu}', '{tu}')",
                f"CAST((({v}) * {fm}) // {tm} AS BIGINT)",
            )
        a_p, a_d = self.int_expr(depth + 1)
        if kind == "abs":
            return (f"abs({a_p})", f"abs({a_d})")
        if kind == "mod":
            m = r.randint(2, 13)
            return (f"mod({a_p}, {m})", f"mod({a_d}, {m})")
        if kind == "mul":
            # small × small or small × literal ≤ 100: products stay tiny
            s = r.choice(SMALL_INT)
            other = r.choice(SMALL_INT + [str(r.randint(1, 100))])
            return _same(f"({s} * {other})")
        if kind == "least":
            b_p, b_d = self.int_expr(depth + 1)
            fn = r.choice(["least", "greatest"])
            return (f"{fn}({a_p}, {b_p})", f"{fn}({a_d}, {b_d})")
        if kind == "case":
            p_p, p_d = self.pred(depth + 1)
            b_p, b_d = self.int_expr(depth + 1)
            return (
                f"(CASE WHEN {p_p} THEN {a_p} ELSE {b_p} END)",
                f"(CASE WHEN {p_d} THEN {a_d} ELSE {b_d} END)",
            )
        op = "+" if kind == "add" else "-"
        b_p, b_d = self.int_expr(depth + 1)
        return (f"({a_p} {op} {b_p})", f"({a_d} {op} {b_d})")

    def time_safe_expr(self) -> Pair:
        """Integer expression over (l_orderkey, l_linenumber) only — rows
        tied on the UNIQUE_TIME key share these columns, so the value is
        tie-invariant for *WithTime aggregates."""
        r = self.rng
        a = r.choice(["l_orderkey", "l_linenumber", str(r.randint(0, 1000))])
        b = r.choice(["l_orderkey", "l_linenumber", str(r.randint(0, 1000))])
        form = r.choice(
            [
                f"{a}",
                f"({a} + {b})",
                f"({a} - {b})",
                f"mod({a}, {r.randint(2, 13)})",
                f"abs(({a} - {b}))",
                f"(l_linenumber * {r.randint(1, 100)})",
            ]
        )
        return _same(form)

    def pinot_int_fn(self) -> Pair:
        """Pinot-named scalar macros with integer results, each rendered
        against its verified DuckDB equivalent (probed cross-engine before
        inclusion — registry coverage the plain ANSI nodes can't give)."""
        r = self.rng
        s1, s2 = r.choice(STR_COLS), r.choice(STR_COLS)
        a = r.choice(INT_COLS)
        forms = [
            (f"codepoint({s1})", f"ascii({s1})"),
            ("monthofyear(l_shipdate)", "month(l_shipdate)"),
            ("dayofyear(l_shipdate)", "dayofyear(l_shipdate)"),
            (
                f"strcmp({s1}, {s2})",
                f"CAST(CASE WHEN {s1} < {s2} THEN -1 "
                f"WHEN {s1} > {s2} THEN 1 ELSE 0 END AS INT)",
            ),
            (
                f"strpos({s1} || {s2}, 'A')",
                f"(strpos({s1} || {s2}, 'A') - 1)",
            ),
            (
                f"""jsonpathlong('{{"k": ' || {a} || '}}', '$.k')""",
                f"""CAST(json_extract_string('{{"k": ' || {a} || '}}', '$.k') AS BIGINT)""",
            ),
            (
                "CAST(power(l_linenumber, 2) AS BIGINT)",
                "CAST(power(l_linenumber, 2) AS BIGINT)",
            ),
        ]
        return forms[r.randrange(len(forms))]

    def mv_scalar(self) -> Pair:
        """Pinot MV-array macros over embeddings.embedding, each against
        its DuckDB list equivalent. Only per-row EXACT ops — float32
        values compare bit-for-bit, but fold-order-dependent sums
        (arraysum/arrayaverage) are excluded by design."""
        r = self.rng
        k = r.randint(0, 63)
        forms = [
            ("arraylength(embedding)", "len(embedding)"),
            ("arraymax(embedding)", "list_max(embedding)"),
            ("arraymin(embedding)", "list_min(embedding)"),
            (f"arrayelementat(embedding, {k})", f"embedding[{k + 1}]"),
            (
                "arrayindexof(embedding, arraymax(embedding))",
                "(list_position(embedding, list_max(embedding)) - 1)",
            ),
            (
                "arraylength(arraydistinct(embedding))",
                "len(list_distinct(embedding))",
            ),
            (
                "arraylength(arrayconcat(embedding, embedding))",
                "len(list_concat(embedding, embedding))",
            ),
            (
                f"arrayelementat(arraysort(embedding), {k})",
                f"list_sort(embedding)[{k + 1}]",
            ),
            (
                f"arrayelementat(arrayreverse(embedding), {k})",
                f"list_reverse(embedding)[{k + 1}]",
            ),
        ]
        return forms[r.randrange(len(forms))]

    # ---------------- string expressions ----------------
    def groovy_expr(self, kind: str = "numeric") -> Pair:
        """groovy() expression-subset scripts vs their plain-SQL duck
        equivalent (the dialect translates the script; the oracle is the
        same arithmetic written directly). kind='numeric' -> LONG
        arithmetic scripts (safe under sum()); kind='string' ->
        STRING-returning Java method-subset scripts (aggregate with
        min/max/count only)."""
        rng = self.rng
        a = rng.choice(SMALL_INT)
        b = rng.choice(["l_linenumber", "l_suppkey"])
        c1 = rng.randint(1, 9)
        c2 = rng.randint(1, 9)
        if kind == "string":
            # Java/Groovy String-method subset (round 9): chains, Java
            # index conventions, literal receivers
            sc = rng.choice(["l_returnflag", "l_linestatus"])
            script, duck = rng.choice(
                [
                    (
                        "arg0.concat(''_x'').toUpperCase()",
                        f"upper({sc} || '_x')",
                    ),
                    (
                        "arg0.replace(''A'', ''z'')",
                        f"replace({sc}, 'A', 'z')",
                    ),
                    (
                        "arg0.substring(0, 1)",
                        f"substr({sc}, 1, 1)",
                    ),
                    (
                        "arg0.contains(''A'') ? ''y'' : ''n''",
                        f"CASE WHEN contains({sc}, 'A') THEN 'y' ELSE 'n' END",
                    ),
                    (
                        "''p_''.concat(arg0).trim()",
                        f"trim('p_' || {sc})",
                    ),
                ]
            )
            pinot = (
                "groovy('{\"returnType\":\"STRING\"}', "
                f"'{script}', {sc})"
            )
            return pinot, duck
        script, duck = rng.choice(
            [
                (
                    f"arg0 * {c1} + arg1",
                    f"CAST(({a}) * {c1} + ({b}) AS BIGINT)",
                ),
                (
                    f"arg0 > {c1} ? arg0 + arg1 : arg1 - {c2}",
                    f"CAST(CASE WHEN ({a}) > {c1} THEN ({a}) + ({b}) "
                    f"ELSE ({b}) - {c2} END AS BIGINT)",
                ),
                (
                    "Math.max(arg0, arg1)",
                    f"CAST(GREATEST(({a}), ({b})) AS BIGINT)",
                ),
                (
                    f"Math.abs(arg0 - arg1 * {c1})",
                    f"CAST(ABS(({a}) - ({b}) * {c1}) AS BIGINT)",
                ),
            ]
        )
        pinot = (
            "groovy('{\"returnType\":\"LONG\",\"isSingleValue\":true}', "
            f"'{script}', {a}, {b})"
        )
        return pinot, duck

    def json_doc(self) -> tuple[Pair, dict]:
        """A per-row JSON document built by identical string
        concatenation on both engines (int columns cast explicitly:
        Spark STRING vs DuckDB VARCHAR is the only divergence), plus
        the ground-truth field layout for path generation."""
        rng = self.rng
        ic = rng.choice(SMALL_INT)
        sc = rng.choice(STR_COLS)
        a1 = rng.choice(INT_COLS)
        a2 = rng.choice(SMALL_INT)
        nx = rng.choice(STR_COLS)

        def doc(cast_t: str) -> str:
            c = lambda e: f"CAST({e} AS {cast_t})"  # noqa: E731
            return (
                "'{\"i\":' || " + c(ic) + " || ',\"s\":\"' || " + sc
                + " || '\",\"arr\":[' || " + c(a1) + " || ',' || " + c(a2)
                + " || '],\"n\":{\"x\":\"' || " + nx + " || '\"}}'"
            )

        return (doc("STRING"), doc("VARCHAR")), {
            "i": ic, "s": sc, "a1": a1, "a2": a2, "nx": nx,
        }

    def json_extract(self, doc: Pair) -> Pair:
        """jsonExtractScalar vs DuckDB json_extract_string over one of
        the known paths, with occasional missing-path + default."""
        rng = self.rng
        doc_p, doc_d = doc
        duck_t = {"INT": "INTEGER", "LONG": "BIGINT", "DOUBLE": "DOUBLE"}
        path, rtype = rng.choice(
            [
                ("$.i", "INT"),
                ("$.i", "LONG"),
                ("$.s", "STRING"),
                ("$.n.x", "STRING"),
                ("$.arr[0]", "INT"),
                ("$.arr[1]", "LONG"),
            ]
        )
        if rng.random() < 0.25:
            # missing path -> 4-arg default
            dflt = rng.randint(-5, 99)
            return (
                f"jsonExtractScalar({doc_p}, '$.missing', 'INT', {dflt})",
                f"COALESCE(CAST(json_extract_string({doc_d}, '$.missing')"
                f" AS INTEGER), {dflt})",
            )
        if rtype == "STRING":
            return (
                f"jsonExtractScalar({doc_p}, '{path}', 'STRING')",
                f"json_extract_string({doc_d}, '{path}')",
            )
        return (
            f"jsonExtractScalar({doc_p}, '{path}', '{rtype}')",
            f"CAST(json_extract_string({doc_d}, '{path}') AS {duck_t[rtype]})",
        )

    def str_expr(self) -> Pair:
        r = self.rng
        c = r.choice(STR_COLS)
        kind = r.choice(["col", "upper", "lower", "concat", "substr", "pinotfn"])
        if kind == "upper":
            return _same(f"upper({c})")
        if kind == "lower":
            return _same(f"lower({c})")
        if kind == "concat":
            c2 = r.choice(STR_COLS)
            return _same(f"({c} || {c2})")
        if kind == "substr":
            return _same(f"substr({c} || {r.choice(STR_COLS)}, 1, 1)")
        if kind == "pinotfn":
            c2 = r.choice(STR_COLS)
            forms = [
                (f"leftsubstr({c} || {c2}, 1)", f"left({c} || {c2}, 1)"),
                (f"rightsubstr({c} || {c2}, 1)", f"right({c} || {c2}, 1)"),
                (
                    f"remove({c} || {c2}, 'A')",
                    f"replace({c} || {c2}, 'A', '')",
                ),
                (f"md5({c})", f"md5({c})"),
                (
                    f"splitpart({c} || '-' || {c2}, '-', 1)",
                    f"split_part({c} || '-' || {c2}, '-', 2)",
                ),
                (
                    "CAST(datetrunc('month', l_shipdate) AS STRING)",
                    "CAST(CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS STRING)",
                ),
            ]
            return forms[r.randrange(len(forms))]
        return _same(c)

    # ---------------- predicates ----------------
    def pred(self, depth: int = 0) -> Pair:
        r = self.rng
        if depth < 2 and r.random() < 0.3:
            kind = r.choice(["and", "or", "not"])
            a_p, a_d = self.pred(depth + 1)
            if kind == "not":
                return (f"(NOT {a_p})", f"(NOT {a_d})")
            b_p, b_d = self.pred(depth + 1)
            op = "AND" if kind == "and" else "OR"
            return (f"({a_p} {op} {b_p})", f"({a_d} {op} {b_d})")
        kinds = ["cmp", "between", "in_int", "in_str", "str_eq", "date"]
        if depth == 0:
            # Spark only allows IN-subqueries in filter contexts, so never
            # inside CASE / boolAnd / FILTER clauses (depth >= 1)
            kinds.append("in_subquery")
        kind = r.choice(kinds)
        if kind == "in_subquery":
            # semi/anti-join pushdown (IdSet IN_SUBQUERY analog); o_orderkey
            # is non-null so NOT IN keeps its intuitive semantics
            st = r.choice(["F", "O", "P"])
            neg = "NOT IN" if r.random() < 0.3 else "IN"
            return _same(
                f"l_orderkey {neg} (SELECT o_orderkey FROM orders "
                f"WHERE o_orderstatus = '{st}')"
            )
        if kind == "cmp":
            c = r.choice(list(INT_RANGE))
            lit = r.randint(0, INT_RANGE[c])
            op = r.choice(["=", "<>", "<", "<=", ">", ">="])
            return _same(f"{c} {op} {lit}")
        if kind == "between":
            c = r.choice(list(INT_RANGE))
            lo = r.randint(0, INT_RANGE[c])
            hi = lo + r.randint(0, INT_RANGE[c])
            return _same(f"{c} BETWEEN {lo} AND {hi}")
        if kind == "in_int":
            c = r.choice(list(INT_RANGE))
            vals = sorted({r.randint(0, INT_RANGE[c]) for _ in range(r.randint(1, 5))})
            return _same(f"{c} IN ({', '.join(map(str, vals))})")
        if kind == "in_str":
            c = r.choice(STR_COLS)
            vals = r.sample(STR_DOMAIN[c], r.randint(1, len(STR_DOMAIN[c])))
            quoted = ", ".join(f"'{v}'" for v in vals)
            neg = "NOT IN" if r.random() < 0.3 else "IN"
            return _same(f"{c} {neg} ({quoted})")
        if kind == "str_eq":
            c = r.choice(STR_COLS)
            v = r.choice(STR_DOMAIN[c])
            op = r.choice(["=", "<>"])
            return _same(f"{c} {op} '{v}'")
        d = r.choice(DATES)
        op = r.choice(["<", ">=", ">"])
        return _same(f"l_shipdate {op} TIMESTAMP '{d} 00:00:00'")

    # ---------------- aggregates ----------------
    def agg(self) -> Pair:
        r = self.rng
        kind = r.choice(
            [
                "count",
                "count_expr",
                "sum",
                "min",
                "max",
                "avg",
                "distinctcount",
                "distinctsum",
                "sumprecision",
                "minmaxrange",
                "boolagg",
                "withtime",
                "filtered",
                "histogram",
                "thetaset",
            ]
        )
        if kind == "count":
            return _same("count(*)")
        e_p, e_d = self.int_expr(1)
        if kind == "count_expr":
            # null-skipping count over a (possibly nullif'd) expression
            return (f"count({e_p})", f"count({e_d})")
        if kind == "distinctcount":
            return (f"distinctcount({e_p})", f"count(DISTINCT {e_d})")
        if kind == "distinctsum":
            fn = r.choice(["distinctsum", "distinctavg"])
            duck = "sum" if fn == "distinctsum" else "avg"
            return (f"{fn}({e_p})", f"{duck}(DISTINCT {e_d})")
        if kind == "sumprecision":
            return (
                f"sumprecision({e_p})",
                f"sum(CAST({e_d} AS DECIMAL(38,18)))",
            )
        if kind == "minmaxrange":
            return (f"minmaxrange({e_p})", f"(max({e_d}) - min({e_d}))")
        if kind == "boolagg":
            p_p, p_d = self.pred(1)
            fn = r.choice(["boolAnd", "boolOr"])
            duck = "bool_and" if fn == "boolAnd" else "bool_or"
            return (f"{fn}({p_p})", f"{duck}({p_d})")
        if kind == "filtered":
            # FILTER clause (identical ANSI syntax both engines)
            p_p, p_d = self.pred(1)
            fn = r.choice(["sum", "count", "min", "max"])
            return (
                f"{fn}({e_p}) FILTER (WHERE {p_p})",
                f"{fn}({e_d}) FILTER (WHERE {p_d})",
            )
        if kind == "histogram":
            # histogram bin rule (dialect _histogram): outside-range
            # ignored, val == upper in the last bin; edges are Python
            # literals so both renderings compare identical doubles
            nb = r.randint(2, 6)
            lo, hi = 0.0, 50.0
            w = (hi - lo) / nb
            edges = [lo + i * w for i in range(nb)] + [hi]
            duck_bins = ", ".join(
                f"sum(CASE WHEN l_quantity >= {edges[i]!r} AND l_quantity "
                f"{'<=' if i == nb - 1 else '<'} {edges[i + 1]!r} "
                f"THEN 1 ELSE 0 END)"
                for i in range(nb)
            )
            return (
                f"histogram(l_quantity, 0, 50, {nb})",
                f"list_value({duck_bins})",
            )
        if kind == "thetaset":
            # filtered multi-arg distinctCountThetaSketch: random nested
            # SET_UNION/SET_INTERSECT/SET_DIFF over 1-3 fuzzed filter
            # predicates (+ the $0 default sketch). The oracle expansion
            # is derived INDEPENDENTLY of the dialect's implementation
            # (double inclusion-exclusion identity in
            # _theta_indep_expansion vs the engine's linear-system
            # solve) so a bug in the engine's minterm/weight derivation
            # produces a Spark-vs-DuckDB mismatch instead of identical
            # wrong SQL on both sides; the derivation is additionally
            # self-checked against a direct random-set simulation.
            col = r.choice(["l_suppkey", "l_partkey", "l_linenumber"])
            k = r.randint(1, 3)
            preds = [self.pred(1) for _ in range(k)]

            def set_expr(depth: int) -> str:
                if depth == 0 or r.random() < 0.4:
                    return f"${r.randint(0, k)}"
                op = r.choice(["SET_UNION", "SET_INTERSECT", "SET_DIFF"])
                n = 2 if op == "SET_DIFF" else r.randint(2, 3)
                return (
                    f"{op}({', '.join(set_expr(depth - 1) for _ in range(n))})"
                )

            expr = set_expr(2)
            pinot_filters = ", ".join(
                "'" + p.replace("'", "''") + "'" for p, _ in preds
            )
            pinot = (
                f"distinctCountThetaSketch({col}, '', {pinot_filters}, "
                f"'{expr}')"
            )
            duck = _theta_indep_duck_sql(
                expr, k, col,
                {0: "true", **{i + 1: d for i, (_, d) in enumerate(preds)}},
            )
            return (pinot, duck)
        if kind == "withtime":
            # the synthetic lineitem carries duplicate (l_orderkey,
            # l_linenumber) pairs, so the "time" expression ties; engines
            # may break ties differently. Keep the aggregated expression a
            # function of the time key only — tied rows then carry
            # identical values and the tie-break cannot show.
            fn = r.choice(["firstwithtime", "lastwithtime"])
            duck = "min_by" if fn == "firstwithtime" else "max_by"
            e, _ = self.time_safe_expr()
            return (f"{fn}({e}, {UNIQUE_TIME})", f"{duck}({e}, {UNIQUE_TIME})")
        return (f"{kind}({e_p})", f"{kind}({e_d})")

    def raw_theta_case(self) -> Pair:
        """RAW theta path end-to-end: per-filter sketches (type-pinned
        hashing), DataSketches set ops folded post-aggregation, base64
        envelope, estimated back to BIGINT via thetaSketchEstimate —
        exact below nominalEntries (fuzz-SF NDV << 65536), so the same
        INDEPENDENT expansion oracles it. Kept a dedicated query shape:
        the sketch builders are grouped-agg pandas UDFs, which Spark
        cannot place beside JVM aggregates in one SELECT."""
        r = self.rng
        col = r.choice(["l_suppkey", "l_partkey", "l_linenumber"])
        k = r.randint(1, 3)
        preds = [self.pred(1) for _ in range(k)]

        def set_expr(depth: int) -> str:
            if depth == 0 or r.random() < 0.4:
                return f"${r.randint(0, k)}"
            op = r.choice(["SET_UNION", "SET_INTERSECT", "SET_DIFF"])
            n = 2 if op == "SET_DIFF" else r.randint(2, 3)
            return f"{op}({', '.join(set_expr(depth - 1) for _ in range(n))})"

        expr = set_expr(2)
        pinot_filters = ", ".join(
            "'" + p.replace("'", "''") + "'" for p, _ in preds
        )
        pinot = (
            "thetasketchestimate(distinctCountRawThetaSketch("
            f"{col}, 'nominalEntries=65536', {pinot_filters}, '{expr}'))"
        )
        duck = _theta_indep_duck_sql(
            expr, k, col,
            {0: "true", **{i + 1: d for i, (_, d) in enumerate(preds)}},
        )
        return (pinot, duck)


@dataclass
class FuzzCase:
    name: str
    pinot_sql: str
    duck_sql: str
    shape: str


@dataclass
class FuzzResult:
    case: FuzzCase
    ok: bool
    detail: str = ""


def gen_case(rng: random.Random, idx: int) -> FuzzCase:
    g = _Gen(rng)
    shape = rng.choice(
        [
            "select",
            "select",
            "global_agg",
            "group_agg",
            "group_agg",
            "lookup",
            "join",
            "window",
            "union_all",
            "cte",
            "mv_select",
            "mv_agg",
            "json_agg",
            "json_select",
            "groovy_agg",
            "raw_sketch_agg",
        ]
    )
    w_p, w_d = g.pred()
    if shape == "raw_sketch_agg":
        # raw theta sketch set ops, alone in the SELECT (grouped-agg
        # pandas UDF placement rule); grouped half the time
        e_p, e_d = g.raw_theta_case()
        if rng.random() < 0.5:
            key = rng.choice(["l_returnflag", "l_linestatus"])
            return FuzzCase(
                f"fuzz_{idx}_rawsketch",
                f"SELECT {key} AS g0, {e_p} AS a0 FROM lineitem "
                f"WHERE {w_p} GROUP BY {key}",
                f"SELECT {key} AS g0, {e_d} AS a0 FROM lineitem "
                f"WHERE {w_d} GROUP BY {key}",
                shape,
            )
        # global shape: the single-table form restructures through the
        # two-phase builder (round 10), which returns ONE row with the
        # empty-sketch result on zero input — the reference's semantics
        # (an empty serialized sketch, estimate 0). The plain global
        # DuckDB aggregate matches: every count(DISTINCT ...) term is 0.
        return FuzzCase(
            f"fuzz_{idx}_rawsketch",
            f"SELECT {e_p} AS a0 FROM lineitem WHERE {w_p}",
            f"SELECT {e_d} AS a0 FROM lineitem WHERE {w_d}",
            shape,
        )
    if shape == "mv_select":
        n = rng.randint(1, 3)
        exprs = [g.mv_scalar() for _ in range(n)]
        sel_p = ", ".join(f"{p} AS c{i}" for i, (p, _d) in enumerate(exprs))
        sel_d = ", ".join(f"{d} AS c{i}" for i, (_p, d) in enumerate(exprs))
        lim = rng.choice([50, 200])
        return FuzzCase(
            f"fuzz_{idx}_mvsel",
            f"SELECT {sel_p}, vec_id AS vid FROM embeddings "
            f"ORDER BY vid LIMIT {lim}",
            f"SELECT {sel_d}, vec_id AS vid FROM embeddings "
            f"ORDER BY vid LIMIT {lim}",
            shape,
        )
    if shape == "mv_agg":
        # exact MV aggregates: count/min/max forms only (fold-order safe)
        pool = [
            ("countmv(embedding)", "sum(len(embedding))"),
            ("minmv(embedding)", "min(list_min(embedding))"),
            ("maxmv(embedding)", "max(list_max(embedding))"),
            ("max(arraylength(embedding))", "max(len(embedding))"),
        ]
        picks = rng.sample(pool, rng.randint(1, 3))
        agg_p = ", ".join(f"{p} AS a{i}" for i, (p, _d) in enumerate(picks))
        agg_d = ", ".join(f"{d} AS a{i}" for i, (_p, d) in enumerate(picks))
        return FuzzCase(
            f"fuzz_{idx}_mvagg",
            f"SELECT label AS g0, {agg_p}, count(*) AS n FROM embeddings "
            f"GROUP BY label",
            f"SELECT label AS g0, {agg_d}, count(*) AS n FROM embeddings "
            f"GROUP BY label",
            shape,
        )
    if shape == "groovy_agg":
        key = rng.choice(["l_returnflag", "l_linestatus"])
        if rng.random() < 0.35:
            # STRING-returning method-subset script: aggregate with the
            # order-safe min/max/count (sum over strings is a cast error)
            gp, gd = g.groovy_expr(kind="string")
            return FuzzCase(
                f"fuzz_{idx}_groovy",
                f"SELECT {key} AS k, min({gp}) AS mn, max({gp}) AS m, "
                f"count(*) AS n FROM lineitem WHERE {w_p} GROUP BY {key}",
                f"SELECT {key} AS k, min({gd}) AS mn, max({gd}) AS m, "
                f"count(*) AS n FROM lineitem WHERE {w_d} GROUP BY {key}",
                shape,
            )
        gp, gd = g.groovy_expr()
        return FuzzCase(
            f"fuzz_{idx}_groovy",
            f"SELECT {key} AS k, sum({gp}) AS s, max({gp}) AS m, "
            f"count(*) AS n FROM lineitem WHERE {w_p} GROUP BY {key}",
            f"SELECT {key} AS k, sum({gd}) AS s, max({gd}) AS m, "
            f"count(*) AS n FROM lineitem WHERE {w_d} GROUP BY {key}",
            shape,
        )
    if shape in ("json_agg", "json_select"):
        doc, _fields = g.json_doc()
        n = rng.randint(1, 3)
        exprs = [g.json_extract(doc) for _ in range(n)]
        sel_p = ", ".join(f"{p} AS c{i}" for i, (p, _d) in enumerate(exprs))
        sel_d = ", ".join(f"{d} AS c{i}" for i, (_p, d) in enumerate(exprs))
        if shape == "json_select":
            return FuzzCase(
                f"fuzz_{idx}_jsonsel",
                f"SELECT {sel_p}, l_orderkey AS ok FROM lineitem WHERE {w_p}",
                f"SELECT {sel_d}, l_orderkey AS ok FROM lineitem WHERE {w_d}",
                shape,
            )
        ks = ", ".join(f"c{i}" for i in range(n))
        return FuzzCase(
            f"fuzz_{idx}_jsonagg",
            f"SELECT {sel_p}, count(*) AS cnt FROM lineitem WHERE {w_p} "
            f"GROUP BY {ks}",
            f"SELECT {sel_d}, count(*) AS cnt FROM lineitem WHERE {w_d} "
            f"GROUP BY {ks}",
            shape,
        )
    if shape == "select":
        n = rng.randint(1, 4)
        exprs = [
            (g.int_expr() if rng.random() < 0.7 else g.str_expr()) for _ in range(n)
        ]
        sel_p = ", ".join(f"{p} AS c{i}" for i, (p, _d) in enumerate(exprs))
        sel_d = ", ".join(f"{d} AS c{i}" for i, (_p, d) in enumerate(exprs))
        # explicit null placement: Spark defaults NULLS FIRST on ASC,
        # DuckDB NULLS LAST — under LIMIT that changes the selected set
        order = (
            ", ".join(f"c{i} ASC NULLS FIRST" for i in range(n))
            + ", l_orderkey, l_linenumber"
        )
        lim = rng.choice([20, 50, 100, 500])
        return FuzzCase(
            f"fuzz_{idx}_select",
            f"SELECT {sel_p}, l_orderkey AS ok, l_linenumber AS ln FROM lineitem "
            f"WHERE {w_p} ORDER BY {order} LIMIT {lim}",
            f"SELECT {sel_d}, l_orderkey AS ok, l_linenumber AS ln FROM lineitem "
            f"WHERE {w_d} ORDER BY {order} LIMIT {lim}",
            shape,
        )
    if shape == "lookup":
        # lookUp() dimension join (dialect -> correlated min() scalar
        # subquery -> BroadcastHashJoin); modulus past the dim key domain
        # exercises the left-miss NULL path
        m = rng.randint(4, 7)
        key = f"mod(l_suppkey, {m})"
        lim = rng.choice([50, 200])
        order = "rname ASC NULLS FIRST, ok, ln"
        return FuzzCase(
            f"fuzz_{idx}_lookup",
            f"SELECT lookup('region', 'r_name', 'r_regionkey', {key}) AS rname, "
            f"l_orderkey AS ok, l_linenumber AS ln FROM lineitem "
            f"WHERE {w_p} ORDER BY {order} LIMIT {lim}",
            f"SELECT (SELECT min(r_name) FROM region WHERE r_regionkey = {key}) "
            f"AS rname, l_orderkey AS ok, l_linenumber AS ln FROM lineitem "
            f"WHERE {w_d} ORDER BY {order} LIMIT {lim}",
            shape,
        )
    if shape == "join":
        # fact-fact equi-join (ANSI, identical both engines); predicate
        # stays on the lineitem side, aggregates over fuzzed expressions
        a_p, a_d = g.agg()
        key = rng.choice(["o_orderstatus", "o_orderpriority"])
        return FuzzCase(
            f"fuzz_{idx}_join",
            f"SELECT {key} AS g0, count(*) AS n, {a_p} AS a0 "
            f"FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            f"WHERE {w_p} GROUP BY {key}",
            f"SELECT {key} AS g0, count(*) AS n, {a_d} AS a0 "
            f"FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            f"WHERE {w_d} GROUP BY {key}",
            shape,
        )
    if shape == "window" and rng.random() < 0.4:
        # running frame + rank: the running-sum expression is a function
        # of the total ordering columns, so exact-duplicate rows add equal
        # increments and the prefix-sum multiset is order-invariant; rank/
        # dense_rank are tie-stable by definition
        base = rng.choice(["l_orderkey", "l_linenumber", "l_suppkey", "l_partkey"])
        e = rng.choice([base, f"mod({base}, {rng.randint(2, 13)})", f"({base} + 3)"])
        rk = rng.choice(["rank()", "dense_rank()"])
        order = "l_orderkey, l_linenumber, l_suppkey, l_partkey"

        def wf(where: str) -> str:
            return (
                f"SELECT l_orderkey AS ok, l_linenumber AS ln, l_suppkey AS sk, "
                f"l_partkey AS pk, "
                f"sum({e}) OVER (ORDER BY {order} ROWS BETWEEN UNBOUNDED "
                f"PRECEDING AND CURRENT ROW) AS rs, "
                f"{rk} OVER (ORDER BY l_returnflag) AS rk "
                f"FROM lineitem WHERE {where}"
            )

        return FuzzCase(f"fuzz_{idx}_wframe", wf(w_p), wf(w_d), shape)
    if shape == "window":
        # windowed aggregate + row_number: project exactly the ordering
        # columns so exact-duplicate rows make rank ties multiset-invariant
        e_p, e_d = g.int_expr()
        key = rng.choice(["l_returnflag", "l_linestatus", "l_linenumber"])
        return FuzzCase(
            f"fuzz_{idx}_window",
            f"SELECT l_orderkey AS ok, l_linenumber AS ln, "
            f"sum({e_p}) OVER (PARTITION BY {key}) AS w, "
            f"ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber, l_suppkey, l_partkey, " f"{key}) AS rn, "
            f""
            f"l_suppkey AS sk, l_partkey AS pk "
            f"FROM lineitem WHERE {w_p}",
            f"SELECT l_orderkey AS ok, l_linenumber AS ln, "
            f"sum({e_d}) OVER (PARTITION BY {key}) AS w, "
            f"ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber, l_suppkey, l_partkey, " f"{key}) AS rn, "
            f""
            f"l_suppkey AS sk, l_partkey AS pk "
            f"FROM lineitem WHERE {w_d}",
            shape,
        )
    if shape == "union_all":
        e_p, e_d = g.int_expr()
        w2_p, w2_d = g.pred()
        return FuzzCase(
            f"fuzz_{idx}_union",
            f"SELECT {e_p} AS c0 FROM lineitem WHERE {w_p} "
            f"UNION ALL SELECT {e_p} AS c0 FROM lineitem WHERE {w2_p}",
            f"SELECT {e_d} AS c0 FROM lineitem WHERE {w_d} "
            f"UNION ALL SELECT {e_d} AS c0 FROM lineitem WHERE {w2_d}",
            shape,
        )
    if shape == "cte":
        e_p, e_d = g.int_expr()
        key = rng.choice(["l_returnflag", "l_linenumber"])
        return FuzzCase(
            f"fuzz_{idx}_cte",
            f"WITH t AS (SELECT {key} AS k, {e_p} AS v FROM lineitem WHERE {w_p}) "
            f"SELECT k, count(*) AS n, sum(v) AS s, min(v) AS mn FROM t GROUP BY k",
            f"WITH t AS (SELECT {key} AS k, {e_d} AS v FROM lineitem WHERE {w_d}) "
            f"SELECT k, count(*) AS n, sum(v) AS s, min(v) AS mn FROM t GROUP BY k",
            shape,
        )
    n = rng.randint(1, 3)
    aggs = [g.agg() for _ in range(n)]
    agg_p = ", ".join(f"{p} AS a{i}" for i, (p, _d) in enumerate(aggs))
    agg_d = ", ".join(f"{d} AS a{i}" for i, (_p, d) in enumerate(aggs))
    if shape == "global_agg":
        return FuzzCase(
            f"fuzz_{idx}_global",
            f"SELECT {agg_p} FROM lineitem WHERE {w_p}",
            f"SELECT {agg_d} FROM lineitem WHERE {w_d}",
            shape,
        )
    keys = rng.sample(GROUP_KEYS, rng.randint(1, 2))
    keysel = ", ".join(f"{k} AS g{i}" for i, k in enumerate(keys))
    having_p = having_d = ""
    if rng.random() < 0.4:
        hp, hd = rng.choice(
            [
                _same(f"count(*) > {rng.randint(0, 200)}"),
                _same(f"sum(l_linenumber) >= {rng.randint(0, 500)}"),
                _same(f"min(l_orderkey) < {rng.randint(0, 6000)}"),
                (
                    f"distinctcount(l_suppkey) >= {rng.randint(0, 10)}",
                    f"count(DISTINCT l_suppkey) >= {rng.randint(0, 10)}",
                ),
            ]
        )
        # the pinot/duck literal must agree: regenerate as a shared pair
        if hp != hd:
            n = rng.randint(0, 10)
            hp = f"distinctcount(l_suppkey) >= {n}"
            hd = f"count(DISTINCT l_suppkey) >= {n}"
        having_p, having_d = f" HAVING {hp}", f" HAVING {hd}"
    gby = ", ".join(keys)
    tail = ""
    if rng.random() < 0.3:
        # grouped output keys are unique, so ORDER BY keys + LIMIT is
        # deterministic (explicit NULLS FIRST for engine agreement)
        tail = (
            " ORDER BY "
            + ", ".join(f"g{i} ASC NULLS FIRST" for i in range(len(keys)))
            + f" LIMIT {rng.choice([3, 5, 10])}"
        )
    return FuzzCase(
        f"fuzz_{idx}_group",
        f"SELECT {keysel}, {agg_p} FROM lineitem WHERE {w_p} "
        f"GROUP BY {gby}{having_p}{tail}",
        f"SELECT {keysel}, {agg_d} FROM lineitem WHERE {w_d} "
        f"GROUP BY {gby}{having_d}{tail}",
        shape,
    )


def gen_cases(seed: int, n: int) -> list[FuzzCase]:
    rng = random.Random(seed)
    return [gen_case(rng, i) for i in range(n)]


def _norm(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return "0"
        return f"{v:.9g}"
    import decimal

    if isinstance(v, decimal.Decimal):
        return f"{float(v):.9g}"
    return str(v)


def _rowset(rows) -> list[str]:
    return sorted("|".join(_norm(v) for v in r) for r in rows)


def run_fuzz(
    spark: SparkSession,
    sf_dir: str,
    seed: int = 0,
    n: int = 300,
    cases: list[FuzzCase] | None = None,
) -> list[FuzzResult]:
    """Run `n` generated cases: Pinot dialect on Spark vs DuckDB oracle.

    Cases run CONCURRENTLY (guide §2.6 — independent sub-second actions
    issued sequentially left the scheduler idle; round-16). Safe:
    HurricaneSQL.sql() is thread-safe (uuid-named rebind views,
    thread-local query options), and each worker uses its own DuckDB
    cursor over the shared view catalog. Result order stays the
    deterministic case order (pool.map)."""
    from concurrent.futures import ThreadPoolExecutor

    from hurricanedb_spark.sql.dialect import HurricaneSQL

    hdb = HurricaneSQL(spark, sf_dir)
    con = duckdb.connect()
    for t in ("lineitem", "region", "orders", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    def run_one(case: FuzzCase) -> FuzzResult:
        try:
            srows = [
                tuple(r)
                for r in hdb.sql(case.pinot_sql, default_limit=None).collect()
            ]
            orows = con.cursor().execute(case.duck_sql).fetchall()
        except Exception as e:  # noqa: BLE001
            return FuzzResult(case, False, f"error: {e}")
        if len(srows) != len(orows):
            return FuzzResult(
                case, False, f"rowcount spark={len(srows)} duckdb={len(orows)}"
            )
        if _rowset(srows) != _rowset(orows):
            diff = [
                (a, b)
                for a, b in zip(_rowset(srows), _rowset(orows))
                if a != b
            ][:2]
            return FuzzResult(case, False, f"values: {diff}")
        return FuzzResult(case, True)

    with ThreadPoolExecutor(max_workers=8) as pool:
        return list(
            pool.map(run_one, cases if cases is not None else gen_cases(seed, n))
        )
