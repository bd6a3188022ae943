"""Property-based tests (hypothesis): Spark operators vs pure-Python
models on generated data — the reference's randomized-correctness idea
(e.g. its fuzzy H2 comparisons) with explicit models.

Examples are kept small and deduplicated into single DataFrames per case so
each property runs a handful of Spark jobs, not hundreds.
"""

from __future__ import annotations

from collections import Counter, defaultdict

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from hurricanedb_spark.operators import dedup as dd
from hurricanedb_spark.operators.upsert import upsert_view

KEYS = st.sampled_from(["a", "b", "c"])
ROWS = st.lists(
    st.tuples(KEYS, st.integers(0, 5), st.integers(0, 100)),
    min_size=1,
    max_size=20,
)


@settings(max_examples=15, deadline=None)
@given(rows=ROWS)
def test_upsert_view_matches_model(spark, rows):
    # rows: (pk, cmp, arrival-disambiguator). Make arrival unique.
    data = [(k, c, i, float(i)) for i, (k, c, _) in enumerate(rows)]
    df = spark.createDataFrame(data, "pk string, cmp int, arrival int, v double")
    got = {r.pk: (r.cmp, r.arrival) for r in upsert_view(df, ["pk"], "cmp", "arrival").collect()}

    model: dict[str, tuple[int, int]] = {}
    for k, c, a, _ in data:
        if k not in model or (c, a) > model[k]:
            model[k] = (c, a)
    assert got == model


@settings(max_examples=15, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=30), min_size=1, max_size=8
    )
)
def test_jaccard_matches_model(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    sh = df.select("doc_id", dd.word_shingles(F.col("text"), 2).alias("sh"))
    pairs = (
        sh.alias("l")
        .join(sh.alias("r"), F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("a"),
            F.col("r.doc_id").alias("b"),
            dd.jaccard(F.col("l.sh"), F.col("r.sh")).alias("j"),
        )
        .collect()
    )

    def shingles(t: str) -> set:
        toks = [w for w in t.strip().split() if w]
        if not toks:
            return set()
        if len(toks) == 1:
            return {toks[0]}
        return {" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)}

    model = {i: shingles(t) for i, t in enumerate(texts)}
    for r in pairs:
        sa, sb = model[r.a], model[r.b]
        if not sa and not sb:
            want = 1.0
        else:
            want = len(sa & sb) / len(sa | sb) if (sa | sb) else 1.0
        assert abs(r.j - want) < 1e-9, (texts, r.a, r.b, r.j, want)


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(
        st.tuples(KEYS, st.floats(-100, 100, allow_nan=False)), min_size=1, max_size=25
    )
)
def test_exact_decimal_sum_matches_model(spark, vals):
    from decimal import ROUND_HALF_UP, Decimal

    df = spark.createDataFrame([(k, float(v)) for k, v in vals], "k string, v double")
    got = {
        r.k: r.s
        for r in df.groupBy("k")
        .agg(F.sum(F.col("v").cast("decimal(12,4)")).alias("s"))
        .collect()
    }
    model: dict[str, Decimal] = defaultdict(lambda: Decimal(0))
    for k, v in vals:
        model[k] += Decimal(str(float(v))).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
    for k, want in model.items():
        assert got[k] == want, (vals, k, got[k], want)


@settings(max_examples=10, deadline=None)
@given(rows=st.lists(st.tuples(KEYS, st.integers(0, 3)), min_size=1, max_size=25))
def test_mode_formulation_matches_counter(spark, rows):
    df = spark.createDataFrame([(k, v) for k, v in rows], "k string, v int")
    counts = df.groupBy("k", "v").agg(F.count(F.lit(1)).alias("c"))
    from pyspark.sql import Window as W

    w = W.partitionBy("k").orderBy(F.desc("c"), F.asc("v"))
    got = {
        r.k: r.v
        for r in counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    per_key = defaultdict(list)
    for k, v in rows:
        per_key[k].append(v)
    for k, vs in per_key.items():
        c = Counter(vs)
        best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        assert got[k] == best
