"""Benchmark-contamination detection for training-data pipelines.

Before a corpus is used for model training, every document must be
checked against the evaluation benchmarks for n-gram overlap (the
standard decontamination step: a document sharing a large fraction of a
benchmark item's n-grams leaks the benchmark into training). This is a
first-class pipeline operator here, alongside dedup (operators/dedup.py)
— the reference engine has no analog; the op reuses its text stack
(word_shingles) so the shingle definition matches the dedup family.

Scale design (the part that matters at 100 TB):
  - The benchmark side is SMALL by construction (eval suites are 1e3-1e5
    items). Its distinct (gram, bench_id) pairs and per-benchmark gram
    counts are broadcast — the corpus NEVER shuffles for the join.
  - The corpus explodes to one row per distinct (doc, gram) — O(tokens),
    linear in corpus size, embarrassingly parallel, no self-join.
  - Exactly ONE shuffle: the per-(doc_id, bench_id) match count, whose
    volume is bounded by actual collisions (docs sharing zero grams with
    every benchmark item — the overwhelming majority — are dropped by the
    inner broadcast join before the exchange).
All expressions are JVM-side higher-order functions; no Python in the
hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from hurricanedb_spark.operators.dedup import norm_tokens, shingles_from_tokens, word_shingles
from hurricanedb_spark.operators.skew import fan_out


def ngram_set(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams with empty grams dropped (documents shorter
    than n words contribute their single partial gram)."""
    return F.filter(word_shingles(text, n), lambda g: g != "")


def ngram_set_from_tokens(toks: Column, n: int = 3) -> Column:
    """`ngram_set` over a MATERIALIZED token-array column — the hot-path
    form (see dedup.shingles_from_tokens for the lambda-capture cost)."""
    return F.filter(shingles_from_tokens(toks, n), lambda g: g != "")


def ngram_overlap_report(
    corpus: DataFrame,
    bench: DataFrame,
    *,
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    text_col: str = "text",
    n: int = 3,
    min_overlap: float = 0.5,
) -> DataFrame:
    """Per (corpus doc, benchmark item) n-gram overlap report.

    Returns (id_col, bench_id_col, matched_grams, bench_grams, overlap)
    for every pair whose overlap = |corpus∩bench grams| / |bench grams|
    reaches min_overlap — the containment of the benchmark item in the
    document, the direction decontamination cares about."""
    # two-step tokenization (round-15): materialize the token array, then
    # shingle from the bound ref — the inline form re-ran the tokenizer
    # per gram inside the transform lambda (dedup.shingles_from_tokens).
    # fan_out: the tokenize+shingle+explode pass otherwise runs on the
    # corpus scan's task count (one, for a single-row-group file); the
    # bench side stays narrow — it is small by construction.
    corpus_grams = (
        fan_out(corpus).withColumn("__toks", norm_tokens(F.col(text_col)))
        .select(
            F.col(id_col),
            F.explode(ngram_set_from_tokens(F.col("__toks"), n)).alias("gram"),
        )
    )
    bench_grams = (
        bench.withColumn("__toks", norm_tokens(F.col(text_col)))
        .select(
            F.col(bench_id_col),
            F.explode(ngram_set_from_tokens(F.col("__toks"), n)).alias("gram"),
        )
        .distinct()
    )
    bench_sizes = bench_grams.groupBy(bench_id_col).agg(
        F.count(F.lit(1)).alias("bench_grams")
    )
    matched = (
        corpus_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col, bench_id_col)
        .agg(F.count(F.lit(1)).alias("matched_grams"))
    )
    return (
        matched.join(F.broadcast(bench_sizes), bench_id_col)
        .withColumn(
            "overlap",
            F.col("matched_grams").cast("double") / F.col("bench_grams"),
        )
        .filter(F.col("overlap") >= min_overlap)
        .select(id_col, bench_id_col, "matched_grams", "bench_grams", "overlap")
    )
