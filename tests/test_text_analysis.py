"""Text-analysis operator tests: tokenization, quality, lang-id,
fingerprint — on inline edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from hurricanedb_spark.operators import text_analysis as ta


def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col.alias("v")).collect()[0].v


def test_token_count_edges(spark):
    assert _one(spark, "a b  c", ta.token_count(F.col("text"))) == 3
    assert _one(spark, "", ta.token_count(F.col("text"))) == 0
    assert _one(spark, "   ", ta.token_count(F.col("text"))) == 0
    assert _one(spark, "one", ta.token_count(F.col("text"))) == 1


def test_stopword_and_punct_ratio(spark):
    v = _one(spark, "the cat and the dog", ta.stopword_ratio(ta.tokens(F.col("text"))))
    assert abs(v - 3 / 5) < 1e-9
    p = _one(spark, "a,b.c", ta.punct_ratio(F.col("text")))
    assert abs(p - 2 / 5) < 1e-9


def test_quality_score_bounds(spark):
    v = _one(spark, "the quick brown fox jumps over the lazy dog today", ta.quality_score(F.col("text")))
    assert 0.0 <= v <= 1.0
    assert v > 0.7  # clean sentence scores high
    junk = _one(spark, "!!! ??? ***", ta.quality_score(F.col("text")))
    assert junk < v


def test_lang_id_markers(spark):
    assert _one(spark, "der Hund und die Katze ist", ta.lang_id(F.col("text"))) == "de"
    assert _one(spark, "the cat and the dog of it", ta.lang_id(F.col("text"))) == "en"
    assert _one(spark, "xyzzy qwerty", ta.lang_id(F.col("text"))) == "und"


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [("Hello,  WORLD!",), ("hello world",)], "text string"
    )
    fps = [r.f for r in df.select(ta.fingerprint(F.col("text")).alias("f")).collect()]
    assert fps[0] == fps[1]


def test_bpe_ish_token_count(spark):
    v = _one(spark, "hello world42 foo-bar", ta.bpe_ish_token_count(F.col("text")))
    # hello | world | 42 | foo | bar
    assert v == 5
