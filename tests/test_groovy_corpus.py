"""groovy() coverage driven by the reference's own test corpus
(pinot-core/src/test/.../GroovyFunctionEvaluatorTest.java
groovyFunctionEvaluationDataProvider — 11 patterns).

Every corpus pattern either TRANSLATES (executed here against the same
inputs/expected outputs, with column refs bound positionally as argN)
or REJECTS with the documented subset error (no Groovy runtime exists
in this engine; closures/spread/map receivers are the rejection class).
Round-10 additions under test: right-associative ternary chains and
parenthesized nesting, Java casts `(long)(...)` + `Long.parseLong`,
DigestUtils sha256Hex, double-quoted literals, and Groovy null-compare
semantics (`x != null` is TRUE for non-null x — not SQL's NULL).
"""

from __future__ import annotations

import pytest

from hurricanedb_spark.sql.dialect import HurricaneSQL, translate_groovy

IMETA = "'{\"returnType\":\"INT\",\"isSingleValue\":true}'"
LMETA = "'{\"returnType\":\"LONG\",\"isSingleValue\":true}'"
SMETA = "'{\"returnType\":\"STRING\",\"isSingleValue\":true}'"


@pytest.fixture(scope="module")
def hdb(spark):
    return HurricaneSQL(spark)


def _one(hdb, expr_sql: str, view_sql: str | None = None):
    if view_sql:
        hdb.spark.sql(view_sql)
    return hdb.sql(f"SELECT {expr_sql} AS r", default_limit=None).collect()[0]["r"]


def _sel(hdb, expr_sql: str, from_sql: str):
    return hdb.sql(
        f"SELECT {expr_sql} AS r FROM {from_sql}", default_limit=None
    ).collect()[0]["r"]


def test_corpus_1_identity(hdb, spark):
    """Groovy({userID}, userID) -> 101"""
    spark.createDataFrame([(101,)], "userID int").createOrReplaceTempView(
        "g_c1"
    )
    assert _sel(hdb, f"groovy({IMETA}, 'arg0', userID)", "g_c1") == 101


def test_corpus_2_map_spread_rejects():
    """Groovy({map1.sort()*.value}, map1): map receiver + spread operator
    — no Groovy runtime; MAP columns don't exist post-ingestion
    (ComplexTypeTransformer flattens them). Must reject loudly."""
    with pytest.raises(ValueError, match="unsupported method|subset"):
        translate_groovy([SMETA, "'arg0.sort()*.value'", "m"])


def test_corpus_3_closure_rejects():
    """Groovy({campaigns.max{ it.toBigDecimal() }}, campaigns): closures
    are statements-in-braces — the structural guard rejects them."""
    with pytest.raises(ValueError, match="subset"):
        translate_groovy(
            [SMETA, "'arg0.max{ it.toBigDecimal() }'", "campaigns"]
        )


def test_corpus_4_parse_long_cast_bucketing(hdb, spark):
    """Groovy({(long)(Long.parseLong(millis)/(1000*60*60))}, millis)
    -> 440011L. Groovy `/` over integers is decimal division; the
    (long) cast truncates — CAST(x/y AS BIGINT) reproduces both."""
    spark.createDataFrame(
        [("1584040201500",)], "millis string"
    ).createOrReplaceTempView("g_c4")
    got = _sel(
        hdb,
        f"groovy({LMETA}, '(long)(Long.parseLong(arg0)/(1000*60*60))', millis)",
        "g_c4",
    )
    assert got == 440011


def test_corpus_5_string_concat(hdb, spark):
    """Groovy({firstName + ' ' + lastName}) -> 'John Doe'"""
    spark.createDataFrame(
        [("John", "Doe")], "fn string, ln string"
    ).createOrReplaceTempView("g_c5")
    got = _sel(
        hdb,
        f"groovy({SMETA}, 'arg0 + '' '' + arg1', fn, ln)",
        "g_c5",
    )
    assert got == "John Doe"


def test_corpus_6_7_ternary_on_equality(hdb, spark):
    """Groovy({eventType == 'IMPRESSION' ? 1: 0}) -> 1 / 0"""
    spark.createDataFrame(
        [("IMPRESSION",), ("CLICK",)], "eventType string"
    ).createOrReplaceTempView("g_c67")
    rows = hdb.sql(
        f"SELECT groovy({IMETA}, 'arg0 == ''IMPRESSION'' ? 1: 0', "
        "eventType) AS r FROM g_c67 ORDER BY eventType",
        default_limit=None,
    ).collect()
    assert [r["r"] for r in rows] == [0, 1]  # CLICK, IMPRESSION


def test_corpus_8_sha256hex(hdb, spark):
    """Groovy({org.apache.commons.codec.digest.DigestUtils.sha256Hex(ssn)})
    -> the corpus's expected lowercase hex digest."""
    spark.createDataFrame(
        [("123-45-6789",)], "ssn string"
    ).createOrReplaceTempView("g_c8")
    got = _sel(
        hdb,
        f"groovy({SMETA}, "
        "'org.apache.commons.codec.digest.DigestUtils.sha256Hex(arg0)', ssn)",
        "g_c8",
    )
    assert got == (
        "01a54629efb952287e554eb23ef69c52097a75aecc0e3a93ca0855ab6d7a31a0"
    )
    # short receiver form too
    got2 = _sel(
        hdb, f"groovy({SMETA}, 'DigestUtils.sha256Hex(arg0)', ssn)", "g_c8"
    )
    assert got2 == got


def test_corpus_9_null_coalesce_ternary(hdb, spark):
    """Groovy({ArrTimeV2 != null ? ArrTimeV2: ArrTime}) with ArrTimeV2
    null -> 101. Groovy's `!= null` is a real non-null test — SQL's
    three-valued `!= NULL` (never true) would silently flip the branch
    for NON-null values, so both rows are asserted."""
    spark.createDataFrame(
        [(101, None), (101, 55)], "ArrTime int, ArrTimeV2 int"
    ).createOrReplaceTempView("g_c9")
    rows = hdb.sql(
        f"SELECT groovy({IMETA}, 'arg1 != null ? arg1: arg0', "
        "ArrTime, ArrTimeV2) AS r FROM g_c9 ORDER BY r",
        default_limit=None,
    ).collect()
    assert [r["r"] for r in rows] == [55, 101]


def test_corpus_10_length_vs_dquote_literal(hdb, spark):
    """Groovy({jello != null ? jello.length() : "Jello"}) -> 5; the
    double-quoted literal converts to a SQL literal and the INT cast
    lands the corpus's integer result."""
    spark.createDataFrame([("Jello",)], "jello string") \
        .createOrReplaceTempView("g_c10")
    script = "'arg0 != null ? arg0.length() : \"Jello\"'"
    got = _sel(hdb, f"groovy({IMETA}, {script}, jello)", "g_c10")
    assert got == 5


def test_corpus_11_null_receiver_yields_null(hdb, spark):
    """Groovy({nullValue == null ? nullValue.length() : "Jello"}) with a
    null input: the reference's evaluator returns null (NPE swallowed);
    SQL's length(NULL) IS NULL — same observable."""
    spark.createDataFrame(
        [(None,)], "nullValue string"
    ).createOrReplaceTempView("g_c11")
    got = _sel(
        hdb,
        f"groovy({IMETA}, "
        "'arg0 == null ? arg0.length() : \"Jello\"', nullValue)",
        "g_c11",
    )
    assert got is None


def test_ternary_chain_right_associative(hdb, spark):
    """a ? b : c ? d : e == a ? b : (c ? d : e) — Groovy/Java right
    associativity."""
    spark.createDataFrame(
        [(1,), (5,), (9,)], "x int"
    ).createOrReplaceTempView("g_chain")
    rows = hdb.sql(
        f"SELECT groovy({SMETA}, "
        "'arg0 < 3 ? ''lo'' : arg0 < 7 ? ''mid'' : ''hi''', x) AS r "
        "FROM g_chain ORDER BY x",
        default_limit=None,
    ).collect()
    assert [r["r"] for r in rows] == ["lo", "mid", "hi"]


def test_ternary_parenthesized_nesting(hdb, spark):
    """(cond ? x : y) nested inside branches and conditions."""
    spark.createDataFrame([(4, 2)], "a int, b int") \
        .createOrReplaceTempView("g_nest")
    got = _sel(
        hdb,
        f"groovy({IMETA}, "
        "'arg0 > 3 ? (arg1 > 1 ? 10 : 20) : (arg1 > 1 ? 30 : 40)', a, b)",
        "g_nest",
    )
    assert got == 10


def test_groovy_gstring_interpolation_rejects():
    with pytest.raises(ValueError, match="subset"):
        translate_groovy([SMETA, '\'"prefix-${arg0}"\'', "x"])


def test_groovy_int_cast_and_parse_int():
    out = translate_groovy([IMETA, "'(int)(arg0 / 2)'", "x"])
    assert "CAST((( x ) / 2) AS INT)".replace(" ", "") in out.replace(" ", "")
    out2 = translate_groovy([IMETA, "'Integer.parseInt(arg0)'", "s"])
    assert "AS INT)" in out2
