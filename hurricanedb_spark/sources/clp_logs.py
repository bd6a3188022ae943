"""CLP-style log encoding: decompose unstructured log messages into a
static template plus variable columns.

Reference: the CLP log input format plugin
(pinot-plugins/pinot-input-format/pinot-clp-log/.../CLPLogRecordExtractor.java:37-70)
encodes a configured message field into three stored columns:

  {field}_logtype         static text with variable placeholders
  {field}_dictionaryVars  repetitive textual variable values (array<string>)
  {field}_encodedVars     numeric variable values (array<long>)

The reference delegates tokenization/classification to the CLP compressor
front-end (com.yscope.clp VariablesSchemaV2). This module implements the
same decomposition Spark-first with built-in higher-order functions only —
`split` / `transform` / `filter` / `array_join` / `aggregate` — so encode,
decode, and template search all stay inside whole-stage codegen (no UDFs,
no Python in the hot path), and the plan scales as a pure narrow map over
the scan at any data size.

Simplifications vs the CLP front-end (documented deviations):
  - Tokens are whitespace-delimited (CLP has a larger delimiter set).
  - Integer tokens become encoded vars; float and digit-bearing tokens
    (identifiers like "container-14", "0x3f8a") become dictionary vars.
    (CLP additionally packs floats into its encoded-var longs with a
    custom lossless scheme; keeping them textual is lossless here too.)
  - Placeholders use CLP's 0x11 (dict var) / 0x12 (encoded var) bytes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# CLP placeholder bytes (EncodedMessage logtype convention).
DICT_VAR_PLACEHOLDER = "\x11"
ENCODED_VAR_PLACEHOLDER = "\x12"

LOGTYPE_SUFFIX = "_logtype"
DICT_VARS_SUFFIX = "_dictionaryVars"
ENCODED_VARS_SUFFIX = "_encodedVars"

_INT_RE = "^-?[0-9]+$"
_HAS_DIGIT_RE = "[0-9]"


def _tokens(col: Column) -> Column:
    return F.split(col, " ")


def _is_encoded(tok: Column) -> Column:
    return tok.rlike(_INT_RE)


def _is_dict(tok: Column) -> Column:
    return tok.rlike(_HAS_DIGIT_RE) & ~tok.rlike(_INT_RE)


def clp_encode(df: DataFrame, field: str, drop: bool = True) -> DataFrame:
    """Add CLP decomposition columns for a string `field`.

    Output columns mirror CLPLogRecordExtractor.LOGTYPE_COLUMN_SUFFIX /
    DICTIONARY_VARS_COLUMN_SUFFIX / ENCODED_VARS_COLUMN_SUFFIX; the source
    column is dropped (the reference stores only the decomposition).
    """
    toks = _tokens(F.col(field))
    logtype = F.array_join(
        F.transform(
            toks,
            lambda t: F.when(_is_encoded(t), F.lit(ENCODED_VAR_PLACEHOLDER))
            .when(_is_dict(t), F.lit(DICT_VAR_PLACEHOLDER))
            .otherwise(t),
        ),
        " ",
    )
    dict_vars = F.filter(toks, _is_dict)
    encoded_vars = F.transform(F.filter(toks, _is_encoded), lambda t: t.cast("bigint"))
    out = (
        df.withColumn(field + LOGTYPE_SUFFIX, logtype)
        .withColumn(field + DICT_VARS_SUFFIX, dict_vars)
        .withColumn(field + ENCODED_VARS_SUFFIX, encoded_vars)
    )
    return out.drop(field) if drop else out


def clp_decode(df: DataFrame, field: str, out_col: str | None = None) -> DataFrame:
    """Reconstruct the original message from the decomposition (lossless
    inverse of `clp_encode` for whitespace-normalized messages).

    Implemented as one `aggregate` fold over the logtype tokens carrying
    (result, next-dict-index, next-encoded-index) state — still built-in
    expressions, no UDF.
    """
    out_col = out_col or field
    lt, dv, ev = field + LOGTYPE_SUFFIX, field + DICT_VARS_SUFFIX, field + ENCODED_VARS_SUFFIX
    expr = f"""
    aggregate(
      split(`{lt}`, ' '),
      named_struct('parts', cast(array() as array<string>), 'di', 0, 'ei', 0),
      (acc, t) -> CASE
        WHEN t = '{DICT_VAR_PLACEHOLDER}'
          THEN named_struct('parts',
                            array_append(acc.parts, element_at(`{dv}`, acc.di + 1)),
                            'di', acc.di + 1, 'ei', acc.ei)
        WHEN t = '{ENCODED_VAR_PLACEHOLDER}'
          THEN named_struct('parts',
                            array_append(acc.parts,
                                         cast(element_at(`{ev}`, acc.ei + 1) as string)),
                            'di', acc.di, 'ei', acc.ei + 1)
        ELSE named_struct('parts', array_append(acc.parts, t), 'di', acc.di, 'ei', acc.ei)
      END,
      acc -> array_join(acc.parts, ' ')
    )
    """
    return df.withColumn(out_col, F.expr(expr))


def clp_match_logtype(df: DataFrame, field: str, pattern: str) -> DataFrame:
    """Template search — the CLP query primitive: filter rows whose static
    logtype matches a SQL LIKE pattern (`*` wildcards accepted). Variables
    are placeholders in the logtype, so this matches message *shape*
    irrespective of variable values, which is what makes CLP-encoded scans
    cheap: the predicate runs on the (highly repetitive, dictionary-coded)
    logtype column only.
    """
    like = pattern.replace("*", "%")
    return df.filter(F.col(field + LOGTYPE_SUFFIX).like(like))
