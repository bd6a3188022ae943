"""Pinot-style JSON schema -> Spark StructType.

The reference declares schemas as JSON with role-typed field lists
(pinot-spi/.../data/Schema.java:66-73: dimensionFieldSpecs, metricFieldSpecs,
dateTimeFieldSpecs) and a fixed DataType enum (FieldSpec.java:385-399).
Every field carries a *default null value* substituted at ingestion
(FieldSpec.java:49-66) unless null handling is enabled.

Here: the same JSON dialect parses into a StructType whose column metadata
records the field role, and `default_null_values` reproduces the reference's
ingestion-time null substitution for `DataFrame.na.fill`.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import types as T

# FieldSpec.DataType -> Spark type (SURVEY.md §1.5 mapping table)
_TYPE_MAP: dict[str, T.DataType] = {
    "INT": T.IntegerType(),
    "LONG": T.LongType(),
    "FLOAT": T.FloatType(),
    "DOUBLE": T.DoubleType(),
    "BIG_DECIMAL": T.DecimalType(38, 18),
    "BOOLEAN": T.BooleanType(),
    "TIMESTAMP": T.TimestampType(),
    "STRING": T.StringType(),
    "JSON": T.StringType(),
    "BYTES": T.BinaryType(),
}

# Reference default-null values per role (FieldSpec.java:49-66):
# dimensions: Integer.MIN_VALUE / Long.MIN_VALUE / NEGATIVE_INFINITY / "null"
# metrics:    0 / 0.0
_DIMENSION_DEFAULTS: dict[str, Any] = {
    "INT": -2147483648,
    "LONG": -9223372036854775808,
    "FLOAT": float("-inf"),
    "DOUBLE": float("-inf"),
    "BOOLEAN": False,
    "STRING": "null",
    "JSON": "null",
}
_METRIC_DEFAULTS: dict[str, Any] = {
    "INT": 0,
    "LONG": 0,
    "FLOAT": 0.0,
    "DOUBLE": 0.0,
    "BIG_DECIMAL": 0.0,
    "STRING": "null",
}


def _field(spec: dict[str, Any], role: str) -> T.StructField:
    data_type = _TYPE_MAP[spec["dataType"].upper()]
    if not spec.get("singleValueField", True):
        data_type = T.ArrayType(data_type)  # MV column (FieldSpec.java:70)
    return T.StructField(
        spec["name"],
        data_type,
        nullable=True,
        metadata={"role": role, "pinotDataType": spec["dataType"].upper()},
    )


def pinot_schema_to_struct(schema_json: dict[str, Any]) -> T.StructType:
    """Parse a Pinot-dialect schema JSON into a StructType with role metadata."""
    fields: list[T.StructField] = []
    for spec in schema_json.get("dimensionFieldSpecs", []):
        fields.append(_field(spec, "DIMENSION"))
    for spec in schema_json.get("metricFieldSpecs", []):
        fields.append(_field(spec, "METRIC"))
    for spec in schema_json.get("dateTimeFieldSpecs", []):
        fields.append(_field(spec, "DATE_TIME"))
    return T.StructType(fields)


def default_null_values(schema_json: dict[str, Any]) -> dict[str, Any]:
    """Per-column fill values reproducing the reference's default-null
    substitution (use with df.na.fill). Explicit `defaultNullValue` in the
    spec wins; otherwise the role-based default applies. TIMESTAMP/BYTES
    have no fillable default (left as NULL)."""
    out: dict[str, Any] = {}
    for role_key, defaults in (
        ("dimensionFieldSpecs", _DIMENSION_DEFAULTS),
        ("metricFieldSpecs", _METRIC_DEFAULTS),
        ("dateTimeFieldSpecs", _DIMENSION_DEFAULTS),
    ):
        for spec in schema_json.get(role_key, []):
            if "defaultNullValue" in spec:
                out[spec["name"]] = spec["defaultNullValue"]
            else:
                dv = defaults.get(spec["dataType"].upper())
                if dv is not None:
                    out[spec["name"]] = dv
    return out
