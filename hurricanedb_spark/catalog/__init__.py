from hurricanedb_spark.catalog.tables import TABLE_NAMES, load_tables, register_views  # noqa: F401
from hurricanedb_spark.catalog.schema import pinot_schema_to_struct, default_null_values  # noqa: F401
