from hurricanedb_spark.functions.registry import register_all  # noqa: F401
