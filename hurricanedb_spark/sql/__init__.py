from hurricanedb_spark.sql.dialect import HurricaneSQL  # noqa: F401
