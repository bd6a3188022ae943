from hurricanedb_spark.sources.ingestion import IngestionPipeline, read_batch  # noqa: F401
