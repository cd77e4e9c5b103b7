from mura_spark.sources import parquet  # noqa: F401
