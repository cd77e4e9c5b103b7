from mura_spark.sources import parquet  # noqa: F401
from mura_spark.sources.table_format import MuraTable  # noqa: F401
