from mura_spark.streaming import sinks, windows  # noqa: F401
