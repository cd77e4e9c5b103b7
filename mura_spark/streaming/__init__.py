from mura_spark.streaming import windows  # noqa: F401
