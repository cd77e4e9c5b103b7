from mura_spark.multimodal import binary_ops  # noqa: F401
