from ape_dts_spark.functions import dedup, similarity, text  # noqa: F401
