from ape_dts_spark.sources.snapshot import SnapshotSource  # noqa: F401
