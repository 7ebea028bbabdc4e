from ape_dts_spark.operators.merge import classify_mergeable, compact_changes  # noqa: F401
from ape_dts_spark.operators.checker import check_diff, check_summary  # noqa: F401
from ape_dts_spark.operators.sampling import mod_sample, sample_rate  # noqa: F401
