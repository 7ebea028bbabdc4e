from ape_dts_spark.config.rdb_filter import RdbFilter  # noqa: F401
from ape_dts_spark.config.task_config import TaskConfig  # noqa: F401
