from ape_dts_spark.sinks.sql_file import events_to_sql  # noqa: F401
from ape_dts_spark.sinks.soft_delete import to_soft_delete_rows  # noqa: F401
