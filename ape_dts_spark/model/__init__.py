from ape_dts_spark.model.changes import (  # noqa: F401
    ROW_TYPE_DELETE,
    ROW_TYPE_INSERT,
    ROW_TYPE_UPDATE,
    change_event_schema,
    reverse_events,
    split_updates,
)
