from etl_globalretail_spark.sources.readers import (  # noqa: F401
    calendar_frame,
    load_table,
    load_tables,
)
