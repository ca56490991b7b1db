from rust_etl_spark.sources.tables import (
    load_table,
    normalize_event_time,
    register_views,
    table_rows,
)

__all__ = ["load_table", "normalize_event_time", "register_views", "table_rows"]
