from rust_etl_spark.sources.tables import (
    clear_layout_overrides,
    load_table,
    normalize_event_time,
    register_views,
    set_layout_override,
    table_rows,
)

__all__ = [
    "clear_layout_overrides",
    "load_table",
    "normalize_event_time",
    "register_views",
    "set_layout_override",
    "table_rows",
]
