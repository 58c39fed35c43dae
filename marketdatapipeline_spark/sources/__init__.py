from marketdatapipeline_spark.sources.tables import (
    TABLES,
    bars_from_events,
    load_table,
    register_views,
)

__all__ = ["TABLES", "load_table", "bars_from_events", "register_views"]
