from keystone_spark.sources.tables import (
    TABLES,
    ensure_parallelism,
    load_table,
    load_tables,
    register_views,
)

__all__ = [
    "TABLES",
    "ensure_parallelism",
    "load_table",
    "load_tables",
    "register_views",
]
