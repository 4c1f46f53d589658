from .tables import (  # noqa: F401
    TABLES,
    ensure_scan_parallelism,
    load_table,
    load_tables,
    register_views,
)
