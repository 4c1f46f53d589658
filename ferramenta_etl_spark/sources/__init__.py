from .files import load_csv, load_jsonl, load_orc  # noqa: F401
from .tables import (  # noqa: F401
    TABLES,
    ensure_scan_parallelism,
    load_table,
    load_tables,
    register_views,
)
