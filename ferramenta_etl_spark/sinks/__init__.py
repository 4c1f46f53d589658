from .idempotent import (  # noqa: F401
    ensure_table,
    merge_insert_condition,
    write_ignore_conflicts,
)
from .quarantine import (  # noqa: F401
    quarantine_invalid,
    read_json_with_quarantine,
    split_by_rules,
)
