from .idempotent import ensure_table, write_ignore_conflicts  # noqa: F401
