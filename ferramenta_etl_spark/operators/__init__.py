from .dedup import latest_per_key  # noqa: F401
