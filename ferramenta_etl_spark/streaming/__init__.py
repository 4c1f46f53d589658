from .curation import (  # noqa: F401
    curation_stream,
    run_curation_stream,
    stream_documents,
)
from .stateful import capped_sessions_stream  # noqa: F401
from .windows import (  # noqa: F401
    dedup_within_watermark,
    interval_join_stream,
    materialize_rollup_stream,
    run_available_now,
    session_agg_stream,
    sliding_agg_stream,
    stream_events,
    stream_ignore_conflicts,
    tumbling_agg_stream,
)
