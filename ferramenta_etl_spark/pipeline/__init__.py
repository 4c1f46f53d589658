from .dedup_index import dedup_incremental, load_index  # noqa: F401
from .registry import Job, JobRegistry, JobResult, PipelineError  # noqa: F401
from .rollup import materialize_rollup, serve_rollup  # noqa: F401
