from .registry import Job, JobRegistry, JobResult, PipelineError  # noqa: F401
from .rollup import materialize_rollup, serve_rollup  # noqa: F401
