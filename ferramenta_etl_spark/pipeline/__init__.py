from .registry import Job, JobRegistry, JobResult, PipelineError  # noqa: F401
