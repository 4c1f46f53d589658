"""Config-driven pipeline framework — the reference's Qt orchestrator
(``Executavel do ETL.py``, cited ``E:line``) without the GUI.

Reference behaviors reproduced (SURVEY.md §2.3):
- #6  JSON job registry {name: {label, tooltip}} (E:14, E:42-81)
- #25 run-one job with wall-clock timing + log capture (E:321-363)
- #26 run-all: sequential queue in registry order (E:365-383)
- #27 fail-fast abort: a failure clears the remaining queue (E:415-422)
- #29 cancellation via Spark job groups (≙ process terminate, E:438-451)
- #31 structured logging + per-stage timers (S:8-9, S:152, S:190-199)
- #32 per-job status surface (⌛/✅/❌, E:288-292)

Differences by design: jobs are in-process callables on ONE SparkSession
(no child interpreter per job, E:363 — Spark parallelism replaces process
isolation), and failures raise structured results instead of exit codes.
"""

from __future__ import annotations

import json
import logging
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

log = logging.getLogger(__name__)

STATUS_PENDING, STATUS_RUNNING, STATUS_OK, STATUS_FAIL = "pending", "running", "ok", "failed"


@dataclass
class Job:
    name: str
    fn: Callable[[SparkSession], object]
    label: str = ""
    tooltip: str = ""


@dataclass
class JobResult:
    name: str
    status: str
    seconds: float = 0.0
    error: str | None = None
    output: object = None


class PipelineError(RuntimeError):
    def __init__(self, result: JobResult, results: list[JobResult]):
        super().__init__(f"job {result.name!r} failed: {result.error}")
        self.result = result
        self.results = results


@dataclass
class JobRegistry:
    """Ordered registry of named pipeline jobs (≙ etl_scripts.json, E:14)."""

    jobs: dict[str, Job] = field(default_factory=dict)

    def register(
        self, name: str, fn: Callable[[SparkSession], object], label: str = "", tooltip: str = ""
    ) -> Job:
        job = Job(name=name, fn=fn, label=label or name, tooltip=tooltip)
        self.jobs[name] = job
        return job

    @classmethod
    def from_json(
        cls, path: str, resolver: Callable[[str], Callable[[SparkSession], object]]
    ) -> "JobRegistry":
        """Load the registry from a JSON config {name: {label, tooltip}}
        (≙ E:42-67); ``resolver`` maps each job name to its callable
        (≙ the script-path resolution at E:294-319)."""
        reg = cls()
        with open(path) as f:
            cfg = json.load(f)
        for name, meta in cfg.items():
            reg.register(
                name, resolver(name), meta.get("label", name), meta.get("tooltip", "")
            )
        return reg

    # -- execution ---------------------------------------------------------

    def run_one(self, spark: SparkSession, name: str) -> JobResult:
        """Run a single job with timing + job-group tagging (≙ E:321-363).
        The job group makes ``cancel(name)`` work mid-flight."""
        job = self.jobs[name]
        sc = spark.sparkContext
        # interruptOnCancel stays False: interrupting task threads mid-I/O
        # can wedge a local-mode executor permanently. Cooperative task
        # kill (checked at codegen batch boundaries) lands in <1s anyway.
        sc.setJobGroup(name, job.label, interruptOnCancel=False)
        log.info("⌛ %s starting", name)
        t0 = time.perf_counter()
        try:
            out = job.fn(spark)
            dt = time.perf_counter() - t0
            log.info("✅ %s finished in %.2fs", name, dt)
            return JobResult(name, STATUS_OK, seconds=round(dt, 3), output=out)
        except Exception as exc:  # noqa: BLE001 — fail-fast surface, not swallow
            dt = time.perf_counter() - t0
            log.error("❌ %s failed after %.2fs: %s", name, dt, exc)
            return JobResult(name, STATUS_FAIL, seconds=round(dt, 3), error=str(exc))
        finally:
            sc.setJobGroup("", "")

    def run_all(
        self,
        spark: SparkSession,
        fail_fast: bool = True,
        runner: Callable[[SparkSession, str], JobResult] | None = None,
    ) -> list[JobResult]:
        """Sequential pipeline over the registry order (≙ E:365-383).
        With ``fail_fast`` (the reference's behavior, E:415-422), a
        failure clears the queue and raises PipelineError carrying the
        partial results. ``runner`` lets callers wrap run_one (e.g. the
        CLI's progress reporter) without re-implementing the queue."""
        run = runner or self.run_one
        results: list[JobResult] = []
        queue = list(self.jobs)  # snapshot, ≙ E:371
        while queue:
            name = queue.pop(0)
            res = run(spark, name)
            results.append(res)
            if res.status == STATUS_FAIL and fail_fast:
                skipped = [JobResult(n, STATUS_PENDING) for n in queue]
                results.extend(skipped)
                queue.clear()  # ≙ E:419
                raise PipelineError(res, results)
        return results

    def cancel(self, spark: SparkSession, name: str) -> None:
        """Cancel a running job by its job group (≙ E:438-451).

        Only jobs already submitted to the scheduler are cancelled —
        use :meth:`active_job_ids` to confirm the job is in flight
        before relying on this."""
        spark.sparkContext.cancelJobGroup(name)

    def active_job_ids(self, spark: SparkSession, name: str) -> list[int]:
        """Scheduler job ids currently active for a registry job."""
        tracker = spark.sparkContext.statusTracker()
        active = set(tracker.getActiveJobsIds())
        return [j for j in tracker.getJobIdsForGroup(name) if j in active]

    def progress(self, spark: SparkSession, name: str) -> tuple[int, int]:
        """(completed_tasks, total_tasks) across every scheduler job the
        registry job has submitted under its job group so far.

        DATA-DRIVEN progress from the Spark status tracker — the
        reference's bar is synthetic (+1% per 150 ms QTimer regardless of
        work, E:37-38, E:385-390; SURVEY.md §2 #30 flags it). Only stages
        that have launched tasks count: AQE re-submits already-computed
        upstream stages as new never-run stage ids ("skipped" in the UI),
        which would otherwise inflate the denominator forever. Totals
        therefore grow as stages launch — render as 'done/total so far',
        not a percentage of a fixed whole.
        """
        tracker = spark.sparkContext.statusTracker()
        done = total = 0
        for jid in tracker.getJobIdsForGroup(name):
            info = tracker.getJobInfo(jid)
            if info is None:
                continue
            for sid in info.stageIds:
                st = tracker.getStageInfo(sid)
                if st is None:
                    continue
                if st.numActiveTasks + st.numCompletedTasks + st.numFailedTasks == 0:
                    continue  # pending or AQE-skipped: no tasks launched yet
                total += st.numTasks
                done += st.numCompletedTasks
        return done, total

    def status_line(self, results: list[JobResult]) -> str:
        """Per-job status chars (≙ E:288-292)."""
        icon = {STATUS_OK: "✅", STATUS_FAIL: "❌", STATUS_PENDING: "⌛"}
        return " ".join(f"{icon.get(r.status, '⌛')} {r.name}" for r in results)
