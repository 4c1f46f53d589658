"""Pipeline framework semantics (≙ Executavel do ETL.py, SURVEY §2.3):
registry order, fail-fast queue clearing, status surface, JSON config."""

import json

import pytest

from ferramenta_etl_spark.pipeline import JobRegistry, PipelineError


def test_run_all_in_order(spark):
    reg = JobRegistry()
    ran = []
    for name in ("a", "b", "c"):
        reg.register(name, lambda s, n=name: ran.append(n))
    results = reg.run_all(spark)
    assert ran == ["a", "b", "c"]
    assert [r.status for r in results] == ["ok", "ok", "ok"]
    assert all(r.seconds >= 0 for r in results)


def test_fail_fast_clears_queue(spark):
    reg = JobRegistry()
    ran = []
    reg.register("ok1", lambda s: ran.append("ok1"))

    def boom(s):
        raise ValueError("kaput")

    reg.register("boom", boom)
    reg.register("never", lambda s: ran.append("never"))
    with pytest.raises(PipelineError) as ei:
        reg.run_all(spark)
    assert ran == ["ok1"]  # fail-fast: 'never' not run (≙ E:415-422)
    statuses = {r.name: r.status for r in ei.value.results}
    assert statuses == {"ok1": "ok", "boom": "failed", "never": "pending"}
    line = reg.status_line(ei.value.results)
    assert "✅ ok1" in line and "❌ boom" in line and "⌛ never" in line


def test_no_fail_fast_continues(spark):
    reg = JobRegistry()

    def boom(s):
        raise ValueError("kaput")

    reg.register("boom", boom)
    reg.register("after", lambda s: 42)
    results = reg.run_all(spark, fail_fast=False)
    assert [r.status for r in results] == ["failed", "ok"]
    assert results[1].output == 42


def test_from_json_config(spark, tmp_path):
    cfg = {
        "job_a": {"label": "Job A", "tooltip": "does A"},
        "job_b": {"label": "Job B"},
    }
    p = tmp_path / "etl_scripts.json"
    p.write_text(json.dumps(cfg))
    calls = []
    reg = JobRegistry.from_json(str(p), resolver=lambda name: (lambda s, n=name: calls.append(n)))
    assert list(reg.jobs) == ["job_a", "job_b"]
    assert reg.jobs["job_a"].tooltip == "does A"
    reg.run_all(spark)
    assert calls == ["job_a", "job_b"]


def test_example_pipeline_end_to_end_idempotent(spark, tmp_path, sf_dir):
    """The shipped 5-job registry (≙ E:46-67) runs extract->transform->
    idempotent-load end to end; a FULL rerun appends zero rows and leaves
    zero duplicate keys (≙ ON CONFLICT DO NOTHING re-run safety)."""
    from ferramenta_etl_spark.pipeline.jobs import build_jobs, default_config

    cfg_path = tmp_path / "etl_jobs.json"
    cfg = default_config(str(cfg_path))  # auto-created (≙ E:68-81)
    assert cfg_path.exists() and len(cfg) == 5

    sink_dir = str(tmp_path / "sinks")
    jobs = build_jobs(sf_dir, sink_dir)
    reg = JobRegistry()
    for name, meta in cfg.items():
        reg.register(name, jobs[name], meta.get("label", name))

    first = reg.run_all(spark)
    assert [r.status for r in first] == ["ok"] * 5
    assert all(r.output > 0 for r in first), "every job should load rows"

    second = reg.run_all(spark)
    assert [r.status for r in second] == ["ok"] * 5
    assert [r.output for r in second] == [0] * 5, "rerun must append nothing"

    keys = {
        "view_manifestos": ["id_cliente"],
        "view_movimento": ["ms_inicio", "ds_tipo"],
        "view_manifestomovimento": ["id_manifesto", "id_movimento"],
        "view_adicionais": ["id_manifesto", "cd_parcela"],
        "parcela_ciot": ["id_manifesto", "cd_parcela"],
    }
    from pyspark.sql import functions as F

    for table, kcols in keys.items():
        out = spark.read.parquet(f"{sink_dir}/{table}")
        dups = out.groupBy(*kcols).count().filter(F.col("count") > 1).count()
        assert dups == 0, f"{table} has duplicate keys after rerun"


def test_progress_is_data_driven(spark):
    """registry.progress reports real completed/total task counts from the
    status tracker while a job runs (vs the reference's synthetic +1%/150ms
    bar, E:385-390): observed mid-flight samples are monotonically
    non-decreasing and end at done == total > 0."""
    import threading
    import time

    reg = JobRegistry()

    def slow(s):
        return (
            s.range(0, 400_000_000, 1, 128)
            .selectExpr("max(sha2(cast(id as string), 256))")
            .collect()
        )

    reg.register("prog_job", slow)
    out = {}
    t = threading.Thread(
        target=lambda: out.update(res=reg.run_one(spark, "prog_job")), daemon=True
    )
    t.start()
    samples = []
    deadline = time.time() + 120
    while t.is_alive():
        assert time.time() < deadline, "job did not finish in 120s"
        d, tot = reg.progress(spark, "prog_job")
        if tot:
            samples.append((d, tot))
        time.sleep(0.05)
    t.join()
    assert out["res"].status == "ok"
    assert samples, "never observed the job in the tracker"
    dones = [d for d, _ in samples]
    assert dones == sorted(dones), "completed-task counts went backwards"
    assert any(0 < d < tot for d, tot in samples), "no mid-flight sample"
    d, tot = reg.progress(spark, "prog_job")
    assert d == tot > 0


def test_cancel_mid_flight(spark):
    """registry.cancel kills a running job via its job group
    (≙ process terminate, E:438-451): the job fails, it does not run to
    completion. cancelJobGroup only hits jobs already submitted to the
    scheduler, so wait for scheduler visibility via active_job_ids
    before cancelling."""
    import threading
    import time

    reg = JobRegistry()

    def slow(s):
        # ~minutes of work if not cancelled (sha2 per row, no overflow).
        # MANY SHORT tasks on purpose: cancellation can race task launch,
        # leaving already-running tasks as zombies that hold executor
        # slots until they finish — 512 × ~2s tasks bound that drain to
        # seconds, while the cancel discards the ~480 queued tasks.
        return (
            s.range(0, 2_000_000_000, 1, 512)
            .selectExpr("max(sha2(cast(id as string), 256))")
            .collect()
        )

    reg.register("slow_job", slow)
    out = {}

    def runner():
        out["res"] = reg.run_one(spark, "slow_job")

    t = threading.Thread(target=runner, daemon=True)
    t.start()
    deadline = time.time() + 30
    while not reg.active_job_ids(spark, "slow_job"):
        assert time.time() < deadline, "job never reached the scheduler"
        time.sleep(0.2)
    reg.cancel(spark, "slow_job")
    t.join(60)
    assert not t.is_alive(), "cancel did not stop the job within 60s"
    assert out["res"].status == "failed"
    assert "cancel" in (out["res"].error or "").lower()
    # the shared session must stay healthy after a cancel
    assert spark.range(100).count() == 100
