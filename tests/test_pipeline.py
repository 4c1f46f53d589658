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
