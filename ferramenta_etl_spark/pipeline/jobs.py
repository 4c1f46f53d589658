"""The shipped example pipeline: the reference's 5-job registry as real
engine jobs.

The reference auto-creates a default config naming five ETL scripts
(``Executavel do ETL.py:46-67``, auto-creation at ``E:68-81``), of which
only ``alimentacao_parcela_ciot`` has an implementation in the repo (it
is ``Select de Importação de Dados.py``; the four ``alimentacao_view_*``
scripts are registered but absent — SURVEY.md §2.4). Here all five exist:
each extracts from the engine's parquet tables, transforms with the
operator library, and loads through the idempotent sink
(``write_ignore_conflicts`` ≙ ON CONFLICT DO NOTHING, S:214-218), so the
whole pipeline is re-runnable with zero duplicate rows — the property
the reference gets from PostgreSQL's PK index.

``default_config`` mirrors E:68-81: if the JSON registry file is
missing, write the example 5-job config and continue.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..functions.tsql import epoch_ms, sum2
from ..operators.dedup import latest_per_key
from ..sinks import write_ignore_conflicts
from ..sources import load_table

DEFAULT_JOBS = {
    "alimentacao_view_manifestos": {
        "label": "Alimentação View Manifestos",
        "tooltip": "Latest manifest snapshot per customer (latest_per_key).",
    },
    "alimentacao_view_movimento": {
        "label": "Alimentação View Movimento",
        "tooltip": "Event movements rolled into 15-minute windows.",
    },
    "alimentacao_view_manifestomovimento": {
        "label": "Alimentação View ManifestoMovimento",
        "tooltip": "Order-to-line movement join feed.",
    },
    "alimentacao_view_adicionais": {
        "label": "Alimentação View Adicionais",
        "tooltip": "Computed additional-charge columns feed.",
    },
    "alimentacao_parcela_ciot": {
        "label": "Importação Dados - Parcelas e CIOT",
        "tooltip": "Flagship parcelas/CIOT extract-transform-load (≙ S:141-242).",
    },
}


def default_config(path: str) -> dict:
    """Load the job registry config, auto-creating the example 5-job file
    when missing (≙ E:68-81)."""
    if not os.path.exists(path):
        with open(path, "w") as f:
            json.dump(DEFAULT_JOBS, f, indent=2, ensure_ascii=False)
    with open(path) as f:
        return json.load(f)


def _plan_manifestos(spark: SparkSession, sf_dir: str):
    o = load_table(spark, sf_dir, "orders")
    return latest_per_key(
        o,
        keys=["o_custkey"],
        order_by=[F.col("o_orderdate").desc()],
        tiebreak=[F.col("o_orderkey").desc()],
    ).select(
        F.col("o_custkey").alias("id_cliente"),
        F.col("o_orderkey").alias("id_manifesto"),
        F.col("o_orderstatus").alias("cd_status"),
        F.round("o_totalprice", 2).alias("vl_total"),
    )


def _plan_movimento(spark: SparkSession, sf_dir: str):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "15 minutes").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_eventos"),
            sum2(F.col("value")).alias("vl_total"),
        )
        .select(
            epoch_ms(F.col("win.start")).alias("ms_inicio"),
            F.col("event_type").alias("ds_tipo"),
            "n_eventos",
            "vl_total",
        )
    )


def _plan_manifestomovimento(spark: SparkSession, sf_dir: str):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("o_orderdate") >= F.lit("1998-01-01"))
        .select(
            F.col("l_orderkey").alias("id_manifesto"),
            F.col("l_linenumber").alias("id_movimento"),
            F.col("o_orderstatus").alias("cd_status"),
            F.round("l_extendedprice", 2).alias("vl_movimento"),
        )
    )


def _plan_adicionais(spark: SparkSession, sf_dir: str):
    from ..functions.tsql import round2_stable

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("id_manifesto"),
        F.col("l_linenumber").alias("cd_parcela"),
        # the shared cross-engine money rounding (round(x*100)/100
        # + the -0.0 normalization) — not a hand-rolled copy that
        # could drift from the helper's contract
        round2_stable(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax"))
        ).alias("vl_adicional"),
    )


def _plan_parcela_ciot(spark: SparkSession, sf_dir: str):
    from ..plans.flagship import flagship

    return flagship(spark, sf_dir)


# Job name -> (plan builder, sink basename, idempotency keys). The ONE
# place the example pipeline's shapes live — the parquet build
# (build_jobs) and the JDBC build (build_jobs_jdbc) both derive from it,
# so the two sink families can never drift apart on plan or keys.
JOB_SPECS: dict[str, tuple[Callable, str, list[str]]] = {
    "alimentacao_view_manifestos": (
        _plan_manifestos, "view_manifestos", ["id_cliente"]),
    "alimentacao_view_movimento": (
        _plan_movimento, "view_movimento", ["ms_inicio", "ds_tipo"]),
    "alimentacao_view_manifestomovimento": (
        _plan_manifestomovimento, "view_manifestomovimento",
        ["id_manifesto", "id_movimento"]),
    "alimentacao_view_adicionais": (
        _plan_adicionais, "view_adicionais", ["id_manifesto", "cd_parcela"]),
    # composite PK, ≙ S:119
    "alimentacao_parcela_ciot": (
        _plan_parcela_ciot, "parcela_ciot", ["id_manifesto", "cd_parcela"]),
}


def build_jobs(
    sf_dir: str, sink_dir: str, quarantine_dir: str | None = None
) -> dict[str, Callable[[SparkSession], int]]:
    """Job name -> callable(spark) -> rows appended. Every job loads its
    sink idempotently on explicit keys, so run-all twice appends 0.

    With ``quarantine_dir`` set, every job's load runs with row-level
    quarantine (≙ the reference's skip-bad-batch-and-continue posture,
    S:231-236): rows whose key columns are null are diverted to
    ``{quarantine_dir}/{job_sink}`` with a ``_violations`` audit column
    instead of failing or silently corrupting the sink."""

    def make(plan, sink, keys):
        def job(spark: SparkSession) -> int:
            return write_ignore_conflicts(
                plan(spark, sf_dir),
                f"{sink_dir}/{sink}",
                keys=keys,
                bad_records_path=(
                    f"{quarantine_dir}/{sink}" if quarantine_dir else None
                ),
            )

        return job

    return {
        name: make(plan, sink, keys)
        for name, (plan, sink, keys) in JOB_SPECS.items()
    }


def build_jobs_jdbc(sf_dir: str, cfg) -> dict[str, Callable[[SparkSession], int]]:
    """The same 5-job pipeline loading into a REAL relational database
    through the staged conflict-insert sink
    (sinks/jdbc_conflict.write_jdbc_ignore_conflicts) — the reference's
    actual deployment shape (S:213-225: batched inserts into PostgreSQL
    with ON CONFLICT DO NOTHING; here the portable NOT-EXISTS dialect
    against whatever ``cfg`` points at, e.g. embedded Derby in CI).
    Same plans, same keys as ``build_jobs`` (both read JOB_SPECS), so
    the S:217 re-run contract — the second run inserts ONLY new key
    pairs, a full replay inserts zero — holds over JDBC exactly as it
    does over parquet (tests/test_jdbc_derby.py pins it end-to-end)."""
    from ..sinks.jdbc_conflict import write_jdbc_ignore_conflicts

    def make(plan, sink, keys):
        def job(spark: SparkSession) -> int:
            return write_jdbc_ignore_conflicts(
                plan(spark, sf_dir), cfg, sink, keys=keys
            )

        return job

    return {
        name: make(plan, sink, keys)
        for name, (plan, sink, keys) in JOB_SPECS.items()
    }
