"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's full embedded
T-SQL plan, ``Select de Importação de Dados.py:34-99``, re-expressed in
DataFrame ops) at sf0.001. ``queries()``/``oracle_sql()`` expose every
implemented operator from SURVEY.md §2 plus the large-scale extension
suite, keyed identically so the driver's DuckDB gate checks each one.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _configure(spark: SparkSession) -> SparkSession:
    """Apply engine session conf to a driver-provided session (the driver
    may build its own SparkSession, which won't have our parquet-nanos or
    AQE settings)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    for k, v in {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
    }.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable in this session; sources handle fallbacks
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from ferramenta_etl_spark.plans.flagship import flagship

    return flagship(_configure(spark), SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    from ferramenta_etl_spark.plans import all_queries

    return {
        name: (lambda s, d, _fn=fn: _fn(_configure(s), d))
        for name, fn in all_queries().items()
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted keys -> rows-only check."""
    from ferramenta_etl_spark.plans import all_oracles

    return all_oracles()
