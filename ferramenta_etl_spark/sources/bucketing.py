"""Bucketed tables: co-located joins and aggregations without a shuffle.

The reference's big join chain ran inside SQL Server, which co-locates
via its clustered indexes (``Select de Importação de Dados.py:50-55``).
The Spark-native equivalent for repeatedly-joined big tables is
bucketing: write both sides hash-partitioned into the same number of
buckets on the join key, and every subsequent equi-join or groupBy on
that key skips its exchange entirely — the single biggest shuffle
eliminator for a 100 TB fact-to-fact join that runs daily.

Economics: bucketing pays ONE shuffle at write time and amortizes it
over every downstream join/agg. Worth it exactly when the table is
joined on the same key more often than it is rewritten; pick bucket
counts so a bucket is a few hundred MB at full scale, and keep both
sides' counts equal (Spark 4 can also coalesce mismatched counts when
one divides the other).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog table bucketed (and optionally
    sorted) on ``keys``. Sorting within buckets additionally lets
    sort-merge joins skip their per-task sort."""
    w = df.write.mode(mode).bucketBy(num_buckets, *keys)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket spec intact (a plain
    path read would discard the distribution metadata — bucketing lives
    in the catalog)."""
    return spark.table(table)


def exchanges_in_plan(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the executed plan —
    the thing bucketing exists to drive to zero."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line or "Exchange rangepartitioning" in line
    )
