"""Hive-style date-partitioned table mirrors + partition-pruning reads.

The other half of the 100 TB layout story next to bucketing
(sources/bucketing.py): a daily pipeline lands its fact tables
partitioned by ingestion date (``.../o_month=1997-03/part-*.parquet``),
so that

- STATIC partition pruning turns a date-range predicate into a
  directory listing — a query over last month touches 1/Nth of the
  table without reading a single excluded footer (Catalyst's
  ``PartitionFilters``, visible in the scan node, distinct from row-group
  ``PushedFilters``);
- DYNAMIC partition pruning (DPP) does the same for a JOIN against a
  filtered dimension: the fact side's partition filter is a runtime
  subquery over the dim's join keys, so "events on holiday dates" scans
  only the holiday partitions even though no literal date predicate
  exists (Spark's ``dynamicpruning`` expression, on by default via
  ``spark.sql.optimizer.dynamicPartitionPruning.enabled``).

Mirror hygiene for the small-files problem: the writer repartitions by
the partition column first, so each partition directory holds ONE file
per hash-assigned task instead of (input_partitions x partitions)
fragments — at 100 TB, a month partition should be a few large files,
not thousands of slivers (compaction economics in sinks/layout.py).

The reference has no partitioned storage (its tables live in SQL
Server / PG, S:162-225); this module exists for the scale mandate, not
reference parity. Tests: tests/test_partitioned.py (round-trip parity,
static-pruning file counts, a DPP plan + result check).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import load_table


def write_partitioned_mirror(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    table: str,
    partition_expr: Column,
    partition_col: str,
) -> str:
    """Write ``table`` as a hive-partitioned parquet mirror under
    ``out_dir/<table>``, partitioned by ``partition_col`` =
    ``partition_expr``. Returns the mirror path.

    The pre-write ``repartition(partition_col)`` makes file count per
    partition directory equal to the number of DISTINCT hash tasks that
    received that value (usually 1) — the layout a downstream scan
    wants. Partition values must be low-cardinality (dates, months,
    regions): a high-cardinality partition column is the small-files
    anti-pattern this module exists to avoid.
    """
    path = os.path.join(out_dir, table)
    df = load_table(spark, sf_dir, table).withColumn(partition_col, partition_expr)
    (
        df.repartition(F.col(partition_col))
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(path)
    )
    return path


def load_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned mirror. Partition-column values come from
    directory names (hive-style discovery); predicates on the partition
    column become PartitionFilters — metadata-only, no file I/O for
    excluded partitions. Observability note: neither ``inputFiles()``
    (computed pre-optimization) nor any static plan property shows the
    pruned FILE list — assert pruning via the scan node's
    ``PartitionFilters`` / ``dynamicpruning`` plan text, or behaviorally
    (tests/test_partitioned.py corrupts an excluded partition and shows
    the pruned query never opens it)."""
    return spark.read.parquet(path)
