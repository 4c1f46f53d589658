"""JDBC source/sink configuration — the reference's connector surface.

The reference extracts from SQL Server via pyodbc with a 50 000-row
fetchmany loop (``Select de Importação de Dados.py:162-163, 192-193,
238``) and loads PostgreSQL via execute_batch with page_size 50 000 and
per-batch commits (``S:213-225``). In Spark those knobs map onto the
built-in JDBC datasource:

- ``fetchsize``    ≙ fetchmany(BATCH_SIZE)   (S:26, S:193)
- ``batchsize``    ≙ execute_batch page_size (S:224)
- partitioned scan (partitionColumn/lowerBound/upperBound/numPartitions)
  replaces the single-cursor stream with N parallel range scans — the
  piece the reference fundamentally could not do single-threaded.

No database SERVER exists in the test container, but the full connector
path — driver loading, batched writes, partitioned parallel scans,
full-query pushdown, filter pushdown — is exercised end-to-end against
embedded Apache Derby (on Spark's classpath) in tests/test_jdbc_derby.py;
a server deployment only changes the URL.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, DataFrameReader, SparkSession

DEFAULT_BATCH_SIZE = 50_000  # ≙ BATCH_SIZE, S:26


@dataclass
class JdbcConfig:
    url: str  # e.g. jdbc:postgresql://host:5432/db
    user: str
    password: str
    driver: str = ""  # e.g. org.postgresql.Driver
    fetchsize: int = DEFAULT_BATCH_SIZE
    batchsize: int = DEFAULT_BATCH_SIZE

    def base_options(self) -> dict[str, str]:
        opts = {
            "url": self.url,
            "user": self.user,
            "password": self.password,
            "fetchsize": str(self.fetchsize),
            "batchsize": str(self.batchsize),
        }
        if self.driver:
            opts["driver"] = self.driver
        return opts


def query_scan_options(cfg: JdbcConfig, query: str) -> dict[str, str]:
    """Options for a full-query pushdown scan (≙ cursor.execute(sql),
    S:192): the remote engine runs ``query``; Spark streams the result.
    Use only for genuinely remote-side logic — the engine's stance is to
    read base tables and compute in Spark (SURVEY.md §3)."""
    return {**cfg.base_options(), "query": query}


def table_scan_options(
    cfg: JdbcConfig,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> dict[str, str]:
    """Options for a base-table scan; with partition bounds it becomes N
    parallel range scans (the scale path — size num_partitions to the
    source's connection budget, not the cluster's core count)."""
    opts = {**cfg.base_options(), "dbtable": table}
    if partition_column is not None:
        # fail HERE, not as a NumberFormatException('None') deep inside
        # the JDBC scan build: a partitioned scan needs real bounds
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partition_column requires lower_bound and upper_bound "
                f"(got {lower_bound!r}, {upper_bound!r})"
            )
        if num_partitions is not None and num_partitions < 1:
            raise ValueError(f"num_partitions must be >= 1, got {num_partitions}")
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions if num_partitions is not None else 8),
        )
    return opts


def jdbc_query_reader(spark: SparkSession, cfg: JdbcConfig, query: str) -> DataFrameReader:
    return spark.read.format("jdbc").options(**query_scan_options(cfg, query))


def jdbc_table_reader(
    spark: SparkSession,
    cfg: JdbcConfig,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrameReader:
    return spark.read.format("jdbc").options(
        **table_scan_options(
            cfg, table, partition_column, lower_bound, upper_bound, num_partitions
        )
    )


def jdbc_append_writer(df: DataFrame, cfg: JdbcConfig, table: str):
    """Batched append (≙ execute_batch + per-batch commit, S:213-225).
    For the reference's ON CONFLICT DO NOTHING semantics, pre-filter with
    sinks.write_ignore_conflicts-style anti-join against the target keys,
    or point the writer at a staging table and MERGE server-side."""
    return (
        df.write.format("jdbc")
        .mode("append")
        .options(**cfg.base_options(), dbtable=table)
    )
