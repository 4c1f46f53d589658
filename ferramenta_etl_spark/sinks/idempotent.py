"""Idempotent sinks: the reference's load semantics, Spark-native.

The reference loads with ``INSERT ... ON CONFLICT (id_manifesto,
cd_parcela) DO NOTHING`` (``Select de Importação de Dados.py:214-218``)
— first-writer-wins keyed append, making re-runs free of duplicates —
after an idempotent DDL bootstrap (``S:166-186``). PostgreSQL's PK index
did the conflict check server-side; Spark has no such sink primitive
(SURVEY.md §2 #4), so this module provides it as:

    existing keys  ⟕(left_anti)  incoming  →  append

Scale notes:
- only the KEY COLUMNS of the existing table are scanned (column-pruned
  parquet read), not whole rows;
- the incoming side is deduped on the keys first (latest_per_key with a
  deterministic tiebreak) because ON CONFLICT also collapses in-batch
  duplicates;
- the anti-join is a plain equi-join: broadcastable when the sink is
  small, AQE-skew-handled when it is not.

Atomicity caveat (documented, as in SURVEY.md §7 phase 2): anti-join +
append is NOT atomic under concurrent writers — two jobs can both pass
the anti-join and append the same key. The reference had the same
at-most-once guarantee only per-process; for true ACID upsert use a
table format with MERGE (Delta/Iceberg) behind the same call signature.
"""

from __future__ import annotations

import logging
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import latest_per_key
from ..sources.tables import SchemaContractError

log = logging.getLogger(__name__)


def _exists(spark: SparkSession, path: str) -> bool:
    jvm = spark._jvm
    jsc = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(jsc).exists(p)


def ensure_table(spark: SparkSession, path: str, schema_df: DataFrame) -> bool:
    """Idempotent DDL bootstrap (≙ S:166-186): if no table exists at
    ``path``, create it empty with ``schema_df``'s schema. Returns True
    if it created the table."""
    if _exists(spark, path):
        return False
    schema_df.limit(0).write.mode("overwrite").parquet(path)
    log.info("created table at %s", path)
    return True


def write_ignore_conflicts(
    df: DataFrame,
    path: str,
    keys: Sequence[str],
    order_by: Sequence[str] = (),
) -> int:
    """Keyed first-writer-wins append (≙ ON CONFLICT DO NOTHING, S:214-218).

    1. dedup the incoming batch on ``keys`` (deterministic: order_by then
       keys as tiebreak);
    2. anti-join against the EXISTING key set (key columns only);
    3. append the survivors.

    Returns the number of rows appended. Re-running with the same input
    appends 0.
    """
    spark = df.sparkSession
    incoming = latest_per_key(
        df,
        keys=list(keys),
        order_by=[F.col(c).asc() for c in order_by] if order_by else [F.col(k).asc() for k in keys],
        tiebreak=list(keys),
    )
    if ensure_table(spark, path, df):
        fresh = incoming
    else:
        existing = spark.read.parquet(path)
        if [f.name for f in existing.schema.fields] != [f.name for f in df.schema.fields]:
            raise SchemaContractError(
                f"sink {path}: existing columns {existing.columns} != incoming {df.columns}"
            )
        existing_keys = existing.select(*keys)
        fresh = incoming.join(existing_keys, on=list(keys), how="left_anti")
    # one count + one write; cache so the anti-join runs once
    fresh = fresh.cache()
    try:
        n = fresh.count()
        if n:
            fresh.write.mode("append").parquet(path)
        log.info("appended %d rows to %s (ignore-conflicts on %s)", n, path, list(keys))
        return n
    finally:
        fresh.unpersist()
