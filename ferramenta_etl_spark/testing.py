"""Local mirror of the driver's correctness gate.

The driver runs each ``queries()[name]`` in Spark and the matching
``oracle_sql()[name]`` in DuckDB on the same parquet tables, then compares
row count + schema + an order-insensitive value hash. This module
replicates that comparison locally (with better diagnostics) so
mismatches are caught at dev time, not judge time.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _dec
import math

from pyspark.sql import DataFrame, SparkSession

# one source of truth with the batch loaders: a table added to the
# catalog is automatically visible to every local oracle run
from ferramenta_etl_spark.sources.tables import TABLES as TABLE_NAMES


def _norm_value(v):
    if v is None:
        return "\0NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        # float(v): np.float64 subclasses float, and its repr under
        # numpy>=2 is 'np.float64(1.5)' — normalizing through the plain
        # float constructor keeps both engines' 1.5 equal
        return f"f:{float(v)!r}"
    if isinstance(v, _dec.Decimal):
        return f"d:{v}"
    if isinstance(v, _dt.datetime):
        return f"t:{v.isoformat()}"
    if isinstance(v, _dt.date):
        return f"t:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_value(x) for x in v) + "]"
    try:
        import numpy as np

        if isinstance(v, np.generic):
            return _norm_value(v.item())
    except ImportError:
        pass
    return f"{type(v).__name__[0]}:{v}"


def _normalize_rows(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_norm_value(r[i]) for i in order) for r in rows)


def duckdb_connection(sf_dir: str):
    """DuckDB with the driver's pre-registered table views."""
    import duckdb

    con = duckdb.connect()
    safe_dir = sf_dir.replace("'", "''")  # path with a quote must not break SQL
    try:
        for t in TABLE_NAMES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{safe_dir}/{t}.parquet')"
            )
    except Exception:
        con.close()
        raise
    return con


def run_oracle(sf_dir: str, sql: str):
    con = duckdb_connection(sf_dir)
    try:
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        return cols, rows
    finally:
        con.close()


def compare_to_oracle(
    spark: SparkSession,
    df: DataFrame,
    oracle_sql: str,
    sf_dir: str,
    max_diff_lines: int = 8,
) -> tuple[bool, str]:
    """Replicate the driver's check: count, column names, sorted values."""
    s_cols = df.columns
    s_rows = [tuple(r) for r in df.collect()]
    o_cols, o_rows = run_oracle(sf_dir, oracle_sql)

    msgs = []
    if sorted(s_cols) != sorted(o_cols):
        msgs.append(f"schema mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
    if len(s_rows) != len(o_rows):
        msgs.append(f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}")
    if not msgs:
        sn = _normalize_rows(s_cols, s_rows)
        on = _normalize_rows(o_cols, o_rows)
        if sn != on:
            diffs = [
                f"  row {i}:\n    spark : {a}\n    oracle: {b}"
                for i, (a, b) in enumerate(zip(sn, on))
                if a != b
            ][:max_diff_lines]
            msgs.append(
                f"value mismatch ({len([1 for a, b in zip(sn, on) if a != b])} rows):\n"
                + "\n".join(diffs)
            )
    return (not msgs, "\n".join(msgs))
