"""Distinct-count sketches: KMV (k-minimum-values) — the deterministic,
engine-portable alternative to HyperLogLog.

Spark's ``approx_count_distinct`` (HLL++) is the production default for
100 TB cardinality work: fixed memory, mergeable, one pass. But its
estimates are implementation-specific — no other engine reproduces them
bit-for-bit, so a query built on it can never be value-checked against
an independent oracle. KMV closes that gap: keep the k smallest hash
values of the distinct items; if the k-th smallest is ``h_k`` in a hash
space of size ``H``, the classic estimator is ``(k-1) * H / h_k``
(Bar-Yossef et al., "Counting distinct elements in a data stream",
RANDOM 2002). With the md5-prefix hash family (operators/dedup.
portable_hash) every engine that has md5 computes the IDENTICAL
estimate — the same portability trade the MinHash/SimHash queries make.

Accuracy: relative error ~ 1/sqrt(k-2) (k=64 -> ~13% worst case, far
better in practice); below k distinct values the count is EXACT (the
sketch holds every hash). Like HLL, KMV sketches are mergeable (union =
k smallest of the concatenation), so partial aggregation applies.

Scale shape: the distinct pass partial-aggregates map-side (only
distinct (group, hash) pairs shuffle — and the hash space caps that at
|distinct| regardless of row count), then grouped_topk's
WindowGroupLimit keeps <= k rows per (group, input-partition) before
the final exchange. Nothing holds more than k values per group in
memory. No analog in the reference (SURVEY §2 has no approximate
aggregates); part of the mandated large-scale extension suite.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import portable_hash
from .topk import grouped_topk

# portable_hash(hex_chars=14) is uniform on [0, 16^14)
_HASH_SPACE = 16**14


def kmv_distinct(
    df: DataFrame,
    groups: Sequence[str],
    value_col: str,
    k: int = 64,
    out_col: str = "est_distinct",
) -> DataFrame:
    """Per-group KMV distinct-count estimate of ``value_col``.

    Deterministic and engine-portable: the estimate is a pure function
    of the distinct value set (md5-based hashing, no RNG, no partition-
    order dependence), so the same data yields the same number on any
    engine — reruns, audits, and cross-engine oracles all agree. Groups
    with fewer than k distinct values get the EXACT count.

    Output: ``groups`` + ``out_col`` (double).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2 for the KMV estimator, got {k}")
    groups = list(groups)
    # (k-1)*H as one exact double literal: k-1 has few significant bits,
    # H = 2^56 is a power of two, so the product is exactly representable
    # and the single division below is bit-identical across engines
    numerator = float((k - 1) * _HASH_SPACE)
    # NULL values never count (COUNT(DISTINCT) semantics) — and the
    # filter must be explicit: a NULL hash would sort FIRST in Spark's
    # ASC but LAST in DuckDB's, silently skewing the k-th minimum
    hashes = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            *groups,
            portable_hash(F.col(value_col).cast("string")).alias("__h"),
        )
        .distinct()
    )
    lowest = grouped_topk(hashes, groups, [F.col("__h").asc()], k)
    return (
        lowest.groupBy(*groups)
        .agg(F.count(F.lit(1)).alias("__n"), F.max("__h").alias("__hk"))
        .select(
            *groups,
            F.when(F.col("__n") < k, F.col("__n").cast("double"))
            .otherwise(F.lit(numerator) / F.col("__hk").cast("double"))
            .alias(out_col),
        )
    )


def kmv_oracle_sql(
    table_expr: str,
    group_sql: str,
    value_sql: str,
    k: int = 64,
    out_col: str = "est_distinct",
) -> str:
    """The DuckDB rendering of ``kmv_distinct`` — one SELECT producing
    (g, ``out_col``) from the same table, bit-identical values."""
    numerator = float((k - 1) * _HASH_SPACE)
    return f"""
    SELECT g, CASE WHEN __n < {k} THEN CAST(__n AS DOUBLE)
                   ELSE {numerator!r} / CAST(__hk AS DOUBLE) END AS {out_col}
    FROM (
        SELECT g, count(*) AS __n, max(h) AS __hk FROM (
            SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
            FROM (
                SELECT DISTINCT {group_sql} AS g,
                       ('0x' || substr(md5(CAST({value_sql} AS VARCHAR)), 1, 14))::BIGINT AS h
                FROM {table_expr} WHERE {value_sql} IS NOT NULL
            )
        ) WHERE rn <= {k} GROUP BY g
    )
    """
