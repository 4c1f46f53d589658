"""Scale-safe top-k per group.

The naive idiom — one window over the group key, filter rank <= k — is
correct but funnels the ENTIRE table into |groups| sort tasks. When the
group cardinality is O(1) in table size (3 return flags, 10 query ids),
that is one task sorting tens of TB at the 100 TB target. The two-phase
shape here keeps the same single logical shuffle volume but keys the
exchange by (group, input-partition-id) — |groups| x P well-distributed
keys — then ranks only the <= k x P surviving candidates per group in a
second, trivially small exchange.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_topk(
    df: DataFrame,
    group_cols: Sequence[str | Column],
    order: Sequence[Column],
    k: int,
    rank_fn: Callable[[], Column] = F.row_number,
    rank_col: str = "rnk",
) -> DataFrame:
    """Top-k rows per group under ``order`` (which must be total for
    deterministic results), two-phase.

    Phase 1 ranks within (group, spark_partition_id()) — every input
    partition keeps its own local top-k per group. Safe for row_number
    and rank alike: a row's local rank (1 + rows strictly ahead of it in
    ITS partition) never exceeds its global rank (1 + rows strictly
    ahead in the whole group), so everything with global rank <= k
    survives the local rank <= k filter. Phase 2 re-ranks the survivors
    (<= k x P rows per group) with the same function and order, yielding
    exactly the single-window answer.
    """
    w_local = Window.partitionBy(*group_cols, "__pid").orderBy(*order)
    w_final = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("__pid", F.spark_partition_id())
        .withColumn("__lrnk", rank_fn().over(w_local))
        .filter(F.col("__lrnk") <= k)
        .drop("__pid", "__lrnk")
        .withColumn(rank_col, rank_fn().over(w_final))
        .filter(F.col(rank_col) <= k)
    )
