"""Bin-bucketed range join: point-in-interval joins at scale.

Spark compiles a bare ``start <= p AND p <= end`` join condition to
BroadcastNestedLoopJoin (or a cartesian product) — O(|points| x
|intervals|) comparisons, the classic 100 TB plan-killer for
point-in-interval workloads (event-in-session, IP-in-CIDR-range,
reading-in-calibration-window). The standard fix (what a range-join
hint does in engines that have one) is expressible in plain DataFrame
ops: quantize the domain into fixed bins, explode each interval to the
bins it covers, equi-join points on their single bin, then re-check the
exact predicate. The equi-join shuffles hash-partitioned like any other
join; comparisons drop from |P| x |I| to |P| x (avg intervals per bin).

Interval-side inflation is span/bin_size rows per interval, so
``bin_size`` should sit near the median interval length. The rare
much-longer-than-median intervals would explode to thousands of bins;
they are split off past ``max_bins_per_interval`` and joined via one
broadcast nested-loop over JUST that tail — correct for any input,
cheap when the tail is small (by assumption; Spark's broadcast layer
errors loudly if it is not). Every (point, interval) match is emitted
exactly once: a point has ONE bin, the two interval arms are disjoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_size: float,
    max_bins_per_interval: int = 256,
) -> DataFrame:
    """Inner join of ``points`` to ``intervals`` on
    ``start_col <= point_col <= end_col`` (closed bounds, numeric
    columns — convert timestamps to epoch first).

    NULL points and NULL/inverted (start > end) intervals match nothing
    — the same rows a bare SQL range predicate would reject. Column
    names must be disjoint between the two sides (raises ValueError;
    rename before joining) so the output can carry both row's columns
    unprefixed."""
    if bin_size <= 0:
        raise ValueError("bin_size must be positive")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(
            f"column collision between join sides: {sorted(overlap)} — "
            "rename one side before range_join"
        )
    b = float(bin_size)
    valid = intervals.filter(
        F.col(start_col).isNotNull()
        & F.col(end_col).isNotNull()
        & (F.col(start_col) <= F.col(end_col))
    )
    spanned = valid.withColumn(
        "__sb", F.floor(F.col(start_col) / b).cast("long")
    ).withColumn("__eb", F.floor(F.col(end_col) / b).cast("long"))
    span = F.col("__eb") - F.col("__sb")
    short = spanned.filter(span < max_bins_per_interval)
    long_tail = spanned.filter(span >= max_bins_per_interval).drop(
        "__sb", "__eb"
    )
    binned = short.withColumn(
        "__bin", F.explode(F.sequence(F.col("__sb"), F.col("__eb")))
    ).drop("__sb", "__eb")

    pts = points.filter(F.col(point_col).isNotNull())
    in_range = (F.col(point_col) >= F.col(start_col)) & (
        F.col(point_col) <= F.col(end_col)
    )
    fast = (
        pts.withColumn(
            "__bin", F.floor(F.col(point_col) / b).cast("long")
        )
        .join(binned, "__bin")
        .filter(in_range)
        .drop("__bin")
    )
    slow = pts.join(F.broadcast(long_tail), in_range)
    return fast.unionByName(slow)
