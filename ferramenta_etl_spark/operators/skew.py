"""Skew-mitigation: salted joins for pathologically hot keys.

AQE's skew-join split (on by default in the engine session) handles most
skew by splitting oversized SORT-MERGE partitions, but it cannot help
when (a) the join is an aggregation feeding a single hot key upstream of
the join, or (b) the planner picked a shuffled-hash path, or (c) one key
is so hot a single split still exceeds an executor. Salting is the
explicit fix: replicate the small side R times, spray the big side's hot
keys across R salt values, join on (key, salt). Cost: R× the small side
(bounded — broadcastable small sides should just broadcast instead);
benefit: the hot key's rows land on R tasks instead of one.

Use when a profile (e.g. ``top_key_counts``) shows a key holding more
rows than a healthy task should own — the classic 100 TB failure is one
null/default key holding 10% of a fact table.

Joins ONLY, deliberately: a skewed combinable AGGREGATION needs no
salt — hash aggregation partially combines before the exchange, so a
90%-hot key crosses the shuffle as one row per input partition
(measured ~21% over uniform on the fixture where the plain join pays
1.59x; SCALING.md "Round-11: why the skew operator targets JOINS").
Non-combinable aggregates (exact collect/percentile) are the
exception — the quantile operators route those through the histogram
shuffle instead.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def top_key_counts(df: DataFrame, keys: Sequence[str], n: int = 10) -> DataFrame:
    """Skew profile: the n heaviest key tuples with their row counts —
    one groupBy-count (map-side combined), driver sees n rows."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.col("n_rows").desc())
        .limit(n)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the shuffle keyed by
    (on..., salt): each big row gets one salt value in [0, salt) —
    ``monotonically_increasing_id() % salt`` spreads rows evenly even
    when they are bytewise-identical duplicates, which a value-hash salt
    would clump — and the small side is replicated across all ``salt``
    values. Each big row then matches exactly the one replica group its
    salt selects, so the result is row-for-row identical to the plain
    join NO MATTER which salt a row drew (task retries may re-draw salts
    harmlessly), while the heaviest key's rows spread over ``salt``
    tasks instead of one.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left equi-joins")
    if salt < 1:
        # salt=0 would pmod-divide by zero (ANSI abort — or, with ANSI
        # off, NULL salts that silently match nothing: zero-row inner
        # joins); negative salts build an empty replica sequence
        raise ValueError(f"salt must be >= 1, got {salt}")
    salt_col = F.pmod(F.monotonically_increasing_id(), F.lit(salt)).cast("int")
    big_s = big.withColumn("__salt", salt_col)
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    out = big_s.join(small_s, [*on, "__salt"], how)
    return out.drop("__salt")
