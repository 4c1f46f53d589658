"""Exact grouped quantiles that survive 100 TB group sizes.

Spark's ``percentile`` aggregate is exact but buffers EVERY value of a
group inside the aggregation state — at warehouse scale a single group
holds 10^10+ values and the executor OOMs; aggregate buffers have no
spill path. The naive sort-based alternative (window over
``partitionBy(group).orderBy(value)``) spills but serializes: with
O(1)-cardinality groups the whole table sorts in |groups| tasks — the
exact scale-killer operators/topk.py documents (measured 70 s vs 29 s
at the 100x sweep for 3 groups).

The formulation here is a VALUE HISTOGRAM in two declarative steps:

1. ``groupBy(group, value).count()`` — the only heavy shuffle, a plain
   parallel hash aggregate with map-side combine (duplicate values
   collapse before the exchange; spillable; AQE-skew-handled).
2. cumulative counts over the compact histogram (window per group) and
   the SQL ``quantile_cont`` rank arithmetic: the value at 1-based rank
   r is the histogram row with ``cum - cnt < r <= cum``.

Step 2's window runs one task per group, but over DISTINCT VALUES, not
rows — for real numeric columns (prices, quantities, scores) that is
orders of magnitude smaller than the data; a 10^12-row group with 10^6
distinct prices sorts 10^6 histogram rows. Honest worst case: a column
with ~all-distinct values (random doubles) degrades the histogram to
row scale and the per-group window serializes again — for that shape
use ``percentile_approx`` (the GK-style bounded-error sketch; see the
``hll_gk_sketches`` query in plans/relational2.py) or range-partition
the sort; exactness on low-distinct columns is what this operator is
for. :func:`grouped_quantiles_auto` makes that switch automatically
per column via a cheap cardinality probe.

Interpolation is quantile_cont's ``lo + (hi - lo) * frac`` on 0-based
``pos = (n-1)*q`` — bit-identical to DuckDB. Deliberately NOT Spark's
``percentile`` form ``(1-frac)*lo + frac*hi``, which differs by float
ulps on some fractions (property-test-discovered; see
tests/test_properties.py::test_grouped_exact_quantile_matches_quantile_cont).
"""

from __future__ import annotations

import logging
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


def grouped_exact_quantile(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    q: float,
    out_col: str,
) -> DataFrame:
    """Exact interpolated quantile per group: SQL ``quantile_cont(q)``.

    Nulls ignored (a group whose values are all null yields no row).
    See the module docstring for the physical shape and its trade-off.
    """
    if not 0.0 <= q <= 1.0:
        # DuckDB's quantile_cont raises on out-of-range q too; without
        # this, q=90 (percent instead of fraction) silently drops every
        # group from the output
        raise ValueError(f"q must be a fraction in [0, 1], got {q!r}")
    hist = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, value_col)
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    wg = Window.partitionBy(*group_cols)
    wcum = wg.orderBy(F.col(value_col).asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    n = F.sum("__cnt").over(wg)
    pos = (n - 1) * F.lit(float(q))  # 0-based fractional rank
    lo_rank = F.floor(pos) + 1  # 1-based
    cum = F.sum("__cnt").over(wcum)
    prev = cum - F.col("__cnt")
    ranked = hist.select(
        *group_cols,
        value_col,
        pos.alias("__pos"),
        lo_rank.alias("__lo"),
        cum.alias("__cum"),
        prev.alias("__prev"),
    )
    # a histogram row covers ranks (prev, cum]; pick the rows covering
    # lo_rank and lo_rank+1 (often the same row)
    cand = ranked.filter(
        (F.col("__prev") < F.col("__lo") + 1) & (F.col("__lo") <= F.col("__cum"))
    )
    agg = cand.groupBy(*group_cols).agg(
        F.min(
            F.when(
                (F.col("__prev") < F.col("__lo")) & (F.col("__lo") <= F.col("__cum")),
                F.col(value_col),
            )
        ).alias("__lov"),
        F.min(
            F.when(
                (F.col("__prev") < F.col("__lo") + 1)
                & (F.col("__lo") + 1 <= F.col("__cum")),
                F.col(value_col),
            )
        ).alias("__hiv"),
        F.first("__pos").alias("__p"),  # identical for every row of a group
    )
    frac = F.col("__p") - F.floor(F.col("__p"))
    value = (
        F.col("__lov")
        + (F.coalesce(F.col("__hiv"), F.col("__lov")) - F.col("__lov")) * frac
    )
    return agg.select(*group_cols, value.alias(out_col))


def grouped_exact_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    specs: Sequence[tuple[str, float, str]],
) -> DataFrame:
    """Several exact quantiles — possibly over DIFFERENT value columns
    and fractions — in ONE scan of ``df``.

    ``specs`` is ``[(value_col, q, out_col), ...]``. Each per-spec call
    to :func:`grouped_exact_quantile` scans the input once; stacking
    the value columns (explode of per-spec structs, values cast to
    double — both engines interpolate quantile_cont in double anyway)
    folds all histograms into a single ``groupBy(group, spec, value)``
    pass, so the fact is read once no matter how many quantile columns
    a report accretes. The spec index joins the group key, so the rank
    arithmetic is unchanged; the final conditional aggregation pivots
    the (group, spec) rows back to one row per group with one column
    per spec.

    Output: ``group_cols`` + one double column per spec (NULL for a
    group whose values for that spec are all null — note the
    single-spec function instead DROPS a group with no values, a
    difference only visible when every spec of a group is null).
    """
    if not specs:
        raise ValueError("specs must be non-empty")
    for _, q, _ in specs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"q must be a fraction in [0, 1], got {q!r}")
    stacked = df.select(
        *group_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("__qi"),
                        F.col(v).cast("double").alias("__v"),
                    )
                    for i, (v, _, _) in enumerate(specs)
                ]
            )
        ).alias("__s"),
    ).select(*group_cols, F.col("__s.__qi").alias("__qi"), F.col("__s.__v").alias("__v"))
    q_for_spec = F.element_at(
        F.array(*[F.lit(float(q)) for _, q, _ in specs]), F.col("__qi") + 1
    )
    keys = [*group_cols, "__qi"]
    hist = (
        stacked.filter(F.col("__v").isNotNull())
        .groupBy(*keys, "__v")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    wg = Window.partitionBy(*keys)
    wcum = wg.orderBy(F.col("__v").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # n rides the SAME ordered window as cum, as a full-frame sum: an
    # unordered partition-only window would plan its own Sort(keys) +
    # Window pass BEFORE the (keys, __v) sort — one full extra sort of
    # the histogram (r13, measured ~12% of the group_agg row at sf0.1).
    # __cnt is a long, so the sum is order-independent and exact.
    n_full = F.sum("__cnt").over(
        wg.orderBy(F.col("__v").asc()).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    pos = (n_full - 1) * q_for_spec
    lo_rank = F.floor(pos) + 1
    cum = F.sum("__cnt").over(wcum)
    prev = cum - F.col("__cnt")
    ranked = hist.select(
        *keys,
        "__v",
        pos.alias("__pos"),
        lo_rank.alias("__lo"),
        cum.alias("__cum"),
        prev.alias("__prev"),
    )
    cand = ranked.filter(
        (F.col("__prev") < F.col("__lo") + 1) & (F.col("__lo") <= F.col("__cum"))
    )
    per_spec = cand.groupBy(*keys).agg(
        F.min(
            F.when(
                (F.col("__prev") < F.col("__lo")) & (F.col("__lo") <= F.col("__cum")),
                F.col("__v"),
            )
        ).alias("__lov"),
        F.min(
            F.when(
                (F.col("__prev") < F.col("__lo") + 1)
                & (F.col("__lo") + 1 <= F.col("__cum")),
                F.col("__v"),
            )
        ).alias("__hiv"),
        F.first("__pos").alias("__p"),
    )
    frac = F.col("__p") - F.floor(F.col("__p"))
    qv = F.col("__lov") + (
        F.coalesce(F.col("__hiv"), F.col("__lov")) - F.col("__lov")
    ) * frac
    per_spec = per_spec.select(*keys, qv.alias("__qv"))
    return per_spec.groupBy(*group_cols).agg(
        *[
            F.min(F.when(F.col("__qi") == i, F.col("__qv"))).alias(out)
            for i, (_, _, out) in enumerate(specs)
        ]
    )


def probe_distinct_ratios(
    df: DataFrame, value_cols: Sequence[str], probe_mod: int = 64
) -> dict[str, float]:
    """Estimate distinct/total per value column with ONE aggregate job
    over a VALUE-HASH sample: a value v (all its copies) is sampled iff
    ``pmod(xxhash64(v), probe_mod) == 0``, so the sampled
    distinct-over-rows ratio is an unbiased estimator of the global one
    — each distinct value enters with probability 1/probe_mod carrying
    its full multiplicity, which a uniform ROW sample would distort
    (row-sampling a heavy-tailed column overestimates distinctness).
    Map-side filter + approx_count_distinct: one narrow scan of just the
    probed columns, ~1/probe_mod of it surviving to the (tiny) agg.
    Columns with no sampled non-null rows report 0.0."""
    aggs = []
    for i, v in enumerate(value_cols):
        sampled = F.when(
            F.pmod(F.xxhash64(F.col(v)), F.lit(probe_mod)) == 0, F.col(v)
        )
        aggs.append(F.approx_count_distinct(sampled).alias(f"__d{i}"))
        aggs.append(F.count(sampled).alias(f"__n{i}"))
    row = df.agg(*aggs).first()
    return {
        v: (row[f"__d{i}"] / row[f"__n{i}"] if row[f"__n{i}"] else 0.0)
        for i, v in enumerate(value_cols)
    }


def grouped_quantiles_auto(
    df: DataFrame,
    group_cols: Sequence[str],
    specs: Sequence[tuple[str, float, str]],
    distinct_ratio_threshold: float = 0.5,
    accuracy: int = 10_000,
    probe_mod: int = 64,
) -> DataFrame:
    """:func:`grouped_exact_quantiles` with an AUTOMATIC escape hatch for
    its documented worst case (VERDICT r04 #3): a ~all-distinct value
    column (random doubles, high-resolution timestamps) degrades the
    value histogram to row scale, and the per-group rank window then
    sorts whole-group row counts in one task each — the exact
    serialization + memory shape the histogram exists to avoid.

    A cheap cardinality probe (:func:`probe_distinct_ratios`, one
    narrow hash-sampled aggregate job) estimates each spec column's
    distinct/total ratio; specs at or under ``distinct_ratio_threshold``
    take the exact histogram path, specs above it fall back to Spark's
    ``percentile_approx`` — the GK-style bounded-error sketch whose
    state is O(accuracy) per group regardless of group size, i.e.
    memory-safe on exactly the shape that breaks the histogram. The
    fallback is logged per column. Results of the two paths join on the
    group key (sketch-path groups whose other-spec values are all null
    still appear, with nulls — same as the exact multi-spec contract).

    NOTE this function runs ONE small Spark job at call time (the
    probe), unlike the pure plan-builders in this module. Registered
    plan constructors are asserted driver-job-free, with exactly two
    documented exemptions — the IVF centroid build and THIS probe (the
    ``grouped_quantiles_auto`` gate query; see tests/test_plans.py) —
    because the probe is a plan-time statistics job (the ANALYZE
    analog), amortized by the plan cache per (session, dataset).
    """
    if not specs:
        raise ValueError("specs must be non-empty")
    ratios = probe_distinct_ratios(
        df, list(dict.fromkeys(v for v, _, _ in specs)), probe_mod
    )
    exact_specs = [s for s in specs if ratios[s[0]] <= distinct_ratio_threshold]
    approx_specs = [s for s in specs if ratios[s[0]] > distinct_ratio_threshold]
    for v, _, out in approx_specs:
        log.info(
            "grouped_quantiles_auto: column %r distinct-ratio ~%.2f > %.2f; "
            "falling back to percentile_approx(accuracy=%d) for %r",
            v, ratios[v], distinct_ratio_threshold, accuracy, out,
        )
    parts = []
    if exact_specs:
        parts.append(grouped_exact_quantiles(df, group_cols, exact_specs))
    if approx_specs:
        parts.append(
            df.groupBy(*group_cols).agg(
                *[
                    F.percentile_approx(
                        F.col(v).cast("double"), F.lit(q), F.lit(accuracy)
                    ).alias(out)
                    for v, q, out in approx_specs
                ]
            )
        )
    if len(parts) == 1:
        return parts[0]
    return parts[0].join(parts[1], list(group_cols), "full_outer")
