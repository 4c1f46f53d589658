"""Relational operator inventory as named queries.

Part 1 — reference parity: SURVEY.md §2.2 (the embedded T-SQL at
``Select de Importação de Dados.py:34-99``, cited ``S:line``) as
individually oracle-checked queries (the flagship exercises them
jointly). Closely-related rows share one merged query (tsql_formats,
filter_sort_limit) because the driver checks only the first 50
registered queries — see plans/__init__.py.

Part 2 — extended relational surface the reference lacks (SURVEY.md §2.4)
but any engine replacing it needs: aggregation, more window functions,
set ops, semi/anti joins, pivot, range join, as-of join, scalar function
library, JSON extraction, exact percentiles.

Numeric-parity conventions (SURVEY.md §5.2):
- money/double outputs rounded via ``round(x, 2..6)`` in BOTH engines;
- SUM over doubles goes through scaled-long cents (``sum(cast(
  floor(x*100 + 0.5) as bigint)) / 100`` — functions/tsql.sum2) so the
  result is order-independent (exact integer addition, and the
  accumulator stays in whole-stage-codegen long arithmetic instead of
  128-bit decimal), divided back to double for a stable schema;
- every window ORDER BY carries a tiebreak making the order total;
- timestamps never reach an output raw: formatted string or epoch ms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.tsql import (
    convert_103,
    convert_108,
    dt_hr_concat,
    epoch_ms,
    isnull,
    money,
    round2_stable,
    round6_stable,
    scaled_cents as _scaled_cents,
    sum2 as _sum2,
)
from ..operators.dedup import latest_per_key
from ..operators.topk import grouped_topk
from ..sources import ensure_scan_parallelism, load_table

from ._registry import make_registry

QUERIES, ORACLES, _q = make_registry()




# ===========================================================================
# Part 1 — reference parity (SURVEY.md §2.2)
# ===========================================================================


@_q(
    "computed_arithmetic",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) / 100 + 0.0
             AS net_price,
           ROUND((l_extendedprice + l_quantity) * 100) / 100 + 0.0 AS gross_plus_qty,
           ROUND((l_extendedprice - l_quantity) * 100) / 100 + 0.0 AS gross_minus_qty,
           ROUND(abs(l_extendedprice - 1000), 2)       AS abs_diff,
           CAST(ceil(l_quantity) AS BIGINT)            AS qty_ceil,
           CAST(floor(l_quantity) AS BIGINT)           AS qty_floor,
           ROUND(CASE WHEN l_extendedprice >= 0
                      THEN sqrt(l_extendedprice) END, 6) AS price_sqrt,
           ROUND(CASE WHEN l_extendedprice + 1 > 0
                      THEN ln(l_extendedprice + 1) END, 6) AS price_ln,
           ROUND(pow(l_discount, 2), 6)                AS disc_sq,
           l_orderkey % 7                              AS key_mod,
           nullif(l_returnflag, 'N') IS NOT DISTINCT FROM nullif(l_linestatus, 'O')
             AS ns_eq,
           (nullif(l_returnflag, 'N') = nullif(l_linestatus, 'O')) AS plain_eq
    FROM lineitem
    """,
)
def computed_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed money columns (+ and - as at S:44, S:80) MERGED with the
    scalar math library + null-safe equality (<=> / IS NOT DISTINCT
    FROM beside plain `=`, which yields NULL on NULL operands; this
    query earlier absorbed null_safe_eq, and absorbs the former
    math_functions in round 10 — same lineitem row spine — to hold the
    registry at the driver's 50-query gate window while
    events_capped_sessions and hybrid_retrieval joined)."""
    li = load_table(spark, sf_dir, "lineitem")
    ns_a = F.nullif(F.col("l_returnflag"), F.lit("N"))
    ns_b = F.nullif(F.col("l_linestatus"), F.lit("O"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        round2_stable(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
        ).alias("net_price"),
        # COMPUTED money needs the stable two-step (round(x,2) diverges
        # between engines when a sum lands on a half-cent, e.g.
        # 999.995 + 50.5 — caught by the adversarial relational fixture)
        round2_stable(F.col("l_extendedprice") + F.col("l_quantity")).alias(
            "gross_plus_qty"
        ),
        round2_stable(F.col("l_extendedprice") - F.col("l_quantity")).alias(
            "gross_minus_qty"
        ),
        F.round(F.abs(F.col("l_extendedprice") - 1000), 2).alias("abs_diff"),
        F.ceil("l_quantity").cast("bigint").alias("qty_ceil"),
        F.floor("l_quantity").cast("bigint").alias("qty_floor"),
        # domain guards (NULL outside): DuckDB ABORTS on sqrt/ln of a
        # negative where Spark yields NaN/NULL — a single bad price row
        # must not diverge engines or kill the oracle
        F.round(
            F.when(F.col("l_extendedprice") >= 0, F.sqrt("l_extendedprice")), 6
        ).alias("price_sqrt"),
        F.round(
            F.when(
                F.col("l_extendedprice") + 1 > 0,
                F.log(F.col("l_extendedprice") + 1),
            ),
            6,
        ).alias("price_ln"),
        F.round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        ns_a.eqNullSafe(ns_b).alias("ns_eq"),
        (ns_a == ns_b).alias("plain_eq"),
    )


@_q(
    "latest_per_key",
    """
    SELECT o_custkey, o_orderkey AS latest_orderkey,
           ROUND(o_totalprice, 2) AS latest_totalprice
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC NULLS LAST,
                                           o_orderkey DESC) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
)
def latest_per_key_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-record-per-key idiom (S:58-70): window rank + rn=1."""
    o = load_table(spark, sf_dir, "orders")
    return latest_per_key(
        o,
        keys=["o_custkey"],
        order_by=[F.col("o_orderdate").desc()],
        tiebreak=[F.col("o_orderkey").desc()],
    ).select(
        "o_custkey",
        F.col("o_orderkey").alias("latest_orderkey"),
        money("o_totalprice").alias("latest_totalprice"),
    )


@_q(
    "inner_join_chain",
    """
    SELECT l.l_orderkey, l.l_linenumber, o.o_orderstatus,
           c.c_name, n.n_name AS nation, r.r_name AS region,
           ROUND(l.l_extendedprice, 2) AS price
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1998-01-01'
    """,
)
def inner_join_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained INNER equi-joins fact->dims (S:50-55). nation/region are
    broadcast by Catalyst; the only shuffle is lineitem⋈orders."""
    t = {n: load_table(spark, sf_dir, n) for n in ("lineitem", "orders", "customer", "nation", "region")}
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["nation"], F.col("c_nationkey") == F.col("n_nationkey"))
        .join(t["region"], F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("o_orderdate") >= F.lit("1998-01-01"))
        .select(
            "l_orderkey",
            "l_linenumber",
            "o_orderstatus",
            "c_name",
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
            money("l_extendedprice").alias("price"),
        )
    )


@_q(
    "left_join_chain",
    """
    SELECT o.o_orderkey, o.o_orderstatus,
           big.l_linenumber, ROUND(big.l_extendedprice, 2) AS big_price,
           s.s_name AS supp_name
    FROM orders o
    LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity >= 48) big
           ON o.o_orderkey = big.l_orderkey
    LEFT JOIN supplier s ON big.l_suppkey = s.s_suppkey
    """,
)
def left_join_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained LEFT OUTER joins with null extension (S:92-96)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 48)
    s = load_table(spark, sf_dir, "supplier")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"), "left")
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"), "left")
        .select(
            "o_orderkey",
            "o_orderstatus",
            "l_linenumber",
            money("l_extendedprice").alias("big_price"),
            F.col("s_name").alias("supp_name"),
        )
    )


@_q(
    "self_alias_join",
    """
    SELECT l.l_orderkey, l.l_linenumber,
           c.s_name AS nm_motorista, d.s_name AS nm_agregado
    FROM lineitem l
    JOIN supplier c ON l.l_suppkey = c.s_suppkey
    JOIN supplier d ON (l.l_partkey % 10) = d.s_suppkey
    """,
)
def self_alias_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same table joined twice under different roles (S:94-95)."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    c, d = sup.alias("c"), sup.alias("d")
    return (
        li.alias("l")
        .join(c, F.col("l.l_suppkey") == F.col("c.s_suppkey"))
        .join(d, (F.col("l.l_partkey") % 10) == F.col("d.s_suppkey"))
        .select(
            F.col("l.l_orderkey").alias("l_orderkey"),
            F.col("l.l_linenumber").alias("l_linenumber"),
            F.col("c.s_name").alias("nm_motorista"),
            F.col("d.s_name").alias("nm_agregado"),
        )
    )


@_q(
    "filter_sort_limit",
    """
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           ROUND(o_totalprice, 2) AS total, flag
    FROM (
        SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
               nullif(o_orderstatus, 'P') AS flag
        FROM orders
    )
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
      AND flag IS NOT NULL AND flag <> 'F'
    ORDER BY o_custkey ASC, o_orderkey DESC
    LIMIT 100
    """,
)
def filter_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range predicate on a date column (S:56, S:97 — pushed to the scan)
    + NULL/empty rejection filter (S:56: nullif flag IS NOT NULL AND
    <> 'F'; absorbs the former filter_null_empty query in round 11 —
    same orders spine, and the registry holds at the driver's 50-query
    gate window while bpe_tokenize/dsir_score joined) + multi-column
    global sort (S:98) with LIMIT so the order is observable under the
    driver's order-insensitive compare. Spark executes
    TakeOrderedAndProject — no full global sort materialized.
    (Earlier merged former filter_range_date + multi_col_sort.)"""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn(
            "flag", F.nullif(F.col("o_orderstatus"), F.lit("P"))
        )
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01"))
            & (F.col("o_orderdate") < F.lit("1998-01-01"))
            & F.col("flag").isNotNull()
            & (F.col("flag") != "F")
        )
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            money("o_totalprice").alias("total"),
            "flag",
        )
        .orderBy(F.col("o_custkey").asc(), F.col("o_orderkey").desc())
        .limit(100)
    )


@_q(
    "post_outer_join_filter",
    """
    SELECT o.o_orderkey, c.c_name, ROUND(c.c_acctbal, 2) AS acctbal
    FROM orders o
    LEFT JOIN customer c
           ON o.o_custkey = c.c_custkey AND c.c_acctbal > 5000
    WHERE o.o_orderdate >= TIMESTAMP '1999-01-01'
      AND c.c_custkey IS NOT NULL
    """,
)
def post_outer_join_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-rejecting WHERE after a LEFT JOIN re-inners it (S:97) —
    Catalyst performs the outer->inner rewrite; semantics identical."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(
            c,
            (F.col("o_custkey") == F.col("c_custkey")) & (F.col("c_acctbal") > 5000),
            "left",
        )
        .filter(
            (F.col("o_orderdate") >= F.lit("1999-01-01"))
            & F.col("c_custkey").isNotNull()
        )
        .select("o_orderkey", "c_name", money("c_acctbal").alias("acctbal"))
    )


@_q(
    "case_when_coalesce",
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_returnflag = 'R'
                THEN ROUND((l_extendedprice
                            - COALESCE(nullif(l_discount, 0) * 1000, 0)) * 100)
                     / 100 + 0.0
                ELSE ROUND(l_extendedprice, 2) END AS vl_parcela,
           ROUND(COALESCE(nullif(l_discount, 0) * 1000, 0) * 100) / 100 + 0.0
             AS vl_combustivel
    FROM lineitem
    """,
)
def case_when_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE + ISNULL money adjustment (S:79-82): deduction applies only to
    the 'Saldo do Frete'-analog rows; NULL deduction defaults to 0.
    COMPUTED money (the subtraction, the *1000 product) rounds via
    round2_stable — plain round(x,2) diverges between engines on
    half-cent landings; the untouched l_extendedprice keeps plain
    round (stored values round identically)."""
    li = load_table(spark, sf_dir, "lineitem")
    deduction = F.nullif(F.col("l_discount"), F.lit(0)) * 1000
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(
            F.col("l_returnflag") == "R",
            round2_stable(F.col("l_extendedprice") - isnull(deduction, 0.0)),
        )
        .otherwise(money(F.col("l_extendedprice")))
        .alias("vl_parcela"),
        round2_stable(isnull(deduction, 0.0)).alias("vl_combustivel"),
    )


@_q(
    "tsql_formats",
    """
    SELECT event_id,
           strftime(ts, '%d/%m/%Y') AS d_103,
           strftime(ts, '%H:%M:%S') AS t_108,
           strftime(CASE WHEN event_type <> 'error' THEN ts END, '%d/%m/%Y')
             || ' ' ||
           strftime(CASE WHEN event_type <> 'error' THEN ts END, '%H:%M:%S')
             AS dt_hr_str
    FROM events
    """,
)
def tsql_formats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's T-SQL formatting trio in one projection
    (merged former date_format_103 / time_format_108 /
    concat_null_propagating queries — SURVEY §2 #21-23):
    - CONVERT(..., 103) -> dd/MM/yyyy (S:76);
    - CONVERT(..., 108) -> HH:mm:ss (S:85-88);
    - T-SQL '+' concat: a NULL operand nulls the whole composite
      (S:85-88). Spark concat matches; concat_ws would NOT."""
    ev = load_table(spark, sf_dir, "events")
    masked = F.when(F.col("event_type") != "error", F.col("ts"))
    return ev.select(
        "event_id",
        convert_103("ts").alias("d_103"),
        convert_108("ts").alias("t_108"),
        dt_hr_concat(masked).alias("dt_hr_str"),
    )


# ===========================================================================
# Part 2 — extended relational surface (SURVEY.md §2.4: absent in the
# reference, required of a complete engine)
# ===========================================================================


@_q(
    "group_agg",
    """
    WITH q1 AS (
        SELECT l_returnflag, l_linestatus,
               -- scaled-long money sums: both engines derive the identical
               -- cent integer via floor(x*100 + 0.5) — the same IEEE
               -- multiply/add/floor sequence on both sides, so the longs
               -- match bit-exactly (do NOT "simplify" to ROUND: half-up
               -- and floor(x+0.5) differ on negative halves, and the
               -- parity argument is same-sequence, not same-rounding-mode)
               -- — then sum exactly in integers and divide at the edge
               -- (functions/tsql sum2)
               CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100      AS sum_qty,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS sum_base_price,
               -- computed ratio: scale-then-round (round2_stable's idiom at
               -- 4 dp) so a half-way landing rounds identically on both
               -- engines
               ROUND(CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100
                     / COUNT(*) * 10000) / 10000 + 0.0 AS avg_qty,
               ROUND(MIN(l_extendedprice), 2) AS min_price,
               ROUND(MAX(l_extendedprice), 2) AS max_price,
               COUNT(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                    FILTER (WHERE l_discount > 0.05) AS DOUBLE) / 100 AS discounted_revenue,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        GROUP BY l_returnflag, l_linestatus
    ),
    stats AS (
        SELECT l_returnflag AS rf,
               COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(DISTINCT l_suppkey) AS n_supps,
               -- round6_stable's scale-then-round idiom: interpolated
               -- quantiles are computed doubles, where plain ROUND(x, 6)
               -- diverges between engines on half-ulp landings
               (ROUND(quantile_cont(l_quantity, 0.5) * 1000000) / 1000000 + 0.0)
                                                              AS median_qty,
               (ROUND(quantile_cont(l_extendedprice, 0.9) * 1000000) / 1000000 + 0.0)
                                                              AS p90_price
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT q1.*, s.n_parts, s.n_supps, s.median_qty, s.p90_price
    FROM q1 LEFT JOIN stats s ON q1.l_returnflag IS NOT DISTINCT FROM s.rf
    """,
)
def group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped grouped aggregation, plus FILTER-clause conditional
    aggregates (== aggregate over CASE; merged former conditional_agg
    query), joined with per-returnflag exact statistics (merged former
    exact_stats query, round 12 — itself the former distinct_agg +
    exact_percentiles): COUNT(DISTINCT) expands to a two-phase
    aggregate; the exact quantiles go through the HISTOGRAM-based
    operator (operators/quantile.py — parallel value-count shuffle,
    rank arithmetic over the compact histogram) rather than Spark's
    `percentile` aggregate, whose per-group in-memory value buffer
    cannot spill and OOMs at warehouse group sizes. Both quantiles ride
    ONE fact scan: grouped_exact_quantiles stacks the value columns
    into a single histogram pass; the approximate 100 TB substitutes
    live in approx_sketches. The Q1 arm filters on shipdate while the
    stats arm scans all of lineitem (the merged queries' original
    frames, preserved verbatim); the stats relation is group-count
    sized, so the final join broadcasts. Decimal-accumulated sums are
    order-independent, so map-side partial agg + AQE coalescing stay
    safe for exact comparison."""
    arms = group_agg_arms(spark, sf_dir)
    q1, base, qs = arms["q1"], arms["count_distinct"], arms["exact_quantiles"]
    stats = (
        # eqNullSafe: a NULL group key is a real group (both engines
        # aggregate it); a plain equi-join would drop its quantiles
        base.join(qs, F.col("__rf").eqNullSafe(F.col("__g1")), "left")
        .select(
            "__rf",
            "n_parts",
            "n_supps",
            round6_stable(F.col("__mq")).alias("median_qty"),
            round6_stable(F.col("__pp")).alias("p90_price"),
        )
    )
    return q1.join(
        F.broadcast(stats),
        F.col("l_returnflag").eqNullSafe(F.col("__rf")),
        "left",
    ).drop("__rf")


def group_agg_arms(spark: SparkSession, sf_dir: str) -> dict:
    """The three workloads merged into group_agg, as STANDALONE
    sub-plans (VERDICT r12 #7): 'q1' (the TPC-H Q1-shaped grouped
    aggregation with FILTER-clause conditionals), 'count_distinct'
    (2x COUNT DISTINCT per returnflag), 'exact_quantiles' (grouped
    exact median/p90 via the spillable histogram operator). bench.py
    times each separately into BENCH_DETAIL's subtimers map so
    round-over-round drift on the merged row names its arm. The arm
    medians need not sum to the merged row's time (the merged plan
    shares one scan and adds the broadcast join)."""
    from ..operators.quantile import grouped_exact_quantiles

    li = load_table(spark, sf_dir, "lineitem")
    q1 = (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _sum2(F.col("l_quantity")).alias("sum_qty"),
            _sum2(F.col("l_extendedprice")).alias("sum_base_price"),
            (
                F.round(_sum2(F.col("l_quantity")) / F.count(F.lit(1)) * 10000)
                / 10000
                + F.lit(0.0)
            ).alias("avg_qty"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
            F.count(F.when(F.col("l_quantity") > 25, 1)).alias("n_bulk"),
            (
                F.sum(
                    F.when(
                        F.col("l_discount") > 0.05,
                        _scaled_cents(F.col("l_extendedprice")),
                    )
                )
                / F.lit(100.0)
            ).alias("discounted_revenue"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    base = li.groupBy(F.col("l_returnflag").alias("__rf")).agg(
        F.count_distinct("l_partkey").alias("n_parts"),
        F.count_distinct("l_suppkey").alias("n_supps"),
    )
    qs = grouped_exact_quantiles(
        li,
        ["l_returnflag"],
        [("l_quantity", 0.5, "__mq"), ("l_extendedprice", 0.9, "__pp")],
    ).withColumnRenamed("l_returnflag", "__g1")
    return {"q1": q1, "count_distinct": base, "exact_quantiles": qs}


@_q(
    "set_ops",
    """
    SELECT nk FROM (
        SELECT c_nationkey AS nk FROM customer
        INTERSECT
        SELECT s_nationkey AS nk FROM supplier
    )
    UNION
    SELECT nk FROM (
        SELECT n_nationkey AS nk FROM nation WHERE n_regionkey = 0
        EXCEPT
        SELECT s_nationkey AS nk FROM supplier
    )
    """,
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION(distinct) + the trailing .distinct()
    row-dedup — none exist in the reference (SURVEY §2.4; absorbs the
    former distinct_rows query)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    n = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_regionkey") == 0)
        .select(F.col("n_nationkey").alias("nk"))
    )
    return c.intersect(s).union(n.exceptAll(s)).distinct()


@_q(
    "topk_per_group",
    """
    SELECT l_returnflag, l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 2) AS price, rnk
    FROM (
        SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
               RANK() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice DESC, l_orderkey ASC,
                                     l_linenumber ASC) AS rnk
        FROM lineitem
    ) WHERE rnk <= 5
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via two-phase RANK (operators/topk.py): l_returnflag
    has only 3 values, so a single window over it would sort the whole
    table in 3 tasks — a scale-killer at 100x. The partial phase ranks
    within (group, input partition), the final window sees <= k x P
    candidates."""
    li = load_table(spark, sf_dir, "lineitem")
    # r14: pre-spread the single-file scan by HASH on the (well-spread)
    # orderkey so grouped_topk's internal parallelism guard no-ops —
    # its keyless fallback is a round-robin exchange whose mandatory
    # sortBeforeRepartition binary sort serializes on the one input
    # split (measured 0.89 s -> 0.49 s for this row at sf0.1). No-op on
    # many-file inputs, like the guard itself.
    li = ensure_scan_parallelism(li, spread_by=("l_orderkey",))
    order = [
        F.col("l_extendedprice").desc(),
        F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
    ]
    return grouped_topk(li, ["l_returnflag"], order, k=5, rank_fn=F.rank).select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        money("l_extendedprice").alias("price"),
        "rnk",
    )


@_q(
    "window_functions",
    """
    SELECT o_orderkey, o_custkey,
           ROW_NUMBER()   OVER w AS rn,
           DENSE_RANK()   OVER w AS drnk,
           NTILE(4)       OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST()    OVER w, 6) AS cume,
           ROUND(LAG(o_totalprice)  OVER w, 2) AS prev_total,
           ROUND(LEAD(o_totalprice) OVER w, 2) AS next_total,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / 100 AS running_total,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) OVER (
               PARTITION BY o_custkey ORDER BY o_orderkey
               RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / 100 AS near_total,
           FIRST_VALUE(o_orderkey)  OVER wf AS first_key,
           LAST_VALUE(o_orderkey)   OVER wf AS last_key,
           NTH_VALUE(o_orderkey, 2) OVER wf AS second_key
    FROM orders
    -- NULLS FIRST: Spark ASC places nulls first, DuckDB ASC places them
    -- LAST by default — on a null o_orderdate the whole ranking family
    -- silently diverges (caught by the adversarial relational fixture)
    WINDOW w  AS (PARTITION BY o_custkey
                  ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey ASC),
           wf AS (PARTITION BY o_custkey
                  ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full window-function family over ONE hash-shuffle on the
    partition key (merged former window_row_number / window_lag_lead /
    window_running_sum / window_rank_family / window_range_frame /
    window_first_last_nth queries):
    - ranking: row_number (S:49 with the deterministic tiebreak the
      reference lacks), dense_rank, ntile, percent_rank, cume_dist;
    - offsets: lag / lead;
    - ROWS running frame (decimal accumulation keeps prefix sums exact);
    - RANGE value-based frame (orders within 1000 below the current key);
    - first/last/nth_value over the full-partition frame (the default
      frame would make last_value == current row — a classic trap).
    All four specs share partitionBy(o_custkey): one exchange, the extra
    sorts (range frame's different ORDER BY) reuse the same partitioning."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_rng = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderkey"))
        .rangeBetween(-1000, Window.currentRow)
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cents_total = _scaled_cents(F.col("o_totalprice"))
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).alias("rn"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        money(F.lag("o_totalprice").over(w)).alias("prev_total"),
        money(F.lead("o_totalprice").over(w)).alias("next_total"),
        (F.sum(cents_total).over(w_run) / F.lit(100.0)).alias("running_total"),
        (F.sum(cents_total).over(w_rng) / F.lit(100.0)).alias("near_total"),
        F.first("o_orderkey").over(w_full).alias("first_key"),
        F.last("o_orderkey").over(w_full).alias("last_key"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_key"),
    )


@_q(
    "semi_anti_join",
    """
    SELECT c_custkey, 'has_order' AS tag FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2001-01-01')
    UNION ALL
    SELECT c_custkey, 'no_order' AS tag FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2001-01-01')
    """,
)
def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI + LEFT ANTI — the anti-join is also the engine's
    idempotent-sink primitive (SURVEY §2 #4, sinks/idempotent.py)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= F.lit("2001-01-01"))
    cond = F.col("c_custkey") == F.col("o_custkey")
    has = c.join(o, cond, "left_semi").select("c_custkey", F.lit("has_order").alias("tag"))
    not_has = c.join(o, cond, "left_anti").select("c_custkey", F.lit("no_order").alias("tag"))
    return has.unionAll(not_has)


@_q(
    "pivot_unpivot",
    """
    WITH p AS (
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN l_linestatus = 'F'
                        THEN CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) END) AS DOUBLE) / 100 AS qty_F,
               CAST(SUM(CASE WHEN l_linestatus = 'O'
                        THEN CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) END) AS DOUBLE) / 100 AS qty_O
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'qty_F' AS status, qty_F AS qty FROM p WHERE qty_F IS NOT NULL
    UNION ALL
    SELECT l_returnflag, 'qty_O' AS status, qty_O AS qty FROM p WHERE qty_O IS NOT NULL
    """,
)
def pivot_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with explicit value list (one pass; no value-discovery job)
    melted straight back with the native single-pass unpivot — the
    round-trip exercises both operators in one plan (absorbs the former
    pivot_agg and unpivot_metrics queries). NOTE: Spark's DataFrame
    unpivot KEEPS null measure rows (unlike SQL UNPIVOT's EXCLUDE NULLS
    default), so an empty pivot cell — a (returnflag, linestatus) combo
    that never occurs — would surface as a null-qty row; the explicit
    isNotNull filter enforces EXCLUDE NULLS to match the oracle on any
    data, not just fixtures where every cell is populated."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(_sum2(F.col("l_quantity")))
        .withColumnRenamed("F", "qty_F")
        .withColumnRenamed("O", "qty_O")
    )
    melted = wide.unpivot(["l_returnflag"], ["qty_F", "qty_O"], "status", "qty")
    return melted.filter(F.col("qty").isNotNull())


@_q(
    "string_functions",
    r"""
    SELECT p_partkey,
           upper(p_brand)                         AS brand_up,
           lower(p_name)                          AS name_lo,
           substr(p_name, 1, 12)                  AS name_prefix,
           length(p_name)                         AS name_len,
           replace(p_type, ' ', '_')              AS type_snake,
           trim(p_type)                           AS type_trim,
           regexp_extract(p_type, '^(\w+)', 1)    AS type_head,
           -- NULL guard: DuckDB split_part(NULL, ...) returns ''
           -- where Spark propagates NULL
           CASE WHEN p_type IS NULL
                THEN NULL ELSE split_part(p_type, ' ', 1) END AS type_first,
           lpad(CAST(p_size AS VARCHAR), 4, '0')  AS size_pad,
           -- || propagates NULL like Spark's concat; DuckDB's concat()
           -- silently SKIPS null arguments
           (p_brand || ':' || p_type)             AS brand_type,
           p_name LIKE '%bolt%'                   AS has_bolt,
           p_name LIKE 'red%'                     AS is_red,
           p_brand LIKE '%1_'                     AS brand_teens,
           regexp_matches(p_brand, '[0-9]$')      AS brand_digit_end,
           CASE WHEN regexp_matches(p_type, '^(ECONOMY|PROMO)')
                THEN 'cheap' ELSE 'other' END     AS tier
    FROM part
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string library + LIKE (%, _) / regex (RLIKE) predicates
    (absent in the reference, SURVEY §2.4; absorbs the former
    like_regex_predicates query)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_up"),
        F.lower("p_name").alias("name_lo"),
        F.substring("p_name", 1, 12).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.trim("p_type").alias("type_trim"),
        F.regexp_extract("p_type", r"^(\w+)", 1).alias("type_head"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_first"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.col("p_name").like("%bolt%").alias("has_bolt"),
        F.col("p_name").like("red%").alias("is_red"),
        F.col("p_brand").like("%1_").alias("brand_teens"),
        F.col("p_brand").rlike("[0-9]$").alias("brand_digit_end"),
        F.when(F.col("p_type").rlike("^(ECONOMY|PROMO)"), "cheap")
        .otherwise("other")
        .alias("tier"),
    )


# math_functions merged into computed_arithmetic (round 10): same
# lineitem row spine, and the registry holds at the driver's 50-query
# gate window (plans/__init__.py).


@_q(
    "json_extract",
    """
    WITH j AS (
        SELECT event_id, event_type,
               CASE WHEN json_valid(props)
                    THEN json_extract_string(props, '$.k') END AS ks
        FROM events
    )
    SELECT event_id, event_type,
           -- strict integer strings only: DuckDB's TRY_CAST parses '1.9'
           -- as a double and ROUNDS to 2 where Spark's try_cast yields
           -- NULL; the regex pins both engines to the Spark rule
           CASE WHEN regexp_matches(trim(ks), '^[+-]?[0-9]+$')
                THEN TRY_CAST(trim(ks) AS BIGINT) END AS k_val
    FROM j
    """,
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from a string column (events.props)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        # try_cast: a non-scalar or junk $.k ('[1,2]', 'true', 'x')
        # yields NULL instead of aborting the job under ANSI mode
        F.get_json_object("props", "$.k").try_cast("bigint").alias("k_val"),
    )


@_q(
    "range_join",
    """
    SELECT l.l_orderkey, l.l_linenumber, b.bucket_name
    FROM lineitem l
    JOIN (VALUES (0.0, 10.0, 'small'), (10.0, 25.0, 'mid'), (25.0, 100.0, 'large'))
         AS b(lo, hi, bucket_name)
      ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
    """,
)
def range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join against a tiny bucket dim — broadcast
    nested-loop by construction, which is the right plan: the big side
    streams, no shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    buckets = spark.createDataFrame(
        [(0.0, 10.0, "small"), (10.0, 25.0, "mid"), (25.0, 100.0, "large")],
        "lo double, hi double, bucket_name string",
    )
    return li.join(
        F.broadcast(buckets),
        (F.col("l_quantity") >= F.col("lo")) & (F.col("l_quantity") < F.col("hi")),
    ).select("l_orderkey", "l_linenumber", "bucket_name")


_ASOF_TOL_US = 7 * 24 * 3600 * 1_000_000  # 7 days in epoch-micros


def _us_to_ms(c: F.Column | str) -> F.Column:
    """Exact floor(micros/1000) — same integer-exact discipline as
    ``epoch_ms`` (see functions/tsql.py), applied to an already-numeric
    epoch-micros column."""
    c = F.col(c) if isinstance(c, str) else c
    return ((c - F.pmod(c, F.lit(1000))).cast("decimal(20,0)") / F.lit(1000)).cast(
        "long"
    )


@_q(
    "asof_join",
    f"""
    WITH base AS (
        SELECT user_id, epoch_us(ts) AS t, event_id, event_type
        FROM events
        WHERE event_type IN ('purchase', 'signup', 'click')
          AND ts IS NOT NULL AND user_id IS NOT NULL
    ),
    u1 AS (
        SELECT user_id, t, 0 AS side,
               MIN(event_id) AS signup_id, t AS sig_t,
               CAST(NULL AS BIGINT) AS purchase_id
        FROM base WHERE event_type = 'signup' GROUP BY user_id, t
        UNION ALL
        SELECT user_id, t, 1, NULL, NULL, event_id
        FROM base WHERE event_type = 'purchase'
    ),
    f1 AS (
        SELECT user_id, t, side, purchase_id,
               last_value(signup_id IGNORE NULLS) OVER w AS signup_id,
               last_value(sig_t IGNORE NULLS) OVER w AS sig_t
        FROM u1
        WINDOW w AS (PARTITION BY user_id ORDER BY t ASC, side ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    p1 AS (
        SELECT user_id, t, purchase_id,
               CASE WHEN t - sig_t <= {_ASOF_TOL_US} THEN signup_id END
                   AS signup_id,
               CASE WHEN t - sig_t <= {_ASOF_TOL_US} THEN sig_t END
                   AS signup_t
        FROM f1 WHERE side = 1
    ),
    u2 AS (
        SELECT user_id, t, 0 AS side,
               MIN(event_id) AS next_click_id, t AS click_t,
               CAST(NULL AS BIGINT) AS purchase_id,
               CAST(NULL AS BIGINT) AS signup_id,
               CAST(NULL AS BIGINT) AS signup_t
        FROM base WHERE event_type = 'click' GROUP BY user_id, t
        UNION ALL
        SELECT user_id, t, 1, NULL, NULL, purchase_id, signup_id, signup_t
        FROM p1
    ),
    f2 AS (
        SELECT user_id, t, side, purchase_id, signup_id, signup_t,
               last_value(next_click_id IGNORE NULLS) OVER w AS next_click_id,
               last_value(click_t IGNORE NULLS) OVER w AS click_t
        FROM u2
        WINDOW w AS (PARTITION BY user_id ORDER BY t DESC, side ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, purchase_id,
           CAST((t - ((t % 1000) + 1000) % 1000) // 1000 AS BIGINT)
               AS purchase_ts_ms,
           signup_id,
           CAST((signup_t - ((signup_t % 1000) + 1000) % 1000) // 1000
                AS BIGINT) AS signup_ts_ms,
           next_click_id,
           CAST((click_t - ((click_t % 1000) + 1000) % 1000) // 1000
                AS BIGINT) AS click_ts_ms
    FROM f2 WHERE side = 1
    """,
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join through the GENERALIZED operator (operators/asof.py),
    FUSED single-scan form (VERDICT r09 #1): both lookups per purchase —
    (1) BACKWARD with a 7-day TOLERANCE: latest signup at-or-before
    each purchase, match dropped when older than the tolerance;
    (2) FORWARD: earliest click at-or-after the purchase —
    run through ``asof_self_join``: purchases, signups and clicks are
    ROLES of the one events relation, tagged with when() projections,
    so the whole plan is ONE parquet scan -> ONE hash exchange on
    user_id -> two local window sorts (the second window re-sorts but
    does not re-shuffle: Window only requires
    ClusteredDistribution(user_id), satisfied by the first window's
    output partitioning — scan/exchange counts asserted in
    tests/test_asof_generic.py). r9's two chained generic calls paid
    two full union+window shuffles plus two pre-dedup groupBys and
    four scans of events; this plan pays one scan + one exchange
    total — the shape that matters when events is the 100 TB
    table. The DuckDB
    oracle re-derives both passes ASOF-JOIN-free with the same union
    construction (side 0 sorts before side 1 at equal t, so
    at-the-same-instant ties are included in both directions), so the
    operator's tolerance and direction semantics are hash-checked, not
    just pandas-pinned.

    Determinism discipline: NULL-ts / NULL-user events are excluded on
    BOTH sides (DuckDB's window null ordering differs from the
    operator's NULL-row bypass); duplicate (user_id, t) right rows
    resolve to MIN(event_id) via the specs' ``tiebreak`` — shuffle-free
    in Spark (a window-order tiebreak, not a groupBy), equivalent to
    the oracle's MIN(event_id) GROUP BY because the payload IS the
    event_id."""
    from ..operators.asof import AsofRole, asof_self_join

    ev = load_table(spark, sf_dir, "events")
    t = F.unix_micros(
        F.col("ts").cast("timestamp_ntz").cast("timestamp")
    ).alias("t")
    base = (
        ev.filter(F.col("event_type").isin("purchase", "signup", "click"))
        .filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select("user_id", t, "event_id", "event_type")
    )
    et = F.col("event_type")
    out = asof_self_join(
        base,
        on="t",
        by=["user_id"],
        left_predicate=et == "purchase",
        left_payload={"purchase_id": F.col("event_id")},
        roles=[
            AsofRole(
                predicate=et == "signup",
                payload={"signup_id": F.col("event_id")},
                direction="backward",
                tolerance=_ASOF_TOL_US,
                tiebreak=F.col("event_id"),
                matched_on="signup_t",
            ),
            AsofRole(
                predicate=et == "click",
                payload={"next_click_id": F.col("event_id")},
                direction="forward",
                tiebreak=F.col("event_id"),
                matched_on="click_t",
            ),
        ],
        keep_null_on_left=False,
    )
    return out.select(
        "user_id",
        "purchase_id",
        _us_to_ms("t").alias("purchase_ts_ms"),
        "signup_id",
        _us_to_ms("signup_t").alias("signup_ts_ms"),
        "next_click_id",
        _us_to_ms("click_t").alias("click_ts_ms"),
    )


@_q(
    "subquery_filters",
    """
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS total
    FROM orders o
    WHERE o_totalprice > (
        SELECT CAST(SUM(CAST(FLOOR(o2.o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
               / 100 / COUNT(*)
        FROM orders o2 WHERE o2.o_custkey = o.o_custkey
    )
    AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
    """,
)
def subquery_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subquery predicates, both kinds in one query (merged former
    in_subquery + correlated_scalar_subquery queries): orders above their
    customer's average (correlated scalar subquery, written directly in
    its decorrelated form — a window aggregate over one hash-partition
    pass, what Catalyst's RewriteCorrelatedScalarSubquery produces) AND
    customer in a rich-customer set (IN-subquery == left-semi join).
    Average built as scaled-long-sum/count so both engines divide
    identical doubles."""
    o = load_table(spark, sf_dir, "orders")
    rich = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    w = Window.partitionBy("o_custkey")
    avg_c = (
        F.sum(_scaled_cents(F.col("o_totalprice"))).over(w)
        / F.lit(100.0)
        / F.count(F.lit(1)).over(w)
    )
    return (
        o.withColumn("avg_c", avg_c)
        .filter(F.col("o_totalprice") > F.col("avg_c"))
        .join(rich, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .select("o_orderkey", "o_custkey", money("o_totalprice").alias("total"))
    )
