"""Bucketed tables eliminate the join/agg shuffle — proven on the plan,
not just asserted in prose."""

import pytest
from pyspark.sql import functions as F

from ferramenta_etl_spark.sources import load_table
from ferramenta_etl_spark.sources.bucketing import (
    exchanges_in_plan,
    read_bucketed,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "orders_b", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(lineitem, "lineitem_b", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_is_shuffle_free(spark, sf_dir, bucketed_tables):
    ot, lt = bucketed_tables
    o, li = read_bucketed(spark, ot), read_bucketed(spark, lt)
    # force the sort-merge path so the exchange count is about bucketing,
    # not about one side being broadcast-small at test scale
    with_smj = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, li.l_orderkey == o.o_orderkey).select(
            "l_orderkey", "l_linenumber", "o_orderstatus"
        )
        joined.write.format("noop").mode("overwrite").save()
        assert exchanges_in_plan(joined) == 0, "bucketed equi-join still shuffled"

        # same join on the un-bucketed parquet shuffles BOTH sides
        o_raw = load_table(spark, sf_dir, "orders")
        li_raw = load_table(spark, sf_dir, "lineitem")
        raw = li_raw.join(o_raw, li_raw.l_orderkey == o_raw.o_orderkey).select(
            "l_orderkey", "l_linenumber", "o_orderstatus"
        )
        raw.write.format("noop").mode("overwrite").save()
        assert exchanges_in_plan(raw) >= 2

        assert joined.count() == raw.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", with_smj)


def test_bucketed_agg_is_shuffle_free(spark, bucketed_tables):
    _, lt = bucketed_tables
    li = read_bucketed(spark, lt)
    agg = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    agg.write.format("noop").mode("overwrite").save()
    assert exchanges_in_plan(agg) == 0, "groupBy on the bucket key shuffled"
    assert agg.count() == li.select("l_orderkey").distinct().count()


def test_flagship_bucketed_same_result_fewer_exchanges(spark, sf_dir):
    """The measured shuffle-eliminator path (VERDICT r03 #4): flagship
    over bucketed orderkey mirrors must return the IDENTICAL multiset of
    rows with strictly fewer shuffle exchanges (both orderkey fact joins
    read co-located buckets)."""
    from ferramenta_etl_spark.plans.bucketed import flagship_bucketed
    from ferramenta_etl_spark.plans.flagship import QUERIES

    plain = QUERIES["flagship"](spark, sf_dir)
    bucketed = flagship_bucketed(spark, sf_dir)

    cols = plain.columns
    assert bucketed.columns == cols
    # order-insensitive multiset compare, driver-gate style
    key = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols]))
    a = plain.select(key.alias("h")).groupBy("h").count()
    b = bucketed.select(key.alias("h")).groupBy("h").count()
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()

    # the plan property the mirrors exist for: with broadcast disabled
    # (at fixture scale EVERY table broadcasts, which models nothing —
    # at 100 TB the fact joins are shuffle joins), the bucketed plan
    # must shuffle strictly less. Both DataFrames are built FRESH under
    # the disabled conf (kwargs bypass the plan cache): a DataFrame's
    # AQE plan finalizes on its FIRST execution, so the plan-cached
    # `plain` above may already carry a broadcast-planned execution from
    # an earlier test and would under-count its shuffles here (caught as
    # an order-dependent failure when parity ran before this file).
    from ferramenta_etl_spark.plans.bucketed import bucketed_facts
    from ferramenta_etl_spark.plans.flagship import flagship as flagship_fn

    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain_f = flagship_fn(spark, sf_dir, ordered=False)
        bucketed_f = flagship_fn(
            spark, sf_dir, ordered=False, tables=bucketed_facts(spark, sf_dir)
        )
        plain_f.write.format("noop").mode("overwrite").save()
        bucketed_f.write.format("noop").mode("overwrite").save()
        n_plain = exchanges_in_plan(plain_f)
        n_bucketed = exchanges_in_plan(bucketed_f)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    assert n_bucketed < n_plain, (
        f"bucketed flagship should shuffle less: {n_bucketed} vs {n_plain}"
    )


def test_flagship_bucketed_removes_fact_exchanges(spark, sf_dir):
    """The full-plan contract (round 11, SCALING.md decomposition):
    under the no-broadcast shape — where orders/lineitem could never
    broadcast, i.e. the 100 TB fact-fact reality — the orderkey mirrors
    must remove the three promised fact-side exchanges (the CTE
    bridge's lineitem side + both sides of the final parcelas⋈header
    join) from the flagship plan."""
    from ferramenta_etl_spark.plans.bucketed import bucketed_facts
    from ferramenta_etl_spark.plans.flagship import flagship

    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    saved = {k: spark.conf.get(k, None) for k in keys}
    for k in keys:
        spark.conf.set(k, "-1")
    try:
        # kwargs bypass the plan cache, so both plans build under the
        # no-broadcast conf rather than being served pre-planned
        plain = flagship(spark, sf_dir, ordered=False)
        mirrors = bucketed_facts.__wrapped__(spark, sf_dir)
        bucketed = flagship(spark, sf_dir, tables=mirrors)
        plain.write.format("noop").mode("overwrite").save()
        bucketed.write.format("noop").mode("overwrite").save()

        def n_exchanges(df):
            return (
                df._jdf.queryExecution().executedPlan().toString()
                .count("Exchange hashpartitioning")
            )

        np_, nb = n_exchanges(plain), n_exchanges(bucketed)
        assert nb <= np_ - 3, (np_, nb)
        assert bucketed.count() == plain.count()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
