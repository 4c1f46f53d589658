"""Idempotent sink semantics (≙ ON CONFLICT DO NOTHING, S:214-218):
write twice -> no duplicates; conflicting keys -> first writer wins."""

import pytest
from pyspark.sql import functions as F

from ferramenta_etl_spark.sinks import ensure_table, write_ignore_conflicts
from ferramenta_etl_spark.sources import load_table
from ferramenta_etl_spark.sources.tables import SchemaContractError


@pytest.fixture()
def target(tmp_path):
    return str(tmp_path / "parcela_sink")


def test_rerun_is_noop(spark, sf_dir, target):
    li = load_table(spark, sf_dir, "lineitem").limit(500)
    n1 = write_ignore_conflicts(li, target, keys=["l_orderkey", "l_linenumber"])
    n2 = write_ignore_conflicts(li, target, keys=["l_orderkey", "l_linenumber"])
    assert n1 > 0 and n2 == 0
    out = spark.read.parquet(target)
    assert out.count() == n1
    assert (
        out.groupBy("l_orderkey", "l_linenumber").count().filter(F.col("count") > 1).count()
        == 0
    )


def test_first_writer_wins(spark, target):
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    df2 = spark.createDataFrame([(2, "CHANGED"), (3, "c")], "k int, v string")
    write_ignore_conflicts(df1, target, keys=["k"])
    n = write_ignore_conflicts(df2, target, keys=["k"])
    assert n == 1  # only k=3 is new
    rows = {r.k: r.v for r in spark.read.parquet(target).collect()}
    assert rows == {1: "a", 2: "b", 3: "c"}  # k=2 NOT updated (DO NOTHING)


def test_in_batch_duplicates_collapse(spark, target):
    df = spark.createDataFrame([(1, "x"), (1, "y"), (2, "z")], "k int, v string")
    n = write_ignore_conflicts(df, target, keys=["k"], order_by=["v"])
    assert n == 2  # deterministic pick per key


def test_schema_contract_on_append(spark, target):
    df1 = spark.createDataFrame([(1, "a")], "k int, v string")
    write_ignore_conflicts(df1, target, keys=["k"])
    bad = spark.createDataFrame([(2, "b")], "k int, OTHER string")
    with pytest.raises(SchemaContractError):
        write_ignore_conflicts(bad, target, keys=["k"])


def test_ensure_table_idempotent(spark, target):
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    assert ensure_table(spark, target, df) is True
    assert ensure_table(spark, target, df) is False
    assert spark.read.parquet(target).count() == 0
