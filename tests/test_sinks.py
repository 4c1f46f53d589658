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


def test_partitioned_sink_rerun_is_noop(spark, target):
    df = spark.createDataFrame(
        [("2024-01-01", 1, "a"), ("2024-01-01", 2, "b"), ("2024-01-02", 3, "c")],
        "dt string, k int, v string",
    )
    n1 = write_ignore_conflicts(df, target, keys=["dt", "k"], partition_cols=["dt"])
    n2 = write_ignore_conflicts(df, target, keys=["dt", "k"], partition_cols=["dt"])
    assert n1 == 3 and n2 == 0
    out = spark.read.parquet(target)
    assert out.count() == 3
    assert sorted(out.columns) == ["dt", "k", "v"]  # partition col survives
    import os

    assert os.path.isdir(f"{target}/dt=2024-01-01")  # hive layout on disk


def test_partitioned_sink_prunes_conflict_scan(spark, target):
    """The conflict check must read ONLY the touched partitions: poison an
    untouched partition directory with a corrupt file — a whole-table key
    scan would die on it, the pruned scan never opens it."""
    import os

    day1 = spark.createDataFrame([("2024-01-01", 1, "a")], "dt string, k int, v string")
    day2 = spark.createDataFrame([("2024-01-02", 2, "b")], "dt string, k int, v string")
    write_ignore_conflicts(day1, target, keys=["dt", "k"], partition_cols=["dt"])
    write_ignore_conflicts(day2, target, keys=["dt", "k"], partition_cols=["dt"])
    bad = f"{target}/dt=2024-01-01/part-99999-corrupt.snappy.parquet"
    with open(bad, "wb") as f:
        f.write(b"this is not parquet")
    try:
        day2b = spark.createDataFrame(
            [("2024-01-02", 2, "DUP"), ("2024-01-02", 9, "new")],
            "dt string, k int, v string",
        )
        n = write_ignore_conflicts(day2b, target, keys=["dt", "k"], partition_cols=["dt"])
        assert n == 1  # k=9 only; k=2 conflict detected within the pruned day
    finally:
        os.remove(bad)
    out = spark.read.parquet(target).filter(F.col("dt") == "2024-01-02")
    assert {r.k: r.v for r in out.collect()} == {2: "b", 9: "new"}


def test_partition_cols_must_be_keys(spark, target):
    df = spark.createDataFrame([("2024-01-01", 1, "a")], "dt string, k int, v string")
    with pytest.raises(ValueError, match="subset of keys"):
        write_ignore_conflicts(df, target, keys=["k"], partition_cols=["dt"])


def test_partitioned_sink_survives_empty_first_write(spark, tmp_path):
    """A partitioned first load with ZERO rows writes no part files
    (nothing to partition) — the sink directory must not poison later
    loads with UNABLE_TO_INFER_SCHEMA (regression: hypothesis found it
    via an all-sub-shingle first batch in the dedup index)."""
    from ferramenta_etl_spark.sinks import write_ignore_conflicts

    path = str(tmp_path / "sink")
    empty = spark.createDataFrame([], "k long, p long, v string")
    assert write_ignore_conflicts(
        empty, path, keys=["k", "p"], partition_cols=["p"]
    ) == 0
    rows = spark.createDataFrame([(1, 0, "x"), (2, 1, "y")], "k long, p long, v string")
    assert write_ignore_conflicts(
        rows, path, keys=["k", "p"], partition_cols=["p"]
    ) == 2
    # and the conflict check works once data exists
    assert write_ignore_conflicts(
        rows, path, keys=["k", "p"], partition_cols=["p"]
    ) == 0
