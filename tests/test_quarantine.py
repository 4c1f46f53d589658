"""Bad-record quarantine (≙ the reference's skip-bad-batch-and-continue,
S:231-236) and the Delta MERGE backend surface of the idempotent sink."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ferramenta_etl_spark.sinks import (
    merge_insert_condition,
    quarantine_invalid,
    read_json_with_quarantine,
    split_by_rules,
    write_ignore_conflicts,
)
from ferramenta_etl_spark.sinks.idempotent import _delta_available


def _rules():
    return {
        "key_not_null": F.col("k").isNotNull(),
        "amount_positive": F.col("amount") > 0,
    }


def test_split_by_rules_flags_all_violations(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (None, 5.0), (3, -2.0), (None, -1.0)],
        "k int, amount double",
    )
    valid, invalid = split_by_rules(df, _rules())
    assert [r.k for r in valid.collect()] == [1]
    flags = {tuple(r._violations) for r in invalid.collect()}
    assert ("key_not_null",) in flags
    assert ("amount_positive",) in flags
    assert ("key_not_null", "amount_positive") in flags


def test_null_comparison_counts_as_violation(spark):
    # amount NULL -> (amount > 0) is NULL, which must quarantine, not pass
    df = spark.createDataFrame([(1, None)], "k int, amount double")
    valid, invalid = split_by_rules(df, _rules())
    assert valid.count() == 0 and invalid.count() == 1


def test_quarantine_invalid_continues_with_valid(spark, tmp_path):
    qpath = str(tmp_path / "quarantine")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 9)] + [(None, 1.0), (99, -5.0)],
        "k int, amount double",
    )
    valid, n_bad = quarantine_invalid(df, _rules(), qpath)
    assert n_bad == 2
    assert valid.count() == 8  # N-k loaded, k quarantined
    q = spark.read.parquet(qpath)
    assert q.count() == 2
    assert "_violations" in q.columns


def test_read_json_with_quarantine(spark, tmp_path):
    src = tmp_path / "events.jsonl"
    good = [f'{{"id": {i}, "name": "row{i}"}}' for i in range(8)]
    bad = ['{"id": broken', "not json at all"]
    src.write_text("\n".join(good[:4] + bad + good[4:]) + "\n")
    schema = StructType(
        [StructField("id", IntegerType()), StructField("name", StringType())]
    )
    qpath = str(tmp_path / "quarantine")
    valid, n_bad = read_json_with_quarantine(spark, str(src), schema, qpath)
    assert n_bad == 2
    assert valid.count() == 8
    assert valid.columns == ["id", "name"]
    raw = {r.raw_record for r in spark.read.parquet(qpath).collect()}
    assert raw == {'{"id": broken', "not json at all"}


def test_merge_condition_builder():
    assert (
        merge_insert_condition(["id_manifesto", "cd_parcela"])
        == "t.`id_manifesto` <=> s.`id_manifesto` AND t.`cd_parcela` <=> s.`cd_parcela`"
    )
    with pytest.raises(ValueError):
        merge_insert_condition([])


def test_delta_backend_requires_package(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    if _delta_available():
        pytest.skip("delta installed; covered by test_delta_merge_roundtrip")
    with pytest.raises(RuntimeError, match="delta-spark"):
        write_ignore_conflicts(df, str(tmp_path / "t"), keys=["k"], backend="delta")


@pytest.mark.skipif(not _delta_available(), reason="delta-spark not installed")
def test_delta_merge_roundtrip(spark, tmp_path):
    target = str(tmp_path / "delta_sink")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    df2 = spark.createDataFrame([(2, "CHANGED"), (3, "c")], "k int, v string")
    assert write_ignore_conflicts(df1, target, keys=["k"], backend="delta") == 2
    assert write_ignore_conflicts(df2, target, keys=["k"], backend="delta") == 1
    rows = {r.k: r.v for r in spark.read.format("delta").load(target).collect()}
    assert rows == {1: "a", 2: "b", 3: "c"}
