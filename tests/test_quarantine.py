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


def test_sink_quarantine_flag(spark, tmp_path):
    """write_ignore_conflicts with bad_records_path: one flag gives the
    reference's keep-going posture — bad rows audited, load succeeds."""
    df = spark.createDataFrame(
        [(1, 10.0), (None, 5.0), (2, -3.0), (2, -3.0)], "k int, amount double"
    )
    sink = str(tmp_path / "sink")
    qdir = str(tmp_path / "bad")
    # default rules: key columns non-null
    n = write_ignore_conflicts(df, sink, keys=["k"], bad_records_path=qdir)
    assert n == 2  # k=1 and k=2 (deduped); null key quarantined
    bad = spark.read.parquet(qdir).collect()
    assert len(bad) == 1 and bad[0]._violations == ["k_not_null"]
    # extra caller rules compose with the defaults
    df2 = spark.createDataFrame([(3, -1.0), (4, 7.0)], "k int, amount double")
    n2 = write_ignore_conflicts(
        df2, sink, keys=["k"], bad_records_path=qdir,
        rules={"amount_positive": F.col("amount") > 0},
    )
    assert n2 == 1
    assert spark.read.parquet(qdir).count() == 2
    # rules without a quarantine destination would silently lose rows
    with pytest.raises(ValueError, match="bad_records_path"):
        write_ignore_conflicts(
            df2, sink, keys=["k"], rules={"amount_positive": F.col("amount") > 0}
        )


def test_shipped_job_quarantines_poisoned_fixture(spark, sf_dir, tmp_path):
    """A shipped registry job over a poisoned source: N-k rows load, k
    rows land in quarantine with _violations, and the job SUCCEEDS —
    the reference's S:231-236 posture as one build_jobs argument."""
    import pyarrow.parquet as pq
    import pyarrow as pa

    from ferramenta_etl_spark.pipeline.jobs import build_jobs

    src = pq.read_table(f"{sf_dir}/lineitem.parquet")
    k = 7
    poison = src.slice(0, k).set_column(
        src.schema.get_field_index("l_orderkey"),
        "l_orderkey",
        pa.array([None] * k, type=src.schema.field("l_orderkey").type),
    )
    poisoned_dir = tmp_path / "sf_poisoned"
    poisoned_dir.mkdir()
    pq.write_table(
        pa.concat_tables([src, poison]), str(poisoned_dir / "lineitem.parquet")
    )

    sink_dir = str(tmp_path / "sinks")
    qdir = str(tmp_path / "quarantine")
    jobs = build_jobs(str(poisoned_dir), sink_dir, quarantine_dir=qdir)
    n = jobs["alimentacao_view_adicionais"](spark)
    assert n > 0
    bad = spark.read.parquet(f"{qdir}/view_adicionais")
    assert bad.count() == k
    assert {tuple(r._violations) for r in bad.collect()} == {
        ("id_manifesto_not_null",)
    }
    # loaded side has no null keys and is idempotent on rerun
    loaded = spark.read.parquet(f"{sink_dir}/view_adicionais")
    assert loaded.filter(F.col("id_manifesto").isNull()).count() == 0
    assert jobs["alimentacao_view_adicionais"](spark) == 0
