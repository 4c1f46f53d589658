"""Row-ID assignment operators (operators/ids.py)."""

import pytest
from pyspark.sql import functions as F

from ferramenta_etl_spark.operators.ids import (
    content_ids,
    dense_ids,
    id_collisions,
)


def test_dense_ids_exactly_0_to_n(spark, sf_dir):
    from ferramenta_etl_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").repartition(7)
    out = dense_ids(docs, "row_id")
    n = docs.count()
    got = [r.row_id for r in out.select("row_id").collect()]
    assert sorted(got) == list(range(n))
    # schema: original columns preserved, id appended last
    assert out.columns == docs.columns + ["row_id"]
    # deterministic for a fixed layout: same ids on re-run
    again = {
        (r.doc_id, r.row_id)
        for r in dense_ids(docs, "row_id").select("doc_id", "row_id").collect()
    }
    first = {(r.doc_id, r.row_id) for r in out.select("doc_id", "row_id").collect()}
    assert first == again


def test_dense_ids_empty_partitions_and_empty_df(spark):
    df = spark.range(0, 10).repartition(32)  # most partitions empty
    got = sorted(r.row_id for r in dense_ids(df).collect())
    assert got == list(range(10))
    empty = spark.range(0, 0).repartition(4)
    assert dense_ids(empty).count() == 0


def test_dense_ids_rejects_existing_column(spark):
    with pytest.raises(ValueError, match="already exists"):
        dense_ids(spark.range(3).withColumnRenamed("id", "row_id"))
    # the internal partition tag is reserved loudly, not clobbered
    with pytest.raises(ValueError, match="__pid"):
        dense_ids(spark.range(3).withColumnRenamed("id", "__pid"))


def test_content_ids_stable_across_partitioning(spark, sf_dir):
    from ferramenta_etl_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = {
        (r.doc_id, r.content_id)
        for r in content_ids(docs, ["text"]).select("doc_id", "content_id").collect()
    }
    b = {
        (r.doc_id, r.content_id)
        for r in content_ids(docs.repartition(13), ["text"])
        .select("doc_id", "content_id")
        .collect()
    }
    assert a == b
    # identical texts share an id (the identity contract)
    dup = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "other")], "doc_id long, text string"
    )
    ids = {r.doc_id: r.content_id for r in content_ids(dup, ["text"]).collect()}
    assert ids[1] == ids[2] != ids[3]


def test_id_collisions_catches_planted_collision(spark):
    """The audit mechanism, proven on a WEAKENED id (xxhash64 % 4 —
    planting a real 64-bit collision is infeasible): distinct contents
    sharing an id surface as audit rows; a collision-free corpus
    audits empty."""
    docs = spark.createDataFrame(
        [(i, f"text-{i}") for i in range(40)], "doc_id long, text string"
    )
    weak = docs.withColumn("content_id", F.pmod(F.xxhash64("text"), F.lit(4)))
    bad = id_collisions(weak, ["text"])
    assert bad.count() > 0  # 40 distinct texts into 4 buckets must collide

    ok = content_ids(docs, ["text"])
    assert id_collisions(ok, ["text"]).count() == 0


def test_content_ids_guards(spark):
    df = spark.range(3)
    with pytest.raises(ValueError, match="at least one"):
        content_ids(df, [])
    with pytest.raises(ValueError, match="already exists"):
        content_ids(df.withColumnRenamed("id", "content_id"), ["content_id"])

def test_dense_ids_detects_count_shift_and_checkpoint_pins_it(spark):
    """Round-12 ADVICE fix: nondeterministic lineage that changes a
    partition's row count between the count job and the assign job must
    fail LOUDLY (the silent mode is duplicated/non-dense ids), and
    checkpoint=True must pin the lineage so the same input succeeds."""
    import random as _random

    from pyspark.sql.types import DoubleType

    flaky = F.udf(lambda: _random.random(), DoubleType()).asNondeterministic()
    df = spark.range(0, 2000, 1, 4).filter(flaky() > 0.5)

    # Without checkpoint the two scans see different survivor sets;
    # some partition's count shifts with overwhelming probability and
    # the in-map guard raises (surfaced through Py4J as PythonException).
    with pytest.raises(Exception, match="nondeterministic|dense_ids"):
        dense_ids(df).collect()

    # checkpoint=True materializes one survivor set; ids come out dense.
    out = dense_ids(df, checkpoint=True)
    got = sorted(r.row_id for r in out.select("row_id").collect())
    assert got == list(range(len(got)))
    assert len(got) > 0
