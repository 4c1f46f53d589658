"""Sequence packing invariants: exactly-once assignment, budget
respected (single-oversize-chunk exception), determinism, document
adjacency."""

import pytest
from pyspark.sql import functions as F

from ferramenta_etl_spark.operators.packing import pack_sequences
from ferramenta_etl_spark.operators.text import chunk_documents
from ferramenta_etl_spark.sources import load_table


def _packed(spark, sf_dir, budget=64):
    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, chunk_tokens=32, overlap=8)
    return chunks, pack_sequences(chunks, budget_tokens=budget, n_shards=8)


def test_every_chunk_packed_exactly_once(spark, sf_dir):
    chunks, packed = _packed(spark, sf_dir)
    assert packed.count() == chunks.count()
    assert (
        packed.groupBy("doc_id", "chunk_idx").count().filter(F.col("count") > 1).count()
        == 0
    )


def test_budget_respected_except_single_oversize(spark, sf_dir):
    budget = 64
    _, packed = _packed(spark, sf_dir, budget)
    seqs = packed.groupBy("seq_id").agg(
        F.sum("n_chunk_tokens").alias("tot"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.max("seq_tokens").alias("claimed"),
    )
    over = seqs.filter(F.col("tot") > budget)
    # any over-budget sequence must be a single chunk that alone exceeds it
    assert over.filter(F.col("n_chunks") > 1).count() == 0
    # the seq_tokens column agrees with the recomputed total
    assert seqs.filter(F.col("tot") != F.col("claimed")).count() == 0
    # packing is dense enough to be useful: mean fill > 50% of budget
    # (chunks are 32 tokens against a 64 budget, so pairs should form)
    mean_fill = seqs.agg(F.avg("tot")).first()[0]
    assert mean_fill > budget * 0.5


def test_packing_deterministic_and_partition_invariant(spark, sf_dir):
    chunks, packed = _packed(spark, sf_dir)
    a = sorted((r.doc_id, r.chunk_idx, r.seq_id) for r in packed.collect())
    again = pack_sequences(
        chunks.repartition(13), budget_tokens=64, n_shards=8
    )
    b = sorted((r.doc_id, r.chunk_idx, r.seq_id) for r in again.collect())
    assert a == b


def test_document_chunks_stay_adjacent(spark, sf_dir):
    """Consecutive chunks of one doc share a sequence whenever the
    budget allows: within a doc, seq_id is non-decreasing."""
    _, packed = _packed(spark, sf_dir)
    bad = (
        packed.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("chunk_idx", "seq_id"))
            ).alias("cs")
        )
        .filter(
            F.exists(
                F.zip_with(
                    F.col("cs"),
                    F.slice(F.col("cs"), 2, F.size(F.col("cs"))),
                    lambda x, y: y["seq_id"] < x["seq_id"],
                ),
                lambda v: v,
            )
        )
    )
    assert bad.count() == 0


def test_rejects_bad_budget(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        pack_sequences(df, budget_tokens=0)
