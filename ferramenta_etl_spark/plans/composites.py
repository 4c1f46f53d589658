"""Bench-only composite queries, shared by bench.py and
scale_experiment.py so the two harnesses can never drift apart (same
names, same parameters, same plan-cache policy — a parameter change
lands once and both the sf0.1 headline numbers and the 100x ratios
keep measuring the same query).

These ride alongside the 50-query oracle registry rather than in it:
curation/seq_packing are end-to-end compositions whose stages are
individually oracle-checked; the *_fast pair is the library-default
xxhash64 engine vs the portable md5 gate variants; flagship_bucketed
is the same flagship plan over bucketed mirrors.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._registry import plan_cache


def add_bench_composites(
    queries: dict[str, Callable[[SparkSession, str], DataFrame]],
) -> None:
    """Register the bench-only composites into ``queries`` (in place),
    wrapped in the same plan cache as registered queries — plans build
    once per (session, dataset); for curation this also keeps its
    persist()/checkpoint intermediates stable across timed runs."""
    from ..operators import dedup as D
    from ..operators.packing import pack_sequences
    from ..operators.quantize import quantize_embeddings, quantized_cosine_topk
    from ..operators.similarity import lsh_ann_topk
    from ..operators.text import chunk_documents
    from ..pipeline.curation import curated_frame
    from ..sources import load_table
    from .bucketed import flagship_bucketed

    def _curation(spark, sf):
        return curated_frame(spark, sf, redact=True)

    def _seq_packing(spark, sf):
        chunks = chunk_documents(
            load_table(spark, sf, "documents"), chunk_tokens=128, overlap=16
        )
        return pack_sequences(chunks, budget_tokens=2048, n_shards=64)

    def _quantized_topk(spark, sf):
        emb = load_table(spark, sf, "embeddings")
        qc = quantize_embeddings(emb.filter(F.col("vec_id") >= 10))
        qq = quantize_embeddings(emb.filter(F.col("vec_id") < 10)).select(
            F.col("vec_id").alias("query_id"),
            F.col("q_embedding").alias("query_q"),
            F.col("q_scale").alias("query_scale"),
        )
        return quantized_cosine_topk(qc, qq, k=5)

    def _lsh_ann(spark, sf):
        emb = load_table(spark, sf, "embeddings")
        queries_df = emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        corpus = emb.filter(F.col("vec_id") >= 10).select("vec_id", "embedding")
        # dim passed explicitly: composition must not run the one-row
        # dim-probe driver job (tests/test_plans.py asserts plan builds
        # are job-free engine-wide)
        return lsh_ann_topk(corpus, queries_df, k=5, n_planes=16, n_bands=4, dim=64)

    def _minhash_fast(spark, sf):
        docs = load_table(spark, sf, "documents")
        return D.minhash_lsh_pairs(
            D.dedup_exact(docs), num_hashes=32, bands=8, threshold=0.5,
            portable=False,
        )

    def _simhash_fast(spark, sf):
        docs = load_table(spark, sf, "documents")
        return D.simhash_near_dup_pairs(D.dedup_exact(docs), portable=False)

    queries["curation"] = plan_cache(_curation)
    queries["seq_packing"] = plan_cache(_seq_packing)
    queries["embedding_quantized_topk"] = plan_cache(_quantized_topk)
    queries["embedding_ann_lsh"] = plan_cache(_lsh_ann)
    queries["dedup_minhash_fast"] = plan_cache(_minhash_fast)
    queries["dedup_simhash_fast"] = plan_cache(_simhash_fast)
    # mirrors are written at plan-build time (amortized, like the index
    # builds); timed runs measure the exchange-free joins
    queries["flagship_bucketed"] = plan_cache(flagship_bucketed)
