"""Scale-up experiment driver (SCALING.md's method, committed):
replicate the FACT tables of a fixture R times with key-shifted copies
(join integrity preserved, dimension tables unscaled — dims grow slower
in practice), then time every headline query on both datasets and print
the ratio table.

Usage:
    python scale_experiment.py [--factor 100] [--sf /root/testdata/sf0.1]
                               [--out /tmp/scale_sf10] [--queries a,b,c]
                               [--skip-generate]

Method notes (why the numbers mean what SCALING.md claims):
- key shifts preserve every join: lineitem.l_orderkey shifts with
  orders.o_orderkey; foreign keys into UNSCALED dims (custkey, partkey,
  suppkey, nationkey) stay put, so dim joins fan out exactly R times;
- documents/embeddings replicate with shifted ids and UNCHANGED
  payloads — the replicated corpus is by construction 100% exact
  duplicates, which is the documented reading for the dedup family
  (the md5 hash-groupBy collapses it back to the distinct set);
- query vectors (vec_id < 10) exist only in copy 0: shifted copies
  start above the offset, so the ANN query set does not replicate;
- output is written as R-copy multi-file parquet — scans parallelize
  the way a real multi-file table would (the single-file sf fixtures
  are the pathological case, see ensure_scan_parallelism);
- timing = bench.py's protocol: plan cache, one warm-up, median of 3
  noop-sink runs, no concurrent JVMs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FACTS = ("orders", "lineitem", "events", "documents", "embeddings")
DIMS = ("region", "nation", "customer", "supplier", "part")
# shift ids far past any real key so copies never collide
_OFFSET = 10_000_000_000

_SHIFT_COLS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def generate(spark, sf_dir: str, out_dir: str, factor: int) -> None:
    from pyspark.sql import functions as F

    from ferramenta_etl_spark.sources import load_table

    os.makedirs(out_dir, exist_ok=True)
    for name in DIMS:
        load_table(spark, sf_dir, name).write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet"
        )
    for name in FACTS:
        base = load_table(spark, sf_dir, name)
        copies = []
        for i in range(factor):
            c = base
            for col in _SHIFT_COLS[name]:
                c = c.withColumn(col, F.col(col) + F.lit(i * _OFFSET))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        # one file per copy keeps the write bounded and the scan parallel
        out.repartition(max(factor, 32)).write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet"
        )
        print(f"generated {name} x{factor}", file=sys.stderr)


def time_queries(spark, queries, names, sf_dir: str) -> dict[str, float]:
    out = {}
    for name in names:
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(time.perf_counter() - t0)
        out[name] = round(sorted(runs)[1], 3)
        print(f"  {name}: {out[name]}s", file=sys.stderr)
    return out


def dedup_admit_experiment(spark, sf_dir: str, factor: int, scratch: str) -> dict:
    """The incremental near-dup index story at scale: build the index
    over a large DISTINCT corpus (documents replicated with per-doc
    unique suffixes so replicas are not near-dups of each other), then
    time admitting a small unseen batch against it vs recomputing the
    whole corpus. The batch step must not grow with corpus size."""
    import shutil

    from pyspark.sql import functions as F

    from ferramenta_etl_spark.operators.dedup import (
        dedup_keep_canonical,
        minhash_lsh_pairs,
    )
    from ferramenta_etl_spark.pipeline.dedup_index import dedup_incremental
    from ferramenta_etl_spark.sources import load_table

    base = load_table(spark, sf_dir, "documents")
    out = base
    for i in range(1, factor):
        # replica i gets a distinct trailing token: genuinely new docs,
        # no cross-replica near-dups at threshold 0.7
        out = out.unionByName(
            base.withColumn("doc_id", F.col("doc_id") + F.lit(i * _OFFSET))
            .withColumn(
                "text", F.concat_ws(" ", F.col("text"), F.lit(f"replica{i}"))
            )
        )
    corpus = out.localCheckpoint(eager=True)
    n_corpus = corpus.count()
    batch = (
        base.limit(500)
        .withColumn("doc_id", F.col("doc_id") + F.lit(factor * _OFFSET))
        .withColumn("text", F.concat_ws(" ", F.col("text"), F.lit("unseen")))
        .localCheckpoint(eager=True)
    )

    idx = f"{scratch}/nd_index"
    shutil.rmtree(idx, ignore_errors=True)
    t0 = time.perf_counter()
    dedup_incremental(spark, corpus, idx, threshold=0.7).write.format(
        "noop"
    ).mode("overwrite").save()
    t_build = time.perf_counter() - t0

    t0 = time.perf_counter()
    dedup_incremental(spark, batch, idx, threshold=0.7).write.format(
        "noop"
    ).mode("overwrite").save()
    t_admit = time.perf_counter() - t0

    everything = corpus.unionByName(batch)
    t0 = time.perf_counter()
    dedup_keep_canonical(
        everything, minhash_lsh_pairs(everything, threshold=0.7)
    ).write.format("noop").mode("overwrite").save()
    t_recompute = time.perf_counter() - t0

    return {
        "corpus_docs": n_corpus,
        "index_build_s": round(t_build, 1),
        "batch_admit_s": round(t_admit, 1),
        "full_recompute_s": round(t_recompute, 1),
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--factor", type=int, default=100)
    p.add_argument("--sf", default="/root/testdata/sf0.1")
    p.add_argument("--out", default="/tmp/scale_scratch")
    p.add_argument("--queries", default="")
    p.add_argument("--skip-generate", action="store_true")
    p.add_argument("--skip-base", action="store_true")
    p.add_argument(
        "--dedup-admit", action="store_true",
        help="run the incremental-index admit experiment instead of the "
             "query ratio table",
    )
    args = p.parse_args()

    from ferramenta_etl_spark.session import get_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_session(
        "scale-experiment", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    if args.dedup_admit:
        result = dedup_admit_experiment(spark, args.sf, args.factor, args.out)
        print(json.dumps({"experiment": "dedup_admit", **result}))
        spark.stop()
        return

    if not args.skip_generate:
        generate(spark, args.sf, args.out, args.factor)

    import bench as bench_mod
    import __spark_entry__ as entry_mod
    from ferramenta_etl_spark.plans._registry import plan_cache as _cached

    queries = dict(entry_mod.queries())
    # the bench-only composites, same wiring as bench.py
    from ferramenta_etl_spark.pipeline.curation import curated_frame

    queries["curation"] = _cached(lambda s, sf: curated_frame(s, sf, redact=True))

    # the bench-only composites, built the same way bench.py builds them
    from pyspark.sql import functions as F

    from ferramenta_etl_spark.operators import dedup as D
    from ferramenta_etl_spark.operators.packing import pack_sequences
    from ferramenta_etl_spark.operators.quantize import (
        quantize_embeddings,
        quantized_cosine_topk,
    )
    from ferramenta_etl_spark.operators.similarity import lsh_ann_topk
    from ferramenta_etl_spark.operators.text import chunk_documents
    from ferramenta_etl_spark.plans.bucketed import flagship_bucketed
    from ferramenta_etl_spark.sources import load_table

    def _seq_packing(s, sf):
        return pack_sequences(
            chunk_documents(load_table(s, sf, "documents"), 128, 16),
            budget_tokens=2048, n_shards=64,
        )

    def _quantized(s, sf):
        emb = load_table(s, sf, "embeddings")
        qc = quantize_embeddings(emb.filter(F.col("vec_id") >= 10))
        qq = quantize_embeddings(emb.filter(F.col("vec_id") < 10)).select(
            F.col("vec_id").alias("query_id"),
            F.col("q_embedding").alias("query_q"),
            F.col("q_scale").alias("query_scale"),
        )
        return quantized_cosine_topk(qc, qq, k=5)

    def _lsh(s, sf):
        emb = load_table(s, sf, "embeddings")
        q = emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        return lsh_ann_topk(
            emb.filter(F.col("vec_id") >= 10).select("vec_id", "embedding"),
            q, k=5, n_planes=16, n_bands=4, dim=64,
        )

    def _minhash_fast(s, sf):
        return D.minhash_lsh_pairs(
            D.dedup_exact(load_table(s, sf, "documents")),
            num_hashes=32, bands=8, threshold=0.5, portable=False,
        )

    def _simhash_fast(s, sf):
        return D.simhash_near_dup_pairs(
            D.dedup_exact(load_table(s, sf, "documents")), portable=False
        )

    queries["seq_packing"] = _cached(_seq_packing)
    queries["embedding_quantized_topk"] = _cached(_quantized)
    queries["embedding_ann_lsh"] = _cached(_lsh)
    queries["dedup_minhash_fast"] = _cached(_minhash_fast)
    queries["dedup_simhash_fast"] = _cached(_simhash_fast)
    queries["flagship_bucketed"] = _cached(flagship_bucketed)

    names = (
        [q for q in args.queries.split(",") if q]
        if args.queries
        else [n for n in bench_mod.HEADLINE if n in queries]
    )

    base = {}
    if not args.skip_base:
        print(f"=== base: {args.sf}", file=sys.stderr)
        base = time_queries(spark, queries, names, args.sf)
    print(f"=== scaled x{args.factor}: {args.out}", file=sys.stderr)
    scaled = time_queries(spark, queries, names, args.out)

    rows = {
        n: {
            "base_s": base.get(n),
            "scaled_s": scaled[n],
            "ratio": round(scaled[n] / base[n], 1) if base.get(n) else None,
        }
        for n in names
    }
    print(json.dumps({"factor": args.factor, "rows": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
