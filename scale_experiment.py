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
    # global warm-up pass first (bench.py's protocol): every query once,
    # so no single query absorbs JVM C2 JIT of the shared execution
    # infrastructure — without this the FIRST query of the base pass ran
    # in a fresh JVM and its base_s carried a phantom +15-25%, silently
    # deflating its printed ratio
    for name in names:
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    out = {}
    for name in names:
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
    over a large DISTINCT corpus (every replica's text has a replica tag
    interleaved between all tokens, so replicas share no shingles — see
    ``tagged``), then time admitting a small unseen batch against it vs
    recomputing the whole corpus. The batch step must not grow with
    corpus size."""
    import shutil

    from pyspark.sql import functions as F

    from ferramenta_etl_spark.operators.dedup import (
        dedup_keep_canonical,
        minhash_lsh_pairs,
    )
    from ferramenta_etl_spark.pipeline.dedup_index import dedup_incremental
    from ferramenta_etl_spark.sources import load_table

    base = load_table(spark, sf_dir, "documents")

    def tagged(df, tag: str):
        # interleave the tag between EVERY token: replica r's 3-shingles
        # all contain "r", so replicas share ZERO shingles with the base
        # or with each other — genuinely distinct docs. (A single
        # TRAILING tag is NOT enough: it leaves (T-4)/T of the shingles
        # shared, which is >= 0.7 Jaccard for any doc over ~14 tokens —
        # the whole "large distinct corpus" premise would be false and
        # the corpus would collapse to ~|base| in the exact/near-dup
        # passes.)
        return df.withColumn(
            "text", F.regexp_replace(F.col("text"), F.lit(" "), F.lit(f" {tag} "))
        )

    out = base
    for i in range(1, factor):
        out = out.unionByName(
            tagged(
                base.withColumn("doc_id", F.col("doc_id") + F.lit(i * _OFFSET)),
                f"replica{i}",
            )
        )
    corpus = out.localCheckpoint(eager=True)
    n_corpus = corpus.count()
    batch = (
        tagged(
            base.limit(500).withColumn(
                "doc_id", F.col("doc_id") + F.lit(factor * _OFFSET)
            ),
            "unseen",
        )
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

    queries = dict(entry_mod.queries())
    # bench-only composites from the SAME shared module bench.py uses
    # (plans/composites.py) — the ratio table and the headline bench
    # measure identical queries by construction
    from ferramenta_etl_spark.plans.composites import add_bench_composites

    add_bench_composites(queries)

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
