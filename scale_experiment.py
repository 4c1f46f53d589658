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


def generate_mixed(spark, sf_dir: str, out_dir: str, factor: int) -> None:
    """Mixed duplicate-profile corpus (VERDICT r05 #1): per replica of
    the base tables, 60% DISTINCT docs/vectors, 30% NEAR-DUP mutations,
    10% EXACT dups — so at any factor the near-dup candidate stages see
    a corpus that is mostly distinct and cannot be collapsed away by the
    exact-dup pre-pass (the all-exact-dup replication sweep's blind
    spot, which hid two quadratics until round 4).

    Documents: every token of replica i is SUFFIXED with ``_r{i}`` —
    replicas share zero tokens AND zero shingles (an interleaved tag is
    NOT enough for token-SET similarity: the tag is one distinct token,
    leaving same-base replicas at Jaccard ~0.98). Near-dups substitute
    two tokens of their partner's text (token-level edits); exact dups
    copy it. Embeddings: per-(vec_id, element, replica) hash-derived
    pseudo-random vectors (near-orthogonal across docs/replicas),
    near-dups perturb 4 of 64 elements by +0.05 (cosine ~0.9998),
    labels pass through so the label-blocked pair space scales with the
    corpus over a FIXED block set — the shape that exposes quadratic
    within-block scoring."""
    from pyspark.sql import functions as F

    from ferramenta_etl_spark.sources import load_table

    near_off, exact_off = _OFFSET // 4, _OFFSET // 2
    os.makedirs(out_dir, exist_ok=True)

    docs = load_table(spark, sf_dir, "documents")
    doc_parts = []
    for i in range(factor):
        suffixed = docs.withColumn(
            "text", F.regexp_replace("text", r"(\S+)", f"$1_r{i}")
        )
        distinct = suffixed.filter(F.col("doc_id") % 10 < 6)
        mut = (
            suffixed.filter(F.col("doc_id") % 10 < 3)
            .withColumn(
                "text",
                F.concat_ws(
                    " ",
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda x, idx: F.when(idx == F.lit(4), F.lit("mutq"))
                        .when(idx == F.lit(12), F.lit("mutz"))
                        .otherwise(x),
                    ),
                ),
            )
            .withColumn("doc_id", F.col("doc_id") + F.lit(near_off))
        )
        exact = distinct.filter(F.col("doc_id") % 10 == 0).withColumn(
            "doc_id", F.col("doc_id") + F.lit(exact_off)
        )
        rep = distinct.unionByName(mut).unionByName(exact)
        doc_parts.append(rep.withColumn("doc_id", F.col("doc_id") + F.lit(i * _OFFSET)))
    out = doc_parts[0]
    for part in doc_parts[1:]:
        out = out.unionByName(part)
    out = out.withColumn("n_chars", F.length("text").cast("bigint"))
    out.repartition(max(factor, 32)).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )
    print(f"generated mixed documents x{factor}", file=sys.stderr)

    emb = load_table(spark, sf_dir, "embeddings")
    emb_parts = []
    for i in range(factor):
        randomized = emb.withColumn(
            "embedding",
            F.transform(
                F.col("embedding"),
                lambda x, idx: (
                    (
                        F.pmod(
                            F.xxhash64(F.col("vec_id"), idx, F.lit(i)), F.lit(2001)
                        )
                        - F.lit(1000)
                    ).cast("double")
                    / F.lit(1000.0)
                ).cast("float"),
            ),
        )
        distinct = randomized.filter(F.col("vec_id") % 10 < 6)
        near = (
            randomized.filter(F.col("vec_id") % 10 < 3)
            .withColumn(
                "embedding",
                F.transform(
                    F.col("embedding"),
                    lambda x, idx: F.when(
                        idx < 4, (x + F.lit(0.05)).cast("float")
                    ).otherwise(x),
                ),
            )
            .withColumn("vec_id", F.col("vec_id") + F.lit(near_off))
        )
        exact = distinct.filter(F.col("vec_id") % 10 == 0).withColumn(
            "vec_id", F.col("vec_id") + F.lit(exact_off)
        )
        rep = distinct.unionByName(near).unionByName(exact)
        emb_parts.append(rep.withColumn("vec_id", F.col("vec_id") + F.lit(i * _OFFSET)))
    out = emb_parts[0]
    for part in emb_parts[1:]:
        out = out.unionByName(part)
    out.repartition(max(factor, 32)).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )
    print(f"generated mixed embeddings x{factor}", file=sys.stderr)


def _mixed_queries():
    """The near-dup family over a mixed-profile corpus: the registered
    gate queries plus the pre-fix quadratic variants (for the before
    number) and the SRP scale variant of embedding near-dup."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from ferramenta_etl_spark.operators import dedup as D
    from ferramenta_etl_spark.operators import similarity as S
    from ferramenta_etl_spark.operators.dedup import latest_per_key
    from ferramenta_etl_spark.operators.similarity import _usable_vec_sql
    from ferramenta_etl_spark.pipeline.curation import curated_frame
    from ferramenta_etl_spark.sources import load_table

    reg = dict(entry_mod.queries())

    def tokenset_blocked(spark, sf):
        return D.tokenset_jaccard_pairs(
            D.dedup_exact(load_table(spark, sf, "documents")),
            threshold=0.8,
            prefix_filter=False,
        )

    def near_dup_srp(spark, sf):
        emb = load_table(spark, sf, "embeddings").filter(
            F.expr(_usable_vec_sql("embedding"))
        )
        distinct = latest_per_key(
            emb, keys=[F.col("embedding")], order_by=[F.col("vec_id").asc()]
        )
        # width-12 x 18 bands from the chooser: recall >= 0.95 AT the
        # 0.9 threshold, random-pair admission ~0.4% (the sweep's first
        # run used 32 planes / 8 bands = width 4, which admits ~40% of
        # near-orthogonal pairs — 0.4x quadratic, effectively hung at
        # 100x; that catch is the point of this experiment)
        planes, bands = S.srp_params_for(0.9, recall=0.95, max_planes=256)
        return S.cosine_near_dup_pairs(
            distinct, threshold=0.9, srp_planes=planes, srp_bands=bands, dim=64
        )

    def curation(spark, sf):
        return curated_frame(spark, sf, redact=True)

    return {
        "dedup_tokenset_jaccard": reg["dedup_tokenset_jaccard"],  # prefix
        "tokenset_blocked": tokenset_blocked,  # pre-fix quadratic
        "dedup_minhash_lsh": reg["dedup_minhash_lsh"],
        "dedup_simhash": reg["dedup_simhash"],
        "embedding_near_dup": reg["embedding_near_dup"],  # exact, quadratic
        "embedding_near_dup_srp": near_dup_srp,  # SRP scale path
        "curation": curation,
    }


# exact within-block pair variants: quadratic by construction, measured
# only to the cap factor (the point is the before/after contrast, not a
# multi-hour run)
_QUADRATIC = ("tokenset_blocked", "embedding_near_dup")


def mixed_experiment(spark, sf_dir: str, factor: int, scratch: str, cap: int) -> dict:
    """Timing = one warm-up + one timed run per (query, dir): the signal
    (linear vs quadratic growth) is orders of magnitude above the ±15%
    warm-run noise band, and the quadratic variants are too expensive to
    run in medians at scale."""
    dirs = {1: f"{scratch}/mixed_1", cap: f"{scratch}/mixed_{cap}",
            factor: f"{scratch}/mixed_{factor}"}
    for f_, d in sorted(dirs.items()):
        if not os.path.exists(f"{d}/documents.parquet"):
            generate_mixed(spark, sf_dir, d, f_)

    queries = _mixed_queries()
    rows: dict[str, dict] = {}
    for name, fn in queries.items():
        measured_factor = cap if name in _QUADRATIC else factor
        res = {}
        for f_ in (1, measured_factor):
            fn(spark, dirs[f_]).write.format("noop").mode("overwrite").save()
            t0 = time.perf_counter()
            fn(spark, dirs[f_]).write.format("noop").mode("overwrite").save()
            res[f_] = round(time.perf_counter() - t0, 2)
            print(f"  {name} x{f_}: {res[f_]}s", file=sys.stderr)
        rows[name] = {
            "factor": measured_factor,
            "base_s": res[1],
            "scaled_s": res[measured_factor],
            "ratio": round(res[measured_factor] / res[1], 1) if res[1] else None,
        }
    # sanity: the planted structure is actually found at scale
    found = {
        "minhash_pairs_x%d" % factor: queries["dedup_minhash_lsh"](
            spark, dirs[factor]
        ).count(),
        "srp_pairs_x%d" % factor: queries["embedding_near_dup_srp"](
            spark, dirs[factor]
        ).count(),
        "tokenset_prefix_pairs_x%d" % factor: queries["dedup_tokenset_jaccard"](
            spark, dirs[factor]
        ).count(),
    }
    return {"rows": rows, "pair_counts": found}


def skew_experiment(spark, sf_dir: str, replicate: int) -> dict:
    """Hot-key join: plain (AQE-assisted) vs salted, on the SAME plan
    bench.py times at replicate=1 (plans/composites.py) — the round-3
    experiment refreshed from the shared fixture so the headline
    number and the at-scale contrast can never measure different
    queries. Median of 3 after a warm-up, like bench."""
    from ferramenta_etl_spark.plans.composites import (
        join_skewed_plain,
        join_skewed_salted,
    )

    out: dict[str, float] = {}
    for name, fn in (("plain", join_skewed_plain), ("salted", join_skewed_salted)):
        df = fn(spark, sf_dir, replicate)
        df.write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        out[name] = round(sorted(runs)[1], 2)
        print(f"  join_skewed_{name} x{replicate}: {out[name]}s", file=sys.stderr)
    return {
        "replicate": replicate,
        "plain_s": out["plain"],
        "salted_s": out["salted"],
        "speedup": round(out["plain"] / out["salted"], 2) if out["salted"] else None,
    }


def quantile_auto_experiment(spark, n_rows: int) -> dict:
    """The histogram quantile's all-distinct worst case at scale
    (VERDICT r05 #3): on an all-distinct double column the value
    histogram IS the data, so the per-group rank window serializes at
    row scale — grouped_quantiles_auto must detect the shape via the
    cardinality probe and route to percentile_approx, which aggregates
    with O(accuracy) state per group. Reports both paths' times at the
    same row count plus the probed ratios."""
    from pyspark.sql import functions as F

    from ferramenta_etl_spark.operators.quantile import (
        grouped_exact_quantiles,
        grouped_quantiles_auto,
        probe_distinct_ratios,
    )

    df = (
        spark.range(n_rows)
        .select(
            (F.col("id") % 4).alias("g"),
            # all-distinct: unique per row, non-monotonic
            (F.col("id").cast("double")
             + F.pmod(F.xxhash64("id"), F.lit(997)).cast("double") / 1000.0
             ).alias("v_distinct"),
            (F.col("id") % 1000).cast("double").alias("v_low"),
        )
        .localCheckpoint(eager=True)
    )
    ratios = probe_distinct_ratios(df, ["v_distinct", "v_low"])

    def timed(fn):
        fn().write.format("noop").mode("overwrite").save()
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 2)

    auto_s = timed(
        lambda: grouped_quantiles_auto(
            df, ["g"], [("v_distinct", 0.5, "p50"), ("v_low", 0.9, "p90")]
        )
    )
    exact_low_s = timed(
        lambda: grouped_exact_quantiles(df, ["g"], [("v_low", 0.9, "p90")])
    )
    exact_distinct_s = timed(
        lambda: grouped_exact_quantiles(df, ["g"], [("v_distinct", 0.5, "p50")])
    )
    return {
        "rows": n_rows,
        "probed_ratios": {k: round(v, 3) for k, v in ratios.items()},
        "fallback_engaged": ratios["v_distinct"] > 0.5,
        "auto_s": auto_s,
        "exact_histogram_low_distinct_s": exact_low_s,
        "exact_histogram_all_distinct_s": exact_distinct_s,
    }


def lsh_cap_experiment(
    spark, n_small: int, n_large: int, cap: int
) -> dict:
    """The ``max_block_size`` guard's ceiling probe (VERDICT r05 #6):
    a boilerplate corpus — every doc shares one 40-token template plus a
    unique trailing token, so exact dedup CANNOT collapse it but nearly
    every (band, bhash) bucket holds the whole corpus — is the shape
    whose intra-bucket pair fan-out is quadratic by construction.
    Uncapped is measured only at ``n_small`` (the point is the blowup's
    slope, not a multi-hour run); the capped variant must stay ~flat
    per row through ``n_large`` with the oversized blocks dropped and
    logged, pairs degrading gracefully (boilerplate pairs are exactly
    what the cap is licensed to shed — run exact dedup first on real
    corpora)."""
    from pyspark.sql import functions as F

    from ferramenta_etl_spark.operators.dedup import (
        banded_signatures,
        minhash_lsh_pairs,
    )

    template = " ".join(f"w{i}" for i in range(40))

    def corpus(n: int):
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit(template + " u"), F.col("id").cast("string")
            ).alias("text"),
        ).localCheckpoint(eager=True)

    def timed_count(df) -> tuple[float, int]:
        df.write.format("noop").mode("overwrite").save()  # warm-up
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t = time.perf_counter() - t0
        return round(t, 2), df.count()

    small, large = corpus(n_small), corpus(n_large)
    unc_t, unc_pairs = timed_count(minhash_lsh_pairs(small, threshold=0.7))
    cap_s_t, cap_s_pairs = timed_count(
        minhash_lsh_pairs(small, threshold=0.7, max_block_size=cap)
    )
    cap_l_t, cap_l_pairs = timed_count(
        minhash_lsh_pairs(large, threshold=0.7, max_block_size=cap)
    )
    # audit the drop the way _cap_blocks' docstring prescribes
    banded = banded_signatures(large)
    dropped_blocks = (
        banded.groupBy("band", "bhash")
        .count()
        .filter(F.col("count") > cap)
        .count()
    )
    return {
        "cap": cap,
        "n_small": n_small,
        "n_large": n_large,
        "uncapped_small_s": unc_t,
        "uncapped_small_pairs": unc_pairs,
        "capped_small_s": cap_s_t,
        "capped_small_pairs": cap_s_pairs,
        "capped_large_s": cap_l_t,
        "capped_large_pairs": cap_l_pairs,
        "oversized_blocks_dropped_at_large": dropped_blocks,
    }


def oracle_sweep(spark, sf_dirs: list[str]) -> dict:
    """Run the FULL 50-query registry against the DuckDB oracle at every
    given fixture size — the scale-dependent-wrong-answer check the
    driver's single-SF gate leaves open (a cardinality probe routing
    differently, a blocking scheme degrading, a sampler interacting with
    volume). Committed results: SCALING.md round-7 'oracle gate swept'."""
    import __spark_entry__ as entry_mod

    from ferramenta_etl_spark.testing import compare_to_oracle

    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    names = list(qs)[:50]
    out = {}
    for sf in sf_dirs:
        mismatches = []
        for name in names:
            if name not in osql:
                continue
            try:
                ok, msg = compare_to_oracle(
                    spark, qs[name](spark, sf), osql[name], sf
                )
            except Exception as e:  # noqa: BLE001 — record, keep sweeping
                ok, msg = False, f"EXC {e}"
            if not ok:
                mismatches.append({"query": name, "detail": str(msg)[:300]})
        out[sf] = {
            "checked": len([n for n in names if n in osql]),
            "mismatches": mismatches,
        }
        print(f"=== {sf}: {out[sf]['checked']} checked, "
              f"{len(mismatches)} mismatches", file=sys.stderr)
    return out


def pq_experiment(spark, n_small: int, n_large: int) -> dict:
    """Scale probe for the PQ/ADC family (operators/quantize): encode
    and ADC scan must grow ~linearly with corpus size — both are narrow
    Arrow-batched maps whose only per-row work is a fixed number of
    numpy ops, and the scan's shuffle is bounded at Q*k rows per batch
    regardless of corpus size. Training time is a driver-side constant
    (bounded sample) and is reported separately. Corpus is a
    deterministic hash-derived 64-dim cloud (the probe measures
    throughput, not recall — recall is pinned on the clustered fixture
    in tests/test_ann_recall.py)."""
    from pyspark.sql import functions as F

    from ferramenta_etl_spark.operators.quantize import (
        pq_encode,
        pq_topk,
        pq_topk_rerank,
        train_pq_codebooks,
    )

    dim, m, codes = 64, 16, 256
    vec = F.expr(
        f"transform(sequence(0, {dim - 1}), "
        "d -> cast(pmod(hash(id, d), 1000) as double) / 1000.0 - 0.5)"
    )

    def corpus(n: int):
        return (
            spark.range(n)
            .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
            .localCheckpoint(eager=True)
        )

    def timed(df) -> float:
        df.write.format("noop").mode("overwrite").save()  # warm-up
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 2)

    small, large = corpus(n_small), corpus(n_large)
    queries = (
        spark.range(10)
        .select(F.col("id").alias("query_id"), vec.alias("query_vec"))
        .localCheckpoint(eager=True)
    )
    t0 = time.perf_counter()
    cbs = train_pq_codebooks(small, m=m, codes=codes, iters=4)
    train_s = round(time.perf_counter() - t0, 2)

    enc_small_s = timed(pq_encode(small, cbs))
    enc_large_s = timed(pq_encode(large, cbs))
    codes_small = pq_encode(small, cbs).localCheckpoint(eager=True)
    codes_large = pq_encode(large, cbs).localCheckpoint(eager=True)
    adc_small_s = timed(pq_topk(codes_small, queries, cbs, k=10))
    adc_large_s = timed(pq_topk(codes_large, queries, cbs, k=10))
    rerank_large_s = timed(
        pq_topk_rerank(codes_large, large, queries, cbs, k=10)
    )
    # IVF-PQ at the large size: serving should beat flat PQ because the
    # scan prunes to the probed centroid partitions at directory level
    import shutil
    import tempfile

    from ferramenta_etl_spark.operators.quantize import (
        build_ivfpq_index,
        ivfpq_topk,
    )

    ivfpq_dir = tempfile.mkdtemp(prefix="ivfpq_scale_")
    try:
        t0 = time.perf_counter()
        build_ivfpq_index(
            large, ivfpq_dir, n_centroids=16, m=m, codes=codes, train_iters=1
        )
        ivfpq_build_s = round(time.perf_counter() - t0, 2)
        ivfpq_serve_s = timed(
            ivfpq_topk(spark, ivfpq_dir, queries, nprobe=2, k=10)
        )
    finally:
        shutil.rmtree(ivfpq_dir, ignore_errors=True)
    factor = n_large / n_small
    return {
        "n_small": n_small,
        "n_large": n_large,
        "dim": dim,
        "m": m,
        "codes": codes,
        "train_s": train_s,
        "encode_small_s": enc_small_s,
        "encode_large_s": enc_large_s,
        "encode_ratio": round(enc_large_s / max(enc_small_s, 1e-9), 1),
        "adc_small_s": adc_small_s,
        "adc_large_s": adc_large_s,
        "adc_ratio": round(adc_large_s / max(adc_small_s, 1e-9), 1),
        "rerank_large_s": rerank_large_s,
        "ivfpq_build_large_s": ivfpq_build_s,
        "ivfpq_serve_large_s": ivfpq_serve_s,
        "size_factor": factor,
        "bytes_per_vector_raw": dim * 8,
        "bytes_per_vector_pq": m + 8,
    }


def ivfpq_tradeoff_experiment(
    spark, n: int = 2_000_000, nprobes=(1, 2, 4, 8)
) -> dict:
    """The IVF-PQ SERVING tradeoff (VERDICT r07 #5): recall@10 vs
    nprobe vs wall-time at the 2 M-vector probe scale, on a CLUSTERED
    corpus (64 planted clusters, the realistic embedding shape — on a
    uniform cloud coarse quantization has nothing to exploit and every
    nprobe looks equally bad, which measures the fixture, not the
    index). Ground truth is the exact brute-force cosine top-10 from
    operators.similarity.cosine_topk; recall@10 is the mean per-query
    overlap. The rerank row serves the same probes through the
    shortlist+exact-rerank composition at the smallest nprobe whose
    ADC-only recall clears 0.9 (or the largest probed, if none)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ferramenta_etl_spark.operators.quantize import (
        build_ivfpq_index,
        ivfpq_topk,
    )
    from ferramenta_etl_spark.operators.similarity import cosine_topk

    dim, n_clusters = 64, 64
    # Two-level geometry: 64 coarse clusters (what IVF exploits) each
    # holding n/640 micro-clusters of 10 points (what top-10 recall
    # measures). A single-level fixture makes top-10 a lottery among
    # ~31k near-identical cluster-mates — ADC noise scrambles an
    # ordering that carries no signal and "recall" measures the
    # fixture, not the index. Scales: coarse centers U[-0.5,0.5),
    # micro offsets x0.3, point noise x0.04 — within-micro distance
    # ~0.13 vs between-micro ~1.0, so each point's true top-10 is
    # decisively its own micro-cluster. All hash-derived/deterministic.
    vec = F.expr(
        f"transform(sequence(0, {dim - 1}), d -> "
        "cast(pmod(hash(pmod(cast(id / 10 as bigint), 64), d, 42), 1000) "
        "  as double) / 1000.0 - 0.5 "
        "+ (cast(pmod(hash(cast(id / 10 as bigint), d, 11), 1000) "
        "  as double) / 1000.0 - 0.5) * 0.3 "
        "+ (cast(pmod(hash(id, d, 7), 1000) as double) / 1000.0 - 0.5) "
        "  * 0.04)"
    )
    corpus = (
        spark.range(n)
        .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
        .localCheckpoint(eager=True)
    )
    queries = (
        spark.range(32)
        .select((F.col("id") * 62497).alias("id"))  # spread across micros
        .select(F.col("id").alias("query_id"), vec.alias("query_vec"))
        .localCheckpoint(eager=True)
    )

    def truth_sets(df, qcol="query_id", icol="vec_id"):
        out = {}
        for r in df.collect():
            out.setdefault(r[qcol], set()).add(r[icol])
        return out

    t0 = time.perf_counter()
    truth = truth_sets(cosine_topk(corpus, queries, k=10))
    brute_s = round(time.perf_counter() - t0, 2)

    idx = tempfile.mkdtemp(prefix="ivfpq_tradeoff_")
    rows = []
    try:
        t0 = time.perf_counter()
        build_ivfpq_index(
            corpus, idx, n_centroids=n_clusters, m=16, codes=256, train_iters=1
        )
        build_s = round(time.perf_counter() - t0, 2)

        def timed_recall(nprobe: int, rerank: bool):
            df = ivfpq_topk(
                spark, idx, queries, nprobe=nprobe, k=10,
                corpus=corpus if rerank else None,
            )
            df.write.format("noop").mode("overwrite").save()  # warm
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            wall = round(time.perf_counter() - t0, 2)
            got = truth_sets(df)
            rec = sum(
                len(got.get(q, set()) & t) / len(t) for q, t in truth.items()
            ) / len(truth)
            return wall, round(rec, 3)

        for nprobe in nprobes:
            wall, rec = timed_recall(nprobe, rerank=False)
            rows.append(
                {"nprobe": nprobe, "mode": "adc", "serve_s": wall,
                 "recall_at_10": rec}
            )
            print(f"  nprobe={nprobe} adc: {wall}s recall {rec}",
                  file=sys.stderr)
        good = [r for r in rows if r["recall_at_10"] >= 0.9]
        pick = (good[0] if good else rows[-1])["nprobe"]
        wall, rec = timed_recall(pick, rerank=True)
        rows.append(
            {"nprobe": pick, "mode": "rerank", "serve_s": wall,
             "recall_at_10": rec}
        )
        print(f"  nprobe={pick} rerank: {wall}s recall {rec}", file=sys.stderr)
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    return {
        "n": n,
        "dim": dim,
        "n_clusters": n_clusters,
        "n_centroids": n_clusters,
        "brute_force_s": brute_s,
        "index_build_s": build_s,
        "rows": rows,
    }


def round9_experiment(spark, sf_dir: str, scratch: str) -> dict:
    """Linearity probes for the round-9 operator layer:

    - PNG container decode (stdlib inflate+unfilter) on 1× vs 10× the
      document count — a narrow map, so the ratio should track the row
      ratio (or better, while spare cores absorb the growth);
    - WAV decode, same shape;
    - bigram-LM train + corpus scoring at 1× vs 10× — two count
      aggregations + one hash join, all token-stream-linear;
    - leakage-safe split at 1× vs 100× ids over a fixed pair set — the
      corpus side is one labels join + hash projection;
    - seeded-shuffle JSONL export vs plain round-robin at the same
      shard count — the shuffle costs one exchange + in-shard sort.

    Fixture generation (Python-loop PNG/WAV encoding) is deliberately
    OUTSIDE the timings: fixtures are staged to parquet and read back,
    so the clock sees only the operator under test.
    """
    import shutil
    import time as _t

    from pyspark.sql import functions as F

    from ferramenta_etl_spark.operators.containers import (
        attach_png_media,
        attach_wav_media,
        decode_audio,
        decode_images,
    )
    from ferramenta_etl_spark.operators.lm import (
        score_cross_entropy,
        train_bigram_lm,
    )
    from ferramenta_etl_spark.operators.split import leakage_safe_split
    from ferramenta_etl_spark.sinks.layout import export_jsonl
    from ferramenta_etl_spark.sources import load_table

    os.makedirs(scratch, exist_ok=True)
    out: dict = {}

    def _noop(df) -> float:
        t0 = _t.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(_t.perf_counter() - t0, 3)

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()

    # --- container decode: stage PNG/WAV fixtures at 1x and 10x -------
    ids1 = docs.select("doc_id")
    ids10 = (
        docs.select("doc_id")
        .crossJoin(spark.range(10).selectExpr("id AS __rep"))
        .selectExpr(f"doc_id + __rep * {n_docs} AS doc_id")
    )
    for name, attach, decode in (
        ("png_decode", attach_png_media, decode_images),
        ("wav_decode", attach_wav_media, decode_audio),
    ):
        paths = {}
        for tag, ids in (("1x", ids1), ("10x", ids10)):
            pth = os.path.join(scratch, f"{name}_{tag}")
            attach(ids).write.mode("overwrite").parquet(pth)
            paths[tag] = pth
        staged1 = spark.read.parquet(paths["1x"])
        staged10 = spark.read.parquet(paths["10x"])
        _noop(decode(staged1))  # warm
        t1 = _noop(decode(staged1))
        t10 = _noop(decode(staged10))
        out[name] = {
            "rows_1x": n_docs,
            "s_1x": t1,
            "s_10x": t10,
            "ratio": round(t10 / t1, 1),
        }

    # --- bigram LM: train + score, 1x vs 10x --------------------------
    docs10 = docs.crossJoin(spark.range(10).selectExpr("id AS __rep")).selectExpr(
        f"doc_id + __rep * {n_docs} AS doc_id", "text"
    )
    d10_path = os.path.join(scratch, "docs10")
    docs10.write.mode("overwrite").parquet(d10_path)
    docs10 = spark.read.parquet(d10_path)
    lm_times = {}
    for tag, d in (("1x", docs), ("10x", docs10)):
        t0 = _t.perf_counter()
        lm = train_bigram_lm(d, min_count=2)
        # the LM relations are lazy; scoring forces train + score
        _noop(score_cross_entropy(d, lm))
        lm_times[tag] = round(_t.perf_counter() - t0, 3)
    out["lm_train_score"] = {
        "rows_1x": n_docs,
        "s_1x": lm_times["1x"],
        "s_10x": lm_times["10x"],
        "ratio": round(lm_times["10x"] / lm_times["1x"], 1),
    }

    # --- leakage-safe split: 1x vs 100x ids, fixed pair set -----------
    pairs = spark.range(10_000).selectExpr(
        "id * 3 AS doc_id_a", "id * 3 + 1 AS doc_id_b"
    )
    split_times = {}
    w9 = {"train": 0.9, "val": 0.05, "test": 0.05}
    # warm the plan shape (CC + labels join) so the 1x number is not
    # charged the session's first-touch costs
    leakage_safe_split(
        spark.range(1000).selectExpr("id AS doc_id"), pairs, w9
    ).write.format("noop").mode("overwrite").save()
    for tag, n in (("1x", 50_000), ("100x", 5_000_000)):
        ids = spark.range(n).selectExpr("id AS doc_id")
        t0 = _t.perf_counter()
        leakage_safe_split(ids, pairs, w9).write.format("noop").mode(
            "overwrite"
        ).save()
        split_times[tag] = round(_t.perf_counter() - t0, 3)
    out["leakage_split"] = {
        "rows_1x": 50_000,
        "s_1x": split_times["1x"],
        "s_100x": split_times["100x"],
        "ratio": round(split_times["100x"] / split_times["1x"], 1),
    }

    # --- seeded shuffle export vs round-robin -------------------------
    exp = docs.select("doc_id", "text")
    p_plain = os.path.join(scratch, "exp_plain")
    p_shuf = os.path.join(scratch, "exp_shuf")
    export_jsonl(exp, p_plain, target_mb=4)  # warm the export shape
    t0 = _t.perf_counter()
    export_jsonl(exp, p_plain, target_mb=4)
    t_plain = round(_t.perf_counter() - t0, 3)
    t0 = _t.perf_counter()
    export_jsonl(exp, p_shuf, target_mb=4, shuffle_seed=17)
    t_shuf = round(_t.perf_counter() - t0, 3)
    out["export_shuffle"] = {
        "rows": n_docs,
        "plain_s": t_plain,
        "seeded_s": t_shuf,
        "overhead_pct": round(100.0 * (t_shuf - t_plain) / t_plain, 1),
    }
    shutil.rmtree(scratch, ignore_errors=True)
    return out


def round9b_experiment(spark, sf_dir: str, scratch: str) -> dict:
    """Scaling probes for the DSIR / BM25 / BPE layer:

    - DSIR fit+score at 1× vs 10× docs — both passes are hashed-bucket
      aggregations + one broadcast join, so the ratio should track rows;
    - BM25 index build at 1× vs 10× (two linear aggs), and at 10× the
      serve cost WITH vs WITHOUT the term-bucket partition pruning on
      the persisted index — pruning is the 100 TB story: scan cost
      follows the query's vocabulary, not the corpus;
    - BPE training at 1× vs 10× REPLICATED corpus — the merge rounds
      run on the distinct-word table, which replication leaves
      unchanged, so training should be nearly FLAT (only the initial
      word_freq pass sees 10× rows); tokenize (narrow Arrow map) should
      be ~linear or better while spare cores absorb it.
    """
    import shutil
    import time as _t

    from pyspark.sql import functions as F

    from ferramenta_etl_spark.operators.bpe import (
        bpe_tokenize,
        train_bpe_from_docs,
    )
    from ferramenta_etl_spark.operators.dsir import (
        dsir_log_weights,
        fit_dsir,
    )
    from ferramenta_etl_spark.operators.retrieval import (
        bm25_topk_on_index,
        build_bm25_index,
        load_bm25_index,
        save_bm25_index,
    )
    from ferramenta_etl_spark.operators.text import quality_score
    from ferramenta_etl_spark.sources import load_table

    os.makedirs(scratch, exist_ok=True)
    out: dict = {}

    def _noop(df) -> float:
        t0 = _t.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(_t.perf_counter() - t0, 3)

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    docs10 = docs.crossJoin(spark.range(10).selectExpr("id AS __rep")).selectExpr(
        f"doc_id + __rep * {n_docs} AS doc_id", "text"
    )
    d10_path = os.path.join(scratch, "docs10b")
    docs10.write.mode("overwrite").parquet(d10_path)
    docs10 = spark.read.parquet(d10_path)

    # --- DSIR: fit (target = quality slice) + full-corpus score -------
    dsir_times = {}
    for tag, d in (("1x", docs), ("10x", docs10)):
        target = d.filter(quality_score(F.col("text")) >= 0.5)
        for _attempt in range(2 if tag == "1x" else 1):  # 1x: warm+timed
            t0 = _t.perf_counter()
            model = fit_dsir(target, d)
            _noop(dsir_log_weights(model, d))
            dsir_times[tag] = round(_t.perf_counter() - t0, 3)
    out["dsir_fit_score"] = {
        "rows_1x": n_docs,
        "s_1x": dsir_times["1x"],
        "s_10x": dsir_times["10x"],
        "ratio": round(dsir_times["10x"] / dsir_times["1x"], 1),
    }

    # --- BM25: build 1x vs 10x; pruned vs unpruned serve at 10x -------
    bm_times = {}
    for tag, d in (("1x", docs), ("10x", docs10)):
        for _attempt in range(2 if tag == "1x" else 1):  # 1x: warm+timed
            t0 = _t.perf_counter()
            idx = build_bm25_index(d)
            _noop(idx.postings)
            bm_times[tag] = round(_t.perf_counter() - t0, 3)
    out["bm25_build"] = {
        "rows_1x": n_docs,
        "s_1x": bm_times["1x"],
        "s_10x": bm_times["10x"],
        "ratio": round(bm_times["10x"] / bm_times["1x"], 1),
    }
    idx10 = build_bm25_index(docs10)
    idx_path = os.path.join(scratch, "bm25_idx")
    save_bm25_index(idx10, idx_path, n_buckets=64)
    disk = load_bm25_index(spark, idx_path)
    # Two query profiles: HEAD terms (fat postings — a scoring-bound
    # worst case for pruning) and TAIL terms (selective — the
    # probe/decontamination shape pruning exists for). The structural
    # win is BYTES SKIPPED, which scales with the corpus while the
    # extra bucket-collect job stays O(query terms); wall at 50k docs
    # is planner-bound and does not represent the 100 TB ratio.
    by_freq = (
        idx10.postings.groupBy("term")
        .count()
        .filter("count >= 2")
        .orderBy(F.col("count").desc(), F.col("term").asc())
        .collect()
    )
    term_sets = {
        "head_terms": [r.term for r in by_freq[:8]],
        "tail_terms": [r.term for r in by_freq[-8:]],
    }
    post_dir = os.path.join(idx_path, "postings")
    for profile, terms in term_sets.items():
        queries = spark.createDataFrame(
            list(enumerate(terms)), "query_id int, query string"
        )
        _noop(bm25_topk_on_index(disk, queries, k=10))  # warm
        t0 = _t.perf_counter()
        _noop(bm25_topk_on_index(disk, queries, k=10))
        t_pruned = round(_t.perf_counter() - t0, 3)
        # full-scan arm: identical serve path with pruning disabled
        _noop(bm25_topk_on_index(disk, queries, k=10, prune=False))  # warm
        t0 = _t.perf_counter()
        _noop(bm25_topk_on_index(disk, queries, k=10, prune=False))
        t_full = round(_t.perf_counter() - t0, 3)
        q_buckets = {
            r.b
            for r in queries.select(
                F.explode(F.split(F.lower("query"), " ")).alias("t")
            )
            .filter("t != ''")
            .select(F.pmod(F.xxhash64("t"), F.lit(64)).cast("int").alias("b"))
            .distinct()
            .collect()
        }
        total_b = pruned_b = 0
        for root, _dirs, files in os.walk(post_dir):
            part = os.path.basename(root)
            sz = sum(
                os.path.getsize(os.path.join(root, f))
                for f in files
                if f.endswith(".parquet")
            )
            total_b += sz
            if (
                part.startswith("term_bucket=")
                and int(part.split("=")[1]) in q_buckets
            ):
                pruned_b += sz
        out[f"bm25_serve_10x_{profile}"] = {
            "queries": len(terms),
            "pruned_s": t_pruned,
            "full_scan_s": t_full,
            "wall_speedup": round(t_full / t_pruned, 2),
            "buckets_read": len(q_buckets),
            "buckets_total": 64,
            "bytes_read_fraction": round(pruned_b / total_b, 3)
            if total_b
            else None,
        }

    # same tail-term query set at n_buckets=512: the bytes fraction is
    # governed by how much OTHER-term mass co-resides in the touched
    # buckets, which shrinks as buckets multiply (head-term postings a
    # query actually scores are irreducible either way)
    idx_path2 = os.path.join(scratch, "bm25_idx512")
    save_bm25_index(idx10, idx_path2, n_buckets=512)
    tail_q = spark.createDataFrame(
        list(enumerate(term_sets["tail_terms"])), "query_id int, query string"
    )
    q_buckets = {
        r.b
        for r in tail_q.select(
            F.pmod(F.xxhash64("query"), F.lit(512)).cast("int").alias("b")
        )
        .distinct()
        .collect()
    }
    total_b = pruned_b = 0
    for root, _dirs, files in os.walk(os.path.join(idx_path2, "postings")):
        part = os.path.basename(root)
        sz = sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        )
        total_b += sz
        if part.startswith("term_bucket=") and int(part.split("=")[1]) in q_buckets:
            pruned_b += sz
    out["bm25_tail_fraction_512_buckets"] = {
        "buckets_read": len(q_buckets),
        "buckets_total": 512,
        "bytes_read_fraction": round(pruned_b / total_b, 3) if total_b else None,
    }

    # --- BPE: train on replicated corpus (distinct words unchanged) ---
    bpe_train = {}
    for tag, d in (("1x", docs), ("10x", docs10)):
        for _attempt in range(2 if tag == "1x" else 1):  # 1x: warm+timed
            t0 = _t.perf_counter()
            merges = train_bpe_from_docs(d, 15)
            bpe_train[tag] = round(_t.perf_counter() - t0, 3)
    out["bpe_train_15_merges"] = {
        "rows_1x": n_docs,
        "s_1x": bpe_train["1x"],
        "s_10x": bpe_train["10x"],
        "ratio": round(bpe_train["10x"] / bpe_train["1x"], 1),
    }
    bpe_tok = {}
    for tag, d in (("1x", docs), ("10x", docs10)):
        _noop(bpe_tokenize(d, merges).select("doc_id", "bpe_tokens"))  # warm
        t0 = _t.perf_counter()
        _noop(bpe_tokenize(d, merges).select("doc_id", "bpe_tokens"))
        bpe_tok[tag] = round(_t.perf_counter() - t0, 3)
    out["bpe_tokenize"] = {
        "rows_1x": n_docs,
        "s_1x": bpe_tok["1x"],
        "s_10x": bpe_tok["10x"],
        "ratio": round(bpe_tok["10x"] / bpe_tok["1x"], 1),
    }

    # --- quality classifier: train (6 GD iters) + score, 1x vs 10x ----
    from ferramenta_etl_spark.operators.classifier import (
        classify_documents,
        train_text_classifier,
    )

    clf_times = {}
    for tag, d in (("1x", docs), ("10x", docs10)):
        q = quality_score(F.col("text"))
        # two passes for the 1x arm: the first warms the code path, the
        # second is the kept timing (one body, not a copy-paste twin)
        for _attempt in range(2 if tag == "1x" else 1):
            t0 = _t.perf_counter()
            m = train_text_classifier(
                d.filter(q >= 0.5), d.filter(q < 0.5), iters=6
            )
            _noop(classify_documents(m, d))
            clf_times[tag] = round(_t.perf_counter() - t0, 3)
    out["classifier_train6_score"] = {
        "rows_1x": n_docs,
        "s_1x": clf_times["1x"],
        "s_10x": clf_times["10x"],
        "ratio": round(clf_times["10x"] / clf_times["1x"], 1),
    }
    shutil.rmtree(scratch, ignore_errors=True)
    return out


def round10_experiment(spark, sf_dir: str) -> dict:
    """Round-10 operator linearity probes: the gap+cap batch
    sessionizer (one user_id exchange + Arrow per-group walk — cost
    must scale with events, not explode with users x batches) and the
    baseline-JPEG decoder (narrow codec map — pure map parallelism).
    Replication policy: events replicate with shifted user_ids (10x
    users, same per-user history → 10x sessions, the scale-out shape);
    JPEG fixtures replicate the doc spine with shifted doc_ids."""
    import time as _t

    from pyspark.sql import functions as F

    from ferramenta_etl_spark.operators.containers import (
        attach_jpeg_media,
        decode_images,
    )
    from ferramenta_etl_spark.operators.sessionize import capped_sessions
    from ferramenta_etl_spark.sources import load_table

    def _noop(df) -> float:
        df.write.format("noop").mode("overwrite").save()
        t0 = _t.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(_t.perf_counter() - t0, 3)

    out: dict = {"sf_dir": sf_dir}
    par = spark.sparkContext.defaultParallelism

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    ev10 = ev
    for i in range(1, 10):
        ev10 = ev10.unionByName(
            ev.withColumn("user_id", F.col("user_id") + F.lit(i * _OFFSET))
        )
    for tag, d in (("1x", ev), ("10x", ev10.repartition(par))):
        d = d.localCheckpoint(eager=True)
        n = d.count()
        s = _noop(capped_sessions(d, gap="24 hours", max_duration="2 hours"))
        out[f"capped_sessions_rows_{tag}"] = n
        out[f"capped_sessions_s_{tag}"] = s
    out["capped_sessions_ratio"] = round(
        out["capped_sessions_s_10x"] / out["capped_sessions_s_1x"], 1
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    docs10 = docs
    for i in range(1, 10):
        docs10 = docs10.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * _OFFSET))
        )
    for tag, d in (("1x", docs), ("10x", docs10)):
        media = (
            attach_jpeg_media(d)
            .repartition(par)
            .localCheckpoint(eager=True)
        )
        n = media.count()
        s = _noop(decode_images(media))
        out[f"jpeg_decode_docs_{tag}"] = n
        out[f"jpeg_decode_s_{tag}"] = s
    out["jpeg_decode_ratio"] = round(
        out["jpeg_decode_s_10x"] / out["jpeg_decode_s_1x"], 1
    )
    return out


def round11_experiment(spark, sf_dir: str, scratch: str) -> dict:
    """Round-11 operator linearity probes:

    - ROLLUP SERVE (pipeline/rollup.py, the oracle-gated
      events_rollup_serve path): events replicate 10x with SHIFTED
      TIMESTAMPS (10x the time range → 10x the windows — the dimension
      a continuous aggregate grows along). Materialize at a 60%
      watermark, then time SERVE (materialized ∪ live tail). The serve
      scan must scale with the un-materialized TAIL + the windows
      table, both 10x here, so ~linear is the pass bar; the win over
      full recompute is structural (tail-bounded scan) and shows in
      the serve-vs-recompute column.
    - MP4 METADATA PROBE (containers.probe_videos): doc spine 10x —
      a narrow header-bytes map, pure map parallelism like the JPEG
      decode probe, expected ~flat per-row.
    """
    import time as _t

    from pyspark.sql import functions as F

    from ferramenta_etl_spark.functions.tsql import epoch_ms
    from ferramenta_etl_spark.operators.containers import (
        attach_mp4_media,
        probe_videos,
    )
    from ferramenta_etl_spark.pipeline.rollup import (
        _windowed_agg,
        materialize_rollup,
        serve_rollup,
    )
    from ferramenta_etl_spark.sources import load_table

    def _noop(df) -> float:
        df.write.format("noop").mode("overwrite").save()
        t0 = _t.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(_t.perf_counter() - t0, 3)

    out: dict = {"sf_dir": sf_dir}
    par = spark.sparkContext.defaultParallelism

    ev = load_table(spark, sf_dir, "events").select("ts", "value").filter(
        F.col("ts").isNotNull()
    )
    lo, hi = ev.agg(epoch_ms(F.min("ts")), epoch_ms(F.max("ts"))).first()
    span = hi - lo + 60_000
    ev10 = ev
    for i in range(1, 10):
        ev10 = ev10.unionByName(
            ev.withColumn(
                "ts",
                (epoch_ms(F.col("ts")) + F.lit(i * span))
                .cast("double").__div__(1000).cast("timestamp"),
            )
        )
    for tag, d, wid in (("1x", ev, span), ("10x", ev10.repartition(par), span * 10)):
        d = d.localCheckpoint(eager=True)
        wm = lo + wid * 6 // 10
        path = f"{scratch}/rollup_{tag}"
        materialize_rollup(d, path, "15 minutes", watermark_ms=wm)
        s_serve = _noop(serve_rollup(spark, d, path, "15 minutes", watermark_ms=wm))
        s_full = _noop(_windowed_agg(d, "15 minutes"))
        out[f"rollup_events_{tag}"] = d.count()
        out[f"rollup_serve_s_{tag}"] = s_serve
        out[f"rollup_recompute_s_{tag}"] = s_full
    out["rollup_serve_ratio"] = round(
        out["rollup_serve_s_10x"] / out["rollup_serve_s_1x"], 1
    )

    # The shape the serve path EXISTS for: a long, 99%-materialized,
    # DAY-PARTITIONED history with a small live tail. The caller
    # pre-prunes the raw scan on the partition column with the same
    # cut serve applies to ts (live_boundary_ms), so the tail scan is
    # a directory filter — full recompute must scan every partition.
    from ferramenta_etl_spark.pipeline.rollup import live_boundary_ms

    part_dir = f"{scratch}/events_by_day"
    (
        ev10.withColumn("day", F.to_date("ts"))
        .repartition("day")
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(part_dir)
    )
    evp = spark.read.parquet(part_dir)
    wm99 = lo + span * 10 * 99 // 100
    path99 = f"{scratch}/rollup_tail"
    materialize_rollup(evp, path99, "15 minutes", watermark_ms=wm99)
    cut = live_boundary_ms(spark, path99, "15 minutes", wm99)
    pruned = evp.filter(
        F.col("day") >= F.from_unixtime(F.lit(cut / 1000)).cast("date")
    )
    out["rollup_tail_serve_s"] = _noop(
        serve_rollup(spark, pruned, path99, "15 minutes", watermark_ms=wm99)
    )
    out["rollup_tail_recompute_s"] = _noop(_windowed_agg(evp, "15 minutes"))
    out["rollup_tail_speedup"] = round(
        out["rollup_tail_recompute_s"] / out["rollup_tail_serve_s"], 1
    )
    # the pruned union must still equal the full aggregation
    full = _windowed_agg(evp, "15 minutes")
    served = serve_rollup(spark, pruned, path99, "15 minutes", watermark_ms=wm99)
    out["rollup_tail_rows_match"] = bool(
        full.exceptAll(served).isEmpty() and served.exceptAll(full).isEmpty()
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    docs10 = docs
    for i in range(1, 10):
        docs10 = docs10.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * _OFFSET))
        )
    for tag, d in (("1x", docs), ("10x", docs10)):
        media = (
            attach_mp4_media(d).repartition(par).localCheckpoint(eager=True)
        )
        out[f"mp4_probe_docs_{tag}"] = media.count()
        out[f"mp4_probe_s_{tag}"] = _noop(probe_videos(media))
    out["mp4_probe_ratio"] = round(
        out["mp4_probe_s_10x"] / out["mp4_probe_s_1x"], 1
    )
    return out


def round12_experiment(spark, sf_dir: str, scratch: str) -> dict:
    """Round-12 operator linearity probes (VERDICT r11 #5):

    - CASCADE ROLLUP (pipeline/rollup.cascade_rollup): events replicate
      10x with SHIFTED timestamps (10x time range -> 10x windows at
      every level, the dimension a multi-resolution continuous
      aggregate grows along). The 15m level materializes once; timed is
      the 15m->1h cascade append — which reads only the fine WINDOWS
      table, so its cost must track windows (10x), never raw events.
      The windows-per-level counts are recorded to show the 4x/24x/96x
      collapse that makes each cascade level cheaper than the last.
    - TF-IDF KEYWORDS (operators/text.tfidf_keywords): doc spine 10x —
      two linear aggregations + vocab-sized idf join + grouped top-k;
      ~linear is the pass bar.
    - ROW IDS (operators/ids.dense_ids / content_ids): doc spine 10x.
      content_ids is one narrow projection (~flat per row); dense_ids
      is a count-by-partition job + narrow map (~linear, no shuffle —
      the collision audit exists since r11; this adds the scale probe).
    """
    import time as _t

    from pyspark.sql import functions as F

    from ferramenta_etl_spark.functions.tsql import epoch_ms
    from ferramenta_etl_spark.operators.ids import content_ids, dense_ids
    from ferramenta_etl_spark.operators.text import tfidf_keywords
    from ferramenta_etl_spark.pipeline.rollup import (
        cascade_rollup,
        materialize_rollup,
    )
    from ferramenta_etl_spark.sources import load_table

    def _noop(df) -> float:
        df.write.format("noop").mode("overwrite").save()
        t0 = _t.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(_t.perf_counter() - t0, 3)

    out: dict = {"sf_dir": sf_dir}
    par = spark.sparkContext.defaultParallelism

    # --- cascade rollup: 10x the time range -------------------------
    ev = load_table(spark, sf_dir, "events").select("ts", "value").filter(
        F.col("ts").isNotNull()
    )
    lo, hi = ev.agg(epoch_ms(F.min("ts")), epoch_ms(F.max("ts"))).first()
    span = hi - lo + 60_000
    ev10 = ev
    for i in range(1, 10):
        ev10 = ev10.unionByName(
            ev.withColumn(
                "ts",
                (epoch_ms(F.col("ts")) + F.lit(i * span))
                .cast("double").__div__(1000).cast("timestamp"),
            )
        )
    for tag, d in (("1x", ev), ("10x", ev10.repartition(par))):
        d = d.localCheckpoint(eager=True)
        fine = f"{scratch}/cascade_fine_{tag}"
        materialize_rollup(d, fine, "15 minutes")  # full backfill
        out[f"cascade_fine_windows_{tag}"] = spark.read.parquet(fine).count()
        # warm-up cascade to a throwaway path (JIT + fine-table footer
        # reads), then the timed append to a fresh path — cascade is an
        # ACTION (sink write), so it is timed directly
        cascade_rollup(spark, fine, f"{scratch}/cascade_warm_{tag}",
                       "15 minutes", "1 hour", final=True)
        t0 = _t.perf_counter()
        n_coarse = cascade_rollup(spark, fine, f"{scratch}/cascade_1h_{tag}",
                                  "15 minutes", "1 hour", final=True)
        out[f"cascade_1h_s_{tag}"] = round(_t.perf_counter() - t0, 3)
        out[f"cascade_1h_windows_{tag}"] = n_coarse
        t0 = _t.perf_counter()
        n_day = cascade_rollup(spark, f"{scratch}/cascade_1h_{tag}",
                               f"{scratch}/cascade_1d_{tag}",
                               "1 hour", "1 day", final=True)
        out[f"cascade_1d_s_{tag}"] = round(_t.perf_counter() - t0, 3)
        out[f"cascade_1d_windows_{tag}"] = n_day
    out["cascade_1h_ratio"] = round(
        out["cascade_1h_s_10x"] / out["cascade_1h_s_1x"], 1
    )

    # --- tfidf keywords + row ids: 10x the doc spine ----------------
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs10 = docs
    for i in range(1, 10):
        docs10 = docs10.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * _OFFSET))
        )
    for tag, d in (("1x", docs), ("10x", docs10.repartition(par))):
        d = d.localCheckpoint(eager=True)
        out[f"docs_{tag}"] = d.count()
        out[f"tfidf_keywords_s_{tag}"] = _noop(tfidf_keywords(d, k=5))
        out[f"dense_ids_s_{tag}"] = _noop(dense_ids(d))
        out[f"content_ids_s_{tag}"] = _noop(content_ids(d, ["text"]))
    for op in ("tfidf_keywords", "dense_ids", "content_ids"):
        out[f"{op}_ratio"] = round(out[f"{op}_s_10x"] / out[f"{op}_s_1x"], 1)

    # --- keyframe frame-sampling plan: 10x the MP4 spine -------------
    from ferramenta_etl_spark.operators.containers import attach_mp4_media
    from ferramenta_etl_spark.operators.multimodal import (
        keyframe_sample_schedule,
    )

    spine = load_table(spark, sf_dir, "documents").select("doc_id")
    spine10 = spine
    for i in range(1, 10):
        spine10 = spine10.unionByName(
            spine.withColumn("doc_id", F.col("doc_id") + F.lit(i * _OFFSET))
        )
    for tag, d in (("1x", spine), ("10x", spine10)):
        media = (
            attach_mp4_media(d).repartition(par).localCheckpoint(eager=True)
        )
        out[f"frame_schedule_docs_{tag}"] = media.count()
        out[f"frame_schedule_s_{tag}"] = _noop(
            keyframe_sample_schedule(media, every_ms=500)
        )
    out["frame_schedule_ratio"] = round(
        out["frame_schedule_s_10x"] / out["frame_schedule_s_1x"], 1
    )

    # --- perceptual fingerprints (the r12 dedup quadrant): 10x spines.
    # Only the fingerprint maps are probed — the shared hamming_pairs
    # kernel is the simhash candidate join, measured since round 1.
    from ferramenta_etl_spark.operators.audio import (
        attach_fake_raw_audio,
        audio_fingerprints,
    )
    from ferramenta_etl_spark.operators.multimodal import (
        attach_fake_raw_images,
        attach_fake_raw_video,
        dhash_images,
        video_fingerprints,
    )

    for tag, d in (("1x", spine), ("10x", spine10)):
        imgs = (
            attach_fake_raw_images(d).repartition(par)
            .localCheckpoint(eager=True)
        )
        out[f"dhash_s_{tag}"] = _noop(dhash_images(imgs))
        aud = (
            attach_fake_raw_audio(d).repartition(par)
            .localCheckpoint(eager=True)
        )
        out[f"audio_fp_s_{tag}"] = _noop(audio_fingerprints(aud))
        vid = (
            attach_fake_raw_video(d).repartition(par)
            .localCheckpoint(eager=True)
        )
        out[f"video_fp_s_{tag}"] = _noop(video_fingerprints(vid))
    for op in ("dhash", "audio_fp", "video_fp"):
        out[f"{op}_ratio"] = round(out[f"{op}_s_10x"] / out[f"{op}_s_1x"], 1)
    return out


def media_admit_experiment(spark, scratch: str) -> dict:
    """Admit-vs-recompute for the perceptual-fingerprint index
    (pipeline/media_index.py, round 12) — the media sibling of the
    round-3/4 MinHash admit experiment. A 200k-fingerprint corpus is
    indexed once; admitting a 1k batch (half near-dups of indexed
    items, half novel) is timed against recomputing hamming_pairs over
    the full corpus+batch. Fingerprinting cost is excluded from BOTH
    arms (identical either way); what differs is probe-vs-recompute.
    Fingerprints are synthetic uniform 64-bit values with planted
    neighbors — the index mechanics don't care what hashed them."""
    import time as _t

    from pyspark.sql import functions as F

    from ferramenta_etl_spark.operators.dedup import hamming_pairs
    from ferramenta_etl_spark.pipeline.media_index import (
        fingerprint_dedup_incremental,
        load_fp_index,
    )

    out: dict = {}
    n_batch = 1_000
    for n_corpus in (200_000, 4_000_000):
        tag = f"{n_corpus // 1000}k"
        corpus = (
            spark.range(0, n_corpus)
            .select(
                F.col("id").alias("doc_id"),
                F.xxhash64(F.col("id").cast("string")).alias("fp"),
            )
            .localCheckpoint(eager=True)
        )
        idx = f"{scratch}/media_fp_index_{tag}"
        t0 = _t.perf_counter()
        fingerprint_dedup_incremental(spark, corpus, idx)
        out[f"bootstrap_s_{tag}"] = round(_t.perf_counter() - t0, 3)
        # batch: 500 near-dups of indexed items (1 bit flipped), 500 novel
        near = spark.range(0, n_batch // 2).select(
            (F.col("id") + 100_000_000).alias("doc_id"),
            F.xxhash64(F.col("id").cast("string"))
            .bitwiseXOR(F.lit(1)).alias("fp"),
        )
        novel = spark.range(0, n_batch // 2).select(
            (F.col("id") + 200_000_000).alias("doc_id"),
            F.xxhash64((F.col("id") + 7_777_777).cast("string")).alias("fp"),
        )
        batch = near.unionByName(novel).localCheckpoint(eager=True)
        # warm admit on a throwaway index is impossible (admission
        # mutates); warm the JVM with the recompute arm instead
        allfps = corpus.unionByName(batch).localCheckpoint(eager=True)
        pairs = hamming_pairs(allfps, max_hamming=3)
        pairs.write.format("noop").mode("overwrite").save()
        t0 = _t.perf_counter()
        pairs.write.format("noop").mode("overwrite").save()
        out[f"recompute_pairs_s_{tag}"] = round(_t.perf_counter() - t0, 3)
        t0 = _t.perf_counter()
        admitted = fingerprint_dedup_incremental(spark, batch, idx)
        n_adm = admitted.count()
        out[f"admit_s_{tag}"] = round(_t.perf_counter() - t0, 3)
        # correctness side-channel: exactly the 500 novel fps admit and
        # the index holds every fp
        out[f"admitted_{tag}"] = int(n_adm)
        out[f"index_docs_{tag}"] = load_fp_index(spark, idx).select(
            "doc_id"
        ).distinct().count()
        allfps.unpersist()
        corpus.unpersist()
    return out


def bloom_decontam_experiment(spark, sf_dir: str) -> dict:
    """contamination_hits_scaled vs its alternatives on a 10x corpus
    (round 12): the bloom path exists for benchmark sets PAST broadcast
    size, so the fair baseline is the BROADCAST-DISABLED shuffled join
    (what a too-big benchmark forces), with the broadcast path shown
    for the local-scale context where it naturally wins. Also records
    the screen's measured selectivity — the fraction of corpus grams
    that survive into the verify shuffle, the quantity the operator's
    scale claim rides on."""
    import time as _t

    from pyspark.sql import functions as F

    from ferramenta_etl_spark.operators.dedup import shingle_hashes
    from ferramenta_etl_spark.operators.text import (
        contamination_hits,
        contamination_hits_scaled,
    )
    from ferramenta_etl_spark.sources import load_table

    def _noop(df) -> float:
        df.write.format("noop").mode("overwrite").save()
        t0 = _t.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(_t.perf_counter() - t0, 3)

    out: dict = {"sf_dir": sf_dir}
    par = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    corpus10 = corpus
    for i in range(1, 10):
        corpus10 = corpus10.unionByName(
            corpus.withColumn("doc_id", F.col("doc_id") + F.lit(i * _OFFSET))
        )
    corpus10 = corpus10.repartition(par).localCheckpoint(eager=True)
    bench = bench.localCheckpoint(eager=True)
    n = 8

    out["corpus_docs"] = corpus10.count()
    grams = F.array_distinct(shingle_hashes(F.col("text"), n))
    n_grams = corpus10.select(
        F.sum(F.size(grams)).alias("s")
    ).first().s
    out["corpus_grams"] = int(n_grams)

    # (a) broadcast path — the local-scale natural winner
    out["broadcast_s"] = _noop(
        contamination_hits(corpus10, bench, n=n, hashed=True)
    )
    # (b) broadcast-disabled shuffled join — what a past-broadcast
    # benchmark forces without the bloom screen: EVERY corpus gram
    # shuffles
    cg = corpus10.select(F.col("doc_id"), F.explode(grams).alias("g"))
    bg = bench.select(
        F.explode(F.array_distinct(shingle_hashes(F.col("text"), n))).alias("g")
    ).distinct()
    shuffled = (
        cg.hint("shuffle_hash")
        .join(bg.hint("shuffle_hash"), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    out["shuffle_join_s"] = _noop(shuffled)
    # (c) bloom screen + exact verify (the scaled path). The bitmap
    # build is an eager plan-construction step; warm it once (python
    # worker + codegen JIT — measured 5.5 s cold vs 1.2 s warm) and
    # time the second build, the same warm protocol the _noop arms use.
    contamination_hits_scaled(corpus10, bench, n=n)
    t0 = _t.perf_counter()
    scaled = contamination_hits_scaled(corpus10, bench, n=n)
    out["bloom_build_s"] = round(_t.perf_counter() - t0, 3)
    out["bloom_serve_s"] = _noop(scaled)
    # The quantity the operator's 100 TB claim rides on — and the one a
    # single box CAN measure honestly: how many corpus grams survive
    # the screen into the verify shuffle. Locally the avoided shuffle
    # is network-free, so wall-clock parity is expected; at cluster
    # scale the survivors fraction IS the shuffle-bytes fraction.
    # Rebuilt from the same helpers the operator uses (same bitmap
    # parameters), counting survivors of the screen.
    # rebuilt with the SAME shared helpers the operator uses (review
    # r12: a copy-pasted screen here could silently diverge from the
    # shipped code and the measured selectivity would stop measuring it)
    from ferramenta_etl_spark.operators.text import (
        _bloom_params,
        build_gram_bloom,
        gram_bloom_probe_udf,
    )

    m, k = _bloom_params(1_000_000, 1e-3)
    out["bloom_bits_mb"] = round(m / 8 / 1e6, 2)
    bcv = spark.sparkContext.broadcast(
        build_gram_bloom(
            bench.select(
                F.explode(
                    F.array_distinct(shingle_hashes(F.col("text"), n))
                ).alias("g")
            ),
            m,
            k,
        )
    )
    might = gram_bloom_probe_udf(bcv, m, k)
    survivors = cg.filter(might(F.col("g"))).count()
    out["screen_survivor_grams"] = int(survivors)
    out["screen_survivor_fraction"] = round(survivors / max(n_grams, 1), 6)
    # equality of all three answers (the whole point)
    a = {(r.doc_id, r.n_hits) for r in contamination_hits(
        corpus10, bench, n=n, hashed=True).collect()}
    b = {(r.doc_id, r.n_hits) for r in shuffled.collect()}
    c = {(r.doc_id, r.n_hits) for r in scaled.collect()}
    out["answers_equal"] = bool(a == b == c)
    out["contaminated_docs"] = len(a)
    return out


def bpe_jobs_experiment(spark, sf_dir: str, num_merges: int = 512) -> dict:
    """VERDICT r09 #4: Spark-JOB COUNT of a ``num_merges``-merge BPE
    train through the three trainer paths — hybrid driver-side (the
    default), distributed batched rounds, distributed sequential (the
    r9 behavior) — plus merge-list equality across all three. Jobs are
    counted via statusTracker job groups; the sf word table exhausts
    its merge space before 512 (every merge past exhaustion is free),
    which is itself part of the honest reading: the probe measures
    jobs-per-merge shape, not an artificial 512."""
    import time as _t

    from ferramenta_etl_spark.operators.bpe import train_bpe, word_freq
    from ferramenta_etl_spark.sources import load_table

    wf = word_freq(
        load_table(spark, sf_dir, "documents")
    ).localCheckpoint(eager=True)
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    out: dict = {"sf_dir": sf_dir, "num_merges_requested": num_merges}
    results = {}
    for tag, kw in (
        ("hybrid_driver", {}),
        ("dist_batched", {"driver_max_words": 0, "batch_pairs": True}),
        ("dist_sequential", {"driver_max_words": 0, "batch_pairs": False}),
    ):
        group = f"bpe-probe-{tag}"
        sc.setJobGroup(group, tag)
        t0 = _t.perf_counter()
        merges = train_bpe(wf, num_merges, min_pair_count=1, **kw)
        wall = _t.perf_counter() - t0
        sc.setLocalProperty("spark.jobGroup.id", None)
        results[tag] = merges
        out[f"{tag}_jobs"] = len(tracker.getJobIdsForGroup(group))
        out[f"{tag}_s"] = round(wall, 2)
    out["n_merges_learned"] = len(results["dist_sequential"])
    out["merge_lists_identical"] = (
        results["hybrid_driver"]
        == results["dist_batched"]
        == results["dist_sequential"]
    )
    out["jobs_ratio_seq_vs_hybrid"] = round(
        out["dist_sequential_jobs"] / max(out["hybrid_driver_jobs"], 1), 1
    )
    out["jobs_ratio_seq_vs_batched"] = round(
        out["dist_sequential_jobs"] / max(out["dist_batched_jobs"], 1), 2
    )
    return out


def clf_overhead_experiment(spark, sf_dir: str) -> dict:
    """VERDICT r09 #7: per-iteration driver overhead of classifier
    training must stay flat in n_buckets through 2^18. Two measures:

    - end-to-end: train (4 GD iters) on the sf documents fixture at
      n_buckets 2^12 vs 2^18 — per-iteration wall should move by the
      gradient relation's size (bounded by the corpus' distinct
      features, NOT n_buckets), so roughly flat;
    - isolated exchange: build + materialize the (bucket, w) weights
      relation at both sizes via the Arrow path (_weights_df) and via
      the legacy row-by-row list-of-tuples createDataFrame the r9 code
      used — the number that motivated the switch.
    """
    import time as _t

    from pyspark.sql import functions as F

    from ferramenta_etl_spark.operators.classifier import (
        _weights_df,
        train_text_classifier,
    )
    from ferramenta_etl_spark.operators.text import quality_score
    from ferramenta_etl_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    q = quality_score(F.col("text"))
    # split at the corpus median quality (the curation bootstrap's
    # policy) so both classes are non-empty at any sf
    med = docs.select(
        F.percentile_approx(q, 0.5).alias("m")
    ).first().m
    out: dict = {"sf_dir": sf_dir, "iters": 4, "median_q": round(med, 4)}

    for nb in (4096, 262144):
        # two passes; first warms the code path, second is kept
        for _attempt in range(2):
            t0 = _t.perf_counter()
            train_text_classifier(
                docs.filter(q >= med), docs.filter(q < med),
                iters=4, n_buckets=nb,
            )
            wall = _t.perf_counter() - t0
        out[f"train4_s_nb{nb}"] = round(wall, 3)
        out[f"per_iter_s_nb{nb}"] = round(wall / 4, 3)

        w = [0.0] * nb
        for _attempt in range(2):
            t0 = _t.perf_counter()
            _weights_df(spark, w).count()
            arrow_s = _t.perf_counter() - t0
        out[f"weights_arrow_s_nb{nb}"] = round(arrow_s, 3)
        for _attempt in range(2):
            t0 = _t.perf_counter()
            spark.createDataFrame(
                [(i, float(x)) for i, x in enumerate(w)], "bucket int, w double"
            ).count()
            legacy_s = _t.perf_counter() - t0
        out[f"weights_legacy_rowwise_s_nb{nb}"] = round(legacy_s, 3)
    out["per_iter_ratio_2e18_vs_2e12"] = round(
        out["per_iter_s_nb262144"] / out["per_iter_s_nb4096"], 2
    )
    return out


def hot_user_experiment(spark, factor: int, scratch: str) -> dict:
    """90%-one-user capped-sessionization probe (VERDICT r12 #2).

    Fixture: ``100k x factor`` events, 90 % under ONE user as 1000-event
    bursts (1 s cadence, bursts 1 h apart), 10 % across ``1000 x
    factor`` cold users. With gap=30 min / cap=5 min, every burst is a
    gap block and the cap fires ~3x inside each — the bot-traffic shape.

    Arms: the sequential whole-user walk (split_hot_users=False — one
    task owns 90 % of all events) vs the gap-block path (True — the hot
    history re-keys into ~90·factor independent blocks), equality of
    outputs asserted, plus the auto probe's routing decision. A 1x
    STREAMING arm drains the same fixture through
    capped_sessions_stream: applyInPandasWithState keys by user, so a
    hot-user BACKFILL concentrates in one task there too (state itself
    stays one tuple per user); in production the per-trigger batch is
    bounded by arrival rate, so the block-split batch operator is the
    right tool for backfills — that routing is the recorded conclusion.
    """
    import time as _t

    from pyspark.sql import functions as F

    from ferramenta_etl_spark.operators.sessionize import capped_sessions

    def _noop(df) -> float:
        df.write.format("noop").mode("overwrite").save()
        t0 = _t.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(_t.perf_counter() - t0, 3)

    par = spark.sparkContext.defaultParallelism
    n_total = 100_000 * factor
    n_hot = int(n_total * 0.9)
    burst_len = 1000
    t0_ms = 1_700_000_000_000
    hot = spark.range(n_hot).select(
        F.lit(1).cast("long").alias("user_id"),
        F.timestamp_millis(
            F.lit(t0_ms)
            + (F.col("id") / burst_len).cast("long") * F.lit(3_600_000)
            + (F.col("id") % burst_len) * F.lit(1000)
        ).alias("ts"),
        F.lit(1.0).alias("value"),
    )
    cold = spark.range(n_total - n_hot).select(
        (F.lit(2) + (F.col("id") / 100).cast("long")).alias("user_id"),
        F.timestamp_millis(
            F.lit(t0_ms) + (F.col("id") % 100) * F.lit(60_000)
        ).alias("ts"),
        F.lit(2.0).alias("value"),
    )
    ev = hot.unionByName(cold).repartition(par).localCheckpoint(eager=True)
    out: dict = {"factor": factor, "rows": ev.count(), "hot_rows": n_hot}

    common = dict(gap="30 minutes", max_duration="5 minutes")
    seq_df = capped_sessions(ev, split_hot_users=False, **common)
    blk_df = capped_sessions(ev, split_hot_users=True, **common)
    out["sequential_s"] = _noop(seq_df)
    out["gap_block_s"] = _noop(blk_df)
    out["speedup"] = round(out["sequential_s"] / out["gap_block_s"], 2)
    seq = sorted(map(tuple, seq_df.collect()))
    blk = sorted(map(tuple, blk_df.collect()))
    out["outputs_identical"] = seq == blk
    out["n_sessions"] = len(seq)
    out["hot_blocks"] = n_hot // burst_len  # independent walks after split
    # the auto probe must route this shape to the block path
    hottest = ev.groupBy("user_id").count().agg(F.max("count")).first()[0]
    out["auto_routes_to_blocks"] = bool(hottest > 1_000_000)

    # 1x streaming backfill arm: same shape, one AvailableNow drain
    from ferramenta_etl_spark.streaming import run_available_now
    from ferramenta_etl_spark.streaming.stateful import capped_sessions_stream

    ev1 = (
        hot.limit(90_000).unionByName(cold.limit(10_000))
        if factor > 1
        else ev
    )
    src = f"{scratch}/hot_user_events"
    ev1.write.mode("overwrite").parquet(src)
    t0 = _t.perf_counter()
    stream = spark.readStream.schema(
        "user_id long, ts timestamp, value double"
    ).parquet(src)
    drained = run_available_now(
        capped_sessions_stream(stream, **common),
        f"{scratch}/hot_user_ckpt",
        "q_hot_user_probe",
    )
    out["stream_backfill_1x_s"] = round(_t.perf_counter() - t0, 3)
    out["stream_backfill_1x_sessions"] = drained.count()
    return out


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
    p.add_argument(
        "--mixed", action="store_true",
        help="run the mixed-duplicate-profile near-dup sweep (60%% "
             "distinct / 30%% near-dup / 10%% exact)",
    )
    p.add_argument(
        "--exact-cap", type=int, default=10,
        help="max factor at which the exact quadratic pair variants run "
             "in the --mixed sweep",
    )
    p.add_argument(
        "--quantile-auto", type=int, metavar="N_ROWS", default=0,
        help="run the all-distinct quantile fallback experiment at N_ROWS",
    )
    p.add_argument(
        "--lsh-cap", action="store_true",
        help="run the max_block_size ceiling probe on a boilerplate "
             "corpus (uncapped quadratic vs capped flat)",
    )
    p.add_argument(
        "--oracle-sweep", action="store_true",
        help="run all 50 oracle-checked queries at sf0.001/0.01/0.1 "
             "(the scale-dependent-wrong-answer check)",
    )
    p.add_argument(
        "--pq", action="store_true",
        help="run the PQ encode/ADC-scan linearity probe (20k vs 2M "
             "vectors, 100x)",
    )
    p.add_argument(
        "--ivfpq-tradeoff", action="store_true",
        help="run the IVF-PQ serving tradeoff (recall@10 vs nprobe vs "
             "wall-time, 2M clustered vectors)",
    )
    p.add_argument(
        "--round9", action="store_true",
        help="run the round-9 operator linearity probes (container "
             "decode, bigram LM, leakage-safe split, seeded export)",
    )
    p.add_argument(
        "--round9b", action="store_true",
        help="run the round-9 DSIR/BM25/BPE scaling probes (fit+score "
             "linearity, pruned vs full serve, flat-on-replication "
             "training)",
    )
    p.add_argument(
        "--round10", action="store_true",
        help="run the round-10 operator linearity probes (capped-session "
             "batch sessionizer, baseline-JPEG decode)",
    )
    p.add_argument(
        "--round11", action="store_true",
        help="run the round-11 operator linearity probes (rollup serve "
             "vs recompute, MP4 metadata probe)",
    )
    p.add_argument(
        "--round12", action="store_true",
        help="run the round-12 operator linearity probes (cascade "
             "rollup windows growth, tfidf keywords, dense/content ids)",
    )
    p.add_argument(
        "--bloom-decontam", action="store_true",
        help="bloom-screened decontamination vs broadcast and "
             "broadcast-disabled shuffled joins on a 10x corpus",
    )
    p.add_argument(
        "--media-admit", action="store_true",
        help="perceptual-fingerprint index admit-vs-recompute at a "
             "200k-fp corpus",
    )
    p.add_argument(
        "--bpe-jobs", action="store_true",
        help="run the BPE trainer job-count probe (hybrid vs batched vs "
             "sequential, merge-list equality)",
    )
    p.add_argument(
        "--clf-overhead", action="store_true",
        help="run the classifier per-iteration driver-overhead probe "
             "(n_buckets 2^12 vs 2^18, Arrow vs legacy row-wise weights "
             "exchange)",
    )
    p.add_argument(
        "--hot-user", action="store_true",
        help="run the 90%%-one-user capped-sessionization probe "
             "(sequential whole-user walk vs gap-block split, --factor x "
             "100k events)",
    )
    p.add_argument(
        "--skew", type=int, metavar="REPLICATE", default=0,
        help="run the hot-key join experiment (plain vs salted) with the "
             "fact replicated REPLICATE x (10 = the original 6M-row setup)",
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

    if args.mixed:
        result = mixed_experiment(
            spark, args.sf, args.factor, args.out, args.exact_cap
        )
        print(json.dumps(
            {"experiment": "mixed_dedup", "factor": args.factor, **result}
        ))
        spark.stop()
        return

    if args.quantile_auto:
        result = quantile_auto_experiment(spark, args.quantile_auto)
        print(json.dumps({"experiment": "quantile_auto", **result}))
        spark.stop()
        return

    if args.lsh_cap:
        result = lsh_cap_experiment(
            spark, n_small=3000, n_large=300_000, cap=64
        )
        print(json.dumps({"experiment": "lsh_cap", **result}))
        spark.stop()
        return

    if args.oracle_sweep:
        base = os.path.dirname(args.sf.rstrip("/"))
        result = oracle_sweep(
            spark, [os.path.join(base, f"sf{s}") for s in ("0.001", "0.01", "0.1")]
        )
        print(json.dumps({"experiment": "oracle_sweep", "results": result}))
        spark.stop()
        return

    if args.pq:
        result = pq_experiment(spark, n_small=20_000, n_large=2_000_000)
        print(json.dumps({"experiment": "pq_scan", **result}))
        spark.stop()
        return

    if args.ivfpq_tradeoff:
        result = ivfpq_tradeoff_experiment(spark)
        print(json.dumps({"experiment": "ivfpq_tradeoff", **result}))
        spark.stop()
        return

    if args.round9:
        result = round9_experiment(spark, args.sf, args.out)
        print(json.dumps({"experiment": "round9_ops", **result}))
        spark.stop()
        return

    if args.round9b:
        result = round9b_experiment(spark, args.sf, args.out)
        print(json.dumps({"experiment": "round9b_ops", **result}))
        spark.stop()
        return

    if args.round10:
        result = round10_experiment(spark, args.sf)
        print(json.dumps({"experiment": "round10_ops", **result}))
        spark.stop()
        return

    if args.round11:
        import tempfile

        with tempfile.TemporaryDirectory() as scratch:
            result = round11_experiment(spark, args.sf, scratch)
        print(json.dumps({"experiment": "round11_ops", **result}))
        spark.stop()
        return

    if args.round12:
        import tempfile

        with tempfile.TemporaryDirectory() as scratch:
            result = round12_experiment(spark, args.sf, scratch)
        print(json.dumps({"experiment": "round12_ops", **result}))
        spark.stop()
        return

    if args.bloom_decontam:
        result = bloom_decontam_experiment(spark, args.sf)
        print(json.dumps({"experiment": "bloom_decontam", **result}))
        spark.stop()
        return

    if args.media_admit:
        import tempfile

        with tempfile.TemporaryDirectory() as scratch:
            result = media_admit_experiment(spark, scratch)
        print(json.dumps({"experiment": "media_admit", **result}))
        spark.stop()
        return

    if args.bpe_jobs:
        result = bpe_jobs_experiment(spark, args.sf)
        print(json.dumps({"experiment": "bpe_jobs", **result}))
        spark.stop()
        return

    if args.clf_overhead:
        result = clf_overhead_experiment(spark, args.sf)
        print(json.dumps({"experiment": "clf_overhead", **result}))
        spark.stop()
        return

    if args.hot_user:
        import tempfile

        with tempfile.TemporaryDirectory() as scratch:
            result = hot_user_experiment(spark, args.factor, scratch)
        print(json.dumps({"experiment": "hot_user_sessions", **result}))
        spark.stop()
        return

    if args.skew:
        result = skew_experiment(spark, args.sf, args.skew)
        print(json.dumps({"experiment": "join_skew", **result}))
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
