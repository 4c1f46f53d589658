"""Headless CLI entry point — the reference's orchestrator without Qt.

    python -m ferramenta_etl_spark list
    python -m ferramenta_etl_spark run alimentacao_parcela_ciot
    python -m ferramenta_etl_spark run-all

≙ the GUI's run-one button (E:321-363), "Executar Todos" (E:365-383)
with the same sequential fail-fast queue (E:415-422), and the script's
own headless __main__ (S:270-273). Missing config auto-creates the
example 5-job registry (≙ E:68-81). Exit code 0 on success, 1 on a
failed pipeline — the GUI's ✅/❌ status surface becomes per-job status
lines on stdout.
"""

from __future__ import annotations

import argparse
import logging
import sys
import threading

from .pipeline.jobs import build_jobs, default_config
from .pipeline.registry import JobRegistry, PipelineError
from .session import get_session


def _run_with_progress(reg: JobRegistry, spark, name: str, every: float = 2.0):
    """run_one with a task-level progress line every ``every`` seconds —
    real statusTracker counts, not the reference's synthetic bar."""
    stop = threading.Event()

    def poll():
        while not stop.wait(every):
            done, total = reg.progress(spark, name)
            if total:
                print(f"  ⌛ {name}: {done}/{total} tasks", flush=True)

    t = threading.Thread(target=poll, daemon=True)
    t.start()
    try:
        return reg.run_one(spark, name)
    finally:
        stop.set()
        t.join()


def main(argv: list[str] | None = None, _stop_session: bool = True) -> int:
    p = argparse.ArgumentParser(prog="ferramenta_etl_spark")
    p.add_argument(
        "command",
        choices=[
            "list", "run", "run-all", "curate", "optimize", "plan-audit",
            "stream", "curate-stream", "rollup", "stats", "ingest",
            "neardup-admit", "media-admit", "make-dataset", "ann-index",
            "ann-query",
            "media-curate", "vocab", "keywords", "mine-negatives", "verify-dataset",
            "split-dataset", "ppl-score", "bpe-train", "bpe-encode",
            "bm25-index", "bm25-query", "bm25-append", "dsir-select",
            "quality-classify", "dataset-card", "jdbc-maintenance",
        ],
    )
    p.add_argument(
        "--jdbc-url", default=None,
        help="jdbc-maintenance: JDBC URL of the sink database",
    )
    p.add_argument("--jdbc-user", default="", help="jdbc-maintenance: user")
    p.add_argument("--jdbc-password", default="",
                   help="jdbc-maintenance: password")
    p.add_argument(
        "--jdbc-driver", default=None,
        help="jdbc-maintenance: JDBC driver class (when the URL scheme "
        "alone can't locate it, e.g. org.apache.derby.jdbc.EmbeddedDriver)",
    )
    p.add_argument(
        "--jdbc-table", default=None,
        help="jdbc-maintenance: target table whose orphaned "
        "<table>__stg_<hex> staging tables should be swept",
    )
    p.add_argument(
        "--clf-dir", default=None,
        help="quality-classify: persisted-classifier directory — loaded "
        "when it holds a saved artifact (train once, score many), "
        "written after training otherwise",
    )
    p.add_argument(
        "--clf-min", type=float, default=None,
        help="curate: drop docs whose learned-classifier P(quality) is "
        "below this floor (C4-style gate; uses --clf-dir's artifact "
        "when present, else bootstraps from the median-quality split)",
    )
    p.add_argument("--clf-iters", type=int, default=30,
                   help="quality-classify: full-batch GD iterations")
    p.add_argument("--clf-lr", type=float, default=10.0,
                   help="quality-classify: learning rate (normalized "
                   "features want a large step)")
    p.add_argument("--merges", type=int, default=50,
                   help="bpe-train: number of merges to learn")
    p.add_argument("--min-pair-count", type=int, default=2,
                   help="bpe-train: stop when the best pair is rarer")
    p.add_argument("--query", default=None,
                   help="bm25-query: a single keyword query string")
    p.add_argument("--n-select", type=int, default=100,
                   help="dsir-select: sample size")
    p.add_argument("--seed", type=int, default=0,
                   help="dsir-select: Gumbel sampling seed")
    p.add_argument(
        "--target-path", default=None,
        help="dsir-select: parquet of target-domain documents (text "
        "column); defaults to the corpus's above-median quality half",
    )
    p.add_argument(
        "--dsir-dir", default=None,
        help="dsir-select: persisted-model directory — loaded when it "
        "holds a saved artifact (fit once, select many), written after "
        "fitting otherwise",
    )
    p.add_argument(
        "--split-weights", default="train=0.9,val=0.05,test=0.05",
        help="split-dataset: name=weight pairs, comma-separated",
    )
    p.add_argument("--split-seed", type=int, default=0,
                   help="split-dataset: assignment seed")
    p.add_argument(
        "--jaccard", type=float, default=0.8,
        help="split-dataset: MinHash-LSH near-dup threshold for the "
        "leakage pair graph",
    )
    p.add_argument("--lm-k", type=float, default=0.5,
                   help="ppl-score: add-k smoothing constant")
    p.add_argument("--lm-min-count", type=int, default=2,
                   help="ppl-score: prune bigrams rarer than this")
    p.add_argument(
        "--ppl-max", type=float, default=None,
        help="curate: drop docs whose self-trained bigram-LM "
        "cross-entropy exceeds this many bits (CCNet-style tail cut)",
    )
    p.add_argument(
        "--lm-dir", default=None,
        help="ppl-score: persisted-LM directory — loaded when it holds "
        "a saved artifact (train once, score many), written after "
        "training otherwise",
    )
    p.add_argument("--tokenizer", choices=["ws", "bpe_ish"], default="ws",
                   help="vocab: token definition")
    p.add_argument("--min-count", type=int, default=2,
                   help="vocab: drop tokens below this corpus frequency")
    p.add_argument("--top-n", type=int, default=None,
                   help="vocab: keep only the n most frequent tokens")
    p.add_argument("--max-sim", type=float, default=None,
                   help="mine-negatives: false-negative cap (exclusive)")
    p.add_argument("--min-sim", type=float, default=None,
                   help="mine-negatives: easy-negative floor (inclusive)")
    p.add_argument("--img-size", default="224x224",
                   help="media-curate: letterbox target WxH for images")
    p.add_argument("--audio-rate", type=int, default=16000,
                   help="media-curate: resample PCM audio to this rate")
    p.add_argument("--min-rms", type=float, default=1.0,
                   help="media-curate: drop clips whose trimmed RMS is below")
    p.add_argument("--every-n", type=int, default=30,
                   help="media-curate: sample every n-th video frame")
    p.add_argument(
        "--media-format",
        choices=["raw", "containers"],
        default="raw",
        help="media-curate: 'raw' feeds raw-RGB/PCM fixtures directly; "
        "'containers' wraps them in real PNG/JPEG/WAV containers and "
        "runs the codec front-end (decode_images/decode_audio) first",
    )
    p.add_argument(
        "--index-kind",
        choices=["ivf", "pq", "opq", "ivfpq"],
        default="ivfpq",
        help="ann-index: which index layout to build",
    )
    p.add_argument("--n-centroids", type=int, default=16,
                   help="ann-index ivf/ivfpq: coarse centroid count")
    p.add_argument("--pq-m", type=int, default=16,
                   help="ann-index pq/ivfpq: subvector count")
    p.add_argument("--pq-codes", type=int, default=256,
                   help="ann-index pq/ivfpq: codewords per subspace")
    p.add_argument("--nprobe", type=int, default=2,
                   help="ann-query ivf/ivfpq: probed buckets per query")
    p.add_argument("--k", type=int, default=5, help="ann-query: top-k")
    p.add_argument(
        "--queries-path",
        default=None,
        help="ann-query: parquet of (query_id, query_vec); defaults to "
        "the first 10 embeddings",
    )
    p.add_argument("job", nargs="?", help="job name (for 'run') / parquet dir (for 'optimize')")
    p.add_argument("--min-quality", type=float, default=0.5, help="curate: quality floor")
    p.add_argument(
        "--benchmark",
        help="curate/make-dataset: parquet of benchmark docs (doc_id, text) "
        "to decontaminate against",
    )
    p.add_argument(
        "--decontaminate-spans",
        action="store_true",
        help="curate: with --benchmark, excise the matching n-gram spans "
        "(margin 1 token, overlaps merged) and keep the clean remainder "
        "instead of dropping whole contaminated docs",
    )
    p.add_argument(
        "--redact-pii",
        action="store_true",
        help="curate: mask emails/IPs/phone numbers in the output text",
    )
    p.add_argument(
        "--sample-rate",
        type=float,
        default=None,
        help="curate: deterministic hash-sample this fraction of docs at "
        "ingest (reruns draw the identical subset)",
    )
    p.add_argument(
        "--lang-quota",
        type=int,
        default=None,
        help="curate: cap surviving docs per language (deterministic "
        "stratified pick, applied after dedup/decontamination)",
    )
    p.add_argument(
        "--mix-total",
        type=int,
        default=None,
        help="curate: temperature-mix ~this many survivors across "
        "(lang, source) strata with |stratum|^alpha shares",
    )
    p.add_argument(
        "--mix-alpha",
        type=float,
        default=0.5,
        help="curate --mix-total: temperature exponent (1=proportional, "
        "0=uniform; 0.2-0.7 upsamples small strata)",
    )
    p.add_argument(
        "--clean-lines",
        action="store_true",
        help="curate/make-dataset: C4-style line cleaning before "
        "scoring/hashing (drop short/no-punct/repeated boilerplate lines)",
    )
    p.add_argument(
        "--watermark-ms",
        type=int,
        default=None,
        help="rollup: close windows ending at or before this epoch-ms "
        "(default: materialize everything — final backfill)",
    )
    p.add_argument(
        "--cascade",
        action="store_true",
        help="rollup: also materialize the 1-hour and 1-day levels from "
        "the level below (multi-resolution continuous aggregate)",
    )
    p.add_argument("--zorder", help="optimize: comma-separated columns to Z-order cluster on")
    p.add_argument("--target-mb", type=int, default=128, help="optimize: target file size (MiB)")
    p.add_argument("--files", type=int, default=0, help="optimize --zorder: output file count")
    p.add_argument("--config", default="etl_jobs.json", help="job registry JSON (auto-created)")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01", help="source table directory")
    p.add_argument("--sink-dir", default="./etl_sinks", help="sink base directory")
    p.add_argument(
        "--quarantine-dir",
        default=None,
        help="divert rows with null keys here instead of loading them "
        "(row-level keep-going, ≙ S:231-236); off by default",
    )
    p.add_argument(
        "--format",
        choices=["jsonl", "csv"],
        default="jsonl",
        help="ingest: input file format",
    )
    p.add_argument(
        "--table",
        default="documents",
        help="ingest: contract table name (schema from the catalog)",
    )
    p.add_argument("--cpus", type=int, default=8)
    args = p.parse_args(argv)

    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s - %(levelname)s - %(message)s"
    )  # ≙ S:8-9

    cfg = default_config(args.config)
    jobs = build_jobs(args.sf_dir, args.sink_dir, quarantine_dir=args.quarantine_dir)

    def resolver(name: str):
        if name not in jobs:  # ≙ missing-script ❌ at E:335-340
            raise KeyError(f"job {name!r} has no implementation")
        return jobs[name]

    reg = JobRegistry()
    for name, meta in cfg.items():
        reg.register(name, resolver(name), meta.get("label", name), meta.get("tooltip", ""))

    if args.command == "list":
        for name, job in reg.jobs.items():
            print(f"{name}\t{job.label}")
        return 0

    spark = get_session(
        "ferramenta-etl", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus
    )
    try:
        if args.command == "plan-audit":
            from .plans import all_queries

            def _audited():
                yield from all_queries().items()
                # bench-only composites: not in the 50-slot driver
                # registry but graded for perf — audit their plans too
                from pyspark.sql import functions as _F

                from .operators.packing import pack_sequences
                from .operators.quantize import (
                    quantize_embeddings,
                    quantized_cosine_topk,
                )
                from .operators.text import chunk_documents
                from .pipeline.curation import curated_frame
                from .sources import load_table as _lt

                yield (
                    "curation",
                    lambda s, sf: curated_frame(s, sf, redact=True),
                )
                yield (
                    "seq_packing",
                    lambda s, sf: pack_sequences(
                        chunk_documents(_lt(s, sf, "documents"), 128, 16),
                        budget_tokens=2048,
                        n_shards=64,
                    ),
                )

                def _qtopk(s, sf):
                    emb = _lt(s, sf, "embeddings")
                    qc = quantize_embeddings(emb.filter(_F.col("vec_id") >= 10))
                    qq = quantize_embeddings(
                        emb.filter(_F.col("vec_id") < 10)
                    ).select(
                        _F.col("vec_id").alias("query_id"),
                        _F.col("q_embedding").alias("query_q"),
                        _F.col("q_scale").alias("query_scale"),
                    )
                    return quantized_cosine_topk(qc, qq, k=5)

                yield ("embedding_quantized_topk", _qtopk)

            print(
                f"{'query':28} {'hashEx':>6} {'bcast':>5} {'rangeEx':>7} "
                f"{'pyEval':>6} {'cartesian':>9}"
            )
            worst = 0
            for name, q in _audited():
                try:
                    plan = (
                        q(spark, args.sf_dir)
                        ._jdf.queryExecution()
                        .executedPlan()
                        .toString()
                    )
                except Exception as exc:  # surface, keep auditing
                    print(f"{name:28} ERROR {exc!s:.60}")
                    worst = max(worst, 2)
                    continue
                n_range = plan.count("rangepartitioning")
                n_py = plan.count("BatchEvalPython") + plan.count("ArrowEvalPython")
                n_cart = plan.count("CartesianProduct")
                print(
                    f"{name:28} {plan.count('Exchange hashpartitioning'):>6} "
                    f"{plan.count('BroadcastExchange'):>5} {n_range:>7} "
                    f"{n_py:>6} {n_cart:>9}"
                )
                # range sorts / row-at-a-time python / cartesians are the
                # plan smells that break at 100x — flag loudly
                if n_range or n_py or n_cart:
                    worst = max(worst, 1)
            return worst
        if args.command == "optimize":
            if not args.job:
                p.error("optimize requires a parquet directory path")
            from .sinks.layout import compact_small_files, write_zordered

            if args.zorder:
                cols = [c.strip() for c in args.zorder.split(",") if c.strip()]
                df = spark.read.parquet(args.job)
                n = args.files or max(1, df.rdd.getNumPartitions())
                staging = args.job.rstrip("/") + ".zorder.tmp"
                write_zordered(df, staging, cols, num_files=n)
                import os
                import shutil

                old = args.job.rstrip("/") + ".zorder.old"
                os.rename(args.job, old)
                os.rename(staging, args.job)
                shutil.rmtree(old)
                print(f"✅ z-ordered {args.job} on {cols} into {n} files")
            else:
                n = compact_small_files(
                    spark, args.job, target_bytes=args.target_mb * 1024 * 1024
                )
                print(f"✅ compacted {args.job} into {n} files")
            return 0
        if args.command == "rollup":
            from .pipeline.rollup import cascade_rollup, materialize_rollup
            from .sources import load_table

            ev = load_table(spark, args.sf_dir, "events")
            fine = f"{args.sink_dir}/events_rollup"
            n = materialize_rollup(ev, fine, watermark_ms=args.watermark_ms)
            msg = f"✅ events_rollup: {n} closed windows appended"
            if args.cascade:
                # multi-resolution: each coarse level re-aggregates the
                # level below it (O(windows) per level, exact cents).
                # No --watermark-ms means the CLI's documented final
                # backfill — bake everything, trailing partials
                # included (cascade_rollup final=True)
                sizes = ["15 minutes", "1 hour", "1 day"]
                prev = fine
                for size in sizes[1:]:
                    tag = size.replace(" ", "_")
                    nxt = f"{args.sink_dir}/events_rollup_{tag}"
                    k = cascade_rollup(
                        spark, prev, nxt, sizes[sizes.index(size) - 1],
                        size, watermark_ms=args.watermark_ms,
                        final=args.watermark_ms is None,
                    )
                    msg += f"; {tag}: {k}"
                    prev = nxt
            print(msg)
            return 0
        if args.command == "make-dataset":
            # The full corpus -> training-shards composition: curate
            # (filter/dedup/near-dup collapse/redact) -> token-bounded
            # chunking -> fixed-budget sequence packing -> sharded JSONL
            # export ordered by (seq_id, chunk position) so a data
            # loader streams whole packed sequences contiguously.
            from pyspark.sql import functions as F

            from .operators.packing import pack_sequences
            from .operators.text import chunk_documents
            from .pipeline.curation import curated_frame
            from .sinks.layout import export_jsonl

            bench = spark.read.parquet(args.benchmark) if args.benchmark else None
            curated = curated_frame(
                spark, args.sf_dir,
                min_quality=args.min_quality,
                benchmark=bench,
                redact=args.redact_pii,
                sample_rate=args.sample_rate,
                lang_quota=args.lang_quota,
                clean_lines=args.clean_lines,
            )
            chunks = chunk_documents(curated, chunk_tokens=512, overlap=64)
            packed = pack_sequences(chunks, budget_tokens=2048, n_shards=64)
            out = packed.select(
                "seq_id", "seq_tokens", "doc_id", "chunk_idx",
                F.col("chunk_text").alias("text"),
                "n_chunk_tokens",
            )
            n_shards = export_jsonl(
                out,
                f"{args.sink_dir}/dataset_jsonl",
                cluster_by=["seq_id"],
                order_by=["seq_id", "doc_id", "chunk_idx"],
            )
            from .sinks.layout import write_dataset_manifest

            manifest = write_dataset_manifest(
                spark,
                f"{args.sink_dir}/dataset_jsonl",
                config={
                    "min_quality": args.min_quality,
                    "redact_pii": args.redact_pii,
                    "sample_rate": args.sample_rate,
                    "lang_quota": args.lang_quota,
                    "clean_lines": args.clean_lines,
                    "benchmark": bool(args.benchmark),
                    "chunk_tokens": 512, "overlap": 64,
                    "budget_tokens": 2048,
                },
            )
            print(
                f"✅ make-dataset: {n_shards} JSONL shard(s), "
                f"{manifest['n_rows']} rows, fingerprint "
                f"{manifest['dataset_fingerprint']}"
            )
            return 0
        if args.command == "media-curate":
            # The multimodal counterpart of `curate`: three narrow-map
            # branches (image letterbox-resize, audio trim->resample->
            # feature-gate, video frame-sample) into idempotent keyed
            # sinks — reruns append zero; malformed rows become marker/
            # null rows upstream and are counted, not silently dropped.
            # Image/audio payloads come either as raw RGB/PCM fixtures
            # (--media-format raw) or as REAL PNG/WAV containers pushed
            # through the stdlib codec front-end (--media-format
            # containers; decode_images / decode_audio). Video stays
            # raw — no stdlib demuxer exists for compressed video.
            from pyspark.sql import functions as F

            from .operators.audio import (
                attach_fake_raw_audio,
                audio_features,
                resample_audio,
                trim_silence,
            )
            from .operators.containers import (
                attach_gif_media,
                attach_jpeg_media,
                attach_png_media,
                attach_wav_media,
                decode_audio,
                decode_images,
            )
            from .operators.multimodal import (
                attach_fake_raw_images,
                attach_fake_raw_video,
                resize_images,
                sample_video_frames,
            )
            from .sinks import write_ignore_conflicts
            from .sources import load_table

            try:
                img_w, img_h = (int(x) for x in args.img_size.split("x"))
            except ValueError:
                p.error(f"--img-size must be WxH, got {args.img_size!r}")
            docs = load_table(spark, args.sf_dir, "documents").select("doc_id")

            if args.media_format == "containers":
                # a mixed PNG/JPEG/GIF column split by doc_id % 3 —
                # decode_images routes all three by magic bytes, the
                # real-corpus shape (VERDICT r09 #3; GIF round 10)
                third = F.pmod(F.col("doc_id"), F.lit(3))
                pngs = attach_png_media(docs.filter(third == 0))
                jpgs = attach_jpeg_media(docs.filter(third == 1))
                gifs = attach_gif_media(docs.filter(third == 2))
                images = decode_images(
                    pngs.unionByName(jpgs).unionByName(gifs)
                )
                audio = decode_audio(attach_wav_media(docs))
                # round 11: real MP4 containers probed for box-tree
                # metadata (duration/dims/codecs) into their own sink —
                # the demuxer half of the video path; frame extraction
                # stays on the raw fixtures below (no stdlib H.264)
                from .operators.containers import (
                    attach_mp4_media,
                    probe_videos,
                )

                vmeta = probe_videos(attach_mp4_media(docs)).filter(
                    F.col("duration_ms").isNotNull()
                )
                n_vmeta = write_ignore_conflicts(
                    vmeta, f"{args.sink_dir}/media_video_meta",
                    keys=["doc_id"],
                )
            else:
                images = attach_fake_raw_images(docs)
                audio = attach_fake_raw_audio(docs)
                n_vmeta = 0

            resized = resize_images(images, img_w, img_h).filter(
                F.col("media").isNotNull()
            )
            n_img = write_ignore_conflicts(
                resized, f"{args.sink_dir}/media_images", keys=["doc_id"]
            )

            trimmed = resample_audio(trim_silence(audio), args.audio_rate)
            feats = audio_features(trimmed)
            keep = feats.filter(
                F.col("rms").isNotNull() & (F.col("rms") >= args.min_rms)
            ).select("doc_id")
            gated = trimmed.join(F.broadcast(keep), "doc_id")
            n_aud = write_ignore_conflicts(
                gated, f"{args.sink_dir}/media_audio", keys=["doc_id"]
            )

            raw_video = attach_fake_raw_video(docs)
            frames = sample_video_frames(raw_video, every_n=args.every_n)
            bad = frames.filter(F.col("frame_idx").isNull()).count()
            n_vid = write_ignore_conflicts(
                frames.filter(F.col("frame_idx").isNotNull()),
                f"{args.sink_dir}/media_frames",
                keys=["doc_id", "frame_idx"],
            )

            # Perceptual near-dup maps (round 12): dHash / envelope-hash
            # pairs through the shared pigeonhole kernel, collapsed to
            # (doc_id, canonical_id) via connected components — the
            # same artifact shape the text dedup pipeline persists, so
            # a downstream loader drops non-canonical media with one
            # join. Additive sinks; the media sinks above are untouched.
            # max_block_size caps the per-block candidate fan-out
            # (review r12): a corpus that is ONE perceptual family —
            # exactly what the synthetic gradient fixtures are — puts
            # identical fingerprints into every block, and an uncapped
            # pigeonhole join degenerates quadratic. The cap trades
            # recall inside oversized blocks for a bounded join, the
            # same guard the text families run with in the curation
            # pipeline.
            from .operators.audio import audio_near_dup_pairs
            from .operators.dedup import connected_components
            from .operators.multimodal import (
                image_near_dup_pairs,
                video_near_dup_pairs,
            )

            def _dup_map(pairs):
                return connected_components(pairs).select(
                    F.col("v").alias("doc_id"),
                    F.col("label").alias("canonical_id"),
                )

            cap = 200
            n_img_dup = write_ignore_conflicts(
                _dup_map(image_near_dup_pairs(images, max_block_size=cap)),
                f"{args.sink_dir}/media_image_dups",
                keys=["doc_id"],
            )
            n_aud_dup = write_ignore_conflicts(
                _dup_map(audio_near_dup_pairs(audio, max_block_size=cap)),
                f"{args.sink_dir}/media_audio_dups",
                keys=["doc_id"],
            )
            n_vid_dup = write_ignore_conflicts(
                _dup_map(
                    video_near_dup_pairs(raw_video, max_block_size=cap)
                ),
                f"{args.sink_dir}/media_video_dups",
                keys=["doc_id"],
            )
            print(
                f"✅ media-curate: {n_img} images, {n_aud} audio clips, "
                f"{n_vid} video frames, {n_vmeta} video metadata rows "
                f"loaded ({bad} malformed videos skipped; perceptual "
                f"dup-map rows: {n_img_dup} image, {n_aud_dup} audio, "
                f"{n_vid_dup} video)"
            )
            return 0
        if args.command == "neardup-admit":
            # The periodic batch companion to curate-stream: admit this
            # batch's near-dup-free docs against (and into) the
            # persisted MinHash signature index. First-arrived batch
            # wins across runs; rerunning a batch admits the same docs
            # and appends zero index rows.
            from .pipeline.dedup_index import dedup_incremental
            from .sources import load_table

            docs = load_table(spark, args.sf_dir, "documents").select(
                "doc_id", "text"
            )
            admitted = dedup_incremental(
                spark, docs, f"{args.sink_dir}/minhash_index"
            )
            n = admitted.count()
            print(f"✅ neardup-admit: {n} docs admitted (near-dup-free vs index)")
            return 0
        if args.command == "media-admit":
            # The multimodal sibling of neardup-admit: admit this
            # batch's perceptually-novel images against (and into) the
            # persisted fingerprint index (pipeline/media_index.py) —
            # dHash over the raw-image spine, same first-arrived-wins /
            # replay-appends-zero contract as the text index.
            from .operators.multimodal import (
                attach_fake_raw_images,
                dhash_images,
            )
            from .pipeline.media_index import fingerprint_dedup_incremental
            from .sources import load_table

            docs = load_table(spark, args.sf_dir, "documents").select("doc_id")
            fps = dhash_images(attach_fake_raw_images(docs))
            admitted = fingerprint_dedup_incremental(
                spark, fps, f"{args.sink_dir}/image_fp_index",
                max_block_size=200,
            )
            n = admitted.count()
            print(
                f"✅ media-admit: {n} images admitted "
                "(perceptually novel vs index)"
            )
            return 0
        if args.command == "ingest":
            # file -> schema contract -> corrupt-line quarantine ->
            # idempotent keyed load: the ingest front door for
            # JSONL/CSV corpora (one mangled line quarantines, reruns
            # append zero).
            if not args.job:
                p.error("ingest requires an input path")
            from .sinks import write_ignore_conflicts
            from .sources.files import load_csv, load_jsonl
            from .sources.tables import EXPECTED_SCHEMAS

            schema = EXPECTED_SCHEMAS[args.table]
            loader = load_jsonl if args.format == "jsonl" else load_csv
            good, bad = loader(spark, args.job, schema)
            # everything diverted lands under ONE quarantine root: the
            # user's --quarantine-dir, or a sink-adjacent default —
            # never silently dropped
            qdir = args.quarantine_dir or f"{args.sink_dir}/_quarantine"
            n_bad = bad.count()
            if n_bad:
                bad.write.mode("append").parquet(f"{qdir}/{args.table}_corrupt")
            key = schema.names[0]
            # a valid-JSON line MISSING the key parses clean but loads a
            # NULL key, which the anti-join can never match — every
            # rerun would re-append it, breaking 'reruns append zero'.
            # Null-key rows therefore divert through the sink's own
            # row-level quarantine rules.
            n = write_ignore_conflicts(
                good,
                f"{args.sink_dir}/{args.table}",
                keys=[key],
                bad_records_path=f"{qdir}/{args.table}_invalid",
            )
            print(
                f"✅ ingest {args.table}: {n} rows loaded, "
                f"{n_bad} corrupt lines quarantined under {qdir}"
            )
            return 0
        if args.command == "ann-index":
            # Materialize an ANN index over the embeddings table:
            # 'ivf' (partitioned raw vectors + centroid sidecar),
            # 'pq' (one-byte-per-subvector codes + codebook sidecar),
            # or 'ivfpq' (both: residual codes partitioned by coarse
            # centroid — the billion-scale layout).
            from .operators.quantize import (
                build_ivfpq_index,
                build_opq_index,
                build_pq_index,
            )
            from .operators.similarity import build_ivf_index
            from .sources import load_table

            path = args.job or f"{args.sink_dir}/ann_index"
            emb = load_table(spark, args.sf_dir, "embeddings")
            if args.index_kind == "ivf":
                build_ivf_index(emb, path, n_centroids=args.n_centroids)
            elif args.index_kind == "pq":
                build_pq_index(emb, path, m=args.pq_m, codes=args.pq_codes)
            elif args.index_kind == "opq":
                build_opq_index(emb, path, m=args.pq_m, codes=args.pq_codes)
            else:
                build_ivfpq_index(
                    emb, path, n_centroids=args.n_centroids,
                    m=args.pq_m, codes=args.pq_codes,
                )
            print(f"✅ ann-index: {args.index_kind} index at {path}")
            return 0
        if args.command == "ann-query":
            # Serve top-k from a persisted index dir; the index kind is
            # self-describing via its metadata sidecar. Queries default
            # to the first 10 embeddings (smoke/demo); pass --queries
            # for a parquet of (query_id, query_vec).
            import os

            from pyspark.sql import functions as _F

            from .operators.quantize import ivfpq_topk, pq_topk_on_index
            from .operators.similarity import ivf_topk_on_index
            from .sources import load_table

            if not args.job:
                p.error("ann-query requires the index path")
            if args.queries_path:
                queries = spark.read.parquet(args.queries_path)
            else:
                queries = (
                    load_table(spark, args.sf_dir, "embeddings")
                    .filter(_F.col("vec_id") < 10)
                    .select(
                        _F.col("vec_id").alias("query_id"),
                        _F.col("embedding").alias("query_vec"),
                    )
                )
            if os.path.exists(os.path.join(args.job, "_ivfpq_meta.json")):
                out = ivfpq_topk(
                    spark, args.job, queries, nprobe=args.nprobe, k=args.k
                )
            elif os.path.exists(os.path.join(args.job, "_pq_codebooks.json")):
                out = pq_topk_on_index(spark, args.job, queries, k=args.k)
            elif os.path.exists(os.path.join(args.job, "_centroids.json")):
                out = ivf_topk_on_index(
                    spark, args.job, queries, nprobe=args.nprobe, k=args.k
                )
            else:
                p.error(f"no index metadata sidecar under {args.job}")
            rows = out.collect()
            for r in rows:
                print(f"{r[0]}\t{r[1]}\t{r[2]:.6f}\t{r[3]}")
            print(f"✅ ann-query: {len(rows)} result rows")
            return 0
        if args.command == "verify-dataset":
            # The loader-side integrity gate: re-derive per-shard row
            # counts + content hashes and compare against _manifest.json
            # (written by make-dataset). Exit 1 with the mismatches
            # named — run this before pointing a training job at the
            # export.
            from .sinks.layout import verify_dataset_manifest

            if not args.job:
                p.error("verify-dataset requires the dataset directory")
            ok, problems = verify_dataset_manifest(spark, args.job)
            if ok:
                print(f"✅ verify-dataset: {args.job} matches its manifest")
                return 0
            for q in problems:
                print(f"❌ {q}")
            return 1
        if args.command == "vocab":
            # Corpus vocabulary snapshot: one pass over documents ->
            # (token, tf, df_approx) parquet under the sink dir. A
            # derived aggregate, not an event log — each run REPLACES
            # the snapshot (overwrite), unlike the keyed append sinks.
            from .operators.text import token_vocab
            from .sources import load_table

            vocab = token_vocab(
                load_table(spark, args.sf_dir, "documents"),
                tokenizer=args.tokenizer,
                min_count=args.min_count,
                top_n=args.top_n,
            )
            out_dir = f"{args.sink_dir}/vocab"
            vocab.write.mode("overwrite").parquet(out_dir)
            snap = spark.read.parquet(out_dir)
            n = snap.count()
            print(f"{'token':20} {'tf':>8} {'df~':>6}")
            for r in snap.orderBy(
                snap.tf.desc(), snap.token.asc()
            ).limit(10).collect():
                print(f"{r.token:20} {r.tf:>8} {r.df_approx:>6}")
            print(f"✅ vocab: {n} tokens written to {out_dir}")
            return 0
        if args.command == "keywords":
            # Per-document TF-IDF keywords: a derived aggregate like
            # vocab — each run replaces the snapshot.
            from .operators.text import tfidf_keywords
            from .sources import load_table

            k = args.top_n if args.top_n is not None else 5
            if k < 1:
                p.error(f"--top-n must be >= 1 for keywords (got {k})")
            kw = tfidf_keywords(
                load_table(spark, args.sf_dir, "documents"),
                k=k,
            )
            out_dir = f"{args.sink_dir}/keywords"
            kw.write.mode("overwrite").parquet(out_dir)
            n = spark.read.parquet(out_dir).count()
            print(f"✅ keywords: {n} (doc, term) rows written to {out_dir}")
            return 0
        if args.command == "split-dataset":
            # Leakage-safe train/val/test assignment: near-dup pairs
            # from MinHash-LSH feed connected components; every cluster
            # lands atomically in ONE split. Snapshot semantics like
            # vocab (derived, overwrite) — the assignment is a pure
            # function of (corpus, pairs, seed).
            from .operators.dedup import minhash_lsh_pairs
            from .operators.split import leakage_safe_split, split_report
            from .sources import load_table

            try:
                weights = {
                    kv.split("=")[0]: float(kv.split("=")[1])
                    for kv in args.split_weights.split(",")
                }
            except (IndexError, ValueError):
                p.error(
                    f"--split-weights must be name=w,...: {args.split_weights!r}"
                )
            docs = load_table(spark, args.sf_dir, "documents")
            pairs = minhash_lsh_pairs(docs, threshold=args.jaccard)
            assigned = leakage_safe_split(
                docs.select("doc_id"), pairs, weights, seed=args.split_seed
            )
            out_dir = f"{args.sink_dir}/doc_splits"
            assigned.write.mode("overwrite").parquet(out_dir)
            back = spark.read.parquet(out_dir)
            for r in split_report(back).orderBy("split").collect():
                print(f"{r.split:8} {r.n_docs:>8} ({r.frac:.2%})")
            print(f"✅ split-dataset: {back.count()} docs assigned "
                  f"(seed={args.split_seed}) -> {out_dir}")
            return 0
        if args.command == "ppl-score":
            # Bigram-LM cross-entropy per document (the CCNet-style
            # quality signal), trained on the corpus itself; snapshot
            # parquet of (doc_id, n_tokens, cross_entropy_bits,
            # perplexity) for downstream filtering.
            from pyspark.sql import functions as F

            from .operators.lm import (
                load_lm,
                save_lm,
                score_cross_entropy,
                train_bigram_lm,
            )
            from .sources import load_table

            from .sinks.layout import _fs_exists

            docs = load_table(spark, args.sf_dir, "documents")
            lm = None
            # existence-probe, don't except-swallow (same contract as
            # dsir-select): a present-but-broken artifact fails loudly
            if args.lm_dir and _fs_exists(spark, f"{args.lm_dir}/_lm_meta.json"):
                lm = load_lm(spark, args.lm_dir)
                print(f"   loaded LM from {args.lm_dir} (V={lm.v})")
            if lm is None:
                lm = train_bigram_lm(
                    docs, k=args.lm_k, min_count=args.lm_min_count
                )
                if args.lm_dir:
                    save_lm(lm, args.lm_dir)
                    lm = load_lm(spark, args.lm_dir)  # score the artifact
            scores = score_cross_entropy(docs, lm)
            out_dir = f"{args.sink_dir}/doc_ppl"
            scores.write.mode("overwrite").parquet(out_dir)
            back = spark.read.parquet(out_dir)
            stats = back.agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.avg("cross_entropy_bits"), 3).alias("avg_bits"),
                F.round(F.expr(
                    "percentile_approx(cross_entropy_bits, 0.9)"), 3
                ).alias("p90_bits"),
            ).collect()[0]
            print(
                f"✅ ppl-score: {stats.n} docs scored (V={lm.v}, "
                f"avg {stats.avg_bits} bits, p90 {stats.p90_bits}) "
                f"-> {out_dir}"
            )
            return 0
        if args.command == "bpe-train":
            # Learn a BPE merge list from the documents table; the
            # merge list is the tokenizer artifact (train once, encode
            # many — same contract as ppl-score's --lm-dir). Snapshot
            # semantics: each run replaces the artifact.
            from .operators.bpe import save_bpe_merges, train_bpe_from_docs
            from .sources import load_table

            docs = load_table(spark, args.sf_dir, "documents")
            merges = train_bpe_from_docs(
                docs, args.merges, min_pair_count=args.min_pair_count
            )
            out_dir = f"{args.sink_dir}/bpe_merges"
            save_bpe_merges(spark, merges, out_dir)
            for i, (a, b) in enumerate(merges[:8]):
                print(f"  {i:3} {a!r} + {b!r} -> {a + b!r}")
            print(f"✅ bpe-train: {len(merges)} merges -> {out_dir}")
            return 0
        if args.command == "bpe-encode":
            # Tokenize the corpus with a previously trained merge list
            # (sink_dir/bpe_merges). Snapshot parquet of
            # (doc_id, bpe_tokens).
            from pyspark.sql import functions as _F

            from .operators.bpe import bpe_tokenize, load_bpe_merges
            from .sources import load_table

            merges = load_bpe_merges(spark, f"{args.sink_dir}/bpe_merges")
            docs = load_table(spark, args.sf_dir, "documents")
            toks = bpe_tokenize(docs, merges).select("doc_id", "bpe_tokens")
            out_dir = f"{args.sink_dir}/doc_bpe"
            toks.write.mode("overwrite").parquet(out_dir)
            back = spark.read.parquet(out_dir)
            stats = back.agg(
                _F.count(_F.lit(1)).alias("n"),
                _F.round(_F.avg(_F.size("bpe_tokens")), 1).alias("avg_toks"),
            ).collect()[0]
            print(
                f"✅ bpe-encode: {stats.n} docs, avg {stats.avg_toks} "
                f"tokens/doc ({len(merges)} merges) -> {out_dir}"
            )
            return 0
        if args.command == "bm25-index":
            # Build + persist the BM25 inverted index over documents
            # (sink_dir/bm25): postings partitioned by term-hash bucket
            # so bm25-query can prune the scan to its terms' buckets.
            from .operators.retrieval import build_bm25_index, save_bm25_index
            from .sources import load_table

            docs = load_table(spark, args.sf_dir, "documents")
            idx = build_bm25_index(docs)
            out_dir = f"{args.sink_dir}/bm25"
            save_bm25_index(idx, out_dir)
            print(
                f"✅ bm25-index: {idx.n_docs} docs, avgdl "
                f"{idx.avgdl:.1f} -> {out_dir}"
            )
            return 0
        if args.command == "bm25-query":
            # Serve keyword queries from the persisted index: --query
            # for one ad-hoc string, --queries-path for a parquet batch
            # of (query_id, query).
            from .operators.retrieval import bm25_topk_on_index, load_bm25_index

            if not args.query and not args.queries_path:
                p.error("bm25-query needs --query or --queries-path")
            disk = load_bm25_index(spark, f"{args.sink_dir}/bm25")
            if args.queries_path:
                queries = spark.read.parquet(args.queries_path)
            else:
                queries = spark.createDataFrame(
                    [(0, args.query)], "query_id int, query string"
                )
            rows = bm25_topk_on_index(disk, queries, k=args.k).collect()
            for r in sorted(rows, key=lambda r: (r.query_id, r.rank)):
                print(f"{r.query_id}\t{r.rank}\t{r.doc_id}\t{r.score:.4f}")
            print(f"✅ bm25-query: {len(rows)} result rows")
            return 0
        if args.command == "dataset-card":
            # Summary-statistics artifact for a curated export: reads
            # sink_dir/curated_documents (or --target-path), writes
            # _card.json next to the data. Re-runs REPLACE the card —
            # a derived aggregate, like vocab.
            import json as _json

            from .sinks.layout import write_dataset_card

            src = args.target_path or f"{args.sink_dir}/curated_documents"
            df = spark.read.parquet(src)
            lang = "lang" if "lang" in df.columns else None
            card = write_dataset_card(spark, df, src, lang_col=lang)
            print(_json.dumps(card, sort_keys=True, indent=1))
            print(f"✅ dataset-card: {card['n_docs']} docs -> {src}/_card.json")
            return 0
        if args.command == "bm25-append":
            # Incrementally index a new batch (--target-path parquet of
            # documents; defaults to the documents table for smoke use)
            # into the persisted index. Idempotent: re-running the same
            # batch appends zero.
            from .operators.retrieval import append_to_bm25_index
            from .sources import load_table

            if args.target_path:
                batch = spark.read.parquet(args.target_path)
            else:
                batch = load_table(spark, args.sf_dir, "documents")
            n = append_to_bm25_index(spark, f"{args.sink_dir}/bm25", batch)
            print(f"✅ bm25-append: {n} new docs indexed")
            return 0
        if args.command == "dsir-select":
            # DSIR importance selection: fit hashed-ngram distributions
            # for a target domain (default: the corpus's own
            # --min-quality slice) vs the whole corpus, then Gumbel
            # top-n sample ∝ importance weight. Snapshot parquet of
            # (doc_id, log_w).
            from .operators.dsir import (
                dsir_log_weights,
                dsir_resample,
                fit_dsir,
                load_dsir,
                save_dsir,
            )
            from .operators.text import quality_score
            from .sources import load_table

            from .sinks.layout import _fs_exists

            docs = load_table(spark, args.sf_dir, "documents")
            model = None
            # existence-probe, don't except-swallow: a PRESENT but
            # corrupt/foreign/unreadable artifact must fail loudly
            # instead of being silently refit (possibly from different
            # --target-path/--min-quality) and overwritten
            if args.dsir_dir and _fs_exists(
                spark, f"{args.dsir_dir}/_dsir_meta.json"
            ):
                model = load_dsir(spark, args.dsir_dir)
                print(f"   loaded DSIR model from {args.dsir_dir}")
            if model is None:
                if args.target_path:
                    target = spark.read.parquet(args.target_path)
                else:
                    # default target = the ABOVE-MEDIAN quality half:
                    # an absolute floor that happens to cover the whole
                    # corpus would make target == raw and the importance
                    # model a uniform no-op
                    q = quality_score(docs.text)
                    cut = docs.select(q.alias("__q")).approxQuantile(
                        "__q", [0.5], 0.001
                    )[0]
                    target = docs.filter(q >= cut)
                model = fit_dsir(target, docs)
                if args.dsir_dir:
                    save_dsir(model, args.dsir_dir)
                    model = load_dsir(spark, args.dsir_dir)  # use the artifact
            weights = dsir_log_weights(model, docs)
            picked = dsir_resample(weights, args.n_select, seed=args.seed)
            out_dir = f"{args.sink_dir}/dsir_selected"
            picked.write.mode("overwrite").parquet(out_dir)
            n = spark.read.parquet(out_dir).count()
            print(
                f"✅ dsir-select: {n} docs selected (n={args.n_select}, "
                f"seed={args.seed}) -> {out_dir}"
            )
            return 0
        if args.command == "jdbc-maintenance":
            # Orphan-staging sweep (VERDICT r09 #8): runs killed between
            # staging and their finally-DROP leave uniquely-named
            # <table>__stg_<12hex> tables behind on the sink server.
            # PRECONDITION (documented on cleanup_staging_tables): no
            # loader may be active against --jdbc-table while this
            # runs — a live run's staging table is indistinguishable
            # from an orphan.
            from .sinks.jdbc_conflict import cleanup_staging_tables
            from .sources.jdbc import JdbcConfig

            if not args.jdbc_url or not args.jdbc_table:
                p.error("jdbc-maintenance needs --jdbc-url and --jdbc-table")
            cfg = JdbcConfig(
                url=args.jdbc_url,
                user=args.jdbc_user,
                password=args.jdbc_password,
                driver=args.jdbc_driver or "",
            )
            dropped = cleanup_staging_tables(spark, cfg, args.jdbc_table)
            if dropped:
                print(
                    f"✅ jdbc-maintenance: dropped {len(dropped)} orphaned "
                    f"staging tables for {args.jdbc_table}: "
                    + ", ".join(dropped)
                )
            else:
                print(
                    "✅ jdbc-maintenance: no orphaned staging tables for "
                    f"{args.jdbc_table}"
                )
            return 0
        if args.command == "quality-classify":
            # fastText/C4-style learned quality gate: train logistic
            # regression on positives (--target-path, or the corpus's
            # own --min-quality heuristic slice) vs the complement,
            # then score every document's P(quality). Snapshot parquet
            # of (doc_id, quality_p); --clf-dir persists the model for
            # train-once/score-many (same probe-don't-swallow contract
            # as dsir-select).
            from pyspark.sql import functions as _F

            from .operators.classifier import (
                classify_documents,
                load_classifier,
                save_classifier,
                train_text_classifier,
            )
            from .operators.text import quality_score
            from .sinks.layout import _fs_exists
            from .sources import load_table

            docs = load_table(spark, args.sf_dir, "documents")
            model = None
            if args.clf_dir and _fs_exists(
                spark, f"{args.clf_dir}/_clf_meta.json"
            ):
                model = load_classifier(spark, args.clf_dir)
                print(f"   loaded classifier from {args.clf_dir}")
            if model is None:
                if args.target_path:
                    pos = spark.read.parquet(args.target_path)
                    # corpus docs that ARE the target must not train as
                    # negatives (label noise); anti-join them out when
                    # the target carries ids, else use the whole corpus
                    # and accept the DSIR-style raw-side convention
                    if "doc_id" in pos.columns:
                        neg = docs.join(
                            pos.select("doc_id"), "doc_id", "anti"
                        )
                    else:
                        neg = docs
                else:
                    # bootstrap split at the corpus's own MEDIAN quality
                    # — an absolute floor (the curation --min-quality)
                    # can leave one side empty on a uniformly-good or
                    # uniformly-bad corpus, which the trainer rejects
                    q = quality_score(docs.text)
                    cut = docs.select(q.alias("__q")).approxQuantile(
                        "__q", [0.5], 0.001
                    )[0]
                    pos = docs.filter(q >= cut)
                    neg = docs.filter(q < cut)
                model = train_text_classifier(
                    pos, neg, iters=args.clf_iters, lr=args.clf_lr
                )
                if args.clf_dir:
                    save_classifier(model, args.clf_dir, spark)
                    model = load_classifier(spark, args.clf_dir)
            scores = classify_documents(model, docs)
            out_dir = f"{args.sink_dir}/doc_quality"
            scores.write.mode("overwrite").parquet(out_dir)
            back = spark.read.parquet(out_dir)
            stats = back.agg(
                _F.count(_F.lit(1)).alias("n"),
                _F.round(_F.avg("quality_p"), 3).alias("avg_p"),
                _F.sum((_F.col("quality_p") >= 0.5).cast("int")).alias("kept"),
            ).collect()[0]
            print(
                f"✅ quality-classify: {stats.n} docs scored "
                f"(avg P {stats.avg_p}, {stats.kept} above 0.5) -> {out_dir}"
            )
            return 0
        if args.command == "mine-negatives":
            # Contrastive hard negatives over the embeddings table via
            # the Arrow/BLAS scorer; anchors default to the first 10
            # embeddings (with their labels) or come from a parquet of
            # (query_id, query_vec, query_label). Output is keyed
            # (query_id, vec_id) through the idempotent sink — a rerun
            # with the same inputs appends zero.
            from pyspark.sql import functions as _F

            from .operators.similarity import mine_hard_negatives_arrow
            from .sinks import write_ignore_conflicts
            from .sources import load_table

            corpus = load_table(spark, args.sf_dir, "embeddings")
            if args.queries_path:
                anchors = spark.read.parquet(args.queries_path)
            else:
                anchors = corpus.filter(_F.col("vec_id") < 10).select(
                    _F.col("vec_id").alias("query_id"),
                    _F.col("embedding").alias("query_vec"),
                    _F.col("label").alias("query_label"),
                )
            mined = mine_hard_negatives_arrow(
                corpus, anchors, k=args.k,
                max_sim=args.max_sim, min_sim=args.min_sim,
            )
            n = write_ignore_conflicts(
                mined,
                f"{args.sink_dir}/hard_negatives",
                keys=["query_id", "vec_id"],
            )
            print(f"✅ mine-negatives: {n} (anchor, negative) rows appended")
            return 0
        if args.command == "stats":
            from .operators.text import corpus_stats
            from .sources import load_table

            rows = corpus_stats(load_table(spark, args.sf_dir, "documents")).collect()
            print(f"{'lang':6} {'source':8} {'docs':>7} {'tokens':>10} "
                  f"{'bytes':>11} {'q_mean':>7} {'q_p10/p50/p90'}")
            for r in rows:
                pcts = "/".join(f"{x:.2f}" for x in r.quality_p10_p50_p90)
                print(f"{str(r.lang):6} {str(r.source):8} {r.n_docs:>7} "
                      f"{r.n_tokens:>10} {r.n_bytes:>11} {r.quality_mean:>7.3f} {pcts}")
            return 0
        if args.command == "curate-stream":
            # Streaming curation ingest: stateless scoring/filter/sample
            # stages over the document stream, exact dedup via the
            # hash-keyed idempotent sink (the sink IS the dedup state;
            # replay-safe). Near-dup collapse stays a periodic batch
            # pass over the sink -- see streaming/curation.py.
            import os as _os

            from .streaming import run_curation_stream

            n = run_curation_stream(
                spark,
                args.sf_dir,
                args.sink_dir,
                _os.path.join(args.sink_dir, "_curate_stream_ckpt"),
                min_quality=args.min_quality,
                sample_rate=args.sample_rate,
            )
            print(f"✅ curated_stream: {n} rows appended")
            return 0
        if args.command == "stream":
            # Drain the event stream through the keyed idempotent sink
            # with AvailableNow — the streaming analog of run-all: every
            # invocation processes whatever arrived and appends only new
            # keys, so re-running (or replaying after checkpoint loss)
            # appends zero duplicates.
            import os as _os

            from .streaming import stream_events, stream_ignore_conflicts

            ev = stream_events(spark, args.sf_dir)
            n = stream_ignore_conflicts(
                ev,
                f"{args.sink_dir}/events_stream",
                keys=["event_id"],
                checkpoint_dir=_os.path.join(args.sink_dir, "_checkpoints", "events"),
            )
            print(f"✅ events_stream: {n} rows appended")
            return 0
        if args.command == "curate":
            from .pipeline.curation import curate_documents

            bench = spark.read.parquet(args.benchmark) if args.benchmark else None
            n = curate_documents(
                spark,
                args.sf_dir,
                args.sink_dir,
                min_quality=args.min_quality,
                benchmark=bench,
                redact=args.redact_pii,
                sample_rate=args.sample_rate,
                lang_quota=args.lang_quota,
                clean_lines=args.clean_lines,
                mix_total=args.mix_total,
                mix_alpha=args.mix_alpha,
                decontaminate_spans=args.decontaminate_spans,
                ppl_max=args.ppl_max,
                clf_min=args.clf_min,
                clf_dir=args.clf_dir,
                clf_iters=args.clf_iters,
                clf_lr=args.clf_lr,
            )
            print(f"✅ curated_documents: {n} rows appended")
            return 0
        if args.command == "run":
            if not args.job:
                p.error("run requires a job name")
            res = _run_with_progress(reg, spark, args.job)
            print(reg.status_line([res]))
            return 0 if res.status == "ok" else 1
        try:
            results = reg.run_all(
                spark, runner=lambda s, n: _run_with_progress(reg, s, n)
            )
        except PipelineError as exc:
            print(reg.status_line(exc.results))
            return 1
        print(reg.status_line(results))
        return 0
    finally:
        if _stop_session:  # in-process tests share the session
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
