"""Physical data layout for scan efficiency at the 100 TB target.

Two tools the reference never needed (its sink was a remote PostgreSQL
table) but any parquet-lake deployment does:

- ``write_zordered``: multi-column clustering via a Z-order (Morton)
  space-filling curve. A plain sort clusters file-level min/max stats on
  ONE column; interleaving the bits of two columns gives every file a
  narrow range on BOTH, so parquet row-group statistics prune scans for
  predicates on either column (or their conjunction). This is what
  Delta/Iceberg ``OPTIMIZE ZORDER BY`` does, expressed with vanilla
  Spark: one tiny min/max agg (2 rows to the driver — metadata), a pure
  bit-twiddling projection (whole-stage codegen), and one range
  exchange.
- ``compact_small_files``: rewrite a parquet directory into
  size-targeted files. Streaming/idempotent appends accumulate small
  files; at scale the scan's task-scheduling overhead and footer reads
  dominate. Compaction is the standard maintenance job.
"""

from __future__ import annotations

import math
import os
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _scale_to_bits(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map a numeric column onto the integer grid [0, 2^bits): rank-free
    linear scaling against the precomputed (lo, hi) range. Nulls map to
    cell 0 (they cluster together at the curve origin)."""
    span = hi - lo
    if span <= 0:  # constant column: everything in one cell
        return F.lit(0).cast("long")
    cells = (1 << bits) - 1
    scaled = ((col.cast("double") - F.lit(float(lo))) / F.lit(float(span))) * cells
    return F.coalesce(
        F.least(F.greatest(F.round(scaled, 0).cast("long"), F.lit(0)), F.lit(cells)),
        F.lit(0),
    )


def zorder_value(scaled: Sequence[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each pre-scaled integer column
    into one Morton code. Built as a balanced tree of bitwise-OR terms —
    all integer shifts/masks, fully inside whole-stage codegen."""
    n = len(scaled)
    terms: list[Column] = []
    for i in range(bits):
        for j, c in enumerate(scaled):
            src = c.cast("long").bitwiseAND(F.lit(1 << i))
            # bit i of column j lands at interleaved position i*n + j;
            # src already sits at position i, so shift by the difference
            terms.append(F.shiftleft(src, i * (n - 1) + j))
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    num_files: int,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on the Z-order curve over
    ``cols``.

    Plan shape: one 2-value-per-column agg (driver-side metadata), a
    bit-interleave projection, ``repartitionByRange`` on the Morton code
    (one exchange — the same cost as any global sort), a within-
    partition sort so row groups inside each file are clustered too,
    then the projection drops the helper column before the write. At
    100 TB: ranges come from table statistics or a sampled agg instead
    of the exact min/max; the exchange is the only data movement.
    """
    ranges = df.agg(
        *[F.min(c).cast("double").alias(f"lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    scaled = [
        _scale_to_bits(F.col(c), ranges[f"lo_{c}"], ranges[f"hi_{c}"], bits)
        for c in cols
    ]
    (
        df.withColumn("__z", zorder_value(scaled, bits))
        .repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def file_clustering_report(path: str, cols: Sequence[str]) -> list[dict]:
    """Per-file min/max coverage for ``cols`` straight from the parquet
    footers (what a reader's row-group pruning sees). Returns one dict
    per data file: {file, nrows, <col>_min, <col>_max}. Test/ops
    helper — reads footers only, never data pages."""
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        schema_names = [md.schema.column(i).name for i in range(md.num_columns)]
        rec: dict = {"file": name, "nrows": md.num_rows}
        for c in cols:
            ci = schema_names.index(c)
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    continue
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            rec[f"{c}_min"], rec[f"{c}_max"] = lo, hi
        out.append(rec)
    return out


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite the parquet directory at ``path`` into files of roughly
    ``target_bytes`` each; returns the new file count.

    Sizing uses the CURRENT on-disk bytes (compressed), so the target is
    hit without a pre-pass over the data. The rewrite stages into
    ``path + '.compact.tmp'`` and swaps via rename — a reader never sees
    a half-written directory; crash before the swap leaves the original
    untouched (rerun-safe), matching the staging discipline of
    sinks/idempotent.py.
    """
    total = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    n = max(1, math.ceil(total / target_bytes))
    staging = path.rstrip("/") + ".compact.tmp"
    old = path.rstrip("/") + ".compact.old"
    # coalesce, not repartition: merging small files needs no shuffle
    spark.read.parquet(path).coalesce(n).write.mode("overwrite").parquet(staging)
    os.rename(path, old)
    os.rename(staging, path)
    import shutil

    shutil.rmtree(old)
    return n


def export_jsonl(
    df: DataFrame,
    path: str,
    target_mb: int = 256,
    compression: str = "gzip",
    mode: str = "overwrite",
    cluster_by: Sequence[str] = (),
    order_by: Sequence[str] = (),
    shuffle_seed: int | None = None,
) -> int:
    """Export a curated relation as sharded JSONL — the format training
    data-loaders consume. Shard count is sized from a sampled average
    row width so files land near ``target_mb`` UNCOMPRESSED (loaders
    stream-decompress; the uncompressed size is what bounds their
    memory), floor one shard. Returns the shard count.

    ``cluster_by`` hash-partitions the shards on those columns and
    ``order_by`` sorts lines within each shard — e.g. cluster and order
    by a packed ``seq_id`` so every training sequence's chunks land
    contiguously in ONE shard (round-robin would scatter them). Both
    default off (pure round-robin balance).

    ``shuffle_seed`` (VERDICT r08 #4) gives training exports a SEEDED
    DETERMINISTIC GLOBAL SHUFFLE: every line's shard AND its position
    within the shard derive from ``xxhash64(seed, serialized line)`` —
    a pure function of (seed, content), independent of input
    partitioning, task order, or cluster size. Same seed ⇒ byte-
    identical shard assignment and line order on every rerun; a
    different seed ⇒ a different permutation of the same lines (the
    manifest's layout-independent fingerprint is unchanged). Mutually
    exclusive with cluster_by/order_by (a shuffle and a clustering are
    opposite layouts). One exchange + per-shard sort — the same cost
    as the cluster_by path — plus one EXACT width agg for sizing:
    seeded exports must not size from the partitioning-dependent
    limit() sample, or the same seed could land on a different
    n_shards between reruns and break the byte-identity guarantee.

    Columns serialize via Spark's JSON writer (UTF-8, one object per
    line, null fields omitted — the de-facto JSONL corpus convention)."""
    if shuffle_seed is not None and (list(cluster_by) or list(order_by)):
        raise ValueError(
            "shuffle_seed is mutually exclusive with cluster_by/order_by"
        )
    persisted = False
    try:
        if shuffle_seed is not None:
            # The byte-identical-rerun guarantee cannot ride on a
            # partitioning-dependent limit() sample: a different sample
            # -> different n_shards -> different shard assignment for
            # the SAME seed. Seeded exports size from one EXACT
            # width+count agg (deterministic by construction); persist
            # so sizing and the write run the upstream pipeline once.
            df = df.persist()
            persisted = True
            tot = df.agg(
                F.sum(
                    F.octet_length(F.to_json(F.struct(*df.columns)))
                ).alias("b"),
                F.count(F.lit(1)).alias("n"),
            ).first()
            n_shards = (
                max(1, int(int(tot.b) // (target_mb * 1024 * 1024)) + 1)
                if tot.n
                else 1
            )
            line = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
            h = F.xxhash64(F.lit(int(shuffle_seed)), line)
            out = (
                df.withColumn("__h", h)
                .repartition(n_shards, F.col("__h"))
                .sortWithinPartitions("__h")
                .drop("__h")
            )
            out.write.mode(mode).option("compression", compression).json(path)
            return n_shards
        sample = df.limit(1000).select(
            F.octet_length(F.to_json(F.struct(*df.columns))).alias("w")
        ).agg(F.avg("w").alias("w"), F.count(F.lit(1)).alias("n")).first()
        if not sample.n:
            n_shards = 1
        elif sample.n < 1000:
            # limit(1000) returned everything: the sample count IS the
            # row count — no second pass needed for small exports
            n_shards = max(
                1, int(sample.n * float(sample.w) // (target_mb * 1024 * 1024)) + 1
            )
        else:
            # big export: persist so the sizing count and the write run
            # the upstream pipeline once, not twice (curation upstream
            # of an export is a multi-join near-dup pass — recomputing
            # it doubles the export's cost)
            df = df.persist()
            persisted = True
            total = df.count() * float(sample.w)
            n_shards = max(1, int(total // (target_mb * 1024 * 1024)) + 1)
        if cluster_by:
            out = df.repartition(n_shards, *[F.col(c) for c in cluster_by])
        else:
            out = df.repartition(n_shards)
        if order_by:
            out = out.sortWithinPartitions(*order_by)
        out.write.mode(mode).option("compression", compression).json(path)
    finally:
        if persisted:
            df.unpersist()
    return n_shards


def _fs_and_path(spark: SparkSession, path: str):
    """(jvm, FileSystem, qualified Path) for ``path`` through the
    session's Hadoop configuration — the manifest must live wherever the
    shards live (HDFS/S3/local), so its I/O goes through the same
    filesystem layer Spark reads the shards with (ADVICE r08; same
    pattern as idempotent._sink_lock)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return jvm, fs, fs.makeQualified(p)


def _fs_exists(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` exists on whatever filesystem owns it — the
    probe the artifact loaders' callers use to distinguish 'not fitted
    yet' (fall through to fitting) from 'artifact present but
    unreadable/foreign' (which must stay a loud error, not a silent
    refit that overwrites the pinned model)."""
    _jvm, fs, p = _fs_and_path(spark, path)
    return bool(fs.exists(p))


def _fs_write_text(spark: SparkSession, path: str, text: str) -> None:
    """Write-then-ATOMIC-overwrite-rename through the Hadoop FileContext
    API: readers of the final name either see the old manifest or the
    new one, never a gap or a partial file. FileSystem.rename refuses an
    existing destination on some schemes, and delete-then-rename opens a
    window where NO manifest exists (and loses the old one if the
    process dies mid-swap) — FileContext.rename(OVERWRITE) is the
    documented atomic-replace primitive (atomic on HDFS and posix-local;
    on S3A whole-object last-writer-wins, never truncated)."""
    jvm, fs, p = _fs_and_path(spark, path)
    tmp = jvm.org.apache.hadoop.fs.Path(p.toString() + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    gw = spark.sparkContext._gateway
    fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
        p.toUri(), spark._jsc.hadoopConfiguration()
    )
    rename_cls = jvm.org.apache.hadoop.fs.Options.Rename
    opts = gw.new_array(rename_cls, 1)
    opts[0] = rename_cls.OVERWRITE
    fc.rename(tmp, p, opts)  # throws on failure (no boolean false-path)


def _fs_read_text(spark: SparkSession, path: str) -> str:
    jvm, fs, p = _fs_and_path(spark, path)
    stream = fs.open(p)
    baos = jvm.java.io.ByteArrayOutputStream()
    # copyBytes(close=True) closes both streams
    jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, 65536, True)
    return bytes(baos.toByteArray()).decode("utf-8")


def _shard_stats(spark: SparkSession, path: str) -> list[dict]:
    """Per-shard (file basename, rows, order-insensitive content hash)
    for a JSONL export, computed in ONE distributed pass over
    ``part-*`` (the manifest and _SUCCESS markers are excluded by the
    glob). The content hash is sum(xxhash64(line)) mod 2^64 — summed as
    decimal(38,0) so a petabyte shard cannot overflow bigint under ANSI
    mode, order-insensitive so recompression or a rewritten-but-
    equal-content shard verifies clean, and duplicate-line-sensitive
    (unlike xor, two identical lines don't cancel)."""
    rows = (
        spark.read.text(f"{path}/part-*")
        .select(F.input_file_name().alias("file"), F.col("value"))
        .groupBy("file")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.xxhash64("value").cast("decimal(38,0)")).alias("hsum"),
        )
        .collect()
    )
    out = []
    for r in rows:
        base = r.file.rsplit("/", 1)[-1]
        out.append(
            {
                "file": base,
                "rows": r.rows,
                "content_hash": str(int(r.hsum) % (1 << 64)),
            }
        )
    return sorted(out, key=lambda d: d["file"])


def write_dataset_manifest(
    spark: SparkSession,
    path: str,
    config: dict | None = None,
    shuffle_seed: int | None = None,
) -> dict:
    """Write ``_manifest.json`` next to a JSONL export: per-shard row
    counts + content hashes, the producing config, and a DATASET
    fingerprint = (sum of all line hashes mod 2^64, total rows). The
    fingerprint is layout-independent by construction — recluster the
    same lines into a different shard count and it is unchanged, while
    any added/dropped/edited line moves it. A training run records the
    fingerprint; ``verify_dataset_manifest`` re-derives everything
    before the loader trusts the files. ``shuffle_seed`` records the
    seed of a seeded-shuffle export (``export_jsonl(shuffle_seed=)``)
    so the corpus order is reproducible from the manifest alone.
    Manifest I/O goes through the Hadoop FileSystem API — works on the
    same HDFS/S3/local dir the shards occupy (ADVICE r08). Returns the
    manifest dict."""
    import json

    shards = _shard_stats(spark, path)
    total_rows = sum(s["rows"] for s in shards)
    fingerprint = sum(int(s["content_hash"]) for s in shards) % (1 << 64)
    manifest = {
        "format": "jsonl",
        "n_shards": len(shards),
        "n_rows": total_rows,
        "dataset_fingerprint": f"{fingerprint}:{total_rows}",
        "shards": shards,
        "config": config or {},
    }
    if shuffle_seed is not None:
        manifest["shuffle_seed"] = int(shuffle_seed)
    _fs_write_text(
        spark,
        os.path.join(path, "_manifest.json"),
        json.dumps(manifest, indent=1, sort_keys=True),
    )
    return manifest


def verify_dataset_manifest(
    spark: SparkSession, path: str
) -> tuple[bool, list[str]]:
    """Re-derive the shard stats and compare against ``_manifest.json``.
    Returns (ok, problems); problems name the shard and the mismatch
    (missing/extra/rows/content) — the integrity gate a loader runs
    before training on the export."""
    import json

    manifest = json.loads(
        _fs_read_text(spark, os.path.join(path, "_manifest.json"))
    )
    want = {s["file"]: s for s in manifest["shards"]}
    got = {s["file"]: s for s in _shard_stats(spark, path)}
    problems = []
    for name in sorted(set(want) - set(got)):
        problems.append(f"missing shard {name}")
    for name in sorted(set(got) - set(want)):
        problems.append(f"unexpected shard {name}")
    for name in sorted(set(want) & set(got)):
        w, g = want[name], got[name]
        if g["rows"] != w["rows"]:
            problems.append(f"{name}: rows {g['rows']} != {w['rows']}")
        elif g["content_hash"] != w["content_hash"]:
            problems.append(f"{name}: content hash mismatch")
    total = sum(s["rows"] for s in got.values())
    fp = sum(int(s["content_hash"]) for s in got.values()) % (1 << 64)
    if f"{fp}:{total}" != manifest["dataset_fingerprint"]:
        problems.append("dataset fingerprint mismatch")
    return (not problems, problems)


def dataset_card(
    docs: "DataFrame",
    text_col: str = "text",
    lang_col: str | None = None,
) -> dict:
    """The summary statistics a training run wants attached to its
    corpus — counts, token totals (whitespace + the BPE-ish subword
    proxy), per-language mix, quality-score quantiles, and the exact-
    duplicate rate — computed in TWO aggregation passes (one global,
    one groupBy(md5) for the dup rate), every stat a pure column
    expression over the corpus scan. Returns a plain dict; see
    write_dataset_card for the persisted artifact."""
    from pyspark.sql import functions as F

    from ..operators.text import bpe_ish_count, n_tokens, quality_score

    t = F.col(text_col)
    agg = (
        docs.select(t.alias(text_col), quality_score(t).alias("__q"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum(n_tokens(t)), F.lit(0)).alias("ws_tokens"),
            F.coalesce(
                F.sum(bpe_ish_count(t)), F.lit(0)
            ).alias("bpe_ish_tokens"),
            F.expr(
                "percentile_approx(__q, array(0.1, 0.5, 0.9), 10000)"
            ).alias("q_quantiles"),
        )
        .collect()[0]
    )
    dup = (
        docs.groupBy(F.md5(t).alias("__h"))
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).alias("dup_docs"),
        )
        .collect()[0]
    )
    card = {
        "n_docs": int(agg.n_docs),
        "ws_tokens": int(agg.ws_tokens),
        "bpe_ish_tokens": int(agg.bpe_ish_tokens),
        "quality_p10_p50_p90": [round(float(x), 4) for x in agg.q_quantiles]
        if agg.q_quantiles
        else None,
        "exact_dup_docs": int(dup.dup_docs),
        "exact_dup_rate": round(int(dup.dup_docs) / int(agg.n_docs), 6)
        if agg.n_docs
        else 0.0,
    }
    if lang_col:
        card["langs"] = {
            str(r[lang_col]): r.n
            for r in docs.groupBy(lang_col)
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
    return card


def write_dataset_card(
    spark: SparkSession,
    docs: "DataFrame",
    path: str,
    text_col: str = "text",
    lang_col: str | None = None,
) -> dict:
    """Compute dataset_card(docs) and persist it as ``_card.json``
    next to the dataset (same atomic-rename Hadoop-FS path as the
    manifest, so HDFS/S3 work). Returns the card."""
    import json

    card = dataset_card(docs, text_col=text_col, lang_col=lang_col)
    _fs_write_text(
        spark, os.path.join(path, "_card.json"), json.dumps(card, sort_keys=True)
    )
    return card
