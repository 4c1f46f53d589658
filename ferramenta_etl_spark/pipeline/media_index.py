"""Incremental perceptual dedup against a persisted FINGERPRINT index —
the multimodal sibling of ``pipeline/dedup_index.py`` (round 12).

A continuously-ingesting media pipeline has exactly the problem the
MinHash index solves for text: re-running the all-corpus pair join
(``dedup.hamming_pairs``) to admit a day's worth of images re-pays the
whole corpus. This module makes admission incremental over ANY 64-bit
perceptual fingerprint family — image dHash
(``multimodal.dhash_images``), audio envelope hash
(``audio.audio_fingerprints``), video majority-voted frame hash
(``multimodal.video_fingerprints``) — because all three already share
the pigeonhole candidate kernel, so one index layout serves them all
(one index PATH per modality; the meta stamp pins the parameters).

Design, inherited deliberately from the text index (see
dedup_index.py's docstring for the full rationale — the semantics are
identical, with hamming distance in place of estimated Jaccard):

- INDEX rows are ``(doc_id, fp, blk, bval, canonical_id)``, hive-
  partitioned by ``blk``, appended through the idempotent keyed sink
  (keys = (doc_id, blk)) — replays append zero. Dropped items ARE
  indexed with canonical_id != doc_id: those bridge rows are what make
  chain components (A~B, B~C, A!~C) replay-stable and cross-batch
  drops transitive.
- A new batch explodes its own blocks (map-only), probes the index on
  (blk, bval) with the batch's block values pushed into the scan as an
  IN filter when small, verifies candidates by EXACT hamming distance
  over the full fingerprints, and resolves intra-batch pairs plus
  cross-batch anchor edges in ONE connected-components pass with
  anchor domination (an already-admitted representative is never
  revoked).
- A batch item with a NULL fingerprint (malformed media) is ADMITTED
  and not indexed — it cannot match anything through this index, and
  silently dropping undecodable items would hide corruption; the
  malformed-row policy lives upstream in the fingerprint ops.

Known, documented divergence (same as the text index): a pair
discovered ACROSS batches cannot retroactively merge two clusters that
were each already admitted — incremental admission never revokes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import connected_components, fingerprint_blocks
from ..sinks.idempotent import write_ignore_conflicts
from .dedup_index import (
    _check_index_meta,
    _write_index_meta,
    index_exists,
)

_PUSHDOWN_MAX_KEYS = 50_000  # same IN-pushdown bound as the text index


def load_fp_index(spark: SparkSession, index_path: str) -> DataFrame:
    """The persisted fingerprint relation (doc_id, fp, blk, bval,
    canonical_id)."""
    return spark.read.parquet(index_path)


def _cross_batch_matches(
    new_blocked: DataFrame, index: DataFrame, max_hamming: int
) -> DataFrame:
    """(doc_id, canonical_id) of new items within ``max_hamming`` of an
    already-indexed item of a different cluster; min matched cluster
    when several. Same two exclusions as the text index: a replayed
    item's own rows, and rows of its own cluster (a canonical item's
    dropped neighbors point back at it and must not drop it)."""
    keys = new_blocked.select("bval").distinct().limit(_PUSHDOWN_MAX_KEYS + 1)
    vals = [r.bval for r in keys.collect()]
    if len(vals) <= _PUSHDOWN_MAX_KEYS:
        index = index.filter(F.col("bval").isin(vals))
    ham = F.bit_count(F.col("old.fp").bitwiseXOR(F.col("new.fp")))
    return (
        index.alias("old")
        .join(new_blocked.alias("new"), ["blk", "bval"])
        .filter(F.col("old.doc_id") != F.col("new.doc_id"))
        .filter(F.col("old.canonical_id") != F.col("new.doc_id"))
        .select(
            F.col("new.doc_id").alias("doc_id"),
            F.col("old.canonical_id").alias("canonical_id"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .groupBy("doc_id")
        .agg(F.min("canonical_id").alias("canonical_id"))
    )


def fingerprint_dedup_incremental(
    spark: SparkSession,
    fp_df: DataFrame,
    index_path: str,
    max_hamming: int = 3,
    n_blocks: int = 4,
    id_col: str = "doc_id",
    fp_col: str = "fp",
    max_block_size: int | None = None,
) -> DataFrame:
    """Admit the perceptually-novel subset of ``fp_df`` (rows of
    (id, fingerprint), from any of the fingerprint ops) against — and
    into — the index at ``index_path``; returns the surviving rows of
    ``fp_df``. First-arrived-wins across batches; min-id canonical
    within a batch; anchor domination across; null-fp rows admitted
    un-indexed. Same recall bound as ``hamming_pairs``: pairs beyond
    n_blocks-1 bits are invisible, so the guard rejects a
    ``max_hamming`` past it. ``max_block_size`` caps the batch's
    per-block membership BEFORE the self-join and the index probe —
    the same quadratic-fan-out guard ``hamming_pairs`` takes, for
    batches that are one perceptual family (capping only trades recall
    inside oversized blocks; the cap does not touch index rows, so
    cross-batch bridges stay intact)."""
    if max_hamming > n_blocks - 1:
        raise ValueError(
            f"max_hamming ({max_hamming}) exceeds the pigeonhole recall "
            f"bound n_blocks-1 ({n_blocks - 1}); raise n_blocks"
        )
    fp = fp_df.select(F.col(id_col).alias("doc_id"), F.col(fp_col).alias("fp"))
    # three consumers (probe, self-join, append): checkpoint once. The
    # cap applies ONLY to the join sides — the APPEND must stay
    # uncapped, or capped-away rows would lose their bridge coverage in
    # the index and replays/chains would resolve differently
    blocked = fingerprint_blocks(
        fp.filter(F.col("fp").isNotNull()), "doc_id", "fp", 64, n_blocks
    ).localCheckpoint(eager=True)
    blocked_join = blocked
    if max_block_size is not None:
        from ..operators.dedup import _cap_blocks

        blocked_join = _cap_blocks(blocked, ["blk", "bval"], max_block_size)

    meta = {"max_hamming": max_hamming, "n_blocks": n_blocks, "layout": 1}
    drop_pairs = None
    if index_exists(spark, index_path):
        _check_index_meta(spark, index_path, meta)
        index = load_fp_index(spark, index_path)
        drop_pairs = _cross_batch_matches(blocked_join, index, max_hamming)
    else:
        _write_index_meta(spark, index_path, meta)

    a, b = blocked_join.alias("a"), blocked_join.alias("b")
    intra_pairs = (
        a.join(
            b,
            [
                F.col("a.blk") == F.col("b.blk"),
                F.col("a.bval") == F.col("b.bval"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.bit_count(F.col("a.fp").bitwiseXOR(F.col("b.fp"))).alias(
                "hamming"
            ),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["doc_id_a", "doc_id_b"])
        .select("doc_id_a", "doc_id_b")
    )

    edges = intra_pairs
    if drop_pairs is not None:
        edges = edges.unionByName(
            drop_pairs.select(
                F.col("doc_id").alias("doc_id_a"),
                F.col("canonical_id").alias("doc_id_b"),
            )
        )
    labels = connected_components(edges)
    if drop_pairs is not None:
        # anchor domination: a component touching any indexed cluster
        # collapses onto its MIN ANCHOR, never a smaller batch id —
        # admission cannot revoke an earlier representative
        anchors = drop_pairs.select(F.col("canonical_id").alias("v")).distinct()
        comp_anchor = (
            labels.join(anchors, "v")
            .groupBy("label")
            .agg(F.min("v").alias("anchor"))
        )
        labels = labels.join(comp_anchor, "label", "left").select(
            "v", F.coalesce("anchor", "label").alias("label")
        )
    batch_ids = blocked.select("doc_id").distinct()
    canon = (
        labels.filter(F.col("v") != F.col("label"))
        .join(batch_ids, labels.v == batch_ids.doc_id, "left_semi")
        .select(
            F.col("v").alias("doc_id"), F.col("label").alias("canonical_id")
        )
        .localCheckpoint(eager=True)
    )

    indexed = blocked.join(canon, "doc_id", "left").withColumn(
        "canonical_id", F.coalesce(F.col("canonical_id"), F.col("doc_id"))
    )
    write_ignore_conflicts(
        indexed.select("doc_id", "fp", "blk", "bval", "canonical_id"),
        index_path,
        keys=["doc_id", "blk"],
        partition_cols=["blk"],
    )
    dropped_ids = canon.select("doc_id")
    if id_col != "doc_id":
        dropped_ids = dropped_ids.withColumnRenamed("doc_id", id_col)
    return fp_df.join(dropped_ids, id_col, "left_anti")
