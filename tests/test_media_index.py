"""Incremental perceptual-fingerprint admission (pipeline/media_index.py):
the multimodal sibling of the MinHash dedup index, same replay/chain
semantics with hamming distance in place of estimated Jaccard."""

import pytest
from pyspark.sql import functions as F

from ferramenta_etl_spark.pipeline.media_index import (
    fingerprint_dedup_incremental,
    load_fp_index,
)


def _fp_df(spark, rows):
    def signed(v):
        return v - (1 << 64) if v >= (1 << 63) else v

    return spark.createDataFrame(
        [(i, None if v is None else signed(v)) for i, v in rows],
        "doc_id long, fp long",
    )


def _flip(fp, *bits):
    for b in bits:
        fp ^= 1 << b
    return fp


BASE = 0xDEADBEEFCAFE1234


def test_bootstrap_intra_batch_and_replay(spark, tmp_path):
    """First batch: near-identical fingerprints collapse to the min-id
    canonical; a rerun admits the same set and appends zero index rows;
    null fingerprints are admitted but never indexed."""
    idx = str(tmp_path / "fpidx")
    batch = _fp_df(
        spark,
        [
            (1, BASE),
            (2, _flip(BASE, 3)),        # 1 bit from doc 1 -> drops into 1
            (3, _flip(BASE, 40, 41, 42, 43)),  # 4 bits: beyond max_hamming=3
            (4, None),                  # malformed: admitted, not indexed
        ],
    )
    admitted = fingerprint_dedup_incremental(spark, batch, idx)
    assert {r.doc_id for r in admitted.collect()} == {1, 3, 4}
    n_index = load_fp_index(spark, idx).count()
    assert n_index == 3 * 4  # three fingerprinted docs x 4 blocks
    # replay: same admission, zero new index rows
    again = fingerprint_dedup_incremental(spark, batch, idx)
    assert {r.doc_id for r in again.collect()} == {1, 3, 4}
    assert load_fp_index(spark, idx).count() == n_index
    # dropped doc 2 is indexed with its representative (the bridge row)
    canon = {
        r.doc_id: r.canonical_id
        for r in load_fp_index(spark, idx).select(
            "doc_id", "canonical_id"
        ).distinct().collect()
    }
    assert canon == {1: 1, 2: 1, 3: 3}


def test_cross_batch_drop_and_chain_bridge(spark, tmp_path):
    """Batch 2 items near an indexed item drop into its cluster —
    INCLUDING through a bridge: C matches only the DROPPED chain member
    B, and still resolves to A's cluster via B's indexed bridge row."""
    idx = str(tmp_path / "fpidx2")
    b_fp = _flip(BASE, 7, 8)  # B: 2 bits from A
    fingerprint_dedup_incremental(
        spark, _fp_df(spark, [(1, BASE), (2, b_fp)]), idx
    )  # A=1 admitted, B=2 drops into 1

    # C: 2 bits from B (bits 20, 21), 4 bits from A -> matches ONLY B
    c_fp = _flip(b_fp, 20, 21)
    batch2 = _fp_df(spark, [(10, c_fp), (11, _flip(BASE, 50, 51, 52, 53))])
    admitted = fingerprint_dedup_incremental(spark, batch2, idx)
    assert {r.doc_id for r in admitted.collect()} == {11}
    canon = {
        r.doc_id: r.canonical_id
        for r in load_fp_index(spark, idx).select(
            "doc_id", "canonical_id"
        ).distinct().collect()
    }
    assert canon[10] == 1  # resolved through B's bridge to A's cluster
    assert canon[11] == 11


def test_anchor_domination_over_smaller_batch_id(spark, tmp_path):
    """A batch doc with a SMALLER id than the indexed anchor still
    drops into the anchor's cluster — admission never revokes."""
    idx = str(tmp_path / "fpidx3")
    fingerprint_dedup_incremental(spark, _fp_df(spark, [(100, BASE)]), idx)
    batch2 = _fp_df(spark, [(5, _flip(BASE, 2))])  # id 5 < anchor 100
    admitted = fingerprint_dedup_incremental(spark, batch2, idx)
    assert admitted.count() == 0
    canon = {
        r.doc_id: r.canonical_id
        for r in load_fp_index(spark, idx).select(
            "doc_id", "canonical_id"
        ).distinct().collect()
    }
    assert canon[5] == 100


def test_meta_mismatch_and_recall_guard(spark, tmp_path):
    idx = str(tmp_path / "fpidx4")
    fingerprint_dedup_incremental(spark, _fp_df(spark, [(1, BASE)]), idx)
    with pytest.raises(ValueError, match="pigeonhole"):
        fingerprint_dedup_incremental(
            spark, _fp_df(spark, [(2, BASE)]), idx, max_hamming=4, n_blocks=4
        )
    with pytest.raises(Exception, match="meta|max_hamming|n_blocks"):
        fingerprint_dedup_incremental(
            spark, _fp_df(spark, [(2, BASE)]), idx, max_hamming=2
        )


def test_end_to_end_with_real_image_fingerprints(spark, tmp_path):
    """Composed with dhash_images on raw fixtures: batch 1 admits the
    images; batch 2 re-submits brightness-shifted clones (dropped) plus
    genuinely novel noise images (admitted)."""
    import numpy as np

    from ferramenta_etl_spark.operators.multimodal import dhash_images

    idx = str(tmp_path / "fpidx5")
    rng = np.random.default_rng(5)
    imgs = {
        d: rng.integers(0, 200, (24, 32, 3), dtype=np.uint8) for d in range(4)
    }
    b1 = spark.createDataFrame(
        [(d, a.tobytes(), 32, 24) for d, a in imgs.items()],
        "doc_id long, media binary, width long, height long",
    )
    admitted1 = fingerprint_dedup_incremental(spark, dhash_images(b1), idx)
    assert admitted1.count() == 4  # random images: all novel

    clones = {
        100 + d: np.clip(a.astype(np.int16) + 4, 0, 255).astype(np.uint8)
        for d, a in imgs.items()
    }
    novel = {
        200 + d: rng.integers(0, 200, (24, 32, 3), dtype=np.uint8)
        for d in range(2)
    }
    b2 = spark.createDataFrame(
        [(d, a.tobytes(), 32, 24) for d, a in {**clones, **novel}.items()],
        "doc_id long, media binary, width long, height long",
    )
    admitted2 = fingerprint_dedup_incremental(spark, dhash_images(b2), idx)
    got = {r.doc_id for r in admitted2.collect()}
    assert got == set(novel), f"expected only novel images admitted, got {got}"


def test_cap_bounds_join_but_not_index_coverage(spark, tmp_path):
    """max_block_size caps the batch's JOIN fan-out only: every
    fingerprinted batch row still lands in the index (bridge coverage
    intact), and a one-family batch admits at least its canonical
    instead of exploding quadratically."""
    idx = str(tmp_path / "fpidx6")
    family = _fp_df(spark, [(i, BASE) for i in range(50)])  # identical fps
    admitted = fingerprint_dedup_incremental(
        spark, family, idx, max_block_size=5
    )
    # with identical fingerprints the capped blocks still pair enough
    # rows per block to collapse SOME of the family; the invariant that
    # matters: at least one survivor, and EVERY row indexed
    n_admitted = admitted.count()
    assert 1 <= n_admitted <= 50
    assert load_fp_index(spark, idx).select("doc_id").distinct().count() == 50


def test_min_anchor_wins_when_bridging_two_clusters(spark, tmp_path):
    """A batch item within range of TWO separately-indexed clusters
    resolves to the MINIMUM anchor (deterministic; incremental
    admission cannot merge already-admitted clusters) — pins the
    min-vs-max choice in the anchor-domination aggregate, which a
    single-anchor test cannot distinguish."""
    idx = str(tmp_path / "fpidx7")
    far = _flip(BASE, 60, 61, 62, 63)  # 4 bits from BASE: a 2nd cluster
    fingerprint_dedup_incremental(
        spark, _fp_df(spark, [(7, BASE), (9, far)]), idx
    )  # both admitted (distance 4 > max_hamming 3)
    # bridger: 2 bits from BASE (60,61 flipped back... construct: flip
    # 60,61 only -> distance 2 from BASE and distance 2 from far)
    bridge = _flip(BASE, 60, 61)
    admitted = fingerprint_dedup_incremental(
        spark, _fp_df(spark, [(50, bridge)]), idx
    )
    assert admitted.count() == 0
    canon = {
        r.doc_id: r.canonical_id
        for r in load_fp_index(spark, idx)
        .select("doc_id", "canonical_id")
        .distinct()
        .collect()
    }
    assert canon[50] == 7  # min(7, 9), not max
