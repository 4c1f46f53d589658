"""Incremental near-dup dedup against the persisted signature index
(pipeline/dedup_index.py): cross-batch first-arrived-wins, intra-batch
min-id canonicals, idempotent reruns, and agreement with the all-corpus
batch pipeline on a first-arrived == min-id corpus."""

import pytest
from pyspark.sql import functions as F

from ferramenta_etl_spark.operators import dedup as D
from ferramenta_etl_spark.pipeline.dedup_index import (
    dedup_incremental,
    index_exists,
    load_index,
)

# 20-token docs where near-dups differ only in the LAST token: one
# changed final token perturbs exactly one of 18 shingles (shingle-set
# Jaccard ~= 0.94), so banded LSH collides with near-certainty and the
# deterministic MinHash estimate clears the 0.5 threshold with margin.
# (A mid-doc substitution — Jaccard ~0.71, per-pair band-collision
# probability ~0.90 — was measured to MISS for specific pairs.)
_BASE = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi rho sigma tau upsilon"
)
_DOCS1 = [
    (1, _BASE),
    (2, _BASE.replace("tau upsilon", "tau ypsilon")),  # near-dup of 1
    (3, "one two three four five six seven eight nine ten "
        "eleven twelve thirteen fourteen fifteen sixteen seventeen "
        "eighteen nineteen twenty"),
]
_DOCS2 = [
    (10, _BASE.replace("tau upsilon", "tau apsilon")),  # near-dup of indexed 1
    (11, "completely different words with no overlap whatsoever at all "
         "here now today tomorrow yesterday never always sometimes often "
         "rarely occasionally"),
    (12, "red orange yellow green blue indigo violet pink brown black "
         "white gray silver gold bronze copper teal maroon navy olive"),
    (13, "red orange yellow green blue indigo violet pink brown black "
         "white gray silver gold bronze copper teal maroon navy olivine"),
]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def index_path(tmp_path):
    return str(tmp_path / "minhash_index")


def test_first_batch_admits_canonicals_and_builds_index(spark, index_path):
    out = dedup_incremental(
        spark, _docs(spark, _DOCS1), index_path, threshold=0.5
    )
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    # 1/2 are an intra-batch near-dup component -> min id 1 survives
    assert ids == {1, 3}
    assert index_exists(spark, index_path)
    idx = load_index(spark, index_path)
    # one row per (SIGNED doc, band) — drops are indexed too (flagged by
    # canonical_id != doc_id), the replay-determinism bridge rows
    assert idx.count() == 3 * 8
    assert set(idx.columns) >= {"doc_id", "sig", "band", "bhash", "canonical_id"}
    canon = {
        r.doc_id: r.canonical_id
        for r in idx.select("doc_id", "canonical_id").distinct().collect()
    }
    assert canon == {1: 1, 2: 1, 3: 3}  # 2 collapsed into 1's cluster


def test_second_batch_defers_to_index_and_dedups_itself(spark, index_path):
    dedup_incremental(spark, _docs(spark, _DOCS1), index_path, threshold=0.5)
    out = dedup_incremental(
        spark, _docs(spark, _DOCS2), index_path, threshold=0.5
    )
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    # 10 near-dups indexed doc 1 -> dropped (first-arrived batch wins);
    # 12/13 intra-batch near-dups -> 12 survives; 11 unique
    assert ids == {11, 12}
    idx = load_index(spark, index_path)
    # every signed doc is indexed; only the admitted ones are canonical
    idx_ids = {r.doc_id for r in idx.select("doc_id").distinct().collect()}
    assert idx_ids == {1, 2, 3, 10, 11, 12, 13}
    canonical_ids = {
        r.doc_id
        for r in idx.filter(F.col("canonical_id") == F.col("doc_id"))
        .select("doc_id").distinct().collect()
    }
    assert canonical_ids == {1, 3, 11, 12}


def test_rerun_is_idempotent(spark, index_path):
    dedup_incremental(spark, _docs(spark, _DOCS1), index_path, threshold=0.5)
    dedup_incremental(spark, _docs(spark, _DOCS2), index_path, threshold=0.5)
    n_index = load_index(spark, index_path).count()
    again = dedup_incremental(
        spark, _docs(spark, _DOCS2), index_path, threshold=0.5
    )
    ids = {r.doc_id for r in again.select("doc_id").collect()}
    # same survivors computed, zero new index rows
    assert ids == {11, 12}
    assert load_index(spark, index_path).count() == n_index


def test_incremental_agrees_with_all_corpus_batch(spark, index_path):
    """On THIS corpus — arrival order matches id order AND every
    near-dup component is a clique — incremental first-arrived-wins
    equals the all-corpus min-id canonical rule. (Not a theorem in
    general: chain components split across batches can diverge — the
    property test asserts the invariants that DO always hold.)"""
    all_docs = _docs(spark, _DOCS1 + _DOCS2)
    pairs = D.minhash_lsh_pairs(all_docs, threshold=0.5)
    batch_survivors = {
        r.doc_id
        for r in D.dedup_keep_canonical(all_docs, pairs).select("doc_id").collect()
    }
    a = dedup_incremental(spark, _docs(spark, _DOCS1), index_path, threshold=0.5)
    b = dedup_incremental(spark, _docs(spark, _DOCS2), index_path, threshold=0.5)
    incr_survivors = {r.doc_id for r in a.select("doc_id").collect()} | {
        r.doc_id for r in b.select("doc_id").collect()
    }
    assert incr_survivors == batch_survivors


def test_index_layout_is_band_partitioned(spark, index_path):
    import os

    dedup_incremental(spark, _docs(spark, _DOCS1), index_path, threshold=0.5)
    parts = [p for p in os.listdir(index_path) if p.startswith("band=")]
    assert len(parts) == 8  # hive partitioning: probes prune to colliding bands


def test_short_and_empty_docs_are_admitted_not_lost(spark, index_path):
    """Docs below shingle_k tokens (incl. empty text) have no signature
    and cannot near-dup through the index — they must pass through, not
    silently disappear from the admitted set."""
    batch = _docs(
        spark,
        _DOCS1 + [(90, "tiny"), (91, ""), (92, "two tokens")],
    )
    out = dedup_incremental(spark, batch, index_path, threshold=0.5)
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    assert {90, 91, 92} <= ids  # short docs admitted
    assert ids == {1, 3, 90, 91, 92}
    # and they are NOT in the index (nothing to probe against)
    idx_ids = {
        r.doc_id
        for r in load_index(spark, index_path).select("doc_id").distinct().collect()
    }
    assert idx_ids == {1, 2, 3}


def test_chain_component_replay_is_deterministic(spark, index_path):
    """ADVICE r03 (medium): a chain component A~B, B~C, A!~C in one
    batch must REPLAY to the same admitted set with zero index appends.
    Before layout 2 only survivors were indexed, so a replayed C lost
    its bridge B (never indexed) and was wrongly re-admitted — the
    admitted corpus depended on whether a retry happened."""
    base = [f"tok{i}" for i in range(20)]
    a = " ".join(base)
    b = " ".join(base[:-2] + ["zz1", "zz2"])
    c = " ".join(["qq1", "qq2"] + base[2:-2] + ["zz1", "zz2"])
    docs = [(1, a), (2, b), (3, c)]
    # fixture self-check: the detected pair graph is exactly the chain
    # (shingle Jaccard: A-B 16/20, B-C 16/20, A-C 14/22 vs threshold 0.7)
    pairs = {
        (r.doc_id_a, r.doc_id_b)
        for r in D.minhash_lsh_pairs(_docs(spark, docs), threshold=0.7).collect()
    }
    assert pairs == {(1, 2), (2, 3)}

    out1 = dedup_incremental(spark, _docs(spark, docs), index_path, threshold=0.7)
    assert {r.doc_id for r in out1.select("doc_id").collect()} == {1}
    n_index = load_index(spark, index_path).count()
    assert n_index == 3 * 8  # all three signed docs indexed

    out2 = dedup_incremental(spark, _docs(spark, docs), index_path, threshold=0.7)
    # replay: B drops via A's canonical rows, C via B's BRIDGE rows
    # (canonical_id=1 != 3); A survives — its neighbors' rows point back
    # at it (canonical_id == probing id is never a drop witness)
    assert {r.doc_id for r in out2.select("doc_id").collect()} == {1}
    assert load_index(spark, index_path).count() == n_index  # zero appends


def test_cross_batch_drop_is_transitive_through_bridges(spark, index_path):
    """A later doc that near-dups ONLY a dropped chain member joins that
    member's cluster and drops — matching the all-corpus connected-
    components semantics (layout 1 admitted it, silently diverging)."""
    base = [f"tok{i}" for i in range(20)]
    a = " ".join(base)
    b = " ".join(base[:-2] + ["zz1", "zz2"])
    c = " ".join(["qq1", "qq2"] + base[2:-2] + ["zz1", "zz2"])
    out1 = dedup_incremental(
        spark, _docs(spark, [(1, a), (2, b)]), index_path, threshold=0.7
    )
    assert {r.doc_id for r in out1.select("doc_id").collect()} == {1}
    # batch 2: C pairs with dropped B only (A-C Jaccard is sub-threshold)
    out2 = dedup_incremental(
        spark, _docs(spark, [(3, c)]), index_path, threshold=0.7
    )
    assert out2.count() == 0  # C resolves through B's bridge to cluster 1


def test_same_batch_cross_drop_chain_replays_identically(spark, index_path):
    """ADVICE r04 (high): index={A}; one batch {B~A, C~B, C!~A}. Intra
    pairs generated only over cross-batch SURVIVORS admitted C on the
    first run (its only near-dup B was cross-dropped before the
    self-join), but a replay found B's bridge rows (canonical A) and
    dropped C — first-run admission and replay disagreed, and C sat in
    the index as a canonical that reruns kept dropping. Pairs over the
    whole banded batch + cross-drop edges in one connected-components
    pass make both runs drop the full chain into A's cluster."""
    base = [f"tok{i}" for i in range(20)]
    a = " ".join(base)
    b = " ".join(base[:-2] + ["zz1", "zz2"])
    c = " ".join(["qq1", "qq2"] + base[2:-2] + ["zz1", "zz2"])
    out0 = dedup_incremental(spark, _docs(spark, [(1, a)]), index_path, threshold=0.7)
    assert {r.doc_id for r in out0.select("doc_id").collect()} == {1}

    out1 = dedup_incremental(
        spark, _docs(spark, [(2, b), (3, c)]), index_path, threshold=0.7
    )
    # B drops into indexed 1's cluster; C follows B transitively even
    # though C itself is sub-threshold against A
    assert out1.count() == 0
    idx = load_index(spark, index_path)
    n_index = idx.count()
    canon = {
        r.doc_id: r.canonical_id
        for r in idx.select("doc_id", "canonical_id").distinct().collect()
    }
    assert canon == {1: 1, 2: 1, 3: 1}

    out2 = dedup_incremental(
        spark, _docs(spark, [(2, b), (3, c)]), index_path, threshold=0.7
    )
    assert out2.count() == 0  # replay admits the same (empty) set
    assert load_index(spark, index_path).count() == n_index  # zero appends


def test_anchor_dominates_smaller_batch_ids(spark, index_path):
    """An indexed cluster representative can never be revoked: a batch
    doc with a SMALLER id than the anchor it near-dups still drops into
    the anchor's cluster (min-anchor labeling, not min-vertex)."""
    base = [f"tok{i}" for i in range(20)]
    a = " ".join(base)
    b = " ".join(base[:-2] + ["zz1", "zz2"])
    out0 = dedup_incremental(
        spark, _docs(spark, [(50, a)]), index_path, threshold=0.7
    )
    assert {r.doc_id for r in out0.select("doc_id").collect()} == {50}
    out1 = dedup_incremental(
        spark, _docs(spark, [(7, b)]), index_path, threshold=0.7
    )
    assert out1.count() == 0  # 7 < 50 but 50 arrived first
    canon = {
        r.doc_id: r.canonical_id
        for r in load_index(spark, index_path)
        .select("doc_id", "canonical_id").distinct().collect()
    }
    assert canon == {50: 50, 7: 50}


def test_mismatched_sketch_params_rejected(spark, index_path):
    """The index stores its sketch parameters; probing or appending with
    different num_hashes/bands/shingle_k never collides (silent near-dup
    admission) and would corrupt the layout — it must fail fast."""
    dedup_incremental(spark, _docs(spark, _DOCS1), index_path, threshold=0.5)
    with pytest.raises(ValueError, match="sketch parameters"):
        dedup_incremental(
            spark, _docs(spark, _DOCS2), index_path,
            num_hashes=64, bands=16, threshold=0.5,
        )
    # matching parameters still work after the rejected attempt
    out = dedup_incremental(spark, _docs(spark, _DOCS2), index_path, threshold=0.5)
    assert {r.doc_id for r in out.select("doc_id").collect()} == {11, 12}
