"""Verification channels for every bench headline row (VERDICT r11 #2).

The driver's correctness gate hash-checks exactly the 50 registered
queries; bench rows that are engine VARIANTS (bucketed mirrors, Arrow
scorers, approximate ANN serves, train-once composites) ride outside
that window. This module is the code twin of README's
"Benchmark verification channels" table: a mechanical completeness
check that no bench row is channel-less, plus the fixture-grounded
tests the r11 verdict called out as missing — recall floors for the
approximate embedding serves measured against the ORACLE-GATED exact
top-k, a from-scratch Okapi check of the bm25_topk composite's actual
served scores, and independent-build hash-equality for the curation
and seq_packing composites.
"""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from ferramenta_etl_spark.sources import load_table

# Every bench HEADLINE row must appear in exactly one of:
# - the 50-query oracle gate (checked mechanically against ORACLES), or
# - this map: row -> the pytest/SCALING channel that verifies it.
# A row in neither fails test_every_bench_row_has_a_channel, so a new
# bench row cannot land unverified (the README table mirrors this map).
VARIANT_CHANNELS = {
    "flagship_bucketed": "tests/test_bucketing.py::"
    "test_flagship_bucketed_same_result_fewer_exchanges (twin equality)",
    "flagship_partitioned": "tests/test_partitioned.py::"
    "test_flagship_over_partitioned_mirror_prunes_and_matches (twin"
    " equality + PartitionFilters plan contract + pruned-dir count)",
    "dedup_minhash_fast": "tests/test_operators.py::"
    "test_minhash_lsh_approximates_exact_jaccard (xxhash family vs exact"
    " Jaccard, recall >= 0.8 on the fixture)",
    "embedding_cosine_arrow": "tests/test_audio_video.py::"
    "test_cosine_topk_arrow_matches_sql_fold (twin equality to the gated"
    " exact top-k's operator)",
    "embedding_quantized_topk": "tests/test_quantize.py::"
    "test_quantized_topk_recall_vs_exact (recall >= 0.9 vs exact)",
    "embedding_ann_lsh": "tests/test_bench_channels.py::"
    "test_lsh_ann_recall_floor_at_bench_parameters",
    "embedding_truncated_topk": "tests/test_bench_channels.py::"
    "test_truncated_topk_recall_floor_at_bench_parameters",
    "bm25_topk": "tests/test_bench_channels.py::"
    "test_bm25_composite_serves_reference_scores",
    "curation": "tests/test_bench_channels.py::"
    "test_composite_independent_builds_agree[curation]",
    "seq_packing": "tests/test_bench_channels.py::"
    "test_composite_independent_builds_agree[seq_packing]",
    "media_decode_jpeg": "tests/test_jpeg.py (byte-exact decode of every"
    " T.81 fixture class) + tests/test_containers.py routing",
    "media_probe_mp4": "tests/test_mp4.py (box-tree round-trips, five"
    " corruption classes) + probe_videos routing",
    "media_frame_schedule": "tests/test_mp4.py::"
    "test_keyframe_schedule_lands_on_keyframes (+ fixture-spine sync-"
    "sample containment, corrupt-row nulls)",
    "join_skewed_plain_x20": "tests/test_skew.py::"
    "test_salted_join_equals_plain_join (the A/B pair's control arm)",
    "join_skewed_salted_x20": "tests/test_skew.py::"
    "test_salted_join_equals_plain_join (twin equality)",
    # These two SHADOW oracle-gated registry names in the bench dict
    # (add_bench_composites overrides them with replicated-spine
    # variants for stability, r12); the gate verifies the operator,
    # these twin tests verify the replication wrappers preserve it.
    "bpe_tokenize": "tests/test_bench_channels.py::"
    "test_bpe_composite_replicas_match_unreplicated_operator",
    "events_capped_sessions": "tests/test_bench_channels.py::"
    "test_capped_sessions_composite_replicas_match_operator",
    "dsir_score": "tests/test_bench_channels.py::"
    "test_composite_independent_builds_agree[dsir_score] (+ every fit "
    "weight pinned vs a pure-Python oracle, tests/test_dsir.py)",
}


def test_every_bench_row_has_a_channel():
    import bench
    from ferramenta_etl_spark.plans import all_oracles
    from ferramenta_etl_spark.plans.composites import add_bench_composites

    gated = set(all_oracles())
    # a composite that re-registers a GATED name shadows it in the
    # bench dict — the oracle then checks the registry query while
    # bench times the composite, so the name's gate membership no
    # longer verifies the timed code (review r12): shadowed names need
    # their own variant channel like any other composite
    comp: dict = {}
    add_bench_composites(comp)
    shadowed = set(comp) & gated
    unverified = [
        n for n in bench.HEADLINE
        if (n not in gated or n in shadowed) and n not in VARIANT_CHANNELS
    ]
    assert not unverified, (
        f"bench rows with no verification channel: {unverified} — add a "
        "CORRECTNESS oracle, a twin-equality/recall test, and a "
        "VARIANT_CHANNELS entry"
    )
    stale = [n for n in VARIANT_CHANNELS if n not in bench.HEADLINE]
    assert not stale, f"VARIANT_CHANNELS lists retired bench rows: {stale}"


def _fixture_split(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    corpus = emb.filter(F.col("vec_id") >= 10).select("vec_id", "embedding")
    return corpus, queries


def test_lsh_ann_recall_floor_at_bench_parameters(spark, sf_dir):
    """The embedding_ann_lsh bench row's EXACT configuration (16 planes,
    4 bands, k=5) against the oracle-gated exact top-k on the fixture.
    The fixture's embeddings are near-random (no planted clusters), so
    sparse LSH candidates cap recall well below the >=0.9 the operator
    reaches on clustered corpora (tests/test_ann_recall.py::
    test_srp_lsh_recall_on_clustered_corpus — the semantic proof); this
    floor pins what the BENCH ROW actually serves, so a plane/band or
    bucketing regression in the benched configuration is caught."""
    from ferramenta_etl_spark.operators.similarity import (
        cosine_topk,
        lsh_ann_topk,
    )

    corpus, queries = _fixture_split(spark, sf_dir)
    exact = {
        (r.query_id, r.vec_id) for r in cosine_topk(corpus, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in lsh_ann_topk(
            corpus, queries, k=5, n_planes=16, n_bands=4, dim=64
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.40, f"bench-config LSH recall {recall:.2f} (was 0.48)"
    # soundness: every served pair must be a real corpus/query pairing
    # with rank <= k (structural — the serve can't invent ids)
    assert {q for q, _ in approx} <= {q for q, _ in exact}


def test_truncated_topk_recall_floor_at_bench_parameters(spark, sf_dir):
    """embedding_truncated_topk's bench configuration (prefix 16 of 64,
    shortlist 200) vs the gated exact top-k. The prefix of the fixture's
    embeddings is informative enough for >=0.85; the synthetic
    decaying-spectrum test (tests/test_audio_video.py) proves the
    mechanism, this pins the benched configuration."""
    from ferramenta_etl_spark.operators.similarity import (
        cosine_topk,
        truncated_prefilter_topk,
    )

    corpus, queries = _fixture_split(spark, sf_dir)
    exact = {
        (r.query_id, r.vec_id) for r in cosine_topk(corpus, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in truncated_prefilter_topk(
            corpus, queries, k=5, prefilter_dim=16, shortlist=200
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.85, f"bench-config truncated recall {recall:.2f} (was 0.90)"


def _py_toks(text):
    return [t for t in text.lower().split(" ") if t != ""]


def test_bm25_composite_serves_reference_scores(spark, sf_dir):
    """The bm25_topk BENCH composite end-to-end (index build + the same
    mid-frequency term derivation + serve) against a from-scratch Okapi
    BM25 computed in pure Python over the same fixture: served scores
    match 1e-9 and every served doc belongs to the reference's true
    top-k score band. This is the hash-equality channel the r11 verdict
    asked for — tests/test_retrieval.py pins the OPERATOR on synthetic
    corpora; this pins the composite actually timed by bench."""
    from ferramenta_etl_spark.plans.composites import add_bench_composites

    qs = {}
    add_bench_composites(qs)
    served = qs["bm25_topk"](spark, sf_dir).collect()
    assert served, "bm25_topk composite returned no rows"

    docs = {
        r.doc_id: (r.text or "")
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    n = len(docs)
    tfs = {i: Counter(_py_toks(t)) for i, t in docs.items()}
    dls = {i: sum(c.values()) for i, c in tfs.items()}
    avgdl = sum(dls.values()) / n
    df = Counter()
    for c in tfs.values():
        df.update(set(c))

    # reproduce the composite's term derivation: middle 8 of the
    # frequency-ranked (count desc, term asc) top-64 vocabulary — but
    # note the composite ranks by POSTINGS-ROW count per term, which is
    # document frequency (one posting per (term, doc))
    ranked = [t for t, _ in sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))][
        :64
    ]
    mid = len(ranked) // 2
    terms = ranked[max(0, mid - 4): mid + 4]
    k1, b = 1.2, 0.75

    def ref_scores(term):
        idf = math.log(1.0 + (n - df[term] + 0.5) / (df[term] + 0.5))
        out = {}
        for i, c in tfs.items():
            tf = c[term]
            if tf:
                out[i] = idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * dls[i] / avgdl)
                )
        return out

    by_query = {}
    for r in served:
        by_query.setdefault(r.query_id, []).append(r)
    assert set(by_query) == set(range(len(terms)))
    for qid, rows in by_query.items():
        ref = ref_scores(terms[qid])
        kth = sorted(ref.values(), reverse=True)[: 10][-1]
        for r in rows:
            assert r.doc_id in ref, (terms[qid], r.doc_id)
            assert r.score == pytest.approx(ref[r.doc_id], abs=1e-9)
            # every served doc sits in the true top-k score band
            assert r.score >= kth - 1e-9


def _content_hash(df):
    """Order-insensitive content fingerprint of a DataFrame (casts all
    columns to string; arrays render deterministically)."""
    row = (
        df.select(
            F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in df.columns]))
            .alias("h")
        )
        .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("decimal(38,0)")))
        .first()
    )
    return (df.count(), str(row[0]))


@pytest.mark.parametrize("name", ["curation", "seq_packing", "dsir_score"])
def test_composite_independent_builds_agree(spark, sf_dir, tmp_path, name):
    """curation / seq_packing hash-equality: two INDEPENDENT plan builds
    (fresh symlinked dataset paths, so the plan cache and table memo
    cannot serve the first build's plan or its persisted intermediates)
    produce identical content. Stage-level correctness is pytest-pinned
    per operator (tests/test_curation.py, tests/test_packing.py); this
    proves the bench composite itself is a deterministic, reproducible
    computation rather than an unverifiable timing shell."""
    from ferramenta_etl_spark.plans.composites import add_bench_composites

    qs = {}
    add_bench_composites(qs)
    hashes = []
    for i in (1, 2):
        link = tmp_path / f"sf_{name}_{i}"
        link.symlink_to(sf_dir)
        hashes.append(_content_hash(qs[name](spark, str(link))))
    assert hashes[0] == hashes[1]
    assert hashes[0][0] > 0


def test_bpe_composite_replicas_match_unreplicated_operator(spark, sf_dir):
    """The bpe_tokenize BENCH composite (16x-replicated checkpointed
    spine) is the gated operator run 16 times over: every replica's
    token list equals the unreplicated operator's output for its base
    doc under the same trained merges, and the row count is exactly
    16x. A replication-wrapper regression (offset collision, dropped
    rows, wrong merges) breaks this while leaving the gate green."""
    from ferramenta_etl_spark.operators.bpe import (
        bpe_tokenize,
        train_bpe_from_docs,
    )
    from ferramenta_etl_spark.plans.composites import add_bench_composites

    qs = {}
    add_bench_composites(qs)
    got = qs["bpe_tokenize"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    merges = train_bpe_from_docs(docs, 15)
    base = {
        r.doc_id: list(r.bpe_tokens)
        for r in bpe_tokenize(docs, merges)
        .select("doc_id", "bpe_tokens")
        .collect()
    }
    assert len(got) == 16 * len(base)
    for r in got:
        assert list(r.bpe_tokens) == base[r.doc_id // 16]


def test_capped_sessions_composite_replicas_match_operator(spark, sf_dir):
    """The events_capped_sessions BENCH composite (4x disjoint-user
    replicated spine) yields exactly four offset copies of the gated
    operator's sessions: canonicalizing user_id modulo the replica
    offset reproduces the base result four times over."""
    from collections import Counter

    from ferramenta_etl_spark.operators.sessionize import capped_sessions
    from ferramenta_etl_spark.plans.composites import add_bench_composites

    qs = {}
    add_bench_composites(qs)
    got = qs["events_capped_sessions"](spark, sf_dir).collect()
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id", "ts", "event_id", "value")
    )
    base = capped_sessions(
        ev, gap="24 hours", max_duration="2 hours", tiebreak=("event_id",)
    ).collect()
    cols = base[0].__fields__
    assert "user_id" in cols

    def canon(rows, mod):
        return Counter(
            tuple(
                (v % 10_000_000_000 if c == "user_id" and mod else v)
                for c, v in zip(cols, row)
            )
            for row in rows
        )

    want = canon(base, mod=False)
    want = Counter({k: v * 4 for k, v in want.items()})
    assert canon(got, mod=True) == want
