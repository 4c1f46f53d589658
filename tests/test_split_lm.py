"""Leakage-safe splitting (cluster-atomic train/val/test) and the
bigram-LM perplexity quality scorer, each pinned against an independent
reference: a pure-Python union-find + hash assignment for the split,
and a from-scratch Python bigram LM for the cross-entropy numbers."""

import math

import pytest

from ferramenta_etl_spark.operators.lm import (
    BOS,
    perplexity_filter,
    score_cross_entropy,
    train_bigram_lm,
)
from ferramenta_etl_spark.operators.split import leakage_safe_split, split_report

WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _docs(spark, n=3000):
    return spark.range(n).selectExpr("id AS doc_id")


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_id_a long, doc_id_b long")


def test_split_is_cluster_atomic(spark):
    """Docs connected through ANY chain of near-dup pairs share a
    split — including transitive chains the pair list never states
    directly (0-1, 1-2, 2-3 => all four together)."""
    from pyspark.sql import functions as F

    docs = _docs(spark, 200)
    pairs = _pairs(
        spark, [(0, 1), (1, 2), (2, 3), (10, 50), (50, 11), (99, 100)]
    )
    out = leakage_safe_split(docs, pairs, WEIGHTS, seed=7)
    got = {r.doc_id: r.split for r in out.collect()}
    assert len(got) == 200
    for cluster in ([0, 1, 2, 3], [10, 11, 50], [99, 100]):
        assert len({got[d] for d in cluster}) == 1, cluster
    # every split value is a weight key
    assert set(got.values()) <= set(WEIGHTS)
    # report adds to 1
    rep = {r.split: r.frac for r in split_report(out).collect()}
    assert abs(sum(rep.values()) - 1.0) < 0.01


def test_split_deterministic_and_seed_sensitive(spark):
    docs = _docs(spark, 500)
    pairs = _pairs(spark, [(1, 2), (3, 4)])
    a = {r.doc_id: r.split
         for r in leakage_safe_split(docs, pairs, WEIGHTS, seed=1).collect()}
    b = {r.doc_id: r.split
         for r in leakage_safe_split(
             docs.repartition(13), pairs, WEIGHTS, seed=1).collect()}
    assert a == b  # partitioning-independent determinism
    c = {r.doc_id: r.split
         for r in leakage_safe_split(docs, pairs, WEIGHTS, seed=2).collect()}
    assert a != c  # a fresh seed reshuffles


def test_split_ratios_approximate_weights(spark):
    out = leakage_safe_split(_docs(spark, 6000), None, WEIGHTS, seed=3)
    rep = {r.split: r.frac for r in split_report(out).collect()}
    for name, w in WEIGHTS.items():
        assert abs(rep[name] - w) < 0.03, (name, rep)


def test_split_weight_validation(spark):
    docs = _docs(spark, 10)
    with pytest.raises(ValueError, match="non-empty"):
        leakage_safe_split(docs, None, {})
    with pytest.raises(ValueError, match="positive"):
        leakage_safe_split(docs, None, {"train": 1.0, "test": 0.0})


# ------------------------------------------------------------- LM --


def _py_bigrams(text):
    toks = [t for t in text.lower().split(" ") if t]
    toks = [BOS] + toks
    return list(zip(toks[:-1], toks[1:]))


def _py_lm(texts, k):
    from collections import Counter

    bg = Counter()
    ctx = Counter()
    vocab = set()
    for t in texts:
        for p, q in _py_bigrams(t):
            bg[(p, q)] += 1
            ctx[p] += 1
            vocab.add(q)
    return bg, ctx, len(vocab)


def _py_score(text, bg, ctx, v, k):
    lps = []
    for p, q in _py_bigrams(text):
        if p in ctx:
            lps.append(math.log2((bg.get((p, q), 0) + k) / (ctx[p] + k * v)))
        else:
            lps.append(-math.log2(v))
    if not lps:
        return None
    return -sum(lps) / len(lps)


CORPUS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "the cat ate the fish"),
    (3, "a dog and a cat"),
    (4, "qwz zzq xqx qqq zxz qzq"),  # gibberish: must score WORSE
    (5, ""),  # untokenizable
]


def test_bigram_lm_matches_python_oracle(spark):
    """Train on the corpus, score the corpus: every doc's cross-entropy
    equals a from-scratch Python bigram LM to 1e-9, including the
    unseen-context fallback path scored on held-out text."""
    k = 0.5
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    lm = train_bigram_lm(df, k=k)
    bg, ctx, v = _py_lm([t for _, t in CORPUS], k)
    assert lm.v == v
    got = {
        r.doc_id: (r.n_tokens, r.cross_entropy_bits)
        for r in score_cross_entropy(df, lm).collect()
    }
    for did, text in CORPUS:
        want = _py_score(text, bg, ctx, v, k)
        if want is None:
            assert did not in got  # empty docs emit no bigrams
            continue
        assert got[did][0] == len(_py_bigrams(text))
        assert got[did][1] == pytest.approx(want, abs=1e-9), did
    # held-out doc with tokens the LM never saw (unknown-context branch)
    held = spark.createDataFrame(
        [(99, "the cat zzz unknownword sat")], "doc_id long, text string"
    )
    got99 = score_cross_entropy(held, lm).collect()[0]
    want99 = _py_score("the cat zzz unknownword sat", bg, ctx, v, k)
    assert got99.cross_entropy_bits == pytest.approx(want99, abs=1e-9)
    assert got99.perplexity == pytest.approx(2 ** want99, rel=1e-9)


def test_stable_micros_partition_invariant_and_close_to_float(spark):
    """r13 (the text_lang_id gate arm): stable_micros quantizes each
    log2 term to a 1e-4-bit grid and sums INTEGERS, so the score is
    bit-identical under any partitioning (a float sum's ulp is
    partition-order dependent) and within quantization error
    (0.5e-4 bits per term) of the float score."""
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    lm = train_bigram_lm(df, k=0.5, min_count=2)
    a = {
        r.doc_id: r.cross_entropy_bits
        for r in score_cross_entropy(df, lm, stable_micros=True).collect()
    }
    b = {
        r.doc_id: r.cross_entropy_bits
        for r in score_cross_entropy(
            df.repartition(7), lm, stable_micros=True
        ).collect()
    }
    assert a == b and len(a) > 0
    flt = {
        r.doc_id: r.cross_entropy_bits
        for r in score_cross_entropy(df, lm).collect()
    }
    for did, ce in a.items():
        assert ce == pytest.approx(flt[did], abs=1e-4), did


def test_perplexity_filter_drops_gibberish(spark):
    """CCNet's actual shape: the LM is trained on a REFERENCE corpus of
    fluent text and scores the full (held-out) crawl — gibberish the
    reference never saw hits the unseen floors and scores far worse."""
    ref = spark.createDataFrame(CORPUS[:4], "doc_id long, text string")
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    lm = train_bigram_lm(ref, k=0.5)
    scores = {
        r.doc_id: r.cross_entropy_bits
        for r in score_cross_entropy(df, lm).collect()
    }
    fluent = [scores[d] for d in (0, 1, 2, 3)]
    assert scores[4] > max(fluent) + 1.0  # gibberish: clearly worse
    cut = (scores[4] + max(fluent)) / 2
    kept = {r.doc_id for r in perplexity_filter(df, lm, cut).collect()}
    assert kept == {0, 1, 2, 3}  # gibberish AND the empty doc dropped


def test_bigram_lm_min_count_prunes_but_context_totals_stay(spark):
    """Pruned bigram rows fall back to the unseen floor; context totals
    are pre-prune so surviving probabilities are unchanged."""
    df = spark.createDataFrame(CORPUS[:4], "doc_id long, text string")
    full = train_bigram_lm(df, k=0.5, min_count=1)
    pruned = train_bigram_lm(df, k=0.5, min_count=2)
    assert pruned.bigrams.count() < full.bigrams.count()
    # 'the cat' appears twice -> survives pruning with the SAME logp
    a = full.bigrams.filter("prev = 'the' AND tok = 'cat'").collect()[0].logp
    b = pruned.bigrams.filter("prev = 'the' AND tok = 'cat'").collect()[0].logp
    assert a == pytest.approx(b, abs=1e-12)
    with pytest.raises(ValueError, match="k > 0"):
        train_bigram_lm(df, k=0.0)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 60), st.integers(0, 60)),
        min_size=0, max_size=40,
    ),
    seed=st.integers(0, 1000),
)
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_split_cluster_atomic_randomized(spark, edges, seed):
    """Random edge lists (self-loops, duplicates, chains) vs a Python
    union-find: every union-find component lands in exactly one split,
    and every doc is assigned."""
    docs = _docs(spark, 61)
    pairs = _pairs(spark, [(int(a), int(b)) for a, b in edges]) if edges \
        else None
    got = {r.doc_id: r.split
           for r in leakage_safe_split(docs, pairs, WEIGHTS, seed=seed)
           .collect()}
    assert len(got) == 61 and set(got.values()) <= set(WEIGHTS)
    # python union-find oracle
    parent = {i: i for i in range(61)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comps = {}
    for i in range(61):
        comps.setdefault(find(i), []).append(i)
    for members in comps.values():
        assert len({got[m] for m in members}) == 1, members


def test_lm_save_load_roundtrip(spark, tmp_path):
    """Persisted-LM artifact: loading reproduces every doc's score
    (to float-sum ulp: the per-doc mean accumulates in whatever order
    the loaded relation's plan delivers the bigrams, so the last bit
    can differ even though every stored logp round-trips exactly),
    and a corrupt/absent meta fails loudly."""
    from ferramenta_etl_spark.operators.lm import load_lm, save_lm

    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    lm = train_bigram_lm(df, k=0.5, min_count=1)
    path = str(tmp_path / "lm")
    save_lm(lm, path)
    back = load_lm(spark, path)
    assert (back.v, back.k) == (lm.v, lm.k)
    a = {r.doc_id: r.cross_entropy_bits
         for r in score_cross_entropy(df, lm).collect()}
    b = {r.doc_id: r.cross_entropy_bits
         for r in score_cross_entropy(df, back).collect()}
    assert set(a) == set(b)
    for d in a:
        assert b[d] == pytest.approx(a[d], rel=1e-12)
    with pytest.raises(Exception):
        load_lm(spark, str(tmp_path / "nope"))
