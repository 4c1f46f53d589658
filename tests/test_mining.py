"""Hard-negative mining: numpy differential oracle + policy tests.

The oracle re-implements mine_hard_negatives' contract end-to-end in
numpy float64 (cosine rounded to 6 dp, same-label and NULL-label rows
masked, sim band applied pre-ranking, (-sim, vec_id) total order) and
the test asserts the EXACT (anchor, vec_id, rnk) triples with sims to
1e-6 — the same differential style as the PQ/ADC oracles in
test_quantize.py.
"""

import numpy as np
import pytest

from ferramenta_etl_spark.operators.similarity import mine_hard_negatives

SEED = 417
N, DIM, N_LABELS = 120, 8, 4


def _fixture():
    rng = np.random.default_rng(SEED)
    vecs = rng.normal(size=(N, DIM)).astype(np.float32)
    labels = (np.arange(N) % N_LABELS).astype(np.int64)
    return vecs, labels


def _corpus_df(spark, vecs, labels):
    rows = [
        (int(i), [float(x) for x in vecs[i]], int(labels[i]))
        for i in range(len(vecs))
    ]
    # plus a zero-norm row and a NULL-label row: neither may ever rank
    rows.append((900, [0.0] * DIM, 0))
    rows.append((901, [float(x) for x in vecs[0]], None))
    return spark.createDataFrame(
        rows, "vec_id: long, embedding: array<float>, label: long"
    )


def _anchor_df(spark, vecs, labels, ids):
    rows = [
        (int(i), [float(x) for x in vecs[i]], int(labels[i])) for i in ids
    ]
    rows.append((800, [float(x) for x in vecs[1]], None))  # NULL anchor label
    rows.append((801, [0.0] * DIM, 0))  # zero-norm anchor
    return spark.createDataFrame(
        rows, "query_id: long, query_vec: array<float>, query_label: long"
    )


def _oracle(vecs, labels, anchor_ids, k, max_sim=None, min_sim=None):
    """(anchor_id, vec_id, label, sim, rnk) rows, contract re-derived in
    float64 numpy. Corpus = the N real rows only (900/901 are screened
    by the operator's zero-norm / NULL-label policy)."""
    v = vecs.astype(np.float64)
    norms = np.linalg.norm(v, axis=1)
    out = []
    for a in anchor_ids:
        sims = np.round(v @ v[a] / (norms[a] * norms), 6)
        cand = [
            (int(i), int(labels[i]), float(sims[i]))
            for i in range(len(v))
            if labels[i] != labels[a]
            and (max_sim is None or sims[i] < max_sim)
            and (min_sim is None or sims[i] >= min_sim)
        ]
        cand.sort(key=lambda t: (-t[2], t[0]))
        for rnk, (i, lab, s) in enumerate(cand[:k], start=1):
            out.append((int(a), i, lab, s, rnk))
    return out


@pytest.mark.parametrize(
    "band", [dict(), dict(max_sim=0.6), dict(min_sim=0.1, max_sim=0.8)]
)
def test_matches_numpy_oracle(spark, band):
    vecs, labels = _fixture()
    anchor_ids = [0, 7, 33, 64, 119]
    got = sorted(
        (r.query_id, r.vec_id, r.label, r.sim, r.rnk)
        for r in mine_hard_negatives(
            _corpus_df(spark, vecs, labels),
            _anchor_df(spark, vecs, labels, anchor_ids),
            k=7,
            **band,
        ).collect()
        if r.query_id < 800
    )
    want = sorted(_oracle(vecs, labels, anchor_ids, k=7, **band))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:3] == w[:3] and g[4] == w[4], (g, w)
        assert abs(g[3] - w[3]) <= 1e-6, (g, w)


def test_policy_rows_never_rank(spark):
    """Zero-norm and NULL-label rows on either side produce nothing:
    anchor 800 (NULL label) and 801 (zero vec) return no rows; corpus
    rows 900 (zero vec) and 901 (NULL label) never appear as negatives;
    and no returned pair shares a label (self-mining exclusion)."""
    vecs, labels = _fixture()
    anchors = _anchor_df(spark, vecs, labels, [0, 1, 2])
    rows = mine_hard_negatives(
        _corpus_df(spark, vecs, labels), anchors, k=10
    ).collect()
    assert rows, "sanity: real anchors must mine something"
    assert not [r for r in rows if r.query_id in (800, 801)]
    assert not [r for r in rows if r.vec_id in (900, 901)]
    anchor_label = {0: labels[0], 1: labels[1], 2: labels[2]}
    assert all(r.label != anchor_label[r.query_id] for r in rows)
    # self-mining: the anchor's own corpus row is same-label, so it is
    # excluded by the inequality — never returned even at sim 1.0
    assert not [r for r in rows if r.vec_id == r.query_id]


def test_band_is_respected(spark):
    vecs, labels = _fixture()
    rows = mine_hard_negatives(
        _corpus_df(spark, vecs, labels),
        _anchor_df(spark, vecs, labels, [5, 6]),
        k=50,
        min_sim=0.2,
        max_sim=0.7,
    ).collect()
    assert rows
    assert all(0.2 <= r.sim < 0.7 for r in rows)


@pytest.mark.parametrize(
    "band", [dict(), dict(min_sim=0.1, max_sim=0.8)]
)
def test_arrow_engine_matches_sql_fold(spark, band):
    """mine_hard_negatives_arrow row-for-row against the oracle-pinned
    SQL fold on the fixture INCLUDING the policy rows (zero-norm /
    NULL-label on both sides) — the two paths may differ only on a
    half-ulp-of-1e-6 pairwise-vs-sequential summation tie, which the
    1e-6 sim tolerance absorbs."""
    from ferramenta_etl_spark.operators.similarity import (
        mine_hard_negatives_arrow,
    )

    vecs, labels = _fixture()
    anchor_ids = [0, 7, 33, 64, 119]
    corpus = _corpus_df(spark, vecs, labels)
    anchors = _anchor_df(spark, vecs, labels, anchor_ids)
    want = sorted(
        tuple(r)
        for r in mine_hard_negatives(corpus, anchors, k=7, **band).collect()
    )
    got = sorted(
        tuple(r)
        for r in mine_hard_negatives_arrow(
            corpus, anchors, k=7, **band
        ).collect()
    )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:3] == w[:3] and g[4] == w[4], (g, w)
        assert abs(g[3] - w[3]) <= 1e-6, (g, w)


def test_arrow_engine_guard_and_empty(spark):
    from ferramenta_etl_spark.operators.similarity import (
        mine_hard_negatives_arrow,
    )

    vecs, labels = _fixture()
    corpus = _corpus_df(spark, vecs, labels)
    with pytest.raises(ValueError, match="max_anchors"):
        mine_hard_negatives_arrow(
            corpus, _anchor_df(spark, vecs, labels, [0, 1, 2]), max_anchors=2
        )
    # only policy anchors (NULL label + zero vec) -> empty, right schema
    out = mine_hard_negatives_arrow(
        corpus, _anchor_df(spark, vecs, labels, [])
    )
    assert out.columns == ["query_id", "vec_id", "label", "sim", "rnk"]
    assert out.count() == 0


def test_benchmark_max_sim_matches_numpy(spark):
    """Semantic decontamination score vs a flat numpy max-cosine: every
    usable corpus vector to 1e-6 (the 6-dp round), unusable rows NULL."""
    import numpy as np

    from ferramenta_etl_spark.operators.similarity import benchmark_max_sim

    rng = np.random.default_rng(5)
    bench = rng.normal(size=(7, 8))
    corp = rng.normal(size=(30, 8))
    corp[3] = bench[2] * 2.5          # exact direction match: sim 1.0
    corpus_rows = [(i, [float(x) for x in corp[i]]) for i in range(30)]
    corpus_rows += [(100, None), (101, []), (102, [0.0] * 8),
                    (103, [float("nan")] + [1.0] * 7)]
    corpus = spark.createDataFrame(
        corpus_rows, "vec_id long, embedding array<double>"
    )
    bdf = spark.createDataFrame(
        [(i, [float(x) for x in bench[i]]) for i in range(7)],
        "vec_id long, embedding array<double>",
    )
    got = {r.vec_id: r.bench_max_sim
           for r in benchmark_max_sim(corpus, bdf).collect()}
    bn = bench / np.linalg.norm(bench, axis=1, keepdims=True)
    for i in range(30):
        want = float(
            (corp[i] / np.linalg.norm(corp[i]) @ bn.T).max()
        )
        assert got[i] == pytest.approx(want, abs=1e-6), i
    assert got[3] == pytest.approx(1.0, abs=1e-6)
    for bad in (100, 101, 102, 103):
        assert got[bad] is None


def test_decontaminate_semantic_drops_planted_leaks(spark):
    """Corpus seeded with scaled copies of benchmark vectors: exactly
    the planted rows are dropped at a high threshold; NULL-scoring rows
    are kept (cannot-judge != contaminated); empty benchmark drops
    nothing; oversized benchmark trips the loud guard."""
    import numpy as np

    from ferramenta_etl_spark.operators.similarity import decontaminate_semantic

    rng = np.random.default_rng(9)
    bench = rng.normal(size=(5, 6))
    clean = rng.normal(size=(40, 6))
    rows = [(i, [float(x) for x in clean[i]]) for i in range(40)]
    rows += [(1000 + j, [float(x * 3.0) for x in bench[j]]) for j in range(5)]
    rows += [(2000, None)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    bdf = spark.createDataFrame(
        [(j, [float(x) for x in bench[j]]) for j in range(5)],
        "vec_id long, embedding array<double>",
    )
    kept = {r.vec_id for r in
            decontaminate_semantic(corpus, bdf, threshold=0.999).collect()}
    assert all(1000 + j not in kept for j in range(5))  # leaks gone
    assert 2000 in kept                                  # NULL kept
    assert len(kept) >= 35                               # random pairs survive
    empty = bdf.filter("vec_id < 0")
    assert decontaminate_semantic(corpus, empty).count() == corpus.count()
    with pytest.raises(ValueError, match="max_benchmark"):
        decontaminate_semantic(corpus, bdf, max_benchmark=3)
    # NULL/ragged benchmark rows are screened, not crashed on
    ragged = bdf.unionByName(spark.createDataFrame(
        [(90, None), (91, [1.0, 2.0])],
        "vec_id long, embedding array<double>",
    ))
    kept2 = {r.vec_id for r in
             decontaminate_semantic(corpus, ragged, threshold=0.999).collect()}
    assert all(1000 + j not in kept2 for j in range(5))
