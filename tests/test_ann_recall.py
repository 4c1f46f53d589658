"""ANN recall on a CLUSTERED fixture (VERDICT r03 #7).

The synthetic embeddings fixture is near-orthogonal random noise (true
top-k cosine ~0.4), which understates every ANN method: SRP-LSH bands
only collide vectors that are actually close, and IVF buckets only help
when the corpus HAS cluster structure. Real embedding corpora are
clustered — that is why ANN works at all. This suite builds a
mixture-of-Gaussians corpus (the standard recall-evaluation shape) and
pins the documented configs that reach recall >= 0.9:

- IVF: n_centroids = true cluster count, 2 Lloyd steps, nprobe=2;
- SRP-LSH: 16 planes / 4 bands (width 4) — on members with cosine
  ~0.96 the per-bit collision rate is ~0.91, so a width-4 band hits
  with p~0.69 and 4 bands miss with p~(0.31)^4 < 2%.

Ground truth is computed driver-side with numpy (independent of the
engine under test), same ordering rule (sim desc, id asc).
"""

from __future__ import annotations

import numpy as np
import pytest

N_CLUSTERS = 16
DIM = 32
N_CORPUS = 2000
N_QUERIES = 20
K = 10
SIGMA = 0.05  # member noise per dim -> intra-cluster cosine ~0.96


def _mixture(seed: int = 1234):
    rng = np.random.RandomState(seed)
    centers = rng.randn(N_CLUSTERS, DIM)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    # corpus id i belongs to cluster i % N_CLUSTERS, so the first
    # N_CLUSTERS ids seed IVF with exactly one vector per true cluster
    corpus = centers[np.arange(N_CORPUS) % N_CLUSTERS] + SIGMA * rng.randn(
        N_CORPUS, DIM
    )
    queries = centers[np.arange(N_QUERIES) % N_CLUSTERS] + SIGMA * rng.randn(
        N_QUERIES, DIM
    )
    return corpus, queries


def _true_topk(corpus: np.ndarray, queries: np.ndarray) -> dict[int, set[int]]:
    cn = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    sims = qn @ cn.T  # (Q, N)
    out = {}
    for qi in range(len(queries)):
        # sim desc, id asc — the engine's tiebreak
        order = np.lexsort((np.arange(len(corpus)), -sims[qi]))
        out[qi] = set(order[:K].tolist())
    return out


@pytest.fixture(scope="module")
def clustered(spark):
    corpus, queries = _mixture()
    cdf = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in enumerate(corpus)],
        "vec_id long, embedding array<double>",
    )
    qdf = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in enumerate(queries)],
        "query_id long, query_vec array<double>",
    )
    return cdf, qdf, _true_topk(corpus, queries)


def _recall(df, truth) -> float:
    got: dict[int, set[int]] = {}
    for r in df.select("query_id", "vec_id").collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)
    hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
    return hits / sum(len(t) for t in truth.values())


def test_ivf_recall_on_clustered_corpus(clustered, spark):
    from ferramenta_etl_spark.operators.similarity import ivf_topk

    cdf, qdf, truth = clustered
    recalls = {}
    for nprobe in (1, 2, 4):
        df = ivf_topk(
            cdf, qdf, n_centroids=N_CLUSTERS, nprobe=nprobe, k=K,
            train_iters=2,
        )
        recalls[nprobe] = _recall(df, truth)
    # monotone in nprobe, and the documented config clears the bar
    assert recalls[1] <= recalls[2] + 1e-9 and recalls[2] <= recalls[4] + 1e-9
    assert recalls[2] >= 0.9, f"IVF nprobe sweep: {recalls}"


def test_srp_lsh_recall_on_clustered_corpus(clustered, spark):
    from ferramenta_etl_spark.operators.similarity import lsh_ann_topk

    cdf, qdf, truth = clustered
    recalls = {}
    for n_bands in (2, 4, 8):  # widths 8, 4, 2
        df = lsh_ann_topk(
            cdf, qdf, k=K, n_planes=16, n_bands=n_bands, dim=DIM
        )
        recalls[16 // n_bands] = _recall(df, truth)
    # narrower bands collide more -> recall must not decrease
    assert recalls[8] <= recalls[4] + 1e-9 and recalls[4] <= recalls[2] + 1e-9
    assert recalls[4] >= 0.9, f"SRP-LSH width sweep (width->recall): {recalls}"


def test_pq_adc_recall_on_clustered_corpus(clustered, spark, tmp_path):
    """PQ/ADC (operators/quantize) on the fixture whose HARD part is
    ranking WITHIN a tight cluster (members at cosine ~0.96): ADC alone
    needs fine codebooks there, and the compression<->recall dial must
    be monotone. Numpy-reference-verified recalls on this fixture:
    m=8/codes=64 -> 0.37, m=16/codes=256 -> 0.82, so the documented
    ADC-only config is m=16/codes=256 (16 B vs 256 B raw, 16x). The
    SERVING composition (pq_topk_rerank: ADC shortlist of 4k, exact
    cosine on just those rows) repairs the within-cluster noise to
    ~1.0 even while scoring a vanishing fraction of the corpus exactly.
    Also round-trips the persisted index: build writes codes + codebook
    sidecar, serve reads ONLY codes/norms."""
    from ferramenta_etl_spark.operators.quantize import (
        build_pq_index,
        pq_encode,
        pq_topk,
        pq_topk_on_index,
        pq_topk_rerank,
        train_pq_codebooks,
    )

    cdf, qdf, truth = clustered
    cbs16 = train_pq_codebooks(cdf, m=16, codes=256, sample_rows=N_CORPUS, iters=8)
    codes16 = pq_encode(cdf, cbs16)
    r_fine = _recall(pq_topk(codes16, qdf, cbs16, k=K), truth)
    assert r_fine >= 0.8, f"PQ ADC recall (m=16, codes=256): {r_fine}"

    # coarser codebooks trade recall for compression, monotonically
    cbs8 = train_pq_codebooks(cdf, m=8, codes=64, sample_rows=N_CORPUS, iters=8)
    codes8 = pq_encode(cdf, cbs8)
    r_coarse = _recall(pq_topk(codes8, qdf, cbs8, k=K), truth)
    assert 0.2 <= r_coarse <= r_fine + 1e-9, f"coarse PQ recall: {r_coarse}"

    # serving path: ADC shortlist + exact rerank clears the family bar
    # even on the COARSE codebooks (shortlist 8k) and the fine ones (4k)
    r_serve = _recall(pq_topk_rerank(codes16, cdf, qdf, cbs16, k=K), truth)
    assert r_serve >= 0.95, f"PQ rerank recall (m=16): {r_serve}"
    r_serve8 = _recall(
        pq_topk_rerank(codes8, cdf, qdf, cbs8, k=K, shortlist=8 * K), truth
    )
    assert r_serve8 >= 0.9, f"PQ rerank recall (m=8, shortlist 8k): {r_serve8}"

    path = str(tmp_path / "pq_index")
    build_pq_index(cdf, path, m=16, codes=256, sample_rows=N_CORPUS, train_iters=8)
    served = pq_topk_on_index(spark, path, qdf, k=K)
    assert _recall(served, truth) == r_fine  # same codebooks -> same answer


def test_ivfpq_recall_on_clustered_corpus(clustered, spark, tmp_path):
    """IVF-PQ (IVFADC): PQ on RESIDUALS must beat raw-vector PQ at the
    same code budget (residuals span only the within-bucket spread —
    numpy reference: 0.625 vs 0.37 at m=8/codes=64 with true centers),
    recall must be monotone in nprobe, and the serving composition
    (probed-partition scan -> ADC shortlist -> exact rerank) clears the
    family bar."""
    from ferramenta_etl_spark.operators.quantize import (
        build_ivfpq_index,
        ivfpq_topk,
        pq_encode,
        pq_topk,
        train_pq_codebooks,
    )

    cdf, qdf, truth = clustered
    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(
        cdf, path, n_centroids=N_CLUSTERS, m=8, codes=64,
        train_iters=2, pq_iters=8, sample_rows=N_CORPUS,
    )
    recalls = {
        nprobe: _recall(ivfpq_topk(spark, path, qdf, nprobe=nprobe, k=K), truth)
        for nprobe in (1, 2, 4)
    }
    assert recalls[1] <= recalls[2] + 1e-9 and recalls[2] <= recalls[4] + 1e-9

    # residual coding beats raw-vector coding at the same budget
    cbs_raw = train_pq_codebooks(cdf, m=8, codes=64, sample_rows=N_CORPUS, iters=8)
    r_raw = _recall(pq_topk(pq_encode(cdf, cbs_raw), qdf, cbs_raw, k=K), truth)
    assert recalls[4] > r_raw + 0.1, f"ivfpq {recalls} vs raw pq {r_raw}"

    # serving composition: ADC shortlist + exact rerank on probed buckets
    r_serve = _recall(
        ivfpq_topk(spark, path, qdf, nprobe=2, k=K, corpus=cdf, shortlist=8 * K),
        truth,
    )
    assert r_serve >= 0.9, f"IVF-PQ rerank recall: {r_serve}"


def test_opq_beats_pq_on_anisotropic_corpus(spark, tmp_path):
    """OPQ's learned rotation must beat plain PQ at the SAME code
    budget when the corpus energy is not axis-aligned — a
    decaying-spectrum cloud under a fixed random rotation, the shape
    axis-split subspaces handle worst (numpy prototype: ~2.9x lower
    quantization distortion). Also: the rotation sidecar round-trips
    through the persisted-index serve and rerank surfaces."""
    from ferramenta_etl_spark.operators.quantize import (
        build_opq_index,
        pq_encode,
        pq_topk,
        pq_topk_on_index,
        pq_topk_rerank,
        train_opq_codebooks,
        train_pq_codebooks,
    )

    rng = np.random.RandomState(5)
    n, dim, m, codes, k = 1200, 32, 8, 16, 10
    scales = np.exp(-np.arange(dim) / 6.0)
    qrot, _ = np.linalg.qr(rng.randn(dim, dim))
    corpus = (rng.randn(n, dim) * scales) @ qrot.T
    queries = (rng.randn(12, dim) * scales) @ qrot.T
    cdf = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in enumerate(corpus)],
        "vec_id long, embedding array<double>",
    )
    qdf = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in enumerate(queries)],
        "query_id long, query_vec array<double>",
    )
    truth = _true_topk(corpus, queries)

    cbs_pq = train_pq_codebooks(cdf, m=m, codes=codes, sample_rows=n, iters=8)
    r_pq = _recall(pq_topk(pq_encode(cdf, cbs_pq), qdf, cbs_pq, k=k), truth)

    rot, cbs_opq = train_opq_codebooks(
        cdf, m=m, codes=codes, sample_rows=n, iters=8, opq_iters=6
    )
    codes_opq = pq_encode(cdf, cbs_opq, rotation=rot)
    r_opq = _recall(pq_topk(codes_opq, qdf, cbs_opq, k=k, rotation=rot), truth)
    assert r_opq > r_pq + 0.05, f"OPQ {r_opq} vs PQ {r_pq}"

    # rerank serves >= the family bar even from the rotated codes
    r_serve = _recall(
        pq_topk_rerank(codes_opq, cdf, qdf, cbs_opq, k=k, rotation=rot), truth
    )
    assert r_serve >= 0.9, f"OPQ rerank recall: {r_serve}"

    # persisted index: rotation sidecar detected and applied
    path = str(tmp_path / "opq_index")
    build_opq_index(cdf, path, m=m, codes=codes, sample_rows=n,
                    train_iters=8, opq_iters=6)
    assert _recall(pq_topk_on_index(spark, path, qdf, k=k), truth) == r_opq
