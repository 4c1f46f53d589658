"""int8 embedding quantization: reconstruction error bounds, storage
schema, and ranking fidelity of the quantized-domain cosine top-k."""

from pyspark.sql import functions as F

from ferramenta_etl_spark.operators import quantize as Q
from ferramenta_etl_spark.operators import similarity as S
from ferramenta_etl_spark.sources import load_table


def test_quantize_roundtrip_error_bounded(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qed = Q.quantize_embeddings(emb)
    assert dict(qed.dtypes)["q_embedding"] == "array<tinyint>"
    # max |x - dequant(q)| <= scale/2 per element (symmetric rounding)
    err = (
        qed.join(load_table(spark, sf_dir, "embeddings"), "vec_id")
        .select(
            F.array_max(
                F.zip_with(
                    F.col("embedding"),
                    Q.dequantize(F.col("q_embedding"), F.col("q_scale")),
                    lambda x, y: F.abs(x.cast("double") - y),
                )
            ).alias("e"),
            (F.col("q_scale") / 2 + F.lit(1e-12)).alias("bound"),
        )
        .filter(F.col("e") > F.col("bound"))
    )
    assert err.count() == 0


def test_quantize_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])],
        "vec_id long, embedding array<double>",
    )
    rows = {r.vec_id: r for r in Q.quantize_embeddings(df).collect()}
    assert rows[1].q_scale == 0.0 and list(rows[1].q_embedding) == [0, 0, 0]
    assert rows[2].q_embedding[1] == -127  # amax element maps to +-127


def test_quantized_topk_recall_vs_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    corpus = emb.filter(F.col("vec_id") >= 10).select("vec_id", "embedding")
    exact = {
        (r.query_id, r.vec_id) for r in S.cosine_topk(corpus, queries, k=5).collect()
    }
    qc = Q.quantize_embeddings(corpus)
    qq = Q.quantize_embeddings(
        queries.withColumnRenamed("query_vec", "embedding"),
    ).select(
        F.col("query_id"),
        F.col("q_embedding").alias("query_q"),
        F.col("q_scale").alias("query_scale"),
    )
    approx = {
        (r.query_id, r.vec_id)
        for r in Q.quantized_cosine_topk(qc, qq, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"int8 top-5 recall {recall:.2f}"


def test_quantize_non_finite_vectors_get_zero_code(spark):
    """NaN/Inf elements (corrupt encodes) must not abort the job: NaN
    compares greater than 0 in Spark, so a naive scale > 0 guard sends
    the vector into the tinyint cast and dies. They quantize to
    scale 0 + zero code, which the zero-norm ranking policy then
    drops."""
    df = spark.createDataFrame(
        [(1, [1.0, float("nan")]), (2, [float("inf"), 0.5]), (3, [1.0, 2.0])],
        "vec_id long, embedding array<double>",
    )
    rows = {r.vec_id: r for r in Q.quantize_embeddings(df).collect()}
    assert rows[1].q_scale == 0.0 and list(rows[1].q_embedding) == [0, 0]
    assert rows[2].q_scale == 0.0 and list(rows[2].q_embedding) == [0, 0]
    assert rows[3].q_scale > 0


def test_pq_non_finite_vectors_drop_from_ranking(spark):
    """PQ mirrors the family's zero-norm policy: non-finite vectors
    encode to norm 0 and never appear in an ADC ranking; finite
    vectors rank normally alongside them."""
    df = spark.createDataFrame(
        [
            (1, [1.0, float("nan"), 0.5, 0.5]),
            (2, [0.9, 0.1, 0.45, 0.55]),
            (3, [float("inf"), 0.1, 0.2, 0.3]),
            (4, [1.0, 0.0, 0.5, 0.5]),
        ],
        "vec_id long, embedding array<double>",
    )
    cbs = Q.train_pq_codebooks(df, m=2, codes=2, iters=4)
    codes = {r.vec_id: r for r in Q.pq_encode(df, cbs).collect()}
    assert codes[1].pq_norm == 0.0 and codes[3].pq_norm == 0.0
    assert codes[2].pq_norm > 0 and codes[4].pq_norm > 0
    qdf = spark.createDataFrame(
        [(10, [1.0, 0.0, 0.5, 0.5])], "query_id long, query_vec array<double>"
    )
    got = {r.vec_id for r in Q.pq_topk(Q.pq_encode(df, cbs), qdf, cbs, k=4).collect()}
    assert got == {2, 4}  # the corrupt vectors never rank


def test_pq_topk_query_batch_guard(spark):
    """The ADC paths build one (m x codes) LUT per query in every task
    closure; an unbounded query side would OOM the driver silently.
    The guard fails loud with batching guidance."""
    import pytest

    df = spark.createDataFrame(
        [(i, [float(i), 0.5, 0.25, 1.0]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    cbs = Q.train_pq_codebooks(df, m=2, codes=2, iters=2)
    qdf = spark.createDataFrame(
        [(i, [1.0, 0.0, 0.5, 0.5]) for i in range(5)],
        "query_id long, query_vec array<double>",
    )
    with pytest.raises(ValueError, match="max_queries"):
        Q.pq_topk(Q.pq_encode(df, cbs), qdf, cbs, k=2, max_queries=4)
    assert Q.pq_topk(Q.pq_encode(df, cbs), qdf, cbs, k=2, max_queries=5).count() > 0


def test_pq_review_guards(spark, tmp_path):
    """Round-7 code-review regressions: (a) empty/unusable training
    sample fails loud, not an opaque unpack error; (b) an empty or
    all-unusable query side returns a schema-correct empty result, not
    a numpy AxisError; (c) a finite ZERO corpus vector can reach the
    ADC shortlist (its pq_norm is the nearest codewords' norm, not its
    own) but must NOT rank in the exact rerank — 0/0 = NaN sorts above
    every real sim in Spark's DESC order; (d) build_ivfpq_index rejects
    codes > 256 instead of silently wrapping the one-byte encoding."""
    import pytest

    # (a) all vectors non-finite -> loud ValueError
    bad = spark.createDataFrame(
        [(1, [float("nan"), 1.0]), (2, [float("inf"), 0.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="no usable training vectors"):
        Q.train_pq_codebooks(bad, m=1, codes=2, iters=1)

    df = spark.createDataFrame(
        [
            (1, [0.0, 0.0, 0.0, 0.0]),  # finite zero vector
            (2, [1.0, 0.1, 0.5, 0.5]),
            (3, [0.9, 0.2, 0.45, 0.55]),
            (4, [1.0, 0.0, 0.5, 0.5]),
        ],
        "vec_id long, embedding array<double>",
    )
    cbs = Q.train_pq_codebooks(df, m=2, codes=2, iters=4)
    codes = Q.pq_encode(df, cbs)

    # (b) empty query side -> empty result with the serve schema
    qempty = spark.createDataFrame(
        [], "query_id long, query_vec array<double>"
    )
    out = Q.pq_topk(codes, qempty, cbs, k=2)
    assert out.columns == ["query_id", "vec_id", "sim", "rnk"]
    assert out.count() == 0
    qzero = spark.createDataFrame(
        [(9, [0.0, 0.0, 0.0, 0.0])], "query_id long, query_vec array<double>"
    )
    assert Q.pq_topk(codes, qzero, cbs, k=2).count() == 0

    # (c) the zero corpus vector must never appear in the rerank output
    qdf = spark.createDataFrame(
        [(10, [1.0, 0.0, 0.5, 0.5])], "query_id long, query_vec array<double>"
    )
    got = Q.pq_topk_rerank(codes, df, qdf, cbs, k=4, shortlist=4)
    rows = got.collect()
    assert {r.vec_id for r in rows} == {2, 3, 4}
    assert all(r.sim == r.sim for r in rows)  # no NaN sims survive

    # (d) ivfpq build rejects the wrap-prone codes count up front
    with pytest.raises(ValueError, match="256"):
        Q.build_ivfpq_index(df, str(tmp_path / "x"), n_centroids=2, m=2, codes=512)


def test_pq_adc_scores_match_numpy_oracle(spark):
    """Differential pin of the ADC plumbing (offset-128 codes, LUT
    indexing, reconstruction-norm math): pq_topk's sims must equal an
    INDEPENDENT numpy recomputation (decode codes -> reconstruct ->
    cosine) to the emitted 6-dp rounding, across several corpus shapes
    and codebook geometries."""
    import numpy as np

    rng = np.random.RandomState(42)
    for m, codes, n, dim in [(1, 2, 5, 4), (2, 4, 8, 4), (4, 4, 7, 8)]:
        corpus = rng.randn(n, dim)
        queries = rng.randn(2, dim)
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(corpus)],
            "vec_id long, embedding array<double>",
        )
        qdf = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(queries)],
            "query_id long, query_vec array<double>",
        )
        cbs = Q.train_pq_codebooks(df, m=m, codes=codes, iters=4)
        got = {
            (r.query_id, r.vec_id): r.sim
            for r in Q.pq_topk(Q.pq_encode(df, cbs), qdf, cbs, k=n).collect()
        }
        # independent oracle: decode -> reconstruct -> cosine, no LUTs
        cb = np.array(cbs)
        dsub = dim // m
        recon = np.zeros_like(corpus)
        for j in range(m):
            sub = corpus[:, j * dsub : (j + 1) * dsub]
            d2 = (cb[j] ** 2).sum(1)[None, :] - 2 * (sub @ cb[j].T)
            recon[:, j * dsub : (j + 1) * dsub] = cb[j][d2.argmin(1)]
        rn = np.linalg.norm(recon, axis=1)
        qn = np.linalg.norm(queries, axis=1)
        for qi in range(len(queries)):
            for vi in range(n):
                want = round((queries[qi] @ recon[vi]) / (qn[qi] * rn[vi]), 6)
                assert abs(got[(qi, vi)] - want) <= 1e-6, (m, codes, qi, vi)


def test_ivfpq_adc_scores_match_numpy_oracle(spark, tmp_path):
    """Differential pin of the IVFADC decomposition (q.x_hat = q.c +
    q.r_hat, searchsorted centroid positions, probe masking): with
    nprobe = n_centroids (no pruning), every served sim must equal the
    independent centroid-plus-decoded-residual reconstruction cosine."""
    import json
    import os

    import numpy as np

    rng = np.random.RandomState(7)
    n, dim, m = 12, 8, 2
    corpus = rng.randn(n, dim)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(corpus)],
        "vec_id long, embedding array<double>",
    )
    queries = rng.randn(2, dim)
    qdf = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(queries)],
        "query_id long, query_vec array<double>",
    )
    path = str(tmp_path / "ivfpq")
    Q.build_ivfpq_index(df, path, n_centroids=3, m=m, codes=4, pq_iters=4)
    got = {
        (r.query_id, r.vec_id): r.sim
        for r in Q.ivfpq_topk(spark, path, qdf, nprobe=3, k=n).collect()
    }
    assert len(got) == 2 * n  # nothing pruned at nprobe = n_centroids

    with open(os.path.join(path, "_ivfpq_meta.json")) as f:
        meta = json.load(f)
    cid2vec = {int(c): np.array(v) for c, v in meta["centroids"]}
    cb = np.array(meta["codebooks"])
    dsub = dim // m
    # independent oracle: nearest centroid by cosine (id-asc tiebreak
    # implicit — ids are distinct), residual -> nearest codeword ->
    # reconstruct, cosine against the query
    qn = np.linalg.norm(queries, axis=1)
    for vi in range(n):
        sims_c = {
            c: (corpus[vi] @ v) / (np.linalg.norm(corpus[vi]) * np.linalg.norm(v))
            for c, v in cid2vec.items()
        }
        cbest = max(sorted(sims_c), key=lambda c: sims_c[c])
        resid = corpus[vi] - cid2vec[cbest]
        recon = cid2vec[cbest].copy()
        for j in range(m):
            sub = resid[j * dsub : (j + 1) * dsub]
            d2 = ((cb[j] - sub) ** 2).sum(1)
            recon[j * dsub : (j + 1) * dsub] += cb[j][d2.argmin()]
        rn = np.linalg.norm(recon)
        for qi in range(len(queries)):
            want = round((queries[qi] @ recon) / (qn[qi] * rn), 6)
            assert abs(got[(qi, vi)] - want) <= 1e-6, (qi, vi)


def test_pq_index_incremental_append(spark, tmp_path):
    """Index maintenance composes with the idempotent sink: appends
    encode with the FROZEN codebooks and land exactly-once per vector
    id — overlapping batches and reruns add zero duplicates, and the
    served top-k sees the new vectors."""
    import numpy as np

    rng = np.random.RandomState(3)

    def frame(ids, vecs):
        return spark.createDataFrame(
            [(int(i), [float(x) for x in v]) for i, v in zip(ids, vecs)],
            "vec_id long, embedding array<double>",
        )

    base = frame(range(30), rng.randn(30, 8))
    newv = rng.randn(10, 8)
    batch = frame(range(25, 40), np.vstack([rng.randn(5, 8), newv]))  # 25-29 overlap

    # flat PQ
    p1 = str(tmp_path / "pq")
    Q.build_pq_index(base, p1, m=2, codes=8, train_iters=4)
    assert Q.append_to_pq_index(spark, p1, batch) == 10  # only 30-39 new
    assert Q.append_to_pq_index(spark, p1, batch) == 0  # rerun: zero
    idx = spark.read.parquet(p1)
    assert idx.count() == 40
    assert idx.select("vec_id").distinct().count() == 40
    q = frame([99], [newv[-1]]).selectExpr(
        "vec_id as query_id", "embedding as query_vec"
    )
    # with coarse frozen codebooks several vectors can share vec 39's
    # reconstruction (ties resolve id-asc), so assert top-k MEMBERSHIP
    top = {r.vec_id for r in Q.pq_topk_on_index(spark, p1, q, k=10).collect()}
    assert 39 in top  # the appended vector is served

    # IVF-PQ (partitioned; conflict scan prunes to touched centroids)
    p2 = str(tmp_path / "ivfpq")
    Q.build_ivfpq_index(base, p2, n_centroids=4, m=2, codes=8, pq_iters=4)
    assert Q.append_to_ivfpq_index(spark, p2, batch) == 10
    assert Q.append_to_ivfpq_index(spark, p2, batch) == 0
    idx2 = spark.read.parquet(p2)
    assert idx2.count() == 40
    assert idx2.select("vec_id").distinct().count() == 40
    top2 = {r.vec_id for r in Q.ivfpq_topk(spark, p2, q, nprobe=4, k=10).collect()}
    assert 39 in top2
