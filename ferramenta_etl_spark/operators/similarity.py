"""Similarity search over embedding columns (array<float>).

Two paths, per the standard ANN playbook:
- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Queries are broadcast; the corpus streams; the only exchange carries
  (query_id, vec_id, sim) candidate tuples, never embeddings.
- ``ivf_topk``: IVF-style approximate top-k — the 100 TB path. Vectors
  are bucketed by nearest centroid as a PURE PROJECTION (centroids are
  inlined as literal arrays — zero shuffle, the corpus never moves);
  each query probes only ``nprobe`` buckets, turning the scan into a
  pruned fraction of the corpus.

All vector math is JVM-side SQL expressions (zip_with + aggregate fold)
— Arrow/pandas never sees the vectors. The sequential left fold is also
bit-reproducible across engines, which the oracle contract relies on.

Top-k extraction is always two-phase (operators/topk.py): a window
partitioned only by query_id would sort the whole scored corpus in
|queries| tasks — the round-1 plan flagged as a scale leak.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .topk import grouped_topk


def dot(a: Column, b: Column) -> Column:
    """Sequential double-precision fold — deterministic order, so the
    result is bit-stable across engines and runs."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_normalize(a: Column) -> Column:
    """Unit-norm copy of ``a`` (double elements); NULL for zero-norm /
    non-finite inputs — the same "no defined direction" policy every
    scorer in this module applies, surfaced as NULL instead of silently
    ranking garbage. Pure column expression, map-only."""
    n = norm(a)
    return F.when(
        n.isNotNull() & (n > 0.0) & (n == n) & (n != float("inf")),
        F.transform(a, lambda x: x.cast("double") / n),
    )


def mean_pool_embeddings(
    df: DataFrame,
    group_cols: Sequence[str],
    vec_col: str = "embedding",
    out_col: str = "embedding",
    normalize: bool = False,
) -> DataFrame:
    """Element-wise mean of ``vec_col`` per group — the chunk→document
    pooling step: encode chunks (bounded-length model inputs), mean-pool
    back to one vector per document, feed the ANN/dedup family.

    Spark has no element-wise array SUM aggregate, so the pool is two
    hash aggregations, both partial-aggregated (no UDF, no collect):
    posexplode to (group, pos, val) → sum/count per (group, pos) →
    regroup to ordered arrays via array_sort over collect_list(struct).
    Exchange 1 carries one PARTIAL SUM per (group, pos) per input
    partition — dim-proportional, never row-proportional; exchange 2
    carries dim rows per group. Both linear in groups×dim at 100×.

    Rows with NULL/empty vectors are dropped before pooling (a missing
    chunk embedding must not zero-bias the mean). NULL ELEMENTS inside a
    vector are likewise skipped — each position's mean is over its
    non-null values only (denominator = non-null count, so a NULL cell
    cannot bias the mean toward zero; a position that is NULL in every
    vector of the group yields a NULL element, ADVICE r08). Ragged dims
    within a group are the caller's bug; the count is taken per
    (group, pos), so a ragged group yields a positionally-correct mean
    rather than a silently wrong one. ``normalize=True`` unit-norms the
    pooled vector (cosine-ready, NULL if the mean is zero-norm)."""
    gcols = [F.col(c) for c in group_cols]
    exploded = df.filter(
        F.col(vec_col).isNotNull() & (F.size(vec_col) > 0)
    ).select(*gcols, F.posexplode(vec_col).alias("__pos", "__val"))
    per_pos = exploded.groupBy(*gcols, F.col("__pos")).agg(
        (
            F.sum(F.col("__val").cast("double"))
            / F.count(F.col("__val"))  # non-null count: NULL cells skip
        ).alias("__mean")
    )
    pooled = per_pos.groupBy(*gcols).agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("__pos"), F.col("__mean")))
            ),
            lambda s: s.getField("__mean"),
        ).alias(out_col)
    )
    if normalize:
        pooled = pooled.withColumn(out_col, l2_normalize(F.col(out_col)))
    return pooled


# --------------------------------------------------------------------------
# SQL-string builders for the hot-path expressions. The Column-API forms
# above are the readable reference; these exist because PySpark higher-
# order-function lambdas cost ~30-80 ms of py4j roundtrips EACH at plan-
# construction time (measured: ~35 dot() constructions = ~1.7 s of driver
# time per IVF plan build at sf0.1). One F.expr per projection keeps the
# parsed expression identical — same zip_with/aggregate fold, same IEEE
# op order — at one py4j call. repr() round-trips doubles exactly.
# --------------------------------------------------------------------------


def _vec_sql(vec: Sequence[float]) -> str:
    """Literal array<double> SQL from a driver-side vector — the inlining
    primitive that makes centroid math shuffle-free."""
    return "array(" + ",".join(f"CAST({float(x)!r} AS DOUBLE)" for x in vec) + ")"


def _dot_sql(a: str, b: str) -> str:
    """SQL text of the same sequential fold as ``dot``."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _norm_sql(a: str) -> str:
    return f"sqrt({_dot_sql(a, a)})"



def _usable_vec_sql(vc: str) -> str:
    """Predicate: vector is usable for cosine math — every element
    non-null and finite, AND the computed norm is positive. The element
    screen comes FIRST (NaN compares GREATER than everything in both
    engines, so a bare norm > 0 would keep NaN vectors — caught by the
    NaN-vector fuzz fixture). NULL elements are screened explicitly:
    inside exists() a NULL predicate result would null-reject the row
    on Spark while DuckDB's list_filter drops NULL results and kept it.

    The norm test is ``exists(x -> x*x > 0)`` — PROVABLY equivalent to
    ``norm > 0`` on the screened (finite) elements: the fold sums the
    non-negative x*x terms, no cancellation is possible and IEEE
    addition of non-negatives is monotone (the sum is >= its largest
    term), so the sum is positive iff some x*x rounds positive. An
    ``exists(x != 0)`` shortcut is NOT equivalent (subnormal x whose
    square underflows to 0 — norm 0 on both engines but 'nonzero'
    true; those rows emitted 0/0 = NaN sims the oracle lacked, the
    round-? fuzz catch) — x*x > 0 tests exactly the term the fold
    sums. Deliberately not ``{_norm_sql(vc)} > 0``: that evaluates the
    FULL quadratic fold a second time in the Filter on every row (the
    projection computes it again for survivors); the exists() is one
    short-circuit linear pass — measured ~5-13% off the embedding
    serve rows at sf0.1 (r13), free at any scale."""
    return (
        f"NOT exists({vc}, x -> x IS NULL OR isnan(x) "
        f"OR abs(x) = double('Infinity')) AND exists({vc}, x -> x * x > 0.0D)"
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k per query, brute force.

    Plan shape: broadcast(queries) nested-loop against the corpus scan →
    two-phase top-k on the scored tuples (partial per input partition,
    final over <= k x P candidates — never a |queries|-partition sort of
    the full scored corpus). The rounding (6 dp) + id tiebreak make the
    ranking a total order, so results are reproducible and
    engine-independent.
    """
    # norms are projected ONCE per corpus row and once per query row;
    # the per-pair work is then a single dot fold. Same IEEE op order as
    # cosine() — dot / (q_norm * c_norm) — so oracles stay bit-identical.
    # zero-norm vectors have no defined cosine, and under ANSI mode the
    # division aborts the whole job on ONE such row (real corpora contain
    # zero embeddings: failed encodes, padding). Policy: they never rank
    # — zero-norm corpus vectors are not candidates, zero-norm queries
    # return no rows. Oracles mirror the same WHERE.
    # the filter tests element-wise nonzero-ness (short-circuit exists),
    # NOT the computed __nv: a filter on the projected norm would be
    # pushed below the projection and DUPLICATE the fold per row
    corpus_n = corpus.filter(F.expr(_usable_vec_sql(vec_col))).select(
        F.col(id_col), F.col(vec_col), F.expr(_norm_sql(vec_col)).alias("__nv")
    )
    queries_n = queries.filter(F.expr(_usable_vec_sql(query_vec_col))).select(
        F.col(query_id_col), F.col(query_vec_col),
        F.expr(_norm_sql(query_vec_col)).alias("__qn"),
    )
    sim = F.expr(f"round({_dot_sql(query_vec_col, vec_col)} / (__qn * __nv), 6)")
    scored = corpus_n.crossJoin(F.broadcast(queries_n)).select(
        F.col(query_id_col),
        F.col(id_col),
        sim.alias("sim"),
    )
    order = [F.col("sim").desc(), F.col(id_col).asc()]
    return grouped_topk(scored, [query_id_col], order, k).select(
        query_id_col, id_col, "sim", "rnk"
    )


def cosine_topk_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    max_queries: int = 4096,
) -> DataFrame:
    """Exact brute-force cosine top-k, Arrow/BLAS execution.

    Same CONTRACT as ``cosine_topk`` (zero-norm policy, round-6 sims,
    id-tiebroken total order) but the scoring is one numpy matmul per
    Arrow batch — ``(batch x dim) @ (dim x Q)`` — instead of a per-pair
    ``zip_with``+``aggregate`` fold. The round-8 truncated-serve probe
    measured the fold's per-invocation overhead (lambda dispatch,
    intermediate array) dominating its cost at every vector length;
    BLAS amortizes all of it: 2 M x 64 dims x 32 queries scores in a
    few seconds vs ~28 s for the SQL fold (SCALING.md round-8). Each
    batch emits only its local per-query top-k, so at most Q*k rows
    per batch reach the final merge — identical shuffle shape to the
    ADC scorers. Use the SQL-fold ``cosine_topk`` where bit-exact
    DuckDB oracle parity matters (sequential left-fold summation); use
    THIS for production serving — the two can differ only when a
    pairwise-vs-sequential float sum lands exactly on a half-ulp of
    the 6-dp rounding quantum.

    The query side is collected once and broadcast in the task closure
    (bounded by ``max_queries`` — same loud guard as the ADC paths)."""
    import numpy as np

    from pyspark.sql import types as T

    from ._qmatrix import collect_query_matrix
    from .topk import grouped_topk

    qids, qmat, qn = collect_query_matrix(
        queries, query_id_col, query_vec_col, max_queries
    )
    qid_field = {f.name: f for f in queries.schema.fields}[query_id_col]
    in_fields = {f.name: f for f in corpus.schema.fields}
    schema = T.StructType(
        [
            T.StructField(query_id_col, qid_field.dataType),
            in_fields[id_col],
            T.StructField("sim", T.DoubleType()),
        ]
    )
    if len(qids) == 0:
        spark = queries.sparkSession
        fields = list(schema.fields) + [T.StructField("rnk", T.IntegerType())]
        return spark.createDataFrame([], T.StructType(fields)).select(
            query_id_col, id_col, "sim", "rnk"
        )
    qt = qmat.T  # (dim, Q)

    def batches(it):
        import pandas as pd

        for pdf in it:
            if len(pdf) == 0:
                continue
            mat = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            norms = np.sqrt((mat * mat).sum(axis=1))
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = np.round(mat @ qt / (norms[:, None] * qn[None, :]), 6)
            ids = pdf[id_col].values
            take = min(k, len(pdf))
            q_out, i_out, s_out = [], [], []
            for qi in range(len(qids)):
                col = sims[:, qi]
                best = np.lexsort((ids, -col))[:take]
                q_out.extend([qids[qi]] * take)
                i_out.extend(ids[best])
                s_out.extend(col[best])
            yield pd.DataFrame(
                {query_id_col: q_out, id_col: i_out, "sim": s_out}
            )

    # zero-norm / non-finite corpus vectors never rank — SAME JVM-side
    # screen as cosine_topk, applied before bytes cross to Python
    scored = (
        corpus.filter(F.expr(_usable_vec_sql(vec_col)))
        .select(id_col, vec_col)
        .mapInPandas(batches, schema)
    )
    return grouped_topk(
        scored, [query_id_col], [F.col("sim").desc(), F.col(id_col).asc()], k
    ).select(query_id_col, id_col, "sim", "rnk")


def mine_hard_negatives(
    corpus: DataFrame,
    anchors: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    anchor_id_col: str = "query_id",
    anchor_vec_col: str = "query_vec",
    anchor_label_col: str = "query_label",
    max_sim: float | None = None,
    min_sim: float | None = None,
) -> DataFrame:
    """Per-anchor top-k most-similar DIFFERENT-label corpus vectors —
    hard-negative mining for contrastive / embedding-model training.

    For every anchor, rank corpus vectors whose ``label_col`` differs
    from the anchor's ``anchor_label_col`` by cosine similarity
    descending and keep the top ``k``: the negatives that sit closest to
    the anchor in embedding space are exactly the ones a contrastive
    loss learns most from. Two standard screens are built in:

    - ``max_sim``: drop candidates ABOVE this similarity — the
      false-negative guard (a "negative" at sim 0.99 is usually an
      unlabeled positive or a near-duplicate; mining it in poisons the
      loss). Strict ``<`` so the cap itself is excluded.
    - ``min_sim``: drop candidates BELOW this floor — easy negatives a
      random sampler would find anyway; keeping the band tight makes
      every mined row informative. Inclusive ``>=`` (a floor admits its
      boundary; the common configuration is margin-shaped, e.g.
      ``min_sim=0.3, max_sim=0.95``).

    Plan shape is ``cosine_topk``'s (the anchors broadcast, the corpus
    streams, the only exchange carries (anchor_id, vec_id, label, sim)
    candidate tuples capped by the two-phase top-k) with the label
    inequality and the sim band applied BEFORE ranking, so screened-out
    rows never occupy a top-k slot. Same zero-norm policy and 6-dp
    round + id tiebreak as cosine_topk — the ranking is a total order
    and the numpy differential oracle (tests/test_mining.py) matches it
    exactly.

    Self-mining (anchors drawn from the corpus) needs no special case:
    the anchor's own row shares its label, so the inequality removes it
    along with every other same-label row. NULL labels satisfy neither
    side of ``!=`` (SQL three-valued logic): corpus rows with a NULL
    label are never returned as negatives (can't prove they differ) and
    NULL-labeled anchors return no rows — mirror of the zero-norm
    policy, documented rather than guessed."""
    corpus_n = corpus.filter(F.expr(_usable_vec_sql(vec_col))).select(
        F.col(id_col), F.col(vec_col), F.col(label_col),
        F.expr(_norm_sql(vec_col)).alias("__nv"),
    )
    anchors_n = anchors.filter(F.expr(_usable_vec_sql(anchor_vec_col))).select(
        F.col(anchor_id_col), F.col(anchor_vec_col), F.col(anchor_label_col),
        F.expr(_norm_sql(anchor_vec_col)).alias("__qn"),
    )
    sim = F.expr(
        f"round({_dot_sql(anchor_vec_col, vec_col)} / (__qn * __nv), 6)"
    )
    scored = (
        corpus_n.crossJoin(F.broadcast(anchors_n))
        .filter(F.col(label_col) != F.col(anchor_label_col))
        .select(
            F.col(anchor_id_col),
            F.col(id_col),
            F.col(label_col),
            sim.alias("sim"),
        )
    )
    if max_sim is not None:
        scored = scored.filter(F.col("sim") < F.lit(float(max_sim)))
    if min_sim is not None:
        scored = scored.filter(F.col("sim") >= F.lit(float(min_sim)))
    order = [F.col("sim").desc(), F.col(id_col).asc()]
    return grouped_topk(scored, [anchor_id_col], order, k).select(
        anchor_id_col, id_col, label_col, "sim", "rnk"
    )


def mine_hard_negatives_arrow(
    corpus: DataFrame,
    anchors: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    anchor_id_col: str = "query_id",
    anchor_vec_col: str = "query_vec",
    anchor_label_col: str = "query_label",
    max_sim: float | None = None,
    min_sim: float | None = None,
    max_anchors: int = 4096,
) -> DataFrame:
    """``mine_hard_negatives`` on the Arrow/BLAS execution path — same
    contract (label inequality, NULL-label and zero-norm policy, sim
    band applied BEFORE ranking, 6-dp round + id-asc tiebreak; the
    differential test pins row-for-row equality with the SQL fold),
    scored as one ``(batch x dim) @ (dim x A)`` matmul per corpus batch
    like ``cosine_topk_arrow``. The 100×-corpus probe measured the SQL
    fold at ~55 s for 200 k x 32 pairs; BLAS amortizes the per-pair
    fold overhead the same way it did for the truncated serve
    (SCALING.md round-8). Each batch emits only its local per-anchor
    top-k AFTER the label mask and the band, so at most A*k rows per
    batch reach the final merge and screened-out rows never occupy a
    top-k slot. Anchors are collected once into the task closure behind
    the shared loud guard (``max_anchors``)."""
    import numpy as np

    from pyspark.sql import types as T

    # capped fetch: the guard fires before an over-limit anchor side can
    # materialize on the driver (only the one sentinel row is extra)
    rows = (
        anchors.select(anchor_id_col, anchor_vec_col, anchor_label_col)
        .limit(max_anchors + 1)
        .collect()
    )
    if len(rows) > max_anchors:
        raise ValueError(
            f"anchor side exceeds max_anchors={max_anchors} (fetch capped "
            f"at {max_anchors + 1} rows — the actual count may be far "
            "larger): batch the anchor side (the closure grows linearly "
            "with it), or raise max_anchors deliberately"
        )
    usable_rows = [
        r
        for r in rows
        if r[2] is not None
        and r[1] is not None
        and len(r[1]) > 0
        and np.isfinite(np.asarray(r[1], dtype=np.float64)).all()
        and float(np.dot(r[1], r[1])) > 0.0
    ]

    in_fields = {f.name: f for f in corpus.schema.fields}
    aid_field = {f.name: f for f in anchors.schema.fields}[anchor_id_col]
    schema = T.StructType(
        [
            T.StructField(anchor_id_col, aid_field.dataType),
            in_fields[id_col],
            in_fields[label_col],
            T.StructField("sim", T.DoubleType()),
        ]
    )
    spark = anchors.sparkSession
    if not usable_rows:
        fields = list(schema.fields) + [T.StructField("rnk", T.IntegerType())]
        return spark.createDataFrame([], T.StructType(fields)).select(
            anchor_id_col, id_col, label_col, "sim", "rnk"
        )
    aids = [r[0] for r in usable_rows]
    alabels = np.array([r[2] for r in usable_rows])
    amat = np.array([list(r[1]) for r in usable_rows], dtype=np.float64)
    an = np.sqrt((amat * amat).sum(axis=1))
    at = amat.T  # (dim, A)

    def batches(it):
        import pandas as pd

        for pdf in it:
            if len(pdf) == 0:
                continue
            mat = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            norms = np.sqrt((mat * mat).sum(axis=1))
            sims = np.round(mat @ at / (norms[:, None] * an[None, :]), 6)
            ids = pdf[id_col].values
            labels = pdf[label_col].values
            q_out, i_out, l_out, s_out = [], [], [], []
            for ai in range(len(aids)):
                col = sims[:, ai]
                mask = labels != alabels[ai]
                if max_sim is not None:
                    mask &= col < max_sim
                if min_sim is not None:
                    mask &= col >= min_sim
                idx = np.flatnonzero(mask)
                if len(idx) == 0:
                    continue
                best = idx[np.lexsort((ids[idx], -col[idx]))[:k]]
                q_out.extend([aids[ai]] * len(best))
                i_out.extend(ids[best])
                l_out.extend(labels[best])
                s_out.extend(col[best])
            yield pd.DataFrame(
                {
                    anchor_id_col: q_out,
                    id_col: i_out,
                    label_col: l_out,
                    "sim": s_out,
                }
            )

    # JVM-side screens BEFORE bytes cross to Python: zero-norm vectors
    # never rank (same as cosine_topk_arrow) and NULL-label rows are
    # never negatives — dropping them here also keeps the pandas label
    # dtype un-promoted (a nullable int column would arrive as float64
    # + NaN, and NaN != x is TRUE in numpy, silently re-admitting the
    # rows the policy excludes).
    scored = (
        corpus.filter(F.expr(_usable_vec_sql(vec_col)))
        .filter(F.col(label_col).isNotNull())
        .select(id_col, vec_col, label_col)
        .mapInPandas(batches, schema)
    )
    return grouped_topk(
        scored,
        [anchor_id_col],
        [F.col("sim").desc(), F.col(id_col).asc()],
        k,
    ).select(anchor_id_col, id_col, label_col, "sim", "rnk")


def derive_centroids(
    corpus: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic seed centroids: the first ``n_centroids`` corpus
    vectors by id — one tiny TakeOrdered job collecting metadata-scale
    rows to the driver."""
    return [
        (row[0], list(row[1]))
        for row in corpus.filter(F.expr(_usable_vec_sql(vec_col)))
        .orderBy(F.col(id_col).asc())
        .limit(n_centroids)
        .select(id_col, vec_col)
        .collect()
    ]  # zero-norm vectors are excluded: a zero centroid has no cosine


def _seq_norm(vec: Sequence[float]) -> float:
    """Driver-side vector norm with the same sequential left-fold order
    as the Spark-side ``norm`` fold — identical IEEE result."""
    acc = 0.0
    for x in vec:
        acc += float(x) * float(x)
    return acc**0.5


def lloyd_refine(
    corpus: DataFrame,
    centroid_rows: Sequence[tuple[int, Sequence[float]]],
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Refine IVF centroids with ``iters`` Lloyd (k-means) steps: assign
    every vector to its nearest centroid (the existing zero-shuffle
    literal projection), then recompute each centroid as its bucket's
    per-dimension mean. One posexplode shuffle of (centroid_id, dim,
    value) triples per iteration — k*d tiny rows return to the driver.

    Training is index-build time, amortized over every query served.
    Assignment is by cosine while the update is the plain mean (spherical
    k-means without the normalization step), so the euclidean-k-means
    monotonicity proof doesn't strictly apply — empirically on the
    embeddings fixture it lifts nprobe=2 recall from 0.28 to ~0.48 in
    one step. Empty buckets keep their old centroid."""
    centroids = [(int(c), list(map(float, v))) for c, v in centroid_rows]
    for _ in range(iters):
        assigned = assign_ivf_buckets(corpus, centroids, id_col, vec_col)
        means = (
            assigned.select("centroid_id", F.posexplode(vec_col).alias("dim", "x"))
            .groupBy("centroid_id", "dim")
            .agg(F.avg("x").alias("m"))
            .groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select("centroid_id", F.col("dm.m").alias("mean_vec"))
            .collect()
        )
        new = {int(r.centroid_id): [float(x) for x in r.mean_vec] for r in means}
        # zero-norm means (a bucket of exact negations averages to the
        # origin) keep the OLD centroid: a zero centroid has no cosine
        # and would divide-by-zero the next assignment pass (ANSI abort
        # on the literal path, inf/nan garbage on the Arrow path)
        centroids = [
            (cid, new[cid] if _seq_norm(new.get(cid, [])) > 0 else vec)
            for cid, vec in centroids
        ]
    return centroids


# Above this many centroids the literal-array trick stops being the right
# tool: the expression tree (and codegen input) grows O(n_centroids x dim),
# so plan construction/analysis time blows up long before execution does.
# Past the threshold, centroid scoring switches to an Arrow-batched numpy
# matmul against a plan-size-constant broadcast matrix. 64 x dim literals
# is comfortably inside Catalyst's budget; 10^3..10^5 centroids is not.
LITERAL_CENTROID_MAX = 64


def _centroid_matrix(centroid_rows: Sequence[tuple[int, Sequence[float]]]):
    """(ids, matrix, norms) as numpy arrays — the broadcast index metadata
    of the large-k path. Rows stay in centroid_id order so first-max
    argmax ties resolve to the smallest centroid id, matching the literal
    path's array_position semantics."""
    import numpy as np

    ids = np.array([int(cid) for cid, _ in centroid_rows], dtype=np.int64)
    mat = np.array([list(map(float, v)) for _, v in centroid_rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    return ids, mat, norms


def _assign_buckets_arrow(
    corpus: DataFrame,
    centroid_rows: Sequence[tuple[int, Sequence[float]]],
    id_col: str,
    vec_col: str,
    keep_norm: bool,
) -> DataFrame:
    """Large-k coarse quantizer: one numpy (batch x dim) @ (dim x k)
    matmul per Arrow batch. Still a narrow map — no shuffle, output
    partitioning == input partitioning — and the plan size is constant in
    n_centroids (the matrix rides along as a task-broadcast closure, the
    same way a real IVF index ships its codebook). BLAS summation order
    differs from the sequential SQL fold in the last ulp, which the 6-dp
    round absorbs except on exact ties — acceptable for an approximate
    assignment (recall-tested), not used on oracle-checked paths.
    """
    from pyspark.sql import types as T

    cids, cmat, cnorms = _centroid_matrix(centroid_rows)
    in_fields = {f.name: f for f in corpus.schema.fields}
    fields = [in_fields[id_col], in_fields[vec_col]]
    if keep_norm:
        fields.append(T.StructField("__nv", T.DoubleType()))
    fields.append(T.StructField("centroid_id", T.LongType()))
    schema = T.StructType(fields)

    def batches(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            if len(pdf) == 0:
                continue
            vecs = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            nv = np.sqrt((vecs * vecs).sum(axis=1))
            sims = np.round((vecs @ cmat.T) / (nv[:, None] * cnorms[None, :]), 6)
            out = {id_col: pdf[id_col].values, vec_col: pdf[vec_col].values}
            if keep_norm:
                out["__nv"] = nv
            out["centroid_id"] = cids[sims.argmax(axis=1)]
            yield pd.DataFrame(out)

    return corpus.select(id_col, vec_col).mapInPandas(batches, schema)


def _query_probes_arrow(
    queries: DataFrame,
    centroid_rows: Sequence[tuple[int, Sequence[float]]],
    nprobe: int,
    query_id_col: str,
    query_vec_col: str,
) -> DataFrame:
    """Large-k probe selection: score all centroids per query with one
    matmul, keep the nprobe best. Stable argsort on -sim preserves
    centroid-id order on ties — the same (qsim DESC, centroid_id ASC)
    total order as the literal path's sort_array."""
    from pyspark.sql import types as T

    cids, cmat, cnorms = _centroid_matrix(centroid_rows)
    in_fields = {f.name: f for f in queries.schema.fields}
    schema = T.StructType(
        [
            in_fields[query_id_col],
            in_fields[query_vec_col],
            T.StructField("__qn", T.DoubleType()),
            T.StructField("centroid_id", T.LongType()),
        ]
    )
    take = min(nprobe, len(centroid_rows))

    def batches(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            if len(pdf) == 0:
                continue
            vecs = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[query_vec_col]]
            )
            qn = np.sqrt((vecs * vecs).sum(axis=1))
            sims = np.round((vecs @ cmat.T) / (qn[:, None] * cnorms[None, :]), 6)
            best = np.argsort(-sims, axis=1, kind="stable")[:, :take]
            idx = np.repeat(np.arange(len(pdf)), take)
            yield pd.DataFrame(
                {
                    query_id_col: pdf[query_id_col].values[idx],
                    query_vec_col: pdf[query_vec_col].values[idx],
                    "__qn": qn[idx],
                    "centroid_id": cids[best.ravel()],
                }
            )

    return queries.select(query_id_col, query_vec_col).mapInPandas(batches, schema)


def assign_ivf_buckets(
    corpus: DataFrame,
    centroid_rows: Sequence[tuple[int, Sequence[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_norm: bool = False,
) -> DataFrame:
    """Assign each vector to its nearest centroid (cosine) — the 'coarse
    quantizer' of an IVF index — as a pure projection with ZERO shuffle.
    With ``keep_norm`` the row's precomputed norm survives as ``__nv`` so
    downstream scoring pays one fold per pair instead of three.

    ``centroid_rows`` are (centroid_id, vector) pairs already on the
    driver (n_centroids tiny rows — metadata, not data). Each centroid
    becomes a literal array expression. The round-1 plan instead
    crossJoined broadcast centroids and ran a window partitioned by
    vec_id — an n_centroids x N row shuffle carrying full embeddings,
    purely to compute an argmax that needs no shuffle at all.

    Expression economics (the folds are interpreted, so evaluation count
    is the cost): the row's norm is projected ONCE, the n_centroids
    rounded sims are materialized ONCE into an array column (separate
    projection steps — CollapseProject keeps multiply-referenced
    non-trivial expressions materialized), centroid norms are Python
    constants, and the argmax is array_max + array_position (first match
    == smallest centroid position, the same total order as the old
    window's ``csim DESC, centroid_id ASC`` since centroid_rows are id-
    ordered). Total: n_centroids + 1 folds per row, vs the naive
    greatest()+when-chain form that re-evaluates every sim 2-3x.

    At scale you'd persist the result partitioned by centroid_id;
    queries then prune to nprobe partitions.

    Past ``LITERAL_CENTROID_MAX`` centroids the literal expression tree
    would grow O(n_centroids x dim) at plan-build time; the Arrow matmul
    path takes over with a plan whose size is constant in n_centroids.
    """
    # the usable-vector filter applies BEFORE dispatch: the Arrow path
    # would otherwise matmul NaN/zero vectors into garbage buckets
    corpus = corpus.filter(F.expr(_usable_vec_sql(vec_col)))
    if len(centroid_rows) > LITERAL_CENTROID_MAX:
        return _assign_buckets_arrow(corpus, centroid_rows, id_col, vec_col, keep_norm)
    with_norm = corpus.select(
        F.col(id_col), F.col(vec_col), F.expr(_norm_sql(vec_col)).alias("__nv")
    )
    sims_sql = ",".join(
        f"round({_dot_sql(_vec_sql(cvec), vec_col)}"
        f" / (CAST({_seq_norm(cvec)!r} AS DOUBLE) * __nv), 6)"
        for _cid, cvec in centroid_rows
    )
    scored = with_norm.select(
        F.col(id_col),
        F.col(vec_col),
        F.col("__nv"),
        F.expr(f"array({sims_sql})").alias("__sims"),
    )
    ids_arr = F.array(*[F.lit(cid).cast("long") for cid, _ in centroid_rows])
    pos = F.array_position(F.col("__sims"), F.array_max(F.col("__sims")))
    out = [
        F.col(id_col),
        F.col(vec_col),
        F.element_at(ids_arr, pos.cast("int")).alias("centroid_id"),
    ]
    if keep_norm:
        out.insert(2, F.col("__nv"))
    return scored.select(*out)


def _query_probes(
    queries: DataFrame,
    centroid_rows: Sequence[tuple[int, Sequence[float]]],
    nprobe: int,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Per query: the ``nprobe`` nearest centroids, via the literal-
    centroid trick — sort_array on (neg_sim, centroid_id) structs gives
    the (qsim DESC, centroid_id ASC) order without a shuffle. Large
    centroid counts dispatch to the Arrow matmul path (same order,
    constant plan size)."""
    queries = queries.filter(F.expr(_usable_vec_sql(query_vec_col)))
    if len(centroid_rows) > LITERAL_CENTROID_MAX:
        return _query_probes_arrow(
            queries, centroid_rows, nprobe, query_id_col, query_vec_col
        )
    queries_n = queries.select(
        query_id_col,
        query_vec_col,
        F.expr(_norm_sql(query_vec_col)).alias("__qn"),
    )
    entries_sql = ",".join(
        f"struct(-round({_dot_sql(_vec_sql(cvec), query_vec_col)}"
        f" / (CAST({_seq_norm(cvec)!r} AS DOUBLE) * __qn), 6) AS neg_sim,"
        f" CAST({int(cid)} AS BIGINT) AS centroid_id)"
        for cid, cvec in centroid_rows
    )
    return (
        queries_n.select(
            query_id_col,
            query_vec_col,
            "__qn",
            F.explode(
                F.slice(F.sort_array(F.expr(f"array({entries_sql})")), 1, nprobe)
            ).alias("p"),
        ).select(
            query_id_col,
            query_vec_col,
            "__qn",
            F.col("p.centroid_id").alias("centroid_id"),
        )
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_centroids: int = 8,
    nprobe: int = 2,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    centroid_rows: Sequence[tuple[int, Sequence[float]]] | None = None,
    train_iters: int = 1,
) -> DataFrame:
    """Approximate cosine top-k: probe only the ``nprobe`` nearest
    centroid buckets per query.

    Centroids are index METADATA: pass precomputed ``centroid_rows``
    (trained/derived once, cached per dataset — what a real IVF index
    stores) to skip index building entirely. When absent they are seeded
    deterministically as the first ``n_centroids`` corpus vectors and
    refined with ``train_iters`` Lloyd steps (lloyd_refine; ~1.7x the
    nprobe=2 recall for one step on the fixture), collected to the
    driver ONCE — n_centroids rows. From there the whole plan is
    shuffle-free on the corpus side: bucket assignment is a literal
    projection, probe pruning is a broadcast equi-join, and only the
    (query_id, vec_id, sim) candidate tuples enter the two-phase top-k
    exchange.
    """
    if centroid_rows is None:
        centroid_rows = derive_centroids(corpus, n_centroids, id_col, vec_col)
        if train_iters:
            centroid_rows = lloyd_refine(
                corpus, centroid_rows, train_iters, id_col, vec_col
            )
    bucketed = assign_ivf_buckets(corpus, centroid_rows, id_col, vec_col, keep_norm=True)
    probes = _query_probes(
        queries, centroid_rows, nprobe, query_id_col, query_vec_col
    )

    # search only the probed buckets (broadcast equi-join prunes; the
    # corpus-side rows stream through without an exchange). One dot fold
    # per pair — both norms were precomputed upstream.
    sim = F.expr(f"round({_dot_sql(query_vec_col, vec_col)} / (__qn * __nv), 6)")
    scored = bucketed.join(F.broadcast(probes), "centroid_id").select(
        F.col(query_id_col), F.col(id_col), sim.alias("sim")
    )
    order = [F.col("sim").desc(), F.col(id_col).asc()]
    return grouped_topk(scored, [query_id_col], order, k).select(
        query_id_col, id_col, "sim", "rnk"
    )


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    n_centroids: int = 8,
    train_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Materialize the IVF index: the corpus bucketed by nearest centroid,
    written hive-partitioned by ``centroid_id`` (with precomputed norms),
    plus the trained centroids as a JSON sidecar — what an IVF index IS
    at 100 TB: partitioned storage + metadata. Serving then reads ONLY
    the probed partitions from disk (see ivf_topk_on_index), instead of
    re-bucketing the corpus per query batch."""
    import json
    import os

    cents = derive_centroids(corpus, n_centroids, id_col, vec_col)
    if train_iters:
        cents = lloyd_refine(corpus, cents, train_iters, id_col, vec_col)
    bucketed = assign_ivf_buckets(corpus, cents, id_col, vec_col, keep_norm=True)
    bucketed.write.mode("overwrite").partitionBy("centroid_id").parquet(path)
    with open(os.path.join(path, "_centroids.json"), "w") as f:
        json.dump([[cid, list(vec)] for cid, vec in cents], f)
    return cents


def load_ivf_centroids(path: str) -> list[tuple[int, list[float]]]:
    import json
    import os

    with open(os.path.join(path, "_centroids.json")) as f:
        return [(int(cid), [float(x) for x in vec]) for cid, vec in json.load(f)]


def ivf_topk_on_index(
    spark,
    path: str,
    queries: DataFrame,
    nprobe: int = 2,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Serve approximate top-k from a persisted IVF index: compute the
    query batch's probes, then scan ONLY the union of probed
    ``centroid_id=`` partitions (an isin over at most n_centroids values
    — hive partition pruning turns it into a directory filter, so the
    unprobed fraction of the corpus is never read from disk), and finish
    with the same broadcast-probe join + two-phase top-k as ivf_topk."""
    cents = load_ivf_centroids(path)
    # checkpoint: the probes plan serves TWO consumers (the pruning
    # collect and the broadcast join) — un-materialized it would execute
    # the probe scoring twice per serve call
    probes = _query_probes(
        queries, cents, nprobe, query_id_col, query_vec_col
    ).localCheckpoint(eager=True)
    probed_ids = sorted(
        {r.centroid_id for r in probes.select("centroid_id").distinct().collect()}
    )
    index = spark.read.parquet(path).filter(F.col("centroid_id").isin(probed_ids))
    sim = F.expr(f"round({_dot_sql(query_vec_col, vec_col)} / (__qn * __nv), 6)")
    scored = index.join(F.broadcast(probes), "centroid_id").select(
        F.col(query_id_col), F.col(id_col), sim.alias("sim")
    )
    order = [F.col("sim").desc(), F.col(id_col).asc()]
    return grouped_topk(scored, [query_id_col], order, k).select(
        query_id_col, id_col, "sim", "rnk"
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    srp_planes: int | None = None,
    srp_bands: int = 8,
    dim: int | None = None,
    seed: int = 7,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within equality blocks.

    Blocking on ``block_col`` (a cluster/label/LSH-bucket column) keeps
    the pair space sum-of-squares-of-blocks instead of N^2; the join is a
    plain shuffled equi-join so AQE skew handling applies. Norms are
    projected once per row BEFORE the join (N folds, not |pairs| folds);
    per pair only the dot fold remains, in the same IEEE op order as
    cosine() so the oracle stays bit-identical.

    EXACT within-block pairing is quadratic in block population — fine
    while blocks stay small, but a growing corpus over a FIXED label set
    (the round-5 mixed-corpus sweep's finding: 100x corpus, same labels
    -> 10,000x scored pairs) needs ``srp_planes``: candidates then come
    from signed-random-projection banding WITHIN the block (same SRP
    family as lsh_ann_topk — map-only band keys, band equi-join), and
    only colliding candidates pay the exact-cosine verification, which
    keeps reported sims identical. The trade is recall<1 on pairs near
    the threshold; per-bit collision is 1-angle/pi, so BAND WIDTH
    (srp_planes/srp_bands) is the lever on both recall and cost —
    narrow bands admit near-orthogonal pairs too (width 4 admits ~40%
    of ALL random pairs across 8 bands: that is 0.4x the quadratic,
    not sub-quadratic — the round-5 mixed-corpus sweep caught exactly
    this). Size the scheme with ``srp_params_for(threshold, recall)``
    rather than guessing; past 64 total planes the band keys come from
    an Arrow matmul instead of the packed-bigint literal projection
    (same keys, plan size constant in plane count). Use the exact path
    for oracle-grade completeness on bounded blocks, SRP for production
    near-dup thresholds (>=0.9) at scale. ``dim`` skips the one-row
    dimension probe (pass it to keep plan builds job-free).
    """
    with_n = embeddings.filter(
        F.expr(_usable_vec_sql(vec_col))  # zero/non-finite vectors never pair
    ).select(
        F.col(id_col),
        F.col(vec_col),
        F.col(block_col),
        F.expr(_norm_sql(vec_col)).alias("__n"),
    )
    sim = F.expr(
        f"round({_dot_sql(f'a.{vec_col}', f'b.{vec_col}')} / (a.__n * b.__n), 6)"
    )
    if srp_planes is None:
        a = with_n.alias("a")
        b = with_n.alias("b")
        return (
            a.join(
                b,
                [
                    F.col(f"a.{block_col}") == F.col(f"b.{block_col}"),
                    F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
                ],
            )
            .select(
                F.col(f"a.{id_col}").alias("vec_id_a"),
                F.col(f"b.{id_col}").alias("vec_id_b"),
                sim.alias("sim"),
            )
            .filter(F.col("sim") >= threshold)
        )
    if srp_planes % srp_bands:
        raise ValueError(f"srp_planes={srp_planes} not divisible by srp_bands={srp_bands}")
    width = srp_planes // srp_bands
    mask = (1 << width) - 1
    if dim is None:
        probe = with_n.select(vec_col).first()
        if probe is None:
            spark = embeddings.sparkSession
            id_t = embeddings.schema[id_col].dataType.simpleString()
            return spark.createDataFrame(
                [], f"vec_id_a {id_t}, vec_id_b {id_t}, sim double"
            )
        dim = len(probe[0])
    planes = _srp_planes(srp_planes, dim, seed)
    if srp_planes <= _SRP_PACK_MAX:
        banded = with_n.withColumn("__sig", srp_signature(vec_col, planes)).select(
            id_col,
            vec_col,
            block_col,
            "__n",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(bnd).alias("band"),
                            F.shiftright("__sig", bnd * width)
                            .bitwiseAND(F.lit(mask))
                            .alias("bval"),
                        )
                        for bnd in range(srp_bands)
                    ]
                )
            ).alias("bk"),
        ).select(id_col, vec_col, block_col, "__n", "bk.band", "bk.bval")
    else:
        # past the 64-bit pack (and the literal-expression economics),
        # band values come from one Arrow matmul per batch — the same
        # large-k posture as the IVF coarse quantizer: narrow map, no
        # shuffle, plan size constant in srp_planes. Both join sides
        # read the SAME banded frame, so a sign flip on a dot==0 ulp
        # tie stays self-consistent.
        banded = _srp_banded_arrow(
            with_n, planes, srp_bands, id_col, vec_col, block_col
        )
    a, b = banded.alias("a"), banded.alias("b")
    # score BEFORE the multi-band dedup (lsh_ann_topk's trick): the
    # dedup shuffle then moves 3 scalars per candidate, not two vectors
    return (
        a.join(
            b,
            [
                F.col("a.band") == F.col("b.band"),
                F.col("a.bval") == F.col("b.bval"),
                F.col(f"a.{block_col}") == F.col(f"b.{block_col}"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("vec_id_a"),
            F.col(f"b.{id_col}").alias("vec_id_b"),
            sim.alias("sim"),
        )
        .dropDuplicates(["vec_id_a", "vec_id_b"])
        .filter(F.col("sim") >= threshold)
    )


def with_prefix_column(
    df: DataFrame,
    prefilter_dim: int,
    vec_col: str = "embedding",
    prefix_col: str = "embedding_prefix",
) -> DataFrame:
    """Write-once companion of ``truncated_prefilter_topk``'s
    ``prefix_col`` mode: materialize the first ``prefilter_dim`` dims
    as their own column so serving scans prune to it. Store the result
    (parquet) — the point is paying the slice once at write time
    instead of on every query's stage-1 scan."""
    if prefilter_dim < 1:
        raise ValueError(f"prefilter_dim must be >= 1, got {prefilter_dim}")
    return df.withColumn(
        prefix_col, F.expr(f"slice({vec_col}, 1, {prefilter_dim})")
    )


def truncated_prefilter_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    prefilter_dim: int = 16,
    shortlist: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    prefix_col: str | None = None,
) -> DataFrame:
    """Matryoshka-style two-stage cosine top-k: a cheap scan on the
    FIRST ``prefilter_dim`` dimensions shortlists candidates, then only
    those rows re-score with the full-dimension exact cosine.

    Stage 1 pays ``prefilter_dim / dim`` of the flops of the brute scan
    (and, when the truncated prefix is stored as its own column, the
    same fraction of scanned bytes — the serving win this exists for at
    100 TB); stage 2 touches ``Q x shortlist`` rows via an id-equi-join
    with the shortlist broadcast into the corpus scan. Ranking quality
    rests on the embedding being truncation-faithful (Matryoshka-
    trained, or PCA-rotated so leading dims carry the variance); with
    ``shortlist >= |corpus|`` the composition degenerates to the exact
    ``cosine_topk`` answer, which the tests pin. Vectors whose
    truncated prefix is all-zero cannot rank in stage 1 and are
    excluded there (same zero-norm policy as every cosine path).

    Same output contract as ``cosine_topk``: (query_id, vec_id, sim,
    rnk) with round-6 + id tiebreak total ordering, ``sim`` exact.

    ``prefix_col``: name of a STORED truncated-prefix column (written
    once via :func:`with_prefix_column`). With it, stage 1 never reads
    the full-vector column at all — the scan projects (id, prefix)
    only, so parquet column pruning cuts stage-1 scanned bytes by
    ~dim/prefilter_dim; the full vectors are read just for the
    Q x shortlist stage-2 lookup. This is the layout the operator is
    designed around at 100 TB; the ``slice()`` path is the
    zero-preparation fallback."""
    from .topk import grouped_topk

    if prefilter_dim < 1:
        raise ValueError(f"prefilter_dim must be >= 1, got {prefilter_dim}")
    sl = shortlist if shortlist is not None else max(4 * k, 100)

    if prefix_col is not None:
        corpus_t = (
            corpus.select(F.col(id_col), F.col(prefix_col).alias("__tv"))
            .filter(F.expr(_usable_vec_sql("__tv")))
            .withColumn("__tnv", F.expr(_norm_sql("__tv")))
        )
    else:
        corpus_t = (
            corpus.filter(F.expr(_usable_vec_sql(vec_col)))
            .select(
                F.col(id_col),
                F.expr(f"slice({vec_col}, 1, {prefilter_dim})").alias("__tv"),
            )
            .filter(F.expr(_usable_vec_sql("__tv")))
            .withColumn("__tnv", F.expr(_norm_sql("__tv")))
        )
    queries_t = (
        queries.filter(F.expr(_usable_vec_sql(query_vec_col)))
        .select(
            F.col(query_id_col),
            F.col(query_vec_col),
            F.expr(f"slice({query_vec_col}, 1, {prefilter_dim})").alias("__tq"),
        )
        .filter(F.expr(_usable_vec_sql("__tq")))
        .withColumn("__tqn", F.expr(_norm_sql("__tq")))
    )
    sim_t = F.expr(f"round({_dot_sql('__tq', '__tv')} / (__tqn * __tnv), 6)")
    scored_t = corpus_t.crossJoin(
        F.broadcast(queries_t.select(query_id_col, "__tq", "__tqn"))
    ).select(F.col(query_id_col), F.col(id_col), sim_t.alias("__tsim"))
    short = grouped_topk(
        scored_t,
        [query_id_col],
        [F.col("__tsim").desc(), F.col(id_col).asc()],
        sl,
    ).select(query_id_col, id_col)

    # stage 2: exact full-dim cosine on the Q x shortlist survivors —
    # shortlist ids broadcast into the corpus lookup, queries broadcast
    # into the scored join; the full corpus is never exactly scored
    full = corpus.filter(F.expr(_usable_vec_sql(vec_col))).select(
        F.col(id_col), F.col(vec_col), F.expr(_norm_sql(vec_col)).alias("__nv")
    )
    qfull = queries_t.select(
        F.col(query_id_col),
        F.col(query_vec_col),
        F.expr(_norm_sql(query_vec_col)).alias("__qn"),
    )
    cand = full.join(F.broadcast(short), id_col).join(
        F.broadcast(qfull), query_id_col
    )
    sim = F.expr(
        f"round({_dot_sql(query_vec_col, vec_col)} / (__qn * __nv), 6)"
    )
    rescored = cand.select(
        F.col(query_id_col), F.col(id_col), sim.alias("sim")
    )
    return grouped_topk(
        rescored, [query_id_col], [F.col("sim").desc(), F.col(id_col).asc()], k
    ).select(query_id_col, id_col, "sim", "rnk")


def dedup_semantic(
    items: DataFrame,
    embeddings: DataFrame,
    threshold: float = 0.95,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication: collapse groups of items
    whose EMBEDDINGS are near-identical (cosine >= threshold within
    equality blocks) to one canonical member — catches paraphrases and
    re-encodings that text-level dedup (exact/MinHash/SimHash) cannot
    see, at the price of trusting the embedding space.

    Composition of the existing scale pieces: blocked cosine pairs
    (cosine_near_dup_pairs — no all-pairs work outside blocks) ->
    connected components (dedup.connected_components — driver union-find
    under the edge-count guard, pointer-jumped propagation above it) ->
    one anti-join against the non-canonical vertex set. ``items`` is any
    relation keyed by ``id_col`` (documents, images, rows of a training
    mix); ``embeddings`` maps the same ids to vectors."""
    from .dedup import dedup_keep_canonical

    pairs = cosine_near_dup_pairs(
        embeddings, threshold, block_col, id_col, vec_col
    )
    return dedup_keep_canonical(
        items, pairs, id_col=id_col, a_col="vec_id_a", b_col="vec_id_b"
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (random hyperplane / SRP) — the second scale path the
# extension mandate names alongside IVF. Signatures are sign-bits of
# projections onto deterministic pseudo-random hyperplanes; banded
# signature prefixes form the buckets; candidates rerank with the exact
# rounded cosine. Complements IVF: no training pass at all (hyperplanes
# are seed-derived constants), at the price of less adaptive buckets.
# ---------------------------------------------------------------------------


_SRP_PACK_MAX = 64  # sign bits packed into ONE bigint by srp_signature


def srp_params_for(
    threshold: float, recall: float = 0.95, max_planes: int = 256
) -> tuple[int, int]:
    """Pick ``(srp_planes, srp_bands)`` so a pair at EXACTLY
    ``threshold`` cosine survives candidate generation with probability
    >= ``recall`` — pairs above the threshold survive with higher
    probability, and wider bands admit fewer random pairs.

    The math (standard SRP-LSH): per-bit collision for angle t is
    ``p = 1 - acos(threshold)/pi``; a width-w band collides with
    ``p**w``; b bands give recall ``1 - (1 - p**w)**b``. For each band
    width the minimal band count hitting ``recall`` is computed, and
    the WIDEST width whose total plane budget fits ``max_planes`` wins:
    width drives the random-collision rate ``~b * 2**-w`` — the term
    that decides whether banding is sub-quadratic on a big block — so
    spend the whole budget on width. The round-5 mixed-corpus sweep is
    the motivation: 32 planes / 8 bands (width 4) admits ~40% of ALL
    near-orthogonal pairs, which is the quadratic it was meant to
    avoid; at threshold 0.9 this returns (216, 18) — width 12, random
    admission ~0.4%."""
    import math

    if not -1.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (-1, 1), got {threshold}")
    if not 0.0 < recall < 1.0:
        raise ValueError(f"recall must be in (0, 1), got {recall}")
    p_bit = 1.0 - math.acos(threshold) / math.pi
    best = None
    for width in range(2, 65):
        p_band = p_bit**width
        if p_band <= 0.0:
            break
        bands = math.ceil(math.log(1.0 - recall) / math.log(1.0 - p_band))
        if width * bands <= max_planes:
            best = (width * bands, bands)  # ascending: last kept = widest
    if best is None:
        raise ValueError(
            f"no (width, bands) meets recall {recall} at threshold "
            f"{threshold} within max_planes={max_planes}; raise max_planes"
        )
    return best


def _srp_banded_arrow(
    with_n: DataFrame,
    planes: Sequence[Sequence[float]],
    bands: int,
    id_col: str,
    vec_col: str,
    block_col: str,
) -> DataFrame:
    """Band-value projection for plane counts past the 64-bit pack:
    one (batch x dim) @ (dim x n_planes) matmul per Arrow batch, sign
    bits reshaped (bands, width) and packed per band — bit i of band b
    is plane ``b*width + i`` with weight ``2**i``, the same layout the
    literal ``shiftright(sig, b*width) & mask`` path extracts, so the
    two paths produce identical band keys up to matmul ulp on exact
    dot==0 ties."""
    import numpy as np

    from pyspark.sql import types as T

    pmat = np.array([list(map(float, p)) for p in planes], dtype=np.float64)
    width = len(planes) // bands
    weights = np.left_shift(np.int64(1), np.arange(width, dtype=np.int64))
    in_fields = {f.name: f for f in with_n.schema.fields}
    schema = T.StructType(
        [
            in_fields[id_col],
            in_fields[vec_col],
            in_fields[block_col],
            T.StructField("__n", T.DoubleType()),
            T.StructField("band", T.IntegerType(), False),
            T.StructField("bval", T.LongType(), False),
        ]
    )
    n_bands = bands

    def batches(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            if len(pdf) == 0:
                continue
            vecs = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            bits = (vecs @ pmat.T) >= 0.0  # (batch, n_planes)
            bvals = (
                bits.reshape(len(pdf), n_bands, width) * weights[None, None, :]
            ).sum(axis=2)
            idx = np.repeat(np.arange(len(pdf)), n_bands)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values[idx],
                    vec_col: pdf[vec_col].values[idx],
                    block_col: pdf[block_col].values[idx],
                    "__n": pdf["__n"].values[idx],
                    "band": np.tile(
                        np.arange(n_bands, dtype=np.int32), len(pdf)
                    ),
                    "bval": bvals.ravel().astype(np.int64),
                }
            )

    return with_n.select(id_col, vec_col, block_col, "__n").mapInPandas(
        batches, schema
    )


def _srp_planes(n_planes: int, dim: int, seed: int = 7) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes: seeded PRNG, no data pass —
    the index metadata is literally a seed + shape."""
    import random as _random

    rng = _random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def srp_signature(vec_col: str, planes: Sequence[Sequence[float]]) -> Column:
    """Packed sign-bit signature: bit i = 1 iff dot(v, plane_i) >= 0.
    n_planes literal dot folds per row — same literal-inlining economics
    as the IVF coarse quantizer (zero shuffle, plans bounded by
    LITERAL_CENTROID_MAX-scale plane counts). Hard cap: one bigint holds
    64 sign bits — wider schemes use the per-band Arrow projection
    (_srp_banded_arrow)."""
    if len(planes) > _SRP_PACK_MAX:
        raise ValueError(
            f"{len(planes)} planes exceed the {_SRP_PACK_MAX}-bit pack"
        )
    bits = " + ".join(
        f"if({_dot_sql(_vec_sql(p), vec_col)} >= 0.0, "
        f"shiftleft(cast(1 as bigint), {i}), cast(0 as bigint))"
        for i, p in enumerate(planes)
    )
    return F.expr(f"({bits})")


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 16,
    n_bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    seed: int = 7,
    dim: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k via signed-random-projection LSH.

    Shape: signature projection (map-only, literal planes) -> explode
    into ``n_bands`` band keys -> band equi-join queries x corpus (only
    colliding buckets pair; AQE handles skewed buckets) -> exact rounded
    cosine rerank of the candidate set -> two-phase grouped top-k with
    the id tiebreak. A query can emit fewer than k rows when its buckets
    hold fewer than k candidates — the standard LSH-ANN recall trade.

    Tuning: band WIDTH (n_planes/n_bands) sets the collision bar. SRP
    collision probability per bit is 1 - angle/pi, so wide bands only
    recall neighbors that are actually close — on the synthetic fixture
    (random, near-orthogonal vectors; true top-k cosine ~0.4) width-4
    bands recall ~0.5 and width-2 recall ~1.0 at 4x the candidates,
    while a real embedding corpus with genuine near-neighbors supports
    width 8-16 at a tiny candidate fraction. Measure recall on YOUR
    corpus (tests/test_operators.py shows the harness).
    """
    assert n_planes % n_bands == 0
    width = n_planes // n_bands
    mask = (1 << width) - 1
    if dim is None:
        # hyperplanes need the vector dimension; probing the first
        # USABLE corpus row costs one small driver job at composition
        # time — pass dim explicitly to build the plan without it
        probe = (
            corpus.filter(F.expr(_usable_vec_sql(vec_col)))
            .select(vec_col)
            .first()
        )
        if probe is None:
            # empty/all-degenerate corpus: no candidates for any query —
            # return the operator's empty result, not a TypeError
            spark = corpus.sparkSession
            id_t = corpus.schema[id_col].dataType.simpleString()
            qid_t = queries.schema[query_id_col].dataType.simpleString()
            return spark.createDataFrame(
                [], f"{query_id_col} {qid_t}, {id_col} {id_t}, sim double, rnk int"
            )
        dim = len(probe[0])
    planes = _srp_planes(n_planes, dim, seed)

    def banded(df, idc, vc):
        nonzero = df.filter(F.expr(_usable_vec_sql(vc)))
        sig = nonzero.select(
            F.col(idc), F.col(vc),
            F.expr(_norm_sql(vc)).alias("__n"),
            srp_signature(vc, planes).alias("__sig"),
        )
        return sig.select(
            idc, vc, "__n",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("__sig", b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("bval"),
                    )
                    for b in range(n_bands)
                ])
            ).alias("bk"),
        ).select(idc, vc, "__n", "bk.band", "bk.bval")

    c = banded(corpus, id_col, vec_col)
    q = banded(queries, query_id_col, query_vec_col)
    sim = F.expr(
        f"round({_dot_sql(query_vec_col, vec_col)} / (__qn * __cn), 6)"
    )
    # Score BEFORE the duplicate-pair dedup: a pair colliding in j>1
    # bands recomputes the fold j times map-side (j <= n_bands, usually
    # 1), but the dedup shuffle then carries only (query_id, vec_id,
    # sim) — 3 scalars — instead of both full vectors (2 x dim doubles
    # per candidate pair). sim is deterministic per pair, so whichever
    # duplicate survives carries the identical value.
    cand = (
        c.join(
            F.broadcast(
                q.select(
                    query_id_col, query_vec_col,
                    F.col("__n").alias("__qn"), "band", "bval",
                )
            ),
            ["band", "bval"],
        )
        .select(
            F.col(query_id_col),
            F.col(id_col),
            F.col("__n").alias("__cn"),
            F.col("__qn"),
            F.col(query_vec_col),
            F.col(vec_col),
        )
        .select(F.col(query_id_col), F.col(id_col), sim.alias("sim"))
        .dropDuplicates([query_id_col, id_col])
    )
    from .topk import grouped_topk

    order = [F.col("sim").desc(), F.col(id_col).asc()]
    return grouped_topk(cand, [query_id_col], order, k).select(
        query_id_col, id_col, "sim", "rnk"
    )


def benchmark_max_sim(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_vec_col: str = "embedding",
    max_benchmark: int = 100_000,
) -> DataFrame:
    """(id, bench_max_sim): each corpus vector's maximum cosine against
    ANY benchmark vector — the semantic-decontamination score (the
    embedding-space complement of the n-gram path in ``operators/
    text.py`` (``contamination_hits`` / the registered
    ``text_decontaminate`` query): n-grams catch verbatim leakage, this
    catches paraphrased eval leakage the way SemDeDup-style sweeps do).

    Plan shape: the benchmark side is eval-set-sized by contract —
    screened to usable vectors (non-null, finite, positive norm, modal
    dimension) then collected once behind the shared loud guard
    (``_qmatrix``, fetch-capped at ``max_benchmark``+1) and shipped in
    the task closure; the corpus is scored as one ``(batch x dim) @
    (dim x B)`` matmul + rowwise max per Arrow batch, with usability
    masks computed VECTORIZED over the batch (no per-row Python on the
    hot path). ZERO shuffle, corpus never moves; output is the narrow
    (id, UNROUNDED score) relation, so the caller's join-back
    (``decontaminate_semantic``) shuffles keys+doubles, not vectors,
    and threshold comparisons never misclassify inside a rounding
    quantum.

    Unusable corpus vectors (NULL / empty / wrong dim / non-finite /
    zero-norm) score NULL — "cannot judge" stays distinguishable from
    "not contaminated"."""
    import numpy as np

    from pyspark.sql import types as T

    from ._qmatrix import collect_query_matrix

    usable = benchmark.filter(F.expr(_usable_vec_sql(bench_vec_col)))
    first = usable.select(F.size(bench_vec_col).alias("d")).limit(1).collect()
    in_fields = {f.name: f for f in corpus.schema.fields}
    schema = T.StructType(
        [in_fields[id_col], T.StructField("bench_max_sim", T.DoubleType())]
    )
    if not first:
        # empty/unusable benchmark: nothing can be contaminated — NULL
        # scores for every row (not 0.0: "no benchmark" is not "checked
        # and clean"), emitted without touching vectors
        return corpus.select(
            F.col(id_col), F.lit(None).cast("double").alias("bench_max_sim")
        )
    dim = int(first[0].d)
    bench = usable.filter(F.size(bench_vec_col) == dim).select(
        F.lit(0).alias("__qid"), F.col(bench_vec_col)
    )
    _, qmat, qn = collect_query_matrix(
        bench, "__qid", bench_vec_col, max_benchmark, param_name="max_benchmark"
    )
    qt = (qmat / qn[:, None]).T  # (dim, B), benchmark pre-normalized

    def batches(it):
        import pandas as pd

        for pdf in it:
            ids = pdf[id_col]
            vecs = pdf[vec_col]
            n = len(pdf)
            out = np.full(n, np.nan)
            lens = np.fromiter(
                (-1 if v is None else len(v) for v in vecs),
                dtype=np.int64,
                count=n,
            )
            cand = np.nonzero(lens == qt.shape[0])[0]
            if cand.size:
                mat = np.array(
                    [np.asarray(vecs.iloc[i], dtype=np.float64) for i in cand]
                )
                norms2 = (mat * mat).sum(axis=1)
                ok = np.isfinite(mat).all(axis=1) & (norms2 > 0.0)
                rows = cand[ok]
                if rows.size:
                    normed = mat[ok] / np.sqrt(norms2[ok])[:, None]
                    out[rows] = (normed @ qt).max(axis=1)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "bench_max_sim": [
                        None if np.isnan(x) else float(x) for x in out
                    ],
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(batches, schema)


def decontaminate_semantic(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_vec_col: str = "embedding",
    max_benchmark: int = 100_000,
) -> DataFrame:
    """Drop corpus rows whose embedding scores ``>= threshold`` max
    cosine against any benchmark vector. Rows whose similarity cannot
    be computed (NULL score) are KEPT — same keep-when-unjudgeable
    policy as the n-gram decontaminate. One anti-join of the narrow
    contaminated-ids relation back onto the corpus."""
    scores = benchmark_max_sim(
        corpus, benchmark, id_col, vec_col, bench_vec_col, max_benchmark
    )
    contaminated = scores.filter(
        F.col("bench_max_sim") >= F.lit(float(threshold))
    ).select(id_col)
    return corpus.join(contaminated, id_col, "left_anti")
