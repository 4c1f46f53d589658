"""Similarity search over embedding columns (array<float>).

Two paths, per the standard ANN playbook:
- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Queries are broadcast; the corpus streams; no shuffle of the corpus at
  all. Fine whenever |queries| is small, at any corpus size.
- ``ivf_topk``: IVF-style approximate top-k — the 100 TB path. Vectors
  are bucketed by nearest centroid once (one scan + a broadcast of
  centroids); each query probes only ``nprobe`` buckets, turning the
  scan into a partition-pruned fraction of the corpus.

All vector math is JVM-side SQL expressions (zip_with + aggregate fold)
— Arrow/pandas never sees the vectors. The sequential left fold is also
bit-reproducible across engines, which the oracle contract relies on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


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
    per-partition partial top-k via window on (query, rounded sim, id).
    The rounding (6 dp) + id tiebreak make the ranking a total order, so
    results are reproducible and engine-independent.
    """
    sim = cosine(F.col(query_vec_col), F.col(vec_col))
    scored = corpus.crossJoin(F.broadcast(queries)).select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(sim, 6).alias("sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, id_col, "sim", "rnk")
    )


def assign_ivf_buckets(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid_vec",
) -> DataFrame:
    """Assign each vector to its nearest centroid (cosine).

    One broadcast nested-loop + one window — the 'coarse quantizer' of an
    IVF index. At scale you'd persist this bucketed table partitioned by
    centroid_id; queries then prune to nprobe partitions.
    """
    sim = cosine(F.col(centroid_vec_col), F.col(vec_col))
    scored = corpus.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col), F.col(vec_col), F.col(centroid_id_col), F.round(sim, 6).alias("csim")
    )
    w = Window.partitionBy(id_col).orderBy(F.col("csim").desc(), F.col(centroid_id_col).asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(id_col, vec_col, centroid_id_col)
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
) -> DataFrame:
    """Approximate cosine top-k: probe only the ``nprobe`` nearest
    centroid buckets per query.

    Centroids here are seeded deterministically as the first
    ``n_centroids`` corpus vectors (no iterative k-means — reproducible
    and cheap; swap in trained centroids for recall).
    """
    centroids = (
        corpus.orderBy(F.col(id_col).asc())
        .limit(n_centroids)
        .select(
            F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid_vec")
        )
    )
    bucketed = assign_ivf_buckets(corpus, centroids, id_col, vec_col)

    # per query: nprobe nearest centroids
    qsim = cosine(F.col("centroid_vec"), F.col(query_vec_col))
    qw = Window.partitionBy(query_id_col).orderBy(F.col("qsim").desc(), F.col("centroid_id").asc())
    probes = (
        queries.crossJoin(F.broadcast(centroids))
        .select(query_id_col, query_vec_col, "centroid_id", F.round(qsim, 6).alias("qsim"))
        .withColumn("rnk", F.row_number().over(qw))
        .filter(F.col("rnk") <= nprobe)
        .select(query_id_col, query_vec_col, "centroid_id")
    )

    # search only the probed buckets (equi-join on centroid_id prunes)
    sim = cosine(F.col(query_vec_col), F.col(vec_col))
    scored = bucketed.join(F.broadcast(probes), "centroid_id").select(
        F.col(query_id_col), F.col(id_col), F.round(sim, 6).alias("sim")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, id_col, "sim", "rnk")
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within equality blocks.

    Blocking on ``block_col`` (a cluster/label/LSH-bucket column) keeps
    the pair space sum-of-squares-of-blocks instead of N^2; the join is a
    plain shuffled equi-join so AQE skew handling applies.
    """
    a = embeddings.alias("a")
    b = embeddings.alias("b")
    sim = cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
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
            F.round(sim, 6).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )
