"""BM25 keyword retrieval over the document corpus — the lexical
counterpart to the embedding ANN stack (similarity/quantize): build an
inverted postings relation once, then answer batched keyword queries
with Okapi BM25 scoring and grouped top-k.

A training-data pipeline needs this for targeted corpus probes
("find the documents about X"), lexical decontamination sweeps, and
as the sparse half of hybrid (BM25 + dense) retrieval.

Spark-first shapes, no UDFs anywhere:

- INDEX BUILD is two partial-aggregated groupBys over the exploded
  token stream: (term, doc) term frequencies and per-term document
  frequencies. IDF and document length are denormalized INTO the
  postings relation at build time, so serving is a single join — the
  classic space/time trade every search engine makes.
- SERVING joins the postings against the (small, by contract) query
  term relation with a broadcast hint: the corpus-sized postings never
  shuffle, each posting row meets every query term it matches
  map-side, and one groupBy(query, doc) sums the score. Top-k per
  query reuses grouped_topk's WindowGroupLimit rewrite.
- A PERSISTED index partitions postings by a term-hash bucket;
  serving a loaded index prunes to the query terms' buckets before
  the scan (partition pruning). Sizing note (measured,
  SCALING.md round-9): the pruned BYTES fraction is governed by how
  much co-resident term mass shares the touched buckets, and Zipfian
  head terms make some buckets fat — size ``n_buckets`` so head-term
  postings dominate their own buckets (the probe shows 64→512 buckets
  cutting a tail-term query's read fraction 43.6%→23.2%; the postings
  a query actually scores are the irreducible floor).

Scoring (classic Okapi BM25, the Robertson/Sparck-Jones idf in its
non-negative Lucene form):

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    s(q, d) = sum_t qtf(t) * idf(t) * tf * (k1+1)
                    / (tf + k1 * (1 - b + b * dl / avgdl))

Query term frequency (qtf) multiplies — repeating a term in the query
weights it, matching the per-occurrence sum of reference
implementations. Tokenization is ws_tokens (lowercase, single-space
split), identical to the text-quality and LM operators, so one
normalization policy governs the whole text stack.
"""

from __future__ import annotations

import math
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .text import ws_tokens
from .topk import grouped_topk


class BM25Index(NamedTuple):
    """postings: (term, doc_id, tf, dl, idf) — tf/idf/dl denormalized
    so serving is one join; n_docs/avgdl are the corpus scalars the
    length normalization needs."""

    postings: DataFrame
    n_docs: int
    avgdl: float


def _doc_terms(docs: DataFrame, text_col: str, doc_id_col: str) -> DataFrame:
    toks = F.filter(ws_tokens(F.col(text_col)), lambda t: t != "")
    return docs.select(
        F.col(doc_id_col).alias("doc_id"), F.explode(toks).alias("term")
    )


def build_bm25_index(
    docs: DataFrame,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
) -> BM25Index:
    """Inverted BM25 postings from ``docs``. Two linear aggregation
    passes (term frequencies; document frequencies) + one join to
    attach idf and dl. Empty documents index no terms but still count
    toward N and avgdl (dl=0), matching the reference scorer."""
    n_docs = docs.count()
    if n_docs == 0:
        raise ValueError("cannot build a BM25 index over an empty corpus")
    terms = _doc_terms(docs, text_col, doc_id_col)
    tf = terms.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    # dl falls out of tf (sum of a doc's term frequencies): no second
    # pass over text
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    # total tokens re-aggregates the (term, doc) relation, NOT the raw
    # token stream — one pass over text total (docs absent from dl are
    # empty and add 0)
    total_tokens = dl.agg(F.coalesce(F.sum("dl"), F.lit(0))).collect()[0][0]
    avgdl = total_tokens / n_docs
    idf = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = idf.select(
        "term",
        F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        ).alias("idf"),
    )
    postings = tf.join(dl, "doc_id").join(idf, "term").select(
        "term", "doc_id", "tf", "dl", "idf"
    )
    return BM25Index(postings, n_docs, float(avgdl))


def _query_terms(queries: DataFrame, query_id_col: str, query_col: str) -> DataFrame:
    toks = F.filter(ws_tokens(F.col(query_col)), lambda t: t != "")
    return (
        queries.select(
            F.col(query_id_col).alias("query_id"), F.explode(toks).alias("term")
        )
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).alias("qtf"))
    )


def bm25_topk(
    index: BM25Index,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    query_id_col: str = "query_id",
    query_col: str = "query",
) -> DataFrame:
    """(query_id, doc_id, score, rank) — the BM25 top-k documents per
    query. The query side is broadcast (small by contract: probes and
    decontamination term sets, not a second corpus); the postings side
    streams through one map-side join + one (query, doc) aggregation.
    Ties break on doc_id ascending so results are deterministic."""
    qt = _query_terms(queries, query_id_col, query_col)
    contrib = index.postings.join(F.broadcast(qt), "term").select(
        "query_id",
        "doc_id",
        (
            F.col("qtf")
            * F.col("idf")
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * F.col("dl") / F.lit(index.avgdl)
                )
            )
        ).alias("__s"),
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(F.sum("__s").alias("score"))
    return grouped_topk(
        scored,
        ["query_id"],
        [F.col("score").desc(), F.col("doc_id").asc()],
        k,
        rank_col="rank",
    )


# ------------------------------------------------------------ hybrid fusion


def rrf_fuse(
    rankings: "list[DataFrame]",
    k: int = 10,
    rrf_k: int = 60,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal rank fusion (Cormack/Clarke/Büttcher 2009) of N
    per-query rankings: fused(q, d) = sum over lists containing d of
    1 / (rrf_k + rank). The standard way to combine BM25's lexical
    ranking with a dense ANN ranking without score calibration —
    only RANKS cross the boundary, so the two scorers' incomparable
    score scales never meet.

    Plan: unionByName of the (already top-k-sized) rankings → one
    (query, doc) aggregation → grouped top-k. Inputs are k×queries
    rows each, so everything after the input rankings is tiny."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    if rrf_k < 1:
        raise ValueError(f"rrf_k must be >= 1, got {rrf_k}")
    parts = [
        r.select(
            F.col(query_id_col),
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(rrf_k)) + F.col(rank_col))).alias("__c"),
        )
        for r in rankings
    ]
    allr = parts[0]
    for pr in parts[1:]:
        allr = allr.unionByName(pr)
    fused = allr.groupBy(query_id_col, id_col).agg(
        F.sum("__c").alias("rrf_score")
    )
    return grouped_topk(
        fused,
        [query_id_col],
        [F.col("rrf_score").desc(), F.col(id_col).asc()],
        k,
        rank_col="rank",
    )


def hybrid_topk(
    index: BM25Index,
    corpus_embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    candidates_per_arm: int | None = None,
    rrf_k: int = 60,
    query_id_col: str = "query_id",
    query_col: str = "query",
    query_vec_col: str = "query_vec",
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Hybrid lexical+dense retrieval: BM25 over ``index`` and exact
    cosine over ``corpus_embeddings`` (keyed by the same doc ids), each
    producing ``candidates_per_arm`` (default 2k) candidates, fused
    with reciprocal rank fusion. ``queries`` carries BOTH
    representations: (query_id, query text, query_vec). Swap the dense
    arm for ivf_topk/pq_topk at scale — any (query_id, id, rank)
    relation fuses."""
    from .similarity import cosine_topk

    n = candidates_per_arm or 2 * k
    # bm25_topk emits canonical (query_id, doc_id, ...) names regardless
    # of its input column params — alias back to the caller's names so
    # the fuse keys line up with the dense arm's
    lex = bm25_topk(
        index, queries, k=n, k1=k1, b=b,
        query_id_col=query_id_col, query_col=query_col,
    ).select(
        F.col("query_id").alias(query_id_col),
        F.col("doc_id").alias(id_col),
        "rank",
    )
    den = cosine_topk(
        corpus_embeddings, queries, k=n,
        id_col=id_col, vec_col=vec_col,
        query_id_col=query_id_col, query_vec_col=query_vec_col,
    ).select(
        F.col(query_id_col), F.col(id_col), F.col("rnk").alias("rank")
    )
    return rrf_fuse(
        [lex, den], k=k, rrf_k=rrf_k,
        query_id_col=query_id_col, id_col=id_col,
    )


# --------------------------------------------------------------- persistence


def save_bm25_index(
    index: BM25Index, path: str, n_buckets: int = 64
) -> None:
    """Persist the index: postings parquet partitioned by a term-hash
    bucket (pmod(xxhash64(term), n_buckets)) + a ``_bm25_meta.json``
    sidecar written LAST (a crash mid-save leaves no meta, so a
    half-written index can never load). The bucket partitioning is what
    buys serve-time partition PRUNING: a loaded query touches only its
    terms' buckets, so the scan cost scales with the query's
    vocabulary, not the corpus's. I/O goes through Spark writers / the
    Hadoop FS layer — works on any Hadoop-visible filesystem."""
    import json
    import os

    from ..sinks.layout import _fs_write_text

    spark = index.postings.sparkSession
    (
        index.postings.withColumn(
            "term_bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int")
        )
        .repartition("term_bucket")
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(os.path.join(path, "postings"))
    )
    _fs_write_text(
        spark,
        os.path.join(path, "_bm25_meta.json"),
        json.dumps(
            {
                "format": "bm25_index",
                "n_docs": index.n_docs,
                "avgdl": index.avgdl,
                "n_buckets": n_buckets,
            }
        ),
    )


class BM25DiskIndex(NamedTuple):
    postings: DataFrame  # includes term_bucket
    n_docs: int
    avgdl: float
    n_buckets: int


def load_bm25_index(spark: SparkSession, path: str) -> BM25DiskIndex:
    """Load a ``save_bm25_index`` artifact; fails loudly on a foreign
    or half-written directory (same contract as load_lm/load_dsir)."""
    import json
    import os

    from ..sinks.layout import _fs_read_text

    meta = json.loads(
        _fs_read_text(spark, os.path.join(path, "_bm25_meta.json"))
    )
    if meta.get("format") != "bm25_index":
        raise ValueError(f"not a bm25_index artifact: {path}")
    postings = spark.read.parquet(os.path.join(path, "postings"))
    return BM25DiskIndex(
        postings,
        int(meta["n_docs"]),
        float(meta["avgdl"]),
        int(meta["n_buckets"]),
    )


def bm25_topk_on_index(
    disk: BM25DiskIndex,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    query_id_col: str = "query_id",
    query_col: str = "query",
) -> DataFrame:
    """Serve from a persisted index with partition pruning: the query
    terms' buckets are computed ON the (small) query relation and
    pushed as a literal IN-filter on the partition column, so the
    postings scan skips every other bucket's files before any join."""
    qt = _query_terms(queries, query_id_col, query_col)
    buckets = [
        r.b
        for r in qt.select(
            F.pmod(F.xxhash64("term"), F.lit(disk.n_buckets)).cast("int").alias("b")
        )
        .distinct()
        .collect()
    ]
    pruned = disk.postings.filter(F.col("term_bucket").isin(buckets)).drop(
        "term_bucket"
    )
    return bm25_topk(
        BM25Index(pruned, disk.n_docs, disk.avgdl),
        queries,
        k=k,
        k1=k1,
        b=b,
        query_id_col=query_id_col,
        query_col=query_col,
    )
