"""Learned quality classification — the fastText/C4-style linear
classifier over hashed n-gram features: train logistic regression on
labeled positive (curated) vs negative (raw crawl) documents, then
score every document's P(quality) in one pass. The supervised
counterpart of DSIR's density-ratio weighting, sharing its featurizer
(dsir.hashed_ngram_buckets), hash families, and therefore its pure-
Python reproducibility story.

Spark-first shapes:

- FEATURES are computed once and locally checkpointed: (doc, bucket,
  x) rows with fastText-style per-document normalization
  (x = cnt / total_cnt), so a long document doesn't out-shout a short
  one by raw count;
- each TRAINING iteration is two partial-aggregated exchanges over the
  checkpointed feature stream — margins per doc (join the <=n_buckets
  weight relation broadcast, groupBy(doc).sum) and gradients per
  bucket (groupBy(bucket).sum of x*(p-y)) — plus one O(n_buckets)
  collect; the weight vector itself lives on the driver (n_buckets
  floats: metadata, not data);
- SCORING is one broadcast join + groupBy(doc) — identical plan shape
  to dsir_log_weights, corpus never shuffles for the model.

Full-batch gradient descent, deliberately: it is deterministic given
(data, hyperparameters) — no shuffle-order-dependent SGD noise — so
the pytest oracle re-derives the exact weight trajectory in numpy and
the trained model is reproducible across clusters and partitionings
(up to float summation order; pinned at 1e-6 in tests). At 100 TB
each iteration is a linear scan of the feature checkpoint; for
filter-grade classifiers 10-50 iterations suffice (the decision
boundary, not the calibration tail, is what a keep/drop gate uses).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dsir import _HASH_FAMILIES, hashed_ngram_buckets


class LinearTextClassifier(NamedTuple):
    """Driver-held model: dense weight list indexed by bucket id, a
    bias, and the featurizer pins (same contract as DSIRModel)."""

    weights: list[float]
    bias: float
    n_buckets: int
    ns: tuple[int, ...]
    hash_family: str


def _normalized_features(
    docs: DataFrame,
    text_col: str,
    doc_id_col: str,
    n_buckets: int,
    ns: Sequence[int],
    hash_family: str,
) -> DataFrame:
    """(doc_id, bucket, x) with x = cnt / doc_total (fastText mean
    pooling of bucket one-hots). Featureless docs emit no rows."""
    feats = hashed_ngram_buckets(
        docs, text_col, doc_id_col, n_buckets, ns, hash_family
    )
    w = F.sum("cnt").over(Window.partitionBy("doc_id"))
    # window-over-groupBy output: the partial agg already shrank the
    # stream to (doc, bucket) rows, so this window sees <= features/doc
    return feats.select(
        "doc_id", "bucket", (F.col("cnt") / w).alias("x")
    )


def _weights_df(spark, weights: Sequence[float]):
    return spark.createDataFrame(
        [(i, float(w)) for i, w in enumerate(weights)], "bucket int, w double"
    )


def train_text_classifier(
    positives: DataFrame,
    negatives: DataFrame,
    text_col: str = "text",
    n_buckets: int = 4096,
    ns: Sequence[int] = (1, 2),
    iters: int = 20,
    lr: float = 1.0,
    l2: float = 1e-4,
    hash_family: str = "xxhash64",
) -> LinearTextClassifier:
    """Fit the classifier on curated-positive vs crawl-negative corpora
    by full-batch logistic GD. Labels attach at train time (1.0 / 0.0);
    ids are synthesized per side so callers pass raw text relations."""
    if hash_family not in _HASH_FAMILIES:
        raise ValueError(
            f"hash_family must be one of {_HASH_FAMILIES}, got {hash_family!r}"
        )
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    ns = tuple(ns)
    spark = positives.sparkSession
    # disjoint synthetic ids: positives even, negatives odd
    pos = positives.select(
        (F.monotonically_increasing_id() * 2).alias("doc_id"),
        F.col(text_col).alias("text"),
        F.lit(1.0).alias("y"),
    )
    neg = negatives.select(
        (F.monotonically_increasing_id() * 2 + 1).alias("doc_id"),
        F.col(text_col).alias("text"),
        F.lit(0.0).alias("y"),
    )
    # checkpoint FIRST: monotonically_increasing_id is a function of the
    # partition layout, so the ids must freeze before two plan branches
    # (features, labels) derive from them
    both = pos.unionByName(neg).localCheckpoint(eager=True)
    feats = _normalized_features(
        both, "text", "doc_id", n_buckets, ns, hash_family
    )
    # labels relation: only docs WITH features train (featureless docs
    # carry no gradient through the weights; the bias-only gradient
    # they'd add would fit the base rate of empty documents, noise for
    # a text gate)
    labeled = feats.join(both.select("doc_id", "y"), "doc_id")
    data = labeled.localCheckpoint(eager=True)
    n_docs = data.select("doc_id").distinct().count()
    if n_docs == 0:
        raise ValueError("no usable (non-empty) training documents")
    # one-class degeneracy guard: with a single label present the fit
    # converges to a constant (every score ~= the base rate) and any
    # absolute gate threshold becomes meaningless — fail loudly (the
    # CLI's --target-path anti-join can empty the negatives when the
    # target covers the whole corpus)
    labels = {r.y for r in data.select("y").distinct().collect()}
    if labels != {0.0, 1.0}:
        raise ValueError(
            "training needs non-empty documents on BOTH sides "
            f"(labels present: {sorted(labels)})"
        )

    weights = [0.0] * n_buckets
    bias = 0.0
    for _ in range(iters):
        wdf = _weights_df(spark, weights)
        margins = (
            data.join(F.broadcast(wdf), "bucket")
            .groupBy("doc_id", "y")
            .agg((F.sum(F.col("x") * F.col("w")) + F.lit(bias)).alias("z"))
        )
        resid = margins.select(
            "doc_id",
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z"))) - F.col("y")).alias(
                "r"
            ),
        )
        grad_rows = (
            data.join(resid, "doc_id")
            .groupBy("bucket")
            .agg(F.sum(F.col("x") * F.col("r")).alias("g"))
            .collect()
        )
        # bias gradient NEEDS NO SECOND JOB: per-doc features sum to 1
        # (the fastText normalization), so sum_b sum_docs x_b*r ==
        # sum_docs r — derive it from the bucket gradients already on
        # the driver instead of re-running the margins pipeline
        gb = sum(row.g for row in grad_rows) / n_docs
        grad = [0.0] * n_buckets
        for row in grad_rows:
            grad[row.bucket] = row.g / n_docs
        weights = [
            w - lr * (g + l2 * w) for w, g in zip(weights, grad)
        ]
        bias -= lr * gb
    return LinearTextClassifier(weights, bias, n_buckets, ns, hash_family)


def classify_documents(
    model: LinearTextClassifier,
    docs: DataFrame,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """Row-count-preserving (doc_id, quality_p): P(positive) for every
    document. Featureless docs score sigmoid(bias) — the model's base
    rate, same spine-join policy as dsir_log_weights."""
    spark = docs.sparkSession
    feats = _normalized_features(
        docs, text_col, doc_id_col, model.n_buckets, model.ns, model.hash_family
    )
    wdf = _weights_df(spark, model.weights)
    scored = (
        feats.join(F.broadcast(wdf), "bucket")
        .groupBy("doc_id")
        .agg((F.sum(F.col("x") * F.col("w")) + F.lit(model.bias)).alias("z"))
    )
    base = 1.0 / (1.0 + math.exp(-model.bias))
    spine = docs.select(F.col(doc_id_col).alias("doc_id"))
    return spine.join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce(
            F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z"))), F.lit(base)
        ).alias("quality_p"),
    )


def save_classifier(model: LinearTextClassifier, path: str, spark) -> None:
    """Persist as a (bucket, w) parquet + meta sidecar — same artifact
    discipline as the LM/DSIR/BM25 loaders."""
    import json
    import os

    from ..sinks.layout import _fs_write_text

    _weights_df(spark, model.weights).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "weights"))
    _fs_write_text(
        spark,
        os.path.join(path, "_clf_meta.json"),
        json.dumps(
            {
                "format": "linear_text_classifier",
                "bias": model.bias,
                "n_buckets": model.n_buckets,
                "ns": list(model.ns),
                "hash_family": model.hash_family,
            }
        ),
    )


def load_classifier(spark, path: str) -> LinearTextClassifier:
    import json
    import os

    from ..sinks.layout import _fs_read_text

    meta = json.loads(_fs_read_text(spark, os.path.join(path, "_clf_meta.json")))
    if meta.get("format") != "linear_text_classifier":
        raise ValueError(f"not a linear_text_classifier artifact: {path}")
    n_buckets = int(meta["n_buckets"])
    weights = [0.0] * n_buckets
    for r in spark.read.parquet(os.path.join(path, "weights")).collect():
        weights[r.bucket] = r.w
    return LinearTextClassifier(
        weights,
        float(meta["bias"]),
        n_buckets,
        tuple(int(n) for n in meta["ns"]),
        str(meta["hash_family"]),
    )
