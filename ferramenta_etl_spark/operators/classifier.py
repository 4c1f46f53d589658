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
  checkpointed feature stream — margins per doc (a BROADCAST-VARIABLE
  weight array + vectorized Arrow lookup, then groupBy(doc).sum; a
  per-iteration broadcast-join against an n_buckets-row relation cost
  +0.6 s/iter at 2^18 buckets, VERDICT r09 #7) and gradients per
  bucket (groupBy(bucket).sum of x*(p-y)) — plus one Arrow toPandas
  bounded by the corpus' DISTINCT FEATURES, not n_buckets; the weight
  vector itself lives on the driver (n_buckets floats: metadata, not
  data);
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

import pandas as pd

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


def _weights_df(spark, weights):
    """Arrow-backed (bucket, w) relation. A Python list-of-tuples
    createDataFrame serializes row-by-row through Py4J — fine at 2^12
    buckets, dominant at 2^18+ (VERDICT r09 #7) — while a pandas frame
    ships as Arrow columnar batches; same relation, flat cost in
    n_buckets (SCALING.md classifier-overhead probe)."""
    import numpy as np
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "bucket": np.arange(len(weights), dtype="int32"),
            "w": np.asarray(weights, dtype="float64"),
        }
    )
    return spark.createDataFrame(pdf, schema="bucket int, w double")


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

    import numpy as np

    weights = np.zeros(n_buckets, dtype="float64")
    bias = 0.0
    for _ in range(iters):
        # weight access is a BROADCAST VARIABLE + vectorized take, not a
        # per-iteration broadcast-hash-join against an n_buckets-row
        # relation (VERDICT r09 #7): the relation path ships 2^18 rows
        # and builds a 2^18-entry hash table EVERY iteration — measured
        # +0.6 s/iter at 2^18 vs 2^12 — while the broadcast array is one
        # ~2 MB pickle per python worker and the lookup is a numpy take,
        # flat in n_buckets (SCALING.md classifier-overhead probe). The
        # arithmetic is the identical float64 x*w[bucket] product, so
        # the fit trajectory is unchanged (pytest numpy oracle).
        bc = spark.sparkContext.broadcast(weights)

        @F.pandas_udf("double")
        def xw(b: pd.Series, x: pd.Series) -> pd.Series:
            return pd.Series(
                bc.value[b.to_numpy()] * x.to_numpy(dtype="float64")
            )

        margins = (
            data.select("doc_id", "y", xw("bucket", "x").alias("xw"))
            .groupBy("doc_id", "y")
            .agg((F.sum("xw") + F.lit(bias)).alias("z"))
        )
        resid = margins.select(
            "doc_id",
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z"))) - F.col("y")).alias(
                "r"
            ),
        )
        # Arrow transfer + numpy scatter (VERDICT r09 #7): Row-object
        # collect + a Python accumulation loop scale with n_buckets in
        # interpreter time; toPandas ships one columnar batch and the
        # scatter/update are vectorized — per-iteration driver overhead
        # stays flat through 2^18 buckets (SCALING.md probe)
        grad_pdf = (
            data.join(resid, "doc_id")
            .groupBy("bucket")
            .agg(F.sum(F.col("x") * F.col("r")).alias("g"))
            .toPandas()
        )
        # bias gradient NEEDS NO SECOND JOB: per-doc features sum to 1
        # (the fastText normalization), so sum_b sum_docs x_b*r ==
        # sum_docs r — derive it from the bucket gradients already on
        # the driver instead of re-running the margins pipeline
        gb = float(grad_pdf["g"].sum()) / n_docs
        grad = np.zeros(n_buckets, dtype="float64")
        grad[grad_pdf["bucket"].to_numpy()] = grad_pdf["g"].to_numpy()
        weights = weights - lr * (grad / n_docs + l2 * weights)
        bias -= lr * gb
        # superseded this iteration's weight snapshot on the executors
        bc.unpersist()
    return LinearTextClassifier(
        weights.tolist(), bias, n_buckets, ns, hash_family
    )


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
    import numpy as np

    n_buckets = int(meta["n_buckets"])
    # Arrow transfer + scatter, same rationale as the training loop
    pdf = spark.read.parquet(os.path.join(path, "weights")).toPandas()
    weights = np.zeros(n_buckets, dtype="float64")
    weights[pdf["bucket"].to_numpy()] = pdf["w"].to_numpy()
    return LinearTextClassifier(
        weights.tolist(),
        float(meta["bias"]),
        n_buckets,
        tuple(int(n) for n in meta["ns"]),
        str(meta["hash_family"]),
    )
