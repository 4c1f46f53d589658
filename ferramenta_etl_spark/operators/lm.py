"""N-gram language-model perplexity scoring — the CCNet-style quality
signal: train a bigram LM on a reference corpus (or the corpus itself),
score every document's per-token cross-entropy against it, and filter
the incoherent tail. (CCNet proper scores against a Wikipedia KenLM;
the add-k bigram model here is the same signal class with no external
model artifact, and the LM table is a plain DataFrame a deployment can
swap for real KenLM scores.)

Spark-first shapes, all linear:
- bigram extraction is a PURE PROJECTION: ``arrays_zip(slice(toks, 1,
  n-1), slice(toks, 2, n-1))`` + explode — no window, no shuffle, the
  (prev, tok) stream falls out of the scan;
- training is two partial-aggregated groupBys (bigram counts, context
  totals) — token-stream-linear exchanges of COUNTS, never text;
- scoring is one hash join of the document bigram stream against the
  LM relation (Catalyst broadcasts the LM when it is small, which a
  filter-grade LM always is) plus one groupBy(doc) mean.

Smoothing is add-k: p(t | prev) = (c(prev, t) + k) / (c(prev) + k * V).
Unseen bigram with a KNOWN context falls back to k / (c(prev) + k * V)
(computable from the context relation alone); an UNKNOWN context
scores the uniform 1 / V. Everything is log2 — cross-entropy in bits,
perplexity = 2^H.
"""

from __future__ import annotations

import math
from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import ws_tokens

BOS = "<s>"  # sentence-start sentinel so the first real token is scored


class BigramLM(NamedTuple):
    """A trained LM: two count relations plus the scalars needed for
    smoothing. ``bigrams``: (prev, tok, logp) with logp precomputed at
    train time; ``contexts``: (prev, c_prev) for the unseen-bigram
    fallback; ``v``: vocabulary size (distinct non-BOS tokens);
    ``k``: the add-k constant."""

    bigrams: DataFrame
    contexts: DataFrame
    v: int
    k: float


def _bigram_stream(docs: DataFrame, text_col: str, doc_id_col: str) -> DataFrame:
    """(doc_id, prev, tok) — one row per adjacent token pair, BOS
    prepended. Projection + explode only: no shuffle."""
    toks = F.filter(ws_tokens(F.col(text_col)), lambda t: t != "")
    with_bos = F.concat(F.array(F.lit(BOS)), toks)
    n = F.size(with_bos)
    zipped = F.arrays_zip(
        F.slice(with_bos, 1, n - 1).alias("prev"),
        F.slice(with_bos, 2, n - 1).alias("tok"),
    )
    return docs.select(
        F.col(doc_id_col).alias("doc_id"), F.explode(zipped).alias("bg")
    ).select("doc_id", F.col("bg.prev").alias("prev"), F.col("bg.tok").alias("tok"))


def train_bigram_lm(
    docs: DataFrame,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    k: float = 0.5,
    min_count: int = 1,
) -> BigramLM:
    """Train the add-k bigram LM on ``docs``. ``min_count`` drops rarer
    bigrams from the table (their probability mass is recovered by the
    unseen-bigram fallback — the standard table-pruning trade: a 100 TB
    corpus's singleton bigrams would otherwise dominate the LM
    relation's size for near-zero scoring effect). Context totals are
    computed BEFORE pruning so pruning never inflates the surviving
    probabilities."""
    if k <= 0:
        raise ValueError(f"add-k smoothing needs k > 0, got {k}")
    bg = _bigram_stream(docs, text_col, doc_id_col)
    contexts = bg.groupBy("prev").agg(F.count(F.lit(1)).alias("c_prev"))
    v = bg.select("tok").distinct().count()
    if v == 0:
        raise ValueError("empty corpus: no tokens to train on")
    counts = bg.groupBy("prev", "tok").agg(F.count(F.lit(1)).alias("c"))
    if min_count > 1:
        counts = counts.filter(F.col("c") >= min_count)
    bigrams = counts.join(contexts, "prev").select(
        "prev",
        "tok",
        F.log2(
            (F.col("c") + F.lit(float(k)))
            / (F.col("c_prev") + F.lit(float(k * v)))
        ).alias("logp"),
    )
    return BigramLM(bigrams=bigrams, contexts=contexts, v=v, k=float(k))


def score_cross_entropy(
    docs: DataFrame,
    lm: BigramLM,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    stable_micros: bool = False,
) -> DataFrame:
    """(doc_id, n_tokens, cross_entropy_bits, perplexity) per document:
    mean -log2 p(tok | prev) over the doc's token stream under ``lm``.
    Documents with NO tokens (empty/NULL text) emit NO row — they are
    ABSENT from the output, not NULL-scored (pinned in tests); callers
    needing row preservation left-join the scores back onto the corpus.
    Join shape: bigram stream ⋈ lm.bigrams on (prev, tok)
    [left] ⋈ lm.contexts on prev [left]; both LM relations broadcast
    when filter-grade small, and the per-doc mean is one
    partial-aggregated groupBy.

    ``stable_micros=True`` quantizes each bigram's log2 term to a
    1e-4-bit grid (floor(lp*1e4 + 0.5), a long) and sums INTEGERS —
    the scaled-cents discipline of functions.tsql.sum2: a float sum's
    ulp depends on partition order, so only the quantized form is a
    pure function of the data that a DuckDB oracle can hash-match
    (text_lang_id's LM arm runs this); the division back to bits and
    the perplexity pow happen once per doc at the edge. The grid is
    deliberately COARSE: log2 itself differs by an ulp between the JVM
    and libm on ~a third of values (measured at sf0.1), and a term
    landing within that ulp of a grid boundary floors differently per
    engine — 1e-4 keeps ample margin while still scoring far finer
    than any quality-filter threshold. NOTE for display rounding: the
    resulting ce is a TERMINATING decimal (sumq/(1e4*n)), which lands
    exactly on half boundaries of any decimal rounding — round it with
    functions.tsql.round6_stable, never plain round(x, 6), or the two
    engines' half-way conventions diverge (the text_lang_id gate does
    this). Default off: library callers keep full float precision."""
    bg = _bigram_stream(docs, text_col, doc_id_col)
    kv = F.lit(float(lm.k * lm.v))
    lp = F.coalesce(
        F.col("logp"),  # seen bigram: trained logp
        # known context, unseen continuation: the add-k floor
        F.log2(F.lit(float(lm.k)) / (F.col("c_prev") + kv)),
        # unknown context: uniform over the vocabulary
        F.lit(-math.log2(lm.v)),
    )
    joined = bg.join(lm.bigrams, ["prev", "tok"], "left").join(
        lm.contexts, "prev", "left"
    )
    if stable_micros:
        scored = joined.select(
            "doc_id",
            F.floor(lp * F.lit(10_000.0) + F.lit(0.5))
            .cast("long")
            .alias("lq"),
        )
        n = F.count(F.lit(1))
        ce = -(F.sum("lq").cast("double") / F.lit(10_000.0)) / n
        return scored.groupBy("doc_id").agg(
            n.alias("n_tokens"),
            ce.alias("cross_entropy_bits"),
            F.pow(F.lit(2.0), ce).alias("perplexity"),
        )
    scored = joined.select("doc_id", lp.alias("lp"))
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (-F.avg("lp")).alias("cross_entropy_bits"),
        F.pow(F.lit(2.0), -F.avg("lp")).alias("perplexity"),
    )


def perplexity_filter(
    docs: DataFrame,
    lm: BigramLM,
    max_bits: float,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """Keep documents whose cross-entropy under ``lm`` is at most
    ``max_bits`` — the quality gate CCNet applies with its Wikipedia
    LM. Untokenizable docs (NULL score) are dropped: a doc the LM
    cannot read is exactly what the filter exists to remove."""
    scores = score_cross_entropy(docs, lm, text_col, doc_id_col)
    keep = scores.filter(
        F.col("cross_entropy_bits") <= F.lit(float(max_bits))
    ).select(F.col("doc_id").alias(doc_id_col))
    return docs.join(keep, doc_id_col, "left_semi")


def save_lm(lm: BigramLM, path: str) -> None:
    """Persist the LM under ``path``: ``bigrams/`` and ``contexts/``
    parquet plus ``_lm_meta.json`` (v, k) — train once on the reference
    corpus, score many crawls, the same artifact discipline as the
    persisted ANN indexes. Counts materialize here (the relations are
    lazy until written). Meta I/O goes through the Hadoop FS layer so
    HDFS/S3 paths work."""
    import json
    import os

    from ..sinks.layout import _fs_write_text

    spark = lm.bigrams.sparkSession
    lm.bigrams.write.mode("overwrite").parquet(os.path.join(path, "bigrams"))
    lm.contexts.write.mode("overwrite").parquet(os.path.join(path, "contexts"))
    _fs_write_text(
        spark,
        os.path.join(path, "_lm_meta.json"),
        json.dumps({"format": "bigram_lm", "v": lm.v, "k": lm.k}),
    )


def load_lm(spark, path: str) -> BigramLM:
    """Load a ``save_lm`` artifact; scoring against it is identical to
    scoring against the freshly trained relations (pinned in tests)."""
    import json
    import os

    from ..sinks.layout import _fs_read_text

    meta = json.loads(_fs_read_text(spark, os.path.join(path, "_lm_meta.json")))
    if meta.get("format") != "bigram_lm":
        raise ValueError(f"not a bigram_lm artifact: {path}")
    return BigramLM(
        bigrams=spark.read.parquet(os.path.join(path, "bigrams")),
        contexts=spark.read.parquet(os.path.join(path, "contexts")),
        v=int(meta["v"]),
        k=float(meta["k"]),
    )
