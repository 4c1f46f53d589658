"""Leakage-safe train/val/test splitting.

A naive per-document random split leaks: near-duplicate documents land
on both sides of the train/test boundary and the eval set silently
scores memorization. The fix is to assign SPLITS TO NEAR-DUP CLUSTERS,
not documents: every document in a connected component of the near-dup
pair graph (the same pairs the dedup family emits — MinHash-LSH,
SimHash, embedding cosine, edit-distance) goes to the same split.

Plan shape at 100 TB: the pair relation is orders of magnitude smaller
than the corpus (only verified near-dup pairs), so
``connected_components`` runs on the small edge set (driver union-find
under its size guard, distributed min-label propagation above it); the
corpus-side work is ONE left join of the (v, label) relation onto the
documents — labels are metadata-narrow and AQE broadcasts them when
small — plus a pure hash projection for the split assignment. No
corpus-scale shuffle beyond that join.

Assignment is a deterministic pure function of (seed, cluster id):
``xxhash64(seed, cluster)`` mapped to [0, 1) and cut at the cumulative
weight thresholds — rerun-stable, cluster-atomic, and any subset of the
corpus gets the same assignment for the docs it contains (adding
documents never reshuffles existing ones unless new pairs merge their
clusters, which is exactly when re-assignment is semantically REQUIRED
to stay leakage-free).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import connected_components

# hash buckets for the [0, 1) uniform; 2^20 gives ~1e-6 threshold
# granularity, far below any meaningful split-ratio precision
_BUCKETS = 1 << 20


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame | None,
    weights: Mapping[str, float],
    id_col: str = "doc_id",
    a_col: str = "doc_id_a",
    b_col: str = "doc_id_b",
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Add ``split_col`` to ``docs``: one of ``weights``' keys, chosen
    per near-dup CLUSTER with probability proportional to the weight.

    ``pairs`` is the near-dup edge list (``a_col``/``b_col``, same id
    domain as ``id_col``); ``None`` or an empty relation degrades to a
    plain per-document hash split (every doc its own cluster). Weights
    need not sum to 1 — they are normalized; each must be positive.

    Guarantees (property-tested):
    - cluster-atomic: two docs connected through ANY pair chain get the
      same split (label = component minimum, from connected_components);
    - deterministic: same (seed, weights order) ⇒ identical assignment,
      independent of partitioning; different seed ⇒ a fresh assignment;
    - split order matters for the cut points, so pass an ordered dict /
      consistent insertion order for reproducibility across runs.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    names = list(weights)
    vals = [float(weights[n]) for n in names]
    if any(v <= 0 for v in vals):
        raise ValueError(f"weights must be positive: {dict(weights)}")
    total = sum(vals)
    cuts = []
    acc = 0.0
    for v in vals[:-1]:
        acc += v / total
        cuts.append(acc)

    if pairs is not None:
        labels = connected_components(pairs, a_col=a_col, b_col=b_col)
        docs = docs.join(
            labels.withColumnRenamed("v", id_col).withColumnRenamed(
                "label", "__cluster"
            ),
            id_col,
            "left",
        )
        cluster = F.coalesce(F.col("__cluster"), F.col(id_col))
    else:
        cluster = F.col(id_col)

    # uniform in [0, 1): bucketed xxhash64 of (seed, cluster) — pmod,
    # not %, because xxhash64 is signed
    u = F.pmod(
        F.xxhash64(F.lit(int(seed)), cluster), F.lit(_BUCKETS)
    ) / F.lit(float(_BUCKETS))
    assign = F.lit(names[-1])
    for name, cut in reversed(list(zip(names[:-1], cuts))):
        assign = F.when(u < F.lit(cut), F.lit(name)).otherwise(assign)
    out = docs.withColumn(split_col, assign)
    return out.drop("__cluster") if pairs is not None else out


def split_report(
    docs_with_split: DataFrame, split_col: str = "split"
) -> DataFrame:
    """(split, n_docs, frac) — the realized ratios. One corpus agg to a
    handful of rows, then a broadcast of the 1-row total back onto them
    (global-window-free: the counts relation is tiny either way, but the
    idiom stays single-partition-less on principle)."""
    counts = docs_with_split.groupBy(split_col).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    total = counts.agg(F.sum("n_docs").alias("__total"))
    return counts.crossJoin(F.broadcast(total)).select(
        split_col,
        "n_docs",
        F.round(F.col("n_docs") / F.col("__total"), 4).alias("frac"),
    )
