"""Deterministic sampling operators for training-data pipelines.

A 100 TB curation job needs sampling that is (a) reproducible across
reruns and engines — no RNG state, no partition-order dependence — and
(b) shuffle-free where possible. Everything here keys off a hash of a
stable id column, so the same row always makes the same decision:
reruns are idempotent, and the sample composes with the idempotent sink
(a resumed job re-selects exactly the same rows).

No analog in the reference (its closest notion is LIMIT-less full
loads); this module belongs to the mandated large-scale extension suite
alongside dedup/curation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import portable_hash

# Hash-bucket denominator: rates quantize to 1/10_000 (0.01%).
_BUCKETS = 10_000


def _bucket(id_col: Column, seed: int) -> Column:
    """Stable per-row bucket in [0, _BUCKETS): md5-based portable hash of
    (seed, id) — changing the seed draws an independent sample; the same
    (seed, id) always lands in the same bucket, on any engine."""
    return F.pmod(
        portable_hash(F.concat_ws(":", F.lit(str(seed)), id_col.cast("string"))),
        F.lit(_BUCKETS),
    )


def hash_sample(
    df: DataFrame,
    rate: float,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic Bernoulli-style sample: keep rows whose hash bucket
    falls under ``rate``. A pure narrow filter — no shuffle, no RNG —
    so it pushes into the scan stage and costs one hash per row at any
    scale. Unlike ``DataFrame.sample`` the selection is a function of
    the DATA, not of partitioning: repartitioned, re-read, or re-run
    inputs yield the identical sample."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    cutoff = int(round(rate * _BUCKETS))
    return df.filter(_bucket(F.col(id_col), seed) < cutoff)


def stratified_sample(
    df: DataFrame,
    strata: Sequence[str],
    quota: int,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Exact per-stratum quotas: at most ``quota`` rows per distinct
    ``strata`` key, chosen deterministically as the lowest hash buckets
    (ties broken by id — a total order, so the pick is unique).

    Physical shape: one hash-shuffle on the strata key + per-partition
    sort — the same WindowGroupLimit idiom as grouped top-k, so only
    ~quota rows per stratum survive the partial rank before the final
    exchange. The common use: balance a training mix per (lang, source)
    so one dominant stratum can't swamp the corpus."""
    w = Window.partitionBy(*strata).orderBy(
        _bucket(F.col(id_col), seed).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= quota)
        .drop("__rn")
    )


def proportional_allocation(
    df: DataFrame,
    strata: Sequence[str],
    total: int,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Sample ~``total`` rows overall, allocated across strata
    proportionally to stratum size (each stratum contributes
    ceil(total * |stratum| / N) rows, so small strata keep >=1 row and
    the realized total lands within |strata| of the target).

    Stratum sizes come from ONE metadata-scale aggregate (|strata|
    rows) collected once — the grand total is the sum of the stratum
    counts, so no separate full-scan count() job runs. Selection then
    reuses the deterministic lowest-bucket rule; nothing collects
    beyond the stratum-count relation."""
    size_rows = (
        df.groupBy(*strata).agg(F.count(F.lit(1)).alias("__n")).collect()
    )
    n_total = sum(r["__n"] for r in size_rows)
    if n_total == 0:
        return df
    quota_rows = [
        tuple(r[c] for c in strata) + (-(-total * r["__n"] // n_total),)
        for r in size_rows
    ]
    return _quota_sample(df, strata, quota_rows, id_col, seed)


def _quota_sample(
    df: DataFrame,
    strata: Sequence[str],
    quota_rows: list[tuple],
    id_col: str,
    seed: int,
) -> DataFrame:
    """Apply driver-computed per-stratum quotas (last tuple element)
    with the deterministic lowest-bucket pick — the shared tail of the
    allocation strategies, so the NULL-stratum and tiebreak rules
    cannot drift between them."""
    spark = df.sparkSession
    schema_cols = ", ".join(
        f"`{c}` {df.schema[c].dataType.simpleString()}" for c in strata
    )
    quotas = spark.createDataFrame(
        quota_rows, f"{schema_cols}, __quota long"
    )
    w = Window.partitionBy(*strata).orderBy(
        _bucket(F.col(id_col), seed).asc(), F.col(id_col).asc()
    )
    # eqNullSafe join: a NULL stratum is counted and allocated a quota
    # like any other group (groupBy keeps it; Window.partitionBy keeps
    # it), so a null-rejecting equi-join here would silently drop every
    # NULL-stratum row from the sample — stratified_sample and this
    # operator must agree on the NULL group
    cond = None
    for c in strata:
        eq = df[c].eqNullSafe(quotas[c])
        cond = eq if cond is None else (cond & eq)
    return (
        df.join(F.broadcast(quotas), cond)
        .drop(*[quotas[c] for c in strata])
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.col("__quota"))
        .drop("__rn", "__quota")
    )


def temperature_allocation(
    df: DataFrame,
    strata: Sequence[str],
    total: int,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Temperature-based mixture sampling: allocate ~``total`` rows
    across strata proportionally to ``|stratum|^alpha`` — the standard
    multilingual/multi-source rebalancing (mT5/XLM-R style). ``alpha=1``
    reduces to proportional allocation; ``alpha=0`` is uniform across
    strata; the useful band (0.2-0.7) upsamples small strata so a
    dominant source cannot swamp the mix while still respecting size.

    Each stratum's quota caps at its actual size (sampling is without
    replacement), so when a small stratum exhausts, the realized total
    lands below ``total`` rather than silently re-inflating a dominant
    stratum — the honest behavior for a mixing op (re-run with a higher
    alpha or total if the target matters more than the mix). Same
    one-aggregate driver-side allocation and deterministic lowest-
    bucket pick as proportional_allocation."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    size_rows = (
        df.groupBy(*strata).agg(F.count(F.lit(1)).alias("__n")).collect()
    )
    weights = [float(r["__n"]) ** alpha for r in size_rows]
    z = sum(weights)
    if z == 0:
        return df
    import math

    quota_rows = [
        # ceil share with the >=1-row floor proportional allocation
        # gives every non-empty stratum, capped at the stratum size
        tuple(r[c] for c in strata)
        + (min(r["__n"], max(1, math.ceil(total * w / z))),)
        for r, w in zip(size_rows, weights)
    ]
    return _quota_sample(df, strata, quota_rows, id_col, seed)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Per-row Bernoulli keep with probability = ``weight_col`` —
    importance sampling by a quality/score column (keep probability 1.0
    keeps always, 0.0 never; values outside [0, 1] clamp). The decision
    reuses the deterministic (seed, id) bucket, so it composes with
    every other sampler here: reruns keep the identical rows, and
    changing the seed draws an independent sample. Probabilities
    quantize to 1/10_000 like hash_sample's rate. Pure narrow filter —
    no shuffle, pushes to the scan."""
    w = F.least(F.greatest(F.col(weight_col), F.lit(0.0)), F.lit(1.0))
    return df.filter(
        _bucket(F.col(id_col), seed) < F.round(w * _BUCKETS).cast("long")
    )


def split_train_eval(
    df: DataFrame,
    eval_rate: float = 0.01,
    id_col: str = "doc_id",
    seed: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive train/eval split by hash bucket: the same
    doc can never appear on both sides, across any rerun or engine —
    the property that makes downstream decontamination trustworthy."""
    cutoff = int(round(eval_rate * _BUCKETS))
    b = _bucket(F.col(id_col), seed)
    return df.filter(b >= cutoff), df.filter(b < cutoff)


def sample_exact_n(
    df: DataFrame,
    n: int,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Exactly ``n`` rows (or all, if fewer), chosen as the lowest
    (bucket, id) — eval sets and fixed-size probes need EXACT sizes
    where hash_sample's rate gives binomial jitter. Same determinism
    contract as every sampler here: a function of the data and seed,
    identical across reruns, engines, and repartitioning, and nested —
    sample_exact_n(m) for m < n is a strict subset of
    sample_exact_n(n) at the same seed, so a probe set can grow
    without resampling.

    Plan shape: TakeOrderedAndProject — each partition keeps its local
    n smallest, the driver merges P*n rows; no global sort ever
    materializes. That bounds driver memory by n*P, so this is for
    probe/eval-sized n, not corpus-sized splits (use hash_sample or
    the allocators for those)."""
    return df.orderBy(
        _bucket(F.col(id_col), seed).asc(), F.col(id_col).asc()
    ).limit(int(n))


def cluster_balanced_sample(
    items: DataFrame,
    embeddings: DataFrame,
    total: int,
    n_clusters: int = 16,
    alpha: float = 0.0,
    lloyd_iters: int = 1,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0,
) -> DataFrame:
    """Diversity sampling: ~``total`` rows allocated across k-means
    clusters of the EMBEDDING space by |cluster|^alpha — alpha=0 takes
    (near-)equal counts per cluster, so a corpus that is 90% one topic
    cannot fill the sample with it; alpha=1 degrades to proportional
    (plain stratified) sampling. The SemDeDup-era recipe for seeding
    eval sets and curriculum mixes with embedding-space coverage
    instead of frequency-weighted coverage.

    Pure composition of existing scale pieces: deterministic seed
    centroids + Lloyd refinement (similarity.derive_centroids /
    lloyd_refine — index-build-class driver jobs over k*d metadata),
    zero-shuffle cluster assignment (assign_ivf_buckets' literal
    projection), one join of ``items`` against the (id, cluster)
    relation, then temperature_allocation's quota sampler. Every stage
    is deterministic in (data, seed), so reruns pick identical rows.

    ``items`` rows with no embedding are DROPPED (they cannot be placed
    in a cluster) — same contract as dedup_semantic's vector-keyed
    join; left-join your sample back onto the corpus if you need the
    remainder.

    Seeding caveat (inherited from derive_centroids): seed centroids
    are the first ``n_clusters`` vectors BY ID. If id adjacency
    correlates with content (one crawl segment = one id range), the
    seeds can all land in one region and Lloyd refinement may need
    more iterations — remap ids (xxhash64) or raise ``n_clusters``
    well above the expected topic count, the standard over-clustering
    hedge."""
    from .similarity import assign_ivf_buckets, derive_centroids, lloyd_refine

    cents = derive_centroids(embeddings, n_clusters, vec_id_col, vec_col)
    if not cents:
        raise ValueError("embeddings relation has no usable (non-zero) vectors")
    cents = lloyd_refine(
        embeddings, cents, iters=lloyd_iters, id_col=vec_id_col, vec_col=vec_col
    )
    assigned = assign_ivf_buckets(embeddings, cents, vec_id_col, vec_col).select(
        F.col(vec_id_col).alias(id_col), F.col("centroid_id").alias("__cluster")
    )
    tagged = items.join(assigned, id_col, "inner")
    return temperature_allocation(
        tagged, ["__cluster"], total, alpha=alpha, id_col=id_col, seed=seed
    ).drop("__cluster")
