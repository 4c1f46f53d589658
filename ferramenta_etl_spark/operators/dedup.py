"""Deduplication operators.

``latest_per_key`` generalizes the reference's LATEST_MANIFESTO idiom
(``Select de Importação de Dados.py:49,58-70``): ``ROW_NUMBER() OVER
(PARTITION BY key ORDER BY ord DESC)`` + ``rn = 1``. The reference's
ORDER BY is not a total order, so its pick is nondeterministic
(SURVEY.md §2 #12); here the caller MUST pass a tiebreak that makes the
order total.

The rest of the module is the large-scale training-data dedup suite
(exact, MinHash-LSH, SimHash, token-set Jaccard, embedding cosine):
all shuffle-conscious — blocking/banding keys bound the candidate-pair
space so nothing ever goes quadratic in the corpus size.
"""

from __future__ import annotations

import logging
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

# ---------------------------------------------------------------------------
# Reference-parity: latest-record-per-key
# ---------------------------------------------------------------------------


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str | Column],
    order_by: Sequence[Column],
    tiebreak: Sequence[str | Column] = (),
    agg_order: Column | None = None,
) -> DataFrame:
    """Keep exactly one row per key: first under ``order_by + tiebreak``.

    Default physical shape: ``row_number`` window + ``rn = 1`` filter.
    Spark's InferWindowGroupLimit turns this into a partial group-limit
    before the exchange (only one candidate row per key per map
    partition shuffles), and AQE handles skewed keys — but the window
    still sorts each partition.

    ``agg_order`` opts into a SORT-FREE shape: a single ascending
    Column (typically ``F.struct(...)`` with numeric fields negated for
    DESC) that encodes the SAME total order as ``order_by + tiebreak``.
    When given, the pick becomes ``groupBy(keys).agg(min_by(struct(*),
    agg_order))`` — a pure hash aggregation with map-side partial
    combine, no per-partition sort on either side of the exchange, and
    the whole row survives without a rejoin (``min_by`` carries the
    payload struct). Same shuffle volume as the group-limited window,
    minus both sorts; measured ~7% off the flagship's first half at
    sf0.1 and strictly better shape at 100 TB. The CALLER guarantees
    the encoding matches — struct comparison is field-by-field, nulls
    first, i.e. ASC NULLS FIRST per field. NULL-PLACEMENT TRAP for
    nullable ordering columns: ``.desc()`` in the window path is NULLS
    LAST (a NULL never wins), but a negated numeric field in the struct
    is NULLS FIRST (``-NULL`` is NULL, which compares SMALLEST — the
    NULL row wins ``min_by``); encode nullable DESC fields with an
    explicit sentinel (e.g. ``coalesce(-x, lit(Long.MAX))``) or keep
    the window path. The equivalence is pinned (non-null orderings) by
    ``tests/test_properties.py::test_latest_per_key_matches_python``.

    With ``agg_order``, ``order_by``/``tiebreak`` are NOT consulted —
    they stay required as the declarative statement of the order the
    struct must encode (and the cross-check below rejects an empty
    ``order_by``, the tell that a caller thought ``agg_order`` replaces
    rather than re-encodes the ordering). The encoding itself cannot be
    verified cheaply — comparing the two paths costs the very sort this
    path exists to skip — so the contract is documentation + the
    property test, per ADVICE r04.
    """
    if agg_order is not None:
        if not list(order_by):
            raise ValueError(
                "agg_order re-encodes order_by, it does not replace it: "
                "pass the order_by (and tiebreak) columns the struct "
                "encodes so the intended total order stays declared"
            )
        payload = F.struct(*[F.col(c) for c in df.columns])
        key_cols = [F.col(k) if isinstance(k, str) else k for k in keys]
        return (
            df.groupBy(*key_cols)
            .agg(F.min_by(payload, agg_order).alias("__row"))
            .select("__row.*")
        )
    order = list(order_by) + [
        F.col(c).asc() if isinstance(c, str) else c for c in tiebreak
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# Exact duplicate detection (hash-groupBy)
# ---------------------------------------------------------------------------


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group identical texts; emit (text_hash, canonical_id, n_copies).

    Hashes with md5 so only a 32-char digest shuffles, not document
    bodies — at 100 TB the shuffle moves ~48 bytes/doc instead of ~4 KB.
    Canonical = min id (deterministic).
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative doc per exact text (min id wins)."""
    return latest_per_key(
        df, [F.md5(F.col(text_col))], [F.col(id_col).asc()]
    )


# ---------------------------------------------------------------------------
# Token / shingle machinery shared by near-dup operators
# ---------------------------------------------------------------------------


def tokens(text: Column, lowercase: bool = True) -> Column:
    """Single-space split — the ONE tokenization contract shared with
    every DuckDB oracle (string_split(lower(text), ' ')) and with
    text.ws_tokens; a regex \\s+ split here would diverge from the
    oracles on runs of whitespace."""
    t = F.lower(text) if lowercase else text
    return F.split(t, " ")


def distinct_tokens(text: Column) -> Column:
    return F.array_distinct(tokens(text))


def portable_hash(col: Column, hex_chars: int = 14) -> Column:
    """Deterministic 4*hex_chars-bit hash reproducible bit-for-bit in
    DuckDB (``('0x' || substr(md5(x), 1, n))::BIGINT``): the first n hex
    chars of md5, parsed as an integer. Slower than xxhash64 (md5 + a
    radix conversion per value) but it is what lets the MinHash/SimHash
    QUERIES graduate from rows-only to fully hash-checked against the
    DuckDB oracle; the xxhash64 family stays the library default.
    hex_chars <= 15 keeps the value inside a signed 64-bit int."""
    assert hex_chars <= 15
    return F.conv(F.substring(F.md5(col), 1, hex_chars), 16, 10).cast("bigint")


def shifted_fold(arr: Column, k: int, m: Column, combine) -> Column:
    """Fold ``k`` shifted slices of ``arr`` with ``combine`` via zip_with
    — THE O(tokens)-per-pass sliding-window idiom shared by shingles,
    shingle hashes, winnowing window-min, and the n-gram builders
    (text._gram_zip). Deliberately NOT transform-over-indexes: an outer
    expression referenced inside a HOF lambda re-evaluates PER ELEMENT,
    turning each row quadratic (measured 2x end-to-end; ~40x on
    book-length docs). ``m`` is the output length (window count)."""
    acc = F.slice(arr, 1, m)
    for j in range(1, k):
        acc = F.zip_with(acc, F.slice(arr, j + 1, m), combine)
    return acc


def shingles(text: Column, k: int = 3) -> Column:
    """DISTINCT k-token shingles as strings (shifted_fold with a
    space-concat combiner).

    Contract: docs shorter than k tokens yield an EMPTY set —
    consistent with shingle_hashes (short docs drop out of MinHash by
    design); contrast text.token_ngrams, which keeps a partial gram so
    downstream ratios never divide by zero. (Round-3 change: the old
    index-transform form emitted one partial shingle for short docs.)"""
    toks = tokens(text)
    m = F.greatest(F.size(toks) - F.lit(k - 1), F.lit(0))
    return F.array_distinct(
        shifted_fold(toks, k, m, lambda x, y: F.concat_ws(" ", x, y))
    )


def shingle_hashes(text: Column, k: int = 3, portable: bool = False) -> Column:
    """k-token shingle HASHES in [0, 2^31-1), skipping string-shingle
    construction: tokens hash once per pass (xxhash64 mod p), then the
    shingle hash is a k-term polynomial fold of consecutive token hashes,
    built as zip_with over k shifted slices of the token-hash array.

    Deliberately NOT transform(indexes, i -> element_at(th, i)): a
    subexpression referenced inside a higher-order-function lambda is
    re-evaluated PER ELEMENT, turning the row cost quadratic in token
    count (measured 2x end-to-end slowdown). The zip_with form keeps
    every pass O(n). Duplicate shingles are fine downstream because
    min() is multiset-invariant."""
    p = F.lit(_MERSENNE31)
    toks = tokens(text)
    base = portable_hash if portable else F.xxhash64
    th = F.transform(toks, lambda t: F.pmod(base(t), p))
    m = F.greatest(F.size(toks) - F.lit(k - 1), F.lit(0))
    return shifted_fold(
        th, k, m, lambda x, y: F.pmod(x * F.lit(1_000_003) + y, p)
    )


# ---------------------------------------------------------------------------
# Token-set Jaccard near-dup (blocked pairwise)
# ---------------------------------------------------------------------------


def _threshold_rational(threshold: float) -> tuple[int, int]:
    """The acceptance threshold as an exact rational ``num/den``.

    The ``J >= t`` acceptance must be EXACT integer arithmetic
    (``inter * den >= num * union``): comparing the 4-dp-ROUNDED jaccard
    against the float threshold admits pairs whose true J is just below
    t once unions reach ~10^4 tokens (round(39999/50000, 4) == 0.8), and
    comparing the unrounded double still mis-rounds near ulp boundaries
    on huge unions. ``limit_denominator(10**6)`` recovers the user's
    intended decimal exactly for any threshold written with <= 6
    decimal digits (0.8 -> 4/5, not the float 0.8000000000000000444...);
    products stay far inside int64 for any realistic token-set size
    (den <= 1e6, |union| < 2^31 -> < 2^51)."""
    from fractions import Fraction

    frac = Fraction(threshold).limit_denominator(10**6)
    return frac.numerator, frac.denominator


def tokenset_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: Sequence[str] = ("lang",),
    length_col: str | None = "n_chars",
    length_bucket: int = 16,
    prefix_filter: bool = False,
) -> DataFrame:
    """Near-duplicate pairs by token-set Jaccard within blocks.

    Blocking = equality on ``block_cols`` plus a coarse length bucket:
    candidate pairs are generated by a hash-join on the block key, never a
    cross join, so cost is sum over blocks of |block|^2 rather than N^2.
    Docs whose lengths differ by more than one bucket cannot reach a high
    Jaccard for uniform token lengths (standard length filtering) — so
    each doc is keyed under BOTH its bucket and the next one, making
    pairs that STRADDLE a bucket boundary collide (equal-bucket-only
    joins silently missed a 15-char/17-char identical-token pair at the
    16-char boundary); same-bucket pairs collide twice and dedup.

    ``prefix_filter=True`` keeps the SAME output (block + length-window
    + exact Jaccard semantics, pinned by
    tests/test_properties.py::test_tokenset_prefix_filter_matches_blocked)
    but generates candidates by PREFIX FILTERING (Bayardo/Ma/Srikant's
    All-Pairs scheme): tokens sort by ascending global frequency, each
    doc exposes only its first ``|T| - ceil(t*|T|) + 1`` rarest tokens,
    and candidates are docs sharing an exposed token — any pair with
    J >= t must share one (if A∩B avoided A's whole prefix it would fit
    inside A's top ``ceil(t|A|)-1`` suffix, below the ``t|A|`` floor
    J >= t implies). This breaks the round-5 mixed-corpus quadratic:
    length-blocking alone puts every same-length doc in one bucket, so
    a corpus of N same-length DISTINCT docs pays N^2/2 full Jaccard
    verifications; frequency-ordered prefixes expose rare tokens, which
    distinct docs don't share. Extra cost is linear: one token-frequency
    aggregate, one join of exploded prefixes to frequencies, one re-agg.
    The default stays the plain blocked join — cheaper on small or
    high-duplication corpora (the oracle fixture) where blocks stay tiny.
    """
    toks = df.select(
        F.col(id_col),
        *[F.col(c) for c in block_cols],
        *([] if length_col is None else [F.col(length_col)]),
        distinct_tokens(F.col(text_col)).alias("toks"),
    )
    if prefix_filter:
        if threshold <= 0.0:
            # J >= t > 0 implies a shared token — the prefix guarantee's
            # floor; at t=0 the blocked variant also pairs docs sharing
            # NO token, which no token-join can produce
            raise ValueError("prefix_filter requires threshold > 0")
        return _tokenset_jaccard_prefix(
            toks, threshold, id_col, block_cols, length_col, length_bucket
        )
    if length_col is not None:
        bucket = F.floor(F.col(length_col) / F.lit(length_bucket))
        toks = toks.withColumn(
            "block_key", F.explode(F.array(bucket, bucket + 1))
        )
    block_keys = list(block_cols) + ([] if length_col is None else ["block_key"])
    a = toks.alias("a")
    b = toks.alias("b")
    cond = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_keys]
    cond.append(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    inter = F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))
    union = F.size(F.array_union(F.col("a.toks"), F.col("b.toks")))
    num, den = _threshold_rational(threshold)
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("doc_id_a"),
            F.col(f"b.{id_col}").alias("doc_id_b"),
            inter.cast("long").alias("__i"),
            union.cast("long").alias("__u"),
        )
        .dropDuplicates(["doc_id_a", "doc_id_b"])
        # EXACT acceptance (see _threshold_rational); __u > 0 keeps the
        # pre-exact behavior of dropping empty-token pairs (their
        # jaccard is undefined — the old NULL >= t filter dropped them)
        .filter(
            (F.col("__u") > 0)
            & (F.col("__i") * F.lit(den) >= F.lit(num) * F.col("__u"))
        )
        .select(
            "doc_id_a",
            "doc_id_b",
            F.round(F.col("__i") / F.col("__u"), 4).alias("jaccard"),
        )
    )


def _tokenset_jaccard_prefix(
    toks: DataFrame,
    threshold: float,
    id_col: str,
    block_cols: Sequence[str],
    length_col: str | None,
    length_bucket: int,
) -> DataFrame:
    """Prefix-filter candidate generation for tokenset_jaccard_pairs.

    Physical shape (all linear except the candidate join itself):
    1. token -> global frequency (one groupBy over exploded tokens);
    2. exploded tokens join frequencies, re-aggregate per doc, sort the
       (freq, token) structs ARRAY-NATIVELY (array_sort in a hash agg —
       no per-doc window sort pass) and slice the prefix;
    3. candidates = self-join of exploded prefixes on the token, plus
       the block/length-window predicates and id<;
    4. exact Jaccard verification on the candidate ids joined back to
       their full token arrays.
    """
    base_cols = [id_col, *block_cols] + ([] if length_col is None else [length_col])
    tok_rows = toks.select(*base_cols, F.explode("toks").alias("__tok"))
    freq = tok_rows.groupBy("__tok").agg(F.count(F.lit(1)).alias("__freq"))
    # per-doc prefix of the frequency-ascending token order; ties break
    # on the token itself so the order is total and deterministic
    # The ceiling of threshold*|T| must be computed EXACTLY: double
    # rounding can land the float product JUST ABOVE the true integer
    # (e.g. 0.14*50, 0.28*25), ceil then overshoots by 1 and the prefix
    # comes out one token too short — silently dropping pairs whose
    # Jaccard sits exactly at the threshold. With the threshold as the
    # exact rational num/den (_threshold_rational — the SAME rational
    # the verify filter accepts against, so ceil and acceptance can
    # never disagree), ceil(t*n) = (num*n + den - 1) div den in pure
    # int64 arithmetic — no epsilon, valid at ANY token-set size (the
    # round-6 epsilon guard stopped covering the product's absolute
    # rounding error past ~1e7 tokens, ADVICE r06).
    num, den = _threshold_rational(threshold)
    pref_len = F.expr(
        f"cast(size(__sorted) - (({num}L * size(__sorted) + {den - 1}L) "
        f"div {den}L) + 1 as int)"
    )
    prefixes = (
        tok_rows.join(freq, "__tok")
        .groupBy(*base_cols)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__freq"), F.col("__tok")))
            ).alias("__sorted")
        )
        .select(
            *base_cols,
            F.explode(F.slice("__sorted", F.lit(1), pref_len)).alias("__p"),
        )
        .select(*base_cols, F.col("__p.__tok").alias("__tok"))
    )
    a, b = prefixes.alias("a"), prefixes.alias("b")
    cond = [F.col("a.__tok") == F.col("b.__tok")]
    cond += [F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols]
    if length_col is not None:
        # same pair window the blocked variant's [bucket, bucket+1]
        # double-keying admits: bucket distance at most 1
        ab = F.floor(F.col(f"a.{length_col}") / F.lit(length_bucket))
        bb = F.floor(F.col(f"b.{length_col}") / F.lit(length_bucket))
        cond.append(F.abs(ab - bb) <= 1)
    cond.append(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    cand = (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("doc_id_a"),
            F.col(f"b.{id_col}").alias("doc_id_b"),
        )
        .dropDuplicates(["doc_id_a", "doc_id_b"])
    )
    full = toks.select(F.col(id_col), F.col("toks"))
    inter = F.size(F.array_intersect(F.col("__ta"), F.col("__tb")))
    union = F.size(F.array_union(F.col("__ta"), F.col("__tb")))
    return (
        cand.join(
            full.select(
                F.col(id_col).alias("doc_id_a"), F.col("toks").alias("__ta")
            ),
            "doc_id_a",
        )
        .join(
            full.select(
                F.col(id_col).alias("doc_id_b"), F.col("toks").alias("__tb")
            ),
            "doc_id_b",
        )
        .select(
            "doc_id_a",
            "doc_id_b",
            inter.cast("long").alias("__i"),
            union.cast("long").alias("__u"),
        )
        # same EXACT rational acceptance as the blocked path — the two
        # variants' output-identical contract must not hinge on where a
        # double product rounds at huge unions
        .filter(
            (F.col("__u") > 0)
            & (F.col("__i") * F.lit(den) >= F.lit(num) * F.col("__u"))
        )
        .select(
            "doc_id_a",
            "doc_id_b",
            F.round(F.col("__i") / F.col("__u"), 4).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup (the scale path)
# ---------------------------------------------------------------------------

_MERSENNE31 = (1 << 31) - 1


def _hash_params(i: int) -> tuple[int, int]:
    """Deterministic (a_i, b_i) for the i-th MinHash function. a_i odd and
    small, b_i a golden-ratio multiple — with the 31-bit hash domain,
    a_i*h + b_i stays far below 2^63 (no ANSI overflow)."""
    return 2 * i + 1, 0x9E3779B9 * (i + 1) & ((1 << 31) - 1)


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 32,
    shingle_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """MinHash signatures as one row per doc, columns m0..m{n-1}.

    Shape: explode shingles -> hash each shingle ONCE -> groupBy(doc) with
    num_hashes cheap min-aggregates. The per-shingle work is constant in
    num_hashes, and the groupBy benefits from map-side partial mins, so
    the shuffle carries num_hashes longs per (doc, partition) — the form
    that survives 100 TB. (A naive transform-per-hash expression tree
    recomputes the shingle hashing num_hashes times; measured 30x slower.
    A shuffle-free per-row variant — aggregate(shingles, zip_with(acc,
    params, least)) computing all mins in one pass — also measured ~2.4x
    slower: higher-order functions run interpreted, while explode +
    groupBy-min stays inside whole-stage codegen. The tiny grouped
    shuffle is cheaper than leaving codegen.)

    Hash family: h_i(x) = (a_i * (xxhash64(x) mod p) + b_i) mod p,
    p = 2^31-1 — deterministic across runs/partitions.
    Docs with no shingles (empty text) drop out, like empty sets in
    set-similarity.
    """
    from ..sources.tables import ensure_scan_parallelism

    exploded = (
        # the shingle explode is the expensive map stage; don't let a
        # single-row-group scan serialize it onto one core (measured
        # ~13% whole-query win at sf0.1; no-op on many-file inputs)
        ensure_scan_parallelism(df, spread_by=(id_col,))
        .select(
            F.col(id_col),
            F.explode(shingle_hashes(F.col(text_col), shingle_k, portable)).alias("h"),
        )
        .filter(F.col("h").isNotNull())  # docs shorter than k tokens drop out
    )
    # SQL-string aggregates: the Column-operator form costs ~5 py4j
    # round-trips per hash function in driver-side plan construction.
    aggs = []
    for i in range(num_hashes):
        a, b = _hash_params(i)
        aggs.append(F.expr(f"min((h * {a} + {b}) % {_MERSENNE31}) as m{i}"))
    return exploded.groupBy(id_col).agg(*aggs)


def _cap_blocks(blocked: DataFrame, keys: list[str], cap: int) -> DataFrame:
    """Drop candidate blocks larger than ``cap`` members before the
    self-join. Intra-block pair output is quadratic in block size, so one
    pathological bucket (templated/boilerplate corpora put thousands of
    docs in one band) dominates the whole job; capping bounds the pair
    fan-out at cap^2/2 per block. The size aggregation shuffles on the
    same keys as the join that follows, so the partitioning is reused.
    Docs in dropped blocks still pair through their OTHER bands/blocks
    (recall degrades gracefully; the cap is logged, not silent)."""
    # This logs the CONFIGURATION (cap armed), not an observed drop —
    # it fires at plan-build time; whether any block actually exceeds
    # the cap is only known at execution. Audit actual drops with:
    # blocked.groupBy(keys).count().filter(F.col("count") > cap).count()
    log.warning(
        "near-dup candidate block cap armed at %d members; any larger "
        "block will be dropped at execution (pairs in oversized blocks "
        "are mostly exact/boilerplate dups - run exact dedup first)",
        cap,
    )
    sizes = blocked.groupBy(*keys).agg(F.count(F.lit(1)).alias("__bsz"))
    return blocked.join(
        sizes.filter(F.col("__bsz") <= cap).select(*keys), keys
    )


def banded_signatures(
    df: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """(id, sig, band, bhash) — the banded-LSH key relation: one row per
    (doc, band), carrying the full signature for downstream Jaccard
    estimation. Map-only (signature projection + band explode); this is
    both minhash_lsh_pairs' candidate stage and the PERSISTED layout of
    the incremental dedup index (pipeline/dedup_index.py)."""
    if bands < 1 or num_hashes % bands != 0:
        # rows = num_hashes // bands = 0 would hash EMPTY band slices:
        # every doc gets the same constant bhash and the LSH self-join
        # degenerates into a full N^2 cross join; a non-dividing bands
        # count would silently ignore trailing signature positions
        raise ValueError(f"bands ({bands}) must divide num_hashes ({num_hashes})")
    rows = num_hashes // bands
    sig = minhash_signatures(
        df, num_hashes, shingle_k, text_col, id_col, portable
    ).select(
        F.col(id_col),
        F.expr("array(" + ", ".join(f"m{i}" for i in range(num_hashes)) + ") as sig"),
    )
    # portable band hash = the same md5-prefix parse the oracle uses
    bhash_fmt = (
        "conv(substr(md5(concat_ws(',', {elems})), 1, 14), 16, 10)"
        if portable
        else "xxhash64(concat_ws(',', {elems}))"
    )
    band_structs = ", ".join(
        ("struct({b} as band, " + bhash_fmt + " as bhash)").format(
            b=b,
            elems=", ".join(f"element_at(sig, {b * rows + r + 1})" for r in range(rows)),
        )
        for b in range(bands)
    )
    return sig.select(
        id_col,
        "sig",
        F.expr(f"explode(array({band_structs})) as bk"),
    ).select(id_col, "sig", "bk.band", "bk.bhash")


def estimated_jaccard(sig_a: Column, sig_b: Column, num_hashes: int) -> Column:
    """Fraction of matching signature positions. n/num_hashes with
    num_hashes a power of two is exact in binary: no rounding, so the
    DuckDB oracle reproduces the doubles bit-for-bit."""
    return (
        F.size(
            F.filter(F.zip_with(sig_a, sig_b, lambda x, y: x == y), lambda m: m)
        ).cast("double")
        / F.lit(float(num_hashes))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_block_size: int | None = None,
    portable: bool = False,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH, verified by signature
    similarity.

    Pipeline (all narrow except two shuffles):
      1. signature per doc (map-only);
      2. explode into ``bands`` band-hash keys; shuffle #1 groups docs by
         (band, band_hash) — identical bands collide;
      3. self-join within buckets (shuffle #2) bounded by bucket sizes;
      4. estimate Jaccard as fraction of matching signature positions;
         keep pairs >= threshold.

    At 100 TB this is THE near-dup design: no pairwise work outside LSH
    buckets, and bucket skew is handled by AQE skew-join splitting.
    """
    banded = banded_signatures(
        df, num_hashes, bands, shingle_k, text_col, id_col, portable
    )
    if max_block_size is not None:
        banded = _cap_blocks(banded, ["band", "bhash"], max_block_size)
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            [
                F.col("a.band") == F.col("b.band"),
                F.col("a.bhash") == F.col("b.bhash"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_id_a"),
            F.col(f"b.{id_col}").alias("doc_id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_id_a", "doc_id_b"])
    )
    return (
        pairs.withColumn(
            "est_jaccard",
            estimated_jaccard(F.col("sig_a"), F.col("sig_b"), num_hashes),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .select("doc_id_a", "doc_id_b", "est_jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------


def simhash_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    portable: bool = False,
) -> DataFrame:
    """64-bit SimHash per doc as (id, fp), via explode + groupBy.

    Each distinct token hashes to 64 bits; bit j of the fingerprint is 1
    iff more token-hashes have bit j set than not. The per-bit votes are
    ``bits`` cheap conditional SUM aggregates over the exploded token
    hashes — the same shape that won for MinHash (minhash_signatures):
    everything stays inside whole-stage codegen, map-side partial sums
    mean the shuffle carries ``bits`` small longs per (doc, partition),
    and AQE coalesces. The round-1 formulation instead ran 64 interpreted
    per-bit ``aggregate()`` higher-order functions per ROW — measured as
    the slowest expression in the repo (4.1 s at sf0.01, ~2.6x the
    flagship; see BENCH notes).

    The token hash is materialized ONCE before the aggregation (not
    repeated inside all ``bits`` aggregates), and the per-bit expressions
    are built as SQL strings: the equivalent Column-operator loop costs
    ~500 py4j round-trips ≈ 1.6 s of driver-side plan construction per
    call — longer than executing the query at sf0.1.
    """
    base = (
        # 15 hex chars of md5 = 60 bits: DuckDB-reproducible (callers
        # pass bits=60 with portable=True so no vote reads past bit 59)
        portable_hash(F.col("__tok"), 15) if portable else F.xxhash64("__tok")
    )
    exploded = df.select(
        F.col(id_col), F.explode(distinct_tokens(F.col(text_col))).alias("__tok")
    ).select(F.col(id_col), base.alias("h"))
    votes = exploded.groupBy(id_col).agg(
        *[
            F.expr(
                f"sum(if((shiftright(h, {j}) & 1) = 1, 1, -1)) as v{j}"
            )
            for j in range(bits)
        ]
    )
    fp = " + ".join(
        f"if(v{j} > 0, shiftleft(cast(1 as bigint), {j}), cast(0 as bigint))"
        for j in range(bits)
    )
    return votes.select(id_col, F.expr(f"({fp}) as fp"))


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_id_a",
    b_col: str = "doc_id_b",
    max_iter: int = 20,
    driver_max_edges: int = 2_000_000,
) -> DataFrame:
    """Cluster near-duplicate PAIRS into components: (v, label) where
    label is the component's minimum member id — the canonical doc.

    Two physical strategies behind one contract:

    1. **Driver union-find** when the (deduplicated, directed) edge count
       is at most ``driver_max_edges``. The pair relation is orders of
       magnitude smaller than the corpus (LSH emits only verified
       near-dup pairs), so even a 100 TB corpus with a 1% near-dup rate
       yields an edge set in the tens of millions — and below the
       threshold it fits in tens of MB of driver memory, where path-
       compressed union-find finishes in milliseconds instead of paying
       several Spark jobs per propagation round. This is the ONE
       deliberate collect in the dedup suite, size-guarded and with the
       same min-label output as the distributed path.
    2. **Distributed min-label propagation** above the threshold: each
       round every vertex takes the min of its own and its neighbors'
       labels (one edge-labels hash-join + groupBy-min per round),
       stopping at fixpoint. Rounds needed = graph diameter, which for
       near-dup graphs is small (clusters are quasi-cliques: LSH links
       most members directly). localCheckpoint per round cuts the
       lineage so the plan doesn't grow exponentially — the standard
       iterative-algorithm discipline on Spark. Labels are the narrow
       (v, label) relation; edges never rewrite."""
    # Checkpoint the RAW pair projection first: the driver path needs no
    # symmetrize/distinct at all (union-find is direction- and
    # duplicate-agnostic), so the extra exchange is only paid when the
    # distributed propagation actually runs. count() on the checkpointed
    # relation is a cheap scan and doubles as the strategy selector.
    raw = pairs.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    ).localCheckpoint(eager=True)
    n_edges = raw.count()
    if n_edges <= driver_max_edges:
        return _cc_driver_union_find(raw)
    edges = raw.union(
        raw.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    edges = edges.localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("v"))
        .distinct()
        .withColumn("label", F.col("v"))
    )  # distributed path continues below
    for _ in range(max_iter):
        nbr_min = (
            edges.join(
                labels.select(
                    F.col("v").alias("dst"), F.col("label").alias("dst_label")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("dst_label").alias("nbr_min"))
        )
        # checkpoint: stepped feeds BOTH sides of the pointer-jump
        # self-join below — un-materialized, the edge-labels join +
        # groupBy-min would execute twice per round (the dominant cost)
        stepped = (
            labels.join(nbr_min, labels.v == nbr_min.src, "left")
            .select(
                labels.v,
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))
                ).alias("label"),
                F.col("label").alias("__old"),
            )
            .localCheckpoint(eager=True)
        )
        # Pointer jumping: label <- label[label]. Labels only decrease
        # and label[u] <= u, so the jump stays inside the component and
        # is monotone; combined with the one-hop edge step above it
        # halves remaining label-distance per round — convergence in
        # O(log diameter) rounds instead of O(diameter). Without this a
        # chain longer than max_iter SILENTLY mislabeled (caught by
        # test_connected_components_strategies_agree_at_size).
        ptr = stepped.select(F.col("v").alias("jv"), F.col("label").alias("jl"))
        new_label = F.least(F.col("s.label"), F.coalesce(F.col("p.jl"), F.col("s.label")))
        # The changed flag rides along in the update projection, so the
        # fixpoint check is a scan of the just-checkpointed result — not
        # a second labels-vs-labels join per round.
        updated = (
            stepped.alias("s")
            .join(ptr.alias("p"), F.col("s.label") == F.col("p.jv"), "left")
            .select(
                F.col("s.v").alias("v"),
                new_label.alias("label"),
                (new_label < F.col("s.__old")).alias("__changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = updated.filter(F.col("__changed")).count()
        labels = updated.drop("__changed")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(component diameter too large even with pointer jumping); "
            "raise max_iter"
        )
    return labels


def _cc_driver_union_find(edges: DataFrame) -> DataFrame:
    """Path-compressed union-find over a collected edge list; emits the
    same (v, label=min component member) relation as the distributed
    propagation. Only reachable through connected_components' size guard
    (edge count <= driver_max_edges), so the collect is bounded."""
    import pyspark.sql.types as T

    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    # one collect of the size-guarded checkpointed relation (a
    # toLocalIterator here fetches the tiny partitions sequentially —
    # measured ~0.5s of pure latency on a 32-partition 241-edge input)
    for src, dst in edges.select("src", "dst").collect():
        if src not in parent:
            parent[src] = src
        if dst not in parent:
            parent[dst] = dst
        ra, rb = find(src), find(dst)
        if ra != rb:
            # min-id root so the final label IS the component minimum
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra

    rows = [(v, find(v)) for v in parent]
    id_type = edges.schema["src"].dataType
    schema = T.StructType(
        [T.StructField("v", id_type), T.StructField("label", id_type)]
    )
    spark = edges.sparkSession
    return spark.createDataFrame(rows, schema)


def dedup_keep_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_id_a",
    b_col: str = "doc_id_b",
) -> DataFrame:
    """The end of the near-dup pipeline: collapse each pair-connected
    cluster to its canonical (min-id) member. Docs in no pair survive
    untouched; one left-anti join against the non-canonical vertex set."""
    comp = connected_components(pairs, a_col, b_col)
    losers = comp.filter(F.col("v") != F.col("label")).select(
        F.col("v").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")


def simhash_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_blocks: int = 4,
    max_block_size: int | None = None,
    portable: bool = False,
) -> DataFrame:
    """Near-dup pairs with Hamming distance <= max_hamming on SimHash.

    Pigeonhole blocking: split the 64-bit fingerprint into ``n_blocks``
    16-bit blocks; any pair within distance n_blocks-1 shares at least one
    exact block, so candidate generation is an equi-join on (block_idx,
    block_value) — again no cross join at scale. ``max_block_size`` caps
    per-block membership (quadratic pair fan-out guard, see _cap_blocks);
    on high-duplication corpora run exact dedup FIRST — identical texts
    share a fingerprint, putting whole dup-groups into every block.
    (The recall-bound and bits-divisibility guards live in
    ``hamming_pairs``, the factored kernel this delegates to.)
    """
    bits = 60 if portable else 64  # 60 = 15 md5 hex chars, see portable_hash
    fp = simhash_fingerprints(df, text_col, id_col, bits, portable)
    return hamming_pairs(
        fp,
        max_hamming=max_hamming,
        id_col=id_col,
        fp_col="fp",
        bits=bits,
        n_blocks=n_blocks,
        max_block_size=max_block_size,
    )


def fingerprint_blocks(
    fp_df: DataFrame,
    id_col: str = "doc_id",
    fp_col: str = "fp",
    bits: int = 64,
    n_blocks: int = 4,
) -> DataFrame:
    """(id_col, fp, blk, bval): the pigeonhole block explosion of a
    fingerprint column — one row per (doc, block), id column name
    preserved. Shared by ``hamming_pairs`` (self-join candidates) and
    the incremental media index (``pipeline/media_index.py``, which
    persists exactly this relation plus a canonical_id)."""
    width = bits // n_blocks
    mask = (1 << width) - 1
    fp = fp_df.select(F.col(id_col), F.col(fp_col).alias("fp"))
    return fp.select(
        id_col,
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftright("fp", i * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("bval"),
                    )
                    for i in range(n_blocks)
                ]
            )
        ).alias("b"),
    ).select(id_col, "fp", "b.blk", "b.bval")


def hamming_pairs(
    fp_df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    fp_col: str = "fp",
    bits: int = 64,
    n_blocks: int = 4,
    max_block_size: int | None = None,
) -> DataFrame:
    """(doc_id_a, doc_id_b, hamming) pairs within ``max_hamming`` over
    ANY 64-bit-or-less fingerprint column — the pigeonhole-blocked
    candidate join factored out of ``simhash_near_dup_pairs`` (round 12)
    so other fingerprint families reuse it: text SimHash and image
    dHash (multimodal.image_near_dup_pairs) share this exact kernel.
    Split the fingerprint into ``n_blocks`` equal blocks; any pair
    within distance n_blocks-1 shares at least one exact block, so
    candidates come from an equi-join on (block_idx, block_value) — no
    cross join at scale. ``max_block_size`` caps per-block membership
    (quadratic fan-out guard); dedup exact copies FIRST, identical
    fingerprints put whole dup-groups in every block."""
    if max_hamming > n_blocks - 1:
        # the pigeonhole guarantee only covers distance <= n_blocks-1:
        # a more distant pair can differ in EVERY block and never become
        # a candidate — returning a plausible-looking but incomplete
        # pair set would silently violate the recall contract
        raise ValueError(
            f"max_hamming ({max_hamming}) exceeds the pigeonhole recall "
            f"bound n_blocks-1 ({n_blocks - 1}); raise n_blocks"
        )
    if bits % n_blocks != 0:
        raise ValueError(f"bits ({bits}) must divide into n_blocks ({n_blocks})")
    blocked = fingerprint_blocks(fp_df, id_col, fp_col, bits, n_blocks)
    if max_block_size is not None:
        blocked = _cap_blocks(blocked, ["blk", "bval"], max_block_size)
    a, b = blocked.alias("a"), blocked.alias("b")
    ham = F.bit_count(F.col("a.fp").bitwiseXOR(F.col("b.fp")))
    return (
        a.join(
            b,
            [
                F.col("a.blk") == F.col("b.blk"),
                F.col("a.bval") == F.col("b.bval"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_id_a"),
            F.col(f"b.{id_col}").alias("doc_id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["doc_id_a", "doc_id_b"])
    )


# ---------------------------------------------------------------------------
# Exact-substring overlap candidates (winnowing-blocked)
# ---------------------------------------------------------------------------


def substring_dup_pairs(
    df: DataFrame,
    k: int = 3,
    window: int = 4,
    min_shared: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_block_size: int | None = None,
) -> DataFrame:
    """Document pairs sharing a long EXACT token run — the scalable
    stand-in for suffix-array substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"), which
    catches copied passages that token-SET similarity (MinHash/SimHash)
    dilutes away inside otherwise-different documents.

    Winnowing gives the guarantee suffix arrays give, probabilistically
    priced: any shared token run of length >= window + k - 1 (default 6)
    forces at least one shared selected fingerprint
    (operators/text.winnowing_fingerprints — the classic winnowing
    theorem), so ``min_shared=1`` has full recall on runs that long, up
    to 31-bit hash collisions. Raise ``min_shared`` for precision: t
    shared fingerprints witness roughly t distinct shared windows.

    Shape is exactly the LSH-bands pattern: fingerprints explode to
    (fp, doc) keys, candidates come from an equi-join on fp (never
    all-pairs), the pair relation aggregates shared-fp counts with
    map-side combine, and ``max_block_size`` caps pathological blocks
    (a fingerprint shared by every doc — boilerplate — is precisely a
    block to drop, logged). Output: (doc_id_a, doc_id_b, n_shared).
    """
    from .text import winnowing_fingerprints

    from ..sources.tables import ensure_scan_parallelism

    fps = ensure_scan_parallelism(df, spread_by=(id_col,)).select(
        F.col(id_col),
        F.explode(winnowing_fingerprints(F.col(text_col), k, window)).alias("fp"),
    )
    if max_block_size is not None:
        fps = _cap_blocks(fps, ["fp"], max_block_size)
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(
            b,
            [
                F.col("a.fp") == F.col("b.fp"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_id_a"),
            F.col(f"b.{id_col}").alias("doc_id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def edit_distance_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dist: int = 2,
    max_block_size: int | None = 10_000,
    blocking: str = "qgram",
    q: int = 3,
) -> DataFrame:
    """Character-level near-dup pairs: (doc_id_a, doc_id_b, dist) for
    every pair within Levenshtein distance ``max_dist`` — the
    short-field member of the dedup family (titles, names, URLs,
    OCR/typo variants), complementing the token-set / MinHash / SimHash
    operators that work at word granularity.

    Never an all-pairs cross join. Two blocking strategies, both EXACT
    (they only bound which pairs are *compared*; candidates always pass
    the real levenshtein verify, threshold form — O(len x d) early
    exit, not the O(len^2) full matrix):

    - ``blocking="qgram"`` (default): Ed-Join-style prefix filtering
      (Xiao/Wang/Lin 2008). An edit destroys at most ``q`` q-grams, so
      strings within distance d share a gram among their q*d+1 FIRST
      distinct grams under any global total order (here: xxhash64 of
      the gram). Each string indexes only that prefix; candidates come
      from an equi-join on the indexed gram plus the |len diff| <= d
      prune. Strings too short to carry grams (len <= q-1+d) pair
      through a parallel length-bucket block, and pairs where both
      sides land in both paths collapse via the final distinct. This is
      the default because it keys on CONTENT: a million same-length
      titles spread across ~|alphabet|^q gram blocks instead of one
      length bucket.
    - ``blocking="length"``: length buckets of width d+1 with
      adjacent-bucket join. Cheaper per row (no gram explode) and fine
      when lengths are diverse, but on length-homogeneous corpora every
      doc lands in a handful of buckets and ``max_block_size`` starts
      dropping real pairs (measured: a 110 k short-title corpus lost
      planted pairs; the qgram default recovers them — SCALING.md
      round-8).

    ``max_block_size`` is the same quadratic-blow-up guard as the
    LSH/SimHash cap (_cap_blocks) — under qgram blocking an oversized
    block is a gram shared by >cap strings (boilerplate), the right
    thing to drop. Exact duplicates surface with dist = 0."""
    if blocking == "length":
        cand = _length_blocked_candidates(
            df, text_col, id_col, max_dist, max_block_size
        )
    elif blocking == "qgram":
        cand = _qgram_blocked_candidates(
            df, text_col, id_col, max_dist, max_block_size, q
        )
    else:
        raise ValueError(f"unknown blocking {blocking!r} (qgram | length)")
    return (
        cand.withColumn(
            "dist", F.levenshtein(F.col("__ta"), F.col("__tb"), max_dist)
        )
        .filter(F.col("dist") >= 0)
        .select(
            F.least("__ida", "__idb").alias("doc_id_a"),
            F.greatest("__ida", "__idb").alias("doc_id_b"),
            "dist",
        )
        .distinct()
    )


def _length_blocked_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_dist: int,
    max_block_size: int | None,
) -> DataFrame:
    """(__ida, __ta, __idb, __tb) candidates via length buckets of
    width d+1 + adjacent-bucket join: a qualifying pair differs in
    length by <= d, so it lands in the same or adjacent bucket (the
    right side emits copies at bucket b and b-1; same-bucket pairs
    appear in both directions and collapse in the caller's canonical
    distinct)."""
    width = int(max_dist) + 1
    base = df.select(
        F.col(id_col),
        F.col(text_col),
        F.length(text_col).alias("__len"),
        F.floor(F.length(text_col) / width).alias("__blk"),
    )
    if max_block_size is not None:
        base = _cap_blocks(base, ["__blk"], max_block_size)
    left = base.select(
        F.col(id_col).alias("__ida"),
        F.col(text_col).alias("__ta"),
        F.col("__len").alias("__la"),
        F.col("__blk").alias("__k"),
    )
    right = base.select(
        F.col(id_col).alias("__idb"),
        F.col(text_col).alias("__tb"),
        F.col("__len").alias("__lb"),
        F.explode(F.array(F.col("__blk"), F.col("__blk") - 1)).alias("__k"),
    )
    return (
        left.join(right, "__k")
        .filter(F.col("__ida") != F.col("__idb"))
        .filter(F.abs(F.col("__la") - F.col("__lb")) <= max_dist)
        .select("__ida", "__ta", "__idb", "__tb")
    )


def _qgram_blocked_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_dist: int,
    max_block_size: int | None,
    q: int,
) -> DataFrame:
    """Ed-Join prefix-filter candidates: index each string's q*d+1
    hash-smallest distinct q-grams; a pair within edit distance d
    shares an indexed gram PROVIDED at least one side has more than
    q*d distinct grams. Derivation: one edit touches at most q gram
    positions, so the distinct-gram sets differ by at most q*d per
    side, giving overlap >= max(|sa|, |sb|) - q*d = t; the prefix-
    filter theorem then needs prefixes of size |s| - t + 1 <= q*d + 1.
    When BOTH sides have <= q*d distinct grams t collapses to zero and
    NO shared gram is guaranteed (hypothesis found the witness: "aaa"
    vs "aaba" at d=1, q=3 share zero grams) — so low-gram strings
    (short ones AND long repetitive ones, e.g. "aaaa...", which length
    alone would misroute) additionally pair through a length-bucket
    block over that subset; low-x-high pairs still satisfy t >= 1 and
    stay on the gram path."""
    prefix_n = int(q) * int(max_dist) + 1
    low_gram_bound = int(q) * int(max_dist)
    raw_grams = F.transform(
        F.sequence(F.lit(1), F.length(text_col) - q + 1),
        lambda i: F.col(text_col).substr(i, F.lit(q)),
    )
    # sequence(1, n) with n < 1 runs DESCENDING (junk negative-index
    # grams) — gate the whole expression on carrying at least one gram
    grams = F.when(
        F.length(text_col) >= q, F.array_distinct(raw_grams)
    ).otherwise(F.array().cast("array<string>"))
    # hash-order the distinct grams and keep the prefix; the comparator
    # must be deterministic and total — xxhash64 ties broken by the
    # gram bytes themselves
    ordered = F.array_sort(
        grams,
        lambda a, b: F.when(F.xxhash64(a) < F.xxhash64(b), -1)
        .when(F.xxhash64(a) > F.xxhash64(b), 1)
        .otherwise(F.when(a < b, -1).when(a > b, 1).otherwise(0)),
    )
    base = df.select(
        F.col(id_col),
        F.col(text_col),
        F.length(text_col).alias("__len"),
        F.slice(ordered, 1, prefix_n).alias("__pref"),
        F.size(grams).alias("__ng"),
    )
    indexed = base.filter(F.col("__ng") >= 1).select(
        F.col(id_col),
        F.col(text_col),
        F.col("__len"),
        F.explode(F.col("__pref")).alias("__g"),
    )
    if max_block_size is not None:
        indexed = _cap_blocks(indexed, ["__g"], max_block_size)
    a = indexed.select(
        F.col(id_col).alias("__ida"),
        F.col(text_col).alias("__ta"),
        F.col("__len").alias("__la"),
        "__g",
    )
    b = indexed.select(
        F.col(id_col).alias("__idb"),
        F.col(text_col).alias("__tb"),
        F.col("__len").alias("__lb"),
        "__g",
    )
    gram_cand = (
        a.join(b, "__g")
        .filter(F.col("__ida") < F.col("__idb"))
        .filter(F.abs(F.col("__la") - F.col("__lb")) <= max_dist)
        .select("__ida", "__ta", "__idb", "__tb")
    )
    low_gram = base.filter(F.col("__ng") <= low_gram_bound).select(
        F.col(id_col), F.col(text_col)
    )
    low_cand = _length_blocked_candidates(
        low_gram, text_col, id_col, max_dist, max_block_size
    )
    return gram_cand.unionByName(low_cand)
