"""Extension queries: the large-scale training-data-pipeline suite
(SURVEY.md §7 phase 4 / the north-star mandate) — dedup, similarity
search, text analysis, multimodal plumbing, and event-time windowing.

Oracle notes:
- vector math uses the identical sequential double fold on both engines
  (verified bit-identical; see operators/similarity.py);
- MinHash-LSH and SimHash run their registered queries with the
  portable md5-prefix hash family (operators/dedup.portable_hash),
  reproducible bit-for-bit in DuckDB -> fully hash-checked; the library
  default stays xxhash64. IVF probing depends on derived centroids and
  is rows-only (recall asserted in pytest);
- event-time milliseconds always floor(epoch_us/1000) (functions/tsql.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.tsql import epoch_ms, sum2
from ..operators import dedup as D
from ..operators import multimodal as M
from ..operators import similarity as S
from ..operators import text as X
from ..sources import load_table

from ._registry import make_registry

QUERIES, ORACLES, _q = make_registry()


# DuckDB rendering of the bit-stable sequential dot product (matches
# operators/similarity.dot exactly — verified bit-identical).
def _dot(a: str, b: str) -> str:
    return (
        f"list_aggregate(list_transform(list_zip({a}, {b}), "
        f"x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')"
    )



# vector usable for cosine math: nonzero AND all elements finite (the
# operators' _usable_vec_sql policy, DuckDB rendering)
def _usable_vec(col: str) -> str:
    # mirrors operators/similarity._usable_vec_sql exactly: every element
    # non-null and finite (x IS NULL OR NOT isfinite — list_filter drops
    # NULL lambda results, so the null test must be explicit), and the
    # same norm fold the projections use is positive
    return (
        f"len(list_filter({col}, x -> x IS NULL OR NOT isfinite(x::DOUBLE))) = 0 "
        f"AND sqrt({_dot(col, col)}) > 0"
    )


def _cos(a: str, b: str) -> str:
    return f"{_dot(a, b)} / (sqrt({_dot(a, a)}) * sqrt({_dot(b, b)}))"


# ===========================================================================
# Deduplication
# ===========================================================================

_P31 = 2_147_483_647


@_q(
    "dedup_exact",
    """
    SELECT md5(text) AS text_hash,
           MIN(doc_id) AS canonical_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on md5(text) — only 32-byte digests
    shuffle, never document bodies."""
    return D.exact_dup_groups(load_table(spark, sf_dir, "documents"))


@_q(
    "dedup_fingerprint",
    f"""
    WITH cfp AS (
        SELECT md5(array_to_string(list_sort(list_distinct(
                   string_split(lower(text), ' '))), ' ')) AS fp,
               MIN(doc_id) AS canonical_id,
               COUNT(*) AS n_docs
        FROM documents
        GROUP BY 1
    ),
    -- para stage: CCNet-style cross-document paragraph dedup
    -- (operators/text.dedup_paragraphs), 'the' as the literal
    -- separator (the fixture corpus has no newlines). First corpus-wide
    -- occurrence of each distinct paragraph survives (lowest
    -- (doc_id, pos)); sub-min_chars paragraphs bypass; docs reassemble
    -- in original order, fully-deduped docs come back EMPTY.
    paras AS (
        SELECT doc_id, l, unnest(range(1, len(l) + 1)) AS pos
        FROM (SELECT doc_id, string_split(text, 'the') AS l FROM documents)
    ),
    p2 AS (
        SELECT doc_id, pos, l[pos] AS para,
               length(trim(l[pos])) >= 1 AS e, md5(l[pos]) AS h
        FROM paras
    ),
    surv AS (
        SELECT doc_id, pos, para FROM (
            SELECT doc_id, pos, para,
                   row_number() OVER (PARTITION BY h
                                      ORDER BY doc_id, pos) AS rn
            FROM p2 WHERE e
        ) WHERE rn = 1
        UNION ALL
        SELECT doc_id, pos, para FROM p2 WHERE NOT e
    ),
    rebuilt AS (
        SELECT d.doc_id, COALESCE(s.t, '') AS t
        FROM documents d LEFT JOIN (
            SELECT doc_id, string_agg(para, 'the' ORDER BY pos) AS t
            FROM surv GROUP BY doc_id) s ON d.doc_id = s.doc_id
    ),
    -- winnow stage: MOSS winnowing fingerprints
    -- (operators/text.winnowing_fingerprints, k=3 window=4, portable
    -- md5-prefix hash family) grouped corpus-wide: docs sharing a
    -- fingerprint share a >= window+k-1 token run
    wdoc AS (
        SELECT doc_id,
               list_sort(list_distinct(list_transform(
                   range(1, greatest(len(g) - 3, least(len(g), 1)) + 1),
                   i -> list_min(list_slice(g, i, i + 3))))) AS fps
        FROM (
            SELECT doc_id,
                   list_transform(range(1, greatest(len(h) - 2, 0) + 1),
                       i -> ((h[i] * 1000003 + h[i+1]) % {_P31} * 1000003
                             + h[i+2]) % {_P31}) AS g
            FROM (SELECT doc_id,
                         list_transform(string_split(lower(text), ' '),
                             t -> ('0x' || substr(md5(t), 1, 14))::BIGINT
                                  % {_P31}) AS h
                  FROM documents)
        )
    ),
    wg AS (
        SELECT w AS wfp, MIN(doc_id) AS canonical_id, COUNT(*) AS n_docs
        FROM (SELECT doc_id, unnest(fps) AS w FROM wdoc) GROUP BY 1
    )
    SELECT 'fp' AS stage, fp, canonical_id, n_docs FROM cfp
    UNION ALL
    SELECT 'para', md5(t), doc_id,
           CAST(len(string_split(t, 'the')) AS BIGINT)
    FROM rebuilt
    UNION ALL
    SELECT 'winnow', CAST(wfp AS VARCHAR), canonical_id, n_docs FROM wg
    """,
)
def dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint-family dedup, one merged gate query (the
    hybrid_retrieval stage-column discipline; r13, VERDICT r12 #4):

    - stage='fp': content fingerprint dedup — md5 of the sorted
      distinct token set (operators/text.content_fingerprint), catches
      token-reordered copies that exact hashing misses;
    - stage='para': the REAL operators/text.dedup_paragraphs pass
      (posexplode -> md5-keyed first-occurrence window -> in-order
      reassembly; 'the' as the literal separator since the fixture has
      no newlines) — fp is the md5 of each doc's reassembled text,
      n_docs its surviving-paragraph count;
    - stage='winnow': operators/text.winnowing_fingerprints (MOSS
      rolling-hash winnowing, k=3/window=4, portable hash family)
      exploded and grouped corpus-wide — docs sharing a fingerprint
      share a token run of >= window+k-1."""
    docs = load_table(spark, sf_dir, "documents")
    fp = (
        docs.select(X.content_fingerprint(F.col("text")).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .select(F.lit("fp").alias("stage"), "fp", "canonical_id", "n_docs")
    )
    para = X.dedup_paragraphs(
        docs.select("doc_id", "text"), sep="the", min_chars=1
    ).select(
        F.lit("para").alias("stage"),
        F.md5("text").alias("fp"),
        F.col("doc_id").alias("canonical_id"),
        F.size(F.split(F.col("text"), "\\Qthe\\E")).cast("long").alias("n_docs"),
    )
    winnow = (
        docs.select(
            "doc_id",
            F.explode(
                X.winnowing_fingerprints(
                    F.col("text"), k=3, window=4, portable=True
                )
            ).alias("wfp"),
        )
        .groupBy("wfp")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .select(
            F.lit("winnow").alias("stage"),
            F.col("wfp").cast("string").alias("fp"),
            "canonical_id",
            "n_docs",
        )
    )
    return fp.unionByName(para).unionByName(winnow)


@_q(
    "dedup_tokenset_jaccard",
    """
    WITH dedup AS (
        -- exact duplicates collapse FIRST (min-id survivor): identical
        -- texts land in the same block with Jaccard 1.0, so on a
        -- high-duplication corpus the equality blocks would otherwise
        -- grow by the duplication factor and the pair space by its
        -- square (caught at 100x replication: the operator ground on
        -- ~10,000x the pairs; same fix as MinHash/SimHash)
        SELECT doc_id, text, lang, n_chars FROM (
            SELECT doc_id, text, lang, n_chars,
                   row_number() OVER (PARTITION BY md5(text)
                                      ORDER BY doc_id) AS rn
            FROM documents
        ) WHERE rn = 1
    ), toks AS (
        SELECT doc_id, lang, CAST(floor(n_chars / 16) AS BIGINT) AS block_len,
               list_distinct(string_split(lower(text), ' ')) AS t
        FROM dedup
    ), keyed AS (
        -- each doc under its bucket AND the next: boundary-straddling
        -- pairs collide (mirrors operators/dedup.tokenset_jaccard_pairs)
        SELECT doc_id, lang, t, unnest([block_len, block_len + 1]) AS bk
        FROM toks
    ), pairs AS (
        SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               len(list_intersect(a.t, b.t)) AS li,
               len(list_distinct(list_concat(a.t, b.t))) AS lu
        FROM keyed a
        JOIN keyed b ON a.lang = b.lang AND a.bk = b.bk
                   AND a.doc_id < b.doc_id
    )
    -- EXACT acceptance in integer arithmetic (threshold 0.8 = 4/5),
    -- mirroring operators/dedup._threshold_rational: filtering on the
    -- 4-dp-rounded value admits true-J-just-below-t pairs at unions
    -- >= ~10^4 tokens
    SELECT doc_id_a, doc_id_b,
           ROUND(CAST(li AS DOUBLE) / lu, 4) AS jaccard
    FROM pairs WHERE lu > 0 AND li * 5 >= 4 * lu
    """,
)
def dedup_tokenset_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked pairwise token-set Jaccard near-dup (n-gram Jaccard with
    n=1). Exact duplicates collapse first (the cheap hash-groupBy):
    identical texts are exact dedup's job, and without the pre-pass a
    high-duplication corpus inflates every equality block by the
    duplication factor — pairs by its SQUARE (the 100x replication sweep
    caught exactly that; MinHash and SimHash gained the same pre-pass in
    round 2). Candidates come from frequency-ordered PREFIX FILTERING
    (round 5: the mixed-profile sweep showed (lang, length-bucket)
    blocks growing with the corpus — many distinct docs share a length —
    so the block join alone re-quadraticized; prefix filtering is
    output-identical, pinned by the hypothesis differential test, and
    keeps candidates at the docs actually sharing a rare token). The
    oracle stays the blocked formulation — same result by the prefix
    guarantee."""
    return D.tokenset_jaccard_pairs(
        D.dedup_exact(load_table(spark, sf_dir, "documents")),
        threshold=0.8,
        prefix_filter=True,
    )


# The portable md5-prefix hash family (operators/dedup.portable_hash) is
# reproducible bit-for-bit in DuckDB, so the full MinHash+LSH pipeline —
# exact-dedup, token hashing, shingle poly-fold, 32 affine min-hashes,
# 8-band bucketing, signature-match estimation — is hash-checked end to
# end (round 2 recorded it rows-only under xxhash64).
_DEDUP_CTE = """dedup AS (
        SELECT doc_id, text FROM (
            SELECT doc_id, text,
                   row_number() OVER (PARTITION BY md5(text)
                                      ORDER BY doc_id) AS rn
            FROM documents
        ) WHERE rn = 1
    )"""


def _minhash_oracle() -> str:
    mins = ", ".join(
        "MIN((g * {a} + {b}) % {p})".format(a=a, b=b, p=_P31)
        for a, b in (D._hash_params(i) for i in range(32))
    )
    bands = ", ".join(
        "{{'band': {b}, 'bhash': ('0x' || substr(md5(concat_ws(',', "
        "{elems})), 1, 14))::BIGINT}}".format(
            b=b, elems=", ".join("sig[{}]".format(b * 4 + r + 1) for r in range(4))
        )
        for b in range(8)
    )
    return f"""
    WITH {_DEDUP_CTE},
    th AS (
        SELECT doc_id,
               list_transform(string_split(lower(text), ' '),
                   t -> ('0x' || substr(md5(t), 1, 14))::BIGINT % {_P31}) AS h
        FROM dedup
    ),
    grams AS (
        SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(h) - 2, 0) + 1),
                   i -> ((h[i] * 1000003 + h[i+1]) % {_P31} * 1000003
                         + h[i+2]) % {_P31})) AS g
        FROM th
    ),
    sigs AS (SELECT doc_id, [{mins}] AS sig FROM grams GROUP BY doc_id),
    banded AS (
        SELECT doc_id, sig, b.band AS band, b.bhash AS bhash FROM (
            SELECT doc_id, sig, unnest([{bands}]) AS b FROM sigs
        )
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               list_sum(list_transform(range(1, 33),
                   i -> CASE WHEN a.sig[i] = b.sig[i] THEN 1 ELSE 0 END))
                 / 32.0 AS est_jaccard
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.bhash = b.bhash AND a.doc_id < b.doc_id
    )
    SELECT doc_id_a, doc_id_b, est_jaccard FROM pairs WHERE est_jaccard >= 0.5
    """


@_q("dedup_minhash_lsh", _minhash_oracle())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32) + 8-band LSH candidate pairs with signature-estimated
    Jaccard — THE scale path for near-dup (no pairwise work outside LSH
    buckets). Exact duplicates are collapsed FIRST (the cheap hash-groupBy
    pass): identical texts share every band, so on a high-duplication
    corpus they alone make intra-bucket pair output quadratic in
    dup-group size — the one super-linear row in the round-2 10x scale
    experiment. Near-dup detection owes pairs only between DISTINCT
    texts. portable=True swaps xxhash64 for the md5-prefix hash family so
    the DuckDB oracle reproduces every stage (fully hash-checked); the
    est_jaccard fraction n/32 is a dyadic rational, exact in binary on
    both engines."""
    return D.minhash_lsh_pairs(
        D.dedup_exact(load_table(spark, sf_dir, "documents")),
        num_hashes=32,
        bands=8,
        threshold=0.5,
        portable=True,
    )


def _simhash_oracle() -> str:
    votes = ", ".join(
        "SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}".format(j=j)
        for j in range(60)
    )
    fp = " + ".join(
        "CASE WHEN v{j} > 0 THEN 1::BIGINT << {j} ELSE 0::BIGINT END".format(j=j)
        for j in range(60)
    )
    blocks = ", ".join(
        "{{'blk': {i}, 'bval': (fp >> {s}) & 32767}}".format(i=i, s=15 * i)
        for i in range(4)
    )
    return f"""
    WITH {_DEDUP_CTE},
    toks AS (
        SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS t
        FROM dedup
    ),
    h AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM toks),
    votes AS (SELECT doc_id, {votes} FROM h GROUP BY doc_id),
    fps AS (SELECT doc_id, ({fp}) AS fp FROM votes),
    blocked AS (
        SELECT doc_id, fp, b.blk AS blk, b.bval AS bval FROM (
            SELECT doc_id, fp, unnest([{blocks}]) AS b FROM fps
        )
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
        FROM blocked a JOIN blocked b
          ON a.blk = b.blk AND a.bval = b.bval AND a.doc_id < b.doc_id
    )
    SELECT doc_id_a, doc_id_b, hamming FROM pairs WHERE hamming <= 3
    """


@_q("dedup_simhash", _simhash_oracle())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming <= 3) with pigeonhole block
    candidate generation, over exact-deduped docs (identical texts share
    a fingerprint — same quadratic-fan-out argument as dedup_minhash_lsh).
    portable=True uses the 60-bit md5-prefix token hash (15-bit pigeonhole
    blocks) so the DuckDB oracle reproduces fingerprints, blocking, and
    Hamming distances exactly — fully hash-checked since round 3."""
    return D.simhash_near_dup_pairs(
        D.dedup_exact(load_table(spark, sf_dir, "documents")), portable=True
    )


# ===========================================================================
# Similarity search
# ===========================================================================

_COSINE_TOPK_ORACLE = f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qv
        FROM embeddings
        WHERE vec_id < 10 AND {_usable_vec('embedding')}
    ), c AS (
        SELECT vec_id, embedding FROM embeddings
        WHERE vec_id >= 10 AND {_usable_vec('embedding')}
    ), scored AS (
        SELECT q.query_id, c.vec_id,
               ROUND({_cos('q.qv', 'c.embedding')}, 6) AS sim
        FROM c CROSS JOIN q
    ), ranked AS (
        SELECT query_id, vec_id, sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, vec_id ASC) AS rnk
        FROM scored
    )
    SELECT query_id, vec_id, sim, rnk FROM ranked WHERE rnk <= 5
"""


@_q("embedding_cosine_topk", _COSINE_TOPK_ORACLE)
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for 10 query vectors: broadcast
    queries, stream the corpus, window top-k — the ANN correctness
    baseline."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    corpus = emb.filter(F.col("vec_id") >= 10).select("vec_id", "embedding")
    return S.cosine_topk(corpus, queries, k=5)


_IVF_CENTROIDS: dict[tuple[str, int, float], list] = {}


# The registered IVF query is fully deterministic: seed centroids are the
# first 8 corpus vectors by id (no Lloyd refinement on this memoized
# path), assignment/probing use the same rounded sequential-fold cosine
# as the hash-green cosine queries, and every tiebreak is total — so the
# whole index + search pipeline has an exact DuckDB rendering.
def _ivf_oracle() -> str:
    def _nrm(x: str) -> str:
        return f"sqrt({_dot(x, x)})"

    return f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qv, {_nrm('embedding')} AS qn
        FROM embeddings WHERE vec_id < 10 AND {_usable_vec('embedding')}
    ), c AS (
        SELECT vec_id, embedding, {_nrm('embedding')} AS nv
        FROM embeddings WHERE vec_id >= 10 AND {_usable_vec('embedding')}
    ), cents AS (
        SELECT vec_id AS cid, embedding AS cvec, {_nrm('embedding')} AS cn
        FROM embeddings
        WHERE vec_id >= 10 AND {_usable_vec('embedding')}
        ORDER BY vec_id LIMIT 8
    ), assign AS (
        SELECT vec_id, embedding, nv, cid FROM (
            SELECT c.vec_id, c.embedding, c.nv, cents.cid,
                   ROW_NUMBER() OVER (PARTITION BY c.vec_id
                       ORDER BY ROUND({_dot('cents.cvec', 'c.embedding')}
                                      / (cents.cn * c.nv), 6) DESC,
                                cents.cid ASC) AS rn
            FROM c CROSS JOIN cents
        ) WHERE rn = 1
    ), probes AS (
        SELECT query_id, qv, qn, cid FROM (
            SELECT q.query_id, q.qv, q.qn, cents.cid,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id
                       ORDER BY ROUND({_dot('cents.cvec', 'q.qv')}
                                      / (cents.cn * q.qn), 6) DESC,
                                cents.cid ASC) AS rn
            FROM q CROSS JOIN cents
        ) WHERE rn <= 2
    ), scored AS (
        SELECT p.query_id, a.vec_id,
               ROUND({_dot('p.qv', 'a.embedding')} / (p.qn * a.nv), 6) AS sim
        FROM assign a JOIN probes p USING (cid)
    ), ranked AS (
        SELECT query_id, vec_id, sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, vec_id ASC) AS rnk
        FROM scored
    )
    SELECT query_id, vec_id, sim, rnk FROM ranked WHERE rnk <= 5
    """


@_q("embedding_ann_ivf", _ivf_oracle())
def embedding_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate top-k (nprobe=2 of 8 centroid buckets) —
    the 100 TB path: queries scan only probed buckets; the corpus never
    shuffles (bucket assignment is a literal-centroid projection, probes
    broadcast). Centroids are index metadata, derived once per dataset
    and memoized — a real deployment trains and PERSISTS them with the
    bucketed table. Recall vs the exact baseline is asserted in
    tests/test_operators.py."""
    from ._registry import _dir_mtime

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    corpus = emb.filter(F.col("vec_id") >= 10).select("vec_id", "embedding")
    # mtime in the key (like plan_cache/load_table): a dataset
    # regenerated in place must re-derive its centroids, or the stale
    # index metadata diverges from the fresh data the oracle reads
    key = (sf_dir, 8, _dir_mtime(f"{sf_dir}/embeddings.parquet"))
    if key not in _IVF_CENTROIDS:
        _IVF_CENTROIDS.clear()  # one live dataset at a time: no growth
        _IVF_CENTROIDS[key] = S.derive_centroids(corpus, n_centroids=8)
    return S.ivf_topk(
        corpus, queries, n_centroids=8, nprobe=2, k=5,
        centroid_rows=_IVF_CENTROIDS[key],
    )


_NEAR_DUP_ORACLE = f"""
    WITH u AS (SELECT vec_id, embedding, label FROM embeddings
               WHERE {_usable_vec('embedding')}),
    e AS (
        -- bit-identical vectors collapse FIRST (min-id survivor):
        -- they are exact dedup's job (sim 1.0 by construction), and
        -- without the pre-pass a high-duplication corpus inflates the
        -- label blocks by the duplication factor — pairs by its square
        -- (the 100x replication sweep caught this; usable-filter runs
        -- BEFORE the collapse so non-finite vectors never reach the
        -- array group key)
        SELECT vec_id, embedding, label FROM (
            SELECT vec_id, embedding, label,
                   row_number() OVER (PARTITION BY embedding
                                      ORDER BY vec_id) AS rn
            FROM u
        ) WHERE rn = 1
    )
    SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
           ROUND({_cos('a.embedding', 'b.embedding')}, 6) AS sim
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE ROUND({_cos('a.embedding', 'b.embedding')}, 6) >= 0.35
"""


@_q("embedding_near_dup", _NEAR_DUP_ORACLE)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs blocked by label, after
    collapsing bit-identical vectors to their min-id survivor (exact
    dedup's job — and the guard that keeps label blocks from inflating
    by the duplication factor on a replicated corpus; see the oracle
    comment). The usable-vector filter runs before the collapse so
    array group keys are all-finite. (Threshold 0.35: the synthetic
    embeddings are not clustered — max within-label cosine ~0.45 — so a
    production 0.9 threshold would be vacuous here.)"""
    from ..operators.dedup import latest_per_key
    from ..operators.similarity import _usable_vec_sql

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.expr(_usable_vec_sql("embedding"))
    )
    distinct = latest_per_key(
        emb, keys=[F.col("embedding")], order_by=[F.col("vec_id").asc()]
    )
    return S.cosine_near_dup_pairs(distinct, threshold=0.35)


# ===========================================================================
# Text analysis
# ===========================================================================

_MARKER_SQL = {
    lang: "(" + ", ".join(f"'{t}'" for t in toks) + ")"
    for lang, toks in X.LANG_MARKERS.items()
}
_SCORES_SQL = ",\n               ".join(
    f"len(list_filter(string_split(lower(text), ' '), t -> t IN {m})) AS s_{lang}"
    for lang, m in _MARKER_SQL.items()
)
_BEST = "greatest(s_de, s_en, s_es, s_fr, s_zh)"
_PRED = (
    "CASE "
    + " ".join(f"WHEN s_{lang} = {_BEST} THEN '{lang}'" for lang in X.LANGS)
    + " END"
)


@_q(
    "text_lang_id",
    rf"""
    WITH scored AS (
        SELECT doc_id, lang,
               {_SCORES_SQL}
        FROM documents
    ),
    t AS (
        SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
    ),
    g AS (
        SELECT doc_id, toks,
               list_transform(range(1, greatest(len(toks) - 1, 1) + 1),
                   i -> array_to_string(list_slice(toks, i, i + 1), ' ')) AS grams
        FROM t
    ),
    runs AS (  -- gaps-and-islands: longest consecutive equal-token run
        SELECT doc_id, MAX(cnt) AS max_run FROM (
            SELECT doc_id, COUNT(*) AS cnt FROM (
                SELECT doc_id, tok, i,
                       i - ROW_NUMBER() OVER (PARTITION BY doc_id, tok ORDER BY i)
                         AS grp
                FROM (SELECT doc_id, unnest(toks) AS tok,
                             generate_subscripts(toks, 1) AS i FROM t)
            ) GROUP BY doc_id, tok, grp
        ) GROUP BY doc_id
    ),
    -- LM arm (operators/lm.py): add-k bigram LM trained on the corpus
    -- (k=0.5, min_count=2), per-doc cross-entropy. Each log2 term is
    -- quantized to micro-bits (floor(lp*1e6+0.5) BIGINT) and summed in
    -- INTEGERS — the scaled-cents discipline, since a float sum's ulp
    -- depends on summation order
    lmtok AS (
        SELECT doc_id,
               list_prepend('<s>', list_filter(string_split(lower(text), ' '),
                                               x -> x <> '')) AS l
        FROM documents
    ),
    lmbg AS (
        SELECT doc_id, l[i] AS prev, l[i + 1] AS tok
        FROM (SELECT doc_id, l, unnest(range(1, len(l))) AS i FROM lmtok)
    ),
    lmctx AS (SELECT prev, COUNT(*) AS c_prev FROM lmbg GROUP BY 1),
    lmv AS (SELECT COUNT(DISTINCT tok) AS v FROM lmbg),
    lmp AS (
        SELECT c.prev, c.tok,
               log2((c.c + 0.5) / (x.c_prev + 0.5 * v)) AS logp
        FROM (SELECT prev, tok, COUNT(*) AS c FROM lmbg GROUP BY 1, 2
              HAVING COUNT(*) >= 2) c
        JOIN lmctx x USING (prev), lmv
    ),
    lmterms AS (
        -- 1e-4-bit grid, NOT finer: log2 differs by an ulp between
        -- engines, and a term within that ulp of a grid boundary
        -- floors differently (one sf0.1 row caught at 1e-6)
        SELECT b.doc_id,
               CAST(FLOOR(COALESCE(p.logp,
                                   log2(0.5 / (x.c_prev + 0.5 * v)),
                                   -log2(CAST(v AS DOUBLE)))
                          * 10000 + 0.5) AS BIGINT) AS lq
        FROM lmbg b
        LEFT JOIN lmp p ON b.prev = p.prev AND b.tok = p.tok
        LEFT JOIN lmctx x ON b.prev = x.prev, lmv
    ),
    lmscore AS (
        -- round6_stable's scale-then-round idiom: ce is a terminating
        -- decimal (sumq / (1e4*n)) that lands exactly on 6-dp halves,
        -- where ROUND(x, 6) diverges between engines
        SELECT doc_id, COUNT(*) AS lm_n_bigrams,
               (ROUND(-(CAST(SUM(lq) AS DOUBLE) / 10000.0) / COUNT(*)
                      * 1000000) / 1000000 + 0.0) AS lm_ce_bits
        FROM lmterms GROUP BY 1
    )
    SELECT d.doc_id, d.lang AS true_lang, {_PRED} AS pred_lang,
           len(string_split(d.text, ' ')) AS n_ws_tokens,
           len(regexp_extract_all(lower(d.text), '[a-z]+|[0-9]|[^a-z0-9\s]'))
             AS n_bpe_ish,
           ROUND(1.0 - CAST(len(list_distinct(g.grams)) AS DOUBLE) / len(g.grams), 6)
             AS dup_2gram_frac,
           ROUND(CAST(list_max(list_transform(list_distinct(g.grams),
                     x -> len(list_filter(g.grams, y -> y = x)))) AS DOUBLE)
                 * 2.0 / len(g.toks), 6) AS top_2gram_frac,
           CAST(runs.max_run AS INT) AS max_token_run,
           ROUND(CAST(len(list_filter(g.toks, x -> regexp_matches(x, '[a-z]')))
                      AS DOUBLE) / len(g.toks), 6) AS alpha_word_ratio,
           s.lm_n_bigrams, s.lm_ce_bits
    FROM documents d
    JOIN scored ON d.doc_id = scored.doc_id
    JOIN g      ON d.doc_id = g.doc_id
    JOIN runs   ON d.doc_id = runs.doc_id
    LEFT JOIN lmscore s ON d.doc_id = s.doc_id
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language ID (n-gram-heuristic family: argmax of
    per-language marker counts, alphabetical tiebreak) MERGED with the
    token-counting / repetition-signal suite (whitespace tokens, BPE-ish
    regex count, Gopher-style duplicate-bigram fraction, top-bigram
    coverage, longest token run, alphabetic ratio — operators/text.py)
    — one per-doc projection, keyed by doc_id. Merged in round 10 to
    hold the registry at the driver's 50-query gate window while the
    events_capped_sessions and hybrid_retrieval rows joined (the same
    absorb-related-micro-operators discipline as grouping_sets_sql);
    every operator keeps its own unit tests. All columns are linear
    per-doc folds at scan speed; the oracle's quadratic
    count-per-distinct-gram and gaps-and-islands window forms are the
    independent cross-checks of the folds.

    r13: absorbs the formerly pytest-only bigram-LM perplexity scorer
    (operators/lm.py, the CCNet-style quality signal) — an add-k LM
    (k=0.5, min_count=2) trained on the corpus itself, per-doc
    cross-entropy in bits under the micro-bit integer-sum discipline
    (each log2 term quantized to floor(lp*1e6+0.5) and summed as
    longs, so the score is independent of partition order and the
    DuckDB oracle reproduces it exactly)."""
    from ..operators.lm import score_cross_entropy, train_bigram_lm

    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    base = docs.select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        X.lang_id(t).alias("pred_lang"),
        F.size(F.split(t, " ")).alias("n_ws_tokens"),
        X.bpe_ish_count(t).alias("n_bpe_ish"),
        F.round(X.dup_ngram_fraction(t, 2), 6).alias("dup_2gram_frac"),
        F.round(X.top_ngram_fraction(t, 2), 6).alias("top_2gram_frac"),
        X.max_token_run(t).alias("max_token_run"),
        F.round(X.alpha_word_ratio(t), 6).alias("alpha_word_ratio"),
    )
    # LM arm (r13): add-k bigram LM trained on the corpus itself
    # (k=0.5, min_count=2 pruning), per-doc cross-entropy under the
    # micro-bit integer-sum discipline so the score is a pure function
    # of the data (operators/lm.score_cross_entropy stable_micros)
    from ..functions.tsql import round6_stable

    lm = train_bigram_lm(docs, k=0.5, min_count=2)
    # round6_stable, NOT F.round(x, 6): ce = sumq/(1e4*n) is a
    # terminating decimal that lands EXACTLY on 6-dp half boundaries
    # (n=40 -> denominator 400000), where Spark's BigDecimal HALF_UP on
    # the shortest repr and DuckDB's binary rounding disagree — the
    # same half-way divergence group_agg's quantile arm hit
    scores = score_cross_entropy(docs, lm, stable_micros=True).select(
        "doc_id",
        F.col("n_tokens").alias("lm_n_bigrams"),
        round6_stable(F.col("cross_entropy_bits")).alias("lm_ce_bits"),
    )
    return base.join(scores, "doc_id", "left")


@_q(
    "text_quality_score",
    """
    WITH feats AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split(lower(text), ' '),
                    t -> t IN ('the','a','of','to','and','in','is','on'))) AS DOUBLE)
                 / len(string_split(lower(text), ' ')) AS stop_ratio,
               COALESCE(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
                 / nullif(length(text), 0), 0.0) AS dig_ratio,
               COALESCE(CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE)
                 / nullif(length(text), 0), 0.0) AS punct_ratio,
               least(CAST(len(string_split(lower(text), ' ')) AS DOUBLE) / 100.0, 1.0)
                 AS len_factor
        FROM documents
    ),
    tok AS (
        SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
                                          t -> t <> '')) AS term
        FROM documents
    ), tfr AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
    ), idfr AS (
        -- the tfidf_keywords Robertson idf (retrieval._idf_expr order):
        -- ln(1 + (N - df + 0.5)/(df + 0.5)); min_df=2 drops hapax noise
        SELECT term,
               ln(1.0 + (CAST((SELECT COUNT(*) FROM documents) AS DOUBLE)
                         - CAST(df AS DOUBLE) + 0.5)
                        / (CAST(df AS DOUBLE) + 0.5)) AS idf
        FROM (SELECT term, COUNT(*) AS df FROM tfr GROUP BY 1
              HAVING COUNT(*) >= 2)
    ), ranked AS (
        -- rank on the ROUNDED score, ties on term (the lexk discipline)
        SELECT doc_id, term, tfidf,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY tfidf DESC, term ASC) AS rank
        FROM (SELECT doc_id, t.term,
                     ROUND(CAST(tf AS DOUBLE) * idf, 6) AS tfidf
              FROM tfr t JOIN idfr USING (term))
    ), kw AS (
        SELECT doc_id,
               string_agg(term, ' ' ORDER BY rank) AS keywords,
               MAX(CASE WHEN rank = 1 THEN tfidf END) AS top_tfidf
        FROM ranked WHERE rank <= 3 GROUP BY doc_id
    )
    SELECT f.doc_id,
           ROUND(stop_ratio, 6) AS stopword_ratio,
           ROUND(dig_ratio, 6) AS digit_ratio,
           ROUND(punct_ratio, 6) AS punct_ratio,
           ROUND(stop_ratio * 0.3 + (1.0 - dig_ratio) * 0.3
                 + (1.0 - punct_ratio) * 0.2 + len_factor * 0.2, 6) AS quality,
           COALESCE(k.keywords, '') AS keywords,
           COALESCE(k.top_tfidf, 0.0) AS top_tfidf
    FROM feats f LEFT JOIN kw k ON f.doc_id = k.doc_id
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring: stopword/digit/punctuation ratios +
    length factor, composed in a fixed expression order so both engines
    produce bit-identical doubles.

    The regex/split feature extraction is the expression-heavy map-work
    class the scan-parallelism guard exists for: on a single-row-group
    input the whole scoring stage would run one core (0.42 s -> 0.36 s
    at sf0.1 — the round-robin ships the bodies once, which caps the
    local win); on any real multi-file corpus the guard is a no-op.

    r13 (VERDICT r12 #4): absorbs the formerly pytest-only
    operators/text.tfidf_keywords under the same gate — each doc gains
    its top-3 characteristic terms (space-joined, rank order) and the
    rank-1 tfidf, ranked on the 6-dp-ROUNDED score with the term
    tie-break so ln() ulp differences between engines can't flip the
    top-k (the hybrid_retrieval lexk discipline)."""
    from ..operators.text import tfidf_topk_arrays
    from ..sources.tables import ensure_scan_parallelism

    docs = ensure_scan_parallelism(
        load_table(spark, sf_dir, "documents"), spread_by=("doc_id",)
    )
    t = F.col("text")
    # r13: the keywords ride the per-doc array kernel
    # (text.tfidf_topk_arrays), so the whole query is ONE projection
    # over the doc scan plus the vocabulary-sized df aggregation — the
    # former plan's 3 doc-term shuffles (tf groupBy, top-k window,
    # collect_list groupBy) and the feats join are gone (plan diff in
    # plans/r13/text_quality_score_{before,after}.txt).
    return tfidf_topk_arrays(docs, k=3, min_df=2, stable_round=6).select(
        "doc_id",
        F.round(X.stopword_ratio(t), 6).alias("stopword_ratio"),
        F.round(X.digit_ratio(t), 6).alias("digit_ratio"),
        F.round(X.punct_ratio(t), 6).alias("punct_ratio"),
        F.round(X.quality_score(t), 6).alias("quality"),
        F.array_join(
            F.transform(F.col("__kw"), lambda s: s.getField("term")), " "
        ).alias("keywords"),
        F.coalesce(
            F.get(F.col("__kw"), 0).getField("tfidf"), F.lit(0.0)
        ).alias("top_tfidf"),
    )


@_q(
    "text_decontaminate",
    """
    WITH toks AS (
        SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
    ),
    grams AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
                   range(1, greatest(len(t) - 4, 0) + 1),
                   i -> array_to_string(list_slice(t, i, i + 4), ' ')))) AS g
        FROM toks
    ),
    bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
    hits AS (
        SELECT c.doc_id, COUNT(*) AS n_hits
        FROM grams c JOIN bench b USING (g)
        WHERE c.doc_id % 97 <> 0
        GROUP BY c.doc_id
    ),
    -- span removal: POSITIONED grams (1-based start i), hit starts per
    -- doc, then an index-aware token filter. A 5-gram at start p covers
    -- tokens [p, p+4]; margin 1 widens to [p-1, p+5]; merged spans gap
    -- at start deltas > 5 + 2*1 = 7.
    posg AS (
        SELECT doc_id, unnest(range(1, greatest(len(t) - 4, 0) + 1)) AS i, t
        FROM toks WHERE doc_id % 97 <> 0
    ),
    hitpos AS (
        SELECT p.doc_id, list_sort(list(p.i)) AS hp
        FROM (SELECT doc_id, i,
                     array_to_string(list_slice(t, i, i + 4), ' ') AS g
              FROM posg) p
        JOIN bench b USING (g)
        GROUP BY p.doc_id
    ),
    spans AS (
        SELECT tk.doc_id,
               list_filter(tk.t, (x, i) ->
                   NOT len(list_filter(COALESCE(h.hp, []),
                       p -> i >= p - 1 AND i <= p + 5)) > 0) AS ct,
               tk.t AS t,
               COALESCE(h.hp, []) AS hp
        FROM (SELECT doc_id, t FROM toks WHERE doc_id % 97 <> 0) tk
        LEFT JOIN hitpos h ON tk.doc_id = h.doc_id
    )
    SELECT s.doc_id,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_contaminated,
           COALESCE(h.n_hits, 0) > 0 AS contaminated,
           -- COALESCE: DuckDB's array_to_string([]) is NULL where
           -- Spark's array_join([]) is '' (the fully-contaminated doc)
           COALESCE(array_to_string(s.ct, ' '), '') AS clean_text,
           CAST(len(s.t) AS INT) AS n_tokens,
           CAST(len(s.t) - len(s.ct) AS INT) AS n_tokens_removed,
           CAST(len(list_filter(range(1, len(s.hp) + 1),
                    j -> j = 1 OR s.hp[j] - s.hp[j - 1] > 7)) AS INT)
               AS n_spans
    FROM spans s LEFT JOIN hits h ON s.doc_id = h.doc_id
    """,
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set decontamination, doc-level AND span-level: flag corpus
    docs sharing any 5-token word n-gram with a held-out benchmark
    slice (docs with doc_id % 97 == 0 stand in for the eval suite), and
    excise the matching spans (margin 1 token, overlaps merged) keeping
    the clean remainder — the Llama/PaLM-style refinement added in
    round 10 (operators/text.remove_contaminated_spans, pure Column
    index-aware filter, no UDF). The GPT-3-style overlap count —
    production pipelines use 8-13 grams on natural text; 5 matches this
    fixture's short synthetic docs so the query exercises real
    positives. See operators/text.contamination_hits for the
    broadcast-benchmark zero-corpus-shuffle plan shape."""
    from ..operators.text import remove_contaminated_spans

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    # ONE operator pass: the span remover derives the doc-level
    # distinct-gram hit count from its own gram join, so the query pays
    # one benchmark broadcast and the corpus gram stream still never
    # shuffles (plan pinned in tests/test_plans.py)
    spans = remove_contaminated_spans(corpus, bench, n=5, margin=1)
    return spans.select(
        "doc_id",
        "n_contaminated",
        (F.col("n_contaminated") > 0).alias("contaminated"),
        "clean_text",
        "n_tokens",
        "n_tokens_removed",
        "n_spans",
    )


# ===========================================================================
# Multimodal plumbing
# ===========================================================================


@_q(
    "multimodal_meta",
    """
    SELECT doc_id,
           -- pmod + explicit WHEN 2: negative ids map like Spark's pmod
           -- (DuckDB % keeps the dividend sign) and a NULL id yields
           -- NULL, not the ELSE arm
           CASE CAST(((doc_id % 3) + 3) % 3 AS INT)
                WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                WHEN 2 THEN 'video' END
             AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
           CAST((octet_length(encode(text)) * 7) % 480 AS BIGINT) AS height
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media columns through real Arrow/mapInPandas plumbing with
    a deterministic fake codec (operators/multimodal.py) — the oracle
    reproduces the fake's arithmetic from byte lengths."""
    media = M.attach_fake_media(load_table(spark, sf_dir, "documents"))
    return M.extract_media_features(media).drop("checksum")


@_q(
    "multimodal_checksum",
    """
    WITH b AS (
        SELECT doc_id, text,
               substr(hex(encode(text)), 1, 128) AS h  -- first 64 bytes, hex
        FROM documents
    )
    SELECT doc_id,
           CASE CAST(((doc_id % 3) + 3) % 3 AS INT)
                WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                WHEN 2 THEN 'video' END
             AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
           CAST((octet_length(encode(text)) * 7) % 480 AS BIGINT) AS height,
           -- NULL text -> NULL checksum (the fake codec's null-payload
           -- policy); the COALESCE 0 is only for EMPTY payloads
           CASE WHEN text IS NULL THEN NULL
                ELSE CAST(COALESCE(list_sum(
                    [ (strpos('0123456789ABCDEF', h[i]) - 1)
                      * (CASE WHEN i % 2 = 1 THEN 16 ELSE 1 END)
                      for i in range(1, len(h) + 1) ]), 0) % 2147483648
                    AS BIGINT) END
             AS checksum
    FROM b
    """,
)
def multimodal_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same pipeline including the byte-access checksum, proving the UDF
    really sees the binary payload (not just lengths). The oracle folds
    the hex expansion of the first 64 UTF-8 bytes — pure byte arithmetic
    DuckDB can reproduce, so this query is fully hash-checked."""
    media = M.attach_fake_media(load_table(spark, sf_dir, "documents"))
    return M.extract_media_features(media)


# ===========================================================================
# Event-time windowing (batch semantics; streaming mirrors in streaming/)
# ===========================================================================

# exact integer floor (mirrors functions/tsql.epoch_ms): subtract the
# non-negative remainder, then divide — no double-rounding at extreme
# timestamps
_EPOCH = (
    "CAST((epoch_us({0}) - ((epoch_us({0}) % 1000) + 1000) % 1000) // 1000"
    " AS BIGINT)"
)


@_q(
    "events_rollup_serve",
    f"""
    WITH ev AS (SELECT ts, value FROM events WHERE ts IS NOT NULL),
    tumb AS (
        SELECT 'tumbling' AS kind,
               {_EPOCH.format("time_bucket(INTERVAL 15 minutes, ts)")} AS win_start_ms,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(FLOOR((CASE WHEN NOT isfinite(value) THEN NULL ELSE value END) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS sum_value
        FROM ev GROUP BY 1, 2
    ),
    grids AS (
        SELECT time_bucket(INTERVAL 15 minutes, ts) AS wstart, value FROM ev
        UNION ALL
        SELECT time_bucket(INTERVAL 15 minutes, ts) - INTERVAL 15 minutes, value
        FROM ev
    ),
    slid AS (
        SELECT 'sliding' AS kind,
               {_EPOCH.format("wstart")} AS win_start_ms,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(FLOOR((CASE WHEN NOT isfinite(value) THEN NULL ELSE value END) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS sum_value
        FROM grids GROUP BY 1, 2
    )
    SELECT * FROM tumb UNION ALL SELECT * FROM slid
    """,
)
def events_rollup_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time windowed aggregations, both kinds in one result (batch
    mirror of the Structured Streaming aggregations in
    streaming/windows.py): 15-minute tumbling windows, and 30-minute
    windows sliding by 15 where every event lands in exactly two windows
    (the oracle materializes the two offset tumbling grids). Tumbling IS
    sliding with slide == size, so one query covers the family; the
    ``kind`` column keys the streaming equivalence tests.

    Renamed from events_windowed_agg in round 11 (VERDICT r10 #8): the
    TUMBLING arm now answers through the continuous-aggregate serve
    path (pipeline/rollup.py) — windows closed by a mid-stream
    watermark (60% through the fixture's time range) are MATERIALIZED
    to a scratch rollup table and the query returns materialized ∪
    live-tail — while the oracle stays the plain full-window SQL. A
    green row therefore proves the mat/live split reassembles the
    exact aggregation (no dropped, doubled, or straddled window), the
    property the hypertable-rollup pattern must preserve. Null event
    times belong to no window and are filtered on BOTH engines (the
    rollup path's tail pruning could not see them)."""
    import tempfile

    from ..pipeline.rollup import materialize_rollup, serve_rollup

    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())

    def windowed(kind: str, *win: str) -> DataFrame:
        return (
            ev.groupBy(F.window("ts", *win).alias("win"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                # NaN/Inf value -> NULL via scaled_cents' non-finite
                # guard (sum skips it); the oracle mirrors with an
                # explicit isfinite CASE — DuckDB's FLOOR->BIGINT cast
                # would ABORT on NaN otherwise
                sum2(F.col("value")).alias("sum_value"),
            )
            .select(
                F.lit(kind).alias("kind"),
                epoch_ms(F.col("win.start")).alias("win_start_ms"),
                "n_events",
                "sum_value",
            )
        )

    # deterministic mid-stream watermark: 60% through the observed
    # time range (two metadata-scale aggs; at 100 TB the watermark
    # comes from the scheduler, not a scan — see pipeline/rollup.py)
    lo, hi = ev.agg(
        epoch_ms(F.min("ts")), epoch_ms(F.max("ts"))
    ).first()
    wm = lo + (hi - lo) * 6 // 10
    path = tempfile.mkdtemp(prefix="rollup_serve_")
    # scratch rollup table: reclaimed at interpreter exit (plan-cached,
    # so at most one directory per (session, dataset) — but a leak is a
    # leak; review r11)
    import atexit
    import shutil

    atexit.register(shutil.rmtree, path, ignore_errors=True)
    materialize_rollup(ev, path, "15 minutes", watermark_ms=wm)
    tumbling = serve_rollup(
        spark, ev, path, "15 minutes", watermark_ms=wm
    ).select(
        F.lit("tumbling").alias("kind"),
        "win_start_ms",
        "n_events",
        "sum_value",
    )
    return tumbling.unionAll(windowed("sliding", "30 minutes", "15 minutes"))


@_q(
    "events_rollup_cascade",
    f"""
    WITH ev AS (
        SELECT ts,
               CAST(FLOOR((CASE WHEN NOT isfinite(value) THEN NULL
                                ELSE value END) * 100 + 0.5) AS BIGINT) AS c
        FROM events WHERE ts IS NOT NULL
    ),
    hourly AS (
        SELECT '1 hour' AS level,
               {_EPOCH.format("time_bucket(INTERVAL 1 hour, ts)")} AS win_start_ms,
               COUNT(*) AS n_events,
               CAST(SUM(c) AS DOUBLE) / 100 AS sum_value
        FROM ev GROUP BY 1, 2
    ),
    daily AS (
        SELECT '1 day' AS level,
               {_EPOCH.format("time_bucket(INTERVAL 1 day, ts)")} AS win_start_ms,
               COUNT(*) AS n_events,
               CAST(SUM(c) AS DOUBLE) / 100 AS sum_value
        FROM ev GROUP BY 1, 2
    )
    SELECT * FROM hourly UNION ALL SELECT * FROM daily
    """,
)
def events_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The continuous-aggregate CASCADE (pipeline/rollup.cascade_rollup,
    round 12 / VERDICT r11 #4): the 15-minute rollup is materialized
    from raw events ONCE, then the 1-hour level is computed FROM the
    15-minute windows table and the 1-day level FROM the 1-hour one —
    raw events are scanned exactly once regardless of how many
    resolutions exist. The oracle aggregates raw events DIRECTLY at
    both granularities, so a green row proves the cascade's core claim:
    rolling up a rollup equals aggregating the source, including the
    exact-cents re-aggregation contract (each level recovers integer
    cents via floor(sum*100+0.5), so double drift cannot accumulate
    across levels). final=True is the finished-dataset backfill arm —
    every window present bakes, including the trailing partials the
    frontier rule would hold back (those semantics are pytest-covered
    in tests/test_rollup.py). Null event times belong to no window and
    are filtered on both engines."""
    import atexit
    import shutil
    import tempfile

    from ..pipeline.rollup import cascade_rollup, materialize_rollup

    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    # scratch rollup tables, reclaimed at interpreter exit — the same
    # accepted caveat as events_rollup_serve's scratch dir: the plan
    # cache bounds this to one dir trio per (session, dataset); fresh
    # dirs per build are REQUIRED, not lazy — reusing a path across
    # fixture regenerations would let first-writer-wins pin stale
    # windows from the old data forever (review r12)
    paths = {}
    for lvl in ("15m", "1h", "1d"):
        paths[lvl] = tempfile.mkdtemp(prefix=f"rollup_cascade_{lvl}_")
        atexit.register(shutil.rmtree, paths[lvl], ignore_errors=True)
    materialize_rollup(ev, paths["15m"], "15 minutes")  # full backfill
    cascade_rollup(
        spark, paths["15m"], paths["1h"], "15 minutes", "1 hour", final=True
    )
    cascade_rollup(
        spark, paths["1h"], paths["1d"], "1 hour", "1 day", final=True
    )

    def level(lvl: str, name: str) -> DataFrame:
        return spark.read.parquet(paths[lvl]).select(
            F.lit(name).alias("level"), "win_start_ms", "n_events", "sum_value"
        )

    return level("1h", "1 hour").unionAll(level("1d", "1 day"))


@_q(
    "text_chunking",
    """
    WITH t AS (
        SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
    ),
    c AS (
        SELECT doc_id, toks,
               1 + CAST(ceil(greatest(len(toks) - 64, 0) / 48.0) AS INT) AS n_chunks
        FROM t
    ),
    e AS (
        SELECT doc_id, toks, unnest(range(0, n_chunks)) AS ci FROM c
    )
    SELECT doc_id,
           CAST(ci AS INT) AS chunk_idx,
           array_to_string(list_slice(toks, CAST(ci*48 + 1 AS INT),
                                      CAST(ci*48 + 64 AS INT)), ' ') AS chunk_text,
           CAST(len(list_slice(toks, CAST(ci*48 + 1 AS INT),
                               CAST(ci*48 + 64 AS INT))) AS INT) AS n_chunk_tokens
    FROM e
    """,
)
def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-bounded overlapping chunking (64-token chunks, 16-token
    overlap — the pre-training/RAG windowing step) over the documents
    table; operators/text.chunk_documents, a map-only
    sequence/posexplode/slice projection."""
    docs = load_table(spark, sf_dir, "documents")
    return X.chunk_documents(docs, chunk_tokens=64, overlap=16)


@_q(
    "events_session_agg",
    f"""
    WITH ordered AS (
        SELECT user_id, ts, value, event_id,
               -- event_id tiebreak keeps BOTH window orders identical and
               -- total when a user has duplicate timestamps
               -- STRICT >: Spark's session_window keeps an event
               -- arriving exactly `gap` after the previous one in the
               -- SAME session (the window end is last+gap and arrival
               -- at the end extends it); >= here split it — a latent
               -- boundary bug the adversarial event fixture caught
               -- (microsecond fixture timestamps never tie exactly)
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 minutes
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC NULLS FIRST, event_id ASC)
    ), sessions AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts ASC NULLS FIRST, event_id ASC
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM ordered
    )
    SELECT user_id,
           {_EPOCH.format("MIN(ts)")} AS session_start_ms,
           {_EPOCH.format("MAX(ts) + INTERVAL 30 minutes")} AS session_end_ms,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR((CASE WHEN NOT isfinite(value) THEN NULL ELSE value END) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS sum_value
    FROM sessions GROUP BY user_id, session_id
    """,
)
def events_session_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute inactivity gap) per user — Spark's
    session_window; the oracle derives identical sessions with the
    gaps-and-islands idiom (session end = last event + gap)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("win"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            sum2(F.col("value")).alias("sum_value"),
        )
        .select(
            "user_id",
            epoch_ms(F.col("win.start")).alias("session_start_ms"),
            epoch_ms(F.col("win.end")).alias("session_end_ms"),
            "n_events",
            "sum_value",
        )
    )


@_q(
    "events_capped_sessions",
    f"""
    WITH RECURSIVE e AS (
        -- all comparisons in floored epoch-ms, the exact ints the
        -- Spark kernel walks (functions/tsql.epoch_ms contract)
        SELECT user_id,
               {_EPOCH.format("ts")} AS t_ms,
               CAST(FLOOR((CASE WHEN NOT isfinite(value) THEN 0.0
                                ELSE value END) * 100 + 0.5) AS BIGINT) AS v_cents,
               -- event_id tiebreak mirrors the kernel's tiebreak arg
               -- (ADVICE r10): equal timestamps would otherwise make
               -- both engines nondeterministic
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ), r AS (
        -- the genuinely recursive part: a session's start depends on
        -- where the previous one ended (the duration cap makes this an
        -- iterated split no window expression can produce — see
        -- operators/sessionize.capped_sessions); one recursion step per
        -- event RANK, all users advance together
        SELECT user_id, rn, t_ms, v_cents, t_ms AS start_ms
        FROM e WHERE rn = 1
        UNION ALL
        SELECT e.user_id, e.rn, e.t_ms, e.v_cents,
               CASE WHEN e.t_ms - r.t_ms > 86400000
                         OR e.t_ms - r.start_ms > 7200000
                    THEN e.t_ms ELSE r.start_ms END
        FROM r JOIN e ON e.user_id = r.user_id AND e.rn = r.rn + 1
    ), sess AS (
        SELECT user_id, start_ms AS session_start_ms,
               MAX(t_ms) AS session_end_ms,
               COUNT(*) AS n_events,
               CAST(SUM(v_cents) AS DOUBLE) / 100 AS sum_value
        FROM r GROUP BY user_id, start_ms
    )
    SELECT user_id, session_start_ms, session_end_ms, n_events, sum_value,
           -- the event that opened the NEXT session is the one that
           -- closed this one: gap wins when it breached both bounds
           -- (same transition order as the kernel); no next session =
           -- flushed at end-of-input ('timeout', the watermark analog)
           CASE WHEN next_start IS NULL THEN 'timeout'
                WHEN next_start - session_end_ms > 86400000 THEN 'gap'
                ELSE 'cap' END AS closed_by
    FROM (SELECT sess.*,
                 LEAD(session_start_ms) OVER (PARTITION BY user_id
                                              ORDER BY session_start_ms)
                     AS next_start
          FROM sess) t
    """,
)
def events_capped_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap+cap sessionization (24-hour inactivity gap, 2-hour maximum
    duration — parameters chosen so ALL THREE close reasons fire on the
    events fixture: at sf0.01 ~7.2k cap / ~1.1k gap / 150 timeout
    sessions; a 30-minute gap on this sparse fixture never exercised
    the cap branch) — the batch replay of
    streaming.capped_sessions_stream
    (operators/sessionize.capped_sessions: one user_id exchange + an
    Arrow per-group walk). The oracle is a DuckDB RECURSIVE CTE: the
    duration cap makes session assignment an iterated split, so the
    oracle recurses one event-rank per step. VERDICT r09 #6. Both
    engines order equal timestamps by event_id (ADVICE r10) so the
    gate stays deterministic even if a future fixture draws duplicate
    (user_id, ts) pairs."""
    from ..operators.sessionize import capped_sessions

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    return capped_sessions(
        ev, gap="24 hours", max_duration="2 hours",
        tiebreak=("event_id",),
    )


# Retrieval-gate constants (hybrid_retrieval): the literal probe
# queries (corpus-vocabulary terms; q2 repeats 'key' so qtf=2 is
# exercised) — their ids double as the dense arm's query vec_ids — and
# the k1/b floats whose reprs are embedded in BOTH engines'
# expressions.
_BM25_QUERIES = [
    (0, "table scan fast"),
    (1, "window agg stream batch"),
    (2, "key value key customer"),
]
_BM25_VALUES = ", ".join(f"({i}, '{q}')" for i, q in _BM25_QUERIES)


@_q(
    "hybrid_retrieval",
    f"""
    WITH RECURSIVE tok AS (
        SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
                                          t -> t <> '')) AS term
        FROM documents
    ), tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
    ), dl AS (
        SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY 1
    ), stats AS (
        SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
               (SELECT CAST(COALESCE(SUM(tf), 0) AS DOUBLE) FROM tf) AS total
    ), idf AS (
        -- Robertson non-negative idf, same association order as
        -- retrieval._idf_expr: ln(1 + (N - df + 0.5)/(df + 0.5))
        SELECT term,
               ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                        / (CAST(df AS DOUBLE) + 0.5)) AS idf
        FROM (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1), stats
    ), q(query_id, query) AS (
        VALUES {_BM25_VALUES}
    ), qt AS (
        SELECT query_id, term, COUNT(*) AS qtf
        FROM (SELECT query_id, unnest(string_split(query, ' ')) AS term
              FROM q)
        GROUP BY 1, 2
    ), contrib AS (
        -- the _bm25_score_expr association order, verbatim:
        -- ((qtf * idf) * (tf * (k1+1))) / (tf + k1*((1-b) + b*dl/avgdl))
        SELECT query_id, doc_id, term,
               CAST(qtf AS DOUBLE) * idf * (CAST(tf AS DOUBLE) * 2.2)
               / (CAST(tf AS DOUBLE)
                  + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl)) AS s
        FROM tf
        JOIN dl USING (doc_id)
        JOIN idf USING (term)
        JOIN qt USING (term),
             (SELECT total / CAST(n_docs AS DOUBLE) AS avgdl FROM stats)
    ),
    bmscore AS (
        SELECT query_id, doc_id,
               ROUND(list_aggregate(list(s ORDER BY term), 'sum'), 6) AS score
        FROM contrib GROUP BY query_id, doc_id
    ),
    -- lexical arm: top-10 per query by the ROUNDED fold score (ties at
    -- 6 dp break on doc_id, so the rank is a cross-engine total order)
    lexk AS (
        SELECT * FROM (
            SELECT query_id, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY score DESC, doc_id ASC)
                       AS lex_rank
            FROM bmscore
        ) WHERE lex_rank <= 10
    ),
    -- dense arm: the embedding_cosine_topk fold/round/rank discipline,
    -- query vectors = embeddings of the probe query ids
    qv AS (
        SELECT vec_id AS query_id, embedding AS qvec
        FROM embeddings WHERE vec_id < 3 AND {_usable_vec('embedding')}
    ),
    cvec AS (
        SELECT vec_id, embedding FROM embeddings
        WHERE {_usable_vec('embedding')}
    ),
    dk AS (
        SELECT * FROM (
            SELECT query_id, vec_id AS doc_id, sim,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, vec_id ASC)
                       AS dense_rank
            FROM (SELECT q.query_id, c.vec_id,
                         ROUND({_cos('q.qvec', 'c.embedding')}, 6) AS sim
                  FROM cvec c CROSS JOIN qv q)
        ) WHERE dense_rank <= 10
    ),
    -- reciprocal rank fusion: 1/(60+rank) per arm; two commutative
    -- float adds, bit-stable cross-engine
    fused AS (
        SELECT COALESCE(l.query_id, d.query_id) AS query_id,
               COALESCE(l.doc_id, d.doc_id) AS doc_id,
               COALESCE(1.0 / (60.0 + l.lex_rank), 0.0)
                 + COALESCE(1.0 / (60.0 + d.dense_rank), 0.0) AS rrf_score,
               l.lex_rank, d.dense_rank
        FROM lexk l
        FULL OUTER JOIN dk d
          ON l.query_id = d.query_id AND l.doc_id = d.doc_id
    ),
    franked AS (
        SELECT fused.*,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY rrf_score DESC, doc_id ASC)
                   AS rank
        FROM fused
    ),
    -- mmr stage: greedy maximal-marginal-relevance over the dense
    -- top-10 (lam=0.5 keeps (1-lam) an exact double). One recursion
    -- step per pick; the working row carries the whole candidate list
    -- (with per-candidate pair-sim lists) so the recursive term needs
    -- ONLY list HOFs — no aggregate/window/LATERAL, the
    -- events_capped_sessions recursion discipline. Selection = first
    -- element of a struct sort on (-val, -rel, doc_id): DuckDB struct
    -- comparison is field-order lexicographic, so this IS the kernel's
    -- "strict > keeps the earliest (rel desc, id asc)" tie-break.
    mstat AS (SELECT query_id, MIN(sim) AS mn, MAX(sim) AS mx
              FROM dk GROUP BY 1),
    mpair AS (
        SELECT a.query_id, a.doc_id AS ia,
               list(struct_pack(b := b.doc_id,
                                s := ROUND({_cos('ea.embedding',
                                                 'eb.embedding')}, 6))
                    ORDER BY b.doc_id) AS sims
        FROM dk a JOIN dk b ON a.query_id = b.query_id
                           AND a.doc_id <> b.doc_id
        JOIN cvec ea ON ea.vec_id = a.doc_id
        JOIN cvec eb ON eb.vec_id = b.doc_id
        GROUP BY 1, 2
    ),
    mcand AS (
        SELECT d.query_id,
               list(struct_pack(
                   doc_id := d.doc_id,
                   rel := d.sim,
                   nrel := CASE WHEN s.mx > s.mn
                                THEN (d.sim - s.mn) / (s.mx - s.mn)
                                ELSE 1.0 END,
                   sims := p.sims) ORDER BY d.sim DESC, d.doc_id ASC)
                 AS cands
        FROM dk d JOIN mstat s USING (query_id)
        LEFT JOIN mpair p ON p.query_id = d.query_id AND p.ia = d.doc_id
        GROUP BY 1
    ),
    mrec AS (
        SELECT query_id, 0 AS step, CAST([] AS BIGINT[]) AS picked,
               CAST(NULL AS BIGINT) AS sel, CAST(NULL AS DOUBLE) AS val,
               cands
        FROM mcand
        UNION ALL
        SELECT query_id, step + 1, list_append(picked, best.doc_id),
               best.doc_id, best.v, cands
        FROM (
            SELECT query_id, step, picked, cands,
                   list_sort(list_transform(
                       list_filter(cands,
                                   c -> NOT list_contains(picked, c.doc_id)),
                       -- GREATEST(..., 0.0): the kernel's max_sim
                       -- starts at 0 and only rises (s > max_sim), so
                       -- an all-negative similarity set penalizes 0,
                       -- never rewards
                       c -> struct_pack(
                           nv := -(0.5 * c.nrel - 0.5 * GREATEST(
                                 COALESCE(list_max(
                                   list_transform(
                                     list_filter(c.sims,
                                         e -> list_contains(picked, e.b)),
                                     e -> e.s)), 0.0), 0.0)),
                           nr := -c.rel,
                           doc_id := c.doc_id,
                           v := 0.5 * c.nrel - 0.5 * GREATEST(
                                 COALESCE(list_max(
                                   list_transform(
                                     list_filter(c.sims,
                                         e -> list_contains(picked, e.b)),
                                     e -> e.s)), 0.0), 0.0))))[1] AS best
            FROM mrec
            WHERE step < 5 AND len(cands) > len(picked)
        )
    )
    SELECT 'bm25' AS stage, CAST(query_id AS BIGINT) AS query_id,
           CAST(doc_id AS BIGINT) AS doc_id, score,
           CAST(NULL AS INT) AS rank, CAST(NULL AS INT) AS lex_rank,
           CAST(NULL AS INT) AS dense_rank
    FROM bmscore
    UNION ALL
    SELECT 'fused', CAST(query_id AS BIGINT), CAST(doc_id AS BIGINT),
           rrf_score, CAST(rank AS INT), CAST(lex_rank AS INT),
           CAST(dense_rank AS INT)
    FROM franked WHERE rank <= 10
    UNION ALL
    SELECT 'mmr', CAST(query_id AS BIGINT), CAST(sel AS BIGINT),
           ROUND(val, 6), CAST(step AS INT), CAST(NULL AS INT),
           CAST(NULL AS INT)
    FROM mrec WHERE step >= 1
    """,
)
def hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical + dense + fused retrieval, one merged gate query (the
    events_rollup_serve kind-column discipline):

    - stage='bm25': Okapi BM25 scores for EVERY (query, doc) pair
      sharing a term, through the REAL index build + scorer
      (operators/retrieval.build_bm25_index / bm25_scores) in the
      order-stable fold form — per-pair contributions sum by a
      term-sorted sequential fold on BOTH engines (the cosine _dot
      discipline), rounded to 6 dp to absorb any last-ulp ln()
      difference between the JVM and libm;
    - stage='fused': the REAL reciprocal-rank fusion
      (operators/retrieval.rrf_fuse, Cormack 2009) of the lexical
      top-10 (ranked on the ROUNDED fold score — ties break on doc_id,
      a cross-engine total order) and a dense cosine top-10
      (similarity.cosine_topk, the fold/round/rank discipline of the
      hash-green embedding_cosine_topk; query vectors are the probe
      ids' embeddings — documents and embeddings share the 0..N id
      space). RRF contributions 1/(60+rank) are exact doubles and at
      most two add per doc (commutative), so rrf_score is bit-stable.

    bench `bm25_topk` keeps measuring the cheaper partial-aggregated
    serving plan; hybrid_topk (the one-call composition of the same
    parts) stays pinned by tests/test_retrieval.py's recall evidence."""
    from ..operators.retrieval import (
        bm25_scores,
        build_bm25_index,
        mmr_rerank,
        rrf_fuse,
    )
    from ..operators.topk import grouped_topk

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    idx = build_bm25_index(docs)
    qdf = spark.createDataFrame(
        _BM25_QUERIES, "query_id int, query string"
    )
    # r14 (VERDICT r13 #5): the probe query set is plan-stable, so the
    # serve folds it into literal expressions (the bm25_topk r13 path,
    # now shared) instead of re-running the query-side subplan +
    # broadcast per action. Same rows to the ulp: the stable fold sums
    # per-(query, doc) contributions in term order either way
    # (differential test in tests/test_retrieval.py).
    scores = bm25_scores(idx, qdf, stable_round=6, inline_queries=True)
    lex = grouped_topk(
        scores,
        ["query_id"],
        [F.col("score").desc(), F.col("doc_id").asc()],
        10,
        rank_col="lex_rank",
    ).select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("doc_id").cast("long").alias("doc_id"),
        "lex_rank",
    )
    qv = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    dense_scored = S.cosine_topk(
        emb.select("vec_id", "embedding"), qv, k=10
    ).select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("vec_id").cast("long").alias("doc_id"),
        "sim",
        F.col("rnk").alias("dense_rank"),
    )
    dense = dense_scored.select("query_id", "doc_id", "dense_rank")
    fused = rrf_fuse(
        [
            lex.select(
                "query_id", "doc_id", F.col("lex_rank").alias("rank")
            ),
            dense.select(
                "query_id", "doc_id", F.col("dense_rank").alias("rank")
            ),
        ],
        k=10,
    )
    enriched = (
        fused.join(lex, ["query_id", "doc_id"], "left")
        .join(dense, ["query_id", "doc_id"], "left")
        .select(
            F.lit("fused").alias("stage"),
            "query_id",
            "doc_id",
            F.col("rrf_score").alias("score"),
            F.col("rank").cast("int").alias("rank"),
            F.col("lex_rank").cast("int").alias("lex_rank"),
            F.col("dense_rank").cast("int").alias("dense_rank"),
        )
    )
    bm = scores.select(
        F.lit("bm25").alias("stage"),
        F.col("query_id").cast("long").alias("query_id"),
        F.col("doc_id").cast("long").alias("doc_id"),
        "score",
        F.lit(None).cast("int").alias("rank"),
        F.lit(None).cast("int").alias("lex_rank"),
        F.lit(None).cast("int").alias("dense_rank"),
    )
    # stage='mmr' (r13, VERDICT r12 #4): the REAL greedy MMR rerank
    # (operators/retrieval.mmr_rerank) over the dense top-10, lam=0.5
    # so (1-lam) is an exact double; stable_round=6 rounds each
    # pairwise redundancy cosine so the DuckDB recursive-CTE oracle
    # (sequential-fold cosine) reproduces every selection.
    mmr = mmr_rerank(
        dense_scored.select("query_id", "doc_id", F.col("sim").alias("score")),
        emb.select(F.col("vec_id").alias("doc_id"), "embedding"),
        k=5,
        lam=0.5,
        stable_round=6,
    ).select(
        F.lit("mmr").alias("stage"),
        F.col("query_id").cast("long").alias("query_id"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.round("mmr_score", 6).alias("score"),
        F.col("rank").cast("int").alias("rank"),
        F.lit(None).cast("int").alias("lex_rank"),
        F.lit(None).cast("int").alias("dense_rank"),
    )
    return bm.unionByName(enriched).unionByName(mmr)


# ===========================================================================
# Tokenization + importance resampling (oracle rows — VERDICT r10 #4)
# ===========================================================================

# A FIXED merge list pins the tokenizer's serving vocabulary, the same
# way _BM25_QUERIES pins the retrieval probes: tokenize-with-a-given-
# vocab is the operator under test here; TRAINING is pinned separately
# by the trainer-equality pytest suite (tests/test_bpe.py). The list is
# train_bpe_local's exact output for 32 merges over the sf0.001
# documents word table — deterministic, re-derivable, and embedded as
# literals so the DuckDB oracle can apply the identical merge sequence.
_BPE_MERGES: list[tuple[str, str]] = [
    ("e", "r"), ("e", "</w>"), ("n", "</w>"), ("o", "r"), ("t", "</w>"),
    ("er", "</w>"), ("o", "w"), ("ow", "</w>"), ("l", "u"), ("i", "n"),
    ("y", "</w>"), ("a", "r"), ("p", "ar"), ("g", "</w>"), ("a", "s"),
    ("h", "</w>"), ("a", "</w>"), ("s", "t"), ("a", "t"), ("a", "n</w>"),
    ("c", "an</w>"), ("s", "can</w>"), ("c", "o"), ("co", "lu"),
    ("colu", "m"), ("colum", "n</w>"), ("d", "ow</w>"), ("in", "dow</w>"),
    ("w", "indow</w>"), ("d", "er</w>"), ("or", "der</w>"), ("or", "t</w>"),
]


def _bpe_oracle() -> str:
    """DuckDB rendering of the greedy left-to-right BPE encoder: each
    symbol is framed chr(1)+sym+chr(2) (framing chars are outside the
    fixture's ASCII alphabet), so replace(S(a)S(b) -> S(ab)) can never
    match across symbol boundaries, and replace()'s left-to-right
    non-overlapping scan IS the greedy adjacent-pair fold of
    operators/bpe.encode_word (verified token-for-token on the fixture
    corpus). One replace per learned merge, applied in training order
    inside a per-word list_transform lambda."""

    def s(x: str) -> str:
        return "\x01" + x + "\x02"

    expr = (
        "regexp_replace(w, '(.)', chr(1) || '\\1' || chr(2), 'g')"
        " || chr(1) || '</w>' || chr(2)"
    )
    for a, b in _BPE_MERGES:
        expr = f"replace({expr}, '{s(a) + s(b)}', '{s(a + b)}')"
    return f"""
    WITH words AS (
        SELECT doc_id,
               list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
        FROM documents
    ),
    enc AS (
        -- DuckDB's array_to_string returns NULL for an EMPTY list, so
        -- coalesce inside a ws-null guard: NULL text -> NULL stream
        -- (matching the pandas kernel), whitespace-only text -> ''
        SELECT doc_id,
               CASE WHEN ws IS NULL THEN NULL ELSE
               COALESCE(array_to_string(list_transform(ws,
                   w -> replace(trim({expr}, chr(1) || chr(2)),
                                chr(2) || chr(1), ' ')), ' '), '') END
                   AS tokens_str
        FROM words
    )
    SELECT doc_id,
           CASE WHEN tokens_str = '' THEN 0
                ELSE len(string_split(tokens_str, ' ')) END AS n_tokens,
           tokens_str
    FROM enc
    """


@_q("bpe_tokenize", _bpe_oracle())
def bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serve-side BPE tokenization of the documents corpus under the
    pinned ``_BPE_MERGES`` vocabulary (operators/bpe.bpe_tokenize: one
    narrow Arrow-batched pandas UDF with a Zipfian word cache — no
    shuffle, linear in corpus bytes). Output is (doc_id, n_tokens,
    tokens_str): the token count plus the space-joined token stream
    (tokens never contain spaces — words were split on spaces and the
    end-of-word sentinel is '</w>'), so the driver hash-checks every
    token of every document against the oracle's replace-chain encoder.
    VERDICT r10 #4 (bench headliner bpe_tokenize graduates from
    pytest-only to oracle-gated)."""
    from ..operators.bpe import bpe_tokenize as bpe_op

    docs = load_table(spark, sf_dir, "documents")
    toks = bpe_op(docs, _BPE_MERGES)
    return toks.select(
        "doc_id",
        F.size("bpe_tokens").alias("n_tokens"),
        F.array_join("bpe_tokens", " ").alias("tokens_str"),
    )


_DSIR_BUCKETS = 4096


@_q(
    "dsir_score",
    f"""
    WITH toks AS (
        SELECT doc_id, lang,
               list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
        FROM documents
    ),
    grams AS (
        -- unigrams + bigrams with multiplicity, the ns=(1,2) stream of
        -- operators/dsir._gram_stream (len<2 docs yield no bigram)
        SELECT doc_id, lang, unnest(list_concat(t,
                   list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                                  i -> t[i] || ' ' || t[i + 1]))) AS g
        FROM toks
    ),
    feats AS (
        SELECT doc_id, lang,
               CAST(('0x' || substr(md5(g), 1, 15))::BIGINT
                    % {_DSIR_BUCKETS} AS INT) AS bucket,
               COUNT(*) AS cnt
        FROM grams GROUP BY 1, 2, 3
    ),
    tc AS (SELECT bucket, SUM(cnt) AS ct FROM feats
           WHERE lang = 'en' GROUP BY 1),
    rc AS (SELECT bucket, SUM(cnt) AS cr FROM feats GROUP BY 1),
    norms AS (
        SELECT ln((SELECT COALESCE(SUM(ct), 0) FROM tc)
                  + {_DSIR_BUCKETS}.0)
             - ln((SELECT COALESCE(SUM(cr), 0) FROM rc)
                  + {_DSIR_BUCKETS}.0) AS nd
    ),
    -- the target corpus is a subset of raw, so raw's buckets cover
    -- every observed bucket: rc LEFT JOIN tc == the full-outer join of
    -- fit_dsir, and the smoothing default never fires for these docs
    ratios AS (
        SELECT rc.bucket,
               ln(COALESCE(tc.ct, 0) + 1.0) - ln(cr + 1.0) - norms.nd
                   AS log_ratio
        FROM rc LEFT JOIN tc USING (bucket), norms
    )
    SELECT d.doc_id,
           ROUND(COALESCE(s.log_w, 0.0) * 1000000) / 1000000 + 0.0 AS log_w
    FROM documents d
    LEFT JOIN (
        SELECT doc_id, SUM(cnt * log_ratio) AS log_w
        FROM feats JOIN ratios USING (bucket)
        GROUP BY doc_id
    ) s USING (doc_id)
    """,
)
def dsir_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance log-weights of every document, scored under a
    model fitted on-the-fly: target = the lang='en' slice, raw = the
    whole corpus (operators/dsir.fit_dsir + dsir_log_weights: hashed
    unigram+bigram buckets, add-one smoothing, broadcast log-ratio
    join, id-spine-preserving sum). Runs the portable md5-prefix hash
    family so the oracle reproduces every bucket id bit-for-bit
    (operators/dedup.portable_hash); the library default stays
    xxhash64. Weights round at 6 dp via the scale-then-round idiom
    (per-doc sums are O(100) terms of O(1) log-ratios — float
    accumulation-order error lands ~1e-12, far inside the rounding).
    VERDICT r10 #4 (bench headliner dsir_score graduates from
    pytest-only to oracle-gated)."""
    from ..functions.tsql import round6_stable
    from ..operators.dsir import dsir_log_weights, fit_dsir

    docs = load_table(spark, sf_dir, "documents")
    model = fit_dsir(
        docs.filter(F.col("lang") == "en"),
        docs,
        n_buckets=_DSIR_BUCKETS,
        ns=(1, 2),
        alpha=1.0,
        hash_family="md5",
    )
    return dsir_log_weights(model, docs).select(
        "doc_id", round6_stable(F.col("log_w")).alias("log_w")
    )
