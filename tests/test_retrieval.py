"""BM25 retrieval — differential oracle: a from-scratch pure-Python
Okapi BM25 (Counter + math) over the same tokenization; Spark scores
must match to 1e-9 and top-k id-for-id."""

import math
import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from ferramenta_etl_spark.operators.retrieval import (
    bm25_scores,
    bm25_topk,
    bm25_topk_on_index,
    build_bm25_index,
    load_bm25_index,
    save_bm25_index,
)

# ---------------------------------------------------------------- reference


def py_toks(text):
    return [t for t in text.lower().split(" ") if t != ""]


def py_bm25_scores(docs, query, k1=1.2, b=0.75):
    """{doc_id: score} for every doc with a positive-match term."""
    n = len(docs)
    tfs = {i: Counter(py_toks(t)) for i, t in docs.items()}
    dls = {i: sum(c.values()) for i, c in tfs.items()}
    avgdl = sum(dls.values()) / n
    df = Counter()
    for c in tfs.values():
        df.update(set(c))
    scores = {}
    for term in py_toks(query):
        idf = math.log(1.0 + (n - df[term] + 0.5) / (df[term] + 0.5))
        for i, c in tfs.items():
            tf = c[term]
            if tf == 0:
                continue
            s = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dls[i] / avgdl))
            scores[i] = scores.get(i, 0.0) + s
    return scores


def py_topk(docs, query, k, k1=1.2, b=0.75):
    scores = py_bm25_scores(docs, query, k1, b)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]


WORDS = [
    "spark", "query", "data", "join", "shuffle", "parquet", "index",
    "token", "model", "corpus", "filter", "the", "a", "fast",
]


@pytest.fixture(scope="module")
def corpus():
    rng = random.Random(11)
    docs = {
        i: " ".join(rng.choice(WORDS) for _ in range(rng.randint(4, 30)))
        for i in range(60)
    }
    docs[60] = ""  # empty doc: counts toward N/avgdl, never matches
    return docs


@pytest.fixture(scope="module")
def index(spark, corpus):
    df = spark.createDataFrame(list(corpus.items()), "doc_id int, text string")
    return build_bm25_index(df)


def test_corpus_scalars_match_reference(corpus, index):
    dls = [len(py_toks(t)) for t in corpus.values()]
    assert index.n_docs == len(corpus)
    assert index.avgdl == pytest.approx(sum(dls) / len(corpus))


QUERIES = [
    (0, "spark shuffle"),
    (1, "parquet index corpus"),
    (2, "the the data"),  # repeated term: qtf weighting
    (3, "zzz_nomatch"),  # matches nothing -> zero rows for this query
    (4, "join"),
]


def test_topk_matches_python_bm25(spark, corpus, index):
    qdf = spark.createDataFrame(QUERIES, "query_id int, query string")
    got = bm25_topk(index, qdf, k=7).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    assert 3 not in by_q
    for qid, qtext in QUERIES:
        if qid == 3:
            continue
        want = py_topk(corpus, qtext, 7)
        rows = sorted(by_q[qid], key=lambda r: r.rank)
        assert [r.doc_id for r in rows] == [d for d, _ in want]
        for r, (_, s) in zip(rows, want):
            assert r.score == pytest.approx(s, abs=1e-9)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))


def test_topk_inline_queries_matches_join_path(spark, corpus, index):
    """The r13 inline-queries serve (query terms collected at plan
    build and folded into literal expressions — no broadcast join)
    must return row-identical results to the join form, including
    qtf-weighted repeats and the no-match query."""
    qdf = spark.createDataFrame(QUERIES, "query_id int, query string")
    join_rows = sorted(bm25_topk(index, qdf, k=7).collect(),
                       key=lambda r: (r.query_id, r.rank))
    inline_rows = sorted(
        bm25_topk(index, qdf, k=7, inline_queries=True).collect(),
        key=lambda r: (r.query_id, r.rank),
    )
    # ids and ranks exactly; scores to the ulp — the per-(query, doc)
    # F.sum adds partial aggregates in partition order, which differs
    # between the two plans (bm25_topk documents the serve sum as
    # order-dependent / rank-stable), so last-ulp drift is expected
    assert [(r.query_id, r.doc_id, r.rank) for r in join_rows] == [
        (r.query_id, r.doc_id, r.rank) for r in inline_rows
    ]
    for a, b in zip(join_rows, inline_rows):
        assert a.score == pytest.approx(b.score, rel=1e-12)
    assert len(join_rows) > 0

    # plan pin on a lineage-truncated index (the index-build joins would
    # otherwise ride along and their count varies with session conf):
    # the inline serve must contain NO join at all, the join form one
    flat = index._replace(postings=index.postings.localCheckpoint(eager=True))

    def plan_of(df):
        return df._jdf.queryExecution().executedPlan().toString()

    assert "Join" not in plan_of(bm25_topk(flat, qdf, k=7, inline_queries=True))
    assert "Join" in plan_of(bm25_topk(flat, qdf, k=7))


def test_scores_inline_queries_matches_join_path(spark, corpus, index):
    """r14 (VERDICT r13 #5): bm25_scores grows the same inline-queries
    opt-in so hybrid_retrieval's serve can skip the per-action
    query-side subplan. Under stable_round the two paths must be
    BIT-identical — the fold sums per-(query, doc) contributions in
    term order regardless of how the query terms were attached, and
    both round to the same decimals."""
    qdf = spark.createDataFrame(QUERIES, "query_id int, query string")
    join_rows = sorted(
        bm25_scores(index, qdf, stable_round=6).collect(),
        key=lambda r: (r.query_id, r.doc_id),
    )
    inline_rows = sorted(
        bm25_scores(index, qdf, stable_round=6, inline_queries=True).collect(),
        key=lambda r: (r.query_id, r.doc_id),
    )
    assert [(r.query_id, r.doc_id, r.score) for r in join_rows] == [
        (r.query_id, r.doc_id, r.score) for r in inline_rows
    ]
    assert len(join_rows) > 0


def test_inline_queries_preserves_bigint_query_id_schema(spark, corpus, index):
    """ADVICE r13: the inline path rebuilds query_id via literals, so a
    non-int32 id column must come back with its ORIGINAL dtype — the
    differential tests above only use int ids and would not catch an
    IntegerType downcast."""
    qdf = spark.createDataFrame(
        [(10_000_000_000, "spark data join")], "query_id long, query string"
    )
    join_df = bm25_topk(index, qdf, k=3)
    inline_df = bm25_topk(index, qdf, k=3, inline_queries=True)
    # dtypes (names + types) must match exactly; nullability may only
    # TIGHTEN on the inline path (literals are provably non-null)
    assert inline_df.dtypes == join_df.dtypes
    assert dict(inline_df.dtypes)["query_id"] == "bigint"
    for inl, jn in zip(inline_df.schema.fields, join_df.schema.fields):
        assert (not inl.nullable) or jn.nullable
    assert sorted(
        (r.query_id, r.doc_id, r.rank) for r in inline_df.collect()
    ) == sorted((r.query_id, r.doc_id, r.rank) for r in join_df.collect())


def test_k1_b_parameters_flow_through(spark, corpus, index):
    qdf = spark.createDataFrame([(0, "spark data join")], "query_id int, query string")
    got = bm25_topk(index, qdf, k=5, k1=0.4, b=0.2).collect()
    want = py_topk(corpus, "spark data join", 5, k1=0.4, b=0.2)
    assert [r.doc_id for r in sorted(got, key=lambda r: r.rank)] == [
        d for d, _ in want
    ]
    for r, (_, s) in zip(sorted(got, key=lambda r: r.rank), want):
        assert r.score == pytest.approx(s, abs=1e-9)


def test_persisted_index_serves_identically(spark, corpus, index, tmp_path):
    path = str(tmp_path / "bm25")
    save_bm25_index(index, path, n_buckets=8)
    disk = load_bm25_index(spark, path)
    assert (disk.n_docs, disk.n_buckets) == (index.n_docs, 8)
    assert disk.avgdl == pytest.approx(index.avgdl)
    qdf = spark.createDataFrame(QUERIES, "query_id int, query string")
    live = sorted(
        (r.query_id, r.doc_id, round(r.score, 9), r.rank)
        for r in bm25_topk(index, qdf, k=5).collect()
    )
    served = sorted(
        (r.query_id, r.doc_id, round(r.score, 9), r.rank)
        for r in bm25_topk_on_index(disk, qdf, k=5).collect()
    )
    assert served == live


def test_pruned_serve_reads_only_query_buckets(spark, corpus, index, tmp_path):
    """The bucket filter must land as a PARTITION filter on the scan
    (a post-scan Filter row would still 'work' while reading every
    bucket's files), and the scan must touch strictly fewer files than
    the full postings directory holds."""
    import re

    path = str(tmp_path / "bm25p")
    save_bm25_index(index, path, n_buckets=16)
    disk = load_bm25_index(spark, path)
    qdf = spark.createDataFrame([(0, "join")], "query_id int, query string")
    plan = (
        bm25_topk_on_index(disk, qdf, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "term_bucket" in m.group(1), plan
    # one single-term query = exactly one bucket of 16: the pruned scan
    # declares fewer partitions than exist on disk
    n_dirs = len(
        [d for d in __import__("os").listdir(f"{path}/postings/d0")
         if d.startswith("term_bucket=")]
    )
    assert n_dirs > 1  # the fixture really is spread over buckets
    sel = re.search(r"(\d+) parts selected", plan)
    if sel:  # plan-string detail varies by Spark version; filter is pinned above
        assert int(sel.group(1)) < n_dirs


def test_empty_corpus_rejected(spark):
    df = spark.createDataFrame([], "doc_id int, text string")
    with pytest.raises(ValueError, match="empty"):
        build_bm25_index(df)


# ------------------------------------------------------------ hybrid fusion


def py_rrf(rankings, k, rrf_k=60):
    """{query: [(doc, score)...k]} from lists of {(query, doc): rank}."""
    scores = {}
    for ranking in rankings:
        for (q, d), r in ranking.items():
            scores[(q, d)] = scores.get((q, d), 0.0) + 1.0 / (rrf_k + r)
    by_q = {}
    for (q, d), s in scores.items():
        by_q.setdefault(q, []).append((d, s))
    return {
        q: sorted(ds, key=lambda x: (-x[1], x[0]))[:k] for q, ds in by_q.items()
    }


def test_rrf_fuse_matches_python(spark):
    import random

    rng = random.Random(5)
    a, b = {}, {}
    for q in range(3):
        docs = rng.sample(range(50), 10)
        for r, d in enumerate(docs, start=1):
            a[(q, d)] = r
        docs = rng.sample(range(50), 10)
        for r, d in enumerate(docs, start=1):
            b[(q, d)] = r
    from ferramenta_etl_spark.operators.retrieval import rrf_fuse

    dfa = spark.createDataFrame(
        [(q, d, r) for (q, d), r in a.items()], "query_id int, doc_id int, rank int"
    )
    dfb = spark.createDataFrame(
        [(q, d, r) for (q, d), r in b.items()], "query_id int, doc_id int, rank int"
    )
    got = rrf_fuse([dfa, dfb], k=5).collect()
    want = py_rrf([a, b], k=5)
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    for q in range(3):
        rows = sorted(by_q[q], key=lambda r: r.rank)
        assert [r.doc_id for r in rows] == [d for d, _ in want[q]]
        for r, (_, s) in zip(rows, want[q]):
            assert r.rrf_score == pytest.approx(s, abs=1e-12)


def test_rrf_doc_in_both_lists_outranks_single_list(spark):
    """A doc ranked mid-list by BOTH arms must beat a doc that only one
    arm ranked (the point of fusion)."""
    from ferramenta_etl_spark.operators.retrieval import rrf_fuse

    dfa = spark.createDataFrame(
        [(0, 100, 1), (0, 7, 3)], "query_id int, doc_id int, rank int"
    )
    dfb = spark.createDataFrame(
        [(0, 200, 1), (0, 7, 3)], "query_id int, doc_id int, rank int"
    )
    rows = {r.doc_id: r.rank for r in rrf_fuse([dfa, dfb], k=3).collect()}
    assert rows[7] == 1  # 2/(60+3) > 1/(60+1)


def test_hybrid_topk_fuses_lexical_and_dense(spark, corpus, index):
    """End-to-end hybrid: ids present in both arms' top lists surface;
    result equals rrf_fuse of the two arms computed separately."""
    import random

    from ferramenta_etl_spark.operators.retrieval import (
        bm25_topk,
        hybrid_topk,
        rrf_fuse,
    )
    from ferramenta_etl_spark.operators.similarity import cosine_topk

    rng = random.Random(3)
    emb = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in corpus],
        "doc_id int, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(0, "spark shuffle", [rng.gauss(0, 1) for _ in range(8)]),
         (1, "parquet index", [rng.gauss(0, 1) for _ in range(8)])],
        "query_id int, query string, query_vec array<double>",
    )
    got = sorted(
        (r.query_id, r.doc_id, round(r.rrf_score, 12), r.rank)
        for r in hybrid_topk(index, emb, queries, k=5).collect()
    )
    lex = bm25_topk(index, queries, k=10).select("query_id", "doc_id", "rank")
    den = cosine_topk(emb, queries, k=10, id_col="doc_id").select(
        "query_id", "doc_id", F.col("rnk").alias("rank")
    )
    want = sorted(
        (r.query_id, r.doc_id, round(r.rrf_score, 12), r.rank)
        for r in rrf_fuse([lex, den], k=5).collect()
    )
    assert got == want
    assert len({q for q, *_ in got}) == 2


def test_rrf_param_validation(spark):
    from ferramenta_etl_spark.operators.retrieval import rrf_fuse

    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([], k=5)
    df = spark.createDataFrame([(0, 1, 1)], "query_id int, doc_id int, rank int")
    with pytest.raises(ValueError, match="rrf_k"):
        rrf_fuse([df], rrf_k=0)


def test_load_bm25_index_fails_loudly_on_foreign_dir(spark, tmp_path):
    from ferramenta_etl_spark.operators.retrieval import load_bm25_index

    with pytest.raises(Exception):  # absent artifact
        load_bm25_index(spark, str(tmp_path / "nope"))
    # present-but-foreign meta: the format marker rejects it
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "_bm25_meta.json").write_text('{"format": "something_else"}')
    with pytest.raises(ValueError, match="bm25_index"):
        load_bm25_index(spark, str(bad))


# ------------------------------------------------------- incremental append


def _serve_sorted(spark, path, qdf, k=7):
    from ferramenta_etl_spark.operators.retrieval import (
        bm25_topk_on_index,
        load_bm25_index,
    )

    disk = load_bm25_index(spark, path)
    return sorted(
        (r.query_id, r.doc_id, round(r.score, 9), r.rank)
        for r in bm25_topk_on_index(disk, qdf, k=k).collect()
    )


def test_append_equals_rebuild(spark, corpus, tmp_path):
    """Index half the corpus, append the other half: serving must be
    IDENTICAL to an index built over everything at once (N, avgdl, df,
    idf all refreshed), and a rerun of the same append adds zero."""
    from ferramenta_etl_spark.operators.retrieval import (
        append_to_bm25_index,
        build_bm25_index,
        load_bm25_index,
        save_bm25_index,
    )

    items = sorted(corpus.items())
    first = spark.createDataFrame(items[:30], "doc_id int, text string")
    rest = spark.createDataFrame(items[30:], "doc_id int, text string")
    everything = spark.createDataFrame(items, "doc_id int, text string")

    inc_path, full_path = str(tmp_path / "inc"), str(tmp_path / "full")
    save_bm25_index(build_bm25_index(first), inc_path, n_buckets=8)
    assert append_to_bm25_index(spark, inc_path, rest) == len(items) - 30
    save_bm25_index(build_bm25_index(everything), full_path, n_buckets=8)

    d_inc, d_full = (
        load_bm25_index(spark, inc_path),
        load_bm25_index(spark, full_path),
    )
    assert d_inc.n_docs == d_full.n_docs == len(items)
    assert d_inc.avgdl == pytest.approx(d_full.avgdl)
    assert d_inc.version == 1

    qdf = spark.createDataFrame(QUERIES, "query_id int, query string")
    assert _serve_sorted(spark, inc_path, qdf) == _serve_sorted(
        spark, full_path, qdf
    )
    # rerun: first-writer-wins by doc id, nothing changes
    assert append_to_bm25_index(spark, inc_path, rest) == 0
    assert load_bm25_index(spark, inc_path).n_docs == len(items)
    assert _serve_sorted(spark, inc_path, qdf) == _serve_sorted(
        spark, full_path, qdf
    )


def test_append_crash_is_invisible_and_replay_heals(spark, corpus, tmp_path):
    """A crash AFTER the delta write but BEFORE the meta flip leaves
    the committed index byte-identical (the uncommitted delta is never
    served), and replaying the append overwrites the dead delta and
    commits cleanly."""
    import json
    import os

    from ferramenta_etl_spark.operators.retrieval import (
        _BUCKET,
        _doc_terms,
        append_to_bm25_index,
        build_bm25_index,
        save_bm25_index,
    )

    items = sorted(corpus.items())
    first = spark.createDataFrame(items[:30], "doc_id int, text string")
    rest = spark.createDataFrame(items[30:], "doc_id int, text string")
    path = str(tmp_path / "crash")
    save_bm25_index(build_bm25_index(first), path, n_buckets=8)
    qdf = spark.createDataFrame(QUERIES, "query_id int, query string")
    before = _serve_sorted(spark, path, qdf)

    # simulate the crashed append: the delta dir landed, meta did not
    terms = _doc_terms(rest, "text", "doc_id")
    tf = terms.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    (
        tf.join(dl, "doc_id")
        .select("term", "doc_id", "tf", "dl")
        .withColumn("term_bucket", _BUCKET(8))
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(f"{path}/postings/d1")
    )
    meta = json.loads(open(os.path.join(path, "_bm25_meta.json")).read())
    assert meta["version"] == 0  # the crash: meta never flipped
    # the dead delta is INVISIBLE: serving is unchanged
    assert _serve_sorted(spark, path, qdf) == before

    # replay: overwrites the dead delta and commits
    assert append_to_bm25_index(spark, path, rest) == len(items) - 30
    full_path = str(tmp_path / "full2")
    save_bm25_index(
        build_bm25_index(
            spark.createDataFrame(items, "doc_id int, text string")
        ),
        full_path,
        n_buckets=8,
    )
    assert _serve_sorted(spark, path, qdf) == _serve_sorted(
        spark, full_path, qdf
    )


def test_crashed_batch_never_pollutes_a_different_next_batch(
    spark, corpus, tmp_path
):
    """Crash batch A mid-append, then append a DIFFERENT batch B: A's
    dead delta is overwritten by B's — the committed index is exactly
    first ∪ B (A is fully absent: unserved AND unaccounted), and a
    later replay of A indexes it completely."""
    import json
    import os

    from ferramenta_etl_spark.operators.retrieval import (
        _BUCKET,
        _doc_terms,
        append_to_bm25_index,
        build_bm25_index,
        load_bm25_index,
        save_bm25_index,
    )

    items = sorted(corpus.items())
    first = spark.createDataFrame(items[:30], "doc_id int, text string")
    batch_a = spark.createDataFrame(items[30:45], "doc_id int, text string")
    batch_b = spark.createDataFrame(items[45:], "doc_id int, text string")
    path = str(tmp_path / "orph")
    save_bm25_index(build_bm25_index(first), path, n_buckets=8)

    # crash batch A: the delta lands, accounting never runs
    terms = _doc_terms(batch_a, "text", "doc_id")
    tf = terms.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    (
        tf.join(dl, "doc_id")
        .select("term", "doc_id", "tf", "dl")
        .withColumn("term_bucket", _BUCKET(8))
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(f"{path}/postings/d1")
    )
    assert json.loads(
        open(os.path.join(path, "_bm25_meta.json")).read()
    )["version"] == 0

    # append batch B: overwrites A's dead delta; index == first ∪ B
    assert append_to_bm25_index(spark, path, batch_b) == len(items) - 45
    mid_path = str(tmp_path / "orph_mid")
    save_bm25_index(
        build_bm25_index(first.unionByName(batch_b)), mid_path, n_buckets=8
    )
    qdf = spark.createDataFrame(QUERIES, "query_id int, query string")
    assert load_bm25_index(spark, path).n_docs == 30 + (len(items) - 45)
    assert _serve_sorted(spark, path, qdf) == _serve_sorted(
        spark, mid_path, qdf
    )

    # replaying A later indexes it fully
    assert append_to_bm25_index(spark, path, batch_a) == 15
    full_path = str(tmp_path / "orph_full")
    save_bm25_index(
        build_bm25_index(
            spark.createDataFrame(items, "doc_id int, text string")
        ),
        full_path,
        n_buckets=8,
    )
    assert _serve_sorted(spark, path, qdf) == _serve_sorted(
        spark, full_path, qdf
    )


def test_append_counts_empty_docs(spark, tmp_path):
    from ferramenta_etl_spark.operators.retrieval import (
        append_to_bm25_index,
        build_bm25_index,
        load_bm25_index,
        save_bm25_index,
    )

    base = spark.createDataFrame([(0, "a b"), (1, "b c")], "doc_id int, text string")
    path = str(tmp_path / "emp")
    save_bm25_index(build_bm25_index(base), path, n_buckets=4)
    batch = spark.createDataFrame([(2, ""), (3, "c d")], "doc_id int, text string")
    assert append_to_bm25_index(spark, path, batch) == 2
    disk = load_bm25_index(spark, path)
    assert disk.n_docs == 4  # the empty doc counts toward N
    assert disk.total_tokens == 6
    assert disk.avgdl == pytest.approx(6 / 4)
    # re-appending the same batch (incl. the empty doc) adds zero
    assert append_to_bm25_index(spark, path, batch) == 0
    assert load_bm25_index(spark, path).n_docs == 4


def test_load_rejects_stale_layout(spark, tmp_path):
    from ferramenta_etl_spark.operators.retrieval import load_bm25_index

    old = tmp_path / "v1idx"
    old.mkdir()
    (old / "_bm25_meta.json").write_text(
        '{"format": "bm25_index", "n_docs": 3, "avgdl": 2.0, "n_buckets": 8}'
    )
    with pytest.raises(ValueError, match="layout"):
        load_bm25_index(spark, str(old))


def test_append_prunes_superseded_versions_with_grace(spark, corpus, tmp_path):
    """One superseded version survives each append (the grace window
    for a handle loaded just before the flip); older ones are deleted.
    All postings deltas stay — they are all live."""
    import os

    from ferramenta_etl_spark.operators.retrieval import (
        append_to_bm25_index,
        build_bm25_index,
        load_bm25_index,
        save_bm25_index,
    )

    items = sorted(corpus.items())
    path = str(tmp_path / "prune")
    save_bm25_index(
        build_bm25_index(
            spark.createDataFrame(items[:30], "doc_id int, text string")
        ),
        path,
        n_buckets=8,
    )
    handle_v0 = load_bm25_index(spark, path)
    append_to_bm25_index(
        spark, path,
        spark.createDataFrame(items[30:45], "doc_id int, text string"),
    )
    assert sorted(os.listdir(f"{path}/df")) == ["v0", "v1"]  # grace
    # the pre-append handle still serves inside the grace window
    qdf = spark.createDataFrame(QUERIES, "query_id int, query string")
    from ferramenta_etl_spark.operators.retrieval import bm25_topk_on_index

    assert bm25_topk_on_index(handle_v0, qdf, k=3).count() >= 0
    append_to_bm25_index(
        spark, path,
        spark.createDataFrame(items[45:], "doc_id int, text string"),
    )
    assert sorted(os.listdir(f"{path}/df")) == ["v1", "v2"]
    assert sorted(os.listdir(f"{path}/doc_stats")) == ["v1", "v2"]
    assert sorted(os.listdir(f"{path}/postings")) == ["d0", "d1", "d2"]


def test_compact_serves_identically_and_appends_continue(
    spark, corpus, tmp_path
):
    """Compacting a two-append history into one delta must serve
    bit-identically, carry exact statistics, and accept further
    appends; the source index is untouched."""
    import os

    from ferramenta_etl_spark.operators.retrieval import (
        append_to_bm25_index,
        build_bm25_index,
        compact_bm25_index,
        load_bm25_index,
        save_bm25_index,
    )

    items = sorted(corpus.items())
    src = str(tmp_path / "src")
    save_bm25_index(
        build_bm25_index(
            spark.createDataFrame(items[:30], "doc_id int, text string")
        ),
        src,
        n_buckets=8,
    )
    append_to_bm25_index(
        spark, src, spark.createDataFrame(items[30:45], "doc_id int, text string")
    )
    append_to_bm25_index(
        spark, src, spark.createDataFrame(items[45:55], "doc_id int, text string")
    )
    dest = str(tmp_path / "dest")
    assert compact_bm25_index(spark, src, dest) == 3  # d0+d1+d2 merged
    assert sorted(os.listdir(f"{dest}/postings")) == ["d0"]
    d_src, d_dest = load_bm25_index(spark, src), load_bm25_index(spark, dest)
    assert (d_dest.n_docs, d_dest.total_tokens, d_dest.version) == (
        d_src.n_docs, d_src.total_tokens, 0,
    )
    qdf = spark.createDataFrame(QUERIES, "query_id int, query string")
    assert _serve_sorted(spark, dest, qdf) == _serve_sorted(spark, src, qdf)
    # the compacted index keeps appending
    assert append_to_bm25_index(
        spark, dest, spark.createDataFrame(items[55:], "doc_id int, text string")
    ) == len(items) - 55
    full = str(tmp_path / "full")
    save_bm25_index(
        build_bm25_index(
            spark.createDataFrame(items, "doc_id int, text string")
        ),
        full,
        n_buckets=8,
    )
    assert _serve_sorted(spark, dest, qdf) == _serve_sorted(spark, full, qdf)
    with pytest.raises(ValueError, match="distinct dest"):
        compact_bm25_index(spark, dest, dest)


# -------------------------------------------------------------- mmr rerank


def py_mmr(rows, vecs, k, lam):
    """Reference MMR over one query's candidates. rows: [(doc, rel)]
    sorted any order; vecs: {doc: normalized np vector or None}."""
    import numpy as np

    rows = sorted(rows, key=lambda x: (-x[1], x[0]))
    rel = np.array([r for _, r in rows], dtype=float)
    span = rel.max() - rel.min()
    nrel = (rel - rel.min()) / span if span > 0 else np.ones_like(rel)
    ids = [d for d, _ in rows]
    max_sim = np.zeros(len(rows))
    remaining = list(range(len(rows)))
    picked, scores = [], []
    while remaining and len(picked) < k:
        best_i, best_v = None, None
        for i in remaining:
            v = lam * nrel[i] - (1 - lam) * max_sim[i]
            if best_v is None or v > best_v:
                best_i, best_v = i, v
        picked.append(ids[best_i])
        scores.append(best_v)
        remaining.remove(best_i)
        bv = vecs.get(ids[best_i])
        if bv is not None:
            for i in remaining:
                ov = vecs.get(ids[i])
                if ov is not None:
                    s = float(bv @ ov)
                    if s > max_sim[i]:
                        max_sim[i] = s
    return picked, scores


def test_mmr_matches_python_and_diversifies(spark):
    import random

    import numpy as np

    from ferramenta_etl_spark.operators.retrieval import mmr_rerank

    rng = random.Random(9)
    # 3 clusters of near-identical vectors; relevance slightly favors
    # cluster 0 — plain top-k would take all of cluster 0, MMR must mix
    centers = [np.array([1.0, 0, 0]), np.array([0, 1.0, 0]), np.array([0, 0, 1.0])]
    cand_rows, vec_rows, vecs = [], [], {}
    i = 0
    for c in range(3):
        for j in range(4):
            rel = 10 - c - 0.1 * j
            v = centers[c] + np.array([rng.gauss(0, 0.01) for _ in range(3)])
            v = v / np.linalg.norm(v)
            cand_rows.append((0, i, rel))
            vec_rows.append((i, v.tolist()))
            vecs[i] = v
            i += 1
    cand_rows.append((0, 99, 5.0))  # candidate with NO embedding
    cands = spark.createDataFrame(
        cand_rows, "query_id int, doc_id int, score double"
    )
    emb = spark.createDataFrame(vec_rows, "doc_id int, embedding array<double>")

    got = sorted(
        mmr_rerank(cands, emb, k=6, lam=0.5).collect(), key=lambda r: r.rank
    )
    want_ids, want_scores = py_mmr(
        [(d, r) for _, d, r in cand_rows], vecs, 6, 0.5
    )
    assert [r.doc_id for r in got] == want_ids
    for r, s in zip(got, want_scores):
        assert r.mmr_score == pytest.approx(s, abs=1e-9)
    # diversification: the 6 picks cover all 3 clusters (plain top-6
    # by relevance would be clusters 0 and 1 only)
    clusters_hit = {d // 4 for d in want_ids if d < 12}
    assert clusters_hit == {0, 1, 2}
    # lam=1 degrades to plain relevance order
    plain = sorted(
        mmr_rerank(cands, emb, k=6, lam=1.0).collect(), key=lambda r: r.rank
    )
    by_rel = sorted(cand_rows, key=lambda x: (-x[2], x[1]))[:6]
    assert [r.doc_id for r in plain] == [d for _, d, _ in by_rel]
    # param validation
    with pytest.raises(ValueError, match="lam"):
        mmr_rerank(cands, emb, lam=1.5)


def test_mmr_drops_null_and_nan_scores(spark):
    """ADVICE r09: a NULL/NaN relevance among candidates must be
    dropped, not allowed to poison the per-query min-max normalization
    (NaN span collapses normalized relevance to all-ones). The
    remaining candidates' ordering must equal the same call without
    the poisoned rows."""
    from ferramenta_etl_spark.operators.retrieval import mmr_rerank

    clean_rows = [(0, 1, 9.0), (0, 2, 5.0), (0, 3, 1.0)]
    poisoned = clean_rows + [(0, 50, None), (0, 51, float("nan"))]
    emb = spark.createDataFrame(
        [(i, [1.0 * i, 1.0, 0.0]) for i in (1, 2, 3, 50, 51)],
        "doc_id int, embedding array<double>",
    )
    mk = lambda rows: spark.createDataFrame(
        rows, "query_id int, doc_id int, score double"
    )
    got = sorted(
        mmr_rerank(mk(poisoned), emb, k=5, lam=0.7).collect(),
        key=lambda r: r.rank,
    )
    want = sorted(
        mmr_rerank(mk(clean_rows), emb, k=5, lam=0.7).collect(),
        key=lambda r: r.rank,
    )
    assert [r.doc_id for r in got] == [r.doc_id for r in want]
    assert {r.doc_id for r in got}.isdisjoint({50, 51})
    for g, w in zip(got, want):
        assert g.mmr_score == pytest.approx(w.mmr_score, abs=1e-12)


def test_save_crash_mid_rebuild_leaves_dir_invalid_not_corrupt(
    spark, corpus, index, tmp_path
):
    """ADVICE r09: save_bm25_index over an existing index deletes the
    stale meta BEFORE touching data dirs, so a crash mid-rebuild
    leaves a dir that load_bm25_index rejects LOUDLY (no meta) rather
    than a meta pointing at missing deltas. Simulated by interrupting
    after the meta delete + postings delete."""
    import os

    from ferramenta_etl_spark.sinks.layout import _fs_and_path

    path = str(tmp_path / "bm25_crash")
    save_bm25_index(index, path)
    assert load_bm25_index(spark, path).n_docs == index.n_docs

    # simulate the new ordering's crash window: meta gone first, then
    # a data dir gone — the exact on-disk state after a crash between
    # the initial deletes and the rewrite
    for rel, recursive in (("_bm25_meta.json", False), ("postings", True)):
        _jvm, fs, pth = _fs_and_path(spark, os.path.join(path, rel))
        assert fs.exists(pth)
        fs.delete(pth, recursive)
    with pytest.raises(Exception):  # meta gone -> loud "not an index"
        load_bm25_index(spark, path)

    # a retried save over the crashed dir fully recovers
    save_bm25_index(index, path)
    reloaded = load_bm25_index(spark, path)
    assert reloaded.n_docs == index.n_docs


def test_bm25_scores_stable_fold(spark, corpus, index):
    """bm25_scores: plain-sum and order-stable-fold variants agree to
    the rounding budget, the fold matches the Python reference, and
    the folded score is a pure function of the data — identical across
    repartitionings (the property the oracle gate needs; a plain sum's
    last ulp is shuffle-order-dependent)."""
    from ferramenta_etl_spark.operators.retrieval import bm25_scores

    qdf = spark.createDataFrame(
        [(0, "spark shuffle fast"), (1, "the the corpus")],
        "query_id int, query string",
    )
    plain = {
        (r.query_id, r.doc_id): r.score
        for r in bm25_scores(index, qdf).collect()
    }
    folded = {
        (r.query_id, r.doc_id): r.score
        for r in bm25_scores(index, qdf, stable_round=6).collect()
    }
    assert set(plain) == set(folded) and len(folded) > 0
    for k, v in plain.items():
        assert abs(v - folded[k]) <= 5e-7, k
    for qid, query in [(0, "spark shuffle fast"), (1, "the the corpus")]:
        want = py_bm25_scores(corpus, query)
        got = {d: s for (q, d), s in folded.items() if q == qid}
        assert set(got) == {d for d, s in want.items()}
        for d, s in want.items():
            assert abs(got[d] - s) <= 5e-7, (qid, d)
    # partitioning invariance of the folded value, bit-for-bit
    re_idx = index._replace(postings=index.postings.repartition(13))
    refolded = {
        (r.query_id, r.doc_id): r.score
        for r in bm25_scores(re_idx, qdf, stable_round=6).collect()
    }
    assert refolded == folded
