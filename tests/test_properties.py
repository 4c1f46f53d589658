"""Property-based differential tests (hypothesis): each Spark operator
is checked against an independent pure-Python reference implementation
on randomized inputs — the cases hand-picked fixtures miss (empty docs,
all-duplicate tokens, ties on every column).

Example counts are kept small: every example pays a Spark job; the
value here is input diversity, not volume.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# small alphabet on purpose: forces token collisions, runs, and shared
# n-grams that a wide alphabet would never generate
_token = st.sampled_from(["a", "b", "c", "dd", "e1"])
_doc = st.lists(_token, min_size=0, max_size=12).map(" ".join)


def _py_ngrams(text: str, n: int) -> list[str]:
    toks = text.lower().split(" ")
    if len(toks) < n:
        return []
    seen: dict[str, None] = {}
    for i in range(len(toks) - n + 1):
        seen.setdefault(" ".join(toks[i : i + n]), None)
    return list(seen)


@given(docs=st.lists(_doc, min_size=1, max_size=6), n=st.integers(2, 4))
@settings(**SETTINGS)
def test_word_ngrams_matches_python(spark, docs, n):
    from ferramenta_etl_spark.operators.text import word_ngrams

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r.doc_id: list(r.g)
        for r in df.select("doc_id", word_ngrams(F.col("text"), n).alias("g")).collect()
    }
    want = {i: _py_ngrams(d, n) for i, d in enumerate(docs)}
    assert got == want


def _py_max_run(toks: list[str]) -> int:
    best = run = 0
    prev = object()
    for t in toks:
        run = run + 1 if t == prev else 1
        best = max(best, run)
        prev = t
    return best


@given(doc=_doc.filter(lambda d: d != ""))
@settings(**SETTINGS)
def test_max_token_run_matches_python(spark, doc):
    from ferramenta_etl_spark.operators.text import max_token_run

    df = spark.createDataFrame([(doc,)], "text string")
    got = df.select(max_token_run(F.col("text")).alias("r")).first().r
    assert got == _py_max_run(doc.lower().split(" "))


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 5), st.integers(0, 5)),
        min_size=1,
        max_size=20,
    )
)
@settings(**SETTINGS)
def test_latest_per_key_matches_python(spark, rows):
    """latest_per_key == Python max-by over (order, tiebreak) per key —
    including duplicate (key, order) rows, where the tiebreak decides."""
    from ferramenta_etl_spark.operators.dedup import latest_per_key

    df = spark.createDataFrame(rows, "k int, o int, t int")
    got = {
        (r.k, r.o, r.t)
        for r in latest_per_key(
            df, keys=["k"], order_by=[F.col("o").desc()], tiebreak=[F.col("t").desc()]
        ).collect()
    }
    want = {}
    for k, o, t in rows:
        if k not in want or (o, t) > (want[k][1], want[k][2]):
            want[k] = (k, o, t)
    assert got == set(want.values())

    # the sort-free agg strategy picks the identical rows when the
    # caller's ascending struct encodes the same total order (numeric
    # DESC fields negated)
    got_agg = {
        (r.k, r.o, r.t)
        for r in latest_per_key(
            df,
            keys=["k"],
            order_by=[F.col("o").desc()],
            tiebreak=[F.col("t").desc()],
            agg_order=F.struct((-F.col("o")).alias("a"), (-F.col("t")).alias("b")),
        ).collect()
    }
    assert got_agg == set(want.values())


@given(
    shared=st.lists(_token, min_size=6, max_size=8),
    pre_a=st.lists(_token, min_size=0, max_size=4),
    post_b=st.lists(_token, min_size=0, max_size=4),
)
@settings(**SETTINGS)
def test_winnowing_guarantee(spark, shared, pre_a, post_b):
    """The winnowing theorem: two docs sharing a token run of length >=
    window + k - 1 (here 4 + 3 - 1 = 6) share at least one fingerprint,
    regardless of what surrounds the run."""
    from ferramenta_etl_spark.operators.text import winnowing_fingerprints

    doc_a = " ".join(pre_a + shared)
    doc_b = " ".join(shared + post_b)
    df = spark.createDataFrame([(1, doc_a), (2, doc_b)], "doc_id long, text string")
    fps = {
        r.doc_id: set(r.fp)
        for r in df.select(
            "doc_id", winnowing_fingerprints(F.col("text"), k=3, window=4).alias("fp")
        ).collect()
    }
    assert fps[1] & fps[2], (doc_a, doc_b)


@given(
    n_tokens=st.integers(1, 60),
    chunk=st.integers(2, 20),
    ov_frac=st.integers(0, 99),
)
@settings(**SETTINGS)
def test_chunking_coverage_property(spark, n_tokens, chunk, ov_frac):
    """For ANY (doc length, chunk size, overlap < chunk): chunks cover
    every token in order, consecutive chunks overlap by exactly the
    configured amount (except possibly the last), and no chunk exceeds
    chunk_tokens."""
    from ferramenta_etl_spark.operators.text import chunk_documents

    overlap = (chunk - 1) * ov_frac // 100  # guaranteed < chunk
    stride = chunk - overlap
    doc = " ".join(f"w{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect(),
        key=lambda r: r.chunk_idx,
    )
    toks = doc.split(" ")
    # each chunk is the expected slice
    for r in rows:
        start = r.chunk_idx * stride
        assert r.chunk_text.split(" ") == toks[start : start + chunk]
        assert 1 <= r.n_chunk_tokens <= chunk
    # full coverage, no gaps
    covered = set()
    for r in rows:
        covered.update(r.chunk_text.split(" "))
    assert covered == set(toks)
    # chunk count formula
    import math

    want = 1 + math.ceil(max(n_tokens - chunk, 0) / stride)
    assert len(rows) == want


_prose_word = st.sampled_from(["alpha", "bravo", "x", "year", "1999", "v2"])


@given(words=st.lists(_prose_word, min_size=1, max_size=12))
@settings(**SETTINGS)
def test_redact_pii_leaves_prose_alone(spark, words):
    """Prose made of plain words, short numbers, and alphanumerics is
    NEVER altered by PII redaction — the precision guarantee."""
    from ferramenta_etl_spark.operators.text import redact_pii

    doc = " ".join(words)
    df = spark.createDataFrame([(doc,)], "text string")
    got = df.select(redact_pii(F.col("text")).alias("t")).first().t
    assert got == doc


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=50), min_size=1, max_size=60),
    budget=st.integers(min_value=8, max_value=64),
)
@settings(**SETTINGS)
def test_pack_sequences_invariants(spark, sizes, budget):
    """Packing invariants on random chunk-size streams: every chunk
    lands in exactly one sequence; a sequence over budget contains
    exactly one (oversize) chunk; within a shard the greedy fill is
    maximal (a sequence closes only because the next chunk would not
    fit)."""
    from ferramenta_etl_spark.operators.packing import pack_sequences

    rows = [(i, 0, int(s)) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id long, chunk_idx int, n_chunk_tokens long")
    out = pack_sequences(df, budget_tokens=budget, n_shards=4).collect()
    assert len(out) == len(sizes)
    assert len({(r.doc_id, r.chunk_idx) for r in out}) == len(sizes)
    by_seq = {}
    for r in out:
        by_seq.setdefault(r.seq_id, []).append(r)
    for members in by_seq.values():
        tot = sum(m.n_chunk_tokens for m in members)
        assert all(m.seq_tokens == tot for m in members)
        if tot > budget:
            assert len(members) == 1  # only a single oversize chunk may exceed
    # greedy maximality within each shard: a sequence closes only
    # because the next chunk would not fit
    by_shard = {}
    for r in sorted(out, key=lambda r: r.doc_id):
        by_shard.setdefault(r.seq_id >> 40, []).append(r)
    for members in by_shard.values():
        ordered = sorted(members, key=lambda r: (r.doc_id, r.chunk_idx))
        i = 0
        while i < len(ordered):
            sid = ordered[i].seq_id
            tot = ordered[i].seq_tokens
            j = i
            while j < len(ordered) and ordered[j].seq_id == sid:
                j += 1
            if j < len(ordered):
                assert tot + ordered[j].n_chunk_tokens > budget, (
                    "sequence closed although the next chunk fit"
                )
            i = j


# longer docs than _doc so shingle-based near-dups actually occur: a
# doc is 6-14 tokens over a 4-token vocabulary, giving frequent genuine
# high-Jaccard pairs AND sub-shingle docs (the silent-loss regression)
_nd_doc = st.lists(
    st.sampled_from(["x", "y", "z", "w"]), min_size=0, max_size=14
).map(" ".join)


@given(
    docs=st.lists(_nd_doc, min_size=1, max_size=10),
    split=st.integers(0, 10),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_incremental_dedup_invariants_vs_all_corpus_pairs(
    spark, tmp_path_factory, docs, split
):
    """Differential invariants of two-batch incremental admission
    against the all-corpus LSH pair relation (the same hash family, so
    pair detection is identical):

    1. exhaustive partition — every doc is admitted or dropped, never
       both, never lost (this run of the test found the sub-shingle
       silent-loss bug and the empty-partitioned-bootstrap sink bug);
    2. the admitted set is an independent set of the pair graph — no
       detected near-dup pair survives with BOTH endpoints admitted;
    3. every dropped doc has a witness — it appears in at least one
       detected pair (docs nothing pairs with are never dropped).

    Deliberately NOT asserted: admitted == all-corpus keep-canonical.
    That equality is not a theorem — incremental admission never
    revokes, so when a later batch's doc B bridges two clusters that
    were EACH already admitted (A alone in batch 1, C alone in batch 2,
    A!~C; then B with A~B, B~C), connected components would merge them
    and drop C while the incremental pass keeps both A and C (and drops
    B). Both outputs satisfy the invariants above; the batch pipeline
    is simply more aggressive on late-discovered merges. (Chain
    components split across batches in topological order DO now agree:
    dropped docs' signatures are indexed as bridge rows — the layout-2
    replay-determinism fix.)"""
    from ferramenta_etl_spark.operators import dedup as D
    from ferramenta_etl_spark.pipeline.dedup_index import dedup_incremental

    split = min(split, len(docs))
    rows = [(i, t) for i, t in enumerate(docs)]
    all_df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.doc_id_a, r.doc_id_b)
        for r in D.minhash_lsh_pairs(all_df, threshold=0.5).collect()
    }

    idx = str(tmp_path_factory.mktemp("nd_idx") / "index")
    admitted = set()
    for batch_rows in (rows[:split], rows[split:]):
        if not batch_rows:
            continue
        bdf = spark.createDataFrame(batch_rows, "doc_id long, text string")
        out = dedup_incremental(spark, bdf, idx, threshold=0.5)
        admitted |= {r.doc_id for r in out.select("doc_id").collect()}

    everyone = {i for i, _ in rows}
    dropped = everyone - admitted
    assert admitted <= everyone  # nothing invented
    paired = {d for p in pairs for d in p}
    assert dropped <= paired  # 3: every drop has a witness pair
    both_admitted = {p for p in pairs if p[0] in admitted and p[1] in admitted}
    assert not both_admitted  # 2: admitted is an independent set


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),
            st.one_of(st.none(), st.integers(0, 5)),
            st.integers(0, 5),
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(**SETTINGS)
def test_latest_per_key_agg_sentinel_handles_nullable_desc(spark, rows):
    """The documented workaround for the NULL-placement trap
    (operators/dedup.latest_per_key): a nullable DESC ordering column
    must be encoded with a coalesce sentinel in the agg path, because a
    bare negated field would be NULLS FIRST (NULL wins min_by) while
    the window's desc() is NULLS LAST (NULL loses). With the sentinel,
    agg == window == the Python model on tie-heavy nullable inputs."""
    from ferramenta_etl_spark.operators.dedup import latest_per_key

    df = spark.createDataFrame(rows, "k int, o int, t int")
    sentinel = (1 << 62)  # larger than any -o, so NULL o always loses
    got_agg = {
        (r.k, r.o, r.t)
        for r in latest_per_key(
            df,
            keys=["k"],
            order_by=[F.col("o").desc()],  # desc == desc_nulls_last
            tiebreak=[F.col("t").desc()],
            agg_order=F.struct(
                F.coalesce(-F.col("o"), F.lit(sentinel)).alias("a"),
                (-F.col("t")).alias("b"),
            ),
        ).collect()
    }
    got_win = {
        (r.k, r.o, r.t)
        for r in latest_per_key(
            df, keys=["k"], order_by=[F.col("o").desc()], tiebreak=[F.col("t").desc()]
        ).collect()
    }
    want = {}
    for k, o, t in rows:
        cur = want.get(k)
        # desc_nulls_last: any non-null o beats null o; ties on o fall
        # to t desc
        key = ((o is not None, o if o is not None else -1, t))
        if cur is None or key > cur[0]:
            want[k] = (key, (k, o, t))
    expect = {v for _, v in want.values()}
    assert got_win == expect
    assert got_agg == expect


@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(0, 2)),
            st.one_of(st.none(), st.integers(-50, 50)),
        ),
        min_size=1,
        max_size=25,
    ).filter(lambda rs: any(v is not None for _, v in rs)),
    q100=st.integers(0, 100),
)
@settings(**SETTINGS)
def test_grouped_exact_quantile_matches_quantile_cont(spark, rows, q100):
    """The histogram-based quantile (operators/quantile.py) equals
    a bit-exact Python quantile_cont reference — ``lo + (hi-lo)*frac``
    on 0-based pos=(n-1)*q — on random groups, fractions, null group
    keys, and null values.

    Deliberately NOT compared against Spark's ``percentile`` aggregate:
    writing this test surfaced that Spark interpolates in the
    weighted-average form ``(1-frac)*lo + frac*hi``, which differs from
    quantile_cont's ``lo + (hi-lo)*frac`` by float ulps on some
    fractions (falsifying example: values [0,35,44,44], q=0.35 ->
    35.45 vs 35.449999999999996). DuckDB's quantile_cont uses the
    lo+delta form — one more reason exact_stats now goes through this
    operator instead of ``percentile``: its interpolation is the
    oracle's, bit for bit."""
    import math

    from ferramenta_etl_spark.operators.quantile import grouped_exact_quantile

    q = q100 / 100.0
    df = spark.createDataFrame(
        [(g, float(v) if v is not None else None) for g, v in rows],
        "g int, v double",
    )
    got = {
        r.g: r.q
        for r in grouped_exact_quantile(df, ["g"], "v", q, "q").collect()
    }
    groups: dict = {}
    for g, v in rows:
        if v is not None:
            groups.setdefault(g, []).append(float(v))
    want = {}
    for g, vs in groups.items():
        vs.sort()
        pos = (len(vs) - 1) * q
        lo = math.floor(pos)
        hi = min(lo + 1, len(vs) - 1)
        want[g] = vs[lo] + (vs[hi] - vs[lo]) * (pos - lo)
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(0, 2)),
            st.one_of(st.none(), st.integers(-20, 20)),
            st.one_of(st.none(), st.integers(0, 40)),
        ),
        min_size=1,
        max_size=20,
    ),
    qa=st.integers(0, 100),
    qb=st.integers(0, 100),
)
@settings(**SETTINGS)
def test_grouped_exact_quantiles_matches_per_spec_calls(spark, rows, qa, qb):
    """The single-scan stacked variant == two independent single-spec
    calls, per spec, on random groups/fractions/nulls (modulo the
    documented difference: the stacked variant emits a NULL cell where
    the single-spec call drops the group entirely)."""
    from ferramenta_etl_spark.operators.quantile import (
        grouped_exact_quantile,
        grouped_exact_quantiles,
    )

    df = spark.createDataFrame(
        [
            (g, float(a) if a is not None else None, float(b) if b is not None else None)
            for g, a, b in rows
        ],
        "g int, a double, b double",
    )
    stacked = {
        r.g: (r.qa, r.qb)
        for r in grouped_exact_quantiles(
            df, ["g"], [("a", qa / 100.0, "qa"), ("b", qb / 100.0, "qb")]
        ).collect()
    }
    for col, q, idx in (("a", qa / 100.0, 0), ("b", qb / 100.0, 1)):
        single = {
            r.g: r.q
            for r in grouped_exact_quantile(df, ["g"], col, q, "q").collect()
        }
        from_stacked = {g: v[idx] for g, v in stacked.items() if v[idx] is not None}
        assert from_stacked == single


@given(
    docs=st.lists(_doc, min_size=1, max_size=10),
    t100=st.integers(1, 100),
    langs=st.lists(st.sampled_from(["en", "pt"]), min_size=10, max_size=10),
)
@settings(**SETTINGS)
def test_tokenset_prefix_filter_matches_blocked(spark, docs, t100, langs):
    """Prefix-filter candidate generation (the 100x scale path) must be
    LOSSLESS: identical pair set + jaccard values as the blocked
    quadratic join, for any threshold>0, on corpora with token
    collisions, shared tokens across docs, and block boundaries."""
    from ferramenta_etl_spark.operators.dedup import tokenset_jaccard_pairs

    t = t100 / 100.0
    rows = [
        (i, d, langs[i], len(d)) for i, d in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, n_chars long")
    kw = dict(threshold=t, length_bucket=4)
    blocked = {
        (r.doc_id_a, r.doc_id_b, r.jaccard)
        for r in tokenset_jaccard_pairs(df, **kw).collect()
    }
    prefixed = {
        (r.doc_id_a, r.doc_id_b, r.jaccard)
        for r in tokenset_jaccard_pairs(df, prefix_filter=True, **kw).collect()
    }
    assert prefixed == blocked


@pytest.mark.parametrize(
    "t, n",
    [(0.14, 50), (0.28, 25), (0.28, 50), (0.56, 25), (0.56, 50)],
)
def test_tokenset_prefix_threshold_boundary_pairs(spark, t, n):
    """Double-rounding regression (ADVICE r5): at these (threshold, size)
    points float(t)*n lands JUST ABOVE the true integer product (e.g.
    0.14*50 = 7.000000000000001), a bare ceil overshoots by one, the
    prefix comes out one token too short, and a pair whose Jaccard sits
    EXACTLY at the threshold is emitted by the blocked path but dropped
    by prefix_filter=True. The tight adversarial pair: B ⊂ A with
    |B| = t·n shared tokens that sort LAST in global frequency order
    (freq 2 vs freq 1 for A-unique tokens), so the shared tokens occupy
    exactly A's suffix plus its final prefix slot — the one the
    overshoot cuts. hypothesis's <=10-token docs never reach this."""
    from ferramenta_etl_spark.operators.dedup import tokenset_jaccard_pairs

    s = round(t * n)  # the TRUE integer product t*n
    shared = [f"s{i:03d}" for i in range(s)]
    unique = [f"u{i:03d}" for i in range(n - s)]
    rows = [
        (1, " ".join(unique + shared), "en"),
        (2, " ".join(shared), "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    kw = dict(threshold=t, length_col=None)
    blocked = {
        (r.doc_id_a, r.doc_id_b, r.jaccard)
        for r in tokenset_jaccard_pairs(df, **kw).collect()
    }
    assert blocked == {(1, 2, round(t, 4))}  # J = s/n = t exactly
    prefixed = {
        (r.doc_id_a, r.doc_id_b, r.jaccard)
        for r in tokenset_jaccard_pairs(df, prefix_filter=True, **kw).collect()
    }
    assert prefixed == blocked


@given(
    num0=st.integers(1, 10**6 - 1),
    scale=st.integers(0, 6),
    inter=st.integers(0, 10**9),
    extra=st.integers(0, 10**9),
)
@settings(max_examples=300, deadline=None)
def test_threshold_rational_arithmetic_is_exact(num0, scale, inter, extra):
    """Pure-arithmetic pins for the exact Jaccard acceptance (no Spark).

    For ANY threshold written with <= 6 decimal digits and ANY
    (inter, union) pair up to 2e9 tokens:
      1. _threshold_rational recovers the intended decimal EXACTLY from
         the float (0.8 -> 4/5, never the float's 0.80000000000000004...);
      2. the shipped acceptance ``inter*den >= num*union`` agrees with
         true rational comparison Fraction(inter, union) >= t;
      3. the prefix-cut ceil ``(num*n + den - 1) div den`` equals the
         true ceil(t*n), so the acceptance and the prefix length can
         never disagree (the r5/r6 double-rounding class is impossible
         by construction, at any token-set size)."""
    from fractions import Fraction

    from ferramenta_etl_spark.operators.dedup import _threshold_rational

    den0 = 10**scale
    if num0 > den0:  # thresholds stay in (0, 1]
        num0 %= den0
        if num0 == 0:
            num0 = den0
    t = Fraction(num0, den0)
    num, den = _threshold_rational(num0 / den0)
    assert Fraction(num, den) == t  # (1) exact decimal recovery
    union = inter + extra
    if union > 0:
        assert (inter * den >= num * union) == (Fraction(inter, union) >= t)  # (2)
    n = union
    ceil_impl = (num * n + den - 1) // den
    assert ceil_impl == -((-num * n) // den)  # (3) true ceil(t*n)
    # products stay far inside int64 (den <= 1e6, n <= 2e9 -> <= ~2e15)
    assert num * n + den - 1 < 2**62


def test_tokenset_huge_union_exact_threshold_acceptance(spark):
    """Verify-filter rounding residual (VERDICT r06 #4): at unions of
    ~10^4+ tokens the 4-dp-ROUNDED jaccard stops distinguishing
    just-below-threshold from at-threshold — round(39999/50000, 4) is
    exactly 0.8 — so a ``round(J,4) >= t`` acceptance admitted pairs
    whose TRUE Jaccard is below t (outside the prefix candidate
    guarantee: the blocked-vs-prefix output-identical contract could
    break on huge docs). Acceptance is now exact integer arithmetic
    (``inter*den >= num*union``) in BOTH paths. Fixture: doc 1 holds
    50 000 tokens, doc 3 its first 40 000 (J = 0.8 exactly -> kept),
    doc 2 its first 39 999 (J(1,2) = 0.79998 < 0.8, though it ROUNDS to
    0.8000 -> must be dropped; J(2,3) = 39999/40000 -> kept)."""
    from ferramenta_etl_spark.operators.dedup import tokenset_jaccard_pairs

    toks = [f"t{i:05d}" for i in range(50_000)]
    rows = [
        (1, " ".join(toks), "en"),
        (2, " ".join(toks[:39_999]), "en"),
        (3, " ".join(toks[:40_000]), "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    kw = dict(threshold=0.8, length_col=None)
    expected = {(1, 3, 0.8), (2, 3, round(39_999 / 40_000, 4))}
    blocked = {
        (r.doc_id_a, r.doc_id_b, r.jaccard)
        for r in tokenset_jaccard_pairs(df, **kw).collect()
    }
    assert blocked == expected
    prefixed = {
        (r.doc_id_a, r.doc_id_b, r.jaccard)
        for r in tokenset_jaccard_pairs(df, prefix_filter=True, **kw).collect()
    }
    assert prefixed == expected


@given(docs=st.lists(_doc, min_size=1, max_size=6), mc=st.integers(1, 3))
@settings(**SETTINGS)
def test_token_vocab_matches_counter(spark, docs, mc):
    """token_vocab (ws) vs collections.Counter on randomized corpora:
    exact tf, exact df (HLL is exact at these cardinalities), min_count
    floor, and the (tf desc, token asc) total order."""
    from collections import Counter

    from ferramenta_etl_spark.operators.text import token_vocab

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    tf, dfreq = Counter(), Counter()
    for d in docs:
        toks = [t for t in d.lower().split(" ") if t != ""]
        tf.update(toks)
        dfreq.update(set(toks))
    want = sorted(
        ((t, n, dfreq[t]) for t, n in tf.items() if n >= mc),
        key=lambda r: (-r[1], r[0]),
    )
    got = [
        (r.token, r.tf, r.df_approx)
        for r in token_vocab(df, min_count=mc).collect()
    ]
    assert got == want


@given(
    groups=st.lists(
        st.lists(
            st.lists(
                st.floats(-8, 8, allow_nan=False, width=32),
                min_size=3,
                max_size=3,
            ),
            min_size=1,
            max_size=4,
        ),
        min_size=1,
        max_size=4,
    )
)
@settings(**SETTINGS)
def test_mean_pool_matches_numpy(spark, groups):
    """mean_pool_embeddings vs numpy per-group means on randomized
    ragged-free fixtures (dims fixed at 3; ragged groups are documented
    caller error)."""
    import numpy as np

    from ferramenta_etl_spark.operators.similarity import (
        mean_pool_embeddings,
    )

    rows = [
        (g, [float(x) for x in vec])
        for g, vecs in enumerate(groups)
        for vec in vecs
    ]
    df = spark.createDataFrame(rows, "doc_id long, embedding array<double>")
    got = {
        r.doc_id: np.array(r.embedding)
        for r in mean_pool_embeddings(df, ["doc_id"]).collect()
    }
    assert set(got) == set(range(len(groups)))
    for g, vecs in enumerate(groups):
        want = np.array(vecs, dtype=np.float64).mean(axis=0)
        assert np.abs(got[g] - want).max() < 1e-9


def _py_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@given(
    texts=st.lists(st.text(alphabet="abc", max_size=6), min_size=1, max_size=8),
    d=st.integers(1, 2),
    blocking=st.sampled_from(["qgram", "length"]),
)
@settings(**SETTINGS)
def test_edit_distance_pairs_matches_all_pairs(spark, texts, d, blocking):
    """Randomized short strings (narrow alphabet so near-misses and
    exact dups are common): the blocked operator returns EXACTLY the
    all-pairs python-DP answer — block boundaries lose nothing."""
    from ferramenta_etl_spark.operators.dedup import edit_distance_pairs

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    want = sorted(
        (a, b, _py_lev(texts[a], texts[b]))
        for a in range(len(texts))
        for b in range(a + 1, len(texts))
        if _py_lev(texts[a], texts[b]) <= d
    )
    got = sorted(
        (r.doc_id_a, r.doc_id_b, r.dist)
        for r in edit_distance_pairs(
            df, max_dist=d, blocking=blocking
        ).collect()
    )
    assert got == want


@given(
    pts=st.lists(st.integers(-50, 50), min_size=1, max_size=10),
    ivs=st.lists(
        st.tuples(st.integers(-50, 50), st.integers(0, 120)),
        min_size=1,
        max_size=8,
    ),
    bin_size=st.sampled_from([1.0, 3.0, 7.5]),
    cap=st.sampled_from([2, 4, 256]),
)
@settings(**SETTINGS)
def test_range_join_matches_all_pairs(spark, pts, ivs, bin_size, cap):
    """Randomized points/intervals across bin sizes and tail caps: the
    binned+tail union returns EXACTLY the all-pairs answer, each match
    once."""
    from ferramenta_etl_spark.operators.range_join import range_join

    pdf = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pts)], "pid long, p long"
    )
    idf = spark.createDataFrame(
        [(i, s, s + w) for i, (s, w) in enumerate(ivs)],
        "iid long, s long, e long",
    )
    got = sorted(
        (r.pid, r.iid)
        for r in range_join(
            pdf, idf, "p", "s", "e",
            bin_size=bin_size, max_bins_per_interval=cap,
        ).collect()
    )
    want = sorted(
        (pid, iid)
        for pid, p in enumerate(pts)
        for iid, (s, w) in enumerate(ivs)
        if s <= p <= s + w
    )
    assert got == want


@given(
    pts=st.lists(
        st.floats(-50, 50, allow_nan=False, allow_infinity=False),
        min_size=1, max_size=8,
    ),
    ivs=st.lists(
        st.tuples(
            st.floats(-50, 50, allow_nan=False, allow_infinity=False),
            st.floats(0, 30, allow_nan=False, allow_infinity=False),
        ),
        min_size=1, max_size=6,
    ),
    bin_size=st.sampled_from([0.5, 2.25, 7.0]),
)
@settings(**SETTINGS)
def test_range_join_float_domain(spark, pts, ivs, bin_size):
    """Float points/bounds (fractional bins, negative floors): binned
    result equals the all-pairs answer — the floor-division bin math
    holds off the integer lattice too."""
    from ferramenta_etl_spark.operators.range_join import range_join

    pdf = spark.createDataFrame(
        [(i, float(p)) for i, p in enumerate(pts)], "pid long, p double"
    )
    idf = spark.createDataFrame(
        [(i, float(s), float(s + w)) for i, (s, w) in enumerate(ivs)],
        "iid long, s double, e double",
    )
    got = sorted(
        (r.pid, r.iid)
        for r in range_join(
            pdf, idf, "p", "s", "e", bin_size=bin_size,
            max_bins_per_interval=8,
        ).collect()
    )
    want = sorted(
        (pid, iid)
        for pid, p in enumerate(pts)
        for iid, (s, w) in enumerate(ivs)
        if s <= p <= s + w
    )
    assert got == want
