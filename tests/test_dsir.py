"""DSIR importance resampling — differential oracle in pure Python.

The md5 hash family (dedup.portable_hash) is bit-reproducible outside
the JVM, so the reference below re-derives every bucket, count, ratio,
weight, and Gumbel key from scratch (hashlib + Counter + math) and the
Spark side must match to 1e-9."""

import hashlib
import math
import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from ferramenta_etl_spark.operators.dsir import (
    DSIRModel,
    dsir_log_weights,
    dsir_resample,
    fit_dsir,
    hashed_ngram_buckets,
)

# ---------------------------------------------------------------- reference


def py_grams(text, ns):
    toks = [t for t in text.lower().split(" ") if t != ""]
    out = []
    for n in ns:
        if n == 1:
            out.extend(toks)
        else:
            out.extend(
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            )
    return out


def py_bucket(gram, n_buckets):
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16) % n_buckets


def py_fit_log_ratio(target_texts, raw_texts, ns, n_buckets, alpha):
    ct = Counter(py_bucket(g, n_buckets) for t in target_texts for g in py_grams(t, ns))
    cr = Counter(py_bucket(g, n_buckets) for t in raw_texts for g in py_grams(t, ns))
    tn = math.log(sum(ct.values()) + alpha * n_buckets)
    rn = math.log(sum(cr.values()) + alpha * n_buckets)

    def lr(b):
        return math.log(ct[b] + alpha) - math.log(cr[b] + alpha) - (tn - rn)

    return lr


def py_log_weight(text, lr, ns, n_buckets):
    return sum(lr(py_bucket(g, n_buckets)) for g in py_grams(text, ns))


def py_gumbel_key(doc_id, seed, log_w):
    h = int(hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()[:15], 16)
    u = (h + 0.5) / float(1 << 60)
    return log_w + -math.log(-math.log(u))


WORDS_T = ["theorem", "proof", "lemma", "therefore", "equation", "integral"]
WORDS_R = ["click", "buy", "now", "free", "offer", "subscribe", "deal"]


def _mk_corpus(rng, words, n_docs, lo=3, hi=12):
    return [
        " ".join(rng.choice(words) for _ in range(rng.randint(lo, hi)))
        for _ in range(n_docs)
    ]


@pytest.fixture(scope="module")
def corpora():
    rng = random.Random(97)
    target = _mk_corpus(rng, WORDS_T, 12)
    raw = _mk_corpus(rng, WORDS_T + WORDS_R, 40)
    # score a mixed pool: some targety, some rawy, one empty, one spacey
    pool = (
        _mk_corpus(rng, WORDS_T, 5)
        + _mk_corpus(rng, WORDS_R, 5)
        + ["", "   ", "theorem  proof   lemma"]
    )
    return target, raw, pool


B = 64  # small on purpose: forces hash collisions through the oracle too
NS = (1, 2)
ALPHA = 0.5


@pytest.fixture(scope="module")
def model(spark, corpora):
    target, raw, _ = corpora
    tdf = spark.createDataFrame([(t,) for t in target], "text string")
    rdf = spark.createDataFrame([(t,) for t in raw], "text string")
    return fit_dsir(tdf, rdf, n_buckets=B, ns=NS, alpha=ALPHA, hash_family="md5")


def test_buckets_match_python_counter(spark, corpora):
    _, _, pool = corpora
    df = spark.createDataFrame(list(enumerate(pool)), "doc_id int, text string")
    got = {
        (r.doc_id, r.bucket): r.cnt
        for r in hashed_ngram_buckets(
            df, n_buckets=B, ns=NS, hash_family="md5"
        ).collect()
    }
    want = {}
    for i, t in enumerate(pool):
        for g in py_grams(t, NS):
            k = (i, py_bucket(g, B))
            want[k] = want.get(k, 0) + 1
    assert got == want


def test_log_weights_match_python(spark, corpora, model):
    target, raw, pool = corpora
    lr = py_fit_log_ratio(target, raw, NS, B, ALPHA)
    df = spark.createDataFrame(list(enumerate(pool)), "doc_id int, text string")
    got = {r.doc_id: r.log_w for r in dsir_log_weights(model, df).collect()}
    assert set(got) == set(range(len(pool)))  # row-count preserving
    for i, t in enumerate(pool):
        assert got[i] == pytest.approx(py_log_weight(t, lr, NS, B), abs=1e-9)
    # featureless docs score exactly neutral
    assert got[pool.index("")] == 0.0


def test_log_weights_join_fallback_matches_inline(spark, corpora, model):
    """r14 size guard (VERDICT r13 #4): a model whose n_buckets exceeds
    max_inline_buckets scores through the broadcast-join form — same
    weights as the dense-literal path (to float-sum reordering, well
    under the oracle consumers' 6 dp), same row-count-preserving spine,
    and the plan actually contains the join the inline path eliminated."""
    _, _, pool = corpora
    df = spark.createDataFrame(list(enumerate(pool)), "doc_id int, text string")
    inline = {r.doc_id: r.log_w for r in dsir_log_weights(model, df).collect()}
    joined_df = dsir_log_weights(model, df, max_inline_buckets=B - 1)
    joined = {r.doc_id: r.log_w for r in joined_df.collect()}
    assert set(joined) == set(inline)
    for i in inline:
        assert joined[i] == pytest.approx(inline[i], abs=1e-9)
    plan = joined_df._jdf.queryExecution().executedPlan().toString()
    assert "Join" in plan  # the fallback really is the join form


def test_log_weights_rejects_unknown_hash_family(spark, corpora, model):
    """ADVICE r13: the inline rewrite bypassed hashed_ngram_buckets, so
    a corrupted/hand-built model with an unknown hash family silently
    scored with portable_hash; it must fail loudly on entry instead."""
    _, _, pool = corpora
    df = spark.createDataFrame(list(enumerate(pool)), "doc_id int, text string")
    bad = model._replace(hash_family="fnv1a")
    with pytest.raises(ValueError, match="hash_family"):
        dsir_log_weights(bad, df)


def test_load_dsir_rejects_unknown_hash_family(spark, corpora, model, tmp_path):
    import json
    import os

    from ferramenta_etl_spark.operators.dsir import load_dsir, save_dsir

    path = str(tmp_path / "dsir")
    save_dsir(model, path)
    from ferramenta_etl_spark.sinks.layout import _fs_read_text, _fs_write_text

    meta_p = os.path.join(path, "_dsir_meta.json")
    meta = json.loads(_fs_read_text(spark, meta_p))
    meta["hash_family"] = "fnv1a"
    # rewrite through the same FS layer (a direct open() would leave a
    # stale Hadoop .crc sidecar and fail the read on checksum instead)
    _fs_write_text(spark, meta_p, json.dumps(meta))
    with pytest.raises(ValueError, match="hash_family"):
        load_dsir(spark, path)


def test_targety_docs_outscore_rawy_docs(spark, corpora, model):
    _, _, pool = corpora
    df = spark.createDataFrame(list(enumerate(pool)), "doc_id int, text string")
    w = {r.doc_id: r.log_w for r in dsir_log_weights(model, df).collect()}
    targety = [w[i] for i in range(0, 5)]
    rawy = [w[i] for i in range(5, 10)]
    assert min(targety) > max(rawy)


def test_resample_matches_python_gumbel_topk(spark, corpora, model):
    target, raw, pool = corpora
    lr = py_fit_log_ratio(target, raw, NS, B, ALPHA)
    df = spark.createDataFrame(list(enumerate(pool)), "doc_id int, text string")
    weights = dsir_log_weights(model, df)
    n, seed = 6, 41
    got = sorted(
        r.doc_id
        for r in dsir_resample(weights, n, seed=seed, hash_family="md5").collect()
    )
    keyed = sorted(
        (
            -py_gumbel_key(i, seed, py_log_weight(t, lr, NS, B)),
            i,
        )
        for i, t in enumerate(pool)
    )
    want = sorted(i for _, i in keyed[:n])
    assert got == want
    # deterministic under repartitioning
    again = sorted(
        r.doc_id
        for r in dsir_resample(
            weights.repartition(7), n, seed=seed, hash_family="md5"
        ).collect()
    )
    assert again == got
    # a different seed moves the sample (with overwhelming probability
    # on this fixture), same size
    other = dsir_resample(weights, n, seed=seed + 1, hash_family="md5").collect()
    assert len(other) == n


def test_resample_n_larger_than_pool_returns_all(spark, corpora, model):
    _, _, pool = corpora
    df = spark.createDataFrame(list(enumerate(pool)), "doc_id int, text string")
    weights = dsir_log_weights(model, df)
    assert dsir_resample(weights, 10_000, hash_family="md5").count() == len(pool)


def test_fit_rejects_bad_params(spark, corpora):
    target, raw, _ = corpora
    tdf = spark.createDataFrame([(t,) for t in target], "text string")
    with pytest.raises(ValueError, match="alpha"):
        fit_dsir(tdf, tdf, alpha=0.0)
    with pytest.raises(ValueError, match="hash_family"):
        fit_dsir(tdf, tdf, hash_family="sha1")
    with pytest.raises(ValueError, match="orders"):
        fit_dsir(tdf, tdf, ns=(0, 2))


def test_default_ratio_covers_unseen_buckets(spark, corpora, model):
    """A doc made entirely of never-seen grams gets n_features *
    default_log_ratio — finite, engine-computable, no -inf."""
    _, _, _ = corpora
    df = spark.createDataFrame(
        [(0, "zzzqx wvvk pplm")], "doc_id int, text string"
    )
    got = dsir_log_weights(model, df).collect()[0].log_w
    # 3 unigrams + 2 bigrams... unless a hash collision lands one gram
    # in a seen bucket; with B=64 that's likely, so just assert finite
    # and bounded by the plausible feature count times extreme ratios
    assert math.isfinite(got)
    lrs = [r.log_ratio for r in model.log_ratio.collect()]
    lo = min(lrs + [model.default_log_ratio]) * 5
    hi = max(lrs + [model.default_log_ratio]) * 5
    assert lo <= got <= hi


def test_model_save_load_roundtrip(spark, corpora, model, tmp_path):
    """Persisted-model artifact: loading reproduces every weight (the
    per-doc sum accumulates the same broadcast-joined terms; compare at
    1e-12 for float-sum order), and a wrong/absent artifact fails
    loudly."""
    from ferramenta_etl_spark.operators.dsir import load_dsir, save_dsir

    _, _, pool = corpora
    path = str(tmp_path / "dsir")
    save_dsir(model, path)
    back = load_dsir(spark, path)
    assert (back.n_buckets, back.ns, back.hash_family) == (
        model.n_buckets, model.ns, model.hash_family
    )
    assert back.default_log_ratio == pytest.approx(
        model.default_log_ratio, rel=1e-15
    )
    df = spark.createDataFrame(list(enumerate(pool)), "doc_id int, text string")
    a = {r.doc_id: r.log_w for r in dsir_log_weights(model, df).collect()}
    b = {r.doc_id: r.log_w for r in dsir_log_weights(back, df).collect()}
    assert set(a) == set(b)
    for d in a:
        assert b[d] == pytest.approx(a[d], rel=1e-12)
    with pytest.raises(Exception):
        load_dsir(spark, str(tmp_path / "nope"))
