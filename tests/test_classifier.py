"""Learned quality classifier — differential oracle: a from-scratch
numpy full-batch logistic GD over the same md5-bucketed, per-doc-
normalized features must produce the same weight trajectory; Spark's
trained weights and scores match to 1e-6 (float summation order is the
only divergence source, compounding over iterations)."""

import hashlib
import math
import random

import numpy as np
import pytest

from ferramenta_etl_spark.operators.classifier import (
    classify_documents,
    load_classifier,
    save_classifier,
    train_text_classifier,
)

# ---------------------------------------------------------------- reference


def py_grams(text, ns):
    toks = [t for t in text.lower().split(" ") if t != ""]
    out = []
    for n in ns:
        if n == 1:
            out.extend(toks)
        else:
            out.extend(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1))
    return out


def py_bucket(g, B):
    return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % B


def py_features(texts, ns, B):
    """Dense (n_docs, B) matrix of per-doc-normalized bucket counts;
    rows for featureless docs are all-zero."""
    X = np.zeros((len(texts), B))
    for i, t in enumerate(texts):
        gs = py_grams(t, ns)
        for g in gs:
            X[i, py_bucket(g, B)] += 1.0
        if gs:
            X[i] /= len(gs)
    return X


def py_train(pos_texts, neg_texts, ns, B, iters, lr, l2):
    texts = list(pos_texts) + list(neg_texts)
    y = np.array([1.0] * len(pos_texts) + [0.0] * len(neg_texts))
    X = py_features(texts, ns, B)
    keep = X.sum(axis=1) > 0  # featureless docs don't train
    X, y = X[keep], y[keep]
    n = len(y)
    w = np.zeros(B)
    b = 0.0
    for _ in range(iters):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        r = p - y
        gw = (X.T @ r) / n
        gb = r.sum() / n
        w = w - lr * (gw + l2 * w)
        b -= lr * gb
    return w, b


def py_score(text, w, b, ns, B):
    x = py_features([text], ns, B)[0]
    return 1.0 / (1.0 + math.exp(-(float(x @ w) + b)))


WORDS_GOOD = ["theorem", "lemma", "analysis", "method", "result", "study"]
WORDS_BAD = ["click", "free", "offer", "buy", "winner", "casino"]

# lr=10 on purpose: per-doc-normalized features make margins convex
# combinations of (tiny) weights, so the well-conditioned full-batch
# problem needs a large step to separate in few iterations
B, NS, ITERS, LR, L2 = 128, (1, 2), 30, 10.0, 1e-4


@pytest.fixture(scope="module")
def corpora():
    rng = random.Random(71)

    def mk(words, n):
        return [
            " ".join(rng.choice(words) for _ in range(rng.randint(3, 10)))
            for _ in range(n)
        ]

    pos = mk(WORDS_GOOD, 25) + [""]  # featureless row must be ignored
    neg = mk(WORDS_BAD, 25)
    return pos, neg


@pytest.fixture(scope="module")
def model(spark, corpora):
    pos, neg = corpora
    pdf = spark.createDataFrame([(t,) for t in pos], "text string")
    ndf = spark.createDataFrame([(t,) for t in neg], "text string")
    return train_text_classifier(
        pdf, ndf, n_buckets=B, ns=NS, iters=ITERS, lr=LR, l2=L2,
        hash_family="md5",
    )


def test_trained_weights_match_numpy_gd(corpora, model):
    pos, neg = corpora
    w, b = py_train(pos, neg, NS, B, ITERS, LR, L2)
    assert model.bias == pytest.approx(b, abs=1e-6)
    got = np.array(model.weights)
    assert np.max(np.abs(got - w)) < 1e-6


def test_scores_match_numpy_and_separate_classes(spark, corpora, model):
    pos, neg = corpora
    w, b = py_train(pos, neg, NS, B, ITERS, LR, L2)
    probe = [
        "theorem lemma study result",
        "casino winner click free",
        "",
    ]
    df = spark.createDataFrame(list(enumerate(probe)), "doc_id int, text string")
    got = {r.doc_id: r.quality_p for r in classify_documents(model, df).collect()}
    for i, t in enumerate(probe[:2]):
        assert got[i] == pytest.approx(py_score(t, w, b, NS, B), abs=1e-6)
    assert got[0] > 0.8 > 0.2 > got[1]  # the classes separate
    # featureless doc scores the base rate sigmoid(bias), and is PRESENT
    assert got[2] == pytest.approx(1.0 / (1.0 + math.exp(-model.bias)), abs=1e-9)


def test_training_deterministic_across_partitionings(spark, corpora):
    pos, neg = corpora
    pdf = spark.createDataFrame([(t,) for t in pos], "text string")
    ndf = spark.createDataFrame([(t,) for t in neg], "text string")
    m1 = train_text_classifier(
        pdf.repartition(7), ndf.coalesce(1), n_buckets=B, ns=NS, iters=4,
        hash_family="md5",
    )
    m2 = train_text_classifier(
        pdf.coalesce(1), ndf.repartition(5), n_buckets=B, ns=NS, iters=4,
        hash_family="md5",
    )
    assert m1.bias == pytest.approx(m2.bias, abs=1e-9)
    assert np.max(np.abs(np.array(m1.weights) - np.array(m2.weights))) < 1e-9


def test_save_load_roundtrip(spark, corpora, model, tmp_path):
    path = str(tmp_path / "clf")
    save_classifier(model, path, spark)
    back = load_classifier(spark, path)
    assert back.bias == model.bias
    assert back.weights == pytest.approx(model.weights, abs=0)
    assert (back.n_buckets, back.ns, back.hash_family) == (B, NS, "md5")
    with pytest.raises(Exception):
        load_classifier(spark, str(tmp_path / "nope"))
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "_clf_meta.json").write_text('{"format": "x"}')
    with pytest.raises(ValueError, match="linear_text_classifier"):
        load_classifier(spark, str(bad))


def test_param_validation(spark, corpora):
    pos, neg = corpora
    pdf = spark.createDataFrame([(t,) for t in pos], "text string")
    with pytest.raises(ValueError, match="iters"):
        train_text_classifier(pdf, pdf, iters=0)
    with pytest.raises(ValueError, match="hash_family"):
        train_text_classifier(pdf, pdf, hash_family="sha1")
    empty = spark.createDataFrame([("",)], "text string")
    with pytest.raises(ValueError, match="usable"):
        train_text_classifier(empty, empty, n_buckets=8, iters=1)


def test_one_class_training_rejected(spark, corpora):
    """An empty (or all-empty-text) negative side must fail loudly —
    a one-class fit converges to a constant and silently defeats any
    absolute gate threshold."""
    pos, _ = corpora
    pdf = spark.createDataFrame([(t,) for t in pos], "text string")
    empty_neg = spark.createDataFrame([], "text string")
    with pytest.raises(ValueError, match="BOTH sides"):
        train_text_classifier(pdf, empty_neg, n_buckets=16, iters=1)
    blank_neg = spark.createDataFrame([("",), ("  ",)], "text string")
    with pytest.raises(ValueError, match="BOTH sides"):
        train_text_classifier(pdf, blank_neg, n_buckets=16, iters=1)
