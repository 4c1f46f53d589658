"""Adversarial-corpus differential check for the document oracles.

The parity tests run every oracle on the driver fixtures; this file
swaps in a hand-built nasty corpus — unicode, empty strings, runs of
spaces (empty tokens under the single-space contract), null lang,
exact and near duplicates, case-only variants — and re-runs every
documents-only oracle. This is what protects the portable-hash
MinHash/SimHash oracles (round 3) from engine-divergence edge cases the
synthetic fixtures never exercise."""

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entry_mod
from ferramenta_etl_spark.testing import compare_to_oracle

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

# every registered query whose tables are {documents}
DOC_QUERIES = [
    "dedup_exact",
    "dedup_fingerprint",
    "dedup_tokenset_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_lang_id",
    "text_quality_score",
    "text_token_count",
    "text_decontaminate",
    "text_chunking",
    "multimodal_meta",
    "multimodal_checksum",
]


def _nasty_corpus():
    rng = random.Random(7)
    texts = [
        "",  # empty -> single empty token
        " ",  # one space -> two empty tokens
        "word",
        "two  spaces  between  tokens",  # empty tokens mid-stream
        "açaí café naïve Zürich 北京 東京 🚀 emoji",  # multibyte
        "MiXeD CaSe TeXt tokens", "mixed case text tokens",  # case variant
        "the quick brown fox jumps over the lazy dog again and again",
        "the quick brown fox jumps over the lazy dog again and again",  # exact dup
        "the quick brown fox leaps over the lazy dog again and again",  # near dup
        "the quick brown fox jumps over the lazy dog once more today",  # near dup
        "identical identical identical identical identical",  # heavy repetition
        "1 2 3 4 5 6 7 8 9 10 11 12",  # digits
        "trailing space ",
        " leading space",
    ]
    vocab = [f"tok{i}" for i in range(40)] + ["café", "日本", "x"]
    for _ in range(60):
        texts.append(" ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30))))
    rows = []
    langs = ["en", "pt", None, "de"]
    for i, t in enumerate(texts):
        rows.append(
            {
                "doc_id": i,
                "text": t,
                "lang": langs[i % len(langs)],
                "source": f"src{i % 3}",
                "n_chars": len(t),
            }
        )
    return rows


@pytest.fixture(scope="module")
def nasty_dir(tmp_path_factory, sf_dir):
    d = tmp_path_factory.mktemp("nasty_fixture")
    for t in os.listdir(sf_dir):
        if t != "documents.parquet":
            os.symlink(os.path.join(sf_dir, t), os.path.join(d, t))
    rows = _nasty_corpus()
    table = pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
            "source": pa.array([r["source"] for r in rows], pa.string()),
            "n_chars": pa.array([r["n_chars"] for r in rows], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(d, "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_doc_oracles_on_adversarial_corpus(spark, nasty_dir, name):
    df = QUERIES[name](spark, nasty_dir)
    ok, msg = compare_to_oracle(spark, df, ORACLES[name], nasty_dir)
    assert ok, f"{name} diverged on the adversarial corpus: {msg}"
