"""The curation pipeline end-to-end: filter -> exact dedup -> near-dup
collapse -> partitioned idempotent load."""

import os

from pyspark.sql import functions as F

from ferramenta_etl_spark.pipeline.curation import curate_documents, curated_frame


def test_curation_pipeline_idempotent(spark, sf_dir, tmp_path):
    sink_dir = str(tmp_path)
    n1 = curate_documents(spark, sf_dir, sink_dir)
    n2 = curate_documents(spark, sf_dir, sink_dir)
    assert n1 > 0 and n2 == 0, "rerun must append nothing"
    out = spark.read.parquet(f"{sink_dir}/curated_documents")
    assert out.count() == n1
    # hive layout by language
    assert any(
        d.startswith("lang=") for d in os.listdir(f"{sink_dir}/curated_documents")
    )


def test_curation_decontaminates(spark, sf_dir):
    """Supplying a benchmark drops exactly the docs with n-gram overlap
    and nothing else."""
    from ferramenta_etl_spark.operators.text import contamination_hits

    base = curated_frame(spark, sf_dir)
    # use some surviving docs themselves as the "benchmark": guaranteed
    # overlap, so decontamination must drop at least those docs
    bench = base.orderBy("doc_id").limit(3).select("doc_id", "text")
    cleaned = curated_frame(spark, sf_dir, benchmark=bench)
    dropped = base.count() - cleaned.count()
    n_contaminated = contamination_hits(base, bench, n=5).count()
    assert n_contaminated >= 3  # the bench docs at minimum
    assert dropped == n_contaminated
    # the cleaned set has zero residual overlap
    assert contamination_hits(cleaned, bench, n=5).count() == 0


def test_curation_invariants(spark, sf_dir):
    out = curated_frame(spark, sf_dir)
    rows = out.count()
    assert rows > 0
    # quality floor and token floor hold
    assert out.filter((F.col("quality") < 0.5) | (F.col("n_tok") < 5)).count() == 0
    # no two surviving docs share an exact text
    assert out.select(F.md5("text")).distinct().count() == rows
    # curation actually removed something (fixture has dups + low quality)
    from ferramenta_etl_spark.sources import load_table

    assert rows < load_table(spark, sf_dir, "documents").count()


def test_redact_pii(spark, sf_dir):
    """PII masking: emails, IPv4s, and phone-shaped runs are replaced;
    prose (including plain numbers and dotted abbreviations) survives."""
    from ferramenta_etl_spark.operators.text import redact_pii

    cases = spark.createDataFrame(
        [
            (1, "contact me at jane.doe+spam@example.co.uk thanks"),
            (2, "server 10.0.255.3 timed out"),
            (3, "call +1 (555) 123-4567 or 555-123-4567"),
            (4, "chapter 3 section 12 covers e.g. the year 1999"),
        ],
        "id long, text string",
    )
    out = {r.id: r.t for r in cases.select("id", redact_pii(F.col("text")).alias("t")).collect()}
    assert out[1] == "contact me at <PII> thanks"
    assert out[2] == "server <PII> timed out"
    assert "4567" not in out[3] and "<PII>" in out[3]
    assert out[4] == "chapter 3 section 12 covers e.g. the year 1999"

    # pipeline flag: redacted output has no emails anywhere
    cleaned = curated_frame(spark, sf_dir, redact=True)
    assert cleaned.filter(F.col("text").rlike("@[A-Za-z0-9.-]+\\.")).count() == 0
    # and row count is unchanged vs unredacted (masking never drops docs)
    assert cleaned.count() == curated_frame(spark, sf_dir).count()
