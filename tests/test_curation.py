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
