"""JSONL/CSV/ORC ingestion: schema contract + row-level corrupt-record
capture — one mangled line quarantines instead of killing the job."""

import pytest
from pyspark.sql import types as T

from ferramenta_etl_spark.sources import load_csv, load_jsonl, load_orc

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def test_load_jsonl_splits_good_and_bad(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world", "lang": "en"}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "text": "olá", "lang": "pt"}\n'
        '{"doc_id": "NOT_A_NUMBER", "text": "bad type", "lang": "en"}\n'
        '{"doc_id": 3, "text": null, "lang": null}\n'
    )
    good, bad = load_jsonl(spark, str(p), SCHEMA)
    ids = sorted(r.doc_id for r in good.collect())
    assert ids == [1, 2, 3]  # null fields pass (caller policy), junk doesn't
    bads = [r.raw_record for r in bad.collect()]
    assert len(bads) == 2
    assert any("not json" in b for b in bads)
    assert any("NOT_A_NUMBER" in b for b in bads)
    assert good.columns == ["doc_id", "text", "lang"]


def test_load_csv_splits_good_and_bad(spark, tmp_path):
    p = tmp_path / "docs.csv"
    p.write_text(
        "doc_id,text,lang\n"
        "1,hello,en\n"
        "oops_not_a_number,bad,en\n"
        "2,olá,pt\n"
    )
    good, bad = load_csv(spark, str(p), SCHEMA)
    assert sorted(r.doc_id for r in good.collect()) == [1, 2]
    assert bad.count() == 1
    assert "oops_not_a_number" in bad.first().raw_record


def test_load_orc_contract(spark, tmp_path):
    src = spark.createDataFrame(
        [(1, "a", "en"), (2, "b", "pt")], "doc_id long, text string, lang string"
    )
    path = str(tmp_path / "docs.orc")
    src.write.orc(path)
    df = load_orc(spark, path, SCHEMA)
    assert sorted(r.doc_id for r in df.collect()) == [1, 2]


def test_corrupt_col_collision_rejected(spark, tmp_path):
    bad_schema = T.StructType(
        [T.StructField("_corrupt_record", T.StringType())]
    )
    with pytest.raises(ValueError):
        load_jsonl(spark, str(tmp_path), bad_schema)
