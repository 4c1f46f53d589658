"""File-format ingestion beyond parquet: JSONL, CSV, ORC — with the
same schema-contract discipline as the parquet loader and row-level
corrupt-record capture for the text formats.

Web-scrape and vendor-feed corpora arrive as JSONL/CSV where a single
mangled line is routine; Spark's default FAILFAST posture turns that
line into a dead 100 TB job. These loaders run PERMISSIVE with an
explicit `_corrupt_record` column, split the frame into (good, bad),
and hand `bad` to the quarantine sink — the reference's keep-going
posture (S:231-236) applied at ingest rather than load. ORC is
columnar/self-describing like parquet, so it takes the plain
schema-contract path.

An EXPLICIT schema is required for the text formats: schema inference
reads the data twice and silently widens types on dirty input — at
scale you declare the contract, you don't discover it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .tables import assert_schema

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.names:
        raise ValueError(f"schema must not already contain {CORRUPT_COL}")
    return T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])


def _split(raw: DataFrame, schema: T.StructType) -> tuple[DataFrame, DataFrame]:
    """(good, bad): bad keeps only the raw corrupt line — the quarantine
    payload; good drops the corrupt column and must match the contract.

    The raw frame is cached for the split: PERMISSIVE parsing populates
    `_corrupt_record` lazily, and Spark disallows filtering on it
    straight off the scan (the internal-column restriction). Both sides
    then materialize via localCheckpoint and the cache is RELEASED —
    without the unpersist every ingest in a long-lived session pins a
    full parsed copy of its input in executor storage forever (same
    discipline as sinks/quarantine.read_json_with_quarantine)."""
    raw = raw.cache()
    try:
        bad = (
            raw.filter(F.col(CORRUPT_COL).isNotNull())
            .select(F.col(CORRUPT_COL).alias("raw_record"))
            .localCheckpoint(eager=True)
        )
        good = (
            raw.filter(F.col(CORRUPT_COL).isNull())
            .drop(CORRUPT_COL)
            .localCheckpoint(eager=True)
        )
    finally:
        raw.unpersist()
    assert_schema(good, schema, "file-source")
    return good, bad


def load_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Line-delimited JSON with row-level corruption capture.

    Returns (good, bad): good matches ``schema`` exactly; bad carries
    one `raw_record` string per unparseable/contract-violating line.
    A JSON line that parses but misses fields yields nulls (caller
    policy — the quarantine rules can reject null keys downstream);
    a line that is not JSON at all lands in bad."""
    raw = (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    return _split(raw, schema)


def load_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """CSV with row-level corruption capture — same contract as
    load_jsonl. Malformed rows (wrong column count, type-cast failure)
    land in bad as the raw line."""
    raw = (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )
    return _split(raw, schema)


def load_orc(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """ORC: columnar and self-describing like parquet — plain read +
    schema contract, no corrupt-record channel (file-level integrity is
    the format's own concern, as with parquet)."""
    df = spark.read.orc(path)
    df = df.select(*[F.col(f.name).cast(f.dataType) for f in schema.fields])
    assert_schema(df, schema, "orc-source")
    return df
