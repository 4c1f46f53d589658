"""Parquet table sources with full-schema contracts.

The reference validates its extract only by column COUNT
(``Select de Importação de Dados.py:208-210``) — a weak contract called out
in SURVEY.md §1.3. Here every table load is checked against an explicit
``StructType`` (names + types), which is strictly stronger and catches the
positional-contract bugs the reference was exposed to
(``PG_COLUMN_NAMES`` order, ``S:123-139``).

Scale note: these are plain ``spark.read.parquet`` scans, so Catalyst gets
predicate pushdown / column pruning / partition pruning for free; at 100 TB
the same loader points at a date-partitioned table root instead of one file
and nothing else changes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Expected schemas for the driver testdata (TESTDATA.md / FIXTURES.md §B).
# events.ts is declared LongType because the parquet carries
# TIMESTAMP(NANOS) read under spark.sql.legacy.parquet.nanosAsLong=true;
# load_table() normalizes it to a microsecond TimestampType column.
_long, _int, _str, _dbl = T.LongType(), T.IntegerType(), T.StringType(), T.DoubleType()

EXPECTED_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [T.StructField("r_regionkey", _int), T.StructField("r_name", _str)]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", _int),
            T.StructField("n_name", _str),
            T.StructField("n_regionkey", _int),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", _long),
            T.StructField("c_name", _str),
            T.StructField("c_nationkey", _int),
            T.StructField("c_acctbal", _dbl),
            T.StructField("c_mktsegment", _str),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", _long),
            T.StructField("s_name", _str),
            T.StructField("s_nationkey", _int),
            T.StructField("s_acctbal", _dbl),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", _long),
            T.StructField("p_name", _str),
            T.StructField("p_brand", _str),
            T.StructField("p_type", _str),
            T.StructField("p_size", _int),
            T.StructField("p_retailprice", _dbl),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", _long),
            T.StructField("o_custkey", _long),
            T.StructField("o_orderstatus", _str),
            T.StructField("o_totalprice", _dbl),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", _str),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", _long),
            T.StructField("l_partkey", _long),
            T.StructField("l_suppkey", _long),
            T.StructField("l_linenumber", _int),
            T.StructField("l_quantity", _dbl),
            T.StructField("l_extendedprice", _dbl),
            T.StructField("l_discount", _dbl),
            T.StructField("l_tax", _dbl),
            T.StructField("l_returnflag", _str),
            T.StructField("l_linestatus", _str),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", _long),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", _long),
            T.StructField("event_type", _str),
            T.StructField("value", _dbl),
            T.StructField("props", _str),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", _long),
            T.StructField("text", _str),
            T.StructField("lang", _str),
            T.StructField("source", _str),
            T.StructField("n_chars", _long),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", _long),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", _int),
        ]
    ),
}

TABLES = tuple(EXPECTED_SCHEMAS)


class SchemaContractError(RuntimeError):
    """Raised when a loaded table violates its declared StructType."""


def _canon(type_str: str) -> str:
    # timestamp_ntz vs timestamp: parquet isAdjustedToUTC varies by writer;
    # session TZ is pinned to UTC so the two behave identically here.
    return type_str.replace("timestamp_ntz", "timestamp")


def assert_schema(df: DataFrame, expected: T.StructType, table: str) -> None:
    """Full name+type contract (nullable ignored — parquet footers vary)."""
    actual = [(f.name, _canon(f.dataType.simpleString())) for f in df.schema.fields]
    wanted = [(f.name, _canon(f.dataType.simpleString())) for f in expected.fields]
    if actual != wanted:
        raise SchemaContractError(
            f"table {table!r}: schema contract violated.\n"
            f"  expected: {wanted}\n  actual:   {actual}"
        )


# Per-session DataFrame memo: spark.read.parquet re-lists the path and
# re-reads footers on every call (~0.1 s each driver-side), but the
# resulting DataFrame is an immutable logical plan — loading the same
# table twice in one session does identical work. Keyed on the session
# object so a stopped/replaced session (tests) never serves stale plans,
# AND on the path's mtime: a memoized DataFrame pins the file listing
# snapshotted at first load, so a fixture regenerated in-place mid-
# session would otherwise serve deleted part files (FileNotFound) or
# stale rows. The mtime stat is ~microseconds vs the ~0.1 s re-plan.
_MEMO: dict[tuple[SparkSession, str, str, float], DataFrame] = {}


def _path_mtime(path: str) -> float:
    import os

    try:
        return os.path.getmtime(path)
    except OSError:
        return -1.0  # nonexistent/remote: let the read itself report it


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table with schema enforcement.

    ``events.ts`` arrives as int64 nanoseconds (see session.py); it is
    truncated to microseconds exactly like DuckDB truncates TIMESTAMP_NS,
    so oracle comparisons agree at sub-second precision.
    """
    key = (spark, sf_dir, name, _path_mtime(f"{sf_dir}/{name}.parquet"))
    if key in _MEMO:
        return _MEMO[key]
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer division: epoch-nanos (~1.7e18) exceed double's exact
        # integer range, so a float path would corrupt the low microseconds
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    assert_schema(df, EXPECTED_SCHEMAS[name], name)
    if len(_MEMO) > 256:  # bound growth across many sessions/dirs (tests)
        _MEMO.clear()
    _MEMO[key] = df
    return df


def _estimated_scan_partitions(df: DataFrame, files: list[str]) -> int:
    """Spark's own FilePartition sizing formula, computed from driver
    metadata: maxSplitBytes = min(maxPartitionBytes, max(openCostInBytes,
    (totalBytes + files*openCost) / defaultParallelism)), partitions ~
    ceil(padded total / maxSplitBytes). Called only when len(files) is
    below the parallelism target, so the per-file FileStatus stat is a
    handful of metadata calls, never thousands."""
    spark = df.sparkSession
    jvm = spark._jvm
    byte_str = jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes
    max_pb = byte_str(spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
    open_cost = byte_str(spark.conf.get("spark.sql.files.openCostInBytes", "4MB"))
    hconf = spark._jsc.hadoopConfiguration()
    total = 0
    for f in files:
        p = jvm.org.apache.hadoop.fs.Path(f)
        try:
            total += p.getFileSystem(hconf).getFileStatus(p).getLen()
        except Exception:
            return 1  # unlistable file: assume the worst (serial scan)
    padded = total + len(files) * open_cost
    per_core = padded // max(1, spark.sparkContext.defaultParallelism)
    max_split = min(max_pb, max(open_cost, per_core))
    return max(1, -(-padded // max(1, max_split)))  # ceil div


def ensure_scan_parallelism(
    df: DataFrame,
    min_partitions: int | None = None,
    spread_by: "Sequence[str]" = (),
) -> DataFrame:
    """Round-robin repartition IFF the plan currently has fewer
    partitions than the session's parallelism. Guards expression-heavy
    map work (n-gram explodes and similar interpreted HOF projections)
    against single-row-group inputs, where the entire pre-shuffle stage
    would otherwise run on ONE core (measured 4.5x on the contamination
    gram explode at sf0.1). At production scale inputs span many files,
    the partition count already exceeds parallelism, and this is a
    no-op — the exchange only exists when it pays for itself.

    The partition count is decided from the STATIC plan + file metadata,
    never ``df.rdd`` — under AQE, ``df.rdd`` materializes every upstream
    query stage to learn the final partitioning, i.e. plan COMPOSITION
    would partially execute the query and throw the work away
    (tests/test_plans.py::test_plan_construction_is_driver_job_free
    caught exactly that). Decision tree:

    - a shuffle exchange anywhere below means downstream parallelism is
      already ``spark.sql.shuffle.partitions`` (session-sized >= cores):
      no-op. BroadcastExchange deliberately does NOT count — it never
      re-partitions the probe side (the single-file-corpus broadcast
      join is precisely a case this guard must catch);
    - a map-only lineage over file scans estimates the scan's split
      count with Spark's own FilePartition formula (>= target files
      short-circuits: each file is at least one split);
    - scan-free plans (local relations) fall back to the rdd probe —
      with no scans and no exchanges there are no query stages to
      trigger.

    ``spread_by`` (r14): names of well-spread key columns; when given,
    the guard repartitions by HASH on them instead of round-robin,
    skipping round-robin's mandatory per-partition binary sort
    (sortBeforeRepartition) — which this guard would otherwise pay as a
    serialized full-input pass, since it fires exactly when the input
    is one partition. Callers must pick keys with enough distinct
    values to spread across ``target`` partitions (guide §2.5)."""
    import re

    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.isStreaming:
        return df  # micro-batch partitioning is the source's business
    plan = df._jdf.queryExecution().executedPlan().toString()
    if re.search(
        r"\bExchange (hashpartitioning|rangepartitioning|"
        r"RoundRobinPartitioning|SinglePartition)", plan
    ):
        return df
    files = df.inputFiles()
    if len(files) >= target:
        return df

    def _spread(d: DataFrame) -> DataFrame:
        # HASH repartition when the caller names well-spread key columns
        # (r14): a keyless round-robin repartition first SORTS each input
        # partition by the rows' binary form (sortBeforeRepartition, on
        # by default since SPARK-23207 so retried tasks reproduce their
        # row-to-partition assignment) — and this guard fires exactly
        # when the input is ONE partition, making that sort a serialized
        # full-input pass (measured 1.34 s vs 0.73 s on the flagship
        # parcelas stream at sf0.1). Hash partitioning is deterministic
        # per row, needs no such sort, and a real key column spreads as
        # well as round-robin (guide §2.5's deterministic-key rule).
        if spread_by:
            return d.repartition(target, *[F.col(c) for c in spread_by])
        return d.repartition(target)

    if files:
        if _estimated_scan_partitions(df, files) >= target:
            return df
        return _spread(df)
    if df.rdd.getNumPartitions() < target:
        return _spread(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register tables as temp views so plans can be written in Spark SQL."""
    for n, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)
