"""End-to-end JDBC connector tests against embedded Apache Derby.

The reference's connector surface is JDBC/ODBC (SQL Server source,
PostgreSQL sink — SURVEY.md §2.1 #1-3). No server database exists in the
test container, but Spark ships the Derby embedded engine on its
classpath (for the Hive metastore), so the full read/write path — driver
loading, batched writes, partitioned parallel scans, full-query pushdown
— is exercised for real here: same code path as any server JDBC source,
minus the network."""

import pytest

from ferramenta_etl_spark.sources import load_table
from ferramenta_etl_spark.sources.jdbc import (
    JdbcConfig,
    jdbc_append_writer,
    jdbc_query_reader,
    jdbc_table_reader,
)


@pytest.fixture(scope="module")
def derby_cfg(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "etl_db"
    return JdbcConfig(
        url=f"jdbc:derby:{db};create=true",
        user="app",
        password="app",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
        fetchsize=1000,
        batchsize=1000,
    )


@pytest.fixture(scope="module")
def loaded_orders(spark, sf_dir, derby_cfg):
    """Write orders (numeric/string/timestamp columns) once via the
    batched JDBC append writer (≙ execute_batch, S:213-225)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    jdbc_append_writer(orders, derby_cfg, "orders_jdbc").save()
    return orders


def test_jdbc_batched_write_then_scan(spark, derby_cfg, loaded_orders):
    back = jdbc_table_reader(spark, derby_cfg, "orders_jdbc").load()
    assert back.count() == loaded_orders.count()
    got = sorted(tuple(r) for r in back.collect())
    want = sorted(tuple(r) for r in loaded_orders.collect())
    assert got == want


def test_jdbc_partitioned_parallel_scan(spark, derby_cfg, loaded_orders):
    """partitionColumn bounds -> N parallel range scans, the piece the
    reference's single cursor could not do (SURVEY.md §2.1 #2)."""
    hi = loaded_orders.agg({"o_orderkey": "max"}).first()[0]
    back = jdbc_table_reader(
        spark,
        derby_cfg,
        "orders_jdbc",
        partition_column="o_orderkey",
        lower_bound=0,
        upper_bound=int(hi) + 1,
        num_partitions=4,
    ).load()
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == loaded_orders.count()


def test_jdbc_query_pushdown_scan(spark, derby_cfg, loaded_orders):
    """Full-query pushdown (≙ cursor.execute(sql), S:192): the database
    runs the aggregation; Spark streams one result row."""
    out = jdbc_query_reader(
        spark,
        derby_cfg,
        # Spark's JDBC writer quotes COLUMN identifiers (case-exact) but
        # passes the table name through unquoted — mirror that here. The
        # writer maps StringType to Derby CLOB, which Derby cannot GROUP
        # BY, so the remote query casts — remote-dialect quirks are
        # exactly why the engine computes in Spark by default (SURVEY §3).
        'SELECT CAST("o_orderstatus" AS VARCHAR(10)) AS "st", COUNT(*) AS "n" '
        'FROM orders_jdbc GROUP BY CAST("o_orderstatus" AS VARCHAR(10))',
    ).load()
    rows = {r["st"]: r["n"] for r in out.collect()}
    want = {
        r["o_orderstatus"]: r["count"]
        for r in loaded_orders.groupBy("o_orderstatus").count().collect()
    }
    assert rows == want


def test_pipeline_run_all_twice_on_derby_inserts_zero(spark, sf_dir, derby_cfg):
    """VERDICT r12 #5: the shipped 5-job registry end-to-end against a
    REAL database through the staged conflict-insert sink — the
    reference's exact deployment shape and its S:217 re-run contract:
    the first run_all loads every feed, the second inserts ZERO rows
    (every key pair already present server-side), and no table holds a
    duplicate key. The parquet twin is
    tests/test_pipeline.py::test_example_pipeline_end_to_end_idempotent;
    this one proves the same semantics over JDBC where the anti-join
    runs in the database (NOT EXISTS dialect on Derby)."""
    from ferramenta_etl_spark.pipeline.jobs import JOB_SPECS, build_jobs_jdbc
    from ferramenta_etl_spark.pipeline.registry import JobRegistry

    jobs = build_jobs_jdbc(sf_dir, derby_cfg)
    reg = JobRegistry()
    for name in JOB_SPECS:
        reg.register(name, jobs[name])

    first = reg.run_all(spark)
    assert [r.status for r in first] == ["ok"] * 5
    assert all(r.output > 0 for r in first), "every job should load rows"

    second = reg.run_all(spark)
    assert [r.status for r in second] == ["ok"] * 5
    assert [r.output for r in second] == [0] * 5, "rerun must insert nothing"

    for _, (plan, sink, keys) in JOB_SPECS.items():
        back = jdbc_table_reader(spark, derby_cfg, sink).load()
        # the sink's contract is first-writer-wins PER KEY (in-batch
        # duplicates collapse before staging), so the table holds one
        # row per distinct key pair of the plan
        want = plan(spark, sf_dir).dropDuplicates(keys)
        assert back.count() == want.count(), sink
        dups = (
            back.groupBy(*keys).count().filter("count > 1").count()
        )
        assert dups == 0, f"{sink} holds duplicate keys"


def test_jdbc_filter_pushdown(spark, derby_cfg, loaded_orders):
    """Catalyst pushes the filter into the remote scan (PushedFilters) —
    free with the declarative reader."""
    back = jdbc_table_reader(spark, derby_cfg, "orders_jdbc").load()
    filtered = back.filter(back.o_totalprice > 200000.0)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_totalprice" in plan
    want = loaded_orders.filter(loaded_orders.o_totalprice > 200000.0).count()
    assert filtered.count() == want
