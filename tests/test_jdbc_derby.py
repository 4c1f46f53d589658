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


def test_jdbc_filter_pushdown(spark, derby_cfg, loaded_orders):
    """Catalyst pushes the filter into the remote scan (PushedFilters) —
    free with the declarative reader."""
    back = jdbc_table_reader(spark, derby_cfg, "orders_jdbc").load()
    filtered = back.filter(back.o_totalprice > 200000.0)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_totalprice" in plan
    want = loaded_orders.filter(loaded_orders.o_totalprice > 200000.0).count()
    assert filtered.count() == want
