"""The local mirror of the driver's correctness gate: every queries()
entry that has an oracle must match DuckDB exactly (count + schema +
order-insensitive values) at sf0.001."""

import pytest

import __spark_entry__ as entry_mod
from ferramenta_etl_spark.testing import compare_to_oracle

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_all_oracle_keys_have_queries():
    assert set(ORACLES) <= set(QUERIES)


def test_driver_window_contract():
    """The driver's gate checks the FIRST 50 registered queries; the
    registry is deliberately pinned at exactly 50 so nothing ever falls
    outside the checked window (plans/__init__.py). Since round 3 EVERY
    registered query carries a DuckDB oracle (approx_sketches, the last
    rows-only holdout, now computes engine-portable KMV/hash-sample
    sketches) — a regression that drops an oracle or adds a 51st query
    fails here, not in the next round's verdict."""
    assert len(QUERIES) == 50
    assert set(QUERIES) - set(ORACLES) == set()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.columns) > 0


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    ok, msg = compare_to_oracle(spark, df, ORACLES[name], sf_dir)
    assert ok, f"{name}: {msg}"


# (No rows-only smoke test: since round 3 every registered query has an
# oracle, so test_query_matches_oracle covers the whole registry —
# test_driver_window_contract pins that invariant.)
