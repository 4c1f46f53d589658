"""Shared query-registration machinery for the plans modules, with a
per-session PLAN CACHE.

A registered query is a ``(spark, sf_dir) -> DataFrame`` builder.
DataFrames are immutable logical plans, so rebuilding one for the same
(session, sf_dir) re-buys nothing — it only re-pays py4j roundtrips
(measured: the flagship build is ~1700 roundtrips ≈ 0.6–1.0 s of pure
driver-side socket latency at local[32]; an IVF build additionally
re-collects its centroid metadata). Query engines cache parsed/optimized
plans for exactly this reason — the registry's jobs re-run the same
plans on every schedule tick. The cache key includes
``applicationId``, so a new session (new catalog/conf) re-plans, and
``sf_dir``, so different datasets never share a plan.
"""

from __future__ import annotations

import functools


def make_registry():
    """Returns (QUERIES, ORACLES, _q) for one plans module."""
    queries: dict = {}
    oracles: dict[str, str] = {}

    def _q(name: str, oracle: str | None = None):
        def deco(fn):
            cache: dict = {}

            @functools.wraps(fn)
            def wrapper(spark, sf_dir):
                key = (spark.sparkContext.applicationId, sf_dir)
                if key not in cache:
                    cache.clear()  # one live session at a time: no growth
                    cache[key] = fn(spark, sf_dir)
                return cache[key]

            queries[name] = wrapper
            if oracle is not None:
                oracles[name] = oracle
            return wrapper

        return deco

    return queries, oracles, _q
