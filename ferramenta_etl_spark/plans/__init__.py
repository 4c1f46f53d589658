"""Named query plans wired into the driver contract (__spark_entry__.py).

Each plans module exposes:
- ``QUERIES``: dict[name -> callable(spark, sf_dir) -> DataFrame]
- ``ORACLES``: dict[name -> DuckDB-runnable ANSI SQL string]

Names present in QUERIES but absent from ORACLES get the driver's weaker
rows-only check (non-SQL-expressible ops).

Registration order matters: the driver's correctness gate checks the
FIRST 50 registered queries (CORRECTNESS_r01 held exactly the first 50
of 68, leaving the whole extension suite unverified). The registry is
therefore kept at exactly 50 entries — related micro-operators share one
merged oracle-checked query — and extensions register right after the
flagship so the LLM-pipeline suite can never fall outside the window.
"""

from . import extensions, flagship, relational, relational2  # noqa: F401

_MODULES = (flagship, extensions, relational, relational2)


def all_queries():
    out = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def all_oracles():
    out = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
