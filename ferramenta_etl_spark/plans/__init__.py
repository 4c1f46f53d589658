"""Named query plans wired into the driver contract (__spark_entry__.py).

Each plans module exposes:
- ``QUERIES``: dict[name -> callable(spark, sf_dir) -> DataFrame]
- ``ORACLES``: dict[name -> DuckDB-runnable ANSI SQL string]

Names present in QUERIES but absent from ORACLES get the driver's weaker
rows-only check (non-SQL-expressible ops).
"""

from . import extensions, flagship, relational, relational2  # noqa: F401

_MODULES = (flagship, relational, relational2, extensions)


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
