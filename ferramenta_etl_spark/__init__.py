"""ferramenta_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch rebuild of the query and data-processing capabilities of
the reference repo ``VitorHFonsecaX/Ferramenta-ETL`` (see SURVEY.md), expressed
Spark-first: DataFrame/SQL logical plans optimized by Catalyst, plus a
pipeline framework replacing the reference's Qt orchestrator
(``Executavel do ETL.py``) and idempotent sinks replacing its
``ON CONFLICT DO NOTHING`` PostgreSQL load
(``Select de Importação de Dados.py:214-218``).

Subpackages
-----------
- ``sources``   — parquet/JDBC readers with schema contracts
- ``functions`` — scalar helpers (T-SQL-style formatting, null semantics)
- ``operators`` — composable DataFrame operators (dedup, joins, text,
                  similarity, multimodal)
- ``plans``     — named queries wired into the driver contract
- ``sinks``     — idempotent writers (anti-join append / merge)
- ``pipeline``  — config-driven job registry + sequential fail-fast runner
- ``streaming`` — Structured Streaming window/dedup helpers
"""

__version__ = "0.1.0"
