"""postgresimporter_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of romnn/postgresimporter.

The reference (/root/reference, MIT) is an asyncio CLI that bulk-loads CSV
files into PostgreSQL (one all-text table per file), optionally combines
same-prefix tables with UNION ALL, ships a library of SQL text/timestamp
parsing functions, runs user pre/post SQL hooks, and reconciles CSV row
counts against database row counts.

This package re-expresses every one of those capabilities Spark-first:

- ``sources``    — CSV/zip/parquet ingestion (all-text reference semantics),
                   JDBC sink (reference: pgfutter -> Postgres COPY).
- ``naming``     — table-name derivation ports (reference utils.py:69-88).
- ``discovery``  — recursive source discovery + exclude-regex + prefix
                   grouping (reference main.py:144-194).
- ``functions``  — the packaged SQL scalar-function library (reference
                   hooks/functions.sql) as Catalyst expression compositions.
- ``pipeline``   — the 6-stage load pipeline (reference main.py:308-374)
                   as a declarative driver-side stage DAG over DataFrames.
- ``operators``  — the relational + LLM-data-pipeline operator surface
                   (dedup, similarity search, text analysis, multimodal).
- ``streaming``  — Structured Streaming variants of the event operators.
- ``plans``      — the query library exposed through __spark_entry__.
"""

__version__ = "0.1.0"
