"""Parquet analytics tables (the driver's TPC-H-ish fixture set)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_tables(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> dict[str, DataFrame]:
    """Load fixture tables and register each as a temp view.

    Parquet scans get predicate pushdown + column pruning from Catalyst;
    nothing is cached here — at 100 TB you stream, not pin.
    """
    out: dict[str, DataFrame] = {}
    for t in tables or TABLES:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        df.createOrReplaceTempView(t)
        out[t] = df
    return out
