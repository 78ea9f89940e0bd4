"""ORC source/sink.

ORC is the other columnar format Spark ships natively (the jars are in
the base distribution — unlike Avro, which needs the external
``spark-avro`` module and is deliberately NOT offered here). Reads get
the same Catalyst treatment as parquet: predicate pushdown, column
pruning, partition pruning, vectorized decoding
(``spark.sql.orc.filterPushdown`` is on by default in Spark 3+).

Scale notes: a 100 TB ORC lake reads exactly like a parquet one —
per-file splits sized by ``spark.sql.files.maxPartitionBytes``, stripe
statistics serving min/max skipping. The writer exposes partitioning so
downstream partition-pruned scans stay cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read an ORC file/directory (vectorized, pushdown-enabled)."""
    return spark.read.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str = "zstd",
) -> None:
    """Write ORC with optional hive-style partitioning.

    zstd default: best size/speed trade-off of the codecs in the base
    distribution, and the usual pick for cold analytics data.
    """
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


__all__ = ["read_orc", "write_orc"]
