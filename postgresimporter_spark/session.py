"""SparkSession factory.

Every entry point funnels through :func:`get_spark` so the engine runs with
one blessed configuration: AQE on (runtime re-planning, skew-join handling,
dynamic coalescing), Arrow on (vectorized pandas UDF transfer), and a
shuffle-partition count sized for the deployment rather than Spark's
legacy default of 200.

Scale posture: on a real cluster ``spark.sql.shuffle.partitions`` should be
~2-3x total executor cores (AQE coalesces down when partitions are small),
``spark.sql.files.maxPartitionBytes`` stays at 128m so a 100 TB scan yields
~800k well-sized input splits, and broadcast joins engage automatically for
dim tables under ``autoBroadcastJoinThreshold``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "postgresimporter-spark"


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the singleton SparkSession with engine defaults."""
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # Adaptive query execution: runtime join selection, partition
        # coalescing, and skew-join splitting. Core of the 100 TB posture.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for pandas UDF / toPandas transfer (10-100x row-at-a-time).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions", str(shuffle_partitions or cpus)
        )
        # Dim tables (region/nation/customer at small SF) broadcast free.
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # Deterministic session timezone: correctness-gate hashes compare
        # timestamp values against a DuckDB oracle running in UTC.
        .config("spark.sql.session.timeZone", "UTC")
        # Parquet TIMESTAMP(NANOS) (e.g. pandas-written event streams) is
        # otherwise an illegal type for Spark; read as long + convert
        # (sources/parquet.py restores TimestampType at microsecond
        # precision from the footer's logical type).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Naive parquet timestamps (timestamp[us], no tz — DuckDB's
        # writer) should read as session-zone TIMESTAMP, not NTZ: the
        # session is pinned UTC so values match the oracle either way,
        # but NTZ event-time columns are rejected by withWatermark.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
