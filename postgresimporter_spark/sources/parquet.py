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
    _ensure_session_confs(spark)
    out: dict[str, DataFrame] = {}
    for t in tables or TABLES:
        path = f"{sf_dir}/{t}.parquet"
        df = spark.read.parquet(path)
        df = _restore_nanos_timestamps(df, path)
        df.createOrReplaceTempView(t)
        out[t] = df
    return out


def _ensure_session_confs(spark: SparkSession) -> None:
    """Defensive runtime confs for sessions not built by ``session.py``
    (e.g. a test harness hands us its own SparkSession):

    - ``nanosAsLong``: without it, reading TIMESTAMP(NANOS) parquet
      (events) throws PARQUET_TYPE_ILLEGAL;
    - UTC session zone: timestamp results are hash-compared against a
      UTC oracle — a local-zone session would shift every value;
    - ``inferTimestampNTZ=false``: naive parquet timestamps (DuckDB
      writes timestamp[us] with no tz) read as session-zone TIMESTAMP
      instead of TIMESTAMP_NTZ. With the session pinned to UTC the
      values are identical, but NTZ breaks streaming watermarks
      (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE) and window frames.

    All are runtime-settable SQL confs; set before any read happens.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception:  # noqa: BLE001 - conf locked: proceed, reads may work
        pass


def _restore_nanos_timestamps(df: DataFrame, path: str) -> DataFrame:
    """Convert TIMESTAMP(NANOS) columns (read as nano longs under
    ``spark.sql.legacy.parquet.nanosAsLong``) back to TimestampType at
    Spark's microsecond precision (truncating).

    The footer read is one driver-side metadata fetch per table — cheap
    at any scale; only columns whose parquet logical type is actually
    timestamp[ns] are touched.
    """
    from pyspark.sql import functions as F

    try:
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
    except Exception:  # noqa: BLE001 - non-local/dir-style paths
        import logging

        logging.getLogger(__name__).warning(
            "could not read parquet footer for %s: TIMESTAMP(NANOS) "
            "columns (if any) remain raw longs under nanosAsLong",
            path,
        )
        return df
    import pyarrow as pa

    for field in schema:
        if pa.types.is_timestamp(field.type) and field.type.unit == "ns":
            # integer division: float division of ~1e18 nanos loses
            # sub-microsecond precision (double has 53 mantissa bits)
            df = df.withColumn(
                field.name,
                F.timestamp_micros(F.expr(f"`{field.name}` div 1000")),
            )
    return df
