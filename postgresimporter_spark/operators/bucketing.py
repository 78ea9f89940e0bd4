"""Bucketed-table co-located joins.

At 100 TB, the orders⋈lineitem shuffle dominates star-join cost. Writing
both tables bucketed (and sorted) by the join key lets Catalyst plan a
sort-merge join with NO exchange on either side — the shuffle is paid
once at write time and amortized over every subsequent join.

These helpers wrap the write/read ceremony; ``assert_no_exchange``
inspects the physical plan so tests (and operators) can verify the
shuffle actually disappeared instead of trusting configuration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Save as a bucketed (+sorted) catalog table.

    With ``path``, the table is EXTERNAL at that location — overwrite
    replaces the data there even when a previous session (in-memory
    catalog, no persisted metadata) left files behind.  Without it, a
    managed table in the warehouse dir (same caveat: a stale managed
    location from a dead session raises LOCATION_ALREADY_EXISTS, so
    prefer ``path`` for anything rerun across sessions)."""
    df.sparkSession.sql(f"DROP TABLE IF EXISTS {table}")
    writer = (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, *bucket_cols)
    )
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle-exchange operators in the physical plan."""
    plan = physical_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line
        or "Exchange rangepartitioning" in line
    )


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables (shuffle-free when bucket layouts
    line up)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


__all__ = [
    "write_bucketed",
    "bucketed_join",
    "count_exchanges",
    "physical_plan",
]
