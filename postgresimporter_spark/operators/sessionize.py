"""Event-time operators over the ``events`` table: tumbling windows,
sessionization, JSON property extraction.

Batch implementations here; ``streaming/`` applies the same logic under
Structured Streaming with watermarks.

Sessionization is deliberately the gaps-and-islands formulation (lag +
cumulative flag sum per user) rather than ``F.session_window`` — the two
are semantically identical for batch, but gaps-and-islands is exactly
expressible in ANSI SQL, which keeps the operator oracle-checkable. One
shuffle on user_id; the two windows share the same partitioning, so
Catalyst plans a single exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour event-time aggregation. Partial aggregation is
    map-side (Catalyst); one shuffle on (hour, event_type)."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            # exact decimal accumulation -> double: independent of
            # partitioning/addition order (hash-stable vs the oracle)
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Assign session ids per user: a session breaks when the gap from
    the previous event exceeds ``gap_minutes``."""
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    prev_ts = F.lag("ts").over(by_user)
    # microsecond epoch diff: exact integer arithmetic, no seconds
    # truncation ambiguity (oracle uses epoch_us identically)
    new_session = F.when(
        prev_ts.isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts) > gap_us),
        1,
    ).otherwise(0)
    return events.withColumn(
        "session_id",
        F.sum(new_session).over(
            by_user.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-session aggregates (start/end/n_events/total value)."""
    s = sessionize(events, gap_minutes)
    return s.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("total_value"),
    )


def extract_props(events: DataFrame, key: str = "k") -> DataFrame:
    """Pull a typed value out of the JSON ``props`` column."""
    return events.withColumn(
        f"prop_{key}",
        F.get_json_object(F.col("props"), f"$.{key}").cast("int"),
    )


__all__ = ["hourly_rollup", "sessionize", "session_stats", "extract_props"]
