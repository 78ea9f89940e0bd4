"""Funnel and cohort-retention analytics over the events table.

Funnel: for an ordered step list (view -> click -> purchase), the number
of users reaching each step *in order* within a conversion window.
Implemented with one pass of per-user window aggregation (min event time
per step, monotonicity enforced), not k-1 self-joins — at 100 TB a
self-join per funnel step multiplies the events shuffle k times; the
grouped formulation shuffles events once on user_id.

Retention: signup-day cohorts x activity offset (classic triangle).
One join between first-seen days and activity days, both already
aggregated — the join operands are |users| and |user-days|, not raw
events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    window_minutes: int = 60,
) -> DataFrame:
    """Users completing each funnel prefix in order within the window.

    Step i counts users whose earliest valid step-i event follows their
    earliest valid step-(i-1) event, with the whole chain inside
    ``window_minutes`` of the step-0 event.
    """
    window_us = window_minutes * 60 * 1_000_000
    per_user = events.groupBy("user_id").agg(
        *[
            F.min(
                F.when(
                    F.col("event_type") == s, F.unix_micros(F.col("ts"))
                )
            ).alias(f"t{i}")
            for i, s in enumerate(steps)
        ]
    )
    # chain: t0 <= t1 <= ... and t_last - t0 within window; each step's
    # time must exist and follow the previous step's FIRST occurrence.
    # (Approximation note: using first occurrences is the standard
    # "loose ordering" funnel; strict re-ordering per attempt needs
    # sessionized sequences.)
    conds = []
    prev = None
    for i in range(len(steps)):
        c = F.col(f"t{i}").isNotNull()
        if prev is not None:
            c = c & (F.col(f"t{i}") >= F.col(f"t{prev}")) & (
                F.col(f"t{i}") - F.col("t0") <= window_us
            )
        conds.append(c)
        prev = i
    # cumulative prefix flags: reached_i = all conditions 0..i hold
    flags = []
    acc = None
    for i, c in enumerate(conds):
        acc = c if acc is None else (acc & c)
        flags.append(F.when(acc, 1).otherwise(0).alias(f"reached_{i}"))
    reached = per_user.select("user_id", *flags)
    rows = [
        F.sum(F.col(f"reached_{i}")).cast("long").alias(f"n_step_{i}")
        for i in range(len(steps))
    ]
    totals = reached.agg(*rows)
    # long-form output via one explode of the single aggregate row — a
    # union of k selects would embed (and potentially re-execute) the
    # per-user aggregation subtree k times
    entries = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("step"),
                F.lit(s).alias("event_type"),
                F.col(f"n_step_{i}").alias("n_users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return totals.select(F.explode(entries).alias("e")).select(
        "e.step", "e.event_type", "e.n_users"
    )


def retention(events: DataFrame, max_days: int = 7) -> DataFrame:
    """Cohort retention triangle: users grouped by first-activity day,
    counted by day-offset of subsequent activity."""
    days = events.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    first_day = days.groupBy("user_id").agg(
        F.min("day").alias("cohort_day")
    )
    joined = days.join(first_day, on="user_id")
    offset = F.datediff(F.col("day"), F.col("cohort_day")).cast("long")
    return (
        joined.withColumn("day_offset", offset)
        .where(F.col("day_offset") <= max_days)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


__all__ = ["funnel", "retention"]
