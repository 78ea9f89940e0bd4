"""Batch 81: multi-level (binned) interval join — the mixed-duration
maintenance-window shape.

Round-11 maintenance-rule trigger (b), scale-failure repro (recorded
in BUILD_NOTES round 10 as the "round-11 probe pointer", the one
measured UNFIXED scale failure the r10 program left): single-level
``interval_join`` has no good granularity when interval durations are
mixed. Measured on 2M points / 2,000 ten-minute intervals / 200
year-long maintenance windows:

* fine buckets (60s): each year-long interval materialized a
  525,600-element in-row ``F.sequence`` array before exploding — the
  probe OOM'd an 8g heap before the join ran (r10 converted that into
  a loud ``max_buckets_per_interval`` raise, so legitimate year-long
  input ERRORED);
* coarse buckets (10d): with keyed semantics every short interval plus
  all 2M points funneled into ~37 global buckets.

The multi-resolution rewrite (``interval_join(multi_level=True)``,
``operators/temporal.py``) removes the global knob: each interval
lands at the bucket level matching its own duration (<= 2 bucket rows
at any duration), points probe one bucket per level present. The same
probe now completes in ~7.6s on the same heap with the guarded
single-level path still raising in 0.6s, and a 1%-sample brute-force
join is pair-identical.

q330 pins the semantics externally on the standard events fixture with
a genuinely mixed interval corpus — the top-20 error events each open
a 10-MINUTE incident window, plus three 400-DAY maintenance windows
anchored at the corpus start (the exact shape the r10 guard rejected).
The DuckDB oracle replays the PLAIN range-predicate join, so any
level-assignment, bucket-boundary, or probe-set error in the
decomposition is an external value mismatch, not a unit-test artifact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import QueryDef, _dec

N_SHORT_INCIDENTS = 20
SHORT_MINUTES = 10
N_LONG_WINDOWS = 3
LONG_DAYS = 400


def q330_interval_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event counts inside a MIXED-duration interval corpus (20
    ten-minute incidents + 3 four-hundred-day maintenance windows)
    via the multi-level bucketed interval join at 60s base
    granularity: minutes-long intervals land at level ~4, the 400-day
    windows at level ~20, each exploding into <= 2 bucket rows; points
    probe one bucket per level. The single-level path REJECTS this
    corpus (a 400-day interval at 60s buckets exceeds the
    bucket-budget guard), which is exactly the gap q330 pins closed."""
    from ..operators import temporal as TP
    from ..sources.parquet import load_tables

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    short = (
        ev.where(F.col("event_type") == "error")
        .orderBy(F.desc("value"), F.asc("event_id"))
        .limit(N_SHORT_INCIDENTS)
        .select(
            F.col("event_id").alias("incident_id"),
            F.col("ts").alias("start_ts"),
            (F.col("ts") + F.expr(f"INTERVAL {SHORT_MINUTES} MINUTES")).alias(
                "end_ts"
            ),
        )
    )
    long_windows = (
        spark.range(N_LONG_WINDOWS)
        .crossJoin(ev.agg(F.min("ts").alias("_mn")))
        .select(
            (F.lit(-1) - F.col("id")).alias("incident_id"),
            (
                F.col("_mn") + F.make_interval(days=F.col("id").cast("int"))
            ).alias("start_ts"),
            (
                F.col("_mn")
                + F.make_interval(days=(F.col("id") + LONG_DAYS).cast("int"))
            ).alias("end_ts"),
        )
    )
    intervals = short.unionByName(long_windows)
    joined = TP.interval_join(
        ev.select("ts", "value"),
        intervals,
        point_ts="ts",
        start_col="start_ts",
        end_col="end_ts",
        granularity_s=60,
        broadcast_intervals=True,
        multi_level=True,
    )
    return joined.groupBy("incident_id", "start_ts").agg(
        F.count("*").alias("n_events"),
        F.sum(_dec("value")).cast("double").alias("sum_value"),
    )


ORACLE_Q330 = f"""
WITH shrt AS (
  SELECT event_id AS incident_id, ts AS start_ts,
         ts + INTERVAL {SHORT_MINUTES} MINUTE AS end_ts
  FROM events WHERE event_type = 'error'
  ORDER BY value DESC, event_id LIMIT {N_SHORT_INCIDENTS}),
lng AS (
  SELECT CAST(-1 - j AS BIGINT) AS incident_id,
         mn + to_days(CAST(j AS INTEGER)) AS start_ts,
         mn + to_days(CAST(j + {LONG_DAYS} AS INTEGER)) AS end_ts
  FROM (SELECT MIN(ts) AS mn FROM events),
       (SELECT unnest(range({N_LONG_WINDOWS})) AS j)),
inc AS (SELECT * FROM shrt UNION ALL SELECT * FROM lng)
SELECT incident_id, start_ts, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(15,4))) AS DOUBLE) AS sum_value
FROM inc JOIN events e ON e.ts >= inc.start_ts AND e.ts < inc.end_ts
GROUP BY 1, 2
"""


def batch81_registry() -> list[QueryDef]:
    return [
        QueryDef(
            "q330_interval_mixed",
            q330_interval_mixed,
            ORACLE_Q330,
            "multi-level interval join on a mixed minute+year corpus",
        ),
    ]
