"""Batch 38: active-user accounting.

q212 DAU / WAU / stickiness — the product-analytics headline metric.
Exact sliding-window distinct counting: the distinct (user, day)
pairs fan out to the ≤7 trailing windows they keep alive (a bounded
explode — the exact counterpart to merging 7 daily HLL registers when
approximate is acceptable at 100 TB), one count-distinct per window
day, and stickiness = 1e6·DAU div WAU in integer micro-units.
Only days observed in the data are reported (gap-fill with
``time_bucket_gapfill`` when calendar-complete output is needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_tables
from .catalog import QueryDef

_WIN = 7  # trailing window, days


def q212_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per observed day: DAU, trailing-7-day WAU, and the DAU/WAU
    stickiness ratio in micro-units. The (user, day) distinct pairs
    explode to the 7 window-end days they contribute to — bounded
    fanout, then exact count-distinct per window key; both engines
    agree bit-for-bit."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    ud = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    dau = ud.groupBy("day").agg(
        F.count_distinct("user_id").cast("long").alias("dau")
    )
    fanned = ud.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day"),
                F.col("day") + F.expr(f"INTERVAL {_WIN - 1} DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("wday"),
    )
    wau = fanned.groupBy("wday").agg(
        F.count_distinct("user_id").cast("long").alias("wau")
    )
    return (
        dau.join(wau, dau["day"] == wau["wday"])
        .select(
            "day",
            "dau",
            "wau",
            F.expr("(1000000 * dau) div wau")
            .cast("long").alias("stickiness_micro"),
        )
    )


ORACLE_Q212 = f"""
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
  FROM events),
dau AS (
  SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
  FROM ud GROUP BY day),
fanned AS (
  SELECT user_id, day + INTERVAL (i.i) DAY AS wday
  FROM ud, UNNEST(generate_series(0, {_WIN - 1})) AS i(i)),
wau AS (
  SELECT wday, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
  FROM fanned GROUP BY wday)
SELECT dau.day, dau.dau, wau.wau,
       CAST((1000000 * dau.dau) // wau.wau AS BIGINT) AS stickiness_micro
FROM dau JOIN wau ON dau.day = wau.wday
"""


def batch38_registry() -> list[QueryDef]:
    return [
        QueryDef("q212_active_users", q212_active_users, ORACLE_Q212,
                 "DAU / trailing-7d WAU / stickiness, exact"),
    ]
