"""Batch 56: LATERAL SQL surface, time-weighted averages, in-group
percentile normalization, and ageing buckets.

- q272 LATERAL top-n — per-nation top-2 customers by account balance
  written as a correlated LATERAL subquery and submitted as raw SQL
  TEXT on both engines (Spark's lateral correlated subquery; the
  q215/q243 port-your-script family, now for the for-each-row-of
  idiom). The DataFrame equivalent is topk_per_key; this pins the
  SQL spelling.
- q273 time-weighted average — the metric EWMA doesn't give you:
  Σ value·duration / Σ duration over each user's event timeline
  (value held until the next event). Durations are exact integer
  seconds from a partitioned lead window; value in exact cents; one
  double per user. The balance/exposure metric of finance and ops.
- q274 within-group percentile — per-source percentile normalization
  of document lengths ((rank−1)/(n−1) in the source), the
  score-calibration transform for mixing heterogeneous sources;
  partitioned windows only. Reported per doc for the q105-style
  weighted sampling downstream.
- q275 ageing buckets — the receivables-style ageing report: open
  orders as of 1997-07-01 bucketed by age (0–30/31–90/91–365/365+
  days) with counts and exact cents value. One scan, one tiny
  groupBy."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_tables
from .catalog import QueryDef

# ---------------------------------------------------------------------------
# q272: LATERAL correlated top-n (raw SQL surface)
# ---------------------------------------------------------------------------


def q272_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 customers per nation via a correlated LATERAL subquery,
    as raw SQL text (Spark executes it as a rewritten join under
    Catalyst — DomainJoin + window — so the idiom is scale-safe even
    spelled row-at-a-time). Identical SQL runs on DuckDB."""
    t = load_tables(spark, sf_dir, ["nation", "customer"])
    t["nation"].createOrReplaceTempView("q272_nation")
    t["customer"].createOrReplaceTempView("q272_customer")
    return spark.sql(
        """
        SELECT n_name AS nation, t.c_custkey, t.acctbal_cents
        FROM q272_nation,
        LATERAL (
          SELECT c_custkey,
                 CAST(round(c_acctbal * 100, 0) AS BIGINT) AS acctbal_cents
          FROM q272_customer
          WHERE c_nationkey = n_nationkey
          ORDER BY acctbal_cents DESC, c_custkey
          LIMIT 2
        ) t
        ORDER BY nation, acctbal_cents DESC, c_custkey
        """
    )


ORACLE_Q272 = """
SELECT n_name AS nation, t.c_custkey, t.acctbal_cents
FROM nation,
LATERAL (
  SELECT c_custkey,
         CAST(round(c_acctbal * 100, 0) AS BIGINT) AS acctbal_cents
  FROM customer
  WHERE c_nationkey = n_nationkey
  ORDER BY acctbal_cents DESC, c_custkey
  LIMIT 2
) t
ORDER BY nation, acctbal_cents DESC, c_custkey
"""


# ---------------------------------------------------------------------------
# q273: time-weighted average value per user
# ---------------------------------------------------------------------------


def q273_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted mean event value: each event's value
    (cents) holds from its timestamp to the next event's (lead over a
    user-partitioned window); TWA = Σ cents·seconds / Σ seconds.
    Integer seconds × integer cents accumulate in DECIMAL — exact
    until the one division. Users with a single event (no interval)
    report NULL."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cents = F.expr("CAST(round(value * 100, 0) AS DECIMAL(20,0))").cast(
        "long"
    )
    seg = (
        ev.select(
            "user_id",
            F.unix_timestamp("ts").alias("t"),
            cents.alias("c"),
            F.lead(F.unix_timestamp("ts")).over(w).alias("t_next"),
        )
        .where(F.col("t_next").isNotNull())
        .select(
            "user_id",
            (F.col("t_next") - F.col("t")).cast("long").alias("dur"),
            "c",
        )
    )
    g = seg.groupBy("user_id").agg(
        F.sum("dur").cast("long").alias("total_sec"),
        F.sum(
            F.col("c").cast("decimal(38,0)") * F.col("dur").cast(
                "decimal(38,0)"
            )
        )
        .cast("decimal(38,0)")
        .alias("wsum"),
    )
    d = lambda c: c.cast("double")  # noqa: E731
    return (
        g.where(F.col("total_sec") > 0)
        .select(
            "user_id",
            "total_sec",
            (
                F.round(d(F.col("wsum")) / d(F.col("total_sec")), 4)
                + F.lit(0.0)
            ).alias("twa_cents"),
        )
        .orderBy("user_id")
    )


ORACLE_Q273 = """
WITH seg AS (
  SELECT user_id,
         CAST(date_diff('second', ts,
              LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
              AS BIGINT) AS dur,
         CAST(CAST(round(value * 100, 0) AS DECIMAL(20,0)) AS BIGINT) AS c
  FROM events),
g AS (
  SELECT user_id, CAST(SUM(dur) AS BIGINT) AS total_sec,
         SUM(CAST(c AS HUGEINT) * dur) AS wsum
  FROM seg WHERE dur IS NOT NULL GROUP BY user_id)
SELECT user_id, total_sec,
       round(CAST(wsum AS DOUBLE) / total_sec, 4) + 0.0 AS twa_cents
FROM g WHERE total_sec > 0 ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# q274: within-group percentile normalization
# ---------------------------------------------------------------------------


def q274_within_group_percentile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Percentile-normalize document length WITHIN its source:
    pct = (rank−1)/(n−1) over a source-partitioned total order
    (n_chars, doc_id) — the cross-source score calibration that makes
    heterogeneous quality signals comparable before mixing. Output
    bounded to the top-5 per source by the same partitioned rank (the
    full table is the intermediate a pipeline would keep)."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    w = Window.partitionBy("source").orderBy(
        F.asc("n_chars"), F.asc("doc_id")
    )
    ranked = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number().over(w).cast("long").alias("_rk"),
        F.count("*").over(Window.partitionBy("source")).cast("long").alias(
            "_n"
        ),
    )
    pct = F.when(F.col("_n") > 1,
                 (F.col("_rk") - 1).cast("double")
                 / (F.col("_n") - 1).cast("double")).otherwise(F.lit(0.0))
    return (
        ranked.withColumn("pct", F.round(pct, 6) + F.lit(0.0))
        .where(F.col("_rk") > F.col("_n") - 5)
        .select("source", "doc_id", "n_chars", "pct")
        .orderBy("source", F.desc("pct"), "doc_id")
    )


ORACLE_Q274 = """
WITH ranked AS (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars, doc_id) AS rk,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM documents)
SELECT source, doc_id, n_chars,
       round(CASE WHEN n > 1
                  THEN CAST(rk - 1 AS DOUBLE) / (n - 1)
                  ELSE 0.0 END, 6) + 0.0 AS pct
FROM ranked WHERE rk > n - 5
ORDER BY source, pct DESC, doc_id
"""


# ---------------------------------------------------------------------------
# q275: ageing buckets
# ---------------------------------------------------------------------------

_AGE_ASOF = "1997-07-01"


def q275_ageing_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open orders ('O') as of 1997-07-01, bucketed by age: the
    receivables ageing report. Age = days from order date to the
    as-of date; buckets 0-30/31-90/91-365/365+; counts and exact
    cents per bucket. One scan with the filter pushed down."""
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    cents = F.expr("CAST(round(o_totalprice * 100, 0) AS DECIMAL(20,0))").cast(
        "long"
    )
    age = F.datediff(F.lit(_AGE_ASOF).cast("date"), F.to_date("o_orderdate"))
    bucket = (
        F.when(age <= 30, F.lit("0-30"))
        .when(age <= 90, F.lit("31-90"))
        .when(age <= 365, F.lit("91-365"))
        .otherwise(F.lit("365+"))
    )
    return (
        o.where(
            (F.col("o_orderstatus") == "O")
            & (F.to_date("o_orderdate") <= F.lit(_AGE_ASOF).cast("date"))
        )
        .select(bucket.alias("age_bucket"), cents.alias("c"))
        .groupBy("age_bucket")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("c").cast("long").alias("open_cents"),
        )
        .orderBy("age_bucket")
    )


ORACLE_Q275 = f"""
SELECT CASE WHEN age <= 30 THEN '0-30'
            WHEN age <= 90 THEN '31-90'
            WHEN age <= 365 THEN '91-365'
            ELSE '365+' END AS age_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(c) AS BIGINT) AS open_cents
FROM (
  SELECT date_diff('day', CAST(o_orderdate AS DATE), DATE '{_AGE_ASOF}')
           AS age,
         CAST(CAST(round(o_totalprice * 100, 0) AS DECIMAL(20,0)) AS BIGINT)
           AS c
  FROM orders
  WHERE o_orderstatus = 'O'
    AND CAST(o_orderdate AS DATE) <= DATE '{_AGE_ASOF}')
GROUP BY 1 ORDER BY 1
"""


def batch56_registry() -> list[QueryDef]:
    return [
        QueryDef("q272_lateral_topn", q272_lateral_topn, ORACLE_Q272,
                 "correlated LATERAL top-n via the raw-SQL path"),
        QueryDef("q273_time_weighted_avg", q273_time_weighted_avg,
                 ORACLE_Q273,
                 "time-weighted mean value per user, exact segments"),
        QueryDef("q274_within_group_percentile",
                 q274_within_group_percentile, ORACLE_Q274,
                 "per-source percentile score normalization"),
        QueryDef("q275_ageing_buckets", q275_ageing_buckets, ORACLE_Q275,
                 "open-order ageing report, exact cents"),
    ]
