"""Twelfth catalog batch: statistical monitoring + SQL front-end.

q100: robust (median/MAD) outlier detection over the events stream —
the standard data-quality monitor for ingest pipelines.
q101: per-user linear trend (closed-form least squares over exact
decimal sums) — drift detection without any ML dependency.
q102: the same engine driven through the SQL front-end (``spark.sql``
text with correlated scalar + EXISTS subqueries) — the catalog is
otherwise DataFrame-built; this pins the SQL-text surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_tables
from .catalog import QueryDef

# q100: robust outlier counts ------------------------------------------------

MAD_K = 3.0


def q100_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: median, MAD (median absolute deviation), and the
    count of rows beyond ``median ± 3·MAD``.

    Robust statistics (median/MAD) survive the heavy tails that make
    mean/stddev monitors useless on revenue-like columns. Scale shape:
    two grouped exact-percentile passes (sort-based within each of the
    handful of event-type groups) + a broadcast join of the tiny
    median table back onto the scan. Exact percentile is the right call
    while groups are few; at extreme per-group cardinality swap in
    ``approx_percentile`` — the operator shape is unchanged. The
    outlier comparison runs on UNROUNDED doubles (identical IEEE inputs
    on both engines); only the reported med/mad are rounded.
    """
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    med = ev.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("_med")
    )
    dev = ev.join(F.broadcast(med), on="event_type").withColumn(
        "_absdev", F.abs(F.col("value") - F.col("_med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.first("_med").alias("_med"),
        F.percentile("_absdev", 0.5).alias("_mad"),
    )
    flagged = dev.drop("_med").join(F.broadcast(mad), on="event_type")
    is_out = (
        F.abs(F.col("value") - F.col("_med")) > F.lit(MAD_K) * F.col("_mad")
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(is_out.cast("long")).cast("long").alias("n_outliers"),
            F.round(F.first("_med"), 6).alias("med"),
            F.round(F.first("_mad"), 6).alias("mad"),
        )
        .select("event_type", "n_rows", "n_outliers", "med", "mad")
    )


ORACLE_Q100 = f"""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS m
  FROM events GROUP BY event_type),
dev AS (
  SELECT e.event_type, e.value, med.m,
         abs(e.value - med.m) AS absdev
  FROM events e JOIN med USING (event_type)),
mad AS (
  SELECT event_type, any_value(m) AS m,
         quantile_cont(absdev, 0.5) AS md
  FROM dev GROUP BY event_type)
SELECT d.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN abs(d.value - mad.m) > {MAD_K} * mad.md
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       round(any_value(mad.m), 6) AS med,
       round(any_value(mad.md), 6) AS mad
FROM dev d JOIN mad USING (event_type)
GROUP BY d.event_type
"""


# q101: per-user linear trend ------------------------------------------------

# fixed epoch offset keeps x small enough that every decimal
# intermediate stays far inside decimal(38) exactness
X_OFFSET = 1_600_000_000


def q101_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form least-squares slope/intercept of ``value`` over time
    per user: drift detection as one grouped aggregation.

    All sums (Σx, Σy, Σxy, Σx²) run in exact decimal — the doubles are
    produced by ONE division at the end, so the result is independent
    of partitioning/addition order (the engine-portability rule every
    float aggregate here follows). Single shuffle on user_id with
    map-side partials; ``regr_slope`` would be one call but aggregates
    doubles in arrival order — not hash-stable.
    """
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    # seconds via integer division of exact microseconds: the engines'
    # second-level epoch functions disagree on fractional-second
    # truncation (observed: DuckDB date_part('epoch') rounds)
    x = (F.expr("unix_micros(ts) div 1000000") - X_OFFSET).cast(
        "decimal(18,0)"
    )
    y = F.col("value").cast("decimal(18,6)")
    base = ev.select("user_id", x.alias("_x"), y.alias("_y"))
    agg = base.groupBy("user_id").agg(
        F.count("*").cast("decimal(18,0)").alias("_n"),
        F.sum("_x").cast("decimal(28,0)").alias("_sx"),
        F.sum("_y").cast("decimal(28,6)").alias("_sy"),
        F.sum(
            (F.col("_x") * F.col("_y")).cast("decimal(30,6)")
        ).cast("decimal(38,6)").alias("_sxy"),
        F.sum(
            (F.col("_x") * F.col("_x")).cast("decimal(30,0)")
        ).cast("decimal(38,0)").alias("_sxx"),
    )
    # products run on the DOUBLE casts of the exact decimal sums: a
    # decimal×decimal product here would exceed precision 38 and the
    # engines cap overflow differently; double arithmetic over
    # identical inputs is bit-identical everywhere
    n_d = F.col("_n").cast("double")
    sx_d = F.col("_sx").cast("double")
    sy_d = F.col("_sy").cast("double")
    num = n_d * F.col("_sxy").cast("double") - sx_d * sy_d
    den = n_d * F.col("_sxx").cast("double") - sx_d * sx_d
    slope = num / den
    intercept = (
        F.col("_sy").cast("double") - slope * F.col("_sx").cast("double")
    ) / F.col("_n").cast("double")
    # ``+ 0.0`` normalizes IEEE negative zero: round() can emit -0.0 in
    # one engine and +0.0 in the other for a slope that rounds to zero
    # (values compare equal, formatted hashes differ).  -0.0 + 0.0 is
    # +0.0 under IEEE 754, so both engines land on the same bit pattern.
    return agg.select(
        "user_id",
        F.col("_n").cast("long").alias("n_events"),
        (F.round(slope, 6) + F.lit(0.0)).alias("slope"),
        (F.round(intercept, 6) + F.lit(0.0)).alias("intercept"),
    )


ORACLE_Q101 = f"""
WITH base AS (
  SELECT user_id,
         CAST(epoch_us(ts) // 1000000 - {X_OFFSET} AS DECIMAL(18,0)) AS x,
         CAST(value AS DECIMAL(18,6)) AS y
  FROM events),
agg AS (
  SELECT user_id,
         CAST(COUNT(*) AS DECIMAL(18,0)) AS n,
         CAST(SUM(x) AS DECIMAL(28,0)) AS sx,
         CAST(SUM(y) AS DECIMAL(28,6)) AS sy,
         CAST(SUM(CAST(x * y AS DECIMAL(30,6))) AS DECIMAL(38,6)) AS sxy,
         CAST(SUM(CAST(x * x AS DECIMAL(30,0))) AS DECIMAL(38,0)) AS sxx
  FROM base GROUP BY user_id),
d AS (
  SELECT user_id,
         CAST(n AS DOUBLE) AS n_d, CAST(sx AS DOUBLE) AS sx_d,
         CAST(sy AS DOUBLE) AS sy_d, CAST(sxy AS DOUBLE) AS sxy_d,
         CAST(sxx AS DOUBLE) AS sxx_d, CAST(n AS BIGINT) AS n_events
  FROM agg)
SELECT user_id, n_events,
       round((n_d * sxy_d - sx_d * sy_d) /
             (n_d * sxx_d - sx_d * sx_d), 6) + 0.0 AS slope,
       round((sy_d - (n_d * sxy_d - sx_d * sy_d) /
                     (n_d * sxx_d - sx_d * sx_d) * sx_d) / n_d, 6) + 0.0
         AS intercept
FROM d
"""


# q102: SQL front-end (correlated scalar + EXISTS subqueries) ----------------

_Q102_SQL = """
SELECT n.n_name,
       (SELECT COUNT(*) FROM customer c
        WHERE c.c_nationkey = n.n_nationkey) AS n_customers,
       (SELECT COUNT(*) FROM supplier s
        WHERE s.s_nationkey = n.n_nationkey) AS n_suppliers
FROM nation n
WHERE EXISTS (SELECT 1 FROM customer c2
              WHERE c2.c_nationkey = n.n_nationkey)
"""


def q102_sql_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries + EXISTS, submitted as SQL TEXT
    against the registered views — Catalyst decorrelates both scalar
    subqueries into left outer aggregations and the EXISTS into a
    semi join (same physical plans the DataFrame API would produce;
    the point is pinning the SQL front-end as a first-class surface).
    """
    load_tables(spark, sf_dir, ["nation", "customer", "supplier"])
    return spark.sql(_Q102_SQL)


# DuckDB runs the identical statement (count() -> BIGINT on both)
ORACLE_Q102 = _Q102_SQL


def batch12_registry() -> list[QueryDef]:
    return [
        QueryDef("q100_robust_outliers", q100_robust_outliers, ORACLE_Q100, "median/MAD robust outlier monitor"),
        QueryDef("q101_trend_slope", q101_trend_slope, ORACLE_Q101, "per-user least-squares trend over exact decimal sums"),
        QueryDef("q102_sql_subqueries", q102_sql_subqueries, ORACLE_Q102, "SQL-text surface: correlated scalar + EXISTS subqueries"),
    ]
