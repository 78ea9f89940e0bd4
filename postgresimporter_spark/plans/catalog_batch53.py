"""Batch 53: numeric profiling, forecast backtesting, and growth
accounting.

- q260 correlation matrix — pairwise Pearson over lineitem's numeric
  columns (quantity, extendedprice-cents, discount-pct, tax-pct):
  ONE scan computes every Σx/Σxy sufficient statistic (map-side
  partial), the 6 pair correlations derive from exact longs with the
  DECIMAL cross-product helper — the column-profiling step of every
  EDA/feature pipeline, at any row count.
- q261 MASE backtest — seasonal-naive forecast accuracy on the daily
  order series: forecast(t) = y(t−7), MASE = MAE(forecast) /
  MAE(naive-1), both MAEs exact integer sums over partitioned lag
  windows. The standard scale-free forecast-quality readout.
- q262 LTV triangle — cohort-month × age-month revenue (the growth
  accounting table): customers cohort by first order month; revenue
  lands in exact cents at (cohort, age); cumulative LTV per cohort
  rides a cohort-partitioned running sum. Two aggregations + one
  partitioned window.
- q263 time-to-convert — per-user first 'view' -> first 'purchase'
  latency, with EXACT nearest-rank p25/p50/p90 over the latency
  distribution read off one distributed prefix pass (rank =
  ceil(q·N) rows — no collect, no unpartitioned percentile window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.ranking import global_running_sum
from ..sources.parquet import load_tables
from .catalog import QueryDef

# ---------------------------------------------------------------------------
# q260: pairwise Pearson correlation matrix
# ---------------------------------------------------------------------------

_CORR_COLS = (
    ("quantity", "CAST(l_quantity AS BIGINT)"),
    ("price_cents", "CAST(round(l_extendedprice * 100, 0) AS BIGINT)"),
    ("discount_pct", "CAST(round(l_discount * 100, 0) AS BIGINT)"),
    ("tax_pct", "CAST(round(l_tax * 100, 0) AS BIGINT)"),
)


def q260_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All C(4,2) Pearson correlations from one scan: per pair the
    n/Σx/Σy/Σxy/Σx²/Σy² stats are exact longs (integer-encoded
    columns), cross-products run in DECIMAL, one double per pair.
    The output is the long-form (col_a, col_b, corr) matrix."""
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    base = li.select(
        *[F.expr(e).alias(n) for n, e in _CORR_COLS]
    )
    aggs = [F.count("*").cast("long").alias("n")]
    names = [n for n, _ in _CORR_COLS]
    for n in names:
        aggs.append(F.sum(n).cast("long").alias(f"s_{n}"))
        aggs.append(
            F.sum(
                F.col(n).cast("decimal(38,0)") * F.col(n).cast("decimal(38,0)")
            )
            .cast("decimal(38,0)")
            .alias(f"ss_{n}")
        )
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            aggs.append(
                F.sum(
                    F.col(a).cast("decimal(38,0)")
                    * F.col(b).cast("decimal(38,0)")
                )
                .cast("decimal(38,0)")
                .alias(f"sp_{a}_{b}")
            )
    g = base.agg(*aggs)
    d = lambda c: c.cast("double")  # noqa: E731
    pairs = []
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            cov = d(F.col("n")) * d(F.col(f"sp_{a}_{b}")) - d(
                F.col(f"s_{a}")
            ) * d(F.col(f"s_{b}"))
            va = d(F.col("n")) * d(F.col(f"ss_{a}")) - d(
                F.col(f"s_{a}")
            ) * d(F.col(f"s_{a}"))
            vb = d(F.col("n")) * d(F.col(f"ss_{b}")) - d(
                F.col(f"s_{b}")
            ) * d(F.col(f"s_{b}"))
            pairs.append(
                F.struct(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    # nullif (r13 one-row sweep): zero variance makes
                    # the correlation undefined — ANSI mode raised
                    # DIVIDE_BY_ZERO at n=1, where DuckDB's x/0.0
                    # returns NULL; nullif matches the oracle exactly
                    (
                        F.round(
                            cov / F.nullif(F.sqrt(va * vb), F.lit(0.0)), 6
                        )
                        + F.lit(0.0)
                    ).alias("corr"),
                )
            )
    return (
        g.select(F.explode(F.array(*pairs)).alias("p"))
        .select("p.col_a", "p.col_b", "p.corr")
        .orderBy("col_a", "col_b")
    )


def _corr_oracle() -> str:
    names = [n for n, _ in _CORR_COLS]
    exprs = ", ".join(f"{e} AS {n}" for n, e in _CORR_COLS)
    stat_sql = ["CAST(COUNT(*) AS BIGINT) AS n"]
    for n in names:
        stat_sql.append(f"CAST(SUM({n}) AS BIGINT) AS s_{n}")
        stat_sql.append(f"SUM(CAST({n} AS HUGEINT) * {n}) AS ss_{n}")
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            stat_sql.append(
                f"SUM(CAST({a} AS HUGEINT) * {b}) AS sp_{a}_{b}"
            )
    sel = []
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            sel.append(f"""
SELECT '{a}' AS col_a, '{b}' AS col_b,
       round((CAST(n AS DOUBLE) * CAST(sp_{a}_{b} AS DOUBLE)
              - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(ss_{a} AS DOUBLE)
                     - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(ss_{b} AS DOUBLE)
                       - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE))),
             6) + 0.0 AS corr
FROM g""")
    return (
        f"WITH base AS (SELECT {exprs} FROM lineitem),\n"
        f"g AS (SELECT {', '.join(stat_sql)} FROM base)\n"
        + " UNION ALL ".join(sel)
        + " ORDER BY col_a, col_b"
    )


ORACLE_Q260 = _corr_oracle()


# ---------------------------------------------------------------------------
# q261: seasonal-naive MASE forecast backtest
# ---------------------------------------------------------------------------

_MASE_SEASON = 7


def q261_mase_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-free forecast accuracy of the weekly-seasonal-naive model
    on the daily order-count series: errors |y(t) − y(t−7)| and the
    naive denominator |y(t) − y(t−1)| are exact integer sums. The
    daily rollup is metadata-sized by construction (days, not rows),
    so the lags read off a BOUNDED in-row sorted array (q258's
    layout) — no unpartitioned window anywhere; at scale a per-key
    series would use partitioned lag windows instead. MASE < 1 means
    the seasonal model beats the naive random walk."""
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count("*").cast("long").alias("y")
    )
    arr = daily.agg(
        F.sort_array(
            F.collect_list(
                F.struct(F.col("day").alias("d"), F.col("y").alias("y"))
            )
        ).alias("a")
    )
    ys = F.transform(F.col("_a"), lambda e: e["y"])
    scored = (
        arr.select(
            F.posexplode("a").alias("pos", "e"), F.col("a").alias("_a")
        )
        .where(F.col("pos") >= _MASE_SEASON)
        .select(
            F.abs(
                F.col("e.y")
                - F.element_at(ys, F.col("pos") + 1 - _MASE_SEASON)
            ).alias("e_season"),
            F.abs(
                F.col("e.y") - F.element_at(ys, F.col("pos"))
            ).alias("e_naive"),
        )
    )
    g = scored.agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("e_season").cast("long").alias("sae_seasonal"),
        F.sum("e_naive").cast("long").alias("sae_naive"),
    )
    d = lambda c: c.cast("double")  # noqa: E731
    return g.select(
        "n_days",
        "sae_seasonal",
        "sae_naive",
        (
            F.round(d(F.col("sae_seasonal")) / d(F.col("sae_naive")), 6)
            + F.lit(0.0)
        ).alias("mase"),
    )


ORACLE_Q261 = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM orders GROUP BY 1),
lagged AS (
  SELECT y,
         LAG(y, {_MASE_SEASON}) OVER (ORDER BY day) AS y_season,
         LAG(y, 1) OVER (ORDER BY day) AS y_prev
  FROM daily),
scored AS (
  SELECT abs(y - y_season) AS e_season, abs(y - y_prev) AS e_naive
  FROM lagged WHERE y_season IS NOT NULL AND y_prev IS NOT NULL)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(e_season) AS BIGINT) AS sae_seasonal,
       CAST(SUM(e_naive) AS BIGINT) AS sae_naive,
       round(CAST(SUM(e_season) AS DOUBLE) / SUM(e_naive), 6) + 0.0 AS mase
FROM scored
"""


# ---------------------------------------------------------------------------
# q262: cohort LTV triangle
# ---------------------------------------------------------------------------


def q262_ltv_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth-accounting revenue triangle: cohort = the customer's
    first order month, age = months since cohort; (cohort, age) cells
    hold exact revenue cents and ordering customers; cumulative LTV
    per cohort rides a cohort-PARTITIONED running sum. The customer
    cohort table is one argmin aggregation; no window touches raw
    orders."""
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    cents = F.expr("CAST(round(o_totalprice * 100, 0) AS DECIMAL(20,0))").cast(
        "long"
    )
    month = F.trunc(F.to_date("o_orderdate"), "month")
    cohort = (
        o.groupBy("o_custkey")
        .agg(F.min(month).alias("cohort_month"))
    )
    cells = (
        o.select("o_custkey", month.alias("m"), cents.alias("c"))
        .join(cohort, on="o_custkey")
        .groupBy(
            "cohort_month",
            (
                (F.year("m") - F.year("cohort_month")) * 12
                + (F.month("m") - F.month("cohort_month"))
            )
            .cast("long")
            .alias("age_months"),
        )
        .agg(
            F.countDistinct("o_custkey").cast("long").alias("n_customers"),
            F.sum("c").cast("long").alias("revenue_cents"),
        )
    )
    w = (
        Window.partitionBy("cohort_month")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return cells.select(
        "cohort_month",
        "age_months",
        "n_customers",
        "revenue_cents",
        F.sum("revenue_cents").over(w).cast("long").alias("cum_ltv_cents"),
    ).orderBy("cohort_month", "age_months")


ORACLE_Q262 = """
WITH cohort AS (
  SELECT o_custkey,
         MIN(date_trunc('month', CAST(o_orderdate AS DATE))) AS cohort_month
  FROM orders GROUP BY 1),
cells AS (
  SELECT cohort_month,
         CAST((year(date_trunc('month', CAST(o_orderdate AS DATE)))
               - year(cohort_month)) * 12
              + (month(date_trunc('month', CAST(o_orderdate AS DATE)))
                 - month(cohort_month)) AS BIGINT) AS age_months,
         CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS DECIMAL(20,0)))
              AS BIGINT) AS revenue_cents
  FROM orders o JOIN cohort c ON o.o_custkey = c.o_custkey
  GROUP BY 1, 2)
SELECT CAST(cohort_month AS DATE) AS cohort_month, age_months, n_customers,
       revenue_cents,
       CAST(SUM(revenue_cents) OVER (PARTITION BY cohort_month
                                     ORDER BY age_months
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_ltv_cents
FROM cells ORDER BY cohort_month, age_months
"""


# ---------------------------------------------------------------------------
# q263: time-to-convert percentiles
# ---------------------------------------------------------------------------

_TTC_QS = (25, 50, 90)


def q263_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-view -> first-purchase latency distribution with EXACT
    nearest-rank percentiles: per-user latencies (one aggregation),
    then ONE distributed prefix pass ranks them and the p25/p50/p90
    rows are selected at rank == ceil(q·N) — no collect, no global
    percentile window, any N."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    per = (
        ev.where(F.col("event_type").isin("view", "purchase"))
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "view", F.col("ts"))
            ).alias("first_view"),
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("ts"))
            ).alias("first_purchase"),
        )
        .where(
            F.col("first_view").isNotNull()
            & F.col("first_purchase").isNotNull()
            & (F.col("first_purchase") >= F.col("first_view"))
        )
        .select(
            (
                F.unix_timestamp("first_purchase")
                - F.unix_timestamp("first_view")
            )
            .cast("long")
            .alias("latency_sec")
        )
    )
    ranked = global_running_sum(
        per.withColumn("_one", F.lit(1).cast("long")),
        [F.asc("latency_sec")],
        "_one",
        idx_col="_rk",
        rsum_col="_rs",
        total_col="_N",
    )
    conds = [
        F.when(
            F.col("_rk")
            == F.ceil(F.lit(q / 100.0) * F.col("_N")).cast("long"),
            F.lit(q),
        )
        for q in _TTC_QS
    ]
    return (
        ranked.withColumn("percentile", F.coalesce(*conds))
        .where(F.col("percentile").isNotNull())
        .select(
            F.col("percentile").cast("long").alias("percentile"),
            "latency_sec",
            F.col("_N").cast("long").alias("n_converters"),
        )
        .orderBy("percentile")
    )


ORACLE_Q263 = f"""
WITH per AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS fv,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS fp
  FROM events WHERE event_type IN ('view', 'purchase')
  GROUP BY user_id),
lat AS (
  SELECT CAST(date_diff('second', fv, fp) AS BIGINT) AS latency_sec
  FROM per
  WHERE fv IS NOT NULL AND fp IS NOT NULL AND fp >= fv),
ranked AS (
  SELECT latency_sec,
         ROW_NUMBER() OVER (ORDER BY latency_sec) AS rk,
         COUNT(*) OVER () AS N
  FROM lat)
SELECT q AS percentile, latency_sec, CAST(N AS BIGINT) AS n_converters
FROM ranked, (SELECT CAST(unnest([{", ".join(str(q) for q in _TTC_QS)}]) AS BIGINT) AS q)
WHERE rk = CAST(ceil(q / 100.0 * N) AS BIGINT)
ORDER BY percentile
"""


def batch53_registry() -> list[QueryDef]:
    return [
        QueryDef("q260_correlation_matrix", q260_correlation_matrix,
                 ORACLE_Q260,
                 "pairwise Pearson matrix from one exact-stats scan"),
        QueryDef("q261_mase_backtest", q261_mase_backtest, ORACLE_Q261,
                 "seasonal-naive MASE forecast backtest, exact MAEs"),
        QueryDef("q262_ltv_triangle", q262_ltv_triangle, ORACLE_Q262,
                 "cohort x age revenue triangle with cumulative LTV"),
        QueryDef("q263_time_to_convert", q263_time_to_convert, ORACLE_Q263,
                 "exact nearest-rank conversion-latency percentiles"),
    ]
