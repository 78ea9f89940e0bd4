"""Fourth catalog batch: deeper TPC-H query shapes (Q7/Q8/Q10/Q18/Q19/Q22
adapted to the fixture schema) plus a window-function suite and
cumulative-distinct analytics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_tables
from .catalog import QueryDef, _dec

_REV = (
    "CAST(l_extendedprice AS DECIMAL(15,4)) * "
    "(CAST(1 AS DECIMAL(15,4)) - CAST(l_discount AS DECIMAL(15,4)))"
)


def _rev_col():
    return _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(15,4)") - _dec("l_discount")
    )


# q50: volume shipping between two nations (TPC-H Q7 shape) ------------------


def q50_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-nation trade flows: supplier nation != customer nation, both
    in a fixed pair — the OR-of-pairs join predicate shape."""
    t = load_tables(
        spark, sf_dir, ["supplier", "lineitem", "orders", "customer", "nation"]
    )
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | (
        (F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3")
    )
    return (
        t["supplier"]
        .join(t["lineitem"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.round(F.sum(_rev_col()), 4).cast("double").alias("revenue"))
    )


ORACLE_Q50 = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
  CAST(year(l_shipdate) AS BIGINT) AS l_year,
  CAST(ROUND(SUM({_REV}), 4) AS DOUBLE) AS revenue
FROM supplier
JOIN lineitem ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
   OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
GROUP BY 1, 2, 3
"""


# q51: market share (TPC-H Q8 shape) ----------------------------------------


def q51_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of one supplier-nation's revenue within a region per year —
    CASE-inside-sum ratio over a 6-way join."""
    t = load_tables(
        spark,
        sf_dir,
        ["region", "nation", "customer", "orders", "lineitem", "supplier"],
    )
    sup_nation = t["nation"].select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("sn_name")
    )
    rev = _rev_col()
    nation_rev = F.when(
        F.col("sn_name") == "NATION_5", rev
    ).otherwise(F.lit(0).cast("decimal(15,4)"))
    joined = (
        t["region"]
        .where(F.col("r_name") == "ASIA")
        .join(t["nation"], F.col("n_regionkey") == F.col("r_regionkey"))
        .join(t["customer"], F.col("c_nationkey") == F.col("n_nationkey"))
        .join(t["orders"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sup_nation), F.col("s_nationkey") == F.col("sn_key"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(nation_rev).cast("double").alias("nation_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
        .select(
            "o_year",
            (
                F.round(
                    F.col("nation_revenue") / F.col("total_revenue"), 6
                )
            ).alias("mkt_share"),
            "nation_revenue",
            "total_revenue",
        )
    )


ORACLE_Q51 = f"""
WITH joined AS (
  SELECT year(o_orderdate) AS o_year,
    {_REV} AS rev,
    CASE WHEN n_sup.n_name = 'NATION_5' THEN {_REV}
         ELSE CAST(0 AS DECIMAL(15,4)) END AS nation_rev
  FROM region
  JOIN nation ON n_regionkey = r_regionkey
  JOIN customer ON c_nationkey = nation.n_nationkey
  JOIN orders ON o_custkey = c_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n_sup ON supplier.s_nationkey = n_sup.n_nationkey
  WHERE r_name = 'ASIA')
SELECT CAST(o_year AS BIGINT) AS o_year,
  round(CAST(SUM(nation_rev) AS DOUBLE) / CAST(SUM(rev) AS DOUBLE), 6)
    AS mkt_share,
  CAST(SUM(nation_rev) AS DOUBLE) AS nation_revenue,
  CAST(SUM(rev) AS DOUBLE) AS total_revenue
FROM joined GROUP BY o_year
"""


# q52: returned-item reporting (TPC-H Q10 shape) ----------------------------


def q52_returned_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir, ["customer", "orders", "lineitem", "nation"]
    )
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .where(
            (F.col("o_orderdate") >= F.lit("1997-01-01"))
            & (F.col("o_orderdate") < F.lit("1997-07-01"))
        )
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_returnflag") == "R")
        .join(
            F.broadcast(t["nation"]),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_rev_col()), 4).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


ORACLE_Q52 = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
  CAST(ROUND(SUM({_REV}), 4) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


# q53: large-volume orders (TPC-H Q18 shape: HAVING + IN subquery) -----------


def q53_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders", "lineitem"])
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("total_qty"))
        .where(F.col("total_qty") > 150)
    )
    return (
        big.join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(t["customer"]),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )


ORACLE_Q53 = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
  CAST(total_qty AS DOUBLE) AS total_qty
FROM (SELECT l_orderkey,
             SUM(CAST(l_quantity AS DECIMAL(15,4))) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(15,4))) > 150) big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
"""


# q54: disjunctive multi-clause predicate (TPC-H Q19 shape) ------------------


def q54_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-ANDs across joined tables — the predicate shape optimizers
    must split into join-condition + residual."""
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    j = t["lineitem"].join(
        F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey")
    )
    clause1 = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("p_size") <= 15)
        & (F.col("l_quantity") >= 1)
        & (F.col("l_quantity") <= 15)
    )
    clause2 = (
        (F.col("p_brand") == "Brand#2")
        & (F.col("p_size") <= 25)
        & (F.col("l_quantity") >= 10)
        & (F.col("l_quantity") <= 25)
    )
    clause3 = (
        (F.col("p_brand") == "Brand#3")
        & (F.col("l_quantity") >= 20)
    )
    return j.where(clause1 | clause2 | clause3).agg(
        F.round(F.sum(_rev_col()), 4).cast("double").alias("revenue"),
        F.count("*").alias("n_lines"),
    )


ORACLE_Q54 = f"""
SELECT CAST(ROUND(SUM({_REV}), 4) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size <= 15
       AND l_quantity >= 1 AND l_quantity <= 15)
   OR (p_brand = 'Brand#2' AND p_size <= 25
       AND l_quantity >= 10 AND l_quantity <= 25)
   OR (p_brand = 'Brand#3' AND l_quantity >= 20)
"""


# q55: global-customer prospects (TPC-H Q22 shape) ---------------------------


def q55_prospect_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers above the positive-balance average with no orders,
    grouped by a derived segment code — scalar subquery + anti join."""
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    c = t["customer"]
    # Scalar subquery as a broadcast 1-row crossJoin: keeps the whole
    # query ONE lazy plan (no eager .collect() job at build time —
    # VERDICT r01 "What's wrong" #3) and the exact pattern scales: the
    # aggregate side is 1 row, broadcast to every task.
    avg_bal = (
        c.where(F.col("c_acctbal") > 0)
        .agg(F.avg(_dec("c_acctbal", 15, 2)).cast("double").alias("_avg_bal"))
    )
    seg = F.substring(F.col("c_name"), -1, 1)
    urgent = t["orders"].where(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(seg.alias("segment"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(_dec("c_acctbal", 15, 2)).cast("double").alias("totacctbal"),
        )
    )


ORACLE_Q55 = """
SELECT substring(c_name, length(c_name), 1) AS segment,
  COUNT(*) AS numcust,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(15,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(AVG(CAST(c_acctbal AS DECIMAL(15,2))) AS DOUBLE)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY 1
"""


# q56: window-function suite -------------------------------------------------


def q56_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dense_rank / percent_rank / first / last / nth over one
    partitioned, fully-ordered window (explicit ROWS frames)."""
    c = load_tables(spark, sf_dir, ["customer"])["customer"]
    order = [F.desc("c_acctbal"), F.asc("c_custkey")]
    w = Window.partitionBy("c_nationkey").orderBy(*order)
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.where(F.col("c_custkey") <= 300).select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.dense_rank().over(w).cast("long").alias("drank"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.first("c_custkey").over(w_all).alias("richest"),
        F.last("c_custkey").over(w_all).alias("poorest"),
        F.nth_value("c_custkey", 2).over(w_all).alias("runner_up"),
    )


ORACLE_Q56 = """
SELECT c_custkey, c_nationkey, c_acctbal,
  DENSE_RANK() OVER w AS drank,
  round(PERCENT_RANK() OVER w, 6) AS prank,
  FIRST_VALUE(c_custkey) OVER w_all AS richest,
  LAST_VALUE(c_custkey) OVER w_all AS poorest,
  NTH_VALUE(c_custkey, 2) OVER w_all AS runner_up
FROM customer WHERE c_custkey <= 300
WINDOW
  w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey),
  w_all AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


# q57: daily new users (cumulative distinct) ---------------------------------


def q57_daily_new_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day: first-seen day per user, then
    a running count — the exact-cumulative-distinct pattern (a naive
    COUNT(DISTINCT) OVER would shuffle the world)."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("first_day")
    )
    daily = first_seen.groupBy("first_day").agg(
        F.count("*").alias("new_users")
    )
    # distributed running sum (ranking.global_running_sum): range-
    # partition + per-partition prefix sums + broadcast offsets — the
    # daily table is calendar-bounded, but the unpartitioned-window
    # form is banned repo-wide (test_plan_hygiene), so use the
    # machinery that scales unconditionally.
    from ..operators.ranking import global_running_sum

    cum = global_running_sum(
        daily, order_cols=["first_day"], value_col="new_users"
    )
    return cum.select(
        F.col("first_day").alias("day"),
        "new_users",
        F.col("running_sum").alias("cumulative_users"),
    )


ORACLE_Q57 = """
WITH first_seen AS (
  SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP) AS first_day
  FROM events GROUP BY user_id),
daily AS (
  SELECT first_day, COUNT(*) AS new_users FROM first_seen GROUP BY first_day)
SELECT first_day AS day, new_users,
  CAST(SUM(new_users) OVER (ORDER BY first_day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       AS BIGINT) AS cumulative_users
FROM daily
"""


# q295: top supplier (TPC-H Q15 shape) ---------------------------------------

_Q15_START, _Q15_END = "1996-01-01", "1996-04-01"


def q295_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (the last fixture-expressible TPC-H query
    form): a revenue view aggregated per supplier over one quarter,
    then the supplier(s) whose revenue EQUALS the global maximum — a
    scalar aggregate over an aggregate, joined back (Catalyst plans
    the max as a broadcast 1-row aggregate; the equality is on exact
    DECIMAL revenue so ties are exact, not float-lucky)."""
    t = load_tables(spark, sf_dir, ["supplier", "lineitem"])
    rev = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= _Q15_START)
            & (F.col("l_shipdate") < _Q15_END)
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev_col()).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    return (
        t["supplier"]
        .join(rev, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("_mx"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


ORACLE_Q295 = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, SUM({_REV}) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= DATE '{_Q15_START}'
    AND l_shipdate < DATE '{_Q15_END}'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


def tpch2_registry() -> list[QueryDef]:
    return [
        QueryDef("q50_volume_shipping", q50_volume_shipping, ORACLE_Q50, "two-nation trade flows (Q7)"),
        QueryDef("q51_market_share", q51_market_share, ORACLE_Q51, "market-share ratio (Q8)"),
        QueryDef("q52_returned_top_customers", q52_returned_top_customers, ORACLE_Q52, "returned-item report (Q10)"),
        QueryDef("q53_big_orders", q53_big_orders, ORACLE_Q53, "HAVING + join (Q18)"),
        QueryDef("q54_disjunctive_filter", q54_disjunctive_filter, ORACLE_Q54, "OR-of-ANDs predicate (Q19)"),
        QueryDef("q55_prospect_segments", q55_prospect_segments, ORACLE_Q55, "scalar subquery + anti join (Q22)"),
        QueryDef("q56_window_suite", q56_window_suite, ORACLE_Q56, "dense/percent_rank, first/last/nth"),
        QueryDef("q57_daily_new_users", q57_daily_new_users, ORACLE_Q57, "cumulative distinct users"),
        QueryDef("q295_top_supplier", q295_top_supplier, ORACLE_Q295, "max-over-aggregate view (Q15)"),
    ]
