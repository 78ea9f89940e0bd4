"""Batch 17: table-maintenance tier — snapshot diff (CDC-style change
classification), single-pass column profiling, and declarative
constraint validation (operators/diffops.py).

Net-new engine surface: the reference loads CSVs into Postgres and
stops (``/root/reference/postgresimporter/main.py``); re-load
monitoring ("what changed since yesterday?", "is the load valid?") is
what an operator of that pipeline does next, by hand, in SQL.  These
make it a first-class distributed operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.diffops import (
    check_constraints,
    profile_table,
    rule_foreign_key,
    rule_in_set,
    rule_not_null,
    rule_range,
    rule_unique,
    snapshot_diff,
)
from ..sources.parquet import load_tables
from .catalog import QueryDef

# q114: snapshot diff ---------------------------------------------------------


def q114_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two deterministic snapshots carved from ``orders`` (old drops
    keys %7==0, new drops keys %9==0 and flips the status of keys
    %5==0), classified added/removed/changed/unchanged and rolled up.

    The diff itself (operators/diffops.py) joins 16-byte row hashes,
    not payloads — at 100 TB the shuffle is O(keys), independent of
    table width.  The oracle classifies by comparing the actual column
    values; hash vs value classification agreeing IS the check.
    """
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    old = orders.where(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = orders.where(F.col("o_orderkey") % 9 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        "o_totalprice",
    )
    diff = snapshot_diff(
        old, new, keys=["o_orderkey"],
        compare_cols=["o_orderstatus", "o_totalprice"],
    )
    return diff.groupBy("change_type").agg(
        F.count("*").cast("long").alias("n_keys"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


ORACLE_Q114 = """
WITH old AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 7 <> 0),
new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END
           AS o_orderstatus,
         o_totalprice
  FROM orders WHERE o_orderkey % 9 <> 0),
d AS (
  SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS k,
         CASE WHEN o.o_orderkey IS NULL THEN 'added'
              WHEN n.o_orderkey IS NULL THEN 'removed'
              WHEN o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
               AND o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
                THEN 'unchanged'
              ELSE 'changed' END AS change_type
  FROM old o FULL JOIN new n ON o.o_orderkey = n.o_orderkey)
SELECT change_type,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       MIN(k) AS min_key,
       MAX(k) AS max_key
FROM d
GROUP BY change_type
"""


# q115: single-pass column profile --------------------------------------------

PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]


def q115_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of ``orders`` — one aggregate job computes null
    count / exact distinct / min / max for every column, then ``stack``
    unpivots to one report row per column (no per-column scan loop, no
    driver-side iteration)."""
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    return profile_table(orders, PROFILE_COLS)


ORACLE_Q115 = """
SELECT 'o_orderkey' AS "column",
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) FILTER (WHERE o_orderkey IS NULL) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
       CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
       CAST(MAX(o_orderkey) AS VARCHAR) AS max_value
FROM orders
UNION ALL
SELECT 'o_custkey',
       CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT),
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
       CAST(MIN(o_custkey) AS VARCHAR),
       CAST(MAX(o_custkey) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderstatus',
       CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) FILTER (WHERE o_orderstatus IS NULL) AS BIGINT),
       CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
       MIN(o_orderstatus),
       MAX(o_orderstatus)
FROM orders
UNION ALL
SELECT 'o_orderpriority',
       CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) FILTER (WHERE o_orderpriority IS NULL) AS BIGINT),
       CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
       MIN(o_orderpriority),
       MAX(o_orderpriority)
FROM orders
"""


# q116: constraint validation -------------------------------------------------


def q116_check_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation suite over ``orders``: scan-foldable rules (not-null,
    set membership, range, uniqueness) collapse into ONE aggregate pass;
    the referential rule is a broadcast anti-join against a filtered
    ``customer`` parent (filtered so real orphans exist at any SF).
    Output is metadata-scale: one (rule, violations) row per rule."""
    t = load_tables(spark, sf_dir, ["orders", "customer"])
    orders, customer = t["orders"], t["customer"]
    parent = customer.where(F.col("c_custkey") % 3 == 0)
    rules = [
        rule_not_null("orderkey_not_null", "o_orderkey"),
        rule_in_set("status_known", "o_orderstatus", ["O", "F"]),
        rule_range("price_range", "o_totalprice", low=0.0, high=300000.0),
        rule_unique("orderkey_unique", ["o_orderkey"]),
        rule_unique("custkey_unique", ["o_custkey"]),
        rule_foreign_key(
            "custkey_fk_mod3", ["o_custkey"], parent, ["c_custkey"]
        ),
    ]
    return check_constraints(orders, rules)


ORACLE_Q116 = """
SELECT 'orderkey_not_null' AS rule,
       CAST(COUNT(*) FILTER (WHERE o_orderkey IS NULL) AS BIGINT)
         AS violations
FROM orders
UNION ALL
SELECT 'status_known',
       CAST(COUNT(*) FILTER (WHERE o_orderstatus IS NULL
                             OR o_orderstatus NOT IN ('O', 'F')) AS BIGINT)
FROM orders
UNION ALL
SELECT 'price_range',
       CAST(COUNT(*) FILTER (WHERE o_totalprice IS NULL
                             OR o_totalprice < 0.0
                             OR o_totalprice > 300000.0) AS BIGINT)
FROM orders
UNION ALL
SELECT 'orderkey_unique',
       CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
FROM orders
UNION ALL
SELECT 'custkey_unique',
       CAST(COUNT(*) - COUNT(DISTINCT o_custkey) AS BIGINT)
FROM orders
UNION ALL
SELECT 'custkey_fk_mod3',
       CAST(COUNT(*) FILTER (WHERE o_custkey IS NOT NULL
                             AND NOT EXISTS (
                               SELECT 1 FROM customer c
                               WHERE c.c_custkey % 3 = 0
                                 AND c.c_custkey = o_custkey)) AS BIGINT)
FROM orders
"""


def batch17_registry() -> list[QueryDef]:
    return [
        QueryDef("q114_snapshot_diff", q114_snapshot_diff, ORACLE_Q114, "hash-join snapshot diff: added/removed/changed/unchanged"),
        QueryDef("q115_profile_table", q115_profile_table, ORACLE_Q115, "single-pass stacked column profile"),
        QueryDef("q116_check_constraints", q116_check_constraints, ORACLE_Q116, "scan-folded constraint validation"),
    ]
