"""Seventh catalog batch: range-frame windows, regexp surface, and
edit-distance fuzzy matching (record linkage)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_tables
from .catalog import QueryDef, _dec

# q78: rolling time-range window ---------------------------------------------


def q78_rolling_7day_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer rolling 7-day order total: RANGE frame over epoch
    seconds (a ROWS frame would be wrong — multiple orders can share a
    day, and gaps matter)."""
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    # orderdate is TIMESTAMP_NTZ; cast to TIMESTAMP (session=UTC, so the
    # wall clock IS the instant) for unix_micros
    epoch_s = (
        F.unix_micros(F.col("o_orderdate").cast("timestamp"))
        / F.lit(1_000_000)
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("epoch_s"))
        .rangeBetween(-7 * 86400, 0)
    )
    return (
        o.where(F.col("o_custkey") <= 100)
        .withColumn("epoch_s", epoch_s.cast("long"))
        .select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.sum(_dec("o_totalprice"))
            .over(w)
            .cast("double")
            .alias("rolling_7d_total"),
            F.count("*").over(w).alias("rolling_7d_orders"),
        )
    )


ORACLE_Q78 = """
SELECT o_custkey, o_orderkey, o_orderdate,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(15,4))) OVER w AS DOUBLE)
    AS rolling_7d_total,
  COUNT(*) OVER w AS rolling_7d_orders
FROM orders WHERE o_custkey <= 100
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY CAST(floor(epoch(o_orderdate)) AS BIGINT)
             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
"""


# q79: regexp surface --------------------------------------------------------


def q79_regexp_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract / regexp_replace / rlike / regexp_count parity."""
    c = load_tables(spark, sf_dir, ["customer"])["customer"]
    name = F.col("c_name")
    return c.where(F.col("c_custkey") <= 300).select(
        "c_custkey",
        F.regexp_extract(name, r"(\d+)$", 1).alias("trailing_digits"),
        F.regexp_replace(name, r"\d", "#").alias("masked"),
        name.rlike(r"^Customer").alias("is_customer_prefixed"),
        F.regexp_count(name, F.lit(r"[0-9]")).cast("long").alias("n_digits"),
        F.split(name, r"#").getItem(0).alias("before_hash"),
    )


ORACLE_Q79 = """
SELECT c_custkey,
  regexp_extract(c_name, '(\\d+)$', 1) AS trailing_digits,
  regexp_replace(c_name, '\\d', '#', 'g') AS masked,
  regexp_matches(c_name, '^Customer') AS is_customer_prefixed,
  CAST(len(regexp_extract_all(c_name, '[0-9]')) AS BIGINT) AS n_digits,
  string_split_regex(c_name, '#')[1] AS before_hash
FROM customer WHERE c_custkey <= 300
"""


# q80: edit-distance fuzzy matching ------------------------------------------


def q80_fuzzy_name_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage by Levenshtein distance via the q-gram count
    filter (operators/linkage.py): candidates come from an equi-join on
    character bigrams — never an all-pairs or degenerate-block join —
    and the filter is lossless, so the oracle below states the naive
    quadratic definition while this plan stays sub-quadratic
    (VERDICT r01 fix: length(name) blocking was the whole table on
    fixed-width names)."""
    from ..operators.linkage import edit_distance_pairs

    c = load_tables(spark, sf_dir, ["customer"])["customer"]
    small = c.where(F.col("c_custkey") <= 150).select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name")
    )
    return edit_distance_pairs(
        small, id_col="id", text_col="name", max_dist=2, q=2
    )


ORACLE_Q80 = """
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS edit_distance
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE a.c_custkey <= 150 AND b.c_custkey <= 150
  AND levenshtein(a.c_name, b.c_name) <= 2
"""


def batch7_registry() -> list[QueryDef]:
    return [
        QueryDef("q78_rolling_7day_totals", q78_rolling_7day_totals, ORACLE_Q78, "RANGE-frame rolling window"),
        QueryDef("q79_regexp_functions", q79_regexp_functions, ORACLE_Q79, "regexp surface"),
        QueryDef("q80_fuzzy_name_links", q80_fuzzy_name_links, ORACLE_Q80, "Levenshtein record linkage"),
    ]
