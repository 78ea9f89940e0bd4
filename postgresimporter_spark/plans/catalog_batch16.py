"""Batch 16: modern-source tier — VARIANT semi-structured access,
SCD2 interval builds, incremental aggregate maintenance, and
leakage-safe grouped splits.  (The XML source lands alongside in
sources/xml.py with golden tests; no tabular oracle applies to a file
format.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_tables
from .catalog import QueryDef

# q110: VARIANT semi-structured access ---------------------------------------


def q110_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event props through Spark 4's VARIANT type: parse once into the
    binary-shredded representation, then typed-path access — at scale
    this replaces per-expression JSON string re-parsing (every
    ``json_extract`` re-tokenizes the string; ``parse_json`` +
    ``variant_get`` parses once, probes many times)."""
    events = load_tables(spark, sf_dir, ["events"])["events"]
    v = events.withColumn("v", F.parse_json(F.col("props")))
    k = F.try_variant_get(F.col("v"), "$.k", "long")
    return (
        v.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


ORACLE_Q110 = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
"""


# q111: SCD2 intervals --------------------------------------------------------


def q111_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) build from an event stream:
    collapse each user's consecutive same-type runs into validity
    intervals [valid_from, valid_to) with a current-row flag.  Islands
    via the two-row_number difference (one partitioned window pass —
    no self-join), interval ends via lead."""
    events = load_tables(spark, sf_dir, ["events"])["events"]
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_typ = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    runs = events.select(
        "user_id",
        "event_type",
        "ts",
        (
            F.row_number().over(w_all) - F.row_number().over(w_typ)
        ).alias("grp"),
    )
    islands = runs.groupBy("user_id", "event_type", "grp").agg(
        F.min("ts").alias("valid_from"),
        F.count("*").cast("long").alias("n_events"),
    )
    w_isl = Window.partitionBy("user_id").orderBy("valid_from")
    return (
        islands.withColumn(
            "valid_to", F.lead("valid_from").over(w_isl)
        )
        .withColumn("is_current", F.col("valid_to").isNull())
        .where(F.col("user_id") < 50)
        .select(
            "user_id",
            "event_type",
            "valid_from",
            "valid_to",
            "n_events",
            "is_current",
        )
    )


ORACLE_Q111 = """
WITH runs AS (
  SELECT user_id, event_type, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id)
       - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS grp
  FROM events),
islands AS (
  SELECT user_id, event_type, grp,
         MIN(ts) AS valid_from,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM runs GROUP BY 1, 2, 3)
SELECT user_id, event_type, valid_from,
       LEAD(valid_from) OVER (PARTITION BY user_id
                              ORDER BY valid_from) AS valid_to,
       n_events,
       LEAD(valid_from) OVER (PARTITION BY user_id
                              ORDER BY valid_from) IS NULL AS is_current
FROM islands
WHERE user_id < 50
"""


# q112: incremental aggregate maintenance ------------------------------------

SPECS = {
    "n_orders": ("count", "o_orderkey"),
    # decimal state: double sums are summation-order-dependent, so a
    # partial-merge could never be bit-identical to a full recompute —
    # the incremental contract requires an exact (decimal) state
    "total_price": ("sum", "price_dec"),
    "first_order": ("min", "o_orderdate"),
    "last_order": ("max", "o_orderdate"),
}
CUTOFF = "1997-01-01"


def q112_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order rollup maintained incrementally: history (< 1997)
    and the delta (>= 1997) are aggregated separately, then their
    partial STATES merge (operators/incremental.py) — cost of the
    refresh is O(delta + distinct keys), never a history re-scan.
    Result is pinned bit-identical to the oracle's full recompute."""
    from ..operators.incremental import merge_partials, partial_aggregate

    orders = load_tables(spark, sf_dir, ["orders"])["orders"].withColumn(
        "price_dec", F.col("o_totalprice").cast("decimal(18,2)")
    )
    hist = orders.where(F.col("o_orderdate") < F.lit(CUTOFF))
    delta = orders.where(F.col("o_orderdate") >= F.lit(CUTOFF))
    parts = [
        partial_aggregate(d, ["o_custkey"], SPECS) for d in (hist, delta)
    ]
    merged = merge_partials(parts, ["o_custkey"], SPECS)
    # state stays decimal (exact merge); the exposed result follows the
    # catalog's hash-stable convention: exact decimal -> double
    return merged.where(F.col("o_custkey") < 200).withColumn(
        "total_price", F.col("total_price").cast("double")
    )


ORACLE_Q112 = """
SELECT o_custkey,
       CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS total_price,
       MIN(o_orderdate) AS first_order,
       MAX(o_orderdate) AS last_order
FROM orders
WHERE o_custkey < 200
GROUP BY o_custkey
"""


# q113: leakage-safe grouped split -------------------------------------------

SPLITS = [("train", 0, 8), ("val", 8, 9), ("test", 9, 10)]


def q113_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test split keyed on the GROUP (source), not the row:
    md5(source) mod 10 assigns every document of a source to the same
    split, so near-duplicates inside a source can never straddle the
    train/test boundary (leakage-safe).  Deterministic across engines
    and partitionings — same md5-bucket primitive as q74/q105."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    bucket = (
        F.conv(F.substring(F.md5(F.col("source")), 1, 15), 16, 10)
        .cast("long")
        % 10
    )
    split = F.when(bucket < 8, "train").when(bucket < 9, "val").otherwise(
        "test"
    )
    return (
        docs.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.count_distinct("source").cast("long").alias("n_sources"),
            F.sum(F.col("n_chars").cast("long")).alias("total_chars"),
        )
    )


ORACLE_Q113 = """
WITH tagged AS (
  SELECT *,
         ('0x' || substr(md5(source), 1, 15))::BIGINT % 10 AS bucket
  FROM documents)
SELECT CASE WHEN bucket < 8 THEN 'train'
            WHEN bucket < 9 THEN 'val'
            ELSE 'test' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars
FROM tagged
GROUP BY 1
"""


def batch16_registry() -> list[QueryDef]:
    return [
        QueryDef("q110_variant_props", q110_variant_props, ORACLE_Q110, "VARIANT parse-once typed-path access"),
        QueryDef("q111_scd2_intervals", q111_scd2_intervals, ORACLE_Q111, "SCD2 validity intervals via island windows"),
        QueryDef("q112_incremental_agg", q112_incremental_agg, ORACLE_Q112, "partial-state merge == full recompute"),
        QueryDef("q113_group_split", q113_group_split, ORACLE_Q113, "leakage-safe md5 group split"),
    ]
