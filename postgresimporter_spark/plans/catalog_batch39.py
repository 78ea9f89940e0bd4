"""Batch 39: SQL-surface parity corners — null-safe equality joins
and outer explode.

Two join/generator semantics every migrating SQL workload eventually
hits, now oracle-pinned like the rest of the relational core:

- q213 null-safe dimension join: NULL keys route to a planted
  'UNKNOWN' dimension row via ``eqNullSafe`` (``<=>``) — Spark's
  null-safe equality against DuckDB's ``IS NOT DISTINCT FROM``; an
  ordinary equi-join silently drops the NULL-keyed rows, the classic
  fact-table bug this pattern exists to prevent.
- q214 outer explode: ``explode_outer`` preserves rows whose array is
  EMPTY as a single NULL element (LEFT JOIN UNNEST semantics) —
  plain explode silently deletes them from the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_tables
from .catalog import QueryDef

# ---------------------------------------------------------------------------
# q213: null-safe dimension join
# ---------------------------------------------------------------------------

_NULL_MOD = 7  # every 7th customer's nation key is scrubbed to NULL


def q213_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers per nation with NULL-keyed customers routed to the
    planted UNKNOWN dimension row: the join predicate is null-safe
    equality (``<=>`` / IS NOT DISTINCT FROM), so NULL = NULL matches
    exactly once and no fact row is dropped — Σ counts equals the
    customer count by construction, the invariant an equi-join would
    silently break."""
    t = load_tables(spark, sf_dir, ["customer", "nation"])
    facts = t["customer"].select(
        F.when(
            F.col("c_custkey") % _NULL_MOD == 0, F.lit(None)
        ).otherwise(F.col("c_nationkey")).alias("nk")
    )
    dim = t["nation"].select(
        F.col("n_nationkey").cast("long").alias("dk"),
        F.col("n_name").alias("label"),
    ).unionByName(
        spark.range(1).select(
            F.lit(None).cast("long").alias("dk"),
            F.lit("UNKNOWN").alias("label"),
        )
    )
    joined = facts.join(
        F.broadcast(dim), facts["nk"].eqNullSafe(dim["dk"]), "left"
    )
    return joined.groupBy("label").agg(
        F.count("*").cast("long").alias("n_customers")
    )


ORACLE_Q213 = f"""
WITH facts AS (
  SELECT CASE WHEN c_custkey % {_NULL_MOD} = 0 THEN NULL
              ELSE c_nationkey END AS nk
  FROM customer),
dim AS (
  SELECT CAST(n_nationkey AS BIGINT) AS dk, n_name AS label FROM nation
  UNION ALL
  SELECT NULL, 'UNKNOWN')
SELECT d.label, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM facts f LEFT JOIN dim d ON f.nk IS NOT DISTINCT FROM d.dk
GROUP BY d.label
"""


# ---------------------------------------------------------------------------
# q214: outer explode (LEFT JOIN UNNEST semantics)
# ---------------------------------------------------------------------------

_LONG_TOKEN = 6  # "tags" = tokens with >= 6 characters (6 exist; short docs miss them all)


def q214_outer_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length tags per document exploded with OUTER semantics:
    documents whose tag array is empty survive as one NULL-tag row
    (and are countable — the 'untagged' bucket), where a plain explode
    would silently drop them. Output: per-tag document counts plus
    the NULL bucket, with a deterministic top-20 cut."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    tags = F.filter(
        F.split(F.trim(F.col("text")), r"\s+"),
        lambda t: F.length(t) >= _LONG_TOKEN,
    )
    exploded = docs.select(
        "doc_id", F.explode_outer(tags).alias("tag")
    )
    counts = exploded.groupBy("tag").agg(
        F.count_distinct("doc_id").cast("long").alias("n_docs")
    )
    return (
        counts.orderBy(
            F.desc("n_docs"), F.asc_nulls_first("tag")
        ).limit(20)
    )


ORACLE_Q214 = f"""
WITH tags AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     t -> length(t) >= {_LONG_TOKEN}) AS tag_list
  FROM documents),
exploded AS (
  SELECT t.doc_id, u.tag
  FROM tags t
  LEFT JOIN UNNEST(t.tag_list) AS u(tag) ON TRUE)
SELECT tag, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM exploded
GROUP BY tag
ORDER BY n_docs DESC, tag ASC NULLS FIRST
LIMIT 20
"""


def batch39_registry() -> list[QueryDef]:
    return [
        QueryDef("q213_nullsafe_join", q213_nullsafe_join, ORACLE_Q213,
                 "null-safe (<=>) dimension join, UNKNOWN bucket"),
        QueryDef("q214_outer_explode", q214_outer_explode, ORACLE_Q214,
                 "explode_outer / LEFT JOIN UNNEST empty-array rows"),
    ]
