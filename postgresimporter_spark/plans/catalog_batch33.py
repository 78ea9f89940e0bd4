"""Batch 33: hierarchy rollup, path mining, and histogram-based join
estimation.

- q200 bill-of-materials explosion: a deterministic 2-level part
  hierarchy (arithmetic child derivation — a fixture, like q169's
  planted typos) rolled up to assembly cost with per-level quantity
  multiplication — the classic recursive-CTE workload expressed as
  BOUNDED-depth joins (the engine's fixed-round discipline: explicit
  levels, no recursion).
- q201 top event paths: the 3-step session-path (Sankey) table from
  per-user ordered windows — what flow analytics actually draws.
- q202 histogram join-size estimation: equi-width histograms of both
  join sides and the textbook containment-assumption estimate
  Σ n_a·n_b div max(d_a, d_b) per bucket, beside the exact join count
  — the second member of the planner-statistics family (q191's KMV
  forecast), all integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_tables
from .catalog import QueryDef

# ---------------------------------------------------------------------------
# q200: bill-of-materials explosion (bounded depth)
# ---------------------------------------------------------------------------

_ASM = 50        # assemblies: partkey < 50
_CHILD_BASE = 50   # children of a: a*4 + 50 + i, i in 0..2
_GRAND_BASE = 250  # grandchildren of c: c*4 + 250 + i, i in 0..1


def q200_bom_explosion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exploded 2-level BOM cost per assembly: each assembly (partkey
    < 50) contains 3 children (qty = a%3+1), each child 2
    grandchildren (qty = c%2+1); effective quantity multiplies down
    the path and the rollup prices every node from p_retailprice in
    exact cents. Depth is explicit (two joins), so the plan is two
    shuffle joins + one aggregation — the shape a 100 TB BOM walk
    keeps per level."""
    parts = load_tables(spark, sf_dir, ["part"])["part"].select(
        "p_partkey",
        F.expr("CAST(p_retailprice * 100 AS DECIMAL(20,0))")
        .cast("long").alias("price_cents"),
    )
    asm = parts.where(F.col("p_partkey") < _ASM).select(
        F.col("p_partkey").alias("asm")
    )
    child_edges = asm.select(
        "asm",
        F.explode(
            F.array(*[
                F.struct(
                    (F.col("asm") * 4 + _CHILD_BASE + i).alias("child"),
                    (F.col("asm") % 3 + 1).cast("long").alias("qty"),
                )
                for i in range(3)
            ])
        ).alias("_c"),
    ).select("asm", "_c.child", "_c.qty")
    lvl1 = child_edges.join(
        parts.withColumnRenamed("p_partkey", "child"), on="child"
    ).select(
        "asm", "child", "qty",
        (F.col("qty") * F.col("price_cents")).alias("cost_cents"),
    )
    grand_edges = lvl1.select(
        "asm", "child", "qty",
        F.explode(
            F.array(*[
                F.struct(
                    (F.col("child") * 4 + _GRAND_BASE + i).alias("grand"),
                    (F.col("child") % 2 + 1).cast("long").alias("gqty"),
                )
                for i in range(2)
            ])
        ).alias("_g"),
    ).select("asm", F.col("_g.grand").alias("grand"),
             (F.col("qty") * F.col("_g.gqty")).alias("eff_qty"))
    lvl2 = grand_edges.join(
        parts.withColumnRenamed("p_partkey", "grand"), on="grand"
    ).select("asm", (F.col("eff_qty") * F.col("price_cents")).alias(
        "cost_cents"
    ))
    costs = lvl1.select("asm", "cost_cents").unionByName(
        lvl2.select("asm", "cost_cents")
    )
    return (
        costs.groupBy("asm")
        .agg(
            F.count("*").cast("long").alias("n_components"),
            F.sum("cost_cents").cast("long").alias("bom_cost_cents"),
        )
    )


ORACLE_Q200 = f"""
WITH parts AS (
  SELECT p_partkey,
         CAST(CAST(p_retailprice * 100 AS DECIMAL(20,0)) AS BIGINT)
           AS price_cents
  FROM part),
asm AS (SELECT p_partkey AS asm FROM parts WHERE p_partkey < {_ASM}),
child_edges AS (
  SELECT asm, asm * 4 + {_CHILD_BASE} + i.i AS child,
         CAST(asm % 3 + 1 AS BIGINT) AS qty
  FROM asm, UNNEST([0, 1, 2]) AS i(i)),
lvl1 AS (
  SELECT e.asm, e.child, e.qty,
         e.qty * p.price_cents AS cost_cents
  FROM child_edges e JOIN parts p ON e.child = p.p_partkey),
grand_edges AS (
  SELECT asm, child * 4 + {_GRAND_BASE} + i.i AS grand,
         qty * CAST(child % 2 + 1 AS BIGINT) AS eff_qty
  FROM lvl1, UNNEST([0, 1]) AS i(i)),
lvl2 AS (
  SELECT e.asm, e.eff_qty * p.price_cents AS cost_cents
  FROM grand_edges e JOIN parts p ON e.grand = p.p_partkey),
costs AS (
  SELECT asm, cost_cents FROM lvl1
  UNION ALL SELECT asm, cost_cents FROM lvl2)
SELECT asm, CAST(COUNT(*) AS BIGINT) AS n_components,
       CAST(SUM(cost_cents) AS BIGINT) AS bom_cost_cents
FROM costs GROUP BY asm
"""


# ---------------------------------------------------------------------------
# q201: top event paths (3-step Sankey table)
# ---------------------------------------------------------------------------

_PATHS_TOP = 10


def q201_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The top-10 3-step event paths across all users — the Sankey /
    flow table: per-user ordered lead windows (ts, event_id tiebreak)
    form the trigrams, one count aggregation ranks them, ties broken
    by path text for a deterministic cut."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e3").isNotNull())
    counts = tri.groupBy(
        F.concat_ws(">", "e1", "e2", "e3").alias("path")
    ).agg(F.count("*").cast("long").alias("n"))
    return counts.orderBy(F.desc("n"), F.asc("path")).limit(_PATHS_TOP)


ORACLE_Q201 = f"""
WITH tri AS (
  SELECT event_type AS e1,
         lead(event_type, 1) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS e2,
         lead(event_type, 2) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS e3
  FROM events)
SELECT e1 || '>' || e2 || '>' || e3 AS path,
       CAST(COUNT(*) AS BIGINT) AS n
FROM tri WHERE e3 IS NOT NULL
GROUP BY 1 ORDER BY n DESC, path ASC LIMIT {_PATHS_TOP}
"""


# ---------------------------------------------------------------------------
# q202: histogram-based join-size estimation
# ---------------------------------------------------------------------------

_HIST_BUCKETS = 32


def q202_histogram_join_estimate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Equi-width histogram join estimation for orders ⋈ positive-
    balance customers on custkey: per bucket, rows and distinct keys
    on each side and the containment-assumption contribution
    n_a·n_b div max(d_a, d_b) — the estimate Selinger-style planners
    compute from catalog statistics, as 32 integer-exact rows with
    the bucket's exact join size beside it (self-grading). Histograms
    are one aggregation per side; the exact column is one keyed join
    aggregated to bucket grain."""
    t = load_tables(spark, sf_dir, ["orders", "customer"])
    # bucket width from the sf0.01 key range (1500 keys / 32 buckets);
    # larger SFs simply produce more buckets of the same width — the
    # histogram grain, not its span, is the catalog statistic
    width = (1500 + _HIST_BUCKETS - 1) // _HIST_BUCKETS
    bucket_a = F.expr(f"o_custkey div {width}").cast("long")
    bucket_b = F.expr(f"c_custkey div {width}").cast("long")
    ha = t["orders"].groupBy(bucket_a.alias("bucket")).agg(
        F.count("*").cast("long").alias("na_rows"),
        F.count_distinct("o_custkey").cast("long").alias("na_distinct"),
    )
    cust = t["customer"].where(F.col("c_acctbal") > 0)
    hb = cust.groupBy(bucket_b.alias("bucket")).agg(
        F.count("*").cast("long").alias("nb_rows"),
        F.count_distinct("c_custkey").cast("long").alias("nb_distinct"),
    )
    exact = (
        t["orders"].join(
            cust.select("c_custkey"),
            t["orders"]["o_custkey"] == F.col("c_custkey"),
        )
        .groupBy(bucket_a.alias("bucket"))
        .agg(F.count("*").cast("long").alias("exact_rows"))
    )
    est = F.expr(
        "(na_rows * nb_rows) div greatest(na_distinct, nb_distinct)"
    ).cast("long")
    return (
        ha.join(hb, on="bucket", how="full_outer")
        .join(exact, on="bucket", how="full_outer")
        .select(
            "bucket",
            F.coalesce("na_rows", F.lit(0)).alias("na_rows"),
            F.coalesce("na_distinct", F.lit(0)).alias("na_distinct"),
            F.coalesce("nb_rows", F.lit(0)).alias("nb_rows"),
            F.coalesce("nb_distinct", F.lit(0)).alias("nb_distinct"),
            F.coalesce(est, F.lit(0)).alias("est_rows"),
            F.coalesce("exact_rows", F.lit(0)).alias("exact_rows"),
        )
    )


def _oracle_q202() -> str:
    width = (1500 + _HIST_BUCKETS - 1) // _HIST_BUCKETS
    return f"""
WITH ha AS (
  SELECT o_custkey // {width} AS bucket,
         CAST(COUNT(*) AS BIGINT) AS na_rows,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS na_distinct
  FROM orders GROUP BY 1),
cust AS (SELECT c_custkey FROM customer WHERE c_acctbal > 0),
hb AS (
  SELECT c_custkey // {width} AS bucket,
         CAST(COUNT(*) AS BIGINT) AS nb_rows,
         CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS nb_distinct
  FROM cust GROUP BY 1),
exact AS (
  SELECT o.o_custkey // {width} AS bucket,
         CAST(COUNT(*) AS BIGINT) AS exact_rows
  FROM orders o JOIN cust c ON o.o_custkey = c.c_custkey
  GROUP BY 1)
SELECT COALESCE(ha.bucket, hb.bucket, exact.bucket) AS bucket,
  COALESCE(na_rows, 0) AS na_rows,
  COALESCE(na_distinct, 0) AS na_distinct,
  COALESCE(nb_rows, 0) AS nb_rows,
  COALESCE(nb_distinct, 0) AS nb_distinct,
  COALESCE(CAST((na_rows * nb_rows)
                // greatest(na_distinct, nb_distinct) AS BIGINT), 0)
    AS est_rows,
  COALESCE(exact_rows, 0) AS exact_rows
FROM ha
FULL OUTER JOIN hb ON ha.bucket = hb.bucket
FULL OUTER JOIN exact ON COALESCE(ha.bucket, hb.bucket) = exact.bucket
"""


def batch33_registry() -> list[QueryDef]:
    return [
        QueryDef("q200_bom_explosion", q200_bom_explosion, ORACLE_Q200,
                 "2-level BOM cost rollup (bounded-depth hierarchy)"),
        QueryDef("q201_top_paths", q201_top_paths, ORACLE_Q201,
                 "top 3-step event paths (Sankey flow table)"),
        QueryDef("q202_histogram_join_estimate",
                 q202_histogram_join_estimate, _oracle_q202(),
                 "equi-width histogram join forecast vs exact"),
    ]
