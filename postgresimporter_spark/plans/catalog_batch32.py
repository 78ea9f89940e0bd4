"""Batch 32: BI delta attribution, weighted PageRank, bitemporal
as-of querying.

- q197 period-over-period delta attribution: the "why did the metric
  move" decomposition — per-segment revenue deltas between two years
  and each segment's share of the total move, cent-exact with one
  rounded double for the share (integer division is engine-hazardous
  on NEGATIVE deltas: Spark ``div`` truncates toward zero, DuckDB
  ``//`` floors — so the signed share is the one place a double ratio
  is the *safer* choice).
- q198 strength-weighted PageRank: q119's fixed-point machinery with
  co-purchase strength (``n_shared``) as the edge weight —
  contribution = (rank·w) div strength, still bit-exact integers.
- q199 bitemporal as-of (SQL:2011's two time axes): "what did we
  believe on transaction date T about the state valid on date V" —
  two per-key argmax steps (transaction knowledge cut, then valid-time
  cut), both partitioned windows, the correction history synthesized
  deterministically from orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_tables
from .catalog import QueryDef
from .catalog_batch18 import MAX_CONTAINER

# ---------------------------------------------------------------------------
# q197: period-over-period delta attribution
# ---------------------------------------------------------------------------

_Y_BASE = 1994
_Y_NEW = 1995


def q197_delta_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue delta 1994→1995 per market segment, with each
    segment's share of the total move: the contribution report behind
    every "metric moved X%" dashboard. Revenue in exact cents; the
    only double is the final signed share ratio (rounded 6)."""
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    o = t["orders"].withColumn("_y", F.year("o_orderdate")).where(
        F.col("_y").isin(_Y_BASE, _Y_NEW)
    )
    joined = o.join(
        F.broadcast(t["customer"].select("c_custkey", "c_mktsegment")),
        o["o_custkey"] == F.col("c_custkey"),
    )
    cents = F.expr("CAST(o_totalprice * 100 AS DECIMAL(20,0))")
    per = joined.groupBy("c_mktsegment").agg(
        F.sum(F.when(F.col("_y") == _Y_BASE, cents)).cast("long")
        .alias("rev_base"),
        F.sum(F.when(F.col("_y") == _Y_NEW, cents)).cast("long")
        .alias("rev_new"),
    ).select(
        "c_mktsegment", "rev_base", "rev_new",
        (F.col("rev_new") - F.col("rev_base")).cast("long").alias("delta"),
    )
    tot = per.agg(F.sum("delta").cast("long").alias("_td"))
    return per.crossJoin(F.broadcast(tot)).select(
        "c_mktsegment",
        "rev_base",
        "rev_new",
        "delta",
        F.round(
            F.col("delta").cast("double") / F.col("_td").cast("double"), 6
        ).alias("share_of_move"),
    )


ORACLE_Q197 = f"""
WITH per AS (
  SELECT c.c_mktsegment,
    CAST(SUM(CASE WHEN year(o.o_orderdate) = {_Y_BASE}
             THEN CAST(o.o_totalprice * 100 AS DECIMAL(20,0)) END)
         AS BIGINT) AS rev_base,
    CAST(SUM(CASE WHEN year(o.o_orderdate) = {_Y_NEW}
             THEN CAST(o.o_totalprice * 100 AS DECIMAL(20,0)) END)
         AS BIGINT) AS rev_new
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE year(o.o_orderdate) IN ({_Y_BASE}, {_Y_NEW})
  GROUP BY 1),
d AS (
  SELECT c_mktsegment, rev_base, rev_new,
         CAST(rev_new - rev_base AS BIGINT) AS delta
  FROM per),
tot AS (SELECT CAST(SUM(delta) AS BIGINT) AS td FROM d)
SELECT c_mktsegment, rev_base, rev_new, delta,
       round(CAST(delta AS DOUBLE) / CAST(td AS DOUBLE), 6)
         AS share_of_move
FROM d CROSS JOIN tot
"""


# ---------------------------------------------------------------------------
# q198: strength-weighted PageRank
# ---------------------------------------------------------------------------


def q198_weighted_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by 3-iteration PageRank WEIGHTED by co-purchase
    strength (shared-order counts as edge weights): contribution =
    (rank·w) div strength — q119's bit-exact fixed point, importance
    now flowing proportionally to tie strength."""
    from ..operators.graph import cooccurrence_edges, pagerank

    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    edges = cooccurrence_edges(
        li, "l_orderkey", "l_partkey",
        max_container_size=MAX_CONTAINER, count_pairs=True,
    )
    pr = pagerank(
        edges, iterations=3, damping_pct=85, weight_col="n_shared"
    )
    return (
        pr.orderBy(F.desc("rank_scaled"), F.asc("node"))
        .limit(20)
        .select(F.col("node").alias("part"), "rank_scaled", "rank")
    )


def _oracle_q198() -> str:
    from .catalog_batch18 import _EDGES_SQL

    iters = []
    prev = "r0"
    for i in (1, 2, 3):
        iters.append(f"""
r{i} AS (
  SELECT s.dst AS node,
         CAST((SELECT (15 * 1000000000000) // (100 * n) FROM nv)
              + (SUM(({prev}.r * s.w) // d.strength) * 85) // 100
              AS BIGINT) AS r
  FROM sym s JOIN deg d ON s.src = d.node
  JOIN {prev} ON s.src = {prev}.node
  GROUP BY s.dst)""")
        prev = f"r{i}"
    return f"""
WITH {_EDGES_SQL},
wedges AS (
  SELECT a.item AS src, b.item AS dst, CAST(COUNT(*) AS BIGINT) AS w
  FROM citems a
  JOIN citems b ON a.c = b.c AND a.item < b.item
  JOIN cok ON a.c = cok.c
  GROUP BY 1, 2),
sym AS (
  SELECT src, dst, w FROM wedges
  UNION ALL SELECT dst, src, w FROM wedges),
deg AS (
  SELECT src AS node, CAST(SUM(w) AS BIGINT) AS strength
  FROM sym GROUP BY src),
nv AS (SELECT COUNT(*) AS n FROM deg),
r0 AS (
  SELECT node, CAST(1000000000000 // nv.n AS BIGINT) AS r
  FROM deg, nv),
{",".join(iters)}
SELECT node AS part, r AS rank_scaled,
       CAST(r AS DOUBLE) / 1000000000000.0 AS rank
FROM r3
ORDER BY rank_scaled DESC, part ASC LIMIT 20
"""


# ---------------------------------------------------------------------------
# q199: bitemporal as-of query
# ---------------------------------------------------------------------------

_TX_CUT = "1998-06-01"   # "as we knew it on this date"
_VALID_CUT = "1998-01-01"  # "the state valid on this date"
# corrections (tx = valid + 400 d) are known only for valid <= 1997-04-27,
# so versions valid in (1997-04-27, 1998-01-01] still read as ORIGINAL at
# the tx cut - the genuinely bitemporal regime both engines must agree on
_BT_KEYS = 500


def q199_bitemporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2011 bitemporal as-of: the version table carries BOTH a
    valid-time (o_orderdate) and a transaction-time (when we learned
    it — original booking, plus a correction recorded 400 days later
    for every 4th key that bumps the price by 10). The query answers
    "as known on 1998-06-01, what was each key's latest state valid
    on or before 1998-01-01": first cut away versions not yet known
    (tx_time > cut), then per key keep the max-tx version of each
    valid instant, then the max-valid instant — two per-key argmax
    windows, no global work. Aggregated to a checkable summary."""
    o = load_tables(spark, sf_dir, ["orders"])["orders"].where(
        F.col("o_orderkey") % 4 != 3
    ).where(F.col("o_orderkey") <= _BT_KEYS * 8)
    cents = F.expr("CAST(o_totalprice * 100 AS DECIMAL(20,0))").cast("long")
    original = o.select(
        F.col("o_orderkey").alias("key"),
        F.col("o_orderdate").alias("valid_from"),
        F.col("o_orderdate").alias("tx_from"),
        cents.alias("cents"),
    )
    corrected = o.where(F.col("o_orderkey") % 4 == 0).select(
        F.col("o_orderkey").alias("key"),
        F.col("o_orderdate").alias("valid_from"),
        (F.col("o_orderdate") + F.expr("INTERVAL 400 DAYS")).alias("tx_from"),
        (cents + 1000).alias("cents"),
    )
    versions = original.unionByName(corrected)
    known = versions.where(
        F.col("tx_from") <= F.lit(_TX_CUT).cast("timestamp")
    )
    w_tx = Window.partitionBy("key", "valid_from").orderBy(
        F.desc("tx_from")
    )
    latest_knowledge = (
        known.withColumn("_rn", F.row_number().over(w_tx))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    asof = latest_knowledge.where(
        F.col("valid_from") <= F.lit(_VALID_CUT).cast("timestamp")
    )
    w_valid = Window.partitionBy("key").orderBy(F.desc("valid_from"))
    state = (
        asof.withColumn("_rn", F.row_number().over(w_valid))
        .where(F.col("_rn") == 1)
        .select("key", "valid_from", "tx_from", "cents")
    )
    return state.groupBy(
        (F.col("key") % 4 == 0).alias("was_corrected")
    ).agg(
        F.count("*").cast("long").alias("n_keys"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.max("valid_from").alias("max_valid"),
        F.max("tx_from").alias("max_tx"),
    )


ORACLE_Q199 = f"""
WITH o AS (
  SELECT * FROM orders
  WHERE o_orderkey % 4 <> 3 AND o_orderkey <= {_BT_KEYS * 8}),
versions AS (
  SELECT o_orderkey AS key, o_orderdate AS valid_from,
         o_orderdate AS tx_from,
         CAST(CAST(o_totalprice * 100 AS DECIMAL(20,0)) AS BIGINT)
           AS cents
  FROM o
  UNION ALL
  SELECT o_orderkey, o_orderdate, o_orderdate + INTERVAL 400 DAY,
         CAST(CAST(o_totalprice * 100 AS DECIMAL(20,0)) AS BIGINT) + 1000
  FROM o WHERE o_orderkey % 4 = 0),
known AS (
  SELECT * FROM versions WHERE tx_from <= TIMESTAMP '{_TX_CUT}'),
latest_knowledge AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY key, valid_from
                                 ORDER BY tx_from DESC) AS rn
    FROM known) WHERE rn = 1),
state AS (
  SELECT * FROM (
    SELECT key, valid_from, tx_from, cents,
           row_number() OVER (PARTITION BY key
                              ORDER BY valid_from DESC) AS rn
    FROM latest_knowledge
    WHERE valid_from <= TIMESTAMP '{_VALID_CUT}') WHERE rn = 1)
SELECT key % 4 = 0 AS was_corrected,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       CAST(MAX(valid_from) AS TIMESTAMP) AS max_valid,
       CAST(MAX(tx_from) AS TIMESTAMP) AS max_tx
FROM state GROUP BY 1
"""


def batch32_registry() -> list[QueryDef]:
    return [
        QueryDef("q197_delta_attribution", q197_delta_attribution,
                 ORACLE_Q197,
                 "period-over-period delta attribution per segment"),
        QueryDef("q198_weighted_pagerank", q198_weighted_pagerank,
                 _oracle_q198(),
                 "strength-weighted PageRank, exact fixed point"),
        QueryDef("q199_bitemporal", q199_bitemporal, ORACLE_Q199,
                 "bitemporal as-of (valid-time x transaction-time)"),
    ]
