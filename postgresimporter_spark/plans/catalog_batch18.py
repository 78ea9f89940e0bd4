"""Batch 18: graph-analytics tier — co-occurrence graph construction,
degree distribution, exact triangle counting (degree-oriented), and
fixed-point PageRank (operators/graph.py).

Net-new engine surface: the reference
(``/root/reference/postgresimporter/main.py``) has no graph operators;
link/co-occurrence graphs are core corpus-curation machinery
(duplicate clusters, citation graphs, entity graphs) and must run as
bucketed equi-joins at 100 TB.

The shared fixture graph: parts co-purchased within an order
(self-equi-join of lineitem on l_orderkey, canonical src < dst),
built with the ``max_container_size`` skew cap engaged (cap 6, which
genuinely fires on TPC-H data — orders hold up to 7 distinct parts —
so the oracle proves the cap's exact drop semantics, not just its
plumbing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import (
    cooccurrence_edges,
    degree_histogram,
    pagerank,
    triangles_per_node,
)
from ..sources.parquet import load_tables
from .catalog import QueryDef

# Skew cap: drop containers (orders) holding more than this many distinct
# items before the pair self-join. 6 < the TPC-H max of 7 parts/order, so
# the cap demonstrably fires on the driver's data and the oracle checks
# its exact drop semantics.
MAX_CONTAINER = 6

_EDGES_SQL = f"""
  citems AS (
    SELECT DISTINCT l_orderkey AS c, l_partkey AS item FROM lineitem
  ),
  cok AS (
    SELECT c FROM citems GROUP BY c HAVING COUNT(*) <= {MAX_CONTAINER}
  ),
  edges AS (
    SELECT DISTINCT a.item AS src, b.item AS dst
    FROM citems a
    JOIN citems b ON a.c = b.c AND a.item < b.item
    JOIN cok ON a.c = cok.c
  )
"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    return cooccurrence_edges(
        li, "l_orderkey", "l_partkey", max_container_size=MAX_CONTAINER
    )


# q117: degree distribution ---------------------------------------------------


def q117_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-purchase graph: edge build is one
    bucketed self-equi-join (never cross-join), degrees one exact
    groupBy with map-side partials, histogram a second tiny groupBy.
    All counts exact longs — no float risk.
    """
    return degree_histogram(_edges(spark, sf_dir)).orderBy("degree")


ORACLE_Q117 = f"""
WITH {_EDGES_SQL},
ends AS (
  SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges
),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM ends GROUP BY node
)
SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY degree ORDER BY degree
"""


# q118: triangle counting -----------------------------------------------------


def q118_triangle_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 parts by exact triangle participation. The operator
    orients edges by (degree, id) so every wedge is enumerated at its
    lowest-degree corner — per-vertex work bounded O(sqrt(E)) even on
    power-law graphs. Total-order tiebreak on node for a stable top-k.
    """
    tri = triangles_per_node(_edges(spark, sf_dir))
    return (
        tri.orderBy(F.desc("n_triangles"), F.asc("node"))
        .limit(15)
        .select(F.col("node").alias("part"), "n_triangles")
    )


ORACLE_Q118 = f"""
WITH {_EDGES_SQL},
tris AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM edges e1
  JOIN edges e2 ON e1.dst = e2.src
  JOIN edges e3 ON e1.src = e3.src AND e2.dst = e3.dst
),
corners AS (
  SELECT UNNEST([a, b, c]) AS node FROM tris
)
SELECT node AS part, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM corners GROUP BY node
ORDER BY n_triangles DESC, part ASC LIMIT 15
"""


# q119: PageRank --------------------------------------------------------------


def q119_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by 3-iteration PageRank (damping 0.85) over the
    co-purchase graph, computed in scaled-integer fixed point
    (rank × 10^12 as BIGINT; contributions via integer division) so
    the result is bit-identical across engines, partitionings, and
    addition orders — the same portability rule as every float
    aggregate in this catalog, taken to its exact conclusion.
    """
    pr = pagerank(_edges(spark, sf_dir), iterations=3, damping_pct=85)
    return (
        pr.orderBy(F.desc("rank_scaled"), F.asc("node"))
        .limit(20)
        .select(F.col("node").alias("part"), "rank_scaled", "rank")
    )


ORACLE_Q119 = f"""
WITH {_EDGES_SQL},
sym AS (
  SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges
),
deg AS (
  SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree
  FROM sym GROUP BY src
),
nv AS (SELECT COUNT(*) AS n FROM deg),
r0 AS (
  SELECT node, CAST(1000000000000 // nv.n AS BIGINT) AS r
  FROM deg, nv
),
r1 AS (
  SELECT s.dst AS node,
         CAST((SELECT (15 * 1000000000000) // (100 * n) FROM nv)
              + (SUM(r0.r // d.degree) * 85) // 100 AS BIGINT) AS r
  FROM sym s JOIN deg d ON s.src = d.node JOIN r0 ON s.src = r0.node
  GROUP BY s.dst
),
r2 AS (
  SELECT s.dst AS node,
         CAST((SELECT (15 * 1000000000000) // (100 * n) FROM nv)
              + (SUM(r1.r // d.degree) * 85) // 100 AS BIGINT) AS r
  FROM sym s JOIN deg d ON s.src = d.node JOIN r1 ON s.src = r1.node
  GROUP BY s.dst
),
r3 AS (
  SELECT s.dst AS node,
         CAST((SELECT (15 * 1000000000000) // (100 * n) FROM nv)
              + (SUM(r2.r // d.degree) * 85) // 100 AS BIGINT) AS r
  FROM sym s JOIN deg d ON s.src = d.node JOIN r2 ON s.src = r2.node
  GROUP BY s.dst
)
SELECT node AS part, r AS rank_scaled,
       CAST(r AS DOUBLE) / 1000000000000.0 AS rank
FROM r3
ORDER BY rank_scaled DESC, part ASC LIMIT 20
"""


def batch18_registry() -> list[QueryDef]:
    return [
        QueryDef(
            "q117_degree_histogram",
            q117_degree_histogram,
            ORACLE_Q117,
            "co-purchase graph degree distribution (exact)",
        ),
        QueryDef(
            "q118_triangle_nodes",
            q118_triangle_nodes,
            ORACLE_Q118,
            "degree-oriented exact triangle counts, top-15 nodes",
        ),
        QueryDef(
            "q119_pagerank",
            q119_pagerank,
            ORACLE_Q119,
            "fixed-point integer PageRank, 3 iterations, top-20",
        ),
    ]
