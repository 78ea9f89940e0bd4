"""Batch 68: farthest-first centroid seeding and k-truss peeling.

- q310 k-center seeding — the missing INITIALIZATION stage of the
  k-means family (q91 assigns to given centroids, q238 runs a Lloyd
  step): farthest-first traversal (Gonzalez 1985 — the deterministic
  2-approximation of the k-center objective, and the determinized
  form of k-means++ D² seeding). Vectors quantize to integers
  (round(x*1000), the q62 discipline) so every distance is an exact
  BIGINT and the per-round argmax has a total order (max distance,
  then min vec_id) both engines reproduce bit-for-bit. Each round is
  one vectors⋈chosen broadcast join + min + a 1-row ordered limit —
  k bounded rounds, never a quadratic pass.
- q311 k-truss — ``graph.ktruss_edges``: three support-peeling rounds
  toward the 7-truss of the co-purchase graph (support 1-25, median
  7 at sf0.01 — the k=7 filter peels ~half the edges in round one and
  cascades to a 6.8k-edge core by round three, so every round does
  real work and the survivor set is a non-trivial gate). Spark
  enumerates triangles at their lowest-degree corner (hub-safe
  compact-forward wedges); the oracle recomputes each round's
  supports with the straightforward symmetric-join count — different
  plan shapes, identical edge sets, which is exactly what the
  differential gate is for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_tables
from .catalog import QueryDef

# q310: farthest-first k-center seeding ------------------------------------------

KC_K = 5
KC_SCALE = 1000


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    return emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.round(x * KC_SCALE).cast("long"),
        ).alias("q"),
    )


def _dist2(qa, qb) -> F.Column:
    return F.aggregate(
        F.zip_with(qa, qb, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def q310_kcenter_seeding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five farthest-first seeds over the quantized embeddings:
    (seed_rank, vec_id, sel_dist2) where sel_dist2 is the point's
    exact squared distance to the nearest already-chosen seed at
    selection time (0 for the rank-0 seed) — the k-center coverage
    radius trace."""
    qv = _quantized(spark, sf_dir).localCheckpoint(eager=False)
    chosen = qv.orderBy("vec_id").limit(1).select(
        F.lit(0).alias("seed_rank"),
        "vec_id",
        "q",
        F.lit(0).cast("long").alias("sel_dist2"),
    ).localCheckpoint(eager=False)
    for r in range(1, KC_K):
        cand = (
            qv.join(
                F.broadcast(
                    chosen.select(F.col("q").alias("_cq"))
                )
            )
            .select("vec_id", "q", _dist2(F.col("q"), F.col("_cq")).alias("_d2"))
            .groupBy("vec_id", "q")
            .agg(F.min("_d2").alias("_md"))
        )
        pick = cand.orderBy(
            F.col("_md").desc(), F.col("vec_id")
        ).limit(1).select(
            F.lit(r).alias("seed_rank"),
            "vec_id",
            "q",
            F.col("_md").cast("long").alias("sel_dist2"),
        )
        chosen = chosen.unionByName(pick).localCheckpoint(eager=False)
    return chosen.select(
        F.col("seed_rank").cast("long").alias("seed_rank"),
        "vec_id",
        "sel_dist2",
    )


def _kc_oracle() -> str:
    rounds = []
    for r in range(1, KC_K):
        rounds.append(
            f"""md{r} AS (
  SELECT vec_id, MIN(d2) AS md FROM (
    SELECT v.vec_id, v.vec_id AS vid, c.vec_id AS cid,
           (SELECT CAST(SUM((z.a - z.b) * (z.a - z.b)) AS BIGINT)
            FROM (SELECT unnest(v.q) AS a, unnest(c.q) AS b) z) AS d2
    FROM qv v CROSS JOIN chosen{r - 1} c) d
  GROUP BY vec_id),
pick{r} AS (
  SELECT vec_id, md FROM md{r} ORDER BY md DESC, vec_id LIMIT 1),
chosen{r} AS (
  SELECT * FROM chosen{r - 1}
  UNION ALL
  SELECT {r} AS seed_rank, qv.vec_id, qv.q, pick{r}.md AS sel_dist2
  FROM qv JOIN pick{r} USING (vec_id))"""
        )
    rounds_sql = ",\n".join(rounds)
    return f"""
WITH qv AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(ROUND(x * {KC_SCALE}) AS BIGINT)) AS q
  FROM embeddings),
chosen0 AS (
  SELECT 0 AS seed_rank, vec_id, q, CAST(0 AS BIGINT) AS sel_dist2
  FROM qv ORDER BY vec_id LIMIT 1),
{rounds_sql}
SELECT CAST(seed_rank AS BIGINT) AS seed_rank, vec_id,
       CAST(sel_dist2 AS BIGINT) AS sel_dist2
FROM chosen{KC_K - 1}
"""


# q311: k-truss peeling -----------------------------------------------------------

KT_K = 7
KT_ROUNDS = 3


def q311_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three peeling rounds toward the 7-truss of the co-purchase
    graph: surviving edges with their last-measured support."""
    from ..operators.graph import ktruss_edges
    from .catalog_batch18 import _edges

    return ktruss_edges(_edges(spark, sf_dir), k=KT_K, rounds=KT_ROUNDS)


def _kt_oracle() -> str:
    from .catalog_batch18 import _EDGES_SQL

    rounds = []
    prev = "edges"
    for r in range(1, KT_ROUNDS + 1):
        rounds.append(
            f"""sym{r} AS (
  SELECT src, dst FROM {prev} UNION ALL SELECT dst, src FROM {prev}),
supp{r} AS (
  SELECT e.src, e.dst, CAST(COUNT(*) AS BIGINT) AS support
  FROM {prev} e
  JOIN sym{r} a ON a.src = e.src
  JOIN sym{r} b ON b.src = e.dst AND b.dst = a.dst
  GROUP BY e.src, e.dst
  HAVING COUNT(*) >= {KT_K - 2}),
e{r} AS (SELECT src, dst FROM supp{r})"""
        )
        prev = f"e{r}"
    rounds_sql = ",\n".join(rounds)
    return f"""
WITH {_EDGES_SQL},
{rounds_sql}
SELECT src, dst, support FROM supp{KT_ROUNDS}
"""


def batch68_registry() -> list[QueryDef]:
    return [
        QueryDef(
            "q310_kcenter_seeding",
            q310_kcenter_seeding,
            _kc_oracle(),
            "farthest-first k-center seeds, exact BIGINT distances",
        ),
        QueryDef(
            "q311_ktruss",
            q311_ktruss,
            _kt_oracle(),
            "3-round 7-truss peeling vs symmetric-join support replay",
        ),
    ]
