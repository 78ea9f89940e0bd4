"""Spatial radius join via grid bucketing — the spatial member of the
engine's bucketed-candidate family (time buckets: ``temporal.
interval_join``; shingle buckets: ``dedup``; hash buckets: ``similarity``).

``radius_pairs`` finds all point pairs within Euclidean distance
``radius`` WITHOUT an all-pairs comparison: each point lands in one
``radius``-sized grid cell, one join side explodes to its 3x3 cell
neighborhood (any pair within ``radius`` must share one of those 9
cells), and candidates refine with the exact integer distance
predicate ``dx^2 + dy^2 <= r^2``. All arithmetic is integer —
engine-portable with no trig/libm involvement; geographic inputs
should be projected/scaled to integer coordinates first (e.g.
micro-degrees), the standard approach for exactness.

Scale shape: candidates are bounded by points-per-cell density, not
|points|^2 — the join is an equi-join on the cell key, so Spark
hash-partitions by cell and AQE's skew splitting covers a hot cell
(a city-center cell with 10^6 points is the skew case; pick ``radius``
so cells stay urban-block-sized, or pre-aggregate co-located points).
Each qualifying pair is emitted EXACTLY once: the neighbor expansion
is on side A only and pairs dedupe by ``id_a < id_b``, with the cell
co-membership of the 3x3 scheme guaranteeing no pair is missed.
A pair could be found via up to 9 shared cells, so the join keys on
the EXPLODED cell of A matched to the HOME cell of B — B appears in
exactly one cell, so each (A, B) meets at most once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def radius_pairs(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str,
    radius: int,
) -> DataFrame:
    """All pairs (id_a < id_b) with integer Euclidean distance <=
    ``radius``. Returns (id_a, id_b, dist_sq)."""
    pts = df.select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
        F.expr(f"{x_col} div {int(radius)}").cast("long").alias("cx"),
        F.expr(f"{y_col} div {int(radius)}").cast("long").alias("cy"),
    )
    nbrs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    a = pts.select(
        F.col("id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.explode(nbrs).alias("o"),
        "cx",
        "cy",
    ).select(
        "id_a",
        "xa",
        "ya",
        (F.col("cx") + F.col("o.dx")).alias("jx"),
        (F.col("cy") + F.col("o.dy")).alias("jy"),
    )
    b = pts.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    dist_sq = (
        (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
        + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))
    )
    return (
        a.join(b, on=["jx", "jy"])
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("dist_sq", dist_sq.cast("long"))
        .where(F.col("dist_sq") <= radius * radius)
        .select("id_a", "id_b", "dist_sq")
    )


__all__ = ["radius_pairs"]
