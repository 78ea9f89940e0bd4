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


def point_in_polygon(
    points: DataFrame,
    polygons: list[tuple[int, list[tuple[int, int]]]],
    x_col: str,
    y_col: str,
    id_col: str,
) -> DataFrame:
    """Which points fall inside which polygons — the even-odd
    (ray-casting) containment test in PURE INTEGER arithmetic, so both
    engines agree bit-for-bit with no epsilon policy.

    ``polygons`` is a driver-side list of (poly_id, [(x, y), ...])
    simple polygons in integer coordinates (project/scale geographic
    input first, as in ``radius_pairs``). Polygons become broadcast
    literals: per (point, polygon) the edges fold scan-local — no
    shuffle at all until the caller aggregates. A point crosses edge
    (x1,y1)-(x2,y2) iff exactly one endpoint lies strictly above it
    (the half-open [min_y, max_y) rule — vertices never double-count)
    and the rightward ray passes strictly left of the edge's
    intersection, decided by the sign of the exact integer cross
    product — points exactly ON an edge are counted outside (strict
    inequality), a deterministic and documented boundary rule.

    Shape at scale: |polygons| is assumed dictionary-sized (regions,
    geofences). For millions of polygons, bucket both sides by a
    coarse grid cell first (the ``radius_pairs`` layout) and apply
    this test per candidate; the per-pair fold is unchanged.

    Vertex-count posture (r12 probe): the edges fold as a FLAT array
    literal consumed by one higher-order ``filter`` — one expression
    node whose child count is the edge count. The natural per-edge
    ``crossings + c`` chain instead builds a LEFT-DEEP tree whose
    depth is the edge count, and Catalyst's recursive analysis blew
    the JVM stack at 512 vertices (measured StackOverflowError at
    plan build — real coastlines/geofences are far bigger). 4,096-
    vertex polygons plan and run fine on the flat form.
    """
    px, py = F.col(x_col), F.col(y_col)
    hits = []
    for pid, verts in polygons:
        edges = list(zip(verts, verts[1:] + verts[:1]))
        min_x = min(v[0] for v in verts)
        max_x = max(v[0] for v in verts)
        min_y = min(v[1] for v in verts)
        max_y = max(v[1] for v in verts)
        edge_arr = F.array(
            *[
                F.struct(
                    F.lit(x1).cast("long").alias("x1"),
                    F.lit(y1).cast("long").alias("y1"),
                    F.lit(x2).cast("long").alias("x2"),
                    F.lit(y2).cast("long").alias("y2"),
                )
                for (x1, y1), (x2, y2) in edges
            ]
        )

        def _crossing(e):
            spans = (e["y1"] > py) != (e["y2"] > py)
            cross = (e["x2"] - e["x1"]) * (py - e["y1"]) - (
                px - e["x1"]
            ) * (e["y2"] - e["y1"])
            leftward = (
                F.when(e["y2"] > e["y1"], cross > 0)
                .when(e["y2"] < e["y1"], cross < 0)
                .otherwise(F.lit(False))
            )
            return spans & leftward

        crossings = F.size(F.filter(edge_arr, _crossing))
        bbox = (
            (px >= min_x) & (px <= max_x) & (py >= min_y) & (py <= max_y)
        )
        inside = F.when(bbox, crossings % 2 == 1).otherwise(F.lit(False))
        hits.append(
            F.struct(
                F.lit(pid).cast("long").alias("poly_id"),
                inside.alias("inside"),
            )
        )
    # ONE scan for all polygons: fold every containment test into an
    # array, explode, keep hits — |polygons| stays a per-row literal.
    # withColumn (not a re-aliasing select): the higher-order filter's
    # lambda references x/y, and re-aliasing those same names in the
    # projection that also explodes the array trips Spark 4's
    # lateral-column-alias resolution (INTERNAL_ERROR: resolved plan
    # should not contain LateralColumnAliasReference).
    return (
        points.withColumn("_hit", F.explode(F.array(*hits)))
        .where(F.col("_hit.inside"))
        .select("_hit.poly_id", id_col, x_col, y_col)
    )


def polygon_edges_values_sql(
    polygons: list[tuple[int, list[tuple[int, int]]]],
) -> str:
    """The same polygons as a SQL VALUES edge table
    (poly_id, x1, y1, x2, y2) — single source of truth for oracles."""
    rows = []
    for pid, verts in polygons:
        for (x1, y1), (x2, y2) in zip(verts, verts[1:] + verts[:1]):
            rows.append(f"({pid}, {x1}, {y1}, {x2}, {y2})")
    return ", ".join(rows)


__all__ = ["radius_pairs", "point_in_polygon", "polygon_edges_values_sql"]
