"""Distributed graph analytics over DataFrame edge lists.

Net-new engine surface (the reference — ``/root/reference/
postgresimporter/main.py`` — ships no graph operators): co-occurrence
graphs are the backbone of corpus curation (document-link dedup,
citation clusters, entity graphs), and at 100 TB they must be built
and traversed with bucketed equi-joins, never adjacency matrices.

Design rules carried from the rest of the engine:

- **Edges are a DataFrame** ``(src, dst)`` with ``src < dst``
  (canonical undirected form). Building them from a co-occurrence
  source (items sharing an order/document) is a self-equi-join on the
  container key — the per-container pair blowup is quadratic in
  container size, so ``cooccurrence_edges`` takes a
  ``max_container_size`` cap that drops pathological mega-containers
  before the self-join, the same way dedup caps hot shingles
  (``max_doc_ratio``) and embedding LSH caps hot buckets
  (``max_bucket_ratio``).
- **Triangle counting orients edges by degree** (compact-forward):
  each edge points from the lower-(degree, id) endpoint to the
  higher. Every wedge is then enumerated at its lowest-degree vertex,
  which bounds per-vertex work by O(sqrt(E)) out-degree even on
  power-law graphs — the classic hub-explosion fix.
- **PageRank runs in scaled fixed-point integers** (rank × 10^12 as
  BIGINT). Contributions use integer division — exact, associative,
  and bit-identical across engines and partition orders, so the
  result is reproducible AND differentially testable against a SQL
  oracle. Each iteration is one shuffle (groupBy dst) + one broadcast
  join of the degree table; ``localCheckpoint`` per iteration stops
  lineage growth (BUILD_NOTES invariant 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RANK_SCALE = 10**12  # fixed-point scale for PageRank ranks


def cooccurrence_edges(
    items: DataFrame,
    container_col: str,
    item_col: str,
    max_container_size: int | None = None,
) -> DataFrame:
    """Distinct undirected co-occurrence edges ``(src < dst)`` from a
    (container, item) relation: one bucketed self-equi-join on the
    container key — never a global cross join.

    ``max_container_size`` is the skew cap: containers with more than
    this many distinct items are dropped *before* the self-join.
    Without it, one pathological mega-container (a 10k-item basket, a
    boilerplate mega-document) lands ~50M pairs in a single task. The
    count rides a window over the container partitioning, which the
    self-join then reuses — the cap costs no extra shuffle. Counting
    itself is O(container size) per container, never quadratic.
    """
    a = items.select(
        F.col(container_col).alias("_c"), F.col(item_col).alias("src")
    ).distinct()
    if max_container_size is not None:
        w = Window.partitionBy("_c")
        a = (
            a.withColumn("_n", F.count("*").over(w))
            .where(F.col("_n") <= max_container_size)
            .drop("_n")
        )
    b = a.select("_c", F.col("src").alias("dst"))
    return (
        a.join(b, on="_c")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def degrees(edges: DataFrame) -> DataFrame:
    """Per-node degree of a canonical undirected edge list: explode
    each edge to both endpoints, one exact groupBy (map-side partial).
    """
    ends = edges.select(F.col("src").alias("node")).unionAll(
        edges.select(F.col("dst").alias("node"))
    )
    return ends.groupBy("node").agg(F.count("*").cast("long").alias("degree"))


def oriented_edges(edges: DataFrame) -> DataFrame:
    """Orient canonical edges from the lower-(degree, id) endpoint to
    the higher (compact-forward orientation). The degree table is O(V)
    — smaller than edges but NOT guaranteed broadcast-safe at corpus
    scale (a web graph's V exceeds the executor broadcast limit), so
    no broadcast hint: AQE picks broadcast at runtime when the degree
    table fits, shuffle-hash otherwise. The degree table feeds both
    endpoint joins — checkpoint it once so the second join doesn't
    re-run the upstream edge build.
    """
    deg = degrees(edges).localCheckpoint(eager=False)
    e = (
        edges.join(
            deg.withColumnRenamed("node", "src").withColumnRenamed("degree", "dsrc"),
            on="src",
        )
        .join(
            deg.withColumnRenamed("node", "dst").withColumnRenamed("degree", "ddst"),
            on="dst",
        )
    )
    keep = (F.col("dsrc") < F.col("ddst")) | (
        (F.col("dsrc") == F.col("ddst")) & (F.col("src") < F.col("dst"))
    )
    fwd = e.where(keep).select(F.col("src").alias("u"), F.col("dst").alias("v"))
    rev = e.where(~keep).select(
        F.col("dst").alias("u"), F.col("src").alias("v")
    )
    return fwd.unionAll(rev)


def triangles_per_node(edges: DataFrame) -> DataFrame:
    """Exact per-node triangle participation counts.

    Wedges are enumerated at the lowest-degree vertex of each
    triangle (compact-forward), then closed with one equi-join back
    to the oriented edge list; each triangle is found exactly once
    and credited to all three corners via an explode + groupBy.
    Work is O(Σ d_out²) with d_out ≤ O(sqrt(E)) — the hub-safe bound.
    """
    o = oriented_edges(edges).localCheckpoint(eager=False)
    w1 = o.select(F.col("u").alias("a"), F.col("v").alias("b"))
    w2 = o.select(F.col("u").alias("a"), F.col("v").alias("c"))
    wedges = w1.join(w2, on="a").where(F.col("b") < F.col("c"))
    closed = wedges.join(
        o.select(
            F.least("u", "v").alias("b"), F.greatest("u", "v").alias("c")
        ).distinct(),
        on=["b", "c"],
    )
    corners = closed.select(
        F.explode(F.array("a", "b", "c")).alias("node")
    )
    return corners.groupBy("node").agg(
        F.count("*").cast("long").alias("n_triangles")
    )


def pagerank(
    edges: DataFrame, iterations: int = 3, damping_pct: int = 85
) -> DataFrame:
    """Fixed-iteration PageRank on an undirected canonical edge list,
    in exact fixed-point arithmetic (rank × 10^12 stored as BIGINT).

    Per iteration: contribution = rank div degree (integer division —
    exact and engine-portable), one shuffle to sum contributions per
    destination, then ``rank' = (1-d)·S div N + d·Σcontrib div 100``.
    Dangling nodes cannot occur on an undirected graph (degree ≥ 1).
    The degree table is O(V) — joined without a broadcast hint so AQE
    broadcasts it only when it actually fits (a web-scale V can exceed
    the broadcast cap); the per-iteration shuffle is O(E).
    ``localCheckpoint`` caps lineage (invariant 6); at 1000 executors
    this is the standard Pregel-as-joins layout.

    Returns (node, rank_scaled BIGINT, rank DOUBLE); empty edges give
    an empty result rather than a division-by-zero.
    """
    sym = edges.select("src", "dst").unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # materialize the degree table once: every iteration joins it, and
    # without a checkpoint each join would re-run the full upstream edge
    # build (co-occurrence self-join) — O(V) storage buys O(iterations)
    # fewer edge scans
    deg = degrees(edges).localCheckpoint(eager=False)
    n_nodes = deg.count()  # driver scalar: O(V) metadata-scale, like reconcile counts
    if n_nodes == 0:
        return deg.select(
            "node",
            F.lit(0).cast("long").alias("rank_scaled"),
            F.lit(0.0).alias("rank"),
        )
    base = ((100 - damping_pct) * RANK_SCALE) // (100 * n_nodes)
    init = RANK_SCALE // n_nodes
    ranks = deg.select(
        "node", F.lit(init).cast("long").alias("rank_scaled")
    )
    sym = sym.localCheckpoint(eager=False)
    for _ in range(iterations):
        contrib = (
            sym.join(deg.withColumnRenamed("node", "src"), on="src")
            .join(
                ranks.withColumnRenamed("node", "src"),
                on="src",
            )
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_scaled div degree").alias("c"),
            )
        )
        summed = contrib.groupBy("node").agg(F.sum("c").alias("sc"))
        ranks = summed.select(
            "node",
            (
                F.lit(base)
                + F.expr(f"(sc * {damping_pct}) div 100")
            ).cast("long").alias("rank_scaled"),
        ).localCheckpoint(eager=False)
    return ranks.select(
        "node",
        "rank_scaled",
        (F.col("rank_scaled").cast("double") / F.lit(float(RANK_SCALE))).alias(
            "rank"
        ),
    )


def degree_histogram(edges: DataFrame) -> DataFrame:
    """Degree distribution: (degree, n_nodes) — two exact groupBys."""
    return (
        degrees(edges)
        .groupBy("degree")
        .agg(F.count("*").cast("long").alias("n_nodes"))
    )
