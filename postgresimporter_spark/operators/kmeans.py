"""Deterministic k-means (Lloyd) over an embedding column — the
iterative ML-loop operator, built so every iteration is differentially
testable against a sequential SQL oracle.

Scale design (the production k-means shape on 100 TB):

* Centroids are METADATA (k x dim doubles). Each Lloyd iteration is one
  full scan of the corpus with the centroids embedded as broadcast
  literals — assignment is per-row math in whole-stage codegen, no join,
  no shuffle. The only shuffle per iteration is the (cluster, dim)
  partial-sum aggregation: k*dim cells, map-side combined. The
  driver-side ``collect()`` per iteration moves k*dim rows — metadata,
  not data (same justification as components.py's loop control).
* Unlike the connected-components loop, no localCheckpoint is needed:
  each iteration rebuilds the plan from the BASE DataFrame with new
  centroid literals, so lineage never grows.

Determinism rules (why this matches a sequential oracle bit-for-bit):

* Input components quantize to ``round_digits`` decimals first.
* Per-dimension sums accumulate in exact int64 micro-units
  (``bround`` = half-even, matching numpy ``rint`` and DuckDB's
  double->BIGINT cast; see operators/pandas_ops.label_centroids).
* The mean is ONE IEEE division of exact integers.
* Assignment argmin breaks distance ties on the lowest cluster id
  (first occurrence of the array minimum).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sq_dist(v: Column, centroid: list[float]) -> Column:
    """Squared L2 distance to a literal centroid — sequential fold in
    array-index order (deterministic for a given row)."""
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(v, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


# Centroid-set size (k x dim) above which assignment switches from
# plan-literal distance expressions to a broadcast centroid join —
# the r13 probe's literal-expression ceiling (measured on the cosine
# twin in similarity.py: ~0.4s of driver-side expression build per
# centroid, 392s at k=1024 dim=768; quantize.py and similarity.py
# carry the measured numbers). Same value-level join-back shape as
# ``similarity._ivf_assign_join``; bit-identical (same _sq_dist fold
# order, lowest-cid tiebreak preserved via min-of-(dist, cid)).
_LITERAL_ASSIGN_MAX_TERMS = 4096


def _assign_clusters_join(
    quantized: DataFrame,
    centroids: list[list[float]],
    vec_col: str,
) -> DataFrame:
    spark = quantized.sparkSession
    rows = [
        (cid, [float(x) for x in cent])
        for cid, cent in enumerate(centroids)
    ]
    cents = spark.createDataFrame(rows, "cid int, _cent array<double>")
    vals = quantized.select(F.col(vec_col).alias("_v")).distinct()
    dist = F.aggregate(
        F.zip_with("_v", "_cent", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cid_map = (
        vals.join(F.broadcast(cents))
        .withColumn("_d", dist)
        .groupBy("_v")
        .agg(F.min(F.struct(F.col("_d"), F.col("cid"))).alias("_b"))
        .select(F.col("_v"), F.col("_b.cid").cast("int").alias("cid"))
    )
    return quantized.join(
        cid_map, quantized[vec_col].eqNullSafe(cid_map["_v"])
    ).drop("_v")


def assign_clusters(
    quantized: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "v",
) -> DataFrame:
    """Attach ``cid`` = index of the nearest centroid (ties -> lowest
    index). Centroids ride into the plan as literals: zero joins —
    except past ``_LITERAL_ASSIGN_MAX_TERMS`` terms, where the literal
    expression build is measured unusable and a broadcast centroid
    join computes the identical assignment."""
    if centroids and len(centroids) * len(centroids[0]) > (
        _LITERAL_ASSIGN_MAX_TERMS
    ):
        return _assign_clusters_join(quantized, centroids, vec_col)
    dists = F.array(*[_sq_dist(F.col(vec_col), c) for c in centroids])
    # array_position returns the 1-based FIRST occurrence of the min —
    # exactly the lowest-id tiebreak
    cid = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    return quantized.withColumn("cid", cid)


def kmeans_lloyd(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Run ``iters`` Lloyd iterations; returns the final assignment
    (id, quantized vector, cid). Init = the ``k`` rows with the
    smallest ids (deterministic, engine-independent).

    Empty clusters keep their previous centroid (no reseeding — keeps
    the trajectory reproducible).
    """
    assigned, _ = kmeans_lloyd_full(
        df, k, iters, id_col, vec_col, round_digits
    )
    return assigned


def kmeans_lloyd_full(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> tuple[DataFrame, list[list[float]]]:
    """``kmeans_lloyd`` plus the trained centroids (k x dim driver-side
    metadata) — the codebook consumers like product quantization need."""
    scale = 10**round_digits
    base = df.select(
        F.col(id_col),
        F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: F.round(x, round_digits),
        ).alias("v"),
    )
    init = base.orderBy(id_col).limit(k).collect()
    if len(init) < k:
        raise ValueError(f"need at least k={k} rows, got {len(init)}")
    # loud on NULL init vectors (r13 null sweep: a NULL embedding in
    # the first k rows crashed as a bare TypeError; at 100 TB, rows
    # whose embedding generation failed upstream ARE nulls)
    null_ids = [r[id_col] for r in init if r.v is None]
    if null_ids:
        raise ValueError(
            f"NULL {vec_col} in the first k={k} init rows "
            f"({id_col} in {null_ids[:5]}); filter NULL vectors "
            "upstream before clustering"
        )
    centroids: list[list[float]] = [list(r.v) for r in init]

    for _ in range(iters):
        assigned = assign_clusters(base, centroids)
        stats = (
            assigned.select(
                "cid", F.posexplode("v").alias("dim", "val")
            )
            .groupBy("cid", "dim")
            .agg(
                F.sum(
                    F.bround(F.col("val") * scale, 0).cast("long")
                ).alias("s"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        new = [list(c) for c in centroids]  # empty clusters unchanged
        by_cid: dict[int, list] = {}
        for r in stats:
            by_cid.setdefault(r.cid, []).append(r)
        for cid, rows in by_cid.items():
            for r in rows:
                new[cid][r.dim] = r.s / (scale * r.n)
        centroids = new

    return assign_clusters(base, centroids), centroids


__all__ = ["kmeans_lloyd", "kmeans_lloyd_full", "assign_clusters"]
