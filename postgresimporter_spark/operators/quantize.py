"""Embedding quantization: float32 -> int8 with per-vector scale.

The standard storage/bandwidth trade for 100 TB embedding corpora:
int8 + one float scale per vector is ~4x smaller, and the dequantized
cosine stays within ~1% of exact. Quantization is a pure projection
(no shuffle); everything is expressible with array lambdas so it stays
in codegen and is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _max_abs(vec: Column) -> Column:
    return F.array_max(
        F.transform(vec, lambda x: F.abs(x.cast("double")))
    )


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Add ``qvec`` (int8-range ints) and ``scale`` columns.

    q_i = round(x_i / scale) with scale = max|x| / 127; zero vectors
    quantize to all-zero with scale 0.
    """
    vec = F.col(vec_col)
    scale = _max_abs(vec) / F.lit(127.0)
    qvec = F.when(scale == 0, F.transform(vec, lambda x: F.lit(0))).otherwise(
        F.transform(
            vec,
            lambda x: F.round(x.cast("double") / scale).cast("int"),
        )
    )
    return df.withColumn("scale", scale).withColumn("qvec", qvec)


def dequantized_cosine(qa: Column, sa: Column, qb: Column, sb: Column) -> Column:
    """Cosine over dequantized vectors (scales cancel in the ratio, so
    this is exactly the cosine of the integer vectors)."""
    dot = F.aggregate(
        F.zip_with(qa, qb, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda q: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(q, lambda x: (x * x).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return dot / (norm(qa) * norm(qb))


__all__ = ["quantize_embeddings", "dequantized_cosine"]


# Codebook size (k centroids x full dim) above which the PQ assignment
# switches from plan-literal distance expressions to a broadcast-joined
# centroid table (r13 probe): the literal when-chain embeds k*dim
# arithmetic terms in the PLAN, and Catalyst analysis scales with
# expression size — measured 4.1s at k*dim=512 (the catalog's m=4 k=8
# dim=64 shape) but 38s at 8,192 (m=8 k=64 dim=128) and a TIMEOUT
# (>300s) at FAISS-typical 196,608 (m=16 k=256 dim=768), all at a few
# hundred rows — pure plan cost, not data. The join variant computes
# the identical fold (same zip_with/aggregate order, same lowest-cid
# tiebreak via min-of-(dist, cid) struct) against a broadcast
# (s, cid, centroid) table: bit-identical codes and codebooks
# (pinned by test), 1.8s at 8,192 and 9.1s at 196,608. The literal
# path is kept below the threshold because it is slightly faster at
# toy sizes (3.7s vs 5.5s) and keeps the catalog-pinned zero-join
# plans (q147/q148) byte-stable.
_LITERAL_ASSIGN_MAX_TERMS = 512


def _assign_by_join(base: DataFrame, books_now, id_col: str) -> DataFrame:
    """Nearest-centroid assignment via a broadcast codebook join — the
    large-codebook path of ``pq_train_encode`` (see
    ``_LITERAL_ASSIGN_MAX_TERMS``). Distance is the same element-order
    fold as ``kmeans._sq_dist`` with the centroid as a COLUMN, and the
    argmin is min-of-(dist, cid) — lowest cid on ties, matching the
    literal path's first-occurrence ``array_position`` exactly."""
    spark = base.sparkSession
    rows = [
        (s, cid, [float(x) for x in cent])
        for s, bk in enumerate(books_now)
        for cid, cent in enumerate(bk)
    ]
    cents = spark.createDataFrame(rows, "s int, cid int, _cent array<double>")
    dist = F.aggregate(
        F.zip_with("v", "_cent", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    best = (
        base.join(F.broadcast(cents), on="s")
        .withColumn("_d", dist)
        .groupBy(id_col, "s")
        .agg(F.min(F.struct(F.col("_d"), F.col("cid"))).alias("_b"))
        .select(id_col, "s", F.col("_b.cid").alias("cid"))
    )
    return base.join(best, on=[id_col, "s"])


def pq_train_encode(
    df: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[list[float]]]]:
    """Product quantization (Jégou et al. 2011, FAISS's workhorse):
    split each vector into ``m`` subspaces and k-means each subspace
    independently; a vector compresses to ``m`` small codes
    (m=4, k=8 ⇒ 64 floats → 12 bits).

    Returns ``(codes, codebooks)``: codes = (id, subspace, code) rows;
    codebooks = m × k × (dim/m) driver-side floats — METADATA, the same
    class as k-means centroids, broadcast or inlined by consumers.

    Scale shape: each subspace training is the deterministic Lloyd loop
    (``kmeans_lloyd_full``) over a SLICED projection of the corpus —
    m independent passes whose only shuffle is the (cluster, dim)
    partial-sum agg; nothing vector-sized ever concentrates.  Encoding
    IS the final assignment (no extra pass).  ADC search over the codes
    is a (subspace, code) equi-join against a probe lookup table —
    see ``pq_adc_topk``.
    """
    from .kmeans import _sq_dist

    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    sub = dim // m
    round_digits = 6
    scale = 10**round_digits
    # ALL subspaces in one table: explode the m slices per vector, so
    # every Lloyd iteration is ONE job for the whole codebook instead
    # of m independent job chains. Measured at sf0.01 the wall-clock
    # is UNCHANGED (~4.5s — the cost there is Catalyst analysis/codegen
    # of the distance folds, which this does not reduce); the win is
    # structural: m-fold fewer stages/shuffles per iteration, which is
    # what matters when each pass scans a real corpus. Arithmetic per
    # subspace is unchanged, so assignments, centroids, and the oracle
    # results are identical.
    slices = F.array(
        *[
            F.slice(F.col(vec_col).cast("array<double>"), s * sub + 1, sub)
            for s in range(m)
        ]
    )
    base = df.select(
        F.col(id_col), F.posexplode(slices).alias("s", "_raw")
    ).select(
        F.col(id_col),
        "s",
        F.transform("_raw", lambda x: F.round(x, round_digits)).alias("v"),
    )
    init_ids = [
        r[0] for r in df.select(id_col).orderBy(id_col).limit(k).collect()
    ]
    if len(init_ids) < k:
        raise ValueError(f"need at least k={k} rows, got {len(init_ids)}")
    init = base.where(F.col(id_col).isin(init_ids)).collect()
    null_ids = sorted({r[id_col] for r in init if r["v"] is None})
    if null_ids:
        # loud on NULL init vectors (r13 null sweep — same posture as
        # kmeans_lloyd_full: a failed-upstream embedding is a data
        # error worth naming, not a bare TypeError)
        raise ValueError(
            f"NULL {vec_col} in the first k={k} init rows "
            f"({id_col} in {null_ids[:5]}); filter NULL vectors "
            "upstream before quantizing"
        )
    by_sub: dict[int, dict] = {s: {} for s in range(m)}
    for r in init:
        by_sub[r["s"]][r[id_col]] = list(r["v"])
    books: list[list[list[float]]] = [
        [by_sub[s][i] for i in sorted(init_ids)] for s in range(m)
    ]

    def assign(books_now):
        if k * dim > _LITERAL_ASSIGN_MAX_TERMS:
            return _assign_by_join(base, books_now, id_col)
        expr = None
        for si, cents in enumerate(books_now):
            dists = F.array(*[_sq_dist(F.col("v"), c) for c in cents])
            cid = (
                F.array_position(dists, F.array_min(dists)) - 1
            ).cast("int")
            expr = (
                F.when(F.col("s") == si, cid)
                if expr is None
                else expr.when(F.col("s") == si, cid)
            )
        return base.withColumn("cid", expr)

    for _ in range(iters):
        stats = (
            assign(books)
            .select("s", "cid", F.posexplode("v").alias("dim", "val"))
            .groupBy("s", "cid", "dim")
            .agg(
                F.sum(
                    F.bround(F.col("val") * scale, 0).cast("long")
                ).alias("acc"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        new = [[list(c) for c in bk] for bk in books]
        for r in stats:
            new[r["s"]][r["cid"]][r["dim"]] = r["acc"] / (scale * r["n"])
        books = new

    codes = assign(books).select(
        F.col(id_col),
        F.col("s").cast("long").alias("subspace"),
        F.col("cid").cast("long").alias("code"),
    )
    return codes, books


def pq_adc_lookup(
    probes: list[tuple[int, list[float]]],
    books: list[list[list[float]]],
) -> list[tuple[int, int, int, float]]:
    """Asymmetric-distance lookup table: for every (probe, subspace,
    code), the squared L2 distance between the probe's subvector and
    that code's centroid.  |probes| × m × k rows — driver-side
    metadata.  Distances accumulate in index order and stay UNROUNDED:
    a sequential fold over identical doubles is bit-identical to the
    SQL ``list_sum(list_transform(...))`` the oracle uses, so rounding
    happens only once, at the final ADC sum.
    """
    m = len(books)
    sub = len(books[0][0])
    out = []
    for pid, vec in probes:
        for s in range(m):
            pv = vec[s * sub : (s + 1) * sub]
            for code, cv in enumerate(books[s]):
                d = 0.0
                for a, b in zip(pv, cv):
                    d += (a - b) * (a - b)
                out.append((pid, s, code, d))
    return out


def pq_adc_topk(
    codes: DataFrame,
    lookup: DataFrame,
    topk: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k: approximate distance(probe, vector) = Σ_subspaces
    lookup(probe, subspace, code(vector)).  One (subspace, code)
    broadcast equi-join + one (probe, vector) aggregation — the corpus
    is touched only through its 12-bit codes, never its floats; this is
    what makes PQ search feasible when the float vectors don't fit
    anywhere.  Ties (identical codes ⇒ identical ADC) break on vec_id
    for a total order."""
    from pyspark.sql import Window

    joined = codes.join(
        F.broadcast(lookup), on=["subspace", "code"]
    )
    adc = joined.groupBy("probe_id", id_col).agg(
        F.round(F.sum("pdist"), 6).alias("adc")
    )
    w = Window.partitionBy("probe_id").orderBy("adc", id_col)
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select(
            "probe_id",
            F.col("rank").cast("long").alias("rank"),
            id_col,
            "adc",
        )
    )


__all__ += ["pq_train_encode", "pq_adc_lookup", "pq_adc_topk"]
