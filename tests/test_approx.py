"""Approximate aggregates: the 100 TB fast path (sketches) validated
against exact answers with error bounds, plus quantized-cosine accuracy."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgresimporter_spark.sources.parquet import load_tables

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_bounded_error(spark):
    li = load_tables(spark, SF, ["lineitem"])["lineitem"]
    exact = li.select(F.count_distinct("l_orderkey")).collect()[0][0]
    approx = li.select(
        F.approx_count_distinct("l_orderkey", rsd=0.02)
    ).collect()[0][0]
    assert abs(approx - exact) / exact < 0.06  # 3x rsd


def test_percentile_approx_bounded_error(spark):
    o = load_tables(spark, SF, ["orders"])["orders"]
    exact, approx = o.select(
        F.percentile("o_totalprice", 0.5),
        F.percentile_approx("o_totalprice", 0.5, 1000),
    ).collect()[0]
    assert abs(approx - exact) / exact < 0.02


def test_quantized_cosine_close_to_exact(spark):
    from postgresimporter_spark.operators.quantize import (
        dequantized_cosine,
        quantize_embeddings,
    )
    from postgresimporter_spark.operators.similarity import cosine

    emb = load_tables(spark, SF, ["embeddings"])["embeddings"]
    q = quantize_embeddings(emb)
    a = q.where(F.col("vec_id") < 50).alias("a")
    b = q.where((F.col("vec_id") >= 50) & (F.col("vec_id") < 100)).alias("b")
    pairs = a.crossJoin(b).select(
        cosine(F.col("a.embedding"), F.col("b.embedding")).alias("exact"),
        dequantized_cosine(
            F.col("a.qvec"), F.col("a.scale"), F.col("b.qvec"), F.col("b.scale")
        ).alias("approx"),
    )
    max_err = pairs.select(
        F.max(F.abs(F.col("exact") - F.col("approx")))
    ).collect()[0][0]
    assert max_err < 0.02


def test_quantize_roundtrip_bounds(spark):
    from postgresimporter_spark.operators.quantize import quantize_embeddings

    emb = load_tables(spark, SF, ["embeddings"])["embeddings"]
    q = quantize_embeddings(emb)
    bad = q.select(
        F.size(
            F.filter(F.col("qvec"), lambda x: (x < -127) | (x > 127))
        ).alias("oob")
    ).agg(F.sum("oob")).collect()[0][0]
    assert bad == 0


def test_pq_codes_shape_and_self_retrieval(spark):
    """PQ sanity: every vector gets one code per subspace in [0, k);
    ADC search ranks each probe's own vector within the top-k (its ADC
    is exactly its own quantization error, which competes with the
    best cells)."""
    from pyspark.sql import functions as F

    from postgresimporter_spark.operators.quantize import (
        pq_adc_lookup,
        pq_adc_topk,
        pq_train_encode,
    )
    from postgresimporter_spark.sources.parquet import load_tables

    emb = load_tables(spark, "/root/testdata/sf0.001", ["embeddings"])[
        "embeddings"
    ]
    codes, books = pq_train_encode(emb, dim=64, m=4, k=8, iters=2)
    n_vecs = emb.count()
    assert codes.count() == n_vecs * 4
    rng = codes.agg(
        F.min("code").alias("lo"),
        F.max("code").alias("hi"),
        F.count_distinct("subspace").alias("m"),
    ).collect()[0]
    assert rng.lo >= 0 and rng.hi < 8 and rng.m == 4
    assert len(books) == 4 and all(len(b) == 8 for b in books)

    probes_rows = (
        emb.where(F.col("vec_id") < 3)
        .select(
            "vec_id",
            F.transform(
                F.col("embedding").cast("array<double>"),
                lambda x: F.round(x, 6),
            ).alias("v"),
        )
        .collect()
    )
    probes = [(int(r.vec_id), list(r.v)) for r in probes_rows]
    lookup = spark.createDataFrame(
        pq_adc_lookup(probes, books),
        "probe_id long, subspace long, code long, pdist double",
    )
    top = pq_adc_topk(codes, lookup, topk=10).collect()
    by_probe = {}
    for r in top:
        by_probe.setdefault(r.probe_id, []).append(r.vec_id)
    for pid, ids in by_probe.items():
        assert pid in ids, f"probe {pid} missing from its own top-10"


def test_pq_literal_and_join_paths_identical(spark):
    """r13 probe: the literal when-chain PQ assignment embeds k*dim
    arithmetic terms in the plan and Catalyst analysis times out at
    FAISS-typical codebook sizes (measured: 38s at m=8 k=64 dim=128,
    >300s at m=16 k=256 dim=768 — pure plan cost at a few hundred
    rows). Above _LITERAL_ASSIGN_MAX_TERMS the assignment joins a
    broadcast codebook table instead. Both paths must produce
    bit-identical codes AND codebooks — same fold order, same
    lowest-cid tiebreak."""
    from pyspark.sql import functions as F

    from postgresimporter_spark.operators import quantize as Q

    dim, m, k = 32, 4, 8  # k*dim = 256: under the default threshold
    corpus = (
        spark.range(120)
        .select(
            F.col("id").alias("vec_id"),
            F.array(
                *[
                    ((F.xxhash64(F.col("id"), F.lit(d)) % 1000) / 1000.0)
                    .cast("float")
                    for d in range(dim)
                ]
            ).alias("embedding"),
        )
        .localCheckpoint()
    )
    codes_lit, books_lit = Q.pq_train_encode(
        corpus, dim=dim, m=m, k=k, iters=2
    )
    lit_rows = sorted(tuple(r) for r in codes_lit.collect())

    old = Q._LITERAL_ASSIGN_MAX_TERMS
    Q._LITERAL_ASSIGN_MAX_TERMS = 0  # force the join path
    try:
        codes_join, books_join = Q.pq_train_encode(
            corpus, dim=dim, m=m, k=k, iters=2
        )
        join_rows = sorted(tuple(r) for r in codes_join.collect())
    finally:
        Q._LITERAL_ASSIGN_MAX_TERMS = old

    assert lit_rows == join_rows
    assert books_lit == books_join


def test_pq_large_codebook_plans_fast(spark):
    """The join path keeps PQ usable at real codebook sizes: m=8 k=64
    over 128-dim vectors (k*dim = 8,192 — 10x the literal ceiling)
    must train end-to-end in seconds, not the literal path's 38s."""
    import time

    from pyspark.sql import functions as F

    from postgresimporter_spark.operators.quantize import pq_train_encode

    dim, m, k = 128, 8, 64
    corpus = (
        spark.range(200)
        .select(
            F.col("id").alias("vec_id"),
            F.array(
                *[
                    ((F.xxhash64(F.col("id"), F.lit(d)) % 1000) / 1000.0)
                    .cast("float")
                    for d in range(dim)
                ]
            ).alias("embedding"),
        )
        .localCheckpoint()
    )
    t0 = time.perf_counter()
    codes, books = pq_train_encode(corpus, dim=dim, m=m, k=k, iters=1)
    n = codes.count()
    elapsed = time.perf_counter() - t0
    assert n == 200 * m
    assert len(books) == m and len(books[0]) == k
    # generous bound: the literal path measured 38s on this shape; the
    # join path 1.8s. 15s catches a regression back to plan-sized cost
    # without being machine-sensitive.
    assert elapsed < 15, f"PQ large-codebook train took {elapsed:.1f}s"


def test_ivf_literal_and_join_paths_identical(spark):
    """r13 probe (same family as the PQ literal ceiling): building K
    cosine expressions costs ~0.4s of driver time per centroid —
    unusable at FAISS-typical K=1024 dim=768 (measured 392s at 500
    rows). Above _IVF_LITERAL_MAX_TERMS assignment and probe selection
    use a broadcast centroid table; both paths must agree exactly,
    including the lowest-cell tiebreak and duplicate-vector
    multiplicity."""
    from pyspark.sql import functions as F

    from postgresimporter_spark.operators import similarity as S

    dim, K = 16, 8
    import random

    rnd = random.Random(11)
    cents = [(i, [rnd.random() for _ in range(dim)]) for i in range(K)]
    corpus = (
        spark.range(300)
        .select(
            # id % 150: every vector appears twice -> multiplicity must
            # survive the value-level join-back
            (F.col("id") % 150).alias("seed"),
            F.col("id").alias("vec_id"),
        )
        .select(
            "vec_id",
            F.array(
                *[
                    ((F.xxhash64(F.col("seed"), F.lit(d)) % 1000) / 1000.0)
                    .cast("float")
                    for d in range(dim)
                ]
            ).alias("embedding"),
        )
        .localCheckpoint()
    )
    queries = (
        spark.range(5)
        .select(
            F.col("id").alias("query_id"),
            F.array(
                *[
                    (
                        (F.xxhash64(F.col("id"), F.lit(d + 77)) % 1000)
                        / 1000.0
                    ).cast("float")
                    for d in range(dim)
                ]
            ).alias("embedding"),
        )
        .localCheckpoint()
    )

    lit_assign = sorted(
        (r.vec_id, r.cell)
        for r in S.ivf_assign(corpus, cents).collect()
    )
    lit_topk = sorted(
        tuple(r) for r in S.ivf_topk(corpus, queries, cents, k=3).collect()
    )

    old = S._IVF_LITERAL_MAX_TERMS
    S._IVF_LITERAL_MAX_TERMS = 0  # force the join path
    try:
        join_assign = sorted(
            (r.vec_id, r.cell)
            for r in S.ivf_assign(corpus, cents).collect()
        )
        join_topk = sorted(
            tuple(r)
            for r in S.ivf_topk(corpus, queries, cents, k=3).collect()
        )
    finally:
        S._IVF_LITERAL_MAX_TERMS = old

    assert lit_assign == join_assign
    assert lit_topk == join_topk


def test_ivf_large_codebook_assigns_fast(spark):
    """The join path keeps IVF usable at real codebook sizes: K=256
    cells over 128-dim vectors (32,768 terms — 8x the literal ceiling)
    must assign end-to-end in seconds; the literal path's
    expression-build alone measured ~0.4s/centroid (~100s here)."""
    import random
    import time

    from pyspark.sql import functions as F

    from postgresimporter_spark.operators.similarity import ivf_assign

    dim, K = 128, 256
    rnd = random.Random(5)
    cents = [(i, [rnd.random() for _ in range(dim)]) for i in range(K)]
    corpus = (
        spark.range(2000)
        .select(
            F.col("id").alias("vec_id"),
            F.array(
                *[
                    ((F.xxhash64(F.col("id"), F.lit(d)) % 1000) / 1000.0)
                    .cast("float")
                    for d in range(dim)
                ]
            ).alias("embedding"),
        )
        .localCheckpoint()
    )
    t0 = time.perf_counter()
    n = ivf_assign(corpus, cents).count()
    elapsed = time.perf_counter() - t0
    assert n == 2000
    assert elapsed < 30, f"IVF large-codebook assign took {elapsed:.1f}s"


def test_kmeans_assign_literal_and_join_paths_identical(spark):
    """Same r13 literal-ceiling family for k-means: both assignment
    paths must agree exactly — fold order, lowest-cid tiebreak, and
    duplicate-vector multiplicity."""
    from pyspark.sql import functions as F

    from postgresimporter_spark.operators import kmeans as KM

    dim = 8
    import random

    rnd = random.Random(3)
    cents = [[rnd.random() for _ in range(dim)] for _ in range(6)]
    base = (
        spark.range(200)
        .select(
            (F.col("id") % 100).alias("seed"), F.col("id").alias("vec_id")
        )
        .select(
            "vec_id",
            F.array(
                *[
                    (
                        (F.xxhash64(F.col("seed"), F.lit(d)) % 1000)
                        / 1000.0
                    )
                    for d in range(dim)
                ]
            ).alias("v"),
        )
        .localCheckpoint()
    )
    lit = sorted(
        (r.vec_id, r.cid)
        for r in KM.assign_clusters(base, cents).collect()
    )
    old = KM._LITERAL_ASSIGN_MAX_TERMS
    KM._LITERAL_ASSIGN_MAX_TERMS = 0
    try:
        joined = sorted(
            (r.vec_id, r.cid)
            for r in KM.assign_clusters(base, cents).collect()
        )
    finally:
        KM._LITERAL_ASSIGN_MAX_TERMS = old
    assert lit == joined


def test_null_embedding_inputs_are_loud_or_sql_consistent(spark):
    """r13 NULL sweep: rows whose embedding generation failed upstream
    are NULLs in a real pipeline. Clustering/quantization inits must
    raise a named ValueError (was: bare TypeError iterating None), and
    the grouped-centroid pandas op must skip NULLs exactly like its
    SQL oracle's unnest (NULL array -> no rows)."""
    import pytest
    from pyspark.sql import functions as F

    from postgresimporter_spark.operators.kmeans import kmeans_lloyd
    from postgresimporter_spark.operators.pandas_ops import label_centroids
    from postgresimporter_spark.operators.quantize import pq_train_encode

    null_emb = spark.range(20).select(
        F.col("id").alias("vec_id"),
        F.lit(None).cast("array<float>").alias("embedding"),
        (F.col("id") % 2).cast("int").alias("label"),
    )
    with pytest.raises(ValueError, match="NULL embedding"):
        kmeans_lloyd(null_emb, k=4)
    with pytest.raises(ValueError, match="NULL embedding"):
        pq_train_encode(null_emb, dim=8, m=2, k=4)
    # all-NULL group contributes nothing, like unnest(NULL)
    assert label_centroids(null_emb).count() == 0

    # mixed: NULL rows are skipped, non-null rows aggregate normally
    mixed = spark.range(6).select(
        F.col("id").alias("vec_id"),
        F.when(
            F.col("id") < 3,
            F.array(F.lit(1.0), F.lit(3.0)).cast("array<float>"),
        ).alias("embedding"),
        F.lit(0).cast("int").alias("label"),
    )
    rows = {r.dim: r.mean_val for r in label_centroids(mixed).collect()}
    assert rows == {1: 1.0, 2: 3.0}
