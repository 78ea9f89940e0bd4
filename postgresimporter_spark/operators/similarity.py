"""Similarity search over an embedding column (``array<float>``).

Baseline: brute-force cosine top-k — exact, O(N*Q), fine when the query
set is small and broadcastable (the common "probe a corpus" shape).

Scale path: LSH bucketing (random hyperplane signatures) so candidate
generation touches only same-bucket rows; brute-force then runs within
buckets. At 100 TB the corpus side stays partitioned, queries broadcast.

Dot products use ``F.zip_with`` + ``F.aggregate`` — JVM-side, no Python.
Doubles accumulate in array-index order, so the result is deterministic
for a given row (independent of partitioning), which keeps the operator
differentially testable against a sequential oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _shuffle_partitions(spark) -> int:
    """The session's configured shuffle width — the scale-adaptive
    partition count for explicit repartitions (conf-derived; local
    default is the core count, cluster deployments size it to 2-3x
    total executor cores per session.py's posture)."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return 200


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``broadcast(queries)`` turns the cross join into a map-side nested
    loop over the partitioned corpus — no shuffle of the corpus, ever.
    Top-k per query via window row_number (score desc, id asc tiebreak).
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id), F.col(vec_col).alias("_qvec")
        )
    )
    scored = corpus.select(
        F.col(corpus_id), F.col(vec_col).alias("_cvec")
    ).crossJoin(q)
    sim = cosine(F.col("_cvec"), F.col("_qvec"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    w = Window.partitionBy(query_id).orderBy(
        F.desc("score"), F.asc(corpus_id)
    )
    return (
        scored.withColumn("score", sim)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(query_id, corpus_id, "score", "rank")
    )


def hyperplane_signature(
    vec: Column, planes: list[list[float]]
) -> Column:
    """Random-hyperplane LSH signature: bit b = sign(vec . plane_b).

    Planes are literals (driver-generated, seeded) — the signature is a
    pure projection, no shuffle.
    """
    bits = [
        F.when(
            _dot(vec, F.array(*[F.lit(float(x)) for x in plane])) >= 0, F.lit(1)
        ).otherwise(F.lit(0))
        for plane in planes
    ]
    return F.concat_ws("", *[b.cast("string") for b in bits])


def multiprobe_signatures(sig: Column, n_planes: int) -> Column:
    """The signature plus its one-bit-flipped neighbors (multi-probe
    LSH): probing adjacent buckets recovers most of the recall lost to
    an unlucky hyperplane without adding planes or shrinking buckets."""
    flips = [
        F.concat(
            F.substring(sig, 1, b),
            (F.lit(1) - F.substring(sig, b + 1, 1).cast("int")).cast(
                "string"
            ),
            F.substring(sig, b + 2, n_planes - b - 1),
        )
        for b in range(n_planes)
    ]
    return F.array(sig, *flips)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    k: int = 5,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
    multiprobe: bool = False,
) -> DataFrame:
    """Approximate top-k: compare only vectors sharing an LSH bucket.

    Equi-join on the signature replaces the cross join; recall depends
    on the plane count (more planes -> smaller buckets -> faster/lower
    recall). ``multiprobe=True`` additionally probes every one-bit-
    flipped bucket of each query (corpus side unchanged — the explosion
    stays on the small broadcast side).
    """
    sig = lambda df, idc: df.select(  # noqa: E731
        F.col(idc),
        F.col(vec_col).alias(f"_{idc}_vec"),
        hyperplane_signature(F.col(vec_col), planes).alias("_sig"),
    )
    c = sig(corpus, corpus_id)
    q = sig(queries, query_id)
    if multiprobe:
        q = q.select(
            query_id,
            f"_{query_id}_vec",
            F.explode(
                multiprobe_signatures(F.col("_sig"), len(planes))
            ).alias("_sig"),
        )
    q = F.broadcast(q)
    scored = c.join(q, on="_sig")
    if multiprobe:
        # a corpus vector can match a query through several probes
        scored = scored.dropDuplicates([corpus_id, query_id])
    sim = cosine(F.col(f"_{corpus_id}_vec"), F.col(f"_{query_id}_vec"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    w = Window.partitionBy(query_id).orderBy(
        F.desc("score"), F.asc(corpus_id)
    )
    return (
        scored.withColumn("score", sim)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(query_id, corpus_id, "score", "rank")
    )


# Codebook size (cells x dim) above which IVF assignment and probe
# selection switch from plan-literal centroid expressions to a
# broadcast centroid table (r13 probe — same failure family as PQ's
# _LITERAL_ASSIGN_MAX_TERMS): building K cosine expressions costs
# ~0.4s of DRIVER time per centroid through the Python Column API —
# measured 2.2s at K=16 dim=64 but 392s at a FAISS-typical K=1024
# dim=768, pure expression-build cost at 500 rows. The join variant
# (distinct vectors x broadcast centroids, argmax via max-of-(score,
# -cid) struct, join back on vector equality) is bit-identical
# (pinned by test: same cosine fold, same lowest-cid tiebreak) and
# read 12.1s END-TO-END at the shape above — and unlike the literal
# projection it parallelizes the K x dim fold across partitions
# instead of evaluating one giant expression per row. The literal
# path stays below the threshold: zero joins/shuffles, and the
# catalog-pinned q46/q97 plans are byte-stable.
_IVF_LITERAL_MAX_TERMS = 4096


def _ivf_assign_join(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str,
) -> DataFrame:
    """Large-codebook IVF assignment via a broadcast centroid join —
    see ``_IVF_LITERAL_MAX_TERMS``. Value-level: distinct vectors are
    scored (duplicates pay once), the winning cell joins back on
    null-safe vector equality (array equality is exact — the vectors
    are the join key, so every input row keeps its multiplicity)."""
    spark = df.sparkSession
    rows = [(int(cid), [float(x) for x in vec]) for cid, vec in centroids]
    cents = spark.createDataFrame(rows, "cid int, _cent array<double>")
    vals = df.select(F.col(vec_col).alias("_v")).distinct()
    cell_map = (
        vals.join(F.broadcast(cents))
        .withColumn("_s", cosine(F.col("_v"), F.col("_cent")))
        .groupBy("_v")
        .agg(
            F.max(
                F.struct(F.col("_s"), (-F.col("cid")).alias("neg"))
            ).alias("_b")
        )
        .select(F.col("_v"), (-F.col("_b.neg")).cast("int").alias("cell"))
    )
    return df.join(
        cell_map, df[vec_col].eqNullSafe(cell_map["_v"])
    ).drop("_v")


def ivf_assign(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (IVF coarse quantizer).

    Centroids are driver-provided literals (seeded k-means in a real
    deployment; any deterministic pick works for the index structure).
    Assignment is a pure projection — no shuffle; at 100 TB the corpus
    can then be repartitioned/bucketed by ``cell`` once so every probe
    touches only its cells' partitions. Codebooks past
    ``_IVF_LITERAL_MAX_TERMS`` switch to a broadcast centroid join
    (bit-identical; the literal projection's expression-build cost is
    measured unusable there).
    """
    if (
        centroids
        and len(centroids) * len(centroids[0][1]) > _IVF_LITERAL_MAX_TERMS
    ):
        return _ivf_assign_join(df, centroids, vec_col)
    # linear-size argmax: array of (score, -cid) structs + array_max.
    # (A when/otherwise chain embeds prior subtrees twice per level —
    # exponential expression size, minutes of codegen at larger K.)
    # Lexicographic max of (score, -cid) = best score, ties -> lowest cid.
    entries = F.array(
        *[
            F.struct(
                cosine(
                    F.col(vec_col),
                    F.array(*[F.lit(float(x)) for x in vec]),
                ).alias("score"),
                F.lit(-cid).alias("negcid"),
            )
            for cid, vec in centroids
        ]
    )
    best = F.array_max(entries)
    return df.withColumn("cell", (-best["negcid"]).cast("int"))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    k: int = 5,
    nprobe: int = 2,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """IVF-style ANN: probe only the ``nprobe`` cells nearest each query.

    The corpus-side join key is the cell id, so a probe reads ~nprobe/K
    of the corpus instead of all of it — the standard inverted-file
    trade (recall vs. cells probed).
    """
    c = ivf_assign(corpus, centroids, vec_col).select(
        F.col(corpus_id), F.col(vec_col).alias("_cvec"), "cell"
    )

    if (
        centroids
        and len(centroids) * len(centroids[0][1]) > _IVF_LITERAL_MAX_TERMS
    ):
        # large codebook (see _IVF_LITERAL_MAX_TERMS): probe cells via
        # the broadcast centroid table + a per-query top-nprobe window
        # — queries are the small broadcastable side, so the window
        # input is |queries| x K rows, and the ordering (cscore desc,
        # cell asc) matches the literal path's sort_array tiebreak.
        spark = corpus.sparkSession
        rows = [
            (int(cid), [float(x) for x in vec]) for cid, vec in centroids
        ]
        cents = spark.createDataFrame(rows, "cid int, _cent array<double>")
        wq = Window.partitionBy(query_id).orderBy(
            F.desc("_cscore"), F.asc("cid")
        )
        probes = F.broadcast(
            queries.select(
                F.col(query_id), F.col(vec_col).alias("_qvec")
            )
            .join(F.broadcast(cents))
            .withColumn("_cscore", cosine(F.col("_qvec"), F.col("_cent")))
            .withColumn("_r", F.row_number().over(wq))
            .where(F.col("_r") <= nprobe)
            .select(query_id, "_qvec", F.col("cid").cast("int").alias("cell"))
        )
    else:
        # query -> its nprobe nearest cells: per-row struct array sorted
        # desc + slice + explode (no union fan-out, no window shuffle).
        # Sort desc on (cscore, -cell): ties -> lowest cell first,
        # matching ROW_NUMBER() OVER (ORDER BY cscore DESC, cell).
        entries = F.array(
            *[
                F.struct(
                    cosine(
                        F.col(vec_col),
                        F.array(*[F.lit(float(x)) for x in vec]),
                    ).alias("cscore"),
                    F.lit(-cid).alias("negcell"),
                )
                for cid, vec in centroids
            ]
        )
        top_cells = F.slice(F.sort_array(entries, asc=False), 1, nprobe)
        probes = F.broadcast(
            queries.select(
                F.col(query_id),
                F.col(vec_col).alias("_qvec"),
                F.explode(top_cells).alias("_p"),
            ).select(
                query_id,
                "_qvec",
                (-F.col("_p.negcell")).cast("int").alias("cell"),
            )
        )

    scored = c.join(probes, on="cell")
    sim = cosine(F.col("_cvec"), F.col("_qvec"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    w = Window.partitionBy(query_id).orderBy(
        F.desc("score"), F.asc(corpus_id)
    )
    return (
        scored.withColumn("score", sim)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(query_id, corpus_id, "score", "rank")
    )


def signband_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    bands: int = 4,
    bits_per_band: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    max_bucket_ratio: float | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via sign-bit band LSH.

    Band ``b``'s key = the sign bits of components
    ``[b*bits_per_band, (b+1)*bits_per_band)``; two vectors are
    candidates iff they share at least one band key (axis-aligned
    hyperplane LSH — each sign bit is the hyperplane ``x_d >= 0``).
    Candidates are verified with the exact cosine, so precision is 1;
    recall comes from the band count (a near-dup pair disagrees on few
    signs, so some 4-bit band almost surely matches — and for vectors
    whose per-dim perturbation never crosses zero, recall is exactly 1).

    Scale shape mirrors MinHash-LSH: explode ``bands`` short keys per
    row, hash equi-join on (band, key), dedup pairs, verify. The corpus
    is never self-crossed; the only shuffle is on band keys (2^bits
    buckets per band — increase ``bits_per_band`` to sharpen buckets at
    scale). Axis-aligned planes keep the signature SQL-expressible, so
    the operator stays differentially testable (oracle: q85).

    ``max_bucket_ratio`` is the hot-bucket skew guard (same posture as
    the Jaccard hot-shingle cap): a band bucket holding more than that
    fraction of rows carries little selectivity but quadratic join
    cost, so its rows are dropped FROM THAT BAND ONLY — pairs also
    sharing a rare band survive. The corpus size joins in as a
    broadcast 1-row aggregate (plan construction launches no job).

    Duplicate-value compression (round 10; same identity-rewrite
    pattern as ``mih_match_index``/SymSpell in r9): banding, candidate
    join, and cosine verify all run over DISTINCT vectors — k exact
    copies of a vector (the crawl re-post shape) would otherwise put
    k² candidate rows through the join, each dragging two full
    embedding arrays. Measured on sf0.1 embeddings with every vector
    duplicated 10x: the id-level join exceeded 600s; value-level runs
    in seconds (see BUILD_NOTES r10). Matches expand back to id pairs
    LAST, verified-and-vector-free; a value's own duplicate family
    (cosine(v, v), including the NaN zero-vector case — Spark orders
    NaN above all doubles, so it passes ``>=`` exactly as the id-level
    join did) pairs its ids iff the value kept at least one un-capped
    band, preserving the skew-guard semantics bit-for-bit. The bucket
    cap itself counts ROWS (ids, weighted by the value's multiplicity),
    not distinct values — identical membership to the id-level join.
    """
    # ---- value level: one row per DISTINCT vector -------------------
    # The value key is md5 over the array's string form (deterministic
    # JVM double formatting), not the array itself: grouping and the
    # two expansion joins then run on a 32-char string instead of a
    # 64-double array — measured 3x faster end-to-end on the spread
    # shape. (-0.0 and 0.0 format differently, so such twins stay
    # separate values; they still pair through the band join like any
    # two near-identical vectors, so output semantics are unchanged.
    # md5 collisions (2^-128) are the same accepted bet as the
    # repo-wide _md5_long hashing.) vid = min id of the family
    # (deterministic, unlike monotonically_increasing_id); cnt weights
    # the bucket cap.
    ids = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.md5(F.col(vec_col).cast("string")).alias("vkey"),
    )
    vals = (
        ids.groupBy("vkey")
        .agg(
            F.min("id").alias("vid"),
            F.count("*").alias("cnt"),
            F.first("vec").alias("vec"),
        )
        .localCheckpoint(eager=False)
    )

    sign_bits = F.transform(
        F.col("vec"), lambda x: F.when(x >= 0, F.lit("1")).otherwise(F.lit("0"))
    )
    entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "",
                    *[
                        F.element_at(sign_bits, b * bits_per_band + d + 1)
                        for d in range(bits_per_band)
                    ],
                ).alias("key"),
            )
            for b in range(bands)
        ]
    )
    keyed = vals.select(
        "vid", "vec", "cnt", F.explode(entries).alias("e")
    ).select("vid", "vec", "cnt", "e.band", "e.key")
    # Explicit (band, key) partitioning (r14): the candidate join's
    # domain is at most bands x 2^bits_per_band short keys, so its
    # post-shuffle BYTES are tiny and AQE coalesces the exchange to 1-2
    # partitions — but the per-partition work (quadratic per-bucket
    # pair expansion + a 64-double cosine per candidate) is the
    # operator's entire CPU, and byte-based coalescing is blind to it
    # (measured sf1 q85: the whole verify on 2 tasks, 8.75s executor
    # time, 30 cores idle). An explicit REPARTITION_BY_NUM is exempt
    # from AQE coalescing, and one exchange now serves BOTH the bucket
    # cap's groupBy and the self-join (each previously shuffled on its
    # own). Parallelism is still bounded by the distinct-key domain —
    # the banding config's own limit, not this exchange's.
    keyed = keyed.repartition(
        _shuffle_partitions(df.sparkSession), "band", "key"
    )

    if max_bucket_ratio is not None:
        # the cap counts ROWS (each value weighted by its multiplicity)
        # against the id-level corpus size — identical bucket
        # membership to the id-level formulation
        n_rows = df.agg(F.count("*").cast("double").alias("_n"))
        cool = (
            keyed.groupBy("band", "key")
            .agg(F.sum("cnt").alias("_sz"))
            .crossJoin(F.broadcast(n_rows))
            .where(F.col("_sz") <= F.lit(max_bucket_ratio) * F.col("_n"))
            .select("band", "key")
        )
        keyed = keyed.join(F.broadcast(cool), on=["band", "key"])

    # ---- candidates + verify at value level -------------------------
    # verify in the join (q129 discipline) with the vectors projected
    # away immediately after
    a, b_ = keyed.alias("a"), keyed.alias("b")
    score = F.round(
        cosine(F.col("a.vec"), F.col("b.vec")), round_digits
    )
    pair_cond = F.col("a.vid") < F.col("b.vid")
    if max_bucket_ratio is None:
        # Uncapped: a pair is a candidate once per agreeing band, and
        # band agreement is row-local (both vectors cross the join for
        # the cosine verify) — the first-agreeing-band filter makes
        # the pair stream already-distinct and the pair-dedup exchange
        # disappears (r14, the dedup._first_by_case discipline). The
        # per-band test rebuilds the KEY STRING itself from each
        # side's vector, so "agrees" is exactly join-key equality.
        # With the cap on, "first agreeing SURVIVING band" depends on
        # which buckets the cap dropped — not row-local — so the
        # capped path keeps its dropDuplicates.
        from .dedup import _first_by_case

        def _band_key(side: str, j: int) -> Column:
            # flat expressions, not transform(...) — higher-order
            # functions are interpreted per row. Mirrors the key
            # construction bit-for-bit: NULL components key as "0"
            # (the transform lambda's otherwise), NaN >= 0 is true,
            # and a vector shorter than bands*bits_per_band raises the
            # same ANSI element_at error the key construction raises.
            vec = F.col(f"{side}.vec")
            return F.concat_ws(
                "",
                *[
                    F.when(
                        F.element_at(vec, j * bits_per_band + d + 1) >= 0,
                        F.lit("1"),
                    ).otherwise(F.lit("0"))
                    for d in range(bits_per_band)
                ],
            )

        def _band_eq(j: int) -> Column:
            return _band_key("a", j) == _band_key("b", j)

        pair_cond = pair_cond & _first_by_case(
            [_band_eq(j) for j in range(bands)],
            "band",
            check_current=False,  # the band key IS the join key
        )
    vmatches = (
        a.join(b_, on=["band", "key"])
        .where(pair_cond)
        .select(
            F.col("a.vid").alias("vid_a"),
            F.col("b.vid").alias("vid_b"),
            score.alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
    if max_bucket_ratio is not None:
        vmatches = vmatches.dropDuplicates(["vid_a", "vid_b"])

    # a duplicate family pairs within itself iff the value kept >= 1
    # un-capped band (exactly when the id-level join would have seen
    # the family share a surviving bucket); cosine(v, v) is computed,
    # not assumed 1.0, so the NaN zero-vector edge keeps id-level
    # semantics (Spark sorts NaN above all doubles, so NaN >= t holds)
    self_score = F.round(cosine(F.col("vec"), F.col("vec")), round_digits)
    self_matches = (
        keyed.where(F.col("cnt") >= 2)
        .select("vid", "vec")
        .dropDuplicates(["vid"])
        .select(
            F.col("vid").alias("vid_a"),
            F.col("vid").alias("vid_b"),
            self_score.alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )

    # ---- expand back to id pairs LAST (one fused join tree: within-
    # family rows union into the value-pair list as (vid, vid) rows,
    # the same shape as dedup._expand_value_pairs) ---------------------
    members = ids.join(
        vals.select("vkey", "vid"), on="vkey"
    ).select("vid", "id")
    allp = vmatches.unionByName(self_matches)
    return (
        allp.join(
            members.select(
                F.col("vid").alias("vid_a"), F.col("id").alias("ia")
            ),
            on="vid_a",
        )
        .join(
            members.select(
                F.col("vid").alias("vid_b"), F.col("id").alias("ib")
            ),
            on="vid_b",
        )
        .where(
            (F.col("vid_a") != F.col("vid_b"))
            | (F.col("ia") < F.col("ib"))
        )
        .select(
            F.least("ia", "ib").alias("id_a"),
            F.greatest("ia", "ib").alias("id_b"),
            "cosine",
        )
    )


def merge_topk(
    prev_topk: DataFrame,
    batch: DataFrame,
    queries: DataFrame,
    k: int = 5,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """Incremental top-k maintenance: merge a NEW corpus batch into an
    existing per-query top-k WITHOUT re-scanning history, via the
    monotone identity ``topk(A ∪ B) = topk(topk(A) ∪ topk(B))``.

    ``prev_topk`` is a stored (query_id, corpus_id, score, rank) result
    (e.g. yesterday's ``brute_force_topk`` output); only the new batch
    is scored. At 100 TB this turns daily index refresh from a full
    corpus scan into a batch-sized scan plus a 2k-row-per-query merge —
    the incremental-view-maintenance shape for similarity serving.
    Correct as long as history rows never change (append-only corpus);
    deletions require a rebuild or a tombstone pass.

    Ties across the merge resolve by (score desc, id asc) — the same
    total order as ``brute_force_topk``, so the merged result is
    bit-identical to a from-scratch recompute over A ∪ B. A corpus id
    present on BOTH sides (a replayed/duplicated batch row) is deduped
    before ranking via max(score) per (query, id) — when scoring is
    deterministic the duplicate rows are identical and this is exact;
    if the sides genuinely disagree (mismatched round_digits, a vector
    mutated between runs) the resolution is still DETERMINISTIC
    (better score wins), never partition-order-dependent. That makes
    the merge idempotent: re-merging an already-merged batch is a
    no-op, which is what lets an at-least-once delivery upstream
    compose into an exactly-once standings table.
    """
    new_scored = brute_force_topk(
        batch,
        queries,
        k=k,
        corpus_id=corpus_id,
        query_id=query_id,
        vec_col=vec_col,
        round_digits=round_digits,
    )
    merged = (
        prev_topk.select(query_id, corpus_id, "score")
        .unionByName(new_scored.select(query_id, corpus_id, "score"))
        .groupBy(query_id, corpus_id)
        .agg(F.max("score").alias("score"))
    )
    w = Window.partitionBy(query_id).orderBy(
        F.desc("score"), F.asc(corpus_id)
    )
    return (
        merged.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(query_id, corpus_id, "score", "rank")
    )


def semdedup(
    corpus: DataFrame,
    centroids: list[tuple[int, list[float]]],
    tau: float = 0.95,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) semantic deduplication: assign each
    vector to its nearest centroid, then WITHIN each cell drop any
    vector that has a >= ``tau``-cosine cellmate sitting closer to the
    centroid (ties on centroid similarity: the lower id survives).
    Returns the survivors as (id, cell, centroid_sim).

    One-shot rule, no iteration — exactly the paper's formulation, and
    every comparison happens on ROUNDED cosines so the keep/drop
    decision is engine- and partitioning-independent.

    Scale shape: the pairwise work is within-cell only, so the number
    of centroids K is the quadratic bound's knob (pick K ~ N / target
    cell size; SemDeDup runs ~1e5 clusters at LAION scale). The cell
    join is a hash equi-join; assignments are a pure projection
    (localCheckpointed — they feed both join sides and the final
    anti-join, and the K cosine evaluations must not be inlined into
    each consumer).

    Duplicate-value compression (round 10): centroid assignment and
    the within-cell pairwise join run over DISTINCT vectors — k exact
    copies (the crawl re-post shape) made every cell k-fold bigger and
    the pairwise join k^2-fold, each row dragging two full embedding
    arrays (the 10x-duplicated sf0.1 probe ran 8.7s spread and did not
    finish in 10+ minutes row-level; value-level is seconds). The
    row-level drop rule decomposes exactly at value level: a member x
    of value V is dropped iff (a) some tau-similar cellmate value has
    STRICTLY greater centroid_sim (drops the whole family), or (b) a
    tau-similar EQUAL-centroid_sim value W contains an id below x —
    i.e. x.id > min over such W of vid_W — or (c) x is not its own
    family's min id and the family's self-similarity (cosine(v, v),
    computed not assumed, preserving the NaN zero-vector edge) clears
    tau. All three reduce to per-value aggregates (any-greater flag,
    min equal-csim dropper vid), so the expansion back to members is a
    join plus row-local comparisons — no pairwise work at id level.
    """
    entries = F.array(
        *[
            F.struct(
                cosine(
                    F.col("_v"),
                    F.array(*[F.lit(float(x)) for x in vec]),
                ).alias("score"),
                F.lit(-cid).alias("negcid"),
            )
            for cid, vec in centroids
        ]
    )
    best = F.array_max(entries)
    ids = corpus.select(
        F.col(corpus_id).alias("id"),
        F.col(vec_col).alias("_v"),
        F.coalesce(
            F.md5(F.col(vec_col).cast("string")), F.lit("")
        ).alias("_vk"),
    )
    vals = ids.groupBy("_vk").agg(
        F.min("id").alias("vid"),
        F.count("*").alias("cnt"),
        F.first("_v").alias("_v"),
    )
    assigned = vals.select(
        "_vk",
        "vid",
        "cnt",
        "_v",
        (-best["negcid"]).cast("int").alias("cell"),
        F.round(best["score"], round_digits).alias("centroid_sim"),
        F.round(
            cosine(F.col("_v"), F.col("_v")), round_digits
        ).alias("_self_sim"),
    ).localCheckpoint(eager=False)

    a, b = assigned.alias("a"), assigned.alias("b")
    sim = F.round(cosine(F.col("a._v"), F.col("b._v")), round_digits)
    eq_csim = F.col("b.centroid_sim") == F.col("a.centroid_sim")
    droppers = (
        a.join(b, on="cell")
        .where((F.col("a.vid") != F.col("b.vid")) & (sim >= tau))
        .where(
            (F.col("b.centroid_sim") > F.col("a.centroid_sim")) | eq_csim
        )
        .groupBy(F.col("a.vid").alias("vid"))
        .agg(
            F.max(
                F.col("b.centroid_sim") > F.col("a.centroid_sim")
            ).alias("_any_closer"),
            F.min(F.when(eq_csim, F.col("b.vid"))).alias("_min_eq_vid"),
        )
    )
    meta = assigned.join(droppers, on="vid", how="left")
    members = ids.select("_vk", "id").join(
        meta.select(
            "_vk",
            "vid",
            "cell",
            "centroid_sim",
            "_self_sim",
            "_any_closer",
            "_min_eq_vid",
        ),
        on="_vk",
    )
    survives = (
        ~F.coalesce(F.col("_any_closer"), F.lit(False))
        & (
            F.col("_min_eq_vid").isNull()
            | (F.col("id") < F.col("_min_eq_vid"))
        )
        & (
            (F.col("id") == F.col("vid"))
            | ~(F.col("_self_sim") >= F.lit(tau))
        )
    )
    return members.where(survives).select(
        F.col("id").alias(corpus_id), "cell", "centroid_sim"
    )


def dcg_gain_table(k: int) -> list[float]:
    """Literal DCG gain per rank 1..k (1/log2(rank+1)), computed ONCE in
    Python and inlined into both the Spark plan and the SQL oracle —
    engine log() ULP differences can never surface."""
    import math

    return [1.0 / math.log2(r + 1) for r in range(1, k + 1)]


def retrieval_metrics(
    exact: DataFrame,
    approx: DataFrame,
    k: int,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
) -> DataFrame:
    """Ranking-quality evaluation of an approximate retrieval against
    exact top-k: per query, hit count, MRR (reciprocal rank of the
    exact nearest neighbor in the approximate list, 0 if absent) and
    binary-gain NDCG@k (gain 1 for every approximate result inside the
    exact top-k).

    Both inputs are (query_id, corpus_id, score, rank) as produced by
    ``brute_force_topk`` / ``ivf_topk`` / ``lsh_topk``. Joins are on
    (query, id) — per-query metadata scale. The DCG fold runs over the
    SORTED rank list (ascending) with a literal gain table, so double
    accumulation order is fixed and engine-identical.
    """
    gains = dcg_gain_table(k)
    idcg = 0.0
    for g in gains:  # sequential fold, same order as the engines'
        idcg += g
    gains_arr = F.array(*[F.lit(g) for g in gains])

    e = exact.select(
        F.col(query_id).alias("_q"),
        F.col(corpus_id).alias("_i"),
        F.col("rank").alias("_erank"),
    )
    a = approx.select(
        F.col(query_id).alias("_q"),
        F.col(corpus_id).alias("_i"),
        F.col("rank").alias("_arank"),
    )
    hits = a.join(e, on=["_q", "_i"])
    per_q = hits.groupBy("_q").agg(
        F.count("*").cast("long").alias("n_hits"),
        F.aggregate(
            F.transform(
                F.sort_array(F.collect_list(F.col("_arank").cast("int"))),
                lambda r: F.element_at(gains_arr, r),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("_dcg"),
    )
    first = (
        e.where(F.col("_erank") == 1)
        .join(a, on=["_q", "_i"])
        .select("_q", F.col("_arank").alias("_frank"))
    )
    queries = e.select("_q").distinct()
    return (
        queries.join(per_q, on="_q", how="left")
        .join(first, on="_q", how="left")
        .select(
            F.col("_q").alias(query_id),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias(
                "n_hits"
            ),
            F.round(
                F.coalesce(F.lit(1.0) / F.col("_frank"), F.lit(0.0)), 6
            ).alias("mrr"),
            F.round(
                F.coalesce(F.col("_dcg"), F.lit(0.0)) / F.lit(idcg), 6
            ).alias("ndcg"),
        )
    )


def mutual_topk_pairs(
    df: DataFrame,
    k: int = 3,
    bands: int = 4,
    bits_per_band: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    max_bucket_ratio: float | None = None,
) -> DataFrame:
    """Reciprocal (mutual) k-nearest-neighbor pairs: keep (a, b) only
    when b ranks in a's top-k AND a ranks in b's top-k among the LSH
    candidate neighbors. The standard precision filter for embedding
    near-dup clustering — one-sided neighbors (a hub vector that is
    'near' everything) generate false merges, and mutuality removes
    exactly those.

    Shape: candidates + exact cosines come from
    ``signband_neardup_pairs`` (threshold −1 keeps every verified
    candidate), checkpointed ONCE because both rank directions read
    it; ranking is a per-source window (partitioned — never global);
    mutuality is a self equi-join of the two bounded top-k lists
    (≤ k·N rows each). At scale the candidate volume is controlled
    the same way as q85: more ``bits_per_band`` → smaller buckets,
    ``max_bucket_ratio`` caps hot buckets.

    Returns (id_a < id_b, cosine, rank_ab, rank_ba).
    """
    pairs = signband_neardup_pairs(
        df,
        threshold=-1.0,
        bands=bands,
        bits_per_band=bits_per_band,
        id_col=id_col,
        vec_col=vec_col,
        round_digits=round_digits,
        max_bucket_ratio=max_bucket_ratio,
    )
    directed = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst"), "cosine"
    ).unionAll(
        pairs.select(
            F.col("id_b").alias("src"), F.col("id_a").alias("dst"), "cosine"
        )
    )
    w = Window.partitionBy("src").orderBy(F.desc("cosine"), F.asc("dst"))
    ranked = (
        directed.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .localCheckpoint(eager=False)  # both mutuality sides read it
    )
    rev = ranked.select(
        F.col("dst").alias("src"),
        F.col("src").alias("dst"),
        F.col("rank").alias("rank_ba"),
    )
    return (
        ranked.join(rev, on=["src", "dst"])
        .where(F.col("src") < F.col("dst"))
        .select(
            F.col("src").alias("id_a"),
            F.col("dst").alias("id_b"),
            "cosine",
            F.col("rank").alias("rank_ab"),
            F.col("rank_ba").alias("rank_ba"),
        )
    )


__all__ = [
    "cosine",
    "brute_force_topk",
    "hyperplane_signature",
    "lsh_topk",
    "ivf_assign",
    "ivf_topk",
    "signband_neardup_pairs",
    "mutual_topk_pairs",
    "semdedup",
    "merge_topk",
    "retrieval_metrics",
    "dcg_gain_table",
]
