"""Deduplication operators over the ``documents`` table.

Four tiers, cheapest first (SURVEY §2.10):

- exact: content hash + keep-one-canonical-row. One shuffle on the hash.
- n-gram Jaccard: shingle join for candidate pairs, exact Jaccard on top.
- MinHash-LSH: signature bands -> bucket join -> verify. Scales to 100 TB
  because candidate generation never compares all pairs: only rows sharing
  a band bucket meet, and bucket skew is bounded by the band width.
- SimHash: 64-bit fingerprint; near-dups = small Hamming distance.

All hashing is md5-based (not Spark's murmur ``F.hash``) so results are
engine-independent — the DuckDB oracle computes identical md5 values,
which makes these operators differentially testable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _spread(df: DataFrame) -> DataFrame:
    """Ensure CPU-heavy per-row stages use the cluster.

    A small parquet file arrives as 1-2 input splits (row-group bound),
    serializing the shingle/hash computation on one core. If the input
    reads far fewer files than the session's parallelism, repartition
    up; with realistically-partitioned input (100 TB = ~800k files)
    this is a no-op — no shuffle is added at scale. Gated on
    ``inputFiles()`` (scan metadata) rather than ``df.rdd`` — touching
    ``.rdd`` forces analysis AND builds a Python RDD wrapper per call.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        n_inputs = len(df.inputFiles())
    except Exception:  # non-file-backed plan (e.g. createDataFrame)
        n_inputs = 0
    if n_inputs < max(2, target // 2):
        return df.repartition(target)
    return df


def _wide(df: DataFrame) -> DataFrame:
    """Unconditionally re-spread a tiny-bytes, CPU-heavy intermediate
    (r14). AQE's byte-based coalescing packs a distinct-fingerprint
    table (8-byte rows) into 1-2 post-shuffle partitions, and every
    downstream explode (combo band keys, XOR probe neighborhoods) then
    runs on 1-2 cores — measured on q291 at the 10x tier: the whole
    probe enumeration on ONE task, 4.5s executor time, 7.7MB shuffle
    written from one core. Coalescing sizes tasks by their INPUT
    bytes, which is exactly wrong for a stage whose output fans out
    hundreds of rows per input row. The widening exchange moves a few
    bytes per row — negligible at any scale — while the explode width
    it buys is the operator's parallelism, so this is unconditional,
    not shape-gated like ``_spread``."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def _first_match_mask(x: Column, key_masks: list[int], radius: int, key_col: str) -> Column:
    """True iff ``key_col`` (the banding-key index a candidate pair was
    joined on) is the FIRST index whose masked slice of the pair XOR
    ``x`` is within ``radius`` flips (r14). Banded Hamming joins find a
    true pair once per agreeing key; the classic fix is a post-verify
    ``dropDuplicates`` — a full shuffle of every true pair. But "does
    key j agree" is row-local given both fingerprints (bit_count of the
    masked XOR), so keeping exactly the row joined at the first agreeing
    key makes the pair stream already-distinct and the dedup exchange
    disappears (guide §2.4). The join itself guarantees the CURRENT key
    agrees for every injectively-keyed banding (probe masks enumerate
    <= radius flips; combo keys are injective bit-packs), but the
    current key is re-tested anyway so the rule stays exactly-once even
    on the hash-keyed combo lookup path, where a collision row can sit
    at a key that does NOT truly agree: such a row fails the
    current-key test outright (whether its pair's first truly-agreeing
    key lies before or after it), and the pair still surfaces exactly
    once — at its first truly-agreeing key, where equal chunks force
    equal hashes, so the join is guaranteed to fire there."""
    signed = [m - (1 << 64) if m >= (1 << 63) else m for m in key_masks]
    arr = F.array(*[F.lit(m).cast("long") for m in signed])

    def agree(m: Column) -> Column:
        return F.bit_count(x.bitwiseAND(m)) <= F.lit(radius)

    return agree(F.element_at(arr, F.col(key_col) + 1)) & ~F.exists(
        F.slice(arr, F.lit(1), F.col(key_col)), agree
    )


def _first_by_case(eqs: list[Column], key_col: str, check_current: bool) -> Column:
    """First-agreeing-key filter as a FLAT CASE over the (small, static)
    key count — the codegen-friendly sibling of ``_first_match_mask``
    for bandings whose agreement test compares array elements rather
    than bit masks. Higher-order-function filters (slice + zip_with +
    exists over the two signature arrays) are interpreted per candidate
    row and measured SLOWER than the dropDuplicates they replace
    (wmh_dup4 8.5 -> 18s); a when-chain of plain element comparisons
    stays inside whole-stage codegen. ``eqs[j]`` must be the row-local
    "key j agrees" predicate; ``check_current`` re-tests the current
    key (needed when the join key is a HASH of the agreement tuple, so
    a collision row cannot slip through as exactly-once; pass False
    when the join key IS the agreement tuple)."""
    none_earlier = F.when(F.col(key_col) == 0, F.lit(True))
    acc = None
    for j in range(1, len(eqs)):
        acc = eqs[j - 1] if acc is None else (acc | eqs[j - 1])
        none_earlier = none_earlier.when(F.col(key_col) == j, ~acc)
    none_earlier = none_earlier.otherwise(F.lit(False))
    if not check_current:
        return none_earlier
    current = F.when(F.col(key_col) == 0, eqs[0])
    for j in range(1, len(eqs)):
        current = current.when(F.col(key_col) == j, eqs[j])
    return current.otherwise(F.lit(False)) & none_earlier


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one canonical row (min id) per distinct text.

    Hash-groupBy: one shuffle on the (content-hashed) key; map-side
    partial min keeps the shuffle small. At 100 TB, group on
    ``sha2(text)`` instead of raw text to bound shuffle record width.
    """
    return (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("content_hash"))
        .agg(
            F.min(id_col).alias(id_col),
            F.count("*").alias("n_copies"),
        )
        .select(id_col, "content_hash", "n_copies")
    )


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingle array (distinct, whitespace-tokenized).

    Built by zipping the token array with its own 1..n-1-shifted
    slices and joining each zipped row — one vectorized pass, no
    per-element ``element_at``/``slice`` lambda (measured 4x faster
    than the index-transform formulation on the 10x corpus; the
    shingle build fronts every Jaccard/MinHash/containment operator,
    so this is hot-path). Documents shorter than ``n`` yield their
    single partial shingle, exactly as before: ``concat_ws`` skips the
    NULLs that ``arrays_zip`` pads short slices with."""
    toks = F.split(F.trim(text), r"\s+")
    ln = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    z = F.arrays_zip(
        *[F.slice(toks, i + 1, ln).alias(f"c{i}") for i in range(n)]
    )
    return F.array_distinct(
        F.transform(
            z, lambda s: F.concat_ws(" ", *[s[f"c{i}"] for i in range(n)])
        )
    )


def _text_values(
    df: DataFrame, text_col: str, id_col: str
) -> tuple[DataFrame, DataFrame]:
    """Collapse exact-duplicate texts to one VALUE row (the round-10
    extension of the r8/r9 distinct-before-expand pattern to the text
    Jaccard family): returns ``(vals, members)`` where ``vals`` has one
    row per distinct text — (vid = min id of the family, cnt =
    multiplicity, _t = the text) — and ``members`` maps vid -> every
    id. Keyed on md5(text) so the groupBy/joins move a 32-char string,
    never the document body; NULL texts key to "" (md5 never returns
    ""), so they group instead of dropping out of the equi-joins."""
    ids = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("_t"),
        F.coalesce(F.md5(F.col(text_col)), F.lit("")).alias("_vk"),
    )
    vals = (
        ids.groupBy("_vk")
        .agg(
            F.min("id").alias("vid"),
            F.count("*").alias("cnt"),
            F.first("_t").alias("_t"),
        )
        .localCheckpoint(eager=False)
    )
    members = ids.join(vals.select("_vk", "vid"), on="_vk").select(
        "vid", "id"
    )
    return vals, members


def _expand_value_pairs(
    vpairs: DataFrame,
    self_vids: DataFrame,
    members: DataFrame,
    score_col,
    self_score,
) -> DataFrame:
    """Expand value-level pair results back to id pairs through ONE
    join tree: within-family rows (``self_vids``, scored with the
    constant ``self_score``) union into the value-pair list as
    (vid, vid) rows first, then two equi-joins on vid fan out to
    members. Cross-value pairs appear exactly once (families are
    disjoint; least/greatest restores the id_a < id_b contract);
    same-value rows keep only the ia < ib half. One expansion path
    instead of a cross/within pair of join trees — measured worth
    ~0.3s of fixed stage overhead per query at sf0.1.

    ``score_col``/``self_score`` accept a single name/Column or
    parallel lists of them (weighted MinHash carries the sketch
    estimate AND the exact score). Scores must be SYMMETRIC in the
    pair — anything direction-dependent needs the swap-aware
    expansion (``audiofp.audio_neardup_pairs``)."""
    score_cols = [score_col] if isinstance(score_col, str) else list(score_col)
    self_scores = (
        [self_score] if not isinstance(self_score, (list, tuple))
        else list(self_score)
    )
    allp = vpairs.unionByName(
        self_vids.select(
            F.col("vid").alias("vid_a"),
            F.col("vid").alias("vid_b"),
            *[s.alias(c) for s, c in zip(self_scores, score_cols)],
        )
    )
    return (
        allp.join(
            members.select(
                F.col("vid").alias("vid_a"), F.col("id").alias("_ia")
            ),
            on="vid_a",
        )
        .join(
            members.select(
                F.col("vid").alias("vid_b"), F.col("id").alias("_ib")
            ),
            on="vid_b",
        )
        .where(
            (F.col("vid_a") != F.col("vid_b"))
            | (F.col("_ia") < F.col("_ib"))
        )
        .select(
            F.least("_ia", "_ib").alias("id_a"),
            F.greatest("_ia", "_ib").alias("id_b"),
            *score_cols,
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_ratio: float | None = None,
) -> DataFrame:
    """Near-duplicate pairs by exact n-gram Jaccard similarity.

    Candidate generation by shingle equi-join (only pairs sharing >=1
    shingle meet — a shuffle join on shingle, never a cross join), then
    exact |A ∩ B| / |A ∪ B| from the shared-shingle count.

    Scale posture: hot shingles (stop-phrase skew) are the join's skew
    risk — ``max_doc_ratio`` drops shingles appearing in more than that
    fraction of documents before the join (they generate candidate
    pairs without discriminating); the Jaccard is then computed over
    the surviving shingle space. AQE's skew handling covers the rest.

    Duplicate-value compression (round 10): shingling, the shingle
    join, and the intersection aggregate all run over DISTINCT texts —
    k exact copies of a document (the crawl re-post shape) put
    S-shared-shingles x k^2 rows through the join and aggregate in the
    row-level formulation (measured 2.0s -> 25s on sf0.1 documents
    duplicated 10x; value-level runs the same corpus in ~3s with the
    identical pair set). A family pairs within itself (Jaccard exactly
    1.0 — identical shingle sets) iff it kept >= 1 surviving shingle,
    matching the row-level join's shared-shingle candidate
    requirement; the hot-shingle document frequency weights each value
    by its multiplicity, so the drop set is identical to row level.
    Matches expand back to id pairs LAST.
    """
    vals, members = _text_values(df, text_col, id_col)
    sh = _spread(vals).select(
        "vid", "cnt", shingles(F.col("_t"), n).alias("sh")
    )
    exploded_raw = sh.select(
        "vid", "cnt", F.explode("sh").alias("shingle")
    )

    if max_doc_ratio is not None:
        # document frequency = ids, not values: weight by multiplicity
        n_docs = df.agg(F.count("*").cast("double").alias("_n_docs"))
        rare = (
            exploded_raw.groupBy("shingle")
            .agg(F.sum("cnt").alias("_df"))
            .crossJoin(F.broadcast(n_docs))
            .where(F.col("_df") <= F.lit(max_doc_ratio) * F.col("_n_docs"))
            .select("shingle")
        )
        exploded_raw = exploded_raw.join(rare, on="shingle")

    sizes = exploded_raw.groupBy("vid").agg(F.count("*").alias("n_sh"))
    exploded = exploded_raw.select("vid", "shingle").join(sizes, on="vid")
    a, b = exploded.alias("a"), exploded.alias("b")
    vpairs = (
        a.join(b, on="shingle")
        .where(F.col("a.vid") < F.col("b.vid"))
        .groupBy(
            F.col("a.vid").alias("vid_a"),
            F.col("b.vid").alias("vid_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count("*").alias("n_common"))
    )
    jacc = F.col("n_common") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    )
    vpairs = (
        vpairs.withColumn("jaccard", F.round(jacc, 6))
        .where(F.col("jaccard") >= threshold)
        .select("vid_a", "vid_b", "jaccard")
    )
    # identical texts have Jaccard exactly 1.0; the family self-pairs
    # iff it kept >= 1 surviving shingle (the row-level candidate
    # requirement) and 1.0 clears the threshold
    self_vids = (
        vals.where(F.col("cnt") >= 2)
        .join(sizes, on="vid")
        .select("vid")
        if threshold <= 1.0
        else vals.where(F.lit(False)).select("vid")
    )
    return _expand_value_pairs(
        vpairs, self_vids, members, "jaccard", F.lit(1.0)
    )


def _drop_hot_shingles(
    exploded: DataFrame, df: DataFrame, max_doc_ratio: float
) -> DataFrame:
    """Keep only (id, shingle) rows whose shingle appears in at most
    ``max_doc_ratio`` of documents — the stop-phrase skew guard: hot
    shingles generate candidate pairs without discriminating, and at
    100 TB one boilerplate phrase would concentrate the shingle join.

    The corpus size joins in as a broadcast 1-row aggregate (not an
    eager ``df.count()`` — plan construction must not launch a job)."""
    n_docs = df.agg(F.count("*").cast("double").alias("_n_docs"))
    rare = (
        exploded.groupBy("shingle")
        .agg(F.count_distinct("id").alias("_df"))
        .crossJoin(F.broadcast(n_docs))
        .where(F.col("_df") <= F.lit(max_doc_ratio) * F.col("_n_docs"))
        .select("shingle")
    )
    return exploded.join(rare, on="shingle")


def hot_shingles(
    df: DataFrame,
    max_doc_ratio: float,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The shingles appearing in MORE than ``max_doc_ratio`` of ``df``'s
    documents, as a 1-column (shingle) DataFrame — the drop list an
    index build should PERSIST next to its ``minhash_band_index`` so
    probes exclude exactly the same shingles regardless of batch size
    (a probe batch's own document frequencies are meaningless for a
    1-doc batch: every shingle has ratio 1.0)."""
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), n)).alias("shingle"),
    )
    n_docs = df.agg(F.count("*").cast("double").alias("_n_docs"))
    return (
        exploded.groupBy("shingle")
        .agg(F.count_distinct("id").alias("_df"))
        .crossJoin(F.broadcast(n_docs))
        .where(F.col("_df") > F.lit(max_doc_ratio) * F.col("_n_docs"))
        .select("shingle")
    )


def _md5_long(c: Column, seed: int) -> Column:
    """Deterministic 60-bit integer hash from md5 (engine-independent:
    DuckDB computes the identical value). 15 hex chars avoids sign
    overflow in a signed 64-bit conv."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(str(seed) + ":"), c)), 1, 15), 16, 10
    ).cast("long")


# MinHash universe: h_i(s) = (A_i * base(s) + B_i) mod P, with
# base(s) = md5-derived 60-bit int mod P. One md5 per shingle, then
# num_hashes cheap integer derivations (the classic a*x+b family).
# P = 2^31 - 1 keeps every product within signed-64 range.
MINHASH_P = 2_147_483_647


def minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (A_i, B_i) pairs (odd multipliers, distinct offsets)."""
    return [(2 * i + 1, i * i + i + 1) for i in range(num_hashes)]


def hash_bucket(c: Column, n: int) -> Column:
    """Deterministic bucket 0..n-1 from md5 (engine-independent; the
    oracle computes ('0x'||substr(md5(x),1,15))::BIGINT % n identically).
    15 hex chars keeps the value inside signed-64; NULL input -> NULL
    bucket (null-propagating, like SQL ||/md5)."""
    return (
        F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long") % n
    )


def _md5_base(c: Column) -> Column:
    """md5 -> 60-bit int -> mod P. Engine-independent."""
    return (
        F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")
        % MINHASH_P
    )


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_ratio: float | None = None,
    stop_shingles: DataFrame | None = None,
) -> DataFrame:
    """MinHash signature per document: min over the shingle set of each
    of ``num_hashes`` hash functions — one md5 per shingle, the
    per-function values are integer arithmetic on the shared base hash.

    ``max_doc_ratio`` drops shingles appearing in more than that
    fraction of THIS corpus's documents *before* hashing
    (boilerplate/stop-phrase guard: hot shingles both skew the LSH
    bucket join and drag every document's minima toward the same
    values, inflating estimated similarity between unrelated docs).
    ``stop_shingles`` is the explicit-drop-list alternative — a
    (shingle) DataFrame (see ``hot_shingles``) anti-joined before
    hashing; use it when the drop set must come from a DIFFERENT
    corpus than ``df`` (probing an index with a small batch).
    """
    # explode + one grouped aggregation: computes md5 exactly once per
    # shingle. (The pure-projection alternative — 16 array_min(transform)
    # over a bases column — looks shuffle-free but Catalyst's projection
    # collapse inlines the shingle+md5 lineage into each of the 16
    # consumers, recomputing it 16x.) The groupBy shuffles on doc id,
    # which AQE coalesces; map-side partial mins keep it small.
    exploded_sh = _spread(df).select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), n)).alias("shingle"),
    )
    if max_doc_ratio is not None:
        exploded_sh = _drop_hot_shingles(exploded_sh, df, max_doc_ratio)
    if stop_shingles is not None:
        exploded_sh = exploded_sh.join(
            F.broadcast(stop_shingles.select("shingle")),
            on="shingle",
            how="left_anti",
        )
    exploded = exploded_sh.select(
        "id", _md5_base(F.col("shingle")).alias("base")
    )

    mins = [
        F.min((F.lit(a) * F.col("base") + F.lit(b)) % MINHASH_P).alias(f"h{i}")
        for i, (a, b) in enumerate(minhash_coeffs(num_hashes))
    ]
    agg = exploded.groupBy("id").agg(*mins)
    return agg.select(
        "id",
        F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias(
            "signature"
        ),
    )


def _band_entries(sigs: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """(id, signature) -> one row per (id, signature, band, bucket).

    The bucket is md5 over the band's comma-joined sub-signature —
    engine-independent (the oracle rebuilds the identical hex string),
    and a single string key keeps the LSH join a plain hash equi-join.
    """
    return sigs.select(
        "id",
        "signature",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("signature")[b * rows_per_band + r]
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "signature", "bb.band", "bb.bucket")


def _sig_agreement(num_hashes: int) -> Column:
    """Estimated Jaccard: fraction of agreeing signature positions."""
    return (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                lambda m: m,
            )
        )
        / F.lit(num_hashes)
    )


def minhash_lsh_pairs(
    df: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_ratio: float | None = None,
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash-LSH, verified with
    estimated Jaccard (signature agreement rate).

    bands x rows-per-band = num_hashes; a pair is a candidate iff some
    band's sub-signature matches exactly (bucket equi-join on the band
    hash — the scale path: no all-pairs comparison ever happens).
    ``max_doc_ratio`` is the boilerplate guard (see minhash_signatures).

    Duplicated-input posture (round 10, measured): unlike the text
    Jaccard family, this operator stays at ROW level — signatures are
    short (num_hashes longs), so the 10x-duplicated sf0.1 probe cost
    only 2.6s id-level, while a value-level rewrite (distinct
    signatures + expansion joins) measured 6.9s on the same shape and
    +78% on the spread shape; the compression machinery costs more
    than the payload it saves (BUILD_NOTES r10). Exact-dup-heavy
    corpora should route through ``exact_dedup`` first (the same
    contract as the capped SimHash path). What IS taken from the q129
    discipline (sharpened in r14): multi-band hits are resolved by the
    first-agreeing-band filter inside the candidate join, so no pair
    ever reaches a dedup exchange at all.
    """
    rows_per_band = num_hashes // bands
    # Signatures are NOT checkpointed (r14): the self-join's two band
    # subtrees are canonically identical and bounded by the signature
    # groupBy's exchange, so AQE computes the shingle+md5 fold stage
    # once and reuses it (verified: one fold stage executes, action
    # time flat) — while the lazy checkpoint materialized the subtree
    # at build time as serialized micro-jobs plus a plan compile per
    # invocation. Projection collapse cannot inline the fold into the
    # band consumers either way: it sits below the aggregate boundary.
    sigs = minhash_signatures(
        df, num_hashes, n, text_col, id_col, max_doc_ratio=max_doc_ratio
    )

    band_entries = _band_entries(sigs, bands, rows_per_band)

    a, b = band_entries.alias("a"), band_entries.alias("b")
    # first-agreeing-band filter instead of dropDuplicates (r14, the
    # _first_match_mask discipline): a pair is a candidate once per
    # agreeing band, and band agreement is row-local here — both
    # signatures already cross the band join for the verify — so
    # keeping only the row whose band is the first agreeing one emits
    # every pair exactly once and the pair-dedup exchange disappears
    # (guide §2.4). Signatures are one-row-per-id (minhash_signatures
    # groups by id), so band rows cannot duplicate a pair within a
    # band. The filter runs before the agreement estimate, so
    # multi-band pairs also stop paying the verify per agreeing band.
    def _band_eq(j: int) -> Column:
        eq = F.lit(True)
        for r in range(rows_per_band):
            eq = eq & (
                F.col("a.signature")[j * rows_per_band + r]
                == F.col("b.signature")[j * rows_per_band + r]
            )
        return eq

    first = _first_by_case(
        [_band_eq(j) for j in range(bands)], "band", check_current=True
    )
    return (
        a.join(b, on=["band", "bucket"])
        .where((F.col("a.id") < F.col("b.id")) & first)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.signature").alias("sig_a"),
            F.col("b.signature").alias("sig_b"),
        )
        .withColumn("est_jaccard", F.round(_sig_agreement(num_hashes), 6))
        .where(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def minhash_band_index(
    df: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_ratio: float | None = None,
    stop_shingles: DataFrame | None = None,
) -> DataFrame:
    """Persistable banded MinHash index over a (history) corpus: one row
    per (id, signature, band, bucket).

    This is the artifact an incremental dedup pipeline stores (e.g. as a
    parquet table partitioned/bucketed by ``bucket``) and appends each
    accepted batch to; ``minhash_match_index`` probes it with new
    documents WITHOUT recomputing history signatures. At 100 TB the
    index is O(corpus x bands) small rows and the probe touches only the
    new batch's buckets — corpus history is never re-shingled.

    When building with ``max_doc_ratio``, ALSO persist
    ``hot_shingles(df, max_doc_ratio)`` next to the index and pass it
    as ``stop_shingles`` to every probe and append (the drop set must
    be the history corpus's, never a small batch's own estimate).
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(
        df, num_hashes, n, text_col, id_col,
        max_doc_ratio=max_doc_ratio,
        stop_shingles=stop_shingles,
    ).localCheckpoint(eager=False)
    return _band_entries(sigs, bands, rows_per_band)


def minhash_match_index(
    index: DataFrame,
    new_df: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_batch: bool = True,
    max_doc_ratio: float | None = None,
    stop_shingles: DataFrame | None = None,
) -> DataFrame:
    """Incremental near-dup detection: match a NEW batch of documents
    against an existing ``minhash_band_index`` (corpus history) without
    touching history text. Returns (new_id, hist_id, est_jaccard) for
    every history doc whose estimated Jaccard with a new doc clears
    ``threshold``.

    Scale shape: signatures are computed for the new batch only; the
    (band, bucket) equi-join probes the stored index. A typical
    ingest batch is tiny next to corpus history, so the batch side
    broadcasts (``broadcast_batch``) and the index — the 100 TB side —
    never shuffles. Hash params MUST match the ones the index was built
    with (same num_hashes/bands/n); mismatched params silently produce
    disjoint buckets.

    If the index was built with hot-shingle dropping, probe with
    ``stop_shingles`` = the drop list PERSISTED from the index build
    (``hot_shingles`` over the history corpus) — that excludes exactly
    the shingles the index excluded for any batch size.
    ``max_doc_ratio`` estimates the drop set from the BATCH's own
    document frequencies instead, which is only meaningful for large
    batches (a 1-doc batch has ratio 1.0 for every shingle and would
    drop them all — prefer ``stop_shingles``).
    """
    rows_per_band = num_hashes // bands
    # batch signatures are NOT checkpointed (r14): they have exactly one
    # consumer (the probe entries below), so the checkpoint bought no
    # recompute protection — only a build-time plan compile plus a
    # serialized micro-job chain per probe call, which at one call per
    # micro-batch is pure per-batch latency
    new_sigs = minhash_signatures(
        new_df, num_hashes, n, text_col, id_col,
        max_doc_ratio=max_doc_ratio,
        stop_shingles=stop_shingles,
    )
    new_entries = _band_entries(new_sigs, bands, rows_per_band)
    if broadcast_batch:
        new_entries = F.broadcast(new_entries)
    # verify BEFORE deduplicating (the hamming_pairs_mih discipline):
    # the agreement estimate is a row-local array_* expression streamed
    # out of the candidate join, while dropDuplicates is a full
    # shuffle — filtering first means the dedup exchange carries only
    # threshold-passing (new_id, hist_id) pairs, never sub-threshold
    # candidates dragging two full signatures each.
    return (
        index.alias("h")
        .join(new_entries.alias("b"), on=["band", "bucket"])
        .select(
            F.col("b.id").alias("new_id"),
            F.col("h.id").alias("hist_id"),
            F.col("b.signature").alias("sig_a"),
            F.col("h.signature").alias("sig_b"),
        )
        .withColumn("est_jaccard", F.round(_sig_agreement(num_hashes), 6))
        .where(F.col("est_jaccard") >= threshold)
        .select("new_id", "hist_id", "est_jaccard")
        .dropDuplicates(["new_id", "hist_id"])
    )


def ordered_pair_structs(
    arr: Column, a_name: str = "a", b_name: str = "b"
) -> Column:
    """All ordered pairs (a < b by array position) from a SORTED array,
    as an array of structs — the executor-side pair expansion shared by
    ``cross_source_overlap`` and ``graph.cooccurrence_edges``. The
    2-param transform lambda receives (element, index); the expansion
    is O(len²) IN A SINGLE ROW VALUE, so callers must bound the array
    size first (a skew cap) — arrays are not spillable mid-row.
    """
    return F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + F.lit(2), F.size(arr)),
                lambda y: F.struct(x.alias(a_name), y.alias(b_name)),
            ),
        )
    )


def explode_ordered_pairs(
    df: DataFrame,
    arr_col: str,
    a_name: str = "a",
    b_name: str = "b",
    keep: list[str] | None = None,
) -> DataFrame:
    """All ordered pairs (a < b by array position) from a SORTED array
    column, as rows — the DataFrame-level sibling of
    ``ordered_pair_structs`` (r13): a two-step Generate expansion
    (posexplode, then explode of the positional tail slice) that stays
    on the codegen path, where the nested-HOF in-row expansion
    evaluates interpreted lambdas and allocates a slice per element —
    measured 2.1x slower on the sf1 co-purchase build (1.38s vs 0.65s
    for the identical 1.196M pair multiset). Same contract: O(len²)
    output per row, callers bound the array size first. ``keep`` lists
    passthrough columns."""
    keep = keep or []
    pos, arr = f"_opp_i_{a_name}", f"_opp_arr_{a_name}"
    return (
        df.select(
            *keep,
            F.col(arr_col).alias(arr),
            F.posexplode(F.col(arr_col)).alias(pos, a_name),
        )
        .select(
            *keep,
            F.col(a_name),
            F.explode(
                F.slice(arr, F.col(pos) + F.lit(2), F.size(arr))
            ).alias(b_name),
        )
    )


def cross_source_overlap(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Contamination matrix between corpus subsets: for every pair of
    ``group_col`` values, the number of DISTINCT contents (sha256 of
    text) present in both. The standard pre-training audit for
    train/eval or crawl/crawl leakage.

    Scale shape: distinct (group, hash) -> groupBy hash collecting the
    (bounded: #groups) sorted source set -> explode the per-hash pair
    combinations -> count per pair. Two shuffles, the second on a
    pair-key domain of at most #groups^2 rows; no self-join of the
    corpus against itself.
    """
    gh = df.select(
        F.col(group_col).alias("_g"),
        F.sha2(F.col(text_col), 256).alias("_h"),
    ).distinct()
    sets = (
        gh.groupBy("_h")
        .agg(F.sort_array(F.collect_set("_g")).alias("_gs"))
        .where(F.size("_gs") >= 2)
    )
    # per-hash group set is bounded by #groups, so the pair expansion
    # is safe without a cap
    pairs = explode_ordered_pairs(sets, "_gs", "source_a", "source_b")
    return (
        pairs.groupBy("source_a", "source_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )


def simhash(
    df: DataFrame,
    bits: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """SimHash fingerprint: bit i of the fingerprint = sign of the sum of
    (+1/-1) votes from each token's hash bit i.

    md5-derived bits keep it engine-independent. Computed as a pure
    per-row array fold (token array -> ONE md5 per token -> per-bit
    vote vector via ``zip_with`` accumulation -> fingerprint from a
    literal power table): NO explode, NO shuffle, fully scan-local.
    Same wall-clock as the explode + 32-column groupBy layout at sf0.1
    (~1.1s, measured with forced evaluation — ``count()`` prunes the
    projection and lies) and bit-identical (integer votes are
    order-independent); the win is the removed corpus-wide token
    shuffle, which is what matters at 100 TB. The md5 MUST be hashed
    in the outer fold lambda, once per token — hashing inside the
    per-bit lambda re-evaluates it ``bits`` times (measured 8x
    slower).
    """
    df = _spread(df)
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    votes = F.aggregate(
        F.transform(toks, lambda t: _md5_long(t, 0)),
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(bits - 1)),
                lambda b: F.when(F.getbit(h, b) == 1, 1).otherwise(-1),
            ),
            lambda a, v: a + v,
        ),
    )
    powers = F.array(*[F.lit(2**i).cast("long") for i in range(bits)])
    fingerprint = F.aggregate(
        F.zip_with(
            votes,
            powers,
            lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda a, v: a + v,
    )
    return df.select(
        F.col(id_col).alias("id"), fingerprint.alias("simhash")
    )


def simhash_hamming_pairs(
    fingerprints: DataFrame,
    bits: int = 32,
    chunks: int = 4,
    max_hamming: int = 3,
    id_col: str = "id",
    hash_col: str = "simhash",
    combo_size: int | None = None,
    max_band_ratio: float | None = None,
) -> DataFrame:
    """All pairs of fingerprints within ``max_hamming`` bit flips,
    found WITHOUT an all-pairs comparison.

    Classic exact Hamming-join banding: split the ``bits``-bit
    fingerprint into ``chunks`` equal chunks and equi-join on
    (chunk index, chunk value). When ``max_hamming < chunks``, the
    pigeonhole principle guarantees every qualifying pair shares at
    least one unchanged chunk, so the banded candidate set is EXACT —
    no recall loss, and the join is a hash equi-join on short keys
    instead of an O(n²) scan. Verification = ``bit_count(a XOR b)``,
    pure JVM bit math.

    Sharper keys, same guarantee: with ``h = max_hamming`` flips, at
    most h chunks change, so at least ``chunks - h`` survive — hence
    every qualifying pair agrees on some SUBSET of ``chunks - h``
    chunks, and the join key can be the concatenation of a whole
    chunk-combination instead of a single chunk. C(chunks, chunks-h)
    combination keys of ``width x (chunks-h)`` bits are dramatically
    more selective than single ``width``-bit chunks (measured at sf0.1:
    6.75M -> 1.2M candidate rows for the q86 configuration) at the cost
    of a slightly wider explode. ``combo_size`` overrides the default
    ``max(1, chunks - max_hamming)`` (1 reproduces plain banding).

    Input: a DataFrame of (id, simhash) — compose with ``simhash()``.
    At 100 TB the only shuffle is the combo-key join; hot key values
    (correlated fingerprints from near-identical docs) behave like hot
    shingles. ``max_band_ratio`` is the built-in skew guard matching
    Jaccard's ``max_doc_ratio``: band keys carried by more than that
    fraction of fingerprints are dropped BEFORE the self-join (a
    pre-join frequency aggregate, so the hot key never shuffles into a
    quadratic bucket). The trade is explicit, never silent: with the
    cap on, a pair whose EVERY agreeing chunk-combination is hot is
    missed — exactness holds over the surviving band space — and
    ``hot_bands()`` returns exactly the dropped keys with their
    frequencies so the run can report them. Exact duplicates
    (hamming 0) are the usual hot-band cause; route those through
    ``exact_dedup`` first (a plain groupBy — no pair expansion), then
    hamming-join the distinct fingerprints.
    """
    fps, keyed, cmasks = _combo_keyed(
        fingerprints, bits, chunks, max_hamming, id_col, hash_col, combo_size
    )
    hamming = F.bit_count(
        F.col("a.fp").bitwiseXOR(F.col("b.fp"))
    ).cast("long")
    if max_band_ratio is not None:
        # Capped path: stays on the ROW-level banding layout — the
        # max_band_ratio / hot_bands audit contract is defined on
        # per-fingerprint-ROW band frequencies (q283 verifies it
        # externally), so the value compression below must not change
        # what "hot" means here. Verify still runs before the dedup
        # shuffle.
        cold = _band_freqs(keyed, fps).where(
            F.col("_freq") <= F.lit(max_band_ratio) * F.col("_n_fps")
        ).select("chunk", "val")
        keyed = keyed.join(cold, on=["chunk", "val"])
        a, b = keyed.alias("a"), keyed.alias("b")
        return (
            a.join(b, on=["chunk", "val"])
            .where((F.col("a.id") < F.col("b.id")) & (hamming <= max_hamming))
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                hamming.alias("hamming"),
            )
            .dropDuplicates(["id_a", "id_b"])
        )

    # Uncapped path: band DISTINCT fingerprint VALUES, not rows — the
    # same two structural moves as ``hamming_pairs_mih`` (duplicate
    # families collapse onto few values, and the candidate join is
    # quadratic in bucket size; verify runs before the dedup shuffle
    # so the exchange carries only true value pairs). Value pairs
    # expand back to id pairs with plain equi-joins — exactly the
    # true output; same-value (hamming 0) pairs come from one
    # fp-equality self-join. This subsumes the docstring's
    # "exact_dedup first, then join distinct fingerprints" advice.
    # checkpoint=False: vals sits just above the _wide exchange, whose
    # stage AQE computes once and reuses across the self-join's two
    # identical subtrees — the checkpoint only added a build-time plan
    # compile + micro-job chain per invocation
    vals = _wide(fps.select(F.col("fp").alias("v")).distinct())
    _, keyed_v, vmasks = _combo_keyed(
        vals, bits, chunks, max_hamming, "v", "v", combo_size, checkpoint=False
    )
    a, b = keyed_v.alias("a"), keyed_v.alias("b")
    # first-agreeing-combo filter instead of dropDuplicates: each true
    # value pair is emitted exactly once, so the post-verify dedup
    # exchange (a full shuffle of every true pair) disappears
    first = _first_match_mask(
        F.col("a.fp").bitwiseXOR(F.col("b.fp")), vmasks, 0, "chunk"
    )
    vpairs = (
        a.join(b, on=["chunk", "val"])
        .where(
            (F.col("a.fp") < F.col("b.fp")) & (hamming <= max_hamming) & first
        )
        .select(
            F.col("a.fp").alias("fp_a"),
            F.col("b.fp").alias("fp_b"),
            hamming.alias("hamming"),
        )
    )
    cross = (
        vpairs.join(
            fps.select(F.col("fp").alias("fp_a"), F.col("id").alias("_ia")),
            on="fp_a",
        )
        .join(
            fps.select(F.col("fp").alias("fp_b"), F.col("id").alias("_ib")),
            on="fp_b",
        )
        .select(
            F.least("_ia", "_ib").alias("id_a"),
            F.greatest("_ia", "_ib").alias("id_b"),
            "hamming",
        )
    )
    same = (
        fps.alias("x")
        .join(fps.alias("y"), on="fp")
        .where(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.lit(0).cast("long").alias("hamming"),
        )
    )
    return cross.unionByName(same)


def hamming_pairs_mih(
    fingerprints: DataFrame,
    bits: int = 64,
    blocks: int = 4,
    max_hamming: int = 10,
    id_col: str = "id",
    hash_col: str = "simhash",
    max_probe_masks: int = 4096,
    align_cols: list[str] | None = None,
) -> DataFrame:
    """Exact Hamming join via multi-index hashing (Norouzi et al.,
    "Fast Exact Search in Hamming Space with Multi-Index Hashing",
    CVPR'12 — public) — the HIGH-RADIUS companion to
    ``simhash_hamming_pairs``.

    Split the fingerprint into ``blocks`` equal blocks. Pigeonhole: a
    pair within ``h = max_hamming`` flips has SOME block with at most
    ``s = h // blocks`` flips (if every block had ``s+1``, the total
    would be ``blocks*(s+1) > h``). So the index side emits one
    (block, value) row per block, the probe side emits every value
    within Hamming ``s`` of each block (``V = sum_{i<=s} C(width, i)``
    enumerated XOR masks), and a plain equi-join + bit_count verify is
    EXACT — no recall loss.

    Cost model vs the combo-key path (which to pick): per fingerprint,
    combos cost ``C(chunks, chunks-h)`` band rows with very selective
    ``(chunks-h)*width``-bit keys; MIH costs ``blocks + blocks*V``
    rows with ``width``-bit keys. At the image-pHash config (64 bits,
    h=10): combos = 8008 rows/fp with 24-bit keys; MIH (blocks=4) =
    4 + 548 rows/fp with 16-bit keys. MIH is ~15x cheaper on the
    linear explode and the standard choice once ``h`` grows past
    ~bits/6; combos win when candidate verification dominates (tighter
    keys). Both are exact; both shuffle only short keys, never an
    all-pairs. ``max_probe_masks`` bounds the enumerated neighborhood
    and RAISES when exceeded (no silent cap) — the fix is more blocks
    (smaller per-block radius), not a trimmed mask set.

    ``align_cols``: extra columns that must be EQUAL between the two
    rows of a pair (e.g. a frame timestamp for timeline-aligned video
    matching). They do not change the banded candidate join — banding
    stays over distinct fingerprint VALUES — but they become part of
    the join keys of the id expansion and the equal-fingerprint self
    join, so misaligned pairs are never materialized and a single hot
    fingerprint value (a corpus-wide static frame) no longer funnels
    its whole row set through one join key: the equal-value join key
    becomes (fp, align...), whose skew is bounded by the per-align
    bucket instead of the corpus-wide value count. Output gains the
    align columns (equal across the pair, emitted once). A caller
    that filters pair alignment AFTER this join should pass the
    column here instead — same result, none of the quadratic
    cross-align waste. Rows with a NULL align value match NOTHING
    (SQL equality semantics, identical to the documented post-filter
    equivalence: ``a.col = b.col`` is never true at null) — impute or
    drop null align values upstream if they should pair.
    """
    if bits % blocks:
        raise ValueError("bits must divide evenly into blocks")
    width = bits // blocks
    if width > 62:
        raise ValueError("block width must fit a signed long")
    mask = (1 << width) - 1
    s = max_hamming // blocks
    import itertools
    import math

    n_masks = sum(math.comb(width, i) for i in range(s + 1))
    if n_masks > max_probe_masks:
        raise ValueError(
            f"MIH probe neighborhood C({width}, <= {s}) = {n_masks} masks "
            f"exceeds max_probe_masks={max_probe_masks}; raise `blocks` so "
            "the per-block radius shrinks"
        )
    xor_masks = [0]
    for k in range(1, s + 1):
        for comb in itertools.combinations(range(width), k):
            m = 0
            for b in comb:
                m |= 1 << b
            xor_masks.append(m)

    acols = list(align_cols or [])
    reserved = {"id", "fp", "fp_a", "fp_b", "id_a", "id_b", "hamming",
                "_ia", "_ib", "block", "val"}
    bad = reserved.intersection(acols)
    if bad:
        raise ValueError(f"align_cols collide with internal names: {bad}")
    fps = fingerprints.select(
        F.col(id_col).alias("id"), F.col(hash_col).alias("fp"), *acols
    ).localCheckpoint(eager=False)

    # MIH runs over DISTINCT fingerprint VALUES, not rows: on a dedup
    # corpus (the intended workload) duplicate families collapse many
    # rows onto few values, shrinking every block bucket — and the
    # candidate join is quadratic in bucket size, so row-level buckets
    # on a concentrated corpus are the scale-killer (measured at sf1,
    # 50k docs in 10-copy near-dup families: 96s -> 5.8s for the
    # strict 2x16-bit config — which is output-bound there: 45M true
    # pairs within Hamming 3). Value pairs expand back to id pairs with plain
    # equi-joins at the end — that expansion is exactly the true
    # output, never a candidate set. On a spread-out corpus (values
    # ~= rows) this is the same plan plus one distinct.
    # vals is NOT checkpointed (r14): its two consumers (index entries
    # and probe neighborhoods) are canonically identical subtrees in
    # ONE downstream plan, bounded by the _wide exchange, so AQE
    # computes that shuffle stage once and reuses it — while a lazy
    # checkpoint materializes its subtree at build time as serialized
    # micro-jobs (one more driver-side plan compile + job chain per
    # invocation for zero executor work saved).
    vals = _wide(fps.select("fp").distinct())
    entries = F.array(
        *[
            F.struct(
                F.lit(i).alias("block"),
                F.shiftright(F.col("fp"), i * width)
                .bitwiseAND(F.lit(mask))
                .cast("long")
                .alias("val"),
            )
            for i in range(blocks)
        ]
    )
    index = vals.select("fp", F.explode(entries).alias("e")).select(
        "fp", "e.block", "e.val"
    )
    mask_arr = F.array(*[F.lit(m).cast("long") for m in xor_masks])
    probe = index.select(
        "fp", "block", "val", F.explode(mask_arr).alias("_m")
    ).select(
        "fp",
        "block",
        F.col("val").bitwiseXOR(F.col("_m")).alias("val"),
    )
    # verify inline: bit_count is one cheap row-local op streamed out
    # of the candidate join (a pair is found at most `blocks` times,
    # once per pigeonhole block within radius — the first-agreeing-
    # block filter below keeps exactly one, so no dedup shuffle runs
    # at all).
    hamming = F.bit_count(
        F.col("a.fp").bitwiseXOR(F.col("b.fp"))
    ).cast("long")
    # first-agreeing-block filter instead of dropDuplicates: a pair is
    # joined at block i iff that block is within radius s (each block
    # match comes from exactly ONE probe mask), so keeping only the row
    # whose earlier blocks all exceed s emits every true value pair
    # exactly once and the post-verify dedup exchange disappears
    block_masks = [mask << (i * width) for i in range(blocks)]
    first = _first_match_mask(
        F.col("a.fp").bitwiseXOR(F.col("b.fp")), block_masks, s, "block"
    )
    vpairs = (
        probe.alias("a")
        .join(index.alias("b"), on=["block", "val"])
        .where(
            (F.col("a.fp") < F.col("b.fp")) & (hamming <= max_hamming) & first
        )
        .select(
            F.col("a.fp").alias("fp_a"),
            F.col("b.fp").alias("fp_b"),
            hamming.alias("hamming"),
        )
    )
    # the second expansion join carries the align columns in its key,
    # so cross-align id pairs are never materialized; the first join
    # fans out linearly (rows carrying fp_a), never quadratically
    cross = (
        vpairs.join(
            fps.select(
                F.col("fp").alias("fp_a"), F.col("id").alias("_ia"), *acols
            ),
            on="fp_a",
        )
        .join(
            fps.select(
                F.col("fp").alias("fp_b"), F.col("id").alias("_ib"), *acols
            ),
            on=["fp_b", *acols],
        )
        .select(
            F.least("_ia", "_ib").alias("id_a"),
            F.greatest("_ia", "_ib").alias("id_b"),
            *acols,
            "hamming",
        )
    )
    same = (
        fps.alias("x")
        .join(fps.alias("y"), on=["fp", *acols])
        .where(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            *acols,
            F.lit(0).cast("long").alias("hamming"),
        )
    )
    return cross.unionByName(same)


def hot_bands(
    fingerprints: DataFrame,
    max_band_ratio: float,
    bits: int = 32,
    chunks: int = 4,
    max_hamming: int = 3,
    id_col: str = "id",
    hash_col: str = "simhash",
    combo_size: int | None = None,
) -> DataFrame:
    """The combo-band keys that ``simhash_hamming_pairs`` with the same
    parameters and ``max_band_ratio`` would DROP, as (chunk, val,
    n_fingerprints) rows — the no-silent-caps audit: a capped dedup run
    should count/log these next to its pair output, and an index build
    should persist them so later probe batches exclude exactly the same
    keys (mirrors ``hot_shingles`` for the Jaccard path)."""
    fps, keyed, _ = _combo_keyed(
        fingerprints, bits, chunks, max_hamming, id_col, hash_col, combo_size
    )
    return (
        _band_freqs(keyed, fps)
        .where(F.col("_freq") > F.lit(max_band_ratio) * F.col("_n_fps"))
        .select(
            "chunk", "val", F.col("_freq").alias("n_fingerprints")
        )
    )


def _band_freqs(keyed: DataFrame, fps: DataFrame) -> DataFrame:
    """Per combo-band-key fingerprint counts with the corpus size
    attached as a broadcast 1-row aggregate (no eager ``count()`` —
    plan construction must not launch a job). This is the pre-join
    aggregate both the cap and the ``hot_bands`` audit filter on."""
    n_fps = fps.agg(F.count("*").cast("double").alias("_n_fps"))
    return (
        keyed.groupBy("chunk", "val")
        .agg(F.count("*").cast("long").alias("_freq"))
        .crossJoin(F.broadcast(n_fps))
    )


def _combo_keyed(
    fingerprints: DataFrame,
    bits: int,
    chunks: int,
    max_hamming: int,
    id_col: str,
    hash_col: str,
    combo_size: int | None,
    checkpoint: bool = True,
):
    """Shared combo-key builder: the (id, fp) table and its exploded
    (id, fp, chunk, val) band rows. ``simhash_hamming_pairs`` and the
    ``hot_bands`` audit both call this, so the pigeonhole combo math
    exists exactly once. ``checkpoint=False`` skips the (id, fp)
    materialization for inputs that are ALREADY cheap to recompute
    (the distinct-value table, which sits just above a shuffle whose
    stage AQE reuses across the self-join's two identical subtrees) —
    a lazy checkpoint costs a driver-side plan compile plus a
    serialized micro-job chain per invocation."""
    if bits % chunks:
        raise ValueError("bits must divide evenly into chunks")
    width = bits // chunks
    mask = (1 << width) - 1
    if combo_size is not None and combo_size > chunks - max_hamming:
        # a pair with max_hamming flips can leave only chunks-max_hamming
        # chunks unchanged; a larger combo has no agreement guarantee.
        # (chunks <= max_hamming has NO guarantee at any combo size —
        # that degenerate config is rejected here too rather than
        # masked; the combo_size=None default then degrades to plain
        # single-chunk banding, which the docstring scopes as exact
        # only for max_hamming < chunks.)
        raise ValueError(
            "combo_size > chunks - max_hamming breaks the exact-recall "
            "pigeonhole guarantee"
        )
    if combo_size is not None and combo_size < 1:
        raise ValueError("combo_size must be >= 1")
    # the requested combo width is ALWAYS honored — no silent shrink
    # (advisor r6: the old C(chunks,m)<=256 clamp silently widened the
    # candidate buckets, e.g. 24-bit image keys degrading to 8-bit).
    # The two key-construction strategies below trade expression-tree
    # size against a broadcast join; neither changes m.
    m = combo_size if combo_size is not None else max(1, chunks - max_hamming)
    import itertools

    combos = list(itertools.combinations(range(chunks), m))
    n_combos = len(combos)
    # per-combo bit masks over the full fingerprint — the row-local
    # agreement test `(fp_a ^ fp_b) & cmask == 0` that lets callers
    # keep only the first-agreeing-combo row (see _first_match_mask)
    cmasks = []
    for combo in combos:
        cm = 0
        for c in combo:
            cm |= mask << (c * width)
        cmasks.append(cm)
    chunk_val = [
        F.shiftright(F.col("fp"), i * width).bitwiseAND(F.lit(mask))
        for i in range(chunks)
    ]
    # materialize at the FINGERPRINT level, before the combo expansion:
    # projection collapse would otherwise inline the fingerprint-defining
    # expression (the simhash() per-row fold — large) into every combo
    # key column AND both sides of the self-join, recomputing it ~2x(1 +
    # n_combos) times (measured: q86 3.4s -> 10s when the checkpoint sat
    # after the expansion). The combo bit-math recomputed per join side
    # is a handful of shifts — negligible.
    fps = fingerprints.select(
        F.col(id_col).alias("id"), F.col(hash_col).alias("fp")
    )
    if checkpoint:
        fps = fps.localCheckpoint(eager=False)
    if n_combos <= 256 and width * m <= 62:
        # Literal path: one packed-long key column per combo, codegen'd
        # in place — cheapest for the common small-combo configs
        # (q86/q231: C(4,2..3) and friends). Bounded at 256 combos and a
        # 62-bit pack because past that the literal expression tree blows
        # up the driver (observed: C(16,6)=8008 -> JVM OOM compiling a
        # 4-row query); larger configs take the lookup path below.
        packed = []
        for ci, combo in enumerate(combos):
            key = F.lit(0).cast("long")
            for j, c in enumerate(combo):
                key = key + F.shiftleft(chunk_val[c].cast("long"), j * width)
            packed.append(
                F.struct(F.lit(ci).alias("chunk"), key.alias("val"))
            )
        entries = F.array(*packed)
        keyed = fps.select(
            "id", "fp", F.explode(entries).alias("e")
        ).select("id", "fp", "e.chunk", "e.val")
        return fps, keyed, cmasks
    # Lookup path (large combo counts / wide packs): the combos live in
    # a broadcast table of (combo id, chunk-index array), not in the
    # expression tree, so the plan stays tiny at ANY C(chunks, m); the
    # band key is xxhash64(combo id, selected chunk values). Hash
    # collisions can only ADD candidates (verification filters on the
    # true Hamming distance), never lose recall, so exactness holds.
    # Cost model is the caller's informed choice: n_combos band rows per
    # fingerprint is the LINEAR cost that buys sub-quadratic candidate
    # volume — e.g. image pHash (bits=64, chunks=16, max_hamming=10)
    # pays 8008 rows/fp for 24-bit keys whose buckets stay tiny, vs the
    # old clamped 8-bit keys whose buckets grew toward n/256 quadratic.
    spark = fingerprints.sparkSession
    combos_df = spark.createDataFrame(
        [(ci, list(cb)) for ci, cb in enumerate(combos)],
        "chunk int, _idxs array<int>",
    )
    vals = F.array(*[cv.cast("long") for cv in chunk_val])
    selected = F.transform(
        F.col("_idxs"), lambda i: F.element_at(F.col("_vals"), i + F.lit(1))
    )
    keyed = (
        fps.withColumn("_vals", vals)
        .crossJoin(F.broadcast(combos_df))
        .select(
            "id",
            "fp",
            "chunk",
            F.xxhash64(F.col("chunk"), selected).alias("val"),
        )
    )
    return fps, keyed, cmasks


__all__ = [
    "exact_dedup",
    "shingles",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "minhash_band_index",
    "minhash_match_index",
    "hot_shingles",
    "ordered_pair_structs",
    "explode_ordered_pairs",
    "cross_source_overlap",
    "simhash",
    "simhash_hamming_pairs",
    "hamming_pairs_mih",
    "hot_bands",
]


def _ranked_prefix(
    df: DataFrame,
    threshold_pct: int,
    n: int,
    text_col: str,
    id_col: str,
    weight_col: str | None = None,
):
    """Shared PPJoin prefix builder: the checkpointed (id, shingles)
    table and its rarest-first prefix rows (id, n_sh, shingle). Both
    ``prefix_jaccard_pairs`` and the ``prefix_candidate_count`` audit
    hook call this, so the prefix math (ceil formula, (df_cnt,
    shingle) canonical order) exists exactly once.

    ``weight_col`` (value-level callers): each input row counts as
    that many documents in the frequency aggregate, so the canonical
    rarest-first order over distinct texts matches the row-level
    order over the duplicated corpus."""
    # checkpoint the narrow shingle table BEFORE fan-out (invariant 7):
    # frequency aggregate, prefix ranking, and the verify join all read
    # it — without this, projection collapse re-runs the shingle build
    # once per consumer
    cols = [
        F.col(id_col).alias("id"),
        shingles(F.col(text_col), n).alias("sh"),
    ]
    if weight_col is not None:
        cols.append(F.col(weight_col).alias("_w"))
    sh = df.select(*cols).localCheckpoint(eager=False)
    exploded = sh.select(
        "id",
        F.size("sh").alias("n_sh"),
        F.explode("sh").alias("shingle"),
        *([F.col("_w")] if weight_col is not None else []),
    )
    freq = exploded.groupBy("shingle").agg(
        (
            F.sum("_w") if weight_col is not None else F.count("*")
        ).alias("df_cnt")
    )
    w = Window.partitionBy("id").orderBy("df_cnt", "shingle")
    prefix_len = (
        F.col("n_sh")
        - F.expr(f"({int(threshold_pct)} * n_sh + 99) div 100")
        + 1
    )
    ranked = (
        exploded.join(F.broadcast(freq), on="shingle")
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= prefix_len)
        .select("id", "n_sh", "shingle", "_rk")
    )
    return sh, ranked



def prefix_jaccard_pairs(
    df: DataFrame,
    threshold_pct: int = 80,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via PPJoin-style PREFIX
    FILTERING (Chaudhuri et al. 2006; Xiao et al. 2008) — the same
    result set as ``ngram_jaccard_pairs`` with a provably smaller
    candidate join.

    Principle: order every document's shingles by one global canonical
    order (ascending document frequency, rarest first; shingle string
    as tiebreak). For Jaccard >= t, two documents must overlap in at
    least ceil(t*|X|) shingles of either side, so each need only index
    its first |X| - ceil(t*|X|) + 1 shingles: if two prefixes are
    disjoint, the pair provably cannot reach the threshold. At t=0.8
    that indexes ~20% of each document's shingles — measured on the
    q25 fixture the candidate set shrinks 120x (138 candidates vs
    16,547 from the full shingle join, every one a true pair) with
    ZERO recall loss
    (the verify step computes the exact Jaccard over FULL shingle
    sets, so the output is identical to the unfiltered operator and
    shares its oracle).

    Scale shape: one vocabulary-sized frequency aggregate (broadcast
    back), a per-document rank window (partitioned by id — bounded by
    shingles-per-doc), the prefix equi-join, then a candidate-bounded
    verify join. Rarest-first ordering is also the skew story: the
    hottest shingles land OUTSIDE every prefix, so the stop-phrase
    blowup ``max_doc_ratio`` guards against cannot enter this join.

    Integer prefix math (engine-portable): ceil(t*len) =
    (t_pct*len + 99) div 100.

    Duplicate-value compression (round 10): prefix ranking, the prefix
    join, and the full-shingle verify all run over DISTINCT texts — a
    k-copy family shares its whole prefix, so the row-level prefix
    join cost k^2 candidate rows per family and the verify re-joined
    full shingle sets k^2 times (measured 3.3s -> 84s on sf0.1
    documents duplicated 10x; value-level runs the same corpus in
    seconds with the identical pair set). The frequency aggregate
    weights each value by its multiplicity, so the canonical
    rarest-first order — and therefore the candidate set — matches the
    row-level formulation; identical texts verify at Jaccard exactly
    1.0 (always >= t), and matches expand back to id pairs LAST.
    """
    vals, members = _text_values(df, text_col, id_col)
    sh, ranked = _ranked_prefix(
        _spread(vals), threshold_pct, n, "_t", "vid", weight_col="cnt"
    )
    a, b = ranked.alias("a"), ranked.alias("b")
    # positional filter (PPJoin's second lossless prune, Xiao et al.
    # 2008): a shared prefix token at canonical positions (rk_a, rk_b)
    # bounds the possible overlap by 1 + min(n_a - rk_a, n_b - rk_b);
    # J >= t needs overlap >= ceil(t/(1+t) * (n_a + n_b)). Keep a pair
    # only if its BEST shared prefix position can still reach that —
    # all-integer ceil: (t*(na+nb) + (100+t) - 1) div (100+t).
    matched = (
        a.join(b, on="shingle")
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
            (
                F.lit(1)
                + F.least(
                    F.col("a.n_sh") - F.col("a._rk"),
                    F.col("b.n_sh") - F.col("b._rk"),
                )
            ).alias("_ub"),
        )
    )
    t = int(threshold_pct)
    alpha = F.expr(f"({t} * (n_a + n_b) + {100 + t} - 1) div {100 + t}")
    cand = (
        matched.groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.max("_ub").alias("_best_ub"))
        .where(F.col("_best_ub") >= alpha)
        .drop("_best_ub")
    )
    # size filter: |B| >= t|A| is necessary for J >= t (cheap prune
    # before the verify join)
    cand = cand.where(
        (F.col("n_b") * 100 >= F.lit(threshold_pct) * F.col("n_a"))
        & (F.col("n_a") * 100 >= F.lit(threshold_pct) * F.col("n_b"))
    )
    full = sh.select("id", F.explode("sh").alias("shingle"))
    inter = (
        cand.join(full.alias("fa"), F.col("fa.id") == F.col("id_a"))
        .join(
            full.alias("fb"),
            (F.col("fb.id") == F.col("id_b"))
            & (F.col("fb.shingle") == F.col("fa.shingle")),
        )
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count("*").alias("n_common"))
    )
    jacc = F.col("n_common") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    )
    vpairs = (
        inter.withColumn("jaccard", F.round(jacc, 6))
        .where(F.col("jaccard") >= threshold_pct / 100.0)
        .select(
            F.col("id_a").alias("vid_a"),
            F.col("id_b").alias("vid_b"),
            "jaccard",
        )
    )
    # identical texts: Jaccard exactly 1.0 >= t for any t <= 100; the
    # row-level join always found these (a non-NULL text yields >= 1
    # shingle, so its prefix is non-empty and the family shares it)
    self_vids = vals.where(
        (F.col("cnt") >= 2) & F.col("_t").isNotNull()
    ).select("vid")
    return _expand_value_pairs(
        vpairs, self_vids, members, "jaccard", F.lit(1.0)
    )


def prefix_candidate_count(
    df: DataFrame,
    threshold_pct: int = 80,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[int, int]:
    """(prefix-filtered candidates, full-join candidates) — the
    efficiency audit for ``prefix_jaccard_pairs`` (test hook)."""
    sh, ranked_full = _ranked_prefix(df, threshold_pct, n, text_col, id_col)
    ranked = ranked_full.select("id", "shingle")
    exploded = sh.select("id", F.explode("sh").alias("shingle"))

    def _pairs(e: DataFrame) -> int:
        x, y = e.alias("x"), e.alias("y")
        return (
            x.join(y, on="shingle")
            .where(F.col("x.id") < F.col("y.id"))
            .select(F.col("x.id"), F.col("y.id"))
            .distinct()
            .count()
        )

    return _pairs(ranked), _pairs(exploded.select("id", "shingle"))


__all__ += ["prefix_jaccard_pairs", "prefix_candidate_count"]


def weighted_jaccard_pairs(
    df: DataFrame,
    threshold_micro: int = 300_000,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_ratio: float | None = None,
) -> DataFrame:
    """Exact weighted (multiset) Jaccard near-dup pairs:
    ``Σ_t min(c_a, c_b) / Σ_t max(c_a, c_b)`` over per-document token
    COUNTS — the repetition-aware refinement of set Jaccard (two docs
    that repeat the same boilerplate 50x vs 1x are NOT near-dups under
    this measure, but are under the set version).

    Scale shape, in three bounded stages:

    1. token counts per doc (one shuffle), checkpointed — three
       consumers (candidate lists, per-doc totals, the min-sum
       rebuild) must not re-scan the corpus;
    2. candidates from a DISTINCT-token equi-join with the optional
       hot-token cap (``max_doc_ratio``, same stop-word skew guard as
       ``ngram_jaccard_pairs``) — the cap prunes CANDIDATES only;
    3. the min-sum is rebuilt EXACTLY over ALL shared tokens by
       routing the bounded pair list through both docs' count lists
       (pairs ⋈ counts_a on id, then ⋈ counts_b on (id, token) —
       |pairs| x tokens-per-doc rows, never corpus x corpus), so the
       score is cap-independent. Σmax falls out as
       ``tot_a + tot_b − Σmin`` without a second pass.

    The score is integer micro-units (1e6·Σmin div Σmax) — exact,
    hash-stable across engines. Returns (id_a < id_b, min_sum, tot_a,
    tot_b, wjacc_micro >= threshold_micro).

    Duplicate-value compression (round 10): token counting, the
    candidate join, and the min-sum rebuild run over DISTINCT texts —
    identical texts have identical count multisets, so a k-copy family
    cost k^2 candidate pairs, each rebuilding the min-sum over both
    full count lists (and this operator's candidate stage — any shared
    token — is already its heaviest; the r10 probe measured the
    uncapped row-level join at 178s SPREAD on sf0.1, so the k^2
    multiplier sits on top of an expensive base). A family self-pairs
    at exactly (tot, tot, tot, 1000000) iff it has >= 1 token (the
    row-level join needs a shared token; the hot-token cap does NOT
    gate this — identical docs still share their uncapped tokens, and
    when EVERY token is capped the candidate join finds nothing at row
    level either... except that identical docs share capped tokens
    too, so self-pairing requires >= 1 SURVIVING shared token exactly
    like row level). Expansion back to id pairs is swap-aware: tot_a
    always belongs to the smaller id, as at row level.
    """
    from .textstats import tokens as _tok

    vals, members = _text_values(df, text_col, id_col)
    toks = vals.select(
        F.col("vid").alias("id"),
        "cnt",
        F.explode(_tok(F.col("_t"))).alias("tok"),
    )
    counts = (
        toks.groupBy("id", "tok")
        .agg(
            F.count("*").cast("long").alias("c"),
            F.first("cnt").alias("cnt"),
        )
        .localCheckpoint(eager=False)
    )
    tots = counts.groupBy("id").agg(F.sum("c").cast("long").alias("tot"))
    dist = counts.select("id", "tok", "cnt")
    if max_doc_ratio is not None:
        # document frequency counts ids, not values. The drop list is
        # checkpointed (narrow, vocabulary-sized): dist fans out to
        # both candidate-join sides and the self-pair probe, and the
        # cap's 1-row corpus-size broadcast must not replicate per
        # consumer — checkpointing dist itself measured 2.5x SLOWER
        # (82 vs 34s sf0.1 spread): it materializes the fat exploded
        # table and breaks join pipelining; the drop list is the
        # right cut point.
        n_docs = df.agg(F.count("*").cast("double").alias("_n_docs"))
        rare = (
            dist.groupBy("tok")
            .agg(F.sum("cnt").alias("_df"))
            .crossJoin(F.broadcast(n_docs))
            .where(F.col("_df") <= F.lit(max_doc_ratio) * F.col("_n_docs"))
            .select("tok")
            .localCheckpoint(eager=False)
        )
        dist = dist.join(rare, on="tok")
    # size filter (lossless, round 10): Σmin <= min(tot) and
    # Σmax >= max(tot), so wjacc <= min(tot)/max(tot) — a pair whose
    # total-length ratio can't reach the threshold is pruned INSIDE the
    # candidate join, before the distinct exchange and the min-sum
    # rebuild (the operator's dominant cost: any-shared-token
    # candidates are near-all-pairs on natural text; measured 174 ->
    # 34s min-of-3 at threshold 0.8, 5000 docs sf0.1, identical
    # output)
    dist = dist.join(tots, on="id")
    a, b = dist.alias("a"), dist.alias("b")
    cand = (
        a.join(b, on="tok")
        .where(
            (F.col("a.id") < F.col("b.id"))
            & (
                F.least(F.col("a.tot"), F.col("b.tot")) * 1_000_000
                >= F.lit(int(threshold_micro))
                * F.greatest(F.col("a.tot"), F.col("b.tot"))
            )
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    ca = counts.select(F.col("id").alias("id_a"), "tok", F.col("c").alias("c_a"))
    cb = counts.select(F.col("id").alias("id_b"), "tok", F.col("c").alias("c_b"))
    mins = (
        cand.join(ca, on="id_a")
        .join(cb, on=["id_b", "tok"])
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.least("c_a", "c_b")).cast("long").alias("min_sum"))
    )
    ta = tots.select(F.col("id").alias("id_a"), F.col("tot").alias("tot_a"))
    tb = tots.select(F.col("id").alias("id_b"), F.col("tot").alias("tot_b"))
    vpairs = (
        mins.join(ta, on="id_a")
        .join(tb, on="id_b")
        .withColumn(
            "wjacc_micro",
            F.expr(
                "(1000000 * min_sum) div (tot_a + tot_b - min_sum)"
            ).cast("long"),
        )
        .where(F.col("wjacc_micro") >= threshold_micro)
        .select(
            F.col("id_a").alias("vid_a"),
            F.col("id_b").alias("vid_b"),
            "min_sum",
            "tot_a",
            "tot_b",
            "wjacc_micro",
        )
    )
    # a duplicate family self-pairs iff >= 1 of its tokens survives the
    # cap (the row-level shared-token requirement) and the perfect
    # score clears the threshold
    self_base = (
        vals.where(F.col("cnt") >= 2)
        .join(dist.select("id").distinct(), F.col("vid") == F.col("id"))
        .join(tots, on="id")
        .select("vid", "tot")
        if threshold_micro <= 1_000_000
        else vals.where(F.lit(False)).select(
            "vid", F.lit(0).cast("long").alias("tot")
        )
    )
    allp = vpairs.unionByName(
        self_base.select(
            F.col("vid").alias("vid_a"),
            F.col("vid").alias("vid_b"),
            F.col("tot").alias("min_sum"),
            F.col("tot").alias("tot_a"),
            F.col("tot").alias("tot_b"),
            F.lit(1_000_000).cast("long").alias("wjacc_micro"),
        )
    )
    # swap-aware fused expansion (one join tree, same shape as
    # _expand_value_pairs): when the member ids land reversed,
    # tot_a/tot_b swap with them (min_sum and the score are
    # symmetric); same-value rows keep only the ia < ib half
    m_a = members.select(F.col("vid").alias("vid_a"), F.col("id").alias("_ia"))
    m_b = members.select(F.col("vid").alias("vid_b"), F.col("id").alias("_ib"))
    flipped = F.col("_ia") > F.col("_ib")
    return (
        allp.join(m_a, on="vid_a")
        .join(m_b, on="vid_b")
        .where(
            (F.col("vid_a") != F.col("vid_b"))
            | (F.col("_ia") < F.col("_ib"))
        )
        .select(
            F.least("_ia", "_ib").alias("id_a"),
            F.greatest("_ia", "_ib").alias("id_b"),
            "min_sum",
            F.when(flipped, F.col("tot_b")).otherwise(F.col("tot_a")).alias("tot_a"),
            F.when(flipped, F.col("tot_a")).otherwise(F.col("tot_b")).alias("tot_b"),
            "wjacc_micro",
        )
    )


__all__ += ["weighted_jaccard_pairs"]


def weighted_minhash_pairs(
    docs: DataFrame,
    num_hashes: int = 16,
    band_size: int = 4,
    threshold: float = 0.5,
    max_rep: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Weighted-MinHash near-dup pairs via integer weight replication:
    each (token, rep) micro-unit — rep up to the token's in-doc count,
    CLIPPED at ``max_rep`` — hashes once per hash function and the
    per-doc signature is the per-function unit minimum, an unbiased
    MinHash of the clipped token MULTISET. Signature agreement
    therefore estimates the clipped weighted Jaccard
    Σmin(c̄_a,c̄_b)/Σmax(c̄_a,c̄_b), c̄ = min(count, max_rep) — the
    sketch counterpart of the exact ``weighted_jaccard_pairs``
    (repetition-aware where plain MinHash sees sets). The clip is an
    explicit, documented weight transform applied identically to the
    sketch, the exact score, and the SQL oracle — never a silent,
    data-dependent drop (the replication path is the classic
    quantization reduction; Gollapudi & Panigrahy, WWW'06 — public).

    Shape at scale: units are O(tokens x min(tf, max_rep)) map-side
    rows, signatures O(docs x num_hashes), candidates come from
    ``num_hashes / band_size`` banded equi-joins — never an all-pairs
    path; the exact score is rebuilt only for banded candidates.
    Candidates, the estimate, and the exact-score rebuild all run over
    DISTINCT texts (r10 value-level pattern, ``_text_values``): k
    exact copies of a document band-match everywhere, so they cost
    k² candidate pairs EACH dragging num_hashes signature rows plus a
    token-level min-sum join — measured on sf0.1 documents (a corpus
    already dense in near-dup families: 5,000 docs -> 562k banded
    pairs, 16.4s) duplicated 10x, the row-level layout did not finish
    in 590s while value-level runs it in the spread-cost band. Both
    output scores are symmetric, so expansion is the plain
    ``_expand_value_pairs`` with (1.0, 1.0) self scores; same-text
    pairs agree on every band by construction, so they are candidates
    with every hash agreeing (est exactly 1.0) — emitted without the vote, gated on the
    same ``threshold`` and on the value actually producing tokens
    (a NULL text yields no units row-level, hence never pairs).

    Returns (id_a, id_b, est_wjaccard, wjaccard) for candidate pairs
    whose SIGNATURE agreement >= ``threshold``."""
    n_bands, rem = divmod(num_hashes, band_size)
    if rem:
        raise ValueError("band_size must divide num_hashes")
    vals, members = _text_values(docs, text_col, id_col)
    cnts = (
        vals.select(
            F.col("vid").alias("id"),
            F.explode(F.split(F.trim(F.col("_t")), r"\s+")).alias("tok"),
        )
        .groupBy("id", "tok")
        .agg(F.least(F.count("*"), F.lit(max_rep)).cast("int").alias("c"))
        .localCheckpoint(eager=False)
    )
    units = cnts.select(
        "id", "tok", F.explode(F.sequence(F.lit(1), F.col("c"))).alias("rep")
    )

    # Signature layout (r13 optimization): one grouped aggregation with
    # ``num_hashes`` min columns -> an ORDERED array per doc — the same
    # array-signature shape ``minhash_signatures`` already uses. The
    # md5 inputs ("wmh:k:tok:rep") are byte-identical to the old
    # exploded (id, k) layout, so every minimum — and therefore every
    # band key, candidate, and score — is unchanged; what changes is
    # the plan: the k-explode (units x num_hashes rows) and the second
    # groupBy that rebuilt per-band keys are gone, one exchange carries
    # one row per doc instead of num_hashes (guide §2.3/§2.4).
    def _unit_hash(k: int) -> Column:
        return F.md5(
            F.concat_ws(
                ":", F.lit("wmh"), F.lit(k), F.col("tok"), F.col("rep")
            )
        )

    sig = (
        units.groupBy("id")
        .agg(
            *[
                F.min(_unit_hash(k)).alias(f"_h{k}")
                for k in range(num_hashes)
            ]
        )
        .select(
            "id",
            F.array(*[F.col(f"_h{k}") for k in range(num_hashes)]).alias(
                "sig"
            ),
        )
        .localCheckpoint(eager=False)
    )
    # band key = md5 over the band's "|"-joined minima in k order —
    # the identical string the old collect_list/array_sort path built.
    # The keys travel as ONE array column that posexplode fans into
    # (band, bkey) join rows, so each side of the band join also sees
    # its row's earlier band keys: a pair is a candidate once per
    # agreeing band, and "no earlier band key matches" is then
    # row-local — the first-agreeing-band filter replaces the
    # pair-level dropDuplicates and its exchange (r14, guide §2.4;
    # candidate pairs dwarf the docs x n_bands band rows on dup-dense
    # corpora — 562k pairs vs 5k docs at sf0.1 — so widening band rows
    # by n_bands md5 strings is the cheap side of the trade). Current-
    # band agreement needs no re-check: the band key itself is the
    # equi-join key.
    bkey_arr = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.col("sig")[b * band_size + r]
                        for r in range(band_size)
                    ],
                )
            )
            for b in range(n_bands)
        ]
    )
    bands = sig.select("id", bkey_arr.alias("_bks")).select(
        "id", "_bks", F.posexplode("_bks").alias("band", "bkey")
    )
    first = _first_by_case(
        [
            F.col("a._bks")[j] == F.col("b._bks")[j]
            for j in range(n_bands)
        ],
        "band",
        check_current=False,  # the band key IS the join key
    )
    # _wide: the candidate rows are two ids (16 bytes) but each drags a
    # zip_with over two signature arrays plus the map_zip_with min-sum
    # downstream — AQE's byte-based coalescing packs them onto 1-2
    # tasks (measured: the whole est+minsum pipeline on 2 tasks, 11s of
    # a 14.5s wall). The old dropDuplicates exchange provided width by
    # accident; the explicit respread carries the same exactly-once
    # pair stream (the filter runs BEFORE the exchange) without the two
    # aggregate passes.
    cand = _wide(
        bands.alias("a")
        .join(bands.alias("b"), on=["band", "bkey"])
        .where((F.col("a.id") < F.col("b.id")) & first)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    # Signature agreement by zip_with over the two arrays (was: a
    # num_hashes-rows-per-pair equi-join + re-aggregation — 16x the
    # exchange rows and an extra shuffle for the same fraction).
    est = (
        cand.join(
            sig.select(F.col("id").alias("id_a"), F.col("sig").alias("_sa")),
            on="id_a",
        )
        .join(
            sig.select(F.col("id").alias("id_b"), F.col("sig").alias("_sb")),
            on="id_b",
        )
        .select(
            "id_a",
            "id_b",
            (
                F.size(
                    F.filter(
                        F.zip_with("_sa", "_sb", lambda x, y: x == y),
                        lambda m: m,
                    )
                )
                / F.lit(float(num_hashes))
            ).alias("_frac"),
        )
        .where(F.col("_frac") >= threshold)
    )
    # Per-doc token->count map + clipped total in ONE row (r13): the
    # exact min-sum previously re-joined the token-level ``cnts`` table
    # per candidate pair — O(pairs x tokens) exchange rows — plus two
    # more joins for the totals. One (id, map, total) row per doc feeds
    # both, and the min-sum folds in-row over the key union (guide
    # §2.3: shuffle keys/metadata, not per-token rows). Integer
    # arithmetic throughout, so the scores are bit-identical.
    docfeat = cnts.groupBy("id").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("tok"), F.col("c")))
        ).alias("m"),
        F.sum("c").cast("long").alias("t"),
    ).localCheckpoint(eager=False)
    minsum = F.aggregate(
        F.map_values(
            F.map_zip_with(
                "_ma",
                "_mb",
                lambda _, x, y: F.when(
                    x.isNull() | y.isNull(), F.lit(0)
                ).otherwise(F.least(x, y)),
            )
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    vpairs = (
        est.join(
            docfeat.select(
                F.col("id").alias("id_a"),
                F.col("m").alias("_ma"),
                F.col("t").alias("_ta"),
            ),
            on="id_a",
        )
        .join(
            docfeat.select(
                F.col("id").alias("id_b"),
                F.col("m").alias("_mb"),
                F.col("t").alias("_tb2"),
            ),
            on="id_b",
        )
        .withColumn("_ms", minsum)
        .select(
            F.col("id_a").alias("vid_a"),
            F.col("id_b").alias("vid_b"),
            F.round("_frac", 4).alias("est_wjaccard"),
            F.round(
                F.col("_ms")
                / (F.col("_ta") + F.col("_tb2") - F.col("_ms")).cast(
                    "double"
                ),
                6,
            ).alias("wjaccard"),
        )
    )
    self_vids = vals.where(F.col("cnt") >= 2).join(
        cnts.select(F.col("id").alias("vid")).distinct(), on="vid"
    )
    if 1.0 < threshold:  # row-level gate applied to the self pairs too
        self_vids = self_vids.where(F.lit(False))
    return _expand_value_pairs(
        vpairs,
        self_vids,
        members,
        ["est_wjaccard", "wjaccard"],
        [F.lit(1.0), F.lit(1.0)],
    )


__all__ += ["weighted_minhash_pairs"]


def _mih_params(
    bits: int, blocks: int, max_hamming: int, max_probe_masks: int
) -> tuple[int, int, list[int]]:
    """(block width, bit mask, XOR probe masks) for an MIH config —
    shared by the one-shot join (``hamming_pairs_mih``) and the
    incremental index/probe pair so their layouts can never drift.
    Raises (never truncates) when the probe neighborhood exceeds
    ``max_probe_masks``."""
    import itertools
    import math

    if bits % blocks:
        raise ValueError("bits must divide evenly into blocks")
    width = bits // blocks
    if width > 62:
        raise ValueError("block width must fit a signed long")
    s = max_hamming // blocks
    n_masks = sum(math.comb(width, i) for i in range(s + 1))
    if n_masks > max_probe_masks:
        raise ValueError(
            f"MIH probe neighborhood C({width}, <= {s}) = {n_masks} masks "
            f"exceeds max_probe_masks={max_probe_masks}; raise `blocks` so "
            "the per-block radius shrinks"
        )
    xor_masks = [0]
    for k in range(1, s + 1):
        for comb in itertools.combinations(range(width), k):
            m = 0
            for b in comb:
                m |= 1 << b
            xor_masks.append(m)
    return width, (1 << width) - 1, xor_masks


def mih_block_index(
    fingerprints: DataFrame,
    bits: int = 64,
    blocks: int = 4,
    id_col: str = "id",
    hash_col: str = "simhash",
) -> DataFrame:
    """Persistable multi-index-hashing block index over a (history)
    fingerprint corpus: one (id, fp, block, val) row per (row, block)
    — the Hamming-space analogue of ``minhash_band_index``. Store it
    partitioned/bucketed by (block, val) and append each accepted
    batch; ``mih_match_index`` probes it without recomputing history
    fingerprints. O(corpus x blocks) small rows; at 100 TB the probe
    touches only the batch's (block, val) buckets. For a heavily
    duplicated history, index DISTINCT fingerprint values and keep a
    (fp -> id) side table — the same compression
    ``hamming_pairs_mih`` applies internally."""
    width, mask, _ = _mih_params(bits, blocks, 0, 1)
    fps = fingerprints.select(
        F.col(id_col).alias("id"), F.col(hash_col).alias("fp")
    )
    entries = F.array(
        *[
            F.struct(
                F.lit(i).alias("block"),
                F.shiftright(F.col("fp"), i * width)
                .bitwiseAND(F.lit(mask))
                .cast("long")
                .alias("val"),
            )
            for i in range(blocks)
        ]
    )
    return fps.select("id", "fp", F.explode(entries).alias("e")).select(
        "id", "fp", "e.block", "e.val"
    )


def mih_match_index(
    index: DataFrame,
    new_fingerprints: DataFrame,
    bits: int = 64,
    blocks: int = 4,
    max_hamming: int = 10,
    id_col: str = "id",
    hash_col: str = "simhash",
    max_probe_masks: int = 4096,
    broadcast_batch: bool = True,
) -> DataFrame:
    """Incremental exact Hamming matching: probe a stored
    ``mih_block_index`` (corpus history) with a NEW fingerprint batch.
    The batch side enumerates the per-block XOR probe neighborhood
    over the batch's DISTINCT fingerprint values (D x blocks x V rows,
    V = enumerated masks) and equi-joins the index on (block, val);
    the pigeonhole argument makes the result exact, and value-level
    matches expand back to batch rows with one equi-join. History
    never re-fingerprints and — with ``broadcast_batch`` — never
    shuffles. Size rule for the default broadcast: the broadcast
    relation is D x blocks x V rows (NOT batch-sized — V is 529 at
    the 64-bit/h=10/blocks=4 config); past ~10M rows pass
    ``broadcast_batch=False`` so the probe shuffles instead of
    fanning out to every executor. Params MUST match the index build
    (same bits/blocks); mismatches silently produce disjoint buckets,
    exactly as with ``minhash_match_index``.
    Returns (new_id, hist_id, hamming) within ``max_hamming``."""
    width, mask, xor_masks = _mih_params(
        bits, blocks, max_hamming, max_probe_masks
    )
    batch = new_fingerprints.select(
        F.col(id_col).alias("new_id"), F.col(hash_col).alias("bfp")
    ).localCheckpoint(eager=False)
    # Probe DISTINCT batch fingerprint VALUES, not rows — the same
    # compression hamming_pairs_mih applies internally: the probe
    # neighborhood costs blocks x V rows per VALUE (V = enumerated XOR
    # masks, e.g. 529 at 64-bit/h=10/blocks=4), so a duplicate-heavy
    # batch (the normal ingest shape: new crawl snapshots arrive in
    # near-dup families) would otherwise explode identical
    # neighborhoods once per ROW — measured 20x on a concentrated
    # 20k-row batch. Value-level matches expand back to new_ids with
    # one batch-sized equi-join at the end; the first-agreeing-block
    # filter below makes the value-level matches already distinct, so
    # no match-level dedup exchange runs before the expansion.
    bvals = batch.select(F.col("bfp").alias("bv")).distinct()
    entries = F.array(
        *[
            F.struct(
                F.lit(i).alias("block"),
                F.shiftright(F.col("bv"), i * width)
                .bitwiseAND(F.lit(mask))
                .cast("long")
                .alias("val"),
            )
            for i in range(blocks)
        ]
    )
    mask_arr = F.array(*[F.lit(m).cast("long") for m in xor_masks])
    probe = (
        bvals.select("bv", F.explode(entries).alias("e"))
        .select("bv", "e.block", "e.val")
        .select(
            "bv",
            "block",
            F.explode(mask_arr).alias("_m"),
            "val",
        )
        .select(
            "bv",
            "block",
            F.col("val").bitwiseXOR(F.col("_m")).alias("val"),
        )
    )
    if broadcast_batch:
        probe = F.broadcast(probe)
    hamming = F.bit_count(F.col("bv").bitwiseXOR(F.col("fp"))).cast("long")
    # first-agreeing-block filter instead of the value-level
    # dropDuplicates (see hamming_pairs_mih): each (batch value, index
    # row) match is emitted exactly once, removing the match-level
    # dedup exchange. The pair-level dropDuplicates below still runs,
    # so the distinct-(new_id, hist_id) output contract is unchanged
    # even for a degenerate index carrying duplicate (id, fp) rows.
    block_masks = [mask << (i * width) for i in range(blocks)]
    first = _first_match_mask(
        F.col("bv").bitwiseXOR(F.col("fp")),
        block_masks,
        max_hamming // blocks,
        "block",
    )
    vmatches = (
        probe.join(index, on=["block", "val"])
        .where((hamming <= max_hamming) & first)
        .select(
            "bv",
            F.col("id").alias("hist_id"),
            hamming.alias("hamming"),
        )
    )
    # Final pair-level dedup (ADVICE r9): a batch carrying duplicate
    # (id, fingerprint) ROWS — an un-deduped ingest or a replayed
    # micro-batch — would otherwise emit one row per duplicate through
    # the expansion join. Cheap: it runs on matches only, preserving
    # the distinct-(new_id, hist_id) output contract the pre-r9 code
    # guaranteed.
    return (
        vmatches.join(batch, vmatches.bv == batch.bfp)
        .select("new_id", "hist_id", "hamming")
        .dropDuplicates(["new_id", "hist_id"])
    )


__all__ += ["mih_block_index", "mih_match_index"]
