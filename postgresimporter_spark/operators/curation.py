"""Training-data curation operators: benchmark decontamination,
intra-document repetition scoring, and mixture upsampling.

These are LLM-data-pipeline operators with no counterpart in the
reference (whose scope ends at CSV→Postgres loading): the standard
curation steps between "raw corpus" and "training mix".

Scale notes:

* ``ngram_contamination`` is a distinct-shingle equi-join — identical
  cost shape to ``dedup.ngram_jaccard_pairs`` (never a cross join).
  The eval/benchmark side is almost always metadata-scale relative to
  the corpus, so it broadcasts; the corpus is scanned once, exploded,
  and hash-joined on the shingle. Contaminated-doc output is tiny.
* ``repetition_ratio`` is pure per-row array math (no shuffle at all):
  tokens → raw n-gram array → ``size`` vs ``size(array_distinct)``.
  Whole-stage-codegen friendly, trivially 100 TB-safe.
* ``mixture_upsample`` materializes epochs via ``explode(sequence)``
  — row expansion happens executor-side after a broadcast join with
  the (tiny) weights table; the fractional epoch uses md5-bucket
  sampling (engine/partitioning-independent, same primitive as q74).
  Integer percent weights avoid float drift between engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import hash_bucket, shingles


def raw_ngrams(text: Column, n: int) -> Column:
    """Word n-gram array WITHOUT dedup (repetition analysis needs the
    duplicates; ``dedup.shingles`` is the distinct variant). Same
    zip-of-shifted-slices build as ``shingles`` — one vectorized pass,
    measured 4x faster than the index-transform shape on hot paths."""
    toks = F.split(F.trim(text), r"\s+")
    ln = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    z = F.arrays_zip(
        *[F.slice(toks, i + 1, ln).alias(f"c{i}") for i in range(n)]
    )
    return F.transform(
        z, lambda s: F.concat_ws(" ", *[s[f"c{i}"] for i in range(n)])
    )


def ngram_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Benchmark decontamination: for each training document, count how
    many of its distinct word n-grams also occur anywhere in the eval
    set. Docs with no overlap are absent from the output (the common
    case — keep the result tiny).

    The downstream policy (drop the doc, strip the span, weight it
    down) is the caller's; this operator just surfaces the evidence.
    """
    ev = (
        eval_df.select(
            F.explode(shingles(F.col(text_col), n)).alias("_s")
        ).distinct()
    )
    if broadcast_eval:
        ev = F.broadcast(ev)
    tr = train.select(
        F.col(id_col),
        F.explode(shingles(F.col(text_col), n)).alias("_s"),
    )
    # (id, shingle) is unique on both sides post-distinct, so count(*)
    # IS the distinct shared-shingle count
    return (
        tr.join(ev, on="_s")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared_ngrams"))
    )


def repetition_ratio(
    df: DataFrame,
    ns: tuple[int, ...] = (2, 3),
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Gopher-style intra-document repetition: per document and n-gram
    size, the fraction of n-gram occurrences that are duplicates
    (``1 - distinct/total``). High ratios flag boilerplate/looping text
    that quality filters should drop."""
    cols: list[Column] = [F.col(id_col)]
    for n in ns:
        grams = raw_ngrams(F.col(text_col), n)
        total = F.size(grams)
        distinct = F.size(F.array_distinct(grams))
        cols += [
            total.cast("long").alias(f"n_{n}grams"),
            distinct.cast("long").alias(f"n_distinct_{n}grams"),
            F.round(
                F.lit(1.0) - distinct.cast("double") / total.cast("double"),
                round_digits,
            ).alias(f"dup{n}_ratio"),
        ]
    return df.select(*cols)


def mixture_upsample(
    df: DataFrame,
    weights_pct: dict[str, int],
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Training-mix construction: replicate each row according to its
    source's weight, expressed in integer percent (250 = 2.5 epochs:
    two full copies plus a deterministic 50% hash-sample third copy;
    25 = keep a 25% sample; 0 = drop the source).

    Output = input rows × an ``epoch`` column (1-based). Fractional
    epochs use the md5-bucket primitive keyed on the row id, so the
    SAME rows are chosen on every engine, re-run, and partitioning.
    Sources missing from ``weights_pct`` are dropped (explicit mix).
    """
    spark = df.sparkSession
    w = F.broadcast(
        spark.createDataFrame(
            list(weights_pct.items()), [source_col, "_w_pct"]
        )
    )
    n_full = (F.col("_w_pct") / 100).cast("long")
    frac = F.col("_w_pct") % 100
    extra = F.when(
        hash_bucket(F.col(id_col).cast("string"), 100) < frac, 1
    ).otherwise(0)
    n_epochs = (n_full + extra).alias("_n_epochs")
    # sequence(1, 0) in Spark yields [1, 0] (descending), not empty —
    # guard zero-epoch rows explicitly
    epochs = F.when(
        F.col("_n_epochs") >= 1,
        F.sequence(F.lit(1), F.col("_n_epochs")),
    ).otherwise(F.array().cast("array<long>"))
    return (
        df.join(w, on=source_col)
        .withColumn("_n_epochs", n_epochs)
        .withColumn("epoch", F.explode(epochs))
        .drop("_w_pct", "_n_epochs")
    )


def pack_sequences(
    df: DataFrame,
    budget_tokens: int,
    shard_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """GPT-style contiguous sequence packing: within each shard,
    documents concatenate in ``order_col`` order into one token stream
    cut into ``budget_tokens``-sized sequences; each document's
    ``seq_idx`` is the sequence where its first token lands (documents
    may straddle sequence boundaries, as in standard LM pretraining
    packing).

    Scale: one window per shard (cumulative sum — no global sort). The
    shard column is the parallelism unit; hash-assign shards upstream
    so each holds a bounded token count. Deterministic: ordering is
    (order_col) within shard, no RNG anywhere.
    """
    n_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long")
    from pyspark.sql import Window

    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn("n_tokens", n_tokens).withColumn(
        "_cum", F.sum("n_tokens").over(w)
    )
    return out.select(
        F.col(order_col),
        F.col(shard_col),
        "n_tokens",
        F.floor((F.col("_cum") - F.col("n_tokens")) / budget_tokens)
        .cast("long")
        .alias("seq_idx"),
        ((F.col("_cum") - F.col("n_tokens")) % budget_tokens)
        .cast("long")
        .alias("seq_offset"),
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 40,
    stride: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window chunking (RAG/embedding prep): overlapping
    ``chunk_tokens``-token windows every ``stride`` tokens. Pure
    per-row array math + explode — no shuffle; chunk text is rebuilt
    with single-space joins (whitespace-normalized, matching the
    tokenizer)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(toks) - 1, F.lit(0)),
        F.lit(stride),
    )
    exploded = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.posexplode(starts).alias("chunk_idx", "_start"),
    )
    chunk = F.slice(
        F.col("_toks"), F.col("_start") + 1, chunk_tokens
    )
    return exploded.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
    )


# PII redaction patterns, applied in order (emails before bare number
# runs so the address is masked whole, not digit-by-digit). Patterns are
# deliberately restricted to syntax shared by Java regex and RE2 so the
# DuckDB oracle replays them verbatim.
DEFAULT_PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    ("ipv4", r"\b[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+\b", "<IP>"),
    ("number", r"[0-9]+", "<NUM>"),
)


def redact_text(
    df: DataFrame,
    text_col: str,
    patterns: tuple[tuple[str, str, str], ...] = DEFAULT_PII_PATTERNS,
    out_col: str = "redacted",
) -> DataFrame:
    """PII scrubbing: sequentially mask each pattern and count the spans
    it removed. Pure ``regexp_replace``/``regexp_extract_all`` — stays in
    whole-stage codegen, no shuffle, trivially 100 TB-safe (scan-shaped).

    Counts are measured on the text as seen by THAT pattern (after the
    earlier replacements), matching the sequential-replace semantics: an
    email's digits are already masked when the number pattern runs.
    """
    cur = F.col(text_col)
    counts: list[Column] = []
    for name, rx, repl in patterns:
        counts.append(
            F.size(F.regexp_extract_all(cur, F.lit(rx), 0))
            .cast("long")
            .alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, rx, repl)
    return df.select(*df.columns, *counts, cur.alias(out_col))


def dup_ngram_fraction(
    df: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
    round_digits: int = 6,
) -> DataFrame:
    """Cross-document boilerplate detection: per document, the fraction
    of its DISTINCT word n-grams that occur in at least ``min_df``
    documents corpus-wide (RefinedWeb-style "duplicated n-gram
    fraction"; the intra-document variant is ``repetition_ratio``).

    Scale shape: explode distinct shingles (one pass), aggregate
    document frequency on the shingle key (map-side partial), hash-join
    the per-doc shingles back to their frequency, re-aggregate per doc.
    Two bounded shuffles, never a cross join. A stop-phrase shingle with
    huge document frequency skews the join-back; AQE skew-join splits it
    (each shingle row matches exactly one frequency row, so fan-out is
    1:1 and the skew is carry-over from the explode, not amplification).
    """
    from .dedup import _spread

    ex = _spread(df).select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("_s")
    ).localCheckpoint(eager=False)  # feeds BOTH the df-count and the join
    # back — materialize so the shingle explode runs once, not twice;
    # _spread so the shingle build parallelizes on few-split input (the
    # checkpoint pins the scan partitioning otherwise — r13-opt)
    # (id, shingle) is unique post-array_distinct, so count(*) == doc freq
    dfreq = ex.groupBy("_s").agg(F.count("*").alias("_df"))
    hit = F.when(F.col("_df") >= min_df, F.lit(1)).otherwise(F.lit(0))
    return (
        ex.join(dfreq, on="_s")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum(hit).cast("long").alias("n_dup_shingles"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_dup_shingles",
            F.round(
                F.col("n_dup_shingles").cast("double")
                / F.col("n_shingles").cast("double"),
                round_digits,
            ).alias("dup_frac"),
        )
    )


# Gopher-style gate thresholds (Rae et al. 2021 table A1 shape, values
# tuned to the synthetic fixture's ranges so both branches are exercised)
QUALITY_GATES: dict[str, tuple[float, float]] = {
    "n_tokens": (5, 100_000),
    "avg_token_len": (2.0, 12.0),
    "punct_ratio": (0.0, 0.2),
    "stopword_ratio": (0.005, 1.0),
}


def quality_gates(
    features: DataFrame,
    gates: dict[str, tuple[float, float]] = QUALITY_GATES,
    id_col: str = "doc_id",
) -> DataFrame:
    """Rule-based pre-training quality filter: closed-interval gate per
    feature column plus the conjunction. Operates on the OUTPUT of
    ``textstats.quality_features`` — gating on the already-rounded
    feature values keeps the boolean identical across engines (a raw
    double could straddle a threshold differently after rounding).
    Scan-shaped; no shuffle.
    """
    flag_cols: list[Column] = []
    pass_all: Column | None = None
    for feat in sorted(gates):
        lo, hi = gates[feat]
        flag = F.col(feat).isNotNull() & F.col(feat).between(lo, hi)
        flag_cols.append(flag.alias(f"gate_{feat}"))
        pass_all = flag if pass_all is None else (pass_all & flag)
    assert pass_all is not None
    return features.select(
        F.col(id_col), *flag_cols, pass_all.alias("passes")
    )


def remove_duplicate_spans(
    df: DataFrame,
    span: int = 5,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style cross-document span removal: every token position
    covered by ANY word ``span``-gram occurring in >= ``min_docs``
    distinct documents is deleted; the document is rebuilt from the
    surviving tokens in original order. This is the "remove repeated
    three-sentence spans" step of C4 (Raffel et al. 2020 §2.2),
    re-expressed at token-window granularity.

    Returns (id, n_tokens, n_removed, clean_text); documents whose
    every token is boilerplate survive with clean_text = ''.

    Scale shape: tokens and grams are exploded once (gram explode is
    localCheckpointed — it feeds both the frequency count and the
    join-back, and projection collapse would re-run it twice);
    duplicate-gram detection is a groupBy on the gram key with map-side
    partials; covered positions come from an equi-join on the gram and
    a bounded explode (span rows per hit). Reassembly is one groupBy on
    the doc id with an in-order fold — never a window, never a sort of
    the corpus. A stop-phrase gram with huge document frequency fans
    out 1:1 (each gram occurrence matches exactly one frequency row),
    so skew is carry-over, not amplification; AQE splits it.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(
        F.col(id_col).alias("id"),
        toks.alias("_toks"),
        F.size(toks).cast("long").alias("n_tokens"),
    ).localCheckpoint(eager=False)  # feeds grams, words, and final join
    # full-length grams only: empty start-index array for short docs
    # (F.sequence(0, -1) is DESCENDING [0,-1], not empty — guard it)
    starts = F.when(
        F.col("n_tokens") >= span,
        F.sequence(F.lit(0), (F.col("n_tokens") - span).cast("int")),
    ).otherwise(F.array().cast("array<int>"))
    grams = base.select(
        "id",
        F.explode(starts).alias("start"),
        F.col("_toks").alias("_toks"),
    ).select(
        "id",
        "start",
        F.array_join(
            F.slice("_toks", F.col("start") + F.lit(1), span), " "
        ).alias("gram"),
    ).localCheckpoint(eager=False)
    dup = (
        grams.groupBy("gram")
        .agg(F.count_distinct("id").alias("_df"))
        .where(F.col("_df") >= min_docs)
        .select("gram")
    )
    covered = (
        grams.join(dup, on="gram")
        .select(
            "id",
            F.explode(
                F.sequence(F.col("start"), F.col("start") + (span - 1))
            ).alias("pos"),
        )
        .distinct()
    )
    words = base.select(
        "id", F.posexplode("_toks").alias("pos", "w")
    )
    kept = words.join(covered, on=["id", "pos"], how="left_anti")
    reassembled = kept.groupBy("id").agg(
        F.count("*").cast("long").alias("_n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("w")))
                ),
                lambda s: s["w"],
            ),
            " ",
        ).alias("clean_text"),
    )
    return (
        base.select("id", "n_tokens")
        .join(reassembled, on="id", how="left")
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            (
                F.col("n_tokens") - F.coalesce(F.col("_n_kept"), F.lit(0))
            ).cast("long").alias("n_removed"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )


__all__ = [
    "raw_ngrams",
    "ngram_contamination",
    "repetition_ratio",
    "mixture_upsample",
    "pack_sequences",
    "chunk_documents",
    "redact_text",
    "dup_ngram_fraction",
    "remove_duplicate_spans",
    "quality_gates",
    "DEFAULT_PII_PATTERNS",
    "QUALITY_GATES",
]


def source_quota(
    df: DataFrame,
    max_per_group: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "quota",
) -> DataFrame:
    """Per-group quota cap (domain balancing): keep at most
    ``max_per_group`` rows per ``group_col`` value, chosen by a
    deterministic md5 order (seeded, engine-independent) so the kept
    subset is stable across runs, partitionings, and engines — the
    standard guard against one domain dominating a crawl mix.

    Scale shape: salted two-phase per-key top-k
    (``ranking.topk_per_key``) — a pathologically hot group ranks
    within (group, salt) first, spreading its sort across the salt
    buckets, and at most ``buckets * max_per_group`` of its rows reach
    the final per-group ranking.  Identical output to a single window
    by construction.
    """
    from .ranking import topk_per_key

    order_key = F.md5(
        F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))
    )
    capped = topk_per_key(
        df,
        key_cols=[group_col],
        order_cols=[order_key, F.col(id_col)],
        k=max_per_group,
        salt_buckets=8,
        salt_on=[id_col],
        rank_col="_rk",
    )
    return capped.select(
        *df.columns, F.col("_rk").cast("long").alias("quota_rank")
    )


__all__.append("source_quota")


def duplicate_span_extents(
    df: DataFrame,
    span: int = 5,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-substring dedup REPORTING (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", at token granularity):
    the maximal extents of text shared verbatim across >= ``min_docs``
    documents.  Where ``remove_duplicate_spans`` rewrites the corpus,
    this returns the audit — (id, span_start, span_len, n_grams) per
    maximal duplicated region — the artifact you inspect before
    deciding to cut.

    Maximality via gaps-and-islands: duplicated ``span``-gram start
    positions merge into one region while consecutive starts are
    <= ``span`` apart (their coverage windows overlap or touch); the
    region covers [min(start), max(start)+span-1].

    Scale shape: gram build and duplicate detection are the
    ``remove_duplicate_spans`` shapes (one explode, gram-key groupBy);
    the island window partitions BY DOCUMENT ordered by position —
    state bounded by a single document's length, embarrassingly
    parallel across docs, never a global window.
    """
    from pyspark.sql import Window

    from .dedup import _spread

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = _spread(df).select(
        F.col(id_col).alias("id"),
        toks.alias("_toks"),
        F.size(toks).cast("long").alias("n_tokens"),
    ).localCheckpoint(eager=False)  # feeds gram build AND the dup count;
    # _spread so the gram build parallelizes on few-split input
    starts = F.when(
        F.col("n_tokens") >= span,
        F.sequence(F.lit(0), (F.col("n_tokens") - span).cast("int")),
    ).otherwise(F.array().cast("array<int>"))
    grams = base.select(
        "id", F.explode(starts).alias("start"), "_toks"
    ).select(
        "id",
        "start",
        F.array_join(
            F.slice("_toks", F.col("start") + F.lit(1), span), " "
        ).alias("gram"),
    ).localCheckpoint(eager=False)
    dup = (
        grams.groupBy("gram")
        .agg(F.count_distinct("id").alias("_df"))
        .where(F.col("_df") >= min_docs)
        .select("gram")
    )
    ds = grams.join(dup, on="gram").select("id", "start")
    w = Window.partitionBy("id").orderBy("start")
    flagged = ds.withColumn(
        "_new",
        F.when(
            F.lag("start").over(w).isNull()
            | (F.col("start") > F.lag("start").over(w) + span),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "_island",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        flagged.groupBy("id", "_island")
        .agg(
            F.min("start").cast("long").alias("span_start"),
            (F.max("start") + span - 1 - F.min("start") + 1)
            .cast("long")
            .alias("span_len"),
            F.count("*").cast("long").alias("n_grams"),
        )
        .select("id", "span_start", "span_len", "n_grams")
    )


__all__.append("duplicate_span_extents")


def token_budget_shards(
    df: DataFrame,
    budget_tokens: int,
    order_cols: list[str],
    text_col: str = "text",
) -> DataFrame:
    """Assign documents to contiguous, ~equal-token output shards — the
    writer-side partitioner of a training-corpus build (Megatron/GPT
    dataset sharding): documents in ``order_cols`` order are cut into
    shards of ``budget_tokens`` whitespace tokens each; a document is
    never split (the shard of a doc is determined by the cumulative
    token count BEFORE it, so shard boundaries land between documents).

    Complements ``pack_sequences`` (which packs a GIVEN shard's token
    stream into fixed-length training sequences): this operator CREATES
    the shards from a global ordering.

    Scale shape: the cumulative sum rides
    ``ranking.global_running_sum`` — range-partition on the order
    columns, per-partition prefix sums, broadcast |partitions|-row
    offset join. No unpartitioned window, no driver data path; the
    same machinery that de-windowed q99/q112.

    Returns one row per shard: (shard_id, n_docs, shard_tokens,
    first_*, last_*) with first/last of the FIRST order column —
    the shard manifest a writer consumes.
    """
    from .ranking import global_running_sum
    from .textstats import token_count

    toks = df.select(
        *[F.col(c) for c in order_cols],
        token_count(F.col(text_col)).cast("long").alias("_n_tok"),
    )
    cum = global_running_sum(toks, list(order_cols), "_n_tok")
    # exclusive prefix -> integer div: doc starts in shard floor(prev/B)
    shard = F.expr(f"(running_sum - _n_tok) div {int(budget_tokens)}")
    lead = F.col(order_cols[0])
    return (
        cum.withColumn("shard_id", shard.cast("long"))
        .groupBy("shard_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("_n_tok").cast("long").alias("shard_tokens"),
            F.min(lead).alias("first_doc"),
            F.max(lead).alias("last_doc"),
        )
    )


__all__.append("token_budget_shards")


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str,
    range_ranked: bool = False,
) -> DataFrame:
    """Cross-group quantile normalization of a score column — the
    calibration step before a GLOBAL threshold is applied to quality
    scores coming from heterogeneous sources (a length-ish score from
    a web crawl and the same score from curated books are not
    comparable raw; after rank-mapping through the pooled
    distribution they are). Each row's within-group rank maps to the
    pooled distribution's value at the proportional global rank:
    ``g_rank = 1 + ((s_rank-1)·(N-1)) div (n_group-1)`` — ALL integer
    arithmetic, ties broken by ``id_col``, so the mapping is a total
    order both engines reproduce exactly (a percentile interpolation
    would reintroduce float luck). Single-row groups map to the
    pooled median.

    Shape at scale: one partitioned window per group (never an
    unpartitioned window — the pooled ranking rides
    ``ranking.global_row_number``'s per-partition offsets) plus one
    equi-join on the computed global rank. Returns the input id/group
    + (score, norm_score).

    ``range_ranked`` (r10 hot-key guard): the default per-group window
    puts a group's whole row set through ONE task — and the dominant
    source owning most of the corpus is the NORMAL shape for this
    operator (that's why cross-source calibration is needed at all).
    With it on, the within-group rank ALSO rides
    ``ranking.global_row_number`` — ranked over the total order
    (group, score, id), whose range partitioner spreads even a single
    hot group across partitions — and the group-local rank is
    recovered as ``rank - min(rank per group) + 1`` via one
    metadata-scale broadcast join (|groups| rows), as is the group
    count. Identical output (unit-tested); measured 44.5 -> 15.7s on
    an 8M-row hot group. Costs a second global ranking, so the
    default stays plain."""
    from pyspark.sql import types as T

    from .ranking import global_row_number

    # The integer-arithmetic contract is enforced, not just documented:
    # a silent cast("long") on a fractional score would truncate (0.4
    # and 0.6 both rank as 0), merging distinct values and changing the
    # within-group order with no error. Pre-quantize fractional scores
    # explicitly (the caller owns the scale) before calling.
    score_type = df.schema[score_col].dataType
    if not isinstance(
        score_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        raise TypeError(
            f"quantile_normalize: score column {score_col!r} must be an "
            f"integral type (got {score_type.simpleString()}); quantize "
            "fractional scores explicitly before normalizing"
        )
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(group_col).alias("_grp"),
        F.col(score_col).cast("long").alias("score"),
    )
    if range_ranked:
        ranked = global_row_number(
            base, ["_grp", "score", "_id"], idx_col="_gr"
        ).localCheckpoint(eager=False)
        grp_info = ranked.groupBy("_grp").agg(
            F.min("_gr").alias("_gr0"),
            F.count("*").alias("_ns"),
        ).select(F.col("_grp").alias("_g_grp"), "_gr0", "_ns")
        # null-safe on the group key: a null group is a real window
        # partition in the plain path, so a plain inner equi-join
        # would silently drop its rows
        s = ranked.join(
            F.broadcast(grp_info), F.col("_grp").eqNullSafe(F.col("_g_grp"))
        ).select(
            "_id",
            "_grp",
            "score",
            (F.col("_gr") - F.col("_gr0") + 1).alias("_srank"),
            "_ns",
        )
    else:
        w = Window.partitionBy("_grp").orderBy("score", "_id")
        s = base.select(
            "_id",
            "_grp",
            "score",
            F.row_number().over(w).alias("_srank"),
            F.count("*").over(Window.partitionBy("_grp")).alias("_ns"),
        )
    g = global_row_number(
        base.select("_id", "score"), ["score", "_id"], idx_col="_grank"
    ).localCheckpoint(eager=False)
    pooled = g.select(F.col("_grank").alias("_target"), F.col("score").alias("norm_score"))
    n_total = g.select(F.col("n_total")).limit(1)
    target = F.when(
        F.col("_ns") == 1,
        1 + F.expr("(n_total - 1) div 2"),
    ).otherwise(
        1 + F.expr("((_srank - 1) * (n_total - 1)) div (_ns - 1)")
    )
    return (
        s.crossJoin(F.broadcast(n_total))
        .select("_id", "_grp", "score", target.cast("long").alias("_target"))
        .join(pooled, on="_target")
        .select(
            F.col("_id").alias(id_col),
            F.col("_grp").alias(group_col),
            "score",
            "norm_score",
        )
    )


__all__.append("quantile_normalize")
