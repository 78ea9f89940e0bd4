"""Corpus mining operators: containment dedup, LM quality scoring,
PMI phrase mining, hard-negative mining, content-defined chunking.

Net-new engine surface beyond the reference
(``/root/reference/postgresimporter/main.py`` ships none of this) —
the second-order curation toolkit a 100 TB training-data pipeline runs
after the first dedup/quality pass:

- **Containment pairs**: asymmetric near-dup detection. Jaccard misses
  the "document A is a quote-wrapped subset of document B" case (small
  |A| inflates the union); containment ``|A∩B| / min(|A|,|B|)`` flags
  exactly that. Same shingle equi-join scale shape as Jaccard — never
  a cross join, same hot-shingle cap.
- **Unigram log-prob scoring** (CCNet-style): score each document by
  the average log-probability of its tokens under the corpus's own
  unigram distribution. Junk (mojibake, base64 blobs, exotic boiler-
  plate) scores low; the score drives percentile-based triage. Token
  probabilities come from one aggregation; the per-doc score is one
  join + one aggregation, all on the token key.
- **PMI bigram mining**: pointwise mutual information ranks token
  pairs that co-occur far above chance — the classic phrase/collocation
  detector (word2vec-era phrase joining). Exact integer counts; one
  ``ln`` per surviving bigram keeps floats deterministic per-row.
- **Hard negatives**: for each probe embedding, the top-k most-similar
  corpus vectors with a DIFFERENT label — the contrastive-training
  fuel. Probes broadcast; the corpus never shuffles (same posture as
  ``brute_force_topk``).
- **CDC chunks**: content-defined chunking — chunk boundaries fall
  where a rolling token hash hits a mask, so an insertion early in a
  document shifts chunk *contents* only locally (fixed-size chunking
  would shift every downstream chunk). Chunk hashes enable sub-document
  dedup across the corpus. Per-document windows only — bounded by doc
  length, embarrassingly parallel across docs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _md5_long, _spread, shingles
from .similarity import cosine
from .textstats import tokens


def containment_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_ratio: float | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """Asymmetric near-duplicate pairs by shingle containment
    ``|A∩B| / min(|A|,|B|)`` — catches subset-duplicates that Jaccard's
    union denominator dilutes (a tweet quoted inside an article).

    Scale shape identical to ``ngram_jaccard_pairs``: explode distinct
    shingles, optional hot-shingle cap, equi-join on the shingle key,
    per-pair shared-count aggregation. Returns (id_a, id_b, containment)
    with id_a < id_b.

    Duplicate-value compression (round 10, with ``ngram_jaccard_pairs``
    — same probe, same blow-up: 3.1s -> 30.6s on sf0.1 documents
    duplicated 10x at row level): shingling, the shingle join, and the
    aggregate run over DISTINCT texts; identical-text families pair at
    containment exactly 1.0 iff they keep >= 1 surviving shingle; the
    hot-shingle document frequency weights each value by its
    multiplicity; matches expand back to id pairs LAST.
    """
    from .dedup import _expand_value_pairs, _text_values

    vals, members = _text_values(df, text_col, id_col)
    sh = _spread(vals).select(
        "vid", "cnt", shingles(F.col("_t"), n).alias("sh")
    )
    exploded_raw = sh.select("vid", "cnt", F.explode("sh").alias("shingle"))
    if max_doc_ratio is not None:
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
    pairs = (
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
    containment = F.col("n_common") / F.least(F.col("n_a"), F.col("n_b"))
    vpairs = (
        pairs.withColumn("containment", F.round(containment, round_digits))
        .where(F.col("containment") >= threshold)
        .select("vid_a", "vid_b", "containment")
    )
    self_vids = (
        vals.where(F.col("cnt") >= 2).join(sizes, on="vid").select("vid")
        if threshold <= 1.0
        else vals.where(F.lit(False)).select("vid")
    )
    return _expand_value_pairs(
        vpairs, self_vids, members, "containment", F.lit(1.0)
    )


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """CCNet-style LM quality score: per document, the mean natural-log
    probability of its tokens under the corpus unigram distribution.

    One explode + one token-count aggregation builds the "model"; the
    score is a token-key join back plus a per-doc aggregation — the
    exact shape of dup_ngram_fraction, so the same skew notes apply.
    The per-token log is rounded before summing so the float total is
    engine-portable at the reported precision.
    """
    ex = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_t")
    ).localCheckpoint(eager=False)  # feeds the count AND the join back
    # (no _spread here: the bare token explode is cheap — measured
    # 0.77s -> 1.08s WORSE with a pre-explode repartition at sf0.1; the
    # spread only pays when the per-row fold is heavy, e.g. shingle or
    # simhash builds)
    counts = ex.groupBy("_t").agg(F.count("*").alias("_c"))
    total = counts.agg(F.sum("_c").alias("_n"))
    logp = F.round(
        F.log(F.col("_c").cast("double") / F.col("_n").cast("double")), 9
    )
    return (
        ex.join(counts, on="_t")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(logp).alias("_sum_logp"),
        )
        .select(
            id_col,
            "n_tokens",
            F.round(
                F.col("_sum_logp") / F.col("n_tokens").cast("double"),
                round_digits,
            ).alias("avg_logprob"),
        )
    )


def pmi_bigrams(
    df: DataFrame,
    min_count: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Pointwise mutual information over adjacent token pairs:
    ``pmi(a,b) = ln( (c_ab / N_bi) / ((c_a / N_uni) * (c_b / N_uni)) )``.

    Counts are exact integers (two aggregations: unigrams, bigrams);
    the single ``ln`` per surviving bigram is computed from one ratio of
    exact counts, so the float is deterministic per-row. Totals join in
    as broadcast 1-row aggregates. ``min_count`` prunes the noise tail
    BEFORE the unigram joins — at web scale the surviving bigram
    vocabulary is orders of magnitude smaller than the raw one.
    """
    tok = df.select(
        F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("pos", "_t")
    ).localCheckpoint(eager=False)  # unigram AND bigram counts read this
    uni = tok.groupBy("_t").agg(F.count("*").alias("c_tok"))
    n_uni = uni.agg(F.sum("c_tok").cast("double").alias("_n_uni"))

    nxt = tok.select(
        F.col(id_col), (F.col("pos") + 1).alias("pos"), F.col("_t").alias("_t2")
    )
    bi = (
        tok.join(nxt, on=[id_col, "pos"])
        .groupBy(F.col("_t").alias("tok_b"), F.col("_t2").alias("tok_a"))
        .agg(F.count("*").alias("c_bi"))
    )
    # NOTE join orientation: tok at pos p+1 meets nxt carrying the token
    # from pos p — so _t is the SECOND word, _t2 the first.
    bi = bi.select(
        F.col("tok_a").alias("w1"), F.col("tok_b").alias("w2"), "c_bi"
    ).where(F.col("c_bi") >= min_count)
    n_bi = bi.agg(F.coalesce(F.sum("c_bi"), F.lit(0)).cast("double").alias("_n_bi"))

    u1 = uni.select(F.col("_t").alias("w1"), F.col("c_tok").alias("c1"))
    u2 = uni.select(F.col("_t").alias("w2"), F.col("c_tok").alias("c2"))
    pmi = F.log(
        (F.col("c_bi") / F.col("_n_bi"))
        / ((F.col("c1") / F.col("_n_uni")) * (F.col("c2") / F.col("_n_uni")))
    )
    return (
        bi.join(u1, on="w1")
        .join(u2, on="w2")
        .crossJoin(F.broadcast(n_bi))
        .crossJoin(F.broadcast(n_uni))
        .select(
            "w1",
            "w2",
            F.col("c_bi").cast("long").alias("pair_count"),
            F.round(pmi, round_digits).alias("pmi"),
        )
    )


def bigram_perplexity(
    df: DataFrame,
    k: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Per-document perplexity under an add-k-smoothed bigram LM trained
    on the corpus itself — the CCNet perplexity-filter shape, with the
    KenLM black box replaced by an exactly-reproducible count model:
    ``P(w2|w1) = (c(w1,w2) + k) / (c(w1) + k·V)``.

    Three aggregations on token keys (unigram, bigram, vocab size) plus
    one join of each doc's bigram stream back to the model — the same
    scale shape as ``unigram_logprob``. Per-bigram logs round at 9
    digits before the sum; docs with fewer than 2 tokens drop out (no
    bigram evidence). Returns (doc_id, n_bigrams, avg_nll, ppl).
    """
    tok = df.select(
        F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("pos", "_t")
    ).localCheckpoint(eager=False)
    uni = tok.groupBy("_t").agg(F.count("*").alias("c_uni"))
    vocab = uni.agg(F.count("*").cast("double").alias("_v"))

    nxt = tok.select(
        F.col(id_col), (F.col("pos") + 1).alias("pos"), F.col("_t").alias("_w1")
    )
    inst = tok.join(nxt, on=[id_col, "pos"]).select(
        F.col(id_col), F.col("_w1"), F.col("_t").alias("_w2")
    )
    bi = inst.groupBy("_w1", "_w2").agg(F.count("*").alias("c_bi"))

    nll = -F.round(
        F.log(
            (F.col("c_bi") + F.lit(k))
            / (F.col("c_uni") + F.lit(k) * F.col("_v"))
        ),
        9,
    )
    return (
        inst.join(bi, on=["_w1", "_w2"])
        .join(uni.withColumnRenamed("_t", "_w1"), on="_w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum(nll).alias("_sum_nll"),
        )
        .select(
            id_col,
            "n_bigrams",
            F.round(
                F.col("_sum_nll") / F.col("n_bigrams").cast("double"),
                round_digits,
            ).alias("avg_nll"),
        )
        .withColumn("ppl", F.round(F.exp(F.col("avg_nll")), 4))
    )


def hard_negatives(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    corpus_id: str = "vec_id",
    probe_id: str = "probe_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_digits: int = 6,
) -> DataFrame:
    """Per probe, the top-k most-cosine-similar corpus vectors whose
    label DIFFERS from the probe's — contrastive hard negatives.

    ``broadcast(probes)`` keeps the corpus partitioned (map-side nested
    loop, no corpus shuffle); the label inequality prunes before the
    window. Top-k per probe via row_number with a total-order tiebreak.
    """
    p = F.broadcast(
        probes.select(
            F.col(probe_id),
            F.col(vec_col).alias("_pvec"),
            F.col(label_col).alias("_plabel"),
        )
    )
    scored = (
        corpus.select(
            F.col(corpus_id),
            F.col(vec_col).alias("_cvec"),
            F.col(label_col).alias("_clabel"),
        )
        .crossJoin(p)
        .where(F.col("_clabel") != F.col("_plabel"))
        .withColumn(
            "score", F.round(cosine(F.col("_cvec"), F.col("_pvec")), round_digits)
        )
    )
    w = Window.partitionBy(probe_id).orderBy(F.desc("score"), F.asc(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(probe_id, corpus_id, "score", "rank")
    )


def cdc_chunks(
    df: DataFrame,
    mask_bits: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk: int | None = 1 << 16,
) -> DataFrame:
    """Content-defined chunking: a chunk boundary falls AFTER token i
    when ``md5_long(token_i) mod 2^mask_bits == 0`` (expected chunk
    length 2^mask_bits tokens). Returns one row per (doc, chunk) with
    the chunk's token count and md5 hash over its space-joined tokens —
    the unit of sub-document dedup.

    Unlike fixed-size chunking, an edit shifts only the chunk it lands
    in: boundaries are content-anchored, so identical passages chunk
    identically in every document that contains them.

    ``chunk`` (r12 probe — the giant-doc straggler, same class as the
    winnowing fix): the chunk-id assignment is a per-document PREFIX
    SUM, which pins a whole document to one window task (and the token
    explode to its scan task) — measured, one 64MB doc ran 24s on one
    core with 31 idle. A prefix sum decomposes two-phase exactly like
    the bucketed sessionize carry: slice the token array into
    ``chunk``-sized position ranges (no lookahead — boundaries are
    per-token), repartition the SLICES by (doc, slice), run the
    running sum within each slice, and add a carry-in computed from
    the per-slice boundary totals (a per-doc window over ~tokens/chunk
    tiny rows). Identical output; the heavy explode + hash + window
    all run post-shuffle, parallel per slice. ``None`` restores the
    single-window path.
    """
    mask = (1 << mask_bits) - 1
    is_bnd = lambda c: (  # noqa: E731
        _md5_long(c, 7).bitwiseAND(F.lit(mask)) == 0
    ).cast("int")
    if chunk is None:
        tok = df.select(
            F.col(id_col),
            F.posexplode(tokens(F.col(text_col))).alias("pos", "_t"),
        )
        # boundary AFTER token i -> token i+1 starts a new chunk;
        # chunk id = running count of boundaries strictly before it
        bnd = tok.withColumn("_b", is_bnd(F.col("_t")))
        w = (
            Window.partitionBy(id_col)
            .orderBy("pos")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        chunked = bnd.withColumn(
            "chunk_id",
            F.coalesce(F.sum("_b").over(w), F.lit(0)).cast("long"),
        )
    else:
        C = int(chunk)
        tk = tokens(F.col(text_col))
        sl = (
            df.select(F.col(id_col), tk.alias("_ws"))
            .select(
                F.col(id_col),
                "_ws",
                F.explode(
                    F.sequence(
                        F.lit(0),
                        F.floor(
                            (F.greatest(F.size("_ws"), F.lit(1)) - 1) / C
                        ).cast("long"),
                    )
                ).alias("_ck"),
            )
            .select(
                F.col(id_col),
                "_ck",
                (F.col("_ck") * C).alias("_a"),
                F.slice(F.col("_ws"), F.col("_ck") * C + 1, C).alias(
                    "_ws"
                ),
            )
            .repartition(id_col, "_ck")
        )
        bnd = sl.select(
            F.col(id_col),
            "_ck",
            "_a",
            F.posexplode("_ws").alias("_lp", "_t"),
        ).select(
            F.col(id_col),
            "_ck",
            (F.col("_a") + F.col("_lp")).alias("pos"),
            F.col("_t"),
            is_bnd(F.col("_t")).alias("_b"),
        )
        w_in = (
            Window.partitionBy(id_col, "_ck")
            .orderBy("pos")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        part = bnd.withColumn(
            "_cin", F.coalesce(F.sum("_b").over(w_in), F.lit(0))
        )
        # carry-in: cumulative boundary count of all PRIOR slices —
        # a per-doc window over ~n_tokens/chunk summary rows
        totals = bnd.groupBy(id_col, "_ck").agg(F.sum("_b").alias("_tb"))
        w_car = (
            Window.partitionBy(id_col)
            .orderBy("_ck")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = totals.select(
            F.col(id_col),
            "_ck",
            F.coalesce(F.sum("_tb").over(w_car), F.lit(0)).alias("_car"),
        )
        chunked = part.join(carry, on=[id_col, "_ck"]).withColumn(
            "chunk_id", (F.col("_car") + F.col("_cin")).cast("long")
        )
    return (
        chunked.groupBy(id_col, "chunk_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.md5(F.concat_ws(" ", F.array_sort(
                F.collect_list(F.struct("pos", "_t"))
            ).getField("_t"))).alias("chunk_hash"),
        )
        .select(id_col, "chunk_id", "n_tokens", "chunk_hash")
    )


def dsir_importance(
    df: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every
    document by ``Σ_tokens ln(p_target(w) / p_corpus(w))`` where both
    unigram LMs are add-1 smoothed — p_target estimated from the rows
    where ``is_target`` holds, p_corpus from the whole corpus.  High
    weight ⇒ the document looks like the target domain; resampling by
    weight skews a raw crawl toward it.

    Scale shape is exactly ``unigram_logprob``: one explode feeds both
    the LM counts and the join back (checkpointed against projection
    collapse); the two LMs come from ONE aggregation (conditional
    sums), so adding the target model costs no extra pass.  Per-token
    log-ratios round at 9 digits before summing so the float total is
    engine-portable (BUILD_NOTES invariant #1).
    """
    ex = df.select(
        F.col(id_col),
        # coalesce: a NULL predicate (e.g. source IS NULL) must count
        # as not-target, matching the oracle's CASE ... ELSE 0 — a NULL
        # here would be SKIPPED by sum() and silently drop the token
        F.coalesce(is_target.cast("int"), F.lit(0)).alias("_tgt"),
        F.explode(tokens(F.col(text_col))).alias("_t"),
    ).localCheckpoint(eager=False)
    counts = ex.groupBy("_t").agg(
        F.count("*").alias("_c_all"),
        F.sum("_tgt").alias("_c_tgt"),
    )
    totals = counts.agg(
        F.sum("_c_all").alias("_n_all"),
        F.sum("_c_tgt").alias("_n_tgt"),
        F.count("*").alias("_v"),
    )
    log_ratio = F.round(
        F.log(
            ((F.col("_c_tgt") + 1).cast("double"))
            / ((F.col("_n_tgt") + F.col("_v")).cast("double"))
        )
        - F.log(
            ((F.col("_c_all") + 1).cast("double"))
            / ((F.col("_n_all") + F.col("_v")).cast("double"))
        ),
        9,
    )
    return (
        ex.join(counts, on="_t")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(log_ratio).alias("_w"),
        )
        .select(
            id_col,
            "n_tokens",
            F.round("_w", round_digits).alias("dsir_weight"),
        )
    )


__all__ = [
    "containment_pairs",
    "unigram_logprob",
    "bigram_perplexity",
    "pmi_bigrams",
    "hard_negatives",
    "cdc_chunks",
    "dsir_importance",
]
