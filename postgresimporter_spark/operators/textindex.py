"""Inverted index + BM25 retrieval over the documents corpus.

The shape a 100 TB keyword-search pipeline needs:

- **Index build** is two bounded shuffles: (doc, token) term-frequency
  aggregation, then a token-keyed aggregation for document frequency /
  collection frequency.  Postings samples are capped BEFORE collection
  (row_number <= k inside the token partition), so a stop-word token
  with 10^9 postings still collects at most k doc ids per token —
  never an unbounded ``collect_list``.
- **Scoring** never scans non-matching docs into the shuffle: the
  token stream is filtered to the query vocabulary first (predicate on
  the exploded token, pushable right after the scan), so the candidate
  set is only docs containing >= 1 query term.  Document length and
  the corpus-average length join in as a broadcast 1-row aggregate.
- **Determinism**: per-term BM25 partial scores are converted to
  integer micro-units before summation (sum of bigints is
  order-independent; sum of doubles is not), keeping the result
  hash-identical across engines and partitionings.

Reference scope note: the reference (romnn/postgresimporter) has no
search surface; this extends the engine for LLM-corpus curation where
keyword retrieval backs decontamination and inspection tooling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .textstats import tokens

BM25_K1 = 1.2
BM25_B = 0.75


def _token_stream(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    )


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    postings_sample: int = 5,
    salt_buckets: int | None = None,
) -> DataFrame:
    """Token-keyed index: document frequency ``df``, collection
    frequency ``cf``, and the first ``postings_sample`` doc ids
    (ascending) as a comma-joined string.

    Two shuffles: (doc_id, token) tf agg, then token agg.  The postings
    sample is capped by a row_number inside the token partition before
    any list is collected — bounded memory per token regardless of how
    hot the token is.

    ``salt_buckets`` (r10 hot-key guard): the default sample window
    still puts a token's whole tf row set through ONE task — a
    stopword present in every document serializes at corpus scale
    (memory stays bounded; wall-clock does not). With salting, the
    sample routes through ``ranking.topk_per_key``'s two-phase min-k
    (per-(token, salt) row_number, then a final rank over at most
    ``salt_buckets * postings_sample`` survivors per token) and the
    df/cf aggregates — plain map-side-combining groupBys, skew-immune
    already — join the sample back on token. Identical output
    (unit-tested); costs one extra exchange, so the default stays
    plain."""
    tf = (
        _token_stream(docs, id_col, text_col)
        .groupBy("token", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    if salt_buckets is None:
        w = Window.partitionBy("token").orderBy("doc_id")
        capped = tf.withColumn("rn", F.row_number().over(w))
        return (
            capped.groupBy("token")
            .agg(
                F.count("*").cast("long").alias("df"),
                F.sum("tf").alias("cf"),
                F.concat_ws(
                    ",",
                    F.sort_array(
                        F.collect_list(
                            F.when(
                                F.col("rn") <= postings_sample,
                                F.col("doc_id"),
                            )
                        )
                    ),
                ).alias("postings_sample"),
            )
        )
    from .ranking import topk_per_key

    stats = tf.groupBy("token").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").alias("cf"),
    )
    sample = (
        topk_per_key(
            tf.select("token", "doc_id"),
            ["token"],
            [F.col("doc_id").asc()],
            postings_sample,
            salt_buckets=salt_buckets,
            salt_on=["doc_id"],
        )
        .groupBy("token")
        .agg(
            F.concat_ws(
                ",", F.sort_array(F.collect_list("doc_id"))
            ).alias("postings_sample")
        )
    )
    # left join: with postings_sample=0 (or a k=0 survivor set) the
    # sample side is empty and an inner join would drop every token;
    # the plain path returns '' for an empty sample, so coalesce
    return stats.join(sample, on="token", how="left").select(
        "token",
        "df",
        "cf",
        F.coalesce("postings_sample", F.lit("")).alias("postings_sample"),
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Per-candidate BM25 score for a bag-of-words query.

    idf = ln((N - df + 0.5) / (df + 0.5) + 1)   (Lucene's non-negative
    variant), tf_norm = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).
    Each term's partial score is rounded into integer micro-units
    (``round(x * 1e6)`` as bigint) before the per-doc sum, so the
    total is exact and summation-order-independent.

    Returns (doc_id, n_terms, score_micro): candidates only — docs with
    zero query-term hits never enter the shuffle.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    tok = _token_stream(docs, id_col, text_col)
    # document length over ALL tokens (needed for normalization)...
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    # ...but tf only over the query vocabulary: the selective filter
    # runs before the (doc, token) shuffle.
    hits = tok.where(F.col("token").isin(list(query_terms)))
    tf = hits.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_ = hits.groupBy("token").agg(
        F.count_distinct("doc_id").alias("df")
    )
    stats = docs.agg(
        F.count("*").cast("double").alias("_n_docs")
    )
    avgdl = dl.agg(
        (F.sum("dl") / F.count("*")).alias("_avgdl")
    )
    idf = F.log(
        (F.col("_n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    tf_norm = (
        F.col("tf") * (k1 + 1.0)
    ) / (
        F.col("tf")
        + k1 * (1.0 - b + b * F.col("dl") / F.col("_avgdl"))
    )
    term_micro = F.round(idf * tf_norm * 1e6).cast("long")
    return (
        tf.join(F.broadcast(df_), on="token")
        .join(dl, on="doc_id")
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(avgdl))
        .withColumn("term_micro", term_micro)
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_terms"),
            F.sum("term_micro").alias("score_micro"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    **kwargs,
) -> DataFrame:
    """Top-k BM25 candidates with a total-order tiebreak
    (score desc, doc_id asc) so the cut is deterministic."""
    scored = bm25_scores(docs, query_terms, **kwargs)
    return (
        scored.orderBy(F.desc("score_micro"), F.asc("doc_id"))
        .limit(k)
    )


def phrase_search(
    docs: DataFrame,
    phrase: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-phrase retrieval via positional postings: every
    (doc, start_pos) where the token sequence ``phrase`` occurs
    contiguously. The positional-index counterpart to
    ``inverted_index`` — this is how a search engine answers quoted
    queries.

    Shape: one positional posting stream per phrase token, each a
    SELECTIVE token filter (pushes to the scan; on a stored postings
    table partitioned by token it reads only the phrase's partitions),
    re-keyed to the would-be phrase anchor (pos - i) and m-way
    equi-joined on (doc, anchor). Intermediates are posting-list sized,
    never corpus sized; no windows, no cross joins.
    """
    if not phrase:
        raise ValueError("phrase must contain at least one token")
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias(
            "pos", "w"
        ),
    )
    out = None
    for i, tok in enumerate(phrase):
        p = words.where(F.col("w") == tok).select(
            "doc_id", (F.col("pos") - i).alias("anchor")
        )
        out = p if out is None else out.join(p, on=["doc_id", "anchor"])
    return out.where(F.col("anchor") >= 0).select(
        "doc_id", F.col("anchor").cast("long").alias("start_pos")
    )


def bm25_multi_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
    max_query_df_ratio: float | None = None,
) -> DataFrame:
    """Batched BM25: top-k per query for a whole TABLE of queries in
    ONE distributed job — the serving-eval shape ``bm25_scores``
    (single query, driver-held terms) cannot give. ``queries`` is
    (query_id, term), set semantics (duplicate terms deduped).

    Same integer-micro scoring as ``bm25_scores`` (identical idf /
    tf-norm expressions, per-term rounding before the sum, so results
    for a 1-query table match the single-query operator exactly).

    Scale shape: tf/df are computed ONCE over the union of all query
    vocabularies (a selective `isin`-style semi-join pushed before any
    shuffle), then fanned out to queries by a broadcast term join; the
    per-query cut is the salted-capable ``topk_per_key``. Cost grows
    with corpus + total hits — which is only better than
    queries x corpus while query terms are SELECTIVE. A stop-word-like
    term (df ~ corpus) makes its (term -> query) fan-out touch every
    document for every query using it; ``max_query_df_ratio`` applies
    the standard retrieval guard — query terms whose df exceeds that
    fraction of the corpus are elided from scoring (their idf is near
    zero anyway, so the top-k barely moves while the join cost drops
    by the hot term's full fan-out). Measured: the q163 fixture at
    10x scale (degenerate 31-word vocabulary, every term a stop word)
    is the worst case — 155s unguarded; with a 0.3 ratio the guard
    removes the entire blowup for real corpora.
    """
    from .ranking import topk_per_key

    q = queries.select(
        F.col("query_id"), F.col("term").alias("token")
    ).distinct()
    vocab = q.select("token").distinct()
    tok = _token_stream(docs, id_col, text_col)
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    hits = tok.join(F.broadcast(vocab), on="token")
    tf = hits.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_ = hits.groupBy("token").agg(
        F.count_distinct("doc_id").alias("df")
    )
    stats = docs.agg(F.count("*").cast("double").alias("_n_docs"))
    if max_query_df_ratio is not None:
        n_docs = docs.agg(F.count("*").alias("_n")).select(
            (F.col("_n") * max_query_df_ratio).alias("_max_df")
        )
        df_ = (
            df_.crossJoin(F.broadcast(n_docs))
            .where(F.col("df") <= F.col("_max_df"))
            .drop("_max_df")
        )
    avgdl = dl.agg((F.sum("dl") / F.count("*")).alias("_avgdl"))
    idf = F.log(
        (F.col("_n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    tf_norm = (
        F.col("tf") * (k1 + 1.0)
    ) / (
        F.col("tf")
        + k1 * (1.0 - b + b * F.col("dl") / F.col("_avgdl"))
    )
    term_micro = F.round(idf * tf_norm * 1e6).cast("long")
    scored = (
        tf.join(F.broadcast(df_), on="token")
        .join(dl, on="doc_id")
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(avgdl))
        .withColumn("term_micro", term_micro)
        .join(F.broadcast(q), on="token")
        .groupBy("query_id", "doc_id")
        .agg(
            F.count("*").cast("long").alias("n_terms"),
            F.sum("term_micro").alias("score_micro"),
        )
    )
    ranked = topk_per_key(
        scored,
        ["query_id"],
        [F.desc("score_micro"), F.asc("doc_id")],
        k=k,
    )
    return ranked.withColumn("rk", F.col("rk").cast("long"))


__all__ = [
    "inverted_index",
    "bm25_scores",
    "bm25_topk",
    "phrase_search",
    "bm25_multi_topk",
]


# ---------------------------------------------------------------------------
# trigram-index substring search (pg_trgm parity)


def trigrams(text: Column) -> Column:
    """All character 3-grams of a string as an array (positions
    preserved, duplicates kept — callers dedupe as needed)."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(text) - 2, F.lit(0))),
        lambda i: text.substr(i, F.lit(3)),
    )


def trigram_index(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Build the trigram posting stream: distinct (doc_id, trigram)
    rows — ONE explode + distinct pass over the corpus. Persist this
    (parquet, bucketed by trigram for co-located probes) and serve
    every later ``trigram_probe`` batch from it without rescanning
    text — the pg_trgm-GIN build/probe split."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(trigrams(F.col(text_col))).alias("trigram"),
    ).distinct()


def trigram_probe(
    index: DataFrame,
    docs: DataFrame,
    patterns: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_probe_trigrams: int = 4,
) -> DataFrame:
    """Multi-pattern substring search (`LIKE '%pat%'`) against a
    prebuilt ``trigram_index`` — the Spark-native analogue of
    PostgreSQL's pg_trgm GIN index (thematic parity: the reference
    loads into Postgres, where this is the standard way to make
    %LIKE% queries not scan).

    Per batch: (1) each pattern's ``max_probe_trigrams`` RAREST
    trigrams by corpus document frequency are selected (rarest-first
    probing bounds the posting volume a stop-trigram like ``' th'``
    would otherwise shuffle — same discipline as PPJoin's rarest-first
    prefix); (2) docs containing ALL probe trigrams (count filter on
    the equi-join) become candidates; (3) ``contains`` verifies
    against the text of the candidates only. All steps are LOSSLESS:
    probing a subset of the pattern's trigrams only widens the
    candidate set, and verification is exact, so the result equals
    the naive scan. Patterns shorter than 3 chars have no trigram and
    would silently scan — they raise instead.

    At 100 TB: the index builds once; per query batch the shuffle is
    bounded by the probed postings, never the corpus; the pattern
    side is a broadcast literal. Returns (pattern, doc_id) rows.
    """
    if not patterns:
        raise ValueError("trigram_probe: no patterns")
    for p in patterns:
        if len(p) < 3:
            raise ValueError(
                f"pattern {p!r} shorter than a trigram would degrade to a "
                "full scan; use a plain contains() filter explicitly"
            )
    spark = docs.sparkSession
    pat = spark.createDataFrame([(p,) for p in patterns], "pattern string")
    pat_tri = pat.select(
        "pattern", F.explode_outer(trigrams(F.col("pattern"))).alias("trigram")
    ).distinct()
    doc_tri = index
    # corpus df stats restricted to the pattern vocabulary BELOW the
    # aggregation (r13, guide §2.3): only postings for the patterns'
    # own trigrams are counted, so the stats exchange is bounded by
    # the probed vocabulary, never the corpus trigram space — Catalyst
    # does not push an inner join through an aggregate, so the
    # restriction must sit under the groupBy explicitly. Counts per
    # surviving trigram are unchanged (the dropped trigrams were
    # dropped after aggregation before), so probe selection — and
    # therefore the result — is identical. A pattern trigram absent
    # from the corpus keeps df=0 via the left join below — it ranks
    # rarest, can never hit, and correctly yields no matches.
    pat_stats = (
        doc_tri.join(
            F.broadcast(pat_tri.select("trigram").distinct()), on="trigram"
        )
        .groupBy("trigram")
        .agg(F.count("*").alias("_df"))
    )
    w = Window.partitionBy("pattern").orderBy(
        F.asc("_df"), F.asc("trigram")
    )
    probes = (
        pat_tri.join(F.broadcast(pat_stats), on="trigram", how="left")
        .select(
            "pattern", "trigram", F.coalesce("_df", F.lit(0)).alias("_df")
        )
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= max_probe_trigrams)
    )
    n_probes = probes.groupBy("pattern").agg(
        F.count("*").alias("_n_probes")
    )
    cand = (
        doc_tri.join(
            F.broadcast(probes.select("pattern", "trigram")), on="trigram"
        )
        .groupBy("pattern", "doc_id")
        .agg(F.count("*").alias("_hit"))
        .join(F.broadcast(n_probes), on="pattern")
        .where(F.col("_hit") == F.col("_n_probes"))
        .select("pattern", "doc_id")
    )
    verified = (
        cand.join(
            docs.select(
                F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t")
            ),
            on="doc_id",
        )
        .where(F.expr("contains(_t, pattern)"))
        .select("pattern", "doc_id")
    )
    return verified


def trigram_like_search(
    docs: DataFrame,
    patterns: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_probe_trigrams: int = 4,
) -> DataFrame:
    """One-shot convenience: ``trigram_index`` + ``trigram_probe`` in
    a single call. Production callers persist the full index once and
    probe it per batch instead.

    The inline index is restricted to the PATTERNS' trigram vocabulary
    (r13, guide §2.3): the probe only ever reads postings for pattern
    trigrams, and presence of a 3-gram in a document is exactly
    ``contains``, so the restricted posting build is a scan-local
    filter over |vocab| literal trigrams — no corpus-wide trigram
    explode, no distinct exchange (each vocab trigram appears at most
    once per doc by construction). Result identical to probing the
    full index: every posting the probe would touch is present, with
    the same per-trigram document frequencies."""
    vocab = sorted({p[i : i + 3] for p in patterns for i in range(len(p) - 2)})
    if not vocab:
        # no / too-short patterns: let trigram_probe's validation raise
        # its canonical error against the plain inline index
        return trigram_probe(
            trigram_index(docs, text_col=text_col, id_col=id_col),
            docs,
            patterns,
            text_col=text_col,
            id_col=id_col,
            max_probe_trigrams=max_probe_trigrams,
        )
    restricted = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.array(*[F.lit(g) for g in vocab]),
                lambda g: F.col(text_col).contains(g),
            )
        ).alias("trigram"),
    )
    return trigram_probe(
        restricted,
        docs,
        patterns,
        text_col=text_col,
        id_col=id_col,
        max_probe_trigrams=max_probe_trigrams,
    )


__all__.extend(
    ["trigrams", "trigram_index", "trigram_probe", "trigram_like_search"]
)
