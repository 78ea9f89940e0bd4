"""Text analysis operators over the ``documents`` table (SURVEY §2.10):
token counting, quality scoring, language-ID heuristic, fingerprinting.

Everything is built-in-function compositions (split/regexp/aggregate) —
JVM-side, codegen-friendly, no Python in the hot path — and every
computation is exactly reproducible in ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language marker lexicons for the n-gram/stopword language-ID
# heuristic. Deterministic and oracle-reproducible; a real deployment
# would swap in a trained model via mapInPandas without changing the
# operator's shape.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "y", "es", "los"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}

# BPE-ish token pattern: word pieces, numbers, or single punctuation —
# the shape a byte-pair pre-tokenizer produces.
BPE_TOKEN_RX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _isin(values: list[str]):
    """Single-arg lambda factory for higher-order functions.

    NB: a two-parameter lambda (e.g. with a default-arg capture) makes
    PySpark pass (element, index) — the captured default silently becomes
    the index column. Close over values instead.
    """
    return lambda x: x.isin(values)


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty/blank text -> empty array."""
    return F.filter(
        F.split(F.trim(text), r"\s+"), lambda t: t != F.lit("")
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_token_count(text: Column) -> Column:
    """Sub-word-ish token count via the BPE-like regex."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RX), 0))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: lengths, token stats, punctuation
    and stopword ratios — the standard pre-training filter signals."""
    t = F.col(text_col)
    toks = tokens(t)
    n_toks = F.size(toks)
    all_markers = [w for ws in LANG_MARKERS.values() for w in ws]
    stop_hits = F.size(F.filter(toks, _isin(all_markers)))
    punct = F.length(F.regexp_replace(t, r"[^.!?,;:]", ""))
    return df.withColumns(
        {
            "n_chars_computed": F.length(t),
            "n_tokens": n_toks,
            "avg_token_len": F.round(
                F.when(
                    n_toks > 0,
                    F.aggregate(
                        toks,
                        F.lit(0),
                        lambda acc, x: acc + F.length(x),
                    ).cast("double")
                    / n_toks,
                ),
                6,
            ),
            "punct_ratio": F.round(
                punct.cast("double") / F.greatest(F.length(t), F.lit(1)), 6
            ),
            "stopword_ratio": F.round(
                F.when(
                    n_toks > 0, stop_hits.cast("double") / n_toks
                ).otherwise(F.lit(0.0)),
                6,
            ),
        }
    )


def language_scores(text: Column) -> dict[str, Column]:
    """Marker-hit count per language (the argmax is the predicted lang)."""
    toks = tokens(F.lower(text))
    return {
        lang: F.size(F.filter(toks, _isin(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def predict_language(text: Column) -> Column:
    """Deterministic argmax over language scores: greatest + first-match
    CASE in alphabetical code order (ties -> first code); zero hits ->
    'und'. The identical CASE chain is expressible in ANSI SQL."""
    scores = language_scores(text)
    best = F.greatest(*scores.values())
    expr = F.when(best == 0, F.lit("und"))
    for lang in sorted(LANG_MARKERS):
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return expr


def fingerprint(text: Column, n: int = 3) -> Column:
    """Document fingerprint: lexicographic min of md5(shingle) — a
    1-permutation MinHash. Engine-independent (md5), no shuffle."""
    from .dedup import shingles

    return F.array_min(
        F.transform(shingles(text, n), lambda s: F.md5(s))
    )


__all__ = [
    "tokens",
    "token_count",
    "bpe_token_count",
    "quality_features",
    "language_scores",
    "predict_language",
    "fingerprint",
    "LANG_MARKERS",
    "BPE_TOKEN_RX",
]


def tfidf_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    df_join: str = "auto",
) -> DataFrame:
    """Per-(doc, token) TF-IDF: tf by explode+count, document frequency
    by distinct count, idf = ln(N/df), 6-digit round for cross-engine
    comparability.

    ``df_join`` gates how the document-frequency table joins back into
    the tf table (VERDICT r01: a forced broadcast breaks when the
    vocabulary outgrows the driver):

    - ``"auto"``   — no hint; AQE broadcasts iff the aggregated df table
      is under ``spark.sql.autoBroadcastJoinThreshold`` at runtime (the
      size gate IS the optimizer's, fed by real runtime stats).
    - ``"broadcast"`` — force broadcast (known-small vocabulary).
    - ``"shuffle"``   — force sort-merge (known-huge vocabulary).

    The corpus size N joins in as a broadcast 1-row aggregate — never an
    eager ``.count()`` at plan-build time.
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_ = tok.groupBy("token").agg(
        F.count_distinct("doc_id").alias("df")
    )
    if df_join == "broadcast":
        df_side = F.broadcast(df_)
    elif df_join == "shuffle":
        df_side = df_.hint("merge")
    elif df_join == "auto":
        df_side = df_
    else:
        raise ValueError(f"df_join must be auto|broadcast|shuffle: {df_join}")
    n_docs = docs.agg(F.count("*").cast("double").alias("_n_docs"))
    return (
        tf.join(df_side, on="token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("_n_docs") / F.col("df")), 6),
        )
        .drop("_n_docs")
    )


def oov_rate(
    df: DataFrame,
    vocab_size: int = 25,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Out-of-vocabulary scoring: per document, the fraction of token
    occurrences outside the corpus's top-``vocab_size`` vocabulary
    (frequency desc, token asc — a total order, so the cut is
    deterministic under ties). The standard "will my tokenizer cover
    this" signal for mixing a new source into a training corpus.

    Scale shape: one token explode feeding both the vocabulary count
    and the membership probe (localCheckpointed — invariant 7); the
    vocabulary is a global top-N computed via TakeOrdered (no full
    sort) and broadcast into a left join, so the corpus-side probe is
    map-side only. Two bounded shuffles total.
    """
    ex = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("_t"),
    ).localCheckpoint(eager=False)
    vocab = (
        ex.groupBy("_t")
        .agg(F.count("*").alias("_n"))
        .orderBy(F.desc("_n"), F.asc("_t"))
        .limit(vocab_size)
        .select("_t", F.lit(1).alias("_inv"))
    )
    joined = ex.join(F.broadcast(vocab), on="_t", how="left")
    oov = F.when(F.col("_inv").isNull(), 1).otherwise(0)
    return (
        joined.groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(oov).cast("long").alias("n_oov"),
        )
        .select(
            id_col,
            "n_tokens",
            "n_oov",
            F.round(
                F.col("n_oov").cast("double")
                / F.col("n_tokens").cast("double"),
                round_digits,
            ).alias("oov_rate"),
        )
    )


__all__.append("oov_rate")


def winnowing_fingerprints(
    docs: DataFrame,
    k: int = 4,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk: int | None = 1 << 16,
) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every word ``k``-gram, then
    from each window of ``w`` consecutive gram hashes select the
    minimum (rightmost occurrence on ties) and keep the distinct
    (position, hash) selections. Guarantees at least one shared
    fingerprint for any match of length >= w + k - 1 tokens, with
    density 2/(w+1) — the provenance/plagiarism sketch a corpus
    pipeline stores per document.

    Shape: gram hashing is scan-local (zip-of-shifted-slices n-grams,
    one md5 per gram); selection is a per-document window (never
    global) using min over a (hash, -pos) struct so the rightmost-tie
    rule needs no second pass. Documents with fewer than ``w`` grams
    yield no fingerprints (the standard boundary: no full window
    exists).

    Precondition: ``id_col`` must be unique per input row (one row per
    document — the contract every caller in this repo satisfies).
    Duplicate ids were always ill-defined here (the per-doc window
    interleaves their grams into one position sequence); since r13's
    lag run-dedup replaced the global ``distinct()``, they would also
    emit duplicate (doc_id, pos, fp) rows that the distinct used to
    mask (ADVICE r13).

    ``chunk`` (r12 probe — the giant-doc straggler): the single-window
    path pins each document to ONE task twice over — the per-doc
    window, AND the gram array build + explode, which pipeline into
    the scan task (measured on a 64MB doc: 70.5s wall with 31 idle
    cores, ~27s of it the in-row gram build alone; window-only
    chunking recovered just 1.37x for exactly that reason). The full
    decomposition chunks the TOKEN ARRAY: split once (1.1s at 64MB),
    slice gram positions ``[ck*chunk, ...]`` plus the k-1 token / w-1
    gram lookahead a boundary window needs, repartition the SLICES by
    (doc, chunk) — tokens cross the wire once, ~1x text bytes, less
    than the old path's k-worded gram rows — then gram-build, hash,
    and window each chunk in parallel post-shuffle. A window start is
    kept only in its home chunk; output identical (same decomposition
    family as the bucketed sessionize/as-of paths). ``None`` restores
    the single-window path.
    """
    from .curation import raw_ngrams
    from .dedup import _md5_long
    from pyspark.sql import Window

    def sel_exprs(win):
        return [
            F.min(F.struct(F.col("h"), (-F.col("pos")).alias("np")))
            .over(win)
            .alias("_s"),
            F.count("*").over(win).alias("_c"),
        ]

    if chunk is None:
        grams = docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(raw_ngrams(F.col(text_col), k)).alias(
                "pos", "_g"
            ),
        ).select("doc_id", "pos", _md5_long(F.col("_g"), 0).alias("h"))
        win = (
            Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
        )
        lagw = Window.partitionBy("doc_id").orderBy("pos")
        sel = (
            grams.select("doc_id", "pos", *sel_exprs(win))
            .withColumn("_q", F.lag("_s").over(lagw))
            .where(
                (F.col("_c") == w)
                & (F.col("_q").isNull() | (F.col("_q") != F.col("_s")))
            )
        )
    else:
        C = int(chunk)
        # token-array chunking (see docstring). Gram positions are
        # 0-based; same tokenizer + zip-of-shifted-slices build as
        # raw_ngrams, so grams (including its short-doc quirk: fewer
        # than k tokens yield ONE short gram) are bit-identical.
        # Each chunk's slice reaches ONE gram position left of its home
        # range (`_e`, r13-opt) so the window of start `a-1` — the
        # previous chunk's last home start — is computable locally and
        # the lag dedup below stays exact across chunk boundaries.
        toks = F.split(F.trim(F.col(text_col)), r"\s+")
        sl = (
            docs.select(
                F.col(id_col).alias("doc_id"),
                toks.alias("_ws"),
                F.greatest(F.size(toks) - (k - 1), F.lit(1)).alias("_p"),
            )
            .select(
                "doc_id",
                "_ws",
                "_p",
                F.explode(
                    F.sequence(
                        F.lit(0),
                        F.floor((F.col("_p") - 1) / C).cast("long"),
                    )
                ).alias("_ck"),
            )
            .select(
                "doc_id",
                "_ck",
                F.greatest(F.col("_ck") * C - 1, F.lit(0)).alias("_e"),
                F.least(
                    (F.col("_ck") + 1) * C - 1 + (w - 1),
                    F.col("_p") - 1,
                ).alias("_b"),
                "_ws",
            )
            .select(
                "doc_id",
                "_ck",
                "_e",
                F.slice(
                    F.col("_ws"),
                    F.col("_e") + 1,
                    F.col("_b") - F.col("_e") + k,
                ).alias("_ws"),
            )
            # the exchange that makes a giant doc parallel: token
            # SLICES cross the wire (~1x text bytes — less than the
            # k-worded gram rows the old window exchange carried);
            # gram build + hash + window all run post-shuffle
            .repartition("doc_id", "_ck")
        )
        ln = F.greatest(F.size(F.col("_ws")) - (k - 1), F.lit(1))
        z = F.arrays_zip(
            *[
                F.slice(F.col("_ws"), i + 1, ln).alias(f"c{i}")
                for i in range(k)
            ]
        )
        gr = F.transform(
            z, lambda s: F.concat_ws(" ", *[s[f"c{i}"] for i in range(k)])
        )
        grams = sl.select(
            "doc_id",
            "_ck",
            "_e",
            F.posexplode(gr).alias("_lp", "_g"),
        ).select(
            "doc_id",
            "_ck",
            (F.col("_e") + F.col("_lp")).alias("pos"),
            _md5_long(F.col("_g"), 0).alias("h"),
        )
        win = (
            Window.partitionBy("doc_id", "_ck")
            .orderBy("pos")
            .rowsBetween(0, w - 1)
        )
        lagw = Window.partitionBy("doc_id", "_ck").orderBy("pos")
        sel = (
            grams.select("doc_id", "pos", "_ck", *sel_exprs(win))
            .withColumn("_q", F.lag("_s").over(lagw))
            .where(
                (F.col("_c") == w)
                & (F.expr(f"pos div {C}") == F.col("_ck"))
                & (F.col("_q").isNull() | (F.col("_q") != F.col("_s")))
            )
        )
    # No distinct: identical (pos, fp) selections come only from
    # CONSECUTIVE window starts (robust-winnowing contiguity: starts s1
    # < s2 picking the same rightmost-min position p satisfy s2 <= s1 +
    # w - 1, and every start between them covers p and can select
    # nothing smaller), so dropping rows whose selection equals the
    # previous start's (`lag` over the window sort that already exists
    # — no new exchange) dedups exactly. On the chunked path the slice
    # extension `_e` makes the first home start's lag the previous
    # chunk's last home selection, so cross-chunk runs dedup too.
    # Removes the corpus-wide distinct exchange + two hash aggregates
    # (guide par.2.4) — at scale, one full shuffle of the fingerprint
    # stream.
    return sel.select(
        "doc_id",
        (-F.col("_s.np")).cast("long").alias("pos"),
        F.col("_s.h").alias("fp"),
    )


__all__.append("winnowing_fingerprints")
