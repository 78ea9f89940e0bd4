"""Batch 55: cross-validation machinery, learning curves, agreement
statistics, and the corpus datasheet.

- q268 k-fold metrics — deterministic 5-fold assignment (md5 mod k,
  the q257 discipline) with the per-fold mean of a target metric and
  the between-fold spread: the fold-stability audit run before
  trusting any CV number. Exact integer sums per fold; the variance
  of fold means uses the same DECIMAL second-moment layout as q232.
- q269 learning curve — corpus measurements on nested hash-threshold
  subsamples (10%..100%): token volume, vocabulary size, and
  type-token ratio per fraction. Nested by construction (same hash,
  growing threshold) so the curve is monotone and resampling-free —
  the "how much data buys how much vocabulary" readout.
- q270 Cohen's kappa — chance-corrected agreement between two
  deterministic document judges (a length gate and a token gate):
  the full 2×2 confusion plus kappa from exact integer marginals.
  The inter-annotator/agreement statistic for label pipelines.
- q271 corpus datasheet — the one-row corpus card: documents, token
  volume, vocabulary, exact-duplicate rate (sha2 groups), source
  entropy (picounit-exact), mean document length. One scan + one
  hash-group aggregation; the summary a dataset release publishes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.textstats import token_count, tokens
from ..sources.parquet import load_tables
from .catalog import QueryDef
from .catalog_batch46 import _TOK_SQL

# ---------------------------------------------------------------------------
# q268: k-fold assignment + fold-stability metrics
# ---------------------------------------------------------------------------

_KF_K = 5


def q268_kfold_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-fold split of documents (md5(doc_id) mod 5)
    with per-fold doc counts and mean n_chars, plus each fold's
    deviation from the global mean — the audit that catches a skewed
    fold before it poisons a CV estimate. Exact integer sums; the
    global mean attaches as one broadcast row."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("kf:"), F.col("doc_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % _KF_K
    )
    per = docs.select(fold.alias("fold"), F.col("n_chars")).groupBy(
        "fold"
    ).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )
    tot = per.agg(
        F.sum("n_docs").cast("long").alias("N"),
        F.sum("sum_chars").cast("long").alias("S"),
    )
    d = lambda c: c.cast("double")  # noqa: E731
    j = per.crossJoin(F.broadcast(tot))
    fold_mean = d(F.col("sum_chars")) / d(F.col("n_docs"))
    global_mean = d(F.col("S")) / d(F.col("N"))
    return j.select(
        "fold",
        "n_docs",
        (F.round(fold_mean, 4) + F.lit(0.0)).alias("mean_chars"),
        (F.round(fold_mean - global_mean, 4) + F.lit(0.0)).alias(
            "dev_from_global"
        ),
    ).orderBy("fold")


ORACLE_Q268 = f"""
WITH per AS (
  SELECT ('0x' || substr(md5('kf:' || CAST(doc_id AS VARCHAR)),
                         1, 15))::BIGINT % {_KF_K} AS fold,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS sum_chars
  FROM documents GROUP BY 1),
tot AS (
  SELECT CAST(SUM(n_docs) AS BIGINT) AS N,
         CAST(SUM(sum_chars) AS BIGINT) AS S
  FROM per)
SELECT fold, n_docs,
       round(CAST(sum_chars AS DOUBLE) / n_docs, 4) + 0.0 AS mean_chars,
       round(CAST(sum_chars AS DOUBLE) / n_docs
             - CAST(S AS DOUBLE) / N, 4) + 0.0 AS dev_from_global
FROM per, tot ORDER BY fold
"""


# ---------------------------------------------------------------------------
# q269: learning curve over nested subsamples
# ---------------------------------------------------------------------------

_LC_FRACTIONS = (10, 25, 50, 75, 100)


def q269_learning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested hash-threshold subsamples: doc d belongs to the f%
    sample iff md5(d) mod 100 < f — the same hash for every fraction,
    so samples nest and the curve needs NO resampling. Per fraction:
    docs, token volume, vocabulary size (count_distinct over the
    fraction-filtered token stream), type-token ratio. One token
    explode, the (fraction, token) aggregation carries all five
    fractions at once via a bounded in-row fraction array."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("lc:"), F.col("doc_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    tok = docs.select(
        bucket.alias("b"),
        F.explode(tokens(F.col("text"))).alias("token"),
    )
    fr = F.array(*[F.lit(f) for f in _LC_FRACTIONS])
    expanded = tok.select(
        "token",
        F.explode(F.filter(fr, lambda f: F.col("b") < f)).alias("fraction"),
    )
    per_tok = expanded.groupBy("fraction", "token").agg(
        F.count("*").cast("long").alias("tf")
    )
    per_fr = per_tok.groupBy("fraction").agg(
        F.count("*").cast("long").alias("vocab"),
        F.sum("tf").cast("long").alias("n_tokens"),
    )
    n_docs = (
        docs.select(bucket.alias("b"))
        .select(
            F.explode(F.filter(fr, lambda f: F.col("b") < f)).alias(
                "fraction"
            )
        )
        .groupBy("fraction")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
    d = lambda c: c.cast("double")  # noqa: E731
    return (
        per_fr.join(n_docs, on="fraction")
        .select(
            F.col("fraction").cast("long").alias("fraction_pct"),
            "n_docs",
            "n_tokens",
            "vocab",
            (
                F.round(d(F.col("vocab")) / d(F.col("n_tokens")), 6)
                + F.lit(0.0)
            ).alias("type_token_ratio"),
        )
        .orderBy("fraction_pct")
    )


ORACLE_Q269 = f"""
WITH base AS (
  SELECT doc_id, text,
         ('0x' || substr(md5('lc:' || CAST(doc_id AS VARCHAR)),
                         1, 15))::BIGINT % 100 AS b
  FROM documents),
fr(fraction) AS (VALUES {", ".join(f"({f})" for f in _LC_FRACTIONS)}),
tok AS (
  SELECT b, {_TOK_SQL} AS token FROM base),
expanded AS (
  SELECT fraction, token FROM tok, fr WHERE b < fraction),
per_fr AS (
  SELECT fraction, CAST(COUNT(DISTINCT token) AS BIGINT) AS vocab,
         CAST(COUNT(*) AS BIGINT) AS n_tokens
  FROM expanded GROUP BY fraction),
nd AS (
  SELECT fraction, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM base, fr WHERE b < fraction GROUP BY fraction)
SELECT CAST(fraction AS BIGINT) AS fraction_pct, n_docs, n_tokens, vocab,
       round(CAST(vocab AS DOUBLE) / n_tokens, 6) + 0.0 AS type_token_ratio
FROM per_fr JOIN nd USING (fraction)
ORDER BY fraction_pct
"""


# ---------------------------------------------------------------------------
# q270: Cohen's kappa between two deterministic judges
# ---------------------------------------------------------------------------

_KAPPA_CHARS = 200
_KAPPA_TOKENS = 20


def q270_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chance-corrected agreement between judge A (n_chars >= 200)
    and judge B (tokens >= 20) over the documents: the 2×2 confusion
    cells are exact longs, p_o and p_e exact integer ratios, kappa
    the one rounded double. The agreement statistic for any pair of
    labelers, heuristics, or model versions."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    a = (F.length("text") >= _KAPPA_CHARS).cast("long")
    b = (token_count(F.col("text")) >= _KAPPA_TOKENS).cast("long")
    g = docs.select(a.alias("a"), b.alias("b")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("a") * F.col("b")).cast("long").alias("n_both"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("long").alias("a_only"),
        F.sum((1 - F.col("a")) * F.col("b")).cast("long").alias("b_only"),
        F.sum((1 - F.col("a")) * (1 - F.col("b")))
        .cast("long")
        .alias("neither"),
    )
    d = lambda c: c.cast("double")  # noqa: E731
    po = (d(F.col("n_both")) + d(F.col("neither"))) / d(F.col("n"))
    pa = (d(F.col("n_both")) + d(F.col("a_only"))) / d(F.col("n"))
    pb = (d(F.col("n_both")) + d(F.col("b_only"))) / d(F.col("n"))
    pe = pa * pb + (1.0 - pa) * (1.0 - pb)
    return g.select(
        "n",
        "n_both",
        "a_only",
        "b_only",
        "neither",
        (F.round(po, 6) + F.lit(0.0)).alias("observed_agreement"),
        (F.round((po - pe) / (1.0 - pe), 6) + F.lit(0.0)).alias("kappa"),
    )


ORACLE_Q270 = f"""
WITH j AS (
  SELECT CASE WHEN length(text) >= {_KAPPA_CHARS} THEN 1 ELSE 0 END AS a,
         CASE WHEN len(list_filter(string_split_regex(trim(text), '\\s+'),
                      x -> x != '')) >= {_KAPPA_TOKENS} THEN 1 ELSE 0 END AS b
  FROM documents),
g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(a * b) AS BIGINT) AS n_both,
         CAST(SUM(a * (1 - b)) AS BIGINT) AS a_only,
         CAST(SUM((1 - a) * b) AS BIGINT) AS b_only,
         CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS neither
  FROM j)
SELECT n, n_both, a_only, b_only, neither,
       round((CAST(n_both AS DOUBLE) + neither) / n, 6) + 0.0
         AS observed_agreement,
       round(((CAST(n_both AS DOUBLE) + neither) / n
              - ((CAST(n_both AS DOUBLE) + a_only) / n
                 * (CAST(n_both AS DOUBLE) + b_only) / n
                 + (1.0 - (CAST(n_both AS DOUBLE) + a_only) / n)
                   * (1.0 - (CAST(n_both AS DOUBLE) + b_only) / n)))
             / (1.0 - ((CAST(n_both AS DOUBLE) + a_only) / n
                       * (CAST(n_both AS DOUBLE) + b_only) / n
                       + (1.0 - (CAST(n_both AS DOUBLE) + a_only) / n)
                         * (1.0 - (CAST(n_both AS DOUBLE) + b_only) / n))),
             6) + 0.0 AS kappa
FROM g
"""


# ---------------------------------------------------------------------------
# q271: corpus datasheet
# ---------------------------------------------------------------------------


def q271_corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row corpus card: documents, token volume, vocabulary,
    exact-duplicate rate via sha2(text) group sizes, source-mix
    entropy (picounit-exact, q235's discipline), mean length. One
    scan feeds three bounded aggregations; every number is an exact
    integer until its final ratio."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    base = docs.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(token_count(F.col("text"))).cast("long").alias("n_tokens"),
        F.sum(F.length("text")).cast("long").alias("n_chars"),
    )
    vocab = (
        docs.select(F.explode(tokens(F.col("text"))).alias("t"))
        .agg(F.count_distinct("t").cast("long").alias("vocab"))
    )
    dups = (
        docs.groupBy(F.sha2(F.col("text"), 256).alias("_h"))
        .agg(F.count("*").cast("long").alias("c"))
        .agg(
            F.sum(F.col("c") - 1).cast("long").alias("dup_docs"),
        )
    )
    src = docs.groupBy("source").agg(F.count("*").cast("long").alias("c"))
    src_tot = src.agg(F.sum("c").cast("long").alias("N"))
    d = lambda c: c.cast("double")  # noqa: E731
    ent_pico = F.round(
        -(d(F.col("c")) / d(F.col("N"))) * F.log(d(F.col("c")) / d(F.col("N")))
        * 1e12,
        0,
    ).cast("long")
    src_ent = (
        src.crossJoin(F.broadcast(src_tot))
        .agg(F.sum(ent_pico).cast("long").alias("src_ent_pico"))
    )
    g = (
        base.crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(dups))
        .crossJoin(F.broadcast(src_ent))
    )
    return g.select(
        "n_docs",
        "n_tokens",
        "vocab",
        (
            F.round(d(F.col("dup_docs")) / d(F.col("n_docs")), 6) + F.lit(0.0)
        ).alias("exact_dup_rate"),
        (
            F.round(F.col("src_ent_pico").cast("double") / 1e12, 6)
            + F.lit(0.0)
        ).alias("source_entropy_nats"),
        (
            F.round(d(F.col("n_chars")) / d(F.col("n_docs")), 4) + F.lit(0.0)
        ).alias("mean_chars"),
        (
            F.round(d(F.col("n_tokens")) / d(F.col("n_docs")), 4)
            + F.lit(0.0)
        ).alias("mean_tokens"),
    )


ORACLE_Q271 = f"""
WITH base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(list_filter(string_split_regex(trim(text), '\\s+'),
                      x -> x != ''))) AS BIGINT) AS n_tokens,
         CAST(SUM(length(text)) AS BIGINT) AS n_chars
  FROM documents),
vocab AS (
  SELECT CAST(COUNT(DISTINCT token) AS BIGINT) AS vocab
  FROM (SELECT {_TOK_SQL} AS token FROM documents)),
dups AS (
  SELECT CAST(SUM(c - 1) AS BIGINT) AS dup_docs
  FROM (SELECT sha256(text) AS h, CAST(COUNT(*) AS BIGINT) AS c
        FROM documents GROUP BY 1)),
src AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY 1),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS N FROM src),
ent AS (
  SELECT CAST(SUM(CAST(round(-(CAST(c AS DOUBLE) / N)
           * ln(CAST(c AS DOUBLE) / N) * 1e12, 0) AS BIGINT)) AS BIGINT)
           AS src_ent_pico
  FROM src, tot)
SELECT n_docs, n_tokens, vocab,
       round(CAST(dup_docs AS DOUBLE) / n_docs, 6) + 0.0 AS exact_dup_rate,
       round(CAST(src_ent_pico AS DOUBLE) / 1e12, 6) + 0.0
         AS source_entropy_nats,
       round(CAST(n_chars AS DOUBLE) / n_docs, 4) + 0.0 AS mean_chars,
       round(CAST(n_tokens AS DOUBLE) / n_docs, 4) + 0.0 AS mean_tokens
FROM base, vocab, dups, ent
"""


def batch55_registry() -> list[QueryDef]:
    return [
        QueryDef("q268_kfold_metrics", q268_kfold_metrics, ORACLE_Q268,
                 "deterministic k-fold split + fold-stability audit"),
        QueryDef("q269_learning_curve", q269_learning_curve, ORACLE_Q269,
                 "vocabulary/token curve over nested hash subsamples"),
        QueryDef("q270_cohens_kappa", q270_cohens_kappa, ORACLE_Q270,
                 "chance-corrected agreement between two judges"),
        QueryDef("q271_corpus_datasheet", q271_corpus_datasheet,
                 ORACLE_Q271,
                 "one-row corpus card (volume, vocab, dups, mix)"),
    ]
