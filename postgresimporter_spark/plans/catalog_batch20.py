"""Batch 20: evaluation & mixing tier — LSH dedup recall/precision
audit, bigram-LM perplexity filtering, temperature-scaled mixture
weights, and random-projection dimensionality reduction.

Net-new engine surface (the reference has no analytics). The theme is
*measuring* the approximate operators against their exact counterparts
— the same honesty rule q97 applies to ANN (recall@k vs brute force),
extended to the dedup stack — plus two pre-training staples: perplexity
triage and source-mixture temperature scaling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import mining as M
from ..operators.similarity import _dot
from ..sources.parquet import load_tables
from .catalog import QueryDef
from .catalog_northstar import (
    BANDS,
    DUPED_DOCS_SQL,
    NUM_HASHES,
    _bands_sql,
    _duped_docs,
    _minhash_sig_sql,
    _SHINGLES,
)

# q125: MinHash-LSH recall/precision audit -----------------------------------

LSH_EVAL_THRESHOLD = 0.5


def q125_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row audit of the MinHash-LSH dedup path against exact n-gram
    Jaccard at the same threshold: how many true near-dup pairs the
    banded candidate generation catches (recall) and how many of its
    verified pairs are true (precision). The honest way to ship LSH —
    mirrors q97's ANN recall@k. Both sides are bounded pair sets; the
    final join/agg is metadata-scale."""
    docs = _duped_docs(spark, sf_dir)
    exact = D.ngram_jaccard_pairs(docs, threshold=LSH_EVAL_THRESHOLD).select(
        "id_a", "id_b"
    )
    est = D.minhash_lsh_pairs(
        docs, num_hashes=NUM_HASHES, bands=BANDS, threshold=LSH_EVAL_THRESHOLD
    ).select("id_a", "id_b")
    both = exact.join(est, on=["id_a", "id_b"], how="inner")
    n_true = exact.agg(F.count("*").cast("long").alias("n_true"))
    n_est = est.agg(F.count("*").cast("long").alias("n_est"))
    n_both = both.agg(F.count("*").cast("long").alias("n_caught"))
    return (
        n_true.crossJoin(F.broadcast(n_est))
        .crossJoin(F.broadcast(n_both))
        .select(
            "n_true",
            "n_est",
            "n_caught",
            F.round(F.col("n_caught") / F.col("n_true"), 6).alias("recall"),
            F.round(F.col("n_caught") / F.col("n_est"), 6).alias("precision"),
        )
    )


ORACLE_Q125 = f"""
WITH duped AS ({DUPED_DOCS_SQL}),
shx AS (SELECT doc_id AS id, {_SHINGLES} AS sh FROM duped),
sizedx AS (SELECT id, sh, len(sh) AS n_sh FROM shx),
exx AS (SELECT id, n_sh, unnest(sh) AS shingle FROM sizedx),
pairsx AS (
  SELECT a.id AS id_a, b.id AS id_b, a.n_sh AS n_a, b.n_sh AS n_b,
         COUNT(*) AS n_common
  FROM exx a JOIN exx b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY 1, 2, 3, 4),
exact AS (
  SELECT id_a, id_b FROM pairsx
  WHERE round(n_common / (n_a + n_b - n_common), 6)
        >= {LSH_EVAL_THRESHOLD}),
based AS (SELECT id, list_transform(sh,
    s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % {D.MINHASH_P}) AS bases
  FROM shx),
sigs AS (SELECT id, {_minhash_sig_sql()} AS signature FROM based),
bandrows AS (
  SELECT id, signature, unnest({_bands_sql()}, recursive := true)
  FROM sigs),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         a.signature AS sig_a, b.signature AS sig_b
  FROM bandrows a
  JOIN bandrows b ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
est AS (
  SELECT id_a, id_b FROM cand
  WHERE round(len(list_filter(generate_series(1, {NUM_HASHES}),
                              i -> sig_a[i] = sig_b[i])) / {NUM_HASHES}.0, 6)
        >= {LSH_EVAL_THRESHOLD}),
m AS (
  SELECT (SELECT COUNT(*) FROM exact) AS n_true,
         (SELECT COUNT(*) FROM est) AS n_est,
         (SELECT COUNT(*) FROM exact JOIN est USING (id_a, id_b))
           AS n_caught)
SELECT CAST(n_true AS BIGINT) AS n_true, CAST(n_est AS BIGINT) AS n_est,
       CAST(n_caught AS BIGINT) AS n_caught,
       round(n_caught / CAST(n_true AS DOUBLE), 6) AS recall,
       round(n_caught / CAST(n_est AS DOUBLE), 6) AS precision
FROM m
"""


# q126: bigram-LM perplexity ---------------------------------------------------

PPL_K = 1
_FTOKS = (
    "list_filter(string_split_regex(trim(text), '\\s+'), t -> t != '')"
)


def q126_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document perplexity under the corpus's own add-1-smoothed
    bigram LM — exact-count CCNet-style perplexity triage."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    return M.bigram_perplexity(docs, k=PPL_K)


ORACLE_Q126 = f"""
WITH tok AS (
  SELECT doc_id, unnest({_FTOKS}) AS t,
         generate_subscripts({_FTOKS}, 1) - 1 AS pos
  FROM documents),
uni AS (SELECT t, COUNT(*) AS c_uni FROM tok GROUP BY t),
v AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nv FROM uni),
inst AS (
  SELECT a.doc_id, a.t AS w1, b.t AS w2
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
bi AS (SELECT w1, w2, COUNT(*) AS c_bi FROM inst GROUP BY w1, w2),
scored AS (
  SELECT inst.doc_id,
         -round(ln((c_bi + {PPL_K}) / (c_uni + {PPL_K} * nv)), 9) AS nll
  FROM inst
  JOIN bi USING (w1, w2)
  JOIN uni ON uni.t = inst.w1, v),
agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         round(SUM(nll) / COUNT(*), 6) AS avg_nll
  FROM scored GROUP BY doc_id)
SELECT doc_id, n_bigrams, avg_nll, round(exp(avg_nll), 4) AS ppl
FROM agg
"""


# q127: temperature-scaled mixture weights ------------------------------------

MIX_ALPHA = 0.3


def q127_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source temperature-scaled sampling weights (multilingual-
    pre-training staple): ``share_i = c_i^α / Σ c_j^α`` with α=0.3
    flattens the source distribution; ``epochs_i = share_i · N / c_i``
    is the per-document repetition factor that realizes it. One tiny
    per-source aggregation + a broadcast 1-row total."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    cnt = docs.groupBy("source").agg(F.count("*").cast("long").alias("n_docs"))
    w = F.round(F.pow(F.col("n_docs").cast("double"), F.lit(MIX_ALPHA)), 9)
    weighted = cnt.withColumn("_w", w)
    tot = weighted.agg(
        F.sum("_w").alias("_wsum"), F.sum("n_docs").cast("double").alias("_n")
    )
    return (
        weighted.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            F.round(F.col("_w") / F.col("_wsum"), 6).alias("share"),
            F.round(
                F.col("_w") / F.col("_wsum") * F.col("_n") / F.col("n_docs"),
                6,
            ).alias("epochs"),
        )
    )


ORACLE_Q127 = f"""
WITH cnt AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY source),
w AS (SELECT source, n_docs,
             round(pow(CAST(n_docs AS DOUBLE), {MIX_ALPHA}), 9) AS wv
      FROM cnt),
tot AS (SELECT SUM(wv) AS wsum, CAST(SUM(n_docs) AS DOUBLE) AS n FROM w)
SELECT source, n_docs,
       round(wv / wsum, 6) AS share,
       round(wv / wsum * n / n_docs, 6) AS epochs
FROM w, tot
"""


# q128: random-projection dimensionality reduction ----------------------------

PROJ_DIMS = 4
EMB_DIM = 64
# deterministic integer-formula "random" planes (no RNG: both engines
# build the identical literals; values in [-0.9, 0.9])
PROJ_PLANES = [
    [(((37 * i + 101 * j) % 19) - 9) / 10.0 for j in range(EMB_DIM)]
    for i in range(PROJ_DIMS)
]


def q128_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss-style projection of the 64-dim embeddings
    onto 4 fixed hyperplanes — the standard cheap pre-ANN reduction.
    Pure per-row dot products against literal planes: scan-shaped,
    zero shuffle, whole-stage codegen."""
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    cols = [
        F.round(
            _dot(
                F.col("embedding"),
                F.array(*[F.lit(x) for x in PROJ_PLANES[i]]),
            ),
            6,
        ).alias(f"p{i}")
        for i in range(PROJ_DIMS)
    ]
    return emb.select("vec_id", *cols)


def _proj_sql(i: int) -> str:
    lit = "[" + ", ".join(str(x) for x in PROJ_PLANES[i]) + "]"
    return (
        f"round(list_dot_product(embedding::DOUBLE[], {lit}::DOUBLE[]), 6)"
        f" AS p{i}"
    )


ORACLE_Q128 = f"""
SELECT vec_id, {', '.join(_proj_sql(i) for i in range(PROJ_DIMS))}
FROM embeddings
"""


def batch20_registry() -> list[QueryDef]:
    return [
        QueryDef("q125_lsh_recall", q125_lsh_recall, ORACLE_Q125, "MinHash-LSH recall/precision vs exact Jaccard"),
        QueryDef("q126_bigram_perplexity", q126_bigram_perplexity, ORACLE_Q126, "add-1 bigram LM perplexity triage"),
        QueryDef("q127_temperature_mix", q127_temperature_mix, ORACLE_Q127, "temperature-scaled source mixture weights"),
        QueryDef("q128_random_projection", q128_random_projection, ORACLE_Q128, "JL random projection of embeddings"),
    ]
