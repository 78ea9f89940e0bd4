"""Batch 19: corpus-mining tier — containment dedup, unigram-LM quality
scoring, PMI phrase mining, contrastive hard negatives, content-defined
chunking (operators/mining.py).

Net-new engine surface (the reference —
``/root/reference/postgresimporter/main.py`` — has no analytics): the
second-pass curation toolkit for a 100 TB training corpus, after the
first dedup/quality tier (q24-q32, q87-q96).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import mining as M
from ..sources.parquet import load_tables
from .catalog import QueryDef

# DuckDB macros mirroring the Spark-side tokenizers exactly:
# - shingles(): split on whitespace, NO empty filter (dedup.shingles)
# - tokens(): split on whitespace WITH empty filter (textstats.tokens)
_RAW_TOKS = "string_split_regex(trim(text), '\\s+')"
_FTOKS = f"list_filter({_RAW_TOKS}, t -> t != '')"


def _shingles_sql(n: int) -> str:
    return (
        "list_distinct(list_transform("
        f"generate_series(0, greatest(len({_RAW_TOKS}) - {n}, 0)), "
        f"i -> array_to_string(list_slice({_RAW_TOKS}, i + 1, i + {n}), ' ')))"
    )


# q120: containment near-dup pairs -------------------------------------------

CONT_N = 3
CONT_THRESHOLD = 0.8
CONT_MAX_DOC_RATIO = 0.5


def q120_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric subset-duplicate pairs: containment
    |A∩B| / min(|A|,|B|) >= 0.8 over 3-gram shingles, hot-shingle cap
    engaged (same skew posture as q81). Catches the quoted-subset dups
    Jaccard's union denominator dilutes."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    return M.containment_pairs(
        docs,
        threshold=CONT_THRESHOLD,
        n=CONT_N,
        max_doc_ratio=CONT_MAX_DOC_RATIO,
    ).orderBy("id_a", "id_b")


ORACLE_Q120 = f"""
WITH sh AS (SELECT doc_id AS id, {_shingles_sql(CONT_N)} AS sh FROM documents),
ex AS (SELECT id, unnest(sh) AS shingle FROM sh),
rare AS (
  SELECT shingle FROM ex GROUP BY shingle
  HAVING COUNT(DISTINCT id)
         <= {CONT_MAX_DOC_RATIO} * (SELECT CAST(COUNT(*) AS DOUBLE)
                                    FROM documents)),
fx AS (SELECT ex.id, ex.shingle FROM ex JOIN rare USING (shingle)),
sized AS (SELECT id, COUNT(*) AS n_sh FROM fx GROUP BY id),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_common
  FROM fx a JOIN fx b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY 1, 2),
c AS (
  SELECT id_a, id_b,
         round(n_common / least(sa.n_sh, sb.n_sh), 6) AS containment
  FROM pairs
  JOIN sized sa ON sa.id = pairs.id_a
  JOIN sized sb ON sb.id = pairs.id_b)
SELECT id_a, id_b, containment FROM c
WHERE containment >= {CONT_THRESHOLD}
ORDER BY id_a, id_b
"""


# q121: unigram-LM quality score ---------------------------------------------


def q121_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality score: mean ln P(token) under the corpus's
    own unigram distribution. Per-token logs round at 9 digits before
    the sum so both engines agree at the reported 6."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    return M.unigram_logprob(docs)


ORACLE_Q121 = f"""
WITH tok AS (SELECT doc_id, unnest({_FTOKS}) AS t FROM documents),
cnt AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM cnt)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       round(SUM(round(ln(CAST(c AS DOUBLE) / n), 9)) / COUNT(*), 6)
         AS avg_logprob
FROM tok JOIN cnt USING (t), tot
GROUP BY doc_id
"""


# q122: PMI bigram mining ----------------------------------------------------

PMI_MIN_COUNT = 5
PMI_TOPK = 25


def q122_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 adjacent-token pairs by pointwise mutual information
    (min pair count 5) — the classic collocation/phrase detector.
    Counts exact; one ln per surviving bigram; total-order tiebreak."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    return (
        M.pmi_bigrams(docs, min_count=PMI_MIN_COUNT)
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(PMI_TOPK)
    )


ORACLE_Q122 = f"""
WITH tok AS (
  SELECT doc_id, unnest({_FTOKS}) AS t,
         generate_subscripts({_FTOKS}, 1) - 1 AS pos
  FROM documents),
uni AS (SELECT t, COUNT(*) AS c_tok FROM tok GROUP BY t),
n_uni AS (SELECT CAST(SUM(c_tok) AS DOUBLE) AS nu FROM uni),
bi AS (
  SELECT a.t AS w1, b.t AS w2, COUNT(*) AS c_bi
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  GROUP BY 1, 2
  HAVING COUNT(*) >= {PMI_MIN_COUNT}),
n_bi AS (SELECT CAST(SUM(c_bi) AS DOUBLE) AS nb FROM bi)
SELECT w1, w2, CAST(c_bi AS BIGINT) AS pair_count,
       round(ln((c_bi / nb) / ((u1.c_tok / nu) * (u2.c_tok / nu))), 6)
         AS pmi
FROM bi
JOIN uni u1 ON u1.t = bi.w1
JOIN uni u2 ON u2.t = bi.w2, n_bi, n_uni
ORDER BY pmi DESC, w1, w2
LIMIT {PMI_TOPK}
"""


# q123: contrastive hard negatives -------------------------------------------

HN_PROBES = 10
HN_K = 5


def q123_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per probe vector (vec_id < 10), the 5 most-cosine-similar corpus
    vectors with a DIFFERENT label — contrastive-training negatives.
    Probes broadcast; the corpus never shuffles."""
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    probes = emb.where(F.col("vec_id") < HN_PROBES).select(
        F.col("vec_id").alias("probe_id"), "embedding", "label"
    )
    return M.hard_negatives(emb, probes, k=HN_K)


_COS = (
    "list_dot_product(e.embedding::DOUBLE[], p.pvec::DOUBLE[]) / "
    "(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * "
    "sqrt(list_dot_product(p.pvec::DOUBLE[], p.pvec::DOUBLE[])))"
)

ORACLE_Q123 = f"""
WITH p AS (SELECT vec_id AS probe_id, embedding AS pvec, label AS plabel
           FROM embeddings WHERE vec_id < {HN_PROBES}),
scored AS (
  SELECT p.probe_id, e.vec_id, round({_COS}, 6) AS score
  FROM embeddings e CROSS JOIN p
  WHERE e.label != p.plabel),
ranked AS (
  SELECT probe_id, vec_id, score,
         CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
                                 ORDER BY score DESC, vec_id) AS BIGINT)
           AS rank
  FROM scored)
SELECT probe_id, vec_id, score, rank FROM ranked WHERE rank <= {HN_K}
"""


# q124: content-defined chunking ---------------------------------------------

# mask 2 bits -> expected chunk length 4 tokens: the test corpus has a
# ~31-token vocabulary, and at 4 bits no token happened to hit the mask
# (boundaries never fired, 1 chunk/doc) — 2 bits makes the operator's
# chunking genuinely exercised here; real corpora use 6-10 bits.
CDC_MASK_BITS = 2


def q124_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunks (expected length 2^2 tokens here; see
    CDC_MASK_BITS): boundaries where the md5-derived token hash hits
    the mask, chunk hash = md5 of the space-joined chunk — the
    sub-document dedup unit. Per-document windows only."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    return M.cdc_chunks(docs, mask_bits=CDC_MASK_BITS)


ORACLE_Q124 = f"""
WITH tok AS (
  SELECT doc_id, unnest({_FTOKS}) AS t,
         generate_subscripts({_FTOKS}, 1) - 1 AS pos
  FROM documents),
b AS (
  SELECT doc_id, t, pos,
         CASE WHEN (('0x' || substr(md5('7:' || t), 1, 15))::BIGINT
                    & {(1 << CDC_MASK_BITS) - 1}) = 0
              THEN 1 ELSE 0 END AS is_b
  FROM tok),
c AS (
  SELECT doc_id, t, pos,
         COALESCE(SUM(is_b) OVER (PARTITION BY doc_id ORDER BY pos
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING), 0) AS chunk_id
  FROM b)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       md5(string_agg(t, ' ' ORDER BY pos)) AS chunk_hash
FROM c GROUP BY doc_id, chunk_id
"""


def batch19_registry() -> list[QueryDef]:
    return [
        QueryDef("q120_containment_pairs", q120_containment_pairs, ORACLE_Q120, "shingle-containment subset-dup pairs (capped)"),
        QueryDef("q121_unigram_logprob", q121_unigram_logprob, ORACLE_Q121, "CCNet-style unigram LM quality score"),
        QueryDef("q122_pmi_bigrams", q122_pmi_bigrams, ORACLE_Q122, "PMI collocation mining, top-25"),
        QueryDef("q123_hard_negatives", q123_hard_negatives, ORACLE_Q123, "contrastive hard-negative mining (top-5 per probe)"),
        QueryDef("q124_cdc_chunks", q124_cdc_chunks, ORACLE_Q124, "content-defined chunking with chunk hashes"),
    ]
