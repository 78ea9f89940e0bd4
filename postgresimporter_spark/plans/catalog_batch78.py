"""Batch 78: embedding near-dup over DUPLICATE-FAMILY corpora.

Round-10 maintenance-rule trigger (b), scale-failure repro: the
sign-band embedding near-dup join (``similarity.
signband_neardup_pairs``, q85) generated candidates per input ROW, so
k exact copies of a vector (the crawl re-post shape — exactly how the
bench's own sf1 tier builds its embeddings table, 10 copies per
vector) cost k^2 candidate rows per value pair, each dragging two
full 64-double arrays through the join and a dedup exchange that ran
BEFORE the cosine verify. Measured on sf0.1 embeddings with every
vector duplicated 10x: the id-level formulation did not finish in
600s; the value-level rewrite (distinct vectors band/join/verify,
verify before dropDuplicates, expand to id pairs last — the same
identity-rewrite pattern as r9's mih_match_index and SymSpell fixes)
runs the same corpus in ~7s with the identical pair set. q321 pins
the duplicated-input shape externally: a 5x-replicated 100-vector
slice (500 rows, 1000 within-family pairs at cosine 1.0 plus any
data-dependent cross-family band hits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_tables
from .catalog import QueryDef
from .catalog_batch8 import (
    NEARDUP_BANDS,
    NEARDUP_BITS,
    NEARDUP_THRESHOLD,
    _emb_bands_sql,
)

DUP_COPIES = 5
DUP_SLICE = 100


def q321_neardup_dupfamilies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-band near-dup pairs over a corpus of exact-duplicate
    families: vec_id < 100, each vector replicated 5x under shifted
    ids — (id_a, id_b, cosine), dominated by the C(5,2)-per-family
    self pairs the value-level rewrite must emit without quadratic
    candidate work."""
    from ..operators.similarity import signband_neardup_pairs

    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    base = emb.where(F.col("vec_id") < DUP_SLICE).select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    copies = [
        base.select(
            (F.col("vec_id") + F.lit(j * 1_000_000)).alias("vec_id"),
            "embedding",
        )
        for j in range(DUP_COPIES)
    ]
    corpus = copies[0]
    for c in copies[1:]:
        corpus = corpus.unionByName(c)
    return signband_neardup_pairs(
        corpus,
        threshold=NEARDUP_THRESHOLD,
        bands=NEARDUP_BANDS,
        bits_per_band=NEARDUP_BITS,
    )


ORACLE_Q321 = f"""
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id < {DUP_SLICE}),
duped AS (
  SELECT vec_id + j * 1000000 AS vec_id, v
  FROM base, (SELECT unnest(range({DUP_COPIES})) AS j)),
keyed AS (
  SELECT vec_id, v, unnest({_emb_bands_sql()}, recursive := true)
  FROM duped),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
         a.v AS va, b.v AS vb
  FROM keyed a
  JOIN keyed b ON a.band = b.band AND a.key = b.key
              AND a.vec_id < b.vec_id)
SELECT id_a, id_b,
  round(list_dot_product(va, vb) /
        (sqrt(list_dot_product(va, va)) * sqrt(list_dot_product(vb, vb))),
        6) AS cosine
FROM cand
WHERE round(list_dot_product(va, vb) /
            (sqrt(list_dot_product(va, va)) * sqrt(list_dot_product(vb, vb))),
            6) >= {NEARDUP_THRESHOLD}
"""


DOC_DUP_COPIES = 4
DOC_DUP_SLICE = 200


def q322_ppjoin_dupfamilies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPJoin prefix-filtered Jaccard over a corpus of exact-duplicate
    document families: doc_id < 200, each text replicated 4x under
    shifted ids — (id_a, id_b, jaccard), dominated by the
    C(4,2)-per-family 1.0 pairs. Round-10 trigger (b): the row-level
    prefix join measured 84s (vs 3.3s spread) on sf0.1 documents
    duplicated 10x; the value-level rewrite runs it in ~4s with the
    identical pair set (ngram_jaccard_pairs showed 25s -> 2.7s on the
    same shape and shares the fix; this query pins the worse repro)."""
    from ..operators.dedup import prefix_jaccard_pairs

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    base = docs.where(F.col("doc_id") < DOC_DUP_SLICE).select(
        "doc_id", "text"
    )
    copies = [
        base.select(
            (F.col("doc_id") + F.lit(j * 1_000_000)).alias("doc_id"),
            "text",
        )
        for j in range(DOC_DUP_COPIES)
    ]
    corpus = copies[0]
    for c in copies[1:]:
        corpus = corpus.unionByName(c)
    return prefix_jaccard_pairs(corpus, threshold_pct=80)


def _oracle_q322() -> str:
    from .catalog_northstar import _SHINGLES

    return f"""
WITH base AS (
  SELECT doc_id, text FROM documents WHERE doc_id < {DOC_DUP_SLICE}),
duped AS (
  SELECT doc_id + j * 1000000 AS doc_id, text
  FROM base, (SELECT unnest(range({DOC_DUP_COPIES})) AS j)),
sh AS (SELECT doc_id AS id, {_SHINGLES} AS sh FROM duped),
sized AS (SELECT id, sh, len(sh) AS n_sh FROM sh),
ex AS (SELECT id, n_sh, unnest(sh) AS shingle FROM sized),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b, a.n_sh AS n_a, b.n_sh AS n_b,
         COUNT(*) AS n_common
  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY 1, 2, 3, 4)
SELECT id_a, id_b,
       round(n_common / (n_a + n_b - n_common), 6) AS jaccard
FROM pairs WHERE round(n_common / (n_a + n_b - n_common), 6) >= 0.8
"""


def batch78_registry() -> list[QueryDef]:
    return [
        QueryDef(
            "q321_neardup_dupfamilies",
            q321_neardup_dupfamilies,
            ORACLE_Q321,
            "embedding near-dup over 5x exact-duplicate families",
        ),
        QueryDef(
            "q322_ppjoin_dupfamilies",
            q322_ppjoin_dupfamilies,
            _oracle_q322(),
            "PPJoin Jaccard over 4x exact-duplicate document families",
        ),
    ]
