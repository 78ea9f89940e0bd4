"""Batch 74: cross-source quantile normalization.

q317 is the calibration step before a GLOBAL quality threshold is
applied to scores from heterogeneous sources (``curation.
quantile_normalize``): each document's within-source rank maps to the
pooled distribution's value at the proportional global rank — all
integer arithmetic with id tie-breaks, so both engines reproduce the
mapping exactly; single-row sources map to the pooled median. The
Spark plan keeps every window partitioned (the pooled ranking rides
``ranking.global_row_number``'s per-partition offsets); the oracle
uses DuckDB's plain unpartitioned window, which is fine at oracle
scale — different plan shapes, identical mapping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.parquet import load_tables
from .catalog import QueryDef


def q317_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length scores quantile-normalized across document sources:
    (doc_id, source, score, norm_score)."""
    from ..operators.curation import quantile_normalize

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    return quantile_normalize(docs, "source", "n_chars", "doc_id")


ORACLE_Q317 = """
WITH d AS (
  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS score FROM documents),
s AS (
  SELECT doc_id, source, score,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY score, doc_id) AS s_rank,
         COUNT(*) OVER (PARTITION BY source) AS n_s
  FROM d),
g AS (
  SELECT score AS norm_score,
         ROW_NUMBER() OVER (ORDER BY score, doc_id) AS g_rank
  FROM d),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM d)
SELECT s.doc_id, s.source, s.score, g.norm_score
FROM s CROSS JOIN n
JOIN g ON g.g_rank = CASE WHEN s.n_s = 1 THEN 1 + (n.n_total - 1) // 2
                          ELSE 1 + ((s.s_rank - 1) * (n.n_total - 1))
                               // (s.n_s - 1) END
"""


def batch74_registry() -> list[QueryDef]:
    return [
        QueryDef(
            "q317_quantile_normalize",
            q317_quantile_normalize,
            ORACLE_Q317,
            "cross-source rank-to-pooled-quantile score calibration",
        ),
    ]
