"""Batch 14: text-retrieval tier — inverted index + BM25 keyword
search over the documents corpus (operators/textindex.py).

Keyword retrieval backs corpus inspection and decontamination tooling
in an LLM data pipeline; the reference has no search surface, so this
is net-new engine capability (scope note in textindex.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_tables
from .catalog import QueryDef

# Shared oracle tokenizer CTE (matches textstats.tokens semantics).
_TOK_CTE = """
tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                            t -> t != '')) AS token
  FROM documents)
"""


# q106: inverted index --------------------------------------------------------


def q106_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-corpus inverted index: per-token document frequency,
    collection frequency, and a bounded postings sample.  The sample
    cap applies BEFORE list collection (row_number <= 5 inside the
    token partition), so hot tokens stay bounded-memory at any scale.
    """
    from ..operators.textindex import inverted_index

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    idx = inverted_index(docs, postings_sample=5)
    return idx.select(
        "token",
        "df",
        F.col("cf").cast("long").alias("cf"),
        "postings_sample",
    )


ORACLE_Q106 = f"""
WITH {_TOK_CTE},
tf AS (SELECT token, doc_id, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
rn AS (
  SELECT token, doc_id, tf,
         ROW_NUMBER() OVER (PARTITION BY token ORDER BY doc_id) AS rn
  FROM tf)
SELECT token,
       CAST(COUNT(*) AS BIGINT) AS df,
       CAST(SUM(tf) AS BIGINT) AS cf,
       array_to_string(
         list_transform(
           list_sort(list(doc_id) FILTER (rn <= 5)),
           x -> CAST(x AS VARCHAR)),
         ',') AS postings_sample
FROM rn
GROUP BY token
"""


# q107: BM25 top-k ------------------------------------------------------------

BM25_QUERY = ["spark", "join", "stream", "window"]
_K1 = 1.2
_B = 0.75
_K1P1 = _K1 + 1.0  # folded on the Spark side too (Python constant)


def q107_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 BM25 hits for a fixed bag-of-words query.  Candidate set
    = docs containing >= 1 query term (the token filter runs before
    the shuffle); per-term partials are summed in integer micro-units
    so the total is order-independent (textindex.py docstring).
    """
    from ..operators.textindex import bm25_topk

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    return bm25_topk(docs, BM25_QUERY, k=10, k1=_K1, b=_B)


_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_QUERY)

ORACLE_Q107 = f"""
WITH {_TOK_CTE},
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
hits AS (SELECT * FROM tok WHERE token IN ({_TERMS_SQL})),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM hits GROUP BY 1, 2),
df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM hits GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
ad AS (SELECT CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
       FROM dl),
scored AS (
  SELECT tf.doc_id,
         CAST(round(
           ln((n.n_docs - df.df + CAST(0.5 AS DOUBLE))
              / (df.df + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE))
           * ((tf.tf * CAST({_K1P1!r} AS DOUBLE))
              / (tf.tf + CAST({_K1!r} AS DOUBLE)
                 * (CAST(1.0 AS DOUBLE) - CAST({_B!r} AS DOUBLE)
                    + CAST({_B!r} AS DOUBLE) * dl.dl / ad.avgdl)))
           * CAST(1000000.0 AS DOUBLE)
         ) AS BIGINT) AS term_micro
  FROM tf
  JOIN df ON tf.token = df.token
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN n CROSS JOIN ad)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_terms,
       CAST(SUM(term_micro) AS BIGINT) AS score_micro
FROM scored
GROUP BY doc_id
ORDER BY score_micro DESC, doc_id
LIMIT 10
"""


def batch14_registry() -> list[QueryDef]:
    return [
        QueryDef("q106_inverted_index", q106_inverted_index, ORACLE_Q106, "inverted index: df/cf + capped postings sample"),
        QueryDef("q107_bm25_topk", q107_bm25_topk, ORACLE_Q107, "BM25 top-k with integer-micro exact scoring"),
    ]
