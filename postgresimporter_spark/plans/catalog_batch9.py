"""Ninth catalog batch: training-batch construction — sequence packing
and sliding-window chunking (operators/curation.py). Both are pure
window/array compositions, fully SQL-expressible, so the oracles cover
the complete semantics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import curation as C
from ..sources.parquet import load_tables
from .catalog import QueryDef

# q92: sequence packing ------------------------------------------------------

PACK_BUDGET = 512


def q92_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous LM-pretraining packing: per-source token streams cut
    into 512-token sequences; each doc tagged with the sequence and
    offset where it starts."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    return C.pack_sequences(docs, budget_tokens=PACK_BUDGET)


ORACLE_Q92 = f"""
WITH t AS (
  SELECT doc_id, source,
         len(string_split_regex(trim(text), '\\s+')) AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM t)
SELECT doc_id, source, n_tokens,
       CAST(floor((cum - n_tokens) / {PACK_BUDGET}) AS BIGINT) AS seq_idx,
       CAST((cum - n_tokens) % {PACK_BUDGET} AS BIGINT) AS seq_offset
FROM c
"""


# q93: sliding-window chunking -----------------------------------------------

CHUNK_TOKENS = 40
CHUNK_STRIDE = 20


def q93_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 40-token chunks every 20 tokens (RAG/embedding
    prep); zero-shuffle explode."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    return C.chunk_documents(
        docs, chunk_tokens=CHUNK_TOKENS, stride=CHUNK_STRIDE
    )


ORACLE_Q93 = f"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents),
s AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, greatest(len(toks) - 1, 0),
                                {CHUNK_STRIDE})) AS start,
         generate_subscripts(generate_series(0, greatest(len(toks) - 1, 0),
                                             {CHUNK_STRIDE}), 1) - 1
           AS chunk_idx
  FROM t)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       array_to_string(list_slice(toks, start + 1,
                                  start + {CHUNK_TOKENS}), ' ')
         AS chunk_text,
       CAST(len(list_slice(toks, start + 1, start + {CHUNK_TOKENS}))
            AS BIGINT) AS n_chunk_tokens
FROM s
"""


def batch9_registry() -> list[QueryDef]:
    return [
        QueryDef("q92_pack_sequences", q92_pack_sequences, ORACLE_Q92, "contiguous LM sequence packing per source shard"),
        QueryDef("q93_chunk_documents", q93_chunk_documents, ORACLE_Q93, "sliding-window token chunking (RAG prep)"),
    ]
