"""Batch 70: incremental exact-Hamming dedup against a stored index.

q313 is the Hamming-space counterpart of q129's incremental MinHash:
corpus history is fingerprinted ONCE into a persistable MIH block
index (``dedup.mih_block_index`` — (id, fp, block, val) rows, the
artifact a continuous-ingest pipeline stores bucketed by (block,
val)); each new batch enumerates its per-block XOR probe neighborhood
and equi-joins the index (``dedup.mih_match_index``), with the batch
side broadcast — history never re-fingerprints and never shuffles.
The q129 ingest-batch recipe is reused verbatim (marker-suffixed
near-dups + token-reversed exact dups; SimHash is token-multiset
based, so a reversed document matches at Hamming 0). The oracle
brute-forces batch x history in SQL from independently recomputed
SimHashes — any probe-enumeration recall loss shows up as missing
rows."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import dedup as D
from ..sources.parquet import load_tables
from .catalog import QueryDef
from .catalog_batch8 import HAMMING_BITS, _simhash_cte
from .catalog_batch21 import _new_batch
from .catalog_northstar import _TOKS, _duped_docs

IH_BLOCKS = 2
IH_MAX_HAMMING = 3


def q313_incremental_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Match the q129 ingest batch against the duped-docs history via
    the stored MIH block index: (new_id, hist_id, hamming) within 3."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    hist = D.simhash(_duped_docs(spark, sf_dir), bits=HAMMING_BITS)
    index = D.mih_block_index(hist, bits=HAMMING_BITS, blocks=IH_BLOCKS)
    batch = D.simhash(_new_batch(docs), bits=HAMMING_BITS)
    return D.mih_match_index(
        index,
        batch,
        bits=HAMMING_BITS,
        blocks=IH_BLOCKS,
        max_hamming=IH_MAX_HAMMING,
    )


def _ih_oracle() -> str:
    votes = ", ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(HAMMING_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN CAST({2**i} AS BIGINT) ELSE 0 END)"
        for i in range(HAMMING_BITS)
    )
    return f"""
WITH {_simhash_cte()},
batchdocs AS (
  SELECT doc_id + 20000 AS id, text || ' ingestmarker' AS text
  FROM documents WHERE doc_id < 25
  UNION ALL
  SELECT doc_id + 20000 AS id,
         array_to_string(
           list_reverse(string_split_regex(trim(text), '\\s+')), ' ') AS text
  FROM documents WHERE doc_id >= 25 AND doc_id < 50),
btoks AS (SELECT id, unnest({_TOKS}) AS tok FROM batchdocs),
bh AS (SELECT id, ('0x' || substr(md5('0:' || tok), 1, 15))::BIGINT AS h
       FROM btoks),
bv AS (SELECT id, {votes} FROM bh GROUP BY id),
bsh AS (SELECT id, CAST({fp} AS BIGINT) AS simhash FROM bv)
SELECT b.id AS new_id, h.id AS hist_id,
       CAST(bit_count(xor(b.simhash, h.simhash)) AS BIGINT) AS hamming
FROM bsh b JOIN sh h
  ON bit_count(xor(b.simhash, h.simhash)) <= {IH_MAX_HAMMING}
"""


def batch70_registry() -> list[QueryDef]:
    return [
        QueryDef(
            "q313_incremental_hamming",
            q313_incremental_hamming,
            _ih_oracle(),
            "stored MIH block index probed by an ingest batch vs brute SQL",
        ),
    ]
