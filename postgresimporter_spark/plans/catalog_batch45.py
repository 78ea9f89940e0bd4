"""Batch 45: candidate-tracking SimHash audit (the bench companion to
q86 asked for by VERDICT r05 #6).

- q231 strict SimHash audit — Hamming <= 1 pairs over the same duped
  corpus as q86, reduced to a one-row (n_pairs, n_h0, n_h1) summary.
  With max_hamming=1 the pigeonhole combos are 3-chunk (24-bit) keys —
  far more selective than q86's 2-chunk keys — and the tiny output
  means bench wall-clock tracks candidate generation + verification,
  not result materialization. q86's raw-pair entry stays in the bench
  for throughput; this entry is the candidate-pruning regression
  signal at sf1, where q86 is output-bound by construction
  (bench.py SF1 notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from .catalog import QueryDef
from .catalog_batch8 import HAMMING_BITS, HAMMING_CHUNKS, _simhash_cte
from .catalog_northstar import _duped_docs

STRICT_MAX_HAMMING = 1


def q231_simhash_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row audit of the Hamming <= 1 SimHash join: pair count plus
    the exact-duplicate (h=0) / one-flip (h=1) split. Same fingerprint
    and banding machinery as q86 at a stricter radius: combo keys are
    chunks−1 = 3 chunks wide, so the candidate set — and therefore the
    runtime — is dominated by banding selectivity, not output rows."""
    fps = D.simhash(_duped_docs(spark, sf_dir), bits=HAMMING_BITS)
    pairs = D.simhash_hamming_pairs(
        fps,
        bits=HAMMING_BITS,
        chunks=HAMMING_CHUNKS,
        max_hamming=STRICT_MAX_HAMMING,
    )
    zero = F.coalesce(
        F.sum((F.col("hamming") == 0).cast("long")), F.lit(0)
    ).cast("long")
    one = F.coalesce(
        F.sum((F.col("hamming") == 1).cast("long")), F.lit(0)
    ).cast("long")
    return pairs.agg(
        F.count("*").cast("long").alias("n_pairs"),
        zero.alias("n_h0"),
        one.alias("n_h1"),
    )


ORACLE_Q231 = f"""
WITH {_simhash_cte()},
pairs AS (
  SELECT bit_count(xor(a.simhash, b.simhash)) AS hamming
  FROM sh a JOIN sh b ON a.id < b.id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= {STRICT_MAX_HAMMING})
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COALESCE(SUM(CASE WHEN hamming = 0 THEN 1 END), 0) AS BIGINT)
         AS n_h0,
       CAST(COALESCE(SUM(CASE WHEN hamming = 1 THEN 1 END), 0) AS BIGINT)
         AS n_h1
FROM pairs
"""


def batch45_registry() -> list[QueryDef]:
    return [
        QueryDef(
            "q231_simhash_strict",
            q231_simhash_strict,
            ORACLE_Q231,
            "Hamming<=1 SimHash pair audit (candidate-bound summary)",
        ),
    ]
