"""Batch 77: spell-variant pairs over a DUPLICATED term corpus.

Round-9 maintenance-rule trigger (b), scale-failure repro: the
SymSpell deletion-neighborhood join (``linkage.
deletion_neighborhood_pairs``, q179) expanded variants per input ROW,
so a term repeated k times cost k^2 candidate rows per true pair —
the vocabulary-from-corpus shape (every real corpus repeats its
vocabulary). The fix distincts terms before expansion (the output is
distinct STRING pairs, so this is an identity rewrite); q320 pins the
duplicated-input shape externally: part-name color tokens at ~250x
multiplicity (4000 token rows, 16 distinct, 2 true variant pairs at
sf0.01), where the pre-fix plan would have built ~62k times more
candidate rows than the post-fix one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_tables
from .catalog import QueryDef


def q320_spell_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-1 token pairs in the part-name vocabulary, fed
    the RAW (heavily duplicated) token stream: (term_a, term_b, dist)."""
    from ..operators.linkage import deletion_neighborhood_pairs

    part = load_tables(spark, sf_dir, ["part"])["part"]
    tokens = part.select(
        F.explode(F.split(F.col("p_name"), " ")).alias("term")
    ).where(F.col("term") != "")
    return deletion_neighborhood_pairs(tokens, term_col="term")


ORACLE_Q320 = """
WITH toks AS (
  SELECT DISTINCT t AS term
  FROM (SELECT unnest(string_split(p_name, ' ')) AS t FROM part)
  WHERE t <> ''),
pairs AS (
  SELECT a.term AS term_a, b.term AS term_b
  FROM toks a JOIN toks b ON a.term < b.term
  WHERE levenshtein(a.term, b.term) <= 1)
SELECT term_a, term_b,
       CAST(levenshtein(term_a, term_b) AS BIGINT) AS dist
FROM pairs
"""


def batch77_registry() -> list[QueryDef]:
    return [
        QueryDef(
            "q320_spell_variants",
            q320_spell_variants,
            ORACLE_Q320,
            "SymSpell variant pairs over a ~250x-duplicated token corpus",
        ),
    ]
