"""Eleventh catalog batch: data-layout keys and tokenizer vocabulary.

q98 exposes the Z-order (Morton) interleave that drives multi-column
file skipping (operators/layout.py); q99 builds the token vocabulary
table (term/document frequency + cumulative coverage) that tokenizer
training and corpus triage start from.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.layout import zorder_key, zorder_key_sql
from ..operators.ranking import global_running_sum
from ..operators.textstats import tokens
from ..sources.parquet import load_tables
from .catalog import QueryDef

# q98: Z-order clustering key ------------------------------------------------

Z_BITS = 16


def q98_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton key over (l_partkey, l_suppkey): the value
    ``zorder_layout`` range-partitions on at write time. Pure integer
    arithmetic — scan-shaped, no shuffle, whole-stage codegen."""
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        zorder_key(
            [F.col("l_partkey"), F.col("l_suppkey")], Z_BITS
        ).alias("zval"),
    )


ORACLE_Q98 = f"""
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       {zorder_key_sql(['l_partkey', 'l_suppkey'], Z_BITS)} AS zval
FROM lineitem
"""


# q99: tokenizer vocabulary --------------------------------------------------


def q99_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary table: per token, corpus term frequency, document
    frequency, frequency rank, and cumulative coverage (the fraction of
    all token occurrences covered by the vocabulary up to this rank —
    the curve tokenizer vocab-size decisions read off).

    Scale shape: one explode + one two-metric aggregation on the token
    key (map-side partial). Rank + running coverage use the distributed
    ``global_running_sum`` machinery (range-partition on the frequency
    order, local prefix sums, broadcast offset table) — NO unpartitioned
    window anywhere, so a web-scale shingle vocabulary (1e8+ terms)
    ranks in parallel instead of through one reducer.
    """
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("token")
    )
    vocab = tok.groupBy("token").agg(
        F.count("*").cast("long").alias("term_freq"),
        F.countDistinct("doc_id").cast("long").alias("doc_freq"),
    )
    ranked = global_running_sum(
        vocab,
        [F.desc("term_freq"), F.asc("token")],
        "term_freq",
        idx_col="rank",
        rsum_col="_cum",
        total_col="_total",
    )
    return ranked.select(
        "token",
        "term_freq",
        "doc_freq",
        "rank",
        F.round(
            F.col("_cum").cast("double") / F.col("_total").cast("double"), 6
        ).alias("coverage"),
    )


ORACLE_Q99 = """
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                                    t -> t != '')) AS token
  FROM documents),
vocab AS (
  SELECT token,
         CAST(COUNT(*) AS BIGINT) AS term_freq,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
  FROM tok GROUP BY token),
tot AS (SELECT CAST(SUM(term_freq) AS BIGINT) AS total FROM vocab)
SELECT token, term_freq, doc_freq,
       CAST(ROW_NUMBER() OVER (ORDER BY term_freq DESC, token) AS BIGINT)
         AS rank,
       round(CAST(SUM(term_freq) OVER (ORDER BY term_freq DESC, token
                                       ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             / CAST(total AS DOUBLE), 6) AS coverage
FROM vocab, tot
"""


def batch11_registry() -> list[QueryDef]:
    return [
        QueryDef("q98_zorder_key", q98_zorder_key, ORACLE_Q98, "Morton Z-order clustering key (multi-column file skipping)"),
        QueryDef("q99_vocabulary", q99_vocabulary, ORACLE_Q99, "tokenizer vocabulary: tf/df/rank/cumulative coverage"),
    ]
