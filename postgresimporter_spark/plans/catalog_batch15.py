"""Batch 15: scan-side pruning tier — exact frequent items (two-phase
pigeonhole prune, operators/frequent.py) and Bloom-pruned semi-join
(operators/bloom.py).

Both operators change the SHUFFLE VOLUME, not the answer: their
results are bit-identical to the naive plans, so the oracles are the
plain SQL formulations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_tables
from .catalog import QueryDef

# q108: exact frequent tokens -------------------------------------------------

FREQ_K = 40  # support = total_tokens / 40 (2.5%)


def q108_frequent_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens covering >= 1/40 of the whole token stream — exact, via
    the two-phase prune: per-partition counts emit candidates locally
    (no shuffle), only candidates shuffle for the exact verify count.
    At 100 TB the long tail of near-singleton values never enters the
    exchange."""
    from ..operators.frequent import frequent_items
    from ..operators.textstats import tokens

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    tok = docs.select(
        F.explode(tokens(F.col("text"))).alias("token")
    )
    return frequent_items(tok, "token", k=FREQ_K).select(
        F.col("value").alias("token"), "cnt"
    )


ORACLE_Q108 = f"""
WITH tok AS (
  SELECT unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                            t -> t != '')) AS token
  FROM documents),
tot AS (SELECT COUNT(*) AS total FROM tok)
SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
FROM tok, tot
GROUP BY token, tot.total
HAVING COUNT(*) * {FREQ_K} >= tot.total
"""


# q109: bloom-pruned semi-join ------------------------------------------------


def q109_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders placed by AUTOMOBILE-segment customers, counted per
    order priority.  The fact scan is pre-filtered by an 8 KiB Bloom
    filter of the dim keys (md5-derived positions, literal codegen
    predicate — no join, no shuffle for the prune), then the exact
    semi-join removes false positives, so the result is identical to
    the plain semi-join the oracle runs."""
    from ..operators.bloom import bloom_semi_join

    t = load_tables(spark, sf_dir, ["orders", "customer"])
    dim = t["customer"].where(F.col("c_mktsegment") == "AUTOMOBILE")
    hits = bloom_semi_join(
        t["orders"], dim, fact_key="o_custkey", dim_key="c_custkey"
    )
    return (
        hits.groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


ORACLE_Q109 = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS total_price
FROM orders
WHERE o_custkey IN (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
GROUP BY o_orderpriority
"""


def batch15_registry() -> list[QueryDef]:
    return [
        QueryDef("q108_frequent_tokens", q108_frequent_tokens, ORACLE_Q108, "exact heavy hitters via two-phase pigeonhole prune"),
        QueryDef("q109_bloom_semi_join", q109_bloom_semi_join, ORACLE_Q109, "bloom-pruned semi-join (exact result)"),
    ]
