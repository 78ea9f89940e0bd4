"""Thirteenth catalog batch: distributed id assignment, equi-depth
histograms, and weighted deterministic sampling."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import hash_bucket
from ..operators.rowids import assign_global_ids
from ..sources.parquet import load_tables
from .catalog import QueryDef

# q103: global row ids -------------------------------------------------------


def q103_global_row_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense global ids over documents in (source, doc_id) order via
    the range-partition + offset pattern (operators/rowids.py) — the
    scalable replacement for an unpartitioned row_number window."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    out = assign_global_ids(
        docs.select("doc_id", "source"), ["source", "doc_id"],
        num_partitions=8,
    )
    return out.select("doc_id", "source", "row_id")


# the oracle states the SEMANTICS with the window form; the Spark plan
# achieves the same result without the single-reducer sort
ORACLE_Q103 = """
SELECT doc_id, source,
       CAST(ROW_NUMBER() OVER (ORDER BY source, doc_id) - 1 AS BIGINT)
         AS row_id
FROM documents
"""


# q104: equi-depth histogram -------------------------------------------------

N_BUCKETS = 10
_QS = [i / N_BUCKETS for i in range(1, N_BUCKETS)]


def q104_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile histogram of order totals: boundaries from one exact
    percentile aggregation (metadata-scale result), bucket assignment
    as a scan-side comparison chain — no global sort, no per-row
    window (the q41 lesson applied to histograms). Bucket b covers
    [q_b, q_{b+1}) with the last bucket closed above."""
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    bounds = o.agg(
        *[
            F.percentile("o_totalprice", q).alias(f"_b{i}")
            for i, q in enumerate(_QS)
        ]
    )
    bucket = F.lit(0)
    for i in range(len(_QS)):
        bucket = F.when(
            F.col("o_totalprice") >= F.col(f"_b{i}"), i + 1
        ).otherwise(bucket)
    return (
        o.crossJoin(F.broadcast(bounds))
        .withColumn("bucket", bucket.cast("long"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.round(F.min("o_totalprice"), 6).alias("lo"),
            F.round(F.max("o_totalprice"), 6).alias("hi"),
        )
    )


def _hist_oracle() -> str:
    qlist = ", ".join(str(q) for q in _QS)
    case = "0"
    for i in range(len(_QS)):
        case = f"CASE WHEN o_totalprice >= b[{i + 1}] THEN {i + 1} ELSE {case} END"
    return f"""
WITH bounds AS (
  SELECT quantile_cont(o_totalprice, [{qlist}]) AS b FROM orders)
SELECT CAST({case} AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       round(MIN(o_totalprice), 6) AS lo,
       round(MAX(o_totalprice), 6) AS hi
FROM orders, bounds
GROUP BY 1
"""


ORACLE_Q104 = _hist_oracle()


# q105: weighted deterministic sampling --------------------------------------

W_SCALE = 1_000_000


def q105_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-proportional document sampling (longer docs likelier —
    token-budget-proportional corpus draws): keep a doc iff its md5
    bucket falls below ``n_chars / max_n_chars`` scaled to integers.
    ALL threshold math is integer (exact on both engines); the sample
    is re-drawable bit-identically under any partitioning — same
    md5-bucket primitive as q74/q75, with a per-row rate."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    mx = docs.agg(F.max("n_chars").alias("_max_chars"))
    # integer `div`, not `/`: float division truncated to long can land
    # one off DuckDB's exact integer `//` at representability edges
    thr = F.expr(
        f"(CAST(n_chars AS BIGINT) * {W_SCALE}) div _max_chars"
    )
    bucket = hash_bucket(F.col("doc_id").cast("string"), W_SCALE)
    return (
        docs.crossJoin(F.broadcast(mx))
        .where(bucket < thr)
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_kept"),
            F.sum(F.col("n_chars").cast("long")).alias("kept_chars"),
            F.min("doc_id").alias("first_doc"),
        )
    )


ORACLE_Q105 = f"""
WITH mx AS (SELECT MAX(n_chars) AS max_chars FROM documents)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS kept_chars,
       MIN(doc_id) AS first_doc
FROM documents, mx
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
      % {W_SCALE}
      < CAST(CAST(n_chars AS BIGINT) * {W_SCALE} // max_chars AS BIGINT)
GROUP BY source
"""


def batch13_registry() -> list[QueryDef]:
    return [
        QueryDef("q103_global_row_ids", q103_global_row_ids, ORACLE_Q103, "global ids via range-partition + offsets (no global window)"),
        QueryDef("q104_equidepth_histogram", q104_equidepth_histogram, ORACLE_Q104, "decile histogram from one percentile pass"),
        QueryDef("q105_weighted_sample", q105_weighted_sample, ORACLE_Q105, "length-proportional deterministic sampling"),
    ]
