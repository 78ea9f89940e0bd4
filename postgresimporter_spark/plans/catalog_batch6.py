"""Sixth catalog batch: grouping sets + grouping_id, pivot, array
aggregation functions, and the date/time scalar suite.

Dialect-parity notes baked in: collect_list is order-nondeterministic so
array outputs go through sort_array + array_join (string-serialized —
also keeps the hash compare unambiguous); day-of-week conventions differ
(Spark Sunday=1, DuckDB Sunday=0) and are normalized explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.textstats import LANG_MARKERS as _LANG_MARKERS
from ..sources.parquet import load_tables
from .catalog import QueryDef, _dec

# q70: CUBE + grouping_id ----------------------------------------------------


def q70_cube_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("n"),
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        )
    )


ORACLE_Q70 = """
SELECT l_returnflag, l_linestatus,
  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
  COUNT(*) AS n,
  CAST(SUM(CAST(l_quantity AS DECIMAL(15,4))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# q71: pivot -----------------------------------------------------------------

PIVOT_STATUSES = ["F", "O"]


def q71_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (deterministic columns)."""
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", PIVOT_STATUSES)
        .agg(F.count(F.lit(1)))  # '*' is invalid inside a pivot agg
        .select(
            "l_returnflag",
            F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
            F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
        )
    )


ORACLE_Q71 = """
SELECT l_returnflag,
  COUNT(*) FILTER (WHERE l_linestatus = 'F') AS n_f,
  COUNT(*) FILTER (WHERE l_linestatus = 'O') AS n_o
FROM lineitem GROUP BY l_returnflag
"""


# q72: array aggregation functions ------------------------------------------


def q72_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list / collect_set with deterministic serialization, plus
    array predicates over the collected values."""
    c = load_tables(spark, sf_dir, ["customer"])["customer"]
    top = c.where(F.col("c_custkey") <= 60)
    keys_sorted = F.sort_array(F.collect_list("c_custkey"))
    segs_sorted = F.sort_array(F.collect_set("c_mktsegment"))
    return top.groupBy("c_nationkey").agg(
        F.array_join(keys_sorted, ",").alias("custkeys"),
        F.array_join(segs_sorted, ",").alias("segments"),
        F.size(F.collect_set("c_mktsegment")).cast("long").alias("n_segments"),
        F.element_at(keys_sorted, 1).alias("min_key"),
        F.array_contains(segs_sorted, "BUILDING").alias("has_building"),
    )


ORACLE_Q72 = """
SELECT c_nationkey,
  array_to_string(list_sort(list(c_custkey)), ',') AS custkeys,
  array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
  CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS n_segments,
  MIN(c_custkey) AS min_key,
  list_contains(list(DISTINCT c_mktsegment), 'BUILDING') AS has_building
FROM customer WHERE c_custkey <= 60
GROUP BY c_nationkey
"""


# q73: date/time scalar suite ------------------------------------------------


def q73_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    d = F.col("o_orderdate")
    return o.where(F.col("o_orderkey") <= 500).select(
        "o_orderkey",
        F.year(d).cast("long").alias("y"),
        F.month(d).cast("long").alias("m"),
        F.dayofmonth(d).cast("long").alias("dom"),
        (F.dayofweek(d) - 1).cast("long").alias("dow_sun0"),
        F.weekofyear(d).cast("long").alias("iso_week"),
        F.last_day(d).alias("month_end"),
        F.date_add(d.cast("date"), 30).alias("plus30"),
        F.datediff(F.lit("2002-01-01").cast("date"), d.cast("date"))
        .cast("long")
        .alias("days_to_2002"),
        F.trunc(d.cast("date"), "month").alias("month_start"),
    )


ORACLE_Q73 = """
SELECT o_orderkey,
  CAST(year(o_orderdate) AS BIGINT) AS y,
  CAST(month(o_orderdate) AS BIGINT) AS m,
  CAST(day(o_orderdate) AS BIGINT) AS dom,
  CAST(dayofweek(o_orderdate) AS BIGINT) AS dow_sun0,
  CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
  last_day(CAST(o_orderdate AS DATE)) AS month_end,
  CAST(o_orderdate AS DATE) + 30 AS plus30,
  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')
       AS BIGINT) AS days_to_2002,
  date_trunc('month', CAST(o_orderdate AS DATE)) AS month_start
FROM orders WHERE o_orderkey <= 500
"""


# q74/q75: deterministic sampling -------------------------------------------
#
# RNG-based .sample() is engine- and partitioning-dependent; hash-based
# sampling (keep rows where md5(key) mod N < k) is reproducible across
# engines, re-runs, and repartitioning — the right sampling primitive
# for a 100 TB pipeline (and trivially oracle-checkable).


def q74_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% hash-sample of lineitem by (orderkey, linenumber), verified
    via aggregate fingerprint."""
    from ..operators.dedup import hash_bucket

    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    # F.concat (null-propagating, matching SQL ||), not concat_ws
    # (null-skipping): both sides must exclude NULL-keyed rows identically
    key = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit(":"),
        F.col("l_linenumber").cast("string"),
    )
    bucket = hash_bucket(key, 100)
    return (
        li.where(bucket < 10)
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.count_distinct("l_orderkey").alias("n_orders"),
        )
    )


ORACLE_Q74 = """
SELECT COUNT(*) AS n_sampled,
  CAST(SUM(CAST(l_quantity AS DECIMAL(15,4))) AS DOUBLE) AS sum_qty,
  COUNT(DISTINCT l_orderkey) AS n_orders
FROM lineitem
WHERE ('0x' || substr(md5(l_orderkey || ':' || l_linenumber), 1, 15))::BIGINT
      % 100 < 10
"""


def q75_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified hash-sampling: per-language rates over documents
    (downsample the dominant language, keep the rest) — the class-
    rebalancing shape of training-data curation."""
    from ..operators.dedup import hash_bucket

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    bucket = hash_bucket(F.col("doc_id").cast("string"), 100)
    rate = F.when(F.col("lang") == "en", F.lit(25)).otherwise(F.lit(80))
    return (
        docs.where(bucket < rate)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.min("doc_id").alias("first_doc"),
        )
    )


ORACLE_Q75 = """
SELECT lang, COUNT(*) AS n_kept, MIN(doc_id) AS first_doc
FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100
      < CASE WHEN lang = 'en' THEN 25 ELSE 80 END
GROUP BY lang
"""


# q76: exact-dedup survivors (full rows) ------------------------------------


def q76_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-one-full-row dedup: the canonical (min doc_id) row per
    distinct text, with its metadata — q24 returns the hash summary,
    this returns the surviving rows themselves (min_by over the struct;
    no window shuffle beyond the group-by)."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    # negative ids: disjoint from real doc_ids at ANY scale factor (a
    # fixed +offset collides once the fixture outgrows it, which would
    # fan out the oracle's join-back on doc_id)
    extra = docs.where(F.col("doc_id") < 100).select(
        (-F.col("doc_id") - 1).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    duped = docs.unionByName(extra)
    best = F.min(
        F.struct(F.col("doc_id"), F.col("lang"), F.col("source"))
    ).alias("best")
    return (
        duped.groupBy(F.sha2(F.col("text"), 256).alias("content_hash"))
        .agg(best, F.count("*").alias("n_copies"))
        .select(
            F.col("best.doc_id").alias("doc_id"),
            F.col("best.lang").alias("lang"),
            F.col("best.source").alias("source"),
            "n_copies",
        )
    )


ORACLE_Q76 = """
WITH duped AS (
  SELECT doc_id, text, lang, source FROM documents
  UNION ALL
  SELECT -doc_id - 1, text, lang, source FROM documents
  WHERE doc_id < 100),
canon AS (
  SELECT sha256(text) AS h, MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
  FROM duped GROUP BY sha256(text))
SELECT d.doc_id, d.lang, d.source, c.n_copies
FROM canon c JOIN duped d ON c.doc_id = d.doc_id
"""


# q77: hybrid text + vector retrieval ----------------------------------------


def q77_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid scoring: cosine relevance to a probe vector blended with a
    text-quality prior (stopword ratio) — the documents⋈embeddings
    cross-modal join (doc_id = vec_id), top 20."""
    from pyspark.sql import Window

    from ..operators.similarity import cosine
    from ..operators.textstats import quality_features

    t = load_tables(spark, sf_dir, ["documents", "embeddings"])
    probe_rows = t["embeddings"].where(F.col("vec_id") == 0).collect()
    if not probe_rows:
        raise ValueError("q77: no embeddings row with vec_id == 0 (probe)")
    probe = probe_rows[0].embedding
    if probe is None:
        # r13 null sweep: a NULL probe embedding crashed as a bare
        # TypeError iterating None; the probe is this query's anchor,
        # so a null one is a data error worth naming
        raise ValueError("q77: probe row vec_id == 0 has NULL embedding")
    probe_col = F.array(*[F.lit(float(x)) for x in probe])
    docs_q = quality_features(t["documents"]).select(
        "doc_id", "stopword_ratio"
    )
    joined = t["embeddings"].join(
        docs_q, F.col("vec_id") == F.col("doc_id")
    )
    rel = F.round(cosine(F.col("embedding"), probe_col), 6)
    score = F.round(
        0.8 * rel + 0.2 * F.col("stopword_ratio"), 6
    )
    # top-k via orderBy+limit (TakeOrderedAndProject: per-partition
    # heaps); the unpartitioned window alternative funnels the whole
    # join through ONE partition. Ranks are then assigned over 20 rows.
    top = (
        joined.withColumn("relevance", rel)
        .withColumn("hybrid_score", score)
        .orderBy(F.desc("hybrid_score"), F.asc("vec_id"))
        .limit(20)
    )
    w = Window.orderBy(F.desc("hybrid_score"), F.asc("vec_id"))
    return top.withColumn("rk", F.row_number().over(w).cast("long")).select(
        "vec_id", "relevance", "hybrid_score", "rk"
    )


def _q77_oracle() -> str:
    return """
WITH probe AS (SELECT embedding AS pv FROM embeddings WHERE vec_id = 0),
quality AS (
  SELECT doc_id,
    CASE WHEN len(list_filter(string_split_regex(trim(text), '\\s+'),
                              t -> t != '')) > 0 THEN
      round(CAST(len(list_filter(list_filter(string_split_regex(trim(text), '\\s+'), t -> t != ''),
                                 t -> t IN ({markers}))) AS DOUBLE)
            / len(list_filter(string_split_regex(trim(text), '\\s+'),
                              t -> t != '')), 6)
    ELSE 0.0 END AS stopword_ratio
  FROM documents),
scored AS (
  SELECT e.vec_id,
    round(list_dot_product(e.embedding::DOUBLE[], p.pv::DOUBLE[]) /
      (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
       sqrt(list_dot_product(p.pv::DOUBLE[], p.pv::DOUBLE[]))), 6)
      AS relevance,
    q.stopword_ratio
  FROM embeddings e CROSS JOIN probe p
  JOIN quality q ON e.vec_id = q.doc_id)
SELECT vec_id, relevance,
       round(0.8 * relevance + 0.2 * stopword_ratio, 6) AS hybrid_score, rk
FROM (SELECT vec_id, relevance, stopword_ratio,
             ROW_NUMBER() OVER (
               ORDER BY round(0.8 * relevance + 0.2 * stopword_ratio, 6)
                        DESC, vec_id) AS rk
      FROM scored) t
WHERE rk <= 20
""".format(
        markers=", ".join(
            "'%s'" % w
            for w in sorted(
                {m for ms in _LANG_MARKERS.values() for m in ms}
            )
        )
    )


ORACLE_Q77 = _q77_oracle()


def batch6_registry() -> list[QueryDef]:
    return [
        QueryDef("q76_dedup_survivors", q76_dedup_survivors, ORACLE_Q76, "full-row dedup survivors"),
        QueryDef("q77_hybrid_retrieval", q77_hybrid_retrieval, ORACLE_Q77, "hybrid text+vector retrieval"),
        QueryDef("q74_deterministic_sample", q74_deterministic_sample, ORACLE_Q74, "hash-based reproducible sample"),
        QueryDef("q75_stratified_sample", q75_stratified_sample, ORACLE_Q75, "stratified per-class sampling"),
        QueryDef("q70_cube_grouping_id", q70_cube_grouping_id, ORACLE_Q70, "CUBE + grouping_id"),
        QueryDef("q71_pivot_status", q71_pivot_status, ORACLE_Q71, "pivot w/ explicit values"),
        QueryDef("q72_array_functions", q72_array_functions, ORACLE_Q72, "collect_list/set + array fns"),
        QueryDef("q73_datetime_functions", q73_datetime_functions, ORACLE_Q73, "date/time scalar suite"),
    ]
