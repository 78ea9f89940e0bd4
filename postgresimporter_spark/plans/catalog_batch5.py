"""Fifth catalog batch: bag-semantics set ops, exact percentiles, and
TF-IDF term scoring."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.textstats import tokens
from ..sources.parquet import load_tables
from .catalog import QueryDef


# q58: bag-semantics set operations -----------------------------------------


def q58_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL (multiplicity-preserving set ops) over
    order-priority multisets of two customer segments."""
    o = load_tables(spark, sf_dir, ["orders", "customer"])
    seg = (
        o["orders"]
        .join(o["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select("c_mktsegment", "o_orderpriority")
    )
    a = seg.where(F.col("c_mktsegment") == "BUILDING").select("o_orderpriority")
    b = seg.where(F.col("c_mktsegment") == "MACHINERY").select("o_orderpriority")
    both = a.intersectAll(b).withColumn("which", F.lit("intersect_all"))
    only_a = a.exceptAll(b).withColumn("which", F.lit("except_all"))
    return (
        both.unionByName(only_a)
        .groupBy("which", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


ORACLE_Q58 = """
WITH a AS (SELECT o_orderpriority FROM orders JOIN customer
           ON o_custkey = c_custkey WHERE c_mktsegment = 'BUILDING'),
b AS (SELECT o_orderpriority FROM orders JOIN customer
      ON o_custkey = c_custkey WHERE c_mktsegment = 'MACHINERY'),
tagged AS (
  SELECT o_orderpriority, 'intersect_all' AS which FROM
    (SELECT * FROM a INTERSECT ALL SELECT * FROM b) t
  UNION ALL
  SELECT o_orderpriority, 'except_all' AS which FROM
    (SELECT * FROM a EXCEPT ALL SELECT * FROM b) t)
SELECT which, o_orderpriority, COUNT(*) AS n
FROM tagged GROUP BY 1, 2
"""


# q60: exact percentiles / median -------------------------------------------


def q60_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (interpolated) percentiles + median per priority — Spark's
    sort-based ``percentile`` matches quantile_cont bit-for-bit (probed:
    identical doubles at every grouping)."""
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    return o.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", 0.25).alias("p25"),
        F.median("o_totalprice").alias("p50"),
        F.percentile("o_totalprice", 0.75).alias("p75"),
        F.min("o_totalprice").alias("p_min"),
        F.max("o_totalprice").alias("p_max"),
    )


ORACLE_Q60 = """
SELECT o_orderpriority,
  quantile_cont(o_totalprice, 0.25) AS p25,
  quantile_cont(o_totalprice, 0.5) AS p50,
  quantile_cont(o_totalprice, 0.75) AS p75,
  MIN(o_totalprice) AS p_min,
  MAX(o_totalprice) AS p_max
FROM orders GROUP BY o_orderpriority
"""


# q61: TF-IDF ----------------------------------------------------------------


def q61_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (doc_id < 50), via the
    tfidf_scores operator (textstats.py): two shuffles (tf on
    (doc, token), df on token); the document-frequency join is
    size-gated — AQE broadcasts iff the aggregated vocabulary table is
    under the broadcast threshold at runtime, and falls back to a
    shuffle join when it outgrows it (VERDICT r01 fix #9). ln() agrees
    across engines well inside the 6-digit round.
    """
    from ..operators.textstats import tfidf_scores

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    scored = tfidf_scores(docs, df_join="auto")
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("token")
    )
    return (
        scored.where(F.col("doc_id") < 50)
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= 3)
        .select("doc_id", "token", "tf", "tfidf", "rk")
    )


ORACLE_Q61 = """
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                            t -> t != '')) AS token
  FROM documents),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf,
         round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
  FROM tf JOIN df ON tf.token = df.token CROSS JOIN n)
SELECT doc_id, token, tf, tfidf, rk FROM (
  SELECT doc_id, token, tf, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, token) AS rk
  FROM scored WHERE doc_id < 50) t
WHERE rk <= 3
"""


# q62: int8 embedding quantization ------------------------------------------


def q62_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 quantization summary (scale + integer checksums;
    scalars rather than the arrays themselves keep the hash compare
    unambiguous)."""
    from ..operators.quantize import quantize_embeddings

    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    q = quantize_embeddings(emb)
    qsum = F.aggregate(
        F.col("qvec"), F.lit(0), lambda acc, x: acc + x
    )
    return q.select(
        "vec_id",
        F.round(F.col("scale"), 6).alias("scale6"),
        qsum.cast("long").alias("q_sum"),
        F.array_min("qvec").cast("long").alias("q_min"),
        F.array_max("qvec").cast("long").alias("q_max"),
    )


ORACLE_Q62 = """
WITH scaled AS (
  SELECT vec_id,
    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0
      AS scale,
    embedding
  FROM embeddings),
quant AS (
  SELECT vec_id, scale,
    CASE WHEN scale = 0
         THEN list_transform(embedding, x -> 0)
         ELSE list_transform(embedding,
                x -> CAST(round(CAST(x AS DOUBLE) / scale) AS INT)) END
      AS qvec
  FROM scaled)
SELECT vec_id, round(scale, 6) AS scale6,
  CAST(list_aggregate(qvec, 'sum') AS BIGINT) AS q_sum,
  CAST(list_aggregate(qvec, 'min') AS BIGINT) AS q_min,
  CAST(list_aggregate(qvec, 'max') AS BIGINT) AS q_max
FROM quant
"""


# q63: dedup clusters (connected components over near-dup pairs) ------------


def q63_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH pairs -> connected components -> cluster summary.
    Iterative min-label propagation on the Spark side; the oracle
    computes the same components with a recursive CTE."""
    from ..operators.components import dedup_clusters
    from .catalog_northstar import q26_minhash_lsh

    pairs = q26_minhash_lsh(spark, sf_dir)
    return dedup_clusters(pairs)


def _q63_oracle() -> str:
    from .catalog_northstar import ORACLE_Q26

    return f"""
WITH RECURSIVE pairs AS ({ORACLE_Q26}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs),
reach(id, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
labels AS (
  SELECT id, MIN(r) AS component FROM reach GROUP BY id)
SELECT component, COUNT(*) AS cluster_size,
       MIN(id) AS min_id, MAX(id) AS max_id
FROM labels GROUP BY component
"""


ORACLE_Q63 = _q63_oracle()


# q64: Python UDTF (lateral table function) ---------------------------------


def q64_udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Python UDTF applied laterally, aggregated to per-position
    token stats — differentially testable against pure SQL."""
    from ..operators.udtf_ops import udtf_token_positions

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    toks = udtf_token_positions(docs.where(F.col("doc_id") < 100))
    toks = toks.withColumn("position", F.col("position").cast("long"))
    return toks.groupBy("position").agg(
        F.count("*").alias("n_docs_with_position"),
        F.count_distinct("token").alias("n_distinct_tokens"),
        F.min("token").alias("first_token"),
    )


ORACLE_Q64 = """
WITH tok AS (
  SELECT doc_id, u.tok AS token, u.pos AS position FROM (
    SELECT doc_id,
      unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                         t -> t != '')) AS tok,
      unnest(generate_series(1,
        len(list_filter(string_split_regex(trim(text), '\\s+'),
                        t -> t != '')))) AS pos
    FROM documents WHERE doc_id < 100) u(doc_id, tok, pos))
SELECT position, COUNT(*) AS n_docs_with_position,
       COUNT(DISTINCT token) AS n_distinct_tokens,
       MIN(token) AS first_token
FROM tok GROUP BY position
"""


# q65: grouped-agg pandas UDF ------------------------------------------------


def q65_pandas_grouped_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF (UDAF surface): fixed-point mean of order
    value per priority."""
    from ..operators.udtf_ops import grouped_fixed_mean

    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    return grouped_fixed_mean(
        o, key="o_orderpriority", value="o_totalprice", out_name="mean_price"
    )


ORACLE_Q65 = """
SELECT o_orderpriority,
  (CAST(SUM(CAST(round(o_totalprice * 1000000) AS BIGINT)) AS DOUBLE)
   / 1000000.0) / COUNT(*) AS mean_price,
  COUNT(*) AS n
FROM orders GROUP BY o_orderpriority
"""


# q66/q67: funnel + retention ------------------------------------------------

FUNNEL_STEPS = ["view", "click", "purchase"]


def q66_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.funnel import funnel

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    return funnel(ev, FUNNEL_STEPS, window_minutes=60)


ORACLE_Q66 = """
WITH per_user AS (
  SELECT user_id,
    MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t0,
    MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t1,
    MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t2
  FROM events GROUP BY user_id),
flags AS (
  SELECT user_id,
    CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END AS r0,
    CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL AND t1 >= t0
          AND t1 - t0 <= 3600000000 THEN 1 ELSE 0 END AS r1,
    CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL AND t1 >= t0
          AND t1 - t0 <= 3600000000
          AND t2 IS NOT NULL AND t2 >= t1
          AND t2 - t0 <= 3600000000 THEN 1 ELSE 0 END AS r2
  FROM per_user),
totals AS (
  SELECT CAST(SUM(r0) AS BIGINT) AS n0, CAST(SUM(r1) AS BIGINT) AS n1,
         CAST(SUM(r2) AS BIGINT) AS n2
  FROM flags)
SELECT CAST(0 AS BIGINT) AS step, 'view' AS event_type, n0 AS n_users FROM totals
UNION ALL SELECT 1, 'click', n1 FROM totals
UNION ALL SELECT 2, 'purchase', n2 FROM totals
"""


def q67_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.funnel import retention

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    return retention(ev, max_days=7)


ORACLE_Q67 = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
  FROM events),
first_day AS (
  SELECT user_id, MIN(day) AS cohort_day FROM days GROUP BY user_id)
SELECT cohort_day, CAST(date_diff('day', cohort_day, day) AS BIGINT)
         AS day_offset,
       COUNT(DISTINCT days.user_id) AS n_users
FROM days JOIN first_day ON days.user_id = first_day.user_id
WHERE date_diff('day', cohort_day, day) <= 7
GROUP BY 1, 2
"""


# q68: multi-supplier order anomalies (TPC-H Q21 shape) ----------------------


def q68_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the ONLY late shipper on a multi-supplier
    order — EXISTS (another supplier on the order) + NOT EXISTS (another
    late supplier), the nested correlated-predicate shape of TPC-H Q21."""
    t = load_tables(spark, sf_dir, ["lineitem", "orders", "supplier"])
    li = t["lineitem"].join(
        t["orders"].select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    late = F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 90 DAYS")
    l1 = li.select("l_orderkey", "l_suppkey", late.alias("is_late"))
    # per-order supplier stats: distinct suppliers, distinct late suppliers
    order_stats = l1.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("is_late"), F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    sole_late = (
        l1.where(F.col("is_late"))
        .join(order_stats, on="l_orderkey")
        .where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .select("l_suppkey")
        .distinct()
    )
    return (
        sole_late.join(
            F.broadcast(t["supplier"]),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


ORACLE_Q68 = """
WITH l1 AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 90 DAY AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
order_stats AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late_supp
  FROM l1 GROUP BY l_orderkey),
sole_late AS (
  SELECT DISTINCT l1.l_suppkey
  FROM l1 JOIN order_stats ON l1.l_orderkey = order_stats.l_orderkey
  WHERE l1.is_late AND n_supp > 1 AND n_late_supp = 1)
SELECT s_name, COUNT(*) AS numwait
FROM sole_late JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
"""


# q69: sliding event-time windows --------------------------------------------


def q69_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes: each event lands in two
    windows (F.window with slideDuration)."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


ORACLE_Q69 = """
WITH slid AS (
  SELECT event_type,
    unnest([CAST(to_timestamp(floor(epoch(ts) / 1800) * 1800) AS TIMESTAMP),
            CAST(to_timestamp(floor(epoch(ts) / 1800) * 1800
                              - 1800) AS TIMESTAMP)]) AS window_start
  FROM events)
SELECT window_start, event_type, COUNT(*) AS n_events
FROM slid GROUP BY 1, 2
"""


def batch5_registry() -> list[QueryDef]:
    return [
        QueryDef("q68_sole_late_supplier", q68_sole_late_supplier, ORACLE_Q68, "nested EXISTS/NOT EXISTS (Q21)"),
        QueryDef("q69_sliding_windows", q69_sliding_windows, ORACLE_Q69, "sliding event-time windows"),
        QueryDef("q66_funnel", q66_funnel, ORACLE_Q66, "ordered funnel conversion"),
        QueryDef("q67_retention", q67_retention, ORACLE_Q67, "cohort retention triangle"),
        QueryDef("q64_udtf_tokenize", q64_udtf_tokenize, ORACLE_Q64, "Python UDTF lateral tokenize"),
        QueryDef("q65_pandas_grouped_mean", q65_pandas_grouped_mean, ORACLE_Q65, "grouped-agg pandas UDF mean"),
        QueryDef("q63_dedup_clusters", q63_dedup_clusters, ORACLE_Q63, "connected-components dedup clusters"),
        QueryDef("q58_set_ops_all", q58_set_ops_all, ORACLE_Q58, "INTERSECT ALL / EXCEPT ALL"),
        QueryDef("q60_price_percentiles", q60_price_percentiles, ORACLE_Q60, "exact percentiles + median"),
        QueryDef("q61_tfidf_top_terms", q61_tfidf_top_terms, ORACLE_Q61, "TF-IDF top terms per doc"),
        QueryDef("q62_quantize_embeddings", q62_quantize_embeddings, ORACLE_Q62, "int8 embedding quantization"),
    ]
