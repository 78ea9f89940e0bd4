"""Second catalog batch: correlated subqueries, windows with lag/lead,
n-gram analytics, embedding stats, ntile bucketing, scalar-function
parity — widening SURVEY §2 coverage with oracle-checked entries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.textstats import tokens
from ..sources.parquet import load_tables
from .catalog import QueryDef, _dec


# q33: EXISTS-correlated aggregate (TPC-H Q4 shape) -------------------------


def q33_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders (1996H1) having >= 1 line shipped after the order date,
    counted by priority — left-semi join with a compound condition."""
    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    o = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    return (
        o.join(
            t["lineitem"],
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


ORACLE_Q33 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""


# q34: correlated scalar subquery (TPC-H Q17 shape) -------------------------


def q34_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from lines whose quantity is below half the part's average
    quantity. The correlated avg decorrelates to a grouped join — exactly
    what Catalyst does with the SQL form; expressed explicitly here.

    (l_quantity values are small integers stored as doubles, so the
    average is exact regardless of summation order — safe to compare.)
    """
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    li = t["lineitem"]
    per_part_avg = li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    brand_parts = t["part"].where(F.col("p_brand") == "Brand#1")
    return (
        li.join(
            F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey")
        )
        .join(per_part_avg, F.col("l_partkey") == F.col("avg_partkey"))
        .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(F.sum(_dec("l_extendedprice")) / 7, 4)
            .cast("double")
            .alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


ORACLE_Q34 = """
SELECT
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(15,4))) / 7, 4) AS DOUBLE)
    AS avg_yearly,
  COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (SELECT 0.5 * AVG(l_quantity) FROM lineitem li2
                    WHERE li2.l_partkey = lineitem.l_partkey)
"""


# q35: n-gram frequency analytics -------------------------------------------


def q35_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level bigram counts, top 20 — explode + count + top-k with
    total-order tiebreak. The canonical token-frequency pipeline shape."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    toks = tokens(F.col("text"))
    # zip-of-shifted-slices (the vectorized n-gram shape; see
    # dedup.shingles) — the size>=2 filter below keeps partial grams out
    ln = F.greatest(F.size(toks) - 1, F.lit(1))
    bigrams = F.transform(
        F.arrays_zip(
            F.slice(toks, 1, ln).alias("a"), F.slice(toks, 2, ln).alias("b")
        ),
        lambda s: F.concat_ws(" ", s["a"], s["b"]),
    )
    return (
        docs.where(F.size(toks) >= 2)
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


ORACLE_Q35 = """
WITH toks AS (
  SELECT list_filter(string_split_regex(trim(text), '\\s+'), t -> t != '')
           AS toks
  FROM documents),
bigrams AS (
  SELECT unnest(list_transform(
           generate_series(0, greatest(len(toks) - 2, 0)),
           i -> array_to_string(list_slice(toks, i + 1, i + 2), ' ')))
         AS bigram
  FROM toks WHERE len(toks) >= 2)
SELECT bigram, COUNT(*) AS n FROM bigrams
GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20
"""


# q36: fingerprint clustering -----------------------------------------------


def q36_fingerprint_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster documents by 1-permutation fingerprint (cheap near-dup
    grouping): cluster sizes + canonical doc id."""
    from ..operators.textstats import fingerprint

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    return (
        docs.select(
            "doc_id", fingerprint(F.col("text")).alias("fingerprint")
        )
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count("*").alias("cluster_size"),
        )
    )


ORACLE_Q36 = """
WITH fp AS (
  SELECT doc_id,
    list_min(list_transform(
      list_distinct(list_transform(
        generate_series(0, greatest(len(string_split_regex(trim(text), '\\s+')) - 3, 0)),
        i -> array_to_string(list_slice(string_split_regex(trim(text), '\\s+'), i + 1, i + 3), ' '))),
      s -> md5(s))) AS fingerprint
  FROM documents)
SELECT fingerprint, MIN(doc_id) AS canonical_doc_id,
       COUNT(*) AS cluster_size
FROM fp GROUP BY fingerprint
"""


# q37: embedding statistics per label ---------------------------------------


def q37_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector stats: count + average L2 norm. Norms are
    rounded to 6 digits then decimal-summed (hash-stable across
    partitionings)."""
    from ..operators.similarity import _norm

    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    norm6 = F.round(_norm(F.col("embedding")), 6).cast("decimal(18,6)")
    return (
        emb.groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            (F.sum(norm6).cast("double") / F.count("*")).alias("avg_norm"),
        )
    )


ORACLE_Q37 = """
SELECT label, COUNT(*) AS n_vectors,
  CAST(SUM(CAST(round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6)
                AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_norm
FROM embeddings GROUP BY label
"""


# q38: top events per user ---------------------------------------------------


def q38_user_top_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events by value per user (window top-k on the fact side)."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    w = Window.partitionBy("user_id").orderBy(
        F.desc("value"), F.asc("event_id")
    )
    return (
        ev.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= 3)
        .select("user_id", "event_id", "event_type", "value", "rk")
    )


ORACLE_Q38 = """
SELECT user_id, event_id, event_type, value, rk FROM (
  SELECT user_id, event_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id) AS rk
  FROM events) t
WHERE rk <= 3
"""


# q39: lag/lead inter-event gaps --------------------------------------------


def q39_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap (microseconds) via lag — the lag/lead
    window shape; exact integer arithmetic on epoch micros."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    return ev.select(
        "user_id",
        "event_id",
        gap.alias("gap_us"),
        F.lead("event_id").over(w).alias("next_event_id"),
    )


ORACLE_Q39 = """
SELECT user_id, event_id,
  epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us,
  lead(event_id) OVER w AS next_event_id
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# q40: quarterly order trends ------------------------------------------------


def q40_quarterly_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc quarter + conditional counts (pivot-style agg)."""
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    return (
        o.groupBy(F.date_trunc("quarter", F.col("o_orderdate")).alias("quarter"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(
                F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
            ).alias("n_finished"),
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("n_urgent"),
            F.max(_dec("o_totalprice")).cast("double").alias("max_price"),
        )
    )


ORACLE_Q40 = """
SELECT CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS quarter,
  COUNT(*) AS n_orders,
  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
  CAST(MAX(CAST(o_totalprice AS DECIMAL(15,4))) AS DOUBLE) AS max_price
FROM orders GROUP BY 1
"""


# q41: ntile bucketing -------------------------------------------------------


def q41_price_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(4) semantics over a total order + per-quartile aggregates.

    Not ``F.ntile`` over an unpartitioned window — that funnels every
    order through ONE reducer for the sort (VERDICT r01 scale-killer).
    ``exact_ntile`` range-partitions, ranks locally, and offsets by a
    broadcast per-partition count table; the bucket arithmetic is
    bit-identical to SQL NTILE (oracle below stays NTILE(4))."""
    from ..operators.ranking import exact_ntile

    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    return (
        exact_ntile(
            o.select("o_totalprice", "o_orderkey"),
            ["o_totalprice", "o_orderkey"],
            4,
            bucket_col="quartile",
        )
        .groupBy("quartile")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


ORACLE_Q41 = """
SELECT quartile, COUNT(*) AS n_orders,
  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
FROM (SELECT o_totalprice,
             NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile
      FROM orders) t
GROUP BY quartile
"""


# q42: string-function parity ------------------------------------------------


def q42_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string-function surface: upper/lower/substring/replace/
    lpad/length/concat over customer names."""
    c = load_tables(spark, sf_dir, ["customer"])["customer"]
    name = F.col("c_name")
    return c.where(F.col("c_custkey") <= 200).select(
        "c_custkey",
        F.upper(name).alias("upper_name"),
        F.lower(name).alias("lower_name"),
        F.substring(name, 1, 8).alias("prefix8"),
        F.replace(name, F.lit("Customer"), F.lit("Cust")).alias("replaced"),
        F.lpad(F.col("c_custkey").cast("string"), 9, "0").alias("padded_key"),
        F.length(name).cast("long").alias("name_len"),
        F.concat(name, F.lit("#"), F.col("c_mktsegment")).alias("tagged"),
    )


ORACLE_Q42 = """
SELECT c_custkey,
  upper(c_name) AS upper_name,
  lower(c_name) AS lower_name,
  substring(c_name, 1, 8) AS prefix8,
  replace(c_name, 'Customer', 'Cust') AS replaced,
  lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS padded_key,
  length(c_name) AS name_len,
  c_name || '#' || c_mktsegment AS tagged
FROM customer WHERE c_custkey <= 200
"""


# q43: null-handling / conditional surface -----------------------------------


def q43_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nullif / coalesce / least / greatest / CASE over lineitem."""
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    return li.where(F.col("l_orderkey") <= 1000).select(
        "l_orderkey",
        "l_linenumber",
        F.nullif(F.col("l_discount"), F.lit(0.0)).alias("nonzero_discount"),
        F.coalesce(
            F.nullif(F.col("l_discount"), F.lit(0.0)), F.lit(-1.0)
        ).alias("discount_or_flag"),
        F.least(F.col("l_quantity"), F.lit(10.0)).alias("capped_qty"),
        F.greatest(F.col("l_tax"), F.col("l_discount")).alias("max_rate"),
        F.when(F.col("l_returnflag") == "R", F.lit("returned"))
        .when(F.col("l_linestatus") == "O", F.lit("open"))
        .otherwise(F.lit("other"))
        .alias("status_class"),
    )


ORACLE_Q43 = """
SELECT l_orderkey, l_linenumber,
  nullif(l_discount, 0.0) AS nonzero_discount,
  coalesce(nullif(l_discount, 0.0), -1.0) AS discount_or_flag,
  least(l_quantity, 10.0) AS capped_qty,
  greatest(l_tax, l_discount) AS max_rate,
  CASE WHEN l_returnflag = 'R' THEN 'returned'
       WHEN l_linestatus = 'O' THEN 'open'
       ELSE 'other' END AS status_class
FROM lineitem WHERE l_orderkey <= 1000
"""


# q44: cross join (small-dimension cartesian) --------------------------------


def q44_region_nation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join of two dims + membership flag via left join."""
    t = load_tables(spark, sf_dir, ["region", "nation"])
    pairs = t["region"].crossJoin(t["nation"])
    return pairs.select(
        "r_name",
        "n_name",
        (F.col("n_regionkey") == F.col("r_regionkey")).alias("is_member"),
    )


ORACLE_Q44 = """
SELECT r_name, n_name, (n_regionkey = r_regionkey) AS is_member
FROM region CROSS JOIN nation
"""


# q45: multi-way set + distinct counting -------------------------------------


def q45_activity_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type pair overlap — self-join distinct
    aggregation over events (set-intersection cardinality analytics)."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    ut = ev.select("user_id", "event_type").distinct()
    a, b = ut.alias("a"), ut.alias("b")
    return (
        a.join(b, on="user_id")
        .where(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count_distinct("user_id").alias("n_shared_users"))
    )


ORACLE_Q45 = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       COUNT(DISTINCT a.user_id) AS n_shared_users
FROM ut a JOIN ut b ON a.user_id = b.user_id
WHERE a.event_type < b.event_type
GROUP BY 1, 2
"""


def extra_registry() -> list[QueryDef]:
    return [
        QueryDef("q33_priority_check", q33_priority_check, ORACLE_Q33, "EXISTS-correlated agg (TPC-H Q4)"),
        QueryDef("q34_small_quantity_revenue", q34_small_quantity_revenue, ORACLE_Q34, "correlated scalar subquery (TPC-H Q17)"),
        QueryDef("q35_top_bigrams", q35_top_bigrams, ORACLE_Q35, "n-gram frequency top-k"),
        QueryDef("q36_fingerprint_clusters", q36_fingerprint_clusters, ORACLE_Q36, "fingerprint clustering"),
        QueryDef("q37_embedding_stats", q37_embedding_stats, ORACLE_Q37, "per-label vector stats"),
        QueryDef("q38_user_top_events", q38_user_top_events, ORACLE_Q38, "window top-k per user"),
        QueryDef("q39_event_gaps", q39_event_gaps, ORACLE_Q39, "lag/lead inter-event gaps"),
        QueryDef("q40_quarterly_orders", q40_quarterly_orders, ORACLE_Q40, "date_trunc + conditional agg"),
        QueryDef("q41_price_quartiles", q41_price_quartiles, ORACLE_Q41, "NTILE bucketing"),
        QueryDef("q42_string_functions", q42_string_functions, ORACLE_Q42, "string-function surface"),
        QueryDef("q43_null_handling", q43_null_handling, ORACLE_Q43, "null/conditional surface"),
        QueryDef("q44_region_nation_matrix", q44_region_nation_matrix, ORACLE_Q44, "cross join"),
        QueryDef("q45_activity_overlap", q45_activity_overlap, ORACLE_Q45, "distinct-overlap analytics"),
    ]
