"""Batch 64: scale-first plan machinery under the oracle gate — the
capped walk sampler, the skew split join, dynamic partition pruning,
and the AMS F2 sketch.

- q301 capped walks — ``graph.random_walks(max_degree=...)``: the
  explicit hash-top-k adjacency cap (VERDICT r07 #5) plus its
  ``hot_degrees`` drop report, externally verified end-to-end: the
  oracle rebuilds the capped adjacency with the same
  ``md5(seed:node:neighbor)`` ranking in SQL, replays all four walk
  steps, and recomputes the audit row. CAP=16 binds on EVERY node of
  the co-purchase graph (sf0.01 degrees span 42-160), so the whole
  result is cap-determined — nothing passes by accident.
- q302 skew split join — ``skewjoin.skew_split_join``: hot keys
  (left-frequency > ratio of all rows; here a manufactured 30%-hot
  surrogate key) take a broadcast-hash leg, cold keys the ordinary
  shuffle join, union exact. The oracle is the plain SQL inner join —
  result equality IS the correctness claim; the plan shape (one
  broadcast leg + one shuffle leg, no collect) is pinned by the batch
  test.
- q303 partition pruning — orders re-laid-out hive-partitioned by
  order month (written once to a size-tagged /tmp cache), joined to a
  selective month dim: Catalyst's dynamic partition pruning turns the
  dim filter into a runtime partition filter on the fact scan — the
  100 TB "scan 3 of 80 months, not all" shape. Oracle replays the
  join over the original un-partitioned parquet.
- q304 AMS F2 — the Alon-Matias-Szegedy second-moment sketch: 16
  md5-signed estimators, each an exact BIGINT sum over per-key
  frequencies, squared and averaged with ONE double division, beside
  the exact F2 (sum of squared frequencies) — sketch grades itself,
  q175-style. Both engines reproduce every integer bit-for-bit.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_tables
from .catalog import QueryDef

# q301: capped random walks ----------------------------------------------------

CAP_DEGREE = 16
CAP_WALK_LEN = 4


def q301_capped_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-seeded walks over the co-purchase graph with the explicit
    per-node adjacency cap (max_degree=16 — binding on every node),
    summarized per step (exact node_sum checksum), with the
    hot_degrees audit (n_hot_nodes, dropped_total) attached as 1-row
    broadcast columns — cap, walk, and drop report all under one
    oracle."""
    from ..operators.graph import hot_degrees, random_walks
    from .catalog_batch18 import _edges

    edges = _edges(spark, sf_dir)
    walks = random_walks(edges, length=CAP_WALK_LEN, max_degree=CAP_DEGREE)
    summary = walks.groupBy("step").agg(
        F.count("*").cast("long").alias("n_walks"),
        F.count_distinct("node").cast("long").alias("n_distinct_nodes"),
        F.sum("node").cast("long").alias("node_sum"),
    )
    audit = hot_degrees(edges, CAP_DEGREE).agg(
        F.count("*").cast("long").alias("n_hot_nodes"),
        F.coalesce(F.sum("dropped"), F.lit(0)).cast("long").alias(
            "dropped_total"
        ),
    )
    return summary.crossJoin(F.broadcast(audit))


def _capped_walk_oracle() -> str:
    from .catalog_batch18 import _EDGES_SQL

    score = (
        "('0x' || substr(md5('walk:' || s{p}.walk_id || ':{t}:' || c.dst),"
        " 1, 15))::BIGINT"
    )
    steps = []
    for t in range(1, CAP_WALK_LEN + 1):
        sc = score.format(p=t - 1, t=t)
        steps.append(
            f"""s{t} AS (
  SELECT walk_id, dst AS cur FROM (
    SELECT s{t - 1}.walk_id, c.dst,
           ROW_NUMBER() OVER (PARTITION BY s{t - 1}.walk_id
                              ORDER BY {sc}, c.dst) AS rn
    FROM s{t - 1} JOIN capped c ON s{t - 1}.cur = c.src) r WHERE rn = 1)"""
        )
    all_steps = ",\n".join(steps)
    unions = "\nUNION ALL ".join(
        f"SELECT walk_id, {t} AS step, cur AS node FROM s{t}"
        for t in range(0, CAP_WALK_LEN + 1)
    )
    return f"""
WITH {_EDGES_SQL},
sym AS (SELECT src, dst FROM edges
        UNION ALL SELECT dst AS src, src AS dst FROM edges),
capped AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           ROW_NUMBER() OVER (PARTITION BY src
                              ORDER BY md5('walk:' || src || ':' || dst),
                                       dst) AS rn
    FROM sym) k WHERE rn <= {CAP_DEGREE}),
s0 AS (SELECT DISTINCT src AS walk_id, src AS cur FROM sym),
{all_steps},
walks AS ({unions}),
summary AS (
  SELECT CAST(step AS BIGINT) AS step,
         CAST(COUNT(*) AS BIGINT) AS n_walks,
         CAST(COUNT(DISTINCT node) AS BIGINT) AS n_distinct_nodes,
         CAST(SUM(node) AS BIGINT) AS node_sum
  FROM walks GROUP BY step),
audit AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_hot_nodes,
         CAST(COALESCE(SUM(d - {CAP_DEGREE}), 0) AS BIGINT)
           AS dropped_total
  FROM (SELECT src, COUNT(*) AS d FROM sym GROUP BY src) t
  WHERE d > {CAP_DEGREE})
SELECT step, n_walks, n_distinct_nodes, node_sum,
       n_hot_nodes, dropped_total
FROM summary CROSS JOIN audit
"""


# q302: skew split join ----------------------------------------------------------

SKEW_RATIO = 0.01


def _skew_key(col: str) -> F.Column:
    # ~30% of rows collapse onto surrogate key 0 (the classic
    # null-surrogate / "unknown" hot key); the rest stay unique
    return (
        F.when(F.col(col) % 10 < 3, F.lit(0))
        .otherwise(F.col(col))
        .cast("long")
    )


def q302_skew_split_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact(lineitem)-to-dim join on a 30%-hot surrogate key through
    the skew split join (hot keys broadcast, cold keys shuffled),
    aggregated per return flag with exact integer measures, plus the
    hot-key routing audit as 1-row broadcast columns. The oracle is
    the plain inner join — exactness of the split is the claim."""
    from ..operators.skewjoin import hot_join_keys, skew_split_join

    t = load_tables(spark, sf_dir, ["lineitem", "orders"])
    left = t["lineitem"].select(
        _skew_key("l_orderkey").alias("k"),
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("qty"),
    )
    right = (
        t["orders"]
        .select(_skew_key("o_orderkey").alias("k"))
        .groupBy("k")
        .agg(F.count("*").cast("long").alias("n_orders"))
    )
    joined = skew_split_join(left, right, "k", max_key_ratio=SKEW_RATIO)
    audit = hot_join_keys(left, "k", max_key_ratio=SKEW_RATIO).agg(
        F.count("*").cast("long").alias("n_hot_keys"),
        F.coalesce(F.sum("n_rows"), F.lit(0)).cast("long").alias(
            "hot_rows"
        ),
    )
    summary = joined.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.col("qty") * F.col("n_orders")).cast("long").alias(
            "qty_weighted"
        ),
        F.count_distinct("k").cast("long").alias("n_keys"),
    )
    return summary.crossJoin(F.broadcast(audit))


ORACLE_Q302 = f"""
WITH lkey AS (
  SELECT CASE WHEN l_orderkey % 10 < 3 THEN 0 ELSE l_orderkey END AS k,
         l_returnflag, CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem),
rkey AS (
  SELECT CASE WHEN o_orderkey % 10 < 3 THEN 0 ELSE o_orderkey END AS k,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1),
audit AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_hot_keys,
         CAST(COALESCE(SUM(c), 0) AS BIGINT) AS hot_rows
  FROM (SELECT k, COUNT(*) AS c FROM lkey GROUP BY k) f
  CROSS JOIN (SELECT COUNT(*) AS n FROM lkey) t
  WHERE c > {SKEW_RATIO} * n)
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(qty * n_orders) AS BIGINT) AS qty_weighted,
       CAST(COUNT(DISTINCT k) AS BIGINT) AS n_keys,
       n_hot_keys, hot_rows
FROM lkey JOIN rkey USING (k) CROSS JOIN audit
GROUP BY l_returnflag, n_hot_keys, hot_rows
"""


# q303: dynamic partition pruning ------------------------------------------------

DPP_MONTHS = ("1995-01", "1995-02", "1995-03")


def partitioned_orders_dir(spark: SparkSession, sf_dir: str) -> str:
    """Orders re-laid-out hive-partitioned by order month — written
    ONCE per scale factor into a tagged /tmp cache (the layout a
    100 TB warehouse would maintain natively; the cache only exists
    because the driver's testdata is immutable plain parquet)."""
    tag = Path(sf_dir.rstrip("/")).name
    out = Path(
        os.environ.get("SPARK_GRAFT_DPP_DIR", f"/tmp/spark_graft_dpp_{tag}")
    )
    done = out / "_DONE"
    if not done.exists():
        orders = load_tables(spark, sf_dir, ["orders"])["orders"]
        (
            orders.withColumn(
                "o_month", F.date_format("o_orderdate", "yyyy-MM")
            )
            .repartition("o_month")
            .write.mode("overwrite")
            .partitionBy("o_month")
            .parquet(str(out / "orders"))
        )
        done.touch()
    return str(out / "orders")


def q303_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order rollup for the quarter a selective dim picks out:
    the fact scan is the hive-partitioned layout, the dim is the
    distinct shipped months of early 1995 — Catalyst's dynamic
    partition pruning converts the dim into a runtime partition
    filter, so the fact reads 3 partitions, not ~80 (asserted on the
    physical plan by the batch test). Oracle replays the same join on
    the original un-partitioned parquet."""
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    # explicit schema (r13 empty-input sweep): a zero-row source writes
    # a footerless partitioned dir, and schema inference then fails the
    # read (UNABLE_TO_INFER_SCHEMA). The schema is known — the orders
    # table plus the o_month partition column — and passing it keeps
    # the empty case a clean 0-row result; partition discovery and
    # dynamic pruning are unaffected (pinned by the plan test).
    fact_schema = orders.withColumn(
        "o_month", F.date_format("o_orderdate", "yyyy-MM")
    ).schema
    fact = spark.read.schema(fact_schema).parquet(
        partitioned_orders_dir(spark, sf_dir)
    )
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    dim = (
        li.select(F.date_format("l_shipdate", "yyyy-MM").alias("month"))
        .where(F.col("month").isin(*DPP_MONTHS))
        .distinct()
    )
    return (
        fact.join(dim, fact["o_month"] == dim["month"])
        .groupBy("month")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


ORACLE_Q303 = """
WITH dim AS (
  SELECT DISTINCT strftime(l_shipdate, '%Y-%m') AS month FROM lineitem
  WHERE strftime(l_shipdate, '%Y-%m') IN ('1995-01', '1995-02', '1995-03'))
SELECT month,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders JOIN dim ON strftime(o_orderdate, '%Y-%m') = dim.month
GROUP BY month
"""


# q304: AMS F2 sketch ------------------------------------------------------------

F2_ESTIMATORS = 16


def q304_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second frequency moment of lineitem part keys: 16 AMS
    estimators (sign = low bit of md5('f2:i:key'), S_i = Σ f_x·s_i(x)
    exact BIGINT), estimate = Σ S_i² / 16 with one double division,
    beside the exact F2 — the self-grading sketch pattern (q175). At
    100 TB the estimator table is O(keys × 16) map-side rows folding
    into 16 partial sums; the exact column is the part that wouldn't
    survive, which is the point."""
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    freqs = li.groupBy("l_partkey").agg(
        F.count("*").cast("long").alias("f")
    )
    est = freqs.select(
        "l_partkey",
        "f",
        F.explode(
            F.sequence(F.lit(0), F.lit(F2_ESTIMATORS - 1))
        ).alias("i"),
    )
    bit = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit("f2"), F.col("i"), F.col("l_partkey")
                    )
                ),
                1,
                1,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    sign = (F.lit(1) - F.lit(2) * bit).cast("long")
    sums = est.groupBy("i").agg(
        F.sum(F.col("f") * sign).cast("long").alias("S")
    )
    estimate = sums.agg(
        F.round(
            F.sum(F.col("S") * F.col("S")).cast("long")
            / F.lit(float(F2_ESTIMATORS)),
            4,
        ).alias("est_f2")
    )
    exact = freqs.agg(
        F.sum(F.col("f") * F.col("f")).cast("long").alias("exact_f2")
    )
    return estimate.crossJoin(F.broadcast(exact)).select(
        "est_f2",
        "exact_f2",
        F.round(
            F.abs(F.col("est_f2") - F.col("exact_f2"))
            / F.col("exact_f2"),
            6,
        ).alias("rel_error"),
    )


ORACLE_Q304 = f"""
WITH freqs AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS f
  FROM lineitem GROUP BY l_partkey),
est AS (
  SELECT i.i, freqs.l_partkey, freqs.f,
         1 - 2 * (('0x' || substr(md5('f2:' || i.i || ':' || l_partkey),
                   1, 1))::BIGINT % 2) AS s
  FROM freqs CROSS JOIN
       (SELECT unnest(generate_series(0, {F2_ESTIMATORS - 1})) AS i) i),
sums AS (
  SELECT i, CAST(SUM(f * s) AS BIGINT) AS S FROM est GROUP BY i),
estimate AS (
  SELECT ROUND(CAST(SUM(S * S) AS BIGINT) / {float(F2_ESTIMATORS)}, 4)
           AS est_f2
  FROM sums),
exact AS (
  SELECT CAST(SUM(f * f) AS BIGINT) AS exact_f2 FROM freqs)
SELECT est_f2, exact_f2,
       ROUND(ABS(est_f2 - exact_f2) / exact_f2, 6) AS rel_error
FROM estimate CROSS JOIN exact
"""


ORACLE_Q301 = None  # built lazily in batch64_registry (imports batch18)


def batch64_registry() -> list[QueryDef]:
    return [
        QueryDef(
            "q301_capped_walks",
            q301_capped_walks,
            _capped_walk_oracle(),
            "hash-top-k capped walks + hot_degrees audit vs SQL replay",
        ),
        QueryDef(
            "q302_skew_split_join",
            q302_skew_split_join,
            ORACLE_Q302,
            "hot-key broadcast / cold-key shuffle split join vs plain join",
        ),
        QueryDef(
            "q303_partition_pruning",
            q303_partition_pruning,
            ORACLE_Q303,
            "dynamic partition pruning over month-partitioned orders",
        ),
        QueryDef(
            "q304_ams_f2",
            q304_ams_f2,
            ORACLE_Q304,
            "AMS second-moment sketch vs exact F2, md5-signed estimators",
        ),
    ]
