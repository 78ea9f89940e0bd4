"""Batch 44: cross-fact reconciliation, clamped sequential recurrence,
graph-structural similarity, and burst detection.

- q227 fact reconciliation — the order-header vs line-detail audit
  (Σ extendedprice·(1−disc)·(1+tax) vs o_totalprice), cent-exact in
  DECIMAL, reported as a one-row distribution of header−detail
  deltas. The DQ check every warehouse runs between a fact table and
  its rollup.
- q228 clamped running balance — the floor-at-zero inventory/credit
  recurrence ``bal = max(0, bal + Δ)``: order-fixed array fold per
  key (recursions can't ride a window), EXACT integer cents end to
  end — the q139 EWMA layout applied to a non-linear recurrence.
- q229 neighbor-set similarity — structural Jaccard
  |N(a)∩N(b)| / |N(a)∪N(b)| on the co-purchase graph via one wedge
  equi-join + degree attach; the entity-resolution-on-graphs
  primitive (SimRank's first iteration), exact integers.
- q230 burst detection — per-type daily z-score against a trailing
  14-day baseline with integer-exact numerator/variance
  (z = (14·x−Σ)/sqrt(14·Σx²−Σ²) after the n-scaling), one double
  sqrt/division per tested day, bursts at z >= 3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_tables
from .catalog import QueryDef

# ---------------------------------------------------------------------------
# q227: order header vs line detail reconciliation
# ---------------------------------------------------------------------------


def q227_fact_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order: recomputed total from line items vs the stored
    header total, in exact cents (DECIMAL math, no doubles anywhere);
    the output is the one-row delta distribution — exact matches,
    within-a-cent, and the extreme deltas. A header with no lines
    counts as fully unexplained (detail 0)."""
    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    detail = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                F.expr(
                    "CAST(round(l_extendedprice * (1 - l_discount)"
                    " * (1 + l_tax) * 100, 0) AS DECIMAL(38,0))"
                )
            ).alias("_detail_cents")
        )
    )
    per_order = (
        t["orders"]
        .select(
            "o_orderkey",
            F.expr("CAST(o_totalprice * 100 AS DECIMAL(20,0))")
            .cast("long")
            .alias("_hdr_cents"),
        )
        .join(
            detail.withColumnRenamed("l_orderkey", "o_orderkey"),
            on="o_orderkey",
            how="left",
        )
        .select(
            (
                F.col("_hdr_cents")
                - F.coalesce(F.col("_detail_cents").cast("long"), F.lit(0))
            ).alias("_diff")
        )
    )
    return per_order.agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum((F.col("_diff") == 0).cast("long")).cast("long").alias(
            "n_exact"
        ),
        F.sum((F.abs("_diff") <= 1).cast("long")).cast("long").alias(
            "n_within_1c"
        ),
        F.max(F.abs("_diff")).cast("long").alias("max_abs_diff_cents"),
        F.min("_diff").cast("long").alias("min_diff_cents"),
        F.max("_diff").cast("long").alias("max_diff_cents"),
    )


ORACLE_Q227 = """
WITH detail AS (
  SELECT l_orderkey AS o_orderkey,
         SUM(CAST(round(l_extendedprice * (1 - l_discount)
                        * (1 + l_tax) * 100, 0) AS HUGEINT)) AS d
  FROM lineitem GROUP BY 1),
per_order AS (
  SELECT CAST(CAST(o_totalprice * 100 AS DECIMAL(20,0)) AS BIGINT)
           - CAST(COALESCE(d, 0) AS BIGINT) AS diff
  FROM orders LEFT JOIN detail USING (o_orderkey))
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN diff = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_exact,
       CAST(SUM(CASE WHEN abs(diff) <= 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_within_1c,
       CAST(MAX(abs(diff)) AS BIGINT) AS max_abs_diff_cents,
       CAST(MIN(diff) AS BIGINT) AS min_diff_cents,
       CAST(MAX(diff) AS BIGINT) AS max_diff_cents
FROM per_order
"""


# ---------------------------------------------------------------------------
# q228: clamped running balance (floor at zero)
# ---------------------------------------------------------------------------

_DEBIT_TYPES = ("click", "view")  # these event types spend; others earn


def q228_clamped_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user final balance under ``bal = max(0, bal + Δ)`` with
    Δ = +value cents on earning events, −value cents on spending
    events, folded in (ts, event_id) order. The floor makes the
    recurrence non-linear — no prefix-sum trick applies — so it runs
    as the order-fixed array fold (q139's layout), in EXACT integer
    cents: bit-identical across engines, partitionings, and runs."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    delta = F.when(
        F.col("event_type").isin(*_DEBIT_TYPES),
        -F.expr("CAST(value * 100 AS DECIMAL(20,0))").cast("long"),
    ).otherwise(F.expr("CAST(value * 100 AS DECIMAL(20,0))").cast("long"))
    per = (
        ev.select(
            "user_id",
            F.struct(
                F.col("ts").alias("t"),
                F.col("event_id").alias("o"),
                delta.alias("d"),
            ).alias("_e"),
        )
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.array_sort(F.collect_list("_e")).alias("_arr"),
        )
    )
    ds = F.transform(F.col("_arr"), lambda x: x["d"])
    folded = F.aggregate(
        ds,
        F.lit(0).cast("long"),
        lambda acc, x: F.greatest(F.lit(0).cast("long"), acc + x),
    )
    return per.select(
        "user_id", "n_events", folded.alias("balance_cents")
    ).orderBy("user_id")


ORACLE_Q228 = f"""
WITH ev AS (
  SELECT user_id,
         {{'t': ts, 'o': event_id,
           'd': CASE WHEN event_type IN
                  ({", ".join(f"'{t}'" for t in _DEBIT_TYPES)})
                THEN -CAST(CAST(value * 100 AS DECIMAL(20,0)) AS BIGINT)
                ELSE CAST(CAST(value * 100 AS DECIMAL(20,0)) AS BIGINT)
                END}} AS e
  FROM events),
per AS (
  SELECT user_id, COUNT(*) AS n_events, list_sort(list(e)) AS arr
  FROM ev GROUP BY user_id)
SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
       CAST(list_reduce(
         list_prepend(CAST(0 AS BIGINT), list_transform(arr, x -> x.d)),
         (acc, x) -> greatest(CAST(0 AS BIGINT), acc + x)) AS BIGINT)
         AS balance_cents
FROM per
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# q229: neighbor-set structural similarity
# ---------------------------------------------------------------------------

_NODESIM_TOPK = 25


def q229_node_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 co-purchase part pairs by neighbor-set Jaccard
    |N(a)∩N(b)| / |N(a)∪N(b)|: one wedge equi-join on the shared
    neighbor (Σ deg² work — the container cap from the edge build
    bounds the hubs), degrees attached as an O(V) join, exact
    integer micro score, total-order tiebreak."""
    from ..operators.graph import degrees
    from .catalog_batch18 import _edges

    e = _edges(spark, sf_dir).localCheckpoint(eager=False)
    sym = e.select("src", "dst").unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = degrees(e)
    w1 = sym.select(F.col("dst").alias("m"), F.col("src").alias("a"))
    w2 = sym.select(F.col("dst").alias("m"), F.col("src").alias("b"))
    common = (
        w1.join(w2, on="m")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("common"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("deg_b"))
    scored = (
        common.join(da, on="a")
        .join(db, on="b")
        .select(
            F.col("a").alias("part_a"),
            F.col("b").alias("part_b"),
            "common",
            F.expr("(1000000 * common) div (deg_a + deg_b - common)")
            .cast("long")
            .alias("jaccard_micro"),
        )
    )
    return scored.orderBy(
        F.desc("jaccard_micro"), F.asc("part_a"), F.asc("part_b")
    ).limit(_NODESIM_TOPK)


def _oracle_q229() -> str:
    from .catalog_batch18 import _EDGES_SQL

    return f"""
WITH {_EDGES_SQL},
sym AS (
  SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst
  FROM edges),
deg AS (
  SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree
  FROM sym GROUP BY 1),
common AS (
  SELECT w1.src AS a, w2.src AS b, CAST(COUNT(*) AS BIGINT) AS common
  FROM sym w1 JOIN sym w2 ON w1.dst = w2.dst AND w1.src < w2.src
  GROUP BY 1, 2)
SELECT a AS part_a, b AS part_b, common,
       CAST((1000000 * common)
            // (da.degree + db.degree - common) AS BIGINT)
         AS jaccard_micro
FROM common
JOIN deg da ON da.node = a
JOIN deg db ON db.node = b
ORDER BY jaccard_micro DESC, part_a ASC, part_b ASC
LIMIT {_NODESIM_TOPK}
"""


# ---------------------------------------------------------------------------
# q230: burst detection vs trailing baseline
# ---------------------------------------------------------------------------

_BURST_WIN = 14
_BURST_Z = 3.0


def q230_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days whose event count bursts >= 3 sigma above the trailing
    14-observation baseline, per event type. The z-score is computed
    from n-scaled integers — numerator 14·x−Σ and variance
    14·Σx²−Σ² are exact BIGINTs — with ONE double sqrt + division at
    the end (rounded, −0.0-normalized). Baseline windows are
    partitioned per type and row-based over the observed series;
    constant baselines (variance 0) can't burst and are excluded."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").cast("long").alias("x"))
    wb = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-_BURST_WIN, -1)
    )
    based = (
        daily.withColumn("_n", F.count("*").over(wb))
        .withColumn("_s", F.sum("x").over(wb))
        .withColumn("_s2", F.sum(F.expr("x * x")).over(wb))
        .where(F.col("_n") == _BURST_WIN)
        .withColumn(
            "_num", (F.lit(_BURST_WIN) * F.col("x") - F.col("_s")).cast("long")
        )
        .withColumn(
            "_var",
            (
                F.lit(_BURST_WIN) * F.col("_s2") - F.col("_s") * F.col("_s")
            ).cast("long"),
        )
        .where(F.col("_var") > 0)
        .withColumn(
            "z",
            F.round(
                F.col("_num").cast("double")
                / F.sqrt(F.col("_var").cast("double")),
                6,
            )
            + F.lit(0.0),
        )
    )
    return (
        based.where(F.col("z") >= _BURST_Z)
        .select("event_type", "day", "x", "z")
        .orderBy("event_type", "day")
    )


ORACLE_Q230 = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2),
based AS (
  SELECT event_type, day, x,
         COUNT(*) OVER w AS n,
         CAST(SUM(x) OVER w AS BIGINT) AS s,
         CAST(SUM(x * x) OVER w AS BIGINT) AS s2
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN {_BURST_WIN} PRECEDING AND 1 PRECEDING)),
z AS (
  SELECT event_type, day, x,
         round(CAST({_BURST_WIN} * x - s AS DOUBLE)
               / sqrt(CAST({_BURST_WIN} * s2 - s * s AS DOUBLE)), 6)
           + 0.0 AS z
  FROM based
  WHERE n = {_BURST_WIN} AND {_BURST_WIN} * s2 - s * s > 0)
SELECT event_type, day, x, z FROM z
WHERE z >= {_BURST_Z}
ORDER BY event_type, day
"""


def batch44_registry() -> list[QueryDef]:
    return [
        QueryDef("q227_fact_reconciliation", q227_fact_reconciliation,
                 ORACLE_Q227,
                 "header-vs-detail cent-exact reconciliation audit"),
        QueryDef("q228_clamped_balance", q228_clamped_balance,
                 ORACLE_Q228,
                 "floor-at-zero balance via order-fixed integer fold"),
        QueryDef("q229_node_similarity", q229_node_similarity,
                 _oracle_q229(),
                 "neighbor-set Jaccard on the co-purchase graph"),
        QueryDef("q230_burst_detection", q230_burst_detection,
                 ORACLE_Q230,
                 "3-sigma daily bursts vs trailing integer baseline"),
    ]
