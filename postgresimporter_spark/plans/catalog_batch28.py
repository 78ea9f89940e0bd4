"""Batch 28: integer-exact computational geometry, robust regression,
grain-rollup aggregate reuse, and sequence/seasonality analytics.

- q183 point-in-polygon containment join: the even-odd ray cast in
  pure integer arithmetic (``spatial.point_in_polygon``) — geofencing
  / region assignment with a bit-exact oracle, the polygon member of
  the engine's spatial tier (radius join q168).
- q184 Theil-Sen robust trend: median of pairwise slopes — the
  estimator that shrugs off the outliers that break q101's least
  squares. Pairs are quadratic in the CALENDAR length (bounded),
  never in row count — the scale note that makes it shippable.
- q185 grain-rollup reuse: monthly answers merged purely from stored
  daily partial states (``incremental.merge_partials``) — the
  materialized-rollup half of q112's incremental story; the oracle
  recomputes from base facts and must agree exactly.
- q186 first-order Markov transition matrix over user event streams —
  the next-event model behind session analytics, in integer micro
  probabilities.
- q187 day-of-week seasonality index per series — the periodic
  profile (avg-per-weekday over global avg) in one exact integer
  division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_tables
from .catalog import QueryDef
from .catalog_batch27 import _DAILY_SQL, _daily_series

# ---------------------------------------------------------------------------
# q183: point-in-polygon containment (integer ray cast)
# ---------------------------------------------------------------------------

_GRID = 1000  # same synthetic md5 plane as q168

# (poly_id, vertices) — simple polygons on the 1000x1000 integer plane
POLYGONS: list[tuple[int, list[tuple[int, int]]]] = [
    (1, [(100, 100), (400, 120), (250, 380)]),
    (2, [(500, 500), (900, 520), (880, 900), (520, 880)]),
    (3, [(50, 600), (300, 620), (350, 850), (150, 950), (20, 800)]),
    (4, [(700, 100), (800, 100), (800, 200), (700, 200)]),
]


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import hash_bucket

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    return ev.where(
        (F.col("event_type") == "error") & (F.col("event_id") < 4000)
    ).select(
        "event_id",
        hash_bucket(F.col("event_id").cast("string"), _GRID).alias("x"),
        hash_bucket(
            F.concat(F.lit("y:"), F.col("event_id").cast("string")), _GRID
        ).alias("y"),
    )


def q183_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-polygon containment rollup of the q168 point cloud: count
    and id-checksum of the points inside each of four literal
    geofences, via the exact integer even-odd ray cast — a bit-exact
    geometry answer with no epsilon policy to disagree on."""
    from ..operators.spatial import point_in_polygon

    hits = point_in_polygon(
        _points(spark, sf_dir), POLYGONS, "x", "y", "event_id"
    )
    return hits.groupBy("poly_id").agg(
        F.count("*").cast("long").alias("n_inside"),
        F.sum("event_id").cast("long").alias("id_checksum"),
    )


def _oracle_q183() -> str:
    from ..operators.spatial import polygon_edges_values_sql

    return f"""
WITH pts AS (
  SELECT event_id,
    ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
      % {_GRID} AS x,
    ('0x' || substr(md5('y:' || CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
      % {_GRID} AS y
  FROM events WHERE event_type = 'error' AND event_id < 4000),
edges(poly_id, x1, y1, x2, y2) AS (
  VALUES {polygon_edges_values_sql(POLYGONS)}),
cr AS (
  SELECT e.poly_id, p.event_id,
    SUM(CASE WHEN (e.y1 > p.y) <> (e.y2 > p.y)
              AND (CASE
                     WHEN e.y2 > e.y1 THEN
                       (e.x2 - e.x1) * (p.y - e.y1)
                       - (p.x - e.x1) * (e.y2 - e.y1) > 0
                     WHEN e.y2 < e.y1 THEN
                       (e.x2 - e.x1) * (p.y - e.y1)
                       - (p.x - e.x1) * (e.y2 - e.y1) < 0
                     ELSE FALSE END)
         THEN 1 ELSE 0 END) AS crossings
  FROM pts p CROSS JOIN edges e
  GROUP BY e.poly_id, p.event_id)
SELECT CAST(poly_id AS BIGINT) AS poly_id,
       CAST(COUNT(*) AS BIGINT) AS n_inside,
       CAST(SUM(event_id) AS BIGINT) AS id_checksum
FROM cr WHERE crossings % 2 = 1
GROUP BY poly_id
"""


# ---------------------------------------------------------------------------
# q184: Theil-Sen robust slope
# ---------------------------------------------------------------------------

_TS_YEAR = 1995


def q184_theilsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen slope of each priority's 1995 daily order counts: the
    median of all pairwise slopes (x_j − x_i)/(t_j − t_i) — the
    breakdown-point-0.29 robust alternative to q101's least squares.
    The pair join is quadratic in the CALENDAR (≤365 days/series —
    bounded regardless of row count at any SF), keyed per series so no
    global blowup exists; slopes are single IEEE divisions of exact
    integers, the median the same interpolated percentile both engines
    define identically."""
    s = _daily_series(spark, sf_dir).where(
        F.year("day") == _TS_YEAR
    )
    t = F.datediff(F.col("day"), F.lit(f"{_TS_YEAR}-01-01").cast("date"))
    s = s.select("priority", t.alias("t"), "x")
    a = s.alias("a")
    b = s.alias("b")
    pairs = a.join(b, on="priority").where(F.col("a.t") < F.col("b.t"))
    slope = (
        (F.col("b.x") - F.col("a.x")).cast("double")
        / (F.col("b.t") - F.col("a.t")).cast("double")
    )
    return (
        pairs.select("priority", slope.alias("_s"))
        .groupBy("priority")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.round(F.percentile("_s", 0.5), 6).alias("slope_med"),
        )
    )


ORACLE_Q184 = f"""
WITH {_DAILY_SQL},
s AS (
  SELECT priority,
         date_diff('day', DATE '{_TS_YEAR}-01-01', day) AS t, x
  FROM daily WHERE year(day) = {_TS_YEAR}),
pairs AS (
  SELECT a.priority,
         CAST(b.x - a.x AS DOUBLE) / CAST(b.t - a.t AS DOUBLE) AS s
  FROM s a JOIN s b ON a.priority = b.priority AND a.t < b.t)
SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       round(quantile_cont(s, 0.5), 6) AS slope_med
FROM pairs GROUP BY priority
"""


# ---------------------------------------------------------------------------
# q185: grain-rollup reuse from partial states
# ---------------------------------------------------------------------------


def q185_rollup_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly per-returnflag revenue answered WITHOUT touching the fact
    table twice: daily partial states (count, sum) roll up to months
    by merging states (``incremental.merge_partials``) — the stored-
    rollup pattern where a 100 TB history is aggregated once at fine
    grain and every coarser report is a merge over O(keys) state rows.
    The oracle recomputes monthly from base facts; decomposable
    integer/decimal states make the merge bit-identical."""
    from ..operators.incremental import merge_partials, partial_aggregate

    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    rev = (
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    ).cast("decimal(20,4)")
    daily = partial_aggregate(
        li.select(
            "l_returnflag",
            F.date_trunc("day", F.col("l_shipdate")).alias("day"),
            rev.alias("rev"),
        ),
        ["l_returnflag", "day"],
        {"n_rows": ("count", "rev"), "total": ("sum", "rev")},
    )
    monthly = merge_partials(
        [daily.withColumn("month", F.date_trunc("month", F.col("day")))],
        ["l_returnflag", "month"],
        {"n_rows": ("sum", "n_rows"), "total": ("sum", "total")},
    )
    return monthly.select(
        "l_returnflag",
        "month",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("total").cast("double").alias("total"),
        F.round(
            F.col("total").cast("double") / F.col("n_rows").cast("double"), 6
        ).alias("avg_rev"),
    )


ORACLE_Q185 = """
WITH base AS (
  SELECT l_returnflag,
         CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS month,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,4)) AS rev
  FROM lineitem)
SELECT l_returnflag, month,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(rev) AS DOUBLE) AS total,
  round(CAST(SUM(rev) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS avg_rev
FROM base GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# q186: Markov transition matrix over user event streams
# ---------------------------------------------------------------------------


def q186_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user event streams:
    P(next event type | current), counts exact and probabilities in
    integer micro-units (1e6·n div row_total — no float division).
    One per-user ordered window (ts, event_id tiebreak) for the lead,
    then two bounded aggregations: |types|² output rows."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").cast("long").alias("n"))
    )
    totals = trans.groupBy("from_type").agg(
        F.sum("n").cast("long").alias("_total")
    )
    return (
        trans.join(totals, on="from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.expr("1000000 * n div _total").cast("long").alias("p_micro"),
        )
    )


ORACLE_Q186 = """
WITH seq AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events),
trans AS (
  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
tot AS (
  SELECT from_type, CAST(SUM(n) AS BIGINT) AS total
  FROM trans GROUP BY 1)
SELECT t.from_type, t.to_type, t.n,
       CAST(1000000 * t.n // tt.total AS BIGINT) AS p_micro
FROM trans t JOIN tot tt USING (from_type)
"""


# ---------------------------------------------------------------------------
# q187: day-of-week seasonality index
# ---------------------------------------------------------------------------


def q187_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile per priority: the classic
    periodic index avg(weekday) / avg(all), folded into ONE exact
    integer division (sum_dow · days_all · 1e6 div (days_dow · total))
    — weekday numbering pinned to ISO Monday=0 on both engines."""
    s = _daily_series(spark, sf_dir)
    per_dow = s.groupBy(
        "priority", F.weekday("day").cast("long").alias("dow")
    ).agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("x").cast("long").alias("dow_total"),
    )
    overall = s.groupBy("priority").agg(
        F.count("*").cast("long").alias("_days_all"),
        F.sum("x").cast("long").alias("_total"),
    )
    return (
        per_dow.join(overall, on="priority")
        .select(
            "priority",
            "dow",
            "n_days",
            "dow_total",
            F.expr(
                "(dow_total * _days_all * 1000000) div (n_days * _total)"
            ).cast("long").alias("idx_micro"),
        )
    )


ORACLE_Q187 = f"""
WITH {_DAILY_SQL},
per_dow AS (
  SELECT priority, CAST(isodow(day) - 1 AS BIGINT) AS dow,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(x) AS BIGINT) AS dow_total
  FROM daily GROUP BY 1, 2),
overall AS (
  SELECT priority, CAST(COUNT(*) AS BIGINT) AS days_all,
         CAST(SUM(x) AS BIGINT) AS total
  FROM daily GROUP BY 1)
SELECT p.priority, p.dow, p.n_days, p.dow_total,
       CAST((p.dow_total * o.days_all * 1000000)
            // (p.n_days * o.total) AS BIGINT) AS idx_micro
FROM per_dow p JOIN overall o USING (priority)
"""


def batch28_registry() -> list[QueryDef]:
    return [
        QueryDef("q183_point_in_polygon", q183_point_in_polygon,
                 _oracle_q183(),
                 "integer ray-cast point-in-polygon containment"),
        QueryDef("q184_theilsen", q184_theilsen, ORACLE_Q184,
                 "Theil-Sen robust slope (median of pairwise slopes)"),
        QueryDef("q185_rollup_reuse", q185_rollup_reuse, ORACLE_Q185,
                 "monthly rollup merged from stored daily states"),
        QueryDef("q186_markov_transitions", q186_markov_transitions,
                 ORACLE_Q186,
                 "Markov event-transition matrix, micro probabilities"),
        QueryDef("q187_seasonality", q187_seasonality, ORACLE_Q187,
                 "day-of-week seasonality index, one exact division"),
    ]
