"""Batch 35: nonparametric statistics, exactly.

The testing tier a data-quality/experimentation platform runs at
scale, each statistic in exact integer arithmetic (the engine's
portability discipline) so the oracle match is bit-for-bit:

- q205 Wald–Wolfowitz runs test ingredients: runs of above/below-
  median days per series — the randomness screen for residual streaks
  (median from exact percentile; run boundaries via per-series lag).
- q206 Mann–Whitney U: rank-sum with midrank tie handling carried at
  2× scale so tied ranks stay integers; ranks come from the same
  distinct-value prefix pass as q204's KS (one ``global_running_sum``
  over packed per-level counts) — no global window, no floats until
  the final effect-size ratio.
- q207 chi-square independence of event type × ISO weekday: per-cell
  expected counts and chi-square contributions with the expected
  value exact-rational (row·col/n) — numerators in integers, the one
  division per cell pinned to an identical expression on both
  engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_tables
from .catalog import QueryDef
from .catalog_batch27 import _DAILY_SQL, _daily_series

# ---------------------------------------------------------------------------
# q205: runs-test ingredients (above/below median streaks)
# ---------------------------------------------------------------------------


def q205_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per priority: the number of RUNS of above-median vs
    below-median daily order counts (median-equal days are excluded,
    the standard convention), plus both side counts — the
    Wald–Wolfowitz randomness screen. Median is the exact percentile
    (q170's machinery); a run starts wherever the side differs from
    the previous kept day (per-series lag window)."""
    s = _daily_series(spark, sf_dir)
    med = s.groupBy("priority").agg(
        F.percentile("x", 0.5).alias("_med")
    )
    sided = (
        s.join(med, on="priority")
        .where(F.col("x") != F.col("_med"))
        .select(
            "priority", "day",
            (F.col("x") > F.col("_med")).cast("int").alias("side"),
        )
    )
    w = Window.partitionBy("priority").orderBy("day")
    runs = sided.withColumn(
        "_new_run",
        F.when(
            F.lag("side").over(w).isNull()
            | (F.lag("side").over(w) != F.col("side")),
            1,
        ).otherwise(0),
    )
    return runs.groupBy("priority").agg(
        F.sum("_new_run").cast("long").alias("n_runs"),
        F.sum("side").cast("long").alias("n_above"),
        F.sum(F.lit(1) - F.col("side")).cast("long").alias("n_below"),
    )


ORACLE_Q205 = f"""
WITH {_DAILY_SQL},
med AS (
  SELECT priority, quantile_cont(x, 0.5) AS m FROM daily GROUP BY 1),
sided AS (
  SELECT d.priority, d.day,
         CASE WHEN d.x > med.m THEN 1 ELSE 0 END AS side
  FROM daily d JOIN med USING (priority)
  WHERE d.x <> med.m),
runs AS (
  SELECT priority, side,
         CASE WHEN lag(side) OVER (PARTITION BY priority ORDER BY day)
                   IS DISTINCT FROM side THEN 1 ELSE 0 END AS new_run
  FROM sided)
SELECT priority,
  CAST(SUM(new_run) AS BIGINT) AS n_runs,
  CAST(SUM(side) AS BIGINT) AS n_above,
  CAST(SUM(1 - side) AS BIGINT) AS n_below
FROM runs GROUP BY priority
"""


# ---------------------------------------------------------------------------
# q206: Mann-Whitney U with exact midranks
# ---------------------------------------------------------------------------

_MW_YEAR_A = 1995
_MW_YEAR_B = 1996
# Base-10^18 DECIMAL(38,0) lane packing (see catalog_batch34._PACK):
# carry bleed is impossible below 10^18 rows per sample, and ANSI
# decimal arithmetic fails loudly past precision 38 instead of
# silently wrapping like the earlier base-2^31 long packing.
_PACK = 10**18


def q206_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U between the 1995 and 1996 order-price samples,
    tie-correct: per distinct price the midrank is (start + end)/2 —
    carried as start+end (2× scale) so everything stays integer.
    Rank positions come from one distributed prefix pass over packed
    per-level counts (q204's layout). U_a = R_a − n_a(n_a+1)/2 at 2×
    scale; the common-language effect size U_a/(n_a·n_b) is the one
    rounded double."""
    from ..operators.ranking import global_running_sum

    o = load_tables(spark, sf_dir, ["orders"])["orders"].withColumn(
        "_y", F.year("o_orderdate")
    ).where(F.col("_y").isin(_MW_YEAR_A, _MW_YEAR_B))
    cents = F.expr("CAST(o_totalprice * 100 AS DECIMAL(20,0))").cast("long")
    levels = o.groupBy(cents.alias("v")).agg(
        F.sum((F.col("_y") == _MW_YEAR_A).cast("long")).alias("na_v"),
        F.sum((F.col("_y") == _MW_YEAR_B).cast("long")).alias("nb_v"),
    ).select(
        "v", "na_v", "nb_v",
        (
            F.col("na_v").cast("decimal(38,0)") * F.lit(_PACK)
            + F.col("nb_v")
        ).alias("enc"),
    )
    cs = global_running_sum(
        levels, [F.asc("v")], "enc", rsum_col="rs", total_col="tot"
    )
    # rank positions occupied by a level: (end - cnt + 1) .. end with
    # end = rows up to and including the level; midrank*2 = start+end
    # = 2*end - cnt + 1 stays integer
    per = cs.select(
        "na_v", "nb_v",
        F.expr(f"rs div {_PACK}").alias("_ca"),
        (F.col("rs") % _PACK).cast("long").alias("_cb"),
        F.expr(f"tot div {_PACK}").alias("na"),
        (F.col("tot") % _PACK).cast("long").alias("nb"),
    ).withColumn(
        "_end", F.col("_ca") + F.col("_cb")
    ).withColumn(
        "_cnt", F.col("na_v") + F.col("nb_v")
    ).withColumn(
        "_mid2", F.col("_end") * 2 - F.col("_cnt") + 1
    )
    agg = per.groupBy("na", "nb").agg(
        F.sum(F.col("na_v") * F.col("_mid2")).cast("long").alias("ra2")
    )
    u2 = F.col("ra2") - F.col("na") * (F.col("na") + 1)
    return agg.select(
        "na", "nb",
        F.col("ra2").alias("rank_sum_a_2x"),
        u2.cast("long").alias("u_a_2x"),
        F.round(
            u2.cast("double")
            / (F.lit(2.0) * F.col("na").cast("double")
               * F.col("nb").cast("double")),
            6,
        ).alias("effect_size"),
    )


ORACLE_Q206 = f"""
WITH o AS (
  SELECT CAST(CAST(o_totalprice * 100 AS DECIMAL(20,0)) AS BIGINT) AS v,
         year(o_orderdate) AS y
  FROM orders WHERE year(o_orderdate) IN ({_MW_YEAR_A}, {_MW_YEAR_B})),
levels AS (
  SELECT v,
         CAST(SUM(CASE WHEN y = {_MW_YEAR_A} THEN 1 ELSE 0 END) AS BIGINT)
           AS na_v,
         CAST(SUM(CASE WHEN y = {_MW_YEAR_B} THEN 1 ELSE 0 END) AS BIGINT)
           AS nb_v
  FROM o GROUP BY v),
cum AS (
  SELECT na_v, nb_v,
         SUM(na_v + nb_v) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
           AS endp,
         SUM(na_v) OVER () AS na, SUM(nb_v) OVER () AS nb
  FROM levels),
per AS (
  SELECT na, nb, na_v,
         endp * 2 - (na_v + nb_v) + 1 AS mid2
  FROM cum),
agg AS (
  SELECT CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
         CAST(SUM(na_v * mid2) AS BIGINT) AS ra2
  FROM per GROUP BY na, nb)
SELECT na, nb, ra2 AS rank_sum_a_2x,
       CAST(ra2 - na * (na + 1) AS BIGINT) AS u_a_2x,
       round(CAST(ra2 - na * (na + 1) AS DOUBLE)
             / (CAST(2 AS DOUBLE) * CAST(na AS DOUBLE)
                * CAST(nb AS DOUBLE)), 6) AS effect_size
FROM agg
"""


# ---------------------------------------------------------------------------
# q207: chi-square independence (event type x ISO weekday)
# ---------------------------------------------------------------------------


def q207_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is event type independent of weekday? Per (type, weekday) cell:
    observed count, expected = row_total·col_total/n (reported in
    micro-units via exact integer division), and the chi-square
    contribution (n·obs − row·col)² / (n·row·col) — numerator exact
    integer, ONE double division per cell, identical expression both
    engines."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    # checkpoint the contingency cells: they feed FOUR consumers (row
    # totals, column totals, grand total, the join base) and without
    # materialization each consumer would re-run the full events scan
    # + groupBy — 4x IO at 100 TB for a |types|x7-row table
    cells = ev.groupBy(
        "event_type", F.weekday("ts").cast("long").alias("dow")
    ).agg(F.count("*").cast("long").alias("obs")).localCheckpoint(
        eager=False
    )
    rows = cells.groupBy("event_type").agg(
        F.sum("obs").cast("long").alias("_row")
    )
    colsum = cells.groupBy("dow").agg(
        F.sum("obs").cast("long").alias("_col")
    )
    n = cells.agg(F.sum("obs").cast("long").alias("_n"))
    j = (
        cells.join(rows, on="event_type")
        .join(colsum, on="dow")
        .crossJoin(F.broadcast(n))
    )
    # the deviation is exact in BIGINT; cast BEFORE squaring so the
    # square lives in IEEE doubles on both engines (a raw long square
    # wraps silently on Spark and errors on DuckDB past ~3e9 —
    # invariant 23's divergent-failure class)
    num_d = (
        F.col("_n") * F.col("obs") - F.col("_row") * F.col("_col")
    ).cast("double")
    # the denominator factors widen to double BEFORE multiplying —
    # n·r·c in raw BIGINT is the same invariant-23 hazard as the
    # numerator square (wraps on Spark, errors on DuckDB at ~7M rows)
    den = (
        F.col("_n").cast("double")
        * F.col("_row").cast("double")
        * F.col("_col").cast("double")
    )
    contrib = num_d * num_d / den / F.col("_n").cast("double")
    return j.select(
        "event_type", "dow", "obs",
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * _row * _col)"
            " div _n div _n AS BIGINT)"
        ).alias("expected_micro"),
        F.round(contrib, 6).alias("chi2_contrib"),
    )


ORACLE_Q207 = """
WITH cells AS (
  SELECT event_type, CAST(isodow(ts) - 1 AS BIGINT) AS dow,
         CAST(COUNT(*) AS BIGINT) AS obs
  FROM events GROUP BY 1, 2),
rws AS (
  SELECT event_type, CAST(SUM(obs) AS BIGINT) AS r FROM cells GROUP BY 1),
cls AS (
  SELECT dow, CAST(SUM(obs) AS BIGINT) AS c FROM cells GROUP BY 1),
tot AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM cells)
SELECT cells.event_type, cells.dow, cells.obs,
  CAST(((CAST(1000000 AS HUGEINT) * r * c) // n) // n AS BIGINT)
    AS expected_micro,
  round(
    CAST(n * obs - r * c AS DOUBLE) * CAST(n * obs - r * c AS DOUBLE)
    / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE) * CAST(c AS DOUBLE))
    / CAST(n AS DOUBLE), 6) AS chi2_contrib
FROM cells
JOIN rws USING (event_type)
JOIN cls USING (dow)
CROSS JOIN tot
"""


def batch35_registry() -> list[QueryDef]:
    return [
        QueryDef("q205_runs_test", q205_runs_test, ORACLE_Q205,
                 "Wald-Wolfowitz runs-of-sign ingredients per series"),
        QueryDef("q206_mann_whitney", q206_mann_whitney, ORACLE_Q206,
                 "Mann-Whitney U with exact 2x-scaled midranks"),
        QueryDef("q207_chi2_independence", q207_chi2_independence,
                 ORACLE_Q207,
                 "chi-square independence, integer-exact cells"),
    ]
