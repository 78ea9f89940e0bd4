"""Batch 57: bootstrap difference CIs, robust means, rank
correlation, and lift curves.

- q276 bootstrap difference-in-means — the A/B answer q237's
  machinery was built for: the SAME 64 Poisson replica weights drive
  both periods' weighted means, the replica DIFFERENCES sort, and
  the nearest-rank 2.5/97.5% bound the effect. One pass, one 128-key
  aggregation; an interval excluding 0 is the significance readout.
- q277 trimmed/winsorized mean — robust location via global ranks
  (one distributed prefix pass): drop the outer 5% each side for the
  trimmed mean, clamp them to the cut values for the winsorized
  mean — both exact integer sums over rank predicates.
- q278 Spearman rank correlation — Pearson over the two columns'
  global ranks (average-rank ties, carried 2x-scaled as exact
  integers from per-level prefix passes — the q206 midrank
  machinery); completes the correlation family next to q260
  (Pearson) and q236 (Kendall).
- q279 lift curve — the model-eval gains table: orders sorted by a
  score (discount proxy) into deciles via the distributed prefix
  pass, per-decile positive rate vs the base rate = lift, with
  cumulative gains. Exact integers until the two ratios.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ranking import global_running_sum
from ..sources.parquet import load_tables
from .catalog import QueryDef
from .catalog_batch47 import _BOOT_B, _POIS_CASE_SQL, _poisson_weight_spark

# ---------------------------------------------------------------------------
# q276: Poisson-bootstrap CI for the difference in means
# ---------------------------------------------------------------------------

_BD_YEAR_A, _BD_YEAR_B = 1995, 1996


def q276_bootstrap_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap CI for mean(1996) − mean(1995) order price:
    per (replica, year) exact weighted sums from the q237 universal-
    family weights, replica diffs of the rounded means, nearest-rank
    bounds. The only shuffle is the 128-key aggregation."""
    o = load_tables(spark, sf_dir, ["orders"])["orders"].withColumn(
        "_y", F.year("o_orderdate")
    ).where(F.col("_y").isin(_BD_YEAR_A, _BD_YEAR_B))
    cents = F.expr("CAST(round(o_totalprice * 100, 0) AS DECIMAL(20,0))").cast(
        "long"
    )
    digest = F.md5(F.concat(F.lit("pb:"), F.col("o_orderkey").cast("string")))
    base = o.select(
        "_y",
        cents.alias("cents"),
        F.conv(F.substring(digest, 1, 15), 16, 10).cast("long").alias("h1"),
        F.conv(F.substring(digest, 16, 13), 16, 10).cast("long").alias("h2"),
    )
    rep = base.select(
        "_y",
        "cents",
        "h1",
        "h2",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
    )
    u = (F.col("h1") + F.col("b") * F.col("h2")) % F.lit(1 << 60)
    w = _poisson_weight_spark(u)
    per = (
        rep.select(
            "b", "_y", w.alias("w"), (w * F.col("cents")).alias("wc")
        )
        .groupBy("b", "_y")
        .agg(
            F.sum("w").cast("long").alias("n"),
            F.sum("wc").cast("long").alias("s"),
        )
        .where(F.col("n") > 0)
        .select(
            "b",
            "_y",
            (
                F.round(F.col("s").cast("double") / F.col("n").cast("double"), 6)
                + F.lit(0.0)
            ).alias("mean_b"),
        )
    )
    diffs = (
        per.groupBy("b")
        .pivot("_y", [_BD_YEAR_A, _BD_YEAR_B])
        .agg(F.first("mean_b"))
        .where(
            F.col(str(_BD_YEAR_A)).isNotNull()
            & F.col(str(_BD_YEAR_B)).isNotNull()
        )
        .select(
            (
                F.round(
                    F.col(str(_BD_YEAR_B)) - F.col(str(_BD_YEAR_A)), 6
                )
                + F.lit(0.0)
            ).alias("diff")
        )
    )
    g = diffs.agg(
        F.sort_array(F.collect_list("diff")).alias("ds"),
        F.count("*").cast("long").alias("n_replicas"),
    )
    lo_i = math.ceil(0.025 * _BOOT_B)
    hi_i = math.ceil(0.975 * _BOOT_B)
    return g.select(
        "n_replicas",
        F.element_at("ds", lo_i).alias("diff_lo_cents"),
        F.element_at("ds", hi_i).alias("diff_hi_cents"),
        (
            F.element_at("ds", lo_i) > 0
        ).alias("significant_positive"),
    )


ORACLE_Q276 = f"""
WITH base AS (
  SELECT year(o_orderdate) AS y,
         CAST(CAST(round(o_totalprice * 100, 0) AS DECIMAL(20,0)) AS BIGINT)
           AS cents,
         ('0x' || substr(md5('pb:' || CAST(o_orderkey AS VARCHAR)),
                         1, 15))::BIGINT AS h1,
         ('0x' || substr(md5('pb:' || CAST(o_orderkey AS VARCHAR)),
                         16, 13))::BIGINT AS h2
  FROM orders WHERE year(o_orderdate) IN ({_BD_YEAR_A}, {_BD_YEAR_B})),
rep AS (
  SELECT y, cents, b, (h1 + b * h2) % {1 << 60} AS u
  FROM base, generate_series(0, {_BOOT_B - 1}) AS t(b)),
weighted AS (SELECT b, y, {_POIS_CASE_SQL} AS w, cents FROM rep),
per AS (
  SELECT b, y, round(CAST(SUM(w * cents) AS DOUBLE) / SUM(w), 6) + 0.0
           AS mean_b
  FROM weighted GROUP BY b, y HAVING SUM(w) > 0),
diffs AS (
  SELECT round(b2.mean_b - b1.mean_b, 6) + 0.0 AS diff
  FROM per b1 JOIN per b2 ON b1.b = b2.b
  WHERE b1.y = {_BD_YEAR_A} AND b2.y = {_BD_YEAR_B}),
g AS (
  SELECT list_sort(list(diff)) AS ds, CAST(COUNT(*) AS BIGINT) AS n_replicas
  FROM diffs)
SELECT n_replicas,
       ds[{math.ceil(0.025 * _BOOT_B)}] AS diff_lo_cents,
       ds[{math.ceil(0.975 * _BOOT_B)}] AS diff_hi_cents,
       ds[{math.ceil(0.025 * _BOOT_B)}] > 0 AS significant_positive
FROM g
"""


# ---------------------------------------------------------------------------
# q277: trimmed and winsorized means
# ---------------------------------------------------------------------------

_TRIM_PCT = 5


def q277_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%-each-side trimmed and winsorized means of order price:
    global ranks from one prefix pass; the trimmed mean sums the
    middle 90% exactly; the winsorized mean clamps the tails to the
    cut values (the rank-boundary rows, selected exactly). All
    integer sums; two final divisions."""
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    cents = F.expr("CAST(round(o_totalprice * 100, 0) AS DECIMAL(20,0))").cast(
        "long"
    )
    ranked = global_running_sum(
        o.select("o_orderkey", cents.alias("c")).withColumn(
            "_one", F.lit(1).cast("long")
        ),
        [F.asc("c"), F.asc("o_orderkey")],
        "_one",
        idx_col="_rk",
        rsum_col="_rs",
        total_col="_N",
    ).localCheckpoint(eager=False)
    lo = F.ceil(F.lit(_TRIM_PCT / 100.0) * F.col("_N")).cast("long")
    hi = (F.col("_N") - lo).cast("long")
    mid = ranked.where((F.col("_rk") > lo) & (F.col("_rk") <= hi))
    core = mid.agg(
        F.count("*").cast("long").alias("n_mid"),
        F.sum("c").cast("long").alias("s_mid"),
        F.min("c").cast("long").alias("lo_cut"),
        F.max("c").cast("long").alias("hi_cut"),
    )
    tails = ranked.agg(
        F.count("*").cast("long").alias("n_all"),
        F.sum(
            F.when((F.col("_rk") <= lo), 1).otherwise(0)
        ).cast("long").alias("n_lo"),
        F.sum(
            F.when((F.col("_rk") > hi), 1).otherwise(0)
        ).cast("long").alias("n_hi"),
    )
    d = lambda c: c.cast("double")  # noqa: E731
    g = core.crossJoin(F.broadcast(tails))
    wins_sum = (
        F.col("s_mid")
        + F.col("n_lo") * F.col("lo_cut")
        + F.col("n_hi") * F.col("hi_cut")
    )
    return g.select(
        "n_all",
        "n_mid",
        "lo_cut",
        "hi_cut",
        (
            F.round(d(F.col("s_mid")) / d(F.col("n_mid")), 4) + F.lit(0.0)
        ).alias("trimmed_mean_cents"),
        (
            F.round(d(wins_sum) / d(F.col("n_all")), 4) + F.lit(0.0)
        ).alias("winsorized_mean_cents"),
    )


ORACLE_Q277 = f"""
WITH ranked AS (
  SELECT CAST(CAST(round(o_totalprice * 100, 0) AS DECIMAL(20,0)) AS BIGINT)
           AS c,
         ROW_NUMBER() OVER (ORDER BY
           CAST(round(o_totalprice * 100, 0) AS DECIMAL(20,0)), o_orderkey)
           AS rk,
         COUNT(*) OVER () AS N
  FROM orders),
cuts AS (
  SELECT CAST(ceil({_TRIM_PCT / 100.0} * N) AS BIGINT) AS lo,
         CAST(N - ceil({_TRIM_PCT / 100.0} * N) AS BIGINT) AS hi,
         CAST(N AS BIGINT) AS n_all
  FROM ranked LIMIT 1),
core AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_mid,
         CAST(SUM(c) AS BIGINT) AS s_mid,
         CAST(MIN(c) AS BIGINT) AS lo_cut,
         CAST(MAX(c) AS BIGINT) AS hi_cut
  FROM ranked, cuts WHERE rk > lo AND rk <= hi),
tails AS (
  SELECT CAST(SUM(CASE WHEN rk <= lo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
         CAST(SUM(CASE WHEN rk > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi
  FROM ranked, cuts)
SELECT n_all, n_mid, lo_cut, hi_cut,
       round(CAST(s_mid AS DOUBLE) / n_mid, 4) + 0.0 AS trimmed_mean_cents,
       round(CAST(s_mid + n_lo * lo_cut + n_hi * hi_cut AS DOUBLE) / n_all,
             4) + 0.0 AS winsorized_mean_cents
FROM cuts, core, tails
"""


# ---------------------------------------------------------------------------
# q278: Spearman rank correlation
# ---------------------------------------------------------------------------


def q278_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rho between part size and price: per distinct value
    of each column, the tie-averaged rank (carried 2x-scaled as an
    exact integer from a per-level prefix pass — q206's midrank
    layout), then Pearson over the 2x-ranks with DECIMAL
    cross-products. Two value-level prefix passes + one join back on
    the value keys; no per-row window."""
    p = load_tables(spark, sf_dir, ["part"])["part"]
    base = p.select(
        "p_partkey",
        F.col("p_size").cast("long").alias("x"),
        F.expr("CAST(round(p_retailprice * 100, 0) AS DECIMAL(20,0))")
        .cast("long")
        .alias("y"),
    ).localCheckpoint(eager=False)

    def midranks(col):
        levels = base.groupBy(F.col(col).alias("v")).agg(
            F.count("*").cast("long").alias("cnt")
        )
        cs = global_running_sum(
            levels, [F.asc("v")], "cnt", rsum_col="end_", total_col="_N"
        )
        # midrank*2 = 2*end - cnt + 1 (exact integer)
        return cs.select(
            F.col("v").alias(col),
            (F.col("end_") * 2 - F.col("cnt") + 1).cast("long").alias(
                f"r2_{col}"
            ),
        )

    j = base.join(midranks("x"), on="x").join(midranks("y"), on="y")
    g = j.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("r2_x").cast("long").alias("sx"),
        F.sum("r2_y").cast("long").alias("sy"),
        F.sum(
            F.col("r2_x").cast("decimal(38,0)")
            * F.col("r2_y").cast("decimal(38,0)")
        ).cast("decimal(38,0)").alias("sxy"),
        F.sum(
            F.col("r2_x").cast("decimal(38,0)")
            * F.col("r2_x").cast("decimal(38,0)")
        ).cast("decimal(38,0)").alias("sxx"),
        F.sum(
            F.col("r2_y").cast("decimal(38,0)")
            * F.col("r2_y").cast("decimal(38,0)")
        ).cast("decimal(38,0)").alias("syy"),
    )
    d = lambda c: c.cast("double")  # noqa: E731
    cov = d(F.col("n")) * d(F.col("sxy")) - d(F.col("sx")) * d(F.col("sy"))
    varx = d(F.col("n")) * d(F.col("sxx")) - d(F.col("sx")) * d(F.col("sx"))
    vary = d(F.col("n")) * d(F.col("syy")) - d(F.col("sy")) * d(F.col("sy"))
    return g.select(
        "n",
        (F.round(cov / F.sqrt(varx * vary), 6) + F.lit(0.0)).alias(
            "spearman_rho"
        ),
    )


ORACLE_Q278 = """
WITH base AS (
  SELECT p_partkey, CAST(p_size AS BIGINT) AS x,
         CAST(CAST(round(p_retailprice * 100, 0) AS DECIMAL(20,0)) AS BIGINT)
           AS y
  FROM part),
rx AS (
  SELECT v AS x, CAST(2 * SUM(cnt) OVER (ORDER BY v
           ROWS UNBOUNDED PRECEDING) - cnt + 1 AS BIGINT) AS r2_x
  FROM (SELECT x AS v, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM base GROUP BY x)),
ry AS (
  SELECT v AS y, CAST(2 * SUM(cnt) OVER (ORDER BY v
           ROWS UNBOUNDED PRECEDING) - cnt + 1 AS BIGINT) AS r2_y
  FROM (SELECT y AS v, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM base GROUP BY y)),
j AS (
  SELECT r2_x, r2_y FROM base JOIN rx USING (x) JOIN ry USING (y)),
g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(r2_x) AS BIGINT) AS sx, CAST(SUM(r2_y) AS BIGINT) AS sy,
         SUM(CAST(r2_x AS HUGEINT) * r2_y) AS sxy,
         SUM(CAST(r2_x AS HUGEINT) * r2_x) AS sxx,
         SUM(CAST(r2_y AS HUGEINT) * r2_y) AS syy
  FROM j)
SELECT n,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * sy)
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * sy)), 6) + 0.0 AS spearman_rho
FROM g
"""


# ---------------------------------------------------------------------------
# q279: lift / cumulative gains curve
# ---------------------------------------------------------------------------

_LIFT_BINS = 10


def q279_lift_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-eval gains table: orders rank by the score (discount
    proxy from the order's lines: mean line discount in exact
    centi-pct) descending into deciles via the prefix pass; per
    decile the positive rate (o_orderstatus = 'F') over the base
    rate is the lift; cumulative gains = share of all positives
    captured through that decile (second prefix over 10 rows)."""
    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    score = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(
            (
                F.sum(
                    F.expr("CAST(round(l_discount * 10000, 0) AS BIGINT)")
                )
                / F.count("*")
            ).alias("_score")
        )
    )
    base = (
        t["orders"]
        .join(score, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "o_orderkey",
            F.round(F.col("_score"), 4).alias("score"),
            (F.col("o_orderstatus") == "F").cast("long").alias("pos"),
        )
    )
    ranked = global_running_sum(
        base.withColumn("_one", F.lit(1).cast("long")),
        [F.desc("score"), F.asc("o_orderkey")],
        "_one",
        idx_col="_rk",
        rsum_col="_rs",
        total_col="_N",
    )
    decile = F.expr(f"CAST(ceil({_LIFT_BINS}.0 * _rk / _N) AS BIGINT)")
    per = ranked.select(decile.alias("decile"), "pos").groupBy(
        "decile"
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("pos").cast("long").alias("n_pos"),
    )
    tot = per.agg(
        F.sum("n").cast("long").alias("tot_n"),
        F.sum("n_pos").cast("long").alias("tot_p"),
    )
    d = lambda c: c.cast("double")  # noqa: E731
    j = per.crossJoin(F.broadcast(tot))
    # cumulative over the 10 decile rows: bounded in-row prefix
    arr = j.select(
        F.col("tot_n"), F.col("tot_p"),
        F.struct("decile", "n", "n_pos").alias("e"),
    ).groupBy("tot_n", "tot_p").agg(
        F.sort_array(F.collect_list("e")).alias("a")
    )
    rows = arr.select(
        "tot_n",
        "tot_p",
        F.posexplode("a").alias("pos_i", "e"),
        F.col("a").alias("_a"),
    )
    cum_pos = F.aggregate(
        F.slice(F.col("_a"), 1, F.col("pos_i") + 1),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x["n_pos"],
    )
    return rows.select(
        F.col("e.decile").alias("decile"),
        F.col("e.n").alias("n"),
        F.col("e.n_pos").alias("n_pos"),
        (
            F.round(
                (d(F.col("e.n_pos")) / d(F.col("e.n")))
                / (d(F.col("tot_p")) / d(F.col("tot_n"))),
                6,
            )
            + F.lit(0.0)
        ).alias("lift"),
        (
            F.round(cum_pos.cast("double") / d(F.col("tot_p")), 6)
            + F.lit(0.0)
        ).alias("cum_gain"),
    ).orderBy("decile")


ORACLE_Q279 = f"""
WITH score AS (
  SELECT l_orderkey,
         round(SUM(CAST(round(l_discount * 10000, 0) AS BIGINT))
               / COUNT(*), 4) AS score
  FROM lineitem GROUP BY 1),
base AS (
  SELECT o_orderkey, score,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
  FROM orders JOIN score ON o_orderkey = l_orderkey),
ranked AS (
  SELECT pos,
         CAST(ceil({_LIFT_BINS}.0 * (ROW_NUMBER() OVER
             (ORDER BY score DESC, o_orderkey)) / (COUNT(*) OVER ()))
           AS BIGINT) AS decile
  FROM base),
per AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(pos) AS BIGINT) AS n_pos
  FROM ranked GROUP BY decile),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS tot_n, CAST(SUM(n_pos) AS BIGINT) AS tot_p
  FROM per)
SELECT decile, per.n, per.n_pos,
       round((CAST(per.n_pos AS DOUBLE) / per.n)
             / (CAST(tot_p AS DOUBLE) / tot_n), 6) + 0.0 AS lift,
       round(CAST(SUM(per.n_pos) OVER (ORDER BY decile
                                       ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             / tot_p, 6) + 0.0 AS cum_gain
FROM per, tot ORDER BY decile
"""


def batch57_registry() -> list[QueryDef]:
    return [
        QueryDef("q276_bootstrap_diff", q276_bootstrap_diff, ORACLE_Q276,
                 "bootstrap CI for the difference in period means"),
        QueryDef("q277_trimmed_mean", q277_trimmed_mean, ORACLE_Q277,
                 "trimmed + winsorized means via global ranks"),
        QueryDef("q278_spearman", q278_spearman, ORACLE_Q278,
                 "Spearman rho from exact 2x midranks"),
        QueryDef("q279_lift_curve", q279_lift_curve, ORACLE_Q279,
                 "decile lift and cumulative gains table"),
    ]
