"""Batch 34: sweep-line analytics on the distributed prefix machinery.

Both queries ride ``operators/ranking.py``'s range-partitioned prefix
primitives (``global_running_max`` new, ``global_running_sum``) — the
window-free distributed form of ORDER-BY-all running aggregates:

- q203 skyline / Pareto frontier (Börzsönyi et al., ICDE 2001): the
  parts no other part beats on (cheaper price, larger size)
  simultaneously. The textbook NOT-EXISTS definition is the oracle;
  the Spark plan is the O(n log n) sweep — collapse to price levels,
  one strictly-earlier running max, join the survivors back. No
  all-pairs comparison anywhere.
- q204 two-sample Kolmogorov–Smirnov drift statistic, exactly: both
  samples' CDFs advance through ONE prefix pass (the two per-level
  counts packed into a single base-10^18 DECIMAL(38,0) so one running
  sum carries both, overflow-free for any physically reachable count),
  and D = max |n_b·F_a − n_a·F_b| is an integer — the
  distribution-drift test with zero float hazard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_tables
from .catalog import QueryDef

# ---------------------------------------------------------------------------
# q203: skyline (Pareto frontier)
# ---------------------------------------------------------------------------


def q203_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-optimal parts under (minimize retail price, maximize
    size): collapse to per-price best size, sweep with the
    strictly-earlier global running max, keep levels whose size beats
    every cheaper level, join back for the point set. Ties share the
    frontier (two parts with identical price and size don't dominate
    each other — both survive, as in the oracle's NOT EXISTS)."""
    from ..operators.ranking import global_running_max

    parts = load_tables(spark, sf_dir, ["part"])["part"].select(
        "p_partkey",
        F.expr("CAST(p_retailprice * 100 AS DECIMAL(20,0))")
        .cast("long").alias("price_cents"),
        F.col("p_size").cast("long").alias("p_size"),
    )
    levels = parts.groupBy("price_cents").agg(
        F.max("p_size").alias("best_size")
    )
    swept = global_running_max(
        levels, [F.asc("price_cents")], "best_size",
        rmax_col="cheaper_best", inclusive=False,
    )
    frontier = swept.where(
        F.col("cheaper_best").isNull()
        | (F.col("best_size") > F.col("cheaper_best"))
    ).select(
        F.col("price_cents").alias("_fc"),
        F.col("best_size").alias("_fs"),
    )
    return parts.join(
        frontier,
        (F.col("price_cents") == F.col("_fc"))
        & (F.col("p_size") == F.col("_fs")),
    ).select("p_partkey", "price_cents", "p_size")


ORACLE_Q203 = """
WITH p AS (
  SELECT p_partkey,
         CAST(CAST(p_retailprice * 100 AS DECIMAL(20,0)) AS BIGINT)
           AS price_cents,
         CAST(p_size AS BIGINT) AS p_size
  FROM part)
SELECT p_partkey, price_cents, p_size
FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.price_cents <= a.price_cents AND b.p_size >= a.p_size
    AND (b.price_cents < a.price_cents OR b.p_size > a.p_size))
"""


# ---------------------------------------------------------------------------
# q204: exact two-sample Kolmogorov-Smirnov statistic
# ---------------------------------------------------------------------------

_KS_YEAR_A = 1995
_KS_YEAR_B = 1996
# Packs (count_a, count_b) into one DECIMAL(38,0) running sum: the B
# lane holds counts < 10^18 and the A lane < 10^20 before precision-38
# arithmetic overflows (ANSI mode then fails loudly rather than
# wrapping). 10^18 rows is ~10^6 PB of orders — physically out of
# reach — so carry bleed between the lanes cannot occur, unlike the
# earlier base-2^31 long packing which silently corrupted at 2.1 G
# rows per sample.
_PACK = 10**18


def q204_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Did the order-price distribution move between 1995 and 1996?
    The exact KS statistic: per distinct price, both samples' counts
    pack into one base-10^18 DECIMAL(38,0) integer, ONE distributed
    prefix sum yields both empirical CDFs, and D_scaled = max
    |n_b·cum_a − n_a·cum_b| is pure integer arithmetic (argmax price
    as the deterministic tiebreak). d_micro = 1e6·D_scaled div
    (n_a·n_b) is the classical D in micro-units."""
    from ..operators.ranking import global_running_sum

    o = load_tables(spark, sf_dir, ["orders"])["orders"].withColumn(
        "_y", F.year("o_orderdate")
    ).where(F.col("_y").isin(_KS_YEAR_A, _KS_YEAR_B))
    cents = F.expr("CAST(o_totalprice * 100 AS DECIMAL(20,0))").cast("long")
    levels = o.groupBy(cents.alias("v")).agg(
        F.sum((F.col("_y") == _KS_YEAR_A).cast("long")).alias("_na"),
        F.sum((F.col("_y") == _KS_YEAR_B).cast("long")).alias("_nb"),
    ).select(
        "v",
        (
            F.col("_na").cast("decimal(38,0)") * F.lit(_PACK) + F.col("_nb")
        ).alias("enc"),
    )
    cs = global_running_sum(
        levels, [F.asc("v")], "enc", rsum_col="rs", total_col="tot"
    )
    d = cs.select(
        "v",
        F.expr(f"rs div {_PACK}").alias("cum_a"),
        (F.col("rs") % _PACK).cast("long").alias("cum_b"),
        F.expr(f"tot div {_PACK}").alias("na"),
        (F.col("tot") % _PACK).cast("long").alias("nb"),
    ).select(
        "v", "na", "nb",
        F.abs(
            F.col("nb") * F.col("cum_a") - F.col("na") * F.col("cum_b")
        ).alias("d_scaled"),
    )
    top = d.orderBy(F.desc("d_scaled"), F.asc("v")).limit(1)
    return top.select(
        "na", "nb",
        F.col("v").alias("at_price_cents"),
        F.col("d_scaled").cast("long").alias("d_scaled"),
        F.expr("(1000000 * d_scaled) div (na * nb)")
        .cast("long").alias("d_micro"),
    )


ORACLE_Q204 = f"""
WITH o AS (
  SELECT CAST(CAST(o_totalprice * 100 AS DECIMAL(20,0)) AS BIGINT) AS v,
         year(o_orderdate) AS y
  FROM orders WHERE year(o_orderdate) IN ({_KS_YEAR_A}, {_KS_YEAR_B})),
levels AS (
  SELECT v,
         CAST(SUM(CASE WHEN y = {_KS_YEAR_A} THEN 1 ELSE 0 END) AS BIGINT)
           AS na_v,
         CAST(SUM(CASE WHEN y = {_KS_YEAR_B} THEN 1 ELSE 0 END) AS BIGINT)
           AS nb_v
  FROM o GROUP BY v),
cum AS (
  SELECT v,
         SUM(na_v) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_a,
         SUM(nb_v) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_b,
         SUM(na_v) OVER () AS na, SUM(nb_v) OVER () AS nb
  FROM levels),
d AS (
  SELECT v, na, nb, abs(nb * cum_a - na * cum_b) AS d_scaled
  FROM cum)
SELECT CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
       v AS at_price_cents, CAST(d_scaled AS BIGINT) AS d_scaled,
       CAST((1000000 * d_scaled) // (na * nb) AS BIGINT) AS d_micro
FROM d ORDER BY d_scaled DESC, v ASC LIMIT 1
"""


def batch34_registry() -> list[QueryDef]:
    return [
        QueryDef("q203_skyline", q203_skyline, ORACLE_Q203,
                 "Pareto skyline via strict running-max sweep"),
        QueryDef("q204_ks_drift", q204_ks_drift, ORACLE_Q204,
                 "exact integer two-sample KS drift statistic"),
    ]
