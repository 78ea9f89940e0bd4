"""Batch 36: mergeable quantile summaries and interval concurrency.

- q208 mergeable-histogram quantiles: per-source fixed-width
  histograms (the partial STATE — 64 integer bins), merged by plain
  addition to a global histogram, quantiles read off the merged
  cumulative bins (lower bound of the rank-covering bin). The
  mergeable-summary counterpart to q104's exact equi-depth: at 100 TB
  you persist per-shard histograms once and answer any later quantile
  question by summing 64-row states — same lifecycle as q185's rollup
  states and the HLL registers. Self-graded: the exact percentile
  sits beside the histogram estimate.
- q209 peak concurrency: the maximum number of simultaneously-open
  intervals (orders open for 30 days) per priority — the classic
  +1/−1 boundary sweep with a per-series cumulative sum; capacity
  planning's core query, exact integers end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_tables
from .catalog import QueryDef

# ---------------------------------------------------------------------------
# q208: mergeable fixed-width histogram quantiles
# ---------------------------------------------------------------------------

_QBINS = 64
_QWIDTH = 10  # n_chars bin width (docs span ~48..553 chars -> 64 bins cover 0..640)
_QS = (50, 90, 99)


def q208_mergeable_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of document length from MERGED per-source histogram
    states: each source reduces to ≤64 (bin, count) rows, the global
    histogram is their sum, and the quantile estimate is the lower
    bound of the first bin whose cumulative count reaches ceil(q·n/100)
    — all integers, deterministic, and mergeable across any sharding.
    The exact percentile (one global exact computation) rides along to
    grade the bin-resolution error."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    binned = docs.select(
        "source",
        F.expr(f"least(CAST(n_chars div {_QWIDTH} AS INT), {_QBINS - 1})")
        .cast("long").alias("bin"),
        F.col("n_chars").cast("long").alias("n_chars"),
    )
    # the per-source partial state (what a 100 TB pipeline persists)
    states = binned.groupBy("source", "bin").agg(
        F.count("*").cast("long").alias("cnt")
    )
    # merge states -> global histogram (64 rows). Checkpointed: the
    # cumulative self-join reads it twice and every quantile row
    # filters the cumulative table, so without materialization each
    # of the three quantiles would re-run the full documents scan +
    # two groupBys (10 scans total at plan level; 2 after).
    hist = (
        states.groupBy("bin")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    tot = hist.agg(F.sum("cnt").cast("long").alias("_n"))
    # cumulative over <=64 rows via tiny self-join (no window)
    cum = (
        hist.alias("h")
        .join(
            hist.select(
                F.col("bin").alias("_b2"), F.col("cnt").alias("_c2")
            ),
            F.col("_b2") <= F.col("h.bin"),
        )
        .groupBy("h.bin")
        .agg(F.sum("_c2").cast("long").alias("cum"))
        .crossJoin(F.broadcast(tot))
    )
    qrows = []
    for q in _QS:
        # rank = ceil(q*n/100) in pure integers
        rank = F.expr(f"({q} * _n + 99) div 100")
        first_bin = (
            cum.where(F.col("cum") >= rank)
            .orderBy("bin")
            .limit(1)
            .select(
                F.lit(q).cast("long").alias("q"),
                (F.col("bin") * _QWIDTH).cast("long").alias("est_lower"),
            )
        )
        qrows.append(first_bin)
    est = qrows[0]
    for r in qrows[1:]:
        est = est.unionByName(r)
    exact = docs.agg(
        *[
            F.expr(
                f"CAST(percentile(n_chars, {q / 100.0!r}) AS DOUBLE)"
            ).alias(f"_e{q}")
            for q in _QS
        ]
    ).select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(q).cast("long").alias("q"),
                    F.col(f"_e{q}").alias("exact_pct"),
                )
                for q in _QS
            ])
        ).alias("_x")
    ).select("_x.q", F.round("_x.exact_pct", 6).alias("exact_pct"))
    return est.join(exact, on="q")


def _oracle_q208() -> str:
    q_union = " UNION ALL ".join(f"SELECT {q} AS q" for q in _QS)
    exact_union = " UNION ALL ".join(
        f"SELECT {q} AS q, round(CAST(quantile_cont(n_chars, "
        f"{q / 100.0!r}) AS DOUBLE), 6) AS exact_pct FROM binned"
        for q in _QS
    )
    return f"""
WITH binned AS (
  SELECT least(n_chars // {_QWIDTH}, {_QBINS - 1}) AS bin, n_chars
  FROM documents),
hist AS (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS cnt FROM binned GROUP BY bin),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM hist),
cum AS (
  SELECT h.bin, CAST(SUM(h2.cnt) AS BIGINT) AS cum
  FROM hist h JOIN hist h2 ON h2.bin <= h.bin
  GROUP BY h.bin),
qs AS ({q_union}),
est AS (
  SELECT q, CAST(MIN(bin) * {_QWIDTH} AS BIGINT) AS est_lower
  FROM qs JOIN cum ON cum.cum >= (q * (SELECT n FROM tot) + 99) // 100
  GROUP BY q),
exact AS ({exact_union})
SELECT CAST(est.q AS BIGINT) AS q, est.est_lower, exact.exact_pct
FROM est JOIN exact ON est.q = exact.q
"""


# ---------------------------------------------------------------------------
# q209: peak interval concurrency
# ---------------------------------------------------------------------------

_OPEN_DAYS = 30


def q209_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak simultaneously-open orders per priority, treating each
    order as open for 30 days: explode to +1 (open) / −1 (close)
    boundary events, per-series ordered cumulative sum, take the max
    (earliest day tie). The sweep the capacity planner runs, exact
    integers; the series key bounds every window partition."""
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    bounds = o.select(
        F.col("o_orderpriority").alias("priority"),
        F.explode(
            F.array(
                F.struct(
                    F.col("o_orderdate").alias("t"),
                    F.lit(1).alias("delta"),
                ),
                F.struct(
                    (F.col("o_orderdate") + F.expr(
                        f"INTERVAL {_OPEN_DAYS} DAYS"
                    )).alias("t"),
                    F.lit(-1).alias("delta"),
                ),
            )
        ).alias("_b"),
    ).select("priority", "_b.t", "_b.delta")
    per_t = bounds.groupBy("priority", "t").agg(
        F.sum("delta").cast("long").alias("d")
    )
    w = Window.partitionBy("priority").orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    swept = per_t.withColumn("open_now", F.sum("d").over(w).cast("long"))
    wr = Window.partitionBy("priority").orderBy(
        F.desc("open_now"), F.asc("t")
    )
    return (
        swept.withColumn("_rn", F.row_number().over(wr))
        .where(F.col("_rn") == 1)
        .select("priority", F.col("t").alias("peak_at"),
                F.col("open_now").alias("peak_open"))
    )


ORACLE_Q209 = f"""
WITH bounds AS (
  SELECT o_orderpriority AS priority, o_orderdate AS t, 1 AS delta
  FROM orders
  UNION ALL
  SELECT o_orderpriority, o_orderdate + INTERVAL {_OPEN_DAYS} DAY, -1
  FROM orders),
per_t AS (
  SELECT priority, t, CAST(SUM(delta) AS BIGINT) AS d
  FROM bounds GROUP BY 1, 2),
swept AS (
  SELECT priority, t,
         CAST(SUM(d) OVER (PARTITION BY priority ORDER BY t
                           ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS open_now
  FROM per_t),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY priority
                               ORDER BY open_now DESC, t ASC) AS rn
  FROM swept)
SELECT priority, CAST(t AS TIMESTAMP) AS peak_at, open_now AS peak_open
FROM ranked WHERE rn = 1
"""


def batch36_registry() -> list[QueryDef]:
    return [
        QueryDef("q208_mergeable_quantiles", q208_mergeable_quantiles,
                 _oracle_q208(),
                 "mergeable histogram-state quantiles vs exact"),
        QueryDef("q209_peak_concurrency", q209_peak_concurrency,
                 ORACLE_Q209,
                 "peak open-interval concurrency (+1/-1 sweep)"),
    ]
