"""Batch 50: functional-dependency audit, weighted sampling without
replacement, per-group boxplot stats, and rank-binned mutual
information.

- q248 FD audit — the schema-profiling operator: for each candidate
  functional dependency A→B, the number of violating A-groups and the
  exact g3 repair size (rows to delete so the FD holds = N − Σ_A
  max_B count). Two exact aggregations per candidate, unioned; no
  floats except the final ratio.
- q249 priority sample — weighted sampling WITHOUT replacement
  (Efraimidis–Spirakis A-ES): key = ln(u)/w with u the md5-derived
  uniform in (0,1], take the k largest keys. One pass, a distributed
  top-k (orderBy+limit), no resampling loop; identical md5 strings +
  identical IEEE ln/divide make the drawn sample bit-equal on both
  engines. The quality-weighted corpus-sampling primitive.
- q250 boxplot stats — per-brand five-number summary + IQR outlier
  counts with EXPLICIT nearest-rank semantics (element_at(sorted,
  ceil(q·n)) — no interpolation ambiguity between engines). Groups
  here are catalog-bounded (~80 rows/brand); an unbounded-group
  deployment swaps the in-group sort for q208's mergeable-histogram
  quantiles.
- q251 rank-binned MI — mutual information between the order-price
  DECILE (global-rank binning via the distributed prefix pass, no
  ntile window) and order priority: exact contingency longs, MI and
  the two entropies accumulate in picounits (q235's discipline),
  normalized MI as the readout. The numeric×categorical dependence
  scanner that complements q239's categorical gain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ranking import global_running_sum
from ..sources.parquet import load_tables
from .catalog import QueryDef

# ---------------------------------------------------------------------------
# q248: functional-dependency audit
# ---------------------------------------------------------------------------

_FD_CANDIDATES = (
    ("o_orderkey->o_custkey", "o_orderkey", "o_custkey"),
    ("o_custkey->o_orderpriority", "o_custkey", "o_orderpriority"),
    ("o_orderpriority->o_orderstatus", "o_orderpriority", "o_orderstatus"),
)


def q248_fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g3-style FD audit over the candidate list: per A-group the
    distinct-B count and the majority-B count are exact; the FD holds
    iff every group has one B; g3 = N − Σ max. Each candidate is one
    (A,B)-count aggregation + one A rollup; candidates union at the
    end (3 bounded plans, not a data explosion)."""
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    outs = []
    for name, a, b in _FD_CANDIDATES:
        ab = o.groupBy(
            F.col(a).cast("string").alias("_a"),
            F.col(b).cast("string").alias("_b"),
        ).agg(F.count("*").cast("long").alias("_n"))
        per_a = ab.groupBy("_a").agg(
            F.count("*").cast("long").alias("_n_b"),
            F.sum("_n").cast("long").alias("_tot"),
            F.max("_n").cast("long").alias("_max"),
        )
        outs.append(
            per_a.agg(
                F.lit(name).alias("fd"),
                F.count("*").cast("long").alias("n_groups"),
                F.sum((F.col("_n_b") > 1).cast("long"))
                .cast("long")
                .alias("violating_groups"),
                (F.sum("_tot") - F.sum("_max")).cast("long").alias("g3_rows"),
                (
                    F.round(
                        (F.sum("_tot") - F.sum("_max")).cast("double")
                        / F.sum("_tot").cast("double"),
                        6,
                    )
                    + F.lit(0.0)
                ).alias("g3_ratio"),
            )
        )
    out = outs[0]
    for x in outs[1:]:
        out = out.unionAll(x)
    return out.orderBy("fd")


def _fd_oracle() -> str:
    parts = []
    for name, a, b in _FD_CANDIDATES:
        parts.append(f"""
SELECT '{name}' AS fd,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN n_b > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS violating_groups,
       CAST(SUM(tot) - SUM(mx) AS BIGINT) AS g3_rows,
       round(CAST(SUM(tot) - SUM(mx) AS DOUBLE) / SUM(tot), 6) + 0.0
         AS g3_ratio
FROM (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_b, CAST(SUM(n) AS BIGINT) AS tot,
         CAST(MAX(n) AS BIGINT) AS mx
  FROM (SELECT CAST({a} AS VARCHAR) AS _a, CAST({b} AS VARCHAR) AS _b,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY 1, 2)
  GROUP BY _a)""")
    return " UNION ALL ".join(parts) + " ORDER BY fd"


ORACLE_Q248 = _fd_oracle()


# ---------------------------------------------------------------------------
# q249: weighted sampling without replacement (A-ES)
# ---------------------------------------------------------------------------

_WS_K = 50


def q249_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis–Spirakis one-pass weighted sample: per order,
    u = (md5_60bit + 1) / 2^60 in (0, 1], sort key = ln(u)/w (the
    log-monotone form of u^(1/w) — larger is better). Top-50 by
    (key desc, orderkey) via distributed orderBy+limit. The inclusion
    probability tracks the cents weight exactly; determinism comes
    from identical md5 bits and identical IEEE ln/divide on both
    engines. Output ordered by orderkey for a stable compare."""
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    cents = F.expr("CAST(round(o_totalprice * 100, 0) AS DECIMAL(20,0))").cast(
        "long"
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("ws:"), F.col("o_orderkey").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    u = (h.cast("double") + F.lit(1.0)) / F.lit(float(1 << 60))
    base = o.select(
        "o_orderkey", cents.alias("cents"), (F.log(u) / cents.cast("double")).alias("_key")
    ).where(F.col("cents") > 0)
    top = base.orderBy(F.desc("_key"), F.asc("o_orderkey")).limit(_WS_K)
    return top.select(
        "o_orderkey",
        "cents",
        (F.round(F.col("_key") * 1e12, 0).cast("long")).alias("key_pico"),
    ).orderBy("o_orderkey")


ORACLE_Q249 = f"""
WITH base AS (
  SELECT o_orderkey,
         CAST(CAST(round(o_totalprice * 100, 0) AS DECIMAL(20,0)) AS BIGINT)
           AS cents,
         ln((CAST(('0x' || substr(md5('ws:' || CAST(o_orderkey AS VARCHAR)),
                                  1, 15))::BIGINT AS DOUBLE) + 1.0)
            / {float(1 << 60)!r})
           / CAST(CAST(round(o_totalprice * 100, 0) AS DECIMAL(20,0))
                  AS BIGINT) AS key
  FROM orders
  WHERE CAST(round(o_totalprice * 100, 0) AS DECIMAL(20,0)) > 0),
top AS (
  SELECT * FROM base ORDER BY key DESC, o_orderkey LIMIT {_WS_K})
SELECT o_orderkey, cents,
       CAST(round(key * 1e12, 0) AS BIGINT) AS key_pico
FROM top ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# q250: per-group boxplot statistics
# ---------------------------------------------------------------------------


def q250_boxplot_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand five-number summary of price cents with explicit
    nearest-rank quantiles: q = element_at(sorted, ceil(q·n)) — the
    one definition both engines compute identically on integers.
    Whiskers at 1.5·IQR, outliers counted exactly. The in-group sort
    is bounded by the brand's catalog size; unbounded groups would
    use the q208 mergeable-histogram path instead (docstring
    contract, not a silent assumption)."""
    p = load_tables(spark, sf_dir, ["part"])["part"]
    cents = F.expr("CAST(round(p_retailprice * 100, 0) AS DECIMAL(20,0))").cast(
        "long"
    )
    g = p.groupBy(F.col("p_brand").alias("brand")).agg(
        F.sort_array(F.collect_list(cents)).alias("vals"),
        F.count("*").cast("long").alias("n"),
    )
    q = lambda f: F.element_at(  # noqa: E731
        "vals", F.ceil(F.lit(f) * F.col("n")).cast("int")
    ).cast("long")
    stats = g.select(
        "brand",
        "n",
        F.element_at("vals", 1).cast("long").alias("min_cents"),
        q(0.25).alias("q1"),
        q(0.5).alias("median"),
        q(0.75).alias("q3"),
        F.element_at("vals", -1).cast("long").alias("max_cents"),
        F.col("vals"),
    ).withColumn("iqr", F.col("q3") - F.col("q1"))
    lo = F.col("q1").cast("double") - 1.5 * F.col("iqr").cast("double")
    hi = F.col("q3").cast("double") + 1.5 * F.col("iqr").cast("double")
    n_out = F.size(
        F.filter(
            "vals",
            lambda v: (v.cast("double") < lo) | (v.cast("double") > hi),
        )
    ).cast("long")
    return stats.select(
        "brand",
        "n",
        "min_cents",
        "q1",
        "median",
        "q3",
        "max_cents",
        "iqr",
        n_out.alias("n_outliers"),
    ).orderBy("brand")


ORACLE_Q250 = """
WITH g AS (
  SELECT p_brand AS brand,
         list_sort(list(CAST(CAST(round(p_retailprice * 100, 0)
                                  AS DECIMAL(20,0)) AS BIGINT))) AS vals,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM part GROUP BY 1),
stats AS (
  SELECT brand, n, vals,
         CAST(vals[1] AS BIGINT) AS min_cents,
         CAST(vals[CAST(ceil(0.25 * n) AS INTEGER)] AS BIGINT) AS q1,
         CAST(vals[CAST(ceil(0.5 * n) AS INTEGER)] AS BIGINT) AS median,
         CAST(vals[CAST(ceil(0.75 * n) AS INTEGER)] AS BIGINT) AS q3,
         CAST(vals[-1] AS BIGINT) AS max_cents
  FROM g)
SELECT brand, n, min_cents, q1, median, q3, max_cents,
       CAST(q3 - q1 AS BIGINT) AS iqr,
       CAST(len(list_filter(vals,
         v -> CAST(v AS DOUBLE) < q1 - 1.5 * (q3 - q1)
              OR CAST(v AS DOUBLE) > q3 + 1.5 * (q3 - q1))) AS BIGINT)
         AS n_outliers
FROM stats ORDER BY brand
"""


# ---------------------------------------------------------------------------
# q251: rank-binned mutual information
# ---------------------------------------------------------------------------

_MI_BINS = 10


def q251_rank_binned_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MI between the global price decile and order priority.
    Decile = ceil(10·rank/N) from ONE distributed prefix pass
    (total order (cents, orderkey) — exact, no ntile window); the
    contingency table is exact longs; MI and both entropies
    accumulate in picounits; the normalized MI
    (MI / sqrt(H_bin·H_pri)) is the one final double."""
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    cents = F.expr("CAST(round(o_totalprice * 100, 0) AS DECIMAL(20,0))").cast(
        "long"
    )
    base = o.select(
        "o_orderkey", cents.alias("cents"), F.col("o_orderpriority").alias("pri")
    ).withColumn("_one", F.lit(1).cast("long"))
    ranked = global_running_sum(
        base,
        [F.asc("cents"), F.asc("o_orderkey")],
        "_one",
        idx_col="_rk",
        rsum_col="_rs",
        total_col="_N",
    ).select(
        F.expr(f"CAST(ceil({_MI_BINS}.0 * _rk / _N) AS BIGINT)").alias("bin"),
        "pri",
    )
    cells = ranked.groupBy("bin", "pri").agg(
        F.count("*").cast("long").alias("n_ij")
    )
    rows = cells.groupBy("bin").agg(F.sum("n_ij").cast("long").alias("n_i"))
    cols = cells.groupBy("pri").agg(F.sum("n_ij").cast("long").alias("n_j"))
    tot = rows.agg(F.sum("n_i").cast("long").alias("N"))
    d = lambda c: c.cast("double")  # noqa: E731
    mi_pico = F.round(
        (d(F.col("n_ij")) / d(F.col("N")))
        * F.log(
            d(F.col("N") * F.col("n_ij")) / d(F.col("n_i") * F.col("n_j"))
        )
        * 1e12,
        0,
    ).cast("long")
    mi = (
        cells.join(rows, on="bin")
        .join(cols, on="pri")
        .crossJoin(F.broadcast(tot))
        .agg(F.sum(mi_pico).cast("long").alias("mi_pico"))
    )

    def h(df, cnt):
        t = F.round(
            -(d(F.col(cnt)) / d(F.col("N")))
            * F.log(d(F.col(cnt)) / d(F.col("N")))
            * 1e12,
            0,
        ).cast("long")
        return df.crossJoin(F.broadcast(tot)).agg(
            F.sum(t).cast("long").alias(f"h_{cnt}")
        )

    g = (
        mi.crossJoin(F.broadcast(h(rows, "n_i")))
        .crossJoin(F.broadcast(h(cols, "n_j")))
        .crossJoin(F.broadcast(tot))
    )
    return g.select(
        F.col("N").alias("n"),
        (F.round(d(F.col("mi_pico")) / 1e12, 6) + F.lit(0.0)).alias(
            "mi_nats"
        ),
        (
            F.round(
                d(F.col("mi_pico"))
                / F.sqrt(d(F.col("h_n_i")) * d(F.col("h_n_j"))),
                6,
            )
            + F.lit(0.0)
        ).alias("nmi"),
    )


ORACLE_Q251 = f"""
WITH base AS (
  SELECT o_orderkey,
         CAST(CAST(round(o_totalprice * 100, 0) AS DECIMAL(20,0)) AS BIGINT)
           AS cents,
         o_orderpriority AS pri
  FROM orders),
ranked AS (
  SELECT CAST(ceil({_MI_BINS}.0 * (ROW_NUMBER() OVER
           (ORDER BY cents, o_orderkey)) / (COUNT(*) OVER ())) AS BIGINT)
           AS bin,
         pri
  FROM base),
cells AS (
  SELECT bin, pri, CAST(COUNT(*) AS BIGINT) AS n_ij
  FROM ranked GROUP BY 1, 2),
rows_ AS (SELECT bin, CAST(SUM(n_ij) AS BIGINT) AS n_i FROM cells GROUP BY 1),
cols_ AS (SELECT pri, CAST(SUM(n_ij) AS BIGINT) AS n_j FROM cells GROUP BY 1),
tot AS (SELECT CAST(SUM(n_i) AS BIGINT) AS N FROM rows_),
mi AS (
  SELECT CAST(SUM(CAST(round((CAST(n_ij AS DOUBLE) / N)
           * ln(CAST(N * n_ij AS DOUBLE) / CAST(n_i * n_j AS DOUBLE))
           * 1e12, 0) AS BIGINT)) AS BIGINT) AS mi_pico
  FROM cells JOIN rows_ USING (bin) JOIN cols_ USING (pri), tot),
hb AS (
  SELECT CAST(SUM(CAST(round(-(CAST(n_i AS DOUBLE) / N)
           * ln(CAST(n_i AS DOUBLE) / N) * 1e12, 0) AS BIGINT)) AS BIGINT)
           AS h_b
  FROM rows_, tot),
hp AS (
  SELECT CAST(SUM(CAST(round(-(CAST(n_j AS DOUBLE) / N)
           * ln(CAST(n_j AS DOUBLE) / N) * 1e12, 0) AS BIGINT)) AS BIGINT)
           AS h_p
  FROM cols_, tot)
SELECT N AS n,
       round(CAST(mi_pico AS DOUBLE) / 1e12, 6) + 0.0 AS mi_nats,
       round(CAST(mi_pico AS DOUBLE)
             / sqrt(CAST(h_b AS DOUBLE) * CAST(h_p AS DOUBLE)), 6) + 0.0
         AS nmi
FROM tot, mi, hb, hp
"""


def batch50_registry() -> list[QueryDef]:
    return [
        QueryDef("q248_fd_audit", q248_fd_audit, ORACLE_Q248,
                 "functional-dependency g3 audit over candidates"),
        QueryDef("q249_priority_sample", q249_priority_sample, ORACLE_Q249,
                 "A-ES weighted sample without replacement, one pass"),
        QueryDef("q250_boxplot_stats", q250_boxplot_stats, ORACLE_Q250,
                 "per-brand boxplot with nearest-rank quantiles"),
        QueryDef("q251_rank_binned_mi", q251_rank_binned_mi, ORACLE_Q251,
                 "decile-vs-priority MI, picounit-exact"),
    ]
