"""Batch 48: clustering agreement, ranked-retrieval AP, Kaplan–Meier
survival, and a recursive-CTE graph BFS.

- q240 clustering agreement — purity / NMI / adjusted Rand between
  the nearest-seed clustering (q238's assignment, shared helper) and
  the embeddings' true labels: the whole contingency table is exact
  longs, MI/entropy terms round to picounits before summing (q235's
  discipline), and the ARI pair-counts run in DECIMAL so N has no
  ceiling. The external-validation readout for any clustering run.
- q241 average precision — ranked retrieval against probe vec_id 0:
  cosine rounds to micro BEFORE ranking (so the order is the same
  bits on both engines), global ranks + running relevant-counts come
  from the distributed prefix pass (``global_running_sum`` — no
  unpartitioned window), AP accumulates precision@hit in exact
  picounits. The retrieval-eval companion to q131's NDCG tier.
- q242 Kaplan–Meier — the survival curve over user lifetimes with
  right-censoring (users still active near the corpus end are
  censored, not deaths): risk sets from one distributed prefix pass,
  the survival product carried as EXACT picounit log-sums through a
  second prefix pass, exp at the end. The time-to-churn estimator.
- q243 recursive BFS — min-hop distances (<= 3) from the smallest
  co-purchase node via a RECURSIVE CTE submitted as raw SQL text on
  BOTH engines (Spark 4 recursive CTE support; the
  port-your-script-verbatim path q215 opened, now for iterative
  SQL). Cycle-safe by bounded depth + min() collapse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ranking import global_running_sum
from ..sources.parquet import load_tables
from .catalog import QueryDef
from .catalog_batch18 import _EDGES_SQL, _edges
from .catalog_batch47 import _ASSIGN_SQL, _nearest_seed_assignment

# ---------------------------------------------------------------------------
# q240: clustering agreement (purity / NMI / ARI)
# ---------------------------------------------------------------------------


def q240_clustering_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """External clustering validation: contingency counts n_cj between
    nearest-seed cluster and true label are exact longs; purity is an
    integer ratio; NMI terms (n/N)·ln(N·n_cj/(n_c·n_j)) and entropies
    round to picounits before summing; ARI's pair counts C(n,2) and
    the a·b product run in DECIMAL(38,0). One assignment shuffle, one
    contingency aggregation; everything downstream is metadata-sized."""
    a = _nearest_seed_assignment(spark, sf_dir)
    cells = a.groupBy("cluster", "label").agg(
        F.count("*").cast("long").alias("n_cj")
    )
    rowt = cells.groupBy("cluster").agg(
        F.sum("n_cj").cast("long").alias("n_c"),
        F.max("n_cj").cast("long").alias("max_in_c"),
    )
    colt = cells.groupBy("label").agg(
        F.sum("n_cj").cast("long").alias("n_j")
    )
    tot = rowt.agg(
        F.sum("n_c").cast("long").alias("N"),
        F.sum("max_in_c").cast("long").alias("purity_num"),
    )
    d = lambda c: c.cast("double")  # noqa: E731
    joined = (
        cells.join(rowt.select("cluster", "n_c"), on="cluster")
        .join(colt, on="label")
        .crossJoin(F.broadcast(tot))
    )
    mi_pico = F.round(
        (d(F.col("n_cj")) / d(F.col("N")))
        * F.log(
            d(F.col("N") * F.col("n_cj")) / d(F.col("n_c") * F.col("n_j"))
        )
        * 1e12,
        0,
    ).cast("long")
    pairs = lambda c: (  # noqa: E731 - C(n,2) in decimal
        c.cast("decimal(38,0)") * (c - 1).cast("decimal(38,0)") / 2
    ).cast("decimal(38,0)")
    mi_and_idx = joined.groupBy("N", "purity_num").agg(
        F.sum(mi_pico).cast("long").alias("mi_pico"),
        F.sum(pairs(F.col("n_cj"))).cast("decimal(38,0)").alias("idx"),
    )

    def _h_pico(df, cnt_col, n_col):
        term = F.round(
            -(d(F.col(cnt_col)) / d(F.col(n_col)))
            * F.log(d(F.col(cnt_col)) / d(F.col(n_col)))
            * 1e12,
            0,
        ).cast("long")
        return df.agg(
            F.sum(term).cast("long").alias(f"h_{cnt_col}_pico"),
            F.sum(pairs(F.col(cnt_col))).cast("decimal(38,0)").alias(
                f"p_{cnt_col}"
            ),
        )

    hc = _h_pico(rowt.crossJoin(F.broadcast(tot.select("N"))), "n_c", "N")
    hl = _h_pico(colt.crossJoin(F.broadcast(tot.select("N"))), "n_j", "N")
    g = mi_and_idx.crossJoin(F.broadcast(hc)).crossJoin(F.broadcast(hl))
    total_pairs = pairs(F.col("N"))
    exp_idx = (
        F.col("p_n_c").cast("double") * F.col("p_n_j").cast("double")
    ) / total_pairs.cast("double")
    max_idx = (
        F.col("p_n_c").cast("double") + F.col("p_n_j").cast("double")
    ) / F.lit(2.0)
    return g.select(
        F.col("N").alias("n"),
        (
            F.round(d(F.col("purity_num")) / d(F.col("N")), 6) + F.lit(0.0)
        ).alias("purity"),
        (
            F.round(
                F.col("mi_pico").cast("double")
                / F.sqrt(
                    F.col("h_n_c_pico").cast("double")
                    * F.col("h_n_j_pico").cast("double")
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("nmi"),
        (
            F.round(
                (F.col("idx").cast("double") - exp_idx)
                / (max_idx - exp_idx),
                6,
            )
            + F.lit(0.0)
        ).alias("ari"),
    )


ORACLE_Q240 = f"""
WITH {_ASSIGN_SQL},
cells AS (
  SELECT cluster, label, CAST(COUNT(*) AS BIGINT) AS n_cj
  FROM assigned GROUP BY 1, 2),
rowt AS (
  SELECT cluster, CAST(SUM(n_cj) AS BIGINT) AS n_c,
         CAST(MAX(n_cj) AS BIGINT) AS max_in_c
  FROM cells GROUP BY 1),
colt AS (
  SELECT label, CAST(SUM(n_cj) AS BIGINT) AS n_j FROM cells GROUP BY 1),
tot AS (
  SELECT CAST(SUM(n_c) AS BIGINT) AS N,
         CAST(SUM(max_in_c) AS BIGINT) AS purity_num
  FROM rowt),
mi AS (
  SELECT CAST(SUM(CAST(round((CAST(n_cj AS DOUBLE) / N)
           * ln(CAST(N * n_cj AS DOUBLE) / CAST(n_c * n_j AS DOUBLE))
           * 1e12, 0) AS BIGINT)) AS BIGINT) AS mi_pico,
         CAST(SUM(CAST(n_cj AS HUGEINT) * (n_cj - 1) / 2) AS HUGEINT) AS idx
  FROM cells JOIN rowt USING (cluster) JOIN colt USING (label), tot),
hc AS (
  SELECT CAST(SUM(CAST(round(-(CAST(n_c AS DOUBLE) / N)
           * ln(CAST(n_c AS DOUBLE) / N) * 1e12, 0) AS BIGINT)) AS BIGINT)
           AS h_c_pico,
         CAST(SUM(CAST(n_c AS HUGEINT) * (n_c - 1) / 2) AS HUGEINT) AS p_c
  FROM rowt, tot),
hl AS (
  SELECT CAST(SUM(CAST(round(-(CAST(n_j AS DOUBLE) / N)
           * ln(CAST(n_j AS DOUBLE) / N) * 1e12, 0) AS BIGINT)) AS BIGINT)
           AS h_l_pico,
         CAST(SUM(CAST(n_j AS HUGEINT) * (n_j - 1) / 2) AS HUGEINT) AS p_l
  FROM colt, tot)
SELECT N AS n,
       round(CAST(purity_num AS DOUBLE) / N, 6) + 0.0 AS purity,
       round(CAST(mi_pico AS DOUBLE)
             / sqrt(CAST(h_c_pico AS DOUBLE) * CAST(h_l_pico AS DOUBLE)),
             6) + 0.0 AS nmi,
       round((CAST(idx AS DOUBLE)
              - CAST(p_c AS DOUBLE) * CAST(p_l AS DOUBLE)
                / (CAST(N AS HUGEINT) * (N - 1) / 2))
             / ((CAST(p_c AS DOUBLE) + CAST(p_l AS DOUBLE)) / 2.0
                - CAST(p_c AS DOUBLE) * CAST(p_l AS DOUBLE)
                  / (CAST(N AS HUGEINT) * (N - 1) / 2)), 6) + 0.0 AS ari
FROM tot, mi, hc, hl
"""


# ---------------------------------------------------------------------------
# q241: average precision for ranked retrieval
# ---------------------------------------------------------------------------

_AP_PROBE = 0


def q241_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AP and P@10 for cosine retrieval of the probe's label class.
    Similarity rounds to a micro LONG before ranking, so the total
    order (sim desc, vec_id) is identical on both engines; ranks and
    running relevant-counts come from ONE ``global_running_sum`` pass
    (range partition + broadcast offsets, no single-reducer window);
    each hit's precision term rounds to picounits before the exact
    integer sum. Probe attaches as a broadcast single row."""
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    probe = emb.where(F.col("vec_id") == _AP_PROBE).select(
        F.col("embedding").alias("p_emb"), F.col("label").alias("p_label")
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("p_emb"),
            lambda a, b: a.cast("double") * b.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sq = lambda c: F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        emb.where(F.col("vec_id") != _AP_PROBE)
        .crossJoin(F.broadcast(probe))
        .select(
            "vec_id",
            (F.col("label") == F.col("p_label")).cast("long").alias("rel"),
            F.round(
                dot / F.sqrt(sq(F.col("embedding")) * sq(F.col("p_emb")))
                * 1e6,
                0,
            )
            .cast("long")
            .alias("sim_micro"),
        )
    )
    ranked = global_running_sum(
        scored,
        [F.desc("sim_micro"), F.asc("vec_id")],
        "rel",
        idx_col="rank",
        rsum_col="cum_rel",
        total_col="n_rel",
    )
    term_pico = F.when(
        F.col("rel") == 1,
        F.round(
            F.col("cum_rel").cast("double")
            / F.col("rank").cast("double")
            * 1e12,
            0,
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    g = ranked.groupBy("n_rel").agg(
        F.count("*").cast("long").alias("n_corpus"),
        F.sum(term_pico).cast("long").alias("ap_pico"),
        F.sum(
            ((F.col("rank") <= 10) & (F.col("rel") == 1)).cast("long")
        )
        .cast("long")
        .alias("rel_at_10"),
    )
    return g.select(
        "n_corpus",
        F.col("n_rel").alias("n_relevant"),
        (
            F.round(
                F.col("ap_pico").cast("double")
                / (F.col("n_rel").cast("double") * 1e12),
                6,
            )
            + F.lit(0.0)
        ).alias("average_precision"),
        (
            F.round(F.col("rel_at_10").cast("double") / 10.0, 6) + F.lit(0.0)
        ).alias("p_at_10"),
    )


ORACLE_Q241 = f"""
WITH probe AS (
  SELECT embedding AS p_emb, label AS p_label FROM embeddings
  WHERE vec_id = {_AP_PROBE}),
scored AS (
  SELECT vec_id,
         CASE WHEN label = p_label THEN 1 ELSE 0 END AS rel,
         CAST(round(
           list_reduce(list_prepend(0.0, list_transform(
             list_zip(embedding, p_emb),
             p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))),
             (a, x) -> a + x)
           / sqrt(
               list_reduce(list_prepend(0.0, list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
                 (a, x) -> a + x)
               * list_reduce(list_prepend(0.0, list_transform(p_emb,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
                 (a, x) -> a + x))
           * 1e6, 0) AS BIGINT) AS sim_micro
  FROM embeddings, probe WHERE vec_id != {_AP_PROBE}),
ranked AS (
  SELECT rel,
         CAST(ROW_NUMBER() OVER w AS BIGINT) AS rank,
         CAST(SUM(rel) OVER w AS BIGINT) AS cum_rel,
         CAST(SUM(rel) OVER () AS BIGINT) AS n_rel
  FROM scored
  WINDOW w AS (ORDER BY sim_micro DESC, vec_id ROWS UNBOUNDED PRECEDING))
SELECT CAST(COUNT(*) AS BIGINT) AS n_corpus,
       n_rel AS n_relevant,
       round(CAST(SUM(CASE WHEN rel = 1 THEN
               CAST(round(CAST(cum_rel AS DOUBLE) / rank * 1e12, 0) AS BIGINT)
             ELSE 0 END) AS BIGINT)
             / (CAST(n_rel AS DOUBLE) * 1e12), 6) + 0.0 AS average_precision,
       round(CAST(SUM(CASE WHEN rank <= 10 AND rel = 1 THEN 1 ELSE 0 END)
                  AS DOUBLE) / 10.0, 6) + 0.0 AS p_at_10
FROM ranked GROUP BY n_rel
"""


# ---------------------------------------------------------------------------
# q242: Kaplan-Meier survival over user lifetimes
# ---------------------------------------------------------------------------

_KM_CENSOR_DAYS = 7


def q242_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KM estimator of user lifetime (days between first and last
    event). Users whose last event is within 7 days of the corpus end
    are right-censored. Per distinct lifetime: deaths d_t and censored
    c_t are exact longs; the at-risk set comes from one distributed
    prefix pass over (d+c); the survival product is carried as exact
    picounit ln sums through a SECOND prefix pass and exponentiated
    once per output row. No unpartitioned window anywhere."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    end = ev.agg(F.max("ts").alias("_end"))
    per_user = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
        .crossJoin(F.broadcast(end))
        .select(
            F.datediff(F.to_date("last_ts"), F.to_date("first_ts"))
            .cast("long")
            .alias("t"),
            (
                F.col("last_ts")
                < F.col("_end") - F.expr(
                    f"INTERVAL {_KM_CENSOR_DAYS} DAYS"
                )
            )
            .cast("long")
            .alias("died"),
        )
    )
    per_t = per_user.groupBy("t").agg(
        F.sum("died").cast("long").alias("deaths"),
        F.sum(1 - F.col("died")).cast("long").alias("censored"),
    )
    p1 = global_running_sum(
        per_t.withColumn("leave", F.col("deaths") + F.col("censored")),
        [F.asc("t")],
        "leave",
        rsum_col="left_cum",
        total_col="n_users",
    ).withColumn(
        "at_risk", F.col("n_users") - F.col("left_cum") + F.col("leave")
    )
    ln_pico = F.when(
        F.col("deaths") > 0,
        F.round(
            F.log(
                1.0
                - F.col("deaths").cast("double")
                / F.col("at_risk").cast("double")
            )
            * 1e12,
            0,
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    p2 = global_running_sum(
        p1.withColumn("lnp", ln_pico),
        [F.asc("t")],
        "lnp",
        idx_col="_i2",
        rsum_col="ln_cum",
        total_col="_lt",
    )
    return p2.select(
        "t",
        "at_risk",
        "deaths",
        "censored",
        (
            F.round(F.exp(F.col("ln_cum").cast("double") / 1e12), 6)
            + F.lit(0.0)
        ).alias("survival"),
    ).orderBy("t")


ORACLE_Q242 = f"""
WITH ev AS (SELECT user_id, ts FROM events),
endt AS (SELECT MAX(ts) AS e FROM ev),
per_user AS (
  SELECT CAST(date_diff('day', CAST(MIN(ts) AS DATE),
                        CAST(MAX(ts) AS DATE)) AS BIGINT) AS t,
         CASE WHEN MAX(ts) < (SELECT e FROM endt)
                               - INTERVAL {_KM_CENSOR_DAYS} DAY
              THEN 1 ELSE 0 END AS died
  FROM ev GROUP BY user_id),
per_t AS (
  SELECT t, CAST(SUM(died) AS BIGINT) AS deaths,
         CAST(SUM(1 - died) AS BIGINT) AS censored
  FROM per_user GROUP BY t),
risk AS (
  SELECT t, deaths, censored,
         CAST(SUM(deaths + censored) OVER () AS BIGINT)
           - CAST(SUM(deaths + censored) OVER
               (ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT)
           + deaths + censored AS at_risk
  FROM per_t),
lns AS (
  SELECT t, deaths, censored, at_risk,
         CASE WHEN deaths > 0 THEN
           CAST(round(ln(1.0 - CAST(deaths AS DOUBLE) / at_risk) * 1e12, 0)
                AS BIGINT)
         ELSE 0 END AS lnp
  FROM risk)
SELECT t, at_risk, deaths, censored,
       round(exp(CAST(SUM(lnp) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                      AS DOUBLE) / 1e12), 6) + 0.0 AS survival
FROM lns ORDER BY t
"""


# ---------------------------------------------------------------------------
# q243: recursive-CTE BFS over the co-purchase graph
# ---------------------------------------------------------------------------

_BFS_MAX_HOPS = 3

_BFS_RECURSIVE_SQL = """
sym AS (
  SELECT src, dst FROM edges
  UNION ALL SELECT dst AS src, src AS dst FROM edges),
seed AS (SELECT MIN(src) AS s FROM edges),
walk AS (
  SELECT s AS node, 0 AS depth FROM seed
  UNION ALL
  SELECT DISTINCT sym.dst AS node, walk.depth + 1 AS depth
  FROM walk JOIN sym ON sym.src = walk.node
  WHERE walk.depth < {max_hops})
SELECT CAST(node AS BIGINT) AS node, CAST(MIN(depth) AS BIGINT) AS hops
FROM walk GROUP BY node ORDER BY hops, node
"""


def q243_recursive_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-hop BFS (<= 3) from the smallest co-purchase node, written
    as a RECURSIVE CTE and submitted as raw SQL text — the iterative
    cousin of q215's port-your-script path (Spark 4 executes the
    recursion as a bounded loop of joins). The same SQL shape runs on
    the DuckDB oracle. Cycle-safe: depth bound + min-depth collapse.
    The recursive member SELECTs DISTINCT, so each iteration carries
    the deduplicated FRONTIER (<= V rows/level) instead of every path
    — without it the dense co-purchase graph path-enumerates
    (measured at sf0.1: 14.6s -> 11.2s, and the walk materializes 4V
    rows instead of millions; the remaining cost is the per-level
    V x degree join, inherent to the SQL-loop shape). Spark 4 rejects
    distinct-UNION recursion; per-member DISTINCT is the supported
    spelling on both engines. The DataFrame-API
    equivalent at real scale is operators/graph.py's Pregel-as-joins
    BFS; this pins the SQL-text entry point."""
    _edges(spark, sf_dir).createOrReplaceTempView("q243_edges")
    return spark.sql(
        "WITH RECURSIVE "
        + _BFS_RECURSIVE_SQL.replace("edges", "q243_edges").format(
            max_hops=_BFS_MAX_HOPS
        )
    )


ORACLE_Q243 = (
    "WITH RECURSIVE "
    + _EDGES_SQL
    + ",\n"
    + _BFS_RECURSIVE_SQL.format(max_hops=_BFS_MAX_HOPS)
)


def batch48_registry() -> list[QueryDef]:
    return [
        QueryDef("q240_clustering_agreement", q240_clustering_agreement,
                 ORACLE_Q240,
                 "purity/NMI/ARI vs labels, exact contingency"),
        QueryDef("q241_average_precision", q241_average_precision,
                 ORACLE_Q241,
                 "retrieval AP + P@10 via distributed prefix ranks"),
        QueryDef("q242_kaplan_meier", q242_kaplan_meier, ORACLE_Q242,
                 "KM survival with censoring, picounit log-products"),
        QueryDef("q243_recursive_bfs", q243_recursive_bfs, ORACLE_Q243,
                 "min-hop BFS via recursive CTE raw-SQL path"),
    ]
