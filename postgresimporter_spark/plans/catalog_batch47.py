"""Batch 47: rank agreement, one-pass bootstrap, a Lloyd step, and
feature information gain.

- q236 Kendall tau — concordance between the 1995 and 1996 revenue
  rankings of the top-100 two-year customers: revenue in exact cents,
  top-k by distributed orderBy+limit, then a BOUNDED 100×100 pair
  join (broadcast, C(100,2) pairs — never corpus-quadratic);
  concordant/discordant/tie counts are exact longs, tau-a/tau-b are
  the only doubles. The rank-stability readout between periods,
  models, or ranking functions.
- q237 Poisson bootstrap CI — the 100 TB bootstrap: instead of
  resampling (a shuffle per replica), each row carries 64 Poisson(1)
  weights derived from ONE md5 per row (the digest's two halves form
  the universal family u_b = (h1 + b·h2) mod 2^60) against
  precomputed 2^60-scaled inverse-CDF thresholds — ONE pass, exact
  integer weighted sums per replica, nearest-rank 2.5/97.5% bounds
  over the 64 replica means. Engine-portable: both sides hash the
  same string and run the same integer arithmetic.
- q238 Lloyd iteration — one exact k-means step on the embeddings:
  assign to the nearest of 8 broadcast seed centroids (left-fold
  squared L2 in fixed array order — deterministic double), then
  recompute centroids with per-dimension MICRO-integer sums (the
  float->round(x*1e6) discipline) so the means are exact integer
  ratios. The building block of the distributed k-means loop; one
  shuffle (the assignment groupBy).
- q239 information gain — H(label) − Σ_v p_v·H(label|v) for
  candidate order features (priority, order year) against the
  'F' status label: all counts exact longs, per-value entropy terms
  rounded to picounits BEFORE summing (q235's discipline), so the
  feature ranking is bit-stable. The split-scoring operator of
  decision-tree/feature-selection pipelines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_tables
from .catalog import QueryDef

# ---------------------------------------------------------------------------
# q236: Kendall tau between two period rankings
# ---------------------------------------------------------------------------

_KT_TOPK = 100
_KT_YEAR_A, _KT_YEAR_B = 1995, 1996


def q236_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tau over the top-100 customers (by year-A revenue, total-order
    tiebreak) present in both years. The pair expansion joins the
    bounded top-k against itself (broadcast — 4,950 pairs), so the
    quadratic term is capped by construction regardless of corpus
    size; everything upstream is equi-joins on custkey."""
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    cents = F.expr("CAST(round(o_totalprice * 100, 0) AS DECIMAL(20,0))").cast(
        "long"
    )

    def rev(year):
        return (
            o.where(F.year("o_orderdate") == year)
            .groupBy("o_custkey")
            .agg(F.sum(cents).cast("long").alias(f"rev{year}"))
        )

    both = rev(_KT_YEAR_A).join(rev(_KT_YEAR_B), on="o_custkey")
    top = both.orderBy(
        F.desc(f"rev{_KT_YEAR_A}"), F.asc("o_custkey")
    ).limit(_KT_TOPK)
    a, b = top.alias("a"), top.alias("b")
    ra, rb = f"rev{_KT_YEAR_A}", f"rev{_KT_YEAR_B}"
    pairs = a.join(
        F.broadcast(b), F.col("a.o_custkey") < F.col("b.o_custkey")
    ).select(
        (F.col(f"a.{ra}") - F.col(f"b.{ra}")).alias("da"),
        (F.col(f"a.{rb}") - F.col(f"b.{rb}")).alias("db"),
    )
    g = pairs.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(((F.col("da") * F.col("db")) > 0).cast("long"))
        .cast("long")
        .alias("concordant"),
        F.sum(((F.col("da") * F.col("db")) < 0).cast("long"))
        .cast("long")
        .alias("discordant"),
        F.sum((F.col("da") == 0).cast("long")).cast("long").alias("ties_a"),
        F.sum((F.col("db") == 0).cast("long")).cast("long").alias("ties_b"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    num = d("concordant") - d("discordant")
    return g.select(
        "n_pairs",
        "concordant",
        "discordant",
        "ties_a",
        "ties_b",
        (F.round(num / d("n_pairs"), 6) + F.lit(0.0)).alias("tau_a"),
        (
            F.round(
                num
                / F.sqrt(
                    (d("n_pairs") - d("ties_a"))
                    * (d("n_pairs") - d("ties_b"))
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("tau_b"),
    )


ORACLE_Q236 = f"""
WITH rev AS (
  SELECT o_custkey, year(o_orderdate) AS y,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS DECIMAL(20,0)))
              AS BIGINT) AS rev
  FROM orders WHERE year(o_orderdate) IN ({_KT_YEAR_A}, {_KT_YEAR_B})
  GROUP BY 1, 2),
two AS (
  SELECT a.o_custkey, a.rev AS ra, b.rev AS rb
  FROM rev a JOIN rev b USING (o_custkey)
  WHERE a.y = {_KT_YEAR_A} AND b.y = {_KT_YEAR_B}),
top AS (
  SELECT * FROM two ORDER BY ra DESC, o_custkey LIMIT {_KT_TOPK}),
pairs AS (
  SELECT a.ra - b.ra AS da, a.rb - b.rb AS db
  FROM top a JOIN top b ON a.o_custkey < b.o_custkey),
g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(CASE WHEN da * db > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS concordant,
         CAST(SUM(CASE WHEN da * db < 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS discordant,
         CAST(SUM(CASE WHEN da = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ties_a,
         CAST(SUM(CASE WHEN db = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ties_b
  FROM pairs)
SELECT n_pairs, concordant, discordant, ties_a, ties_b,
       round((CAST(concordant AS DOUBLE) - discordant)
             / CAST(n_pairs AS DOUBLE), 6) + 0.0 AS tau_a,
       round((CAST(concordant AS DOUBLE) - discordant)
             / sqrt((CAST(n_pairs AS DOUBLE) - ties_a)
                    * (CAST(n_pairs AS DOUBLE) - ties_b)), 6) + 0.0 AS tau_b
FROM g
"""


# ---------------------------------------------------------------------------
# q237: Poisson bootstrap confidence interval
# ---------------------------------------------------------------------------

_BOOT_B = 64
# floor(P(Poisson(1) <= k) * 2^60) for k = 0..7; u >= the last entry
# draws weight 8 (P ~ 1e-6). Identical integer literals on both engines.
_POIS_CDF_260 = tuple(
    math.floor(
        sum(math.exp(-1) / math.factorial(j) for j in range(k + 1)) * (1 << 60)
    )
    for k in range(8)
)


def _poisson_weight_spark(u) -> F.Column:
    w = F.lit(8)
    for k in range(7, -1, -1):
        w = F.when(u < F.lit(_POIS_CDF_260[k]), F.lit(k)).otherwise(w)
    return w.cast("long")


_POIS_CASE_SQL = (
    "CASE "
    + " ".join(
        f"WHEN u < {t} THEN {k}" for k, t in enumerate(_POIS_CDF_260)
    )
    + " ELSE 8 END"
)


def q237_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap CI for the mean order price, one pass: every
    order contributes Poisson(1)-weighted cents to each of 64
    replicas. The per-replica uniform comes from ONE md5 per ORDER
    (not per (order, replica) — 64x fewer hashes, measured 17.8s ->
    ~4s at sf0.1): the digest's two halves h1 (60-bit) and h2
    (52-bit) form the universal family u_b = (h1 + b·h2) mod 2^60 —
    uniform per replica, pairwise-independent across replicas, the
    sums bounded far inside signed-64 — compared against the
    2^60-scaled Poisson inverse CDF (exact integers, engine-
    portable). Replica means are exact-long ratios; the interval is
    the nearest-rank 2.5/97.5% of the 64 means (ceil(0.025·64)=2nd,
    ceil(0.975·64)=63rd). The only shuffle is the 64-key replica
    aggregation."""
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    cents = F.expr("CAST(round(o_totalprice * 100, 0) AS DECIMAL(20,0))").cast(
        "long"
    )
    digest = F.md5(F.concat(F.lit("pb:"), F.col("o_orderkey").cast("string")))
    base = o.select(
        "o_orderkey",
        cents.alias("cents"),
        F.conv(F.substring(digest, 1, 15), 16, 10).cast("long").alias("h1"),
        F.conv(F.substring(digest, 16, 13), 16, 10).cast("long").alias("h2"),
    )
    rep = base.select(
        "cents",
        "h1",
        "h2",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
    )
    u = (F.col("h1") + F.col("b") * F.col("h2")) % F.lit(1 << 60)
    w = _poisson_weight_spark(u)
    per = (
        rep.select("b", w.alias("w"), (w * F.col("cents")).alias("wc"))
        .groupBy("b")
        .agg(
            F.sum("w").cast("long").alias("n"),
            F.sum("wc").cast("long").alias("s"),
        )
        .where(F.col("n") > 0)
        .select(
            (
                F.round(F.col("s").cast("double") / F.col("n").cast("double"), 6)
                + F.lit(0.0)
            ).alias("mean_b")
        )
    )
    means = per.agg(
        F.sort_array(F.collect_list("mean_b")).alias("ms"),
        F.count("*").cast("long").alias("n_replicas"),
    )
    overall = base.agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("total_cents"),
    )
    lo_i = math.ceil(0.025 * _BOOT_B)
    hi_i = math.ceil(0.975 * _BOOT_B)
    return means.crossJoin(F.broadcast(overall)).select(
        "n_orders",
        "n_replicas",
        (
            F.round(
                F.col("total_cents").cast("double")
                / F.col("n_orders").cast("double"),
                6,
            )
            + F.lit(0.0)
        ).alias("mean_cents"),
        F.element_at("ms", lo_i).alias("boot_lo_cents"),
        F.element_at("ms", hi_i).alias("boot_hi_cents"),
    )


ORACLE_Q237 = f"""
WITH base AS (
  SELECT o_orderkey,
         CAST(CAST(round(o_totalprice * 100, 0) AS DECIMAL(20,0)) AS BIGINT)
           AS cents,
         ('0x' || substr(md5('pb:' || CAST(o_orderkey AS VARCHAR)),
                         1, 15))::BIGINT AS h1,
         ('0x' || substr(md5('pb:' || CAST(o_orderkey AS VARCHAR)),
                         16, 13))::BIGINT AS h2
  FROM orders),
rep AS (
  SELECT cents, b, (h1 + b * h2) % {1 << 60} AS u
  FROM base, generate_series(0, {_BOOT_B - 1}) AS t(b)),
weighted AS (
  SELECT b, {_POIS_CASE_SQL} AS w, cents FROM rep),
per AS (
  SELECT b, CAST(SUM(w) AS BIGINT) AS n, CAST(SUM(w * cents) AS BIGINT) AS s
  FROM weighted GROUP BY b HAVING SUM(w) > 0),
means AS (
  SELECT list_sort(list(round(CAST(s AS DOUBLE) / n, 6) + 0.0)) AS ms,
         CAST(COUNT(*) AS BIGINT) AS n_replicas
  FROM per),
overall AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(cents) AS BIGINT) AS total_cents
  FROM base)
SELECT n_orders, n_replicas,
       round(CAST(total_cents AS DOUBLE) / n_orders, 6) + 0.0 AS mean_cents,
       ms[{math.ceil(0.025 * _BOOT_B)}] AS boot_lo_cents,
       ms[{math.ceil(0.975 * _BOOT_B)}] AS boot_hi_cents
FROM means, overall
"""


# ---------------------------------------------------------------------------
# q238: one Lloyd (k-means) iteration on the embeddings
# ---------------------------------------------------------------------------

_KM_K = 8


def _nearest_seed_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, embedding, cluster): each embedding assigned to
    the nearest of the 8 broadcast seed centroids (vec_id 0..7) by a
    fixed-order left-fold squared L2 (bit-identical doubles on both
    engines), seed-id tiebreak. Shared by q238 (Lloyd step) and q240
    (clustering agreement)."""
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    seeds = emb.where(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("seed_id"), F.col("embedding").alias("s_emb")
    )
    dist = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("s_emb"),
            lambda a, b: (a.cast("double") - b.cast("double"))
            * (a.cast("double") - b.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        emb.crossJoin(F.broadcast(seeds))
        .select(
            "vec_id",
            "label",
            "embedding",
            F.struct(dist.alias("d"), F.col("seed_id").alias("c")).alias("dc"),
        )
        .groupBy("vec_id")
        .agg(
            F.min("dc").alias("best"),
            F.first("label").alias("label"),
            F.first("embedding").alias("embedding"),
        )
        .select(
            "vec_id", "label", "embedding", F.col("best.c").alias("cluster")
        )
    )


def q238_lloyd_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact Lloyd step: nearest-of-8-seeds assignment (seeds =
    vec_id 0..7, broadcast; squared L2 as a left fold over the array —
    fixed order, so the double is bit-identical on both engines;
    seed-id tiebreak), then per-dimension centroid means from MICRO
    integer sums (round(x·1e6) longs — addition-order-proof). Output
    is the (cluster, dim) centroid table with assignment counts.
    At scale this is the k-means inner loop: one broadcast, one
    assignment groupBy shuffle per iteration."""
    assigned = _nearest_seed_assignment(spark, sf_dir).select(
        "cluster", F.posexplode("embedding").alias("dim", "x")
    )
    micro = F.round(F.col("x").cast("double") * 1e6, 0).cast("long")
    cent = (
        assigned.select("cluster", "dim", micro.alias("m"))
        .groupBy("cluster", "dim")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("m").cast("long").alias("s"),
        )
    )
    return cent.select(
        "cluster",
        "dim",
        "n",
        (
            F.round(
                F.col("s").cast("double")
                / (F.col("n").cast("double") * 1e6),
                6,
            )
            + F.lit(0.0)
        ).alias("centroid"),
    ).orderBy("cluster", "dim")


_ASSIGN_SQL = f"""seeds AS (
  SELECT vec_id AS seed_id, embedding AS s_emb FROM embeddings
  WHERE vec_id < {_KM_K}),
dists AS (
  SELECT e.vec_id, e.label, e.embedding, s.seed_id,
         list_reduce(
           list_prepend(0.0, list_transform(
             list_zip(e.embedding, s.s_emb),
             p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                  * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))),
           (a, x) -> a + x) AS d
  FROM embeddings e, seeds s),
assigned AS (
  SELECT vec_id, label, embedding, seed_id AS cluster
  FROM (SELECT vec_id, label, embedding, seed_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d, seed_id) AS rk
        FROM dists)
  WHERE rk = 1)"""


ORACLE_Q238 = f"""
WITH {_ASSIGN_SQL},
dims AS (
  SELECT cluster,
         CAST(unnest(range(len(embedding))) AS INTEGER) AS dim,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1e6, 0) AS BIGINT)
           AS m
  FROM assigned)
SELECT cluster, dim, CAST(COUNT(*) AS BIGINT) AS n,
       round(CAST(SUM(m) AS BIGINT)
             / (CAST(COUNT(*) AS DOUBLE) * 1e6), 6) + 0.0 AS centroid
FROM dims GROUP BY cluster, dim
ORDER BY cluster, dim
"""


# ---------------------------------------------------------------------------
# q239: feature information gain
# ---------------------------------------------------------------------------


def q239_info_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Information gain of candidate order features against the
    label (o_orderstatus = 'F'): counts are exact longs; each feature
    value's weighted conditional-entropy term (n_v/N)·H(label|v)
    rounds to picounits before the per-feature sum, and H(label)
    itself is computed from the same integer counts — so gain and
    the feature ranking are bit-stable across engines."""
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    lab = (F.col("o_orderstatus") == "F").cast("long")
    feats = o.select(
        lab.alias("y"),
        F.explode(
            F.array(
                F.struct(
                    F.lit("priority").alias("feature"),
                    F.col("o_orderpriority").alias("value"),
                ),
                F.struct(
                    F.lit("order_year").alias("feature"),
                    F.year("o_orderdate").cast("string").alias("value"),
                ),
            )
        ).alias("fv"),
    ).select("y", "fv.feature", "fv.value")
    per_value = feats.groupBy("feature", "value").agg(
        F.count("*").cast("long").alias("n_v"),
        F.sum("y").cast("long").alias("pos_v"),
    )
    tot = per_value.where(F.col("feature") == "priority").agg(
        F.sum("n_v").cast("long").alias("N"),
        F.sum("pos_v").cast("long").alias("POS"),
    )
    d = lambda c: c.cast("double")  # noqa: E731

    def _h(pos, n):
        p = d(pos) / d(n)
        q = d(n - pos) / d(n)
        return F.when(
            (pos > 0) & (pos < n), -(p * F.log(p) + q * F.log(q))
        ).otherwise(F.lit(0.0))

    j = per_value.crossJoin(F.broadcast(tot))
    term_pico = F.round(
        (d(F.col("n_v")) / d(F.col("N")))
        * _h(F.col("pos_v"), F.col("n_v"))
        * 1e12,
        0,
    ).cast("long")
    per_feature = j.select(
        "feature", term_pico.alias("t"), F.col("N"), F.col("POS")
    ).groupBy("feature", "N", "POS").agg(
        F.sum("t").cast("long").alias("cond_pico"),
        F.count("*").cast("long").alias("n_values"),
    )
    h_label = F.round(_h(F.col("POS"), F.col("N")) * 1e12, 0).cast("long")
    return per_feature.select(
        "feature",
        "n_values",
        (
            F.round(h_label.cast("double") / 1e12, 6) + F.lit(0.0)
        ).alias("h_label"),
        (
            F.round(F.col("cond_pico").cast("double") / 1e12, 6) + F.lit(0.0)
        ).alias("h_cond"),
        (
            F.round(
                (h_label - F.col("cond_pico")).cast("double") / 1e12, 6
            )
            + F.lit(0.0)
        ).alias("gain"),
    ).orderBy("feature")


ORACLE_Q239 = """
WITH feats AS (
  SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
         f.feature,
         CASE WHEN f.feature = 'priority' THEN o_orderpriority
              ELSE CAST(year(o_orderdate) AS VARCHAR) END AS value
  FROM orders,
       (SELECT unnest(['priority', 'order_year']) AS feature) f),
per_value AS (
  SELECT feature, value, CAST(COUNT(*) AS BIGINT) AS n_v,
         CAST(SUM(y) AS BIGINT) AS pos_v
  FROM feats GROUP BY 1, 2),
tot AS (
  SELECT CAST(SUM(n_v) AS BIGINT) AS N, CAST(SUM(pos_v) AS BIGINT) AS POS
  FROM per_value WHERE feature = 'priority'),
terms AS (
  SELECT feature, N, POS,
         CAST(round((CAST(n_v AS DOUBLE) / N)
           * (CASE WHEN pos_v > 0 AND pos_v < n_v THEN
                -((CAST(pos_v AS DOUBLE) / n_v) * ln(CAST(pos_v AS DOUBLE) / n_v)
                  + (CAST(n_v - pos_v AS DOUBLE) / n_v)
                    * ln(CAST(n_v - pos_v AS DOUBLE) / n_v))
              ELSE 0.0 END) * 1e12, 0) AS BIGINT) AS t
  FROM per_value, tot),
per_feature AS (
  SELECT feature, N, POS, CAST(SUM(t) AS BIGINT) AS cond_pico,
         CAST(COUNT(*) AS BIGINT) AS n_values
  FROM terms GROUP BY 1, 2, 3),
lab AS (
  SELECT feature, n_values, cond_pico,
         CAST(round((CASE WHEN POS > 0 AND POS < N THEN
             -((CAST(POS AS DOUBLE) / N) * ln(CAST(POS AS DOUBLE) / N)
               + (CAST(N - POS AS DOUBLE) / N)
                 * ln(CAST(N - POS AS DOUBLE) / N))
           ELSE 0.0 END) * 1e12, 0) AS BIGINT) AS h_pico
  FROM per_feature)
SELECT feature, n_values,
       round(CAST(h_pico AS DOUBLE) / 1e12, 6) + 0.0 AS h_label,
       round(CAST(cond_pico AS DOUBLE) / 1e12, 6) + 0.0 AS h_cond,
       round(CAST(h_pico - cond_pico AS DOUBLE) / 1e12, 6) + 0.0 AS gain
FROM lab
ORDER BY feature
"""


def batch47_registry() -> list[QueryDef]:
    return [
        QueryDef("q236_kendall_tau", q236_kendall_tau, ORACLE_Q236,
                 "Kendall tau rank agreement over bounded top-k pairs"),
        QueryDef("q237_poisson_bootstrap", q237_poisson_bootstrap,
                 ORACLE_Q237,
                 "one-pass Poisson bootstrap CI, exact integer weights"),
        QueryDef("q238_lloyd_iteration", q238_lloyd_iteration, ORACLE_Q238,
                 "exact k-means Lloyd step with micro-integer centroids"),
        QueryDef("q239_info_gain", q239_info_gain, ORACLE_Q239,
                 "feature information gain, picounit-exact entropies"),
    ]
