"""Batch 31: association rules, concentration metrics, and HITS.

- q194 association rules (Agrawal & Srikant 1994, pair grain): from
  the skew-capped co-purchase pairs, directed rules a→b with support,
  confidence and lift in integer micro-units — support counts and the
  container total all measured over the SAME capped container set, so
  the three statistics are mutually consistent and exactly replayable.
- q195 Lorenz curve + Gini coefficient of customer revenue — the
  concentration profile (how top-heavy is the corpus/revenue?) with
  cent-exact integers, a window-free global rank (``operators/
  ranking.global_row_number``), and the Gini numerator widened to
  DECIMAL(38,0) before its single integral division.
- q196 HITS hubs/authorities (Kleinberg 1999): two fixed iterations
  on the canonically-directed co-purchase edges, sum-normalized in
  scaled integers each half-step — the same reproducible fixed-point
  discipline as q119's PageRank and q180's k-core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_tables
from .catalog import QueryDef
from .catalog_batch18 import MAX_CONTAINER, _EDGES_SQL

# ---------------------------------------------------------------------------
# q194: association rules over co-purchase pairs
# ---------------------------------------------------------------------------

_RULES_TOP = 20


def q194_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 directed co-purchase rules by lift: confidence =
    1e6·n_pair div supp(a), lift = 1e6·n_pair·N div (supp(a)·supp(b)),
    with pair counts, item supports, and the basket total N all over
    the capped container set (q117's skew guard) — one shuffle for the
    baskets, one for the pairs, supports joined in (AQE broadcasts the
    O(items) table when it fits)."""
    from ..operators.graph import cooccurrence_edges

    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    ci = li.select(
        F.col("l_orderkey").alias("c"), F.col("l_partkey").alias("item")
    ).distinct().localCheckpoint(eager=False)
    cok = (
        ci.groupBy("c").agg(F.count("*").alias("_sz"))
        .where(F.col("_sz") <= MAX_CONTAINER)
        .select("c")
        .localCheckpoint(eager=False)
    )
    ok = ci.join(cok, on="c")
    supp = ok.groupBy("item").agg(
        F.count("*").cast("long").alias("supp")
    )
    n_baskets = cok.agg(F.count("*").cast("long").alias("_n"))
    # feed the already-checkpointed distinct (container, item) table
    # back in: ONE lineitem scan total, and supports/pairs provably
    # derive from the identical basket set
    pairs = cooccurrence_edges(
        ci, "c", "item",
        max_container_size=MAX_CONTAINER, count_pairs=True,
    )
    sym = pairs.select(
        F.col("src").alias("a"), F.col("dst").alias("b"), "n_shared"
    ).unionAll(
        pairs.select(
            F.col("dst").alias("a"), F.col("src").alias("b"), "n_shared"
        )
    )
    joined = (
        sym.join(supp.withColumnRenamed("item", "a")
                 .withColumnRenamed("supp", "supp_a"), on="a")
        .join(supp.withColumnRenamed("item", "b")
              .withColumnRenamed("supp", "supp_b"), on="b")
        .crossJoin(F.broadcast(n_baskets))
    )
    out = joined.select(
        "a", "b",
        F.col("n_shared").cast("long").alias("n_pair"),
        "supp_a", "supp_b",
        F.expr("1000000 * n_shared div supp_a")
        .cast("long").alias("conf_micro"),
        F.expr(
            "CAST(1000000 AS DECIMAL(38,0)) * n_shared * _n"
            " div (supp_a * supp_b)"
        ).cast("long").alias("lift_micro"),
    )
    return (
        out.orderBy(
            F.desc("lift_micro"), F.desc("conf_micro"),
            F.asc("a"), F.asc("b"),
        )
        .limit(_RULES_TOP)
    )


ORACLE_Q194 = f"""
WITH {_EDGES_SQL},
okitems AS (SELECT a.c, a.item FROM citems a JOIN cok ON a.c = cok.c),
supp AS (
  SELECT item, CAST(COUNT(*) AS BIGINT) AS supp
  FROM okitems GROUP BY item),
nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM cok),
wedges AS (
  SELECT a.item AS src, b.item AS dst, CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM citems a
  JOIN citems b ON a.c = b.c AND a.item < b.item
  JOIN cok ON a.c = cok.c
  GROUP BY 1, 2),
sym AS (
  SELECT src AS a, dst AS b, n_shared FROM wedges
  UNION ALL
  SELECT dst AS a, src AS b, n_shared FROM wedges),
rules AS (
  SELECT s.a, s.b, s.n_shared AS n_pair, sa.supp AS supp_a,
         sb.supp AS supp_b,
         CAST(1000000 * s.n_shared // sa.supp AS BIGINT) AS conf_micro,
         CAST(CAST(1000000 AS HUGEINT) * s.n_shared * nb.n
              // (sa.supp * sb.supp) AS BIGINT) AS lift_micro
  FROM sym s
  JOIN supp sa ON s.a = sa.item
  JOIN supp sb ON s.b = sb.item
  CROSS JOIN nb)
SELECT a, b, n_pair, supp_a, supp_b, conf_micro, lift_micro
FROM rules
ORDER BY lift_micro DESC, conf_micro DESC, a ASC, b ASC
LIMIT {_RULES_TOP}
"""


# ---------------------------------------------------------------------------
# q195: Lorenz curve + Gini coefficient
# ---------------------------------------------------------------------------


def q195_gini_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration: the Lorenz decile table (cumulative
    share of total revenue held by the poorest 10%..100% of customers)
    plus the Gini coefficient, everything cent-exact. The global
    revenue rank is window-free (``global_row_number``'s range-
    partitioned machinery); Gini = (2·Σ i·x_i − (n+1)·Σx) · 1e6
    div (n·Σx) with the numerator widened to DECIMAL(38,0). Customers
    without orders count as zero-revenue population."""
    from ..operators.ranking import global_row_number

    t = load_tables(spark, sf_dir, ["customer", "orders"])
    rev = (
        t["customer"].select("c_custkey")
        .join(
            t["orders"].groupBy("o_custkey").agg(
                F.sum(
                    F.expr("CAST(o_totalprice * 100 AS DECIMAL(20,0))")
                ).cast("long").alias("cents")
            ),
            t["customer"]["c_custkey"] == F.col("o_custkey"),
            "left",
        )
        .select(
            "c_custkey", F.coalesce(F.col("cents"), F.lit(0)).alias("cents")
        )
    )
    idx = global_row_number(
        rev, [F.asc("cents"), F.asc("c_custkey")], idx_col="i",
        total_col="n",
    )
    per_decile = (
        idx.select(
            F.expr("CASE WHEN 10 * i % n = 0 THEN (10 * i) div n "
                   "ELSE (10 * i) div n + 1 END").cast("long").alias("decile"),
            "cents", "i", "n",
        )
        .groupBy("decile")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum("cents").cast("long").alias("decile_cents"),
            F.sum(F.expr("CAST(i AS DECIMAL(38,0)) * cents")).alias("_ix"),
            F.first("n").alias("_n"),
        )
        .localCheckpoint(eager=False)
    )
    tot = per_decile.agg(
        F.sum("decile_cents").cast("long").alias("_total"),
        F.sum("_ix").alias("_sum_ix"),
        F.first("_n").alias("_nn"),
    )
    gini = F.expr(
        "(CAST(2 AS DECIMAL(38,0)) * _sum_ix"
        " - CAST(_nn + 1 AS DECIMAL(38,0)) * _total) * 1000000"
        " div (CAST(_nn AS DECIMAL(38,0)) * _total)"
    ).cast("long")
    # cumulative sum over the 10 decile rows via a tiny self-join
    # (d' <= d) — no window at all, not even a bounded one
    cum = (
        per_decile.alias("d")
        .join(
            per_decile.select(
                F.col("decile").alias("_d2"),
                F.col("decile_cents").alias("_c2"),
            ),
            F.col("_d2") <= F.col("d.decile"),
        )
        .groupBy("d.decile", "d.n_customers", "d.decile_cents")
        .agg(F.sum("_c2").cast("long").alias("cum_cents"))
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_customers",
            "decile_cents",
            "cum_cents",
            F.expr("1000000 * cum_cents div _total")
            .cast("long").alias("cum_share_micro"),
            gini.alias("gini_micro"),
        )
    )


ORACLE_Q195 = """
WITH rev AS (
  SELECT c.c_custkey,
         COALESCE(o.cents, 0) AS cents
  FROM customer c
  LEFT JOIN (
    SELECT o_custkey,
           CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(20,0))) AS BIGINT)
             AS cents
    FROM orders GROUP BY o_custkey) o
  ON c.c_custkey = o.o_custkey),
idx AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents ASC, c_custkey ASC) AS i,
         COUNT(*) OVER () AS n
  FROM rev),
per_decile AS (
  SELECT CASE WHEN 10 * i % n = 0 THEN (10 * i) // n
              ELSE (10 * i) // n + 1 END AS decile,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(cents) AS BIGINT) AS decile_cents,
         SUM(CAST(i AS DECIMAL(38,0)) * cents) AS six,
         ANY_VALUE(n) AS nn
  FROM idx GROUP BY 1),
tot AS (
  SELECT CAST(SUM(decile_cents) AS BIGINT) AS total,
         SUM(six) AS sum_ix,
         ANY_VALUE(nn) AS nn
  FROM per_decile)
SELECT CAST(d.decile AS BIGINT) AS decile, d.n_customers, d.decile_cents,
  CAST(SUM(d.decile_cents) OVER (ORDER BY d.decile
       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents,
  CAST(1000000 * SUM(d.decile_cents) OVER (ORDER BY d.decile
       ROWS UNBOUNDED PRECEDING) // t.total AS BIGINT)
    AS cum_share_micro,
  CAST((CAST(2 AS HUGEINT) * CAST(t.sum_ix AS HUGEINT)
        - CAST(t.nn + 1 AS HUGEINT) * t.total) * 1000000
       // (CAST(t.nn AS HUGEINT) * t.total) AS BIGINT) AS gini_micro
FROM per_decile d CROSS JOIN tot t
"""


# ---------------------------------------------------------------------------
# q196: HITS hubs & authorities
# ---------------------------------------------------------------------------

_HITS_SCALE = 10**9
_HITS_TOP = 15


def q196_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two HITS iterations on the canonically-directed (src < dst)
    co-purchase edges: authority ← Σ hub over in-edges, hub ← Σ
    authority over out-edges, each half-step sum-normalized to a 1e9
    integer budget (score·SCALE div Σscore — the same exact fixed-
    point discipline as q119). Top-15 authorities, total-order cut."""
    from ..operators.graph import cooccurrence_edges

    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    e = cooccurrence_edges(
        li, "l_orderkey", "l_partkey", max_container_size=MAX_CONTAINER
    ).localCheckpoint(eager=False)

    def normalize(scores: DataFrame, col: str) -> DataFrame:
        tot = scores.agg(F.sum(col).cast("long").alias("_t"))
        return (
            scores.crossJoin(F.broadcast(tot))
            .select(
                "node",
                F.expr(
                    f"CAST({col} AS DECIMAL(38,0)) * {_HITS_SCALE} div _t"
                ).cast("long").alias(col),
            )
            .localCheckpoint(eager=False)
        )

    hubs = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .select("node", F.lit(_HITS_SCALE).cast("long").alias("h"))
    )
    auth = None
    for _ in range(2):
        auth = normalize(
            e.join(hubs.withColumnRenamed("node", "src"), on="src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("h").cast("long").alias("a")),
            "a",
        )
        hubs = normalize(
            e.join(auth.withColumnRenamed("node", "dst"), on="dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("a").cast("long").alias("h")),
            "h",
        )
    return (
        auth.orderBy(F.desc("a"), F.asc("node"))
        .limit(_HITS_TOP)
        .select(F.col("node").alias("part"), F.col("a").alias("authority"))
    )


ORACLE_Q196 = f"""
WITH {_EDGES_SQL},
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
h0 AS (SELECT node, CAST({_HITS_SCALE} AS BIGINT) AS h FROM nodes),
a1r AS (
  SELECT e.dst AS node, CAST(SUM(h0.h) AS BIGINT) AS a
  FROM edges e JOIN h0 ON e.src = h0.node GROUP BY e.dst),
a1 AS (
  SELECT node, CAST(CAST(a AS HUGEINT) * {_HITS_SCALE}
       // (SELECT SUM(a) FROM a1r) AS BIGINT) AS a FROM a1r),
h1r AS (
  SELECT e.src AS node, CAST(SUM(a1.a) AS BIGINT) AS h
  FROM edges e JOIN a1 ON e.dst = a1.node GROUP BY e.src),
h1 AS (
  SELECT node, CAST(CAST(h AS HUGEINT) * {_HITS_SCALE}
       // (SELECT SUM(h) FROM h1r) AS BIGINT) AS h FROM h1r),
a2r AS (
  SELECT e.dst AS node, CAST(SUM(h1.h) AS BIGINT) AS a
  FROM edges e JOIN h1 ON e.src = h1.node GROUP BY e.dst),
a2 AS (
  SELECT node, CAST(CAST(a AS HUGEINT) * {_HITS_SCALE}
       // (SELECT SUM(a) FROM a2r) AS BIGINT) AS a FROM a2r)
SELECT node AS part, a AS authority
FROM a2 ORDER BY a DESC, node ASC LIMIT {_HITS_TOP}
"""


def batch31_registry() -> list[QueryDef]:
    return [
        QueryDef("q194_association_rules", q194_association_rules,
                 ORACLE_Q194,
                 "co-purchase association rules: confidence + lift"),
        QueryDef("q195_gini_lorenz", q195_gini_lorenz, ORACLE_Q195,
                 "Lorenz deciles + Gini, cent-exact, window-free rank"),
        QueryDef("q196_hits", q196_hits, ORACLE_Q196,
                 "HITS hubs/authorities, fixed-point normalized"),
    ]
