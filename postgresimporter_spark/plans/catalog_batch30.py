"""Batch 30: sketch-based join planning, exact quota allocation, and
predictive-feature diagnostics.

- q191 KMV join-cardinality estimation (Beyer et al., SIGMOD 2007):
  the k-minimum-values synopsis of each join side answers
  |A ∪ B|, Jaccard, and |A ∩ B| from 2·k tiny rows — the statistics a
  cost-based planner (or the engine's own q157 skew planner) wants
  BEFORE shuffling 100 TB. Integer-exact end to end: the union
  estimate reuses q161's (k−1)·M div h_k arithmetic, Jaccard and the
  intersection come out in micro-units/integers, and the exact answer
  sits beside the estimate (the q97/q175 self-grading pattern).
- q192 largest-remainder (Hamilton) quota allocation: distribute a
  fixed sample budget across sources exactly proportionally — floor
  seats + ranked remainders, all integer, the deterministic answer to
  "give me 1000 docs spread like the corpus". Remainder ranks come
  from a tiny self-join count, not a window (the group list is
  dictionary-sized but the no-unpartitioned-window rule is absolute).
- q193 WOE / IV feature binning (the credit-scoring standard): per
  feature bin, weight-of-evidence ln((good share)/(bad share)) and
  the bin's information-value contribution — one ln and one division
  per bin on exact integer inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_tables
from .catalog import QueryDef

# ---------------------------------------------------------------------------
# q191: KMV join-cardinality estimation
# ---------------------------------------------------------------------------

_JK = 64           # synopsis size per side
_JM = 1 << 60      # 60-bit md5 hash space


def q191_kmv_join_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join cardinality forecast for orders.o_custkey ⋈ positive-
    balance customers: each side's 64 smallest md5 hashes (the KMV
    synopsis), the union synopsis' k-th value for |A ∪ B|, the
    fraction of union-synopsis members present in both sides for
    Jaccard, and their product for |A ∩ B| — alongside the exact
    intersection so the estimate grades itself. After the two
    TakeOrdered cuts everything is ≤ 2·k rows."""
    t = load_tables(spark, sf_dir, ["orders", "customer"])
    a = t["orders"].select(F.col("o_custkey").alias("v")).distinct()
    b = (
        t["customer"]
        .where(F.col("c_acctbal") > 0)
        .select(F.col("c_custkey").alias("v"))
        .distinct()
    )

    def kmin(df: DataFrame) -> DataFrame:
        h = F.conv(
            F.substring(F.md5(F.col("v").cast("string")), 1, 15), 16, 10
        ).cast("long")
        return df.select(h.alias("h")).orderBy("h").limit(_JK)

    ka = kmin(a).localCheckpoint(eager=False)
    kb = kmin(b).localCheckpoint(eager=False)
    union_k = (
        ka.unionAll(kb).distinct().orderBy("h").limit(_JK)
        .localCheckpoint(eager=False)
    )
    kth = union_k.orderBy(F.desc("h")).limit(1).select(
        F.col("h").alias("h_k")
    )
    both = (
        union_k.join(ka, on="h").join(kb, on="h")
        .agg(F.count("*").cast("long").alias("n_both"))
    )
    est_union = F.expr(
        f"CAST({_JK - 1} AS DECIMAL(38,0)) * {_JM} div h_k"
    ).cast("long")
    exact = a.join(b, on="v").agg(
        F.count("*").cast("long").alias("exact_intersect")
    )
    return (
        both.crossJoin(kth)
        .crossJoin(exact)
        .select(
            F.lit(_JK).cast("long").alias("k"),
            "n_both",
            est_union.alias("est_union"),
            F.expr(f"1000000 * n_both div {_JK}")
            .cast("long")
            .alias("jaccard_micro"),
            (est_union * F.col("n_both"))
            .cast("long")
            .alias("_t"),
            "exact_intersect",
        )
        .select(
            "k",
            "n_both",
            "est_union",
            "jaccard_micro",
            F.expr(f"_t div {_JK}").cast("long").alias("est_intersect"),
            "exact_intersect",
        )
    )


ORACLE_Q191 = f"""
WITH a AS (SELECT DISTINCT o_custkey AS v FROM orders),
b AS (SELECT DISTINCT c_custkey AS v FROM customer WHERE c_acctbal > 0),
ha AS (
  SELECT ('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM a ORDER BY h LIMIT {_JK}),
hb AS (
  SELECT ('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM b ORDER BY h LIMIT {_JK}),
uk AS (
  SELECT DISTINCT h FROM (SELECT h FROM ha UNION ALL SELECT h FROM hb)
  ORDER BY h LIMIT {_JK}),
kth AS (SELECT MAX(h) AS h_k FROM uk),
nboth AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_both
  FROM uk JOIN ha USING (h) JOIN hb USING (h)),
exact AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS exact_intersect
  FROM a JOIN b USING (v)),
est AS (
  SELECT CAST(CAST({_JK - 1} AS HUGEINT) * {_JM} // h_k AS BIGINT)
           AS est_union
  FROM kth)
SELECT CAST({_JK} AS BIGINT) AS k, n_both, est_union,
       CAST(1000000 * n_both // {_JK} AS BIGINT) AS jaccard_micro,
       CAST(est_union * n_both // {_JK} AS BIGINT) AS est_intersect,
       exact_intersect
FROM nboth CROSS JOIN est CROSS JOIN exact
"""


# ---------------------------------------------------------------------------
# q192: largest-remainder (Hamilton) quota allocation
# ---------------------------------------------------------------------------

_BUDGET = 1000


def q192_largest_remainder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allocate a 1000-document sample budget across sources exactly
    proportionally (Hamilton's method): floor(S·c/total) seats each,
    then one extra seat to the largest remainders until the budget is
    spent — pure integer arithmetic, remainder ties broken by source
    name. Ranks come from a self-join count over the source list
    (dictionary-sized), not a window. Σ quota = S exactly, the
    property naive rounding breaks."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    counts = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    tot = counts.agg(F.sum("n_docs").cast("long").alias("_total"))
    base = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            F.expr(f"({_BUDGET} * n_docs) div _total")
            .cast("long").alias("floor_seats"),
            F.expr(f"({_BUDGET} * n_docs) % _total")
            .cast("long").alias("rem"),
            "_total",
        )
        .localCheckpoint(eager=False)
    )
    leftover = base.agg(
        (F.lit(_BUDGET) - F.sum("floor_seats")).cast("long").alias("_left")
    )
    other = base.select(
        F.col("source").alias("_s2"),
        F.col("rem").alias("_r2"),
    )
    ranked = (
        base.join(
            other,
            (F.col("_r2") > F.col("rem"))
            | ((F.col("_r2") == F.col("rem")) & (F.col("_s2") < F.col("source"))),
            "left",
        )
        .groupBy("source", "n_docs", "floor_seats", "rem")
        .agg((F.count("_s2") + 1).cast("long").alias("rem_rank"))
    )
    return (
        ranked.crossJoin(F.broadcast(leftover))
        .select(
            "source",
            "n_docs",
            "floor_seats",
            "rem",
            "rem_rank",
            (
                F.col("floor_seats")
                + (F.col("rem_rank") <= F.col("_left")).cast("long")
            ).cast("long").alias("quota"),
        )
    )


ORACLE_Q192 = f"""
WITH counts AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY source),
tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total FROM counts),
base AS (
  SELECT source, n_docs,
         CAST(({_BUDGET} * n_docs) // total AS BIGINT) AS floor_seats,
         CAST(({_BUDGET} * n_docs) % total AS BIGINT) AS rem
  FROM counts CROSS JOIN tot),
leftover AS (
  SELECT CAST({_BUDGET} - SUM(floor_seats) AS BIGINT) AS leftn FROM base),
ranked AS (
  SELECT b.source, b.n_docs, b.floor_seats, b.rem,
         CAST(1 + COUNT(o.source) AS BIGINT) AS rem_rank
  FROM base b
  LEFT JOIN base o
    ON o.rem > b.rem OR (o.rem = b.rem AND o.source < b.source)
  GROUP BY b.source, b.n_docs, b.floor_seats, b.rem)
SELECT source, n_docs, floor_seats, rem, rem_rank,
       CAST(floor_seats + CASE WHEN rem_rank <= leftn THEN 1 ELSE 0 END
            AS BIGINT) AS quota
FROM ranked CROSS JOIN leftover
"""


# ---------------------------------------------------------------------------
# q193: weight-of-evidence / information-value binning
# ---------------------------------------------------------------------------


def q193_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WOE/IV readout for a candidate feature: users binned by error-
    event count (err div 5, capped at bin 3 — spreads the ~13-error
    mean across four populated bins), labeled good when they purchase more
    than they click (q189's balanced criterion). Per bin:
    WOE = ln((good_i·bad_tot)/(bad_i·good_tot)) — the ratio is ONE
    double division of exact integer products — and the IV
    contribution (good% − bad%)·WOE with shares as exact-integer-
    derived doubles. Bins with a missing class are excluded (their
    WOE is ±∞ by definition)."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    per_user = ev.groupBy("user_id").agg(
        (
            F.sum((F.col("event_type") == "purchase").cast("int"))
            > F.sum((F.col("event_type") == "click").cast("int"))
        ).cast("int").alias("good"),
        F.sum((F.col("event_type") == "error").cast("int")).alias("_err"),
    )
    binned = per_user.select(
        F.least(F.expr("_err div 5"), F.lit(3)).cast("long").alias("bin"),
        "good",
    )
    per_bin = binned.groupBy("bin").agg(
        F.sum("good").cast("long").alias("n_good"),
        F.sum(F.lit(1) - F.col("good")).cast("long").alias("n_bad"),
    )
    tots = per_bin.agg(
        F.sum("n_good").cast("long").alias("_gt"),
        F.sum("n_bad").cast("long").alias("_bt"),
    )
    j = per_bin.crossJoin(F.broadcast(tots)).where(
        (F.col("n_good") > 0) & (F.col("n_bad") > 0)
    )
    woe = F.expr(
        "ln(CAST(n_good * _bt AS DOUBLE) / CAST(n_bad * _gt AS DOUBLE))"
    )
    iv = F.expr(
        "(CAST(n_good AS DOUBLE) / CAST(_gt AS DOUBLE)"
        " - CAST(n_bad AS DOUBLE) / CAST(_bt AS DOUBLE))"
        " * ln(CAST(n_good * _bt AS DOUBLE) / CAST(n_bad * _gt AS DOUBLE))"
    )
    return j.select(
        "bin",
        "n_good",
        "n_bad",
        F.round(woe, 6).alias("woe"),
        F.round(iv, 6).alias("iv_contrib"),
    )


ORACLE_Q193 = """
WITH per_user AS (
  SELECT user_id,
         CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   > SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              THEN 1 ELSE 0 END AS good,
         SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS err
  FROM events GROUP BY user_id),
binned AS (
  SELECT CAST(LEAST(err // 5, 3) AS BIGINT) AS bin, good FROM per_user),
per_bin AS (
  SELECT bin, CAST(SUM(good) AS BIGINT) AS n_good,
         CAST(SUM(1 - good) AS BIGINT) AS n_bad
  FROM binned GROUP BY bin),
tots AS (
  SELECT CAST(SUM(n_good) AS BIGINT) AS gt,
         CAST(SUM(n_bad) AS BIGINT) AS bt
  FROM per_bin)
SELECT bin, n_good, n_bad,
  round(ln(CAST(n_good * bt AS DOUBLE) / CAST(n_bad * gt AS DOUBLE)), 6)
    AS woe,
  round((CAST(n_good AS DOUBLE) / CAST(gt AS DOUBLE)
         - CAST(n_bad AS DOUBLE) / CAST(bt AS DOUBLE))
        * ln(CAST(n_good * bt AS DOUBLE) / CAST(n_bad * gt AS DOUBLE)), 6)
    AS iv_contrib
FROM per_bin CROSS JOIN tots
WHERE n_good > 0 AND n_bad > 0
"""


def batch30_registry() -> list[QueryDef]:
    return [
        QueryDef("q191_kmv_join_estimate", q191_kmv_join_estimate,
                 ORACLE_Q191,
                 "KMV synopsis join-cardinality forecast vs exact"),
        QueryDef("q192_largest_remainder", q192_largest_remainder,
                 ORACLE_Q192,
                 "Hamilton largest-remainder sample-quota allocation"),
        QueryDef("q193_woe_iv", q193_woe_iv, ORACLE_Q193,
                 "weight-of-evidence / IV feature binning"),
    ]
