"""Batch 51: Cramér–von Mises drift, market concentration, diversity
indexes, and behavioral edit distance.

- q252 Cramér–von Mises — the whole-distribution companion to q204's
  KS: T = nm/(n+m)² · Σ_pooled (F1−F2)². With per-level counts the
  squared CDF gap is (m·cum_a − n·cum_b)²/(n·m)², so the statistic is
  a SINGLE exact integer sum (DECIMAL lane-packed prefix pass, q204's
  layout) with one final division. KS sees the worst point; CvM sees
  the whole curve — drift monitoring wants both.
- q253 HHI concentration — Herfindahl–Hirschman index of customer
  revenue share per nation: HHI = Σ share² = Σc_i² / (Σc_i)² — a
  ratio of two exact integer aggregates (cents², DECIMAL), one
  double per nation. The market-concentration readout.
- q254 diversity indexes — per-source token Shannon H (picounit-
  accumulated), EXACT Simpson 1 − Σn(n−1)/(N(N−1)) (pure integer
  ratio), richness, and Pielou evenness. The corpus-balance metrics
  a mixture designer reads next to q127/q133.
- q255 sequence edit distance — Levenshtein between the top-20 most
  active users' event-type strings (first 30 events each): the
  behavioral-similarity pair table. Quadratic ONLY on the bounded
  top-k (190 pairs, broadcast); both engines ship the same classic
  unit-cost levenshtein built-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ranking import global_running_sum, topk_per_key
from ..sources.parquet import load_tables
from .catalog import QueryDef
from .catalog_batch46 import _TOK_SQL

_PACK = 10**18

# ---------------------------------------------------------------------------
# q252: Cramér-von Mises two-sample statistic
# ---------------------------------------------------------------------------

_CVM_YEAR_A, _CVM_YEAR_B = 1995, 1996


def q252_cramer_von_mises(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample CvM over order prices, 1995 vs 1996. Per
    distinct price both counts lane-pack into one DECIMAL(38,0); the
    prefix pass yields both CDF numerators; each level contributes
    (a+b)·(m·cum_a − n·cum_b)² — summed exactly in DECIMAL — and
    T = Σ / (n·m·(n+m)²) is the one double, reported in micro units
    alongside the raw integer numerator."""
    o = load_tables(spark, sf_dir, ["orders"])["orders"].withColumn(
        "_y", F.year("o_orderdate")
    ).where(F.col("_y").isin(_CVM_YEAR_A, _CVM_YEAR_B))
    cents = F.expr("CAST(o_totalprice * 100 AS DECIMAL(20,0))").cast("long")
    levels = o.groupBy(cents.alias("v")).agg(
        F.sum((F.col("_y") == _CVM_YEAR_A).cast("long")).alias("_na"),
        F.sum((F.col("_y") == _CVM_YEAR_B).cast("long")).alias("_nb"),
    ).select(
        "v",
        "_na",
        "_nb",
        (
            F.col("_na").cast("decimal(38,0)") * F.lit(_PACK) + F.col("_nb")
        ).alias("enc"),
    )
    cs = global_running_sum(
        levels, [F.asc("v")], "enc", rsum_col="rs", total_col="tot"
    ).select(
        "_na",
        "_nb",
        F.expr(f"rs div {_PACK}").cast("decimal(38,0)").alias("cum_a"),
        (F.col("rs") % _PACK).cast("decimal(38,0)").alias("cum_b"),
        F.expr(f"tot div {_PACK}").cast("long").alias("na"),
        (F.col("tot") % _PACK).cast("long").alias("nb"),
    )
    gap = (
        F.col("nb").cast("decimal(38,0)") * F.col("cum_a")
        - F.col("na").cast("decimal(38,0)") * F.col("cum_b")
    )
    term = (
        (F.col("_na") + F.col("_nb")).cast("decimal(38,0)") * gap * gap
    )
    g = cs.groupBy("na", "nb").agg(
        F.sum(term).cast("decimal(38,0)").alias("t_num")
    )
    d = lambda c: c.cast("double")  # noqa: E731
    denom = (
        d(F.col("na")) * d(F.col("nb"))
        * (d(F.col("na")) + d(F.col("nb")))
        * (d(F.col("na")) + d(F.col("nb")))
        * (d(F.col("na")) + d(F.col("nb")))
    )
    return g.select(
        "na",
        "nb",
        (F.round(d(F.col("t_num")) / denom * 1e6, 4) + F.lit(0.0)).alias(
            "t_micro"
        ),
    )


ORACLE_Q252 = f"""
WITH o AS (
  SELECT CAST(CAST(o_totalprice * 100 AS DECIMAL(20,0)) AS BIGINT) AS v,
         year(o_orderdate) AS y
  FROM orders WHERE year(o_orderdate) IN ({_CVM_YEAR_A}, {_CVM_YEAR_B})),
levels AS (
  SELECT v,
         CAST(SUM(CASE WHEN y = {_CVM_YEAR_A} THEN 1 ELSE 0 END) AS BIGINT)
           AS na_v,
         CAST(SUM(CASE WHEN y = {_CVM_YEAR_B} THEN 1 ELSE 0 END) AS BIGINT)
           AS nb_v
  FROM o GROUP BY v),
cum AS (
  SELECT na_v, nb_v,
         CAST(SUM(na_v) OVER w AS HUGEINT) AS cum_a,
         CAST(SUM(nb_v) OVER w AS HUGEINT) AS cum_b,
         CAST(SUM(na_v) OVER () AS BIGINT) AS na,
         CAST(SUM(nb_v) OVER () AS BIGINT) AS nb
  FROM levels
  WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)),
g AS (
  SELECT na, nb,
         SUM(CAST(na_v + nb_v AS HUGEINT)
             * (nb * cum_a - na * cum_b) * (nb * cum_a - na * cum_b))
           AS t_num
  FROM cum GROUP BY na, nb)
SELECT na, nb,
       round(CAST(t_num AS DOUBLE)
             / (CAST(na AS DOUBLE) * nb * (na + nb) * (na + nb) * (na + nb))
             * 1e6, 4) + 0.0 AS t_micro
FROM g
"""


# ---------------------------------------------------------------------------
# q253: Herfindahl-Hirschman concentration per nation
# ---------------------------------------------------------------------------


def q253_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration per customer nation: HHI = Σc_i²/(Σc_i)²
    over customer revenue cents — both aggregates exact (cents² in
    DECIMAL), one double division per nation. 1/HHI is the effective
    number of customers; both reported."""
    t = load_tables(spark, sf_dir, ["orders", "customer", "nation"])
    cents = F.expr("CAST(round(o_totalprice * 100, 0) AS DECIMAL(20,0))").cast(
        "long"
    )
    per_cust = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(F.sum(cents).cast("long").alias("c"))
        .join(
            F.broadcast(
                t["customer"].select("c_custkey", "c_nationkey")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t["nation"].select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
    )
    g = per_cust.groupBy("n_name").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("c").cast("long").alias("total_cents"),
        F.sum(
            F.col("c").cast("decimal(38,0)") * F.col("c").cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("sq"),
    )
    d = lambda c: c.cast("double")  # noqa: E731
    hhi = d(F.col("sq")) / (d(F.col("total_cents")) * d(F.col("total_cents")))
    return g.select(
        F.col("n_name").alias("nation"),
        "n_customers",
        "total_cents",
        (F.round(hhi, 6) + F.lit(0.0)).alias("hhi"),
        (F.round(1.0 / hhi, 4) + F.lit(0.0)).alias("effective_customers"),
    ).orderBy("nation")


ORACLE_Q253 = """
WITH per_cust AS (
  SELECT n_name AS nation,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS DECIMAL(20,0)))
              AS BIGINT) AS c
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name, o_custkey),
g AS (
  SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(c) AS BIGINT) AS total_cents,
         SUM(CAST(c AS HUGEINT) * c) AS sq
  FROM per_cust GROUP BY nation)
SELECT nation, n_customers, total_cents,
       round(CAST(sq AS DOUBLE)
             / (CAST(total_cents AS DOUBLE) * total_cents), 6) + 0.0 AS hhi,
       round((CAST(total_cents AS DOUBLE) * total_cents)
             / CAST(sq AS DOUBLE), 4) + 0.0 AS effective_customers
FROM g ORDER BY nation
"""


# ---------------------------------------------------------------------------
# q254: diversity indexes per source
# ---------------------------------------------------------------------------


def q254_diversity_indexes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus balance: token richness (distinct), Shannon H
    in picounit-exact nats, EXACT integer Simpson index
    1 − Σn(n−1)/(N(N−1)), and Pielou evenness H/ln(richness). One
    explode + one (source, token) aggregation; everything after is
    per-source metadata scale."""
    from ..operators.textstats import tokens

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    tok = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("token")
    )
    counts = tok.groupBy("source", "token").agg(
        F.count("*").cast("long").alias("n_tok")
    )
    d = lambda c: c.cast("double")  # noqa: E731
    tot = counts.groupBy("source").agg(
        F.sum("n_tok").cast("long").alias("total_tok"),
        F.count("*").cast("long").alias("richness"),
        F.sum(
            F.col("n_tok").cast("decimal(38,0)")
            * (F.col("n_tok") - 1).cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("pairs"),
    )
    h_pico = F.round(
        -(d(F.col("n_tok")) / d(F.col("total_tok")))
        * F.log(d(F.col("n_tok")) / d(F.col("total_tok")))
        * 1e12,
        0,
    ).cast("long")
    h = (
        counts.join(tot.select("source", "total_tok"), on="source")
        .select("source", h_pico.alias("t"))
        .groupBy("source")
        .agg(F.sum("t").cast("long").alias("h_pico"))
    )
    g = tot.join(h, on="source")
    shannon = d(F.col("h_pico")) / 1e12
    simpson = 1.0 - d(F.col("pairs")) / (
        d(F.col("total_tok")) * (d(F.col("total_tok")) - 1.0)
    )
    return g.select(
        "source",
        F.col("total_tok").alias("n_tokens"),
        "richness",
        (F.round(shannon, 6) + F.lit(0.0)).alias("shannon_nats"),
        (F.round(simpson, 6) + F.lit(0.0)).alias("simpson"),
        (
            F.round(shannon / F.log(d(F.col("richness"))), 6) + F.lit(0.0)
        ).alias("evenness"),
    ).orderBy("source")


ORACLE_Q254 = f"""
WITH tok AS (
  SELECT source, {_TOK_SQL} AS token FROM documents),
counts AS (
  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS n_tok
  FROM tok GROUP BY 1, 2),
tot AS (
  SELECT source, CAST(SUM(n_tok) AS BIGINT) AS total_tok,
         CAST(COUNT(*) AS BIGINT) AS richness,
         SUM(CAST(n_tok AS HUGEINT) * (n_tok - 1)) AS pairs
  FROM counts GROUP BY source),
h AS (
  SELECT c.source,
         CAST(SUM(CAST(round(-(CAST(n_tok AS DOUBLE) / total_tok)
           * ln(CAST(n_tok AS DOUBLE) / total_tok) * 1e12, 0) AS BIGINT))
           AS BIGINT) AS h_pico
  FROM counts c JOIN tot USING (source) GROUP BY c.source)
SELECT source, total_tok AS n_tokens, richness,
       round(CAST(h_pico AS DOUBLE) / 1e12, 6) + 0.0 AS shannon_nats,
       round(1.0 - CAST(pairs AS DOUBLE)
             / (CAST(total_tok AS DOUBLE) * (total_tok - 1.0)), 6) + 0.0
         AS simpson,
       round((CAST(h_pico AS DOUBLE) / 1e12)
             / ln(CAST(richness AS DOUBLE)), 6) + 0.0 AS evenness
FROM tot JOIN h USING (source) ORDER BY source
"""


# ---------------------------------------------------------------------------
# q255: behavioral sequence edit distance
# ---------------------------------------------------------------------------

_ED_TOPK = 20
_ED_SEQ_LEN = 30


def q255_sequence_edit_distance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Levenshtein between the event-type strings (first 30 events,
    (ts, event_id)-ordered, one initial per event) of the 20 most
    active users. The per-user sequence builds with a bounded
    partitioned top-k + array fold; the quadratic pair table exists
    only over the bounded user set (190 pairs, broadcast self-join);
    the unit-cost levenshtein built-in is identical on both engines."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    per = (
        topk_per_key(
            ev.select("user_id", "ts", "event_id", "event_type"),
            ["user_id"],
            [F.asc("ts"), F.asc("event_id")],
            k=_ED_SEQ_LEN,
        )
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_seq"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("ts").alias("t"),
                                F.col("event_id").alias("o"),
                                F.substring("event_type", 1, 1).alias("c"),
                            )
                        )
                    ),
                    lambda x: x["c"],
                ),
                "",
            ).alias("seq"),
        )
    )
    totals = ev.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events")
    )
    top = (
        per.join(totals, on="user_id")
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(_ED_TOPK)
        .select("user_id", "seq")
        .localCheckpoint(eager=False)
    )
    a, b = top.alias("a"), top.alias("b")
    pairs = a.join(
        F.broadcast(b), F.col("a.user_id") < F.col("b.user_id")
    ).select(
        F.col("a.user_id").alias("user_a"),
        F.col("b.user_id").alias("user_b"),
        F.levenshtein(F.col("a.seq"), F.col("b.seq")).cast("long").alias(
            "edit_distance"
        ),
        F.greatest(
            F.length(F.col("a.seq")), F.length(F.col("b.seq"))
        )
        .cast("long")
        .alias("max_len"),
    )
    return pairs.select(
        "user_a",
        "user_b",
        "edit_distance",
        (
            F.round(
                F.col("edit_distance").cast("double")
                / F.col("max_len").cast("double"),
                6,
            )
            + F.lit(0.0)
        ).alias("normalized"),
    ).orderBy("user_a", "user_b")


ORACLE_Q255 = f"""
WITH ranked AS (
  SELECT user_id, ts, event_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rk
  FROM events),
per AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
           AS seq
  FROM ranked WHERE rk <= {_ED_SEQ_LEN} GROUP BY user_id),
totals AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id),
top AS (
  SELECT p.user_id, p.seq
  FROM per p JOIN totals USING (user_id)
  ORDER BY n_events DESC, user_id LIMIT {_ED_TOPK})
SELECT a.user_id AS user_a, b.user_id AS user_b,
       CAST(levenshtein(a.seq, b.seq) AS BIGINT) AS edit_distance,
       round(CAST(levenshtein(a.seq, b.seq) AS DOUBLE)
             / greatest(len(a.seq), len(b.seq)), 6) + 0.0 AS normalized
FROM top a JOIN top b ON a.user_id < b.user_id
ORDER BY user_a, user_b
"""


def batch51_registry() -> list[QueryDef]:
    return [
        QueryDef("q252_cramer_von_mises", q252_cramer_von_mises,
                 ORACLE_Q252,
                 "exact two-sample CvM drift via lane-packed prefix"),
        QueryDef("q253_hhi_concentration", q253_hhi_concentration,
                 ORACLE_Q253,
                 "HHI revenue concentration per nation, exact ratio"),
        QueryDef("q254_diversity_indexes", q254_diversity_indexes,
                 ORACLE_Q254,
                 "Shannon/Simpson/evenness per source, integer-exact"),
        QueryDef("q255_sequence_edit_distance",
                 q255_sequence_edit_distance, ORACLE_Q255,
                 "Levenshtein pairs over bounded top-k user sequences"),
    ]
