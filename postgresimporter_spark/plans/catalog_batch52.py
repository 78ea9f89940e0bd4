"""Batch 52: process conformance, stratified splits, negative-sampling
tables, and next-event prediction accuracy.

- q256 conformance checking — process-mining against an allowed
  transition model: per user, consecutive event pairs ((ts,
  event_id)-ordered lag over a PARTITIONED window) are checked
  against the whitelist; outputs the violating-transition histogram
  + per-model totals. Exact integers; one shuffle (the per-user
  window).
- q257 stratified split — deterministic train/val/test assignment
  with EXACT per-label proportions: within each label stratum,
  documents rank by md5 hash (the reshuffle-proof order) and split
  at ceil-boundaries — largest-remainder exactness per stratum, no
  RNG, reproducible across runs/partitionings. The
  holdout-generation op every training pipeline needs.
- q258 negative-sampling table — word2vec-style unigram^0.75
  distribution for the top-200 tokens: powered weights floor to
  micro integers, the cumulative table comes from the bounded
  posexplode (no unpartitioned window), probabilities are exact
  integer ratios. The sampling artifact contrastive training reads.
- q259 Markov accuracy — top-1 next-event-type prediction accuracy:
  the transition matrix argmax (bounded |types|² table) broadcast
  back against every transition; hit rate per prior state, exact
  counts. The backtest of q186's transition model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.textstats import tokens
from ..sources.parquet import load_tables
from .catalog import QueryDef
from .catalog_batch46 import _TOK_SQL

# ---------------------------------------------------------------------------
# q256: transition-model conformance checking
# ---------------------------------------------------------------------------

# allowed process-model transitions (event_type -> event_type)
_ALLOWED = (
    ("view", "view"),
    ("view", "click"),
    ("click", "click"),
    ("click", "purchase"),
    ("purchase", "view"),
    ("login", "view"),
    ("view", "logout"),
)


def q256_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transition conformance: every consecutive (prev, next) pair per
    user checks against the allowed model; the output is the violating
    transition histogram with per-transition share of all transitions.
    The lag window is partitioned by user (never global); the model
    joins as a broadcast literal table."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            "user_id",
            F.lag("event_type").over(w).alias("prev"),
            F.col("event_type").alias("next"),
        )
        .where(F.col("prev").isNotNull())
    )
    allowed = spark.createDataFrame(
        list(_ALLOWED), "prev string, next string"
    ).withColumn("_ok", F.lit(1))
    tot = trans.agg(F.count("*").cast("long").alias("n_total"))
    bad = (
        trans.join(F.broadcast(allowed), on=["prev", "next"], how="left")
        .where(F.col("_ok").isNull())
        .groupBy("prev", "next")
        .agg(F.count("*").cast("long").alias("n_violations"))
    )
    return (
        bad.crossJoin(F.broadcast(tot))
        .select(
            "prev",
            "next",
            "n_violations",
            "n_total",
            (
                F.round(
                    F.col("n_violations").cast("double")
                    / F.col("n_total").cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("violation_share"),
        )
        .orderBy(F.desc("n_violations"), "prev", "next")
    )


_ALLOWED_SQL = ", ".join(f"('{a}', '{b}')" for a, b in _ALLOWED)

ORACLE_Q256 = f"""
WITH trans AS (
  SELECT prev, event_type AS next FROM (
    SELECT user_id, event_type,
           LAG(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev
    FROM events)
  WHERE prev IS NOT NULL),
allowed(prev, next) AS (VALUES {_ALLOWED_SQL}),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM trans),
bad AS (
  SELECT t.prev, t.next, CAST(COUNT(*) AS BIGINT) AS n_violations
  FROM trans t LEFT JOIN allowed a ON t.prev = a.prev AND t.next = a.next
  WHERE a.prev IS NULL
  GROUP BY t.prev, t.next)
SELECT prev, next, n_violations, n_total,
       round(CAST(n_violations AS DOUBLE) / n_total, 6) + 0.0
         AS violation_share
FROM bad, tot
ORDER BY n_violations DESC, prev, next
"""


# ---------------------------------------------------------------------------
# q257: deterministic stratified train/val/test split
# ---------------------------------------------------------------------------

_SPLIT_TRAIN, _SPLIT_VAL = 0.8, 0.1  # remainder = test


def q257_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label stratified split with exact ceil-boundary
    proportions: within each label, vectors rank by (md5(vec_id),
    vec_id) — a deterministic, data-independent order — and the first
    ceil(0.8·n) go to train, the next ceil(0.9·n)−ceil(0.8·n) to val,
    the rest to test. Reproducible across runs and partitionings, no
    RNG state. Output: per (label, split) counts — the audit table; a
    pipeline would keep the row-level assignment."""
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("split:"), F.col("vec_id").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("label").orderBy("_h", "vec_id")
    ranked = (
        emb.select("vec_id", "label", h.alias("_h"))
        .withColumn("_rk", F.row_number().over(w).cast("long"))
        .withColumn(
            "_n", F.count("*").over(Window.partitionBy("label")).cast("long")
        )
    )
    split = (
        F.when(
            F.col("_rk") <= F.ceil(F.lit(_SPLIT_TRAIN) * F.col("_n")),
            F.lit("train"),
        )
        .when(
            F.col("_rk")
            <= F.ceil(F.lit(_SPLIT_TRAIN + _SPLIT_VAL) * F.col("_n")),
            F.lit("val"),
        )
        .otherwise(F.lit("test"))
    )
    return (
        ranked.select("label", split.alias("split"))
        .groupBy("label", "split")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("label", "split")
    )


ORACLE_Q257 = f"""
WITH ranked AS (
  SELECT label,
         ROW_NUMBER() OVER (PARTITION BY label ORDER BY
           ('0x' || substr(md5('split:' || CAST(vec_id AS VARCHAR)),
                           1, 15))::BIGINT, vec_id) AS rk,
         COUNT(*) OVER (PARTITION BY label) AS n
  FROM embeddings),
assigned AS (
  SELECT label,
         CASE WHEN rk <= ceil({_SPLIT_TRAIN} * n) THEN 'train'
              WHEN rk <= ceil({_SPLIT_TRAIN + _SPLIT_VAL} * n) THEN 'val'
              ELSE 'test' END AS split
  FROM ranked)
SELECT label, split, CAST(COUNT(*) AS BIGINT) AS n
FROM assigned GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# q258: negative-sampling distribution table
# ---------------------------------------------------------------------------

_NS_TOPK = 200
_NS_POWER = 0.75


def q258_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word2vec negative-sampling table over the top-200 tokens:
    weight = floor(1e6·freq^0.75) (one pow per token, micro-floored
    so the normalization is an exact integer ratio), cumulative
    weights from the bounded 200-element posexplode (q233's layout —
    no unpartitioned window). Output: token, freq, weight_micro,
    cumulative_micro, probability."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    vocab = (
        docs.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    top = vocab.orderBy(F.desc("freq"), F.asc("token")).limit(_NS_TOPK)
    arr = top.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    (-F.col("freq")).alias("nf"),
                    F.col("token").alias("t"),
                    F.col("freq").alias("f"),
                )
            )
        ).alias("a")
    )
    weighted = arr.select(
        F.transform(
            F.col("a"),
            lambda e: F.struct(
                e["t"].alias("t"),
                e["f"].alias("f"),
                F.floor(
                    F.pow(e["f"].cast("double"), F.lit(_NS_POWER)) * 1e6
                )
                .cast("long")
                .alias("w"),
            ),
        ).alias("ws")
    )
    # bounded in-row prefix: cum_i = sum of w_0..w_i over 200 elements
    with_cum = weighted.select(
        F.posexplode("ws").alias("pos", "e"),
        F.aggregate(
            F.col("ws"), F.lit(0).cast("long"), lambda acc, x: acc + x["w"]
        ).alias("total_w"),
        F.col("ws").alias("_ws"),
    ).select(
        F.col("e.t").alias("token"),
        F.col("e.f").alias("freq"),
        F.col("e.w").alias("weight_micro"),
        F.aggregate(
            F.slice(F.col("_ws"), 1, F.col("pos") + 1),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x["w"],
        ).alias("cumulative_micro"),
        "total_w",
    )
    return with_cum.select(
        "token",
        "freq",
        "weight_micro",
        "cumulative_micro",
        (
            F.round(
                F.col("weight_micro").cast("double")
                / F.col("total_w").cast("double"),
                6,
            )
            + F.lit(0.0)
        ).alias("probability"),
    ).orderBy(F.desc("freq"), F.asc("token"))


ORACLE_Q258 = f"""
WITH tok AS (SELECT {_TOK_SQL} AS token FROM documents),
vocab AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS freq FROM tok GROUP BY token),
top AS (
  SELECT token, freq,
         CAST(floor(pow(CAST(freq AS DOUBLE), {_NS_POWER}) * 1e6) AS BIGINT)
           AS weight_micro
  FROM vocab ORDER BY freq DESC, token LIMIT {_NS_TOPK}),
cum AS (
  SELECT token, freq, weight_micro,
         CAST(SUM(weight_micro) OVER (ORDER BY freq DESC, token
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cumulative_micro,
         CAST(SUM(weight_micro) OVER () AS BIGINT) AS total_w
  FROM top)
SELECT token, freq, weight_micro, cumulative_micro,
       round(CAST(weight_micro AS DOUBLE) / total_w, 6) + 0.0 AS probability
FROM cum ORDER BY freq DESC, token
"""


# ---------------------------------------------------------------------------
# q259: Markov next-event prediction accuracy
# ---------------------------------------------------------------------------


def q259_markov_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the first-order transition model: predict the next
    event type as the argmax transition from the prior type (count
    desc, type asc tiebreak — a bounded |types|² table), score every
    transition. Per prior state: transitions, hits, top-1 accuracy.
    In-sample by construction (the audit of model sharpness, not
    generalization — a holdout variant composes with q257)."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            F.lag("event_type").over(w).alias("prev"),
            F.col("event_type").alias("next"),
        )
        .where(F.col("prev").isNotNull())
    )
    counts = trans.groupBy("prev", "next").agg(
        F.count("*").cast("long").alias("n")
    )
    wb = Window.partitionBy("prev").orderBy(F.desc("n"), F.asc("next"))
    best = (
        counts.withColumn("_rk", F.row_number().over(wb))
        .where(F.col("_rk") == 1)
        .select("prev", F.col("next").alias("predicted"))
    )
    scored = trans.join(F.broadcast(best), on="prev")
    return (
        scored.groupBy("prev", "predicted")
        .agg(
            F.count("*").cast("long").alias("n_transitions"),
            F.sum((F.col("next") == F.col("predicted")).cast("long"))
            .cast("long")
            .alias("n_hits"),
        )
        .select(
            "prev",
            "predicted",
            "n_transitions",
            "n_hits",
            (
                F.round(
                    F.col("n_hits").cast("double")
                    / F.col("n_transitions").cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("top1_accuracy"),
        )
        .orderBy("prev")
    )


ORACLE_Q259 = """
WITH trans AS (
  SELECT prev, event_type AS next FROM (
    SELECT user_id, event_type,
           LAG(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev
    FROM events)
  WHERE prev IS NOT NULL),
counts AS (
  SELECT prev, next, CAST(COUNT(*) AS BIGINT) AS n
  FROM trans GROUP BY 1, 2),
best AS (
  SELECT prev, next AS predicted FROM (
    SELECT prev, next,
           ROW_NUMBER() OVER (PARTITION BY prev
                              ORDER BY n DESC, next) AS rk
    FROM counts) WHERE rk = 1)
SELECT t.prev, b.predicted,
       CAST(COUNT(*) AS BIGINT) AS n_transitions,
       CAST(SUM(CASE WHEN t.next = b.predicted THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hits,
       round(CAST(SUM(CASE WHEN t.next = b.predicted THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) + 0.0 AS top1_accuracy
FROM trans t JOIN best b USING (prev)
GROUP BY t.prev, b.predicted
ORDER BY t.prev
"""


def batch52_registry() -> list[QueryDef]:
    return [
        QueryDef("q256_conformance", q256_conformance, ORACLE_Q256,
                 "transition-model conformance violation histogram"),
        QueryDef("q257_stratified_split", q257_stratified_split,
                 ORACLE_Q257,
                 "deterministic stratified train/val/test split audit"),
        QueryDef("q258_negative_sampling", q258_negative_sampling,
                 ORACLE_Q258,
                 "unigram^0.75 negative-sampling table, exact ratios"),
        QueryDef("q259_markov_accuracy", q259_markov_accuracy, ORACLE_Q259,
                 "top-1 next-event accuracy of the transition model"),
    ]
