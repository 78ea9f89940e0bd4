"""Batch 43: sparse text similarity, seasonal decomposition, and
lexical diversity.

- q224 sparse TF-IDF cosine pairs — the classic lexical near-dup /
  related-document measure, computed the 100 TB way: weights are
  integer micro-units (one ln per token, floored to micro — the only
  float op before the final division), dot products and norms
  accumulate in DECIMAL(38,0) so no addition-order or overflow
  hazard, candidates come from the capped shared-token equi-join.
  Complements q85's dense-embedding cosine with the sparse side of
  hybrid retrieval.
- q225 seasonal decomposition — trend (centered 7-point mean) /
  day-of-week seasonal index / remainder over the per-priority daily
  order series, all in exact micro integers; the additive STL-lite
  every metrics stack runs. Windows are per-priority (partitioned),
  frames are row-based over the observed series.
- q226 lexical diversity — type-token ratio and hapax share per
  document (the corpus-quality features q29 doesn't cover), one
  token-level aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_tables
from .catalog import QueryDef
from .catalog_batch27 import _DAILY_SQL, _daily_series

# ---------------------------------------------------------------------------
# q224: sparse TF-IDF cosine pairs
# ---------------------------------------------------------------------------

_SC_THRESHOLD = 0.5
_SC_MAX_DOC_RATIO = 0.5


def q224_sparse_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs with TF-IDF cosine >= 0.5. Weight =
    tf · floor(1e6·ln(N/df)); dot and norms are exact DECIMAL(38,0)
    sums; the one double division (+ rounding + ``+0.0``) happens per
    surviving pair. Tokens in more than half the corpus are dropped
    from candidate generation AND weighting (idf would be near zero
    anyway — the stop-word skew guard and the math agree here)."""
    from ..operators.textstats import tokens

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    toks = docs.select(
        F.col("doc_id").alias("id"),
        F.explode(tokens(F.col("text"))).alias("tok"),
    )
    tf = toks.groupBy("id", "tok").agg(
        F.count("*").cast("long").alias("tf")
    )
    n_docs = docs.agg(F.count("*").cast("long").alias("_n"))
    df_tok = (
        tf.groupBy("tok")
        .agg(F.count("*").cast("long").alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .where(F.col("df") * 2 <= F.col("_n"))  # cap == idf cutoff
        .select(
            "tok",
            F.floor(
                F.lit(1_000_000.0)
                * F.log(F.col("_n").cast("double") / F.col("df").cast("double"))
            ).cast("long").alias("idf_micro"),
        )
    )
    # checkpointed: norms AND the pair dot both read the weight table
    w = (
        tf.join(df_tok, on="tok")
        .select(
            "id", "tok",
            (F.col("tf") * F.col("idf_micro")).cast("long").alias("w"),
        )
        .localCheckpoint(eager=False)
    )
    norms = w.groupBy("id").agg(
        F.sum(F.expr("CAST(w AS DECIMAL(38,0)) * w")).alias("n2")
    )
    wa = w.select(F.col("id").alias("id_a"), "tok", F.col("w").alias("w_a"))
    wb = w.select(F.col("id").alias("id_b"), "tok", F.col("w").alias("w_b"))
    dots = (
        wa.join(wb, on="tok")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.expr("CAST(w_a AS DECIMAL(38,0)) * w_b")).alias("dot"))
    )
    na = norms.select(F.col("id").alias("id_a"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("id").alias("id_b"), F.col("n2").alias("nb2"))
    cos = (
        F.round(
            F.col("dot").cast("double")
            / (
                F.sqrt(F.col("na2").cast("double"))
                * F.sqrt(F.col("nb2").cast("double"))
            ),
            6,
        )
        + F.lit(0.0)
    )
    return (
        dots.join(na, on="id_a")
        .join(nb, on="id_b")
        .withColumn("cosine", cos)
        .where(F.col("cosine") >= _SC_THRESHOLD)
        .select("id_a", "id_b", "cosine")
        .orderBy("id_a", "id_b")
    )


ORACLE_Q224 = f"""
WITH tok AS (
  SELECT doc_id AS id,
         unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                            t -> t != '')) AS tok
  FROM documents),
tf AS (
  SELECT id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
idf AS (
  SELECT tok,
         CAST(floor(1000000.0 * ln(CAST((SELECT n FROM nd) AS DOUBLE)
                                   / CAST(COUNT(*) AS DOUBLE)))
              AS BIGINT) AS idf_micro
  FROM tf GROUP BY tok
  HAVING COUNT(*) * 2 <= (SELECT n FROM nd)),
w AS (
  SELECT id, tf.tok, CAST(tf * idf_micro AS BIGINT) AS w
  FROM tf JOIN idf ON tf.tok = idf.tok),
norms AS (
  SELECT id, SUM(CAST(w AS HUGEINT) * w) AS n2 FROM w GROUP BY id),
dots AS (
  SELECT a.id AS id_a, b.id AS id_b,
         SUM(CAST(a.w AS HUGEINT) * b.w) AS dot
  FROM w a JOIN w b ON a.tok = b.tok AND a.id < b.id
  GROUP BY 1, 2)
SELECT id_a, id_b,
       round(CAST(dot AS DOUBLE) /
             (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))),
             6) + 0.0 AS cosine
FROM dots
JOIN norms na ON na.id = dots.id_a
JOIN norms nb ON nb.id = dots.id_b
WHERE round(CAST(dot AS DOUBLE) /
            (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))),
            6) >= {_SC_THRESHOLD}
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# q225: additive seasonal decomposition (STL-lite)
# ---------------------------------------------------------------------------

_TREND_HALF = 3  # centered 7-point trend window


def q225_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x = trend + seasonal + remainder over each priority's daily
    order counts, exact micro integers: trend = centered 7-point mean
    (only where the full window exists), seasonal = per-(priority,
    ISO-weekday) mean detrended value, remainder = the rest. Both
    windows are PARTITIONED by priority; frames are row-based over
    the observed series (documented semantics — no calendar
    gap-fill)."""
    s = _daily_series(spark, sf_dir)
    wt = (
        Window.partitionBy("priority")
        .orderBy("day")
        .rowsBetween(-_TREND_HALF, _TREND_HALF)
    )
    trended = (
        s.withColumn("_wn", F.count("*").over(wt))
        .withColumn("_ws", F.sum("x").over(wt))
        .withColumn(
            "trend_micro",
            F.when(
                F.col("_wn") == 2 * _TREND_HALF + 1,
                F.expr(f"(_ws * 1000000) div {2 * _TREND_HALF + 1}"),
            ).cast("long"),
        )
        .withColumn(
            "_detr",
            (F.col("x") * 1_000_000 - F.col("trend_micro")).cast("long"),
        )
        .localCheckpoint(eager=False)  # seasonal agg + output both read it
    )
    seasonal = (
        trended.where(F.col("trend_micro").isNotNull())
        .groupBy("priority", F.weekday("day").alias("dow"))
        .agg(
            F.expr("CAST(sum(_detr) div count(*) AS BIGINT)").alias(
                "seasonal_micro"
            )
        )
    )
    return (
        trended.withColumn("dow", F.weekday("day"))
        .join(seasonal, on=["priority", "dow"])
        .where(F.col("trend_micro").isNotNull())
        .select(
            "priority",
            F.col("day").cast("date").alias("day"),
            "x",
            "trend_micro",
            "seasonal_micro",
            (F.col("_detr") - F.col("seasonal_micro"))
            .cast("long")
            .alias("remainder_micro"),
        )
        .orderBy("priority", "day")
    )


ORACLE_Q225 = f"""
WITH {_DAILY_SQL},
trended AS (
  SELECT priority, day, x,
         CASE WHEN COUNT(*) OVER w = {2 * _TREND_HALF + 1}
              THEN CAST((SUM(x) OVER w * 1000000)
                        // {2 * _TREND_HALF + 1} AS BIGINT) END
           AS trend_micro
  FROM daily
  WINDOW w AS (PARTITION BY priority ORDER BY day
               ROWS BETWEEN {_TREND_HALF} PRECEDING
                        AND {_TREND_HALF} FOLLOWING)),
detr AS (
  SELECT *, CAST(x * 1000000 - trend_micro AS BIGINT) AS d,
         isodow(day) - 1 AS dow
  FROM trended WHERE trend_micro IS NOT NULL),
seasonal AS (
  SELECT priority, dow, CAST(SUM(d) // COUNT(*) AS BIGINT)
           AS seasonal_micro
  FROM detr GROUP BY 1, 2)
SELECT d.priority AS priority, CAST(d.day AS DATE) AS day, d.x,
       d.trend_micro, s.seasonal_micro,
       CAST(d.d - s.seasonal_micro AS BIGINT) AS remainder_micro
FROM detr d JOIN seasonal s ON d.priority = s.priority AND d.dow = s.dow
ORDER BY d.priority, day
"""


# ---------------------------------------------------------------------------
# q226: lexical diversity
# ---------------------------------------------------------------------------


def q226_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document type-token ratio and hapax-legomenon share — the
    repetitiveness features the Gopher-style gates (q96) don't carry.
    One token-level aggregation; ratios in exact micro integers."""
    from ..operators.textstats import tokens

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    counts = (
        docs.select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
        )
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("long").alias("c"))
    )
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_types"),
            F.sum((F.col("c") == 1).cast("long")).cast("long").alias(
                "n_hapax"
            ),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_types",
            "n_hapax",
            F.expr("(1000000 * n_types) div n_tokens").cast("long").alias(
                "ttr_micro"
            ),
            F.expr("(1000000 * n_hapax) div n_types").cast("long").alias(
                "hapax_micro"
            ),
        )
        .orderBy("doc_id")
    )


ORACLE_Q226 = """
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                            t -> t != '')) AS tok
  FROM documents),
counts AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM tok GROUP BY 1, 2)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       CAST((1000000 * COUNT(*)) // SUM(c) AS BIGINT) AS ttr_micro,
       CAST((1000000 * SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END))
            // COUNT(*) AS BIGINT) AS hapax_micro
FROM counts
GROUP BY doc_id
ORDER BY doc_id
"""


def batch43_registry() -> list[QueryDef]:
    return [
        QueryDef("q224_sparse_cosine_pairs", q224_sparse_cosine_pairs,
                 ORACLE_Q224,
                 "TF-IDF cosine pairs, decimal-exact accumulation"),
        QueryDef("q225_seasonal_decompose", q225_seasonal_decompose,
                 ORACLE_Q225,
                 "additive trend/seasonal/remainder decomposition"),
        QueryDef("q226_lexical_diversity", q226_lexical_diversity,
                 ORACLE_Q226,
                 "type-token ratio + hapax share per document"),
    ]
