"""Batch 37: interval-union coverage and concordance extraction.

- q210 interval-union coverage: how many DAYS per (priority, year)
  were covered by at least one open order window (order date + 30
  days)? Overlaps must not double-count — the classic union-of-
  intervals measure, computed by the same +1/−1 boundary sweep as
  q209's peak query: segments between consecutive boundaries
  contribute their length iff the open count is positive. Exact
  integer day arithmetic; per-series windows only.
- q211 keyword-in-context (KWIC) concordance: every occurrence of a
  query token with its ±3-token context window — the retrieval
  debugging / annotation view, built from positional postings
  (posexplode + scan-local slice), no shuffle beyond the final
  ordering. The positional cousin of q137's phrase search.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_tables
from .catalog import QueryDef

# ---------------------------------------------------------------------------
# q210: union-of-intervals coverage
# ---------------------------------------------------------------------------

_COV_DAYS = 30


def q210_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covered days per (priority, year): boundary events at open
    (+1) and close (−1), per-priority time-ordered sweep; a segment
    [t, next_t) counts iff the running open count is positive, and
    segment lengths attribute to the year of their START (a segment
    never spans years after splitting on Jan-1 boundaries is NOT done
    here — the attribution rule is part of the query contract and
    mirrored exactly in the oracle)."""
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    bounds = o.select(
        F.col("o_orderpriority").alias("priority"),
        F.explode(
            F.array(
                F.struct(
                    F.col("o_orderdate").alias("t"), F.lit(1).alias("d")
                ),
                F.struct(
                    (F.col("o_orderdate")
                     + F.expr(f"INTERVAL {_COV_DAYS} DAYS")).alias("t"),
                    F.lit(-1).alias("d"),
                ),
            )
        ).alias("_b"),
    ).select("priority", "_b.t", "_b.d")
    per_t = bounds.groupBy("priority", "t").agg(
        F.sum("d").cast("long").alias("d")
    )
    w = Window.partitionBy("priority").orderBy("t")
    swept = per_t.select(
        "priority",
        "t",
        F.sum("d").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long").alias("open_now"),
        F.lead("t").over(w).alias("next_t"),
    )
    seg_days = F.datediff(F.col("next_t"), F.col("t")).cast("long")
    covered = swept.where(
        (F.col("open_now") > 0) & F.col("next_t").isNotNull()
    )
    return covered.groupBy(
        "priority", F.year("t").cast("long").alias("year")
    ).agg(F.sum(seg_days).cast("long").alias("covered_days"))


ORACLE_Q210 = f"""
WITH bounds AS (
  SELECT o_orderpriority AS priority, o_orderdate AS t, 1 AS d
  FROM orders
  UNION ALL
  SELECT o_orderpriority, o_orderdate + INTERVAL {_COV_DAYS} DAY, -1
  FROM orders),
per_t AS (
  SELECT priority, t, CAST(SUM(d) AS BIGINT) AS d
  FROM bounds GROUP BY 1, 2),
swept AS (
  SELECT priority, t,
         CAST(SUM(d) OVER (PARTITION BY priority ORDER BY t
                           ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS open_now,
         lead(t) OVER (PARTITION BY priority ORDER BY t) AS next_t
  FROM per_t)
SELECT priority, CAST(year(t) AS BIGINT) AS year,
       CAST(SUM(date_diff('day', t, next_t)) AS BIGINT) AS covered_days
FROM swept
WHERE open_now > 0 AND next_t IS NOT NULL
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# q211: keyword-in-context concordance
# ---------------------------------------------------------------------------

_KWIC_TERM = "spark"
_KWIC_CTX = 3
_KWIC_TOP = 50


def q211_kwic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first 50 occurrences of a query token with ±3 tokens of
    context — the concordance view annotators and retrieval debuggers
    read. Positional postings from one posexplode; context is a
    scan-local array slice re-joined with spaces; deterministic
    (doc_id, pos) ordering for the cut."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    toks = F.split(F.trim(F.col("text")), r"\s+")
    pos = docs.select(
        "doc_id",
        toks.alias("_t"),
        F.posexplode(toks).alias("pos", "tok"),
    ).where(F.col("tok") == _KWIC_TERM)
    start = F.greatest(F.col("pos") - _KWIC_CTX + 1, F.lit(1))
    # slice() is 1-based; pos is 0-based -> token i lives at slice pos i+1
    ctx = F.concat_ws(
        " ",
        F.slice(
            F.col("_t"),
            start,
            F.col("pos") + 1 - start + F.lit(_KWIC_CTX + 1),
        ),
    )
    return (
        pos.select(
            "doc_id",
            F.col("pos").cast("long").alias("pos"),
            ctx.alias("context"),
        )
        .orderBy("doc_id", "pos")
        .limit(_KWIC_TOP)
    )


ORACLE_Q211 = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
  FROM documents),
pos AS (
  SELECT doc_id, t, u.i - 1 AS pos
  FROM toks, UNNEST(generate_series(1, len(t))) AS u(i)
  WHERE t[u.i] = '{_KWIC_TERM}')
SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       array_to_string(
         t[greatest(pos + 1 - {_KWIC_CTX}, 1):pos + 1 + {_KWIC_CTX}],
         ' ') AS context
FROM pos
ORDER BY doc_id, pos LIMIT {_KWIC_TOP}
"""


def batch37_registry() -> list[QueryDef]:
    return [
        QueryDef("q210_interval_coverage", q210_interval_coverage,
                 ORACLE_Q210,
                 "union-of-intervals covered days (+1/-1 sweep)"),
        QueryDef("q211_kwic", q211_kwic, ORACLE_Q211,
                 "keyword-in-context concordance from postings"),
    ]
