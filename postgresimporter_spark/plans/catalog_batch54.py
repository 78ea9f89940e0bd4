"""Batch 54: re-identification risk, the Laplace mechanism, quality
yield curves, and leave-one-out target encoding.

- q264 re-identification risk — the record-level privacy summary that
  complements q166's per-class table: prosecutor risk (share of
  records in singleton quasi-identifier classes), share below k=5,
  journalist risk (1 / smallest class), average class size. Two
  aggregations, exact integers.
- q265 Laplace mechanism — ε-DP noisy counts as a DETERMINISTIC test
  harness: noise = −b·sgn(u−½)·ln(1−2|u−½|) with u the md5-derived
  uniform and b = Δ/ε — the exact inverse-CDF transform a production
  DP release applies, made reproducible so the pipeline's
  calibration (noise scale vs ε, abs error) is assertable. True and
  noisy counts side by side.
- q266 quality yield curve — corpus yield across a (min_chars ×
  min_tokens) gate grid: one scan, the grid explodes per row
  (bounded 20 cells), exact pass counts — the table you read before
  picking q96's thresholds.
- q267 target encoding — leave-one-out mean encoding of brand ->
  price-cents: (Σ_brand − x)/(n_brand − 1) from one grouped
  aggregate joined back (AQE broadcast) — exact integer arithmetic
  until the single division; the leakage-safe categorical feature
  every tabular-ML pipeline builds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_tables
from .catalog import QueryDef

# ---------------------------------------------------------------------------
# q264: re-identification risk summary
# ---------------------------------------------------------------------------

_REID_K = 5


def q264_reid_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(nationkey, mktsegment) quasi-identifier risk rollup: per-class
    sizes from one groupBy, then the one-row record-level summary —
    prosecutor risk = records in classes of size 1 / N, at-risk share
    below k=5, journalist risk = 1/min class size."""
    cust = load_tables(spark, sf_dir, ["customer"])["customer"]
    classes = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").cast("long").alias("sz")
    )
    g = classes.agg(
        F.count("*").cast("long").alias("n_classes"),
        F.sum("sz").cast("long").alias("n_records"),
        F.sum(F.when(F.col("sz") == 1, F.col("sz")).otherwise(0))
        .cast("long")
        .alias("singleton_records"),
        F.sum(F.when(F.col("sz") < _REID_K, F.col("sz")).otherwise(0))
        .cast("long")
        .alias("below_k_records"),
        F.min("sz").cast("long").alias("min_class"),
    )
    d = lambda c: c.cast("double")  # noqa: E731
    return g.select(
        "n_records",
        "n_classes",
        (
            F.round(d(F.col("singleton_records")) / d(F.col("n_records")), 6)
            + F.lit(0.0)
        ).alias("prosecutor_risk"),
        (
            F.round(d(F.col("below_k_records")) / d(F.col("n_records")), 6)
            + F.lit(0.0)
        ).alias("below_k_share"),
        (
            F.round(1.0 / d(F.col("min_class")), 6) + F.lit(0.0)
        ).alias("journalist_risk"),
    )


ORACLE_Q264 = f"""
WITH classes AS (
  SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS sz
  FROM customer GROUP BY 1, 2)
SELECT CAST(SUM(sz) AS BIGINT) AS n_records,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       round(CAST(SUM(CASE WHEN sz = 1 THEN sz ELSE 0 END) AS DOUBLE)
             / SUM(sz), 6) + 0.0 AS prosecutor_risk,
       round(CAST(SUM(CASE WHEN sz < {_REID_K} THEN sz ELSE 0 END) AS DOUBLE)
             / SUM(sz), 6) + 0.0 AS below_k_share,
       round(1.0 / MIN(sz), 6) + 0.0 AS journalist_risk
FROM classes
"""


# ---------------------------------------------------------------------------
# q265: deterministic Laplace mechanism
# ---------------------------------------------------------------------------

_DP_EPS = 0.5  # per-count epsilon; sensitivity 1 for disjoint counts


def q265_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-DP event-type counts through the Laplace inverse CDF with a
    DETERMINISTIC md5 uniform (u = (h+0.5)/2^60 ∈ (0,1)): the exact
    mechanism arithmetic a production release runs, reproducible so
    noise calibration is testable (a real release swaps in a CSPRNG
    for u — one line). Both engines compute identical ln/doubles."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    counts = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("true_count")
    )
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("dp:"), F.col("event_type"))), 1, 15),
        16,
        10,
    ).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(1 << 60))
    centered = u - F.lit(0.5)
    b = 1.0 / _DP_EPS
    noise = (
        -F.lit(b)
        * F.signum(centered)
        * F.log(1.0 - 2.0 * F.abs(centered))
    )
    noisy = F.col("true_count").cast("double") + noise
    return counts.select(
        "event_type",
        "true_count",
        (F.round(noise, 4) + F.lit(0.0)).alias("noise"),
        (F.round(noisy, 4) + F.lit(0.0)).alias("noisy_count"),
        (F.round(F.abs(noise), 4) + F.lit(0.0)).alias("abs_err"),
    ).orderBy("event_type")


ORACLE_Q265 = f"""
WITH counts AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS true_count
  FROM events GROUP BY 1),
mech AS (
  SELECT event_type, true_count,
         -(1.0 / {_DP_EPS}) * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5))
           AS noise
  FROM (SELECT event_type, true_count,
               (CAST(('0x' || substr(md5('dp:' || event_type), 1, 15))::BIGINT
                     AS DOUBLE) + 0.5) / {float(1 << 60)!r} AS u
        FROM counts))
SELECT event_type, true_count,
       round(noise, 4) + 0.0 AS noise,
       round(true_count + noise, 4) + 0.0 AS noisy_count,
       round(abs(noise), 4) + 0.0 AS abs_err
FROM mech ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# q266: quality-gate yield curve
# ---------------------------------------------------------------------------

_YC_CHARS = (50, 100, 200, 300, 400)
_YC_TOKENS = (5, 10, 20, 40)


def q266_quality_yield_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus yield over the (min_chars × min_tokens) gate grid: each
    document contributes a pass/fail bit to all 20 cells (bounded
    in-row explode), exact counts, yield = passing/N. One scan; the
    pre-tuning table for q96's production gates."""
    from ..operators.textstats import token_count

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    base = docs.select(
        F.length("text").cast("long").alias("chars"),
        token_count(F.col("text")).cast("long").alias("toks"),
    )
    cells = F.array(
        *[
            F.struct(
                F.lit(c).alias("min_chars"),
                F.lit(t).alias("min_tokens"),
                (
                    (F.col("chars") >= c) & (F.col("toks") >= t)
                )
                .cast("long")
                .alias("p"),
            )
            for c in _YC_CHARS
            for t in _YC_TOKENS
        ]
    )
    return (
        base.select(F.explode(cells).alias("e"))
        .groupBy(
            F.col("e.min_chars").cast("long").alias("min_chars"),
            F.col("e.min_tokens").cast("long").alias("min_tokens"),
        )
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("e.p").cast("long").alias("n_pass"),
        )
        .select(
            "min_chars",
            "min_tokens",
            "n_docs",
            "n_pass",
            (
                F.round(
                    F.col("n_pass").cast("double")
                    / F.col("n_docs").cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("yield"),
        )
        .orderBy("min_chars", "min_tokens")
    )


def _yc_oracle() -> str:
    grid = ", ".join(
        f"({c}, {t})" for c in _YC_CHARS for t in _YC_TOKENS
    )
    return f"""
WITH base AS (
  SELECT CAST(length(text) AS BIGINT) AS chars,
         CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                              x -> x != '')) AS BIGINT) AS toks
  FROM documents),
grid(min_chars, min_tokens) AS (VALUES {grid})
SELECT CAST(min_chars AS BIGINT) AS min_chars,
       CAST(min_tokens AS BIGINT) AS min_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN chars >= min_chars AND toks >= min_tokens
                THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       round(CAST(SUM(CASE WHEN chars >= min_chars AND toks >= min_tokens
                      THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) + 0.0
         AS yield
FROM base, grid
GROUP BY 1, 2 ORDER BY 1, 2
"""


ORACLE_Q266 = _yc_oracle()


# ---------------------------------------------------------------------------
# q267: leave-one-out target encoding
# ---------------------------------------------------------------------------


def q267_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe mean encoding of brand -> price cents: per part,
    LOO mean = (Σ_brand − own)/(n_brand − 1) — the grouped sums join
    back as an AQE broadcast; everything integer until the division.
    Singleton brands encode NULL (no leakage-safe value exists)."""
    p = load_tables(spark, sf_dir, ["part"])["part"]
    cents = F.expr("CAST(round(p_retailprice * 100, 0) AS DECIMAL(20,0))").cast(
        "long"
    )
    base = p.select(
        "p_partkey", F.col("p_brand").alias("brand"), cents.alias("c")
    )
    g = base.groupBy("brand").agg(
        F.count("*").cast("long").alias("n_b"),
        F.sum("c").cast("long").alias("s_b"),
    )
    j = base.join(g, on="brand")
    loo = F.when(
        F.col("n_b") > 1,
        F.round(
            (F.col("s_b") - F.col("c")).cast("double")
            / (F.col("n_b") - 1).cast("double"),
            4,
        )
        + F.lit(0.0),
    )
    return j.select(
        "p_partkey",
        "brand",
        F.col("c").alias("price_cents"),
        loo.alias("brand_loo_mean_cents"),
    ).orderBy("p_partkey")


ORACLE_Q267 = """
WITH base AS (
  SELECT p_partkey, p_brand AS brand,
         CAST(CAST(round(p_retailprice * 100, 0) AS DECIMAL(20,0)) AS BIGINT)
           AS c
  FROM part),
g AS (
  SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_b,
         CAST(SUM(c) AS BIGINT) AS s_b
  FROM base GROUP BY brand)
SELECT p_partkey, brand, c AS price_cents,
       CASE WHEN n_b > 1 THEN
         round(CAST(s_b - c AS DOUBLE) / (n_b - 1), 4) + 0.0
       END AS brand_loo_mean_cents
FROM base JOIN g USING (brand)
ORDER BY p_partkey
"""


def batch54_registry() -> list[QueryDef]:
    return [
        QueryDef("q264_reid_risk", q264_reid_risk, ORACLE_Q264,
                 "record-level re-identification risk summary"),
        QueryDef("q265_dp_noisy_counts", q265_dp_noisy_counts, ORACLE_Q265,
                 "deterministic Laplace-mechanism noisy counts"),
        QueryDef("q266_quality_yield_curve", q266_quality_yield_curve,
                 ORACLE_Q266,
                 "corpus yield across a quality-gate grid"),
        QueryDef("q267_target_encoding", q267_target_encoding, ORACLE_Q267,
                 "leave-one-out mean target encoding, exact"),
    ]
