"""Batch 46: regression readouts and corpus-comparison divergences.

- q232 group-wise OLS — per-brand least-squares fit of retail price
  (cents) vs part size: all five sufficient statistics are exact
  integer sums (one shuffle, map-side partial), slope/intercept/R²
  are the only doubles, computed per group from those integers. The
  per-segment trend readout every metrics stack runs; second-order
  cross-products run in DECIMAL(38,0)/HUGEINT (Σy·Σx² passes 2^63 at
  micro scales), final ratios are IEEE doubles on both engines.
- q233 Zipf fit — log-log OLS over the top-200 token rank/frequency
  curve: distributed top-k (orderBy+limit, no window), rank via a
  bounded posexplode (200 rows — no unpartitioned window), ln values
  floored to exact micro integers so the OLS sums are exact; the
  Zipf exponent is the slope. The tokenizer-vocabulary diagnostic
  next to q99's coverage curve.
- q234 weighted log-odds — smoothed log-odds-ratio with z-score
  (Monroe-style corpus comparison) for tokens of source group A
  (src0–src9) vs B: integer counts, one ln/sqrt per token (no float
  sums), top-25 A-associated terms by rounded z with total-order
  tiebreak. The "what distinguishes this slice" operator for corpus
  curation.
- q235 Jensen–Shannon divergence — JS(A‖B) between the two source
  groups' token distributions: per-token contributions are computed
  in doubles but rounded to exact picounits (1e-12) BEFORE the
  corpus-wide sum, so the reduction is an exact integer aggregation
  — addition order cannot change the result on either engine. The
  distribution-shift scalar for mixture rebalancing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.textstats import tokens
from ..sources.parquet import load_tables
from .catalog import QueryDef

_TOK_SQL = (
    "unnest(list_filter(string_split_regex(trim(text), '\\s+'),"
    " t -> t != ''))"
)

# ---------------------------------------------------------------------------
# q232: group-wise ordinary least squares
# ---------------------------------------------------------------------------



def _ols_terms():
    """Second-order OLS terms (cov, varx, vary, intercept numerator)
    in DECIMAL(38,0): the first-order sums are exact longs, but their
    cross-products (e.g. Σy·Σx² at micro scale) pass 2^63, so the
    products run in decimal — exact to 1e38 — and only the final
    ratios are doubles. Oracle side mirrors this with HUGEINT."""
    D = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    cov = D("n") * D("sxy") - D("sx") * D("sy")
    varx = D("n") * D("sxx") - D("sx") * D("sx")
    vary = D("n") * D("syy") - D("sy") * D("sy")
    icept_num = D("sy") * D("sxx") - D("sx") * D("sxy")
    return cov, varx, vary, icept_num


def q232_groupwise_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand OLS of price-cents on size. n/Σx/Σy/Σxy/Σx²/Σy² are
    exact longs; the second-order cross-products run in exact
    DECIMAL(38,0) (``_ols_terms``), and only the final
    slope/intercept/R² ratios are doubles (IEEE ops on identical
    integers — engine-portable), rounded and −0.0-normalized. Groups
    with zero size-variance report NULL fit columns."""
    p = load_tables(spark, sf_dir, ["part"])["part"]
    base = p.select(
        F.col("p_brand").alias("brand"),
        F.col("p_size").cast("long").alias("x"),
        F.expr("CAST(round(p_retailprice * 100, 0) AS DECIMAL(20,0))")
        .cast("long")
        .alias("y"),
    )
    g = base.groupBy("brand").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    cov, varx, vary, icept_num = _ols_terms()
    d = lambda c: c.cast("double")  # noqa: E731
    slope = F.round(d(cov) / d(varx), 6) + F.lit(0.0)
    icept = F.round(d(icept_num) / d(varx), 4) + F.lit(0.0)
    r2 = F.round(
        (d(cov) * d(cov)) / (d(varx) * d(vary)), 6
    ) + F.lit(0.0)
    return (
        g.withColumn("_varx", varx)
        .withColumn("_vary", vary)
        .select(
            "brand",
            "n",
            F.when(F.col("_varx") > 0, slope).alias("slope_cents_per_size"),
            F.when(F.col("_varx") > 0, icept).alias("intercept_cents"),
            F.when(
                (F.col("_varx") > 0) & (F.col("_vary") > 0), r2
            ).alias("r2"),
        )
        .orderBy("brand")
    )


ORACLE_Q232 = """
WITH base AS (
  SELECT p_brand AS brand, CAST(p_size AS BIGINT) AS x,
         CAST(CAST(round(p_retailprice * 100, 0) AS DECIMAL(20,0)) AS BIGINT)
           AS y
  FROM part),
g AS (
  SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM base GROUP BY brand),
s AS (
  SELECT brand, n,
         CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS cov,
         CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS varx,
         CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS vary,
         CAST(sy AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sxy AS inum
  FROM g)
SELECT brand, n,
       CASE WHEN varx > 0 THEN
         round(CAST(cov AS DOUBLE) / CAST(varx AS DOUBLE), 6) + 0.0
       END AS slope_cents_per_size,
       CASE WHEN varx > 0 THEN
         round(CAST(inum AS DOUBLE) / CAST(varx AS DOUBLE), 4) + 0.0
       END AS intercept_cents,
       CASE WHEN varx > 0 AND vary > 0 THEN
         round((CAST(cov AS DOUBLE) * CAST(cov AS DOUBLE))
               / (CAST(varx AS DOUBLE) * CAST(vary AS DOUBLE)), 6) + 0.0
       END AS r2
FROM s
ORDER BY brand
"""


# ---------------------------------------------------------------------------
# q233: Zipf rank-frequency fit
# ---------------------------------------------------------------------------

_ZIPF_TOPK = 200


def q233_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf exponent of the corpus: OLS of ln(freq) on ln(rank) over
    the top-200 tokens. Top-k is a distributed orderBy+limit
    (TakeOrderedAndProject — no window, no single reducer over the
    vocabulary); ranks come from a bounded 200-element posexplode.
    ln values round to exact micro longs, so the OLS sufficient
    statistics are exact integer sums; second-order cross-products
    run in DECIMAL(38,0) (``_ols_terms``) — safe at any corpus size."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    vocab = (
        docs.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    top = vocab.orderBy(F.desc("freq"), F.asc("token")).limit(_ZIPF_TOPK)
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
    ranked = arr.select(
        F.posexplode("a").alias("pos", "e")
    ).select(
        F.round(F.log((F.col("pos") + 1).cast("double")) * 1e6, 0)
        .cast("long")
        .alias("x"),
        F.round(F.log(F.col("e.f").cast("double")) * 1e6, 0)
        .cast("long")
        .alias("y"),
    )
    g = ranked.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    cov, varx, vary, icept_num = _ols_terms()
    d = lambda c: c.cast("double")  # noqa: E731
    return g.select(
        "n",
        (F.round(d(cov) / d(varx), 6) + F.lit(0.0)).alias("zipf_slope"),
        (F.round(d(icept_num) / d(varx), 6) + F.lit(0.0)).alias(
            "intercept_ln_micro"
        ),
        (
            F.round((d(cov) * d(cov)) / (d(varx) * d(vary)), 6)
            + F.lit(0.0)
        ).alias("r2"),
    )


ORACLE_Q233 = f"""
WITH tok AS (SELECT {_TOK_SQL} AS token FROM documents),
vocab AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS freq FROM tok GROUP BY token),
top AS (
  SELECT token, freq FROM vocab
  ORDER BY freq DESC, token LIMIT {_ZIPF_TOPK}),
ranked AS (
  SELECT CAST(round(ln(CAST(ROW_NUMBER() OVER
           (ORDER BY freq DESC, token) AS DOUBLE)) * 1e6, 0) AS BIGINT)
           AS x,
         CAST(round(ln(CAST(freq AS DOUBLE)) * 1e6, 0) AS BIGINT) AS y
  FROM top),
g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM ranked),
s AS (
  SELECT n,
         CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS cov,
         CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS varx,
         CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS vary,
         CAST(sy AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sxy AS inum
  FROM g)
SELECT n,
       round(CAST(cov AS DOUBLE) / CAST(varx AS DOUBLE), 6) + 0.0
         AS zipf_slope,
       round(CAST(inum AS DOUBLE) / CAST(varx AS DOUBLE), 6) + 0.0
         AS intercept_ln_micro,
       round((CAST(cov AS DOUBLE) * CAST(cov AS DOUBLE))
             / (CAST(varx AS DOUBLE) * CAST(vary AS DOUBLE)), 6) + 0.0
         AS r2
FROM s
"""


# ---------------------------------------------------------------------------
# q234: weighted log-odds corpus comparison
# ---------------------------------------------------------------------------

_LO_TOPK = 25
_SRC_A = tuple(f"src{i}" for i in range(10))


def _token_group_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(token, na, nb) counts for source group A (src0-src9) vs B —
    shared by q234 and q235: one explode, one token-key aggregation
    with conditional sums (map-side partial)."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    is_a = F.col("source").isin(*_SRC_A)
    return (
        docs.select(
            is_a.alias("in_a"), F.explode(tokens(F.col("text"))).alias("token")
        )
        .groupBy("token")
        .agg(
            F.sum(F.col("in_a").cast("long")).cast("long").alias("na"),
            F.sum((~F.col("in_a")).cast("long")).cast("long").alias("nb"),
        )
    )


_GROUP_COUNTS_SQL = f"""
counts AS (
  SELECT token,
         CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS nb
  FROM (SELECT source IN {_SRC_A} AS in_a, {_TOK_SQL} AS token
        FROM documents)
  GROUP BY token)
"""


def q234_log_odds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 group-A-associated tokens by smoothed log-odds z-score:
    delta = ln((na+1)/(NA+V−na−1)) − ln((nb+1)/(NB+V−nb−1)),
    z = delta/sqrt(1/(na+1) + 1/(nb+1)). All counts are exact longs;
    each token's ln/sqrt is a per-row double (never summed), rounded
    before the ordering so the top-k cut is engine-identical, with a
    token tiebreak. Corpus totals attach as ONE broadcast row."""
    c = _token_group_counts(spark, sf_dir)
    tot = c.agg(
        F.sum("na").cast("long").alias("NA_"),
        F.sum("nb").cast("long").alias("NB_"),
        F.count("*").cast("long").alias("V"),
    )
    d = lambda col: col.cast("double")  # noqa: E731
    j = c.crossJoin(F.broadcast(tot))
    delta = F.log(
        d(F.col("na") + 1)
        / d(F.col("NA_") + F.col("V") - F.col("na") - 1)
    ) - F.log(
        d(F.col("nb") + 1)
        / d(F.col("NB_") + F.col("V") - F.col("nb") - 1)
    )
    var = 1.0 / d(F.col("na") + 1) + 1.0 / d(F.col("nb") + 1)
    scored = j.select(
        "token",
        "na",
        "nb",
        (F.round(delta, 6) + F.lit(0.0)).alias("delta"),
        (F.round(delta / F.sqrt(var), 6) + F.lit(0.0)).alias("z"),
    )
    return scored.orderBy(F.desc("z"), F.asc("token")).limit(_LO_TOPK)


ORACLE_Q234 = f"""
WITH {_GROUP_COUNTS_SQL},
tot AS (
  SELECT CAST(SUM(na) AS BIGINT) AS NA_, CAST(SUM(nb) AS BIGINT) AS NB_,
         CAST(COUNT(*) AS BIGINT) AS V
  FROM counts),
scored AS (
  SELECT token, na, nb,
         round(ln(CAST(na + 1 AS DOUBLE) / CAST(NA_ + V - na - 1 AS DOUBLE))
               - ln(CAST(nb + 1 AS DOUBLE)
                    / CAST(NB_ + V - nb - 1 AS DOUBLE)), 6) + 0.0 AS delta,
         round((ln(CAST(na + 1 AS DOUBLE) / CAST(NA_ + V - na - 1 AS DOUBLE))
                - ln(CAST(nb + 1 AS DOUBLE)
                     / CAST(NB_ + V - nb - 1 AS DOUBLE)))
               / sqrt(1.0 / CAST(na + 1 AS DOUBLE)
                      + 1.0 / CAST(nb + 1 AS DOUBLE)), 6) + 0.0 AS z
  FROM counts, tot)
SELECT token, na, nb, delta, z FROM scored
ORDER BY z DESC, token LIMIT {_LO_TOPK}
"""


# ---------------------------------------------------------------------------
# q235: Jensen-Shannon divergence between source groups
# ---------------------------------------------------------------------------

_LN2 = 0.6931471805599453  # same literal on both engines


def q235_jensen_shannon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JS(A‖B) over the two source groups' token distributions.
    Per-token contributions 0.5·p·ln(p/m) + 0.5·q·ln(q/m) are doubles,
    but each is rounded to exact picounits (×1e12, cast long) BEFORE
    the corpus-wide reduction — the sum is an exact integer aggregate,
    immune to addition order on both engines (the q224 integer-
    accumulation discipline applied to a divergence)."""
    c = _token_group_counts(spark, sf_dir)
    tot = c.agg(
        F.sum("na").cast("long").alias("NA_"),
        F.sum("nb").cast("long").alias("NB_"),
        F.count("*").cast("long").alias("V"),
    )
    d = lambda col: col.cast("double")  # noqa: E731
    j = c.crossJoin(F.broadcast(tot))
    p = d(F.col("na")) / d(F.col("NA_"))
    q = d(F.col("nb")) / d(F.col("NB_"))
    m = (p + q) / F.lit(2.0)
    term_p = F.when(F.col("na") > 0, p * F.log(p / m)).otherwise(F.lit(0.0))
    term_q = F.when(F.col("nb") > 0, q * F.log(q / m)).otherwise(F.lit(0.0))
    pico = F.round((term_p + term_q) * F.lit(0.5) * 1e12, 0).cast("long")
    agg = j.select(
        pico.alias("c"), F.col("NA_"), F.col("NB_"), F.col("V")
    ).groupBy("NA_", "NB_", "V").agg(F.sum("c").cast("long").alias("s"))
    js = F.col("s").cast("double") / 1e12
    return agg.select(
        F.col("NA_").alias("tokens_a"),
        F.col("NB_").alias("tokens_b"),
        F.col("V").alias("vocab"),
        (F.round(js, 6) + F.lit(0.0)).alias("js_nats"),
        (F.round(js / F.lit(_LN2), 6) + F.lit(0.0)).alias("js_bits"),
    )


ORACLE_Q235 = f"""
WITH {_GROUP_COUNTS_SQL},
tot AS (
  SELECT CAST(SUM(na) AS BIGINT) AS NA_, CAST(SUM(nb) AS BIGINT) AS NB_,
         CAST(COUNT(*) AS BIGINT) AS V
  FROM counts),
terms AS (
  SELECT NA_, NB_, V,
         CAST(round((
           CASE WHEN na > 0 THEN (CAST(na AS DOUBLE) / NA_)
             * ln((CAST(na AS DOUBLE) / NA_)
                  / ((CAST(na AS DOUBLE) / NA_
                      + CAST(nb AS DOUBLE) / NB_) / 2.0)) ELSE 0.0 END
           + CASE WHEN nb > 0 THEN (CAST(nb AS DOUBLE) / NB_)
             * ln((CAST(nb AS DOUBLE) / NB_)
                  / ((CAST(na AS DOUBLE) / NA_
                      + CAST(nb AS DOUBLE) / NB_) / 2.0)) ELSE 0.0 END
         ) * 0.5 * 1e12, 0) AS BIGINT) AS c
  FROM counts, tot)
SELECT NA_ AS tokens_a, NB_ AS tokens_b, V AS vocab,
       round(CAST(SUM(c) AS BIGINT) / 1e12, 6) + 0.0 AS js_nats,
       round(CAST(SUM(c) AS BIGINT) / 1e12 / {_LN2!r}, 6) + 0.0 AS js_bits
FROM terms GROUP BY NA_, NB_, V
"""


def batch46_registry() -> list[QueryDef]:
    return [
        QueryDef("q232_groupwise_ols", q232_groupwise_ols, ORACLE_Q232,
                 "per-brand OLS fit from exact integer sufficient stats"),
        QueryDef("q233_zipf_fit", q233_zipf_fit, ORACLE_Q233,
                 "Zipf exponent via log-log OLS on top-200 tokens"),
        QueryDef("q234_log_odds", q234_log_odds, ORACLE_Q234,
                 "smoothed log-odds z-score corpus comparison"),
        QueryDef("q235_jensen_shannon", q235_jensen_shannon, ORACLE_Q235,
                 "JS divergence with exact picounit accumulation"),
    ]
