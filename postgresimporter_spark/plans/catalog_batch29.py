"""Batch 29: shard placement, experiment readout, and forensic DQ.

- q188 rendezvous (highest-random-weight) hashing — Thaler & Ravishankar
  1996, the shard-placement scheme whose rebalance moves ONLY the keys
  the new shard wins: the before/after assignment matrix proves the
  minimal-disruption property on real keys, all md5-exact.
- q189 deterministic A/B readout — hash-bucketed assignment, exact
  conversion counts, micro-unit rates, and the two-proportion z
  statistic computed with a pinned operation order so both engines
  produce the identical double.
- q190 Benford first-digit audit — the classic fraud/quality screen:
  observed leading-digit distribution of order totals against
  log10(1 + 1/d), per-digit chi-square contributions with the
  expected-probability literals shared between engines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_tables
from .catalog import QueryDef

# ---------------------------------------------------------------------------
# q188: rendezvous (HRW) hashing rebalance matrix
# ---------------------------------------------------------------------------

SHARDS_BEFORE = ["s0", "s1", "s2", "s3"]
SHARDS_AFTER = ["s0", "s1", "s2", "s3", "s4"]


def _hrw_assign(key_col, shards: list[str]):
    """Scan-local HRW winner: argmax over md5 weights via array_max of
    (weight, shard) structs — no shuffle, no per-shard pass."""
    from ..operators.dedup import _md5_long

    entries = [
        F.struct(
            _md5_long(F.concat(F.lit(s + ":"), key_col), 0).alias("w"),
            F.lit(s).alias("s"),
        )
        for s in shards
    ]
    return F.array_max(F.array(*entries))["s"]


def q188_rendezvous(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard rebalance matrix when a fifth shard joins a four-shard
    HRW ring: per (shard_before, shard_after) key counts. Rendezvous
    hashing guarantees every moved key lands on the NEW shard (a key's
    old winner only loses to the newcomer), so the off-diagonal mass
    sits entirely in the s4 column — verified exactly, not asserted."""
    cust = load_tables(spark, sf_dir, ["customer"])["customer"]
    k = F.col("c_custkey").cast("string")
    assigned = cust.select(
        _hrw_assign(k, SHARDS_BEFORE).alias("shard_before"),
        _hrw_assign(k, SHARDS_AFTER).alias("shard_after"),
    )
    return assigned.groupBy("shard_before", "shard_after").agg(
        F.count("*").cast("long").alias("n_keys")
    )


def _hrw_sql(shards: list[str]) -> str:
    pairs = ", ".join(
        "{'w': ('0x' || substr(md5('0:" + s + ":' "
        "|| CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT, 's': '" + s + "'}"
        for s in shards
    )
    return f"struct_extract(list_max([{pairs}]), 's')"


def _oracle_q188() -> str:
    return f"""
SELECT {_hrw_sql(SHARDS_BEFORE)} AS shard_before,
       {_hrw_sql(SHARDS_AFTER)} AS shard_after,
       CAST(COUNT(*) AS BIGINT) AS n_keys
FROM customer GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# q189: deterministic A/B experiment readout
# ---------------------------------------------------------------------------


def q189_ab_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B readout with a reproducible lab notebook: users hash into
    variants (md5 — stable across runs and engines), conversion = more
    purchases than clicks (a balanced criterion at any SF — an
    every-user event would saturate the pooled rate and zero the z
    denominator), rates in integer micro-units, and the
    two-proportion z statistic as ONE pinned double expression. A
    single output row: the experiment dashboard cell."""
    from ..operators.dedup import hash_bucket

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    per_user = ev.groupBy("user_id").agg(
        (
            F.sum((F.col("event_type") == "purchase").cast("int"))
            > F.sum((F.col("event_type") == "click").cast("int"))
        ).cast("int").alias("conv")
    )
    tagged = per_user.select(
        hash_bucket(F.col("user_id").cast("string"), 2).alias("variant"),
        "conv",
    )
    agg = tagged.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("long").alias("n_a"),
        F.sum(F.when(F.col("variant") == 0, F.col("conv")).otherwise(0))
        .cast("long").alias("conv_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("long").alias("n_b"),
        F.sum(F.when(F.col("variant") == 1, F.col("conv")).otherwise(0))
        .cast("long").alias("conv_b"),
    )
    z = F.expr(
        "round((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)"
        " - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))"
        " / sqrt((CAST(conv_a + conv_b AS DOUBLE)"
        "         / CAST(n_a + n_b AS DOUBLE))"
        "        * (CAST(1 AS DOUBLE) - CAST(conv_a + conv_b AS DOUBLE)"
        "           / CAST(n_a + n_b AS DOUBLE))"
        "        * (CAST(1 AS DOUBLE) / CAST(n_a AS DOUBLE)"
        "           + CAST(1 AS DOUBLE) / CAST(n_b AS DOUBLE))), 4)"
    )
    return agg.select(
        "n_a", "conv_a", "n_b", "conv_b",
        F.expr("1000000 * conv_a div n_a").cast("long").alias("rate_a_micro"),
        F.expr("1000000 * conv_b div n_b").cast("long").alias("rate_b_micro"),
        z.alias("z"),
    )


ORACLE_Q189 = """
WITH per_user AS (
  SELECT user_id,
         CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   > SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              THEN 1 ELSE 0 END AS conv
  FROM events GROUP BY user_id),
tagged AS (
  SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
           % 2 AS variant,
         conv
  FROM per_user),
agg AS (
  SELECT
    CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(SUM(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS BIGINT)
      AS conv_a,
    CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    CAST(SUM(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS BIGINT)
      AS conv_b
  FROM tagged)
SELECT n_a, conv_a, n_b, conv_b,
  CAST(1000000 * conv_a // n_a AS BIGINT) AS rate_a_micro,
  CAST(1000000 * conv_b // n_b AS BIGINT) AS rate_b_micro,
  round((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
         - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        / sqrt((CAST(conv_a + conv_b AS DOUBLE)
                / CAST(n_a + n_b AS DOUBLE))
               * (CAST(1 AS DOUBLE) - CAST(conv_a + conv_b AS DOUBLE)
                  / CAST(n_a + n_b AS DOUBLE))
               * (CAST(1 AS DOUBLE) / CAST(n_a AS DOUBLE)
                  + CAST(1 AS DOUBLE) / CAST(n_b AS DOUBLE))), 4) AS z
FROM agg
"""


# ---------------------------------------------------------------------------
# q190: Benford first-digit audit
# ---------------------------------------------------------------------------

# expected leading-digit probabilities, folded to shared double literals
_BENFORD_P = {d: math.log10(1.0 + 1.0 / d) for d in range(1, 10)}


def q190_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law screen of order totals: observed leading-digit
    counts vs n·log10(1+1/d), with per-digit chi-square contributions
    — the forensic data-quality audit. The expected-probability
    literals are Python-computed once and shared verbatim with the
    oracle, so the only double ops are one multiply and the contribution
    ratio, identically ordered on both engines."""
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    digit = F.substring(F.col("o_totalprice").cast("string"), 1, 1).cast(
        "long"
    )
    obs = o.groupBy(digit.alias("digit")).agg(
        F.count("*").cast("long").alias("n_obs")
    )
    total = o.agg(F.count("*").cast("long").alias("_n"))
    p_case = "CASE digit " + " ".join(
        f"WHEN {d} THEN CAST({p!r} AS DOUBLE)"
        for d, p in _BENFORD_P.items()
    ) + " END"
    joined = obs.crossJoin(F.broadcast(total))
    exp = F.expr(f"CAST(_n AS DOUBLE) * ({p_case})")
    contrib = F.expr(
        f"(CAST(n_obs AS DOUBLE) - CAST(_n AS DOUBLE) * ({p_case}))"
        f" * (CAST(n_obs AS DOUBLE) - CAST(_n AS DOUBLE) * ({p_case}))"
        f" / (CAST(_n AS DOUBLE) * ({p_case}))"
    )
    return joined.select(
        "digit",
        "n_obs",
        F.round(exp, 6).alias("expected"),
        F.round(contrib, 6).alias("chi2_contrib"),
    )


def _oracle_q190() -> str:
    p_case = "CASE digit " + " ".join(
        f"WHEN {d} THEN CAST({p!r} AS DOUBLE)"
        for d, p in _BENFORD_P.items()
    ) + " END"
    return f"""
WITH obs AS (
  SELECT CAST(substr(CAST(o_totalprice AS VARCHAR), 1, 1) AS BIGINT)
           AS digit,
         CAST(COUNT(*) AS BIGINT) AS n_obs
  FROM orders GROUP BY 1),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders)
SELECT digit, n_obs,
  round(CAST(n AS DOUBLE) * ({p_case}), 6) AS expected,
  round((CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * ({p_case}))
        * (CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * ({p_case}))
        / (CAST(n AS DOUBLE) * ({p_case})), 6) AS chi2_contrib
FROM obs CROSS JOIN tot
"""


def batch29_registry() -> list[QueryDef]:
    return [
        QueryDef("q188_rendezvous", q188_rendezvous, _oracle_q188(),
                 "HRW shard rebalance matrix (minimal key movement)"),
        QueryDef("q189_ab_readout", q189_ab_readout, ORACLE_Q189,
                 "deterministic A/B readout with two-proportion z"),
        QueryDef("q190_benford", q190_benford, _oracle_q190(),
                 "Benford leading-digit audit, per-digit chi-square"),
    ]
