"""Batch 42: behavioral entropy, vocabulary coverage curves, and the
Bloom false-positive audit.

- q221 per-user event-type entropy — the bot/anomaly triage feature
  (a user doing one thing has H = 0; uniform behavior maxes H).
  Showcases the negative-zero invariant for real: a single-type user
  computes −(1·ln 1) = −0.0, which the catalog's ``+ 0.0``
  normalization maps to +0.0 on BOTH engines before hashing.
- q222 vocabulary coverage — how many vocabulary entries cover
  50/90/95% of corpus tokens (the tokenizer-design curve), via the
  range-partitioned prefix machinery: no unpartitioned window on the
  Spark side at any scale.
- q223 Bloom false-positive audit — the honest-sketch pattern
  applied to ``operators/bloom.py``: measure the ACTUAL FP rate of
  the filter against exact membership, with the md5 bit positions
  replayed in SQL so the oracle checks the filter itself, not just
  the final (always-exact) join result like q109.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_tables
from .catalog import QueryDef

# ---------------------------------------------------------------------------
# q221: per-user behavioral entropy
# ---------------------------------------------------------------------------


def q221_session_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (nats) of each user's event-type mix, plus the
    dominant type's share in micro-units. One scan, two bounded
    aggregations; the entropy sum is over <=|event types| rows per
    user. ``+ 0.0`` normalizes the −0.0 that single-type users
    produce (−1·ln 1) — the hash-stability invariant."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    # checkpointed: the per-user totals AND the entropy terms both
    # read the O(users x types) cell table
    cells = ev.groupBy("user_id", "event_type").agg(
        F.count("*").cast("long").alias("c")
    ).localCheckpoint(eager=False)
    # entropy needs p = c / total per row, so the total attaches via a
    # small equi-join before the p·ln p terms aggregate
    tot = cells.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("_tot")
    )
    terms = cells.join(tot, on="user_id").select(
        "user_id",
        "_tot",
        "c",
        (
            (F.col("c").cast("double") / F.col("_tot").cast("double"))
            * F.log(F.col("c").cast("double") / F.col("_tot").cast("double"))
        ).alias("_plnp"),
    )
    return (
        terms.groupBy("user_id")
        .agg(
            F.max("_tot").alias("n_events"),
            F.count("*").cast("long").alias("n_types"),
            F.max("c").cast("long").alias("_top"),
            (F.round(-F.sum("_plnp"), 6) + F.lit(0.0)).alias("entropy_nats"),
        )
        .select(
            "user_id",
            "n_events",
            "n_types",
            F.expr("(1000000 * _top) div n_events").cast("long").alias(
                "top_share_micro"
            ),
            "entropy_nats",
        )
        .orderBy("user_id")
    )


ORACLE_Q221 = """
WITH cells AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
tot AS (
  SELECT user_id, CAST(SUM(c) AS BIGINT) AS t FROM cells GROUP BY 1),
terms AS (
  SELECT cells.user_id, t, c,
         (CAST(c AS DOUBLE) / CAST(t AS DOUBLE))
           * ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)) AS plnp
  FROM cells JOIN tot ON cells.user_id = tot.user_id)
SELECT user_id,
       MAX(t) AS n_events,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST((1000000 * MAX(c)) // MAX(t) AS BIGINT) AS top_share_micro,
       round(-SUM(plnp), 6) + 0.0 AS entropy_nats
FROM terms
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# q222: vocabulary coverage curve
# ---------------------------------------------------------------------------

_COVERAGE_PCTS = (50, 90, 95)


def q222_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-design curve: the smallest frequency-ranked
    vocabulary covering 50/90/95% of corpus token occurrences.
    Token frequencies rank through ONE distributed prefix pass
    (``global_running_sum`` — range partition + per-partition window
    + offset join, never a one-reducer sort); each coverage target
    reads the checkpointed prefix table. Integer comparison
    100·running >= pct·total keeps the cut exact."""
    from ..operators.ranking import global_running_sum
    from ..operators.textstats import tokens

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    counts = (
        docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("cf"))
    )
    cs = global_running_sum(
        counts,
        [F.desc("cf"), F.asc("tok")],
        "cf",
        idx_col="vocab_size",
        rsum_col="covered",
        total_col="total_cf",
    ).localCheckpoint(eager=False)  # three coverage targets read it
    pcts = spark.createDataFrame(
        [(p,) for p in _COVERAGE_PCTS], "pct long"
    )
    hit = cs.crossJoin(F.broadcast(pcts)).where(
        F.col("covered") * 100 >= F.col("pct") * F.col("total_cf")
    )
    return (
        hit.groupBy("pct")
        .agg(
            F.min("vocab_size").cast("long").alias("vocab_size"),
            F.min_by("covered", "vocab_size").cast("long").alias(
                "covered_tokens"
            ),
            F.max("total_cf").cast("long").alias("total_tokens"),
        )
        .orderBy("pct")
    )


ORACLE_Q222 = f"""
WITH tok AS (
  SELECT unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                            t -> t != '')) AS tok
  FROM documents),
counts AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cf FROM tok GROUP BY tok),
cs AS (
  SELECT tok, cf,
         CAST(ROW_NUMBER() OVER (ORDER BY cf DESC, tok ASC) AS BIGINT)
           AS vocab_size,
         CAST(SUM(cf) OVER (ORDER BY cf DESC, tok ASC
                            ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS covered,
         CAST(SUM(cf) OVER () AS BIGINT) AS total_cf
  FROM counts),
pcts AS (SELECT unnest([{", ".join(str(p) for p in _COVERAGE_PCTS)}]) AS pct),
hit AS (
  SELECT pct, vocab_size, covered, total_cf
  FROM cs, pcts WHERE covered * 100 >= pct * total_cf)
SELECT CAST(pct AS BIGINT) AS pct,
       MIN(vocab_size) AS vocab_size,
       MIN_BY(covered, vocab_size) AS covered_tokens,
       MAX(total_cf) AS total_tokens
FROM hit GROUP BY pct ORDER BY pct
"""


# ---------------------------------------------------------------------------
# q223: Bloom filter false-positive audit
# ---------------------------------------------------------------------------

_BLOOM_M = 1 << 12
_BLOOM_K = 3
_MEMBER_MOD = 3  # members: c_custkey % 3 == 0


def q223_bloom_fp_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The honest-sketch audit for the Bloom semi-join: build the
    filter over the member keys (custkey % 3 == 0), probe EVERY
    customer key, and report the measured false-positive rate against
    exact membership. q109 can only prove the final join is exact;
    this proves the filter itself behaves (bit positions replayed in
    SQL, so a hashing drift between build and probe would show up as
    a changed FP count, not silent recall loss)."""
    from ..operators.bloom import bloom_might_contain, build_bloom

    cust = load_tables(spark, sf_dir, ["customer"])["customer"]
    members = cust.where(F.col("c_custkey") % _MEMBER_MOD == 0).select(
        "c_custkey"
    )
    words = build_bloom(members, "c_custkey", _BLOOM_M, _BLOOM_K)
    probed = cust.select(
        "c_custkey",
        (F.col("c_custkey") % _MEMBER_MOD == 0).alias("_is_member"),
        bloom_might_contain(
            F.col("c_custkey"), words, _BLOOM_M, _BLOOM_K
        ).alias("_pass"),
    )
    return probed.agg(
        F.count("*").cast("long").alias("n_probes"),
        F.sum(F.col("_is_member").cast("long")).cast("long").alias(
            "n_members"
        ),
        F.sum(F.col("_pass").cast("long")).cast("long").alias("n_pass"),
        F.sum(
            (F.col("_pass") & ~F.col("_is_member")).cast("long")
        ).cast("long").alias("n_false_pos"),
    ).select(
        "n_probes",
        "n_members",
        "n_pass",
        "n_false_pos",
        F.expr("(1000000 * n_false_pos) div (n_probes - n_members)")
        .cast("long")
        .alias("fp_micro"),
    )


def _bloom_pos_sql(key_sql: str, i: int) -> str:
    return (
        f"('0x' || substr(md5('{i}:' || CAST({key_sql} AS VARCHAR)), 1, 15))"
        f"::BIGINT % {_BLOOM_M}"
    )


ORACLE_Q223 = f"""
WITH members AS (
  SELECT c_custkey FROM customer WHERE c_custkey % {_MEMBER_MOD} = 0),
bits AS (
  {" UNION ".join(
      f"SELECT DISTINCT {_bloom_pos_sql('c_custkey', i)} AS pos FROM members"
      for i in range(_BLOOM_K)
  )}),
probes AS (
  SELECT c_custkey,
         (c_custkey % {_MEMBER_MOD} = 0) AS is_member,
         {" AND ".join(
             f"({_bloom_pos_sql('c_custkey', i)} IN (SELECT pos FROM bits))"
             for i in range(_BLOOM_K)
         )} AS pass
  FROM customer)
SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
       CAST(SUM(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT)
         AS n_members,
       CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       CAST(SUM(CASE WHEN pass AND NOT is_member THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_pos,
       CAST((1000000 * SUM(CASE WHEN pass AND NOT is_member THEN 1 ELSE 0
                           END))
            // (COUNT(*) - SUM(CASE WHEN is_member THEN 1 ELSE 0 END))
            AS BIGINT) AS fp_micro
FROM probes
"""


def batch42_registry() -> list[QueryDef]:
    return [
        QueryDef("q221_session_entropy", q221_session_entropy, ORACLE_Q221,
                 "per-user behavioral entropy (nats), -0.0-normalized"),
        QueryDef("q222_vocab_coverage", q222_vocab_coverage, ORACLE_Q222,
                 "vocabulary size covering 50/90/95% of tokens"),
        QueryDef("q223_bloom_fp_audit", q223_bloom_fp_audit, ORACLE_Q223,
                 "measured Bloom FP rate vs exact membership"),
    ]
