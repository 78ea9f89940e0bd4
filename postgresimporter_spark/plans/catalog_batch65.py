"""Batch 65: mergeable-sketch rollup and weighted MinHash.

- q305 HLL rollup — ``sketches.hll_rollup``: per-event-type portable
  HLL estimates PLUS a global row MERGED from the per-key register
  table (max rank per register), never from a raw rescan — HLL's
  mergeability contract, the property that makes count-distinct
  rollups (and per-shard sketch unions) work at 100 TB, made
  externally observable: the oracle rebuilds both levels from the
  identical md5 register/rank derivation and the exact distincts sit
  beside the estimates (the q175 self-grading pattern, extended to
  the merge).
- q306 weighted MinHash — ``dedup.weighted_minhash_pairs``: MinHash
  over integer-replicated (token, rep<=min(tf, max_rep)) micro-units,
  banded 4x4; signature agreement estimates the CLIPPED weighted
  Jaccard, reported beside the exact clipped score for every banded
  candidate — the sketch counterpart of q217's exact weighted
  Jaccard, and the repetition-aware counterpart of q26's set MinHash
  (replication reduction: Gollapudi & Panigrahy, WWW'06 — public).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_tables
from .catalog import QueryDef
from .catalog_northstar import DUPED_DOCS_SQL, _duped_docs

# q305: mergeable HLL rollup -----------------------------------------------------


def q305_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via portable HLL, plus the global
    'ALL' row merged from the per-type registers; exact distincts
    joined beside both levels."""
    from ..operators.sketches import hll_rollup

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    sketch = hll_rollup(ev, "event_type", "user_id", all_key="ALL")
    exact = (
        ev.groupBy(F.col("event_type").alias("scope"))
        .agg(F.count_distinct("user_id").cast("long").alias("exact_distinct"))
        .unionByName(
            ev.agg(
                F.count_distinct("user_id").cast("long").alias(
                    "exact_distinct"
                )
            ).select(F.lit("ALL").alias("scope"), "exact_distinct")
        )
    )
    return sketch.join(exact, on="scope").select(
        "scope", "hit_registers", "z_scaled", "est_distinct",
        "exact_distinct",
    )


def _oracle_q305() -> str:
    from ..operators.sketches import hll_rollup_sql

    frag = hll_rollup_sql("events", "event_type", "user_id", all_key="ALL")
    # frag = "hashed AS (...) ... perscope AS (...) SELECT <final>" —
    # wrap its final SELECT as a CTE and join the exact counts on.
    head, tail = frag.rsplit("SELECT scope, hit_registers", 1)
    sketch_select = "SELECT scope, hit_registers" + tail
    return f"""
WITH {head.strip().rstrip(",")},
sketch AS ({sketch_select}),
exact AS (
  SELECT CAST(event_type AS VARCHAR) AS scope,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
  FROM events GROUP BY event_type
  UNION ALL
  SELECT 'ALL', CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events)
SELECT sketch.scope, hit_registers, z_scaled, est_distinct,
       exact_distinct
FROM sketch JOIN exact ON sketch.scope = exact.scope
"""


# q306: weighted MinHash near-dup ------------------------------------------------

WMH_HASHES = 16
WMH_BAND = 4
WMH_THRESHOLD = 0.5
WMH_MAX_REP = 8


def q306_weighted_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted-MinHash candidates over the duped-docs corpus with the
    sketch estimate and the exact clipped weighted Jaccard side by
    side — the sketch grades itself on every banded pair."""
    from ..operators.dedup import weighted_minhash_pairs

    return weighted_minhash_pairs(
        _duped_docs(spark, sf_dir),
        num_hashes=WMH_HASHES,
        band_size=WMH_BAND,
        threshold=WMH_THRESHOLD,
        max_rep=WMH_MAX_REP,
    )


ORACLE_Q306 = f"""
WITH duped AS ({DUPED_DOCS_SQL}),
toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM duped),
cnts AS (
  SELECT doc_id, tok, LEAST(COUNT(*), {WMH_MAX_REP}) AS c
  FROM toks GROUP BY doc_id, tok),
units AS (
  SELECT doc_id, tok, unnest(generate_series(1, c)) AS rep FROM cnts),
sig AS (
  SELECT doc_id, k.k,
         MIN(md5('wmh:' || k.k || ':' || tok || ':' || rep)) AS minh
  FROM units CROSS JOIN
       (SELECT unnest(generate_series(0, {WMH_HASHES - 1})) AS k) k
  GROUP BY doc_id, k.k),
bands AS (
  SELECT doc_id, k // {WMH_BAND} AS band,
         md5(string_agg(minh, '|' ORDER BY k)) AS bkey
  FROM sig GROUP BY doc_id, k // {WMH_BAND}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
est AS (
  SELECT id_a, id_b,
         SUM(CASE WHEN sa.minh = sb.minh THEN 1 ELSE 0 END)
           / {float(WMH_HASHES)} AS frac
  FROM cand
  JOIN sig sa ON sa.doc_id = id_a
  JOIN sig sb ON sb.doc_id = id_b AND sb.k = sa.k
  GROUP BY id_a, id_b
  HAVING SUM(CASE WHEN sa.minh = sb.minh THEN 1 ELSE 0 END)
           / {float(WMH_HASHES)} >= {WMH_THRESHOLD}),
tot AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS t FROM cnts GROUP BY doc_id),
minsum AS (
  SELECT e.id_a, e.id_b,
         CAST(SUM(LEAST(ca.c, cb.c)) AS BIGINT) AS ms
  FROM est e
  JOIN cnts ca ON ca.doc_id = e.id_a
  JOIN cnts cb ON cb.doc_id = e.id_b AND cb.tok = ca.tok
  GROUP BY e.id_a, e.id_b)
SELECT e.id_a, e.id_b,
       ROUND(e.frac, 4) AS est_wjaccard,
       ROUND(ms / CAST(ta.t + tb.t - ms AS DOUBLE), 6) AS wjaccard
FROM est e
JOIN minsum m ON m.id_a = e.id_a AND m.id_b = e.id_b
JOIN tot ta ON ta.doc_id = e.id_a
JOIN tot tb ON tb.doc_id = e.id_b
"""


def batch65_registry() -> list[QueryDef]:
    return [
        QueryDef(
            "q305_hll_rollup",
            q305_hll_rollup,
            _oracle_q305(),
            "per-key HLL + register-merged global vs exact distincts",
        ),
        QueryDef(
            "q306_weighted_minhash",
            q306_weighted_minhash,
            ORACLE_Q306,
            "replicated-unit weighted MinHash vs exact clipped Jaccard",
        ),
    ]
