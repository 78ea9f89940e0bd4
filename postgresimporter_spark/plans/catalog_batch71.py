"""Batch 71: ensemble (multi-signal) dedup consolidation.

q314 is the production dedup decision pattern: no single near-dup
signal is trusted alone — a pair counts only when BOTH the MinHash-LSH
banding (token-shingle Jaccard, q26's exact config) AND the SimHash
Hamming join (bit-fingerprint distance, q86's exact config) surface
it; the confirmed pairs then consolidate into connected components
with the q63 cluster summary. At 100 TB each signal is already
candidate-bounded (banded equi-joins), the intersection is one more
equi-join on pair keys, and the component step is the same
O(log n)-round min-label propagation — nothing in the composition
adds an all-pairs path. The oracle recomputes both pair sets with
their existing independent SQL definitions, INTERSECTs them, and
replays the components with a recursive CTE."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import QueryDef


def q314_ensemble_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clusters of pairs confirmed by BOTH MinHash-LSH and SimHash
    over the duped-docs corpus: (component, cluster_size, min_id,
    max_id)."""
    from ..operators.components import dedup_clusters
    from .catalog_batch8 import q86_simhash_hamming
    from .catalog_northstar import q26_minhash_lsh

    mh = q26_minhash_lsh(spark, sf_dir).select("id_a", "id_b")
    sh = q86_simhash_hamming(spark, sf_dir).select("id_a", "id_b")
    confirmed = mh.intersect(sh)
    return dedup_clusters(confirmed)


def _ensemble_oracle() -> str:
    from .catalog_batch8 import ORACLE_Q86
    from .catalog_northstar import ORACLE_Q26

    return f"""
WITH RECURSIVE mh AS ({ORACLE_Q26}),
shp AS ({ORACLE_Q86}),
confirmed AS (
  -- set intersection as a distinct equi-join: DuckDB rejects
  -- INTERSECT inside a WITH RECURSIVE block
  SELECT DISTINCT m.id_a, m.id_b
  FROM mh m JOIN shp s ON m.id_a = s.id_a AND m.id_b = s.id_b),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM confirmed
  UNION
  SELECT id_b AS src, id_a AS dst FROM confirmed),
reach(id, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
labels AS (
  SELECT id, MIN(r) AS component FROM reach GROUP BY id)
SELECT component, COUNT(*) AS cluster_size,
       MIN(id) AS min_id, MAX(id) AS max_id
FROM labels GROUP BY component
"""


def batch71_registry() -> list[QueryDef]:
    return [
        QueryDef(
            "q314_ensemble_dedup",
            q314_ensemble_dedup,
            _ensemble_oracle(),
            "pairs confirmed by MinHash AND SimHash -> component summary",
        ),
    ]
