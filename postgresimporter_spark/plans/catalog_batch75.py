"""Batch 75: quality-aware near-dup cluster survivorship.

q318 finishes the dedup story the ensemble started: q314's confirmed
pairs (MinHash AND SimHash) consolidate into components, and each
cluster keeps its HIGHEST-QUALITY member (longest text, ties to the
smallest doc_id) rather than q76's min-id rule — the survivorship
policy real corpus curation uses (keep the best copy, drop the rest).
One max_by aggregate per component on top of the existing component
labels; the oracle replays components recursively and picks the same
arg-max with a window. Returns one row per cluster:
(component, cluster_size, survivor_id, survivor_chars)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_tables
from .catalog import QueryDef


def q318_cluster_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-copy survivor per confirmed near-dup cluster."""
    from ..operators.components import connected_components
    from .catalog_batch8 import q86_simhash_hamming
    from .catalog_northstar import _duped_docs, q26_minhash_lsh

    mh = q26_minhash_lsh(spark, sf_dir).select("id_a", "id_b")
    sh = q86_simhash_hamming(spark, sf_dir).select("id_a", "id_b")
    confirmed = mh.intersect(sh)
    labels = connected_components(confirmed)
    docs = _duped_docs(spark, sf_dir).select(
        F.col("doc_id").alias("id"), F.length("text").alias("n_chars")
    )
    member = labels.join(docs, on="id")
    # quality-first, id tie-break, as one struct max (no window shuffle)
    best = F.max(
        F.struct(
            F.col("n_chars").alias("q"),
            (-F.col("id")).alias("negid"),
        )
    )
    return member.groupBy("component").agg(
        F.count("*").cast("long").alias("cluster_size"),
        (-best.getField("negid")).cast("long").alias("survivor_id"),
        best.getField("q").cast("long").alias("survivor_chars"),
    )


def _surv_oracle() -> str:
    from .catalog_batch8 import ORACLE_Q86
    from .catalog_northstar import DUPED_DOCS_SQL, ORACLE_Q26

    return f"""
WITH RECURSIVE mh AS ({ORACLE_Q26}),
shp AS ({ORACLE_Q86}),
confirmed AS (
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
  SELECT id, MIN(r) AS component FROM reach GROUP BY id),
duped AS ({DUPED_DOCS_SQL}),
member AS (
  SELECT l.component, l.id, LENGTH(d.text) AS n_chars
  FROM labels l JOIN duped d ON d.doc_id = l.id),
ranked AS (
  SELECT component, id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY component
                            ORDER BY n_chars DESC, id) AS rn,
         COUNT(*) OVER (PARTITION BY component) AS sz
  FROM member)
SELECT component, CAST(sz AS BIGINT) AS cluster_size,
       id AS survivor_id, CAST(n_chars AS BIGINT) AS survivor_chars
FROM ranked WHERE rn = 1
"""


def batch75_registry() -> list[QueryDef]:
    return [
        QueryDef(
            "q318_cluster_survivors",
            q318_cluster_survivors,
            _surv_oracle(),
            "highest-quality survivor per confirmed near-dup cluster",
        ),
    ]
