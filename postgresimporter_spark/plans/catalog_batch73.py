"""Batch 73: dedup method evaluation against constructed ground truth.

q316 is the harness question every dedup deployment starts with:
given a corpus with KNOWN duplicates (the duped-docs construction —
same-text pairs are exact ground truth, recoverable as a sha256
self-join), how do the candidate methods score? For MinHash-LSH
(q26's config) and SimHash-Hamming (q86's config) it reports the
exact-dup recall (tp / |truth|) and the surplus pair count — pairs
beyond the exact-dup truth, which for NEAR-dup methods is signal
(legitimate near-dups), not error; the column is named ``surplus``
rather than false positives for exactly that reason. All counts are
exact integers; both pair sets and the truth set are candidate-
bounded joins (sha256 equality / banded keys), never all-pairs."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import QueryDef


def _truth(docs: DataFrame) -> DataFrame:
    h = docs.select(
        "doc_id", F.sha2(F.col("text"), 256).alias("_h")
    )
    return (
        h.alias("x")
        .join(h.alias("y"), on="_h")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("id_a"),
            F.col("y.doc_id").alias("id_b"),
        )
    )


def q316_dedup_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-method exact-dup recall over the duped-docs corpus:
    (method, n_pairs, n_truth, tp, recall, surplus)."""
    from .catalog_batch8 import q86_simhash_hamming
    from .catalog_northstar import _duped_docs, q26_minhash_lsh

    truth = _truth(_duped_docs(spark, sf_dir)).localCheckpoint(
        eager=False
    )
    n_truth = truth.agg(F.count("*").cast("long").alias("n_truth"))

    def score(name: str, pairs: DataFrame) -> DataFrame:
        p = pairs.select("id_a", "id_b")
        stats = p.join(truth, on=["id_a", "id_b"], how="left_semi").agg(
            F.count("*").cast("long").alias("tp")
        )
        total = p.agg(F.count("*").cast("long").alias("n_pairs"))
        return (
            total.crossJoin(F.broadcast(stats))
            .crossJoin(F.broadcast(n_truth))
            .select(
                F.lit(name).alias("method"),
                "n_pairs",
                "n_truth",
                "tp",
                F.round(
                    F.col("tp") / F.col("n_truth").cast("double"), 6
                ).alias("recall"),
                (F.col("n_pairs") - F.col("tp")).alias("surplus"),
            )
        )

    mh = score("minhash_lsh", q26_minhash_lsh(spark, sf_dir))
    sh = score("simhash_hamming", q86_simhash_hamming(spark, sf_dir))
    return mh.unionByName(sh)


def _eval_oracle() -> str:
    from .catalog_batch8 import ORACLE_Q86
    from .catalog_northstar import DUPED_DOCS_SQL, ORACLE_Q26

    return f"""
WITH duped AS ({DUPED_DOCS_SQL}),
hashes AS (SELECT doc_id, sha256(text) AS h FROM duped),
truth AS (
  SELECT x.doc_id AS id_a, y.doc_id AS id_b
  FROM hashes x JOIN hashes y ON x.h = y.h AND x.doc_id < y.doc_id),
mh AS ({ORACLE_Q26}),
shp AS ({ORACLE_Q86}),
nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth),
mh_stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(CASE WHEN t.id_a IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS tp
  FROM mh LEFT JOIN truth t
    ON mh.id_a = t.id_a AND mh.id_b = t.id_b),
sh_stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(CASE WHEN t.id_a IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS tp
  FROM shp LEFT JOIN truth t
    ON shp.id_a = t.id_a AND shp.id_b = t.id_b)
SELECT 'minhash_lsh' AS method, n_pairs, n_truth, tp,
       ROUND(tp / CAST(n_truth AS DOUBLE), 6) AS recall,
       n_pairs - tp AS surplus
FROM mh_stats CROSS JOIN nt
UNION ALL
SELECT 'simhash_hamming', n_pairs, n_truth, tp,
       ROUND(tp / CAST(n_truth AS DOUBLE), 6), n_pairs - tp
FROM sh_stats CROSS JOIN nt
"""


def batch73_registry() -> list[QueryDef]:
    return [
        QueryDef(
            "q316_dedup_eval",
            q316_dedup_eval,
            _eval_oracle(),
            "MinHash/SimHash exact-dup recall vs constructed ground truth",
        ),
    ]
