"""Batch 76: near-dup pair overlap explanation.

q319 is the audit leg of the dedup story: for every ENSEMBLE-confirmed
pair (q314's MinHash-AND-SimHash set), explain WHERE the overlap is —
how many of doc_a's token positions carry a token that also occurs in
doc_b, the longest CONSECUTIVE such run (the shared passage a reviewer
would look at), and the coverage fraction. This is what a dedup
release review renders next to each borderline pair. Candidate-bounded
throughout: positions explode only for docs that appear in a confirmed
pair (a semi-join would prune further at scale; at 100 TB the pair set
is the small side), runs come from the classic islands trick (position
minus per-pair row_number — every window partitioned by the pair key),
and the oracle replays the identical definition with DuckDB's
positional parallel-unnest."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import QueryDef


def q319_pair_overlap_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id_a, id_b, n_tokens_a, n_matched, longest_run, coverage) for
    every ensemble-confirmed near-dup pair."""
    from .catalog_batch8 import q86_simhash_hamming
    from .catalog_northstar import _duped_docs, q26_minhash_lsh

    confirmed = (
        q26_minhash_lsh(spark, sf_dir)
        .select("id_a", "id_b")
        .intersect(
            q86_simhash_hamming(spark, sf_dir).select("id_a", "id_b")
        )
        .localCheckpoint(eager=False)
    )

    duped = _duped_docs(spark, sf_dir)
    toks = duped.select(
        F.col("doc_id").alias("id"),
        F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos0", "tok"),
    ).select("id", (F.col("pos0") + 1).alias("pos"), "tok")
    sizes = duped.select(
        F.col("doc_id").alias("id_a"),
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias(
            "n_tokens_a"
        ),
    )
    b_toks = toks.select(F.col("id").alias("id_b"), "tok").distinct()
    matched = (
        confirmed.join(
            toks.select(F.col("id").alias("id_a"), "pos", "tok"), on="id_a"
        )
        .join(b_toks, on=["id_b", "tok"], how="left_semi")
    )
    w = Window.partitionBy("id_a", "id_b").orderBy("pos")
    runs = (
        matched.withColumn(
            "_island", F.col("pos") - F.row_number().over(w)
        )
        .groupBy("id_a", "id_b", "_island")
        .agg(F.count("*").cast("long").alias("_run"))
    )
    return (
        runs.groupBy("id_a", "id_b")
        .agg(
            F.sum("_run").cast("long").alias("n_matched"),
            F.max("_run").cast("long").alias("longest_run"),
        )
        .join(sizes, on="id_a")
        .select(
            "id_a",
            "id_b",
            "n_tokens_a",
            "n_matched",
            "longest_run",
            F.round(
                F.col("n_matched") / F.col("n_tokens_a").cast("double"), 6
            ).alias("coverage"),
        )
    )


def _spans_oracle() -> str:
    from .catalog_batch8 import ORACLE_Q86
    from .catalog_northstar import DUPED_DOCS_SQL, ORACLE_Q26

    return f"""
WITH mh AS ({ORACLE_Q26}),
shp AS ({ORACLE_Q86}),
confirmed AS (
  SELECT DISTINCT m.id_a, m.id_b
  FROM mh m JOIN shp s ON m.id_a = s.id_a AND m.id_b = s.id_b),
duped AS ({DUPED_DOCS_SQL}),
toklists AS (
  SELECT doc_id AS id, string_split_regex(trim(text), '\\s+') AS l
  FROM duped),
toks AS (
  SELECT t.id, u.pos, u.tok
  FROM toklists t, LATERAL (
    SELECT unnest(l) AS tok, unnest(range(1, len(l) + 1)) AS pos) u),
sizes AS (SELECT id AS id_a, CAST(len(l) AS BIGINT) AS n_tokens_a
          FROM toklists),
btoks AS (SELECT DISTINCT id AS id_b, tok FROM toks),
matched AS (
  SELECT c.id_a, c.id_b, a.pos
  FROM confirmed c
  JOIN toks a ON a.id = c.id_a
  WHERE EXISTS (SELECT 1 FROM btoks b
                WHERE b.id_b = c.id_b AND b.tok = a.tok)),
runs AS (
  SELECT id_a, id_b,
         pos - ROW_NUMBER() OVER (PARTITION BY id_a, id_b
                                  ORDER BY pos) AS island
  FROM matched),
runlens AS (
  SELECT id_a, id_b, CAST(COUNT(*) AS BIGINT) AS run
  FROM runs GROUP BY id_a, id_b, island)
SELECT r.id_a, r.id_b, s.n_tokens_a,
       CAST(SUM(run) AS BIGINT) AS n_matched,
       CAST(MAX(run) AS BIGINT) AS longest_run,
       ROUND(SUM(run) / CAST(s.n_tokens_a AS DOUBLE), 6) AS coverage
FROM runlens r JOIN sizes s ON s.id_a = r.id_a
GROUP BY r.id_a, r.id_b, s.n_tokens_a
"""


def batch76_registry() -> list[QueryDef]:
    return [
        QueryDef(
            "q319_pair_overlap_spans",
            q319_pair_overlap_spans,
            _spans_oracle(),
            "shared-token runs + coverage for every confirmed near-dup pair",
        ),
    ]
