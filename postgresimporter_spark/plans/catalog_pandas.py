"""Third catalog batch: the Python-path and scale-pattern operators —
IVF ANN, grouped applyInPandas centroids, mapInPandas tokenization,
salted aggregation — each oracle-checked (the Python paths use
fixed-point accumulation so they're partitioning-independent).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.pandas_ops import label_centroids, tokenize_docs
from ..operators.similarity import ivf_topk
from ..operators.skew import salted_agg
from ..sources.parquet import load_tables
from .catalog import QueryDef, _dec

# q46: IVF-partitioned ANN ---------------------------------------------------

N_CENTROIDS = 4
DIM = 64


def _centroids() -> list[tuple[int, list[float]]]:
    """Deterministic pseudo-random centroids (md5-derived, like PLANES)."""
    out = []
    for c in range(N_CENTROIDS):
        row = []
        for d in range(DIM):
            h = hashlib.md5(f"centroid:{c}:{d}".encode()).hexdigest()
            row.append(int(h[:8], 16) / 2**31 - 1.0)
        out.append((c, row))
    return out


CENTROIDS = _centroids()


def q46_similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk(emb, queries, CENTROIDS, k=10, nprobe=2)


def _ivf_oracle() -> str:
    def lit(vec: list[float]) -> str:
        return "[" + ", ".join(repr(x) for x in vec) + "]"

    def cos(vec_sql: str, lit_vec: str) -> str:
        return (
            f"list_dot_product({vec_sql}::DOUBLE[], {lit_vec}) / "
            f"(sqrt(list_dot_product({vec_sql}::DOUBLE[], {vec_sql}::DOUBLE[])) * "
            f"sqrt(list_dot_product({lit_vec}, {lit_vec})))"
        )

    score_cols = ", ".join(
        f"{cos('embedding', lit(vec))} AS s{cid}" for cid, vec in CENTROIDS
    )
    best = "greatest(" + ", ".join(f"s{c}" for c in range(N_CENTROIDS)) + ")"
    cell_case = "CASE " + " ".join(
        f"WHEN s{c} = {best} THEN {c}" for c in range(N_CENTROIDS)
    ) + " END"
    probe_union = " UNION ALL ".join(
        f"SELECT query_id, qv, {cid} AS cell, s{cid} AS cscore FROM qscored"
        for cid, _ in CENTROIDS
    )
    return f"""
WITH scored_cells AS (
  SELECT vec_id, embedding, {score_cols} FROM embeddings),
assigned AS (
  SELECT vec_id, embedding, {cell_case} AS cell FROM scored_cells),
qscored AS (
  SELECT vec_id AS query_id, embedding AS qv,
         {', '.join(f's{c}' for c in range(N_CENTROIDS))}
  FROM scored_cells WHERE vec_id < 5),
probes AS (
  SELECT query_id, qv, cell FROM (
    SELECT query_id, qv, cell,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cscore DESC, cell) AS crk
    FROM ({probe_union}) qc) t
  WHERE crk <= 2),
pairs AS (
  SELECT p.query_id, a.vec_id,
    round(list_dot_product(a.embedding::DOUBLE[], p.qv::DOUBLE[]) /
      (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
       sqrt(list_dot_product(p.qv::DOUBLE[], p.qv::DOUBLE[]))), 6) AS score
  FROM assigned a JOIN probes p ON a.cell = p.cell),
ranked AS (
  SELECT query_id, vec_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, vec_id) AS rank
  FROM pairs)
SELECT query_id, vec_id, score, rank FROM ranked WHERE rank <= 10
"""


ORACLE_Q46 = _ivf_oracle()


# q47: grouped applyInPandas centroid ---------------------------------------


def q47_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    return label_centroids(emb)


ORACLE_Q47 = """
WITH ex AS (
  SELECT label,
         unnest(generate_series(1, len(embedding))) AS dim,
         unnest(list_transform(embedding, x -> round(CAST(x AS DOUBLE), 6)))
           AS val
  FROM embeddings)
SELECT label, CAST(dim AS INT) AS dim,
  CAST(SUM(CAST(val * 1000000 AS BIGINT)) AS DOUBLE)
    / (1000000.0 * COUNT(*)) AS mean_val
FROM ex GROUP BY label, dim
"""


# q48: salted aggregation (skew pattern, result-identical) -------------------


def q48_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    return salted_agg(
        li,
        key_cols=["l_returnflag"],
        aggs={
            "n_rows": ("sum", F.count("*")),
            "sum_qty": ("sum", F.sum(_dec("l_quantity"))),
            "max_price": ("max", F.max(_dec("l_extendedprice"))),
        },
        n_salts=8,
    ).select(
        "l_returnflag",
        "n_rows",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("max_price").cast("double").alias("max_price"),
    )


ORACLE_Q48 = """
SELECT l_returnflag, COUNT(*) AS n_rows,
  CAST(SUM(CAST(l_quantity AS DECIMAL(15,4))) AS DOUBLE) AS sum_qty,
  CAST(MAX(CAST(l_extendedprice AS DECIMAL(15,4))) AS DOUBLE) AS max_price
FROM lineitem GROUP BY l_returnflag
"""


# q49: mapInPandas tokenizer (UDTF path) ------------------------------------


def q49_pandas_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    toks = tokenize_docs(docs)
    return (
        toks.groupBy("token")
        .agg(
            F.count("*").alias("n"),
            F.count_distinct("doc_id").alias("n_docs"),
            F.min(
                F.struct(F.col("doc_id"), F.col("position"))
            )["doc_id"].alias("first_doc_id"),
        )
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(30)
    )


ORACLE_Q49 = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                            t -> t != '')) AS token
  FROM documents)
SELECT token, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs,
       MIN(doc_id) AS first_doc_id
FROM toks GROUP BY token ORDER BY n DESC, token LIMIT 30
"""


def pandas_registry() -> list[QueryDef]:
    return [
        QueryDef("q46_similarity_ivf", q46_similarity_ivf, ORACLE_Q46, "IVF-partitioned ANN (nprobe cells)"),
        QueryDef("q47_label_centroids", q47_label_centroids, ORACLE_Q47, "grouped applyInPandas centroid"),
        QueryDef("q48_salted_agg", q48_salted_agg, ORACLE_Q48, "salted two-phase aggregation"),
        QueryDef("q49_pandas_tokenize", q49_pandas_tokenize, ORACLE_Q49, "mapInPandas UDTF tokenizer"),
    ]
