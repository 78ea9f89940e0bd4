"""Tenth catalog batch: corpus-hygiene tier — PII redaction, cross-
document duplicated-n-gram fraction, Gopher-style quality gates, and an
ANN recall evaluation (approximate vs exact retrieval).

All four are LLM-data-pipeline operators beyond the reference's scope
(its pipeline ends at CSV→Postgres loading); each pairs a Spark plan
with a full-semantics DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import curation as C
from ..operators import similarity as S
from ..operators import textstats as T
from ..sources.parquet import load_tables
from .catalog import QueryDef
from .catalog_northstar import ORACLE_Q28, _text_stats_oracle
from .catalog_pandas import CENTROIDS, ORACLE_Q46

# q94: PII redaction ---------------------------------------------------------


def q94_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over a contact blob derived from ``customer``:
    mask emails, IPv4s, then bare number runs (sequential patterns),
    reporting per-row span counts. Scan-shaped regexp work — pure
    codegen, no shuffle (operators/curation.py:redact_text)."""
    cust = load_tables(spark, sf_dir, ["customer"])["customer"]
    blob = F.concat(
        F.col("c_name"),
        F.lit(" <user"),
        F.col("c_custkey").cast("string"),
        F.lit("@example.com> host 10.0."),
        (F.col("c_custkey") % 256).cast("string"),
        F.lit(".1 ref "),
        (F.col("c_custkey") * 7919).cast("string"),
    )
    return C.redact_text(
        cust.select("c_custkey", blob.alias("note")), "note"
    ).select("c_custkey", "n_email", "n_ipv4", "n_number", "redacted")


_RX_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
_RX_IPV4 = r"\b[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+\b"
_RX_NUM = r"[0-9]+"

ORACLE_Q94 = f"""
WITH blob AS (
  SELECT c_custkey,
         c_name || ' <user' || CAST(c_custkey AS VARCHAR) ||
         '@example.com> host 10.0.' || CAST(c_custkey % 256 AS VARCHAR) ||
         '.1 ref ' || CAST(c_custkey * 7919 AS VARCHAR) AS note
  FROM customer),
s1 AS (
  SELECT c_custkey, note,
         len(regexp_extract_all(note, '{_RX_EMAIL}')) AS n_email,
         regexp_replace(note, '{_RX_EMAIL}', '<EMAIL>', 'g') AS t1
  FROM blob),
s2 AS (
  SELECT c_custkey, n_email,
         len(regexp_extract_all(t1, '{_RX_IPV4}')) AS n_ipv4,
         regexp_replace(t1, '{_RX_IPV4}', '<IP>', 'g') AS t2
  FROM s1)
SELECT c_custkey,
       CAST(n_email AS BIGINT) AS n_email,
       CAST(n_ipv4 AS BIGINT) AS n_ipv4,
       CAST(len(regexp_extract_all(t2, '{_RX_NUM}')) AS BIGINT) AS n_number,
       regexp_replace(t2, '{_RX_NUM}', '<NUM>', 'g') AS redacted
FROM s2
"""


# q95: cross-document duplicated-n-gram fraction -----------------------------

DUP_N = 5

_TOKS = "string_split_regex(trim(text), '\\s+')"
_SHINGLES_N = (
    "list_distinct(list_transform("
    "generate_series(0, greatest(len({toks}) - {n}, 0)), "
    "i -> array_to_string(list_slice({toks}, i + 1, i + {n}), ' ')))"
).format(toks=_TOKS, n=DUP_N)


def q95_dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb-style boilerplate signal: per document, the fraction
    of its distinct 5-grams occurring in ≥2 documents corpus-wide
    (operators/curation.py:dup_ngram_fraction)."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    return C.dup_ngram_fraction(docs, n=DUP_N)


ORACLE_Q95 = f"""
WITH sh AS (SELECT doc_id, {_SHINGLES_N} AS sh FROM documents),
ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
dfq AS (SELECT s, COUNT(*) AS df FROM ex GROUP BY s),
j AS (
  SELECT e.doc_id,
         CASE WHEN d.df >= 2 THEN 1 ELSE 0 END AS hit
  FROM ex e JOIN dfq d USING (s))
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(hit) AS BIGINT) AS n_dup_shingles,
       round(CAST(SUM(hit) AS DOUBLE) / COUNT(*), 6) AS dup_frac
FROM j GROUP BY doc_id
"""


# q96: Gopher-style quality gates --------------------------------------------


def q96_quality_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based pre-training filter: interval gates over the q29
    feature columns plus the conjunction; gates evaluate the rounded
    features so engines agree bit-for-bit
    (operators/curation.py:quality_gates)."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    return C.quality_gates(T.quality_features(docs))


def _gates_oracle() -> str:
    flags = []
    conj = []
    for feat in sorted(C.QUALITY_GATES):
        lo, hi = C.QUALITY_GATES[feat]
        expr = (
            f"({feat} IS NOT NULL AND {feat} BETWEEN {lo} AND {hi})"
        )
        flags.append(f"{expr} AS gate_{feat}")
        conj.append(expr)
    return f"""
WITH feats AS ({_text_stats_oracle()})
SELECT doc_id, {', '.join(flags)},
       ({' AND '.join(conj)}) AS passes
FROM feats
"""


ORACLE_Q96 = _gates_oracle()


# q97: ANN recall evaluation (IVF vs exact) ----------------------------------

RECALL_K = 10


def q97_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation: recall@10 of the IVF ANN (q46
    configuration) against brute-force exact top-10 (q28), per query.
    Both sides are existing operators; the join is per-query metadata
    scale. The expensive side (exact top-k) broadcasts queries and
    never shuffles the corpus."""
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = S.brute_force_topk(emb, queries, k=RECALL_K)
    approx = S.ivf_topk(emb, queries, CENTROIDS, k=RECALL_K, nprobe=2)
    hits = exact.join(
        approx.select("query_id", "vec_id"), on=["query_id", "vec_id"]
    )
    return (
        hits.groupBy("query_id")
        .agg(F.count("*").cast("long").alias("n_hits"))
        .select(
            "query_id",
            "n_hits",
            F.round(F.col("n_hits") / F.lit(float(RECALL_K)), 6).alias(
                "recall"
            ),
        )
    )


ORACLE_Q97 = f"""
WITH exact AS ({ORACLE_Q28}),
approx AS ({ORACLE_Q46})
SELECT e.query_id,
       CAST(COUNT(*) AS BIGINT) AS n_hits,
       round(COUNT(*) / {float(RECALL_K)}, 6) AS recall
FROM exact e JOIN approx a
  ON e.query_id = a.query_id AND e.vec_id = a.vec_id
GROUP BY e.query_id
"""


def batch10_registry() -> list[QueryDef]:
    return [
        QueryDef("q94_pii_redact", q94_pii_redact, ORACLE_Q94, "sequential-pattern PII masking with span counts"),
        QueryDef("q95_dup_ngram_fraction", q95_dup_ngram_fraction, ORACLE_Q95, "cross-document duplicated 5-gram fraction"),
        QueryDef("q96_quality_gates", q96_quality_gates, ORACLE_Q96, "Gopher-style quality gate flags"),
        QueryDef("q97_ann_recall", q97_ann_recall, ORACLE_Q97, "IVF ANN recall@10 vs brute-force exact"),
    ]
