"""Batch 24: corpus-graph analytics & skew diagnostics.

- q155: TextRank keyword extraction (Mihalcea & Tarau 2004) — a word
  co-occurrence graph from adjacent-token pairs, ranked by the graph
  tier's exact fixed-point PageRank. Pure composition of existing
  operators (``graph.pagerank`` over a Catalyst edge build); the oracle
  unrolls the same 3 integer-arithmetic iterations as q119.
- q156: GloVe-style window co-occurrence counts (unordered token pairs
  within distance <= 3) — the corpus statistic embedding trainers
  consume. Per-row array expansion (x3 the token stream), one hash
  aggregate with map-side partial combine; no join anywhere.
- q157: join-skew planner — per join-key column: row/key counts, the
  heaviest key, a max/avg skew factor, and the salt-bucket count the
  salted operators (q48/q141/topk_per_key) would need. All-integer
  arithmetic; the "measure before you salt" diagnostic.

Scale notes: q155's edge build explodes adjacent pairs (stream-sized,
not quadratic), dedups per document, and aggregates — identical cost
shape to the shingle joins; PageRank itself is the q119 machinery
(checkpointed degree table, one O(E) shuffle per iteration). q156/q157
are single-aggregate pipelines. Invariant 8 (``F.sequence(1, 0)`` is
DESCENDING in Spark, so generated index ranges are guarded) applies to
q155's edge build; q156 avoids index generation entirely — its pairs
come from zipping the token array with offset-shifted slices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import pagerank
from ..operators.textstats import tokens
from ..sources.parquet import load_tables
from .catalog import QueryDef

# ---------------------------------------------------------------------------
# q155: TextRank keywords
# ---------------------------------------------------------------------------

_MIN_DOCS = 60  # an edge must co-occur in >= this many documents
# (sf0.01: keeps the top ~20% of adjacent pairs — 91 edges, a selective
# graph rather than the near-complete co-occurrence clique)


def _word_edges(docs: DataFrame) -> DataFrame:
    """Canonical (src < dst) adjacent-token edges appearing in >=
    _MIN_DOCS distinct documents. Pairs come from zipping the token
    array with its own 1-shifted slice (the vectorized shape that made
    q156 10x faster; ``slice`` length 0 on 1-token docs yields an
    empty zip, no guard needed)."""
    t = tokens(F.col("text"))
    n = F.size(t)
    ln = F.greatest(n - 1, F.lit(0))
    pair = F.arrays_zip(
        F.slice(t, 1, ln).alias("x"), F.slice(t, 2, ln).alias("y")
    )
    return (
        docs.select("doc_id", F.explode(pair).alias("p"))
        .select(
            "doc_id",
            F.least("p.x", "p.y").alias("src"),
            F.greatest("p.x", "p.y").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
        .where(F.col("w") >= _MIN_DOCS)
        .select("src", "dst")
    )


def q155_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 corpus keywords by 3-iteration PageRank over the word
    co-occurrence graph — TextRank, riding the exact scaled-integer
    PageRank of the graph tier (bit-identical across engines)."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    pr = pagerank(_word_edges(docs), iterations=3, damping_pct=85)
    return (
        pr.orderBy(F.desc("rank_scaled"), F.asc("node"))
        .limit(15)
        .select(F.col("node").alias("keyword"), "rank_scaled", "rank")
    )


_WORD_EDGES_SQL = f"""
toked AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     x -> x <> '') AS t
  FROM documents),
adj AS (
  SELECT DISTINCT doc_id,
         least(t[i], t[i + 1]) AS src,
         greatest(t[i], t[i + 1]) AS dst
  FROM toked, UNNEST(generate_series(1, len(t) - 1)) AS g(i)
  WHERE t[i] <> t[i + 1]),
edges AS (
  SELECT src, dst FROM adj GROUP BY src, dst
  HAVING COUNT(*) >= {_MIN_DOCS})
"""


ORACLE_Q155 = f"""
WITH {_WORD_EDGES_SQL},
sym AS (
  SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges
),
deg AS (
  SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree
  FROM sym GROUP BY src
),
nv AS (SELECT COUNT(*) AS n FROM deg),
r0 AS (
  SELECT node, CAST(1000000000000 // nv.n AS BIGINT) AS r
  FROM deg, nv
),
r1 AS (
  SELECT s.dst AS node,
         CAST((SELECT (15 * 1000000000000) // (100 * n) FROM nv)
              + (SUM(r0.r // d.degree) * 85) // 100 AS BIGINT) AS r
  FROM sym s JOIN deg d ON s.src = d.node JOIN r0 ON s.src = r0.node
  GROUP BY s.dst
),
r2 AS (
  SELECT s.dst AS node,
         CAST((SELECT (15 * 1000000000000) // (100 * n) FROM nv)
              + (SUM(r1.r // d.degree) * 85) // 100 AS BIGINT) AS r
  FROM sym s JOIN deg d ON s.src = d.node JOIN r1 ON s.src = r1.node
  GROUP BY s.dst
),
r3 AS (
  SELECT s.dst AS node,
         CAST((SELECT (15 * 1000000000000) // (100 * n) FROM nv)
              + (SUM(r2.r // d.degree) * 85) // 100 AS BIGINT) AS r
  FROM sym s JOIN deg d ON s.src = d.node JOIN r2 ON s.src = r2.node
  GROUP BY s.dst
)
SELECT node AS keyword, r AS rank_scaled,
       CAST(r AS DOUBLE) / 1000000000000.0 AS rank
FROM r3
ORDER BY rank_scaled DESC, keyword ASC LIMIT 15
"""


# ---------------------------------------------------------------------------
# q156: window co-occurrence counts
# ---------------------------------------------------------------------------

_WINDOW = 3


def q156_window_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 unordered token pairs by co-occurrence count within a
    +/-3 token window — the GloVe/word2vec corpus statistic. The pair
    stream is THREE zips of the token array against its own
    offset-shifted slice (one vectorized pass per offset, no
    per-element element_at lambda: the nested-transform formulation
    measured 10x slower at 10x scale — 35s -> 3.6s); the only shuffle
    is the final count. ``slice`` with length 0 yields an empty array,
    so short documents need no special-casing."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    t = tokens(F.col("text"))
    n = F.size(t)
    parts = []
    for off in range(1, _WINDOW + 1):
        a = F.slice(t, 1, F.greatest(n - off, F.lit(0)))
        b = F.slice(t, off + 1, F.greatest(n - off, F.lit(0)))
        parts.append(F.arrays_zip(a.alias("x"), b.alias("y")))
    pairs = F.concat(*parts)
    return (
        docs.select(F.explode(pairs).alias("p"))
        .select(
            F.least("p.x", "p.y").alias("src"),
            F.greatest("p.x", "p.y").alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count("*").cast("long").alias("n_cooc"))
        .orderBy(F.desc("n_cooc"), F.asc("src"), F.asc("dst"))
        .limit(30)
    )


ORACLE_Q156 = f"""
WITH toked AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     x -> x <> '') AS t
  FROM documents),
pairs AS (
  SELECT least(t[i], t[j]) AS src, greatest(t[i], t[j]) AS dst
  FROM toked,
       UNNEST(generate_series(1, len(t) - 1)) AS g(i),
       UNNEST(generate_series(i + 1, least(i + {_WINDOW}, len(t)))) AS h(j))
SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n_cooc
FROM pairs GROUP BY src, dst
ORDER BY n_cooc DESC, src ASC, dst ASC LIMIT 30
"""


# ---------------------------------------------------------------------------
# q157: join-skew planner
# ---------------------------------------------------------------------------


def _key_stats(df: DataFrame, key: str, label: str) -> DataFrame:
    cnts = df.groupBy(key).agg(F.count("*").alias("c"))
    max_c = F.max("c")
    n_keys = F.count("*")
    n_rows = F.sum("c")
    # skew = max/avg = max*n_keys/n_rows, in integer basis points/100;
    # salt buckets to tame the hottest key to ~2x average: ceil-div
    return cnts.agg(
        F.lit(label).alias("side"),
        n_rows.cast("long").alias("n_rows"),
        n_keys.cast("long").alias("n_keys"),
        max_c.cast("long").alias("max_key_rows"),
        F.expr("(max(c) * count(*) * 100) div sum(c)")
        .cast("long")
        .alias("skew_x100"),
        F.expr("(max(c) * count(*) + 2 * sum(c) - 1) div (2 * sum(c))")
        .cast("long")
        .alias("salt_buckets"),
    )


def q157_skew_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measure-before-you-salt: per candidate join key, the integer
    skew factor (heaviest key vs average) and the salt-bucket count
    that would bound its hottest task — the diagnostic that decides
    between a plain shuffle join and the salted two-phase operators."""
    t = load_tables(spark, sf_dir, ["lineitem", "orders", "documents"])
    return (
        _key_stats(t["lineitem"], "l_orderkey", "lineitem.l_orderkey")
        .unionAll(_key_stats(t["orders"], "o_custkey", "orders.o_custkey"))
        .unionAll(_key_stats(t["documents"], "source", "documents.source"))
    )


_KEY_STATS_SQL = """
SELECT '{label}' AS side,
  CAST(SUM(c) AS BIGINT) AS n_rows,
  CAST(COUNT(*) AS BIGINT) AS n_keys,
  CAST(MAX(c) AS BIGINT) AS max_key_rows,
  CAST((MAX(c) * COUNT(*) * 100) // CAST(SUM(c) AS BIGINT) AS BIGINT)
    AS skew_x100,
  CAST((MAX(c) * COUNT(*) + 2 * CAST(SUM(c) AS BIGINT) - 1)
       // (2 * CAST(SUM(c) AS BIGINT)) AS BIGINT) AS salt_buckets
FROM (SELECT {key}, COUNT(*) AS c FROM {table} GROUP BY {key})
"""

ORACLE_Q157 = " UNION ALL ".join(
    _KEY_STATS_SQL.format(label=lb, key=k, table=tb)
    for lb, k, tb in [
        ("lineitem.l_orderkey", "l_orderkey", "lineitem"),
        ("orders.o_custkey", "o_custkey", "orders"),
        ("documents.source", "source", "documents"),
    ]
)


# ---------------------------------------------------------------------------
# q158: prefix-filtered exact Jaccard pairs (PPJoin)
# ---------------------------------------------------------------------------


def q158_prefix_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result set as q25 (exact Jaccard >= 0.8 near-dup pairs on
    the duplicated-docs fixture) through the PPJoin prefix-filtered
    candidate join — the oracle is deliberately IDENTICAL to q25's:
    prefix filtering is an exact optimization, and any recall loss
    would surface as a hash mismatch here."""
    from ..operators.dedup import prefix_jaccard_pairs
    from .catalog_northstar import _duped_docs

    return prefix_jaccard_pairs(
        _duped_docs(spark, sf_dir), threshold_pct=80
    )


def _oracle_q158() -> str:
    from .catalog_northstar import ORACLE_Q25

    return ORACLE_Q25


# ---------------------------------------------------------------------------
# q159: sorted-neighborhood record linkage
# ---------------------------------------------------------------------------


def q159_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood blocking over the duplicated-docs fixture:
    records sort by their 40-char text prefix, each record is compared
    only with its next 5 neighbors (O(n*w) candidates, window-free via
    global_row_number), and candidates verify with full-text
    Levenshtein <= 2. The oracle states the same neighborhood
    definition directly — both engines agree on the window, so the
    result is deterministic even when >5 records share a sort key."""
    from ..operators.linkage import sorted_neighborhood_pairs
    from .catalog_northstar import _duped_docs

    docs = _duped_docs(spark, sf_dir)
    pairs = sorted_neighborhood_pairs(
        docs, key=F.substring("text", 1, 40), window=5
    )
    ta = docs.select(
        F.col("doc_id").alias("id_a"), F.col("text").alias("_txt_a")
    )
    tb = docs.select(
        F.col("doc_id").alias("id_b"), F.col("text").alias("_txt_b")
    )
    return (
        pairs.join(ta, on="id_a")
        .join(tb, on="id_b")
        .select(
            "id_a",
            "id_b",
            F.levenshtein("_txt_a", "_txt_b").cast("long").alias("lev"),
        )
        .where(F.col("lev") <= 2)
    )


def _oracle_q159() -> str:
    from .catalog_northstar import DUPED_DOCS_SQL

    return f"""
WITH duped AS ({DUPED_DOCS_SQL}),
keyed AS (SELECT doc_id AS id, substr(text, 1, 40) AS k, text FROM duped),
idxd AS (
  SELECT id, text,
    CAST(row_number() OVER (ORDER BY k, id) AS BIGINT) AS idx
  FROM keyed)
SELECT a.id AS id_a, b.id AS id_b,
  CAST(levenshtein(a.text, b.text) AS BIGINT) AS lev
FROM idxd a JOIN idxd b
  ON b.idx > a.idx AND b.idx <= a.idx + 5
WHERE levenshtein(a.text, b.text) <= 2
"""


def batch24_registry() -> list[QueryDef]:
    return [
        QueryDef("q155_textrank_keywords", q155_textrank_keywords,
                 ORACLE_Q155,
                 "TextRank keywords via exact fixed-point PageRank"),
        QueryDef("q156_window_cooccurrence", q156_window_cooccurrence,
                 ORACLE_Q156,
                 "GloVe-style window co-occurrence counts (join-free)"),
        QueryDef("q157_skew_planner", q157_skew_planner, ORACLE_Q157,
                 "join-skew planner: integer skew factor + salt sizing"),
        QueryDef("q158_prefix_jaccard", q158_prefix_jaccard,
                 _oracle_q158(),
                 "PPJoin prefix-filtered exact Jaccard pairs (q25 oracle)"),
        QueryDef("q159_sorted_neighborhood", q159_sorted_neighborhood,
                 _oracle_q159(),
                 "sorted-neighborhood blocking + Levenshtein verify"),
    ]
