"""Batch 41: reciprocal-neighbor filtering, repetition-aware dedup,
robust aggregation, hierarchy rollups, and decayed leaderboards.

Five operators a 100 TB curation/analytics stack reaches for that the
catalog didn't yet cover as first-class, each exact and oracle-paired:

- q216 mutual (reciprocal) k-NN pairs — the precision filter for
  embedding near-dup clustering (``similarity.mutual_topk_pairs``);
- q217 weighted multiset Jaccard — repetition-aware near-dup scoring
  (``dedup.weighted_jaccard_pairs``), exact over ALL shared tokens
  while candidates stay capped;
- q218 median-of-means — the sub-Gaussian robust mean
  (``robust.median_of_means``), bucket state O(B) per key;
- q219 path-hierarchy rollup — per-prefix aggregation of a
  slash-delimited taxonomy (one explode of depth prefixes, one
  groupBy: the URL-tree / category-tree shape);
- q220 half-life-decayed leaderboard — staircase 2^-(age div h)
  decay in exact integers (recency-weighted ranking with no float
  accumulation order hazard).

No reference counterpart (the reference has no query engine); these
extend SURVEY §2.9's LLM-data-pipeline tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_tables
from .catalog import QueryDef
from .catalog_batch8 import NEARDUP_BANDS, NEARDUP_BITS, _emb_bands_sql

# ---------------------------------------------------------------------------
# q216: mutual (reciprocal) k-nearest-neighbor pairs
# ---------------------------------------------------------------------------

_MKNN_K = 3


def q216_mutual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal top-3 neighbor pairs over the embeddings corpus:
    sign-band LSH candidates, exact cosine, per-source rank, keep
    pairs ranked <=3 in BOTH directions. The mutuality filter is what
    turns a near-dup candidate graph into safe merge edges (hub
    vectors lose their one-sided neighbors)."""
    from ..operators.similarity import mutual_topk_pairs

    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    return mutual_topk_pairs(
        base,
        k=_MKNN_K,
        bands=NEARDUP_BANDS,
        bits_per_band=NEARDUP_BITS,
    ).orderBy("id_a", "id_b")


ORACLE_Q216 = f"""
WITH duped AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
keyed AS (
  SELECT vec_id, v, unnest({_emb_bands_sql()}, recursive := true)
  FROM duped),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
         round(list_dot_product(a.v, b.v) /
               (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
  FROM keyed a
  JOIN keyed b ON a.band = b.band AND a.key = b.key
              AND a.vec_id < b.vec_id),
directed AS (
  SELECT id_a AS src, id_b AS dst, cosine FROM cand
  UNION ALL
  SELECT id_b AS src, id_a AS dst, cosine FROM cand),
ranked AS (
  SELECT src, dst, cosine,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY src ORDER BY cosine DESC, dst ASC) AS BIGINT)
           AS rank
  FROM directed),
topk AS (SELECT * FROM ranked WHERE rank <= {_MKNN_K})
SELECT f.src AS id_a, f.dst AS id_b, f.cosine,
       f.rank AS rank_ab, r.rank AS rank_ba
FROM topk f JOIN topk r ON f.src = r.dst AND f.dst = r.src
WHERE f.src < f.dst
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# q217: weighted (multiset) Jaccard near-dup pairs
# ---------------------------------------------------------------------------

_WJ_THRESHOLD_MICRO = 400_000
_WJ_MAX_DOC_RATIO = 0.5


def q217_weighted_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-aware near-dup pairs: exact weighted Jaccard
    Σmin(c_a,c_b)/Σmax(c_a,c_b) over token COUNTS, integer
    micro-units. Candidates come from the capped shared-token join
    (tokens in >50% of docs are skew, not signal) but the score is
    rebuilt over ALL shared tokens, so the cap cannot move it."""
    from ..operators.dedup import weighted_jaccard_pairs

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    return weighted_jaccard_pairs(
        docs,
        threshold_micro=_WJ_THRESHOLD_MICRO,
        max_doc_ratio=_WJ_MAX_DOC_RATIO,
    ).orderBy("id_a", "id_b")


ORACLE_Q217 = f"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                            t -> t != '')) AS tok
  FROM documents),
counts AS (
  SELECT doc_id AS id, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM tok GROUP BY 1, 2),
tots AS (SELECT id, CAST(SUM(c) AS BIGINT) AS tot FROM counts GROUP BY id),
rare AS (
  SELECT tok FROM counts GROUP BY tok
  HAVING COUNT(*) <= {_WJ_MAX_DOC_RATIO}
         * (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents)),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM counts a
  JOIN rare USING (tok)
  JOIN counts b ON a.tok = b.tok AND a.id < b.id),
mins AS (
  SELECT c.id_a, c.id_b,
         CAST(SUM(LEAST(ca.c, cb.c)) AS BIGINT) AS min_sum
  FROM cand c
  JOIN counts ca ON ca.id = c.id_a
  JOIN counts cb ON cb.id = c.id_b AND cb.tok = ca.tok
  GROUP BY 1, 2)
SELECT m.id_a, m.id_b, m.min_sum, ta.tot AS tot_a, tb.tot AS tot_b,
       CAST((1000000 * m.min_sum)
            // (ta.tot + tb.tot - m.min_sum) AS BIGINT) AS wjacc_micro
FROM mins m
JOIN tots ta ON ta.id = m.id_a
JOIN tots tb ON tb.id = m.id_b
WHERE (1000000 * m.min_sum) // (ta.tot + tb.tot - m.min_sum)
      >= {_WJ_THRESHOLD_MICRO}
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# q218: median-of-means robust mean per event type
# ---------------------------------------------------------------------------

_MOM_BUCKETS = 16


def q218_median_of_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type mean of event value: 16 md5 buckets, exact
    integer bucket means, median of the bucket means (floor-average
    of the two central when even). The plain mean rides along so the
    tail influence is visible."""
    from ..operators.robust import median_of_means

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    return median_of_means(
        ev, ["event_type"], "value", "event_id", n_buckets=_MOM_BUCKETS
    ).orderBy("event_type")


ORACLE_Q218 = f"""
WITH rows_b AS (
  SELECT event_type,
         ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
           % {_MOM_BUCKETS} AS b,
         CAST(CAST(value * 100 AS DECIMAL(20,0)) AS BIGINT) AS cents
  FROM events),
per_bucket AS (
  SELECT event_type, b, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(cents) AS BIGINT) AS s
  FROM rows_b GROUP BY 1, 2),
bmean AS (
  SELECT event_type, b, cnt, s,
         CAST((s * 10000) // cnt AS BIGINT) AS bm
  FROM per_bucket),
ranked AS (
  SELECT event_type, bm,
         ROW_NUMBER() OVER (
           PARTITION BY event_type ORDER BY bm ASC, b ASC) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS nb
  FROM bmean),
central AS (
  SELECT event_type, CAST(SUM(bm) // COUNT(*) AS BIGINT) AS mom_scaled
  FROM ranked
  WHERE rk = (nb + 1) // 2 OR rk = nb // 2 + 1
  GROUP BY event_type),
stats AS (
  SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n_rows,
         CAST((SUM(s) * 10000) // SUM(cnt) AS BIGINT) AS mean_scaled
  FROM per_bucket GROUP BY event_type)
SELECT s.event_type, s.n_rows, s.mean_scaled, c.mom_scaled
FROM stats s JOIN central c USING (event_type)
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# q219: path-hierarchy rollup
# ---------------------------------------------------------------------------


def _doc_paths(docs: DataFrame) -> DataFrame:
    """Deterministic 3-level taxonomy path per document:
    /<source>/<lang>/d<doc_id % 20> — the URL-tree / category-tree
    fixture (both engines synthesize identically)."""
    return docs.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.concat(
            F.lit("/"), F.col("source"),
            F.lit("/"), F.col("lang"),
            F.lit("/d"), (F.col("doc_id") % 20).cast("string"),
        ).alias("path"),
    )


_PATHS_SQL = """
paths AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
         '/' || source || '/' || lang || '/d'
             || CAST(doc_id % 20 AS VARCHAR) AS path
  FROM documents)
"""


def q219_path_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-prefix rollup of a slash-delimited hierarchy: every
    document contributes to each of its 3 ancestor prefixes via ONE
    posexplode of the prefix array + one groupBy — the distributive-
    aggregate tree rollup (URL trees, category taxonomies, file
    systems) with no per-level scan and no iteration."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    p = _doc_paths(docs)
    segs = F.split(F.substring("path", 2, 1 << 30), "/")
    prefixes = F.transform(
        F.sequence(F.lit(1), F.size(segs)),
        lambda d: F.struct(
            d.cast("long").alias("depth"),
            F.concat(
                F.lit("/"), F.array_join(F.slice(segs, 1, d), "/")
            ).alias("prefix"),
        ),
    )
    return (
        p.select("n_chars", F.explode(prefixes).alias("e"))
        .groupBy(F.col("e.depth").alias("depth"), F.col("e.prefix").alias("prefix"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .where(F.col("depth") <= 2)  # leaf level is per-doc noise
        .orderBy("depth", "prefix")
    )


ORACLE_Q219 = f"""
WITH {_PATHS_SQL},
segs AS (
  SELECT doc_id, n_chars,
         string_split(substr(path, 2), '/') AS s
  FROM paths),
pref AS (
  SELECT n_chars, d.depth,
         '/' || array_to_string(s[1:d.depth], '/') AS prefix
  FROM segs,
       (SELECT unnest(generate_series(1, 3)) AS depth) d
  WHERE d.depth <= len(s))
SELECT CAST(depth AS BIGINT) AS depth, prefix,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM pref
WHERE depth <= 2
GROUP BY 1, 2
ORDER BY depth, prefix
"""


# ---------------------------------------------------------------------------
# q220: half-life-decayed leaderboard
# ---------------------------------------------------------------------------

_HALF_LIFE_DAYS = 7


def q220_decayed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted event-type leaderboard: daily counts decayed
    by 2^-(age_days div 7) relative to the corpus max date —
    staircase half-life decay in EXACT integers (micro-units divided
    by a power of two), so the ranking is reproducible across
    engines and addition orders. One scan, two bounded aggregations,
    a broadcast 1-row max-date join."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    # checkpointed: the max-date rider derives from the daily table
    # (max over groups == max over rows), so the events scan runs once
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").cast("long").alias("cnt")).localCheckpoint(
        eager=False
    )
    maxd = daily.agg(F.max("day").alias("_maxd"))
    decayed = (
        daily.crossJoin(F.broadcast(maxd))
        .withColumn("_age", F.datediff(F.col("_maxd"), F.col("day")))
        .withColumn(
            "_dec",
            F.expr(
                f"(cnt * 1000000) div shiftleft(CAST(1 AS BIGINT),"
                f" CAST(least(_age div {_HALF_LIFE_DAYS}, 62) AS INT))"
            ).cast("long"),
        )
    )
    return (
        decayed.groupBy("event_type")
        .agg(
            F.sum("cnt").cast("long").alias("n_events"),
            F.sum("_dec").cast("long").alias("decayed_micro"),
        )
        .orderBy(F.desc("decayed_micro"), F.asc("event_type"))
    )


ORACLE_Q220 = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2),
maxd AS (SELECT MAX(CAST(ts AS DATE)) AS m FROM events),
dec AS (
  SELECT event_type, cnt,
         CAST((cnt * 1000000) // (CAST(1 AS BIGINT) << LEAST(
           date_diff('day', day, (SELECT m FROM maxd))
             // {_HALF_LIFE_DAYS}, 62)) AS BIGINT) AS d
  FROM daily)
SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n_events,
       CAST(SUM(d) AS BIGINT) AS decayed_micro
FROM dec GROUP BY event_type
ORDER BY decayed_micro DESC, event_type ASC
"""


def batch41_registry() -> list[QueryDef]:
    return [
        QueryDef("q216_mutual_knn", q216_mutual_knn, ORACLE_Q216,
                 "reciprocal k-NN pairs (mutual-rank precision filter)"),
        QueryDef("q217_weighted_jaccard", q217_weighted_jaccard,
                 ORACLE_Q217,
                 "exact weighted multiset Jaccard near-dup pairs"),
        QueryDef("q218_median_of_means", q218_median_of_means,
                 ORACLE_Q218,
                 "median-of-means robust mean, exact integer buckets"),
        QueryDef("q219_path_rollup", q219_path_rollup, ORACLE_Q219,
                 "path-hierarchy prefix rollup via one explode"),
        QueryDef("q220_decayed_topk", q220_decayed_topk, ORACLE_Q220,
                 "half-life-decayed leaderboard, exact staircase decay"),
    ]
