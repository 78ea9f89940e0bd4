"""Batch 26: end-to-end RAG retrieval evaluation.

q163 composes the retrieval stack into the eval loop a RAG pipeline
actually runs: sliding-window CHUNK the corpus (``chunk_documents``,
the q93 operator) -> index the chunks -> run a whole TABLE of queries
through batched BM25 in one distributed job (``bm25_multi_topk``, new:
tf/df computed once over the union query vocabulary, fanned out to
queries by a broadcast term join, per-query top-k via the salted
``topk_per_key``) -> score retrieval as the reciprocal rank of the
first chunk belonging to the query's source document.

Queries are deterministic: every 25th document contributes its tokens
4..8 as a 5-term query; the relevant set is that document's own
chunks. On the word-soup fixture the query terms are common vocabulary
— BM25 ranks by tf/length, MRR lands well below 1.0, and the oracle
agrees on the exact per-query rank: the metric machinery is what is
differentially pinned, on honestly-hard queries.

Integer-exact output: reciprocal ranks in micro-units
(1e6 div rank), 0 for misses — no float division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.curation import chunk_documents
from ..operators.textindex import bm25_multi_topk
from ..sources.parquet import load_tables
from .catalog import QueryDef

_K1 = 1.2
_B = 0.75
_K1P1 = _K1 + 1.0
_CHUNK = 40
_STRIDE = 20
_TOPK = 10


def q163_rag_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    chunks = chunk_documents(
        docs, chunk_tokens=_CHUNK, stride=_STRIDE
    ).select(
        (F.col("doc_id") * 1000 + F.col("chunk_idx")).alias("doc_id"),
        F.col("chunk_text").alias("text"),
    )
    toks = F.split(F.trim(F.col("text")), r"\s+")
    queries = (
        docs.where(F.col("doc_id") % 25 == 0)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.slice(toks, 4, 5)).alias("term"),
        )
    )
    top = bm25_multi_topk(
        chunks, queries, k=_TOPK, k1=_K1, b=_B
    )
    hit_rank = F.min(
        F.when(F.expr("doc_id div 1000") == F.col("query_id"), F.col("rk"))
    )
    return (
        top.groupBy("query_id")
        .agg(hit_rank.cast("long").alias("hit_rank"))
        .select(
            "query_id",
            "hit_rank",
            F.coalesce(
                F.expr("1000000 div hit_rank"), F.lit(0)
            ).cast("long").alias("rr_micro"),
        )
    )


ORACLE_Q163 = f"""
WITH base AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents),
chunks AS (
  SELECT doc_id * 1000 + s.i AS doc_id,
         array_to_string(list_slice(toks, s.start + 1,
                                    s.start + {_CHUNK}), ' ') AS text
  FROM base,
       LATERAL (
         SELECT UNNEST(generate_series(0, greatest(len(toks) - 1, 0),
                                       {_STRIDE})) AS start,
                UNNEST(generate_series(0,
                  greatest(len(toks) - 1, 0) // {_STRIDE})) AS i
       ) s),
tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                            t -> t != '')) AS token
  FROM chunks),
queries AS (
  SELECT DISTINCT doc_id AS query_id, unnest(toks[4:8]) AS token
  FROM base WHERE doc_id % 25 = 0),
vocab AS (SELECT DISTINCT token FROM queries),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
hits AS (SELECT tok.* FROM tok JOIN vocab USING (token)),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM hits GROUP BY 1, 2),
df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM hits GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM chunks),
ad AS (SELECT CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
       FROM dl),
scored AS (
  SELECT q.query_id, tf.doc_id,
         CAST(SUM(CAST(round(
           ln((n.n_docs - df.df + CAST(0.5 AS DOUBLE))
              / (df.df + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE))
           * ((tf.tf * CAST({_K1P1!r} AS DOUBLE))
              / (tf.tf + CAST({_K1!r} AS DOUBLE)
                 * (CAST(1.0 AS DOUBLE) - CAST({_B!r} AS DOUBLE)
                    + CAST({_B!r} AS DOUBLE) * dl.dl / ad.avgdl)))
           * CAST(1000000.0 AS DOUBLE)
         ) AS BIGINT)) AS BIGINT) AS score_micro
  FROM tf
  JOIN df ON tf.token = df.token
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN queries q ON tf.token = q.token
  CROSS JOIN n CROSS JOIN ad
  GROUP BY q.query_id, tf.doc_id),
ranked AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_micro DESC, doc_id ASC) AS rk
  FROM scored),
top AS (SELECT * FROM ranked WHERE rk <= {_TOPK})
SELECT query_id,
  CAST(MIN(CASE WHEN doc_id // 1000 = query_id THEN rk END) AS BIGINT)
    AS hit_rank,
  CAST(COALESCE(1000000 // MIN(CASE WHEN doc_id // 1000 = query_id
                                    THEN rk END), 0) AS BIGINT)
    AS rr_micro
FROM top GROUP BY query_id
"""


# ---------------------------------------------------------------------------
# q164: item-to-item co-occurrence recommendations
# ---------------------------------------------------------------------------


def q164_item2item(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic item-to-item collaborative filtering (Linden et al.
    2003, the Amazon recommender): for each of the 5 highest-degree
    parts, the top-5 co-purchased parts by shared-order count — the
    skew-capped co-occurrence edge build (q117 machinery) re-read as a
    recommendation table, cut per item with the salted top-k."""
    from ..operators.graph import cooccurrence_edges
    from ..operators.ranking import topk_per_key
    from .catalog_batch18 import MAX_CONTAINER

    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    edges = cooccurrence_edges(
        li, "l_orderkey", "l_partkey", max_container_size=MAX_CONTAINER,
        count_pairs=True,
    )
    sym = edges.select(
        F.col("src").alias("item"), F.col("dst").alias("rec"), "n_shared"
    ).unionAll(
        edges.select(
            F.col("dst").alias("item"), F.col("src").alias("rec"),
            "n_shared",
        )
    )
    deg = (
        sym.groupBy("item")
        .agg(F.count("*").alias("_deg"))
        .orderBy(F.desc("_deg"), F.asc("item"))
        .limit(5)
        .select("item")
    )
    cand = sym.join(F.broadcast(deg), on="item")
    out = topk_per_key(
        cand,
        ["item"],
        [F.desc("n_shared"), F.asc("rec")],
        k=5,
    )
    return out.select(
        "item", "rec", F.col("n_shared").cast("long").alias("n_shared"),
        F.col("rk").cast("long").alias("rk"),
    )


def _oracle_q164() -> str:
    from .catalog_batch18 import _EDGES_SQL

    # the shared _EDGES_SQL dedups pairs; rebuild with pair counts
    return f"""
WITH {_EDGES_SQL},
wedges AS (
  SELECT a.item AS src, b.item AS dst, COUNT(*) AS n_shared
  FROM citems a
  JOIN citems b ON a.c = b.c AND a.item < b.item
  JOIN cok ON a.c = cok.c
  GROUP BY 1, 2),
sym AS (
  SELECT src AS item, dst AS rec, n_shared FROM wedges
  UNION ALL
  SELECT dst AS item, src AS rec, n_shared FROM wedges),
deg AS (
  SELECT item FROM sym GROUP BY item
  ORDER BY COUNT(*) DESC, item ASC LIMIT 5),
ranked AS (
  SELECT s.item, s.rec, s.n_shared,
         row_number() OVER (PARTITION BY s.item
                            ORDER BY s.n_shared DESC, s.rec ASC) AS rk
  FROM sym s JOIN deg USING (item))
SELECT item, rec, CAST(n_shared AS BIGINT) AS n_shared,
       CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= 5
"""


# ---------------------------------------------------------------------------
# q165: last-touch conversion attribution report
# ---------------------------------------------------------------------------

_ATTR_WINDOW_SEC = 1800  # last-touch lookback: 30 minutes


def q165_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the most recent
    strictly-prior click by the same user IF it happened within 30
    minutes (q82's single-shuffle as-of match + the latency cutoff and
    daily report that make it an attribution pipeline). All latency
    math in integer epoch seconds."""
    from ..operators.temporal import asof_join

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts"
    )
    matched = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=[], strict=True,
    )
    lat = F.expr(
        "(unix_micros(ts) - unix_micros(asof_ts)) div 1000000"
    )
    attributed = F.col("asof_ts").isNotNull() & (
        lat <= _ATTR_WINDOW_SEC
    )
    return (
        matched.withColumn("_lat", lat)
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.count("*").cast("long").alias("n_purchases"),
            F.sum(attributed.cast("long")).cast("long").alias("n_attributed"),
            F.sum(F.when(attributed, F.col("_lat")))
            .cast("long")
            .alias("total_latency_sec"),
            F.max(F.when(attributed, F.col("_lat")))
            .cast("long")
            .alias("max_latency_sec"),
        )
    )


ORACLE_Q165 = f"""
WITH p AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'purchase'),
c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
m AS (
  SELECT p.event_id, p.user_id, p.ts, c.ts AS asof_ts
  FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts > c.ts),
lat AS (
  SELECT ts,
         (epoch_us(ts) - epoch_us(asof_ts)) // 1000000 AS l,
         asof_ts IS NOT NULL
           AND (epoch_us(ts) - epoch_us(asof_ts)) // 1000000
               <= {_ATTR_WINDOW_SEC} AS attributed
  FROM m)
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
  CAST(COUNT(*) AS BIGINT) AS n_purchases,
  CAST(SUM(CASE WHEN attributed THEN 1 ELSE 0 END) AS BIGINT)
    AS n_attributed,
  CAST(SUM(CASE WHEN attributed THEN l END) AS BIGINT)
    AS total_latency_sec,
  CAST(MAX(CASE WHEN attributed THEN l END) AS BIGINT)
    AS max_latency_sec
FROM lat GROUP BY 1
"""




# ---------------------------------------------------------------------------
# q166: k-anonymity / l-diversity audit
# ---------------------------------------------------------------------------

_K_ANON = 5


def q166_kanonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-governance audit (Sweeney 2002; Machanavajjhala 2007):
    treat (c_nationkey, c_mktsegment) as the quasi-identifier and
    c_acctbal's sign bucket as the sensitive attribute. Reports, per
    equivalence class: its size, whether it violates k=5 anonymity,
    and its l-diversity (distinct sensitive values) — the table a
    release-review actually needs, one groupBy, exact counts. Pairs
    with the PII-redaction operator (q94): redact direct identifiers,
    then verify the quasi-identifiers can't re-identify either."""
    cust = load_tables(spark, sf_dir, ["customer"])["customer"]
    sensitive = F.when(F.col("c_acctbal") < 0, F.lit("negative")).otherwise(
        F.lit("nonnegative")
    )
    return (
        cust.select("c_nationkey", "c_mktsegment", sensitive.alias("_s"))
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("class_size"),
            (F.count("*") < _K_ANON).alias("violates_k"),
            F.count_distinct("_s").cast("long").alias("l_diversity"),
        )
    )


ORACLE_Q166 = f"""
SELECT c_nationkey, c_mktsegment,
  CAST(COUNT(*) AS BIGINT) AS class_size,
  COUNT(*) < {_K_ANON} AS violates_k,
  CAST(COUNT(DISTINCT CASE WHEN c_acctbal < 0 THEN 'negative'
                           ELSE 'nonnegative' END) AS BIGINT)
    AS l_diversity
FROM customer GROUP BY c_nationkey, c_mktsegment
"""




# ---------------------------------------------------------------------------
# q167: multi-touch (linear-credit) attribution
# ---------------------------------------------------------------------------


def q167_multitouch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every click in the 30 minutes
    before a purchase shares the conversion credit equally (credit in
    integer micro-units, 1e6 div n_touches per click — deterministic,
    no float division). The keyed bucketed interval join
    (``temporal.interval_join`` with ``key_cols``) generates candidates
    per (user, 30-minute bucket), so a busy global bucket never crosses
    users. Complements q165's last-touch report."""
    from ..operators.temporal import interval_join

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id"),
        "user_id",
        F.date_trunc("day", F.col("ts")).alias("day"),
        (F.col("ts") - F.expr("INTERVAL 30 MINUTES")).alias("w_start"),
        F.col("ts").alias("w_end"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts"
    )
    matched = interval_join(
        clicks, purchases, point_ts="ts", start_col="w_start",
        end_col="w_end", granularity_s=1800, key_cols=["user_id"],
    )
    per_purchase = matched.groupBy("event_id", "day").agg(
        F.count("*").alias("n_touches")
    )
    credit = F.col("n_touches") * F.expr("1000000 div n_touches")
    return per_purchase.groupBy("day").agg(
        F.count("*").cast("long").alias("n_touched"),
        F.sum("n_touches").cast("long").alias("total_touches"),
        F.sum(credit).cast("long").alias("total_credit_micro"),
    )


ORACLE_Q167 = """
WITH p AS (
  SELECT event_id, user_id, ts,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
  FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
m AS (
  SELECT p.event_id, p.day, COUNT(*) AS n_touches
  FROM p JOIN c ON p.user_id = c.user_id
    AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts < p.ts
  GROUP BY 1, 2)
SELECT day,
  CAST(COUNT(*) AS BIGINT) AS n_touched,
  CAST(SUM(n_touches) AS BIGINT) AS total_touches,
  CAST(SUM(n_touches * (1000000 // n_touches)) AS BIGINT)
    AS total_credit_micro
FROM m GROUP BY day
"""




# ---------------------------------------------------------------------------
# q168: spatial radius self-join (grid-bucketed)
# ---------------------------------------------------------------------------

_R = 50
_GRID = 1000


def q168_radius_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pairs of error events within Euclidean distance 50 on a
    synthetic integer 1000x1000 plane (md5-derived coordinates — the
    derivation is part of the query and mirrored in the oracle). The
    grid-cell candidate join (``operators/spatial.py``) makes this the
    spatial member of the bucketed-candidate family: cost tracks
    points-per-cell density, never |points|^2."""
    from ..operators.dedup import hash_bucket
    from ..operators.spatial import radius_pairs

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    pts = ev.where(
        (F.col("event_type") == "error") & (F.col("event_id") < 4000)
    ).select(
        "event_id",
        hash_bucket(F.col("event_id").cast("string"), _GRID).alias("x"),
        hash_bucket(
            F.concat(F.lit("y:"), F.col("event_id").cast("string")), _GRID
        ).alias("y"),
    )
    return radius_pairs(pts, "x", "y", "event_id", radius=_R)


ORACLE_Q168 = f"""
WITH pts AS (
  SELECT event_id,
    ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
      % {_GRID} AS x,
    ('0x' || substr(md5('y:' || CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
      % {_GRID} AS y
  FROM events WHERE event_type = 'error' AND event_id < 4000)
SELECT a.event_id AS id_a, b.event_id AS id_b,
  CAST((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS BIGINT)
    AS dist_sq
FROM pts a JOIN pts b ON a.event_id < b.event_id
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
      <= {_R * _R}
"""




# ---------------------------------------------------------------------------
# q169: entity resolution -> golden record (composition)
# ---------------------------------------------------------------------------


def q169_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MDM golden-record pipeline end-to-end: fuzzy-match records
    (q-gram-filtered Levenshtein join), cluster matches (connected
    components), elect the minimum id per cluster as the golden
    record. Record identities are synthesized DISTINCT (segment +
    md5-prefix — two random prefixes are never within edit distance 2)
    and every third record gets a one-character-typo clone, so the
    ONLY links are the planted duplicates and the expected output is
    exactly one 2-record cluster per clone; TPC-H's sequential names
    would otherwise chain the whole table into one component."""
    from ..operators.components import connected_components
    from ..operators.linkage import edit_distance_pairs

    cust = load_tables(spark, sf_dir, ["customer"])["customer"]
    sub = cust.where(F.col("c_custkey") <= 200)
    base = sub.select(
        F.col("c_custkey").cast("long").alias("rid"),
        F.concat(
            F.col("c_mktsegment"), F.lit("#"),
            F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 8),
        ).alias("name"),
    )
    clones = sub.where(F.col("c_custkey") % 3 == 0).select(
        (F.col("c_custkey") + 100000).cast("long").alias("rid"),
        F.concat(
            F.col("c_mktsegment"), F.lit("#"),
            F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 7),
            F.lit("z"),
        ).alias("name"),
    )
    recs = base.unionByName(clones)
    pairs = edit_distance_pairs(
        recs, id_col="rid", text_col="name", max_dist=2
    )
    labels = connected_components(pairs)
    return (
        labels.groupBy("component")
        .agg(
            F.count("*").cast("long").alias("cluster_size"),
            F.min("id").alias("golden_id"),
            F.max("id").alias("max_id"),
        )
        .select(
            F.col("component").cast("long").alias("component"),
            "cluster_size",
            F.col("golden_id").cast("long").alias("golden_id"),
            F.col("max_id").cast("long").alias("max_id"),
        )
    )


ORACLE_Q169 = """
WITH RECURSIVE recs AS (
  SELECT CAST(c_custkey AS BIGINT) AS rid,
         c_mktsegment || '#'
           || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8) AS name
  FROM customer WHERE c_custkey <= 200
  UNION ALL
  SELECT CAST(c_custkey + 100000 AS BIGINT) AS rid,
         c_mktsegment || '#'
           || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 7) || 'z' AS name
  FROM customer WHERE c_custkey <= 200 AND c_custkey % 3 = 0),
pairs AS (
  SELECT a.rid AS id_a, b.rid AS id_b
  FROM recs a JOIN recs b ON a.rid < b.rid
  WHERE levenshtein(a.name, b.name) <= 2),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs),
reach(id, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
labels AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
SELECT CAST(component AS BIGINT) AS component,
       CAST(COUNT(*) AS BIGINT) AS cluster_size,
       CAST(MIN(id) AS BIGINT) AS golden_id,
       CAST(MAX(id) AS BIGINT) AS max_id
FROM labels GROUP BY component
"""




# ---------------------------------------------------------------------------
# q170: per-source score calibration (robust z-normalization)
# ---------------------------------------------------------------------------


def q170_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source score calibration: a quality score (here doc
    length) is only comparable across sources after per-source
    normalization — compute each source's median and IQR (exact
    percentiles, q100's machinery) and keep documents whose robust
    z-score |(s - p50) / IQR| <= 1.5 under ONE global threshold. The
    comparison runs on unrounded doubles (identical IEEE inputs both
    engines); only the reported stats are rounded."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    scored = docs.select("doc_id", "source", F.col("n_chars").alias("s"))
    stats = scored.groupBy("source").agg(
        F.percentile("s", 0.25).alias("_p25"),
        F.percentile("s", 0.5).alias("_p50"),
        F.percentile("s", 0.75).alias("_p75"),
    )
    joined = scored.join(F.broadcast(stats), on="source")
    z = (F.col("s") - F.col("_p50")) / (F.col("_p75") - F.col("_p25"))
    keep = F.abs(z) <= 1.5
    return (
        joined.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(keep.cast("long")).cast("long").alias("n_kept"),
            F.round(F.first("_p50"), 6).alias("p50"),
            F.round(F.first("_p75") - F.first("_p25"), 6).alias("iqr"),
        )
    )


ORACLE_Q170 = """
WITH scored AS (
  SELECT doc_id, source, n_chars AS s FROM documents),
stats AS (
  SELECT source,
         quantile_cont(s, 0.25) AS p25,
         quantile_cont(s, 0.5) AS p50,
         quantile_cont(s, 0.75) AS p75
  FROM scored GROUP BY source)
SELECT sc.source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN abs((sc.s - st.p50) / (st.p75 - st.p25)) <= 1.5
                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  round(any_value(st.p50), 6) AS p50,
  round(any_value(st.p75) - any_value(st.p25), 6) AS iqr
FROM scored sc JOIN stats st USING (source)
GROUP BY sc.source
"""




# ---------------------------------------------------------------------------
# q171: bounded-depth graph reachability (n-hop neighborhood)
# ---------------------------------------------------------------------------

_HOPS_SEEDS = 5


def q171_two_hop_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop neighborhoods in the co-purchase graph: for the 5
    lowest-id parts, every part reachable within 2 edges and its
    minimal hop distance. Bounded-depth BFS as TWO self-equi-joins on
    the symmetric edge list (never a recursive loop, never a cartesian)
    — the 'related items, friends-of-friends' query shape. Distances
    are exact minima: hop-1 wins over hop-2 via groupBy min."""
    from ..operators.graph import cooccurrence_edges
    from .catalog_batch18 import MAX_CONTAINER

    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    e = cooccurrence_edges(
        li, "l_orderkey", "l_partkey", max_container_size=MAX_CONTAINER
    ).localCheckpoint(eager=False)
    sym = e.unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    seeds = (
        sym.select(F.col("src").alias("seed"))
        .distinct()
        .orderBy("seed")
        .limit(_HOPS_SEEDS)
    )
    hop1 = (
        seeds.join(sym, seeds["seed"] == sym["src"])
        .select("seed", F.col("dst").alias("node"))
        .distinct()
    )
    hop2 = (
        hop1.join(
            sym.select(
                F.col("src").alias("node"), F.col("dst").alias("node2")
            ),
            on="node",
        )
        .select("seed", F.col("node2").alias("node"))
        .where(F.col("node") != F.col("seed"))
        .distinct()
    )
    reach = hop1.select(
        "seed", "node", F.lit(1).alias("hops")
    ).unionAll(hop2.select("seed", "node", F.lit(2).alias("hops")))
    return (
        reach.groupBy("seed", "node")
        .agg(F.min("hops").cast("long").alias("hops"))
    )


def _oracle_q171() -> str:
    from .catalog_batch18 import _EDGES_SQL

    return f"""
WITH {_EDGES_SQL},
sym AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
seeds AS (
  SELECT DISTINCT src AS seed FROM sym ORDER BY seed LIMIT {_HOPS_SEEDS}),
hop1 AS (
  SELECT DISTINCT s.seed, e.dst AS node
  FROM seeds s JOIN sym e ON s.seed = e.src),
hop2 AS (
  SELECT DISTINCT h.seed, e.dst AS node
  FROM hop1 h JOIN sym e ON h.node = e.src
  WHERE e.dst <> h.seed),
reach AS (
  SELECT seed, node, 1 AS hops FROM hop1
  UNION ALL
  SELECT seed, node, 2 AS hops FROM hop2)
SELECT seed, node, CAST(MIN(hops) AS BIGINT) AS hops
FROM reach GROUP BY seed, node
"""


# ---------------------------------------------------------------------------
# q172: top-k WITH TIES (rank-cut semantics)
# ---------------------------------------------------------------------------


def q172_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2008 FETCH FIRST k ROWS WITH TIES: the top-5 order
    priorities of each segment by order count, where rank (not
    row_number) does the cut — tied groups all survive, so the result
    is a deterministic SET with no arbitrary tiebreak, the semantics
    reports actually want. Partitioned rank window; plan-hygiene
    clean."""
    from pyspark.sql import Window

    cust = load_tables(spark, sf_dir, ["customer", "orders"])
    joined = cust["orders"].join(
        F.broadcast(cust["customer"].select("c_custkey", "c_mktsegment")),
        cust["orders"]["o_custkey"] == F.col("c_custkey"),
    )
    counts = joined.groupBy("c_mktsegment", "o_orderpriority").agg(
        F.count("*").alias("n_orders")
    )
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("n_orders"))
    return (
        counts.withColumn("rk", F.rank().over(w).cast("long"))
        .where(F.col("rk") <= 3)
        .select(
            "c_mktsegment", "o_orderpriority",
            F.col("n_orders").cast("long").alias("n_orders"), "rk",
        )
    )


ORACLE_Q172 = """
WITH counts AS (
  SELECT c.c_mktsegment, o.o_orderpriority, COUNT(*) AS n_orders
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2),
ranked AS (
  SELECT c_mktsegment, o_orderpriority, n_orders,
    CAST(rank() OVER (PARTITION BY c_mktsegment
                      ORDER BY n_orders DESC) AS BIGINT) AS rk
  FROM counts)
SELECT c_mktsegment, o_orderpriority,
       CAST(n_orders AS BIGINT) AS n_orders, rk
FROM ranked WHERE rk <= 3
"""




# ---------------------------------------------------------------------------
# q173: sequence-gap detection (data-quality audit)
# ---------------------------------------------------------------------------


def q173_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gap audit: which event_ids inside the observed
    [min, max] range are MISSING, reported as contiguous gap islands
    (gap_start, gap_end, gap_len). The expected-id side is a generated
    range (metadata-scale per partition), missing ids come from an
    anti-join, and islands merge via the id-minus-rank trick on a
    range-partitioned row number — no unpartitioned window: islands
    are keyed by the (id - global_row_number) constant, which the
    window-free ``global_row_number`` machinery supplies."""
    from ..operators.ranking import global_row_number

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    # sample a sparse id set so gaps exist: keep ids not divisible by 7
    present = ev.select(F.col("event_id").alias("id")).where(
        F.col("event_id") % 7 != 0
    ).distinct()
    bounds = present.agg(
        F.min("id").alias("lo"), F.max("id").alias("hi")
    )
    expected = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("id")
    )
    missing = expected.join(present, on="id", how="left_anti")
    idx = global_row_number(missing, ["id"], idx_col="rn")
    return (
        idx.withColumn("island", F.col("id") - F.col("rn"))
        .groupBy("island")
        .agg(
            F.min("id").cast("long").alias("gap_start"),
            F.max("id").cast("long").alias("gap_end"),
            F.count("*").cast("long").alias("gap_len"),
        )
        .select("gap_start", "gap_end", "gap_len")
    )


ORACLE_Q173 = """
WITH present AS (
  SELECT DISTINCT event_id AS id FROM events WHERE event_id % 7 <> 0),
bounds AS (SELECT MIN(id) AS lo, MAX(id) AS hi FROM present),
expected AS (
  SELECT unnest(generate_series(lo, hi)) AS id FROM bounds),
missing AS (
  SELECT e.id FROM expected e LEFT JOIN present p ON e.id = p.id
  WHERE p.id IS NULL),
islands AS (
  SELECT id, id - row_number() OVER (ORDER BY id) AS island
  FROM missing)
SELECT CAST(MIN(id) AS BIGINT) AS gap_start,
       CAST(MAX(id) AS BIGINT) AS gap_end,
       CAST(COUNT(*) AS BIGINT) AS gap_len
FROM islands GROUP BY island
"""


# ---------------------------------------------------------------------------
# q174: unpivot / melt (long-format reshape)
# ---------------------------------------------------------------------------


def q174_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide -> long reshape (the inverse of q71's pivot): lineitem's
    four measure columns melt into (measure, value) rows via the
    ``stack`` expression — one scan, a 4x row expansion executor-side,
    no shuffle until the summary aggregate. Values align on
    DECIMAL(15,4) so the four measures share one exact type."""
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    melted = li.where(F.col("l_orderkey") <= 200).select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(4, 'quantity', CAST(l_quantity AS DECIMAL(15,4)), "
            "'extendedprice', CAST(l_extendedprice AS DECIMAL(15,4)), "
            "'discount', CAST(l_discount AS DECIMAL(15,4)), "
            "'tax', CAST(l_tax AS DECIMAL(15,4))) AS (measure, value)"
        ),
    )
    return melted.groupBy("measure").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("value").cast("double").alias("total"),
        F.min("value").cast("double").alias("vmin"),
        F.max("value").cast("double").alias("vmax"),
    )


ORACLE_Q174 = """
WITH melted AS (
  SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
         CAST(l_quantity AS DECIMAL(15,4)) AS value
  FROM lineitem WHERE l_orderkey <= 200
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'extendedprice',
         CAST(l_extendedprice AS DECIMAL(15,4))
  FROM lineitem WHERE l_orderkey <= 200
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'discount',
         CAST(l_discount AS DECIMAL(15,4))
  FROM lineitem WHERE l_orderkey <= 200
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'tax',
         CAST(l_tax AS DECIMAL(15,4))
  FROM lineitem WHERE l_orderkey <= 200)
SELECT measure, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(value) AS DOUBLE) AS total,
       CAST(MIN(value) AS DOUBLE) AS vmin,
       CAST(MAX(value) AS DOUBLE) AS vmax
FROM melted GROUP BY measure
"""


def batch26_registry() -> list[QueryDef]:
    return [
        QueryDef("q163_rag_retrieval_eval", q163_rag_retrieval_eval,
                 ORACLE_Q163,
                 "chunk -> batched BM25 -> MRR: end-to-end RAG eval"),
        QueryDef("q164_item2item", q164_item2item, _oracle_q164(),
                 "item-to-item co-occurrence recommendations"),
        QueryDef("q165_attribution", q165_attribution, ORACLE_Q165,
                 "last-touch conversion attribution (as-of + cutoff)"),
        QueryDef("q166_kanonymity", q166_kanonymity, ORACLE_Q166,
                 "k-anonymity / l-diversity release audit"),
        QueryDef("q167_multitouch", q167_multitouch, ORACLE_Q167,
                 "linear multi-touch attribution (keyed interval join)"),
        QueryDef("q168_radius_pairs", q168_radius_pairs, ORACLE_Q168,
                 "spatial radius self-join via grid-cell candidates"),
        QueryDef("q169_entity_resolution", q169_entity_resolution,
                 ORACLE_Q169,
                 "fuzzy match -> components -> golden record (MDM)"),
        QueryDef("q170_score_calibration", q170_score_calibration,
                 ORACLE_Q170,
                 "per-source robust z-calibration (exact percentiles)"),
        QueryDef("q171_two_hop_neighborhood", q171_two_hop_neighborhood,
                 _oracle_q171(),
                 "bounded-depth BFS: 2-hop co-purchase neighborhoods"),
        QueryDef("q172_topk_with_ties", q172_topk_with_ties, ORACLE_Q172,
                 "FETCH FIRST WITH TIES via rank-cut windows"),
        QueryDef("q173_sequence_gaps", q173_sequence_gaps, ORACLE_Q173,
                 "sequence-gap islands (anti-join + window-free ranks)"),
        QueryDef("q174_unpivot", q174_unpivot, ORACLE_Q174,
                 "wide -> long unpivot via stack (inverse of pivot)"),
    ]
