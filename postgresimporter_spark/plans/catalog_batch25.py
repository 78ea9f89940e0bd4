"""Batch 25: deterministic mergeable sketches, differentially tested.

Probabilistic sketches are usually checked only by error bound (the
HLL/t-digest tests in ``test_approx.py``). These two are built from
md5-derived hashes, so the SKETCH ITSELF is deterministic and the
DuckDB oracle replays it cell-for-cell — the estimate, not just its
error, is pinned:

- q160: count-min sketch (Cormode & Muthukrishnan 2005) — a d x w
  integer cell grid over the corpus token stream; heavy-hitter
  estimates = min over rows. CMS guarantees est >= exact; the query
  reports both plus the overestimate, for the exact top-10 tokens.
- q161: KMV / bottom-k distinct sketch (Bar-Yossef et al. 2002) —
  per-source distinct-shingle estimates from the k-th smallest hash:
  est = (k-1) * M div h_k over the 60-bit md5 space, with the exact
  count as the standard fallback when a group has fewer than k
  distinct values.

Scale shape: the CMS grid is d*w cells (here 4x256 = 1024 rows) built
by ONE map-side-combining aggregate over the exploded token stream —
the mergeable-summary pattern: cells from different partitions/days
add. KMV is a per-group bottom-k (salted-capable ``topk_per_key``
shape); its state per group is k longs, the sketch that unions by
taking the k smallest of the union. All arithmetic integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import hash_bucket, shingles
from ..operators.ranking import topk_per_key
from ..operators.textstats import tokens
from ..sources.parquet import load_tables
from .catalog import QueryDef

# ---------------------------------------------------------------------------
# q160: count-min sketch heavy hitters
# ---------------------------------------------------------------------------

_CMS_DEPTH = 4
_CMS_WIDTH = 256


def q160_countmin_heavy_hitters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact top-10 corpus tokens with their count-min estimates: the
    grid is one aggregate over the token stream; probing joins the
    (row, bucket) cells (a 1024-row broadcast) and takes the min."""
    from ..streaming.pipeline import stream_countmin

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    tok = docs.select(F.explode(tokens(F.col("text"))).alias("token"))

    # the grid is the SAME operator the streaming tier maintains
    # (stream_countmin works identically on a batch DataFrame) — one
    # cell layout, maintained in one place, so the stream==batch test
    # and this oracle pin the same bytes
    cells = stream_countmin(
        docs.select("text"), depth=_CMS_DEPTH, width=_CMS_WIDTH
    )

    top = (
        tok.groupBy("token")
        .agg(F.count("*").cast("long").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("token"))
        .limit(10)
    )
    probes = top.select(
        "token",
        "exact_cnt",
        F.explode(F.array(*[F.lit(r) for r in range(_CMS_DEPTH)])).alias(
            "r"
        ),
    ).select(
        "token",
        "exact_cnt",
        "r",
        hash_bucket(
            F.concat(F.col("r").cast("string"), F.lit(":"), F.col("token")),
            _CMS_WIDTH,
        ).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(cells), on=["r", "bucket"])
        .groupBy("token", "exact_cnt")
        .agg(F.min("cell_cnt").cast("long").alias("cms_est"))
        .withColumn(
            "overestimate", (F.col("cms_est") - F.col("exact_cnt")).cast("long")
        )
    )


_CMS_BUCKET = (
    "('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || token), 1, 15))"
    f"::BIGINT % {_CMS_WIDTH}"
)

ORACLE_Q160 = f"""
WITH tok AS (
  SELECT unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                x -> x <> '')) AS token
  FROM documents),
keyed AS (
  SELECT token, r, {_CMS_BUCKET} AS bucket
  FROM tok, UNNEST(generate_series(0, {_CMS_DEPTH - 1})) AS g(r)),
cells AS (
  SELECT r, bucket, CAST(COUNT(*) AS BIGINT) AS cell_cnt
  FROM keyed GROUP BY r, bucket),
top AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_cnt
  FROM tok GROUP BY token
  ORDER BY exact_cnt DESC, token ASC LIMIT 10),
probes AS (
  SELECT token, exact_cnt, r, {_CMS_BUCKET} AS bucket
  FROM top, UNNEST(generate_series(0, {_CMS_DEPTH - 1})) AS g(r))
SELECT p.token, p.exact_cnt,
  CAST(MIN(c.cell_cnt) AS BIGINT) AS cms_est,
  CAST(MIN(c.cell_cnt) - p.exact_cnt AS BIGINT) AS overestimate
FROM probes p JOIN cells c ON p.r = c.r AND p.bucket = c.bucket
GROUP BY p.token, p.exact_cnt
"""


# ---------------------------------------------------------------------------
# q161: KMV distinct estimation per source
# ---------------------------------------------------------------------------

_KMV_K = 32
_KMV_M = 1 << 60  # md5-15-hex space


def q161_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct-shingle estimates from the k-th smallest
    60-bit hash: est = (k-1)*M div h_k, exact-count fallback for
    groups under k distinct values; reports exact, estimate, and the
    absolute error in percent (integer basis)."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    sh = docs.select(
        "source", F.explode(shingles(F.col("text"), 3)).alias("sh")
    ).distinct()
    hashed = sh.select(
        "source",
        F.conv(F.substring(F.md5("sh"), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    )
    exact = hashed.groupBy("source").agg(
        F.count("*").cast("long").alias("exact_distinct")
    )
    kth = (
        topk_per_key(hashed, ["source"], [F.col("h")], k=_KMV_K)
        .where(F.col("rk") == _KMV_K)
        .select("source", F.col("h").alias("h_k"))
    )
    # (k-1)*M exceeds int64: widen the product to DECIMAL(38,0); the
    # quotient is <= M (h_k >= k-1 in a 60-bit distinct-hash space), so
    # the integral divide's long result cannot wrap
    est = F.when(
        F.col("h_k").isNotNull(),
        F.expr(
            f"CAST({_KMV_K - 1} AS DECIMAL(38,0)) * {_KMV_M} div h_k"
        ),
    ).otherwise(F.col("exact_distinct"))
    return (
        exact.join(kth, on="source", how="left")
        .withColumn("kmv_est", est.cast("long"))
        .withColumn(
            "err_pct",
            F.expr(
                "abs(kmv_est - exact_distinct) * 100 div exact_distinct"
            ).cast("long"),
        )
        .select("source", "exact_distinct", "kmv_est", "err_pct")
    )


ORACLE_Q161 = f"""
WITH sh AS (
  SELECT DISTINCT source,
    unnest(list_distinct(list_transform(
      generate_series(0, greatest(len(string_split_regex(trim(text),
        '\\s+')) - 3, 0)),
      i -> array_to_string(list_slice(string_split_regex(trim(text),
        '\\s+'), i + 1, i + 3), ' ')))) AS s
  FROM documents),
hashed AS (
  SELECT source,
    ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
  FROM sh),
exact AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS exact_distinct
  FROM hashed GROUP BY source),
ranked AS (
  SELECT source, h,
    row_number() OVER (PARTITION BY source ORDER BY h) AS rk
  FROM hashed),
kth AS (SELECT source, h AS h_k FROM ranked WHERE rk = {_KMV_K})
SELECT e.source, e.exact_distinct,
  CAST(CASE WHEN k.h_k IS NOT NULL
            THEN ({_KMV_K - 1}::HUGEINT * {_KMV_M}) // k.h_k
            ELSE e.exact_distinct END AS BIGINT) AS kmv_est,
  CAST(abs(CAST(CASE WHEN k.h_k IS NOT NULL
                THEN ({_KMV_K - 1}::HUGEINT * {_KMV_M}) // k.h_k
                ELSE e.exact_distinct END AS BIGINT) - e.exact_distinct)
       * 100 // e.exact_distinct AS BIGINT) AS err_pct
FROM exact e LEFT JOIN kth k ON e.source = k.source
"""


# ---------------------------------------------------------------------------
# q162: label-propagation communities
# ---------------------------------------------------------------------------


def q162_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 communities of the co-purchase graph after 3 synchronous
    label-propagation rounds — the deterministic majority-vote variant
    (ties to smallest label), oracle-unrolled like q119's PageRank."""
    from ..operators.graph import label_propagation
    from .catalog_batch18 import _edges

    labels = label_propagation(_edges(spark, sf_dir), iterations=3)
    return (
        labels.groupBy("label")
        .agg(
            F.count("*").cast("long").alias("size"),
            F.min("node").alias("first_node"),
        )
        .select(F.col("label").alias("community"), "size", "first_node")
        .orderBy(F.desc("size"), F.asc("community"))
        .limit(10)
    )


def _oracle_q162() -> str:
    from .catalog_batch18 import _EDGES_SQL

    # each round's votes = neighbor labels + the node's OWN label (the
    # self-vote that damps synchronous-LPA oscillation; mirrors
    # graph.label_propagation exactly)
    step = """
v{i} AS (
  SELECT node, label, COUNT(*) AS cnt FROM (
    SELECT s.dst AS node, l.label
    FROM sym s JOIN l{p} l ON s.src = l.node
    UNION ALL
    SELECT node, label FROM l{p}
  ) GROUP BY node, label),
l{i} AS (
  SELECT node, label FROM (
    SELECT node, label,
      row_number() OVER (PARTITION BY node
                         ORDER BY cnt DESC, label ASC) AS rk
    FROM v{i}) WHERE rk = 1)"""
    rounds = ",".join(step.format(i=i, p=i - 1) for i in range(1, 4))
    return f"""
WITH {_EDGES_SQL},
sym AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
l0 AS (SELECT DISTINCT src AS node, CAST(src AS BIGINT) AS label FROM sym),
{rounds}
SELECT label AS community, CAST(COUNT(*) AS BIGINT) AS size,
       MIN(node) AS first_node
FROM l3 GROUP BY label
ORDER BY size DESC, community ASC LIMIT 10
"""


def batch25_registry() -> list[QueryDef]:
    return [
        QueryDef("q160_countmin_heavy_hitters", q160_countmin_heavy_hitters,
                 ORACLE_Q160,
                 "count-min sketch heavy hitters (deterministic grid)"),
        QueryDef("q161_kmv_distinct", q161_kmv_distinct, ORACLE_Q161,
                 "KMV bottom-k distinct estimation per source"),
        QueryDef("q162_label_propagation", q162_label_propagation,
                 _oracle_q162(),
                 "label-propagation communities (synchronous, 3 rounds)"),
    ]
