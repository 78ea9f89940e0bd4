"""Batch 27: portable sketches, provenance fingerprints, time-series
diagnostics, spell-linking, graph cores, and anti-entropy table sync.

Net-new engine surface (the reference — ``/root/reference/
postgresimporter/main.py`` — delegates all query work to Postgres):

- q175 oracle-checked HyperLogLog: register-level HLL whose state is
  md5-derived and whose accumulator is exact integer arithmetic, so a
  SQL engine replays the sketch bit-for-bit (``sketches.hll_portable``)
  — the differential-testing answer to "approximate sketches can't be
  oracle-checked".
- q176 winnowing (MOSS) fingerprint selection — the plagiarism /
  provenance sketch (``textstats.winnowing_fingerprints``).
- q177 CUSUM changepoint scan and q178 lag-k autocorrelation — both in
  exact scaled-integer arithmetic (``temporal.cusum_scaled`` /
  ``temporal.lag_autocorr``).
- q179 SymSpell deletion-neighborhood spell-linking — the third member
  of the lossless-filter string-join family (q-gram count filter q80,
  PPJoin prefix filter q158), with an EXACT candidate set from a
  linear variant equi-join (``linkage.deletion_neighborhood_pairs``).
- q180 fixed-round k-core decomposition (``graph.kcore``).
- q181 Merkle-style bucket fingerprint diff — the O(n_buckets)
  anti-entropy handshake for snapshot sync (``diffops.
  bucket_fingerprints`` / ``bucket_diff``).
- q182 reciprocal rank fusion of BM25 and dense cosine retrieval
  (Cormack, Clarke & Buettcher 2009) — the standard hybrid-retrieval
  combiner, in integer micro-units.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_tables
from .catalog import QueryDef

# ---------------------------------------------------------------------------
# q175: oracle-checked portable HyperLogLog
# ---------------------------------------------------------------------------


def q175_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct event_ids per event_type via the engine-replayable
    HLL (64 md5-derived registers, exact BIGINT accumulator), with
    the exact distinct count beside it — the sketch grades itself the
    same way q97 grades ANN recall. The register state is O(types x
    64) no matter the input size; the exact column is the part that
    wouldn't survive 100 TB, which is the point of the comparison."""
    from ..operators.sketches import hll_portable

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    sketch = hll_portable(ev, ["event_type"], "event_id")
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("event_id").cast("long").alias("exact_distinct")
    )
    return sketch.join(exact, on="event_type").select(
        "event_type", "hit_registers", "z_scaled", "est_distinct",
        "exact_distinct",
    )


def _oracle_q175() -> str:
    from ..operators.sketches import hll_portable_sql

    return f"""
SELECT h.k AS event_type, h.hit_registers, h.z_scaled, h.est_distinct,
       x.exact_distinct
FROM (WITH {hll_portable_sql("events", "event_type", "event_id")}) h
JOIN (SELECT event_type AS k,
             CAST(COUNT(DISTINCT event_id) AS BIGINT) AS exact_distinct
      FROM events GROUP BY 1) x ON h.k = x.k
"""


# ---------------------------------------------------------------------------
# q176: winnowing (MOSS) fingerprints
# ---------------------------------------------------------------------------

_WIN_K = 4  # gram size (tokens)
_WIN_W = 4  # window size (grams)


def q176_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed fingerprint set of every document: from each window of
    4 consecutive word-4-gram hashes keep the minimum (rightmost on
    ties) — guaranteed to share a fingerprint with any copied passage
    of >= 7 tokens, at ~2/(w+1) the storage of the full gram set."""
    from ..operators.textstats import winnowing_fingerprints

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    return winnowing_fingerprints(docs, k=_WIN_K, w=_WIN_W)


ORACLE_Q176 = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
  FROM documents),
grams AS (
  SELECT doc_id, u.i - 1 AS pos,
         array_to_string(t[u.i:u.i + {_WIN_K - 1}], ' ') AS gram
  FROM toks,
       UNNEST(generate_series(1, greatest(len(t) - {_WIN_K - 1}, 1)))
         AS u(i)),
h AS (
  SELECT doc_id, pos,
         ('0x' || substr(md5('0:' || gram), 1, 15))::BIGINT AS h
  FROM grams),
sel AS (
  SELECT doc_id,
         min({{'h': h, 'np': -pos}}) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND {_WIN_W - 1} FOLLOWING) AS s,
         count(*) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND {_WIN_W - 1} FOLLOWING) AS c
  FROM h)
SELECT DISTINCT doc_id, CAST(-s.np AS BIGINT) AS pos, s.h AS fp
FROM sel WHERE c = {_WIN_W}
"""


# ---------------------------------------------------------------------------
# q177: CUSUM changepoint scan
# ---------------------------------------------------------------------------

_DAILY_SQL = """
daily AS (
  SELECT o_orderpriority AS priority,
         CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM orders GROUP BY 1, 2)
"""


def _daily_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    return o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("day", F.col("o_orderdate")).alias("day"),
    ).agg(F.count("*").cast("long").alias("x"))


def q177_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changepoint candidate per priority series: the day maximizing
    |CUSUM| of daily order counts, in exact n-scaled integers
    (``temporal.cusum_scaled``) — earliest day wins ties, so the
    answer is a deterministic set with no float anywhere."""
    from pyspark.sql import Window

    from ..operators.temporal import cusum_scaled

    s = cusum_scaled(
        _daily_series(spark, sf_dir), ["priority"], "day", "x"
    )
    w = Window.partitionBy("priority").orderBy(
        F.desc(F.abs(F.col("s_scaled"))), F.asc("day")
    )
    return (
        s.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("priority", "day", "x", "n_points", "s_scaled")
    )


ORACLE_Q177 = f"""
WITH {_DAILY_SQL},
stats AS (
  SELECT priority, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS total
  FROM daily GROUP BY 1),
cum AS (
  SELECT d.priority, d.day, d.x, s.n AS n_points,
         s.n * SUM(d.x) OVER (PARTITION BY d.priority ORDER BY d.day
                              ROWS UNBOUNDED PRECEDING)
         - row_number() OVER (PARTITION BY d.priority ORDER BY d.day)
           * s.total AS s_scaled
  FROM daily d JOIN stats s USING (priority)),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY priority
                               ORDER BY abs(s_scaled) DESC, day ASC) AS rk
  FROM cum)
SELECT priority, day, x, n_points, CAST(s_scaled AS BIGINT) AS s_scaled
FROM ranked WHERE rk = 1
"""


# ---------------------------------------------------------------------------
# q178: lag-k autocorrelation
# ---------------------------------------------------------------------------

_MAX_LAG = 3


def q178_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..3 autocorrelation of each priority's daily order counts
    with integer-exact numerator/denominator (y_i = n·x_i − total; the
    n² scale cancels in the ratio) — seasonality diagnostics with ONE
    double division per (series, lag)."""
    from ..operators.temporal import lag_autocorr

    return lag_autocorr(
        _daily_series(spark, sf_dir), ["priority"], "day", "x",
        max_lag=_MAX_LAG,
    ).select("priority", "lag", "num", "den", "acf")


ORACLE_Q178 = f"""
WITH {_DAILY_SQL},
stats AS (
  SELECT priority, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS total
  FROM daily GROUP BY 1),
y AS (
  SELECT d.priority, d.day, s.n * d.x - s.total AS y
  FROM daily d JOIN stats s USING (priority)),
lagged AS (
  SELECT priority, y,
         lead(y, 1) OVER (PARTITION BY priority ORDER BY day) AS y1,
         lead(y, 2) OVER (PARTITION BY priority ORDER BY day) AS y2,
         lead(y, 3) OVER (PARTITION BY priority ORDER BY day) AS y3
  FROM y),
stacked AS (
  SELECT priority, y, u.lag, u.yl
  FROM lagged,
       LATERAL (
         SELECT UNNEST([1, 2, 3]) AS lag,
                UNNEST([y1, y2, y3]) AS yl) u)
SELECT priority, CAST(lag AS BIGINT) AS lag,
  CAST(SUM(CASE WHEN yl IS NOT NULL THEN y * yl END) AS BIGINT) AS num,
  CAST(SUM(y * y) AS BIGINT) AS den,
  round(CAST(SUM(CASE WHEN yl IS NOT NULL THEN y * yl END) AS DOUBLE)
        / CAST(SUM(y * y) AS DOUBLE), 6) AS acf
FROM stacked GROUP BY priority, lag
"""


# ---------------------------------------------------------------------------
# q179: SymSpell deletion-neighborhood spell linking
# ---------------------------------------------------------------------------

_SPELL_KEYS = 300


def q179_symspell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-1 name pairs among the first 300 customer names
    via the SymSpell deletion neighborhood: zero-padded sequential
    names differ naturally in single digit positions, so the planted
    structure of q169 isn't needed — the variant equi-join finds every
    single-substitution pair with a linear candidate build."""
    from ..operators.linkage import deletion_neighborhood_pairs

    cust = load_tables(spark, sf_dir, ["customer"])["customer"]
    terms = cust.where(F.col("c_custkey") <= _SPELL_KEYS).select(
        F.col("c_name").alias("term")
    )
    return deletion_neighborhood_pairs(terms, term_col="term")


ORACLE_Q179 = f"""
WITH terms AS (
  SELECT c_name AS term FROM customer WHERE c_custkey <= {_SPELL_KEYS}),
pairs AS (
  SELECT a.term AS term_a, b.term AS term_b
  FROM terms a JOIN terms b ON a.term < b.term
  WHERE levenshtein(a.term, b.term) <= 1)
SELECT term_a, term_b,
       CAST(levenshtein(term_a, term_b) AS BIGINT) AS dist
FROM pairs
"""


# ---------------------------------------------------------------------------
# q180: fixed-round k-core decomposition
# ---------------------------------------------------------------------------

_KCORE_K = 60
_KCORE_ROUNDS = 3


def q180_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3 peel rounds of the 60-core of the co-purchase graph: each
    round drops nodes of degree < 60 and their edges (the cascade is
    real on this graph: 1601 -> 1191 -> 420 survivors at sf0.01).
    Fixed rounds keep it deterministic and oracle-unrollable, the
    same discipline as q119's fixed-iteration PageRank."""
    from ..operators.graph import cooccurrence_edges, kcore
    from .catalog_batch18 import MAX_CONTAINER

    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    edges = cooccurrence_edges(
        li, "l_orderkey", "l_partkey", max_container_size=MAX_CONTAINER
    )
    out = kcore(edges, k=_KCORE_K, rounds=_KCORE_ROUNDS)
    return out.select(F.col("node").alias("part"), "degree")


def _oracle_q180() -> str:
    from .catalog_batch18 import _EDGES_SQL

    rounds = []
    prev = "e0"
    for r in range(_KCORE_ROUNDS):
        rounds.append(f"""
d{r} AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
  FROM (SELECT src AS node FROM {prev}
        UNION ALL SELECT dst FROM {prev}) GROUP BY node),
k{r} AS (SELECT node FROM d{r} WHERE degree >= {_KCORE_K}),
e{r + 1} AS (
  SELECT e.src, e.dst FROM {prev} e
  JOIN k{r} a ON e.src = a.node JOIN k{r} b ON e.dst = b.node)""")
        prev = f"e{r + 1}"
    return f"""
WITH {_EDGES_SQL},
e0 AS (SELECT src, dst FROM edges),
{",".join(rounds)}
SELECT node AS part, CAST(COUNT(*) AS BIGINT) AS degree
FROM (SELECT src AS node FROM {prev} UNION ALL SELECT dst FROM {prev})
GROUP BY node
"""


# ---------------------------------------------------------------------------
# q181: Merkle bucket fingerprint diff (anti-entropy sync)
# ---------------------------------------------------------------------------

_SYNC_BUCKETS = 64
_DEL_MOD = 193  # deleted keys: o_orderkey % 193 == 0
_UPD_MOD = 97   # updated keys: o_orderkey % 97 == 0 (price + 1)


def q181_bucket_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which of 64 hash buckets changed between two order snapshots
    (simulated delete of every 193rd key, price bump of every 97th):
    each snapshot reduces to 64 (count, XOR-of-row-hash) rows, and
    the diff touches only those — the Merkle anti-entropy handshake
    that syncs 100 TB replicas without shipping rows. Row-level
    repair then scopes ``snapshot_diff`` (q114) to the dirty buckets."""
    from ..operators.diffops import bucket_diff, bucket_fingerprints

    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    base = o.select("o_orderkey", "o_totalprice")
    new = (
        o.where(F.col("o_orderkey") % _DEL_MOD != 0)
        .select(
            "o_orderkey",
            F.when(
                F.col("o_orderkey") % _UPD_MOD == 0,
                F.col("o_totalprice") + 1,
            )
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
    )
    fp = lambda df: bucket_fingerprints(  # noqa: E731
        df, "o_orderkey", ["o_totalprice"], n_buckets=_SYNC_BUCKETS
    )
    return bucket_diff(fp(base), fp(new))


ORACLE_Q181 = f"""
WITH base AS (
  SELECT COALESCE('v:' || CAST(o_orderkey AS VARCHAR), 'null') AS k,
         COALESCE('v:' || CAST(o_totalprice AS VARCHAR), 'null') AS p
  FROM orders),
neww AS (
  SELECT COALESCE('v:' || CAST(o_orderkey AS VARCHAR), 'null') AS k,
         COALESCE('v:' || CAST(CASE WHEN o_orderkey % {_UPD_MOD} = 0
                   THEN o_totalprice + 1
                   ELSE o_totalprice END AS VARCHAR), 'null') AS p
  FROM orders WHERE o_orderkey % {_DEL_MOD} <> 0),
fb AS (
  SELECT ('0x' || substr(md5(k), 1, 15))::BIGINT % {_SYNC_BUCKETS}
           AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n_base,
         CAST(bit_xor(('0x' || substr(md5('0:' || k || ':' || p), 1, 15))
                      ::BIGINT) AS BIGINT) AS fp_base
  FROM base GROUP BY 1),
fn AS (
  SELECT ('0x' || substr(md5(k), 1, 15))::BIGINT % {_SYNC_BUCKETS}
           AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n_new,
         CAST(bit_xor(('0x' || substr(md5('0:' || k || ':' || p), 1, 15))
                      ::BIGINT) AS BIGINT) AS fp_new
  FROM neww GROUP BY 1)
SELECT COALESCE(fb.bucket, fn.bucket) AS bucket,
       n_base, n_new, fp_base, fp_new
FROM fb FULL OUTER JOIN fn ON fb.bucket = fn.bucket
WHERE COALESCE(n_base, -1) <> COALESCE(n_new, -1)
   OR COALESCE(fp_base, 0) <> COALESCE(fp_new, 0)
"""


# ---------------------------------------------------------------------------
# q182: reciprocal rank fusion (hybrid retrieval)
# ---------------------------------------------------------------------------

_RRF_K = 60     # the standard RRF dampening constant
_RRF_DEPTH = 50  # per-ranker candidate depth
_RRF_OUT = 20


def q182_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal rank fusion of sparse (BM25, q107's scorer) and
    dense (cosine-to-probe, q28's scorer) retrieval: score =
    Σ 1e6 div (60 + rank) over the rankers that returned the doc —
    rank-based, so no score calibration is needed (the reason RRF is
    the default hybrid combiner). Integer micro-units end to end.
    The fusion join runs on two ≤50-row ranked lists; the final rank
    window runs AFTER both limits (bounded input, allowlisted like
    q77)."""
    from ..operators.similarity import brute_force_topk
    from ..operators.textindex import bm25_topk
    from .catalog_batch14 import _B, _K1, BM25_QUERY

    docs = load_tables(spark, sf_dir, ["documents", "embeddings"])
    sparse = bm25_topk(
        docs["documents"], BM25_QUERY, k=_RRF_DEPTH, k1=_K1, b=_B
    )
    from pyspark.sql import Window

    ws = Window.orderBy(F.desc("score_micro"), F.asc("doc_id"))
    sparse_rk = sparse.select(
        "doc_id", F.row_number().over(ws).cast("long").alias("rk_bm25")
    )
    emb = docs["embeddings"]
    probe = emb.where(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), "embedding"
    )
    dense_rk = brute_force_topk(emb, probe, k=_RRF_DEPTH).select(
        F.col("vec_id").alias("doc_id"), F.col("rank").alias("rk_cos")
    )
    fused = sparse_rk.join(dense_rk, on="doc_id", how="full_outer")
    score = F.coalesce(
        F.expr(f"1000000 div ({_RRF_K} + rk_bm25)"), F.lit(0)
    ) + F.coalesce(F.expr(f"1000000 div ({_RRF_K} + rk_cos)"), F.lit(0))
    return (
        fused.withColumn("rrf_micro", score.cast("long"))
        .orderBy(F.desc("rrf_micro"), F.asc("doc_id"))
        .limit(_RRF_OUT)
        .select("doc_id", "rk_bm25", "rk_cos", "rrf_micro")
    )


def _oracle_q182() -> str:
    from .catalog_batch14 import _B, _K1, _K1P1, _TOK_CTE, BM25_QUERY

    terms = ", ".join(f"'{t}'" for t in BM25_QUERY)
    cos = (
        "list_dot_product(e.embedding::DOUBLE[], q.qv::DOUBLE[]) / "
        "(sqrt(list_dot_product(e.embedding::DOUBLE[], "
        "e.embedding::DOUBLE[])) * "
        "sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[])))"
    )
    return f"""
WITH {_TOK_CTE},
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
hits AS (SELECT * FROM tok WHERE token IN ({terms})),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM hits GROUP BY 1, 2),
df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM hits GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
ad AS (SELECT CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
       FROM dl),
scored AS (
  SELECT tf.doc_id,
         CAST(round(
           ln((n.n_docs - df.df + CAST(0.5 AS DOUBLE))
              / (df.df + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE))
           * ((tf.tf * CAST({_K1P1!r} AS DOUBLE))
              / (tf.tf + CAST({_K1!r} AS DOUBLE)
                 * (CAST(1.0 AS DOUBLE) - CAST({_B!r} AS DOUBLE)
                    + CAST({_B!r} AS DOUBLE) * dl.dl / ad.avgdl)))
           * CAST(1000000.0 AS DOUBLE)
         ) AS BIGINT) AS term_micro
  FROM tf
  JOIN df ON tf.token = df.token
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN n CROSS JOIN ad),
bm AS (
  SELECT doc_id, SUM(term_micro) AS score_micro
  FROM scored GROUP BY doc_id
  ORDER BY score_micro DESC, doc_id LIMIT {_RRF_DEPTH}),
bmr AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id)
              AS BIGINT) AS rk_bm25
  FROM bm),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
cs AS (
  SELECT e.vec_id AS doc_id, round({cos}, 6) AS score
  FROM embeddings e CROSS JOIN q),
csr AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
           AS rk_cos
  FROM cs ORDER BY score DESC, doc_id LIMIT {_RRF_DEPTH}),
fused AS (
  SELECT COALESCE(bmr.doc_id, csr.doc_id) AS doc_id, rk_bm25, rk_cos,
         CAST(COALESCE(1000000 // ({_RRF_K} + rk_bm25), 0)
              + COALESCE(1000000 // ({_RRF_K} + rk_cos), 0) AS BIGINT)
           AS rrf_micro
  FROM bmr FULL OUTER JOIN csr ON bmr.doc_id = csr.doc_id)
SELECT doc_id, rk_bm25, rk_cos, rrf_micro
FROM fused ORDER BY rrf_micro DESC, doc_id LIMIT {_RRF_OUT}
"""


def batch27_registry() -> list[QueryDef]:
    return [
        QueryDef("q175_hll_distinct", q175_hll_distinct, _oracle_q175(),
                 "oracle-checked portable HyperLogLog vs exact"),
        QueryDef("q176_winnowing", q176_winnowing, ORACLE_Q176,
                 "winnowing (MOSS) fingerprint selection"),
        QueryDef("q177_cusum_changepoint", q177_cusum_changepoint,
                 ORACLE_Q177,
                 "CUSUM changepoint scan in scaled integers"),
        QueryDef("q178_autocorrelation", q178_autocorrelation, ORACLE_Q178,
                 "lag-k autocorrelation, integer-exact num/den"),
        QueryDef("q179_symspell", q179_symspell, ORACLE_Q179,
                 "SymSpell deletion-neighborhood edit-1 pairs"),
        QueryDef("q180_kcore", q180_kcore, _oracle_q180(),
                 "fixed-round k-core peeling of the co-purchase graph"),
        QueryDef("q181_bucket_sync", q181_bucket_sync, ORACLE_Q181,
                 "Merkle bucket fingerprint diff (anti-entropy sync)"),
        QueryDef("q182_rrf_fusion", q182_rrf_fusion, _oracle_q182(),
                 "reciprocal rank fusion of BM25 + dense retrieval"),
    ]
