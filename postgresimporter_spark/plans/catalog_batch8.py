"""Eighth catalog batch: temporal joins (as-of, interval, gap-filled
rollup) and banded near-duplicate pair joins (embedding sign-band LSH,
SimHash Hamming).

Net-new engine surface beyond the reference (which delegates all query
work to Postgres): the temporal operators cover TimescaleDB /
Flink-style event workloads; the near-dup pair joins complete the
LLM-data-pipeline dedup stack (embedding-cosine near-dup was the one
SURVEY §2.10 dedup family without a pair-join query).

Oracle design: every Spark-side hash/band key in this batch is
SQL-expressible (sign bits, bit chunks, md5), so the oracles replicate
the CANDIDATE GENERATION too, not just the verify step — the compare
fails if banding loses a pair the oracle keeps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import curation as C
from ..operators import dedup as D
from ..operators import similarity as S
from ..operators import temporal as TP
from ..sources.parquet import load_tables
from .catalog import QueryDef, _dec
from .catalog_northstar import DUPED_DOCS_SQL, _TOKS, _duped_docs

# q82: as-of join ------------------------------------------------------------


def q82_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase event, the most recent strictly-prior click by
    the same user (value + timestamp), or nulls if none. Union-merge
    single-shuffle as-of join (operators/temporal.py) — the kdb ``aj``
    / Flink temporal-join shape without a range join."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    return TP.asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["value"],
        strict=True,
    ).select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.col("asof_value").alias("last_click_value"),
        F.col("asof_ts").alias("last_click_ts"),
    )


ORACLE_Q82 = """
WITH p AS (SELECT event_id, user_id, ts, value FROM events
           WHERE event_type = 'purchase'),
c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
SELECT p.event_id, p.user_id, p.ts, p.value,
       c.value AS last_click_value, c.ts AS last_click_ts
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts > c.ts
"""


# q83: interval (range) join -------------------------------------------------

INCIDENT_HOURS = 2
N_INCIDENTS = 20


def q83_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event counts inside incident windows: the top-20 error events by
    value open a 2-hour window each; count/sum all events landing in
    ``[start, start+2h)``. Bucketed interval join (granularity = window
    length): intervals explode into <=2 bucket keys, points probe one —
    an equi-join, never a point-x-interval cartesian."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    incidents = (
        ev.where(F.col("event_type") == "error")
        .orderBy(F.desc("value"), F.asc("event_id"))
        .limit(N_INCIDENTS)
        .select(
            F.col("event_id").alias("incident_id"),
            F.col("ts").alias("start_ts"),
            (F.col("ts") + F.expr(f"INTERVAL {INCIDENT_HOURS} HOURS")).alias(
                "end_ts"
            ),
        )
    )
    joined = TP.interval_join(
        ev.select("ts", "value"),
        incidents,
        point_ts="ts",
        start_col="start_ts",
        end_col="end_ts",
        granularity_s=INCIDENT_HOURS * 3600,
        broadcast_intervals=True,
    )
    return joined.groupBy("incident_id", "start_ts").agg(
        F.count("*").alias("n_events"),
        F.sum(_dec("value")).cast("double").alias("sum_value"),
    )


ORACLE_Q83 = f"""
WITH inc AS (
  SELECT event_id AS incident_id, ts AS start_ts,
         ts + INTERVAL {INCIDENT_HOURS} HOUR AS end_ts
  FROM events WHERE event_type = 'error'
  ORDER BY value DESC, event_id LIMIT {N_INCIDENTS})
SELECT incident_id, start_ts, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(15,4))) AS DOUBLE) AS sum_value
FROM inc JOIN events e ON e.ts >= inc.start_ts AND e.ts < inc.end_ts
GROUP BY 1, 2
"""


# q84: time-bucket rollup with gap-fill --------------------------------------


def q84_gapfill_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-type event rollup with zero-filled gaps over the full
    observed span (TimescaleDB ``time_bucket_gapfill`` semantics). The
    raw scan feeds one aggregation; the dense calendar is generated."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    return TP.time_bucket_gapfill(
        ev,
        ts_col="ts",
        bucket="hour",
        group_cols=["event_type"],
        aggs=[
            F.count("*").alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        ],
        fill={
            "n_events": F.lit(0).cast("long"),
            "sum_value": F.lit(0.0),
        },
    )


ORACLE_Q84 = """
WITH span AS (SELECT date_trunc('hour', MIN(ts)) AS lo,
                     date_trunc('hour', MAX(ts)) AS hi FROM events),
cal AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
          AS bucket_ts FROM span),
types AS (SELECT DISTINCT event_type FROM events),
agg AS (SELECT date_trunc('hour', ts) AS b, event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(15,4))) AS DOUBLE) AS s
        FROM events GROUP BY 1, 2)
SELECT cal.bucket_ts, types.event_type,
       COALESCE(agg.n, 0) AS n_events,
       COALESCE(agg.s, 0.0) AS sum_value
FROM cal CROSS JOIN types
LEFT JOIN agg ON agg.b = cal.bucket_ts AND agg.event_type = types.event_type
"""


# q85: embedding-cosine near-dup pairs (sign-band LSH) -----------------------

NEARDUP_THRESHOLD = 0.95
NEARDUP_BANDS = 4
NEARDUP_BITS = 4

# duped embeddings: ids < 50 get a +0.001-perturbed copy shifted by 10000
# (cosine vs the original ~0.9999; both engines build the identical union)
DUPED_EMB_SQL = """
SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
UNION ALL
SELECT vec_id + 10000 AS vec_id, list_transform(embedding::DOUBLE[], x -> x + 0.001) AS v
FROM embeddings WHERE vec_id < 50
"""


def _duped_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    extra = base.where(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.001)).alias(
            "embedding"
        ),
    )
    return base.unionByName(extra)


NEARDUP_BUCKET_CAP = 0.09


def q85_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: sign-bit band LSH
    candidates with the hot-bucket skew cap wired in (a band bucket
    holding >9% of rows is dropped from that band — the fixture's
    hottest bucket sits at 9.45%, so the cap is EXERCISED, not
    dead-until-opted-in), exact-cosine
    verify at 0.95. The planted perturbed copies are the expected
    survivors; the oracle replicates band keys AND the cap, so both
    banding recall and the skew guard are part of the contract."""
    return S.signband_neardup_pairs(
        _duped_embeddings(spark, sf_dir),
        threshold=NEARDUP_THRESHOLD,
        bands=NEARDUP_BANDS,
        bits_per_band=NEARDUP_BITS,
        max_bucket_ratio=NEARDUP_BUCKET_CAP,
    )


def _emb_bands_sql() -> str:
    entries = ", ".join(
        "{'band': %d, 'key': %s}"
        % (
            b,
            " || ".join(
                f"(CASE WHEN v[{b * NEARDUP_BITS + d + 1}] >= 0 "
                "THEN '1' ELSE '0' END)"
                for d in range(NEARDUP_BITS)
            ),
        )
        for b in range(NEARDUP_BANDS)
    )
    return f"[{entries}]"


ORACLE_Q85 = f"""
WITH duped AS ({DUPED_EMB_SQL}),
keyed_all AS (
  SELECT vec_id, v, unnest({_emb_bands_sql()}, recursive := true)
  FROM duped),
cool AS (
  SELECT band, key FROM keyed_all GROUP BY band, key
  HAVING COUNT(*) <= {NEARDUP_BUCKET_CAP}
         * (SELECT CAST(COUNT(*) AS DOUBLE) FROM duped)),
keyed AS (
  SELECT keyed_all.* FROM keyed_all JOIN cool USING (band, key)),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
         a.v AS va, b.v AS vb
  FROM keyed a
  JOIN keyed b ON a.band = b.band AND a.key = b.key
              AND a.vec_id < b.vec_id)
SELECT id_a, id_b,
  round(list_dot_product(va, vb) /
        (sqrt(list_dot_product(va, va)) * sqrt(list_dot_product(vb, vb))),
        6) AS cosine
FROM cand
WHERE round(list_dot_product(va, vb) /
            (sqrt(list_dot_product(va, va)) * sqrt(list_dot_product(vb, vb))),
            6) >= {NEARDUP_THRESHOLD}
"""


# q86: SimHash Hamming-distance pair join ------------------------------------

HAMMING_BITS = 32
HAMMING_CHUNKS = 4
MAX_HAMMING = 2


def q86_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All document pairs within Hamming distance 2 on the 32-bit
    SimHash, via exact pigeonhole banding (4 chunks, <=2 flips => a
    shared chunk is guaranteed). Because banding is exact, the oracle
    can brute-force all pairs — any banding recall loss shows up as a
    missing row."""
    fps = D.simhash(_duped_docs(spark, sf_dir), bits=HAMMING_BITS)
    return D.simhash_hamming_pairs(
        fps,
        bits=HAMMING_BITS,
        chunks=HAMMING_CHUNKS,
        max_hamming=MAX_HAMMING,
    )


def _simhash_cte() -> str:
    votes = ", ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(HAMMING_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN CAST({2**i} AS BIGINT) ELSE 0 END)"
        for i in range(HAMMING_BITS)
    )
    return f"""
duped AS ({DUPED_DOCS_SQL}),
toks AS (SELECT doc_id AS id, unnest({_TOKS}) AS tok FROM duped),
h AS (SELECT id, ('0x' || substr(md5('0:' || tok), 1, 15))::BIGINT AS h
      FROM toks),
v AS (SELECT id, {votes} FROM h GROUP BY id),
sh AS (SELECT id, CAST({fp} AS BIGINT) AS simhash FROM v)
"""


ORACLE_Q86 = f"""
WITH {_simhash_cte()}
SELECT a.id AS id_a, b.id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sh a JOIN sh b ON a.id < b.id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {MAX_HAMMING}
"""


# q87: benchmark decontamination ---------------------------------------------

CONTAM_N = 4  # real pipelines use 8-13; the tiny fixture vocabulary
# needs 4 to produce non-trivial natural collisions

EVAL_CUTOFF = 20  # doc_id < 20 plays the benchmark/eval set


def q87_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set n-gram contamination: training docs (doc_id >= 20)
    sharing any word 4-gram with the pretend benchmark (doc_id < 20),
    with the shared-ngram count. Distinct-shingle equi-join, eval side
    broadcast (operators/curation.py)."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    return C.ngram_contamination(
        docs.where(F.col("doc_id") >= EVAL_CUTOFF),
        docs.where(F.col("doc_id") < EVAL_CUTOFF),
        n=CONTAM_N,
    )


_SHINGLES_N = (
    "list_distinct(list_transform("
    "generate_series(0, greatest(len({toks}) - {n}, 0)), "
    "i -> array_to_string(list_slice({toks}, i + 1, i + {n}), ' ')))"
)

ORACLE_Q87 = f"""
WITH ev AS (
  SELECT DISTINCT unnest({_SHINGLES_N.format(toks=_TOKS, n=CONTAM_N)}) AS s
  FROM documents WHERE doc_id < {EVAL_CUTOFF}),
tr AS (
  SELECT doc_id, unnest({_SHINGLES_N.format(toks=_TOKS, n=CONTAM_N)}) AS s
  FROM documents WHERE doc_id >= {EVAL_CUTOFF})
SELECT tr.doc_id, COUNT(*) AS n_shared_ngrams
FROM tr JOIN ev USING (s)
GROUP BY tr.doc_id
"""


# q88: intra-document repetition (Gopher-style quality rule) -----------------


def q88_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicate n-gram fractions for n=2,3 — pure
    per-row array math, zero shuffles (operators/curation.py)."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    return C.repetition_ratio(docs, ns=(2, 3))


def _rep_sql(n: int) -> str:
    grams = (
        "list_transform(generate_series(0, greatest(len({toks}) - {n}, 0)), "
        "i -> array_to_string(list_slice({toks}, i + 1, i + {n}), ' '))"
    ).format(toks=_TOKS, n=n)
    return (
        f"len(g{n}) AS n_{n}grams, "
        f"len(list_distinct(g{n})) AS n_distinct_{n}grams, "
        f"round(1.0 - CAST(len(list_distinct(g{n})) AS DOUBLE) "
        f"/ len(g{n}), 6) AS dup{n}_ratio"
    ), grams


_R2, _G2 = _rep_sql(2)
_R3, _G3 = _rep_sql(3)

ORACLE_Q88 = f"""
WITH g AS (SELECT doc_id, {_G2} AS g2, {_G3} AS g3 FROM documents)
SELECT doc_id, {_R2}, {_R3} FROM g
"""


# q89: mixture upsampling (training-mix construction) ------------------------

# weight by source number mod 4: 0 -> 2.5 epochs, 1 -> 1.0, 2 -> 0.5,
# 3 -> 0.25 — exercises full copies, the no-op weight, and two
# fractional sampling rates in one mix
MIX_WEIGHTS = {
    f"src{i}": {0: 250, 1: 100, 2: 50, 3: 25}[i % 4] for i in range(20)
}


def q89_mixture_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture upsampling: per-source epoch weights in
    integer percent; fractional epochs are md5-bucket samples keyed on
    doc_id (operators/curation.py). Verified via per-source epoch
    counts (the row set itself is the exploded copies)."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    mixed = C.mixture_upsample(docs, MIX_WEIGHTS)
    return mixed.groupBy("source").agg(
        F.count("*").alias("n_rows"),
        F.max("epoch").cast("long").alias("max_epoch"),
        F.count_distinct("doc_id").alias("n_docs"),
    )


def _mix_values_sql() -> str:
    return ", ".join(f"('{s}', {w})" for s, w in sorted(MIX_WEIGHTS.items()))


ORACLE_Q89 = f"""
WITH w(source, w_pct) AS (VALUES {_mix_values_sql()}),
d AS (
  SELECT doc_id, d.source,
         w_pct // 100
         + CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                     % 100 < w_pct % 100
                THEN 1 ELSE 0 END AS n_epochs
  FROM documents d JOIN w USING (source)),
exploded AS (
  SELECT doc_id, source, unnest(generate_series(1, n_epochs)) AS epoch
  FROM d)
SELECT source, COUNT(*) AS n_rows, MAX(epoch) AS max_epoch,
       COUNT(DISTINCT doc_id) AS n_docs
FROM exploded
GROUP BY source
"""


# q90: snapshot merge / upsert (CDC apply) ----------------------------------


def q90_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins merge of the orders snapshot with a synthesized
    change batch (price bumps for keys %100<10, inserts cloned from
    keys %100>=95), verified via per-status aggregate fingerprints.
    Single-shuffle max_by merge (operators/merge.py)."""
    from ..operators.merge import merge_upsert

    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    snap = o.select(
        "o_orderkey", "o_orderstatus", "o_totalprice", F.lit(1).alias("version")
    )
    bumps = snap.where(F.col("o_orderkey") % 100 < 10).select(
        "o_orderkey",
        "o_orderstatus",
        (F.col("o_totalprice") + F.lit(1000.0)).alias("o_totalprice"),
        F.lit(2).alias("version"),
    )
    inserts = snap.where(F.col("o_orderkey") % 100 >= 95).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "o_orderstatus",
        "o_totalprice",
        F.lit(2).alias("version"),
    )
    merged = merge_upsert(
        snap, bumps.unionByName(inserts), ["o_orderkey"], "version"
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_rows"),
        F.sum(_dec("o_totalprice")).cast("double").alias("sum_price"),
        F.sum(F.when(F.col("version") == 2, 1).otherwise(0))
        .cast("long")
        .alias("n_changed"),
    )


ORACLE_Q90 = """
WITH snap AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice, 1 AS version FROM orders),
bumps AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice + 1000.0 AS o_totalprice,
         2 AS version
  FROM snap WHERE o_orderkey % 100 < 10),
inserts AS (
  SELECT o_orderkey + 10000000 AS o_orderkey, o_orderstatus, o_totalprice,
         2 AS version
  FROM snap WHERE o_orderkey % 100 >= 95),
unioned AS (
  SELECT *, 0 AS src FROM snap
  UNION ALL SELECT *, 1 AS src FROM bumps
  UNION ALL SELECT *, 1 AS src FROM inserts),
merged AS (
  SELECT * FROM unioned
  QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderkey
                             ORDER BY version DESC, src DESC) = 1)
SELECT o_orderstatus, COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(15,4))) AS DOUBLE) AS sum_price,
       CAST(SUM(CASE WHEN version = 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_changed
FROM merged
GROUP BY o_orderstatus
"""


# q91: deterministic k-means (2 Lloyd iterations) ---------------------------

KMEANS_K = 8
KMEANS_ITERS = 2


def q91_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final (vec_id, cid) assignment after 2 deterministic Lloyd
    iterations (operators/kmeans.py): init = lowest-id vectors,
    fixed-point centroid means, lowest-cid distance tiebreaks. The
    oracle unrolls both iterations in SQL — the full training loop is
    differentially tested, not just one step."""
    from ..operators.kmeans import kmeans_lloyd

    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    out = kmeans_lloyd(emb, k=KMEANS_K, iters=KMEANS_ITERS)
    return out.select("vec_id", F.col("cid").cast("long").alias("cid"))


_KM_DIST = (
    "list_sum(list_transform(generate_series(1, len({v})), "
    "i -> ({v}[i] - {c}[i]) * ({v}[i] - {c}[i])))"
)


def _km_assign_cte(vectors: str, cents: str, out: str) -> str:
    d = _KM_DIST.format(v=f"{vectors}.v", c=f"{cents}.cv")
    return f"""
{out} AS (
  SELECT vec_id, v, cid FROM (
    SELECT {vectors}.vec_id, {vectors}.v, {cents}.cid,
           ROW_NUMBER() OVER (
             PARTITION BY {vectors}.vec_id
             ORDER BY {d}, {cents}.cid) AS rn
    FROM {vectors} CROSS JOIN {cents})
  WHERE rn = 1)
"""


def _km_update_cte(assigned: str, prev: str, out: str) -> str:
    return f"""
{out}_means AS (
  SELECT cid, dim,
         CAST(SUM(CAST(val * 1000000 AS BIGINT)) AS DOUBLE)
           / (1000000.0 * COUNT(*)) AS mean_val
  FROM (SELECT cid,
               unnest(generate_series(1, len(v))) AS dim,
               unnest(v) AS val
        FROM {assigned})
  GROUP BY cid, dim),
{out}_vecs AS (
  SELECT cid, list(mean_val ORDER BY dim) AS cv
  FROM {out}_means GROUP BY cid),
{out} AS (
  SELECT {prev}.cid, COALESCE({out}_vecs.cv, {prev}.cv) AS cv
  FROM {prev} LEFT JOIN {out}_vecs ON {prev}.cid = {out}_vecs.cid)
"""


ORACLE_Q91 = f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[], x -> round(x, 6)) AS v
  FROM embeddings),
c0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
  FROM (SELECT vec_id, v FROM q ORDER BY vec_id LIMIT {KMEANS_K})),
{_km_assign_cte('q', 'c0', 'a1')},
{_km_update_cte('a1', 'c0', 'c1')},
{_km_assign_cte('q', 'c1', 'a2')},
{_km_update_cte('a2', 'c1', 'c2')},
{_km_assign_cte('q', 'c2', 'a3')}
SELECT vec_id, CAST(cid AS BIGINT) AS cid FROM a3
"""


def batch8_registry() -> list[QueryDef]:
    return [
        QueryDef("q82_asof_join", q82_asof_join, ORACLE_Q82, "as-of join: latest prior click per purchase (union-merge)"),
        QueryDef("q83_interval_join", q83_interval_join, ORACLE_Q83, "bucketed interval join: events within incident windows"),
        QueryDef("q84_gapfill_rollup", q84_gapfill_rollup, ORACLE_Q84, "hourly rollup with zero-filled gaps"),
        QueryDef("q85_embedding_neardup", q85_embedding_neardup, ORACLE_Q85, "embedding-cosine near-dup pairs (sign-band LSH)"),
        QueryDef("q86_simhash_hamming", q86_simhash_hamming, ORACLE_Q86, "SimHash pairs within Hamming 2 (pigeonhole banding)"),
        QueryDef("q87_decontaminate", q87_decontaminate, ORACLE_Q87, "eval-set n-gram contamination scan"),
        QueryDef("q88_repetition_ratio", q88_repetition_ratio, ORACLE_Q88, "Gopher-style intra-doc repetition ratios"),
        QueryDef("q89_mixture_upsample", q89_mixture_upsample, ORACLE_Q89, "deterministic mixture upsampling (epoch weights)"),
        QueryDef("q90_merge_upsert", q90_merge_upsert, ORACLE_Q90, "latest-wins snapshot merge (CDC apply)"),
        QueryDef("q91_kmeans_assign", q91_kmeans_assign, ORACLE_Q91, "deterministic k-means: 2 Lloyd iterations, full-loop oracle"),
    ]
