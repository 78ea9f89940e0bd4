"""Batch 59: high-radius Hamming search, index-accelerated substring
search, event inter-arrival model fitting, and multi-probe LSH recall.

- q284 multi-index hashing (MIH) — the high-radius exact Hamming join
  (Norouzi et al., CVPR'12): probe-side mask enumeration instead of the
  pigeonhole combo keys, ~15x cheaper linear explode at radius 10/64.
  Oracle brute-forces the same pair set, grouped by distance.
- q285 pg_trgm-parity trigram LIKE: multi-pattern %substring% search
  via rarest-first trigram posting probes + exact verify. Thematic
  reference parity: the reference loads into Postgres, where pg_trgm
  is the standard way to make LIKE '%x%' not scan.
- q286 inter-arrival exponential fit: per-user event gaps, pooled MLE
  rate, exact two-sided KS distance to Exp(lambda) via the
  range-partition prefix machinery (no unpartitioned window).
- q287 multi-probe LSH recall audit: one row comparing single-probe vs
  one-bit-flip multi-probe recall against the exact top-k — wiring the
  previously test-only ``multiprobe=True`` path into the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import similarity as S
from ..sources.parquet import load_tables
from .catalog import QueryDef
from .catalog_batch8 import HAMMING_BITS, _simhash_cte
from .catalog_northstar import _COS, PLANES, _duped_docs

# q284: multi-index hashing Hamming join --------------------------------------

MIH_BLOCKS = 4
MIH_MAX_HAMMING = 6


def q284_hamming_mih(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs within Hamming 6 of the 32-bit SimHash via multi-index
    hashing (4 blocks of 8 bits, per-block radius 1 -> 9 probe masks),
    grouped by distance. MIH is exact, so the oracle brute-forces all
    pairs — any candidate-generation recall loss shows up as a count
    mismatch at some distance."""
    fps = D.simhash(_duped_docs(spark, sf_dir), bits=HAMMING_BITS)
    pairs = D.hamming_pairs_mih(
        fps,
        bits=HAMMING_BITS,
        blocks=MIH_BLOCKS,
        max_hamming=MIH_MAX_HAMMING,
    )
    return (
        pairs.groupBy("hamming")
        .agg(F.count("*").cast("long").alias("n_pairs"))
        .select("hamming", "n_pairs")
    )


ORACLE_Q284 = f"""
WITH {_simhash_cte()},
pairs AS (
  SELECT CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
  FROM sh a JOIN sh b ON a.id < b.id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= {MIH_MAX_HAMMING})
SELECT hamming, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pairs GROUP BY hamming
"""


MIH_STRICT_BLOCKS = 2
MIH_STRICT_MAX_HAMMING = 3


def q291_hamming_mih_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The candidate-bound MIH companion (q86/q231 pattern): Hamming
    <= 3 via 2 blocks of 16 bits, per-block radius 1 -> 17 probe masks
    per block. Strict radius keeps the output tiny, so the runtime
    tracks probe-mask enumeration + 16-bit-key banding selectivity —
    the MIH regression signal q284 can't give (q284 is output-bound:
    the correlated low-vocabulary fingerprints make true Hamming<=6
    pairs quadratic at sf0.1)."""
    fps = D.simhash(_duped_docs(spark, sf_dir), bits=HAMMING_BITS)
    pairs = D.hamming_pairs_mih(
        fps,
        bits=HAMMING_BITS,
        blocks=MIH_STRICT_BLOCKS,
        max_hamming=MIH_STRICT_MAX_HAMMING,
    )
    return (
        pairs.groupBy("hamming")
        .agg(F.count("*").cast("long").alias("n_pairs"))
        .select("hamming", "n_pairs")
    )


ORACLE_Q291 = f"""
WITH {_simhash_cte()},
pairs AS (
  SELECT CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
  FROM sh a JOIN sh b ON a.id < b.id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= {MIH_STRICT_MAX_HAMMING})
SELECT hamming, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pairs GROUP BY hamming
"""


# q285: trigram-index LIKE search ---------------------------------------------

LIKE_PATTERNS = ["merge batch", "window spark", "slow filter", "data query"]


def q285_trigram_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-pattern substring search over documents, accelerated by a
    trigram posting index with rarest-first probes
    (operators/textindex.py) — lossless (verified with contains), so
    the oracle is the naive LIKE scan."""
    from ..operators.textindex import trigram_like_search

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    return trigram_like_search(docs, LIKE_PATTERNS)


ORACLE_Q285 = (
    "SELECT p.pattern, d.doc_id FROM documents d CROSS JOIN (VALUES "
    + ", ".join(f"('{p}')" for p in LIKE_PATTERNS)
    + ") p(pattern) WHERE contains(d.text, p.pattern)"
)


# q286: inter-arrival exponential fit ------------------------------------------


def q286_interarrival_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled per-user event inter-arrival gaps fitted to an
    exponential: MLE rate lambda = n / sum(gaps), plus the exact
    two-sided Kolmogorov-Smirnov distance between the gap ECDF and
    Exp(lambda). The ECDF prefix counts come from
    ``global_running_sum`` over distinct gap levels (range partition +
    broadcast offsets — no single-reducer window); per-level KS terms
    round to 1e-6 before the max so the one transcendental (exp) can't
    produce a cross-engine hash flip."""
    from ..operators.ranking import global_running_sum

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact integer microseconds on both engines (unix_micros /
    # epoch_us) — second-truncated diffs disagree on sub-second parts
    gaps = (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            (
                F.unix_micros("ts")
                - F.unix_micros(F.lag("ts").over(w))
            ).alias("gap_us"),
        )
        .where(F.col("gap_us").isNotNull())
        .select(F.col("gap_us").cast("long"))
    )
    levels = gaps.groupBy("gap_us").agg(F.count("*").alias("cnt"))
    cs = global_running_sum(
        levels, [F.asc("gap_us")], "cnt", rsum_col="c_end", total_col="n"
    )
    sum_gaps = gaps.agg(F.sum("gap_us").cast("long").alias("sum_gap_us"))
    j = cs.crossJoin(F.broadcast(sum_gaps))
    lam = F.col("n").cast("double") / F.col("sum_gap_us").cast("double")
    model = F.lit(1.0) - F.exp(-lam * F.col("gap_us").cast("double"))
    n_d = F.col("n").cast("double")
    d_hi = F.abs(F.col("c_end").cast("double") / n_d - model)
    d_lo = F.abs(
        (F.col("c_end") - F.col("cnt")).cast("double") / n_d - model
    )
    term = F.round(F.greatest(d_hi, d_lo), 6)
    return j.groupBy("n", "sum_gap_us").agg(
        (F.max(term) + F.lit(0.0)).alias("ks_d")
    ).select(
        F.col("n").cast("long").alias("n_gaps"),
        "sum_gap_us",
        "ks_d",
    )


ORACLE_Q286 = """
WITH gaps AS (
  SELECT epoch_us(ts) - epoch_us(LAG(ts) OVER
           (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
  FROM events),
g AS (SELECT CAST(gap_us AS BIGINT) AS gap_us FROM gaps
      WHERE gap_us IS NOT NULL),
levels AS (SELECT gap_us, COUNT(*) AS cnt FROM g GROUP BY gap_us),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us FROM g),
cs AS (SELECT gap_us, cnt,
              SUM(cnt) OVER (ORDER BY gap_us) AS c_end FROM levels),
terms AS (
  SELECT round(greatest(
           abs(CAST(c_end AS DOUBLE) / n -
               (1.0 - exp(-(CAST(n AS DOUBLE) / sum_gap_us) * gap_us))),
           abs(CAST(c_end - cnt AS DOUBLE) / n -
               (1.0 - exp(-(CAST(n AS DOUBLE) / sum_gap_us) * gap_us)))
         ), 6) AS term, n, sum_gap_us
  FROM cs CROSS JOIN tot)
SELECT n AS n_gaps, sum_gap_us, MAX(term) + 0.0 AS ks_d
FROM terms GROUP BY n, sum_gap_us
"""


# q287: multi-probe LSH recall audit -------------------------------------------

MP_K = 10


def q287_multiprobe_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row recall audit of sign-LSH retrieval: exact top-10 truth
    set vs single-probe buckets vs one-bit-flip multi-probe (the
    standard recall/cost dial — probing the 6 adjacent buckets instead
    of adding planes). All three sides are SQL-expressible (the probe
    neighborhood is exactly signature-Hamming <= 1), so the oracle
    recomputes truth, both candidate sets, and both hit counts."""
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    truth = S.brute_force_topk(emb, queries, k=MP_K).select(
        "query_id", "vec_id"
    )
    single = S.lsh_topk(emb, queries, PLANES, k=MP_K).select(
        "query_id", "vec_id"
    )
    multi = S.lsh_topk(
        emb, queries, PLANES, k=MP_K, multiprobe=True
    ).select("query_id", "vec_id")
    n_truth = truth.agg(F.count("*").cast("long").alias("n_truth"))
    hit_s = truth.join(single, on=["query_id", "vec_id"]).agg(
        F.count("*").cast("long").alias("hit_single")
    )
    hit_m = truth.join(multi, on=["query_id", "vec_id"]).agg(
        F.count("*").cast("long").alias("hit_multi")
    )
    return n_truth.crossJoin(F.broadcast(hit_s)).crossJoin(
        F.broadcast(hit_m)
    )


def _mp_oracle() -> str:
    sig = " + ".join(
        "(CASE WHEN list_dot_product(v.embedding::DOUBLE[], [%s]) >= 0 "
        "THEN %d ELSE 0 END)" % (", ".join(repr(x) for x in row), 1 << b)
        for b, row in enumerate(PLANES)
    )
    return f"""
WITH sigs AS (
  SELECT v.vec_id, v.embedding, CAST({sig} AS BIGINT) AS sig
  FROM embeddings v),
q AS (SELECT vec_id AS query_id, embedding AS qv, sig AS qsig
      FROM sigs WHERE vec_id < 5),
truth AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, e.vec_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY round({_COS}, 6) DESC, e.vec_id)
             AS rank
    FROM embeddings e CROSS JOIN q) r WHERE rank <= {MP_K}),
single AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, e.vec_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY round({_COS}, 6) DESC, e.vec_id)
             AS rank
    FROM sigs e JOIN q ON e.sig = q.qsig) r WHERE rank <= {MP_K}),
multi AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, e.vec_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY round({_COS}, 6) DESC, e.vec_id)
             AS rank
    FROM sigs e JOIN q ON bit_count(xor(e.sig, q.qsig)) <= 1) r
  WHERE rank <= {MP_K})
SELECT
  CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_truth,
  CAST((SELECT COUNT(*) FROM truth t JOIN single s
        USING (query_id, vec_id)) AS BIGINT) AS hit_single,
  CAST((SELECT COUNT(*) FROM truth t JOIN multi m
        USING (query_id, vec_id)) AS BIGINT) AS hit_multi
"""


ORACLE_Q287 = _mp_oracle()


def batch59_registry() -> list[QueryDef]:
    return [
        QueryDef(
            "q284_hamming_mih",
            q284_hamming_mih,
            ORACLE_Q284,
            "multi-index-hashing exact Hamming join vs brute-force distance histogram",
        ),
        QueryDef(
            "q285_trigram_like",
            q285_trigram_like,
            ORACLE_Q285,
            "trigram-index multi-pattern LIKE search vs naive contains scan",
        ),
        QueryDef(
            "q286_interarrival_fit",
            q286_interarrival_fit,
            ORACLE_Q286,
            "inter-arrival exponential MLE + exact KS distance",
        ),
        QueryDef(
            "q287_multiprobe_recall",
            q287_multiprobe_recall,
            ORACLE_Q287,
            "multi-probe vs single-probe LSH recall audit against exact top-k",
        ),
        QueryDef(
            "q291_hamming_mih_strict",
            q291_hamming_mih_strict,
            ORACLE_Q291,
            "candidate-bound MIH companion: strict-radius distance histogram",
        ),
    ]
