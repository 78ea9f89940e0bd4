"""Twenty-first catalog batch: corpus-lifecycle tier — incremental
MinHash dedup against stored history, C4-style duplicated-span removal,
ranking-quality retrieval metrics (MRR/NDCG), and a cross-source
contamination matrix.

These model the *ongoing* life of a 100 TB training corpus: new crawl
batches are deduped against an immutable signature index (history text
is never re-read), boilerplate spans are cut at token granularity, the
ANN serving path is scored with ranking metrics (not just recall), and
subset leakage (train/eval, crawl/crawl) is audited pairwise. Each
query pairs the Spark plan with a full-semantics DuckDB oracle.

No counterpart in the reference (its scope ends at CSV→Postgres
loading, `/root/reference/postgresimporter/main.py`): this tier is the
beyond-reference LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import curation as C
from ..operators import dedup as D
from ..operators import similarity as S
from ..operators import textstats as T
from ..sources.parquet import load_tables
from .catalog import QueryDef
from .catalog_batch10 import RECALL_K
from .catalog_northstar import (
    BANDS,
    NUM_HASHES,
    ORACLE_Q28,
    _SHINGLES,
    _bands_sql,
    _minhash_sig_sql,
)
from .catalog_pandas import CENTROIDS, ORACLE_Q46

# q129: incremental MinHash dedup against corpus history ---------------------

# New-batch fixture: 25 near-dups of history docs (one appended token)
# plus 25 token-reversed docs (shingle-disjoint from their originals) —
# the matcher must flag the first group and pass the second.
_BATCH_SQL = """
SELECT doc_id + 20000 AS doc_id, text || ' ingestmarker' AS text
FROM documents WHERE doc_id < 25
UNION ALL
SELECT doc_id + 20000 AS doc_id,
       array_to_string(list_reverse(string_split_regex(trim(text), '\\s+')), ' ') AS text
FROM documents WHERE doc_id >= 25 AND doc_id < 50
"""


def _new_batch(docs: DataFrame) -> DataFrame:
    near = docs.where(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" ingestmarker")).alias("text"),
    )
    rev = docs.where(
        (F.col("doc_id") >= 25) & (F.col("doc_id") < 50)
    ).select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.array_join(
            F.reverse(F.split(F.trim(F.col("text")), r"\s+")), " "
        ).alias("text"),
    )
    return near.unionByName(rev)


def q129_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup a new ingest batch against corpus history via a stored
    banded MinHash index (operators/dedup.py:minhash_band_index /
    minhash_match_index): history text is never re-shingled, the batch
    side broadcasts, and the probe is a (band, bucket) equi-join into
    the index — the standard shape for continuous corpus ingestion."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    hist = docs.select("doc_id", "text")
    index = D.minhash_band_index(
        hist, num_hashes=NUM_HASHES, bands=BANDS
    )
    return D.minhash_match_index(
        index,
        _new_batch(docs),
        num_hashes=NUM_HASHES,
        bands=BANDS,
        threshold=0.5,
    )


def _sig_band_cte(src: str, prefix: str) -> str:
    """Shared CTE chain: (doc_id, text) relation name -> banded rows."""
    return f"""
{prefix}sh AS (SELECT doc_id AS id, {_SHINGLES} AS sh FROM {src}),
{prefix}based AS (SELECT id, list_transform(sh,
    s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % {D.MINHASH_P}) AS bases
  FROM {prefix}sh),
{prefix}sigs AS (SELECT id, {_minhash_sig_sql()} AS signature
  FROM {prefix}based),
{prefix}band AS (
  SELECT id, signature, unnest({_bands_sql()}, recursive := true)
  FROM {prefix}sigs)"""


ORACLE_Q129 = f"""
WITH hist AS (SELECT doc_id, text FROM documents),
batch AS ({_BATCH_SQL}),
{_sig_band_cte('hist', 'h')},
{_sig_band_cte('batch', 'b')},
cand AS (
  SELECT DISTINCT b.id AS new_id, h.id AS hist_id,
         b.signature AS sig_a, h.signature AS sig_b
  FROM hband h
  JOIN bband b ON h.band = b.band AND h.bucket = b.bucket)
SELECT new_id, hist_id,
  round(len(list_filter(generate_series(1, {NUM_HASHES}),
                        i -> sig_a[i] = sig_b[i])) / {NUM_HASHES}.0, 6)
    AS est_jaccard
FROM cand
WHERE round(len(list_filter(generate_series(1, {NUM_HASHES}),
                            i -> sig_a[i] = sig_b[i])) / {NUM_HASHES}.0, 6)
      >= 0.5
"""


# q130: C4-style duplicated-span removal -------------------------------------

SPAN = 5
SPAN_MIN_DOCS = 10
# 8-token boilerplate prepended to every third document: its interior
# full-length 5-grams recur in ~1/3 of the corpus and must be cut.
_SPAN_BOILER = "subscribe to our newsletter for daily updates now "


def q130_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document span removal (C4 §2.2 re-expressed at token-window
    granularity): token positions covered by any 5-gram occurring in
    >= 10 documents are deleted and the text is rebuilt in order
    (operators/curation.py:remove_duplicate_spans)."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    marked = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit(_SPAN_BOILER), F.col("text")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return C.remove_duplicate_spans(
        marked, span=SPAN, min_docs=SPAN_MIN_DOCS
    )


ORACLE_Q130 = f"""
WITH marked AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN '{_SPAN_BOILER}' || text
              ELSE text END AS text
  FROM documents),
toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS arr
         FROM marked),
words AS (
  SELECT doc_id, unnest(arr) AS w,
         unnest(generate_series(0, len(arr) - 1)) AS pos
  FROM toks),
starts AS (
  SELECT doc_id, arr,
         unnest(generate_series(0, len(arr) - {SPAN})) AS start
  FROM toks),
grams AS (
  SELECT doc_id, start,
         array_to_string(list_slice(arr, start + 1, start + {SPAN}), ' ')
           AS gram
  FROM starts),
dup AS (
  SELECT gram FROM grams GROUP BY gram
  HAVING COUNT(DISTINCT doc_id) >= {SPAN_MIN_DOCS}),
cov AS (
  SELECT DISTINCT doc_id, pos FROM (
    SELECT g.doc_id,
           unnest(generate_series(g.start, g.start + {SPAN - 1})) AS pos
    FROM grams g JOIN dup USING (gram))),
kept AS (
  SELECT w.doc_id, w.pos, w.w
  FROM words w LEFT JOIN cov c ON w.doc_id = c.doc_id AND w.pos = c.pos
  WHERE c.doc_id IS NULL),
agg AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         string_agg(w, ' ' ORDER BY pos) AS clean_text
  FROM kept GROUP BY doc_id),
base AS (SELECT doc_id, len(arr) AS n_tokens FROM toks)
SELECT b.doc_id,
       CAST(b.n_tokens AS BIGINT) AS n_tokens,
       CAST(b.n_tokens - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed,
       COALESCE(a.clean_text, '') AS clean_text
FROM base b LEFT JOIN agg a USING (doc_id)
"""


# q131: retrieval ranking metrics (MRR / NDCG@10) ----------------------------

_GAINS = S.dcg_gain_table(RECALL_K)
_IDCG = 0.0
for _g in _GAINS:
    _IDCG += _g


def q131_retrieval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality evaluation of the IVF ANN (q46 configuration)
    against brute-force exact top-10: per query MRR and binary-gain
    NDCG@10 (operators/similarity.py:retrieval_metrics). The DCG fold
    uses a Python-literal gain table over the sorted rank list, so
    double accumulation is order-fixed and engine-identical."""
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = S.brute_force_topk(emb, queries, k=RECALL_K)
    approx = S.ivf_topk(emb, queries, CENTROIDS, k=RECALL_K, nprobe=2)
    return S.retrieval_metrics(exact, approx, k=RECALL_K)


_GAINS_SQL = "[" + ", ".join(repr(g) for g in _GAINS) + "]"

ORACLE_Q131 = f"""
WITH exact AS ({ORACLE_Q28}),
approx AS ({ORACLE_Q46}),
hits AS (
  SELECT a.query_id, a.rank
  FROM approx a JOIN exact e
    ON a.query_id = e.query_id AND a.vec_id = e.vec_id),
perq AS (
  SELECT query_id, COUNT(*) AS n_hits,
         list_reduce(
           list_prepend(0.0,
             list_transform(list_sort(list(rank)),
                            r -> ({_GAINS_SQL})[r])),
           (acc, v) -> acc + v) AS dcg
  FROM hits GROUP BY query_id),
rel AS (SELECT query_id, vec_id FROM exact WHERE rank = 1),
firsts AS (
  SELECT r.query_id, a.rank
  FROM rel r JOIN approx a
    ON a.query_id = r.query_id AND a.vec_id = r.vec_id),
qs AS (SELECT DISTINCT query_id FROM exact)
SELECT q.query_id,
       CAST(COALESCE(p.n_hits, 0) AS BIGINT) AS n_hits,
       round(COALESCE(1.0 / f.rank, 0.0), 6) AS mrr,
       round(COALESCE(p.dcg, 0.0) / {_IDCG!r}, 6) AS ndcg
FROM qs q
LEFT JOIN perq p USING (query_id)
LEFT JOIN firsts f USING (query_id)
"""


# q132: cross-source contamination matrix ------------------------------------

_AUG_SQL = """
SELECT doc_id, text, source FROM documents
UNION ALL
SELECT doc_id, text, 'dup-crawl' AS source FROM documents WHERE doc_id % 7 = 0
UNION ALL
SELECT doc_id, text, 'eval-set' AS source FROM documents WHERE doc_id % 14 = 0
"""


def q132_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise subset-leakage audit: distinct shared contents per
    source pair (operators/dedup.py:cross_source_overlap). The fixture
    injects a mirrored crawl and an eval subset so overlap rows exist
    both mirror-vs-origin and mirror-vs-mirror."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    aug = (
        docs.select("doc_id", "text", "source")
        .unionByName(
            docs.where(F.col("doc_id") % 7 == 0).select(
                "doc_id", "text", F.lit("dup-crawl").alias("source")
            )
        )
        .unionByName(
            docs.where(F.col("doc_id") % 14 == 0).select(
                "doc_id", "text", F.lit("eval-set").alias("source")
            )
        )
    )
    return D.cross_source_overlap(aug)


ORACLE_Q132 = f"""
WITH aug AS ({_AUG_SQL}),
gh AS (SELECT DISTINCT source AS g, sha256(text) AS h FROM aug),
p AS (
  SELECT a.g AS source_a, b.g AS source_b
  FROM gh a JOIN gh b ON a.h = b.h AND a.g < b.g)
SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM p GROUP BY 1, 2
"""


# q133: per-source quota cap -------------------------------------------------

QUOTA = 10


def q133_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain balancing: keep at most 10 documents per source, chosen
    by seeded-md5 order (operators/curation.py:source_quota) — a
    partitioned window, deterministic across engines and runs."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    return C.source_quota(
        docs.select("doc_id", "source"), max_per_group=QUOTA
    )


ORACLE_Q133 = f"""
WITH ranked AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5('quota:' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS quota_rank
  FROM documents)
SELECT doc_id, source, CAST(quota_rank AS BIGINT) AS quota_rank
FROM ranked WHERE quota_rank <= {QUOTA}
"""


# q134: out-of-vocabulary rate ------------------------------------------------

VOCAB_N = 25


def q134_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-coverage audit: per-document fraction of token
    occurrences outside the corpus top-25 vocabulary
    (operators/textstats.py:oov_rate); the vocabulary cut is a total
    order (count desc, token asc) so ties never flap."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    return T.oov_rate(docs, vocab_size=VOCAB_N)


ORACLE_Q134 = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
  FROM documents),
vc AS (SELECT t, COUNT(*) AS n FROM tok GROUP BY t),
vocab AS (SELECT t FROM vc ORDER BY n DESC, t LIMIT {VOCAB_N}),
j AS (
  SELECT tok.doc_id,
         CASE WHEN v.t IS NULL THEN 1 ELSE 0 END AS o
  FROM tok LEFT JOIN vocab v USING (t))
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(o) AS BIGINT) AS n_oov,
       round(CAST(SUM(o) AS DOUBLE) / COUNT(*), 6) AS oov_rate
FROM j GROUP BY doc_id
"""


# q135: SemDeDup (semantic dedup within k-means cells) -----------------------

SEM_TAU = 0.95

_AUG_EMB_SQL = """
SELECT vec_id, embedding FROM embeddings
UNION ALL
SELECT vec_id + 10000 AS vec_id, embedding FROM embeddings WHERE vec_id < 60
"""


def q135_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup of an embedding
    corpus — nearest-centroid cells, then within-cell drop of any
    vector with a tau-similar cellmate closer to the centroid
    (operators/similarity.py:semdedup). The fixture unions exact
    duplicate vectors (cosine 1.0) so drops are guaranteed; the
    identical-vector ties resolve to the lower id surviving."""
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    aug = emb.select("vec_id", "embedding").unionByName(
        emb.where(F.col("vec_id") < 60).select(
            (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
        )
    )
    return S.semdedup(aug, CENTROIDS, tau=SEM_TAU)


def _semdedup_oracle() -> str:
    def lit(vec: list[float]) -> str:
        return "[" + ", ".join(repr(x) for x in vec) + "]"

    def cos(a: str, b: str) -> str:
        return (
            f"list_dot_product({a}::DOUBLE[], {b}) / "
            f"(sqrt(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[])) * "
            f"sqrt(list_dot_product({b}, {b})))"
        )

    score_cols = ", ".join(
        f"{cos('embedding', lit(vec))} AS s{cid}" for cid, vec in CENTROIDS
    )
    n = len(CENTROIDS)
    best = "greatest(" + ", ".join(f"s{c}" for c in range(n)) + ")"
    cell_case = (
        "CASE "
        + " ".join(f"WHEN s{c} = {best} THEN {c}" for c in range(n))
        + " END"
    )
    csim_case = (
        "CASE "
        + " ".join(
            f"WHEN s{c} = {best} THEN round(s{c}, 6)" for c in range(n)
        )
        + " END"
    )
    pair_cos = (
        "round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / "
        "(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * "
        "sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6)"
    )
    return f"""
WITH aug AS ({_AUG_EMB_SQL}),
scored AS (SELECT vec_id, embedding, {score_cols} FROM aug),
assigned AS (
  SELECT vec_id, embedding, {cell_case} AS cell, {csim_case} AS centroid_sim
  FROM scored),
dropped AS (
  SELECT DISTINCT a.vec_id
  FROM assigned a JOIN assigned b
    ON a.cell = b.cell AND a.vec_id != b.vec_id
  WHERE {pair_cos} >= {SEM_TAU}
    AND (b.centroid_sim > a.centroid_sim
         OR (b.centroid_sim = a.centroid_sim AND b.vec_id < a.vec_id)))
SELECT s.vec_id, CAST(s.cell AS INTEGER) AS cell, s.centroid_sim
FROM assigned s LEFT JOIN dropped d ON s.vec_id = d.vec_id
WHERE d.vec_id IS NULL
"""


ORACLE_Q135 = _semdedup_oracle()


# q136: incremental top-k maintenance ----------------------------------------

TOPK_K = 10

_TOPK_BATCH_SQL = """
SELECT vec_id + 10000 AS vec_id, embedding
FROM embeddings WHERE vec_id < 40
"""


def q136_incremental_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for similarity serving: yesterday's
    stored top-10 (over history) merges with a scored new batch via
    topk(A∪B) = topk(topk(A)∪topk(B)) — history is never re-scanned
    (operators/similarity.py:merge_topk). The oracle recomputes top-10
    over the FULL union corpus, so the merge identity itself is what
    the differential check proves. The batch duplicates 40 history
    vectors under higher ids: score ties crossing the merge boundary
    must resolve identically to the from-scratch ranking."""
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    prev = S.brute_force_topk(emb, queries, k=TOPK_K)
    batch = emb.where(F.col("vec_id") < 40).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
    )
    return S.merge_topk(prev, batch, queries, k=TOPK_K)


ORACLE_Q136 = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv
           FROM embeddings WHERE vec_id < 5),
full_corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  {_TOPK_BATCH_SQL}),
scored AS (
  SELECT q.query_id, e.vec_id,
    round(list_dot_product(e.embedding::DOUBLE[], q.qv::DOUBLE[]) /
      (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
       sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))), 6) AS score
  FROM full_corpus e CROSS JOIN q),
ranked AS (
  SELECT query_id, vec_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, vec_id) AS rank
  FROM scored)
SELECT query_id, vec_id, score, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {TOPK_K}
"""


# q137: positional phrase search ---------------------------------------------

_PHRASE = ["data", "pipeline", "quality"]
_PHRASE_PREFIX = " ".join(_PHRASE) + " "


def q137_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quoted-query retrieval: exact contiguous phrase occurrences via
    positional postings re-keyed to the phrase anchor and m-way
    equi-joined (operators/textindex.py:phrase_search). The fixture
    prepends the phrase to every fifth document, so hits exist at
    position 0 there plus any natural occurrences elsewhere."""
    from ..operators.textindex import phrase_search

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    marked = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit(_PHRASE_PREFIX), F.col("text")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return phrase_search(marked, _PHRASE)


def _phrase_oracle() -> str:
    streams = []
    for i, tok in enumerate(_PHRASE):
        streams.append(
            f"p{i} AS (SELECT doc_id, pos - {i} AS anchor "
            f"FROM words WHERE w = '{tok}')"
        )
    joins = " ".join(
        f"JOIN p{i} USING (doc_id, anchor)" for i in range(1, len(_PHRASE))
    )
    return f"""
WITH marked AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN '{_PHRASE_PREFIX}' || text
              ELSE text END AS text
  FROM documents),
toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS arr
         FROM marked),
words AS (
  SELECT doc_id, unnest(arr) AS w,
         unnest(generate_series(0, len(arr) - 1)) AS pos
  FROM toks),
{', '.join(streams)}
SELECT p0.doc_id, CAST(p0.anchor AS BIGINT) AS start_pos
FROM p0 {joins}
WHERE p0.anchor >= 0
"""


ORACLE_Q137 = _phrase_oracle()


# q138: end-to-end corpus build (dedup -> gates -> quota -> mixture) ---------

BUILD_QUOTA = 15
BUILD_WEIGHTS = {
    "src0": 200,
    "src1": 150,
    "src2": 50,
    "src3": 100,
    "src4": 25,
}


def q138_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-corpus construction pipeline as ONE
    differentially-tested query: exact dedup (min-id survivor) ->
    Gopher-style quality gates -> per-source quota cap -> epoch-weight
    mixture. Every stage is an existing oracle-checked operator; this
    composes them end-to-end, which is how the engine is actually used
    — and the composed DuckDB oracle replays all four stages in one
    CTE chain. Injected duplicates (ids+10000) prove the dedup stage
    does real work; unlisted sources are dropped by the explicit mix.
    """
    from ..operators import textstats as TS

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    # aug feeds the dedup groupBy AND the survivor join-back; kept
    # feeds quality_features AND the gated join — materialize both
    # (invariant 7: twice-read intermediates)
    aug = docs.select("doc_id", "text", "source").unionByName(
        docs.where(F.col("doc_id") < 50).select(
            (F.col("doc_id") + 10000).alias("doc_id"), "text", "source"
        )
    ).localCheckpoint(eager=False)
    surv = D.exact_dedup(aug).select("doc_id")
    kept = aug.join(surv, on="doc_id").localCheckpoint(eager=False)
    gated = (
        C.quality_gates(TS.quality_features(kept))
        .where(F.col("passes"))
        .select("doc_id")
    )
    kept2 = kept.join(gated, on="doc_id").select("doc_id", "source")
    capped = C.source_quota(kept2, max_per_group=BUILD_QUOTA).select(
        "doc_id", "source"
    )
    return C.mixture_upsample(capped, BUILD_WEIGHTS).select(
        "doc_id", "source", F.col("epoch").cast("long").alias("epoch")
    )


def _corpus_build_oracle() -> str:
    from ..operators.curation import QUALITY_GATES
    from .catalog_northstar import _text_stats_oracle

    feats_sql = _text_stats_oracle().replace("FROM documents", "FROM kept")
    gate_where = " AND ".join(
        f"({feat} IS NOT NULL AND {feat} BETWEEN {lo} AND {hi})"
        for feat, (lo, hi) in sorted(QUALITY_GATES.items())
    )
    weights = ", ".join(
        f"('{s}', {w})" for s, w in sorted(BUILD_WEIGHTS.items())
    )
    return f"""
WITH aug AS (
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + 10000 AS doc_id, text, source
  FROM documents WHERE doc_id < 50),
surv AS (SELECT MIN(doc_id) AS doc_id FROM aug GROUP BY sha256(text)),
kept AS (SELECT a.doc_id, a.text, a.source
         FROM aug a JOIN surv USING (doc_id)),
feats AS ({feats_sql}),
gated AS (SELECT doc_id FROM feats WHERE {gate_where}),
kept2 AS (SELECT k.doc_id, k.source FROM kept k JOIN gated USING (doc_id)),
ranked AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5('quota:' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS rk
  FROM kept2),
capped AS (SELECT doc_id, source FROM ranked WHERE rk <= {BUILD_QUOTA}),
w(source, w_pct) AS (VALUES {weights}),
d AS (
  SELECT doc_id, c.source,
         w_pct // 100
         + CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                     % 100 < w_pct % 100
                THEN 1 ELSE 0 END AS n_epochs
  FROM capped c JOIN w USING (source))
SELECT doc_id, source,
       CAST(unnest(generate_series(1, n_epochs)) AS BIGINT) AS epoch
FROM d
"""


ORACLE_Q138 = _corpus_build_oracle()


# q139: per-user EWMA smoothing ----------------------------------------------

EWMA_ALPHA_PCT = 25


def q139_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average over the events
    stream (operators/temporal.py:ewma): the recursive smoother folded
    over each user's (ts, event_id)-sorted values — one shuffle, then
    array math; α=0.25 is an exact binary fraction so both engines
    fold identical doubles."""
    from ..operators.temporal import ewma

    events = load_tables(spark, sf_dir, ["events"])["events"]
    return ewma(events, alpha_pct=EWMA_ALPHA_PCT)


ORACLE_Q139 = f"""
WITH ev AS (
  SELECT user_id,
         {{'t': ts, 'o': event_id, 'v': CAST(value AS DOUBLE)}} AS e
  FROM events),
per AS (
  SELECT user_id, COUNT(*) AS n_events,
         list_sort(list(e)) AS arr
  FROM ev GROUP BY user_id),
vals AS (
  SELECT user_id, n_events,
         list_transform(arr, x -> x.v) AS vs
  FROM per)
SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
       round(list_reduce(vs, (acc, x) -> 0.25 * x + 0.75 * acc), 6)
         AS ewma
FROM vals
"""


def batch21_registry() -> list[QueryDef]:
    return [
        QueryDef("q129_incremental_minhash", q129_incremental_minhash, ORACLE_Q129, "new-batch MinHash dedup against stored history index"),
        QueryDef("q130_span_dedup", q130_span_dedup, ORACLE_Q130, "C4-style duplicated-span removal with text rebuild"),
        QueryDef("q131_retrieval_metrics", q131_retrieval_metrics, ORACLE_Q131, "MRR + NDCG@10 of IVF ANN vs exact"),
        QueryDef("q132_source_overlap", q132_source_overlap, ORACLE_Q132, "cross-source contamination matrix"),
        QueryDef("q133_source_quota", q133_source_quota, ORACLE_Q133, "per-source quota cap (domain balancing)"),
        QueryDef("q134_oov_rate", q134_oov_rate, ORACLE_Q134, "out-of-vocabulary rate vs top-N corpus vocabulary"),
        QueryDef("q135_semdedup", q135_semdedup, ORACLE_Q135, "SemDeDup: within-cell semantic dedup"),
        QueryDef("q136_incremental_topk", q136_incremental_topk, ORACLE_Q136, "incremental top-k merge vs full recompute"),
        QueryDef("q137_phrase_search", q137_phrase_search, ORACLE_Q137, "positional-postings exact phrase search"),
        QueryDef("q138_corpus_build", q138_corpus_build, ORACLE_Q138, "end-to-end corpus build: dedup->gates->quota->mixture"),
        QueryDef("q139_ewma", q139_ewma, ORACLE_Q139, "per-key EWMA via order-fixed array fold"),
    ]
