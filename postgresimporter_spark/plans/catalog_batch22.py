"""Batch 22: web-curation & tokenizer-training tier.

Net-new engine surface (the reference has no analytics): the front door
of a crawl-scale corpus build — URL canonicalization (q140), canonical
exact-URL dedup + per-domain quota capping (q141) — and BPE tokenizer
merge learning (q142), the iterative "big aggregation, tiny state"
job every LLM tokenizer starts from.

The fixture documents table has no URL column, so q140/q141 derive a
deterministic synthetic URL per document (scheme/WWW-casing/port/
tracking-param/fragment noise keyed off ``doc_id``) — the derivation is
part of the query and mirrored verbatim in the DuckDB oracle, so the
canonicalizer is differentially tested end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import urls as U
from ..operators import mining as M
from ..operators.bpe import encoded_tokens, learn_bpe, learn_bpe_merges
from ..operators.ranking import topk_per_key
from ..operators.textstats import tokens
from ..sources.parquet import load_tables
from .catalog import QueryDef

# ---------------------------------------------------------------------------
# Shared: deterministic synthetic URLs over documents
# ---------------------------------------------------------------------------


def _raw_urls(docs: DataFrame) -> DataFrame:
    """Synthesize one messy-but-deterministic URL per document.

    Covers every canonicalization rule: mixed-case scheme/host, www
    prefix, default and non-default ports, trailing slashes, tracking
    params, fragments, and two-label public suffixes.
    """
    d = F.col("doc_id")
    scheme_raw = F.when(d % 2 == 0, F.lit("HTTPS")).otherwise(F.lit("http"))
    www = F.when(d % 3 == 0, F.lit("WWW.")).otherwise(F.lit(""))
    hostbase = F.when(d % 5 == 0, F.upper("source")).otherwise(
        F.col("source")
    )
    tld = F.when(d % 4 == 0, F.lit("-site.co.uk")).otherwise(
        F.lit("-site.com")
    )
    port = (
        F.when((d % 2 == 0) & (d % 5 == 0), F.lit(":443"))
        .when(d % 7 == 0, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    path = F.concat(
        F.lit("/Docs/"),
        (d % 50).cast("string"),
        F.when(d % 3 == 1, F.lit("/")).otherwise(F.lit("")),
    )
    query = F.concat(
        F.lit("?utm_source=feed&id="),
        (d % 25).cast("string"),
        F.lit("&lang="),
        F.col("lang"),
        F.when(d % 6 == 0, F.lit("&fbclid=abc123")).otherwise(F.lit("")),
    )
    frag = F.when(d % 4 == 0, F.lit("#section-2")).otherwise(F.lit(""))
    return docs.select(
        "doc_id",
        "n_chars",
        F.concat(
            scheme_raw, F.lit("://"), www, hostbase, tld, port, path,
            query, frag,
        ).alias("raw_url"),
    )


RAW_URLS_SQL = """
SELECT doc_id, n_chars,
  (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'http' END) || '://' ||
  (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END) ||
  (CASE WHEN doc_id % 5 = 0 THEN upper(source) ELSE source END) ||
  (CASE WHEN doc_id % 4 = 0 THEN '-site.co.uk'
        ELSE '-site.com' END) ||
  (CASE WHEN doc_id % 2 = 0 AND doc_id % 5 = 0 THEN ':443'
        WHEN doc_id % 7 = 0 THEN ':8080' ELSE '' END) ||
  '/Docs/' || CAST(doc_id % 50 AS VARCHAR) ||
  (CASE WHEN doc_id % 3 = 1 THEN '/' ELSE '' END) ||
  '?utm_source=feed&id=' || CAST(doc_id % 25 AS VARCHAR) ||
  '&lang=' || lang ||
  (CASE WHEN doc_id % 6 = 0 THEN '&fbclid=abc123' ELSE '' END) ||
  (CASE WHEN doc_id % 4 = 0 THEN '#section-2' ELSE '' END) AS raw_url
FROM documents
"""

# Canonicalization CTE mirroring functions/urls.py rule-for-rule.
CANON_SQL = f"""
raw AS ({RAW_URLS_SQL}),
parsed AS (
  SELECT doc_id, n_chars, raw_url,
    lower(regexp_extract(raw_url, '^([a-zA-Z]+)://', 1)) AS scheme,
    regexp_extract(raw_url, '^[a-zA-Z]+://([^/?#]*)', 1) AS auth,
    regexp_extract(raw_url, '^[a-zA-Z]+://[^/?#]*([^?#]*)', 1)
      AS rawpath,
    regexp_extract(regexp_replace(raw_url, '#.*', ''),
                   '\\?([^#]*)', 1) AS rawq
  FROM raw),
hosted AS (
  SELECT *,
    regexp_replace(regexp_replace(lower(auth), ':[0-9]+$', ''),
                   '^www\\.', '') AS host,
    regexp_extract(auth, ':([0-9]+)$', 1) AS port,
    CASE WHEN rawpath = '' THEN '/' ELSE rawpath END AS p0
  FROM parsed),
pathed AS (
  SELECT *,
    CASE WHEN regexp_replace(p0, '/+$', '') = '' THEN '/'
         ELSE regexp_replace(p0, '/+$', '') END AS path,
    list_sort(list_filter(
      list_filter(string_split(rawq, '&'), x -> x != ''),
      kv -> NOT regexp_matches(string_split(kv, '=')[1],
                               '^(utm_[a-z]+|fbclid|gclid)$')))
      AS params
  FROM hosted),
canon AS (
  SELECT doc_id, n_chars, raw_url, scheme, host, port, path, params,
    scheme || '://' || host ||
    (CASE WHEN port = ''
               OR (scheme = 'http' AND port = '80')
               OR (scheme = 'https' AND port = '443')
          THEN '' ELSE ':' || port END) ||
    path ||
    (CASE WHEN len(params) > 0
          THEN '?' || array_to_string(params, '&') ELSE '' END)
      AS canonical_url,
    CASE WHEN (host LIKE '%.co.uk' OR host LIKE '%.com.au'
               OR host LIKE '%.co.jp')
              AND len(string_split(host, '.')) >= 3
         THEN array_to_string(list_slice(string_split(host, '.'),
                len(string_split(host, '.')) - 2,
                len(string_split(host, '.'))), '.')
         ELSE array_to_string(list_slice(string_split(host, '.'),
                len(string_split(host, '.')) - 1,
                len(string_split(host, '.'))), '.')
    END AS registered_domain
  FROM pathed)
"""


# q140: URL canonicalization ---------------------------------------------------


def q140_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalize crawl URLs with pure Catalyst expressions
    (functions/urls.py): lowercase scheme+host, strip www/default
    ports/fragments/tracking params, sort surviving params, trim
    trailing slashes, derive the registered domain.  Zero shuffles —
    the whole thing is one codegen'd projection over the scan, the
    right shape for the first stage of a 100 TB crawl ingest."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    canon = U.with_canonical(_raw_urls(docs), "raw_url")
    return (
        canon.where(F.col("doc_id") < 60)
        .select(
            "doc_id",
            "raw_url",
            "canonical_url",
            "host",
            "registered_domain",
            F.size("params").cast("long").alias("n_params"),
        )
        .orderBy("doc_id")
    )


ORACLE_Q140 = f"""
WITH {CANON_SQL}
SELECT doc_id, raw_url, canonical_url, host, registered_domain,
       CAST(len(params) AS BIGINT) AS n_params
FROM canon
WHERE doc_id < 60
ORDER BY doc_id
"""


# q141: canonical-URL dedup + per-domain quota --------------------------------

DOMAIN_CAP = 5


def q141_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-corpus admission control: exact dedup on canonical URL
    (keep lowest doc_id), then cap each registered domain at
    DOMAIN_CAP documents preferring longer ones (n_chars desc, doc_id
    tiebreak).  Both windows partition on bounded keys (canonical URL,
    domain) — no global window — so the plan scales with the number of
    domains, and the per-domain cap is itself the skew guard: a
    crawler trap emitting millions of URLs under one domain
    contributes at most DOMAIN_CAP documents."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    canon = U.with_canonical(_raw_urls(docs), "raw_url")
    w_url = Window.partitionBy("canonical_url").orderBy("doc_id")
    uniq = (
        canon.withColumn("rn", F.row_number().over(w_url))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    # salted 2-phase per-key top-k: a crawler-trap domain's rows sort
    # across 8 tasks in phase 1 instead of one (ranking.topk_per_key)
    kept = topk_per_key(
        uniq,
        key_cols=["registered_domain"],
        order_cols=[F.desc("n_chars"), F.asc("doc_id")],
        k=DOMAIN_CAP,
        salt_buckets=8,
        salt_on=["doc_id"],
    )
    tot = canon.groupBy("registered_domain").agg(
        F.count("*").alias("n_docs")
    )
    nuniq = uniq.groupBy("registered_domain").agg(
        F.count("*").alias("n_unique")
    )
    nkept = kept.groupBy("registered_domain").agg(
        F.count("*").alias("n_kept")
    )
    return (
        tot.join(nuniq, "registered_domain")
        .join(nkept, "registered_domain")
        .orderBy("registered_domain")
    )


ORACLE_Q141 = f"""
WITH {CANON_SQL},
uniq AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY canonical_url
                                 ORDER BY doc_id) AS rn
    FROM canon) WHERE rn = 1),
capped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY registered_domain
                                 ORDER BY n_chars DESC, doc_id) AS rk
    FROM uniq) WHERE rk <= {DOMAIN_CAP}),
tot AS (SELECT registered_domain, COUNT(*) AS n_docs
        FROM canon GROUP BY 1),
u AS (SELECT registered_domain, COUNT(*) AS n_unique
      FROM uniq GROUP BY 1),
k AS (SELECT registered_domain, COUNT(*) AS n_kept
      FROM capped GROUP BY 1)
SELECT registered_domain, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_unique AS BIGINT) AS n_unique,
       CAST(n_kept AS BIGINT) AS n_kept
FROM tot JOIN u USING (registered_domain) JOIN k USING (registered_domain)
ORDER BY registered_domain
"""


# q142: BPE merge learning -----------------------------------------------------

BPE_ROUNDS = 6


def q142_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first BPE_ROUNDS BPE merges from the corpus word
    frequencies (operators/bpe.py).  One corpus-scale shuffle builds
    the vocabulary; every round after that is vocabulary-sized with a
    single argmax row collected per round — k-means-style metadata
    collects, not data collects."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    vocab = (
        docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    return learn_bpe_merges(vocab, rounds=BPE_ROUNDS)


def _bpe_oracle(rounds: int, final_select: str | None = None) -> str:
    """Unrolled DuckDB mirror of learn_bpe_merges: fixed rounds, no
    recursion — each round is (pair count → argmax → replace-merge).
    ``final_select`` overrides the default merge-table output (used by
    q144 to read the post-merge vocabulary ``v{rounds+1}``)."""
    sep = "chr(31)"
    sep2 = f"{sep}||{sep}"
    ctes = [
        "toks AS (SELECT list_filter(string_split_regex(trim(text),"
        " '\\s+'), t -> t != '') AS arr FROM documents)",
        "tw AS (SELECT unnest(arr) AS word FROM toks)",
        "vocab AS (SELECT word, COUNT(*) AS freq FROM tw GROUP BY word)",
        f"v1 AS (SELECT freq, {sep} || array_to_string("
        f"list_concat(regexp_extract_all(replace(word, {sep}, ''), '.'),"
        f" ['</w>']), {sep2}) || {sep} AS s FROM vocab)",
    ]
    for k in range(1, rounds + 1):
        ctes.append(
            f"e{k} AS (SELECT freq, syms, unnest(generate_series(1,"
            f" len(syms) - 1)) AS i FROM (SELECT freq, string_split("
            f"substr(s, 2, length(s) - 2), {sep2}) AS syms FROM v{k}))"
        )
        ctes.append(
            f"m{k} AS (SELECT syms[i] AS l, syms[i + 1] AS r,"
            f" SUM(freq) AS c FROM e{k} GROUP BY 1, 2"
            f" ORDER BY c DESC, l, r LIMIT 1)"
        )
        ctes.append(
            f"v{k + 1} AS (SELECT freq, replace(s,"
            f" {sep}||l||{sep2}||r||{sep}, {sep}||l||r||{sep}) AS s"
            f" FROM v{k} CROSS JOIN m{k})"
        )
    if final_select is not None:
        return "WITH " + ",\n".join(ctes) + "\n" + final_select
    selects = [
        f"SELECT CAST({k} AS BIGINT) AS merge_round, l AS merge_left,"
        f" r AS merge_right, CAST(c AS BIGINT) AS pair_count FROM m{k}"
        for k in range(1, rounds + 1)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


ORACLE_Q142 = _bpe_oracle(BPE_ROUNDS)


# q143: DSIR importance weights ------------------------------------------------

DSIR_TARGET_SOURCES = ("src0", "src1", "src2", "src3")
DSIR_TOP = 25


def q143_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data selection via importance resampling (operators/mining.py
    dsir_importance): add-1-smoothed unigram LMs for a target domain
    (four sources) vs the whole corpus; each document scored by the
    summed per-token log-ratio; top DSIR_TOP selected.  Both LMs come
    from ONE token aggregation; per-token logs round at 9 digits so the
    distributed float sum is engine-portable."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    scored = M.dsir_importance(
        docs, F.col("source").isin(*DSIR_TARGET_SOURCES)
    )
    return scored.orderBy(F.desc("dsir_weight"), "doc_id").limit(DSIR_TOP)


ORACLE_Q143 = f"""
WITH ex AS (
  SELECT doc_id,
         CASE WHEN source IN {DSIR_TARGET_SOURCES} THEN 1 ELSE 0 END
           AS tgt,
         unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                            t -> t != '')) AS t
  FROM documents),
counts AS (SELECT t, COUNT(*) AS c_all, SUM(tgt) AS c_tgt
           FROM ex GROUP BY t),
totals AS (SELECT SUM(c_all) AS n_all, SUM(c_tgt) AS n_tgt,
                  COUNT(*) AS v FROM counts),
scored AS (
  SELECT doc_id, COUNT(*) AS n_tokens,
         SUM(round(ln((c_tgt + 1) / CAST(n_tgt + v AS DOUBLE))
                   - ln((c_all + 1) / CAST(n_all + v AS DOUBLE)), 9))
           AS w
  FROM ex JOIN counts USING (t) CROSS JOIN totals
  GROUP BY doc_id)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       round(w, 6) AS dsir_weight
FROM scored
ORDER BY dsir_weight DESC, doc_id
LIMIT {DSIR_TOP}
"""


# q144: encode the corpus with the learned BPE tokenizer ----------------------

BPE_TOP_TOKENS = 20


def q144_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the q142-trained tokenizer: the post-merge vocabulary's
    wrapped symbol strings explode into the corpus token-frequency
    table; top BPE_TOP_TOKENS reported.  Train + encode stays
    vocabulary-sized after the single corpus word-count shuffle."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    vocab = (
        docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    _, final_vocab = learn_bpe(vocab, rounds=BPE_ROUNDS)
    return (
        encoded_tokens(final_vocab)
        .orderBy(F.desc("n_occurrences"), "token")
        .limit(BPE_TOP_TOKENS)
    )


ORACLE_Q144 = _bpe_oracle(
    BPE_ROUNDS,
    final_select=f"""
SELECT token, CAST(SUM(freq) AS BIGINT) AS n_occurrences FROM (
  SELECT freq,
         unnest(string_split(substr(s, 2, length(s) - 2),
                             chr(31)||chr(31))) AS token
  FROM v{BPE_ROUNDS + 1})
GROUP BY token
ORDER BY n_occurrences DESC, token
LIMIT {BPE_TOP_TOKENS}
""",
)


# q145: maximal duplicated span extents (exact-substring dedup audit) --------


def q145_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup audit (curation.duplicate_span_extents):
    maximal extents of text shared verbatim across >= 10 documents,
    merged gaps-and-islands style from duplicated 5-gram starts.  Same
    injected-boilerplate fixture as q130 so both views of the operator
    (audit here, rewrite there) are differentially tested on one
    corpus.  The island window partitions per document — bounded state,
    never global."""
    from ..operators import curation as C
    from .catalog_batch21 import _SPAN_BOILER, SPAN, SPAN_MIN_DOCS

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
    return C.duplicate_span_extents(
        marked, span=SPAN, min_docs=SPAN_MIN_DOCS
    ).orderBy("id", "span_start")


def _oracle_q145() -> str:
    from .catalog_batch21 import _SPAN_BOILER, SPAN, SPAN_MIN_DOCS

    return f"""
WITH marked AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN '{_SPAN_BOILER}' || text
              ELSE text END AS text
  FROM documents),
toks AS (SELECT doc_id AS id, string_split_regex(trim(text), '\\s+') AS arr
         FROM marked),
starts AS (
  SELECT id, arr, unnest(generate_series(0, len(arr) - {SPAN})) AS start
  FROM toks WHERE len(arr) >= {SPAN}),
grams AS (
  SELECT id, start,
         array_to_string(list_slice(arr, start + 1, start + {SPAN}), ' ')
           AS gram
  FROM starts),
dup AS (
  SELECT gram FROM grams GROUP BY gram
  HAVING COUNT(DISTINCT id) >= {SPAN_MIN_DOCS}),
ds AS (SELECT id, start FROM grams JOIN dup USING (gram)),
flagged AS (
  SELECT id, start,
         CASE WHEN lag(start) OVER (PARTITION BY id ORDER BY start)
                     IS NULL
                OR start > lag(start)
                     OVER (PARTITION BY id ORDER BY start) + {SPAN}
              THEN 1 ELSE 0 END AS new_island
  FROM ds),
islands AS (
  SELECT id, start,
         SUM(new_island) OVER (PARTITION BY id ORDER BY start
                               ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged)
SELECT id, CAST(MIN(start) AS BIGINT) AS span_start,
       CAST(MAX(start) - MIN(start) + {SPAN} AS BIGINT) AS span_len,
       CAST(COUNT(*) AS BIGINT) AS n_grams
FROM islands GROUP BY id, island
ORDER BY id, span_start
"""


# q146/q147: product quantization ---------------------------------------------

PQ_M = 4
PQ_K = 8
PQ_ITERS = 2
EMB_DIM = 64
PQ_PROBES = 5
PQ_TOPK = 10


def q146_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization (quantize.pq_train_encode): each 64-dim
    embedding compresses to 4 subspace codes via per-subspace
    deterministic k-means.  The oracle unrolls all four independent
    training chains (2 Lloyd iterations each), so the full codebook
    training — not just encoding — is differentially tested."""
    from ..operators.quantize import pq_train_encode

    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    codes, _ = pq_train_encode(
        emb, dim=EMB_DIM, m=PQ_M, k=PQ_K, iters=PQ_ITERS
    )
    return codes.orderBy("vec_id", "subspace")


def _pq_chain_sql(s: int) -> str:
    """One subspace's sliced vectors + 2-iteration k-means chain,
    reusing the q91 CTE builders (catalog_batch8)."""
    from .catalog_batch8 import _km_assign_cte, _km_update_cte

    sub = EMB_DIM // PQ_M
    lo, hi = s * sub + 1, (s + 1) * sub
    return f"""q_{s} AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[], x -> round(x, 6))[{lo}:{hi}]
           AS v
  FROM embeddings),
c0_{s} AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
  FROM (SELECT vec_id, v FROM q_{s} ORDER BY vec_id LIMIT {PQ_K})),
{_km_assign_cte(f'q_{s}', f'c0_{s}', f'a1_{s}')},
{_km_update_cte(f'a1_{s}', f'c0_{s}', f'c1_{s}')},
{_km_assign_cte(f'q_{s}', f'c1_{s}', f'a2_{s}')},
{_km_update_cte(f'a2_{s}', f'c1_{s}', f'c2_{s}')},
{_km_assign_cte(f'q_{s}', f'c2_{s}', f'a3_{s}')}"""


def _pq_codes_sql() -> str:
    selects = [
        f"SELECT vec_id, CAST({s} AS BIGINT) AS subspace,"
        f" CAST(cid AS BIGINT) AS code FROM a3_{s}"
        for s in range(PQ_M)
    ]
    return "\nUNION ALL\n".join(selects)


def _oracle_q146() -> str:
    chains = ",\n".join(_pq_chain_sql(s) for s in range(PQ_M))
    return (
        "WITH " + chains + ",\ncodes AS (" + _pq_codes_sql() + ")\n"
        "SELECT * FROM codes ORDER BY vec_id, subspace"
    )


def q147_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC search over the PQ codes: per probe, approximate distance is
    the sum of per-subspace lookup-table entries joined on
    (subspace, code) — the corpus is touched only through its codes.
    Lookup table is |probes|*m*k driver-side metadata, broadcast."""
    from ..operators.quantize import (
        pq_adc_lookup,
        pq_adc_topk,
        pq_train_encode,
    )

    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    codes, books = pq_train_encode(
        emb, dim=EMB_DIM, m=PQ_M, k=PQ_K, iters=PQ_ITERS
    )
    probe_rows = (
        emb.where(F.col("vec_id") < PQ_PROBES)
        .select(
            "vec_id",
            F.transform(
                F.col("embedding").cast("array<double>"),
                lambda x: F.round(x, 6),
            ).alias("v"),
        )
        .orderBy("vec_id")
        .collect()
    )
    probes = [(int(r["vec_id"]), list(r["v"])) for r in probe_rows]
    lookup = spark.createDataFrame(
        pq_adc_lookup(probes, books),
        "probe_id long, subspace long, code long, pdist double",
    )
    return pq_adc_topk(codes, lookup, topk=PQ_TOPK).orderBy(
        "probe_id", "rank"
    )


def _oracle_q147() -> str:
    from .catalog_batch8 import _KM_DIST

    chains = ",\n".join(_pq_chain_sql(s) for s in range(PQ_M))
    d = _KM_DIST.format(v="pq.v", c="c.cv")
    lks = "\nUNION ALL\n".join(
        f"SELECT pq.vec_id AS probe_id, CAST({s} AS BIGINT) AS subspace,"
        f" CAST(c.cid AS BIGINT) AS code, {d} AS pdist"
        f" FROM q_{s} pq CROSS JOIN c2_{s} c WHERE pq.vec_id < {PQ_PROBES}"
        for s in range(PQ_M)
    )
    return f"""WITH {chains},
codes AS ({_pq_codes_sql()}),
lk AS ({lks}),
joined AS (
  SELECT lk.probe_id, codes.vec_id, lk.pdist
  FROM codes JOIN lk
    ON codes.subspace = lk.subspace AND codes.code = lk.code),
adc AS (
  SELECT probe_id, vec_id, round(SUM(pdist), 6) AS adc
  FROM joined GROUP BY 1, 2),
ranked AS (
  SELECT probe_id, vec_id, adc,
         ROW_NUMBER() OVER (PARTITION BY probe_id
                            ORDER BY adc, vec_id) AS rank
  FROM adc)
SELECT probe_id, CAST(rank AS BIGINT) AS rank, vec_id, adc
FROM ranked WHERE rank <= {PQ_TOPK}
ORDER BY probe_id, rank
"""


# q148: PQ recall audit --------------------------------------------------------


def q148_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The honest way to ship PQ (same rule as q97's ANN recall and
    q125's LSH audit): per probe, how many of the exact L2 top-k
    survive in the ADC top-k.  Exact side is a broadcast
    probes × corpus distance with the corpus never shuffling; ADC side
    is the q147 path."""
    from ..operators.quantize import (
        pq_adc_lookup,
        pq_adc_topk,
        pq_train_encode,
    )

    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    rounded = emb.select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.round(x, 6),
        ).alias("v"),
    )
    codes, books = pq_train_encode(
        emb, dim=EMB_DIM, m=PQ_M, k=PQ_K, iters=PQ_ITERS
    )
    probe_rows = (
        rounded.where(F.col("vec_id") < PQ_PROBES).orderBy("vec_id").collect()
    )
    probes = [(int(r["vec_id"]), list(r["v"])) for r in probe_rows]
    lookup = spark.createDataFrame(
        pq_adc_lookup(probes, books),
        "probe_id long, subspace long, code long, pdist double",
    )
    adc_top = pq_adc_topk(codes, lookup, topk=PQ_TOPK).select(
        "probe_id", "vec_id"
    )

    probes_df = spark.createDataFrame(
        probes, "probe_id long, pv array<double>"
    )
    from pyspark.sql import Window

    dist = F.aggregate(
        F.zip_with("v", "pv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("probe_id").orderBy("d", "vec_id")
    exact_top = (
        rounded.crossJoin(F.broadcast(probes_df))
        .select("probe_id", "vec_id", dist.alias("d"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= PQ_TOPK)
        .select("probe_id", "vec_id")
    )
    caught = exact_top.join(adc_top, on=["probe_id", "vec_id"]).groupBy(
        "probe_id"
    ).agg(F.count("*").cast("long").alias("n_caught"))
    return (
        exact_top.select("probe_id")
        .distinct()
        .join(caught, "probe_id", "left")
        .select(
            "probe_id",
            F.coalesce("n_caught", F.lit(0)).cast("long").alias("n_caught"),
            F.round(
                F.coalesce("n_caught", F.lit(0)) / F.lit(float(PQ_TOPK)), 6
            ).alias("recall"),
        )
        .orderBy("probe_id")
    )


def _oracle_q148() -> str:
    from .catalog_batch8 import _KM_DIST

    chains = ",\n".join(_pq_chain_sql(s) for s in range(PQ_M))
    d_lk = _KM_DIST.format(v="pq.v", c="c.cv")
    lks = "\nUNION ALL\n".join(
        f"SELECT pq.vec_id AS probe_id, CAST({s} AS BIGINT) AS subspace,"
        f" CAST(c.cid AS BIGINT) AS code, {d_lk} AS pdist"
        f" FROM q_{s} pq CROSS JOIN c2_{s} c WHERE pq.vec_id < {PQ_PROBES}"
        for s in range(PQ_M)
    )
    d_ex = _KM_DIST.format(v="r.v", c="p.v")
    return f"""WITH {chains},
rv AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[], x -> round(x, 6)) AS v
  FROM embeddings),
codes AS ({_pq_codes_sql()}),
lk AS ({lks}),
adc AS (
  SELECT lk.probe_id, codes.vec_id, round(SUM(lk.pdist), 6) AS adc
  FROM codes JOIN lk
    ON codes.subspace = lk.subspace AND codes.code = lk.code
  GROUP BY 1, 2),
adc_top AS (
  SELECT probe_id, vec_id FROM (
    SELECT probe_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY probe_id
                              ORDER BY adc, vec_id) AS rn
    FROM adc) WHERE rn <= {PQ_TOPK}),
exact_top AS (
  SELECT probe_id, vec_id FROM (
    SELECT p.vec_id AS probe_id, r.vec_id, {d_ex} AS d,
           ROW_NUMBER() OVER (PARTITION BY p.vec_id
                              ORDER BY {d_ex}, r.vec_id) AS rn
    FROM rv r CROSS JOIN (SELECT * FROM rv WHERE vec_id < {PQ_PROBES}) p)
  WHERE rn <= {PQ_TOPK}),
caught AS (
  SELECT e.probe_id, COUNT(a.vec_id) AS n_caught
  FROM exact_top e
  LEFT JOIN adc_top a
    ON e.probe_id = a.probe_id AND e.vec_id = a.vec_id
  GROUP BY 1)
SELECT probe_id, CAST(n_caught AS BIGINT) AS n_caught,
       round(n_caught / {float(PQ_TOPK)}, 6) AS recall
FROM caught
ORDER BY probe_id
"""


# q149: PSI distribution drift -------------------------------------------------

PSI_WIDTH = 50000.0
PSI_BINS = 10
PSI_BASE_YEAR = 1997


def q149_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between order-value distributions of
    the early snapshot (orders through PSI_BASE_YEAR=1997) and the rest
    (operators/drift.py).  One pass, one groupBy(bin), Laplace-smoothed
    shares, one ln per bin — the standard production drift monitor,
    fully oracle-mirrored."""
    from ..operators.drift import psi_report

    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    return psi_report(
        orders,
        value_col="o_totalprice",
        is_baseline=F.year("o_orderdate") <= PSI_BASE_YEAR,
        width=PSI_WIDTH,
        n_bins=PSI_BINS,
    )


ORACLE_Q149 = f"""
WITH binned AS (
  SELECT LEAST(GREATEST(CAST(FLOOR(o_totalprice / {PSI_WIDTH}) AS BIGINT),
                        0), {PSI_BINS - 1}) AS bin,
         CASE WHEN year(o_orderdate) <= {PSI_BASE_YEAR} THEN 1 ELSE 0 END
           AS b
  FROM orders),
counts AS (
  SELECT bin, SUM(b) AS n_base, SUM(1 - b) AS n_curr
  FROM binned GROUP BY bin),
tot AS (SELECT SUM(n_base) AS nb, SUM(n_curr) AS nc FROM counts)
SELECT bin, CAST(n_base AS BIGINT) AS n_base,
       CAST(n_curr AS BIGINT) AS n_curr,
       round(((n_base + 1) / CAST(nb + {PSI_BINS} AS DOUBLE)
              - (n_curr + 1) / CAST(nc + {PSI_BINS} AS DOUBLE))
             * (ln((n_base + 1) / CAST(nb + {PSI_BINS} AS DOUBLE))
                - ln((n_curr + 1) / CAST(nc + {PSI_BINS} AS DOUBLE))), 6)
         AS psi_term
FROM counts CROSS JOIN tot
ORDER BY bin
"""


def batch22_registry() -> list[QueryDef]:
    return [
        QueryDef(
            "q140_url_canonicalize", q140_url_canonicalize, ORACLE_Q140,
            "crawl URL canonicalization (pure Catalyst, zero-shuffle)",
        ),
        QueryDef(
            "q141_domain_quota", q141_domain_quota, ORACLE_Q141,
            "canonical-URL dedup + per-domain quota cap",
        ),
        QueryDef(
            "q142_bpe_merges", q142_bpe_merges, ORACLE_Q142,
            "BPE tokenizer merge learning (6 rounds, argmax-only collects)",
        ),
        QueryDef(
            "q143_dsir_select", q143_dsir_select, ORACLE_Q143,
            "DSIR importance resampling: target-vs-corpus unigram LMs",
        ),
        QueryDef(
            "q144_bpe_encode", q144_bpe_encode, ORACLE_Q144,
            "corpus token frequencies under the learned BPE tokenizer",
        ),
        QueryDef(
            "q145_duplicate_spans", q145_duplicate_spans, _oracle_q145(),
            "maximal duplicated span extents (gaps-and-islands audit)",
        ),
        QueryDef(
            "q146_pq_encode", q146_pq_encode, _oracle_q146(),
            "product quantization: 4-subspace codebook training + encode",
        ),
        QueryDef(
            "q147_pq_adc_topk", q147_pq_adc_topk, _oracle_q147(),
            "PQ asymmetric-distance top-k over codes (lookup-table join)",
        ),
        QueryDef(
            "q148_pq_recall", q148_pq_recall, _oracle_q148(),
            "PQ recall@k vs exact L2 (the honest-ANN audit)",
        ),
        QueryDef(
            "q149_psi_drift", q149_psi_drift, ORACLE_Q149,
            "PSI distribution drift between snapshots (per-bin terms)",
        ),
    ]
