"""Batch 49: readability scoring, truncated-dimension recall, RFM
segmentation, and degree assortativity.

- q244 Flesch reading ease — the classic readability quality gate:
  word/sentence/vowel-group counts are exact integers from three
  regexp passes (identical simple character classes on both regex
  engines), the Flesch formula is the one double per document. A
  standard pretraining-corpus quality feature next to q29/q96.
- q245 truncated-dim recall — the Matryoshka diagnostic: recall@10
  of 8-dim-prefix cosine against full-dim cosine per probe, both
  rankings micro-rounded before the per-probe top-k window
  (partitioned — never global). Completes the approx-ANN audit
  family (q97 IVF, q125 LSH, q148 PQ) with dimension truncation.
- q246 RFM segmentation — recency/frequency/monetary quintiles per
  customer with the segment rollup: quintiles come from global ranks
  via the distributed prefix pass (NO ntile window, no single
  reducer), quintile = ceil(5·rank/N) — exact integers end to end;
  monetary stays in cents. The classic customer-value cube.
- q247 degree assortativity — Pearson correlation of endpoint
  degrees over the symmetric co-purchase edge list: sufficient
  statistics are exact longs (batch 46's OLS-terms helper does the
  DECIMAL cross-products), one double at the end. The
  hub-connects-to-hub? network diagnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import degrees
from ..operators.ranking import global_running_sum, topk_per_key
from ..sources.parquet import load_tables
from .catalog import QueryDef
from .catalog_batch18 import _EDGES_SQL, _edges
from .catalog_batch46 import _ols_terms

# ---------------------------------------------------------------------------
# q244: Flesch reading ease
# ---------------------------------------------------------------------------


def q244_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """206.835 − 1.015·(words/sentences) − 84.6·(syllables/words),
    with vowel-group syllable approximation and sentence count floored
    at 1. Three scan-local regexp counts, zero shuffles before the
    final (tiny) projection; the score is one rounded double."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    words = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(r"[^\s]+"), 0)
    ).cast("long")
    sentences = F.greatest(
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(r"[.!?]+"), 0)
        ).cast("long"),
        F.lit(1).cast("long"),
    )
    syllables = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[aeiouy]+"), 0)
    ).cast("long")
    d = lambda c: c.cast("double")  # noqa: E731
    base = docs.select(
        "doc_id",
        words.alias("n_words"),
        sentences.alias("n_sentences"),
        syllables.alias("n_syllables"),
    ).where(F.col("n_words") > 0)
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (d(F.col("n_words")) / d(F.col("n_sentences")))
        - F.lit(84.6) * (d(F.col("n_syllables")) / d(F.col("n_words")))
    )
    return base.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        (F.round(flesch, 4) + F.lit(0.0)).alias("flesch"),
    ).orderBy("doc_id")


ORACLE_Q244 = r"""
WITH base AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '[^\s]+')) AS BIGINT) AS n_words,
         CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
           AS n_sentences,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
           AS n_syllables
  FROM documents)
SELECT doc_id, n_words, n_sentences, n_syllables,
       round(206.835
             - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
             - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 4) + 0.0
         AS flesch
FROM base WHERE n_words > 0
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# q245: truncated-dimension (Matryoshka) recall
# ---------------------------------------------------------------------------

_TD_PROBES = 20
_TD_K = 10
_TD_DIMS = 8


def _sim_micro(vec_col, probe_col, dims: int | None = None):
    v = F.slice(vec_col, 1, dims) if dims else vec_col
    p = F.slice(probe_col, 1, dims) if dims else probe_col
    dot = F.aggregate(
        F.zip_with(v, p, lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sq = lambda c: F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.round(dot / F.sqrt(sq(v) * sq(p)) * 1e6, 0).cast("long")


def q245_truncated_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@10 of 8-dim-prefix cosine vs full-dim cosine, per probe
    (vec_id < 20) over the rest of the corpus. Both rankings round to
    micro longs before their per-probe top-k windows (partitioned by
    probe); the overlap is an equi-join of two bounded top-k sets.
    Probes broadcast; the corpus never self-joins."""
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    probes = emb.where(F.col("vec_id") < _TD_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("p_emb")
    )
    corpus = emb.where(F.col("vec_id") >= _TD_PROBES)
    # checkpoint: the scored table feeds BOTH top-k rankings and the
    # overlap join — without it the probe cross-join and the two
    # 64-dim similarity folds re-execute once per consumer (3x)
    scored = corpus.crossJoin(F.broadcast(probes)).select(
        "probe_id",
        "vec_id",
        _sim_micro(F.col("embedding"), F.col("p_emb")).alias("sim_full"),
        _sim_micro(F.col("embedding"), F.col("p_emb"), _TD_DIMS).alias(
            "sim_trunc"
        ),
    ).localCheckpoint(eager=False)

    def top(col):
        return topk_per_key(
            scored,
            ["probe_id"],
            [F.desc(col), F.asc("vec_id")],
            k=_TD_K,
        ).select("probe_id", "vec_id")

    full, trunc = top("sim_full"), top("sim_trunc")
    hits = full.join(trunc, on=["probe_id", "vec_id"]).groupBy(
        "probe_id"
    ).agg(F.count("*").cast("long").alias("n_hits"))
    return (
        full.groupBy("probe_id")
        .agg(F.count("*").cast("long").alias("k"))
        .join(hits, on="probe_id", how="left")
        .select(
            "probe_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias(
                "n_hits"
            ),
            (
                F.round(
                    F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
                    / F.col("k").cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("recall_at_10"),
        )
        .orderBy("probe_id")
    )


_TD_SIM_SQL = """
  CAST(round(
    list_reduce(list_prepend(0.0, list_transform(
      list_zip({v}, {p}),
      q -> CAST(q[1] AS DOUBLE) * CAST(q[2] AS DOUBLE))),
      (a, x) -> a + x)
    / sqrt(
        list_reduce(list_prepend(0.0, list_transform({v},
          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, x) -> a + x)
        * list_reduce(list_prepend(0.0, list_transform({p},
          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, x) -> a + x))
    * 1e6, 0) AS BIGINT)
"""

ORACLE_Q245 = f"""
WITH probes AS (
  SELECT vec_id AS probe_id, embedding AS p_emb FROM embeddings
  WHERE vec_id < {_TD_PROBES}),
scored AS (
  SELECT probe_id, vec_id,
         {_TD_SIM_SQL.format(v="embedding", p="p_emb")} AS sim_full,
         {_TD_SIM_SQL.format(v=f"embedding[1:{_TD_DIMS}]",
                             p=f"p_emb[1:{_TD_DIMS}]")} AS sim_trunc
  FROM embeddings, probes WHERE vec_id >= {_TD_PROBES}),
tf AS (
  SELECT probe_id, vec_id FROM (
    SELECT probe_id, vec_id, ROW_NUMBER() OVER
      (PARTITION BY probe_id ORDER BY sim_full DESC, vec_id) AS rk
    FROM scored) WHERE rk <= {_TD_K}),
tt AS (
  SELECT probe_id, vec_id FROM (
    SELECT probe_id, vec_id, ROW_NUMBER() OVER
      (PARTITION BY probe_id ORDER BY sim_trunc DESC, vec_id) AS rk
    FROM scored) WHERE rk <= {_TD_K}),
hits AS (
  SELECT probe_id, CAST(COUNT(*) AS BIGINT) AS n_hits
  FROM tf JOIN tt USING (probe_id, vec_id) GROUP BY probe_id)
SELECT probe_id,
       CAST(COALESCE(n_hits, 0) AS BIGINT) AS n_hits,
       round(CAST(COALESCE(n_hits, 0) AS DOUBLE) / k, 6) + 0.0
         AS recall_at_10
FROM (SELECT probe_id, CAST(COUNT(*) AS BIGINT) AS k FROM tf
      GROUP BY probe_id)
LEFT JOIN hits USING (probe_id)
ORDER BY probe_id
"""


# ---------------------------------------------------------------------------
# q246: RFM segmentation
# ---------------------------------------------------------------------------


def q246_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer recency/frequency/monetary quintiles and the segment
    rollup. All three metrics rank in ONE distributed prefix pass
    (``global_running_sum`` — range partition + broadcast offsets, no
    ntile window, no single reducer): the per-customer row melts into
    three (metric, sort-key) rows ordered (metric, key, customer), so
    each metric occupies one contiguous rank block of exactly N rows
    and its local rank is ``global_rank − metric·N`` — exact integers,
    identical cuts to the original three sequential passes (descending
    metrics negate their key; ties break on the customer key either
    way). Measured at sf0.1 (quiet machine, min-of-4): 2.77s → 1.53s
    by replacing two of the three sequential range-partition +
    checkpoint rounds with a single 3N-row pass plus one pivot-back
    aggregation.
    Output: one row per RFM segment with size and monetary totals in
    exact cents."""
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    end = o.agg(F.max(F.to_date("o_orderdate")).alias("_end"))
    cents = F.expr("CAST(round(o_totalprice * 100, 0) AS DECIMAL(20,0))").cast(
        "long"
    )
    per = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("last_order"),
            F.count("*").cast("long").alias("frequency"),
            F.sum(cents).cast("long").alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(end))
        .select(
            "o_custkey",
            F.datediff(F.col("_end"), F.col("last_order"))
            .cast("long")
            .alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )

    # melt: metric 0 = recency (smaller is better -> ascending key),
    # 1 = frequency, 2 = monetary (bigger is better -> negated key)
    entries = F.array(
        F.struct(
            F.lit(0).alias("m"), F.col("recency_days").alias("k")
        ),
        F.struct(F.lit(1).alias("m"), (-F.col("frequency")).alias("k")),
        F.struct(
            F.lit(2).alias("m"), (-F.col("monetary_cents")).alias("k")
        ),
    )
    melt = per.select(
        "o_custkey",
        "monetary_cents",
        F.explode(entries).alias("e"),
        F.lit(1).cast("long").alias("_one"),
    ).select("o_custkey", "monetary_cents", "e.m", "e.k", "_one")
    ranked = global_running_sum(
        melt,
        [F.asc("m"), F.asc("k"), F.asc("o_custkey")],
        "_one",
        idx_col="_rk",
        rsum_col="_rs",
        total_col="_N3",
    )
    # each metric block holds exactly N = _N3/3 rows
    q = F.expr(
        "CAST(ceil(5.0 * (_rk - m * (_N3 div 3)) / (_N3 div 3)) AS BIGINT)"
    )
    seg = (
        ranked.withColumn("_q", q)
        .groupBy("o_custkey")
        .agg(
            F.max(F.when(F.col("m") == 0, F.col("_q"))).alias("r_q"),
            F.max(F.when(F.col("m") == 1, F.col("_q"))).alias("f_q"),
            F.max(F.when(F.col("m") == 2, F.col("_q"))).alias("m_q"),
            F.max("monetary_cents").alias("monetary_cents"),
        )
    )
    return (
        seg.groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum("monetary_cents").cast("long").alias("segment_cents"),
        )
        .orderBy("r_q", "f_q", "m_q")
    )


ORACLE_Q246 = """
WITH endd AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS e FROM orders),
per AS (
  SELECT o_custkey,
         CAST(date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                        (SELECT e FROM endd)) AS BIGINT) AS recency_days,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS DECIMAL(20,0)))
              AS BIGINT) AS monetary_cents
  FROM orders GROUP BY o_custkey),
q AS (
  SELECT o_custkey, monetary_cents,
         CAST(ceil(5.0 * (ROW_NUMBER() OVER
             (ORDER BY recency_days, o_custkey))
           / (COUNT(*) OVER ())) AS BIGINT) AS r_q,
         CAST(ceil(5.0 * (ROW_NUMBER() OVER
             (ORDER BY frequency DESC, o_custkey))
           / (COUNT(*) OVER ())) AS BIGINT) AS f_q,
         CAST(ceil(5.0 * (ROW_NUMBER() OVER
             (ORDER BY monetary_cents DESC, o_custkey))
           / (COUNT(*) OVER ())) AS BIGINT) AS m_q
  FROM per)
SELECT r_q, f_q, m_q, CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(monetary_cents) AS BIGINT) AS segment_cents
FROM q GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# q247: degree assortativity
# ---------------------------------------------------------------------------


def q247_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of endpoint degrees over the SYMMETRIC
    edge list (each undirected edge contributes both orientations, the
    standard Newman convention — also what makes Σx = Σy exactly).
    Degrees attach as two equi-joins; the correlation reuses batch
    46's DECIMAL OLS terms; one double at the end."""
    e = _edges(spark, sf_dir).localCheckpoint(eager=False)
    sym = e.select("src", "dst").unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = degrees(e)
    ds = deg.select(F.col("node").alias("src"), F.col("degree").alias("x"))
    dd = deg.select(F.col("node").alias("dst"), F.col("degree").alias("y"))
    joined = sym.join(ds, on="src").join(dd, on="dst")
    g = joined.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    cov, varx, vary, _ = _ols_terms()
    d = lambda c: c.cast("double")  # noqa: E731
    return g.select(
        F.col("n").alias("n_directed_edges"),
        (
            F.round(
                d(cov) / F.sqrt(d(varx) * d(vary)),
                6,
            )
            + F.lit(0.0)
        ).alias("assortativity"),
    )


ORACLE_Q247 = f"""
WITH {_EDGES_SQL},
sym AS (
  SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
deg AS (
  SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree
  FROM sym GROUP BY 1),
pairs AS (
  SELECT da.degree AS x, db.degree AS y
  FROM sym JOIN deg da ON da.node = sym.src
  JOIN deg db ON db.node = sym.dst),
g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM pairs)
SELECT n AS n_directed_edges,
       round(CAST(CAST(n AS HUGEINT) * sxy
                  - CAST(sx AS HUGEINT) * sy AS DOUBLE)
             / sqrt(CAST(CAST(n AS HUGEINT) * sxx
                         - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                    * CAST(CAST(n AS HUGEINT) * syy
                           - CAST(sy AS HUGEINT) * sy AS DOUBLE)), 6) + 0.0
         AS assortativity
FROM g
"""


def batch49_registry() -> list[QueryDef]:
    return [
        QueryDef("q244_flesch", q244_flesch, ORACLE_Q244,
                 "Flesch reading ease from exact regexp counts"),
        QueryDef("q245_truncated_recall", q245_truncated_recall,
                 ORACLE_Q245,
                 "Matryoshka 8-dim recall@10 vs full-dim cosine"),
        QueryDef("q246_rfm_segments", q246_rfm_segments, ORACLE_Q246,
                 "RFM quintile segmentation via distributed ranks"),
        QueryDef("q247_assortativity", q247_assortativity, ORACLE_Q247,
                 "degree assortativity, DECIMAL-exact correlation"),
    ]
