"""Batch 61: sequential pattern mining, symbolic time-series motifs,
and greedy coverage-maximizing document selection.

- q292 frequent sequences — PrefixSpan-lite support counting of
  ordered event-type pairs (a then b) per user. Scale-safe shape: the
  per-user state is one row per DISTINCT type carrying the (min, max)
  occurrence key as a (ts, event_id) struct, so "some a precedes some
  b" is ``min_key(a) < max_key(b)`` — O(users × types²) via a
  per-user self-join of the type table, never a per-event pair
  explosion (a heavy user with 10^6 events still contributes |types|
  rows).
- q293 SAX motifs — PAA (8 count-based segments per user series) +
  symbolic discretization with EMPIRICAL breakpoints: each segment's
  symbol is the quartile of its PAA mean among the user's 8 segment
  means. Ranks compare the exact rational means (cents × counts) by
  integer cross-multiplication, so the discretization has NO floating
  point anywhere — identical words on any engine. Motif = the 8-char
  word; support = users sharing it.
- q294 coverage select — greedy maximum-coverage curation (the
  classic (1−1/e) submodular heuristic): 3 unrolled rounds, each a
  distributed marginal-gain argmax over (doc, shingle) postings with
  the already-covered shingle set anti-joined out. The covered set is
  bounded by k × doc-size (broadcast-safe by construction); the
  oracle unrolls the same 3 rounds as SQL stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_tables
from .catalog import QueryDef

# q292: frequent ordered type pairs -------------------------------------------


def q292_frequent_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Support (distinct users) of every ordered event-type pair
    (type_a happens strictly before type_b for the same user; ties on
    timestamp break by event_id, and a == b needs two distinct
    events)."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    per = ev.groupBy("user_id", "event_type").agg(
        F.min(F.struct("ts", "event_id")).alias("k_min"),
        F.max(F.struct("ts", "event_id")).alias("k_max"),
    )
    a = per.select(
        "user_id",
        F.col("event_type").alias("type_a"),
        F.col("k_min").alias("ka"),
    )
    b = per.select(
        "user_id",
        F.col("event_type").alias("type_b"),
        F.col("k_max").alias("kb"),
    )
    pairs = a.join(b, on="user_id").where(F.col("ka") < F.col("kb"))
    return (
        pairs.groupBy("type_a", "type_b")
        .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
        .select("type_a", "type_b", "n_users")
    )


ORACLE_Q292 = """
WITH per AS (
  SELECT user_id, event_type,
         MIN(ROW(ts, event_id)) AS k_min,
         MAX(ROW(ts, event_id)) AS k_max
  FROM events GROUP BY user_id, event_type)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM per a JOIN per b ON a.user_id = b.user_id
WHERE a.k_min < b.k_max
GROUP BY a.event_type, b.event_type
"""


# q293: SAX motifs over per-user value series -----------------------------------

SAX_SEGMENTS = 8
SAX_ALPHA = 4


def q293_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symbolic (SAX-style) words over each user's event-value series:
    8 count-based PAA segments, each symbolized by the quartile of its
    mean among the user's segment means. All comparisons are exact —
    segment means stay rational (cent sums × counts) and rank by
    integer cross-multiplication — so the word is engine-portable by
    construction. Returns each word with its user support."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    cents = F.expr("CAST(round(value * 100, 0) AS DECIMAL(20,0))").cast(
        "long"
    )
    rn = F.row_number().over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
    )
    n_per = F.count("*").over(Window.partitionBy("user_id"))
    seq = ev.select(
        "user_id",
        cents.alias("v"),
        rn.alias("_rn"),
        n_per.alias("_n"),
    ).select(
        "user_id",
        "v",
        F.expr(f"((_rn - 1) * {SAX_SEGMENTS}) div _n").alias("seg"),
    )
    segs = seq.groupBy("user_id", "seg").agg(
        F.sum("v").cast("long").alias("s"),
        F.count("*").cast("long").alias("c"),
    )
    i, j = segs.alias("i"), segs.alias("j")
    lt = (F.col("j.s") * F.col("i.c") < F.col("i.s") * F.col("j.c")) | (
        (F.col("j.s") * F.col("i.c") == F.col("i.s") * F.col("j.c"))
        & (F.col("j.seg") < F.col("i.seg"))
    )
    ranked = (
        i.join(j, on=(F.col("i.user_id") == F.col("j.user_id")))
        .groupBy(
            F.col("i.user_id").alias("user_id"),
            F.col("i.seg").alias("seg"),
        )
        .agg(
            (F.lit(1) + F.sum(lt.cast("long"))).alias("r")
        )
    )
    sym = F.expr(
        f"chr(96 + CAST(ceil({SAX_ALPHA}.0 * r / {SAX_SEGMENTS}) AS INT))"
    )
    words = (
        ranked.withColumn("_sym", sym)
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                "", F.transform(F.array_sort(
                    F.collect_list(F.struct("seg", "_sym"))
                ), lambda e: e["_sym"])
            ).alias("sax_word")
        )
    )
    return (
        words.groupBy("sax_word")
        .agg(F.count("*").cast("long").alias("n_users"))
        .select("sax_word", "n_users")
    )


ORACLE_Q293 = f"""
WITH seq AS (
  SELECT user_id,
         CAST(round(value * 100, 0) AS BIGINT) AS v,
         CAST(((ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id)) - 1)
              * {SAX_SEGMENTS}
              // (COUNT(*) OVER (PARTITION BY user_id)) AS BIGINT) AS seg
  FROM events),
segs AS (
  SELECT user_id, seg, CAST(SUM(v) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM seq GROUP BY user_id, seg),
ranked AS (
  SELECT i.user_id, i.seg,
         1 + COALESCE(SUM(CASE WHEN (j.s * i.c < i.s * j.c)
               OR (j.s * i.c = i.s * j.c AND j.seg < i.seg)
             THEN 1 END), 0) AS r
  FROM segs i JOIN segs j ON i.user_id = j.user_id
  GROUP BY i.user_id, i.seg),
words AS (
  SELECT user_id,
         string_agg(chr(96 + CAST(ceil({SAX_ALPHA}.0 * r
                                        / {SAX_SEGMENTS}) AS INT)),
                    '' ORDER BY seg) AS sax_word
  FROM ranked GROUP BY user_id)
SELECT sax_word, CAST(COUNT(*) AS BIGINT) AS n_users
FROM words GROUP BY sax_word
"""


# q294: greedy coverage-maximizing selection -------------------------------------

COVER_K = 3
_TOKS_291 = "string_split_regex(trim(text), '\\s+')"
_SHINGLES_291 = (
    "list_distinct(list_transform("
    "generate_series(0, greatest(len({t}) - 3, 0)), "
    "i -> array_to_string(list_slice({t}, i + 1, i + 3), ' ')))"
).format(t=_TOKS_291)


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import shingles

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    return docs.select(
        "doc_id", F.explode(shingles(F.col("text"), 3)).alias("sh")
    ).localCheckpoint(eager=False)


def q294_coverage_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy maximum-coverage selection of 3 documents over word
    3-gram shingles — the submodular curation heuristic (pick the doc
    adding the most not-yet-covered shingles, ties to the smallest
    doc_id). Each round is one distributed count + a 1-row argmax
    collect; the covered set stays bounded by k × doc size and rides
    a broadcast anti-join. Returns (step, doc_id, gain)."""
    ds = _doc_shingles(spark, sf_dir)
    remaining = ds
    chosen: list[tuple[int, int, int]] = []
    covered = None
    for step in range(1, COVER_K + 1):
        gains = remaining.groupBy("doc_id").agg(
            F.count_distinct("sh").alias("g")
        )
        top = gains.orderBy(F.desc("g"), F.asc("doc_id")).limit(1).collect()
        if not top:
            break
        doc, gain = top[0]["doc_id"], top[0]["g"]
        chosen.append((step, int(doc), int(gain)))
        new_cov = ds.where(F.col("doc_id") == doc).select("sh").distinct()
        covered = (
            new_cov if covered is None else covered.unionAll(new_cov).distinct()
        )
        remaining = remaining.join(
            F.broadcast(covered), on="sh", how="left_anti"
        )
    return spark.createDataFrame(
        chosen, "step int, doc_id long, gain long"
    ).select("step", "doc_id", F.col("gain").cast("long"))


def _cover_oracle() -> str:
    return f"""
WITH ds AS (
  SELECT doc_id, unnest({_SHINGLES_291}) AS sh FROM documents),
g1 AS (SELECT doc_id, COUNT(DISTINCT sh) AS g FROM ds GROUP BY doc_id),
p1 AS (SELECT doc_id, g FROM g1 ORDER BY g DESC, doc_id LIMIT 1),
c1 AS (SELECT DISTINCT sh FROM ds WHERE doc_id = (SELECT doc_id FROM p1)),
r2 AS (SELECT * FROM ds WHERE sh NOT IN (SELECT sh FROM c1)),
g2 AS (SELECT doc_id, COUNT(DISTINCT sh) AS g FROM r2 GROUP BY doc_id),
p2 AS (SELECT doc_id, g FROM g2 ORDER BY g DESC, doc_id LIMIT 1),
c2 AS (SELECT sh FROM c1 UNION
       SELECT DISTINCT sh FROM ds WHERE doc_id = (SELECT doc_id FROM p2)),
r3 AS (SELECT * FROM ds WHERE sh NOT IN (SELECT sh FROM c2)),
g3 AS (SELECT doc_id, COUNT(DISTINCT sh) AS g FROM r3 GROUP BY doc_id),
p3 AS (SELECT doc_id, g FROM g3 ORDER BY g DESC, doc_id LIMIT 1)
SELECT 1 AS step, doc_id, CAST(g AS BIGINT) AS gain FROM p1
UNION ALL SELECT 2, doc_id, CAST(g AS BIGINT) FROM p2
UNION ALL SELECT 3, doc_id, CAST(g AS BIGINT) FROM p3
"""


ORACLE_Q294 = _cover_oracle()


def batch61_registry() -> list[QueryDef]:
    return [
        QueryDef(
            "q292_frequent_sequences",
            q292_frequent_sequences,
            ORACLE_Q292,
            "ordered event-type pair support via per-type (min,max) keys",
        ),
        QueryDef(
            "q293_sax_motifs",
            q293_sax_motifs,
            ORACLE_Q293,
            "exact-arithmetic SAX words (PAA + empirical quartile symbols)",
        ),
        QueryDef(
            "q294_coverage_select",
            q294_coverage_select,
            ORACLE_Q294,
            "greedy max-coverage doc selection vs 3-stage SQL unroll",
        ),
    ]
