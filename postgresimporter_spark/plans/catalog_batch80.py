"""Batch 80: alignment-keyed exact Hamming join (the static-video
shape).

Round-10 maintenance-rule trigger (b), scale-failure repro (the same
duplicated/concentrated-input probe program as q321-q324): the video
near-dup caller filtered timeline alignment AFTER
``dedup.hamming_pairs_mih`` — so the expansion join for near-match
(non-equal) fingerprint values keyed on ``fp_b`` ALONE, with the
frame-offset equality left as a residual join condition. Two
corpus-wide hot near-match values (two families of static videos —
near-black intros, color bars, slide decks) then enumerated
|family_a| x |family_b| rows inside ONE sort-merge key group on one
task: measured 505.6s -> 9.3s (54x, identical 4,950-pair output) on a
100-video x 1,000-frame two-family corpus once the offset moved into
the join key (``hamming_pairs_mih(align_cols=[...])``; the
equal-value branch was already implicitly keyed — Catalyst derived
the offset equi-key through the old ``substring_index`` fid parse —
but the near-match expansion was not, and relying on optimizer
constraint derivation for the scale property was brittle either way).

q325 pins the align-keyed join externally on the catalog's standard
duplicated-documents corpus, reshaped into the static-video form:
every document becomes a 6-slot "video" whose per-slot fingerprint is
the document SimHash, with one bit flipped per slot for every 4th
document so slot matches drop in and out of the Hamming budget and
``n_matched`` varies — a drifted align key (dropped, duplicated, or
misaligned slot pairs) shifts pair counts the oracle's brute-force
slot-equality join catches exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from .catalog import QueryDef
from .catalog_batch8 import HAMMING_BITS, _simhash_cte
from .catalog_northstar import _duped_docs

ALIGN_SLOTS = 6
ALIGN_MAX_HAMMING = 6
ALIGN_MIN_MATCHED = 2


def q325_hamming_aligned_static(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Aligned-slot Hamming pairs over a synthetic static-video corpus
    derived from the duplicated documents: 6 slots per document, the
    document's 32-bit SimHash as every slot's fingerprint, bit ``slot``
    flipped for every 4th document. Pairs must agree on the slot
    (``align_cols``) and land within Hamming 6; output is the per-pair
    count of matched slots — the video near-dup aggregate shape."""
    fps = D.simhash(_duped_docs(spark, sf_dir), bits=HAMMING_BITS)
    frames = fps.select(
        "id",
        F.explode(
            F.array(*[F.lit(j) for j in range(ALIGN_SLOTS)])
        ).alias("slot"),
        "simhash",
    )
    flip = F.when(
        F.col("id") % 4 == 0,
        F.expr("shiftleft(CAST(1 AS BIGINT), slot)"),
    ).otherwise(F.lit(0).cast("long"))
    frames = frames.select(
        "id", "slot", F.col("simhash").bitwiseXOR(flip).alias("simhash")
    )
    pairs = D.hamming_pairs_mih(
        frames,
        bits=HAMMING_BITS,
        blocks=4,
        max_hamming=ALIGN_MAX_HAMMING,
        align_cols=["slot"],
    )
    return (
        pairs.groupBy("id_a", "id_b")
        .agg(F.count_distinct("slot").cast("long").alias("n_matched"))
        .where(F.col("n_matched") >= ALIGN_MIN_MATCHED)
    )


ORACLE_Q325 = f"""
WITH {_simhash_cte()},
frames AS (
  SELECT id, j AS slot,
         xor(simhash,
             CASE WHEN id % 4 = 0 THEN CAST(1 << j AS BIGINT)
                  ELSE 0 END) AS fp
  FROM sh, (SELECT unnest(range({ALIGN_SLOTS})) AS j)),
m AS (
  SELECT a.id AS id_a, b.id AS id_b, a.slot
  FROM frames a JOIN frames b ON a.slot = b.slot AND a.id < b.id
  WHERE bit_count(xor(a.fp, b.fp)) <= {ALIGN_MAX_HAMMING})
SELECT id_a, id_b, CAST(COUNT(DISTINCT slot) AS BIGINT) AS n_matched
FROM m GROUP BY 1, 2
HAVING COUNT(DISTINCT slot) >= {ALIGN_MIN_MATCHED}
"""


HOT_COPIES = 4
SESS_GAP_MIN = 30
SESS_BUCKET_HOURS = 6


def _hot_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table plus a synthetic HOT user (id -1) carrying
    ``HOT_COPIES`` shifted copies of every event — the bot/scraper
    skew shape: one user owns 4x the whole corpus's events."""
    from ..sources.parquet import load_tables

    ev = load_tables(spark, sf_dir, ["events"])["events"].select(
        "user_id", "ts", "event_id", "value"
    )
    hot = None
    for j in range(HOT_COPIES):
        part = ev.select(
            F.lit(-1).alias("user_id"),
            # spread the copies by j seconds so the hot timeline is
            # dense but not all-ties
            (F.col("ts") + F.make_interval(secs=F.lit(j))).alias("ts"),
            (F.col("event_id") + F.lit((j + 1) * 10_000_000)).alias(
                "event_id"
            ),
            "value",
        )
        hot = part if hot is None else hot.unionByName(part)
    return ev.unionByName(hot)


def q326_sessionize_hot_user(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-session aggregates over the hot-user corpus via the
    TWO-PHASE time-bucketed sessionization
    (``sessionize(bucket_hours=...)``): event windows partition by
    (user, 6h bucket) — bounded, parallel — and cross-boundary breaks
    resolve over per-bucket summary rows (metadata scale). The oracle
    replays the PLAIN per-user gaps-and-islands definition in SQL, so
    any decomposition error (boundary break, base renumbering,
    threshold strictness, tie ordering) is an external mismatch."""
    from ..operators.sessionize import session_stats

    return session_stats(
        _hot_user_events(spark, sf_dir),
        gap_minutes=SESS_GAP_MIN,
        bucket_hours=SESS_BUCKET_HOURS,
    )


ORACLE_Q326 = f"""
WITH hot AS (
  SELECT -1 AS user_id,
         ts + to_seconds(j) AS ts,
         event_id + (j + 1) * 10000000 AS event_id, value
  FROM events, (SELECT unnest(range({HOT_COPIES})) AS j)),
corpus AS (
  SELECT user_id, ts, event_id, value FROM events
  UNION ALL SELECT * FROM hot),
flagged AS (
  SELECT user_id, event_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
           OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
              > {SESS_GAP_MIN * 60 * 1_000_000}
         THEN 1 ELSE 0 END AS new_session
  FROM corpus
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, ts, value,
    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS session_id
  FROM flagged)
SELECT user_id, session_id,
  CAST(MIN(ts) AS TIMESTAMP) AS session_start,
  CAST(MAX(ts) AS TIMESTAMP) AS session_end,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM sessions GROUP BY user_id, session_id
"""


ASOF_BUCKET_HOURS = 6


def q327_asof_hot_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q82's purchase->last-click as-of join under HOT-KEY skew: every
    even user id collapses onto one synthetic key (-1), so one key
    carries half the tape — the hot-instrument shape — and the join
    runs through the bucketed path (``asof_join(bucket_hours=...)``:
    within-(key, 6h-bucket) fills + per-bucket carry-in). Clicks are
    pre-aggregated to one row per (key, ts) so the as-of tie rule is
    deterministic on both engines. The oracle replays the PLAIN
    definition with DuckDB's native ASOF LEFT JOIN."""
    from ..operators import temporal as TP
    from ..sources.parquet import load_tables

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    hot_uid = F.when(F.col("user_id") % 2 == 0, F.lit(-1)).otherwise(
        F.col("user_id")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", hot_uid.alias("user_id"), "ts", "value"
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .select(hot_uid.alias("user_id"), "ts", "value")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    return TP.asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["value"],
        strict=True,
        bucket_hours=ASOF_BUCKET_HOURS,
    ).select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.col("asof_value").alias("last_click_value"),
        F.col("asof_ts").alias("last_click_ts"),
    )


ORACLE_Q327 = """
WITH p AS (
  SELECT event_id,
         CASE WHEN user_id % 2 = 0 THEN -1 ELSE user_id END AS user_id,
         ts, value
  FROM events WHERE event_type = 'purchase'),
c AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN -1 ELSE user_id END AS user_id,
         ts, MAX(value) AS value
  FROM events WHERE event_type = 'click'
  GROUP BY 1, 2)
SELECT p.event_id, p.user_id, p.ts, p.value,
       c.value AS last_click_value, c.ts AS last_click_ts
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts > c.ts
"""


def q328_quantile_hot_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q317's cross-source score calibration under HOT-GROUP skew —
    the operator's NORMAL shape (one dominant web-crawl source is why
    cross-source calibration exists): every source except the
    lexicographically first collapses onto 'web', and the within-group
    rank runs through ``quantile_normalize(range_ranked=True)`` (group
    rank recovered from the global (group, score, id) ranking instead
    of a one-task-per-group window). The oracle replays the PLAIN
    per-group window definition."""
    from ..operators.curation import quantile_normalize
    from ..sources.parquet import load_tables

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    hot = docs.select(
        "doc_id",
        F.when(F.col("source") <= "a", F.col("source"))
        .otherwise(F.lit("web"))
        .alias("source"),
        "n_chars",
    )
    return quantile_normalize(
        hot, "source", "n_chars", "doc_id", range_ranked=True
    )


ORACLE_Q328 = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN source <= 'a' THEN source ELSE 'web' END AS source,
         CAST(n_chars AS BIGINT) AS score
  FROM documents),
s AS (
  SELECT doc_id, source, score,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY score, doc_id) AS s_rank,
         COUNT(*) OVER (PARTITION BY source) AS n_s
  FROM d),
g AS (
  SELECT score AS norm_score,
         ROW_NUMBER() OVER (ORDER BY score, doc_id) AS g_rank
  FROM d),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM d)
SELECT s.doc_id, s.source, s.score, g.norm_score
FROM s CROSS JOIN n
JOIN g ON g.g_rank = CASE WHEN s.n_s = 1 THEN 1 + (n.n_total - 1) // 2
                          ELSE 1 + ((s.s_rank - 1) * (n.n_total - 1))
                               // (s.n_s - 1) END
"""


IDX_SAMPLE = 5
IDX_SALT = 16


def q329_index_hot_token(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index over documents with a corpus-wide STOPWORD
    prepended to every text (the hot-posting-list shape), built via
    the salted sample path (``inverted_index(salt_buckets=...)``:
    df/cf as plain aggregates, the postings sample through
    topk_per_key's two-phase min-k). Output restricted to tokens with
    df >= 50 to keep the oracle comparison focused on the hot tier.
    The oracle replays the plain window definition in SQL."""
    from ..operators.textindex import inverted_index
    from ..sources.parquet import load_tables

    docs = load_tables(spark, sf_dir, ["documents"])["documents"].select(
        "doc_id", F.concat(F.lit("zzcommon "), F.col("text")).alias("text")
    )
    idx = inverted_index(
        docs, postings_sample=IDX_SAMPLE, salt_buckets=IDX_SALT
    )
    return idx.where(F.col("df") >= 50).select(
        "token", "df", F.col("cf").cast("long").alias("cf"),
        "postings_sample",
    )


ORACLE_Q329 = f"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(
           string_split_regex(trim('zzcommon ' || text), '\\s+'),
           t -> t != '')) AS token
  FROM documents),
tf AS (SELECT token, doc_id, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
rn AS (
  SELECT token, doc_id, tf,
         ROW_NUMBER() OVER (PARTITION BY token ORDER BY doc_id) AS rn
  FROM tf)
SELECT token,
       CAST(COUNT(*) AS BIGINT) AS df,
       CAST(SUM(tf) AS BIGINT) AS cf,
       array_to_string(
         list_transform(
           list_sort(list(doc_id) FILTER (rn <= {IDX_SAMPLE})),
           x -> CAST(x AS VARCHAR)),
         ',') AS postings_sample
FROM rn
GROUP BY token
HAVING COUNT(*) >= 50
"""


def batch80_registry() -> list[QueryDef]:
    return [
        QueryDef(
            "q325_hamming_aligned_static",
            q325_hamming_aligned_static,
            ORACLE_Q325,
            "alignment-keyed MIH Hamming join on the static-video shape",
        ),
        QueryDef(
            "q326_sessionize_hot_user",
            q326_sessionize_hot_user,
            ORACLE_Q326,
            "two-phase bucketed sessionization under bot-user skew",
        ),
        QueryDef(
            "q327_asof_hot_key",
            q327_asof_hot_key,
            ORACLE_Q327,
            "bucketed as-of join under hot-instrument skew",
        ),
        QueryDef(
            "q328_quantile_hot_group",
            q328_quantile_hot_group,
            ORACLE_Q328,
            "range-ranked quantile normalization under hot-group skew",
        ),
        QueryDef(
            "q329_index_hot_token",
            q329_index_hot_token,
            ORACLE_Q329,
            "salted-sample inverted index under stopword skew",
        ),
    ]
