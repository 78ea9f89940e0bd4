"""Batch 23: web-text extraction & corpus-writer tier.

Net-new engine surface (the reference is an ingest orchestrator with no
analytics): the stage that turns a raw crawl into writable training
shards —

- q150: C4-style line filtering (terminal punctuation, min words,
  boilerplate phrases, code braces) with document rebuild;
- q151: HTML boilerplate stripping (script/style removal, tag strip,
  entity decode, whitespace collapse) — pure Catalyst, zero shuffle;
- q152: linear-interpolation gap fill over per-key time buckets
  (TimescaleDB ``interpolate()`` semantics, distributed);
- q153: token-budget shard manifest (contiguous ~equal-token shards,
  window-free cumulative sums);
- q154: exact-k deterministic weighted sampling per source (integer
  u/w priority keys, salted-capable top-k).

The fixture documents are flat word-soup (no newlines or markup), so
q150/q151 synthesize lines/HTML deterministically from (doc_id, source,
text) — the derivation is part of the query and mirrored verbatim in
the DuckDB oracle, so the cleaning operators are differentially tested
end-to-end (same pattern as the batch-22 synthetic URLs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import textclean as TC
from ..operators.curation import token_budget_shards
from ..operators.ranking import topk_per_key
from ..operators.temporal import interpolate_linear
from ..operators.textstats import tokens
from ..sources.parquet import load_tables
from .catalog import QueryDef

# ---------------------------------------------------------------------------
# q150: C4-style line filtering
# ---------------------------------------------------------------------------

# Leading 3 tokens of the doc — the deterministic "content" seed both
# synthetic lines and the oracle share.
_FIRST3_SQL = (
    "array_to_string(list_slice("
    "string_split_regex(trim(text), '\\s+'), 1, 3), ' ')"
)


def _first3(text) -> F.Column:
    return F.array_join(F.slice(tokens(text), 1, 3), " ")


def q150_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six synthetic lines per document exercise every C4 rule: keep =
    {sentence-like line, repeated-content line (1 in 3 docs)}; drop =
    {no terminal punctuation, 'javascript' boilerplate, code braces,
    too short, 'cookie policy'}. Output is the rebuilt document plus
    kept/total line counts."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    d = F.col("doc_id").cast("string")
    f3 = _first3(F.col("text"))
    l1 = F.concat(F.lit("Document "), d, F.lit(" covers "), f3, F.lit("."))
    l2 = f3
    l3 = F.concat(
        F.lit("Please enable JavaScript to view doc "), d, F.lit(".")
    )
    l4 = F.concat(
        F.lit("function f() { return "), F.col("source"), F.lit("; }")
    )
    l5 = F.lit("Too short.")
    l6 = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(f3, F.lit(" appears often in "), F.col("source"), F.lit("!")),
    ).otherwise(F.concat(F.lit("See cookie policy at "), F.col("source")))
    lines = F.array(l1, l2, l3, l4, l5, l6)
    kept = TC.filter_lines(lines)
    clean = TC.rebuild(kept)
    return docs.select(
        "doc_id",
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        clean.alias("clean_text"),
        F.length(clean).cast("long").alias("clean_chars"),
    )


ORACLE_Q150 = f"""
WITH lined AS (
  SELECT doc_id,
    [ 'Document ' || doc_id || ' covers ' || {_FIRST3_SQL} || '.',
      {_FIRST3_SQL},
      'Please enable JavaScript to view doc ' || doc_id || '.',
      'function f() {{ return ' || source || '; }}',
      'Too short.',
      CASE WHEN doc_id % 3 = 0
           THEN {_FIRST3_SQL} || ' appears often in ' || source || '!'
           ELSE 'See cookie policy at ' || source END
    ] AS lines
  FROM documents),
filtered AS (
  SELECT doc_id, lines,
    list_filter(lines, l ->
      regexp_matches(l, '[.!?"]$')
      AND len(list_filter(string_split_regex(trim(l), '\\s+'),
                          x -> x <> '')) >= 5
      AND NOT contains(l, '{{') AND NOT contains(l, '}}')
      AND NOT contains(lower(l), 'javascript')
      AND NOT contains(lower(l), 'lorem ipsum')
      AND NOT contains(lower(l), 'cookie policy')
    ) AS kept
  FROM lined)
SELECT doc_id,
  CAST(len(lines) AS BIGINT) AS n_lines,
  CAST(len(kept) AS BIGINT) AS n_kept,
  array_to_string(kept, chr(10)) AS clean_text,
  CAST(length(array_to_string(kept, chr(10))) AS BIGINT) AS clean_chars
FROM filtered
"""


# ---------------------------------------------------------------------------
# q151: HTML boilerplate stripping
# ---------------------------------------------------------------------------


def q151_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic page per document (script + style blocks,
    nested tags, the six dominant entities, adjacent table cells) →
    ``textclean.strip_html`` → visible text + length + word count."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    d = F.col("doc_id").cast("string")
    f3 = _first3(F.col("text"))
    html = F.concat(
        F.lit("<html><head><title>Doc "), d,
        F.lit('</title></head><body><p>Doc '), d,
        F.lit(" &amp; friends say &quot;"), f3,
        F.lit('&quot;.</p><script>var x = 1;</script>'
              "<style>p [ color: red ]</style>"
              '<div class="x"><b>'),
        F.col("source"),
        F.lit("</b>&nbsp;&#39;quoted&#39; &lt;tag&gt; &amp;lt;esc&amp;gt;"
              "</div><table><tr><td>alpha</td><td>beta</td></tr></table>"
              "</body></html>"),
    )
    clean = TC.strip_html(html)
    return docs.select(
        "doc_id",
        clean.alias("clean_text"),
        F.length(clean).cast("long").alias("clean_chars"),
        F.size(tokens(clean)).cast("long").alias("clean_words"),
    )


_Q151_CLEAN_SQL = """
trim(regexp_replace(
  replace(replace(replace(replace(replace(replace(
    regexp_replace(
      regexp_replace(
        regexp_replace(html, '(?i)<script.*?</script>', ' ', 'g'),
        '(?i)<style.*?</style>', ' ', 'g'),
      '<[^>]*>', ' ', 'g'),
    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
    '&nbsp;', ' '), '&amp;', '&'),
  '\\s+', ' ', 'g'))
"""


ORACLE_Q151 = f"""
WITH pages AS (
  SELECT doc_id,
    '<html><head><title>Doc ' || doc_id || '</title></head><body><p>Doc '
    || doc_id || ' &amp; friends say &quot;' || {_FIRST3_SQL}
    || '&quot;.</p><script>var x = 1;</script>'
    || '<style>p [ color: red ]</style><div class="x"><b>' || source
    || '</b>&nbsp;&#39;quoted&#39; &lt;tag&gt; &amp;lt;esc&amp;gt;'
    || '</div><table><tr><td>alpha</td><td>beta</td></tr></table>'
    || '</body></html>' AS html
  FROM documents)
SELECT doc_id,
  {_Q151_CLEAN_SQL} AS clean_text,
  CAST(length({_Q151_CLEAN_SQL}) AS BIGINT) AS clean_chars,
  CAST(len(list_filter(string_split_regex(trim({_Q151_CLEAN_SQL}),
       '\\s+'), x -> x <> '')) AS BIGINT) AS clean_words
FROM pages
"""


# ---------------------------------------------------------------------------
# q152: linear-interpolation gap fill
# ---------------------------------------------------------------------------


def q152_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-user 'view' value series, gaps filled by linear
    interpolation between nearest observed buckets (edges stay NULL)."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    sub = ev.where((F.col("user_id") < 12) & (F.col("event_type") == "view"))
    return interpolate_linear(sub, "ts", "hour", ["user_id"], "value")


ORACLE_Q152 = """
WITH sub AS (
  SELECT * FROM events WHERE user_id < 12 AND event_type = 'view'),
agg AS (
  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_ts, user_id,
    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value) AS v_obs
  FROM sub GROUP BY 1, 2),
span AS (
  SELECT CAST(date_trunc('hour', MIN(ts)) AS TIMESTAMP) AS lo,
         CAST(date_trunc('hour', MAX(ts)) AS TIMESTAMP) AS hi
  FROM sub),
cal AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_ts
  FROM span),
grid AS (
  SELECT c.bucket_ts, u.user_id
  FROM cal c CROSS JOIN (SELECT DISTINCT user_id FROM sub) u),
dense AS (
  SELECT g.user_id, g.bucket_ts, a.v_obs
  FROM grid g LEFT JOIN agg a
    ON a.bucket_ts = g.bucket_ts AND a.user_id = g.user_id),
w AS (
  SELECT user_id, bucket_ts, v_obs,
    last_value(v_obs IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY bucket_ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    last_value(CASE WHEN v_obs IS NOT NULL THEN epoch_us(bucket_ts) END
               IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY bucket_ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
    first_value(v_obs IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY bucket_ts
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    first_value(CASE WHEN v_obs IS NOT NULL THEN epoch_us(bucket_ts) END
                IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY bucket_ts
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
  FROM dense)
SELECT user_id, bucket_ts, v_obs,
  COALESCE(v_obs,
    CASE WHEN pv IS NOT NULL AND nv IS NOT NULL
         THEN pv + (nv - pv) *
              (CAST(epoch_us(bucket_ts) - pt AS DOUBLE)
               / CAST(nt - pt AS DOUBLE)) END) AS v_filled,
  v_obs IS NOT NULL AS is_observed
FROM w
"""


# ---------------------------------------------------------------------------
# q153: token-budget shard manifest
# ---------------------------------------------------------------------------


def q153_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cut the corpus (doc_id order) into contiguous ~2000-token output
    shards; emit the per-shard writer manifest."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    return token_budget_shards(docs, budget_tokens=2000, order_cols=["doc_id"])


ORACLE_Q153 = """
WITH toks AS (
  SELECT doc_id,
    CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
         x -> x <> '')) AS BIGINT) AS n_tok
  FROM documents),
cum AS (
  SELECT doc_id, n_tok,
    CAST(SUM(n_tok) OVER (
      ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS rs
  FROM toks)
SELECT CAST((rs - n_tok) // 2000 AS BIGINT) AS shard_id,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_tok) AS BIGINT) AS shard_tokens,
  MIN(doc_id) AS first_doc,
  MAX(doc_id) AS last_doc
FROM cum GROUP BY 1
"""


# ---------------------------------------------------------------------------
# q154: exact-k weighted sample per source
# ---------------------------------------------------------------------------

_U_MOD = 1_000_000_000


def q154_weighted_topk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: k=5 docs per
    source, priority = u/w with u an md5-derived uniform and w =
    n_chars — longer documents draw first, every draw re-computable
    bit-identically on any engine/partitioning (all-integer keys; no
    transcendental functions, so no cross-engine libm hazard).
    The per-key top-k rides ``ranking.topk_per_key`` — the salted
    two-phase variant guards hot sources at crawl scale."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    # (u * 1000) div n_chars: all-integer, exact on both engines; the
    # md5-uniform is the same primitive as hash_bucket (q74/q105)
    pri = docs.select(
        "source",
        "doc_id",
        F.expr(
            f"((conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10)"
            f" % {_U_MOD}) * 1000) div n_chars"
        ).cast("long").alias("priority"),
    )
    out = topk_per_key(
        pri,
        ["source"],
        [F.col("priority"), F.col("doc_id")],
        k=5,
        salt_buckets=8,
        salt_on=["doc_id"],
    )
    return out.withColumn("rk", F.col("rk").cast("long"))


ORACLE_Q154 = f"""
WITH pri AS (
  SELECT source, doc_id,
    CAST(((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
           % {_U_MOD}) * 1000) // n_chars AS BIGINT) AS priority
  FROM documents),
ranked AS (
  SELECT source, doc_id, priority,
    CAST(row_number() OVER (
      PARTITION BY source ORDER BY priority, doc_id) AS BIGINT) AS rk
  FROM pri)
SELECT source, doc_id, priority, rk FROM ranked WHERE rk <= 5
"""


def batch23_registry() -> list[QueryDef]:
    return [
        QueryDef("q150_line_filter", q150_line_filter, ORACLE_Q150,
                 "C4-style line filtering with document rebuild"),
        QueryDef("q151_html_strip", q151_html_strip, ORACLE_Q151,
                 "HTML boilerplate strip to visible text (pure Catalyst)"),
        QueryDef("q152_interpolate", q152_interpolate, ORACLE_Q152,
                 "linear-interpolation gap fill over per-key time buckets"),
        QueryDef("q153_token_shards", q153_token_shards, ORACLE_Q153,
                 "token-budget shard manifest (window-free cumsum)"),
        QueryDef("q154_weighted_topk_sample", q154_weighted_topk_sample,
                 ORACLE_Q154,
                 "exact-k deterministic weighted sample per source"),
    ]
