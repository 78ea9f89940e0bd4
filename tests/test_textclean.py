"""Unit tests for the web-text extraction tier (textclean), the
linear-interpolation gap fill, and the token-budget shard manifest —
micro-fixtures pinning edge semantics the q150-q154 oracles exercise
only at fixture scale."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from postgresimporter_spark.operators import textclean as TC
from postgresimporter_spark.operators.curation import token_budget_shards
from postgresimporter_spark.operators.temporal import interpolate_linear


def _one(spark, expr):
    return spark.range(1).select(expr.alias("v")).head()[0]


# strip_html -----------------------------------------------------------------


def test_strip_html_drops_script_and_style_content(spark):
    out = _one(
        spark,
        TC.strip_html(
            F.lit("<p>keep</p><script>var SECRET=1;</script>"
                  "<style>p{x}</style><p>also</p>")
        ),
    )
    assert out == "keep also"
    assert "SECRET" not in out


def test_strip_html_nongreedy_between_blocks(spark):
    # greedy matching would swallow the text BETWEEN two script blocks
    out = _one(
        spark,
        TC.strip_html(
            F.lit("<script>a</script>visible<script>b</script>")
        ),
    )
    assert out == "visible"


def test_strip_html_entities_single_pass(spark):
    # &amp; decodes LAST: double-escaped text yields the literal entity
    out = _one(
        spark,
        TC.strip_html(F.lit("A &amp; B &lt;x&gt; &amp;lt;esc&amp;gt;")),
    )
    assert out == 'A & B <x> &lt;esc&gt;'


def test_strip_html_adjacent_cells_stay_separate(spark):
    out = _one(
        spark, TC.strip_html(F.lit("<tr><td>alpha</td><td>beta</td></tr>"))
    )
    assert out == "alpha beta"


# filter_lines ---------------------------------------------------------------


def test_filter_lines_rules(spark):
    lines = F.array(
        F.lit("This line has enough words to survive."),   # keep
        F.lit("no terminal punctuation here at all"),       # drop: punct
        F.lit("Too short."),                                # drop: words
        F.lit("Please enable JavaScript to view this."),    # drop: phrase
        F.lit("Code sample { return x; } in prose here."),  # drop: braces
        F.lit('He said "exactly five words here right"'),   # keep: quote end
    )
    kept = _one(spark, TC.filter_lines(lines))
    assert kept == [
        "This line has enough words to survive.",
        'He said "exactly five words here right"',
    ]


def test_filter_lines_rebuild_empty_doc(spark):
    kept = _one(spark, TC.rebuild(TC.filter_lines(F.array(F.lit("nope")))))
    assert kept == ""


# interpolate_linear ---------------------------------------------------------


def _t(h):
    return dt.datetime(2024, 1, 1, h)


def test_interpolate_fills_interior_gap_exactly(spark):
    df = spark.createDataFrame(
        [("a", _t(0), 1.0), ("a", _t(3), 7.0)], ["k", "ts", "value"]
    )
    rows = {
        r["bucket_ts"].hour: r
        for r in interpolate_linear(df, "ts", "hour", ["k"], "value").collect()
    }
    assert rows[0]["v_filled"] == 1.0 and rows[0]["is_observed"]
    assert rows[1]["v_filled"] == 3.0 and not rows[1]["is_observed"]
    assert rows[2]["v_filled"] == 5.0
    assert rows[3]["v_filled"] == 7.0 and rows[3]["is_observed"]


def test_interpolate_no_extrapolation_at_edges(spark):
    # key "b" observed only at hour 2 of a 0..3 global span: its hours
    # 0,1,3 have a neighbor on one side only -> stay NULL
    df = spark.createDataFrame(
        [("a", _t(0), 1.0), ("a", _t(3), 1.0), ("b", _t(2), 9.0)],
        ["k", "ts", "value"],
    )
    out = interpolate_linear(df, "ts", "hour", ["k"], "value")
    b = {r["bucket_ts"].hour: r for r in out.where("k = 'b'").collect()}
    assert b[2]["v_filled"] == 9.0
    assert b[0]["v_filled"] is None
    assert b[1]["v_filled"] is None
    assert b[3]["v_filled"] is None


def test_interpolate_bucket_mean_before_fill(spark):
    # two observations in one bucket average first (exact decimal sum)
    df = spark.createDataFrame(
        [("a", _t(0), 1.0), ("a", dt.datetime(2024, 1, 1, 0, 30), 3.0)],
        ["k", "ts", "value"],
    )
    out = interpolate_linear(df, "ts", "hour", ["k"], "value").collect()
    assert len(out) == 1 and out[0]["v_obs"] == 2.0


# token_budget_shards --------------------------------------------------------


def test_token_shards_never_split_a_document(spark):
    # budget 5; docs of 3 tokens each: doc boundaries decide shards —
    # shard of a doc = floor(tokens_before / budget)
    df = spark.createDataFrame(
        [(i, "w w w") for i in range(5)], ["doc_id", "text"]
    )
    rows = {
        r["shard_id"]: r
        for r in token_budget_shards(df, 5, ["doc_id"]).collect()
    }
    # before-doc cumsums: 0,3,6,9,12 -> shards 0,0,1,1,2
    assert rows[0]["n_docs"] == 2 and rows[0]["shard_tokens"] == 6
    assert rows[1]["first_doc"] == 2 and rows[1]["last_doc"] == 3
    assert rows[2]["n_docs"] == 1


def test_token_shards_total_tokens_conserved(spark):
    df = spark.createDataFrame(
        [(i, " ".join(["t"] * (i + 1))) for i in range(10)],
        ["doc_id", "text"],
    )
    out = token_budget_shards(df, 7, ["doc_id"])
    total = out.agg(F.sum("shard_tokens")).head()[0]
    assert total == sum(range(1, 11))
