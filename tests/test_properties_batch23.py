"""Property tests for the round-3-continuation operators: PPJoin
prefix filtering (exact equality with the unfiltered join on random
corpora), linear interpolation (recovers linear functions exactly),
and token-budget sharding (conservation + boundary laws)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from postgresimporter_spark.operators.curation import token_budget_shards
from postgresimporter_spark.operators.dedup import (
    ngram_jaccard_pairs,
    prefix_jaccard_pairs,
)
from postgresimporter_spark.operators.temporal import interpolate_linear

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# small vocabulary forces shingle collisions -> non-trivial pair sets
doc_text = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=3, max_size=10
).map(" ".join)


@SETTINGS
@given(st.lists(doc_text, min_size=2, max_size=12))
def test_prefix_filter_equals_full_join(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    full = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(df, threshold=0.8).collect()
    }
    pref = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in prefix_jaccard_pairs(df, threshold_pct=80).collect()
    }
    assert pref == full  # exact optimization: zero recall loss


@SETTINGS
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),  # hour
            st.integers(min_value=-50, max_value=50),  # slope numerator
        ),
        min_size=2,
        max_size=8,
        unique_by=lambda t: t[0],
    )
)
def test_interpolation_recovers_linear_functions(spark, pts):
    # observations sampled from v = 2*t + 5 must interpolate EXACTLY
    # to the same line at every interior bucket (linear interpolation
    # of a linear function is the function)
    rows = [
        ("k", dt.datetime(2024, 1, 1, h), float(2 * h + 5)) for h, _ in pts
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "value"])
    out = interpolate_linear(df, "ts", "hour", ["k"], "value").collect()
    hours = sorted(h for h, _ in pts)
    lo, hi = hours[0], hours[-1]
    for r in out:
        h = r["bucket_ts"].hour
        if lo <= h <= hi:
            assert r["v_filled"] == float(2 * h + 5), (h, r["v_filled"])
        else:
            assert r["v_filled"] is None


@SETTINGS
@given(
    st.lists(
        st.integers(min_value=0, max_value=30), min_size=1, max_size=20
    ),
    st.integers(min_value=1, max_value=40),
)
def test_token_shards_laws(spark, sizes, budget):
    df = spark.createDataFrame(
        [(i, " ".join(["t"] * n)) for i, n in enumerate(sizes)],
        ["doc_id", "text"],
    )
    rows = token_budget_shards(df, budget, ["doc_id"]).collect()
    # conservation: every doc in exactly one shard
    assert sum(r["n_docs"] for r in rows) == len(sizes)
    assert sum(r["shard_tokens"] for r in rows) == sum(sizes)
    # shard ids are the floor of the exclusive prefix sum: contiguous
    # doc ranges, ordered
    by_shard = sorted(rows, key=lambda r: r["shard_id"])
    for a, b in zip(by_shard, by_shard[1:]):
        assert a["last_doc"] < b["first_doc"]
    # a shard holds at least one doc; its tokens-before-last-doc are
    # under budget (a doc never starts in a later shard than its
    # prefix dictates)
    prefix = 0
    shard_of = {}
    for i, n in enumerate(sizes):
        shard_of[i] = prefix // budget
        prefix += n
    for r in rows:
        assert shard_of[r["first_doc"]] == r["shard_id"]
        assert shard_of[r["last_doc"]] == r["shard_id"]


points = st.lists(
    st.tuples(
        st.integers(min_value=-80, max_value=200),
        st.integers(min_value=-80, max_value=200),
    ),
    min_size=2,
    max_size=14,
    unique=True,
)


@SETTINGS
@given(points)
def test_radius_pairs_equal_brute_force(spark, pts):
    from postgresimporter_spark.operators.spatial import radius_pairs

    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)], ["pid", "x", "y"]
    )
    got = {
        (r["id_a"], r["id_b"]): r["dist_sq"]
        for r in radius_pairs(df, "x", "y", "pid", radius=50).collect()
    }
    want = {}
    for i, (xa, ya) in enumerate(pts):
        for j, (xb, yb) in enumerate(pts):
            if i < j:
                d = (xa - xb) ** 2 + (ya - yb) ** 2
                if d <= 2500:
                    want[(i, j)] = d
    assert got == want
