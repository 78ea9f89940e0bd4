"""Edge-semantics tests for batch 24 (TextRank edge build, window
co-occurrence guards, skew-planner integer math); fixture-scale
behavior is covered by the q155-q157 oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgresimporter_spark.plans.catalog_batch24 import (
    _key_stats,
    _word_edges,
)


def test_word_edges_single_token_docs_dont_explode(spark):
    # sequence(1, 0) is descending in Spark (invariant 8): a 1-token
    # doc must yield zero pairs, not an element_at(t, 0) error
    df = spark.createDataFrame(
        [(1, "solo"), (2, "a b a b a b")], ["doc_id", "text"]
    )
    edges = _word_edges(df).collect()
    # only doc 2 contributes, and its single canonical pair is below
    # the _MIN_DOCS threshold -> empty edge set, no failure
    assert edges == []


def test_word_edges_canonical_and_distinct_per_doc(spark):
    import postgresimporter_spark.plans.catalog_batch24 as b24

    old = b24._MIN_DOCS
    b24._MIN_DOCS = 2
    try:
        df = spark.createDataFrame(
            [(1, "x y x y"), (2, "y x")], ["doc_id", "text"]
        )
        edges = [(r["src"], r["dst"]) for r in _word_edges(df).collect()]
    finally:
        b24._MIN_DOCS = old
    # both docs contain the same unordered pair exactly once each
    assert edges == [("x", "y")]


def test_key_stats_skew_factor_and_salt(spark):
    # 10 rows on key 'hot', 1 each on 5 cold keys: n_rows=15, n_keys=6,
    # avg=2.5, max=10 -> skew = 10*6*100 div 15 = 400 (4.00x avg);
    # salt = ceil(10*6 / (2*15)) = 2 (split the hot key to ~2x avg)
    rows = [("hot",)] * 10 + [(k,) for k in "abcde"]
    df = spark.createDataFrame(rows, ["k"])
    r = _key_stats(df, "k", "t.k").head()
    assert r["n_rows"] == 15 and r["n_keys"] == 6
    assert r["max_key_rows"] == 10
    assert r["skew_x100"] == 400
    assert r["salt_buckets"] == 2


def test_key_stats_uniform_keys_need_no_salt(spark):
    df = spark.createDataFrame([(k,) for k in "abcd"], ["k"])
    r = _key_stats(df, "k", "t.k").head()
    assert r["skew_x100"] == 100  # exactly average
    assert r["salt_buckets"] == 1


def test_prefix_filter_shrinks_candidates_without_recall_loss(spark):
    from postgresimporter_spark.operators.dedup import (
        prefix_candidate_count,
    )
    from postgresimporter_spark.plans.catalog_northstar import _duped_docs

    docs = _duped_docs(spark, "/root/testdata/sf0.001")
    pref, full = prefix_candidate_count(docs, threshold_pct=80)
    # exactness is pinned by q158 sharing q25's oracle; this pins the
    # POINT of the technique: a much smaller candidate set
    assert pref < full / 5, (pref, full)
    # ...while still containing every true pair (>=1 candidate per
    # true near-dup: the fixture has 100 exact copies)
    assert pref >= 100


def test_sorted_neighborhood_window_and_block_boundaries(spark):
    from postgresimporter_spark.operators.linkage import (
        sorted_neighborhood_pairs,
    )

    # keys sort as k00..k11; window 3 must pair records ACROSS the
    # idx-div-3 block boundary (e.g. idx 3 with idx 4..6)
    df = spark.createDataFrame(
        [(i, f"k{i:02d}") for i in range(12)], ["doc_id", "text"]
    )
    pairs = sorted_neighborhood_pairs(
        df, key=F.col("text"), window=3
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    want = {
        (a, b)
        for a in range(12)
        for b in range(12)
        if 0 < b - a <= 3
    }
    assert got == want


def test_sorted_neighborhood_no_duplicate_pairs(spark):
    from postgresimporter_spark.operators.linkage import (
        sorted_neighborhood_pairs,
    )

    df = spark.createDataFrame(
        [(i, "same-key") for i in range(6)], ["doc_id", "text"]
    )
    pairs = sorted_neighborhood_pairs(df, key=F.col("text"), window=2)
    rows = [(r["id_a"], r["id_b"]) for r in pairs.collect()]
    assert len(rows) == len(set(rows))  # each pair exactly once


def test_bm25_multi_matches_single_query(spark):
    from postgresimporter_spark.operators.textindex import (
        bm25_multi_topk,
        bm25_topk,
    )
    from postgresimporter_spark.sources.parquet import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.001", ["documents"])[
        "documents"
    ]
    terms = ["table", "spark", "query"]
    single = {
        r["doc_id"]: r["score_micro"]
        for r in bm25_topk(docs, terms, k=5).collect()
    }
    q = spark.createDataFrame(
        [(1, t) for t in terms], ["query_id", "term"]
    )
    multi = {
        r["doc_id"]: r["score_micro"]
        for r in bm25_multi_topk(docs, q, k=5).collect()
    }
    assert multi == single


def test_bm25_query_df_guard_elides_stop_words_only(spark):
    from postgresimporter_spark.operators.textindex import bm25_multi_topk

    # 'stop' appears in every doc; 'rare' in one. With the guard at
    # 0.5, 'stop' is elided from scoring and the rare-term ranking is
    # unchanged; without it, 'stop' fans out to every document.
    docs = spark.createDataFrame(
        [(i, "stop " + ("rare" if i == 3 else "filler")) for i in range(6)],
        ["doc_id", "text"],
    )
    q = spark.createDataFrame(
        [(1, "stop"), (1, "rare")], ["query_id", "term"]
    )
    unguarded = bm25_multi_topk(docs, q, k=6)
    assert unguarded.count() == 6  # every doc matches via 'stop'
    guarded = bm25_multi_topk(docs, q, k=6, max_query_df_ratio=0.5)
    rows = guarded.collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 3  # only 'rare' hit


def test_plan_audit_counters(spark):
    from pyspark.sql import Window

    from postgresimporter_spark.plans.audit import plan_audit
    from postgresimporter_spark.sources.parquet import load_tables

    t = load_tables(
        spark, "/root/testdata/sf0.001", ["nation", "region"]
    )
    joined = t["nation"].join(
        t["region"],
        t["nation"]["n_regionkey"] == t["region"]["r_regionkey"],
    )
    a = plan_audit(joined)
    assert a["n_broadcast_joins"] >= 1
    assert a["n_rowwise_python"] == 0
    assert a["n_cartesian"] == 0
    assert a["n_scans"] == 2

    gw = t["nation"].withColumn(
        "rk",
        F.row_number().over(Window.orderBy("n_nationkey")),
    )
    bad = plan_audit(gw)
    assert len(bad["unpartitioned_windows"]) == 1

    filtered = t["nation"].where(F.col("n_nationkey") > 5).select(
        "n_name"
    )
    f = plan_audit(filtered)
    assert f["n_scans_with_pushdown"] == 1
    assert f["n_exchanges"] == 0


def test_char_grams_short_strings_single_gram(spark):
    from postgresimporter_spark.operators.linkage import _grams

    df = spark.createDataFrame([("a",), ("ab",), ("abc",)], ["t"])
    out = {
        r["t"]: r["g"]
        for r in df.select(
            "t", _grams(F.col("t"), 2).alias("g")
        ).collect()
    }
    assert out == {"a": ["a"], "ab": ["ab"], "abc": ["ab", "bc"]}


def test_radius_pairs_boundary_and_exactly_once(spark):
    from postgresimporter_spark.operators.spatial import radius_pairs

    # pairs straddling a cell boundary (x=49 vs x=51) must be found;
    # a co-located pair must appear exactly once despite 9 shared
    # neighbor cells; just-outside pairs must not appear
    df = spark.createDataFrame(
        [
            (1, 49, 10),
            (2, 51, 10),     # dist 2 from id 1, adjacent cells
            (3, 49, 10),     # co-located with 1
            (4, 102, 10),    # dist 51 from id 2 -> excluded (r=50)
            (5, 300, 300),   # isolated
        ],
        ["pid", "x", "y"],
    )
    rows = radius_pairs(df, "x", "y", "pid", radius=50).collect()
    pairs = sorted((r["id_a"], r["id_b"]) for r in rows)
    assert pairs == [(1, 2), (1, 3), (2, 3)]
    assert len(pairs) == len(set(pairs))  # exactly once each


def test_radius_pairs_exact_distance_cut(spark):
    from postgresimporter_spark.operators.spatial import radius_pairs

    # 3-4-5 triangle: distance exactly 50 at (30, 40) offset -> kept
    # (<=); one unit farther -> dropped
    df = spark.createDataFrame(
        [(1, 0, 0), (2, 30, 40), (3, 30, 41)], ["pid", "x", "y"]
    )
    rows = {
        (r["id_a"], r["id_b"]): r["dist_sq"]
        for r in radius_pairs(df, "x", "y", "pid", radius=50).collect()
    }
    assert rows[(1, 2)] == 2500
    assert (1, 3) not in rows


def test_scan_details_lineage(spark):
    from postgresimporter_spark.plans.audit import scan_details
    from postgresimporter_spark.sources.parquet import load_tables

    t = load_tables(spark, "/root/testdata/sf0.001", ["lineitem"])
    q = (
        t["lineitem"]
        .where(F.col("l_quantity") > 30)
        .select("l_orderkey", "l_quantity")
    )
    scans = scan_details(q)
    assert len(scans) == 1
    s = scans[0]
    assert s["format"].lower() == "parquet"
    assert "lineitem" in s["location"]
    # projection pruning reflected: only the touched columns
    assert set(s["columns"]) == {"l_orderkey", "l_quantity"}
    assert any("l_quantity" in f for f in s["pushed_filters"])
