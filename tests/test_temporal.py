"""Unit tests for the temporal operators (as-of join, interval join,
gap-filled rollup) and the banded near-dup pair joins, on hand-built
micro-fixtures. The oracle check (q82-q86) covers fixture-scale
behavior; these pin the edge semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from postgresimporter_spark.operators import dedup as D
from postgresimporter_spark.operators import similarity as S
from postgresimporter_spark.operators import temporal as TP


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def _events(spark, rows, cols=("id", "k", "ts", "v")):
    return spark.createDataFrame(rows, list(cols))


# asof_join ------------------------------------------------------------------


def test_asof_strict_excludes_same_instant(spark):
    left = _events(spark, [(1, "a", _ts(5), 0.0)])
    right = spark.createDataFrame(
        [("a", _ts(5), 50.0), ("a", _ts(3), 30.0)], ["k", "ts", "v"]
    )
    out = TP.asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts", value_cols=["v"]
    ).collect()
    # strict: the right row AT :05 is invisible; :03 wins
    assert out[0].asof_v == 30.0 and out[0].asof_ts == _ts(3)

    out2 = TP.asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts",
        value_cols=["v"], strict=False,
    ).collect()
    assert out2[0].asof_v == 50.0  # at-or-before: same instant matches


def test_asof_no_match_is_null_and_inner_drops(spark):
    left = _events(spark, [(1, "a", _ts(1), 0.0), (2, "b", _ts(9), 0.0)])
    right = spark.createDataFrame([("a", _ts(2), 20.0)], ["k", "ts", "v"])
    rows = {
        r.id: r
        for r in TP.asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts", value_cols=["v"]
        ).collect()
    }
    assert rows[1].asof_v is None and rows[1].asof_ts is None
    assert rows[2].asof_v is None  # key 'b' has no right rows at all
    inner = TP.asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts",
        value_cols=["v"], how="inner",
    ).collect()
    assert inner == []


def test_asof_picks_latest_prior_per_key(spark):
    left = _events(
        spark, [(1, "a", _ts(10), 0.0), (2, "a", _ts(20), 0.0)]
    )
    right = spark.createDataFrame(
        [("a", _ts(4), 4.0), ("a", _ts(9), 9.0), ("a", _ts(15), 15.0)],
        ["k", "ts", "v"],
    )
    rows = {
        r.id: r.asof_v
        for r in TP.asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts", value_cols=["v"]
        ).collect()
    }
    assert rows == {1: 9.0, 2: 15.0}


def test_asof_join_is_single_shuffle(spark):
    """The union-merge shape must cost ONE exchange (the window
    partitioning) — not a range join, not a per-side shuffle pair."""
    left = _events(spark, [(1, "a", _ts(5), 0.0)])
    right = spark.createDataFrame([("a", _ts(3), 3.0)], ["k", "ts", "v"])
    plan = TP.asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts", value_cols=["v"]
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


# interval_join --------------------------------------------------------------


def _intervals(spark, rows):
    return spark.createDataFrame(rows, ["iid", "start_ts", "end_ts"])


def test_interval_join_boundaries_half_open(spark):
    pts = spark.createDataFrame(
        [(1, _ts(10)), (2, _ts(19)), (3, _ts(20)), (4, _ts(9))],
        ["pid", "ts"],
    )
    iv = _intervals(spark, [(100, _ts(10), _ts(20))])
    got = sorted(
        r.pid
        for r in TP.interval_join(
            pts, iv, "ts", "start_ts", "end_ts", granularity_s=60
        ).collect()
    )
    assert got == [1, 2]  # start inclusive, end exclusive


def test_interval_join_spanning_many_buckets_no_dup_matches(spark):
    # interval spans 10 one-minute buckets; each contained point must
    # match exactly once despite the interval exploding into 10 keys
    pts = spark.createDataFrame(
        [(i, _ts(i)) for i in range(15)], ["pid", "ts"]
    )
    iv = _intervals(spark, [(100, _ts(2), _ts(12))])
    out = TP.interval_join(
        pts, iv, "ts", "start_ts", "end_ts", granularity_s=60
    ).collect()
    assert sorted(r.pid for r in out) == list(range(2, 12))


def test_interval_join_overlapping_intervals(spark):
    pts = spark.createDataFrame([(1, _ts(5))], ["pid", "ts"])
    iv = _intervals(
        spark, [(100, _ts(0), _ts(10)), (200, _ts(4), _ts(6))]
    )
    got = sorted(
        r.iid
        for r in TP.interval_join(
            pts, iv, "ts", "start_ts", "end_ts", granularity_s=300
        ).collect()
    )
    assert got == [100, 200]


# time_bucket_gapfill --------------------------------------------------------


def test_gapfill_fills_missing_buckets(spark):
    df = spark.createDataFrame(
        [
            ("x", dt.datetime(2024, 1, 1, 0, 30), 1.0),
            ("x", dt.datetime(2024, 1, 1, 3, 10), 2.0),
            ("y", dt.datetime(2024, 1, 1, 1, 0), 5.0),
        ],
        ["g", "ts", "v"],
    )
    out = TP.time_bucket_gapfill(
        df,
        ts_col="ts",
        bucket="hour",
        group_cols=["g"],
        aggs=[F.count("*").alias("n")],
        fill={"n": F.lit(0).cast("long")},
    )
    rows = {(r.g, r.bucket_ts.hour): r.n for r in out.collect()}
    # span is hours 0..3 for BOTH groups (global span x all groups)
    assert len(rows) == 8
    assert rows[("x", 0)] == 1 and rows[("x", 3)] == 1
    assert rows[("x", 1)] == 0 and rows[("x", 2)] == 0
    assert rows[("y", 1)] == 1 and rows[("y", 0)] == 0


# simhash_hamming_pairs ------------------------------------------------------


def test_hamming_banding_is_exact_vs_brute_force(spark):
    """Pigeonhole: with 4 chunks and max_hamming 3, banded candidates
    must reproduce brute force exactly on fingerprints engineered to
    differ in specific chunks."""
    fps = [
        (1, 0b0000_0000_0000_0000_0000_0000_0000_0000),
        (2, 0b0000_0000_0000_0000_0000_0000_0000_0111),  # ham 3 vs 1
        (3, 0b1000_0000_1000_0000_1000_0000_1000_0000),  # spread across chunks
        (4, 0b1000_0000_1000_0000_1000_0000_1000_0001),  # ham 1 vs 3
        (5, 0b1111_1111_1111_1111_0000_0000_0000_0000),
    ]
    df = spark.createDataFrame(fps, ["id", "simhash"])
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in D.simhash_hamming_pairs(df, max_hamming=3).collect()
    }
    expect = {}
    for i, (ia, fa) in enumerate(fps):
        for ib, fb in fps[i + 1:]:
            h = bin(fa ^ fb).count("1")
            if h <= 3:
                expect[(ia, ib)] = h
    assert got == expect and (1, 2) in got and (3, 4) in got


def test_hamming_rejects_uneven_chunks(spark):
    df = spark.createDataFrame([(1, 0)], ["id", "simhash"])
    import pytest

    with pytest.raises(ValueError):
        D.simhash_hamming_pairs(df, bits=32, chunks=5)


# signband_neardup_pairs -----------------------------------------------------


def test_signband_finds_planted_neardup(spark):
    import random

    rng = random.Random(7)
    base = [rng.uniform(-1, 1) for _ in range(16)]
    near = [x + 0.001 for x in base]
    far = [-x for x in base]
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], ["vec_id", "embedding"]
    )
    out = S.signband_neardup_pairs(df, threshold=0.99)
    rows = [(r.id_a, r.id_b) for r in out.collect()]
    assert rows == [(1, 2)]


def test_signband_candidates_via_shared_band_only(spark):
    """Vectors with NO shared band key are never compared, even if
    cosine-close: precision of the contract is 'shared band AND
    cosine' (the oracle replicates both)."""
    a = [1.0] * 16
    b = [-1.0] * 16  # opposite signs in every band, cosine -1 anyway
    df = spark.createDataFrame([(1, a), (2, b)], ["vec_id", "embedding"])
    assert S.signband_neardup_pairs(df, threshold=-2.0).count() == 0


def test_signband_duplicate_families_exact_pairs(spark):
    """Exact-duplicate families (the crawl re-post / sf1-construction
    shape) emit exactly the C(k,2) within-family id pairs at cosine
    1.0 plus planted cross pairs — the value-level rewrite (distinct
    vectors band/verify, expand to ids last) must not change the pair
    set, only remove the k^2 candidate work (round-10 repro: 10x
    duplication pushed the id-level join past 600s at sf0.1)."""
    import itertools
    import random

    rng = random.Random(11)
    base = [rng.uniform(-1, 1) for _ in range(16)]
    near = [x + 0.001 for x in base]
    far = [rng.uniform(-1, 1) for _ in range(16)]
    rows = []
    for j in range(4):  # 4 exact copies of base and of far
        rows.append((10 + j, base))
        rows.append((50 + j, far))
    rows.append((99, near))  # near-dup of the base family
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in S.signband_neardup_pairs(df, threshold=0.99).collect()
    }
    want_pairs = set(itertools.combinations([10, 11, 12, 13], 2)) | {
        (10, 99), (11, 99), (12, 99), (13, 99)
    } | set(itertools.combinations([50, 51, 52, 53], 2))
    assert set(got) == want_pairs
    for (a, b), c in got.items():
        assert c == 1.0 if b != 99 else c >= 0.99


def test_signband_hot_bucket_cap_with_duplicates(spark):
    """The bucket cap counts ROWS (ids), not distinct values: a value
    duplicated past the cap threshold still trips the cap exactly as
    the id-level formulation did, removing its family's pairs when
    every band is hot."""
    a = [1.0] * 16
    rows = [(i, a) for i in range(10)]  # 10 copies -> every bucket 10/11
    rows.append((100, [-1.0] * 16))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    # cap at 50% of 11 rows: the 10-copy family's buckets (size 10) die
    # in every band -> no pairs at all
    assert (
        S.signband_neardup_pairs(
            df, threshold=-2.0, max_bucket_ratio=0.5
        ).count()
        == 0
    )
    # without the cap the family pairs among itself: C(10,2) = 45
    # (the far vector shares no band, so threshold=-2 still can't
    # pair it — candidates require a shared band key)
    assert S.signband_neardup_pairs(df, threshold=-2.0).count() == 45


def test_asof_forward_direction(spark):
    left = _events(spark, [(1, "a", _ts(5), 0.0)])
    right = spark.createDataFrame(
        [("a", _ts(5), 50.0), ("a", _ts(8), 80.0), ("a", _ts(3), 30.0)],
        ["k", "ts", "v"],
    )
    fwd = TP.asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts",
        value_cols=["v"], direction="forward",
    ).collect()
    # strict forward: same-instant row invisible; earliest AFTER wins
    assert fwd[0].asof_v == 80.0 and fwd[0].asof_ts == _ts(8)
    fwd2 = TP.asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts",
        value_cols=["v"], direction="forward", strict=False,
    ).collect()
    assert fwd2[0].asof_v == 50.0  # at-or-after matches the same instant

    import pytest

    with pytest.raises(ValueError):
        TP.asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            value_cols=["v"], direction="sideways",
        )


# kmeans_lloyd ---------------------------------------------------------------


def test_kmeans_separates_obvious_clusters(spark):
    pts = (
        [(i, [0.0 + i * 0.001, 0.0]) for i in range(5)]
        + [(10 + i, [10.0 + i * 0.001, 10.0]) for i in range(5)]
    )
    from postgresimporter_spark.operators.kmeans import kmeans_lloyd

    df = spark.createDataFrame(pts, ["vec_id", "embedding"])
    out = kmeans_lloyd(df, k=2, iters=3)
    got = {r.vec_id: r.cid for r in out.collect()}
    low = {got[i] for i in range(5)}
    high = {got[10 + i] for i in range(5)}
    assert len(low) == 1 and len(high) == 1 and low != high


def test_kmeans_requires_k_rows(spark):
    import pytest

    from postgresimporter_spark.operators.kmeans import kmeans_lloyd

    df = spark.createDataFrame([(1, [0.0])], ["vec_id", "embedding"])
    with pytest.raises(ValueError):
        kmeans_lloyd(df, k=5, iters=1)


def test_signband_hot_bucket_cap(spark):
    """With a cap, rows in a hot band bucket are dropped from that band
    only: a pair relying solely on the hot band is lost, a pair that
    also shares rare bands survives."""
    # 16-dim vectors: band 0 = dims 0-3, band 1 = dims 4-7, ...
    hot = [1.0] * 4  # every row shares band 0 key '1111' (the hot bucket)
    a = hot + [1.0] * 12     # bands 1-3: '1111'
    b = hot + [1.0] * 12     # identical to a
    c = hot + [-1.0] * 12    # bands 1-3: '0000' -> shares ONLY band 0 with a/b
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], ["vec_id", "embedding"]
    )
    uncapped = {
        (r.id_a, r.id_b)
        for r in S.signband_neardup_pairs(df, threshold=-2.0).collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in S.signband_neardup_pairs(
            df, threshold=-2.0, max_bucket_ratio=0.9
        ).collect()
    }
    assert uncapped == {(1, 2), (1, 3), (2, 3)}
    # band 0 holds 3/3 rows (> 0.9) -> dropped; (1,3)/(2,3) relied on it
    assert capped == {(1, 2)}


def test_ewma_hand_computed(spark):
    import datetime as dt

    from postgresimporter_spark.operators.temporal import ewma

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: values 10, 20, 30 in ts order (ids break the ts tie)
        (1, t0, 1, 10.0),
        (1, t0, 2, 20.0),
        (1, t0 + dt.timedelta(minutes=1), 3, 30.0),
        # user 2: single event -> ewma = the value
        (2, t0, 4, 7.5),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    got = {r.user_id: r for r in ewma(df, alpha_pct=25).collect()}
    # s = 10 -> 0.25*20+0.75*10 = 12.5 -> 0.25*30+0.75*12.5 = 16.875
    assert got[1].n_events == 3 and abs(got[1].ewma - 16.875) < 1e-9
    assert got[2].n_events == 1 and got[2].ewma == 7.5


def test_interval_join_raises_on_bucket_explosion(spark):
    """An interval spanning more than max_buckets_per_interval buckets
    raises loudly at execution (r10: a year-long interval at 60s
    granularity builds a 525,600-element in-row sequence array before
    exploding — 200 of them OOM'd an 8g heap silently). Sane inputs
    and a raised limit are unaffected."""
    import pytest

    from postgresimporter_spark.operators.temporal import interval_join

    pts = spark.createDataFrame(
        [("2024-01-05 00:00:00",)], "ts string"
    ).selectExpr("CAST(ts AS TIMESTAMP) AS ts")
    ivs = spark.createDataFrame(
        [("2024-01-01 00:00:00", "2025-01-01 00:00:00")],
        "s string, e string",
    ).selectExpr(
        "CAST(s AS TIMESTAMP) AS s", "CAST(e AS TIMESTAMP) AS e"
    )
    with pytest.raises(Exception, match="more than 1000 buckets"):
        interval_join(
            pts, ivs, "ts", "s", "e", granularity_s=60,
            max_buckets_per_interval=1000,
        ).collect()
    # same join succeeds with the budget raised
    n = interval_join(
        pts, ivs, "ts", "s", "e", granularity_s=60,
        max_buckets_per_interval=1_000_000,
    ).count()
    assert n == 1


# interval_join multi_level ---------------------------------------------------


def test_interval_join_multilevel_identity_vs_single_level(spark):
    """On a corpus the single-level path handles, multi_level=True must
    return the identical pair set (the decomposition is an identity
    rewrite, not an approximation)."""
    base = dt.datetime(2024, 1, 1)

    def m(n: int) -> dt.datetime:
        return base + dt.timedelta(minutes=n)

    pts = spark.createDataFrame(
        [(i, m(3 * i)) for i in range(40)], ["pid", "ts"]
    )
    iv = _intervals(
        spark,
        [
            (100, m(2), m(12)),
            (200, m(4), m(6)),
            (300, m(50), m(90)),
            (400, m(0), m(120)),
        ],
    )
    a = sorted(
        (r.pid, r.iid)
        for r in TP.interval_join(
            pts, iv, "ts", "start_ts", "end_ts", granularity_s=60
        ).collect()
    )
    b = sorted(
        (r.pid, r.iid)
        for r in TP.interval_join(
            pts, iv, "ts", "start_ts", "end_ts", granularity_s=60,
            multi_level=True,
        ).collect()
    )
    assert a == b and len(a) > 0


def test_interval_join_multilevel_mixed_durations(spark):
    """The shape the single-level path REJECTS (r10 bucket-budget
    guard): minute-scale intervals mixed with a year-long window at
    60s base granularity. Multi-level must match a brute-force range
    join exactly, including half-open boundaries at every level."""
    base = dt.datetime(2024, 1, 1)
    pts = spark.createDataFrame(
        [(i, base + dt.timedelta(hours=7 * i)) for i in range(600)],
        ["pid", "ts"],
    )
    iv = spark.createDataFrame(
        [
            (1, base + dt.timedelta(hours=14), base + dt.timedelta(hours=14, minutes=10)),
            (2, base + dt.timedelta(days=2), base + dt.timedelta(days=3)),
            (3, base - dt.timedelta(days=10), base + dt.timedelta(days=400)),
            (4, base, base),  # empty: matches nothing
        ],
        ["iid", "start_ts", "end_ts"],
    )
    got = sorted(
        (r.pid, r.iid)
        for r in TP.interval_join(
            pts, iv, "ts", "start_ts", "end_ts", granularity_s=60,
            multi_level=True,
        ).collect()
    )
    exp = sorted(
        (r.pid, r.iid)
        for r in pts.join(
            iv,
            (F.col("ts") >= F.col("start_ts"))
            & (F.col("ts") < F.col("end_ts")),
        ).collect()
    )
    assert got == exp and len(got) > 0
    assert not any(i == 4 for _, i in got)


def test_interval_join_multilevel_level_boundary_durations(spark):
    """Durations exactly at bucket-width powers of two (where a float
    log2 could mis-level): an interval of exactly g*2^l seconds may
    start mid-bucket and span two buckets — every contained point must
    still match exactly once."""
    base = dt.datetime(2024, 1, 1)
    ivs = []
    for j, secs in enumerate([60, 120, 240, 480, 960, 61, 119, 241]):
        s = base + dt.timedelta(seconds=30 + 1000 * j)
        ivs.append((j, s, s + dt.timedelta(seconds=secs)))
    iv = spark.createDataFrame(ivs, ["iid", "start_ts", "end_ts"])
    pts = spark.createDataFrame(
        [(i, base + dt.timedelta(seconds=i)) for i in range(0, 9000, 7)],
        ["pid", "ts"],
    )
    got = sorted(
        (r.pid, r.iid)
        for r in TP.interval_join(
            pts, iv, "ts", "start_ts", "end_ts", granularity_s=60,
            multi_level=True,
        ).collect()
    )
    exp = sorted(
        (r.pid, r.iid)
        for r in pts.join(
            iv,
            (F.col("ts") >= F.col("start_ts"))
            & (F.col("ts") < F.col("end_ts")),
        ).collect()
    )
    assert got == exp and len(got) > 0


def test_interval_join_multilevel_keyed_and_nulls(spark):
    """key_cols joins per (key, level, bucket); null timestamps on
    either side match nothing (SQL range-predicate semantics), and
    pre-1970 (negative-epoch) timestamps bucket correctly (arithmetic
    shift floors negatives)."""
    base = dt.datetime(2024, 1, 1)
    pts = spark.createDataFrame(
        [
            (1, "a", base + dt.timedelta(minutes=5)),
            (2, "b", base + dt.timedelta(minutes=5)),
            (3, "a", None),
            (4, "a", dt.datetime(1969, 6, 15)),
        ],
        ["pid", "k", "ts"],
    )
    iv = spark.createDataFrame(
        [
            (10, "a", base, base + dt.timedelta(minutes=10)),
            (20, "b", base, base + dt.timedelta(minutes=10)),
            (30, "a", dt.datetime(1969, 6, 1), dt.datetime(1969, 7, 1)),
            (40, "a", base, None),
        ],
        ["iid", "k", "start_ts", "end_ts"],
    )
    got = sorted(
        (r.pid, r.iid)
        for r in TP.interval_join(
            pts, iv, "ts", "start_ts", "end_ts", granularity_s=60,
            key_cols=["k"], multi_level=True,
        ).collect()
    )
    assert got == [(1, 10), (2, 20), (4, 30)]


def test_interval_join_multilevel_empty_intervals_and_clash(spark):
    import pytest

    pts = spark.createDataFrame([(1, _ts(5))], ["pid", "ts"])
    iv = _intervals(spark, [(1, _ts(0), _ts(10))]).where(F.lit(False))
    out = TP.interval_join(
        pts, iv, "ts", "start_ts", "end_ts", granularity_s=60,
        multi_level=True,
    )
    assert out.count() == 0
    assert set(out.columns) == {"pid", "ts", "iid", "start_ts", "end_ts"}
    with pytest.raises(ValueError, match="_bucket"):
        TP.interval_join(
            pts.withColumn("_bucket", F.lit(1)),
            _intervals(spark, [(1, _ts(0), _ts(10))]),
            "ts", "start_ts", "end_ts", granularity_s=60,
            multi_level=True,
        )
