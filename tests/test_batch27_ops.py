"""Edge-case tests for the batch-27 operators (portable HLL,
winnowing, CUSUM/ACF, SymSpell, k-core, bucket fingerprints)."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgresimporter_spark.operators.diffops import (
    bucket_diff,
    bucket_fingerprints,
)
from postgresimporter_spark.operators.graph import kcore
from postgresimporter_spark.operators.linkage import (
    deletion_neighborhood_pairs,
)
from postgresimporter_spark.operators.sketches import (
    HLL_M,
    hll_portable,
)
from postgresimporter_spark.operators.temporal import (
    cusum_scaled,
    lag_autocorr,
)
from postgresimporter_spark.operators.textstats import (
    winnowing_fingerprints,
)

# -- portable HLL -----------------------------------------------------------

def test_hll_portable_state_and_envelope(spark):
    n = 2000
    df = spark.range(n).select(
        F.lit("g").alias("k"), F.col("id").alias("v")
    )
    out = hll_portable(df, ["k"], "v").collect()
    assert len(out) == 1
    row = out[0]
    assert 0 < row.hit_registers <= HLL_M
    # standard error for m=64 is ~13%; allow 4 sigma
    assert abs(row.est_distinct - n) / n < 0.52
    # determinism: a different row order gives the identical sketch
    df2 = df.orderBy(F.desc("v"))
    row2 = hll_portable(df2, ["k"], "v").collect()[0]
    assert (row2.hit_registers, row2.z_scaled, row2.est_distinct) == (
        row.hit_registers, row.z_scaled, row.est_distinct
    )

def test_hll_portable_duplicates_dont_move_estimate(spark):
    base = spark.range(500).select(
        F.lit("g").alias("k"), F.col("id").alias("v")
    )
    duped = base.unionAll(base).unionAll(base)
    a = hll_portable(base, ["k"], "v").collect()[0]
    b = hll_portable(duped, ["k"], "v").collect()[0]
    assert a.z_scaled == b.z_scaled and a.est_distinct == b.est_distinct

# -- winnowing --------------------------------------------------------------

def test_winnowing_short_doc_yields_nothing(spark):
    # 5 tokens -> 2 4-grams -> fewer than w=4 windows: no fingerprints
    df = spark.createDataFrame(
        [(1, "a b c d e")], "doc_id long, text string"
    )
    assert winnowing_fingerprints(df, k=4, w=4).count() == 0

def test_winnowing_shared_passage_shares_fingerprint(spark):
    # MOSS guarantee: a common substring of >= w + k - 1 = 7 tokens
    # must share at least one selected fingerprint
    common = "x1 x2 x3 x4 x5 x6 x7 x8 x9"
    df = spark.createDataFrame(
        [
            (1, "p q r " + common + " s t"),
            (2, common + " u v w z1 z2 z3"),
        ],
        "doc_id long, text string",
    )
    fps = winnowing_fingerprints(df, k=4, w=4)
    shared = (
        fps.groupBy("fp").agg(F.count_distinct("doc_id").alias("n"))
        .where(F.col("n") == 2)
    )
    assert shared.count() >= 1

def test_winnowing_density(spark):
    text = " ".join(f"t{i}" for i in range(104))  # 101 grams, 98 windows
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    n = winnowing_fingerprints(df, k=4, w=4).count()
    # expected density 2/(w+1) = 0.4 of 98 windows ~ 39; generous band
    assert 15 <= n <= 75

def test_winnowing_chunked_identity(spark):
    """r12 giant-doc straggler fix: the token-slice chunked path
    produces the EXACT row set of the single-window path — exercised
    with tiny chunks (3, 8: below and near w, so nearly every window
    crosses a slice boundary), plus multi-doc, short-doc (< w grams),
    and sub-k-token (raw_ngrams' one-short-gram quirk) edges."""
    docs = [
        (1, " ".join(f"t{(i * 7) % 23}" for i in range(300))),
        (2, " ".join(f"u{(i * 5) % 11}" for i in range(97))),
        (3, "a b c d e"),  # too short: no full window
        (4, "a b"),  # fewer than k tokens: one short gram
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    base = {
        (r.doc_id, r.pos, r.fp)
        for r in winnowing_fingerprints(df, k=4, w=4, chunk=None).collect()
    }
    for c in (3, 8, 16, 1 << 16):
        got = {
            (r.doc_id, r.pos, r.fp)
            for r in winnowing_fingerprints(
                df, k=4, w=4, chunk=c
            ).collect()
        }
        assert got == base, f"chunk={c}"


def test_winnowing_lag_dedup_matches_reference(spark):
    """r13-opt: the distinct() was replaced by a lag-based run dedup
    (identical selections come only from consecutive window starts).
    Pin against a pure-Python reference on repetitive corpora — long
    identical-hash runs crossing chunk boundaries are the worst case —
    and assert the operator emits NO duplicate rows (distinct is gone,
    so a dedup bug would show as extra rows, not wrong values)."""
    import hashlib

    def ref(text, k=4, w=4):
        toks = text.strip().split()
        grams = (
            [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
            if len(toks) >= k
            else [" ".join(toks)]
        )
        hs = [
            int(hashlib.md5(("0:" + g).encode()).hexdigest()[:15], 16)
            for g in grams
        ]
        out = set()
        for s in range(len(hs) - w + 1):
            win = hs[s : s + w]
            m = min(win)
            p = s + max(i for i, v in enumerate(win) if v == m)
            out.add((p, m))
        return out

    docs = [
        (1, " ".join(["a"] * 60)),  # one gram value: one long run
        (2, " ".join(["a", "b"] * 40)),  # period-2 runs
        (3, " ".join(str((i * i) % 5) for i in range(90))),
        (4, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    want = {
        (d, p, h) for d, t in docs for (p, h) in ref(t)
    }
    for c in (None, 2, 7, 1 << 16):
        rows = winnowing_fingerprints(df, k=4, w=4, chunk=c).collect()
        got = [(r.doc_id, r.pos, r.fp) for r in rows]
        assert len(got) == len(set(got)), f"duplicate rows at chunk={c}"
        assert set(got) == want, f"chunk={c}"


# -- CUSUM / autocorrelation ------------------------------------------------

def test_cusum_scaled_hand_example(spark):
    # series 1, 1, 4 (n=3, total=6): s_scaled = 3*cum - i*6
    df = spark.createDataFrame(
        [("a", 1, 1), ("a", 2, 1), ("a", 3, 4)], "k string, t int, x int"
    )
    rows = {
        r.t: r.s_scaled
        for r in cusum_scaled(df, ["k"], "t", "x").collect()
    }
    assert rows == {1: 3 * 1 - 6, 2: 3 * 2 - 12, 3: 3 * 6 - 18}
    assert rows[3] == 0  # CUSUM always returns to zero at the end

def test_lag_autocorr_alternating_series(spark):
    # x = +1/-1 alternating, n=6: y = 6x - 0; r1 = -1, r2 = +1 (edge
    # terms shrink the numerator: r1 = -5/6, r2 = 4/6 exactly)
    data = [("a", i, 1 if i % 2 == 0 else -1) for i in range(6)]
    df = spark.createDataFrame(data, "k string, t int, x int")
    out = {
        r.lag: (r.num, r.den)
        for r in lag_autocorr(df, ["k"], "t", "x", max_lag=2).collect()
    }
    assert out[1] == (-5 * 36, 6 * 36)
    assert out[2] == (4 * 36, 6 * 36)

# -- SymSpell ---------------------------------------------------------------

def test_deletion_neighborhood_exact_candidates(spark):
    terms = ["abc", "abd", "abcd", "ab", "xyz", "azc"]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    got = {
        (r.term_a, r.term_b)
        for r in deletion_neighborhood_pairs(df).collect()
    }
    # substitution, insertion, deletion all found; nothing at dist 2
    assert got == {
        ("ab", "abc"),        # deletion
        ("ab", "abd"),        # deletion
        ("abc", "abd"),       # substitution
        ("abc", "abcd"),      # insertion
        ("abc", "azc"),       # substitution
        ("abcd", "abd"),      # insertion ('abcd' < 'abd' lexically)
    }

def _lev(a: str, b: str) -> int:

    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(
                dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
            )
    return dp[len(b)]

def test_deletion_neighborhood_matches_brute_force(spark):
    # brute-force parity on a mixed vocabulary
    terms = [
        "spark", "spork", "sprk", "sparks", "stark", "shark",
        "quartz", "quart", "quarts", "zebra",
    ]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    got = {
        (r.term_a, r.term_b)
        for r in deletion_neighborhood_pairs(df).collect()
    }
    want = {
        (a, b)
        for i, a in enumerate(sorted(terms))
        for b in sorted(terms)[i + 1 :]
        if _lev(a, b) <= 1
    }
    assert got == want

# -- k-core -----------------------------------------------------------------

def test_kcore_peels_pendant_keeps_clique(spark):
    # triangle 1-2-3 plus pendant 3-4: 2-core = the triangle
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "src int, dst int"
    )
    out = {r.node: r.degree for r in kcore(edges, k=2, rounds=2).collect()}
    assert out == {1: 2, 2: 2, 3: 2}

def test_kcore_cascade(spark):
    # path 1-2-3-4-5: k=2 peels endpoints each round; 2 rounds leave 3
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src int, dst int"
    )
    r1 = set(r.node for r in kcore(edges, k=2, rounds=1).collect())
    assert r1 == {2, 3, 4}  # endpoints peeled; middle chain survives
    # next round peels the new degree-1 endpoints; the path fully erodes
    assert kcore(edges, k=2, rounds=2).count() == 0

# -- bucket fingerprints ----------------------------------------------------

def test_bucket_diff_empty_on_identical(spark):
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    fp = bucket_fingerprints(df, "k", ["v"], n_buckets=8)
    assert bucket_diff(fp, fp).count() == 0

def test_bucket_diff_flags_only_touched_buckets(spark):
    base = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    new = base.withColumn(
        "v", F.when(F.col("k") == 42, F.lit(-1)).otherwise(F.col("v"))
    )
    fb = bucket_fingerprints(base, "k", ["v"], n_buckets=8)
    fn = bucket_fingerprints(new, "k", ["v"], n_buckets=8)
    d = bucket_diff(fb, fn).collect()
    assert len(d) == 1
    # counts agree (no row added/removed), xor differs
    assert d[0].n_base == d[0].n_new and d[0].fp_base != d[0].fp_new

# -- point in polygon -------------------------------------------------------

def test_point_in_polygon_huge_vertex_count(spark):
    """r12 probe: the per-edge crossing fold must be a FLAT array +
    higher-order filter — the natural left-deep `crossings + c` chain
    blew the Catalyst analysis stack at 512 vertices (measured
    StackOverflowError at plan BUILD; real geofences are far bigger).
    A 2,048-vertex polygon must plan, run, and agree with the
    brute-force ray cast."""
    import math
    import random

    from postgresimporter_spark.operators.spatial import point_in_polygon

    nv = 2048
    verts = [
        (int(8000 * math.cos(2 * math.pi * i / nv)),
         int(8000 * math.sin(2 * math.pi * i / nv)))
        for i in range(nv)
    ]
    rng = random.Random(11)
    pts = [(i, rng.randrange(-10000, 10000), rng.randrange(-10000, 10000))
           for i in range(400)]
    df = spark.createDataFrame(pts, "pid long, x long, y long")
    got = {
        r.pid
        for r in point_in_polygon(df, [(1, verts)], "x", "y", "pid").collect()
    }

    def inside(px, py):
        c = 0
        for (x1, y1), (x2, y2) in zip(verts, verts[1:] + verts[:1]):
            if (y1 > py) != (y2 > py):
                cross = (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1)
                if (cross > 0) == (y2 > y1):
                    c += 1
        return c % 2 == 1

    want = {pid for pid, x, y in pts if inside(x, y)}
    assert got == want and len(want) > 50


def test_point_in_polygon_matches_shoelace_bruteforce(spark):
    import random

    from postgresimporter_spark.operators.spatial import point_in_polygon

    rng = random.Random(7)
    pts = [(i, rng.randrange(0, 500), rng.randrange(0, 500))
           for i in range(300)]
    polys = [
        (1, [(50, 50), (200, 60), (120, 190)]),
        (2, [(250, 250), (450, 260), (440, 450), (260, 430)]),
    ]
    df = spark.createDataFrame(pts, "pid long, x long, y long")
    got = {
        (r.poly_id, r.pid)
        for r in point_in_polygon(df, polys, "x", "y", "pid").collect()
    }

    def inside(px, py, verts):
        c = 0
        for (x1, y1), (x2, y2) in zip(verts, verts[1:] + verts[:1]):
            if (y1 > py) != (y2 > py):
                cross = (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1)
                if (cross > 0) == (y2 > y1):
                    c += 1
        return c % 2 == 1

    want = {
        (pid_p, i)
        for pid_p, verts in polys
        for i, px, py in pts
        if inside(px, py, verts)
    }
    assert got == want and len(want) > 10

# -- global running max (batch 34 machinery) --------------------------------

def test_global_running_max_matches_naive(spark):
    import random

    from postgresimporter_spark.operators.ranking import global_running_max

    rng = random.Random(11)
    rows = [(i, rng.randrange(0, 50)) for i in range(200)]
    df = spark.createDataFrame(rows, "k long, v long")
    out = {
        r.k: (r.row_idx, r.running_max)
        for r in global_running_max(
            df, [F.asc("k")], "v", num_partitions=7
        ).collect()
    }
    run = None
    for i, (k, v) in enumerate(sorted(rows), 1):
        run = v if run is None else max(run, v)
        assert out[k] == (i, run)

    # exclusive mode: strictly-earlier max, NULL for the first row
    ex = {
        r.k: r.running_max
        for r in global_running_max(
            df, [F.asc("k")], "v", num_partitions=7, inclusive=False
        ).collect()
    }
    prev = None
    for k, v in sorted(rows):
        assert ex[k] == prev
        prev = v if prev is None else max(prev, v)


def test_deletion_neighborhood_duplicated_terms(spark):
    """Round-9 guard: heavily duplicated input terms (the
    vocabulary-from-corpus shape) produce the same distinct pair set
    as their distinct vocabulary — and the plan distincts BEFORE the
    variant expansion, so a term's multiplicity never reaches the
    candidate equi-join (pre-fix: k^2 candidate rows per true pair)."""
    rows = [("cold",), ("old",), ("red",), ("rod",)] * 250
    df = spark.createDataFrame(rows, "term string")
    got = {
        (r.term_a, r.term_b, r.dist)
        for r in deletion_neighborhood_pairs(df).collect()
    }
    assert got == {("cold", "old", 1), ("red", "rod", 1)}
    # plan shape: the aggregate (distinct) sits below the explode
    plan = deletion_neighborhood_pairs(df)._jdf.queryExecution().optimizedPlan().toString()
    gen = plan.find("Generate")
    agg = plan.rfind("Aggregate")
    assert gen != -1 and agg != -1 and agg > gen, plan


def test_deletion_neighborhood_oversized_term_guard(spark):
    """r12 probe guard: the deletion neighborhood is O(len^2) bytes
    per term in ONE in-row array (measured: a lone 10k-char blob
    turned a 9.6s job into 86s; 40k never finished) — an over-cap term
    must RAISE with the named error, never stall or silently drop;
    max_term_len=None restores the unguarded path."""
    import pytest

    rows = [("cold",), ("old",), ("x" * 2000,)]
    df = spark.createDataFrame(rows, "term string")
    with pytest.raises(Exception, match="max_term_len"):
        deletion_neighborhood_pairs(df).collect()
    got = {
        (r.term_a, r.term_b, r.dist)
        for r in deletion_neighborhood_pairs(
            df, max_term_len=None
        ).collect()
    }
    assert got == {("cold", "old", 1)}
    # under-cap inputs are untouched by the guard
    got2 = {
        (r.term_a, r.term_b, r.dist)
        for r in deletion_neighborhood_pairs(
            df.where("length(term) < 100")
        ).collect()
    }
    assert got2 == {("cold", "old", 1)}


def test_deletion_neighborhood_multicolumn_frame(spark):
    """A multi-column frame (id + term, the corpus shape) produces the
    same pairs as the bare term column: distinct runs on the TERM
    column only, so duplicate terms under different ids can't defeat
    the k^2 candidate fix (ADVICE r9)."""
    terms = ["cat", "cart", "cast", "dog", "dig"]
    multi = spark.createDataFrame(
        [(i, t) for i, t in enumerate(terms * 4)], "id long, term string"
    )
    single = spark.createDataFrame([(t,) for t in terms], "term string")
    got = {
        (r.term_a, r.term_b, r.dist)
        for r in deletion_neighborhood_pairs(multi).collect()
    }
    want = {
        (r.term_a, r.term_b, r.dist)
        for r in deletion_neighborhood_pairs(single).collect()
    }
    assert got == want and got
