"""Property-based tests (hypothesis) for the round-4 operator tier:
each operator is pinned against an independent in-Python model over
generated inputs — the same differential discipline as the DuckDB
oracles, at the operator grain."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_PACK = 1 << 31


# -- KS via the packed prefix pass ------------------------------------------


@SETTINGS
@given(
    st.lists(st.integers(0, 20), min_size=2, max_size=40),
    st.lists(st.integers(0, 20), min_size=2, max_size=40),
)
def test_packed_prefix_ks_matches_python(spark, sample_a, sample_b):
    from postgresimporter_spark.operators.ranking import global_running_sum

    rows = [(v, 1, 0) for v in sample_a] + [(v, 0, 1) for v in sample_b]
    df = spark.createDataFrame(rows, "v long, a long, b long")
    levels = df.groupBy("v").agg(
        (F.sum("a") * _PACK + F.sum("b")).alias("enc")
    )
    cs = global_running_sum(
        levels, [F.asc("v")], "enc", rsum_col="rs", total_col="tot"
    )
    got = cs.select(
        F.max(
            F.abs(
                (F.col("tot") % _PACK) * F.expr(f"rs div {_PACK}")
                - F.expr(f"tot div {_PACK}") * (F.col("rs") % _PACK)
            )
        ).alias("d")
    ).collect()[0].d

    na, nb = len(sample_a), len(sample_b)
    want = max(
        abs(
            nb * sum(1 for x in sample_a if x <= v)
            - na * sum(1 for x in sample_b if x <= v)
        )
        for v in set(sample_a) | set(sample_b)
    )
    assert got == want


# -- k-core vs python peel ---------------------------------------------------


@SETTINGS
@given(
    st.sets(
        st.tuples(st.integers(0, 8), st.integers(0, 8)).filter(
            lambda e: e[0] < e[1]
        ),
        min_size=1,
        max_size=20,
    ),
    st.integers(1, 3),
)
def test_kcore_matches_python_peel(spark, edges, k):
    from postgresimporter_spark.operators.graph import kcore

    rounds = 3
    df = spark.createDataFrame(sorted(edges), "src int, dst int")
    got = {r.node: r.degree for r in kcore(df, k=k, rounds=rounds).collect()}

    es = set(edges)
    for _ in range(rounds):
        deg: dict[int, int] = {}
        for s, d in es:
            deg[s] = deg.get(s, 0) + 1
            deg[d] = deg.get(d, 0) + 1
        keep = {n for n, c in deg.items() if c >= k}
        es = {(s, d) for s, d in es if s in keep and d in keep}
    deg = {}
    for s, d in es:
        deg[s] = deg.get(s, 0) + 1
        deg[d] = deg.get(d, 0) + 1
    assert got == deg


# -- SymSpell vs brute force -------------------------------------------------


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(
                dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
            )
    return dp[len(b)]


@SETTINGS
@given(
    st.sets(st.text(alphabet="ab", min_size=1, max_size=4), min_size=2,
            max_size=12)
)
def test_symspell_matches_bruteforce(spark, terms):
    from postgresimporter_spark.operators.linkage import (
        deletion_neighborhood_pairs,
    )

    df = spark.createDataFrame([(t,) for t in terms], "term string")
    got = {
        (r.term_a, r.term_b)
        for r in deletion_neighborhood_pairs(df).collect()
    }
    ts = sorted(terms)
    want = {
        (a, b)
        for i, a in enumerate(ts)
        for b in ts[i + 1 :]
        if _lev(a, b) <= 1
    }
    assert got == want


# -- winnowing guarantee -----------------------------------------------------


@SETTINGS
@given(st.integers(0, 5), st.integers(0, 5), st.integers(0, 999))
def test_winnowing_shared_passage_guarantee(spark, pre, post, seed):
    # any shared passage of >= w + k - 1 = 7 tokens must share at
    # least one selected fingerprint (Schleimer et al. theorem 1)
    from postgresimporter_spark.operators.textstats import (
        winnowing_fingerprints,
    )

    import random

    rng = random.Random(seed)
    shared = [f"s{seed}_{i}" for i in range(7 + rng.randrange(4))]
    d1 = [f"p{i}" for i in range(pre)] + shared + ["q1", "q2", "q3"]
    d2 = ["r1", "r2", "r3"] + shared + [f"t{i}" for i in range(post)]
    df = spark.createDataFrame(
        [(1, " ".join(d1)), (2, " ".join(d2))],
        "doc_id long, text string",
    )
    fps = winnowing_fingerprints(df, k=4, w=4)
    shared_fp = (
        fps.groupBy("fp").agg(F.count_distinct("doc_id").alias("n"))
        .where(F.col("n") == 2)
        .count()
    )
    assert shared_fp >= 1


# -- portable HLL union = register max --------------------------------------


@SETTINGS
@given(
    st.lists(st.integers(0, 500), min_size=1, max_size=60),
    st.lists(st.integers(0, 500), min_size=1, max_size=60),
)
def test_hll_union_is_register_max(spark, xs, ys):
    from postgresimporter_spark.streaming.pipeline import stream_hll

    def regs(vals):
        df = spark.createDataFrame(
            [("g", v) for v in vals], "k string, v long"
        )
        return {
            (r.reg): r.max_rho
            for r in stream_hll(df, ["k"], "v").collect()
        }

    ra, rb, ru = regs(xs), regs(ys), regs(xs + ys)
    want = {
        reg: max(ra.get(reg, 0), rb.get(reg, 0))
        for reg in set(ra) | set(rb)
    }
    assert ru == want
