"""Batch-56: lateral top-n / TWA / percentile norm / ageing vs
independent Python models at sf0.001."""

from __future__ import annotations

import math

import pytest

from postgresimporter_spark.plans import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reg():
    return registry()


def test_q272_matches_python_model(spark, reg):
    from collections import defaultdict

    from postgresimporter_spark.sources.parquet import load_tables

    t = load_tables(spark, SF, ["nation", "customer"])
    nname = {r.n_nationkey: r.n_name for r in t["nation"].collect()}
    per = defaultdict(list)
    for r in t["customer"].collect():
        per[r.c_nationkey].append(
            (-int(round(r.c_acctbal * 100)), r.c_custkey)
        )
    want = []
    for nk, name in nname.items():
        for negc, ck in sorted(per.get(nk, []))[:2]:
            want.append((name, ck, -negc))
    want.sort(key=lambda x: (x[0], -x[2], x[1]))
    got = [
        (r.nation, r.c_custkey, r.acctbal_cents)
        for r in reg["q272_lateral_topn"].fn(spark, SF).collect()
    ]
    assert got == want
    # at most 2 per nation
    from collections import Counter

    assert max(Counter(n for n, *_ in got).values()) <= 2


def test_q273_matches_python_model(spark, reg):
    from collections import defaultdict

    from postgresimporter_spark.sources.parquet import load_tables

    ev = load_tables(spark, SF, ["events"])["events"].collect()
    per = defaultdict(list)
    for r in ev:
        per[r.user_id].append(
            (math.floor(r.ts.timestamp()), r.event_id,
             int(round(r.value * 100)))
        )
    want = {}
    for u, rows in per.items():
        rows.sort()
        tot = ws = 0
        for (t0, _, c), (t1, _, _) in zip(rows, rows[1:]):
            dur = t1 - t0
            tot += dur
            ws += c * dur
        if tot > 0:
            want[u] = (tot, round(ws / tot, 4) + 0.0)
    got = {
        r.user_id: (r.total_sec, r.twa_cents)
        for r in reg["q273_time_weighted_avg"].fn(spark, SF).collect()
    }
    assert got == want


def test_q274_matches_python_model(spark, reg):
    from collections import defaultdict

    from postgresimporter_spark.sources.parquet import load_tables

    docs = load_tables(spark, SF, ["documents"])["documents"].collect()
    per = defaultdict(list)
    for r in docs:
        per[r.source].append((r.n_chars, r.doc_id))
    want = []
    for src, rows in per.items():
        rows.sort()
        n = len(rows)
        for i, (nc, did) in enumerate(rows, start=1):
            if i > n - 5:
                pct = round((i - 1) / (n - 1), 6) + 0.0 if n > 1 else 0.0
                want.append((src, did, nc, pct))
    want.sort(key=lambda x: (x[0], -x[3], x[1]))
    got = [
        (r.source, r.doc_id, r.n_chars, r.pct)
        for r in reg["q274_within_group_percentile"].fn(spark, SF).collect()
    ]
    assert got == want
    assert all(0 <= p <= 1 for *_, p in got)


def test_q275_matches_python_model(spark, reg):
    import datetime
    from collections import defaultdict

    from postgresimporter_spark.sources.parquet import load_tables

    orders = load_tables(spark, SF, ["orders"])["orders"].collect()
    asof = datetime.date(1997, 7, 1)
    want = defaultdict(lambda: [0, 0])
    for r in orders:
        d = r.o_orderdate.date()
        if r.o_orderstatus != "O" or d > asof:
            continue
        age = (asof - d).days
        b = (
            "0-30" if age <= 30
            else "31-90" if age <= 90
            else "91-365" if age <= 365
            else "365+"
        )
        want[b][0] += 1
        want[b][1] += int(round(r.o_totalprice * 100))
    got = {
        r.age_bucket: (r.n_orders, r.open_cents)
        for r in reg["q275_ageing_buckets"].fn(spark, SF).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}
