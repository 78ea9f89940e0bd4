"""Batch-63: t-closeness vs an exact-fraction Python model, and video
near-dup vs a brute-force frame-hash walk."""

from __future__ import annotations

from fractions import Fraction

import pytest

from postgresimporter_spark.plans import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reg():
    return registry()


def test_q299_matches_fraction_model(spark, reg):
    from postgresimporter_spark.sources.parquet import load_tables

    cust = load_tables(spark, SF, ["customer"])["customer"]
    rows = [
        (r.c_nationkey, r.c_mktsegment, r.c_acctbal)
        for r in cust.select(
            "c_nationkey", "c_mktsegment", "c_acctbal"
        ).collect()
    ]
    B = 5

    def bin_of(b):
        return max(0, min(B - 1, int((b + 1000.0) // 2200)))

    glob = [0] * B
    per = {}
    for nk, seg, bal in rows:
        b = bin_of(bal)
        glob[b] += 1
        per.setdefault((nk, seg), [0] * B)[b] += 1
    N = len(rows)
    want = {}
    for key, cs in per.items():
        n_g = sum(cs)
        acc = Fraction(0)
        cum_c = cum_g = 0
        for b in range(B - 1):
            cum_c += cs[b]
            cum_g += glob[b]
            acc += abs(Fraction(cum_c, n_g) - Fraction(cum_g, N))
        want[key] = (n_g, round(float(acc / (B - 1)), 6))
    got = {
        (r.c_nationkey, r.c_mktsegment): (r.class_size, r.emd)
        for r in reg["q299_t_closeness"].fn(spark, SF).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], abs=2e-6)
    # identical-to-global classes would have emd 0; skewed ones don't
    assert any(v[1] > 0 for v in got.values())


def test_q300_matches_brute_force(spark, reg):
    from postgresimporter_spark.plans.media_expected import (
        VIDEO_FRAME_PHASH,
    )

    def ham(a, b):
        return bin(a ^ b).count("1")

    by_ms = {}
    for p, ms, h in VIDEO_FRAME_PHASH:
        by_ms.setdefault(ms, []).append((p, h))
    counts = {}
    for ms, rows in by_ms.items():
        for i, (pa, ha) in enumerate(rows):
            for pb, hb in rows[i + 1 :]:
                if pa != pb and ham(ha, hb) <= 10:
                    k = tuple(sorted((pa, pb)))
                    counts.setdefault(k, set()).add(ms)
    want = {
        (a, b, len(ms)) for (a, b), ms in counts.items() if len(ms) >= 2
    }
    got = {
        (r.video_a, r.video_b, r.n_matched)
        for r in reg["q300_video_neardup"].fn(spark, SF).collect()
    }
    assert got == want
    assert ("vid_tex.avi", "vid_tex_re.avi", 2) in got
    assert not any("vid_other.avi" in g[:2] for g in got)
    assert not any("vid_flat.avi" in g[:2] for g in got)
