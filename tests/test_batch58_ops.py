"""Batch-58: media oracle queries (pHash, image near-dup, audio
features) and the capped SimHash audit vs independent Python models at
sf0.001."""

from __future__ import annotations

import pytest

from postgresimporter_spark.plans import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reg():
    return registry()


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_q280_nulls_and_frozen_hashes(spark, reg):
    from postgresimporter_spark.plans.media_expected import IMAGE_PHASH

    got = {r.path: r.phash for r in reg["q280_image_phash"].fn(spark, SF).collect()}
    assert got == dict(IMAGE_PHASH)
    assert got["corrupt_a.bin"] is None and got["corrupt_b.gif"] is None
    assert all(h is None or 0 <= h < (1 << 63) for h in got.values())


def test_q281_matches_brute_force_over_live_hashes(spark, reg):
    """Banding exactness checked against the LIVE hashes (not the
    frozen ones): brute-force all pairs from q280's output and compare
    — independent of media_expected.py staleness."""
    hashes = {
        r.path: r.phash
        for r in reg["q280_image_phash"].fn(spark, SF).collect()
        if r.phash is not None
    }
    ids = sorted(hashes)
    want = {
        (a, b, _hamming(hashes[a], hashes[b]))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if _hamming(hashes[a], hashes[b]) <= 10
    }
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in reg["q281_image_neardup"].fn(spark, SF).collect()
    }
    assert got == want
    # the designed near-dup structure actually exists in the corpus
    assert ("img000.png", "img000_re.jpg", 0) in got


def test_q282_honesty_boundary_rows(spark, reg):
    rows = {r.path: r for r in reg["q282_audio_features"].fn(spark, SF).collect()}
    for bad in ("corrupt.mp3", "float.wav"):
        assert rows[bad].duration_ms is None
        assert rows[bad].spectral_centroid_hz is None
    assert rows["empty.wav"].duration_ms == 0
    assert rows["empty.wav"].rms == 0.0
    assert rows["empty.wav"].spectral_centroid_hz is None
    assert abs(rows["tone_440.wav"].spectral_centroid_hz - 440.0) < 5.0
    assert rows["stereo.wav"].sample_rate == 8000


def test_q283_cap_semantics_python_model(spark, reg):
    """Replicate banding + cap + drop report from the collected
    fingerprints (metadata scale at sf0.001) and compare all four
    audit numbers."""
    import itertools

    from pyspark.sql import functions as F

    from postgresimporter_spark.operators import dedup as D
    from postgresimporter_spark.plans.catalog_batch58 import (
        BOILER_N,
        BOILER_TEXT,
        CAP_MAX_HAMMING,
        CAP_RATIO,
        q283_simhash_capped,
    )
    from postgresimporter_spark.sources.parquet import load_tables

    docs = load_tables(spark, SF, ["documents"])["documents"]
    boiler = spark.range(BOILER_N).select(
        (F.col("id") + 20000).alias("doc_id"),
        F.lit(BOILER_TEXT).alias("text"),
    )
    fps = {
        r.id: r.simhash
        for r in D.simhash(
            docs.select("doc_id", "text").unionByName(boiler), bits=32
        ).collect()
    }
    n = len(fps)
    combos = list(itertools.combinations(range(4), 2))
    keyed = {}  # (ci, v0, v1) -> set of ids
    for i, fp in fps.items():
        for ci, (a, b) in enumerate(combos):
            k = (ci, (fp >> (8 * a)) & 255, (fp >> (8 * b)) & 255)
            keyed.setdefault(k, set()).add(i)
    hot = {k: v for k, v in keyed.items() if len(v) > CAP_RATIO * n}
    ids = sorted(fps)
    unc = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if _hamming(fps[a], fps[b]) <= CAP_MAX_HAMMING
    }
    cap = set()
    for k, members in keyed.items():
        if k in hot:
            continue
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1 :]:
                if _hamming(fps[a], fps[b]) <= CAP_MAX_HAMMING:
                    cap.add((a, b))
    row = q283_simhash_capped(spark, SF).collect()[0]
    assert row.n_pairs_uncapped == len(unc)
    assert row.n_pairs_capped == len(cap)
    assert row.n_hot_keys == len(hot)
    assert row.hot_fps_max == (max(len(v) for v in hot.values()) if hot else 0)
    # the skew construction did its job: boiler pairs exist uncapped,
    # are dropped capped, and every boiler band key is reported hot
    assert row.n_pairs_uncapped - row.n_pairs_capped >= (
        BOILER_N * (BOILER_N - 1) // 2
    )
    assert row.n_hot_keys >= len(combos)
    assert row.hot_fps_max >= BOILER_N
