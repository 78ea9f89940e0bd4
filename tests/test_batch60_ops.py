"""Batch-60: multimodal metadata / frame sampling / resize round trip
— honesty boundaries and construction-truth invariants (the heavy
value-level verification lives in tests/gen_media_expected.py, which
refuses to freeze constants the live operators don't reproduce)."""

from __future__ import annotations

import pytest

from postgresimporter_spark.plans import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reg():
    return registry()


def test_q288_honesty_rows(spark, reg):
    rows = {r.path: r for r in reg["q288_media_metadata"].fn(spark, SF).collect()}
    from postgresimporter_spark.plans.media_expected import MEDIA_META

    assert len(rows) == len(MEDIA_META)
    # unrecognized bytes: nulls, never failures
    assert rows["corrupt_a.bin"].codec is None
    assert rows["corrupt_b.gif"].codec is None
    # junk-chunk AVI: container recognized, fields null
    assert rows["corrupt.avi"].codec == "avi"
    assert rows["corrupt.avi"].width is None
    # MP4 is container-metadata-only but the metadata is real
    assert (rows["clip.mp4"].width, rows["clip.mp4"].height) == (320, 240)
    assert rows["clip.mp4"].duration_ms == 1500
    # AVI header parse (the batch-60 parse_media_header addition)
    assert (rows["vid_flat.avi"].width, rows["vid_flat.avi"].height) == (16, 8)
    assert rows["vid_flat.avi"].duration_ms == 2000


def test_q289_frame_multiplicity_and_timeline(spark, reg):
    from postgresimporter_spark.plans.media_expected import FRAME_SAMPLES

    got = [
        (r.path, r.frame_ms, r.has_frame, r.frame_w, r.frame_h)
        for r in reg["q289_frame_sample"].fn(spark, SF).collect()
    ]
    assert sorted(got, key=str) == sorted(FRAME_SAMPLES, key=str)
    # >= 1 row per input, including the undecodable one
    assert ("corrupt_a.bin", 0, False, None, None) in got
    # the 2 fps video really advances its timeline 400 -> frame 0,
    # 800 -> frame 1 etc. (5 sampled frames over 2000 ms)
    assert sum(1 for g in got if g[0] == "vid_flat.avi") == 5


def test_q290_round_trip_dims(spark, reg):
    rows = {
        r.path: r for r in reg["q290_resize_roundtrip"].fn(spark, SF).collect()
    }
    assert all(
        (r.width, r.height) == (16, 16) for r in rows.values()
    )
    # video timing survives the per-frame resize + container rebuild
    assert rows["vid_flat.avi"].duration_ms == 2000
    assert rows["vid_tex.avi"].duration_ms == 750
    assert rows["raw_stream.mjpeg"].codec == "jpeg"


def test_generator_refuses_stale_constants(tmp_path, monkeypatch):
    """The freeze script fails loudly if an operator drifts from the
    stated truth: simulate by corrupting one stated dimension."""
    import tests.gen_media_expected as gen

    good = gen.expected_media_meta()
    bad = [
        (r[0], r[1], r[2], r[3], 999, *r[5:]) if r[0] == "img000.png" else r
        for r in good
    ]
    monkeypatch.setattr(gen, "expected_media_meta", lambda: bad)
    from postgresimporter_spark.session import get_spark

    with pytest.raises(SystemExit, match="media meta mismatch"):
        gen._verify_multimodal(get_spark(shuffle_partitions=8))
