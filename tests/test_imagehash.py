"""Perceptual hash: invariance/sensitivity properties on images built
with the repo's own codecs, plus the distributed near-dup pipeline."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from postgresimporter_spark.operators.imagehash import (
    image_neardup_pairs,
    image_phash,
    phash,
)
from postgresimporter_spark.operators.jpeg import encode_jpeg
from postgresimporter_spark.operators.png import encode_png


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _textured(seed=3, n=8, size=64):
    """Random 8x8 block texture upsampled to 64x64: broadband
    low-frequency content, so every pHash bit carries real signal
    (a pure-sinusoid fixture makes most DCT coefficients sit at the
    median and turns the hash into noise)."""
    rng = np.random.RandomState(seed)
    base = rng.randint(30, 226, (n, n))
    return base.repeat(size // n, 0).repeat(size // n, 1).astype(np.uint8)


def test_phash_deterministic_and_format_robust():
    px = _textured()
    p_png = phash(encode_png(np.stack([px] * 3, axis=2)))
    assert p_png == phash(encode_png(np.stack([px] * 3, axis=2)))
    # same pixels through the lossy JPEG round-trip: small distance
    p_jpg = phash(encode_jpeg(px, quant=2))
    assert _hamming(p_png, p_jpg) <= 6


def test_phash_noise_vs_different_image():
    px = _textured(seed=3)
    noisy = np.clip(
        px.astype(int) + np.random.RandomState(7).randint(-8, 9, px.shape),
        0,
        255,
    ).astype(np.uint8)
    other = _textured(seed=11)
    p, pn, po = (
        phash(encode_png(np.stack([im] * 3, axis=2)))
        for im in (px, noisy, other)
    )
    assert _hamming(p, pn) <= 10  # near-dup survives noise
    assert _hamming(p, po) > 16  # different content stays far


def test_phash_resize_invariance():
    px = _textured()
    small = px[::2, ::2]  # 2x downsample of the same content
    p1 = phash(encode_png(np.stack([px] * 3, axis=2)))
    p2 = phash(encode_png(np.stack([small] * 3, axis=2)))
    assert _hamming(p1, p2) <= 10


def test_phash_rejects_undecodable():
    with pytest.raises(ValueError):
        phash(b"\x00\x01garbage")


def test_image_neardup_pipeline(spark, tmp_path):
    """End-to-end: binary rows -> mapInPandas pHash -> banded Hamming
    pairs. The re-encoded/noisy copies pair with their originals; the
    corrupt row yields a NULL hash, not a failure."""
    from postgresimporter_spark.operators.multimodal import MEDIA_SCHEMA

    px_a, px_b = _textured(seed=3), _textured(seed=11)
    noisy_a = np.clip(
        px_a.astype(int) + np.random.RandomState(7).randint(-6, 7, px_a.shape),
        0,
        255,
    ).astype(np.uint8)
    rows = [
        ("a.png", "image", bytearray(encode_png(np.stack([px_a] * 3, 2))), None),
        ("a2.jpg", "image", bytearray(encode_jpeg(noisy_a, quant=2)), None),
        ("b.png", "image", bytearray(encode_png(np.stack([px_b] * 3, 2))), None),
        ("bad.bin", "image", bytearray(b"\x01\x02"), None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    hashes = {r.id: r.phash for r in image_phash(media).collect()}
    assert hashes["bad.bin"] is None
    assert None not in (hashes["a.png"], hashes["a2.jpg"], hashes["b.png"])
    pairs = {
        tuple(sorted((r.id_a, r.id_b)))
        for r in image_neardup_pairs(media, max_hamming=10).collect()
    }
    assert ("a.png", "a2.jpg") in pairs
    assert not any("b.png" in p for p in pairs)


def test_video_bench_corpus_aligned_pairs(spark):
    """The bench video corpus (mediagen.video_bench_corpus) at a small
    n_base: each base video pairs with exactly its aligned noisy
    re-encode, corrupt rows surface as nulls (never failures), and no
    unrelated videos match."""
    from postgresimporter_spark.operators.imagehash import (
        video_neardup_pairs,
    )
    from postgresimporter_spark.operators.mediagen import video_bench_corpus
    from postgresimporter_spark.operators.multimodal import MEDIA_SCHEMA

    rows = video_bench_corpus(n_base=4)
    assert len(rows) == 4 + 2 + 2  # base + re-encodes + corrupt
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    pairs = {
        (r.video_a, r.video_b): r.n_matched
        for r in video_neardup_pairs(
            media, every_ms=400, max_hamming=10
        ).collect()
    }
    assert set(pairs) == {
        ("vid000.avi", "vid000_re.avi"),
        ("vid001.avi", "vid001_re.avi"),
    }
    assert all(n >= 2 for n in pairs.values())


def test_cross_modal_neardup(spark):
    """Stills-in-videos: each texture still matches its source video's
    aligned frame exactly (resize-invariant pHash), the flat still
    matches every flat frame, unrelated stills and the corrupt row
    match nothing."""
    from postgresimporter_spark.operators.imagehash import (
        cross_modal_neardup_pairs,
    )
    from postgresimporter_spark.operators.mediagen import (
        cross_modal_corpus,
    )
    from postgresimporter_spark.operators.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(cross_modal_corpus(), MEDIA_SCHEMA)
    rows = cross_modal_neardup_pairs(media, max_hamming=10).collect()
    by_img = {}
    for r in rows:
        by_img.setdefault(r.image_path, set()).add(
            (r.video_path, r.frame_ms, r.hamming)
        )
    assert ("vid_tex.avi", 0, 0) in by_img["still_tex0.png"]
    assert ("vid_tex.avi", 400, 0) in by_img["still_tex1.png"]
    assert all(v == "vid_flat.avi" for v, _, _ in by_img["still_flat.png"])
    assert "still_other0.png" not in by_img
    assert "still_other1.png" not in by_img
    assert "still_bad.bin" not in by_img


def test_cross_modal_image_id_may_contain_separator(spark):
    """An image path containing '|' flows through INTACT: the bipartite
    rewrite never splits image ids (only video fids are '|'-encoded,
    and video_frame_phashes still raises on '|' video paths), so the
    r8 ADVICE truncation hazard is eliminated structurally rather than
    guarded — the renamed still must keep its full name in the output
    and match exactly what it matched under its clean name."""
    from postgresimporter_spark.operators.imagehash import (
        cross_modal_neardup_pairs,
    )
    from postgresimporter_spark.operators.mediagen import (
        cross_modal_corpus,
    )
    from postgresimporter_spark.operators.multimodal import MEDIA_SCHEMA

    clean = spark.createDataFrame(cross_modal_corpus(), MEDIA_SCHEMA)
    base = {
        (r["video_path"], r["frame_ms"], r["hamming"])
        for r in cross_modal_neardup_pairs(clean, max_hamming=10)
        .where(F.col("image_path") == "still_tex0.png")
        .collect()
    }
    assert base, "fixture must match something under the clean name"
    rows = [
        r if r[0] != "still_tex0.png" else ("bad|name.png", *r[1:])
        for r in cross_modal_corpus()
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        (r["video_path"], r["frame_ms"], r["hamming"])
        for r in cross_modal_neardup_pairs(media, max_hamming=10)
        .where(F.col("image_path") == "bad|name.png")
        .collect()
    }
    assert got == base


def test_video_neardup_static_families_vs_brute_force(spark):
    """The long-static-video shape (r10 probe: every frame of a video
    identical, two near-match families across videos): the align-keyed
    join must reproduce exactly the brute-force aligned relation over
    the operator's own frame-hash table. Pre-rewrite this shape ran
    the ms-equality as a residual condition on an fp_b-only join key —
    54x slower at the probe scale with the cross-family enumeration
    pinned to one task."""
    from postgresimporter_spark.operators.imagehash import (
        video_frame_phashes,
        video_neardup_pairs,
    )
    from postgresimporter_spark.operators.mediagen import textured, _noisy
    from postgresimporter_spark.operators.mjpeg import build_avi_mjpeg
    from postgresimporter_spark.operators.multimodal import MEDIA_SCHEMA

    base = textured(seed=777, size=32)
    fam_a = encode_jpeg(base, quant=2)
    fam_b = encode_jpeg(_noisy(base, 778), quant=4)  # near, not equal
    rows = []
    for v in range(6):
        frm = fam_a if v % 2 == 0 else fam_b
        rows.append(
            (
                f"sv{v}.avi",
                "video",
                bytearray(build_avi_mjpeg([frm] * 5, fps_milli=4_000)),
                None,
            )
        )
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    fp = {
        (r["path"], r["frame_ms"]): r["phash"]
        for r in video_frame_phashes(media, every_ms=250).collect()
    }
    from collections import defaultdict

    matched = defaultdict(set)
    keys = sorted(fp)
    for i, (pa, ms_a) in enumerate(keys):
        for pb, ms_b in keys[i + 1 :]:
            if pa == pb or ms_a != ms_b:
                continue
            d = bin((fp[(pa, ms_a)] ^ fp[(pb, ms_b)]) & ((1 << 64) - 1))
            if d.count("1") <= 10:
                matched[(min(pa, pb), max(pa, pb))].add(ms_a)
    want = {
        (a, b, len(ms)) for (a, b), ms in matched.items() if len(ms) >= 2
    }
    got = {
        (r["video_a"], r["video_b"], r["n_matched"])
        for r in video_neardup_pairs(
            media, every_ms=250, max_hamming=10, min_matched=2
        ).collect()
    }
    assert got == want
    assert len(want) == 15  # all 6 static videos pair: C(6,2)
