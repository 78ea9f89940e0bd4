"""MJPEG video surface: AVI container round-trip, real frame decode,
frame sampling, resize, and the explicit non-MJPEG boundary.

The fixtures are built with the repo's own JPEG encoder, so every
byte that goes through the container walk was produced — and is then
re-decoded — by the from-scratch codec (no synthetic fakes anywhere
in the video path)."""

from __future__ import annotations

import numpy as np
import pytest

from postgresimporter_spark.operators.jpeg import decode_jpeg, encode_jpeg
from postgresimporter_spark.operators.mjpeg import (
    avi_mjpeg_meta,
    build_avi_mjpeg,
    is_avi,
    iter_avi_mjpeg_frames,
    mjpeg_stream_meta,
    parse_avi_header,
    split_mjpeg_stream,
)


def _frames(n=3, w=16, h=8):
    """n flat-gray JPEG frames with distinct levels (flat blocks are
    exactly representable, so decode is bit-faithful per frame)."""
    out = []
    for i in range(n):
        px = np.full((h, w), 32 + 64 * i, dtype=np.uint8)
        out.append(encode_jpeg(px))
    return out


def test_avi_roundtrip_frames_and_header():
    frames = _frames(3)
    avi = build_avi_mjpeg(frames, fps_milli=2_000)  # 2 fps -> 500ms/frame
    assert is_avi(avi)
    hdr = parse_avi_header(avi)
    assert hdr["usec_per_frame"] == 500_000
    assert hdr["total_frames"] == 3
    assert (hdr["width"], hdr["height"]) == (16, 8)
    assert list(iter_avi_mjpeg_frames(avi)) == frames


def test_avi_meta_real_first_frame_decode():
    avi = build_avi_mjpeg(_frames(4), fps_milli=2_000)
    meta = avi_mjpeg_meta(avi)
    assert (meta["width"], meta["height"]) == (16, 8)
    assert meta["n_frames"] == 4
    assert meta["duration_ms"] == 2000  # 4 frames x 500ms
    assert meta["codec"] == "mjpeg-avi"
    # frame 0 is flat luma 32 and flat blocks decode exactly
    assert meta["mean_luma_f0"] == 32.0


def test_raw_mjpeg_stream_split_and_meta():
    frames = _frames(3)
    stream = b"".join(frames)
    assert list(split_mjpeg_stream(stream)) == frames
    meta = mjpeg_stream_meta(stream)
    assert meta["n_frames"] == 3
    assert meta["duration_ms"] is None  # no timing in a bare stream
    assert (meta["width"], meta["height"]) == (16, 8)


def test_video_decode_dispatch_and_mp4_boundary():
    from postgresimporter_spark.operators.multimodal import video_decode

    avi = build_avi_mjpeg(_frames(2), fps_milli=1_000)
    assert video_decode(avi)["codec"] == "mjpeg-avi"
    assert video_decode(b"".join(_frames(2)))["codec"] == "mjpeg"
    # MP4: container metadata only, pixel boundary explicit
    mp4 = (
        (16).to_bytes(4, "big") + b"ftypisom" + b"\x00" * 8
    )
    out = video_decode(mp4)
    assert out["codec"] == "mp4"
    assert out["pixels_decoded"] is False
    with pytest.raises(ValueError):
        video_decode(b"\x00\x01\x02\x03not-a-video")


def test_video_resize_rebuilds_avi_with_timing():
    from postgresimporter_spark.operators.multimodal import video_resize

    avi = build_avi_mjpeg(_frames(3), fps_milli=4_000)
    out = video_resize(avi, 8, 4)
    hdr = parse_avi_header(out)
    assert (hdr["width"], hdr["height"]) == (8, 4)
    assert hdr["usec_per_frame"] == 250_000  # timing preserved
    decoded = [decode_jpeg(fr) for fr in iter_avi_mjpeg_frames(out)]
    assert len(decoded) == 3
    assert all(px.shape[:2] == (4, 8) for px in decoded)
    # flat frames stay flat through resample + re-encode
    assert float(decoded[0].mean()) == 32.0


def test_extract_features_real_video_dims(spark, tmp_path):
    from postgresimporter_spark.operators.multimodal import (
        extract_features,
        read_media_dir,
    )

    (tmp_path / "clip.bin").write_bytes(
        build_avi_mjpeg(_frames(5), fps_milli=2_000)
    )
    media = read_media_dir(spark, str(tmp_path / "*.bin"), "video")
    r = extract_features(media).collect()[0]
    assert (r.width, r.height) == (16, 8)
    assert r.duration_ms == 2500


def test_sample_frames_real_mjpeg_pixels(spark, tmp_path):
    from postgresimporter_spark.operators.multimodal import (
        read_media_dir,
        sample_frames,
    )
    from postgresimporter_spark.operators.png import PNG_MAGIC, decode_png

    # 3 frames x 500ms = 1500ms timeline; sampling at 600ms hits
    # offsets 0 (frame 0) / 600 (frame 1) / 1200 (frame 2)
    (tmp_path / "clip.bin").write_bytes(
        build_avi_mjpeg(_frames(3), fps_milli=2_000)
    )
    media = read_media_dir(spark, str(tmp_path / "*.bin"), "video")
    rows = sorted(
        sample_frames(media, every_ms=600).collect(),
        key=lambda r: r.frame_ms,
    )
    assert [r.frame_ms for r in rows] == [0, 600, 1200]
    lumas = []
    for r in rows:
        assert bytes(r.frame[:8]) == PNG_MAGIC
        lumas.append(float(np.asarray(decode_png(bytes(r.frame))).mean()))
    assert lumas == [32.0, 96.0, 160.0]


def test_sample_frames_undecodable_video_single_row(spark, tmp_path):
    from postgresimporter_spark.operators.multimodal import (
        read_media_dir,
        sample_frames,
    )

    (tmp_path / "blob.bin").write_bytes(b"\x00\x01\x02\x03" * 100)
    media = read_media_dir(spark, str(tmp_path / "*.bin"), "video")
    rows = sample_frames(media, every_ms=1000).collect()
    assert len(rows) == 1
    assert rows[0].frame_ms == 0 and rows[0].frame is None


def _with_exif_thumbnail(jpeg: bytes, thumb: bytes) -> bytes:
    """Insert an APP1 segment whose payload embeds a COMPLETE inner
    JPEG (own SOI+EOI) right after the outer SOI — the EXIF-thumbnail
    layout that breaks naive find-first-FFD9 splitting."""
    payload = b"Exif\x00\x00" + thumb
    app1 = b"\xff\xe1" + (len(payload) + 2).to_bytes(2, "big") + payload
    return jpeg[:2] + app1 + jpeg[2:]


def test_split_survives_embedded_exif_thumbnail():
    frames = _frames(3)
    thumb = encode_jpeg(np.full((8, 8), 200, dtype=np.uint8))
    frames[0] = _with_exif_thumbnail(frames[0], thumb)
    frames[2] = _with_exif_thumbnail(frames[2], thumb)
    stream = b"".join(frames)
    got = list(split_mjpeg_stream(stream))
    assert got == frames  # true frame ends, not the thumbnail's EOI
    # every split frame still decodes to the outer image
    for i, fr in enumerate(got):
        px = decode_jpeg(fr)
        assert px.shape[:2] == (8, 16)
        assert abs(float(px.mean()) - (32 + 64 * i)) < 2.0
    meta = mjpeg_stream_meta(stream)
    assert meta["n_frames"] == 3
