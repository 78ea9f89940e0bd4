"""Multimodal plumbing: binaryFile source, Arrow-batched feature
extraction, frame sampling (decoders stubbed, plumbing real)."""

from __future__ import annotations

import hashlib

from postgresimporter_spark.operators.multimodal import (
    deterministic_fake_decode,
    extract_features,
    read_media_dir,
    sample_frames,
)


def _write_media(tmp_path, n=3):
    files = {}
    for i in range(n):
        p = tmp_path / f"img_{i}.bin"
        content = bytes([i]) * (100 + i * 50)
        p.write_bytes(content)
        files[f"file:{p}"] = content
    return files


def test_extract_features(spark, tmp_path):
    files = _write_media(tmp_path)
    media = read_media_dir(spark, str(tmp_path / "*.bin"), "image")
    feats = {r.path: r for r in extract_features(media).collect()}
    assert len(feats) == len(files)
    for path, content in files.items():
        r = feats[path]
        assert r.n_bytes == len(content)
        assert r.sha256 == hashlib.sha256(content).hexdigest()
        expected = deterministic_fake_decode(content)
        assert (r.width, r.height, r.duration_ms) == (
            expected["width"],
            expected["height"],
            expected["duration_ms"],
        )


def test_unknown_modality_yields_nulls_not_failures(spark, tmp_path):
    _write_media(tmp_path, n=1)
    media = read_media_dir(spark, str(tmp_path / "*.bin"), "hologram")
    rows = extract_features(media).collect()
    assert len(rows) == 1
    assert rows[0].width is None
    assert rows[0].n_bytes > 0  # byte-level features still computed


def test_sample_frames_expands_rows(spark, tmp_path):
    p = tmp_path / "clip.bin"
    p.write_bytes(b"x" * 3500)  # fake duration 3500ms
    media = read_media_dir(spark, str(tmp_path / "*.bin"), "video")
    frames = sample_frames(media, every_ms=1000).collect()
    assert [f.frame_ms for f in sorted(frames, key=lambda r: r.frame_ms)] == [
        0,
        1000,
        2000,
        3000,
    ]


def test_resize_media_transforms_per_row(spark, tmp_path):
    from postgresimporter_spark.operators.multimodal import (
        deterministic_fake_resize,
        resize_media,
    )

    (tmp_path / "a.bin").write_bytes(b"x" * 100)
    (tmp_path / "b.bin").write_bytes(b"y" * 300)
    media = read_media_dir(spark, str(tmp_path / "*.bin"), "image")
    out = {r.path.rsplit("/", 1)[-1]: r for r in resize_media(media, 64, 48).collect()}
    assert out["a.bin"].width == 64 and out["a.bin"].height == 48
    # the stub transform ran per row with the row's own content
    assert bytes(out["a.bin"].content) == deterministic_fake_resize(b"x" * 100, 64, 48)
    assert bytes(out["b.bin"].content) == deterministic_fake_resize(b"y" * 300, 64, 48)
    assert bytes(out["a.bin"].content) != bytes(out["b.bin"].content)


def test_resize_media_unsupported_modality_raises(spark, tmp_path):
    import pytest
    from pyspark.errors.exceptions.base import PySparkException

    from postgresimporter_spark.operators.multimodal import resize_media

    (tmp_path / "a.bin").write_bytes(b"x")
    media = read_media_dir(spark, str(tmp_path / "*.bin"), "video")
    with pytest.raises(PySparkException, match="no resizer"):
        resize_media(media, 64, 48).collect()
