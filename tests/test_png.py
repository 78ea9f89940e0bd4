"""Library-free PNG codec: roundtrip, all five filter types, resize,
and the multimodal dispatch."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from postgresimporter_spark.operators.png import (
    PNG_MAGIC,
    decode_png,
    encode_png,
    png_resize,
    resize_nearest,
)


def _rng(shape):
    return np.random.default_rng(7).integers(
        0, 256, size=shape, dtype=np.uint8
    )


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_roundtrip_all_channel_counts(ch):
    px = _rng((5, 7, ch))
    out = decode_png(encode_png(px))
    assert out.shape == (5, 7, ch)
    assert np.array_equal(out, px)


def _png_with_filters(px: np.ndarray, ftypes: list[int]) -> bytes:
    """Hand-build a PNG whose scanlines use the given filter types —
    exercises the decoder's filter reconstruction independently of our
    encoder (which always emits filter 0)."""
    h, w, ch = px.shape
    stride = w * ch
    flat = px.reshape(h, stride).astype(int)
    raw = bytearray()
    for y in range(h):
        f = ftypes[y % len(ftypes)]
        raw.append(f)
        prev = flat[y - 1] if y > 0 else np.zeros(stride, dtype=int)
        for x in range(stride):
            cur = flat[y][x]
            left = flat[y][x - ch] if x >= ch else 0
            up = prev[x]
            ul = prev[x - ch] if x >= ch else 0
            if f == 0:
                enc = cur
            elif f == 1:
                enc = cur - left
            elif f == 2:
                enc = cur - up
            elif f == 3:
                enc = cur - ((left + up) >> 1)
            else:  # paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = (
                    left
                    if (pa <= pb and pa <= pc)
                    else (up if pb <= pc else ul)
                )
                enc = cur - pred
            raw.append(enc & 0xFF)

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 2: 4, 3: 2, 4: 6}[ch], 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_decode_reconstructs_every_filter_type():
    px = _rng((10, 6, 3))
    data = _png_with_filters(px, ftypes=[0, 1, 2, 3, 4])
    assert np.array_equal(decode_png(data), px)


def test_unsupported_variants_raise():
    with pytest.raises(ValueError):
        decode_png(b"not png at all")
    # 16-bit depth
    px = _rng((2, 2, 3))
    data = bytearray(encode_png(px))
    # IHDR bitdepth byte: magic(8) + len(4) + type(4) + w(4) + h(4) = 24
    data[24] = 16
    with pytest.raises(ValueError):
        decode_png(bytes(data))


def test_resize_nearest_and_full_pipeline():
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    px[:2, :2] = 255  # top-left white quadrant
    small = resize_nearest(px, 2, 2)
    assert small.shape == (2, 2, 3)
    assert small[0, 0, 0] == 255 and small[1, 1, 0] == 0
    out = decode_png(png_resize(encode_png(px), 8, 8))
    assert out.shape == (8, 8, 3)
    assert out[0, 0, 0] == 255 and out[7, 7, 0] == 0


def test_multimodal_image_decode_dispatch(spark, tmp_path):
    """extract_features reports TRUE dimensions for a real PNG and
    nulls (never fabricated values) for unrecognized image bytes."""
    from postgresimporter_spark.operators.multimodal import extract_features

    png_bytes = encode_png(_rng((13, 29, 3)))
    rows = [
        ("real.png", "image", bytearray(png_bytes), None),
        ("junk.bin", "image", bytearray(b"\x01\x02\x03"), None),
    ]
    from postgresimporter_spark.operators.multimodal import MEDIA_SCHEMA

    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.path: r for r in extract_features(df).collect()}
    assert got["real.png"].width == 29 and got["real.png"].height == 13
    assert got["junk.bin"].width is None  # undecodable -> null, not fake
    assert got["junk.bin"].n_bytes == 3  # byte-level features still real


def test_audio_decode_real_pcm_wav():
    """audio_decode returns true duration/RMS for PCM WAV; non-PCM
    returns real header metadata with samples_decoded=False."""
    import struct

    from postgresimporter_spark.operators.multimodal import audio_decode

    rate, channels = 8000, 1
    samples = np.array([0, 1000, -1000, 0] * 2000, dtype="<i2")  # 1 s
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * 2, 2, 16)
    wav = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    d = audio_decode(wav)
    assert d["duration_ms"] == 1000
    assert d["sample_rate"] == rate and d["channels"] == 1
    assert d["peak"] == 1000.0
    assert abs(d["rms"] - 707.1068) < 0.01

    # non-PCM (format tag 3 = IEEE float): real header metadata with
    # the explicit not-decoded flag, no fabricated sample stats
    fmt3 = struct.pack("<HHIIHH", 3, channels, rate, rate * 2, 2, 16)
    wav3 = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt3)) + fmt3
        + b"data" + struct.pack("<I", 0)
    )
    f = audio_decode(wav3)
    assert f["samples_decoded"] is False
    assert f["codec"] == "wav" and f["sample_rate"] == rate
    assert "rms" not in f  # no fabricated stats

    # fully unrecognized audio bytes raise (surfaced as nulls by
    # extract_features), never return fabricated values
    import pytest

    with pytest.raises(ValueError):
        audio_decode(b"\x00\x01\x02\x03garbage")
