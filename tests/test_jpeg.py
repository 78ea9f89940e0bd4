"""Baseline-JPEG codec tests (operators/jpeg.py): encode -> decode
roundtrips across the 4:4:4 / 4:2:0 / grayscale / restart paths, the
honest unsupported-variant boundary, and the multimodal dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from postgresimporter_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
    jpeg_decode_meta,
)
from postgresimporter_spark.operators.multimodal import image_decode


def _smooth(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 3 + xx) % 256, (yy + xx * 2) % 256, (yy * 2 + xx * 2) % 256],
        axis=-1,
    ).astype(np.uint8)


def test_constant_block_roundtrips_exactly():
    px = np.full((8, 8), 130, dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(px, quant=4))
    assert dec.shape == (8, 8)
    assert (dec == 130).all()


def test_grayscale_gradient_tight_roundtrip():
    yy, xx = np.mgrid[0:13, 0:21]
    px = ((yy * 17 + xx * 5) % 256).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(px, quant=1))
    assert dec.shape == px.shape
    assert np.abs(dec.astype(int) - px.astype(int)).max() <= 2


def test_rgb_444_roundtrip_non_multiple_of_8():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (24, 17, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(px, quant=2))
    assert dec.shape == px.shape
    assert np.abs(dec.astype(int) - px.astype(int)).mean() < 3.0


def test_rgb_420_subsampled_roundtrip():
    px = _smooth(33, 46)  # smooth chroma survives 2x2 subsampling
    dec = decode_jpeg(encode_jpeg(px, quant=2, subsample=True))
    assert dec.shape == px.shape
    assert np.abs(dec.astype(int) - px.astype(int)).mean() < 3.0


def test_restart_markers_roundtrip():
    px = _smooth(33, 46)
    base = decode_jpeg(encode_jpeg(px, quant=2))
    with_dri = decode_jpeg(encode_jpeg(px, quant=2, restart=3))
    # restart markers change the byte stream, not the pixels
    assert (base == with_dri).all()
    both = decode_jpeg(encode_jpeg(px, quant=2, subsample=True, restart=2))
    assert np.abs(both.astype(int) - px.astype(int)).mean() < 3.0


def test_byte_stuffing_roundtrip():
    # an 0xFF entropy byte must be written as FF 00 and read back as
    # eight 1-bits — writer and reader agree on the stuffing protocol
    from postgresimporter_spark.operators.jpeg import (
        _BitReader,
        _BitWriter,
    )

    bw = _BitWriter()
    bw.put(0xFF, 8)
    bw.put(0xA5, 8)
    bw.flush()
    assert bytes(bw.out) == b"\xff\x00\xa5"
    br = _BitReader(bytes(bw.out) + b"\xff\xd9", 0)
    assert br.bits(8) == 0xFF and br.bits(8) == 0xA5
    # and the reader stops (not misreads) at the real marker
    with pytest.raises((StopIteration, ValueError)):
        br.bits(8)


def test_unsupported_variants_raise():
    px = _smooth(8, 8)
    enc = bytearray(encode_jpeg(px, quant=2))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC1  # claim extended sequential (unsupported)
    with pytest.raises(ValueError):
        decode_jpeg(bytes(enc))
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0hello")  # no SOF/SOS


def test_meta_contract_and_dispatch():
    px = _smooth(20, 30)
    enc = encode_jpeg(px, quant=2)
    meta = jpeg_decode_meta(enc)
    assert meta["width"] == 30 and meta["height"] == 20
    assert meta["channels"] == 3
    # dispatch: real decode for baseline; unsupported variants return
    # REAL header dims with the explicit not-decoded flag
    assert image_decode(enc) == meta
    broken = bytearray(enc)
    i = broken.find(b"\xff\xc0")
    broken[i + 1] = 0xC1  # extended sequential: header-metadata only
    hdr = image_decode(bytes(broken))
    assert hdr["pixels_decoded"] is False
    assert (hdr["width"], hdr["height"]) == (30, 20)  # true SOF dims


def test_jpeg_resize_dispatch():
    from postgresimporter_spark.operators.jpeg import decode_jpeg
    from postgresimporter_spark.operators.multimodal import image_resize

    px = _smooth(32, 32)
    enc = encode_jpeg(px, quant=2)
    out = image_resize(enc, 16, 16)
    dec = decode_jpeg(out)  # re-encoded JPEG, half size
    assert dec.shape == (16, 16, 3)
    # nearest-neighbor of a smooth ramp stays close to the 2x strided
    # original
    ref = px[::2, ::2]
    assert abs(float(dec.mean()) - float(ref.mean())) < 4.0


def test_progressive_decode_byte_identical_to_baseline():
    from postgresimporter_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(11)
    cases = [
        _smooth(33, 46),
        rng.integers(0, 256, (24, 17, 3), dtype=np.uint8),
        np.full((40, 40), 128, dtype=np.uint8),  # long EOB runs
        ((np.mgrid[0:19, 0:29][0] * 7) % 256).astype(np.uint8),
    ]
    for q in (1, 2, 8):
        for px in cases:
            base = decode_jpeg(encode_jpeg(px, quant=q))
            prog = decode_jpeg(encode_jpeg_progressive(px, quant=q))
            # identical quantized coefficients -> identical pixels:
            # the cross-codec identity that pins every progressive
            # path (spectral scans, DC/AC successive approximation,
            # EOB runs, the G.7 correction-bit interleave)
            assert (base == prog).all(), (px.shape, q)


def test_progressive_dispatch_and_meta():
    from postgresimporter_spark.operators.jpeg import (
        encode_jpeg_progressive,
        jpeg_decode_meta,
    )

    px = _smooth(20, 30)
    enc = encode_jpeg_progressive(px, quant=2)
    assert enc[:4] == b"\xff\xd8\xff\xdb"
    assert b"\xff\xc2" in enc  # SOF2
    meta = jpeg_decode_meta(enc)
    assert meta["width"] == 30 and meta["height"] == 20
    assert image_decode(enc) == meta  # real decode, not the stub


def test_interleaved_progressive_ac_scan_rejected():
    from postgresimporter_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )

    # forge a progressive file whose AC scan claims BOTH components
    # (T.81 forbids interleaved AC in progressive mode): rewrite the
    # first single-component AC SOS header (located by its byte
    # signature — walking the container would require skipping entropy
    # data) into a 2-component scan header
    px = _smooth(16, 16)
    enc = encode_jpeg_progressive(px, quant=2)
    sig = b"\xff\xda\x00\x08\x01\x01\x00\x01\x3f"
    i = enc.find(sig)
    assert i > 0, "no single-component AC scan found to forge"
    ahal = enc[i + 9 : i + 10]
    bad = (
        enc[:i]
        + b"\xff\xda\x00\x0a\x02\x01\x00\x02\x00\x01\x3f"
        + ahal
        + enc[i + 10 :]
    )
    with pytest.raises(ValueError):
        decode_jpeg(bad)
