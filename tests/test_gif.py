"""GIF LZW decoder: ground-truth bitstreams, encoder roundtrip,
interlace, and multimodal dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from postgresimporter_spark.operators.gif import decode_gif, gif_decode_meta

PALETTE = bytes(
    [0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255]  # black, R, G, B
)
PALETTE_ARR = __import__("numpy").frombuffer(PALETTE, dtype="uint8").reshape(4, 3)


class _Bits:
    """LSB-first bit packer (GIF's LZW bit order)."""

    def __init__(self):
        self.bits: list[int] = []

    def put(self, code: int, width: int):
        for i in range(width):
            self.bits.append((code >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j, bit in enumerate(self.bits[i : i + 8]):
                b |= bit << j
            out.append(b)
        return bytes(out)


def _wrap_gif(w: int, h: int, lzw: bytes, interlace: bool = False) -> bytes:
    head = b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
    head += bytes([0x81, 0, 0])  # GCT present, 4 entries (2 bits)
    head += PALETTE
    desc = (
        b"\x2c"
        + b"\x00\x00\x00\x00"
        + w.to_bytes(2, "little")
        + h.to_bytes(2, "little")
        + bytes([0x40 if interlace else 0])
    )
    body = bytes([2])  # min code size
    # sub-blocks
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        body += bytes([len(chunk)]) + chunk
    body += b"\x00"
    return head + desc + body + b"\x3b"


def _lzw_all_clears(indices: list[int]) -> bytes:
    """Degenerate LZW stream: CLEAR before every pixel, so the table
    never grows — trivially correct ground truth."""
    bits = _Bits()
    for p in indices:
        bits.put(4, 3)  # CLEAR
        bits.put(p, 3)
    bits.put(5, 3)  # END
    return bits.bytes()


def _lzw_encode(indices: list[int], min_code_size: int = 2) -> bytes:
    """Independent reference GIF-LZW encoder (dictionary growth, code
    width bumps) — no code shared with the decoder."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    bits = _Bits()
    code_size = min_code_size + 1
    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    bits.put(clear, code_size)
    buf: tuple[int, ...] = ()
    for p in indices:
        cand = buf + (p,)
        if cand in table:
            buf = cand
            continue
        bits.put(table[buf], code_size)
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        buf = (p,)
    if buf:
        bits.put(table[buf], code_size)
    bits.put(end, code_size)
    return bits.bytes()


def test_decode_all_clear_stream():
    idx = [0, 1, 2, 3, 3, 2, 1, 0, 1, 1, 2, 2]
    data = _wrap_gif(4, 3, _lzw_all_clears(idx))
    px = decode_gif(data)
    assert px.shape == (3, 4, 3)
    pal = np.frombuffer(PALETTE, dtype=np.uint8).reshape(4, 3)
    assert np.array_equal(px, pal[np.array(idx).reshape(3, 4)])


def test_decode_encoder_roundtrip_with_dictionary_growth():
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 4, size=16 * 11).tolist()
    data = _wrap_gif(16, 11, _lzw_encode(idx))
    px = decode_gif(data)
    pal = np.frombuffer(PALETTE, dtype=np.uint8).reshape(4, 3)
    assert np.array_equal(px, pal[np.array(idx).reshape(11, 16)])


def test_decode_interlaced():
    h, w = 9, 2
    idx = [[y % 4] * w for y in range(h)]  # row y filled with y%4
    # interlaced storage order: rows 0,8 then 4 then 2,6 then 1,3,5,7
    order = [0, 8, 4, 2, 6, 1, 3, 5, 7]
    stored = [v for y in order for v in idx[y]]
    data = _wrap_gif(w, h, _lzw_all_clears(stored), interlace=True)
    px = decode_gif(data)
    pal = np.frombuffer(PALETTE, dtype=np.uint8).reshape(4, 3)
    assert np.array_equal(px, pal[np.array(idx)])


def test_corrupt_gif_raises():
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a\x00")
    with pytest.raises(ValueError):
        decode_gif(b"nope")


def test_meta_and_dispatch():
    idx = [1] * 6
    data = _wrap_gif(3, 2, _lzw_all_clears(idx))
    m = gif_decode_meta(data)
    assert (m["width"], m["height"]) == (3, 2)
    assert m["mean_luma"] == pytest.approx(255 / 3, abs=0.01)

    from postgresimporter_spark.operators.multimodal import image_decode

    d = image_decode(data)
    assert d["width"] == 3 and d["height"] == 2


def _animated_gif(frames, delays_cs, disposal=0, transparent=None):
    """Multi-frame GIF builder on the independent LZW encoder:
    ``frames`` are (x, y, index-rows) sub-rects painted in order."""
    sw = max(x + len(rows[0]) for x, _, rows in frames)
    sh = max(y + len(rows) for _, y, rows in frames)
    head = b"GIF89a" + sw.to_bytes(2, "little") + sh.to_bytes(2, "little")
    head += bytes([0x81, 0, 0]) + PALETTE  # GCT, bg index 0
    out = bytearray(head)
    for (x, y, rows), delay in zip(frames, delays_cs):
        gflags = (disposal & 0x7) << 2
        tidx = 0
        if transparent is not None:
            gflags |= 0x01
            tidx = transparent
        out += bytes([0x21, 0xF9, 4, gflags])
        out += delay.to_bytes(2, "little") + bytes([tidx, 0])
        w, h = len(rows[0]), len(rows)
        out += (
            b"\x2c"
            + x.to_bytes(2, "little")
            + y.to_bytes(2, "little")
            + w.to_bytes(2, "little")
            + h.to_bytes(2, "little")
            + b"\x00"
        )
        lzw = _lzw_encode([p for row in rows for p in row])
        out += bytes([2])
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def test_animated_gif_frames_and_compositing():
    from postgresimporter_spark.operators.gif import (
        gif_frames_meta,
        iter_gif_frames,
    )

    # frame 1: full 4x2 of color 1; frame 2: 2x1 sub-rect of color 2
    # at (1, 1) — compositing must keep frame 1 outside the rect
    gif = _animated_gif(
        [(0, 0, [[1] * 4, [1] * 4]), (1, 1, [[2, 2]])],
        delays_cs=[10, 20],
    )
    frames = list(iter_gif_frames(gif))
    assert [d for _, d in frames] == [100, 200]
    f1, f2 = frames[0][0], frames[1][0]
    assert (f1 == PALETTE_ARR[1]).all()
    assert (f2[1, 1] == PALETTE_ARR[2]).all()
    assert (f2[0, 0] == PALETTE_ARR[1]).all()  # untouched area persists
    assert gif_frames_meta(gif) == {"n_frames": 2, "duration_ms": 300}


def test_animated_gif_transparency_and_disposal():
    from postgresimporter_spark.operators.gif import iter_gif_frames

    # transparent index 0 in frame 2 must leave frame 1 visible
    gif = _animated_gif(
        [(0, 0, [[1, 1], [1, 1]]), (0, 0, [[0, 2], [0, 0]])],
        delays_cs=[5, 5],
        transparent=0,
    )
    frames = [px for px, _ in iter_gif_frames(gif)]
    assert (frames[1][0, 0] == PALETTE_ARR[1]).all()  # transparent hole
    assert (frames[1][0, 1] == PALETTE_ARR[2]).all()  # painted pixel


def test_sample_frames_real_gif(spark, tmp_path):
    from postgresimporter_spark.operators.multimodal import (
        read_media_dir,
        sample_frames,
    )
    from postgresimporter_spark.operators.png import decode_png

    gif = _animated_gif(
        [(0, 0, [[1] * 4, [1] * 4]), (0, 0, [[2] * 4, [2] * 4])],
        delays_cs=[10, 10],  # 100ms each
    )
    (tmp_path / "anim.gif").write_bytes(gif)
    media = read_media_dir(spark, str(tmp_path) + "/*.gif", "image")
    rows = sample_frames(media, every_ms=100).orderBy("frame_ms").collect()
    assert [r["frame_ms"] for r in rows] == [0, 100]
    first = decode_png(bytes(rows[0]["frame"]))
    second = decode_png(bytes(rows[1]["frame"]))
    assert (first == PALETTE_ARR[1]).all()
    assert (second == PALETTE_ARR[2]).all()


def test_truncated_gif_raises_valueerror_and_stubs():
    from postgresimporter_spark.operators.gif import (
        decode_gif,
        iter_gif_frames,
    )
    from postgresimporter_spark.operators.multimodal import image_resize

    bad = b"GIF89a" + b"\x00" * 7 + b"\x2c"  # truncated descriptor
    with pytest.raises(ValueError):
        decode_gif(bad)
    with pytest.raises(ValueError):
        list(iter_gif_frames(bad))
    out = image_resize(bad, 4, 4)  # stub fallback, not a crash
    assert out == bytes([len(bad) % 251]) * ((16 % 1024) + 1)


def test_sample_frames_frameless_gif_keeps_row(spark, tmp_path):
    from postgresimporter_spark.operators.multimodal import (
        read_media_dir,
        sample_frames,
    )

    # header + trailer, no image frame: must fall through to the
    # offset path (>= 1 row per input), never vanish
    (tmp_path / "empty.gif").write_bytes(
        b"GIF89a" + (4).to_bytes(2, "little") + (4).to_bytes(2, "little")
        + bytes([0x81, 0, 0]) + PALETTE + b"\x3b"
    )
    media = read_media_dir(spark, str(tmp_path) + "/*.gif", "image")
    rows = sample_frames(media, every_ms=100).collect()
    assert len(rows) >= 1 and rows[0]["frame"] is None


def test_zero_delay_frames_never_sampled():
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from postgresimporter_spark.operators.multimodal import _gif_sample
    from postgresimporter_spark.operators.png import decode_png

    # frame 1 has delay 0 (instantly replaced), frame 2 holds 100ms:
    # the only sampled frame must be frame 2
    gif = _animated_gif(
        [(0, 0, [[1, 1], [1, 1]]), (0, 0, [[2, 2], [2, 2]])],
        delays_cs=[0, 10],
    )
    samples = _gif_sample(gif, every_ms=50)
    assert [off for off, _ in samples] == [0, 50]
    for _, png in samples:
        assert (decode_png(png) == PALETTE_ARR[2]).all()
