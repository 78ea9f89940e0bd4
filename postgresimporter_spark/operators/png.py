"""Library-free PNG codec: real pixel decode/encode with stdlib zlib.

PNG's container is plain byte layout + zlib (RFC 2083): chunk framing,
scanline filters (None/Sub/Up/Average/Paeth), and CRC32 are all
implementable with the standard library and numpy — no media package
required.  This turns the multimodal tier's *image* decode and resize
from documented stubs into real transforms for the PNG subset that
covers the overwhelming majority of crawl images in that format:

- 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
  6 (RGBA), non-interlaced.
- Unsupported variants (16-bit, palette, Adam7) raise ``ValueError``
  so callers can fall back to header-only metadata — the same honest
  claim-boundary policy as the other modalities.

Everything here is per-row CPU work executed inside Arrow-batched
``mapInPandas`` workers (see ``multimodal.py``) — embarrassingly
parallel, no shuffle, peak memory one image.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .mediacaps import check_pixels

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        yield ctype, body
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IEND":
            break


def decode_png(content: bytes) -> np.ndarray:
    """PNG bytes -> (height, width, channels) uint8 array.

    Raises ``ValueError`` for non-PNG input or unsupported variants
    (16-bit, palette, interlaced)."""
    if not content or not content.startswith(PNG_MAGIC):
        raise ValueError("not a PNG")
    width = height = None
    bitdepth = colortype = interlace = None
    idat = b""
    for ctype, body in _chunks(content):
        if ctype == b"IHDR":
            width, height, bitdepth, colortype, _, _, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"IDAT":
            idat += body
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    if bitdepth != 8 or colortype not in _CHANNELS or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant (depth={bitdepth}, "
            f"color={colortype}, interlace={interlace})"
        )
    ch = _CHANNELS[colortype]
    # Bomb guard (r13): the declared size drives BOTH the output
    # allocation and the zlib inflation below — check it before either
    # (a 1 KB IDAT can inflate ~1000:1, and IHDR dims are 32-bit).
    check_pixels(width, height, "png")
    stride = width * ch
    expected = height * (stride + 1)
    # Bounded inflate: cap the decompressed bytes at expected+1 so a
    # stream that inflates past the declared size fails the mismatch
    # check below instead of materializing gigabytes first.
    d = zlib.decompressobj()
    raw = d.decompress(idat, expected + 1)
    if len(raw) == expected and d.unconsumed_tail:
        # exactly-expected output with compressed input left over is
        # still a mismatch; probe ONE more byte, never the full tail
        raw += d.decompress(d.unconsumed_tail, 1)
    if len(raw) != expected:
        raise ValueError("scanline size mismatch")
    rows: list[bytes] = []
    prev = bytearray(stride)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            for x in range(ch, stride):
                line[x] = (line[x] + line[x - ch]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = line[x - ch] if x >= ch else 0
                line[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = (
                    a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                )
                line[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
        rows.append(bytes(line))
        prev = line
    return np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(
        height, width, ch
    )


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, c) uint8 array -> PNG bytes (8-bit, filter 0, one IDAT)."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, ch = pixels.shape
    colortype = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if colortype is None:
        raise ValueError(f"unsupported channel count {ch}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    body = pixels.astype(np.uint8).reshape(h, w * ch)
    raw = b"".join(b"\x00" + body[y].tobytes() for y in range(h))
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width)."""
    h, w = pixels.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return pixels[ys][:, xs]


def png_decode_meta(content: bytes) -> dict:
    """Decoder-contract wrapper: real pixel stats for supported PNGs."""
    px = decode_png(content)
    h, w, ch = px.shape
    return {
        "width": w,
        "height": h,
        "duration_ms": 0,
        "channels": ch,
        "mean_luma": float(np.round(px.mean(), 4)),
    }


def png_resize(content: bytes, width: int, height: int) -> bytes:
    """Resizer-contract wrapper: real decode -> nearest resample ->
    re-encode."""
    return encode_png(resize_nearest(decode_png(content), width, height))


__all__ = [
    "decode_png",
    "encode_png",
    "resize_nearest",
    "png_decode_meta",
    "png_resize",
    "PNG_MAGIC",
]
