"""Library-free GIF decoder: real first-frame pixels via pure LZW.

GIF (87a/89a) needs no codec library either: the container is byte
framing, the color table is a flat palette, and the image data is LZW
with GIF's variable code width — ~80 lines of integer work.  This
extends the multimodal tier's REAL decode boundary to GIF, alongside
PNG (``png.py``) and PCM WAV; what remains stubbed genuinely requires
external codecs (JPEG entropy decode, MP3/AAC, video).

Scope: first image frame, global or local palette, optional Adam-style
interlace; transparency and animation composition are out of scope
(the first frame's indexed pixels are what curation features need).
Unsupported/corrupt input raises ``ValueError`` so the dispatch falls
back to the deterministic stub.
"""

from __future__ import annotations

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")


def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> list[int]:
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    out: list[int] = []
    prev: list[int] | None = None
    bitpos = 0
    total_bits = len(data) * 8
    while bitpos + code_size <= total_bits and len(out) < max_pixels:
        byte_i = bitpos >> 3
        chunk = int.from_bytes(data[byte_i : byte_i + 4], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            code_size = min_code_size + 1
            table = [[i] for i in range(clear)] + [[], []]
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table) or not table[code]:
                raise ValueError("bad first LZW code")
            entry = table[code]
        else:
            if code < len(table) and table[code]:
                entry = table[code]
            elif code == len(table):
                entry = prev + [prev[0]]
            else:
                raise ValueError("bad LZW code")
            table.append(prev + [entry[0]])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        out.extend(entry)
        prev = entry
    return out[:max_pixels]


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    out = np.empty_like(rows)
    for src, dst in enumerate(order):
        out[dst] = rows[src]
    return out


def decode_gif(content: bytes) -> np.ndarray:
    """GIF bytes -> (height, width, 3) uint8 RGB of the first frame."""
    b = content or b""
    if b[:6] not in GIF_MAGICS or len(b) < 13:
        raise ValueError("not a GIF")
    flags = b[10]
    gct = None
    pos = 13
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(b[pos : pos + 3 * n], dtype=np.uint8).reshape(
            n, 3
        )
        pos += 3 * n
    while pos < len(b):
        marker = b[pos]
        if marker == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(b) and b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
        elif marker == 0x2C:  # image descriptor
            w = int.from_bytes(b[pos + 5 : pos + 7], "little")
            h = int.from_bytes(b[pos + 7 : pos + 9], "little")
            iflags = b[pos + 9]
            pos += 10
            palette = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                palette = np.frombuffer(
                    b[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            if palette is None:
                raise ValueError("no color table")
            min_code = b[pos]
            pos += 1
            data = bytearray()
            while pos < len(b) and b[pos] != 0:
                ln = b[pos]
                data += b[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            idx = _lzw_decode(bytes(data), min_code, w * h)
            if len(idx) < w * h:
                raise ValueError("truncated pixel data")
            arr = np.array(idx, dtype=np.int32).reshape(h, w)
            if iflags & 0x40:
                arr = _deinterlace(arr)
            if arr.max() >= len(palette):
                raise ValueError("palette index out of range")
            return palette[arr]
        elif marker == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"bad block marker 0x{marker:02x}")
    raise ValueError("no image block")


def gif_decode_meta(content: bytes) -> dict:
    """Decoder-contract wrapper: real first-frame pixel stats."""
    px = decode_gif(content)
    h, w, _ = px.shape
    return {
        "width": w,
        "height": h,
        "duration_ms": 0,
        "channels": 3,
        "mean_luma": float(np.round(px.mean(), 4)),
    }


__all__ = ["decode_gif", "gif_decode_meta", "GIF_MAGICS"]
