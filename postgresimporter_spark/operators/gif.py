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

from .mediacaps import check_pixels

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
    """GIF bytes -> (height, width, 3) uint8 RGB of the first frame.
    Malformed/truncated streams raise ValueError (low-level
    Index/KeyErrors are normalized here so the dispatch boundary
    'corrupt input -> stub fallback' holds — BUILD_NOTES inv. 22)."""
    try:
        return _decode_gif_raw(content)
    except (IndexError, KeyError) as e:
        raise ValueError(f"gif: malformed stream ({e!r})") from e


def _decode_gif_raw(content: bytes) -> np.ndarray:
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
            # bomb guard (r13): w*h bounds the LZW output and the
            # int32 index array — 16-bit dims still allow 4.3e9 px
            check_pixels(w, h, "gif")
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


def iter_gif_frames(content: bytes):
    """Yield (rgb_frame, delay_ms) for every frame of a (possibly
    animated) GIF, composited onto the logical screen: frame rects
    paint at their (x, y) offsets, transparency (GCE flag) leaves the
    underlying canvas visible, and disposal methods 2 (restore
    background) and 3 (restore previous) are honored — the standard
    compositing model, so frame N is the image a viewer actually shows
    at that point of the animation, not just the raw sub-rect.
    Malformed streams raise ValueError mid-iteration (normalized like
    ``decode_gif``)."""
    try:
        yield from _iter_gif_frames_raw(content)
    except (IndexError, KeyError) as e:
        raise ValueError(f"gif: malformed stream ({e!r})") from e


def _iter_gif_frames_raw(content: bytes):
    b = content or b""
    if b[:6] not in GIF_MAGICS or len(b) < 13:
        raise ValueError("not a GIF")
    sw = int.from_bytes(b[6:8], "little")
    sh = int.from_bytes(b[8:10], "little")
    # bomb guard (r13): the logical-screen canvas is allocated at
    # sw*sh*3 bytes before any frame decodes
    check_pixels(sw, sh, "gif")
    flags = b[10]
    bg_index = b[11]
    gct = None
    pos = 13
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(b[pos : pos + 3 * n], dtype=np.uint8).reshape(
            n, 3
        )
        pos += 3 * n
    bg_rgb = (
        gct[bg_index] if gct is not None and bg_index < len(gct)
        else np.zeros(3, dtype=np.uint8)
    )
    canvas = np.tile(bg_rgb, (sh, sw, 1)).astype(np.uint8)
    delay_ms = 0
    transparent = None
    disposal = 0
    while pos < len(b):
        marker = b[pos]
        if marker == 0x21:  # extension
            label = b[pos + 1] if pos + 1 < len(b) else 0
            if label == 0xF9 and pos + 7 < len(b):  # Graphic Control
                gflags = b[pos + 3]
                delay_ms = (
                    int.from_bytes(b[pos + 4 : pos + 6], "little") * 10
                )
                disposal = (gflags >> 2) & 0x7
                transparent = b[pos + 6] if gflags & 0x01 else None
            pos += 2
            while pos < len(b) and b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
        elif marker == 0x2C:  # image descriptor
            x = int.from_bytes(b[pos + 1 : pos + 3], "little")
            y = int.from_bytes(b[pos + 3 : pos + 5], "little")
            w = int.from_bytes(b[pos + 5 : pos + 7], "little")
            h = int.from_bytes(b[pos + 7 : pos + 9], "little")
            # bomb guard (r13): per-frame rects allocate w*h int32
            # indices independent of the screen size
            check_pixels(w, h, "gif")
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
            pos += 1  # block terminator
            idx = _lzw_decode(bytes(data), min_code, w * h)
            if len(idx) < w * h:
                raise ValueError("truncated pixel data")
            arr = np.array(idx, dtype=np.int32).reshape(h, w)
            if iflags & 0x40:
                arr = _deinterlace(arr)
            if arr.max() >= len(palette):
                raise ValueError("palette index out of range")
            prev = canvas.copy() if disposal == 3 else None
            rect = canvas[y : y + h, x : x + w]
            rgb = palette[arr][: rect.shape[0], : rect.shape[1]]
            if transparent is not None:
                mask = (arr != transparent)[: rect.shape[0], : rect.shape[1]]
                rect[mask] = rgb[mask]
            else:
                rect[:, :] = rgb
            yield canvas.copy(), delay_ms
            if disposal == 2:
                canvas[y : y + h, x : x + w] = bg_rgb
            elif disposal == 3 and prev is not None:
                canvas = prev
            delay_ms = 0
            transparent = None
            disposal = 0
        elif marker == 0x3B:
            break
        else:
            raise ValueError(f"bad block marker 0x{marker:02x}")


def gif_frames_meta(content: bytes) -> dict:
    """Frame count and total animation duration (ms)."""
    n = 0
    total = 0
    for _, delay in iter_gif_frames(content):
        n += 1
        total += delay
    return {"n_frames": n, "duration_ms": total}


__all__ += ["iter_gif_frames", "gif_frames_meta"]
