"""Library-free MJPEG video: AVI (RIFF) container walk + per-frame
JPEG decode, reusing ``operators/jpeg.py``'s from-scratch codec.

Motion-JPEG is the one mainstream video codec whose frames are plain
JPEG images, so the round-4 JPEG machinery (baseline + progressive
Huffman/IDCT decode, baseline encode) upgrades video from a
deterministic stub to a REAL decoder with no external codec:

- **MJPEG-in-AVI**: the RIFF 'AVI ' layout is a plain byte tree
  (LIST hdrl -> avih for timing/dims, LIST movi -> '00dc' chunks each
  holding one complete JPEG). ``avi_mjpeg_meta`` reads real timing
  from the header and really decodes the first frame's pixels;
  ``iter_avi_mjpeg_frames`` streams frame payloads one at a time
  (O(1) frames resident — same discipline as ``gif.iter_gif_frames``).
- **Raw MJPEG streams** (concatenated JPEGs, e.g. multipart camera
  feeds): frames split at EOI/SOI boundaries — valid because inside
  entropy-coded data every 0xFF is either zero-stuffed or a marker,
  so a true ``FFD9`` always terminates a frame.
- ``build_avi_mjpeg`` writes the minimal standard AVI (RIFF/hdrl/
  avih/strl/strh/strf/movi) so tests exercise a genuine container
  round-trip instead of synthetic fixtures.

Inter-frame codecs (H.264/H.265/VP9 in MP4/WebM) remain out of scope:
their container METADATA is real (``multimodal._parse_mp4_header``)
but pixel decode needs an entropy/motion pipeline no stdlib provides —
that boundary is now explicit in ``multimodal.video_decode`` instead
of hiding behind a fake.
"""

from __future__ import annotations

from collections.abc import Iterator

AVI_MAGIC = b"RIFF"
_JPEG_SOI = b"\xff\xd8\xff"


def is_avi(content: bytes) -> bool:
    b = content or b""
    return b[:4] == AVI_MAGIC and b[8:12] == b"AVI "


def _riff_chunks(b: bytes, lo: int, hi: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (fourcc, body_lo, body_hi) over a RIFF chunk run.
    Chunk bodies are padded to even length per the RIFF spec."""
    i = lo
    while i + 8 <= hi:
        cid = b[i : i + 4]
        clen = int.from_bytes(b[i + 4 : i + 8], "little")
        body = i + 8
        if body + clen > hi:
            return
        yield cid, body, body + clen
        i = body + clen + (clen % 2)


def parse_avi_header(content: bytes) -> dict | None:
    """avih main-header fields (all little-endian dwords): returns
    {usec_per_frame, total_frames, width, height} or None if the
    bytes are not an AVI with a readable header."""
    b = content or b""
    if not is_avi(b):
        return None
    for cid, lo, hi in _riff_chunks(b, 12, len(b)):
        if cid != b"LIST" or b[lo : lo + 4] != b"hdrl":
            continue
        for c2, l2, h2 in _riff_chunks(b, lo + 4, hi):
            if c2 == b"avih" and h2 - l2 >= 40:
                return {
                    "usec_per_frame": int.from_bytes(b[l2 : l2 + 4], "little"),
                    "total_frames": int.from_bytes(
                        b[l2 + 16 : l2 + 20], "little"
                    ),
                    "width": int.from_bytes(b[l2 + 32 : l2 + 36], "little"),
                    "height": int.from_bytes(b[l2 + 36 : l2 + 40], "little"),
                }
    return None


def iter_avi_mjpeg_frames(content: bytes) -> Iterator[bytes]:
    """Stream the JPEG payloads of an AVI's movi list ('..dc' /
    '..db' chunks that start with a JPEG SOI), one frame resident at
    a time."""
    b = content or b""
    if not is_avi(b):
        return
    for cid, lo, hi in _riff_chunks(b, 12, len(b)):
        if cid != b"LIST" or b[lo : lo + 4] != b"movi":
            continue
        for c2, l2, h2 in _riff_chunks(b, lo + 4, hi):
            if c2[2:4] in (b"dc", b"db") and b[l2 : l2 + 3] == _JPEG_SOI:
                yield b[l2:h2]


def _jpeg_frame_end(b: bytes, start: int) -> int:
    """Offset just past the EOI of the JPEG frame starting at ``start``,
    or -1 if the frame is truncated/corrupt. Walks marker segments —
    APPn/COM payloads are skipped by their 2-byte lengths — so an
    embedded EXIF/JFIF thumbnail (a complete inner JPEG, own EOI,
    inside an APP1 payload) cannot truncate the frame; only inside
    entropy-coded data is a scan for a non-stuffed FFD9 used (where
    zero-stuffing makes a bare FFD9 a true frame end)."""
    n = len(b)
    i = start + 2  # past SOI
    in_entropy = False
    while i + 1 < n:
        if not in_entropy:
            if b[i] != 0xFF:
                return -1
            m = b[i + 1]
            if m == 0xFF:  # fill byte
                i += 1
                continue
            if m == 0xD9:  # EOI
                return i + 2
            if m == 0x01 or 0xD0 <= m <= 0xD8:  # standalone markers
                i += 2
                continue
            if i + 3 >= n:
                return -1
            i += 2 + int.from_bytes(b[i + 2 : i + 4], "big")
            if m == 0xDA:  # SOS: entropy-coded data follows
                in_entropy = True
        else:
            j = b.find(b"\xff", i)
            if j < 0 or j + 1 >= n:
                return -1
            m = b[j + 1]
            if m == 0x00 or 0xD0 <= m <= 0xD7:  # stuffed / RST
                i = j + 2
            elif m == 0xFF:  # fill
                i = j + 1
            elif m == 0xD9:  # EOI
                return j + 2
            else:  # next real marker (progressive: another SOS/DHT)
                in_entropy = False
                i = j
    return -1


def split_mjpeg_stream(content: bytes) -> Iterator[bytes]:
    """Split a raw MJPEG stream (concatenated JPEGs) into frames by a
    marker-segment walk (``_jpeg_frame_end``): segment payloads skip by
    declared length, entropy data scans for the non-stuffed EOI — so
    frames carrying an embedded EXIF thumbnail (an inner JPEG with its
    own EOI inside APP1) split at the TRUE frame boundary, not the
    thumbnail's."""
    b = content or b""
    start = 0
    while b[start : start + 3] == _JPEG_SOI:
        end = _jpeg_frame_end(b, start)
        if end < 0:
            return
        yield b[start:end]
        start = end


def avi_mjpeg_meta(content: bytes) -> dict:
    """Decoder-contract dict for an MJPEG AVI: REAL header timing and
    a REAL pixel decode of the first frame (dims + mean luma via
    ``jpeg.decode_jpeg``); frame count from an actual movi walk, not
    the header's claim. Raises ValueError when the bytes are not an
    AVI carrying at least one JPEG frame."""
    import numpy as np

    from .jpeg import decode_jpeg

    hdr = parse_avi_header(content)
    if hdr is None:
        raise ValueError("not an AVI")
    n_frames = 0
    first = None
    for fr in iter_avi_mjpeg_frames(content):
        if first is None:
            first = fr
        n_frames += 1
    if first is None:
        raise ValueError("AVI carries no MJPEG frames")
    px = decode_jpeg(first)
    h, w = px.shape[:2]
    usec = hdr["usec_per_frame"]
    return {
        "width": w,
        "height": h,
        "duration_ms": int(n_frames * usec // 1000) if usec else None,
        "n_frames": n_frames,
        "fps_milli": int(1_000_000_000 // usec) if usec else None,
        "codec": "mjpeg-avi",
        "mean_luma_f0": float(np.round(px.mean(), 4)),
    }


def mjpeg_stream_meta(content: bytes) -> dict:
    """Decoder-contract dict for a raw concatenated-JPEG stream: real
    first-frame pixel decode + frame count. A bare stream carries no
    timing, so duration_ms is honestly None (never fabricated)."""
    import numpy as np

    from .jpeg import decode_jpeg

    n_frames = 0
    first = None
    for fr in split_mjpeg_stream(content):
        if first is None:
            first = fr
        n_frames += 1
    if first is None:
        raise ValueError("not an MJPEG stream")
    px = decode_jpeg(first)
    h, w = px.shape[:2]
    return {
        "width": w,
        "height": h,
        "duration_ms": None,
        "n_frames": n_frames,
        "codec": "mjpeg",
        "mean_luma_f0": float(np.round(px.mean(), 4)),
    }


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return cid + len(body).to_bytes(4, "little") + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def build_avi_mjpeg(
    frames: list[bytes], fps_milli: int = 30_000, width: int | None = None,
    height: int | None = None,
) -> bytes:
    """Write a minimal standards-shaped MJPEG AVI (RIFF -> hdrl(avih,
    strl(strh,strf)) -> movi('00dc'...)) from encoded JPEG frames.
    ``fps_milli`` is frames/sec x1000 (integer timing end to end).
    Dims default to the first frame's SOF dims via the real decoder."""
    if not frames:
        raise ValueError("MJPEG AVI needs at least one frame")
    if width is None or height is None:
        from .jpeg import decode_jpeg

        px = decode_jpeg(frames[0])
        height, width = px.shape[:2]
    usec = int(1_000_000_000 // fps_milli)
    n = len(frames)
    max_bytes = max(len(f) for f in frames)

    def dw(v: int) -> bytes:
        return int(v).to_bytes(4, "little")

    avih = _chunk(
        b"avih",
        dw(usec) + dw(max_bytes * fps_milli // 1000) + dw(0) + dw(0x10)
        + dw(n) + dw(0) + dw(1) + dw(max_bytes)
        + dw(width) + dw(height) + dw(0) * 4,
    )
    strh = _chunk(
        b"strh",
        b"vids" + b"MJPG" + dw(0) + dw(0) + dw(0)
        + dw(1000) + dw(fps_milli)  # dwScale / dwRate: fps = rate/scale
        + dw(0) + dw(n) + dw(max_bytes) + dw(0xFFFFFFFF) + dw(0)
        + (0).to_bytes(2, "little") * 2
        + width.to_bytes(2, "little") + height.to_bytes(2, "little"),
    )
    strf = _chunk(
        b"strf",
        dw(40) + dw(width) + dw(height)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + b"MJPG" + dw(width * height * 3) + dw(0) * 4,
    )
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))
    movi = _list(b"movi", b"".join(_chunk(b"00dc", f) for f in frames))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi)


__all__ = [
    "AVI_MAGIC",
    "is_avi",
    "parse_avi_header",
    "iter_avi_mjpeg_frames",
    "split_mjpeg_stream",
    "avi_mjpeg_meta",
    "mjpeg_stream_meta",
    "build_avi_mjpeg",
]
