"""Deterministic synthetic media corpus — the fixture recipe behind
the image/audio registry queries (q280-q282), their DuckDB oracles,
and the multimodal bench entry.

Everything is a pure function of fixed seeds (numpy ``RandomState``
MT19937 — stable across platforms and numpy versions) and the repo's
own codecs (``png.encode_png``, ``jpeg.encode_jpeg``), so the corpus
is bit-identical everywhere it is rebuilt: in a registry query on the
driver, in an executor batch for the bench corpus, and in
``tests/gen_media_expected.py`` where the expected pHash/feature
values are computed with INDEPENDENT numpy models and frozen into
``plans/media_expected.py`` for the oracle side.

Why generate rather than commit binaries: the oracle gate (DuckDB)
cannot decode images or WAVs, so the external check needs frozen
expected values either way; generating the bytes from seeds keeps the
repo binary-free and makes the corpus size a parameter (the bench
entry scales the same recipe to hundreds of images).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# image corpus


def textured(seed: int, n: int = 8, size: int = 64) -> np.ndarray:
    """Random 8x8 block texture upsampled to size x size: broadband
    low-frequency content so every pHash bit carries signal (a pure
    sinusoid parks most DCT coefficients at the median and turns the
    hash into noise)."""
    rng = np.random.RandomState(seed)
    base = rng.randint(30, 226, (n, n))
    return base.repeat(size // n, 0).repeat(size // n, 1).astype(np.uint8)


def _rgb(px: np.ndarray) -> np.ndarray:
    return np.stack([px] * 3, axis=2)


def _noisy(px: np.ndarray, seed: int) -> np.ndarray:
    return np.clip(
        px.astype(int) + np.random.RandomState(seed).randint(-6, 7, px.shape),
        0,
        255,
    ).astype(np.uint8)


def image_corpus(n_base: int = 16) -> list[tuple]:
    """(path, modality, content, meta) rows in ``MEDIA_SCHEMA`` shape:
    ``n_base`` textured PNGs; for the first half a noisy JPEG
    re-encode (the near-dup partner); for the first quarter a 2x
    downsample (resize-invariance partner); plus two undecodable rows
    that must surface as NULL hashes, never failures."""
    from .jpeg import encode_jpeg
    from .png import encode_png

    rows = []
    for s in range(n_base):
        px = textured(seed=s)
        rows.append((f"img{s:03d}.png", "image", bytearray(encode_png(_rgb(px))), None))
        if s < n_base // 2:
            rows.append(
                (
                    f"img{s:03d}_re.jpg",
                    "image",
                    bytearray(encode_jpeg(_noisy(px, 1000 + s), quant=2)),
                    None,
                )
            )
        if s < n_base // 4:
            rows.append(
                (
                    f"img{s:03d}_sm.png",
                    "image",
                    bytearray(encode_png(_rgb(px[::2, ::2]))),
                    None,
                )
            )
    rows.append(("corrupt_a.bin", "image", bytearray(b"\x00\x01garbage"), None))
    rows.append(("corrupt_b.gif", "image", bytearray(b"GIF89a\x01"), None))
    return rows


# ---------------------------------------------------------------------------
# audio corpus


def wav_bytes(
    samples: np.ndarray, rate: int = 8000, channels: int = 1, bits: int = 16
) -> bytes:
    """Minimal RIFF/WAVE PCM container (8- or 16-bit)."""
    if bits == 16:
        data = samples.astype("<i2").tobytes()
    elif bits == 8:
        data = samples.astype(np.uint8).tobytes()
    else:
        raise ValueError("wav_bytes: bits must be 8 or 16")
    bytes_per = bits // 8
    fmt = struct.pack(
        "<HHIIHH",
        1,
        channels,
        rate,
        rate * bytes_per * channels,
        bytes_per * channels,
        bits,
    )
    return (
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


def sine(freq: float, rate: int = 8000, secs: float = 1.0, amp: int = 10000):
    t = np.arange(int(rate * secs)) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype("<i2")


def audio_corpus() -> list[tuple]:
    """(path, modality, content, meta) rows: pure tones across the
    band and across rates, a two-tone chord, white noise, a stereo
    mixdown case, an 8-bit file, a zero-length data chunk (defined
    zero/NULL features), and two undecodable rows (NULL features)."""
    rows = []
    for f in (220.0, 440.0, 880.0, 1760.0, 3000.0):
        rows.append(
            (f"tone_{int(f)}.wav", "audio", bytearray(wav_bytes(sine(f))), None)
        )
    rows.append(
        (
            "tone_440_r16k.wav",
            "audio",
            bytearray(wav_bytes(sine(440.0, rate=16000), rate=16000)),
            None,
        )
    )
    chord = ((sine(300.0).astype(int) + sine(1200.0).astype(int)) // 2).astype(
        "<i2"
    )
    rows.append(("chord.wav", "audio", bytearray(wav_bytes(chord)), None))
    noise = np.random.RandomState(7).randint(-8000, 8000, 8000).astype("<i2")
    rows.append(("noise.wav", "audio", bytearray(wav_bytes(noise)), None))
    left = sine(440.0)
    inter = np.empty(2 * len(left), dtype="<i2")
    inter[0::2] = left
    inter[1::2] = 0
    rows.append(
        ("stereo.wav", "audio", bytearray(wav_bytes(inter, channels=2)), None)
    )
    eight = (
        np.random.RandomState(11).randint(0, 256, 4000).astype(np.uint8)
    )
    rows.append(
        ("eight_bit.wav", "audio", bytearray(wav_bytes(eight, bits=8)), None)
    )
    rows.append(
        (
            "empty.wav",
            "audio",
            bytearray(wav_bytes(np.zeros(0, dtype="<i2"))),
            None,
        )
    )
    rows.append(("corrupt.mp3", "audio", bytearray(b"ID3garbage"), None))
    rows.append(("float.wav", "audio", bytearray(_float_wav()), None))
    return rows


def _float_wav() -> bytes:
    """IEEE-float WAV (format tag 3) — inside RIFF but outside the PCM
    contract, so it must surface as NULL features (honesty boundary)."""
    fmt3 = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    return (
        b"RIFF"
        + struct.pack("<I", 36)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt3))
        + fmt3
        + b"data"
        + struct.pack("<I", 0)
    )


# ---------------------------------------------------------------------------
# video + container corpora


def video_corpus() -> list[tuple]:
    """(path, modality, content, meta) rows: two MJPEG AVIs with known
    frame timing (4 flat 16x8 frames at 2 fps; 3 textured 32x32 frames
    at 4 fps), a raw concatenated-JPEG stream (valid frames, unknown
    timing), and a junk-chunk AVI (header unreadable -> null fields,
    never failures)."""
    from .jpeg import encode_jpeg
    from .mjpeg import build_avi_mjpeg

    flat = [
        encode_jpeg(np.full((8, 16), 32 + 48 * i, dtype=np.uint8))
        for i in range(4)
    ]
    tex = [
        encode_jpeg(textured(seed=50 + i, size=32), quant=2)
        for i in range(3)
    ]
    return [
        (
            "vid_flat.avi",
            "video",
            bytearray(build_avi_mjpeg(flat, fps_milli=2_000)),
            None,
        ),
        (
            "vid_tex.avi",
            "video",
            bytearray(build_avi_mjpeg(tex, fps_milli=4_000)),
            None,
        ),
        (
            "raw_stream.mjpeg",
            "video",
            bytearray(b"".join(tex[:2])),
            None,
        ),
        (
            "corrupt.avi",
            "video",
            bytearray(b"RIFF\x10\x00\x00\x00AVI junkjunkjunk"),
            None,
        ),
    ]


def mp4_bytes(
    width: int = 320,
    height: int = 240,
    duration_ms: int = 1500,
    timescale: int = 1000,
) -> bytes:
    """Minimal ISO-BMFF container: ftyp + moov(mvhd + trak(tkhd)) with
    the given presentation dims and duration — enough real structure
    for a box-walking header parser, no media data."""

    def box(t: bytes, body: bytes) -> bytes:
        return (8 + len(body)).to_bytes(4, "big") + t + body

    ftyp = box(b"ftyp", b"isom" + (0).to_bytes(4, "big") + b"isom")
    dur = duration_ms * timescale // 1000
    # mvhd v0 body: version/flags, ctime, mtime, timescale, duration,
    # then rate/volume/reserved/matrix/next-track padding
    mvhd = box(
        b"mvhd",
        bytes(4)
        + bytes(8)
        + timescale.to_bytes(4, "big")
        + dur.to_bytes(4, "big")
        + bytes(76),
    )
    # tkhd v0 body is 84 bytes; width/height are the final 8 bytes in
    # 16.16 fixed point
    tkhd_body = bytearray(84)
    tkhd_body[-8:-4] = (width << 16).to_bytes(4, "big")
    tkhd_body[-4:] = (height << 16).to_bytes(4, "big")
    trak = box(b"trak", box(b"tkhd", bytes(tkhd_body)))
    return ftyp + box(b"moov", mvhd + trak)


def mp3_bytes(duration_ms: int = 1000, bitrate_kbps: int = 128) -> bytes:
    """Minimal CBR MPEG-1 Layer III stream: one valid frame-sync
    header (bitrate index 9 = 128 kbps, sample-rate index 0 = 44100)
    followed by zero padding sized so duration = bytes*8/bitrate."""
    if bitrate_kbps != 128:
        raise ValueError("fixture generator pins 128 kbps")
    n = duration_ms * bitrate_kbps // 8
    return bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x00" * (n - 4)


def container_corpus() -> list[tuple]:
    """Container-metadata-only rows: an MP4 (box-tree metadata, no
    decodable pixels) and a CBR MP3."""
    return [
        ("clip.mp4", "video", bytearray(mp4_bytes()), None),
        ("song.mp3", "audio", bytearray(mp3_bytes()), None),
    ]


FRAME_EVERY_MS = 400
RESIZE_W = RESIZE_H = 16


def video_neardup_corpus() -> list[tuple]:
    """The q300 input: the standard video corpus plus a noisy JPEG
    re-encode of vid_tex (same 4 fps timeline — the aligned near-dup
    partner) and an unrelated textured video (same timing, different
    content — must NOT match)."""
    from .jpeg import encode_jpeg
    from .mjpeg import build_avi_mjpeg

    tex_re = [
        encode_jpeg(_noisy(textured(seed=50 + i, size=32), 2000 + i), quant=4)
        for i in range(3)
    ]
    other = [
        encode_jpeg(textured(seed=60 + i, size=32), quant=2)
        for i in range(3)
    ]
    return video_corpus() + [
        (
            "vid_tex_re.avi",
            "video",
            bytearray(build_avi_mjpeg(tex_re, fps_milli=4_000)),
            None,
        ),
        (
            "vid_other.avi",
            "video",
            bytearray(build_avi_mjpeg(other, fps_milli=4_000)),
            None,
        ),
    ]


AFP_RATE = 8000
AFP_NOTES = 8
AFP_NOTE_FRAMES = 2  # frames per note; frame = 256 samples (audiofp)
AFP_SHIFT_FRAMES = 2  # re-recording lead-in, whole frames


def _afp_samples(seed: int, rng_noise=None, amp_scale: float = 1.0):
    """One fingerprint-corpus track: AFP_NOTES chord slots, each a
    stack of four on-bin sines (one per audiofp band, bin chosen by
    RandomState(1234+seed)) lasting AFP_NOTE_FRAMES frames — every
    band has a dominant, noise-robust peak in every frame."""
    frame = 256
    bands = ((1, 8), (9, 24), (25, 56), (57, 128))
    rng = np.random.RandomState(1234 + seed)
    n = AFP_NOTES * AFP_NOTE_FRAMES * frame
    t = np.arange(n) / AFP_RATE
    sig = np.zeros(n)
    for note in range(AFP_NOTES):
        sl = slice(
            note * AFP_NOTE_FRAMES * frame, (note + 1) * AFP_NOTE_FRAMES * frame
        )
        for lo, hi in bands:
            bin_ = int(rng.randint(lo, hi + 1))
            freq = bin_ * AFP_RATE / frame  # exactly on-bin
            sig[sl] += 2000.0 * amp_scale * np.sin(
                2 * np.pi * freq * t[sl]
            )
    if rng_noise is not None:
        sig = sig + rng_noise.randint(-60, 61, n)
    return np.clip(sig, -32000, 32000).astype("<i2")


def audio_fp_corpus(n_base: int = 6) -> list[tuple]:
    """The audio-landmark (q307) input: ``n_base`` chord tracks; the
    first half get a noisy, 0.9-amplitude RE-RECORDING led in by
    AFP_SHIFT_FRAMES frames of low noise (the aligned-at-an-offset
    near-dup partner); plus one undecodable row that must yield zero
    landmarks, never failures."""
    rows = []
    for s in range(n_base):
        rows.append(
            (
                f"trk{s:02d}.wav",
                "audio",
                bytearray(wav_bytes(_afp_samples(s), rate=AFP_RATE)),
                None,
            )
        )
        if s < n_base // 2:
            noise = np.random.RandomState(9000 + s)
            lead = noise.randint(-60, 61, AFP_SHIFT_FRAMES * 256).astype(
                "<i2"
            )
            body = _afp_samples(s, rng_noise=noise, amp_scale=0.9)
            rows.append(
                (
                    f"trk{s:02d}_re.wav",
                    "audio",
                    bytearray(
                        wav_bytes(
                            np.concatenate([lead, body]), rate=AFP_RATE
                        )
                    ),
                    None,
                )
            )
    rows.append(
        ("corrupt_fp.bin", "audio", bytearray(b"RIFFjunkjunk"), None)
    )
    return rows


def video_bench_corpus(n_base: int = 64, frames: int = 6) -> list[tuple]:
    """Bench-scale video corpus (the ``video_neardup_*`` regression
    guard): ``n_base`` textured ``frames``-frame MJPEG AVIs on a 4 fps
    timeline; the first half get a noisy JPEG re-encode on the SAME
    timeline (the aligned near-dup partner that must match); plus two
    undecodable rows that must surface as null hashes, never failures.
    Texture seeds start at 5000 (noise seeds at 7000) so the corpus is
    disjoint from the image/q300 corpora. ``n_base=64`` -> 98 videos,
    576 decodable frames."""
    from .jpeg import encode_jpeg
    from .mjpeg import build_avi_mjpeg

    rows = []
    for s in range(n_base):
        px = [
            textured(seed=5000 + s * 16 + i, size=32) for i in range(frames)
        ]
        enc = [encode_jpeg(p, quant=2) for p in px]
        rows.append(
            (
                f"vid{s:03d}.avi",
                "video",
                bytearray(build_avi_mjpeg(enc, fps_milli=4_000)),
                None,
            )
        )
        if s < n_base // 2:
            enc_re = [
                encode_jpeg(_noisy(p, 7000 + s * 16 + i), quant=4)
                for i, p in enumerate(px)
            ]
            rows.append(
                (
                    f"vid{s:03d}_re.avi",
                    "video",
                    bytearray(build_avi_mjpeg(enc_re, fps_milli=4_000)),
                    None,
                )
            )
    rows.append(
        (
            "corrupt_a.avi",
            "video",
            bytearray(b"RIFF\x10\x00\x00\x00AVI junkjunkjunk"),
            None,
        )
    )
    rows.append(("corrupt_b.bin", "video", bytearray(b"\x00\x01garbage"), None))
    return rows


def cross_modal_images() -> list[tuple]:
    """Still images for the cross-modal near-dup query (q312): PNGs of
    the SAME 8x8 texture bases as vid_tex's frames (textured() depends
    only on the seed, so the 64x64 still and the 32x32 frame share a
    pHash by resize invariance), one flat still matching vid_flat's
    flat frames, two unrelated textures that must NOT match, and one
    undecodable row."""
    from .png import encode_png

    rows = [
        (
            f"still_tex{i}.png",
            "image",
            bytearray(encode_png(_rgb(textured(seed=50 + i, size=64)))),
            None,
        )
        for i in range(2)
    ]
    rows.append(
        (
            "still_flat.png",
            "image",
            bytearray(encode_png(_rgb(np.full((64, 64), 80, dtype=np.uint8)))),
            None,
        )
    )
    rows += [
        (
            f"still_other{i}.png",
            "image",
            bytearray(encode_png(_rgb(textured(seed=300 + i, size=64)))),
            None,
        )
        for i in range(2)
    ]
    rows.append(("still_bad.bin", "image", bytearray(b"\x00junk"), None))
    return rows


def cross_modal_corpus() -> list[tuple]:
    """The q312 input: the cross-modal stills plus the exact video set
    whose sampled-frame hashes are frozen in media_expected
    (video_neardup_corpus)."""
    return cross_modal_images() + video_neardup_corpus()


def frame_sample_corpus() -> list[tuple]:
    """The q289 input: all videos + one image + one tone + one corrupt
    blob + the MP4 container — every ``sample_frames`` code path
    (real MJPEG timeline, unknown-timing stream, corrupt AVI, still
    image, duration-only audio, container-metadata-only video)."""
    imgs = {r[0]: r for r in image_corpus()}
    auds = {r[0]: r for r in audio_corpus()}
    return (
        video_corpus()
        + [imgs["img000.png"], auds["tone_440.wav"], imgs["corrupt_a.bin"]]
        + [r for r in container_corpus() if r[0] == "clip.mp4"]
    )


def resize_corpus() -> list[tuple]:
    """The q290 input: every DECODABLE image plus the MJPEG videos —
    the rows where resize produces re-parseable media (undecodable
    image bytes take the documented fake-resize fallback and stay a
    pytest concern, not an oracle row)."""
    imgs = [r for r in image_corpus() if not r[0].startswith("corrupt")]
    vids = [r for r in video_corpus() if r[0] != "corrupt.avi"]
    return imgs + vids


__all__ = [
    "textured",
    "image_corpus",
    "wav_bytes",
    "sine",
    "audio_corpus",
    "audio_fp_corpus",
    "video_corpus",
    "mp4_bytes",
    "mp3_bytes",
    "container_corpus",
    "frame_sample_corpus",
    "resize_corpus",
    "video_neardup_corpus",
    "video_bench_corpus",
    "cross_modal_images",
    "cross_modal_corpus",
    "FRAME_EVERY_MS",
    "RESIZE_W",
    "RESIZE_H",
]
