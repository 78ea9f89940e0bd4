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


__all__ = [
    "textured",
    "image_corpus",
    "wav_bytes",
    "sine",
    "audio_corpus",
]
