"""Generate plans/media_expected.py — frozen expected pHash / audio
feature values for the deterministic media corpus (operators/mediagen).

The expectations are computed with INDEPENDENT models (FFT-based DCT-II
via Makhoul's even-extension trick instead of the operator's cosine
matmul; stdlib ``wave`` decoding + full-FFT spectrum instead of the
operator's byte-walking RIFF parser + rFFT), cross-checked against the
operator implementations, and the script FAILS if any value disagrees —
so the committed constants are simultaneously (a) an independent
re-derivation and (b) guaranteed in sync with the operators at
generation time. The external DuckDB oracle then replays these
constants against the live Spark pipeline every round.

Run from the repo root:  python tests/gen_media_expected.py
"""

from __future__ import annotations

import io
import sys
import wave
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from postgresimporter_spark.operators import mediagen  # noqa: E402
from postgresimporter_spark.operators.audiofeat import (  # noqa: E402
    audio_features,
)
from postgresimporter_spark.operators.imagehash import (  # noqa: E402
    decode_to_gray,
    phash,
)

_ROLLOFF = 0.85
_MAX_SAMPLES = 65536


# ---------------------------------------------------------------------------
# independent pHash model (FFT-based DCT, sort-based median)


def _dct2_ortho_fft(x: np.ndarray) -> np.ndarray:
    """Orthonormal 2-D DCT-II via Makhoul's FFT even-extension trick —
    numerically independent of the operator's cosine-matrix matmul."""

    def dct1d(a: np.ndarray) -> np.ndarray:
        n = a.shape[-1]
        v = np.concatenate([a[..., 0::2], a[..., 1::2][..., ::-1]], axis=-1)
        big = np.fft.fft(v, axis=-1)
        k = np.arange(n)
        unnorm = 2.0 * (big * np.exp(-1j * np.pi * k / (2 * n))).real
        scale = np.full(n, np.sqrt(1.0 / (2 * n)))
        scale[0] = np.sqrt(1.0 / (4 * n))
        return unnorm * scale

    return dct1d(dct1d(x).T).T


def independent_phash(content: bytes) -> int | None:
    try:
        gray = decode_to_gray(bytes(content))
    except ValueError:
        return None
    size = 32
    h, w = gray.shape
    ys = [(i * h) // size for i in range(size)]
    xs = [(i * w) // size for i in range(size)]
    small = gray[np.ix_(ys, xs)]
    coeffs = _dct2_ortho_fft(small)
    ac = coeffs[:8, :8].flatten()[1:]
    med = np.sort(ac)[len(ac) // 2]
    out = 0
    for idx in range(len(ac) - 1, -1, -1):  # reversed assembly order
        if ac[idx] > med:
            out |= 1 << idx
    return out


# ---------------------------------------------------------------------------
# independent audio model (stdlib wave + full FFT)


def independent_audio(content: bytes) -> dict | None:
    try:
        wf = wave.open(io.BytesIO(bytes(content)), "rb")
    except Exception:
        return None
    try:
        channels, width, rate = (
            wf.getnchannels(),
            wf.getsampwidth(),
            wf.getframerate(),
        )
        if width not in (1, 2):
            return None
        raw = wf.readframes(wf.getnframes())
    finally:
        wf.close()
    if width == 2:
        s = np.frombuffer(raw, dtype="<i2").astype(np.float64)
    else:
        s = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
    mono = s.reshape(-1, channels).mean(axis=1) if channels > 1 else s
    n = len(mono)
    out = {
        "duration_ms": int(n * 1000 // rate) if rate else 0,
        "sample_rate": rate,
    }
    if n == 0:
        out.update(
            rms=0.0,
            zero_crossing_rate=0.0,
            spectral_centroid_hz=None,
            spectral_rolloff_hz=None,
            spectral_bandwidth_hz=None,
        )
        return out
    out["rms"] = round(float(np.sqrt(np.mean(mono**2))), 4)
    neg = np.signbit(mono)
    out["zero_crossing_rate"] = round(
        float(np.count_nonzero(neg[1:] != neg[:-1]) / max(n - 1, 1)), 6
    )
    win = mono[:_MAX_SAMPLES]
    ln = len(win)
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(ln) / (ln - 1))
    full = np.abs(np.fft.fft(win * hann))
    mag = full[: ln // 2 + 1].copy()
    freqs = np.arange(ln // 2 + 1) * (rate / ln)
    total = float(mag.sum())
    if total <= 0:
        cen = rol = bw = None
    else:
        cen = float((freqs * mag).sum() / total)
        cum = np.add.accumulate(mag)
        rol = float(freqs[int(np.searchsorted(cum, _ROLLOFF * total))])
        bw = float(np.sqrt(((freqs - cen) ** 2 * mag).sum() / total))
    r4 = lambda x: None if x is None else round(x, 4)  # noqa: E731
    out["spectral_centroid_hz"] = r4(cen)
    out["spectral_rolloff_hz"] = r4(rol)
    out["spectral_bandwidth_hz"] = r4(bw)
    return out


# ---------------------------------------------------------------------------


def main() -> None:
    image_rows = []
    for path, _mod, content, _meta in mediagen.image_corpus():
        ind = independent_phash(content)
        try:
            op = phash(bytes(content))
        except ValueError:
            op = None
        if ind != op:
            raise SystemExit(
                f"pHash mismatch for {path}: independent={ind} operator={op}"
            )
        image_rows.append((path, ind))

    feat_cols = [
        "duration_ms",
        "sample_rate",
        "rms",
        "zero_crossing_rate",
        "spectral_centroid_hz",
        "spectral_rolloff_hz",
        "spectral_bandwidth_hz",
    ]
    audio_rows = []
    for path, _mod, content, _meta in mediagen.audio_corpus():
        ind = independent_audio(content)
        try:
            op = audio_features(bytes(content))
        except ValueError:
            op = None
        if (ind is None) != (op is None):
            # the stdlib ``wave`` module accepts some streams our PCM
            # contract rejects (and vice versa) — both sides must agree
            # on every corpus row or the honesty boundary drifted
            raise SystemExit(f"decodability mismatch for {path}: {ind} vs {op}")
        if ind is not None:
            for c in feat_cols:
                if ind[c] != op[c]:
                    raise SystemExit(
                        f"audio mismatch for {path}.{c}: {ind[c]} vs {op[c]}"
                    )
        audio_rows.append(
            (path, *(None,) * 7)
            if ind is None
            else (path, *(ind[c] for c in feat_cols))
        )

    dest = (
        Path(__file__).resolve().parents[1]
        / "postgresimporter_spark"
        / "plans"
        / "media_expected.py"
    )
    with dest.open("w") as f:
        f.write(
            '"""Frozen expected values for the deterministic media corpus\n'
            "(operators/mediagen) — GENERATED by tests/gen_media_expected.py,\n"
            "which re-derives every value with an independent model and fails\n"
            "on any disagreement with the operators. Regenerate after any\n"
            "intentional change to the corpus recipe or the hash/feature\n"
            'definitions; the DuckDB oracles replay these constants."""\n\n'
        )
        f.write("# (path, phash) — None = undecodable (NULL hash)\n")
        f.write("IMAGE_PHASH = [\n")
        for r in image_rows:
            f.write(f"    {r!r},\n")
        f.write("]\n\n")
        f.write(
            "# (path, duration_ms, sample_rate, rms, zero_crossing_rate,\n"
            "#  spectral_centroid_hz, spectral_rolloff_hz,"
            " spectral_bandwidth_hz)\n"
        )
        f.write("AUDIO_FEATURES = [\n")
        for r in audio_rows:
            f.write(f"    {r!r},\n")
        f.write("]\n")
    print(f"wrote {dest}: {len(image_rows)} image rows, {len(audio_rows)} audio rows")


if __name__ == "__main__":
    main()
