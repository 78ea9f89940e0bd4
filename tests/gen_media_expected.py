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
    # same sub-1e-8 noise kill as the operator (uniform-input guard)
    ac = np.round(coeffs[:8, :8], 8).flatten()[1:]
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


def independent_landmarks(content: bytes) -> list[tuple[int, int]]:
    """Landmark hashes per the ``operators/audiofp`` spec, derived
    independently: stdlib ``wave`` decode and an explicit DFT matrix
    multiply instead of the operator's RIFF walker + ``np.fft.rfft``."""
    try:
        wf = wave.open(io.BytesIO(bytes(content)), "rb")
    except Exception:
        return []
    try:
        channels, width = wf.getnchannels(), wf.getsampwidth()
        if width not in (1, 2):
            return []
        raw = wf.readframes(wf.getnframes())
    finally:
        wf.close()
    if width == 2:
        s = np.frombuffer(raw, dtype="<i2").astype(np.float64)
    else:
        s = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
    mono = s.reshape(-1, channels).mean(axis=1) if channels > 1 else s
    fr = 256
    n_frames = min(len(mono) // fr, 256)
    if n_frames < 2:
        return []
    k = np.arange(fr // 2 + 1)[:, None]
    nn = np.arange(fr)[None, :]
    cosm = np.cos(2 * np.pi * k * nn / fr)
    sinm = -np.sin(2 * np.pi * k * nn / fr)
    frames = mono[: n_frames * fr].reshape(n_frames, fr)
    mag = np.sqrt((frames @ cosm.T) ** 2 + (frames @ sinm.T) ** 2)
    bands = ((1, 8), (9, 24), (25, 56), (57, 128))
    peaks = np.empty((n_frames, 4), dtype=np.int64)
    for b, (lo, hi) in enumerate(bands):
        peaks[:, b] = lo + np.argmax(mag[:, lo : hi + 1], axis=1)
    out = []
    for dt in (1, 2):
        for t in range(n_frames - dt):
            for b in range(4):
                h = (
                    (b * 256 + int(peaks[t, b])) * 256 + int(peaks[t + dt, b])
                ) * 4 + dt
                out.append((t, h))
    return out


# ---------------------------------------------------------------------------
# construction-truth tables (multimodal tier): every value below is
# hand-stated from the corpus RECIPE (dims/rates/timing the generator
# itself chose), then verified against the live operators on a local
# Spark session — so the frozen constants are simultaneously an
# independent statement of intent and guaranteed in sync.

_IMG_N_BASE = 16


def expected_media_meta() -> list[tuple]:
    rows = []
    for path, _m, content, _ in mediagen.image_corpus():
        nb = len(content)
        if path.endswith("_sm.png"):
            rows.append((path, "image", nb, "png", 32, 32, None, None, None))
        elif path.endswith("_re.jpg"):
            rows.append((path, "image", nb, "jpeg", 64, 64, None, None, None))
        elif path.endswith(".png"):
            rows.append((path, "image", nb, "png", 64, 64, None, None, None))
        else:  # corrupt_a.bin; corrupt_b.gif is 7 bytes, under the
            # 10-byte GIF header floor -> unrecognized -> all nulls
            rows.append(
                (path, "image", nb, None, None, None, None, None, None)
            )
    wav = {
        "tone_220.wav": (8000, 1, 1000),
        "tone_440.wav": (8000, 1, 1000),
        "tone_880.wav": (8000, 1, 1000),
        "tone_1760.wav": (8000, 1, 1000),
        "tone_3000.wav": (8000, 1, 1000),
        "tone_440_r16k.wav": (16000, 1, 1000),
        "chord.wav": (8000, 1, 1000),
        "noise.wav": (8000, 1, 1000),
        "stereo.wav": (8000, 2, 1000),
        "eight_bit.wav": (8000, 1, 500),
        "empty.wav": (8000, 1, 0),
        "float.wav": (8000, 1, 0),
    }
    for path, _m, content, _ in mediagen.audio_corpus():
        nb = len(content)
        if path in wav:
            sr, ch, dur = wav[path]
            rows.append((path, "audio", nb, "wav", None, None, sr, ch, dur))
        else:  # corrupt.mp3: ID3 magic, no parsable frame header
            rows.append(
                (path, "audio", nb, "mp3", None, None, None, None, None)
            )
    vid = {
        "vid_flat.avi": ("avi", 16, 8, 2000),
        "vid_tex.avi": ("avi", 32, 32, 750),
        # a raw JPEG stream is recognized by its first SOF header
        "raw_stream.mjpeg": ("jpeg", 32, 32, None),
        "corrupt.avi": ("avi", None, None, None),
    }
    for path, _m, content, _ in mediagen.video_corpus():
        codec, w, h, dur = vid[path]
        rows.append(
            (path, "video", len(content), codec, w, h, None, None, dur)
        )
    for path, _m, content, _ in mediagen.container_corpus():
        nb = len(content)
        if path == "clip.mp4":
            rows.append(
                (path, "video", nb, "mp4", 320, 240, None, None, 1500)
            )
        else:  # song.mp3: 128 kbps CBR at 44100 Hz, 1000 ms
            rows.append(
                (path, "audio", nb, "mp3", None, None, 44100, None, 1000)
            )
    return rows


FRAME_EVERY_MS = mediagen.FRAME_EVERY_MS
frame_sample_corpus = mediagen.frame_sample_corpus


def expected_frame_samples() -> list[tuple]:
    t, f = True, False
    return (
        # vid_flat: 4 frames x 500 ms; samples land in frame spans
        [("vid_flat.avi", ms, t, 16, 8) for ms in (0, 400, 800, 1200, 1600)]
        # vid_tex: 3 frames x 250 ms -> 750 ms timeline
        + [("vid_tex.avi", 0, t, 32, 32), ("vid_tex.avi", 400, t, 32, 32)]
        # unknown timing / undecodable / stills: one frameless row
        + [
            ("raw_stream.mjpeg", 0, f, None, None),
            ("corrupt.avi", 0, f, None, None),
            ("img000.png", 0, f, None, None),
            ("corrupt_a.bin", 0, f, None, None),
        ]
        # durations without decodable frames: offset rows, null frames
        + [("tone_440.wav", ms, f, None, None) for ms in (0, 400, 800)]
        + [("clip.mp4", ms, f, None, None) for ms in (0, 400, 800, 1200)]
    )


resize_corpus = mediagen.resize_corpus
RESIZE_W, RESIZE_H = mediagen.RESIZE_W, mediagen.RESIZE_H


def expected_resize_meta() -> list[tuple]:
    rows = []
    for path, modality, _c, _ in resize_corpus():
        if modality == "image":
            codec = "jpeg" if path.endswith("_re.jpg") else "png"
            rows.append((path, modality, codec, 16, 16, None))
        elif path == "vid_flat.avi":
            rows.append((path, modality, "avi", 16, 16, 2000))
        elif path == "vid_tex.avi":
            rows.append((path, modality, "avi", 16, 16, 750))
        else:  # raw_stream.mjpeg -> concatenated resized JPEGs
            rows.append((path, modality, "jpeg", 16, 16, None))
    return rows


def _verify_multimodal(spark) -> tuple[list, list, list]:
    from pyspark.sql import functions as F

    from postgresimporter_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_media_metadata,
        parse_media_header,
        resize_media,
        sample_frames,
    )

    all_media = (
        mediagen.image_corpus()
        + mediagen.audio_corpus()
        + mediagen.video_corpus()
        + mediagen.container_corpus()
    )
    meta_cols = [
        "n_bytes",
        "codec",
        "width",
        "height",
        "sample_rate",
        "channels",
        "duration_ms",
    ]
    got_meta = {
        r.path: (r.path, r.modality, *[getattr(r, c) for c in meta_cols])
        for r in extract_media_metadata(
            spark.createDataFrame(all_media, MEDIA_SCHEMA)
        ).collect()
    }
    want_meta = expected_media_meta()
    for row in want_meta:
        if got_meta.get(row[0]) != row:
            raise SystemExit(
                f"media meta mismatch for {row[0]}: "
                f"stated={row} operator={got_meta.get(row[0])}"
            )

    frames = sample_frames(
        spark.createDataFrame(frame_sample_corpus(), MEDIA_SCHEMA),
        every_ms=FRAME_EVERY_MS,
    ).collect()
    got_frames = set()
    for r in frames:
        if r.frame is None:
            got_frames.add((r.path, r.frame_ms, False, None, None))
        else:
            m = parse_media_header(bytes(r.frame)) or {}
            got_frames.add(
                (r.path, r.frame_ms, True, m.get("width"), m.get("height"))
            )
    want_frames = set(expected_frame_samples())
    if got_frames != want_frames or len(frames) != len(want_frames):
        raise SystemExit(
            f"frame samples mismatch ({len(frames)} rows vs "
            f"{len(want_frames)} stated):\n only stated: "
            f"{sorted(want_frames - got_frames, key=str)}\n only operator: "
            f"{sorted(got_frames - want_frames, key=str)}"
        )

    # video frame pHashes (q300): frames come from the live sampler,
    # hashes from the INDEPENDENT FFT-DCT model, cross-checked against
    # the operator chain (video_frame_phashes)
    from postgresimporter_spark.operators.imagehash import (
        video_frame_phashes,
    )

    nd_media = spark.createDataFrame(
        mediagen.video_neardup_corpus(), MEDIA_SCHEMA
    )
    nd_frames = sample_frames(nd_media, every_ms=mediagen.FRAME_EVERY_MS)
    want_vfp = set()
    for r in nd_frames.collect():
        if r.frame is None:
            continue
        h = independent_phash(bytes(r.frame))
        if h is not None:
            want_vfp.add((r.path, r.frame_ms, h))
    got_vfp = {
        (r.path, r.frame_ms, r.phash)
        for r in video_frame_phashes(
            nd_media, every_ms=mediagen.FRAME_EVERY_MS
        ).collect()
    }
    if got_vfp != want_vfp:
        raise SystemExit(
            f"video frame phash mismatch:\n only independent: "
            f"{sorted(want_vfp - got_vfp, key=str)}\n only operator: "
            f"{sorted(got_vfp - want_vfp, key=str)}"
        )

    resized = resize_media(
        spark.createDataFrame(resize_corpus(), MEDIA_SCHEMA),
        RESIZE_W,
        RESIZE_H,
    ).collect()
    got_rs = set()
    for r in resized:
        m = parse_media_header(bytes(r.content)) or {}
        got_rs.add(
            (
                r.path,
                r.modality,
                m.get("codec"),
                m.get("width"),
                m.get("height"),
                m.get("duration_ms"),
            )
        )
    want_rs = set(expected_resize_meta())
    if got_rs != want_rs:
        raise SystemExit(
            f"resize meta mismatch:\n only stated: "
            f"{sorted(want_rs - got_rs, key=str)}\n only operator: "
            f"{sorted(got_rs - want_rs, key=str)}"
        )
    return (
        want_meta,
        sorted(want_frames, key=str),
        sorted(expected_resize_meta(), key=str),
        sorted(want_vfp, key=str),
    )


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

    cross_rows = []
    for path, _mod, content, _meta in mediagen.cross_modal_images():
        ind = independent_phash(content)
        try:
            op = phash(bytes(content))
        except ValueError:
            op = None
        if ind != op:
            raise SystemExit(
                f"cross-modal pHash mismatch for {path}: {ind} vs {op}"
            )
        cross_rows.append((path, ind))

    from postgresimporter_spark.operators.audiofp import landmarks_from_pcm
    from postgresimporter_spark.operators.audiofeat import decode_pcm

    lm_rows = []
    for path, _mod, content, _meta in mediagen.audio_fp_corpus():
        ind = sorted(independent_landmarks(content))
        try:
            mono, rate = decode_pcm(bytes(content))
            op = sorted(landmarks_from_pcm(mono, rate))
        except ValueError:
            op = []
        if ind != op:
            raise SystemExit(
                f"landmark mismatch for {path}: "
                f"independent={len(ind)} operator={len(op)} rows"
            )
        lm_rows.extend((path, t, h) for t, h in ind)

    from postgresimporter_spark.session import get_spark

    spark = get_spark(shuffle_partitions=8)
    meta_rows, frame_rows, resize_rows, vfp_rows = _verify_multimodal(spark)

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
        f.write("]\n\n")
        f.write(
            "# (path, modality, n_bytes, codec, width, height,\n"
            "#  sample_rate, channels, duration_ms) — stated from the\n"
            "# corpus recipe, verified against extract_media_metadata\n"
        )
        f.write("MEDIA_META = [\n")
        for r in meta_rows:
            f.write(f"    {r!r},\n")
        f.write("]\n\n")
        f.write(
            "# (path, frame_ms, has_frame, frame_w, frame_h) at\n"
            f"# every_ms={FRAME_EVERY_MS} over frame_sample_corpus()\n"
        )
        f.write("FRAME_SAMPLES = [\n")
        for r in frame_rows:
            f.write(f"    {r!r},\n")
        f.write("]\n\n")
        f.write(
            "# (path, modality, codec, width, height, duration_ms) of\n"
            f"# resize_media(resize_corpus(), {RESIZE_W}, {RESIZE_H}) output\n"
        )
        f.write("RESIZE_META = [\n")
        for r in resize_rows:
            f.write(f"    {r!r},\n")
        f.write("]\n\n")
        f.write(
            "# (path, frame_ms, phash) of video_neardup_corpus() sampled\n"
            f"# frames at every_ms={FRAME_EVERY_MS} — independent FFT-DCT\n"
            "# hashes of the live sampler's frames\n"
        )
        f.write("VIDEO_FRAME_PHASH = [\n")
        for r in vfp_rows:
            f.write(f"    {r!r},\n")
        f.write("]\n\n")
        f.write(
            "# (path, anchor_frame, landmark_hash) of audio_fp_corpus()\n"
            "# per the operators/audiofp spec — independent wave-decode\n"
            "# + DFT-matrix landmarks, verified against the operator\n"
        )
        f.write("AUDIO_LANDMARKS = [\n")
        for r in lm_rows:
            f.write(f"    {r!r},\n")
        f.write("]\n\n")
        f.write(
            "# (path, phash) of cross_modal_images() — None = undecodable;\n"
            "# joins against VIDEO_FRAME_PHASH in the q312 oracle\n"
        )
        f.write("CROSS_MODAL_PHASH = [\n")
        for r in cross_rows:
            f.write(f"    {r!r},\n")
        f.write("]\n")
    print(
        f"wrote {dest}: {len(image_rows)} image, {len(audio_rows)} audio, "
        f"{len(meta_rows)} meta, {len(frame_rows)} frame, "
        f"{len(resize_rows)} resize rows"
    )


if __name__ == "__main__":
    main()
