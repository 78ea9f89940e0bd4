"""REAL baseline-JPEG decode (and a minimal conformant encoder),
without media libraries — stdlib + numpy only.

Completes the library-free media-decode tier (PNG: ``png.py``, GIF:
``gif.py``, PCM WAV: ``multimodal.audio_decode``): DCT JPEG is markers
+ Huffman entropy coding + dequantization + IDCT + chroma upsampling +
YCbCr->RGB, all implementable directly from the public ITU-T T.81
spec. Supported: 8-bit BASELINE (SOF0 — grayscale or 3-component
YCbCr, any sampling factors dividing the max, restart intervals) AND
8-bit PROGRESSIVE (SOF2, Annex G — multi-scan coefficient
accumulation with spectral selection, successive approximation for DC
and AC including the interleaved correction-bit model of figure G.7,
and EOB runs). NOT supported (raises ValueError; callers surface the
honesty boundary — header dims with ``pixels_decoded: False``, never
fabricated pixels): extended sequential (SOF1), arithmetic coding,
12-bit, hierarchical.

TWO encoders exist so tests can build fixtures and pin roundtrips
without any external codec: ``encode_jpeg`` (baseline) and
``encode_jpeg_progressive`` (SOF2, DC-first/DC-refine/AC-first/
AC-refine scan script). Both quantize identically, so progressive
decode of the progressive stream must be BYTE-IDENTICAL to baseline
decode of the baseline stream — the cross-codec identity the tests
enforce on random images. The declared Huffman tables are uniform
length (12 DC categories at length 4; all 176 AC symbols — including
the 16 EOBn/ZRL run codes — at length 8): valid canonical prefix
codes, auditable as literals; any conformant decoder reads whatever
tables the file declares.

Scale posture: decoding is per-row work inside the Arrow-batched
``mapInPandas`` media mappers (``multimodal.py``) — no shuffle, memory
bounded by batch size; numpy does the 8x8 IDCT as one einsum over all
blocks of a component, so the Python-level loop is per-block only for
entropy decode (inherently sequential by spec).
"""

from __future__ import annotations

import numpy as np

from .mediacaps import check_pixels

JPEG_MAGIC = b"\xff\xd8\xff"

# Zigzag order is built programmatically (hand-typing 64 indices is
# exactly the kind of table a typo corrupts silently):
# _ZZ[k] = row-major position in the 8x8 block of the k-th transmitted
# coefficient.
def _zigzag_order() -> np.ndarray:
    order = []
    r = c = 0
    for _ in range(64):
        order.append(r * 8 + c)
        if (r + c) % 2 == 0:  # moving up-right
            if c == 7:
                r += 1
            elif r == 0:
                c += 1
            else:
                r -= 1
                c += 1
        else:  # moving down-left
            if r == 7:
                c += 1
            elif c == 0:
                r += 1
            else:
                r += 1
                c -= 1
    return np.array(order)


_ZZ = _zigzag_order()

# 8x8 DCT-II basis: B[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_B = np.zeros((8, 8))
for _u in range(8):
    _cu = (1 / np.sqrt(2)) if _u == 0 else 1.0
    for _x in range(8):
        _B[_u, _x] = 0.5 * _cu * np.cos((2 * _x + 1) * _u * np.pi / 16)


class _BitReader:
    """MSB-first entropy-segment reader with 0xFF00 de-stuffing; stops
    (raises StopIteration) at any real marker."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.i = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.i >= len(self.d):
            raise ValueError("jpeg: truncated entropy data")
        byte = self.d[self.i]
        if byte == 0xFF:
            nxt = self.d[self.i + 1] if self.i + 1 < len(self.d) else None
            if nxt == 0x00:
                self.i += 2  # stuffed 0xFF
            else:
                raise StopIteration  # real marker
        else:
            self.i += 1
        self.acc = (self.acc << 8) | byte
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self.n = 0


def _canonical_codes(counts: list[int], symbols: bytes):
    """(length -> {code: symbol}) decode tables from a DHT payload."""
    tables: dict[int, dict[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        tables[length] = {}
        for _ in range(counts[length - 1]):
            tables[length][code] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return tables


def _huff_decode(br: _BitReader, table: dict[int, dict[int, int]]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        if code in table[length]:
            return table[length][code]
    raise ValueError("jpeg: invalid Huffman code")


def _extend(v: int, s: int) -> int:
    return v - ((1 << s) - 1) if s and v < (1 << (s - 1)) else v


def decode_jpeg(content: bytes) -> np.ndarray:
    """Baseline-JPEG bytes -> uint8 array (h, w) grayscale or
    (h, w, 3) RGB. Raises ValueError on non-baseline variants AND on
    malformed/truncated streams: low-level Index/KeyErrors from a
    corrupt byte layout are normalized here so the multimodal dispatch
    boundary (catch ValueError -> deterministic stub) holds for
    arbitrary bytes, not just well-formed-but-unsupported ones."""
    try:
        return _decode_jpeg_raw(content)
    except (IndexError, KeyError, OverflowError, StopIteration) as e:
        raise ValueError(f"jpeg: malformed stream ({e!r})") from e


def _decode_jpeg_raw(content: bytes) -> np.ndarray:
    b = content or b""
    if b[:3] != JPEG_MAGIC[:3] or b[:2] != b"\xff\xd8":
        raise ValueError("jpeg: bad signature")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    W = H = 0
    restart = 0
    progressive = False
    allocated = False
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            raise ValueError("jpeg: marker desync")
        marker = b[i + 1]
        if marker == 0xD9:  # EOI
            break
        seg = int.from_bytes(b[i + 2 : i + 4], "big")
        body = b[i + 4 : i + 2 + seg]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(body):
                prec, tid = body[j] >> 4, body[j] & 0xF
                if prec != 0:
                    raise ValueError("jpeg: 16-bit quant unsupported")
                tab = np.zeros(64)
                tab[_ZZ] = np.frombuffer(
                    body[j + 1 : j + 65], dtype=np.uint8
                )
                qt[tid] = tab.reshape(8, 8)
                j += 65
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(body):
                cls, tid = body[j] >> 4, body[j] & 0xF
                counts = list(body[j + 1 : j + 17])
                n = sum(counts)
                syms = body[j + 17 : j + 17 + n]
                (huff_dc if cls == 0 else huff_ac)[tid] = (
                    _canonical_codes(counts, syms)
                )
                j += 17 + n
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            if body[0] != 8:
                raise ValueError("jpeg: only 8-bit precision")
            H = int.from_bytes(body[1:3], "big")
            W = int.from_bytes(body[3:5], "big")
            # bomb guard (r13): SOF dims drive the int64 coefficient
            # allocation in _alloc_coefs (~8-24 bytes/px) — a forged
            # 65535x65535 header would try ~34 GB per component
            check_pixels(W, H, "jpeg")
            nc = body[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("jpeg: unsupported SOF variant")
        elif marker == 0xDD:  # DRI
            restart = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:  # SOS: entropy data follows
            if not comps or W == 0 or H == 0:
                raise ValueError("jpeg: missing SOF")
            if not allocated:
                _alloc_coefs(comps, W, H)
                allocated = True
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                for comp in comps:
                    if comp["id"] == cid:
                        comp["td"] = tabs >> 4
                        comp["ta"] = tabs & 0xF
                        scan_comps.append(comp)
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            if not progressive:
                ss, se, ah, al = 0, 63, 0, 0
            i = _decode_scan(
                b, i + 2 + seg, comps, scan_comps, huff_dc, huff_ac,
                W, H, restart, ss, se, ah, al, progressive,
            )
            continue
        i += 2 + seg
    if not allocated:
        raise ValueError("jpeg: no SOS marker")
    return _finish(comps, qt, W, H)


def _alloc_coefs(comps, W, H):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcx = -(-W // (8 * hmax))
    mcy = -(-H // (8 * vmax))
    for c in comps:
        if hmax % c["h"] or vmax % c["v"]:
            raise ValueError("jpeg: non-integer sampling ratio")
        # int64 coefficient state: successive-approximation refinement
        # uses two's-complement bit ops (|, arithmetic >>), which numpy
        # int arrays implement exactly like the spec's integer model
        c["coef"] = np.zeros((mcy * c["v"], mcx * c["h"], 64), dtype=np.int64)
        c["pred"] = 0
        # the component's OWN block grid (non-interleaved scans cover
        # exactly this, NOT the MCU-padded grid)
        c["bw"] = -(-(W * c["h"]) // (hmax * 8))
        c["bh"] = -(-(H * c["v"]) // (vmax * 8))
    comps[0]["_grid"] = (mcx, mcy, hmax, vmax)


def _decode_scan(
    b, pos, comps, scan_comps, huff_dc, huff_ac, W, H, restart,
    ss, se, ah, al, progressive,
):
    """Decode ONE scan's entropy data into the persistent coefficient
    state (T.81 Annexes F and G): sequential scans (ss=0, se=63,
    ah=al=0), progressive DC first/refine, and progressive AC
    first/refine with EOB runs. Returns the byte offset of the marker
    following the scan."""
    mcx, mcy, hmax, vmax = comps[0]["_grid"]
    br = _BitReader(b, pos)
    interleaved = len(scan_comps) > 1
    if interleaved:
        units = mcx * mcy
    else:
        c0 = scan_comps[0]
        units = c0["bw"] * c0["bh"]
    state = {"eobrun": 0}
    for c in comps:
        c["pred"] = 0

    def block_at(c, m):
        if interleaved:
            my, mx = divmod(m, mcx)
            return [
                (my * c["v"] + by, mx * c["h"] + bx)
                for by in range(c["v"])
                for bx in range(c["h"])
            ]
        byy, bxx = divmod(m, c["bw"])
        return [(byy, bxx)]

    for m in range(units):
        if restart and m and m % restart == 0:
            br.align()
            if not (
                br.i + 1 < len(b)
                and b[br.i] == 0xFF
                and 0xD0 <= b[br.i + 1] <= 0xD7
            ):
                raise ValueError("jpeg: missing restart marker")
            br.i += 2
            for c in comps:
                c["pred"] = 0
            state["eobrun"] = 0
        for c in scan_comps:
            for (byy, bxx) in block_at(c, m):
                blk = c["coef"][byy, bxx]
                if ss == 0:
                    _decode_dc(br, c, blk, huff_dc, ah, al)
                if se > 0:
                    # T.81 forbids interleaved AC scans in progressive
                    # mode; sequential scans are interleaved but their
                    # params are already forced to (0, 63, 0, 0)
                    if interleaved and progressive:
                        raise ValueError(
                            "jpeg: interleaved progressive AC scan"
                        )
                    _decode_ac(
                        br, c, blk, huff_ac, max(ss, 1), se, ah, al,
                        state,
                    )
    # skip any padding bits; position lands on the next marker
    # (0xFF00 is stuffing, runs of 0xFF are fill bytes)
    br.align()
    i = br.i
    while i + 1 < len(b) and not (
        b[i] == 0xFF and b[i + 1] not in (0x00, 0xFF)
    ):
        i += 1
    return i


def _decode_dc(br, c, blk, huff_dc, ah, al):
    if ah == 0:
        s = _huff_decode(br, huff_dc[c["td"]])
        diff = _extend(br.bits(s), s) if s else 0
        c["pred"] += diff
        blk[0] = c["pred"] << al
    else:  # refinement: one bit, two's-complement OR (spec G.1.2.1)
        if br.bit():
            blk[0] |= 1 << al


def _decode_ac(br, c, blk, huff_ac, ss, se, ah, al, state):
    if ah == 0:
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        k = ss
        while k <= se:
            rs = _huff_decode(br, huff_ac[c["ta"]])
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:
                    k += 16  # ZRL
                    continue
                eobrun = 1 << r
                if r:
                    eobrun += br.bits(r)
                state["eobrun"] = eobrun - 1  # this block counts
                return
            k += r
            if k > se:
                raise ValueError("jpeg: AC index overflow")
            blk[k] = _extend(br.bits(s), s) << al
            k += 1
        return
    # AC refinement (G.1.2.3): newly-significant coefs interleaved
    # with correction bits for already-nonzero ones
    p1, m1 = 1 << al, -1 << al

    def refine(k_from, k_to, skip_budget=None):
        k = k_from
        budget = skip_budget
        while k <= k_to:
            if blk[k] != 0:
                if br.bit():
                    if (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
            else:
                if budget is not None:
                    if budget == 0:
                        return k
                    budget -= 1
            k += 1
        return k

    if state["eobrun"] > 0:
        refine(ss, se)  # covered block: corrections only
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = _huff_decode(br, huff_ac[c["ta"]])
        r, s = rs >> 4, rs & 0xF
        if s == 0 and r < 15:
            eobrun = 1 << r
            if r:
                eobrun += br.bits(r)
            refine(k, se)  # rest of this block's band
            state["eobrun"] = eobrun - 1
            return
        if s == 0:  # ZRL: consumes 16 zero-history positions — the
            # walk breaks AT the 16th zero (budget 15) and the
            # unconditional k += 1 consumes it, mirroring F-figure G.7
            val = 0
            skip = 15
        else:
            if s != 1:
                raise ValueError("jpeg: bad refinement magnitude")
            val = p1 if br.bit() else m1
            skip = r
        k = refine(k, se, skip_budget=skip)
        if val != 0:
            if k > se:
                raise ValueError("jpeg: refinement overrun")
            blk[k] = val
        k += 1


def _finish(comps, qt, W, H):
    mcx, mcy, hmax, vmax = comps[0]["_grid"]
    planes = []
    for c in comps:
        by, bx, _ = c["coef"].shape
        # dequantize in zigzag space, then scatter to 8x8 layout
        qvec = qt[c["tq"]].reshape(64)[_ZZ]  # quant value per zigzag pos
        flat = c["coef"] * qvec[None, None, :]
        deq = np.zeros((by, bx, 64))
        deq[:, :, _ZZ] = flat
        deq = deq.reshape(by, bx, 8, 8)
        # IDCT: pixels = B^T @ F @ B for every block
        px = np.einsum("ux,mnuv,vy->mnxy", _B, deq, _B)
        plane = px.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8) + 128.0
        plane = plane.repeat(vmax // c["v"], axis=0).repeat(
            hmax // c["h"], axis=1
        )
        planes.append(plane[:H, :W])

    if len(planes) == 1:
        out = planes[0]
    elif len(planes) == 3:
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        bl = y + 1.772 * (cb - 128.0)
        out = np.stack([r, g, bl], axis=-1)
    else:
        raise ValueError("jpeg: unsupported component count")
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Minimal conformant encoder (fixture builder / roundtrip pin)
# ---------------------------------------------------------------------------

# Uniform-length canonical Huffman tables (see module docstring).
# The AC table carries ALL (r, 0) symbols: r=0 is the sequential EOB,
# r=15 is ZRL, and r=1..14 are the progressive EOBn run-length codes —
# one table serves both the baseline and progressive encoders.
_DC_SYMS = bytes(range(12))               # categories 0..11, length 4
_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_AC_SYMS = bytes(
    [r << 4 for r in range(16)]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_AC_COUNTS = [0] * 7 + [len(_AC_SYMS)] + [0] * 8


def _enc_table(counts, syms):
    code, k, out = 0, 0, {}
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[syms[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_ENC = _enc_table(_DC_COUNTS, _DC_SYMS)
_AC_ENC = _enc_table(_AC_COUNTS, _AC_SYMS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(bw: _BitWriter, blk: np.ndarray, pred: int) -> int:
    zz = blk.reshape(64)[_ZZ].astype(int)
    dc = int(zz[0])
    diff = dc - pred
    s = _category(diff)
    code, ln = _DC_ENC[s]
    bw.put(code, ln)
    if s:
        bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = _AC_ENC[0xF0]
            bw.put(code, ln)
            run -= 16
        s = _category(v)
        code, ln = _AC_ENC[(run << 4) | s]
        bw.put(code, ln)
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = _AC_ENC[0x00]
        bw.put(code, ln)
    return dc


def _block_mean_downsample(p: np.ndarray, fy: int, fx: int) -> np.ndarray:
    h, w = p.shape
    ph, pw = -(-h // fy) * fy, -(-w // fx) * fx
    p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
    return p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))


def encode_jpeg(
    px: np.ndarray,
    quant: int = 4,
    subsample: bool = False,
    restart: int = 0,
) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB -> baseline JPEG bytes
    with a flat quantization table of ``quant``. ``subsample=True``
    encodes color as 4:2:0 (chroma block-mean downsampled 2x2);
    ``restart`` > 0 emits a DRI segment and RSTn markers every that
    many MCUs — together these pin the decoder's chroma-upsampling and
    restart paths, not just the 4:4:4 happy path."""
    px = np.asarray(px, dtype=np.float64)
    if px.shape[0] < 1 or px.shape[1] < 1:
        raise ValueError("jpeg: empty image")
    if px.shape[0] > 65535 or px.shape[1] > 65535:
        # SOF dimensions are 16-bit; fail as ValueError so the resize
        # dispatch boundary (catch ValueError -> stub) holds
        raise ValueError("jpeg: dimensions exceed 65535")
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes = [px]
        samp = [(1, 1)]
    else:
        r, g, b = px[..., 0], px[..., 1], px[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
        samp = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcx = -(-w // (8 * hmax))
    mcy = -(-h // (8 * vmax))
    comp_planes = []
    for p, (sh, sv) in zip(planes, samp):
        q = _block_mean_downsample(p, vmax // sv, hmax // sh)
        th, tw = mcy * sv * 8, mcx * sh * 8
        q = np.pad(
            q,
            ((0, th - q.shape[0]), (0, tw - q.shape[1])),
            mode="edge",
        )
        comp_planes.append(q)
    qtab = np.full((8, 8), quant, dtype=np.float64)

    def segments():
        yield b"\xff\xd8"  # SOI
        zzq = qtab.reshape(64)[_ZZ].astype(np.uint8)
        yield b"\xff\xdb" + (2 + 1 + 64).to_bytes(2, "big") + b"\x00" + bytes(zzq)
        nc = len(planes)
        sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
        for c, (sh, sv) in enumerate(samp):
            sof += bytes([c + 1, (sh << 4) | sv, 0])
        yield b"\xff\xc0" + (2 + len(sof)).to_bytes(2, "big") + sof
        dht = bytes([0x00]) + bytes(_DC_COUNTS[:16]) + _DC_SYMS
        dht += bytes([0x10]) + bytes(_AC_COUNTS[:16]) + _AC_SYMS
        yield b"\xff\xc4" + (2 + len(dht)).to_bytes(2, "big") + dht
        if restart:
            yield b"\xff\xdd" + (4).to_bytes(2, "big") + restart.to_bytes(2, "big")
        sos = bytes([nc])
        for c in range(nc):
            sos += bytes([c + 1, 0x00])
        sos += bytes([0, 63, 0])
        yield b"\xff\xda" + (2 + len(sos)).to_bytes(2, "big") + sos

    head = b"".join(segments())
    out = bytearray(head)
    bw = _BitWriter()
    preds = [0] * len(planes)
    rst = 0
    for m in range(mcx * mcy):
        if restart and m and m % restart == 0:
            bw.flush()
            out += bw.out
            out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            bw = _BitWriter()
            preds = [0] * len(planes)
        my, mx = divmod(m, mcx)
        for ci, (plane, (sh, sv)) in enumerate(zip(comp_planes, samp)):
            for by in range(sv):
                for bx in range(sh):
                    r0 = (my * sv + by) * 8
                    c0 = (mx * sh + bx) * 8
                    blk = plane[r0 : r0 + 8, c0 : c0 + 8] - 128.0
                    coef = _B @ blk @ _B.T
                    q = np.round(coef / qtab)
                    preds[ci] = _encode_block(bw, q, preds[ci])
    bw.flush()
    out += bw.out
    return bytes(out) + b"\xff\xd9"


def jpeg_decode_meta(content: bytes) -> dict:
    """Decoder-contract wrapper: real pixel stats for baseline JPEGs
    (same shape as ``png.png_decode_meta``)."""
    px = decode_jpeg(content)
    if px.ndim == 2:
        h, w = px.shape
        ch = 1
    else:
        h, w, ch = px.shape
    return {
        "width": w,
        "height": h,
        "duration_ms": 0,
        "channels": ch,
        "mean_luma": float(np.round(px.mean(), 4)),
    }


__all__ = [
    "decode_jpeg",
    "encode_jpeg",
    "jpeg_decode_meta",
    "JPEG_MAGIC",
]


def jpeg_resize(content: bytes, width: int, height: int) -> bytes:
    """Resizer-contract wrapper: real decode -> nearest resample ->
    re-encode (4:4:4, quant 4). Shares ``png.resize_nearest``; works
    for grayscale and RGB alike (shape-agnostic indexing)."""
    from .png import resize_nearest

    return encode_jpeg(resize_nearest(decode_jpeg(content), width, height))


__all__.append("jpeg_resize")


# ---------------------------------------------------------------------------
# Progressive encoder (fixture builder for the progressive decode path)
# ---------------------------------------------------------------------------


def _quantized_blocks(plane: np.ndarray, qtab: np.ndarray):
    """Per-block zigzag-ordered quantized coefficients (int) for a
    component plane already padded to 8-multiples."""
    ph, pw = plane.shape
    out = np.zeros((ph // 8, pw // 8, 64), dtype=np.int64)
    for by in range(ph // 8):
        for bx in range(pw // 8):
            blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = _B @ blk @ _B.T
            out[by, bx] = np.round(coef / qtab).astype(np.int64).reshape(64)[
                _ZZ
            ]
    return out


class _ProgWriter(_BitWriter):
    """BitWriter plus the progressive EOB-run bookkeeping: correction
    bits buffered while a run accumulates, flushed right after the
    EOBn symbol so the decoder reads them in block order."""

    def __init__(self):
        super().__init__()
        self.eobrun = 0
        self.be: list[int] = []

    def corrections(self, bits):
        for x in bits:
            self.put(x, 1)

    def flush_eobrun(self):
        if self.eobrun == 0 and not self.be:
            return
        if self.eobrun:
            r = self.eobrun.bit_length() - 1
            code, ln = _AC_ENC[r << 4]
            self.put(code, ln)
            if r:
                self.put(self.eobrun - (1 << r), r)
        self.corrections(self.be)
        self.be = []
        self.eobrun = 0


def _encode_ac_first_block(bw: _ProgWriter, zz, al: int):
    # AC point transform shifts the MAGNITUDE (truncation toward zero,
    # T.81 G.1.2.2) — arithmetic shift would turn -1 into -1, not 0,
    # and desync the refinement scan's significance model
    temp = [
        (abs(int(v)) >> al) * (1 if v >= 0 else -1) for v in zz[1:64]
    ]
    last = -1
    for idx, v in enumerate(temp):
        if v != 0:
            last = idx
    if last < 0:
        bw.eobrun += 1
        if bw.eobrun == 0x7FFF:
            bw.flush_eobrun()
        return
    bw.flush_eobrun()
    r = 0
    for idx in range(last + 1):
        v = temp[idx]
        if v == 0:
            r += 1
            continue
        while r > 15:
            code, ln = _AC_ENC[0xF0]
            bw.put(code, ln)
            r -= 16
        s = _category(v)
        code, ln = _AC_ENC[(r << 4) | s]
        bw.put(code, ln)
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        r = 0
    if last < 62:
        bw.eobrun += 1
        if bw.eobrun == 0x7FFF:
            bw.flush_eobrun()


def _encode_ac_refine_block(bw: _ProgWriter, zz, al: int):
    # previous scans sent v >> (al+1); this scan sends the al-th bit
    p_hist = al + 1
    cor: list[int] = []
    r = 0
    emitted = False

    def flush_zrls():
        nonlocal r, cor
        while r > 15:
            bw.flush_eobrun()
            code, ln = _AC_ENC[0xF0]
            bw.put(code, ln)
            bw.corrections(cor)
            cor = []
            r -= 16

    for k in range(1, 64):
        t = int(zz[k])
        hist = t >> p_hist if t >= 0 else -((-t) >> p_hist)
        if hist != 0:
            # ZRLs that precede this position must flush BEFORE its
            # correction bit joins the buffer, or the bit would be
            # emitted ahead of the walk that reads it (G.7 ordering)
            flush_zrls()
            cor.append((abs(t) >> al) & 1)
        elif t != 0:
            # newly significant: |t| >> al must be exactly 1
            bw.flush_eobrun()
            flush_zrls()
            code, ln = _AC_ENC[(r << 4) | 1]
            bw.put(code, ln)
            bw.put(1 if t > 0 else 0, 1)
            bw.corrections(cor)
            cor = []
            r = 0
            emitted = True
        else:
            r += 1
    if r > 0 or cor:
        bw.eobrun += 1
        bw.be.extend(cor)
        if bw.eobrun == 0x7FFF:
            bw.flush_eobrun()
    elif not emitted:
        # fully-zero band with no corrections: still an EOB block
        bw.eobrun += 1


def encode_jpeg_progressive(px: np.ndarray, quant: int = 4) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB -> PROGRESSIVE JPEG
    (SOF2), 4:4:4, flat quantization ``quant``. Scan script: DC first
    (Al=1) -> DC refinement -> per-component AC first (Al=1) ->
    per-component AC refinement — exercising spectral selection,
    successive approximation, and EOB runs. Quantized coefficients are
    identical to ``encode_jpeg``'s, so progressive decode of this
    stream must be byte-identical to baseline decode of that one."""
    px = np.asarray(px, dtype=np.float64)
    if px.shape[0] < 1 or px.shape[1] < 1:
        raise ValueError("jpeg: empty image")
    if px.shape[0] > 65535 or px.shape[1] > 65535:
        raise ValueError("jpeg: dimensions exceed 65535")
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes = [px]
    else:
        r, g, b = px[..., 0], px[..., 1], px[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    qtab = np.full((8, 8), quant, dtype=np.float64)
    blocks = [
        _quantized_blocks(
            np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge"), qtab
        )
        for p in planes
    ]
    nby, nbx = ph // 8, pw // 8
    nc = len(planes)

    out = bytearray(b"\xff\xd8")
    zzq = qtab.reshape(64)[_ZZ].astype(np.uint8)
    out += b"\xff\xdb" + (2 + 1 + 64).to_bytes(2, "big") + b"\x00" + bytes(zzq)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for c in range(nc):
        sof += bytes([c + 1, 0x11, 0])
    out += b"\xff\xc2" + (2 + len(sof)).to_bytes(2, "big") + sof
    dht = bytes([0x00]) + bytes(_DC_COUNTS[:16]) + _DC_SYMS
    dht += bytes([0x10]) + bytes(_AC_COUNTS[:16]) + _AC_SYMS
    out += b"\xff\xc4" + (2 + len(dht)).to_bytes(2, "big") + dht

    def sos(comp_ids, ss, se, ah, al):
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + (2 + len(body)).to_bytes(2, "big") + body

    # scan 1: DC first, interleaved, Al=1
    out += sos(list(range(1, nc + 1)), 0, 0, 0, 1)
    bw = _BitWriter()
    preds = [0] * nc
    for by in range(nby):
        for bx in range(nbx):
            for ci in range(nc):
                v = int(blocks[ci][by, bx, 0]) >> 1
                diff = v - preds[ci]
                preds[ci] = v
                s = _category(diff)
                code, ln = _DC_ENC[s]
                bw.put(code, ln)
                if s:
                    bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    bw.flush()
    out += bw.out

    # scan 2: DC refinement, Al=0
    out += sos(list(range(1, nc + 1)), 0, 0, 1, 0)
    bw = _BitWriter()
    for by in range(nby):
        for bx in range(nbx):
            for ci in range(nc):
                bw.put(int(blocks[ci][by, bx, 0]) & 1, 1)
    bw.flush()
    out += bw.out

    # per-component AC scans: first (Al=1) then refinement (Al=0)
    for ci in range(nc):
        out += sos([ci + 1], 1, 63, 0, 1)
        pw_ = _ProgWriter()
        for by in range(nby):
            for bx in range(nbx):
                _encode_ac_first_block(pw_, blocks[ci][by, bx], 1)
        pw_.flush_eobrun()
        pw_.flush()
        out += pw_.out
    for ci in range(nc):
        out += sos([ci + 1], 1, 63, 1, 0)
        pw_ = _ProgWriter()
        for by in range(nby):
            for bx in range(nbx):
                _encode_ac_refine_block(pw_, blocks[ci][by, bx], 0)
        pw_.flush_eobrun()
        pw_.flush()
        out += pw_.out

    return bytes(out) + b"\xff\xd9"


__all__.append("encode_jpeg_progressive")
