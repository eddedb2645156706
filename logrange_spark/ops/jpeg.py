"""JPEG codec in pure Python + numpy (no image libraries).

Implements the ITU-T T.81 baseline sequential (SOF0) AND progressive
(SOF2) DCT processes — the two real-world JPEG entropy layouts — with
the same contract as the BMP codec in multimodal.py: ``decode_jpeg``
is TOTAL (returns an HxWx3 uint8 RGB array or None, never raises on
hostile bytes), and ``encode_jpeg`` / ``encode_jpeg_progressive``
synthesize valid streams so tests can verify decode→resize end-to-end
against a numpy reference without fixture files.

Decoder scope (honest): 8-bit, 1- or 3-component, arbitrary sampling
factors (4:4:4 / 4:2:2 / 4:2:0 …), restart markers; progressive
spectral selection + successive approximation (DC/AC first and
refinement scans, EOB-run coding per T.81 G.1.2 — the refinement
correction-bit logic follows the spec's figure G.7 as realized in the
public libjpeg reference). Arithmetic coding, hierarchical (SOF3+),
and 12-bit inputs return None. Huffman and quantization tables are
read from the stream, so any conformant file decodes — the encoders'
own tables are a simple valid canonical set chosen for implementation
clarity over compression.

Performance note: this is a driver-free, per-row Python codec executed
inside Arrow-batched ``mapInPandas`` (ops/multimodal.py) — the Spark
plumbing is the scale story; swap in a native decoder (PIL/turbojpeg)
where the cluster image ships one.
"""

from __future__ import annotations

import math
import struct

# zigzag scan: ZZ[k] = raster index of the k-th zigzag coefficient
ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]


def _dct_mat():
    import numpy as np

    d = np.zeros((8, 8))
    for k in range(8):
        s = math.sqrt(1 / 8) if k == 0 else math.sqrt(2 / 8)
        for i in range(8):
            d[k, i] = s * math.cos((2 * i + 1) * k * math.pi / 16)
    return d


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (length, code) from the DHT BITS/HUFFVAL form."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (ln, code)
            code += 1
            k += 1
        code <<= 1
    return out


# encoder tables: every category/run-size symbol at one code length —
# valid canonical Huffman (Kraft-strict, all-ones code unused), trivially
# correct; the decoder reads whatever tables the stream declares.
_ENC_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = list(range(12))
_ENC_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, len(_ENC_AC_VALS), 0, 0, 0, 0, 0, 0, 0]
# progressive AC alphabet additionally needs the EOBn symbols (r<<4)|0
# for r=1..14 — emit the full 16x11 grid at one 8-bit code length
# (176 codes, Kraft 176/256 < 1, all-ones code unused).
_ENC_ACP_VALS = [(r << 4) | s for r in range(16) for s in range(11)]
_ENC_ACP_BITS = [0, 0, 0, 0, 0, 0, 0, len(_ENC_ACP_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def align(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1-bits

    def marker(self, m: int) -> None:
        """Emit a marker (RSTn) raw — markers are never byte-stuffed."""
        self.align()
        self.buf += struct.pack(">H", m)

    def flush(self) -> bytes:
        self.align()
        return bytes(self.buf)


def _category(v: int) -> int:
    return 0 if v == 0 else int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amplitude(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _ycbcr_planes(a, subsample: bool):
    """RGB float array → [(plane, h_samp, v_samp)] per component
    (T.871 full-range; 4:2:0 via 2x2-mean chroma when ``subsample``).
    Shared by the baseline and progressive encoders."""
    import numpy as np

    h, w, _ = a.shape
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    if subsample:
        ph, pw = (h + 1) & ~1, (w + 1) & ~1
        yi = np.minimum(np.arange(ph), h - 1)[:, None]
        xi = np.minimum(np.arange(pw), w - 1)[None, :]

        def down2(p):  # 2x2 mean over the edge-padded plane
            return p[yi, xi].reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))

        return [(y, 2, 2), (down2(cb), 1, 1), (down2(cr), 1, 1)]
    return [(y, 1, 1), (cb, 1, 1), (cr, 1, 1)]


def encode_jpeg(arr, quant: int = 1, subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """uint8 HxWx3 RGB → baseline JPEG with a flat quantizer ``quant``.

    ``quant=1`` is near-lossless (the only loss is FDCT/IDCT rounding),
    which is what the roundtrip tests rely on; larger values quantize.
    ``subsample=True`` emits 4:2:0 (2x2 luma sampling, 2x2-mean chroma),
    ``restart_interval=N`` emits DRI + RSTn markers every N MCUs — both
    exist so the DECODER's real-world paths (subsampled MCU layout,
    restart resync) are exercised by synthesized streams.
    """
    import numpy as np

    a = np.asarray(arr, dtype=np.float64)
    h, w, _ = a.shape
    comps = _ycbcr_planes(a, subsample)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    qt = np.full((8, 8), float(max(1, int(quant))))
    d = _dct_mat()
    dc_codes = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _canonical_codes(_ENC_AC_BITS, _ENC_AC_VALS)

    def emit_block(bw, plane, ys, xs, ci, preds):
        import numpy as np

        hh, ww = plane.shape
        src = plane[
            np.minimum(np.arange(ys, ys + 8), hh - 1)[:, None],
            np.minimum(np.arange(xs, xs + 8), ww - 1)[None, :],
        ]
        coef = d @ (src - 128.0) @ d.T
        q = np.round(coef / qt).astype(np.int64)
        zz = [int(q.flat[ZZ[k]]) for k in range(64)]
        diff = zz[0] - preds[ci]
        preds[ci] = zz[0]
        s = _category(diff)
        ln, code = dc_codes[s]
        bw.put(code, ln)
        if s:
            bw.put(_amplitude(diff, s), s)
        run = 0
        last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
        for k in range(1, last_nz + 1):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                ln, code = ac_codes[0xF0]
                bw.put(code, ln)
                run -= 16
            s = _category(zz[k])
            ln, code = ac_codes[(run << 4) | s]
            bw.put(code, ln)
            bw.put(_amplitude(zz[k], s), s)
            run = 0
        if last_nz < 63:
            ln, code = ac_codes[0x00]
            bw.put(code, ln)

    bw = _BitWriter()
    preds = [0, 0, 0]
    mcu_n = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                bw.marker(0xFFD0 | (rst & 7))
                rst += 1
                preds = [0, 0, 0]
            mcu_n += 1
            for ci, (plane, hs, vs) in enumerate(comps):
                for by in range(vs):
                    for bx in range(hs):
                        emit_block(
                            bw, plane, (my * vs + by) * 8, (mx * hs + bx) * 8,
                            ci, preds,
                        )

    qt_zz = bytes(int(qt.flat[ZZ[k]]) for k in range(64))
    dqt = _seg(0xFFDB, b"\x00" + qt_zz + b"\x01" + qt_zz)
    samp = [(c[1] << 4) | c[2] for c in comps]
    sof = _seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, samp[0], 0, 2, samp[1], 1, 3, samp[2], 1]),
    )
    dhts = (
        _dht_seg(0, 0, _ENC_DC_BITS, _ENC_DC_VALS)
        + _dht_seg(0, 1, _ENC_DC_BITS, _ENC_DC_VALS)
        + _dht_seg(1, 0, _ENC_AC_BITS, _ENC_AC_VALS)
        + _dht_seg(1, 1, _ENC_AC_BITS, _ENC_AC_VALS)
    )
    dri = _seg(0xFFDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    sos = _seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dhts + dri + sos + bw.flush() + b"\xff\xd9"


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _dht_seg(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
    return _seg(0xFFC4, bytes([cls << 4 | tid]) + bytes(bits) + bytes(vals))


def _quantized_blocks(arr, quant: int, subsample: bool):
    """Per-component zigzag-order quantized DCT blocks on the padded MCU
    grid, plus the non-interleaved block dims (T.81 A.2.2) used by
    single-component progressive scans."""
    import numpy as np

    a = np.asarray(arr, dtype=np.float64)
    h, w, _ = a.shape
    planes = _ycbcr_planes(a, subsample)
    hmax = max(p[1] for p in planes)
    vmax = max(p[2] for p in planes)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    qt = np.full(64, float(max(1, int(quant))))
    d = _dct_mat()
    comps = []
    for plane, hs, vs in planes:
        bh_p, bw_p = mcuy * vs, mcux * hs
        hh, ww = plane.shape
        yi = np.minimum(np.arange(bh_p * 8), hh - 1)
        xi = np.minimum(np.arange(bw_p * 8), ww - 1)
        padded = plane[yi[:, None], xi[None, :]] - 128.0
        blocks = padded.reshape(bh_p, 8, bw_p, 8).transpose(0, 2, 1, 3)
        coef = np.einsum("ki,yxij,lj->yxkl", d, blocks, d)
        zz = np.round(
            coef.reshape(bh_p, bw_p, 64)[..., ZZ] / qt
        ).astype(np.int64)
        cw = -(-(w * hs) // hmax)
        ch = -(-(h * vs) // vmax)
        comps.append({
            "h": hs, "v": vs, "zz": zz,
            "bwn": -(-cw // 8), "bhn": -(-ch // 8),
        })
    return comps, h, w, mcux, mcuy, bytes(int(qt[k]) for k in range(64))


def encode_jpeg_progressive(arr, quant: int = 1, subsample: bool = False,
                            restart_interval: int = 0) -> bytes:
    """uint8 HxWx3 RGB → progressive (SOF2) JPEG.

    Spectral selection + one level of successive approximation: an
    interleaved DC-first scan at Al=1, per-component AC band scans at
    Al=1 (EOB-run coded), an interleaved DC refinement scan, then AC
    refinement scans (newly-significant + correction bits) — so every
    progressive decoder path in ``_decode_scan`` is exercised by a
    synthesized stream. ``quant``/``subsample``/``restart_interval``
    behave as in ``encode_jpeg``; at quant=1 the full scan sequence
    reconstructs the coefficients exactly, so decode differs from the
    source only by DCT rounding.
    """
    comps, h, w, mcux, mcuy, qt_zz = _quantized_blocks(arr, quant, subsample)
    dc_codes = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _canonical_codes(_ENC_ACP_BITS, _ENC_ACP_VALS)
    out = bytearray(b"\xff\xd8")
    out += _seg(0xFFDB, b"\x00" + qt_zz + b"\x01" + qt_zz)
    samp = [(c["h"] << 4) | c["v"] for c in comps]
    out += _seg(
        0xFFC2,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, samp[0], 0, 2, samp[1], 1, 3, samp[2], 1]),
    )
    out += _dht_seg(0, 0, _ENC_DC_BITS, _ENC_DC_VALS)
    out += _dht_seg(0, 1, _ENC_DC_BITS, _ENC_DC_VALS)
    out += _dht_seg(1, 0, _ENC_ACP_BITS, _ENC_ACP_VALS)
    out += _dht_seg(1, 1, _ENC_ACP_BITS, _ENC_ACP_VALS)
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    scan_plan = [
        ([0, 1, 2], 0, 0, 0, 1),   # DC first, point transform Al=1
        ([0], 1, 5, 0, 1),         # luma low AC band
        ([0], 6, 63, 0, 1),        # luma high AC band
        ([1], 1, 63, 0, 1),
        ([2], 1, 63, 0, 1),
        ([0, 1, 2], 0, 0, 1, 0),   # DC refinement (raw bits)
        ([0], 1, 5, 1, 0),         # AC refinement scans
        ([0], 6, 63, 1, 0),
        ([1], 1, 63, 1, 0),
        ([2], 1, 63, 1, 0),
    ]
    for idxs, ss, se, ah, al in scan_plan:
        hdr = bytes([len(idxs)])
        for ix in idxs:
            tid = 0 if ix == 0 else 1
            hdr += bytes([ix + 1, (tid << 4) | tid])
        hdr += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xFFDA, hdr)
        out += _emit_prog_scan(
            [comps[ix] for ix in idxs], ss, se, ah, al,
            dc_codes, ac_codes, restart_interval, mcux, mcuy,
        )
    out += b"\xff\xd9"
    return bytes(out)


def _emit_prog_scan(scomps, ss, se, ah, al, dc_codes, ac_codes, ri,
                    mcux, mcuy) -> bytes:
    """Entropy data for one progressive scan (T.81 G.1.2; the AC
    refinement run/EOB bookkeeping mirrors libjpeg's public encoder,
    the reference realization of figure G.7)."""
    bw = _BitWriter()
    interleaved = len(scomps) > 1
    n_mcu = mcux * mcuy if interleaved else scomps[0]["bhn"] * scomps[0]["bwn"]
    preds = [0] * len(scomps)
    eobrun = 0
    pending: list[int] = []  # correction bits owed after the next EOBn

    def put_sym(codes, sym):
        ln, code = codes[sym]
        bw.put(code, ln)

    def flush_eob():
        nonlocal eobrun, pending
        if eobrun > 0:
            nbits = eobrun.bit_length() - 1
            put_sym(ac_codes, nbits << 4)
            if nbits:
                bw.put(eobrun & ((1 << nbits) - 1), nbits)
            eobrun = 0
        for bit in pending:
            bw.put(bit, 1)
        pending = []

    def dc_first_block(zz, ci):
        v = int(zz[0]) >> al  # arithmetic shift = T.81 point transform
        diff = v - preds[ci]
        preds[ci] = v
        s = _category(diff)
        ln, code = dc_codes[s]
        bw.put(code, ln)
        if s:
            bw.put(_amplitude(diff, s), s)

    def dc_refine_block(zz):
        bw.put((int(zz[0]) >> al) & 1, 1)

    def ac_first_block(zz):
        nonlocal eobrun
        r = 0
        for k in range(ss, se + 1):
            t = int(zz[k])
            m = (t if t >= 0 else -t) >> al
            if m == 0:
                r += 1
                continue
            flush_eob()
            while r > 15:
                put_sym(ac_codes, 0xF0)
                r -= 16
            s = m.bit_length()
            put_sym(ac_codes, (r << 4) | s)
            bw.put(_amplitude(m if t >= 0 else -m, s), s)
            r = 0
        if r > 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()

    def ac_refine_block(zz):
        nonlocal eobrun, pending
        absv = [0] * (se + 1)
        eobpos = ss - 1  # position of the last newly-significant coef
        for k in range(ss, se + 1):
            t = int(zz[k])
            m = (t if t >= 0 else -t) >> al
            absv[k] = m
            if m == 1:
                eobpos = k
        r = 0
        br: list[int] = []  # correction bits owed after the next symbol
        for k in range(ss, se + 1):
            m = absv[k]
            if m == 0:
                r += 1
                continue
            while r > 15 and k <= eobpos:
                flush_eob()
                put_sym(ac_codes, 0xF0)
                r -= 16
                for bit in br:
                    bw.put(bit, 1)
                br = []
            if m > 1:  # already significant: one correction bit
                br.append(m & 1)
                continue
            flush_eob()
            put_sym(ac_codes, (r << 4) | 1)
            bw.put(1 if int(zz[k]) >= 0 else 0, 1)
            for bit in br:
                bw.put(bit, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            pending.extend(br)
            if eobrun == 0x7FFF or len(pending) > 937:
                flush_eob()

    rst = 0
    mcu_n = 0
    for m_i in range(n_mcu):
        if ri and mcu_n and mcu_n % ri == 0:
            flush_eob()
            bw.marker(0xFFD0 | (rst & 7))
            rst += 1
            for ci in range(len(preds)):
                preds[ci] = 0
        mcu_n += 1
        if interleaved:
            my, mx = divmod(m_i, mcux)
            for ci, c in enumerate(scomps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = c["zz"][my * c["v"] + by][mx * c["h"] + bx]
                        if ah == 0:
                            dc_first_block(zz, ci)
                        else:
                            dc_refine_block(zz)
        else:
            c = scomps[0]
            by, bx = divmod(m_i, c["bwn"])
            zz = c["zz"][by][bx]
            if ss == 0:
                if ah == 0:
                    dc_first_block(zz, 0)
                else:
                    dc_refine_block(zz)
            elif ah == 0:
                ac_first_block(zz)
            else:
                ac_refine_block(zz)
    flush_eob()
    return bw.flush()


class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker: int | None = None

    def _fill(self) -> bool:
        if self.marker is not None:
            return False
        if self.pos >= len(self.d):
            return False
        byte = self.d[self.pos]
        if byte == 0xFF:
            if self.pos + 1 >= len(self.d):
                return False
            nxt = self.d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                self.marker = 0xFF00 | nxt
                return False
        else:
            self.pos += 1
        self.n += 8
        # mask to the live low bits — without it acc grows with every
        # byte read and each bit() becomes O(bytes-so-far), turning a
        # whole-image decode O(N²) in entropy-segment size
        self.acc = ((self.acc << 8) | byte) & ((1 << self.n) - 1)
        return True

    def bit(self) -> int | None:
        if self.n == 0 and not self._fill():
            return None
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int | None:
        v = 0
        for _ in range(k):
            b = self.bit()
            if b is None:
                return None
            v = (v << 1) | b
        return v

    def restart(self) -> bool:
        """Consume an RSTn marker at a restart interval; realign."""
        self.acc, self.n = 0, 0
        if self.marker is None:
            # marker not yet seen: scan forward for it
            while self.pos + 1 < len(self.d) and not (
                self.d[self.pos] == 0xFF and self.d[self.pos + 1] != 0x00
            ):
                self.pos += 1
            if self.pos + 1 >= len(self.d):
                return False
            self.marker = 0xFF00 | self.d[self.pos + 1]
            self.pos += 2
        m, self.marker = self.marker, None
        return 0xFFD0 <= m <= 0xFFD7


def _extend(r: int, size: int) -> int:
    return r if r >= (1 << (size - 1)) else r - (1 << size) + 1


# decode-side dimension cap (padded pixels): 2048×2048. Pure-Python
# per-bit entropy decode is the bottleneck well before this; the cap's
# job is to make hostile SOF headers cheap, not to set a useful limit.
_MAX_DECODE_PIXELS = 2048 * 2048


def decode_jpeg(payload: bytes | None):
    """HxWx3 uint8 RGB for a baseline-sequential (SOF0) or progressive
    (SOF2) JPEG; None otherwise.

    Total: any malformed, truncated, arithmetic-coded, or non-8-bit
    input returns None (fuzz-tested in tests/test_ops.py).
    """
    try:
        return _decode_jpeg(payload)
    except Exception:
        return None


def _read_sym(rd: _BitReader, table) -> int | None:
    code = 0
    for ln in range(1, 17):
        bit = rd.bit()
        if bit is None:
            return None
        code = (code << 1) | bit
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    return None


def _block_baseline(rd, blk, dc_t, ac_t, pred) -> int:
    """Sequential DC+AC for one block (T.81 F.2); returns new DC pred."""
    s = _read_sym(rd, dc_t)
    if s is None:
        raise ValueError("dc symbol")
    if s:
        r = rd.bits(s)
        if r is None:
            raise ValueError("dc bits")
        pred += _extend(r, s)
    blk[0] = pred
    k = 1
    while k < 64:
        sym = _read_sym(rd, ac_t)
        if sym is None:
            raise ValueError("ac symbol")
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        k += sym >> 4
        size = sym & 0xF
        if k > 63 or size == 0:
            raise ValueError("ac run")
        r = rd.bits(size)
        if r is None:
            raise ValueError("ac bits")
        blk[k] = _extend(r, size)
        k += 1
    return pred


def _block_dc_first(rd, blk, dc_t, pred, al) -> int:
    s = _read_sym(rd, dc_t)
    if s is None:
        raise ValueError("dc symbol")
    if s:
        r = rd.bits(s)
        if r is None:
            raise ValueError("dc bits")
        pred += _extend(r, s)
    blk[0] = pred << al
    return pred


def _block_dc_refine(rd, blk, al) -> None:
    bit = rd.bit()
    if bit is None:
        raise ValueError("dc refine bit")
    if bit:
        # two's-complement OR appends the magnitude bit for either sign
        blk[0] |= 1 << al


def _block_ac_first(rd, blk, ac_t, ss, se, al, eobrun) -> int:
    """AC first scan for one block (T.81 G.1.2.2); returns new EOBRUN."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = _read_sym(rd, ac_t)
        if sym is None:
            raise ValueError("ac symbol")
        r, s = sym >> 4, sym & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = 1 << r
            if r:
                eb = rd.bits(r)
                if eb is None:
                    raise ValueError("eobrun bits")
                eobrun += eb
            return eobrun - 1  # current block is part of the run
        k += r
        if k > se:
            raise ValueError("ac run past band")
        v = rd.bits(s)
        if v is None:
            raise ValueError("ac bits")
        blk[k] = _extend(v, s) << al
        k += 1
    return 0


def _block_ac_refine(rd, blk, ac_t, ss, se, al, eobrun) -> int:
    """AC refinement for one block (T.81 G.1.2.3 / figure G.7); returns
    new EOBRUN. Correction bits are read for every already-nonzero
    coefficient passed over — including the tail of the band once an
    EOB run is in effect."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = _read_sym(rd, ac_t)
            if sym is None:
                raise ValueError("ac symbol")
            r, s = sym >> 4, sym & 0xF
            if s == 0:
                if r != 15:  # EOBn: run of end-of-bands
                    eobrun = 1 << r
                    if r:
                        eb = rd.bits(r)
                        if eb is None:
                            raise ValueError("eobrun bits")
                        eobrun += eb
                    break
                val = 0  # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("refine size != 1")
                bit = rd.bit()
                if bit is None:
                    raise ValueError("sign bit")
                val = p1 if bit else m1
            while k <= se:
                cur = blk[k]
                if cur != 0:
                    bit = rd.bit()
                    if bit is None:
                        raise ValueError("correction bit")
                    if bit and (cur & p1) == 0:
                        blk[k] = cur + (p1 if cur >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val != 0 and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            cur = blk[k]
            if cur != 0:
                bit = rd.bit()
                if bit is None:
                    raise ValueError("correction bit")
                if bit and (cur & p1) == 0:
                    blk[k] = cur + (p1 if cur >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan(b, pos, scomps, ss, se, ah, al, huff, ri, progressive,
                 mcux, mcuy) -> int:
    """Entropy-decode one scan into the components' coefficient blocks
    in place; returns the offset of the next marker."""
    for c in scomps:
        c["_dc"] = huff.get((0, c.get("td", 0)))
        c["_ac"] = huff.get((1, c.get("ta", 0)))
    rd = _BitReader(b, pos)
    interleaved = len(scomps) > 1
    if interleaved:
        n_mcu = mcux * mcuy
    else:
        n_mcu = scomps[0]["bwn"] * scomps[0]["bhn"]
    preds = [0] * len(scomps)
    eobrun = 0
    mcu_n = 0
    for m in range(n_mcu):
        if ri and mcu_n and mcu_n % ri == 0:
            if not rd.restart():
                raise ValueError("bad restart")
            preds = [0] * len(scomps)
            eobrun = 0
        mcu_n += 1
        if interleaved:  # DC scans and sequential MCUs
            my, mx = divmod(m, mcux)
            for ci, c in enumerate(scomps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = c["coef"][my * c["v"] + by][mx * c["h"] + bx]
                        if not progressive:
                            preds[ci] = _block_baseline(
                                rd, blk, c["_dc"], c["_ac"], preds[ci])
                        elif ah == 0:
                            preds[ci] = _block_dc_first(
                                rd, blk, c["_dc"], preds[ci], al)
                        else:
                            _block_dc_refine(rd, blk, al)
        else:  # single-component scan: non-interleaved block grid
            c = scomps[0]
            by, bx = divmod(m, c["bwn"])
            blk = c["coef"][by][bx]
            if not progressive:
                preds[0] = _block_baseline(rd, blk, c["_dc"], c["_ac"],
                                           preds[0])
            elif ss == 0:
                if ah == 0:
                    preds[0] = _block_dc_first(rd, blk, c["_dc"], preds[0],
                                               al)
                else:
                    _block_dc_refine(rd, blk, al)
            elif ah == 0:
                eobrun = _block_ac_first(rd, blk, c["_ac"], ss, se, al,
                                         eobrun)
            else:
                eobrun = _block_ac_refine(rd, blk, c["_ac"], ss, se, al,
                                          eobrun)
    p = rd.pos
    while p + 1 < len(b) and not (b[p] == 0xFF and b[p + 1] != 0x00):
        p += 1
    return p


def _decode_jpeg(payload):
    import numpy as np

    if not payload:
        return None
    b = bytes(payload)
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    qts: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    h = w = 0
    hmax = vmax = 1
    mcux = mcuy = 0
    progressive = False
    restart_interval = 0
    scans = 0
    i = 2
    while i + 2 <= len(b):
        if b[i] != 0xFF:
            return None
        marker = b[i + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI
            break
        if i + 4 > len(b):
            return None
        ln = struct.unpack(">H", b[i + 2 : i + 4])[0]
        seg = b[i + 4 : i + 2 + ln]
        if len(seg) != ln - 2:
            return None
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0xF
                j += 1
                if pq == 0:
                    qts[tq] = list(seg[j : j + 64])
                    j += 64
                else:
                    qts[tq] = [
                        struct.unpack(">H", seg[j + 2 * k : j + 2 * k + 2])[0]
                        for k in range(64)
                    ]
                    j += 128
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                cls, tid = seg[j] >> 4, seg[j] & 0xF
                bits = list(seg[j + 1 : j + 17])
                nv = sum(bits)
                vals = list(seg[j + 17 : j + 17 + nv])
                table = {
                    lc: sym
                    for sym, lc in _canonical_codes(bits, vals).items()
                }
                huff[(cls, tid)] = table
                j += 17 + nv
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            if comps:
                return None  # second frame
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8 or nc not in (1, 3) or h == 0 or w == 0:
                return None
            comps = [
                {
                    "id": seg[6 + 3 * c],
                    "h": seg[7 + 3 * c] >> 4,
                    "v": seg[7 + 3 * c] & 0xF,
                    "tq": seg[8 + 3 * c],
                }
                for c in range(nc)
            ]
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            if min(c["h"] for c in comps) < 1 or min(c["v"] for c in comps) < 1:
                return None
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            # hostile-header guard: a 25-byte payload can declare a
            # 65500×65500 frame — cap the padded coefficient surface
            # BEFORE allocating the per-block storage (minutes of CPU
            # and tens of GB otherwise; beyond this size the pure-Python
            # per-bit decode is not viable anyway, so None is honest)
            if (mcux * 8 * hmax) * (mcuy * 8 * vmax) > _MAX_DECODE_PIXELS:
                return None
            for c in comps:
                cw = -(-(w * c["h"]) // hmax)
                ch = -(-(h * c["v"]) // vmax)
                c["bwn"] = -(-cw // 8)
                c["bhn"] = -(-ch // 8)
                c["coef"] = [
                    [[0] * 64 for _ in range(mcux * c["h"])]
                    for _ in range(mcuy * c["v"])
                ]
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            return None  # extended/lossless/arithmetic SOF
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — one of possibly many scans
            if not comps:
                return None
            ns = seg[0]
            if ns < 1 or ns > len(comps) or len(seg) < 4 + 2 * ns:
                return None
            scomps = []
            for c_i in range(ns):
                cid, tabs = seg[1 + 2 * c_i], seg[2 + 2 * c_i]
                comp = next((c for c in comps if c["id"] == cid), None)
                if comp is None:
                    return None
                comp["td"], comp["ta"] = tabs >> 4, tabs & 0xF
                scomps.append(comp)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahl = seg[3 + 2 * ns]
            ah, al = ahl >> 4, ahl & 0xF
            if progressive:
                if (ss == 0 and se != 0) or se > 63 or ss > se:
                    return None
                if ss > 0 and ns != 1:
                    return None
            elif ss != 0 or se != 63 or ah or al:
                return None
            i = _decode_scan(b, i + 2 + ln, scomps, ss, se, ah, al, huff,
                             restart_interval, progressive, mcux, mcuy)
            scans += 1
            continue
        i += 2 + ln
    if not comps or scans == 0:
        return None

    # dequantize + one batched IDCT per component
    d = _dct_mat()
    planes = []
    for c in comps:
        qt = qts.get(c["tq"])
        if qt is None:
            return None
        zz_arr = np.array(c["coef"], dtype=np.float64)  # (bh,bw,64) zigzag
        zz_arr *= np.array(qt, dtype=np.float64)
        rast = np.zeros_like(zz_arr)
        rast[..., ZZ] = zz_arr
        bh_p, bw_p = rast.shape[:2]
        blocks = rast.reshape(bh_p, bw_p, 8, 8)
        out = np.einsum("ki,yxkl,lj->yxij", d, blocks, d) + 128.0
        plane = out.transpose(0, 2, 1, 3).reshape(bh_p * 8, bw_p * 8)
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )[:h, :w]
        planes.append(plane)
    if len(planes) == 1:
        y = np.clip(planes[0], 0, 255)
        return np.dstack([y, y, y]).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.dstack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ]
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def resize_nearest_jpeg(payload: bytes | None, width: int, height: int) -> bytes | None:
    """Nearest-neighbor resample of a baseline JPEG, re-encoded as a
    near-lossless baseline JPEG; None if not decodable."""
    import numpy as np

    arr = decode_jpeg(payload)
    if arr is None:
        return None
    h, w, _ = arr.shape
    yi = (np.arange(height) * h // height).clip(0, h - 1)
    xi = (np.arange(width) * w // width).clip(0, w - 1)
    return encode_jpeg(arr[yi][:, xi])
