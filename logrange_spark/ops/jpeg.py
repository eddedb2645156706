"""Baseline JPEG codec in pure Python + numpy (no image libraries).

Implements the ITU-T T.81 baseline sequential DCT process — the
dominant real-world image format — with the same contract as the BMP
codec in multimodal.py: ``decode_jpeg`` is TOTAL (returns an HxWx3
uint8 RGB array or None, never raises on hostile bytes), and
``encode_jpeg`` synthesizes a valid baseline stream so tests can verify
decode→resize end-to-end against a numpy reference without fixture
files.

Decoder scope (honest): baseline sequential (SOF0) only, 8-bit, 1- or
3-component, arbitrary sampling factors (4:4:4 / 4:2:2 / 4:2:0 …),
restart markers. Progressive (SOF2), arithmetic coding, and 12-bit
inputs return None. Huffman and quantization tables are read from the
stream, so any conformant baseline file decodes — the encoder's own
tables are a simple valid canonical set (12 four-bit DC codes, 162
nine-bit AC codes), chosen for implementation clarity over compression.

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
    # RGB → YCbCr (T.871 full-range)
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

        comps = [(y, 2, 2), (down2(cb), 1, 1), (down2(cr), 1, 1)]
    else:
        comps = [(y, 1, 1), (cb, 1, 1), (cr, 1, 1)]
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

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    qt_zz = bytes(int(qt.flat[ZZ[k]]) for k in range(64))
    dqt = seg(0xFFDB, b"\x00" + qt_zz + b"\x01" + qt_zz)
    samp = [(c[1] << 4) | c[2] for c in comps]
    sof = seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, samp[0], 0, 2, samp[1], 1, 3, samp[2], 1]),
    )

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xFFC4, bytes([cls << 4 | tid]) + bytes(bits) + bytes(vals))

    dhts = (
        dht(0, 0, _ENC_DC_BITS, _ENC_DC_VALS)
        + dht(0, 1, _ENC_DC_BITS, _ENC_DC_VALS)
        + dht(1, 0, _ENC_AC_BITS, _ENC_AC_VALS)
        + dht(1, 1, _ENC_AC_BITS, _ENC_AC_VALS)
    )
    dri = seg(0xFFDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    sos = seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dhts + dri + sos + bw.flush() + b"\xff\xd9"


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
        self.acc = (self.acc << 8) | byte
        self.n += 8
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


def decode_jpeg(payload: bytes | None):
    """HxWx3 uint8 RGB for a baseline sequential JPEG; None otherwise.

    Total: any malformed, truncated, progressive, or non-8-bit input
    returns None (fuzz-tested in tests/test_ops.py).
    """
    try:
        return _decode_jpeg(payload)
    except Exception:
        return None


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
    restart_interval = 0
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            return None
        marker = b[i + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            return None  # EOI before SOS
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
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8 or nc not in (1, 3):
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
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            return None  # non-baseline SOF
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                for comp in comps:
                    if comp["id"] == cid:
                        comp["td"], comp["ta"] = tabs >> 4, tabs & 0xF
            i = i + 2 + ln
            break
        i += 2 + ln
    else:
        return None
    if not comps or h == 0 or w == 0:
        return None

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1:
        return None
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    d = _dct_mat()
    for c in comps:
        c["plane"] = np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8))
        c["qt"] = np.array(
            [qts[c["tq"]][k] for k in range(64)], dtype=np.float64
        )

    def read_sym(rd: _BitReader, table) -> int | None:
        code, ln = 0, 0
        while ln < 16:
            bit = rd.bit()
            if bit is None:
                return None
            code = (code << 1) | bit
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        return None

    rd = _BitReader(b, i)
    preds = [0] * len(comps)
    zz_flat = np.array(ZZ)
    mcu_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                if not rd.restart():
                    return None
                preds = [0] * len(comps)
            mcu_n += 1
            for ci, c in enumerate(comps):
                dc_t = huff.get((0, c.get("td", 0)))
                ac_t = huff.get((1, c.get("ta", 0)))
                if dc_t is None or ac_t is None:
                    return None
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64)
                        s = read_sym(rd, dc_t)
                        if s is None:
                            return None
                        if s:
                            r = rd.bits(s)
                            if r is None:
                                return None
                            preds[ci] += _extend(r, s)
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            sym = read_sym(rd, ac_t)
                            if sym is None:
                                return None
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += sym >> 4
                            size = sym & 0xF
                            if k > 63 or size == 0:
                                return None
                            r = rd.bits(size)
                            if r is None:
                                return None
                            zz[k] = _extend(r, size)
                            k += 1
                        coef = np.zeros(64)
                        coef[zz_flat] = zz * c["qt"]
                        block = d.T @ coef.reshape(8, 8) @ d + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        c["plane"][y0 : y0 + 8, x0 : x0 + 8] = block

    planes = []
    for c in comps:
        p = np.repeat(
            np.repeat(c["plane"], vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )[:h, :w]
        planes.append(p)
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
