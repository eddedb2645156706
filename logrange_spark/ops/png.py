"""PNG codec in pure Python + numpy (stdlib zlib for DEFLATE).

PNG's entropy coding is DEFLATE — which ships in the Python standard
library — so unlike the original stub rationale, no absent image
library is needed: the only real work is chunk parsing and scanline
unfiltering. Same contract as the BMP/JPEG codecs (ops/multimodal.py,
ops/jpeg.py): ``decode_png`` is TOTAL (HxWx3 uint8 RGB or None, never
raises), ``encode_png`` synthesizes valid files for tests and the
resize re-encode path.

Scope: 8- and 16-bit depth (16-bit scales to 8 via the high byte),
color types 0 (gray), 2 (RGB), 3 (palette, 8-bit), 4 (gray+alpha),
6 (RGBA); all five scanline filters (None/Sub/Up/Average/Paeth); both
non-interlaced and Adam7-interlaced layouts (each interlace pass is an
independent filtered sub-image scattered into the full raster). Alpha
is composited over white to produce RGB — deterministic and matches
how training-data pipelines flatten transparency.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes | None):
    """HxWx3 uint8 RGB for an 8/16-bit PNG (Adam7 or not); None otherwise."""
    try:
        return _decode_png(payload)
    except Exception:
        return None


def _decode_png(payload):
    import numpy as np

    if not payload:
        return None
    b = bytes(payload)
    if len(b) < len(_SIG) + 12 or not b.startswith(_SIG):
        return None
    i = len(_SIG)
    w = h = None
    depth = ctype = interlace = None
    idat = bytearray()
    plte = None
    while i + 8 <= len(b):
        ln, typ = struct.unpack(">I4s", b[i : i + 8])
        data = b[i + 8 : i + 8 + ln]
        if len(data) != ln:
            return None
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        i += 12 + ln  # length + type + data + CRC (CRC not verified)
    if w is None or not w or not h or depth not in (8, 16) or interlace not in (0, 1):
        return None
    if depth == 16 and ctype == 3:
        return None  # palette is 8-bit-indexed only (spec)
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        return None
    sbytes = depth // 8
    bpp = channels * sbytes

    # Adam7 pass grid: (x0, y0, dx, dy) per pass; non-interlaced is the
    # single full pass
    passes = (
        [(0, 0, 1, 1)]
        if interlace == 0
        else [
            (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
        ]
    )
    dims = []
    need = 0
    for x0, y0, dx, dy in passes:
        wp = (w - x0 + dx - 1) // dx
        hp = (h - y0 + dy - 1) // dy
        dims.append((wp, hp))
        if wp and hp:
            need += hp * (wp * bpp + 1)
    # bound dimensions BEFORE inflating so a hostile deflate bomb cannot
    # allocate past the declared image size (+1 byte detects overlong
    # streams); 1 GiB raster ceiling rejects absurd declared dims too.
    if need > 1 << 30:
        return None
    dec = zlib.decompressobj()
    raw = dec.decompress(bytes(idat), need + 1)
    if len(raw) != need:  # short stream, or overlong (need+1 cap hit)
        return None

    def unfilter(pos: int, hp: int, stride: int):
        """Reconstruct hp filtered scanlines of `stride` bytes starting
        at raw[pos]; returns (hp x stride array, new pos) or None."""
        sub = np.zeros((hp, stride), dtype=np.uint8)
        p = pos
        for y in range(hp):
            f = raw[p]
            line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=p + 1)
            p += stride + 1
            prev = sub[y - 1] if y else np.zeros(stride, dtype=np.uint8)
            if f == 0:
                sub[y] = line
            elif f == 2:  # Up
                sub[y] = line + prev
            elif f == 1:  # Sub — sequential in x
                cur = sub[y]
                cur[:bpp] = line[:bpp]
                for x in range(bpp, stride):
                    cur[x] = (int(line[x]) + int(cur[x - bpp])) & 0xFF
            elif f == 3:  # Average
                cur = sub[y]
                for x in range(stride):
                    left = int(cur[x - bpp]) if x >= bpp else 0
                    cur[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
            elif f == 4:  # Paeth
                cur = sub[y]
                for x in range(stride):
                    left = int(cur[x - bpp]) if x >= bpp else 0
                    ul = int(prev[x - bpp]) if x >= bpp else 0
                    cur[x] = (int(line[x]) + _paeth(left, int(prev[x]), ul)) & 0xFF
            else:
                return None
            # (filters operate on raw BYTES regardless of depth — spec)
        return sub, p

    full = np.zeros((h, w * channels * sbytes), dtype=np.uint8)
    pos = 0
    for (x0, y0, dx, dy), (wp, hp) in zip(passes, dims):
        if not wp or not hp:
            continue
        got = unfilter(pos, hp, wp * bpp)
        if got is None:
            return None
        sub, pos = got
        # scatter the pass's pixels into the full raster
        spx = sub.reshape(hp, wp, bpp)
        fpx = full.reshape(h, w, bpp)
        fpx[y0::dy, x0::dx] = spx

    if sbytes == 2:
        # 16-bit big-endian samples → high byte (the standard 16→8 scale)
        full = full.reshape(h, w, channels, 2)[..., 0].reshape(h, w * channels)

    px = full.reshape(h, w, channels)
    if ctype == 2:
        return px.copy()
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    if ctype == 3:
        if plte is None or len(plte) % 3:
            return None
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = px[..., 0]
        if idx.max() >= len(pal):
            return None
        return pal[idx]
    # alpha types: composite over white (deterministic flattening)
    if ctype == 4:
        g, a = px[..., 0].astype(np.float64), px[..., 1].astype(np.float64) / 255.0
        flat = np.round(g * a + 255.0 * (1.0 - a)).astype(np.uint8)
        return np.dstack([flat, flat, flat])
    rgb, a = px[..., :3].astype(np.float64), px[..., 3:4].astype(np.float64) / 255.0
    return np.round(rgb * a + 255.0 * (1.0 - a)).astype(np.uint8)


def encode_png(arr) -> bytes:
    """uint8 HxWx3 RGB → non-interlaced color-type-2 PNG (filter 0)."""
    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, _ = a.shape
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def resize_nearest_png(payload: bytes | None, width: int, height: int) -> bytes | None:
    """Nearest-neighbor resample of a PNG, re-encoded as PNG; None if
    not decodable."""
    import numpy as np

    arr = decode_png(payload)
    if arr is None:
        return None
    h, w, _ = arr.shape
    yi = (np.arange(height) * h // height).clip(0, h - 1)
    xi = (np.arange(width) * w // width).clip(0, w - 1)
    return encode_png(arr[yi][:, xi])
