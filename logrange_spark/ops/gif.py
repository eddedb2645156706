"""GIF codec in pure Python + numpy (LZW implemented directly).

GIF's entropy coding is LZW with variable code width — small enough to
implement exactly (GIF89a spec, appendix F), so no image library is
needed. Same contract as the other codecs (ops/multimodal.py):
``decode_gif`` / ``decode_gif_frames`` are TOTAL (return None on any
malformed input), and ``encode_gif`` synthesizes valid single- or
multi-frame files for tests using the classic "uncompressed" LZW
writer (literal codes with periodic CLEARs so the code width never
grows).

Scope: GIF87a/89a, global and local color tables, interlaced images
(4-pass reordering), multi-frame animations with per-frame offsets,
transparency (GCE transparent index leaves the canvas pixel), disposal
methods 0/1 (leave) and 2 (restore to background). Each decoded frame
is the full composited canvas — what a video-style frame sampler wants.
"""

from __future__ import annotations

import struct

_SIGS = (b"GIF87a", b"GIF89a")


class _LzwReader:
    """GIF LZW decoder over the concatenated sub-block data."""

    def __init__(self, data: bytes, min_code_size: int):
        self.d = data
        self.pos = 0
        self.acc = 0
        self.n = 0
        self.min = min_code_size

    def _code(self, width: int) -> int | None:
        while self.n < width:
            if self.pos >= len(self.d):
                return None
            self.acc |= self.d[self.pos] << self.n  # LSB-first packing
            self.pos += 1
            self.n += 8
        v = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.n -= width
        return v

    def decode(self, max_pixels: int) -> bytearray | None:
        clear = 1 << self.min
        eoi = clear + 1
        width = self.min + 1
        table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
        out = bytearray()
        prev: bytes | None = None
        while len(out) < max_pixels:
            code = self._code(width)
            if code is None:
                break  # truncated stream: return what decoded so far
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                width = self.min + 1
                prev = None
                continue
            if code == eoi:
                break
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]
            else:
                return None  # corrupt code
            out += entry
            if prev is not None:
                table.append(prev + entry[:1])
                if len(table) == (1 << width) and width < 12:
                    width += 1
            prev = entry
        return out


def _color_table(b: bytes, i: int, size: int):
    import numpy as np

    n = 2 << size  # 2^(size+1) entries
    end = i + 3 * n
    if end > len(b):
        return None, i
    return np.frombuffer(b, dtype=np.uint8, count=3 * n, offset=i).reshape(n, 3), end


def _deinterlace(idx, h: int):
    import numpy as np

    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    out = np.empty_like(idx)
    out[np.array(order, dtype=np.int64)] = idx
    return out


def decode_gif_frames(payload: bytes | None, max_frames: int = 64):
    """List of HxWx3 uint8 RGB canvases (one per frame, composited) for
    a GIF; None for anything unrecognized. Total on hostile bytes."""
    try:
        return _decode_gif_frames(payload, max_frames)
    except Exception:
        return None


def _decode_gif_frames(payload, max_frames):
    import numpy as np

    if not payload:
        return None
    b = bytes(payload)
    if len(b) < 13 or b[:6] not in _SIGS:
        return None
    w, h = struct.unpack("<HH", b[6:10])
    if not w or not h:
        return None
    # hostile-header guard: 13 bytes can declare a 65535×65535 logical
    # screen (a ~13 GB canvas plus per-frame copies). Same ceiling as
    # the JPEG decoder (ops/jpeg._MAX_DECODE_PIXELS).
    if w * h > 2048 * 2048:
        return None
    flags, bg, _ = b[10], b[11], b[12]
    i = 13
    gct = None
    if flags & 0x80:
        gct, i = _color_table(b, i, flags & 0x07)
        if gct is None:
            return None
    bg_rgb = gct[bg] if gct is not None and bg < len(gct) else np.zeros(3, np.uint8)
    canvas = np.broadcast_to(bg_rgb, (h, w, 3)).copy()
    frames: list = []
    transparent: int | None = None
    disposal = 0
    while i < len(b):
        block = b[i]
        i += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if i >= len(b):
                break
            label = b[i]
            i += 1
            if label == 0xF9 and i < len(b) and b[i] >= 4:  # GCE
                sz = b[i]
                gflags = b[i + 1]
                disposal = (gflags >> 2) & 0x7
                transparent = b[i + 4] if gflags & 1 else None
                i += 1 + sz
            # skip (remaining) sub-blocks
            while i < len(b) and b[i]:
                i += 1 + b[i]
            i += 1
        elif block == 0x2C:  # image descriptor
            if i + 9 > len(b):
                break
            x0, y0, iw, ih = struct.unpack("<HHHH", b[i : i + 8])
            iflags = b[i + 8]
            i += 9
            table = gct
            if iflags & 0x80:
                table, i = _color_table(b, i, iflags & 0x07)
            if table is None or i >= len(b):
                return None
            min_code = b[i]
            i += 1
            if not (2 <= min_code <= 11):
                return None
            data = bytearray()
            while i < len(b) and b[i]:
                sz = b[i]
                data += b[i + 1 : i + 1 + sz]
                i += 1 + sz
            i += 1
            px = _LzwReader(bytes(data), min_code).decode(iw * ih)
            if px is None or x0 + iw > w or y0 + ih > h:
                return None
            idx = np.zeros(iw * ih, dtype=np.uint8)
            got = np.frombuffer(bytes(px[: iw * ih]), dtype=np.uint8)
            idx[: len(got)] = got
            idx = idx.reshape(ih, iw)
            if iflags & 0x40:
                idx = _deinterlace(idx, ih)
            if idx.max() >= len(table):
                return None
            region = canvas[y0 : y0 + ih, x0 : x0 + iw]
            pixels = table[idx]
            if transparent is not None:
                mask = (idx != transparent)[..., None]
                region[:] = np.where(mask, pixels, region)
            else:
                region[:] = pixels
            frames.append(canvas.copy())
            if disposal == 2:  # restore to background
                canvas[y0 : y0 + ih, x0 : x0 + iw] = bg_rgb
            transparent = None
            disposal = 0
            if len(frames) >= max_frames:
                break
        else:
            return None  # unknown block type
    return frames or None


def decode_gif(payload: bytes | None):
    """First composited frame as HxWx3 uint8 RGB; None otherwise."""
    frames = decode_gif_frames(payload, max_frames=1)
    return frames[0] if frames else None


class _LzwWriter:
    """'Uncompressed' GIF LZW: literal codes with a CLEAR before the
    table would force a width increase — code width stays min+1."""

    def __init__(self, min_code_size: int):
        self.min = min_code_size
        self.width = min_code_size + 1
        self.acc = 0
        self.n = 0
        self.out = bytearray()

    def put(self, code: int) -> None:
        self.acc |= code << self.n
        self.n += self.width
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def finish(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _quantize(arr):
    """(palette Nx3, index HxW) — exact palette of the image's distinct
    colors (≤ 256 required)."""
    import numpy as np

    h, w, _ = arr.shape
    flat = arr.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("encode_gif needs <= 256 distinct colors")
    return palette.astype(np.uint8), inverse.reshape(h, w).astype(np.int64)


def encode_gif(frames, transparent_none: bool = True) -> bytes:
    """uint8 HxWx3 RGB frame list (same dims, ≤256 distinct colors
    across all frames) → GIF89a. Frames after the first are emitted as
    full-canvas image descriptors (disposal 0)."""
    import numpy as np

    if not isinstance(frames, (list, tuple)):
        frames = [frames]
    h, w, _ = frames[0].shape
    allpx = np.concatenate([f.reshape(-1, 3) for f in frames])
    palette, _ = _quantize(allpx.reshape(-1, 1, 3))
    n_colors = len(palette)
    size_field = max(1, (int(n_colors - 1)).bit_length() - 1) if n_colors > 2 else 0
    while (2 << size_field) < n_colors:
        size_field += 1
    table = np.zeros((2 << size_field, 3), dtype=np.uint8)
    table[:n_colors] = palette
    min_code = max(2, size_field + 1)

    lut = {tuple(c): k for k, c in enumerate(palette)}
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HH", w, h)
    out.append(0x80 | size_field)  # GCT present
    out += b"\x00\x00"  # bg index, aspect
    out += table.tobytes()
    for f in frames:
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE, no transparency
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out.append(min_code)
        wr = _LzwWriter(min_code)
        clear = 1 << min_code
        wr.put(clear)
        # re-CLEAR before the implicit table (clear+2 codes grown so far)
        # would reach 2^(min+1) and widen the code size
        budget = (1 << wr.width) - clear - 2 - 1
        k = 0
        idx = f.reshape(-1, 3)
        for px in idx:
            wr.put(lut[tuple(px)])
            k += 1
            if k >= budget:
                wr.put(clear)
                k = 0
        wr.put(clear + 1)  # EOI
        data = wr.finish()
        for j in range(0, len(data), 255):
            chunk = data[j : j + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)


def resize_nearest_gif(payload: bytes | None, width: int, height: int) -> bytes | None:
    """Nearest-neighbor resample of a GIF's first composited frame,
    re-encoded as GIF; None if not decodable. Nearest-neighbor only
    selects existing pixels, so the ≤256-color invariant is preserved."""
    import numpy as np

    arr = decode_gif(payload)
    if arr is None:
        return None
    h, w, _ = arr.shape
    yi = (np.arange(height) * h // height).clip(0, h - 1)
    xi = (np.arange(width) * w // width).clip(0, w - 1)
    return encode_gif(arr[yi][:, xi])
