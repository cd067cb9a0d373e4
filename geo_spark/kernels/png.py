"""Pure-stdlib PNG decode/encode (zlib + struct) — the real codec behind the
multimodal seam (operators/multimodal.py).

Scope: non-interlaced PNGs, bit depth 8/16, color types 0 (gray), 2 (RGB),
3 (palette), 4 (gray+alpha), 6 (RGBA), all five scanline filters
(None/Sub/Up/Average/Paeth). That covers everything a standard encoder at
default settings emits. Adam7 interlace and sub-byte depths raise.

The per-row Sub/Average/Paeth unfiltering is a Python loop over bytes —
acceptable because media decode is executor-side work over mapInPandas
batches and the container has no C codec; swap in PIL here when available.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes → (h, w, channels) uint8/uint16 array (palette expanded)."""
    buf = bytes(buf)
    if buf[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    idat = bytearray()
    w = h = depth = ctype = None
    plte = None
    while pos + 8 <= len(buf):
        (ln,) = struct.unpack(">I", buf[pos : pos + 4])
        typ = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + data + CRC
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, inter = struct.unpack(">IIBBBBB", data)
            if inter != 0:
                raise ValueError("Adam7 interlaced PNG not supported")
            if depth not in (8, 16):
                raise ValueError(f"bit depth {depth} not supported")
            if ctype not in _CHANNELS:
                raise ValueError(f"color type {ctype} not supported")
            if ctype == 3 and depth != 8:
                raise ValueError("palette PNGs must be 8-bit")
        elif typ == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    nch = _CHANNELS[ctype]
    bpp = nch * (depth // 8)
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT size mismatch")
    img = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    p = 0
    for y in range(h):
        f = raw[p]
        p += 1
        cur = np.frombuffer(raw[p : p + stride], dtype=np.uint8).astype(np.int32)
        p += stride
        if f == 0:
            pass
        elif f == 1:  # Sub
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 255
        elif f == 2:  # Up
            cur = (cur + prev) & 255
        elif f == 3:  # Average
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 255
        elif f == 4:  # Paeth
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                q = a + b - c
                pa, pb, pc = abs(q - a), abs(q - b), abs(q - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 255
        else:
            raise ValueError(f"bad scanline filter {f}")
        img[y] = cur.astype(np.uint8)
        prev = cur
    if depth == 16:
        pairs = img.reshape(h, w, nch, 2).astype(np.uint16)
        out = (pairs[..., 0] << 8) | pairs[..., 1]
    else:
        out = img.reshape(h, w, nch)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        out = plte[out[..., 0]]
    return out


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """(h, w[, channels]) uint8 array → PNG bytes (8-bit, one filter type
    applied to every scanline — exercising the decoder's unfilter paths)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nch = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    bpp = nch
    flat = img.reshape(h, w * nch).astype(np.int32)
    rows = bytearray()
    prev = np.zeros(w * nch, dtype=np.int32)
    for y in range(h):
        cur = flat[y]
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            enc = cur.copy()
            enc[bpp:] = (cur[bpp:] - cur[:-bpp]) & 255
        elif filter_type == 2:
            enc = (cur - prev) & 255
        elif filter_type == 3:
            enc = cur.copy()
            for i in range(len(cur)):
                left = cur[i - bpp] if i >= bpp else 0
                enc[i] = (cur[i] - ((left + prev[i]) >> 1)) & 255
        elif filter_type == 4:
            enc = cur.copy()
            for i in range(len(cur)):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                q = a + b - c
                pa, pb, pc = abs(q - a), abs(q - b), abs(q - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (cur[i] - pred) & 255
        else:
            raise ValueError(f"bad filter type {filter_type}")
        rows.append(filter_type)
        rows += bytes(enc.astype(np.uint8))
        prev = cur

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(rows)))
        + chunk(b"IEND", b"")
    )


def png_features(img: np.ndarray, dim: int = 32) -> np.ndarray:
    """Deterministic image statistics vector (length ``dim``):
    [w, h, nch, per-channel mean (4, zero-padded), per-channel std (4),
    16-bin normalized intensity histogram, zeros...]."""
    h, w, nch = img.shape
    arr = img.astype(np.float64)
    scale = 65535.0 if img.dtype == np.uint16 else 255.0
    arr = arr / scale
    means = np.zeros(4)
    stds = np.zeros(4)
    means[:nch] = arr.reshape(-1, nch).mean(axis=0)
    stds[:nch] = arr.reshape(-1, nch).std(axis=0)
    luma = arr.mean(axis=2)
    hist, _ = np.histogram(luma, bins=16, range=(0.0, 1.0000001))
    hist = hist / max(luma.size, 1)
    v = np.concatenate([[float(w), float(h), float(nch)], means, stds, hist])
    out = np.zeros(dim, dtype=np.float64)
    out[: min(dim, len(v))] = v[:dim]
    return out
