"""Minimal pure-stdlib PNG codec (zlib + numpy) — a REAL image decode
path for the multimodal stages, no PIL required.

Scope (the subset any synthetic or thumbnail pipeline produces): 8-bit
non-interlaced PNG, color types 0 (gray), 2 (RGB), 4 (gray+alpha) and
6 (RGBA).  The decoder handles all five scanline filters of the spec
(None/Sub/Up/Average/Paeth); Sub and Up unfilter fully vectorized
(wrap-around uint8 lane cumsum / row add), Average and Paeth fall back to
a per-byte loop — acceptable for thumbnail-scale payloads inside an
actor-pool stage, and correctness-complete for arbitrary encoder output.
The encoder emits filter-None scanlines (one hstack + one zlib.compress).

Implemented from the public PNG specification (W3C/RFC 2083).  JPEG and
friends still need a real library — that seam stays NotImplementedError
in ``stages/multimodal``.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> channels (8-bit only)
_CTYPE_CH = {0: 1, 2: 3, 4: 2, 6: 4}
_CH_CTYPE = {1: 0, 3: 2, 2: 4, 4: 6}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray, *, level: int = 6) -> bytes:
    """uint8 array (h, w) or (h, w, c) with c in {1,2,3,4} -> PNG bytes."""
    a = np.ascontiguousarray(arr, np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    if c not in _CH_CTYPE:
        raise ValueError(f"unsupported channel count {c}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _CH_CTYPE[c], 0, 0, 0)
    scan = np.hstack([np.zeros((h, 1), np.uint8), a.reshape(h, w * c)])
    idat = zlib.compress(scan.tobytes(), level)
    return (_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (h, w, c).  8-bit, non-interlaced only."""
    if bytes(data[:8]) != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat, hdr = 8, [], None
    n = len(data)
    while pos + 12 <= n:
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = bytes(data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if hdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = hdr
    if depth != 8 or comp != 0 or filt != 0:
        raise ValueError(f"unsupported PNG (depth={depth}, comp={comp})")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    if ctype not in _CTYPE_CH:
        raise ValueError(f"unsupported PNG color type {ctype}")
    c = _CTYPE_CH[ctype]
    stride = w * c
    rows = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    if rows.size != h * (1 + stride):
        raise ValueError("PNG scanline size mismatch")
    rows = rows.reshape(h, 1 + stride)
    ftypes, raw = rows[:, 0], rows[:, 1:]
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    bpp = c
    for y in range(h):
        f, r = int(ftypes[y]), raw[y]
        if f == 0:
            cur = r.copy()
        elif f == 1:  # Sub: per-lane cumulative sum, uint8 wrap is mod 256
            cur = np.add.accumulate(
                r.reshape(-1, bpp), axis=0, dtype=np.uint8).reshape(-1)
        elif f == 2:  # Up: fully vectorized, uint8 wrap
            cur = r + prev
        elif f == 3:  # Average: sequential in x (floor halving)
            cur = np.empty_like(r)
            cur[:bpp] = r[:bpp] + prev[:bpp] // 2
            for x in range(bpp, stride):
                cur[x] = (int(r[x])
                          + ((int(cur[x - bpp]) + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth: sequential in x
            cur = np.empty_like(r)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                cc = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - cc
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb and pa_ <= pc_) else \
                    (b if pb <= pc_ else cc)
                cur[x] = (int(r[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = cur
        prev = cur
    return out.reshape(h, w, c)
