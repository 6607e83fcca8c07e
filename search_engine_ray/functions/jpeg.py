"""Pure-stdlib/numpy baseline JPEG codec (encoder + decoder).

Fills the multimodal JPEG seam (``stages/multimodal.py``) left explicitly
unimplemented in round 2: the container has no PIL/turbojpeg, so a real
Common-Crawl-style image pipeline needs a built-in decode path the same way
``functions/png.py`` provides one for PNG.

Scope (documented subset, raises loudly outside it):

* **baseline sequential DCT** (SOF0) and **progressive DCT** (SOF2,
  spectral selection + successive approximation, DC/AC first and
  refinement passes — the second-most-common real-Common-Crawl encoding),
  8-bit precision;
* 1 component (grayscale) or 3 components (YCbCr), sampling factors up
  to 2x2 — i.e. 4:4:4, 4:2:0 (the dominant real-Common-Crawl encoding),
  4:2:2 and 4:4:0 all decode AND encode (MCU-interleaved baseline
  streams; every decode claim is round-trip-tested), plus 4:4:4
  progressive streams (``encode_jpeg_progressive``, arbitrary scan
  scripts);
* chroma resampling contract (frozen, SQL-replayable): downsample is the
  2x2 box mean with ``floor(x + 0.5)`` rounding (= ``(a+b+c+d+2)//4`` on
  integer samples), upsample is plain sample replication;
* standard JFIF byte stream: SOI/APP0/DQT/SOF/DHT/SOS/EOI with the
  ITU-T T.81 Annex-K quantization and Huffman tables on the encode side
  (the decoder builds its tables from the file's DHT/DQT segments —
  snapshotted per scan, since progressive files redefine DHT between
  scans — so it reads any conforming stream within the subset, not just
  our own);
* restart intervals (DRI + RSTn) on both encode and decode, baseline
  and progressive — DC predictors / EOB runs reset at every marker,
  entropy segments re-align to byte boundaries, D0..D7 cycle validated;
* no arithmetic coding, no 12-bit precision.

Determinism contract (what makes an SQL oracle possible, mirroring the
PNG path's ``mean_luma`` check): every rounding step uses
``floor(x + 0.5)`` — NOT banker's rounding — and at ``quality=100`` the
quantization tables are all ones, so a CONSTANT-fill image round-trips
EXACTLY: DCT of a constant block has a single DC coefficient ``8*(v-128)``
(float error ~ulps, crushed by the 0.5 offset), AC exactly zero, and the
IDCT reproduces ``v``.  For color, the YCbCr forward+inverse transform is
the only lossy step and both directions are the frozen ``floor(x+0.5)``
affine maps below — predictable in SQL with the same literals.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg", "decode_jpeg", "encode_jpeg_progressive"]

# --------------------------------------------------------------------------
# constants
# --------------------------------------------------------------------------

#: ITU-T T.81 Annex K.1 luminance quantization table (row-major)
_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], np.int32).reshape(8, 8)

#: Annex K.2 chrominance quantization table
_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], np.int32).reshape(8, 8)


def _zigzag() -> np.ndarray:
    """Standard zigzag scan order as flat indices into a row-major 8x8."""
    out = []
    for s in range(15):
        pts = [(i, s - i) for i in range(s + 1)]
        if s % 2 == 0:
            pts = pts[::-1]
        out.extend(r * 8 + c for r, c in pts if r < 8 and c < 8)
    return np.array(out, np.int64)


_ZIG = _zigzag()          # block[_ZIG] -> zigzag vector
_UNZIG = np.argsort(_ZIG)  # zigzag vector[_UNZIG] -> row-major block

# Annex K.3 standard Huffman tables: (bits-per-length[1..16], symbols)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])


def _dct_matrix() -> np.ndarray:
    k = np.arange(8.0)[:, None]
    j = np.arange(8.0)[None, :]
    c = 0.5 * np.cos((2 * j + 1) * k * np.pi / 16.0)
    c[0, :] = 1.0 / np.sqrt(8.0)
    return c


_C = _dct_matrix()


def _scaled_quant(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-convention quality scaling; quality=100 -> all ones."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table.astype(np.int64) * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    """JFIF forward color transform, frozen floor(x+0.5) rounding (the SQL
    oracle mirrors these literals verbatim)."""
    r = px[..., 0].astype(np.float64)
    g = px[..., 1].astype(np.float64)
    b = px[..., 2].astype(np.float64)
    y = np.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5)
    cb = np.floor(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0 + 0.5)
    cr = np.floor(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0 + 0.5)
    return np.clip(np.stack([y, cb, cr], axis=-1), 0, 255)


def _ycbcr_to_rgb(px: np.ndarray) -> np.ndarray:
    """JFIF inverse color transform, same frozen rounding."""
    y = px[..., 0].astype(np.float64)
    cb = px[..., 1].astype(np.float64)
    cr = px[..., 2].astype(np.float64)
    r = np.floor(y + 1.402 * (cr - 128.0) + 0.5)
    g = np.floor(y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0) + 0.5)
    b = np.floor(y + 1.772 * (cb - 128.0) + 0.5)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255)


def _blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad (edge-replicate) to multiples of 8 and split into (n, 8, 8)
    blocks in raster MCU order."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = plane.shape
    nby, nbx = hh // 8, ww // 8
    blk = plane.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3) \
        .reshape(nby * nbx, 8, 8)
    return blk, nby, nbx


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:       # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        # T.81 F.1.2.3: fill the final byte with 1-bits (exactly 8-n of
        # them) — an all-ones fill can never start a valid Huffman code
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)
        self.acc, self.n = 0, 0


def _huff_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical T.81 code assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amplitude(v: int, cat: int) -> int:
    return v if v >= 0 else v + (1 << cat) - 1


def _encode_plane_blocks(qcoef: np.ndarray, prev_dc: int, dc_codes, ac_codes,
                         bw: _BitWriter) -> int:
    """Entropy-encode one block's 64 zigzag coefficients; returns new DC."""
    dc = int(qcoef[0])
    diff = dc - prev_dc
    cat = _category(diff)
    code, length = dc_codes[cat]
    bw.put(code, length)
    if cat:
        bw.put(_amplitude(diff, cat), cat)
    nz = np.flatnonzero(qcoef[1:]) + 1
    pos = 0
    for i in nz:
        run = int(i) - pos - 1
        while run >= 16:
            c, ln = ac_codes[0xF0]   # ZRL
            bw.put(c, ln)
            run -= 16
        v = int(qcoef[i])
        cat = _category(v)
        c, ln = ac_codes[(run << 4) | cat]
        bw.put(c, ln)
        bw.put(_amplitude(v, cat), cat)
        pos = int(i)
    if pos != 63:
        c, ln = ac_codes[0x00]       # EOB
        bw.put(c, ln)
    return dc


def _box_down2(plane: np.ndarray) -> np.ndarray:
    """Frozen 2x2 box downsample: floor(mean + 0.5) on integer samples
    (== (a+b+c+d+2)//4).  Input dims must be even."""
    s = plane[0::2, 0::2] + plane[1::2, 0::2] \
        + plane[0::2, 1::2] + plane[1::2, 1::2]
    return np.floor(s / 4.0 + 0.5)


def _box_down_h(plane: np.ndarray) -> np.ndarray:
    """Frozen 2x1 (horizontal) box downsample for 4:2:2; width must be even."""
    return np.floor((plane[:, 0::2] + plane[:, 1::2]) / 2.0 + 0.5)


def _box_down_v(plane: np.ndarray) -> np.ndarray:
    """Frozen 1x2 (vertical) box downsample for 4:4:0; height must be even."""
    return np.floor((plane[0::2, :] + plane[1::2, :]) / 2.0 + 0.5)


def encode_jpeg(arr: np.ndarray, *, quality: int = 100,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """Encode (h, w) or (h, w, 1) grayscale / (h, w, 3) RGB uint8 to
    baseline JFIF.  ``quality=100`` (all-ones quant tables) round-trips
    constant-fill images exactly — the oracle contract (it holds for
    ``subsampling="420"`` too: a constant plane box-downsamples and
    replication-upsamples to itself).  ``restart_interval`` > 0 emits a
    DRI segment and RSTn markers every that-many MCUs (byte-aligned,
    DC predictors reset — T.81 E.2.4), the layout real-world encoders
    use for error resilience."""
    if subsampling not in ("444", "420", "422", "440"):
        raise ValueError("subsampling must be '444', '420', '422' or '440'")
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg supports 1 or 3 channels")
    if arr.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8")
    color = nc == 3
    subsampled = color and subsampling != "444"
    if color:
        ycc = _rgb_to_ycbcr(arr)
        planes = [ycc[..., i] for i in range(3)]
    else:
        planes = [arr[:, :, 0].astype(np.float64)]
    # per-component sampling factors (hi, vi) and the chroma downsampler:
    # 4:2:0 = luma 2x2, 4:2:2 = luma 2x1 (horizontal), 4:4:0 = luma 1x2
    _SUB = {"420": ((2, 2), _box_down2), "422": ((2, 1), _box_down_h),
            "440": ((1, 2), _box_down_v)}
    samps = [(1, 1)] * len(planes) if not subsampled \
        else [_SUB[subsampling][0], (1, 1), (1, 1)]
    if subsampled:
        # pad full-res planes to the full MCU grid FIRST (edge-replicate),
        # then box-downsample chroma — every chroma sample is the mean of a
        # complete cell, and all block grids align exactly
        (lh, lv), down = _SUB[subsampling]
        ph, pw = -h % (8 * lv), -w % (8 * lh)
        if ph or pw:
            planes = [np.pad(p, ((0, ph), (0, pw)), mode="edge")
                      for p in planes]
        planes = [planes[0], down(planes[1]), down(planes[2])]
    sub420 = subsampled  # MCU-interleaved encode path below

    qtables = [_scaled_quant(_QUANT_LUMA, quality)]
    if color:
        qtables.append(_scaled_quant(_QUANT_CHROMA, quality))

    out = bytearray()
    out += b"\xff\xd8"                                   # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" \
        + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    for tid, qt in enumerate(qtables):                   # DQT
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) \
            + bytes(int(x) for x in qt.reshape(-1)[_ZIG])
    # SOF0
    samp_byte = [(hi << 4) | vi for hi, vi in samps]
    comps = [(1, samp_byte[0], 0)] if not color else \
        [(1, samp_byte[0], 0), (2, samp_byte[1], 1), (3, samp_byte[2], 1)]
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * len(comps), 8, h, w,
                                     len(comps))
    for cid, samp, tq in comps:
        out += bytes([cid, samp, tq])
    # DHT
    huff_specs = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
    if color:
        huff_specs += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    for tc_th, (bits, symbols) in huff_specs:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(symbols)) \
            + bytes([tc_th]) + bytes(bits) + bytes(symbols)
    if restart_interval:                                 # DRI
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    scomp = [(1, 0x00)] if not color else [(1, 0x00), (2, 0x11), (3, 0x11)]
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(scomp), len(scomp))
    for cid, tabs in scomp:
        out += bytes([cid, tabs])
    out += bytes([0, 63, 0])

    dc_tabs = [_huff_codes(*_DC_LUMA)]
    ac_tabs = [_huff_codes(*_AC_LUMA)]
    if color:
        dc_tabs.append(_huff_codes(*_DC_CHROMA))
        ac_tabs.append(_huff_codes(*_AC_CHROMA))

    # DCT + quantize each plane up front (vectorized over blocks)
    qplanes, nbxs = [], []
    for ci, plane in enumerate(planes):
        blk, nby, nbx = _blocks(plane - 128.0)
        coef = np.einsum("ij,njk,lk->nil", _C, blk, _C, optimize=True)
        qt = qtables[min(ci, len(qtables) - 1)].astype(np.float64)
        q = np.floor(coef / qt + 0.5).astype(np.int32)
        qplanes.append(q.reshape(-1, 64)[:, _ZIG])
        nbxs.append(nbx)

    bw = _BitWriter()
    prev = [0] * len(planes)
    if sub420:
        # MCU-interleaved: per MCU, the luma's hi*vi blocks in T.81 raster
        # order (v outer, h inner), then one Cb and one Cr block
        mcux = nbxs[1]
        n_mcu = qplanes[1].shape[0]
    else:
        mcux = 0
        n_mcu = qplanes[0].shape[0]
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()                                   # byte-align, then
            out += bw.out                                # RSTn, DC reset
            bw = _BitWriter()
            out += bytes([0xFF,
                          0xD0 + ((m // restart_interval - 1) % 8)])
            prev = [0] * len(planes)
        if not sub420:
            for ci in range(len(planes)):
                ti = min(ci, len(dc_tabs) - 1)
                prev[ci] = _encode_plane_blocks(
                    qplanes[ci][m], prev[ci], dc_tabs[ti], ac_tabs[ti], bw)
        else:
            my, mx = divmod(m, mcux)
            for ci, (hi, vi) in enumerate(samps):
                ti = min(ci, len(dc_tabs) - 1)
                for v in range(vi):
                    for u in range(hi):
                        bidx = (my * vi + v) * nbxs[ci] + (mx * hi + u)
                        prev[ci] = _encode_plane_blocks(
                            qplanes[ci][bidx], prev[ci],
                            dc_tabs[ti], ac_tabs[ti], bw)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"                                   # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------

class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        b = self.data[self.pos]
        v = (b >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return v

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _split_entropy(raw: bytes) -> list[bytes]:
    """Split one scan's raw entropy-coded bytes on TRUE RSTn markers
    (T.81 E.2.4), honoring FF00 byte stuffing (a stuffed FF is data, so
    splitting must happen BEFORE unstuffing — otherwise a literal 0xFF
    followed by a 0xD0..0xD7 data byte would fake a marker).  Validates
    the D0..D7 modulo-8 marker cycle; returns unstuffed segments."""
    segs: list[bytes] = []
    start = i = 0
    n = len(raw)
    while i < n - 1:
        if raw[i] == 0xFF:
            nxt = raw[i + 1]
            if nxt == 0x00:
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                if nxt - 0xD0 != len(segs) % 8:
                    raise ValueError(
                        f"restart marker out of sequence: got RST{nxt - 0xD0}"
                        f", expected RST{len(segs) % 8}")
                segs.append(raw[start:i].replace(b"\xff\x00", b"\xff"))
                i += 2
                start = i
                continue
        i += 1
    segs.append(raw[start:].replace(b"\xff\x00", b"\xff"))
    return segs


def _huff_decode_map(bits: list[int], symbols: list[int]
                     ) -> dict[tuple[int, int], int]:
    m: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            m[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return m


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code in entropy stream")


def _extend(v: int, cat: int) -> int:
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline (SOF0) or progressive (SOF2) JFIF (sampling factors
    up to 2x2: 4:4:4, 4:2:0, 4:2:2, 4:4:0) to (h, w, channels) uint8
    (channels 1 or 3); subsampled chroma upsamples by sample replication
    (the frozen contract).  Progressive streams accumulate coefficients
    over every scan (spectral selection + successive approximation, DC/AC
    first and refinement passes) and IDCT once.  Restart intervals
    (DRI + RSTn, T.81 E.2.4) are honored: DC predictors (and progressive
    EOB runs) reset at every marker, with the D0..D7 cycle validated.
    Raises NotImplementedError on >2x-sampling / arithmetic streams
    (outside the documented subset)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = 0
    comps: list[tuple[int, int, int]] = []   # (cid, sampling, tq)
    scan_tabs: list[tuple[int, int]] = []    # (dc table id, ac table id)
    scan_segs: list[bytes] = []              # entropy split on RSTn markers
    scan_ri = 0                              # restart interval live at SOS
    ri = 0                                   # current DRI value
    progressive = False
    # every SOS of a progressive stream: (component ids, table ids, Ss, Se,
    # Ah, Al, entropy bytes, huff-table snapshot — DHT may be redefined
    # between scans, so each scan decodes with the tables live at ITS SOS)
    scans: list[tuple] = []
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:                   # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue                         # standalone markers
        seglen = struct.unpack_from(">H", data, pos)[0]
        body = data[pos + 2: pos + seglen]
        pos += seglen
        if marker == 0xDB:                   # DQT (possibly several tables)
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                vals = np.frombuffer(body, np.uint8, 64, off + 1)
                tbl = np.zeros(64, np.int32)
                tbl[_ZIG] = vals
                qtables[tq] = tbl.reshape(8, 8)
                off += 65
        elif marker in (0xC0, 0xC2):         # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            _prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for i in range(nc):
                cid, samp, tq = body[6 + 3 * i: 9 + 3 * i]
                hi, vi = samp >> 4, samp & 0xF
                if not (1 <= hi <= 2 and 1 <= vi <= 2):
                    raise NotImplementedError(
                        f"sampling factors {hi}x{vi} not supported "
                        "(1..2 each)")
                comps.append((cid, samp, tq))
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline (SOF0) and progressive (SOF2) supported, "
                f"got SOF marker 0x{marker:02x}")
        elif marker == 0xC4:                 # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1: off + 17])
                n = sum(bits)
                symbols = list(body[off + 17: off + 17 + n])
                huff[(tc, th)] = _huff_decode_map(bits, symbols)
                off += 17 + n
        elif marker == 0xDD:                 # DRI: MCUs between RSTn markers
            ri = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:                 # SOS
            ns = body[0]
            scan_tabs = []
            scan_cids = []
            for i in range(ns):
                cid, tabs = body[1 + 2 * i], body[2 + 2 * i]
                scan_cids.append(cid)
                scan_tabs.append((tabs >> 4, tabs & 0xF))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahl = body[3 + 2 * ns]
            # entropy data runs to the next real marker (unstuff FF00)
            end = pos
            while end < len(data) - 1:
                if data[end] == 0xFF and data[end + 1] not in (0x00,) \
                        and not (0xD0 <= data[end + 1] <= 0xD7):
                    break
                end += 1
            scan_segs = _split_entropy(data[pos:end])
            scan_ri = ri
            pos = end
            scans.append((scan_cids, scan_tabs, ss, se, ahl >> 4, ahl & 0xF,
                          scan_segs, dict(huff), ri))
        # APPn/COM and anything else: skipped via seglen

    if not comps or not scan_segs or not any(scan_segs):
        raise ValueError("truncated JPEG (no SOF/SOS)")
    nc = len(comps)
    samps = [((s >> 4), (s & 0xF)) for _, s, _ in comps]
    # T.81 A.2: a SINGLE-component scan is non-interleaved — raster order
    # over ceil(w/8) x ceil(h/8) blocks with NO MCU padding, regardless of
    # the declared sampling factors (with one component only the RATIO
    # hi/hmax = vi/vmax = 1 matters, A.1.1).  Normalizing to 1x1 makes the
    # MCU walk below degenerate to exactly that raster order, so a
    # conforming grayscale stream declaring 2x2 decodes correctly instead
    # of raising (the pre-r5 behavior) or garbling.
    if nc == 1:
        samps = [(1, 1)]
    hmax = max(hi for hi, _ in samps)
    vmax = max(vi for _, vi in samps)
    # MCU grid covers the image at full resolution; component ci owns a
    # (mcuy*vi, mcux*hi) block grid
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [np.zeros((mcuy * vi * 8, mcux * hi * 8), np.float64)
              for hi, vi in samps]
    br = _BitReader(scan_segs[0])
    prev = [0] * nc

    def _decode_block(ci: int) -> np.ndarray:
        dc_t = huff[(0, scan_tabs[ci][0])]
        ac_t = huff[(1, scan_tabs[ci][1])]
        zz = np.zeros(64, np.int64)
        cat = _read_symbol(br, dc_t)
        diff = _extend(br.read_bits(cat), cat) if cat else 0
        prev[ci] += diff
        zz[0] = prev[ci]
        k = 1
        while k < 64:
            sym = _read_symbol(br, ac_t)
            if sym == 0x00:              # EOB
                break
            run, cat = sym >> 4, sym & 0xF
            if cat == 0:
                if run != 15:
                    raise ValueError("bad AC symbol")
                k += 16                  # ZRL
                continue
            k += run
            if k > 63:
                raise ValueError("AC index overflow")
            zz[k] = _extend(br.read_bits(cat), cat)
            k += 1
        qt = qtables[comps[ci][2]].astype(np.float64)
        block = np.zeros(64, np.float64)
        block[_ZIG] = zz
        coef = block.reshape(8, 8) * qt
        return _C.T @ coef @ _C + 128.0

    if progressive:
        planes = _decode_progressive_planes(
            comps, samps, scans, qtables, h, w, mcux, mcuy, hmax, vmax)
    else:
        for m in range(mcuy * mcux):
            if scan_ri and m and m % scan_ri == 0:
                seg = m // scan_ri           # restart: next entropy segment,
                if seg >= len(scan_segs):    # fresh byte alignment, DC reset
                    raise ValueError("missing restart marker segment")
                br = _BitReader(scan_segs[seg])
                prev = [0] * nc
            my, mx = divmod(m, mcux)
            for ci, (hi, vi) in enumerate(samps):
                # T.81 interleave order within the MCU: v outer, h inner
                for v in range(vi):
                    for u in range(hi):
                        by, bx = my * vi + v, mx * hi + u
                        planes[ci][by * 8:(by + 1) * 8,
                                   bx * 8:(bx + 1) * 8] = _decode_block(ci)
    # integer samples first, then replication-upsample subsampled
    # components to full resolution (the frozen contract), then crop
    full = []
    for ci, (hi, vi) in enumerate(samps):
        p = np.clip(np.floor(planes[ci] + 0.5), 0, 255)
        if vi < vmax:
            p = np.repeat(p, vmax // vi, axis=0)
        if hi < hmax:
            p = np.repeat(p, hmax // hi, axis=1)
        full.append(p[:h, :w])
    if nc == 1:
        return full[0].astype(np.uint8)[:, :, None]
    rgb = _ycbcr_to_rgb(np.stack(full, axis=-1))
    return rgb.astype(np.uint8)


# --------------------------------------------------------------------------
# progressive (SOF2) decoding — T.81 G.1.2: spectral selection +
# successive approximation, DC/AC first and refinement passes
# --------------------------------------------------------------------------

def _decode_progressive_planes(comps, samps, scans, qtables, h, w,
                               mcux, mcuy, hmax, vmax) -> list[np.ndarray]:
    """Accumulate dequantization-domain coefficients over every scan, then
    dequantize + IDCT once.  Interleaved scans (DC, multi-component) walk
    the MCU grid; single-component scans are NON-interleaved (T.81 A.2):
    raster order over the component's OWN ceil(dim/8) block grid, no MCU
    padding — blocks land in the top-left of the padded grid."""
    nc = len(comps)
    nbx = [mcux * hi for hi, _ in samps]
    nby = [mcuy * vi for _, vi in samps]
    # zigzag-order coefficient accumulator, one row per padded-grid block
    coefs = [np.zeros((nby[ci] * nbx[ci], 64), np.int32) for ci in range(nc)]
    # non-interleaved grids: ceil(ceil(dim * sampling / max) / 8)
    sbx = [(-(-(w * hi) // hmax) + 7) // 8 for hi, _ in samps]
    sby = [(-(-(h * vi) // vmax) + 7) // 8 for _, vi in samps]
    cid_to_ix = {cid: i for i, (cid, _, _) in enumerate(comps)}

    for scan_cids, stabs, ss, se, ah, al, segs, tabs, ri in scans:
        cix = [cid_to_ix[c] for c in scan_cids]
        br = _BitReader(segs[0])

        def _restart(unit_ix, bpu=1):
            """At every ri decode units: next entropy segment (fresh byte
            alignment); caller resets its DC predictors / EOB run.  A unit
            is an MCU (DC interleaved) or a block (non-interleaved)."""
            nonlocal br
            seg = unit_ix // ri
            if seg >= len(segs):
                raise ValueError("missing restart marker segment")
            br = _BitReader(segs[seg])

        if ss == 0:                                   # DC scan
            if se != 0:
                raise ValueError("DC scan must have Se == 0")
            if len(cix) > 1:                          # interleaved MCU walk
                bpm = sum(samps[ci][0] * samps[ci][1] for ci in cix)
                order = []
                for m in range(mcuy * mcux):
                    my, mx = divmod(m, mcux)
                    for j, ci in enumerate(cix):
                        hi, vi = samps[ci]
                        for v in range(vi):
                            for u in range(hi):
                                order.append(
                                    (j, ci,
                                     (my * vi + v) * nbx[ci] + mx * hi + u))
            else:                                     # non-interleaved
                bpm = 1
                ci = cix[0]
                order = [(0, ci, by * nbx[ci] + bx)
                         for by in range(sby[ci]) for bx in range(sbx[ci])]
            if ah == 0:                               # first DC pass
                pred = [0] * len(cix)
                for i, (j, ci, b) in enumerate(order):
                    if ri and i and i % (ri * bpm) == 0:
                        _restart(i // bpm)
                        pred = [0] * len(cix)
                    dc_t = tabs[(0, stabs[j][0])]
                    cat = _read_symbol(br, dc_t)
                    diff = _extend(br.read_bits(cat), cat) if cat else 0
                    pred[j] += diff
                    coefs[ci][b, 0] = pred[j] << al
            else:                                     # DC refinement: 1 bit
                p1 = np.int32(1 << al)
                for i, (_j, ci, b) in enumerate(order):
                    if ri and i and i % (ri * bpm) == 0:
                        _restart(i // bpm)
                    if br.read_bit():
                        coefs[ci][b, 0] |= p1
            continue

        # AC scan: T.81 G.1.1 — always single-component, non-interleaved
        if len(cix) != 1:
            raise ValueError("progressive AC scan must be single-component")
        ci = cix[0]
        ac_t = tabs[(1, stabs[0][1])]
        eobrun = 0
        p1, m1 = 1 << al, -(1 << al)
        blocks = [by * nbx[ci] + bx
                  for by in range(sby[ci]) for bx in range(sbx[ci])]
        for i, bi in enumerate(blocks):
                if ri and i and i % ri == 0:
                    _restart(i)
                    eobrun = 0                        # runs never cross RSTn
                cf = coefs[ci][bi]
                if ah == 0:                           # first AC pass
                    if eobrun:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = _read_symbol(br, ac_t)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:               # ZRL
                                k += 16
                                continue
                            eobrun = (1 << r) - 1     # EOBn: this block done
                            if r:
                                eobrun += br.read_bits(r)
                            break
                        k += r
                        if k > se:
                            raise ValueError("AC index overflow")
                        cf[k] = _extend(br.read_bits(s), s) << al
                        k += 1
                else:                                 # AC refinement pass
                    k = ss
                    if eobrun == 0:
                        while k <= se:
                            rs = _read_symbol(br, ac_t)
                            r, s = rs >> 4, rs & 0xF
                            s_val = 0
                            if s == 0:
                                if r != 15:           # EOBn (rest via tail)
                                    eobrun = 1 << r
                                    if r:
                                        eobrun += br.read_bits(r)
                                    break
                                # r == 15: ZRL — skip 16 zero-history coefs
                            else:
                                if s != 1:
                                    raise ValueError(
                                        "refinement coefficient must be +-1")
                                s_val = p1 if br.read_bit() else m1
                            # advance over coefficients: correction bit for
                            # each nonzero-history coef passed; r counts
                            # zero-history skips
                            while k <= se:
                                if cf[k]:
                                    if br.read_bit() and not (cf[k] & p1):
                                        cf[k] += p1 if cf[k] >= 0 else m1
                                else:
                                    if r == 0:
                                        break
                                    r -= 1
                                k += 1
                            if s_val and k <= se:
                                cf[k] = s_val
                            k += 1
                    if eobrun > 0:                    # EOB-run tail: only
                        while k <= se:                # correction bits
                            if cf[k]:
                                if br.read_bit() and not (cf[k] & p1):
                                    cf[k] += p1 if cf[k] >= 0 else m1
                            k += 1
                        eobrun -= 1

    # dequantize + IDCT every component in one vectorized pass
    planes = []
    for ci, (hi, vi) in enumerate(samps):
        qt = qtables[comps[ci][2]].astype(np.float64)
        zz = coefs[ci].astype(np.float64)
        bl = np.zeros((zz.shape[0], 64), np.float64)
        bl[:, _ZIG] = zz
        coef = bl.reshape(-1, 8, 8) * qt
        px = np.einsum("ji,njk,kl->nil", _C, coef, _C, optimize=True) + 128.0
        plane = px.reshape(nby[ci], nbx[ci], 8, 8).transpose(0, 2, 1, 3) \
            .reshape(nby[ci] * 8, nbx[ci] * 8)
        planes.append(plane)
    return planes


# --------------------------------------------------------------------------
# progressive (SOF2) encoder — T.81 G.1.2 first + refinement passes.
# Validates the decoder (and documents the scan protocol); scope is
# 4:4:4 / 4:2:0 / 4:2:2 / 4:4:0 / grayscale with per-scan generated
# Huffman tables.
# --------------------------------------------------------------------------

def _canonical_table(symbols: set[int]) -> tuple[list[int], list[int]]:
    """Equal-length canonical Huffman table over the given symbol set:
    every symbol gets length L = bit_length(n), so n < 2**L and the
    all-ones code stays unassigned (never collides with byte-pad 1s).
    Compression is not the goal — spec-conformance is."""
    syms = sorted(symbols)
    n = len(syms)
    if not n:
        return [0] * 16, []
    ln = max(1, n.bit_length())
    bits = [0] * 16
    bits[ln - 1] = n
    return bits, syms


def _sig_shift(v: int, al: int) -> int:
    """T.81 G.1.2.2 AC point transform: magnitude shift, sign kept."""
    return (v >> al) if v >= 0 else -((-v) >> al)


def encode_jpeg_progressive(arr: np.ndarray, *, quality: int = 100,
                            script: list[tuple] | None = None,
                            subsampling: str = "444",
                            restart_interval: int = 0) -> bytes:
    """Encode grayscale / RGB uint8 to PROGRESSIVE JFIF (SOF2): spectral
    selection + successive approximation; 4:4:4 (default), 4:2:0, 4:2:2
    or 4:4:0 chroma subsampling.  ``script`` is a list of
    ``(component_indexes, Ss, Se, Ah, Al)`` scans; the default exercises
    interleaved DC first+refine and AC first+refine passes (the shape
    libjpeg emits).  Huffman tables are generated per scan (DHT between
    scans, as real progressive files do).  Per T.81: multi-component
    (DC) scans walk the MCU grid; single-component scans are
    non-interleaved over the component's OWN ceil(dim/8) grid — edge
    padding blocks beyond it carry DC only, which the crop discards.
    ``restart_interval`` > 0 emits DRI + RSTn every that-many MCUs in
    EVERY scan (each scan's DC predictors / EOB runs reset per T.81
    E.2.4; Huffman tables still cover the whole scan)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg_progressive supports 1 or 3 channels")
    if arr.dtype != np.uint8:
        raise ValueError("encode_jpeg_progressive expects uint8")
    if subsampling not in ("444", "420", "422", "440"):
        raise ValueError("subsampling must be '444', '420', '422' or '440'")
    color = nc == 3
    subsampled = color and subsampling != "444"
    if color:
        ycc = _rgb_to_ycbcr(arr)
        planes = [ycc[..., i] for i in range(3)]
    else:
        planes = [arr[:, :, 0].astype(np.float64)]
    _SUB = {"420": ((2, 2), _box_down2), "422": ((2, 1), _box_down_h),
            "440": ((1, 2), _box_down_v)}
    samps = [(1, 1)] * len(planes) if not subsampled \
        else [_SUB[subsampling][0], (1, 1), (1, 1)]
    if subsampled:
        (lh, lv), down = _SUB[subsampling]
        ph, pw = -h % (8 * lv), -w % (8 * lh)
        if ph or pw:
            planes = [np.pad(p, ((0, ph), (0, pw)), mode="edge")
                      for p in planes]
        planes = [planes[0], down(planes[1]), down(planes[2])]
    qtables = [_scaled_quant(_QUANT_LUMA, quality)]
    if color:
        qtables.append(_scaled_quant(_QUANT_CHROMA, quality))
    qplanes, nbx, nby = [], [], []
    for ci, plane in enumerate(planes):
        blk, by, bx = _blocks(plane - 128.0)
        coef = np.einsum("ij,njk,lk->nil", _C, blk, _C, optimize=True)
        qt = qtables[min(ci, len(qtables) - 1)].astype(np.float64)
        q = np.floor(coef / qt + 0.5).astype(np.int32)
        qplanes.append(q.reshape(-1, 64)[:, _ZIG])
        nbx.append(bx)
        nby.append(by)
    hmax = max(hi for hi, _ in samps)
    vmax = max(vi for _, vi in samps)
    mcux, mcuy = nbx[0] // samps[0][0], nby[0] // samps[0][1]
    # non-interleaved (single-component) scan grids: NO MCU padding
    sbx = [(-(-(w * hi) // hmax) + 7) // 8 for hi, _ in samps]
    sby = [(-(-(h * vi) // vmax) + 7) // 8 for _, vi in samps]

    def dc_order(comp_ix):
        if len(comp_ix) == 1:
            ci = comp_ix[0]
            return [(0, ci, by * nbx[ci] + bx)
                    for by in range(sby[ci]) for bx in range(sbx[ci])]
        order = []
        for m in range(mcuy * mcux):
            my, mx = divmod(m, mcux)
            for j, ci in enumerate(comp_ix):
                hi, vi = samps[ci]
                for v in range(vi):
                    for u in range(hi):
                        order.append(
                            (j, ci, (my * vi + v) * nbx[ci] + mx * hi + u))
        return order

    def ac_blocks(ci):
        return [by * nbx[ci] + bx
                for by in range(sby[ci]) for bx in range(sbx[ci])]

    if script is None:
        script = [(list(range(nc)), 0, 0, 0, 1)]          # DC first
        script += [([0], 1, 5, 0, 2), ([0], 6, 63, 0, 2)]  # luma AC coarse
        if color:
            script += [([1], 1, 63, 0, 1), ([2], 1, 63, 0, 1)]
        script += [([0], 1, 63, 2, 1)]                    # luma AC refine 2->1
        script += [(list(range(nc)), 0, 0, 1, 0)]         # DC refine
        script += [([0], 1, 63, 1, 0)]                    # luma AC refine 1->0
        if color:
            script += [([1], 1, 63, 1, 0), ([2], 1, 63, 1, 0)]

    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" \
        + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    for tid, qt in enumerate(qtables):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) \
            + bytes(int(x) for x in qt.reshape(-1)[_ZIG])
    samp_b = [(hi << 4) | vi for hi, vi in samps]
    comps = [(1, samp_b[0], 0)] if not color else \
        [(1, samp_b[0], 0), (2, samp_b[1], 1), (3, samp_b[2], 1)]
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for cid, samp, tq in comps:
        out += bytes([cid, samp, tq])
    if restart_interval:                                  # DRI
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    for comp_ix, ss, se, ah, al in script:
        order = dc_order(comp_ix) if ss == 0 else ac_blocks(comp_ix[0])
        # restart chunking: ri counts MCUs for interleaved DC scans (bpm
        # blocks each), blocks for non-interleaved scans; each chunk is
        # encoded with fresh DC predictors / EOB runs (chunks never share
        # either — _encode_prog_scan starts clean per call)
        bpm = sum(samps[ci][0] * samps[ci][1] for ci in comp_ix) \
            if (ss == 0 and len(comp_ix) > 1) else 1
        step = restart_interval * bpm if restart_interval else len(order)
        chunks = [order[i:i + step] for i in range(0, len(order), step)] \
            or [[]]
        ops_chunks = [_encode_prog_scan(qplanes, comp_ix, ss, se, ah, al, c)
                      for c in chunks]
        # per-scan tables: one DC (tc=0) + one AC (tc=1), th=0, from the
        # union of symbols this scan emits (across all restart chunks)
        for tc in (0, 1):
            syms = {b for oc in ops_chunks for kind, a, b in oc
                    if kind == "s" and a == tc}
            if not syms:
                continue
            bits, symbols = _canonical_table(syms)
            out += b"\xff\xc4" + struct.pack(">H", 19 + len(symbols)) \
                + bytes([tc << 4]) + bytes(bits) + bytes(symbols)
            if tc == 0:
                dc_codes = _huff_codes(bits, symbols)
            else:
                ac_codes = _huff_codes(bits, symbols)
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comp_ix),
                                         len(comp_ix))
        for ci in comp_ix:
            out += bytes([comps[ci][0], 0x00])
        out += bytes([ss, se, (ah << 4) | al])
        for k, oc in enumerate(ops_chunks):
            if k:                                         # RSTn between
                out += bytes([0xFF, 0xD0 + ((k - 1) % 8)])
            bw = _BitWriter()
            for kind, a, b in oc:
                if kind == "s":
                    code, ln = (dc_codes if a == 0 else ac_codes)[b]
                    bw.put(code, ln)
                else:
                    bw.put(a, b)
            bw.flush()
            out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _encode_prog_scan(qplanes, comp_ix, ss, se, ah, al,
                      order) -> list[tuple]:
    """One scan's entropy stream as ops: ("s", tc, symbol) huffman symbol,
    ("b", value, nbits) raw bits.  Mirrors T.81 G.1.2 (the libjpeg
    encode_mcu_DC/AC first/refine structure).  ``order`` is the block
    visit order the matching decoder walks: ``(j, ci, block)`` tuples for
    DC scans (interleaved MCU walk, or the component's own raster for a
    single-component scan); bare block indexes for AC scans."""
    ops: list[tuple] = []
    if ss == 0:                                           # DC scan
        if ah == 0:
            pred = [0] * len(comp_ix)
            for j, ci, b in order:
                v = int(qplanes[ci][b][0]) >> al          # arithmetic shift
                diff = v - pred[j]
                pred[j] = v
                cat = _category(diff)
                ops.append(("s", 0, cat))
                if cat:
                    ops.append(("b", _amplitude(diff, cat), cat))
        else:                                             # DC refine: raw bit
            for _j, ci, b in order:
                ops.append(("b", (int(qplanes[ci][b][0]) >> al) & 1, 1))
        return ops

    (ci,) = comp_ix                                       # AC: one component
    if ah == 0:                                           # AC first pass
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                ops.append(("s", 1, r << 4))
                if r:
                    ops.append(("b", eobrun - (1 << r), r))
                eobrun = 0

        for m in order:
            band = [_sig_shift(int(v), al)
                    for v in qplanes[ci][m][ss:se + 1]]
            if not any(band):
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            r = 0
            for t in band:
                if t == 0:
                    r += 1
                    continue
                while r > 15:
                    ops.append(("s", 1, 0xF0))            # ZRL
                    r -= 16
                cat = _category(t)
                ops.append(("s", 1, (r << 4) | cat))
                ops.append(("b", _amplitude(t, cat), cat))
                r = 0
            if r:                                         # trailing zeros
                eobrun += 1
        flush_eob()
        return ops

    # AC refinement pass (Ah = Al + 1): newly-nonzero coefs have |v|>>Al == 1
    eobrun = 0
    bbuf: list[int] = []                                  # bits behind EOBn

    def flush_eob_r():
        nonlocal eobrun, bbuf
        if eobrun:
            r = eobrun.bit_length() - 1
            ops.append(("s", 1, r << 4))
            if r:
                ops.append(("b", eobrun - (1 << r), r))
            eobrun = 0
        for bit in bbuf:
            ops.append(("b", bit, 1))
        bbuf = []

    for m in order:
        vals = [int(v) for v in qplanes[ci][m][ss:se + 1]]
        absv = [abs(v) >> al for v in vals]
        eob = max((i for i, t in enumerate(absv) if t == 1), default=-1)
        r = 0
        br_bits: list[int] = []                           # this block's
        for i, t in enumerate(absv):                      # pending corrections
            if t == 0:
                r += 1
                continue
            while r > 15 and i <= eob:
                flush_eob_r()
                ops.append(("s", 1, 0xF0))                # ZRL
                r -= 16
                for bit in br_bits:
                    ops.append(("b", bit, 1))
                br_bits = []
            if t > 1:                                     # history coef:
                br_bits.append(t & 1)                     # correction bit
                continue
            flush_eob_r()                                 # newly nonzero
            ops.append(("s", 1, (r << 4) | 1))
            ops.append(("b", 1 if vals[i] >= 0 else 0, 1))
            for bit in br_bits:
                ops.append(("b", bit, 1))
            br_bits = []
            r = 0
        if r > 0 or br_bits:                              # block joins EOB run
            eobrun += 1
            bbuf.extend(br_bits)
            if eobrun == 0x7FFF or len(bbuf) > 900:
                flush_eob_r()
    flush_eob_r()
    return ops
