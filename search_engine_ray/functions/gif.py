"""Pure stdlib/numpy GIF codec (GIF87a/GIF89a, CompuServe spec +
RFC-referenced LZW as documented publicly in the GIF89a specification).

Same role as :mod:`.png` / :mod:`.jpeg`: a REAL codec for the multimodal
decode stage — no PIL in this environment.  Supported subset:

* decode: single-frame (first image block of an animation), global or
  local color table, GIF87a and GIF89a magic, all extension blocks
  skipped (GCE/comment/application), LZW with variable code width up to
  12 bits, deferred clear codes, the KwKwK special case, and mid-stream
  dictionary resets.  Interlaced images raise ``NotImplementedError``
  loudly (same contract as the JPEG codec's documented seams).
* encode: single-frame GIF89a with a global color table, non-interlaced,
  real variable-width LZW (initial clear code, width growth at
  ``next_code == 1 << width``, table reset at 4096 entries).

The LZW inner loops are per-CODE Python — codecs are inherently
sequential per payload; parallelism comes from the DecodeImage actor
pool fanning payloads across workers, exactly like the JPEG path.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE_WIDTH = 12
_TABLE_LIMIT = 1 << _MAX_CODE_WIDTH  # 4096


# ---------------------------------------------------------------- decode

def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate GIF data sub-blocks starting at ``pos``; return
    (payload, position after the 0x00 terminator)."""
    chunks = []
    while True:
        if pos >= len(data):
            raise ValueError("gif: truncated sub-block stream")
        n = data[pos]
        pos += 1
        if n == 0:
            break
        chunks.append(data[pos:pos + n])
        if len(chunks[-1]) != n:
            raise ValueError("gif: truncated sub-block")
        pos += n
    return b"".join(chunks), pos


def _lzw_decode(payload: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF LZW: LSB-first bit packing, clear/EOI codes, width growth when
    the next free slot crosses a power of two, 12-bit cap with deferred
    clear.  Returns exactly ``n_pixels`` uint8 indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    # bit cursor over the payload (numpy unpack would copy 8x; a manual
    # cursor reads each code in O(1) from a little-endian accumulator)
    acc = 0
    acc_bits = 0
    byte_pos = 0
    n_bytes = len(payload)

    def next_code(width: int) -> int:
        nonlocal acc, acc_bits, byte_pos
        while acc_bits < width:
            if byte_pos >= n_bytes:
                raise ValueError("gif: LZW stream ended before EOI")
            acc |= payload[byte_pos] << acc_bits
            byte_pos += 1
            acc_bits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        acc_bits -= width
        return code

    out = np.empty(n_pixels, np.uint8)
    n_out = 0
    # dictionary: entry -> (prefix entry | -1, last symbol, length)
    prefix = np.empty(_TABLE_LIMIT, np.int32)
    suffix = np.empty(_TABLE_LIMIT, np.uint8)
    length = np.empty(_TABLE_LIMIT, np.int32)
    scratch = np.empty(_TABLE_LIMIT, np.uint8)

    def reset_table():
        for i in range(clear):
            prefix[i] = -1
            suffix[i] = i
            length[i] = 1
        return eoi + 1, min_code_size + 1

    next_free, width = reset_table()
    prev = -1
    while n_out < n_pixels:
        code = next_code(width)
        if code == clear:
            next_free, width = reset_table()
            prev = -1
            continue
        if code == eoi:
            break
        if prev == -1:
            if code >= clear:
                raise ValueError("gif: first code after clear not a literal")
            out[n_out] = code
            n_out += 1
            prev = code
            continue
        if code < next_free and code != eoi:
            entry = code
        elif code == next_free:
            entry = -2  # KwKwK: prev + first symbol of prev
        else:
            raise ValueError(f"gif: LZW code {code} beyond table")
        # first symbol of the expansion we are about to emit
        if entry == -2:
            # expand prev, then append its first symbol
            n = length[prev]
            e = prev
            for i in range(n - 1, -1, -1):
                scratch[i] = suffix[e]
                e = prefix[e]
            scratch[n] = scratch[0]
            n += 1
        else:
            n = length[entry]
            e = entry
            for i in range(n - 1, -1, -1):
                scratch[i] = suffix[e]
                e = prefix[e]
        if n_out + n > n_pixels:
            raise ValueError("gif: LZW expands past the pixel count")
        out[n_out:n_out + n] = scratch[:n]
        n_out += n
        # add prev + first-symbol-of-current to the table
        if next_free < _TABLE_LIMIT:
            prefix[next_free] = prev
            suffix[next_free] = scratch[0]
            length[next_free] = length[prev] + 1
            next_free += 1
            if next_free < _TABLE_LIMIT and next_free == (1 << width):
                width += 1
        prev = code if entry != -2 else next_free - 1
    if n_out != n_pixels:
        raise ValueError(f"gif: decoded {n_out} of {n_pixels} pixels")
    return out


def decode_gif(data: bytes) -> np.ndarray:
    """Decode the FIRST image of a GIF87a/GIF89a stream to an
    ``(h, w, 3)`` uint8 RGB array (palette applied).  Raises loudly on
    interlaced images and malformed streams."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad magic")
    packed = data[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n_colors = 2 << (packed & 0x07)
        gct = np.frombuffer(data, np.uint8, n_colors * 3, pos) \
            .reshape(n_colors, 3)
        pos += n_colors * 3
    while pos < len(data):
        block = data[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, all skipped
            pos += 2
            _, pos = _read_subblocks(data, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"gif: unexpected block 0x{block:02x}")
        # image descriptor
        w, h = struct.unpack_from("<HH", data, pos + 5)
        ipacked = data[pos + 9]
        pos += 10
        if ipacked & 0x40:
            raise NotImplementedError("gif: interlaced images unsupported")
        table = gct
        if ipacked & 0x80:
            n_colors = 2 << (ipacked & 0x07)
            table = np.frombuffer(data, np.uint8, n_colors * 3, pos) \
                .reshape(n_colors, 3)
            pos += n_colors * 3
        if table is None:
            raise ValueError("gif: no color table for image")
        min_code_size = data[pos]
        pos += 1
        if not 2 <= min_code_size <= 11:
            raise ValueError(f"gif: bad LZW min code size {min_code_size}")
        payload, pos = _read_subblocks(data, pos)
        idx = _lzw_decode(payload, min_code_size, w * h)
        if int(idx.max(initial=0)) >= len(table):
            raise ValueError("gif: pixel index beyond color table")
        return table[idx.reshape(h, w)]
    raise ValueError("gif: no image block")


# ---------------------------------------------------------------- encode

class _BitWriter:
    """LSB-first bit packer for the LZW code stream."""

    __slots__ = ("acc", "acc_bits", "out")

    def __init__(self):
        self.acc = 0
        self.acc_bits = 0
        self.out = bytearray()

    def write(self, code: int, width: int):
        self.acc |= code << self.acc_bits
        self.acc_bits += width
        while self.acc_bits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.acc_bits -= 8

    def finish(self) -> bytes:
        if self.acc_bits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _BitWriter()

    def fresh():
        return {(-1, s): s for s in range(clear)}, eoi + 1, min_code_size + 1

    table, next_free, width = fresh()
    bw.write(clear, width)
    prev = -1
    for s in map(int, indices):
        key = (prev, s)
        cur = table.get(key)
        if cur is not None:
            prev = cur
            continue
        bw.write(prev, width)
        if next_free < _TABLE_LIMIT:
            table[key] = next_free
            next_free += 1
            if next_free <= _TABLE_LIMIT - 1 and next_free == (1 << width) + 1:
                width += 1
        else:
            bw.write(clear, width)
            table, next_free, width = fresh()
        prev = s
    if prev != -1:
        bw.write(prev, width)
    bw.write(eoi, width)
    return bw.finish()


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """Encode an ``(h, w)`` uint8 index array + ``(n, 3)`` uint8 palette
    as a single-frame, non-interlaced GIF89a with a global color table.
    ``n`` is padded up to the next power of two (>= 4, spec minimum for
    a 2-bit code)."""
    idx = np.ascontiguousarray(indices, np.uint8)
    if idx.ndim != 2:
        raise ValueError("encode_gif: indices must be (h, w)")
    pal = np.ascontiguousarray(palette, np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3 or not len(pal):
        raise ValueError("encode_gif: palette must be (n, 3)")
    if int(idx.max(initial=0)) >= len(pal):
        raise ValueError("encode_gif: index beyond palette")
    h, w = idx.shape
    bits = max(2, int(len(pal) - 1).bit_length())
    n_slots = 1 << bits
    table = np.zeros((n_slots, 3), np.uint8)
    table[:len(pal)] = pal
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0])
    out += table.tobytes()
    out += b"\x2C" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    min_code_size = bits
    out.append(min_code_size)
    payload = _lzw_encode(idx.reshape(-1), min_code_size)
    for i in range(0, len(payload), 255):
        chunk = payload[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3B"
    return bytes(out)
