"""GIF codec tests (functions/gif): LZW round trips, width-transition
and KwKwK coverage, a hand-packed bitstream vector that validates the
DECODER independently of the repo's own encoder, dictionary-reset
streams past 4096 entries, and the DecodeImage wiring."""

import numpy as np
import pyarrow as pa
import pytest

from search_engine_ray.functions.gif import decode_gif, encode_gif


def _rt(idx, pal):
    return decode_gif(encode_gif(idx, pal))


def test_roundtrip_constant_fill():
    """Constant indices are the classic LZW run chain (KwKwK on every
    step after the first)."""
    pal = np.array([[10, 20, 30], [200, 100, 50]], np.uint8)
    idx = np.zeros((7, 11), np.uint8)
    out = _rt(idx, pal)
    assert out.shape == (7, 11, 3)
    assert (out == pal[0]).all()


def test_roundtrip_checkerboard():
    pal = np.array([[0, 0, 0], [255, 255, 255], [9, 9, 9]], np.uint8)
    y, x = np.mgrid[0:13, 0:9]
    idx = ((x + y) % 2).astype(np.uint8)
    out = _rt(idx, pal)
    expect = pal[idx]
    assert (out == expect).all()


def test_roundtrip_fuzz_and_dictionary_reset():
    """Random 8-color images big enough (128x64 = 8192 symbols) that the
    encoder table passes 4096 entries and emits a mid-stream clear; the
    decoder must reset identically.  Several dims cover width
    transitions at every power of two."""
    rng = np.random.default_rng(13)
    pal = np.stack([np.arange(8) * 31 % 256,
                    np.arange(8) * 59 % 256,
                    np.arange(8) * 83 % 256], axis=1).astype(np.uint8)
    for h, w in [(1, 1), (3, 2), (16, 16), (128, 64)]:
        idx = rng.integers(0, 8, (h, w)).astype(np.uint8)
        out = _rt(idx, pal)
        assert (out == pal[idx]).all(), (h, w)


def test_roundtrip_256_colors():
    rng = np.random.default_rng(17)
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    idx = rng.integers(0, 256, (40, 30)).astype(np.uint8)
    out = _rt(idx, pal)
    assert (out == pal[idx]).all()


def _pack_lsb(codes):
    """Independent LSB-first bit packer (test-local reimplementation, so
    the decoder is checked against the SPEC, not the repo encoder)."""
    acc = bits = 0
    out = bytearray()
    for code, width in codes:
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_decoder_against_hand_built_stream():
    """A 2x2 image [[1,1],[0,0]] LZW-coded BY HAND per the GIF89a spec
    (min code size 2: clear=4, eoi=5; width starts at 3; adds 6,7,8;
    the add of 8 == 1<<3 bumps the width to 4 for the final codes)."""
    codes = [(4, 3), (1, 3), (1, 3), (0, 3), (0, 4), (5, 4)]
    payload = _pack_lsb(codes)
    pal = bytes([5, 6, 7, 50, 60, 70, 0, 0, 0, 0, 0, 0])
    gif = (b"GIF89a"
           + (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
           + bytes([0x91, 0, 0])           # GCT, 4 colors
           + pal
           + b"\x2C" + bytes(4) + (2).to_bytes(2, "little")
           + (2).to_bytes(2, "little") + b"\x00"
           + bytes([2])                     # min code size
           + bytes([len(payload)]) + payload + b"\x00"
           + b"\x3B")
    out = decode_gif(gif)
    expect = np.array([[[50, 60, 70], [50, 60, 70]],
                       [[5, 6, 7], [5, 6, 7]]], np.uint8)
    assert (out == expect).all()


def test_decoder_kwkwk_hand_stream():
    """aabab: the code-not-yet-in-table (KwKwK) case by hand.
    Sequence a a b a b -> emit a(0); add aa=6; emit a(0); add ab=7
    ... wait, trace: w=a, next a: 'aa' miss -> emit 0, add aa=6, w=a;
    next b: 'ab' miss -> emit 0, add ab=7, w=b; next a: 'ba' miss ->
    emit 1, add ba=8 (width->4), w=a; next b: 'ab' HIT -> w=ab; end ->
    emit 7 (width 4), eoi.  Decoder sees 7 == its next_free slot at
    that moment: the KwKwK branch."""
    codes = [(4, 3), (0, 3), (0, 3), (1, 3), (7, 4), (5, 4)]
    payload = _pack_lsb(codes)
    pal = bytes([1, 2, 3, 9, 8, 7, 0, 0, 0, 0, 0, 0])
    gif = (b"GIF87a"
           + (5).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + bytes([0x91, 0, 0])
           + pal
           + b"\x2C" + bytes(4) + (5).to_bytes(2, "little")
           + (1).to_bytes(2, "little") + b"\x00"
           + bytes([2])
           + bytes([len(payload)]) + payload + b"\x00"
           + b"\x3B")
    out = decode_gif(gif)
    expect = np.array([[[1, 2, 3], [1, 2, 3], [9, 8, 7],
                        [1, 2, 3], [9, 8, 7]]], np.uint8)
    assert (out == expect).all()


def test_extensions_skipped_and_errors():
    pal = np.array([[0, 0, 0], [255, 0, 0]], np.uint8)
    idx = np.array([[1, 0], [0, 1]], np.uint8)
    raw = bytearray(encode_gif(idx, pal))
    # splice a GCE extension (0x21 0xF9, 4-byte block) before the image
    img_at = raw.index(0x2C, 13)
    gce = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
    spliced = bytes(raw[:img_at]) + gce + bytes(raw[img_at:])
    assert (decode_gif(spliced) == pal[idx]).all()
    with pytest.raises(ValueError, match="magic"):
        decode_gif(b"NOTGIF" + bytes(20))
    # interlace flag set -> loud NotImplementedError
    inter = bytearray(encode_gif(idx, pal))
    inter[inter.index(0x2C, 13) + 9] |= 0x40
    with pytest.raises(NotImplementedError, match="interlaced"):
        decode_gif(bytes(inter))
    with pytest.raises(ValueError, match="truncated|ended"):
        decode_gif(bytes(raw[:len(raw) - 6]))


def test_decode_image_gif_actor_pool(ray_session):
    import ray.data as rd

    from search_engine_ray.stages.multimodal import DecodeImage

    pal = np.array([[10, 20, 30], [40, 50, 60]], np.uint8)
    payloads, expect = [], []
    for i, (h, w) in enumerate([(5, 9), (8, 8), (3, 17)]):
        y, x = np.mgrid[0:h, 0:w]
        idx = ((x + y + i) % 2).astype(np.uint8)
        payloads.append(encode_gif(idx, pal))
        expect.append(float(pal[idx].mean()))
    ds = rd.from_arrow(pa.table({
        "img_id": pa.array([0, 1, 2], pa.int64()),
        "payload": pa.array(payloads, pa.binary())}))
    rows = sorted(ds.map_batches(
        DecodeImage, fn_constructor_kwargs={"decoder": "gif"},
        batch_format="pyarrow", concurrency=1).take_all(),
        key=lambda r: r["img_id"])
    assert [(r["height"], r["width"], r["channels"]) for r in rows] == \
        [(5, 9, 3), (8, 8, 3), (3, 17, 3)]
    for r, m in zip(rows, expect):
        assert r["mean_luma"] == m
