"""Multimodal column plumbing: opaque binary payloads through actor-pool
map_batches stages (decode / resize / frame-sample), real-decoder seam.

The decode libraries aren't in this container (SURVEY-level divergence,
documented in stages/multimodal.py): the 'real' decoder is an explicit
NotImplementedError stub and the 'fake' decoder is a deterministic header
parser — these tests exercise the REAL Ray plumbing (schema, actor
signature, fat-row batch sizing, flat_map-shaped output).
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from search_engine_ray.stages.multimodal import (
    DecodeImage,
    ResizeImage,
    SampleFrames,
    encode_fake_image,
    encode_fake_video,
)


def _image_table(n=12):
    rows = []
    for i in range(n):
        w, h, c = 16 + i % 5, 8 + (3 * i) % 7, 1 + i % 3
        rows.append({"doc_id": i, "payload": encode_fake_image(w, h, c, seed=i),
                     "w": w, "h": h, "c": c})
    return rows


def test_decode_image_actor_pool(ray_session):
    rows = _image_table()
    ds = rd.from_items([{"doc_id": r["doc_id"], "payload": r["payload"]}
                        for r in rows])
    out = ds.map_batches(DecodeImage, fn_constructor_kwargs={"decoder": "fake"},
                         batch_format="pyarrow", batch_size=4,
                         concurrency=(1, 2), num_cpus=1).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert len(out) == len(rows)
    for r in rows:
        got = out[out.doc_id == r["doc_id"]].iloc[0]
        assert (got.width, got.height, got.channels) == (r["w"], r["h"], r["c"])
        px = np.frombuffer(r["payload"][16:], np.uint8)
        assert got.mean_luma == pytest.approx(float(px.mean()))
    assert "payload" not in out.columns  # heavy column dropped


def test_real_decoder_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        DecodeImage(decoder="real")
    with pytest.raises(NotImplementedError):
        ResizeImage(decoder="real")
    with pytest.raises(NotImplementedError):
        SampleFrames(decoder="real")
    with pytest.raises(ValueError):
        DecodeImage(decoder="nope")


def test_resize_then_decode_roundtrip(ray_session):
    rows = _image_table(6)
    ds = rd.from_items([{"doc_id": r["doc_id"], "payload": r["payload"]}
                        for r in rows])
    resized = ds.map_batches(ResizeImage,
                             fn_constructor_kwargs={"decoder": "fake",
                                                    "target": (4, 3)},
                             batch_format="pyarrow", concurrency=(1, 2))
    meta = resized.map_batches(DecodeImage,
                               fn_constructor_kwargs={"decoder": "fake"},
                               batch_format="pyarrow",
                               concurrency=(1, 2)).to_pandas()
    assert (meta.width == 4).all() and (meta.height == 3).all()
    assert sorted(meta.doc_id) == [r["doc_id"] for r in rows]


def test_sample_frames_flat_map_shape(ray_session):
    vids = [{"doc_id": i,
             "payload": encode_fake_video(n_frames=5 + i, width=4, height=3,
                                          channels=1, seed=i)}
            for i in range(4)]
    ds = rd.from_items(vids)
    frames = ds.map_batches(SampleFrames,
                            fn_constructor_kwargs={"decoder": "fake",
                                                   "stride": 2},
                            batch_format="pyarrow",
                            concurrency=(1, 2)).to_pandas()
    for i in range(4):
        n = 5 + i
        expect = list(range(0, n, 2))
        got = sorted(frames[frames.doc_id == i].frame_idx)
        assert got == expect
    # sampled frames decode as images
    one = frames.iloc[0].payload
    t = pa.table({"doc_id": [0], "payload": pa.array([one], pa.binary())})
    m = DecodeImage(decoder="fake")(t)
    assert m["width"][0].as_py() == 4 and m["height"][0].as_py() == 3


def test_deterministic_payloads():
    assert encode_fake_image(8, 8, 3, seed=7) == encode_fake_image(8, 8, 3, seed=7)
    assert encode_fake_video(4, 8, 8, 1, seed=7) == encode_fake_video(4, 8, 8, 1, seed=7)


# --------------------------------------------------------------------------
# Real PNG codec path (functions/png)
# --------------------------------------------------------------------------

def test_png_roundtrip_shapes():
    from search_engine_ray.functions.png import decode_png, encode_png

    rng = np.random.RandomState(0)
    for shape in [(5, 7, 1), (8, 3, 3), (4, 4, 2), (16, 16, 4), (1, 1, 1)]:
        a = rng.randint(0, 256, shape).astype(np.uint8)
        assert np.array_equal(decode_png(encode_png(a)), a)
    # 2D input becomes (h, w, 1)
    a = rng.randint(0, 256, (6, 9)).astype(np.uint8)
    assert decode_png(encode_png(a)).shape == (6, 9, 1)


def test_png_decoder_all_filters():
    """Decode scanlines produced by an independent forward-filterer for
    every filter type of the spec (None/Sub/Up/Average/Paeth)."""
    import struct
    import zlib

    from search_engine_ray.functions.png import (_SIG, _chunk, decode_png)

    def fwd_filter(a, ftype):
        h, w, c = a.shape
        stride, bpp = w * c, c
        flat = a.reshape(h, stride).astype(np.int64)
        rows, prev = [], np.zeros(stride, np.int64)
        for y in range(h):
            cur = flat[y]
            left = np.concatenate([np.zeros(bpp, np.int64), cur[:-bpp]])
            if ftype == 0:
                enc = cur
            elif ftype == 1:
                enc = cur - left
            elif ftype == 2:
                enc = cur - prev
            elif ftype == 3:
                enc = cur - ((left + prev) >> 1)
            else:
                enc = np.empty(stride, np.int64)
                for x in range(stride):
                    aa = cur[x - bpp] if x >= bpp else 0
                    bb = prev[x]
                    cc = prev[x - bpp] if x >= bpp else 0
                    p = aa + bb - cc
                    d = (abs(p - aa), abs(p - bb), abs(p - cc))
                    pred = aa if (d[0] <= d[1] and d[0] <= d[2]) else \
                        (bb if d[1] <= d[2] else cc)
                    enc[x] = cur[x] - pred
            rows.append(np.concatenate([[ftype], enc & 0xFF]).astype(np.uint8))
            prev = cur
        return np.concatenate(rows).tobytes()

    rng = np.random.RandomState(3)
    ct = {1: 0, 3: 2, 2: 4, 4: 6}
    for ftype in range(5):
        for shape in [(6, 5, 3), (7, 4, 1), (3, 8, 4)]:
            a = rng.randint(0, 256, shape).astype(np.uint8)
            h, w, c = shape
            ihdr = struct.pack(">IIBBBBB", w, h, 8, ct[c], 0, 0, 0)
            png = (_SIG + _chunk(b"IHDR", ihdr)
                   + _chunk(b"IDAT", zlib.compress(fwd_filter(a, ftype)))
                   + _chunk(b"IEND", b""))
            assert np.array_equal(decode_png(png), a), (ftype, shape)


def test_png_rejects_bad_input():
    import pytest

    from search_engine_ray.functions.png import decode_png, encode_png

    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all....")
    with pytest.raises(ValueError, match="channel"):
        encode_png(np.zeros((2, 2, 5), np.uint8))


def test_decode_image_png_actor_pool(ray_session):
    import ray.data as rd

    from search_engine_ray.functions.png import encode_png
    from search_engine_ray.stages.multimodal import DecodeImage

    rng = np.random.RandomState(5)
    imgs = [rng.randint(0, 256, (4 + i, 6, 3)).astype(np.uint8)
            for i in range(6)]
    tbl = pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "payload": pa.array([encode_png(a) for a in imgs], pa.binary()),
    })
    out = rd.from_arrow(tbl).map_batches(
        DecodeImage, fn_constructor_kwargs={"decoder": "png"},
        batch_format="pyarrow", batch_size=2, concurrency=2, num_cpus=1) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out.height.tolist() == [4 + i for i in range(6)]
    assert (out.width == 6).all() and (out.channels == 3).all()
    for i, a in enumerate(imgs):
        assert out.mean_luma[i] == float(a.mean())


def test_resize_png_roundtrip(ray_session):
    from search_engine_ray.functions.png import decode_png, encode_png
    from search_engine_ray.stages.multimodal import ResizeImage

    rng = np.random.RandomState(9)
    a = rng.randint(0, 256, (10, 8, 3)).astype(np.uint8)
    t = pa.table({"payload": pa.array([encode_png(a)], pa.binary())})
    out = ResizeImage(target=(4, 5), decoder="png")(t)
    r = decode_png(out["payload"][0].as_py())
    assert r.shape == (5, 4, 3)
    ys, xs = (np.arange(5) * 10) // 5, (np.arange(4) * 8) // 4
    assert np.array_equal(r, a[ys][:, xs])


# --------------------------------------------------------------------------
# JPEG codec (functions/jpeg): baseline sequential 4:4:4
# --------------------------------------------------------------------------

def test_jpeg_constant_gray_exact():
    from search_engine_ray.functions.jpeg import decode_jpeg, encode_jpeg

    a = np.full((12, 17, 1), 77, np.uint8)
    data = encode_jpeg(a)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert np.array_equal(decode_jpeg(data), a)


def test_jpeg_constant_rgb_matches_frozen_ycbcr():
    """quality=100 makes the DCT lossless on constant fill; the only lossy
    step is the frozen floor(x+0.5) YCbCr pair — the oracle contract."""
    from search_engine_ray.functions.jpeg import decode_jpeg, encode_jpeg

    r, g, b = 200.0, 30.0, 90.0
    img = np.zeros((9, 21, 3), np.uint8)
    img[:, :] = (int(r), int(g), int(b))
    out = decode_jpeg(encode_jpeg(img, quality=100))
    y = np.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5)
    cb = np.floor(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0 + 0.5)
    cr = np.floor(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0 + 0.5)
    exp = [np.floor(y + 1.402 * (cr - 128.0) + 0.5),
           np.floor(y - 0.344136 * (cb - 128.0)
                    - 0.714136 * (cr - 128.0) + 0.5),
           np.floor(y + 1.772 * (cb - 128.0) + 0.5)]
    assert (out == out[0, 0]).all()
    assert out[0, 0].tolist() == [int(v) for v in exp]


def test_jpeg_random_near_exact_at_q100():
    from search_engine_ray.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(0)
    gray = rng.randint(0, 256, (24, 31, 1)).astype(np.uint8)
    dg = decode_jpeg(encode_jpeg(gray))
    assert np.abs(dg.astype(int) - gray.astype(int)).max() <= 1
    rgb = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    dc = decode_jpeg(encode_jpeg(rgb))
    assert np.abs(dc.astype(int) - rgb.astype(int)).max() <= 3


def test_jpeg_lossy_quality_reasonable():
    from search_engine_ray.functions.jpeg import decode_jpeg, encode_jpeg

    x = np.linspace(0, 255, 64).astype(np.uint8)
    img = np.tile(x, (48, 1))[:, :, None]
    d = decode_jpeg(encode_jpeg(img, quality=75))
    assert np.abs(d.astype(int) - img.astype(int)).mean() < 3.0
    # lower quality -> smaller file
    assert len(encode_jpeg(img, quality=30)) < len(encode_jpeg(img, quality=95))


def test_jpeg_rejects_out_of_subset():
    import pytest

    from search_engine_ray.functions.jpeg import decode_jpeg, encode_jpeg

    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x00\x01nonsense")
    # arithmetic-coded SOF9 marker in an otherwise valid prefix (SOF2
    # progressive is SUPPORTED since round 5, so the out-of-subset probe
    # uses a frame type that stays out: arithmetic coding)
    data = bytearray(encode_jpeg(np.zeros((8, 8, 1), np.uint8)))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC9
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg(bytes(data))
    with pytest.raises(ValueError, match="channels"):
        encode_jpeg(np.zeros((4, 4, 2), np.uint8))


def test_jpeg_420_tiled_exact_and_lossy():
    """4:2:0 MCU-interleaved encode/decode: 16x16-constant-tile images are
    EXACT at quality=100 (each luma block and each downsampled chroma
    block is constant, and replication upsampling is the identity on
    constant tiles) — a wrong MCU interleave order, wrong chroma grid, or
    wrong upsample all corrupt tiles.  Odd dims exercise edge padding."""
    from search_engine_ray.functions.jpeg import (_rgb_to_ycbcr,
                                                  _ycbcr_to_rgb,
                                                  decode_jpeg, encode_jpeg)

    rng = np.random.RandomState(3)
    for (h, w) in [(16, 16), (17, 23), (32, 48), (40, 33)]:
        ty, tx = (h + 15) // 16, (w + 15) // 16
        colors = rng.randint(0, 256, (ty, tx, 3))
        arr = np.zeros((h, w, 3), np.uint8)
        for i in range(ty):
            for j in range(tx):
                arr[i * 16:(i + 1) * 16, j * 16:(j + 1) * 16] = colors[i, j]
        dec = decode_jpeg(encode_jpeg(arr, quality=100, subsampling="420"))
        exp = _ycbcr_to_rgb(_rgb_to_ycbcr(arr)).astype(np.uint8)
        assert np.array_equal(dec, exp), (h, w)
    # lossy sanity at default tables
    grad = (np.arange(32 * 32 * 3).reshape(32, 32, 3) % 256).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(grad, quality=75, subsampling="420"))
    assert np.abs(d.astype(int) - grad.astype(int)).mean() < 20
    # >2x sampling factors still rejected loudly
    data = bytearray(encode_jpeg(grad, quality=75, subsampling="420"))
    i = data.find(b"\xff\xc0")
    data[i + 11] = 0x33  # comp 0's sampling byte (FFC0+len+prec+h+w+nc+cid)
    with pytest.raises(NotImplementedError, match="sampling"):
        decode_jpeg(bytes(data))


def test_decode_image_jpeg_actor_pool(ray_session):
    import ray.data as rd

    from search_engine_ray.functions.jpeg import encode_jpeg
    from search_engine_ray.stages.multimodal import DecodeImage

    imgs = [np.full((4 + i, 6, 1), (40 * i) % 256, np.uint8)
            for i in range(6)]
    tbl = pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "payload": pa.array([encode_jpeg(a) for a in imgs], pa.binary()),
    })
    out = rd.from_arrow(tbl).map_batches(
        DecodeImage, fn_constructor_kwargs={"decoder": "jpeg"},
        batch_format="pyarrow", batch_size=2, concurrency=2, num_cpus=1) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out.height.tolist() == [4 + i for i in range(6)]
    assert (out.width == 6).all() and (out.channels == 1).all()
    assert out.mean_luma.tolist() == [float((40 * i) % 256) for i in range(6)]


def test_resize_jpeg_roundtrip():
    from search_engine_ray.functions.jpeg import decode_jpeg, encode_jpeg
    from search_engine_ray.stages.multimodal import ResizeImage

    a = np.full((10, 8, 3), 0, np.uint8)
    a[:, :] = (10, 200, 60)
    t = pa.table({"payload": pa.array([encode_jpeg(a)], pa.binary())})
    out = ResizeImage(target=(4, 5), decoder="jpeg")(t)
    r = decode_jpeg(out["payload"][0].as_py())
    assert r.shape == (5, 4, 3)
    assert (r == r[0, 0]).all()


def test_jpeg_grayscale_nonstandard_sampling_decodes():
    """T.81 A.2 / A.1.1: a single-component scan is NON-interleaved and
    only the RATIO to hmax/vmax matters, so a grayscale stream declaring
    2x2 sampling carries the identical raster-ordered entropy data as its
    1x1 twin and must decode BIT-IDENTICALLY (round 5 closes the ADVICE
    r4 seam by implementing, not raising).  Built by flipping the SOF
    sampling byte of a valid multi-block 1x1 grayscale stream — a decoder
    wrongly walking 16x16 MCUs would garble block order AND mis-size the
    grid."""
    from search_engine_ray.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, (24, 17, 1), dtype=np.uint8)
    data = bytearray(encode_jpeg(img, quality=90))
    pos = bytes(data).find(b"\xff\xc0")
    assert pos >= 0
    # SOF0 payload: precision(1) h(2) w(2) nc(1) cid(1) samp(1)
    samp_at = pos + 4 + 7
    assert data[samp_at] == 0x11
    plain = decode_jpeg(bytes(data))  # sane before the flip
    data[samp_at] = 0x22
    assert np.array_equal(decode_jpeg(bytes(data)), plain)
    data[samp_at] = 0x21              # asymmetric factors too
    assert np.array_equal(decode_jpeg(bytes(data)), plain)


def test_jpeg_progressive_matches_baseline_decode():
    """Progressive (SOF2) streams carry the same quantized coefficients as
    the baseline encoding of the same image, so the progressive decode
    must be BIT-IDENTICAL to the baseline decode at every quality —
    witnessing interleaved DC first+refine, banded AC first passes at
    Al=2/1, AC refinement (correction bits, buffered bits behind EOB
    runs), ZRL, and per-scan DHT redefinition."""
    from search_engine_ray.functions.jpeg import (decode_jpeg, encode_jpeg,
                                                  encode_jpeg_progressive)

    rng = np.random.default_rng(7)
    for shape, q in (((8, 8, 1), 100), ((24, 17, 1), 100), ((16, 16, 3), 100),
                     ((40, 33, 3), 90), ((64, 48, 3), 75), ((7, 5, 1), 50)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(img, quality=q))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=q))
        assert np.array_equal(base, prog), (shape, q)


def test_jpeg_progressive_sparse_long_runs():
    """Mostly-constant images force long zero runs and multi-block EOB
    runs (the hard corner of the refinement-bit protocol)."""
    from search_engine_ray.functions.jpeg import (decode_jpeg, encode_jpeg,
                                                  encode_jpeg_progressive)

    rng = np.random.default_rng(3)
    img = np.full((96, 80, 3), 128, np.uint8)
    for _ in range(12):
        y, x = rng.integers(0, 96), rng.integers(0, 80)
        img[y, x] = rng.integers(0, 256, 3)
    for q in (100, 85, 60):
        base = decode_jpeg(encode_jpeg(img, quality=q))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=q))
        assert np.array_equal(base, prog), q


def test_jpeg_progressive_custom_script():
    """An arbitrary (valid) scan script — finer spectral bands, 3-level
    successive approximation, interleaved DC refinements between AC
    scans — must still accumulate to the exact coefficients."""
    from search_engine_ray.functions.jpeg import (decode_jpeg, encode_jpeg,
                                                  encode_jpeg_progressive)

    rng = np.random.default_rng(3)
    script = [([0, 1, 2], 0, 0, 0, 2), ([0], 1, 2, 0, 3), ([0], 3, 63, 0, 3),
              ([1], 1, 63, 0, 2), ([2], 1, 63, 0, 2),
              ([0], 1, 63, 3, 2), ([0, 1, 2], 0, 0, 2, 1),
              ([1], 1, 63, 2, 1), ([2], 1, 63, 2, 1),
              ([0], 1, 63, 2, 1),
              ([0, 1, 2], 0, 0, 1, 0),
              ([0], 1, 63, 1, 0), ([1], 1, 63, 1, 0), ([2], 1, 63, 1, 0)]
    img = rng.integers(0, 256, (33, 29, 3), np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=95))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=95,
                                               script=script))
    assert np.array_equal(base, prog)


def test_jpeg_progressive_subsampled_matches_baseline_decode():
    """Progressive encode with 4:2:0 / 4:2:2 / 4:4:0 chroma subsampling
    carries the same quantized coefficients as the baseline encode of the
    same image (same pad, box-downsample, quant tables), so decodes must
    be BIT-IDENTICAL — witnessing the interleaved-DC MCU walk over
    mixed sampling factors and non-interleaved AC scans over each
    component's OWN (unpadded) block grid, per T.81 A.2."""
    from search_engine_ray.functions.jpeg import (decode_jpeg, encode_jpeg,
                                                  encode_jpeg_progressive)

    rng = np.random.default_rng(11)
    for sub in ("420", "422", "440"):
        for shape, q in (((16, 16, 3), 100), ((33, 29, 3), 90),
                         ((40, 17, 3), 75)):
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            base = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub))
            prog = decode_jpeg(
                encode_jpeg_progressive(img, quality=q, subsampling=sub))
            assert np.array_equal(base, prog), (sub, shape, q)
    # separate-DC-per-component script: single-component DC scans of a
    # SUBSAMPLED component also walk the non-interleaved grid
    script = [([0], 0, 0, 0, 1), ([1], 0, 0, 0, 1), ([2], 0, 0, 0, 1),
              ([0], 1, 63, 0, 1), ([1], 1, 63, 0, 1), ([2], 1, 63, 0, 1),
              ([0], 0, 0, 1, 0), ([1], 0, 0, 1, 0), ([2], 0, 0, 1, 0),
              ([0], 1, 63, 1, 0), ([1], 1, 63, 1, 0), ([2], 1, 63, 1, 0)]
    img = rng.integers(0, 256, (25, 21, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=95, subsampling="420"))
    prog = decode_jpeg(encode_jpeg_progressive(
        img, quality=95, subsampling="420", script=script))
    assert np.array_equal(base, prog)


def test_jpeg_restart_intervals_baseline():
    """DRI + RSTn streams carry the same quantized coefficients as the
    unmarked encoding (restarts only re-align bytes and reset DC
    predictors), so decodes must be BIT-IDENTICAL — across grayscale,
    4:4:4, 4:2:0, intervals that do and don't divide the MCU count, and
    ri=1 (a marker after every MCU, cycling RST0..RST7 twice over)."""
    from search_engine_ray.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(17)
    cases = [((24, 17, 1), "444", 2), ((40, 33, 3), "444", 3),
             ((33, 29, 3), "420", 1), ((48, 48, 3), "420", 4),
             ((16, 16, 3), "422", 1), ((64, 40, 3), "444", 7)]
    for shape, sub, ri in cases:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        plain = decode_jpeg(encode_jpeg(img, quality=85, subsampling=sub))
        marked = encode_jpeg(img, quality=85, subsampling=sub,
                             restart_interval=ri)
        assert b"\xff\xdd" in marked and b"\xff\xd0" in marked
        assert np.array_equal(plain, decode_jpeg(marked)), (shape, sub, ri)


def test_jpeg_restart_intervals_progressive():
    """Restart markers in EVERY progressive scan (DC interleaved MCU
    units, AC non-interleaved block units, refinement passes): decode
    must stay bit-identical to the baseline decode of the same image."""
    from search_engine_ray.functions.jpeg import (decode_jpeg, encode_jpeg,
                                                  encode_jpeg_progressive)

    rng = np.random.default_rng(23)
    for shape, sub, ri, q in (((24, 17, 1), "444", 2, 100),
                              ((33, 29, 3), "444", 3, 90),
                              ((40, 33, 3), "420", 2, 75)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub))
        marked = encode_jpeg_progressive(img, quality=q, subsampling=sub,
                                         restart_interval=ri)
        assert b"\xff\xdd" in marked
        assert np.array_equal(base, decode_jpeg(marked)), (shape, sub, ri)


def test_jpeg_restart_marker_cycle_validated():
    """A restart marker out of the D0..D7 modulo sequence raises loudly
    (corrupt-stream detection) instead of decoding garbage."""
    from search_engine_ray.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(29)
    img = rng.integers(0, 256, (40, 33, 3), dtype=np.uint8)
    data = bytearray(encode_jpeg(img, quality=85, restart_interval=2))
    first = data.find(b"\xff\xd0", data.find(b"\xff\xda"))
    assert first != -1
    data[first + 1] = 0xD5                     # break the cycle
    with pytest.raises(ValueError, match="restart marker out of sequence"):
        decode_jpeg(bytes(data))


def test_jpeg_422_440_tiled_exact_and_lossy():
    """4:2:2 / 4:4:0 MCU-interleaved encode+decode (ADVICE r4: the decode
    claim had no test): constant tiles matching the MCU cell (16x8 / 8x16)
    are exact at quality=100; lossy sanity at default tables."""
    from search_engine_ray.functions.jpeg import (_rgb_to_ycbcr,
                                                  _ycbcr_to_rgb,
                                                  decode_jpeg, encode_jpeg)

    rng = np.random.RandomState(5)
    for sub, (tw, th) in (("422", (16, 8)), ("440", (8, 16))):
        for (h, w) in [(16, 16), (17, 23), (40, 33)]:
            ty, tx = (h + th - 1) // th, (w + tw - 1) // tw
            colors = rng.randint(0, 256, (ty, tx, 3))
            arr = np.zeros((h, w, 3), np.uint8)
            for i in range(ty):
                for j in range(tx):
                    arr[i * th:(i + 1) * th, j * tw:(j + 1) * tw] = \
                        colors[i, j]
            dec = decode_jpeg(encode_jpeg(arr, quality=100, subsampling=sub))
            exp = _ycbcr_to_rgb(_rgb_to_ycbcr(arr)).astype(np.uint8)
            assert np.array_equal(dec, exp), (sub, h, w)
        grad = (np.arange(32 * 32 * 3).reshape(32, 32, 3) % 256) \
            .astype(np.uint8)
        d = decode_jpeg(encode_jpeg(grad, quality=75, subsampling=sub))
        assert np.abs(d.astype(int) - grad.astype(int)).mean() < 20, sub


def test_spectral_features_stft(ray_session):
    """Framed-STFT stage: exact-bin tones land on their bin, the louder
    of two tones wins the argmax, and sub-frame payloads report
    (0 frames, -1 peak)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.stages.multimodal import (SpectralFeatures,
                                                     encode_wav)

    i = np.arange(1024, dtype=np.float64)
    tone = lambda f, a: np.round(a * np.sin(2 * np.pi * f * i / 256.0))
    payloads = [
        encode_wav(tone(7, 2000).astype(np.int16)),           # pure bin 7
        encode_wav((tone(5, 500) + tone(40, 1800))
                   .astype(np.int16)),                        # 40 louder
        encode_wav(np.zeros(100, np.int16)),                  # sub-frame
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "payload": pa.array(payloads, pa.binary())}))
    rows = {r["doc_id"]: r for r in ds.map_batches(
        SpectralFeatures, fn_constructor_kwargs={"frame": 256, "hop": 128},
        batch_format="pyarrow", concurrency=1).take_all()}
    assert rows[1]["peak_bin"] == 7 and rows[1]["n_frames"] == 7
    assert rows[2]["peak_bin"] == 40
    assert rows[3]["n_frames"] == 0 and rows[3]["peak_bin"] == -1
