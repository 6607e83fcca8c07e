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
