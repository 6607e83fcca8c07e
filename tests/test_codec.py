"""Postings codec: round-trips, block decode, randomized invariants."""

import numpy as np
import pytest

from search_engine_ray.functions.codec import (
    decode_block_docids,
    decode_block_tfs,
    decode_postings,
    delta_decode,
    delta_encode,
    encode_postings,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_edges():
    v = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**32, 2**62], np.int64)
    assert (varint_decode(varint_encode(v)) == v).all()


def test_varint_empty():
    assert varint_encode(np.empty(0, np.int64)) == b""
    assert varint_decode(b"").size == 0


def test_varint_single_byte_density():
    v = np.arange(1, 100, dtype=np.int64)
    assert len(varint_encode(v)) == 99  # gaps < 128 -> 1 byte each


def test_delta():
    ids = np.array([5, 9, 10, 100], np.int64)
    assert (delta_decode(delta_encode(ids)) == ids).all()


@pytest.mark.parametrize("n,block", [(1, 128), (7, 4), (1000, 128), (129, 128), (256, 128)])
def test_postings_roundtrip(n, block):
    rng = np.random.RandomState(n)
    ids = np.sort(rng.choice(10**8, n, replace=False)).astype(np.int64)
    tfs = rng.randint(1, 1000, n).astype(np.int64)
    dls = rng.randint(1, 5000, n).astype(np.int64)
    enc = encode_postings(ids, tfs, dls, block_size=block)
    d_ids, d_tfs = decode_postings(enc)
    assert (d_ids == ids).all()
    assert (d_tfs == tfs).all()
    assert enc.df == n
    # block metadata invariants
    nb = enc.block_last_docid.size
    assert nb == (n + block - 1) // block
    for bi in range(nb):
        blk_ids = decode_block_docids(enc, bi)
        blk_tfs = decode_block_tfs(enc, bi)
        s, e = bi * block, min((bi + 1) * block, n)
        assert (blk_ids == ids[s:e]).all()
        assert (blk_tfs == tfs[s:e]).all()
        assert enc.block_last_docid[bi] == ids[e - 1]
        assert enc.block_first_docid[bi] == ids[s]
        assert enc.block_max_tf[bi] == tfs[s:e].max()
        assert enc.block_min_dl[bi] == dls[s:e].min()


def test_rejects_unsorted():
    with pytest.raises(ValueError):
        encode_postings(np.array([3, 2], np.int64), np.array([1, 1], np.int64),
                        np.array([1, 1], np.int64))


def test_compression_dense_ids():
    # dense local ids (the segment layout) must compress to ~1 byte/gap
    ids = np.arange(10000, dtype=np.int64) + (7 << 40)
    tfs = np.ones(10000, np.int64)
    dls = np.full(10000, 100, np.int64)
    enc = encode_postings(ids, tfs, dls)
    assert len(enc.doc_ids) < 10000 * 1.2 + enc.block_last_docid.size * 9
