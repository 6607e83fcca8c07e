"""Posting-list codec: delta + varint compression with block-max metadata.

The reference stores one SQL row per posting (``model/Index.java:13-34``); the
north rule requires delta-encoded, varint-compressed posting lists with
per-block max-score metadata instead.  Format (all little-endian LEB128
varints, numpy-vectorized encode/decode — no per-byte Python loops):

- ``doc_ids``: strictly increasing int64 doc ids, gap-encoded
  (``d[0], d[1]-d[0], ...``), each gap as a varint.
- ``tfs``: term frequencies (int32), varint each, aligned with doc_ids.
- blocks of ``block_size`` postings carry skip metadata so a reader can jump
  or prune without decoding:
  ``block_last_docid`` (int64, for skipping), ``block_off_docs`` /
  ``block_off_tfs`` (byte offsets of each block start), ``block_max_tf``
  (int32) and ``block_min_dl`` (int32, the block's min document length).

``block_max_tf`` together with ``block_min_dl`` gives a *tight upper bound*
on the BM25 contribution of any posting in the block at query time
(score is increasing in tf and decreasing in doc_len), so block-max WAND
needs no corpus statistics at build time and the build stays single-pass.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def varint_encode_with_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode a non-negative int64 array, fully vectorized; also
    returns the per-value byte length (for computing block offsets without
    re-encoding per block)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.empty(0, np.int64)
    # bytes per value: 1 + number of 7-bit shifts until zero (≤10 iterations)
    nbytes = np.ones(v.shape, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbytes[nz] += 1
        tmp >>= np.uint64(7)
    ends = np.cumsum(nbytes)
    total = int(ends[-1])
    starts = ends - nbytes
    out = np.empty(total, dtype=np.uint8)
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, nbytes)
    val_rep = np.repeat(v, nbytes)
    chunks = (val_rep >> (pos.astype(np.uint64) * np.uint64(7))) & np.uint64(0x7F)
    out[:] = chunks.astype(np.uint8)
    # continuation bit on all but the last byte of each value
    is_last = np.zeros(total, dtype=bool)
    is_last[ends - 1] = True
    out[~is_last] |= 0x80
    return out.tobytes(), nbytes


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a non-negative int64 array, fully vectorized."""
    return varint_encode_with_lengths(values)[0]


def varint_decode(buf: bytes | memoryview, count: int | None = None) -> np.ndarray:
    """Decode a LEB128 byte string to int64, vectorized via reduceat."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.int64)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lens = ends - starts + 1
    pos = np.arange(b.size, dtype=np.int64) - np.repeat(starts, lens)
    vals = (b & np.uint8(0x7F)).astype(np.uint64) << (pos.astype(np.uint64) * np.uint64(7))
    summed = np.add.reduceat(vals, starts).astype(np.int64)
    if count is not None and summed.size != count:
        raise ValueError(f"varint_decode: expected {count} values, got {summed.size}")
    return summed


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    d = np.asarray(sorted_ids, dtype=np.int64)
    out = np.empty_like(d)
    if d.size:
        out[0] = d[0]
        np.subtract(d[1:], d[:-1], out=out[1:])
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(gaps, dtype=np.int64))


@dataclass
class EncodedPostings:
    df: int
    doc_ids: bytes
    tfs: bytes
    block_last_docid: np.ndarray  # int64 [n_blocks]
    block_off_docs: np.ndarray    # int64 [n_blocks] byte offset of block start
    block_off_tfs: np.ndarray     # int64 [n_blocks]
    block_max_tf: np.ndarray      # int32 [n_blocks]
    block_min_dl: np.ndarray      # int32 [n_blocks]
    block_first_docid: np.ndarray # int64 [n_blocks] (delta base for each block)


def encode_postings(
    doc_ids: np.ndarray, tfs: np.ndarray, doc_lens: np.ndarray, block_size: int = 128
) -> EncodedPostings:
    """Encode one term's postings (doc_ids strictly increasing).

    Each block is delta-encoded independently (gap 0 of a block is the
    absolute doc id) so a reader can decode any block without its
    predecessors — the skip/prune requirement of block-max WAND.
    """
    ids = np.asarray(doc_ids, dtype=np.int64)
    t = np.asarray(tfs, dtype=np.int64)
    dl = np.asarray(doc_lens, dtype=np.int64)
    n = ids.size
    if n == 0:
        z64 = np.empty(0, np.int64)
        return EncodedPostings(0, b"", b"", z64, z64.copy(), z64.copy(),
                               np.empty(0, np.int32), np.empty(0, np.int32), z64.copy())
    if n > 1 and not (ids[1:] > ids[:-1]).all():
        raise ValueError("doc_ids must be strictly increasing")
    # ONE vectorized encode for the whole term (not per block): gap-encode
    # globally, then overwrite each block's first gap with the absolute id
    # (blocks decode independently); block byte offsets come from the
    # per-value length array.
    starts_ix = np.arange(0, n, block_size, dtype=np.int64)
    ends_ix = np.minimum(starts_ix + block_size, n)
    gaps = delta_encode(ids)
    gaps[starts_ix] = ids[starts_ix]
    doc_bytes, doc_lens_b = varint_encode_with_lengths(gaps)
    tf_bytes, tf_lens_b = varint_encode_with_lengths(t)
    cum_d = np.concatenate(([0], np.cumsum(doc_lens_b)))
    cum_t = np.concatenate(([0], np.cumsum(tf_lens_b)))
    return EncodedPostings(
        df=n,
        doc_ids=doc_bytes,
        tfs=tf_bytes,
        block_last_docid=ids[ends_ix - 1].copy(),
        block_off_docs=cum_d[starts_ix],
        block_off_tfs=cum_t[starts_ix],
        block_max_tf=np.maximum.reduceat(t, starts_ix).astype(np.int32),
        block_min_dl=np.minimum.reduceat(dl, starts_ix).astype(np.int32),
        block_first_docid=ids[starts_ix].copy(),
    )


def decode_postings(enc: EncodedPostings) -> tuple[np.ndarray, np.ndarray]:
    """Full decode -> (doc_ids, tfs), one vectorized pass.

    Each block is an independent delta chain (gap 0 absolute).  Rather than
    decoding block-by-block (a numpy call per 128 postings — measured 10x+
    slower on dense lists), decode the whole varint stream once, take the
    global cumsum, and subtract each block's preceding cumulative total so
    every block's chain restarts at its absolute first id."""
    if enc.df == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    b = np.frombuffer(enc.doc_ids, dtype=np.uint8)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    vstarts_bytes = np.empty_like(ends)
    vstarts_bytes[0] = 0
    vstarts_bytes[1:] = ends[:-1] + 1
    lens = ends - vstarts_bytes + 1
    pos = np.arange(b.size, dtype=np.int64) - np.repeat(vstarts_bytes, lens)
    vals = (b & np.uint8(0x7F)).astype(np.uint64) << (pos.astype(np.uint64) * np.uint64(7))
    gaps = np.add.reduceat(vals, vstarts_bytes).astype(np.int64)
    if gaps.size != enc.df:
        raise ValueError(f"decode_postings: expected {enc.df}, got {gaps.size}")
    # value index where each block starts, recovered from its byte offset
    blk_vstart = np.searchsorted(vstarts_bytes, enc.block_off_docs)
    csum = np.cumsum(gaps)
    prev_total = np.where(blk_vstart > 0, csum[blk_vstart - 1], 0)
    sub = np.zeros(gaps.size, np.int64)
    sub[blk_vstart] = np.diff(np.concatenate(([0], prev_total)))
    ids = csum - np.cumsum(sub)
    tfs = varint_decode(enc.tfs, count=enc.df)
    return ids, tfs


def _block_slice(offsets: np.ndarray, buf: bytes, bi: int) -> memoryview:
    start = int(offsets[bi])
    end = int(offsets[bi + 1]) if bi + 1 < offsets.size else len(buf)
    return memoryview(buf)[start:end]


def decode_block_docids(enc: EncodedPostings, bi: int) -> np.ndarray:
    gaps = varint_decode(_block_slice(enc.block_off_docs, enc.doc_ids, bi))
    return delta_decode(gaps)


def decode_block_tfs(enc: EncodedPostings, bi: int) -> np.ndarray:
    return varint_decode(_block_slice(enc.block_off_tfs, enc.tfs, bi))
