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


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a non-negative int64 array, fully vectorized."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes needed per value: ceil(bitlen/7), min 1
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    nz = tmp > 0
    while nz.any():
        nbits[nz] += 1
        tmp >>= np.uint64(1)
        nz = tmp > 0
    nbytes = np.maximum((nbits + 6) // 7, 1)
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
    return out.tobytes()


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
    doc_chunks: list[bytes] = []
    tf_chunks: list[bytes] = []
    last, off_d, off_t, max_tf, min_dl, first = [], [], [], [], [], []
    pos_d = pos_t = 0
    for s in range(0, n, block_size):
        e = min(s + block_size, n)
        blk = ids[s:e]
        gaps = delta_encode(blk)
        db = varint_encode(gaps)
        tb = varint_encode(t[s:e])
        off_d.append(pos_d)
        off_t.append(pos_t)
        pos_d += len(db)
        pos_t += len(tb)
        doc_chunks.append(db)
        tf_chunks.append(tb)
        last.append(int(blk[-1]))
        first.append(int(blk[0]))
        max_tf.append(int(t[s:e].max()))
        min_dl.append(int(dl[s:e].min()))
    return EncodedPostings(
        df=n,
        doc_ids=b"".join(doc_chunks),
        tfs=b"".join(tf_chunks),
        block_last_docid=np.array(last, np.int64),
        block_off_docs=np.array(off_d, np.int64),
        block_off_tfs=np.array(off_t, np.int64),
        block_max_tf=np.array(max_tf, np.int32),
        block_min_dl=np.array(min_dl, np.int32),
        block_first_docid=np.array(first, np.int64),
    )


def decode_postings(enc: EncodedPostings) -> tuple[np.ndarray, np.ndarray]:
    """Full decode -> (doc_ids, tfs)."""
    if enc.df == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    # each block is an independent delta chain (gap 0 absolute), so decode
    # block-wise; the varint stream itself can be decoded in one pass.
    n_blocks = enc.block_off_docs.size
    ids = np.concatenate([decode_block_docids(enc, bi) for bi in range(n_blocks)])
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
