"""Deduplication operators for large-scale training-data pipelines.

Five dedup families, each a Ray Data pipeline over the ``documents`` table
(driver shape: ``doc_id:int64, text:string, ...``), designed so the wide step
is a single hash-partitioned ``groupby`` and everything upstream is a
vectorized ``map_batches``:

- exact:      content-hash -> ``groupby(hash)`` -> (keep_doc_id=min, n_copies)
- minhash:    shingles -> minhash signature -> LSH band buckets ->
              ``groupby(band, band_hash)`` -> candidate pairs -> verify
- simhash:    64-bit weighted simhash -> band buckets -> hamming verify
- n-gram:     exact Jaccard via shingle co-occurrence counts (three groupbys,
              all on bounded keys; hot shingles capped — "stop-shingle"
              pruning, df cap applied identically in the SQL oracle)
- embedding:  cosine near-duplicate pairs over normalized vectors
- substring:  exact char-k-gram duplicated-SPAN stats (the direct
              Ray-Data form of suffix-array ExactSubstr dedup, Lee et al.
              2022 "Deduplicating Training Data Makes Language Models
              Better"): one df groupby over rolling-hash fingerprints,
              then per-doc vectorized interval union

Scale notes: pair generation inside a bucket is quadratic — bucket width
(bands x rows for LSH, ``max_shingle_df`` for n-gram) bounds it explicitly.
At 10^12 docs the LSH path is the only viable family; the exact-Jaccard path
exists as its verification oracle at test scale.
"""

from __future__ import annotations

import logging
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Min, Sum

from ..functions.hashing import (
    _POLY_P,
    _hash_params,
    _splitmix64,
    hamming64,
    minhash_signature,
    simhash,
    stable_hash_array,
)
from ..functions.textstats import content_hash_batch

_WORD_RE = re.compile(r"[a-z]+")


def _shuffle_parts() -> int:
    """Coarse shuffle-partition count for the bucket groupbys.

    Grouping directly on the bucket key hands Ray one group per DISTINCT
    key (hundreds of thousands of single-row groups -> per-group UDF
    overhead dominates).  Instead rows hash into ~4 coarse parts per CPU;
    the part's UDF re-sorts its rows and walks key runs vectorized.  Output
    is identical — the part is pure routing."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(16, 4 * cpus)


def _key_runs(*keys: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """lexsort rows by the key tuple; return (order, run_starts, run_ends)."""
    order = np.lexsort(keys[::-1])
    n = order.size
    if n == 0:
        return order, np.empty(0, np.int64), np.empty(0, np.int64)
    change = np.zeros(n, bool)
    for k in keys:
        ks = k[order]
        change[1:] |= ks[1:] != ks[:-1]
    starts = np.concatenate(([0], np.flatnonzero(change)))
    ends = np.concatenate((starts[1:], [n]))
    return order, starts, ends


def _fixed_binary_view(col: pa.ChunkedArray | pa.Array,
                       dtype: np.dtype) -> np.ndarray:
    """Zero-copy-ish (rows, width/itemsize) view of a fixed_size_binary
    column: one buffer reinterpret instead of a per-row ``as_py`` unpack."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    per_row = arr.type.byte_width // np.dtype(dtype).itemsize
    flat = np.frombuffer(arr.buffers()[1], dtype)
    start = arr.offset * per_row
    return flat[start: start + len(arr) * per_row].reshape(len(arr), per_row)


def _batch_shingles(texts: list[str], n: int, *, distinct: bool = True
                    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Word-n-gram shingle hashes for a whole batch, vectorized.

    Returns ``(doc_idx, shingle_hash, per_doc_counts)``.  With
    ``distinct=True`` (default) each (doc, shingle) pair appears once and
    rows are sorted by (doc_idx, shingle_hash); with ``distinct=False``
    every window position is kept in document order (the positional view
    needed by :func:`..stages.contamination.duplicate_ngram_stats`).  One
    ``stable_hash_array`` call hashes every token of the batch; each shingle
    hash is a polynomial combine of its n consecutive token hashes
    (split-stable, collision quality like the token hash itself); windows
    crossing document boundaries are masked out; per-doc dedup is one
    lexsort.  Replaces the round-1 per-doc Python string-join/set loop — the
    constant-factor bottleneck of the minhash and jaccard pipelines."""
    toks_per_doc = [_WORD_RE.findall((t or "").lower()) for t in texts]
    lens = np.array([len(t) for t in toks_per_doc], np.int64)
    n_docs = len(texts)
    total = int(lens.sum())
    if total < n:
        return (np.empty(0, np.int64), np.empty(0, np.uint64),
                np.zeros(n_docs, np.int64))
    flat = [t for toks in toks_per_doc for t in toks]
    h = stable_hash_array(flat)
    acc = np.zeros(total - n + 1, np.uint64)
    for j in range(n):
        acc = acc * _POLY_P + h[j: total - n + 1 + j]
    win = _splitmix64(acc)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    starts = np.zeros(n_docs, np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    pos_in = np.arange(total, dtype=np.int64) - starts[doc_of]
    head = total - n + 1
    valid = pos_in[:head] <= (lens[doc_of[:head]] - n)
    docs = doc_of[:head][valid]
    sh = win[valid]
    if not distinct:
        counts = np.bincount(docs, minlength=n_docs).astype(np.int64)
        return docs, sh, counts
    order = np.lexsort((sh, docs))
    docs, sh = docs[order], sh[order]
    keep = np.ones(docs.size, bool)
    if docs.size > 1:
        keep[1:] = (docs[1:] != docs[:-1]) | (sh[1:] != sh[:-1])
    docs, sh = docs[keep], sh[keep]
    counts = np.bincount(docs, minlength=n_docs).astype(np.int64)
    return docs, sh, counts


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def exact_duplicates(ds: rd.Dataset, text_col: str = "text",
                     id_col: str = "doc_id") -> rd.Dataset:
    """Per content hash: the kept (minimum) id and the copy count.

    Reference analogue: frontier dedup D1 (``PageAnalyzer.java:398-447``) —
    re-expressed as hash-partition + per-group aggregate instead of a
    DB-lock-guarded existence check.
    """
    hashed = ds.map_batches(content_hash_batch, batch_format="pyarrow",
                            fn_kwargs={"text_col": text_col})
    return hashed.groupby("content_hash").aggregate(
        Min(id_col, alias_name="keep_doc_id"),
        Count(alias_name="n_copies"),
    )


# --------------------------------------------------------------------------
# shingling helpers
# --------------------------------------------------------------------------

class _ShingleStage:
    """Actor-pool stage: doc -> distinct n-gram shingle hash rows.

    Each row carries the doc's total distinct-shingle count ``n_shingles``:
    the Jaccard denominator then rides THROUGH the pair pipeline instead of
    requiring a per-doc sizes lookup on the driver."""

    def __init__(self, n: int = 3, text_col: str = "text", id_col: str = "doc_id"):
        self.n = n
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[self.id_col].to_pylist(), np.int64)
        docs, sh, counts = _batch_shingles(batch[self.text_col].to_pylist(),
                                           self.n)
        return pa.table({
            "doc_id": pa.array(ids[docs], pa.int64()),
            "shingle": pa.array(sh, pa.uint64()),
            "n_shingles": pa.array(counts[docs], pa.int64()),
        })


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

class _MinHashStage:
    def __init__(self, n: int, num_perm: int, bands: int, text_col: str, id_col: str):
        assert num_perm % bands == 0
        self.n = n
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        sig_type = pa.binary(8 * self.num_perm)  # fixed_size_binary
        ids = np.asarray(batch[self.id_col].to_pylist(), np.int64)
        docs, sh, counts = _batch_shingles(batch[self.text_col].to_pylist(),
                                           self.n)
        with_sh = np.flatnonzero(counts > 0)
        if with_sh.size == 0:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "band": pa.array([], pa.int32()),
                "band_hash": pa.array([], pa.uint64()),
                "sig": pa.array([], sig_type),
            })
        # Batched MinHash: one (rows x num_perm) multiply-shift per chunk,
        # per-doc signature via segmented minimum.reduceat — identical values
        # to minhash_signature() per doc, no per-doc Python loop.
        a, b = _hash_params(self.num_perm, seed=7)
        seg_starts = np.searchsorted(docs, with_sh)
        sigs = np.empty((with_sh.size, self.num_perm), np.uint64)
        # chunk by docs so the expanded matrix stays ~64 MB
        rows_per_chunk = max(1, (8 << 20) // self.num_perm)
        d0 = 0
        while d0 < with_sh.size:
            d1 = d0
            r0 = seg_starts[d0]
            r_end = r0
            while d1 < with_sh.size and r_end - r0 < rows_per_chunk:
                d1 += 1
                r_end = seg_starts[d1] if d1 < with_sh.size else sh.size
            x = sh[r0:r_end, None] * a[None, :] + b[None, :]
            sigs[d0:d1] = np.minimum.reduceat(x, seg_starts[d0:d1] - r0,
                                              axis=0)
            d0 = d1
        # band hashes: polynomial combine of each band's rows + splitmix
        bands_view = sigs.reshape(with_sh.size, self.bands, self.rows_per_band)
        acc = np.zeros((with_sh.size, self.bands), np.uint64)
        for r in range(self.rows_per_band):
            acc = acc * _POLY_P + bands_view[:, :, r]
        band_hash = _splitmix64(acc)
        m = with_sh.size
        out_id = np.repeat(ids[with_sh], self.bands)
        out_band = np.tile(np.arange(self.bands, dtype=np.int32), m)
        # signatures as fixed_size_binary, built zero-copy from one repeated
        # uint64 matrix — the bucket verifier reinterprets the column's raw
        # buffer back into a (rows, num_perm) view with no per-row Python
        rep = np.repeat(sigs, self.bands, axis=0)
        sig_arr = pa.Array.from_buffers(
            sig_type, m * self.bands, [None, pa.py_buffer(rep.tobytes())])
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "band": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(band_hash.reshape(-1), pa.uint64()),
            "sig": sig_arr,
        })


def minhash_lsh_pairs(ds: rd.Dataset, *, n: int = 3, num_perm: int = 64,
                      bands: int = 16, threshold: float = 0.5,
                      text_col: str = "text", id_col: str = "doc_id",
                      max_bucket: int = 200) -> rd.Dataset:
    """Near-duplicate candidate pairs with estimated Jaccard >= threshold.

    shingle -> minhash -> band rows -> ``groupby(band, band_hash)`` ->
    in-bucket pairs -> signature-estimated Jaccard -> dedup pairs
    (``groupby(pair)`` keeps one row).  ``max_bucket`` caps the quadratic
    blowup of a degenerate bucket (logged in the row count, not silent).
    """
    bands_ds = ds.map_batches(
        _MinHashStage,
        fn_constructor_kwargs=dict(n=n, num_perm=num_perm, bands=bands,
                                   text_col=text_col, id_col=id_col),
        batch_format="pyarrow", concurrency=(1, 8),
    )
    n_parts = _shuffle_parts()

    def add_part(batch: pa.Table) -> pa.Table:
        bh = batch["band_hash"].to_numpy()
        b = batch["band"].to_numpy().astype(np.uint64)
        part = ((bh ^ (b * _POLY_P)) % np.uint64(n_parts)).astype(np.int32)
        return batch.append_column("bpart", pa.array(part, pa.int32()))

    def part_bucket_pairs(group: pa.Table) -> pa.Table:
        """All buckets routed to this part: walk (band, band_hash) runs;
        per multi-member bucket, one vectorized signature-agreement matrix.
        The sig column's fixed_size_binary buffer is reinterpreted ONCE as a
        (rows, num_perm) uint64 view — no per-row unpack in the wide stage."""
        bandc = group["band"].to_numpy()
        bhc = group["band_hash"].to_numpy()
        idsc = group["doc_id"].to_numpy()
        order, starts, ends = _key_runs(bandc.astype(np.uint64), bhc)
        a_out, b_out, j_out = [], [], []
        sig_mat = _fixed_binary_view(group["sig"], np.uint64)
        dropped_buckets = dropped_rows = 0
        for s, e in zip(starts, ends):
            m = e - s
            if m > max_bucket:
                dropped_buckets += 1
                dropped_rows += int(m)
                continue
            if m < 2:
                continue
            sel = order[s:e]
            ids = idsc[sel]
            iord = np.argsort(ids, kind="stable")
            sel = sel[iord]
            ids = ids[iord]
            sigs = sig_mat[sel]
            est = (sigs[:, None, :] == sigs[None, :, :]).mean(axis=2)
            ai, bi = np.triu_indices(int(m), k=1)
            ok = (est[ai, bi] >= threshold) & (ids[ai] != ids[bi])
            a_out.extend(ids[ai[ok]].tolist())
            b_out.extend(ids[bi[ok]].tolist())
            j_out.extend(est[ai[ok], bi[ok]].tolist())
        if dropped_buckets:
            # the cap is the documented recall boundary — make every drop
            # visible in the job log instead of silently shrinking recall
            logging.getLogger(__name__).warning(
                "minhash_lsh: dropped %d over-full band buckets "
                "(> max_bucket=%d; %d member rows) in this part",
                dropped_buckets, max_bucket, dropped_rows)
        return pa.table({"doc_a": pa.array(a_out, pa.int64()),
                         "doc_b": pa.array(b_out, pa.int64()),
                         "est_jaccard": pa.array(j_out, pa.float64())})

    pairs = bands_ds.map_batches(add_part, batch_format="pyarrow") \
        .groupby("bpart").map_groups(part_bucket_pairs, batch_format="pyarrow")
    # a pair can surface from several bands — keep one row
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Min("est_jaccard", alias_name="est_jaccard"))


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

class _SimHashStage:
    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        n_docs = len(texts)
        toks_per_doc = [_WORD_RE.findall((t or "").lower()) for t in texts]
        lens = np.array([len(t) for t in toks_per_doc], np.int64)
        total = int(lens.sum())
        sig_out = np.zeros(n_docs, np.uint64)
        if total:
            # one batch-wide token hash; per-(doc, token) weights via one
            # lexsort; bit accumulation as a segmented reduce — the same
            # weighted-simhash values as the per-doc simhash() loop
            flat = [t for toks in toks_per_doc for t in toks]
            h = stable_hash_array(flat)
            doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
            order = np.lexsort((h, doc_of))
            d_s, h_s = doc_of[order], h[order]
            first = np.ones(d_s.size, bool)
            if d_s.size > 1:
                first[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
            starts = np.flatnonzero(first)
            w = np.diff(np.append(starts, d_s.size)).astype(np.int64)
            d_u, h_u = d_s[starts], h_s[starts]
            bits = ((h_u[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int8)
            contrib = (bits * np.int8(2) - np.int8(1)
                       ).astype(np.int32) * w.astype(np.int32)[:, None]
            uniq_docs = np.unique(d_u)
            doc_seg = np.searchsorted(d_u, uniq_docs)
            acc = np.add.reduceat(contrib, doc_seg, axis=0)
            packed = ((acc > 0).astype(np.uint64)
                      * (np.uint64(1) << np.arange(64, dtype=np.uint64))
                      ).sum(axis=1, dtype=np.uint64)
            sig_out[uniq_docs] = packed
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "simhash": pa.array(sig_out, pa.uint64()),
        })


def simhash_pairs(ds: rd.Dataset, *, max_hamming: int = 8,
                  text_col: str = "text", id_col: str = "doc_id",
                  max_bucket: int = 500) -> rd.Dataset:
    """Near-dup pairs by 64-bit SimHash: bucket on each of four 16-bit bands
    (any pair within hamming<=8 shares at least one exact band by pigeonhole
    when the 8 differing bits fall outside it — probabilistic recall like
    standard simhash dedup), verify true hamming distance in-bucket."""
    sig_ds = ds.map_batches(_SimHashStage,
                            fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
                            batch_format="pyarrow", concurrency=(1, 8))
    return sig_hamming_pairs(sig_ds, sig_col="simhash",
                             max_hamming=max_hamming, max_bucket=max_bucket)


def sig_hamming_pairs(sig_ds: rd.Dataset, *, sig_col: str,
                      max_hamming: int = 8,
                      max_bucket: int = 500) -> rd.Dataset:
    """Generic banded-LSH hamming-pair stage over ANY 64-bit fingerprint
    column (``doc_id:int64, sig_col:uint64``): explode each signature into
    its four 16-bit bands, hash-partition by (band, band value) — coarse
    parts, see ``_shuffle_parts`` — and verify exact hamming distance inside
    each band bucket.  Pigeonhole recall: a pair differing in <= 15 bits
    whose differing bits all avoid one band is always found; buckets wider
    than ``max_bucket`` (degenerate/constant fingerprints) are dropped with
    a logged count, bounding the quadratic verify.  Shared by SimHash text
    dedup and dHash image dedup."""

    def explode_bands(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        sigs = batch[sig_col].to_numpy()
        n = len(ids)
        out_id = np.repeat(ids, 4)
        out_sig = np.repeat(sigs, 4)
        band = np.tile(np.arange(4, dtype=np.int32), n)
        band_val = (out_sig >> (band.astype(np.uint64) * np.uint64(16))) & np.uint64(0xFFFF)
        return pa.table({"doc_id": pa.array(out_id), "sig": pa.array(out_sig),
                         "band": pa.array(band), "band_val": pa.array(band_val)})

    banded = sig_ds.map_batches(explode_bands, batch_format="pyarrow")
    n_parts = _shuffle_parts()

    def add_part(batch: pa.Table) -> pa.Table:
        bv = batch["band_val"].to_numpy().astype(np.uint64)
        b = batch["band"].to_numpy().astype(np.uint64)
        part = (((bv * np.uint64(4) + b) * _POLY_P) % np.uint64(n_parts)
                ).astype(np.int32)
        return batch.append_column("bpart", pa.array(part, pa.int32()))

    def part_bucket_pairs(group: pa.Table) -> pa.Table:
        bandc = group["band"].to_numpy().astype(np.uint64)
        bvc = group["band_val"].to_numpy()
        idsc = group["doc_id"].to_numpy()
        sigc = group["sig"].to_numpy().astype(np.uint64)
        order, starts, ends = _key_runs(bandc, bvc)
        a_out, b_out, h_out = [], [], []
        dropped_buckets = dropped_rows = 0
        for s, e in zip(starts, ends):
            m = e - s
            if m > max_bucket:
                dropped_buckets += 1
                dropped_rows += int(m)
                continue
            if m < 2:
                continue
            sel = order[s:e]
            ids = idsc[sel]
            iord = np.argsort(ids, kind="stable")
            ids = ids[iord]
            sigs = sigc[sel][iord]
            for i in range(int(m) - 1):
                hs = hamming64(sigs[i + 1:], int(sigs[i]))
                hits = np.flatnonzero((hs <= max_hamming)
                                      & (ids[i + 1:] != ids[i]))
                if hits.size:
                    # array-segment appends: no per-hit Python in the
                    # verify (the last row-at-a-time loop in this family)
                    a_out.append(np.full(hits.size, ids[i], np.int64))
                    b_out.append(ids[i + 1 + hits])
                    h_out.append(hs[hits].astype(np.int32))
        if dropped_buckets:
            logging.getLogger(__name__).warning(
                "sig_hamming_pairs(%s): dropped %d over-full band buckets "
                "(> max_bucket=%d; %d member rows) in this part",
                sig_col, dropped_buckets, max_bucket, dropped_rows)
        a_np = np.concatenate(a_out) if a_out else np.empty(0, np.int64)
        b_np = np.concatenate(b_out) if b_out else np.empty(0, np.int64)
        h_np = np.concatenate(h_out) if h_out else np.empty(0, np.int32)
        return pa.table({"doc_a": pa.array(a_np, pa.int64()),
                         "doc_b": pa.array(b_np, pa.int64()),
                         "hamming": pa.array(h_np, pa.int32())})

    pairs = banded.map_batches(add_part, batch_format="pyarrow") \
        .groupby("bpart").map_groups(part_bucket_pairs, batch_format="pyarrow")
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Min("hamming", alias_name="hamming"))


def dhash_pairs(sig_ds: rd.Dataset, *, max_hamming: int = 2,
                max_bucket: int = 500) -> rd.Dataset:
    """Image near-dup pairs from dHash fingerprints: input is the
    ``DHashImage`` output (``doc_id:int64, dhash_hi:int64, dhash_lo:int64``
    — the two signed-int32-range halves of the 64-bit difference hash);
    pack the halves back into one uint64 and run the shared banded
    hamming-pair stage (``sig_hamming_pairs``).  Completes the image story
    the same way the text families end: fingerprint -> bucket -> verify ->
    ``(doc_a, doc_b, hamming)`` pairs, optionally fed to
    ``connected_components`` for clusters.  The decode+dHash upstream is
    the expensive actor-pool stage; this stage moves 16 bytes per image."""

    def pack(batch: pa.Table) -> pa.Table:
        hi = batch["dhash_hi"].to_numpy().astype(np.uint64)
        lo = batch["dhash_lo"].to_numpy().astype(np.uint64)
        return pa.table({
            "doc_id": batch["doc_id"],
            "sig64": pa.array((hi << np.uint64(32)) | lo, pa.uint64()),
        })

    packed = sig_ds.map_batches(pack, batch_format="pyarrow")
    return sig_hamming_pairs(packed, sig_col="sig64",
                             max_hamming=max_hamming, max_bucket=max_bucket)


# --------------------------------------------------------------------------
# exact n-gram Jaccard
# --------------------------------------------------------------------------

def ngram_jaccard_pairs(ds: rd.Dataset, *, n: int = 3, threshold: float = 0.5,
                        max_shingle_df: int = 50, text_col: str = "text",
                        id_col: str = "doc_id") -> rd.Dataset:
    """Exact word-n-gram Jaccard pairs >= threshold.

    |A∩B| via co-occurrence counts per shingle (hot shingles with
    df > ``max_shingle_df`` dropped — the cap is part of the operator's
    contract and mirrored in the SQL oracle), |A| / |B| from per-doc distinct
    shingle counts, joined in a final bucketed pass.
    """
    inter = _ngram_cooccurrence(ds, n=n, max_shingle_df=max_shingle_df,
                                text_col=text_col, id_col=id_col)

    def jaccard_batch(batch: pa.Table) -> pa.Table:
        ni = batch["n_inter"].to_numpy().astype(np.float64)
        na = batch["na"].to_numpy().astype(np.float64)
        nb = batch["nb"].to_numpy().astype(np.float64)
        j = ni / (na + nb - ni)
        out = pa.table({"doc_a": batch["doc_a"], "doc_b": batch["doc_b"],
                        "n_inter": batch["n_inter"],
                        "jaccard": pa.array(j, pa.float64())})
        return out.filter(pa.array(j >= threshold))

    return inter.map_batches(jaccard_batch, batch_format="pyarrow")


def ngram_containment_pairs(ds: rd.Dataset, *, n: int = 3,
                            threshold: float = 0.8,
                            max_shingle_df: int = 50,
                            text_col: str = "text",
                            id_col: str = "doc_id") -> rd.Dataset:
    """Exact word-n-gram CONTAINMENT pairs: ``|A∩B| / min(|A|, |B|)``
    >= threshold — the one-sided Jaccard that catches near-SUBSET
    duplication (boilerplate wrapping, quote-with-commentary, truncated
    copies), which symmetric Jaccard misses when the containing document
    is much larger.  Same co-occurrence plan and df-cap contract as
    :func:`ngram_jaccard_pairs`; the division is one IEEE op on small
    ints, bit-stable vs the SQL oracle."""
    inter = _ngram_cooccurrence(ds, n=n, max_shingle_df=max_shingle_df,
                                text_col=text_col, id_col=id_col)

    def containment_batch(batch: pa.Table) -> pa.Table:
        ni = batch["n_inter"].to_numpy().astype(np.float64)
        na = batch["na"].to_numpy()
        nb = batch["nb"].to_numpy()
        c = ni / np.minimum(na, nb).astype(np.float64)
        out = pa.table({"doc_a": batch["doc_a"], "doc_b": batch["doc_b"],
                        "n_inter": batch["n_inter"],
                        "containment": pa.array(c, pa.float64())})
        return out.filter(pa.array(c >= threshold))

    return inter.map_batches(containment_batch, batch_format="pyarrow")


def _ngram_cooccurrence(ds: rd.Dataset, *, n: int, max_shingle_df: int,
                        text_col: str, id_col: str) -> rd.Dataset:
    """Shared pair-co-occurrence core of the exact n-gram family:
    ``(doc_a, doc_b, n_inter, na, nb)`` for every pair sharing >= 1
    surviving shingle (df cap applied identically to all consumers)."""
    # TASK pool, not an actor pool: the stage's "state" is three scalars,
    # and inside a fused multi-stage execution the actor autoscaler's slow
    # ramp serialized the whole DAG (measured: 17-20 s end-to-end with the
    # (1,8) actor pool vs ~4 s with tasks at sf0.1)
    def shingle_batch(batch: pa.Table) -> pa.Table:
        return _ShingleStage(n=n, text_col=text_col, id_col=id_col)(batch)

    shingles = ds.map_batches(shingle_batch, batch_format="pyarrow")

    n_parts = _shuffle_parts()

    def add_part(batch: pa.Table) -> pa.Table:
        sh = batch["shingle"].to_numpy()
        part = (sh % np.uint64(n_parts)).astype(np.int32)
        return batch.append_column("spart", pa.array(part, pa.int32()))

    def emit_pairs(group: pa.Table) -> pa.Table:
        """All shingles routed to this part: per shared-shingle run (with
        2..max_shingle_df members), emit the doc-id pairs + denominators.

        Vectorized by RUN LENGTH: runs of equal length reshape into one
        (n_runs, m) matrix and explode through a single precomputed
        triu-index gather — at most ``max_shingle_df - 1`` numpy calls per
        group instead of one per run (a Python-per-run loop here cost ~8 s
        at sf0.1: ~256k tiny runs x ~30 us of call overhead)."""
        shc = group["shingle"].to_numpy()
        idsc = group["doc_id"].to_numpy()
        nsc = group["n_shingles"].to_numpy()
        order, starts, ends = _key_runs(shc)
        ids_sorted = idsc[order]
        ns_sorted = nsc[order]
        m = ends - starts
        keep = (m >= 2) & (m <= max_shingle_df)
        dropped_shingles = int((m > max_shingle_df).sum())
        ms, ss = m[keep], starts[keep]
        a_out, b_out, na_out, nb_out = [], [], [], []
        for mm in np.unique(ms):
            sel = ss[ms == mm]
            idx = sel[:, None] + np.arange(int(mm))
            mem_ids = ids_sorted[idx]
            mem_ns = ns_sorted[idx]
            ti, tj = np.triu_indices(int(mm), k=1)
            big_a = mem_ids[:, ti].ravel()
            big_b = mem_ids[:, tj].ravel()
            big_na = mem_ns[:, ti].ravel()
            big_nb = mem_ns[:, tj].ravel()
            swap = big_a > big_b
            a_out.append(np.where(swap, big_b, big_a))
            b_out.append(np.where(swap, big_a, big_b))
            na_out.append(np.where(swap, big_nb, big_na))
            nb_out.append(np.where(swap, big_na, big_nb))
        if dropped_shingles:
            # part of the operator contract (the SQL oracle applies the same
            # df cap) — logged at debug, unlike the LSH recall-loss warnings
            logging.getLogger(__name__).debug(
                "ngram_jaccard: ignored %d stop-shingles with df > "
                "max_shingle_df=%d in this part", dropped_shingles,
                max_shingle_df)
        if not a_out:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "n_partial": pa.array([], pa.int64()),
                             "na": pa.array([], pa.int64()),
                             "nb": pa.array([], pa.int64())})
        # map-side combine: the same pair repeats once per shared shingle
        # routed to this part — collapse to a partial co-occurrence count
        # before the global aggregate (classic combiner; cuts the expensive
        # two-key sort-aggregate's input severalfold)
        a = np.concatenate(a_out)
        b = np.concatenate(b_out)
        na = np.concatenate(na_out)
        nb = np.concatenate(nb_out)
        order, starts, ends = _key_runs(a, b)
        first = order[starts]
        return pa.table({"doc_a": pa.array(a[first], pa.int64()),
                         "doc_b": pa.array(b[first], pa.int64()),
                         "n_partial": pa.array(ends - starts, pa.int64()),
                         "na": pa.array(na[first], pa.int64()),
                         "nb": pa.array(nb[first], pa.int64())})

    pairs = shingles.map_batches(add_part, batch_format="pyarrow") \
        .groupby("spart").map_groups(emit_pairs, batch_format="pyarrow")
    # the Jaccard denominators na/nb are identical on every row of a pair
    # (each is a per-doc constant), so Min is just "pick it up" — no sizes
    # dict on the driver, no second pass over the shingle table
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Sum("n_partial", alias_name="n_inter"),
        Min("na", alias_name="na"), Min("nb", alias_name="nb"))


# --------------------------------------------------------------------------
# embedding cosine near-dup
# --------------------------------------------------------------------------

def drop_stop_terms(tf_ds: rd.Dataset, *, max_df: int,
                    term_col: str = "term",
                    max_broadcast_stop_terms: int = 5_000_000,
                    df_ds: rd.Dataset | None = None) -> rd.Dataset:
    """Remove every (doc, term) row whose term's document frequency exceeds
    ``max_df`` — BEFORE any term-keyed exchange sees those rows.

    This is the skew shield for :func:`sparse_cosine_pairs`: a stopword's
    posting set is corpus-sized, and routing it through ``groupby(term)``
    just to discard it inside the group funnels the whole set through ONE
    task.  The df table is vocab-scale (Ray's aggregate combines per block,
    so the hot term itself costs one partial row per block, never a
    co-located group), and the stop set — terms with df > max_df — is a
    small suffix of it:

    * stop set <= ``max_broadcast_stop_terms``: ``ray.put`` once, each
      batch drops members via one vectorized ``is_in`` (zero exchange on
      the tf stream);
    * past the guard: hash-partitioned ANTI join against the stop set —
      only then do tf rows shuffle, and the hot terms are on the SMALL
      (stop) side, which hash-partitions evenly by term.

    ``df_ds`` (columns ``(term_col, df)``) lets a caller that already owns
    a document-frequency table (the index build's ``term_df`` / dictionary
    aggregate) skip the internal df pre-pass entirely — then ``tf_ds`` is
    consumed exactly once, by the filter.  Without it the tf stream is
    materialized first so its upstream (the tokenize) runs ONCE even though
    two passes (df groupby + filter) read it — r4's measured 2x-tokenize
    regression on ``doc_cosine_pairs``; at a scale where the tf stream
    cannot fit the object store, pass ``df_ds``.
    """
    from ray.data.aggregate import Count

    from .relational import drop_empty_blocks

    if df_ds is None:
        tf_ds = tf_ds.materialize()
        df_ds = tf_ds.groupby(term_col).aggregate(Count(alias_name="df"))

    # materialize ONCE: the stop set is vocab-scale (stop terms only) and
    # is consumed twice below (count + gather / join side) — without this
    # the whole df pre-pass re-executes per consumer
    stop = drop_empty_blocks(
        df_ds.map_batches(
            lambda b: b.filter(pc.greater(b["df"], max_df))
            .select([term_col]),
            batch_format="pyarrow"),
        empty_schema=pa.schema([(term_col, pa.string())])).materialize()

    if stop.count() <= max_broadcast_stop_terms:
        blocks = [b if isinstance(b, pa.Table) else pa.Table.from_pandas(b)
                  for b in ray.get(stop.to_arrow_refs())]
        st = pa.concat_tables(blocks, promote_options="permissive")
        ref = ray.put(st[term_col].cast(pa.string()).combine_chunks())

        def drop(batch: pa.Table) -> pa.Table:
            stop_terms = ray.get(ref)
            if len(stop_terms) == 0:
                return batch
            return batch.filter(pc.invert(pc.is_in(
                batch[term_col], value_set=stop_terms)))

        return tf_ds.map_batches(drop, batch_format="pyarrow")

    from .relational import shuffle_hash_join

    return shuffle_hash_join(tf_ds, stop, on=(term_col,), how="anti")


def sparse_cosine_pairs(tf_ds: rd.Dataset, *, threshold: tuple[int, int],
                        max_df: int = 64, doc_col: str = "doc_id",
                        term_col: str = "term", tf_col: str = "tf",
                        max_broadcast_docs: int = 5_000_000,
                        max_broadcast_stop_terms: int = 5_000_000,
                        df_ds: rd.Dataset | None = None) -> rd.Dataset:
    """Document pairs whose raw-tf cosine similarity >= num/den — sparse
    all-pairs similarity over the INVERTED layout (a sixth dedup family:
    term-vector near-dup, the text analogue of ``embedding_dup_pairs``).

    Frozen exact spec (mirrored by the SQL oracle):

    * vector space = terms with document frequency <= ``max_df`` ("stop
      terms" carry no similarity signal and are what makes naive sparse
      all-pairs quadratic — the cap is part of the spec, applied
      identically in SQL);
    * numerator(a, b) = sum of tf_a * tf_b over shared kept terms;
      normsq(d) = sum of tf^2 over kept terms — all int64, order-free;
    * the threshold test runs in IEEE float64 with a FIXED operation
      order, identical in numpy and DuckDB:
      ``(numer * numer) * den^2 >= num^2 * (normsq_a * normsq_b)``.

    Scale shape: stop terms are removed by :func:`drop_stop_terms` BEFORE
    the term exchange (df pre-pass + broadcast/anti-join filter), so no
    ``groupby(term)`` task ever receives a corpus-sized posting set; then
    ONE ``groupby(term)`` — each term group (<= max_df rows by
    construction, so bounded quadratic) emits its pair partials AND its
    diagonal (doc, doc, tf^2) rows into the SAME schema, so ONE further
    ``groupby(a, b)`` sums both numerators and norms; the diagonal splits
    off as the norms table, which joins back by broadcast below
    ``max_broadcast_docs`` and by two shuffle hash joins past it.  No
    stage ever holds more than one term group + one batch.
    """
    num, den = threshold

    tf_ds = drop_stop_terms(
        tf_ds, max_df=max_df, term_col=term_col,
        max_broadcast_stop_terms=max_broadcast_stop_terms, df_ds=df_ds)

    def per_term(group: pa.Table) -> pa.Table:
        m = group.num_rows
        docs = group[doc_col].to_numpy(zero_copy_only=False)
        tfs = group[tf_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if m > max_df:  # stop term: contributes nothing, not even norms
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64())})
        order = np.argsort(docs)
        docs, tfs = docs[order], tfs[order]
        ia, ib = np.triu_indices(m, k=1)
        id_a = np.concatenate([docs[ia], docs])
        id_b = np.concatenate([docs[ib], docs])
        v = np.concatenate([tfs[ia] * tfs[ib], tfs * tfs])
        return pa.table({"id_a": pa.array(id_a, pa.int64()),
                         "id_b": pa.array(id_b, pa.int64()),
                         "v": pa.array(v, pa.int64())})

    # materialize ONCE: the aggregated (pair, v) table is bounded by the
    # df cap (sum of df^2/2 over kept terms), and three consumers follow
    # (norms gather, pair filter) — without this the whole two-groupby
    # chain re-executes per consumer (measured 3x wall)
    summed = tf_ds.groupby(term_col).map_groups(
        per_term, batch_format="pyarrow") \
        .groupby(["id_a", "id_b"]).aggregate(Sum("v", alias_name="v")) \
        .materialize()

    # split diagonal (norms) from off-diagonal (numerators)
    def diag(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch["id_a"], batch["id_b"])
        t = batch.filter(m)
        return pa.table({doc_col: t["id_a"], "normsq": t["v"]})

    def offdiag(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.invert(
            pc.equal(batch["id_a"], batch["id_b"])))

    norms = summed.map_batches(diag, batch_format="pyarrow")
    pairs = summed.map_batches(offdiag, batch_format="pyarrow")

    num2 = float(num * num)
    den2 = float(den * den)
    # cheap now: summed is materialized, count() runs only the diag filter
    n_docs = norms.count()

    if n_docs <= max_broadcast_docs:
        nt = pa.concat_tables(
            ray.get(norms.to_arrow_refs()), promote_options="permissive")
        keys = nt[doc_col].to_numpy(zero_copy_only=False)
        vals = nt["normsq"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(keys)
        ref = ray.put((keys[order], vals[order]))

        def finish(batch: pa.Table) -> pa.Table:
            k, v = ray.get(ref)
            a = batch["id_a"].to_numpy(zero_copy_only=False)
            b = batch["id_b"].to_numpy(zero_copy_only=False)
            numer = batch["v"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            na = v[np.searchsorted(k, a)]
            nb = v[np.searchsorted(k, b)]
            fn = numer.astype(np.float64)
            ok = (fn * fn) * den2 >= num2 * (na.astype(np.float64)
                                             * nb.astype(np.float64))
            t = batch.filter(pa.array(ok))
            return pa.table({
                "id_a": t["id_a"], "id_b": t["id_b"],
                "numer": t["v"].cast(pa.int64()),
                "normsq_a": pa.array(na[ok], pa.int64()),
                "normsq_b": pa.array(nb[ok], pa.int64()),
            })

        return pairs.map_batches(finish, batch_format="pyarrow")

    # beyond the broadcast guard: two hash-partitioned joins ship only the
    # (pair, normsq) rows — nothing doc-proportional in one place
    from .relational import shuffle_hash_join

    def _ren(suffix):
        def f(batch: pa.Table) -> pa.Table:
            return batch.rename_columns(
                [doc_col, f"normsq_{suffix}"])
        return f

    na_ds = norms.map_batches(_ren("a"), batch_format="pyarrow")
    nb_ds = norms.map_batches(_ren("b"), batch_format="pyarrow")
    j = shuffle_hash_join(pairs, na_ds, on=("id_a",), right_on=(doc_col,))
    j = shuffle_hash_join(j, nb_ds, on=("id_b",), right_on=(doc_col,))

    def finish_shuffled(batch: pa.Table) -> pa.Table:
        numer = batch["v"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = batch["normsq_a"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        nb = batch["normsq_b"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        ok = (numer * numer) * den2 >= num2 * (na * nb)
        t = batch.filter(pa.array(ok))
        return pa.table({
            "id_a": t["id_a"], "id_b": t["id_b"],
            "numer": t["v"].cast(pa.int64()),
            "normsq_a": t["normsq_a"].cast(pa.int64()),
            "normsq_b": t["normsq_b"].cast(pa.int64()),
        })

    return j.map_batches(finish_shuffled, batch_format="pyarrow")


def embedding_dup_pairs(emb_ds: rd.Dataset, *, threshold: float = 0.95,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        max_rows: int = 100_000) -> rd.Dataset:
    """Cosine-similar pairs (>= threshold) via blocked matmul against a
    broadcast normalized matrix (``ray.put`` once, read per task — no
    per-batch reshipping).  O(N^2/blocks) compute.

    This is the EXACT oracle for the approximate families.  ``max_rows``
    makes the quadratic boundary explicit: beyond it the call refuses and
    points at the scale path (``similarity.knn_lsh_buckets``) instead of
    quietly running an N^2 job at 100 TB.  The actual work delegates to
    :func:`embedding_dup_pairs_blocked` — one implementation, no driver-side
    matrix, no per-row Python hit loop.
    """
    n = emb_ds.count()
    if n > max_rows:
        raise ValueError(
            f"embedding_dup_pairs is the exact O(N^2) fixture oracle; input "
            f"has {n} rows > max_rows={max_rows}. Use "
            "similarity.knn_lsh_buckets (LSH-bucketed cosine) at scale, or "
            "raise max_rows explicitly / call embedding_dup_pairs_blocked "
            "directly if the quadratic cost is intended.")
    return embedding_dup_pairs_blocked(emb_ds, threshold=threshold,
                                       id_col=id_col, vec_col=vec_col)


def _table_matrix(t: pa.Table, id_col: str, vec_col: str
                  ) -> tuple[np.ndarray, np.ndarray]:
    """(ids, float64 matrix) from a (id, list<float>) table, zero-copy on
    the flattened values (one reshape, no per-row Python)."""
    ids = t[id_col].to_numpy()
    col = t[vec_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = np.asarray(col.flatten(), np.float64)
    return ids, flat.reshape(len(t), -1) if len(t) else flat.reshape(0, 0)


def embedding_dup_pairs_blocked(emb_ds: rd.Dataset, *,
                                threshold: float = 0.95,
                                id_col: str = "vec_id",
                                vec_col: str = "embedding",
                                target_block_rows: int = 4096,
                                max_blocks: int = 256) -> rd.Dataset:
    """Exact cosine-similar pairs (>= threshold) without ANY driver-side
    or whole-matrix materialization: the normalized table is materialized
    into the OBJECT STORE once, and every block pair (i <= j) becomes one
    Ray task that matmuls two ~``target_block_rows`` blocks (zero-copy
    plasma reads) and emits its thresholded pairs.  Per-task memory is two
    blocks + one block-pair sim matrix; results stream back as Arrow refs
    (``ray.data.from_arrow_refs``), never through the driver.

    Scale contract: block-pair count is B(B+1)/2, so exact all-pairs stays
    quadratic in N — the operator auto-grows blocks to keep B <= ``max_blocks``
    (bounding the task count, at the price of per-task memory) and is the
    exact mid-scale path (~10M rows); beyond that the sub-quadratic LSH
    route (``similarity.knn_lsh_buckets``) is the 100-TB family, with this
    operator as its verification oracle on sampled buckets.

    This is the raw-Ray-tasks escape hatch the Dataset API genuinely cannot
    express (an all-block-pairs cross product); everything upstream
    (normalize, column prune) and downstream (the returned Dataset) stays
    in Dataset land.
    """
    import math

    import ray

    def normalize(batch: pa.Table) -> pa.Table:
        ids, mat = _table_matrix(batch, id_col, vec_col)
        mat = mat / np.maximum(
            np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        d = mat.shape[1] if mat.size else 0
        offsets = pa.array(
            np.arange(0, (len(ids) + 1) * d, max(d, 1), dtype=np.int32)
            if d else np.zeros(len(ids) + 1, np.int32))
        lst = pa.ListArray.from_arrays(offsets, pa.array(mat.ravel()))
        return pa.table({id_col: pa.array(ids, pa.int64()), vec_col: lst})

    normed = emb_ds.select_columns([id_col, vec_col]) \
        .map_batches(normalize, batch_format="pyarrow").materialize()
    n = normed.count()
    if n == 0:
        return rd.from_arrow(pa.table({
            "vec_a": pa.array([], pa.int64()),
            "vec_b": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64())}))
    nblocks = min(max_blocks, max(1, math.ceil(n / target_block_rows)))
    refs = normed.repartition(nblocks).materialize().to_arrow_refs()

    @ray.remote
    def pair_task(ta: pa.Table, tb: pa.Table, same: bool) -> pa.Table:
        ids_a, a = _table_matrix(ta, id_col, vec_col)
        ids_b, b = _table_matrix(tb, id_col, vec_col)
        if not a.size or not b.size:
            sims = np.zeros((len(ids_a), len(ids_b)))
        else:
            sims = a @ b.T
        r, c = np.nonzero(sims >= threshold)
        ia, ib = ids_a[r].astype(np.int64), ids_b[c].astype(np.int64)
        s = sims[r, c]
        keep = ia < ib if same else ia != ib
        ia, ib, s = ia[keep], ib[keep], s[keep]
        lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
        return pa.table({"vec_a": pa.array(lo, pa.int64()),
                         "vec_b": pa.array(hi, pa.int64()),
                         "cosine": pa.array(s, pa.float64())})

    futs = [pair_task.remote(refs[i], refs[j], i == j)
            for i in range(len(refs)) for j in range(i, len(refs))]
    return rd.from_arrow_refs(futs)


# --------------------------------------------------------------------------
# substring family: exact duplicated-SPAN stats (ExactSubstr dedup)
# --------------------------------------------------------------------------

_SS_BASE = np.uint64(0x100000001B3)        # FNV-1a prime: odd => invertible
_SS_INV = np.uint64(pow(0x100000001B3, -1, 1 << 64))  # ... mod 2^64


def _char_kgram_hashes(texts: list[str], k: int
                       ) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                                  np.ndarray]:
    """(doc_ix, start, fingerprint) for every length-``k`` CHARACTER window
    of every text, plus per-doc window counts.  CHARACTER (codepoint)
    windows — not bytes — so semantics match SQL ``substr`` on any script.

    O(L) per doc via a rolling polynomial fingerprint in uint64
    wrap-around arithmetic: with S[i] = sum_{j<i} c[j]*inv^j and
    P[i] = base^i, window hash h_i = (S[i+k]-S[i]) * P[i+k-1]
    = sum_t c[i+t]*base^(k-1-t) — no per-window loop, no (L,k) blow-up.
    Two distinct windows collide with probability ~2^-64 (the same
    accepted fingerprint contract as the word-n-gram families)."""
    doc_ix: list[np.ndarray] = []
    starts: list[np.ndarray] = []
    hashes: list[np.ndarray] = []
    counts = np.zeros(len(texts), np.int64)
    for d, t in enumerate(texts):
        t = t or ""                     # NULL text == empty (SQL length)
        L = len(t)
        n = L - k + 1
        if n <= 0:
            continue
        counts[d] = n
        c = np.frombuffer(t.encode("utf-32-le"), np.uint32).astype(np.uint64)
        inv_pows = np.full(L, _SS_INV, np.uint64)
        inv_pows[0] = np.uint64(1)
        np.multiply.accumulate(inv_pows, out=inv_pows)      # inv^0..inv^(L-1)
        s = np.zeros(L + 1, np.uint64)
        np.add.accumulate(c * inv_pows, out=s[1:])          # wraparound sums
        base_pows = np.full(L, _SS_BASE, np.uint64)
        if k >= 2:
            base_pows[0] = _SS_BASE
            np.multiply.accumulate(base_pows, out=base_pows)
            mult = base_pows[k - 2:k - 2 + n]               # base^(i+k-1)
        else:
            mult = np.ones(n, np.uint64)
        h = (s[k:k + n] - s[:n]) * mult
        doc_ix.append(np.full(n, d, np.int64))
        starts.append(np.arange(n, dtype=np.int64))
        hashes.append(h)
    if not hashes:
        z = np.zeros(0, np.int64)
        return z, z, np.zeros(0, np.uint64), counts
    return (np.concatenate(doc_ix), np.concatenate(starts),
            np.concatenate(hashes), counts)


def _merged_span_stats(starts: np.ndarray, seg_offsets: np.ndarray, k: int
                       ) -> tuple[np.ndarray, np.ndarray]:
    """Per segment (doc), the union size and count of maximal contiguous
    regions covered by intervals [s, s+k-1] over SORTED starts.  Fully
    vectorized across segments: gaps = diff within segment clipped at k;
    n_masked = k per segment + sum(min(gap, k)); n_spans = 1 +
    count(gap > k).  ``seg_offsets`` are [0, n1, n1+n2, ...] boundaries."""
    nseg = len(seg_offsets) - 1
    n_masked = np.zeros(nseg, np.int64)
    n_spans = np.zeros(nseg, np.int64)
    sizes = np.diff(seg_offsets)
    has = sizes > 0
    if not has.any():
        return n_masked, n_spans
    d = np.diff(starts)
    if d.size:
        # zero out diffs that cross a segment boundary
        boundary = np.zeros(starts.size - 1, bool)
        inner = seg_offsets[1:-1]
        boundary[inner[(inner > 0) & (inner < starts.size)] - 1] = True
        capped = np.minimum(d, k)
        capped[boundary] = 0
        breaks = (d > k) & ~boundary
        cs = np.concatenate([[0], np.cumsum(capped)])
        cb = np.concatenate([[0], np.cumsum(breaks)])
        # clip: offsets of EMPTY segments may equal starts.size (one past
        # cs's end); their lanes are discarded by [has] below
        e = np.clip(seg_offsets[1:] - 1, 0, cs.size - 1)
        s0 = np.clip(seg_offsets[:-1], 0, cs.size - 1)
        n_masked[has] = (cs[e] - cs[s0])[has]
        n_spans[has] = (cb[e] - cb[s0])[has]
    n_masked[has] += k
    n_spans[has] += 1
    return n_masked, n_spans


def substring_dedup_stats(corpus: rd.Dataset, *, k: int = 15,
                          text_col: str = "text", id_col: str = "doc_id",
                          max_broadcast: int = 50_000_000,
                          force_shuffle: bool = False,
                          emit_text: bool = False) -> rd.Dataset:
    """Exact duplicated-substring SPAN statistics — the Ray-Data-native
    form of ExactSubstr dedup (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better", §3: remove every span whose
    length-``k`` window occurs at a second position anywhere in the
    corpus).  Where the paper builds one suffix array, this engine needs
    only (a) a document-frequency ``groupby`` over rolling-hash k-gram
    fingerprints and (b) a per-doc interval union — both embarrassingly
    parallel over blocks, nothing corpus-sized in any one process.

    Plans, mirroring :func:`~.contamination.duplicate_ngram_stats`:

    1. duplicated fingerprints (total occurrences >= 2, same doc or not)
       come from one ``groupby``; if they fit ``max_broadcast`` they are
       ``ray.put`` once and every batch probes with one ``searchsorted``,
       masking spans locally.
    2. past the guard (or ``force_shuffle``) the positional table
       hash-partitions by fingerprint into a semi-join, duplicated starts
       come back to their doc via one ``groupby(doc_id)``, and the
       interval union runs per group.

    The broadcast plan recomputes the O(L) rolling hash in the probe pass
    instead of materializing the positional (doc, start, fp) table — a
    DELIBERATE inversion of the drop_stop_terms lesson (r4 verdict):
    there the re-executed upstream was a full tokenize feeding a shuffle
    anyway, here the positional table is ~8x the corpus bytes and the
    recompute is one cheap vectorized pass over data the probe must read
    regardless.

    Output per input document (all-integer, hash-stable):
    ``(doc_id, n_chars, n_windows, n_dup_starts, n_spans, n_masked)``
    where ``n_masked`` is the union size of all [start, start+k-1]
    intervals whose window is duplicated and ``n_spans`` the count of
    maximal contiguous masked regions.  With ``emit_text=True`` a
    ``clean_text`` column is appended — the unmasked characters in order,
    i.e. the document with every duplicated span REMOVED (the paper's
    actual transform; broadcast plan only, since the span removal needs
    the text beside the mask).
    """
    if emit_text and force_shuffle:
        raise ValueError("emit_text requires the broadcast plan")
    narrow = corpus.select_columns([id_col, text_col])

    def fingerprints(batch: pa.Table) -> pa.Table:
        _, _, h, _ = _char_kgram_hashes(batch[text_col].to_pylist(), k)
        # per-batch combiner: collapse repeated windows BEFORE the df
        # exchange — repeated phrases inside a batch never ship twice
        fp, cnt = np.unique(h, return_counts=True)
        return pa.table({"fp": pa.array(fp.view(np.int64), pa.int64()),
                         "one": pa.array(cnt.astype(np.int64))})

    df = narrow.map_batches(fingerprints, batch_format="pyarrow") \
        .groupby("fp").aggregate(Sum("one", alias_name="occ"))
    dup_ds = df.filter(expr="occ >= 2").select_columns(["fp"]).materialize()

    if force_shuffle or dup_ds.count() > max_broadcast:
        return _substring_dedup_shuffle(narrow, dup_ds, k=k,
                                        text_col=text_col, id_col=id_col)

    parts = [t["fp"].to_numpy().view(np.uint64)
             for t in (ray.get(r) for r in dup_ds.to_arrow_refs())
             if t.num_rows]                 # skip schemaless empty blocks
    dup_sorted = np.sort(np.concatenate(parts)) if parts \
        else np.zeros(0, np.uint64)
    ref = ray.put(dup_sorted)

    def mask_spans(batch: pa.Table) -> pa.Table:
        bad = ray.get(ref)
        ids = batch[id_col].to_numpy()
        texts = [t or "" for t in batch[text_col].to_pylist()]
        docs, starts, h, counts = _char_kgram_hashes(texts, k)
        n_chars = np.array([len(t) for t in texts], np.int64)
        if bad.size and h.size:
            pos = np.searchsorted(bad, h)
            pos[pos == bad.size] = 0
            hit = bad[pos] == h
        else:
            hit = np.zeros(h.size, bool)
        n_dup = np.bincount(docs[hit], minlength=len(ids)).astype(np.int64)
        seg = np.concatenate([[0], np.cumsum(n_dup)])
        n_masked, n_spans = _merged_span_stats(starts[hit], seg, k)
        out = {
            "doc_id": pa.array(ids, pa.int64()),
            "n_chars": pa.array(n_chars, pa.int64()),
            "n_windows": pa.array(counts, pa.int64()),
            "n_dup_starts": pa.array(n_dup, pa.int64()),
            "n_spans": pa.array(n_spans, pa.int64()),
            "n_masked": pa.array(n_masked, pa.int64()),
        }
        if emit_text:
            hs = starts[hit]
            clean = []
            for d, t in enumerate(texts):
                s = hs[seg[d]:seg[d + 1]]
                if not s.size:
                    clean.append(t)
                    continue
                L = len(t)
                delta = np.zeros(L + 1, np.int32)   # diff-array span union
                np.add.at(delta, s, 1)
                np.add.at(delta, np.minimum(s + k, L), -1)
                keep = np.cumsum(delta[:-1]) == 0
                cp = np.frombuffer(t.encode("utf-32-le"), np.uint32)
                clean.append(cp[keep].tobytes().decode("utf-32-le"))
            out["clean_text"] = pa.array(clean, pa.string())
        return pa.table(out)

    return narrow.map_batches(mask_spans, batch_format="pyarrow")


def _substring_dedup_shuffle(narrow: rd.Dataset, dup_ds: rd.Dataset, *,
                             k: int, text_col: str, id_col: str
                             ) -> rd.Dataset:
    """No-broadcast plan for :func:`substring_dedup_stats`: semi-join the
    positional fingerprint table against the duplicated set, union the
    intervals per ``groupby(doc_id)`` group, left-join back onto per-doc
    totals so untouched documents keep their zero row."""
    from .relational import drop_empty_blocks, shuffle_hash_join

    def positions(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        docs, starts, h, _ = _char_kgram_hashes(batch[text_col].to_pylist(),
                                                k)
        return pa.table({id_col: pa.array(ids[docs], pa.int64()),
                         "start": pa.array(starts, pa.int64()),
                         "fp": pa.array(h.view(np.int64), pa.int64())})

    def totals(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        _, _, _, counts = _char_kgram_hashes(texts, k)
        return pa.table({
            id_col: pa.array(batch[id_col].to_numpy(), pa.int64()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            "n_windows": pa.array(counts, pa.int64())})

    dup_clean = drop_empty_blocks(dup_ds, empty_schema=pa.schema(
        [("fp", pa.int64())]))
    pos = narrow.map_batches(positions, batch_format="pyarrow")
    hits = shuffle_hash_join(pos, dup_clean, on=("fp",), how="semi") \
        .select_columns([id_col, "start"])

    def union_group(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy()
        starts = np.sort(group["start"].to_numpy())
        seg = np.array([0, starts.size], np.int64)
        n_masked, n_spans = _merged_span_stats(starts, seg, k)
        return pa.table({
            id_col: pa.array(ids[:1], pa.int64()),
            "n_dup_starts": pa.array([starts.size], pa.int64()),
            "n_spans": pa.array(n_spans, pa.int64()),
            "n_masked": pa.array(n_masked, pa.int64())})

    per_doc = hits.groupby(id_col).map_groups(union_group,
                                              batch_format="pyarrow")
    per_doc = drop_empty_blocks(per_doc, empty_schema=pa.schema(
        [(id_col, pa.int64()), ("n_dup_starts", pa.int64()),
         ("n_spans", pa.int64()), ("n_masked", pa.int64())]))
    tot = narrow.map_batches(totals, batch_format="pyarrow")
    joined = shuffle_hash_join(tot, per_doc, on=(id_col,), how="left")

    def fill(batch: pa.Table) -> pa.Table:
        out = {id_col: batch[id_col],
               "n_chars": batch["n_chars"],
               "n_windows": batch["n_windows"]}
        for c in ("n_dup_starts", "n_spans", "n_masked"):
            out[c] = pc.fill_null(batch[c], 0)
        return pa.table(out)

    return joined.map_batches(fill, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Exact Jaccard all-pairs via PREFIX FILTERING (PPJoin-style)
# --------------------------------------------------------------------------

def jaccard_prefix_pairs(ds: rd.Dataset, *, n: int = 3,
                         threshold: float = 0.5,
                         text_col: str = "text",
                         id_col: str = "doc_id",
                         broadcast_df_max: int = 5_000_000,
                         force_shuffle: bool = False) -> rd.Dataset:
    """EXACT word-n-gram Jaccard >= threshold, all pairs, NO df cap —
    the production-shaped exact path (prefix filtering, Chaudhuri et al.
    SSJoin / Bayardo et al. WWW'07 all-pairs), closing the gap where
    :func:`ngram_jaccard_pairs`'s co-occurrence plan needs a hot-shingle
    cap to bound its candidate volume.

    Theorem used: order all shingles by one GLOBAL total order (here
    (df asc, shingle asc) — rarest first, any total order is correct);
    a doc of size s with Jaccard >= t against ANY partner must share at
    least ceil(t*s) shingles with it, so two qualifying docs always
    share a shingle inside each one's first ``s - ceil(t*s) + 1``
    ordered shingles.  Only those PREFIX shingles generate candidates:
    hot shingles sort last and essentially never enter a prefix, so
    candidate buckets stay small WITHOUT dropping pairs.

    Plan: shingle stream -> df groupby -> prefix selection -> candidate
    pairs per prefix shingle (run-triu expansion) -> pair dedup + length
    filter (min >= t*max) -> relational verification (pairs explode
    against doc_a's shingle rows, inner-join on (doc_b, shingle) = the
    intersection) -> per-pair count groupby.

    The df table attaches by GUARDED BROADCAST (it is vocabulary-scale;
    under ``broadcast_df_max`` distinct shingles it ships once via
    ``ray.put`` and prefix selection runs per BATCH, because
    ``_ShingleStage`` keeps each doc's shingles inside one batch — two
    exchanges saved); past the guard, or with ``force_shuffle=True``
    (parity tests), it hash-joins back and prefix selection runs per
    doc-part group.  Either way every other exchange is
    hash-partitioned; nothing row-proportional touches the driver.
    """
    from ray.data.aggregate import Sum

    from .relational import shuffle_hash_join

    def shingle_i64(b: pa.Table) -> pa.Table:
        # Ray's groupby/aggregate pickles uint64 keys into an extension
        # type the join can't key on — reinterpret the hash bits as int64
        # for this operator (any total order works for the prefix)
        t = _ShingleStage(n=n, text_col=text_col, id_col=id_col)(b)
        sh = t["shingle"].to_numpy().view(np.int64)
        return pa.table({"doc_id": t["doc_id"],
                         "shingle": pa.array(sh, pa.int64()),
                         "n_shingles": t["n_shingles"]})

    shingles = ds.map_batches(shingle_i64, batch_format="pyarrow")

    def df_partial(b: pa.Table) -> pa.Table:
        sh = b["shingle"].to_numpy()
        keys, counts = np.unique(sh, return_counts=True)
        return pa.table({"shingle": pa.array(keys, pa.int64()),
                         "c": pa.array(counts.astype(np.int64), pa.int64())})

    df = shingles.map_batches(df_partial, batch_format="pyarrow") \
        .groupby("shingle").aggregate(Sum("c", alias_name="df"))

    n_parts = _shuffle_parts()

    def add_dpart(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy()
        return b.append_column(
            "dpart", pa.array((d % n_parts).astype(np.int32), pa.int32()))

    def _prefix_core(d, sh, dfv, ns):
        """Sort rows by (doc, df, shingle) but RUN by doc alone: the
        (df, shingle) tail is the global prefix order within each doc;
        keep the first ``s - ceil(t*s) + 1`` per doc."""
        order = np.lexsort((sh, dfv, d))
        d_s = d[order]
        change = np.concatenate(([True], d_s[1:] != d_s[:-1]))
        starts = np.flatnonzero(change)
        ends = np.concatenate((starts[1:], [d.size]))
        pos = np.arange(d.size, dtype=np.int64)
        run_start = np.repeat(starts, ends - starts)
        rank = pos - run_start                       # 0-based within doc
        s = ns[order].astype(np.int64)
        alpha = np.ceil(threshold * s - 1e-12).astype(np.int64)
        p = np.maximum(s - alpha + 1, 1)
        keep = rank < p
        idx = order[keep]
        return pa.table({
            "shingle": pa.array(sh[idx], pa.int64()),
            "doc_id": pa.array(d[idx], pa.int64()),
            "n_shingles": pa.array(ns[idx], pa.int64()),
            "rank": pa.array(rank[keep], pa.int64())})

    df = df.materialize()        # consumed twice: count + collect/join
    n_distinct = df.count()
    if n_distinct <= broadcast_df_max and not force_shuffle:
        # vocabulary fits a worker heap: ship (sorted keys, df) once and
        # select prefixes per BATCH — _ShingleStage keeps each doc's
        # shingles inside one output batch, so no doc-part exchange
        df_tbl = pa.concat_tables(
            ray.get(df.to_arrow_refs()), promote_options="permissive")
        keys = df_tbl["shingle"].to_numpy(zero_copy_only=False)
        vals = df_tbl["df"].to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        ref = ray.put((keys[order], vals[order]))

        def prefix_batch(b: pa.Table) -> pa.Table:
            g_keys, g_vals = ray.get(ref)
            sh = b["shingle"].to_numpy()
            dfv = g_vals[np.searchsorted(g_keys, sh)]
            return _prefix_core(b["doc_id"].to_numpy(), sh, dfv,
                                b["n_shingles"].to_numpy())

        prefixes = shingles.map_batches(prefix_batch,
                                        batch_format="pyarrow")
    else:
        enriched = shuffle_hash_join(shingles, df, on=("shingle",),
                                     how="inner")

        def prefix_select(g: pa.Table) -> pa.Table:
            return _prefix_core(g["doc_id"].to_numpy(),
                                g["shingle"].to_numpy(),
                                g["df"].to_numpy(),
                                g["n_shingles"].to_numpy())

        prefixes = enriched.map_batches(add_dpart,
                                        batch_format="pyarrow") \
            .groupby("dpart").map_groups(prefix_select,
                                         batch_format="pyarrow")

    def add_spart(b: pa.Table) -> pa.Table:
        sh = b["shingle"].to_numpy().view(np.uint64)
        return b.append_column(
            "spart", pa.array((sh % np.uint64(n_parts)).astype(np.int32),
                              pa.int32()))

    def emit_candidates(g: pa.Table) -> pa.Table:
        """Per prefix-shingle run: triu pair expansion (same run-length
        batching as the co-occurrence core) + two loss-free prunes —
        the LENGTH filter (Jaccard >= t needs min(na, nb) >= t*max)
        and the POSITIONAL filter (this shared shingle sits at global
        rank i in A and j in B, so at most min(na - i, nb - j) matches
        remain; a qualifying pair needs ceil(t/(1+t)(na+nb)) and its
        first shared prefix element always passes the bound)."""
        sh = g["shingle"].to_numpy()
        ids = g["doc_id"].to_numpy()
        ns = g["n_shingles"].to_numpy()
        rk = g["rank"].to_numpy()
        # runs by SHINGLE alone (ids sorted within for determinism)
        order = np.lexsort((ids, sh))
        sh_s = sh[order]
        change = np.concatenate(([True], sh_s[1:] != sh_s[:-1]))
        starts = np.flatnonzero(change)
        ends = np.concatenate((starts[1:], [sh.size]))
        ids_s, ns_s, rk_s = ids[order], ns[order], rk[order]
        m = ends - starts
        keep = m >= 2
        ms, ss = m[keep], starts[keep]
        cols = [[], [], [], [], [], []]   # a, b, na, nb, ra, rb
        for mm in np.unique(ms):
            rs = ss[ms == mm]
            block_ids = ids_s[rs[:, None] + np.arange(mm)]
            block_ns = ns_s[rs[:, None] + np.arange(mm)]
            block_rk = rk_s[rs[:, None] + np.arange(mm)]
            iu, ju = np.triu_indices(int(mm), k=1)
            for c, blk, sel in ((0, block_ids, iu), (1, block_ids, ju),
                                (2, block_ns, iu), (3, block_ns, ju),
                                (4, block_rk, iu), (5, block_rk, ju)):
                cols[c].append(blk[:, sel].ravel())
        if cols[0]:
            a, b, na, nb, ra, rb = (np.concatenate(c) for c in cols)
            swap = a > b
            a2 = np.where(swap, b, a)
            b2 = np.where(swap, a, b)
            na2 = np.where(swap, nb, na)
            nb2 = np.where(swap, na, nb)
            ra2 = np.where(swap, rb, ra)
            rb2 = np.where(swap, ra, rb)
            alpha = np.ceil(threshold / (1.0 + threshold)
                            * (na2 + nb2) - 1e-12)
            ok = ((a2 != b2)
                  & (np.minimum(na2, nb2)
                     >= threshold * np.maximum(na2, nb2))
                  & (np.minimum(na2 - ra2, nb2 - rb2) >= alpha))
            a2, b2, na2, nb2 = a2[ok], b2[ok], na2[ok], nb2[ok]
            # per-group dedup before the pair exchange (cross-group
            # duplicates remain; the ppart groupby removes those)
            order2, starts2, _ = _key_runs(a2, b2)
            first = order2[starts2]
            a2, b2, na2, nb2 = a2[first], b2[first], na2[first], nb2[first]
        else:
            a2 = b2 = na2 = nb2 = np.empty(0, np.int64)
        return pa.table({"doc_a": pa.array(a2, pa.int64()),
                         "doc_b": pa.array(b2, pa.int64()),
                         "na": pa.array(na2, pa.int64()),
                         "nb": pa.array(nb2, pa.int64())})

    cands = prefixes.map_batches(add_spart, batch_format="pyarrow") \
        .groupby("spart").map_groups(emit_candidates,
                                     batch_format="pyarrow")

    def dedup_pairs(g: pa.Table) -> pa.Table:
        a = g["doc_a"].to_numpy()
        b = g["doc_b"].to_numpy()
        na = g["na"].to_numpy()
        nb = g["nb"].to_numpy()
        order, starts, _ = _key_runs(a, b)
        first = order[starts]
        return pa.table({"doc_a": pa.array(a[first], pa.int64()),
                         "doc_b": pa.array(b[first], pa.int64()),
                         "na": pa.array(na[first], pa.int64()),
                         "nb": pa.array(nb[first], pa.int64())})

    def add_ppart(b: pa.Table) -> pa.Table:
        a = b["doc_a"].to_numpy()
        return b.append_column(
            "ppart", pa.array((a % n_parts).astype(np.int32), pa.int32()))

    pairs = cands.map_batches(add_ppart, batch_format="pyarrow") \
        .groupby("ppart").map_groups(dedup_pairs, batch_format="pyarrow")
    # candidate pairs are k-scale after the length filter; the strip also
    # covers the corpus-with-no-duplicates case (an ALL-empty join side
    # has no schema to broadcast)
    from .relational import drop_empty_blocks
    pairs = drop_empty_blocks(pairs, empty_schema=pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()),
         ("na", pa.int64()), ("nb", pa.int64())]))

    # Verification as PURE relational algebra (Acero joins carry no list
    # columns, and this needs no per-pair loop at all): explode the
    # candidate pairs against doc_a's shingle rows, then inner-join on
    # (doc_b, shingle) — surviving rows ARE the intersection; count per
    # pair.  Exchange volume is Σ|A| over surviving candidates (k-scale
    # after the length filter), never corpus-shaped.
    sh_rows = shingles.map_batches(
        lambda b: b.select(["doc_id", "shingle"]), batch_format="pyarrow")
    exp = shuffle_hash_join(pairs, sh_rows, on=("doc_a",),
                            right_on=("doc_id",), how="inner")
    hits = shuffle_hash_join(exp, sh_rows, on=("doc_b", "shingle"),
                             right_on=("doc_id", "shingle"), how="inner")

    from ray.data.aggregate import Max

    def count_partial(b: pa.Table) -> pa.Table:
        a = b["doc_a"].to_numpy()
        d2 = b["doc_b"].to_numpy()
        na = b["na"].to_numpy()
        nb = b["nb"].to_numpy()
        order, starts, ends = _key_runs(a, d2)
        first = order[starts]
        return pa.table({"doc_a": pa.array(a[first], pa.int64()),
                         "doc_b": pa.array(d2[first], pa.int64()),
                         "na": pa.array(na[first], pa.int64()),
                         "nb": pa.array(nb[first], pa.int64()),
                         "ni": pa.array(ends - starts, pa.int64())})

    counted = hits.map_batches(count_partial, batch_format="pyarrow") \
        .groupby(["doc_a", "doc_b"]) \
        .aggregate(Sum("ni", alias_name="n_inter"),
                   Max("na", alias_name="na"),
                   Max("nb", alias_name="nb"))

    def finalize(b: pa.Table) -> pa.Table:
        ni = b["n_inter"].to_numpy(zero_copy_only=False)
        na = b["na"].to_numpy(zero_copy_only=False)
        nb = b["nb"].to_numpy(zero_copy_only=False)
        jac = ni / (na + nb - ni)
        out = pa.table({"doc_a": b["doc_a"], "doc_b": b["doc_b"],
                        "n_inter": pa.array(ni, pa.int64()),
                        "jaccard": pa.array(jac, pa.float64())})
        return out.filter(pa.array(jac >= threshold))

    return counted.map_batches(finalize, batch_format="pyarrow")


def keep_best_per_cluster(docs: rd.Dataset, pairs: rd.Dataset, *,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> rd.Dataset:
    """The dedup family's production FINISH, shared by every pair
    generator (exact Jaccard, MinHash+LSH, SimHash, dHash): connected
    components over the pair graph, cluster labels LEFT-joined onto the
    full corpus (a doc in no pair keeps itself — null cluster fills with
    its own id), then ONE representative per cluster survives by
    (n_chars desc, id asc) via ``grouped_topk`` k=1, whose per-batch
    partial bounds the exchange to one row per (cluster, block).

    Output: (cluster, <id_col>, n_chars) — the full surviving corpus."""
    import pyarrow.compute as pcm

    from .graph import connected_components
    from .relational import drop_empty_blocks, grouped_topk, shuffle_hash_join

    cc = connected_components(pairs).map_batches(
        lambda b: b.select([id_col, "cluster"]), batch_format="pyarrow")
    cc = drop_empty_blocks(cc, empty_schema=pa.schema(
        [(id_col, pa.int64()), ("cluster", pa.int64())]))

    def with_len(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: b[id_col],
            "n_chars": pcm.utf8_length(b[text_col]).cast(pa.int64())})

    sized = docs.map_batches(with_len, batch_format="pyarrow")
    lab = shuffle_hash_join(sized, cc, on=(id_col,), how="left")

    def fill(b: pa.Table) -> pa.Table:
        cl = pcm.coalesce(b["cluster"], b[id_col].cast(pa.int64()))
        return pa.table({"cluster": cl, id_col: b[id_col],
                         "n_chars": b["n_chars"]})

    one = grouped_topk(lab.map_batches(fill, batch_format="pyarrow"),
                       group_col="cluster", order_col="n_chars",
                       tie_col=id_col, k=1, descending=True)
    return one.map_batches(
        lambda b: b.select(["cluster", id_col, "n_chars"]),
        batch_format="pyarrow")
