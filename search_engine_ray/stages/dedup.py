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

Scale notes: pair generation inside a bucket is quadratic — bucket width
(bands x rows for LSH, ``max_shingle_df`` for n-gram) bounds it explicitly.
At 10^12 docs the LSH path is the only viable family; the exact-Jaccard path
exists as its verification oracle at test scale.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Min

from ..functions.hashing import hamming64, minhash_signature, simhash, stable_hash_array
from ..functions.textstats import content_hash_batch

_WORD_RE = re.compile(r"[a-z]+")


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

def _shingle_hashes(text: str, n: int) -> np.ndarray:
    toks = _WORD_RE.findall(text.lower())
    if len(toks) < n:
        return np.empty(0, np.uint64)
    shingles = {" ".join(toks[i: i + n]) for i in range(len(toks) - n + 1)}
    return stable_hash_array(sorted(shingles))


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
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        out_ids: list[int] = []
        out_sh: list[int] = []
        out_n: list[int] = []
        for did, text in zip(ids, texts):
            hs = _shingle_hashes(text or "", self.n)
            out_ids.extend([did] * hs.size)
            out_sh.extend(int(h) for h in hs)
            out_n.extend([hs.size] * hs.size)
        return pa.table({
            "doc_id": pa.array(out_ids, pa.int64()),
            "shingle": pa.array(out_sh, pa.uint64()),
            "n_shingles": pa.array(out_n, pa.int64()),
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
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        out_id, out_band, out_bh, out_sig = [], [], [], []
        for did, text in zip(ids, texts):
            hs = _shingle_hashes(text or "", self.n)
            if hs.size == 0:
                continue
            sig = minhash_signature(hs, self.num_perm)
            sig_bytes = sig.tobytes()
            for b in range(self.bands):
                band = sig[b * self.rows_per_band: (b + 1) * self.rows_per_band]
                bh = int.from_bytes(
                    __import__("hashlib").blake2b(band.tobytes(), digest_size=8).digest(),
                    "little")
                out_id.append(did)
                out_band.append(b)
                out_bh.append(bh)
                out_sig.append(sig_bytes)
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "band": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_bh, pa.uint64()),
            "sig": pa.array(out_sig, pa.binary()),
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

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy()
        if ids.size < 2 or ids.size > max_bucket:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "est_jaccard": pa.array([], pa.float64())})
        sigs = [np.frombuffer(s, np.uint64) for s in group["sig"].to_pylist()]
        order = np.argsort(ids, kind="stable")
        a_out, b_out, j_out = [], [], []
        for i in range(len(order)):
            for j in range(i + 1, len(order)):
                ia, ib = order[i], order[j]
                if ids[ia] == ids[ib]:
                    continue
                est = float((sigs[ia] == sigs[ib]).mean())
                if est >= threshold:
                    a_out.append(int(ids[ia]))
                    b_out.append(int(ids[ib]))
                    j_out.append(est)
        return pa.table({"doc_a": pa.array(a_out, pa.int64()),
                         "doc_b": pa.array(b_out, pa.int64()),
                         "est_jaccard": pa.array(j_out, pa.float64())})

    pairs = bands_ds.groupby(["band", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pyarrow")
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
        sigs = []
        for text in texts:
            toks = _WORD_RE.findall((text or "").lower())
            uniq, counts = np.unique(toks, return_counts=True) if toks else (np.array([]), np.array([]))
            if uniq.size == 0:
                sigs.append(0)
                continue
            hs = stable_hash_array(list(uniq))
            sigs.append(simhash(hs, counts.astype(np.int64)))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "simhash": pa.array(sigs, pa.uint64()),
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

    def explode_bands(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        sigs = batch["simhash"].to_numpy()
        n = len(ids)
        out_id = np.repeat(ids, 4)
        out_sig = np.repeat(sigs, 4)
        band = np.tile(np.arange(4, dtype=np.int32), n)
        band_val = (out_sig >> (band.astype(np.uint64) * np.uint64(16))) & np.uint64(0xFFFF)
        return pa.table({"doc_id": pa.array(out_id), "simhash": pa.array(out_sig),
                         "band": pa.array(band), "band_val": pa.array(band_val)})

    banded = sig_ds.map_batches(explode_bands, batch_format="pyarrow")

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy()
        if ids.size < 2 or ids.size > max_bucket:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int32())})
        sigs = group["simhash"].to_numpy().astype(np.uint64)
        order = np.argsort(ids, kind="stable")
        ids, sigs = ids[order], sigs[order]
        a_out, b_out, h_out = [], [], []
        for i in range(len(ids)):
            hs = hamming64(sigs[i + 1:], int(sigs[i]))
            for off in np.flatnonzero(hs <= max_hamming):
                j = i + 1 + off
                if ids[j] != ids[i]:
                    a_out.append(int(ids[i]))
                    b_out.append(int(ids[j]))
                    h_out.append(int(hs[off]))
        return pa.table({"doc_a": pa.array(a_out, pa.int64()),
                         "doc_b": pa.array(b_out, pa.int64()),
                         "hamming": pa.array(h_out, pa.int32())})

    pairs = banded.groupby(["band", "band_val"]).map_groups(
        bucket_pairs, batch_format="pyarrow")
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Min("hamming", alias_name="hamming"))


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
    shingles = ds.map_batches(
        _ShingleStage, fn_constructor_kwargs=dict(n=n, text_col=text_col, id_col=id_col),
        batch_format="pyarrow", concurrency=(1, 8))

    def emit_pairs(group: pa.Table) -> pa.Table:
        ids_raw = group["doc_id"].to_numpy()
        if ids_raw.size < 2 or ids_raw.size > max_shingle_df:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "na": pa.array([], pa.int64()),
                             "nb": pa.array([], pa.int64())})
        order = np.argsort(ids_raw, kind="stable")
        ids = ids_raw[order]
        ns = group["n_shingles"].to_numpy()[order]
        a, b = np.triu_indices(ids.size, k=1)
        return pa.table({"doc_a": pa.array(ids[a], pa.int64()),
                         "doc_b": pa.array(ids[b], pa.int64()),
                         "na": pa.array(ns[a], pa.int64()),
                         "nb": pa.array(ns[b], pa.int64())})

    pairs = shingles.groupby("shingle").map_groups(emit_pairs, batch_format="pyarrow")
    # the Jaccard denominators na/nb are identical on every row of a pair
    # (each is a per-doc constant), so Min is just "pick it up" — no sizes
    # dict on the driver, no second pass over the shingle table
    inter = pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Count(alias_name="n_inter"),
        Min("na", alias_name="na"), Min("nb", alias_name="nb"))

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


# --------------------------------------------------------------------------
# embedding cosine near-dup
# --------------------------------------------------------------------------

def embedding_dup_pairs(emb_ds: rd.Dataset, *, threshold: float = 0.95,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        max_rows: int = 100_000) -> rd.Dataset:
    """Cosine-similar pairs (>= threshold) via blocked matmul against a
    broadcast normalized matrix (``ray.put`` once, read per task — no
    per-batch reshipping).  O(N^2/blocks) compute.

    This is the EXACT oracle for the approximate families, and it broadcasts
    the whole (ids, matrix) pair — valid only while that fits a worker heap.
    ``max_rows`` makes the boundary explicit: beyond it the call refuses and
    points at the scale path (``similarity.knn_lsh_buckets``) instead of
    silently OOMing a 100-TB job.
    """
    import ray

    n = emb_ds.count()
    if n > max_rows:
        raise ValueError(
            f"embedding_dup_pairs is the exact O(N^2) fixture oracle; input "
            f"has {n} rows > max_rows={max_rows}. Use "
            "similarity.knn_lsh_buckets (LSH-bucketed cosine) at scale, or "
            "raise max_rows explicitly if the broadcast fits worker memory.")
    all_rows = emb_ds.select_columns([id_col, vec_col]).take_all()
    ids = np.array([r[id_col] for r in all_rows], np.int64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    mat = np.stack([np.asarray(all_rows[i][vec_col], np.float64) for i in order])
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, mat))

    def block(batch: pa.Table) -> pa.Table:
        import ray as _ray

        g_ids, g_mat = _ray.get(ref)
        b_ids = batch[id_col].to_numpy()
        pos = np.searchsorted(g_ids, b_ids)
        sims = g_mat[pos] @ g_mat.T
        a_out, b_out, s_out = [], [], []
        for r, did in enumerate(b_ids):
            hits = np.flatnonzero(sims[r] >= threshold)
            for c in hits:
                other = int(g_ids[c])
                if other > int(did):
                    a_out.append(int(did))
                    b_out.append(other)
                    s_out.append(float(sims[r, c]))
        return pa.table({"vec_a": pa.array(a_out, pa.int64()),
                         "vec_b": pa.array(b_out, pa.int64()),
                         "cosine": pa.array(s_out, pa.float64())})

    return emb_ds.select_columns([id_col, vec_col]).map_batches(block, batch_format="pyarrow")
