"""Similarity search over an embedding column (``list<float>``).

- :func:`knn_bruteforce` — exact cosine top-k: the query matrix is broadcast
  once with ``ray.put``; each ``map_batches`` task does one numpy matmul
  (batch x dim) @ (dim x Q) and emits its per-batch top-k; the driver merges
  Q x k x n_blocks partial rows — the scalable exact baseline.
- :func:`knn_lsh_buckets` — random-hyperplane LSH bucketing: candidates only
  meet inside a bucket (``groupby(bucket)``), turning top-k into a bounded
  local problem; approximate (recall < 1), the 10^12-scale path.

Deterministic ordering: (cosine desc, neighbor id asc).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def _queries_matrix(emb_ds: rd.Dataset, query_ids: list[int],
                    id_col: str, vec_col: str) -> tuple[np.ndarray, np.ndarray]:
    """Fetch the Q query vectors with a vectorized ``is_in`` batch filter
    (a per-row lambda ``filter`` would run the whole scan in Python)."""
    import pyarrow.compute as pc

    qset = pa.array(sorted(set(int(q) for q in query_ids)), pa.int64())

    def pick(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch[id_col], value_set=qset))

    rows = emb_ds.select_columns([id_col, vec_col]).map_batches(
        pick, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r[id_col])
    ids = np.array([r[id_col] for r in rows], np.int64)
    mat = _normalize(np.stack([np.asarray(r[vec_col], np.float64) for r in rows]))
    return ids, mat


def knn_bruteforce(emb_ds: rd.Dataset, query_ids: list[int], k: int = 5,
                   *, id_col: str = "vec_id", vec_col: str = "embedding",
                   exclude_self: bool = True) -> "pa.Table":
    """Exact top-k cosine neighbors for each query id; returns a pyarrow
    Table (query_id, neighbor_id, cosine, rank) — Q x k rows."""
    q_ids, q_mat = _queries_matrix(emb_ds, query_ids, id_col, vec_col)
    ref = ray.put((q_ids, q_mat.T))  # dim x Q

    def partial_topk(batch: pa.Table) -> pa.Table:
        g_qids, qT = ray.get(ref)
        ids = batch[id_col].to_numpy()
        mat = _normalize(np.stack(batch[vec_col].to_numpy(zero_copy_only=False)))
        sims = mat @ qT  # batch x Q
        out_q, out_n, out_c = [], [], []
        for qi, qid in enumerate(g_qids):
            col = sims[:, qi]
            mask = ids != qid if exclude_self else np.ones(len(ids), bool)
            cand = np.flatnonzero(mask)
            if cand.size == 0:
                continue
            # per-batch top-k with deterministic tie-break (cos desc, id asc)
            order = np.lexsort((ids[cand], -col[cand]))[:k]
            sel = cand[order]
            out_q.extend([int(qid)] * sel.size)
            out_n.extend(int(x) for x in ids[sel])
            out_c.extend(float(x) for x in col[sel])
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "cosine": pa.array(out_c, pa.float64())})

    partials = emb_ds.select_columns([id_col, vec_col]).map_batches(
        partial_topk, batch_format="pyarrow").take_all()

    # global merge: Q x k x n_blocks rows — tiny
    by_q: dict[int, list[tuple[float, int]]] = {}
    for r in partials:
        by_q.setdefault(r["query_id"], []).append((r["cosine"], r["neighbor_id"]))
    out_q, out_n, out_c, out_r = [], [], [], []
    for qid in sorted(by_q):
        rows = sorted(by_q[qid], key=lambda x: (-x[0], x[1]))[:k]
        for rank, (cos, nid) in enumerate(rows, 1):
            out_q.append(qid)
            out_n.append(nid)
            out_c.append(cos)
            out_r.append(rank)
    return pa.table({"query_id": pa.array(out_q, pa.int64()),
                     "neighbor_id": pa.array(out_n, pa.int64()),
                     "cosine": pa.array(out_c, pa.float64()),
                     "rank": pa.array(out_r, pa.int32())})


class _LshBucketStage:
    """Assign each vector to a random-hyperplane LSH bucket (seeded)."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 13,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        rng = np.random.RandomState(seed)
        self.planes = rng.standard_normal((dim, n_planes))
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _normalize(np.stack(batch[self.vec_col].to_numpy(zero_copy_only=False)))
        bits = (mat @ self.planes) > 0
        bucket = np.zeros(len(mat), np.int64)
        for b in range(self.planes.shape[1]):
            bucket |= bits[:, b].astype(np.int64) << b
        return pa.table({
            "vec_id": batch[self.id_col],
            "bucket": pa.array(bucket),
            self.vec_col: batch[self.vec_col],
        })


def knn_lsh_buckets(emb_ds: rd.Dataset, k: int = 5, *, dim: int,
                    n_planes: int = 12, seed: int = 13,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> rd.Dataset:
    """Approximate per-bucket top-k neighbor lists: the scale path.

    Vectors only compare within their LSH bucket; emits (vec_id, neighbor_id,
    cosine, rank) per bucket member.  Recall is tunable via n_planes (fewer
    planes -> bigger buckets -> higher recall & cost).
    """
    bucketed = emb_ds.map_batches(
        _LshBucketStage,
        fn_constructor_kwargs=dict(dim=dim, n_planes=n_planes, seed=seed,
                                   id_col=id_col, vec_col=vec_col),
        batch_format="pyarrow", concurrency=(1, 8))

    def bucket_knn(group: pa.Table) -> pa.Table:
        ids = group["vec_id"].to_numpy()
        if ids.size < 2:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64()),
                             "rank": pa.array([], pa.int32())})
        mat = _normalize(np.stack(group[vec_col].to_numpy(zero_copy_only=False)))
        sims = mat @ mat.T
        out_v, out_n, out_c, out_r = [], [], [], []
        for i in range(len(ids)):
            col = sims[i].copy()
            mask = ids != ids[i]
            cand = np.flatnonzero(mask)
            order = np.lexsort((ids[cand], -col[cand]))[:k]
            for rank, j in enumerate(cand[order], 1):
                out_v.append(int(ids[i]))
                out_n.append(int(ids[j]))
                out_c.append(float(col[j]))
                out_r.append(rank)
        return pa.table({"vec_id": pa.array(out_v, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "cosine": pa.array(out_c, pa.float64()),
                         "rank": pa.array(out_r, pa.int32())})

    return bucketed.groupby("bucket").map_groups(bucket_knn, batch_format="pyarrow")


# --- IVF (inverted-file) ANN: the coarse-quantizer scale path ---------------

def ivf_centroids(emb_ds: rd.Dataset, n_centroids: int = 16, *,
                  sample_size: int = 4096, iters: int = 10, seed: int = 11,
                  vec_col: str = "embedding") -> np.ndarray:
    """Seeded mini k-means over a driver-side sample (normalized vectors,
    spherical k-means flavor).  The centroid matrix is tiny (C x dim) — at
    any corpus scale it is a broadcast object, never a shuffle."""
    n = emb_ds.count()
    frac = min(1.0, sample_size / max(1, n))
    sample = emb_ds.random_sample(frac, seed=seed).take_all()
    if not sample:
        sample = emb_ds.take(min(n, n_centroids))
    mat = _normalize(np.stack([np.asarray(r[vec_col], np.float64) for r in sample]))
    rng = np.random.RandomState(seed)
    cent = mat[rng.choice(len(mat), size=min(n_centroids, len(mat)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(cent.shape[0]):
            members = mat[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def knn_ivf(emb_ds: rd.Dataset, query_ids: list[int], k: int = 5, *,
            n_centroids: int = 16, n_probe: int = 4, seed: int = 11,
            id_col: str = "vec_id", vec_col: str = "embedding") -> pa.Table:
    """Approximate top-k: score only vectors whose IVF cell is among each
    query's ``n_probe`` nearest centroids.

    One broadcast (centroids + query matrix + each query's probed cells),
    one ``map_batches`` pass (cell assignment is a (batch x dim) @ (dim x C)
    matmul; non-candidates are masked out), then the same tiny driver-side
    merge as the exact baseline.  Output shape == knn_bruteforce.
    """
    cent = ivf_centroids(emb_ds, n_centroids, seed=seed, vec_col=vec_col)
    q_ids, q_mat = _queries_matrix(emb_ds, query_ids, id_col, vec_col)
    q_cells = np.argsort(-(q_mat @ cent.T), axis=1)[:, :n_probe]  # Q x n_probe
    ref = ray.put((q_ids, q_mat.T, cent.T, q_cells))

    def partial_topk(batch: pa.Table) -> pa.Table:
        g_qids, qT, cT, probed = ray.get(ref)
        ids = batch[id_col].to_numpy()
        mat = _normalize(np.stack(batch[vec_col].to_numpy(zero_copy_only=False)))
        cells = np.argmax(mat @ cT, axis=1)
        sims = mat @ qT
        out_q, out_n, out_c = [], [], []
        for qi, qid in enumerate(g_qids):
            cand = np.flatnonzero(np.isin(cells, probed[qi]) & (ids != qid))
            if cand.size == 0:
                continue
            col = sims[:, qi]
            order = np.lexsort((ids[cand], -col[cand]))[:k]
            sel = cand[order]
            out_q.extend([int(qid)] * sel.size)
            out_n.extend(int(x) for x in ids[sel])
            out_c.extend(float(x) for x in col[sel])
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "cosine": pa.array(out_c, pa.float64())})

    partials = emb_ds.select_columns([id_col, vec_col]).map_batches(
        partial_topk, batch_format="pyarrow").take_all()
    by_q: dict[int, list[tuple[float, int]]] = {}
    for r in partials:
        by_q.setdefault(r["query_id"], []).append((r["cosine"], r["neighbor_id"]))
    out_q, out_n, out_c, out_r = [], [], [], []
    for qid in sorted(by_q):
        rows = sorted(by_q[qid], key=lambda x: (-x[0], x[1]))[:k]
        for rank, (cos, nid) in enumerate(rows, 1):
            out_q.append(qid)
            out_n.append(nid)
            out_c.append(cos)
            out_r.append(rank)
    return pa.table({"query_id": pa.array(out_q, pa.int64()),
                     "neighbor_id": pa.array(out_n, pa.int64()),
                     "cosine": pa.array(out_c, pa.float64()),
                     "rank": pa.array(out_r, pa.int32())})


# --------------------------------------------------------------------------
# Product quantization (PQ) — the compressed-domain ANN scale path
# --------------------------------------------------------------------------

def pq_train(emb_ds: rd.Dataset, *, n_sub: int = 8, n_centroids: int = 16,
             iters: int = 8, sample_rate: float = 1.0, seed: int = 7,
             id_col: str = "vec_id", vec_col: str = "embedding",
             max_train: int = 100_000) -> np.ndarray:
    """Train PQ codebooks: split dim into ``n_sub`` subspaces, k-means each
    on a deterministic Bernoulli sample (IVF-style sampled training — the
    codebook is a few KB regardless of corpus size).  Returns
    ``(n_sub, n_centroids, dsub)`` float64 codebooks.

    Training is deterministic: the sample is a multiplicative-hash filter
    on ``id_col`` and k-means init takes the sample's first rows in id
    order (kmeans++ would add RNG for little gain at these k)."""
    import pyarrow.compute as pc

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(0x9E3779B97F4A7C15 + 2 * seed + 1)) >> np.uint64(40)
        keep = h < np.uint64(int(sample_rate * (1 << 24)))
        return batch.filter(pa.array(keep))

    rows = emb_ds.select_columns([id_col, vec_col]) \
        .map_batches(pick, batch_format="pyarrow").take_all()
    if len(rows) > max_train:
        rows.sort(key=lambda r: r[id_col])
        rows = rows[:max_train]
    if not rows:
        raise ValueError("pq_train: empty training sample")
    rows.sort(key=lambda r: r[id_col])
    mat = _normalize(np.stack([np.asarray(r[vec_col], np.float64)
                               for r in rows]))
    n, dim = mat.shape
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    dsub = dim // n_sub
    books = np.empty((n_sub, n_centroids, dsub))
    for s in range(n_sub):
        x = mat[:, s * dsub:(s + 1) * dsub]
        # deterministic spread init: evenly spaced rows of the id-sorted
        # sample (contiguous-first-rows init collapses onto whatever
        # clusters happen to own the low ids — measured recall 0.24 vs 0.8)
        c = x[np.linspace(0, n - 1, n_centroids).astype(np.int64)].copy()
        for _ in range(iters):
            d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d, axis=1)
            for ci in range(n_centroids):
                sel = a == ci
                if sel.any():
                    c[ci] = x[sel].mean(axis=0)
        books[s] = c
    return books


def pq_encode(emb_ds: rd.Dataset, books: np.ndarray, *,
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> rd.Dataset:
    """(id, codes) — each vector compressed to ``n_sub`` uint8 centroid
    codes (fixed_size_binary).  Stateless vectorized ``map_batches``; the
    codebooks ride as ONE ``ray.put`` object, read per task."""
    n_sub, n_centroids, dsub = books.shape
    ref = ray.put(books)

    def enc(batch: pa.Table) -> pa.Table:
        b = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        if not batch.num_rows:
            return pa.table({id_col: batch[id_col],
                             "codes": pa.array([], pa.binary(n_sub))})
        mat = _normalize(np.stack(
            batch[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64))
        n = mat.shape[0]
        codes = np.empty((n, n_sub), np.uint8)
        for s in range(n_sub):
            x = mat[:, s * dsub:(s + 1) * dsub]
            d = ((x[:, None, :] - b[s][None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = np.argmin(d, axis=1).astype(np.uint8)
        return pa.table({
            id_col: batch[id_col],
            "codes": pa.array(list(codes.tobytes()[i * n_sub:(i + 1) * n_sub]
                                   for i in range(n)), pa.binary(n_sub)),
        })

    return emb_ds.select_columns([id_col, vec_col]) \
        .map_batches(enc, batch_format="pyarrow")


def knn_pq(emb_ds: rd.Dataset, query_ids: list[int], k: int = 5, *,
           books: np.ndarray | None = None, n_sub: int = 8,
           n_centroids: int = 16, rerank: int = 4,
           id_col: str = "vec_id", vec_col: str = "embedding") -> pa.Table:
    """Approximate top-k via PQ asymmetric distance (ADC) + exact re-rank
    — the standard production shape: queries stay exact, the CORPUS scan
    touches only uint8 codes (per batch: ``n_sub`` table lookups + a sum,
    no float matmul), a ``k * rerank`` shortlist per query survives, and
    ONE bounded fetch (Q x k x rerank ids) re-ranks the shortlist with
    exact cosines.  Output shape / tie-break identical to
    :func:`knn_bruteforce`; recall is governed by ``rerank`` (distance asc
    == cosine desc on normalized vectors: ||q-x||^2 = 2 - 2cos)."""
    if books is None:
        books = pq_train(emb_ds, n_sub=n_sub, n_centroids=n_centroids,
                         id_col=id_col, vec_col=vec_col)
    n_sub, n_centroids, dsub = books.shape
    q_ids, q_mat = _queries_matrix(emb_ds, query_ids, id_col, vec_col)
    # ADC tables: for each query q and subspace s, distance of q_s to every
    # centroid — (Q, n_sub, n_centroids)
    tabs = np.empty((len(q_ids), n_sub, n_centroids))
    for s in range(n_sub):
        qs = q_mat[:, s * dsub:(s + 1) * dsub]
        tabs[:, s, :] = ((qs[:, None, :] - books[s][None, :, :]) ** 2) \
            .sum(axis=2)
    ref = ray.put((q_ids, tabs))

    codes_ds = pq_encode(emb_ds, books, id_col=id_col, vec_col=vec_col)

    def partial_topk(batch: pa.Table) -> pa.Table:
        g_qids, g_tabs = ray.get(ref)
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "neighbor_id": pa.array([], pa.int64()),
                          "dist": pa.array([], pa.float64())})
        if not batch.num_rows:
            return empty
        ids = batch[id_col].to_numpy()
        raw = batch["codes"].combine_chunks() if isinstance(
            batch["codes"], pa.ChunkedArray) else batch["codes"]
        codes = np.frombuffer(b"".join(raw.to_pylist()), np.uint8) \
            .reshape(len(ids), -1)
        out_q, out_n, out_d = [], [], []
        for qi, qid in enumerate(g_qids):
            # dist(x) = sum_s tab[s, code_s(x)] — pure gather + sum
            d = g_tabs[qi][np.arange(codes.shape[1])[None, :],
                           codes].sum(axis=1)
            mask = ids != qid
            cand = np.flatnonzero(mask)
            if not cand.size:
                continue
            order = np.lexsort((ids[cand], d[cand]))[:k * max(1, rerank)]
            sel = cand[order]
            out_q.extend([int(qid)] * sel.size)
            out_n.extend(int(x) for x in ids[sel])
            out_d.extend(float(x) for x in d[sel])
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "dist": pa.array(out_d, pa.float64())})

    partials = codes_ds.map_batches(partial_topk,
                                    batch_format="pyarrow").take_all()
    by_q: dict[int, list[tuple[float, int]]] = {}
    for r in partials:
        by_q.setdefault(r["query_id"], []).append((r["dist"],
                                                   r["neighbor_id"]))
    shortlist: dict[int, list[int]] = {
        qid: [nid for _, nid in sorted(rows)[:k * max(1, rerank)]]
        for qid, rows in by_q.items()}

    # exact re-rank of the shortlist: one bounded vectorized fetch
    all_ids = sorted({n for ns in shortlist.values() for n in ns})
    s_ids, s_mat = _queries_matrix(emb_ds, all_ids, id_col, vec_col)
    pos_of = {int(i): p for p, i in enumerate(s_ids)}
    out_q, out_n, out_c, out_r = [], [], [], []
    for qi, qid in enumerate(q_ids):
        cand = shortlist.get(int(qid), [])
        if not cand:
            continue
        vecs = s_mat[[pos_of[n] for n in cand]]
        cos = vecs @ q_mat[qi]
        order = np.lexsort((np.asarray(cand), -cos))[:k]
        for rank, oi in enumerate(order, 1):
            out_q.append(int(qid))
            out_n.append(int(cand[oi]))
            out_c.append(float(cos[oi]))
            out_r.append(rank)
    return pa.table({"query_id": pa.array(out_q, pa.int64()),
                     "neighbor_id": pa.array(out_n, pa.int64()),
                     "cosine": pa.array(out_c, pa.float64()),
                     "rank": pa.array(out_r, pa.int32())})
