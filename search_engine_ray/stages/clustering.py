"""Distributed k-means over embedding columns — EXACT integer arithmetic.

Semantic clustering is the backbone of embedding-space corpus curation
(SemDeDup-style semantic dedup, diversity-balanced sampling, topic
bucketing).  The reference engine has nothing like it (its only vector
is a tf map, ``services/LemmasFinder.java:31-46``); this is a round-3
LLM-data-pipeline addition per SURVEY §2.11.

Why integers: float k-means is association-order-dependent (partial sums
combine in nondeterministic block order), which breaks both the driver's
value-hash oracle and cross-parallelism byte-identity.  Here every vector
is quantized ONCE — ``q = floor((x + 1) * 2**scale_bits)`` per dimension,
exact for any float32 input in [-1, 1) — and everything downstream is
int64: squared-L2 distances (exact: dim * (2*2^20)^2 << 2^63), partial
sums, and centroid updates by *integer floor division* ``sum // count``
(sums are nonnegative by the +1 shift, so floor == trunc and DuckDB's
``//`` agrees).  Ties in assignment break to the smallest centroid id.
Result: bit-identical output at ANY parallelism, any iteration count, and
an unrolled-CTE DuckDB oracle (same trick as PageRank,
``stages/graph.py``).

Scale shape per iteration: centroids (k x dim int64, a few KB) are
``ray.put`` ONCE and read by every assignment task; each block emits at
most k partial rows (cluster, count, packed per-dim sums); partials
fan-in through a Ray task tree (``_tree_sum``, O(log blocks) rounds) so
the driver only ever holds one (k, dim) matrix — never anything
proportional to the corpus.  The only full pass over the data is the
assignment ``map_batches`` (stateless, zero-copy Arrow in).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

__all__ = ["kmeans_assign", "quantize_embeddings"]


def quantize_embeddings(batch: pa.Table, *, vec_col: str,
                        scale_bits: int) -> np.ndarray:
    """(n, dim) int64 quantized matrix from a list<float> column.

    float32 -> float64 is exact; ``+1.0`` and ``* 2**scale_bits`` are exact
    in float64 for inputs in [-1, 1); floor is exact — so the quantization
    is reproducible bit-for-bit by SQL's ``floor((x + 1.0) * scale)``.
    """
    col = batch[vec_col]
    flat = col.combine_chunks().flatten() if isinstance(
        col, pa.ChunkedArray) else col.flatten()
    n = batch.num_rows
    dim = len(flat) // max(n, 1)
    x = flat.to_numpy(zero_copy_only=False).astype(np.float64)
    q = np.floor((x + 1.0) * float(1 << scale_bits)).astype(np.int64)
    return q.reshape(n, dim)


def _assign(q: np.ndarray, cents: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(cluster ids, squared int distances); ties -> smallest centroid id
    (np.argmin keeps the first minimum, centroids are ordered by id)."""
    # ||a-c||^2 = ||a||^2 - 2 a.c + ||c||^2, all int64 and exact:
    # |a.c| <= dim * (2^21)^2 = 2^48 for scale_bits=20, dim<=2^15.
    cross = q @ cents.T                      # (n, k) int64 matmul
    qq = np.einsum("ij,ij->i", q, q)
    cc = np.einsum("ij,ij->i", cents, cents)
    d = qq[:, None] - 2 * cross + cc[None, :]
    cid = np.argmin(d, axis=1)
    return cid.astype(np.int64), d[np.arange(len(cid)), cid]


@ray.remote
def _sum_partials(*tables: pa.Table) -> pa.Table:
    """Fan-in node: element-wise sum of (cluster, cnt, sums) partials."""
    t = pa.concat_tables(tables)
    k = 0
    for tb in tables:
        if tb.num_rows:
            k = max(k, int(tb["k"][0].as_py()))
    dim = len(t["sums"][0].as_py()) if t.num_rows else 0
    cnt = np.zeros(k, np.int64)
    sums = np.zeros((k, dim), np.int64)
    if t.num_rows:
        cid = t["cluster"].to_numpy()
        cnt_in = t["cnt"].to_numpy()
        s = np.asarray(t["sums"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False)).reshape(t.num_rows, dim)
        np.add.at(cnt, cid, cnt_in)
        np.add.at(sums, cid, s)
    return _partial_table(np.arange(k), cnt, sums, k)


def _partial_table(cid, cnt, sums, k) -> pa.Table:
    return pa.table({
        "cluster": pa.array(np.asarray(cid, np.int64)),
        "cnt": pa.array(np.asarray(cnt, np.int64)),
        "sums": pa.array(list(np.asarray(sums, np.int64)),
                         pa.list_(pa.int64())),
        "k": pa.array(np.full(len(cnt), k, np.int64)),
    })


def _tree_sum(refs: list, k: int, dim: int, fanin: int = 8) -> tuple:
    """O(log blocks) fan-in of partial tables; returns (cnt, sums)."""
    while len(refs) > 1:
        refs = [_sum_partials.remote(*refs[i:i + fanin])
                for i in range(0, len(refs), fanin)]
    if not refs:
        return np.zeros(k, np.int64), np.zeros((k, dim), np.int64)
    t = ray.get(refs[0])
    cnt = np.zeros(k, np.int64)
    sums = np.zeros((k, dim), np.int64)
    cid = t["cluster"].to_numpy()
    cnt[cid] = t["cnt"].to_numpy()
    if t.num_rows:
        sums[cid] = np.asarray(t["sums"].combine_chunks().flatten()
                               .to_numpy(zero_copy_only=False)
                               ).reshape(t.num_rows, dim)
    return cnt, sums


def kmeans_assign(embeddings: rd.Dataset, *, k: int = 8, iters: int = 3,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  scale_bits: int = 20) -> rd.Dataset:
    """Lloyd k-means, exact integer arithmetic, deterministic everywhere.

    Init: centroids = quantized vectors of the ``k`` smallest ``id_col``
    (SQL-expressible, no RNG).  Each of ``iters`` rounds: assign (ties to
    smallest cid), then per-cluster integer mean ``sum // count``; empty
    clusters keep their previous centroid.  Returns
    ``(id_col, cluster, dist_q)`` — ``dist_q`` the exact int64 squared
    quantized distance to the final centroid.
    """
    # Seeds = the k smallest ids, found WITHOUT a global sort: each block
    # contributes its own k smallest rows (<= k x blocks tiny rows), the
    # driver keeps the global k.  SQL-expressible (ORDER BY id LIMIT k) and
    # shuffle-free.
    def block_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        ix = pc.sort_indices(batch[id_col])[:k]
        return batch.take(ix)

    cand = pa.Table.from_pylist(
        embeddings.map_batches(block_topk, batch_format="pyarrow")
        .take_all())
    seed_tbl = cand.take(pc.sort_indices(cand[id_col])[:k])
    cents = quantize_embeddings(seed_tbl, vec_col=vec_col,
                                scale_bits=scale_bits)
    dim = cents.shape[1]

    for _ in range(iters):
        cents_ref = ray.put(cents)

        def partial(batch: pa.Table, *, _ref=cents_ref) -> pa.Table:
            c = ray.get(_ref) if isinstance(_ref, ray.ObjectRef) else _ref
            kk = c.shape[0]
            if not batch.num_rows:
                return _partial_table(np.empty(0, np.int64),
                                      np.empty(0, np.int64),
                                      np.empty((0, c.shape[1]), np.int64), kk)
            q = quantize_embeddings(batch, vec_col=vec_col,
                                    scale_bits=scale_bits)
            cid, _ = _assign(q, c)
            cnt = np.zeros(kk, np.int64)
            sums = np.zeros((kk, q.shape[1]), np.int64)
            np.add.at(cnt, cid, 1)
            np.add.at(sums, cid, q)
            live = np.flatnonzero(cnt)
            return _partial_table(live, cnt[live], sums[live], kk)

        partials = embeddings.map_batches(partial, batch_format="pyarrow")
        cnt, sums = _tree_sum(list(partials.to_arrow_refs()), k, dim)
        nonempty = cnt > 0
        new = cents.copy()
        new[nonempty] = sums[nonempty] // cnt[nonempty, None]
        cents = new

    cents_ref = ray.put(cents)

    def assign_final(batch: pa.Table) -> pa.Table:
        c = ray.get(cents_ref) if isinstance(cents_ref, ray.ObjectRef) \
            else cents_ref
        if not batch.num_rows:
            return pa.table({id_col: batch[id_col],
                             "cluster": pa.array([], pa.int64()),
                             "dist_q": pa.array([], pa.int64())})
        q = quantize_embeddings(batch, vec_col=vec_col,
                                scale_bits=scale_bits)
        cid, dist = _assign(q, c)
        return pa.table({
            id_col: batch[id_col],
            "cluster": pa.array(cid, pa.int64()),
            "dist_q": pa.array(dist, pa.int64()),
        })

    return embeddings.map_batches(assign_final, batch_format="pyarrow")
