"""Iterative graph algorithms over edge-list Datasets.

The only consumer today is near-duplicate *clustering*: the dedup stages
(`stages/dedup.py`) emit candidate pairs, and a training-data pipeline wants
one canonical document per connected component of the pair graph, not raw
pairs.  The reference engine has no graph step (its dedup is the crawl
frontier's exact-URL set, `PageAnalyzer.java:398-434`); this family is a
round-2 scale addition in the spirit of SURVEY §2.11.

Scale shape
-----------
``connected_components`` is tree-reduction star contraction:

* **contract** (``map_batches``, vectorized): each block runs a min-label
  fixpoint over its own edges (``np.minimum.at`` + pointer jumping — no
  Python per-edge loop) and replaces the block's edge set with a *star
  forest* ``(node, local_min_root)``.  A connected subgraph and its star
  have the same components, so this is a lossless contraction that shrinks
  a block to at most one row per distinct node it mentions.
* **reduce**: coalesce the contracted blocks ``fan_in``-to-1 with a plain
  ``repartition`` (no sort, no key exchange) and contract again — stars
  from different blocks that share a node merge.  After ``O(log_fan_in B)``
  rounds one block remains and its fixpoint is exact; roots are the global
  component minima, deterministically, for any input order or parallelism.

Contrast with per-round min-label propagation over a ``groupby`` (the
classic alternative): that costs two sort-based all-to-all exchanges per
round and O(component diameter) rounds; this costs O(log #blocks) cheap
coalescing repartitions, each over data already contracted to ≤ one row
per node.  The final round's single block holds one row per distinct node
of the *pair graph* (the dup subgraph, not the corpus) — the same bound as
any labelling output.  If even that exceeds one worker's heap, the known
escape is large-star/small-star over a keyed groupby (O(log n) rounds);
not needed for near-dup workloads, which are sparse relative to the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

__all__ = ["connected_components", "pagerank"]


def _local_cc(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized connected components over one batch's edge list.

    Returns ``(nodes, roots)`` — the distinct node ids and, for each, the
    minimum node id of its component *within this batch*.  Min-label
    fixpoint with pointer jumping: labels only decrease and jumping squares
    path lengths, so iterations are O(log V) for paths (and 1-2 for the
    dense shallow components near-dup pipelines produce).
    """
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ai = inv[: a.size]
    bi = inv[a.size:]
    lbl = np.arange(nodes.size, dtype=np.int64)
    while True:
        nxt = lbl.copy()
        np.minimum.at(nxt, ai, lbl[bi])
        np.minimum.at(nxt, bi, lbl[ai])
        nxt = nxt[nxt]  # pointer jump (label-of-label, halves tree depth)
        nxt = nxt[nxt]
        if np.array_equal(nxt, lbl):
            break
        lbl = nxt
    return nodes, nodes[lbl]


def _star(batch: pa.Table) -> pa.Table:
    a = batch["node"].to_numpy()
    b = batch["other"].to_numpy()
    nodes, roots = _local_cc(a, b)
    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "other": pa.array(roots, pa.int64())})


def connected_components(pairs: rd.Dataset, *, a_col: str = "doc_a",
                         b_col: str = "doc_b", fan_in: int = 8,
                         max_rounds: int = 50) -> rd.Dataset:
    """Connected components of an undirected pair graph.

    Returns one row per node: ``(doc_id, cluster, is_canonical)`` where
    ``cluster`` is the smallest node id in the component and
    ``is_canonical`` marks the cluster representative (the row a dedup
    pipeline keeps).  Deterministic for any input order and parallelism.
    """

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"node": t[a_col].cast(pa.int64()),
                         "other": t[b_col].cast(pa.int64())})

    cur = pairs.map_batches(rename, batch_format="pyarrow") \
        .map_batches(_star, batch_format="pyarrow", batch_size=None) \
        .materialize()
    for _ in range(max_rounds):
        nb = cur.num_blocks()
        if nb <= 1:
            break
        cur = cur.repartition(max(1, nb // fan_in)) \
            .map_batches(_star, batch_format="pyarrow", batch_size=None) \
            .materialize()

    def finalize(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy()
        lab = batch["other"].to_numpy()
        return pa.table({
            "doc_id": pa.array(node, pa.int64()),
            "cluster": pa.array(lab, pa.int64()),
            "is_canonical": pa.array(node == lab),
        })

    return cur.map_batches(finalize, batch_format="pyarrow")


# --------------------------------------------------------------------------
# PageRank
# --------------------------------------------------------------------------

def pagerank(edges: rd.Dataset, *, src_col: str = "src",
             dst_col: str = "dst", num_iters: int = 10,
             damping_num: int = 85, damping_den: int = 100,
             mass0: int = 10**12,
             max_broadcast_nodes: int = 100_000_000) -> rd.Dataset:
    """PageRank over a directed edge list, in pure int64 fixed-point.

    Frozen spec (identical in the SQL oracle, ``__ray_entry__`` query
    ``pagerank_suppliers``):

    * every node starts at ``pr0 = mass0``;
    * per iteration, each edge ``u -> v`` carries
      ``(pr[u] * damping_num) // (damping_den * outdeg(u))`` (one integer
      floor-division — no float anywhere), and
      ``pr'[v] = base + sum(incoming)`` with
      ``base = (mass0 * (damping_den - damping_num)) // damping_den``;
    * sink nodes (outdeg 0) send nothing (their damped mass is dropped —
      the classic simplified formulation, frozen on both engines).

    Integer sums are order-independent, so the result is bit-identical for
    any parallelism, block order, or SQL join order — the property the
    float formulation cannot give under a value-hash oracle.

    Scale shape: the VERTEX table (node, outdeg, pr) is the broadcast side
    — ``ray.put`` once per iteration, read per task.  Each EDGE block is
    pre-indexed ONCE into a CSR-ish object-store ref (src index, integer
    denominator, grouped-dst scatter structure) by a wave of raw Ray tasks;
    after that, every iteration is a wave of tiny gather-multiply-scatter
    tasks over those refs — no per-iteration Ray Data job, no re-parsing
    of the edge list, and the per-block partial carried back to the driver
    is (distinct dst per block) rows, never the raw edge count.  (This is
    the legitimate raw-task escape: a fixed-point iteration over immutable
    per-block state, which the streaming Dataset API would re-execute from
    scratch each round.)  The guard caps the vertex broadcast (default
    100M nodes = 2.4 GB) and fails loudly; at web-graph scale (nodes >>
    heap) the documented fallback is a vertex-partitioned exchange:
    hash-partition pr and edges by src, join there, re-partition
    contributions by dst (two shuffles per iteration).
    """
    from ray.data.aggregate import Sum

    narrow_cols = [src_col, dst_col]
    emat = edges.select_columns(narrow_cols).materialize()

    def deg_partial(batch: pa.Table) -> pa.Table:
        s = batch[src_col].to_numpy()
        d = batch[dst_col].to_numpy()
        nodes = np.concatenate([s, d])
        w = np.concatenate([np.ones(s.size, np.int64),
                            np.zeros(d.size, np.int64)])
        uniq, inv = np.unique(nodes, return_inverse=True)
        deg = np.zeros(uniq.size, np.int64)
        np.add.at(deg, inv, w)
        return pa.table({"node": pa.array(uniq.astype(np.int64), pa.int64()),
                         "deg": pa.array(deg, pa.int64())})

    rows = emat.map_batches(deg_partial, batch_format="pyarrow") \
        .groupby("node").aggregate(Sum("deg", alias_name="deg")).take_all()
    if len(rows) > max_broadcast_nodes:
        raise ValueError(
            f"graph has {len(rows)} nodes > max_broadcast_nodes="
            f"{max_broadcast_nodes}; the vertex broadcast would not fit "
            "worker heaps. Fall back to the vertex-partitioned exchange "
            "(hash-partition pr and edges by src, join there, re-partition "
            "contributions by dst), or raise max_broadcast_nodes.")
    nodes_sorted = np.array([r["node"] for r in rows], np.int64)
    outdeg = np.array([r["deg"] for r in rows], np.int64)
    order = np.argsort(nodes_sorted)
    nodes_sorted, outdeg = nodes_sorted[order], outdeg[order]

    base = (mass0 * (damping_den - damping_num)) // damping_den
    pr = np.full(nodes_sorted.size, mass0, np.int64)

    nodes_ref = ray.put(nodes_sorted)
    outdeg_ref = ray.put(outdeg)

    @ray.remote
    def prep_block(tbl: pa.Table, ns: np.ndarray, od: np.ndarray):
        # one-time CSR-ish index per edge block: src position, integer
        # denominator, and the grouped-dst scatter structure.
        # materialize() may pad with empty zero-schema blocks — skip them
        if tbl.num_rows == 0 or src_col not in tbl.column_names:
            z = np.zeros(0, np.int64)
            return z, z, z, z
        si = np.searchsorted(ns, tbl[src_col].to_numpy())
        di = np.searchsorted(ns, tbl[dst_col].to_numpy())
        denom = damping_den * od[si]
        uniq, inv = np.unique(di, return_inverse=True)
        return (si.astype(np.int64), denom.astype(np.int64),
                uniq.astype(np.int64), inv.astype(np.int64))

    @ray.remote
    def iter_block(prepped, cur: np.ndarray):
        si, denom, uniq, inv = prepped
        c = (cur[si] * damping_num) // denom
        s = np.zeros(uniq.size, np.int64)
        np.add.at(s, inv, c)
        return uniq, s

    block_refs = emat.to_arrow_refs()
    preps = [prep_block.remote(b, nodes_ref, outdeg_ref) for b in block_refs]

    for _ in range(num_iters):
        pr_ref = ray.put(pr)
        parts = ray.get([iter_block.remote(p, pr_ref) for p in preps])
        pr = np.full(nodes_sorted.size, base, np.int64)
        for uniq, s in parts:
            pr[uniq] += s  # uniq is distinct within a block; += is exact

    return rd.from_arrow(pa.table({
        "node": pa.array(nodes_sorted, pa.int64()),
        "pr": pa.array(pr, pa.int64()),
    }))
