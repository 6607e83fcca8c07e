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

import ray.data as rd

__all__ = ["connected_components"]


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
