"""Iterative graph algorithms over edge-list Datasets.

The only consumer today is near-duplicate *clustering*: the dedup stages
(`stages/dedup.py`) emit candidate pairs, and a training-data pipeline wants
one canonical document per connected component of the pair graph, not raw
pairs.  The reference engine has no graph step (its dedup is the crawl
frontier's exact-URL set, `PageAnalyzer.java:398-434`); this family is a
round-2 scale addition in the spirit of SURVEY §2.11.

Scale shape
-----------
``connected_components`` is min-label propagation:

* one round = two ``groupby`` exchanges, **no joins**: a tagged union of the
  current label table and the static symmetric edge list is grouped by node
  (each group sees the node's 1 label row + its adjacency rows and emits
  ``(neighbor, my_label)`` messages), then messages+labels are grouped by
  node again and reduced with ``min``;
* rounds until the global ``sum(label)`` stops decreasing (labels only ever
  decrease, so the sum is a monotone convergence witness that costs one tiny
  aggregate per round) — O(component diameter) rounds;
* the label table holds only nodes that appear in some candidate pair —
  at corpus scale that is the (small) dup subgraph, not the corpus.  The
  edge list is materialized once so rounds do not re-execute the upstream
  pair pipeline.

For graphs with giant diameters the classic fix is large-star/small-star
(O(log n) rounds, same primitives); near-dup components are dense and
shallow, so plain propagation is the right default and the round cap guards
pathological inputs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Min

__all__ = ["connected_components"]


def connected_components(pairs: rd.Dataset, *, a_col: str = "doc_a",
                         b_col: str = "doc_b",
                         max_rounds: int = 50) -> rd.Dataset:
    """Connected components of an undirected pair graph.

    Returns one row per node: ``(doc_id, cluster, is_canonical)`` where
    ``cluster`` is the smallest node id in the component and
    ``is_canonical`` marks the cluster representative (the row a dedup
    pipeline keeps).  Deterministic for any input order and parallelism.
    """

    def symmetrize(batch: pa.Table) -> pa.Table:
        a = batch[a_col].to_numpy()
        b = batch[b_col].to_numpy()
        return pa.table({
            "node": pa.array(np.concatenate([a, b]), pa.int64()),
            "other": pa.array(np.concatenate([b, a]), pa.int64()),
        })

    edges = pairs.map_batches(symmetrize, batch_format="pyarrow").materialize()

    # initial labels: label(node) = node (one row per distinct node)
    labels = edges.groupby("node").aggregate(
        Min("other", alias_name="_drop")).drop_columns(["_drop"])
    labels = labels.map_batches(
        lambda t: t.append_column("label", t["node"]),
        batch_format="pyarrow").materialize()

    def propagate(group: pa.Table) -> pa.Table:
        """Group = one node's label row (other == null) + adjacency rows.
        Emit (neighbor, label) for every neighbor plus (node, label)."""
        other = group["other"]
        lab_col = group["label"]
        labs = lab_col.to_numpy(zero_copy_only=False)
        lab = np.nanmin(labs)
        nbrs = other.drop_null().to_numpy()
        node = group["node"][0].as_py()
        out_nodes = np.concatenate([nbrs, [node]])
        return pa.table({
            "node": pa.array(out_nodes, pa.int64()),
            "label": pa.array(np.full(out_nodes.size, int(lab), np.int64)),
        })

    prev_sum = None
    for _ in range(max_rounds):
        tagged_labels = labels.map_batches(
            lambda t: pa.table({
                "node": t["node"],
                "other": pa.nulls(t.num_rows, pa.int64()),
                "label": t["label"].cast(pa.float64()),
            }), batch_format="pyarrow")
        tagged_edges = edges.map_batches(
            lambda t: pa.table({
                "node": t["node"],
                "other": t["other"],
                "label": pa.nulls(t.num_rows, pa.float64()),
            }), batch_format="pyarrow")
        msgs = tagged_labels.union(tagged_edges) \
            .groupby("node").map_groups(propagate, batch_format="pyarrow")
        labels = msgs.groupby("node").aggregate(
            Min("label", alias_name="label")).materialize()
        cur_sum = labels.sum("label")
        if prev_sum is not None and cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    def finalize(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy()
        lab = batch["label"].to_numpy()
        return pa.table({
            "doc_id": pa.array(node, pa.int64()),
            "cluster": pa.array(lab, pa.int64()),
            "is_canonical": pa.array(node == lab),
        })

    return labels.map_batches(finalize, batch_format="pyarrow")
