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
             max_broadcast_nodes: int = 100_000_000,
             mode: str = "auto", num_parts: int | None = None,
             fan_in: int = 8) -> rd.Dataset:
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

    Two execution modes (``mode="auto"`` picks by vertex count against
    ``max_broadcast_nodes``; integer arithmetic makes their outputs
    bit-identical, which the parity pytest asserts):

    * **broadcast** (vertex table fits a worker heap, default 100M nodes =
      2.4 GB): the VERTEX table (node, outdeg, pr) is the broadcast side —
      one object-store ref per iteration, read per task.  Each EDGE block is
      pre-indexed ONCE into a CSR-ish object-store ref (src index, integer
      denominator, grouped-dst scatter structure) by a wave of raw Ray
      tasks; after that, every iteration is a wave of tiny
      gather-multiply-scatter tasks over those refs — no per-iteration Ray
      Data job, no re-parsing of the edge list.  The per-block (dst, sum)
      partials merge through a ``fan_in``-ary TREE of combine tasks whose
      final task emits the next dense pr vector — the driver only chains
      object refs, it never touches per-iteration data (the round-2
      driver-side merge loop is gone).
    * **exchange** (web-graph scale, nodes >> heap): vertices are
      hash-partitioned into ``num_parts`` shards; edges are partitioned by
      src shard and pre-indexed once per (src shard, dst shard) cell —
      src position, integer denominator, per-cell distinct-dst scatter
      structure, and the dst's position in ITS OWN shard resolved once up
      front.  Per iteration each src shard runs one gather-multiply task
      emitting ``num_parts`` per-cell partial-sum arrays (hash-partitioned
      contribution exchange), and each dst shard reduces its incoming
      column of cells into its next pr shard — two raw-task "shuffles" per
      iteration over pre-resolved integer indices, never a sort, and no
      structure anywhere that is proportional to the whole graph.

    (Raw tasks are the legitimate escape here: a fixed-point iteration over
    immutable per-block state, which the streaming Dataset API would
    re-execute from scratch each round.)
    """
    from ray.data.aggregate import Sum

    if mode not in ("auto", "broadcast", "exchange"):
        raise ValueError(f"unknown pagerank mode: {mode!r}")

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

    deg_ds = emat.map_batches(deg_partial, batch_format="pyarrow") \
        .groupby("node").aggregate(Sum("deg", alias_name="deg")).materialize()
    n_nodes = deg_ds.count()
    if mode == "broadcast" and n_nodes > max_broadcast_nodes:
        raise ValueError(
            f"graph has {n_nodes} nodes > max_broadcast_nodes="
            f"{max_broadcast_nodes}; the vertex broadcast would not fit "
            "worker heaps. Use mode='exchange' (or 'auto'), or raise "
            "max_broadcast_nodes.")
    if mode == "exchange" or n_nodes > max_broadcast_nodes:
        return _pagerank_exchange(
            emat, deg_ds, src_col=src_col, dst_col=dst_col,
            num_iters=num_iters, damping_num=damping_num,
            damping_den=damping_den, mass0=mass0, num_parts=num_parts)

    # vertex table assembled task-side (one remote task, refs only on the
    # driver) — even at the 100M-node guard the driver stays control-plane
    # sized; prep/iter tasks read the two arrays straight from the store
    @ray.remote(num_returns=2)
    def assemble_vertices(*blocks):
        nodes_l, deg_l = [], []
        for b in blocks:  # aggregate() emits pandas OR arrow blocks
            cols = (b.column_names if isinstance(b, pa.Table)
                    else list(b.columns))
            if "node" in cols and len(b):
                nodes_l.append(np.asarray(b["node"].to_numpy(), np.int64))
                deg_l.append(np.asarray(b["deg"].to_numpy(), np.int64))
        nodes = (np.concatenate(nodes_l) if nodes_l
                 else np.zeros(0, np.int64))
        deg = np.concatenate(deg_l) if deg_l else np.zeros(0, np.int64)
        order = np.argsort(nodes)
        return nodes[order], deg[order]

    nodes_ref, outdeg_ref = assemble_vertices.remote(*deg_ds.to_arrow_refs())

    base = (mass0 * (damping_den - damping_num)) // damping_den
    n = n_nodes

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

    @ray.remote
    def combine_partials(*parts):
        # merge sparse (uniq, sum) partials; uniq stays distinct per partial
        uniq = np.concatenate([p[0] for p in parts])
        s = np.concatenate([p[1] for p in parts])
        u, inv = np.unique(uniq, return_inverse=True)
        acc = np.zeros(u.size, np.int64)
        np.add.at(acc, inv, s)
        return u, acc

    @ray.remote
    def next_pr(*parts):
        pr = np.full(n, base, np.int64)
        for uniq, s in parts:
            pr[uniq] += s  # uniq is distinct within a partial; += is exact
        return pr

    block_refs = emat.to_arrow_refs()
    preps = [prep_block.remote(b, nodes_ref, outdeg_ref) for b in block_refs]

    pr_ref = ray.put(np.full(n, mass0, np.int64))
    for _ in range(num_iters):
        parts = [iter_block.remote(p, pr_ref) for p in preps]
        while len(parts) > fan_in:
            parts = [combine_partials.remote(*parts[i:i + fan_in])
                     for i in range(0, len(parts), fan_in)]
        pr_ref = next_pr.remote(*parts)

    @ray.remote
    def to_table(ns: np.ndarray, pr: np.ndarray) -> pa.Table:
        return pa.table({"node": pa.array(ns, pa.int64()),
                         "pr": pa.array(pr, pa.int64())})

    return rd.from_arrow_refs([to_table.remote(nodes_ref, pr_ref)])


def _vertex_part(nodes: np.ndarray, num_parts: int) -> np.ndarray:
    """Deterministic vertex shard id (splitmix64 of the node id)."""
    from ..functions.hashing import _splitmix64

    return (_splitmix64(nodes.astype(np.uint64))
            % np.uint64(num_parts)).astype(np.int64)


def _pagerank_exchange(emat: rd.Dataset, deg_ds: rd.Dataset, *,
                       src_col: str, dst_col: str, num_iters: int,
                       damping_num: int, damping_den: int,
                       mass0: int, num_parts: int | None) -> rd.Dataset:
    """Vertex-partitioned PageRank (see :func:`pagerank` mode='exchange').

    All per-iteration state is sharded: shard p holds ``(nodes_p, outdeg_p,
    pr_p)`` and the pre-indexed edge cells ``(p -> q)``.  The driver only
    wires object refs; nothing proportional to the graph ever lives in one
    process.  Determinism: shard assignment is a pure hash of the node id,
    within-cell scatter indices are fixed at prep time, and all arithmetic
    is int64 — output is bit-identical to broadcast mode at any
    ``num_parts`` or block layout.
    """
    base = (mass0 * (damping_den - damping_num)) // damping_den
    if num_parts is None:
        cpus = (int(ray.cluster_resources().get("CPU", 4))
                if ray.is_initialized() else 4)
        num_parts = max(2, min(32, cpus))
    P = num_parts

    # ---- vertex shards: (nodes_sorted_p, outdeg_p) ----------------------
    @ray.remote
    def split_vertices(tbl: pa.Table):
        if tbl.num_rows == 0 or "node" not in tbl.column_names:
            z = np.zeros(0, np.int64)
            out = tuple((z, z) for _ in range(P))
        else:
            node = tbl["node"].to_numpy()
            deg = tbl["deg"].to_numpy()
            part = _vertex_part(node, P)
            out = tuple((node[part == p], deg[part == p]) for p in range(P))
        # num_returns=1 does not unpack a 1-tuple — return the item itself
        return out if P > 1 else out[0]

    @ray.remote
    def merge_vertices(*chunks):
        # deg_ds rows are globally distinct per node — merge is just a sort
        nodes = np.concatenate([c[0] for c in chunks])
        deg = np.concatenate([c[1] for c in chunks])
        order = np.argsort(nodes)
        return nodes[order], deg[order]

    deg_refs = deg_ds.to_arrow_refs()
    vsplits = [split_vertices.options(num_returns=P).remote(r)
               for r in deg_refs]
    if P == 1:  # options(num_returns=1) returns a bare ref, not a tuple
        vsplits = [[r] for r in vsplits]
    vert = [merge_vertices.remote(*[vs[p] for vs in vsplits])
            for p in range(P)]

    # ---- edge shards by src, pre-indexed per (src shard, dst shard) -----
    @ray.remote
    def split_edges(tbl: pa.Table):
        if tbl.num_rows == 0 or src_col not in tbl.column_names:
            z = np.zeros(0, np.int64)
            out = tuple((z, z) for _ in range(P))
        else:
            src = tbl[src_col].to_numpy().astype(np.int64, copy=False)
            dst = tbl[dst_col].to_numpy().astype(np.int64, copy=False)
            part = _vertex_part(src, P)
            out = tuple((src[part == p], dst[part == p]) for p in range(P))
        return out if P > 1 else out[0]

    esplits = [split_edges.options(num_returns=P).remote(r)
               for r in emat.to_arrow_refs()]
    if P == 1:
        esplits = [[r] for r in esplits]

    @ray.remote
    def prep_shard(vert_p, *chunks):
        """Pre-index shard p's edges: per dst shard q, the src gather index,
        integer denominator, distinct dst ids and their scatter index."""
        nodes_p, deg_p = vert_p
        src = np.concatenate([c[0] for c in chunks]) if chunks \
            else np.zeros(0, np.int64)
        dst = np.concatenate([c[1] for c in chunks]) if chunks \
            else np.zeros(0, np.int64)
        si = np.searchsorted(nodes_p, src)
        denom = damping_den * deg_p[si]
        dq = _vertex_part(dst, P)
        cells = []
        uniq_per_q = []
        for q in range(P):
            m = dq == q
            u, inv = np.unique(dst[m], return_inverse=True)
            cells.append((si[m], denom[m], inv.astype(np.int64), u.size))
            uniq_per_q.append(u)
        return (*uniq_per_q, cells)

    prep_out = [prep_shard.options(num_returns=P + 1)
                .remote(vert[p], *[es[p] for es in esplits])
                for p in range(P)]
    cell_dst = [prep_out[p][:P] for p in range(P)]   # cell_dst[p][q]
    prepped = [prep_out[p][P] for p in range(P)]

    @ray.remote
    def resolve_idx(vert_q, uniq_dst: np.ndarray) -> np.ndarray:
        # position of cell (p -> q)'s distinct dsts inside shard q — fixed
        # across iterations, so resolved once instead of per reduce
        return np.searchsorted(vert_q[0], uniq_dst)

    idx = [[resolve_idx.remote(vert[q], cell_dst[p][q]) for p in range(P)]
           for q in range(P)]

    # ---- iterate ---------------------------------------------------------
    @ray.remote
    def init_pr(vert_p) -> np.ndarray:
        return np.full(vert_p[0].size, mass0, np.int64)

    @ray.remote
    def src_iter(cells, pr_p: np.ndarray):
        out = []
        for si, denom, inv, n_uniq in cells:
            c = (pr_p[si] * damping_num) // denom
            s = np.zeros(n_uniq, np.int64)
            np.add.at(s, inv, c)
            out.append(s)
        return tuple(out) if P > 1 else out[0]

    @ray.remote
    def dst_reduce(vert_q, *idx_and_sums) -> np.ndarray:
        pr = np.full(vert_q[0].size, base, np.int64)
        k = len(idx_and_sums) // 2
        for i, s in zip(idx_and_sums[:k], idx_and_sums[k:]):
            pr[i] += s  # i is distinct within a cell; += is exact
        return pr

    pr_refs = [init_pr.remote(vert[p]) for p in range(P)]
    for _ in range(num_iters):
        contribs = [src_iter.options(num_returns=P)
                    .remote(prepped[p], pr_refs[p]) for p in range(P)]
        if P == 1:
            contribs = [[r] for r in contribs]
        pr_refs = [dst_reduce.remote(vert[q], *[idx[q][p] for p in range(P)],
                                     *[contribs[p][q] for p in range(P)])
                   for q in range(P)]

    @ray.remote
    def shard_table(vert_q, pr_q: np.ndarray) -> pa.Table:
        return pa.table({"node": pa.array(vert_q[0], pa.int64()),
                         "pr": pa.array(pr_q, pa.int64())})

    return rd.from_arrow_refs(
        [shard_table.remote(vert[q], pr_refs[q]) for q in range(P)])


def triangle_count(edges: rd.Dataset, *, a_col: str = "a", b_col: str = "b",
                   max_broadcast_edges: int = 50_000_000,
                   max_degree: int = 100_000,
                   dense_threshold: int = 4096) -> rd.Dataset:
    """Exact global triangle count — the clustering-structure primitive
    (community density, spam-farm detection on link graphs).

    Input: undirected edge list with ``a < b`` per row, duplicates
    allowed (deduped internally).  Output: ONE row
    ``(n_nodes, n_edges, n_triangles)``.

    Algorithm is the node-iterator++ shape: every triangle ``a<b<c`` is
    counted exactly once at its SMALLEST node, as a wedge ``(b, c)``
    drawn from ``a``'s higher-neighbor list and probed against the edge
    set.  Distributed: dedup via one (a, b) groupby; the packed sorted
    edge array broadcasts once (``ray.put``) under
    ``max_broadcast_edges`` (8 bytes/edge = 400 MB at the default guard
    — fails loudly past it; the documented fallback is wedge/edge
    hash-partitioned semi-join counting); wedge generation is per-group
    vectorized (triu index pairs over the sorted neighbor array) and
    bounded by ``max_degree`` (loud failure — a hub past the guard
    needs the standard degree-split).  Nodes are dense-rank-mapped so
    the packed key fits int64 at any raw id domain.
    """
    from ray.data.aggregate import Count, Sum

    dedup = edges.groupby([a_col, b_col]).aggregate(
        Count(alias_name="_c")).materialize()
    n_edges = dedup.count()
    if n_edges > max_broadcast_edges:
        raise ValueError(
            f"{n_edges} edges > max_broadcast_edges={max_broadcast_edges}; "
            "use the wedge/edge hash-partitioned semi-join plan (partition "
            "wedges by (b, c) and inner-join the edge table) instead of "
            "the broadcast probe.")
    # assemble the packed edge array TASK-SIDE (same contract as the
    # r4 PageRank fix): the driver holds only ObjectRefs and scalars
    @ray.remote
    def _assemble(*tbls: pa.Table):
        t = pa.concat_tables([x.select([a_col, b_col]) for x in tbls
                              if x.num_rows])
        aa = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bb = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if np.any(aa >= bb):
            raise ValueError("triangle_count expects a < b per edge row")
        nodes = np.unique(np.concatenate([aa, bb]))
        k = np.int64(len(nodes))
        da = np.searchsorted(nodes, aa)
        db = np.searchsorted(nodes, bb)
        packed = np.sort(da * k + db)
        adj_tbl = pa.table({"_da": pa.array(da, pa.int64()),
                            "_db": pa.array(db, pa.int64())})
        return int(k), packed, adj_tbl

    n_nodes, shared, adj_ref = _assemble.options(num_returns=3).remote(
        *dedup.to_arrow_refs())
    n_nodes = ray.get(n_nodes)

    if n_nodes <= dense_threshold:
        # dense fast path: on a near-complete graph the wedge probe is
        # O(Σ d²·log m) while trace(A³)/6 is one BLAS matmul chain —
        # measured 10 s → <1 s on the 1000-node 454k-edge co-supply
        # graph; counts are exact (every intermediate < n < 2^53).
        @ray.remote
        def _dense(pk: np.ndarray, n: int) -> int:
            A = np.zeros((n, n), np.float64)
            da = (pk // n).astype(np.int64)
            db = (pk % n).astype(np.int64)
            A[da, db] = 1.0
            A[db, da] = 1.0
            A2 = A @ A
            return int(round(float((A2 * A).sum()) / 6.0))

        tri_n = ray.get(_dense.remote(shared, n_nodes))
        return rd.from_arrow(pa.table({
            "n_nodes": pa.array([n_nodes], pa.int64()),
            "n_edges": pa.array([int(n_edges)], pa.int64()),
            "n_triangles": pa.array([tri_n], pa.int64()),
        }))

    def wedges(group: pa.Table) -> pa.Table:

        import pyarrow as _pa

        pk = ray.get(shared)
        nb = np.sort(np.asarray(group["_db"].to_numpy(), np.int64))
        d = len(nb)
        if d > max_degree:
            raise ValueError(f"degree {d} > max_degree={max_degree}")
        if d < 2:
            return _pa.table({"t": _pa.array([0], _pa.int64())})
        iu, ju = np.triu_indices(d, k=1)
        probe = nb[iu] * np.int64(n_nodes) + nb[ju]
        pos = np.searchsorted(pk, probe)
        pos[pos >= len(pk)] = len(pk) - 1
        hits = int((pk[pos] == probe).sum())
        return _pa.table({"t": _pa.array([hits], _pa.int64())})

    adj = rd.from_arrow_refs([adj_ref])
    tri = adj.groupby("_da").map_groups(wedges, batch_format="pyarrow") \
        .aggregate(Sum("t", alias_name="n_triangles"))
    return rd.from_arrow(pa.table({
        "n_nodes": pa.array([n_nodes], pa.int64()),
        "n_edges": pa.array([int(n_edges)], pa.int64()),
        "n_triangles": pa.array([int(tri["n_triangles"] or 0)], pa.int64()),
    }))
