"""Connected components (stages/graph.py)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from search_engine_ray.stages.graph import connected_components


def _cc(pairs: pa.Table):
    return connected_components(rd.from_arrow(pairs)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)


def test_chain_and_isolated_pair(ray_session):
    pairs = pa.table({"doc_a": pa.array([1, 2, 3, 10], pa.int64()),
                      "doc_b": pa.array([2, 3, 4, 11], pa.int64())})
    out = _cc(pairs)
    assert out.doc_id.tolist() == [1, 2, 3, 4, 10, 11]
    assert out.cluster.tolist() == [1, 1, 1, 1, 10, 10]
    assert out.is_canonical.tolist() == [True, False, False, False, True, False]


def test_duplicate_and_reversed_edges(ray_session):
    pairs = pa.table({"doc_a": pa.array([5, 6, 6, 5], pa.int64()),
                      "doc_b": pa.array([6, 5, 5, 6], pa.int64())})
    out = _cc(pairs)
    assert out.cluster.tolist() == [5, 5]


def test_long_chain_needs_many_rounds(ray_session):
    # a path graph: min label must walk the whole diameter (one hop/round)
    n = 12
    pairs = pa.table({"doc_a": pa.array(np.arange(n - 1), pa.int64()),
                      "doc_b": pa.array(np.arange(1, n), pa.int64())})
    out = _cc(pairs)
    assert (out.cluster == 0).all()
    assert out.is_canonical.sum() == 1


def test_parallelism_invariant(ray_session):
    rng = np.random.default_rng(7)
    a = rng.integers(0, 60, 80)
    b = rng.integers(0, 60, 80)
    keep = a != b
    pairs = pa.table({"doc_a": pa.array(a[keep], pa.int64()),
                      "doc_b": pa.array(b[keep], pa.int64())})
    one = _cc(pairs)
    many = connected_components(
        rd.from_arrow(pairs).repartition(13)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert one.equals(many)


# --------------------------------------------------------------------------
# PageRank
# --------------------------------------------------------------------------

def _ref_pagerank(edges, num_iters=10, mass0=10**12, num=85, den=100):
    """Python reference of the frozen integer fixed-point spec."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    outdeg = {n: 0 for n in nodes}
    for u, _ in edges:
        outdeg[u] += 1
    pr = {n: mass0 for n in nodes}
    base = (mass0 * (den - num)) // den
    for _ in range(num_iters):
        nxt = {n: base for n in nodes}
        for u, v in edges:
            nxt[v] += (pr[u] * num) // (den * outdeg[u])
        pr = nxt
    return pr


def test_pagerank_matches_reference(ray_session):
    from search_engine_ray.stages.graph import pagerank

    # star + chain + sink: 1->2,1->3,2->3,3->1,4->1 ; 5 is a pure sink via 3->5
    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 1), (3, 5)]
    tbl = pa.table({"src": pa.array([e[0] for e in edges], pa.int64()),
                    "dst": pa.array([e[1] for e in edges], pa.int64())})
    out = pagerank(rd.from_arrow(tbl), num_iters=10).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    ref = _ref_pagerank(edges)
    assert out.node.tolist() == sorted(ref)
    assert out.pr.tolist() == [ref[n] for n in sorted(ref)]
    # deterministic across parallelism
    out13 = pagerank(rd.from_arrow(tbl).repartition(13),
                     num_iters=10).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert out.equals(out13)


def test_pagerank_exchange_matches_broadcast(ray_session):
    """Vertex-partitioned exchange mode is bit-identical to broadcast mode —
    exercised by forcing the broadcast guard below the node count (auto
    fallback) and by explicit mode='exchange' at several shard counts."""
    from search_engine_ray.stages.graph import pagerank

    rng = np.random.default_rng(11)
    src = rng.integers(0, 40, 300)
    dst = rng.integers(0, 40, 300)
    keep = src != dst
    tbl = pa.table({"src": pa.array(src[keep], pa.int64()),
                    "dst": pa.array(dst[keep], pa.int64())})

    def run(**kw):
        return pagerank(rd.from_arrow(tbl).repartition(7), num_iters=8,
                        **kw).to_pandas().sort_values("node") \
            .reset_index(drop=True)

    bcast = run(mode="broadcast")
    # auto mode falls back to exchange when the guard is below node count
    auto = run(mode="auto", max_broadcast_nodes=5)
    assert bcast.equals(auto)
    for parts in (1, 3, 16):
        assert bcast.equals(run(mode="exchange", num_parts=parts))


def test_pagerank_broadcast_guard_still_raises(ray_session):
    import pytest

    from search_engine_ray.stages.graph import pagerank

    tbl = pa.table({"src": pa.array([1, 2, 3], pa.int64()),
                    "dst": pa.array([2, 3, 1], pa.int64())})
    with pytest.raises(ValueError, match="max_broadcast_nodes"):
        pagerank(rd.from_arrow(tbl), mode="broadcast", max_broadcast_nodes=2)


def test_pagerank_sink_and_isolated_direction(ray_session):
    from search_engine_ray.stages.graph import pagerank

    # 2 is a sink: damped mass sent to it each round, none leaves
    tbl = pa.table({"src": pa.array([1], pa.int64()),
                    "dst": pa.array([2], pa.int64())})
    out = pagerank(rd.from_arrow(tbl), num_iters=3).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    ref = _ref_pagerank([(1, 2)], num_iters=3)
    assert out.pr.tolist() == [ref[1], ref[2]]
    assert out.pr[1] > out.pr[0]


def test_triangle_count_known_graphs(ray_session):
    """K4 has 4 triangles, C5 (5-cycle) has 0, two K3 sharing a vertex
    have 2; duplicate edge rows dedup; a >= b rows fail loudly."""
    import pytest as _pytest

    from search_engine_ray.stages.graph import triangle_count

    def run(pairs):
        ds = rd.from_arrow(pa.table({
            "a": pa.array([p[0] for p in pairs], pa.int64()),
            "b": pa.array([p[1] for p in pairs], pa.int64())}))
        return triangle_count(ds).take_all()[0]

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    r = run(k4 + k4[:2])                     # dup rows collapse
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (4, 6, 4)
    c5 = [(1, 2), (2, 3), (3, 4), (4, 5), (1, 5)]
    r = run(c5)
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (5, 5, 0)
    bowtie = [(1, 2), (1, 3), (2, 3), (3, 4), (3, 5), (4, 5)]
    r = run(bowtie)
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (5, 6, 2)
    with _pytest.raises(Exception):
        run([(2, 1)])


def test_triangle_count_dense_sparse_parity(ray_session):
    """The dense trace(A^3)/6 path and the wedge-probe path agree on a
    random graph (dense_threshold toggles the plan)."""
    from search_engine_ray.stages.graph import triangle_count

    rng = np.random.default_rng(7)
    n = 60
    m = rng.random((n, n)) < 0.25
    iu, ju = np.triu_indices(n, k=1)
    keep = m[iu, ju]
    ds = rd.from_arrow(pa.table({
        "a": pa.array(iu[keep] + 1, pa.int64()),
        "b": pa.array(ju[keep] + 1, pa.int64())}))
    dense = triangle_count(ds, dense_threshold=4096).take_all()[0]
    sparse = triangle_count(ds, dense_threshold=0).take_all()[0]
    assert dense == sparse
    assert dense["n_triangles"] > 0
