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
