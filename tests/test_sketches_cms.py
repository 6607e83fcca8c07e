"""Count-Min heavy hitters (pipelines/sketches.py) and benchmark
decontamination (stages/contamination.py)."""

import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from search_engine_ray.functions.hashing import (cms_fold, cms_query,
                                                 stable_hash_array)
from search_engine_ray.pipelines.sketches import heavy_hitters_cms
from search_engine_ray.stages.contamination import (benchmark_shingles,
                                                    decontaminate)

_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]


def _corpus(n_docs=60, seed=3):
    rng = np.random.default_rng(seed)
    texts = [" ".join(rng.choice(_WORDS, size=30,
                                 p=[.4, .2, .1, .1, .1, .05, .05]))
             for _ in range(n_docs)]
    return pa.table({"doc_id": pa.array(np.arange(n_docs), pa.int64()),
                     "text": pa.array(texts)})


def test_cms_kernel_never_underestimates():
    h = stable_hash_array(["x"] * 7 + ["y"] * 3 + ["z"])
    sketch = cms_fold(h)
    est = cms_query(sketch, stable_hash_array(["x", "y", "z", "absent"]))
    assert (est[:3] >= np.array([7, 3, 1])).all()
    # merge = sum
    assert (cms_fold(h[:5]) + cms_fold(h[5:]) == sketch).all()


def test_heavy_hitters_superset_and_bound(ray_session):
    t = _corpus()
    word_re = re.compile(r"[a-z]+")
    exact = Counter(w for s in t["text"].to_pylist()
                    for w in word_re.findall(s.lower()))
    n = sum(exact.values())
    out = heavy_hitters_cms(rd.from_arrow(t), min_count=100).to_pandas()
    got = dict(zip(out.term, out.est_count))
    true_hh = {w for w, c in exact.items() if c >= 100}
    assert true_hh <= set(got)
    for term, est in got.items():
        assert est >= exact[term]
        assert est <= exact[term] + 0.01 * n  # eps*N slack, generous


def test_heavy_hitters_parallelism_invariant(ray_session):
    t = _corpus()
    a = heavy_hitters_cms(rd.from_arrow(t), min_count=50).to_pandas() \
        .sort_values("term").reset_index(drop=True)
    b = heavy_hitters_cms(rd.from_arrow(t).repartition(9), min_count=50) \
        .to_pandas().sort_values("term").reset_index(drop=True)
    assert a.equals(b)


def test_decontaminate_flags_overlap(ray_session):
    bench = pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["the quick brown fox jumps over the lazy dog"]),
    })
    corpus = pa.table({
        "doc_id": pa.array([10, 11, 12], pa.int64()),
        "text": pa.array([
            "a quick brown fox ran away",        # shares "quick brown fox"
            "completely unrelated text here ok",  # clean
            "jumps over the lazy dog indeed",     # shares 3 shingles
        ]),
    })
    hashes = benchmark_shingles(rd.from_arrow(bench), n=3)
    out = decontaminate(rd.from_arrow(corpus), hashes, n=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out.doc_id.tolist() == [10, 11, 12]
    assert out.contaminated.tolist() == [True, False, True]
    assert out.n_hits.tolist() == [1, 0, 3]


def test_decontaminate_empty_bench(ray_session):
    corpus = pa.table({"doc_id": pa.array([1], pa.int64()),
                       "text": pa.array(["some words in a row here"])})
    out = decontaminate(rd.from_arrow(corpus), np.empty(0, np.uint64)) \
        .to_pandas()
    assert out.n_hits.tolist() == [0]


def test_benchmark_shingles_size_guard(ray_session):
    words = [a + b + c for a in "abcdef" for b in "abcdef"
             for c in "abcdef"][:200]
    big = pa.table({"doc_id": pa.array([0], pa.int64()),
                    "text": pa.array([" ".join(words)])})
    # guard triggers only past 50M shingles — just assert normal path works
    h = benchmark_shingles(rd.from_arrow(big))
    assert h.size == 198  # 200 tokens -> 198 distinct 3-grams
    assert (np.diff(h.astype(np.uint64).view(np.int64)) != 0).all()
