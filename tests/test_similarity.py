"""ANN similarity search: exact baseline vs IVF / LSH approximations."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from search_engine_ray.stages.similarity import knn_bruteforce, knn_ivf, knn_lsh_buckets


def _clustered_embeddings(n_clusters=8, per_cluster=60, dim=32, seed=3):
    rng = np.random.RandomState(seed)
    centers = rng.standard_normal((n_clusters, dim)) * 4.0
    vecs, ids = [], []
    i = 0
    for c in range(n_clusters):
        pts = centers[c] + rng.standard_normal((per_cluster, dim))
        for p in pts:
            vecs.append(p.astype(np.float32).tolist())
            ids.append(i)
            i += 1
    return pa.table({"vec_id": pa.array(ids, pa.int64()),
                     "embedding": pa.array(vecs, pa.list_(pa.float32()))})


def test_ivf_recall_vs_bruteforce(ray_session):
    t = _clustered_embeddings()
    ds = rd.from_arrow(t)
    queries = [0, 61, 130, 305, 417]
    exact = knn_bruteforce(ds, queries, k=5).to_pandas()
    approx = knn_ivf(rd.from_arrow(t), queries, k=5,
                     n_centroids=8, n_probe=2).to_pandas()
    recalls = []
    for q in queries:
        e = set(exact[exact.query_id == q].neighbor_id)
        a = set(approx[approx.query_id == q].neighbor_id)
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.9, recalls  # clustered data: probes cover


def test_ivf_deterministic(ray_session):
    t = _clustered_embeddings()
    a = knn_ivf(rd.from_arrow(t), [0, 61], k=3, n_centroids=8, n_probe=2)
    b = knn_ivf(rd.from_arrow(t), [0, 61], k=3, n_centroids=8, n_probe=2)
    assert a.equals(b)


def test_lsh_subset_of_exact_candidates(ray_session):
    t = _clustered_embeddings(n_clusters=4, per_cluster=40)
    ds = rd.from_arrow(t)
    out = knn_lsh_buckets(ds, k=3, dim=32).to_pandas()
    # structural checks: no self pairs, ranks start at 1, cosine in [-1, 1]
    assert (out.vec_id != out.neighbor_id).all()
    assert out["rank"].min() == 1
    assert out.cosine.between(-1.000001, 1.000001).all()


def test_blocked_equals_broadcast_pairs(ray_session):
    from search_engine_ray.stages.dedup import (embedding_dup_pairs,
                                                embedding_dup_pairs_blocked)

    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 8))
    # plant near-dup clusters so pairs exist
    base[10] = base[3] + 0.01
    base[20] = base[3] - 0.01
    base[31] = base[17] * 1.5
    tbl = pa.table({
        "vec_id": pa.array(np.arange(40, dtype=np.int64), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in base],
                              pa.list_(pa.float64())),
    })
    ds = rd.from_arrow(tbl).repartition(5)

    def canon(df):
        return df.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)

    exact = canon(embedding_dup_pairs(ds, threshold=0.9).to_pandas())
    blocked = canon(embedding_dup_pairs_blocked(
        ds, threshold=0.9, target_block_rows=7).to_pandas())
    assert len(exact) > 0
    assert blocked.vec_a.tolist() == exact.vec_a.tolist()
    assert blocked.vec_b.tolist() == exact.vec_b.tolist()
    assert np.allclose(blocked.cosine.to_numpy(), exact.cosine.to_numpy(),
                       rtol=0, atol=1e-12)


def test_blocked_pairs_empty_input(ray_session):
    from search_engine_ray.stages.dedup import embedding_dup_pairs_blocked

    tbl = pa.table({"vec_id": pa.array([], pa.int64()),
                    "embedding": pa.array([], pa.list_(pa.float64()))})
    out = embedding_dup_pairs_blocked(rd.from_arrow(tbl)).to_pandas()
    assert len(out) == 0


def test_pq_recall_and_determinism(ray_session):
    from search_engine_ray.stages.similarity import knn_pq, pq_encode, pq_train

    t = _clustered_embeddings(dim=32)
    ds = rd.from_arrow(t)
    queries = [0, 61, 130, 305, 417]
    exact = knn_bruteforce(ds, queries, k=5).to_pandas()
    books = pq_train(ds, n_sub=8, n_centroids=16)
    assert books.shape == (8, 16, 4)
    approx = knn_pq(ds, queries, k=5, books=books).to_pandas()
    hits = total = 0
    for q in queries:
        e = set(exact[exact.query_id == q].neighbor_id)
        a = set(approx[approx.query_id == q].neighbor_id)
        hits += len(e & a)
        total += len(e)
    assert hits / total >= 0.6  # ADC shortlist (8x16 codes) + exact rerank
    # codes are 8-byte fixed binary and deterministic across parallelism
    c1 = pq_encode(ds, books).to_pandas().sort_values("vec_id")
    c2 = pq_encode(ds.repartition(7), books).to_pandas().sort_values("vec_id")
    assert c1.codes.tolist() == c2.codes.tolist()
    assert all(len(c) == 8 for c in c1.codes)
    # and a second run returns the identical ranking
    again = knn_pq(ds, queries, k=5, books=books).to_pandas()
    assert again.equals(approx)
