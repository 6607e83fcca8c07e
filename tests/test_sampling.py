"""Deterministic hash sampling (stages/sampling.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from search_engine_ray.stages.sampling import (bernoulli_sample, hash_of_key,
                                               stratified_sample)


def _docs(n=2000):
    ids = np.arange(n, dtype=np.int64)
    return pa.table({
        "doc_id": pa.array(ids),
        "lang": pa.array(np.where(ids % 3 == 0, "en", "ru")),
    })


def test_bernoulli_rate_and_determinism(ray_session):
    t = _docs()
    a = bernoulli_sample(rd.from_arrow(t), key_col="doc_id", p=0.2) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = bernoulli_sample(rd.from_arrow(t).repartition(7), key_col="doc_id",
                         p=0.2).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert a.equals(b)
    assert 0.15 < len(a) / 2000 < 0.25
    # membership is monotone in p: the 10% sample nests inside the 20% one
    small = bernoulli_sample(rd.from_arrow(t), key_col="doc_id", p=0.1) \
        .to_pandas()
    assert set(small.doc_id).issubset(set(a.doc_id))


def test_stratified_exact_count_and_uniform_rank(ray_session):
    t = _docs()
    out = stratified_sample(rd.from_arrow(t), strata_col="lang",
                            key_col="doc_id", n_per_stratum=15) \
        .to_pandas().sort_values(["lang", "rank"]).reset_index(drop=True)
    counts = out.groupby("lang").size()
    assert (counts == 15).all()
    # rank order == hash order, and hashes match the kernel
    for _, g in out.groupby("lang"):
        h = hash_of_key(g.doc_id.to_numpy())
        assert (g["h"].to_numpy() == h.astype(np.int64)).all()
        assert (np.diff(h.astype(np.int64)) >= 0).all()


def test_small_stratum_returns_all(ray_session):
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "lang": pa.array(["en", "en", "fr"])})
    out = stratified_sample(rd.from_arrow(t), strata_col="lang",
                            key_col="doc_id", n_per_stratum=10).to_pandas()
    assert len(out) == 3


def test_overflow_guard():
    with pytest.raises(ValueError):
        hash_of_key(np.array([2**62], np.int64))


def test_weighted_sample_matches_sql_rule(ray_session):
    import duckdb
    import pandas as pd

    from search_engine_ray.stages.sampling import weighted_sample_n

    rng = np.random.default_rng(23)
    df = pd.DataFrame({
        "k": np.arange(1, 501, dtype=np.int64),
        "w": rng.integers(0, 100, 500).astype(np.float64),  # some zeros
        "tag": rng.choice(list("uv"), 500),
    })
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    out = weighted_sample_n(rd.from_arrow(tbl).repartition(7),
                            key_col="k", weight_col="w", n=50) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    exp = duckdb.sql("""
        WITH h AS (
            SELECT k, w, tag,
                   -ln((((k * 2654435761) % 4294967296) + 1)
                       / 4294967297.0) / w AS pri
            FROM df WHERE w > 0),
        r AS (SELECT k, w, tag, ROW_NUMBER() OVER (ORDER BY pri, k) AS rk
              FROM h)
        SELECT k, w, tag FROM r WHERE rk <= 50 ORDER BY k
    """).df()
    assert out.k.tolist() == exp.k.tolist()
    assert out.tag.tolist() == exp.tag.tolist()
    # parallelism invariance
    out1 = weighted_sample_n(rd.from_arrow(tbl).repartition(1),
                             key_col="k", weight_col="w", n=50) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert out.equals(out1)
    # heavier rows are sampled more often: mean weight of the sample
    # exceeds the population mean
    assert out.w.mean() > df[df.w > 0].w.mean()
