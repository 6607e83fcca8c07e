"""Broadcast hash join + grouped top-k (stages/relational)."""

import numpy as np
import pyarrow as pa
import pytest


def _big_ds(rows):
    import ray.data as rd

    return rd.from_arrow(pa.table(rows))


def test_broadcast_join_inner(ray_session):
    from search_engine_ray.stages.relational import broadcast_hash_join

    big = _big_ds({"k": pa.array([3, 1, 2, 9, 1], pa.int64()),
                   "v": pa.array([30, 10, 20, 90, 11], pa.int64())})
    small = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                      "name": pa.array(["a", "b", "c"])})
    out = broadcast_hash_join(big, small, big_key="k", small_key="k") \
        .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    assert out["k"].tolist() == [1, 1, 2, 3]
    assert out["name"].tolist() == ["a", "a", "b", "c"]  # 9 dropped


def test_broadcast_join_left_nulls(ray_session):
    from search_engine_ray.stages.relational import broadcast_hash_join

    big = _big_ds({"k": pa.array([5, 1], pa.int64())})
    small = pa.table({"k": pa.array([1], pa.int64()),
                      "name": pa.array(["a"])})
    out = broadcast_hash_join(big, small, big_key="k", small_key="k",
                              how="left").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert out["name"].tolist()[0] == "a"
    assert out["name"].isna().tolist() == [False, True]


def test_broadcast_join_rejects_dup_keys(ray_session):
    from search_engine_ray.stages.relational import broadcast_hash_join

    big = _big_ds({"k": pa.array([1], pa.int64())})
    small = pa.table({"k": pa.array([1, 1], pa.int64()),
                      "name": pa.array(["a", "b"])})
    with pytest.raises(ValueError, match="duplicate"):
        broadcast_hash_join(big, small, big_key="k", small_key="k")


def test_grouped_topk_matches_pandas(ray_session):
    import pandas as pd

    from search_engine_ray.stages.relational import grouped_topk

    rng = np.random.RandomState(3)
    n = 5000
    df = pd.DataFrame({
        "g": rng.choice(["x", "y", "z", "w"], n),
        "score": rng.randint(0, 50, n).astype("int64"),  # many ties
        "id": np.arange(n, dtype="int64"),
    })
    out = grouped_topk(_big_ds({c: pa.array(df[c]) for c in df}),
                       group_col="g", order_col="score", tie_col="id",
                       k=5).to_pandas()
    exp = (df.sort_values(["g", "score", "id"],
                          ascending=[True, False, True])
             .groupby("g").head(5))
    exp = exp.sort_values(["g", "score", "id"],
                          ascending=[True, False, True]).reset_index(drop=True)
    got = out.sort_values(["g", "score", "id"],
                          ascending=[True, False, True]).reset_index(drop=True)
    assert got[["g", "score", "id"]].equals(exp[["g", "score", "id"]])
    # rank is 1..5 within each group, aligned with the sort
    for g, sub in got.groupby("g"):
        assert sub["rank"].tolist() == list(range(1, len(sub) + 1))


def test_grouped_topk_parallelism_invariant(ray_session):
    import ray.data as rd

    from search_engine_ray.stages.relational import grouped_topk

    rng = np.random.RandomState(11)
    t = pa.table({"g": pa.array(rng.choice(["a", "b"], 2000)),
                  "score": pa.array(rng.randint(0, 9, 2000), pa.int64()),
                  "id": pa.array(np.arange(2000), pa.int64())})
    outs = []
    for blocks in (1, 7):
        ds = rd.from_arrow(t).repartition(blocks)
        out = grouped_topk(ds, group_col="g", order_col="score",
                           tie_col="id", k=4).to_pandas() \
            .sort_values(["g", "rank"]).reset_index(drop=True)
        outs.append(out)
    assert outs[0].equals(outs[1])


def test_grouped_quantiles_matches_duckdb_rule(ray_session):
    import duckdb
    import pandas as pd

    from search_engine_ray.stages.relational import grouped_quantiles

    rng = np.random.RandomState(5)
    df = pd.DataFrame({"g": rng.choice(["a", "b", "c"], 3000),
                       "v": rng.rand(3000) * 100})
    out = grouped_quantiles(
        _big_ds({"g": pa.array(df["g"]), "v": pa.array(df["v"])}),
        group_col="g", value_col="v", qs=(0.25, 0.5, 0.99),
        count_alias="n").to_pandas().set_index("g").sort_index()
    exp = duckdb.sql("""
        SELECT g, COUNT(*)::BIGINT AS n,
               quantile_disc(v, 0.25) AS p25,
               quantile_disc(v, 0.5) AS p50,
               quantile_disc(v, 0.99) AS p99
        FROM df GROUP BY g ORDER BY g""").df().set_index("g")
    assert out["n"].tolist() == exp["n"].tolist()
    for c in ("p25", "p50", "p99"):
        assert out[c].tolist() == exp[c].tolist()  # exact element: bitwise


def test_bounded_interval_join_overlapping(ray_session):
    import pandas as pd

    from search_engine_ray.pipelines.joins import bounded_interval_join

    # overlapping 10us intervals at 0, 5, 20; events at 0,5,10,15,30
    intervals = pa.table({"interval_id": pa.array([1, 2, 3], pa.int64()),
                          "start_us": pa.array([0, 5, 20], pa.int64())})
    ev = _big_ds({"ts": pa.array([0, 5, 10, 15, 30], pa.timestamp("us")),
                  "user_id": pa.array([7, 7, 8, 8, 9], pa.int64())})
    out = bounded_interval_join(ev, intervals, ts_col="ts", max_len_us=10,
                                keep_cols=["user_id"]).to_pandas()
    got = sorted(zip(out["interval_id"],
                     out["ts"].astype("int64"), out["user_id"]))
    # inclusive both ends: iv1 covers [0,10], iv2 [5,15], iv3 [20,30]
    assert got == [(1, 0, 7), (1, 5, 7), (1, 10, 8),
                   (2, 5, 7), (2, 10, 8), (2, 15, 8), (3, 30, 9)]


def test_shuffle_hash_join_types(ray_session):
    from search_engine_ray.stages.relational import shuffle_hash_join

    left = _big_ds({"k": pa.array([1, 2, 3, 3], pa.int64()),
                    "a": pa.array(["x", "y", "z", "w"])})
    right = _big_ds({"rk": pa.array([2, 3, 3, 4], pa.int64()),
                     "b": pa.array([20, 30, 31, 40], pa.int64())})

    inner = shuffle_hash_join(left, right, on=("k",), right_on=("rk",),
                              how="inner", num_partitions=4).to_pandas()
    assert sorted(zip(inner.k, inner.a, inner.b)) == [
        (2, "y", 20), (3, "w", 30), (3, "w", 31),
        (3, "z", 30), (3, "z", 31)]

    lj = shuffle_hash_join(left, right, on=("k",), right_on=("rk",),
                           how="left", num_partitions=4).to_pandas()
    assert len(lj) == 6  # 5 matches + unmatched k=1
    assert lj[lj.k == 1].b.isna().all()

    semi = shuffle_hash_join(left, right, on=("k",), right_on=("rk",),
                             how="semi", num_partitions=4).to_pandas()
    assert sorted(semi.k.tolist()) == [2, 3, 3]
    assert list(semi.columns) == ["k", "a"]

    anti = shuffle_hash_join(left, right, on=("k",), right_on=("rk",),
                             how="anti", num_partitions=4).to_pandas()
    assert anti.k.tolist() == [1]


def test_shuffle_hash_join_bad_how(ray_session):
    from search_engine_ray.stages.relational import shuffle_hash_join

    with pytest.raises(ValueError, match="unsupported how"):
        shuffle_hash_join(_big_ds({"k": pa.array([1], pa.int64())}),
                          _big_ds({"k": pa.array([1], pa.int64())}),
                          on=("k",), how="cross")
