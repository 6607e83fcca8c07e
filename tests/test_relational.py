"""Broadcast hash join + grouped top-k (stages/relational)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


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


def test_grouping_sets_matches_pandas(ray_session):
    import duckdb
    from search_engine_ray.stages.relational import grouping_sets

    rng = np.random.default_rng(3)
    rf = rng.choice(list("ANR"), 200)
    ls = rng.choice(list("OF"), 200)
    qty = rng.integers(1, 50, 200).astype(np.float64)
    tbl = pa.table({"rf": pa.array(rf.tolist(), pa.string()),
                    "ls": pa.array(ls.tolist(), pa.string()),
                    "qty": pa.array(qty, pa.float64())})
    out = grouping_sets(
        rd.from_arrow(tbl).repartition(7),
        keys=("rf", "ls"),
        sets=(("rf", "ls"), ("rf",), ()),
        sum_cols={"sum_qty": "qty"}).to_pandas()
    exp = duckdb.sql("""
        SELECT rf, ls, GROUPING(rf, ls)::BIGINT AS grouping_id,
               SUM(qty) AS sum_qty, COUNT(*)::BIGINT AS n_rows
        FROM tbl GROUP BY GROUPING SETS ((rf, ls), (rf), ())
    """).df()

    def canon(df):
        return df.reindex(sorted(df.columns), axis=1) \
            .sort_values(["grouping_id", "rf", "ls"], na_position="last") \
            .reset_index(drop=True)

    got, want = canon(out), canon(exp)
    assert got.shape == want.shape
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if a.dtype.kind == "f":
            assert np.array_equal(a, b.astype(np.float64))
        else:
            assert (pd.isna(a) == pd.isna(b)).all()
            m = ~pd.isna(a)
            assert (a[m] == b[m]).all()


def test_grouping_sets_parallelism_invariant(ray_session):
    from search_engine_ray.stages.relational import grouping_sets

    tbl = pa.table({"k": pa.array(["x", "y", "x", "x"], pa.string()),
                    "v": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64())})

    def run(parts):
        return grouping_sets(
            rd.from_arrow(tbl).repartition(parts), keys=("k",),
            sets=(("k",), ()), sum_cols={"s": "v"}).to_pandas() \
            .sort_values(["grouping_id", "k"], na_position="last") \
            .reset_index(drop=True)

    one, many = run(1), run(4)
    assert one.equals(many)
    total = one[one.grouping_id == 1]
    assert total.s.iloc[0] == 10.0 and total.n_rows.iloc[0] == 4
    assert total.k.isna().all()


def test_grouped_quantiles_hist_binned_rule(ray_session):
    import duckdb
    from search_engine_ray.stages.relational import grouped_quantiles_hist

    rng = np.random.default_rng(11)
    k = rng.choice(list("abc"), 500)
    v = rng.normal(50, 20, 500)
    tbl = pa.table({"k": pa.array(k.tolist(), pa.string()),
                    "v": pa.array(v, pa.float64())})
    out = grouped_quantiles_hist(
        rd.from_arrow(tbl).repartition(9), group_col="k", value_col="v",
        qs=(0.5, 0.95), bin_width=5.0).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    exp = duckdb.sql("""
        SELECT k, COUNT(*)::BIGINT AS n,
               quantile_disc(FLOOR(v / 5.0) * 5.0, 0.5) AS p50,
               quantile_disc(FLOOR(v / 5.0) * 5.0, 0.95) AS p95
        FROM tbl GROUP BY k ORDER BY k
    """).df()
    assert out.k.tolist() == exp.k.tolist()
    assert out.n.tolist() == exp.n.tolist()
    assert np.array_equal(out.p50.to_numpy(), exp.p50.to_numpy())
    assert np.array_equal(out.p95.to_numpy(), exp.p95.to_numpy())
    # binned answer is within one bin of the exact quantile
    exact = duckdb.sql("SELECT k, quantile_disc(v, 0.5) AS p50 FROM tbl "
                       "GROUP BY k ORDER BY k").df()
    assert (np.abs(out.p50.to_numpy() - exact.p50.to_numpy()) <= 5.0).all()


def test_set_op_all_three(ray_session):
    from search_engine_ray.stages.relational import set_op

    l = rd.from_arrow(pa.table({"k": pa.array([1, 2, 2, 3], pa.int64())})) \
        .repartition(3)
    r = rd.from_arrow(pa.table({"k": pa.array([2, 4, 4], pa.int64())})) \
        .repartition(2)

    def run(op):
        return sorted(set_op(l, r, op=op, columns=("k",))
                      .to_pandas().k.tolist())

    assert run("intersect") == [2]
    assert run("except") == [1, 3]
    assert run("union") == [1, 2, 3, 4]
    with pytest.raises(ValueError, match="unsupported op"):
        set_op(l, r, op="minus", columns=("k",))


def test_bloom_prefilter_superset_and_composition(ray_session):
    import duckdb
    from search_engine_ray.stages.relational import (bloom_prefilter,
                                                     shuffle_hash_join)

    rng = np.random.default_rng(17)
    big_keys = rng.integers(0, 10_000, 5000)
    key_set = rng.choice(10_000, 300, replace=False)
    big = rd.from_arrow(pa.table({
        "k": pa.array(big_keys, pa.int64()),
        "v": pa.array(np.arange(5000), pa.int64())})).repartition(6)
    keys = rd.from_arrow(pa.table({
        "kk": pa.array(key_set, pa.int64())})).repartition(3)

    pruned = bloom_prefilter(big, keys, big_key="k", keys_key="kk",
                             num_bits=1 << 14).to_pandas()
    exact_mask = np.isin(big_keys, key_set)
    # zero false negatives: every true match survives
    assert set(big_keys[exact_mask]) <= set(pruned.k)
    # the filter actually prunes (false positives are bounded, not total)
    assert len(pruned) < 5000

    # composition with the exact semi join reproduces SQL IN semantics
    out = shuffle_hash_join(
        bloom_prefilter(big, keys, big_key="k", keys_key="kk",
                        num_bits=1 << 14),
        keys, on=("k",), right_on=("kk",), how="semi",
        num_partitions=4).to_pandas().sort_values(["k", "v"]) \
        .reset_index(drop=True)
    bd = pd.DataFrame({"k": big_keys, "v": np.arange(5000)})
    kd = pd.DataFrame({"kk": key_set})
    exp = duckdb.sql("SELECT k, v FROM bd WHERE k IN (SELECT kk FROM kd) "
                     "ORDER BY k, v").df()
    assert out.k.tolist() == exp.k.tolist()
    assert out.v.tolist() == exp.v.tolist()


def test_bloom_prefilter_rejects_bad_bits(ray_session):
    from search_engine_ray.stages.relational import bloom_prefilter

    with pytest.raises(ValueError, match="power of two"):
        bloom_prefilter(rd.from_arrow(pa.table({"k": pa.array([1], pa.int64())})),
                        rd.from_arrow(pa.table({"k": pa.array([1], pa.int64())})),
                        big_key="k", keys_key="k", num_bits=1000)


def test_pivot_counts_matches_duckdb(ray_session):
    import duckdb
    from search_engine_ray.stages.relational import pivot_counts

    rng = np.random.default_rng(29)
    df = pd.DataFrame({
        "u": rng.integers(0, 20, 400),
        "t": rng.choice(["a", "b", "c", "zz"], 400),
    })
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    out = pivot_counts(rd.from_arrow(tbl).repartition(5), group_col="u",
                       pivot_col="t", values=("a", "b", "c"),
                       other_alias="other").to_pandas() \
        .sort_values("u").reset_index(drop=True)
    exp = duckdb.sql("""
        SELECT u,
               SUM(CASE WHEN t = 'a' THEN 1 ELSE 0 END)::BIGINT AS a,
               SUM(CASE WHEN t = 'b' THEN 1 ELSE 0 END)::BIGINT AS b,
               SUM(CASE WHEN t = 'c' THEN 1 ELSE 0 END)::BIGINT AS c,
               SUM(CASE WHEN t NOT IN ('a','b','c') THEN 1 ELSE 0
                   END)::BIGINT AS other
        FROM df GROUP BY u ORDER BY u
    """).df()
    assert out.u.tolist() == exp.u.tolist()
    for c in ("a", "b", "c", "other"):
        assert out[c].tolist() == exp[c].tolist()


def test_pivot_counts_no_other(ray_session):
    from search_engine_ray.stages.relational import pivot_counts

    tbl = pa.table({"g": pa.array(["x", "x", "y"], pa.string()),
                    "t": pa.array(["a", "q", "a"], pa.string())})
    out = pivot_counts(rd.from_arrow(tbl), group_col="g", pivot_col="t",
                       values=("a",), other_alias=None).to_pandas() \
        .sort_values("g").reset_index(drop=True)
    assert list(out.columns) == ["g", "a"]
    assert out.a.tolist() == [1, 1]  # the 'q' row is dropped from counts


def test_unpivot_matches_duckdb(ray_session):
    import duckdb
    from search_engine_ray.stages.relational import unpivot

    rng = np.random.default_rng(37)
    df = pd.DataFrame({
        "id": np.arange(200, dtype=np.int64),
        "k": rng.integers(0, 5, 200),
        "m1": rng.integers(0, 100, 200),
        "m2": rng.integers(-50, 50, 200),
    })
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    out = unpivot(rd.from_arrow(tbl).repartition(4),
                  id_cols=("id", "k"), value_cols=("m1", "m2"),
                  var_name="measure", value_name="v").to_pandas() \
        .sort_values(["id", "measure"]).reset_index(drop=True)
    exp = duckdb.sql("""
        SELECT id, k, measure, v
        FROM df UNPIVOT (v FOR measure IN (m1, m2))
        ORDER BY id, measure
    """).df()
    assert list(out.columns) == ["id", "k", "measure", "v"]
    assert out.id.tolist() == exp.id.tolist()
    assert out.measure.tolist() == exp.measure.tolist()
    assert out.v.tolist() == exp.v.tolist()


def test_unpivot_mixed_types_promote(ray_session):
    from search_engine_ray.stages.relational import unpivot

    tbl = pa.table({"id": pa.array([1, 2], pa.int64()),
                    "a": pa.array([1, 2], pa.int64()),
                    "b": pa.array([0.5, 1.5], pa.float64())})
    out = unpivot(rd.from_arrow(tbl), id_cols=("id",),
                  value_cols=("a", "b")).to_pandas() \
        .sort_values(["id", "variable"]).reset_index(drop=True)
    assert out.value.dtype == np.float64
    assert out.value.tolist() == [1.0, 0.5, 2.0, 1.5]


def test_grouped_mode_deterministic_ties(ray_session):
    import duckdb
    from search_engine_ray.stages.relational import grouped_mode

    rng = np.random.default_rng(31)
    df = pd.DataFrame({"g": rng.integers(0, 15, 300),
                       "v": rng.choice(list("pqrs"), 300)})
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    out = grouped_mode(rd.from_arrow(tbl).repartition(6), group_col="g",
                       value_col="v").to_pandas() \
        .sort_values("g").reset_index(drop=True)
    exp = duckdb.sql("""
        WITH c AS (SELECT g, v, COUNT(*)::BIGINT AS n
                   FROM df GROUP BY g, v),
        r AS (SELECT g, v, n, ROW_NUMBER() OVER (PARTITION BY g
                  ORDER BY n DESC, v) AS rk FROM c)
        SELECT g, v, n FROM r WHERE rk = 1 ORDER BY g
    """).df()
    assert out.g.tolist() == exp.g.tolist()
    assert out.v.tolist() == exp.v.tolist()
    assert out.n.tolist() == exp.n.tolist()


def test_global_quantiles_histogram_refinement(ray_session):
    """Exact global quantile_disc by iterative histogram refinement: exact
    vs a local sort at every tested distribution (tiny range, 2^41-wide
    range forcing multiple rounds, single row, heavy ties) and invariant
    to parallelism (block layout must not change an exact answer)."""
    import math

    from search_engine_ray.stages.relational import global_quantiles

    rng = np.random.default_rng(4)
    cases = [rng.integers(-50, 50, 5000), rng.integers(-2**40, 2**40, 20000),
             np.array([7]), rng.integers(0, 3, 1000)]
    for vals in cases:
        t = pa.table({"x": pa.array(vals, pa.int64())})
        got7 = global_quantiles(rd.from_arrow(t).repartition(7),
                                value_col="x").to_pydict()
        got2 = global_quantiles(rd.from_arrow(t).repartition(2),
                                value_col="x").to_pydict()
        s = np.sort(vals)
        n = len(vals)
        exp = [int(s[min(n - 1, max(0, math.ceil(q * n) - 1))])
               for q in (0.25, 0.5, 0.9)]
        assert got7["value"] == exp, len(vals)
        assert got2 == got7  # parallelism-invariant
    # NULLs are skipped like SQL aggregates
    t = pa.table({"x": pa.array([None, 5, None, 1, 3], pa.int64())})
    out = global_quantiles(rd.from_arrow(t), value_col="x",
                           qs=(0.5,)).to_pydict()
    assert out["value"] == [3] and out["n"] == [3]


def test_global_percentile_cont_exact_and_invariant(ray_session):
    """PERCENTILE_CONT via shared rank selection: the integer-scaled
    interpolation interp_x100 equals 100x numpy's linear interpolation at
    every tested distribution (wide range, ties, n=1, n=2) and every
    percent incl. the p=0/p=100 edges; parallelism-invariant."""
    from search_engine_ray.stages.relational import global_percentile_cont

    ps = (0, 10, 25, 50, 90, 100)
    rng = np.random.default_rng(9)
    cases = [rng.integers(-2**40, 2**40, 20000), rng.integers(0, 3, 1000),
             np.array([7]), np.array([1, 100])]
    for vals in cases:
        t = pa.table({"x": pa.array(vals, pa.int64())})
        got7 = global_percentile_cont(rd.from_arrow(t).repartition(7),
                                      value_col="x", ps=ps).to_pydict()
        got2 = global_percentile_cont(rd.from_arrow(t).repartition(2),
                                      value_col="x", ps=ps).to_pydict()
        assert got2 == got7
        s = np.sort(vals)
        n = len(vals)
        for p, x100 in zip(got7["p"], got7["interp_x100"]):
            h100 = (n - 1) * p
            lo, num = divmod(h100, 100)
            hi = lo + 1 if num else lo
            exp = int(s[lo]) * (100 - num) + int(s[hi]) * num
            assert x100 == exp, (p, len(vals))
    # NULLs skipped; n=3 median interpolates nothing (exact rank)
    t = pa.table({"x": pa.array([None, 5, None, 1, 3], pa.int64())})
    out = global_percentile_cont(rd.from_arrow(t), value_col="x",
                                 ps=(50,)).to_pydict()
    assert out["interp_x100"] == [300] and out["n"] == [3]


def test_ordered_prefix_sum_and_packing(ray_session):
    """Two-pass distributed scan == numpy exclusive cumsum in key order,
    at several input partitionings; packing assignment is cum // budget."""
    from search_engine_ray.stages.relational import (ordered_prefix_sum,
                                                     pack_sequences)

    rng = np.random.default_rng(21)
    keys = rng.permutation(3000).astype(np.int64)
    vals = rng.integers(0, 400, 3000)
    t = pa.table({"k": pa.array(keys, pa.int64()),
                  "v": pa.array(vals, pa.int64())})
    order = np.argsort(keys)
    exp_cum = np.concatenate([[0], np.cumsum(vals[order])[:-1]])
    expect = dict(zip(keys[order].tolist(), exp_cum.tolist()))
    for parts in (1, 7, 32):
        got = ordered_prefix_sum(rd.from_arrow(t).repartition(parts),
                                 order_col="k", value_col="v").take_all()
        assert {r["k"]: r["cum_before"] for r in got} == expect, parts
    packed = pack_sequences(rd.from_arrow(t).repartition(5), order_col="k",
                            token_col="v", budget=1000).take_all()
    for r in packed:
        assert r["seq_id"] == expect[r["k"]] // 1000
        assert r["seq_offset"] == expect[r["k"]] % 1000


def test_grouped_percentile_cont_matches_numpy(ray_session):
    """Per-group PERCENTILE_CONT x100 columns equal 100x numpy's linear
    interpolation per group, on skewed group sizes incl. singletons."""
    from search_engine_ray.stages.relational import grouped_percentile_cont

    rng = np.random.default_rng(13)
    g = rng.integers(0, 7, 4000)
    g[:1] = 99                                   # singleton group
    v = rng.integers(-10**6, 10**6, 4000)
    t = pa.table({"g": pa.array(g, pa.int64()),
                  "v": pa.array(v, pa.int64())})
    rows = grouped_percentile_cont(rd.from_arrow(t).repartition(5),
                                   group_col="g", value_col="v",
                                   ps=(0, 50, 90, 100)).take_all()
    assert len(rows) == len(np.unique(g))
    for r in rows:
        vals = np.sort(v[g == r["g"]])
        n = vals.size
        assert r["n"] == n
        for p in (0, 50, 90, 100):
            h100 = (n - 1) * p
            lo, num = divmod(h100, 100)
            hi = lo + 1 if num else lo
            exp = int(vals[lo]) * (100 - num) + int(vals[hi]) * num
            assert r[f"p{p}_x100"] == exp, (r["g"], p)


def test_shuffle_hash_join_null_keys_dropped(ray_session):
    """SQL equi-join semantics: NULL keys never match (inner drops them,
    left keeps the row with a null payload) — pinned against DuckDB."""
    import duckdb
    from search_engine_ray.stages.relational import shuffle_hash_join

    l = pa.table({"k": pa.array([1, 2, None, 3], pa.int64()),
                  "a": pa.array([10, 20, 30, 40], pa.int64())})
    r = pa.table({"k": pa.array([1, None, 3, 4], pa.int64()),
                  "b": pa.array([100, 200, 300, 400], pa.int64())})
    inner = shuffle_hash_join(rd.from_arrow(l), rd.from_arrow(r),
                              on=("k",), how="inner").to_pandas() \
        .sort_values("a").reset_index(drop=True)
    exp = duckdb.sql("SELECT k, a, b FROM l JOIN r USING (k) "
                     "ORDER BY a").df()
    assert inner[["k", "a", "b"]].values.tolist() == exp.values.tolist()
    left = shuffle_hash_join(rd.from_arrow(l), rd.from_arrow(r),
                             on=("k",), how="left").to_pandas() \
        .sort_values("a").reset_index(drop=True)
    assert len(left) == 4
    assert left.b.isna().sum() == 2          # null-key + unmatched rows


def test_broadcast_hash_join_null_big_keys(ray_session):
    """NULL big-side keys: inner drops the row, left appends a null
    payload — same contract as the shuffle join."""
    from search_engine_ray.stages.relational import broadcast_hash_join

    big = rd.from_arrow(pa.table({
        "k": pa.array([1, None, 3], pa.int64()),
        "a": pa.array([10, 20, 30], pa.int64())}))
    small = pa.table({"k": pa.array([1, 3], pa.int64()),
                      "b": pa.array([100, 300], pa.int64())})
    inner = broadcast_hash_join(big, small, big_key="k", small_key="k") \
        .to_pandas().sort_values("a")
    assert inner.a.tolist() == [10, 30]
    left = broadcast_hash_join(big, small, big_key="k", small_key="k",
                               how="left").to_pandas().sort_values("a")
    assert left.a.tolist() == [10, 20, 30]
    assert left.b.isna().tolist() == [False, True, False]


def test_unpivot_null_cells_sql_semantics(ray_session):
    """NULL cells are dropped by default (SQL UNPIVOT); include_nulls=True
    keeps them (pandas melt)."""
    from search_engine_ray.stages.relational import unpivot

    tbl = pa.table({"id": pa.array([1, 2], pa.int64()),
                    "m1": pa.array([1.0, None], pa.float64()),
                    "m2": pa.array([None, 4.0], pa.float64())})
    out = unpivot(rd.from_arrow(tbl), id_cols=("id",),
                  value_cols=("m1", "m2")).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    assert out.id.tolist() == [1, 2]
    assert out.variable.tolist() == ["m1", "m2"]
    assert out.value.tolist() == [1.0, 4.0]
    kept = unpivot(rd.from_arrow(tbl), id_cols=("id",),
                   value_cols=("m1", "m2"), include_nulls=True).to_pandas()
    assert len(kept) == 4 and kept.value.isna().sum() == 2


def test_join_tolerates_zero_column_padding_block_first(ray_session):
    """Regression: a zero-column padding block (what groupby().aggregate
    and Dataset.join emit for empty partitions) arriving FIRST at a join
    input used to latch an empty schema in the hash-shuffle broadcast,
    crashing key resolution on every partition that received no real
    shard.  The relational-module patch spends the one-shot broadcast on
    the first REAL schema instead."""
    import ray as _ray

    from search_engine_ray.stages.relational import shuffle_hash_join

    t = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                  "v": pa.array([10, 20, 30], pa.int64())})
    pad = pa.table({})
    left = rd.from_arrow_refs([_ray.put(pad), _ray.put(t), _ray.put(pad)])
    right = rd.from_arrow(pa.table({
        "k": pa.array([2, 3, 4], pa.int64()),
        "w": pa.array([5, 6, 7], pa.int64())}))
    out = shuffle_hash_join(left, right, on=("k",), how="inner",
                            num_partitions=8).to_pandas().sort_values("k")
    assert out.k.tolist() == [2, 3]
    assert out.w.tolist() == [5, 6]
    # padding-first on the RIGHT side as well
    out2 = shuffle_hash_join(
        right, rd.from_arrow_refs([_ray.put(pad), _ray.put(t)]),
        on=("k",), right_on=("k",), how="inner",
        num_partitions=8).to_pandas().sort_values("k")
    assert out2.k.tolist() == [2, 3]


def test_range_merge_join_matches_hash_join(ray_session):
    """The range-partitioned sort-merge plan must produce EXACTLY the
    hash plan's rows: duplicate keys both sides, a hot key, keys outside
    the sampled boundary range, string keys, and the pinned NULL-key
    contract (inner drops, left keeps with null payload)."""
    import duckdb
    import numpy as np

    from search_engine_ray.stages.relational import (range_merge_join,
                                                     shuffle_hash_join)

    rng = np.random.default_rng(5)
    n, m = 4000, 700
    lk = rng.integers(0, 250, n)
    lk[:400] = 9                     # hot key
    l = pa.table({"k": pa.array(lk, pa.int64()),
                  "a": pa.array(np.arange(n), pa.int64())})
    r = pa.table({"rk": pa.array(rng.integers(-20, 300, m), pa.int64()),
                  "b": pa.array(np.arange(m) * 3, pa.int64())})
    L, R = rd.from_arrow(l).repartition(6), rd.from_arrow(r).repartition(3)
    got = range_merge_join(L, R, on="k", right_on="rk", how="inner",
                           num_partitions=8).to_pandas()
    ref = shuffle_hash_join(L, R, on=("k",), right_on=("rk",),
                            how="inner").to_pandas()
    cols = ["k", "a", "b"]
    g = got[cols].sort_values(cols).reset_index(drop=True)
    e = ref[cols].sort_values(cols).reset_index(drop=True)
    assert len(g) == len(e) > 0
    assert g.equals(e.astype(g.dtypes.to_dict()))

    # left join: null key kept with null payload; unmatched kept
    lt = rd.from_arrow(pa.table({
        "k": pa.array([1, None, 7, 99], pa.int64()),
        "a": pa.array([10, 20, 30, 40], pa.int64())}))
    rt = rd.from_arrow(pa.table({
        "k": pa.array([1, 7, 7], pa.int64()),
        "b": pa.array([100, 200, 300], pa.int64())}))
    left = range_merge_join(lt, rt, on="k", how="left",
                            num_partitions=4).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    assert left.a.tolist() == [10, 20, 30, 30, 40]
    assert left.b.fillna(-1).tolist() == [100, -1, 200, 300, -1]

    # string keys rank and merge through the same searchsorted path
    ls = rd.from_arrow(pa.table({"k": pa.array(["aa", "bb", "cc", "bb"]),
                                 "a": pa.array([1, 2, 3, 4], pa.int64())}))
    rs = rd.from_arrow(pa.table({"k": pa.array(["bb", "cc", "dd"]),
                                 "b": pa.array([10, 20, 30], pa.int64())}))
    s = range_merge_join(ls, rs, on="k", how="inner",
                         num_partitions=3).to_pandas().sort_values("a")
    assert s.a.tolist() == [2, 3, 4] and s.b.tolist() == [10, 20, 10]

    with pytest.raises(ValueError, match="overlapping"):
        range_merge_join(
            rd.from_arrow(pa.table({"k": pa.array([1], pa.int64()),
                                    "x": pa.array([1], pa.int64())})),
            rd.from_arrow(pa.table({"k": pa.array([1], pa.int64()),
                                    "x": pa.array([2], pa.int64())})),
            on="k", how="inner", num_partitions=2)


def test_grouped_percentile_refined_matches_sort_plan(ray_session):
    """The per-group histogram-refinement rank selection must land on
    EXACTLY the sort-based plan's integer surface: heavy ties, negative
    values, a singleton group, p0/p100 endpoints."""
    import numpy as np

    from search_engine_ray.stages.relational import (
        grouped_percentile_cont, grouped_percentile_cont_refined)

    rng = np.random.default_rng(13)
    n = 20000
    g = rng.choice(["a", "b", "c", "x", "big"], n,
                   p=[.2, .2, .2, .0001, .3999])
    v = rng.integers(-500_000, 500_000, n)
    v[g == "a"] = rng.choice([7, 7, 7, 9], int((g == "a").sum()))
    ds = rd.from_arrow(pa.table({"g": pa.array(g),
                                 "c": pa.array(v, pa.int64())})) \
        .repartition(7)
    ps = (0, 25, 50, 90, 100)
    ref = grouped_percentile_cont(ds, group_col="g", value_col="c",
                                  ps=ps).to_pandas() \
        .sort_values("g").reset_index(drop=True)
    got = grouped_percentile_cont_refined(
        ds, group_col="g", value_col="c", ps=ps).to_pandas() \
        .sort_values("g").reset_index(drop=True)
    assert ref.equals(got.astype(ref.dtypes.to_dict()))
