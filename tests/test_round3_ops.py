"""Round-3 operators: time-range rolling window, rank family, CUBE,
exact integer k-means, Levenshtein similarity join."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _events(n=400, keys=7, seed=11):
    rng = np.random.RandomState(seed)
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.randint(0, keys, n).astype(np.int64),
        "ts": pd.to_datetime(
            rng.randint(0, 5000, n) * 1_000_000_000 // 3, unit="ns"),
        "value": np.round(rng.uniform(-5, 5, n), 3),
    })


def test_rolling_time_agg_matches_duckdb(ray_session):
    from search_engine_ray.pipelines.windows import rolling_time_agg

    df = _events()
    out = rolling_time_agg(rd.from_pandas(df), window_sec=120) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    ref = duckdb.sql("""
        SELECT event_id,
               (COUNT(*) OVER w)::BIGINT AS win_n,
               (SUM(CAST(FLOOR(value*100) AS BIGINT)) OVER w)::BIGINT
                   AS win_cents
        FROM (SELECT event_id, user_id, value,
                     epoch_us(ts) // 1000000 AS ts_sec FROM df)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec
                     RANGE BETWEEN 120 PRECEDING AND CURRENT ROW)
        ORDER BY event_id""").fetchdf()
    assert out["win_n"].tolist() == ref["win_n"].tolist()
    assert out["win_cents"].tolist() == ref["win_cents"].tolist()


def test_rolling_time_includes_future_peers(ray_session):
    """RANGE frames include peers AFTER the current row (same ts)."""
    from search_engine_ray.pipelines.windows import rolling_time_agg

    df = pd.DataFrame({
        "event_id": np.array([0, 1, 2], np.int64),
        "user_id": np.zeros(3, np.int64),
        "ts": pd.to_datetime([1000, 1000, 1000], unit="s"),
        "value": [1.0, 1.0, 1.0],
    })
    out = rolling_time_agg(rd.from_pandas(df), window_sec=10) \
        .to_pandas()
    assert out["win_n"].tolist() == [3, 3, 3]


def test_rank_features_matches_duckdb(ray_session):
    from search_engine_ray.pipelines.windows import rank_features

    df = _events(seed=5)
    # force value ties inside keys so RANK != ROW_NUMBER somewhere
    df["value"] = np.round(df["value"])
    out = rank_features(rd.from_pandas(df), ntiles=4) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    ref = duckdb.sql("""
        SELECT event_id,
               RANK() OVER v::BIGINT AS rnk,
               DENSE_RANK() OVER v::BIGINT AS drnk,
               PERCENT_RANK() OVER v AS pct_rank,
               CUME_DIST() OVER v AS cume,
               NTILE(4) OVER (PARTITION BY user_id
                              ORDER BY value, event_id)::BIGINT AS tile
        FROM df
        WINDOW v AS (PARTITION BY user_id ORDER BY value)
        ORDER BY event_id""").fetchdf()
    assert (out["rnk"] != out["drnk"]).any()  # ties exist
    for col in ["rnk", "drnk", "tile"]:
        assert out[col].tolist() == ref[col].tolist(), col
    for col in ["pct_rank", "cume"]:
        assert out[col].tolist() == ref[col].tolist(), col  # bitwise


def test_cube_matches_duckdb(ray_session):
    from search_engine_ray.stages.relational import grouping_sets

    rng = np.random.RandomState(2)
    df = pd.DataFrame({
        "a": rng.choice(["x", "y"], 300),
        "b": rng.choice(["p", "q", "r"], 300),
        "v": rng.randint(0, 50, 300).astype(np.int64),
    })
    out = grouping_sets(rd.from_pandas(df), keys=("a", "b"),
                        sets=(("a", "b"), ("a",), ("b",), ()),
                        sum_cols={"sv": "v"}) \
        .to_pandas().sort_values(["grouping_id", "a", "b"],
                                 na_position="first") \
        .reset_index(drop=True)
    ref = duckdb.sql("""
        SELECT a, b, GROUPING(a, b)::BIGINT AS grouping_id,
               SUM(v)::BIGINT AS sv, COUNT(*)::BIGINT AS n_rows
        FROM df GROUP BY CUBE (a, b)
        ORDER BY grouping_id, a NULLS FIRST, b NULLS FIRST""").fetchdf()
    assert len(out) == len(ref)
    assert out["sv"].tolist() == ref["sv"].tolist()
    assert out["n_rows"].tolist() == ref["n_rows"].tolist()


def _skew_tables(seed=8):
    rng = np.random.RandomState(seed)
    n = 4000
    # zipf-ish: key 1 is very hot, a few warm, long uniform tail
    keys = np.concatenate([
        np.full(1500, 1), np.full(300, 2), np.full(200, 3),
        rng.randint(10, 500, n - 2000)]).astype(np.int64)
    rng.shuffle(keys)
    big = pd.DataFrame({"k": keys,
                        "v": np.arange(n, dtype=np.int64)})
    dim = pd.DataFrame({"dk": np.arange(0, 480, dtype=np.int64),
                        "name": [f"n{i}" for i in range(480)]})
    return big, dim


def test_skew_salted_join_matches_plain(ray_session):
    from search_engine_ray.stages.relational import (shuffle_hash_join,
                                                     skew_salted_join)

    big, dim = _skew_tables()
    plain = shuffle_hash_join(rd.from_pandas(big), rd.from_pandas(dim),
                              on=("k",), right_on=("dk",), how="inner",
                              num_partitions=4) \
        .select_columns(["k", "v", "name"]).to_pandas() \
        .sort_values(["k", "v"]).reset_index(drop=True)
    skew = skew_salted_join(rd.from_pandas(big), rd.from_pandas(dim),
                            big_key="k", dim_key="dk", hot_threshold=150,
                            num_partitions=4, select=["k", "v", "name"]) \
        .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    assert plain.equals(skew)
    assert (big["k"] == 1).sum() >= 150  # the hot path actually ran


def test_skew_salted_join_left_and_no_hot(ray_session):
    from search_engine_ray.stages.relational import (shuffle_hash_join,
                                                     skew_salted_join)

    big, dim = _skew_tables(seed=13)
    big.loc[:10, "k"] = 9999  # keys missing from dim -> null payload
    for thresh in (150, 10**9):  # both paths / shuffle-only fallback
        plain = shuffle_hash_join(rd.from_pandas(big), rd.from_pandas(dim),
                                  on=("k",), right_on=("dk",), how="left",
                                  num_partitions=4) \
            .select_columns(["k", "v", "name"]).to_pandas() \
            .sort_values(["k", "v"]).reset_index(drop=True)
        skew = skew_salted_join(rd.from_pandas(big), rd.from_pandas(dim),
                                big_key="k", dim_key="dk",
                                hot_threshold=thresh, how="left",
                                num_partitions=4,
                                select=["k", "v", "name"]) \
            .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
        assert plain.equals(skew), thresh


def _embeddings(n=120, dim=16, seed=3):
    rng = np.random.RandomState(seed)
    base = rng.uniform(-0.9, 0.9, (6, dim))
    vecs = base[rng.randint(0, 6, n)] + rng.uniform(-0.05, 0.05, (n, dim))
    vecs = np.clip(vecs, -0.999, 0.999).astype(np.float32)
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
    })


def _kmeans_numpy_ref(tbl, k, iters, scale_bits=20):
    """Sequential reference of the exact-integer Lloyd spec."""
    vecs = np.array(tbl["embedding"].to_pylist(), np.float64)
    q = np.floor((vecs + 1.0) * (1 << scale_bits)).astype(np.int64)
    cents = q[:k].copy()
    for _ in range(iters):
        d = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        cid = np.argmin(d, axis=1)
        new = cents.copy()
        for c in range(k):
            sel = cid == c
            if sel.any():
                new[c] = q[sel].sum(axis=0) // sel.sum()
        cents = new
    d = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    cid = np.argmin(d, axis=1)
    return cid, d[np.arange(len(cid)), cid]


def test_kmeans_matches_reference_and_parallelism_invariant(ray_session):
    from search_engine_ray.stages.clustering import kmeans_assign

    tbl = _embeddings()
    cid_ref, dist_ref = _kmeans_numpy_ref(tbl, k=5, iters=3)
    outs = []
    for nblocks in (1, 7):
        ds = rd.from_arrow(tbl).repartition(nblocks)
        out = kmeans_assign(ds, k=5, iters=3) \
            .to_pandas().sort_values("vec_id").reset_index(drop=True)
        outs.append(out)
    for out in outs:
        assert out["cluster"].tolist() == cid_ref.tolist()
        assert out["dist_q"].tolist() == dist_ref.tolist()
    # clusters actually separate the 6 planted modes into 5 groups
    assert outs[0]["cluster"].nunique() >= 4


def test_kmeans_matches_sql_oracle(ray_session, tmp_path):
    import importlib.util

    from search_engine_ray.stages.clustering import kmeans_assign

    spec = importlib.util.spec_from_file_location(
        "re3_", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    tbl = _embeddings(n=80, dim=8, seed=9)
    import pyarrow.parquet as pq
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"'{tmp_path}/embeddings.parquet'")
    ref = con.execute(m._kmeans_sql(k=4, iters=2, scale_bits=20)) \
        .fetchdf().sort_values("vec_id").reset_index(drop=True)
    out = kmeans_assign(rd.from_arrow(tbl), k=4, iters=2) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert out["cluster"].tolist() == ref["cluster"].tolist()
    assert out["dist_q"].tolist() == ref["dist_q"].tolist()


def test_dhash_near_dup_property(ray_session):
    """dHash is a PERCEPTUAL key: a lightly perturbed image lands within a
    few bits, an unrelated image far away."""
    from search_engine_ray.functions.png import encode_png
    from search_engine_ray.stages.multimodal import DHashImage

    rng = np.random.RandomState(1)
    base = rng.randint(0, 256, (40, 50), np.uint8)
    # smooth it so single-pixel noise doesn't flip grid samples
    base = (base.astype(np.int64) // 4 * 4).astype(np.uint8)
    near = base.copy()
    near[0, 0] ^= 1  # off-grid single-pixel tweak
    far = 255 - base[::-1, ::-1]
    tbl = pa.table({
        "img_id": pa.array([0, 1, 2], pa.int64()),
        "payload": pa.array([encode_png(a) for a in (base, near, far)],
                            pa.binary()),
    })
    out = DHashImage(decoder="png")(tbl).to_pandas()

    def bits(row):
        return np.unpackbits(np.array(
            [row.dhash_lo, row.dhash_hi], dtype=np.uint64).view(np.uint8))

    b0, b1, b2 = (bits(out.iloc[i]) for i in range(3))
    assert (b0 != b1).sum() <= 2
    assert (b0 != b2).sum() >= 20


def test_retention_and_collect_match_duckdb(ray_session):
    from search_engine_ray.pipelines.windows import (collect_ordered,
                                                     retention_matrix)

    df = _events(n=600, keys=25, seed=21)
    df["event_type"] = np.array(["view", "click", "buy"])[
        np.random.RandomState(2).randint(0, 3, len(df))]
    ret = retention_matrix(rd.from_pandas(df), max_offset=5) \
        .to_pandas().sort_values(["cohort_day", "day_offset"]) \
        .reset_index(drop=True)
    ret_ref = duckdb.sql("""
        WITH ud AS (SELECT DISTINCT user_id,
                           epoch_us(ts) // 1000000 // 86400 AS day FROM df),
        coh AS (SELECT user_id, MIN(day) AS cohort_day FROM ud
                GROUP BY user_id)
        SELECT c.cohort_day::BIGINT AS cohort_day,
               (u.day - c.cohort_day)::BIGINT AS day_offset,
               COUNT(DISTINCT u.user_id)::BIGINT AS n_users
        FROM ud u JOIN coh c USING (user_id)
        WHERE u.day - c.cohort_day <= 5
        GROUP BY 1, 2 ORDER BY 1, 2""").fetchdf()
    assert ret.values.tolist() == ret_ref.values.tolist()
    seq = collect_ordered(rd.from_pandas(df), k=5,
                          value_col="event_type") \
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    seq_ref = duckdb.sql("""
        WITH r AS (SELECT user_id, event_type,
                          row_number() OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS rn,
                          COUNT(*) OVER (PARTITION BY user_id) AS n_total
                   FROM df)
        SELECT user_id, string_agg(event_type, ',' ORDER BY rn) AS seq,
               MAX(n_total)::BIGINT AS n_total
        FROM r WHERE rn <= 5 GROUP BY user_id ORDER BY user_id""").fetchdf()
    assert seq["seq"].tolist() == seq_ref["seq"].tolist()
    assert seq["n_total"].tolist() == seq_ref["n_total"].tolist()


def test_profile_numeric_columns(ray_session):
    from search_engine_ray.stages.profile import profile_numeric_columns

    rng = np.random.RandomState(5)
    df = pd.DataFrame({"a": rng.randint(0, 9, 500).astype(np.float64),
                       "b": rng.uniform(-3, 3, 500)})
    df.loc[::7, "b"] = np.nan
    out = profile_numeric_columns(rd.from_pandas(df).repartition(6),
                                  ["a", "b"])
    ra = out[out.column == "a"].iloc[0]
    rb = out[out.column == "b"].iloc[0]
    assert ra.n == 500 and ra.n_null == 0 and ra.n_distinct == 9
    assert ra.min_v == df.a.min() and ra.max_v == df.a.max()
    assert rb.n_null == int(df.b.isna().sum())
    assert rb.n_distinct == df.b.nunique()
    assert rb.sum_cents == int(np.floor(df.b.dropna() * 100).sum())


def test_profile_ndv_approx_accuracy(ray_session):
    """HLL NDV mode: within 5% of the exact distinct count on a
    high-cardinality column, exact-mode-identical everywhere else, and
    invariant to block layout (register merge is associative)."""
    from search_engine_ray.stages.profile import profile_numeric_columns

    rng = np.random.RandomState(11)
    df = pd.DataFrame({
        "hi": rng.randint(0, 1 << 40, 20_000).astype(np.float64),
        "lo": rng.randint(0, 7, 20_000).astype(np.float64),
    })
    out4 = profile_numeric_columns(rd.from_pandas(df).repartition(4),
                                   ["hi", "lo"], ndv="approx")
    out9 = profile_numeric_columns(rd.from_pandas(df).repartition(9),
                                   ["hi", "lo"], ndv="approx")
    # parallelism-invariant: same registers regardless of block layout
    assert out4.n_distinct.tolist() == out9.n_distinct.tolist()
    hi_est = int(out4[out4.column == "hi"].iloc[0].n_distinct)
    hi_true = df.hi.nunique()
    assert abs(hi_est - hi_true) / hi_true < 0.05
    # the non-NDV stats are the exact aggregate either way
    exact = profile_numeric_columns(rd.from_pandas(df).repartition(4),
                                    ["hi", "lo"])
    for c in ("n", "n_null", "min_v", "max_v", "sum_cents"):
        assert out4[c].tolist() == exact[c].tolist()
    # low-cardinality columns are near-exact under HLL
    assert int(out4[out4.column == "lo"].iloc[0].n_distinct) == 7


def test_zscore_outliers_exact(ray_session):
    from search_engine_ray.stages.profile import zscore_outliers

    rng = np.random.RandomState(3)
    v = rng.normal(0, 1, 3000)
    v[:15] += 40  # planted outliers
    df = pd.DataFrame({"event_id": np.arange(3000, dtype=np.int64),
                       "value": v})
    out = zscore_outliers(rd.from_pandas(df).repartition(5),
                          value_col="value", id_col="event_id", z=3) \
        .to_pandas().sort_values("event_id")
    # integer-spec reference
    x = np.floor(v * 100).astype(np.int64)
    n, s, q = len(x), x.sum(), (x * x).sum()
    want = np.flatnonzero((n * x - s) ** 2 > 9 * (n * q - s * s))
    assert out["event_id"].tolist() == want.tolist()
    assert set(range(15)) <= set(out["event_id"])  # planted ones found


def test_set_op_all_matches_duckdb(ray_session):
    from search_engine_ray.stages.relational import set_op_all

    rng = np.random.RandomState(9)
    ltab = pd.DataFrame({"k": rng.randint(0, 12, 400).astype(np.int64)})
    rtab = pd.DataFrame({"k": rng.randint(0, 12, 150).astype(np.int64)})
    for op, sqlop in [("except_all", "EXCEPT ALL"),
                      ("intersect_all", "INTERSECT ALL")]:
        out = set_op_all(rd.from_pandas(ltab), rd.from_pandas(rtab),
                         op=op, columns=("k",)) \
            .to_pandas()["k"].sort_values().tolist()
        ref = duckdb.sql(f"SELECT k FROM ltab {sqlop} SELECT k FROM rtab") \
            .fetchdf()["k"].sort_values().tolist()
        assert out == ref, op
    # multiplicities are real (not DISTINCT): duplicates survive
    assert len(out) > len(set(out))


def test_sparse_cosine_pairs_matches_duckdb(ray_session):
    from search_engine_ray.pipelines.phrase import NgramTF
    from search_engine_ray.stages.dedup import sparse_cosine_pairs

    rng = np.random.RandomState(6)
    words = ["red", "blue", "green", "apple", "pear", "plum"]
    docs = pd.DataFrame({
        "doc_id": np.arange(40, dtype=np.int64),
        "text": [" ".join(words[w] for w in rng.randint(0, 6, 10))
                 for _ in range(40)],
    })
    docs.loc[1, "text"] = docs.loc[0, "text"]          # exact dup
    docs.loc[2, "text"] = docs.loc[0, "text"] + " red"  # near dup
    tf = rd.from_pandas(docs).map_batches(
        NgramTF, fn_constructor_kwargs={"n": 2}, batch_format="pyarrow",
        concurrency=(1, 2))
    ref = duckdb.sql("""
        WITH pos AS (
          SELECT doc_id, tok AS term,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY ord) - 1 AS p
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                       generate_subscripts(string_split(text, ' '), 1)
                           AS ord FROM docs)),
        big AS (SELECT p0.doc_id, p0.term || ' ' || p1.term AS term
                FROM pos p0 JOIN pos p1
                ON p1.doc_id = p0.doc_id AND p1.p = p0.p + 1),
        tfb AS (SELECT doc_id, term, COUNT(*)::BIGINT AS tf FROM big
                GROUP BY doc_id, term),
        df AS (SELECT term, COUNT(*) AS n FROM tfb GROUP BY term),
        tf2 AS (SELECT tfb.* FROM tfb JOIN df USING (term)
                WHERE df.n <= 16),
        norms AS (SELECT doc_id, SUM(tf*tf)::BIGINT AS normsq FROM tf2
                  GROUP BY doc_id),
        pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                         SUM(a.tf*b.tf)::BIGINT AS numer
                  FROM tf2 a JOIN tf2 b
                  ON a.term = b.term AND a.doc_id < b.doc_id
                  GROUP BY id_a, id_b)
        SELECT p.id_a, p.id_b, p.numer, na.normsq AS normsq_a,
               nb.normsq AS normsq_b
        FROM pairs p JOIN norms na ON na.doc_id = p.id_a
                     JOIN norms nb ON nb.doc_id = p.id_b
        WHERE (p.numer::DOUBLE * p.numer::DOUBLE) * 4.0
              >= 1.0 * (na.normsq::DOUBLE * nb.normsq::DOUBLE)
        ORDER BY id_a, id_b""").fetchdf()
    for max_bcast in (5_000_000, 1):  # broadcast path, then shuffle path
        out = sparse_cosine_pairs(tf, threshold=(1, 2), max_df=16,
                                  max_broadcast_docs=max_bcast) \
            .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        assert out["id_a"].tolist() == ref["id_a"].tolist(), max_bcast
        for col in ["id_b", "numer", "normsq_a", "normsq_b"]:
            assert out[col].tolist() == ref[col].tolist(), (max_bcast, col)
    assert {(0, 1), (0, 2)} <= set(zip(ref.id_a, ref.id_b))  # planted dups


def test_sparse_cosine_stop_terms_dropped_before_shuffle(ray_session):
    """A forced hot term (df >> max_df) must never reach the term groupby:
    drop_stop_terms removes it up front (both the broadcast and the
    anti-join plan), no surviving term's group exceeds max_df rows, and
    the pair output is identical to a run without the hot term at all."""
    from search_engine_ray.stages.dedup import (drop_stop_terms,
                                                sparse_cosine_pairs)

    rng = np.random.RandomState(9)
    pool = [f"t{i:02d}" for i in range(40)]  # cold terms: df ~ 4-5 << 8
    rows = []
    for d in range(60):
        for t in rng.choice(pool, 3, replace=False):
            rows.append((d, t, int(rng.randint(1, 5))))
        rows.append((d, "the", 7))  # hot term: df=60 > max_df=8
    tf_pd = pd.DataFrame(rows, columns=["doc_id", "term", "tf"])
    tf = rd.from_pandas(tf_pd).repartition(6)
    cold = rd.from_pandas(tf_pd[tf_pd.term != "the"]).repartition(6)

    for max_bt in (5_000_000, 0):  # broadcast plan, then anti-join plan
        kept = drop_stop_terms(tf, max_df=8,
                               max_broadcast_stop_terms=max_bt).to_pandas()
        dfc = kept.groupby("term").size()
        assert (dfc <= 8).all(), (max_bt, dfc[dfc > 8])
        assert "the" not in set(kept.term), max_bt
        assert len(kept) == len(tf_pd) - 60, max_bt

        got = sparse_cosine_pairs(
            tf, threshold=(1, 2), max_df=8,
            max_broadcast_stop_terms=max_bt) \
            .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        want = sparse_cosine_pairs(cold, threshold=(1, 2), max_df=8) \
            .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        assert got.equals(want), max_bt


def test_sparse_cosine_precomputed_df_parity(ray_session):
    """Threading a precomputed df table (df_ds) must skip the internal df
    pre-pass and produce identical pairs — the r4 fix for the
    double-tokenize regression (tf_ds consumed once, not twice)."""
    from ray.data.aggregate import Count

    from search_engine_ray.stages.dedup import sparse_cosine_pairs

    rng = np.random.RandomState(12)
    pool = [f"t{i:02d}" for i in range(30)]
    rows = []
    for d in range(50):
        for t in rng.choice(pool, 4, replace=False):
            rows.append((d, t, int(rng.randint(1, 5))))
        rows.append((d, "the", 3))  # hot term, df=50 > max_df=8
    tf_pd = pd.DataFrame(rows, columns=["doc_id", "term", "tf"])
    tf = rd.from_pandas(tf_pd).repartition(5)
    df_ds = tf.groupby("term").aggregate(Count(alias_name="df"))

    want = sparse_cosine_pairs(tf, threshold=(1, 2), max_df=8) \
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    got = sparse_cosine_pairs(tf, threshold=(1, 2), max_df=8, df_ds=df_ds) \
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert got.equals(want)
    assert len(want)  # non-degenerate witness


def test_linreg_sufficient_stats(ray_session):
    from search_engine_ray.stages.regression import (linreg_sufficient_stats,
                                                     solve_ridge_3x3)

    rng = np.random.RandomState(12)
    n = 2000
    x1 = rng.randint(0, 50, n).astype(np.int64)
    x2 = rng.randint(0, 30, n).astype(np.int64)
    y = 7 + 3 * x1 + 2 * x2 + rng.randint(-2, 3, n)
    df = pd.DataFrame({"x1": x1, "x2": x2, "y": y})
    for nblocks in (1, 9):
        stats = linreg_sufficient_stats(
            rd.from_pandas(df).repartition(nblocks), x1="x1", x2="x2", y="y")
        assert stats["n"] == n and stats["s11"] == int((x1 * x1).sum())
        det, b0, b1, b2 = solve_ridge_3x3(stats)
        # recover the planted coefficients (noise is +-2 uniform)
        assert abs(b1 - 3) < 0.05 and abs(b2 - 2) < 0.05 and abs(b0 - 7) < 1
    # numpy lstsq agrees
    X = np.column_stack([np.ones(n), x1, x2]).astype(np.float64)
    ref = np.linalg.lstsq(X, y.astype(np.float64), rcond=None)[0]
    assert np.allclose([b0, b1, b2], ref, atol=1e-8)
    # ridge shrinks the feature weights, not the intercept path blowing up
    _, r0, r1, r2 = solve_ridge_3x3(stats, lam=10**6)
    assert abs(r1) < abs(b1) and abs(r2) < abs(b2)


def test_decode_audio_wav(ray_session):
    from search_engine_ray.stages.multimodal import DecodeAudio, encode_wav

    import io
    import wave

    s = np.array([100, -100, 50, -50, 0, 0, 30], np.int16)
    mono = encode_wav(s, rate=16000)
    # stereo: channel 0 must be extracted, channel 1 (noise) ignored
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        inter = np.empty(len(s) * 2, np.int16)
        inter[0::2] = s
        inter[1::2] = 9999
        w.writeframes(inter.tobytes())
    stereo = buf.getvalue()
    tbl = pa.table({"aid": pa.array([0, 1], pa.int64()),
                    "payload": pa.array([mono, stereo], pa.binary())})
    out = DecodeAudio()(tbl).to_pandas()
    assert out.n_samples.tolist() == [7, 7]
    assert out.duration_ms.tolist() == [0, 0]
    assert out.sum_sq.tolist() == [int((s.astype(np.int64) ** 2).sum())] * 2
    # crossings: 100/-100, -100/50, 50/-50, -50/0 (0 counts as >= 0)
    assert out.zero_cross.tolist() == [4, 4]


def _phrase_ref_sql(terms):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "re4_", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m._phrase_sql(terms)


def test_phrase_counts_matches_duckdb(ray_session):
    from search_engine_ray.pipelines.phrase import phrase_counts

    docs = pd.DataFrame({
        "doc_id": np.arange(8, dtype=np.int64),
        "text": [
            "the table hash join",             # 1 match
            "table, hash! table hash",         # punctuation cleaned: 2
            "table x123 hash",                 # digit token dropped: adjacent
            "hash table",                      # wrong order: 0
            "table\thash\ntable",              # whitespace variants: 1
            "TABLE HASH",                      # case-folded: 1
            "a a a",                           # overlap fixture (below)
            "",                                # empty
        ],
    })
    con = duckdb.connect()
    con.register("documents", docs)
    out = phrase_counts(rd.from_pandas(docs), ["table", "hash"]) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    ref = con.execute(_phrase_ref_sql(["table", "hash"])).fetchdf() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == ref["doc_id"].tolist()
    assert out["n_matches"].tolist() == ref["n_matches"].tolist()
    # doc 2: "x123" is dropped by the clean regex, making table/hash adjacent
    assert 2 in out["doc_id"].tolist()
    # overlapping occurrences of a repeated-term phrase count individually
    out2 = phrase_counts(rd.from_pandas(docs), ["a", "a"]) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    ref2 = con.execute(_phrase_ref_sql(["a", "a"])).fetchdf()
    assert out2["n_matches"].tolist() == [2] == ref2["n_matches"].tolist()


def test_edit_distance_pairs_matches_duckdb(ray_session):
    from search_engine_ray.stages.strings import edit_distance_pairs

    rng = np.random.RandomState(4)
    words = ["kitten", "sitting", "kitchen", "mitten", "fitting",
             "ветер", "вечер", "велер", "zzz", "zz"]
    rows = []
    for i in range(80):
        w = words[rng.randint(len(words))]
        if rng.rand() < 0.4:  # mutate a char
            pos = rng.randint(len(w))
            w = w[:pos] + chr(97 + rng.randint(26)) + w[pos + 1:]
        rows.append((i, w + " tail text", ["en", "ru"][rng.randint(2)]))
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    out = edit_distance_pairs(rd.from_pandas(df), prefix_len=10,
                              max_dist=3) \
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    ref = duckdb.sql("""
        WITH p AS (SELECT doc_id, lang, substr(text, 1, 10) AS s FROM df)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               levenshtein(a.s, b.s)::BIGINT AS dist
        FROM p a JOIN p b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE levenshtein(a.s, b.s) <= 3
        ORDER BY id_a, id_b""").fetchdf()
    assert out["id_a"].tolist() == ref["id_a"].tolist()
    assert out["id_b"].tolist() == ref["id_b"].tolist()
    assert out["dist"].tolist() == ref["dist"].tolist()


# --------------------------------------------------------------------------
# property tests (no Ray session needed — pure per-batch functions)
# --------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.text(alphabet="abcдеё", min_size=0, max_size=12)


@settings(max_examples=60, deadline=None)
@given(st.lists(_word, min_size=2, max_size=8))
def test_levenshtein_pairs_fuzz_vs_duckdb(strings):
    """Byte-level DP == DuckDB levenshtein on arbitrary (incl. multibyte)
    strings — the oracle contract of stages/strings."""
    from search_engine_ray.stages.strings import _codes, levenshtein_pairs

    codes, lens = _codes(strings)
    ia, ib = np.triu_indices(len(strings), k=1)
    got = levenshtein_pairs(codes, lens, ia, ib)
    con = duckdb.connect()
    for x, y, d in zip(ia, ib, got):
        ref = con.execute("SELECT levenshtein(?, ?)",
                          [strings[x], strings[y]]).fetchone()[0]
        assert d == ref, (strings[x], strings[y])


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 2000),      # ts seconds (ties!)
                          st.integers(-500, 500)),   # value cents
                min_size=1, max_size=60),
       st.integers(1, 300))
def test_rolling_time_frame_fuzz(rows, window):
    """The two-searchsorted frame == SQL RANGE BETWEEN (peer-inclusive),
    checked directly on the per-key kernel against DuckDB."""
    import pyarrow as pa

    from search_engine_ray.pipelines.windows import rolling_time_agg

    tbl = pa.table({
        "event_id": pa.array(np.arange(len(rows)), pa.int64()),
        "user_id": pa.array(np.zeros(len(rows)), pa.int64()),
        "ts": pa.array([r[0] * 1_000_000 for r in rows],
                       pa.timestamp("us")),
        "value": pa.array([r[1] / 100.0 for r in rows], pa.float64()),
    })
    # the operator itself on one key == the kernel
    import ray.data as rd

    out = rolling_time_agg(rd.from_arrow(tbl), window_sec=window) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    df = tbl.to_pandas()
    ref = duckdb.sql(f"""
        SELECT event_id, (COUNT(*) OVER w)::BIGINT AS win_n,
               (SUM(CAST(FLOOR(value*100) AS BIGINT)) OVER w)::BIGINT
                   AS win_cents
        FROM (SELECT event_id, value,
                     epoch_us(ts) // 1000000 AS ts_sec FROM df)
        WINDOW w AS (ORDER BY ts_sec
                     RANGE BETWEEN {window} PRECEDING AND CURRENT ROW)
        ORDER BY event_id""").fetchdf()
    assert out["win_n"].tolist() == ref["win_n"].tolist()
    assert out["win_cents"].tolist() == ref["win_cents"].tolist()
