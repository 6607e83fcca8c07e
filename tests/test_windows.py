"""Rolling-window aggregates and funnel matching (pipelines/windows.py)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from search_engine_ray.pipelines.windows import funnel_match, rolling_agg


def _events(rows):
    # rows: (event_id, user_id, sec, event_type, value)
    return pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] * 1_000_000 for r in rows],
                       pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([float(r[4]) for r in rows], pa.float64()),
    })


def test_rolling_agg_matches_bruteforce(ray_session):
    rng = np.random.default_rng(3)
    rows = [(i, int(rng.integers(0, 3)), int(rng.integers(0, 1000)),
             "view", float(rng.normal())) for i in range(60)]
    out = rolling_agg(rd.from_arrow(_events(rows)).repartition(5), k=4) \
        .to_pandas().sort_values(["user_id", "rn"]).reset_index(drop=True)
    # brute force per user
    import pandas as pd

    df = pd.DataFrame(rows, columns=["event_id", "user_id", "sec", "t", "v"])
    for uid, grp in df.sort_values(["sec", "event_id"]).groupby("user_id"):
        sub = out[out.user_id == uid].reset_index(drop=True)
        v = grp.v.to_numpy()
        cents = np.floor(v * 100).astype(np.int64)
        for i in range(len(v)):
            lo = max(0, i - 3)
            assert sub.roll_cents[i] == cents[lo:i + 1].sum()
            assert sub.roll_n[i] == i + 1 - lo
            assert sub.roll_max_cents[i] == cents[lo:i + 1].max()


def test_rolling_agg_short_group(ray_session):
    rows = [(1, 7, 10, "view", 2.5), (2, 7, 20, "view", -1.0)]
    out = rolling_agg(rd.from_arrow(_events(rows)), k=4).to_pandas() \
        .sort_values("rn").reset_index(drop=True)
    assert out.roll_n.tolist() == [1, 2]
    assert out.roll_max_cents.tolist() == [250, 250]


def test_funnel_basic_and_window_boundary(ray_session):
    rows = [
        # user 1: view -> click -> purchase inside the hour
        (1, 1, 0, "view", 0), (2, 1, 10, "click", 0),
        (3, 1, 3600, "purchase", 0),
        # user 2: chain takes 3601s -> NOT completed
        (4, 2, 0, "view", 0), (5, 2, 10, "click", 0),
        (6, 2, 3601, "purchase", 0),
        # user 3: steps out of order
        (7, 3, 0, "purchase", 0), (8, 3, 10, "click", 0),
        (9, 3, 20, "view", 0),
        # user 4: earliest view fails the window but a LATER view succeeds
        # (ANY-completion semantics, not greedy-earliest)
        (10, 4, 0, "view", 0), (11, 4, 5000, "view", 0),
        (12, 4, 5010, "click", 0), (13, 4, 5020, "purchase", 0),
    ]
    out = funnel_match(rd.from_arrow(_events(rows)).repartition(3),
                       within_sec=3600).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    assert out.completed.tolist() == [True, False, False, True]
    assert out.n_step1.tolist() == [1, 1, 1, 2]
    assert out.n_step3.tolist() == [1, 1, 1, 1]


def test_window_kernels_null_guard_vs_duckdb(ray_session):
    """NULL-bearing inputs (value and ts) must match DuckDB's windowed
    SQL exactly — SUM/MAX skip NULLs (NULL result when the frame has no
    valid value), LAG/LEAD of NULL is NULL, gap is NULL when either ts
    is NULL.  Guards the driver-red r2/r4 scenario where the driver's
    events data may carry NULLs the local testdata does not."""
    import duckdb
    import pandas as pd

    from search_engine_ray.pipelines.windows import analytic_per_key

    rng = np.random.default_rng(11)
    n = 80
    vals = rng.normal(size=n) * 10
    v_null = rng.random(n) < 0.25
    ts_sec = rng.integers(0, 500, n)
    ts_null = rng.random(n) < 0.1
    tbl = pa.table({
        "event_id": pa.array(np.arange(1, n + 1), pa.int64()),
        "user_id": pa.array(rng.integers(0, 4, n), pa.int64()),
        "ts": pa.array([None if tn else int(s) * 1_000_000
                        for s, tn in zip(ts_sec, ts_null)],
                       pa.timestamp("us")),
        "value": pa.array([None if vn else float(x)
                           for x, vn in zip(vals, v_null)], pa.float64()),
    })
    con = duckdb.connect()
    con.register("events", tbl)

    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(list(df.columns), kind="stable") \
                 .reset_index(drop=True)

    got = canon(analytic_per_key(rd.from_arrow(tbl)).to_pandas())
    exp = canon(con.execute("""
SELECT event_id, user_id,
       ROW_NUMBER() OVER w AS rn,
       LAG(CAST(FLOOR(value * 100) AS BIGINT)) OVER w AS prev_cents,
       LEAD(CAST(FLOOR(value * 100) AS BIGINT)) OVER w AS next_cents,
       date_diff('second', LAG(ts) OVER w, ts)::BIGINT AS gap_sec,
       SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents
FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""").df())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    got_r = canon(rolling_agg(rd.from_arrow(tbl), k=4).to_pandas())
    exp_r = canon(con.execute("""
SELECT event_id, user_id,
       ROW_NUMBER() OVER w AS rn,
       SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER (
           w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS roll_cents,
       COUNT(*) OVER (
           w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)::BIGINT AS roll_n,
       MAX(CAST(FLOOR(value * 100) AS BIGINT)) OVER (
           w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS roll_max_cents
FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""").df())
    pd.testing.assert_frame_equal(got_r, exp_r, check_dtype=False)


def test_first_last_values_null_guard_vs_duckdb(ray_session):
    """FIRST/LAST/NTH copy the frame row's value verbatim (NULL included);
    NTH is NULL when the key has fewer than n rows — checked against
    DuckDB over NULL-bearing input."""
    import duckdb
    import pandas as pd

    from search_engine_ray.pipelines.windows import first_last_values

    rng = np.random.default_rng(23)
    n = 70
    vals = rng.normal(size=n) * 10
    v_null = rng.random(n) < 0.3
    tbl = pa.table({
        "event_id": pa.array(np.arange(1, n + 1), pa.int64()),
        # user 9 gets exactly ONE row: NTH_VALUE(2) must be NULL for it
        "user_id": pa.array(np.concatenate([[9], rng.integers(0, 4, n - 1)]),
                            pa.int64()),
        "ts": pa.array(rng.integers(0, 400, n) * 1_000_000,
                       pa.timestamp("us")),
        "value": pa.array([None if vn else float(x)
                           for x, vn in zip(vals, v_null)], pa.float64()),
    })
    con = duckdb.connect()
    con.register("events", tbl)

    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(list(df.columns), kind="stable") \
                 .reset_index(drop=True)

    got = canon(first_last_values(rd.from_arrow(tbl), nth=2).to_pandas())
    exp = canon(con.execute("""
SELECT event_id, user_id,
       ROW_NUMBER() OVER w AS rn,
       FIRST_VALUE(c) OVER wf AS first_cents,
       LAST_VALUE(c) OVER wf AS last_cents,
       NTH_VALUE(c, 2) OVER wf AS nth_cents
FROM (SELECT *, CAST(FLOOR(value * 100) AS BIGINT) AS c FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
       wf AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""").df())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
