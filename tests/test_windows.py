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
            assert sub.roll_max[i] == v[lo:i + 1].max()


def test_rolling_agg_short_group(ray_session):
    rows = [(1, 7, 10, "view", 2.5), (2, 7, 20, "view", -1.0)]
    out = rolling_agg(rd.from_arrow(_events(rows)), k=4).to_pandas() \
        .sort_values("rn").reset_index(drop=True)
    assert out.roll_n.tolist() == [1, 2]
    assert out.roll_max.tolist() == [2.5, 2.5]


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
